"""Import reference (torch) checkpoints into this framework's pytree format.

The reference persists ``torch.save({'epoch': e, 'state':
model.state_dict()}, '<e>.tar')`` every ``save_freq`` epochs
(/root/reference/train.py:48,58, train_50.py:55,68).  A user migrating from
the reference has directories of those ``.tar`` files — this module maps
their state dicts onto the pytrees produced by
``models.backbone.init_backbone`` / ``methods.gnnnet.init_head`` /
``methods.baseline.init_classifier``, so reference-trained models can be
evaluated (and training resumed — the reference's own resume also
re-creates the optimizer fresh, train.py:196-205, so a fresh ``opt_state``
is semantics-preserving) by this framework's CLIs.

Key layout handled (names from the reference modules):

===========================  =============================================
reference state-dict key      mft_tpu pytree slot
===========================  =============================================
feature.trunk.0.weight        params.feature.stem_conv    (OIHW -> HWIO)
feature.trunk.1.*             params.feature.stem_bn / stats.feature.stem_bn
feature.trunk.{4+k}.C1/C2     params.feature.stages[i][j].conv1/conv2
feature.trunk.{4+k}.BN1/BN2   ....bn1/bn2 (+ running stats -> stats tree)
feature.trunk.{4+k}.shortcut  ....conv_sc / bn_sc (1x1 projection blocks)
feature.trunk.{4+k}.BN2.gamma ....fwt_gamma2 (ResNet10_FW; (1,C,1,1)->(C,))
fc.0.* / fc.1.*               params.fc.linear / params.fc.bn
gnn.layer_w{i}.* / layer_l{i} params.gnn.layers[i].w / .l
gnn.w_comp_last / layer_last  params.gnn.w_last / .l_last
classifier.*                  params.classifier (baseline pretraining head)
===========================  =============================================

Linear/1x1-conv weights transpose from torch's [out, in] to [in, out]; the
mappings are the same ones the run-the-reference golden suite verifies
numerically (tests/test_golden_reference.py) and are themselves pinned
against a golden-fixture state dict in tests/test_torch_import.py.

DampNet checkpoints (all three variants) add the recovery modules
``W_R / V_R / W_R_std / V_R_std / layer{1-3}[_add]``; the prototype /
rolling-store banks are plain attributes in the reference — never in
``state_dict()`` — so ``damp_state`` is rebuilt fresh on import, exactly
as a reference eval re-derives it.  A strict unconsumed-key check reports
anything a conversion would drop rather than importing silently.

:func:`export_state_dict` / :func:`save_torch_tar` run the same mapping in
reverse (pytree -> reference ``.tar``), roundtrip-pinned bit-exactly in
tests/test_torch_import.py.
"""

from __future__ import annotations

from typing import Any, Dict, Set, Tuple

import numpy as np

from mft_tpu.models.backbone import ResNetCfg


class _Reader:
    """dict view that records consumed keys so the import can prove it
    accounted for every tensor in the checkpoint."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.consumed: Set[str] = set()

    def __contains__(self, k: str) -> bool:
        return k in self.sd

    def __getitem__(self, k: str) -> np.ndarray:
        if k not in self.sd:
            raise KeyError(
                f"reference checkpoint is missing key {k!r} — wrong --model "
                f"for this checkpoint? (have {len(self.sd)} keys, e.g. "
                f"{sorted(self.sd)[:3]})"
            )
        self.consumed.add(k)
        return self.sd[k]

    def unconsumed(self) -> list:
        # num_batches_tracked is torch BN bookkeeping with no numeric role
        # in the reference's momentum-based stat updates
        return sorted(
            k for k in self.sd
            if k not in self.consumed and not k.endswith("num_batches_tracked")
        )


def _hwio(w: np.ndarray) -> np.ndarray:
    if w.ndim != 4:
        raise ValueError(f"expected OIHW conv weight, got shape {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))


def _lin(r: _Reader, pre: str) -> dict:
    return {"w": np.ascontiguousarray(r[f"{pre}.weight"].T), "b": r[f"{pre}.bias"]}


def _conv1x1(r: _Reader, pre: str) -> dict:
    w = r[f"{pre}.weight"]  # [out, in, 1, 1]
    return {"w": np.ascontiguousarray(w[:, :, 0, 0].T), "b": r[f"{pre}.bias"]}


def _bn_pair(r: _Reader, pre: str) -> dict:
    return {"scale": r[f"{pre}.weight"], "bias": r[f"{pre}.bias"]}


def _bn_run(r: _Reader, pre: str) -> dict:
    return {"mean": r[f"{pre}.running_mean"], "var": r[f"{pre}.running_var"]}


def convert_backbone(r: _Reader, cfg: ResNetCfg, prefix: str = "feature.") -> Tuple[dict, dict]:
    """``feature.trunk.*`` -> (params, stats) trees of ``init_backbone(cfg)``.

    Trunk indexing follows the reference's Sequential assembly: [conv1, bn1,
    relu, pool1] then every residual block appended flat (backbone.py:416-424),
    so blocks start at index 4 — or 0 for the stem-less ResNet_fin
    (backbone.py:487-494)."""
    params: dict = {"stages": []}
    stats: dict = {"stages": []}
    idx = 0
    if cfg.stem:
        params = {
            "stem_conv": _hwio(r[f"{prefix}trunk.0.weight"]),
            "stem_bn": _bn_pair(r, f"{prefix}trunk.1"),
            "stages": [],
        }
        stats = {"stem_bn": _bn_run(r, f"{prefix}trunk.1"), "stages": []}
        idx = 4
    fwt = cfg.block == "fwt"
    for n_blocks in cfg.stage_sizes:
        sp, ss = [], []
        for _ in range(n_blocks):
            pre = f"{prefix}trunk.{idx}"
            blk = {
                "conv1": _hwio(r[f"{pre}.C1.weight"]),
                "bn1": _bn_pair(r, f"{pre}.BN1"),
                "conv2": _hwio(r[f"{pre}.C2.weight"]),
                "bn2": _bn_pair(r, f"{pre}.BN2"),
            }
            bs = {"bn1": _bn_run(r, f"{pre}.BN1"), "bn2": _bn_run(r, f"{pre}.BN2")}
            has_sc = f"{pre}.shortcut.weight" in r
            if has_sc:
                blk["conv_sc"] = _hwio(r[f"{pre}.shortcut.weight"])
                blk["bn_sc"] = _bn_pair(r, f"{pre}.BNshortcut")
                bs["bn_sc"] = _bn_run(r, f"{pre}.BNshortcut")
            if fwt:
                # FeatureWiseTransformation2d_fw noise strengths, stored
                # (1, C, 1, 1) in torch (backbone.py:324-325) -> (C,) here
                blk["fwt_gamma2"] = r[f"{pre}.BN2.gamma"].reshape(-1)
                blk["fwt_beta2"] = r[f"{pre}.BN2.beta"].reshape(-1)
                if has_sc:
                    blk["fwt_gamma_sc"] = r[f"{pre}.BNshortcut.gamma"].reshape(-1)
                    blk["fwt_beta_sc"] = r[f"{pre}.BNshortcut.beta"].reshape(-1)
            sp.append(blk)
            ss.append(bs)
            idx += 1
        params["stages"].append(sp)
        stats["stages"].append(ss)
    return params, stats


def _wcompute(r: _Reader, pre: str) -> dict:
    p = {}
    for i in range(1, 5):
        p[f"conv{i}"] = _conv1x1(r, f"{pre}.conv2d_{i}")
        p[f"bn{i}"] = _bn_pair(r, f"{pre}.bn_{i}")
    p["conv_last"] = _conv1x1(r, f"{pre}.conv2d_last")
    return p


def _gconv(r: _Reader, pre: str, bn: bool = True) -> dict:
    p = {"fc": _lin(r, f"{pre}.fc")}
    if bn:
        p["bn"] = _bn_pair(r, f"{pre}.bn")
    return p


def convert_head(r: _Reader) -> dict:
    """``fc.* / gnn.*`` -> the GnnNet head tree of ``gnnnet.init_head``
    (fc projector Linear+BN1d(track_running_stats=False), GNN_nl with
    add_module-named layers, methods/gnn.py:148-153)."""
    head = {
        "fc": {
            "linear": _lin(r, "fc.0"),
            "bn": {"scale": r["fc.1.weight"], "bias": r["fc.1.bias"]},
        },
        "gnn": {"layers": []},
    }
    i = 0
    while f"gnn.layer_w{i}.conv2d_1.weight" in r:
        head["gnn"]["layers"].append(
            {"w": _wcompute(r, f"gnn.layer_w{i}"), "l": _gconv(r, f"gnn.layer_l{i}")}
        )
        i += 1
    head["gnn"]["w_last"] = _wcompute(r, "gnn.w_comp_last")
    head["gnn"]["l_last"] = _gconv(r, "gnn.layer_last", bn=False)
    return head


def convert_state_dict(sd: Dict[str, Any], cfg: ResNetCfg, strict: bool = True) -> Tuple[dict, dict]:
    """Convert a full reference model state dict to ``(params, stats)``.

    Auto-detects what the checkpoint holds: every model has ``feature.*``;
    GnnNet adds ``fc.* / gnn.*``; BaselineTrain adds ``classifier.*``;
    DampNet adds the recovery modules (ProtoNet checkpoints are
    feature-only).  ``strict`` (default) raises if any tensor other than
    BN ``num_batches_tracked`` bookkeeping was left unmapped — the wrong
    ``cfg`` for the file fails loudly instead of importing a partial
    model."""
    r = _Reader(sd)
    feature, stats = convert_backbone(r, cfg)
    params: dict = {"feature": feature}
    if "fc.0.weight" in r:
        head = convert_head(r)
        params["fc"] = head["fc"]
        params["gnn"] = head["gnn"]
    if "classifier.weight" in r:
        params["classifier"] = _lin(r, "classifier")
    if "W_R.weight" in r:
        # DampNet recovery modules (all three variants share the names,
        # methods/dampnet.py:32-45, dampnet_full_class.py:33-46; torch
        # Bilinear weight [out, in1, in2] matches our layout verbatim).
        # The prototype/rolling-store banks are plain attributes in the
        # reference — never in state_dict — so damp_state is rebuilt fresh
        # by the import CLI, exactly as a reference eval re-derives it.
        params["W_R"] = r["W_R.weight"]
        params["V_R"] = _lin(r, "V_R")
        params["W_R_std"] = r["W_R_std.weight"]
        params["V_R_std"] = _lin(r, "V_R_std")
        for name in ("layer1", "layer2", "layer3", "layer1_add", "layer2_add", "layer3_add"):
            params[name] = _lin(r, name)
    left = r.unconsumed()
    if left and strict:
        raise ValueError(
            f"{len(left)} checkpoint tensors were not mapped (first 10: "
            f"{left[:10]}).  This usually means the wrong --model for the "
            "file; pass strict=False to import the mapped subset anyway."
        )
    return params, stats


# --------------------------------------------------------------------------
# Export: the inverse mapping (pytree -> reference state dict), so models
# trained HERE can be evaluated by the reference's own code — an independent
# cross-implementation parity check — or handed back to reference users.
# --------------------------------------------------------------------------


def _as_list(tree):
    """flax to_state_dict turns lists into {'0': ..., '1': ...}; accept both."""
    if isinstance(tree, (list, tuple)):
        return list(tree)
    return [tree[str(i)] for i in range(len(tree))]


def _oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _put_lin(out: dict, pre: str, p: dict) -> None:
    out[f"{pre}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
    out[f"{pre}.bias"] = np.asarray(p["b"])


def _put_conv1x1(out: dict, pre: str, p: dict) -> None:
    w = np.asarray(p["w"]).T  # [out, in]
    out[f"{pre}.weight"] = np.ascontiguousarray(w[:, :, None, None])
    out[f"{pre}.bias"] = np.asarray(p["b"])


def _put_bn(out: dict, pre: str, pair: dict, run: dict | None) -> None:
    out[f"{pre}.weight"] = np.asarray(pair["scale"])
    out[f"{pre}.bias"] = np.asarray(pair["bias"])
    if run is not None:
        out[f"{pre}.running_mean"] = np.asarray(run["mean"])
        out[f"{pre}.running_var"] = np.asarray(run["var"])
        # torch BN bookkeeping; numerically inert under the reference's
        # momentum-based updates but required by strict load_state_dict
        out[f"{pre}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_state_dict(params: dict, stats: dict, cfg: ResNetCfg) -> Dict[str, np.ndarray]:
    """(params, stats) trees -> a reference ``model.state_dict()`` dict.

    Accepts trees straight from the CLIs or the raw flax state-dict form
    read back from a ``.ckpt`` file (lists as {'0': ...}).  Emits whatever
    heads the params carry (fc/gnn, classifier); inverse of
    :func:`convert_state_dict`, roundtrip-pinned in tests."""
    out: Dict[str, np.ndarray] = {}
    feat, fstats = params["feature"], stats
    idx = 0
    if cfg.stem:
        out["feature.trunk.0.weight"] = _oihw(feat["stem_conv"])
        _put_bn(out, "feature.trunk.1", feat["stem_bn"], fstats["stem_bn"])
        idx = 4
    fwt = cfg.block == "fwt"
    for sp, ss in zip(_as_list(feat["stages"]), _as_list(fstats["stages"])):
        for blk, bs in zip(_as_list(sp), _as_list(ss)):
            pre = f"feature.trunk.{idx}"
            out[f"{pre}.C1.weight"] = _oihw(blk["conv1"])
            _put_bn(out, f"{pre}.BN1", blk["bn1"], bs["bn1"])
            out[f"{pre}.C2.weight"] = _oihw(blk["conv2"])
            _put_bn(out, f"{pre}.BN2", blk["bn2"], bs["bn2"])
            if "conv_sc" in blk:
                out[f"{pre}.shortcut.weight"] = _oihw(blk["conv_sc"])
                _put_bn(out, f"{pre}.BNshortcut", blk["bn_sc"], bs["bn_sc"])
            if fwt:
                out[f"{pre}.BN2.gamma"] = np.asarray(blk["fwt_gamma2"]).reshape(1, -1, 1, 1)
                out[f"{pre}.BN2.beta"] = np.asarray(blk["fwt_beta2"]).reshape(1, -1, 1, 1)
                if "conv_sc" in blk:
                    out[f"{pre}.BNshortcut.gamma"] = np.asarray(blk["fwt_gamma_sc"]).reshape(1, -1, 1, 1)
                    out[f"{pre}.BNshortcut.beta"] = np.asarray(blk["fwt_beta_sc"]).reshape(1, -1, 1, 1)
            idx += 1

    if "fc" in params:
        _put_lin(out, "fc.0", params["fc"]["linear"])
        out["fc.1.weight"] = np.asarray(params["fc"]["bn"]["scale"])
        out["fc.1.bias"] = np.asarray(params["fc"]["bn"]["bias"])
        gnn = params["gnn"]
        for i, layer in enumerate(_as_list(gnn["layers"])):
            for j in range(1, 5):
                _put_conv1x1(out, f"gnn.layer_w{i}.conv2d_{j}", layer["w"][f"conv{j}"])
                _put_bn(out, f"gnn.layer_w{i}.bn_{j}", layer["w"][f"bn{j}"], None)
            _put_conv1x1(out, f"gnn.layer_w{i}.conv2d_last", layer["w"]["conv_last"])
            _put_lin(out, f"gnn.layer_l{i}.fc", layer["l"]["fc"])
            _put_bn(out, f"gnn.layer_l{i}.bn", layer["l"]["bn"], None)
        for j in range(1, 5):
            _put_conv1x1(out, f"gnn.w_comp_last.conv2d_{j}", gnn["w_last"][f"conv{j}"])
            _put_bn(out, f"gnn.w_comp_last.bn_{j}", gnn["w_last"][f"bn{j}"], None)
        _put_conv1x1(out, "gnn.w_comp_last.conv2d_last", gnn["w_last"]["conv_last"])
        _put_lin(out, "gnn.layer_last.fc", gnn["l_last"]["fc"])
    if "classifier" in params:
        _put_lin(out, "classifier", params["classifier"])
    if "W_R" in params:
        out["W_R.weight"] = np.asarray(params["W_R"])
        _put_lin(out, "V_R", params["V_R"])
        out["W_R_std.weight"] = np.asarray(params["W_R_std"])
        _put_lin(out, "V_R_std", params["V_R_std"])
        for name in ("layer1", "layer2", "layer3", "layer1_add", "layer2_add", "layer3_add"):
            _put_lin(out, name, params[name])
    return out


def save_torch_tar(path: str, epoch: int, sd: Dict[str, np.ndarray]) -> None:
    """Write a reference-format ``{'epoch', 'state'}`` ``.tar``."""
    import torch  # deferred

    torch.save({"epoch": int(epoch), "state": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}}, path)


def load_torch_tar(path: str) -> Tuple[int, Dict[str, np.ndarray]]:
    """Read a reference ``<epoch>.tar`` -> (epoch, state dict of numpy arrays).

    torch is imported lazily — everything after this call is torch-free."""
    import torch  # deferred: only the importer needs it

    try:
        blob = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        blob = torch.load(path, map_location="cpu")
    if not isinstance(blob, dict) or "state" not in blob:
        raise ValueError(
            f"{path} is not a reference checkpoint (expected "
            "{'epoch', 'state'} as written by train.py:48)"
        )
    state = {k: v.detach().cpu().numpy() for k, v in blob["state"].items()}
    return int(blob.get("epoch", 0)), state
