"""Reference torch-checkpoint importer (utils/torch_import.py).

The golden fixture carries a COMPLETE real GnnNet state dict
(``fte2e_gnn.*`` — 146 tensors dumped straight from
``model.state_dict()`` by tools/gen_golden_reference.py), so the importer
is pinned against the exact key names and layouts the reference writes,
and its output is compared with the per-key conversion helpers the golden
suite has already verified numerically."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np
import pytest

from mft_tpu.methods import gnnnet as gn
from mft_tpu.models import backbone as bb
from mft_tpu.models.backbone import ResNetCfg
from mft_tpu.utils import torch_import as ti

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_reference.npz")
#: the generator's TinyNet: reference ResNet(SimpleBlock, [1,1,1,1], [8,12,14,16])
TINY = ResNetCfg((1, 1, 1, 1), (8, 12, 14, 16), "simple")
TINY_GCFG = gn.GnnNetCfg(feat_dim=16, n_way=2, n_support=2)


@pytest.fixture(scope="module")
def g():
    return np.load(FIX)


def _sd(g, prefix):
    """Strip ``prefix`` -> a real reference state dict (numpy values)."""
    return {k[len(prefix):]: np.asarray(g[k]) for k in g.files if k.startswith(prefix)}


def _assert_tree_equal(got, want):
    assert jax.tree_util.tree_structure(got) == jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, want)
    )
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_import_backbone_matches_golden_helpers(g):
    """convert_state_dict reproduces exactly the trees the golden tests
    build by hand (and verify numerically against the running reference)."""
    import test_golden_reference as tg

    params, stats = ti.convert_state_dict(_sd(g, "fte2e_gnn."), TINY)
    want_p, want_s = tg._tiny_backbone_trees(g, "fte2e_gnn.feature")
    _assert_tree_equal(params["feature"], want_p)
    _assert_tree_equal(stats, want_s)


def test_import_head_matches_golden_helpers(g):
    import test_golden_reference as tg

    params, _ = ti.convert_state_dict(_sd(g, "fte2e_gnn."), TINY)
    _assert_tree_equal(
        params["fc"],
        {
            "linear": tg.lin_mat(g["fte2e_gnn.fc.0.weight"], g["fte2e_gnn.fc.0.bias"]),
            "bn": {"scale": g["fte2e_gnn.fc.1.weight"], "bias": g["fte2e_gnn.fc.1.bias"]},
        },
    )
    want_gnn = {
        "layers": [
            {
                "w": tg._wcompute_tree(g, f"fte2e_gnn.gnn.layer_w{i}"),
                "l": tg._gconv_tree(g, f"fte2e_gnn.gnn.layer_l{i}"),
            }
            for i in range(2)
        ],
        "w_last": tg._wcompute_tree(g, "fte2e_gnn.gnn.w_comp_last"),
        "l_last": tg._gconv_tree(g, "fte2e_gnn.gnn.layer_last", bn=False),
    }
    _assert_tree_equal(params["gnn"], want_gnn)


def test_import_structure_matches_init(g):
    """Imported trees are drop-in for the init_* templates the CLIs build
    (flax from_state_dict is strict about structure)."""
    params, stats = ti.convert_state_dict(_sd(g, "fte2e_gnn."), TINY)
    ip, istats = bb.init_backbone(jax.random.PRNGKey(0), TINY)
    ih = gn.init_head(jax.random.PRNGKey(1), TINY_GCFG)
    ts = jax.tree_util.tree_structure
    assert ts(params["feature"]) == ts(jax.tree.map(np.asarray, ip))
    assert ts(stats) == ts(jax.tree.map(np.asarray, istats))
    assert ts({"fc": params["fc"], "gnn": params["gnn"]}) == ts(jax.tree.map(np.asarray, ih))


def test_import_roundtrip_into_eval_loader(g, tmp_path):
    """Imported checkpoint -> utils.checkpoint file -> the eval driver's
    strict loader, value-preserving end to end."""
    from mft_tpu.cli.finetune import _load_backbone_state
    from mft_tpu.utils.checkpoint import save_checkpoint

    params, stats = ti.convert_state_dict(_sd(g, "fte2e_gnn."), TINY)
    save_checkpoint(str(tmp_path), 400, {"epoch": 400, "params": params, "stats": stats})
    head = gn.init_head(jax.random.PRNGKey(0), TINY_GCFG)
    p2, s2 = _load_backbone_state(
        str(tmp_path / "400.ckpt"), TINY, template_extra={"fc": head["fc"], "gnn": head["gnn"]}
    )
    np.testing.assert_array_equal(np.asarray(p2["fc"]["linear"]["w"]), params["fc"]["linear"]["w"])
    np.testing.assert_array_equal(
        np.asarray(p2["feature"]["stem_conv"]), params["feature"]["stem_conv"]
    )
    np.testing.assert_array_equal(
        np.asarray(s2["stem_bn"]["mean"]), stats["stem_bn"]["mean"]
    )


def test_import_fwt_noise_params():
    """ResNet10_FW checkpoints: the (1,C,1,1) FWT gamma/beta noise strengths
    land as the (C,) fwt_* leaves, structure-compatible with init_backbone."""
    cfg = ResNetCfg((1, 1), (8, 12), "fwt")
    rs = np.random.RandomState(0)
    sd = {}
    sd["feature.trunk.0.weight"] = rs.randn(64, 3, 7, 7).astype(np.float32)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"feature.trunk.1.{k}"] = rs.randn(64).astype(np.float32)
    cin = 64
    for idx, cout in ((4, 8), (5, 12)):
        pre = f"feature.trunk.{idx}"
        sd[f"{pre}.C1.weight"] = rs.randn(cout, cin, 3, 3).astype(np.float32)
        sd[f"{pre}.C2.weight"] = rs.randn(cout, cout, 3, 3).astype(np.float32)
        for bn in ("BN1", "BN2"):
            for k in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.{bn}.{k}"] = rs.randn(cout).astype(np.float32)
        sd[f"{pre}.BN2.gamma"] = np.full((1, cout, 1, 1), 0.3, np.float32)
        sd[f"{pre}.BN2.beta"] = np.full((1, cout, 1, 1), 0.5, np.float32)
        sd[f"{pre}.shortcut.weight"] = rs.randn(cout, cin, 1, 1).astype(np.float32)
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{pre}.BNshortcut.{k}"] = rs.randn(cout).astype(np.float32)
        sd[f"{pre}.BNshortcut.gamma"] = np.full((1, cout, 1, 1), 0.3, np.float32)
        sd[f"{pre}.BNshortcut.beta"] = np.full((1, cout, 1, 1), 0.5, np.float32)
        cin = cout

    params, stats = ti.convert_state_dict(sd, cfg)
    blk = params["feature"]["stages"][0][0]
    assert blk["fwt_gamma2"].shape == (8,)
    np.testing.assert_array_equal(blk["fwt_gamma2"], sd["feature.trunk.4.BN2.gamma"].reshape(-1))
    ip, _ = bb.init_backbone(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(params["feature"]) == jax.tree_util.tree_structure(
        jax.tree.map(np.asarray, ip)
    )
    # the trainable mask freezes exactly the imported fwt_* leaves
    mask = bb.fwt_trainable_mask(params)
    frozen = [not m for m in jax.tree.leaves(mask)]
    assert sum(frozen) == 8  # 2 blocks x (gamma2, beta2, gamma_sc, beta_sc)


def test_import_strict_rejects_unmapped(g):
    sd = _sd(g, "fte2e_gnn.")
    sd["damp_extra.block.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="damp_extra.block.weight"):
        ti.convert_state_dict(sd, TINY)
    params, _ = ti.convert_state_dict(sd, TINY, strict=False)
    assert "fc" in params  # loose mode still imports the mapped subset


def test_import_missing_key_message(g):
    sd = {k: v for k, v in _sd(g, "fte2e_gnn.").items() if "trunk.5" not in k}
    with pytest.raises(KeyError, match="trunk.5"):
        ti.convert_state_dict(sd, TINY)


def test_export_roundtrips_reference_state_dict(g):
    """import -> export reproduces the reference's own state dict
    bit-exactly: every tensor equal, every key present (incl. the BN
    num_batches_tracked bookkeeping strict load_state_dict requires)."""
    sd = _sd(g, "fte2e_gnn.")
    params, stats = ti.convert_state_dict(sd, TINY)
    back = ti.export_state_dict(params, stats, TINY)
    assert set(back) == set(sd)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_accepts_raw_ckpt_form(g, tmp_path):
    """export works on the flax state-dict form read straight from a .ckpt
    file (lists restored as {'0': ...} dicts)."""
    from flax import serialization

    from mft_tpu.utils.checkpoint import save_checkpoint

    sd = _sd(g, "fte2e_gnn.")
    params, stats = ti.convert_state_dict(sd, TINY)
    save_checkpoint(str(tmp_path), 3, {"epoch": 3, "params": params, "stats": stats})
    raw = serialization.msgpack_restore((tmp_path / "3.ckpt").read_bytes())
    back = ti.export_state_dict(raw["params"], raw["stats"], TINY)
    np.testing.assert_array_equal(back["feature.trunk.0.weight"], sd["feature.trunk.0.weight"])
    assert set(back) == set(sd)


def test_export_fwt_inverse():
    """FWT noise strengths roundtrip (C,) <-> (1,C,1,1)."""
    cfg = ResNetCfg((1, 1), (8, 12), "fwt")
    key = jax.random.PRNGKey(0)
    ip, istats = bb.init_backbone(key, cfg)
    sd = ti.export_state_dict({"feature": jax.tree.map(np.asarray, ip)},
                              jax.tree.map(np.asarray, istats), cfg)
    assert sd["feature.trunk.4.BN2.gamma"].shape == (1, 8, 1, 1)
    p2, s2 = ti.convert_state_dict(sd, cfg)
    _assert_tree_equal(p2["feature"], ip)
    _assert_tree_equal(s2, istats)


def test_dampnet_roundtrip():
    """DampNet recovery modules (W_R bilinear, V_R, layer{1-3}[_add]) map
    both ways; export->import reproduces the init trees exactly."""
    from mft_tpu.methods import dampnet as dn

    cfg = ResNetCfg((1, 1), (8, 12), "simple")
    dcfg = dn.DampNetCfg(feat_dim=12, n_way=2, n_support=2)
    ip, istats = bb.init_backbone(jax.random.PRNGKey(0), cfg)
    dparams, _ = dn.init_dampnet(jax.random.PRNGKey(1), dcfg)
    params = {"feature": jax.tree.map(np.asarray, ip), **jax.tree.map(np.asarray, dparams)}
    sd = ti.export_state_dict(params, jax.tree.map(np.asarray, istats), cfg)
    assert "W_R.weight" in sd and sd["W_R.weight"].shape[1:] == (12, 12)
    p2, s2 = ti.convert_state_dict(sd, cfg)  # strict: every tensor mapped
    _assert_tree_equal(p2, params)
    _assert_tree_equal(s2, jax.tree.map(np.asarray, istats))


@pytest.mark.slow
def test_cli_import_dampnet_writes_damp_state(tmp_path):
    """The import CLI rebuilds fresh damp_state for DampNet checkpoints
    (the reference never persists the prototype banks)."""
    torch = pytest.importorskip("torch")
    from mft_tpu.cli import import_ckpt
    from mft_tpu.methods import dampnet as dn

    cfg = TINY  # 4 stages, so --model ResNet10 walks the same trunk indices
    dcfg = dn.DampNetCfg(feat_dim=16, n_way=2, n_support=2)
    ip, istats = bb.init_backbone(jax.random.PRNGKey(0), cfg)
    dparams, _ = dn.init_dampnet(jax.random.PRNGKey(1), dcfg)
    params = {"feature": jax.tree.map(np.asarray, ip), **jax.tree.map(np.asarray, dparams)}
    sd = ti.export_state_dict(params, jax.tree.map(np.asarray, istats), cfg)
    torch.save(
        {"epoch": 2, "state": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}},
        str(tmp_path / "2.tar"),
    )
    out = tmp_path / "out"
    rc = import_ckpt.main([str(tmp_path / "2.tar"), "--model", "ResNet10",
                           "--method", "dampnet_full_class", "--n_way", "2", "--n_shot", "2",
                           "--out_dir", str(out)])
    assert rc == 0
    from flax import serialization

    raw = serialization.msgpack_restore((out / "2.ckpt").read_bytes())
    assert "damp_state" in raw
    assert np.asarray(raw["damp_state"]["proto_mean"]).shape == (16,)


@pytest.mark.slow
def test_cli_import_dampnet_requires_explicit_method(tmp_path):
    """All three DampNet variants share identical state-dict keys, so the
    importer must refuse to guess: a checkpoint with recovery-net tensors
    under the default --method (gnnnet) errors out instead of silently
    building a full-variant damp_state under a gnnnet-named directory."""
    torch = pytest.importorskip("torch")
    from mft_tpu.cli import import_ckpt
    from mft_tpu.methods import dampnet as dn

    cfg = TINY
    dcfg = dn.DampNetCfg(feat_dim=16, n_way=2, n_support=2)
    ip, istats = bb.init_backbone(jax.random.PRNGKey(0), cfg)
    dparams, _ = dn.init_dampnet(jax.random.PRNGKey(1), dcfg)
    params = {"feature": jax.tree.map(np.asarray, ip), **jax.tree.map(np.asarray, dparams)}
    sd = ti.export_state_dict(params, jax.tree.map(np.asarray, istats), cfg)
    torch.save(
        {"epoch": 2, "state": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}},
        str(tmp_path / "2.tar"),
    )
    with pytest.raises(SystemExit):
        import_ckpt.main([str(tmp_path / "2.tar"), "--model", "ResNet10",
                          "--n_way", "2", "--n_shot", "2",
                          "--out_dir", str(tmp_path / "out")])
    assert not (tmp_path / "out" / "2.ckpt").exists()


@pytest.mark.slow
def test_cli_export_then_import(g, tmp_path):
    """Full file-level roundtrip through torch: .ckpt -> export CLI -> .tar
    -> import CLI -> .ckpt with identical tensors."""
    pytest.importorskip("torch")
    from mft_tpu.cli import export_ckpt, import_ckpt
    from mft_tpu.utils.checkpoint import save_checkpoint

    sd = _sd(g, "fte2e_gnn.")
    params, stats = ti.convert_state_dict(sd, TINY)
    save_checkpoint(str(tmp_path), 5, {"epoch": 5, "params": params, "stats": stats})
    assert export_ckpt.main([str(tmp_path / "5.ckpt"), "--model", "ResNet10",
                             "--out", str(tmp_path / "5.tar")]) == 0
    out = tmp_path / "back"
    assert import_ckpt.main([str(tmp_path / "5.tar"), "--model", "ResNet10",
                             "--out_dir", str(out)]) == 0
    from flax import serialization

    raw = serialization.msgpack_restore((out / "5.ckpt").read_bytes())
    got = np.asarray(raw["params"]["feature"]["stem_conv"])
    np.testing.assert_array_equal(got, params["feature"]["stem_conv"])


@pytest.mark.slow
def test_cli_import_real_tar(g, tmp_path):
    """End to end through torch: write a reference-format .tar, run the CLI,
    get an epoch-numbered .ckpt with a fresh opt_state."""
    torch = pytest.importorskip("torch")
    sd = _sd(g, "fte2e_gnn.")
    torch.save(
        {"epoch": 7, "state": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
        str(tmp_path / "7.tar"),
    )
    from mft_tpu.cli import import_ckpt

    out = tmp_path / "out"
    rc = import_ckpt.main([str(tmp_path / "7.tar"), "--model", "ResNet10", "--out_dir", str(out)])
    assert rc == 0
    assert (out / "7.ckpt").exists()
    from flax import serialization

    raw = serialization.msgpack_restore((out / "7.ckpt").read_bytes())
    assert raw["epoch"] == 7
    assert "opt_state" in raw and "params" in raw and "stats" in raw
