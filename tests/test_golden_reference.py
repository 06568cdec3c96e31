"""Bit-level parity against golden tensors produced by RUNNING the torch
reference (tools/gen_golden_reference.py -> tests/fixtures/golden_reference.npz).

Unlike tests/oracles.py (NumPy re-derivations of the reference math, i.e. an
independent re-*reading*), these fixtures are independent *artifacts*: the
reference's own modules executed on fixed-seed tensors.  A transcription
misreading of e.g. Wcompute's softmax axis (reference methods/gnn.py:106-115)
or torch SGD dampening (meta_template.py:166) would fail here.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mft_tpu.models import backbone as bb
from mft_tpu.models import gnn
from mft_tpu.train import optimizers as opt

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_reference.npz")


@pytest.fixture(scope="module")
def g():
    assert os.path.exists(FIX), "run tools/gen_golden_reference.py to regenerate"
    return dict(np.load(FIX))


def conv_hwio(w_oihw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))


def conv1x1_mat(w_oi11: np.ndarray, b: np.ndarray) -> dict:
    return {"w": jnp.asarray(w_oi11[:, :, 0, 0].T), "b": jnp.asarray(b)}


def lin_mat(w_oi: np.ndarray, b: np.ndarray) -> dict:
    return {"w": jnp.asarray(w_oi.T), "b": jnp.asarray(b)}


def bn_pair(g, prefix: str):
    return {"scale": jnp.asarray(g[f"{prefix}.weight"]), "bias": jnp.asarray(g[f"{prefix}.bias"])}


def bn_run(g, prefix: str):
    return {"mean": jnp.asarray(g[f"{prefix}.running_mean"]), "var": jnp.asarray(g[f"{prefix}.running_var"])}


# --------------------------------------------------------------------------
# SimpleBlock (reference backbone.py:216-261)
# --------------------------------------------------------------------------


def _simple_block_trees(g):
    p = {
        "conv1": conv_hwio(g["simple_block.C1.weight"]),
        "bn1": bn_pair(g, "simple_block.BN1"),
        "conv2": conv_hwio(g["simple_block.C2.weight"]),
        "bn2": bn_pair(g, "simple_block.BN2"),
        "conv_sc": conv_hwio(g["simple_block.shortcut.weight"]),
        "bn_sc": bn_pair(g, "simple_block.BNshortcut"),
    }
    s = {
        "bn1": bn_run(g, "simple_block.BN1"),
        "bn2": bn_run(g, "simple_block.BN2"),
        "bn_sc": bn_run(g, "simple_block.BNshortcut"),
    }
    x = jnp.asarray(np.transpose(g["simple_block.x"], (0, 2, 3, 1)))  # NCHW->NHWC
    return p, s, x


def test_simple_block_eval_mode(g):
    p, s, x = _simple_block_trees(g)
    ctx = bb.BNCtx(use_batch_stats=False, update_stats=False, momentum=0.1, sample_mask=None)
    y, _ = bb._apply_block(p, s, x, half_res=True, ctx=ctx, fwt=False, train=False, rng=None)
    want = np.transpose(g["simple_block.y_eval"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_simple_block_train_mode_and_stat_update(g):
    p, s, x = _simple_block_trees(g)
    ctx = bb.BNCtx(use_batch_stats=True, update_stats=True, momentum=0.1, sample_mask=None)
    y, new_s = bb._apply_block(p, s, x, half_res=True, ctx=ctx, fwt=False, train=True, rng=None)
    want = np.transpose(g["simple_block.y_train"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    for ours, theirs in [("bn1", "BN1"), ("bn2", "BN2"), ("bn_sc", "BNshortcut")]:
        np.testing.assert_allclose(
            np.asarray(new_s[ours]["mean"]), g[f"simple_block.updated.{theirs}.running_mean"], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_s[ours]["var"]), g[f"simple_block.updated.{theirs}.running_var"], rtol=1e-4, atol=1e-6
        )


# --------------------------------------------------------------------------
# GNN head (reference methods/gnn.py)
# --------------------------------------------------------------------------


def _wcompute_tree(g, prefix: str):
    p = {}
    for i in range(1, 5):
        p[f"conv{i}"] = conv1x1_mat(g[f"{prefix}.conv2d_{i}.weight"], g[f"{prefix}.conv2d_{i}.bias"])
        p[f"bn{i}"] = bn_pair(g, f"{prefix}.bn_{i}")
    p["conv_last"] = conv1x1_mat(g[f"{prefix}.conv2d_last.weight"], g[f"{prefix}.conv2d_last.bias"])
    return p


def _gconv_tree(g, prefix: str, bn: bool = True):
    p = {"fc": lin_mat(g[f"{prefix}.fc.weight"], g[f"{prefix}.fc.bias"])}
    if bn:
        p["bn"] = bn_pair(g, f"{prefix}.bn")
    return p


def test_wcompute(g):
    p = _wcompute_tree(g, "wcompute")
    w = gnn.apply_wcompute(p, jnp.asarray(g["wcompute.x"]))
    np.testing.assert_allclose(np.asarray(w), g["wcompute.W"], rtol=1e-4, atol=1e-5)


def test_gconv(g):
    p = _gconv_tree(g, "gconv")
    y = gnn.apply_gconv(p, jnp.asarray(g["gconv.w_ops"]), jnp.asarray(g["gconv.x"]))
    np.testing.assert_allclose(np.asarray(y), g["gconv.y"], rtol=1e-4, atol=1e-5)


def test_gnn_nl_full(g):
    p = {
        "layers": [
            {"w": _wcompute_tree(g, f"gnn_nl.layer_w{i}"), "l": _gconv_tree(g, f"gnn_nl.layer_l{i}")}
            for i in range(2)
        ],
        "w_last": _wcompute_tree(g, "gnn_nl.w_comp_last"),
        "l_last": _gconv_tree(g, "gnn_nl.layer_last", bn=False),
    }
    y = gnn.apply_gnn(p, jnp.asarray(g["gnn_nl.x"]))
    np.testing.assert_allclose(np.asarray(y), g["gnn_nl.y"], rtol=1e-4, atol=1e-5)


def test_gnnnet_set_forward_full(g):
    """The complete GnnNet episodic head vs the reference's own
    set_forward(x, is_feature=True) (methods/gnnnet.py:47-68): fc projector,
    per-query graph build, support-label one-hot plumbing, GNN_nl, and the
    class-major query-slot score ordering — one end-to-end artifact."""
    from mft_tpu.methods import gnnnet as gn

    head = {
        "fc": {
            "w": jnp.asarray(g["gnnnet.fc.0.weight"].T),
            "b": jnp.asarray(g["gnnnet.fc.0.bias"]),
        },
        "bn": {"scale": jnp.asarray(g["gnnnet.fc.1.weight"]), "bias": jnp.asarray(g["gnnnet.fc.1.bias"])},
    }
    gnn_p = {
        "layers": [
            {"w": _wcompute_tree(g, f"gnnnet.gnn.layer_w{i}"), "l": _gconv_tree(g, f"gnnnet.gnn.layer_l{i}")}
            for i in range(2)
        ],
        "w_last": _wcompute_tree(g, "gnnnet.gnn.w_comp_last"),
        "l_last": _gconv_tree(g, "gnnnet.gnn.layer_last", bn=False),
    }
    full_head = {"fc": {"linear": head["fc"], "bn": head["bn"]}, "gnn": gnn_p}
    cfg = gn.GnnNetCfg(feat_dim=16, n_way=3, n_support=2)
    scores = gn.gnn_scores(full_head, jnp.asarray(g["gnnnet.feats"]), cfg, n_query=15)
    np.testing.assert_allclose(np.asarray(scores), g["gnnnet.scores"], rtol=1e-3, atol=1e-4)


def test_gnnnet50_compressed_set_forward(g):
    """The 50-shot compressed head vs the reference gnnnet_copy
    (methods/gnnnet_copy.py:51-78): support embeddings pair-averaged after
    the fc projection -> half the graph slots."""
    from mft_tpu.methods import gnnnet as gn

    full_head = {
        "fc": {
            "linear": lin_mat(g["gnnnet50.fc.0.weight"], g["gnnnet50.fc.0.bias"]),
            "bn": {"scale": jnp.asarray(g["gnnnet50.fc.1.weight"]), "bias": jnp.asarray(g["gnnnet50.fc.1.bias"])},
        },
        "gnn": {
            "layers": [
                {"w": _wcompute_tree(g, f"gnnnet50.gnn.layer_w{i}"), "l": _gconv_tree(g, f"gnnnet50.gnn.layer_l{i}")}
                for i in range(2)
            ],
            "w_last": _wcompute_tree(g, "gnnnet50.gnn.w_comp_last"),
            "l_last": _gconv_tree(g, "gnnnet50.gnn.layer_last", bn=False),
        },
    }
    cfg = gn.GnnNetCfg(feat_dim=16, n_way=3, n_support=4, support_compress=2)
    scores = gn.gnn_scores(full_head, jnp.asarray(g["gnnnet50.feats"]), cfg, n_query=15)
    np.testing.assert_allclose(np.asarray(scores), g["gnnnet50.scores"], rtol=1e-3, atol=1e-4)


def _dampnet_param_tree(g, prefix: str):
    params = {
        "fc": {
            "linear": lin_mat(g[f"{prefix}.fc.0.weight"], g[f"{prefix}.fc.0.bias"]),
            "bn": {"scale": jnp.asarray(g[f"{prefix}.fc.1.weight"]), "bias": jnp.asarray(g[f"{prefix}.fc.1.bias"])},
        },
        "gnn": {
            "layers": [
                {"w": _wcompute_tree(g, f"{prefix}.gnn.layer_w{i}"), "l": _gconv_tree(g, f"{prefix}.gnn.layer_l{i}")}
                for i in range(2)
            ],
            "w_last": _wcompute_tree(g, f"{prefix}.gnn.w_comp_last"),
            "l_last": _gconv_tree(g, f"{prefix}.gnn.layer_last", bn=False),
        },
        "W_R": jnp.asarray(g[f"{prefix}.W_R.weight"]),
        "V_R": lin_mat(g[f"{prefix}.V_R.weight"], g[f"{prefix}.V_R.bias"]),
        "W_R_std": jnp.asarray(g[f"{prefix}.W_R_std.weight"]),
        "V_R_std": lin_mat(g[f"{prefix}.V_R_std.weight"], g[f"{prefix}.V_R_std.bias"]),
    }
    for name in ("layer1", "layer2", "layer3", "layer1_add", "layer2_add", "layer3_add"):
        params[name] = lin_mat(g[f"{prefix}.{name}.weight"], g[f"{prefix}.{name}.bias"])
    return params


def test_dampnet_domain_shift_full(g):
    """The complete DampNet eval path vs the reference's own
    set_forward(x, is_feature=True, domain_shift=True)
    (dampnet_full_class.py:262-352): class statistics, both NTN comparison
    modules, the mult/add recovery MLPs, recovered-feature projection and
    GNN scoring."""
    from mft_tpu.methods import dampnet as dn

    params = _dampnet_param_tree(g, "dampnet")
    state = {
        "proto_mean": jnp.asarray(g["dampnet.proto_mean"]),
        "proto_std": jnp.asarray(g["dampnet.proto_std"]),
        "initialized": jnp.ones((), jnp.bool_),
    }
    cfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")
    scores = dn.dampnet_scores(params, state, jnp.asarray(g["dampnet.feats"]), cfg, 15, mode="domain_shift")
    np.testing.assert_allclose(np.asarray(scores), g["dampnet.scores"], rtol=1e-3, atol=1e-4)


def test_dampnet_unsup_golden(g):
    """The ``--unsupervised`` recovery path vs the reference's own
    ``set_forward_unsup(x, x_u_mean, x_u_std, is_feature=True)``
    (dampnet_full_class.py:355-402): the recovery NTN conditioned on
    external unlabeled-set stats instead of the episode's support stats,
    then fc + graph scoring."""
    if "dunsup.feats" not in g:
        pytest.skip("fixture predates the unsup golden; rerun tools/gen_golden_reference.py")
    from mft_tpu.methods import dampnet as dn

    params = _dampnet_param_tree(g, "dampnet")
    state = {
        "proto_mean": jnp.asarray(g["dampnet.proto_mean"]),
        "proto_std": jnp.asarray(g["dampnet.proto_std"]),
        "initialized": jnp.ones((), jnp.bool_),
    }
    cfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")
    scores = dn.dampnet_scores(
        params, state, jnp.asarray(g["dunsup.feats"]), cfg, 15, mode="unsup",
        unsup_stats=(jnp.asarray(g["dunsup.x_u_mean"]), jnp.asarray(g["dunsup.x_u_std"])),
    )
    np.testing.assert_allclose(np.asarray(scores), g["dunsup.scores"], rtol=1e-3, atol=1e-4)


def test_dampnet_adaptation_full_golden(g):
    """The dampnet linear-probe eval member vs the reference's own
    ``set_forward_adaptation_full(x, is_feature=True)``
    (dampnet_full_class.py:471-548): recovery from the episode's CLASS
    statistics, fc projection to gnn_dim=128, then the 100-epoch x batch-4
    (ragged 4+2) reference-SGD probe on the projected support, scoring the
    projected query — replaying the recorded permutations and probe init.
    FLOAT64 on both sides."""
    if "dadapt.feats" not in g:
        pytest.skip("fixture predates the adaptation_full golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec, support_labels
    from mft_tpu.methods import dampnet as dn
    from mft_tpu.methods.baseline import ce_loss, classifier_logits
    from mft_tpu.train.inner_loop import InnerLoopCfg, inner_fit, schedule_from_perms
    from mft_tpu.train.optimizers import reference_probe_sgd

    spec = EpisodeSpec(n_way=3, n_support=2, n_query=15)
    cfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")

    with jax.enable_x64():
        params = _as_f64(_dampnet_param_tree(g, "dampnet"))
        state = {
            "proto_mean": jnp.asarray(g["dampnet.proto_mean"]).astype(jnp.float64),
            "proto_std": jnp.asarray(g["dampnet.proto_std"]).astype(jnp.float64),
            "initialized": jnp.ones((), jnp.bool_),
        }
        feats = jnp.asarray(g["dadapt.feats"])
        proj = dn.recovered_projection(params, state, feats, cfg)  # [3, 17, 128]
        z_support = proj[:, : spec.n_support].reshape(spec.support_size, -1)
        z_query = proj[:, spec.n_support :].reshape(spec.query_size, -1)
        y = support_labels(spec)
        head0 = _as_f64(lin_mat(g["dadapt.clf.weight"], g["dadapt.clf.bias"]))
        icfg = InnerLoopCfg(epochs=100, batch_size=4, bank_size=spec.support_size)
        sched = schedule_from_perms(g["dadapt.perms"], icfg)

        def loss_fn(p, idx, w):
            return ce_loss(classifier_logits(p, z_support[idx]), y[idx], w)

        @jax.jit
        def run(head):
            head = inner_fit(loss_fn, head, reference_probe_sgd(0.01), jax.random.PRNGKey(0), icfg, schedule=sched)
            return classifier_logits(head, z_query)

        scores = np.asarray(run(head0))
        np.testing.assert_allclose(scores, g["dadapt.scores"], rtol=1e-6, atol=1e-8)


def test_simple_block2_eval_mode_golden(g):
    """SimpleBlock2 (reference backbone.py:90-130, the ResNet10_FW block) in
    eval mode: the FWT layers reduce to plain running-stat BN; verifies the
    block wiring (strided C1, FWT-BN on the second conv and the shortcut)."""
    if "simple_block2.x" not in g:
        pytest.skip("fixture predates the SimpleBlock2 golden; rerun tools/gen_golden_reference.py")
    p = {
        "conv1": conv_hwio(g["simple_block2.C1.weight"]),
        "bn1": bn_pair(g, "simple_block2.BN1"),
        "conv2": conv_hwio(g["simple_block2.C2.weight"]),
        "bn2": bn_pair(g, "simple_block2.BN2"),
        "fwt_gamma2": jnp.asarray(g["simple_block2.BN2.gamma"].reshape(-1)),
        "fwt_beta2": jnp.asarray(g["simple_block2.BN2.beta"].reshape(-1)),
        "conv_sc": conv_hwio(g["simple_block2.shortcut.weight"]),
        "bn_sc": bn_pair(g, "simple_block2.BNshortcut"),
        "fwt_gamma_sc": jnp.asarray(g["simple_block2.BNshortcut.gamma"].reshape(-1)),
        "fwt_beta_sc": jnp.asarray(g["simple_block2.BNshortcut.beta"].reshape(-1)),
    }
    s = {
        "bn1": bn_run(g, "simple_block2.BN1"),
        "bn2": bn_run(g, "simple_block2.BN2"),
        "bn_sc": bn_run(g, "simple_block2.BNshortcut"),
    }
    x = jnp.asarray(np.transpose(g["simple_block2.x"], (0, 2, 3, 1)))
    ctx = bb.BNCtx(use_batch_stats=False, update_stats=False, momentum=0.1, sample_mask=None)
    y, _ = bb._apply_block(p, s, x, half_res=True, ctx=ctx, fwt=True, train=False, rng=None)
    want = np.transpose(g["simple_block2.y_eval"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_fwt_train_mode_golden(g):
    """FeatureWiseTransformation2d_fw in TRAIN mode vs the reference's own
    forward (backbone.py:333-350): batch-stats BN + running-stat update,
    then ``(1 + eps_g*softplus100(gamma))*out + eps_b*softplus100(beta)``
    replaying the reference's EXACT captured noise draws.  The eval-mode
    reduction is covered by test_simple_block2_eval_mode_golden; this pins
    the sampled-noise math and the beta=100 softplus."""
    if "fwt.x" not in g:
        pytest.skip("fixture predates the FWT train-mode golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.ops.norm import batch_norm, softplus100

    with jax.enable_x64():
        x = jnp.asarray(np.transpose(g["fwt.x"], (0, 2, 3, 1)))  # NCHW->NHWC, f64
        p = {"scale": jnp.asarray(g["fwt.weight"]), "bias": jnp.asarray(g["fwt.bias"])}
        s = {"mean": jnp.asarray(g["fwt.running_mean"]), "var": jnp.asarray(g["fwt.running_var"])}
        out, new_s = batch_norm(x, p, s, use_batch_stats=True, update_stats=True, momentum=0.1)
        gamma = 1.0 + jnp.asarray(g["fwt.eps_gamma"]) * softplus100(jnp.asarray(g["fwt.gamma"]).reshape(-1))
        beta = jnp.asarray(g["fwt.eps_beta"]) * softplus100(jnp.asarray(g["fwt.beta"]).reshape(-1))
        y = gamma * out + beta
        want = np.transpose(g["fwt.y_train"], (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(new_s["mean"]), g["fwt.updated.running_mean"], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(new_s["var"]), g["fwt.updated.running_var"], rtol=1e-10)


def test_dampnet_prototype_branches_golden(g):
    """The PROTOTYPE DampNet variant vs the reference's own methods/dampnet.py
    set_forward: the plain branch with the mean-center/L2-norm projection
    (:121-137), the rolling-store-driven 'recover' branch (:210-249), and
    the domain-shift eval branch (:250-291)."""
    if "dproto.feats" not in g:
        pytest.skip("fixture predates the prototype-dampnet golden; rerun tools/gen_golden_reference.py")
    from mft_tpu.methods import dampnet as dn

    params = _dampnet_param_tree(g, "dproto")
    cfg = dn.prototype_cfg(feat_dim=16, n_way=3, n_support=2)
    state = {
        "proto_mean": jnp.asarray(g["dproto.proto_mean"]),
        "proto_std": jnp.asarray(g["dproto.proto_std"]),
        "initialized": jnp.ones((), jnp.bool_),
        "store_mean": jnp.asarray(g["dproto.store_mean"]),
        "store_std": jnp.asarray(g["dproto.store_std"]),
        "count": jnp.full((), 152, jnp.int32),
    }
    feats = jnp.asarray(g["dproto.feats"])
    for mode, key in [("plain", "scores_plain"), ("recover", "scores_recover"), ("domain_shift", "scores_ds")]:
        scores = dn.dampnet_scores(params, state, feats, cfg, 15, mode=mode)
        np.testing.assert_allclose(np.asarray(scores), g[f"dproto.{key}"], rtol=1e-3, atol=1e-4, err_msg=mode)


def test_dampnet_prototype_corrupt_golden(g):
    """The prototype variant's odd-count CORRUPTION branch vs the reference's
    own run (dampnet.py:138-209), replaying the recorded np.random corruption
    draws through ``corrupt_x``: corrupt-support stats (std over all support
    features) vs the rolling-store prototypes, both NTNs, mult/add recovery
    of the CORRUPTED features, znorm projection, GNN scoring."""
    if "dproto.corrupt_x" not in g:
        pytest.skip("fixture predates the prototype-corrupt golden; rerun tools/gen_golden_reference.py")
    from mft_tpu.methods import dampnet as dn

    params = _dampnet_param_tree(g, "dproto")
    cfg = dn.prototype_cfg(feat_dim=16, n_way=3, n_support=2)
    state = {
        "proto_mean": jnp.asarray(g["dproto.proto_mean"]),
        "proto_std": jnp.asarray(g["dproto.proto_std"]),
        "initialized": jnp.ones((), jnp.bool_),
        "store_mean": jnp.asarray(g["dproto.store_mean"]),
        "store_std": jnp.asarray(g["dproto.store_std"]),
        "count": jnp.full((), 151, jnp.int32),
    }
    scores = dn.dampnet_scores(
        params, state, jnp.asarray(g["dproto.feats"]), cfg, 15, mode="corrupt",
        corrupt_x=jnp.asarray(g["dproto.corrupt_x"]),
    )
    np.testing.assert_allclose(np.asarray(scores), g["dproto.scores_corrupt"], rtol=1e-3, atol=1e-4)


def test_dampnet_corrupt_backward_golden(g):
    """The dampnet_full_class CORRUPTION training step's backward pass vs the
    reference's own ``set_forward_loss(x).backward()`` through the odd-count
    branch (dampnet_full_class.py:145-218), replaying the recorded corruption
    draws: corrupt-support stats vs the FIXED final prototypes, recovery,
    fc+GNN scoring, CE.  Pins the freeze semantics: ONLY fc[0].weight/bias
    are pinned (:199-200); ``gnn.eval()`` (:201) is a numeric no-op for the
    stat-free BNs, so the GNN, the fc BN affine, and the recovery nets all
    receive real gradients.  FLOAT64 on both sides."""
    if "dcorrupt.loss" not in g:
        pytest.skip("fixture predates the corrupt-backward golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.methods import dampnet as dn

    dcfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")
    with jax.enable_x64():
        params = _as_f64(_dampnet_param_tree(g, "dcorrupt"))
        state = {
            "proto_mean": jnp.asarray(g["dcorrupt.proto_mean"], jnp.float64),
            "proto_std": jnp.asarray(g["dcorrupt.proto_std"], jnp.float64),
            "initialized": jnp.ones((), jnp.bool_),
        }
        feats = jnp.asarray(g["dcorrupt.feats"], jnp.float64)
        cx = jnp.asarray(g["dcorrupt.corrupt_x"], jnp.float64)

        def loss_fn(p):
            scores = dn.dampnet_scores(p, state, feats, dcfg, 5, mode="corrupt", corrupt_x=cx)
            return dn.dampnet_loss(scores, 3, 5)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(loss), float(g["dcorrupt.loss"]), rtol=1e-9)

        # fc[0] is frozen: exactly-zero grads here, no fixture entries there
        assert float(jnp.abs(grads["fc"]["linear"]["w"]).max()) == 0.0
        assert float(jnp.abs(grads["fc"]["linear"]["b"]).max()) == 0.0
        gv = _grad_fixture_view(g, "dcorrupt.grad", "dcorrupt")
        gv["dcorrupt.fc.0.weight"] = np.zeros_like(g["dcorrupt.fc.0.weight"])
        gv["dcorrupt.fc.0.bias"] = np.zeros_like(g["dcorrupt.fc.0.bias"])
        want = _dampnet_param_tree(gv, "dcorrupt")
        # the unfrozen head + recovery grads must be genuinely live
        assert float(np.abs(gv["dcorrupt.fc.1.weight"]).max()) > 0.0
        assert float(np.abs(gv["dcorrupt.layer1.weight"]).max()) > 0.0
        _assert_tree_close(grads, want, rtol=1e-6, atol_frac=1e-8, label="grads")


# --------------------------------------------------------------------------
# BottleneckBlock (reference backbone.py:264-311)
# --------------------------------------------------------------------------


def test_bottleneck_block_golden(g):
    if "bottleneck.x" not in g:
        pytest.skip("fixture predates the bottleneck golden; rerun tools/gen_golden_reference.py")
    p = {
        "conv1": conv_hwio(g["bottleneck.C1.weight"]),
        "bn1": bn_pair(g, "bottleneck.BN1"),
        "conv2": conv_hwio(g["bottleneck.C2.weight"]),
        "conv2_b": jnp.asarray(g["bottleneck.C2.bias"]),
        "bn2": bn_pair(g, "bottleneck.BN2"),
        "conv3": conv_hwio(g["bottleneck.C3.weight"]),
        "bn3": bn_pair(g, "bottleneck.BN3"),
        "conv_sc": conv_hwio(g["bottleneck.shortcut.weight"]),
    }
    s = {k: bn_run(g, f"bottleneck.{K}") for k, K in [("bn1", "BN1"), ("bn2", "BN2"), ("bn3", "BN3")]}
    x = jnp.asarray(np.transpose(g["bottleneck.x"], (0, 2, 3, 1)))
    ctx = bb.BNCtx(use_batch_stats=True, update_stats=False, momentum=0.1, sample_mask=None)
    y, _ = bb._apply_block(p, s, x, half_res=True, ctx=ctx, fwt=False, train=True, rng=None)
    want = np.transpose(g["bottleneck.y_train"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# END-TO-END transfer fine-tune (finetune.py:45-328) — the headline path,
# executed by the reference itself (VERDICT r2 Missing #1)
# --------------------------------------------------------------------------

TINY_BCFG = bb.ResNetCfg((1, 1, 1, 1), (8, 12, 14, 16), "simple", flatten=True)


def _tiny_backbone_trees(g, prefix):
    """TinyNet = the reference's own ResNet(SimpleBlock, [1,1,1,1],
    [8,8,12,16]) (tools/gen_golden_reference.py): trunk.0 stem conv,
    trunk.1 stem BN, trunk.4..7 the four SimpleBlocks."""
    p = {
        "stem_conv": conv_hwio(g[f"{prefix}.trunk.0.weight"]),
        "stem_bn": bn_pair(g, f"{prefix}.trunk.1"),
        "stages": [],
    }
    s = {"stem_bn": bn_run(g, f"{prefix}.trunk.1"), "stages": []}
    for t in range(4, 8):
        pre = f"{prefix}.trunk.{t}"
        blk = {
            "conv1": conv_hwio(g[f"{pre}.C1.weight"]),
            "bn1": bn_pair(g, f"{pre}.BN1"),
            "conv2": conv_hwio(g[f"{pre}.C2.weight"]),
            "bn2": bn_pair(g, f"{pre}.BN2"),
        }
        bs = {"bn1": bn_run(g, f"{pre}.BN1"), "bn2": bn_run(g, f"{pre}.BN2")}
        if f"{pre}.shortcut.weight" in g:
            blk["conv_sc"] = conv_hwio(g[f"{pre}.shortcut.weight"])
            blk["bn_sc"] = bn_pair(g, f"{pre}.BNshortcut")
            bs["bn_sc"] = bn_run(g, f"{pre}.BNshortcut")
        p["stages"].append([blk])
        s["stages"].append([bs])
    return p, s


def _e2e_tensors():
    """Regenerate the episode the generator fed torch (same seed — the
    images never hit the fixture) and shape them for the jax members:
    NHWC clean episode + the materialized replica bank with the reference's
    triple-counted clean support (finetune.py:225-233)."""
    rs = np.random.RandomState(123)
    shape = (2, 17, 3, 224, 224)
    x_clean = rs.rand(*shape).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :2] = rs.rand(2, 2, 3, 224, 224).astype(np.float32)
    ep = np.transpose(x_clean, (0, 1, 3, 4, 2))
    sup = ep[:, :2]
    aug_sup = np.transpose(x_aug, (0, 1, 3, 4, 2))[:, :2]
    bank = np.stack([sup, sup, sup, aug_sup])
    return jnp.asarray(ep), jnp.asarray(bank)


def test_finetune_e2e_transfer_golden(g):
    """Both ensemble members of the composed hot path vs the reference's own
    finetune()/finetune_linear() run end to end (finetune.py:45-328): bank
    assembly, the inner Adam loops with train-mode BN over minibatches of 5
    (ragged last batches masked), and head scoring on the adapted backbone —
    with the reference's recorded np.random minibatch permutations replayed
    through the scan engine and its torch-default classifier inits
    transplanted."""
    if "fte2e.scores_gnn" not in g:
        pytest.skip("fixture predates the e2e golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.train import eval_engine as ee
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    spec = EpisodeSpec(n_way=2, n_support=2, n_query=15)
    gcfg = gn.GnnNetCfg(feat_dim=16, n_way=2, n_support=2)
    tcfg = ee.TransferCfg(fine_tune_epochs=1, linear_epochs=20, bn_mode="minibatch")
    ep, bank = _e2e_tensors()
    k = jax.random.PRNGKey(0)

    # --- GNN member (finetune.py:182-328) --------------------------------
    params_g, stats_g = _tiny_backbone_trees(g, "fte2e_gnn.feature")
    head = {
        "fc": {
            "linear": lin_mat(g["fte2e_gnn.fc.0.weight"], g["fte2e_gnn.fc.0.bias"]),
            "bn": {"scale": jnp.asarray(g["fte2e_gnn.fc.1.weight"]), "bias": jnp.asarray(g["fte2e_gnn.fc.1.bias"])},
        },
        "gnn": {
            "layers": [
                {"w": _wcompute_tree(g, f"fte2e_gnn.gnn.layer_w{i}"), "l": _gconv_tree(g, f"fte2e_gnn.gnn.layer_l{i}")}
                for i in range(2)
            ],
            "w_last": _wcompute_tree(g, "fte2e_gnn.gnn.w_comp_last"),
            "l_last": _gconv_tree(g, "fte2e_gnn.gnn.layer_last", bn=False),
        },
    }
    sched_gnn = schedule_from_perms(g["fte2e.perms_gnn"], InnerLoopCfg(epochs=1, batch_size=5, bank_size=16))
    fn_gnn = jax.jit(
        lambda p, s, h, e, b: ee.gnn_member_scores(
            p, s, h, e, b, k, k, bcfg=TINY_BCFG, gcfg=gcfg, spec=spec, tcfg=tcfg,
            gen_examples=1, inner_schedule=sched_gnn,
        )
    )
    scores_gnn = np.asarray(fn_gnn(params_g, stats_g, head, ep, bank))
    np.testing.assert_allclose(scores_gnn, g["fte2e.scores_gnn"], rtol=2e-3, atol=2e-3)

    # --- linear member (finetune_linear, finetune.py:45-174) -------------
    params_b, stats_b = _tiny_backbone_trees(g, "fte2e_base")
    head0 = lin_mat(g["fte2e.clf_linear.weight"], g["fte2e.clf_linear.bias"])
    sched_lin = schedule_from_perms(g["fte2e.perms_linear"], InnerLoopCfg(epochs=20, batch_size=5, bank_size=4))
    fn_lin = jax.jit(
        lambda p, s, e, b: ee.linear_member_scores(
            p, s, e, b, k, k, bcfg=TINY_BCFG, spec=spec, tcfg=tcfg,
            gen_examples=1, inner_schedule=sched_lin, head0=head0,
        )
    )
    scores_lin = np.asarray(fn_lin(params_b, stats_b, ep, bank))
    np.testing.assert_allclose(scores_lin, g["fte2e.scores_linear"], rtol=2e-3, atol=2e-3)

    # --- the --method all ensemble is their softmax sum (:648-650) -------
    np.testing.assert_allclose(scores_lin + scores_gnn, g["fte2e.scores_all"], rtol=2e-3, atol=4e-3)


def _e2e50_tensors():
    """Regenerate the 50-shot-style episode the generator fed torch (same
    seed) in NHWC, plus the materialized replica bank with the reference's
    triple-counted clean support."""
    rs = np.random.RandomState(654)
    shape = (2, 4 + 15, 3, 224, 224)
    x_clean = rs.rand(*shape).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :4] = rs.rand(2, 4, 3, 224, 224).astype(np.float32)
    ep = np.transpose(x_clean, (0, 1, 3, 4, 2))
    sup = ep[:, :4]
    aug_sup = np.transpose(x_aug, (0, 1, 3, 4, 2))[:, :4]
    bank = np.stack([sup, sup, sup, aug_sup])
    return jnp.asarray(ep), jnp.asarray(bank)


def test_finetune50_e2e_transfer_golden(g):
    """The 50-shot driver's composed GNN-member eval path vs the reference's
    own ``finetune_50.finetune()`` run end to end
    (/root/reference/finetune_50.py:185-310): bank assembly, the inner Adam
    loop with train-mode BN (recorded permutations replayed), and scoring
    the ADAPTED features through the COMPRESSED gnnnet_copy head
    (post-fc pair-averaged support embeddings, gnnnet_copy.py:51-78).
    Completes the composed-path golden matrix across the shipped drivers."""
    if "ft50e2e.scores_gnn" not in g:
        pytest.skip("fixture predates the 50-shot e2e golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods import gnnnet as gn
    from mft_tpu.train import eval_engine as ee
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    spec = EpisodeSpec(n_way=2, n_support=4, n_query=15)
    gcfg = gn.GnnNetCfg(feat_dim=16, n_way=2, n_support=4, support_compress=2)
    tcfg = ee.TransferCfg(fine_tune_epochs=1, bn_mode="minibatch")
    ep, bank = _e2e50_tensors()
    k = jax.random.PRNGKey(0)

    params, stats = _tiny_backbone_trees(g, "ft50e2e_gnn.feature")
    head = {
        "fc": {
            "linear": lin_mat(g["ft50e2e_gnn.fc.0.weight"], g["ft50e2e_gnn.fc.0.bias"]),
            "bn": {"scale": jnp.asarray(g["ft50e2e_gnn.fc.1.weight"]), "bias": jnp.asarray(g["ft50e2e_gnn.fc.1.bias"])},
        },
        "gnn": {
            "layers": [
                {"w": _wcompute_tree(g, f"ft50e2e_gnn.gnn.layer_w{i}"), "l": _gconv_tree(g, f"ft50e2e_gnn.gnn.layer_l{i}")}
                for i in range(2)
            ],
            "w_last": _wcompute_tree(g, "ft50e2e_gnn.gnn.w_comp_last"),
            "l_last": _gconv_tree(g, "ft50e2e_gnn.gnn.layer_last", bn=False),
        },
    }
    sched = schedule_from_perms(g["ft50e2e.perms"], InnerLoopCfg(epochs=1, batch_size=5, bank_size=32))
    fn = jax.jit(
        lambda p, s, h, e, b: ee.gnn_member_scores(
            p, s, h, e, b, k, k, bcfg=TINY_BCFG, gcfg=gcfg, spec=spec, tcfg=tcfg,
            gen_examples=1, inner_schedule=sched,
        )
    )
    scores = np.asarray(fn(params, stats, head, ep, bank))
    np.testing.assert_allclose(scores, g["ft50e2e.scores_gnn"], rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------
# Optimizer recursions (finetune.py:109,240; meta_template.py:166)
# --------------------------------------------------------------------------


def _run_optax(tx, p0, grads):
    p = jnp.asarray(p0)
    state = tx.init(p)
    traj = []
    for i in range(grads.shape[0]):
        up, state = tx.update(jnp.asarray(grads[i]), state, p)
        import optax

        p = optax.apply_updates(p, up)
        traj.append(np.asarray(p))
    return np.stack(traj)


def test_torch_adam_vs_golden(g):
    traj = _run_optax(opt.torch_adam(0.01, weight_decay=0.001), g["opt.p0"], g["opt.grads"])
    np.testing.assert_allclose(traj, g["opt.adam"], rtol=1e-5, atol=1e-6)


def test_torch_adam_nowd_vs_golden(g):
    traj = _run_optax(opt.torch_adam(0.01), g["opt.p0"], g["opt.grads"])
    np.testing.assert_allclose(traj, g["opt.adam_nowd"], rtol=1e-5, atol=1e-6)


def test_torch_adam_lowmem_tracks_golden(g):
    """bf16-state Adam follows the torch trajectory to bf16 resolution."""
    traj = _run_optax(opt.torch_adam_lowmem(0.01, weight_decay=0.001), g["opt.p0"], g["opt.grads"])
    np.testing.assert_allclose(traj, g["opt.adam"], rtol=2e-2, atol=2e-3)


def test_reference_probe_sgd_vs_golden(g):
    traj = _run_optax(opt.reference_probe_sgd(0.01), g["opt.p0"], g["opt.grads"])
    np.testing.assert_allclose(traj, g["opt.sgd_probe"], rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# TRAINING backward parity: set_forward_loss / set_forward_loss_finetune
# (methods/gnnnet.py:106-231) — loss + every parameter gradient vs the
# reference's own backward pass
# --------------------------------------------------------------------------


def _gnnnet_head_trees(g, prefix: str):
    fc = {
        "linear": lin_mat(g[f"{prefix}.fc.0.weight"], g[f"{prefix}.fc.0.bias"]),
        "bn": {"scale": jnp.asarray(g[f"{prefix}.fc.1.weight"]), "bias": jnp.asarray(g[f"{prefix}.fc.1.bias"])},
    }
    gnn_p = {
        "layers": [
            {"w": _wcompute_tree(g, f"{prefix}.gnn.layer_w{i}"), "l": _gconv_tree(g, f"{prefix}.gnn.layer_l{i}")}
            for i in range(2)
        ],
        "w_last": _wcompute_tree(g, f"{prefix}.gnn.w_comp_last"),
        "l_last": _gconv_tree(g, f"{prefix}.gnn.layer_last", bn=False),
    }
    return fc, gnn_p


def _grad_fixture_view(g, grad_prefix: str, param_prefix: str):
    """A fixture-shaped dict whose PARAM entries are the reference's recorded
    gradients — the tree builders' layout transforms (OIHW->HWIO transposes,
    weight-matrix transposes) are linear, so running the same builders over
    this view yields the reference gradients in the jax tree layout.
    Running-stat buffers (gradless) keep their original values so the
    backbone builder still finds them."""
    view = {}
    for k, v in g.items():
        if k.startswith(grad_prefix + "."):
            view[f"{param_prefix}.{k[len(grad_prefix) + 1:]}"] = v
        elif k.startswith(param_prefix + ".") and "running" in k:
            view[k] = v
    return view


def _assert_tree_close(got, want, rtol=2e-3, atol_frac=2e-4, label=""):
    import jax

    paths = [jax.tree_util.keystr(kp) for kp, _ in jax.tree_util.tree_flatten_with_path(want)[0]]
    for path, a, b in zip(paths, jax.tree.leaves(got), jax.tree.leaves(want)):
        b = np.asarray(b)
        scale = float(np.abs(b).max()) or 1.0
        np.testing.assert_allclose(
            np.asarray(a), b, rtol=rtol, atol=atol_frac * scale + 1e-9, err_msg=f"{label}{path}"
        )


def _gnnnet_param_tree(g):
    params_f, stats_f = _tiny_backbone_trees(g, "fte2e_gnn.feature")
    fc, gnn_p = _gnnnet_head_trees(g, "fte2e_gnn")
    return {"feature": params_f, "fc": fc, "gnn": gnn_p}, stats_f


def _as_f64(tree):
    import jax

    return jax.tree.map(lambda a: jnp.asarray(a).astype(jnp.float64), tree)


def _post_stats_view(g, stats_prefix: str, param_prefix: str):
    """A fixture-shaped dict whose running-stat buffers are the reference's
    recorded POST-inner-loop values (``{stats_prefix}.<name>`` keys, relative
    to the feature module), so the standard tree builders yield the expected
    stats tree in the jax layout."""
    view = {k: v for k, v in g.items() if k.startswith(param_prefix + ".")}
    for k, v in g.items():
        if k.startswith(stats_prefix + "."):
            view[f"{param_prefix}.feature.{k[len(stats_prefix) + 1:]}"] = v
    return view


def test_episodic_train_backward_golden(g):
    """The episodic TRAIN step's backward pass vs the reference's own
    ``set_forward_loss(x).backward()`` (gnnnet.py:219-224; train_loop2,
    meta_template.py:76-92): loss + gradients for EVERY parameter — trunk
    convs through train-mode BN, the fc projector's no-running-stats BN1d,
    and the GNN's masked-softmax adjacency.  The forward goldens cannot catch
    a backward-only divergence; this does.

    Compared in FLOAT64 on both sides (the fixture runs the reference in
    double; here x64 is enabled and the f32 weights are widened exactly), so
    the tolerance sits at the f64 noise floor instead of the ~1e-4 f32
    accumulation-order floor — tight enough to catch real semantic drift."""
    if "trainstep.loss" not in g:
        pytest.skip("fixture predates the train-backward golden; rerun tools/gen_golden_reference.py")
    if g["trainstep.loss"].dtype != np.float64:
        pytest.skip("fixture predates the f64 backward goldens; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods.gnnnet import GnnNetCfg
    from mft_tpu.train import steps

    spec = EpisodeSpec(n_way=2, n_support=2, n_query=16)
    gcfg = GnnNetCfg(feat_dim=16, n_way=2, n_support=2)

    with jax.enable_x64():
        params, stats_f = _gnnnet_param_tree(g)
        params, stats_f = _as_f64(params), _as_f64(stats_f)

        rs = np.random.RandomState(321)
        x = rs.rand(2, 18, 3, 224, 224)
        ep = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))

        def loss_fn(p):
            loss, _ = steps._episode_loss(p, stats_f, ep, method="gnnnet", bcfg=TINY_BCFG, gcfg=gcfg, spec=spec)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(loss), float(g["trainstep.loss"]), rtol=1e-9)

        gv = _grad_fixture_view(g, "trainstep.grad", "fte2e_gnn")
        want_feature, _ = _tiny_backbone_trees(gv, "fte2e_gnn.feature")
        want_fc, want_gnn = _gnnnet_head_trees(gv, "fte2e_gnn")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-6, atol_frac=1e-8, label="feature")
        _assert_tree_close(grads["fc"], want_fc, rtol=1e-6, atol_frac=1e-8, label="fc")
        _assert_tree_close(grads["gnn"], want_gnn, rtol=1e-6, atol_frac=1e-8, label="gnn")


def test_meta_finetune_backward_golden(g):
    """The META FINE-TUNING stage vs the reference's own
    ``set_forward_loss_finetune(x).backward()`` (gnnnet.py:106-231): the
    15-epoch inner Adam(0.01) on the last block (train-mode BN per minibatch,
    recorded permutations replayed), the SEPARATE post-adaptation
    support/query embedding passes (:193-197), the GNN forward, and the
    first-order outer gradients — including that the trunk/adapted-block
    outer grads equal the reference's grads at the adapted point (the
    fo_maml_reattach contract)."""
    if "mft.loss" not in g:
        pytest.skip("fixture predates the meta-finetune golden; rerun tools/gen_golden_reference.py")
    if g["mft.loss"].dtype != np.float64:
        pytest.skip("fixture predates the f64 backward goldens; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods.gnnnet import GnnNetCfg
    from mft_tpu.train import steps
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    spec = EpisodeSpec(n_way=2, n_support=2, n_query=16)
    gcfg = GnnNetCfg(feat_dim=16, n_way=2, n_support=2)
    mcfg = steps.MetaFinetuneCfg(epochs=15, batch_size=4, bn_mode="minibatch")

    with jax.enable_x64():
        params, stats_f = _gnnnet_param_tree(g)
        params, stats_f = _as_f64(params), _as_f64(stats_f)
        sched = schedule_from_perms(g["mft.perms"], InnerLoopCfg(epochs=15, batch_size=4, bank_size=4))

        rs = np.random.RandomState(654)
        x = rs.rand(2, 18, 3, 224, 224)
        ep = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        key = jax.random.PRNGKey(0)  # unused: the schedule overrides the sampler

        def loss_fn(p):
            return steps._meta_finetune_episode_loss(
                p, stats_f, ep, key, method="gnnnet", bcfg=TINY_BCFG, gcfg=gcfg, spec=spec, mcfg=mcfg,
                schedule=sched,
            )

        (loss, new_stats), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
        # the 15-epoch inner Adam's 1/(sqrt(nu)+eps) amplifies roundoff; in
        # f64 that leaves ~1e-10 relative drift — tolerance stays 4+ orders
        # of magnitude below any semantic divergence
        np.testing.assert_allclose(float(loss), float(g["mft.loss"]), rtol=1e-8)

        if any(k.startswith("mft.post_stats.") for k in g):
            # the BN running-stat TRAJECTORY: inner minibatch updates ride the
            # scan carry, then the two outer passes (gnnnet.py:158-197)
            _, want_stats = _tiny_backbone_trees(
                _post_stats_view(g, "mft.post_stats", "fte2e_gnn"), "fte2e_gnn.feature"
            )
            _assert_tree_close(new_stats, want_stats, rtol=1e-8, atol_frac=1e-10, label="post_stats")

        gv = _grad_fixture_view(g, "mft.grad", "fte2e_gnn")
        want_feature, _ = _tiny_backbone_trees(gv, "fte2e_gnn.feature")
        want_fc, want_gnn = _gnnnet_head_trees(gv, "fte2e_gnn")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-5, atol_frac=1e-7, label="feature")
        _assert_tree_close(grads["fc"], want_fc, rtol=1e-5, atol_frac=1e-7, label="fc")
        _assert_tree_close(grads["gnn"], want_gnn, rtol=1e-5, atol_frac=1e-7, label="gnn")


def test_protonet_finetune_backward_golden(g):
    """The ProtoNet meta fine-tuning stage vs the reference's own
    ``set_forward_loss_finetune(x).backward()``
    (/root/reference/methods/protonet.py:66-176): the 5-epoch inner
    Adam(0.01) on the last block with features-as-logits CE, the RAGGED
    final minibatch (support 6, batch 4 -> sizes 4+2; masked-BN fixed-shape
    equivalence), separate post-adaptation support/query embeddings, and the
    first-order outer gradients through the prototype euclidean scores.
    FLOAT64 on both sides (see test_episodic_train_backward_golden)."""
    if "pnft.loss" not in g:
        pytest.skip("fixture predates the protonet-finetune golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.train import steps
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    spec = EpisodeSpec(n_way=3, n_support=2, n_query=5)
    mcfg = steps.MetaFinetuneCfg(epochs=5, batch_size=4, bn_mode="minibatch")

    with jax.enable_x64():
        params_f, stats_f = _tiny_backbone_trees(g, "pnft.feature")
        params = {"feature": _as_f64(params_f)}
        stats_f = _as_f64(stats_f)
        sched = schedule_from_perms(g["pnft.perms"], InnerLoopCfg(epochs=5, batch_size=4, bank_size=6))

        rs = np.random.RandomState(777)
        x = rs.rand(3, 7, 3, 224, 224)
        ep = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        key = jax.random.PRNGKey(0)  # unused: the schedule overrides the sampler

        def loss_fn(p):
            return steps._meta_finetune_episode_loss(
                p, stats_f, ep, key, method="protonet", bcfg=TINY_BCFG, gcfg=None, spec=spec, mcfg=mcfg,
                schedule=sched,
            )

        (loss, new_stats), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
        np.testing.assert_allclose(float(loss), float(g["pnft.loss"]), rtol=1e-8)

        if any(k.startswith("pnft.post_stats.") for k in g):
            # running-stat trajectory incl. the RAGGED inner minibatches (4+2)
            _, want_stats = _tiny_backbone_trees(
                _post_stats_view(g, "pnft.post_stats", "pnft"), "pnft.feature"
            )
            _assert_tree_close(new_stats, want_stats, rtol=1e-8, atol_frac=1e-10, label="post_stats")

        gv = _grad_fixture_view(g, "pnft.grad", "pnft")
        want_feature, _ = _tiny_backbone_trees(gv, "pnft.feature")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-5, atol_frac=1e-7, label="feature")


def test_probe_adaptation_golden(g):
    """The frozen-feature linear probe vs the reference's own
    ``BaselineFinetune.set_forward_adaptation`` (baselinefinetune.py:17-58):
    100 epochs x batch 4 (ragged 4+2) of the reference SGD
    (momentum 0.9, dampening 0.9, wd 0.001) on support features from the
    recorded probe init and permutations, then query scores.  This is the
    --method baseline eval stage (cli/test.py make_probe_program's
    composition).  FLOAT64 on both sides."""
    if "probe.scores" not in g:
        pytest.skip("fixture predates the probe golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec, support_labels
    from mft_tpu.methods.baseline import ce_loss, classifier_logits
    from mft_tpu.train.inner_loop import InnerLoopCfg, inner_fit, schedule_from_perms
    from mft_tpu.train.optimizers import reference_probe_sgd

    spec = EpisodeSpec(n_way=3, n_support=2, n_query=5)

    with jax.enable_x64():
        feats = jnp.asarray(g["probe.feats"])  # [3, 7, 16] f64
        z_support = feats[:, : spec.n_support].reshape(spec.support_size, -1)
        z_query = feats[:, spec.n_support :].reshape(spec.query_size, -1)
        y = support_labels(spec)
        head0 = _as_f64(lin_mat(g["probe.clf.weight"], g["probe.clf.bias"]))
        icfg = InnerLoopCfg(epochs=100, batch_size=4, bank_size=spec.support_size)
        sched = schedule_from_perms(g["probe.perms"], icfg)

        def loss_fn(p, idx, w):
            return ce_loss(classifier_logits(p, z_support[idx]), y[idx], w)

        @jax.jit
        def run(head):
            head = inner_fit(loss_fn, head, reference_probe_sgd(0.01), jax.random.PRNGKey(0), icfg, schedule=sched)
            return classifier_logits(head, z_query)

        scores = np.asarray(run(head0))
        np.testing.assert_allclose(scores, g["probe.scores"], rtol=1e-8, atol=1e-10)


def _g50_param_tree(g):
    params_f, stats_f = _tiny_backbone_trees(g, "g50.feature")
    fc, gnn_p = _gnnnet_head_trees(g, "g50")
    return {"feature": params_f, "fc": fc, "gnn": gnn_p}, stats_f


def test_gnnnet50_train_backward_golden(g):
    """The 50-shot compressed episodic TRAIN step's backward pass vs the
    reference's own ``gnnnet_copy.set_forward_loss(x).backward()``
    (gnnnet_copy.py:51-78,259-264 + train_loop50): full backbone embed, fc
    projection, POST-projection pair-averaging of the support embeddings
    (z2.view(n_way,2,s,f).mean(1), :67-70), the halved graph build, and the
    GNN backward.  FLOAT64 on both sides (see
    test_episodic_train_backward_golden)."""
    if "g50.loss" not in g:
        pytest.skip("fixture predates the 50-shot backward goldens; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods.gnnnet import GnnNetCfg
    from mft_tpu.train import steps

    spec = EpisodeSpec(n_way=2, n_support=4, n_query=16)
    gcfg = GnnNetCfg(feat_dim=16, n_way=2, n_support=4, support_compress=2)

    with jax.enable_x64():
        params, stats_f = _g50_param_tree(g)
        params, stats_f = _as_f64(params), _as_f64(stats_f)

        rs = np.random.RandomState(888)
        x = rs.rand(2, 20, 3, 224, 224)
        ep = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))

        def loss_fn(p):
            loss, _ = steps._episode_loss(p, stats_f, ep, method="gnnnet", bcfg=TINY_BCFG, gcfg=gcfg, spec=spec)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(loss), float(g["g50.loss"]), rtol=1e-9)

        gv = _grad_fixture_view(g, "g50.grad", "g50")
        want_feature, _ = _tiny_backbone_trees(gv, "g50.feature")
        want_fc, want_gnn = _gnnnet_head_trees(gv, "g50")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-6, atol_frac=1e-8, label="feature")
        _assert_tree_close(grads["fc"], want_fc, rtol=1e-6, atol_frac=1e-8, label="fc")
        _assert_tree_close(grads["gnn"], want_gnn, rtol=1e-6, atol_frac=1e-8, label="gnn")


def test_gnnnet50_finetune_backward_golden(g):
    """The 50-shot META FINE-TUNING stage vs the reference's own
    ``gnnnet_copy.set_forward_loss_finetune(x).backward()``
    (gnnnet_copy.py:135-266 + train_loop_finetune50): the inner **5-epoch**
    (:177 — vs 15 in the 5-shot gnnnet.py:145; cli/train.py mirrors this)
    Adam(0.01) x batch-4 loop over the FULL uncompressed support bank with
    train-mode BN (recorded permutations replayed), the separate
    post-adaptation support/query embedding passes, the post-fc
    pair-averaging, the BN running-stat trajectory, and the first-order
    outer gradients.  FLOAT64 on both sides."""
    if "g50ft.loss" not in g:
        pytest.skip("fixture predates the 50-shot backward goldens; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods.gnnnet import GnnNetCfg
    from mft_tpu.train import steps
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    spec = EpisodeSpec(n_way=2, n_support=4, n_query=16)
    gcfg = GnnNetCfg(feat_dim=16, n_way=2, n_support=4, support_compress=2)
    mcfg = steps.MetaFinetuneCfg(epochs=5, batch_size=4, bn_mode="minibatch")

    with jax.enable_x64():
        params, stats_f = _g50_param_tree(g)
        params, stats_f = _as_f64(params), _as_f64(stats_f)
        sched = schedule_from_perms(g["g50ft.perms"], InnerLoopCfg(epochs=5, batch_size=4, bank_size=8))

        rs = np.random.RandomState(889)
        x = rs.rand(2, 20, 3, 224, 224)
        ep = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
        key = jax.random.PRNGKey(0)  # unused: the schedule overrides the sampler

        def loss_fn(p):
            return steps._meta_finetune_episode_loss(
                p, stats_f, ep, key, method="gnnnet", bcfg=TINY_BCFG, gcfg=gcfg, spec=spec, mcfg=mcfg,
                schedule=sched,
            )

        (loss, new_stats), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
        np.testing.assert_allclose(float(loss), float(g["g50ft.loss"]), rtol=1e-8)

        _, want_stats = _tiny_backbone_trees(_post_stats_view(g, "g50ft.post_stats", "g50"), "g50.feature")
        _assert_tree_close(new_stats, want_stats, rtol=1e-8, atol_frac=1e-10, label="post_stats")

        gv = _grad_fixture_view(g, "g50ft.grad", "g50")
        want_feature, _ = _tiny_backbone_trees(gv, "g50.feature")
        want_fc, want_gnn = _gnnnet_head_trees(gv, "g50")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-5, atol_frac=1e-7, label="feature")
        _assert_tree_close(grads["fc"], want_fc, rtol=1e-5, atol_frac=1e-7, label="fc")
        _assert_tree_close(grads["gnn"], want_gnn, rtol=1e-5, atol_frac=1e-7, label="gnn")


def test_dampnet_train_backward_golden(g):
    """The DampNet episodic TRAIN step's backward pass vs the reference's own
    train_loop_full per-batch body (dampnet_full_class.py:425-447): backbone
    embed of the flat episode, ``set_forward_loss`` through the
    pre-initialization 'plain' branch (fc projection, per-query graph build,
    forward_gnn, CE), and the backward through backbone + fc + GNN.
    FLOAT64 on both sides (see test_episodic_train_backward_golden)."""
    if "dtrain.loss" not in g:
        pytest.skip("fixture predates the dampnet-train golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.methods import dampnet as dn

    dcfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")

    with jax.enable_x64():
        params_f, stats_f = _tiny_backbone_trees(g, "dtrain.feature")
        fc, gnn_p = _gnnnet_head_trees(g, "dtrain")
        params = _as_f64({"feature": params_f, "fc": fc, "gnn": gnn_p})
        stats_f = _as_f64(stats_f)

        rs = np.random.RandomState(987)
        x = rs.rand(21, 3, 224, 224)
        flat = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

        def loss_fn(p):
            feats, _ = bb.apply_backbone(
                p["feature"], stats_f, flat, cfg=TINY_BCFG, train=True, update_stats=True
            )
            z = feats.reshape(3, 7, -1)
            scores = dn.dampnet_scores(
                {"fc": p["fc"], "gnn": p["gnn"]}, None, z, dcfg, 5, mode="plain"
            )
            return dn.dampnet_loss(scores, 3, 5)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(loss), float(g["dtrain.loss"]), rtol=1e-9)

        gv = _grad_fixture_view(g, "dtrain.grad", "dtrain")
        want_feature, _ = _tiny_backbone_trees(gv, "dtrain.feature")
        want_fc, want_gnn = _gnnnet_head_trees(gv, "dtrain")
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-6, atol_frac=1e-8, label="feature")
        _assert_tree_close(grads["fc"], want_fc, rtol=1e-6, atol_frac=1e-8, label="fc")
        _assert_tree_close(grads["gnn"], want_gnn, rtol=1e-6, atol_frac=1e-8, label="gnn")


def test_baseline_train_backward_golden(g):
    """The baseline supervised pretraining step's backward pass vs the
    reference's own ``BaselineTrain.forward_loss(x, y).backward()``
    (baselinetrain.py:26-56): backbone embed with train-mode BN, Linear
    classifier, CE over base-class labels.  FLOAT64 on both sides."""
    if "btrain.loss" not in g:
        pytest.skip("fixture predates the baseline-train golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.train import steps

    with jax.enable_x64():
        params_f, stats_f = _tiny_backbone_trees(g, "btrain.feature")
        clf = lin_mat(g["btrain.classifier.weight"], g["btrain.classifier.bias"])
        params = _as_f64({"feature": params_f, "classifier": clf})
        stats_f = _as_f64(stats_f)

        rs = np.random.RandomState(135)
        x = jnp.asarray(np.transpose(rs.rand(6, 3, 224, 224), (0, 2, 3, 1)))
        y = jnp.asarray(g["btrain.y"])

        def loss_fn(p):
            loss, _aux = steps.baseline_loss_fn(p, stats_f, x, y, bcfg=TINY_BCFG)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        np.testing.assert_allclose(float(loss), float(g["btrain.loss"]), rtol=1e-9)

        gv = _grad_fixture_view(g, "btrain.grad", "btrain")
        want_feature, _ = _tiny_backbone_trees(gv, "btrain.feature")
        want_clf = lin_mat(gv["btrain.classifier.weight"], gv["btrain.classifier.bias"])
        _assert_tree_close(grads["feature"], want_feature, rtol=1e-6, atol_frac=1e-8, label="feature")
        _assert_tree_close(grads["classifier"], want_clf, rtol=1e-6, atol_frac=1e-8, label="classifier")


def test_dampnet_finetune_e2e_golden(g):
    """The LIVE dampnet eval composition vs the reference's own
    ``finetune(..., ds=True)`` run end to end
    (/root/reference/finetune.py:182-328 with the ds branch at :313-314 —
    the dispatch the shipped 50-shot driver routes dampnet through,
    finetune_50.py:622,687): bank assembly, the inner Adam loop adapting the
    last block, then ``set_forward(is_feature=True, domain_shift=True)`` on
    the ADAPTED episode features."""
    if "ftdamp.scores" not in g:
        pytest.skip("fixture predates the dampnet-e2e golden; rerun tools/gen_golden_reference.py")
    import jax

    from mft_tpu.core.episode import EpisodeSpec
    from mft_tpu.methods import dampnet as dn
    from mft_tpu.train import eval_engine as ee
    from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms

    params_b, stats_b = _tiny_backbone_trees(g, "ftdamp_base")
    damp_params = _dampnet_param_tree(g, "dampnet")
    damp_state = {
        "proto_mean": jnp.asarray(g["dampnet.proto_mean"]),
        "proto_std": jnp.asarray(g["dampnet.proto_std"]),
        "initialized": jnp.ones((), jnp.bool_),
    }
    dcfg = dn.DampNetCfg(feat_dim=16, n_way=3, n_support=2, stat="class")
    spec = EpisodeSpec(n_way=3, n_support=2, n_query=15)
    tcfg = ee.TransferCfg(fine_tune_epochs=1, bn_mode="minibatch")

    rs = np.random.RandomState(456)
    x_clean = rs.rand(3, 17, 3, 224, 224).astype(np.float32)
    x_aug = x_clean.copy()
    x_aug[:, :2] = rs.rand(3, 2, 3, 224, 224).astype(np.float32)
    ep = jnp.asarray(np.transpose(x_clean, (0, 1, 3, 4, 2)))
    sup = np.transpose(x_clean, (0, 1, 3, 4, 2))[:, :2]
    aug_sup = np.transpose(x_aug, (0, 1, 3, 4, 2))[:, :2]
    bank = jnp.asarray(np.stack([sup, sup, sup, aug_sup]))

    sched = schedule_from_perms(g["ftdamp.perms"], InnerLoopCfg(epochs=1, batch_size=5, bank_size=24))
    k = jax.random.PRNGKey(0)
    fn = jax.jit(
        lambda pb, sb, dp, dst, e, b: ee.dampnet_member_scores(
            pb, sb, dp, dst, e, b, k, k, bcfg=TINY_BCFG, dcfg=dcfg, spec=spec, tcfg=tcfg,
            gen_examples=1, inner_schedule=sched,
        )
    )
    scores = np.asarray(fn(params_b, stats_b, damp_params, damp_state, ep, bank))
    np.testing.assert_allclose(scores, g["ftdamp.scores"], rtol=2e-3, atol=2e-3)
