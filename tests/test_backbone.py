"""Backbone numerics: parity against the NumPy float64 oracle + structural
tests of the adaptation partition and BN semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.models import backbone as bb
from mft_tpu.ops.norm import batch_norm

from . import oracles


# -- jitted wrappers (eager per-op dispatch is very slow in this env) --------
@functools.lru_cache(maxsize=None)
def _japply(cfg, train, start_stage):
    def f(p, s, x, rng):
        return bb.apply_backbone(p, s, x, cfg=cfg, train=train, start_stage=start_stage, rng=rng)

    return jax.jit(f)


def japply(p, s, x, *, cfg, train, start_stage=0, rng=None):
    return _japply(cfg, train, start_stage)(p, s, x, rng)


@functools.lru_cache(maxsize=None)
def _jinit(cfg):
    return jax.jit(lambda k: bb.init_backbone(k, cfg))


def jinit(key, cfg):
    return _jinit(cfg)(key)


def _np(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def test_resnet10_matches_numpy_oracle():
    cfg = bb.resnet10()
    params, stats = jinit(jax.random.PRNGKey(0), cfg)
    x = np.random.RandomState(1).randn(4, 64, 64, 3).astype(np.float32)

    ours, _ = japply(params, stats, jnp.asarray(x), cfg=cfg, train=True)
    ref = oracles.resnet(_np(params), x, cfg.stage_sizes, flatten=True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_eval_mode_uses_running_stats():
    cfg = bb.resnet10()
    params, stats = jinit(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32))
    train_out, _ = japply(params, stats, x, cfg=cfg, train=True)
    eval_out, _ = japply(params, stats, x, cfg=cfg, train=False)
    # fresh running stats (mean 0 / var 1) != batch stats -> different outputs
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))


def test_feat_dim_contract():
    assert bb.resnet10().feat_dim == 512
    assert bb.resnet18().feat_dim == 512
    assert bb.resnet10(flatten=False).feat_dim == (7, 7, 512)
    # reference model_dict parity (io_utils.py:7-8)
    assert set(bb.MODEL_REGISTRY) >= {"ResNet10", "ResNet10_FW", "ResNet18"}


def test_unflattened_output_shape():
    cfg = bb.resnet10(flatten=False)
    params, stats = jinit(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 224, 224, 3))
    out, _ = japply(params, stats, x, cfg=cfg, train=True)
    assert out.shape == (2, 7, 7, 512)


def test_split_backbone_variants_compose():
    """ResNet8 / ResNet_3 / ResNet_fin (reference backbone.py:441-517): the
    split-backbone experiment pieces.  ResNet8/ResNet_3 emit 256-channel
    stage-3 maps (the reference's ResNet8 ignores its flatten arg and always
    returns maps, backbone.py:515-517); ResNet_fin consumes those maps
    stem-lessly and produces the standard 512-d embedding — composing the
    two reproduces the full 4-stage pipeline's output shape."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    for cfg3 in (bb.resnet8(), bb.resnet_3()):
        assert cfg3.feat_dim == (7, 7, 256)
        p3, s3 = jinit(jax.random.PRNGKey(0), cfg3)
        maps, _ = japply(p3, s3, x, cfg=cfg3, train=True)
        assert maps.shape == (2, 4, 4, 256)  # 64 -> stem+pool /4 -> strides /2/2

    cfg_fin = bb.resnet_fin()
    assert cfg_fin.feat_dim == 512
    pf, sf = jinit(jax.random.PRNGKey(1), cfg_fin)
    feats, _ = japply(pf, sf, maps, cfg=cfg_fin, train=True)
    assert feats.shape == (2, 512)
    # the split pair is adaptation-compatible: ResNet_fin's single stage IS
    # the final block, so adapt_split hands the whole stage to the inner loop
    trunk, last = bb.adapt_split(pf)
    assert set(last) == {"conv1", "bn1", "conv2", "bn2", "conv_sc", "bn_sc"}
    assert not jax.tree.leaves(trunk)  # stem-less: nothing frozen


def test_resnet18_34_adapt_boundary_and_forward():
    """ResNet18/34 forward + the documented adaptation-boundary deviation
    (models/backbone.py module docstring): adapt_split hands the final
    RESIDUAL BLOCK to the inner loop — for multi-block final stages the
    reference's names[:-9] slice instead straddles the stage's first block;
    ours is the structural per-block boundary."""
    for cfg in (bb.resnet18(), bb.resnet34()):
        params, stats = jinit(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32))
        out, _ = japply(params, stats, x, cfg=cfg, train=True)
        assert out.shape == (2, 512)
        trunk, last = bb.adapt_split(params)
        # final stage has >= 2 blocks; only its LAST block is adapted, and the
        # stage's earlier blocks stay in the trunk
        assert set(last) == {"conv1", "bn1", "conv2", "bn2"}  # cin == cout: no shortcut conv
        assert len(trunk["stages"][-1]) == cfg.stage_sizes[-1]
        assert trunk["stages"][-1][0]  # earlier block(s) retained
        merged = bb.adapt_merge(trunk, last)
        assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, params))


def test_masked_bn_equals_smaller_batch():
    x5 = np.random.RandomState(0).randn(5, 3, 3, 8).astype(np.float32)
    p = {"scale": jnp.ones(8), "bias": jnp.zeros(8)}
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    f = jax.jit(lambda x, m: batch_norm(x, p, None, use_batch_stats=True, sample_mask=m)[0])
    g = jax.jit(lambda x: batch_norm(x, p, None, use_batch_stats=True)[0])
    y_masked = f(jnp.asarray(x5), mask)
    y_small = g(jnp.asarray(x5[:3]))
    np.testing.assert_allclose(np.asarray(y_masked)[:3], np.asarray(y_small), rtol=1e-5, atol=1e-5)


def test_running_stats_update_torch_convention():
    x = np.random.RandomState(2).randn(6, 16).astype(np.float32)
    p = {"scale": jnp.ones(16), "bias": jnp.zeros(16)}
    s = {"mean": jnp.zeros(16), "var": jnp.ones(16)}
    f = jax.jit(lambda x: batch_norm(x, p, s, use_batch_stats=True, update_stats=True, momentum=0.1)[1])
    new_s = f(jnp.asarray(x))
    exp_mean = 0.9 * 0.0 + 0.1 * x.mean(0)
    exp_var = 0.9 * 1.0 + 0.1 * x.var(0, ddof=1)
    np.testing.assert_allclose(np.asarray(new_s["mean"]), exp_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]), exp_var, rtol=1e-5, atol=1e-6)


def test_adapt_split_merge_roundtrip():
    cfg = bb.resnet10()
    params, _ = jinit(jax.random.PRNGKey(0), cfg)
    trunk, last = bb.adapt_split(params)
    # last block of ResNet10 = final residual block with 1x1 shortcut:
    # 9 tensors total, matching the reference's names[:-9] boundary.
    assert set(last) == {"conv1", "bn1", "conv2", "bn2", "conv_sc", "bn_sc"}
    assert len(jax.tree.leaves(last)) == 9
    merged = bb.adapt_merge(trunk, last)
    assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, params))


def test_start_stage_resume_equals_full_forward():
    cfg = bb.resnet10()
    params, stats = jinit(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 64, 3).astype(np.float32))
    full, _ = japply(params, stats, x, cfg=cfg, train=True)
    # trunk = stem + stages 0..2 run via a truncated cfg, then resume stage 3
    trunk_cfg = bb.ResNetCfg(cfg.stage_sizes[:3], cfg.widths[:3], cfg.block, flatten=False)
    trunk_params = {"stem_conv": params["stem_conv"], "stem_bn": params["stem_bn"], "stages": params["stages"][:3]}
    trunk_stats = {"stem_bn": stats["stem_bn"], "stages": stats["stages"][:3]}
    feats, _ = japply(trunk_params, trunk_stats, x, cfg=trunk_cfg, train=True)
    resumed, _ = japply(params, stats, feats, cfg=cfg, train=True, start_stage=3)
    np.testing.assert_allclose(np.asarray(resumed), np.asarray(full), rtol=1e-4, atol=1e-4)


def test_fwt_noise_applied_only_with_rng():
    cfg = bb.resnet10_fw()
    params, stats = jinit(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 64, 64, 3).astype(np.float32))
    a, _ = japply(params, stats, x, cfg=cfg, train=True)
    b, _ = japply(params, stats, x, cfg=cfg, train=True, rng=jax.random.PRNGKey(1))
    c, _ = japply(params, stats, x, cfg=cfg, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(b), np.asarray(c))


def test_bottleneck_block_matches_numpy_oracle():
    """BottleneckBlock (reference backbone.py:264-311) behind
    ResNetCfg(block='bottleneck'): init structure + train-mode forward."""
    cfg = bb.ResNetCfg((1, 1), (64, 128), "bottleneck", flatten=False)
    params, stats = jinit(jax.random.PRNGKey(3), cfg)
    # structure: 3 convs + 3 BNs + biased C2 + conv-only shortcut (no bn_sc)
    blk = params["stages"][1][0]
    assert set(blk) == {"conv1", "bn1", "conv2", "conv2_b", "bn2", "conv3", "bn3", "conv_sc"}
    assert blk["conv1"].shape == (1, 1, 64, 32) and blk["conv2"].shape == (3, 3, 32, 32)
    assert blk["conv3"].shape == (1, 1, 32, 128) and blk["conv2_b"].shape == (32,)
    # identity shortcut when cin == cout
    blk0 = params["stages"][0][0]
    assert "conv_sc" not in blk0  # 64 -> 64

    x = np.random.RandomState(7).randn(2, 8, 8, 64).astype(np.float32)
    ours = jax.jit(
        lambda p, s, xx: bb._apply_block(p, s, xx, True, bb.BNCtx(True, False, 0.1, None), False, True, None)[0]
    )(blk, stats["stages"][1][0], jnp.asarray(x))
    ref = oracles.bottleneck_block(_np(blk), x, half_res=True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)


def test_bottleneck_backbone_forward_shape():
    cfg = bb.ResNetCfg((1, 1, 1, 1), (64, 128, 256, 512), "bottleneck", flatten=True)
    params, stats = jinit(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(np.random.RandomState(8).randn(2, 64, 64, 3).astype(np.float32))
    out, _ = japply(params, stats, x, cfg=cfg, train=True)
    assert out.shape == (2, 512)


def test_fwt_trainable_mask():
    cfg = bb.resnet10_fw()
    params, _ = jinit(jax.random.PRNGKey(0), cfg)
    mask = bb.fwt_trainable_mask(params)
    flat_p = jax.tree.leaves_with_path(params)
    flat_m = dict(jax.tree.leaves_with_path(mask))
    n_frozen = sum(1 for path, _ in flat_p if not flat_m[path])
    # stage0 block (64->64, no shortcut): gamma2/beta2 only; stages 1-3 add
    # gamma_sc/beta_sc -> 4*2 + 3*2 = 14 frozen tensors
    assert n_frozen == 14
