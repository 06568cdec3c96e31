"""Functional ResNet backbone zoo (TPU-native NHWC).

Re-implements the capabilities of the reference backbone zoo
(/root/reference/backbone.py: ``SimpleBlock`` ResNets, the feature-wise
transformation variant ``SimpleBlock2``/``ResNet10_FW``, factories
ResNet10/ResNet18/ResNet34, ``final_feat_dim`` contract, fan-in init) as pure
functions over parameter pytrees.

Design notes (TPU-first, not a port):

* Params and BN running statistics are separate pytrees threaded explicitly;
  there is no module mutation.  MAML "fast weights" need no special layer
  classes (reference backbone.py:26-58): an adapted parameter tree is just
  another pytree passed to the same ``apply``.
* Layout is NHWC with HWIO kernels; matmuls/convs accumulate in f32 on the
  MXU and activations may be bf16.
* ``sample_mask`` reproduces the reference's variable-size last minibatch
  semantics in inner loops under static shapes (see ops/norm.py).
* The reference's eval drivers keep BN in training mode end-to-end
  (finetune.py:263-268 never switch to eval before embedding), so batch-stats
  mode is the primary path; running stats exist for the supervised
  pretraining stage and for eval-mode use.

Adaptation contract: the reference fine-tunes "the last 9 parameter tensors"
of the backbone (finetune.py:117, methods/gnnnet.py:138), which for the
shipped ResNet10 configs is exactly the final residual block (conv1, bn1,
conv2, bn2, shortcut conv, shortcut bn).  Here that contract is structural:
:func:`adapt_split` / :func:`adapt_merge` partition out the final residual
block.  (For ResNet18 the reference's tensor-count slice straddles a block
boundary; we use the cleaner per-block boundary and document the divergence.)
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mft_tpu.ops.convpool import conv2d, global_avg_pool, max_pool
from mft_tpu.ops.initializers import bn_params, bn_stats, conv_fanin_normal
from mft_tpu.ops.norm import batch_norm, softplus100


class ResNetCfg(NamedTuple):
    """Static backbone architecture description.

    ``block``: 'simple' (plain residual block), 'fwt' (feature-wise
    transformation block: the second BN and the shortcut BN carry sampled
    per-channel affine noise during training — reference backbone.py:90-130,
    314-350), or 'bottleneck' (3-conv bottleneck, reference
    backbone.py:264-311 — defined upstream but unused by every shipped
    config; implemented for §2.2 inventory completeness).
    """

    stage_sizes: Tuple[int, ...]
    widths: Tuple[int, ...]
    block: str = "simple"
    flatten: bool = True
    #: MXU input dtype: convs cast x/w to this and accumulate in f32; BN,
    #: residuals, and parameters stay f32 ('bfloat16' = the TPU fast path)
    compute_dtype: str = "float32"
    #: stem-less variant (reference ResNet_fin, backbone.py:481-509: a single
    #: final stage applied to 256-channel stage-3 feature maps)
    stem: bool = True
    stem_in: int = 3

    @property
    def feat_dim(self):
        """Reference ``final_feat_dim`` contract (backbone.py:427-433)."""
        if self.flatten:
            return self.widths[-1]
        return (7, 7, self.widths[-1])  # NHWC order


def resnet10(flatten: bool = True) -> ResNetCfg:
    return ResNetCfg((1, 1, 1, 1), (64, 128, 256, 512), "simple", flatten)


def resnet10_fw(flatten: bool = True) -> ResNetCfg:
    return ResNetCfg((1, 1, 1, 1), (64, 128, 256, 512), "fwt", flatten)


def resnet18(flatten: bool = True) -> ResNetCfg:
    return ResNetCfg((2, 2, 2, 2), (64, 128, 256, 512), "simple", flatten)


def resnet34(flatten: bool = True) -> ResNetCfg:
    return ResNetCfg((3, 4, 6, 3), (64, 128, 256, 512), "simple", flatten)


def resnet8(flatten: bool = True) -> ResNetCfg:
    """3-stage split-backbone variant (reference backbone.py:515-517 —
    note the reference ignores its flatten arg and always returns maps)."""
    return ResNetCfg((1, 1, 1), (64, 128, 256), "simple", flatten=False)


def resnet_3(flatten: bool = False) -> ResNetCfg:
    """ResNet_3 (reference backbone.py:441-479)."""
    return ResNetCfg((1, 1, 1), (64, 128, 256), "simple", flatten)


def resnet_fin(flatten: bool = True) -> ResNetCfg:
    """Final-single-stage variant operating on 256-channel stage-3 maps
    (reference backbone.py:481-513, ResNet_fin_func)."""
    return ResNetCfg((1,), (512,), "simple", flatten, stem=False, stem_in=256)


#: reference io_utils.py:7-8 ``model_dict`` (+ the split-backbone variants
#: defined in backbone.py:512-517 for experiments)
MODEL_REGISTRY = {
    "ResNet10": resnet10,
    "ResNet10_FW": resnet10_fw,
    "ResNet18": resnet18,
    "ResNet34": resnet34,
    "ResNet8": resnet8,
    "ResNet_3": resnet_3,
    "ResNet_fin": resnet_fin,
}


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------


def _init_bottleneck_block(key, cin: int, cout: int, dtype):
    """BottleneckBlock params (reference backbone.py:264-291): 1x1 reduce
    (no bias) -> 3x3 (with bias — the reference's C2 keeps the Conv2d
    default) -> 1x1 expand (no bias), each followed by BN; 1x1 conv shortcut
    *without* BN when cin != cout.  All conv weights get the fan-in normal
    init (init_layer applies to every parametrized layer, :293-294); C2's
    bias keeps the torch Conv2d default U(-1/sqrt(cin*k*k), ...)."""
    mid = cout // 4
    ks = jax.random.split(key, 5)
    bound = 1.0 / math.sqrt(mid * 3 * 3)
    p = {
        "conv1": conv_fanin_normal(ks[0], 1, 1, cin, mid, dtype),
        "bn1": bn_params(mid, dtype),
        "conv2": conv_fanin_normal(ks[1], 3, 3, mid, mid, dtype),
        "conv2_b": jax.random.uniform(ks[2], (mid,), dtype, -bound, bound),
        "bn2": bn_params(mid, dtype),
        "conv3": conv_fanin_normal(ks[3], 1, 1, mid, cout, dtype),
        "bn3": bn_params(cout, dtype),
    }
    s = {"bn1": bn_stats(mid, dtype), "bn2": bn_stats(mid, dtype), "bn3": bn_stats(cout, dtype)}
    if cin != cout:
        p["conv_sc"] = conv_fanin_normal(ks[4], 1, 1, cin, cout, dtype)
    return p, s


def _init_block(key, cin: int, cout: int, fwt: bool, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": conv_fanin_normal(ks[0], 3, 3, cin, cout, dtype),
        "bn1": bn_params(cout, dtype),
        "conv2": conv_fanin_normal(ks[1], 3, 3, cout, cout, dtype),
        "bn2": bn_params(cout, dtype),
    }
    s = {"bn1": bn_stats(cout, dtype), "bn2": bn_stats(cout, dtype)}
    if cin != cout:
        p["conv_sc"] = conv_fanin_normal(ks[2], 1, 1, cin, cout, dtype)
        p["bn_sc"] = bn_params(cout, dtype)
        s["bn_sc"] = bn_stats(cout, dtype)
    if fwt:
        # FWT noise-strength parameters, init 0.3 / 0.5, non-trainable
        # (reference backbone.py:322-325).  Applied to bn2 and bn_sc only.
        p["fwt_gamma2"] = jnp.full((cout,), 0.3, dtype)
        p["fwt_beta2"] = jnp.full((cout,), 0.5, dtype)
        if cin != cout:
            p["fwt_gamma_sc"] = jnp.full((cout,), 0.3, dtype)
            p["fwt_beta_sc"] = jnp.full((cout,), 0.5, dtype)
    return p, s


def init_backbone(key, cfg: ResNetCfg, dtype=jnp.float32):
    """Returns ``(params, stats)`` pytrees."""
    n_blocks = sum(cfg.stage_sizes)
    keys = jax.random.split(key, n_blocks + 1)
    if cfg.stem:
        params = {
            "stem_conv": conv_fanin_normal(keys[0], 7, 7, cfg.stem_in, 64, dtype),
            "stem_bn": bn_params(64, dtype),
            "stages": [],
        }
        stats = {"stem_bn": bn_stats(64, dtype), "stages": []}
        cin = 64
    else:  # stem-less ResNet_fin variant (backbone.py:481-509)
        params = {"stages": []}
        stats = {"stages": []}
        cin = cfg.stem_in
    k = 1
    fwt = cfg.block == "fwt"
    for i, n in enumerate(cfg.stage_sizes):
        sp, ss = [], []
        for j in range(n):
            if cfg.block == "bottleneck":
                p, s = _init_bottleneck_block(keys[k], cin, cfg.widths[i], dtype)
            else:
                p, s = _init_block(keys[k], cin, cfg.widths[i], fwt, dtype)
            sp.append(p)
            ss.append(s)
            cin = cfg.widths[i]
            k += 1
        params["stages"].append(sp)
        stats["stages"].append(ss)
    return params, stats


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------


class BNCtx(NamedTuple):
    """Bundles the BN execution mode threaded through every layer."""

    use_batch_stats: bool
    update_stats: bool
    momentum: float
    sample_mask: Optional[jnp.ndarray]
    #: >1: batch statistics per contiguous group of N/groups rows (the eval
    #: engine's batched replica-group fan-out; ops/norm.py:batch_norm)
    groups: int = 1


def _bn(x, p, s, ctx: BNCtx):
    return batch_norm(
        x,
        p,
        s,
        use_batch_stats=ctx.use_batch_stats,
        update_stats=ctx.update_stats,
        momentum=ctx.momentum,
        sample_mask=ctx.sample_mask,
        groups=ctx.groups,
    )


def _fwt_noise(x, gamma_p, beta_p, rng):
    """Sampled per-channel affine noise (reference backbone.py:345-349)."""
    c = x.shape[-1]
    kg, kb = jax.random.split(rng)
    gamma = 1.0 + jax.random.normal(kg, (c,), x.dtype) * softplus100(gamma_p.astype(x.dtype))
    beta = jax.random.normal(kb, (c,), x.dtype) * softplus100(beta_p.astype(x.dtype))
    return gamma * x + beta


def _cd(cfg: "ResNetCfg"):
    """MXU compute dtype from the cfg (None = keep input dtype)."""
    return None if cfg.compute_dtype == "float32" else jnp.dtype(cfg.compute_dtype)


def _apply_bottleneck(p, s, x, half_res: bool, ctx: BNCtx, cd=None):
    """BottleneckBlock forward (reference backbone.py:297-311): the stride
    sits on C2 and on the conv shortcut; the shortcut has no BN."""
    stride = 2 if half_res else 1
    out = conv2d(x, p["conv1"], stride=1, padding=0, compute_dtype=cd)
    out, s1 = _bn(out, p["bn1"], s["bn1"], ctx)
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"], stride=stride, padding=1, compute_dtype=cd)
    out = out + p["conv2_b"].astype(out.dtype)
    out, s2 = _bn(out, p["bn2"], s["bn2"], ctx)
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv3"], stride=1, padding=0, compute_dtype=cd)
    out, s3 = _bn(out, p["bn3"], s["bn3"], ctx)
    short = conv2d(x, p["conv_sc"], stride=stride, padding=0, compute_dtype=cd) if "conv_sc" in p else x
    return jax.nn.relu(out + short), {"bn1": s1, "bn2": s2, "bn3": s3}


def _apply_block(p, s, x, half_res: bool, ctx: BNCtx, fwt: bool, train: bool, rng, cd=None):
    if "conv3" in p:
        return _apply_bottleneck(p, s, x, half_res, ctx, cd)
    stride = 2 if half_res else 1
    out = conv2d(x, p["conv1"], stride=stride, padding=1, compute_dtype=cd)
    out, s1 = _bn(out, p["bn1"], s["bn1"], ctx)
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"], stride=1, padding=1, compute_dtype=cd)
    out, s2 = _bn(out, p["bn2"], s["bn2"], ctx)
    new_s = {"bn1": s1, "bn2": s2}
    if fwt and train and rng is not None:
        r1, r2 = jax.random.split(rng)
        out = _fwt_noise(out, p["fwt_gamma2"], p["fwt_beta2"], r1)
    if "conv_sc" in p:
        short = conv2d(x, p["conv_sc"], stride=stride, padding=0, compute_dtype=cd)
        short, ssc = _bn(short, p["bn_sc"], s["bn_sc"], ctx)
        new_s["bn_sc"] = ssc
        if fwt and train and rng is not None:
            short = _fwt_noise(short, p["fwt_gamma_sc"], p["fwt_beta_sc"], r2)
    else:
        short = x
    return jax.nn.relu(out + short), new_s


def apply_backbone(
    params,
    stats,
    x: jnp.ndarray,
    *,
    cfg: ResNetCfg,
    train: bool,
    update_stats: bool = False,
    momentum: float = 0.1,
    rng=None,
    sample_mask: Optional[jnp.ndarray] = None,
    start_stage: int = 0,
):
    """Forward pass.  ``x: [N, H, W, 3]`` (or a stage-``start_stage`` feature
    map when resuming from precomputed trunk features).

    Returns ``(features, new_stats)``.  ``features`` is ``[N, feat_dim]`` when
    ``cfg.flatten`` else the ``[N, 7, 7, C]`` map.

    ``train=True`` -> batch statistics (optionally folding ``sample_mask``)
    and, with ``update_stats=True``, running-stat updates; ``train=False`` ->
    running statistics.  ``rng`` drives the FWT sampled noise and is only
    needed for ``block='fwt'`` in training.

    ``start_stage``: 0 runs the stem + all stages; ``k>0`` skips the stem and
    stages ``< k`` (used by the eval engine to resume from frozen-trunk
    features — the 4/5 FLOP saving of the per-episode fine-tune path).
    """
    cd = _cd(cfg)
    ctx = BNCtx(train, train and update_stats, momentum, sample_mask)
    fwt = cfg.block == "fwt"
    new_stats = {"stages": [list(s) for s in stats["stages"]]}
    if cfg.stem:
        new_stats["stem_bn"] = stats["stem_bn"]

    n_blocks = sum(cfg.stage_sizes)
    rngs = list(jax.random.split(rng, n_blocks)) if (fwt and train and rng is not None) else [None] * n_blocks

    if start_stage == 0 and cfg.stem:
        x = conv2d(x, params["stem_conv"], stride=2, padding=3, compute_dtype=cd)
        x, new_stats["stem_bn"] = _bn(x, params["stem_bn"], stats["stem_bn"], ctx)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, 1)

    bi = 0
    for i, n in enumerate(cfg.stage_sizes):
        for j in range(n):
            if i >= start_stage:
                half_res = (i >= 1) and (j == 0)  # reference backbone.py:421-422
                x, bs = _apply_block(
                    params["stages"][i][j], stats["stages"][i][j], x, half_res, ctx, fwt, train, rngs[bi], cd
                )
                new_stats["stages"][i][j] = bs
            bi += 1

    if cfg.flatten:
        x = global_avg_pool(x)
    return x, new_stats


def apply_trunk(
    params,
    stats,
    x: jnp.ndarray,
    *,
    cfg: ResNetCfg,
    train: bool,
    sample_mask: Optional[jnp.ndarray] = None,
    rng=None,
    bn_groups: int = 1,
):
    """Stem + every residual block *except the final one* -> feature map.

    The frozen-trunk half of the adaptation split: during per-episode
    fine-tuning only the final block trains (reference finetune.py:242-252),
    so its input feature map can be computed once per support bank instead of
    once per inner-loop minibatch — ~4/5 of the inner-loop FLOPs removed.
    Only valid with batch-stats BN ("episode" bn_mode; the faithful
    per-minibatch mode must run the full backbone per step).

    ``bn_groups > 1``: ``x`` stacks that many replica groups; every BN
    computes statistics per group (ops/norm.py) — equal to separate
    per-group passes, in one kernel (the eval engine's batched fan-out).
    """
    cd = _cd(cfg)
    ctx = BNCtx(train, False, 0.1, sample_mask, bn_groups)
    fwt = cfg.block == "fwt"
    if cfg.stem:
        x = conv2d(x, params["stem_conv"], stride=2, padding=3, compute_dtype=cd)
        x, _ = _bn(x, params["stem_bn"], stats["stem_bn"], ctx)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2, 1)
    n_blocks = sum(cfg.stage_sizes)
    rngs = list(jax.random.split(rng, n_blocks)) if (fwt and train and rng is not None) else [None] * n_blocks
    bi = 0
    for i, n in enumerate(cfg.stage_sizes):
        for j in range(n):
            is_final = (i == len(cfg.stage_sizes) - 1) and (j == n - 1)
            if not is_final:
                half_res = (i >= 1) and (j == 0)
                x, _ = _apply_block(params["stages"][i][j], stats["stages"][i][j], x, half_res, ctx, fwt, train, rngs[bi], cd)
            bi += 1
    return x


def apply_final_block(
    block_params,
    block_stats,
    fmap: jnp.ndarray,
    *,
    cfg: ResNetCfg,
    train: bool,
    sample_mask: Optional[jnp.ndarray] = None,
):
    """The adapted half: final residual block (+ global pool when flattened).

    ``apply_final_block(last, apply_trunk(trunk, x)) == apply_backbone(x)``
    for batch-stats BN.
    """
    ctx = BNCtx(train, False, 0.1, sample_mask)
    i = len(cfg.stage_sizes) - 1
    j = cfg.stage_sizes[-1] - 1
    half_res = (i >= 1) and (j == 0)
    out, _ = _apply_block(block_params, block_stats, fmap, half_res, ctx, cfg.block == "fwt", train, None, _cd(cfg))
    if cfg.flatten:
        out = global_avg_pool(out)
    return out


# --------------------------------------------------------------------------
# adaptation partition (last residual block)
# --------------------------------------------------------------------------


def adapt_split(tree):
    """Split ``tree`` (params or stats) into (trunk, last_block).

    The trunk keeps the original structure with the last block replaced by an
    empty dict placeholder, so ``adapt_merge(trunk, block)`` reconstitutes the
    full tree.  Mirrors the reference's names[:-9] adaptation boundary
    (finetune.py:117, gnnnet.py:138) structurally.
    """
    last = tree["stages"][-1][-1]
    trunk = {k: v for k, v in tree.items() if k != "stages"}
    trunk["stages"] = [list(s) for s in tree["stages"]]
    trunk["stages"][-1] = list(trunk["stages"][-1])
    trunk["stages"][-1][-1] = {}
    return trunk, last


def adapt_merge(trunk, last):
    """Inverse of :func:`adapt_split`."""
    full = {k: v for k, v in trunk.items() if k != "stages"}
    full["stages"] = [list(s) for s in trunk["stages"]]
    full["stages"][-1] = list(full["stages"][-1])
    full["stages"][-1][-1] = last
    return full


def fwt_trainable_mask(params):
    """Pytree of bools: False for the non-trainable FWT gamma/beta params
    (reference backbone.py:324-325), True elsewhere."""

    def walk(tree, key_hint=""):
        if isinstance(tree, dict):
            return {k: (False if k.startswith("fwt_") else walk(v, k)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v) for v in tree]
        return True

    return walk(params)
