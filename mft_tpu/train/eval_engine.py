"""Per-episode transfer fine-tuning — the headline evaluation path.

Reproduces the capability of reference finetune.py (the CDFSL eval driver):
for each test episode, rebuild the pretrained backbone, fine-tune its last
residual block (+ a throwaway linear head) on the augmented support bank,
then score the clean episode with either the meta-trained GNN head
(finetune.py:182-328) or the linear head itself (finetune_linear,
finetune.py:45-174); ``--method all`` sums the two members' softmax scores
(finetune.py:648-650).

Faithfully reproduced quirks (load-bearing for accuracy parity):

* the GNN member's inner loss is CE on the raw 512-d backbone features used
  directly as logits — the throwaway classifier is stepped but contributes
  no gradient (finetune.py:286-291, gnnnet.py:168-170); we therefore omit it,
* the support bank contains the clean support three times: liz_x[0] is
  duplicated and the second no-aug replica equals it bitwise
  (finetune.py:93,225-233; the loader asserts elem[0]==elem[1] at :606),
* the linear member builds the same bank but its permutation only spans
  ``support_size`` — it trains on the clean support alone, 20 epochs
  (finetune.py:139-140),
* both members embed the clean episode with BatchNorm in batch-stats mode
  over all ``n_way*(n_support+n_query)`` images (finetune.py:263-268,306).

TPU-native structure: each member is one pure function of
(pretrained params, episode tensors, key) built on the ``lax.scan`` inner
engine; the driver ``vmap``s it across an episode batch and ``pjit``s over
the device mesh.  ``bn_mode='episode'`` (default) precomputes frozen-trunk
features once per bank; ``bn_mode='minibatch'`` is the bit-faithful path
that recomputes trunk BN statistics per inner minibatch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.core.episode import EpisodeSpec, flatten_episode, query_labels, support_labels
from mft_tpu.methods.baseline import ce_loss, classifier_logits, init_classifier
from mft_tpu.methods.gnnnet import GnnNetCfg, gnn_scores
from mft_tpu.models import backbone as bb
from mft_tpu.train import optimizers as opt
from mft_tpu.train.inner_loop import InnerLoopCfg, inner_fit


class TransferCfg(NamedTuple):
    """Eval-time fine-tune hyperparameters (reference defaults cited)."""

    fine_tune_epochs: int = 5  # GNN member epochs (--fine_tune_epoch, README cmds)
    linear_epochs: int = 20  # linear member epochs (finetune.py:139)
    batch_size: int = 5  # finetune.py:79,214
    inner_lr: float = 0.01  # finetune.py:109,124,240,255
    head_wd: float = 0.001  # classifier Adam weight decay (finetune.py:109,240)
    bn_mode: str = "episode"  # 'episode' (fast) | 'minibatch' (faithful)
    freeze_backbone: bool = False  # --freeze_backbone
    #: Adam moment-state dtype inside the inner scans: 'float32' (strict
    #: torch-Adam state parity) | 'bfloat16' (both moments stored bf16,
    #: per-step math f32 — cuts optimizer HBM traffic ~2x, 122 -> 93 ms/ep
    #: on v5e, bitwise-identical predictions on validation episodes).
    #: fp8 moments were measured and REJECTED: accuracy collapses
    #: (92.5% -> 40%) and the conversions cost more than the traffic saved
    #: (docs/PERF.md).
    opt_state_dtype: str = "bfloat16"
    #: dtype the adapted block's parameters are *carried* in across inner
    #: scan steps.  The scans are HBM-bound on per-lane parameter + optimizer
    #: traffic (docs/PERF.md), so bfloat16 storage buys ~25-35%; per-step
    #: Adam math stays f32.  'float32' = strict parity.
    inner_param_dtype: str = "float32"
    #: lax.scan unroll factor for the inner scans (see InnerLoopCfg.unroll)
    inner_unroll: int = 1
    #: 'step' gathers each minibatch's bank rows per scan step; 'epoch'
    #: permutes the feature bank once per epoch and slices contiguous
    #: minibatches (identical numerics, fewer per-step ops; fast path only)
    inner_gather: str = "step"
    #: 'flat' ravels the adapted block (and its Adam moments) into ONE
    #: contiguous buffer per lane for the scan carry — elementwise-identical
    #: numerics (verified), one fused optimizer kernel instead of one per
    #: leaf.  Measured on the v5e it LOSES (7.9 vs 13.1 eps/s): the
    #: per-step unravel re-materializes every leaf from the flat buffer,
    #: costing more copies than the per-leaf op overhead it removes
    #: (docs/PERF.md r3 ablation).  Kept as a measured-rejected knob.
    inner_carry: str = "tree"
    #: 'seq' runs the --method all members' inner scans back to back;
    #: 'lane' fuses them into one scan for their shared first steps (the
    #: linear member's 100 steps ride the GNN member's 500 as extra lanes) —
    #: numerically identical (tests/test_eval_engine.py), measured verdict
    #: in docs/PERF.md.  Fast path (fmap bank + tree carry + step gather)
    #: only; other modes fall back to 'seq'.
    ensemble_fuse: str = "seq"
    #: replica groups per trunk pass in the eval bank fan-out (1 = one pass
    #: per group).  >1 stacks groups into one conv batch with PER-GROUP BN
    #: statistics (ops/norm.py groups) — numerically equal to separate
    #: passes (pinned in tests), fewer/larger MXU launches.  Rounded down to
    #: a divisor of gen_examples+1; measured verdict in docs/PERF.md.
    fanout_group_pass: int = 1


def bank_labels(spec: EpisodeSpec, replicas: int) -> jnp.ndarray:
    """Labels for the stacked support bank: [replicas * n_way * n_support]."""
    return jnp.tile(support_labels(spec), replicas)


def _bank_images(support_replicas: jnp.ndarray) -> jnp.ndarray:
    """[R, n_way, n_support, H, W, C] -> [R * n_way * n_support, H, W, C]."""
    r = support_replicas.shape[0]
    return support_replicas.reshape((r * support_replicas.shape[1] * support_replicas.shape[2],) + support_replicas.shape[3:])


def _bank_fmap(
    trunk_p,
    trunk_s,
    support_base: jnp.ndarray,
    key,
    *,
    bcfg: bb.ResNetCfg,
    aug_cfg,
    gen_examples: int,
    bn_train: bool,
    clean_only: bool = False,
    group_pass: int = 1,
):
    """Frozen-trunk feature maps of the eval support bank, one replica group
    at a time (or ``group_pass`` groups per batched pass).

    TPU-first memory shape: the reference materializes the whole augmented
    image bank (f32 ``[R*support, 224, 224, 3]`` ≈ 300 MB per episode lane);
    here each replica group is augmented on the fly (ops/augment.py), pushed
    through the frozen trunk, and discarded — peak extra memory is one
    25-image group, and only the ``[R*support, 14, 14, C]`` feature bank
    (bf16 under the fast path) stays resident.  Trunk BN batch statistics are
    computed per replica group (one full support set) — or per <=128-image
    sub-chunk for groups larger than 128 (e.g. 50-shot's 250-image groups
    split into 125s) — the closest granularity to the reference's per-bank
    semantics that never stores images.

    ``clean_only``: the linear member trains on the clean support alone
    (reference finetune.py:139-140), so its bank is one center-view group.
    Returns ``[span, h, w, c]`` with replica order = clean x3 then the
    ``gen_examples`` augmented groups (finetune.py:93,225-233).
    """
    from mft_tpu.ops.augment import augment_batch, center_batch, pipeline_dtype, to_float

    # the replica fan-out runs at the backbone's compute dtype: bf16 halves
    # the warp/jitter traffic (~28% of the eval batch was this fan-out,
    # docs/PERF.md r3 trace) at uint8-source precision
    dt = pipeline_dtype(bcfg.compute_dtype)
    support = to_float(support_base, dt)
    n = support.shape[0] * support.shape[1]
    # bound peak trunk activation memory: sub-chunk large replica groups
    # (50-shot groups are 250 images; the stem output alone would be ~GBs)
    chunk = n
    for cand in range(min(n, 128), 0, -1):
        if n % cand == 0:
            chunk = cand
            break

    def trunk_of(imgs):
        flat = imgs.reshape((n,) + imgs.shape[2:])
        if chunk == n:
            return bb.apply_trunk(trunk_p, trunk_s, flat, cfg=bcfg, train=bn_train)
        sub = flat.reshape((n // chunk, chunk) + flat.shape[1:])
        out = jax.lax.map(lambda xc: bb.apply_trunk(trunk_p, trunk_s, xc, cfg=bcfg, train=bn_train), sub)
        return out.reshape((n,) + out.shape[2:])

    if clean_only:
        return jax.lax.stop_gradient(trunk_of(center_batch(support, aug_cfg.image_size, dtype=dt)))

    # batched fan-out: stack `gpp` replica groups per trunk pass with
    # per-group BN statistics (bn_groups) — numerically equal to per-group
    # passes (tests/test_eval_engine.py::test_fanout_group_pass_matches),
    # fewer/larger MXU launches.  STREAMING: each pass augments its own gpp
    # groups inside the lax.map body (clean selected into slot 0 of pass 0),
    # so peak image memory is gpp groups — never the whole bank.  gpp is
    # rounded down to a divisor of G = gen_examples + 1 under a
    # 512-image/pass activation guard; gpp == 1 keeps the original
    # group-at-a-time path.
    G = gen_examples + 1
    gpp = 1
    # n <= 128: groups larger than the gpp==1 path's BN sub-chunk threshold
    # (trunk_of above) must take that path — the grouped pass computes BN
    # statistics over whole n-row groups, which only equals the default
    # path when the default path doesn't sub-chunk.
    if gen_examples and bn_train and n <= 128:
        for d in range(min(group_pass, G), 1, -1):
            if G % d == 0 and d * n <= 512:
                gpp = d
                break
    if gpp > 1:
        keys = jax.random.split(key, gen_examples)
        all_keys = jnp.concatenate([keys[:1], keys], axis=0)  # slot 0 = dummy
        is_clean = jnp.arange(G) == 0
        clean_imgs = center_batch(support, aug_cfg.image_size, dtype=dt)

        def pass_body(xs):
            ks, flags = xs  # [gpp] keys, [gpp] bool
            imgs = jax.vmap(lambda k: augment_batch(k, support, aug_cfg, dtype=dt))(ks)
            imgs = jnp.where(
                flags.reshape((gpp,) + (1,) * (imgs.ndim - 1)), clean_imgs[None], imgs
            )
            flat = imgs.reshape((gpp * n,) + imgs.shape[3:])
            return bb.apply_trunk(trunk_p, trunk_s, flat, cfg=bcfg, train=bn_train, bn_groups=gpp)

        xs = (all_keys.reshape((G // gpp, gpp) + all_keys.shape[1:]),
              is_clean.reshape(G // gpp, gpp))
        if G == gpp:
            out = pass_body((all_keys, is_clean))
        else:
            out = jax.lax.map(pass_body, xs)
        out = out.reshape((G, n) + out.shape[-3:])
        fmap = jnp.concatenate([out[:1], out[:1], out], axis=0)  # clean x3 + augs
        return jax.lax.stop_gradient(fmap.reshape((-1,) + fmap.shape[2:]))

    clean = trunk_of(center_batch(support, aug_cfg.image_size, dtype=dt))
    fmap = jnp.stack([clean, clean, clean])
    if gen_examples:
        keys = jax.random.split(key, gen_examples)
        augs = jax.lax.map(lambda k: trunk_of(augment_batch(k, support, aug_cfg, dtype=dt)), keys)
        fmap = jnp.concatenate([fmap, augs], axis=0)
    return jax.lax.stop_gradient(fmap.reshape((-1,) + fmap.shape[2:]))


def _prepare_adapt(
    params,
    stats,
    bank_y,
    *,
    bcfg: bb.ResNetCfg,
    tcfg: TransferCfg,
    epochs: int,
    head: Optional[dict],
    train_head_only: bool = False,
    perm_span: Optional[int] = None,
    bank_x: Optional[jnp.ndarray] = None,
    fmap_bank: Optional[jnp.ndarray] = None,
):
    """Build one member's inner-loop task: ``(p0, loss_fn, tx, icfg, finish,
    ctx)`` with ``finish(adapted) -> (block, head)``.

    ``loss_fn/p0/tx`` drive :func:`inner_fit` directly (the default
    tree-carry, per-step-gather mode) — and, because tasks are first-class
    here, two members' tasks can share ONE scan
    (:func:`~mft_tpu.train.inner_loop.inner_fit_pair`, the ensemble
    lane-fusion path).  ``ctx`` carries the pieces the special scan modes in
    :func:`_adapt_block` (flat carry / epochwise gather) reuse.
    """
    trunk_p, block_p = bb.adapt_split(params)
    trunk_s, block_s = bb.adapt_split(stats)
    fast = fmap_bank is not None
    span = perm_span if perm_span is not None else (fmap_bank.shape[0] if fast else bank_x.shape[0])
    icfg = InnerLoopCfg(epochs=epochs, batch_size=tcfg.batch_size, bank_size=span, unroll=tcfg.inner_unroll)

    # frozen backbone runs in eval() -> running BN statistics (finetune.py:132-135)
    bn_train = not tcfg.freeze_backbone

    if tcfg.inner_param_dtype != "float32":
        # carry the adapted parameters in bf16 across scan steps: the scans
        # are HBM-bound on per-lane parameter traffic (docs/PERF.md §ablation)
        pd = jnp.dtype(tcfg.inner_param_dtype)
        cast = lambda t: jax.tree.map(lambda a: a.astype(pd), t)
        block_p = cast(block_p)
        head = cast(head) if head is not None else None

    def features_of(block, idx, w):
        if fast:
            f = fmap_bank[idx]
            return bb.apply_final_block(block, block_s, f, cfg=bcfg, train=bn_train, sample_mask=w)
        full = bb.adapt_merge(trunk_p, block)
        full_s = bb.adapt_merge(trunk_s, block_s)
        feats, _ = bb.apply_backbone(full, full_s, bank_x[idx], cfg=bcfg, train=bn_train, sample_mask=w)
        return feats

    adam = opt.torch_adam if tcfg.opt_state_dtype == "float32" else opt.torch_adam_lowmem

    if head is None:
        # GNN member: CE on raw features-as-logits (finetune.py:286-291)
        tx = adam(tcfg.inner_lr)
        p0 = block_p

        def loss_fn(p, idx, w):
            return ce_loss(features_of(p, idx, w), bank_y[idx], w)

        finish = lambda adapted: (adapted, None)
    else:
        # linear member: CE through the classifier; block + head train unless
        # the backbone is frozen (finetune.py:123-124,144-164)
        p0 = {"adapt": block_p, "head": head}
        if tcfg.freeze_backbone or train_head_only:
            tx = opt.grouped(
                {"adapt": opt.torch_sgd(0.0), "head": adam(tcfg.inner_lr, tcfg.head_wd)},
                {"adapt": "adapt", "head": "head"},
            )
        else:
            tx = opt.grouped(
                {"adapt": adam(tcfg.inner_lr), "head": adam(tcfg.inner_lr, tcfg.head_wd)},
                {"adapt": "adapt", "head": "head"},
            )

        def loss_fn(p, idx, w):
            feats = features_of(p["adapt"], idx, w)
            return ce_loss(classifier_logits(p["head"], feats), bank_y[idx], w)

        finish = lambda adapted: (adapted["adapt"], adapted["head"])

    ctx = dict(
        features_of=features_of, block_p=block_p, block_s=block_s, head=head,
        bn_train=bn_train, fast=fast, span=span,
    )
    return p0, loss_fn, tx, icfg, finish, ctx


def _adapt_block(
    params,
    stats,
    bank_y,
    key,
    *,
    bcfg: bb.ResNetCfg,
    tcfg: TransferCfg,
    epochs: int,
    head: Optional[dict],
    train_head_only: bool = False,
    perm_span: Optional[int] = None,
    bank_x: Optional[jnp.ndarray] = None,
    fmap_bank: Optional[jnp.ndarray] = None,
    schedule=None,
):
    """Fine-tune the final block (and optional linear head) on a bank.

    Exactly one of ``fmap_bank`` (fast path: precomputed frozen-trunk feature
    maps, already restricted to the permutation span) or ``bank_x``
    (faithful path: bank images; the full backbone reruns per minibatch,
    reference finetune.py:286) must be given.  ``perm_span``: permutations
    span only the first ``perm_span`` bank rows (the linear member's
    clean-support-only quirk).

    Returns ``(adapted_block, adapted_head)``.
    """
    p0, loss_fn, tx, icfg, finish, ctx = _prepare_adapt(
        params, stats, bank_y, bcfg=bcfg, tcfg=tcfg, epochs=epochs, head=head,
        train_head_only=train_head_only, perm_span=perm_span, bank_x=bank_x, fmap_bank=fmap_bank,
    )
    epochwise = ctx["fast"] and tcfg.inner_gather == "epoch"
    # flat contiguous carry: ravel the adapted tensors into one buffer per
    # optimizer group so the scan's Adam update is a single fused kernel
    # over contiguous memory instead of one per leaf (elementwise-identical)
    flat_mode = tcfg.inner_carry == "flat" and not epochwise
    if not epochwise and not flat_mode:
        return finish(inner_fit(loss_fn, p0, tx, key, icfg, schedule=schedule))

    features_of, block_p, block_s = ctx["features_of"], ctx["block_p"], ctx["block_s"]
    head, bn_train = ctx["head"], ctx["bn_train"]
    if epochwise:
        from mft_tpu.train.inner_loop import inner_fit_epochwise

        banks = {"x": fmap_bank, "y": bank_y[: ctx["span"]]}

        def chunk_feats(block, chunk, w):
            return bb.apply_final_block(block, block_s, chunk["x"], cfg=bcfg, train=bn_train, sample_mask=w)

        if head is None:
            def loss_fn_e(p, chunk, w):
                return ce_loss(chunk_feats(p, chunk, w), chunk["y"], w)

            return inner_fit_epochwise(loss_fn_e, block_p, tx, key, icfg, banks), None

        def loss_fn_e(p, chunk, w):
            logits = classifier_logits(p["head"], chunk_feats(p["adapt"], chunk, w))
            return ce_loss(logits, chunk["y"], w)

        adapted = inner_fit_epochwise(loss_fn_e, p0, tx, key, icfg, banks)
        return adapted["adapt"], adapted["head"]

    from jax.flatten_util import ravel_pytree

    if head is None:
        flat0, unravel = ravel_pytree(block_p)

        def loss_fn_f(f, idx, w):
            return ce_loss(features_of(unravel(f), idx, w), bank_y[idx], w)

        adapted_f = inner_fit(loss_fn_f, flat0, tx, key, icfg, schedule=schedule)
        return unravel(adapted_f), None

    flat_a, unravel_a = ravel_pytree(block_p)
    flat_h, unravel_h = ravel_pytree(head)
    pf = {"adapt": flat_a, "head": flat_h}

    def loss_fn_f(p, idx, w):
        feats = features_of(unravel_a(p["adapt"]), idx, w)
        logits = classifier_logits(unravel_h(p["head"]), feats)
        return ce_loss(logits, bank_y[idx], w)

    adapted = inner_fit(loss_fn_f, pf, tx, key, icfg, schedule=schedule)
    return unravel_a(adapted["adapt"]), unravel_h(adapted["head"])


def _embed_episode(params, stats, episode, *, bcfg, spec, train: bool = True):
    """Clean-episode features; BN in batch-stats mode over all images by
    default (finetune.py:306: ``pretrained_model(x_inn)`` with the model in
    train()); ``--freeze_backbone`` switches the model to eval() and hence
    running statistics (finetune.py:263-266)."""
    flat = flatten_episode(episode)
    feats, _ = bb.apply_backbone(params, stats, flat, cfg=bcfg, train=train)
    return feats.reshape(spec.n_way, spec.n_per_class, -1)


def _is_fast_bank(support_bank: jnp.ndarray) -> bool:
    """Fast (episode) mode passes the raw base-res support
    ``[n_way, n_support, H0, W0, 3]``; the faithful minibatch mode passes
    materialized replicas ``[R, n_way, n_support, S, S, 3]``."""
    return support_bank.ndim == 5


def _member_bank(
    backbone_params, backbone_stats, support_bank, k_aug, *,
    bcfg, tcfg, aug_cfg, gen_examples, clean_only: bool = False,
):
    """Returns ``(fmap_bank, bank_x, n_replicas)`` for :func:`_adapt_block`."""
    if _is_fast_bank(support_bank):
        trunk_p, _ = bb.adapt_split(backbone_params)
        trunk_s, _ = bb.adapt_split(backbone_stats)
        fmap = _bank_fmap(
            trunk_p, trunk_s, support_bank, k_aug, bcfg=bcfg, aug_cfg=aug_cfg,
            gen_examples=gen_examples, bn_train=not tcfg.freeze_backbone, clean_only=clean_only,
            group_pass=tcfg.fanout_group_pass,
        )
        return fmap, None, (1 if clean_only else gen_examples + 3)
    return None, _bank_images(support_bank), support_bank.shape[0]


def _finetune_features(
    backbone_params,
    backbone_stats,
    episode,
    support_bank,
    k_aug,
    k_fit,
    *,
    bcfg: bb.ResNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
    inner_schedule=None,
):
    """The head-agnostic core of the reference's ``finetune()``
    (finetune.py:182-306), shared by the GNN / ProtoNet / DampNet members:
    build the augmented support bank, transfer-fine-tune the backbone's
    last block on it (``fine_tune_epochs`` x batch-5 Adam, throwaway
    classifier quirk inside ``_adapt_block``), then embed the clean episode
    with the ADAPTED backbone in train-mode BN.  Returns episode features
    ``[n_way, s+q, feat]``."""
    fmap_bank, bank_x, n_rep = _member_bank(
        backbone_params, backbone_stats, support_bank, k_aug,
        bcfg=bcfg, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
    )
    bank_y = bank_labels(spec, n_rep)
    adapted_block, _ = _adapt_block(
        backbone_params, backbone_stats, bank_y, k_fit,
        bcfg=bcfg, tcfg=tcfg, epochs=tcfg.fine_tune_epochs, head=None,
        fmap_bank=fmap_bank, bank_x=bank_x, schedule=inner_schedule,
    )
    trunk_p, _ = bb.adapt_split(backbone_params)
    full = bb.adapt_merge(trunk_p, adapted_block)
    return _embed_episode(full, backbone_stats, episode, bcfg=bcfg, spec=spec)


def gnn_member_scores(
    backbone_params,
    backbone_stats,
    head,
    episode,
    support_bank,
    k_aug,
    k_fit,
    *,
    bcfg: bb.ResNetCfg,
    gcfg: GnnNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
    inner_schedule=None,
):
    """finetune() with the GNN head (finetune.py:182-328) -> softmax scores
    [n_way*n_query, n_way].

    ``inner_schedule``: explicit (idx, w) minibatch schedule (golden parity
    replay — see inner_loop.schedule_from_perms).

    ``support_bank``: raw base-res support (fast path, replicas generated on
    the fly from ``k_aug``) or materialized replicas with replica 0 = clean
    (faithful path; R = gen_examples + 3 matches the reference's
    triple-counted clean support)."""
    if tcfg.freeze_backbone:
        # frozen backbone: the GNN member's inner loss trains nothing the
        # scoring uses (the throwaway classifier gets zero gradient), so the
        # adaptation is a no-op; the model runs in eval() (finetune.py:263-266)
        feats = _embed_episode(backbone_params, backbone_stats, episode, bcfg=bcfg, spec=spec, train=False)
        return jax.nn.softmax(gnn_scores(head, feats, gcfg, spec.n_query), axis=1)
    feats = _finetune_features(
        backbone_params, backbone_stats, episode, support_bank, k_aug, k_fit,
        bcfg=bcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
        inner_schedule=inner_schedule,
    )
    scores = gnn_scores(head, feats, gcfg, spec.n_query)
    return jax.nn.softmax(scores, axis=1)


def linear_member_scores(
    backbone_params,
    backbone_stats,
    episode,
    support_bank,
    k_aug,
    k_fit,
    *,
    bcfg: bb.ResNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
    inner_schedule=None,
    head0=None,
):
    """finetune_linear (finetune.py:45-174) -> softmax scores.

    Reproduces the reference quirk of building the full augmented bank but
    permuting/training over only the first ``support_size`` rows (the clean
    support), for ``linear_epochs`` epochs — the fast path therefore never
    builds the augmented groups at all (``clean_only``).

    ``inner_schedule``/``head0``: explicit minibatch schedule / classifier
    init (golden parity replay against the torch reference)."""
    k_head, k_fit = jax.random.split(k_fit)
    if head0 is None:
        head0 = init_classifier(k_head, bcfg.feat_dim, spec.n_way, zero_bias=False)
    fmap_bank, bank_x, n_rep = _member_bank(
        backbone_params, backbone_stats, support_bank, k_aug,
        bcfg=bcfg, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples, clean_only=True,
    )
    bank_y = bank_labels(spec, n_rep)
    adapted_block, adapted_head = _adapt_block(
        backbone_params, backbone_stats, bank_y, k_fit,
        bcfg=bcfg, tcfg=tcfg, epochs=tcfg.linear_epochs, head=head0,
        perm_span=spec.support_size, fmap_bank=fmap_bank, bank_x=bank_x, schedule=inner_schedule,
    )
    trunk_p, _ = bb.adapt_split(backbone_params)
    full = bb.adapt_merge(trunk_p, adapted_block)
    feats = _embed_episode(full, backbone_stats, episode, bcfg=bcfg, spec=spec, train=not tcfg.freeze_backbone)
    q_feats = feats[:, spec.n_support :].reshape(spec.query_size, -1)
    return jax.nn.softmax(classifier_logits(adapted_head, q_feats), axis=1)


def proto_member_scores(
    backbone_params,
    backbone_stats,
    episode,
    support_bank,
    k_aug,
    k_fit,
    *,
    bcfg: bb.ResNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
):
    """finetune() with the ProtoNet head (--method protonet,
    finetune.py:441-442,619 + protonet.py:30-39): same block adaptation as
    the GNN member (finetune() is head-agnostic), scored by prototype
    distances on the adapted features."""
    from mft_tpu.methods.protonet import proto_scores

    if tcfg.freeze_backbone:
        # frozen backbone: the inner loop trains nothing the prototype
        # scoring uses — same no-op shortcut as the GNN member
        # (finetune.py:242-266)
        feats = _embed_episode(backbone_params, backbone_stats, episode, bcfg=bcfg, spec=spec, train=False)
        scores = proto_scores(feats[:, : spec.n_support], feats[:, spec.n_support :], spec)
        return jax.nn.softmax(scores, axis=1)
    feats = _finetune_features(
        backbone_params, backbone_stats, episode, support_bank, k_aug, k_fit,
        bcfg=bcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
    )
    scores = proto_scores(feats[:, : spec.n_support], feats[:, spec.n_support :], spec)
    return jax.nn.softmax(scores, axis=1)


def ensemble_episode_scores(
    baseline_params,
    baseline_stats,
    gnn_backbone_params,
    gnn_backbone_stats,
    gnn_head,
    episode,
    support_bank,
    k_aug,
    key,
    *,
    bcfg: bb.ResNetCfg,
    gcfg: GnnNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
):
    """--method all: softmax(linear member) + softmax(GNN member)
    (finetune.py:648-650).  Both members share ``k_aug`` — the reference
    hands the same liz_x bank to both (finetune.py:648-650)."""
    k1, k2 = jax.random.split(key)
    if (
        tcfg.ensemble_fuse == "lane"
        and _is_fast_bank(support_bank)
        and not tcfg.freeze_backbone
        and tcfg.inner_gather == "step"
        and tcfg.inner_carry == "tree"
    ):
        return _fused_ensemble_scores(
            baseline_params, baseline_stats, gnn_backbone_params, gnn_backbone_stats,
            gnn_head, episode, support_bank, k_aug, k1, k2,
            bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
        )
    s_lin = linear_member_scores(
        baseline_params, baseline_stats, episode, support_bank, k_aug, k1,
        bcfg=bcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
    )
    s_gnn = gnn_member_scores(
        gnn_backbone_params, gnn_backbone_stats, gnn_head, episode, support_bank, k_aug, k2,
        bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
    )
    return s_lin + s_gnn


def _fused_ensemble_scores(
    baseline_params,
    baseline_stats,
    gnn_backbone_params,
    gnn_backbone_stats,
    gnn_head,
    episode,
    support_bank,
    k_aug,
    k_lin,
    k_gnn,
    *,
    bcfg: bb.ResNetCfg,
    gcfg: GnnNetCfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
):
    """``ensemble_fuse='lane'``: both members' inner scans share iterations
    (inner_fit_pair) instead of running back to back — the linear member's
    100 steps ride the GNN member's first 100 of 500 as extra lanes, so the
    fused eval runs 500 scan iterations instead of 600.  Key flow, bank
    construction, schedules, and update math mirror the sequential members
    exactly (numerical identity pinned by
    tests/test_eval_engine.py::test_ensemble_fuse_lane_matches_seq)."""
    from mft_tpu.train.inner_loop import inner_fit_pair

    # linear member pre-phase (mirrors linear_member_scores:440-452)
    k_head, k_fit_lin = jax.random.split(k_lin)
    head0 = init_classifier(k_head, bcfg.feat_dim, spec.n_way, zero_bias=False)
    fmap_lin, _, n_rep_lin = _member_bank(
        baseline_params, baseline_stats, support_bank, k_aug,
        bcfg=bcfg, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples, clean_only=True,
    )
    p_lin, loss_lin, tx_lin, icfg_lin, fin_lin, _ = _prepare_adapt(
        baseline_params, baseline_stats, bank_labels(spec, n_rep_lin),
        bcfg=bcfg, tcfg=tcfg, epochs=tcfg.linear_epochs, head=head0,
        perm_span=spec.support_size, fmap_bank=fmap_lin,
    )
    # GNN member pre-phase (mirrors _finetune_features:358-366)
    fmap_gnn, _, n_rep_gnn = _member_bank(
        gnn_backbone_params, gnn_backbone_stats, support_bank, k_aug,
        bcfg=bcfg, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
    )
    p_gnn, loss_gnn, tx_gnn, icfg_gnn, fin_gnn, _ = _prepare_adapt(
        gnn_backbone_params, gnn_backbone_stats, bank_labels(spec, n_rep_gnn),
        bcfg=bcfg, tcfg=tcfg, epochs=tcfg.fine_tune_epochs, head=None, fmap_bank=fmap_gnn,
    )

    a_lin, a_gnn = inner_fit_pair(
        loss_lin, p_lin, tx_lin, k_fit_lin, icfg_lin,
        loss_gnn, p_gnn, tx_gnn, k_gnn, icfg_gnn,
    )
    lin_block, lin_head = fin_lin(a_lin)
    gnn_block, _ = fin_gnn(a_gnn)

    # scoring (mirrors linear_member_scores:453-457 / gnn_member_scores:406-412)
    trunk_b, _ = bb.adapt_split(baseline_params)
    feats_b = _embed_episode(
        bb.adapt_merge(trunk_b, lin_block), baseline_stats, episode, bcfg=bcfg, spec=spec,
    )
    q_feats = feats_b[:, spec.n_support :].reshape(spec.query_size, -1)
    s_lin = jax.nn.softmax(classifier_logits(lin_head, q_feats), axis=1)

    trunk_g, _ = bb.adapt_split(gnn_backbone_params)
    feats_g = _embed_episode(
        bb.adapt_merge(trunk_g, gnn_block), gnn_backbone_stats, episode, bcfg=bcfg, spec=spec,
    )
    s_gnn = jax.nn.softmax(gnn_scores(gnn_head, feats_g, gcfg, spec.n_query), axis=1)
    return s_lin + s_gnn


def dampnet_member_scores(
    backbone_params,
    backbone_stats,
    damp_params,
    damp_state,
    episode,
    support_bank,
    k_aug,
    k_fit,
    *,
    bcfg: bb.ResNetCfg,
    dcfg,
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg=None,
    gen_examples: int = 0,
    eval_mode: str = "finetune",
    with_linear_fusion: bool = True,
    unsup_stats=None,
    inner_schedule=None,
):
    """The LIVE dampnet eval composition (``eval_mode='finetune'``, default):
    the shipped dampnet dispatch routes through ``finetune()`` with
    ``ds=True`` — transfer-fine-tune the backbone's last block on the
    augmented support bank exactly like the GNN member (finetune() is
    head-agnostic, including the features-as-logits inner-loss quirk), then
    score the **adapted** episode features with
    ``set_forward(is_feature=True, domain_shift=True)``
    (/root/reference/finetune_50.py:589-622 sets ``ds=True``, :687 routes to
    finetune; finetune.py:313-314 the ds branch).  No probe fusion — that
    exists only in ``nofinetune`` (:378-414), which the shipped dispatch
    never reaches for dampnet.

    ``eval_mode='nofinetune'``: the no-adaptation composition (the reference's
    ``nofinetune`` ds branch, finetune.py:331-417): embed with the frozen
    backbone, recover vs source prototypes, fc+GNN scoring, optionally fusing
    half the softmax of the 100-epoch linear probe on the recovered 128-d
    projections (``with_linear_fusion``).

    Reference quirk (documented, NOT reproduced): the 5-shot driver never
    sets ``ds=True`` (finetune.py:432), so its dampnet dispatch reaches
    ``set_forward(is_feature=True)`` *without* domain_shift — which crashes
    upstream (BatchNorm1d(128) applied to a rank-3 ``[n_way, slots, 128]``
    tensor, dampnet_full_class.py:100-104 + the 3-D ``fc`` reapplication at
    :125-131).  The working 50-shot composition is implemented for all shot
    counts instead; see README "Faithfully reproduced quirks".

    ``unsup_stats=(mean, std)``: recovery conditioned on an externally
    supplied unlabeled dataset's feature statistics instead of the episode's
    own support stats — the ``--unsupervised`` path (reference
    set_forward_unsup, dampnet_full.py:298-348, which returns the GNN scores
    without the probe fusion)."""
    from mft_tpu.methods.baseline import ce_loss
    from mft_tpu.methods.dampnet import dampnet_scores, recovered_projection
    from mft_tpu.train.inner_loop import InnerLoopCfg, inner_fit
    from mft_tpu.train.optimizers import reference_probe_sgd

    if unsup_stats is not None:
        feats = _embed_episode(backbone_params, backbone_stats, episode, bcfg=bcfg, spec=spec)
        scores = dampnet_scores(
            damp_params, damp_state, feats, dcfg, spec.n_query, mode="unsup", unsup_stats=unsup_stats
        )
        return jax.nn.softmax(scores, axis=1)

    if eval_mode == "finetune" and not tcfg.freeze_backbone:
        # live path: adapt the last block on the bank (identical to the GNN
        # member — finetune.py:238-299), then domain-shift-score the adapted
        # features (finetune.py:306,313-314)
        feats = _finetune_features(
            backbone_params, backbone_stats, episode, support_bank, k_aug, k_fit,
            bcfg=bcfg, spec=spec, tcfg=tcfg, aug_cfg=aug_cfg, gen_examples=gen_examples,
            inner_schedule=inner_schedule,
        )
        scores = dampnet_scores(damp_params, damp_state, feats, dcfg, spec.n_query, mode="domain_shift")
        return jax.nn.softmax(scores, axis=1)

    key = k_fit
    # freeze_backbone routes finetune() through eval() -> running BN stats
    # (finetune.py:265-266); nofinetune never leaves train mode -> batch stats
    bn_train = True if eval_mode != "finetune" else not tcfg.freeze_backbone
    feats = _embed_episode(backbone_params, backbone_stats, episode, bcfg=bcfg, spec=spec, train=bn_train)
    scores = dampnet_scores(damp_params, damp_state, feats, dcfg, spec.n_query, mode="domain_shift")
    out = jax.nn.softmax(scores, axis=1)
    if eval_mode == "finetune" or not with_linear_fusion:
        # the finetune composition never fuses the probe (:303-317)
        return out

    # set_forward_adaptation_full: probe on the recovered gnn_dim projection
    # (dampnet_full_class.py:471-548): 100 epochs x batch 4, reference SGD
    proj = recovered_projection(damp_params, damp_state, feats, dcfg)
    z_support = proj[:, : spec.n_support].reshape(spec.support_size, -1)
    z_query = proj[:, spec.n_support :].reshape(spec.query_size, -1)
    y_support = support_labels(spec)
    k_head, k_fit = jax.random.split(key)
    head = init_classifier(k_head, dcfg.gnn_dim, spec.n_way, zero_bias=False)

    def loss_fn(p, idx, w):
        return ce_loss(classifier_logits(p, z_support[idx]), y_support[idx], w)

    icfg = InnerLoopCfg(epochs=100, batch_size=4, bank_size=spec.support_size)
    head = inner_fit(loss_fn, head, reference_probe_sgd(0.01), k_fit, icfg)
    probe = jax.nn.softmax(classifier_logits(head, z_query), axis=1) / 2.0  # halved (finetune.py:411)
    return out + probe


def make_eval_program(
    *,
    method: str,
    bcfg: bb.ResNetCfg,
    gcfg: Optional[GnnNetCfg],
    spec: EpisodeSpec,
    tcfg: TransferCfg,
    aug_cfg,
    gen_examples: int,
    dcfg=None,
    dampnet_eval: str = "finetune",
    mesh=None,
):
    """Build the fully-fused, episode-batched eval program.

    Returns a jitted function
    ``fn(models, base_episodes [E, n_way, s+q, base, base, 3], keys [E, 2])
    -> (scores [E, q, n_way], acc [E])`` where ``models`` is a dict with
    whatever the method needs: ``baseline=(params, stats)`` and/or
    ``gnn=(params, stats, head)``.

    Inside one XLA program per episode: clean center views, the on-device
    ``gen_examples + 3`` replica fan-out, the scan-based transfer fine-tune,
    and head scoring — vmapped over E.

    ``mesh``: with a >1-device data axis, the program is built as a
    ``shard_map`` over the episode axis — each device runs the per-shard
    vmap LOCALLY, so the compiled program is collective-free BY CONSTRUCTION
    (episodes are independent; models replicated).  Without it, the SPMD
    partitioner is left to shard the vmapped program itself, and it
    all-gathers the per-episode adapted-block weights: a vmapped conv whose
    rhs carries the episode axis lowers to a grouped conv with episodes
    fused into the channel groups, which the partitioner cannot keep local
    (verified from the optimized HLO —
    tests/test_parallel.py::test_eval_program_hlo_has_zero_collectives
    pins the shard_map build at zero collectives).
    """
    from mft_tpu.ops.augment import center_batch, make_eval_replicas, pipeline_dtype

    def one_episode(models, base_episode, key):
        k_aug, k_fit = jax.random.split(key)
        # the clean episode rides the backbone's compute dtype end to end
        # (bf16 halves the center-view + embed activation traffic)
        dt = pipeline_dtype(bcfg.compute_dtype)
        episode = center_batch(base_episode, aug_cfg.image_size, dtype=dt)
        support = base_episode[:, : spec.n_support]
        if tcfg.bn_mode == "episode":
            # fast path: members fan replicas out on the fly inside the
            # frozen-trunk precompute (never materializes the image bank)
            bank = support
        else:
            bank = make_eval_replicas(k_aug, support, aug_cfg, gen_examples)
        mkw = dict(aug_cfg=aug_cfg, gen_examples=gen_examples)
        if method == "all":
            bp, bs = models["baseline"]
            gp, gs, head = models["gnn"]
            scores = ensemble_episode_scores(
                bp, bs, gp, gs, head, episode, bank, k_aug, k_fit,
                bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, **mkw,
            )
        elif method in ("gnnnet", "gnnnet_maml"):
            gp, gs, head = models["gnn"]
            scores = gnn_member_scores(
                gp, gs, head, episode, bank, k_aug, k_fit, bcfg=bcfg, gcfg=gcfg, spec=spec, tcfg=tcfg, **mkw
            )
        elif method == "baseline":
            bp, bs = models["baseline"]
            scores = linear_member_scores(
                bp, bs, episode, bank, k_aug, k_fit, bcfg=bcfg, spec=spec, tcfg=tcfg, **mkw
            )
        elif method == "protonet":
            gp, gs, _ = models["gnn"]
            scores = proto_member_scores(
                gp, gs, episode, bank, k_aug, k_fit, bcfg=bcfg, spec=spec, tcfg=tcfg, **mkw
            )
        elif method.startswith("dampnet"):
            dp, ds_, dparams, dstate = models["dampnet"]
            scores = dampnet_member_scores(
                dp, ds_, dparams, dstate, episode, bank, k_aug, k_fit,
                bcfg=bcfg, dcfg=dcfg, spec=spec, tcfg=tcfg, eval_mode=dampnet_eval,
                unsup_stats=models.get("unsup_stats"), **mkw,
            )
        else:
            raise ValueError(f"unknown eval method {method!r}")
        return scores, episode_accuracy(scores, spec)

    def _vmapped(models, base_episodes, keys):
        return jax.vmap(lambda e, k: one_episode(models, e, k))(base_episodes, keys)

    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import PartitionSpec as P

        # check_vma=False: the replication-tracking AD machinery would wrap
        # the inner-loop grads of the (replicated) model params in
        # psum_invariant collectives that XLA does not elide; the body is
        # manifestly per-episode-local, so tracking buys nothing
        return jax.jit(
            jax.shard_map(
                _vmapped, mesh=mesh, in_specs=(P(), P("data"), P("data")), out_specs=P("data"),
                check_vma=False,
            )
        )
    return jax.jit(_vmapped)


def episode_accuracy(scores: jnp.ndarray, spec: EpisodeSpec) -> jnp.ndarray:
    """Top-1 accuracy (%) vs y_query (finetune.py:625-631)."""
    y = query_labels(spec)
    return jnp.mean((jnp.argmax(scores, axis=1) == y).astype(jnp.float32)) * 100.0


def mean_ci95(acc_all: np.ndarray):
    """600-episode mean +- 1.96*std/sqrt(n) (finetune.py:678-682)."""
    acc_all = np.asarray(acc_all)
    n = len(acc_all)
    return float(acc_all.mean()), float(1.96 * acc_all.std() / np.sqrt(n))
