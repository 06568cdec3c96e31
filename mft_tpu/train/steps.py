"""Meta-training step functions (jit-compiled, episode-batched, mesh-ready).

Capability parity with the reference drivers' training loops:

* supervised baseline pretraining: backbone + linear CE over base classes
  (train.py --method baseline; methods/baselinetrain.py:26-56),
* episodic meta-training of ProtoNet / GnnNet: one Adam step per episode
  batch (train.py:27-42, meta_template.py:58-92),
* the meta fine-tuning stage (--fine_tune): FO-MAML — inner Adam(0.01) on
  the last backbone block over the support set (15 epochs x batch 4,
  gnnnet.py:145-177), outer CE on the query set evaluated at the adapted
  point with the gradient applied to the meta-initialization
  (gnnnet.py:90-103,183-187 + train.py:49-58).

Where the reference steps one episode at a time, these functions take an
episode *batch* ``[E, n_way, s+q, H, W, C]`` (E=1 reproduces the reference
schedule) — E is the data-parallel axis sharded over the mesh; gradient
all-reduce is emitted by XLA from the mean over E.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mft_tpu.core.episode import flatten_episode, support_labels
from mft_tpu.methods.baseline import ce_loss, classifier_logits, top1_accuracy
from mft_tpu.methods.gnnnet import gnn_scores, gnnnet_loss
from mft_tpu.methods.protonet import proto_scores, protonet_loss
from mft_tpu.models import backbone as bb
from mft_tpu.train import optimizers as opt
from mft_tpu.train.inner_loop import InnerLoopCfg, fo_maml_reattach, inner_fit, inner_fit_carry


class MetaFinetuneCfg(NamedTuple):
    """Inner-loop schedule for the meta fine-tuning stage
    (reference gnnnet.py:111,128,145: batch 4, Adam lr 0.01, 15 epochs;
    protonet.py:105 uses 5 epochs)."""

    epochs: int = 15
    batch_size: int = 4
    lr: float = 0.01
    bn_mode: str = "episode"  # 'episode' fast trunk precompute | 'minibatch'


def inner_epochs(method: str, gcfg) -> int:
    """The reference's --fine_tune inner-epoch schedule: 15 for GnnNet
    (gnnnet.py:145) but 5 for BOTH ProtoNet (protonet.py:105) and the
    50-shot compressed variant (gnnnet_copy.py:177); golden-verified by
    test_gnnnet50_finetune_backward_golden."""
    if method != "gnnnet":
        return 5
    if gcfg is not None and getattr(gcfg, "support_compress", 1) > 1:
        return 5
    return 15


# --------------------------------------------------------------------------
# baseline supervised pretraining
# --------------------------------------------------------------------------


def baseline_loss_fn(params, stats, x, y, *, bcfg):
    feats, new_stats = bb.apply_backbone(params["feature"], stats, x, cfg=bcfg, train=True, update_stats=True)
    logits = classifier_logits(params["classifier"], feats)
    return ce_loss(logits, y), (new_stats, top1_accuracy(logits, y))


@functools.partial(jax.jit, static_argnames=("bcfg", "tx"), donate_argnums=(0, 1, 2))
def baseline_train_step(params, stats, opt_state, x, y, *, bcfg, tx):
    (loss, (new_stats, acc)), grads = jax.value_and_grad(baseline_loss_fn, has_aux=True)(
        params, stats, x, y, bcfg=bcfg
    )
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {"loss": loss, "top1": acc}


# --------------------------------------------------------------------------
# episodic meta-training (ProtoNet / GnnNet forward)
# --------------------------------------------------------------------------


def _episode_loss(params, stats, episode, *, method, bcfg, gcfg, spec, rng=None):
    """One episode's loss.  Embeds with train-mode BN (the reference trains
    with BN in batch-stats mode; running stats also update, train.py:167)."""
    flat = flatten_episode(episode)
    feats, new_stats = bb.apply_backbone(
        params["feature"], stats, flat, cfg=bcfg, train=True, update_stats=True, rng=rng
    )
    z = feats.reshape(spec.n_way, spec.n_per_class, -1)
    if method == "protonet":
        scores = proto_scores(z[:, : spec.n_support], z[:, spec.n_support :], spec)
        return protonet_loss(scores, spec), new_stats
    scores = gnn_scores({"fc": params["fc"], "gnn": params["gnn"]}, z, gcfg, spec.n_query)
    return gnnnet_loss(scores, spec.n_way, spec.n_query), new_stats


@functools.partial(jax.jit, static_argnames=("method", "bcfg", "gcfg", "spec", "tx"), donate_argnums=(0, 1, 2))
def episodic_train_step(params, stats, opt_state, episodes, rng, *, method, bcfg, gcfg, spec, tx):
    """episodes: [E, n_way, s+q, H, W, C]; loss averaged over E."""

    def batch_loss(p, s):
        rngs = jax.random.split(rng, episodes.shape[0])
        losses, new_stats = jax.vmap(
            lambda ep, r: _episode_loss(p, s, ep, method=method, bcfg=bcfg, gcfg=gcfg, spec=spec, rng=r)
        )(episodes, rngs)
        # average the per-episode running-stat updates across the batch
        new_stats = jax.tree.map(lambda a: a.mean(axis=0), new_stats)
        return losses.mean(), new_stats

    (loss, new_stats), grads = jax.value_and_grad(batch_loss, has_aux=True)(params, stats)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {"loss": loss}


# --------------------------------------------------------------------------
# DampNet episodic training (train_loop_full)
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("mode", "bcfg", "dcfg", "spec", "tx"), donate_argnums=(0, 1, 2))
def dampnet_train_step(params, stats, opt_state, dstate, episodes, rng, *, mode, bcfg, dcfg, spec, tx):
    """One DampNet step over an episode batch.

    Reproduces train_loop_full (dampnet_full_class.py:425-469): embed with
    the backbone, score via ``dampnet_scores`` in the given mode
    ('plain'/'corrupt'/'recover' per the call-parity schedule), CE on the
    query labels, Adam over all params.  Returns the per-episode support
    feature bank ``[E, n_way*n_support, feat]`` for the driver's prototype
    refresh (:456-462).
    """
    from mft_tpu.methods.dampnet import dampnet_loss, dampnet_scores

    def batch_loss(p, s):
        def one(ep, key):
            flat = flatten_episode(ep)
            feats, new_stats = bb.apply_backbone(p["feature"], s, flat, cfg=bcfg, train=True, update_stats=True)
            z = feats.reshape(spec.n_way, spec.n_per_class, -1)
            scores = dampnet_scores(
                {k: v for k, v in p.items() if k != "feature"}, dstate, z, dcfg, spec.n_query, mode=mode, key=key
            )
            support_bank = jax.lax.stop_gradient(z[:, : spec.n_support].reshape(spec.support_size, -1))
            return dampnet_loss(scores, spec.n_way, spec.n_query), (new_stats, support_bank)

        keys = jax.random.split(rng, episodes.shape[0])
        losses, (new_stats, banks) = jax.vmap(one)(episodes, keys)
        return losses.mean(), (jax.tree.map(lambda a: a.mean(axis=0), new_stats), banks)

    (loss, (new_stats, banks)), grads = jax.value_and_grad(batch_loss, has_aux=True)(params, stats)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {"loss": loss, "support_bank": banks}


# --------------------------------------------------------------------------
# meta fine-tuning stage (FO-MAML)
# --------------------------------------------------------------------------


def _meta_finetune_episode_loss(
    params, stats, episode, key, *, method, bcfg, gcfg, spec, mcfg: MetaFinetuneCfg, schedule=None
):
    support = episode[:, : spec.n_support]
    bank_x = support.reshape((spec.support_size,) + episode.shape[2:])
    bank_y = support_labels(spec)

    trunk_p, block_p = bb.adapt_split(params["feature"])
    trunk_s, block_s = bb.adapt_split(stats)
    icfg = InnerLoopCfg(epochs=mcfg.epochs, batch_size=mcfg.batch_size, bank_size=spec.support_size)

    fast = mcfg.bn_mode == "episode"
    if fast:
        fmap_bank = jax.lax.stop_gradient(bb.apply_trunk(trunk_p, trunk_s, bank_x, cfg=bcfg, train=True))

        def inner_loss(block, idx, w):
            # CE on raw backbone features used as logits (gnnnet.py:168-170)
            feats = bb.apply_final_block(block, block_s, fmap_bank[idx], cfg=bcfg, train=True, sample_mask=w)
            return ce_loss(feats, bank_y[idx], w)

        adapted_block = inner_fit(
            inner_loss, jax.lax.stop_gradient(block_p), opt.torch_adam(mcfg.lr), key, icfg, schedule=schedule
        )
        # documented deviation: the fast path's precomputed trunk bank means
        # running stats do NOT ride the inner minibatches (README)
        stats_inner = stats
    else:

        def inner_loss(block, s, idx, w):
            # CE on raw backbone features used as logits (gnnnet.py:168-170);
            # every inner minibatch also updates the running stats, exactly
            # like the reference's train-mode feat_network forwards whose
            # stats load_state_dict later persists (gnnnet.py:158-187)
            full = bb.adapt_merge(jax.lax.stop_gradient(trunk_p), block)
            feats, new_s = bb.apply_backbone(
                full, s, bank_x[idx], cfg=bcfg, train=True, sample_mask=w, update_stats=True
            )
            return ce_loss(feats, bank_y[idx], w), new_s

        adapted_block, stats_inner = inner_fit_carry(
            inner_loss, jax.lax.stop_gradient(block_p), stats, opt.torch_adam(mcfg.lr), key, icfg,
            schedule=schedule,
        )
    block_for_outer = fo_maml_reattach(block_p, adapted_block)
    full = bb.adapt_merge(trunk_p, block_for_outer)

    # the reference embeds support and query in SEPARATE forward passes after
    # adaptation (gnnnet.py:193-197, protonet.py:154-156) — train-mode BN
    # therefore normalizes each with its OWN batch statistics, unlike the
    # plain episodic path's single whole-episode pass (meta_template.py:33-47)
    flat_q = episode[:, spec.n_support :].reshape((spec.query_size,) + episode.shape[2:])
    feats_s, stats_s = bb.apply_backbone(full, stats_inner, bank_x, cfg=bcfg, train=True, update_stats=True)
    feats_q, new_stats = bb.apply_backbone(full, stats_s, flat_q, cfg=bcfg, train=True, update_stats=True)
    z = jnp.concatenate(
        [feats_s.reshape(spec.n_way, spec.n_support, -1), feats_q.reshape(spec.n_way, spec.n_query, -1)], axis=1
    )
    if method == "protonet":
        scores = proto_scores(z[:, : spec.n_support], z[:, spec.n_support :], spec)
        return protonet_loss(scores, spec), new_stats
    scores = gnn_scores({"fc": params["fc"], "gnn": params["gnn"]}, z, gcfg, spec.n_query)
    return gnnnet_loss(scores, spec.n_way, spec.n_query), new_stats


@functools.partial(
    jax.jit, static_argnames=("method", "bcfg", "gcfg", "spec", "mcfg", "tx"), donate_argnums=(0, 1, 2)
)
def meta_finetune_train_step(params, stats, opt_state, episodes, rng, *, method, bcfg, gcfg, spec, mcfg, tx,
                             schedule=None):
    """The --fine_tune stage step over an episode batch [E, ...].

    ``schedule``: optional recorded inner-minibatch schedule (shared by every
    episode in the batch) — replay instrument for the reference train-loop
    trajectory golden (tests/test_trainloop_golden.py)."""

    def batch_loss(p, s):
        keys = jax.random.split(rng, episodes.shape[0])
        losses, new_stats = jax.vmap(
            lambda ep, k: _meta_finetune_episode_loss(
                p, s, ep, k, method=method, bcfg=bcfg, gcfg=gcfg, spec=spec, mcfg=mcfg, schedule=schedule
            )
        )(episodes, keys)
        return losses.mean(), jax.tree.map(lambda a: a.mean(axis=0), new_stats)

    (loss, new_stats), grads = jax.value_and_grad(batch_loss, has_aux=True)(params, stats)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {"loss": loss}
