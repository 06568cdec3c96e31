"""Inner-loop optimization engine — jitted ``lax.scan`` over minibatch steps.

Every adaptation loop in the reference has the same shape (SURVEY.md §2.3,
§2.5): for E epochs, draw a fresh permutation of a fixed support bank, walk
it in minibatches (the last one smaller), and apply an optimizer step to a
subset of parameters:

* meta fine-tune inner loop: 15 epochs x batch 4 over 25 support images,
  Adam(0.01) on the last ResNet block (gnnnet.py:145-177),
* eval transfer fine-tune: ``fine_tune_epoch`` epochs x batch 5 over the
  augmented support bank, Adam(0.01) on block + throwaway head
  (finetune.py:261-299),
* linear probes: 100 epochs x batch 4, reference SGD (meta_template.py:153-186).

Here that shape is one engine: static step count, permutations precomputed
from a key, minibatches gathered from the bank with a validity mask for the
ragged last batch (so shapes stay static), ``optax`` transform applied inside
a ``lax.scan``.  The engine is pure and jittable, so the eval driver can
``vmap`` it across episodes and ``pjit`` it over the device mesh — the
headline >=20x speedup lever identified in SURVEY.md §7.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class InnerLoopCfg(NamedTuple):
    epochs: int
    batch_size: int
    bank_size: int
    #: lax.scan unroll factor: >1 lets XLA software-pipeline consecutive
    #: optimizer steps (the scans are HBM-bound on parameter traffic;
    #: unrolling overlaps the next step's weight loads with the current
    #: step's update math).  Must divide into n_steps cleanly or 1 is used.
    unroll: int = 1

    @property
    def steps_per_epoch(self) -> int:
        return math.ceil(self.bank_size / self.batch_size)

    @property
    def n_steps(self) -> int:
        return self.epochs * self.steps_per_epoch

    @property
    def padded(self) -> int:
        return self.steps_per_epoch * self.batch_size


def minibatch_schedule(key, cfg: InnerLoopCfg):
    """Precompute the gather indices and validity weights for every step.

    Returns ``(idx, w)`` with shapes ``[n_steps, batch_size]``; ``w`` is 0 for
    the padding rows of each epoch's ragged last minibatch.
    """
    keys = jax.random.split(key, cfg.epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, cfg.bank_size))(keys)
    pad = cfg.padded - cfg.bank_size
    if pad:
        perms = jnp.pad(perms, ((0, 0), (0, pad)))  # pad rows get weight 0
    idx = perms.reshape(cfg.epochs, cfg.steps_per_epoch, cfg.batch_size)
    idx = idx.reshape(cfg.n_steps, cfg.batch_size)
    pos = jnp.arange(cfg.padded).reshape(cfg.steps_per_epoch, cfg.batch_size)
    w_epoch = (pos < cfg.bank_size).astype(jnp.float32)
    w = jnp.tile(w_epoch, (cfg.epochs, 1))
    return idx, w


def schedule_from_perms(perms, cfg: InnerLoopCfg):
    """(idx, w) for :func:`inner_fit` from EXPLICIT per-epoch permutations
    ``[epochs, bank_size]`` — lets the golden parity tests replay the torch
    reference's recorded ``np.random.permutation`` minibatch order
    (finetune.py:140,272) through the scan engine."""
    perms = jnp.asarray(perms)
    assert perms.shape == (cfg.epochs, cfg.bank_size)
    pad = cfg.padded - cfg.bank_size
    if pad:
        perms = jnp.pad(perms, ((0, 0), (0, pad)))  # pad rows get weight 0
    idx = perms.reshape(cfg.n_steps, cfg.batch_size)
    pos = jnp.arange(cfg.padded).reshape(cfg.steps_per_epoch, cfg.batch_size)
    w = jnp.tile((pos < cfg.bank_size).astype(jnp.float32), (cfg.epochs, 1))
    return idx, w


def inner_fit(
    loss_fn: Callable,
    params,
    tx: optax.GradientTransformation,
    key,
    cfg: InnerLoopCfg,
    *aux,
    schedule=None,
):
    """Run the adaptation loop and return the adapted parameters.

    ``loss_fn(params, idx, weights, *aux) -> scalar`` computes the masked
    minibatch loss; it owns the bank and gathers rows by ``idx`` itself (this
    lets callers gather images, precomputed features, or both).

    ``schedule``: optional explicit ``(idx, w)`` (see
    :func:`schedule_from_perms`) overriding the key-derived permutations.
    """
    if cfg.epochs == 0:
        # degenerate schedule: no adaptation.  Returning early also avoids a
        # zero-length scan whose dead subgraph has been observed to perturb
        # the SPMD partitioner (XLA CPU) — see tests/test_parallel.py.
        return params
    idx_all, w_all = schedule if schedule is not None else minibatch_schedule(key, cfg)
    opt_state = tx.init(params)
    grad_fn = jax.grad(loss_fn)

    def step(carry, sched):
        p, s = carry
        idx, w = sched
        grads = grad_fn(p, idx, w, *aux)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), None

    unroll = cfg.unroll if cfg.unroll > 1 and cfg.n_steps % cfg.unroll == 0 else 1
    (params, _), _ = jax.lax.scan(step, (params, opt_state), (idx_all, w_all), unroll=unroll)
    return params


def inner_fit_pair(
    loss_a: Callable,
    params_a,
    tx_a: optax.GradientTransformation,
    key_a,
    cfg_a: InnerLoopCfg,
    loss_b: Callable,
    params_b,
    tx_b: optax.GradientTransformation,
    key_b,
    cfg_b: InnerLoopCfg,
):
    """Two INDEPENDENT adaptation loops in one ``lax.scan`` (+ a tail scan
    for the longer one) — ensemble-member lane fusion.

    Numerically identical to ``inner_fit`` on each loop separately (same
    key-derived schedules; splitting a scan at a step boundary is exact):
    the ensemble's linear member (100 steps) and GNN member (500 steps)
    adapt same-shaped final blocks back to back on the sequential path, so
    their first 100 steps can share scan iterations — the two members'
    parameter/optimizer streams ride the same HBM round trips, and the
    fused eval runs 500 scan iterations instead of 600.  Whether that wins
    depends on how far below the bandwidth bound the per-step traffic sits;
    see docs/PERF.md for the measured verdict.
    """
    if cfg_a.epochs == 0 or cfg_b.epochs == 0:
        return (
            inner_fit(loss_a, params_a, tx_a, key_a, cfg_a),
            inner_fit(loss_b, params_b, tx_b, key_b, cfg_b),
        )
    ia, wa = minibatch_schedule(key_a, cfg_a)
    ib, wb = minibatch_schedule(key_b, cfg_b)
    na, nb, ns = cfg_a.n_steps, cfg_b.n_steps, min(cfg_a.n_steps, cfg_b.n_steps)
    ga, gb = jax.grad(loss_a), jax.grad(loss_b)

    def step_a(carry, sched):
        p, s = carry
        idx, w = sched
        updates, s = tx_a.update(ga(p, idx, w), s, p)
        return (optax.apply_updates(p, updates), s), None

    def step_b(carry, sched):
        p, s = carry
        idx, w = sched
        updates, s = tx_b.update(gb(p, idx, w), s, p)
        return (optax.apply_updates(p, updates), s), None

    def fused(carry, sched):
        ca, cb = carry
        xa, xb = sched
        ca, _ = step_a(ca, xa)
        cb, _ = step_b(cb, xb)
        return (ca, cb), None

    def _unroll(cfg, length):
        # same software-pipelining rule as inner_fit, per scan segment
        return cfg.unroll if cfg.unroll > 1 and length % cfg.unroll == 0 else 1

    init = ((params_a, tx_a.init(params_a)), (params_b, tx_b.init(params_b)))
    xs = ((ia[:ns], wa[:ns]), (ib[:ns], wb[:ns]))
    (ca, cb), _ = jax.lax.scan(fused, init, xs, unroll=min(_unroll(cfg_a, ns), _unroll(cfg_b, ns)))
    if na > ns:
        ca, _ = jax.lax.scan(step_a, ca, (ia[ns:], wa[ns:]), unroll=_unroll(cfg_a, na - ns))
    if nb > ns:
        cb, _ = jax.lax.scan(step_b, cb, (ib[ns:], wb[ns:]), unroll=_unroll(cfg_b, nb - ns))
    return ca[0], cb[0]


def inner_fit_carry(
    loss_fn: Callable,
    params,
    carry,
    tx: optax.GradientTransformation,
    key,
    cfg: InnerLoopCfg,
    schedule=None,
):
    """:func:`inner_fit` with an auxiliary non-optimized carry threaded
    through the steps (gradients stopped each step).

    ``loss_fn(params, carry, idx, weights) -> (scalar, new_carry)``.  Used to
    reproduce the reference's BN running-statistic TRAJECTORY through the
    meta fine-tune inner loop: every train-mode inner minibatch updates the
    adapted copy's running stats, and ``load_state_dict`` persists them into
    the meta model before the outer embedding passes (gnnnet.py:158-187) —
    so here the full stats tree rides the scan carry.  Returns
    ``(adapted_params, final_carry)``.
    """
    if cfg.epochs == 0:
        return params, carry
    idx_all, w_all = schedule if schedule is not None else minibatch_schedule(key, cfg)
    opt_state = tx.init(params)
    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(state, sched):
        p, c, s = state
        idx, w = sched
        grads, new_c = grad_fn(p, c, idx, w)
        updates, s = tx.update(grads, s, p)
        return (optax.apply_updates(p, updates), jax.lax.stop_gradient(new_c), s), None

    unroll = cfg.unroll if cfg.unroll > 1 and cfg.n_steps % cfg.unroll == 0 else 1
    (params, carry, _), _ = jax.lax.scan(step, (params, carry, opt_state), (idx_all, w_all), unroll=unroll)
    return params, carry


def inner_fit_epochwise(
    loss_fn: Callable,
    params,
    tx: optax.GradientTransformation,
    key,
    cfg: InnerLoopCfg,
    banks,
):
    """:func:`inner_fit` with the gather hoisted out of the hot loop.

    Numerically identical to ``inner_fit`` under the same ``key`` (same
    per-epoch permutations, same rows per step): the bank is permuted ONCE
    per epoch (one large gather) and each scan step slices a contiguous
    minibatch — instead of a 5-row dynamic gather per step.  ``banks`` is a
    pytree of arrays with leading dim ``bank_size``;
    ``loss_fn(params, chunk, w) -> scalar`` receives the pre-gathered
    minibatch slice.
    """
    if cfg.epochs == 0:
        return params
    keys = jax.random.split(key, cfg.epochs)
    perms = jax.vmap(lambda k: jax.random.permutation(k, cfg.bank_size))(keys)
    pad = cfg.padded - cfg.bank_size
    if pad:
        perms = jnp.pad(perms, ((0, 0), (0, pad)))  # pad rows get weight 0
    pos = jnp.arange(cfg.padded).reshape(cfg.steps_per_epoch, cfg.batch_size)
    w_epoch = (pos < cfg.bank_size).astype(jnp.float32)  # [spe, bs]
    starts = jnp.arange(cfg.steps_per_epoch) * cfg.batch_size
    opt_state = tx.init(params)
    grad_fn = jax.grad(loss_fn)
    bs = cfg.batch_size

    def epoch(carry, perm):
        p, s = carry
        bank_e = jax.tree.map(lambda a: a[perm], banks)

        def step(carry, sched):
            p, s = carry
            t0, w = sched
            chunk = jax.tree.map(lambda a: jax.lax.dynamic_slice_in_dim(a, t0, bs), bank_e)
            grads = grad_fn(p, chunk, w)
            updates, s = tx.update(grads, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p, s), _ = jax.lax.scan(step, (p, s), (starts, w_epoch), unroll=max(cfg.unroll, 1))
        return (p, s), None

    (params, _), _ = jax.lax.scan(epoch, (params, opt_state), perms)
    return params


def fo_maml_reattach(meta_params, adapted_params):
    """First-order MAML gradient plumbing.

    Returns a tree numerically equal to ``adapted_params`` whose gradient
    flows to ``meta_params`` with an identity Jacobian — i.e. the outer loss
    is evaluated at the adapted point but its gradient is applied to the
    meta-initialization.  This reproduces the reference's mechanics where the
    outer ``loss.backward()`` runs on the adapted copy loaded into the model
    and ``MAML_update`` later subtracts the inner-loop delta so only the
    outer-gradient step survives on the meta-init
    (gnnnet.py:90-103,183-187; train.py:49-58).
    """
    return jax.tree.map(lambda m, a: m + jax.lax.stop_gradient(a - m), meta_params, adapted_params)
