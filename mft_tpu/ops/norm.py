"""Functional batch normalization.

The reference uses three BN flavors (see SURVEY.md §2.2):

1. plain ``nn.BatchNorm2d`` with running stats (backbone trunk),
2. ``track_running_stats=False`` BN which *always* normalizes with batch
   statistics, even in eval mode (the GNN head + projector fc — reference
   methods/gnn.py:41,65-74, methods/gnnnet.py:30),
3. the feature-wise transformation layer which is BN plus sampled per-channel
   affine noise during training (backbone.py:314-350).

All are expressed here as pure functions.  Running statistics are explicit
inputs/outputs.  ``sample_mask`` supports the reference's variable-size last
minibatch inside inner loops (e.g. batches of 4 over a 25-image support set,
finetune.py:142) under fully static shapes: masked rows contribute zero
weight to the batch statistics.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

EPS = 1e-5  # torch default


def _masked_moments(x: jnp.ndarray, reduce_axes, mask: Optional[jnp.ndarray]):
    """Mean/var over ``reduce_axes``; rows weighted by ``mask`` along axis 0.

    Returns (mean, biased_var, count) where count is the number of reduced
    elements (scalar, float).
    """
    if mask is None:
        count = jnp.asarray(float(math.prod(x.shape[a] for a in reduce_axes)), x.dtype)
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)
        return mean, var, count
    # mask: [N] broadcast over the leading axis.
    shape = [1] * x.ndim
    shape[0] = x.shape[0]
    w = mask.reshape(shape).astype(x.dtype)
    per_row = 1.0
    for a in reduce_axes:
        if a != 0:
            per_row *= x.shape[a]
    count = jnp.sum(mask.astype(x.dtype)) * per_row
    mean = jnp.sum(x * w, axis=reduce_axes) / count
    var = jnp.sum(jnp.square(x - mean) * w, axis=reduce_axes) / count
    return mean, var, count


def batch_norm(
    x: jnp.ndarray,
    params: dict,
    stats: Optional[dict] = None,
    *,
    use_batch_stats: bool,
    update_stats: bool = False,
    momentum: float = 0.1,
    sample_mask: Optional[jnp.ndarray] = None,
    eps: float = EPS,
    groups: int = 1,
) -> Tuple[jnp.ndarray, Optional[dict]]:
    """Normalize over all axes but the last (channel) axis.

    Works for both the 2d case (``[N, H, W, C]``) and the 1d case
    (``[N, C]``).  Returns ``(y, new_stats)``; ``new_stats`` is ``stats``
    unchanged unless ``use_batch_stats and update_stats``.

    torch semantics reproduced:
      * normalization uses the biased variance of the batch,
      * the running-var update uses the *unbiased* batch variance
        with torch momentum convention ``new = (1-m)*old + m*batch``.

    ``groups``: batch-stats statistics computed independently per contiguous
    group of ``N/groups`` leading rows — numerically equal to running the
    groups through separate calls, but one kernel.  Lets the eval engine
    batch the replica-group trunk fan-out (each replica group keeps its own
    whole-bank BN statistics, reference finetune.py:225-233 semantics)
    without one trunk pass per group.
    """
    in_dtype = x.dtype
    # statistics in >=f32 (bf16-safe); f64 inputs keep f64 (x64 golden tests)
    x = x.astype(jnp.promote_types(in_dtype, jnp.float32))
    if groups > 1:
        assert use_batch_stats and not update_stats and sample_mask is None, (
            "grouped BN supports the batch-stats, no-update, unmasked path only"
        )
        assert x.shape[0] % groups == 0, (x.shape, groups)
        xg = x.reshape((groups, x.shape[0] // groups) + x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=red, keepdims=True)
        inv = jnp.asarray(1.0, x.dtype) / jnp.sqrt(var + eps)
        y = (xg - mean) * (inv * params["scale"].astype(x.dtype)) + params["bias"].astype(x.dtype)
        return y.reshape(x.shape).astype(in_dtype), stats
    reduce_axes = tuple(range(x.ndim - 1))
    if use_batch_stats:
        mean, var, count = _masked_moments(x, reduce_axes, sample_mask)
        new_stats = stats
        if update_stats and stats is not None:
            unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
            new_stats = {
                "mean": (1.0 - momentum) * stats["mean"] + momentum * mean,
                "var": (1.0 - momentum) * stats["var"] + momentum * unbiased,
            }
    else:
        assert stats is not None, "eval-mode BN requires running stats"
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jnp.asarray(1.0, x.dtype) / jnp.sqrt(var + eps)
    y = (x - mean) * (inv * params["scale"].astype(x.dtype)) + params["bias"].astype(x.dtype)
    return y.astype(in_dtype), new_stats


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """``F.softplus(x, beta=100)`` (reference backbone.py:154-155)."""
    # softplus(x, beta) = log(1 + exp(beta x)) / beta, linear for beta*x > 20.
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(bx, 20.0))) / 100.0)
