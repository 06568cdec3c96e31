"""Pallas TPU kernel: fused GNN edge-feature construction + first 1x1 conv.

The reference adjacency network materializes the pairwise edge tensor
``|x_i - x_j|`` of shape [B, N, N, F] before its 1x1-conv stack
(methods/gnn.py:79-84).  Under XLA that tensor round-trips HBM between the
abs-diff and the first matmul; for the flagship episode geometry
(B=n_query=15, N=30, F=229 at layer 2) that is ~2x12 MB of avoidable HBM
traffic per Wcompute call, and ~16x more at 50-shot (N=130 node graphs,
gnnnet_copy.py:74).

The kernel keeps edge tiles in VMEM: grid = (graphs, row-tiles); each step
builds ``e = |x[rows, None, :] - x[None, :, :]|`` on the VPU for a tile of
``row_tile`` source nodes, reshapes to [row_tile*N, F], and runs one MXU
matmul with the first conv's weight — only the [N, N, C1] activations are
ever written to HBM.  ``row_tile`` is the largest divisor of N that fits the
VMEM budget, so the same kernel serves 30-node and 130-node graphs.

The backward pass is plain XLA (it runs only under meta-training gradients,
where the reference-shaped einsums are already fine); an ``interpret`` flag
enables CPU-backed tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 4 * 1024 * 1024  # conservative per-step working set


def _pick_row_tile(n: int, f: int, c: int) -> int:
    """Largest row tile fitting the VMEM budget: the whole row axis when it
    fits (no padding), else a multiple of 8 (Mosaic sublane constraint)."""

    def working(ti):
        return ti * n * (f + c) * 4 + n * f * 4 + f * c * 4

    if working(n) <= _VMEM_BUDGET:
        return n
    ti = max(8, (_VMEM_BUDGET - n * f * 4 - f * c * 4) // (n * (f + c) * 4) // 8 * 8)
    return min(ti, n)


def _fwd_kernel(rows_ref, x_ref, w_ref, b_ref, out_ref):
    """rows [1, TI, F] (this tile's source nodes), x [1, N, F] (all nodes),
    w [F, C], b [1, C] -> out tile [1, TI*N, C]."""
    x = x_ref[0]
    rows = rows_ref[0]
    n, f = x.shape
    ti = rows.shape[0]
    e = jnp.abs(rows[:, None, :] - x[None, :, :]).reshape(ti * n, f)
    acc = jnp.dot(e, w_ref[:].astype(e.dtype), preferred_element_type=jnp.float32)
    out_ref[0] = (acc + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def edge_abs_diff_matmul(x, w, b, interpret=False):
    """``|x[:, :, None, :] - x[:, None, :, :]| @ w + b`` without HBM edges.

    x: [B, N, F]; w: [F, C]; b: [C] -> [B, N, N, C].
    """
    bsz, n, f = x.shape
    c = w.shape[1]
    ti = _pick_row_tile(n, f, c)
    n_tiles = -(-n // ti)
    n_pad = n_tiles * ti
    x_rows = x if n_pad == n else jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ti, f), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ti * n, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_pad * n, c), x.dtype),
        interpret=interpret,
    )(x_rows, x, w, b.reshape(1, c))
    # padded source rows land contiguously at the tail of the row-major
    # (i, j) flattening; drop them
    return out[:, : n * n].reshape(bsz, n, n, c)


def _edge_fwd(x, w, b, interpret):
    return edge_abs_diff_matmul(x, w, b, interpret), (x, w)


def _edge_bwd(interpret, res, g):
    x, w = res
    # d = x_i - x_j; e = |d|; de = sign(d)
    d = x[:, :, None, :] - x[:, None, :, :]
    s = jnp.sign(d)
    gw = jnp.einsum("bijc,fc->bijf", g, w, preferred_element_type=jnp.float32)
    dx = (jnp.sum(s * gw, axis=2) - jnp.sum(s * gw, axis=1)).astype(x.dtype)
    dw = jnp.einsum("bijf,bijc->fc", jnp.abs(d), g, preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(g, axis=(0, 1, 2)).astype(w.dtype)
    return dx, dw, db


edge_abs_diff_matmul.defvjp(_edge_fwd, _edge_bwd)


def edge_abs_diff_matmul_reference(x, w, b):
    """Plain-XLA reference implementation (and CPU fallback)."""
    e = jnp.abs(x[:, :, None, :] - x[:, None, :, :])
    return jnp.dot(e, w, preferred_element_type=jnp.float32).astype(x.dtype) + b.astype(x.dtype)
