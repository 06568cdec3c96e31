"""Episodic graph neural network head (functional, TPU-native).

Capability parity with the reference GNN (methods/gnn.py: ``gmul``, ``Gconv``,
``Wcompute``, ``GNN_nl``; itself derived from Garcia & Bruna's few-shot GNN):

* learned adjacency: pairwise ``|x_i - x_j|`` -> 4x (1x1 conv + BN + leaky
  ReLU) -> 1x1 conv to one logit per edge -> row softmax with the diagonal
  masked by -1e8 -> stacked with the identity operator (J=2)
  (reference methods/gnn.py:58-132),
* graph conv: operator product then Linear(J*F -> F_out) + BN
  (reference methods/gnn.py:16-56),
* 2 hidden layers with dense feature concatenation, then a final
  adjacency + BN-free graph conv to ``n_way`` logits
  (reference methods/gnn.py:134-166).

TPU-first design notes:

* Every 1x1 conv over the ``[B, N, N, C]`` edge tensor is expressed as a
  matmul on the channel axis — on TPU this maps straight onto the MXU with
  the N*N edge grid as the batch rows; no im2col, no layout shuffles.
* All BNs are the reference's ``track_running_stats=False`` flavor: batch
  statistics always (even at eval), so they are pure functions with no state.
* The whole head is shape-static; the node count ``N = n_way*(n_support+1)``
  is small (<=130 even at 50-shot, reference gnnnet_copy.py:74) so graphs for
  all queries are batched through one program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mft_tpu.ops.convpool import leaky_relu, linear
from mft_tpu.ops.initializers import bn_params, torch_conv1x1, torch_linear
from mft_tpu.ops.norm import batch_norm


class GNNCfg(NamedTuple):
    """Static GNN_nl geometry (reference methods/gnn.py:134-152)."""

    in_features: int  # node feature size (proj_dim + n_way one-hot)
    nf: int  # adjacency-MLP width unit (96 in all shipped configs)
    n_way: int
    num_layers: int = 2
    ratio: tuple = (2, 2, 1, 1)


# --------------------------------------------------------------------------
# Wcompute: learned adjacency
# --------------------------------------------------------------------------


def init_wcompute(key, cin: int, nf: int, ratio=(2, 2, 1, 1), dtype=jnp.float32):
    widths = [int(nf * r) for r in ratio]
    ks = jax.random.split(key, 5)
    p = {}
    c = cin
    for i, w in enumerate(widths, start=1):
        p[f"conv{i}"] = torch_conv1x1(ks[i - 1], c, w, dtype)
        p[f"bn{i}"] = bn_params(w, dtype)
        c = w
    p["conv_last"] = torch_conv1x1(ks[4], c, 1, dtype)
    return p


def apply_wcompute(p, x: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """x: [B, N, F] -> operator stack W: [B, N, N, 2] = (identity, softmax adj).

    Fuses the reference's edge pipeline (methods/gnn.py:78-132) into channel
    matmuls over the [B, N, N, C] tensor.  ``use_pallas`` routes the
    edge-construction + first conv through the fused TPU kernel
    (ops/pallas/edge_mlp.py) so the [B, N, N, F] edge tensor never hits HBM.
    """
    if use_pallas:
        from mft_tpu.ops.pallas.edge_mlp import edge_abs_diff_matmul

        # the kernel runs in f32 (Mosaic's bf16 path for this edge reshape is
        # unsupported on this toolchain; the head is tiny so f32 is free)
        h = edge_abs_diff_matmul(x.astype(jnp.float32), p["conv1"]["w"], p["conv1"]["b"])
    else:
        h = jnp.abs(x[:, :, None, :] - x[:, None, :, :])  # [B, N, N, F]
        h = linear(h, p["conv1"])
    h, _ = batch_norm(h, p["bn1"], None, use_batch_stats=True)
    h = leaky_relu(h)
    for i in range(2, 5):
        h = linear(h, p[f"conv{i}"])
        h, _ = batch_norm(h, p[f"bn{i}"], None, use_batch_stats=True)
        h = leaky_relu(h)
    w = linear(h, p["conv_last"])[..., 0]  # [B, N, N]

    n = x.shape[1]
    eye = jnp.eye(n, dtype=x.dtype)
    w = w - eye * 1e8  # mask self-edges (reference gnn.py:106)
    w = jax.nn.softmax(w, axis=2)  # normalize over neighbors j
    return jnp.stack([jnp.broadcast_to(eye, w.shape), w], axis=-1)


# --------------------------------------------------------------------------
# Gconv: operator product + linear (+ BN)
# --------------------------------------------------------------------------


def init_gconv(key, cin: int, cout: int, j: int = 2, bn: bool = True, dtype=jnp.float32):
    p = {"fc": torch_linear(key, j * cin, cout, dtype)}
    if bn:
        p["bn"] = bn_params(cout, dtype)
    return p


def apply_gconv(p, w_ops: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """``gmul`` + linear + optional BN (reference methods/gnn.py:16-56).

    w_ops: [B, N, N, J]; x: [B, N, F] -> [B, N, F_out].
    With J=2 and the identity first, the operator product is
    ``concat([x, adj @ x], -1)``.
    """
    # einsum maps to batched MXU matmuls: [B,N,N] @ [B,N,F] per operator.
    prod = jnp.einsum(
        "bijk,bjf->bikf", w_ops, x, preferred_element_type=jnp.promote_types(x.dtype, jnp.float32)
    ).astype(x.dtype)
    # -> [B, N, J, F]; torch's split/cat ordering = concat over J on the last axis
    b, n, j, f = prod.shape
    h = prod.reshape(b, n, j * f)
    h = linear(h, p["fc"])
    if "bn" in p:
        # BatchNorm1d over the flattened (B*N) rows (reference gnn.py:50-54)
        h, _ = batch_norm(h.reshape(b * n, -1), p["bn"], None, use_batch_stats=True)
        h = h.reshape(b, n, -1)
    return h


# --------------------------------------------------------------------------
# GNN_nl
# --------------------------------------------------------------------------


def init_gnn(key, cfg: GNNCfg, dtype=jnp.float32):
    ks = jax.random.split(key, 2 * cfg.num_layers + 2)
    p = {"layers": []}
    c = cfg.in_features
    half = cfg.nf // 2
    for i in range(cfg.num_layers):
        p["layers"].append(
            {
                "w": init_wcompute(ks[2 * i], c, cfg.nf, cfg.ratio, dtype),
                "l": init_gconv(ks[2 * i + 1], c, half, 2, True, dtype),
            }
        )
        c += half  # dense concatenation
    p["w_last"] = init_wcompute(ks[-2], c, cfg.nf, cfg.ratio, dtype)
    p["l_last"] = init_gconv(ks[-1], c, cfg.n_way, 2, False, dtype)
    return p


def apply_gnn(p, nodes: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """nodes: [B, N, in_features] -> logits [B, N, n_way]
    (reference methods/gnn.py:154-166)."""
    x = nodes
    for layer in p["layers"]:
        w_ops = apply_wcompute(layer["w"], x, use_pallas)
        x_new = leaky_relu(apply_gconv(layer["l"], w_ops, x))
        x = jnp.concatenate([x, x_new], axis=2)
    w_ops = apply_wcompute(p["w_last"], x, use_pallas)
    return apply_gconv(p["l_last"], w_ops, x)
