"""Fused edge kernel: interpret-mode parity with the XLA reference
(compiled-mode parity is exercised on real TPU hardware by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mft_tpu.ops.pallas.edge_mlp import (
    _pick_row_tile,
    edge_abs_diff_matmul,
    edge_abs_diff_matmul_reference,
)


@pytest.mark.parametrize("shape", [(3, 16, 32, 24), (2, 30, 133, 192)])
def test_forward_matches_reference(shape):
    b_, n, f, c = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b_, n, f).astype(np.float32))
    w = jnp.asarray((rs.randn(f, c) * 0.05).astype(np.float32))
    b = jnp.asarray(rs.randn(c).astype(np.float32))
    out = jax.jit(lambda x, w, b: edge_abs_diff_matmul(x, w, b, True))(x, w, b)
    ref = jax.jit(edge_abs_diff_matmul_reference)(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_gradients_match_reference():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 16, 24).astype(np.float32))
    w = jnp.asarray(rs.randn(24, 16).astype(np.float32))
    b = jnp.asarray(rs.randn(16).astype(np.float32))

    def loss(fn):
        return lambda x, w, b: jnp.sum(jnp.sin(fn(x, w, b)))

    g1 = jax.jit(jax.grad(loss(lambda x, w, b: edge_abs_diff_matmul(x, w, b, True)), argnums=(0, 1, 2)))(x, w, b)
    g2 = jax.jit(jax.grad(loss(edge_abs_diff_matmul_reference), argnums=(0, 1, 2)))(x, w, b)
    for a, r in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)


def test_row_tile_selection():
    # whole row axis when it fits
    assert _pick_row_tile(30, 229, 192) == 30
    # 130-node 50-shot graphs need tiling: a multiple of 8
    ti = _pick_row_tile(130, 133, 192)
    assert ti < 130 and ti % 8 == 0


def test_padded_row_axis_case():
    # n not divisible by the tile: exercises the padded path in interpret mode
    import mft_tpu.ops.pallas.edge_mlp as em

    orig = em._VMEM_BUDGET
    em._VMEM_BUDGET = 100_000  # force tiling of a 20-row axis
    try:
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(2, 20, 64).astype(np.float32))
        w = jnp.asarray(rs.randn(64, 32).astype(np.float32))
        b = jnp.asarray(rs.randn(32).astype(np.float32))
        assert em._pick_row_tile(20, 64, 32) % 8 == 0
        out = jax.jit(lambda x, w, b: edge_abs_diff_matmul(x, w, b, True))(x, w, b)
        ref = edge_abs_diff_matmul_reference(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    finally:
        em._VMEM_BUDGET = orig


def test_wcompute_with_pallas_flag_matches():
    from mft_tpu.models import gnn as gm

    cfg = gm.GNNCfg(in_features=32, nf=16, n_way=3)
    p = jax.jit(lambda k: gm.init_gnn(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 12, 32).astype(np.float32))
    a = jax.jit(lambda p, x: gm.apply_gnn(p, x, False))(p, x)
    # interpret-mode pallas path (CPU): route via monkeypatched interpret flag
    import mft_tpu.ops.pallas.edge_mlp as em

    orig = em.edge_abs_diff_matmul

    def interp(x, w, b, interpret=False):
        return orig(x, w, b, True)

    em_dict = gm.apply_wcompute.__globals__
    try:
        em.edge_abs_diff_matmul_patched = True
        import unittest.mock as mock

        with mock.patch.object(em, "edge_abs_diff_matmul", interp):
            b = jax.jit(lambda p, x: gm.apply_gnn(p, x, True))(p, x)
    finally:
        pass
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
