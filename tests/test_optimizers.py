"""torch-exact optimizer semantics vs hand-computed recursions."""

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.train import optimizers as opt


def _run(tx, grads_seq, p0):
    p = {"w": jnp.asarray(p0)}
    state = tx.init(p)
    out = []
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, p)
        p = jax.tree.map(lambda a, u: a + u, p, updates)
        out.append(np.asarray(p["w"]).copy())
    return out


def test_torch_adam_with_l2_decay():
    lr, wd, b1, b2, eps = 0.01, 0.001, 0.9, 0.999, 1e-8
    p = np.array([1.0, -2.0], np.float64)
    grads = [np.array([0.5, -1.0]), np.array([-0.25, 0.75]), np.array([0.1, 0.1])]
    m = np.zeros(2)
    v = np.zeros(2)
    expected = []
    pt = p.copy()
    for t, g in enumerate(grads, start=1):
        g = g + wd * pt
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        pt = pt - lr * mh / (np.sqrt(vh) + eps)
        expected.append(pt.copy())
    ours = _run(opt.torch_adam(lr, wd), grads, p.astype(np.float32))
    for a, b in zip(ours, expected):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_torch_sgd_momentum_dampening_first_step():
    lr, mu, damp, wd = 0.01, 0.9, 0.9, 0.001
    p = np.array([1.0, -1.0], np.float64)
    grads = [np.array([1.0, 2.0]), np.array([0.5, -0.5]), np.array([1.0, 1.0])]
    buf = None
    pt = p.copy()
    expected = []
    for g in grads:
        g = g + wd * pt
        buf = g.copy() if buf is None else mu * buf + (1 - damp) * g
        pt = pt - lr * buf
        expected.append(pt.copy())
    ours = _run(opt.reference_probe_sgd(lr), grads, p.astype(np.float32))
    for a, b in zip(ours, expected):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_torch_adam_lowmem_tracks_f32_adam():
    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    grads = [rs.randn(16).astype(np.float32) * 0.1 for _ in range(6)]
    p0 = rs.randn(16).astype(np.float32)
    ref = _run(opt.torch_adam(0.01, 0.001), grads, p0)
    low = _run(opt.torch_adam_lowmem(0.01, 0.001), grads, p0)
    # bf16 moment storage: trajectories agree to bf16 resolution
    for a, b in zip(ref, low):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-4)
    # the state really is stored in bfloat16
    tx = opt.torch_adam_lowmem(0.01)
    st = tx.init({"w": jnp.ones(4)})
    assert st["mu"]["w"].dtype == jnp.bfloat16 and st["nu"]["w"].dtype == jnp.bfloat16


def test_grouped_transforms_apply_per_subtree():
    tx = opt.grouped(
        {"a": opt.torch_sgd(1.0), "b": opt.torch_sgd(0.0)},
        {"a": "a", "b": "b"},
    )
    p = {"a": jnp.ones(2), "b": jnp.ones(2)}
    state = tx.init(p)
    updates, _ = tx.update({"a": jnp.ones(2), "b": jnp.ones(2)}, state, p)
    np.testing.assert_allclose(np.asarray(updates["a"]), -1.0)
    np.testing.assert_allclose(np.asarray(updates["b"]), 0.0)
