"""Inner-loop engine: schedule semantics, convergence, FO-MAML plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.train import optimizers as opt
from mft_tpu.train.inner_loop import InnerLoopCfg, fo_maml_reattach, inner_fit, minibatch_schedule


def test_minibatch_schedule_reference_geometry():
    # the reference probe: bank 25, batch 4 -> 7 steps/epoch, last batch has 1
    cfg = InnerLoopCfg(epochs=3, batch_size=4, bank_size=25)
    assert cfg.steps_per_epoch == 7 and cfg.n_steps == 21
    idx, w = jax.jit(lambda k: minibatch_schedule(k, cfg))(jax.random.PRNGKey(0))
    assert idx.shape == (21, 4) and w.shape == (21, 4)
    idx, w = np.asarray(idx), np.asarray(w)
    for e in range(3):
        rows = idx[e * 7 : (e + 1) * 7]
        valid = rows.reshape(-1)[np.asarray(w[e * 7 : (e + 1) * 7]).reshape(-1) > 0]
        assert sorted(valid.tolist()) == list(range(25))  # a permutation per epoch
    # last step of each epoch: one valid element
    np.testing.assert_array_equal(w[6], [1, 0, 0, 0])
    np.testing.assert_array_equal(w[5], [1, 1, 1, 1])


def test_inner_fit_learns_linear_classifier():
    rs = np.random.RandomState(0)
    centers = rs.randn(3, 8) * 3.0
    xs = np.concatenate([centers[i] + 0.1 * rs.randn(10, 8) for i in range(3)]).astype(np.float32)
    ys = np.repeat(np.arange(3), 10)
    bank_x, bank_y = jnp.asarray(xs), jnp.asarray(ys)

    import optax

    def loss_fn(p, idx, w):
        logits = bank_x[idx] @ p["w"] + p["b"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, bank_y[idx])
        return jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)

    p0 = {"w": jnp.zeros((8, 3)), "b": jnp.zeros(3)}
    cfg = InnerLoopCfg(epochs=30, batch_size=4, bank_size=30)
    fit = jax.jit(lambda p, k: inner_fit(loss_fn, p, opt.reference_probe_sgd(0.1), k, cfg))
    p = fit(p0, jax.random.PRNGKey(1))
    acc = np.mean(np.argmax(np.asarray(bank_x @ p["w"] + p["b"]), 1) == ys)
    assert acc > 0.95


def test_inner_fit_deterministic_given_key():
    bank_x = jnp.asarray(np.random.RandomState(2).randn(10, 4).astype(np.float32))
    bank_y = jnp.asarray(np.arange(10) % 2)

    import optax

    def loss_fn(p, idx, w):
        logits = bank_x[idx] @ p["w"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, bank_y[idx])
        return jnp.sum(ce * w) / jnp.maximum(w.sum(), 1.0)

    cfg = InnerLoopCfg(epochs=2, batch_size=3, bank_size=10)
    fit = jax.jit(lambda p, k: inner_fit(loss_fn, p, opt.torch_adam(0.01), k, cfg))
    p0 = {"w": jnp.ones((4, 2))}
    a = fit(p0, jax.random.PRNGKey(3))
    b = fit(p0, jax.random.PRNGKey(3))
    c = fit(p0, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))
    assert not np.array_equal(np.asarray(a["w"]), np.asarray(c["w"]))


def test_fo_maml_reattach_value_and_gradient():
    meta = {"w": jnp.asarray([1.0, 2.0])}
    adapted = {"w": jnp.asarray([5.0, -1.0])}

    def outer(m):
        r = fo_maml_reattach(m, adapted)
        return jnp.sum(r["w"] ** 2)

    val, grads = jax.jit(jax.value_and_grad(outer))(meta)
    # value computed at the adapted point
    np.testing.assert_allclose(float(val), 26.0)
    # gradient = d/dx sum(x^2) at adapted point, identity-jacobian to meta
    np.testing.assert_allclose(np.asarray(grads["w"]), [10.0, -2.0])
