"""Learning-dynamics regression tests: the episodic losses are actually
minimizable end-to-end (guards label plumbing / gradient flow — failure
modes shape tests can't see).

Empirical note (validated on TPU): the GNN head needs ~500-750 optimizer
steps to escape its initial chance-level plateau even on trivially
separable features; ProtoNet fits almost immediately.  These tests use
scan-compiled loops so they run in one compile on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.methods import gnnnet as gn
from mft_tpu.methods.protonet import proto_scores, protonet_loss
from mft_tpu.train import optimizers as opt


def _episode_features(key, n_way, slots, dim, sep=2.0, noise=0.3):
    kc, kn = jax.random.split(key)
    centers = jax.random.normal(kc, (n_way, 1, dim)) * sep
    return centers + jax.random.normal(kn, (n_way, slots, dim)) * noise


def test_gnn_head_fits_separable_features():
    cfg = gn.GnnNetCfg(feat_dim=16, n_way=3, n_support=3, proj_dim=32, gnn_nf=16)
    spec = EpisodeSpec(3, 3, 4)
    head = jax.jit(lambda k: gn.init_head(k, cfg))(jax.random.PRNGKey(0))
    tx = opt.torch_adam(2e-3)

    def step(carry, key):
        h, st = carry
        z = _episode_features(key, 3, 7, 16)

        def loss_fn(h):
            return gn.gnnnet_loss(gn.gnn_scores(h, z, cfg, spec.n_query), 3, spec.n_query)

        loss, grads = jax.value_and_grad(loss_fn)(h)
        upd, st = tx.update(grads, st, h)
        return (optax.apply_updates(h, upd), st), loss

    @jax.jit
    def fit(head, key):
        keys = jax.random.split(key, 900)
        (h, _), losses = jax.lax.scan(step, (head, tx.init(head)), keys)
        return h, losses

    head, losses = fit(head, jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert losses[:20].mean() > 0.7  # starts near chance (ln 3 ~ 1.1)
    assert losses[-50:].mean() < 0.35, f"GNN head failed to fit: tail loss {losses[-50:].mean():.3f}"


def test_protonet_fits_separable_features_fast():
    spec = EpisodeSpec(3, 3, 4)

    # ProtoNet has no head params; verify the loss is already low on
    # separable features and that a projector trained through it fits fast
    w0 = jnp.eye(16)
    tx = opt.torch_adam(1e-2)

    def step(carry, key):
        w, st = carry
        # weak separation so the identity projector starts lossy
        z = _episode_features(key, 3, 7, 16, sep=0.25, noise=1.0)

        def loss_fn(w):
            p = jnp.dot(z, w)
            return protonet_loss(proto_scores(p[:, :3], p[:, 3:], spec), spec)

        loss, grads = jax.value_and_grad(loss_fn)(w)
        upd, st = tx.update(grads, st, w)
        return (optax.apply_updates(w, upd), st), loss

    @jax.jit
    def fit(w, key):
        keys = jax.random.split(key, 120)
        (w, _), losses = jax.lax.scan(step, (w, tx.init(w)), keys)
        return losses

    losses = np.asarray(fit(w0, jax.random.PRNGKey(2)))
    assert losses[-20:].mean() < losses[:5].mean(), f"{losses[:5]} -> {losses[-20:].mean()}"
