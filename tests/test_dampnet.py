"""DampNet recovery-network semantics on tiny shapes."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.methods import dampnet as dn


CFG = dn.DampNetCfg(feat_dim=32, n_way=3, n_support=2, ntn_dim=8, mlp_hidden=16)


@functools.lru_cache(maxsize=None)
def _model():
    return jax.jit(lambda k: dn.init_dampnet(k, CFG))(jax.random.PRNGKey(0))


def _feats(n_query=2, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(3, 2 + n_query, 32).astype(np.float32))


def test_bilinear_matches_manual():
    w = jnp.asarray(np.random.RandomState(1).randn(4, 5, 5).astype(np.float32))
    a = jnp.asarray(np.random.RandomState(2).randn(5).astype(np.float32))
    b = jnp.asarray(np.random.RandomState(3).randn(5).astype(np.float32))
    out = dn.bilinear(w, a, b)
    ref = np.array([a @ np.asarray(w)[k] @ b for k in range(4)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_class_vs_support_stats():
    feats = _feats()
    m_c, s_c = dn.episode_stats(feats, CFG)
    m_s, s_s = dn.episode_stats(feats, CFG._replace(stat="support"))
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_s), rtol=1e-5)
    assert not np.allclose(np.asarray(s_c), np.asarray(s_s))
    # class stat = std over per-class support means, unbiased (torch default)
    sup = np.asarray(feats)[:, :2]
    ref = sup.mean(axis=1).std(axis=0, ddof=1)
    np.testing.assert_allclose(np.asarray(s_c), ref, rtol=1e-4, atol=1e-5)


def test_update_prototypes():
    bank = np.random.RandomState(4).randn(50, 32).astype(np.float32)
    st = dn.update_prototypes({"initialized": jnp.zeros((), jnp.bool_)}, jnp.asarray(bank))
    np.testing.assert_allclose(np.asarray(st["proto_mean"]), bank.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st["proto_std"]), bank.std(0, ddof=1), rtol=1e-4, atol=1e-5)
    assert bool(st["initialized"])


def test_all_modes_produce_scores():
    params, state = _model()
    state = dn.update_prototypes(state, jnp.asarray(np.random.RandomState(5).randn(40, 32).astype(np.float32)))
    feats = _feats()
    for mode in ["plain", "recover", "domain_shift"]:
        s = jax.jit(lambda p, st, f: dn.dampnet_scores(p, st, f, CFG, 2, mode=mode))(params, state, feats)
        assert s.shape == (6, 3)
        assert np.isfinite(np.asarray(s)).all()
    s = jax.jit(lambda p, st, f, k: dn.dampnet_scores(p, st, f, CFG, 2, mode="corrupt", key=k))(
        params, state, feats, jax.random.PRNGKey(1)
    )
    assert s.shape == (6, 3) and np.isfinite(np.asarray(s)).all()
    s = jax.jit(
        lambda p, st, f: dn.dampnet_scores(
            p, st, f, CFG, 2, mode="unsup", unsup_stats=(jnp.ones(32), jnp.ones(32))
        )
    )(params, state, feats)
    assert s.shape == (6, 3)


def test_corrupt_mode_freezes_head_gradients():
    params, state = _model()
    state = dn.update_prototypes(state, jnp.asarray(np.random.RandomState(6).randn(40, 32).astype(np.float32)))
    feats = _feats()

    def loss(p, mode):
        kw = {"key": jax.random.PRNGKey(2)} if mode == "corrupt" else {}
        s = dn.dampnet_scores(p, state, feats, CFG, 2, mode=mode, **kw)
        return dn.dampnet_loss(s, 3, 2)

    g_corrupt = jax.jit(jax.grad(lambda p: loss(p, "corrupt")))(params)
    g_recover = jax.jit(jax.grad(lambda p: loss(p, "recover")))(params)
    # corrupt step: fc/gnn frozen, recovery nets train (dampnet_full.py:187-189)
    assert float(jnp.abs(g_corrupt["fc"]["linear"]["w"]).max()) == 0.0
    assert float(jnp.abs(g_corrupt["layer1"]["w"]).max()) > 0.0
    # recover step: fc/gnn train too
    assert float(jnp.abs(g_recover["fc"]["linear"]["w"]).max()) > 0.0


def test_training_mode_schedule():
    assert dn.training_mode(0, False) == "plain"
    # call_count starts at 150 (even) -> first initialized step recovers? no:
    # 150 % 2 == 0 -> 'recover'; next 'corrupt'
    assert dn.training_mode(0, True) == "recover"
    assert dn.training_mode(1, True) == "corrupt"


def test_recovered_projection_shape():
    params, state = _model()
    state = dn.update_prototypes(state, jnp.asarray(np.random.RandomState(7).randn(40, 32).astype(np.float32)))
    out = jax.jit(lambda p, s, f: dn.recovered_projection(p, s, f, CFG))(params, state, _feats())
    assert out.shape == (3, 4, CFG.gnn_dim)
