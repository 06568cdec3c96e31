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
    # corrupt step: ONLY fc[0].weight/bias are pinned (dampnet_full.py:187-188,
    # dampnet_full_class.py:199-200); gnn.eval() (:189) is a numeric no-op for
    # its stat-free BNs, so the GNN, the fc BN affine, and the recovery nets
    # all still receive gradients
    assert float(jnp.abs(g_corrupt["fc"]["linear"]["w"]).max()) == 0.0
    assert float(jnp.abs(g_corrupt["fc"]["linear"]["b"]).max()) == 0.0
    assert float(jnp.abs(g_corrupt["fc"]["bn"]["scale"]).max()) > 0.0
    assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g_corrupt["gnn"])) > 0.0
    assert float(jnp.abs(g_corrupt["layer1"]["w"]).max()) > 0.0
    # recover step: fc/gnn train too
    assert float(jnp.abs(g_recover["fc"]["linear"]["w"]).max()) > 0.0


def test_training_mode_schedule():
    assert dn.training_mode(0, False) == "plain"
    # call_count starts at 150 (even) -> first initialized step recovers? no:
    # 150 % 2 == 0 -> 'recover'; next 'corrupt'
    assert dn.training_mode(0, True) == "recover"
    assert dn.training_mode(1, True) == "corrupt"


PCFG = dn.prototype_cfg(feat_dim=32, n_way=3, n_support=2)._replace(ntn_dim=8, mlp_hidden=16, mlp_hidden2=12, store_len=4)


@functools.lru_cache(maxsize=None)
def _proto_model():
    return jax.jit(lambda k: dn.init_dampnet(k, PCFG))(jax.random.PRNGKey(1))


def test_znorm_projection_matches_reference_math():
    """dampnet.py:125-129: subtract the all-class support-projection mean,
    then L2-normalize each node."""
    z = np.random.RandomState(8).randn(3, 4, 16).astype(np.float32)
    out = np.asarray(dn.znorm_projection(jnp.asarray(z), n_support=2))
    ref = z - z[:, :2].mean(axis=(0, 1), keepdims=True)
    ref = ref / np.linalg.norm(ref, axis=2, keepdims=True)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(out, axis=2), 1.0, atol=1e-5)


def test_prototype_store_rotation():
    """Rolling store (dampnet.py:24-26,133-136): rows written at
    call_count % store_len, call_count advances, old rows overwritten."""
    _, state = _proto_model()
    assert int(state["count"]) == 150  # dampnet.py:54
    rs = np.random.RandomState(9)
    b1 = jnp.asarray(rs.randn(2, 6, 32).astype(np.float32))  # E=2 episodes
    s1 = dn.update_prototype_store(state, b1)
    assert int(s1["count"]) == 152
    # 150 % 4 == 2, 151 % 4 == 3
    np.testing.assert_allclose(np.asarray(s1["store_std"][2]), np.asarray(b1[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1["store_mean"][3]), np.asarray(b1[1]).mean(0), rtol=1e-5)
    b2 = jnp.asarray(rs.randn(3, 6, 32).astype(np.float32))
    s2 = dn.update_prototype_store(s1, b2)
    # 152,153,154 % 4 -> slots 0,1,2: slot 2 (episode b1[0]) is overwritten
    np.testing.assert_allclose(np.asarray(s2["store_std"][2]), np.asarray(b2[2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["store_std"][3]), np.asarray(b1[1]), rtol=1e-6)
    # training prototypes derive from the store: mean of means + unbiased std
    pm, ps = dn.store_prototypes(s2)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(s2["store_mean"]).mean(0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps), np.asarray(s2["store_std"]).reshape(-1, 32).std(0, ddof=1), rtol=1e-4, atol=1e-5
    )


def test_prototype_training_mode_schedule():
    """dampnet.py:54,95-138: first call (count 150) plain; then odd counts
    corrupt, even counts recover."""
    assert dn.prototype_training_mode(150) == "plain"
    assert dn.prototype_training_mode(151) == "corrupt"
    assert dn.prototype_training_mode(152) == "recover"
    assert dn.prototype_training_mode(153) == "corrupt"
    # with an episode batch, parity alternates per STEP (count advances by
    # E per step; raw-count parity would never flip for even E and the
    # corruption half of training would silently never run)
    for e in (2, 4):
        modes = [dn.prototype_training_mode(150 + e * i, e) for i in range(5)]
        assert modes == ["plain", "corrupt", "recover", "corrupt", "recover"]


def test_prototype_corruption_bias_unscaled():
    """The prototype variant adds the corruption bias UNscaled
    (dampnet.py:166), unlike dampnet_full_class.py:174's m_fac * bias.
    On zero input the output IS the bias term, so the two scalings must
    differ by exactly m_fac = 1.5."""
    zeros = jnp.zeros((4, 32), jnp.float32)
    k = jax.random.PRNGKey(5)
    unscaled = np.asarray(dn.sample_corruption(k, zeros, 32, prototype=True))
    scaled = np.asarray(dn.sample_corruption(k, zeros, 32, prototype=True, scale_bias=True))
    assert np.abs(unscaled).max() > 0  # the bias term is live under this key
    np.testing.assert_allclose(scaled, 1.5 * unscaled, rtol=1e-6)
    # the live prototype path is the unscaled one
    default = np.asarray(dn.sample_corruption(k, zeros, 32, prototype=True))
    np.testing.assert_array_equal(default, unscaled)


def test_corruption_scatter_ignores_unselected_lanes():
    """Only the floor(perc*f) SELECTED index lanes may write the corruption
    bias (reference dampnet.py:164 applies exactly random_idx2); an
    unselected lane's zero write colliding with a selected index must not
    cancel it (scatter duplicate order is undefined).  On zero input the
    output IS the bias, so its support must equal the selected index set."""
    import math as _math

    f = 64
    key = jax.random.PRNGKey(7)
    out = np.asarray(dn.sample_corruption(key, jnp.zeros((1, f)), f, prototype=True))[0]
    # replicate the function's index draws (same key-split sequence)
    ks = jax.random.split(key, 9)
    ri2 = np.asarray(jax.random.randint(ks[5], (f,), 0, f))
    n_sel = _math.floor(0.6 * f)
    selected = set(ri2[:n_sel].tolist())
    # discriminating setup: the unselected suffix must collide with the
    # selected prefix, else the old buggy scatter would pass trivially
    assert selected & set(ri2[n_sel:].tolist())
    nonzero = set(np.nonzero(out)[0].tolist())
    assert nonzero == selected  # t-samples are continuous: P(exact 0) = 0


def test_prototype_variant_scores_and_gradients():
    params, state = _proto_model()
    # fill the store so training-time prototypes are well-defined
    state = dn.update_prototype_store(state, jnp.asarray(np.random.RandomState(10).randn(4, 6, 32).astype(np.float32)))
    state = dn.update_prototypes(state, jnp.asarray(np.random.RandomState(11).randn(40, 32).astype(np.float32)))
    feats = _feats()
    for mode in ["plain", "recover", "domain_shift"]:
        s = jax.jit(lambda p, st, f, m=mode: dn.dampnet_scores(p, st, f, PCFG, 2, mode=m))(params, state, feats)
        assert s.shape == (6, 3) and np.isfinite(np.asarray(s)).all()

    def loss(p, mode):
        kw = {"key": jax.random.PRNGKey(3)} if mode == "corrupt" else {}
        s = dn.dampnet_scores(p, state, feats, PCFG, 2, mode=mode, **kw)
        return dn.dampnet_loss(s, 3, 2)

    # the prototype variant does NOT freeze fc/gnn on corruption steps
    # (no requires_grad toggles in reference dampnet.py, unlike
    # dampnet_full.py:187-189)
    g_corrupt = jax.jit(jax.grad(lambda p: loss(p, "corrupt")))(params)
    assert float(jnp.abs(g_corrupt["fc"]["linear"]["w"]).max()) > 0.0
    assert float(jnp.abs(g_corrupt["layer1"]["w"]).max()) > 0.0


def test_recovered_projection_shape():
    params, state = _model()
    state = dn.update_prototypes(state, jnp.asarray(np.random.RandomState(7).randn(40, 32).astype(np.float32)))
    out = jax.jit(lambda p, s, f: dn.recovered_projection(p, s, f, CFG))(params, state, _feats())
    assert out.shape == (3, 4, CFG.gnn_dim)
