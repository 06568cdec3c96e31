"""GNN head numerics vs the NumPy oracle + GnnNet episode-scoring semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.core.episode import EpisodeSpec, support_onehot_with_query_slot
from mft_tpu.methods import gnnnet as gn
from mft_tpu.methods.protonet import proto_scores
from mft_tpu.models import gnn as gnn_mod

from . import oracles


def _np(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


CFG = gnn_mod.GNNCfg(in_features=133, nf=96, n_way=5)


@functools.lru_cache(maxsize=None)
def _gnn_params():
    p = jax.jit(lambda k: gnn_mod.init_gnn(k, CFG))(jax.random.PRNGKey(0))
    return p


def test_wcompute_matches_oracle():
    p = _gnn_params()["layers"][0]["w"]
    x = np.random.RandomState(0).randn(3, 30, 133).astype(np.float32)
    ours = jax.jit(gnn_mod.apply_wcompute)(p, jnp.asarray(x))
    ref = oracles.wcompute(_np(p), x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)
    # rows sum to 1 with a zero diagonal (masked softmax)
    adj = np.asarray(ours)[..., 1]
    np.testing.assert_allclose(adj.sum(axis=2), 1.0, atol=1e-5)
    assert np.abs(np.einsum("bii->bi", adj)).max() < 1e-6


def test_gconv_matches_oracle():
    p = _gnn_params()["layers"][0]["l"]
    rs = np.random.RandomState(1)
    x = rs.randn(2, 30, 133).astype(np.float32)
    w = np.abs(rs.randn(2, 30, 30, 2)).astype(np.float32)
    ours = jax.jit(gnn_mod.apply_gconv)(p, jnp.asarray(w), jnp.asarray(x))
    ref = oracles.gconv(_np(p), w, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-4)


def test_gnn_full_matches_oracle():
    p = _gnn_params()
    x = np.random.RandomState(2).randn(4, 30, 133).astype(np.float32)
    ours = jax.jit(gnn_mod.apply_gnn)(p, jnp.asarray(x))
    ref = oracles.gnn(_np(p), x)
    assert ours.shape == (4, 30, 5)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_support_label_layout():
    spec = EpisodeSpec(5, 5, 1)
    lab = np.asarray(support_onehot_with_query_slot(spec))
    assert lab.shape == (30, 5)
    # per class: 5 one-hot rows then a zero query row (reference gnnnet.py:35-38)
    per = lab.reshape(5, 6, 5)
    for c in range(5):
        np.testing.assert_array_equal(per[c, :5], np.tile(np.eye(5)[c], (5, 1)))
        np.testing.assert_array_equal(per[c, 5], np.zeros(5))


def test_gnn_scores_matches_oracle_composition():
    cfg = gn.GnnNetCfg(feat_dim=64, n_way=5, n_support=5)
    head = jax.jit(lambda k: gn.init_head(k, cfg))(jax.random.PRNGKey(3))
    n_query = 3
    z = np.random.RandomState(4).randn(5, 8, 64).astype(np.float32)

    ours = jax.jit(lambda h, z: gn.gnn_scores(h, z, cfg, n_query))(head, jnp.asarray(z))
    assert ours.shape == (15, 5)

    # oracle composition (reference gnnnet.py:68-87, 210-217)
    hp = _np(head)
    zf = oracles.linear(z.reshape(-1, 64), hp["fc"]["linear"])
    zf = oracles.batch_norm(zf, hp["fc"]["bn"]["scale"], hp["fc"]["bn"]["bias"]).reshape(5, 8, 128)
    labels = np.asarray(support_onehot_with_query_slot(EpisodeSpec(5, 5, 1)))
    graphs = []
    for i in range(n_query):
        nodes = np.concatenate([zf[:, :5], zf[:, 5 + i : 5 + i + 1]], axis=1).reshape(30, 128)
        graphs.append(np.concatenate([nodes, labels], axis=1))
    out = oracles.gnn(hp["gnn"], np.stack(graphs))  # [n_query, 30, 5]
    ref = out.reshape(n_query, 5, 6, 5)[:, :, -1].transpose(1, 0, 2).reshape(-1, 5)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_gnn_scores_50shot_compression():
    cfg = gn.GnnNetCfg(feat_dim=32, n_way=5, n_support=50, support_compress=2)
    assert cfg.eff_support == 25
    head = jax.jit(lambda k: gn.init_head(k, cfg))(jax.random.PRNGKey(5))
    z = jnp.asarray(np.random.RandomState(6).randn(5, 52, 32).astype(np.float32))
    scores = jax.jit(lambda h, z: gn.gnn_scores(h, z, cfg, 2))(head, z)
    # 130-node graphs (reference gnnnet_copy.py:74) -> still per-query scores
    assert scores.shape == (10, 5)


def test_proto_scores_match_squared_euclidean():
    spec = EpisodeSpec(4, 3, 2)
    rs = np.random.RandomState(7)
    zs = rs.randn(4, 3, 16).astype(np.float32)
    zq = rs.randn(4, 2, 16).astype(np.float32)
    ours = jax.jit(lambda a, b: proto_scores(a, b, spec))(jnp.asarray(zs), jnp.asarray(zq))
    protos = zs.mean(axis=1)
    q = zq.reshape(8, 16)
    ref = -((q[:, None, :] - protos[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
