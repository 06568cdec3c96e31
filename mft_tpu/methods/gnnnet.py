"""GnnNet — the GNN meta-learner (the paper's core model).

Capability parity with reference methods/gnnnet.py (and the compressed
50-shot variant methods/gnnnet_copy.py):

* projector ``fc``: Linear(feat_dim -> 128) + BatchNorm1d without running
  stats (gnnnet.py:30),
* graph head ``GNN_nl(128 + n_way, 96, n_way)`` (gnnnet.py:31),
* per-query graphs of ``n_way * (n_support + 1)`` nodes: every class's
  support embeddings plus that query, with one-hot support labels and a zero
  label row marking the query slot (gnnnet.py:35-38, 62-87),
* 50-shot compression: support embeddings pair-averaged after projection so
  the node count halves (gnnnet_copy.py:34, 67-71).

TPU-first notes: the per-query graph build is a gather/arrange over one
projected episode tensor; all ``n_query`` graphs run through a single GNN
program (as in the reference) so the edge convs batch onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mft_tpu.core.episode import EpisodeSpec, query_labels, support_onehot_with_query_slot
from mft_tpu.models.gnn import GNNCfg, apply_gnn, init_gnn
from mft_tpu.ops.convpool import linear
from mft_tpu.ops.initializers import bn_params, torch_linear
from mft_tpu.ops.norm import batch_norm


class GnnNetCfg(NamedTuple):
    feat_dim: int = 512
    n_way: int = 5
    n_support: int = 5
    proj_dim: int = 128
    gnn_nf: int = 96
    support_compress: int = 1  # 2 reproduces the 50-shot gnnnet_copy variant
    use_pallas: bool = False  # fused edge kernel (ops/pallas/edge_mlp.py)

    @property
    def eff_support(self) -> int:
        """Graph-node support count after compression (gnnnet_copy.py:34)."""
        if self.support_compress == 1:
            return self.n_support
        return round(self.n_support / self.support_compress)

    @property
    def gnn_cfg(self) -> GNNCfg:
        return GNNCfg(self.proj_dim + self.n_way, self.gnn_nf, self.n_way)

    @property
    def graph_spec(self) -> EpisodeSpec:
        return EpisodeSpec(self.n_way, self.eff_support, 1)


def init_head(key, cfg: GnnNetCfg, dtype=jnp.float32):
    """fc projector + GNN params (the backbone is owned by the caller)."""
    k_fc, k_gnn = jax.random.split(key)
    return {
        "fc": {"linear": torch_linear(k_fc, cfg.feat_dim, cfg.proj_dim, dtype), "bn": bn_params(cfg.proj_dim, dtype)},
        "gnn": init_gnn(k_gnn, cfg.gnn_cfg, dtype),
    }


def project(head, z_flat: jnp.ndarray) -> jnp.ndarray:
    """Linear + batch-stats BN over all episode rows (gnnnet.py:30,53)."""
    h = linear(z_flat, head["fc"]["linear"])
    h, _ = batch_norm(h, head["fc"]["bn"], None, use_batch_stats=True)
    return h


def gnn_scores(head, z_episode: jnp.ndarray, cfg: GnnNetCfg, n_query: int, z_transform=None) -> jnp.ndarray:
    """Score an episode from backbone features.

    z_episode: [n_way, n_support + n_query, feat_dim] (support-first slots,
    reference meta_template.py:44-45).  Returns [n_way * n_query, n_way].

    ``z_transform``: optional hook applied to the projected
    ``[n_way, slots, proj]`` tensor before the graph build — the DampNet
    prototype variant mean-centers + L2-normalizes here
    (reference methods/dampnet.py:125-129).
    """
    n_way, slots, _ = z_episode.shape
    assert n_way == cfg.n_way and slots == cfg.n_support + n_query

    z = project(head, z_episode.reshape(n_way * slots, -1))
    z = z.reshape(n_way, slots, cfg.proj_dim)
    if z_transform is not None:
        z = z_transform(z)

    zs = z[:, : cfg.n_support]  # [n_way, n_support, proj]
    if cfg.support_compress > 1:
        # pair-average adjacent support embeddings (gnnnet_copy.py:67-71)
        c = cfg.support_compress
        zs = zs.reshape(n_way, c, cfg.eff_support, cfg.proj_dim).mean(axis=1)
    zq = z[:, cfg.n_support :]  # [n_way, n_query, proj]

    labels = support_onehot_with_query_slot(cfg.graph_spec, z.dtype)  # [n_way*(s+1), n_way]

    def build_graph(q_i):
        # per class: eff_support supports then this query (gnnnet.py:62)
        nodes = jnp.concatenate([zs, q_i[:, None, :]], axis=1)  # [n_way, s+1, proj]
        nodes = nodes.reshape(n_way * (cfg.eff_support + 1), cfg.proj_dim)
        return jnp.concatenate([nodes, labels], axis=1)

    # zq[:, i] for each query index i -> [n_query, n_way, proj]
    graphs = jax.vmap(build_graph)(jnp.swapaxes(zq, 0, 1))  # [n_query, N, proj+n_way]

    out = apply_gnn(head["gnn"], graphs, cfg.use_pallas)  # [n_query, N, n_way]
    out = out.reshape(n_query, n_way, cfg.eff_support + 1, n_way)[:, :, -1]  # query slots
    # [n_query, n_way, n_way] -> class-major [(n_way*n_query), n_way]
    return jnp.swapaxes(out, 0, 1).reshape(n_way * n_query, n_way)


def gnnnet_loss(scores: jnp.ndarray, n_way: int, n_query: int) -> jnp.ndarray:
    y = query_labels(EpisodeSpec(n_way, 0, n_query))
    return optax.softmax_cross_entropy_with_integer_labels(scores, y).mean()
