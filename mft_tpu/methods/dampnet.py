"""DampNet — GNN meta-learner + domain-shift recovery network.

Capability parity with the reference family (methods/dampnet.py,
dampnet_full.py, dampnet_full_class.py — the variant instantiable from the
drivers is ``dampnet_full_class``, finetune.py:448-449):

* a "neural tensor network" comparison module per statistic: for the mean
  and for the std, ``NTN(a, b) = Bilinear(a, b) + Linear([a; b])``
  (dampnet_full_class.py:33-37),
* two 3-layer MLPs mapping ``tanh([NTN_mean; NTN_std])`` to per-feature
  multiplicative and additive corrections:
  ``recovered_x = x * mult + add`` (dampnet_full_class.py:179-198),
* source prototypes ``final_meta_prototype(_std)``: mean/std over a bank of
  source-domain support features (``get_all_feat``,
  dampnet_full_class.py:90-95, refreshed after epoch 206 in
  ``train_loop_full`` :425-469),
* training alternates by call parity: odd calls corrupt the features with a
  random diagonal + t-distributed corruption matrix and train the recovery
  net (fc/GNN frozen); even calls recover the clean features (fc/GNN train)
  (dampnet_full_class.py:145-261) — model-level fault injection, reproduced
  as an explicit ``mode`` argument instead of mutable call_count state,
* the "_class" statistic: std across per-class support means
  (dampnet_full_class.py:111-116); the "_full" variant uses the std across
  all support features (dampnet_full.py),
* eval: ``domain_shift=True`` recovery conditioned on episode stats vs the
  source prototypes, then fc+GNN scoring (dampnet_full_class.py:262-352),
  the 100-epoch linear probe on recovered 128-d projections
  (``set_forward_adaptation_full`` :471-548), and the unsupervised-stats
  variant ``set_forward_unsup`` (:355-402),
* the PROTOTYPE variant (``--method dampnet``, reference methods/dampnet.py,
  live in train.py:19,155): NTN width 500, MLPs 1000->900->800->feat, a
  rolling ``store_len``-episode store of clean feature means/raw support
  features whose statistics drive the training-time recovery
  (dampnet.py:24-26,133-136,147-148), mean-centered + L2-normalized
  projections before the GNN (:125-129), fixed corruption constants with
  an UNscaled corruption bias (:140-146,166), no head freezing on
  corruption steps, and the
  plain/odd-corrupt/even-recover call_count schedule starting at 150
  (:54,95-138).  Stores and call_count are explicit state.

All functions take backbone *features* — the drivers compute embeddings
first, exactly as ``train_loop_full`` does (dampnet_full_class.py:443).

Intentional divergences (statistical, not semantic): the reference's numpy
fancy-index ``+=`` applies duplicate indices once (buffered); the JAX
scatter here uses ``.set`` with identical per-index values, which matches
that. Dynamic corruption sizes (``floor(perc * feat_dim)``) become masked
fixed-size scatters so shapes stay static under jit.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mft_tpu.core.episode import EpisodeSpec, query_labels
from mft_tpu.methods.gnnnet import GnnNetCfg, gnn_scores
from mft_tpu.ops.convpool import linear
from mft_tpu.ops.initializers import torch_linear
from mft_tpu.ops.norm import batch_norm


class DampNetCfg(NamedTuple):
    feat_dim: int = 512
    n_way: int = 5
    n_support: int = 5
    gnn_dim: int = 128
    gnn_nf: int = 96
    ntn_dim: int = 300  # 500 in the prototype dampnet.py variant
    mlp_hidden: int = 500
    #: second MLP hidden width; None = mlp_hidden (the full/full_class MLPs
    #: are h->h; the prototype's are 900->800, dampnet.py:40-45)
    mlp_hidden2: int = None
    stat: str = "class"  # 'class' (dampnet_full_class) | 'support' (dampnet_full)
    #: 'full' = the dampnet_full/_class family; 'prototype' = the original
    #: methods/dampnet.py variant: rolling 20-episode prototype store,
    #: mean-centered + L2-normalized projections before the GNN, fixed
    #: corruption constants, no head freezing on corruption steps
    variant: str = "full"
    store_len: int = 20  # rolling store length (dampnet.py:24)

    @property
    def h2(self) -> int:
        return self.mlp_hidden if self.mlp_hidden2 is None else self.mlp_hidden2

    @property
    def gnn_cfg(self) -> GnnNetCfg:
        return GnnNetCfg(self.feat_dim, self.n_way, self.n_support, self.gnn_dim, self.gnn_nf)


def prototype_cfg(feat_dim: int = 512, n_way: int = 5, n_support: int = 5) -> DampNetCfg:
    """The ``--method dampnet`` prototype variant (reference methods/dampnet.py:
    NTN width 500 (:32-36), MLPs 1000->900->800->feat (:40-45), support-stat
    std, rolling 20-episode store)."""
    return DampNetCfg(
        feat_dim=feat_dim, n_way=n_way, n_support=n_support,
        ntn_dim=500, mlp_hidden=900, mlp_hidden2=800, stat="support",
        variant="prototype",
    )


def _bilinear_init(key, f: int, out: int, dtype=jnp.float32):
    """torch.nn.Bilinear(f, f, out, bias=False) default init:
    U(-1/sqrt(f), 1/sqrt(f)) over [out, f, f]."""
    bound = 1.0 / math.sqrt(f)
    return jax.random.uniform(key, (out, f, f), dtype, -bound, bound)


def bilinear(w: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """out_k = a^T W_k b."""
    return jnp.einsum(
        "i,kij,j->k", a, w, b, preferred_element_type=jnp.promote_types(a.dtype, jnp.float32)
    ).astype(a.dtype)


def init_dampnet(key, cfg: DampNetCfg, dtype=jnp.float32):
    """Returns (params, state).  ``state`` holds the source prototypes."""
    from mft_tpu.methods.gnnnet import init_head

    ks = jax.random.split(key, 12)
    f, n, h, h2 = cfg.feat_dim, cfg.ntn_dim, cfg.mlp_hidden, cfg.h2
    head = init_head(ks[0], cfg.gnn_cfg, dtype)
    params = {
        "fc": head["fc"],
        "gnn": head["gnn"],
        "W_R": _bilinear_init(ks[1], f, n, dtype),
        "V_R": torch_linear(ks[2], 2 * f, n, dtype),
        "W_R_std": _bilinear_init(ks[3], f, n, dtype),
        "V_R_std": torch_linear(ks[4], 2 * f, n, dtype),
        "layer1": torch_linear(ks[5], 2 * n, h, dtype),
        "layer2": torch_linear(ks[6], h, h2, dtype),
        "layer3": torch_linear(ks[7], h2, f, dtype),
        "layer1_add": torch_linear(ks[8], 2 * n, h, dtype),
        "layer2_add": torch_linear(ks[9], h, h2, dtype),
        "layer3_add": torch_linear(ks[10], h2, f, dtype),
    }
    state = {
        "proto_mean": jnp.zeros((f,), dtype),
        "proto_std": jnp.zeros((f,), dtype),
        "initialized": jnp.zeros((), jnp.bool_),
    }
    if cfg.variant == "prototype":
        # rolling stores of the last ``store_len`` training episodes' clean
        # feature means and raw support features (dampnet.py:24-26); indexed
        # by call_count % store_len, call_count starts at 150 (:54)
        state["store_mean"] = jnp.zeros((cfg.store_len, f), dtype)
        state["store_std"] = jnp.zeros((cfg.store_len, cfg.n_way * cfg.n_support, f), dtype)
        state["count"] = jnp.full((), 150, jnp.int32)
    return params, state


def update_prototypes(state, all_feats: jnp.ndarray):
    """``get_all_feat``: prototypes = mean/std over a [N, feat] source bank
    (dampnet_full_class.py:90-95; torch .std default = unbiased)."""
    return {
        **state,
        "proto_mean": jnp.mean(all_feats, axis=0),
        "proto_std": jnp.std(all_feats, axis=0, ddof=1),
        "initialized": jnp.ones((), jnp.bool_),
    }


def episode_stats(feats_episode: jnp.ndarray, cfg: DampNetCfg):
    """(x_mean, x_std) of the support features.

    'class': std across per-class support means (dampnet_full_class.py:111-116);
    'support': std across all support features (dampnet_full.py)."""
    support = feats_episode[:, : cfg.n_support]  # [n_way, s, f]
    x_mean = jnp.mean(support, axis=(0, 1))
    if cfg.stat == "class":
        class_means = jnp.mean(support, axis=1)  # [n_way, f]
        x_std = jnp.std(class_means, axis=0, ddof=1)
    else:
        x_std = jnp.std(support.reshape(-1, support.shape[-1]), axis=0, ddof=1)
    return x_mean, x_std


def recovery(params, state, x_mean: jnp.ndarray, x_std: jnp.ndarray):
    """(mult, add) per-feature corrections from NTN comparisons of episode
    stats vs source prototypes (dampnet_full_class.py:179-198)."""
    pm, ps = state["proto_mean"], state["proto_std"]
    ntn_m = bilinear(params["W_R"], pm, x_mean) + linear(jnp.concatenate([pm, x_mean]), params["V_R"])
    ntn_s = bilinear(params["W_R_std"], ps, x_std) + linear(jnp.concatenate([ps, x_std]), params["V_R_std"])
    h = jnp.tanh(jnp.concatenate([ntn_m, ntn_s]))
    mult = linear(jax.nn.relu(linear(jax.nn.relu(linear(h, params["layer1"])), params["layer2"])), params["layer3"])
    add = linear(
        jax.nn.relu(linear(jax.nn.relu(linear(h, params["layer1_add"])), params["layer2_add"])), params["layer3_add"]
    )
    return mult, add


def znorm_projection(z: jnp.ndarray, n_support: int) -> jnp.ndarray:
    """The prototype variant's projection normalization (dampnet.py:125-129):
    subtract the mean of the support projections (over all classes), then
    L2-normalize each node.  z: [n_way, slots, proj]."""
    z = z - jnp.mean(z[:, :n_support], axis=(0, 1), keepdims=True)
    return z / jnp.linalg.norm(z, axis=2, keepdims=True)


def store_prototypes(state):
    """Training-time prototypes from the rolling store (dampnet.py:147-148,
    211-212): mean of the stored episode means; torch ``.std(axis=(0,1))``
    (unbiased over all stored support features) for the std."""
    f = state["store_mean"].shape[-1]
    pm = jnp.mean(state["store_mean"], axis=0)
    ps = jnp.std(state["store_std"].reshape(-1, f), axis=0, ddof=1)
    return pm, ps


def update_prototype_store(state, banks: jnp.ndarray):
    """Rotate an episode batch of clean support-feature banks
    ``[E, n_way*n_support, feat]`` into the rolling store
    (dampnet.py:133-136,205-208,245-248) and advance call_count.

    With E > 1 the batch writes E consecutive slots in one scatter (the
    reference is strictly serial; duplicate slots for E > store_len would
    resolve arbitrarily — keep episode_batch <= store_len)."""
    e = banks.shape[0]
    idx = (state["count"] + jnp.arange(e)) % state["store_mean"].shape[0]
    return {
        **state,
        "store_mean": state["store_mean"].at[idx].set(banks.mean(axis=1)),
        "store_std": state["store_std"].at[idx].set(banks),
        "count": state["count"] + e,
    }


def prototype_training_mode(count: int, e_batch: int = 1) -> str:
    """The prototype variant's schedule (dampnet.py:54,95-138: call_count
    starts at 150; the first call scores plainly, then odd counts corrupt
    and even counts recover).

    ``e_batch``: the driver's episode-batch size.  The rolling store
    advances ``count`` by E per step, so parity must alternate per STEP
    (one batched step = one reference "call"), not per raw count — with
    E even, raw-count parity would never flip and the corruption half of
    the training signal would silently never run."""
    if count == 150:
        return "plain"
    step = (count - 150 + e_batch - 1) // max(e_batch, 1)
    return "corrupt" if step % 2 == 1 else "recover"


def sample_corruption(key, x: jnp.ndarray, feat_dim: int, *, prototype: bool = False, scale_bias: bool = None):
    """Random diagonal + t-distributed corruption of a [N, f] feature matrix
    (dampnet_full_class.py:146-174), with masked fixed-size scatters.

    ``prototype``: the prototype variant pins perc=0.6, perc_zeros=0.3,
    m_fac=1.5 instead of sampling them (dampnet.py:140-146) — and adds the
    bias UNscaled (``corrupt_x += corruption_bias``, dampnet.py:166),
    unlike dampnet_full_class.py:174's ``m_fac * corruption_bias``.
    ``scale_bias`` overrides that coupling (tests only)."""
    f = feat_dim
    if scale_bias is None:
        scale_bias = not prototype
    ks = jax.random.split(key, 9)
    if prototype:
        perc = jnp.asarray(0.6)
        perc_zeros = jnp.asarray(0.3)
        m_fac = jnp.asarray(1.5)
    else:
        perc = jax.random.uniform(ks[0], (), minval=0.1, maxval=0.9)
        perc_zeros = jax.random.uniform(ks[1], (), minval=0.1, maxval=0.9)
        m_fac = jax.random.uniform(ks[2], (), minval=1.5, maxval=5.0)

    # diagonal mask: floor(f * perc_zeros) random positions zeroed
    n_zeros = jnp.floor(f * perc_zeros).astype(jnp.int32)
    order = jax.random.permutation(ks[3], f)
    diag = jnp.where(order >= n_zeros, 1.0, 0.0)
    corruption = jnp.diag(diag)

    n_sel = jnp.floor(perc * f).astype(jnp.int32)
    sel_mask = jnp.arange(f) < n_sel
    ri = jax.random.randint(ks[4], (f,), 0, f)
    ri2 = jax.random.randint(ks[5], (f,), 0, f)
    rand_col = ri2[jax.random.randint(ks[6], (), 0, jnp.maximum(n_sel, 1))]

    t_sample = m_fac * jax.random.t(ks[7], 5.0, (f, f))
    ad_sub = jnp.where(jax.random.permutation(ks[8], f) < f - f // 2, 1.0, -1.0)
    t_bias = jax.random.t(jax.random.fold_in(key, 99), 5.0, (f,)) + ad_sub
    t_bias = -t_sample[:, rand_col] + t_bias

    # Scatter ONLY the selected lanes (the out-of-bounds sentinel is dropped):
    # an unselected lane writing its base/zero value to an index that a
    # selected lane also writes would cancel it or not depending on scatter
    # duplicate order (undefined), whereas the reference applies every
    # selected index deterministically (duplicates once — numpy buffered +=,
    # with identical per-index values, so .set matches).
    sel_ri = jnp.where(sel_mask, ri, f)
    sel_ri2 = jnp.where(sel_mask, ri2, f)
    corruption = corruption.at[sel_ri, sel_ri2].set(corruption[ri, ri2] + t_sample[ri, ri2], mode="drop")
    bias = jnp.zeros((f,)).at[sel_ri2].set(t_bias[ri2], mode="drop")

    corrupt_x = x @ corruption + (m_fac * bias if scale_bias else bias)
    return jax.lax.stop_gradient(corrupt_x)


def _fc_gnn_scores(params, z_episode: jnp.ndarray, cfg: DampNetCfg, n_query: int, freeze_head: bool):
    head = {"fc": params["fc"], "gnn": params["gnn"]}
    if freeze_head:
        # the reference corrupt step pins ONLY fc[0].weight/bias
        # (dampnet_full.py:187-189, dampnet_full_class.py:199-201);
        # ``gnn.eval()`` is numerically a no-op for its stat-free BNs, so the
        # GNN params and the fc BN affine still receive gradients and train
        head = {
            "fc": {**head["fc"], "linear": jax.lax.stop_gradient(head["fc"]["linear"])},
            "gnn": head["gnn"],
        }
    zt = (lambda z: znorm_projection(z, cfg.n_support)) if cfg.variant == "prototype" else None
    return gnn_scores(head, z_episode, cfg.gnn_cfg, n_query, z_transform=zt)


def dampnet_scores(
    params,
    state,
    feats_episode: jnp.ndarray,
    cfg: DampNetCfg,
    n_query: int,
    *,
    mode: str,
    key=None,
    unsup_stats=None,
    corrupt_x=None,
):
    """Score an episode of backbone features ``[n_way, s+q, feat]``.

    mode:
      'plain'        — no recovery (pre-prototype warmup,
                       dampnet_full_class.py:125-144),
      'corrupt'      — training odd step: corrupt features, recover, score
                       with fc[0] frozen (:145-218; the prototype variant
                       freezes nothing),
      'recover'      — training even step: recover clean features (:219-261),
      'domain_shift' — eval-time recovery vs source prototypes (:262-352),
      'unsup'        — recovery conditioned on external unlabeled stats
                       ``unsup_stats=(mean, std)`` (:355-402).

    ``corrupt_x``: externally supplied corrupted features ``[n_way*slots,
    feat]`` for mode='corrupt', bypassing :func:`sample_corruption` — used to
    replay the reference's recorded np.random corruption draws in the golden
    tests.
    """
    n_way, slots, f = feats_episode.shape
    flat = feats_episode.reshape(n_way * slots, f)

    if mode == "plain":
        return _fc_gnn_scores(params, feats_episode, cfg, n_query, freeze_head=False)

    if mode == "unsup":
        x_mean, x_std = unsup_stats
    else:
        x_mean, x_std = episode_stats(feats_episode, cfg)
        x_mean, x_std = jax.lax.stop_gradient(x_mean), jax.lax.stop_gradient(x_std)

    proto = cfg.variant == "prototype"
    if proto and mode in ("corrupt", "recover"):
        # training recovery compares against the rolling-store prototypes
        # (dampnet.py:147-148,211-212), not the fixed eval ones
        pm, ps = store_prototypes(state)
        src_state = dict(state, proto_mean=pm, proto_std=ps)
    else:
        src_state = state

    if mode == "corrupt":
        if corrupt_x is None:
            assert key is not None
            corrupt = sample_corruption(key, flat, f, prototype=proto)
        else:
            corrupt = jax.lax.stop_gradient(corrupt_x)
        c_episode = corrupt.reshape(n_way, slots, f)
        c_mean, c_std = episode_stats(c_episode, cfg._replace(stat="support"))
        mult, add = recovery(params, src_state, jax.lax.stop_gradient(c_mean), jax.lax.stop_gradient(c_std))
        recovered = corrupt * mult + add
        # the full family freezes fc/gnn on corruption steps
        # (dampnet_full.py:187-189); the prototype variant does not
        return _fc_gnn_scores(params, recovered.reshape(n_way, slots, f), cfg, n_query, freeze_head=not proto)

    mult, add = recovery(params, src_state, x_mean, x_std)
    recovered = flat * mult + add
    return _fc_gnn_scores(params, recovered.reshape(n_way, slots, f), cfg, n_query, freeze_head=False)


def dampnet_loss(scores: jnp.ndarray, n_way: int, n_query: int) -> jnp.ndarray:
    y = query_labels(EpisodeSpec(n_way, 0, n_query))
    return optax.softmax_cross_entropy_with_integer_labels(scores, y).mean()


def training_mode(step_index: int, prototypes_initialized: bool) -> str:
    """The reference's call_count parity schedule (dampnet_full_class.py:56,
    140-143: call_count starts at 150 and increments per episode)."""
    if not prototypes_initialized:
        return "plain"
    return "corrupt" if (150 + step_index) % 2 == 1 else "recover"


def recovered_projection(params, state, feats_episode: jnp.ndarray, cfg: DampNetCfg):
    """Recovered features -> 128-d fc projection, for the eval-time linear
    probe of set_forward_adaptation_full (dampnet_full_class.py:471-548,
    which probes on the gnn_dim projection :523)."""
    n_way, slots, f = feats_episode.shape
    x_mean, x_std = episode_stats(feats_episode, cfg)
    mult, add = recovery(params, state, x_mean, x_std)
    recovered = feats_episode.reshape(-1, f) * mult + add
    h = linear(recovered, params["fc"]["linear"])
    h, _ = batch_norm(h, params["fc"]["bn"], None, use_batch_stats=True)
    return h.reshape(n_way, slots, cfg.gnn_dim)
