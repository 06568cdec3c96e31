"""Multi-episode train-LOOP trajectory vs the reference's own loops.

The single-step f64 backward goldens pin each step function; these pin the
LOOP WIRING (fixture: tools/gen_trainloop_golden.py, which RUNS the
reference's train_loop2 / train_loop_finetune over 3 episodes):

* Adam state carried across episodes under one optimizer
  (reference train.py:27-28),
* BN running-stat persistence between episodes (train-mode forwards;
  for the finetune stage: inner-loop stats surviving load_state_dict,
  gnnnet.py:183-187),
* the per-batch ``n_query = x.size(1) - n_support`` recompute
  (meta_template.py:63-65) — the episodic stage varies n_query (3, 2, 3),
* the FO-MAML cross-episode bookkeeping: ``MAML_update()`` at the start of
  episodes 2+ undoes the previous inner delta while keeping the outer Adam
  delta (gnnnet.py:90-103,122), and the stop-epoch ``MAML_update()``
  (train.py:54-55) — which this framework's functional design reproduces
  by simply never persisting inner-adapted params.

Compared in FLOAT64 on both sides (see test_golden_reference.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mft_tpu.core.episode import EpisodeSpec
from mft_tpu.methods.gnnnet import GnnNetCfg
from mft_tpu.train import optimizers as opt
from mft_tpu.train import steps
from mft_tpu.train.inner_loop import InnerLoopCfg, schedule_from_perms
from tests.test_golden_reference import (
    TINY_BCFG,
    _as_f64,
    _assert_tree_close,
    _gnnnet_head_trees,
    _tiny_backbone_trees,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_trainloop.npz")

N_WAY, N_SUPPORT = 2, 2
EPI_QUERIES = (3, 2, 3)
MFT_QUERIES = (16, 16, 16)
IMG_SEED = 905
GCFG = GnnNetCfg(feat_dim=16, n_way=N_WAY, n_support=N_SUPPORT)


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(FIX):
        pytest.skip("run tools/gen_trainloop_golden.py to generate the trajectory fixture")
    with np.load(FIX) as z:
        return {k: z[k] for k in z.files}


def _tree(g, prefix):
    params_f, stats_f = _tiny_backbone_trees(g, f"{prefix}.feature")
    fc, gnn_p = _gnnnet_head_trees(g, prefix)
    return {"feature": params_f, "fc": fc, "gnn": gnn_p}, stats_f


def _episodes(queries):
    """Same stream as gen_trainloop_golden.episodes (images never hit the
    fixture), transposed to NHWC."""
    rs = np.random.RandomState(IMG_SEED)
    return [np.transpose(rs.rand(N_WAY, N_SUPPORT + q, 3, 224, 224), (0, 1, 3, 4, 2)) for q in queries]


def test_train_loop2_trajectory_golden(g):
    """3 episodes of the episodic stage under ONE carried Adam: per-episode
    loss sequence + final params AND final BN running stats."""
    with jax.enable_x64():
        params, stats = _tree(g, "init")
        params, stats = _as_f64(params), _as_f64(stats)
        tx = opt.torch_adam(1e-3)
        opt_state = tx.init(params)
        rng = jax.random.PRNGKey(0)

        losses = []
        for x, q in zip(_episodes(EPI_QUERIES), EPI_QUERIES):
            spec = EpisodeSpec(N_WAY, N_SUPPORT, q)
            step = jax.jit(
                lambda p, s, o, ep, _spec=spec: steps.episodic_train_step(
                    p, s, o, ep, rng, method="gnnnet", bcfg=TINY_BCFG, gcfg=GCFG, spec=_spec, tx=tx
                )
            )
            params, stats, opt_state, m = step(params, stats, opt_state, jnp.asarray(x)[None])
            losses.append(float(m["loss"]))

        np.testing.assert_allclose(losses, g["epi.losses"], rtol=1e-8)
        want_p, want_s = _tree(g, "epi.final")
        _assert_tree_close(params, want_p, rtol=1e-7, atol_frac=1e-9, label="epi.params")
        _assert_tree_close(stats, want_s, rtol=1e-7, atol_frac=1e-9, label="epi.stats")


def test_train_loop_finetune_trajectory_golden(g):
    """3 episodes of the meta fine-tuning stage + the stop-epoch
    MAML_update: the cross-episode FO-MAML bookkeeping, inner-loop BN stats
    carried between episodes, and the outer Adam trajectory — driven through
    the same jitted step cli.train's --fine_tune stage uses, with the
    reference's recorded inner permutations replayed."""
    perms = g["mft.perms"]  # [45, 4]: 15 inner epochs x 3 episodes
    icfg = InnerLoopCfg(epochs=15, batch_size=4, bank_size=N_WAY * N_SUPPORT)
    mcfg = steps.MetaFinetuneCfg(epochs=15, batch_size=4, bn_mode="minibatch")
    spec = EpisodeSpec(N_WAY, N_SUPPORT, 16)

    with jax.enable_x64():
        params, stats = _tree(g, "init")
        params, stats = _as_f64(params), _as_f64(stats)
        tx = opt.torch_adam(1e-3)
        opt_state = tx.init(params)
        rng = jax.random.PRNGKey(0)  # unused: the schedules override the sampler

        losses = []
        for e, x in enumerate(_episodes(MFT_QUERIES)):
            sched = schedule_from_perms(perms[e * 15 : (e + 1) * 15], icfg)
            params, stats, opt_state, m = steps.meta_finetune_train_step(
                params, stats, opt_state, jnp.asarray(x)[None], rng,
                method="gnnnet", bcfg=TINY_BCFG, gcfg=GCFG, spec=spec, mcfg=mcfg, tx=tx,
                schedule=sched,
            )
            losses.append(float(m["loss"]))

        np.testing.assert_allclose(losses, g["mft.losses"], rtol=1e-8)
        # final = the reference AFTER its stop-epoch MAML_update (meta
        # params); functionally that is just the carried params here
        want_p, want_s = _tree(g, "mft.final")
        _assert_tree_close(params, want_p, rtol=1e-6, atol_frac=1e-8, label="mft.params")
        _assert_tree_close(stats, want_s, rtol=1e-6, atol_frac=1e-8, label="mft.stats")
