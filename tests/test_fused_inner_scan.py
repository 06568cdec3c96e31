"""Correctness of the fused inner-scan (ops/pallas/fused_inner_scan.py).

Three gates, strongest first:

1. the hand-derived step gradient matches jax.grad of the autodiff path
   (apply_final_block + ce_loss) exactly (f32),
2. the pure-XLA fused scan reproduces inner_fit (the production autodiff
   scan) end to end,
3. the Pallas kernel (interpret mode on CPU) reproduces the pure-XLA fused
   scan bit-for-bit math.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mft_tpu.models import backbone as bb
from mft_tpu.ops.pallas import fused_inner_scan as fis
from mft_tpu.train import optimizers as opt
from mft_tpu.train.inner_loop import InnerLoopCfg, minibatch_schedule

GEOM = fis.BlockGeom(h_in=8, c_in=16, c_out=32, stride=2, batch=4)
# a 2-stage cfg whose final block matches GEOM (stage 1, j=0 -> half_res)
BCFG = bb.ResNetCfg((1, 1), (16, 32), stem=False, stem_in=16)
SPAN = 10
T = 9  # 3 epochs x ceil(10/4) steps


@functools.lru_cache(maxsize=None)
def _setup():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params, stats = bb.init_backbone(k1, BCFG)
    _, block = bb.adapt_split(params)
    _, block_s = bb.adapt_split(stats)
    fmap = jax.random.normal(k2, (SPAN, GEOM.h_in, GEOM.h_in, GEOM.c_in), jnp.float32)
    bank_y = jnp.asarray(np.arange(SPAN) % 3, jnp.int32)
    icfg = InnerLoopCfg(epochs=3, batch_size=GEOM.batch, bank_size=SPAN)
    idx, w = minibatch_schedule(k3, icfg)
    return block, block_s, fmap, bank_y, idx, w


def _autodiff_loss(block, block_s, fmap, bank_y, idx_t, w_t):
    from mft_tpu.methods.baseline import ce_loss

    feats = bb.apply_final_block(block, block_s, fmap[idx_t], cfg=BCFG, train=True, sample_mask=w_t)
    return ce_loss(feats, bank_y[idx_t], w_t)


def _oh_wbc(bank_y, idx_t, w_t):
    onehot = jax.nn.one_hot(bank_y[idx_t], GEOM.c_out, dtype=jnp.float32)
    wbc = jnp.broadcast_to(w_t[:, None], (GEOM.batch, GEOM.c_out))
    return onehot, wbc


def test_step_grads_match_autodiff():
    block, block_s, fmap, bank_y, idx, w = _setup()
    idx_t, w_t = idx[1], w[1]

    auto = jax.grad(_autodiff_loss)(block, block_s, fmap, bank_y, idx_t, w_t)

    flat = fis.block_to_flat(block)
    onehot, wbc = _oh_wbc(bank_y, idx_t, w_t)
    xp = jnp.pad(fmap[idx_t], ((0, 0), (1, 1), (1, 1), (0, 0)))
    g, loss = fis._step_grads(flat, xp, onehot, wbc, GEOM)
    want = fis.block_to_flat(auto)
    ref_loss = _autodiff_loss(block, block_s, fmap, bank_y, idx_t, w_t)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for k in fis.PKEYS:
        np.testing.assert_allclose(
            np.asarray(g[k]), np.asarray(want[k]), rtol=2e-4, atol=2e-5, err_msg=k
        )


def test_step_grads_respect_mask():
    """A masked row must contribute nothing: grads with (row present, w=0)
    equal grads with the row replaced by garbage."""
    block, block_s, fmap, bank_y, idx, w = _setup()
    flat = fis.block_to_flat(block)
    idx_t = jnp.asarray([0, 1, 2, 3], jnp.int32)
    w_t = jnp.asarray([1.0, 1.0, 0.0, 1.0], jnp.float32)
    x = fmap[idx_t]
    onehot, wbc = _oh_wbc(bank_y, idx_t, w_t)
    pad = lambda a: jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g1, _ = fis._step_grads(flat, pad(x), onehot, wbc, GEOM)
    x_garbled = x.at[2].set(x[2] * 7.0 + 3.0)
    g2, _ = fis._step_grads(flat, pad(x_garbled), onehot, wbc, GEOM)
    for k in fis.PKEYS:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=1e-5, atol=1e-6, err_msg=k)


def test_xla_fused_scan_matches_inner_fit():
    """End-to-end scan equivalence vs the production autodiff inner loop
    (torch-Adam with bf16 moments, same schedule)."""
    block, block_s, fmap, bank_y, idx, w = _setup()

    def loss_fn(p, idx_t, w_t):
        from mft_tpu.methods.baseline import ce_loss

        feats = bb.apply_final_block(p, block_s, fmap[idx_t], cfg=BCFG, train=True, sample_mask=w_t)
        return ce_loss(feats, bank_y[idx_t], w_t)

    tx = opt.torch_adam_lowmem(0.01)
    opt_state = tx.init(block)
    grad_fn = jax.grad(loss_fn)

    import optax

    p = block
    s = opt_state
    for t in range(T):
        grads = grad_fn(p, idx[t], w[t])
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
    want = fis.block_to_flat(p)

    got = fis.fused_inner_scan_xla(
        fis.block_to_flat(block), fmap, bank_y, idx, w, geom=GEOM, lr=0.01
    )
    for k in fis.PKEYS:
        # Adam normalizes by sqrt(v): near-zero gradients whose fp-reassociated
        # sign differs between the conv and im2col formulations step +-lr
        # apart, so elementwise comparison is meaningless after T steps; the
        # trajectories must stay normwise-identical.
        d = np.linalg.norm(np.asarray(got[k], np.float64) - np.asarray(want[k], np.float64))
        n = np.linalg.norm(np.asarray(want[k], np.float64))
        assert d / n < 0.01, f"{k}: rel L2 drift {d/n:.4f}"


def test_pallas_kernel_matches_xla_scan():
    block, block_s, fmap, bank_y, idx, w = _setup()
    flat = fis.block_to_flat(block)
    want = fis.fused_inner_scan_xla(flat, fmap, bank_y, idx, w, geom=GEOM, lr=0.01)
    got = fis.fused_inner_scan(flat, fmap, bank_y, idx, w, geom=GEOM, lr=0.01, interpret=True)
    for k in fis.PKEYS:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_pallas_kernel_lanes_grid():
    """The multi-lane grid: each lane runs its own scan on its own bank and
    schedule; lane 0 must reproduce the single-lane result."""
    block, block_s, fmap, bank_y, idx, w = _setup()
    flat = fis.block_to_flat(block)
    lanes = 2
    fmaps = jnp.stack([fmap, fmap * 0.5])
    idxs = jnp.stack([idx, jnp.flip(idx, axis=0)])
    flats = jax.tree.map(lambda a: jnp.stack([a, a]), flat)
    out = fis.fused_inner_scan_lanes(
        flats, fmaps, bank_y, idxs, w, geom=GEOM, lr=0.01, interpret=True
    )
    ref0 = fis.fused_inner_scan_xla(flat, fmap, bank_y, idx, w, geom=GEOM, lr=0.01)
    ref1 = fis.fused_inner_scan_xla(
        flat, fmap * 0.5, bank_y, jnp.flip(idx, axis=0), w, geom=GEOM, lr=0.01
    )
    for k in fis.PKEYS:
        assert out[k].shape == (lanes,) + ref0[k].shape
        np.testing.assert_allclose(np.asarray(out[k][0]), np.asarray(ref0[k]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[k][1]), np.asarray(ref1[k]), rtol=1e-4, atol=1e-5)
