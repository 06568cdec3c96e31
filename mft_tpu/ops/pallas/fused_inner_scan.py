"""Fused inner-scan for the eval-time transfer fine-tune (the hot loop).

The per-episode adaptation scan — 500 Adam steps on the final ResNet block —
is HBM-bandwidth-bound under XLA: every step re-reads and re-writes the
block's parameters and both Adam moments from HBM (~70 MB per step per
episode lane; docs/PERF.md).  Batching episode lanes cannot help (measured:
batch-1 and batch-8 throughput are equal), only traffic reduction can.

This module fuses the ENTIRE scan into one Pallas kernel per episode lane:
parameters and Adam moments live in VMEM scratch across all steps, the
frozen-trunk feature bank streams in per minibatch, and only the adapted
parameters are written back — HBM traffic drops from ~35 GB to ~0.1 GB per
lane.  The step math (forward of the final residual block, hand-derived
masked-BN/conv backward, torch-Adam update) is shared between the kernel
body and a pure-XLA reference (:func:`fused_inner_scan_xla`) that is tested
against the autodiff path (``inner_loop.inner_fit``) for correctness.

Semantics reproduced (the GNN member's inner loop, reference
finetune.py:261-299 + the fast-path approximations documented in
train/eval_engine.py):

* CE on raw 512-d features-as-logits (finetune.py:286-291),
* masked batch-stats BN with the ragged-last-minibatch validity mask,
* torch Adam with bf16-stored moments and bf16-carried parameters
  (TransferCfg.opt_state_dtype / inner_param_dtype fast path).

Layout notes: convs are expressed as sums of 9 per-tap matmuls
([B*ho*wo, C] @ [C, Cout] per kernel tap) because Mosaic lowers neither
strided slices, gathers, nor lane-concats of offset slices; the
[kh, kw, Cin, Cout] HWIO weights reshape to stacked-tap matrix form
([kh*kw*Cin, Cout]) for free (row-major contiguous).

Measured verdict (docs/PERF.md): the kernel is numerically correct but
LOSES to the lane-batched XLA scan on the v5e — the sequential lane grid
cannot feed the MXU at minibatch-5 shapes — so it is not wired into the
eval engine; it stands as a tested experiment and Mosaic playbook example.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN_EPS = 1e-5  # torch default (ops/norm.py)
_ADAM_EPS = 1e-8


class BlockGeom(NamedTuple):
    """Static geometry of the adapted block (ResNet10 stage 4: 14->7)."""

    h_in: int = 14
    c_in: int = 256
    c_out: int = 512
    stride: int = 2
    batch: int = 5

    @property
    def h_out(self) -> int:
        return self.h_in // self.stride

    @property
    def rows(self) -> int:
        return self.batch * self.h_out * self.h_out


# --------------------------------------------------------------------------
# im2col / col2im as static shifted slices (VPU-friendly, no gathers)
# --------------------------------------------------------------------------


def _even_rows(x: jnp.ndarray, start_pair: int, parity: int, n: int) -> jnp.ndarray:
    """Rows ``2*(start_pair + j) + parity`` for j < n of ``x [B, H, W, C]``,
    as contiguous static slices (Mosaic has no strided slice/gather): pair
    the row axis, then slice one parity's contiguous span on a flattened
    trailing axis."""
    b, h, w_, c = x.shape
    paired = x.reshape(b, h // 2, 2 * w_ * c)
    sl = paired[:, start_pair : start_pair + n, parity * w_ * c : (parity + 1) * w_ * c]
    return sl.reshape(b, n, w_, c)


def _even_cols(x: jnp.ndarray, start_pair: int, parity: int, n: int) -> jnp.ndarray:
    """Columns ``2*(start_pair + j) + parity`` of ``x [B, H, W, C]``."""
    b, h, w_, c = x.shape
    paired = x.reshape(b, h, w_ // 2, 2 * c)
    return paired[:, :, start_pair : start_pair + n, parity * c : (parity + 1) * c]


def _patches3x3(xp: jnp.ndarray, stride: int):
    """The 9 shifted input windows of a 3x3 pad-1 conv, each flattened to
    [B*ho*wo, C] (ky-major, kx order — matching the [9C, Co] im2col weight
    layout).  ``xp`` is the PRE-PADDED input [B, H+2, H+2, C].  Static
    contiguous slices only; the conv itself is computed as a SUM of 9
    per-tap matmuls (Mosaic cannot lane-concat slices with mismatched
    sublane offsets, so classic im2col is off the table)."""
    b, hp, _, c = xp.shape
    h = hp - 2
    ho = h // stride
    pieces = []
    for ky in range(3):
        if stride == 1:
            rows = xp[:, ky : ky + ho, :, :]
        else:
            q, rm = divmod(ky, 2)
            rows = _even_rows(xp, q, rm, ho)
        for kx in range(3):
            if stride == 1:
                piece = rows[:, :, kx : kx + ho, :]
            else:
                qx, rmx = divmod(kx, 2)
                piece = _even_cols(rows, qx, rmx, ho)
            pieces.append(piece.reshape(b * ho * ho, c))
    return pieces


def _conv3x3_fwd(pieces, wmat: jnp.ndarray, c: int):
    """Sum of 9 per-tap matmuls: pieces[k] [R, C] @ wmat[kC:(k+1)C] -> f32."""
    acc = _matmul(pieces[0], wmat[:c])
    for k in range(1, 9):
        acc = acc + _matmul(pieces[k], wmat[k * c : (k + 1) * c])
    return acc


def _conv3x3_dw(pieces, dy: jnp.ndarray, c: int):
    """dW for the 9-tap conv: [9C, Co] from pieces^T @ dy."""
    return jnp.concatenate([_matmul(pieces[k].T, dy) for k in range(9)], axis=0)


def _conv3x3_dx_s1(dy: jnp.ndarray, wmat: jnp.ndarray, b: int, h: int, c_in: int):
    """Input gradient of the stride-1 3x3 conv: per-tap dy @ W_k^T scattered
    back by static pad-shift adds.  dy: [B*h*h, Co] -> [B, H, H, C_in]."""
    out = jnp.zeros((b, h + 2, h + 2, c_in), jnp.float32)
    k = 0
    for ky in range(3):
        for kx in range(3):
            dpiece = _matmul(dy, wmat[k * c_in : (k + 1) * c_in].T).reshape(b, h, h, c_in)
            out = out + jnp.pad(dpiece, ((0, 0), (ky, 2 - ky), (kx, 2 - kx), (0, 0)))
            k += 1
    return out[:, 1 : 1 + h, 1 : 1 + h, :]


# --------------------------------------------------------------------------
# masked batch-norm forward/backward (f32 math)
# --------------------------------------------------------------------------


def _bn_fwd(y: jnp.ndarray, scale, bias, wcol: jnp.ndarray, count):
    """y: [R, C] f32; wcol: [R, 1] 0/1 row weights.  Returns (out, xhat, inv)."""
    mean = jnp.sum(y * wcol, axis=0, keepdims=True) / count
    var = jnp.sum(jnp.square(y - mean) * wcol, axis=0, keepdims=True) / count
    inv = jax.lax.rsqrt(var + _BN_EPS)
    xhat = (y - mean) * inv
    return xhat * scale + bias, xhat, inv


def _bn_bwd(dy: jnp.ndarray, xhat, inv, scale, wcol, count):
    """Masked-BN input gradient + (dscale, dbias).  Masked rows carry dy=0
    and receive dx=0 (they contribute to neither the statistics nor the
    loss)."""
    dscale = jnp.sum(dy * xhat, axis=0)
    dbias = jnp.sum(dy, axis=0)
    dxhat = dy * scale
    m1 = jnp.sum(dxhat * wcol, axis=0, keepdims=True) / count
    m2 = jnp.sum(dxhat * xhat * wcol, axis=0, keepdims=True) / count
    dx = (dxhat - m1 - xhat * m2) * inv * wcol
    return dx, dscale, dbias


# --------------------------------------------------------------------------
# one fused step: forward + hand-derived backward + torch-Adam
# --------------------------------------------------------------------------


def _f32(a):
    return a.astype(jnp.float32)


def _matmul(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _step_grads(p, xp, onehot, wbc, geom: BlockGeom):
    """Forward + backward of the final residual block on one minibatch.

    p: dict of f32 param VALUES (conv weights in im2col matrix form, BN
    affines as [1, C]).  xp: PRE-PADDED input [B, H+2, H+2, Ci] (compute
    dtype; H+2 must be sublane-aligned for the HBM DMA, e.g. 16 at the
    production geometry); ``onehot``: [B, C] f32 label one-hots; ``wbc``:
    [B, C] f32 validity mask broadcast across channels (tiny [B]/[B,1]
    vectors don't shape-cast on Mosaic, so masks and labels travel
    channel-wide).
    Returns (grads dict, loss).  Matches eval_engine's fast path:
    features-as-logits CE, masked batch-stats BN, bf16 conv outputs.
    """
    b, ho = geom.batch, geom.h_out
    r = geom.rows
    cd = xp.dtype
    wcol = jnp.broadcast_to(wbc[:, None, :], (b, ho * ho, geom.c_out)).reshape(r, geom.c_out)
    count = jnp.maximum(jnp.sum(wbc) / geom.c_out, 1e-6) * (ho * ho)

    # conv weights live in matrix (im2col) form: [9ci, co] / [9co, co] / [ci, co]
    w1 = p["conv1"].astype(cd)
    w2 = p["conv2"].astype(cd)
    wsc = p["conv_sc"].astype(cd)

    # ---- forward ----------------------------------------------------------
    a1 = _patches3x3(xp, geom.stride)  # 9 x [R, ci] cd
    y1 = _conv3x3_fwd(a1, w1, geom.c_in).astype(cd)  # conv output rounds to cd (ops/convpool)
    h1, xhat1, inv1 = _bn_fwd(_f32(y1), p["bn1_s"], p["bn1_b"], wcol, count)
    z1 = jnp.maximum(h1, 0.0)
    z1c = z1.astype(cd).reshape(b, ho, ho, geom.c_out)

    a2 = _patches3x3(jnp.pad(z1c, ((0, 0), (1, 1), (1, 1), (0, 0))), 1)  # 9 x [R, co]
    y2 = _conv3x3_fwd(a2, w2, geom.c_out).astype(cd)
    h2, xhat2, inv2 = _bn_fwd(_f32(y2), p["bn2_s"], p["bn2_b"], wcol, count)

    if geom.stride == 2:
        # x[::2, ::2] == odd rows/cols of the padded input (offset the pad)
        xs = _even_cols(_even_rows(xp, 0, 1, ho), 0, 1, ho).reshape(r, geom.c_in)
    else:
        xs = xp[:, 1 : 1 + geom.h_in, 1 : 1 + geom.h_in, :].reshape(r, geom.c_in)
    ys = _matmul(xs, wsc).astype(cd)
    hs, xhats, invs = _bn_fwd(_f32(ys), p["bnsc_s"], p["bnsc_b"], wcol, count)

    pre = h2 + hs
    out = jnp.maximum(pre, 0.0)  # [R, co]
    feats = jnp.mean(out.reshape(b, ho * ho, geom.c_out), axis=1).astype(cd)  # global avg pool

    # ---- loss: masked CE on features-as-logits ---------------------------
    logits = _f32(feats)
    zmax = jnp.max(logits, axis=1, keepdims=True)
    ez = jnp.exp(logits - zmax)
    lse = jnp.log(jnp.sum(ez, axis=1, keepdims=True)) + zmax
    denom = jnp.maximum(jnp.sum(wbc) / geom.c_out, 1.0)
    ce = (lse - jnp.sum(logits * onehot, axis=1, keepdims=True)) * wbc  # [B, co], channel-broadcast
    loss = jnp.sum(ce) / (denom * geom.c_out)

    # ---- backward ---------------------------------------------------------
    dlogits = (ez / jnp.sum(ez, axis=1, keepdims=True) - onehot) * (wbc / denom)  # [B, co]
    dout = jnp.broadcast_to(
        dlogits[:, None, :] / (ho * ho), (b, ho * ho, geom.c_out)
    ).reshape(r, geom.c_out)  # pool backward
    dpre = jnp.where(pre > 0.0, dout, 0.0)

    dy2, dg2, db2 = _bn_bwd(dpre, xhat2, inv2, p["bn2_s"], wcol, count)
    dys, dgs, dbs = _bn_bwd(dpre, xhats, invs, p["bnsc_s"], wcol, count)

    dy2c = dy2.astype(cd)
    dw2 = _conv3x3_dw(a2, dy2c, geom.c_out)  # [9co, co] f32
    dz1 = _conv3x3_dx_s1(dy2c, w2, b, ho, geom.c_out).reshape(r, geom.c_out)
    dh1 = jnp.where(h1 > 0.0, dz1, 0.0)
    dy1, dg1, db1 = _bn_bwd(dh1, xhat1, inv1, p["bn1_s"], wcol, count)
    dw1 = _conv3x3_dw(a1, dy1.astype(cd), geom.c_in)  # [9ci, co]
    dwsc = _matmul(xs.T, dys.astype(cd))  # [ci, co]

    grads = {
        "conv1": dw1,
        "bn1_s": dg1[None, :],
        "bn1_b": db1[None, :],
        "conv2": dw2,
        "bn2_s": dg2[None, :],
        "bn2_b": db2[None, :],
        "conv_sc": dwsc,
        "bnsc_s": dgs[None, :],
        "bnsc_b": dbs[None, :],
    }
    return grads, loss


def _adam_update(p, mu, nu, g, t, lr, b1=0.9, b2=0.999):
    """torch-Adam with bf16-stored state, f32 math (optimizers.torch_adam_lowmem)."""
    import math

    tf = t.astype(jnp.float32)
    # b**t as exp(t*log(b)) — Mosaic has no powf
    bc1 = 1.0 - jnp.exp(tf * math.log(b1))
    bc2 = 1.0 - jnp.exp(tf * math.log(b2))
    new_p, new_mu, new_nu = {}, {}, {}
    for k in p:
        gf = _f32(g[k])
        m = b1 * _f32(mu[k]) + (1.0 - b1) * gf
        v = b2 * _f32(nu[k]) + (1.0 - b2) * jnp.square(gf)
        new_mu[k] = m.astype(mu[k].dtype)
        new_nu[k] = v.astype(nu[k].dtype)
        mh = _f32(new_mu[k]) / bc1
        vh = _f32(new_nu[k]) / bc2
        upd = -lr * mh / (jnp.sqrt(vh) + _ADAM_EPS)
        new_p[k] = (_f32(p[k]) + upd).astype(p[k].dtype)
    return new_p, new_mu, new_nu


# --------------------------------------------------------------------------
# pure-XLA reference (tested against inner_fit's autodiff path)
# --------------------------------------------------------------------------

PKEYS = ("conv1", "bn1_s", "bn1_b", "conv2", "bn2_s", "bn2_b", "conv_sc", "bnsc_s", "bnsc_b")


def fused_inner_scan_xla(p0, fmap_bank, bank_y, idx, w, *, geom: BlockGeom, lr: float):
    """Reference implementation of the fused scan in plain JAX (same math,
    lax.scan over steps).  p0: flat dict (PKEYS); fmap_bank [span,H,H,Ci];
    idx/w: [T, B]."""
    mu0 = {k: jnp.zeros_like(v, dtype=jnp.bfloat16) for k, v in p0.items()}
    nu0 = {k: jnp.zeros_like(v, dtype=jnp.bfloat16) for k, v in p0.items()}

    fmap_padded = jnp.pad(fmap_bank, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def step(carry, sched):
        p, mu, nu, t = carry
        idx_t, w_t = sched
        x = fmap_padded[idx_t]
        onehot = jax.nn.one_hot(bank_y[idx_t], geom.c_out, dtype=jnp.float32)
        wbc = jnp.broadcast_to(w_t[:, None], (geom.batch, geom.c_out))
        pf = {k: _f32(v) for k, v in p.items()}
        g, _ = _step_grads(pf, x, onehot, wbc, geom)
        t = t + 1
        p, mu, nu = _adam_update(p, mu, nu, g, t, lr)
        return (p, mu, nu, t), None

    (p, _, _, _), _ = jax.lax.scan(step, (p0, mu0, nu0, jnp.zeros((), jnp.int32)), (idx, w))
    return p


# --------------------------------------------------------------------------
# the Pallas kernel: whole scan per lane, params resident in VMEM
# --------------------------------------------------------------------------


def _kernel(idx_ref, w_ref, y_ref, fmap_ref, *refs, geom: BlockGeom, lr: float, n_steps: int):
    lane = pl.program_id(0)
    pin = dict(zip(PKEYS, refs[: len(PKEYS)]))
    pout = dict(zip(PKEYS, refs[len(PKEYS) : 2 * len(PKEYS)]))
    scratch = refs[2 * len(PKEYS) :]
    # the aliased output refs ARE the resident parameter state (a separate
    # scratch copy would blow the 16 MB scoped-vmem budget); scratch holds
    # only the Adam moments + the DMA'd minibatch
    pS = pout
    muS = dict(zip(PKEYS, scratch[: len(PKEYS)]))
    nuS = dict(zip(PKEYS, scratch[len(PKEYS) : 2 * len(PKEYS)]))
    xbuf = scratch[2 * len(PKEYS)]
    sems = scratch[2 * len(PKEYS) + 1]

    for k in PKEYS:  # (re-)init resident state at every grid step (= lane)
        pS[k][...] = pin[k][...]
        muS[k][...] = jnp.zeros_like(muS[k])
        nuS[k][...] = jnp.zeros_like(nuS[k])

    b = geom.batch

    def body(t, _):
        # DMA the minibatch's B bank rows of this lane from HBM (the bank
        # never sits in VMEM: only ~0.5 MB/step of it is live)
        copies = [
            pltpu.make_async_copy(
                fmap_ref.at[lane, pl.ds(idx_ref[t, i], 1)], xbuf.at[pl.ds(i, 1)], sems.at[i]
            )
            for i in range(b)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        x = xbuf[...]  # [B, H+2, H+2, Ci]
        wbc = w_ref[pl.ds(t, 1)][0]  # [B, C] f32 (schedule masks are lane-invariant)
        onehot = y_ref[pl.ds(t, 1)][0]  # [B, C] f32
        p = {k: _f32(pS[k][...]) for k in PKEYS}
        g, _ = _step_grads(p, x, onehot, wbc, geom)
        mu = {k: muS[k][...] for k in PKEYS}
        nu = {k: nuS[k][...] for k in PKEYS}
        pc = {k: pS[k][...] for k in PKEYS}
        new_p, new_mu, new_nu = _adam_update(pc, mu, nu, g, t + 1, lr)
        for k in PKEYS:
            pS[k][...] = new_p[k]
            muS[k][...] = new_mu[k]
            nuS[k][...] = new_nu[k]
        return 0

    jax.lax.fori_loop(0, n_steps, body, 0)


def fused_inner_scan_lanes(
    p0, fmap_banks, bank_y, idx, w, *, geom: BlockGeom, lr: float, interpret: bool = False
):
    """Run the whole adaptation scan for L episode lanes in one Pallas call
    (grid over lanes; each grid step runs its lane's full T-step scan with
    parameters + Adam moments resident in VMEM).

    p0: flat dict (PKEYS) of [L, ...] arrays in the carry dtype (bf16 fast
    path or f32); fmap_banks: [L, span, H, H, Ci] (compute dtype; H+2 must
    be a multiple of the sublane tile, e.g. 14 -> 16, for the HBM row DMA);
    bank_y: [span] int32 (shared across lanes); idx: [L, T, B] per-lane
    minibatch schedules; w: [T, B] validity masks (lane-invariant by
    construction — inner_loop.minibatch_schedule's padding depends only on
    position).  Returns the adapted params ([L, ...], same dtype).
    """
    lanes, n_steps = idx.shape[0], idx.shape[1]
    # labels and masks travel channel-wide (tiny vectors don't shape-cast on
    # Mosaic): [*, T, B, C] f32
    onehot_steps = jax.nn.one_hot(bank_y[idx], geom.c_out, dtype=jnp.float32)  # [L, T, B, C]
    wbc_steps = jnp.broadcast_to(w[:, :, None], w.shape + (geom.c_out,)).astype(jnp.float32)
    # pre-pad spatially: the conv pad doubles as DMA tile alignment
    # (h_in + 2 = 16 at the production geometry)
    fmap_padded = jnp.pad(fmap_banks, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    pvals = [p0[k] for k in PKEYS]

    lane_spec = lambda shape, space: pl.BlockSpec(
        (None,) + shape, lambda l: (l,) + (0,) * len(shape), memory_space=space
    )
    out = pl.pallas_call(
        functools.partial(_kernel, geom=geom, lr=lr, n_steps=n_steps),
        grid=(lanes,),
        in_specs=[
            lane_spec(idx.shape[1:], pltpu.SMEM),  # idx (scalar reads drive the DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wbc [T, B, C] (shared)
            lane_spec(onehot_steps.shape[1:], pltpu.VMEM),  # one-hots
            pl.BlockSpec(memory_space=pl.ANY),  # fmap banks stay in HBM
        ]
        + [lane_spec(v.shape[1:], pltpu.VMEM) for v in pvals],
        out_specs=[lane_spec(v.shape[1:], pltpu.VMEM) for v in pvals],
        out_shape=[jax.ShapeDtypeStruct(v.shape, v.dtype) for v in pvals],
        # Adam moments stored bf16 (torch_adam_lowmem semantics, matching
        # fused_inner_scan_xla); params live in the aliased output refs
        scratch_shapes=[pltpu.VMEM(v.shape[1:], jnp.bfloat16) for v in pvals] * 2
        + [
            pltpu.VMEM((geom.batch, geom.h_in + 2, geom.h_in + 2, geom.c_in), fmap_banks.dtype),
            pltpu.SemaphoreType.DMA((geom.batch,)),
        ],
        # adapted params overwrite the inputs: halves the kernel's VMEM I/O
        # footprint (the 16 MB scoped-vmem stack cannot hold two copies)
        input_output_aliases={4 + i: i for i in range(len(PKEYS))},
        # resident state + f32 grad temporaries exceed the 16 MB default
        # scoped-vmem budget; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32), wbc_steps, onehot_steps, fmap_padded, *pvals)
    return dict(zip(PKEYS, out))


def fused_inner_scan(p0, fmap_bank, bank_y, idx, w, *, geom: BlockGeom, lr: float, interpret: bool = False):
    """Single-lane convenience wrapper around :func:`fused_inner_scan_lanes`."""
    p0L = {k: v[None] for k, v in p0.items()}
    out = fused_inner_scan_lanes(
        p0L, fmap_bank[None], bank_y, idx[None], w, geom=geom, lr=lr, interpret=interpret
    )
    return {k: v[0] for k, v in out.items()}


# --------------------------------------------------------------------------
# adapters between the backbone's block pytree and the flat PKEYS dict
# --------------------------------------------------------------------------


def block_to_flat(block: dict) -> dict:
    """Backbone block pytree -> flat kernel dict.  Conv weights flatten to
    im2col matrix form ([kh*kw*ci, co], free row-major reshape of HWIO); BN
    vectors become [1, C] (Mosaic prefers >=2-D)."""
    c1 = block["conv1"]
    c2 = block["conv2"]
    sc = block["conv_sc"]
    return {
        "conv1": c1.reshape(-1, c1.shape[-1]),
        "bn1_s": block["bn1"]["scale"][None, :],
        "bn1_b": block["bn1"]["bias"][None, :],
        "conv2": c2.reshape(-1, c2.shape[-1]),
        "bn2_s": block["bn2"]["scale"][None, :],
        "bn2_b": block["bn2"]["bias"][None, :],
        "conv_sc": sc.reshape(-1, sc.shape[-1]),
        "bnsc_s": block["bn_sc"]["scale"][None, :],
        "bnsc_b": block["bn_sc"]["bias"][None, :],
    }


def flat_to_block(flat: dict, geom: BlockGeom) -> dict:
    ci, co = geom.c_in, geom.c_out
    return {
        "conv1": flat["conv1"].reshape(3, 3, ci, co),
        "bn1": {"scale": flat["bn1_s"][0], "bias": flat["bn1_b"][0]},
        "conv2": flat["conv2"].reshape(3, 3, co, co),
        "bn2": {"scale": flat["bn2_s"][0], "bias": flat["bn2_b"][0]},
        "conv_sc": flat["conv_sc"].reshape(1, 1, ci, co),
        "bn_sc": {"scale": flat["bnsc_s"][0], "bias": flat["bnsc_b"][0]},
    }
