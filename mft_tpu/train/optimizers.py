"""Optimizers with torch-exact update semantics.

The reference relies on torch optimizer details in its inner loops — Adam
with L2-coupled weight decay on the classifier (finetune.py:109,240), and SGD
with momentum=0.9 *and dampening=0.9* for the linear probes
(meta_template.py:166).  Accuracy parity requires reproducing those exact
recursions, so they are implemented here as optax transforms rather than
approximated with optax's stock aliases.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, mu_dtype=None):
    """torch.optim.Adam: L2 weight decay is added to the gradient *before*
    the moment updates (unlike AdamW).  ``mu_dtype`` (e.g. bfloat16) halves
    the first-moment HBM traffic of per-episode inner loops."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def torch_adam_lowmem(
    lr: float,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
):
    """torch-Adam semantics with both moments *stored* in a narrow dtype.

    Per-step math runs in f32; only the carried state rounds.  bfloat16
    (default) halves the optimizer HBM traffic of the per-episode inner
    scans (measured on v5e: 108 -> 93 ms/episode for the headline eval,
    with bitwise-identical predictions to f32 state on validation
    episodes).  ``state_dtype=jnp.float8_e4m3fn`` quarters it; the second
    moment additionally carries a log2 pre-scale so the squared-gradient
    magnitudes (~1e-8..1e-2) stay inside fp8's dynamic range.
    """
    is_fp8 = jnp.dtype(state_dtype).itemsize == 1
    #: fp8-e4m3 spans ~2^-9..2^8 with 3 mantissa bits; squared grads live
    #: around 1e-6, so pre-scale nu by 2^16 before rounding.
    nu_scale = 65536.0 if is_fp8 else 1.0

    def init(params):
        z = lambda p: jnp.zeros_like(p, dtype=state_dtype)
        return {"mu": jax.tree.map(z, params), "nu": jax.tree.map(z, params), "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        if weight_decay:
            assert params is not None
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        t = state["t"] + 1
        mu = jax.tree.map(
            lambda m, g: (b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32)).astype(state_dtype),
            state["mu"], grads,
        )
        nu = jax.tree.map(
            lambda v, g: (
                b2 * v.astype(jnp.float32) + (1 - b2) * nu_scale * jnp.square(g.astype(jnp.float32))
            ).astype(state_dtype),
            state["nu"], grads,
        )
        tf = t.astype(jnp.float32)

        def upd(m, v, p):
            mh = m.astype(jnp.float32) / (1.0 - b1**tf)
            vh = v.astype(jnp.float32) / (nu_scale * (1.0 - b2**tf))
            return (-lr * mh / (jnp.sqrt(vh) + eps)).astype(p.dtype)

        updates = jax.tree.map(upd, mu, nu, grads)
        return updates, {"mu": mu, "nu": nu, "t": t}

    return optax.GradientTransformation(init, update)


class TorchSGDState(NamedTuple):
    momentum: optax.Updates
    initialized: jnp.ndarray  # scalar bool: first step uses buf = grad


def torch_sgd(lr: float, momentum: float = 0.0, dampening: float = 0.0, weight_decay: float = 0.0):
    """torch.optim.SGD semantics:

      g   <- grad + wd * param
      buf <- g                         on the first step
      buf <- mu * buf + (1 - damp) * g afterwards
      p   <- p - lr * buf
    """

    def init(params):
        return TorchSGDState(jax.tree.map(jnp.zeros_like, params), jnp.asarray(False))

    def update(grads, state, params=None):
        if weight_decay:
            assert params is not None
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        if momentum == 0.0:
            return jax.tree.map(lambda g: -lr * g, grads), state

        def upd(buf, g):
            warm = momentum * buf + (1.0 - dampening) * g
            return jnp.where(state.initialized, warm, g)

        buf = jax.tree.map(upd, state.momentum, grads)
        updates = jax.tree.map(lambda b: -lr * b, buf)
        return updates, TorchSGDState(buf, jnp.asarray(True))

    return optax.GradientTransformation(init, update)


def reference_probe_sgd(lr: float = 0.01):
    """The linear-probe optimizer of meta_template.py:166 /
    baselinefinetune.py: SGD(lr=0.01, momentum=0.9, dampening=0.9, wd=0.001)."""
    return torch_sgd(lr, momentum=0.9, dampening=0.9, weight_decay=0.001)


def grouped(transforms: dict, labels):
    """Per-subtree optimizers (reference's separate delta_opt/classifier_opt,
    finetune.py:109,124).  ``labels`` is a pytree (or prefix) of group names."""
    return optax.multi_transform(transforms, labels)


def freeze_masked(tx, trainable_mask):
    """``tx`` where ``trainable_mask`` is True, zero updates where False —
    the functional equivalent of torch's ``requires_grad=False`` exclusion
    from the optimizer (reference backbone.py:324-325 pins the FWT
    noise-strength params; train.py:27 then builds Adam over
    ``model.parameters()``, which still skips them because autograd never
    populates their ``.grad``)."""
    labels = jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
