"""Baseline method: supervised pretraining + eval-time linear probing.

Capability parity with reference methods/baselinetrain.py (backbone +
``nn.Linear(feat_dim, num_class)`` CE classifier) and
methods/baselinefinetune.py / meta_template.py:153-186 (frozen-feature
linear probe: fresh Linear(feat_dim, n_way), SGD lr=0.01 momentum=0.9
dampening=0.9 wd=0.001, 100 epochs x minibatches of 4 over the support set).

The probe's optimization loop lives in ``mft_tpu.train.inner_loop`` as a
jitted ``lax.scan``; this module only defines parameters and objectives.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from mft_tpu.ops.convpool import linear
from mft_tpu.ops.initializers import torch_linear


def init_classifier(key, feat_dim: int, num_classes: int, dtype=jnp.float32, zero_bias: bool = True):
    """Linear CE head.  The pretraining head zeroes its bias
    (reference baselinetrain.py:17)."""
    p = torch_linear(key, feat_dim, num_classes, dtype)
    if zero_bias:
        p["b"] = jnp.zeros_like(p["b"])
    return p


def classifier_logits(p, feats: jnp.ndarray) -> jnp.ndarray:
    return linear(feats, p)


def ce_loss(logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean CE; optional per-example weights implement the reference's
    variable-size last minibatch under static shapes."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is None:
        return ce.mean()
    return jnp.sum(ce * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def top1_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
