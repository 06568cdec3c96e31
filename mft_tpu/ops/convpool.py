"""Convolution and pooling wrappers (NHWC / HWIO — TPU-native layouts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """2-D convolution, square stride/padding, no bias.

    Accumulates in float32 on the MXU regardless of input dtype
    (``preferred_element_type``) and casts back to the input dtype.
    """
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMS,
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pooling matching ``nn.MaxPool2d(window, stride, padding)``."""
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, x.dtype)
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """``AvgPool2d(H) + Flatten`` for an ``[N, H, W, C]`` map -> ``[N, C]``.

    The reference applies AvgPool2d(7) to the exact 7x7 final map
    (backbone.py:428-430); a full spatial mean is identical.
    """
    return jnp.mean(x, axis=(1, 2))


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``x @ w + b`` with f32 MXU accumulation."""
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch ``F.leaky_relu`` default slope 0.01 (used by the GNN head)."""
    return jax.nn.leaky_relu(x, negative_slope)
