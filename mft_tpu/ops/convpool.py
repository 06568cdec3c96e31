"""Convolution and pooling wrappers (NHWC / HWIO — TPU-native layouts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, padding: int = 0, compute_dtype=None
) -> jnp.ndarray:
    """2-D convolution, square stride/padding, no bias.

    ``compute_dtype`` (e.g. bfloat16) sets the MXU operand/activation dtype.
    float32 convs keep an explicit f32 ``preferred_element_type``; bf16 convs
    run the uniform-dtype fast path (the MXU still accumulates partial sums
    in f32 internally, rounding at the output — and a uniform dtype keeps
    the autodiff transpose rules happy).  BN re-upcasts to f32 for its
    statistics (ops/norm.py).
    """
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    out = lax.conv_general_dilated(
        x.astype(cd),
        w.astype(cd),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMS,
        preferred_element_type=cd if cd != jnp.float32 else jnp.float32,
    )
    return out


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """Max pooling matching ``nn.MaxPool2d(window, stride, padding)``."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        x.dtype.type(neg),
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """``AvgPool2d(H) + Flatten`` for an ``[N, H, W, C]`` map -> ``[N, C]``.

    The reference applies AvgPool2d(7) to the exact 7x7 final map
    (backbone.py:428-430); a full spatial mean is identical.  Accumulates in
    f32 (bf16-safe) and returns the input dtype.
    """
    return jnp.mean(x.astype(jnp.promote_types(x.dtype, jnp.float32)), axis=(1, 2)).astype(x.dtype)


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """``x @ w + b`` with f32 MXU accumulation."""
    y = jnp.dot(
        x, p["w"].astype(x.dtype), preferred_element_type=jnp.promote_types(x.dtype, jnp.float32)
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch ``F.leaky_relu`` default slope 0.01 (used by the GNN head)."""
    return jax.nn.leaky_relu(x, negative_slope)
