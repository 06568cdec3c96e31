"""Parameter initializers matching the reference's init semantics.

* Trunk convs use the "fan-in" normal init of reference backbone.py:9-16:
  ``std = sqrt(2 / (kh * kw * out_channels))`` (the reference computes the fan
  from the *output* channel count), BN scale=1 / bias=0.
* Linear layers and the GNN's 1x1 convs are constructed with torch defaults
  (``kaiming_uniform_(a=sqrt(5))`` which reduces to U(-1/sqrt(fan_in),
  1/sqrt(fan_in)) for both weight and bias) — reproduced here so that
  freshly-initialized heads (e.g. the throwaway eval classifiers in reference
  finetune.py:66,204) have the same statistics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def conv_fanin_normal(key, kh: int, kw: int, cin: int, cout: int, dtype=jnp.float32):
    """Reference trunk-conv init (backbone.py:11-13). HWIO layout."""
    n = kh * kw * cout
    std = math.sqrt(2.0 / float(n))
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * jnp.asarray(std, dtype)


def torch_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32, bias: bool = True):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Returns ``{"w": [fan_in, fan_out], "b": [fan_out]}`` (w stored transposed
    relative to torch so that ``x @ w`` is the forward).
    """
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    kw_, kb_ = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_, (fan_in, fan_out), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb_, (fan_out,), dtype, -bound, bound)
    return p


def torch_conv1x1(key, cin: int, cout: int, dtype=jnp.float32, bias: bool = True):
    """torch.nn.Conv2d(k=1) default init; stored as a [cin, cout] matrix.

    A 1x1 conv over an [..., cin] tensor is exactly a matmul on the last dim;
    the GNN adjacency MLP (reference methods/gnn.py:64-75) only uses 1x1
    convs, so we store them in MXU-friendly matrix form.
    """
    return torch_linear(key, cin, cout, dtype=dtype, bias=bias)


def bn_params(c: int, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def bn_stats(c: int, dtype=jnp.float32):
    return {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
