"""Pure-NumPy float64 oracles for numeric parity tests.

These re-derive the reference math (conv/BN/pool of backbone.py, the GNN ops
of methods/gnn.py) from first principles in NumPy so that mft_tpu's XLA
programs can be verified independently.  (torch is present in the image but
its CPU ops are pathologically slow in this container, so NumPy it is.)
"""

from __future__ import annotations

import numpy as np


def conv2d(x, w, stride=1, pad=0):
    """NHWC x HWIO -> NHWC, float64 accumulate."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    N, H, W, C = x.shape
    kh, kw, _, O = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Ho = (H + 2 * pad - kh) // stride + 1
    Wo = (W + 2 * pad - kw) // stride + 1
    cols = np.empty((N, Ho, Wo, kh, kw, C))
    for di in range(kh):
        for dj in range(kw):
            cols[:, :, :, di, dj, :] = xp[:, di : di + Ho * stride : stride, dj : dj + Wo * stride : stride, :]
    return cols.reshape(N, Ho, Wo, kh * kw * C) @ w.reshape(kh * kw * C, O)


def batch_norm(x, scale, bias, mean=None, var=None, eps=1e-5):
    """Batch-stats BN over all axes but the last, biased variance (torch
    train-mode semantics); pass mean/var for eval-mode normalization."""
    x = np.asarray(x, np.float64)
    axes = tuple(range(x.ndim - 1))
    if mean is None:
        mean = x.mean(axis=axes)
        var = x.var(axis=axes)
    return (x - mean) / np.sqrt(np.asarray(var, np.float64) + eps) * np.asarray(scale, np.float64) + np.asarray(
        bias, np.float64
    )


def max_pool(x, window=3, stride=2, pad=1):
    x = np.asarray(x, np.float64)
    N, H, W, C = x.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), constant_values=-np.inf)
    Ho = (H + 2 * pad - window) // stride + 1
    Wo = (W + 2 * pad - window) // stride + 1
    out = np.full((N, Ho, Wo, C), -np.inf)
    for di in range(window):
        for dj in range(window):
            out = np.maximum(out, xp[:, di : di + Ho * stride : stride, dj : dj + Wo * stride : stride, :])
    return out


def relu(x):
    return np.maximum(x, 0.0)


def leaky_relu(x, slope=0.01):
    x = np.asarray(x, np.float64)
    return np.where(x >= 0, x, slope * x)


def softmax(x, axis=-1):
    x = np.asarray(x, np.float64)
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def linear(x, p):
    y = np.asarray(x, np.float64) @ np.asarray(p["w"], np.float64)
    if "b" in p:
        y = y + np.asarray(p["b"], np.float64)
    return y


def resnet_block(p, x, half_res):
    stride = 2 if half_res else 1
    out = conv2d(x, p["conv1"], stride=stride, pad=1)
    out = relu(batch_norm(out, p["bn1"]["scale"], p["bn1"]["bias"]))
    out = conv2d(out, p["conv2"], stride=1, pad=1)
    out = batch_norm(out, p["bn2"]["scale"], p["bn2"]["bias"])
    if "conv_sc" in p:
        short = batch_norm(conv2d(x, p["conv_sc"], stride=stride, pad=0), p["bn_sc"]["scale"], p["bn_sc"]["bias"])
    else:
        short = x
    return relu(out + short)


def bottleneck_block(p, x, half_res):
    """BottleneckBlock (reference backbone.py:264-311): 1x1 -> 3x3(stride,
    bias) -> 1x1, BN after each, conv-only shortcut, relu after add."""
    stride = 2 if half_res else 1
    out = relu(batch_norm(conv2d(x, p["conv1"], stride=1, pad=0), p["bn1"]["scale"], p["bn1"]["bias"]))
    out = conv2d(out, p["conv2"], stride=stride, pad=1) + np.asarray(p["conv2_b"], np.float64)
    out = relu(batch_norm(out, p["bn2"]["scale"], p["bn2"]["bias"]))
    out = batch_norm(conv2d(out, p["conv3"], stride=1, pad=0), p["bn3"]["scale"], p["bn3"]["bias"])
    short = conv2d(x, p["conv_sc"], stride=stride, pad=0) if "conv_sc" in p else x
    return relu(out + short)


# -- GNN head oracles (reference methods/gnn.py semantics) ------------------


def wcompute(p, x):
    """x: [B,N,F] -> [B,N,N,2] (identity op, masked row-softmax adjacency)."""
    x = np.asarray(x, np.float64)
    h = np.abs(x[:, :, None, :] - x[:, None, :, :])
    for i in range(1, 5):
        h = leaky_relu(batch_norm(linear(h, p[f"conv{i}"]), p[f"bn{i}"]["scale"], p[f"bn{i}"]["bias"]))
    w = linear(h, p["conv_last"])[..., 0]
    n = x.shape[1]
    eye = np.eye(n)
    w = softmax(w - eye * 1e8, axis=2)
    return np.stack([np.broadcast_to(eye, w.shape), w], axis=-1)


def gconv(p, w_ops, x, bn=True):
    x = np.asarray(x, np.float64)
    ys = [np.einsum("bij,bjf->bif", w_ops[..., k], x) for k in range(w_ops.shape[-1])]
    h = linear(np.concatenate(ys, axis=-1), p["fc"])
    if bn:
        b, n, f = h.shape
        h = batch_norm(h.reshape(b * n, f), p["bn"]["scale"], p["bn"]["bias"]).reshape(b, n, f)
    return h


def gnn(p, nodes):
    x = np.asarray(nodes, np.float64)
    for layer in p["layers"]:
        w_ops = wcompute(layer["w"], x)
        x = np.concatenate([x, leaky_relu(gconv(layer["l"], w_ops, x))], axis=2)
    return gconv(p["l_last"], wcompute(p["w_last"], x), x, bn=False)


def resnet(params, x, stage_sizes, flatten=True):
    """Train-mode (batch-stats) reference forward of the SimpleBlock ResNet
    (reference backbone.py:216-261, 401-439)."""
    x = conv2d(x, params["stem_conv"], stride=2, pad=3)
    x = relu(batch_norm(x, params["stem_bn"]["scale"], params["stem_bn"]["bias"]))
    x = max_pool(x, 3, 2, 1)
    for i, n in enumerate(stage_sizes):
        for j in range(n):
            x = resnet_block(params["stages"][i][j], x, (i >= 1) and (j == 0))
    if flatten:
        x = x.mean(axis=(1, 2))
    return x
