"""Episode abstraction.

The reference (johncai117/Meta-Fine-Tuning) passes episodes as tensors of
shape ``[n_way, n_support + n_query, 3, H, W]`` where the first ``n_support``
items of every class are the support set (reference: methods/meta_template.py:33-47,
n_query recomputed per batch at meta_template.py:63).

Here an episode is simply a JAX array in TPU-native NHWC layout:
``images[n_way, n_support + n_query, H, W, 3]`` plus a static
:class:`EpisodeSpec`.  Keeping the spec static (a NamedTuple of Python ints)
means every jitted program specializes on the episode geometry — XLA sees
fully static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class EpisodeSpec(NamedTuple):
    """Static episode geometry.

    Attributes:
      n_way:     number of classes per episode.
      n_support: labeled examples per class (the "shot").
      n_query:   query examples per class.
    """

    n_way: int
    n_support: int
    n_query: int

    @property
    def n_per_class(self) -> int:
        return self.n_support + self.n_query

    @property
    def support_size(self) -> int:
        return self.n_way * self.n_support

    @property
    def query_size(self) -> int:
        return self.n_way * self.n_query

    @property
    def total(self) -> int:
        return self.n_way * self.n_per_class


def support_labels(spec: EpisodeSpec, dtype=jnp.int32) -> jnp.ndarray:
    """``[n_way * n_support]`` labels: class c repeated n_support times.

    Mirrors ``np.repeat(range(n_way), n_support)`` used throughout the
    reference (e.g. finetune.py:82, methods/gnnnet.py:119).
    """
    return jnp.asarray(np.repeat(np.arange(spec.n_way), spec.n_support), dtype=dtype)


def query_labels(spec: EpisodeSpec, dtype=jnp.int32) -> jnp.ndarray:
    """``[n_way * n_query]`` labels (reference: meta_template.py:51)."""
    return jnp.asarray(np.repeat(np.arange(spec.n_way), spec.n_query), dtype=dtype)


def support_onehot_with_query_slot(spec: EpisodeSpec, dtype=jnp.float32) -> jnp.ndarray:
    """GNN node label features: ``[n_way * (n_support + 1), n_way]``.

    For every class: ``n_support`` one-hot rows followed by one all-zero row
    marking the query slot (reference: methods/gnnnet.py:35-38).
    """
    eye = np.eye(spec.n_way, dtype=np.float32)
    per_class = np.concatenate(
        [np.repeat(eye[:, None, :], spec.n_support, axis=1),
         np.zeros((spec.n_way, 1, spec.n_way), np.float32)],
        axis=1,
    )  # [n_way, n_support + 1, n_way]
    return jnp.asarray(per_class.reshape(-1, spec.n_way), dtype=dtype)


def split_support_query(x: jnp.ndarray, spec: EpisodeSpec):
    """Split an episode-major array ``[n_way, s+q, ...]`` into support/query."""
    return x[:, : spec.n_support], x[:, spec.n_support :]


def flatten_episode(x: jnp.ndarray) -> jnp.ndarray:
    """``[n_way, s+q, ...] -> [n_way * (s+q), ...]``."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
