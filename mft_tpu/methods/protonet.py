"""Prototypical networks (capability parity with reference methods/protonet.py).

Class prototypes are support-embedding means; scores are negative squared
Euclidean distances (reference protonet.py:30-39, 174-185).  Pure functions —
the FO-MAML "meta fine-tuning" variant (protonet.py:66-163) is composed from
these + the shared inner-loop engine in ``mft_tpu.train.inner_loop``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from mft_tpu.core.episode import EpisodeSpec, query_labels


def proto_scores(z_support: jnp.ndarray, z_query: jnp.ndarray, spec: EpisodeSpec) -> jnp.ndarray:
    """z_support: [n_way, n_support, F]; z_query: [n_way, n_query, F]
    -> scores [n_way * n_query, n_way] = -||q - proto||^2."""
    protos = jnp.mean(z_support, axis=1)  # [n_way, F]
    q = z_query.reshape(spec.n_way * spec.n_query, -1)
    # -||q-p||^2, expanded for one MXU matmul instead of an O(N*M*F) broadcast
    q2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    p2 = jnp.sum(jnp.square(protos), axis=1)[None, :]
    qp = jnp.dot(q, protos.T, preferred_element_type=jnp.promote_types(q.dtype, jnp.float32)).astype(q.dtype)
    return -(q2 + p2 - 2.0 * qp)


def protonet_loss(scores: jnp.ndarray, spec: EpisodeSpec) -> jnp.ndarray:
    """CE vs y_query = repeat(range(n_way), n_query) (reference protonet.py:42-48)."""
    y = query_labels(spec)
    return optax.softmax_cross_entropy_with_integer_labels(scores, y).mean()
