"""Cosine-similarity gallery matching (single-device primitives).

The reference computes ``np.dot(emb1, emb2)`` per (face, identity) pair in a
Python loop (reference infrenceServer.py:538-542, peopleCount.py:869-873).
Here matching is one MXU matmul over the whole gallery, plus ``lax.top_k``.
The sharded multi-chip version lives in ``parallel/topk.py``; enrollment's
company-wide duplicate scan (reference trainingServer.py:170-200, an
O(company) GridFS read loop) becomes a single call to these too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Safe L2 normalization (the reference normalizes on load,
    infrenceServer.py:269-273, and re-normalizes detector outputs,
    infrenceServer.py:532 — both collapse to this)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_scores(queries: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """[B, D] x [N, D] -> [B, N] cosine scores (inputs assumed normalized)."""
    return jax.lax.dot_general(
        queries,
        gallery,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(queries: jnp.ndarray, gallery: jnp.ndarray, valid: jnp.ndarray, k: int = 1):
    """Top-k matches on one device.

    Args:
      queries: [B, D] normalized.
      gallery: [N, D] normalized (padded rows allowed).
      valid:   [N] bool, False marks padding.

    Returns (scores [B, k], indices [B, k]).
    """
    scores = cosine_scores(queries, gallery)
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)
