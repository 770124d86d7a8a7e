"""Anchor-center generation for the SCRFD-style detector.

The reference delegates this to insightface's ONNX SCRFD (det_10g) runtime
(reference infrenceServer.py:412-416); the decode convention is the public
SCRFD one: per FPN stride ``s`` a (H/s, W/s) grid of centers at ``(x*s, y*s)``
replicated ``num_anchors`` times, matched row-for-row with flattened head
outputs.  All shapes are static, so the whole decode stays inside one jitted
program.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def anchor_centers(height: int, width: int, stride: int, num_anchors: int = 2) -> np.ndarray:
    """[H/s * W/s * num_anchors, 2] float32 (x, y) centers in input pixels.

    Row order matches the flattened head output: row-major over (y, x), each
    center repeated ``num_anchors`` times consecutively — the insightface
    SCRFD convention, so converted weights decode identically.
    """
    hs, ws = height // stride, width // stride
    xs, ys = np.meshgrid(np.arange(ws), np.arange(hs))
    centers = np.stack([xs, ys], axis=-1).astype(np.float32) * stride  # [hs, ws, 2]
    centers = centers.reshape(-1, 2)
    if num_anchors > 1:
        centers = np.repeat(centers, num_anchors, axis=0)
    return centers


def all_anchor_centers(height: int, width: int, strides=(8, 16, 32), num_anchors: int = 2) -> jnp.ndarray:
    """Concatenated centers across strides, as a device constant."""
    parts = [anchor_centers(height, width, s, num_anchors) for s in strides]
    return jnp.asarray(np.concatenate(parts, axis=0))
