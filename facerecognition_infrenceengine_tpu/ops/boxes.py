"""Box/keypoint decode and IoU — pure jnp, fully batched.

Decode conventions follow the public SCRFD head the reference runs through
ONNX (reference infrenceServer.py:412-416 instantiates buffalo_l's det_10g):
regression targets are *distances from the anchor center* in units of the
stride; callers pre-multiply by stride.
"""

from __future__ import annotations

import jax.numpy as jnp


def distance2bbox(centers: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """Centers [N,2] + distances [..., N, 4] (l,t,r,b) -> boxes [..., N, 4] xyxy."""
    x1 = centers[..., 0] - distances[..., 0]
    y1 = centers[..., 1] - distances[..., 1]
    x2 = centers[..., 0] + distances[..., 2]
    y2 = centers[..., 1] + distances[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2kps(centers: jnp.ndarray, distances: jnp.ndarray) -> jnp.ndarray:
    """Centers [N,2] + offsets [..., N, 2K] -> keypoints [..., N, K, 2]."""
    k = distances.shape[-1] // 2
    d = distances.reshape(*distances.shape[:-1], k, 2)
    return d + centers[..., None, :]


def box_area(boxes: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + offset, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + offset, 0.0)
    return w * h


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    """IoU matrix [N, M] for xyxy boxes a [N,4], b [M,4].

    ``offset=1.0`` is the legacy integer-pixel convention insightface's
    SCRFD NMS uses ((x2-x1+1)*(y2-y1+1)) — for small faces the ~1/size IoU
    delta can flip a suppression decision near the threshold, so detection
    NMS must use it for decision-exact parity with the reference.
    """
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a, offset)[:, None] + box_area(b, offset)[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)
