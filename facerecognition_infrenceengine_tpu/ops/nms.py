"""Static-shape NMS for XLA.

The reference's NMS runs inside insightface's ONNX detector (CPU loop).  On
TPU, dynamic output shapes would force host round-trips, so this NMS is the
padded/masked formulation: scores for invalid candidates are -inf, greedy
suppression runs over a fixed K candidates via ``lax.fori_loop`` on a
precomputed IoU matrix, and the result is a fixed ``max_out`` slots + a
validity mask.  Decisions are identical to classic greedy NMS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou


@functools.partial(jax.jit, static_argnames=("max_out", "iou_thresh"))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    max_out: int = 32,
    iou_thresh: float = 0.4,
):
    """Greedy NMS over K padded candidates.

    Args:
      boxes:  [K, 4] xyxy, sorted is NOT required (we sort internally).
      scores: [K] with -inf (or very negative) for padding.
      max_out: fixed number of output slots.
      iou_thresh: suppression threshold (reference uses 0.4 via insightface).

    Returns (boxes [max_out,4], scores [max_out], keep_idx [max_out] int32
    into the *input* order, valid [max_out] bool).
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)  # descending
    boxes_s = boxes[order]
    scores_s = scores[order]

    iou = pairwise_iou(boxes_s, boxes_s)

    def body(i, keep):
        # Suppress every j > i overlapping a kept i.
        row = iou[i]
        suppress = (row > iou_thresh) & keep[i] & (jnp.arange(k) > i)
        return keep & ~suppress

    keep0 = scores_s > -jnp.inf
    keep = jax.lax.fori_loop(0, k, body, keep0)

    # Select first max_out kept entries, preserving score order.
    kept_scores = jnp.where(keep, scores_s, -jnp.inf)
    sel_vals, sel_pos = jax.lax.top_k(kept_scores, max_out)
    out_boxes = boxes_s[sel_pos]
    out_scores = sel_vals
    out_idx = order[sel_pos].astype(jnp.int32)
    valid = sel_vals > -jnp.inf
    out_boxes = jnp.where(valid[:, None], out_boxes, 0.0)
    out_scores = jnp.where(valid, out_scores, 0.0)
    return out_boxes, out_scores, out_idx, valid
