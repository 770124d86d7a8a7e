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


@functools.partial(jax.jit, static_argnames=("max_out", "iou_thresh", "iou_offset"))
def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    max_out: int = 32,
    iou_thresh: float = 0.4,
    iou_offset: float = 1.0,
):
    """Greedy NMS over K padded candidates.

    Args:
      boxes:  [K, 4] xyxy, sorted is NOT required (we sort internally).
      scores: [K] with -inf (or very negative) for padding.
      max_out: fixed number of output slots.
      iou_thresh: suppression threshold (reference uses 0.4 via insightface).
      iou_offset: box-extent offset; default 1.0 = insightface's legacy
        integer-pixel IoU ((x2-x1+1)*(y2-y1+1)), required for suppression
        decisions identical to the reference's det_10g NMS.

    Returns (boxes [max_out,4], scores [max_out], keep_idx [max_out] int32
    into the *input* order, valid [max_out] bool).
    """
    k = scores.shape[0]
    iou = pairwise_iou(boxes, boxes, offset=iou_offset)

    # Greedy pick-max-then-suppress: only max_out sequential steps (vs K for
    # the classic per-candidate loop) — the big win since K >> max_out and
    # each step is a cheap argmax + one IoU row.
    def body(_, state):
        live, picks, pick_scores, n = state
        i = jnp.argmax(live)
        s = live[i]
        ok = s > -jnp.inf
        row = jax.lax.dynamic_slice(iou, (i, 0), (1, k))[0]
        suppress = (row > iou_thresh) | (jnp.arange(k) == i)
        live = jnp.where(ok & suppress, -jnp.inf, live)
        picks = picks.at[n].set(jnp.where(ok, i, -1))
        pick_scores = pick_scores.at[n].set(jnp.where(ok, s, -jnp.inf))
        return live, picks, pick_scores, n + jnp.where(ok, 1, 0)

    init = (
        scores,
        jnp.full(max_out, -1, jnp.int32),
        jnp.full(max_out, -jnp.inf, scores.dtype),
        jnp.int32(0),
    )
    _, picks, pick_scores, _ = jax.lax.fori_loop(0, max_out, body, init)

    valid = pick_scores > -jnp.inf
    safe = jnp.maximum(picks, 0)
    out_boxes = jnp.where(valid[:, None], boxes[safe], 0.0)
    out_scores = jnp.where(valid, pick_scores, 0.0)
    return out_boxes, out_scores, safe.astype(jnp.int32), valid
