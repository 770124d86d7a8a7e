"""Golden tests for box decode / IoU / NMS against plain numpy references."""

import numpy as np
import jax.numpy as jnp

from facerecognition_infrenceengine_tpu.ops import (
    distance2bbox,
    distance2kps,
    pairwise_iou,
    nms_padded,
)
from facerecognition_infrenceengine_tpu.ops.anchors import anchor_centers, all_anchor_centers


def ref_iou(a, b, offset=0.0):
    x1 = np.maximum(a[0], b[0]); y1 = np.maximum(a[1], b[1])
    x2 = np.minimum(a[2], b[2]); y2 = np.minimum(a[3], b[3])
    inter = max(x2 - x1 + offset, 0) * max(y2 - y1 + offset, 0)
    ua = ((a[2] - a[0] + offset) * (a[3] - a[1] + offset)
          + (b[2] - b[0] + offset) * (b[3] - b[1] + offset) - inter)
    return inter / ua


def ref_greedy_nms(boxes, scores, thresh, offset=0.0):
    """Classic greedy NMS; offset=1.0 reproduces insightface's scrfd.py nms
    (the legacy (x2-x1+1) convention the reference runs)."""
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(scores), bool)
    for i in order:
        if sup[i] or scores[i] == -np.inf:
            continue
        keep.append(i)
        for j in order:
            if j != i and not sup[j] and ref_iou(boxes[i], boxes[j], offset) > thresh:
                if scores[j] <= scores[i]:
                    sup[j] = True
    return keep


def test_distance2bbox():
    centers = jnp.array([[10.0, 20.0], [100.0, 50.0]])
    dist = jnp.array([[1.0, 2.0, 3.0, 4.0], [10.0, 10.0, 10.0, 10.0]])
    out = np.asarray(distance2bbox(centers, dist))
    np.testing.assert_allclose(out[0], [9, 18, 13, 24])
    np.testing.assert_allclose(out[1], [90, 40, 110, 60])


def test_distance2kps():
    centers = jnp.array([[10.0, 20.0]])
    dist = jnp.array([[1.0, -1.0, 2.0, 2.0, 0.0, 0.0, -3.0, 1.0, 5.0, 5.0]])
    out = np.asarray(distance2kps(centers, dist))
    assert out.shape == (1, 5, 2)
    np.testing.assert_allclose(out[0, 0], [11, 19])
    np.testing.assert_allclose(out[0, 4], [15, 25])


def test_pairwise_iou_matches_numpy():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 100, (12, 2))
    wh = rng.uniform(5, 40, (12, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    got = np.asarray(pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(12):
        for j in range(12):
            assert abs(got[i, j] - ref_iou(boxes[i], boxes[j])) < 1e-5


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(1)
    n = 64
    xy = rng.uniform(0, 400, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    # pad to static K with -inf
    K = 128
    pb = np.zeros((K, 4), np.float32)
    ps = np.full(K, -np.inf, np.float32)
    pb[:n] = boxes
    ps[:n] = scores

    # default iou_offset=1.0 == insightface's legacy NMS convention
    ob, osc, oidx, valid = nms_padded(jnp.asarray(pb), jnp.asarray(ps), max_out=32, iou_thresh=0.4)
    got_idx = [int(i) for i, v in zip(np.asarray(oidx), np.asarray(valid)) if v]
    want_idx = ref_greedy_nms(boxes, scores, 0.4, offset=1.0)[:32]
    assert got_idx == want_idx

    ob, osc, oidx, valid = nms_padded(jnp.asarray(pb), jnp.asarray(ps),
                                      max_out=32, iou_thresh=0.4, iou_offset=0.0)
    got_idx = [int(i) for i, v in zip(np.asarray(oidx), np.asarray(valid)) if v]
    assert got_idx == ref_greedy_nms(boxes, scores, 0.4, offset=0.0)[:32]


def test_anchor_centers_layout():
    c = anchor_centers(640, 640, 32, num_anchors=2)
    assert c.shape == (20 * 20 * 2, 2)
    # first two rows are the duplicated (0,0) anchor; next pair is (32, 0)
    np.testing.assert_allclose(c[0], [0, 0])
    np.testing.assert_allclose(c[1], [0, 0])
    np.testing.assert_allclose(c[2], [32, 0])
    total = all_anchor_centers(640, 640)
    assert total.shape[0] == (80 * 80 + 40 * 40 + 20 * 20) * 2
