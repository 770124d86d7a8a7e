#!/usr/bin/env python
"""Numeric parity harness: this framework vs the reference ONNX models.

BASELINE.md north star: embeddings within 1e-3 cosine of the reference's
buffalo_l outputs and identical match decisions.  This harness runs both
stacks on the same inputs and reports divergence:

  1. ArcFace: random (or provided) 112x112 crops -> cosine(flax, onnxruntime)
  2. SCRFD: detection boxes/landmarks IoU + landmark RMS on the same frames
  3. Match decisions: top-1 identity + threshold pass/fail agreement over a
     synthetic gallery
  4. Attributes: gender agreement / age delta / 106-landmark RMS between
     models/onnx_exec.py (the exact graph, jitted) and onnxruntime

Requires onnxruntime + the buffalo_l pack + converted .npz weights
(tools/convert_onnx.py).  Neither is present in the build image — the tool
degrades to a clear message instead of failing cryptically.

Usage:
  python tools/parity_check.py --pack ~/.insightface/models/buffalo_l [--images DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ort_session(path: str):
    try:
        import onnxruntime as ort
    except ImportError as e:
        raise SystemExit(f"onnxruntime is required for the parity check ({e})")
    return ort.InferenceSession(path, providers=["CPUExecutionProvider"])


def check_arcface(pack: str, n: int = 32, images=None) -> float:
    import jax.numpy as jnp

    from facerecognition_infrenceengine_tpu.models import arcface
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

    sess = _ort_session(os.path.join(pack, "w600k_r50.onnx"))
    input_name = sess.get_inputs()[0].name

    if images is None:
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (n, 112, 112, 3), dtype=np.uint8)

    model = arcface.iresnet50()
    variables = load_or_init("arcface_r50", model,
                             jnp.zeros((1, 112, 112, 3), jnp.float32))

    ours = np.asarray(l2_normalize(
        model.apply(variables, arcface.preprocess(jnp.asarray(images)))))

    # ONNX model takes NCHW, (x-127.5)/127.5, RGB (insightface arcface).
    x = (images.astype(np.float32) - 127.5) / 127.5
    theirs = sess.run(None, {input_name: np.transpose(x, (0, 3, 1, 2))})[0]
    theirs = theirs / np.linalg.norm(theirs, axis=1, keepdims=True)

    cos = np.sum(ours * theirs, axis=1)
    worst = float(1.0 - cos.min())
    print(f"arcface: worst cosine divergence {worst:.2e} over {len(images)} crops "
          f"({'PASS' if worst <= 1e-3 else 'FAIL'} vs 1e-3 budget)")
    return worst


def _np_nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> list:
    """insightface's greedy NMS (scrfd.py nms), reference decode side."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= iou_thresh]
    return keep


def scrfd_reference_decode(outs: list, h: int, w: int, det_thresh: float,
                           iou_thresh: float):
    """insightface scrfd.py's decode, verbatim in numpy: per-stride anchor
    centers at (x*s, y*s) repeated 2x, distances * stride, threshold, then
    legacy (+1) greedy NMS.  ``outs`` = the 9 det_10g outputs
    (score_8/16/32, bbox_8/16/32, kps_8/16/32), scores already sigmoided.
    Shared with tests/test_scrfd_census.py's decode-equivalence test."""
    strides = (8, 16, 32)
    fmc = len(strides)
    boxes_l, scores_l, kps_l = [], [], []
    for idx, stride in enumerate(strides):
        scores = np.asarray(outs[idx]).reshape(-1)
        bbox = np.asarray(outs[idx + fmc]).reshape(-1, 4) * stride
        kps = np.asarray(outs[idx + 2 * fmc]).reshape(-1, 10) * stride
        hs, ws = h // stride, w // stride
        xs, ys = np.meshgrid(np.arange(ws), np.arange(hs))
        centers = np.stack([xs, ys], -1).astype(np.float32).reshape(-1, 2) * stride
        centers = np.repeat(centers, 2, axis=0)
        pos = scores >= det_thresh
        b = np.stack([centers[pos, 0] - bbox[pos, 0],
                      centers[pos, 1] - bbox[pos, 1],
                      centers[pos, 0] + bbox[pos, 2],
                      centers[pos, 1] + bbox[pos, 3]], -1)
        k = centers[pos, None, :] + kps[pos].reshape(-1, 5, 2)
        boxes_l.append(b)
        scores_l.append(scores[pos])
        kps_l.append(k)
    boxes = np.concatenate(boxes_l)
    scores = np.concatenate(scores_l)
    kps = np.concatenate(kps_l)
    keep = _np_nms(boxes, scores, iou_thresh)
    return boxes[keep], scores[keep], kps[keep]


def _ort_scrfd_detect(sess, canvas_rgb: np.ndarray, det_thresh: float,
                      iou_thresh: float):
    """Reference-side det_10g decode: ORT forward + scrfd_reference_decode."""
    h, w = canvas_rgb.shape[:2]
    blob = (canvas_rgb.astype(np.float32) - 127.5) / 128.0
    blob = np.transpose(blob, (2, 0, 1))[None]
    outs = sess.run(None, {sess.get_inputs()[0].name: blob})
    return scrfd_reference_decode(outs, h, w, det_thresh, iou_thresh)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def check_scrfd(pack: str, frames=None, det_thresh: float = 0.3,
                iou_thresh: float = 0.4) -> float:
    """Detection parity: boxes IoU + landmark RMS + count agreement.

    Runs det_10g.onnx (reference decode, insightface conventions) and this
    framework's jitted detect program on identical 640x640 canvases.
    Random-noise frames typically contain zero faces with real weights —
    pass --images with real frames for a meaningful check."""
    import jax.numpy as jnp  # noqa: F401  (pulls jax config before engine)

    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine
    from facerecognition_infrenceengine_tpu.models.zoo import letterbox

    sess = _ort_session(os.path.join(pack, "det_10g.onnx"))
    if frames is None:
        rng = np.random.default_rng(2)
        frames = [rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
                  for _ in range(4)]
        print("scrfd: WARNING random frames — expect zero faces; pass "
              "--images for a meaningful detection-parity check")

    cfg = EngineConfig(det_size=(640, 640), max_faces=64, pre_nms_topk=512,
                       dtype="float32", nms_iou=iou_thresh)
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50")

    worst_iou, worst_rms, mismatches, matched = 1.0, 0.0, 0, 0
    for frame in frames:
        canvas, _scale = letterbox(frame, (640, 640))
        ref_boxes, _ref_scores, ref_kps = _ort_scrfd_detect(
            sess, canvas, det_thresh, iou_thresh)
        det = engine.detect(canvas[None], det_threshold=det_thresh)
        ours_boxes = det.boxes[0][det.valid[0]]
        ours_kps = det.kps[0][det.valid[0]]
        if len(ref_boxes) == 0 and len(ours_boxes) == 0:
            continue
        if len(ref_boxes) != len(ours_boxes):
            mismatches += abs(len(ref_boxes) - len(ours_boxes))
        if len(ref_boxes) and len(ours_boxes):
            iou = _iou_matrix(ref_boxes, ours_boxes)
            assign = iou.argmax(axis=1)
            for ri, oi in enumerate(assign):
                if iou[ri, oi] < 0.5:
                    mismatches += 1
                    continue
                matched += 1
                worst_iou = min(worst_iou, float(iou[ri, oi]))
                rms = float(np.sqrt(np.mean(
                    (ref_kps[ri] - ours_kps[oi]) ** 2)))
                worst_rms = max(worst_rms, rms)
    ok = mismatches == 0 and worst_iou >= 0.99 and worst_rms <= 1.0
    print(f"scrfd: {matched} matched detections, {mismatches} mismatches, "
          f"worst IoU {worst_iou:.4f}, worst landmark RMS {worst_rms:.3f}px "
          f"({'PASS' if ok else 'FAIL'} vs IoU>=0.99 / RMS<=1px / 0 mismatches)")
    return worst_iou


def check_match_decisions(pack: str, n_ids: int = 500, n_probe: int = 64) -> int:
    """Top-1 + threshold agreement using the two embedders' own outputs."""
    import jax.numpy as jnp

    from facerecognition_infrenceengine_tpu.models import arcface
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init
    from facerecognition_infrenceengine_tpu.ops.matching import cosine_topk, l2_normalize

    sess = _ort_session(os.path.join(pack, "w600k_r50.onnx"))
    input_name = sess.get_inputs()[0].name
    rng = np.random.default_rng(1)
    crops = rng.integers(0, 255, (n_ids + n_probe, 112, 112, 3), dtype=np.uint8)

    model = arcface.iresnet50()
    variables = load_or_init("arcface_r50", model,
                             jnp.zeros((1, 112, 112, 3), jnp.float32))
    ours = np.asarray(l2_normalize(
        model.apply(variables, arcface.preprocess(jnp.asarray(crops)))))
    x = (crops.astype(np.float32) - 127.5) / 127.5
    theirs = sess.run(None, {input_name: np.transpose(x, (0, 3, 1, 2))})[0]
    theirs = theirs / np.linalg.norm(theirs, axis=1, keepdims=True)

    disagreements = 0
    for embs in (ours, theirs):
        gal, probes = embs[:n_ids], embs[n_ids:]
        vals, idx = cosine_topk(jnp.asarray(probes), jnp.asarray(gal),
                                jnp.ones(n_ids, bool), k=1)
        decision = (np.asarray(vals)[:, 0] >= 0.4, np.asarray(idx)[:, 0])
        if embs is ours:
            ref_decision = decision
        else:
            disagreements = int((decision[0] != ref_decision[0]).sum() +
                                ((decision[1] != ref_decision[1]) &
                                 ref_decision[0]).sum())
    print(f"match decisions: {disagreements} disagreements over {n_probe} probes "
          f"({'PASS' if disagreements == 0 else 'FAIL'})")
    return disagreements


def check_attributes(pack: str, n: int = 32) -> dict:
    """genderage + 2d106det: our executor (models/onnx_exec.py, the graph
    itself jitted) vs onnxruntime on the SAME graph — gender agreement,
    age delta, and 106-landmark RMS.  This is the exactness proof for the
    attribute surface: there is no re-derived architecture to diverge."""
    from facerecognition_infrenceengine_tpu.models import onnx_exec, onnxlite

    results = {}
    rng = np.random.default_rng(2)
    for fname, label in (("genderage.onnx", "genderage"),
                         ("2d106det.onnx", "landmark106")):
        path = os.path.join(pack, fname)
        if not os.path.exists(path):
            print(f"{label}: {fname} not in pack, skipped")
            continue
        sess = _ort_session(path)
        inp = sess.get_inputs()[0]
        shape = [n if (isinstance(d, str) or not d or d < 0) else int(d)
                 for d in inp.shape]
        shape[0] = n
        blobs = rng.uniform(0, 255, size=shape).astype(np.float32)
        theirs = sess.run(None, {inp.name: blobs})[0]
        runner = onnx_exec.OnnxRunner(onnxlite.load(path))
        ours = np.asarray(runner(blobs)[0])
        if label == "genderage":
            gender_agree = int((np.argmax(ours[:, :2], 1)
                                == np.argmax(theirs[:, :2], 1)).sum())
            age_delta = float(np.abs(np.round(ours[:, 2] * 100)
                                     - np.round(theirs[:, 2] * 100)).max())
            ok = gender_agree == n and age_delta <= 1.0
            print(f"genderage: {gender_agree}/{n} gender agreement, max age "
                  f"delta {age_delta:.1f} ({'PASS' if ok else 'FAIL'})")
            results[label] = (gender_agree, age_delta)
        else:
            size = shape[-1]
            rms = float(np.sqrt(np.mean(
                ((ours - theirs).reshape(n, -1, 2) * (size / 2.0)) ** 2)))
            ok = rms <= 0.1  # pixels; same graph, fp divergence only
            print(f"landmark106: {rms:.4f} px RMS over {n} crops "
                  f"({'PASS' if ok else 'FAIL'} vs 0.1 px)")
            results[label] = rms
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pack", required=True)
    ap.add_argument("--images", default=None,
                    help="directory of 112x112 crops (jpg/png); random if unset")
    args = ap.parse_args()

    images = None  # 112x112 crops -> arcface check
    frames = None  # any-size frames -> scrfd detection check
    if args.images:
        from facerecognition_infrenceengine_tpu import native

        crops, full = [], []
        for name in sorted(os.listdir(args.images)):
            with open(os.path.join(args.images, name), "rb") as f:
                img = native.decode_image(f.read())
            if img is None:
                continue
            (crops if img.shape[:2] == (112, 112) else full).append(img)
        images = np.stack(crops) if crops else None
        frames = full or None

    check_arcface(args.pack, images=images)
    check_scrfd(args.pack, frames=frames)
    check_match_decisions(args.pack)
    check_attributes(args.pack)


if __name__ == "__main__":
    main()
