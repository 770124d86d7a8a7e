"""Benchmark: fused detect+align+embed throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north star of 5,000 detected+aligned+embedded
faces/sec/chip on v5e (the reference publishes no numbers of its own).

The measured program is the production fused path: SCRFD-10G at 640x640 +
NMS + batched 5-pt alignment + ArcFace-R50 embedding, bf16, static
[B, max_faces] capacity.  faces/sec counts embedded face slots actually
flowing through the MXU (B * max_faces per dispatch).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FACES_PER_SEC = 5000.0


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    max_faces = int(os.environ.get("BENCH_MAX_FACES", "16"))
    cfg = EngineConfig(det_size=(640, 640), max_faces=max_faces,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))

    # Warm up / compile.
    out = engine.detect_align_embed(frames)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.detect_align_embed(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    faces = batch * max_faces * iters
    faces_per_sec = faces / dt
    frame_ms = dt / (batch * iters) * 1000.0

    result = {
        "metric": "faces_per_sec_per_chip",
        "value": round(faces_per_sec, 1),
        "unit": "faces/s (detect+align+embed, 640x640, bf16)",
        "vs_baseline": round(faces_per_sec / BASELINE_FACES_PER_SEC, 3),
        "extra": {
            "batch": batch,
            "max_faces": max_faces,
            "frame_latency_ms": round(frame_ms, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
