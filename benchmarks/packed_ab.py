"""A/B: raw-input fused program vs s2d4-packed-input fused program (TPU).

The packed contract is what production hosts emit (native letterbox packs
for free); the raw program must space-to-depth on device before the fused
stem can run, which round 2 measured as a ~1.1 ms/B=8 net loss.  This
script quantifies the packed path's end-to-end win that unlocks it.

Usage: python benchmarks/packed_ab.py [batch ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import device_loop_time  # noqa: E402  (repo-root import)


def loop_runner(fn, det_vars, rec_vars, frames, thr=0.3):
    def loop(dv, rv, fr, n):
        def body(i, acc):
            f = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
            boxes, scores, kps, valid, emb = fn(dv, rv, f, jnp.float32(thr))
            return acc + jnp.float32(emb.sum()) + scores.sum() + boxes.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jfn = jax.jit(loop)

    def run(n):
        return float(jfn(det_vars, rec_vars, frames, jnp.int32(n)))

    return run


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    batches = [int(a) for a in sys.argv[1:]] or [8, 16]
    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    rng = np.random.default_rng(0)
    for b in batches:
        frames = rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8)
        packed = jnp.asarray(FaceEngine.pack_frames(frames))
        frames = jnp.asarray(frames)
        t_raw = device_loop_time(loop_runner(
            engine._fused_impl, engine.det_variables, engine.rec_variables,
            frames))
        t_pck = device_loop_time(loop_runner(
            engine._fused_packed_impl, engine.det_variables,
            engine.rec_variables, packed))
        fps_raw = b * cfg.max_faces / t_raw
        fps_pck = b * cfg.max_faces / t_pck
        print(f"B={b}: raw {t_raw * 1e3:.2f} ms ({fps_raw:.0f} faces/s) | "
              f"packed {t_pck * 1e3:.2f} ms ({fps_pck:.0f} faces/s) | "
              f"delta {(t_raw - t_pck) * 1e3:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
