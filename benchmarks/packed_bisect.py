"""Bisect the packed-vs-raw fused program: detect+warp (no embed) and the
full program, both variants, to find where the isolated-stage wins go."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import device_fn_time as timed  # noqa: E402


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.ops.warp2pass import (
        warp_faces_two_pass, warp_faces_two_pass_packed)

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8)
    frames = jnp.asarray(frames_np)
    packed = jnp.asarray(FaceEngine.pack_frames(frames_np))
    f = cfg.max_faces

    def dw_raw(dv, fr, i):
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        boxes, scores, kps, valid = engine._detect_impl(dv, fr, jnp.float32(0.3))
        fidx = jnp.repeat(jnp.arange(b), f)
        crops = warp_faces_two_pass(fr, fidx, kps.reshape(b * f, 5, 2),
                                    cfg.embed_size, dst=engine._dst)
        return crops, scores

    def dw_pck(dv, fr, i):
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        boxes, scores, kps, valid = engine._detect_packed_impl(dv, fr, jnp.float32(0.3))
        fidx = jnp.repeat(jnp.arange(b), f)
        crops = warp_faces_two_pass_packed(fr, fidx, kps.reshape(b * f, 5, 2),
                                           cfg.embed_size, dst=engine._dst)
        return crops, scores

    t = timed(dw_raw, engine.det_variables, frames)
    print(f"detect+warp raw    B={b}: {t * 1e3:7.2f} ms", flush=True)
    t = timed(dw_pck, engine.det_variables, packed)
    print(f"detect+warp packed B={b}: {t * 1e3:7.2f} ms", flush=True)

    # Frames MUST ride in as loop arguments: a closure bakes the [B,640,
    # 640,3] batch into the executable as a literal constant (118 MB at
    # B=96), which the remote-compile tunnel rejects with HTTP 413.
    def full_raw(dv, rv, fr, i):
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        return engine._fused_impl(dv, rv, fr, jnp.float32(0.3))

    def full_pck(dv, rv, fr, i):
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        return engine._fused_packed_impl(dv, rv, fr, jnp.float32(0.3))

    t = timed(full_raw, engine.det_variables, engine.rec_variables, frames)
    print(f"fused raw    B={b}: {t * 1e3:7.2f} ms", flush=True)
    t = timed(full_pck, engine.det_variables, engine.rec_variables, packed)
    print(f"fused packed B={b}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
