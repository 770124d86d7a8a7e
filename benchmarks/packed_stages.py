"""Stage decomposition for the packed-input path: detect and warp, raw vs
packed, isolated (TPU).  Finds where the fused-stem win goes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import device_fn_time as time_fn  # noqa: E402


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.ops import warp2pass

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8)
    frames = jnp.asarray(frames_np)
    packed = jnp.asarray(FaceEngine.pack_frames(frames_np))

    def det_raw(dv, fr, i):
        return engine._detect_impl(dv, jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)),
                                   jnp.float32(0.3))

    def det_pck(dv, fr, i):
        return engine._detect_packed_impl(dv, jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)),
                                          jnp.float32(0.3))

    t = time_fn(det_raw, engine.det_variables, frames)
    print(f"detect raw    B={b}: {t * 1e3:7.2f} ms", flush=True)
    t = time_fn(det_pck, engine.det_variables, packed)
    print(f"detect packed B={b}: {t * 1e3:7.2f} ms", flush=True)

    kps = jnp.asarray(
        np.asarray(warp2pass.ARCFACE_DST, np.float32)[None] * 1.7
        + rng.uniform(0, 300, (m, 1, 2)).astype(np.float32))
    fidx = jnp.asarray(rng.integers(0, b, m).astype(np.int32))

    def warp_raw(fr, k, fi, i):
        return warp2pass.warp_faces_two_pass(
            jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)), fi, k, 112)

    def warp_pck(fr, k, fi, i):
        return warp2pass.warp_faces_two_pass_packed(
            jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)), fi, k, 112)

    t = time_fn(warp_raw, frames, kps, fidx)
    print(f"warp raw    M={m}: {t * 1e3:7.2f} ms", flush=True)
    t = time_fn(warp_pck, packed, kps, fidx)
    print(f"warp packed M={m}: {t * 1e3:7.2f} ms", flush=True)

    # atlas build alone
    def atlas_raw(fr, i):
        a, _ = warp2pass.build_atlas(jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))
        return a

    def atlas_pck(fr, i):
        a, _ = warp2pass.build_atlas_packed(jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))
        return a

    t = time_fn(atlas_raw, frames)
    print(f"atlas raw    B={b}: {t * 1e3:7.2f} ms", flush=True)
    t = time_fn(atlas_pck, packed)
    print(f"atlas packed B={b}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
