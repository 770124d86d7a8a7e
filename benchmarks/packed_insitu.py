"""In-situ composition bisect for the packed detect program (TPU).

stem_scaling.py showed the packed detect's parts run fast ISOLATED at
B=96 (pallas stem 22.1 ms + backbone 25.6 ms + pad 0.6 ms) yet the full
program costs 91.8 ms — ~35 ms exists only in composition.  This times
the cumulative prefixes of _detect_packed_impl in one process to name
the boundary where the time appears:

  p_stem            pad + pallas stem
  p_backbone        pad + pallas stem + backbone heads
  p_decode          + sigmoid/decode/top-k/NMS (= _detect_packed_impl)
  r_backbone        raw preprocess + flax stem + backbone heads
  r_decode          full _detect_impl

Usage: python benchmarks/packed_insitu.py [B]   (default 96)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import device_fn_time as time_fn  # noqa: E402


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.models import scrfd
    from facerecognition_infrenceengine_tpu.ops import stem_pallas

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    dv = engine.det_variables
    sw = engine.detector.cfg.stem_width
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8)
    frames = jnp.asarray(frames_np)
    packed = jnp.asarray(FaceEngine.pack_frames(frames_np))
    dummy = jnp.zeros((b, 1, 1, 3), jnp.float32)

    def p_stem(d, fr, i):
        x4 = stem_pallas.pad_packed_u8(
            jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))
        return stem_pallas.fused_stem(x4, d["stem_pallas"], 160, sw)

    def p_backbone(d, fr, i):
        so = p_stem(d, fr, i)
        return engine.detector.apply(d, dummy, stem_out=so)

    def p_decode(d, fr, i):
        return engine._detect_packed_impl(
            d, jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)),
            jnp.float32(0.3))

    def p_unpack_decode(d, fr, i):
        # The production "unpack" strategy (packed_stem_impl default):
        # undo the s2d4 permutation on device and run the RAW program —
        # the same depth_to_space4 the engine path calls, so this row
        # measures exactly what _detect_packed_impl ships.
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        return engine._detect_impl(d, stem_pallas.depth_to_space4(fr),
                                   jnp.float32(0.3))

    def r_backbone(d, fr, i):
        fr = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
        return engine.detector.apply(d, scrfd.preprocess(fr))

    def r_decode(d, fr, i):
        return engine._detect_impl(
            d, jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)),
            jnp.float32(0.3))

    for name, fn, fr in (("p_stem", p_stem, packed),
                         ("p_backbone", p_backbone, packed),
                         ("p_decode", p_decode, packed),
                         ("p_unpack_decode", p_unpack_decode, packed),
                         ("r_backbone", r_backbone, frames),
                         ("r_decode", r_decode, frames)):
        t = time_fn(fn, dv, fr)
        print(f"{name:12s} B={b}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
