"""Batch-scaling isolation for the detect stem variants (TPU).

packed_stages.py (B=96) showed the packed path's end-to-end loss lives in
the DETECTOR (raw 40.1 ms vs packed 91.8 ms at B=96), while at B=8 the
same A/B was only ~1.1 ms apart — superlinear.  This script times each
stem ingredient at a list of batch sizes to name the non-linear stage:

  stem_xla     scrfd.preprocess + models/packed_stem.packed_stem_forward
               (what the raw detect path actually runs)
  stem_pallas  ops/stem_pallas.fused_stem from padded u8 (what the packed
               detect path runs), including pad_packed_u8
  pad_u8       pad_packed_u8 alone ([B,160,160,48] u8 -> [B,168,192,128])
  backbone_*   detector.apply from a precomputed stem_out (shared tail,
               sanity check that the backbone itself scales linearly)

Usage: python benchmarks/stem_scaling.py [B ...]   (default 8 96)
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
    from facerecognition_infrenceengine_tpu.models import scrfd, packed_stem
    from facerecognition_infrenceengine_tpu.ops import stem_pallas

    batches = [int(a) for a in sys.argv[1:]] or [8, 96]
    cfg = EngineConfig(det_size=(640, 640), max_faces=16,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    dv = engine.det_variables
    if "packed_stem" not in dv and "batch_stats" in dv:
        # The raw-path packed stem is opt-in (EngineConfig.packed_stem);
        # precompute it here so the stem_xla row always prints — it is the
        # comparison this script exists for.
        dv = dict(dv)
        dv["packed_stem"] = packed_stem.precompute_packed_stem(
            dv, engine.detector.dtype)
    sw = engine.detector.cfg.stem_width
    rng = np.random.default_rng(0)

    for b in batches:
        frames_np = rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8)
        frames = jnp.asarray(frames_np)
        packed = jnp.asarray(FaceEngine.pack_frames(frames_np))

        def stem_xla(d, fr, i):
            x = scrfd.preprocess(jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))
            return packed_stem.packed_stem_forward(
                x, d["packed_stem"], sw, engine.detector.dtype)

        def pad_u8(fr, i):
            return stem_pallas.pad_packed_u8(
                jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))

        def stem_pl(d, fr, i):
            x4 = stem_pallas.pad_packed_u8(
                jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8)))
            return stem_pallas.fused_stem(x4, d["stem_pallas"], 160, sw)

        if "packed_stem" in dv:
            t = time_fn(stem_xla, dv, frames)
            print(f"stem_xla     B={b}: {t * 1e3:7.2f} ms", flush=True)
        t = time_fn(pad_u8, packed)
        print(f"pad_u8       B={b}: {t * 1e3:7.2f} ms", flush=True)
        t = time_fn(stem_pl, dv, packed)
        print(f"stem_pallas  B={b}: {t * 1e3:7.2f} ms", flush=True)

        # Backbone+heads from a fixed stem_out: the shared tail.
        stem_out = np.asarray(stem_pallas.fused_stem(
            stem_pallas.pad_packed_u8(packed), dv["stem_pallas"], 160, sw))
        stem_out = jnp.asarray(stem_out)
        dummy = jnp.zeros((b, 1, 1, 3), jnp.float32)

        def backbone(d, so, i):
            so = so + (i % 2).astype(so.dtype) * 1e-3
            return engine.detector.apply(d, dummy, stem_out=so)

        t = time_fn(backbone, dv, stem_out)
        print(f"backbone     B={b}: {t * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
