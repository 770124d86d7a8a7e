"""Analytic FLOP accounting for the bench's MFU numbers (VERDICT r4 #2).

FLOPs come from XLA's own HLO cost analysis of the UNOPTIMIZED lowering
(``jax.jit(fn).lower(args).cost_analysis()["flops"]``) — exact for the
conv/matmul-dominated programs here (verified: a [128,256]@[256,512]
matmul reports 33,554,432 = 2*M*N*K), backend-independent, and obtained
WITHOUT compiling anything.

Two process models:
- ``python benchmarks/flops.py B F`` — CPU-pinned worker: lowers each
  stage and prints one JSON dict of FLOP counts.
- ``get_flops(batch, max_faces)`` — library entry used by bench.py: reads
  the committed ``flops_cache.json``; on a miss, spawns the worker and
  updates the cache.  bench.py never lowers these programs itself: extra
  traces in the bench process would perturb .jax_cache's
  history-dependent compile keys (CLAUDE.md "TPU tunnel gotchas").

MFU context (BASELINE.md): v5e peak is 197 TFLOP/s bf16 / 394 TOP/s int8.
The workload anchor is the reference's per-frame `app.get(frame)` call
(/root/reference/infrenceServer.py:528) = det_10g@640x640 + r50@112x112
per face, which these stages reproduce exactly.
"""

import json
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_HERE, "flops_cache.json")

# v5e-1 peak throughputs (per chip).
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12


def _load_cache() -> dict:
    try:
        with open(_CACHE) as f:
            return json.load(f)
    except Exception:
        return {}


def get_flops(batch: int, max_faces: int) -> dict | None:
    """FLOP counts for the production stages at this (B, F), from the
    committed cache; computed in a CPU subprocess on a miss.  Returns
    None when the worker fails (bench records the section error)."""
    key = f"det10g_r50_640_b{batch}_f{max_faces}"
    cache = _load_cache()
    if key in cache:
        return cache[key]
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         str(batch), str(max_faces)],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        sys.stderr.write(f"# flops worker failed: {r.stderr[-500:]}\n")
        return None
    out = json.loads(r.stdout.strip().splitlines()[-1])
    cache = _load_cache()  # re-read: another section may have written
    cache[key] = out
    with open(_CACHE, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
        f.write("\n")
    return out


def _compute(batch: int, max_faces: int) -> dict:
    """CPU-pinned worker body: lower each stage abstractly and read
    XLA's flop count.  No compiles, no device arrays beyond weights."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(_HERE))
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.models import arcface, scrfd
    from facerecognition_infrenceengine_tpu.ops.warp2pass import (
        warp_faces_two_pass)

    cfg = EngineConfig(det_size=(640, 640), max_faces=max_faces,
                       pre_nms_topk=256, dtype="bfloat16")
    e = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    m = batch * max_faces

    def flops(fn, *args) -> float:
        ca = jax.jit(fn).lower(*args).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    u8 = jnp.uint8
    frames = jax.ShapeDtypeStruct((batch, 640, 640, 3), u8)
    crops = jax.ShapeDtypeStruct((m, 112, 112, 3), jnp.float32)
    kps = jax.ShapeDtypeStruct((m, 5, 2), jnp.float32)
    fidx = jax.ShapeDtypeStruct((m,), jnp.int32)
    thr = jax.ShapeDtypeStruct((), jnp.float32)

    out = {
        "batch": batch, "max_faces": max_faces,
        # detector forward alone (the conv stack, no decode/NMS)
        "scrfd_fwd": flops(
            lambda dv, fr: e.detector.apply(dv, scrfd.preprocess(fr)),
            e.det_variables, frames),
        # full detect stage: forward + anchor decode + top-k + NMS
        "detect": flops(
            lambda dv, fr, t: e._detect_impl(dv, fr, t),
            e.det_variables, frames, thr),
        # batched 5-pt alignment warp, M faces from B frames
        "warp": flops(
            lambda fr, fi, k: warp_faces_two_pass(fr, fi, k, 112),
            frames, fidx, kps),
        # embedder forward, M crops
        "embed": flops(
            lambda rv, c: e.embedder.apply(rv, arcface.preprocess(c)),
            e.rec_variables, crops),
        # the whole fused production program (what bench.py times)
        "fused": flops(
            lambda dv, rv, fr, t: e._fused_impl(dv, rv, fr, t),
            e.det_variables, e.rec_variables, frames, thr),
    }
    return out


def mfu(flop_count: float | None, seconds: float | None,
        peak: float = PEAK_BF16) -> float | None:
    if not flop_count or not seconds or seconds <= 0:
        return None
    return round(flop_count / seconds / peak, 4)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(json.dumps(_compute(b, f)))
