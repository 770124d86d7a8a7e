"""Per-stage device-time breakdown of the fused pipeline.

Runs each stage (detector forward, decode+NMS, warp, embedder, full fused
program) under the same dynamic-n fori_loop slope measurement bench.py
uses, so the numbers are honest on tunneled/async runtimes.

Usage: python benchmarks/breakdown.py [B] [MAX_FACES]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Scratch compile cache (TPU-only): standalone benchmark runs have a
# different in-process compile history than bench.py, so writing the
# committed .jax_cache would only create orphan entries the driver
# can never hit (tools/check_jax_cache.py fails on them).  A scratch
# dir still keeps this script's own reruns warm.
try:
    import jax as _jax_cache_gate
    # never override an ALREADY-configured cache: bench.py imports
    # streaming mid-run with .jax_cache active, and hijacking the dir
    # would divert the committed cache's entries to scratch
    if (_jax_cache_gate.default_backend() == "tpu"
            and not _jax_cache_gate.config.jax_compilation_cache_dir):
        _jax_cache_gate.config.update(
            "jax_compilation_cache_dir",
            "/tmp/fre_bench_scratch_cache")
        _jax_cache_gate.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass



def loop_time(fn_body, args, n1=4, n2=20, reps=3):
    """Per-iteration device seconds of fn_body(i, *args) via loop slope."""
    def loop(n, *a):
        def body(i, acc):
            return acc + fn_body(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jfn = jax.jit(loop)
    float(jfn(jnp.int32(n1), *args))
    float(jfn(jnp.int32(n2), *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jfn(jnp.int32(n1), *args))
        t1 = time.perf_counter()
        float(jfn(jnp.int32(n2), *args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.models import arcface, scrfd
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize
    from facerecognition_infrenceengine_tpu.ops.warp2pass import warp_faces_two_pass

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    max_faces = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    m = batch * max_faces
    cfg = EngineConfig(det_size=(640, 640), max_faces=max_faces,
                       pre_nms_topk=256, dtype="bfloat16")
    e = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))
    kps = jnp.asarray(rng.uniform(100, 500, (m, 5, 2)).astype(np.float32))
    fidx = jnp.asarray(rng.integers(0, batch, m).astype(np.int32))
    crops = jnp.asarray(rng.integers(0, 255, (m, 112, 112, 3), dtype=np.uint8)
                        ).astype(jnp.float32)

    def uniq(fr, i):
        return jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))

    rows = []

    # 1. SCRFD forward only
    def det_fwd(i, dv, fr):
        x = scrfd.preprocess(uniq(fr, i))
        logits, bbox, kp = e.detector.apply(dv, x)
        return jnp.float32(logits.sum()) + jnp.float32(bbox.sum())
    rows.append(("scrfd_fwd", loop_time(det_fwd, (e.det_variables, frames))))

    # 2. full detect (fwd + decode + topk + NMS)
    def det_full(i, dv, fr):
        b, s, k, v = e._detect_impl(dv, uniq(fr, i), jnp.float32(0.3))
        return jnp.float32(b.sum()) + s.sum()
    rows.append(("detect+nms", loop_time(det_full, (e.det_variables, frames))))

    # 3. warp only (M faces from B frames)
    def warp_only(i, fr, fi, k):
        c = warp_faces_two_pass(uniq(fr, i), fi, k, 112)
        return jnp.float32(c.sum())
    rows.append(("warp_x%d" % m, loop_time(warp_only, (frames, fidx, kps))))

    # 4. embedder only (M crops)
    def emb_only(i, rv, c):
        x = c + (i % 7).astype(jnp.float32)
        emb = e.embedder.apply(rv, arcface.preprocess(x))
        return jnp.float32(emb.sum())
    rows.append(("iresnet50_x%d" % m, loop_time(emb_only, (e.rec_variables, crops))))

    # 5. full fused
    def fused(i, dv, rv, fr):
        b, s, k, v, emb = e._fused_impl(dv, rv, uniq(fr, i), jnp.float32(0.3))
        return jnp.float32(emb.sum()) + s.sum()
    rows.append(("fused", loop_time(fused, (e.det_variables, e.rec_variables, frames))))

    # per-stage MFU from the analytic FLOP counts (benchmarks/flops.py):
    # stage name here -> flops-cache key
    import flops as flops_mod

    fl = flops_mod.get_flops(batch, max_faces) or {}
    key_of = {"scrfd_fwd": "scrfd_fwd", "detect+nms": "detect",
              "warp_x%d" % m: "warp", "iresnet50_x%d" % m: "embed",
              "fused": "fused"}

    print(f"B={batch} max_faces={max_faces} (M={m} face slots/iter)")
    for name, s in rows:
        mfu = flops_mod.mfu(fl.get(key_of.get(name, "")), s)
        mfu_s = f"  mfu={mfu:.1%}" if mfu is not None else ""
        rate = (f"   {m/s:10.0f} faces/s"
                if "fused" in name or "x" in name else "")
        print(f"  {name:<18} {s*1000:8.2f} ms/iter{rate}{mfu_s}")


if __name__ == "__main__":
    main()
