"""Benchmark: fused detect+align+embed throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north star of 5,000 detected+aligned+embedded
faces/sec/chip on v5e (the reference publishes no numbers of its own).

The measured program is the production fused path: SCRFD-10G at 640x640 +
NMS + batched 5-pt alignment + ArcFace-R50 embedding, bf16, static
[B, max_faces] capacity.  faces/sec counts embedded face slots actually
flowing through the MXU (B * max_faces per dispatch).

Measurement method (important on tunneled/async runtimes): the whole
N-iteration loop runs ON DEVICE inside one jitted ``lax.fori_loop`` whose
body perturbs the input frames per iteration (defeats any dispatch
memoization) and folds every output into a scalar accumulator that is read
back to the host once (forces real execution; dead-code elimination cannot
skip the pipeline).  Per-iteration time is the slope between an N1-iter and
an N2-iter run, which cancels dispatch + host round-trip overhead exactly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# TPU-only persistent compile cache (XLA:CPU AOT entries are
# machine-specific and can SIGILL elsewhere).
try:
    import jax as _jax_cache_gate
    if _jax_cache_gate.default_backend() == "tpu":
        _jax_cache_gate.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        _jax_cache_gate.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_FACES_PER_SEC = 5000.0


def _git_commit() -> str:
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def device_loop_time(run, n1=4, n2=20, reps=3):
    """Seconds per device-side loop iteration, by slope between n1 and n2 runs.

    ``run(n)`` executes n iterations on device and returns a host scalar
    (forcing completion); n is a *dynamic* loop bound so both runs share one
    compiled program.  The slope cancels dispatch + host round-trip overhead.
    """
    run(n1)  # compile + warm
    run(n2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def fused_loop_runner(engine, frames, det_threshold=0.3):
    def loop(det_vars, rec_vars, fr, n):
        def body(i, acc):
            f = jnp.bitwise_xor(fr, (i % 251).astype(jnp.uint8))
            boxes, scores, kps, valid, emb = engine._fused_impl(
                det_vars, rec_vars, f, jnp.float32(det_threshold)
            )
            return acc + jnp.float32(emb.sum()) + scores.sum() + boxes.sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    fn = jax.jit(loop)

    def run(n):
        return float(fn(engine.det_variables, engine.rec_variables, frames,
                        jnp.int32(n)))

    return run


def gallery_loop_runner(queries, gallery, valid):
    """Gallery top-1 match (the per-frame hot loop the reference does in python)."""
    from facerecognition_infrenceengine_tpu.ops.matching import cosine_topk

    def loop(q0, g, v, n):
        def body(i, acc):
            q = q0 + (i.astype(jnp.float32) * 1e-6)
            vals, idx = cosine_topk(q, g, v, k=1)
            return acc + vals.sum() + idx.sum().astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    fn = jax.jit(loop)

    def run(n):
        return float(fn(queries, gallery, valid, jnp.int32(n)))

    return run


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

    # B=16 saturates the chip (B=8: ~5.3k, B=16: ~6.2k, B=32: ~6.2k faces/s);
    # the micro-batcher feeds batches like this from concurrent cameras.
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_faces = int(os.environ.get("BENCH_MAX_FACES", "16"))
    cfg = EngineConfig(det_size=(640, 640), max_faces=max_faces,
                       pre_nms_topk=256, dtype="bfloat16")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))

    # Throughput: faces/sec through the full fused program at batch B.
    it_s = device_loop_time(fused_loop_runner(engine, frames))
    faces_per_sec = batch * max_faces / it_s

    # Latency: device time for one B=1 fused dispatch (p50 path, no queueing).
    frames1 = frames[:1]
    lat_s = device_loop_time(fused_loop_runner(engine, frames1), n1=8, n2=48,
                             reps=5)
    frame_ms = lat_s * 1000.0

    # Opt-in int8-embedder scale mode (EngineConfig.embed_int8,
    # models/quant.py): same fused program with the PTQ int8 IResNet —
    # ~0.995 cosine vs bf16, not the parity path, reported as an extra.
    faces_per_sec_int8 = None
    if os.environ.get("BENCH_INT8", "1") != "0":
        try:
            import dataclasses

            engine_q = FaceEngine(dataclasses.replace(cfg, embed_int8=True),
                                  det_arch="det_10g", rec_arch="r50", seed=0)
            it8_s = device_loop_time(fused_loop_runner(engine_q, frames))
            faces_per_sec_int8 = round(batch * max_faces / it8_s, 1)
        except Exception as exc:  # surface the failure, don't mask it as
            faces_per_sec_int8 = {"error": str(exc)[:200]}  # "mode absent"

    # Gallery QPS: 64 queries vs a 100k-identity gallery, top-1.  The match
    # is microseconds per iteration, so the loop counts are large enough for
    # the slope to dominate host noise.
    n_ids = int(os.environ.get("BENCH_GALLERY", "100000"))
    n_q = 64
    gal = l2_normalize(jnp.asarray(
        rng.normal(size=(n_ids, 512)).astype(np.float32)))
    q = gal[:n_q]
    valid = jnp.ones((n_ids,), bool)
    g_s = device_loop_time(gallery_loop_runner(q, gal, valid),
                           n1=64, n2=1024, reps=5)
    gallery_qps = n_q / max(g_s, 1e-9)

    # 1M-ID gallery (the reference's scale axis, SURVEY §5.7): f32 XLA is
    # the bit-exact parity path; int8 is the opt-in fused-Pallas path
    # (ops/match_pallas.py).  Gallery built on device — 2 GB would take
    # minutes over the tunnel link.
    n_1m = 1 << 20
    gal_1m = jax.jit(lambda: l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (n_1m, 512), jnp.float32)))()
    valid_1m = jnp.ones((n_1m,), bool)
    g1m_s = device_loop_time(gallery_loop_runner(q, gal_1m, valid_1m),
                             n1=8, n2=64, reps=3)
    i8_scale = float(jnp.max(jnp.abs(gal_1m))) / 127.0
    gal_i8 = jax.jit(lambda g: jnp.clip(
        jnp.rint(g / i8_scale), -127, 127).astype(jnp.int8))(gal_1m)

    def int8_loop_runner():
        from facerecognition_infrenceengine_tpu.ops.match_pallas import (
            gallery_top1_int8)

        def loop(q0, g, n):
            def body(i, acc):
                vals, idx = gallery_top1_int8(
                    q0 + (i % 7).astype(jnp.float32) * 1e-3, g,
                    jnp.float32(i8_scale), jnp.int32(n_1m))
                return acc + vals.sum() + idx.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        fn = jax.jit(loop)

        def run(n):
            return float(fn(q, gal_i8, jnp.int32(n)))

        return run

    if jax.default_backend() == "tpu":
        g1m_i8_s = device_loop_time(int8_loop_runner(), n1=8, n2=64, reps=3)
        gallery_qps_1m_int8 = round(n_q / max(g1m_i8_s, 1e-9), 1)
    else:
        gallery_qps_1m_int8 = None

    # Sustained streaming through the REAL serving path (camera threads ->
    # MicroBatcher -> fused program, host<->device transfers included) so
    # the production path has a tracked regression signal, not just the
    # device-only loop.  Short window; warm shapes come from .jax_cache.
    streaming = None
    if (jax.default_backend() == "tpu"
            and os.environ.get("BENCH_STREAMING", "1") != "0"):
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            import streaming as _streaming_mod

            streaming = _streaming_mod.run(
                n_cameras=int(os.environ.get("BENCH_STREAM_CAMS", "4")),
                duration=float(os.environ.get("BENCH_STREAM_SECS", "5")),
                quiet=True)
        except Exception as exc:  # never fail the headline metric on this
            streaming = {"error": str(exc)[:200]}

    result = {
        "metric": "faces_per_sec_per_chip",
        "value": round(faces_per_sec, 1),
        "unit": "faces/s (detect+align+embed, 640x640, bf16)",
        "vs_baseline": round(faces_per_sec / BASELINE_FACES_PER_SEC, 3),
        "extra": {
            "batch": batch,
            "max_faces": max_faces,
            "fused_iter_ms": round(it_s * 1000.0, 3),
            "frame_latency_b1_ms": round(frame_ms, 3),
            "faces_per_sec_int8_embed_mode": faces_per_sec_int8,
            "gallery_qps_100k": round(gallery_qps, 1),
            "gallery_qps_1m_f32": round(n_q / max(g1m_s, 1e-9), 1),
            "gallery_qps_1m_int8": gallery_qps_1m_int8,
            "streaming": streaming,
            "device": str(jax.devices()[0]),
            "commit": _git_commit(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
