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


def wait_for_backend(max_tries=12, delay=30, probe_timeout=120):
    """Ride out transient axon-tunnel outages (observed: backend init
    HANGING or raising UNAVAILABLE for hours during remote incidents)
    instead of recording an empty benchmark.  Probes in a SUBPROCESS
    because jax caches backend-init failures for the life of the process;
    this process only initializes after a probe succeeds.  Must run BEFORE
    anything touches jax.default_backend()/jax.devices() (the cache gate
    below does).  Exits nonzero after max_tries (~30 min): proceeding
    would HANG in backend init, which is worse for a driver than a clean
    failure with a cause on stderr."""
    import subprocess

    for i in range(max_tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout)
            if r.returncode == 0:
                return
        except Exception:
            pass
        print(f"# TPU backend unavailable (probe {i + 1}/{max_tries}); "
              f"retrying in {delay}s", file=sys.stderr, flush=True)
        time.sleep(delay)
    print("# TPU backend still unavailable after "
          f"{max_tries} probes — giving up (tunnel outage)",
          file=sys.stderr, flush=True)
    sys.exit(2)


if __name__ == "__main__":
    wait_for_backend()

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


def snapshot_loop_runner(snap, queries):
    """Device loop over the PRODUCTION gallery dispatch: the exact kernel
    selection _CompanySnapshot.match performs for this snapshot's dtype/size
    (f32/bf16 XLA, fused Pallas top-1, int8).  Measuring through the
    snapshot keeps driver-captured QPS and the serving path from drifting
    apart (VERDICT r2 weak #1).

    The gallery matrix is passed as a jit ARGUMENT (swapped onto the
    snapshot for the duration of the trace): closing over it would bake
    all 2 GB of a 1M-ID f32 gallery into the executable as a literal
    constant — slow to lower, and serialized verbatim into .jax_cache."""
    matrix, valid = snap.device_matrix, snap.device_valid

    def loop(q0, m, v, n):
        snap.device_matrix, snap.device_valid = m, v
        try:
            def body(i, acc):
                q = q0 + (i % 7).astype(jnp.float32) * 1e-3
                vals, idx = snap._device_match(q, 1, None)
                return acc + vals.sum() + idx.sum().astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        finally:
            snap.device_matrix, snap.device_valid = matrix, valid

    fn = jax.jit(loop)

    def run(n):
        return float(fn(queries, matrix, valid, jnp.int32(n)))

    return run


def gallery_snapshots(n_ids: int):
    """Build f32/bf16/int8 production snapshots around a device-generated
    gallery (2 GB host->device over the tunnel would take minutes)."""
    from facerecognition_infrenceengine_tpu.engine.gallery import (
        _CompanySnapshot)
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

    gal = jax.jit(lambda: l2_normalize(jax.random.normal(
        jax.random.PRNGKey(0), (n_ids, 512), jnp.float32)))()
    # int8 quantization on device, same 1.25x headroom as production builds
    scale = float(jnp.max(jnp.abs(gal))) * 1.25 / 127.0
    gal_i8 = jax.jit(lambda g: jnp.clip(
        jnp.rint(g / scale), -127, 127).astype(jnp.int8))(gal)
    ids = [str(i) for i in range(n_ids)]
    mk = _CompanySnapshot.from_device_matrix
    return {
        "f32": mk(gal, n_ids, "float32", ids=ids),
        "bf16": mk(gal.astype(jnp.bfloat16), n_ids, "bfloat16", ids=ids),
        "int8": mk(gal_i8, n_ids, "int8", int8_scale=scale, ids=ids),
    }, gal


def main():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    # Throughput keeps climbing with batch on v5e (measured sweep, r3:
    # B=16 ~5.9k, B=32 6.3k, B=64 6.8k, B=96 7.5k, B=128 7.6k faces/s) —
    # the per-frame fixed work (NMS/decode, warp setup) amortizes.  B=96 is
    # the headline operating point: ~206 ms/batch keeps worst-case queueing
    # under the streaming p50 budget while landing within 2% of the B=128
    # plateau; the micro-batcher accumulates batches like this from ~30
    # cameras (microbatch_max).  B=1 latency is reported separately below.
    batch = int(os.environ.get("BENCH_BATCH", "96"))
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

    # Gallery QPS through the production snapshot dispatch (engine/gallery
    # _CompanySnapshot._device_match), every configured dtype, at 100k and
    # 1M IDs (the reference's scale axis, SURVEY §5.7).  f32 XLA is the
    # bit-exact parity path; bf16/int8 route to the fused Pallas top-1
    # kernel exactly as serving would.
    n_q = 64
    gallery_qps: dict = {}
    match_call_ms: dict = {}
    for label, n_ids, loops in (("100k", 100_000, (64, 1024)),
                                ("1m", 1 << 20, (8, 64))):
        snaps, gal = gallery_snapshots(n_ids)
        q = gal[:n_q]
        gallery_qps[label] = {}
        for dname, snap in snaps.items():
            if (dname != "f32" and jax.default_backend() != "tpu"):
                gallery_qps[label][dname] = None  # pallas kernels: TPU-only
                continue
            g_s = device_loop_time(snapshot_loop_runner(snap, q),
                                   n1=loops[0], n2=loops[1], reps=3)
            gallery_qps[label][dname] = round(n_q / max(g_s, 1e-9), 1)
        # one full production match() call (host round-trip + id mapping
        # included) — the number a caller of GalleryManager.match sees
        probes = np.asarray(gal[:n_q], np.float32)
        for dname, snap in snaps.items():
            if dname != "f32" and jax.default_backend() != "tpu":
                continue
            snap.match(probes)  # warm
            t0 = time.perf_counter()
            calls = 10
            for i in range(calls):
                snap.match(probes + np.float32(1e-3 * (i % 7)))
            match_call_ms[f"{label}_{dname}"] = round(
                (time.perf_counter() - t0) / calls * 1000.0, 2)
        del snaps, gal, q

    # Sustained streaming through the REAL serving path (camera threads ->
    # MicroBatcher -> fused program, host<->device transfers included) so
    # the production path has a tracked regression signal, not just the
    # device-only loop.  Warm shapes come from .jax_cache.
    streaming = None
    streaming_yuv = None
    if (jax.default_backend() == "tpu"
            and os.environ.get("BENCH_STREAMING", "1") != "0"):
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
            import streaming as _streaming_mod

            # warmup seconds are discarded (thread ramp + pipeline fill is
            # a ~2-3 s one-time transient that would otherwise dominate the
            # sustained-fps average; see benchmarks/streaming.run).
            stream_secs = float(os.environ.get("BENCH_STREAM_SECS", "15"))
            stream_warm = float(os.environ.get("BENCH_STREAM_WARMUP", "5"))
            streaming = _streaming_mod.run(
                n_cameras=int(os.environ.get("BENCH_STREAM_CAMS", "4")),
                duration=stream_secs, warmup=stream_warm, quiet=True)
        except Exception as exc:  # never fail the headline metric on this
            streaming = {"error": str(exc)[:200]}
        try:
            # half-byte wire format (native yuv420 content-row pack +
            # ops/yuv.py device unpack) with per-frame capture-thread
            # uploads: the transfer-bound streaming path's main levers.
            # Frontier on this ~20 MB/s tunnel (15 s runs, 4 cams):
            # this profile 39 fps p50 ~740 ms; frame_queue_depth=4 batched
            # 48 fps p50 ~1.2 s; rgb r02 baseline 18.1 fps p50 469 ms.
            streaming_yuv = _streaming_mod.run(
                n_cameras=int(os.environ.get("BENCH_STREAM_CAMS", "4")),
                duration=stream_secs, warmup=stream_warm,
                quiet=True, transport="yuv420", upload_on_submit=True)
        except Exception as exc:
            streaming_yuv = {"error": str(exc)[:200]}

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
            "gallery_qps": gallery_qps,
            "gallery_match_call_ms": match_call_ms,
            # legacy keys (same dispatch; kept so r02/r03 rows compare)
            "gallery_qps_100k": gallery_qps["100k"]["f32"],
            "gallery_qps_1m_f32": gallery_qps["1m"]["f32"],
            "gallery_qps_1m_int8": gallery_qps["1m"]["int8"],
            "streaming": streaming,
            "streaming_yuv420": streaming_yuv,
            "device": str(jax.devices()[0]),
            "commit": _git_commit(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
