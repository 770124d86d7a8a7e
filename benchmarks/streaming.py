"""End-to-end multi-camera streaming benchmark (SURVEY.md §7 config #4).

Simulates N cameras pushing frames through the production serving path —
MicroBatcher -> FaceAnalysis.get_batch -> fused detect+align+embed on
device — and reports sustained frames/s, per-frame latency percentiles, and
drop counts.  This measures the REAL host+device path (python threads,
batching window, host<->device transfers), unlike bench.py's device-only
loop, so on a tunneled TPU the dispatch round-trip is part of the cost, as
it would be in production behind the same link.

Usage: python benchmarks/streaming.py [n_cameras] [seconds]
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
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



def _probe_link(rng) -> float | None:
    """Raw host->device MB/s (unique buffers + forced scalar readback —
    block_until_ready doesn't block on this tunnel)."""
    try:
        import jax.numpy as jnp
        red = jax.jit(lambda a: a.astype(jnp.int32).sum())
        samples = []
        for _ in range(4):
            buf = rng.integers(0, 255, (1 << 20,), dtype=np.uint8)
            t0 = time.perf_counter()
            int(red(jax.device_put(buf)))
            samples.append(buf.nbytes / (time.perf_counter() - t0) / 1e6)
        return round(float(np.median(samples)), 1)
    except Exception:
        return None


def run(n_cameras: int = 8, duration: float = 20.0, fps: float = 30.0,
        app=None, quiet: bool = False, transport: str = "rgb",
        frame_hw: tuple = (480, 640), frame_queue_depth: int | None = None,
        inflight_batches: int | None = None,
        upload_on_submit: bool | None = None,
        warmup: float = 0.0, profile: str | None = None) -> dict:
    """Sustained N-camera streaming measurement through the production
    path (threads -> MicroBatcher -> fused program).  Returns a dict of
    {fps_in, fps_processed, dropped, p50_ms, p90_ms, p99_ms, ...} so
    bench.py can track it as a regression signal (an ``app`` may be
    passed to reuse an already-prepared FaceAnalysis).

    ``warmup`` seconds of streaming are run and DISCARDED before the
    measured window: camera-thread start, per-camera queue fill, and the
    first trips through the admission/upload/dispatch pipeline are a one-
    time transient (~2-3 s on the tunneled TPU even with compile shapes
    warm); a sustained-throughput number that averages it in just measures
    the window length.  Counters are snapshotted at the warmup boundary;
    frames in flight across either boundary roughly cancel in steady state.
    """
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.microbatch import MicroBatcher
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    def say(*a):
        if not quiet:
            print(*a, flush=True)

    rng = np.random.default_rng(0)
    pre_link = None
    if profile == "auto" and app is None:
        # Pick the wire format from the link the run actually got (the
        # shared tunnel swings ~3-30 MB/s): anything transfer-bound takes
        # the half-byte yuv420 format + capture-thread uploads; a fast
        # local link keeps rgb.  Depth knobs start loose (2/2) and the
        # MicroBatcher's controller tightens/loosens them online against
        # cfg.target_p50_ms (engine/microbatch._adapt_step).
        pre_link = _probe_link(rng)
        say(f"  auto profile: link probe {pre_link} MB/s")
        transfer_bound = pre_link is None or pre_link < 200.0
        transport = "yuv420" if transfer_bound else "rgb"
        upload_on_submit = transfer_bound
        frame_queue_depth = 2 if frame_queue_depth is None else frame_queue_depth
        inflight_batches = 2 if inflight_batches is None else inflight_batches
    if app is None:
        extra = {}
        if frame_queue_depth is not None:
            extra["frame_queue_depth"] = frame_queue_depth
        if inflight_batches is not None:
            extra["inflight_batches"] = inflight_batches
        if upload_on_submit is not None:
            extra["upload_on_submit"] = upload_on_submit
        if profile == "auto":
            extra["stream_profile"] = "auto"
        cfg = EngineConfig(det_size=(640, 640), max_faces=16, pre_nms_topk=256,
                           dtype="bfloat16", microbatch_max=max(16, n_cameras),
                           stream_transport=transport, **extra)
        app = FaceAnalysis(cfg=cfg, allowed_modules=("detection", "recognition"))
        app.prepare(ctx_id=0, det_thresh=0.3)
    cfg = app.cfg
    transport = cfg.stream_transport
    # unique per-camera frames at camera resolution (the facade letterboxes)
    base_frames = [rng.integers(0, 255, frame_hw + (3,), dtype=np.uint8)
                   for _ in range(n_cameras)]

    # Warm every bucketed batch shape the drain can produce BEFORE timing —
    # a cold compile mid-stream would otherwise stall the dispatch thread
    # for the whole measurement window.
    sizes, b = [], 1
    while b < max(16, n_cameras):
        sizes.append(b)
        b *= 2
    sizes.append(max(16, n_cameras))
    warm_frames = ([app.encode_frame(f) for f in base_frames]
                   if transport == "yuv420" else base_frames)
    for size in sizes:
        t0 = time.perf_counter()
        app.get_batch([warm_frames[i % n_cameras] for i in range(size)])
        say(f"  warm batch {size}: {time.perf_counter() - t0:.1f}s")

    # Link-health calibration: on a tunneled TPU the streaming path is
    # transfer-bound, and the shared link's real bandwidth swings ~3-30
    # MB/s between runs.  Record raw host->device MB/s (unique buffers +
    # forced scalar readback — block_until_ready doesn't block here) right
    # before the window so a congested link is distinguishable from a
    # pipeline regression when reading fps_processed.
    link_mbps = _probe_link(rng)
    if link_mbps is not None:
        say(f"  link probe: {link_mbps} MB/s host->device")

    batcher = MicroBatcher(app, cfg)
    batcher.start()

    latencies = []
    lat_lock = threading.Lock()
    done = threading.Event()
    submitted = [0] * n_cameras
    completed = [0] * n_cameras

    def camera(idx: int):
        period = 1.0 / fps
        frame = base_frames[idx]
        next_t = time.perf_counter()
        while not done.is_set():
            now = time.perf_counter()
            if now < next_t:
                time.sleep(min(period / 4, next_t - now))
                continue
            next_t += period
            # cheap uniqueness: roll the frame by the submission count
            f = np.roll(frame, submitted[idx] % 17, axis=1)
            submitted[idx] += 1
            t0 = time.perf_counter()
            if transport == "yuv420":
                # wire-format encode (and device upload when
                # upload_on_submit) on the CAPTURE thread via the prepare
                # hook: runs in parallel across cameras (ctypes/RPC release
                # the GIL) and only for ADMITTED frames
                fut = batcher.submit(f"cam{idx}", f,
                                     prepare=app.encode_frame)
            else:
                fut = batcher.submit(f"cam{idx}", f)

            def on_done(_fut, t0=t0, idx=idx):
                if getattr(_fut, "dropped", False):
                    return  # backpressure drop, not a processed frame
                with lat_lock:
                    latencies.append(time.perf_counter() - t0)
                completed[idx] += 1

            fut.add_done_callback(on_done)

    threads = [threading.Thread(target=camera, args=(i,), daemon=True)
               for i in range(n_cameras)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    sub0 = 0
    stats0 = {"dispatches": 0, "frames": 0, "dropped": 0}
    if warmup > 0:
        time.sleep(warmup)
        with lat_lock:
            latencies.clear()
        sub0 = sum(submitted)
        stats0 = dict(batcher.stats)
        say(f"  warmup {warmup:.0f}s discarded ({sub0} submitted)")
        t_start = time.perf_counter()
    time.sleep(duration)
    done.set()
    for t in threads:
        t.join(timeout=2)
    time.sleep(0.5)  # let in-flight futures resolve
    wall = time.perf_counter() - t_start
    batcher.stop()

    lats = sorted(latencies)
    n_done = len(lats)
    p = lambda q: lats[min(n_done - 1, int(q * n_done))] * 1000 if n_done else 0
    total_submitted = sum(submitted) - sub0
    n_dropped = batcher.stats["dropped"] - stats0["dropped"]
    n_frames = batcher.stats["frames"] - stats0["frames"]
    n_dispatches = batcher.stats["dispatches"] - stats0["dispatches"]
    say(f"cameras={n_cameras} @ {fps:.0f} fps nominal, {wall:.1f}s wall")
    say(f"  submitted {total_submitted} frames "
        f"({total_submitted / wall:.1f}/s), processed {n_done} "
        f"({n_done / wall:.1f}/s), dropped {n_dropped} "
        f"(backpressure)")
    say(f"  dispatches {n_dispatches} "
        f"(avg batch {n_frames / max(1, n_dispatches):.1f})")
    say(f"  processed-frame latency p50 {p(0.5):.1f} ms  "
        f"p90 {p(0.9):.1f} ms  p99 {p(0.99):.1f} ms")
    dh, dw = cfg.det_size
    frame_bytes = (app.encode_frame(base_frames[0]).nbytes
                   if transport == "yuv420" else dh * dw * 3)
    mbps = (n_frames * frame_bytes) / wall / 1e6
    say(f"  note: host->device pixel traffic ~{mbps:.0f} MB/s; on a "
        f"tunneled link (~20 MB/s here) dispatch is transfer-bound — "
        f"PCIe-attached chips lift this ~1000x (see bench.py for the "
        f"device-side ceiling)")
    out_extra = {}
    if profile == "auto":
        out_extra = {
            "profile": "auto",
            "probe_mbps": pre_link,
            "final_depth": batcher.depth,
            "final_inflight": batcher.inflight_limit,
            # controller trajectory: (t, p50_ms, fps, depth, inflight)
            "adapt": batcher.adapt_log[-12:],
        }
        say(f"  auto: final depth={batcher.depth} "
            f"inflight={batcher.inflight_limit} "
            f"({len(batcher.adapt_log)} adapt steps)")
    return {
        **out_extra,
        "cameras": n_cameras,
        "duration_s": round(wall, 1),
        "fps_submitted": round(total_submitted / wall, 1),
        "fps_processed": round(n_done / wall, 1),
        "dropped": int(n_dropped),
        "avg_batch": round(n_frames / max(1, n_dispatches), 1),
        "p50_ms": round(p(0.5), 1),
        "p90_ms": round(p(0.9), 1),
        "p99_ms": round(p(0.99), 1),
        "host_mbps": round(mbps, 1),
        "link_mbps": link_mbps,
        "transport": transport,
        "submitted": int(total_submitted),
        "processed": int(n_done),
    }


def main():
    n_cameras = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    transport = sys.argv[3] if len(sys.argv) > 3 else "rgb"
    warmup = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    run(n_cameras, duration, transport=transport, warmup=warmup)


if __name__ == "__main__":
    main()
