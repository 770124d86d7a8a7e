"""Gallery match QPS vs gallery size, dtype, and implementation.

The reference's per-frame hot loop is an O(N) python cosine scan
(reference infrenceServer.py:538-542).  Here the k=1 match is a fused
Pallas kernel (ops/match_pallas.py) that streams the gallery through
VMEM once; the XLA path (ops/matching.cosine_topk) is the fallback and
the baseline this table compares against.

ROOT CAUSE of the round-1 "bf16 NOT faster" contradiction (commit
373e66c vs the HBM-bound claim): the match IS HBM-bandwidth-bound, but
in the XLA path the bandwidth is not just gallery bytes — XLA
materializes the full [B, N] f32 score tensor and re-reads it for
lax.top_k, so halving the gallery bytes left the f32 score traffic
dominating (measured v5e, 1M IDs, B=64: XLA f32 2.57 ms, XLA bf16
2.51 ms — no win).  The fused kernel's only HBM traffic is the gallery
itself (running top-1 lives in VMEM), so dtype now scales the time:
pallas f32 2.71 ms / bf16 1.33 ms / int8 0.72 ms (~745-810 GB/s, the
chip's ~819 GB/s speed of light).

Galleries are generated on device (the 2 GB 1M-ID matrix would take
minutes over the axon tunnel's ~20 MB/s link).

Usage: python benchmarks/gallery_scaling.py [n_queries]
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
if (jax.default_backend() == "tpu"
        and not jax.config.jax_compilation_cache_dir):
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/fre_bench_scratch_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def loop_time(run, n1, n2, reps=5):
    run(n1)
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


def device_gallery(cap: int, n_ids: int, d: int = 512):
    """Normalized f32 gallery with zeroed padding rows, built on device."""
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

    @jax.jit
    def build():
        g = jax.random.normal(jax.random.PRNGKey(0), (cap, d), jnp.float32)
        g = l2_normalize(g)
        return jnp.where((jnp.arange(cap) < n_ids)[:, None], g, 0.0)

    return build()


def quantize_on_device(g):
    scale = float(jnp.max(jnp.abs(g))) / 127.0
    q = jnp.clip(jnp.rint(g / scale), -127, 127).astype(jnp.int8)
    return q, scale


def main():
    from facerecognition_infrenceengine_tpu.ops import match_pallas
    from facerecognition_infrenceengine_tpu.ops.matching import (
        cosine_topk, l2_normalize)

    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    q32 = l2_normalize(jnp.asarray(rng.normal(size=(n_q, 512)).astype(np.float32)))
    on_tpu = jax.default_backend() == "tpu"

    print(f"device={jax.devices()[0]}, queries={n_q}, top-1")
    print(f"{'gallery':>11} {'dtype':>9} {'impl':>7} {'us/batch':>10} "
          f"{'matches/s':>12} {'GB/s':>6}")
    for n_ids in (10_000, 100_000, 1_000_000):
        cap = 1 << (n_ids - 1).bit_length()
        g32 = device_gallery(cap, n_ids)
        valid = jnp.arange(cap) < n_ids
        n1, n2 = (64, 512) if n_ids <= 100_000 else (8, 64)

        def bench(fn_body, arrays, tag, dtype_name, nbytes):
            # Arrays are jit ARGUMENTS, never closure constants — a
            # captured gallery would be embedded in the HLO and shipped
            # to the tunnel's remote compiler wholesale.
            loop = jax.jit(lambda q0, n, *arrs: jax.lax.fori_loop(
                0, n,
                lambda i, acc: acc + fn_body(
                    q0 + (i % 7).astype(jnp.float32) * 1e-3, *arrs),
                jnp.float32(0.0)))

            def run(n):
                return float(loop(q32, jnp.int32(n), *arrays))

            s = loop_time(run, n1, n2)
            print(f"{n_ids:>11,} {dtype_name:>9} {tag:>7} {s*1e6:>10.1f} "
                  f"{n_q/s:>12,.0f} {nbytes/s/1e9:>6.0f}")

        def xla_body(q0, g, v):
            vals, idx = cosine_topk(q0.astype(g.dtype), g, v, k=1)
            return vals.sum() + idx.sum().astype(jnp.float32)

        def pl_body(q0, g):
            vals, idx = match_pallas.gallery_top1(q0.astype(g.dtype), g,
                                                  n_ids)
            return vals.sum() + idx.sum().astype(jnp.float32)

        def i8_body(q0, gq, gscale):
            vals, idx = match_pallas.gallery_top1_int8(q0, gq, gscale, n_ids)
            return vals.sum() + idx.sum().astype(jnp.float32)

        for dtype in (jnp.float32, jnp.bfloat16):
            g = g32.astype(dtype)
            nbytes = cap * 512 * g.dtype.itemsize
            bench(xla_body, (g, valid), "xla", g.dtype.name, nbytes)
            if on_tpu:
                bench(pl_body, (g,), "pallas", g.dtype.name, nbytes)

        if on_tpu:
            gq, gscale = quantize_on_device(g32)
            bench(i8_body, (gq, jnp.float32(gscale)), "pallas", "int8",
                  cap * 512)


def manager_path(n_ids: int = (1 << 20) - 64, n_q: int = 64):
    """GalleryManager-path benchmark at the 1M-ID axis (VERDICT r2 #2):

    - full production ``snapshot.match`` wall time per dtype (host round
      trip + id mapping included — what a GalleryManager.match caller pays),
    - O(delta) sync cost: ``apply_delta`` for a 1-person update and a
      1-person append against the 1M-row device matrix (vs the r2 behavior
      of re-stacking + re-uploading ~2 GB per delta).
    """
    from bench import gallery_snapshots  # repo-root import
    from facerecognition_infrenceengine_tpu.engine.gallery import (
        _CompanySnapshot)
    from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

    cap = 1 << (n_ids - 1).bit_length()
    snaps, gal = gallery_snapshots(cap)
    rng = np.random.default_rng(3)
    probes = np.asarray(gal[:n_q], np.float32)
    print(f"\nGalleryManager snapshot path, {n_ids:,} live of {cap:,} rows:")
    for dname, full in snaps.items():
        if dname != "f32" and jax.default_backend() != "tpu":
            continue
        # live prefix < cap so appends have headroom (production shape)
        snap = _CompanySnapshot._evolved(
            full, full.ids[:n_ids], dict(list(full.row_of.items())[:0]),
            {}, full.device_matrix,
            jnp.arange(cap) < n_ids, n_ids)
        snap.row_of = {pid: i for i, pid in enumerate(snap.ids)}
        snap.match(probes)  # warm
        t0 = time.perf_counter()
        calls = 10
        for i in range(calls):
            snap.match(probes + np.float32(1e-3 * (i % 7)))
        ms = (time.perf_counter() - t0) / calls * 1e3
        print(f"  match({n_q} queries) {dname:>5}: {ms:8.2f} ms/call "
              f"({n_q / ms * 1e3:,.0f} QPS)")

        vec = rng.normal(size=512).astype(np.float32)
        vec /= np.linalg.norm(vec) * (4.0 if dname == "int8" else 1.0)
        warm = snap.apply_delta({"7": vec}, {"7": {}}, set(),
                                lambda pid: vec)  # compile the scatter
        np.asarray(warm.device_matrix[7])
        t0 = time.perf_counter()
        upd = snap.apply_delta({"42": vec}, {"42": {}}, set(),
                               lambda pid: vec)
        np.asarray(upd.device_matrix[42])  # force the scatter
        t_upd = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        app = snap.apply_delta({"new-person": vec}, {"new-person": {}},
                               set(), lambda pid: vec)
        np.asarray(app.device_matrix[n_ids])
        t_app = (time.perf_counter() - t0) * 1e3
        assert app is not None and app.size == n_ids + 1
        print(f"  apply_delta 1-row update: {t_upd:6.1f} ms, append: "
              f"{t_app:6.1f} ms (r2 rebuilt + re-uploaded "
              f"{cap * 512 * full.device_matrix.dtype.itemsize / 1e9:.1f} GB)")


if __name__ == "__main__":
    main()
    if "--manager" in sys.argv or os.environ.get("GALLERY_MANAGER_BENCH"):
        manager_path()
