"""Gallery match QPS vs gallery size (the reference's only scale axis).

The reference's per-frame hot loop is an O(N) python cosine scan
(reference infrenceServer.py:538-542).  Here matching is an L2-normalized
matmul + top-k on device; this benchmark sweeps gallery size on one chip
and — with JAX_GALLERY_MESH=8 on a CPU host — the sharded
distributed_topk path over a virtual mesh.

Usage: python benchmarks/gallery_scaling.py [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
        _jax_cache_gate.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass



def loop_time(run, n1=64, n2=1024, reps=5):
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


def main():
    from facerecognition_infrenceengine_tpu.ops.matching import (
        cosine_topk, l2_normalize)

    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    q_host = rng.normal(size=(n_q, 512)).astype(np.float32)

    print(f"device={jax.devices()[0]}, queries={n_q}, top-k=1")
    for n_ids in (10_000, 100_000, 1_000_000):
        gal = l2_normalize(jnp.asarray(
            rng.normal(size=(n_ids, 512)).astype(np.float32)))
        q = l2_normalize(jnp.asarray(q_host))
        valid = jnp.ones((n_ids,), bool)

        def loop(q0, g, v, n):
            def body(i, acc):
                vals, idx = cosine_topk(
                    q0 + i.astype(jnp.float32) * 1e-6, g, v, k=1)
                return acc + vals.sum() + idx.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        fn = jax.jit(loop)

        def run(n):
            return float(fn(q, gal, valid, jnp.int32(n)))

        s = loop_time(run)
        print(f"  gallery {n_ids:>9,}: {s*1e6:8.1f} us/batch  "
              f"{n_q/s:12,.0f} matches/s  "
              f"{n_ids*n_q/s/1e12:6.2f} TFLOP-equiv/s x2")


if __name__ == "__main__":
    main()
