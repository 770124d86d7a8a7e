"""Per-stage device-time ablation of the ArcFace IResNet-50 embedder.

Times IResNet-50 truncated after each stage (128 faces, bf16, loop-slope
method) so per-stage MXU utilisation can be derived.  Measured v5e-1
(2026-08-17, 128 crops): stage1 2.66 ms, stage2 1.83, stage3 4.49,
stage4 1.05 -> 52% / 75% / 97% / 99% of bf16 peak respectively.
Conclusion recorded in BASELINE.md: XLA already sits at the hardware
roofline for this network — stage1's 52% IS the ceiling, because its
64 output channels fill only half of the MXU's 128 lanes (and Mosaic
supports no reshape that could pack two output columns per lane-tile),
so no Pallas kernel can beat it.  Usage: python benchmarks/embed_stages.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn
if (jax.default_backend() == "tpu"
        and not jax.config.jax_compilation_cache_dir):
    jax.config.update("jax_compilation_cache_dir", "/tmp/fre_bench_scratch_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from facerecognition_infrenceengine_tpu.core.config import EngineConfig
from facerecognition_infrenceengine_tpu.engine import FaceEngine
from facerecognition_infrenceengine_tpu.models.arcface import IBasicBlock
from facerecognition_infrenceengine_tpu.models.layers import PReLU

def loop_time(fn_body, args, n1=10, n2=60, reps=4):
    def loop(n, *a):
        def body(i, acc):
            return acc + fn_body(i, *a)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    jfn = jax.jit(loop)
    float(jfn(jnp.int32(n1), *args)); float(jfn(jnp.int32(n2), *args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(jfn(jnp.int32(n1), *args))
        t1 = time.perf_counter(); float(jfn(jnp.int32(n2), *args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best

class Trunc(nn.Module):
    """IResNet truncated after `upto` stages (0 = stem only)."""
    upto: int
    dtype: jnp.dtype = jnp.bfloat16
    depths = (3, 4, 14, 3)
    widths = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = PReLU()(x)
        for s, (depth, width) in enumerate(zip(self.depths, self.widths)):
            if s >= self.upto:
                break
            x = IBasicBlock(width, stride=2, dtype=self.dtype)(x, False)
            for _ in range(depth - 1):
                x = IBasicBlock(width, stride=1, dtype=self.dtype)(x, False)
        return x

M = 128
rng = np.random.default_rng(0)
crops = jnp.asarray(rng.normal(size=(M, 112, 112, 3)).astype(np.float32))

prev = 0.0
for upto in (0, 1, 2, 3, 4):
    m = Trunc(upto=upto)
    v = m.init(jax.random.PRNGKey(0), crops[:1])
    t = loop_time(lambda i, c, m=m, v=v: jnp.sum(
        m.apply(v, c + (i % 3).astype(jnp.float32)).astype(jnp.float32)), (crops,))
    print(f"upto stage {upto}: {t*1e3:7.2f} ms  (delta {1e3*(t-prev):+6.2f} ms)", flush=True)
    prev = t
