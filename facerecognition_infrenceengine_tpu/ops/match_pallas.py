"""Pallas TPU kernel: fused gallery matmul + running top-1.

The XLA formulation (ops/matching.cosine_topk) materializes the full
[B, N] score tensor in HBM and then runs ``lax.top_k`` over it — at 1M
identities that is a 256 MB f32 round-trip *on top of* the 2 GB gallery
read, and the top-k itself is another full pass.  The match is
HBM-bandwidth-bound (64x512x1M matmul is ~0.3 ms of MXU vs ~2.5 ms of
gallery reads on v5e), so those extra passes are pure loss.

This kernel streams the gallery through VMEM once, tile by tile
([TILE, 512] blocks, auto double-buffered by the Pallas pipeline), does
the [B, TILE] matmul on the MXU with f32 accumulation, and folds each
tile into a running (max, argmax) held in VMEM scratch.  Only [B] values
+ [B] indices ever leave the chip: bytes moved = gallery bytes, the
speed-of-light for this op.  A bfloat16 gallery then genuinely halves
the time (the XLA path hid that win behind the f32 score traffic —
commit 373e66c's "bf16 NOT faster" observation, root-caused).

Padding rows are masked by index (``n_valid``) rather than a [N] bool
mask: gallery snapshots always pack real rows first
(engine/gallery._CompanySnapshot), so the mask is a prefix and never
needs to be read from HBM.  Tie-breaking matches ``lax.top_k``: the
lowest index wins (within a tile via argmax, across tiles via strict >).

Matches the reference's per-face ``np.dot`` linear scan decisions
(reference infrenceServer.py:538-542, peopleCount.py:869-873) exactly
for f32 galleries.  Dispatch policy lives in ``supported()``: measured
on v5e the kernel wins for bf16 galleries >= 64k rows and for int8
always, while XLA keeps f32 (bit-exact parity, and XLA's own VMEM
residency makes it faster at small sizes).  The XLA path also stays for
k>1, arbitrary masks, and non-TPU backends (and is the golden reference
for the interpret-mode tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _top1_kernel(nvalid_ref, q_ref, g_ref, vals_ref, idx_ref,
                 best_val, best_idx, *, tile: int):
    t = pl.program_id(0)
    scores = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, tile] f32
    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < nvalid_ref[0], scores, -jnp.inf)
    m = jnp.max(scores, axis=1, keepdims=True)            # [B, 1]
    a = jnp.argmax(scores, axis=1)[:, None] + base        # [B, 1]

    @pl.when(t == 0)
    def _():
        best_val[:] = m
        best_idx[:] = a

    @pl.when(t > 0)
    def _():
        better = m > best_val[:]
        best_val[:] = jnp.where(better, m, best_val[:])
        best_idx[:] = jnp.where(better, a, best_idx[:])

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        vals_ref[:] = best_val[:]
        idx_ref[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gallery_top1(queries: jax.Array, gallery: jax.Array, n_valid: jax.Array,
                 interpret: bool = False):
    """Top-1 cosine match, single pass over the gallery.

    Args:
      queries: [B, D] normalized, same dtype as ``gallery``.
      gallery: [N, D] normalized; rows [n_valid:] are padding.  N must be
        a multiple of 8 (gallery snapshots use power-of-two capacities).
      n_valid: scalar int32, number of real rows.
      interpret: run the Pallas interpreter (CPU tests).

    Returns (values [B] float32, indices [B] int32).
    """
    n, d = gallery.shape
    b = queries.shape[0]
    if queries.dtype != gallery.dtype:
        queries = queries.astype(gallery.dtype)
    # Tile: big enough to amortize the pipeline, small enough that two
    # in-flight buffers + scores stay well under VMEM (f32 2048x512 = 4 MB).
    tile = min(2048, n)
    grid = pl.cdiv(n, tile)
    # Pad queries to the dtype's native sublane tile (8 for f32, 16 for
    # bf16 — mirroring the int8 kernel's 32) so tiny batches lower to a
    # whole VMEM tile instead of a sub-tile bf16 block.
    sub = 16 if queries.dtype == jnp.bfloat16 else 8
    b_pad = -(-b // sub) * sub
    if b_pad != b:
        queries = jnp.pad(queries, ((0, b_pad - b), (0, 0)))

    vals, idx = pl.pallas_call(
        functools.partial(_top1_kernel, tile=tile),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, 1), jnp.float32),
            pltpu.VMEM((b_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * n,
            bytes_accessed=n * d * gallery.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), queries, gallery)
    return vals[:b, 0], idx[:b, 0]


def supported(queries_len: int, gallery: jax.Array, k: int) -> bool:
    """Whether the fused kernel should handle this match.

    Policy from the measured v5e table (benchmarks/gallery_scaling.py):
    - float32: NEVER — XLA keeps loop-invariant gallery slices VMEM-
      resident at small sizes (10k: 15 us vs pallas 45 us) and is already
      at HBM speed-of-light at 1M (2.53 ms vs 2.70 ms), and f32 XLA is
      the bit-exact parity path.
    - bfloat16: from 64k rows up (100k: 169 us vs XLA 214 us; 1M: 1.37 ms
      vs 2.53 ms).  Below that XLA's VMEM residency wins.
    - int8: always (fastest at every size; the XLA fallback would have to
      dequantize).
    """
    if not (k == 1 and queries_len > 0
            and gallery.shape[0] % 8 == 0 and gallery.shape[1] % _LANES == 0
            and jax.default_backend() == "tpu"):
        return False
    if gallery.dtype == jnp.int8:
        return True
    if gallery.dtype == jnp.bfloat16:
        return gallery.shape[0] >= 65536
    return False


# ---------------------------------------------------------------------------
# int8 variant: 4x less HBM traffic than f32 (~0.7 ms / 1M IDs on v5e).
#
# Symmetric quantization with ONE global gallery scale: g_q = round(g / s),
# s = max|coord| / 127.  A global (not per-row) scale is what makes the
# kernel fast: the raw s8 x s8 -> s32 matmul output is then monotonic in
# the true score for every column, so the running (max, argmax) compares
# s32 directly — no f32 conversion, no per-column scale multiply.  (A
# per-row-scale variant was measured VPU-bound at 1.31 ms / 1M on v5e,
# i.e. zero gain over bf16; the s32-compare version is DMA-bound again.)
#
# Normalized face embeddings have coords ~N(0, 1/sqrt(512)); the global
# max over a big gallery is ~0.3, giving steps ~2.4e-3 and cosine error
# ~1e-3 — near-tie top-1 decisions can flip, so this is an OPT-IN gallery
# dtype (EngineConfig.gallery_dtype="int8"), not the parity default.
# ---------------------------------------------------------------------------

def quantize_gallery(x, headroom: float = 1.0) -> tuple:
    """[N, D] float -> (int8 values [N, D], python float global scale).
    numpy in, numpy out — used host-side when building gallery snapshots.

    ``headroom`` > 1 coarsens the scale so vectors slightly larger than the
    current gallery max can later be appended in place (incremental delta
    sync) without clipping or a full requant rebuild; 1.25 costs ~0.3 bits
    of resolution and absorbs virtually all drift from L2-normalized
    embeddings."""
    import numpy as np

    x = np.asarray(x, np.float32)
    scale = max(float(np.abs(x).max()) * headroom / 127.0, 1e-12)
    q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
    return q, scale


def _top1_int8_kernel(nvalid_ref, q_ref, g_ref, vals_ref, idx_ref,
                      best_val, best_idx, *, tile: int):
    t = pl.program_id(0)
    raw = jax.lax.dot_general(
        q_ref[:], g_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, tile] s32; monotonic in the true score (global scales)
    # Mosaic argmax is f32-only; |s32 score| <= 512*127^2 = 8.26M < 2^24,
    # so the f32 conversion is bit-exact and the compare stays exact.
    scores = raw.astype(jnp.float32)
    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < nvalid_ref[0], scores, -jnp.inf)
    m = jnp.max(scores, axis=1, keepdims=True)
    a = jnp.argmax(scores, axis=1)[:, None] + base

    @pl.when(t == 0)
    def _():
        best_val[:] = m
        best_idx[:] = a

    @pl.when(t > 0)
    def _():
        better = m > best_val[:]
        best_val[:] = jnp.where(better, m, best_val[:])
        best_idx[:] = jnp.where(better, a, best_idx[:])

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        vals_ref[:] = best_val[:]
        idx_ref[:] = best_idx[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gallery_top1_int8(queries: jax.Array, gallery_q: jax.Array,
                      gallery_scale, n_valid: jax.Array,
                      interpret: bool = False):
    """Top-1 match against an int8-quantized gallery (global scale).

    Args:
      queries: [B, D] float32 normalized (quantized on the fly, one
        global scale per batch — keeps the s32 compare monotonic).
      gallery_q: [N, D] int8 quantized gallery.
      gallery_scale: scalar f32 global gallery scale.
      n_valid: scalar int32 count of real rows.

    Returns (values [B] float32 approximate cosines, indices [B] int32).
    """
    n, d = gallery_q.shape
    b = queries.shape[0]
    queries = queries.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(queries)), 1e-12) / 127.0
    q_int = jnp.clip(jnp.rint(queries / qs), -127, 127).astype(jnp.int8)

    tile = min(2048, n)
    grid = pl.cdiv(n, tile)
    # int8 min sublane tile is 32; pad the query batch accordingly.
    b_pad = max(32, -(-b // 32) * 32)
    if b_pad != b:
        q_int = jnp.pad(q_int, ((0, b_pad - b), (0, 0)))

    vals_raw, idx = pl.pallas_call(
        functools.partial(_top1_int8_kernel, tile=tile),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, 1), jnp.float32),
            pltpu.VMEM((b_pad, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * d * n,
            bytes_accessed=n * d,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(n_valid, jnp.int32).reshape(1), q_int, gallery_q)
    scale = qs * jnp.asarray(gallery_scale, jnp.float32)
    return vals_raw[:b, 0] * scale, idx[:b, 0]
