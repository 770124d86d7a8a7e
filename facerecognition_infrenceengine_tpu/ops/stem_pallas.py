"""Pallas TPU kernel: the fused SCRFD deep stem (3 convs + max-pool).

The det_10g stem (reference infrenceServer.py:412-416 serves SCRFD-10GF,
whose ResNetV1e backbone opens with 3x3 convs at 28/28/56 channels on
320x320 maps) is the least TPU-shaped part of the whole pipeline: NHWC
activations tile the channel dim to 128 lanes, so every 28-channel
intermediate occupies 128/28 = 4.6x its logical bytes in HBM.  Measured
at B=8 640x640 bf16 the XLA stem costs 2.56 ms — almost exactly the
HBM round-trip time of its three ~210 MB lane-padded intermediates,
i.e. it is pure relayout bandwidth, not compute.

This kernel removes that traffic entirely by keeping the whole stem in
VMEM, evaluated in space-to-depth packed layout (models/packed_stem.py
derives the exact kernel re-indexings; this file reuses its math):

  HBM:  x4  [B, H4+8, W4+1, 48]   4x4-packed preprocessed input
                                   (zero rows/cols double as both conv
                                   padding and tile halo)
  VMEM: conv1 as a 2x2-tap conv (the original 3x3/stride-2 seen through
        4x4-packed input and 2x2-packed output), K=192 -> N=112
        conv2/conv3 as 3x3-tap convs over the 2x2-packed grid,
        K=112 -> N=112 / N=224, 9 shifted matmuls each, f32 accumulate
        separable packed 3x3/2 max-pool (rows then cols)
  HBM:  out [B, H4, W4, 2*stem_width]  (H4 = H/4) — what backbone
        stage 1 consumes

Packed channels (112/224) fill the MXU lanes, so the nominal 4x MACs of
packed evaluation cost what the lane padding was already burning.  The
grid tiles (batch, H4/T) row bands; each program DMAs its T+6-row
haloed input slice HBM->VMEM and writes one [T, W4, 56] output block.
Boundary semantics: the original convs zero-pad at the 640 grid and the
max-pool pads with -inf; virtual rows outside the image are masked by
global row index (conv rows to 0 = conv padding, the max-pool's
orig-row -1 phase to -inf) so tile 0 / the last tile reproduce the
unfused stem exactly.

MEASURED RESULT (v5e-1, B=8 640x640 bf16, loop-slope timing): isolated,
the kernel wins — XLA stem 3.09 ms vs 2.65 ms from raw frames (the
on-device u8 space-to-depth transpose is ~1.1 ms of that; XLA lowers
byte-granular transposes poorly) and 1.55 ms from host-packed s2d4
input (pad_packed_u8), a true 2x.  In situ the picture flips: a
same-process A/B of the complete detect+NMS program measured the
kernel path ~1.1 ms slower (7.5-7.9 vs 6.4-6.8 ms) — embedded in the
full graph XLA optimizes its own stem beyond what isolated probes
show, and the raw-frame path pays the s2d transpose on every dispatch.
The host-packed path (the one that genuinely wins) is unusable by the
fused pipeline today because the warp stage's pyramid atlas
(ops/warp2pass.build_atlas) samples raw-layout pixels.  Hence
EngineConfig.stem_kernel defaults to "off"; the kernel remains for
packed-input detect-only deployments (a native letterbox that emits
s2d4 directly — the permutation is free at pixel-writing time — plus a
packed-atlas warp would unlock it end-to-end).

The XLA path (models/packed_stem.packed_stem_forward or the plain flax
stem) remains the golden reference — interpret-mode tests pin this
kernel against it (tests/test_stem_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.packed_stem import pack_kernel

_PAD_TOP = 4  # halo(3) + conv1 pad(1) rows baked into the x4 layout
_PAD_BOT = 4


def space_to_depth4(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/4, W/4, 16C], channel = (p*4 + q)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 4, w // 4, 16 * c)


def depth_to_space4(x4: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth4`: [B, H/4, W/4, 16C] -> [B, H, W, C].

    In situ this is nearly free: feeding the raw detect program from
    depth_to_space4(packed) measured 41.9 ms vs 39.7 ms from raw frames
    (B=96 640x640 v5e, benchmarks/packed_insitu.py) — XLA fuses the u8
    permutation into the stem's input preprocessing, unlike the forward
    (pack) direction whose standalone byte transpose costs ~1.1 ms/B=8.
    This makes "unpack then run the raw program" the best packed-INPUT
    strategy (EngineConfig.packed_stem_impl="unpack"), beating both this
    module's Pallas kernel (+52 ms in situ: the custom call is an
    optimization barrier to the backbone schedule) and the pure-XLA
    packed stem (+27 ms: packed conv2/3 genuinely pay 4x MACs).
    """
    b, h4, w4, c16 = x4.shape
    c = c16 // 16
    x = x4.reshape(b, h4, w4, 4, 4, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h4 * 4, w4 * 4, c)


def pack_stem1_4to2(w: jnp.ndarray) -> jnp.ndarray:
    """stem1 [3, 3, C, Co] (stride 2) -> [2, 2, 16C, 4Co].

    Conv1 seen through a 4x4-packed input and 2x2-packed output: packed
    output pixel I phase oi holds original stride-2 output row 2I+oi,
    which reads original rows 4I + 2*oi + dy - 1 (dy in 0..2) — rows
    4I-1..4I+3, i.e. phase 3 of packed-4 pixel I-1 plus all phases of
    pixel I.  With the input stored left/top-padded by one packed pixel
    (x4 layout) this is a plain 2x2-tap conv: tap kh reads pixel
    I-1+kh, and W4[kh, ., (pi*4+pj)*C + c, (oi*2+oj)*Co + co] =
    W[dy, dx, c, co] with dy = 4*kh + pi - 2*oi - 3 when 0 <= dy <= 2.
    """
    c, co = w.shape[2], w.shape[3]
    w_np = np.asarray(w, np.float32)
    w4 = np.zeros((2, 2, 4, 4, c, 2, 2, co), np.float32)
    for kh in range(2):
        for kw in range(2):
            for pi in range(4):
                for pj in range(4):
                    for oi in range(2):
                        for oj in range(2):
                            dy = 4 * kh + pi - 2 * oi - 3
                            dx = 4 * kw + pj - 2 * oj - 3
                            if 0 <= dy <= 2 and 0 <= dx <= 2:
                                w4[kh, kw, pi, pj, :, oi, oj, :] = w_np[dy, dx]
    return jnp.asarray(w4.reshape(2, 2, 16 * c, 4 * co), w.dtype)


def precompute_fused_stem(variables, dtype=jnp.bfloat16) -> dict:
    """BN-folded packed stem weights for :func:`fused_stem` (built once
    at engine init from the ordinary parameter tree, exactly like
    models/packed_stem.precompute_packed_stem)."""
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    out = {}
    for i, name in enumerate(("stem1", "stem2", "stem3")):
        w = params[name]["Conv_0"]["kernel"].astype(jnp.float32)
        bn_p, bn_s = params[name]["BatchNorm_0"], stats[name]["BatchNorm_0"]
        inv = bn_p["scale"].astype(jnp.float32) / jnp.sqrt(
            bn_s["var"].astype(jnp.float32) + 1e-5)
        bias = (bn_p["bias"].astype(jnp.float32)
                - bn_s["mean"].astype(jnp.float32) * inv)
        wf = w * inv[None, None, None, :]
        if i == 0:
            wp = pack_stem1_4to2(wf)
            # zero rows for x4's 48->128 lane padding
            wp = jnp.concatenate(
                [wp, jnp.zeros((2, 2, 128 - wp.shape[2], wp.shape[3]),
                               wp.dtype)], axis=2)
        else:
            wp = pack_kernel(wf, 1)
        out[f"w{i + 1}"] = wp.astype(dtype)
        out[f"b{i + 1}"] = jnp.tile(bias, 4).astype(jnp.float32)[None, :]
    return out


def _conv_taps(x, w_ref, bias, rows_out, cols_out, row_mask):
    """Sum-of-shifted-matmuls conv: x [R_in, C_in, K], w_ref [th, tw, K, N].

    Returns relu(conv + bias) * row_mask as [rows_out, cols_out, N] (the
    caller arranges x's col layout so the col taps realize the conv's
    col padding; cols_out is explicit because x may carry extra
    DMA-alignment columns on the right).  row_mask zeroes rows outside
    the image so they act as the original conv's zero padding for the
    next level.
    """
    th, tw = w_ref.shape[0], w_ref.shape[1]
    acc = None
    for dy in range(th):
        for dx in range(tw):
            lhs = x[dy:dy + rows_out, dx:dx + cols_out, :]
            term = jax.lax.dot_general(
                lhs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    out = jnp.maximum(acc + bias[None, :, :], 0.0) * row_mask
    return out


def _stem_kernel(x4_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 out_ref, xin, sem, *, tile: int, h4: int, w4: int,
                 sw: int, dtype, in_u8: bool):
    t = pl.program_id(1)
    r0 = t * tile

    # Haloed input band: rows [r0, r0 + T+6) of the padded x4 tensor
    # (row j holds packed row j - _PAD_TOP; outside-image rows are 0).
    dma = pltpu.make_async_copy(
        x4_ref.at[pl.program_id(0), pl.ds(r0, tile + 6)], xin, sem)
    dma.start()
    dma.wait()
    if in_u8:
        # u8 x4: preprocess in-kernel, then force the padding positions
        # (u8 value 0 -> -0.996 after the affine) back to preprocessed-0
        # so they keep acting as the convs' zero padding.
        x = xin[:].astype(jnp.int32).astype(jnp.float32)
        x = (x - 127.5) * (1.0 / 128.0)
        n = tile + 6
        g = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0) + (r0 - _PAD_TOP)
        row_ok = (g >= 0) & (g < h4)
        cj = jax.lax.broadcasted_iota(jnp.int32, (1, xin.shape[1], 1), 1)
        col_ok = (cj >= 1) & (cj <= w4)
        x = jnp.where(row_ok & col_ok, x, 0.0).astype(dtype)
    else:
        x = xin[:].astype(dtype)

    def row_mask(first_row, n):
        # 1.0 where the global packed row index is inside [0, h4) —
        # virtual rows become the next conv's zero padding.
        g = (jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
             + (r0 + first_row))
        return jnp.where((g >= 0) & (g < h4), 1.0, 0.0)

    # conv1: 2x2 taps on the packed-4 grid -> [T+5, W4, 112], rows
    # r0-3 .. r0+T+1.  Cols: x4's left zero pixel is the conv padding.
    c1 = _conv_taps(x, w1_ref, b1_ref[:], tile + 5, w4,
                    row_mask(-3, tile + 5)).astype(dtype)
    zc = jnp.zeros((tile + 5, 1, 4 * sw), dtype)
    c1 = jnp.concatenate([zc, c1, zc], axis=1)  # conv2's col padding

    # conv2: 3x3 taps -> [T+3, W4, 112], rows r0-2 .. r0+T.
    c2 = _conv_taps(c1, w2_ref, b2_ref[:], tile + 3, w4,
                    row_mask(-2, tile + 3)).astype(dtype)
    zc = jnp.zeros((tile + 3, 1, 4 * sw), dtype)
    c2 = jnp.concatenate([zc, c2, zc], axis=1)

    # conv3: 3x3 taps -> [T+1, W4, 224], rows r0-1 .. r0+T-1.
    c3 = _conv_taps(c2, w3_ref, b3_ref[:], tile + 1, w4,
                    row_mask(-1, tile + 1)).astype(dtype)

    # Separable packed 3x3/2 max-pool.  Channels of c3: (pi*2+pj)*2sw+c.
    # Output row t's orig-row window {2t-1, 2t, 2t+1} = (row t-1, pi=1)
    # + (row t, pi=0,1); orig row -1 is max-pool padding = -inf.
    neg = jnp.asarray(-jnp.inf, dtype)
    half = 4 * sw  # pi=1 channel offset (2 * 2sw)
    tm1_ok = (jax.lax.broadcasted_iota(jnp.int32, (tile, 1, 1), 0) + r0) > 0
    rows = jnp.maximum(
        jnp.maximum(c3[1:, :, :half], c3[1:, :, half:]),
        jnp.where(tm1_ok, c3[:-1, :, half:], neg))
    # Cols: window {2c-1, 2c, 2c+1} = (col c-1, pj=1) + (col c, pj=0,1).
    # The -inf halo column is concatenated before any lane slicing so the
    # concat operands stay offset-aligned (Mosaic rejects concats whose
    # inputs carry sublane/lane offsets on non-concat dims).
    qtr = 2 * sw
    rowsp = jnp.concatenate(
        [jnp.full((tile, 1, 2 * qtr), neg, dtype), rows], axis=1)
    out = jnp.maximum(jnp.maximum(rowsp[:, 1:, :qtr], rowsp[:, 1:, qtr:]),
                      rowsp[:, :-1, qtr:])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("w4", "stem_width", "interpret"))
def fused_stem(x4: jnp.ndarray, packed: dict, w4: int, stem_width: int = 28,
               interpret: bool = False) -> jnp.ndarray:
    """Fused SCRFD stem on a 4x4-packed padded input.

    Args:
      x4: [B, H4+8, >=W4+1, 128] output of :func:`prepare_input`.
      packed: weights from :func:`precompute_fused_stem`.
      w4: frame W/4 (not recoverable from x4's 8-aligned padded width).
      stem_width: SCRFDConfig.stem_width (28 for det_10g).
      interpret: run the Pallas interpreter (CPU tests).

    Returns [B, H4, W4, 2*stem_width], H4 = H/4 — bit-comparable to the
    flax stem up to f32 summation order.
    """
    b, h4p, w4p, _ = x4.shape
    h4 = h4p - _PAD_TOP - _PAD_BOT
    tile = 16 if h4 % 16 == 0 else h4
    dtype = packed["w1"].dtype
    kernel = functools.partial(
        _stem_kernel, tile=tile, h4=h4, w4=w4, sw=stem_width, dtype=dtype,
        in_u8=x4.dtype == jnp.uint8)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h4 // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x4 stays in HBM
            wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, tile, w4, 2 * stem_width),
            lambda i, t: (i, t, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h4, w4, 2 * stem_width), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 6, w4p, 128), x4.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x4, packed["w1"], packed["b1"], packed["w2"], packed["b2"],
      packed["w3"], packed["b3"])


@functools.partial(jax.jit, static_argnames=("dtype",))
def prepare_input(frames_u8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, H, W, 3] u8 frames -> [B, H/4+8, >=W/4+1, 128] preprocessed
    4x4-packed stem input (insightface (x - 127.5)/128, scrfd.preprocess).

    The zero padding plays two roles at once: the +1 left/top pixel is
    conv1's original pad-1 (zero in preprocessed space), and the extra
    3 halo rows top/bottom let every kernel tile DMA a fixed-size band
    without bounds branches.

    With ``dtype=jnp.uint8`` the cast/affine move into the kernel (the
    kernel re-zeroes padding positions itself), shrinking this step to
    the s2d transpose + u8 pad.
    """
    x = space_to_depth4(frames_u8)
    if dtype == jnp.uint8:
        return pad_packed_u8(x)
    x = (x.astype(dtype) - jnp.asarray(127.5, dtype)) * jnp.asarray(
        1.0 / 128.0, dtype)
    # Right-pad cols to 8 sublanes and channels to 128 lanes: Mosaic
    # requires DMA slice dims aligned to the (8, 128) tiling, and the
    # HBM memref is physically lane-padded to 128 regardless — making it
    # logical costs nothing.  The kernel never reads the extra cols, and
    # the extra channels hit zero rows of w1.
    w4 = x.shape[2]
    right = (-(w4 + 1)) % 8
    return jnp.pad(x, ((0, 0), (_PAD_TOP, _PAD_BOT), (1, right),
                       (0, 128 - x.shape[3])))


@jax.jit
def pad_packed_u8(x48: jnp.ndarray) -> jnp.ndarray:
    """[B, H4, W4, 48] u8 4x4-packed frames -> padded u8 x4 for
    :func:`fused_stem`.

    This is the production input contract when the host (native letterbox,
    native/imagecodec.cc) already emits frames in s2d4 layout — the same
    bytes as [H, W, 3], permuted at writing time for free — leaving only
    zero-padding on device.  u8 tiling is (32, 128), so cols pad to a
    multiple of 32.
    """
    w4 = x48.shape[2]
    right = (-(w4 + 1)) % 32
    return jnp.pad(x48, ((0, 0), (_PAD_TOP, _PAD_BOT), (1, right),
                         (0, 128 - x48.shape[3])))
