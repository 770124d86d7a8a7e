"""Space-to-depth ("packed") evaluation of the SCRFD deep stem.

The det_10g stem runs three 3x3 convs at 28/28/56 channels on 320x320
maps.  On TPU, NHWC tensors tile the minor (channel) dim to 128 lanes, so
a 28-channel activation occupies 128/28 = 4.6x its logical bytes and the
stem runs at ~5% MXU — measured 3.55 ms of the 6.67 ms B=8 detector
forward, by far its largest component.

This module evaluates the SAME stem weights in a space-to-depth layout:
every activation keeps 2x2 spatial blocks in the channel dim
([B,320,320,28] -> [B,160,160,112]), filling the lanes.  The packed
kernels are exact linear re-indexings of the original 3x3 kernels with
the inference BatchNorm folded in (precomputed once from the ordinary
parameter tree at engine build, so the ONNX converter and the
initializer census are untouched).  A packed conv nominally does 4x the
MACs (a 3x3 kernel over packed pixels spans 6x6 original pixels, 75%
zeros); the bet was that lane padding already burned most of them.

MEASURED RESULT (v5e-1, B=8 640x640 bf16, loop-slope timing): the bet
loses in situ.  Isolated op microbenchmarks showed packed convs 1.5-2.5x
faster, but the full stem (preprocess -> stem1/2/3 -> maxpool) measures
2.94 ms packed vs 2.56 ms for XLA's own lowering of the unpacked stem —
even after (a) precomputing kernels at engine build, (b) a separable
packed max-pool, and (c) eliminating the explicit space_to_depth input
(whose 12-channel tensor pads to 128 lanes, ~2 ms of pure relayout) by
folding stem1 into a direct 5x5/stride-4 conv on the raw input
(pack_stem1_direct).  XLA already space-to-depth-optimizes low-channel
stems internally, and the genuine 4x MACs in conv2/conv3 (contraction
252 -> 1008) are not hidden.  The same arithmetic rules out packing the
ArcFace stage-1 blocks (64ch = only 2x lane waste vs 4x MAC cost).
Kept as an opt-in experiment (EngineConfig.packed_stem, default False)
with exactness pinned by tests/test_packed_stem.py, so the negative
result stays reproducible.

Derivation of the kernel re-indexing (rows; columns are identical):
packed output row I holds original rows 2I+oi (oi in {0,1}); packed
input row P holds original rows 2P+pi.  A packed 3x3 conv at stride s
reads P = s*I + kh - 1, so the original tap offset is
  dy = 2*kh + pi - oi - 1      (stride-1 stem convs)
  dy = 2*kh + pi - 2*oi - 1    (the stride-2 stem1)
and the packed kernel entry [kh, kw, (pi,pj,ci), (oi,oj,co)] equals
W[dy, dx, ci, co] when 0 <= dy,dx <= 2, else 0.  Zero-padding matches
because every out-of-range original tap either maps to a zeroed packed
entry or to a zero-padded packed row.

The trailing 3x3/2 max-pool runs separably on the packed tensor (row
window = two phase slices of 3 packed rows, then the same on columns),
emitting the ordinary [B, H/4, W/4, 2*stem_width] tensor that stage 1 of
the backbone consumes — from there on channel counts are >= 56 and the
standard path is used.  Wired into engine/pipeline via models/scrfd.SCRFD's
``stem_out=`` when EngineConfig.packed_stem is set.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel = (h2*2 + w2)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _select_tensor(stride: int) -> np.ndarray:
    """S[k, p, o, d] = 1 iff packed tap k with input phase p contributes
    original tap d to output phase o (one spatial axis)."""
    s = np.zeros((3, 2, 2, 3), np.float32)
    for k in range(3):
        for p in range(2):
            for o in range(2):
                d = 2 * k + p - stride * o - 1
                if 0 <= d <= 2:
                    s[k, p, o, d] = 1.0
    return s


def pack_kernel(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[3, 3, Ci, Co] conv kernel -> packed [3, 3, 4Ci, 4Co] equivalent.

    One einsum against constant 0/1 selection tensors (rather than 144
    slice updates) so the packing stays a single cheap, hoistable op when
    traced inside a jitted program.
    """
    ci, co = w.shape[2], w.shape[3]
    s = jnp.asarray(_select_tensor(stride), w.dtype)
    wp = jnp.einsum("apod,bqre,decf->abpqcorf", s, s, w)
    return wp.reshape(3, 3, 4 * ci, 4 * co)


def pack_stem1_direct(w: jnp.ndarray) -> jnp.ndarray:
    """stem1 [3, 3, Ci, Co] (stride 2) -> direct packed [5, 5, Ci, 4Co].

    Evaluating packed conv1 on an explicitly space-to-depth'd input forces
    XLA to materialize a 12-channel tensor padded to 128 lanes (~10x its
    logical bytes) — measured ~2 ms of pure relayout at B=8 640x640.  The
    same op is instead expressed directly on the unpacked [B, H, W, 3]
    input: packed output pixel I, phase oi holds original stride-2 output
    row 2I+oi, which reads original rows 4I + 2*oi + dy - 1 (dy in 0..2),
    a 5-row window starting at 4I-1 -> one 5x5 conv, stride 4, padding
    (1, 0), kernel tap u = 2*oi + dy.  Contraction dim 5*5*3 = 75 stays
    inside one 128-lane MXU tile, so the 4x nominal MACs are free.
    """
    ci, co = w.shape[2], w.shape[3]
    wd = np.zeros((5, 5, ci, 2, 2, co), np.float32)
    w_np = np.asarray(w, np.float32)
    for oi in range(2):
        for oj in range(2):
            for dy in range(3):
                for dx in range(3):
                    wd[2 * oi + dy, 2 * oj + dx, :, oi, oj, :] = w_np[dy, dx]
    return jnp.asarray(wd.reshape(5, 5, ci, 4 * co), w.dtype)


def _conv(x, w, stride):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def _packed_maxpool_3x3s2(x_packed: jnp.ndarray, c: int) -> jnp.ndarray:
    """3x3/2 max-pool (pad 1) over the ORIGINAL grid, input packed.

    Separable: original row window {2t-1, 2t, 2t+1} = phase1 of packed
    row t-1 and phases 0,1 of packed row t; then the same on columns.
    x_packed: [B, H2, W2, 4C] holding the original [B, 2H2, 2W2, C].
    Returns [B, H2, W2, C].
    """
    b, h2, w2, _ = x_packed.shape
    neg = jnp.asarray(-np.inf, x_packed.dtype)

    # Rows: [B, H2, W2, 4C] -> [B, H2, W2, 2C] (row window done, cols packed)
    ph = x_packed.reshape(b, h2, w2, 2, 2 * c)  # [.., pi, (pj c)]
    ph1_up = jnp.concatenate(
        [jnp.full((b, 1, w2, 2 * c), neg), ph[:, :-1, :, 1]], axis=1)
    rows = jnp.maximum(jnp.maximum(ph[:, :, :, 0], ph[:, :, :, 1]), ph1_up)

    # Cols: [B, H2, W2, 2C] -> [B, H2, W2, C]
    pw = rows.reshape(b, h2, w2, 2, c)
    pw1_left = jnp.concatenate(
        [jnp.full((b, h2, 1, c), neg), pw[:, :, :-1, 1]], axis=2)
    return jnp.maximum(jnp.maximum(pw[:, :, :, 0], pw[:, :, :, 1]), pw1_left)


def precompute_packed_stem(variables, dtype=jnp.float32) -> dict:
    """Fold BN into packed stem kernels, once, at engine build.

    Inference BN is linear — y = conv(x, W) * inv + (beta - mean * inv),
    inv = scale / sqrt(var + eps) — so it folds into the conv as an
    output-channel scale plus a bias (exact).  Returns
    {"w": [wp1, wp2, wp3], "b": [b1, b2, b3]} with BN tiled 4x to the
    packed channel layout.
    """
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    ws, bs = [], []
    for name in ("stem1", "stem2", "stem3"):
        w = params[name]["Conv_0"]["kernel"].astype(jnp.float32)
        bn_p, bn_s = params[name]["BatchNorm_0"], stats[name]["BatchNorm_0"]
        inv = bn_p["scale"].astype(jnp.float32) / jnp.sqrt(
            bn_s["var"].astype(jnp.float32) + 1e-5)
        bias = (bn_p["bias"].astype(jnp.float32)
                - bn_s["mean"].astype(jnp.float32) * inv)
        wf = w * inv[None, None, None, :]
        wp = pack_stem1_direct(wf) if name == "stem1" else pack_kernel(wf, 1)
        ws.append(wp.astype(dtype))
        bs.append(jnp.tile(bias, 4).astype(dtype))
    return {"w": ws, "b": bs}


def packed_stem_forward_s2d4(x48, packed: dict, stem_width: int,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Evaluate the stem from s2d4-packed u8 frames — pure XLA.

    x48: [B, H/4, W/4, 48] uint8, channel = (p*4 + q)*3 + c (the layout
    the native letterbox emits; ops/stem_pallas.space_to_depth4).
    packed: output of :func:`precompute_packed_stem_s2d4`.

    This is the same math as the Pallas kernel (ops/stem_pallas.fused_stem)
    expressed as three ordinary XLA convolutions, for the packed-input
    serving path.  Round-4 in-situ measurement (benchmarks/packed_insitu.py,
    B=96 640x640 v5e): the Pallas custom call is an optimization barrier to
    XLA — the backbone consuming its output ran 88.7 ms vs 36.6 ms from
    XLA's own stem, a +41 ms composition penalty that no isolated probe
    shows (kernel alone 21.8 ms, backbone alone 25.6 ms).  Plain convs keep
    the whole detect graph inside one XLA schedule.

    conv1 is the original 3x3/stride-2 seen through the 4x4-packed input
    and a 2x2-packed output (pack_stem1_4to2): a 2x2-tap stride-1 conv
    whose left/top zero pad IS conv1's original pad-1 (preprocessed zero),
    identical grid to the input.  conv2/conv3 and the separable max-pool
    then run exactly as packed_stem_forward's.

    Returns [B, H/4, W/4, 2*stem_width].
    """
    import jax

    x = (x48.astype(dtype) - jnp.asarray(127.5, dtype)) * jnp.asarray(
        1.0 / 128.0, dtype)
    x = jax.lax.conv_general_dilated(
        x, packed["w"][0].astype(dtype),
        window_strides=(1, 1), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    x = jnp.maximum(x + packed["b"][0].astype(dtype), 0)
    for i in (1, 2):
        x = _conv(x, packed["w"][i].astype(dtype), 1)
        x = jnp.maximum(x + packed["b"][i].astype(dtype), 0)
    return _packed_maxpool_3x3s2(x, 2 * stem_width)


def precompute_packed_stem_s2d4(variables, dtype=jnp.float32) -> dict:
    """BN-folded kernels for :func:`packed_stem_forward_s2d4`.

    Same fold as precompute_packed_stem; stem1 packs 4x4-in/2x2-out
    (ops/stem_pallas.pack_stem1_4to2, K = 48 — no lane-pad rows, XLA
    owns the layout), stem2/3 pack 2x2/2x2 (pack_kernel).
    """
    from ..ops.stem_pallas import pack_stem1_4to2

    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    ws, bs = [], []
    for name in ("stem1", "stem2", "stem3"):
        w = params[name]["Conv_0"]["kernel"].astype(jnp.float32)
        bn_p, bn_s = params[name]["BatchNorm_0"], stats[name]["BatchNorm_0"]
        inv = bn_p["scale"].astype(jnp.float32) / jnp.sqrt(
            bn_s["var"].astype(jnp.float32) + 1e-5)
        bias = (bn_p["bias"].astype(jnp.float32)
                - bn_s["mean"].astype(jnp.float32) * inv)
        wf = w * inv[None, None, None, :]
        wp = pack_stem1_4to2(wf) if name == "stem1" else pack_kernel(wf, 1)
        ws.append(wp.astype(dtype))
        bs.append(jnp.tile(bias, 4).astype(dtype))
    return {"w": ws, "b": bs}


def packed_stem_forward(x, packed: dict, stem_width: int,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Evaluate the det backbone stem (stem1/2/3 + max-pool) packed.

    Args:
      x: [B, H, W, 3] preprocessed input (H, W divisible by 4).
      packed: output of :func:`precompute_packed_stem`.
      stem_width: SCRFDConfig.stem_width (28 for det_10g).
      dtype: compute dtype.

    Returns [B, H/4, W/4, 2*stem_width] — equal (up to float summation
    order) to ResNetV1e's unpacked stem output.
    """
    import jax

    # stem1, packed output, directly from the unpacked input — no explicit
    # space_to_depth (see pack_stem1_direct for why): [B,H,W,3]->[B,H/4,W/4,112]
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), packed["w"][0].astype(dtype),
        window_strides=(4, 4), padding=[(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)
    x = jnp.maximum(x + packed["b"][0].astype(dtype), 0)
    for i in (1, 2):
        x = _conv(x, packed["w"][i].astype(dtype), 1)
        x = jnp.maximum(x + packed["b"][i].astype(dtype), 0)
    return _packed_maxpool_3x3s2(x, 2 * stem_width)
