"""MXU-friendly affine face warp: two-pass resampling as batched matmuls.

TPU has no hardware gather — the straightforward bilinear warp
(ops/align.py) lowers to scalar loads and costs ~1 ms/face.  This module
implements the same affine sampling as two 1-D resampling passes, each a
small batched matmul (Catmull–Smith two-pass resampling with the exact
geometric mapping):

  inverse map (dst -> src):  sx = m00*j + m01*i + m02
                             sy = m10*j + m11*i + m12
  pass 1 (horizontal), tmp indexed by source row y:
      tmp[y, j] = interp_x img[y, u(y, j)],
      u(y, j) = (m00 - m01*m10/m11)*j + (m01/m11)*y + (m02 - m01*m12/m11)
  pass 2 (vertical):
      out[i, j] = interp_y tmp[sy(i, j), j]

Each interp is a hat-weight matrix contraction — dense matmuls the MXU eats.
The mapping is geometrically exact for any affine with m11 != 0 (in-plane
rotations < 90 deg, which face alignment always satisfies); the interpolation
footprint is a sheared bilinear hat, within a fraction of a pixel of cv2's
axis-aligned hat for |rotation| < ~30 deg (test_ops_warp2pass.py quantifies).

Faces larger than the static ROI window sample from an average-pool pyramid
level chosen per face, so arbitrary face scales keep one compiled shape.
Cost shape: the pyramid lives as one u8 atlas (levels side by side), each
face costs exactly ONE small dynamic-slice whose origin encodes its level,
and the hat-weight einsums run once per face with the output positions on
the MXU lanes.  128 faces: ~5 ms on v5e (the first version warped every
level and selected after — 38 ms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .align import ARCFACE_DST, umeyama_similarity, _invert_affine

ROI = 192  # static ROI window (source pixels) per face, per pyramid level
HALO = 3.0  # extra source pixels beyond the crop's exact axis-aligned
            # extent: bilinear taps (1) + ROI-origin rounding (1) + slack


def build_atlas(frames: jnp.ndarray, levels: int = 4):
    """Pyramid as ONE uint8 image per frame, levels side by side.

    Keeping the pyramid u8 and concatenated means the per-face ROI read is
    a single small dynamic-slice from one array (the level choice becomes
    an x-offset) instead of four f32 slices + a 4-way select — the f32
    pyramid + select dominated the whole warp's device time.  Pooling sums
    in int32 with round-half-up, so each level is within 0.5 LSB of the f32
    mean (and level 0 is the input, bit-exact).

    Returns (atlas [B, H_a, W_a, C], offsets: list of (x_off, lw, lh)).
    The atlas keeps uint8 for uint8 input (the production camera path);
    float input keeps a float32 atlas so synthetic/HDR frames stay exact.
    """
    b, h0, w0, c = frames.shape
    if frames.dtype == jnp.uint8:
        x = frames
        pyr = [x]
        # Stride-2 sum as a conv with a constant identity kernel: the
        # int32 reshape-sum formulation measured ~1.7 ms/B=8 on v5e
        # (integer/lane-padded relayout); the f32 conv is bandwidth-speed
        # and bit-exact (integer sums < 2**24, power-of-two rounding).
        eye = jnp.asarray(np.tile(np.eye(c, dtype=np.float32)[None, None],
                                  (2, 2, 1, 1)))
        acc = x.astype(jnp.float32)
        for lvl in range(1, levels):
            acc = jax.lax.conv_general_dilated(
                acc, eye, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            pyr.append(jnp.floor(acc / (4 ** lvl) + 0.5).astype(jnp.uint8))
    else:
        x = frames.astype(jnp.float32)
        pyr = [x]
        for _ in range(1, levels):
            bb, h, w, _ = x.shape
            x = x.reshape(bb, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            pyr.append(x)
    h_a = max(max(p.shape[1] for p in pyr), ROI)
    cols, offsets = [], []
    x_off = 0
    for p in pyr:
        _, lh, lw, _ = p.shape
        # edge-pad (border-replicate) up to the ROI window so clamped slices
        # of tiny levels read replicated borders, not zeros...
        pad_w = max(ROI - lw, 0)
        pad_h_edge = max(ROI - lh, 0)
        if pad_w or pad_h_edge:
            p = jnp.pad(p, ((0, 0), (0, pad_h_edge), (0, pad_w), (0, 0)),
                        mode="edge")
        # ...then zero-fill the never-read rows down to the atlas height.
        pad_h_zero = h_a - p.shape[1]
        if pad_h_zero:
            p = jnp.pad(p, ((0, 0), (0, pad_h_zero), (0, 0), (0, 0)))
        cols.append(p)
        offsets.append((x_off, max(lw, ROI), max(lh, ROI)))
        x_off += p.shape[2]
    return jnp.concatenate(cols, axis=2), offsets


def _hat_weights(coords: jnp.ndarray, n_in: int) -> jnp.ndarray:
    """coords [..., K] -> hat (linear interp) weights [..., K, n_in].

    Rows sum to 1 for in-range coords; out-of-range coords clamp to the
    border (replicate), matching ops.align.warp_affine_bilinear.
    """
    c = jnp.clip(coords, 0.0, n_in - 1.0)
    idx = jax.lax.broadcasted_iota(jnp.float32, (n_in,), 0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - idx))


def _warp_one_from_roi(roi: jnp.ndarray, m_inv: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """roi [R, R, C], m_inv [2, 3] mapping dst->roi coords -> [out, out, C].

    Pixel data is 8-bit; Precision.HIGH (bf16_3x passes) keeps ~2^-21
    relative error — far below a quantization step — at a fraction of
    HIGHEST's MXU cost.
    """
    r = roi.shape[0]
    m00, m01, m02 = m_inv[0, 0], m_inv[0, 1], m_inv[0, 2]
    m10, m11, m12 = m_inv[1, 0], m_inv[1, 1], m_inv[1, 2]
    # Guard m11 ~ 0 (never happens for face alignment; keeps math finite).
    m11 = jnp.where(jnp.abs(m11) < 1e-6, 1e-6, m11)

    jj = jax.lax.broadcasted_iota(jnp.float32, (out_size,), 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (r,), 0)
    ii = jax.lax.broadcasted_iota(jnp.float32, (out_size,), 0)

    # pass 1: u[y, j].  Contraction layout puts the output positions (j) in
    # the MXU lane dimension and the 3 channels in sublanes — [C, X] @ [X, J]
    # batched over y — instead of [J, X] @ [X, C] whose N=3 wastes 125/128
    # lanes.
    u = ((m00 - m01 * m10 / m11) * jj[None, :]
         + (m01 / m11) * yy[:, None]
         + (m02 - m01 * m12 / m11))  # [R, out]
    w1 = _hat_weights(u, r)  # [R(y), out(j), R(x)]
    tmp = jnp.einsum("ycx,yxj->ycj", jnp.swapaxes(roi, 1, 2),
                     jnp.swapaxes(w1, 1, 2),
                     precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)  # [R(y), C, out(j)]

    # pass 2: sy[i, j], batched over j with i in lanes, channels in sublanes.
    sy = m10 * jj[None, :] + m11 * ii[:, None] + m12  # [out(i), out(j)]
    w2 = _hat_weights(jnp.swapaxes(sy, 0, 1), r)  # [j, i, R(y)]
    out = jnp.einsum("jcy,jyi->jci", jnp.transpose(tmp, (2, 1, 0)),
                     jnp.swapaxes(w2, 1, 2),
                     precision=jax.lax.Precision.HIGH,
                     preferred_element_type=jnp.float32)  # [j, C, i]
    return jnp.transpose(out, (2, 0, 1))  # [i, j, C]


def extract_rois(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    kps: jnp.ndarray,
    out_size: int = 112,
    dst: jnp.ndarray | None = None,
    levels: int = 4,
):
    """Per-face ROI window + dst->ROI affine, pyramid level pre-selected.

    Returns (rois [M, ROI, ROI, C] f32, mats [M, 2, 3] f32).
    """
    if dst is None:
        dst = jnp.asarray(ARCFACE_DST) * (out_size / 112.0)

    def kps_to_minv(k):
        return _invert_affine(umeyama_similarity(k, dst))

    m_inv = jax.vmap(kps_to_minv)(kps)
    return extract_rois_from_affines(frames, frame_idx, m_inv, out_size, levels)


def extract_rois_from_affines(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    m_inv_batch: jnp.ndarray,
    out_size: int,
    levels: int = 4,
):
    """As extract_rois, but from per-face dst->src affines [M, 2, 3].

    The pyramid lives as one u8 atlas (levels side by side), so selecting a
    face's level is arithmetic on the slice origin — each face costs exactly
    one small dynamic-slice, converted to f32 only after cropping.
    """
    atlas, offsets = build_atlas(frames, levels)
    c = frames.shape[-1]
    x_offs = jnp.asarray([o[0] for o in offsets], jnp.int32)
    lws = jnp.asarray([o[1] for o in offsets], jnp.int32)
    lhs_ = jnp.asarray([o[2] for o in offsets], jnp.int32)

    def one(fidx, m_inv):
        # Exact axis-aligned extent of the crop's inverse image: the source
        # region sampled is a parallelogram whose half-extents are
        # (|m00|+|m01|)*out/2 in x and (|m10|+|m11|)*out/2 in y.  Using the
        # exact per-face extent (not a global scale*margin bound) keeps
        # near-ROI-sized faces on the finest level that truly fits.
        span_x = (jnp.abs(m_inv[0, 0]) + jnp.abs(m_inv[0, 1])) * out_size + HALO
        span_y = (jnp.abs(m_inv[1, 0]) + jnp.abs(m_inv[1, 1])) * out_size + HALO
        span = jnp.maximum(span_x, span_y)
        # Smallest level whose scaled span fits the ROI window.
        lvl_f = jnp.ceil(jnp.log2(jnp.maximum(span / ROI, 1.0)))
        lvl = jnp.clip(lvl_f.astype(jnp.int32), 0, levels - 1)

        # Source-center of the crop = inverse image of the output center.
        cx = m_inv[0, 0] * (out_size / 2) + m_inv[0, 1] * (out_size / 2) + m_inv[0, 2]
        cy = m_inv[1, 0] * (out_size / 2) + m_inv[1, 1] * (out_size / 2) + m_inv[1, 2]

        # Level pixel i is the mean of source pixels [s*i, s*i + s), so its
        # center sits at source coordinate s*i + (s-1)/2: level coords are
        # (src - (s-1)/2) / s, not src/s (a half-pixel shift per octave that
        # visibly smears coarse-level crops otherwise).
        s = jnp.exp2(lvl.astype(jnp.float32))
        shift = (s - 1.0) / 2.0
        x0 = jnp.clip(jnp.round((cx - shift) / s - ROI / 2).astype(jnp.int32),
                      0, lws[lvl] - ROI)
        y0 = jnp.clip(jnp.round((cy - shift) / s - ROI / 2).astype(jnp.int32),
                      0, lhs_[lvl] - ROI)
        roi = jax.lax.dynamic_slice(
            atlas, (fidx, y0, x_offs[lvl] + x0, 0),
            (1, ROI, ROI, c))[0].astype(jnp.float32)
        # Adjust dst->src matrix into ROI/level coordinates.
        m_sel = jnp.concatenate(
            [m_inv[:, :2] / s,
             ((m_inv[:, 2] - shift) / s
              - jnp.stack([x0, y0]).astype(jnp.float32))[:, None]],
            axis=1)
        return roi, m_sel

    return jax.vmap(one)(frame_idx, m_inv_batch)


# ---------------------------------------------------------------------------
# Packed-4 (space-to-depth) variants.
#
# The fused Pallas stem (ops/stem_pallas.py) wants its input in s2d4 layout
# [B, H/4, W/4, 48] — a permutation the native letterbox emits for free at
# pixel-writing time, but which XLA's u8 transpose pays ~1.1 ms/B=8 to undo.
# Round 2's measured blocker for running the fused stem end-to-end was that
# THIS module's atlas sampled raw-layout pixels, forcing raw frames into the
# fused program.  The variants below consume the packed layout directly:
#
# - build_atlas_packed keeps every pyramid level in packed-4 layout (the
#   2x2 pool becomes a fixed phase-regrouping of 4x-smaller arrays), with
#   int32 accumulation + round-half-up per level, so each level's bytes are
#   BIT-IDENTICAL to build_atlas's raw levels, just permuted.
# - extract_rois_packed slices [ROI/4, ROI/4, 48] packed windows (origins
#   quantized to packed pixels; the dst->ROI affine absorbs the shift).
# - _warp_one_from_packed_roi evaluates the SAME two-pass hat-weight
#   contraction with batch dims (yp, p) and contraction dims (jp, q): the
#   "unpack" is pure index bookkeeping inside one dot_general — no byte
#   transpose is ever materialized.
# ---------------------------------------------------------------------------

HALO_P = 6.0  # packed variant: bilinear tap (1) + packed-origin rounding
              # (ROI origins quantize to 4-pixel grid: 2) + extra slack


def space_to_depth4(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/4, W/4, 16C], channel = (p*4 + q)*C + c
    (the s2d4 layout the native letterbox emits; ops/stem_pallas.py)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 4, w // 4, 16 * c)


def _edge_pad_packed(p: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Border-replicate a packed-4 image [B, Hp, Wp, 16C] in RAW pixel
    semantics: the pad pixel's q-phases all equal the last raw column
    (phase q=3 of the last packed column), ditto rows with p=3."""
    b, hp, wp, c16 = p.shape
    c = c16 // 16
    if pad_w:
        last = p[:, :, -1:, :].reshape(b, hp, 1, 4, 4, c)
        rep = jnp.broadcast_to(last[:, :, :, :, 3:4, :], (b, hp, 1, 4, 4, c))
        rep = rep.reshape(b, hp, 1, c16)
        p = jnp.concatenate([p, jnp.broadcast_to(rep, (b, hp, pad_w, c16))],
                            axis=2)
    if pad_h:
        wp2 = p.shape[2]
        last = p[:, -1:, :, :].reshape(b, 1, wp2, 4, 4, c)
        rep = jnp.broadcast_to(last[:, :, :, 3:4, :, :], (b, 1, wp2, 4, 4, c))
        rep = rep.reshape(b, 1, wp2, c16)
        p = jnp.concatenate([p, jnp.broadcast_to(rep, (b, pad_h, wp2, c16))],
                            axis=1)
    return p


def build_atlas_packed(frames_p4: jnp.ndarray, levels: int = 4):
    """Pyramid atlas from s2d4-packed frames, all levels packed-4.

    frames_p4: [B, H/4, W/4, 16C] (uint8 camera path or float), channel
    = (p*4 + q)*C + c.  Levels accumulate int32 sums from the ORIGINAL
    pixels with one round-half-up per level — bit-identical bytes to
    build_atlas's u8 levels, permuted into packed layout.  The 2x2 raw
    pool is a fixed phase regrouping: output phase p' = 2u + w reads
    input packed row 2Y'+u phases 2w+{0,1}.

    Returns (atlas [B, Ha, Wa, 16C], offsets: list of (x_off, lw, lh) in
    PACKED units).
    """
    b, h4, w4, c16 = frames_p4.shape
    c = c16 // 16
    proi = ROI // 4
    is_u8 = frames_p4.dtype == jnp.uint8
    # The 2x2 raw pool in packed layout is a fixed phase regroup: output
    # phase (p'=2u+w, q'=2v+s) sums input pixel (2Y'+u, 2X'+v) phases
    # (2w+{0,1}, 2s+{0,1}).  Expressed as reshape+transpose this measured
    # 3.2 ms/B=8 on v5e (byte-granular relayout); as a stride-2 conv with
    # a constant 0/1 phase-mix matrix it is 0.03 ms — the MXU does the
    # channel regroup for free.  f32 keeps it bit-exact: sums of 4**3
    # u8 values stay integers < 2**24, and the per-level round-half-up
    # (floor(acc/4**l + 0.5)) is exact on power-of-two divisors.
    mix = np.zeros((2, 2, c16, c16), np.float32)
    for u in range(2):
        for v in range(2):
            for w in range(2):
                for s in range(2):
                    for b2 in range(2):
                        for t in range(2):
                            po = (2 * u + w) * 4 + (2 * v + s)
                            pi = (2 * w + b2) * 4 + (2 * s + t)
                            for ch in range(c):
                                mix[u, v, pi * c + ch, po * c + ch] = 1.0
    mix = jnp.asarray(mix)
    pyr = [frames_p4]
    acc = frames_p4.astype(jnp.float32)
    for lvl in range(1, levels):
        acc = jax.lax.conv_general_dilated(
            acc, mix, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if is_u8:
            pyr.append(jnp.floor(acc / (4 ** lvl) + 0.5).astype(jnp.uint8))
        else:
            pyr.append(acc / (4.0 ** lvl))
    h_a = max(max(p.shape[1] for p in pyr), proi)
    cols, offsets = [], []
    x_off = 0
    for p in pyr:
        _, lh, lw, _ = p.shape
        p = _edge_pad_packed(p, max(proi - lh, 0), max(proi - lw, 0))
        pad_h_zero = h_a - p.shape[1]
        if pad_h_zero:
            p = jnp.pad(p, ((0, 0), (0, pad_h_zero), (0, 0), (0, 0)))
        cols.append(p)
        offsets.append((x_off, max(lw, proi), max(lh, proi)))
        x_off += p.shape[2]
    return jnp.concatenate(cols, axis=2), offsets


def extract_rois_packed(
    frames_p4: jnp.ndarray,
    frame_idx: jnp.ndarray,
    m_inv_batch: jnp.ndarray,
    out_size: int,
    levels: int = 4,
):
    """extract_rois_from_affines on an s2d4-packed frame batch.

    Affines are in RAW frame coordinates (same contract); ROI origins
    quantize to the packed grid and the returned per-face affine absorbs
    the shift.  Returns (rois [M, ROI/4, ROI/4, 16C] in the input dtype,
    mats [M, 2, 3] mapping dst -> level-raw ROI coords).
    """
    atlas, offsets = build_atlas_packed(frames_p4, levels)
    c16 = frames_p4.shape[-1]
    proi = ROI // 4
    x_offs = jnp.asarray([o[0] for o in offsets], jnp.int32)
    lws = jnp.asarray([o[1] for o in offsets], jnp.int32)
    lhs_ = jnp.asarray([o[2] for o in offsets], jnp.int32)

    def one(fidx, m_inv):
        span_x = (jnp.abs(m_inv[0, 0]) + jnp.abs(m_inv[0, 1])) * out_size + HALO_P
        span_y = (jnp.abs(m_inv[1, 0]) + jnp.abs(m_inv[1, 1])) * out_size + HALO_P
        span = jnp.maximum(span_x, span_y)
        lvl_f = jnp.ceil(jnp.log2(jnp.maximum(span / ROI, 1.0)))
        lvl = jnp.clip(lvl_f.astype(jnp.int32), 0, levels - 1)

        cx = m_inv[0, 0] * (out_size / 2) + m_inv[0, 1] * (out_size / 2) + m_inv[0, 2]
        cy = m_inv[1, 0] * (out_size / 2) + m_inv[1, 1] * (out_size / 2) + m_inv[1, 2]

        s = jnp.exp2(lvl.astype(jnp.float32))
        shift = (s - 1.0) / 2.0
        # Level-coord ROI origin, quantized to packed pixels (grid of 4):
        # |4*x0p - ideal| <= 2, covered by HALO_P.
        x0p = jnp.clip(
            jnp.round(((cx - shift) / s - ROI / 2) / 4.0).astype(jnp.int32),
            0, lws[lvl] - proi)
        y0p = jnp.clip(
            jnp.round(((cy - shift) / s - ROI / 2) / 4.0).astype(jnp.int32),
            0, lhs_[lvl] - proi)
        roi = jax.lax.dynamic_slice(
            atlas, (fidx, y0p, x_offs[lvl] + x0p, 0),
            (1, proi, proi, c16))[0]
        m_sel = jnp.concatenate(
            [m_inv[:, :2] / s,
             ((m_inv[:, 2] - shift) / s
              - 4.0 * jnp.stack([x0p, y0p]).astype(jnp.float32))[:, None]],
            axis=1)
        return roi, m_sel

    return jax.vmap(one)(frame_idx, m_inv_batch)


def unpack_roi4(roi_p: jnp.ndarray) -> jnp.ndarray:
    """[PR, PR, 16C] packed-4 ROI -> [4PR, 4PR, C] raw layout.

    Per-face ROIs are tiny (120x120x3 u8 = 42 KB), so the byte transpose
    that is prohibitive on full frames (~1.1 ms/B=8, the round-2 blocker)
    is noise here — and XLA can fuse it into the first warp contraction.
    """
    pr = roi_p.shape[0]
    c = roi_p.shape[-1] // 16
    x = roi_p.reshape(pr, pr, 4, 4, c)        # [yp, jp, p, q, c]
    x = x.transpose(0, 2, 1, 3, 4)            # [yp, p, jp, q, c]
    return x.reshape(4 * pr, 4 * pr, c)


def _warp_one_from_packed_roi(roi_p: jnp.ndarray, m_inv: jnp.ndarray,
                              out_size: int) -> jnp.ndarray:
    """roi_p [PR, PR, 16C] packed-4, m_inv [2, 3] dst -> raw-ROI coords
    -> [out, out, C].  Unpacks the (small) ROI and runs the identical
    two-pass hat-weight contraction as the raw path.  (A phase-blocked
    contraction that consumed the packed layout directly was measured
    slower: 4 thin per-phase dots starve the MXU, and a single einsum with
    non-adjacent batch dims lowers through a worse transpose than this
    explicit tiny one.)"""
    return _warp_one_from_roi(unpack_roi4(roi_p).astype(jnp.float32), m_inv,
                              out_size)


def warp_faces_two_pass_packed(
    frames_p4: jnp.ndarray,
    frame_idx: jnp.ndarray,
    kps: jnp.ndarray,
    out_size: int = 112,
    dst: jnp.ndarray | None = None,
    levels: int = 4,
) -> jnp.ndarray:
    """warp_faces_two_pass on s2d4-packed frames [B, H/4, W/4, 16C].

    kps stay in RAW frame coordinates.  Up to the packed ROI-origin
    quantization (absorbed by the affine; border-clamp behavior can
    differ only for faces extending outside the frame) this computes the
    same crops as the raw path — tests/test_ops_warp2pass.py pins the
    two against each other.
    """
    if dst is None:
        dst = jnp.asarray(ARCFACE_DST) * (out_size / 112.0)

    def kps_to_minv(k):
        return _invert_affine(umeyama_similarity(k, dst))

    m_inv = jax.vmap(kps_to_minv)(kps)
    rois, mats = extract_rois_packed(frames_p4, frame_idx, m_inv, out_size,
                                     levels)
    return jax.vmap(
        lambda roi, m_sel: _warp_one_from_packed_roi(roi, m_sel, out_size)
    )(rois, mats)


def boxes_to_affines(bboxes: jnp.ndarray, out_size: int,
                     scale_factor: float = 1.5) -> jnp.ndarray:
    """dst->src affines for bbox-centered square crops (no rotation).

    The buffalo_l attribute heads (genderage, 2d106det) sample a square
    window centered on the detection box with side max(w, h) * scale_factor
    — the insightface ``face_align.transform`` convention.  bboxes [M, 4]
    xyxy -> [M, 2, 3] mapping crop coords to source coords.
    """
    x1, y1, x2, y2 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    side = jnp.maximum(x2 - x1, y2 - y1) * scale_factor
    s = side / out_size  # source pixels per crop pixel
    zeros = jnp.zeros_like(s)
    tx = cx - s * (out_size / 2.0)
    ty = cy - s * (out_size / 2.0)
    row0 = jnp.stack([s, zeros, tx], axis=1)
    row1 = jnp.stack([zeros, s, ty], axis=1)
    return jnp.stack([row0, row1], axis=1)


def warp_boxes_two_pass(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    bboxes: jnp.ndarray,
    out_size: int,
    scale_factor: float = 1.5,
    levels: int = 4,
    backend: str = "auto",
) -> jnp.ndarray:
    """Square bbox-centered crops (attribute-head inputs) via the same
    two-pass machinery.  Returns [M, out_size, out_size, C] float32."""
    m_inv = boxes_to_affines(bboxes, out_size, scale_factor)
    rois, mats = extract_rois_from_affines(frames, frame_idx, m_inv,
                                           out_size, levels)
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        from .warp_pallas import warp_rois_pallas

        return warp_rois_pallas(rois, mats, out_size=out_size)
    return jax.vmap(
        lambda roi, m_sel: _warp_one_from_roi(roi, m_sel, out_size)
    )(rois, mats)


def warp_faces_two_pass(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    kps: jnp.ndarray,
    out_size: int = 112,
    dst: jnp.ndarray | None = None,
    levels: int = 4,
    backend: str = "auto",
) -> jnp.ndarray:
    """Align M faces from a batch of frames without gathers.

    Args:
      frames:    [B, H, W, C] (uint8 or float), H and W divisible by
                 2**(levels-1).
      frame_idx: [M] int32 frame index per face.
      kps:       [M, 5, 2] landmarks in frame coords.
      out_size:  crop size (112).
      dst:       template points; defaults to ARCFACE_DST scaled to out_size.
      backend:   'auto', 'pallas', or 'xla'.  'auto' currently resolves to
                 the XLA formulation everywhere: on v5e the Pallas kernel
                 (ops/warp_pallas.py) measures ~10.4 ms vs XLA's ~8.6 ms for
                 128 faces — the warp is hat-weight-generation-bound on the
                 VPU either way, and XLA's fused codegen wins; the kernel
                 stays available for shapes/hardware where the weight-tensor
                 HBM traffic dominates instead.

    Returns [M, out_size, out_size, C] float32 crops.
    """
    rois, mats = extract_rois(frames, frame_idx, kps, out_size, dst, levels)
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        from .warp_pallas import warp_rois_pallas

        return warp_rois_pallas(rois, mats, out_size=out_size)
    return jax.vmap(
        lambda roi, m_sel: _warp_one_from_roi(roi, m_sel, out_size)
    )(rois, mats)
