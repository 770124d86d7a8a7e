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
        acc = x.astype(jnp.int32)
        for lvl in range(1, levels):
            bb, h, w, _ = acc.shape
            acc = acc.reshape(bb, h // 2, 2, w // 2, 2, c).sum(axis=(2, 4))
            # acc holds 4**lvl-pixel sums; round-half-up to u8 per level
            denom = 4 ** lvl
            pyr.append(((acc + denom // 2) // denom).astype(jnp.uint8))
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
