"""5-point similarity-transform face alignment, batched for XLA.

The reference gets aligned 112x112 crops implicitly inside insightface's
``FaceAnalysis.get`` (reference infrenceServer.py:528): a Umeyama similarity
transform from the detector's 5 landmarks to the canonical ArcFace template,
then ``cv2.warpAffine``.  Here both steps are jnp: a closed-form batched
Umeyama and a bilinear inverse warp built from one gather — so alignment
fuses into the same XLA program as detection and embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical ArcFace 112x112 destination landmarks (insightface convention).
ARCFACE_DST = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Least-squares similarity transform (rotation+scale+translation).

    Args:
      src: [K, 2] source points (detected landmarks).
      dst: [K, 2] destination points (template).

    Returns [2, 3] matrix M with ``dst ~ M[:, :2] @ src + M[:, 2]``.
    Closed-form Umeyama (1991), reflection-safe via the det sign trick.
    """
    # Tiny 2x2/5x2 matmuls: force full f32 precision — the TPU's default
    # bf16 matmul passes jitter the transform by a subpixel, which shows up
    # as whole-intensity-unit crop differences on high-frequency content.
    hi = jax.lax.Precision.HIGHEST
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    k = src.shape[0]
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    src_c = src - mu_s
    dst_c = dst - mu_d
    cov = jnp.matmul(dst_c.T, src_c, precision=hi) / k  # [2,2]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.where(jnp.linalg.det(u) * jnp.linalg.det(vt) < 0,
                  jnp.array([1.0, -1.0], jnp.float32),
                  jnp.array([1.0, 1.0], jnp.float32))
    r = jnp.matmul(u * d[None, :], vt, precision=hi)
    var_s = (src_c ** 2).sum() / k
    scale = (s * d).sum() / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * jnp.matmul(r, mu_s, precision=hi)
    return jnp.concatenate([scale * r, t[:, None]], axis=1)  # [2,3]


def _invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a [2,3] affine matrix."""
    a = m[:, :2]
    t = m[:, 2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    # Guard: degenerate transforms (e.g. all-identical landmarks) must stay
    # finite; the crop is garbage either way, but NaNs would poison a whole
    # fused batch downstream.
    det = jnp.where(jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det)
    inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]], m.dtype) / det
    return jnp.concatenate([inv, (-inv @ t)[:, None]], axis=1)


def warp_affine_bilinear(image: jnp.ndarray, m: jnp.ndarray, out_hw: tuple) -> jnp.ndarray:
    """Apply forward affine ``m`` (src->dst) producing a dst image by inverse
    bilinear sampling.  image: [H, W, C]; returns [out_h, out_w, C].

    Out-of-bounds samples clamp to the border (cv2.BORDER_REPLICATE differs
    from cv2's default zero border only on frame-edge faces; embeddings are
    insensitive to this at the 1e-3 level for interior faces).
    """
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    inv = _invert_affine(m)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w]
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    img = image.astype(jnp.float32)
    p00 = img[y0i, x0i]
    p01 = img[y0i, x1i]
    p10 = img[y1i, x0i]
    p11 = img[y1i, x1i]
    fx = fx[..., None]
    fy = fy[..., None]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def warp_face(image: jnp.ndarray, kps: jnp.ndarray, size: int = 112) -> jnp.ndarray:
    """Align one face: 5 landmarks -> 112x112 ArcFace crop."""
    m = umeyama_similarity(kps, jnp.asarray(ARCFACE_DST) * (size / 112.0))
    return warp_affine_bilinear(image, m, (size, size))


def warp_faces(image: jnp.ndarray, kps_batch: jnp.ndarray, size: int = 112) -> jnp.ndarray:
    """Align many faces of one frame: [F, 5, 2] -> [F, size, size, C]."""
    return jax.vmap(lambda k: warp_face(image, k, size))(kps_batch)
