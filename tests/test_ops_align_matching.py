"""Golden tests: Umeyama alignment vs numpy/cv2, cosine top-k vs linear scan,
and the distributed top-k vs the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp

from facerecognition_infrenceengine_tpu.ops import (
    umeyama_similarity,
    warp_face,
    ARCFACE_DST,
    l2_normalize,
    cosine_topk,
)
from facerecognition_infrenceengine_tpu.ops.align import warp_affine_bilinear
from facerecognition_infrenceengine_tpu.parallel import distributed_topk, build_mesh


def np_umeyama(src, dst):
    """skimage._geometric._umeyama reference implementation (estimate_scale)."""
    num, dim = src.shape
    mu_s = src.mean(0); mu_d = dst.mean(0)
    src_c = src - mu_s; dst_c = dst - mu_d
    A = dst_c.T @ src_c / num
    d = np.ones(dim)
    if np.linalg.det(A) < 0:
        d[dim - 1] = -1
    U, S, Vt = np.linalg.svd(A)
    R = U @ np.diag(d) @ Vt
    scale = (S @ d) / src_c.var(0).sum()
    T = np.eye(dim + 1)
    T[:dim, :dim] = scale * R
    T[:dim, dim] = mu_d - scale * R @ mu_s
    return T[:2]


def test_umeyama_recovers_known_transform():
    rng = np.random.default_rng(2)
    theta = 0.3
    s = 1.7
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    t = np.array([5.0, -3.0])
    src = rng.uniform(0, 100, (5, 2)).astype(np.float32)
    dst = (s * src @ R.T + t).astype(np.float32)
    M = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    got = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-3)


def test_umeyama_matches_numpy_reference_noisy():
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 112, (5, 2)).astype(np.float32)
    dst = ARCFACE_DST + rng.normal(0, 2.0, (5, 2)).astype(np.float32)
    M = np.asarray(umeyama_similarity(jnp.asarray(src), jnp.asarray(dst)))
    M_ref = np_umeyama(src.astype(np.float64), dst.astype(np.float64))
    np.testing.assert_allclose(M, M_ref, atol=1e-3)


def test_warp_matches_cv2():
    import cv2

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (200, 180, 3)).astype(np.float32)
    # landmarks roughly where a face would be
    kps = ARCFACE_DST * 1.3 + np.array([30.0, 40.0], np.float32)
    M = np.asarray(umeyama_similarity(jnp.asarray(kps), jnp.asarray(ARCFACE_DST)))
    want = cv2.warpAffine(img, M, (112, 112))
    got = np.asarray(warp_face(jnp.asarray(img), jnp.asarray(kps), 112))
    # interiors must agree; borders differ (replicate vs zero padding)
    diff = np.abs(got[4:-4, 4:-4] - want[4:-4, 4:-4])
    assert diff.mean() < 0.5
    assert np.median(diff) < 0.1


def test_warp_identity():
    img = np.arange(100 * 100 * 1, dtype=np.float32).reshape(100, 100, 1)
    M = jnp.asarray(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32))
    out = np.asarray(warp_affine_bilinear(jnp.asarray(img), M, (100, 100)))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_cosine_topk_matches_linear_scan():
    rng = np.random.default_rng(5)
    g = rng.normal(size=(300, 512)).astype(np.float32)
    q = rng.normal(size=(7, 512)).astype(np.float32)
    gn = g / np.linalg.norm(g, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(300, bool)
    vals, idx = cosine_topk(jnp.asarray(qn), jnp.asarray(gn), jnp.asarray(valid), k=1)
    # reference: python linear scan like infrenceServer.py:538-542
    for b in range(7):
        scores = [float(np.dot(qn[b], gn[i])) for i in range(300)]
        best = int(np.argmax(scores))
        assert int(idx[b, 0]) == best
        assert abs(float(vals[b, 0]) - scores[best]) < 1e-5


def test_distributed_topk_matches_single_device():
    rng = np.random.default_rng(6)
    n, d = 512, 128
    g = rng.normal(size=(n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.normal(size=(4, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[500:] = False  # padding rows

    mesh = build_mesh(jax.devices(), data=1, gallery=8)
    vals, idx = distributed_topk(jnp.asarray(q), jnp.asarray(g), jnp.asarray(valid), mesh, k=3)
    sv, si = cosine_topk(jnp.asarray(q), jnp.asarray(g), jnp.asarray(valid), k=3)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(sv), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(si))


def test_l2_normalize_zero_safe():
    x = jnp.zeros((2, 4))
    out = np.asarray(l2_normalize(x))
    assert np.all(np.isfinite(out))
