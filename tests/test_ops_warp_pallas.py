"""Pallas warp kernel vs the XLA two-pass formulation (golden reference).

Runs the kernel in interpreter mode on CPU; the two implementations share
the hat-weight math, so agreement must be near-exact (same contractions,
different scheduling).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.ops.align import ARCFACE_DST
from facerecognition_infrenceengine_tpu.ops.warp2pass import (
    ROI,
    extract_rois,
    warp_faces_two_pass,
)
from facerecognition_infrenceengine_tpu.ops.warp_pallas import warp_rois_pallas


def _faces(m=6, b=2, h=256, w=320, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    base = np.asarray(ARCFACE_DST, np.float32)
    kps = np.zeros((m, 5, 2), np.float32)
    for i in range(m):
        theta = rng.uniform(-0.3, 0.3)
        scale = rng.uniform(0.4, 2.5)
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]], np.float32) * scale
        center = rng.uniform((80, 80), (w - 80, h - 80)).astype(np.float32)
        kps[i] = (base - base.mean(0)) @ rot.T + center
    fidx = rng.integers(0, b, m).astype(np.int32)
    return jnp.asarray(frames), jnp.asarray(fidx), jnp.asarray(kps)


def test_pallas_matches_xla_path():
    frames, fidx, kps = _faces()
    rois, mats = extract_rois(frames, fidx, kps, 112)
    got = warp_rois_pallas(rois, mats, out_size=112, interpret=True)
    want = warp_faces_two_pass(frames, fidx, kps, 112, backend="xla")
    assert got.shape == want.shape == (6, 112, 112, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.75, rtol=0)
    # pixel-level: almost everywhere identical
    close = np.isclose(np.asarray(got), np.asarray(want), atol=0.1)
    assert close.mean() > 0.999


def test_pallas_kernel_deterministic():
    frames, fidx, kps = _faces(m=3, seed=1)
    rois, mats = extract_rois(frames, fidx, kps, 112)
    a = warp_rois_pallas(rois, mats, interpret=True)
    b = warp_rois_pallas(rois, mats, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_roi_padding_matrix_consistency():
    # faces near the border: ROI clamps, matrices must keep the mapping exact
    frames, fidx, kps = _faces(m=4, seed=2)
    kps = kps.at[0].add(jnp.float32(-70.0))  # push toward top-left corner
    rois, mats = extract_rois(frames, fidx, kps, 112)
    got = warp_rois_pallas(rois, mats, interpret=True)
    want = warp_faces_two_pass(frames, fidx, kps, 112, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.75)


def test_backend_auto_selects_xla_on_cpu():
    frames, fidx, kps = _faces(m=2, seed=3)
    out = warp_faces_two_pass(frames, fidx, kps, 112, backend="auto")
    assert out.shape == (2, 112, 112, 3)
    assert jnp.isfinite(out).all()
