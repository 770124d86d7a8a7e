"""Two-pass matmul warp vs the exact gather warp (ops.align.warp_face).

Quantifies the sheared-hat approximation the module docstring promises:
for |rotation| < ~30 deg the two-pass output stays within a fraction of a
pixel of exact bilinear sampling; with no rotation the hats coincide and
agreement is tight.  Also pins the pyramid level selection and the
frame-index routing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.ops.align import (
    ARCFACE_DST,
    umeyama_similarity,
    warp_affine_bilinear,
    _invert_affine,
)
from facerecognition_infrenceengine_tpu.ops.warp2pass import (
    HALO,
    ROI,
    warp_faces_two_pass,
)


def smooth_frame(h=480, w=640, seed=0):
    """Smooth image: interpolation differences shrink, geometry errors show."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (h // 16, w // 16, 3)).astype(np.float32)
    yy = np.linspace(0, small.shape[0] - 1, h)
    xx = np.linspace(0, small.shape[1] - 1, w)
    y0, x0 = yy.astype(int), xx.astype(int)
    y1, x1 = np.minimum(y0 + 1, small.shape[0] - 1), np.minimum(x0 + 1, small.shape[1] - 1)
    fy, fx = (yy - y0)[:, None, None], (xx - x0)[None, :, None]
    img = ((small[y0][:, x0] * (1 - fy) + small[y1][:, x0] * fy) * (1 - fx)
           + (small[y0][:, x1] * (1 - fy) + small[y1][:, x1] * fy) * fx)
    return img.astype(np.float32)


def kps_for(theta, scale, center):
    base = np.asarray(ARCFACE_DST, np.float32)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]], np.float32) * scale
    return (base - base.mean(0)) @ rot.T + np.asarray(center, np.float32)


def exact_warp(frame, kps, out_size=112):
    m = umeyama_similarity(jnp.asarray(kps), jnp.asarray(ARCFACE_DST))
    return np.asarray(warp_affine_bilinear(jnp.asarray(frame), m,
                                           (out_size, out_size)))


@pytest.mark.parametrize("theta_deg", [0, 10, -20, 30])
def test_two_pass_matches_exact_within_budget(theta_deg):
    frame = smooth_frame()
    kps = kps_for(np.deg2rad(theta_deg), 1.2, (320, 240))
    want = exact_warp(frame, kps)
    got = np.asarray(warp_faces_two_pass(
        jnp.asarray(frame)[None], jnp.zeros(1, jnp.int32),
        jnp.asarray(kps)[None])[0])
    diff = np.abs(got - want)
    if theta_deg == 0:
        assert diff.max() < 0.35, f"no-rotation warp must be near-exact: {diff.max()}"
    else:
        assert diff.mean() < 1.0, f"theta={theta_deg}: mean {diff.mean()}"
        assert np.median(diff) < 0.5


def test_large_face_uses_pyramid_and_stays_close():
    frame = smooth_frame()
    # scale 3.0: source extent > ROI -> level >= 1
    kps = kps_for(0.15, 3.0, (320, 240))
    m_inv = _invert_affine(umeyama_similarity(jnp.asarray(kps),
                                              jnp.asarray(ARCFACE_DST)))
    span = float((jnp.abs(m_inv[0, 0]) + jnp.abs(m_inv[0, 1])) * 112) + HALO
    assert span > ROI  # really exercises a coarser level
    want = exact_warp(frame, kps)
    got = np.asarray(warp_faces_two_pass(
        jnp.asarray(frame)[None], jnp.zeros(1, jnp.int32),
        jnp.asarray(kps)[None])[0])
    # pooled level loses high frequencies; smooth content stays close
    assert np.abs(got - want).mean() < 2.5


def test_frame_index_routing():
    frames = np.stack([np.full((256, 256, 3), 40, np.float32),
                       np.full((256, 256, 3), 200, np.float32)])
    kps = np.stack([kps_for(0.0, 0.8, (128, 128))] * 2)
    out = np.asarray(warp_faces_two_pass(
        jnp.asarray(frames), jnp.asarray([0, 1], jnp.int32), jnp.asarray(kps)))
    assert abs(float(out[0].mean()) - 40) < 1.0
    assert abs(float(out[1].mean()) - 200) < 1.0


def test_uint8_input_accepted():
    frame = smooth_frame().astype(np.uint8)
    kps = kps_for(0.1, 1.0, (300, 220))
    out = warp_faces_two_pass(jnp.asarray(frame)[None],
                              jnp.zeros(1, jnp.int32), jnp.asarray(kps)[None])
    assert out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0


# ------------------------------------------------------------ packed variants
from facerecognition_infrenceengine_tpu.ops.warp2pass import (  # noqa: E402
    build_atlas,
    build_atlas_packed,
    space_to_depth4,
    warp_faces_two_pass_packed,
)


def test_packed_atlas_levels_bit_identical():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 128, 192, 3), dtype=np.uint8)
    atlas_raw, offs_raw = build_atlas(jnp.asarray(frames), levels=4)
    atlas_p, offs_p = build_atlas_packed(
        space_to_depth4(jnp.asarray(frames)), levels=4)
    a_raw = np.asarray(atlas_raw)
    a_p = np.asarray(atlas_p)
    for (xo_r, lw_r, lh_r), (xo_p, lw_p, lh_p), lvl in zip(
            offs_raw, offs_p, range(4)):
        lh, lw = 128 >> lvl, 192 >> lvl
        lvl_raw = a_raw[:, :lh, xo_r:xo_r + lw, :]
        lvl_pck = a_p[:, :lh // 4, xo_p:xo_p + lw // 4, :]
        np.testing.assert_array_equal(
            np.asarray(space_to_depth4(jnp.asarray(lvl_raw))), lvl_pck,
            err_msg=f"level {lvl} content differs")


def test_packed_atlas_edge_pad_is_raw_replicate():
    # a 64x64 frame's coarse levels pad up to ROI; packed replicate must
    # equal raw replicate in raw-pixel semantics (q phases = last column)
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    atlas_raw, offs_raw = build_atlas(jnp.asarray(frames), levels=2)
    atlas_p, offs_p = build_atlas_packed(
        space_to_depth4(jnp.asarray(frames)), levels=2)
    xo_r, lw_r, lh_r = offs_raw[1]
    xo_p, lw_p, lh_p = offs_p[1]
    assert lw_r == ROI and lw_p == ROI // 4
    lvl_raw = np.asarray(atlas_raw)[:, :lh_r, xo_r:xo_r + lw_r, :]
    lvl_pck = np.asarray(atlas_p)[:, :lh_p, xo_p:xo_p + lw_p, :]
    np.testing.assert_array_equal(
        np.asarray(space_to_depth4(jnp.asarray(lvl_raw))), lvl_pck)


@pytest.mark.parametrize("theta_deg,scale", [(0, 1.0), (15, 1.2), (-25, 0.9),
                                             (10, 3.0)])
def test_packed_warp_matches_raw_warp(theta_deg, scale):
    """The packed path computes the same crops as the raw path (same ROI
    content, affine-absorbed origin shift; f32 summation order differs)."""
    frame = smooth_frame(256, 320).astype(np.uint8)
    kps = kps_for(np.deg2rad(theta_deg), scale, (160, 128))
    want = np.asarray(warp_faces_two_pass(
        jnp.asarray(frame)[None], jnp.zeros(1, jnp.int32),
        jnp.asarray(kps)[None])[0])
    got = np.asarray(warp_faces_two_pass_packed(
        space_to_depth4(jnp.asarray(frame)[None]), jnp.zeros(1, jnp.int32),
        jnp.asarray(kps)[None])[0])
    # identical pyramid bytes + identical sampling math -> sub-LSB agreement
    assert np.abs(got - want).max() < 0.51, np.abs(got - want).max()


def test_packed_warp_frame_index_routing():
    frames = np.stack([np.full((256, 256, 3), 40, np.uint8),
                       np.full((256, 256, 3), 200, np.uint8)])
    kps = np.stack([kps_for(0.0, 0.8, (128, 128))] * 2)
    out = np.asarray(warp_faces_two_pass_packed(
        space_to_depth4(jnp.asarray(frames)), jnp.asarray([0, 1], jnp.int32),
        jnp.asarray(kps)))
    assert abs(float(out[0].mean()) - 40) < 1.0
    assert abs(float(out[1].mean()) - 200) < 1.0
