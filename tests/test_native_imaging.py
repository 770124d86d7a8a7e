"""Native imaging runtime tests (native/imagecodec.cc + ctypes bindings).

Covers the cv2-equivalent surface the rest of the framework uses: JPEG
decode (reference trainingServer.py:221), encode, bilinear resize /
letterbox (infrenceServer.py:581-584), and the HUD rasterizer
(infrenceServer.py:418-513).
"""

import io

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu import native


@pytest.fixture(scope="module")
def photo():
    rng = np.random.default_rng(7)
    img = np.zeros((120, 160, 3), np.uint8)
    # smooth gradient + blob so JPEG is representative (noise stresses it)
    yy, xx = np.mgrid[0:120, 0:160]
    img[..., 0] = (xx * 255 / 160).astype(np.uint8)
    img[..., 1] = (yy * 255 / 120).astype(np.uint8)
    img[..., 2] = 128
    img[40:80, 60:100] = (200, 50, 50)
    return img


def test_native_library_builds():
    assert native.have_native(), "native imagecodec should compile in this env"


def test_jpeg_roundtrip(photo):
    data = native.encode_jpeg(photo, quality=95)
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    out = native.decode_jpeg(data)
    assert out.shape == photo.shape and out.dtype == np.uint8
    # q95 on a smooth image stays close
    assert np.abs(out.astype(int) - photo.astype(int)).mean() < 4.0


def test_decode_matches_pil(photo):
    data = native.encode_jpeg(photo, quality=90)
    ours = native.decode_jpeg(data)
    ref = native._decode_pil(data)
    # PIL uses libjpeg too; decode must agree bit-for-bit
    assert np.array_equal(ours, ref)


def test_decode_garbage_returns_none():
    assert native.decode_jpeg(b"not a jpeg at all") is None
    assert native.decode_jpeg(b"\xff\xd8\xff\xe0truncated") is None


def test_resize_bilinear_matches_interp(photo):
    out = native.resize_bilinear(photo, 60, 80)
    assert out.shape == (60, 80, 3)
    # 2x downscale of a linear gradient stays a linear gradient
    col = out[10, :, 0].astype(float)
    diffs = np.diff(col)
    assert np.all(diffs >= 0)
    assert abs(float(col[-1]) - float(photo[20, -1, 0])) < 6


def test_resize_identity(photo):
    out = native.resize_bilinear(photo, photo.shape[0], photo.shape[1])
    assert np.abs(out.astype(int) - photo.astype(int)).max() <= 1


def test_letterbox_geometry(photo):
    canvas, scale = native.letterbox(photo, 640, 640)
    assert canvas.shape == (640, 640, 3)
    assert scale == pytest.approx(4.0)  # min(640/120, 640/160)
    nh, nw = int(120 * scale), int(160 * scale)
    assert canvas[:nh, :nw].any()
    assert not canvas[nh + 1:, :].any()  # padding is zeros
    assert not canvas[:, nw + 1:].any()


def test_rasterizer_draws_in_place():
    img = np.zeros((100, 200, 3), np.uint8)
    native.draw_rect(img, 10, 10, 90, 190, (0, 255, 0), thick=2)
    assert (img[10:12, 10:190, 1] == 255).all()
    assert img[50, 100].sum() == 0  # interior untouched

    native.fill_rect(img, 40, 80, 60, 120, (100, 100, 100), alpha=0.5)
    assert (img[50, 100] == 50).all()  # 0*(1-.5)+100*.5

    before = img.copy()
    native.draw_text(img, 70, 20, "AB 12.5%", (255, 255, 255))
    assert (img != before).any()

    native.draw_bar(img, 80, 20, 95, 180, 0.5, (0, 0, 255))
    filled = img[85, 24:100, 2] > 0
    assert filled.mean() > 0.9


def test_rasterizer_clips_out_of_bounds():
    img = np.zeros((50, 50, 3), np.uint8)
    native.draw_rect(img, -10, -10, 200, 200, (255, 0, 0), thick=3)
    native.fill_rect(img, 40, 40, 500, 500, (0, 255, 0))
    native.draw_text(img, 45, 45, "CLIPPEDTEXT", (255, 255, 255))
    assert img.shape == (50, 50, 3)  # no crash, no overflow


def test_hud_draw_enhanced_bounding_box():
    from facerecognition_infrenceengine_tpu.engine.recognizer import (
        GREEN, draw_enhanced_bounding_box)

    frame = np.zeros((480, 640, 3), np.uint8)
    info = {"type": "employee", "name": "Asha Rao", "employeeId": "E001"}
    out = draw_enhanced_bounding_box(frame, (100, 100, 260, 300), GREEN,
                                     info, 0.92, 0.81)
    assert out.shape == frame.shape
    assert (out[:, :, 1] == 255).any()  # green marks present
    info_u = {"type": "unknown", "name": "Unknown"}
    out2 = draw_enhanced_bounding_box(out, (400, 50, 620, 420),
                                      (0, 0, 255), info_u, 0.5, 0.0)
    assert (out2[:, :, 2] == 255).any()


def test_decode_dimension_cap():
    # a crafted SOF header must not drive a multi-GB allocation
    import struct

    # minimal JPEG with absurd dimensions: SOI + SOF0 claiming 30000x30000
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 30000, 30000, 1) + b"\x01\x11\x00"
    data = b"\xff\xd8" + sof + b"\xff\xd9"
    assert native.decode_jpeg(data) is None


def test_decode_cap_applies_to_pil_fallback():
    from PIL import Image

    buf = io.BytesIO()
    # 81 MP PNG: over the 64 MP cap, must be rejected on the PIL path too
    Image.new("RGB", (9000, 9000)).save(buf, "PNG")
    assert native.decode_image(buf.getvalue()) is None


def test_letterbox_s2d4_matches_letterbox_plus_pack():
    """Native packed letterbox == letterbox then pack, byte-for-byte."""
    from facerecognition_infrenceengine_tpu import native

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    canvas, s1 = native.letterbox(img, 256, 320)
    packed, s2 = native.letterbox_s2d4(img, 256, 320)
    assert s1 == s2
    assert packed.shape == (64, 80, 48)
    np.testing.assert_array_equal(packed, native.pack_s2d4(canvas))
    # layout spot-check: phase (p, q) of packed pixel (Y, X) is raw (4Y+p, 4X+q)
    np.testing.assert_array_equal(packed[5, 7, (2 * 4 + 3) * 3:(2 * 4 + 3) * 3 + 3],
                                  canvas[4 * 5 + 2, 4 * 7 + 3])


def test_pack_s2d4_matches_engine_pack_frames():
    from facerecognition_infrenceengine_tpu import native
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    rng = np.random.default_rng(10)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    np.testing.assert_array_equal(native.pack_s2d4(img),
                                  FaceEngine.pack_frames(img[None])[0])


def test_pack_yuv420_s2d4_native_matches_reference():
    """Native C++ YUV420 packer == the numpy reference, byte-for-byte."""
    from facerecognition_infrenceengine_tpu import native
    from facerecognition_infrenceengine_tpu.ops.yuv import (
        rgb_to_yuv420p4_reference)

    rng = np.random.default_rng(21)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    got = native.pack_yuv420_s2d4(img)
    assert got.shape == (16, 24, 24)
    ref = rgb_to_yuv420p4_reference(img)
    # float rounding at the .5 boundary may differ by 1 LSB between the
    # C++ single-pass math and numpy's double-precision reference
    assert int(np.abs(got.astype(int) - ref.astype(int)).max()) <= 1
    # gray image: U = V = 128 exactly, Y = pixel value
    gray = np.full((8, 8, 3), 77, np.uint8)
    pg = native.pack_yuv420_s2d4(gray)
    assert (pg[..., :16] == 77).all()
    assert (pg[..., 16:] == 128).all()


def test_letterbox_yuv420_matches_letterbox_then_pack():
    from facerecognition_infrenceengine_tpu import native

    rng = np.random.default_rng(22)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    canvas, s1 = native.letterbox(img, 640, 640)
    packed, s2 = native.letterbox_yuv420_s2d4(img, 640, 640)
    assert s1 == s2 == 1.0
    ref = native.pack_yuv420_s2d4(canvas)
    assert int(np.abs(packed.astype(int) - ref.astype(int)).max()) <= 1


def test_yuv420_device_unpack_roundtrip():
    """ops/yuv.py device unpack inverts the host packer up to 4:2:0 chroma
    loss: exact on gray, high-fidelity on smooth imagery."""
    import jax.numpy as jnp

    from facerecognition_infrenceengine_tpu import native
    from facerecognition_infrenceengine_tpu.ops.yuv import yuv420p4_to_rgbp4

    gray = np.full((16, 16, 3), 200, np.uint8)
    rgb48 = np.asarray(yuv420p4_to_rgbp4(
        jnp.asarray(native.pack_yuv420_s2d4(gray)[None])))[0]
    assert int(np.abs(rgb48.astype(int) - 200).max()) <= 1

    # smooth synthetic image (faces are smooth; noise is chroma worst-case)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    smooth = np.stack([100 + 80 * np.sin(yy / 17),
                       120 + 60 * np.cos(xx / 13),
                       90 + 50 * np.sin((xx + yy) / 23)], -1)
    img = np.clip(smooth, 0, 255).astype(np.uint8)
    packed = native.pack_yuv420_s2d4(img)
    rgb48 = np.asarray(yuv420p4_to_rgbp4(jnp.asarray(packed[None])))[0]
    # unpack s2d4 -> raw layout for PSNR
    got = rgb48.reshape(16, 16, 4, 4, 3).transpose(0, 2, 1, 3, 4).reshape(
        64, 64, 3)
    mse = float(np.mean((got.astype(np.float32) - img.astype(np.float32)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 35.0, psnr
