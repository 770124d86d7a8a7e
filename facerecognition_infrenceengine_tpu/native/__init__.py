"""Native host-side imaging runtime: ctypes bindings over imagecodec.cc.

The reference leans on OpenCV's C++ core for every host-side image
operation (cv2.imdecode trainingServer.py:221, capture resize
infrenceServer.py:581-584, HUD drawing :418-513).  Here the equivalent
native code is our own C++ (imagecodec.cc), compiled on first import with
the system toolchain and loaded via ctypes; when no compiler or libjpeg is
available the same API transparently falls back to PIL + numpy, so tests
and CPU-only environments keep working.

API (all RGB uint8 HxWx3 numpy arrays):
  decode_jpeg(bytes) -> array | None
  encode_jpeg(array, quality=90) -> bytes
  resize_bilinear(array, oh, ow) -> array
  letterbox(array, oh, ow) -> (canvas, scale)
  draw_rect / fill_rect / draw_corners / draw_text / draw_bar (in-place)
  have_native() -> bool
"""

from __future__ import annotations

import ctypes
import io
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "imagecodec.cc")
_LIB_PATH = os.path.join(_HERE, "libfreimage.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _LIB_PATH]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info("native imaging build unavailable: %s", e)
        return False
    if proc.returncode != 0:
        logger.info("native imaging build failed: %s", proc.stderr[-500:])
        return False
    return True


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.info("native imaging load failed: %s", e)
            _build_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.fre_jpeg_decode.restype = ctypes.c_int
        lib.fre_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, c_u8p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.fre_jpeg_encode.restype = ctypes.c_long
        lib.fre_jpeg_encode.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_u8p,
            ctypes.c_long]
        lib.fre_resize_bilinear.restype = None
        lib.fre_resize_bilinear.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p, ctypes.c_int,
            ctypes.c_int]
        lib.fre_letterbox.restype = ctypes.c_float
        lib.fre_letterbox.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p, ctypes.c_int,
            ctypes.c_int]
        lib.fre_letterbox_s2d4.restype = ctypes.c_float
        lib.fre_letterbox_s2d4.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p, ctypes.c_int,
            ctypes.c_int]
        lib.fre_pack_s2d4.restype = ctypes.c_int
        lib.fre_pack_s2d4.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p]
        lib.fre_pack_yuv420_s2d4.restype = ctypes.c_int
        lib.fre_pack_yuv420_s2d4.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p]
        lib.fre_letterbox_yuv420_s2d4.restype = ctypes.c_float
        lib.fre_letterbox_yuv420_s2d4.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, c_u8p, ctypes.c_int,
            ctypes.c_int]
        lib.fre_fill_rect.restype = None
        lib.fre_fill_rect.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.c_uint8, ctypes.c_float]
        lib.fre_draw_rect.restype = None
        lib.fre_draw_rect.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
            ctypes.c_uint8, ctypes.c_uint8]
        lib.fre_draw_corners.restype = None
        lib.fre_draw_corners.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8]
        lib.fre_draw_text.restype = None
        lib.fre_draw_text.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.c_uint8]
        lib.fre_draw_bar.restype = None
        lib.fre_draw_bar.argtypes = [
            c_u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_uint8,
            ctypes.c_uint8, ctypes.c_uint8]
        _lib = lib
    return _lib


def have_native() -> bool:
    return _get_lib() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _check_img(img: np.ndarray) -> np.ndarray:
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8 RGB, got {img.dtype} {img.shape}")
    if not img.flags["C_CONTIGUOUS"]:
        raise ValueError("image must be C-contiguous for in-place drawing")
    return img


# ------------------------------------------------------------------- codec
MAX_DECODE_PIXELS = 64_000_000  # 64 MP cap: a crafted header must not drive
                                # a multi-GB allocation from 200 bytes


def decode_jpeg(data: bytes):
    """JPEG bytes -> HxWx3 RGB uint8, or None on decode failure
    (cv2.imdecode contract, reference trainingServer.py:221-224)."""
    lib = _get_lib()
    if lib is not None:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = lib.fre_jpeg_decode(data, len(data), None,
                                 ctypes.byref(h), ctypes.byref(w))
        if rc == -1:
            return _decode_pil(data)
        if h.value <= 0 or w.value <= 0 or h.value * w.value > MAX_DECODE_PIXELS:
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = lib.fre_jpeg_decode(data, len(data), _ptr(out),
                                 ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return _decode_pil(data)
        return out
    return _decode_pil(data)


def decode_image(data: bytes):
    """Decode any supported image format to RGB uint8 (JPEG via the native
    codec, everything else via the PIL fallback inside decode_jpeg)."""
    return decode_jpeg(data)


def _decode_pil(data: bytes):
    try:
        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(data)) as im:
            # same allocation cap as the native path (PNG and no-compiler
            # hosts must not bypass MAX_DECODE_PIXELS)
            if im.width * im.height > MAX_DECODE_PIXELS:
                return None
            return np.asarray(im.convert("RGB"), np.uint8)
    except Exception:
        return None


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    img = _check_img(np.ascontiguousarray(img))
    lib = _get_lib()
    if lib is not None:
        cap = img.size + 65536
        dst = np.empty(cap, np.uint8)
        n = lib.fre_jpeg_encode(_ptr(img), img.shape[0], img.shape[1],
                                int(quality), _ptr(dst), cap)
        if n > 0:
            return dst[:n].tobytes()
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


# ------------------------------------------------------------------ resize
def resize_bilinear(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    img = _check_img(np.ascontiguousarray(img))
    lib = _get_lib()
    if lib is not None:
        out = np.empty((oh, ow, 3), np.uint8)
        lib.fre_resize_bilinear(_ptr(img), img.shape[0], img.shape[1],
                                _ptr(out), oh, ow)
        return out
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((ow, oh), Image.BILINEAR), np.uint8)


def letterbox(img: np.ndarray, oh: int, ow: int):
    """Scale-preserving resize into a zero-padded (oh, ow) canvas
    (top-left anchored, the SCRFD det_size convention). -> (canvas, scale)"""
    img = _check_img(np.ascontiguousarray(img))
    lib = _get_lib()
    if lib is not None:
        out = np.empty((oh, ow, 3), np.uint8)
        scale = lib.fre_letterbox(_ptr(img), img.shape[0], img.shape[1],
                                  _ptr(out), oh, ow)
        if scale > 0:
            return out, float(scale)
    h, w = img.shape[:2]
    scale = min(oh / h, ow / w)
    nh, nw = min(oh, int(h * scale + 0.5)), min(ow, int(w * scale + 0.5))
    canvas = np.zeros((oh, ow, 3), np.uint8)
    canvas[:nh, :nw] = resize_bilinear(img, nh, nw)
    return canvas, float(scale)


def pack_s2d4(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] u8 raw canvas -> [H/4, W/4, 48] s2d4-packed (channel
    (p*4+q)*3+c = raw pixel (4Y+p, 4X+q)) — the fused-stem input layout."""
    img = _check_img(np.ascontiguousarray(img))
    h, w = img.shape[:2]
    if h % 4 or w % 4:
        raise ValueError(f"H, W must be multiples of 4, got {h}x{w}")
    lib = _get_lib()
    if lib is not None:
        out = np.empty((h // 4, w // 4, 48), np.uint8)
        if lib.fre_pack_s2d4(_ptr(img), h, w, _ptr(out)) == 0:
            return out
    return np.ascontiguousarray(
        img.reshape(h // 4, 4, w // 4, 4, 3).transpose(0, 2, 1, 3, 4)
    ).reshape(h // 4, w // 4, 48)


def letterbox_s2d4(img: np.ndarray, oh: int, ow: int):
    """Letterbox straight into s2d4-packed layout [oh/4, ow/4, 48].

    Identical letterbox semantics to :func:`letterbox`; the packed
    permutation is applied at pixel-writing time by the native code (free),
    so the TPU's fused detector stem (ops/stem_pallas.py) gets its input
    layout without any on-device transpose.  -> (packed, scale)
    """
    img = _check_img(np.ascontiguousarray(img))
    if oh % 4 or ow % 4:
        raise ValueError(f"canvas must be multiple of 4, got {oh}x{ow}")
    lib = _get_lib()
    if lib is not None:
        out = np.empty((oh // 4, ow // 4, 48), np.uint8)
        scale = lib.fre_letterbox_s2d4(_ptr(img), img.shape[0], img.shape[1],
                                       _ptr(out), oh, ow)
        if scale > 0:
            return out, float(scale)
    canvas, scale = letterbox(img, oh, ow)
    return pack_s2d4(canvas), scale


def pack_yuv420_s2d4(img: np.ndarray) -> np.ndarray:
    """[H, W, 3] RGB u8 -> [H/4, W/4, 24] packed 4:2:0 YUV (s2d4 layout):
    ch 0-15 = Y phases (p*4+q), ch 16-19 = U of chroma block (p2*2+q2),
    ch 20-23 = V.  BT.601 full-range.  1.5 B/px — HALF the host->device
    bytes of RGB; ops/yuv.py undoes it on device with one constant matmul.
    """
    img = _check_img(np.ascontiguousarray(img))
    h, w = img.shape[:2]
    if h % 4 or w % 4:
        raise ValueError(f"H, W must be multiples of 4, got {h}x{w}")
    lib = _get_lib()
    if lib is not None:
        out = np.empty((h // 4, w // 4, 24), np.uint8)
        if lib.fre_pack_yuv420_s2d4(_ptr(img), h, w, _ptr(out)) == 0:
            return out
    # numpy fallback (bit-identical: same rounding)
    f = img.astype(np.float32)
    y = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    yp = np.floor(y + 0.5).astype(np.uint8)
    blk = f.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
    u = (-0.168736 * blk[..., 0] - 0.331264 * blk[..., 1]
         + 0.5 * blk[..., 2] + 128.0)
    v = (0.5 * blk[..., 0] - 0.418688 * blk[..., 1]
         - 0.081312 * blk[..., 2] + 128.0)
    u8 = np.floor(np.clip(u, 0, 255) + 0.5).astype(np.uint8)
    v8 = np.floor(np.clip(v, 0, 255) + 0.5).astype(np.uint8)
    out = np.empty((h // 4, w // 4, 24), np.uint8)
    out[..., :16] = yp.reshape(h // 4, 4, w // 4, 4).transpose(
        0, 2, 1, 3).reshape(h // 4, w // 4, 16)
    out[..., 16:20] = u8.reshape(h // 4, 2, w // 4, 2).transpose(
        0, 2, 1, 3).reshape(h // 4, w // 4, 4)
    out[..., 20:24] = v8.reshape(h // 4, 2, w // 4, 2).transpose(
        0, 2, 1, 3).reshape(h // 4, w // 4, 4)
    return out


def letterbox_yuv420_s2d4(img: np.ndarray, oh: int, ow: int):
    """Letterbox an RGB frame straight into packed-YUV420 s2d4
    [oh/4, ow/4, 24].  -> (packed, scale).  Same letterbox semantics as
    :func:`letterbox`; this is the streaming transport encoder
    (engine.detect_align_embed_yuv420 is the matching device program)."""
    img = _check_img(np.ascontiguousarray(img))
    if oh % 4 or ow % 4:
        raise ValueError(f"canvas must be multiple of 4, got {oh}x{ow}")
    lib = _get_lib()
    if lib is not None:
        out = np.empty((oh // 4, ow // 4, 24), np.uint8)
        scale = lib.fre_letterbox_yuv420_s2d4(
            _ptr(img), img.shape[0], img.shape[1], _ptr(out), oh, ow)
        if scale > 0:
            return out, float(scale)
    canvas, scale = letterbox(img, oh, ow)
    return pack_yuv420_s2d4(canvas), scale


# -------------------------------------------------------------- rasterizer
def _color3(color) -> tuple:
    r, g, b = (int(c) for c in color)
    return r, g, b


def fill_rect(img, y0, x0, y1, x1, color, alpha: float = 1.0):
    img = _check_img(img)
    lib = _get_lib()
    r, g, b = _color3(color)
    if lib is not None:
        lib.fre_fill_rect(_ptr(img), img.shape[0], img.shape[1],
                          int(y0), int(x0), int(y1), int(x1), r, g, b,
                          float(alpha))
        return img
    h, w = img.shape[:2]
    y0, y1 = max(0, int(y0)), min(h, int(y1))
    x0, x1 = max(0, int(x0)), min(w, int(x1))
    if y1 > y0 and x1 > x0:
        region = img[y0:y1, x0:x1].astype(np.float32)
        img[y0:y1, x0:x1] = (region * (1 - alpha) +
                             np.array([r, g, b], np.float32) * alpha
                             ).astype(np.uint8)
    return img


def draw_rect(img, y0, x0, y1, x1, color, thick: int = 2):
    img = _check_img(img)
    lib = _get_lib()
    r, g, b = _color3(color)
    if lib is not None:
        lib.fre_draw_rect(_ptr(img), img.shape[0], img.shape[1],
                          int(y0), int(x0), int(y1), int(x1), int(thick),
                          r, g, b)
        return img
    fill_rect(img, y0, x0, y0 + thick, x1, color)
    fill_rect(img, y1 - thick, x0, y1, x1, color)
    fill_rect(img, y0, x0, y1, x0 + thick, color)
    fill_rect(img, y0, x1 - thick, y1, x1, color)
    return img


def draw_corners(img, y0, x0, y1, x1, color, length: int = 18, thick: int = 3):
    img = _check_img(img)
    lib = _get_lib()
    r, g, b = _color3(color)
    if lib is not None:
        lib.fre_draw_corners(_ptr(img), img.shape[0], img.shape[1],
                             int(y0), int(x0), int(y1), int(x1), int(length),
                             int(thick), r, g, b)
        return img
    # fallback: plain rect
    return draw_rect(img, y0, x0, y1, x1, color, thick)


def draw_text(img, y, x, text: str, color, scale: int = 1):
    img = _check_img(img)
    lib = _get_lib()
    r, g, b = _color3(color)
    if lib is not None:
        lib.fre_draw_text(_ptr(img), img.shape[0], img.shape[1], int(y),
                          int(x), text.encode("ascii", "replace"), int(scale),
                          r, g, b)
        return img
    return img  # text is HUD sugar; no-op without the native rasterizer


def draw_bar(img, y0, x0, y1, x1, frac: float, color):
    img = _check_img(img)
    lib = _get_lib()
    r, g, b = _color3(color)
    if lib is not None:
        lib.fre_draw_bar(_ptr(img), img.shape[0], img.shape[1], int(y0),
                         int(x0), int(y1), int(x1), float(frac), r, g, b)
        return img
    draw_rect(img, y0, x0, y1, x1, color, 1)
    fillw = int((x1 - x0 - 4) * max(0.0, min(1.0, frac)))
    fill_rect(img, y0 + 2, x0 + 2, y1 - 2, x0 + 2 + fillw, color, 0.85)
    return img
