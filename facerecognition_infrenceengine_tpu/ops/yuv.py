"""Device-side inverse of the host's packed-YUV420 transport encoding.

The streaming serving path is host->device *transfer bound* (BENCH_r02:
20 MB/s tunnel vs 1.2 MB/frame raw RGB; a real TPU host's PCIe link is
wider but the frames-per-host math is the same).  The host packs frames as
4:2:0 YUV in the s2d4 layout (native/imagecodec.cc fre_pack_yuv420_s2d4,
1.5 B/px — half of RGB's 3), and this module undoes it on device.

The whole color conversion + chroma upsample is ONE constant [24, 48]
matmul per packed pixel: output phase (p, q) channel c is a linear
combination of the Y channel (p*4+q) and the chroma block channels
(16/20 + (p//2)*2 + q//2), so "unpack YUV -> RGB s2d4" never materializes
a byte transpose — it rides the MXU, ~50 MFLOP per 640x640 frame.
BT.601 full-range, the exact inverse of the host coefficients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def _mix_constants() -> tuple:
    """(K [24, 48], bias [48]) with rgb = clip(round(yuv24 @ K + bias))."""
    k = np.zeros((24, 48), np.float32)
    b = np.zeros((48,), np.float32)
    cu = (0.0, -0.344136, 1.772)     # U coefficient per RGB channel
    cv = (1.402, -0.714136, 0.0)     # V coefficient per RGB channel
    for p in range(4):
        for q in range(4):
            uvch = (p // 2) * 2 + (q // 2)
            for c in range(3):
                o = (p * 4 + q) * 3 + c
                k[p * 4 + q, o] = 1.0
                k[16 + uvch, o] = cu[c]
                k[20 + uvch, o] = cv[c]
                b[o] = -(cu[c] + cv[c]) * 128.0
    return k, b


@jax.jit
def yuv420p4_to_rgbp4(x24: jnp.ndarray) -> jnp.ndarray:
    """[..., 24] packed-YUV420 u8 -> [..., 48] packed-RGB s2d4 u8.

    Output feeds the packed fused program (engine detect_align_embed_packed
    path) directly: same layout the native RGB letterbox emits.
    """
    k, b = _mix_constants()
    f = x24.astype(jnp.float32)
    rgb = f @ jnp.asarray(k) + jnp.asarray(b)
    return jnp.clip(jnp.floor(rgb + 0.5), 0.0, 255.0).astype(jnp.uint8)


def yuv420p4_to_rgb_host(pack: np.ndarray) -> np.ndarray:
    """[rows, w4, 24] packed-YUV420 u8 -> [rows*4, w4*4, 3] u8 RGB, on the
    host (numpy).  Fallback decoder for batches that can't take the fused
    yuv device path (e.g. mixed wire formats from cameras at different
    resolutions): the pack is turned back into a plain RGB frame and served
    through the raw-RGB programs.  Same constants as the device unpack;
    the 4:2:0 chroma loss was already paid at encode time."""
    k, b = _mix_constants()
    rows, w4 = pack.shape[:2]
    rgb48 = pack.astype(np.float32) @ k + b
    rgb48 = np.clip(np.floor(rgb48 + 0.5), 0.0, 255.0).astype(np.uint8)
    # undo s2d4: channel (p*4+q)*3+c -> pixel (r*4+p, x*4+q, c)
    return (rgb48.reshape(rows, w4, 4, 4, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * 4, w4 * 4, 3))


def rgb_to_yuv420p4_reference(img: np.ndarray) -> np.ndarray:
    """Pure-numpy reference of the host packer (tests pin the native C++
    and this against each other byte-for-byte)."""
    h, w = img.shape[:2]
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
