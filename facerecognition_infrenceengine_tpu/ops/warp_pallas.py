"""Pallas TPU kernel for the two-pass face warp.

The XLA formulation (ops/warp2pass.py) materializes the hat-weight tensors
in HBM — [R, out, R] f32 is ~16.5 MB *per face*, so a 128-face batch moves
~3-4 GB of interpolation weights through HBM per step.  This kernel keeps
the whole warp resident in VMEM: the ROI streams in once (~1.6 MB/face in
its padded layout), hat weights are generated on the fly in VMEM tiles,
both resampling passes run as MXU contractions, and only the crop leaves
the chip.

Layout rules that make it fit (TPU tiles pad the last dim to 128 lanes and
the second-to-last to 8 sublanes): the 3 image channels must NEVER sit in
the lane dimension — a [.., R, 3] block pads 3 -> 128 lanes, a 42x VMEM
blowup.  So the kernel takes the ROI as [M, R, C, R] and emits the crop as
[M, out, C, out]; the XLA caller transposes at the boundary (fused into
neighbours by XLA).

Grid: one program per face.  Per-face VMEM (padded): ROI 1.6 MB + tmp
0.8 MB + per-tile hat weights ~2 MB + out 0.5 MB — well under 16 MB.

Used by ops.warp2pass.warp_faces_two_pass on TPU; the XLA path remains the
fallback (and the golden reference — interpret-mode tests check the kernel
against it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota_f32(shape, dim):
    # Mosaic's iota is integer-only; cast after (guide: "Iota" section).
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _hat(coords: jnp.ndarray, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """coords [..., K] -> hat weights [..., K, n_in] (border-replicate).

    (A bf16 variant was tried: Mosaic's 16-sublane bf16 tiling padded the
    3-channel dims so hard it used MORE VMEM than f32 — keep f32.)
    """
    c = jnp.clip(coords, 0.0, n_in - 1.0)
    idx = _iota_f32(coords.shape + (n_in,), coords.ndim)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - idx)).astype(dtype)


def _warp_kernel(roi_ref, mat_ref, out_ref, tmp_ref, lhs_ref, *,
                 out_size: int, y_tile: int, i_tile: int):
    """One face.

    roi [1, R, C, R(x)] VMEM; mat [M, 8] SMEM (m00..m12, padded, indexed by
    program id); out [1, out(i), C, out(j)]; scratch tmp [R(y), C, out(j)],
    lhs [out(j), C, R(y)].
    """
    r = roi_ref.shape[1]
    face = pl.program_id(0)
    m00 = mat_ref[face, 0]
    m01 = mat_ref[face, 1]
    m02 = mat_ref[face, 2]
    m10 = mat_ref[face, 3]
    m11 = mat_ref[face, 4]
    m12 = mat_ref[face, 5]
    m11 = jnp.where(jnp.abs(m11) < 1e-6, 1e-6, m11)

    a1 = m00 - m01 * m10 / m11
    b1 = m01 / m11
    c1 = m02 - m01 * m12 / m11

    jj = _iota_f32((out_size, 1), 0)[:, 0]

    # ---- pass 1 (horizontal): tmp[y, c, j] = sum_x roi[y, c, x] w1[y, j, x]
    def pass1(t, _):
        y0 = t * y_tile
        yy = _iota_f32((y_tile, 1), 0)[:, 0] + jnp.asarray(y0, jnp.float32)
        u = a1 * jj[None, :] + b1 * yy[:, None] + c1  # [TY, out(j)]
        w1 = _hat(u, r)  # [TY, out(j), x]
        roi_t = roi_ref[0, pl.ds(y0, y_tile), :, :]  # [TY, C, x]
        # batched over y: [C, x] @ [x, out(j)] -> [C, out(j)]
        tile = jax.lax.dot_general(
            roi_t, jnp.swapaxes(w1, 1, 2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TY, C, out(j)]
        tmp_ref[pl.ds(y0, y_tile), :, :] = tile
        return 0

    jax.lax.fori_loop(0, r // y_tile, pass1, 0)

    # ---- pass 2 (vertical): out[i, c, j] = sum_y tmp[y, c, j] w2[j, i, y]
    lhs_ref[:, :, :] = jnp.transpose(tmp_ref[:, :, :], (2, 1, 0))  # [j, C, y]

    def pass2(t, _):
        i0 = t * i_tile
        ii = _iota_f32((i_tile, 1), 0)[:, 0] + jnp.asarray(i0, jnp.float32)
        sy = m10 * jj[:, None] + m11 * ii[None, :] + m12  # [out(j), TI]
        w2 = _hat(sy, r)  # [out(j), TI, y]
        # batched over j: [C, y] @ [y, TI] -> [C, TI]
        tile = jax.lax.dot_general(
            lhs_ref[:, :, :], jnp.swapaxes(w2, 1, 2),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [out(j), C, TI]
        out_ref[0, pl.ds(i0, i_tile), :, :] = jnp.transpose(tile, (2, 1, 0))
        return 0

    jax.lax.fori_loop(0, out_size // i_tile, pass2, 0)


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def warp_rois_pallas(rois: jnp.ndarray, mats: jnp.ndarray,
                     out_size: int = 112, interpret: bool = False) -> jnp.ndarray:
    """Warp M pre-extracted ROIs with per-face dst->roi affines.

    rois: [M, R, R, C] float32; mats: [M, 2, 3] float32 (dst -> roi coords).
    Returns [M, out_size, out_size, C] float32.
    """
    m, r, _, c = rois.shape
    y_tile = 16
    i_tile = 16
    assert r % y_tile == 0 and out_size % i_tile == 0
    mats_flat = jnp.concatenate(
        [mats.reshape(m, 6), jnp.zeros((m, 2), mats.dtype)], axis=1)  # pad to 8
    rois_t = jnp.swapaxes(rois, 2, 3)  # [M, R, C, R(x)] — channels off lanes

    kernel = functools.partial(_warp_kernel, out_size=out_size,
                               y_tile=y_tile, i_tile=i_tile)
    out = pl.pallas_call(
        kernel,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, r, c, r), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, c, out_size),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_size, c, out_size),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((r, c, out_size), jnp.float32),
            pltpu.VMEM((out_size, c, r), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * r * out_size * (r + out_size) * c,
            bytes_accessed=m * (r * r * c + out_size * out_size * c) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rois_t, mats_flat)
    return jnp.swapaxes(out, 2, 3)  # [M, out, out, C]
