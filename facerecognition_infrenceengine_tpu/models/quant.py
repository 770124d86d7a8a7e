"""Post-training int8 quantization of the ArcFace IResNet embedder.

Opt-in scale mode (EngineConfig.embed_int8), NOT the parity path: v5e's
MXU runs int8 at 2x the bf16 rate, and a dependent-chain measurement
(requant between convs, the realistic shape) shows int8 convs at ~1.35x
bf16 end-to-end (0.170 vs 0.229 ms per 64ch 56^2 conv at M=128).  The
precedent is the int8 gallery (EngineConfig.gallery_dtype="int8",
ops/match_pallas.py) — faster at a small, measured accuracy cost.

Scheme (standard symmetric PTQ):
  - conv weights: per-output-channel int8, scale = max|w| / 127 over
    (kh, kw, cin);
  - conv inputs: per-tensor int8 with scales calibrated by running the
    ordinary forward over a calibration batch and recording abs-max at
    every quantization point (``calibrate``);
  - convs accumulate int8 x int8 -> int32 on the MXU
    (lax.conv_general_dilated with preferred_element_type=int32), then
    dequantize by sa*sw[c];
  - BatchNorm (inference affine), PReLU, residual adds, the first conv
    (3-channel input, negligible), the final Dense and feature BN stay
    in the float dtype.

``apply_int8`` is a functional twin of models/arcface.IResNet.__call__
reading the SAME flax variables tree (tests/test_quant.py pins the two
forwards against each other, so structure drift fails loudly).  The
reference has no quantized path at all (ONNX Runtime fp32,
infrenceServer.py:412-416); this is TPU-native headroom beyond it.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEPTHS = (3, 4, 14, 3)  # iresnet50 (arcface.iresnet50)


def _bn(x, p, s, eps=1e-5):
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    return x * inv + (p["bias"] - s["mean"] * inv)


def _prelu(x, p):
    a = p["alpha"]
    return jnp.where(x > 0, x, x * a)


def quantize_weights(variables, depths: Sequence[int] = DEPTHS,
                     min_block: int = 0):
    """Per-output-channel int8 conv kernels + scales for every block conv.

    Returns {"<block>/<conv>": (w_int8 [3,3,ci,co] or [1,1,ci,co],
    scale [co])}; the stem conv and Dense are not quantized.
    ``min_block`` keeps earlier blocks in float (mixed precision).
    Measured v5e, 128 crops: bf16 10.76 ms, full int8 5.94, int8 from
    stage 2 (min_block=3) 7.30, from stage 3 (min_block=7) 7.77 —
    unlike the detector, the embedder's per-face stage-1 maps are small
    enough that int8 wins there too, so full int8 is the default.
    """
    params = variables["params"]
    out = {}
    n_blocks = sum(depths)
    for b in range(min_block, n_blocks):
        bp = params[f"IBasicBlock_{b}"]
        for conv in ("Conv_0", "Conv_1", "Conv_2"):
            if conv not in bp:
                continue
            w = bp[conv]["kernel"].astype(jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
            w8 = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
            out[f"IBasicBlock_{b}/{conv}"] = (w8, sw)
    return out


def _forward(variables, x, qw=None, act_scales=None, depths=DEPTHS,
             dtype=jnp.bfloat16, collect=None, collect_reduce="absmax",
             collect_scales=None):
    """Shared forward.  With qw+act_scales: int8 convs.  With
    ``collect`` (a list): float forward that appends per-quant-point
    scalars in a fixed order — abs-max (calibration) or, with
    ``collect_reduce="clipfrac"`` + per-point ``collect_scales``, the
    fraction of values that would clip at that scale (diagnostics)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    f = jnp.float32
    x = x.astype(f)

    def qconv(name, xin, stride):
        """Quantization point + conv for one block conv.  A conv absent
        from ``qw`` runs in float — quantize_weights(min_block=...)
        produces such mixed schemes (e.g. float stage 1, int8 rest)."""
        if collect is not None:
            if collect_reduce == "clipfrac":
                s = collect_scales[len(collect)]
                collect.append(jnp.mean(
                    (jnp.abs(xin) > 127.0 * s).astype(f)))
            else:
                collect.append(jnp.max(jnp.abs(xin)))
        blk, conv = name.split("/")
        w = params[blk][conv]["kernel"].astype(f)
        if qw is None or name not in qw:
            y = jax.lax.conv_general_dilated(
                xin.astype(dtype), w.astype(dtype),
                (stride, stride),
                [(1, 1), (1, 1)] if w.shape[0] == 3 else [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=f)
        else:
            w8, sw = qw[name]
            sa = act_scales[name]
            x8 = jnp.clip(jnp.round(xin / sa), -127, 127).astype(jnp.int8)
            y32 = jax.lax.conv_general_dilated(
                x8, w8, (stride, stride),
                [(1, 1), (1, 1)] if w8.shape[0] == 3 else [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y32.astype(f) * (sa * sw)[None, None, None, :]
        return y

    # stem: conv + bn + prelu (kept float — 3-channel input)
    w = params["Conv_0"]["kernel"].astype(f)
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f)
    x = _bn(x, {k: v.astype(f) for k, v in params["BatchNorm_0"].items()},
            {k: v.astype(f) for k, v in stats["BatchNorm_0"].items()})
    x = _prelu(x, {k: v.astype(f) for k, v in params["PReLU_0"].items()})

    n_blocks = sum(depths)
    starts = set(np.cumsum((0,) + tuple(depths))[:-1].tolist())
    for b in range(n_blocks):
        blk = f"IBasicBlock_{b}"
        bp = {k: jax.tree_util.tree_map(lambda a: a.astype(f), v)
              for k, v in params[blk].items()}
        bs = {k: jax.tree_util.tree_map(lambda a: a.astype(f), v)
              for k, v in stats[blk].items()}
        stride = 2 if b in starts else 1
        has_down = "Conv_2" in params[blk]
        out = _bn(x, bp["BatchNorm_0"], bs["BatchNorm_0"])
        out = qconv(f"{blk}/Conv_0", out, 1)
        out = _bn(out, bp["BatchNorm_1"], bs["BatchNorm_1"])
        out = _prelu(out, bp["PReLU_0"])
        out = qconv(f"{blk}/Conv_1", out, stride)
        out = _bn(out, bp["BatchNorm_2"], bs["BatchNorm_2"])
        if has_down:
            sc = qconv(f"{blk}/Conv_2", x, stride)
            sc = _bn(sc, bp["BatchNorm_3"], bs["BatchNorm_3"])
        else:
            sc = x
        x = out + sc

    x = _bn(x, {k: v.astype(f) for k, v in params["BatchNorm_1"].items()},
            {k: v.astype(f) for k, v in stats["BatchNorm_1"].items()})
    x = x.reshape(x.shape[0], -1)
    x = (x.astype(dtype) @ params["Dense_0"]["kernel"].astype(dtype)
         ).astype(f) + params["Dense_0"]["bias"].astype(f)
    bn2 = params["BatchNorm_2"]
    x = _bn(x, {k: v.astype(f) for k, v in bn2.items()},
            {k: v.astype(f) for k, v in stats["BatchNorm_2"].items()})
    return x.astype(jnp.float32)


def calibration_order(depths: Sequence[int] = DEPTHS):
    """Quant-point names in the order ``_forward`` visits them."""
    names, starts = [], set(np.cumsum((0,) + tuple(depths))[:-1].tolist())
    # has_down mirrors arcface.IBasicBlock: stride != 1 or channel change;
    # for iresnet the channel change coincides with stage starts, so every
    # stage-start block (incl. block 0, stride 2) has Conv_2.
    for b in range(sum(depths)):
        names.append(f"IBasicBlock_{b}/Conv_0")
        names.append(f"IBasicBlock_{b}/Conv_1")
        if b in starts:
            names.append(f"IBasicBlock_{b}/Conv_2")
    return names


def calibrate(variables, calib_x, depths: Sequence[int] = DEPTHS,
              dtype=jnp.bfloat16, margin: float = 1.0):
    """Run the float forward over a calibration batch; return
    {quant_point: python-float activation scale} (abs-max / 127 * margin).

    The collection pass runs as ONE jitted program (an eager forward
    would be an RTT per op on a tunneled TPU), and the scales come back
    as host floats so they bake into downstream jits as constants."""
    def collect_maxes(v, x):
        maxes = []
        _forward(v, x, depths=depths, dtype=dtype, collect=maxes)
        return jnp.stack(maxes)

    maxes = np.asarray(jax.jit(collect_maxes)(variables, calib_x))
    names = calibration_order(depths)
    assert len(names) == len(maxes), (len(names), len(maxes))
    return {n: float(max(m, 1e-6)) * (margin / 127.0)
            for n, m in zip(names, maxes)}


def apply_int8(variables, qw, act_scales, x, depths: Sequence[int] = DEPTHS,
               dtype=jnp.bfloat16):
    """int8 embedder forward; same contract as IResNet.apply (un-normalized
    [B, 512] f32 embeddings — callers l2-normalize)."""
    return _forward(variables, x, qw=qw, act_scales=act_scales,
                    depths=depths, dtype=dtype)


def clip_fractions(variables, act_scales, x, depths: Sequence[int] = DEPTHS,
                   dtype=jnp.bfloat16) -> dict:
    """Per-quant-point fraction of activations that would clip at the given
    scales (|a| > 127 * scale).

    Diagnostic for PTQ scale drift: scales calibrated on one distribution
    (e.g. the synthetic default) may clip on another (real faces).  Runs
    the float forward once (one jitted program); returns
    {quant_point: python float in [0, 1]}.  A healthy calibration keeps
    every entry near 0 (<1e-3); persistent clipping means recalibrate
    (FaceEngine.recalibrate_int8)."""
    names = calibration_order(depths)

    def collect(v, xx):
        maxes = []
        _forward(v, xx, depths=depths, dtype=dtype, collect=maxes,
                 collect_reduce="clipfrac",
                 collect_scales=[act_scales[n] for n in names])
        return jnp.stack(maxes)

    fracs = np.asarray(jax.jit(collect)(variables, x))
    return {n: float(f) for n, f in zip(names, fracs)}


def apply_float(variables, x, depths: Sequence[int] = DEPTHS,
                dtype=jnp.bfloat16):
    """The same functional forward without quantization (golden twin used
    by tests to pin this file against models/arcface.IResNet)."""
    return _forward(variables, x, depths=depths, dtype=dtype)


# --------------------------------------------------------------------------
# SCRFD backbone (models/scrfd.ResNetV1e) int8 twin — same scheme.  The
# neck/head stay float (~0.5 ms of the ~6.5 ms detect); the backbone is
# both MXU- and bandwidth-heavy, and int8 halves activation bytes on the
# lane-padded thin-channel tensors that dominate its HBM traffic.

def _scrfd_names(cfg):
    """(quant-point name, stride, kernel, is_stem/has_down info) in
    execution order, mirroring scrfd.ResNetV1e.__call__."""
    from .scrfd import block_has_downsample

    names = [("stem1", 2, 3), ("stem2", 1, 3), ("stem3", 1, 3)]
    for i, blocks in enumerate(cfg.stage_blocks):
        for j in range(blocks):
            stride = 2 if (i > 0 and j == 0) else 1
            blk = f"layer{i + 1}_b{j}"
            names.append((f"{blk}/conv1", stride, 3))
            names.append((f"{blk}/conv2", 1, 3))
            if block_has_downsample(cfg, i, j):
                names.append((f"{blk}/downsample", 1, 1))
    return names


def quantize_scrfd_weights(variables, cfg):
    """Per-output-channel int8 kernels for every backbone conv."""
    bb = variables["params"]["backbone"]
    out = {}
    for name, _, _ in _scrfd_names(cfg):
        w = _subtree(bb, name)["Conv_0"]["kernel"].astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        w8 = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        out[name] = (w8, sw)
    return out


def _subtree(tree, path):
    for part in path.split("/"):
        tree = tree[part]
    return tree


def scrfd_backbone_forward(variables, x, cfg, qw=None, act_scales=None,
                           dtype=jnp.bfloat16, collect=None):
    """Functional twin of scrfd.ResNetV1e.__call__ (float or int8).

    Returns the [C3, C4, C5] feature list the PAFPN consumes.  Pinned
    against the flax backbone by tests/test_quant.py."""
    import flax.linen as nn

    from .scrfd import block_has_downsample

    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    f = jnp.float32

    def convbn(name, xin, stride, ksize, act):
        if collect is not None:
            collect.append(jnp.max(jnp.abs(xin)))
        p, s = _subtree(params, name), _subtree(stats, name)
        pad = [(ksize // 2, ksize // 2)] * 2
        if qw is None:
            y = jax.lax.conv_general_dilated(
                xin.astype(dtype), p["Conv_0"]["kernel"].astype(dtype),
                (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=f)
        else:
            w8, sw = qw[name]
            sa = act_scales[name]
            x8 = jnp.clip(jnp.round(xin / sa), -127, 127).astype(jnp.int8)
            y32 = jax.lax.conv_general_dilated(
                x8, w8, (stride, stride), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y32.astype(f) * (sa * sw)[None, None, None, :]
        bp = {k: v.astype(f) for k, v in p["BatchNorm_0"].items()}
        bs = {k: v.astype(f) for k, v in s["BatchNorm_0"].items()}
        y = _bn(y, bp, bs)
        return jnp.maximum(y, 0.0) if act else y

    x = x.astype(f)
    x = convbn("stem1", x, 2, 3, True)
    x = convbn("stem2", x, 1, 3, True)
    x = convbn("stem3", x, 1, 3, True)
    x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    feats = []
    for i, (blocks, planes) in enumerate(zip(cfg.stage_blocks,
                                             cfg.stage_planes)):
        for j in range(blocks):
            stride = 2 if (i > 0 and j == 0) else 1
            blk = f"layer{i + 1}_b{j}"
            out = convbn(f"{blk}/conv1", x, stride, 3, True)
            out = convbn(f"{blk}/conv2", out, 1, 3, False)
            if block_has_downsample(cfg, i, j):
                sc = x
                if stride != 1:
                    sc = nn.avg_pool(sc, (stride, stride), (stride, stride))
                sc = convbn(f"{blk}/downsample", sc, 1, 1, False)
            else:
                sc = x
            x = jnp.maximum(out + sc, 0.0)
        if i >= 1:
            feats.append(x.astype(dtype))
    return feats


def calibrate_scrfd(variables, calib_x, cfg, dtype=jnp.bfloat16,
                    margin: float = 1.0):
    """Activation scales for the backbone quant points (one jitted pass)."""
    def collect_maxes(v, x):
        maxes = []
        scrfd_backbone_forward(v, x, cfg, dtype=dtype, collect=maxes)
        return jnp.stack(maxes)

    maxes = np.asarray(jax.jit(collect_maxes)(variables, calib_x))
    names = [n for n, _, _ in _scrfd_names(cfg)]
    assert len(names) == len(maxes), (len(names), len(maxes))
    return {n: float(max(m, 1e-6)) * (margin / 127.0)
            for n, m in zip(names, maxes)}
