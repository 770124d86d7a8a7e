"""SCRFD face detector — the exact ``det_10g`` graph of the buffalo_l pack.

The reference serves insightface's ONNX SCRFD-10GF for detection + 5-point
landmarks (reference infrenceServer.py:412-416/528, trainingServer.py:227,
peopleCount.py:857: ``face_detector.get(frame)`` → ``.bbox``, ``.det_score``,
``.kps``).  ``CONFIGS["det_10g"]`` here is that network layer-for-layer, so
``tools/convert_onnx.py`` can map the det_10g.onnx initializers onto this
tree and detection becomes weight-exact (BASELINE.md "identical match
decisions" hangs on detection parity → alignment parity → embedding parity):

* **Backbone — ResNetV1e**: deep stem of three 3x3 convs (28→28→56, first
  stride 2) + 3x3/2 max-pool, then four BasicBlock stages of
  (3, 4, 2, 3) blocks at (56, 88, 88, 224) channels, strides (1, 2, 2, 2).
  Downsample shortcuts are ResNet-D style: 2x2 avg-pool then 1x1 conv
  ("avg_down").  Feature taps: C3 (s8, 88ch), C4 (s16, 88ch), C5 (s32, 224ch).
* **Neck — PAFPN** at 56 channels: 1x1 laterals, top-down nearest-2x adds,
  per-level 3x3 convs, then a bottom-up pass (3x3/2 downsample adds + 3x3
  convs).  Neck convs carry bias and have no norm/activation (mmdet PAFPN
  with norm_cfg=None).
* **Head — shared across strides** ("strides_share"): four 3x3 conv+BN+ReLU
  at 64 channels, then 3x3 output convs for cls (2 = anchors x 1),
  bbox (8 = anchors x 4) and kps (20 = anchors x 10), with a learnable
  per-level scalar scale on the bbox branch ("scale_mode=2").  cls bias is
  initialized to the 1% prior (-4.595).

Cross-checks against the published SCRFD-10GF budget: this graph has
3,857,685 parameters (published: 3.86M) and ~9.9 GMACs at 640x480
(published: 9.98G) — pinned by tests/test_scrfd_census.py together with the
full initializer census the ONNX converter maps against.

The public decode convention is unchanged: per-stride flattened heads, rows
ordered (stride asc, y, x, anchor), 2 anchors per location, distances in
stride units — ``ops.anchors`` / ``ops.boxes`` decode it exactly like
insightface decodes det_10g.

Everything is static-shape: the jitted forward emits [B, A, {1,4,10}] for a
fixed input canvas; score filtering, top-k and NMS happen in the same XLA
program (engine/pipeline.py), never on the host.

The ``det_2.5g`` / ``det_500m`` entries are reduced-capacity siblings of the
same graph family used by tests and the multi-chip dryrun; the reference
only ever loads det_10g, so only det_10g is weight-exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBN

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2


@dataclass(frozen=True)
class SCRFDConfig:
    stem_width: int = 28  # first/second deep-stem conv width; third is 2x
    stage_blocks: Sequence[int] = (3, 4, 2, 3)
    stage_planes: Sequence[int] = (56, 88, 88, 224)
    neck_width: int = 56
    head_width: int = 64
    head_depth: int = 4


CONFIGS = {
    # Exact SCRFD-10GF (det_10g.onnx) — see module docstring.
    "det_10g": SCRFDConfig(),
    # Reduced tiers for tests/dryrun (same graph family, not weight-exact).
    "det_2.5g": SCRFDConfig(stem_width=12, stage_blocks=(2, 3, 2, 2),
                            stage_planes=(24, 48, 48, 96), neck_width=32,
                            head_width=32, head_depth=2),
    "det_500m": SCRFDConfig(stem_width=8, stage_blocks=(1, 2, 2, 1),
                            stage_planes=(16, 32, 48, 64), neck_width=24,
                            head_width=24, head_depth=2),
}


class BasicBlockV1e(nn.Module):
    """ResNet BasicBlock with the ResNet-D ("avg_down") shortcut.

    conv3x3(stride)-BN-ReLU → conv3x3-BN, shortcut = identity or
    avgpool(stride) + conv1x1 + BN, then add + ReLU.  Execution order
    (conv1, conv2, downsample) matches the torch trace order so the ONNX
    converter's order-based mapping lines up.
    """

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.planes, 3, self.stride, act=nn.relu,
                     dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.stride != 1:
                x = nn.avg_pool(x, (self.stride, self.stride),
                                (self.stride, self.stride))
            x = ConvBN(self.planes, 1, 1, dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + x)


def block_has_downsample(cfg: SCRFDConfig, stage: int, block: int) -> bool:
    """Whether backbone block (stage, block) carries a downsample shortcut."""
    if block != 0:
        return False
    stride = 1 if stage == 0 else 2
    in_ch = 2 * cfg.stem_width if stage == 0 else cfg.stage_planes[stage - 1]
    return stride != 1 or in_ch != cfg.stage_planes[stage]


class ResNetV1e(nn.Module):
    """Deep-stem, avg-down ResNet backbone (mmdet ResNetV1e)."""

    cfg: SCRFDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stem_out=None):
        c = self.cfg
        if stem_out is not None:
            # Precomputed stem activation (models/packed_stem.py evaluates
            # the same stem weights in space-to-depth layout — ~2x faster
            # on TPU).  Params below are declared at init (stem_out=None)
            # and simply unused on this path.
            x = stem_out
        else:
            x = ConvBN(c.stem_width, 3, 2, act=nn.relu, dtype=self.dtype,
                       name="stem1")(x, train)
            x = ConvBN(c.stem_width, 3, 1, act=nn.relu, dtype=self.dtype,
                       name="stem2")(x, train)
            x = ConvBN(2 * c.stem_width, 3, 1, act=nn.relu, dtype=self.dtype,
                       name="stem3")(x, train)
            x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for i, (blocks, planes) in enumerate(zip(c.stage_blocks, c.stage_planes)):
            for j in range(blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlockV1e(planes, stride, dtype=self.dtype,
                                  name=f"layer{i + 1}_b{j}")(x, train)
            if i >= 1:  # start_level=1: keep C3 (s8), C4 (s16), C5 (s32)
                feats.append(x)
        return feats


def _upsample2(x):
    b, h, w, c = x.shape
    # nearest-2x without gathers: broadcast each pixel into a 2x2 tile.
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class PAFPN(nn.Module):
    """mmdet PAFPN: FPN top-down + bottom-up aggregation, 3 levels.

    All convs bias-only (norm_cfg=None, act_cfg=None in the det_10g config).
    Conv execution order (laterals, fpn, downsample, pafpn) matches the
    torch trace for the converter.
    """

    width: int
    dtype: jnp.dtype = jnp.float32

    def _conv(self, name: str, kernel: int, stride: int = 1):
        return nn.Conv(self.width, (kernel, kernel), strides=(stride, stride),
                       padding=[(kernel // 2, kernel // 2)] * 2,
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n = len(feats)
        laterals = [self._conv(f"lateral{i}", 1)(f) for i, f in enumerate(feats)]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample2(laterals[i])
        inter = [self._conv(f"fpn{i}", 3)(l) for i, l in enumerate(laterals)]
        for i in range(n - 1):
            inter[i + 1] = inter[i + 1] + self._conv(f"down{i}", 3, 2)(inter[i])
        return [inter[0]] + [self._conv(f"pafpn{i}", 3)(inter[i + 1])
                             for i in range(n - 1)]


class SCRFDHead(nn.Module):
    """Stride-shared head: conv+BN+ReLU stack, then cls/bbox/kps 3x3 convs."""

    width: int
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            x = ConvBN(self.width, 3, 1, act=nn.relu, dtype=self.dtype,
                       name=f"stack{i}")(x, train)
        pad = [(1, 1), (1, 1)]
        cls = nn.Conv(NUM_ANCHORS * 1, (3, 3), padding=pad, dtype=self.dtype,
                      bias_init=nn.initializers.constant(-4.595),
                      name="cls")(x)  # prior p=0.01
        bbox = nn.Conv(NUM_ANCHORS * 4, (3, 3), padding=pad, dtype=self.dtype,
                       name="reg")(x)
        kps = nn.Conv(NUM_ANCHORS * 10, (3, 3), padding=pad, dtype=self.dtype,
                      name="kps")(x)
        return cls, bbox, kps


class SCRFD(nn.Module):
    cfg: SCRFDConfig = field(default_factory=SCRFDConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stem_out=None, feats_in=None):
        """x: [B, H, W, 3] scaled to [-1, 1] (insightface det convention is
        (x - 127.5) / 128; the 0.4% scale delta is absorbed by BN when
        converting weights, we use 127.5 throughout).

        ``stem_out`` optionally injects a precomputed backbone stem
        activation (the packed space-to-depth stem, models/packed_stem.py);
        ``feats_in`` injects the whole [C3, C4, C5] backbone output (the
        int8 backbone twin, models/quant.scrfd_backbone_forward) — the
        flax backbone params are declared either way and simply unused.

        Returns (scores [B, A, 1] logits, bbox [B, A, 4] stride units,
        kps [B, A, 10] stride units), A = sum over strides of H/s*W/s*2,
        rows ordered (stride asc, y, x, anchor) to match ops.anchors.
        """
        x = x.astype(self.dtype)
        if feats_in is not None:
            # int8 backbone twin supplies [C3, C4, C5] — don't trace the
            # float backbone at all (its params were declared at init and
            # stay unused; tracing it would double compile work and, under
            # jax.disable_jit, actually execute the dead graph).
            feats = [f.astype(self.dtype) for f in feats_in]
        else:
            feats = ResNetV1e(self.cfg, dtype=self.dtype, name="backbone")(
                x, train, stem_out=stem_out)
        feats = PAFPN(self.cfg.neck_width, dtype=self.dtype, name="neck")(feats, train)
        head = SCRFDHead(self.cfg.head_width, self.cfg.head_depth,
                         dtype=self.dtype, name="head")
        # One shared head module applied to all levels (strides_share=True:
        # the same conv/BN weights run at s8/s16/s32); per-level learnable
        # scalar scale on the bbox branch (scale_mode=2).
        scores, bboxes, kpss = [], [], []
        for lvl, f in enumerate(feats):
            cls, bbox, kps = head(f, train)
            scale = self.param(f"bbox_scale_{lvl}", nn.initializers.ones, (1,))
            b = f.shape[0]
            scores.append(cls.reshape(b, -1, 1))
            bboxes.append((bbox * scale).reshape(b, -1, 4))
            kpss.append(kps.reshape(b, -1, 10))
        return (
            jnp.concatenate(scores, axis=1).astype(jnp.float32),
            jnp.concatenate(bboxes, axis=1).astype(jnp.float32),
            jnp.concatenate(kpss, axis=1).astype(jnp.float32),
        )


def layer_execution_order(cfg: SCRFDConfig) -> list:
    """[(kind, flax-subtree-path)] in torch/ONNX trace order.

    kinds: ``convbn`` (Conv node then BatchNormalization node, params under
    <path>/Conv_0 + <path>/BatchNorm_0), ``conv`` (bias-carrying Conv only,
    params under <path>), ``scale`` (1-element Mul constant, param at
    <path>).  The shared head traces once per level in ONNX; repeated nodes
    reuse the same initializers, which the converter detects by name.
    """
    order = [("convbn", "params/backbone/stem1"),
             ("convbn", "params/backbone/stem2"),
             ("convbn", "params/backbone/stem3")]
    for i, blocks in enumerate(cfg.stage_blocks):
        for j in range(blocks):
            base = f"params/backbone/layer{i + 1}_b{j}"
            order.append(("convbn", f"{base}/conv1"))
            order.append(("convbn", f"{base}/conv2"))
            if block_has_downsample(cfg, i, j):
                order.append(("convbn", f"{base}/downsample"))
    for i in range(3):
        order.append(("conv", f"params/neck/lateral{i}"))
    for i in range(3):
        order.append(("conv", f"params/neck/fpn{i}"))
    for i in range(2):
        order.append(("conv", f"params/neck/down{i}"))
    for i in range(2):
        order.append(("conv", f"params/neck/pafpn{i}"))
    # Head (shared weights; ONNX re-traces per level — listed once here).
    for i in range(cfg.head_depth):
        order.append(("convbn", f"params/head/stack{i}"))
    order.append(("conv", "params/head/cls"))
    order.append(("conv", "params/head/reg"))
    # One Mul (Scale) constant per level, encountered in level order as the
    # shared head re-traces; convs/BNs of the repeats reuse initializers.
    for lvl in range(3):
        order.append(("scale", f"params/bbox_scale_{lvl}"))
    order.append(("conv", "params/head/kps"))
    return order


def num_anchors_total(height: int, width: int) -> int:
    return sum((height // s) * (width // s) * NUM_ANCHORS for s in STRIDES)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB -> detector input convention."""
    return (images.astype(jnp.float32) - 127.5) / 128.0
