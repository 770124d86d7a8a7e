"""SCRFD-style anchor-based face detector (the buffalo_l ``det_10g`` role).

The reference runs insightface's ONNX SCRFD for detection + 5-point
landmarks (reference infrenceServer.py:412-416/528, trainingServer.py:227,
peopleCount.py:857: ``face_detector.get(frame)`` → ``.bbox``, ``.det_score``,
``.kps``).  This flax implementation keeps the public SCRFD output
convention — per-stride flattened heads, 2 anchors per location, distances
in stride units — so ``ops.anchors`` / ``ops.boxes`` decode it exactly like
insightface decodes det_10g, and converted weights stay drop-in.

Everything is static-shape: the jitted forward emits [B, A, {1,4,10}] for a
fixed input canvas; score filtering, top-k and NMS happen in the same XLA
program (engine/pipeline.py), never on the host.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ConvBN, ConvBNPReLU

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2


@dataclass(frozen=True)
class SCRFDConfig:
    stem_width: int = 28
    depths: Sequence[int] = (1, 2, 4, 2)
    widths: Sequence[int] = (56, 88, 112, 224)
    neck_width: int = 96
    head_width: int = 96
    head_depth: int = 2


# Capacity tiers loosely tracking the SCRFD-500M/2.5G/10G family.
CONFIGS = {
    "det_10g": SCRFDConfig(),
    "det_2.5g": SCRFDConfig(stem_width=24, depths=(1, 2, 2, 2), widths=(40, 64, 92, 128),
                            neck_width=64, head_width=64),
    "det_500m": SCRFDConfig(stem_width=16, depths=(1, 1, 2, 1), widths=(24, 40, 64, 80),
                            neck_width=48, head_width=48, head_depth=1),
}


class ResBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNPReLU(self.planes, 3, self.stride, dtype=self.dtype)(x, train)
        out = ConvBN(self.planes, 3, 1, dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = ConvBN(self.planes, 1, self.stride, dtype=self.dtype)(x, train)
        return nn.activation.relu(out + x)


class Backbone(nn.Module):
    cfg: SCRFDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        x = ConvBNPReLU(c.stem_width, 3, 2, dtype=self.dtype)(x, train)  # s2
        feats = []
        for i, (depth, width) in enumerate(zip(c.depths, c.widths)):
            x = ResBlock(width, stride=2, dtype=self.dtype)(x, train)
            for _ in range(depth - 1):
                x = ResBlock(width, stride=1, dtype=self.dtype)(x, train)
            if i >= 1:  # keep c3 (s8), c4 (s16), c5 (s32)
                feats.append(x)
        return feats  # [s8, s16, s32]


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class PAFPN(nn.Module):
    """FPN top-down + bottom-up aggregation over the 3 detection levels."""

    width: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [ConvBN(self.width, 1, 1, dtype=self.dtype)(f, train) for f in feats]
        # top-down
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample2(laterals[i])
        outs = [ConvBNPReLU(self.width, 3, 1, dtype=self.dtype)(l, train) for l in laterals]
        # bottom-up
        for i in range(len(outs) - 1):
            outs[i + 1] = outs[i + 1] + ConvBN(self.width, 3, 2, dtype=self.dtype)(outs[i], train)
        return outs


class SCRFDHead(nn.Module):
    """Shared head applied per level: cls [A*1], bbox [A*4], kps [A*10]."""

    width: int
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.depth):
            x = ConvBNPReLU(self.width, 3, 1, dtype=self.dtype)(x, train)
        cls = nn.Conv(NUM_ANCHORS * 1, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype,
                      bias_init=nn.initializers.constant(-4.595))(x)  # prior p=0.01
        bbox = nn.Conv(NUM_ANCHORS * 4, (3, 3), padding=[(1, 1), (1, 1)],
                       dtype=self.dtype)(x)
        kps = nn.Conv(NUM_ANCHORS * 10, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype)(x)
        return cls, bbox, kps


class SCRFD(nn.Module):
    cfg: SCRFDConfig = field(default_factory=SCRFDConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] scaled to [-1, 1] (insightface det convention is
        (x - 127.5) / 128; the 0.4% scale delta is absorbed by BN when
        converting weights, we use 127.5 throughout).

        Returns (scores [B, A, 1] logits, bbox [B, A, 4] stride units,
        kps [B, A, 10] stride units), A = sum over strides of H/s*W/s*2,
        rows ordered (stride asc, y, x, anchor) to match ops.anchors.
        """
        x = x.astype(self.dtype)
        feats = Backbone(self.cfg, dtype=self.dtype)(x, train)
        feats = PAFPN(self.cfg.neck_width, dtype=self.dtype)(feats, train)
        head = SCRFDHead(self.cfg.head_width, self.cfg.head_depth, dtype=self.dtype)
        # One shared head module applied to all levels (SCRFD weight sharing);
        # per-level learnable scale on the bbox branch.
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


def num_anchors_total(height: int, width: int) -> int:
    return sum((height // s) * (width // s) * NUM_ANCHORS for s in STRIDES)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB -> detector input convention."""
    return (images.astype(jnp.float32) - 127.5) / 128.0
