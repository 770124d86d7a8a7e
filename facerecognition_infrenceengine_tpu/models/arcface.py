"""ArcFace IResNet embedder (the buffalo_l ``w600k_r50`` equivalent).

The reference obtains 512-d ``normed_embedding`` vectors from insightface's
ONNX w600k_r50 (reference infrenceServer.py:532, trainingServer.py:243,
peopleCount.py:863).  This is the same improved-ResNet architecture in flax,
NHWC, jit/pjit-friendly: BN-first basic blocks with per-channel PReLU,
stride-2 at each stage entry (112 -> 56 -> 28 -> 14 -> 7), and a
BN-flatten-FC(512)-BN feature head.  Weight layout matches iresnet
name-for-name so converted buffalo_l weights drop in (tools/convert_onnx.py)
— that preserves already-enrolled galleries (BASELINE.md parity target).

Preprocessing convention (insightface): RGB, (x - 127.5) / 127.5.
Embeddings are *not* normalized by the model; callers L2-normalize
(ops.matching.l2_normalize), mirroring ``normed_embedding``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import PReLU


class IBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  epsilon=1e-5, dtype=self.dtype)
        conv = lambda s: nn.Conv(self.planes, (3, 3), strides=(s, s),
                                 padding=[(1, 1), (1, 1)], use_bias=False,
                                 dtype=self.dtype)
        out = bn()(x)
        out = conv(1)(out)
        out = bn()(out)
        out = PReLU()(out)
        out = conv(self.stride)(out)
        out = bn()(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                         use_bias=False, dtype=self.dtype)(x)
            sc = bn()(sc)
        else:
            sc = x
        return out + sc


class IResNet(nn.Module):
    """iresnet{18,34,50,100,200} family; default is iresnet50 (w600k_r50)."""

    depths: Sequence[int] = (3, 4, 14, 3)
    widths: Sequence[int] = (64, 128, 256, 512)
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 112, 112, 3] already scaled to [-1, 1].
        x = x.astype(self.dtype)
        x = nn.Conv(self.widths[0], (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = PReLU()(x)
        for depth, width in zip(self.depths, self.widths):
            x = IBasicBlock(width, stride=2, dtype=self.dtype)(x, train)
            for _ in range(depth - 1):
                x = IBasicBlock(width, stride=1, dtype=self.dtype)(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)  # [B, 7*7*512]
        x = nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        # Feature BN ("features" layer in iresnet); scale+bias, no stats update
        # asymmetry matters at inference.
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def layer_execution_order(depths: Sequence[int] = (3, 4, 14, 3)) -> list:
    """[(kind, flax-subtree-path)] in torch/ONNX trace order.

    Mirrors iresnet's forward: stem conv-bn-prelu; per block bn1, conv1,
    bn2, prelu, conv2, bn3, then (stride-2 entry blocks) downsample
    conv+bn; tail bn2(features pre-fc), fc, features-bn.  Flax auto-names
    follow declaration order, which matches this trace — but an
    *alphabetical* sort does not (IBasicBlock_10 < IBasicBlock_2), so the
    ONNX converter maps against this list, never against sorted() keys.

    The "dense_flatten" entry marks the NCHW flatten boundary: torch
    flattens [B, 512, 7, 7] channel-major while this model flattens NHWC
    spatial-major, so the Gemm weight rows must be permuted (handled in
    tools/convert_onnx.py).
    """
    order = [("conv", "params/Conv_0"), ("bn", "params/BatchNorm_0"),
             ("prelu", "params/PReLU_0")]
    i = 0
    for depth in depths:
        for j in range(depth):
            base = f"params/IBasicBlock_{i}"
            order += [("bn", f"{base}/BatchNorm_0"), ("conv", f"{base}/Conv_0"),
                      ("bn", f"{base}/BatchNorm_1"), ("prelu", f"{base}/PReLU_0"),
                      ("conv", f"{base}/Conv_1"), ("bn", f"{base}/BatchNorm_2")]
            if j == 0:  # stage-entry block: stride 2 -> downsample shortcut
                order += [("conv", f"{base}/Conv_2"), ("bn", f"{base}/BatchNorm_3")]
            i += 1
    order += [("bn", "params/BatchNorm_1"),
              ("dense_flatten", "params/Dense_0"),
              ("bn", "params/BatchNorm_2")]
    return order


def iresnet50(dtype=jnp.float32) -> IResNet:
    return IResNet(depths=(3, 4, 14, 3), dtype=dtype)


def iresnet18(dtype=jnp.float32) -> IResNet:
    return IResNet(depths=(2, 2, 2, 2), dtype=dtype)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float RGB [B, 112, 112, 3] -> insightface convention [-1, 1]."""
    return (images.astype(jnp.float32) - 127.5) / 127.5
