"""MobileFaceNet embedder (the config's ``mobile_facenet_v1`` role).

The reference names ``mobile_facenet_v1`` in ALLOWED_MODELS (reference
app/config/config.py:24) and queues enrollment jobs for it on every
registration, but never ships or serves the model — those jobs sit queued
forever (SURVEY.md §2.12).  This provides the architecture so a worker
configured with ``model_name="mobile_facenet_v1"`` actually drains them:
the standard MobileFaceNet — depthwise-separable bottlenecks with PReLU,
a global depthwise conv instead of pooling, and a 512-d linear embedding
(Chen et al., "MobileFaceNets", arXiv:1804.07573 — architecture from the
paper, implemented fresh in flax NHWC).

Preprocessing matches ArcFace: RGB, (x - 127.5) / 127.5 on 112x112 crops.
Callers L2-normalize the output.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import PReLU


class ConvBlock(nn.Module):
    """Conv -> BN -> PReLU (optionally depthwise, optionally linear)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    linear: bool = False  # no activation (the paper's "linear" blocks)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        if not self.linear:
            x = PReLU()(x)
        return x


class Bottleneck(nn.Module):
    """Inverted residual: expand 1x1 -> depthwise 3x3 -> project 1x1."""

    features: int
    expansion: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inner = x.shape[-1] * self.expansion
        out = ConvBlock(inner, kernel=1, dtype=self.dtype)(x, train)
        out = ConvBlock(inner, kernel=3, stride=self.stride, groups=inner,
                        dtype=self.dtype)(out, train)
        out = ConvBlock(self.features, kernel=1, linear=True,
                        dtype=self.dtype)(out, train)
        if self.stride == 1 and x.shape[-1] == self.features:
            out = out + x
        return out


class MobileFaceNet(nn.Module):
    """112x112x3 -> embed_dim embedding (paper table 1 layout)."""

    embed_dim: int = 512
    # (expansion, features, repeats, stride) per stage
    stages: Sequence = ((2, 64, 5, 2), (4, 128, 1, 2), (2, 128, 6, 1),
                        (4, 128, 1, 2), (2, 128, 2, 1))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = ConvBlock(64, kernel=3, stride=2, dtype=self.dtype)(x, train)  # 56
        x = ConvBlock(64, kernel=3, groups=64, dtype=self.dtype)(x, train)
        for expansion, features, repeats, stride in self.stages:
            x = Bottleneck(features, expansion, stride, dtype=self.dtype)(x, train)
            for _ in range(repeats - 1):
                x = Bottleneck(features, expansion, 1, dtype=self.dtype)(x, train)
        x = ConvBlock(512, kernel=1, dtype=self.dtype)(x, train)
        # global depthwise conv (7x7 at 112 input) instead of avg-pool
        gd = x.shape[1]
        x = ConvBlock(512, kernel=gd, groups=512, linear=True,
                      dtype=self.dtype)(x, train)
        x = x[:, gd // 2, gd // 2, :] if x.shape[1] > 1 else x[:, 0, 0, :]
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


def layer_execution_order(stages=MobileFaceNet.stages) -> list:
    """[(kind, flax-subtree-path)] in trace order for the ONNX converter.

    Each ConvBlock traces Conv -> BN (-> PReLU); bottlenecks trace their
    three ConvBlocks in sequence.  Used by tools/convert_onnx.py to map a
    MobileFaceNet recognizer export (insightface's w600k_mbf.onnx layout)
    onto this tree — shape-checked at every step, aborting on any
    architecture divergence rather than writing a wrong pack.
    """
    def convblock(path: str, linear: bool = False) -> list:
        out = [("conv", f"{path}/Conv_0"), ("bn", f"{path}/BatchNorm_0")]
        if not linear:
            out.append(("prelu", f"{path}/PReLU_0"))
        return out

    order = convblock("params/ConvBlock_0") + convblock("params/ConvBlock_1")
    n = 0
    for _expansion, _features, repeats, _stride in stages:
        for _ in range(repeats):
            base = f"params/Bottleneck_{n}"
            order += convblock(f"{base}/ConvBlock_0")
            order += convblock(f"{base}/ConvBlock_1")
            order += convblock(f"{base}/ConvBlock_2", linear=True)
            n += 1
    order += convblock("params/ConvBlock_2")
    order += convblock("params/ConvBlock_3", linear=True)
    order += [("dense", "params/Dense_0"), ("bn", "params/BatchNorm_0")]
    return order


def mobilefacenet(dtype=jnp.float32) -> MobileFaceNet:
    return MobileFaceNet(dtype=dtype)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    return (images.astype(jnp.float32) - 127.5) / 127.5
