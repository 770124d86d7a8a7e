"""Shared flax building blocks for the model zoo.

NHWC layout throughout (TPU-native); convs are bias-free + BatchNorm, with
inference-mode running statistics by default.  PReLU is per-channel to match
the ArcFace/SCRFD convention used by the reference's buffalo_l ONNX pack
(reference infrenceServer.py:412-416 instantiates it via insightface).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class PReLU(nn.Module):
    """Per-channel PReLU: y = max(x, 0) + a_c * min(x, 0)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class ConvBN(nn.Module):
    """Conv -> BatchNorm (-> activation)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Callable | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvBNPReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.features, self.kernel, self.stride, dtype=self.dtype)(x, train)
        return PReLU()(x)
