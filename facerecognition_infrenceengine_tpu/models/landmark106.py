"""106-point 2D landmark head (the buffalo_l ``2d106det`` role).

Part of the buffalo_l pack the reference loads (infrenceServer.py:412-416);
its outputs appear as ``face.landmark_2d_106``.  Capability-parity model: a
light conv regressor over a 192x192 aligned crop emitting 106 (x, y) pairs
in crop coordinates normalized to [-1, 1] (insightface convention).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNPReLU


class Landmark106(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 192, 192, 3] in [-1, 1]
        x = x.astype(self.dtype)
        for width, stride in ((24, 2), (48, 2), (96, 2), (144, 2), (192, 2)):
            x = ConvBNPReLU(width, 3, stride, dtype=self.dtype)(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(212, dtype=self.dtype)(x)
        return x.astype(jnp.float32).reshape(x.shape[0], 106, 2)


INPUT_SIZE = 192
