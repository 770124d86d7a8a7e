"""Gender/age attribute head (the buffalo_l ``genderage`` role).

insightface's buffalo_l pack includes a gender+age ONNX model whose outputs
ride on each ``Face`` object (``face.gender``, ``face.age``); the reference
loads the full pack (infrenceServer.py:412-416) though its business logic
only consumes embeddings.  Provided for capability parity: a small conv net
over the aligned 96x96 crop emitting [B, 3] = (gender logits x2, age/100).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNPReLU


class GenderAge(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 96, 96, 3] in [-1, 1]
        x = x.astype(self.dtype)
        for width, stride in ((32, 2), (64, 2), (128, 2), (256, 2)):
            x = ConvBNPReLU(width, 3, stride, dtype=self.dtype)(x, train)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(3, dtype=self.dtype)(x)
        return x.astype(jnp.float32)  # [:, :2] gender logits, [:, 2] age*100


INPUT_SIZE = 96


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    return (images.astype(jnp.float32) - 127.5) / 128.0
