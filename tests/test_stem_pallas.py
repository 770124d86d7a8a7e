"""The fused Pallas stem (ops/stem_pallas.py) must match the flax stem
(models/scrfd.ResNetV1e stem1/2/3 + max-pool) — it evaluates the same
weights in packed layout with BN folded, so outputs agree to f32
summation order.  Runs the Pallas interpreter on CPU."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.models import scrfd
from facerecognition_infrenceengine_tpu.ops import stem_pallas

from test_packed_stem import _rand_variables


class _StemOnly(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x):
        from facerecognition_infrenceengine_tpu.models.scrfd import ConvBN

        x = ConvBN(self.width, 3, 2, act=nn.relu, name="stem1")(x, False)
        x = ConvBN(self.width, 3, 1, act=nn.relu, name="stem2")(x, False)
        x = ConvBN(2 * self.width, 3, 1, act=nn.relu, name="stem3")(x, False)
        return nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])


def _stem_variables(model_vars):
    return {
        "params": {"backbone": model_vars["params"]["backbone"]},
        "batch_stats": {"backbone": model_vars["batch_stats"]["backbone"]},
    }


@pytest.mark.parametrize("hw", [(64, 64), (128, 64)])
def test_fused_stem_matches_flax(hw):
    h, w = hw
    cfg = scrfd.CONFIGS["det_10g"]
    model = scrfd.SCRFD(cfg)
    variables = _rand_variables(model, (1, 64, 64, 3))
    stem = _StemOnly(cfg.stem_width)
    stem_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)
    x = scrfd.preprocess(jnp.asarray(frames))
    ref = stem.apply(stem_vars, x)

    packed = stem_pallas.precompute_fused_stem(variables, jnp.float32)
    x4 = stem_pallas.prepare_input(jnp.asarray(frames), dtype=jnp.float32)
    got = stem_pallas.fused_stem(x4, packed, w // 4, cfg.stem_width, interpret=True)

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_multi_tile_boundaries():
    """H4 > tile exercises inter-tile halos and first/last-tile masking
    (uses a size whose H/4 is a multiple of 16 so tile=16 < H4)."""
    cfg = scrfd.CONFIGS["det_10g"]
    model = scrfd.SCRFD(cfg)
    variables = _rand_variables(model, (1, 64, 64, 3))
    stem = _StemOnly(cfg.stem_width)
    stem_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (1, 128, 128, 3), dtype=np.uint8)
    x = scrfd.preprocess(jnp.asarray(frames))
    ref = stem.apply(stem_vars, x)

    packed = stem_pallas.precompute_fused_stem(variables, jnp.float32)
    x4 = stem_pallas.prepare_input(jnp.asarray(frames), dtype=jnp.float32)
    assert (x4.shape[1] - 8) // 16 >= 2  # really multi-tile
    got = stem_pallas.fused_stem(x4, packed, 32, cfg.stem_width, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_u8_input_matches_flax():
    """The u8 x4 path (cast/affine/padding-fix inside the kernel) must
    match the bf16-prepared path and the flax stem."""
    cfg = scrfd.CONFIGS["det_10g"]
    model = scrfd.SCRFD(cfg)
    variables = _rand_variables(model, (1, 64, 64, 3))
    stem = _StemOnly(cfg.stem_width)
    stem_vars = {
        "params": variables["params"]["backbone"],
        "batch_stats": variables["batch_stats"]["backbone"],
    }
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 128, 64, 3), dtype=np.uint8)
    ref = stem.apply(stem_vars, scrfd.preprocess(jnp.asarray(frames)))

    packed = stem_pallas.precompute_fused_stem(variables, jnp.float32)
    x4 = stem_pallas.prepare_input(jnp.asarray(frames), dtype=jnp.uint8)
    assert x4.dtype == jnp.uint8
    got = stem_pallas.fused_stem(x4, packed, 16, cfg.stem_width,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # pad_packed_u8 on pre-packed frames is the same thing
    x48 = stem_pallas.space_to_depth4(jnp.asarray(frames))
    x4b = stem_pallas.pad_packed_u8(x48)
    np.testing.assert_array_equal(np.asarray(x4b), np.asarray(x4))
