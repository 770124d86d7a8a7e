"""The space-to-depth stem (models/packed_stem.py) must be numerically
equivalent to the ordinary stem — it is a pure re-indexing of the same
weights.  Opt-in via EngineConfig.packed_stem (measured slower in situ
than XLA's own stem lowering on v5e; kept as a documented experiment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.models import packed_stem, scrfd


def _rand_variables(model, shape, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros(shape))
    key = [jax.random.PRNGKey(seed + 1)]

    def rnd(path, a):
        key[0], k = jax.random.split(key[0])
        v = jax.random.normal(k, a.shape, jnp.float32)
        if a.ndim == 4:  # conv kernels: fan-in scaled so activations stay O(1)
            fan_in = a.shape[0] * a.shape[1] * a.shape[2]
            v = v / np.sqrt(fan_in)
        elif "var" in str(path):
            v = jnp.abs(v) * 0.2 + 0.5
        elif a.ndim == 1:  # scales/biases/means around 1/0
            v = v * 0.2 + (1.0 if "scale" in str(path) else 0.0)
        return v.astype(a.dtype)

    return jax.tree_util.tree_map_with_path(rnd, variables)


def test_pack_kernel_matches_direct_conv():
    """conv(x, W) == depth_to_space(conv(s2d(x), pack(W))) for both strides."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 5)).astype(np.float32))
    for stride in (1, 2):
        w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wp = packed_stem.pack_kernel(w, stride)
        out_p = jax.lax.conv_general_dilated(
            packed_stem.space_to_depth(x), wp, (stride, stride),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # unpack: channel = (oi*2+oj)*Co + co
        b, hp, wp_, _ = out_p.shape
        got = out_p.reshape(b, hp, wp_, 2, 2, 7).transpose(0, 1, 3, 2, 4, 5)
        got = got.reshape(b, hp * 2, wp_ * 2, 7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_packed_maxpool_matches_flax():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 24, 24, 6)).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    got = packed_stem._packed_maxpool_3x3s2(packed_stem.space_to_depth(x), 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


@pytest.mark.parametrize("arch", ["det_10g", "det_500m"])
@pytest.mark.slow
def test_full_detector_forward_equivalent(arch):
    """SCRFD(x) == SCRFD(x, stem_out=packed_stem(x)) with random weights."""
    cfg = scrfd.CONFIGS[arch]
    model = scrfd.SCRFD(cfg)
    shape = (2, 64, 64, 3)
    variables = _rand_variables(model, shape)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    ref = model.apply(variables, x)
    packed = packed_stem.precompute_packed_stem(variables)
    stem_out = packed_stem.packed_stem_forward(x, packed, cfg.stem_width)
    got = model.apply(variables, x, stem_out=stem_out)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_s2d4_stem_matches_flax_stem():
    """packed_stem_forward_s2d4 (the opt-in packed_stem_impl="xla" stem)
    == the detector's own stem on the same u8 frames."""
    from facerecognition_infrenceengine_tpu.ops.stem_pallas import (
        space_to_depth4)

    cfg = scrfd.CONFIGS["det_10g"]
    model = scrfd.SCRFD(cfg)
    shape = (2, 64, 64, 3)
    variables = _rand_variables(model, shape)
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, shape, dtype=np.uint8)

    ref = model.apply(variables, scrfd.preprocess(jnp.asarray(frames)))
    packed = packed_stem.precompute_packed_stem_s2d4(variables)
    x48 = jnp.asarray(space_to_depth4(jnp.asarray(frames)))
    stem_out = packed_stem.packed_stem_forward_s2d4(x48, packed,
                                                    cfg.stem_width)
    got = model.apply(variables, jnp.zeros((2, 1, 1, 3), jnp.float32),
                      stem_out=stem_out)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_engine_packed_default_unpack_is_exact():
    """The DEFAULT packed-input strategy ("unpack": on-device depth-to-space
    into the raw fused program) is bit-exact vs detect_align_embed on the
    same pixels — the quick-tier pin for the production wire format."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                       dtype="float32")
    assert cfg.packed_stem_impl == "unpack"
    engine = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=5)
    assert engine._has_packed_stem()
    ref = engine.detect_align_embed(frames)
    got = engine.detect_align_embed_packed(
        jnp.asarray(FaceEngine.pack_frames(frames)))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.slow
def test_engine_packed_paths_match_raw_across_stem_impls():
    """detect_align_embed_packed agrees with the raw fused program under
    all three packed_stem_impl values ("unpack" default: exact;
    "xla"/"pallas": numeric)."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    ref = None
    for impl in ("unpack", "xla", "pallas"):
        cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                           dtype="float32", packed_stem_impl=impl)
        engine = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=5)
        assert engine._has_packed_stem()
        assert ("packed_stem_s2d4" in engine.det_variables) == (impl == "xla")
        packed = jnp.asarray(FaceEngine.pack_frames(frames))
        got = engine.detect_align_embed_packed(packed)
        if ref is None:
            ref = engine.detect_align_embed(frames)
        if impl == "unpack":
            # Same pixels through the same raw program: exact.
            for r, g in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
            continue
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(r, np.float32),
                                       rtol=1e-3, atol=2e-3)


def test_engine_packed_stem_opt_in_matches_default():
    """A FaceEngine built with packed_stem=True detects identically to the
    default engine (same weights via the same seed)."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    dets = []
    for packed in (False, True):
        cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                           dtype="float32", packed_stem=packed)
        engine = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=3)
        assert ("packed_stem" in engine.det_variables) == packed
        dets.append(engine.detect(frames))
    np.testing.assert_allclose(dets[1].scores, dets[0].scores,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dets[1].boxes, dets[0].boxes,
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_array_equal(dets[1].valid, dets[0].valid)
