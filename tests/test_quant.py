"""int8 PTQ embedder (models/quant.py): the functional float twin must
match models/arcface.IResNet exactly (structure-drift guard), and the
int8 forward must stay within a small cosine divergence of it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.models import arcface, quant
from facerecognition_infrenceengine_tpu.ops.matching import l2_normalize

DEPTHS18 = (2, 2, 2, 2)


@pytest.fixture(scope="module")
def model_and_vars():
    m = arcface.iresnet18(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))
    return m, v


def _crops(n, seed=1):
    rng = np.random.default_rng(seed)
    u8 = rng.integers(0, 255, (n, 112, 112, 3), dtype=np.uint8)
    return arcface.preprocess(jnp.asarray(u8))


def test_float_twin_matches_flax(model_and_vars):
    m, v = model_and_vars
    x = _crops(3)
    ref = m.apply(v, x)
    got = quant.apply_float(v, x, depths=DEPTHS18, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_int8_close_to_float(model_and_vars):
    m, v = model_and_vars
    calib = _crops(4, seed=2)
    scales = quant.calibrate(v, calib, depths=DEPTHS18, dtype=jnp.float32)
    qw = quant.quantize_weights(v, depths=DEPTHS18)
    assert set(scales) == set(qw)

    x = _crops(6, seed=3)
    ref = l2_normalize(m.apply(v, x))
    got = l2_normalize(quant.apply_int8(v, qw, scales, x, depths=DEPTHS18,
                                        dtype=jnp.float32))
    cos = jnp.sum(ref * got, axis=1)
    assert float(jnp.min(cos)) > 0.98, np.asarray(cos)


@pytest.mark.slow
def test_engine_embed_int8_flag():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    rng = np.random.default_rng(4)
    crops = rng.integers(0, 255, (4, 112, 112, 3), dtype=np.uint8)
    cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                       dtype="float32", embed_int8=True)
    e = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=3)
    assert "int8" in e.rec_variables  # the quantized path is really live
    emb_q = e.embed_crops(crops)
    cfg0 = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                        dtype="float32")
    e0 = FaceEngine(cfg0, det_arch="det_500m", rec_arch="r18", seed=3)
    emb = e0.embed_crops(crops)
    cos = np.sum(emb * emb_q, axis=1) / (
        np.linalg.norm(emb, axis=1) * np.linalg.norm(emb_q, axis=1) + 1e-9)
    assert cos.min() > 0.98, cos
    # and it must actually be the quantized path, not a silent fallback
    assert not np.allclose(emb_q, emb, atol=1e-6)


@pytest.mark.slow
def test_recalibrate_and_clip_fractions(model_and_vars):
    """Structured-default calibration, user recalibration, and the clip-rate
    diagnostic (ADVICE r2: noise-calibrated scales can silently clip)."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine
    from facerecognition_infrenceengine_tpu.engine.pipeline import (
        _calibration_crops)

    cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                       dtype="float32", embed_int8=True)
    e = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=3)
    assert e._int8_calibration == "synthetic-structured"
    s0 = dict(e._embed_scales)

    rng = np.random.default_rng(11)
    crops = rng.integers(0, 255, (4, 112, 112, 3), dtype=np.uint8)
    e.recalibrate_int8(crops)  # "real" crops hook
    assert e._int8_calibration == "user(4 crops)"
    assert e._embed_scales != s0  # scales actually re-derived
    emb = e.embed_crops(crops)  # programs rebuilt and still serve
    assert emb.shape == (4, 512)

    # clip fractions: ~0 on the calibration set itself, >0 when scales
    # are deliberately shrunk (the drift signal the diagnostic exists for)
    x = arcface.preprocess(jnp.asarray(crops))
    fr = quant.clip_fractions(e.rec_variables, e._embed_scales, x,
                              depths=(2, 2, 2, 2), dtype=jnp.float32)
    assert all(0.0 <= v <= 1e-6 for v in fr.values()), fr
    shrunk = {k: v * 0.25 for k, v in e._embed_scales.items()}
    fr2 = quant.clip_fractions(e.rec_variables, shrunk, x,
                               depths=(2, 2, 2, 2), dtype=jnp.float32)
    assert max(fr2.values()) > 0.0

    # default generator is deterministic (scales reproducible across runs)
    np.testing.assert_array_equal(_calibration_crops(2, 112),
                                  _calibration_crops(2, 112))


def test_scrfd_backbone_float_twin_matches_flax():
    from facerecognition_infrenceengine_tpu.models import quant, scrfd

    cfg = scrfd.CONFIGS["det_500m"]
    m = scrfd.SCRFD(cfg, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    x = scrfd.preprocess(jnp.asarray(frames))

    bb = scrfd.ResNetV1e(cfg, dtype=jnp.float32)
    bvars = {"params": v["params"]["backbone"],
             "batch_stats": v["batch_stats"]["backbone"]}
    ref = bb.apply(bvars, x)
    got = quant.scrfd_backbone_forward(v, x, cfg, dtype=jnp.float32)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_engine_det_int8_close_to_float():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine import FaceEngine

    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    dets = []
    for q in (False, True):
        cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                           dtype="float32", det_int8=q)
        e = FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=3)
        assert ("int8" in e.det_variables) == q
        dets.append(e.detect(frames))
    # int8 backbone shifts scores slightly; with synthetic weights the
    # sigmoid saturates, so valid masks and box geometry stay close.
    np.testing.assert_array_equal(dets[1].valid, dets[0].valid)
    np.testing.assert_allclose(dets[1].scores, dets[0].scores, atol=5e-2)
