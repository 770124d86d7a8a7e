"""Model forward shape tests + end-to-end engine pipeline smoke on CPU.

Small det canvas / light archs keep CPU compile time reasonable; the real
arch sizes run on TPU via bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerecognition_infrenceengine_tpu.core.config import EngineConfig
from facerecognition_infrenceengine_tpu.models import arcface, scrfd
from facerecognition_infrenceengine_tpu.engine import FaceEngine, bucket


def small_cfg():
    return EngineConfig(
        det_size=(160, 160), max_faces=4, pre_nms_topk=64, dtype="float32",
    )


@pytest.fixture(scope="module")
def engine():
    return FaceEngine(small_cfg(), det_arch="det_500m", rec_arch="r18", seed=0)


def test_scrfd_output_shapes():
    model = scrfd.SCRFD(scrfd.CONFIGS["det_500m"])
    x = jnp.zeros((2, 160, 160, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    scores, bbox, kps = model.apply(vars_, x)
    a = scrfd.num_anchors_total(160, 160)
    assert scores.shape == (2, a, 1)
    assert bbox.shape == (2, a, 4)
    assert kps.shape == (2, a, 10)


def test_arcface_output_shape_and_determinism():
    model = arcface.iresnet18()
    x = jnp.ones((2, 112, 112, 3)) * 0.5
    vars_ = model.init(jax.random.PRNGKey(1), x)
    e1 = model.apply(vars_, x)
    e2 = model.apply(vars_, x)
    assert e1.shape == (2, 512)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_engine_detect_shapes(engine):
    frames = np.random.default_rng(0).integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    det = engine.detect(frames, det_threshold=0.99)  # random weights: expect ~none
    assert det.boxes.shape == (2, 4, 4)
    assert det.valid.dtype == bool


def test_engine_embed_faces(engine):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    kps = np.tile(np.asarray(
        [[38, 51], [73, 51], [56, 71], [41, 92], [70, 92]], np.float32)[None], (3, 1, 1))
    idx = np.array([0, 0, 1], np.int32)
    emb = engine.embed_faces(frames, idx, kps)
    assert emb.shape == (3, 512)
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # same landmarks on same frame -> identical embedding
    np.testing.assert_allclose(emb[0], emb[1], atol=1e-5)


def test_engine_fused_matches_two_stage(engine):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (1, 160, 160, 3), dtype=np.uint8)
    boxes, scores, kps, valid, emb = engine.detect_align_embed(frames, det_threshold=0.0)
    # with threshold 0 every anchor scores >= 0 so slots fill up
    assert emb.shape == (1, 4, 512)
    # two-stage path on the same kps must agree
    emb2 = engine.embed_faces(frames, np.zeros(4, np.int32), np.asarray(kps[0]))
    np.testing.assert_allclose(np.asarray(emb[0]), emb2, atol=1e-4)


def test_bucket():
    assert bucket(1) == 1
    assert bucket(3) == 4
    assert bucket(129) == 256
    assert bucket(300) == 512


def test_engine_attributes(engine):
    """Gender/age + 106-landmark heads (the rest of the buffalo_l pack)."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    boxes = np.array([[20, 20, 90, 100], [40, 30, 120, 140]], np.float32)
    gender, age, lm = engine.attributes(frames, np.array([0, 1], np.int32), boxes)
    assert gender.shape == (2,) and set(np.unique(gender)) <= {0, 1}
    assert age.shape == (2,)
    assert lm.shape == (2, 106, 2)
    # landmarks map back into the vicinity of their crop windows
    side = (boxes[:, 2] - boxes[:, 0]).max() * 1.5
    centers = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                        (boxes[:, 1] + boxes[:, 3]) / 2], axis=1)
    assert np.all(np.abs(lm - centers[:, None, :]) <= side * 1.01)
    # empty input contract
    g0, a0, l0 = engine.attributes(frames, np.zeros(0, np.int32),
                                   np.zeros((0, 4), np.float32))
    assert g0.shape == (0,) and l0.shape == (0, 106, 2)


def test_face_analysis_full_pack_and_module_trim():
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (160, 160, 3), dtype=np.uint8)

    full = FaceAnalysis(cfg=small_cfg())
    full.prepare(ctx_id=0, det_thresh=0.0)  # synthetic weights: take any box
    faces = full.get(frame)
    assert faces, "expected at least one (synthetic) detection"
    f = faces[0]
    assert f.normed_embedding is not None and f.normed_embedding.shape == (512,)
    assert f.gender in (0, 1) and f.age is not None
    assert f.landmark_2d_106.shape == (106, 2)

    trimmed = FaceAnalysis(cfg=small_cfg(),
                           allowed_modules=("detection", "recognition"))
    trimmed.prepare(ctx_id=0, det_thresh=0.0)
    f2 = trimmed.get(frame)[0]
    assert f2.normed_embedding is not None
    assert f2.gender is None and f2.landmark_2d_106 is None


def test_mobilefacenet_embedder():
    from facerecognition_infrenceengine_tpu.models import mobilefacenet
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init

    m = mobilefacenet.mobilefacenet()
    v = load_or_init("mobilefacenet_test", m, jnp.zeros((1, 112, 112, 3)), 0)
    out = m.apply(v, jnp.zeros((2, 112, 112, 3)))
    assert out.shape == (2, 512)
    assert jnp.isfinite(out).all()
    # param count in the MobileFaceNet class (paper: ~1M); well under r50
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert n_params < 3_000_000


def test_face_analysis_mobile_facenet_pack():
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    app = FaceAnalysis(name="mobile_facenet_v1", cfg=small_cfg(),
                       allowed_modules=("detection", "recognition"))
    app.prepare(ctx_id=0, det_thresh=0.0)
    assert app._engine.rec_arch == "mobilefacenet"
    rng = np.random.default_rng(2)
    faces = app.get(rng.integers(0, 255, (160, 160, 3), dtype=np.uint8))
    assert faces and faces[0].normed_embedding.shape == (512,)
