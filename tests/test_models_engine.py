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


@pytest.mark.slow
def test_scrfd_output_shapes():
    model = scrfd.SCRFD(scrfd.CONFIGS["det_500m"])
    x = jnp.zeros((2, 160, 160, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    scores, bbox, kps = model.apply(vars_, x)
    a = scrfd.num_anchors_total(160, 160)
    assert scores.shape == (2, a, 1)
    assert bbox.shape == (2, a, 4)
    assert kps.shape == (2, a, 10)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_face_analysis_mobile_facenet_pack():
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    app = FaceAnalysis(name="mobile_facenet_v1", cfg=small_cfg(),
                       allowed_modules=("detection", "recognition"))
    app.prepare(ctx_id=0, det_thresh=0.0)
    assert app._engine.rec_arch == "mobilefacenet"
    rng = np.random.default_rng(2)
    faces = app.get(rng.integers(0, 255, (160, 160, 3), dtype=np.uint8))
    assert faces and faces[0].normed_embedding.shape == (512,)


@pytest.mark.slow
def test_engine_fused_packed_matches_raw(engine):
    """The packed-input fused program (production contract: native letterbox
    emits s2d4) computes the same detections + embeddings as the raw path."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    raw = engine.detect_align_embed(frames, det_threshold=0.0)
    packed = engine.pack_frames(frames)
    assert packed.shape == (2, 40, 40, 48)
    # pack_frames really is s2d4 (phase-major channel order)
    np.testing.assert_array_equal(packed[0, 0, 0, :3], frames[0, 0, 0])
    np.testing.assert_array_equal(packed[0, 0, 0, 15 * 3:16 * 3],
                                  frames[0, 3, 3])
    got = engine.detect_align_embed_packed(packed, det_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(raw[3]), np.asarray(got[3]))
    for a, b, tol in ((raw[0], got[0], 1e-2), (raw[1], got[1], 1e-4),
                      (raw[2], got[2], 1e-2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol)
    e1 = np.asarray(raw[4]).reshape(-1, 512)
    e2 = np.asarray(got[4]).reshape(-1, 512)
    cos = (e1 * e2).sum(1)
    assert cos.min() > 0.999, cos


@pytest.mark.slow
def test_engine_attributes_use_exact_onnx_graphs(tmp_path, monkeypatch):
    """When converted attribute graphs (attr_genderage.onnx /
    attr_2d106det.onnx, tools/convert_onnx.py) are in the weights dir, the
    engine executes THEM (models/onnx_exec.py) instead of the synthetic
    capability-parity heads — the exact-graph path for buffalo_l's
    gender/age/landmark_2d_106 surface (reference infrenceServer.py:412-416).
    """
    torch = pytest.importorskip("torch")
    from torch import nn

    from test_onnx_exec import export_onnx

    torch.manual_seed(0)
    ga = nn.Sequential(nn.Conv2d(3, 4, 7, 4, 3), nn.PReLU(4),
                       nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(4, 3))
    lm = nn.Sequential(nn.Conv2d(3, 4, 7, 4, 3), nn.PReLU(4),
                       nn.AdaptiveAvgPool2d(1), nn.Flatten(),
                       nn.Linear(4, 212))
    (tmp_path / "attr_genderage.onnx").write_bytes(
        export_onnx(ga, torch.zeros(1, 3, 96, 96)))
    (tmp_path / "attr_2d106det.onnx").write_bytes(
        export_onnx(lm, torch.zeros(1, 3, 192, 192)))
    monkeypatch.setenv("FRE_WEIGHTS_DIR", str(tmp_path))

    eng = FaceEngine(small_cfg(), det_arch="det_500m", rec_arch="r18", seed=0)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (1, 160, 160, 3), dtype=np.uint8)
    boxes = np.asarray([[20, 20, 90, 100], [40, 10, 120, 110]], np.float32)
    gender, age, lms = eng.attributes(frames, np.zeros(2, np.int32), boxes)
    assert eng._attr_runners is not None, "exact graphs were not picked up"
    assert eng._attr_sizes == (96, 192)
    assert gender.shape == (2,) and age.shape == (2,)
    assert lms.shape == (2, 106, 2)
    # decode semantics: gender = argmax of the first two outputs; verify
    # against running the torch graph on the engine's own crop
    from facerecognition_infrenceengine_tpu.ops.warp2pass import (
        warp_boxes_two_pass)

    crops = np.asarray(warp_boxes_two_pass(
        jnp.asarray(frames), jnp.zeros(2, jnp.int32), jnp.asarray(boxes),
        96, scale_factor=1.5))
    with torch.no_grad():
        ref = ga(torch.from_numpy(np.transpose(crops, (0, 3, 1, 2)))).numpy()
    np.testing.assert_array_equal(gender, np.argmax(ref[:, :2], axis=1))
    np.testing.assert_allclose(age, np.round(ref[:, 2] * 100.0), atol=1.0)


@pytest.mark.slow
def test_engine_fused_yuv420_close_to_rgb(engine):
    """The yuv420 wire format (half the bytes) feeds the same fused program
    through ops/yuv.py's constant-matmul unpack; on smooth imagery the
    results match the rgb path to chroma-subsampling tolerance."""
    from facerecognition_infrenceengine_tpu import native

    yy, xx = np.mgrid[0:160, 0:160].astype(np.float32)
    img = np.clip(np.stack([120 + 70 * np.sin(yy / 23),
                            110 + 60 * np.cos(xx / 19),
                            100 + 50 * np.sin((xx + yy) / 31)], -1),
                  0, 255).astype(np.uint8)
    frames = img[None]
    raw = engine.detect_align_embed(frames, det_threshold=0.0)
    packed = np.stack([native.pack_yuv420_s2d4(f) for f in frames])
    got = engine.detect_align_embed_yuv420(packed, det_threshold=0.0)
    np.testing.assert_array_equal(np.asarray(raw[3]), np.asarray(got[3]))
    np.testing.assert_allclose(np.asarray(raw[1]), np.asarray(got[1]),
                               atol=0.02)  # det scores
    e1 = np.asarray(raw[4]).reshape(-1, 512)
    e2 = np.asarray(got[4]).reshape(-1, 512)
    cos = (e1 * e2).sum(1)
    assert cos.min() > 0.98, cos


@pytest.mark.slow
def test_face_analysis_yuv_transport_matches_rgb():
    """FaceAnalysis with stream_transport=yuv420 takes the packed fast path
    (encode_frame on the capture side) and finds the same faces."""
    import dataclasses

    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    cfg = dataclasses.replace(small_cfg(), stream_transport="yuv420")
    app = FaceAnalysis(cfg=cfg, allowed_modules=("detection", "recognition"))
    app.prepare(ctx_id=0, det_thresh=0.0)
    rng = np.random.default_rng(31)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    frame_bgr = np.clip(np.stack([120 + 70 * np.sin(yy / 23),
                                  110 + 60 * np.cos(xx / 19),
                                  100 + 50 * np.sin((xx + yy) / 31)], -1),
                        0, 255).astype(np.uint8)
    engine = app._ensure_engine()
    assert app._yuv_eligible(engine, [frame_bgr])
    enc = app.encode_frame(frame_bgr)
    # content rows only: 120-row frame -> 30 packed rows of the 40-row
    # canvas ride the wire; the engine re-pads with YUV black on device
    assert enc.shape == (30, 40, 24)
    faces_yuv = app.get_batch([enc])
    # rgb reference
    cfg_rgb = small_cfg()
    app_rgb = FaceAnalysis(cfg=cfg_rgb,
                           allowed_modules=("detection", "recognition"))
    app_rgb.prepare(ctx_id=0, det_thresh=0.0)
    faces_rgb = app_rgb.get_batch([frame_bgr])
    assert len(faces_yuv[0]) == len(faces_rgb[0])
    for fy, fr in zip(faces_yuv[0], faces_rgb[0]):
        cos = float((fy.normed_embedding * fr.normed_embedding).sum())
        assert cos > 0.98, cos


def test_engine_flat_output_matches_tuple(engine):
    """The single packed [B, F, 528] serving output (one device->host
    transfer — measured 3x faster resolve on the tunneled TPU) decodes to
    exactly the 5-tuple outputs."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 160, 160, 3), dtype=np.uint8)
    boxes, scores, kps, valid, emb = (
        np.asarray(o) for o in engine.detect_align_embed(frames, det_threshold=0.0))
    flat = np.asarray(engine.detect_align_embed_flat(frames, det_threshold=0.0))
    b, f = valid.shape
    assert flat.shape == (b, f, 4 + 1 + 10 + 1 + 512)
    np.testing.assert_allclose(flat[..., :4], boxes, atol=1e-5)
    np.testing.assert_allclose(flat[..., 4], scores, atol=1e-6)
    np.testing.assert_allclose(flat[..., 5:15], kps.reshape(b, f, 10), atol=1e-5)
    np.testing.assert_array_equal(flat[..., 15] > 0.5, valid)
    np.testing.assert_allclose(flat[..., 16:], emb, atol=1e-6)
    # the zoo decoder reconstructs the same Face lists
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    faces_a = FaceAnalysis._faces_from_fused((boxes, scores, kps, valid, emb), b, 0)
    faces_b = FaceAnalysis._faces_from_fused_flat(flat, b, 0)
    assert [len(x) for x in faces_a] == [len(x) for x in faces_b]
    for fa, fb in zip(faces_a, faces_b):
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(x.bbox, y.bbox, atol=1e-5)
            np.testing.assert_allclose(x.normed_embedding, y.normed_embedding,
                                       atol=1e-6)
