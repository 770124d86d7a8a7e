"""Drop-in rehearsal: pack on disk -> convert -> load -> serve (VERDICT r3
task 5).

The real buffalo_l pack and onnxruntime are absent from this image, so
weight parity against the reference cannot be executed here — but the
*drop-in path itself* can be proven end-to-end ahead of time:
tools/synthetic_pack.py builds a buffalo_l-shaped ONNX pack (torch mirrors
of the exact det_10g / w600k_r50 / w600k_mbf architectures with random
weights + randomized BN stats, plus tiny attribute heads with the real
output contracts), tools/convert_onnx.py converts it, and the flax
forwards — loaded through the same ``models/weights.load_or_init`` call
the serving engine uses (reference load path: infrenceServer.py:412-416)
— must match the torch oracles.  The day a real pack lands, the only new
variable is the weights themselves.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tools import convert_onnx, synthetic_pack  # noqa: E402


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    """Synthetic pack written + converted ONCE for the module."""
    pack_dir = str(tmp_path_factory.mktemp("fake_buffalo_l"))
    wdir = str(tmp_path_factory.mktemp("converted_weights"))
    models = synthetic_pack.make_pack(pack_dir, seed=0)
    convert_onnx.convert(pack_dir, wdir)
    return models, wdir


@pytest.fixture
def weights_env(pack, monkeypatch):
    models, wdir = pack
    monkeypatch.setenv("FRE_WEIGHTS_DIR", wdir)
    return models, wdir


def _torch_eval(model, x_nhwc: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(torch.from_numpy(
            np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))))
    if isinstance(out, tuple):
        return tuple(o.numpy() for o in out)
    return out.numpy()


def test_converted_pack_files(pack):
    _, wdir = pack
    names = sorted(os.listdir(wdir))
    assert names == ["arcface_mobilefacenet.npz", "arcface_r50.npz",
                     "attr_1k3d68.onnx", "attr_2d106det.onnx",
                     "attr_genderage.onnx", "scrfd_det_10g.npz"]


@pytest.mark.parametrize("trans_b", [0, 1])
def test_gemm_weight_layout_follows_transb(trans_b):
    """Gemm(transB=1) (torch Linear) carries [out,in] and must transpose;
    Gemm(transB=0) carries [in,out] and must NOT — square weights make the
    two indistinguishable by shape, so the converter reads the attribute."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 4)).astype(np.float32)  # square: shape can't tell
    b = rng.normal(size=(4,)).astype(np.float32)
    flat = {"params/fc/kernel": np.zeros((4, 4), np.float32),
            "params/fc/bias": np.zeros((4,), np.float32)}
    nodes = [("Gemm", ["x", "w", "b"], ["y"], {"transB": trans_b})]
    out = convert_onnx.assign_by_execution_order(
        flat, [("dense", "params/fc")], nodes, {"w": w, "b": b})
    expected = w.T if trans_b else w
    np.testing.assert_array_equal(out["params/fc/kernel"], expected)
    np.testing.assert_array_equal(out["params/fc/bias"], b)


def test_r50_parity_vs_torch(weights_env):
    """Converted w600k_r50 weights loaded through load_or_init drive the
    flax IResNet-50 to the torch mirror's outputs (the BASELINE.md <=1e-3
    cosine budget; CPU f32 lands orders of magnitude tighter)."""
    from facerecognition_infrenceengine_tpu.models import arcface
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init

    models, _ = weights_env
    module = arcface.iresnet50()
    variables = load_or_init("arcface_r50", module,
                             jnp.zeros((1, 112, 112, 3), jnp.float32))
    x = np.random.default_rng(0).uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    ref = _torch_eval(models["w600k_r50.onnx"], x)
    assert got.shape == ref.shape == (2, 512)
    # compare what serving compares: L2-normalized embeddings (raw-output
    # atol is too loose — it let a 5% BN-stat drift through)
    gn = got / np.linalg.norm(got, axis=1, keepdims=True)
    rn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    assert cosine(gn[0], rn[0]) > 1 - 1e-5
    np.testing.assert_allclose(gn, rn, atol=1e-4)


def test_mobilefacenet_parity_vs_torch(weights_env):
    from facerecognition_infrenceengine_tpu.models import mobilefacenet
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init

    models, _ = weights_env
    module = mobilefacenet.mobilefacenet()
    variables = load_or_init("arcface_mobilefacenet", module,
                             jnp.zeros((1, 112, 112, 3), jnp.float32))
    x = np.random.default_rng(1).uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    ref = _torch_eval(models["w600k_mbf.onnx"], x)
    assert got.shape == ref.shape == (2, 512)
    gn = got / np.linalg.norm(got, axis=1, keepdims=True)
    rn = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    assert cosine(gn, rn) > 1 - 1e-5
    np.testing.assert_allclose(gn, rn, atol=1e-4)


def test_det10g_parity_vs_torch(weights_env):
    """Converted det_10g weights: flax SCRFD (scores, bbox, kps) match the
    torch mirror on a 128x128 canvas (the graph is fully convolutional, so
    canvas size is free; 640 is just slower on CPU)."""
    from facerecognition_infrenceengine_tpu.models import scrfd
    from facerecognition_infrenceengine_tpu.models.weights import load_or_init

    models, _ = weights_env
    module = scrfd.SCRFD(scrfd.CONFIGS["det_10g"])
    variables = load_or_init("scrfd_det_10g", module,
                             jnp.zeros((1, 128, 128, 3), jnp.float32))
    x = np.random.default_rng(2).uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    got = module.apply(variables, jnp.asarray(x))
    ref = _torch_eval(models["det_10g.onnx"], x)
    for g, r, name in zip(got, ref, ("scores", "bbox", "kps")):
        g = np.asarray(g)
        assert g.shape == r.shape, name
        assert cosine(g, r) > 1 - 1e-5, name
        np.testing.assert_allclose(g, r, atol=1e-3, rtol=1e-3, err_msg=name)


def test_engine_serves_converted_pack(weights_env):
    """FaceEngine picks the converted pack up from FRE_WEIGHTS_DIR (not the
    synthetic init) and its production embed path (uint8 crops ->
    preprocess -> IResNet -> l2 normalize) matches the torch oracle."""
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine
    from facerecognition_infrenceengine_tpu.models.weights import load_variables

    models, wdir = weights_env
    cfg = EngineConfig(det_size=(128, 128), max_faces=4, pre_nms_topk=64,
                       dtype="float32")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    # the loaded tree IS the converted pack, leaf-for-leaf
    pack_vars = load_variables(os.path.join(wdir, "arcface_r50.npz"))
    np.testing.assert_array_equal(
        np.asarray(engine.rec_variables["params"]["Dense_0"]["kernel"]),
        np.asarray(pack_vars["params"]["Dense_0"]["kernel"]))
    crops = np.random.default_rng(3).integers(
        0, 255, (2, 112, 112, 3), dtype=np.uint8)
    got = engine.embed_crops(jnp.asarray(crops))
    x = (crops.astype(np.float32) - 127.5) / 127.5
    ref = _torch_eval(models["w600k_r50.onnx"], x)
    ref = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    assert cosine(got[0], ref[0]) > 1 - 1e-5


@pytest.mark.slow
def test_full_serve_through_face_analysis(weights_env):
    """The whole drop-in: FaceAnalysis.get on a real frame with the
    converted pack — detect (converted det_10g) -> align -> embed
    (converted r50) -> attribute heads running the pack's exact graphs
    (models/onnx_exec.py).  Proves the serving facade needs no code changes
    when a real pack lands (reference infrenceServer.py:412-416)."""
    import dataclasses

    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.pipeline import FaceEngine
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    models, _ = weights_env
    cfg = EngineConfig(det_size=(128, 128), max_faces=4, pre_nms_topk=64,
                       dtype="float32")
    engine = FaceEngine(cfg, det_arch="det_10g", rec_arch="r50", seed=0)
    app = FaceAnalysis(cfg=cfg, engine=engine)
    app.prepare(ctx_id=0, det_thresh=0.05)  # random weights: low threshold
    frame = np.random.default_rng(4).integers(
        0, 255, (128, 128, 3), dtype=np.uint8)
    faces = app.get(frame)
    # random det weights may or may not cross even a low threshold; the
    # contract here is the pipeline RUNS the converted pack end-to-end
    for face in faces:
        assert face.normed_embedding.shape == (512,)
        assert abs(float(np.linalg.norm(face.normed_embedding)) - 1) < 1e-3
        assert face.gender in (0, 1) and face.age >= 0
