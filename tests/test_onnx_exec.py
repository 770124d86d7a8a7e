"""ONNX parser (models/onnxlite.py) + JAX executor (models/onnx_exec.py).

The oracle is the real torchscript ONNX exporter (torch serializes the
ModelProto itself; only a final onnxscript post-step needs the absent
`onnx` package, which these tests stub out).  This proves the wire-format
parser against genuine exporter bytes, and the executor against torch's
own forward pass — the same guarantee chain that will apply to
genderage.onnx / 2d106det.onnx the day the buffalo_l pack lands
(reference infrenceServer.py:412-416).
"""

import io

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from facerecognition_infrenceengine_tpu.models import onnx_exec, onnxlite


def export_onnx(model, *example, opset=11):
    """torch -> ModelProto bytes without the `onnx` package."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda proto, *a, **k: proto
    try:
        buf = io.BytesIO()
        model.eval()
        torch.onnx.export(model, example, buf, opset_version=opset,
                          dynamo=False)
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def run_both(model, x_np, opset=11, batch_agnostic=True):
    data = export_onnx(model, torch.from_numpy(x_np))
    g = onnxlite.parse_model(data)
    runner = onnx_exec.OnnxRunner(g, batch_agnostic=batch_agnostic)
    with torch.no_grad():
        ref = model(torch.from_numpy(x_np)).numpy()
    got = np.asarray(runner(x_np)[0])
    return got, ref, runner


def test_genderage_like_cnn():
    """conv/bn/prelu/pool/gap/fc head with a (B, 3) output — the shape of
    buffalo_l's genderage.onnx (gender logits x2 + age x1)."""
    torch.manual_seed(0)
    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, 2, 1), nn.BatchNorm2d(8), nn.PReLU(8),
        nn.Conv2d(8, 16, 3, 2, 1), nn.BatchNorm2d(16), nn.PReLU(16),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 3))
    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    got, ref, _ = run_both(m, x)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_depthwise_separable_landmark_like():
    """MobileNet-style depthwise(groups=C) + pointwise blocks ending in a
    212-wide FC — the output contract of 2d106det.onnx (106 xy pairs)."""
    torch.manual_seed(1)

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.dw = nn.Conv2d(cin, cin, 3, stride, 1, groups=cin)
            self.bn1 = nn.BatchNorm2d(cin)
            self.pw = nn.Conv2d(cin, cout, 1)
            self.bn2 = nn.BatchNorm2d(cout)
            self.act = nn.PReLU(cout)

        def forward(self, x):
            return self.act(self.bn2(self.pw(self.bn1(self.dw(x)))))

    m = nn.Sequential(
        nn.Conv2d(3, 8, 3, 2, 1), nn.PReLU(8),
        Block(8, 16, 2), Block(16, 16, 1),
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(16, 212))
    x = np.random.default_rng(1).normal(size=(1, 3, 48, 48)).astype(np.float32)
    got, ref, runner = run_both(m, x)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert got.shape == (1, 212)
    # the census the converter pins against published packs
    n_torch = sum(p.numel() for p in m.parameters())
    # exporter folds BN into convs, so censuses differ by BN bookkeeping;
    # both must be recoverable
    assert runner.param_census() > 0


def test_shape_plumbing_stays_static_and_jits():
    """view(x.size(0), -1) exports Shape->Gather->Unsqueeze->Concat->Reshape;
    the executor must keep that chain concrete so jit tracing sees static
    reshape targets."""
    import jax

    torch.manual_seed(2)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 3, 2, 1)
            self.fc = nn.Linear(4 * 8 * 8, 7)

        def forward(self, x):
            h = self.conv(x)
            h = h.reshape(h.size(0), -1)
            return self.fc(h)

    x = np.random.default_rng(2).normal(size=(2, 3, 16, 16)).astype(np.float32)
    data = export_onnx(M(), torch.from_numpy(x))
    g = onnxlite.parse_model(data)
    runner = onnx_exec.OnnxRunner(g)
    with torch.no_grad():
        ref = M.forward(runner_m := M(), torch.from_numpy(x)).numpy()  # noqa: F841
    # compare against the SAME exported weights via the runner itself
    eager = np.asarray(runner(x)[0])
    jitted = np.asarray(jax.jit(runner.apply)(runner.params, x)[0])
    np.testing.assert_allclose(jitted, eager, atol=1e-5)


def test_batch_agnostic_reshape():
    """A graph exported at batch 1 serves batch 3 (the engine batches
    attribute heads over all faces in a frame batch)."""
    torch.manual_seed(3)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 4, 3, 2, 1)
            self.fc = nn.Linear(4 * 4 * 4, 5)

        def forward(self, x):
            h = self.conv(x)
            h = h.view(1, -1) if x.shape[0] == 1 else h.reshape(x.shape[0], -1)
            return self.fc(h)

    m = M()
    x1 = np.random.default_rng(3).normal(size=(1, 3, 8, 8)).astype(np.float32)
    data = export_onnx(m, torch.from_numpy(x1))  # hardcodes (1, -1) target
    runner = onnx_exec.OnnxRunner(onnxlite.parse_model(data))
    x3 = np.random.default_rng(4).normal(size=(3, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x3)).numpy()
    np.testing.assert_allclose(np.asarray(runner(x3)[0]), ref, atol=1e-5)


def test_pool_variants_and_softmax():
    torch.manual_seed(4)
    m = nn.Sequential(
        nn.Conv2d(3, 4, 3, 1, 1), nn.ReLU(),
        nn.MaxPool2d(3, 2, 1), nn.AvgPool2d(2, 2),
        nn.Flatten(), nn.Linear(4 * 4 * 4, 6), nn.Softmax(dim=1))
    x = np.random.default_rng(5).normal(size=(2, 3, 16, 16)).astype(np.float32)
    got, ref, _ = run_both(m, x)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_residual_concat_upsample():
    torch.manual_seed(5)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 4, 3, 1, 1)
            self.c2 = nn.Conv2d(4, 4, 3, 1, 1)
            self.up = nn.Upsample(scale_factor=2, mode="nearest")

        def forward(self, x):
            h = self.c1(x)
            h = h + self.c2(h)            # Add
            h = torch.cat([h, h], dim=1)  # Concat
            return self.up(h)             # Resize

    x = np.random.default_rng(6).normal(size=(1, 3, 8, 8)).astype(np.float32)
    got, ref, _ = run_both(M(), x)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_handbuilt_model_roundtrip_and_initializer_reader():
    """build_model -> parse_model round-trip covers the writer, the reader,
    and a standalone BatchNormalization node (torch folds BN into Conv, so
    the oracle tests above never emit one)."""
    rng = np.random.default_rng(7)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 2, 4).astype(np.float32)
    bias = rng.normal(size=4).astype(np.float32)
    mean = rng.normal(size=4).astype(np.float32)
    var = rng.uniform(0.5, 2, 4).astype(np.float32)
    data = onnxlite.build_model(
        nodes=[
            ("Conv", ["x", "w"], ["c"],
             {"strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
            ("BatchNormalization", ["c", "s", "b", "m", "v"], ["bn"],
             {"epsilon": 1e-5}),
            ("LeakyRelu", ["bn"], ["y"], {"alpha": 0.1}),
        ],
        initializers={"w": w, "s": scale, "b": bias, "m": mean, "v": var},
        inputs={"x": (1, 3, 8, 8)}, outputs={"y": (1, 4, 4, 4)})

    inits = onnxlite.read_initializers(data)
    np.testing.assert_array_equal(inits["w"], w)
    assert set(inits) == {"w", "s", "b", "m", "v"}

    runner = onnx_exec.OnnxRunner(onnxlite.parse_model(data))
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    got = np.asarray(runner(x)[0])
    # manual reference
    import torch.nn.functional as F

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=2,
                   padding=1)
    ref = F.batch_norm(ref, torch.from_numpy(mean), torch.from_numpy(var),
                       torch.from_numpy(scale), torch.from_numpy(bias),
                       eps=1e-5)
    ref = F.leaky_relu(ref, 0.1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unknown_op_reports_clearly():
    data = onnxlite.build_model(
        nodes=[("SomeFutureOp", ["x"], ["y"], {})],
        initializers={}, inputs={"x": (1, 4)}, outputs={"y": (1, 4)})
    runner = onnx_exec.OnnxRunner(onnxlite.parse_model(data))
    with pytest.raises(ValueError, match="SomeFutureOp"):
        runner(np.zeros((1, 4), np.float32))


def test_gemm_transpose_and_clip():
    rng = np.random.default_rng(8)
    a = rng.normal(size=(2, 6)).astype(np.float32)
    w = rng.normal(size=(5, 6)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    data = onnxlite.build_model(
        nodes=[
            ("Gemm", ["x", "w", "b"], ["g"],
             {"transB": 1, "alpha": 0.5, "beta": 2.0}),
            ("Clip", ["g"], ["y"], {"min": -1.0, "max": 1.0}),
        ],
        initializers={"w": w, "b": b},
        inputs={"x": (2, 6)}, outputs={"y": (2, 5)})
    runner = onnx_exec.OnnxRunner(onnxlite.parse_model(data))
    got = np.asarray(runner(a)[0])
    ref = np.clip(0.5 * (a @ w.T) + 2.0 * b, -1.0, 1.0)
    np.testing.assert_allclose(got, ref, atol=1e-5)
