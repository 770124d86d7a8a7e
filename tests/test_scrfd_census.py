"""Structural census of the det_10g SCRFD graph.

BASELINE.md's "identical match decisions" target requires detection parity,
which requires tools/convert_onnx.py to map the real det_10g.onnx onto
models/scrfd.py.  The pack isn't available in this image, so these tests pin
the next-strongest thing: the flax tree's layer census matches the published
SCRFD-10GF budget (3.86M params / ~10 GMACs at VGA — Guo et al., "Sample and
Computation Redistribution for Efficient Face Detection"), and the
execution-order list the converter maps against covers the tree exactly
(a bijection — so a converter run that completes has assigned every weight).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.models import arcface, mobilefacenet, scrfd
from facerecognition_infrenceengine_tpu.models.weights import flatten_shapes


def _tree_shapes(module, input_shape):
    shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0),
                            jnp.zeros(input_shape, jnp.float32))
    return flatten_shapes(shapes)


@pytest.fixture(scope="module")
def det10g_tree():
    return _tree_shapes(scrfd.SCRFD(scrfd.CONFIGS["det_10g"]), (1, 64, 64, 3))


def test_det10g_layer_counts(det10g_tree):
    convs = [k for k in det10g_tree if k.endswith("/kernel")]
    bns = {k.rsplit("/", 1)[0] for k in det10g_tree
           if k.startswith("params/") and k.endswith("/scale")
           and "BatchNorm" in k}
    scales = [k for k in det10g_tree if "bbox_scale" in k]
    conv_biases = [k for k in det10g_tree if k.endswith("/bias")
                   and "BatchNorm" not in k]
    # 30 backbone (3 stem + 6/9/5/7 per stage), 10 neck, 7 head.
    assert len(convs) == 47
    # One BN per backbone conv + 4 head-stack BNs; none in the neck.
    assert len(bns) == 34
    assert len(scales) == 3
    # Bias only where det_10g has it: 10 neck convs + 3 head output convs.
    assert len(conv_biases) == 13


def test_det10g_parameter_budget(det10g_tree):
    params = sum(int(jnp.prod(jnp.array(v.shape))) if v.shape else 1
                 for k, v in det10g_tree.items() if k.startswith("params/"))
    stats = sum(int(jnp.prod(jnp.array(v.shape)))
                for k, v in det10g_tree.items() if k.startswith("batch_stats/"))
    # Exact budget of the SCRFD-10GF graph (published: 3.86M).
    assert params == 3_857_685
    assert stats == 7_008


def test_det10g_initializer_census(det10g_tree):
    """The ONNX-facing census: det_10g.onnx carries 47 conv weights, 13 conv
    biases, 34 BNs x 4 tensors, 3 scale constants = 199 initializers, and
    the flax tree holds exactly those leaves (plus nothing else)."""
    assert len(det10g_tree) == 47 + 13 + 34 * 4 + 3


def _assert_order_covers_tree(order, tree, dense_kinds=("dense", "dense_flatten")):
    """Expanded execution order must map 1:1 onto the tree's layers."""
    from tools.convert_onnx import _expand_order

    expanded = _expand_order(order)
    conv_paths = {p for k, p, *_ in [(e[0], e[1]) for e in expanded] if k == "conv"}
    tree_convs = {k.rsplit("/", 1)[0] for k in tree
                  if k.endswith("/kernel") and "Dense" not in k}
    assert conv_paths == tree_convs, (
        f"order is missing {tree_convs - conv_paths}, "
        f"extra {conv_paths - tree_convs}")

    bn_paths = {e[1] for e in expanded if e[0] == "bn"}
    tree_bns = {k.rsplit("/", 1)[0] for k in tree
                if k.startswith("params/") and "BatchNorm" in k
                and k.endswith("/scale")}
    assert bn_paths == tree_bns

    prelu_paths = {e[1] for e in expanded if e[0] == "prelu"}
    tree_prelus = {k.rsplit("/", 1)[0] for k in tree if k.endswith("/alpha")}
    assert prelu_paths == tree_prelus

    dense_paths = {e[1] for e in expanded if e[0] in dense_kinds}
    tree_denses = {k.rsplit("/", 1)[0] for k in tree
                   if k.endswith("/kernel") and "Dense" in k}
    assert dense_paths == tree_denses

    scale_paths = {e[1] for e in expanded if e[0] == "scale"}
    tree_scales = {k for k in tree if "bbox_scale" in k}
    assert scale_paths == tree_scales


def test_det10g_execution_order_bijection(det10g_tree):
    order = scrfd.layer_execution_order(scrfd.CONFIGS["det_10g"])
    _assert_order_covers_tree(order, det10g_tree)


def test_small_tier_execution_order_bijection():
    for arch in ("det_2.5g", "det_500m"):
        cfg = scrfd.CONFIGS[arch]
        tree = _tree_shapes(scrfd.SCRFD(cfg), (1, 64, 64, 3))
        _assert_order_covers_tree(scrfd.layer_execution_order(cfg), tree)


def test_arcface_r50_execution_order_bijection():
    tree = _tree_shapes(arcface.iresnet50(), (1, 112, 112, 3))
    order = arcface.layer_execution_order((3, 4, 14, 3))
    _assert_order_covers_tree(order, tree)
    # iresnet50: 1 stem + 24 blocks x (2 + shortcut on 4 stage entries).
    convs = [k for k in tree if k.endswith("/kernel") and "Dense" not in k]
    assert len(convs) == 1 + 24 * 2 + 4


def test_mobilefacenet_execution_order_bijection():
    tree = _tree_shapes(mobilefacenet.mobilefacenet(), (1, 112, 112, 3))
    _assert_order_covers_tree(mobilefacenet.layer_execution_order(), tree)


def test_decode_matches_insightface_reference():
    """Our jitted decode chain (ops.anchors centers + distance2bbox/kps +
    legacy-IoU NMS) must make the same decisions as insightface scrfd.py's
    numpy decode (tools/parity_check.scrfd_reference_decode) on crafted head
    outputs — so converted det_10g weights imply identical detections."""
    from facerecognition_infrenceengine_tpu.ops.anchors import all_anchor_centers
    from facerecognition_infrenceengine_tpu.ops.boxes import (distance2bbox,
                                                              distance2kps)
    from facerecognition_infrenceengine_tpu.ops.nms import nms_padded
    from tools.parity_check import scrfd_reference_decode

    h = w = 128
    rng = np.random.default_rng(5)
    per_level = [(h // s) * (w // s) * 2 for s in scrfd.STRIDES]
    # Crafted outputs: mostly background, a sprinkle of confident anchors
    # with overlapping boxes so NMS decisions matter.
    outs = []
    for n in per_level:
        s = rng.uniform(0, 0.25, n).astype(np.float32)
        hot = rng.choice(n, size=max(2, n // 40), replace=False)
        s[hot] = rng.uniform(0.5, 1.0, hot.size)
        outs.append(s.reshape(n, 1))
    for n in per_level:
        outs.append(rng.uniform(0.5, 4.0, (n, 4)).astype(np.float32))
    for n in per_level:
        outs.append(rng.uniform(-2.0, 2.0, (n, 10)).astype(np.float32))

    ref_boxes, ref_scores, ref_kps = scrfd_reference_decode(
        outs, h, w, det_thresh=0.3, iou_thresh=0.4)

    # ours: the engine pipeline's decode over the concatenated rows
    centers = np.asarray(all_anchor_centers(h, w))
    stride_rows = np.concatenate(
        [np.full(n, float(s), np.float32)
         for n, s in zip(per_level, scrfd.STRIDES)])
    scores = np.concatenate([o.reshape(-1) for o in outs[:3]])
    bbox = np.concatenate(outs[3:6]) * stride_rows[:, None]
    kps = np.concatenate(outs[6:9]) * stride_rows[:, None]
    boxes = np.asarray(distance2bbox(jnp.asarray(centers), jnp.asarray(bbox)))
    points = np.asarray(distance2kps(jnp.asarray(centers), jnp.asarray(kps)))
    masked = np.where(scores >= 0.3, scores, -np.inf).astype(np.float32)
    ob, osc, oidx, valid = nms_padded(jnp.asarray(boxes), jnp.asarray(masked),
                                      max_out=64, iou_thresh=0.4)
    ours_boxes = np.asarray(ob)[np.asarray(valid)]
    ours_scores = np.asarray(osc)[np.asarray(valid)]
    ours_kps = points[np.asarray(oidx)[np.asarray(valid)]]

    assert len(ours_boxes) == len(ref_boxes)
    order = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(ours_boxes, ref_boxes[order], atol=1e-4)
    np.testing.assert_allclose(ours_scores, ref_scores[order], atol=1e-6)
    np.testing.assert_allclose(ours_kps, ref_kps[order], atol=1e-4)


def test_det10g_forward_shapes():
    """Forward at a small canvas: anchor rows = sum H/s*W/s*2, 3 outputs."""
    model = scrfd.SCRFD(scrfd.CONFIGS["det_10g"])
    out = jax.eval_shape(
        model.apply,
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3), jnp.float32)),
        jnp.zeros((2, 64, 64, 3), jnp.float32))
    a = scrfd.num_anchors_total(64, 64)
    assert a == (8 * 8 + 4 * 4 + 2 * 2) * 2
    assert out[0].shape == (2, a, 1)
    assert out[1].shape == (2, a, 4)
    assert out[2].shape == (2, a, 10)
