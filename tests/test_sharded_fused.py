"""Data-parallel fused serving over a virtual 8-device mesh.

The fused detect+align+embed program shards its frame batch over the
'data' mesh axis with replicated weights; outputs must match the
single-device program exactly (no cross-chip communication is involved)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.core.config import EngineConfig
from facerecognition_infrenceengine_tpu.engine import FaceEngine
from facerecognition_infrenceengine_tpu.parallel import build_mesh


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(det_size=(160, 160), max_faces=4, pre_nms_topk=64,
                       dtype="float32")
    return FaceEngine(cfg, det_arch="det_500m", rec_arch="r18", seed=0)


@pytest.mark.slow
def test_sharded_fused_matches_single_device(engine):
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual CPU devices"
    mesh = build_mesh(devices[:8], data=8, gallery=1)
    run = engine.make_sharded_fused(mesh)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 160, 160, 3), dtype=np.uint8)
    got = run(frames, 0.1)
    want = engine.detect_align_embed(frames, 0.1)

    # The two programs compile with different fusion layouts, so f32
    # rounding can reorder near-tied detections; compare per-frame
    # detection SETS, not row order.
    g_boxes, g_valid = np.asarray(got[0]), np.asarray(got[3])
    w_boxes, w_valid = np.asarray(want[0]), np.asarray(want[3])
    assert (g_valid.sum(1) == w_valid.sum(1)).all()
    for b in range(len(frames)):
        gb = np.sort(g_boxes[b][g_valid[b]], axis=0)
        wb = np.sort(w_boxes[b][w_valid[b]], axis=0)
        np.testing.assert_allclose(gb, wb, rtol=1e-3, atol=1e-2)
    # outputs carry the data sharding (no implicit gather to one device)
    assert got[4].sharding.spec[0] == "data"


@pytest.mark.slow
def test_sharded_fused_data_by_gallery_mesh(engine):
    """2x4 mesh: batch shards over data=2 while gallery axis exists."""
    devices = jax.devices()
    mesh = build_mesh(devices[:8], data=2, gallery=4)
    run = engine.make_sharded_fused(mesh)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 160, 160, 3), dtype=np.uint8)
    out = run(frames, 0.1)
    assert out[4].shape == (4, 4, 512)
    assert np.isfinite(np.asarray(out[4])).all()
