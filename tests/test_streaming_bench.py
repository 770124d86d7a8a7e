"""benchmarks/streaming.run() — the sustained-streaming measurement
bench.py records in its extras — must work end-to-end on CPU: camera
threads -> MicroBatcher -> fused program, returning the stats dict."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))


def test_streaming_run_smoke():
    import streaming as streaming_mod

    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.models.zoo import FaceAnalysis

    cfg = EngineConfig(det_size=(64, 64), max_faces=4, pre_nms_topk=16,
                       dtype="float32", microbatch_max=4,
                       microbatch_window_ms=2.0)
    app = FaceAnalysis(cfg=cfg, allowed_modules=("detection", "recognition"))
    app.prepare(ctx_id=0, det_thresh=0.3)

    stats = streaming_mod.run(n_cameras=2, duration=1.5, fps=30.0, app=app,
                              quiet=True)
    assert stats["cameras"] == 2
    for key in ("fps_submitted", "fps_processed", "dropped", "p50_ms",
                "p90_ms", "p99_ms", "avg_batch", "host_mbps"):
        assert key in stats, key
    assert stats["fps_submitted"] > 0
    # Frames must actually flow through the device program (drops are
    # allowed — backpressure is part of the design — but not 100%).
    assert stats["fps_processed"] > 0
