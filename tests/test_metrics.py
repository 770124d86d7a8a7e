"""Metrics/observability subsystem (core/metrics.py, SURVEY.md §5.1/§5.5)."""

import threading

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.core import metrics


@pytest.fixture(autouse=True)
def fresh_registry():
    metrics.reset()
    yield
    metrics.reset()


def test_counter_and_gauge():
    metrics.counter("c").inc()
    metrics.counter("c").inc(4)
    metrics.gauge("g").set(2.5)
    snap = metrics.snapshot()
    assert snap["counters"]["c"] == 5
    assert snap["gauges"]["g"] == 2.5


def test_timer_statistics():
    t = metrics.timer("stage")
    for ms in (1, 2, 3, 4, 100):
        t.observe(ms / 1000.0)
    s = metrics.snapshot()["timers"]["stage"]
    assert s["count"] == 5
    assert s["mean_ms"] == pytest.approx(22.0, rel=0.01)
    assert s["p50_ms"] == pytest.approx(3.0, rel=0.01)
    assert s["max_ms"] == pytest.approx(100.0, rel=0.01)


def test_timer_context_manager():
    with metrics.timer("cm"):
        pass
    assert metrics.snapshot()["timers"]["cm"]["count"] == 1


def test_thread_safety():
    c = metrics.counter("shared")

    def work():
        for _ in range(1000):
            c.inc()

    threads = [threading.Thread(target=work) for _ in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert c.snapshot() == 8000


def test_microbatcher_reports_metrics():
    from facerecognition_infrenceengine_tpu.core.config import EngineConfig
    from facerecognition_infrenceengine_tpu.engine.microbatch import MicroBatcher

    class Fake:
        def get_batch(self, frames):
            return [[] for _ in frames]

    mb = MicroBatcher(Fake(), EngineConfig())
    mb.start()
    try:
        futs = [mb.submit(f"cam{i}", np.zeros((4, 4, 3), np.uint8))
                for i in range(3)]
        for f in futs:
            f.result(timeout=5)
    finally:
        mb.stop()
    snap = metrics.snapshot()
    assert snap["counters"]["microbatch.frames"] >= 3
    assert snap["timers"]["microbatch.dispatch"]["count"] >= 1


def test_metrics_endpoint():
    from facerecognition_infrenceengine_tpu.core.config import Config
    from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager
    from facerecognition_infrenceengine_tpu.servers.inference_server import build_app
    from facerecognition_infrenceengine_tpu.store import Datastore

    cfg = Config()
    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    app = build_app(gallery, camera_manager=None)
    metrics.counter("probe").inc()
    resp = app.test_client().get("/api/metrics")
    assert resp.status_code == 200
    assert resp.get_json()["counters"]["probe"] == 1


def test_timer_handle_snapshot_delegates():
    t = metrics.timer("handle")
    t.observe(0.002)
    snap = t.snapshot()  # the handle users hold must be snapshot-able
    assert snap["count"] == 1
