"""Adaptive streaming controller (engine/microbatch._adapt_step).

VERDICT r4 #4: the same serving code measured 45.5 fps p50 202 ms and
33.5 fps p99 2 s in one bench purely on static knob choice.  The "auto"
profile retunes frame_queue_depth / inflight_batches online against
cfg.target_p50_ms while preserving the reference's drop-on-full admission
semantics (reference infrenceServer.py:594-598) at every depth it picks.
"""

import time

import numpy as np

from facerecognition_infrenceengine_tpu.core.config import EngineConfig
from facerecognition_infrenceengine_tpu.engine.microbatch import MicroBatcher


class _FakeApp:
    def __init__(self, service_s=0.0):
        self.service_s = service_s

    def get_batch(self, frames):
        if self.service_s:
            time.sleep(self.service_s)
        return [[] for _ in frames]


def _auto_cfg(**kw):
    base = dict(stream_profile="auto", target_p50_ms=100.0,
                adapt_interval_s=0.1, frame_queue_depth=2,
                inflight_batches=2, microbatch_max=8,
                microbatch_window_ms=1.0)
    base.update(kw)
    return EngineConfig(**base)


def _feed_window(mb, p50_ms, n=20):
    with mb._lat_lock:
        mb._lat_window = [p50_ms / 1000.0] * n


def test_overshoot_tightens_inflight_then_depth():
    mb = MicroBatcher(_FakeApp(), _auto_cfg())
    assert (mb.depth, mb.inflight_limit) == (2, 2)
    for expect in ((2, 1), (1, 1), (1, 1)):  # inflight first, then depth
        _feed_window(mb, 400.0)
        mb._adapt_t0 = 0.0  # force the interval to have elapsed
        mb._adapt_step()
        assert (mb.depth, mb.inflight_limit) == expect


def test_underrun_without_drops_holds_steady():
    mb = MicroBatcher(_FakeApp(), _auto_cfg())
    _feed_window(mb, 20.0)  # far under target, but nothing is dropping
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert (mb.depth, mb.inflight_limit) == (2, 2)
    assert mb._adapt_trial is None


def test_underrun_with_drops_trials_loosening_and_reverts():
    mb = MicroBatcher(_FakeApp(), _auto_cfg(frame_queue_depth=1,
                                            inflight_batches=1))
    # window 1: cheap latency + heavy drops -> trial depth 1 -> 2
    _feed_window(mb, 20.0)
    mb.stats["dropped"] = 50
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert mb.depth == 2 and mb._adapt_trial == ("depth", 1)
    # window 2: fps did NOT improve >=5% -> revert to depth 1
    _feed_window(mb, 20.0)
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert mb.depth == 1 and mb._adapt_trial is None


def test_trial_kept_when_fps_improves():
    mb = MicroBatcher(_FakeApp(), _auto_cfg(frame_queue_depth=1,
                                            inflight_batches=1))
    t = time.perf_counter()
    _feed_window(mb, 20.0, n=10)
    mb.stats["dropped"] = 50
    mb._adapt_t0 = t - 1.0  # 10 resolved / 1 s
    mb._adapt_step()
    assert mb.depth == 2
    # next window: double the resolved fps at good latency -> the depth-2
    # trial is kept (no revert to 1); still-dropping + under-target means
    # the climb continues with a fresh depth-3 trial
    _feed_window(mb, 30.0, n=20)
    mb.stats["dropped"] = 60
    mb._adapt_t0 = time.perf_counter() - 1.0
    mb._adapt_step()
    assert mb.depth == 3 and mb._adapt_trial == ("depth", 2)


def test_failed_trial_reverts_without_tightening_further():
    """One knob movement per step: a trial that overshoots p50 is reverted,
    and that window's latency — produced BY the trial — must not also
    drive a tighten of a second knob (that double movement oscillates
    between over-tight and trial states instead of settling)."""
    mb = MicroBatcher(_FakeApp(), _auto_cfg())  # depth=2, inflight=2
    # window 1: cheap + drops -> trial depth 2 -> 3
    _feed_window(mb, 20.0)
    mb.stats["dropped"] = 50
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert mb.depth == 3 and mb._adapt_trial == ("depth", 2)
    # window 2: trial overshot target -> revert depth to 2, and ONLY that:
    # inflight stays 2 (no second movement off trial-caused latency)
    _feed_window(mb, 400.0)
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert (mb.depth, mb.inflight_limit) == (2, 2)
    assert mb._adapt_trial is None
    # window 3: still over target with no trial active -> normal tighten
    _feed_window(mb, 400.0)
    mb._adapt_t0 = 0.0
    mb._adapt_step()
    assert (mb.depth, mb.inflight_limit) == (2, 1)


def test_static_profile_records_no_latency_window():
    mb = MicroBatcher(_FakeApp(), EngineConfig(stream_profile="static"))
    assert not mb._adaptive


def test_end_to_end_converges_to_depth1_under_slow_service():
    """A service time far beyond target forces queueing; the controller
    must walk the knobs down to (1, 1) while frames keep flowing and
    drop-on-full admission keeps working at the tightened depth."""
    cfg = _auto_cfg(target_p50_ms=30.0, adapt_interval_s=0.15,
                    frame_queue_depth=3, inflight_batches=2)
    mb = MicroBatcher(_FakeApp(service_s=0.05), cfg)
    mb.start()
    try:
        frame = np.zeros((4, 4, 3), np.uint8)
        deadline = time.perf_counter() + 4.0
        futs = []
        while time.perf_counter() < deadline:
            futs.append(mb.submit("cam0", frame))
            futs.append(mb.submit("cam1", frame))
            time.sleep(0.005)
        assert (mb.depth, mb.inflight_limit) == (1, 1), mb.adapt_log
        assert mb.adapt_log, "controller never stepped"
        assert mb.stats["frames"] > 0
        assert mb.stats["dropped"] > 0  # drop-on-full still applies
    finally:
        mb.stop()
    done = [f for f in futs if f.done()]
    assert len(done) == len(futs)  # stop() fails open, nothing hangs
