"""Dynamic micro-batcher: many camera streams, one device pipeline.

The reference gives each camera its own OS process + ONNX session
(reference infrenceServer.py:565-679) — the right shape for a CPU/GPU box,
wrong for a TPU, where one jitted program wants dense batches.  Here every
camera thread submits frames to a single batcher; a dispatch thread drains
the queue, pads to the bucketed batch shape, runs ONE ``get_batch`` on the
device, and resolves per-frame futures.

Backpressure matches the reference's drop-on-full semantics
(infrenceServer.py:594-598): each source key has a bounded slot (depth from
EngineConfig.frame_queue_depth); a newer frame replaces a stale undispatched
one rather than queueing behind it.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import Any, Dict

from ..core import metrics
from ..core.config import EngineConfig, get_config


class MicroBatcher:
    def __init__(self, face_app, cfg: EngineConfig | None = None):
        """face_app: anything with get_batch(frames) -> list[list[Face]]."""
        self.face_app = face_app
        self.cfg = cfg or get_config().engine
        self._lock = threading.Lock()
        self._slots: Dict[Any, list] = {}  # source -> [(frame, future), ...]
        self._wakeup = threading.Event()
        self.running = False
        self._thread = None
        self.stats = {"dispatches": 0, "frames": 0, "dropped": 0}

    def start(self):
        if self.running:
            return
        self.running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self.running = False
        self._wakeup.set()
        if self._thread:
            self._thread.join(timeout=5)
        # Fail open: resolve anything still queued so no waiter blocks
        # forever on a future whose dispatch loop is gone.
        with self._lock:
            pending = [fut for slot in self._slots.values() for _, fut in slot]
            self._slots.clear()
        for fut in pending:
            fut.dropped = True
            fut.set_result([])

    def submit(self, source: Any, frame) -> Future:
        """Queue one frame; returns a Future resolving to list[Face].

        If the per-source slot is full, the OLDEST queued frame is dropped
        (its future gets an empty result) — a live stream must never back up.
        """
        future: Future = Future()
        if not self.running:
            future.dropped = True  # type: ignore[attr-defined]
            future.set_result([])
            return future
        with self._lock:
            slot = self._slots.setdefault(source, [])
            while len(slot) >= self.cfg.frame_queue_depth:
                _, stale = slot.pop(0)
                stale.dropped = True  # lets callers tell drops from no-face
                stale.set_result([])
                self.stats["dropped"] += 1
                metrics.counter("microbatch.dropped").inc()
            slot.append((frame, future))
        self._wakeup.set()
        return future

    def process(self, frame) -> list:
        """Synchronous convenience: submit + wait."""
        return self.submit(object(), frame).result()

    def _drain(self) -> list:
        with self._lock:
            batch = []
            # round-robin across sources for fairness
            progressed = True
            while progressed and len(batch) < self.cfg.microbatch_max:
                progressed = False
                for slot in self._slots.values():
                    if slot and len(batch) < self.cfg.microbatch_max:
                        batch.append(slot.pop(0))
                        progressed = True
            # prune drained sources: one-shot keys (process() uses a fresh
            # object() per call) must not accumulate forever
            for key in [k for k, slot in self._slots.items() if not slot]:
                del self._slots[key]
            return batch

    def _dispatch(self, batch):
        """Start one device batch; returns (futures, resolve_fn) or None.
        Uses face_app.get_batch_async when available so the NEXT batch's
        host prep + upload overlaps this batch's device time."""
        frames = [f for f, _ in batch]
        futures = [fut for _, fut in batch]
        try:
            if hasattr(self.face_app, "get_batch_async"):
                resolve = self.face_app.get_batch_async(frames)
            else:
                results = self.face_app.get_batch(frames)
                resolve = lambda: results  # noqa: E731
        except Exception as e:  # propagate to every waiter
            for fut in futures:
                fut.set_exception(e)
            return None
        self.stats["dispatches"] += 1
        self.stats["frames"] += len(frames)
        metrics.counter("microbatch.frames").inc(len(frames))
        metrics.gauge("microbatch.last_batch").set(len(frames))
        return futures, resolve

    @staticmethod
    def _resolve(inflight):
        futures, resolve = inflight
        try:
            results = resolve()
        except Exception as e:
            for fut in futures:
                fut.set_exception(e)
            return
        for fut, faces in zip(futures, results):
            fut.set_result(faces)

    def _loop(self):
        # Double-buffered dispatch: while the device runs batch k, this
        # thread drains + preps + uploads batch k+1, then blocks on k's
        # results.  Under sustained camera load the host->device transfer
        # (the streaming bottleneck) fully overlaps device compute; when
        # idle, the in-flight batch resolves on the next (immediate) tick.
        window_s = self.cfg.microbatch_window_ms / 1000.0
        inflight = None
        while self.running:
            if inflight is None:
                self._wakeup.wait(timeout=0.05)
                self._wakeup.clear()
            if not self.running:
                break
            if inflight is None:
                # small batching window: let concurrent cameras pile in
                deadline = time.perf_counter() + window_s
                while time.perf_counter() < deadline:
                    with self._lock:
                        pending = sum(len(s) for s in self._slots.values())
                    if pending >= self.cfg.microbatch_max:
                        break
                    time.sleep(window_s / 4)
            batch = self._drain()
            nxt = None
            if batch:
                with metrics.timer("microbatch.dispatch"):
                    nxt = self._dispatch(batch)
            if inflight is not None:
                self._resolve(inflight)
            inflight = nxt
        if inflight is not None:
            self._resolve(inflight)
