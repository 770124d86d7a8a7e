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

    def submit(self, source: Any, frame, prepare=None) -> Future:
        """Queue one frame; returns a Future resolving to list[Face].

        If the per-source slot is full, the OLDEST queued frame is dropped
        (its future gets an empty result) — a live stream must never back up.

        ``prepare`` (optional) is an expensive per-frame transform (wire-
        format encode and/or device upload, models/zoo.encode_frame) run on
        the CALLING thread, outside the batcher lock — N capture threads
        prepare in parallel.  It runs only when the frame is admitted: when
        the slot is full the NEW frame is dropped instead (admission
        control), so a saturated link never pays upload bytes for a frame
        that would immediately be displaced.
        """
        future: Future = Future()
        if not self.running:
            future.dropped = True  # type: ignore[attr-defined]
            future.set_result([])
            return future
        if prepare is not None:
            with self._lock:
                admitted = (len(self._slots.get(source, ()))
                            < self.cfg.frame_queue_depth)
            if not admitted:
                future.dropped = True  # type: ignore[attr-defined]
                future.set_result([])
                self.stats["dropped"] += 1
                metrics.counter("microbatch.dropped").inc()
                return future
            frame = prepare(frame)
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

    def _resolver_loop(self, q):
        """Drain the in-flight queue in FIFO order, blocking on device
        results OFF the dispatch thread.  Measured on the tunneled v5e:
        resolving inline cost the dispatch thread ~1/3 of each cycle
        (result download + RTT) during which the host->device link — the
        streaming bottleneck — sat idle; with resolution decoupled the
        dispatch thread uploads back-to-back."""
        while True:
            inflight = q.get()
            if inflight is None:
                return
            with metrics.timer("microbatch.resolve"):
                self._resolve(inflight)

    def _loop(self):
        # Pipelined dispatch: this thread only drains + preps + uploads;
        # a resolver thread blocks on device results.  The bounded queue
        # (depth 2) is the backpressure — at most two batches in flight
        # keeps worst-case latency ~2 cycles while the upload link, the
        # streaming bottleneck, never waits on a result round-trip.
        import queue

        window_s = self.cfg.microbatch_window_ms / 1000.0
        depth = max(1, int(getattr(self.cfg, "inflight_batches", 1)))
        inflight_q: "queue.Queue" = queue.Queue(maxsize=depth)
        resolver = threading.Thread(target=self._resolver_loop,
                                    args=(inflight_q,), daemon=True)
        resolver.start()
        try:
            while self.running:
                self._wakeup.wait(timeout=0.05)
                self._wakeup.clear()
                if not self.running:
                    break
                # small batching window: let concurrent cameras pile in
                deadline = time.perf_counter() + window_s
                while time.perf_counter() < deadline:
                    with self._lock:
                        pending = sum(len(s) for s in self._slots.values())
                    if pending >= self.cfg.microbatch_max:
                        break
                    time.sleep(window_s / 4)
                batch = self._drain()
                if not batch:
                    continue
                with metrics.timer("microbatch.dispatch"):
                    nxt = self._dispatch(batch)
                if nxt is not None:
                    inflight_q.put(nxt)  # blocks at 2 in flight
        finally:
            inflight_q.put(None)
            resolver.join(timeout=10)
