"""Campus entry/exit state machine, unknown clustering, batching, counting
pipeline with the fake detector, and the micro-batcher."""

import datetime

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.domain.campus import (
    CameraType,
    CampusPeopleManager,
    PersonStatus,
)
from facerecognition_infrenceengine_tpu.domain.counting import CountingProcessor
from facerecognition_infrenceengine_tpu.engine.microbatch import MicroBatcher
from facerecognition_infrenceengine_tpu.models.zoo import (
    FakeFaceAnalysis,
    encode_fake_face,
    fake_embedding,
)
from facerecognition_infrenceengine_tpu.store import Datastore


def ts(seconds: float) -> datetime.datetime:
    return datetime.datetime(2026, 8, 16, 9, 0, 0) + datetime.timedelta(
        seconds=seconds)


@pytest.fixture
def manager(store_cfg):
    # store_cfg (conftest) pins the campus state machine + write batching
    # over BOTH the embedded store and the fre:// wire server
    cfg = store_cfg
    ds = Datastore(cfg)
    m = CampusPeopleManager(ds, cfg, start_background=False)
    m.register_camera("cam_in", "campusA", CameraType.ENTRY)
    m.register_camera("cam_out", "campusA", CameraType.EXIT)
    return m


META = {"name": "Asha", "type": "employee", "employeeId": "E1"}


def test_entry_requires_debounce(manager):
    # first detection starts tracking; second <2s later does not confirm
    manager.process_detection("p1", META, "cam_in", ts(0), 0.8)
    manager.process_detection("p1", META, "cam_in", ts(1.0), 0.8)
    assert manager.people_states["p1"].status == PersonStatus.OUTSIDE
    # second detection >=2s later confirms
    manager.process_detection("p1", META, "cam_in", ts(2.5), 0.8)
    assert manager.people_states["p1"].status == PersonStatus.INSIDE
    status = manager.get_campus_status("campusA")
    assert status["current_inside"] == 1
    assert status["employees_inside"] == 1
    assert status["total_entries_today"] == 1


def test_pending_detection_expires(manager):
    manager.process_detection("p1", META, "cam_in", ts(0), 0.8)
    state = manager.people_states["p1"]
    # expire (>5s) then cleanup
    state.clear_stale_detections(ts(6))
    assert state.pending_entry_detection is None
    # a detection 7s after the first should start a NEW pending, not confirm
    manager.process_detection("p1", META, "cam_in", ts(7), 0.8)
    assert state.status == PersonStatus.OUTSIDE


def test_full_entry_exit_cycle_and_events(manager):
    manager.process_detection("p1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("p1", META, "cam_in", ts(2.5), 0.9)
    assert manager.people_states["p1"].status == PersonStatus.INSIDE
    # exit needs its own two detections on the exit camera
    manager.process_detection("p1", META, "cam_out", ts(100), 0.85)
    manager.process_detection("p1", META, "cam_out", ts(103), 0.85)
    assert manager.people_states["p1"].status == PersonStatus.OUTSIDE
    status = manager.get_campus_status("campusA")
    assert status["current_inside"] == 0
    assert status["total_exits_today"] == 1
    # events and state were queued; flush persists them
    manager.flush()
    events = list(manager.ds.campus_events.find({}).sort("timestamp", 1))
    assert [e["event_type"] for e in events] == ["entry", "exit"]
    persisted = manager.ds.people_status.find_one({"person_id": "p1"})
    assert persisted["status"] == "outside"
    assert persisted["total_entries_today"] == 1


def test_entry_while_inside_is_ignored(manager):
    manager.process_detection("p1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("p1", META, "cam_in", ts(3), 0.9)
    # more entry detections while inside do nothing
    manager.process_detection("p1", META, "cam_in", ts(10), 0.9)
    manager.process_detection("p1", META, "cam_in", ts(13), 0.9)
    assert manager.get_campus_status("campusA")["total_entries_today"] == 1


def test_state_reload_after_restart(manager):
    manager.process_detection("p1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("p1", META, "cam_in", ts(3), 0.9)
    manager.flush()
    # new manager over the same store rebuilds in-memory state
    m2 = CampusPeopleManager(manager.ds, start_background=False)
    assert m2.get_campus_status("campusA")["current_inside"] == 1
    assert m2.people_states["p1"].status == PersonStatus.INSIDE


def test_unknown_clustering(manager):
    e1 = fake_embedding(500)
    # 3 detections of the same stranger -> one cluster
    for i in range(3):
        manager.process_unknown_detection("cam_in", ts(i), e1, [10, 10, 50, 50])
    assert len(manager.unknown_people["campusA"]) == 1
    cluster = next(iter(manager.unknown_people["campusA"].values()))
    assert cluster.detection_count == 3
    # a different stranger makes a second cluster
    manager.process_unknown_detection("cam_in", ts(10), fake_embedding(777),
                                      [10, 10, 50, 50])
    assert len(manager.unknown_people["campusA"]) == 2
    status = manager.get_campus_status("campusA")
    assert status["unknown_detections_today"] == 4
    assert status["unique_unknowns_today"] == 2
    manager.flush()
    assert manager.ds.unknown_detections.count_documents({}) == 4


def test_unknown_running_mean_window(manager):
    base = fake_embedding(31)
    for i in range(15):
        manager.process_unknown_detection("cam_in", ts(i), base, [0, 0, 1, 1])
    cluster = next(iter(manager.unknown_people["campusA"].values()))
    assert len(cluster.embeddings) == 10  # deque(maxlen=10)
    assert cluster.detection_count == 15


def test_analytics_rollup(manager):
    manager.process_detection("p1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("p1", META, "cam_in", ts(3), 0.9)
    manager.update_analytics()
    doc = manager.ds.campus_analytics.find_one({"campus_id": "campusA"})
    assert doc["current_inside"] == 1
    assert doc["total_entries"] == 1
    # idempotent upsert per (campus, date)
    manager.update_analytics()
    assert manager.ds.campus_analytics.count_documents({}) == 1


class _StubGallery:
    """Gallery stub: person seeds 1..3 enrolled."""

    def __init__(self):
        self.ids = [f"person{i}" for i in (1, 2, 3)]
        self.matrix = np.stack([fake_embedding(i) for i in (1, 2, 3)])
        self.metadata = {pid: {"name": pid, "type": "employee",
                               "employeeId": pid} for pid in self.ids}

    def get_stats(self):
        return {"total_embeddings": len(self.ids)}

    def is_empty(self):
        return not self.ids

    def match(self, q, company_id=None, k=1):
        scores = self.matrix @ q.T  # [N, B]
        best = scores.argmax(axis=0)
        vals = scores[best, np.arange(q.shape[0])][:, None]
        ids = [[self.ids[i]] for i in best]
        return vals, ids, self.metadata


def test_counting_processor_routes_detections(manager):
    gallery = _StubGallery()
    proc = CountingProcessor(gallery, manager, face_app=FakeFaceAnalysis())
    # a frame with enrolled person 1 -> recognized
    frame = encode_fake_face(1, 0.0)
    stats = proc.process_frame(frame, "cam_in")
    assert stats == {"faces": 1, "recognized": 1, "unknown": 0}
    # a stranger (seed 999, cos ~0 vs gallery) -> unknown clustering
    frame = encode_fake_face(999, 0.0)
    stats = proc.process_frame(frame, "cam_in")
    assert stats == {"faces": 1, "recognized": 0, "unknown": 1}
    assert len(manager.unknown_people["campusA"]) == 1


def test_microbatcher_batches_and_preserves_order():
    calls = []

    class App:
        def get_batch(self, frames):
            calls.append(len(frames))
            return [[f"face_of_{np.asarray(f)[0,0,0]}"] for f in frames]

    cfg = Config().engine
    batcher = MicroBatcher(App(), cfg)
    batcher.start()
    try:
        frames = [np.full((2, 8, 3), i, np.uint8) for i in range(6)]
        futures = [batcher.submit(f"cam{i%3}", f) for i, f in enumerate(frames)]
        results = [f.result(timeout=5) for f in futures]
        assert [r[0] for r in results] == [f"face_of_{i}" for i in range(6)]
        assert batcher.stats["frames"] == 6
        assert batcher.stats["dispatches"] <= 6  # some batching happened
    finally:
        batcher.stop()


def test_microbatcher_drops_stale_frames():
    import threading

    release = threading.Event()

    class SlowApp:
        def get_batch(self, frames):
            release.wait(timeout=5)
            return [[] for _ in frames]

    cfg = Config().engine  # frame_queue_depth = 2
    batcher = MicroBatcher(SlowApp(), cfg)
    batcher.start()
    try:
        futs = [batcher.submit("cam0", np.zeros((2, 8, 3), np.uint8))
                for _ in range(8)]
        import time

        time.sleep(0.3)  # let the dispatcher grab some, queue the rest
        release.set()
        done = [f.result(timeout=5) for f in futs]
        assert batcher.stats["dropped"] > 0
        assert len(done) == 8  # every future resolves (dropped ones -> [])
    finally:
        batcher.stop()


def test_unknown_clusters_survive_restart():
    """Beyond-reference hardening (VERDICT r2 #10): the reference loses
    unknown clusters on restart (peopleCount.py:231).  Here a persisted
    cluster reloads with its running-mean window, so the same unknown seen
    after a restart rejoins its cluster instead of becoming a new one."""
    import numpy as np

    from facerecognition_infrenceengine_tpu.api.utils import get_current_utc
    from facerecognition_infrenceengine_tpu.core.config import Config
    from facerecognition_infrenceengine_tpu.domain.campus import (
        CameraType, CampusPeopleManager)
    from facerecognition_infrenceengine_tpu.store import Datastore

    cfg = Config()
    ds = Datastore(cfg)
    mgr = CampusPeopleManager(ds, cfg, start_background=False)
    mgr.register_camera("cam1", "campusA", CameraType.ENTRY)

    rng = np.random.default_rng(7)
    emb = rng.normal(size=512).astype(np.float32)
    emb /= np.linalg.norm(emb)
    now = get_current_utc()
    mgr.process_unknown_detection("cam1", now, emb, [1, 2, 3, 4])
    # second, slightly different view joins the same cluster
    emb2 = emb + rng.normal(size=512).astype(np.float32) * 0.02
    emb2 /= np.linalg.norm(emb2)
    mgr.process_unknown_detection("cam1", now, emb2, [2, 3, 4, 5])
    assert len(mgr.unknown_people["campusA"]) == 1
    uid = next(iter(mgr.unknown_people["campusA"]))
    assert mgr.unknown_people["campusA"][uid].detection_count == 2
    mgr.flush()
    assert ds.unknown_clusters.count_documents({}) == 1

    # "restart": a fresh manager over the same datastore
    mgr2 = CampusPeopleManager(ds, cfg, start_background=False)
    mgr2.register_camera("cam1", "campusA", CameraType.ENTRY)
    assert len(mgr2.unknown_people["campusA"]) == 1
    reloaded = mgr2.unknown_people["campusA"][uid]
    assert reloaded.detection_count == 2
    assert len(reloaded.embeddings) == 2
    np.testing.assert_allclose(
        reloaded.avg_embedding,
        mgr.unknown_people["campusA"][uid].avg_embedding, atol=1e-6)
    assert mgr2.campus_stats["campusA"]["unique_unknowns"] == 1

    # the re-appearing unknown REJOINS its cluster after restart
    emb3 = emb + rng.normal(size=512).astype(np.float32) * 0.02
    emb3 /= np.linalg.norm(emb3)
    mgr2.process_unknown_detection("cam1", now, emb3, [3, 4, 5, 6])
    assert len(mgr2.unknown_people["campusA"]) == 1
    assert mgr2.unknown_people["campusA"][uid].detection_count == 3


def test_unknown_first_match_insertion_order_not_best(manager):
    """The batched stacked-means match must reproduce the reference's
    FIRST-above-threshold-in-insertion-order decision (reference
    peopleCount.py:445-455 breaks on the first hit), NOT best-match:
    a probe nearer cluster B still joins earlier-created cluster A when
    A clears the threshold too."""
    rng = np.random.default_rng(7)
    a = rng.normal(size=512).astype(np.float32)
    a /= np.linalg.norm(a)
    # b: close to a but distinct (cos(a,b) ~ 0.91; noise norm ~0.02*sqrt(512))
    b = a + 0.02 * rng.normal(size=512).astype(np.float32)
    b /= np.linalg.norm(b)
    manager.process_unknown_detection("cam_in", ts(0), a, [0, 0, 1, 1])
    # force a second cluster: probe orthogonal-ish to a
    manager.process_unknown_detection("cam_in", ts(1), fake_embedding(99),
                                      [0, 0, 1, 1])
    manager.unknown_people["campusA"]["unknown_campusA_2"].embeddings.clear()
    # overwrite cluster 2's mean to be exactly b (nearer the probe below)
    u2 = manager.unknown_people["campusA"]["unknown_campusA_2"]
    u2.avg_embedding = b
    manager._bank("campusA", 512).upsert(u2.unknown_id, b)
    probe = b  # cos(probe, cluster2)=1.0 > cos(probe, cluster1)~0.89
    assert float(a @ probe) >= manager.unknown_similarity_threshold
    n_before = manager.unknown_people["campusA"][
        "unknown_campusA_1"].detection_count
    manager.process_unknown_detection("cam_in", ts(2), probe, [0, 0, 1, 1])
    # joined cluster 1 (insertion order), though cluster 2 scores higher
    assert manager.unknown_people["campusA"][
        "unknown_campusA_1"].detection_count == n_before + 1
    assert manager.unknown_people["campusA"][
        "unknown_campusA_2"].detection_count == 1


def test_cluster_bank_tracks_running_means(manager):
    """Bank rows follow avg_embedding updates so the one-matmul match
    stays decision-identical to scanning the live cluster objects."""
    for i in range(4):
        manager.process_unknown_detection(
            "cam_in", ts(i), fake_embedding(500 + i * 1000), [0, 0, 1, 1])
    bank = manager._bank("campusA", 512)
    people = manager.unknown_people["campusA"]
    assert bank.ids == list(people.keys())  # insertion order preserved
    for uid, u in people.items():
        np.testing.assert_allclose(bank.matrix[bank.index[uid]],
                                   u.avg_embedding, rtol=1e-6)


# ------------------------------------------ round-5 deep-review pins
def test_daily_counters_roll_at_midnight(manager):
    """*_today counters reset at the day boundary — the reference never
    resets them, so every daily analytics doc after day one reported
    cumulative lifetime totals."""
    emb = np.ones(512, np.float32)
    manager.process_detection("E1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("E1", META, "cam_in", ts(3), 0.9)  # confirm
    stats = manager.campus_stats["campusA"]
    assert stats["total_entries_today"] == 1
    # forward-only roll: day boundaries are judged against wall-clock
    # "today", so past-stamped timestamps never reset
    manager._maybe_roll_day(ts(0) + datetime.timedelta(days=1))
    assert manager.campus_stats["campusA"]["total_entries_today"] == 1
    tomorrow = (datetime.datetime.now() + datetime.timedelta(days=1))
    manager._maybe_roll_day(tomorrow)
    assert stats["total_entries_today"] == 0
    assert manager.people_states["E1"].total_entries_today == 0
    # still inside — presence state is NOT daily
    assert stats["current_inside"] == 1


def test_flush_requeues_on_backend_failure(manager):
    """A transient store failure must not drop the pending batch — the
    next flush cycle retries it."""
    manager.process_detection("E1", META, "cam_in", ts(0), 0.9)
    manager.process_detection("E1", META, "cam_in", ts(3), 0.9)
    assert manager.pending_events
    real = manager.ds.people_status.bulk_write
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise ConnectionError("store bounced")

    manager.ds.people_status.bulk_write = boom
    with pytest.raises(ConnectionError):
        manager.flush()
    assert calls["n"] == 1
    assert manager.pending_updates and manager.pending_events
    manager.ds.people_status.bulk_write = real
    manager.flush()  # retry succeeds, queues drain
    assert not manager.pending_updates and not manager.pending_events
    assert manager.ds.campus_events.count_documents({}) >= 1


def test_state_reload_prefers_most_recent_campus_doc(store_cfg):
    """One status doc may exist per (person, campus); reload must resume
    the most recently seen one, not iteration-order-last, and must not
    resume yesterday's *_today counters."""
    ds = Datastore(store_cfg)
    old = datetime.datetime(2026, 8, 15, 9, 0, 0)
    new = datetime.datetime(2026, 8, 16, 9, 0, 0)
    ds.people_status.insert_one({
        "person_id": "P", "campus_id": "campusOLD", "status": "inside",
        "metadata": META, "last_seen_time": old,
        "total_entries_today": 5, "total_exits_today": 4})
    ds.people_status.insert_one({
        "person_id": "P", "campus_id": "campusNEW", "status": "inside",
        "metadata": META, "last_seen_time": new,
        "total_entries_today": 2, "total_exits_today": 1})
    m = CampusPeopleManager(ds, start_background=False)
    state = m.people_states["P"]
    assert state.campus_id == "campusNEW"
    # exactly one campus counted the person inside
    inside = [cid for cid, s in m.campus_stats.items()
              if s["current_inside"] > 0]
    assert inside == ["campusNEW"]
    # last_seen 2026-08-16 is before "today" (now) -> counters zeroed
    assert state.total_entries_today == 0
    assert m.campus_stats["campusNEW"]["total_entries_today"] == 0
