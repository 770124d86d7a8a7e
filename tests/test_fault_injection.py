"""Fault injection against the recovery semantics (SURVEY §5.3).

The reference's strongest subsystem is claim-based work stealing +
heartbeat/stuck-job recovery (trainingServer.py:457-513), but it ships no
tests and no fault injection.  These tests inject REAL faults — a SIGKILLed
worker OS process, a store-server restart under a live client — and assert
the system heals the way the design promises.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

from facerecognition_infrenceengine_tpu.store.remote import RemoteDatabase
from facerecognition_infrenceengine_tpu.store.server import StoreServer


def test_sigkilled_worker_job_recovered_by_peer(tmp_path):
    """A worker dies mid-job (kill -9, no cleanup): the job is stuck in
    'started'.  A peer worker's stuck-job scan requeues it and completes it
    — the reference's work-stealing contract, across real OS processes."""
    import cv2

    from facerecognition_infrenceengine_tpu.api import create_app
    from facerecognition_infrenceengine_tpu.core.config import (
        Config, DBConfig, WorkerConfig)
    from facerecognition_infrenceengine_tpu.domain.enrollment import (
        FaceEmbeddingWorker, JobStatus)
    from facerecognition_infrenceengine_tpu.models.zoo import (
        FakeFaceAnalysis, encode_fake_face)
    from facerecognition_infrenceengine_tpu.store import Datastore

    srv = StoreServer(port=0)
    srv.start()
    uri = f"fre://127.0.0.1:{srv._port}"
    try:
        cfg = Config(db=DBConfig(mongodb_uri=uri))
        ds = Datastore(cfg)
        client = create_app(ds, cfg).test_client()
        cid = client.post(
            "/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]
        files = {}
        for pose, j in zip(("center", "left", "right"), (0.0, 0.1, 0.2)):
            ok, buf = cv2.imencode(".png", encode_fake_face(3, j))
            assert ok
            files[pose] = (f"{pose}.png", buf.tobytes(), "image/png")
        assert client.post(
            "/bharatlytics/v1/employees/register",
            data={"employeeId": "EK1", "employeeName": "Kill Nine",
                  "companyId": cid}, files=files).status_code == 200

        # victim worker: claims the job, then its detector hangs forever
        victim_code = (
            "import os, time\n"
            f"os.environ['MONGODB_URI'] = {uri!r}\n"
            "from facerecognition_infrenceengine_tpu.domain.enrollment import FaceEmbeddingWorker\n"
            "from facerecognition_infrenceengine_tpu.models.zoo import FakeFaceAnalysis\n"
            "from facerecognition_infrenceengine_tpu.store import get_datastore\n"
            "class Hang(FakeFaceAnalysis):\n"
            "    def get(self, frame):\n"
            "        time.sleep(3600)\n"
            "w = FaceEmbeddingWorker(get_datastore(), detector=Hang(),\n"
            "                        worker_id='victim')\n"
            "w.process_available_jobs()\n"
        )
        victim = subprocess.Popen([sys.executable, "-c", victim_code])
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                job = ds.embedding_jobs.find_one({"model": "buffalo_l"})
                if job and job["status"] == JobStatus.STARTED.value:
                    break
                time.sleep(0.2)
            else:
                pytest.fail("victim never claimed the job")
            assert job["workerId"] == "victim"
        finally:
            victim.kill()  # SIGKILL: no atexit, no cleanup, job left 'started'
            victim.wait(timeout=30)

        # peer worker with an immediate stuck cutoff steals and finishes it
        peer_cfg = Config(db=DBConfig(mongodb_uri=uri),
                          worker=WorkerConfig(stuck_job_timeout_s=0.0))
        peer = FaceEmbeddingWorker(Datastore(peer_cfg), peer_cfg,
                                   detector=FakeFaceAnalysis(),
                                   worker_id="peer")
        peer._recover_stuck_jobs()
        job = ds.embedding_jobs.find_one({"model": "buffalo_l"})
        assert job["status"] == JobStatus.QUEUED.value
        assert job["retryCount"] == 1
        assert peer.process_available_jobs() == 1
        job = ds.embedding_jobs.find_one({"model": "buffalo_l"})
        assert job["status"] == JobStatus.DONE.value
        assert job["workerId"] == "peer"
        emp = ds.employee_info.find_one({"employeeId": "EK1"})
        assert emp["employeeEmbeddings"]["buffalo_l"]["status"] == "done"
        ds.db.close()
    finally:
        srv.stop()


def test_camera_auto_stops_after_consecutive_read_errors(monkeypatch):
    """A dead camera (every read fails) must stop its own thread after
    max_camera_errors consecutive failures (reference peopleCount.py:944-958)
    instead of spinning forever."""
    import cv2

    from facerecognition_infrenceengine_tpu.core.config import (
        CampusConfig, Config)
    from facerecognition_infrenceengine_tpu.domain.campus import (
        CameraType, CampusPeopleManager)
    from facerecognition_infrenceengine_tpu.domain.counting import (
        CameraStreamManager)
    from facerecognition_infrenceengine_tpu.store import Datastore

    class DeadCapture:
        released = False

        def __init__(self, source):
            pass

        def isOpened(self):
            return True

        def read(self):
            return False, None

        def release(self):
            DeadCapture.released = True

    monkeypatch.setattr(cv2, "VideoCapture", DeadCapture)
    monkeypatch.setattr(time, "sleep", lambda s: None)  # skip 1 s backoffs

    cfg = Config(campus=CampusConfig(max_camera_errors=3))
    ds = Datastore(cfg)
    manager = CampusPeopleManager(ds, cfg, start_background=False)
    streams = CameraStreamManager(gallery=None, manager=manager, cfg=cfg)
    streams.start_camera("cam_dead", "rtsp://nowhere", "campusA",
                         CameraType.ENTRY)
    thread = streams.camera_threads["cam_dead"]
    thread.join(timeout=30)
    assert not thread.is_alive(), "camera thread kept spinning on a dead feed"
    assert DeadCapture.released
    streams.stop_all()


def test_client_survives_store_server_restart(tmp_path):
    """A store-server bounce under a live client: the persisted snapshot
    reloads and the client's next call reconnects transparently."""
    d = str(tmp_path / "snap")
    srv = StoreServer(port=0, persist_dir=d)
    srv.start()
    port = srv._port
    db = RemoteDatabase("127.0.0.1", port)
    db["c"].insert_one({"x": 1})
    srv.stop()  # flushes the snapshot, closes every connection

    srv2 = StoreServer(port=port, persist_dir=d)
    srv2.start()
    try:
        # same handle: the dead socket is detected and reconnected once
        assert db["c"].count_documents({"x": 1}) == 1
        db["c"].insert_one({"x": 2})
        assert db["c"].count_documents({}) == 2
        db.close()
    finally:
        srv2.stop()


def test_kill_dash_nine_store_server_loses_nothing_flushed(tmp_path):
    """SIGKILL the server PROCESS (not stop()): everything since the last
    periodic flush is gone by design, but the on-disk snapshot stays
    consistent and loads — no torn pickle, no partial state."""
    d = str(tmp_path / "snap")
    code = (
        "import sys\n"
        "from facerecognition_infrenceengine_tpu.store.server import StoreServer\n"
        f"srv = StoreServer(port=0, persist_dir={d!r})\n"
        "host, port = srv.start()\n"
        "print(port, flush=True)\n"
        "import time; time.sleep(3600)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True)
    try:
        port = int(proc.stdout.readline())
        db = RemoteDatabase("127.0.0.1", port)
        db["c"].insert_one({"x": 1})
        db.flush()  # server-side durable point
        db["c"].insert_one({"x": 2})  # may or may not survive — torn is the bug
    finally:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

    from facerecognition_infrenceengine_tpu.store.documents import Database

    reloaded = Database("bharatlytics", persist_dir=d)
    n = reloaded["c"].count_documents({})
    assert n >= 1  # the flushed write is never lost
    assert reloaded["c"].find_one({"x": 1}) is not None
    reloaded.close()
