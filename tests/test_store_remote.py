"""fre:// wire server: one embedded store shared by multiple processes.

The reference's three processes coordinate through one MongoDB (SURVEY §0,
§5.8); store.server + store.remote reproduce that topology hermetically.
These tests run the real server (real sockets, real threads) in-process and
via the Datastore fre:// URI; one test drives a genuine second OS process.
"""

import subprocess
import sys
import threading

import pytest

from facerecognition_infrenceengine_tpu.store import documents
from facerecognition_infrenceengine_tpu.store.documents import (
    DuplicateKeyError, BulkWriteError, InsertOne, UpdateOne, DeleteOne)
from facerecognition_infrenceengine_tpu.store.gridfs import GridFS
from facerecognition_infrenceengine_tpu.store.objectid import ObjectId
from facerecognition_infrenceengine_tpu.store.remote import (
    RemoteDatabase, dumps, loads, send_frame, recv_frame)
from facerecognition_infrenceengine_tpu.store.server import StoreServer


@pytest.fixture()
def server():
    srv = StoreServer(port=0)
    srv.start()
    yield srv
    srv.stop()


@pytest.fixture()
def rdb(server):
    db = RemoteDatabase("127.0.0.1", server._port, name="testdb")
    yield db
    db.close()


def test_crud_roundtrip(rdb):
    col = rdb["people"]
    oid = col.insert_one({"name": "A", "age": 30,
                          "ref": ObjectId()}).inserted_id
    col.insert_many([{"name": "B", "age": 25}, {"name": "C", "age": 35}])

    doc = col.find_one({"_id": oid})
    assert doc["name"] == "A" and isinstance(doc["ref"], ObjectId)

    names = [d["name"] for d in col.find({}).sort("age", -1).skip(1).limit(1)]
    assert names == ["A"]
    # projection applies server-side
    slim = col.find_one({"name": "B"}, {"age": 1, "_id": 0})
    assert slim == {"age": 25}

    r = col.update_many({"age": {"$gte": 30}}, {"$set": {"senior": True}})
    assert (r.matched_count, r.modified_count) == (2, 2)
    up = col.update_one({"name": "Z"}, {"$setOnInsert": {"age": 1},
                                        "$set": {"name": "Z"}}, upsert=True)
    assert up.upserted_id is not None

    after = col.find_one_and_update(
        {"name": "B"}, {"$inc": {"age": 1}}, return_document=True)
    assert after["age"] == 26

    assert col.count_documents({"senior": True}) == 2
    assert sorted(col.distinct("name")) == ["A", "B", "C", "Z"]
    agg = col.aggregate([{"$match": {"age": {"$gte": 26}}},
                         {"$group": {"_id": None, "n": {"$sum": 1}}}])
    assert agg[0]["n"] == 3

    assert col.delete_one({"name": "Z"}).deleted_count == 1
    assert col.delete_many({}).deleted_count == 3
    assert rdb.command("ping") == {"ok": 1}
    status = rdb.command("serverStatus")
    assert status["ok"] == 1 and status["collections"]["people"] == 0


def test_unique_index_and_bulk_errors_cross_the_wire(rdb):
    col = rdb["u"]
    col.create_index("email", unique=True)
    assert "email_1" in col.index_information()
    col.insert_one({"email": "a@x"})
    with pytest.raises(DuplicateKeyError):
        col.insert_one({"email": "a@x"})

    r = col.bulk_write([
        InsertOne({"email": "b@x"}),
        UpdateOne({"email": "b@x"}, {"$set": {"ok": True}}),
        DeleteOne({"email": "missing"}),
    ])
    assert (r.inserted_count, r.modified_count, r.deleted_count) == (1, 1, 0)
    with pytest.raises(BulkWriteError) as ei:
        col.bulk_write([InsertOne({"email": "a@x"}),
                        InsertOne({"email": "never"})], ordered=True)
    details = ei.value.details
    assert details["writeErrors"][0]["index"] == 0
    assert details["nInserted"] == 0
    assert col.count_documents({"email": "never"}) == 0  # ordered stop


def test_gridfs_over_remote(rdb):
    fs = GridFS(rdb, collection="blobs")
    payload = b"x" * (300 * 1024)  # multi-chunk
    fid = fs.put(payload, filename="f.bin", companyId="c1")
    out = fs.get(fid)
    assert out.read() == payload and out.companyId == "c1"
    fs.delete(fid)
    with pytest.raises(Exception):
        fs.get(fid)


def test_job_claims_are_atomic_across_connections(server):
    """The enrollment queue's cross-process contract: concurrent claimants
    over separate connections never claim the same job twice."""
    seed = RemoteDatabase("127.0.0.1", server._port, name="testdb")
    jobs = seed["embeddingJobs"]
    for i in range(40):
        jobs.insert_one({"jobId": i, "status": "queued"})

    claims: list = []
    errors: list = []

    def worker(worker_id):
        db = RemoteDatabase("127.0.0.1", server._port, name="testdb")
        try:
            while True:
                got = db["embeddingJobs"].find_one_and_update(
                    {"status": "queued"},
                    {"$set": {"status": "claimed", "workerId": worker_id}},
                    return_document=True)
                if got is None:
                    return
                claims.append(got["jobId"])
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            db.close()

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert sorted(claims) == list(range(40))  # every job exactly once
    assert jobs.count_documents({"status": "queued"}) == 0
    seed.close()


def test_write_not_replayed_when_connection_dies_after_send(server, monkeypatch):
    """A write whose frame was fully sent but whose response was lost must
    NOT be silently retried (at-least-once would double-apply $inc); pure
    reads are replayed transparently."""
    from facerecognition_infrenceengine_tpu.store import remote as remote_mod

    db = RemoteDatabase("127.0.0.1", server._port, name="testdb")
    col = db["hits"]
    col.insert_one({"_id": "ctr", "n": 0})

    real_recv = remote_mod.recv_frame
    state = {"drop_next": False}
    me = threading.current_thread()

    def flaky_recv(sock):
        # the in-process StoreServer shares remote.recv_frame — inject the
        # fault only on this (client) thread or the server handler races us
        # for the drop and the scenario changes
        if state["drop_next"] and threading.current_thread() is me:
            state["drop_next"] = False
            real_recv(sock)  # drain the response the server DID send
            raise ConnectionError("injected: response lost after send")
        return real_recv(sock)

    monkeypatch.setattr(remote_mod, "recv_frame", flaky_recv)

    state["drop_next"] = True
    with pytest.raises((ConnectionError, OSError)):
        col.update_one({"_id": "ctr"}, {"$inc": {"n": 1}})
    # the server applied it exactly once; the client did not replay
    assert col.find_one({"_id": "ctr"})["n"] == 1

    # reads replay transparently through the same fault
    state["drop_next"] = True
    assert col.count_documents({"_id": "ctr"}) == 1
    db.close()


def test_auth_token_rejects_bad_clients():
    srv = StoreServer(port=0, token="sekrit")
    srv.start()
    try:
        with pytest.raises(ConnectionError):
            RemoteDatabase("127.0.0.1", srv._port, token="wrong")
        db = RemoteDatabase("127.0.0.1", srv._port, token="sekrit")
        db["c"].insert_one({"x": 1})
        assert db["c"].count_documents({}) == 1
        db.close()
    finally:
        srv.stop()


def test_restricted_unpickler_blocks_arbitrary_classes():
    import pickle

    evil = pickle.dumps(__import__("os").system)
    with pytest.raises(pickle.UnpicklingError):
        loads(evil)
    # data types used by documents DO roundtrip
    import datetime
    import numpy as np

    doc = {"when": datetime.datetime(2026, 1, 1),
           "id": ObjectId(), "vec": np.arange(3.0), "blob": b"\x00\x01"}
    back = loads(dumps(doc))
    assert back["when"].year == 2026 and isinstance(back["id"], ObjectId)
    assert back["vec"].tolist() == [0.0, 1.0, 2.0]


def test_server_survives_hostile_frame(server, rdb):
    """A frame whose pickle resolves a forbidden class must error out
    without executing anything or killing the connection loop."""
    import pickle
    import socket

    sock = socket.create_connection(("127.0.0.1", server._port), timeout=10)
    send_frame(sock, dumps(("auth", "")))
    assert loads(recv_frame(sock)) == ("ok", "authed")
    send_frame(sock, pickle.dumps(("testdb", "c", "insert_one",
                                   (__import__("os").system,), {})))
    status = loads(recv_frame(sock))
    assert status[0] == "err"
    sock.close()
    # server still serves the healthy client
    assert rdb.command("ping") == {"ok": 1}


def test_enrollment_worker_in_second_process(server):
    """The reference topology end to end: the API process registers an
    employee (jobs enqueued), a REAL separate worker OS process claims and
    completes the job over the wire, and the API process sees the result."""
    import cv2
    import numpy as np

    from facerecognition_infrenceengine_tpu.api import create_app
    from facerecognition_infrenceengine_tpu.core.config import Config, DBConfig
    from facerecognition_infrenceengine_tpu.domain.enrollment import JobStatus
    from facerecognition_infrenceengine_tpu.models.zoo import encode_fake_face
    from facerecognition_infrenceengine_tpu.store import Datastore

    uri = f"fre://127.0.0.1:{server._port}"
    cfg = Config(db=DBConfig(mongodb_uri=uri, database_name="bharatlytics"))
    ds = Datastore(cfg)
    app = create_app(ds, cfg)
    client = app.test_client()
    cid = client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]

    files = {}
    for pose, j in zip(("center", "left", "right"), (0.0, 0.1, 0.2)):
        ok, buf = cv2.imencode(".png", encode_fake_face(7, j))
        assert ok
        files[pose] = (f"{pose}.png", buf.tobytes(), "image/png")
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "EW1", "employeeName": "Wire Worker",
                          "companyId": cid}, files=files)
    assert r.status_code == 200

    code = (
        "import os\n"
        f"os.environ['MONGODB_URI'] = {uri!r}\n"
        "from facerecognition_infrenceengine_tpu.domain.enrollment import FaceEmbeddingWorker\n"
        "from facerecognition_infrenceengine_tpu.models.zoo import FakeFaceAnalysis\n"
        "from facerecognition_infrenceengine_tpu.store import get_datastore\n"
        "w = FaceEmbeddingWorker(get_datastore(),\n"
        "                        detector=FakeFaceAnalysis(),\n"
        "                        worker_id='wire-child')\n"
        "print('processed:', w.process_available_jobs())\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "processed: 1" in r.stdout

    job = ds.embedding_jobs.find_one({"model": "buffalo_l"})
    assert job["status"] == JobStatus.DONE.value
    assert job["workerId"] == "wire-child"
    emp = ds.employee_info.find_one({"employeeId": "EW1"})
    entry = emp["employeeEmbeddings"]["buffalo_l"]
    assert entry["status"] == "done"
    import pickle as _pickle

    stored = _pickle.loads(
        ds.employee_embeddings.get(entry["embeddingId"]).read())
    assert isinstance(stored, np.ndarray) and stored.shape == (512,)

    # close the reference's L3 loop: the serving process's gallery syncs the
    # child's enrollment through the wire store and matches a fresh capture
    from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager
    from facerecognition_infrenceengine_tpu.models.zoo import fake_embedding

    gallery = GalleryManager(ds, cfg, mesh=None)
    assert gallery.get_stats()["total_embeddings"] == 1
    scores, ids, meta = gallery.match(fake_embedding(7, 0.05)[None],
                                      company_id=cid)
    assert ids[0][0] is not None
    assert meta[ids[0][0]]["employeeId"] == "EW1"
    assert scores[0][0] > 0.9
    ds.db.close()


def test_campus_flush_and_state_resume_over_wire(server):
    """The people-count process's write batching (bulk_write of UpdateOne
    upserts + insert_many events) and restart state-resume both work against
    the wire store — the topology where counting runs as its own process."""
    import datetime

    from facerecognition_infrenceengine_tpu.core.config import Config, DBConfig
    from facerecognition_infrenceengine_tpu.domain.campus import (
        CameraType, CampusPeopleManager, PersonStatus)
    from facerecognition_infrenceengine_tpu.store import Datastore

    uri = f"fre://127.0.0.1:{server._port}"
    cfg = Config(db=DBConfig(mongodb_uri=uri))
    ds = Datastore(cfg)
    m = CampusPeopleManager(ds, cfg, start_background=False)
    m.register_camera("cam_in", "campusA", CameraType.ENTRY)

    t0 = datetime.datetime(2026, 8, 18, 9, 0, 0)
    meta = {"name": "Asha", "type": "employee", "employeeId": "E1"}
    m.process_detection("p1", meta, "cam_in", t0, 0.9)
    m.process_detection("p1", meta, "cam_in",
                        t0 + datetime.timedelta(seconds=2.5), 0.9)
    assert m.people_states["p1"].status == PersonStatus.INSIDE
    m.flush()  # bulk_write over the wire

    assert ds.campus_events.count_documents({"event_type": "entry"}) == 1
    # a fresh manager (process restart) resumes state from the wire store
    ds2 = Datastore(cfg)
    m2 = CampusPeopleManager(ds2, cfg, start_background=False)
    m2.register_camera("cam_in", "campusA", CameraType.ENTRY)
    assert m2.people_states["p1"].status == PersonStatus.INSIDE
    ds.db.close()
    ds2.db.close()


def test_datastore_fre_uri_and_second_process(tmp_path):
    """End to end: a server process persisted to disk, a Datastore in this
    process and a REAL second OS process sharing it via MONGODB_URI."""
    from facerecognition_infrenceengine_tpu.core.config import Config, DBConfig

    srv = StoreServer(port=0, persist_dir=str(tmp_path / "snap"))
    srv.start()
    uri = f"fre://127.0.0.1:{srv._port}"
    try:
        from facerecognition_infrenceengine_tpu.store import Datastore

        cfg = Config(db=DBConfig(mongodb_uri=uri, database_name="bharatlytics"))
        ds = Datastore(cfg)
        ds.companies.insert_one({"companyName": "WireCo"})
        fid = ds.employee_images.put(b"jpegish", filename="a.jpg")

        code = (
            "import os\n"
            f"os.environ['MONGODB_URI'] = {uri!r}\n"
            "from facerecognition_infrenceengine_tpu.store import get_datastore\n"
            "ds = get_datastore()\n"
            "doc = ds.companies.find_one({'companyName': 'WireCo'})\n"
            "assert doc is not None, 'doc not visible across processes'\n"
            f"assert ds.employee_images.get(__import__('facerecognition_infrenceengine_tpu.store.objectid', fromlist=['ObjectId']).ObjectId({str(fid)!r})).read() == b'jpegish'\n"
            "ds.companies.insert_one({'companyName': 'FromChild'})\n"
            "print('child-ok')\n"
        )
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=120)
        assert r.returncode == 0, r.stderr
        assert "child-ok" in r.stdout
        assert ds.companies.find_one({"companyName": "FromChild"}) is not None
        ds.db.close()
    finally:
        srv.stop()  # flushes the file:// snapshot

    # the persisted snapshot survives a server restart
    srv2 = StoreServer(port=0, persist_dir=str(tmp_path / "snap"))
    srv2.start()
    try:
        db = RemoteDatabase("127.0.0.1", srv2._port)
        assert db["companies"].count_documents({"companyName": "WireCo"}) == 1
        db.close()
    finally:
        srv2.stop()


def test_find_one_and_delete_over_wire(rdb):
    c = rdb["fad"]
    c.insert_many([{"_id": 1, "p": 2}, {"_id": 2, "p": 1}])
    got = c.find_one_and_delete({"p": {"$gte": 1}}, sort=[("p", -1)])
    assert got["_id"] == 1
    assert c.count_documents({}) == 1
    assert c.find_one_and_replace(
        {"_id": 2}, {"p": 9}, return_document=True) == {"_id": 2, "p": 9}
