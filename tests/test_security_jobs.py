"""Round-2 regression tests: embedding-blob hardening + job-queue guards.

Covers the advisor findings: (a) /register with embeddingAttached must not
accept pickles that execute code (restricted unpickler at the boundary and
on every load); (b) hard-deleted people must leave the running gallery at
the next sync; (c) the duplicate scan must ignore non-done embedding
entries; (d) re-registration must not stack duplicate jobs, and attaching
an embedding must not queue a job that would overwrite it.
"""

import pickle

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.core.serialization import (
    deserialize_embedding,
    serialize_embedding,
)
from facerecognition_infrenceengine_tpu.domain.enrollment import FaceEmbeddingWorker
from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager
from facerecognition_infrenceengine_tpu.models.zoo import FakeFaceAnalysis
from facerecognition_infrenceengine_tpu.store import Datastore, ObjectId

JPEG = b"\xff\xd8\xff\xe0" + b"fakejpegdata" * 10


class _Evil:
    """Pickles to a payload that would call a function on unpickle."""

    def __reduce__(self):
        return (print, ("pwned",))


@pytest.fixture
def app():
    cfg = Config()
    ds = Datastore(cfg)
    return create_app(ds, cfg)


@pytest.fixture
def client(app):
    return app.test_client()


def seed_company(client):
    return client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]


def register(client, cid, emp_id="E001", files_extra=None, **extra):
    data = {"employeeId": emp_id, "employeeName": "Asha Rao",
            "companyId": cid, **extra}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg")
             for p in ("center", "left", "right")}
    if files_extra:
        files.update(files_extra)
    return client.post("/bharatlytics/v1/employees/register",
                       data=data, files=files)


# ------------------------------------------------------- serialization unit
def test_deserialize_roundtrip():
    vec = np.random.default_rng(0).normal(size=512).astype(np.float32)
    out = deserialize_embedding(serialize_embedding(vec))
    np.testing.assert_array_equal(out, vec)
    # plain pickle of a float64 vector (cross-version blobs) also loads
    out = deserialize_embedding(pickle.dumps(vec.astype(np.float64)))
    np.testing.assert_allclose(out, vec, rtol=1e-6)


def test_deserialize_rejects_malicious_and_malformed():
    for blob in (
        pickle.dumps(_Evil()),            # code-executing payload
        pickle.dumps([1.0] * 512),        # not an ndarray
        pickle.dumps(np.array(["x"])),    # non-numeric dtype
        pickle.dumps(np.zeros(100000, np.float32)),  # implausible size
        pickle.dumps(np.array([np.nan] * 512, np.float32)),  # non-finite
        b"not a pickle at all",
    ):
        with pytest.raises(Exception):
            deserialize_embedding(blob)


# ------------------------------------------------------------- API boundary
def test_register_rejects_malicious_embedding_blob(app, client):
    cid = seed_company(client)
    blob = pickle.dumps(_Evil())
    r = register(client, cid,
                 files_extra={"embedding": ("e.pkl", blob, "application/octet-stream")},
                 embeddingAttached="true", embeddingVersion="buffalo_l")
    assert r.status_code == 400
    assert "valid embedding" in r.get_json()["error"]
    # nothing stored, no jobs queued for a failed registration attempt
    assert app.datastore.employee_info.find_one({"employeeId": "E001"}) is None


def test_attached_model_not_queued(app, client):
    cid = seed_company(client)
    vec = np.random.default_rng(1).normal(size=512).astype(np.float32)
    r = register(client, cid,
                 files_extra={"embedding": ("e.pkl", serialize_embedding(vec),
                                            "application/octet-stream")},
                 embeddingAttached="true", embeddingVersion="buffalo_l")
    assert r.status_code == 200
    assert r.get_json()["embeddingStatus"]["buffalo_l"] == "done"
    jobs = list(app.datastore.embedding_jobs.find({}))
    # only the non-attached model gets a job; the worker must not recompute
    # and overwrite the client-attached 'done' embedding
    assert {j["model"] for j in jobs} == {"mobile_facenet_v1"}


def test_reregistration_does_not_stack_jobs(app, client):
    cid = seed_company(client)
    assert register(client, cid).status_code == 200
    jobs = list(app.datastore.embedding_jobs.find({}))
    assert len(jobs) == 2
    # archive the employee (active ones are 409 on re-register by contract),
    # keeping the enrollment jobs queued — mid-enrollment re-registration
    app.datastore.employee_info.update_one(
        {"employeeId": "E001"}, {"$set": {"status": "archived"}})
    # re-register: the existing queued jobs will process the new images;
    # no duplicate jobs may stack (reference employee.py:164-165 guard)
    assert register(client, cid).status_code == 200
    jobs = list(app.datastore.embedding_jobs.find({}))
    assert len(jobs) == 2
    assert all(j["status"] == "queued" for j in jobs)


# ------------------------------------------------------------------ gallery
def _seed_enrolled_employee(ds, cid, emp_id, vec):
    emb_id = ds.employee_embeddings.put(
        serialize_embedding(vec), filename=f"{emp_id}.pkl",
        metadata={}, model="buffalo_l", type="embedding")
    import datetime as _dt
    now = _dt.datetime.now(_dt.timezone.utc)
    res = ds.employee_info.insert_one({
        "companyId": ObjectId(cid), "employeeId": emp_id,
        "employeeName": emp_id, "status": "active", "blacklisted": False,
        "employeeEmbeddings": {"buffalo_l": {
            "embeddingId": emb_id, "status": "done"}},
        "lastUpdated": now,
    })
    return res.inserted_id


def test_hard_delete_evicts_from_running_gallery(client, app):
    ds = app.datastore
    cid = seed_company(client)
    vec = np.random.default_rng(2).normal(size=512).astype(np.float32)
    doc_id = _seed_enrolled_employee(ds, cid, "E1", vec)
    gm = GalleryManager(ds, app.config_obj if hasattr(app, "config_obj") else None)
    assert str(doc_id) in gm.embeddings
    # hard delete: the doc disappears entirely (reference employee.py:457)
    ds.employee_info.delete_one({"_id": doc_id})
    gm.force_sync()
    assert str(doc_id) not in gm.embeddings


def test_duplicate_scan_ignores_non_done_entries(client, app):
    ds = app.datastore
    cid = seed_company(client)
    vec = np.random.default_rng(3).normal(size=512).astype(np.float32)
    vec /= np.linalg.norm(vec)
    doc_id = _seed_enrolled_employee(ds, cid, "E1", vec)
    worker = FaceEmbeddingWorker(ds, detector=FakeFaceAnalysis())
    # done entry -> duplicate detected
    dup, _ = worker._check_duplicate_face(vec, ObjectId(cid),
                                          ds.employee_info, "employee")
    assert dup
    # flip the entry to failed: leftover blob must no longer count
    ds.employee_info.update_one(
        {"_id": doc_id},
        {"$set": {"employeeEmbeddings.buffalo_l.status": "failed"}})
    dup, _ = worker._check_duplicate_face(vec, ObjectId(cid),
                                          ds.employee_info, "employee")
    assert not dup
