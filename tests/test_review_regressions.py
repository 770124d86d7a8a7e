"""Regression tests for defects found in the round-1 code review.

Each test pins a concrete failure mode: visit reschedule self-overlap,
entity update counted against its own maxChildren, move-under-self cycle,
gallery delta-sync watermark window, enrollment self-duplicate on retry,
and worker-id claim-race uniqueness.
"""

import datetime

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.store import Datastore

JPEG = b"\xff\xd8\xff\xe0" + b"fakejpegdata" * 10


@pytest.fixture
def app():
    cfg = Config()
    return create_app(Datastore(cfg), cfg)


@pytest.fixture
def client(app):
    return app.test_client()


@pytest.fixture
def company(client):
    return client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]


def _register_host(client, cid):
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "H1", "employeeName": "Host",
                          "companyId": cid}, files=files)
    assert r.status_code == 200
    return "H1"


def test_visit_reschedule_does_not_overlap_itself(app, client, company):
    host = _register_host(client, company)
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    vid = client.post("/bharatlytics/v1/visitors/register",
                      data={"companyId": company, "visitorName": "G",
                            "phone": "9876543210", "hostEmployeeId": host},
                      files=files).get_json()["_id"]
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    start = now.isoformat()
    end = (now + datetime.timedelta(hours=1)).isoformat()
    visit = client.post(
        f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
        json_body={"companyId": company, "hostEmployeeId": str(host_doc["_id"]),
                   "expectedArrival": start, "expectedDeparture": end,
                   "purpose": "x"}).get_json()["visit"]
    # extend the same visit: new window overlaps the old one by construction
    new_end = (now + datetime.timedelta(hours=2)).isoformat()
    r = client.patch(f"/bharatlytics/v1/visitors/visits/{visit['_id']}",
                     json_body={"expectedDeparture": new_end})
    assert r.status_code == 200, r.text


def _definition_with_max_children(client, cid, max_children=2):
    tpl = client.get("/bharatlytics/v1/entities/templates").get_json()
    office = next(t for t in tpl if t["type"] == "office")
    d = client.post("/bharatlytics/v1/entity-definitions/from-template",
                    json_body={"templateId": office["_id"], "companyId": cid,
                               "name": "hq"}).get_json()
    did = d["id"]
    full = client.get(f"/bharatlytics/v1/entity-definitions/{did}").get_json()
    for rel in full["relationships"]:
        rel.setdefault("constraints", {})["maxChildren"] = max_children
    client.open(f"/bharatlytics/v1/entity-definitions/{did}", "PUT",
                json_body={"relationships": full["relationships"]})
    return did


def test_update_entity_not_counted_against_own_max_children(client, company):
    did = _definition_with_max_children(client, company, max_children=1)
    b = client.post("/bharatlytics/v1/entities",
                    json_body={"name": "B1", "type": "building",
                               "definitionId": did, "companyId": company,
                               "attributes": {"buildingCode": "BLD001",
                                              "address": "x"}}).get_json()
    f = client.post("/bharatlytics/v1/entities",
                    json_body={"name": "F1", "type": "floor",
                               "definitionId": did, "companyId": company,
                               "parentId": b["id"],
                               "attributes": {"floorNumber": "1"}}).get_json()
    assert "id" in f, f
    # parent is now at maxChildren=1; renaming the existing child must pass
    r = client.open(f"/bharatlytics/v1/entities/{f['id']}", "PUT",
                    json_body={"name": "F1-renamed"})
    assert r.status_code == 200, r.text
    # but a second child is still rejected
    r2 = client.post("/bharatlytics/v1/entities",
                     json_body={"name": "F2", "type": "floor",
                                "definitionId": did, "companyId": company,
                                "parentId": b["id"],
                                "attributes": {"floorNumber": "2"}})
    assert r2.status_code == 400


def test_move_entity_under_itself_rejected(client, company):
    did = _definition_with_max_children(client, company, max_children=50)
    b = client.post("/bharatlytics/v1/entities",
                    json_body={"name": "B1", "type": "building",
                               "definitionId": did, "companyId": company,
                               "attributes": {"buildingCode": "BLD001",
                                              "address": "x"}}).get_json()
    r = client.post(f"/bharatlytics/v1/entities/{b['id']}/move",
                    json_body={"newParentId": b["id"]})
    assert r.status_code == 400
    assert "itself" in r.get_json()["error"]


def test_gallery_sync_watermark_covers_inflight_updates(app):
    """Docs updated while a sync runs must be picked up by the NEXT sync."""
    from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager

    ds = app.datastore
    cfg = app.config_tree
    gallery = GalleryManager(ds, cfg)
    real_find = ds.employee_info.find
    inserted = {}

    def find_and_then_insert(*args, **kwargs):
        result = real_find(*args, **kwargs)
        if not inserted:
            # simulate an enrollment landing mid-sync, after the query ran
            import pickle

            from facerecognition_infrenceengine_tpu.api.utils import get_current_utc
            from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

            vec = np.random.default_rng(0).normal(size=512).astype(np.float32)
            blob_id = ds.employee_embeddings.put(pickle.dumps(vec), filename="e")
            ds.employee_info.insert_one({
                "employeeId": "E9", "employeeName": "Late",
                "companyId": ObjectId(), "status": "active",
                "blacklisted": False, "lastUpdated": get_current_utc(),
                "employeeEmbeddings": {"buffalo_l": {
                    "status": "done", "embeddingId": blob_id}},
            })
            inserted["done"] = True
        return result

    ds.employee_info.find = find_and_then_insert
    try:
        gallery.force_sync()  # the insert lands after this sync's query
    finally:
        ds.employee_info.find = real_find
    assert len(gallery.embeddings) == 0  # missed by THIS sync, as expected
    gallery.force_sync()
    assert len(gallery.embeddings) == 1  # watermark re-covered the window


def test_enrollment_retry_not_self_duplicate(app, client, company):
    from facerecognition_infrenceengine_tpu.domain.enrollment import (
        FaceEmbeddingWorker, JobStatus)
    from facerecognition_infrenceengine_tpu.models.zoo import (
        FakeFaceAnalysis, encode_fake_face)
    import cv2

    def png(seed, j):
        ok, buf = cv2.imencode(".png", encode_fake_face(seed, j))
        return buf.tobytes()

    files = {p: (f"{p}.png", png(55, j), "image/png")
             for p, j in zip(("center", "left", "right"), (0.0, 0.1, 0.2))}
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "E1", "employeeName": "P",
                          "companyId": company}, files=files)
    assert r.status_code == 200
    ds = app.datastore
    worker = FaceEmbeddingWorker(ds, app.config_tree, detector=FakeFaceAnalysis())
    assert worker.process_available_jobs() == 1
    job = ds.embedding_jobs.find_one({"model": "buffalo_l"})
    assert job["status"] == JobStatus.DONE.value
    # simulate a crash-after-store: requeue the job and reprocess
    ds.embedding_jobs.update_one({"_id": job["_id"]},
                                 {"$set": {"status": "queued", "retries": 1}})
    assert worker.process_available_jobs() == 1
    job2 = ds.embedding_jobs.find_one({"_id": job["_id"]})
    assert job2["status"] == JobStatus.DONE.value, job2.get("error")
    emp = ds.employee_info.find_one({"employeeId": "E1"})
    assert emp["status"] != "pending_duplicate_removal"


def test_worker_ids_unique_by_default(app):
    from facerecognition_infrenceengine_tpu.domain.enrollment import (
        FaceEmbeddingWorker)
    from facerecognition_infrenceengine_tpu.models.zoo import FakeFaceAnalysis

    ds = app.datastore
    w1 = FaceEmbeddingWorker(ds, app.config_tree, detector=FakeFaceAnalysis())
    w2 = FaceEmbeddingWorker(ds, app.config_tree, detector=FakeFaceAnalysis())
    assert w1.worker_id != w2.worker_id


# ---------------------------------------------------------- third review


def test_reporting_tree_cycle_terminates(client, company):
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    for emp, boss in (("A", "B"), ("B", "A")):
        r = client.post("/bharatlytics/v1/employees/register",
                        data={"employeeId": emp, "employeeName": emp,
                              "companyId": company,
                              "employeeReportingId": boss}, files=files)
        assert r.status_code == 200
    r = client.get(f"/bharatlytics/v1/employees/reporting-tree/A?companyId={company}")
    assert r.status_code == 200  # would RecursionError/500 without the guard
    tree = r.get_json()
    assert tree["reportees"][0]["employeeId"] == "B"
    assert tree["reportees"][0]["reportees"] == []  # cycle cut, not recursed


def test_employee_search_with_regex_metacharacters(client, company):
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    client.post("/bharatlytics/v1/employees/register",
                data={"employeeId": "E(1)", "employeeName": "Paren (Person)",
                      "companyId": company}, files=files)
    r = client.get(f"/bharatlytics/v1/employees/search?companyId={company}&search=(")
    assert r.status_code == 200  # unescaped '(' would raise re.error -> 500
    r2 = client.get(f"/bharatlytics/v1/employees/search?companyId={company}&search=.*")
    assert r2.status_code == 200
    assert r2.get_json()["employees"] == []  # '.*' is literal, matches nothing


def test_update_entity_reparent_rewrites_paths(client, company):
    tpl = client.get("/bharatlytics/v1/entities/templates").get_json()
    office = next(t for t in tpl if t["type"] == "office")
    did = client.post("/bharatlytics/v1/entity-definitions/from-template",
                      json_body={"templateId": office["_id"],
                                 "companyId": company, "name": "hq"}
                      ).get_json()["id"]

    def mk(name, etype, attrs, parent=None):
        body = {"name": name, "type": etype, "definitionId": did,
                "companyId": company, "attributes": attrs}
        if parent:
            body["parentId"] = parent
        r = client.post("/bharatlytics/v1/entities", json_body=body)
        assert r.status_code == 201, r.text
        return r.get_json()["id"]

    b1 = mk("B1", "building", {"buildingCode": "BLD001", "address": "x"})
    b2 = mk("B2", "building", {"buildingCode": "BLD002", "address": "y"})
    f1 = mk("F1", "floor", {"floorNumber": "1"}, parent=b1)
    z1 = mk("Z1", "zone", {"zoneCode": "Z001", "purpose": "workspace"}, parent=f1)

    # re-parent F1 under B2 via PUT (not /move) — subtree paths must follow
    r = client.open(f"/bharatlytics/v1/entities/{f1}", "PUT",
                    json_body={"parentId": b2})
    assert r.status_code == 200, r.text
    desc = client.get(f"/bharatlytics/v1/entities/{b2}/descendants").get_json()
    ids = {d["_id"]["$oid"] if isinstance(d["_id"], dict) else d["_id"]
           for d in desc}
    assert f1 in ids and z1 in ids  # zone followed its floor
    old_desc = client.get(f"/bharatlytics/v1/entities/{b1}/descendants").get_json()
    assert old_desc == []


def test_schedule_visit_defaults_nonzero_window(app, client, company):
    import datetime as dt

    host = _register_host(client, company)
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    vid = client.post("/bharatlytics/v1/visitors/register",
                      data={"companyId": company, "visitorName": "G",
                            "phone": "9876543210", "hostEmployeeId": host},
                      files=files).get_json()["_id"]
    start = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    r = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                    json_body={"companyId": company,
                               "hostEmployeeId": str(host_doc["_id"]),
                               "expectedArrival": start.isoformat()})
    assert r.status_code == 201, r.text
    visit = r.get_json()["visit"]
    arr = visit["expectedArrival"]
    dep = visit["expectedDeparture"]
    assert dep > arr  # zero-length window would make every QR scan "expired"


def test_reregistration_cleans_superseded_blobs(app, client, company):
    ds = app.datastore
    files = {p: (f"{p}.jpg", JPEG + bytes([i]), "image/jpeg")
             for i, p in enumerate(("center", "left", "right"))}
    client.post("/bharatlytics/v1/employees/register",
                data={"employeeId": "E1", "employeeName": "P",
                      "companyId": company}, files=files)
    ds.employee_info.update_one({"employeeId": "E1"},
                                {"$set": {"status": "inactive"}})
    old = ds.employee_info.find_one({"employeeId": "E1"})
    old_image_ids = list(old["employeeImages"].values())
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "E1", "employeeName": "P",
                          "companyId": company}, files=files)
    assert r.status_code == 200, r.text
    for oid in old_image_ids:
        with pytest.raises(Exception):
            ds.employee_images.get(oid)  # superseded blob deleted
    fresh = ds.employee_info.find_one({"employeeId": "E1"})
    for pose_id in fresh["employeeImages"].values():
        assert ds.employee_images.get(pose_id).read()  # new blobs live


def test_counting_empty_gallery_guard_on_batcher_path(app):
    from facerecognition_infrenceengine_tpu.domain.campus import CampusPeopleManager
    from facerecognition_infrenceengine_tpu.domain.counting import CountingProcessor
    from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager
    from facerecognition_infrenceengine_tpu.models.zoo import Face

    ds = app.datastore
    gallery = GalleryManager(ds, app.config_tree)
    manager = CampusPeopleManager(ds, app.config_tree, start_background=False)
    proc = CountingProcessor(gallery, manager, cfg=app.config_tree)
    face = Face(bbox=np.array([0, 0, 10, 10], np.float32), det_score=0.9,
                kps=np.zeros((5, 2), np.float32))
    face.normed_embedding = np.ones(512, np.float32) / np.sqrt(512)
    stats = proc.process_faces([face], "cam-entry")
    assert stats["unknown"] == 0  # empty gallery: no phantom unknown clusters
    manager.stop()
