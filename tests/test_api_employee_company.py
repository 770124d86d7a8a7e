"""Contract tests: employee + company REST endpoints against the embedded
store, exercising the reference's documented flows end-to-end."""

import pickle

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.store import Datastore, ObjectId

JPEG = b"\xff\xd8\xff\xe0" + b"fakejpegdata" * 10


@pytest.fixture
def app(store_cfg):
    # fresh isolated store per test; store_cfg (conftest) runs the whole
    # suite over BOTH the embedded store and the fre:// wire server
    ds = Datastore(store_cfg)
    return create_app(ds, store_cfg)


@pytest.fixture
def client(app):
    return app.test_client()


def seed_company(client):
    r = client.post("/bharatlytics/v1/companies/seed")
    assert r.status_code == 201
    return r.get_json()["company"]["_id"]


def register_employee(client, company_id, emp_id="E001", **extra):
    data = {"employeeId": emp_id, "employeeName": "Asha Rao",
            "companyId": company_id, **extra}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    return client.post("/bharatlytics/v1/employees/register", data=data, files=files)


def test_company_crud(client):
    r = client.post("/bharatlytics/v1/companies", json_body={"companyName": "Acme"})
    assert r.status_code == 201
    cid = r.get_json()["company"]["_id"]
    # duplicate name
    assert client.post("/bharatlytics/v1/companies",
                       json_body={"companyName": "Acme"}).status_code == 409
    # get / list / patch
    assert client.get(f"/bharatlytics/v1/companies/{cid}").get_json()[
        "company"]["companyName"] == "Acme"
    assert len(client.get("/bharatlytics/v1/companies").get_json()["companies"]) == 1
    r = client.patch(f"/bharatlytics/v1/companies/{cid}",
                     json_body={"phone": "123"})
    assert r.get_json()["company"]["phone"] == "123"
    # delete requires admin token
    assert client.delete(f"/bharatlytics/v1/companies/{cid}").status_code == 401
    assert client.delete(f"/bharatlytics/v1/companies/{cid}",
                         headers={"X-Admin-Token": "t"}).status_code == 200
    assert client.get(f"/bharatlytics/v1/companies/{cid}").status_code == 404


def test_company_subresources(client):
    cid = seed_company(client)
    r = client.post(f"/bharatlytics/v1/companies/{cid}/designations",
                    json_body={"designations": ["CTO"]})
    assert r.status_code == 200
    r = client.post(f"/bharatlytics/v1/companies/{cid}/infrastructure",
                    json_body={"infrastructure": {"type": "Office"}})
    assert r.status_code == 200
    company = client.get(f"/bharatlytics/v1/companies/{cid}").get_json()["company"]
    assert company["designations"] == ["CTO"]
    assert company["infrastructure"] == {"type": "Office"}


def test_employee_register_queues_jobs(app, client):
    cid = seed_company(client)
    r = register_employee(client, cid)
    assert r.status_code == 200, r.text
    body = r.get_json()
    assert body["message"] == "Employee registration queued"
    assert body["embeddingStatus"] == {"buffalo_l": "queued",
                                       "mobile_facenet_v1": "queued"}
    ds = app.datastore
    jobs = list(ds.embedding_jobs.find({}))
    assert len(jobs) == 2
    assert {j["model"] for j in jobs} == {"buffalo_l", "mobile_facenet_v1"}
    assert all(j["status"] == "queued" for j in jobs)
    emp = ds.employee_info.find_one({"employeeId": "E001"})
    assert set(emp["employeeImages"]) == {"center", "left", "right"}
    # images retrievable over the API
    img_id = emp["employeeImages"]["center"]
    r = client.get(f"/bharatlytics/v1/employees/images/{img_id}")
    assert r.status_code == 200 and r.data == JPEG


def test_employee_register_validation(client):
    cid = seed_company(client)
    # missing pose
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "E1", "employeeName": "X", "companyId": cid},
                    files={"center": ("c.jpg", JPEG, "image/jpeg")})
    assert r.status_code == 400
    assert "pose" in r.get_json()["error"]
    # bad email
    r = register_employee(client, cid, emp_id="E2", employeeEmail="nope")
    assert r.status_code == 400
    # bad phone
    r = register_employee(client, cid, emp_id="E3", employeeMobile="12345")
    assert r.status_code == 400
    # duplicate active employee
    assert register_employee(client, cid, emp_id="E4").status_code == 200
    assert register_employee(client, cid, emp_id="E4").status_code == 409


def test_employee_email_uniqueness(client):
    cid = seed_company(client)
    assert register_employee(client, cid, emp_id="E1",
                             employeeEmail="a@x.com").status_code == 200
    r = register_employee(client, cid, emp_id="E2", employeeEmail="a@x.com")
    assert r.status_code == 409


def test_employee_list_and_fields(client):
    cid = seed_company(client)
    register_employee(client, cid, emp_id="E1", employeeEmail="a@x.com")
    register_employee(client, cid, emp_id="E2")
    r = client.get(f"/bharatlytics/v1/employees/?companyId={cid}")
    out = r.get_json()
    assert len(out) == 2
    assert {e["employeeId"] for e in out} == {"E1", "E2"}
    # single + images urls
    r = client.get(f"/bharatlytics/v1/employees/?companyId={cid}"
                   f"&employeeId=E1&fetchImages=true")
    out = r.get_json()
    assert len(out) == 1
    assert "center" in out[0]["employeeImages"]
    assert out[0]["employeeImages"]["center"].startswith(
        "/bharatlytics/v1/employees/images/")


def test_employee_update_and_delete(app, client):
    cid = seed_company(client)
    register_employee(client, cid, emp_id="E1")
    r = client.patch("/bharatlytics/v1/employees/update",
                     json_body={"employeeId": "E1", "companyId": cid,
                                "employeeDesignation": "Lead"})
    assert r.status_code == 200
    emp = app.datastore.employee_info.find_one({"employeeId": "E1"})
    assert emp["employeeDesignation"] == "Lead"
    # soft delete archives
    r = client.delete("/bharatlytics/v1/employees/delete",
                      json_body={"employeeId": "E1", "companyId": cid})
    assert r.status_code == 200
    emp = app.datastore.employee_info.find_one({"employeeId": "E1"})
    assert emp["status"] == "archived"
    # archived employees are hidden from listing
    out = client.get(f"/bharatlytics/v1/employees/?companyId={cid}").get_json()
    assert out == []
    # hard delete removes doc + gridfs blobs
    img_ids = list(emp["employeeImages"].values())
    r = client.delete("/bharatlytics/v1/employees/delete",
                      json_body={"employeeId": "E1", "companyId": cid,
                                 "mode": "hard"})
    assert r.status_code == 200
    assert app.datastore.employee_info.find_one({"employeeId": "E1"}) is None
    for iid in img_ids:
        assert not app.datastore.employee_images.exists(iid)


def test_employee_embedding_attach_and_serve(app, client):
    cid = seed_company(client)
    vec = np.random.default_rng(0).normal(size=512).astype(np.float32)
    blob = pickle.dumps(vec)
    data = {"employeeId": "E1", "employeeName": "X", "companyId": cid,
            "embeddingAttached": "true", "embeddingVersion": "buffalo_l"}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg")
             for p in ("center", "left", "right")}
    files["embedding"] = ("e.pkl", blob, "application/octet-stream")
    r = client.post("/bharatlytics/v1/employees/register", data=data, files=files)
    assert r.status_code == 200
    assert r.get_json()["embeddingStatus"]["buffalo_l"] == "done"
    emp = app.datastore.employee_info.find_one({"employeeId": "E1"})
    emb_id = emp["employeeEmbeddings"]["buffalo_l"]["embeddingId"]
    r = client.get(f"/bharatlytics/v1/employees/embeddings/{emb_id}")
    assert r.status_code == 200
    np.testing.assert_array_equal(pickle.loads(r.data), vec)
    # invalid id format
    assert client.get("/bharatlytics/v1/employees/embeddings/zzz").status_code == 400


def test_audit_logs_auth(client):
    cid = seed_company(client)
    register_employee(client, cid)
    assert client.get("/bharatlytics/v1/employees/audit-logs").status_code == 401
    r = client.get("/bharatlytics/v1/employees/audit-logs",
                   headers={"X-Auth-Token": "t"})
    assert r.status_code == 200
    logs = r.get_json()
    assert logs and logs[0]["action"] == "register"


def test_rate_limit(client):
    cfg = Config()
    cfg.api.rate_limit_requests = 3
    from facerecognition_infrenceengine_tpu.store import Datastore
    from facerecognition_infrenceengine_tpu.api import create_app as mk

    app = mk(Datastore(cfg), cfg)
    c = app.test_client()
    codes = [c.get("/bharatlytics/v1/employees/?companyId=x").status_code
             for _ in range(5)]
    assert codes[:3] == [200, 200, 200]  # empty result but allowed through
    assert codes[3:] == [429, 429]


def test_health(client):
    assert client.get("/bharatlytics/v1/health").get_json() == {"status": "ok"}


# ------------------------------------------ round-5 deep-review pins
def test_archived_employee_can_reregister(app, client):
    """Soft delete (archive) must not permanently block the employeeId:
    re-registration after archival is the reactivation path, even when the
    old enrollment finished ('done')."""
    cid = seed_company(client)
    register_employee(client, cid, emp_id="EARCH")
    ds = app.datastore
    # simulate a finished enrollment before the archive
    ds.employee_info.update_one(
        {"employeeId": "EARCH"},
        {"$set": {"employeeEmbeddings.buffalo_l.status": "done"}})
    r = client.delete("/bharatlytics/v1/employees/delete",
                      json_body={"employeeId": "EARCH", "companyId": cid})
    assert r.status_code == 200
    r = register_employee(client, cid, emp_id="EARCH")
    assert r.status_code == 200, r.text
    emp = ds.employee_info.find_one({"employeeId": "EARCH"})
    assert emp["status"] == "active"
    # a genuinely active employee still 409s
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "EARCH", "employeeName": "Asha Rao",
                          "companyId": cid},
                    files={p: (f"{p}.jpg", JPEG, "image/jpeg")
                           for p in ("center", "left", "right")})
    assert r.status_code == 409


def test_employee_job_dedupe_ignores_visitor_jobs(app, client):
    """A pending VISITOR job carrying the host's _id must not satisfy the
    employee's own job-dedupe — re-registration must still queue the
    employee's enrollment jobs."""
    cid = seed_company(client)
    register_employee(client, cid, emp_id="EHOST")
    ds = app.datastore
    host = ds.employee_info.find_one({"employeeId": "EHOST"})
    # archive + drain the employee's own jobs, then plant a visitor job
    ds.embedding_jobs.delete_many({})
    ds.employee_info.update_one({"_id": host["_id"]},
                                {"$set": {"status": "archived"}})
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId
    ds.embedding_jobs.insert_one({
        "employeeId": host["_id"], "companyId": ObjectId(cid),
        "visitorId": ObjectId(), "model": "buffalo_l",
        "status": "queued", "params": {}})
    r = register_employee(client, cid, emp_id="EHOST")
    assert r.status_code == 200, r.text
    own_jobs = list(ds.embedding_jobs.find(
        {"employeeId": host["_id"], "visitorId": {"$exists": False}}))
    assert {j["model"] for j in own_jobs} == {"buffalo_l",
                                              "mobile_facenet_v1"}
