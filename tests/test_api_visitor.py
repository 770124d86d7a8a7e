"""Contract tests: visitor registration, visit lifecycle, QR pass."""

import datetime

import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.domain.passes import qr_decode
from facerecognition_infrenceengine_tpu.store import Datastore

JPEG = b"\xff\xd8\xff\xe0" + b"fakejpegdata" * 10


@pytest.fixture
def app(store_cfg):
    # store_cfg (conftest) runs this whole contract suite over BOTH the
    # embedded store and the fre:// wire server
    return create_app(Datastore(store_cfg), store_cfg)


@pytest.fixture
def client(app):
    return app.test_client()


@pytest.fixture
def company_and_host(client):
    cid = client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    r = client.post("/bharatlytics/v1/employees/register",
                    data={"employeeId": "H1", "employeeName": "Host Singh",
                          "companyId": cid}, files=files)
    assert r.status_code == 200
    return cid, "H1"


def register_visitor(client, cid, host_id, **extra):
    data = {"companyId": cid, "visitorName": "Vinod Guest",
            "phone": "9876543210", "hostEmployeeId": host_id, **extra}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    return client.post("/bharatlytics/v1/visitors/register", data=data, files=files)


def test_register_visitor(app, client, company_and_host):
    cid, host = company_and_host
    r = register_visitor(client, cid, host)
    assert r.status_code == 201, r.text
    body = r.get_json()
    assert body["message"] == "Visitor registration successful"
    assert body["embeddingStatus"]["buffalo_l"] == "queued"
    # jobs queued with visitorId set
    jobs = list(app.datastore.embedding_jobs.find({"visitorId": {"$exists": True}}))
    assert len(jobs) == 2


def test_register_visitor_validation(client, company_and_host):
    cid, host = company_and_host
    # bad phone
    r = register_visitor(client, cid, host, phone="12")
    assert r.status_code == 400
    # bad host
    r = register_visitor(client, cid, "NOPE")
    assert r.status_code == 400
    assert "Host employee" in r.get_json()["error"]
    # bad id number for aadhar
    r = register_visitor(client, cid, host, idType="aadhar", idNumber="123")
    assert r.status_code == 400
    assert "Aadhar" in r.get_json()["error"]


def visit_window():
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    start = (now - datetime.timedelta(hours=1)).isoformat()
    end = (now + datetime.timedelta(hours=3)).isoformat()
    return start, end


def test_visit_lifecycle_with_qr(app, client, company_and_host):
    cid, host = company_and_host
    vid = register_visitor(client, cid, host).get_json()["_id"]
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    start, end = visit_window()
    r = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                    json_body={"companyId": cid,
                               "hostEmployeeId": str(host_doc["_id"]),
                               "expectedArrival": start,
                               "expectedDeparture": end,
                               "purpose": "Audit",
                               "accessAreas": ["Lobby", "Lab"]})
    assert r.status_code == 201, r.text
    visit = r.get_json()["visit"]
    visit_id = visit["_id"]
    assert visit["status"] == "scheduled"
    assert visit["qrCode"]

    # overlap rejected
    r2 = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                     json_body={"companyId": cid,
                                "hostEmployeeId": str(host_doc["_id"]),
                                "expectedArrival": start,
                                "expectedDeparture": end})
    assert r2.status_code == 409

    # pass PNG exists, QR decodes to visit id
    r = client.get(f"/bharatlytics/v1/visitors/visits/qr/{visit_id}")
    assert r.status_code == 200
    assert r.data[:8] == b"\x89PNG\r\n\x1a\n"
    assert qr_decode(r.data) == visit_id

    # verify-qr accepts the generated pass
    r = client.post("/bharatlytics/v1/visitors/visits/verify-qr",
                    files={"qrCode": ("pass.png", r.data, "image/png")})
    assert r.status_code == 200, r.text
    assert r.get_json()["visit"]["_id"] == visit_id

    # check-in / check-out state machine
    r = client.post(f"/bharatlytics/v1/visitors/visits/{visit_id}/check-in",
                    json_body={"checkInMethod": "qr"})
    assert r.status_code == 200
    # double check-in rejected
    r = client.post(f"/bharatlytics/v1/visitors/visits/{visit_id}/check-in",
                    json_body={"checkInMethod": "qr"})
    assert r.status_code == 400
    r = client.post(f"/bharatlytics/v1/visitors/visits/{visit_id}/check-out",
                    json_body={"checkOutMethod": "manual"})
    assert r.status_code == 200
    doc = app.datastore.visits.find_one({})
    assert doc["status"] == "checked_out"
    assert doc["actualArrival"] is not None and doc["actualDeparture"] is not None


def test_verify_qr_zone_and_state(client, company_and_host, app):
    cid, host = company_and_host
    vid = register_visitor(client, cid, host).get_json()["_id"]
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    start, end = visit_window()
    visit = client.post(
        f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
        json_body={"companyId": cid, "hostEmployeeId": str(host_doc["_id"]),
                   "expectedArrival": start, "expectedDeparture": end,
                   "accessAreas": ["Lobby"]}).get_json()["visit"]
    png = client.get(f"/bharatlytics/v1/visitors/visits/qr/{visit['_id']}").data
    # wrong zone
    r = client.post("/bharatlytics/v1/visitors/visits/verify-qr",
                    data={"accessZone": "Vault"},
                    files={"qrCode": ("p.png", png, "image/png")})
    assert r.status_code == 400
    assert "access zone" in r.get_json()["error"]
    # right zone
    r = client.post("/bharatlytics/v1/visitors/visits/verify-qr",
                    data={"accessZone": "Lobby"},
                    files={"qrCode": ("p.png", png, "image/png")})
    assert r.status_code == 200
    # cancelled visit fails state check
    client.delete(f"/bharatlytics/v1/visitors/visits/{visit['_id']}")
    r = client.post("/bharatlytics/v1/visitors/visits/verify-qr",
                    files={"qrCode": ("p.png", png, "image/png")})
    assert r.status_code == 400
    # garbage image
    r = client.post("/bharatlytics/v1/visitors/visits/verify-qr",
                    files={"qrCode": ("x.png", b"notanimage", "image/png")})
    assert r.status_code == 400


def test_visit_listing_and_analytics(client, company_and_host, app):
    cid, host = company_and_host
    vid = register_visitor(client, cid, host).get_json()["_id"]
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    start, end = visit_window()
    client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                json_body={"companyId": cid, "hostEmployeeId": str(host_doc["_id"]),
                           "expectedArrival": start, "expectedDeparture": end,
                           "accessAreas": ["Lobby", "Lab"]})
    r = client.get(f"/bharatlytics/v1/visitors/visits?companyId={cid}")
    visits = r.get_json()["visits"]
    assert len(visits) == 1 and visits[0]["qrCodeUrl"]
    # the advertised URL must actually resolve (reference visitor.py:820
    # emits an unmounted path that 404s; ours serves the pass PNG)
    r = client.get(visits[0]["qrCodeUrl"])
    assert r.status_code == 200 and r.data[:8] == b"\x89PNG\r\n\x1a\n"
    r = client.get(f"/bharatlytics/v1/visitors?companyId={cid}")
    assert len(r.get_json()["visitors"]) == 1
    r = client.get(f"/bharatlytics/v1/visitors/visits/analytics/host?companyId={cid}")
    rows = r.get_json()
    assert rows[0]["count"] == 1
    r = client.get(f"/bharatlytics/v1/visitors/visits/analytics/area?companyId={cid}")
    assert {x["_id"] for x in r.get_json()} == {"Lobby", "Lab"}


# ------------------------------------------ round-5 deep-review pins
def test_register_rejects_bad_attached_embedding_without_orphans(
        app, client, company_and_host):
    """A rejected attached embedding must not leave a half-registration
    behind (visitor doc + GridFS images + queued jobs before the 400)."""
    cid, host = company_and_host
    ds = app.datastore
    visitors_before = ds.visitors.count_documents({})
    jobs_before = ds.embedding_jobs.count_documents({})
    data = {"companyId": cid, "visitorName": "Bad Blob",
            "phone": "9876543211", "hostEmployeeId": host,
            "embeddingAttached": "true", "embeddingVersion": "buffalo_l"}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg")
             for p in ("center", "left", "right")}
    files["embedding"] = ("emb.pkl", b"not a pickle of a vector",
                          "application/octet-stream")
    r = client.post("/bharatlytics/v1/visitors/register",
                    data=data, files=files)
    assert r.status_code == 400
    assert ds.visitors.count_documents({}) == visitors_before
    assert ds.embedding_jobs.count_documents({}) == jobs_before


def test_register_attached_model_skips_its_job(app, client, company_and_host):
    """The worker must not recompute (and overwrite) the model the client
    attached — no job is queued for that model, mirroring the employee
    route."""
    import numpy as np

    from facerecognition_infrenceengine_tpu.core.serialization import (
        serialize_embedding)

    cid, host = company_and_host
    data = {"companyId": cid, "visitorName": "Attached Guest",
            "phone": "9876543212", "hostEmployeeId": host,
            "embeddingAttached": "true", "embeddingVersion": "buffalo_l"}
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg")
             for p in ("center", "left", "right")}
    files["embedding"] = ("emb.pkl",
                          serialize_embedding(np.ones(512, np.float32)),
                          "application/octet-stream")
    r = client.post("/bharatlytics/v1/visitors/register",
                    data=data, files=files)
    assert r.status_code == 201, r.text
    body = r.get_json()
    assert body["embeddingStatus"]["buffalo_l"] == "done"
    vid = body["_id"]
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId
    jobs = list(app.datastore.embedding_jobs.find(
        {"visitorId": ObjectId(vid)}))
    assert [j["model"] for j in jobs] == ["mobile_facenet_v1"]


def test_schedule_visit_client_errors_not_500(app, client, company_and_host):
    """Empty visitorIds falls back to the URL visitor; a business
    hostEmployeeId resolves like /register; malformed dates are 400s."""
    cid, host = company_and_host
    vid = register_visitor(client, cid, host).get_json()["_id"]
    start, end = visit_window()
    # business employeeId for the host + explicitly empty visitorIds
    r = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                    json_body={"companyId": cid, "hostEmployeeId": host,
                               "visitorIds": [],
                               "expectedArrival": start,
                               "expectedDeparture": end})
    assert r.status_code == 201, r.text
    # malformed datetime is the client's fault
    r = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                    json_body={"companyId": cid, "hostEmployeeId": host,
                               "expectedArrival": "not-a-date"})
    assert r.status_code == 400


def test_update_visit_rejects_bad_dates_and_window_inversion(
        app, client, company_and_host):
    cid, host = company_and_host
    vid = register_visitor(client, cid, host).get_json()["_id"]
    host_doc = app.datastore.employee_info.find_one({"employeeId": host})
    start, end = visit_window()
    visit = client.post(f"/bharatlytics/v1/visitors/{vid}/schedule-visit",
                        json_body={"companyId": cid,
                                   "hostEmployeeId": str(host_doc["_id"]),
                                   "expectedArrival": start,
                                   "expectedDeparture": end}
                        ).get_json()["visit"]
    visit_id = visit["_id"]
    r = client.patch(f"/bharatlytics/v1/visitors/visits/{visit_id}",
                     json_body={"expectedArrival": "garbage"})
    assert r.status_code == 400
    # arrival-only update that would invert the stored window
    late = (datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
            + datetime.timedelta(days=2)).isoformat()
    r = client.patch(f"/bharatlytics/v1/visitors/visits/{visit_id}",
                     json_body={"expectedArrival": late})
    assert r.status_code == 400
