"""Control-plane API tests for the server entry points (in-process WSGI)."""

import datetime

import numpy as np
import pytest

from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.domain.campus import (
    CameraType,
    CampusPeopleManager,
)
from facerecognition_infrenceengine_tpu.domain.cameras import CameraManager
from facerecognition_infrenceengine_tpu.engine.gallery import GalleryManager
from facerecognition_infrenceengine_tpu.models.zoo import fake_embedding
from facerecognition_infrenceengine_tpu.servers.inference_server import (
    build_app as build_inference_app,
)
from facerecognition_infrenceengine_tpu.servers.people_count import (
    build_app as build_count_app,
)
from facerecognition_infrenceengine_tpu.store import Datastore


@pytest.fixture
def cfg():
    return Config()


def test_inference_control_api(cfg):
    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    cm = CameraManager(gallery, cfg=cfg)
    app = build_inference_app(gallery, cm)
    c = app.test_client()

    stats = c.get("/api/embeddings/stats").get_json()
    assert stats["total_embeddings"] == 0
    assert stats["initial_load_complete"] is True

    r = c.post("/api/embeddings/sync", json_body={})
    assert r.get_json()["status"] == "success"

    # camera start without company id
    r = c.post("/api/camera/start", json_body={"sources": [0]})
    assert r.status_code == 400

    r = c.post("/api/camera/stop", json_body={})
    assert r.get_json()["status"] == "success"


def test_people_count_api(cfg):
    ds = Datastore(cfg)
    manager = CampusPeopleManager(ds, cfg, start_background=False)
    manager.register_camera("cam_in", "campusA", CameraType.ENTRY)
    app = build_count_app(manager)
    c = app.test_client()

    t0 = datetime.datetime(2026, 8, 16, 9, 0, 0)
    meta = {"name": "Asha", "type": "employee", "employeeId": "E1"}
    manager.process_detection("p1", meta, "cam_in", t0, 0.9)
    manager.process_detection("p1", meta, "cam_in",
                              t0 + datetime.timedelta(seconds=3), 0.9)
    manager.process_unknown_detection("cam_in", t0, fake_embedding(5), [1, 2, 3, 4])
    manager.flush()
    manager.update_analytics()

    overall = c.get("/api/status").get_json()
    assert overall["success"] and overall["data"]["total_inside"] == 1

    campus = c.get("/api/campus/campusA/status").get_json()["data"]
    assert campus["current_inside"] == 1
    assert campus["unique_unknowns_today"] == 1

    person = c.get("/api/person/p1").get_json()["data"]
    assert person["status"] == "inside"
    assert c.get("/api/person/nobody").status_code == 404

    events = c.get("/api/campus/campusA/events").get_json()
    assert events["count"] == 1
    assert events["data"][0]["event_type"] == "entry"
    assert c.get("/api/campus/campusA/events?type=exit").get_json()["count"] == 0

    people = c.get("/api/campus/campusA/people").get_json()
    assert people["count"] == 1

    analytics = c.get("/api/campus/campusA/analytics").get_json()
    assert analytics["count"] == 1
    assert analytics["data"][0]["total_entries"] == 1

    unknown = c.get("/api/campus/campusA/unknown").get_json()
    assert unknown["total_unique"] == 1

    summary = c.get("/api/analytics/summary").get_json()["data"]
    assert summary["total_campuses"] == 1
    assert summary["total_inside"] == 1
