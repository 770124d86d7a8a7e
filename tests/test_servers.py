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


def test_recalibrate_int8_route(cfg):
    """Operational hook for int8 PTQ recalibration from real crops: 503
    before the engine exists, 400 with no crops or on a non-int8 engine,
    and decoded+resized uint8 crops reach engine.recalibrate_int8."""
    import cv2
    import numpy as np

    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    cm = CameraManager(gallery, cfg=cfg)
    app = build_inference_app(gallery, cm)
    c = app.test_client()

    # engine not up yet
    r = c.post("/api/engine/recalibrate-int8", files={})
    assert r.status_code == 503

    class FakeEngine:
        class cfg:
            embed_size = 112

        seen = None

        def recalibrate_int8(self, crops):
            if crops.shape[0] < 2:
                raise ValueError("engine was not built with embed_int8")
            FakeEngine.seen = np.asarray(crops)
            self._int8_calibration = f"user({len(crops)} crops)"

    class FakeApp:
        _engine = FakeEngine()

    cm.face_app = FakeApp()

    r = c.post("/api/engine/recalibrate-int8", files={})
    assert r.status_code == 400  # no crops

    def crop_png(seed, hw=112):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 255, (hw, hw, 3), np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        return buf.tobytes()

    # one crop -> the fake engine raises the not-int8 ValueError -> 400
    r = c.post("/api/engine/recalibrate-int8",
               files={"c0": ("c0.png", crop_png(0), "image/png")})
    assert r.status_code == 400
    assert "embed_int8" in r.get_json()["message"]

    # three crops, one oversized (resized server-side) -> success
    files = {f"c{i}": (f"c{i}.png", crop_png(i, 112 if i < 2 else 224),
                       "image/png") for i in range(3)}
    r = c.post("/api/engine/recalibrate-int8", files=files)
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert body["crops"] == 3 and "user(3" in body["calibration"]
    assert FakeEngine.seen.shape == (3, 112, 112, 3)
    assert FakeEngine.seen.dtype == np.uint8


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


def test_capture_is_free_running(cfg, monkeypatch):
    """Capture must never wait on recognition (reference keeps capture
    unblocked and drops stale frames, infrenceServer.py:594-598): with a
    slow recognizer, far more frames are captured than dispatched, stale
    frames are dropped by the batcher, and results still flow."""
    import time

    import cv2

    class FakeCap:
        def __init__(self, *_):
            self.frames = 0

        def isOpened(self):
            return True

        def set(self, *_):
            pass

        def read(self):
            self.frames += 1
            time.sleep(0.002)  # ~500 fps source
            return True, np.zeros((16, 16, 3), np.uint8)

        def release(self):
            pass

    class SlowApp:
        def __init__(self, delay=0.05):
            self.delay = delay
            self.dispatches = 0

        def get_batch(self, frames, max_num=0):
            time.sleep(self.delay)  # device much slower than the cameras
            self.dispatches += 1
            return [[] for _ in frames]

    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    app = SlowApp()
    seen = []
    cm = CameraManager(gallery, face_app=app, cfg=cfg,
                       on_result=lambda src, frame, res: seen.append(src))
    cm.start_cameras(["cam0", "cam1"], company_id=None)
    time.sleep(0.6)
    cm.stop_cameras()

    captured = cm.stats["frames_captured"]
    assert captured > 4 * app.dispatches, (captured, app.dispatches)
    assert cm.stats["results"] > 0 and seen  # recognitions still flowed
    # stale frames were dropped, not queued behind the slow device
    assert captured > cm.stats["results"]


def test_server_dashboards_serve_and_poll_own_api(cfg):
    """GET / on each server serves a self-contained ops dashboard (the web
    form of the reference's stdout status banner, peopleCount.py:1227-1271)
    that polls only the server's own routes — no external resources."""
    import re

    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    cm = CameraManager(gallery, cfg=cfg)
    inf = build_inference_app(gallery, cm).test_client()
    manager = CampusPeopleManager(ds, cfg, start_background=False)
    cnt = build_count_app(manager).test_client()

    for client, endpoints in (
            (inf, ["/api/embeddings/stats", "/api/metrics",
                   "/api/embeddings/sync", "/api/camera/start",
                   "/api/camera/stop", "/api/profiler/start"]),
            (cnt, ["/api/analytics/summary", "/api/campus/",
                   "/events", "/unknown"])):
        r = client.get("/")
        assert r.status_code == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.text
        assert "<!DOCTYPE html>" in html
        for ep in endpoints:
            assert ep in html, ep
        # zero-egress: no external scripts/styles/fetches
        for ref in re.findall(r'(?:src|href)="([^"]+)"', html):
            assert not ref.startswith(("http://", "https://", "//")), ref
        assert "http://" not in html and "https://" not in html


def test_dashboard_field_contract(cfg):
    """Every JSON field the dashboards render must exist in the live
    endpoint responses (no JS runtime here, so pin the contract by name)."""
    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    cm = CameraManager(gallery, cfg=cfg)
    inf = build_inference_app(gallery, cm).test_client()
    stats = inf.get("/api/embeddings/stats").get_json()
    for field in ("total_embeddings", "employees", "visitors", "last_sync"):
        assert field in stats, field
    metrics = inf.get("/api/metrics").get_json()
    for field in ("counters", "gauges", "timers"):
        assert field in metrics, field

    manager = CampusPeopleManager(ds, cfg, start_background=False)
    manager.register_camera("cam_in", "campusA", CameraType.ENTRY)
    t0 = datetime.datetime(2026, 8, 16, 9, 0, 0)
    meta = {"name": "Asha", "type": "employee", "employeeId": "E1"}
    manager.process_detection("p1", meta, "cam_in", t0, 0.9)
    manager.process_detection(  # 2nd sighting >=2s later confirms entry
        "p1", meta, "cam_in", t0 + datetime.timedelta(seconds=3), 0.9)
    cnt = build_count_app(manager).test_client()
    summary = cnt.get("/api/analytics/summary").get_json()
    assert summary["success"]
    d = summary["data"]
    for field in ("total_inside", "total_entries_today", "total_exits_today",
                  "total_unknown_today", "total_campuses", "campus_breakdown"):
        assert field in d, field
    for field in ("current_inside", "employees_inside", "visitors_inside",
                  "total_entries_today", "total_exits_today",
                  "unknown_detections_today"):
        assert field in d["campus_breakdown"]["campusA"], field
    ev = cnt.get("/api/campus/campusA/events?limit=5").get_json()
    assert ev["success"] and isinstance(ev["data"], list)
    unk = cnt.get("/api/campus/campusA/unknown").get_json()
    assert unk["success"] and isinstance(unk["data"], list)


def test_control_apis_enable_cors(cfg):
    """The reference wraps both control-plane Flask apps in CORS(app)
    (infrenceServer.py:34, peopleCount.py:33): every response carries
    Access-Control-Allow-Origin: * and OPTIONS preflights succeed."""
    ds = Datastore(cfg)
    gallery = GalleryManager(ds, cfg)
    cm = CameraManager(gallery, cfg=cfg)
    inf = build_inference_app(gallery, cm).test_client()
    manager = CampusPeopleManager(ds, cfg, start_background=False)
    cnt = build_count_app(manager).test_client()

    r = inf.get("/api/embeddings/stats")
    assert r.headers.get("Access-Control-Allow-Origin") == "*"
    r = inf.open("/api/embeddings/sync", method="OPTIONS")
    assert r.status_code == 200
    assert r.headers.get("Access-Control-Allow-Origin") == "*"
    assert "POST" in r.headers.get("Access-Control-Allow-Methods", "")
    r = cnt.get("/api/status")
    assert r.headers.get("Access-Control-Allow-Origin") == "*"

    # the main API app is same-origin with its UI; no CORS there
    from facerecognition_infrenceengine_tpu.api import create_app
    api = create_app(ds, cfg).test_client()
    r = api.get("/bharatlytics/v1/health")
    assert "Access-Control-Allow-Origin" not in r.headers


def test_dashboard_inline_scripts_parse_sane():
    """Bracket balance for the dashboards' inline JS (single-file pages —
    the /ui static checks don't cover them; no JS runtime exists here).
    Strings are stripped BEFORE // comments so URLs in placeholders don't
    masquerade as comments."""
    import os
    import re

    from facerecognition_infrenceengine_tpu import servers

    ddir = os.path.join(os.path.dirname(servers.__file__), "dashboards")
    for name in sorted(os.listdir(ddir)):
        s = open(os.path.join(ddir, name)).read()
        js = s[s.index("<script>"):s.index("</script>")]
        js = re.sub(r"'(?:\\.|[^'\\\n])*'", "''", js)
        js = re.sub(r'"(?:\\.|[^"\\\n])*"', '""', js)
        js = re.sub(r"`(?:\\.|[^`\\])*`", "``", js)
        js = re.sub(r"//[^\n]*", "", js)
        js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
        for o, c in (("(", ")"), ("{", "}"), ("[", "]")):
            assert js.count(o) == js.count(c), (name, o, js.count(o), js.count(c))


def test_people_count_bad_int_params_are_400(cfg):
    """Malformed limit/days query params are client errors, not 500s; and
    limit is clamped so one request can't dump the whole collection."""
    ds = Datastore(cfg)
    manager = CampusPeopleManager(ds, cfg, start_background=False)
    app = build_count_app(manager)
    c = app.test_client()
    r = c.get("/api/campus/x/events?limit=abc")
    assert r.status_code == 400
    assert "limit" in r.get_json()["error"]
    r = c.get("/api/campus/x/analytics?days=abc")
    assert r.status_code == 400
    r = c.get("/api/campus/x/events?limit=10000000")
    assert r.status_code == 200  # clamped, not errored
