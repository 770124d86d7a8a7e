"""Tests for the WSGI micro-framework: routing, blueprints, parsing, errors."""

import io
import json
import threading
import urllib.request

import pytest

from facerecognition_infrenceengine_tpu.web import (
    App,
    Blueprint,
    HTTPError,
    abort,
    jsonify,
    request,
)
from facerecognition_infrenceengine_tpu.store import ObjectId


@pytest.fixture
def app():
    app = App("t")
    bp = Blueprint("api", url_prefix="/api/v1")

    @bp.route("/items", methods=["GET", "POST"])
    def items():
        if request.method == "POST":
            return jsonify({"created": request.get_json()}), 201
        return jsonify({"items": [1, 2], "q": request.args.get("q")})

    @bp.route("/items/<item_id>", methods=["GET"])
    def item(item_id):
        if item_id == "missing":
            abort(404, "no such item")
        return jsonify({"id": item_id})

    @bp.route("/items/<int:n>/count", methods=["GET"])
    def count(n):
        return jsonify({"n": n, "type": type(n).__name__})

    @bp.route("/upload", methods=["POST"])
    def upload():
        f = request.files.get("photo")
        return jsonify({
            "filename": f.filename,
            "bytes": len(f.read()),
            "field": request.form.get("name"),
            "poses": request.form.getlist("pose"),
        })

    app.register_blueprint(bp)
    return app


def test_routing_and_query(app):
    c = app.test_client()
    r = c.get("/api/v1/items?q=hello")
    assert r.status_code == 200
    assert r.get_json() == {"items": [1, 2], "q": "hello"}


def test_post_json(app):
    c = app.test_client()
    r = c.post("/api/v1/items", json_body={"a": 1})
    assert r.status_code == 201
    assert r.get_json()["created"] == {"a": 1}


def test_path_params_and_converters(app):
    c = app.test_client()
    assert c.get("/api/v1/items/abc").get_json() == {"id": "abc"}
    out = c.get("/api/v1/items/42/count").get_json()
    assert out == {"n": 42, "type": "int"}


def test_errors(app):
    c = app.test_client()
    assert c.get("/nope").status_code == 404
    r = c.get("/api/v1/items/missing")
    assert r.status_code == 404
    assert r.get_json()["error"] == "no such item"
    assert c.delete("/api/v1/items").status_code == 405


def test_multipart_upload(app):
    c = app.test_client()
    r = c.post(
        "/api/v1/upload",
        data={"name": "alice", "pose": ["center", "left"]},
        files={"photo": ("face.jpg", b"\xff\xd8JPEGDATA", "image/jpeg")},
    )
    out = r.get_json()
    assert out["filename"] == "face.jpg"
    assert out["bytes"] == 10
    assert out["field"] == "alice"
    assert out["poses"] == ["center", "left"]


def test_jsonify_objectid_and_datetime():
    import datetime

    app = App("t2")

    @app.route("/x")
    def x():
        return jsonify({
            "id": ObjectId("0123456789abcdef01234567"),
            "at": datetime.datetime(2026, 1, 2, 3, 4, 5),
        })

    r = app.test_client().get("/x")
    assert r.get_json() == {"id": "0123456789abcdef01234567",
                            "at": "2026-01-02T03:04:05"}


def test_handler_exception_is_500_json(app):
    @app.route("/boom")
    def boom():
        raise RuntimeError("x")

    r = app.test_client().get("/boom")
    assert r.status_code == 500
    assert "error" in r.get_json()


def test_before_request_short_circuit():
    app = App("t3")

    @app.before_request
    def gate():
        if request.headers.get("X-Block"):
            return jsonify({"error": "blocked"}), 403

    @app.route("/ok")
    def ok():
        return jsonify({"ok": True})

    c = app.test_client()
    assert c.get("/ok").status_code == 200
    assert c.get("/ok", headers={"X-Block": "1"}).status_code == 403


def test_real_socket_server(app):
    from facerecognition_infrenceengine_tpu.web.serving import serve

    server = serve(app, "127.0.0.1", 0, background=True)
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/v1/items?q=z") as resp:
        body = json.loads(resp.read())
    assert body["q"] == "z"
    server.shutdown()


def test_concurrent_requests_real_server():
    """16 threads hammer a real threaded server with interleaved reads and
    writes: every response must be correct for ITS request (the request
    threadlocal cannot bleed across handler threads) and the store-backed
    counter must equal the number of writes (no lost updates)."""
    from facerecognition_infrenceengine_tpu.web import App, jsonify, request
    from facerecognition_infrenceengine_tpu.web.serving import serve
    from facerecognition_infrenceengine_tpu.store import Datastore
    from facerecognition_infrenceengine_tpu.core.config import Config

    app = App("load")
    ds = Datastore(Config())
    ds.db["hits"].insert_one({"_id": "counter", "n": 0})

    @app.route("/echo")
    def echo():
        return jsonify({"tag": request.args.get("tag")})

    @app.route("/bump", methods=["POST"])
    def bump():
        ds.db["hits"].update_one({"_id": "counter"}, {"$inc": {"n": 1}})
        return jsonify({"ok": True})

    server = serve(app, "127.0.0.1", 0, background=True)
    port = server.server_address[1]
    errors: list = []

    def client(worker):
        try:
            for i in range(25):
                tag = f"w{worker}-{i}"
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/echo?tag={tag}",
                        timeout=30) as resp:
                    assert json.loads(resp.read())["tag"] == tag
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/bump", data=b"{}", method="POST")
                urllib.request.urlopen(req, timeout=30).read()
        except Exception as e:  # pragma: no cover
            errors.append((worker, e))

    threads = [threading.Thread(target=client, args=(w,)) for w in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    server.shutdown()
    assert not errors, errors
    assert ds.db["hits"].find_one({"_id": "counter"})["n"] == 16 * 25


def test_oversize_body_rejected_413(monkeypatch):
    """Content-Length past MAX_BODY_BYTES is refused before the body is
    read into memory (OOM hardening; legitimate uploads are a few MB)."""
    import io

    from facerecognition_infrenceengine_tpu.web import framework

    monkeypatch.setattr(framework, "MAX_BODY_BYTES", 1024)
    app = framework.App("t")

    @app.route("/echo", methods=["POST"])
    def echo():
        return framework.jsonify({"n": len(framework.request.get_data())})

    c = app.test_client()
    ok = c.post("/echo", data=b"x" * 512)
    assert ok.status_code == 200 and ok.get_json()["n"] == 512
    big = c.post("/echo", data=b"x" * 2048)
    assert big.status_code == 413
    assert "too large" in big.get_json()["error"]


def test_negative_content_length_reads_nothing():
    """'Content-Length: -1' must not become body.read(-1) (unbounded
    read-until-EOF — it would defeat the MAX_BODY_BYTES OOM guard)."""
    import io

    from facerecognition_infrenceengine_tpu.web import framework

    environ = {
        "REQUEST_METHOD": "POST", "PATH_INFO": "/", "QUERY_STRING": "",
        "CONTENT_LENGTH": "-1", "CONTENT_TYPE": "text/plain",
        "wsgi.input": io.BytesIO(b"x" * (1 << 20)),
    }
    req = framework.Request(environ)
    assert req.get_data() == b""
