"""Admin-frontend serving tests (SURVEY.md §2.18).

The reference ships its UI as app/templates + app/static; here the UI
blueprint serves the rebuilt pages under /ui and their static assets, and
the pages must reference only same-origin assets (zero-egress rule: the
reference's CDN-loaded Bootstrap/jQuery/Cytoscape are not available).
"""

import re

import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.store import Datastore


@pytest.fixture()
def client():
    cfg = Config()
    app = create_app(Datastore(cfg), cfg)
    return app.test_client()


PAGES = ["/ui/", "/ui/companies", "/ui/company-details"]


@pytest.mark.parametrize("path", PAGES)
def test_pages_serve_html(client, path):
    resp = client.get(path)
    assert resp.status_code == 200
    assert resp.headers["Content-Type"].startswith("text/html")
    assert b"<!DOCTYPE html>" in resp.data


@pytest.mark.parametrize("path", PAGES)
def test_pages_have_no_external_resources(client, path):
    html = client.get(path).text
    refs = re.findall(r'(?:src|href)="([^"]+)"', html)
    for ref in refs:
        assert not ref.startswith(("http://", "https://", "//")), (
            f"{path} references external resource {ref} (zero-egress)")


def test_page_assets_all_resolve(client):
    seen = set()
    for path in PAGES:
        html = client.get(path).text
        for ref in re.findall(r'(?:src|href)="(/ui/static/[^"]+)"', html):
            if ref in seen:
                continue
            seen.add(ref)
            resp = client.get(ref)
            assert resp.status_code == 200, f"{ref} -> {resp.status_code}"
            ctype = resp.headers["Content-Type"]
            if ref.endswith(".js"):
                assert "javascript" in ctype
            elif ref.endswith(".css"):
                assert "css" in ctype
    assert seen, "pages reference no static assets?"


def test_static_path_traversal_blocked(client):
    resp = client.get("/ui/static/../__init__.py")
    assert resp.status_code == 404
    resp = client.get("/ui/static/..%2f..%2fframework.py")
    assert resp.status_code == 404


def test_static_unknown_extension_rejected(client):
    resp = client.get("/ui/static/style.py")
    assert resp.status_code == 404


def test_ui_talks_to_pinned_api_prefix(client):
    js = client.get("/ui/static/config.js").text
    assert "'/bharatlytics/v1'" in js  # reference app/static/js/config.js:3
