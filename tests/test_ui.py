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


PAGES = ["/ui/", "/ui/companies", "/ui/company-details", "/ui/employees",
         "/ui/visitors"]


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


def test_js_dom_ids_exist_in_pages(client):
    """Static wiring check (no JS runtime in this image): every '#id'
    selector a page's scripts query must exist in that page's HTML — this
    catches editor/modal wiring regressions the way a browser smoke test
    would (e.g. a handler bound to a removed form)."""
    # a script may be shared by several pages and guard with data-page;
    # its ids must exist in the union of the pages that load it
    script_pages = {}
    page_ids = {}
    for path in PAGES:
        html = client.get(path).text
        page_ids[path] = set(re.findall(r'id="([^"]+)"', html))
        for src in re.findall(r'<script src="(/ui/static/[^"]+)"', html):
            script_pages.setdefault(src, []).append(path)
    dynamic_ids = {"toast"}  # created by api.js at runtime
    for src, pages in script_pages.items():
        js = client.get(src).text
        union = dynamic_ids.union(*(page_ids[p] for p in pages))
        for sel in re.findall(r"\$\('#([A-Za-z0-9_-]+)'\)", js):
            assert sel in union, (
                f"{src} (loaded by {pages}) queries #{sel}, "
                f"absent from every page that loads it")


def test_js_cross_file_helpers_resolve(client):
    """No JS runtime exists in this image, so statically enforce script
    dependency order: every top-level helper a page's script calls
    (api, el, dataTable, ...) must be *defined* in some script that page
    loads — catches a forgotten <script src> include the way a browser's
    'X is not defined' would."""
    defs_by_script = {}
    pages_scripts = {}
    for path in PAGES:
        html = client.get(path).text
        srcs = re.findall(r'<script src="(/ui/static/[^"]+)"', html)
        pages_scripts[path] = srcs
        for src in srcs:
            if src in defs_by_script:
                continue
            js = client.get(src).text
            defs_by_script[src] = set(
                re.findall(r"^(?:async )?function (\w+)\(", js, re.M))
    all_helpers = set().union(*defs_by_script.values())
    for path, srcs in pages_scripts.items():
        defined = set().union(*(defs_by_script[s] for s in srcs))
        for src in srcs:
            js = client.get(src).text
            # strip comments/strings so helper names in prose don't count
            js = re.sub(r"'(?:\\.|[^'\\\n])*'", "''", js)
            js = re.sub(r'"(?:\\.|[^"\\\n])*"', '""', js)
            js = re.sub(r"//[^\n]*", "", js)
            used = {n for n in re.findall(r"\b(\w+)\(", js) if n in all_helpers}
            missing = used - defined
            assert not missing, (
                f"{path} loads {src} which calls {sorted(missing)} — "
                f"defined in no script this page loads")


def test_js_brackets_balanced(client):
    """Crude parse sanity for every served script: (), {}, [] balance
    outside strings/comments — catches truncation/merge damage."""
    seen = set()
    for path in PAGES:
        html = client.get(path).text
        for src in re.findall(r'<script src="(/ui/static/[^"]+)"', html):
            if src in seen:
                continue
            seen.add(src)
            js = client.get(src).text
            # strip strings, template literals and comments
            js = re.sub(r"//[^\n]*", "", js)
            js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
            # quote-strings cannot span lines in JS — keep \n out of the
            # character class or the match swallows code between strings
            js = re.sub(r"'(?:\\.|[^'\\\n])*'", "''", js)
            js = re.sub(r'"(?:\\.|[^"\\\n])*"', '""', js)
            js = re.sub(r"`(?:\\.|[^`\\])*`", "``", js)
            for o, c in (("(", ")"), ("{", "}"), ("[", "]")):
                assert js.count(o) == js.count(c), (
                    f"{src}: unbalanced {o}{c} "
                    f"({js.count(o)} vs {js.count(c)})")


def test_definition_editor_roundtrip(client):
    """The editor's save contract: PUT structure (required attrs, allowed
    values, validations) + relationships (cardinality, min/maxChildren),
    then read back — exactly the payload definition-editor.js sends."""
    cid = client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]
    templates = client.get("/bharatlytics/v1/entities/templates").get_json()
    assert templates
    r = client.post("/bharatlytics/v1/entity-definitions/from-template",
                    json_body={"templateId": templates[0]["_id"],
                               "companyId": cid, "name": "Editor RT",
                               "description": "round trip"})
    assert r.status_code in (200, 201), r.text
    def_id = r.get_json()["id"]

    structure = {
        "entityTypes": {
            "plant": {"description": "Factory",
                      "requiredAttributes": ["plantCode"],
                      "designation": "Plant Head",
                      "allowedValues": {"region": ["north", "south"]},
                      "validations": {"plantCode": "^PLT\\d{3}$"}},
            "line": {"description": "Line", "requiredAttributes": []},
        },
    }
    relationships = [{"parentType": "plant", "childType": "line",
                      "cardinality": "one_to_many",
                      "constraints": {"minChildren": 0, "maxChildren": 4}}]
    r = client.put(f"/bharatlytics/v1/entity-definitions/{def_id}",
                   json_body={"name": "Editor RT v2", "description": "edited",
                              "structure": structure,
                              "relationships": relationships})
    assert r.status_code == 200, r.text
    got = client.get(f"/bharatlytics/v1/entity-definitions/{def_id}").get_json()
    assert got["name"] == "Editor RT v2"
    assert got["structure"]["entityTypes"]["plant"]["validations"] == {
        "plantCode": "^PLT\\d{3}$"}
    assert got["structure"]["entityTypes"]["plant"]["allowedValues"] == {
        "region": ["north", "south"]}
    assert got["relationships"][0]["constraints"]["maxChildren"] == 4

    # the edited definition actually enforces what the editor wrote
    r = client.post("/bharatlytics/v1/entities",
                    json_body={"name": "P1", "type": "plant",
                               "definitionId": def_id, "companyId": cid,
                               "attributes": {"plantCode": "WRONG"}})
    assert r.status_code == 400  # regex validation rejects
    r = client.post("/bharatlytics/v1/entities",
                    json_body={"name": "P1", "type": "plant",
                               "definitionId": def_id, "companyId": cid,
                               "attributes": {"plantCode": "PLT001"}})
    assert r.status_code in (200, 201), r.text


def test_hierarchy_interactivity_surface(client):
    """VERDICT r2 #8: the diagram ships the reference's interaction surface
    (reference entity-definitions.js — Cytoscape pan/zoom/layout): wheel
    zoom, drag pan, zoom/fit controls, layout switcher, viewport
    persistence, and drag-to-reparent wired to the /move endpoint."""
    js = client.get("/ui/static/hierarchy.js").text
    for token in ("addEventListener('wheel'", "pointerdown", "pointermove",
                  "pointerup", "localStorage", "viewBox", "zoomBy",
                  "data-drop", "onMove", "fit", "Left-right"):
        assert token in js, token
    ed = client.get("/ui/static/entity-definitions.js").text
    assert "moveEntityTo" in ed
    assert "/move" in ed
    assert "viewKey" in ed
    # drop-target resolution invariants (review r3): pointerup clears the
    # shared `drag` state before resolving the drop, so dropTargetAt must
    # take the dragged id as a parameter, and the dragged node must be
    # pointer-events:none or elementFromPoint always returns it
    assert "dropTargetAt(ev, d.id)" in js
    assert "dropTargetAt(ev)" not in js, "stale drag state read in drop"
    assert "pointerEvents = 'none'" in js


def test_list_tables_have_datatable_surface(client):
    """The reference renders its lists as DataTables (app/static/js/
    app.js:142-220: search box, sortable headers, pagination with a
    page-size selector and a Showing-X-to-Y info line); table.js is the
    dependency-free equivalent and every list page must load + wire it."""
    js = client.get("/ui/static/table.js").text
    for token in ("function dataTable", "dt-search", "dt-pager",
                  "sort-asc", "sort-desc", "Showing", "pageSize",
                  "localeCompare", "data-dt-empty"):
        assert token in js, token
    for page, script in (("/ui/companies", "app.js"),
                         ("/ui/company-details", "app.js"),
                         ("/ui/employees", "employees.js"),
                         ("/ui/visitors", "visitors.js")):
        html = client.get(page).text
        assert '/ui/static/table.js' in html, f"{page} does not load table.js"
        assert html.index("table.js") < html.index(script), (
            f"{page}: table.js must load before {script}")
    app_js = client.get("/ui/static/app.js").text
    assert app_js.count("dataTable(") >= 2  # companies + details employees
    assert "dt.update()" in app_js
    emp_js = client.get("/ui/static/employees.js").text
    assert "dataTable(" in emp_js
    assert "searchInput: $('#employee-filter')" in emp_js  # reuse page box
    css = client.get("/ui/static/style.css").text
    for token in (".dt-toolbar", ".dt-pager", "th.sort-asc", "th.sort-desc"):
        assert token in css, token


def test_visitors_page_drives_full_visit_lifecycle(client):
    """The visitors workspace must wire every lifecycle endpoint of the
    visitor blueprint (reference app/api/visitor.py): register (multipart
    with 3 poses), schedule-visit, check-in, check-out, delete visit,
    pass download (qrCodeUrl), and verify-qr."""
    js = client.get("/ui/static/visitors.js").text
    for token in ("/visitors/register", "schedule-visit", "check-in",
                  "check-out", "verify-qr", "qrCodeUrl", "accessAreas",
                  "checkInMethod", "checkOutMethod",
                  "['center', 'left', 'right']"):
        assert token in js, token
    html = client.get("/ui/visitors").text
    for dom_id in ("visitors-tbody", "visits-tbody", "register-visitor-form",
                   "schedule-form", "verify-form", "vq-result"):
        assert f'id="{dom_id}"' in html, dom_id
    # every page links to the visitors workspace in its topbar
    for page in PAGES:
        assert '/ui/visitors' in client.get(page).text, page


def test_definition_editor_live_validation(client):
    """Regex/allowed-values editing with live feedback: invalid patterns
    flag as you type; a sample value evaluates against the same rules the
    API enforces (api/entity.py validate_entity_against_definition)."""
    js = client.get("/ui/static/definition-editor.js").text
    for token in ("new RegExp", "invalid regex", "ed-feedback",
                  "not in allowed values", "fails regex", "Live test"):
        assert token in js, token
    css = client.get("/ui/static/style.css").text
    for token in (".ed-feedback.ok", ".ed-feedback.fail", "input.invalid",
                  ".svg-node.drop-target", ".diagram-toolbar"):
        assert token in css, token


def test_company_details_entity_tree_surface(client):
    """The reference company-details page ships an entity-hierarchy tab
    (jstree tree + select-node details pane + add-entity modal, reference
    company-details.html:169-184,308-380); company-entities.js is the
    dependency-free equivalent and company-details must load + wire it."""
    html = client.get("/ui/company-details").text
    for dom_id in ("entity-tree", "ent-detail", "add-entity-btn",
                   "entity-modal", "entity-form", "em-name", "em-definition",
                   "em-type", "em-parent", "em-attributes",
                   "em-required-hint", "entity-count"):
        assert f'id="{dom_id}"' in html, dom_id
    assert "/ui/static/company-entities.js" in html
    # must load before app.js (app.js dispatch calls initCompanyEntities)
    assert html.index("company-entities.js") < html.index('"/ui/static/app.js"')
    js = client.get("/ui/static/company-entities.js").text
    for token in ("initCompanyEntities", "entityGlyph", "sessionStorage",
                  "method: 'PUT'", "method: 'DELETE'", "requiredAttributes",
                  "descendant", "tree-caret", "definitionId"):
        assert token in js, token
    # self-registering: pages sharing app.js don't need this script
    assert "dataset.page !== 'company-details'" in js
    css = client.get("/ui/static/style.css").text
    for token in (".entity-tree", ".tree-row.selected", ".tree-caret",
                  ".entity-detail"):
        assert token in css, token


def test_company_details_entity_tree_roundtrip(client):
    """Drive exactly the endpoints company-entities.js uses: list
    definitions + entities, create root/child (child created from the
    selected node's 'Add child'), re-parent via PUT (the Edit modal's
    parent select), then recursive delete from the details pane."""
    cid = client.post("/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]
    templates = client.get("/bharatlytics/v1/entities/templates").get_json()
    def_id = client.post(
        "/bharatlytics/v1/entity-definitions/from-template",
        json_body={"templateId": templates[0]["_id"], "companyId": cid,
                   "name": "Tree RT"}).get_json()["id"]
    defs = client.get(
        f"/bharatlytics/v1/entity-definitions?companyId={cid}").get_json()
    assert any(d["_id"] == def_id for d in defs)
    etypes = next(d for d in defs if d["_id"] == def_id)["structure"]["entityTypes"]
    root_type = next(iter(etypes))

    def mk(name, etype, parent=None, attrs=None):
        r = client.post("/bharatlytics/v1/entities", json_body={
            "name": name, "type": etype, "companyId": cid,
            "definitionId": def_id, "parentId": parent,
            "attributes": attrs or {}})
        assert r.status_code in (200, 201), r.text
        return r.get_json()["id"]

    def value_for(etype, attr):
        # satisfy the seeded template's regex validations (e.g. ^BU\d{3}$)
        structure = next(d for d in defs if d["_id"] == def_id)["structure"]
        pattern = {**structure.get("defaultValidations", {}),
                   **structure.get("validations", {}),
                   **etypes[etype].get("validations", {})}.get(attr)
        if pattern:
            v = pattern.strip("^$")
            v = re.sub(r"\\d\{(\d+)(?:,\d+)?\}",
                       lambda m: "1" * int(m.group(1)), v)
            v = v.replace("\\d+", "1").replace("\\d", "1")
            if re.fullmatch(pattern, v):
                return v
        return "X1"

    def required_attrs(etype):
        return {a: value_for(etype, a)
                for a in etypes[etype].get("requiredAttributes", [])}

    a = mk("A", root_type, attrs=required_attrs(root_type))
    b = mk("B", root_type, attrs=required_attrs(root_type))
    child_type = next((t for t in etypes if t != root_type), root_type)
    c = mk("C", child_type, parent=a, attrs=required_attrs(child_type))

    listing = client.get(f"/bharatlytics/v1/entities?companyId={cid}").get_json()
    by_name = {e["name"]: e for e in listing}
    assert by_name["C"]["parentId"]["$oid"] == a  # tree edge the JS renders

    # Edit modal re-parent: PUT with parentId rewrites the subtree path
    r = client.put(f"/bharatlytics/v1/entities/{c}",
                   json_body={"parentId": b})
    assert r.status_code == 200, r.text
    got = client.get(f"/bharatlytics/v1/entities/{c}").get_json()
    assert got["parentId"]["$oid"] == b
    assert [p["$oid"] for p in got["path"]] == [b]

    # details-pane Delete is recursive (entity + descendants)
    r = client.delete(f"/bharatlytics/v1/entities/{b}")
    assert r.status_code == 200
    names = {e["name"] for e in client.get(
        f"/bharatlytics/v1/entities?companyId={cid}").get_json()}
    assert "B" not in names and "C" not in names and "A" in names


def test_employees_page_route(client):
    """reference employee.py:519-521: GET /bharatlytics/v1/employees/page
    renders the employees page (template absent from the snapshot; here
    the admin employees workspace is that page)."""
    # the reference registers employee_bp under /employees yet the route
    # says '/employees/page' — the real path doubles the segment; keep it
    resp = client.get("/bharatlytics/v1/employees/employees/page")
    assert resp.status_code == 200
    assert resp.headers["Content-Type"].startswith("text/html")
    assert 'data-page="employees"' in resp.text
