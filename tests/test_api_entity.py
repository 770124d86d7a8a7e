"""Contract tests: entity-hierarchy API (definitions, tree ops, assets,
manager assignment, employee queries)."""

import pytest

from facerecognition_infrenceengine_tpu.api import create_app
from facerecognition_infrenceengine_tpu.core.config import Config
from facerecognition_infrenceengine_tpu.store import Datastore

JPEG = b"\xff\xd8\xff\xe0" + b"fake" * 10
P = "/bharatlytics/v1"


@pytest.fixture
def app(store_cfg):
    # store_cfg (conftest) runs this whole contract suite over BOTH the
    # embedded store and the fre:// wire server
    return create_app(Datastore(store_cfg), store_cfg)


@pytest.fixture
def client(app):
    return app.test_client()


@pytest.fixture
def ctx(client):
    """company + definition-from-template + root entity."""
    cid = client.post(f"{P}/companies/seed").get_json()["company"]["_id"]
    templates = client.get(f"{P}/entity-templates").get_json()
    mfg = next(t for t in templates if t["type"] == "manufacturing")
    r = client.post(f"{P}/entity-definitions/from-template",
                    json_body={"templateId": mfg["_id"], "companyId": cid,
                               "name": "Plant Org"})
    assert r.status_code == 201
    def_id = r.get_json()["id"]
    r = client.post(f"{P}/entities", json_body={
        "name": "BU North", "type": "business_unit", "companyId": cid,
        "definitionId": def_id, "attributes": {"buCode": "BU001"}})
    assert r.status_code == 201, r.text
    root_id = r.get_json()["id"]
    return cid, def_id, root_id


def make_employee(client, cid, emp_id, **extra):
    files = {p: (f"{p}.jpg", JPEG, "image/jpeg") for p in ("center", "left", "right")}
    r = client.post(f"{P}/employees/register",
                    data={"employeeId": emp_id, "employeeName": f"Emp {emp_id}",
                          "companyId": cid, **extra}, files=files)
    assert r.status_code == 200
    return emp_id


def test_templates_have_graph_elements(client):
    templates = client.get(f"{P}/entity-templates").get_json()
    assert len(templates) == 2
    mfg = next(t for t in templates if t["type"] == "manufacturing")
    node_ids = {e["data"]["id"] for e in mfg["graphElements"]
                if "entity-type" in e["classes"]}
    assert {"business_unit", "plant", "department", "line",
            "workstation"} <= node_ids
    edges = [e for e in mfg["graphElements"] if "relationship" in e["classes"]]
    assert any(e["data"]["source"] == "plant" and e["data"]["target"] == "department"
               for e in edges)


def test_definition_validation(client, ctx):
    cid, def_id, root_id = ctx
    # disallowed type
    r = client.post(f"{P}/entities", json_body={
        "name": "X", "type": "spaceship", "companyId": cid,
        "definitionId": def_id})
    assert r.status_code == 400
    assert "not allowed" in r.get_json()["error"]
    # missing required attribute
    r = client.post(f"{P}/entities", json_body={
        "name": "P1", "type": "plant", "companyId": cid,
        "definitionId": def_id, "parentId": root_id, "attributes": {}})
    assert r.status_code == 400
    assert "Required attribute" in r.get_json()["error"]
    # invalid relationship (workstation directly under business_unit)
    r = client.post(f"{P}/entities", json_body={
        "name": "W1", "type": "workstation", "companyId": cid,
        "definitionId": def_id, "parentId": root_id,
        "attributes": {"stationCode": "WS001", "status": "active"}})
    assert r.status_code == 400
    assert "Invalid parent-child relationship" in r.get_json()["error"]
    # disallowed attribute value
    r = client.post(f"{P}/entities", json_body={
        "name": "P1", "type": "plant", "companyId": cid,
        "definitionId": def_id, "parentId": root_id,
        "attributes": {"location": "Pune", "plantCode": "PLT001",
                       "type": "casino"}})
    assert r.status_code == 400
    assert "Invalid value" in r.get_json()["error"]


def build_tree(client, cid, def_id, root_id):
    def mk(name, etype, parent, attrs):
        r = client.post(f"{P}/entities", json_body={
            "name": name, "type": etype, "companyId": cid,
            "definitionId": def_id, "parentId": parent, "attributes": attrs})
        assert r.status_code == 201, r.text
        return r.get_json()["id"]

    plant = mk("Plant A", "plant", root_id,
               {"location": "Pune", "plantCode": "PLT001"})
    dept = mk("Assembly", "department", plant, {"departmentCode": "DEP001"})
    line = mk("Line 1", "line", dept, {"lineCode": "LN001", "capacity": 100})
    return plant, dept, line


def test_tree_navigation_and_move(client, ctx):
    cid, def_id, root_id = ctx
    plant, dept, line = build_tree(client, cid, def_id, root_id)
    # children
    children = client.get(f"{P}/entities/{root_id}/children").get_json()
    assert len(children) == 1 and children[0]["name"] == "Plant A"
    # descendants (extended JSON ids)
    desc = client.get(f"{P}/entities/{root_id}/descendants").get_json()
    assert {d["name"] for d in desc} == {"Plant A", "Assembly", "Line 1"}
    assert desc[0]["_id"].keys() == {"$oid"}  # json_util wire format
    # ancestors
    anc = client.get(f"{P}/entities/{line}/ancestors").get_json()
    assert {a["name"] for a in anc} == {"BU North", "Plant A", "Assembly"}
    # move line under a second department
    dept2 = client.post(f"{P}/entities", json_body={
        "name": "QA", "type": "department", "companyId": cid,
        "definitionId": def_id, "parentId": plant,
        "attributes": {"departmentCode": "DEP002"}}).get_json()["id"]
    r = client.post(f"{P}/entities/{line}/move", json_body={"newParentId": dept2})
    assert r.status_code == 200
    anc = client.get(f"{P}/entities/{line}/ancestors").get_json()
    assert {a["name"] for a in anc} == {"BU North", "Plant A", "QA"}
    # cannot move an entity under its own descendant
    r = client.post(f"{P}/entities/{plant}/move", json_body={"newParentId": line})
    assert r.status_code == 400


def test_recursive_delete(client, ctx):
    cid, def_id, root_id = ctx
    plant, dept, line = build_tree(client, cid, def_id, root_id)
    r = client.delete(f"{P}/entities/{plant}")
    assert r.status_code == 200
    remaining = client.get(f"{P}/entities?companyId={cid}").get_json()
    assert [e["name"] for e in remaining] == ["BU North"]


def test_link_employee_and_queries(client, ctx, app):
    cid, def_id, root_id = ctx
    plant, dept, line = build_tree(client, cid, def_id, root_id)
    make_employee(client, cid, "E1")
    make_employee(client, cid, "E2", employeeReportingId="E1")
    # link employees to entities
    r = client.post(f"{P}/entities/{dept}/employees", json_body={"employeeId": "E1"})
    assert r.status_code == 200
    r = client.post(f"{P}/entities/{line}/employees", json_body={"employeeId": "E2"})
    assert r.status_code == 200
    # entity employees incl. sub-entities
    r = client.get(f"{P}/entities/{plant}/employees?companyId={cid}")
    out = r.get_json()
    assert out["totalEmployees"] == 2
    # reportees
    r = client.get(f"{P}/employees/E1/reportees?companyId={cid}")
    out = r.get_json()
    assert out["totalReportees"] == 1
    assert out["reportees"][0]["employeeId"] == "E2"
    # search by term
    r = client.get(f"{P}/employees/search?companyId={cid}&search=E2")
    assert r.get_json()["totalEmployees"] == 1
    # reporting tree
    r = client.get(f"{P}/employees/reporting-tree/E2?companyId={cid}")
    tree = r.get_json()
    assert tree["managementChain"][0]["employeeId"] == "E1"
    # company isolation: wrong company rejected
    r = client.get(f"{P}/entities/{plant}/employees?companyId="
                   f"{'0'*24}")
    assert r.status_code == 403


def test_manager_assignment(client, ctx, app):
    cid, def_id, root_id = ctx
    plant, dept, line = build_tree(client, cid, def_id, root_id)
    make_employee(client, cid, "M1")
    r = client.put(f"{P}/entities/{plant}/manager", json_body={"employeeId": "M1"})
    assert r.status_code == 200
    assert r.get_json()["designation"] == "PLANT_HEAD"
    # designation written back to the employee
    emp = app.datastore.employee_info.find_one({"employeeId": "M1"})
    assert emp["employeeDesignation"] == "PLANT_HEAD"
    r = client.get(f"{P}/entities/{plant}/manager")
    out = r.get_json()
    assert out["manager"]["status"] == "filled"
    assert out["manager"]["employeeName"] == "Emp M1"
    r = client.delete(f"{P}/entities/{plant}/manager")
    assert r.status_code == 200
    assert client.get(f"{P}/entities/{plant}/manager").get_json()[
        "manager"]["status"] == "vacant"


def test_max_children_constraint(client):
    """Office template caps floor->zone at 10 children."""
    cid = client.post(f"{P}/companies/seed").get_json()["company"]["_id"]
    templates = client.get(f"{P}/entity-templates").get_json()
    office = next(t for t in templates if t["type"] == "office")
    def_id = client.post(f"{P}/entity-definitions/from-template",
                         json_body={"templateId": office["_id"],
                                    "companyId": cid,
                                    "name": "HQ"}).get_json()["id"]
    bld = client.post(f"{P}/entities", json_body={
        "name": "HQ Tower", "type": "building", "companyId": cid,
        "definitionId": def_id,
        "attributes": {"buildingCode": "BLD001", "address": "X"}}).get_json()["id"]
    floor = client.post(f"{P}/entities", json_body={
        "name": "F1", "type": "floor", "companyId": cid,
        "definitionId": def_id, "parentId": bld,
        "attributes": {"floorNumber": "1"}}).get_json()["id"]
    for i in range(10):
        r = client.post(f"{P}/entities", json_body={
            "name": f"Z{i}", "type": "zone", "companyId": cid,
            "definitionId": def_id, "parentId": floor,
            "attributes": {"zoneCode": f"Z{i:03d}", "purpose": "workspace"}})
        assert r.status_code == 201
    r = client.post(f"{P}/entities", json_body={
        "name": "Z10", "type": "zone", "companyId": cid,
        "definitionId": def_id, "parentId": floor,
        "attributes": {"zoneCode": "Z010", "purpose": "workspace"}})
    assert r.status_code == 400
    assert "Maximum number" in r.get_json()["error"]


def test_template_clone(client, ctx):
    cid, _, _ = ctx
    templates = client.get(f"{P}/entity-templates").get_json()
    mfg = next(t for t in templates if t["type"] == "manufacturing")
    r = client.post(f"{P}/entities/templates/{mfg['_id']}/clone",
                    json_body={"name": "My Custom Mfg", "companyId": cid})
    assert r.status_code == 201
    new_id = r.get_json()["id"]
    t = client.get(f"{P}/entity-templates/{new_id}").get_json()
    assert t["name"] == "My Custom Mfg"
    assert t["clonedFrom"] == mfg["_id"]
    assert "graphElements" in t


def test_entity_regex_validation_enforced(client):
    company_id = client.post(
        "/bharatlytics/v1/companies/seed").get_json()["company"]["_id"]
    tpl = client.get("/bharatlytics/v1/entities/templates").get_json()
    office = next(t for t in tpl if t["type"] == "office")
    did = client.post("/bharatlytics/v1/entity-definitions/from-template",
                      json_body={"templateId": office["_id"],
                                 "companyId": company_id,
                                 "name": "hq"}).get_json()["id"]
    # buildingCode must match ^BLD\d{3}$ (seeded defaultValidations)
    bad = client.post("/bharatlytics/v1/entities",
                      json_body={"name": "B", "type": "building",
                                 "definitionId": did, "companyId": company_id,
                                 "attributes": {"buildingCode": "nope",
                                                "address": "x"}})
    assert bad.status_code == 400
    assert "validation pattern" in bad.get_json()["error"]
    good = client.post("/bharatlytics/v1/entities",
                       json_body={"name": "B", "type": "building",
                                  "definitionId": did, "companyId": company_id,
                                  "attributes": {"buildingCode": "BLD001",
                                                 "address": "x"}})
    assert good.status_code == 201, good.text


# ------------------------------------------ round-5 deep-review pins
def test_create_asset_employee_type_queryable(client, ctx, app):
    """POST /assets with type=employee must produce a document the
    employee-listing/search endpoints can read (metadata.employeeId set) —
    the /entities/<id>/employees path already did."""
    cid, def_id, root_id = ctx
    plant, dept, line = build_tree(client, cid, def_id, root_id)
    make_employee(client, cid, "A1")
    r = client.post(f"{P}/assets", json_body={
        "entityId": dept, "type": "employee", "employeeId": "A1",
        "name": "A1 link"})
    assert r.status_code == 201, r.text
    # the listing endpoint that KeyError-500'd on assets from this path
    r = client.get(f"{P}/entities/{plant}/employees?companyId={cid}")
    assert r.status_code == 200, r.text
    assert any(e["employeeId"] == "A1" for e in r.get_json()["employees"])


def test_update_entity_coerces_company_id(client, ctx, app):
    """PUT /entities/<id> with a string companyId must not detach the
    entity from ObjectId-scoped queries."""
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

    cid, def_id, root_id = ctx
    r = client.put(f"{P}/entities/{root_id}",
                   json_body={"companyId": cid, "name": "BU North v2"})
    assert r.status_code == 200, r.text
    doc = app.datastore.entities.find_one({"_id": ObjectId(root_id)})
    assert isinstance(doc["companyId"], ObjectId)
    # still visible to the tenant-scoped listing
    r = client.get(f"{P}/entities?companyId={cid}")
    listed = r.get_json()  # extended JSON: _id is {"$oid": hex}
    ids = [e["_id"].get("$oid") if isinstance(e["_id"], dict) else e["_id"]
           for e in listed]
    assert root_id in ids
    # garbage companyId is a 400, not silent corruption
    r = client.put(f"{P}/entities/{root_id}",
                   json_body={"companyId": "not-an-oid"})
    assert r.status_code == 400


def test_assign_manager_without_designation_keeps_existing(client, ctx, app):
    """A definition entityType with no 'designation' must not erase the
    employee's existing designation with None, and the employee's
    timestamp field is lastUpdated (schema convention)."""
    cid, def_id, root_id = ctx
    make_employee(client, cid, "M9", employeeDesignation="Fitter")
    # business_unit root: strip its designation from the definition
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

    ddoc = app.datastore.entity_definitions.find_one({"_id": ObjectId(def_id)})
    ddoc["structure"]["entityTypes"]["business_unit"].pop("designation", None)
    app.datastore.entity_definitions.update_one(
        {"_id": ddoc["_id"]}, {"$set": {"structure": ddoc["structure"]}})
    r = client.put(f"{P}/entities/{root_id}/manager",
                   json_body={"employeeId": "M9"})
    assert r.status_code == 200, r.text
    emp = app.datastore.employee_info.find_one({"employeeId": "M9"})
    assert emp["employeeDesignation"] == "Fitter"
    assert "updatedAt" not in emp
