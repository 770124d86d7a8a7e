"""Tests for the embedded Mongo-compatible document store + GridFS."""

import threading

import pytest

from facerecognition_infrenceengine_tpu.store import (
    Database,
    DuplicateKeyError,
    GridFS,
    InsertOne,
    ObjectId,
    UpdateOne,
    UpdateMany,
    DeleteOne,
    Datastore,
    init_db,
)
from facerecognition_infrenceengine_tpu.core.config import Config


@pytest.fixture
def db():
    return Database("test")


def test_objectid_roundtrip_and_validation():
    oid = ObjectId()
    assert len(str(oid)) == 24
    assert ObjectId(str(oid)) == oid
    assert ObjectId.is_valid(str(oid))
    assert not ObjectId.is_valid("nope")
    assert ObjectId() != ObjectId()


def test_insert_find_basic(db):
    c = db["things"]
    r = c.insert_one({"a": 1, "b": {"c": 2}})
    assert isinstance(r.inserted_id, ObjectId)
    doc = c.find_one({"a": 1})
    assert doc["b"]["c"] == 2
    assert c.find_one({"b.c": 2})["a"] == 1
    assert c.find_one({"a": 99}) is None
    assert c.count_documents({}) == 1


def test_find_by_objectid_string_coercion(db):
    c = db["things"]
    rid = c.insert_one({"x": 1}).inserted_id
    assert c.find_one({"_id": ObjectId(str(rid))})["x"] == 1


def test_query_operators(db):
    c = db["q"]
    c.insert_many([{"n": i, "tag": f"t{i%3}", "arr": [i, i + 10]} for i in range(10)])
    assert c.count_documents({"n": {"$gte": 5}}) == 5
    assert c.count_documents({"n": {"$lt": 3}}) == 3
    assert c.count_documents({"n": {"$lte": 3}}) == 4
    assert c.count_documents({"n": {"$in": [1, 2, 99]}}) == 2
    assert c.count_documents({"n": {"$nin": list(range(8))}}) == 2
    assert c.count_documents({"tag": {"$ne": "t0"}}) == 6
    assert c.count_documents({"missing": {"$exists": False}}) == 10
    assert c.count_documents({"arr": 12}) == 1  # array-contains
    assert c.count_documents({"$or": [{"n": 1}, {"n": 2}]}) == 2
    assert c.count_documents({"tag": {"$regex": "^t1$"}}) == 3


def test_sort_skip_limit_projection(db):
    c = db["s"]
    c.insert_many([{"n": i, "big": "x" * 5} for i in range(10)])
    docs = list(c.find({}).sort("n", -1).skip(2).limit(3))
    assert [d["n"] for d in docs] == [7, 6, 5]
    d = c.find_one({"n": 1}, {"n": 1})
    assert set(d) == {"_id", "n"}
    d = c.find_one({"n": 1}, {"big": 0})
    assert "big" not in d and d["n"] == 1


def test_update_operators(db):
    c = db["u"]
    c.insert_one({"a": 1, "arr": [1]})
    c.update_one({"a": 1}, {"$set": {"b.c": 5}, "$inc": {"a": 2},
                            "$push": {"arr": 9}, "$addToSet": {"arr": 1}})
    d = c.find_one({})
    assert d["a"] == 3 and d["b"]["c"] == 5 and d["arr"] == [1, 9]
    c.update_one({}, {"$pull": {"arr": 9}, "$unset": {"b": ""}})
    d = c.find_one({})
    assert d["arr"] == [1] and "b" not in d
    r = c.update_one({"a": 3}, {"$set": {"a": 3}})
    assert r.matched_count == 1 and r.modified_count == 0


def test_upsert_and_set_on_insert(db):
    c = db["up"]
    r = c.update_one({"k": "x"}, {"$set": {"v": 1}, "$setOnInsert": {"init": True}},
                     upsert=True)
    assert r.upserted_id is not None
    d = c.find_one({"k": "x"})
    assert d["v"] == 1 and d["init"] is True
    c.update_one({"k": "x"}, {"$set": {"v": 2}}, upsert=True)
    assert c.count_documents({}) == 1
    assert c.find_one({})["v"] == 2


def test_atomic_claim_pattern(db):
    """The trainingServer job-claim pattern (reference trainingServer.py:491-513)."""
    jobs = db["jobs"]
    jobs.insert_many([{"status": "queued", "i": i} for i in range(5)])
    claimed = [d["_id"] for d in jobs.find({"status": "queued"}).limit(3)]
    r = jobs.update_many({"_id": {"$in": claimed}, "status": "queued"},
                         {"$set": {"status": "started", "worker": "w1"}})
    assert r.modified_count == 3
    # second worker cannot double-claim
    r2 = jobs.update_many({"_id": {"$in": claimed}, "status": "queued"},
                          {"$set": {"status": "started", "worker": "w2"}})
    assert r2.modified_count == 0
    assert jobs.count_documents({"worker": "w1"}) == 3


def test_find_one_and_update(db):
    c = db["f"]
    c.insert_one({"s": "queued", "p": 1})
    before = c.find_one_and_update({"s": "queued"}, {"$set": {"s": "started"}})
    assert before["s"] == "queued"
    after = c.find_one_and_update({"s": "started"}, {"$set": {"p": 2}},
                                  return_document=True)
    assert after["p"] == 2


def test_bulk_write(db):
    c = db["b"]
    res = c.bulk_write([
        InsertOne({"k": 1}),
        InsertOne({"k": 2}),
        UpdateOne({"k": 1}, {"$set": {"u": True}}),
        UpdateMany({}, {"$set": {"m": 1}}),
        DeleteOne({"k": 2}),
    ])
    assert res.inserted_count == 2 and res.deleted_count == 1
    assert c.find_one({"k": 1})["u"] is True


def test_unique_index(db):
    c = db["uq"]
    c.create_index([("email", 1)], unique=True)
    c.insert_one({"email": "a@x.com"})
    with pytest.raises(DuplicateKeyError):
        c.insert_one({"email": "a@x.com"})
    c.insert_one({"email": "b@x.com"})


def test_no_aliasing(db):
    c = db["al"]
    src = {"a": {"b": 1}}
    c.insert_one(src)
    src["a"]["b"] = 999
    assert c.find_one({})["a"]["b"] == 1
    out = c.find_one({})
    out["a"]["b"] = 5
    assert c.find_one({})["a"]["b"] == 1


def test_aggregate_group(db):
    c = db["ag"]
    c.insert_many([
        {"host": "h1", "n": 1}, {"host": "h1", "n": 3}, {"host": "h2", "n": 5},
    ])
    rows = c.aggregate([
        {"$group": {"_id": "$host", "count": {"$sum": 1}, "total": {"$sum": "$n"}}},
        {"$sort": {"count": -1}},
    ])
    assert rows[0] == {"_id": "h1", "count": 2, "total": 4}
    assert rows[1] == {"_id": "h2", "count": 1, "total": 5}


def test_distinct(db):
    c = db["d"]
    c.insert_many([{"t": "a"}, {"t": "a"}, {"t": "b"}])
    assert sorted(c.distinct("t")) == ["a", "b"]


def test_concurrent_claims_are_exclusive(db):
    jobs = db["cj"]
    jobs.insert_many([{"status": "queued", "i": i} for i in range(50)])
    wins: list = []

    def worker(wid):
        for _ in range(50):
            doc = jobs.find_one_and_update(
                {"status": "queued"}, {"$set": {"status": "started", "w": wid}}
            )
            if doc is not None:
                wins.append(doc["i"])

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(wins) == list(range(50))  # every job claimed exactly once


def test_gridfs_roundtrip(db):
    fs = GridFS(db, collection="imgs")
    fid = fs.put(b"hello world", filename="f.jpg", metadata={"k": 1}, companyId="c1")
    out = fs.get(fid)
    assert out.read() == b"hello world"
    assert out.filename == "f.jpg"
    assert out.companyId == "c1"
    assert fs.exists(fid)
    assert fs.exists(str(fid))
    fs.delete(fid)
    assert not fs.exists(fid)


def test_gridfs_large_file(db):
    fs = GridFS(db)
    blob = bytes(range(256)) * 4096  # 1 MB, spans chunks
    fid = fs.put(blob, filename="big")
    assert fs.get(fid).read() == blob


def test_datastore_init_db():
    cfg = Config()
    ds = Datastore(cfg)
    init_db(ds)
    init_db(ds)  # idempotent
    templates = list(ds.entity_templates.find({}))
    assert len(templates) == 2
    names = {t["name"] for t in templates}
    assert names == {"Manufacturing Plant", "Office Building"}
    mt = next(t for t in templates if t["type"] == "manufacturing")
    assert "business_unit" in mt["structure"]["entityTypes"]
    assert mt["structure"]["defaultValidations"]["plantCode"] == "^PLT\\d{3}$"


# ------------------------------------------------ pymongo-parity regressions


def test_find_one_and_update_id_immutable(db):
    col = db["c"]
    col.insert_one({"_id": "A", "v": 1})
    with pytest.raises(ValueError):
        col.find_one_and_update({"_id": "A"}, {"$set": {"_id": "B"}})
    assert col.find_one({"_id": "A"})["v"] == 1


def test_limit_zero_means_no_limit(db):
    col = db["c"]
    for i in range(5):
        col.insert_one({"i": i})
    assert len(list(col.find({}).limit(0))) == 5  # pymongo semantics
    assert len(list(col.find({}).limit(-2))) == 2


def test_bulk_write_unordered_attempts_all(db):
    from facerecognition_infrenceengine_tpu.store.documents import (
        BulkWriteError, InsertOne)

    col = db["c"]
    col.create_index("k", unique=True)
    col.insert_one({"k": 1})
    reqs = [InsertOne({"k": 1}),   # dup -> error
            InsertOne({"k": 2})]   # must still run (ordered=False)
    with pytest.raises(BulkWriteError) as exc:
        col.bulk_write(reqs, ordered=False)
    assert exc.value.details["writeErrors"][0]["index"] == 0
    assert col.find_one({"k": 2}) is not None
    # ordered=True stops at the first failure
    col2 = db["c2"]
    col2.create_index("k", unique=True)
    col2.insert_one({"k": 1})
    with pytest.raises(BulkWriteError):
        col2.bulk_write([InsertOne({"k": 1}), InsertOne({"k": 3})],
                        ordered=True)
    assert col2.find_one({"k": 3}) is None


def test_unwind_scalar_passthrough(db):
    col = db["c"]
    col.insert_one({"a": "scalar"})
    col.insert_one({"a": ["x", "y"]})
    col.insert_one({"a": None})
    out = col.aggregate([{"$unwind": "$a"}])
    values = sorted(d["a"] for d in out)
    assert values == ["scalar", "x", "y"]  # scalar passes; null drops


def test_group_does_not_merge_across_types(db):
    col = db["c"]
    col.insert_one({"k": 1})
    col.insert_one({"k": "1"})
    out = col.aggregate([{"$group": {"_id": "$k", "n": {"$sum": 1}}}])
    assert len(out) == 2


def test_group_compound_id_resolved_per_doc(db):
    col = db["c"]
    col.insert_one({"d": "mon", "x": 1})
    col.insert_one({"d": "tue", "x": 1})
    col.insert_one({"d": "mon", "x": 1})
    out = col.aggregate([{"$group": {"_id": {"day": "$d"}, "n": {"$sum": 1}}}])
    by_day = {d["_id"]["day"]: d["n"] for d in out}
    assert by_day == {"mon": 2, "tue": 1}


def test_set_scalar_intermediate_raises(db):
    from facerecognition_infrenceengine_tpu.store.documents import WriteError

    col = db["c"]
    col.insert_one({"_id": "A", "a": 5})
    with pytest.raises(WriteError):
        col.update_one({"_id": "A"}, {"$set": {"a.b": 7}})
    assert col.find_one({"_id": "A"})["a"] == 5  # untouched


def test_objectid_does_not_match_hex_string(db):
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

    col = db["c"]
    oid = ObjectId()
    col.insert_one({"ref": oid})
    assert col.find_one({"ref": str(oid)}) is None  # pymongo never coerces
    assert col.find_one({"ref": oid}) is not None


def test_gridfs_duplicate_id_leaves_original_intact(db):
    from facerecognition_infrenceengine_tpu.store.gridfs import GridFS
    from facerecognition_infrenceengine_tpu.store.documents import DuplicateKeyError
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

    fs = GridFS(db, collection="t")
    fid = ObjectId()
    fs.put(b"original-bytes", _id=fid)
    with pytest.raises(DuplicateKeyError):
        fs.put(b"other-bytes", _id=fid)
    assert fs.get(fid).read() == b"original-bytes"  # no chunk interleaving


def test_file_persistence_roundtrip(tmp_path):
    from facerecognition_infrenceengine_tpu.store.documents import Database
    from facerecognition_infrenceengine_tpu.store.gridfs import GridFS
    from facerecognition_infrenceengine_tpu.store.objectid import ObjectId

    d = str(tmp_path / "store")
    db1 = Database("testdb", persist_dir=d)
    db1["people"].create_index("email", unique=True)
    oid = db1["people"].insert_one({"name": "A", "email": "a@x",
                                    "ref": ObjectId()}).inserted_id
    fs1 = GridFS(db1, collection="blobs")
    fid = fs1.put(b"payload-bytes", filename="f.bin")
    db1.close()  # flush

    db2 = Database("testdb", persist_dir=d)  # fresh process simulation
    doc = db2["people"].find_one({"_id": oid})
    assert doc["name"] == "A" and isinstance(doc["ref"], ObjectId)
    # unique index survived the reload
    import pytest as _pytest
    from facerecognition_infrenceengine_tpu.store.documents import DuplicateKeyError
    with _pytest.raises(DuplicateKeyError):
        db2["people"].insert_one({"email": "a@x"})
    assert GridFS(db2, collection="blobs").get(fid).read() == b"payload-bytes"
    db2.close()


def test_drop_collection_persists(tmp_path):
    """drop_collection alone must dirty the db: with no later mutation, the
    next flush has to omit the dropped collection or it resurrects on load."""
    from facerecognition_infrenceengine_tpu.store.documents import Database

    d = str(tmp_path / "store")
    db1 = Database("testdb", persist_dir=d)
    db1["gone"].insert_one({"x": 1})
    db1["kept"].insert_one({"y": 2})
    db1.flush()
    db1.drop_collection("gone")
    db1.close()  # flush; only the drop happened since the last flush

    db2 = Database("testdb", persist_dir=d)
    assert db2["gone"].count_documents({}) == 0
    assert db2["kept"].count_documents({}) == 1
    db2.close()


def test_file_uri_selects_persistent_backend(tmp_path):
    from facerecognition_infrenceengine_tpu.core.config import Config, DBConfig
    from facerecognition_infrenceengine_tpu.store import Datastore

    d = str(tmp_path / "ds")
    cfg = Config(db=DBConfig(mongodb_uri=f"file://{d}",
                             database_name="bharatlytics", persist_dir=""))
    ds1 = Datastore(cfg)
    ds1.companies.insert_one({"companyName": "PersistCo"})
    ds1.db.flush()
    ds2 = Datastore(cfg)
    assert ds2.companies.find_one({"companyName": "PersistCo"}) is not None
    ds1.db.close()
    ds2.db.close()


def test_id_point_lookup_fast_path_semantics(db):
    """find/update/delete with an equality _id filter route through the
    _id-keyed dict (no collection scan) but must keep full filter
    semantics: strict ObjectId/str typing and additional conditions."""
    col = db["c"]
    oid = ObjectId()
    col.insert_one({"_id": oid, "status": "queued", "n": 1})
    col.insert_one({"_id": "plain-string-id", "status": "done"})

    # hex string must NOT match an ObjectId _id even though the storage
    # key collides (_id_key collapses both to the hex string)
    assert col.find_one({"_id": str(oid)}) is None
    assert col.find_one({"_id": oid})["n"] == 1
    assert col.find_one({"_id": "plain-string-id"})["status"] == "done"

    # extra filter conditions still apply on the point lookup
    assert col.find_one({"_id": oid, "status": "done"}) is None
    assert col.update_one({"_id": oid, "status": "done"},
                          {"$set": {"n": 9}}).matched_count == 0
    assert col.update_one({"_id": oid, "status": "queued"},
                          {"$set": {"n": 2}}).modified_count == 1
    assert col.find_one({"_id": oid})["n"] == 2
    assert col.count_documents({"_id": oid}) == 1
    assert col.delete_one({"_id": str(oid)}).deleted_count == 0
    assert col.delete_many({"_id": oid}).deleted_count == 1
    # operator-shaped _id filters fall back to the scan
    col.insert_one({"_id": "a"})
    col.insert_one({"_id": "b"})
    assert col.count_documents({"_id": {"$in": ["a", "b"]}}) == 2


def test_id_point_lookup_is_not_a_scan(db):
    """Comparative bound (robust to machine speed): 300 _id lookups in a
    30k-doc collection must cost far less than 30 full scans."""
    import time

    col = db["c"]
    ids = [ObjectId() for _ in range(30_000)]
    for i, oid in enumerate(ids):
        col.insert_one({"_id": oid, "i": i})

    t0 = time.perf_counter()
    for oid in ids[::100]:  # 300 point lookups
        assert col.find_one({"_id": oid}) is not None
    t_point = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(30):  # 30 scans (non-indexed field equality)
        assert col.find_one({"i": i * 997}) is not None
    t_scan = time.perf_counter() - t0

    assert t_point < t_scan, (t_point, t_scan)


def test_gridfs_point_lookup_chunks_and_legacy_fallback(db):
    from facerecognition_infrenceengine_tpu.store.gridfs import (
        CHUNK_SIZE, GridFS)

    fs = GridFS(db, "bucket")
    big = bytes(range(256)) * ((2 * CHUNK_SIZE + 1000) // 256 + 1)
    fid = fs.put(big, filename="big.bin")
    assert fs.get(fid).read() == big  # 3-chunk roundtrip via point lookups

    # legacy layout (pre-addressable chunk ids): ObjectId chunk _ids,
    # only files_id/n fields — reads must fall back to the files_id scan
    legacy_id = ObjectId()
    db["bucket.files"].insert_one({"_id": legacy_id, "length": len(big),
                                   "chunkSize": CHUNK_SIZE, "filename": "l"})
    for n in range(3):
        db["bucket.chunks"].insert_one(
            {"files_id": legacy_id, "n": n,
             "data": big[n * CHUNK_SIZE:(n + 1) * CHUNK_SIZE]})
    assert fs.get(legacy_id).read() == big
    fs.delete(legacy_id)  # legacy sweep removes scan-layout chunks
    assert db["bucket.chunks"].count_documents({"files_id": legacy_id}) == 0

    fs.delete(fid)
    assert db["bucket.chunks"].count_documents({}) == 0
    assert db["bucket.files"].count_documents({}) == 0

    # empty payload still roundtrips (single empty chunk)
    eid = fs.put(b"", filename="empty")
    assert fs.get(eid).read() == b""


def test_equality_index_maps_stay_consistent(db):
    """Leftmost-index-field hash maps must track every mutation path and
    never change result sets (candidates are re-verified by _match_doc)."""
    col = db["c"]
    col.create_index([("campus_id", 1), ("status", 1)])

    col.insert_one({"_id": "p1", "campus_id": "A", "status": "inside"})
    col.insert_one({"_id": "p2", "campus_id": "A", "status": "outside"})
    col.insert_one({"_id": "p3", "campus_id": "B", "status": "inside"})
    assert col.count_documents({"campus_id": "A"}) == 2
    assert col.count_documents({"campus_id": "A", "status": "inside"}) == 1

    # update moves a doc between buckets
    col.update_one({"_id": "p2"}, {"$set": {"campus_id": "B"}})
    assert col.count_documents({"campus_id": "A"}) == 1
    assert col.count_documents({"campus_id": "B"}) == 2

    # find_one_and_update and delete maintain the map
    col.find_one_and_update({"campus_id": "B", "status": "outside"},
                            {"$set": {"campus_id": "C"}})
    assert col.count_documents({"campus_id": "C"}) == 1
    col.delete_many({"campus_id": "B"})
    assert col.count_documents({"campus_id": "B"}) == 0

    # upsert through an indexed filter lands in the right bucket
    col.update_one({"campus_id": "D", "person": "x"},
                   {"$set": {"status": "inside"}}, upsert=True)
    assert col.count_documents({"campus_id": "D"}) == 1

    # None equality must bypass the map: literal None also matches docs
    # missing the field entirely
    col.insert_one({"_id": "nof"})  # no campus_id at all
    col.insert_one({"_id": "nul", "campus_id": None})
    assert col.count_documents({"campus_id": None}) == 2

    # a multikey (list) value disables the map but keeps array-contains
    # equality semantics via the scan
    col.insert_one({"_id": "mk", "campus_id": ["A", "E"]})
    assert col.count_documents({"campus_id": "E"}) == 1
    assert col.count_documents({"campus_id": "A"}) == 2  # scalar + array


def test_equality_index_rebuilt_from_snapshot(tmp_path):
    d = str(tmp_path / "ds")
    db1 = Database("t", persist_dir=d)
    col = db1["c"]
    col.create_index([("k", 1)])
    col.insert_one({"k": "v", "n": 1})
    db1.flush()
    db2 = Database("t", persist_dir=d)
    assert db2["c"]._field_maps["k"], "maps must be rebuilt on load"
    assert db2["c"].find_one({"k": "v"})["n"] == 1
    db1.close()
    db2.close()


def test_equality_index_is_not_a_scan(db):
    import time

    col = db["c"]
    col.create_index([("status", 1)])
    for i in range(30_000):
        col.insert_one({"i": i, "status": "done" if i % 2 else "queued"})
    col.insert_one({"i": -1, "status": "rare"})

    t0 = time.perf_counter()
    for _ in range(100):
        assert col.find_one({"status": "rare"}) is not None
    t_indexed = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        assert col.find_one({"i": 29_999}) is not None  # unindexed scan
    t_scan = time.perf_counter() - t0
    assert t_indexed < t_scan, (t_indexed, t_scan)


def test_mongodb_uri_without_pymongo_raises_clearly():
    """The reference runs on pymongo/Atlas (reference db/__init__.py:8-26);
    this image has no pymongo, so the passthrough branch can only be pinned
    to its failure contract here: a mongodb:// URI without pymongo must
    raise the actionable RuntimeError, never fall back silently to the
    embedded store (serving against the wrong datastore would look healthy
    while reading nothing)."""
    import dataclasses

    import pytest

    from facerecognition_infrenceengine_tpu.core.config import Config
    from facerecognition_infrenceengine_tpu.store.client import Datastore

    try:
        import pymongo  # noqa: F401
        pytest.skip("pymongo installed: passthrough branch is live")
    except ImportError:
        pass
    cfg = Config()
    cfg = dataclasses.replace(cfg, db=dataclasses.replace(
        cfg.db, mongodb_uri="mongodb://example.invalid:27017"))
    with pytest.raises(RuntimeError, match="pymongo"):
        Datastore(cfg)
