"""Embedded document-store scaling benchmark (CPU-only; no TPU needed).

Reproduces the numbers behind the store's fast-path claims:

- _id point lookups resolve through the _id-keyed dict (O(1)), not a scan;
- equality filters on indexed lead fields resolve through per-field hash
  maps (documents.py _candidates), so the campus flush loop's
  {person_id, campus_id} updates and unique-index insert checks stay flat
  as collections grow;
- GridFS reads are point lookups per chunk ('<file_id>:<n>' chunk ids),
  independent of bucket size.

Run: python benchmarks/store_scaling.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from facerecognition_infrenceengine_tpu.store import (  # noqa: E402
    Database,
    ObjectId,
    UpdateOne,
)
from facerecognition_infrenceengine_tpu.store.gridfs import GridFS  # noqa: E402


def main(n: int = 100_000) -> None:
    db = Database("bench")

    # ---- people_status: unique-index seeding + campus flush shape ----
    people = db["people_status"]
    people.create_index([("person_id", 1), ("campus_id", 1)], unique=True)
    t0 = time.perf_counter()
    for i in range(n):
        people.insert_one({"person_id": f"p{i}", "campus_id": "A",
                           "status": "inside"})
    t_seed = time.perf_counter() - t0
    print(f"seed {n:,} docs w/ unique index: {t_seed:7.2f} s "
          f"({n / t_seed:,.0f} inserts/s)")

    ops = [UpdateOne({"person_id": f"p{(i * 997) % n}", "campus_id": "A"},
                     {"$set": {"status": "outside"}}, True)
           for i in range(50)]
    t0 = time.perf_counter()
    people.bulk_write(ops)
    print(f"50-op campus flush:            {(time.perf_counter() - t0) * 1e3:7.2f} ms")

    # ---- _id point lookups ----
    col = db["docs"]
    ids = [col.insert_one({"i": i}).inserted_id for i in range(n)]
    t0 = time.perf_counter()
    for oid in ids[:: max(1, n // 200)]:
        assert col.find_one({"_id": oid}) is not None
    n_ops = len(ids[:: max(1, n // 200)])
    print(f"_id point lookup:              {(time.perf_counter() - t0) / n_ops * 1e6:7.1f} us/op")

    t0 = time.perf_counter()
    col.find_one({"i": n - 1})
    print(f"unindexed scan (reference):    {(time.perf_counter() - t0) * 1e3:7.2f} ms/op")

    # ---- embedding-job claim shape (indexed status) ----
    jobs = db["embeddingJobs"]
    jobs.create_index([("status", 1)])
    for i in range(n // 10):
        jobs.insert_one({"status": "done", "model": "buffalo_l", "i": i})
    for i in range(5):
        jobs.insert_one({"status": "queued", "model": "buffalo_l", "i": i})
    t0 = time.perf_counter()
    claimed = list(jobs.find({"status": "queued", "model": "buffalo_l"}))
    print(f"queued-job claim query:        {(time.perf_counter() - t0) * 1e3:7.2f} ms "
          f"({len(claimed)} of {n // 10 + 5:,} jobs)")

    # ---- GridFS reads ----
    fs = GridFS(db, "embeddings")
    fids = [fs.put(b"x" * 2048, filename=f"e{i}.pkl") for i in range(n // 10)]
    t0 = time.perf_counter()
    for fid in fids[:: max(1, len(fids) // 100)]:
        assert len(fs.get(fid).read()) == 2048
    n_ops = len(fids[:: max(1, len(fids) // 100)])
    print(f"gridfs get ({len(fids):,}-file bucket): {(time.perf_counter() - t0) / n_ops * 1e6:6.1f} us/op")

    # ---- fre:// wire overhead (store.server over loopback) ----
    from facerecognition_infrenceengine_tpu.store.remote import RemoteDatabase
    from facerecognition_infrenceengine_tpu.store.server import StoreServer

    srv = StoreServer(port=0)
    srv.start()
    try:
        rdb = RemoteDatabase("127.0.0.1", srv._port, name="bench")
        rcol = rdb["wire"]
        m = max(200, n // 100)
        t0 = time.perf_counter()
        for i in range(m):
            rcol.insert_one({"i": i})
        per = (time.perf_counter() - t0) / m
        print(f"fre:// insert_one:             {per * 1e6:7.1f} us/op "
              f"({1 / per:,.0f} ops/s over loopback)")
        t0 = time.perf_counter()
        rcol.insert_many([{"j": i} for i in range(m)])
        per_batch = (time.perf_counter() - t0) / m
        print(f"fre:// insert_many (1 frame):  {per_batch * 1e6:7.1f} us/doc")
        oid = rcol.insert_one({"k": 1}).inserted_id
        t0 = time.perf_counter()
        for _ in range(m):
            rcol.find_one({"_id": oid})
        per = (time.perf_counter() - t0) / m
        print(f"fre:// _id point lookup:       {per * 1e6:7.1f} us/op")
        rdb.close()
    finally:
        srv.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100_000)
