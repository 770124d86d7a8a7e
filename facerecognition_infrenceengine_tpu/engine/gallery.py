"""Device-resident gallery manager.

Drop-in capability replacement for the reference's ``EmbeddingManager``
(reference infrenceServer.py:36-398; second copy peopleCount.py:695-819):
loads all employee/visitor embeddings, L2-normalizes, and keeps them in sync
with the store via ``lastUpdated`` delta polling on a background thread with
the same filtering semantics (active + non-blacklisted employees with
buffalo_l done, infrenceServer.py:94-100; visitors with buffalo_l done,
:227-232; inactive/blacklisted removal, :234-258).

TPU-first differences:
- the gallery is a padded device array ``[capacity, 512]`` + validity mask,
  so matching is one MXU matmul + ``top_k`` (ops/matching.py) instead of the
  reference's per-face Python loop (infrenceServer.py:538-542), and shards
  over a mesh via parallel/topk.py for multi-chip galleries;
- per-company views are cached snapshots refreshed on sync, not two Mongo
  queries per frame (the reference's get_embeddings_for_company,
  infrenceServer.py:343-380 — its hottest host-side bug).
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Dict, Tuple

import numpy as np

from ..core.config import Config, get_config
from ..core.serialization import deserialize_embedding
from ..store.client import Datastore
from ..store.objectid import ObjectId
from ..api.utils import get_current_utc

logger = logging.getLogger("fre.gallery")


def _normalize(vec: np.ndarray) -> np.ndarray:
    vec = np.asarray(vec, np.float32).reshape(-1)
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


def _next_capacity(n: int, block: int) -> int:
    cap = block
    while cap < n:
        cap *= 2
    return cap


class _CompanySnapshot:
    """Immutable per-company device view: ids + padded matrix + mask."""

    def __init__(self, ids, metadata, matrix, embed_dim, block,
                 dtype: str = "float32"):
        import jax.numpy as jnp

        self.ids = list(ids)
        self.metadata = metadata
        n = len(self.ids)
        cap = _next_capacity(max(n, 1), block)
        padded = np.zeros((cap, embed_dim), np.float32)
        if n:
            padded[:n] = matrix
        valid = np.zeros(cap, bool)
        valid[:n] = True
        # bfloat16 halves / int8 quarters the HBM traffic of the
        # bandwidth-bound match (EngineConfig.gallery_dtype; accuracy
        # tradeoffs documented there).  int8 uses ops/match_pallas's
        # global-scale quantization; its fused kernel is TPU-only, so the
        # XLA fallback dequantizes (CPU tests, k>1).
        self.dtype = dtype
        self.int8_scale = None
        if dtype == "int8":
            from ..ops.match_pallas import quantize_gallery

            q, self.int8_scale = quantize_gallery(padded)
            self.device_matrix = jnp.asarray(q)
        else:
            self.device_matrix = jnp.asarray(
                padded, jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
        self.device_valid = jnp.asarray(valid)
        self.size = n

    def _dense_matrix(self):
        """float view for the XLA/distributed paths (dequantizes int8)."""
        import jax.numpy as jnp

        if self.dtype != "int8":
            return self.device_matrix
        return self.device_matrix.astype(jnp.float32) * self.int8_scale

    def match(self, query_embeddings: np.ndarray, k: int = 1, mesh=None):
        """[B, D] normalized queries -> (scores [B, k], ids [B, k] of str|None)."""
        import jax.numpy as jnp

        from ..ops import match_pallas
        from ..ops.matching import cosine_topk
        from ..parallel.topk import distributed_topk

        if self.size == 0 or len(query_embeddings) == 0:
            b = len(query_embeddings)
            return np.full((b, k), -1.0, np.float32), [[None] * k for _ in range(b)]
        q32 = jnp.asarray(np.asarray(query_embeddings, np.float32))
        if mesh is not None:
            dense = self._dense_matrix()
            vals, idx = distributed_topk(
                q32.astype(dense.dtype), dense, self.device_valid, mesh, k=k)
        elif match_pallas.supported(len(query_embeddings),
                                    self.device_matrix, k):
            # Fused single-pass kernel: gallery bytes are the only HBM
            # traffic (no [B, N] score tensor, no top-k pass).
            if self.dtype == "int8":
                v1, i1 = match_pallas.gallery_top1_int8(
                    q32, self.device_matrix, self.int8_scale, self.size)
            else:
                v1, i1 = match_pallas.gallery_top1(
                    q32, self.device_matrix, self.size)
            vals, idx = v1[:, None], i1[:, None]
        else:
            dense = self._dense_matrix()
            vals, idx = cosine_topk(q32.astype(dense.dtype), dense,
                                    self.device_valid, k=k)
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        ids = [[self.ids[j] if 0 <= j < self.size and vals[b, i] > -np.inf else None
                for i, j in enumerate(row)] for b, row in enumerate(idx)]
        return vals, ids


class GalleryManager:
    def __init__(self, ds: Datastore, cfg: Config | None = None,
                 sync_interval_s: float | None = None, mesh=None,
                 initial_load: bool = True):
        cfg = cfg or get_config()
        self.ds = ds
        self.cfg = cfg
        self.mesh = mesh
        self.sync_interval = (sync_interval_s if sync_interval_s is not None
                              else cfg.sync.inference_sync_s)
        self._lock = threading.Lock()
        self.embeddings: Dict[str, np.ndarray] = {}
        self.metadata: Dict[str, dict] = {}
        self._company_ids: Dict[str, set] = {}  # company -> person-id set
        self._snapshots: Dict[str, _CompanySnapshot] = {}
        self._version = 0
        self.last_sync_time = None
        self.is_initial_load = True
        self.running = False
        self._thread = None
        if initial_load:
            self._initial_load()

    # ------------------------------------------------------------- loading
    def _initial_load(self):
        employees = list(self.ds.employee_info.find({
            "status": "active", "blacklisted": False,
            "employeeEmbeddings.buffalo_l.status": "done"}))
        visitors = list(self.ds.visitors.find({
            "visitorEmbeddings.buffalo_l.status": "done"}))
        self._load_updated(employees, visitors)
        self.last_sync_time = get_current_utc()
        self.is_initial_load = False
        logger.info("Initial gallery load: %d embeddings", len(self.embeddings))

    def _load_updated(self, employees, visitors):
        # GridFS reads + unpickling happen OUTSIDE the lock (they can take
        # seconds for a big delta); only the dict swap holds it, so matching
        # never stalls behind storage I/O.
        loaded: dict = {}
        meta: dict = {}
        for employee in employees:
            try:
                pid = str(employee["_id"])
                entry = employee["employeeEmbeddings"]["buffalo_l"]
                blob = self.ds.employee_embeddings.get(
                    ObjectId(str(entry["embeddingId"]))).read()
                loaded[pid] = _normalize(deserialize_embedding(blob))
                meta[pid] = {
                    "name": employee.get("employeeName", "Unknown"),
                    "employeeId": employee.get("employeeId", "Unknown"),
                    "email": employee.get("employeeEmail", ""),
                    "mobile": employee.get("employeeMobile", ""),
                    "type": "employee",
                    "companyId": str(employee.get("companyId")),
                    "lastUpdated": employee.get("lastUpdated"),
                }
            except Exception as e:  # skip unreadable entries, keep serving
                logger.error("employee embedding load failed for %s: %s",
                             employee.get("_id"), e)
        for visitor in visitors:
            try:
                pid = str(visitor["_id"])
                entry = (visitor.get("visitorEmbeddings") or {}).get("buffalo_l") or {}
                if entry.get("status") != "done" or not entry.get("embeddingId"):
                    continue
                blob = self.ds.visitor_embeddings.get(
                    ObjectId(str(entry["embeddingId"]))).read()
                loaded[pid] = _normalize(deserialize_embedding(blob))
                meta[pid] = {
                    "name": visitor.get("visitorName", "Unknown"),
                    "type": "visitor",
                    "companyId": str(visitor.get("companyId")),
                    "lastUpdated": visitor.get("lastUpdated"),
                }
            except Exception as e:
                logger.error("visitor embedding load failed for %s: %s",
                             visitor.get("_id"), e)
        if not loaded:
            return
        with self._lock:
            self.embeddings.update(loaded)
            self.metadata.update(meta)
            self._invalidate_locked()

    def _remove_inactive(self):
        inactive = self.ds.employee_info.find(
            {"$or": [{"status": {"$ne": "active"}}, {"blacklisted": True}]},
            {"_id": 1})
        inactive_ids = {str(d["_id"]) for d in inactive}
        # Hard-deleted people (DELETE mode=hard removes the doc entirely,
        # employee.py:457) never match the inactive query — check cached ids
        # still exist, else a deleted identity keeps matching until restart.
        with self._lock:
            cached = [ObjectId(pid) for pid in self.embeddings
                      if len(pid) == 24]
        existing: set = set()
        for coll in (self.ds.employee_info, self.ds.visitors):
            for d in coll.find({"_id": {"$in": cached}}, {"_id": 1}):
                existing.add(str(d["_id"]))
        with self._lock:
            removed = 0
            for pid in list(self.embeddings):
                if pid in inactive_ids or (len(pid) == 24 and pid not in existing):
                    del self.embeddings[pid]
                    self.metadata.pop(pid, None)
                    removed += 1
            if removed:
                self._invalidate_locked()
                logger.info("Removed %d inactive/deleted embeddings", removed)

    def _invalidate_locked(self):
        self._version += 1
        self._snapshots.clear()
        self._company_ids.clear()

    # ---------------------------------------------------------------- sync
    def start_sync(self):
        if self.running:
            return
        self.running = True
        self._thread = threading.Thread(target=self._sync_loop, daemon=True)
        self._thread.start()

    def stop_sync(self):
        self.running = False
        if self._thread:
            self._thread.join(timeout=5)

    def _sync_loop(self):
        while self.running:
            try:
                self._sync()
                time.sleep(self.sync_interval)
            except Exception as e:
                logger.error("sync loop error: %s", e)
                time.sleep(5)

    def _sync(self):
        if self.last_sync_time is None:
            return
        from ..core import metrics

        t0 = time.perf_counter()
        since = self.last_sync_time
        # Stamp the next watermark BEFORE querying: docs whose lastUpdated
        # lands while this sync runs must be re-read by the next delta sync
        # (re-reading a doc twice is harmless; skipping one loses a person
        # from the gallery until an unrelated later update).
        next_watermark = get_current_utc()
        updated_employees = list(self.ds.employee_info.find({
            "lastUpdated": {"$gte": since}, "status": "active",
            "blacklisted": False,
            "employeeEmbeddings.buffalo_l.status": "done"}))
        updated_visitors = list(self.ds.visitors.find({
            "lastUpdated": {"$gte": since},
            "visitorEmbeddings.buffalo_l.status": "done"}))
        self._remove_inactive()
        if updated_employees or updated_visitors:
            self._load_updated(updated_employees, updated_visitors)
        self.last_sync_time = next_watermark
        metrics.timer("gallery.sync").observe(time.perf_counter() - t0)
        metrics.gauge("gallery.size").set(len(self.embeddings))

    def force_sync(self):
        self._sync()

    # ------------------------------------------------------------ matching
    def _company_person_ids(self, company_id: str) -> set:
        ids = set()
        for doc in self.ds.employee_info.find(
                {"companyId": ObjectId(company_id), "status": "active",
                 "blacklisted": False}, {"_id": 1}):
            ids.add(str(doc["_id"]))
        for doc in self.ds.visitors.find(
                {"companyId": ObjectId(company_id)}, {"_id": 1}):
            ids.add(str(doc["_id"]))
        return ids

    def snapshot(self, company_id: str | None = None) -> _CompanySnapshot:
        """Device view for a company (or the whole gallery); cached per sync
        generation."""
        key = company_id or "__all__"
        with self._lock:
            snap = self._snapshots.get(key)
            if snap is not None:
                return snap
        # DB reads happen outside the lock (they can be slow); everything
        # touching self.embeddings happens inside ONE lock acquisition so a
        # concurrent _remove_inactive cannot delete a pid between the id
        # listing and the matrix build.  _version detects an invalidation
        # that raced the DB read — the stale snapshot must not be cached.
        with self._lock:
            version = self._version
        allowed = (None if company_id is None
                   else self._company_person_ids(company_id))
        with self._lock:
            ids = [pid for pid in self.embeddings
                   if allowed is None or pid in allowed]
            vecs = [self.embeddings[i] for i in ids]  # refs only; cheap
            meta = {i: self.metadata[i] for i in ids}
        # The expensive parts — stacking a possibly-hundreds-of-MB matrix
        # and uploading it to the device — run WITHOUT the lock so matching
        # and syncing never stall behind a snapshot rebuild.
        matrix = (np.stack(vecs) if ids
                  else np.zeros((0, self.cfg.engine.embed_dim), np.float32))
        snap = _CompanySnapshot(ids, meta, matrix,
                                self.cfg.engine.embed_dim,
                                self.cfg.engine.gallery_block,
                                dtype=self.cfg.engine.gallery_dtype)
        with self._lock:
            if self._version == version:
                self._snapshots[key] = snap
        return snap

    def match(self, query_embeddings, company_id: str | None = None, k: int = 1):
        """Match normalized queries; returns (scores, ids, metadata-dict)."""
        snap = self.snapshot(company_id)
        scores, ids = snap.match(query_embeddings, k=k, mesh=self.mesh)
        return scores, ids, snap.metadata

    # ----------------------------------------------- parity helper surface
    def get_embeddings_for_company(self, company_id: str) -> Tuple[dict, dict]:
        """Dict view (reference infrenceServer.py:343-380 contract)."""
        snap = self.snapshot(company_id)
        with self._lock:
            emb = {pid: self.embeddings[pid] for pid in snap.ids
                   if pid in self.embeddings}
        return emb, dict(snap.metadata)

    def get_all(self) -> Tuple[dict, dict]:
        """reference peopleCount.py:816-819."""
        with self._lock:
            return dict(self.embeddings), dict(self.metadata)

    def get_stats(self) -> dict:
        with self._lock:
            employees = sum(1 for m in self.metadata.values()
                            if m["type"] == "employee")
            visitors = sum(1 for m in self.metadata.values()
                           if m["type"] == "visitor")
            return {
                "total_embeddings": len(self.embeddings),
                "employees": employees,
                "visitors": visitors,
                "last_sync": (self.last_sync_time.isoformat()
                              if self.last_sync_time else None),
                "initial_load_complete": not self.is_initial_load,
            }
