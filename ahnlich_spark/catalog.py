"""Store catalog: schemas -> stores -> {dimension, indexed predicates,
ANN index configs, AI model bindings}, persisted as JSON.

Mirrors the reference's in-memory registry (ahnlich/db/src/engine/
store.rs:742-758 `Store`, schema namespace ahnlich/types/src/
schema.rs:14-18): the default schema is ``public`` and cannot be
dropped (store.rs:718-724). In Spark the catalog only records layout
metadata — predicate "indexes" change nothing semantically (Catalyst
filter pushdown covers both paths), they are bookkeeping plus an
optional physical-layout hint.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
from dataclasses import dataclass, field, fields, asdict
from typing import Dict, List, Optional

from ahnlich_spark import errors

PUBLIC_SCHEMA = "public"

HNSW_DEFAULTS = {
    # reference defaults: ahnlich/similarity/src/hnsw/mod.rs:285-296
    "m": 16,
    "m0": 32,
    "ef_construction": 100,
    "distance": "cosine_similarity",
}


@dataclass
class AiBinding:
    query_model: str
    index_model: str
    store_original: bool = False


@dataclass
class StoreMeta:
    name: str
    schema: str
    dimension: int
    predicates: List[str] = field(default_factory=list)
    non_linear: List[str] = field(default_factory=list)  # 'kdtree' | 'hnsw'
    non_linear_config: Dict[str, dict] = field(default_factory=dict)
    version: int = 0  # 0 = empty, base lives at data/<schema>/<store>/v<version>
    # number of delta segments layered over the current base version
    # (segment i lives at d<version>_<i>); mutations append one segment
    # instead of rewriting the base — merged keep-last-by-id at read
    deltas: int = 0
    ai: Optional[AiBinding] = None
    # cached catalog statistics: live row count and on-disk bytes of the
    # current version + delta chain, maintained incrementally from the
    # counts mutations already compute so ListStores/GetStore on a
    # populated 100 TB store launch ZERO scans. -1 = dirty -> the next
    # info call recomputes once and re-caches (the reference's cached
    # len + dirty flag, ahnlich/db/src/engine/store.rs:72-101).
    len_cache: int = -1
    bytes_cache: int = -1
    # JSON of the CURRENT base version's on-disk READ schema (as
    # spark.read.parquet gives it back: index + layout columns included,
    # partition column last), recorded once by write_store. Readers pass
    # it explicitly so a store/delta scan never pays parquet schema
    # inference — at 100 TB that is a footer read + file listing per
    # query, and even locally each inference is a ~100 ms one-task job
    # (measured; see OPTIMIZATION_r11.md). None on catalogs written
    # before this field existed → readers fall back to inference.
    file_schema: Optional[str] = None


class Catalog:
    """JSON-file-backed registry. One file per warehouse; writes are
    tempfile+rename (the reference persists snapshots the same way,
    ahnlich/utils/src/persistence.rs:109-156)."""

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.path = os.path.join(warehouse, "catalog.json")
        # serializes catalog mutation+flush units across threads: a
        # Structured Streaming sink (e.g. the managed-view doorbell
        # refresh) mutates the catalog from the stream-execution thread
        # while the user thread runs DDL/DML on the same Engine; without
        # this, json.dump over _data can race a concurrent dict insert
        # (RuntimeError) or persist a half-updated entry (coords paired
        # with the wrong generation). RLock: mutators hold it around
        # their mutate+flush unit, and _flush re-acquires.
        self._lock = threading.RLock()
        os.makedirs(warehouse, exist_ok=True)
        if not os.path.exists(self.path):
            self._data = {"schemas": {PUBLIC_SCHEMA: {"stores": {}}}}
            self._flush()
        else:
            with open(self.path) as f:
                self._data = json.load(f)

    # -- persistence ----------------------------------------------------
    def reload(self) -> None:
        """Re-read the catalog file from disk — picks up commits made by
        OTHER Engine facades sharing this warehouse (write_delta's
        segment-collision retry depends on seeing their pointer bump)."""
        with open(self.path) as f:
            self._data = json.load(f)

    def _flush(self) -> None:
        with self._lock:
            fd, tmp = tempfile.mkstemp(dir=self.warehouse,
                                       suffix=".catalog.tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(self._data, f, indent=1)
            os.replace(tmp, self.path)

    # -- schemas ---------------------------------------------------------
    def ensure_schema(self, schema: str) -> None:
        with self._lock:
            self._data["schemas"].setdefault(schema, {"stores": {}})
            self._flush()

    def schema_names(self) -> List[str]:
        return sorted(self._data["schemas"])

    def drop_schema(self, schema: str) -> int:
        """Drop a non-public schema and all its stores; returns the number
        of stores dropped (reference store.rs:718-737). The schema's data
        directory is deleted too — dropped data must not leak disk."""
        if schema == PUBLIC_SCHEMA:
            raise errors.SchemaNotEmptyOrProtected("cannot drop the default 'public' schema")
        if schema not in self._data["schemas"]:
            raise errors.SchemaNotFound(f"schema {schema!r} not found")
        with self._lock:
            n = len(self._data["schemas"][schema]["stores"])
            del self._data["schemas"][schema]
            self._flush()
        shutil.rmtree(os.path.join(self.warehouse, "data", schema), ignore_errors=True)
        return n

    # -- stores ----------------------------------------------------------
    def _stores(self, schema: str) -> Dict[str, dict]:
        if schema not in self._data["schemas"]:
            raise errors.SchemaNotFound(f"schema {schema!r} not found")
        return self._data["schemas"][schema]["stores"]

    def has_store(self, name: str, schema: str = PUBLIC_SCHEMA) -> bool:
        return schema in self._data["schemas"] and name in self._data["schemas"][schema]["stores"]

    def get_store(self, name: str, schema: str = PUBLIC_SCHEMA) -> StoreMeta:
        stores = self._stores(schema)
        if name not in stores:
            raise errors.StoreNotFound(f"store {schema}.{name} not found")
        raw = dict(stores[name])
        ai = raw.pop("ai", None)
        # tolerate unknown keys (forward-compatibility: an entry written
        # by a newer engine with extra fields must degrade gracefully,
        # not TypeError) — dataclass fields are the schema of record
        known = {f.name for f in fields(StoreMeta)}
        meta = StoreMeta(**{k: v for k, v in raw.items() if k in known})
        if ai:
            ai_known = {f.name for f in fields(AiBinding)}
            meta.ai = AiBinding(
                **{k: v for k, v in ai.items() if k in ai_known})
        return meta

    def put_store(self, meta: StoreMeta) -> None:
        with self._lock:
            self.ensure_schema(meta.schema)
            d = asdict(meta)
            self._data["schemas"][meta.schema]["stores"][meta.name] = d
            self._flush()

    def drop_store(self, name: str, schema: str = PUBLIC_SCHEMA) -> None:
        """Remove the catalog entry AND the store's data directory (all
        versions + index artifacts) — a drop frees disk, not just names."""
        with self._lock:
            stores = self._stores(schema)
            if name not in stores:
                raise errors.StoreNotFound(
                    f"store {schema}.{name} not found")
            del stores[name]
            self._flush()
        shutil.rmtree(
            os.path.join(self.warehouse, "data", schema, name), ignore_errors=True
        )

    def gc_versions(self, meta: StoreMeta, keep: int = 1) -> int:
        """Delete superseded version directories, keeping the newest
        ``keep`` (current included). Every mutation writes a fresh
        immutable version dir; without GC a long-lived warehouse leaks
        one full copy of the store per write. Returns dirs removed."""
        base = os.path.join(self.warehouse, "data", meta.schema, meta.name)
        if not os.path.isdir(base):
            return 0
        removed = 0
        for d in os.listdir(base):
            v = None
            if d.startswith("v"):
                try:
                    v = int(d[1:])
                except ValueError:
                    continue
            elif d.startswith("d"):
                # delta segment d<base_version>_<i>: lives and dies with
                # its base version (merged readers reference both)
                try:
                    v = int(d[1:].split("_", 1)[0])
                except ValueError:
                    continue
            if v is not None and v <= meta.version - keep:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)
                removed += 1
        return removed

    def list_stores(self, schema: str = PUBLIC_SCHEMA) -> List[StoreMeta]:
        return [self.get_store(n, schema) for n in sorted(self._stores(schema))]

    # -- data paths --------------------------------------------------------
    def store_path(self, meta: StoreMeta, version: Optional[int] = None) -> str:
        v = meta.version if version is None else version
        return os.path.join(self.warehouse, "data", meta.schema, meta.name, f"v{v}")

    def delta_path(self, meta: StoreMeta, segment: int,
                   version: Optional[int] = None) -> str:
        """Path of delta segment ``segment`` (1-based) over the given
        base version (default: current)."""
        v = meta.version if version is None else version
        return os.path.join(
            self.warehouse, "data", meta.schema, meta.name, f"d{v}_{segment}"
        )

    def list_versions(self, meta: StoreMeta) -> List[tuple]:
        """Retained snapshots on disk as sorted (base_version,
        n_delta_segments) pairs — every (v, s <= n) is a readable
        point-in-time state. Old versions survive one rewrite
        (KEEP_VERSIONS) and die at vacuum; snapshots are immutable
        while retained."""
        base = os.path.join(self.warehouse, "data", meta.schema, meta.name)
        if not os.path.isdir(base):
            return []
        versions: Dict[int, int] = {}
        for d in os.listdir(base):
            if d.startswith("v"):
                try:
                    versions.setdefault(int(d[1:]), 0)
                except ValueError:
                    continue
        for d in os.listdir(base):
            if d.startswith("d"):
                try:
                    v, s = d[1:].split("_", 1)
                    v, s = int(v), int(s)
                except ValueError:
                    continue
                # a crashed writer's PARTIAL segment (no _SUCCESS
                # marker) must not count: the live pointer already
                # excludes it, and a historical read that trusted the
                # raw dir count would merge the torn segment into a
                # snapshot that was never a committed state
                if not os.path.exists(os.path.join(base, d, "_SUCCESS")):
                    continue
                if v in versions:
                    versions[v] = max(versions[v], s)
        return sorted(versions.items())

    def store_aux_path(self, meta: StoreMeta, filename: str) -> str:
        """Per-store auxiliary artifact (e.g. IVF centroids) — lives next
        to the version dirs, survives version GC, dies with drop_store."""
        base = os.path.join(self.warehouse, "data", meta.schema, meta.name)
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, filename)
