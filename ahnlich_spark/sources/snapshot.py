"""Reference-format snapshot import/export (migration path).

The reference engine persists its whole in-memory DB as one serde-JSON
snapshot (ahnlich/utils/src/persistence.rs:109-180) and ships two fixture
generations (ahnlich/db/src/tests/fixtures/): the old FLAT layout
``{store_name: store}`` (implicitly schema "public") and the v2 layout
``{"db_version": 2, "stores": {schema: {store_name: store}}}``. Each
store object carries ``dimension``, ``id_to_value`` (StoreKeyId ->
[vector, {"value": {meta_key: tagged-string}}]), ``predicate_indices``
(``allowed_predicates`` + the inverted ``inner`` map) and
``non_linear_indices`` (serialized KD-tree/HNSW structures).

Metadata values use the reference's tagged-string encoding
(ahnlich/types/src/utils/mod.rs:55-115): ``str:<text>``,
``img:<ascii85>``, ``aud:<ascii85>``.

What imports / exports, and what deliberately does not:

- Entries (vectors + metadata) and ``allowed_predicates`` round-trip.
- Row ids are RE-DERIVED by this engine's portable md5-based
  ``store_key_id`` — the reference's ids are a seeded ahash over the
  f32 bits (store_key_id.rs:19-36), which is not reproducible outside
  that process; ids are an internal identity either way (the vector is
  the primary key in both engines).
- ``non_linear_indices``: the ALGORITHM SET is imported (the catalog
  records kdtree/hnsw and this engine rebuilds its own artifacts via
  create_non_linear_algorithm_index); the serialized graph/tree bodies
  are derived data for a pointer-chasing execution model Spark does not
  use, and are not imported. Export writes the configured algorithms
  with no graph body, plus the exact inverted predicate index derived
  from the data.

Scale note: a reference snapshot is by definition a single-process
in-RAM dump, so parsing it driver-side is inherent to the format; rows
then flow to executors through one ``createDataFrame`` -> bulk ``set``
(the engine's distributed write path). Export collects one store at a
time through ``toLocalIterator`` so the driver never holds more than a
partition of rows.
"""

from __future__ import annotations

import base64
import json
import os
import tempfile
from typing import Any, Dict, Optional

from ahnlich_spark.types import MetadataValue

_ALGO_NAMES = {
    "Hnsw": "hnsw",
    "KdTree": "kdtree",
    "Kdtree": "kdtree",
}
_ALGO_NAMES_OUT = {"hnsw": "Hnsw", "kdtree": "KdTree"}


# ----------------------------------------------------- value encoding --

def decode_metadata_value(tagged: str) -> MetadataValue:
    """Tagged string -> this engine's MetadataValue.
    ascii85 here is the Adobe alphabet (Python a85), matching the
    reference's `ascii85` crate output for the payload body."""
    if tagged.startswith("str:"):
        return MetadataValue.raw_string(tagged[4:])
    if tagged.startswith("img:"):
        return MetadataValue.image(base64.a85decode(tagged[4:]))
    if tagged.startswith("aud:"):
        return MetadataValue.audio(base64.a85decode(tagged[4:]))
    raise ValueError(f"unknown metadata value encoding: {tagged[:16]!r}")


def encode_metadata_value(kind: str, s: Optional[str], bin_: Optional[bytes]) -> str:
    if kind == "raw_string":
        return f"str:{s}"
    if kind == "image":
        return "img:" + base64.a85encode(bytes(bin_ or b"")).decode()
    if kind == "audio":
        return "aud:" + base64.a85encode(bytes(bin_ or b"")).decode()
    raise ValueError(f"unknown metadata kind: {kind!r}")


# ------------------------------------------------------------- import --

def _iter_schemas(doc: dict):
    """Yield (schema, {store: body}) for either snapshot generation.
    The old flat layout has stores at top level under implicit 'public'
    (the reference migration wraps it the same way)."""
    if "db_version" in doc or "stores" in doc:
        for schema, stores in doc.get("stores", {}).items():
            yield schema, stores
    else:
        yield "public", doc


def import_snapshot(engine, path: str) -> Dict[str, int]:
    """Load a reference snapshot file into the engine's warehouse.
    Returns {schema/store: row_count}. Existing stores with the same
    name error (mirroring CreateStore error_if_exists=True)."""
    with open(path) as f:
        doc = json.load(f)

    out: Dict[str, int] = {}
    for schema, stores in _iter_schemas(doc):
        for store_name, body in stores.items():
            dimension = int(body["dimension"])
            preds = list(
                (body.get("predicate_indices") or {}).get("allowed_predicates", [])
            )
            algos = sorted(
                _ALGO_NAMES[a]
                for a in ((body.get("non_linear_indices") or {})
                          .get("algorithm_to_index", {}))
                if a in _ALGO_NAMES
            )
            engine.create_store(
                store_name,
                dimension=dimension,
                predicates=preds,
                non_linear_indices=algos,
                schema=schema,
            )
            entries = []
            for _rid, (vector, value_obj) in (body.get("id_to_value") or {}).items():
                meta = {
                    k: decode_metadata_value(v)
                    for k, v in (value_obj.get("value") or {}).items()
                }
                entries.append(([float(x) for x in vector], meta))
            if entries:
                # list path: engine broadcasts the batch; ids re-derived
                engine.set(store_name, entries, schema=schema)
            out[f"{schema}/{store_name}"] = len(entries)
    return out


# ------------------------------------------------------------- export --

def export_snapshot(engine, path: str, schema: Optional[str] = None) -> int:
    """Write the warehouse (or one schema) as a v2-layout snapshot the
    reference's loader shape-matches. Returns total rows written.
    Atomic: tempfile in the target directory + rename, the same
    protocol as persistence.rs:126-148."""
    catalog = engine.catalog
    stores_doc: Dict[str, Dict[str, Any]] = {}
    total = 0
    schemas = [schema] if schema is not None else catalog.schema_names()
    for sch in schemas:
        for meta in catalog.list_stores(schema=sch):
            body = _export_store(engine, meta)
            stores_doc.setdefault(meta.schema, {})[meta.name] = body
            total += body["cached_len"]

    doc = {"db_version": 2, "stores": stores_doc}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".snapshot_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return total


def _export_store(engine, meta) -> Dict[str, Any]:
    df = engine.store_df(meta.name, schema=meta.schema)
    id_to_value: Dict[str, Any] = {}
    inner: Dict[str, Dict[str, list]] = {k: {} for k in meta.predicates}
    n = 0
    size_bytes = 0
    # toLocalIterator: one partition in driver memory at a time
    for row in df.select("id", "key", "meta").toLocalIterator():
        n += 1
        vec = [float(x) for x in row["key"]]
        value = {}
        for k, v in (row["meta"] or {}).items():
            tagged = encode_metadata_value(v["kind"], v["s"], v["bin"])
            value[k] = tagged
            if k in inner:
                inner[k].setdefault(tagged, []).append(int(row["id"]))
        id_to_value[str(int(row["id"]))] = [vec, {"value": value}]
        size_bytes += 4 * len(vec) + sum(len(k) + len(v) for k, v in value.items())

    for k in inner:
        for tagged in inner[k]:
            inner[k][tagged].sort()

    return {
        "cached_len": n,
        "cached_size_bytes": size_bytes,
        "dimension": meta.dimension,
        "id_to_value": id_to_value,
        "non_linear_indices": {
            "algorithm_to_index": {
                _ALGO_NAMES_OUT[a]: None for a in meta.non_linear
            }
        },
        "predicate_indices": {
            "allowed_predicates": list(meta.predicates),
            "inner": inner,
        },
        "size_dirty": False,
    }
