"""Deterministic row identity.

The reference derives a store entry's primary key from the vector itself:
StoreKeyId = seeded ahash over the f32 bit patterns
(reference: ahnlich/types/src/utils/store_key_id.rs:19-36) — i.e. SET of a
bit-identical vector is an UPDATE, not an insert.

ahash is not portable, so OUR spec pins: ``id = xxhash64(key, seed=42)``
computed JVM-side by Catalyst's XxHash64 over the ARRAY<FLOAT> (Spark
hashes float elements by bit pattern, normalizing -0.0, which matches the
reference's to_bits() approach). Determinism *within this engine* is what
the duckdb oracle checks; cross-engine hash equality is not required.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F


def store_key_id(key: Column) -> Column:
    """Primary-key hash of an ARRAY<FLOAT> store key (JVM-side, codegen'd)."""
    return F.xxhash64(key)
