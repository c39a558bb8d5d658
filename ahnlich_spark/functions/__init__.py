from ahnlich_spark.functions.similarity import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    squared_euclidean_distance,
    closeness,
    score_expr,
)
from ahnlich_spark.functions.hashing import store_key_id
from ahnlich_spark.functions.projection import project_df, projected_top_k, sign_matrix

__all__ = [
    "local_rows_df",
    "nullable_schema",
    "project_df",
    "projected_top_k",
    "sign_matrix",
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "squared_euclidean_distance",
    "closeness",
    "score_expr",
    "store_key_id",
]

def nullable_schema(schema):
    """A copy of ``schema`` with every field (recursively) nullable —
    the safe form to PIN as a parquet read schema. An explicit
    user-supplied schema is trusted as-is by the file source, so a
    non-nullable field carried over from a write-side plan would turn
    a future null in the files into silent wrong results instead of a
    read error; parquet's own inference likewise reports everything
    nullable."""
    from pyspark.sql import types as T

    def dt(d):
        if isinstance(d, T.StructType):
            return T.StructType([
                T.StructField(f.name, dt(f.dataType), True, f.metadata)
                for f in d.fields
            ])
        if isinstance(d, T.ArrayType):
            return T.ArrayType(dt(d.elementType), True)
        if isinstance(d, T.MapType):
            return T.MapType(dt(d.keyType), dt(d.valueType), True)
        return d

    return dt(schema)


def local_rows_df(spark, rows, schema, slice_rows: int = 100_000):
    """DataFrame over a bounded DRIVER-SIDE row list, sliced by data
    size instead of by core count. ``spark.createDataFrame(list)``
    parallelizes into defaultParallelism slices, so a 50-row probe
    batch becomes #cores near-empty partitions and every downstream
    stage (broadcast build, window, aggregation) schedules #cores
    tasks of pure overhead; each slice evaluation also pays its own
    Python-worker round trip, which a post-hoc ``coalesce(1)`` would
    serialize (measured ~0.2 s/slice). One slice per ``slice_rows``
    rows keeps wire-sized batches at exactly ONE partition while a
    genuinely large driver list still converts in parallel."""
    n_slices = max(1, -(-len(rows) // slice_rows)) if rows else 1
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
