"""Int8 scalar quantization: exact code math, reconstruction bounds,
ADC ranking quality, and the zero-shuffle plan shape."""

import math

from pyspark.sql import functions as F

from ahnlich_spark.functions import quantize as Q


def _df(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, -2.0, 4.0]),
            (1, [0.0, 0.0, 0.0]),      # all-zero: scale 0, codes 0
            (2, [0.5, 0.25, -0.125]),
        ],
        "vec_id long, embedding array<float>",
    )


def test_int8_codes_exact(spark):
    df = _df(spark)
    s = Q.maxabs(F.col("embedding"))
    out = {
        r["vec_id"]: r.asDict()
        for r in df.select(
            "vec_id", s.alias("s"), Q.int8_codes(F.col("embedding"), s).alias("codes")
        ).collect()
    }
    assert out[0]["s"] == 4.0
    assert out[0]["codes"] == [32, -64, 127]  # round(1*127/4)=31.75->32
    assert out[1]["codes"] == [0, 0, 0]
    assert out[2]["codes"] == [127, 64, -32]  # round(.25*127/.5)=63.5->64 (HALF_UP)


def test_dequantize_error_bounded(spark):
    """|dequant - v| <= scale/254 + eps for every element (half a code
    step) — the quantization contract."""
    df = _df(spark).filter(F.col("vec_id") != 1)
    s = Q.maxabs(F.col("embedding"))
    codes = Q.int8_codes(F.col("embedding"), s)
    err = F.array_max(
        F.zip_with(
            Q.dequantize(codes, s),
            F.col("embedding"),
            lambda d, v: F.abs(d - v.cast("double")),
        )
    )
    for r in df.select(s.alias("s"), err.alias("e")).collect():
        assert r["e"] <= r["s"] / 254.0 + 1e-12


def test_int8_dot_matches_float_ranking(spark, sf_dir):
    """ADC ordering: top-10 by integer code dot-product (scaled) agrees
    with exact float cosine top-10 on >= 8 of 10 at sf0.001 — int8 is a
    candidate generator, exact rescore stays the contract."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    qlit = F.array(*[F.lit(float(x)).cast("float") for x in q])

    s_store = Q.maxabs(F.col("embedding"))
    s_q = Q.maxabs(qlit)
    d = emb.select(
        "vec_id",
        Q.int8_dot(
            Q.int8_codes(F.col("embedding"), s_store), Q.int8_codes(qlit, s_q)
        ).alias("dot_i8"),
        (s_store * s_q).alias("ss"),
    )
    approx = [
        r["vec_id"]
        for r in d.orderBy(F.desc(F.col("dot_i8") * F.col("ss")), F.asc("vec_id"))
        .limit(10).collect()
    ]

    qd = [float(x) for x in q]
    qn = math.sqrt(sum(x * x for x in qd))
    exact_scored = emb.select(
        "vec_id",
        (
            F.aggregate(
                F.zip_with(
                    F.col("embedding"), F.array(*[F.lit(x) for x in qd]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (
                F.sqrt(
                    F.aggregate(
                        F.transform(F.col("embedding"), lambda a: a.cast("double") * a),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
                * F.lit(qn)
            )
        ).alias("cos"),
    )
    exact = [r["vec_id"] for r in exact_scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(10).collect()]
    assert len(set(approx) & set(exact)) >= 8


def test_quantize_plan_zero_shuffle(spark):
    """The whole quantize pipeline is scan-local: no Exchange, no
    BatchEvalPython in the plan."""
    df = _df(spark)
    s = Q.maxabs(F.col("embedding"))
    codes = Q.int8_codes(F.col("embedding"), s)
    out = df.select(
        "vec_id", Q.code_checksum(codes).alias("ck"),
        Q.recon_err_e9(F.col("embedding"), codes, s).alias("err"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
