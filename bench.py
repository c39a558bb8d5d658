#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Times include full result materialization (collect), which is how the
reference's criterion benches measure GetSimN round-trips."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Every registered gate is benched — BENCH_QUERIES derives from the
# driver-contract registry at runtime, so a new gate is automatically
# measured the round it lands (the round-8 verdict asked for full
# visibility). Exclusions are explicit, named, and printed in the JSON
# as queries_excluded so the per-round record documents each reason.
BENCH_EXCLUDED = {
    "ai_bulk_set": (
        "double full-corpus ingest by design (~125 s/run at sf0.1: "
        "embeds all of lineitem TWICE into a fresh warehouse to pin "
        "replace-semantics counts); 4 bench invocations would add "
        "~8 min of pure ingest wall time while ai_convert_embeddings "
        "already times the same Arrow-batched embed path on a "
        "data-sized input"
    ),
}


# Bench-only extras: NOT gates (no oracle, never driver-graded), timed
# so perf regressions on paths the registry can't afford to bench stay
# visible round-over-round. ai_bulk_set_bounded covers the
# Arrow-batched bulk-ingest path that ai_bulk_set exercises, at a
# bounded deterministic size (~4.5k texts at sf0.1, one ingest into a
# fresh store per run, ~5 s) instead of a double full-corpus ingest.
def _bench_extras():
    from ahnlich_spark.entry_queries import ai_bulk_set_bounded

    return {"ai_bulk_set_bounded": ai_bulk_set_bounded}


def bench_queries(qs) -> list:
    missing = sorted(set(BENCH_EXCLUDED) - set(qs))
    if missing:
        raise SystemExit(f"BENCH_EXCLUDED names unknown queries: {missing}")
    return sorted(n for n in qs if n not in BENCH_EXCLUDED)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ahnlich_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())
    extras = _bench_extras()
    shadowed = set(extras) & set(qs)
    if shadowed:
        # explicit raise (not assert): must survive `python -O`, else a
        # shadowing extra silently replaces a registered gate's callable
        raise RuntimeError(f"bench extras must not shadow gates: {sorted(shadowed)}")
    qs.update(extras)
    names = bench_queries(qs)

    # Criterion-style warmup AT THE TARGET SF: run every benched query
    # once so timed runs measure steady-state execution — JIT-compiled
    # whole-stage codegen, warmed classloaders and shuffle services —
    # not first-run compilation (up to 4x noise on the join-heavy dedup
    # queries). Nothing is persisted/cached between runs: every timed
    # query recomputes its full lineage from parquet.
    entry_mod.entry(spark).collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", SF_DIR)
    # The warmup pass is also each query's FIRST run this JVM, so its
    # time is recorded as first_run: for fixture-cached gates
    # (managed_view_*, incremental_*, streaming_*) the warmup builds the
    # mutation-chain fixture and the timed repeats fold a coordinate
    # no-op, so `best` alone under-states the true one-shot cost by up
    # to ~100x (managed_view_join: 23.5 s first run vs 0.13 s repeat at
    # sf0.1). first_run makes BENCH_DETAIL.json self-describing without
    # cross-referencing SCALING.md. Caveat inside the artifact itself:
    # first_run includes whole-stage-codegen JIT + classloader warmup,
    # so for NON-fixture gates it over-states steady-state by ~1.2-4x.
    first_run = {}
    fixture_cached = []

    def _fixture_cache_size() -> int:
        # a gate whose FIRST run grows a process-level cache is exactly
        # a gate whose first_run paid a one-time fixture build the
        # timed repeats skip. Sum EVERY module-level dict (static
        # registries contribute a constant) instead of naming the
        # cache dicts — a hand-picked name list was already incomplete
        # the day it landed (_DRIFT_FIXTURE, _PRUNED_ENGINES,
        # _ANN_MUT_ENGINES, _AI_SIM_ENGINES were missing)
        from ahnlich_spark import entry_queries as EQ

        return sum(
            len(v) for v in vars(EQ).values() if isinstance(v, dict)
        )

    if os.path.isdir(warm_dir):
        # record first_run whenever the warmup ran at the target SF —
        # compare the DIRECTORIES, not the strings, so a trailing slash
        # or symlinked spelling of the same dir doesn't silently drop
        # the whole first_run section
        try:
            warm_is_target = os.path.samefile(warm_dir, SF_DIR)
        except OSError:
            warm_is_target = False
        for name in names:
            try:
                pre = _fixture_cache_size()
                t0 = time.perf_counter()
                qs[name](spark, warm_dir).collect()
                if warm_is_target:
                    first_run[name] = round(time.perf_counter() - t0, 3)
                    if _fixture_cache_size() > pre:
                        fixture_cached.append(name)
            except Exception:
                pass  # warmup is best-effort; the timed run will surface errors

    # Host-drift calibration (VERDICT r11 item 7): three pinned
    # scan-local control gates are timed warmed best-of-3 right before
    # the timed passes and compared against committed reference seconds
    # (idle box, 2026-08-18, min-of-5 warmed). The emitted ratio makes
    # every BENCH_DETAIL self-normalizing: a suite-total swing with
    # controls_ratio ~= the same swing is host drift, not code.
    # Additions-only: the timed region, query set, and JSON contract
    # below are untouched.
    CONTROL_REFS = {
        "doc_token_count": 0.117,
        "regional_revenue": 0.403,
        "sample_stratified": 0.172,
    }
    controls = {}
    for cname, ref in CONTROL_REFS.items():
        fn = qs.get(cname)
        if fn is None:
            continue
        best = None
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            controls[cname] = {
                "sec": round(best, 3), "ref_sec": ref,
                "ratio": round(best / ref, 3),
            }
        except Exception:
            pass  # calibration is best-effort; never blocks the bench
    controls_ratio = (
        round(
            sorted(c["ratio"] for c in controls.values())[len(controls) // 2],
            3,
        )
        if controls else None
    )

    # best-of-N timed passes (criterion reports minima): the numbers
    # measure the PLAN, not transient host jitter — single-pass runs on
    # this box swing up to 20x on identical code (JIT/GC/CPU-steal;
    # measured: the same query 0.75s and 8.8s in back-to-back suite
    # passes). Three passes damp multi-second steal events that two
    # don't.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings = {}
    failures = {}
    for _ in range(passes):
        for name in names:
            fn = qs[name]
            try:
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                elapsed = round(time.perf_counter() - t0, 3)
            except Exception as ex:  # noqa: BLE001 — one bad gate must
                # not void the whole suite's timings now that the set
                # auto-derives from every registered gate; record and
                # keep measuring (correctness has its own gate)
                failures[name] = f"{type(ex).__name__}: {ex}"[:200]
                continue
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            del rows

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail goes to a repo file (the queries map for
    # 130+ entries is ~4 KB — larger than the 2000-char stdout tail the
    # round driver records, which is why BENCH_r02..r04 show
    # parsed: null). The printed line stays a complete JSON object
    # under ~1900 chars: total + slowest-first queries until budget.
    detail = {
        "metric": "wall seconds, headline operator suite (collect-inclusive)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "first_run": first_run,
        "first_run_note": (
            "warmup-pass wall seconds (same JVM, run once before the "
            "timed passes): the honest one-shot cost for fixture-"
            "building gates whose timed repeats are coordinate no-ops; "
            "includes codegen/classloader warmup, so it over-states "
            "steady state for ordinary gates"
        ),
        # gates whose warmup run grew a process-level fixture cache:
        # their first_run conflates a one-time mutation-chain fixture
        # build with JIT warmup; every other gate's first_run is JIT
        # warmup only (measured, not a hand-maintained list)
        "fixture_cached": sorted(fixture_cached),
        # warmed best-of-3 control-gate seconds vs committed idle-box
        # references — the per-run host-speed normalizer (median ratio
        # in controls_ratio; > 1 means this run's host regime is slower
        # than the reference by that factor)
        "controls": controls,
        "controls_ratio": controls_ratio,
        "sf": sf_val,
        "n_queries": len(timings),
        "queries_excluded": BENCH_EXCLUDED,
        "queries_failed": failures,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "queries_excluded": sorted(BENCH_EXCLUDED),
        "queries_failed": sorted(failures),
        "controls_ratio": controls_ratio,
        "detail": "BENCH_DETAIL.json",
        "queries": {},
        "queries_omitted": 0,
    }
    budget = 1900 - len(json.dumps(out))
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        cost = len(json.dumps(name)) + len(repr(sec)) + 4
        if budget - cost < 0:
            out["queries_omitted"] += 1
            continue
        out["queries"][name] = sec
        budget -= cost
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
