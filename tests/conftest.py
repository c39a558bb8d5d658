import os
import shutil
import subprocess
import sys
import tempfile
import time

import pytest
from pyspark.sql import SparkSession

# --------------------------------------------------- full-suite sharding --
#
# A full single-process run of this suite is ~100 min of wall time —
# thousands of tiny Spark jobs whose cost is per-job fixed overhead, not
# CPU (the box has 32 cores; one local[4] session uses a fraction of
# one). The driver's verify window is shorter than that, so `python -m
# pytest tests/` transparently fans the collected items out across
# worker subprocesses (each a normal pytest run over an explicit item
# list with its own SparkSession) and aggregates their results. Every
# test still runs, exactly once; a worker failure fails the whole run.
#
# Workers are independent processes: tests already isolate all state in
# per-test tempdirs, memory sinks are per-session, and no test touches
# a shared warehouse/metastore, so the only cross-worker cost is one
# extra JVM + fixture build per worker.
#
# Opt-outs: AHNLICH_TEST_SHARDS=1 (or any targeted/partial invocation —
# sharding only engages when the collected set looks like the full
# suite and no debugger/pdb/collect-only flags are present).

_SHARD_ENV = "AHNLICH_TEST_SHARD_WORKER"

# Measured per-file wall seconds (single process, sf0.001 oracle data,
# 2026-08-17 full-suite run: 897 passed in 5440 s) — LPT scheduling
# weights. A file missing here weighs in by item count; weights only
# shape the partition, never correctness.
_FILE_WEIGHTS: dict = {
    "test_streaming.py": 1184,
    "test_entry_oracle.py": 692,
    "test_sift_recall.py": 667,
    "test_ann_index.py": 392,
    "test_dedup.py": 276,
    "test_sketches.py": 243,
    "test_cli.py": 235,
    "test_views.py": 230,
    "test_ivm.py": 220,
    "test_dsl_golden.py": 207,
    "test_ann.py": 120,
    "test_incremental_store.py": 110,
    "test_properties.py": 103,
    "test_plans.py": 80,
    "test_ai_proxy.py": 80,
    "test_engine.py": 63,
    "test_dsl.py": 56,
    "test_ai_models.py": 46,
    "test_sampling.py": 46,
    "test_engine_hardening.py": 43,
    "test_graph.py": 40,
    "test_cluster.py": 37,
    "test_linkage.py": 37,
    "test_joins.py": 32,
    "test_textstats.py": 25,
    "test_predicates.py": 25,
    "test_similarity.py": 21,
    "test_pipeline_compose.py": 20,
    "test_pq.py": 19,
    "test_upsert.py": 15,
    "test_projection.py": 13,
    "test_snapshot.py": 11,
    "test_realdeps.py": 11,
    "test_pred_index.py": 11,
    "test_bpe.py": 10,
    "test_quantize.py": 8,
    "test_pending_gates.py": 8,
    "test_mmr.py": 8,
    "test_intmath.py": 8,
    "test_evaluation.py": 8,
    "test_profiling.py": 6,
    "test_corpus_io.py": 6,
}


def _shard_items(items, n):
    """LPT over test files (keeps module/fixture locality); files
    heavier than the ideal shard are split by item round-robin so one
    giant module cannot bound the wall clock."""
    from collections import defaultdict

    by_file = defaultdict(list)
    for it in items:
        by_file[it.nodeid.split("::", 1)[0]].append(it)
    total_w = 0.0
    weights = {}
    for f, its in by_file.items():
        w = _FILE_WEIGHTS.get(os.path.basename(f), float(len(its)))
        weights[f] = max(w, 0.001)
        total_w += weights[f]
    ideal = total_w / n
    units = []  # (weight, [items])
    for f, its in sorted(by_file.items()):
        w = weights[f]
        if w > 1.25 * ideal and len(its) > 1:
            k = min(len(its), max(2, int(round(w / ideal))))
            chunks = [its[i::k] for i in range(k)]
            units.extend((w / k, c) for c in chunks if c)
        else:
            units.append((w, its))
    shards = [[] for _ in range(n)]
    loads = [0.0] * n
    for w, chunk in sorted(units, key=lambda u: -u[0]):
        i = loads.index(min(loads))
        shards[i].extend(chunk)
        loads[i] += w
    return [s for s in shards if s]


def pytest_runtestloop(session):
    cfg = session.config
    if os.environ.get(_SHARD_ENV):
        return None  # worker process: run its item list normally
    workers = int(os.environ.get(
        "AHNLICH_TEST_SHARDS", min(8, max(1, (os.cpu_count() or 4) // 4))
    ))
    inv = [str(a) for a in cfg.invocation_params.args]
    if (
        workers <= 1
        or len(session.items) < 400  # targeted run, not the full suite
        or session.testsfailed
        or cfg.getoption("collectonly")
        or cfg.getoption("usepdb", False)
        or cfg.getoption("numprocesses", None)  # somebody added xdist
        # two-token flags whose value arg the path filter below would
        # mangle, and modes where fan-out makes no sense
        or any(a in ("-k", "-m", "--lf", "--ff") or a.startswith("--pdb")
               for a in inv)
    ):
        return None
    # flags the workers inherit (node ids replace path args)
    passthru = [a for a in inv if a.startswith("-")
                and not a.startswith("--basetemp")]
    fail_fast = cfg.getoption("exitfirst", False) or "-x" in passthru
    shards = _shard_items(session.items, workers)
    t0 = time.time()
    sys.stdout.write(
        f"[shard] fanning {len(session.items)} tests across "
        f"{len(shards)} worker processes\n"
    )
    sys.stdout.flush()
    outdir = tempfile.mkdtemp(prefix="ahnlich_shard_")
    procs = []
    for i, shard in enumerate(shards):
        env = dict(os.environ)
        env[_SHARD_ENV] = str(i + 1)
        cmd = [sys.executable, "-m", "pytest",
               "-p", "no:cacheprovider", *passthru,
               *(it.nodeid for it in shard)]
        # file-backed output: a PIPE would deadlock once a chatty
        # worker fills the 64 KB pipe buffer before exiting
        log = open(os.path.join(outdir, f"shard{i + 1}.log"), "w+")
        procs.append((i + 1, subprocess.Popen(
            cmd, stdout=log, stderr=subprocess.STDOUT,
            cwd=str(cfg.rootpath), env=env, text=True,
        ), log))
    rc = 0
    pending = {i: (p, log) for i, p, log in procs}
    outputs = {}
    while pending:
        done = [i for i, (p, _) in pending.items() if p.poll() is not None]
        if not done:
            time.sleep(0.5)
            continue
        for i in done:
            p, log = pending.pop(i)
            log.flush()
            log.seek(0)
            outputs[i] = log.read()
            log.close()
            sys.stdout.write(f"\n[shard {i}] exit {p.returncode}\n")
            sys.stdout.write(outputs[i])
            sys.stdout.flush()
            if p.returncode:
                rc = rc or int(p.returncode)
                if fail_fast:
                    for q, _ in pending.values():
                        q.terminate()
    # one merged, grep-able summary line
    import re

    counts = {}
    for text in outputs.values():
        for num, word in re.findall(r"(\d+) (passed|failed|skipped|error|errors|xfailed|xpassed)", text):
            counts[word] = counts.get(word, 0) + int(num)
    summary = ", ".join(f"{v} {k}" for k, v in sorted(counts.items()))
    sys.stdout.write(
        f"\n============ sharded total: {summary or 'no results parsed'} "
        f"in {time.time() - t0:.1f}s across {len(shards)} workers "
        f"(exit {rc}) ============\n"
    )
    sys.stdout.flush()
    sys.stderr.flush()
    shutil.rmtree(outdir, ignore_errors=True)
    # hard exit: the workers ARE this session's test run — returning
    # True would make pytest print a misleading "no tests ran" summary
    os._exit(rc)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("ahnlich_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture
def warehouse():
    d = tempfile.mkdtemp(prefix="ahnlich_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture
def engine(spark, warehouse):
    from ahnlich_spark import Engine

    return Engine(spark, warehouse)


SF_DIR = os.environ.get("AHNLICH_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
