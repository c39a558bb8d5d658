#!/usr/bin/env python
"""Per-gate profiler: for each named gate, run once warm then time a
best-of-2 with Spark job/stage/task counts from the status tracker.
Prints one JSON line per gate to stdout. Usage:
  profile_gates.py [name ...]   (default: all registered gates)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (mirrors bench.py session)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ONLY = sys.argv[1:]

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("gate_profiler")
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
sc = spark.sparkContext

import __spark_entry__ as entry_mod  # noqa: E402

qs = entry_mod.queries()
names = ONLY or sorted(qs)

tracker = sc.statusTracker()


def run(name, fn):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).collect()
    return time.perf_counter() - t0


for name in names:
    fn = qs[name]
    try:
        warm = run(name, fn)  # warm pass (fixture build + JIT)
        results = []
        for i in range(2):
            sc.setJobGroup(f"prof_{name}_{i}", name)
            j0 = set(tracker.getJobIdsForGroup(f"prof_{name}_{i}"))
            el = run(name, fn)
            jobs = tracker.getJobIdsForGroup(f"prof_{name}_{i}")
            sc.setJobGroup(None, None)
            nstages = 0
            for jid in jobs:
                ji = tracker.getJobInfo(jid)
                if ji:
                    nstages += len(ji.stageIds)
            results.append((el, len(jobs), nstages))
        best = min(results)
        print(json.dumps({
            "gate": name, "first": round(warm, 3),
            "best": round(best[0], 3), "jobs": best[1], "stages": best[2],
        }), flush=True)
    except Exception as ex:  # noqa: BLE001
        print(json.dumps({"gate": name, "err": f"{type(ex).__name__}: {ex}"[:160]}),
              flush=True)
spark.stop()
