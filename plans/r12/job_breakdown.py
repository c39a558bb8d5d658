#!/usr/bin/env python
"""Per-JOB breakdown of one warm gate invocation: job name (callsite),
duration, task count — via the AppStatusStore. Usage:
  job_breakdown.py <gate> [<gate> ...]
Runs each gate once to warm fixtures/JIT, then once instrumented."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("job_breakdown")
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

import __spark_entry__ as entry_mod  # noqa: E402

qs = entry_mod.queries()
store = spark.sparkContext._jsc.sc().statusStore()


def jobs_after(min_id):
    out = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        if j.jobId() <= min_id:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out.append((j.jobId(), dur, j.numTasks(), str(j.name())[:110]))
    return sorted(out)


for name in sys.argv[1:]:
    fn = qs[name]
    fn(spark, SF_DIR).collect()  # warm
    it = store.jobsList(None).iterator()
    last = -1
    while it.hasNext():
        last = max(last, it.next().jobId())
    t0 = time.perf_counter()
    fn(spark, SF_DIR).collect()
    el = time.perf_counter() - t0
    js = jobs_after(last)
    tot = sum(d for _, d, _, _ in js if d)
    print(f"\n=== {name}: wall {el:.2f}s, {len(js)} jobs, job-sum {tot:.2f}s")
    for jid, dur, ntasks, jname in js:
        print(f"  job {jid}: {dur if dur is not None else '?':>6}s "
              f"{ntasks:>4}t  {jname}")
spark.stop()
