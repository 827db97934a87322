"""Job-level trace of one registry query via the Spark event log.

Runs a query N times (rep 0 warms memos) with the bench session config plus
an uncompressed event log, then prints every job's duration, start offset
and description for the LAST repeat window — the measure-first tool for
queries whose cost hides in job COUNT and driver gaps rather than plan shape
(guide section 1: attribute time before changing anything).

Usage: python tools/joblog.py <query_name> [reps]
"""
import json, os, shutil, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
evdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "var", "eventlog")
shutil.rmtree(evdir, ignore_errors=True)
os.makedirs(evdir)

import os as _os
from pyspark.sql import SparkSession
cpus = _os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("joblog")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.scheduler.mode", "FAIR")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
    .config("spark.eventLog.compress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from vector_store_spark.registry import all_queries
specs = all_queries()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# warm
specs["ann_cosine_topk"].fn(spark, sf).collect()

name = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
for i in range(reps):
    spark.sparkContext.setJobDescription(f"RUN{i}:{name}")
    t0 = time.perf_counter()
    specs[name].fn(spark, sf).collect()
    print(f"{name} rep{i}: {time.perf_counter()-t0:.3f}s", file=sys.stderr)
spark.sparkContext.setJobDescription(None)
appid = spark.sparkContext.applicationId
spark.stop()

# parse event log (v2 rolling layout, zstd-compressed)
import glob

cand = glob.glob(os.path.join(evdir, f"*{appid}*", "events*")) or [
    os.path.join(evdir, appid)
]
lines = []
for p in sorted(cand):
    lines += open(p).read().splitlines()
jobs = {}
for line in lines:
    try:
        ev = json.loads(line)
    except Exception:
        continue
    e = ev.get("Event")
    if e == "SparkListenerJobStart":
        jid = ev["Job ID"]
        jobs[jid] = {
            "start": ev["Submission Time"],
            "desc": ev.get("Properties", {}).get("spark.job.description", ""),
            "stages": len(ev.get("Stage IDs", [])),
        }
    elif e == "SparkListenerJobEnd":
        jid = ev["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = ev["Completion Time"]

rows = []
for jid, j in sorted(jobs.items()):
    if "end" not in j:
        continue
    rows.append((jid, j["desc"][:110], (j["end"] - j["start"]) / 1000.0, j["start"]))
# print grouped by desc run marker
for jid, desc, dur, start in rows:
    print(f"job {jid:4d}  {dur:7.3f}s  start={start}  {desc}")
