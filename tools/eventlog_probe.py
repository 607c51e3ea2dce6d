"""Run the checkpointed pipeline (the scaling-bench shape) once with the
Spark event log on, then print per-job wall time and gaps — shows where the
serial, non-scaling time goes.
Usage: python tools/eventlog_probe.py CORES [CONVS]"""
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

cores = int(sys.argv[1])
convs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
evdir = f"/tmp/spark-events-{cores}"
shutil.rmtree(evdir, ignore_errors=True)
os.makedirs(evdir, exist_ok=True)

from tera_spark.session import get_spark

spark = get_spark(
    "ev",
    cores=cores,
    shuffle_partitions=cores,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    },
)
from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df_dist
from tera_spark.pipeline.run import run_pipeline

os.makedirs("/dev/shm/ev_probe", exist_ok=True)
src = tempfile.mkdtemp(prefix="ev_src_", dir="/dev/shm/ev_probe")
transcripts_spark_df_dist(spark, n_convs=convs).write.mode("overwrite").parquet(src)
t = spark.read.parquet(src)
n = t.count()
lexicon = lexicon_spark_df(spark)

def _cpu_stat():
    with open("/proc/stat") as fh:
        return [int(x) for x in fh.readline().split()[1:9]]

def once():
    out = tempfile.mkdtemp(prefix="ev_out_", dir="/dev/shm/ev_probe")
    s0 = _cpu_stat()
    t0 = time.time()
    run_pipeline(spark, t, lexicon, out)
    w = time.time() - t0
    s1 = _cpu_stat()
    d = [b - a for a, b in zip(s0, s1)]
    tot = sum(d) or 1
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq", "steal"]
    print("hostcpu " + " ".join(f"{nm}={100*v/tot:.1f}%" for nm, v in zip(names, d)))
    shutil.rmtree(out, ignore_errors=True)
    return w, t0 * 1000

# cold + warm (the scaling bench takes the warm minimum); the job analysis
# below is restricted to the WARM run via its start timestamp
wall_cold, _ = once()
wall, warm_start_ms = once()
print(f"cold={wall_cold:.1f}s warm={wall:.1f}s")
shutil.rmtree(src, ignore_errors=True)
spark.stop()

jobs = []
files = [f for f in glob.glob(evdir + "/**/*", recursive=True) if os.path.isfile(f) and "appstatus" not in f]
for f in files:
    with open(f) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except Exception:
                continue
            if e.get("Event") == "SparkListenerJobStart":
                jobs.append({"id": e["Job ID"], "start": e["Submission Time"]})
            elif e.get("Event") == "SparkListenerJobEnd":
                for j in jobs:
                    if j["id"] == e["Job ID"]:
                        j["end"] = e["Completion Time"]

jobs = [j for j in jobs if "end" in j and j["start"] >= warm_start_ms]
jobs.sort(key=lambda j: j["start"])
print(f"cores={cores} turns={n} wall={wall:.1f}s jobs={len(jobs)} turns/s={n/wall:.0f}")
prev_end = None
busy = 0
gaps = 0
for j in jobs:
    dur = (j["end"] - j["start"]) / 1000
    gap = (j["start"] - prev_end) / 1000 if prev_end else 0
    busy += dur
    gaps += max(gap, 0)
    if dur > 0.5 or gap > 0.5:
        print(f"  job {j['id']:>3} dur={dur:6.1f}s gap_before={gap:6.1f}s")
    prev_end = max(prev_end or 0, j["end"])
print(f"sum(job durations)={busy:.1f}s sum(gaps between jobs)={gaps:.1f}s")
