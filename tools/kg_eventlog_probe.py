"""Attribute the bench kg_pipeline's wall time to Spark jobs via the event
log: run the pipeline cold+warm with per-phase job descriptions OFF (the
bench shape is one big action plus the eager checkpoints), then print each
job's wall time, its first stage name, and inter-job gaps.

Usage: python tools/kg_eventlog_probe.py [n_convs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

evdir = "/tmp/spark-events-kg"
shutil.rmtree(evdir, ignore_errors=True)
os.makedirs(evdir, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from tera_spark.session import get_spark  # noqa: E402

n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
spark = get_spark(
    "kg_ev",
    cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
    },
)
spark.range(0, 10_000_000, 1, 32).select(F.sum("id")).collect()

from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df_dist  # noqa: E402
from tera_spark.operators.canonical import canonical_mapping  # noqa: E402
from tera_spark.operators.triples import replace_entities  # noqa: E402
from tera_spark.pipeline.extract import extract_mentions  # noqa: E402
from tera_spark.pipeline.kg import build_triples  # noqa: E402
from tera_spark.pipeline.link import link_mentions  # noqa: E402

transcripts = transcripts_spark_df_dist(spark, n_convs=n_convs).cache()
transcripts.count()
lexicon = lexicon_spark_df(spark)


def once(tag):
    t0 = time.time()
    spark.sparkContext.setJobDescription(f"{tag}")
    mentions = extract_mentions(transcripts)
    linked, alias_edges = link_mentions(mentions, lexicon)
    triples = replace_entities(
        build_triples(transcripts, linked, deduplicate=False),
        canonical_mapping(alias_edges),
    )
    triples.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


cold = once("kgrun-cold")
t_warm_start = time.time() * 1000
warm = once("kgrun-warm")
t_warm_end = time.time() * 1000
print(f"cold={cold} warm={warm}", file=sys.stderr)
spark.stop()

# parse the event log: job windows within the warm run
logf = sorted(glob.glob(evdir + "/*"))[-1]
jobs = []
stages = {}
with open(logf) as fh:
    for line in fh:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs.append(
                {
                    "id": ev["Job ID"],
                    "t0": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "names": list(
                        dict.fromkeys(
                            s["Stage Name"].split(" at ")[0]
                            for s in ev.get("Stage Infos", [])
                        )
                    ),
                }
            )
        elif k == "SparkListenerJobEnd":
            for j in jobs:
                if j["id"] == ev["Job ID"]:
                    j["t1"] = ev["Completion Time"]

warm_jobs = [
    j
    for j in jobs
    if j.get("t1") and j["t0"] >= t_warm_start - 500 and j["desc"].startswith("kgrun-warm")
]
warm_jobs.sort(key=lambda j: j["t0"])
prev_end = None
total = 0
for j in warm_jobs:
    dur = (j["t1"] - j["t0"]) / 1000
    gap = (j["t0"] - prev_end) / 1000 if prev_end else 0.0
    prev_end = j["t1"]
    total += dur
    print(
        f"job {j['id']:>4}  {dur:7.3f}s  gap {gap:6.3f}s  "
        f"{','.join(j['names'][:4])}"
    )
print(f"sum job time {total:.3f}s over {len(warm_jobs)} jobs")
