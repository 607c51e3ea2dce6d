"""Forget-cost scale probe: delete a conversation subset from a completed
base run (pipeline/forget.py) and compare against rebuilding from scratch
over the remaining conversations — the only alternative a system without
decremental maintenance has. Appends a ``mode="forget"`` record to
BENCH/scaling_runs.jsonl.

Usage::

    python tools/forget_probe.py [base_convs] [forget_convs] [cores]

Defaults: 600000 base convs (the 5.7M-turn criterion corpus, reused from
/dev/shm if present), 6000 forgotten convs (1%), local[32]. The timed
regions are single runs (a retraction request is served once). A
set-equality spot-check compares triples/nodes/edges row counts of the
post-forget live view against the never-ingested rebuild; full
set-equality is pytest-asserted at fixture scale (tests/test_forget.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SHM = "/dev/shm/tera_scaling"
HISTORY = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")


def main() -> None:
    base_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 600000
    forget_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    os.environ.setdefault("SPARK_LOCAL_DIRS", os.path.join(SHM, "localdir"))
    from pyspark.sql import functions as F

    from tera_spark.fixtures.transcripts import (
        lexicon_spark_df,
        transcripts_spark_df_dist,
    )
    from tera_spark.pipeline.forget import run_pipeline_forget
    from tera_spark.pipeline.incremental import read_live
    from tera_spark.pipeline.link import prepare_lexicon
    from tera_spark.pipeline.run import run_pipeline
    from tera_spark.session import get_spark

    spark = get_spark("forget_probe", cores=cores, shuffle_partitions=cores)
    spark.range(0, cores * 1000, 1, cores * 2).selectExpr("sum(id)").collect()
    lex = prepare_lexicon(lexicon_spark_df(spark))

    base_src = os.path.join(SHM, f"transcripts_{base_convs}")
    if not os.path.exists(os.path.join(base_src, "_SUCCESS")):
        transcripts_spark_df_dist(spark, n_convs=base_convs, parts=64).write.mode(
            "overwrite"
        ).parquet(base_src)
    base = spark.read.parquet(base_src)
    n_base = base.count()

    # forget every (base_convs // forget_convs)-th conversation id —
    # deterministic, spread across the id range like real retractions
    step = max(1, base_convs // forget_convs)
    all_ids = [r[0] for r in base.select("conv_id").distinct().collect()]
    all_ids.sort()
    drop = all_ids[::step][:forget_convs]
    drop_df = spark.createDataFrame([(c,) for c in drop], "conv_id string")
    n_forget_turns = base.join(
        F.broadcast(drop_df), "conv_id", "left_semi"
    ).count()

    out = os.path.join(SHM, "forget_probe_base")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_pipeline(spark, base, lex, out)
    base_secs = time.time() - t0

    t0 = time.time()
    res = run_pipeline_forget(spark, drop, lex, out)
    forget_secs = time.time() - t0
    phases = {
        m["stage"].split("@")[0].lstrip("_"): m["seconds"]
        for m in res.metrics
        if m["rows_out"] == -1
    }

    # the alternative: rebuild from scratch over the remaining convs
    out_full = os.path.join(SHM, "forget_probe_full")
    shutil.rmtree(out_full, ignore_errors=True)
    remaining = base.join(F.broadcast(drop_df), "conv_id", "left_anti")
    t0 = time.time()
    run_pipeline(spark, remaining, lex, out_full)
    rebuild_secs = time.time() - t0

    counts = {}
    for t in ("triples", "nodes", "edges"):
        a = read_live(spark, out, t).count()
        b = spark.read.parquet(os.path.join(out_full, t)).count()
        counts[t] = (a, b)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out_full, ignore_errors=True)

    rec = {
        "mode": "forget",
        "cores": cores,
        "base_turns": n_base,
        "forget_convs": len(drop),
        "forget_turns": n_forget_turns,
        "base_seconds": round(base_secs, 2),
        "forget_seconds": round(forget_secs, 2),
        "rebuild_seconds": round(rebuild_secs, 2),
        "counts_match": all(a == b for a, b in counts.values()),
        "counts": counts,
        "forget_phases": phases,
        "ts": int(time.time()),
    }
    os.makedirs(os.path.dirname(HISTORY), exist_ok=True)
    with open(HISTORY, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
