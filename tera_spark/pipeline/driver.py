"""spark-submit entry point for the KG-construction pipeline.

Usage::

    spark-submit --py-files tera_spark.zip -m tera_spark.pipeline.driver \\
        --transcripts <path-or-synth:N> --out /data/kg_run1 [--salts 8]

``--transcripts synth:N`` generates the deterministic synthetic corpus with
N conversations (no external data); otherwise the argument is a parquet /
Iceberg path of (conv_id, turn_idx, role, text, tool, ts).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--salts", type=int, default=None)
    ap.add_argument("--fuzzy-threshold", type=float, default=88.0)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args(argv)

    from tera_spark.fixtures.transcripts import (
        lexicon_spark_df,
        transcripts_spark_df,
        transcripts_spark_df_dist,
    )
    from tera_spark.pipeline.run import run_pipeline
    from tera_spark.session import get_spark

    spark = get_spark("tera_spark_pipeline", cores=args.cores)
    if args.transcripts.startswith("synth:"):
        n = int(args.transcripts.split(":", 1)[1])
        # small corpora use the byte-stable sequential generator (golden
        # tests); large ones generate distributed (per-conv seeded)
        gen = transcripts_spark_df if n <= 5000 else transcripts_spark_df_dist
        transcripts = gen(spark, n_convs=n)
    else:
        transcripts = spark.read.parquet(args.transcripts)
    lexicon = lexicon_spark_df(spark)

    t0 = time.time()
    n_turns = transcripts.count()
    res = run_pipeline(
        spark,
        transcripts,
        lexicon,
        args.out,
        fuzzy_threshold=args.fuzzy_threshold,
        salts=args.salts,
        force=args.force,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "turns": n_turns,
                "seconds": round(wall, 2),
                "turns_per_sec": round(n_turns / wall, 1),
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "metrics": res.metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
