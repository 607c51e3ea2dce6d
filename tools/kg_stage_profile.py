"""Per-stage wall-time breakdown of the bench's kg_pipeline (guide §1:
measure first, isolate with the noop sink). Reproduces bench.py's exact
dataflow (warm, second-pass timing) but times each stage separately, plus
the number of times the expensive pandas-UDF extraction would run by
counting jobs is approximated by timing repeated sub-plans.

Usage: python tools/kg_stage_profile.py [n_convs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from tera_spark.fixtures.transcripts import lexicon_spark_df, transcripts_spark_df_dist
    from tera_spark.operators.canonical import canonical_mapping
    from tera_spark.operators.triples import replace_entities
    from tera_spark.pipeline.extract import extract_mentions
    from tera_spark.pipeline.kg import build_triples
    from tera_spark.pipeline.link import link_mentions, prepare_lexicon
    from tera_spark.session import get_spark

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kg_stage_profile", cores=cores, shuffle_partitions=cores)
    spark.range(0, 10_000_000, 1, cores).select(F.sum("id")).collect()

    transcripts = transcripts_spark_df_dist(spark, n_convs=n_convs).cache()
    n_turns = transcripts.count()
    lexicon = lexicon_spark_df(spark)

    out = {"n_turns": n_turns}

    def timed(name, fn, reps=2):
        # warm number (second run), bench.py discipline
        vals = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        out[name] = vals
        print(f"{name}: {vals}", file=sys.stderr)

    sc = spark.sparkContext

    # Stage A: extraction alone
    sc.setJobDescription("profile: extract only")
    timed("extract_only", lambda: _noop(extract_mentions(transcripts)))

    # Stage B: prepare_lexicon alone
    sc.setJobDescription("profile: prepare_lexicon")
    timed("prepare_lexicon", lambda: prepare_lexicon(lexicon))

    # Stage C: full linking (includes prepare + extraction recomputes)
    def _link():
        mentions = extract_mentions(transcripts)
        linked, alias = link_mentions(mentions, lexicon)
        _noop(linked)

    sc.setJobDescription("profile: link full")
    timed("link_full", _link)

    # Stage C2: linking with materialized linked + alias consumed
    def _link_both():
        mentions = extract_mentions(transcripts)
        linked, alias = link_mentions(mentions, lexicon)
        _noop(linked)
        _noop(alias)

    sc.setJobDescription("profile: link both outputs")
    timed("link_both", _link_both)

    # Stage D: canonical_mapping (CC) given alias edges
    def _canon():
        mentions = extract_mentions(transcripts)
        linked, alias = link_mentions(mentions, lexicon)
        _noop(canonical_mapping(alias))

    sc.setJobDescription("profile: canonical map")
    timed("canonical_map", _canon)

    # Stage E: build_triples over linked (no canonical rewrite)
    def _bt():
        mentions = extract_mentions(transcripts)
        linked, alias = link_mentions(mentions, lexicon)
        _noop(build_triples(transcripts, linked, deduplicate=False))

    sc.setJobDescription("profile: build_triples")
    timed("build_triples", _bt)

    # Stage F: the full bench pipeline
    def _full():
        mentions = extract_mentions(transcripts)
        linked, alias = link_mentions(mentions, lexicon)
        triples = replace_entities(
            build_triples(transcripts, linked, deduplicate=False),
            canonical_mapping(alias),
        )
        _noop(triples)

    sc.setJobDescription("profile: full kg_pipeline")
    timed("full_pipeline", _full, reps=3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
