"""Freeze the two WRatio-scored registry entries' outputs as golden row
sets, so their driver rows graduate from rows-only to a full
hash-checked comparison.

Why: ``j6_string_matching`` and ``kg_pipeline_triples`` score with the
difflib-backed WRatio scorer, which no SQL engine can replay — their
portable twins are DuckDB-oracled end-to-end, but these two rows-only
rows sat outside the hard gate for four rounds (round-4 verdict
"What's wrong" #3 asked for exactly this: pin the output against a
frozen golden so the driver asserts stability).

The frozen golden becomes the DuckDB oracle itself: a
``SELECT * FROM (VALUES ...)`` literal with exact type casts, built at
``oracle_sql()`` time from the JSON files this tool writes into
``tera_spark/goldens/``. The driver then value/hash-compares the live
Spark run against the frozen set every round — any nondeterminism or
behavior drift in the WRatio path turns the row red.

Validity: ``kg_pipeline_triples`` is a pure function of in-repo
fixtures (sf-independent); ``j6_string_matching`` reads the ``part``
table, so its golden is captured at — and only valid at — sf0.01, the
scale the driver's correctness gate runs.

Usage:  python tools/freeze_goldens.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FROZEN = {
    "j6_string_matching": "j6_string_matching.sf001.json",
    "kg_pipeline_triples": "kg_pipeline_triples.json",
}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from tera_spark.session import get_spark

    spark = get_spark("freeze_goldens", cores=8, shuffle_partitions=8)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tera_spark", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    qs = e.queries()
    for name, fname in FROZEN.items():
        df = qs[name](spark, sf)
        cols = df.columns
        types = [f.dataType.simpleString() for f in df.schema.fields]
        rows = sorted(tuple(r) for r in df.collect())
        path = os.path.join(out_dir, fname)
        with open(path, "w") as fh:
            json.dump({"columns": cols, "types": types, "rows": rows}, fh)
        print(f"froze {name}: {len(rows)} rows -> {path}")


if __name__ == "__main__":
    main()
