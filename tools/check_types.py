"""Type-strict oracle audit: the driver's value-hash encodes COLUMN
TYPES, while tools/check_oracles.py normalizes values before comparing —
so a DuckDB HUGEINT (uncast sum) or INT32 against a Spark BIGINT passes
the local replica yet hash-fails the driver (exactly how
curation_pack_sequences / kg_conversation_stats went red in r04).

This tool closes that gap WITHOUT running Spark jobs: for every
registry entry with an oracle it compares the Spark result's schema
(from the lazily-built DataFrame — no action) against the DuckDB
result's Arrow schema, mapped into a common vocabulary. Run it after
adding or editing any oracle.

Usage: python tools/check_types.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Spark simpleString -> canonical
_SPARK = {
    "string": "str", "double": "f64", "float": "f32", "boolean": "bool",
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "timestamp": "ts", "date": "date", "binary": "bin", "decimal": "dec",
}
# Arrow type str -> canonical
_ARROW = {
    "string": "str", "large_string": "str", "double": "f64", "float": "f32",
    "bool": "bool", "int64": "i64", "int32": "i32", "int16": "i16",
    "int8": "i8", "uint64": "HUGE?", "decimal128(38, 0)": "HUGEINT",
    "date32[day]": "date", "binary": "bin",
}


def canon_spark(t: str) -> str:
    if t.startswith("array<"):
        return "arr<" + canon_spark(t[6:-1]) + ">"
    if t.startswith("decimal"):
        return "dec"
    if t.startswith("timestamp"):
        return "ts"
    return _SPARK.get(t, t)


def canon_arrow(t) -> str:
    s = str(t)
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = t.value_type
        return "arr<" + canon_arrow(inner) + ">"
    if s.startswith("decimal"):
        return "HUGEINT" if s == "decimal128(38, 0)" else "dec"
    if s.startswith("timestamp"):
        return "ts"
    return _ARROW.get(s, s)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from tera_spark.session import get_spark

    spark = get_spark("type_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            continue
        try:
            sdf = fn(spark, sf)
            s_types = {f.name.lower(): canon_spark(f.dataType.simpleString())
                       for f in sdf.schema.fields}
        except Exception as ex:
            bad.append((name, f"spark error: {str(ex)[:200]}"))
            continue
        try:
            tbl = con.execute(f"SELECT * FROM ({os_[name]}) LIMIT 0").fetch_arrow_table()
            d_types = {f.name.lower(): canon_arrow(f.type) for f in tbl.schema}
        except Exception as ex:
            bad.append((name, f"duckdb error: {str(ex)[:200]}"))
            continue
        if list(s_types) != list(d_types):
            bad.append((name, f"columns {list(s_types)} vs {list(d_types)}"))
            continue
        diffs = [
            f"{c}: spark={s_types[c]} duck={d_types[c]}"
            for c in s_types
            if s_types[c] != d_types[c]
        ]
        if diffs:
            bad.append((name, "; ".join(diffs)))
        else:
            print(f"✓ {name}")
    if bad:
        print(f"\n{len(bad)} TYPE MISMATCHES:")
        for name, msg in bad:
            print(f"✗ {name}: {msg}")
        sys.exit(1)
    print("\nall oracle types match")


if __name__ == "__main__":
    main()
