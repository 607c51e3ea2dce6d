"""ECOTOX Effects extraction — T9/T10, the flagship write path.

Reference: ``Effects._load_effect_data``
(/root/reference/tera/DataAggregation.py:398-470). One tests row emits the
test's type/species/chemical edges plus reified quantity bnodes for study
duration / organism age / weight; one results row emits a fresh result
bnode carrying endpoint/effect/concentration and hooks it onto its test.

Blank nodes are deterministic content hashes (SURVEY.md §1.1): the
reference's ``BNode()`` is random per run, ours is a pure function of the
row — reproducible across retries/partitions, required for checkpoint
resume and triple-set comparison. Duplicate result rows get a
``dup_seq`` discriminator so cardinality matches the reference (each input
row produced its own result node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tera_spark.constants import MISSING, NS_ECOTOX, RDF_TYPE, RDF_VALUE
from tera_spark.functions.units import unit_iri, with_parsed_unit, with_parsed_units
from tera_spark.operators.extract._emit import emit, t, uri
from tera_spark.operators.triples import bnode, union_graphs
from tera_spark.sources.readers import clean_strings, read_pipe_csv

TESTS_COLS = [
    "test_id", "test_cas", "species_number",
    "study_duration_mean", "study_duration_unit",
    "organism_habitat", "organism_lifestage",
    "organism_age_mean", "organism_age_unit",
    "organism_init_wt_mean", "organism_init_wt_unit",
]
RESULTS_COLS = ["test_id", "endpoint", "conc1_mean", "conc1_unit", "effect"]

_REQ_TESTS = ["test_id", "test_cas", "species_number"]


def clean_tests(raw: DataFrame) -> DataFrame:
    """S7 cleaning (DataAggregation.py:399-404): nan→null, dropna on the
    required ids, fill 'missing', trim."""
    cols = [c for c in TESTS_COLS if c in raw.columns]
    return clean_strings(raw.select(cols), drop_subset=_REQ_TESTS, fill=MISSING)


def clean_results(raw: DataFrame) -> DataFrame:
    """S8 cleaning (DataAggregation.py:405-408)."""
    cols = [c for c in RESULTS_COLS if c in raw.columns]
    return clean_strings(raw.select(cols), drop_subset=RESULTS_COLS, fill=MISSING)


def tests_triples(tests: DataFrame) -> DataFrame:
    """T9 (DataAggregation.py:410-434). Input: cleaned tests frame."""
    ns = NS_ECOTOX
    # fused: one distinct over all 3 unit columns (one scan), not 3
    df = with_parsed_units(
        tests,
        {
            "study_duration_unit": "_pu_std",
            "organism_age_unit": "_pu_age",
            "organism_init_wt_unit": "_pu_wt",
        },
    )

    test = uri(ns + "test/", "test_id")
    taxon = uri(ns + "taxon/", "species_number")
    cas = uri(ns + "cas/", "test_cas")

    elems = [
        t(test, RDF_TYPE, F.lit(ns + "Test")),
        t(test, ns + "species", taxon),
        t(test, ns + "chemical", cas),
    ]
    quantity_specs = [
        ("study_duration_mean", "study_duration_unit", "_pu_std", "studyDuration"),
        ("organism_age_mean", "organism_age_unit", "_pu_age", "organismAge"),
        ("organism_init_wt_mean", "organism_init_wt_unit", "_pu_wt", "organismWeight"),
    ]
    for val, unit, parsed, prop in quantity_specs:
        has_v = F.col(val) != MISSING
        b = bnode(F.col("test_id"), F.lit(prop), F.col(val), F.col(unit), tag="test-q")
        elems += [
            t(b, RDF_VALUE, F.col(val), lit=True, when=has_v),
            t(
                b,
                F.lit("http://qudt.org/vocab/unit#units"),
                unit_iri(F.col(parsed)),
                when=has_v & (F.col(unit) != MISSING) & (F.col(parsed) != ""),
            ),
            t(test, ns + prop, b, when=has_v),
        ]
    elems += [
        t(
            test,
            ns + "organismHabitat",
            uri(ns + "habitat/", "organism_habitat"),
            when=F.col("organism_habitat") != MISSING,
        ),
        t(
            test,
            ns + "organismLifestage",
            uri(ns + "lifestage/", "organism_lifestage"),
            when=F.col("organism_lifestage") != MISSING,
        ),
    ]
    return emit(df, *elems)


def results_triples(results: DataFrame, respread: bool = False) -> DataFrame:
    """T10 (DataAggregation.py:436-456). Input: cleaned results frame.

    The reference mints one fresh result bnode per input *row*; to keep
    that cardinality deterministically we group identical rows (map-side
    partial agg, one small shuffle) and re-expand with a dup sequence.

    ``respread=True`` adds a numbered (AQE-exempt) repartition between the
    groupBy and the emission: the post-groupBy stage is compute-dense per
    byte (x6 triple explode, two md5 bnodes per row), so when the grouped
    table is small in BYTES AQE coalesces it to a handful of tasks and the
    emission serializes (measured: t10 entry 4.5s -> ~3.5s warm at sf0.1
    with the respread). Callers with cluster-scale inputs leave it off —
    their post-shuffle partitions are already wide, and the extra exchange
    would be pure cost.
    """
    ns = NS_ECOTOX
    grouped = (
        results.groupBy(RESULTS_COLS)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("dup_seq", F.explode(F.sequence(F.lit(1), F.col("_n"))))
        .drop("_n")
    )
    if respread:
        grouped = grouped.repartition(
            results.sparkSession.sparkContext.defaultParallelism
        )
    # NB: the unit-vocabulary branch deliberately derives from ``grouped``
    # (not the cheaper pre-group frame): its subquery then shares the main
    # plan's groupBy exchange via runtime exchange reuse, so the 5-column
    # shuffle runs ONCE — A/B'd both ways in round 6 (vocab-from-results
    # re-scanned lineitem and was ~20% slower end to end).
    df = with_parsed_unit(grouped, "conc1_unit", "_pu_conc")
    df = df.withColumn("_digits", F.regexp_replace(F.col("conc1_mean"), "[^0-9]", ""))

    key = [F.col(c) for c in RESULTS_COLS] + [F.col("dup_seq")]
    r = bnode(*key, tag="result")
    b = bnode(*key, tag="conc")
    test = uri(ns + "test/", "test_id")
    has_digits = F.col("_digits") != ""

    return emit(
        df,
        t(r, ns + "endpoint", uri(ns + "endpoint/", "endpoint")),
        t(r, ns + "effect", uri(ns + "effect/", "effect")),
        t(b, RDF_VALUE, F.col("_digits"), lit=True, when=has_digits),
        t(
            b,
            "http://qudt.org/vocab/unit#units",
            unit_iri(F.col("_pu_conc")),
            when=has_digits & (F.col("conc1_unit") != MISSING) & (F.col("_pu_conc") != ""),
        ),
        t(r, ns + "concentration", b),
        t(test, ns + "hasResult", r),
    )


def effects_graph(tests_raw: DataFrame, results_raw: DataFrame) -> DataFrame:
    """Full ``Effects`` DataObject (DataAggregation.py:381-470)."""
    return union_graphs(
        tests_triples(clean_tests(tests_raw)),
        results_triples(clean_results(results_raw)),
    )


def get_endpoint_relational(tests: DataFrame, results: DataFrame) -> DataFrame:
    """The flagship answered *pre-graph* (J1, SURVEY.md §2.4): one
    equi-join on test_id instead of the 10-way triple star — the scale
    path. Output is identical to ``query_api.get_endpoint`` over the
    emitted graph (asserted in tests and by sharing the DuckDB oracle):
    columns (c, s, cc, cu, ep, ef, sd, sdu) with the same null semantics
    (concentration needs digits AND a parseable unit; OPTIONAL study
    duration needs value AND parseable unit).

    Inputs are *cleaned* frames (clean_tests / clean_results).
    """
    from tera_spark.constants import NS_UNIT

    t = with_parsed_unit(
        tests.select("test_id", "test_cas", "species_number",
                     "study_duration_mean", "study_duration_unit"),
        "study_duration_unit",
        "_pu_std",
    )
    r = with_parsed_unit(results, "conc1_unit", "_pu_conc").withColumn(
        "_digits", F.regexp_replace(F.col("conc1_mean"), "[^0-9]", "")
    )
    r = r.filter(
        (F.col("_digits") != "") & (F.col("conc1_unit") != MISSING) & (F.col("_pu_conc") != "")
    )
    sd_ok = (
        (F.col("study_duration_mean") != MISSING)
        & (F.col("study_duration_unit") != MISSING)
        & (F.col("_pu_std") != "")
    )
    ns = NS_ECOTOX
    # distinct BEFORE minting the URIs: prefixing with fixed namespaces is
    # injective per column (and null-preserving for sd/sdu), so dedup over
    # the raw tuples is the same set — but the distinct's exchange carries
    # the short raw values instead of ~50-char-prefixed URIs (guide §2.3,
    # shuffle fewer bytes).
    narrow = (
        r.join(t, "test_id", "inner")
        .select(
            F.col("test_cas").alias("_cas"),
            F.col("species_number").alias("_sp"),
            F.col("_digits").alias("cc"),
            F.col("_pu_conc").alias("_puc"),
            F.col("endpoint").alias("_ep"),
            F.col("effect").alias("_ef"),
            F.when(sd_ok, F.col("study_duration_mean")).alias("sd"),
            F.when(sd_ok, F.col("_pu_std")).alias("_pus"),
        )
        .distinct()
    )
    return narrow.select(
        uri(ns + "cas/", "_cas").alias("c"),
        uri(ns + "taxon/", "_sp").alias("s"),
        F.col("cc"),
        F.concat(F.lit(NS_UNIT), F.col("_puc")).alias("cu"),
        uri(ns + "endpoint/", "_ep").alias("ep"),
        uri(ns + "effect/", "_ef").alias("ef"),
        F.col("sd"),
        F.when(F.col("_pus").isNotNull(), F.concat(F.lit(NS_UNIT), F.col("_pus"))).alias(
            "sdu"
        ),
    )


def load_effects(spark, directory: str) -> DataFrame:
    """``Effects(directory=...)`` — scan tests.txt/results.txt and emit."""
    return effects_graph(
        read_pipe_csv(spark, directory + "tests.txt"),
        read_pipe_csv(spark, directory + "results.txt"),
    )
