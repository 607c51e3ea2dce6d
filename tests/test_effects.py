"""Golden test: T9/T10 Spark emission vs the pure-Python oracle
(SURVEY.md §5.3 item 1). Fixture exercises: required-field dropna, the NaN
vocabulary, 'missing' fills, unparseable units, junk concentrations
(digit filter), duplicate result rows (bnode cardinality), habitat/
lifestage guards."""

import pandas as pd

from tera_spark.operators.extract.effects import (
    clean_results,
    clean_tests,
    effects_graph,
    results_triples,
    tests_triples,
)
from tests.oracles.effects_oracle import results_triples_oracle, tests_triples_oracle
from tests.util import assert_triples_match

TESTS_ROWS = [
    # full row, all units parseable
    dict(test_id="1", test_cas="50000", species_number="101",
         study_duration_mean="48", study_duration_unit="h",
         organism_habitat="Water", organism_lifestage="Adult",
         organism_age_mean="10", organism_age_unit="d",
         organism_init_wt_mean="2.5", organism_init_wt_unit="g"),
    # missing optionals
    dict(test_id="2", test_cas="50001", species_number="102",
         study_duration_mean=None, study_duration_unit=None,
         organism_habitat=None, organism_lifestage=None,
         organism_age_mean=None, organism_age_unit=None,
         organism_init_wt_mean=None, organism_init_wt_unit=None),
    # nan-vocabulary junk in required field → dropped
    dict(test_id="NC", test_cas="50002", species_number="103",
         study_duration_mean="1", study_duration_unit="h",
         organism_habitat=None, organism_lifestage=None,
         organism_age_mean=None, organism_age_unit=None,
         organism_init_wt_mean=None, organism_init_wt_unit=None),
    # unparseable unit → value triple but no unit triple
    dict(test_id="4", test_cas="  50003 ", species_number="104",
         study_duration_mean="96", study_duration_unit="zzz",
         organism_habitat="Soil", organism_lifestage="NR",  # NR is nan-vocab → missing
         organism_age_mean=None, organism_age_unit=None,
         organism_init_wt_mean=None, organism_init_wt_unit=None),
]

RESULTS_ROWS = [
    dict(test_id="1", endpoint="LC50", conc1_mean="2000000", conc1_unit="mg/L", effect="MOR"),
    # duplicate row → two distinct result bnodes
    dict(test_id="1", endpoint="LC50", conc1_mean="2000000", conc1_unit="mg/L", effect="MOR"),
    # junk conc → digit filter
    dict(test_id="1", endpoint="EC50", conc1_mean=">100", conc1_unit="ug/L", effect="GRO"),
    # all-junk conc → no value/unit triples, but conc bnode still linked
    dict(test_id="2", endpoint="NOEC", conc1_mean="ca. x", conc1_unit="mg/L", effect="REP"),
    # required field nan → dropped
    dict(test_id="2", endpoint="--", conc1_mean="5", conc1_unit="mg/L", effect="MOR"),
    # orphan result (test_id not in tests) — still emitted (reference behavior)
    dict(test_id="999", endpoint="LOEC", conc1_mean="1.5", conc1_unit="zzz", effect="POP"),
]


def _spark_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows).astype(object).where(pd.notnull(pd.DataFrame(rows)), None))


def test_tests_triples_match_oracle(spark):
    df = _spark_df(spark, TESTS_ROWS)
    got = tests_triples(clean_tests(df))
    assert_triples_match(got, tests_triples_oracle(TESTS_ROWS))


def test_results_triples_match_oracle(spark):
    df = _spark_df(spark, RESULTS_ROWS)
    got = results_triples(clean_results(df))
    assert_triples_match(got, results_triples_oracle(RESULTS_ROWS))


def test_effects_graph_union(spark):
    g = effects_graph(_spark_df(spark, TESTS_ROWS), _spark_df(spark, RESULTS_ROWS))
    expected = tests_triples_oracle(TESTS_ROWS) | results_triples_oracle(RESULTS_ROWS)
    assert_triples_match(g, expected)
