"""Fuzzy string scoring (J6's scorer; SURVEY.md §2.4 J6, §7.3).

The reference scores candidate entity pairs with fuzzywuzzy's
``process.extractOne`` over label lists
(/root/reference/tera/DataIntegration.py:261-273). fuzzywuzzy's pure-Python
backend is ``difflib.SequenceMatcher`` — we use the same stdlib primitive,
so ``ratio`` matches fuzz.ratio semantics (0-100 int scale), and we provide
token_sort / token_set variants per the fuzzywuzzy algorithm. ``wratio``
approximates WRatio as the max of the three (documented deviation: WRatio
adds partial-ratio heuristics with length-based weights; the alignment
threshold tolerance absorbs the difference — SURVEY.md §7.3).

Execution: scoring only ever runs on *blocked candidate pairs* (see
operators/align.py), via an Arrow-vectorized pandas UDF — never on the
cross product.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _process(s: str) -> str:
    """fuzzywuzzy full_process: non-alphanumeric → space, lower, strip."""
    return re.sub(r"(?ui)\W", " ", str(s)).lower().strip()


def ratio(a: str, b: str) -> int:
    a, b = _process(a), _process(b)
    if not a or not b:
        return 0
    return int(round(100 * SequenceMatcher(None, a, b).ratio()))


def token_sort_ratio(a: str, b: str) -> int:
    sa = " ".join(sorted(_process(a).split()))
    sb = " ".join(sorted(_process(b).split()))
    if not sa or not sb:
        return 0
    return int(round(100 * SequenceMatcher(None, sa, sb).ratio()))


def token_set_ratio(a: str, b: str) -> int:
    ta, tb = set(_process(a).split()), set(_process(b).split())
    if not ta or not tb:
        return 0
    inter = " ".join(sorted(ta & tb))
    s1 = (inter + " " + " ".join(sorted(ta - tb))).strip()
    s2 = (inter + " " + " ".join(sorted(tb - ta))).strip()
    pairs = [(inter, s1), (inter, s2), (s1, s2)]
    best = 0
    for x, y in pairs:
        if x or y:
            best = max(best, int(round(100 * SequenceMatcher(None, x, y).ratio())))
    return best


def wratio(a: str, b: str) -> int:
    """WRatio-lite: max of plain/token-sort/token-set ratios."""
    return max(ratio(a, b), token_sort_ratio(a, b), token_set_ratio(a, b))


@F.pandas_udf(T.IntegerType())
def _wratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized pair scorer for blocked candidates (Arrow batches)."""
    return pd.Series(
        [wratio(x, y) if x is not None and y is not None else 0 for x, y in zip(a, b)],
        dtype="int32",
    )


# Marked nondeterministic ON PURPOSE (it is deterministic): this stops
# Catalyst from (a) pushing threshold filters that reference the score
# BELOW the cheap blocking aggregation — measured to re-point the scorer at
# every raw shingle-pair row, ~15× the candidate count — and (b) duplicating
# the UDF into both a pushed filter and the projection (double evaluation).
# Expensive-Python-UDF ordering must be pinned where the plan says it runs.
wratio_udf = _wratio_udf.asNondeterministic()


def jaccard_tokens(a: str, b: str) -> float:
    ta, tb = set(_process(a).split()), set(_process(b).split())
    if not ta and not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


def tanimoto(fp1: int, fp2: int) -> float:
    """F5 (utils.py:206-225) with the intended semantics: Jaccard over
    fingerprint bits. The reference's version TypeErrors on its documented
    str inputs (SURVEY.md §8 item 6); ours takes packed ints."""
    both = bin(fp1 & fp2).count("1")
    c1, c2 = bin(fp1).count("1"), bin(fp2).count("1")
    denom = c1 + c2 - both
    return float(both) / denom if denom else 0.0
