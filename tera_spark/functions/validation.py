"""URL validation (P6/F10; SURVEY.md §2.2).

The reference gates trait triples on ``validators.url``
(/root/reference/tera/DataAggregation.py:309-317,350,373). We express the
same check as a single ``rlike`` regex that runs inside codegen — one
pattern string shared between the Column form and a pure-Python form (used
by the golden oracles), so Spark and oracle agree exactly; remaining
divergence from validators.url's full RFC automaton is absorbed by the
P/R≥0.95 tolerance (SURVEY.md §2.2 P6).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_REGEX = (
    r"^[a-zA-Z][a-zA-Z0-9+.-]*://"          # scheme
    r"(?:[^\s/?#@]+@)?"                      # optional userinfo
    r"(?:[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?"
    r"(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]*[a-zA-Z0-9])?)+"  # dotted host
    r"|localhost|\d{1,3}(?:\.\d{1,3}){3})"   # or localhost / IPv4
    r"(?::\d+)?"                             # port
    r"(?:[/?#]\S*)?$"                        # path/query/fragment
)

_URL_RE = re.compile(URL_REGEX)


def is_url(col: Column) -> Column:
    return col.rlike(URL_REGEX)


def is_url_py(s: str | None) -> bool:
    return s is not None and bool(_URL_RE.match(s))
