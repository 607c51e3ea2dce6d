"""Stage 1 — mention detection over turn text (north_star: "batched mention
detection … run as vectorized pandas/Arrow UDFs over turn text (no per-row
Python)").

One Arrow-vectorized pandas UDF maps each ``text`` to an array of candidate
mentions; ``explode`` turns them into rows with (conv_id, turn_idx) carried
as provenance — exactly as ``test_id`` rides through T9/T10 in the
reference (SURVEY.md §2.3 graft note).

Candidate classes:
- ``quantity``: number + unit-ish token (feeds the F1 unit parser);
- ``code``: endpoint-style all-caps codes (LC50, NOEC, …);
- ``term``: word 1..3-grams of alphabetic tokens (len ≥ 4, stopword-
  filtered) — linking decides which are real entities.

Scale: the stage is embarrassingly parallel — no shuffle at all; input
partitioning (bucketed by conv_id) is preserved. Per-turn candidate count
is bounded (≤ 3 n-grams per token), so output size is O(input tokens).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = {
    "the", "a", "an", "and", "or", "for", "from", "with", "that", "this",
    "please", "check", "report", "assay", "observed", "effect", "running",
    "exposure", "study", "significant", "response", "needed", "confirmed",
    "irrelevant", "chatter", "about", "weather", "scheduling", "look",
    "summarizing", "previous", "results", "now", "lab", "let", "toxicity",
    "follow", "exposed",
}

_QUANT_RE = re.compile(r"(?:^|\s)((?:[<>]\s*|ca\.\s*)?\d+(?:\.\d+)?)\s+([a-zA-Zµ%][\w/^%.-]*)")
_CODE_RE = re.compile(r"\b([A-Z]{2,6}\d{0,3})\b")
_WORD_RE = re.compile(r"[A-Za-zµ-]+")

MENTION_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("mention", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("unit", T.StringType()),
            T.StructField("pos", T.IntegerType()),
        ]
    )
)


def _mentions_of(text: str) -> list:
    if not text:
        return []
    out = []
    for m in _QUANT_RE.finditer(text):
        out.append((m.group(0).strip(), "quantity", m.group(1).strip(), m.group(2), m.start()))
    for m in _CODE_RE.finditer(text):
        out.append((m.group(1), "code", None, None, m.start()))
    words = [(w.group(0), w.start()) for w in _WORD_RE.finditer(text)]
    content = [
        (w, p)
        for w, p in words
        if w.lower() not in STOPWORDS and len(w) >= 4 and not w.isupper()
    ]
    # word n-grams (1..3) over *consecutive content words* (consecutive in
    # the original token stream, so phrases broken by stopwords don't glue)
    idx_of = {p: i for i, (w, p) in enumerate(words)}
    for n in (1, 2, 3):
        for i, (w, p) in enumerate(content):
            gram = [(w, p)]
            j = idx_of[p]
            ok = True
            for k in range(1, n):
                if j + k >= len(words):
                    ok = False
                    break
                nw, np_ = words[j + k]
                if nw.lower() in STOPWORDS or len(nw) < 2:
                    ok = False
                    break
                gram.append((nw, np_))
            if ok and len(gram) == n:
                out.append((" ".join(g for g, _ in gram), "term", None, None, p))
    return out


@F.pandas_udf(MENTION_STRUCT)
def mentions_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_mentions_of)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """Transcripts → mention rows. Stable (conv_id, turn_idx) ordering is
    the provenance key (input_hint invariant); pos disambiguates within a
    turn."""
    return (
        transcripts.select(
            "conv_id",
            "turn_idx",
            "role",
            F.explode(mentions_udf(F.col("text"))).alias("_m"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("_m.mention").alias("mention"),
            F.col("_m.kind").alias("kind"),
            F.col("_m.value").alias("value"),
            F.col("_m.unit").alias("unit"),
            F.col("_m.pos").alias("pos"),
        )
    )
