"""Deterministic synthetic transcript corpus + linking lexicons.

The graft's input (BASELINE.json input_hint) is an Iceberg table of
multi-turn agent transcripts::

    conv_id string, turn_idx int32, role string, text string,
    tool string, ts timestamp

No external data: this module synthesizes that table (fixed seed, no
wall-clock — ``ts`` is a deterministic minute counter from 2026-01-01) at
any scale, embedding mentions of chemicals/species/endpoints drawn from
TERA-shaped lexicons, including 1-2-edit misspellings (fuzzy-linking
exercise), concentration quantities with units (unit-parser exercise), junk
turns, and a few "hot" conversations with 100× turns (skew exercise) —
FIXTURES.md §1.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

EPOCH = datetime(2026, 1, 1, 0, 0, 0)

CHEMICALS = [
    ("50-00-0", ["formaldehyde", "formalin", "methanal"]),
    ("71-43-2", ["benzene", "benzol"]),
    ("7440-50-8", ["copper", "cupric ion"]),
    ("67-64-1", ["acetone", "propanone"]),
    ("7647-01-0", ["hydrochloric acid", "muriatic acid"]),
    ("108-88-3", ["toluene", "methylbenzene"]),
    ("7782-50-5", ["chlorine"]),
    ("64-17-5", ["ethanol", "ethyl alcohol"]),
    ("75-09-2", ["dichloromethane", "methylene chloride"]),
    ("7664-41-7", ["ammonia"]),
    ("57-12-5", ["cyanide"]),
    ("7439-92-1", ["lead"]),
    ("7439-97-6", ["mercury", "quicksilver"]),
    ("7440-66-6", ["zinc"]),
    ("120-12-7", ["anthracene"]),
    ("91-20-3", ["naphthalene"]),
]

SPECIES = [
    ("sp1", "Pimephales promelas", "fathead minnow"),
    ("sp2", "Daphnia magna", "water flea"),
    ("sp3", "Danio rerio", "zebrafish"),
    ("sp4", "Oncorhynchus mykiss", "rainbow trout"),
    ("sp5", "Lumbricus terrestris", "common earthworm"),
    ("sp6", "Apis mellifera", "honey bee"),
    ("sp7", "Selenastrum capricornutum", "green algae"),
    ("sp8", "Gammarus pulex", "freshwater shrimp"),
    ("sp9", "Chironomus riparius", "harlequin fly"),
    ("sp10", "Lemna minor", "common duckweed"),
]

ENDPOINTS = ["LC50", "EC50", "NOEC", "LOEC", "LD50", "IC50", "MATC", "BCF"]
UNITS = ["mg/L", "ug/L", "g/kg", "mM", "%", "ppm-ish", "ng/L"]
ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "calculator", "database", None, None]

_FILLER = [
    "please check the toxicity report for",
    "the assay on",
    "observed an effect of",
    "running the exposure study with",
    "no significant response from",
    "follow-up needed on",
    "the lab confirmed that",
    "irrelevant chatter about the weather and scheduling",
    "let me look that up",
    "summarizing previous results now",
]


def _misspell(rng: random.Random, word: str) -> str:
    """1-2 edit-distance corruption (deterministic)."""
    if len(word) < 5:
        return word
    ops = rng.randint(1, 2)
    w = list(word)
    for _ in range(ops):
        i = rng.randrange(1, len(w) - 1)
        kind = rng.choice(["swap", "drop", "dup"])
        if kind == "swap":
            w[i], w[i - 1] = w[i - 1], w[i]
        elif kind == "drop":
            del w[i]
        else:
            w.insert(i, w[i])
    return "".join(w)


def gen_lexicons() -> tuple[pd.DataFrame, pd.DataFrame]:
    """(chemical lexicon, species lexicon): (entity, label, kind) rows —
    the TERA ECOTOX-chemicals / taxonomy label dictionaries
    (SURVEY.md §2.5 A4)."""
    chem = [
        {"entity": "cas:" + cas, "label": name, "kind": "chemical"}
        for cas, names in CHEMICALS
        for name in names
    ]
    spec = []
    for sid, latin, common in SPECIES:
        spec.append({"entity": "taxon:" + sid, "label": latin, "kind": "species"})
        spec.append({"entity": "taxon:" + sid, "label": common, "kind": "species"})
    return pd.DataFrame(chem), pd.DataFrame(spec)


def _turn_content(
    rng: random.Random, ti: int
) -> tuple[str, str | None, str, list[tuple[str, bool]]]:
    """(role, tool, text, truth) for one turn — shared by the sequential
    and distributed generators (identical rng call order keeps the
    sequential output byte-stable vs round 1). ``truth`` lists the planted
    (entity_id, verbatim) pairs — verbatim=False when the surface form was
    misspelled — the ground truth the pipeline P/R test scores against."""
    role = ROLES[ti % 3]
    tool = rng.choice(TOOLS) if role == "tool" else None
    parts = [rng.choice(_FILLER)]
    truth: list[tuple[str, bool]] = []
    r = rng.random()
    if r < 0.35:  # chemical mention (sometimes misspelled)
        cas, names = rng.choice(CHEMICALS)
        name = orig = rng.choice(names)
        if rng.random() < 0.25:
            name = _misspell(rng, name)
        parts.append(name)
        truth.append(("cas:" + cas, name == orig))
        if rng.random() < 0.6:  # endpoint + concentration
            parts.append(
                f"{rng.choice(ENDPOINTS)} at "
                f"{rng.choice(['0.5', '2', '10', '100', '2000000', '>100', 'ca. 5'])} "
                f"{rng.choice(UNITS)}"
            )
    elif r < 0.65:  # species mention
        sid, latin, common = rng.choice(SPECIES)
        name = orig = latin if rng.random() < 0.6 else common
        if rng.random() < 0.2:
            name = _misspell(rng, name)
        parts.append(name)
        truth.append(("taxon:" + sid, name == orig))
        if rng.random() < 0.3:
            cas, names = rng.choice(CHEMICALS)
            parts.append("exposed to " + rng.choice(names))
            truth.append(("cas:" + cas, True))
    # else: junk turn, no mentions
    return role, tool, " ".join(parts), truth


def gen_transcripts(
    n_convs: int = 100,
    avg_turns: int = 10,
    hot_convs: int = 2,
    hot_factor: int = 100,
    seed: int = 42,
    return_truth: bool = False,
) -> pd.DataFrame | tuple[pd.DataFrame, pd.DataFrame]:
    """Deterministic transcript table. ``hot_convs`` conversations get
    ``hot_factor``× the turns — the skew the partitioning strategy must
    absorb. With ``return_truth`` also returns the planted-mention ground
    truth (conv_id, turn_idx, entity, verbatim) for P/R scoring."""
    rng = random.Random(seed)
    rows = []
    truth_rows = []
    global_turn = 0
    for ci in range(n_convs):
        conv_id = f"conv{ci:06d}"
        n_turns = max(2, int(rng.gauss(avg_turns, 3)))
        if ci < hot_convs:
            n_turns *= hot_factor
        for ti in range(n_turns):
            role, tool, text, truth = _turn_content(rng, ti)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": EPOCH + timedelta(minutes=global_turn),
                }
            )
            truth_rows.extend(
                {"conv_id": conv_id, "turn_idx": ti, "entity": e, "verbatim": v}
                for e, v in truth
            )
            global_turn += 1
    df = pd.DataFrame(rows)
    if not return_truth:
        return df
    return df, pd.DataFrame(truth_rows)


def transcripts_spark_df(spark, **kwargs):
    pdf = gen_transcripts(**kwargs)
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    return df.withColumn("turn_idx", F.col("turn_idx").cast("int"))


def transcripts_spark_df_dist(
    spark,
    n_convs: int,
    avg_turns: int = 10,
    hot_convs: int = 2,
    hot_factor: int = 100,
    seed: int = 42,
    parts: int | None = None,
    id_start: int = 0,
):
    """Distributed corpus generator for large benches: conversations are
    generated in parallel via ``mapInPandas``, each self-seeded by
    ``(seed, conv index)`` so the output is deterministic and IDENTICAL at
    any parallelism / partitioning — the property the two-cluster-size
    scaling measurement needs. (The sequential ``gen_transcripts`` threads
    one rng through all convs, so it stays the small-fixture generator;
    driver-side generation would be the non-distributed bottleneck at
    bench scale.)"""
    parts = parts or spark.sparkContext.defaultParallelism
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def gen(batches):
        for pdf in batches:
            recs = []
            for ci in pdf["id"]:
                ci = int(ci)
                rng = random.Random(f"{seed}:{ci}")
                n_turns = max(2, int(rng.gauss(avg_turns, 3)))
                if ci < hot_convs:
                    n_turns *= hot_factor
                ts0 = EPOCH + timedelta(minutes=ci * (avg_turns + 3))
                for ti in range(n_turns):
                    role, tool, text, _truth = _turn_content(rng, ti)
                    recs.append(
                        (f"conv{ci:06d}", ti, role, text, tool, ts0 + timedelta(minutes=ti))
                    )
            yield pd.DataFrame(
                recs, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    # ``id_start`` shifts the conv-index range: conv content depends only on
    # (seed, index), so range [K, K+n) yields a corpus DISJOINT from and
    # consistent with range [0, K) — the delta-batch generator for
    # incremental-maintenance benches.
    return spark.range(id_start, id_start + n_convs, 1, parts).mapInPandas(gen, schema)


def lexicon_spark_df(spark):
    chem, spec = gen_lexicons()
    return spark.createDataFrame(pd.concat([chem, spec], ignore_index=True))
