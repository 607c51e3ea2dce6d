"""Stage 2b — (subj, pred, obj) triple extraction from linked mentions.

The emission rules are TERA-shaped (SURVEY.md §2.3 graft note): turn/
conversation provenance triples mirror T9's test-id threading; quantity
reification ((bnode, rdf:value, v), (bnode, unit:units, U)) mirrors
T9/T10's value bnodes, reusing the F1 unit parser; entity typing/labels
mirror T11/T14. Everything is explode-select over the linked-mention
table — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tera_spark.constants import NS_KG, NS_UNIT, RDF_TYPE, RDF_VALUE, RDFS_LABEL
from tera_spark.functions.units import with_parsed_unit
from tera_spark.operators.extract._emit import emit, t
from tera_spark.operators.triples import bnode, dedup


def _turn_uri():
    return F.concat(
        F.lit(NS_KG + "turn/"), F.col("conv_id"), F.lit("/"), F.col("turn_idx").cast("string")
    )


def _conv_uri():
    return F.concat(F.lit(NS_KG + "conv/"), F.col("conv_id"))


def transcript_structure_triples(transcripts: DataFrame) -> DataFrame:
    """Conversation/turn skeleton: one pass over the raw transcripts."""
    turn = _turn_uri()
    conv = _conv_uri()
    return emit(
        transcripts,
        t(conv, RDF_TYPE, F.lit(NS_KG + "Conversation")),
        t(turn, RDF_TYPE, F.lit(NS_KG + "Turn")),
        t(turn, NS_KG + "partOf", conv),
        t(turn, NS_KG + "role", F.col("role"), lit=True),
        t(turn, NS_KG + "tool", F.col("tool"), lit=True, when=F.col("tool").isNotNull()),
    )


_KIND_CLASS = {
    "chemical": NS_KG + "Chemical",
    "species": NS_KG + "Species",
    "endpoint": NS_KG + "Endpoint",
    "unknown": NS_KG + "Entity",
}


def _kind_class_expr():
    """Resolved class URI of a linked row's entity (unknown → kg:Entity).
    Shared by mention_triples and emission_refcounts so the refcount key
    is byte-pinned to the emitted object."""
    return F.coalesce(
        *[
            F.when(F.col("entity_kind") == k, F.lit(v))
            for k, v in _KIND_CLASS.items()
        ],
        F.lit(NS_KG + "Entity"),
    )


def _label_ok_expr():
    """Rows allowed to emit a label triple (see mention_triples)."""
    return F.col("link_method").isin("exact", "rule", "provisional")


def mention_triples(linked: DataFrame) -> DataFrame:
    """Entity mentions: (turn kg:mentions entity), entity typing + label."""
    df = linked.filter(F.col("entity").isNotNull() & (F.col("kind") != "quantity"))
    turn = _turn_uri()
    kind_class = _kind_class_expr()
    # Label triples only from exact/rule links (the mention text IS the
    # lexicon label) and provisionals (their only name) — fuzzy mentions
    # would attach misspellings as entity labels.
    label_ok = _label_ok_expr()
    return emit(
        df,
        t(turn, NS_KG + "mentions", F.col("entity")),
        t(F.col("entity"), RDF_TYPE, kind_class),
        t(F.col("entity"), RDFS_LABEL, F.col("mention"), lit=True, when=label_ok),
    )


def quantity_triples(linked: DataFrame) -> DataFrame:
    """T10-shaped reified quantities from 'quantity' mentions: digit-
    filtered value + parsed unit, hung off the turn."""
    df = linked.filter(F.col("kind") == "quantity")
    df = with_parsed_unit(df, "unit", "_pu")
    df = df.withColumn("_digits", F.regexp_replace(F.col("value"), "[^0-9.]", ""))
    b = bnode(F.col("conv_id"), F.col("turn_idx"), F.col("pos"), F.col("mention"), tag="kg-q")
    turn = _turn_uri()
    has_v = F.length("_digits") > 0
    return emit(
        df,
        t(b, RDF_VALUE, F.col("_digits"), lit=True, when=has_v),
        t(b, NS_UNIT + "units", F.concat(F.lit(NS_UNIT), F.col("_pu")), when=has_v & (F.col("_pu") != "")),
        t(turn, NS_KG + "quantity", b, when=has_v),
    )


def cooccurrence_triples(linked: DataFrame) -> DataFrame:
    """Per-turn chemical×species co-occurrence edges — the KG's payload
    (the analogue of TERA's test→chemical/species star, J8). Self-join on
    (conv_id, turn_idx); both sides pre-filtered to the two kinds so the
    join is small and skew-free."""
    ent = linked.filter(F.col("entity").isNotNull()).select(
        "conv_id", "turn_idx", "entity", "entity_kind"
    )
    chem = ent.filter(F.col("entity_kind") == "chemical").select(
        "conv_id", "turn_idx", F.col("entity").alias("chem")
    )
    spec = ent.filter(F.col("entity_kind") == "species").select(
        "conv_id", "turn_idx", F.col("entity").alias("spec")
    )
    pairs = chem.join(spec, ["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "chem", "spec"
    )
    turn = _turn_uri()
    return emit(
        pairs,
        t(F.col("chem"), NS_KG + "cooccursWith", F.col("spec")),
        t(turn, NS_KG + "evidences", bnode(F.col("chem"), F.col("spec"), tag="cooc")),
        t(bnode(F.col("chem"), F.col("spec"), tag="cooc"), NS_KG + "chemical", F.col("chem")),
        t(bnode(F.col("chem"), F.col("spec"), tag="cooc"), NS_KG + "species", F.col("spec")),
    )


def build_triples(
    transcripts: DataFrame, linked: DataFrame, deduplicate: bool = True
) -> DataFrame:
    """All stage-2 triples, deduplicated (A1). Callers that dedup AFTER the
    canonical rewrite anyway (pipeline/run.py fuses it into the stage
    write's bucket shuffle; pipeline/incremental.py dropDuplicates the
    delta) pass ``deduplicate=False`` — the pre-rewrite dedup would be a
    second full shuffle of the triple set whose only effect is shrinking
    the input of a map-side broadcast join."""
    out = (
        transcript_structure_triples(transcripts)
        .unionByName(mention_triples(linked))
        .unionByName(quantity_triples(linked))
        .unionByName(cooccurrence_triples(linked))
    )
    return dedup(out) if deduplicate else out


def emission_refcounts(linked: DataFrame) -> DataFrame:
    """Reference counts of the SHARED entity-derived emissions, keyed on
    the RAW (pre-canonicalization) emission key — the side table that
    makes decremental maintenance (pipeline/forget.py) cost ∝ the deleted
    conversations instead of ∝ the remaining references.

    Why raw keys: a shared triple's BYTES change when canonicalization
    merges components, but the raw key that emitted it is a pure per-turn
    function of (linked row) — merges never touch it, so the counts are
    maintainable with plain adds/subtracts per batch (no rewrite path).
    The byte form is recomputed on demand by joining the key's entities
    through the canonical map.

    Keys (``rk``, ``k1``, ``k2``), pinned to THIS module's emit sites —
    if a new shared emit site is added, add its key kind here AND in
    shared_row_expr:

    - ``type``:  k1 = raw entity id, k2 = resolved class URI
      (mention_triples' typing row)
    - ``label``: k1 = raw entity id, k2 = label text
      (mention_triples' label row, label_ok rows only)
    - ``cooc``:  k1 = raw chem id,  k2 = raw spec id
      (cooccurrence_triples' per-turn pair — covers all three shared rows
      the pair emits: the cooccursWith edge and the two bnode legs, whose
      bnode id hashes exactly (k1, k2))

    ``n`` is plain emission multiplicity (NOT distinct turns): the same
    function computes the base counts, each apply's adds and each
    forget's decrements, and whole conversations enter/leave together,
    so any consistent counting rule is exact — the cheapest one wins.
    """
    df = linked.filter(F.col("entity").isNotNull() & (F.col("kind") != "quantity"))
    typ = df.select(
        F.lit("type").alias("rk"),
        F.col("entity").alias("k1"),
        _kind_class_expr().alias("k2"),
    )
    lab = df.filter(_label_ok_expr()).select(
        F.lit("label").alias("rk"),
        F.col("entity").alias("k1"),
        F.col("mention").alias("k2"),
    )
    ent = df.select("conv_id", "turn_idx", "entity", "entity_kind")
    chem = ent.filter(F.col("entity_kind") == "chemical").select(
        "conv_id", "turn_idx", F.col("entity").alias("k1")
    )
    spec = ent.filter(F.col("entity_kind") == "species").select(
        "conv_id", "turn_idx", F.col("entity").alias("k2")
    )
    cooc = (
        chem.join(spec, ["conv_id", "turn_idx"])
        .select(F.lit("cooc").alias("rk"), "k1", "k2")
    )
    return (
        typ.unionByName(lab)
        .unionByName(cooc)
        .groupBy("rk", "k1", "k2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Predicates of rows that can be emitted identically by DIFFERENT
# conversations (cooccurrence_triples payload rows).
SHARED_PREDS = (NS_KG + "cooccursWith", NS_KG + "chemical", NS_KG + "species")


def shared_row_expr():
    """Triple rows that can collide with rows emitted by OTHER
    conversations — the only rows incremental maintenance must consult
    history for (pipeline/incremental.py ``ent_index``). Pinned to THIS
    module's emit sites: entity typing/labels (mention_triples — subject
    is an entity/provisional URI, shared vocabulary) and the co-occurrence
    payload (cooccurrence_triples — pair-content-hashed bnodes and
    entity-subject edges). Everything else emitted here hangs off a
    conv/turn URI or a quantity bnode whose md5 content includes
    (conv_id, turn_idx, pos) — unique to its conversation by construction.
    If a new emit site is added to this module, classify it here: shared
    if two different conversations can emit byte-identical rows."""
    conv = F.col("subject").startswith(NS_KG + "turn/") | F.col(
        "subject"
    ).startswith(NS_KG + "conv/")
    is_tl = F.col("predicate").isin(RDF_TYPE, RDFS_LABEL)
    return F.col("predicate").isin(*SHARED_PREDS) | (is_tl & ~conv)


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile of the transcript table — the first
    operational look at an agent-transcript corpus before it enters the
    KG pipeline: turn counts by role, tool usage, size, and the
    contiguity invariant the north rule's stable (conv_id, turn_idx)
    ordering depends on (``contiguous`` false = dropped/duplicated turn
    indexes — data that would silently skew per-turn provenance).

    Scale shape: exactly one groupBy(conv_id) aggregate — map-side
    partial aggregation does the heavy lifting and conv_id is the
    table's own bucket key, so on the bucketed Iceberg layout this is
    shuffle-free. No window, no join, no Python.

    Returns one row per conversation:
    (conv_id, n_turns, n_user, n_assistant, n_tool_calls, n_tools,
    total_chars, contiguous, last_role).
    """
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
        F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_calls"),
        F.count_distinct(F.col("tool")).alias("n_tools"),
        F.sum(F.length("text")).alias("total_chars"),
        ((F.max("turn_idx") - F.min("turn_idx") + 1) == F.count("*")).alias("contiguous"),
        F.max_by("role", "turn_idx").alias("last_role"),
    )
