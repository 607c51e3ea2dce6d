"""API facade mirroring the reference's ``DataAccess`` classes
(/root/reference/tera/DataAccess.py) over a triples DataFrame.

Where the reference takes a single URI (lifted to collections by
``do_recursively_in_class``, utils.py:361-381), these methods take either a
single id or a DataFrame of ids — the collection case is a join, not a
loop, so "vectorization" is the default rather than a decorator
(SURVEY.md §2.9).

Reference bugs fixed by intent (SURVEY.md §8): ``get_division``/
``get_ssd``/``get_rank`` call the nonexistent ``query_subclassof`` — the
intended Q2 children-query is used; ``query_siblings`` returns the fixed
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tera_spark.constants import NS_ECOTOX, NS_NCBI, RDFS_LABEL
from tera_spark.operators import query_api as Q
from tera_spark.operators.align import convert, convert_via_base


def label_dictionary(graph: DataFrame) -> DataFrame:
    """A4 / ``ut.graph_to_dict`` (utils.py:384-402): entity → literal
    labels, kept relational (exploded) instead of collect_list."""
    return (
        graph.filter(F.col("obj_is_literal"))
        .select(F.col("subject").alias("entity"), F.col("object").alias("label"))
        .distinct()
    )


class GraphAPI:
    """Base ``API`` (DataAccess.py:20-308): query ops + id conversion."""

    def __init__(
        self,
        graph: DataFrame,
        namespace: str,
        mappings: dict[str, DataFrame] | None = None,
        base_identifier: str | None = None,
    ):
        self.graph = graph
        self.namespace = namespace
        self.mappings = mappings or {}
        self.base_identifier = base_identifier

    def _seeds(self, ids) -> DataFrame:
        spark = self.graph.sparkSession
        if isinstance(ids, DataFrame):
            return ids
        if isinstance(ids, str):
            ids = [ids]
        return spark.createDataFrame([(i,) for i in ids], "s string")

    # Q1-Q7
    def query_type(self, t: str) -> DataFrame:
        return Q.query_type(self.graph, t)

    def query_child(self, t: str) -> DataFrame:
        return Q.query_child(self.graph, t)

    def query_parent(self, t: str) -> DataFrame:
        return Q.query_parent(self.graph, t)

    def query_label(self, label: str) -> DataFrame:
        return Q.query_label(self.graph, label)

    def query_siblings(self, t: str, depth: int = 1) -> DataFrame:
        return Q.query_siblings(self.graph, t, depth)

    def query_alt_labels(self, t: str) -> DataFrame:
        return Q.query_alt_labels(self.graph, t)

    def construct_subgraph(self, ids) -> DataFrame:
        return Q.construct_subgraph(self.graph, self._seeds(ids))

    # convert_id (DataAccess.py:262-308): f → base → t via mapping tables
    def convert_id(self, ids, f: str, t: str) -> DataFrame:
        ids_df = self._seeds(ids).withColumnRenamed("s", "id")
        if f == t:
            return ids_df.withColumn("converted", F.col("id"))
        if f == self.base_identifier and t in self.mappings:
            return convert(ids_df, self.mappings[t])
        if f in self.mappings and t == self.base_identifier:
            return convert(ids_df, self.mappings[f], reverse=True)
        if f in self.mappings and t in self.mappings:
            return convert_via_base(ids_df, self.mappings[f], self.mappings[t])
        raise NotImplementedError(f"from {f} to {t} is not supported")

    def available_conversions(self) -> set[str]:
        out = set(self.mappings)
        if self.base_identifier:
            out.add(self.base_identifier)
        return out


class TaxonomyAPI(GraphAPI):
    """DataAccess.py:357-460 over an NCBI taxonomy graph."""

    def __init__(self, graph: DataFrame, namespace: str = NS_NCBI, **kw):
        super().__init__(graph, namespace, **kw)

    def get_taxa(self) -> DataFrame:
        return self.query_type(self.namespace + "Taxon")

    def get_ranks(self) -> DataFrame:
        return self.query_type(self.namespace + "Rank")

    def get_division(self, division_uri: str) -> DataFrame:
        return self.query_child(division_uri)

    get_ssd = get_division
    get_rank = get_division


def pack_fingerprint_hex(col) -> Column:
    """Hex fingerprint string → array<bigint>, 15 hex chars (60 bits) per
    element — avoids signed-long overflow and stays engine-portable
    (Spark ``conv(chunk,16,10)`` ≡ DuckDB ``('0x'||chunk)::BIGINT``)."""
    n_chunks = F.ceil(F.length(col) / 15).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.conv(col.substr(i * 15 + 1, F.lit(15)), 16, 10).cast("long"),
    )


def tanimoto_expr(a, b) -> Column:
    """Bitwise Tanimoto over packed-bigint fingerprint arrays: |a∧b| /
    (|a|+|b|-|a∧b|) via bit_count — the F5 scalar (functions/similarity.py)
    as a pure JVM column expression (SURVEY.md §2.7 plan)."""
    popcnt = lambda arr: F.aggregate(
        F.transform(arr, lambda x: F.bit_count(x)), F.lit(0), lambda acc, x: acc + x
    )
    inter = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    denom = popcnt(a) + popcnt(b) - inter
    return F.when(denom > 0, inter.cast("double") / denom.cast("double")).otherwise(
        F.lit(0.0)
    )


class ChemicalAPI(GraphAPI):
    """DataAccess.py:476-660 (+ EcotoxChemicalAPI :801-833). The PubChem
    REST calls (Compound.from_cid) are stood in by static tables — same
    shapes, same methods, no network (SURVEY.md §2.1 S19)."""

    def compounds(self) -> DataFrame:
        return Q.compounds(self.graph, self.namespace)

    def query_chemicals(self) -> DataFrame:
        return self.query_type(self.namespace + "Chemical")

    def query_chemical_names(self, t: str) -> DataFrame:
        return self.query_alt_labels(t)

    def get_fingerprint(self, features: DataFrame, ids) -> DataFrame:
        """S19 stand-in: fingerprints come from a static features table
        (id, fingerprint_hex) instead of the PubChem REST API
        (DataAccess.py:484-497). Returns packed bigint fingerprints."""
        ids_df = self._seeds(ids).withColumnRenamed("s", "id")
        return ids_df.join(features, "id", "left").withColumn(
            "fingerprint", F.conv(F.col("fingerprint_hex"), 16, 2)
        )

    def get_names(self, synonyms: DataFrame, ids) -> DataFrame:
        """``get_names`` (DataAccess.py:500-528): chemical synonyms. The
        PubChem synonym call is stood in by a static (id, synonym) table;
        the collection case is a join, not the reference's per-id loop."""
        ids_df = self._seeds(ids).withColumnRenamed("s", "id")
        return ids_df.join(synonyms, "id", "left").select("id", "synonym")

    def class_hierarchy(self, ids) -> DataFrame:
        """``class_hierarchy`` (DataAccess.py:530-554): the reference takes
        the cid and mesh forms of each id and unions their subgraphs
        (``construct_subgraph(a) | construct_subgraph(b)``). Here: convert
        through the mapping tables where available, seed the BFS subgraph
        with both converted forms."""
        ids_df = self._seeds(ids).withColumnRenamed("s", "id")
        seeds = None
        for ident in ("cid", "mesh"):
            if ident in self.mappings:
                s = (
                    self.convert_id(ids_df, self.base_identifier or "id", ident)
                    .select(F.col("converted").alias("s"))
                    .na.drop()
                )
                seeds = s if seeds is None else seeds.unionByName(s)
        if seeds is None:
            seeds = ids_df.select(F.col("id").alias("s"))
        return Q.construct_subgraph(self.graph, seeds.distinct())

    def get_features(
        self, features: DataFrame, ids, params: list[str] | None = None
    ) -> DataFrame:
        """``get_features`` (DataAccess.py:556-597): chemical properties
        from a static long-format (id, feature, value) table; ``params``
        filters like the reference's property list."""
        ids_df = self._seeds(ids).withColumnRenamed("s", "id")
        out = ids_df.join(features, "id", "inner").select("id", "feature", "value")
        if params:
            out = out.filter(F.col("feature").isin(list(params)))
        return out

    def which_features(self, features: DataFrame) -> DataFrame:
        """``which_features`` (DataAccess.py:599-615): available property
        names — distinct features of the static table (the reference lists
        pubchempy Compound properties)."""
        return features.select("feature").distinct()

    def similarity(self, fingerprints: DataFrame, id_: str, ids=None) -> DataFrame:
        """``simiarity`` [sic] (DataAccess.py:616-640): Tanimoto of one
        chemical against a set. ``fingerprints``: (id, fingerprint
        array<bigint>) — see ``pack_fingerprint_hex``. One broadcast row +
        JVM bit_count arithmetic; never a Python loop."""
        fps = fingerprints.select(F.col("id"), F.col("fingerprint").alias("_fp"))
        one = fps.filter(F.col("id") == id_).select(F.col("_fp").alias("_fp_ref"))
        others = (
            fps
            if ids is None
            else fps.join(
                self._seeds(ids).withColumnRenamed("s", "id"), "id", "left_semi"
            )
        )
        others = others.filter(F.col("id") != id_)
        return others.join(F.broadcast(one)).select(
            "id",
            F.round(tanimoto_expr(F.col("_fp"), F.col("_fp_ref")), 6).alias("tanimoto"),
        )


class TraitsAPI(GraphAPI):
    """DataAccess.py:662-799: fixed-predicate lookups (Q11), batched —
    input ids as a DataFrame column ``s``."""

    _PREDS = {
        "conservation_status": "http://rs.tdwg.org/ontology/voc/SPMInfoItems#ConservationStatus",
        "extinct_status": "http://eol.org/schema/terms/ExtinctionStatus",
        "endemic_to": "http://eol.org/terms/endemic",
        "ecoregion": "https://www.wikidata.org/entity/Q295469",
        "habitat": "http://rs.tdwg.org/dwc/terms/habitat",
    }

    def _lookup(self, ids, pred: str) -> DataFrame:
        seeds = self._seeds(ids)
        return (
            self.graph.filter(F.col("predicate") == pred)
            .join(seeds, F.col("subject") == F.col("s"), "inner")
            .select(F.col("subject").alias("s"), F.col("object").alias("o"))
            .distinct()
        )

    def get_conservation_status(self, ids) -> DataFrame:
        return self._lookup(ids, self._PREDS["conservation_status"])

    def get_extinct_status(self, ids) -> DataFrame:
        return self._lookup(ids, self._PREDS["extinct_status"])

    def get_endemic_to(self, ids) -> DataFrame:
        return self._lookup(ids, self._PREDS["endemic_to"])

    def get_ecoregion(self, ids) -> DataFrame:
        return self._lookup(ids, self._PREDS["ecoregion"])

    def get_habitat(self, ids) -> DataFrame:
        return self._lookup(ids, self._PREDS["habitat"])


class EffectsAPI(GraphAPI):
    """DataAccess.py:863-1023 over an Effects graph."""

    def __init__(self, graph: DataFrame, namespace: str = NS_ECOTOX, **kw):
        super().__init__(graph, namespace, **kw)

    def get_chemicals(self) -> DataFrame:
        return Q.get_chemicals(self.graph, self.namespace)

    def get_species(self) -> DataFrame:
        return Q.get_species(self.graph, self.namespace)

    def get_chemicals_from_species(self, species) -> DataFrame:
        return Q.get_chemicals_from_species(self.graph, self.namespace, self._seeds(species))

    def get_species_from_chemicals(self, chemicals) -> DataFrame:
        ns = self.namespace
        tests = Q.query_type(self.graph, ns + "Test").withColumnRenamed("s", "test")
        ch = self.graph.filter(F.col("predicate") == ns + "chemical").select(
            F.col("subject").alias("test"), F.col("object").alias("s")
        )
        sp = self.graph.filter(F.col("predicate") == ns + "species").select(
            F.col("subject").alias("test"), F.col("object").alias("c")
        )
        return (
            ch.join(self._seeds(chemicals), "s", "left_semi")
            .join(tests, "test", "left_semi")
            .join(sp, "test", "inner")
            .select("c")
            .distinct()
        )

    def get_endpoint(self, pairs: DataFrame | None = None) -> DataFrame:
        return Q.get_endpoint(self.graph, self.namespace, pairs=pairs)
