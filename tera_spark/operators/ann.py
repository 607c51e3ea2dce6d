"""Approximate nearest neighbor over an embedding column (array<float>).

- ``cosine_topk``   : brute-force top-k (correctness baseline). Queries are
  broadcast (k-NN probes are small); the corpus side streams — no shuffle
  of the big side, one TopK-per-query aggregation.
- ``lsh_topk``      : the scale path — random-hyperplane LSH buckets both
  sides; only bucket-colliding candidates are scored. Hyperplanes are
  *deterministic* (hash-derived pseudo-randoms), so results reproduce
  across runs/engines.

Dot products use ``zip_with`` + ``aggregate`` — whole-stage-codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. Deterministic
    tie-break on corpus id. (A norm-per-row precompute was A/B'd here in
    round 6 and reverted: with a handful of probe queries the saving is
    negligible and the extra projection measured slightly slower; the
    per-row trick lives in the PAIR generators, where it pays.)"""
    c = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(q_id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cos", cosine(F.col("_cv"), F.col("_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component from a hash mix
    (no RNG state; same plane every run)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}|{d}".encode()).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
    return out


def _dbl_array_expr(values: list[float]) -> Column:
    """A literal array<double> built as ONE SQL expr string parsed
    JVM-side — per-element F.lit() trees cost ~0.5ms of py4j round-trip
    each, which at planes×dim (or k×dim) literals dominates expression
    construction (measured round 6). repr(float) round-trips IEEE doubles
    exactly."""
    return F.expr("array(" + ",".join(repr(float(x)) + "D" for x in values) + ")")


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-string bucket id: sign of <v, plane_i> per plane."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vec, _dbl_array_expr(p), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def _seed_hash(col: Column, portable: bool) -> Column:
    """Seed-ordering hash. Default: xxhash64 (fastest JVM path). Portable:
    the md5-prefix bigint that DuckDB reproduces exactly
    (``('0x'||substr(md5(x),1,15))::BIGINT``) — lets the oracle replay the
    k-means seeding, hence the whole IVF path (round-2 verdict #2)."""
    if portable:
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return F.xxhash64(col)


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def centroid_dist_pairs(vec: Column, cent_rows: list) -> Column:
    """array<struct<d,cid>> of (squared distance, centroid id) for every
    centroid, as a pure map-side expression: the (tiny, bounded — k rows
    of k×dim doubles) centroid table is inlined as a literal, distances
    computed per row with the same zip_with/aggregate expression Lloyd's
    loop uses. Lexicographic struct ordering on (d, cid) IS the
    (distance asc, centroid_id asc) tie-break, so array_min /
    array_sort+slice over this replaces the k-way row-multiplying
    broadcast join + per-id window (a full shuffle + sort of corpus×k
    rows) that previously implemented assignment."""
    # The literals are built as ONE SQL expr string parsed JVM-side, not
    # k×dim F.lit() calls: the element-wise Column tree (and F.lit(list),
    # which recurses into per-element lits) cost 0.5-0.7s of pure driver/
    # py4j time PER CALL at k=16, dim=64 (measured round 6) — more than
    # the assignment job itself. repr(float) round-trips IEEE doubles
    # exactly through the SQL parser. The 2-arg transform lambda receives
    # (element, index); element_at is 1-based.
    cids = F.expr(
        "array(" + ",".join(str(int(r["centroid_id"])) for r in cent_rows) + ")"
    ).cast("array<int>")
    carr = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in r["c"]) + ")"
            for r in cent_rows
        )
        + ")"
    )
    return F.transform(
        cids,
        lambda cid, i: F.struct(
            _sq_dist(vec, F.element_at(carr, i + F.lit(1))).alias("d"),
            cid.alias("cid"),
        ),
    )


def centroid_argmin(vec: Column, cent_rows: list) -> Column:
    """Nearest-centroid id (see centroid_dist_pairs)."""
    return F.array_min(centroid_dist_pairs(vec, cent_rows))["cid"]


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Deterministic Lloyd's k-means as DataFrame ops: seeds are the k
    hash-smallest vectors (reproducible, no RNG). Returns
    (centroid_id int, centroid array<double>) as a lineage-free local
    relation.

    Each Lloyd round is ONE Spark job (a k-group mean with map-side
    partial aggregation); assignment is the map-side literal argmin of
    :func:`centroid_argmin`, so no round ever shuffles corpus×k rows (the
    previous implementation's broadcast-join + per-id window did, per
    round). The k×dim centroid table round-trips through the driver each
    round — a bounded (k·dim doubles, ~8 KB at 16×64) collect, exactly the
    scale the repo's bounded-collect rule covers; lit(float) preserves the
    IEEE doubles bit-for-bit, so distances and means are unchanged.
    ``dim`` is read ONCE before the loop (or passed by the caller).
    """
    v = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if dim is None:
        first = v.select("v").first()
        if first is None:
            raise ValueError("kmeans_centroids: empty corpus (and no dim given)")
        dim = len(first["v"])
    # TakeOrdered returns rows already sorted by _h; enumerate = row_number.
    seed = (
        v.withColumn("_h", _seed_hash(F.col("id").cast("string"), portable))
        .orderBy("_h")
        .limit(k)
        .select("v")
        .collect()
    )
    rows = [{"centroid_id": i + 1, "c": list(r["v"])} for i, r in enumerate(seed)]
    # one expr string, not dim separate F.avg(F.col()[i]) py4j calls (the
    # same driver-overhead trap as the centroid literal — see
    # centroid_argmin)
    avg_arr = F.expr(
        "array(" + ",".join(f"avg(v[{i}])" for i in range(dim)) + ")"
    ).alias("c")
    for _ in range(iterations):
        if not rows:  # empty corpus with dim given: no centroids
            break
        cid = centroid_argmin(F.col("v"), rows)
        new = (
            v.select("v", cid.alias("centroid_id"))
            .groupBy("centroid_id")
            .agg(avg_arr)
            .collect()
        )
        # deterministic literal order (and empty clusters drop, as before)
        rows = sorted(
            ({"centroid_id": r["centroid_id"], "c": list(r["c"])} for r in new),
            key=lambda r: r["centroid_id"],
        )
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("centroid_id", T.IntegerType(), False),
            T.StructField("centroid", T.ArrayType(T.DoubleType()), False),
        ]
    )
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(int(r["centroid_id"]), [float(x) for x in r["c"]]) for r in rows], schema
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    dim: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_centroids``
    inverted lists (deterministic k-means), probe the ``n_probe`` nearest
    lists per query, exact-rerank only those lists. Cost per query drops
    from |corpus| to ~|corpus|·n_probe/n_centroids; the centroid table is
    broadcast everywhere. Pass ``dim`` when known to skip the probing
    first() job; ``portable`` switches the k-means seed hash to the
    DuckDB-replayable md5 form."""
    # kmeans_centroids returns a lineage-free local relation; assignment is
    # the map-side literal top-n of centroid_dist_pairs — array_sort over
    # (d, cid) structs is exactly the old window's (d asc, cid asc) order,
    # slice(1, n) its rn<=n cut — so neither side shuffles corpus×k rows.
    cents = kmeans_centroids(
        corpus, k=n_centroids, id_col=id_col, vec_col=vec_col, dim=dim,
        portable=portable,
    )
    cent_rows = [
        {"centroid_id": r["centroid_id"], "c": r["centroid"]} for r in cents.collect()
    ]

    def assign(df, idc, vc, out, n):
        src = df.select(F.col(idc).alias(out), F.col(vc).alias(f"_{out}_v"))
        if not cent_rows:  # empty corpus (dim given): no lists, no rows
            return src.withColumn(
                "centroid_id", F.lit(None).cast("int")
            ).filter(F.col("centroid_id").isNotNull())
        topn = F.slice(
            F.array_sort(centroid_dist_pairs(F.col(f"_{out}_v"), cent_rows)), 1, n
        )
        return src.select(
            out, f"_{out}_v", F.explode(topn).alias("_p")
        ).select(out, f"_{out}_v", F.col("_p.cid").alias("centroid_id"))

    lists = assign(corpus, id_col, vec_col, "nn_id", 1)
    probes = assign(queries, q_id_col, vec_col, "query_id", n_probe)
    cands = lists.join(probes, "centroid_id").dropDuplicates(["nn_id", "query_id"])
    scored = cands.withColumn("cos", cosine(F.col("_nn_id_v"), F.col("_query_id_v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane tables of
    ``n_planes`` bits; candidates = bucket collisions in any table; exact
    cosine re-rank of candidates. Recall grows with tables; cost is
    |collisions|, not |corpus|×|queries|."""
    tables = [
        [_hyperplane(t * n_planes + p, dim) for p in range(n_planes)]
        for t in range(n_tables)
    ]

    def bucketize(df: DataFrame, idc: str, vc: str, out_id: str) -> DataFrame:
        buckets = F.array(
            *[
                F.concat(F.lit(f"t{t}:"), lsh_bucket(F.col(vc), tables[t]))
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id), F.col(vc).alias(f"_{out_id}_v"),
            F.explode(buckets).alias("bucket"),
        )

    cb = bucketize(corpus, id_col, vec_col, "nn_id")
    qb = bucketize(queries, q_id_col, vec_col, "query_id")
    cands = cb.join(qb, "bucket").dropDuplicates(["nn_id", "query_id"])
    scored = cands.withColumn("cos", cosine(F.col("_nn_id_v"), F.col("_query_id_v")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nn_id", F.round("cos", 6).alias("cos"), "rank")
    )


def mean_pool(
    emb: DataFrame, group_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Element-wise mean of the vectors in each group — the centroid /
    class-prototype builder (label prototypes for SemDeDup-style
    clustering, dataset-level embeddings, IVF seeding sanity checks).
    Requires uniform dimensionality within a group (mixed dims would
    silently skew per-position averages; the fixture and every producer
    in this repo emit fixed-width vectors).

    Components round to 6dp BEFORE assembly so double summation order
    cannot leak into the result (same portability convention as every
    float aggregate here).

    Scale shape: posexplode (rows × dim — dim is a constant), one
    (group, pos) average with map-side partial aggregation, one
    group-sized assembly aggregate. No collect, no window over data
    scale; per-group state in the assembly is one array of length dim.

    Returns (group_col, n_vectors, centroid array<double>).
    """
    ex = emb.where(F.col(vec_col).isNotNull()).select(
        group_col, F.posexplode(vec_col).alias("pos", "val")
    )
    per = ex.groupBy(group_col, "pos").agg(
        F.round(F.avg("val"), 6).alias("m"), F.count("*").alias("c")
    )
    return per.groupBy(group_col).agg(
        F.max("c").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("centroid"),
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector affine int8 quantization — the 4× storage/bandwidth
    step an ANN serving tier applies before indexing (float32 corpus →
    uint8 codes + per-vector (scale, zero_point)). Deterministic double
    math, so codes are engine-portable and oracle-replayable.

    q_i = floor((v_i − lo)/scale + 0.5) with scale = (hi − lo)/255 over
    the vector's own [lo, hi] range; constant vectors (hi == lo) encode
    as all-zero codes with scale 0. Returns (id, scale, zero_point,
    q array<int>, max_err) where ``max_err`` is the max absolute
    dequantization error — the quality metric that decides whether a
    corpus tolerates int8 recall-wise (bounded by scale/2 by
    construction; the column PROVES it per row).

    Scale shape: a pure projection — array_min/array_max/transform are
    JVM-side whole-stage-codegen expressions; no shuffle, no UDF, no
    driver state. Composes with :func:`cosine_topk`/IVF as a re-rank
    source (dequantize = q·scale + zero_point, also a projection).
    """
    v = F.col(vec_col)
    lo = F.array_min(v).cast("double")
    hi = F.array_max(v).cast("double")
    s = (hi - lo) / F.lit(255.0)
    q = F.when(
        s == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            v, lambda x: F.floor((x.cast("double") - lo) / s + F.lit(0.5)).cast("int")
        )
    )
    err = F.when(s == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                v,
                lambda x: F.abs(
                    F.floor((x.cast("double") - lo) / s + F.lit(0.5)) * s
                    + lo
                    - x.cast("double")
                ),
            )
        )
    )
    return embeddings.select(
        F.col(id_col),
        F.round(s, 6).alias("scale"),
        F.round(lo, 6).alias("zero_point"),
        q.alias("q"),
        F.round(err, 6).alias("max_err"),
    )
