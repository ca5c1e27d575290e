"""Vector similarity search over an embedding column.

Baseline: brute-force cosine top-k — exact, O(queries x corpus), all
JVM-side (zip_with + aggregate, no Python). Right for small query
sets or as the re-rank stage.

Scale path: random-hyperplane LSH bucketing (deterministic planes
derived from md5 of coordinate indices) cuts the corpus per query to
one bucket; brute-force re-ranks inside the bucket. That is the
IVF-style pattern a 100 TB corpus needs — the full corpus is never
crossed with the full query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_double_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """float32 arrays -> double arrays so engine math is comparable."""
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def _plane_weight(table: int, p: int, j: int) -> float:
    """Deterministic hyperplane coordinate: md5("t:p:j") first 8 hex
    chars as uint32, mapped to [-1, 1). Identical formula to the
    DuckDB oracle's ('0x' || substring(md5(...), 1, 8))::BIGINT."""
    import hashlib

    h = hashlib.md5(f"{table}:{p}:{j}".encode()).hexdigest()[:8]
    return int(h, 16) / 2147483648.0 - 1.0


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first row (driver-side, one
    tiny job; the result is baked into the plan as literals)."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if row is None or row["n"] is None:
        return 0
    return int(row["n"])


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    queries is expected small (broadcast); the corpus side streams —
    one pass, no shuffle besides the final per-query top-k."""
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    pairs = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "corpus_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def hyperplane_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    table: int = 0,
) -> DataFrame:
    """Deterministic random-hyperplane LSH: plane p's j-th coordinate
    is derived from md5(table:p:j) mapped to [-1, 1). The bucket is
    the sign-bit string across planes. Same formula is expressible in
    the DuckDB oracle, so bucketing is engine-portable. ``table``
    seeds independent hash tables (multi-probe recall)."""
    d = with_double_vec(df, vec_col)

    # Plane weights are DETERMINISTIC, so hash them once driver-side
    # (hashlib md5 == engine md5 bit-for-bit) and ship literal arrays:
    # the per-row work drops from num_planes x dim interpreted md5
    # evaluations to a plain dot product. Weights cover the observed
    # dim; vectors longer than the literal simply ignore the tail
    # (zip_with pads with null -> excluded), shorter vectors pad too.
    dim = _infer_dim(df, vec_col)
    bits = []
    for p in range(num_planes):
        w = F.array(*[F.lit(_plane_weight(table, p, j)) for j in range(dim)])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), w, lambda x, wj: x * wj),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return d.withColumn("bucket", F.concat(*bits))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 2,
    cosine_threshold: float = 0.35,
    round_digits: int | None = 9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Candidates = pairs sharing a bucket in ANY of ``num_tables``
    independent hyperplane tables; each candidate is scored with the
    exact cosine and kept at >= threshold. The full O(n^2) cross
    product never materializes — cost is per-bucket, the property a
    100 TB corpus needs. More tables/fewer planes => higher recall.
    Thresholding happens on the ROUNDED cosine so the cut is
    engine-stable."""
    buckets = None
    for t in range(num_tables):
        bt = hyperplane_buckets(df, id_col, vec_col, num_planes, table=t).select(
            F.col(id_col), F.lit(t).alias("tbl"), "bucket"
        )
        buckets = bt if buckets is None else buckets.unionByName(bt)
    a = buckets.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = with_double_vec(df, vec_col).select(F.col(id_col), F.col(vec_col).alias("_v"))
    scored = (
        cand.join(v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va")), on="id_a")
        .join(v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb")), on="id_b")
        .select(
            "id_a",
            "id_b",
            (
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            ).alias("cosine"),
        )
    )
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    return scored.filter(F.col("cosine") >= cosine_threshold)


def _centroid(cid: int, w: list[float]) -> tuple[int, list[float], float]:
    """(id, vector, norm); the norm is a sequential sum so it matches
    the engines' list_dot_product order bit-for-bit."""
    import math

    sq = 0.0
    for x in w:
        sq += x * x
    return (cid, w, math.sqrt(sq))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    round_digits: int = 9,
    lloyd_iters: int = 0,
    mean_round: int = 6,
) -> DataFrame:
    """IVF-style ANN: partition the corpus into ``num_centroids``
    Voronoi cells, probe the ``nprobe`` nearest cells per query, exact
    cosine re-rank inside the probed cells.

    Centroids are the ``num_centroids`` lowest-id corpus vectors —
    deterministic seed centroids (a Lloyd refinement would slot in
    without changing the plan shape). They are collected driver-side
    (tiny: C x dim doubles) and shipped as literal arrays, so cell
    assignment and probing are pure per-row projections: NO join and
    NO shuffle for the partitioning step — the property that matters
    at 100 TB. The only shuffles left are the candidate join (probe
    side is queries x nprobe rows -> broadcast) and the final
    per-query top-k window.

    ``lloyd_iters`` > 0 refines the seed centroids with k-means
    (Lloyd) iterations: assign every corpus vector to its cell, take
    the per-dimension MEAN of each cell (one groupBy with dim avg
    aggregates — partial-agg friendly), collect the C tiny centroids
    back and re-assign. Means are rounded to 6 decimals before use so
    both engines train bit-identical centroids despite differing
    summation order.

    All ranking happens on the cosine ROUNDED to ``round_digits`` with
    deterministic tie-breaks (min centroid id / min corpus id), so an
    engine-portable oracle can reproduce cell assignment bit-for-bit.
    """
    cent_rows = (
        with_double_vec(corpus, vec_col)
        .select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(num_centroids)
        .collect()
    )
    cents = [
        _centroid(int(row[id_col]), [float(x) for x in row[vec_col]])
        for row in cent_rows
    ]

    def cell_structs(vec, norm_v):
        """array<struct<c: rounded cosine, nc: -cent_id, cent>> — max
        of the struct order = best cell with min-id tie-break."""
        cells = []
        for cid, w, wnorm in cents:
            wa = F.array(*[F.lit(x) for x in w])
            cos = F.round(
                _dot(vec, wa) / (norm_v * F.lit(wnorm)), round_digits
            )
            cells.append(
                F.struct(
                    cos.alias("c"),
                    F.lit(-cid).alias("nc"),
                    F.lit(cid).alias("cent"),
                )
            )
        return F.array(*cells)

    base = (
        with_double_vec(corpus, vec_col)
        .select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv"))
        .withColumn("_n", _norm(F.col("_cv")))
    )

    dim = len(cents[0][1]) if cents else 0
    for _ in range(lloyd_iters):
        assigned = base.withColumn(
            "cell",
            F.array_max(cell_structs(F.col("_cv"), F.col("_n"))).getField("cent"),
        )
        rows = assigned.groupBy("cell").agg(
            *[
                F.round(F.avg(F.element_at(F.col("_cv"), j + 1)), mean_round).alias(
                    f"m{j}"
                )
                for j in range(dim)
            ]
        ).collect()
        # cells that captured no vectors simply drop out (both engines
        # derive the survivor set from the same assignment)
        cents = sorted(
            (
                _centroid(int(r["cell"]), [float(r[f"m{j}"]) for j in range(dim)])
                for r in rows
            ),
            key=lambda t: t[0],
        )

    c = base.withColumn(
        "cell",
        F.array_max(cell_structs(F.col("_cv"), F.col("_n"))).getField("cent"),
    ).select("corpus_id", "_cv", "cell")
    q = (
        with_double_vec(queries, vec_col)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
        .withColumn("_n", _norm(F.col("_qv")))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.reverse(
                            F.array_sort(cell_structs(F.col("_qv"), F.col("_n")))
                        ),
                        1,
                        nprobe,
                    ),
                    lambda s: s.getField("cent"),
                )
            ),
        )
        .select("query_id", "_qv", "cell")
    )
    pairs = c.join(F.broadcast(q), on="cell").filter(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "corpus_id",
        F.round(
            _dot(F.col("_qv"), F.col("_cv"))
            / (_norm(F.col("_qv")) * _norm(F.col("_cv"))),
            round_digits,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket."""
    cb = hyperplane_buckets(corpus, id_col, vec_col, num_planes).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv"), "bucket"
    )
    qb = hyperplane_buckets(queries, id_col, vec_col, num_planes).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "bucket"
    )
    pairs = cb.join(F.broadcast(qb), on="bucket").filter(
        F.col("corpus_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        "corpus_id",
        (_dot(F.col("_qv"), F.col("_cv")) / (_norm(F.col("_qv")) * _norm(F.col("_cv")))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
