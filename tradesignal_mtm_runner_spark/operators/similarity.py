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
from pyspark.sql import types as T


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


# The one shared fan-out helper (ADVICE r16: this module's local copy
# had drifted — it lacked the isStreaming guard dedup._fan_out grew,
# so ``df.rdd`` on an unbounded frame would raise here). The vector
# paths keep the uncapped full fan-out: their per-row work
# (interpreted zip_with/aggregate lambdas) is heavy at any row count.
from .dedup import _fan_out  # noqa: E402,F401


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
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    queries is expected small (broadcast); the corpus side streams —
    one pass, no shuffle besides the final per-query top-k.

    ``round_digits``: when set, the score is rounded BEFORE the rank
    window, so rank assignment is engine-stable (ties broken on
    corpus_id after rounding — the recipe every oracle-checked caller
    needs; without it callers had to over-fetch with an inflated k
    and re-rank on the rounded score themselves)."""
    c = with_double_vec(_fan_out(corpus), vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
    )
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    pairs = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
    score = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = pairs.select("query_id", "corpus_id", score.alias("cosine"))
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
    d = with_double_vec(_fan_out(df), vec_col)

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
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Candidates = pairs sharing a bucket in ANY of ``num_tables``
    independent hyperplane tables; each candidate is scored with the
    exact cosine and kept at >= threshold. The full O(n^2) cross
    product never materializes — cost is per-bucket, the property a
    100 TB corpus needs. More tables/fewer planes => higher recall.
    Thresholding happens on the ROUNDED cosine so the cut is
    engine-stable.

    ``max_bucket`` guards the worst case at scale: a bucket of B rows
    yields B^2 candidates, so one degenerate bucket (near-constant
    embeddings, zero vectors) can dwarf the rest of the job. Buckets
    larger than the cap are dropped from candidate generation in that
    table — same semantics as the MinHash path
    (operators/dedup.py:lsh_candidate_pairs); size num_planes so real
    dup clusters stay under the cap."""
    buckets = None
    for t in range(num_tables):
        bt = hyperplane_buckets(df, id_col, vec_col, num_planes, table=t).select(
            F.col(id_col), F.lit(t).alias("tbl"), "bucket"
        )
        buckets = bt if buckets is None else buckets.unionByName(bt)
    if max_bucket is not None:
        sizes = buckets.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        buckets = buckets.join(
            sizes.filter(F.col("_n") <= max_bucket), on=["tbl", "bucket"]
        ).drop("_n")
    a = buckets.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    cand = (
        a.join(b, on=["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # the exact re-rank is CPU-bound per candidate (interpreted array
    # lambdas), which AQE's byte-based advisory coalesces onto too few
    # tasks — an explicit-count repartition of the (tiny, id-only)
    # candidate list is exempt from coalescing and keeps the scoring
    # stage wide; the vector lookups ride as broadcast joins when the
    # corpus is small enough, preserving that partitioning
    n_part = df.sparkSession.sparkContext.defaultParallelism
    cand = cand.repartition(n_part, "id_a")
    # norms once per VECTOR (not per pair — a vector appears in many
    # candidates); same sequential fold as the oracle, so the cosine
    # stays bit-identical
    v = (
        with_double_vec(df, vec_col)
        .select(F.col(id_col), F.col(vec_col).alias("_v"))
        .withColumn("_n", _norm(F.col("_v")))
    )
    scored = (
        cand.join(
            v.select(
                F.col(id_col).alias("id_a"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            on="id_a",
        )
        .join(
            v.select(
                F.col(id_col).alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_n").alias("_nb"),
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
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


def _round_half_like_sql(x, digits: int):
    """Round an ndarray to ``digits`` decimals the way the SQL engines
    do (scale, round to nearest integer, unscale). Exact .5 scaled
    fractions round half-to-even here vs half-up in SQL — unreachable
    from real dot products, and every comparison that follows breaks
    such ties deterministically anyway."""
    import numpy as np

    scale = 10.0**digits
    return np.rint(x * scale) / scale


def _assign_cells(
    df: DataFrame,
    cents: list[tuple[int, list[float], float]],
    id_col: str,
    vec_col: str,
    round_digits: int,
    nprobe: int = 1,
) -> DataFrame:
    """Voronoi-cell assignment as ONE vectorized Arrow pass — the
    scale-safe replacement for unrolling C x dim centroid literals
    into the plan (plan/codegen size blows up at realistic IVF sizes,
    C~4k-65k, dim~768). Centroids travel in the task closure
    (C x dim float64, ~25 MB even at 4k x 768), cell choice is a
    numpy loop ACROSS centroids but vectorized across rows, and the
    dot-product accumulation runs in coordinate order so the rounded
    cosine is bit-identical to the engines' sequential
    aggregate/list_dot_product fold. No join, no shuffle.

    nprobe=1 emits (id, vec, cell): the best cell, rounded-cosine
    argmax with min-centroid-id tie-break. nprobe>1 emits one row per
    probed cell, nearest first (the query-side fan-out).
    """
    import numpy as np
    import pandas as pd

    cent_ids = [cid for cid, _, _ in cents]
    cent_w = [np.asarray(w, dtype=np.float64) for _, w, _ in cents]
    cent_norm = [n for _, _, n in cents]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
            T.StructField("cell_cos", T.DoubleType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy())  # rows x dim, float64
            n = E.shape[0]
            # sequential-in-j folds (bit-identical to the SQL engines)
            norm_sq = np.zeros(n)
            for j in range(E.shape[1]):
                norm_sq += E[:, j] * E[:, j]
            norm_v = np.sqrt(norm_sq)
            cos = np.empty((n, len(cents)))
            for ci, w in enumerate(cent_w):
                acc = np.zeros(n)
                for j in range(min(E.shape[1], len(w))):
                    acc += E[:, j] * w[j]
                cos[:, ci] = acc / (norm_v * cent_norm[ci])
            cos = _round_half_like_sql(cos, round_digits)
            if nprobe == 1:
                # argmax returns the FIRST max — centroids are sorted
                # by id ascending, so ties pick the min centroid id
                best = np.argmax(cos, axis=1)
                cell = np.asarray(cent_ids)[best]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        vec_col: list(E),
                        "cell": cell.astype(np.int32),
                        "cell_cos": cos[np.arange(n), best],
                    }
                )
            else:
                order = np.argsort(-cos, axis=1, kind="stable")[:, :nprobe]
                ids = pdf[id_col].to_numpy().repeat(nprobe)
                cells = np.asarray(cent_ids)[order].reshape(-1)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        vec_col: [v for v in E for _ in range(nprobe)],
                        "cell": cells.astype(np.int32),
                        "cell_cos": np.take_along_axis(cos, order, axis=1).reshape(-1),
                    }
                )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).mapInPandas(fn, schema=out_schema)


def lloyd_train(
    base: DataFrame,
    cents: list[tuple[int, list[float], float]],
    iters: int,
    round_digits: int = 9,
    mean_round: int = 6,
    id_col: str = "corpus_id",
    vec_col: str = "_cv",
) -> tuple[list[tuple[int, list[float], float]], list[float]]:
    """k-means (Lloyd) refinement of IVF centroids, distributed:
    assign every vector to its cell (one Arrow pass, no shuffle),
    take the per-cell per-dimension MEAN (one partial-agg-friendly
    groupBy of C tiny rows), collect the C centroids back, repeat.
    Means are rounded to ``mean_round`` decimals before use so both
    engines train bit-identical centroids despite differing summation
    order.

    Under cosine similarity the centroid's scale is irrelevant, so
    the mean update is exactly spherical k-means — total assigned
    cosine is non-decreasing across iterations. Returns the trained
    centroids and the inertia history: ``inertia[i] = sum(1 -
    best_cos)`` measured at the assignment of iteration i
    (monotonically non-increasing, pinned by
    tests/test_scale_patterns.py)."""
    dim = len(cents[0][1]) if cents else 0
    inertia: list[float] = []
    for _ in range(iters):
        assigned = _assign_cells(base, cents, id_col, vec_col, round_digits)
        rows = assigned.groupBy("cell").agg(
            *[
                F.round(F.avg(F.element_at(F.col(vec_col), j + 1)), mean_round).alias(
                    f"m{j}"
                )
                for j in range(dim)
            ],
            F.sum(F.lit(1.0) - F.col("cell_cos")).alias("_inertia"),
        ).collect()
        inertia.append(float(sum(r["_inertia"] for r in rows)))
        # cells that captured no vectors simply drop out (both engines
        # derive the survivor set from the same assignment)
        cents = sorted(
            (
                _centroid(int(r["cell"]), [float(r[f"m{j}"]) for j in range(dim)])
                for r in rows
            ),
            key=lambda t: t[0],
        )
    return cents, inertia


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
    deterministic seed centroids. They are collected driver-side
    (tiny: C x dim doubles) and shipped in the assignment UDF's
    closure (_assign_cells): cell assignment and probing are one
    vectorized Arrow pass per row batch — NO join, NO shuffle, and no
    C x dim literals unrolled into the plan (the round-1 literal form
    hit codegen/plan-size pathology at realistic IVF sizes). The only
    shuffles left are the candidate join (probe side is queries x
    nprobe rows -> broadcast) and the final per-query top-k window.

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

    base = with_double_vec(_fan_out(corpus), vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
    )

    cents, _ = lloyd_train(
        base, cents, lloyd_iters, round_digits=round_digits, mean_round=mean_round
    )

    c = _assign_cells(base, cents, "corpus_id", "_cv", round_digits).drop("cell_cos")
    q = _assign_cells(
        with_double_vec(queries, vec_col).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ),
        cents,
        "query_id",
        "_qv",
        round_digits,
        nprobe=nprobe,
    ).drop("cell_cos")
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


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 4,
    num_codes: int = 8,
) -> tuple[list[list[tuple[int, list[float]]]], int]:
    """Deterministic product-quantization codebooks: subspace m's code
    c is the m-th subvector of the c-th lowest-id corpus vector (the
    same seed convention as IVF centroids). Driver-side collect of
    num_codes rows only; returns (books, subdim) where
    books[m] = [(code, subvector), ...] sorted by code."""
    rows = (
        with_double_vec(corpus, vec_col)
        .select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(num_codes)
        .collect()
    )
    dim = len(rows[0][vec_col]) if rows else 0
    sub = dim // num_subspaces
    books = []
    for mi in range(num_subspaces):
        books.append(
            [
                (code, [float(x) for x in row[vec_col][mi * sub : (mi + 1) * sub]])
                for code, row in enumerate(rows)
            ]
        )
    return books, sub


def _pq_sub_dists(E, books, sub, round_digits):
    """rows x M x K rounded squared-L2 distances to every codebook
    entry; the per-dimension accumulation is sequential in j so it is
    bit-identical to the oracle's list_dot_product(diff, diff) fold."""
    import numpy as np

    n = E.shape[0]
    m = len(books)
    k = len(books[0])
    dist = np.empty((n, m, k))
    for mi, entries in enumerate(books):
        s = E[:, mi * sub : (mi + 1) * sub]
        for ci, (_, w) in enumerate(entries):
            acc = np.zeros(n)
            for j in range(sub):
                d = s[:, j] - w[j]
                acc += d * d
            dist[:, mi, ci] = acc
    return _round_half_like_sql(dist, round_digits)


def pq_encode(
    df: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> DataFrame:
    """PQ encoding as one vectorized Arrow pass (codebooks ride the
    task closure, M x K x subdim doubles — tiny): each vector becomes
    an array of M codes, code = argmin rounded squared-L2 distance to
    the subspace codebook (first-min => lowest code on ties, the
    oracle's ORDER BY dist ASC, code ASC). No join, no shuffle — the
    64-bit-per-row compression that makes 100 TB ADC scans cheap."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy())
            dist = _pq_sub_dists(E, books, sub, round_digits)
            codes = np.argmin(dist, axis=2).astype(np.int32)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).mapInPandas(fn, schema=out_schema)


def pq_lut(
    df: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> DataFrame:
    """Per-query ADC lookup table: flat array of M*K rounded squared-L2
    distances (lut[m*K + c] = dist of the query's m-th subvector to
    code c). One Arrow pass over the (small) query set."""
    import numpy as np
    import pandas as pd

    k = len(books[0]) if books else 0
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("lut", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy())
            dist = _pq_sub_dists(E, books, sub, round_digits)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "lut": list(dist.reshape(E.shape[0], -1)),
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).mapInPandas(fn, schema=out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_subspaces: int = 4,
    num_codes: int = 8,
    round_digits: int = 9,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC): corpus vectors are compressed to M codes; each query ships a
    broadcast M x K lookup table and every corpus row is scored with M
    array lookups + M-1 adds (JVM-side fold) instead of a dim-wide dot
    product. approx_dist = sum of the per-subspace rounded distances,
    ascending top-k with corpus_id tie-break.

    Scale shape: encoding is one Arrow pass (closure codebooks, no
    shuffle); scoring streams the code relation (8 bytes/row at
    M=4 x K<=256 vs dim x 8) against broadcast LUTs; the only shuffle
    is the final per-query top-k window. Recall improves with more
    subspaces/codes; exact re-rank of the survivors can reuse
    cosine_topk on the id list."""
    books, sub = pq_codebooks(corpus, id_col, vec_col, num_subspaces, num_codes)
    enc = pq_encode(_fan_out(corpus), books, sub, id_col, vec_col, round_digits)
    lut = pq_lut(queries, books, sub, id_col, vec_col, round_digits)
    return _adc_topk(
        enc.withColumnRenamed(id_col, "corpus_id"),
        lut.withColumnRenamed(id_col, "query_id"),
        num_subspaces,
        len(books[0]),
        k,
        round_digits,
    )


def _adc_topk(
    enc: DataFrame,
    lut: DataFrame,
    num_subspaces: int,
    num_k: int,
    k: int,
    round_digits: int,
) -> DataFrame:
    """The ADC scoring tail shared by the live ``pq_topk`` and the
    standing-index ``probe_pq_index``: stream the (corpus_id, codes)
    relation against broadcast per-query LUTs, fold M array lookups
    per pair (sequential over subspaces m = 0..M-1, mirroring the
    oracle's per-(query, corpus) sum of the same rounded LUT entries),
    ascending top-k with corpus_id tie-break."""
    pairs = enc.join(
        F.broadcast(lut), F.col("corpus_id") != F.col("query_id")
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(num_subspaces - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + F.element_at(
            F.col("lut"), (mi * num_k + F.element_at(F.col("codes"), mi + 1) + 1).cast("int")
        ),
    )
    scored = pairs.select(
        "query_id",
        "corpus_id",
        F.round(score, round_digits).alias("approx_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            "approx_dist",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shortlist: int = 200,
    num_subspaces: int = 4,
    num_codes: int = 8,
    round_digits: int = 9,
) -> DataFrame:
    """The production two-stage retrieval shape shared by
    ``ann_pq_rerank`` and the hybrid fusion's vector arm: PQ/ADC
    shortlist of ``shortlist`` candidates from the compressed codes
    (cheap — the code relation is ~bytes/vector), then an EXACT
    cosine re-rank of just that shortlist, cut to ``k``. The full
    vectors for the shortlist arrive via one bounded join, never a
    corpus scan per query; rank is assigned on the ROUNDED cosine
    with corpus_id tie-break (engine-stable, oracle-matched)."""
    cand = pq_topk(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=shortlist,
        num_subspaces=num_subspaces,
        num_codes=num_codes,
        round_digits=round_digits,
    ).select("query_id", "corpus_id")
    # Query vectors come from the PASSED queries relation, not the
    # corpus: a query id absent from the corpus must still re-rank its
    # shortlist rather than silently vanish from the output (ADVICE
    # r9 — the corpus-side join dropped such ids; both in-repo callers
    # pass queries ⊆ corpus so their results are unchanged).
    q = with_double_vec(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_q")
    )
    c = with_double_vec(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_c")
    )
    scored = (
        cand.join(q, "query_id")
        .join(c, "corpus_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_q"), F.col("_c"))
                / (_norm(F.col("_q")) * _norm(F.col("_c"))),
                round_digits,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
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


# --- persisted IVF index (partitioned by cell, incremental append) ----------
#
# The ANN twin of the persisted dedup indexes (operators/dedup.py
# write_hash_index / write_band_index): at 100 TB the corpus is
# assigned to Voronoi cells ONCE at index-build time and stored
# cell-partitioned; each query batch then probes only its nprobe
# cells' partitions (partition pruning at the scan — the on-disk form
# of IVF's "search only the probed lists"). New vectors append
# incrementally: assign against the FROZEN centroids and write into
# their cells' partitions, no retrain, no rewrite of existing files.


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    cents: list[tuple[int, list[float], float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
    mode: str = "overwrite",
) -> None:
    """Assign every corpus vector to its cell (one Arrow pass, no
    shuffle) and persist as parquet PARTITIONED BY cell, plus the
    frozen centroids as a tiny sibling table at ``{path}_centroids``
    so probes and appends never touch corpus bytes to rebuild them."""
    assigned = _assign_cells(
        with_double_vec(corpus, vec_col).select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
        ),
        cents,
        "corpus_id",
        "_cv",
        round_digits,
    ).drop("cell_cos")
    assigned.write.mode(mode).partitionBy("cell").parquet(path)
    spark = corpus.sparkSession
    cent_rows = [
        (int(cid), [float(x) for x in w], float(nrm)) for cid, w, nrm in cents
    ]
    spark.createDataFrame(
        cent_rows, "cell INT, weights ARRAY<DOUBLE>, norm DOUBLE"
    ).coalesce(1).write.mode(mode).parquet(f"{path}_centroids")


def read_ivf_centroids(spark, path: str) -> list[tuple[int, list[float], float]]:
    """The frozen centroid set back from ``{path}_centroids`` — a
    C-row collect, bounded by the index geometry, never the corpus."""
    rows = spark.read.parquet(f"{path}_centroids").collect()
    return sorted(
        ((int(r["cell"]), list(r["weights"]), float(r["norm"])) for r in rows),
        key=lambda t: t[0],
    )


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> None:
    """Incremental ingest: assign ONLY the new batch against the
    frozen centroids and append into the matching cell partitions.
    Existing files are untouched (parquet append into hive
    partitions); cost is one Arrow pass over the batch — never a
    corpus re-assignment or a retrain."""
    spark = new_vectors.sparkSession
    cents = read_ivf_centroids(spark, path)
    assigned = _assign_cells(
        with_double_vec(new_vectors, vec_col).select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
        ),
        cents,
        "corpus_id",
        "_cv",
        round_digits,
    ).drop("cell_cos")
    assigned.write.mode("append").partitionBy("cell").parquet(path)


def probe_ivf_index(
    spark,
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 2,
    round_digits: int = 9,
) -> DataFrame:
    """Top-k over the persisted index: queries assign to their nprobe
    nearest cells (Arrow pass over the query batch only), the scan of
    the cell-partitioned index is FILTERED to the probed cells —
    partition pruning keeps unprobed lists on disk
    (tests/test_scale_patterns.py pins the pruned scan) — and the
    exact cosine re-rank runs inside the probed cells via a broadcast
    of the (queries x nprobe)-bounded probe side."""
    cents = read_ivf_centroids(spark, path)
    q = _assign_cells(
        with_double_vec(queries).select(
            F.col(id_col).alias("query_id"), F.col("embedding").alias("_qv")
        ),
        cents,
        "query_id",
        "_qv",
        round_digits,
        nprobe=nprobe,
    ).drop("cell_cos")
    probed = [int(r["cell"]) for r in q.select("cell").distinct().collect()]
    c = spark.read.parquet(path).filter(F.col("cell").isin(probed))
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
        .select(
            "query_id", "corpus_id", "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def write_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 4,
    num_codes: int = 8,
    round_digits: int = 9,
    mode: str = "overwrite",
) -> None:
    """The PQ index's PERSISTED form (VERDICT r11 item 6 — the last
    ANN family whose batch path re-encoded the corpus per invocation):
    train the deterministic codebooks once, encode the corpus in one
    Arrow pass (closure codebooks, no shuffle), and persist the code
    relation at ``path`` with the frozen codebooks as a tiny sibling
    table at ``{path}_codebooks`` (M x K rows) so probes and appends
    never touch corpus bytes to retrain.

    Layout note: unlike the IVF index there is nothing to partition-
    prune BY — ADC scoring scans every code row by design; the
    compression (M small ints per vector vs dim x 8 bytes) IS the
    index. What matters at 100 TB is even file sizes on the code
    relation, which the encode pass's fan-out already provides.

    ``mode`` must stay 'overwrite': a write_pq_index(mode='append')
    would retrain and APPEND a second codebook generation to the
    sibling table, silently inflating num_k so every later probe
    mis-indexes the flattened ADC LUT (ADVICE r12). Incremental
    ingest goes through ``append_to_pq_index``, which encodes against
    the frozen codebooks and appends only code rows."""
    if mode != "overwrite":
        raise ValueError(
            "write_pq_index only supports mode='overwrite' (a rebuild "
            "retrains the codebooks); use append_to_pq_index for "
            f"incremental ingest, got mode={mode!r}"
        )
    books, sub = pq_codebooks(corpus, id_col, vec_col, num_subspaces, num_codes)
    enc = pq_encode(
        _fan_out(corpus), books, sub, id_col, vec_col, round_digits
    ).withColumnRenamed(id_col, "corpus_id")
    enc.write.mode(mode).parquet(path)
    spark = corpus.sparkSession
    book_rows = [
        (mi, code, [float(x) for x in w])
        for mi, entries in enumerate(books)
        for code, w in entries
    ]
    spark.createDataFrame(
        book_rows, "m INT, code INT, w ARRAY<DOUBLE>"
    ).coalesce(1).write.mode(mode).parquet(f"{path}_codebooks")


def read_pq_codebooks(
    spark, path: str
) -> tuple[list[list[tuple[int, list[float]]]], int]:
    """The frozen codebooks back from ``{path}_codebooks`` — an M x K
    collect, bounded by the quantizer geometry, never the corpus."""
    rows = spark.read.parquet(f"{path}_codebooks").collect()
    by_m: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        by_m.setdefault(int(r["m"]), []).append(
            (int(r["code"]), [float(x) for x in r["w"]])
        )
    books = [sorted(by_m[mi]) for mi in sorted(by_m)]
    sub = len(books[0][0][1]) if books else 0
    return books, sub


def append_to_pq_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 9,
) -> None:
    """Incremental ingest: encode ONLY the new batch against the
    frozen codebooks and append to the code relation. Existing files
    are untouched; cost is one Arrow pass over the batch — never a
    corpus re-encode or a codebook retrain (the IVF append
    convention)."""
    spark = new_vectors.sparkSession
    books, sub = read_pq_codebooks(spark, path)
    enc = pq_encode(
        _fan_out(new_vectors), books, sub, id_col, vec_col, round_digits
    ).withColumnRenamed(id_col, "corpus_id")
    enc.write.mode("append").parquet(path)


def probe_pq_index(
    spark,
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 9,
) -> DataFrame:
    """Top-k over the persisted code relation: the per-batch
    production cost. Queries build their M x K LUTs in one Arrow pass
    (codebooks from the sibling table — an M x K collect), the code
    scan reads M small ints per corpus vector (never embedding
    bytes), and the ADC fold + per-query top-k window are identical
    to the live ``pq_topk`` tail (value-parity pinned in
    tests/test_scale_patterns.py). Probe cost ∝ queries x codes-scan;
    nothing re-encodes. The quantizer geometry (M, K) comes from the
    stored codebooks — a caller-supplied M could silently mis-score
    against an index written with a different one."""
    books, sub = read_pq_codebooks(spark, path)
    lut = pq_lut(
        queries, books, sub, id_col, vec_col, round_digits
    ).withColumnRenamed(id_col, "query_id")
    enc = spark.read.parquet(path)
    return _adc_topk(enc, lut, len(books), len(books[0]), k, round_digits)
