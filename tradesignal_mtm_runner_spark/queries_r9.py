"""Round-9 surface: the 100 TB scale twin of the exact table profile
and the production lexical x vector hybrid retriever.

Both follow the house conventions: declarative one-scan plans, bounded
broadcast sides, every float through ``round(x, 9) + 0.0`` on both
engines, Spark column names identical to the oracle's.

No counterpart exists in the pandas reference (reference scope is the
MTM loop, runner_mtm.py:71); these extend the profiling (B41) and
retrieval (C52/C53/C30b) families the way a production deployment
composes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_pipeline import _V_SQL, _emb
from .queries_r8 import (
    BM25_QUERIES,
    BM25_SCORED_CTES,
    RRF_K,
    RRF_POOL,
    RRF_TOPK,
    _PROFILE_COLS,
    _r9,
    bm25_scored,
)
from .sources import load_table

R = 9

#: exact-rerank shortlist depth multiplier for the hybrid's vector arm
#: (C30b uses 40 at ANN_TOPK=5 depth; at RRF_POOL=20 a 4x shortlist is
#: the same 80-candidate budget)
HYB_RERANK_FACTOR = 4


# --- B41b approx table profile (the 100 TB drop-in for B41) -------------------


def approx_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE twin of ``table_profile`` (the B17 -> B19 convention
    applied to profiling): identical one-scan long-form output, but
    NDV via ``approx_count_distinct`` (HyperLogLog++). The exact form
    plans a single Expand pass — one input copy per distinct column,
    then a shuffle of every distinct value; at 100 TB that shuffle IS
    the job. The sketch form is a plain partial-aggregable accumulator
    per column: no Expand blow-up, no distinct-value shuffle, one
    constant-size sketch per (column) merged at the driver — the form
    a CBO stats collector actually ships. Accuracy vs the exact NDVs
    is pinned in tests (HLL++ default rsd = 0.05)."""
    li = load_table(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.avg(c).alias(f"{c}__avg"),
        ]
    one = li.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}__rows").alias("n_rows"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__ndv").alias("n_distinct_approx"),
                        _r9(F.col(f"{c}__min")).alias("min_value"),
                        _r9(F.col(f"{c}__max")).alias("max_value"),
                        _r9(F.col(f"{c}__avg")).alias("avg_value"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


# --- C53b hybrid retrieval: BM25 x PQ+rerank RRF fusion -----------------------


def _hyb_query_ids() -> list[int]:
    """The shared query-id space: BM25_QUERIES' keys double as vec_ids
    (documents.doc_id and embeddings.vec_id share the 0..N-1 id space,
    so vec_id q is 'the embedding of doc q' — the standard setup where
    a hybrid query carries both a term list and an embedding)."""
    return sorted(BM25_QUERIES)


def hybrid_bm25_pq_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION two-tier hybrid retriever: BM25 lexical
    shortlist (C52's scoring chain) fused with the PQ/ADC + exact
    re-rank vector shortlist (C30b's two-stage shape) by reciprocal
    rank fusion. Unlike ``hybrid_search_rrf`` (whose retriever A is a
    deliberate exact-cosine baseline), NEITHER arm scans the full
    corpus with exact math: the lexical arm touches only
    query-vocabulary postings, the vector arm scores compressed codes
    and exact-reranks an RRF_POOL x {HYB_RERANK_FACTOR} shortlist.
    rrf = sum 1/(K + rank); FULL OUTER rank join so a doc surfaced by
    one arm still scores; all per-query work partitions by query_id."""
    from .operators.similarity import _dot, _norm, pq_topk, with_double_vec
    from .queries_pipeline_extras import PQ_K, PQ_M

    qids = _hyb_query_ids()

    # lexical arm: BM25 at pool depth
    wl = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    lex = (
        bm25_scored(spark, sf_dir)
        .withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= RRF_POOL)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "rank_lex",
        )
    )

    # vector arm: PQ/ADC shortlist -> exact cosine re-rank (C30b)
    emb = _emb(spark, sf_dir)
    qvecs = emb.filter(F.col("vec_id").isin(qids))
    cand = pq_topk(
        emb,
        qvecs,
        k=RRF_POOL * HYB_RERANK_FACTOR,
        num_subspaces=PQ_M,
        num_codes=PQ_K,
        round_digits=R,
    ).select("query_id", "corpus_id")
    v = with_double_vec(emb, "embedding").select("vec_id", "embedding")
    q = v.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_q")
    )
    c = v.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("_c")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    vec = (
        cand.join(q, "query_id")
        .join(c, "corpus_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("_q"), F.col("_c"))
                / (_norm(F.col("_q")) * _norm(F.col("_c"))),
                R,
            ),
        )
        .withColumn("rank_vec", F.row_number().over(wv))
        .filter(F.col("rank_vec") <= RRF_POOL)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("corpus_id").cast("long").alias("doc_id"),
            "rank_vec",
        )
    )

    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf",
        _r9(
            F.coalesce(1.0 / (RRF_K + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rank_vec")), F.lit(0.0))
        ),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= RRF_TOPK)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.col("rrf").alias("rrf_score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hybrid_sql() -> str:
    """Oracle: the BM25 scoring CTEs verbatim + the PQ/ADC chain (the
    ANN_PQ_SQL shape with the query set restricted to the shared
    query ids) + exact re-rank + RRF fusion."""
    from .queries_pipeline_extras import PQ_K, PQ_M, PQ_SUB

    qid_list = ", ".join(str(q) for q in _hyb_query_ids())
    pq_diff = (
        f"list_transform(range(1, {PQ_SUB + 1}), "
        f"i -> v.e[cb.m * {PQ_SUB} + i] - cb.w[i])"
    )
    return f"""
WITH {BM25_SCORED_CTES},
lex AS (
  SELECT CAST(query_id AS INT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id, rank_lex
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id ASC) AS rank_lex
    FROM scored
  ) WHERE rank_lex <= {RRF_POOL}
),
{_V_SQL},
seed0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT {PQ_K}),
seed AS (SELECT e, row_number() OVER (ORDER BY vec_id) - 1 AS code FROM seed0),
cb AS (
  SELECT t.m, s.code,
         list_transform(range(1, {PQ_SUB + 1}), i -> s.e[t.m * {PQ_SUB} + i]) AS w
  FROM seed s CROSS JOIN (SELECT range AS m FROM range({PQ_M})) t
),
encd AS (
  SELECT v.vec_id, cb.m, cb.code, {pq_diff} AS d
  FROM v CROSS JOIN cb
),
enc AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY round(list_dot_product(d, d), {R}) ASC, code ASC) AS rn
    FROM encd
  ) WHERE rn = 1
),
lut AS (
  SELECT vec_id AS query_id, m, code, round(list_dot_product(d, d), {R}) AS dist
  FROM encd WHERE vec_id IN ({qid_list})
),
adc AS (
  SELECT l.query_id, e.vec_id AS corpus_id, round(sum(l.dist), {R}) AS approx_dist
  FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code AND e.vec_id != l.query_id
  GROUP BY l.query_id, e.vec_id
),
cand AS (
  SELECT query_id, corpus_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_dist ASC, corpus_id ASC) AS rn
    FROM adc
  ) WHERE rn <= {RRF_POOL * HYB_RERANK_FACTOR}
),
rr AS (
  SELECT cd.query_id, cd.corpus_id,
         round(list_dot_product(q.e, t.e)
               / (sqrt(list_dot_product(q.e, q.e))
                  * sqrt(list_dot_product(t.e, t.e))), {R}) AS cosine
  FROM cand cd
  JOIN v q ON q.vec_id = cd.query_id
  JOIN v t ON t.vec_id = cd.corpus_id
),
vec AS (
  SELECT CAST(query_id AS INT) AS query_id, CAST(corpus_id AS BIGINT) AS doc_id, rank_vec
  FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, corpus_id ASC) AS rank_vec
    FROM rr
  ) WHERE rank_vec <= {RRF_POOL}
),
fused AS (
  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
         COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         round(COALESCE(1.0 / ({RRF_K} + lex.rank_lex), 0.0)
               + COALESCE(1.0 / ({RRF_K} + vec.rank_vec), 0.0), {R}) + 0.0 AS rrf_score
  FROM lex FULL OUTER JOIN vec USING (query_id, doc_id)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT CAST(query_id AS INT) AS query_id, CAST(doc_id AS BIGINT) AS doc_id,
       rrf_score, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {RRF_TOPK}
"""


R9_QUERIES = {
    "approx_table_profile": approx_table_profile,
    "hybrid_bm25_pq_rrf": hybrid_bm25_pq_rrf,
}

# approx_table_profile is rows-only BY DESIGN (sketch NDVs are
# estimator-specific — DuckDB's approx_count_distinct uses a different
# HLL than Spark's HLL++, so values legitimately differ inside the
# rsd band; the tolerance pin vs the exact B41 profile lives in
# tests/test_r9.py)
R9_ORACLES = {
    "hybrid_bm25_pq_rrf": _hybrid_sql(),
}
