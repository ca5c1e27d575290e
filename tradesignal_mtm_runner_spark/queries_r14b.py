"""Round-14 second batch: the co-purchase graph family completed as a
classical graph-analytics suite — LPA communities (B58), local
clustering coefficients (B59), Adamic-Adar link prediction (B60) —
alongside CC label propagation (C17), weighted PageRank (B44),
oriented triangle counting (B55), k-core peeling (B56) and item-item
top-k similarity (B57). All three ride the SAME persisted support-cut
edge relation and the SHARED kernels in operators/graph.py, so the
standing-edge-index probe twins (communities_from_index /
clustering_from_index / linkpred_from_index) are structurally
value-identical to the live queries here (pinned in
tests/test_scale_patterns.py).

House conventions: fixed iteration counts mirrored EXACTLY by the
DuckDB oracle (engine/oracle equality holds even mid-convergence;
convergence is its own pin, tests/test_r14b.py), floats rounded to
9 dp BEFORE any ranking so rank order is bit-stable across engines,
hub-quadratic work capped up front (the lsh_candidate_pairs
max_bucket convention), zero broadcast hints on SF-scaling relations
(AQE decides — the bounded-dims-only convention).

No counterpart in the pandas reference (reference scope is the MTM
loop, runner_mtm.py:71); this is the warehouse/graph surface the
build brief adds on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache_registry import persist_tracked
from .operators.graph import (
    clustering_coefficients,
    community_labels_converged,
    link_predictions,
    node_degrees,
)
from .queries_r10b import _BASKET_CTES, _basket_pair_counts

#: synchronous self-vote LPA rounds, mirrored by the oracle unroll.
#: Measured convergence on the co-purchase graphs: 5 rounds (sf0.001),
#: 7 (sf0.01), 5 (sf0.1) — 9 leaves spare rounds everywhere; one extra
#: round changing nothing is pinned in tests/test_r14b.py. (The
#: self-vote is what makes a fixed unroll sane at all: plain
#: synchronous LPA two-cycles on sparse regions — see
#: operators/graph.community_labels.)
LPA_ROUNDS = 9

#: Adamic-Adar hub cap: wedge enumeration at a common-neighbor center
#: v is C(deg(v), 2) — quadratic in hub degree — so centers past this
#: degree are excluded from scoring (their 1/ln(deg) contribution is
#: the smallest in the graph by construction). No test-SF co-purchase
#: graph has a node past 64 (max degrees 51/13/6 at
#: sf0.001/0.01/0.1), so the cap is pinned by a planted hub instead
#: (tests/test_r14b.py); the oracle mirrors it so both engines score
#: the identical wedge set.
LINK_MAX_DEG = 64

#: predicted candidates reported per part (the B57 top-k convention)
LINK_TOPK = 3


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B58: LPA community labels over the co-purchase graph (nodes =
    parts, edges = B43's support-cut pairs). Kernel =
    operators/graph.community_labels — synchronous self-vote label
    propagation, deterministic (max votes, then min label), one
    graph-sized join + vote count + top-1 window per round, lineage
    cut per round (the k-core convention: the label relation is
    referenced twice per round, so the plan would double without
    cuts).

    OPTIMIZATION r16: runs the ITERATE-TO-FIXPOINT kernel
    (community_labels_converged — converged == LPA_ROUNDS unroll
    pinned in tests/test_r15.py) instead of the fixed unroll: measured
    LPA convergence is 5/7/5 rounds at sf0.001/0.01/0.1, so the fixed
    form paid 9 graph-sized rounds where 6–8 suffice, and
    post-convergence rounds are provable no-ops (a fixpoint labeling
    re-votes itself) — the OUTPUT is identical and the
    LPA_ROUNDS-unrolled oracle still matches at every test SF. The
    fixed kernel remains for the oracle mirror and plan pins."""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    # the kernel's symmetrize references the pair relation twice
    # (review r14b): persist so the lineitem->basket->pair chain runs
    # once in the checkpoint-materialization job (the family
    # convention — see kcore_members' docstring)
    edges = persist_tracked(pairs.select("part_a", "part_b"))
    return community_labels_converged(edges)


def _lpa_round_sql(i: int) -> str:
    prev = f"l{i - 1}"
    return f"""
l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY count(*) DESC, label ASC) AS rk
    FROM (
      SELECT e.dst AS node, s.label FROM e JOIN {prev} s ON e.src = s.node
      UNION ALL
      SELECT node, label FROM {prev}
    )
    GROUP BY node, label
  ) WHERE rk = 1
)"""


def _communities_sql() -> str:
    rounds = ",".join(_lpa_round_sql(i) for i in range(1, LPA_ROUNDS + 1))
    return f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
{rounds}
SELECT CAST(node AS BIGINT) AS part, CAST(label AS BIGINT) AS community
FROM l{LPA_ROUNDS}
"""


def copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B59: local clustering coefficients over the co-purchase graph —
    per part, its support-cut degree, triangle participation, and
    c(v) = 2·T(v)/(deg·(deg−1)) (0.0 below degree 2; triangle-free
    nodes kept via LEFT join, not dropped). Kernel =
    operators/graph.clustering_coefficients, which reuses the B55
    ORIENTED triangle kernel verbatim — same O(√E) wedge bound, and
    the oracle keeps its algorithm-diverse a<b<c self-join enumeration
    (same values, different physical strategy — the B43 convention).
    The edge relation is persisted: it feeds degrees, the orientation,
    both wedge arms and the closing join."""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    edges = persist_tracked(pairs.select("part_a", "part_b", "pair_cnt"))
    return clustering_coefficients(
        edges, node_degrees(edges).select("pk", "deg")
    )


CLUSTERING_SQL = f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
deg AS MATERIALIZED (SELECT src AS pk, count(*) AS deg FROM e GROUP BY src),
tri AS MATERIALIZED (
  SELECT e1.part_a AS a, e1.part_b AS b, e2.part_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.part_a = e1.part_a AND e2.part_b > e1.part_b
  JOIN pairs e3 ON e3.part_a = e1.part_b AND e3.part_b = e2.part_b
),
corners AS (
  SELECT a AS pk FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
tc AS (SELECT pk, count(*) AS nt FROM corners GROUP BY pk)
SELECT CAST(d.pk AS BIGINT) AS part,
       CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(tc.nt, 0) AS BIGINT) AS n_triangles,
       round(CASE WHEN d.deg >= 2
                  THEN 2.0 * coalesce(tc.nt, 0) / (d.deg * (d.deg - 1.0))
                  ELSE 0.0 END, 9) + 0.0 AS clustering
FROM deg d LEFT JOIN tc ON tc.pk = d.pk
"""


def copurchase_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B60: Adamic-Adar link prediction — top-k NON-adjacent
    distance-2 candidates per part, scored Σ 1/ln(deg(v)) over common
    neighbors v ("may also buy", the classic link-prediction
    precompute). Kernel = operators/graph.link_predictions: hub-capped
    wedge enumeration (LINK_MAX_DEG — the quadratic-fan-out guard at
    scale; non-binding on the test graphs and pinned by a planted hub
    instead), LEFT ANTI against the existing edge relation, scores
    rounded to 9 dp BEFORE the part-partitioned top-k window with ties
    on candidate id (bit-stable rank order across engines). The edge
    relation is persisted: it feeds degrees, both wedge arms and the
    anti-join."""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    edges = persist_tracked(pairs.select("part_a", "part_b", "pair_cnt"))
    return link_predictions(
        edges,
        node_degrees(edges).select("pk", "deg"),
        LINK_MAX_DEG,
        LINK_TOPK,
    )


LINK_PREDICT_SQL = f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
deg AS MATERIALIZED (SELECT src AS pk, count(*) AS deg FROM e GROUP BY src),
ctr AS (SELECT pk, deg FROM deg WHERE deg BETWEEN 2 AND {LINK_MAX_DEG}),
adj AS (SELECT e.src, e.dst, c.deg FROM e JOIN ctr c ON c.pk = e.src),
wed AS (
  SELECT a.dst AS u, b.dst AS w, a.deg
  FROM adj a JOIN adj b ON a.src = b.src AND a.dst < b.dst
),
sc AS (
  SELECT u, w, CAST(count(*) AS BIGINT) AS n_common,
         round(sum(1.0 / ln(deg)), 9) + 0.0 AS aa_score
  FROM wed GROUP BY u, w
),
pr AS (
  SELECT sc.u, sc.w, sc.n_common, sc.aa_score
  FROM sc
  LEFT JOIN pairs p ON p.part_a = sc.u AND p.part_b = sc.w
  WHERE p.part_a IS NULL
),
symp AS (
  SELECT u AS part, w AS cand, n_common, aa_score FROM pr
  UNION ALL
  SELECT w AS part, u AS cand, n_common, aa_score FROM pr
),
r AS (
  SELECT part, cand, n_common, aa_score,
         CAST(row_number() OVER (PARTITION BY part
                                 ORDER BY aa_score DESC, cand ASC) AS INT)
           AS rank
  FROM symp
)
SELECT CAST(part AS BIGINT) AS part, CAST(cand AS BIGINT) AS cand,
       n_common, aa_score, rank
FROM r WHERE rank <= {LINK_TOPK}
"""


def copurchase_graph_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B61: one-row GRAPH HEALTH PROFILE of the co-purchase graph —
    the `table_profile` (B41) analogue for the graph surface, the
    dashboard row a production graph stack recomputes per refresh:
    node/edge counts, max and average degree, wedge count, global
    triangle count, and transitivity (3·triangles / wedges — the
    global clustering coefficient). Everything derives from TWO
    bounded aggregates: one over the degree relation (counts, max,
    Σdeg, Σ C(deg,2) — the wedge count is ARITHMETIC on degrees,
    never an enumeration, so it is exact and cheap at any scale,
    with integer `div` arithmetic so no float precision cliff at
    2^53) and one over the per-node triangle counts (the oriented
    kernel — each triangle credits 3 corners, so the global count is
    Σ/3). The two 1-row frames cross-join trivially."""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    edges = persist_tracked(pairs.select("part_a", "part_b", "pair_cnt"))
    from .operators.graph import triangle_counts
    from .queries_r8 import _r9

    deg = node_degrees(edges)
    dstats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("deg").cast("long").alias("max_degree"),
        F.sum("deg").cast("long").alias("_sum_deg"),
        F.sum(F.expr("(deg * (deg - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    tstats = (
        triangle_counts(edges, deg.select("pk", "deg"))
        .agg(F.sum("n_triangles").cast("long").alias("_tri3"))
        .select(
            F.coalesce(F.expr("_tri3 div 3"), F.lit(0))
            .cast("long")
            .alias("n_triangles")
        )
    )
    return dstats.crossJoin(tstats).select(
        "n_nodes",
        F.expr("_sum_deg div 2").cast("long").alias("n_edges"),
        "max_degree",
        # guarded like transitivity (ADVICE r14): on an empty edge
        # relation n_nodes=0 / sum_deg NULL, and Spark's NULL-division
        # vs DuckDB's divide-by-zero behavior would split the engines
        # on the one edge case the otherwise-total parity misses
        _r9(
            F.when(
                F.col("n_nodes") > 0,
                F.col("_sum_deg").cast("double") / F.col("n_nodes"),
            ).otherwise(F.lit(0.0))
        ).alias("avg_degree"),
        "n_wedges",
        "n_triangles",
        _r9(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges"),
            ).otherwise(F.lit(0.0))
        ).alias("transitivity"),
    )


GRAPH_PROFILE_SQL = f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
deg AS (SELECT src AS pk, count(*) AS deg FROM e GROUP BY src),
tri AS (
  SELECT e1.part_a AS a, e1.part_b AS b, e2.part_b AS c
  FROM pairs e1
  JOIN pairs e2 ON e2.part_a = e1.part_a AND e2.part_b > e1.part_b
  JOIN pairs e3 ON e3.part_a = e1.part_b AND e3.part_b = e2.part_b
),
dstats AS (
  SELECT count(*) AS n_nodes, max(deg) AS max_degree,
         sum(deg) AS sum_deg, sum((deg * (deg - 1)) // 2) AS n_wedges
  FROM deg
),
t AS (SELECT count(*) AS n_tri FROM tri)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(sum_deg // 2 AS BIGINT) AS n_edges,
       CAST(max_degree AS BIGINT) AS max_degree,
       round(CASE WHEN n_nodes > 0 THEN sum_deg * 1.0 / n_nodes
                  ELSE 0.0 END, 9) + 0.0 AS avg_degree,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_tri AS BIGINT) AS n_triangles,
       round(CASE WHEN n_wedges > 0 THEN 3.0 * n_tri / n_wedges
                  ELSE 0.0 END, 9) + 0.0 AS transitivity
FROM dstats, t
"""


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C69: MinHash estimator CALIBRATION — the sketch-QA rollup a
    production dedup stack ships next to its index: for every LSH
    candidate pair, the SKETCH estimate of Jaccard (fraction of the
    MINHASH_K signature positions that agree — the unbiased MinHash
    estimator) side by side with the EXACT shingle Jaccard, plus the
    absolute error. This is how you detect a broken hash seed, a
    shingle-tokenization drift, or an under-sized K without trusting
    the sketch to audit itself. Cost shape: the estimate is a
    row-local comparison of two K-column signatures on the candidate
    relation (already LSH-bounded and hot-bucket-capped); the exact
    side is C3's kernel — one more corpus-LINEAR shingling pass
    (pair_jaccard re-shingles; it does not reuse the signature
    build's shingle relation) whose expensive part, the pairwise
    intersection, stays candidate-bounded. Nothing here is ever
    all-pairs.
    Output: (id_a, id_b, est_jaccard, exact_jaccard, abs_err), floats
    rounded to 9 dp; est is a multiple of 1/K by construction (both
    engines compute it as an exact small rational in doubles)."""
    from .operators.dedup import (
        lsh_bands_from_wide,
        lsh_candidate_pairs,
        minhash_signatures_wide,
        pair_jaccard,
    )
    from .queries_pipeline import (
        BANDS,
        LSH_MAX_BUCKET,
        MINHASH_K,
        SHINGLE_K,
        _docs,
    )
    from .queries_r8 import _r9

    docs = _docs(spark, sf_dir)
    # ONE tokenize+shingle corpus pass shared by the signature build
    # and the exact-Jaccard side (optimization r16 — pair_jaccard
    # previously re-shingled the corpus; the docstring's noted cost)
    from .operators.dedup import _fan_out, doc_shingle_sets

    sh_sets = persist_tracked(doc_shingle_sets(_fan_out(docs), k=SHINGLE_K))
    sig = persist_tracked(
        minhash_signatures_wide(
            docs, num_hashes=MINHASH_K, shingle_k=SHINGLE_K, sh_sets=sh_sets
        )
    )
    cand = persist_tracked(
        lsh_candidate_pairs(
            lsh_bands_from_wide(sig, "doc_id", BANDS, MINHASH_K),
            "doc_id",
            max_bucket=LSH_MAX_BUCKET,
        )
    )
    agree = sum(
        F.when(F.col(f"_a_m{i}") == F.col(f"_b_m{i}"), 1).otherwise(0)
        for i in range(MINHASH_K)
    )
    est = (
        cand.join(
            sig.select(
                F.col("doc_id").alias("id_a"),
                *[F.col(f"m{i}").alias(f"_a_m{i}") for i in range(MINHASH_K)],
            ),
            "id_a",
        )
        .join(
            sig.select(
                F.col("doc_id").alias("id_b"),
                *[F.col(f"m{i}").alias(f"_b_m{i}") for i in range(MINHASH_K)],
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / F.lit(float(MINHASH_K))).alias("_est"),
        )
    )
    # exact side = the shared candidate-bounded verify step (review
    # r14b: pair_jaccard also fans out the single-file doc scan before
    # the CPU-heavy shingling — the inline copy ran it single-task)
    exact = pair_jaccard(docs, cand, shingle_k=SHINGLE_K, sh_sets=sh_sets)
    return est.join(exact, ["id_a", "id_b"]).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        _r9(F.col("_est")).alias("est_jaccard"),
        _r9(F.col("jaccard")).alias("exact_jaccard"),
        _r9(F.abs(F.col("_est") - F.col("jaccard"))).alias("abs_err"),
    )


def _minhash_calibration_sql() -> str:
    from .queries_pipeline import _BANDS_CAPPED_SQL, _BANDS_SQL, MINHASH_K

    return f"""
WITH {_BANDS_SQL},
{_BANDS_CAPPED_SQL},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_c a
  JOIN bands_c b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) * 1.0
           / {MINHASH_K} AS est_j
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
  GROUP BY c.id_a, c.id_b
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND a.shingle = b.shingle
  GROUP BY c.id_a, c.id_b
),
ex AS (
  SELECT e.id_a, e.id_b, e.est_j,
         coalesce(i.n_inter, 0) * 1.0
           / (sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0)) AS ex_j
  FROM est e
  LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
  JOIN sizes sa ON sa.doc_id = e.id_a
  JOIN sizes sb ON sb.doc_id = e.id_b
)
SELECT id_a, id_b,
       round(est_j, 9) + 0.0 AS est_jaccard,
       round(ex_j, 9) + 0.0 AS exact_jaccard,
       round(abs(est_j - ex_j), 9) + 0.0 AS abs_err
FROM ex
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C70: language-ID EVALUATION rollup — the documents table
    carries a ground-truth ``lang`` label, so the C5 heuristic can be
    scored like any classifier: per true language, support and
    correct-prediction counts plus precision / recall / F1 from the
    confusion matrix (predicted-as counts come from the same single
    aggregate pass). This is the QA loop a production lang-ID stage
    actually runs — a stopword-table typo or tokenization drift shows
    up as a per-language recall cliff long before anyone reads the
    filtered corpus. Composes the REGISTERED C5 query (same plan, no
    re-implementation): one pass → three bounded aggregates over the
    ≤|langs|-sized relations, everything broadcast-sized after the
    first aggregate. The anchor is true ∪ PREDICTED languages
    (FULL OUTER — review r14b): a class the heuristic emits that
    never occurs as truth still gets a row, so spurious-prediction
    mass is visible, not silently dropped. Division guards: precision
    0.0 when the lang is never predicted, recall 0.0 when it never
    occurs as truth, F1 0.0 when P + R = 0."""
    from .queries_pipeline import lang_id
    from .queries_r8 import _r9

    li = persist_tracked(
        lang_id(spark, sf_dir).select("lang", "lang_pred")
    )
    true_c = li.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_true")
    )
    pred_c = li.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_pred")
    )
    corr = (
        li.filter(F.col("lang") == F.col("lang_pred"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_correct"))
    )
    j = (
        true_c.join(
            pred_c.withColumnRenamed("lang_pred", "lang"), "lang", "full_outer"
        )
        .join(corr, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("n_correct", F.lit(0)).cast("long").alias("n_correct"),
        )
    )
    p = F.when(
        F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    r = F.when(
        F.col("n_true") > 0, F.col("n_correct") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    return j.select(
        "lang",
        "n_true",
        "n_pred",
        "n_correct",
        _r9(p).alias("precision"),
        _r9(r).alias("recall"),
        _r9(
            F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(
                F.lit(0.0)
            )
        ).alias("f1"),
    )


def _lang_id_confusion_sql() -> str:
    from .queries_pipeline import LANG_ID_SQL

    return f"""
WITH li AS ({LANG_ID_SQL}),
t AS (SELECT lang, count(*) AS n_true FROM li GROUP BY lang),
pr AS (SELECT lang_pred AS lang, count(*) AS n_pred FROM li GROUP BY 1),
c AS (
  SELECT lang, count(*) AS n_correct FROM li
  WHERE lang = lang_pred GROUP BY lang
),
j AS (
  SELECT coalesce(t.lang, pr.lang) AS lang,
         coalesce(t.n_true, 0) AS n_true,
         coalesce(pr.n_pred, 0) AS n_pred
  FROM t FULL OUTER JOIN pr ON pr.lang = t.lang
),
j2 AS (
  SELECT j.lang, j.n_true, j.n_pred, coalesce(c.n_correct, 0) AS n_correct
  FROM j LEFT JOIN c ON c.lang = j.lang
),
m AS (
  SELECT lang, n_true, n_pred, n_correct,
         CASE WHEN n_pred > 0 THEN n_correct * 1.0 / n_pred
              ELSE 0.0 END AS p,
         CASE WHEN n_true > 0 THEN n_correct * 1.0 / n_true
              ELSE 0.0 END AS r
  FROM j2
)
SELECT lang, CAST(n_true AS BIGINT) AS n_true,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_correct AS BIGINT) AS n_correct,
       round(p, 9) + 0.0 AS precision,
       round(r, 9) + 0.0 AS recall,
       round(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r)
                  ELSE 0.0 END, 9) + 0.0 AS f1
FROM m
"""


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C71: the DEDUP REPORT — per near-dup cluster (size ≥ 2, the
    actual duplication), the rollup a production dedup stage publishes
    with every run: cluster size, docs dropped, total / kept / dropped
    word counts and the dropped fraction. Composes the REGISTERED C17
    decision (simhash graph → min-label CC → keep = component
    minimum) with the C6 word counts: one doc-keyed join + one
    cluster-keyed aggregate, both output-sized past the shared CC
    chain. kept_words / n_dropped count the ``keep`` rows actually
    present (review r14b: NOT size − 1 — if the fixed CC unroll has
    not yet converged a component onto one minimum, a label group can
    contain zero keep rows, and the report must say "everything here
    is dropped" rather than contradict itself). All counts BIGINT;
    dropped_frac guarded for zero-word clusters."""
    from .functions import text as TX
    from .queries_pipeline import _docs, dedup_connected
    from .queries_r8 import _r9

    cc = dedup_connected(spark, sf_dir)
    toks = _docs(spark, sf_dir).select(
        "doc_id", TX.word_count(F.col("text")).cast("long").alias("n_words")
    )
    per = (
        cc.join(toks, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("_n_kept"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("kept_words"),
        )
        .filter(F.col("cluster_size") >= 2)
    )
    return per.select(
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "cluster_size",
        (F.col("cluster_size") - F.col("_n_kept"))
        .cast("long")
        .alias("n_dropped"),
        "total_words",
        "kept_words",
        (F.col("total_words") - F.col("kept_words"))
        .cast("long")
        .alias("dropped_words"),
        _r9(
            F.when(
                F.col("total_words") > 0,
                (F.col("total_words") - F.col("kept_words"))
                / F.col("total_words").cast("double"),
            ).otherwise(F.lit(0.0))
        ).alias("dropped_frac"),
    )


def _dedup_cluster_stats_sql() -> str:
    # the C17 chain's CTEs VERBATIM (the _keep_best_sql reuse
    # precedent — review r14b: a hand-pasted copy would silently
    # diverge if DEDUP_CONNECTED_SQL's chain ever changes)
    from .queries_pipeline import DEDUP_CC_ITERS, DEDUP_CONNECTED_SQL

    anchor = "SELECT doc_id, lab AS canonical_id"
    parts = DEDUP_CONNECTED_SQL.rsplit(anchor, 1)
    # ADVICE r14: if the C17 final SELECT is ever reworded, rsplit
    # returns the whole string unchanged and the composed oracle is
    # silently malformed — fail HERE, at import, not at parity time.
    # A raise, not an assert: asserts strip under python -O, which
    # would restore the exact silent failure this guard exists for.
    if len(parts) != 2:
        raise ValueError(
            "dedup_cluster_stats oracle: DEDUP_CONNECTED_SQL no longer "
            f"contains the final-SELECT anchor {anchor!r}; update the "
            "anchor alongside the C17 oracle"
        )
    chain = parts[0].rstrip()
    return f"""{chain},
cc AS (
  SELECT doc_id, lab AS canonical_id, doc_id = lab AS keep
  FROM l{DEDUP_CC_ITERS}
),
wc_tok AS (
  SELECT doc_id, len(string_split_regex(trim(text), ' +')) AS n_words
  FROM documents
),
per AS (
  SELECT canonical_id, count(*) AS sz,
         sum(CASE WHEN keep THEN 1 ELSE 0 END) AS nk,
         sum(n_words) AS tw,
         sum(CASE WHEN keep THEN n_words ELSE 0 END) AS kw
  FROM cc JOIN wc_tok USING (doc_id)
  GROUP BY canonical_id
)
SELECT CAST(canonical_id AS BIGINT) AS canonical_id,
       CAST(sz AS BIGINT) AS cluster_size,
       CAST(sz - nk AS BIGINT) AS n_dropped,
       CAST(tw AS BIGINT) AS total_words,
       CAST(kw AS BIGINT) AS kept_words,
       CAST(tw - kw AS BIGINT) AS dropped_words,
       round(CASE WHEN tw > 0 THEN (tw - kw) * 1.0 / tw
                  ELSE 0.0 END, 9) + 0.0 AS dropped_frac
FROM per WHERE sz >= 2
"""


R14B_QUERIES: dict = {
    "copurchase_communities": copurchase_communities,
    "copurchase_clustering": copurchase_clustering,
    "copurchase_link_predict": copurchase_link_predict,
    "copurchase_graph_profile": copurchase_graph_profile,
    "minhash_calibration": minhash_calibration,
    "lang_id_confusion": lang_id_confusion,
    "dedup_cluster_stats": dedup_cluster_stats,
}

R14B_ORACLES: dict = {
    "copurchase_communities": _communities_sql(),
    "copurchase_clustering": CLUSTERING_SQL,
    "copurchase_link_predict": LINK_PREDICT_SQL,
    "copurchase_graph_profile": GRAPH_PROFILE_SQL,
    "minhash_calibration": _minhash_calibration_sql(),
    "lang_id_confusion": _lang_id_confusion_sql(),
    "dedup_cluster_stats": _dedup_cluster_stats_sql(),
}
