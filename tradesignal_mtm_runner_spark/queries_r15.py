"""Round-15 batch: the co-purchase graph family's remaining classical
entries — CONNECTED COMPONENTS (the one classic the family lacked:
CC label propagation existed only on the dedup side, specialized to
shallow near-dup clusters), the LPA communities STREAM twin (the
k-core stream twin's append-only-partials pattern applied to the
other decision a continually-ingested graph wants refreshed), and the
DEGREE-DISTRIBUTION rollup (the dashboard histogram beside B61's
one-row profile — power-law detection is the first question anyone
asks of a co-purchase graph, and it is what justifies the family's
hub caps).

House conventions: fixed iteration counts mirrored EXACTLY by the
DuckDB oracle (engine/oracle equality holds even mid-convergence;
convergence pinned separately in tests/test_r15.py alongside the
iterate-to-fixpoint twins), integer-exact bucket arithmetic
(length(bin(deg))-1, never float log2 — both engines compute it on
strings of bits, so there is no power-of-two precision cliff), floats
through round(x,9)+0.0, lineage cuts per round via
operators/graph.cut_lineage (reliable-checkpoint aware).

No counterpart in the pandas reference (reference scope is the MTM
loop, runner_mtm.py:71); this is the warehouse/graph surface the
build brief adds on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache_registry import persist_tracked
from .operators.graph import component_labels, community_labels, node_degrees
from .queries_r10b import _BASKET_CTES, _basket_pair_counts
from .queries_r14 import streamed_support_cut_edges
from .queries_r14b import LPA_ROUNDS, _communities_sql

#: min-label propagation rounds for the fixed-unroll components query.
#: Label must travel each component's min-node eccentricity: measured
#: 4 (sf0.001), 11 (sf0.01), 8 (sf0.1) rounds to fixpoint — 14 leaves
#: spare rounds everywhere; one extra round changing nothing is pinned
#: in tests/test_r15.py, and component_labels_converged is the
#: production iterate-to-fixpoint twin. The oracle unrolls the SAME 14.
COMP_ITERS = 14


def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B62: connected components of the co-purchase graph — "which
    items are reachable through ANY chain of co-purchases" (market
    segmentation at its coarsest; also the precompute that bounds
    every other graph kernel's work, since no computation crosses a
    component boundary). Kernel = operators/graph.component_labels —
    min-label propagation, one graph-sized join + min-aggregate +
    left join per round, lineage cut per round. Component id = the
    component's minimum part id (stable, interpretable). Output:
    (part, component) at COMP_ITERS rounds — converged at every test
    SF, oracle unrolls the same rounds."""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    edges = persist_tracked(pairs.select("part_a", "part_b"))
    return component_labels(edges, COMP_ITERS)


def _comp_round_sql(i: int) -> str:
    prev = f"c{i - 1}"
    return f"""
c{i} AS MATERIALIZED (
  SELECT l.node,
         least(l.label, coalesce(n.nbr_label, l.label)) AS label
  FROM {prev} l
  LEFT JOIN (
    SELECT e.dst AS node, min(s.label) AS nbr_label
    FROM e JOIN {prev} s ON e.src = s.node
    GROUP BY e.dst
  ) n ON n.node = l.node
)"""


def _components_sql() -> str:
    rounds = ",".join(_comp_round_sql(i) for i in range(1, COMP_ITERS + 1))
    return f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
c0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
{rounds}
SELECT CAST(node AS BIGINT) AS part, CAST(label AS BIGINT) AS component
FROM c{COMP_ITERS}
"""


def copurchase_communities_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B58b: ``copurchase_communities`` under ``readStream`` — the
    k-core stream twin's pattern (queries_r14.streamed_support_cut_edges:
    staged whole-order replay → additive batch_id-keyed pair partials
    → support-cut fold, no state store, retried batches recompute
    byte-identically) feeding the SAME LPA kernel, so the stream
    replay equals the batch B58 oracle exactly — including edges whose
    pair count only crosses the support cut across batch boundaries."""
    edges = streamed_support_cut_edges(spark, sf_dir, "lpa_stream")
    if edges is None:
        return spark.createDataFrame([], "part long, community long")
    return community_labels(edges, LPA_ROUNDS)


def copurchase_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B63: degree-distribution rollup of the co-purchase graph — the
    log2-bucket histogram beside B61's one-row profile: per bucket b
    (nodes with 2^b ≤ deg < 2^(b+1)), the node count, degree extrema,
    and the bucket's share of all nodes. This is the power-law
    dashboard: it tells you whether the hub caps (LINK_MAX_DEG, the
    LSH max_bucket convention) are load-bearing at the current scale.
    Bucket arithmetic is INTEGER-exact in both engines:
    length(bin(deg)) − 1 == floor(log2(deg)) for deg ≥ 1, computed on
    the bit string — float log2 would disagree between engines at
    exact powers of two. One aggregate over the graph-sized degree
    relation, one 1-row total cross-joined back (bounded scalar);
    share rounds to 9 dp. Output: (bucket, min_deg, max_deg, n_nodes,
    node_share) ordered implicitly by the driver's sorted compare."""
    from .queries_r8 import _r9

    _, pairs = _basket_pair_counts(spark, sf_dir)
    deg = node_degrees(pairs)
    hist = deg.groupBy(
        (F.length(F.bin(F.col("deg"))) - F.lit(1))
        .cast("int")
        .alias("bucket")
    ).agg(
        F.min("deg").cast("long").alias("min_deg"),
        F.max("deg").cast("long").alias("max_deg"),
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
    )
    total = deg.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    return hist.crossJoin(total).select(
        "bucket",
        "min_deg",
        "max_deg",
        "n_nodes",
        _r9(F.col("n_nodes").cast("double") / F.col("_total")).alias(
            "node_share"
        ),
    )


DEGREE_HISTOGRAM_SQL = f"""
WITH {_BASKET_CTES},
e AS (
  SELECT part_a AS src FROM pairs
  UNION ALL
  SELECT part_b AS src FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
hist AS (
  SELECT CAST(length(bin(deg)) - 1 AS INT) AS bucket,
         min(deg) AS min_deg, max(deg) AS max_deg,
         count(*) AS n_nodes
  FROM deg GROUP BY 1
),
t AS (SELECT count(*) AS total FROM deg)
SELECT bucket,
       CAST(min_deg AS BIGINT) AS min_deg,
       CAST(max_deg AS BIGINT) AS max_deg,
       CAST(n_nodes AS BIGINT) AS n_nodes,
       round(n_nodes * 1.0 / total, 9) + 0.0 AS node_share
FROM hist, t
"""


R15_QUERIES: dict = {
    "copurchase_components": copurchase_components,
    "copurchase_communities_stream": copurchase_communities_stream,
    "copurchase_degree_histogram": copurchase_degree_histogram,
}

R15_ORACLES: dict = {
    "copurchase_components": _components_sql(),
    # stream replay == batch: the staged whole-order replay folds to
    # the identical support-cut graph, so the B58 oracle applies
    "copurchase_communities_stream": _communities_sql(),
    "copurchase_degree_histogram": DEGREE_HISTOGRAM_SQL,
}
