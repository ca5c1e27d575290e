"""Round-14 batch: k-core decomposition over the co-purchase graph —
the graph family's FOURTH classic (CC label propagation r10, weighted
PageRank r10, oriented triangle counting r13, and now the cohesion
screen every production graph stack ships: "which items sit in a
densely cross-sold region" is a k-core question, as is trimming a
graph before community detection or embedding training).

House conventions: one logical plan per query, every fixed-point loop
mirrored EXACTLY (same round count) by the DuckDB oracle so
engine/oracle equality holds even mid-convergence, convergence itself
pinned separately (tests/test_r14.py), floats through round(x,9)+0.0
(k-core emits only BIGINTs — hash-safe by construction).

No counterpart in the pandas reference (reference scope is the MTM
loop, runner_mtm.py:71); this is the warehouse/graph surface the
build brief adds on top of it.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cache_registry import persist_tracked, tracked_mkdtemp
from .operators.graph import (
    baskets_from_items,
    kcore_members,
    pairs_from_baskets,
)
from .queries_r10b import _BASKET_CTES, BASKET_MIN_SUP, _basket_pair_counts

#: the core order: k=2 prunes the tree-like fringe (leaf chains peel
#: away round by round) while keeping every cycle-supported region —
#: discriminating at all test SFs (sf0.001: the dense graph survives
#: whole; sf0.01: 1535 of 1880 nodes; sf0.1: 3 of 5922 — the
#: support-cut graph gets relatively sparser as orders spread over
#: more parts)
KCORE_K = 2

#: simultaneous-peel rounds. Peel DEPTH measured across the test SFs
#: is ≤5 (sf0.1 the deepest); 8 leaves spare rounds so the fixed
#: unroll is converged everywhere — one extra round changing nothing
#: is pinned in tests/test_r14.py. The oracle unrolls the SAME 8.
KCORE_PEELS = 8


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56: k-core membership of the co-purchase graph (nodes = parts,
    edges = B43's support-cut pairs), with each member's in-core
    degree. Kernel = operators/graph.kcore_members (iterated
    simultaneous peeling, two semi-joins + one aggregate per round,
    per-round persists per the CC convention) — SHARED with the
    standing-edge-index probe ``kcore_from_index``, so live/probe
    parity is structural (pinned in tests/test_scale_patterns.py).
    Scale: every round's work is GRAPH-sized (the support cut keeps
    edges output-sized), rounds = peel depth (small in practice, 8
    fixed here), and nothing is ever collected driver-side.
    (Optimization r16 note: the converged twin measured SLOWER here —
    6.1 s vs 5.1 s at sf0.1 — because the per-round survivor count
    jobs outweigh the ~2 saved peel rounds at this depth, so the
    fixed unroll deliberately stays.)"""
    _, pairs = _basket_pair_counts(spark, sf_dir)
    edges = persist_tracked(pairs.select("part_a", "part_b"))
    return kcore_members(edges, KCORE_K, KCORE_PEELS)


def _kcore_round_sql(i: int) -> str:
    prev = "a0" if i == 1 else f"a{i - 1}"
    return f"""
a{i} AS MATERIALIZED (
  SELECT e.src, count(*) AS core_deg
  FROM e
  JOIN {prev} s ON e.src = s.src
  JOIN {prev} d ON e.dst = d.src
  GROUP BY e.src
  HAVING count(*) >= {KCORE_K}
)"""


def _kcore_sql() -> str:
    rounds = ",".join(_kcore_round_sql(i) for i in range(1, KCORE_PEELS + 1))
    return f"""
WITH {_BASKET_CTES},
e AS MATERIALIZED (
  SELECT part_a AS src, part_b AS dst FROM pairs
  UNION ALL
  SELECT part_b AS src, part_a AS dst FROM pairs
),
a0 AS (SELECT DISTINCT src FROM e),
{rounds}
SELECT CAST(src AS BIGINT) AS part, CAST(core_deg AS BIGINT) AS core_deg
FROM a{KCORE_PEELS}
"""


#: replay micro-batches for the staged whole-order stream
KCORE_STREAM_BATCHES = 3


def _staged_order_stream(spark: SparkSession, items: DataFrame, prefix: str):
    """Stage (l_orderkey, l_partkey) as a finite WHOLE-ORDER replay:
    slice = l_orderkey % KCORE_STREAM_BATCHES keeps every order's rows
    inside ONE slice — the additivity contract the edge-partials
    ingest rests on (pair generation never crosses an order boundary)
    — with one file per slice via repartition-on-slice + partitionBy
    (the _staged_perm_stream convention; shared replay plumbing in
    queries_r13._slice_replay_stream). LOCAL-FS BY DESIGN: this is the
    oracle-side replay harness; the production-path per-batch writes
    below go through Spark's Hadoop FS and are portable."""
    from .queries_r13 import _slice_replay_stream

    root = tracked_mkdtemp(prefix)
    part_root = _os.path.join(root, "slices")
    stream_dir = _os.path.join(root, "stream")
    _os.makedirs(stream_dir)
    (
        items.withColumn(
            "slice",
            (F.col("l_orderkey") % KCORE_STREAM_BATCHES).cast("int"),
        )
        .repartition(KCORE_STREAM_BATCHES, F.col("slice"))
        .write.partitionBy("slice")
        .mode("overwrite")
        .parquet(part_root)
    )
    return _slice_replay_stream(
        spark,
        part_root,
        stream_dir,
        KCORE_STREAM_BATCHES,
        "l_orderkey long, l_partkey long",
    )


def kcore_stream_batch(parts_root: str):
    """The foreachBatch edge-partials appender: per micro-batch, ONE
    basket aggregate + the row-local pair kernel, written to a
    batch_id-derived path — ``overwrite`` by batch_id means a RETRIED
    batch recomputes byte-identical partials instead of double-
    counting (the C67 exactly-once convention; retry idempotence
    pinned in tests/test_r14.py). No state store, no cross-batch
    state at all: additivity is carried by the data layout."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        pairs_from_baskets(baskets_from_items(batch_df)).write.mode(
            "overwrite"
        ).parquet(_os.path.join(parts_root, f"b{batch_id:05d}"))

    return _fn


def streamed_support_cut_edges(
    spark: SparkSession, sf_dir: str, prefix: str
) -> DataFrame | None:
    """Shared stream-twin front half (B56b, and the r15 communities
    twin): replay lineitem as a staged WHOLE-ORDER stream, append each
    micro-batch's raw pair-count partials via the foreachBatch handler
    (additive across batches — the write_edge_partials property; a
    retried batch overwrites its batch_id-derived path byte-identical,
    the C67 exactly-once convention), then FOLD: sum the partials and
    apply the support cut over all generations — so pairs whose count
    only crosses the cut across batch boundaries are correctly edges.
    Returns the folded (part_a, part_b, pair_cnt) support-cut relation,
    or None when the staging produced no files (empty input). Any
    graph kernel downstream of this sees the IDENTICAL edge relation
    the batch queries build, which is why each stream twin shares its
    batch oracle."""
    from .sources import load_table
    from .streaming import await_or_raise

    items = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_partkey").cast("long").alias("l_partkey"),
    )
    stream, n_files = _staged_order_stream(spark, items, f"{prefix}_")
    if stream is None:
        return None

    base = tracked_mkdtemp(f"{prefix}_out_")
    parts_root = _os.path.join(base, "pair_partials")
    _os.makedirs(parts_root)
    q = (
        stream.writeStream.foreachBatch(kcore_stream_batch(parts_root))
        .trigger(availableNow=True)
        .option("checkpointLocation", _os.path.join(base, "ckpt"))
        .start()
    )
    await_or_raise(q)
    return (
        spark.read.schema("part_a long, part_b long, pair_cnt long")
        .option("recursiveFileLookup", "true")
        .parquet(parts_root)
        .groupBy("part_a", "part_b")
        .agg(F.sum("pair_cnt").cast("long").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= BASKET_MIN_SUP)
    )


def copurchase_kcore_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56b: ``copurchase_kcore`` under ``readStream`` — continual
    order ingest maintains the co-purchase graph WITHOUT re-scanning
    history. Front half = :func:`streamed_support_cut_edges` (staged
    whole-order replay → additive pair partials → support-cut fold);
    the folded edges feed the SAME peeling kernel, so the stream
    replay equals the batch B56 oracle exactly."""
    edges = streamed_support_cut_edges(spark, sf_dir, "kcore_stream")
    if edges is None:
        return spark.createDataFrame([], "part long, core_deg long")
    return kcore_members(edges, KCORE_K, KCORE_PEELS)


#: neighbors reported per part by the item-item similarity query
SIMILAR_TOPK = 3


def copurchase_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B57: item-item top-k similarity over the co-purchase graph —
    THE classic recommender precompute ("customers who bought X also
    bought Y", the item-item k-NN graph collaborative filtering
    serves from). Similarity = basket Jaccard, computed entirely from
    relations the B43 chain already produces: for a support-cut pair,
    J(a,b) = pair_cnt / (sup_a + sup_b − pair_cnt) — no new corpus
    scan, no all-pairs work (candidates ARE the support-cut edges;
    sub-support pairs are definitionally below any useful similarity
    floor). Output: (part, neighbor, jaccard, rank ≤ SIMILAR_TOPK).

    Kernel = operators/graph.topk_similar (symmetrize + two per-part
    joins — no broadcast hints, the per-part support relation is
    SF-scaling, the bounded-dims-only convention; AQE decides — + one
    part-partitioned top-k window, 9-dp round BEFORE the rank, id
    tiebreak = bit-stable rank order across engines) — SHARED with the
    standing-edge-index probe ``topk_similar_from_index`` (which reads
    the index's persisted ``sup`` sidecar column instead of
    re-deriving support here), so live/probe parity is structural
    (pinned in tests/test_scale_patterns.py)."""
    from .operators.graph import topk_similar

    baskets, pairs = _basket_pair_counts(spark, sf_dir)
    return topk_similar(pairs, basket_support(baskets), SIMILAR_TOPK)


def basket_support(baskets: DataFrame) -> DataFrame:
    """(pk, sup) — per-part basket support (#baskets containing the
    part) from the per-order distinct item sets: one explode + one
    aggregate. The relation the item-item Jaccard denominators need
    and the edge index persists as its ``sup`` sidecar column
    (write_edge_index ``sup=`` — support counts baskets, not surviving
    pairs, so it is NOT derivable from the degree relation)."""
    return (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("sup"))
    )


COPURCHASE_TOPK_SIMILAR_SQL = f"""
WITH {_BASKET_CTES},
sup AS (SELECT l_partkey AS pk, count(*) AS sup FROM op GROUP BY 1),
sym AS (
  SELECT part_a AS part, part_b AS neighbor, pair_cnt FROM pairs
  UNION ALL
  SELECT part_b AS part, part_a AS neighbor, pair_cnt FROM pairs
),
j AS (
  SELECT s.part, s.neighbor,
         round(s.pair_cnt * 1.0 / (sa.sup + sb.sup - s.pair_cnt), 9) + 0.0
           AS jaccard
  FROM sym s
  JOIN sup sa ON sa.pk = s.part
  JOIN sup sb ON sb.pk = s.neighbor
),
r AS (
  SELECT part, neighbor, jaccard,
         CAST(row_number() OVER (PARTITION BY part
                                 ORDER BY jaccard DESC, neighbor) AS INT)
           AS rank
  FROM j
)
SELECT CAST(part AS BIGINT) AS part, CAST(neighbor AS BIGINT) AS neighbor,
       jaccard, rank
FROM r WHERE rank <= {SIMILAR_TOPK}
"""


R14_QUERIES: dict = {
    "copurchase_kcore": copurchase_kcore,
    "copurchase_kcore_stream": copurchase_kcore_stream,
    "copurchase_topk_similar": copurchase_topk_similar,
}

R14_ORACLES: dict = {
    "copurchase_kcore": _kcore_sql(),
    # stream replay == batch: the staged whole-order replay folds to
    # the identical support-cut graph, so the B56 oracle applies
    "copurchase_kcore_stream": _kcore_sql(),
    "copurchase_topk_similar": COPURCHASE_TOPK_SIMILAR_SQL,
}
