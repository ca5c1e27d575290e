"""Round-16 batch: INCREMENTAL maintenance made first-class for the
two newest standing-index families — connected-components REFRESH by
component contraction over the co-purchase graph (the dedup
cc_refresh pattern generalized: the full recompute pays the graph's
propagation depth per batch even when the batch touches almost
nothing), and the corpus NOVELTY-SATURATION curve (the per-bucket
rollup of C72's first-seen relation — the "has this source stopped
adding new n-grams" dashboard a training-data pipeline reads before
scaling a source up).

House conventions: fixed/exact arithmetic mirrored by the DuckDB
oracle (integer bucket math — ``(id * NB) // (max + 1)`` on BIGINTs
in both engines, never float division), floats through
``round(x, 9) + 0.0``, the contraction refresh converges exactly so
its oracle is the SAME full-graph CC the live B62 uses, and bounded
scalars (max doc/order id) are the only ``collect`` sites.

No counterpart in the pandas reference (reference scope is the MTM
loop, runner_mtm.py:71); this is the warehouse/pipeline surface the
build brief adds on top of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .cache_registry import persist_tracked
from .queries_r10b import _BASKET_CTES, BASKET_MIN_SUP
from .queries_r15 import COMP_ITERS, NOVELTY_N, _components_sql
from .queries_r8 import _r9

#: every (l_orderkey % REFRESH_MOD == 0)-keyed order is the "new
#: batch" for the refresh split — whole ORDERS, never split orders
#: (the pair-count additivity contract, operators/graph.py partials)
REFRESH_MOD = 3

#: ingest-order buckets for the saturation curve (deciles)
SAT_BUCKETS = 10


def copurchase_components_refresh(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """B65: incremental CONNECTED-COMPONENTS maintenance — B62 made
    continual-ingest (VERDICT r15 item 6). Base corpus = orders with
    ``l_orderkey % REFRESH_MOD != 0``; the batch is the rest. The base
    graph's converged labels stand (in production: the persisted
    ``{table}_comp`` sidecar, operators/graph.write_component_labels);
    the batch folds its RAW pair partials with the base's, the support
    cut applies to the FOLDED counts (a sub-cut pair crossing the
    threshold is a legitimate new edge — counts only GROW under
    whole-order ingest, so edge ADDITION is the only delta), and the
    delta edges refresh the labels by component CONTRACTION
    (operators/graph.components_refresh): touched components collapse
    to their canonical, a batch-sized mini-CC relabels them, untouched
    components pass through a left join. Cost follows the BATCH, not
    the graph's propagation depth. The refresh is EXACT, so the oracle
    is the full-graph CC itself (B62's oracle, same COMP_ITERS
    unroll); the persisted-index probe twin is timed as
    ``index_probe_components`` in bench.py."""
    from .operators.graph import (
        baskets_from_items,
        components_refresh,
        component_labels_converged,
        pairs_from_baskets,
    )
    from .sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    base_raw = persist_tracked(
        pairs_from_baskets(
            baskets_from_items(
                li.filter(F.col("l_orderkey") % REFRESH_MOD != 0)
            )
        )
    )
    batch_raw = pairs_from_baskets(
        baskets_from_items(li.filter(F.col("l_orderkey") % REFRESH_MOD == 0))
    )
    base_edges = persist_tracked(
        base_raw.filter(F.col("pair_cnt") >= BASKET_MIN_SUP).select(
            "part_a", "part_b"
        )
    )
    labels = component_labels_converged(base_edges)
    folded = (
        base_raw.unionByName(batch_raw)
        .groupBy("part_a", "part_b")
        .agg(F.sum("pair_cnt").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= BASKET_MIN_SUP)
        .select("part_a", "part_b")
    )
    delta = folded.join(base_edges, ["part_a", "part_b"], "left_anti")
    return components_refresh(labels, delta)


def novelty_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C73: corpus n-gram SATURATION curve — the source-level rollup
    of C72's first-seen relation: bucket the corpus into SAT_BUCKETS
    ingest-order deciles (doc_id order = ingest order, the C72
    contract) and report, per bucket, how many n-grams the corpus saw
    there FIRST, cumulatively, and as a share of all distinct grams.
    A flattening curve is the stop signal: more of this source buys
    repetition, not diversity — the question asked per source before
    scaling its crawl share up, and the corpus-level complement of
    C72's per-doc score. Scale shape: the first-seen relation is ONE
    corpus shingle pass (operators/novelty.first_seen_partial — the
    same relation the standing index persists, so in production this
    whole query is an index-sized aggregate over the compacted
    partials, zero corpus bytes); bucket math is integer-exact on
    BIGINTs in both engines; the cumulative window runs over
    SAT_BUCKETS rows. Output: (bucket, n_docs, n_first_seen,
    cum_first_seen, cum_share)."""
    from .operators.novelty import first_seen_partial
    from .queries_pipeline import _docs

    d = _docs(spark, sf_dir)
    max_id = d.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    span = int(max_id) + 1  # bounded scalar: ids are 0-based ingest order

    def bucket_of(c: str):
        # INTEGER division on BIGINTs (Spark SQL `div`), mirroring the
        # oracle's `//` — float division would disagree at bucket edges
        return F.expr(
            f"CAST((CAST({c} AS BIGINT) * {SAT_BUCKETS}) DIV {span} "
            "AS BIGINT)"
        )
    fb = (
        first_seen_partial(d, NOVELTY_N)
        .select(bucket_of("first_seen").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_first_seen"))
    )
    db = (
        d.select(bucket_of("doc_id").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    nfs = F.coalesce(F.col("n_first_seen"), F.lit(0)).cast("long")
    cum = F.sum(nfs).over(w)
    tot = F.sum(nfs).over(wall)
    return (
        db.join(fb, "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_docs"),
            nfs.alias("n_first_seen"),
            cum.cast("long").alias("cum_first_seen"),
            _r9(
                F.when(tot > 0, cum.cast("double") / tot.cast("double"))
                .otherwise(F.lit(0.0))
            ).alias("cum_share"),
        )
    )


COMPONENTS_REFRESH_SQL = _components_sql()

NOVELTY_SATURATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
),
grams AS (
  SELECT doc_id, u.g AS ngram
  FROM toks, UNNEST(
    CASE WHEN len(t) >= {NOVELTY_N}
         THEN list_transform(range(1, len(t) - {NOVELTY_N} + 2),
                             i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
         ELSE [] END) AS u(g)
),
dg AS (SELECT DISTINCT doc_id, ngram FROM grams),
first AS (SELECT ngram, min(doc_id) AS first_seen FROM dg GROUP BY 1),
mx AS (SELECT max(doc_id) + 1 AS span FROM documents),
fb AS (
  SELECT (first_seen * {SAT_BUCKETS}) // span AS bucket,
         count(*) AS n_first_seen
  FROM first, mx GROUP BY 1
),
db AS (
  SELECT (doc_id * {SAT_BUCKETS}) // span AS bucket, count(*) AS n_docs
  FROM documents, mx GROUP BY 1
)
SELECT CAST(db.bucket AS BIGINT) AS bucket,
       CAST(db.n_docs AS BIGINT) AS n_docs,
       CAST(coalesce(fb.n_first_seen, 0) AS BIGINT) AS n_first_seen,
       CAST(sum(coalesce(fb.n_first_seen, 0))
              OVER (ORDER BY db.bucket) AS BIGINT) AS cum_first_seen,
       round(CASE WHEN sum(coalesce(fb.n_first_seen, 0)) OVER () > 0
                  THEN sum(coalesce(fb.n_first_seen, 0))
                         OVER (ORDER BY db.bucket) * 1.0
                       / sum(coalesce(fb.n_first_seen, 0)) OVER ()
                  ELSE 0.0 END, 9) + 0.0 AS cum_share
FROM db LEFT JOIN fb ON fb.bucket = db.bucket
"""


R16_QUERIES: dict = {
    "copurchase_components_refresh": copurchase_components_refresh,
    "novelty_saturation": novelty_saturation,
}

R16_ORACLES: dict = {
    # the refresh is exact, so the full-graph B62 oracle applies
    # verbatim (same COMP_ITERS unroll, converged at every test SF)
    "copurchase_components_refresh": COMPONENTS_REFRESH_SQL,
    "novelty_saturation": NOVELTY_SATURATION_SQL,
}
