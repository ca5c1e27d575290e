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

from pyspark.sql import DataFrame, SparkSession

from .cache_registry import persist_tracked
from .operators.graph import kcore_members
from .queries_r10b import _BASKET_CTES, _basket_pair_counts

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
    fixed here), and nothing is ever collected driver-side."""
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


R14_QUERIES: dict = {
    "copurchase_kcore": copurchase_kcore,
}

R14_ORACLES: dict = {
    "copurchase_kcore": _kcore_sql(),
}
