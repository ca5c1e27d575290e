"""Round-10 second-batch pins (B43-B47): invariants the
auto-parametrized oracle harness can't express — pair-mining support
cuts and lift algebra, PageRank mass conservation, Markov row
normalization, MAD score semantics, and the DQ audit's rule algebra.
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark.queries import ALL_QUERIES
from tradesignal_mtm_runner_spark.queries_r10b import (
    ANOM_MAD_FLOOR,
    ANOM_THRESH,
    BASKET_MIN_SUP,
    PR_ITERS,
)

SF_MID = "/root/testdata/sf0.01"


def _df(spark, name, sf=SF_SMOKE):
    return ALL_QUERIES[name](spark, sf)


# --- B43 basket pairs ---------------------------------------------------------


def test_basket_pairs_support_cut_and_lift_algebra(spark):
    """Every reported pair is canonical (a < b), above the support
    cut, and its lift is algebraically consistent with its own
    support/sup columns: lift = pair_cnt * n / (sup_a * sup_b) where
    n = pair_cnt / support."""
    rows = _df(spark, "basket_pairs").collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["pair_cnt"] >= BASKET_MIN_SUP
        assert 0 < r["support"] <= 1
        n = r["pair_cnt"] / r["support"]
        want = r["pair_cnt"] * n / (r["sup_a"] * r["sup_b"])
        assert math.isclose(r["lift"], want, rel_tol=1e-6), r


def test_basket_pairs_no_lineitem_self_join(spark):
    """The pair generator must be the one-shuffle explode plan, never
    a lineitem x lineitem join: the physical plan contains no
    SortMergeJoin/ShuffledHashJoin at all (the only joins are
    broadcast of the dimension-sized support/total relations)."""
    plan = _df(spark, "basket_pairs")._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


# --- B44 co-purchase PageRank -------------------------------------------------


def test_pagerank_mass_conservation(spark):
    """With a symmetric graph (no dangling nodes) total rank mass is
    conserved at 1.0 up to the per-iteration 9-dp rounding: the sum
    over N nodes can drift by at most N * 5e-10 per iteration."""
    rows = _df(spark, "copurchase_pagerank", SF_MID).collect()
    assert rows
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    tol = n * 5e-10 * (PR_ITERS + 1)
    assert abs(total - 1.0) <= tol, (total, n)
    assert all(r["pagerank"] > 0 for r in rows)


def test_pagerank_differentiates_nodes(spark):
    """The fixed point must not be the uniform vector (the graph is
    irregular): at least two distinct rank values, and the top node's
    rank strictly above the uniform 1/N."""
    rows = _df(spark, "copurchase_pagerank", SF_MID).collect()
    ranks = sorted(r["pagerank"] for r in rows)
    assert ranks[0] < ranks[-1]
    assert ranks[-1] > 1.0 / len(rows)


# --- B45 Markov transition matrix --------------------------------------------


def test_transition_rows_normalize(spark):
    """Per prev_type the transition probabilities sum to 1 (up to
    9-dp rounding x fanout) and the matrix is at most |types|^2."""
    rows = _df(spark, "user_transition_matrix", SF_MID).collect()
    assert rows
    by_prev: dict = {}
    types = set()
    for r in rows:
        types.add(r["prev_type"])
        types.add(r["next_type"])
        by_prev.setdefault(r["prev_type"], []).append(r["p"])
        assert r["cnt"] > 0
    assert len(rows) <= len(types) ** 2
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) <= 5e-9 * len(ps), prev


# --- B46 MAD anomaly screen ---------------------------------------------------


def test_anomaly_mad_score_semantics(spark):
    """score = |cnt - med| / max(mad, floor) for every (type, day)
    cell, is_anomaly <=> score > threshold, and the output covers
    every daily cell exactly once (the screen reports all cells, not
    just the flagged ones)."""
    rows = _df(spark, "events_anomaly_mad", SF_MID).collect()
    assert rows
    seen = set()
    for r in rows:
        key = (r["event_type"], r["day"])
        assert key not in seen
        seen.add(key)
        want = abs(r["cnt"] - r["med"]) / max(r["mad"], ANOM_MAD_FLOOR)
        assert math.isclose(r["score"], want, rel_tol=1e-6, abs_tol=1e-9), r
        assert r["is_anomaly"] == (r["score"] > ANOM_THRESH), r
        assert r["mad"] >= 0 and r["score"] >= 0


# --- B47 DQ audit -------------------------------------------------------------


def test_dq_audit_rule_algebra(spark):
    """Exactly the eight declared rules, each with violations <=
    checked and fail_rate = violations/checked; the referential rules
    are clean on the synthetic star schema while the duplicate
    line-key rule actually FIRES (the generator reuses
    (l_orderkey, l_linenumber) pairs) — i.e. the audit detects a real
    property of the data, it is not a tautology."""
    rows = {r["rule"]: r for r in _df(spark, "dq_audit", SF_MID).collect()}
    assert len(rows) == 8
    for r in rows.values():
        assert 0 <= r["violations"] <= r["checked"], r
        assert math.isclose(
            r["fail_rate"], r["violations"] / r["checked"], abs_tol=1e-9
        ), r
    assert rows["lineitem_orderkey_in_orders"]["violations"] == 0
    assert rows["orders_custkey_in_customer"]["violations"] == 0
    assert rows["lineitem_unique_line_key"]["violations"] > 0
