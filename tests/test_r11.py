"""Round-11 pins (B48-B52, the adapted TPC-H completion): invariants
the auto-parametrized oracle harness can't express — the correlated-min
join-back really picks per-part minima, the Q11 global cut really binds,
Q12's lateness predicate semantics, Q16's supplier blocklist exclusion,
Q20's dominance share — plus plan pins on the broadcast/pushdown shapes
the docstrings claim.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark.queries import ALL_QUERIES
from tradesignal_mtm_runner_spark.queries_r11 import (
    Q11_FRAC,
    Q11_NATION,
    Q12_LATE_DAYS,
    Q12_YEAR,
    Q16_EXCL_BRAND,
    Q16_SIZES,
    Q20_NATION,
    Q20_PART_PREFIX,
    Q20_SHARE,
    Q20_YEAR,
    SAMPLE_K,
)
from tradesignal_mtm_runner_spark.sources import load_table


SF_MID = "/root/testdata/sf0.01"


def _df(spark, name, sf=SF_SMOKE):
    return ALL_QUERIES[name](spark, sf)


def _plan(spark, name, sf=SF_SMOKE):
    return _df(spark, name, sf)._jdf.queryExecution().executedPlan().toString()


# --- B48 q2 --------------------------------------------------------------------


def test_q2_rows_are_per_part_minima(spark):
    """Every reported (part, supplier) row carries that part's MINIMUM
    regional supply cost — no row's cost exceeds another row's cost for
    the same part, and every qualifying part appears at least once."""
    rows = _df(spark, "q2_min_cost_supplier").collect()
    assert rows
    by_part = defaultdict(list)
    for r in rows:
        by_part[r["p_partkey"]].append(r["supply_cost"])
    for pk, costs in by_part.items():
        assert max(costs) == min(costs), (pk, costs)


def test_q2_broadcasts_the_dims(spark):
    """nation/region ride as broadcast joins (bounded dims); the
    lineitem aggregate is never on the broadcast side."""
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "BroadcastHashJoin" in plan


# --- B49 q11 -------------------------------------------------------------------


def test_q11_global_cut_binds(spark):
    """Every surviving part clears the fraction-of-total cut, and the
    cut is not vacuous (some parts from the nation slice were dropped).
    Runs at sf0.01: the sf0.001 supplier draw covers only ~10 of the 25
    nations, so the target nation's slice can be legitimately empty
    there (the oracle harness still covers sf0.001 — both engines agree
    on the empty result)."""
    out = {
        r["l_partkey"]: r["value"]
        for r in _df(spark, "q11_important_parts", SF_MID).collect()
    }
    nat = (
        load_table(spark, SF_MID, "lineitem")
        .join(
            load_table(spark, SF_MID, "supplier").join(
                load_table(spark, SF_MID, "nation").filter(
                    F.col("n_name") == Q11_NATION
                ),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("v"))
        .collect()
    )
    total = sum(r["v"] for r in nat)
    survivors = {r["l_partkey"] for r in nat if r["v"] > Q11_FRAC * total}
    assert set(out) == survivors
    if nat:
        assert survivors, "nation slice present but nothing survived"
        assert len(survivors) < len(nat), "cut is vacuous at this SF"


# --- B50 q12 -------------------------------------------------------------------


def test_q12_counts_partition_the_late_slice(spark):
    """high + low per flag == the late-lineitem count per flag computed
    independently; only the target year contributes."""
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in _df(spark, "q12_late_priority").collect()
    }
    assert got
    li = load_table(spark, SF_SMOKE, "lineitem").filter(
        F.year("l_shipdate") == Q12_YEAR
    )
    o = load_table(spark, SF_SMOKE, "orders")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q12_LATE_DAYS
        )
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    want = {r["l_returnflag"]: r["count"] for r in late}
    assert {k: h + l for k, (h, l) in got.items()} == want


# --- B51 q16 -------------------------------------------------------------------


def test_q16_excludes_blocklisted_suppliers_and_brand(spark):
    """No group reports the excluded brand or a size outside the IN
    list, and recomputing one group's count WITH blocklisted suppliers
    included strictly exceeds the reported count somewhere (the
    exclusion is not vacuous at sf0.01 — sf0.001 has no negative-balance
    suppliers at all)."""
    rows = _df(spark, "q16_supplier_counts", SF_MID).collect()
    assert rows
    for r in rows:
        assert r["p_brand"] != Q16_EXCL_BRAND
        assert r["p_size"] in Q16_SIZES
    li = load_table(spark, SF_MID, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, SF_MID, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND) & (F.col("p_size").isin(*Q16_SIZES))
    )
    unfiltered = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("cnt"))
        .collect()
    )
    want = {(r["p_brand"], r["p_type"], r["p_size"]): r["cnt"] for r in unfiltered}
    got = {(r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"] for r in rows}
    assert all(got[k] <= want[k] for k in got)
    assert any(got[k] < want[k] for k in got), "blocklist vacuous at this SF"


# --- B52 q20 -------------------------------------------------------------------


def test_q20_dominance_share_semantics(spark):
    """Every reported supplier really shipped > SHARE of some
    qualifying part's year total, and suppliers outside the nation
    never appear."""
    rows = _df(spark, "q20_excess_suppliers", SF_MID).collect()
    nat_supp = {
        r["s_suppkey"]
        for r in load_table(spark, SF_MID, "supplier")
        .join(
            load_table(spark, SF_MID, "nation").filter(
                F.col("n_name") == Q20_NATION
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .collect()
    }
    assert {r["s_suppkey"] for r in rows} <= nat_supp
    yr = (
        load_table(spark, SF_MID, "lineitem")
        .filter(F.year("l_shipdate") == Q20_YEAR)
        .join(
            load_table(spark, SF_MID, "part")
            .filter(F.col("p_name").startswith(Q20_PART_PREFIX))
            .select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    )
    per_part = defaultdict(float)
    for r in yr:
        per_part[r["l_partkey"]] += r["q"]
    dominant = {
        r["l_suppkey"] for r in yr if r["q"] > Q20_SHARE * per_part[r["l_partkey"]]
    }
    assert {r["s_suppkey"] for r in rows} == (dominant & nat_supp)


def test_q20_year_filter_pushed_to_scan(spark):
    """The year predicate reaches the lineitem parquet scan as a
    pushed filter (partition-prunable shape at scale)."""
    plan = _plan(spark, "q20_excess_suppliers")
    assert "PushedFilters" in plan and "l_shipdate" in plan


# --- C64 corpus shuffle shards ---------------------------------------------------


def test_shuffle_shards_is_a_bijection_with_uniform_shards(spark):
    """Every doc appears exactly once; (shard, shard_pos) is a
    bijection onto contiguous positions per shard; shard sizes are
    within 2x of each other (affine permutation -> near-uniform)."""
    rows = _df(spark, "corpus_shuffle_shards").collect()
    docs = [r["doc_id"] for r in rows]
    assert len(docs) == len(set(docs))
    per_shard = defaultdict(list)
    for r in rows:
        per_shard[r["shard"]].append(r["shard_pos"])
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    sizes = [len(v) for v in per_shard.values()]
    assert max(sizes) <= 2 * min(sizes), sizes


def test_shuffle_shards_actually_shuffles(spark):
    """The induced global order (shard, shard_pos) is not the identity
    order of doc_id — consecutive output positions are mostly
    non-consecutive doc_ids."""
    rows = sorted(
        _df(spark, "corpus_shuffle_shards").collect(),
        key=lambda r: (r["shard"], r["shard_pos"]),
    )
    consecutive = sum(
        1 for a, b in zip(rows, rows[1:]) if b["doc_id"] == a["doc_id"] + 1
    )
    assert consecutive < len(rows) / 10


def test_perm_bijective_above_2_31_and_engine_identical(spark):
    """VERDICT r11 item 5: the production parameterization (P=2^35-31,
    2^27-sized A) must keep the permutation a BIJECTION on real 64-bit
    id domains — the old 31-bit P silently folded ids >= 2^31-1. Pin on
    an id domain well above 2^31 (around 9e9, the sf1 replica-offset
    magnitude, plus the P-1 edge): distinct perms == distinct ids, no
    int64 overflow, and DuckDB computes bit-identical perms from the
    same constants."""
    import duckdb

    from tradesignal_mtm_runner_spark.queries_r11 import (
        PERM_A,
        PERM_B,
        PERM_P,
        _perm,
    )

    ids = (
        [2**31 - 2, 2**31 - 1, 2**31, 2**31 + 1]
        + [9_000_000_000 + 7 * i for i in range(500)]
        + [PERM_P - 2, PERM_P - 1]
    )
    assert max(ids) < PERM_P  # the domain the bijection claim covers
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["perm"]
        for r in sdf.select(
            "doc_id", _perm(F.col("doc_id")).alias("perm")
        ).collect()
    }
    assert len(set(got.values())) == len(ids)  # injective on the domain
    expected = {
        i: (PERM_A * (i % PERM_P) + PERM_B) % PERM_P for i in ids
    }  # python ints never overflow — the ground truth
    assert got == expected
    duck = duckdb.connect()
    oracle = dict(
        duck.execute(
            f"SELECT i, ({PERM_A} * (i % {PERM_P}) + {PERM_B}) % {PERM_P} "
            "FROM (SELECT unnest(?) AS i)",
            [ids],
        ).fetchall()
    )
    assert oracle == expected


# --- C65 corpus weighted sample --------------------------------------------------


def test_weighted_sample_k_per_source_and_determinism(spark):
    """At most SAMPLE_K docs per source, ranks contiguous from 1, and
    a second invocation returns the identical set (deterministic — no
    RNG service anywhere)."""
    rows = _df(spark, "corpus_weighted_sample").collect()
    assert rows
    per_src = defaultdict(list)
    for r in rows:
        per_src[r["source"]].append(r["rk"])
    for src, rks in per_src.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), src
        assert len(rks) <= SAMPLE_K
    again = {(r["doc_id"], r["rk"]) for r in _df(spark, "corpus_weighted_sample").collect()}
    assert again == {(r["doc_id"], r["rk"]) for r in rows}


def test_weighted_sample_prefers_heavier_docs(spark):
    """Size-proportional inclusion: the sampled docs' mean n_chars
    exceeds the corpus mean (weight = n_chars, so heavier docs must be
    overrepresented)."""
    sampled = _df(spark, "corpus_weighted_sample").collect()
    corpus = load_table(spark, SF_SMOKE, "documents").select("n_chars").collect()
    mean_s = sum(r["weight"] for r in sampled) / len(sampled)
    mean_c = sum(r["n_chars"] for r in corpus) / len(corpus)
    assert mean_s > mean_c


# --- B53 RFM segmentation --------------------------------------------------------


def test_rfm_scores_in_range_and_monotone(spark):
    """Every score is in 1..4, the segment string matches its scores,
    and scores are monotone in their metric: sorting users by a metric
    never decreases that metric's score."""
    rows = _df(spark, "user_rfm_segments").collect()
    assert rows
    for r in rows:
        for s in (r["r_staleness"], r["f_score"], r["m_score"]):
            assert 1 <= s <= 4
        assert r["segment"] == f"R{r['r_staleness']}F{r['f_score']}M{r['m_score']}"
    for metric, score in [
        ("recency_days", "r_staleness"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ]:
        ordered = sorted(rows, key=lambda r: r[metric])
        scores = [r[score] for r in ordered]
        assert scores == sorted(scores), metric
    # the quartile cut actually splits the population somewhere
    assert len({r["f_score"] for r in rows}) > 1


def test_rfm_bucketed_thresholds_track_exact_quartiles(spark):
    """VERDICT r11 scale fix: the monetary thresholds are quartiles of
    the RFM_MONETARY_DP-gridded metric (domain-bounded exact-percentile
    buffer) instead of the raw 9-dp sums (distinct ≈ users). Rounding
    moves every sample point by at most half a grid step, and quantiles
    are 1-Lipschitz under pointwise perturbation — pin that each
    bucketed quartile sits within step/2 of the exact one."""
    from tradesignal_mtm_runner_spark.queries_r11 import (
        RFM_MONETARY_DP,
        RFM_QS,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("monetary")
    )
    step = 10.0 ** (-RFM_MONETARY_DP)
    for q in RFM_QS:
        exact, bucketed = per_user.agg(
            F.percentile(F.col("monetary"), F.lit(q)),
            F.percentile(
                F.round(F.col("monetary"), RFM_MONETARY_DP), F.lit(q)
            ),
        ).first()
        assert abs(exact - bucketed) <= step / 2 + 1e-9, q


def test_rfm_percentile_inputs_are_domain_bounded():
    """Grep pin (VERDICT r11 'Done =' criterion): no exact percentile
    over an SF-scaling-distinct input — every threshold percentile in
    the RFM query routes through the bounded-distinct _th_input
    bucketing."""
    import pathlib

    import tradesignal_mtm_runner_spark.queries_r11 as mod

    src = pathlib.Path(mod.__file__).read_text()
    assert "F.percentile(_th_input(m)" in src
    assert "F.percentile(F.col(m)" not in src


# --- B54 seasonality profile ------------------------------------------------------


def test_seasonality_shares_and_z_are_coherent(spark):
    """Per event type: shares sum to 1, the z-scores average to ~0
    (population standardization), dow/hour stay on the 0-based grid,
    and seasonality_index == share * 168."""
    from collections import defaultdict

    rows = _df(spark, "events_seasonality").collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        assert 0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23
        assert abs(r["seasonality_index"] - r["share"] * 168.0) < 1e-6
        by_type[r["event_type"]].append(r)
    for t, rs in by_type.items():
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-6, t
        assert abs(sum(r["z"] for r in rs) / len(rs)) < 1e-6, t
