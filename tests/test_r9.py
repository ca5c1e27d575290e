"""Round-9 pins for the round-8/9 query surface (VERDICT r8 item 3):
plan-shape and invariant tests the auto-parametrized oracle harness
can't express — SCD2 interval coherence, PCA bounded-model plan +
variance floor, BM25 hint budget, RRF recall floors, planted
boilerplate reachability, and the approx-profile tolerance pin."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark import plans as P
from tradesignal_mtm_runner_spark.queries import ALL_QUERIES

SF_MID = "/root/testdata/sf0.01"


def _df(spark, name, sf=SF_SMOKE):
    return ALL_QUERIES[name](spark, sf)


# --- B40 SCD2 interval coherence --------------------------------------------


def test_scd2_interval_coherence(spark):
    """The SCD2 layout's defining invariants: every closed interval is
    strictly forward (valid_from < valid_to), every key has EXACTLY
    one open interval (the current row), is_current <=> open, and
    versions tile the key's history with no gap/overlap (each closed
    interval's valid_to equals the next version's valid_from)."""
    rows = _df(spark, "scd2_history", SF_MID).collect()
    assert rows
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r)
        assert r["is_current"] == (r["valid_to"] is None)
        if r["valid_to"] is not None:
            assert r["valid_from"] < r["valid_to"], r
    for uid, vs in by_key.items():
        assert sum(1 for r in vs if r["valid_to"] is None) == 1, uid
        vs.sort(key=lambda r: r["valid_from"])
        for prev, nxt in zip(vs, vs[1:]):
            assert prev["valid_to"] == nxt["valid_from"], uid


# --- C51 PCA: bounded-model plan + variance floor ---------------------------


def test_pca_output_plan_no_global_shuffle(spark):
    """The matrix-free design's plan contract: the RETURNED projection
    DataFrame is a pure per-row projection over the scan (the d-float
    model rides as a closure literal) — zero exchanges; the iteration
    passes each reduce to EMB_DIM rows collected driver-side, never a
    corpus collect or a d x d covariance shuffle."""
    df = _df(spark, "embedding_pca_power", SF_MID)
    assert P.exchange_count(df) == 0
    plan = P.explain_str(df)
    assert "CartesianProduct" not in plan


def test_pca_variance_captured_floor(spark):
    """Sanity floor: pc1 must capture visibly MORE variance than the
    per-dimension average (measured at sf0.01: ratio 1.51) — a wrong
    component (sign flips, stale model, unnormalized v) collapses this
    toward <= 1.0."""
    pdf = _df(spark, "embedding_pca_power", SF_MID).toPandas()
    dim = 64
    var_pc1 = float(np.var(pdf["pc1_proj"]))
    avg_dim_var = float(np.mean(pdf["centered_norm"] ** 2)) / dim
    assert var_pc1 >= 1.2 * avg_dim_var, (var_pc1, avg_dim_var)


# --- C52 BM25: broadcast budget ---------------------------------------------


def test_bm25_hints_only_bounded_relations(spark):
    """The q8 principle applied to retrieval: only bounded relations
    may carry explicit hints — dfreq (<= query vocabulary), qrel (a
    driver literal), stats (1 row). The doc-length relation grows with
    the corpus and must NOT be hinted."""
    df = _df(spark, "bm25_topk")
    assert P.broadcast_hint_count(df) <= 3
    assert "CartesianProduct" not in P.explain_str(df)


def test_hybrid_bm25_pq_hints_only_bounded_relations(spark):
    """Same budget for the fused production retriever: per arm only
    the bounded sides (BM25's three + the PQ LUT) carry hints."""
    df = _df(spark, "hybrid_bm25_pq_rrf")
    assert P.broadcast_hint_count(df) <= 4
    assert "CartesianProduct" not in P.explain_str(df)


# --- C53/C53b RRF: recall floors + both-arms reachability --------------------


def test_rrf_recall_floor_vs_exact(spark):
    """hybrid_search_rrf fuses exact cosine with the (deliberately
    noisy) PQ arm, so its top-k legitimately reorders vs pure exact —
    but a collapse (broken rank join, swapped ascending/descending,
    dead arm) craters the overlap. Measured at sf0.01: 0.50; floor
    0.35."""
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in _df(spark, "ann_cosine_topk", SF_MID).collect()
    }
    fused = {
        (r["query_id"], r["corpus_id"])
        for r in _df(spark, "hybrid_search_rrf", SF_MID).collect()
    }
    assert exact and fused
    assert len(exact & fused) / len(exact) >= 0.35


def test_hybrid_bm25_pq_both_arms_reachable(spark):
    """The fusion must actually fuse: for the shared query ids the
    result contains docs surfaced by the LEXICAL arm (in BM25's own
    top pool) and docs surfaced by the VECTOR arm (in the exact-cosine
    pool) — a dead arm (empty join side, rank sign flip) empties one
    of these intersections."""
    from tradesignal_mtm_runner_spark.queries_r8 import RRF_POOL

    fused = _df(spark, "hybrid_bm25_pq_rrf", SF_MID).collect()
    assert fused
    qids = sorted({r["query_id"] for r in fused})
    bm25 = {
        (r["query_id"], r["doc_id"])
        for r in _df(spark, "bm25_topk", SF_MID).collect()
    }
    vec_exact = {
        (r["query_id"], r["corpus_id"])
        for r in _df(spark, "ann_cosine_topk", SF_MID).collect()
        if r["query_id"] in qids
    }
    fused_pairs = {(r["query_id"], r["doc_id"]) for r in fused}
    assert fused_pairs & bm25, "lexical arm contributed nothing"
    assert fused_pairs & vec_exact, "vector arm contributed nothing"
    # per-query result depth is bounded by the fused top-k
    per_q = {q: sum(1 for r in fused if r["query_id"] == q) for q in qids}
    assert all(n <= RRF_POOL for n in per_q.values())


def test_hybrid_bm25_pq_recall_floor_vs_exact(spark):
    """Direct recall floor on the production hybrid (VERDICT r9 item
    4): for the shared query ids, hybrid_bm25_pq_rrf's fused top-k
    must retain a healthy fraction of the EXACT cosine top-k — both
    arms are approximate (BM25 lexical, PQ/ADC + re-rank vector), so
    perfect overlap is not expected, but a dead vector arm, a rank
    sign flip, or a broken fusion join craters it. Measured at
    sf0.01: 0.40 (6/15 pairs over the 3 shared queries); floor 0.25
    (measured minus margin, the C53 pattern)."""
    fused_rows = _df(spark, "hybrid_bm25_pq_rrf", SF_MID).collect()
    assert fused_rows
    qids = {r["query_id"] for r in fused_rows}
    exact = {
        (r["query_id"], r["corpus_id"])
        for r in _df(spark, "ann_cosine_topk", SF_MID).collect()
        if r["query_id"] in qids
    }
    fused = {(r["query_id"], r["doc_id"]) for r in fused_rows}
    assert exact
    assert len(exact & fused) / len(exact) >= 0.25


# --- C54 boilerplate: planted reachability -----------------------------------


def test_boilerplate_planted_reachable(spark, tmp_path):
    """Planted corpus: one 8-token chrome phrase shared by 6 docs (>=
    BOILER_DF=5 distinct docs), unique filler elsewhere. The rule must
    (a) flag the shared segment in every carrier, (b) fail the
    pure-chrome doc (ratio 1.0 > 0.5), (c) keep the half-chrome docs
    (ratio 0.5 <= 0.5), and (d) keep clean docs at ratio 0."""
    from tradesignal_mtm_runner_spark.queries_r8 import boilerplate_segments

    boiler = "cookie notice accept terms privacy policy footer nav"
    rows = []
    # doc 0: pure boilerplate (1 segment, all chrome)
    rows.append((0, boiler))
    # docs 1-5: boilerplate + 8 unique tokens -> ratio exactly 0.5
    for i in range(1, 6):
        uniq = " ".join(f"u{i}w{j}" for j in range(8))
        rows.append((i, f"{boiler} {uniq}"))
    # docs 6-7: clean, 16 unique tokens each
    for i in range(6, 8):
        uniq = " ".join(f"c{i}w{j}" for j in range(16))
        rows.append((i, uniq))
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_segments(spark, str(tmp_path)).collect()
    }
    assert out[0]["n_boiler"] == 1 and not out[0]["keep"]
    for i in range(1, 6):
        assert out[i]["n_segments"] == 2 and out[i]["n_boiler"] == 1, i
        assert out[i]["keep"], i
        assert out[i]["boiler_ratio"] == pytest.approx(0.5)
    for i in range(6, 8):
        assert out[i]["n_boiler"] == 0 and out[i]["keep"], i


# --- C55 char entropy: bounds + planted degenerate docs ----------------------


def test_char_entropy_bounds_and_planted_degenerates(spark, tmp_path):
    """Information-theoretic bounds (0 <= H <= log2(alphabet)) on the
    real corpus, plus planted reachability: a single-char flood has
    exactly 0 bits (fails the keep floor), a uniform-alphabet doc hits
    the log2 bound, natural-ish text passes."""
    from tradesignal_mtm_runner_spark.queries_r9 import doc_char_entropy

    rows = _df(spark, "doc_char_entropy", SF_MID).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= np.log2(r["n_unique_chars"]) + 1e-9

    planted = [
        (0, "a" * 64),                      # flood: H = 0
        (1, "abcdefgh" * 8),                # uniform 8-char: H = 3 exactly
        (2, "the quick brown fox jumps"),   # natural: H > 2
    ]
    spark.createDataFrame(planted, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r["doc_id"]: r for r in doc_char_entropy(spark, str(tmp_path)).collect()
    }
    assert out[0]["entropy_bits"] == 0.0 and not out[0]["keep"]
    assert out[1]["entropy_bits"] == pytest.approx(3.0) and out[1]["keep"]
    assert out[2]["keep"]


# --- C56 Zipf fit: plan + statistical sanity ---------------------------------


def test_zipf_fit_take_ordered_and_sane(spark):
    """The vocabulary cut must plan as a distributed TakeOrdered (never
    a global sort of the vocab), and the fit must look like language:
    negative slope, r^2 in (0, 1], exactly ZIPF_TOP terms."""
    from tradesignal_mtm_runner_spark.queries_r9 import ZIPF_TOP

    df = _df(spark, "token_zipf_fit", SF_MID)
    assert "TakeOrderedAndProject" in P.explain_str(df)
    row = df.collect()[0]
    # the synthetic vocabulary can be smaller than the cut (31 terms
    # at sf0.01) — the fit covers min(vocab, ZIPF_TOP) terms
    assert 0 < row["n_terms"] <= ZIPF_TOP
    assert row["zipf_slope"] < 0
    assert 0.0 < row["r_squared"] <= 1.0


# --- C57 keep-best dedup: invariants + divergence from min-id ----------------


def test_dedup_keep_best_invariants(spark, tmp_path):
    """(a) keep <=> doc is the representative; (b) exactly one keep
    per component; (c) the representative has the component's max
    token count (min id among ties); (d) components agree with
    dedup_connected's; (e) planted pair where the LONGER near-dup has
    the HIGHER id: min-id would keep the short one — keep-best must
    keep the long one."""
    from tradesignal_mtm_runner_spark.queries_r9 import dedup_keep_best

    rows = _df(spark, "dedup_keep_best", SF_MID).collect()
    assert rows
    comps: dict = {}
    for r in rows:
        comps.setdefault(r["canonical_id"], []).append(r)
        assert r["keep"] == (r["doc_id"] == r["best_id"])
    cc = {
        r["doc_id"]: r["canonical_id"]
        for r in _df(spark, "dedup_connected", SF_MID).collect()
    }
    for cid, members in comps.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1, cid
        best = keeps[0]
        mx = max(r["n_toks"] for r in members)
        assert best["n_toks"] == mx
        assert best["doc_id"] == min(
            r["doc_id"] for r in members if r["n_toks"] == mx
        )
        for r in members:
            assert cc[r["doc_id"]] == cid

    # planted divergence: doc 1 is doc 0 plus a short tail -> simhash
    # hamming 1 (measured; the tail must be small RELATIVE to the doc
    # to stay under SIMHASH_MAX_HAMMING=2), longer, higher id; docs
    # 2+ are noise singletons
    base = " ".join(f"w{i % 9}tok{i}" for i in range(256))
    planted = [
        (0, base),
        (1, base + " extra tail"),
        (2, " ".join(f"zq{i}" for i in range(40))),
        (3, " ".join(f"vy{i}" for i in range(40))),
    ]
    spark.createDataFrame(
        planted, "doc_id long, text string"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in dedup_keep_best(spark, str(tmp_path)).collect()}
    assert out[0]["canonical_id"] == out[1]["canonical_id"], (
        "planted near-dup pair did not land in one component"
    )
    assert out[1]["keep"] and not out[0]["keep"], (
        "keep-best must keep the longer representative, not the min id"
    )
    assert out[2]["keep"] and out[3]["keep"]


# --- B42 retention cohort: accounting invariants -----------------------------


def test_retention_cohort_accounting(spark):
    """The triangle must account for every order exactly once
    (sum n_orders == |orders|), every cohort's offset-0 cell must
    exist and carry the full cohort (everyone's first order is at
    offset 0), no cell may exceed its cohort size, and offsets are
    non-negative."""
    from tradesignal_mtm_runner_spark.sources import load_table

    rows = _df(spark, "retention_cohort", SF_MID).collect()
    assert rows
    total_orders = load_table(spark, SF_MID, "orders").count()
    assert sum(r["n_orders"] for r in rows) == total_orders
    by_cohort: dict = {}
    for r in rows:
        assert r["month_offset"] >= 0
        by_cohort.setdefault(r["cohort_month"], {})[r["month_offset"]] = r
    for cm, cells in by_cohort.items():
        assert 0 in cells, f"cohort {cm} missing its offset-0 cell"
        size = cells[0]["n_customers"]
        for off, r in cells.items():
            assert r["n_customers"] <= size, (cm, off)


# --- A27 streaming trending top-k: rank shape --------------------------------


def test_stream_topk_trending_rank_shape(spark):
    """Per window: ranks are contiguous from 1, at most TREND_TOPK
    rows, ordered by count desc (event_type asc on ties) — and the
    replayed counters agree with a direct batch rollup on the hours
    they cover."""
    from tradesignal_mtm_runner_spark.queries_r9 import TREND_TOPK

    rows = _df(spark, "stream_topk_trending", SF_MID).collect()
    assert rows
    by_w: dict = {}
    for r in rows:
        by_w.setdefault(r["window_start_epoch"], []).append(r)
    for wstart, members in by_w.items():
        members.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in members] == list(
            range(1, len(members) + 1)
        ), wstart
        assert len(members) <= TREND_TOPK
        counts = [r["n_events"] for r in members]
        assert counts == sorted(counts, reverse=True), wstart


# --- B41b approx profile: tolerance pin --------------------------------------


def test_approx_profile_matches_exact_within_tolerance(spark):
    """The scale twin must agree with the exact profile everywhere the
    sketch isn't involved (rows/nulls/min/max/avg identical) and keep
    NDV inside a 15% relative band (HLL++ default rsd 0.05; measured
    max error at sf0.01 is 6%)."""
    exact = {
        r["column_name"]: r
        for r in _df(spark, "table_profile", SF_MID).collect()
    }
    approx = {
        r["column_name"]: r
        for r in _df(spark, "approx_table_profile", SF_MID).collect()
    }
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        assert a["n_rows"] == e["n_rows"] and a["n_nulls"] == e["n_nulls"]
        assert a["min_value"] == e["min_value"]
        assert a["max_value"] == e["max_value"]
        assert a["avg_value"] == pytest.approx(e["avg_value"], abs=1e-9)
        rel = abs(a["n_distinct_approx"] - e["n_distinct"]) / max(
            e["n_distinct"], 1
        )
        assert rel <= 0.15, (c, a["n_distinct_approx"], e["n_distinct"])
