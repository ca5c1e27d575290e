"""Scale-pattern tests (SURVEY §7.9): salted skew join and
bucketed-write co-located join. Both are plan-level properties —
results are identical to the naive plan; what's pinned here is that
the technique actually changes the physical plan the way the 100 TB
story claims."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, assert_frames_match
from tradesignal_mtm_runner_spark import plans as P
from tradesignal_mtm_runner_spark.operators.skewjoin import salted_join
from tradesignal_mtm_runner_spark.sources import load_table


def _sides(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return ev, cust


def test_salted_join_matches_plain_join(spark):
    ev, cust = _sides(spark)
    on = F.col("user_id") == F.col("c_custkey")
    salted = salted_join(ev, cust, on=on, salt_source="event_id", num_salts=7)
    plain = ev.join(cust, on)
    assert_frames_match(
        salted.toPandas(), plain.toPandas(), "salted_vs_plain"
    )


def test_salted_join_plan_spreads_key(spark):
    ev, cust = _sides(spark)
    salted = salted_join(
        ev,
        cust,
        on=F.col("user_id") == F.col("c_custkey"),
        salt_source="event_id",
        num_salts=7,
    )
    plan = P.explain_str(salted)
    # the whole point: NOT a broadcast, and the shuffle key includes
    # the salt so one hot user_id spreads over num_salts partitions
    assert P.broadcast_join_count(salted) == 0
    assert "_salt_b" in plan and "_salt_s" in plan


@pytest.fixture(scope="module")
def bucket_db(spark):
    loc = tempfile.mkdtemp(prefix="bucketdemo_")
    spark.sql(f"CREATE DATABASE bucketdemo LOCATION '{loc}'")
    yield "bucketdemo"
    spark.sql("DROP DATABASE bucketdemo CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def test_bucketed_join_needs_no_shuffle(spark, bucket_db):
    """Pre-bucketing both fact tables on the join key makes the join
    shuffle-FREE: each bucket pair joins in place. At 100 TB this is
    the difference between re-shuffling the biggest table on every
    run and paying the partitioning once at write time."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{bucket_db}.li_b")
    )
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(f"{bucket_db}.orders_b")
    )
    lb = spark.table(f"{bucket_db}.li_b")
    ob = spark.table(f"{bucket_db}.orders_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderkey"
    ).agg(F.sum("l_quantity").alias("qty"))

    # co-located: zero shuffles end-to-end (join AND the groupBy ride
    # the bucket partitioning); unbucketed plan needs >= 1
    assert P.exchange_count(joined) == 0, P.explain_str(joined)

    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert P.exchange_count(plain) >= 1
    assert_frames_match(joined.toPandas(), plain.toPandas(), "bucketed_vs_plain")


def test_connected_canonical_converged(spark):
    """DEDUP_CC_ITERS hops must be enough on this graph: one more
    iteration may not change any label (otherwise the fixed unroll in
    the SQL oracle and the Spark loop are both under-iterated)."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        connected_canonical,
        simhash_near_dup_pairs,
        simhash_signatures,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_HAMMING,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    pairs = simhash_near_dup_pairs(
        simhash_signatures(d), max_hamming=SIMHASH_MAX_HAMMING
    )
    ids = d.select("doc_id")
    a = connected_canonical(ids, pairs, iters=DEDUP_CC_ITERS).toPandas()
    b = connected_canonical(ids, pairs, iters=DEDUP_CC_ITERS + 1).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["canonical_id"].values == b["canonical_id"].values).all()
    # sanity: dedup actually drops something and keeps the minima
    assert (~a["keep"]).sum() > 0
    assert set(a[a["keep"]]["doc_id"]) == set(a["canonical_id"])


def test_approx_distinct_within_tolerance(spark):
    """HLL estimate must land within 5x the configured rsd of the
    exact per-day distinct count (generous bound; rsd=2%)."""
    from tradesignal_mtm_runner_spark.queries_analytics import (
        APPROX_RSD,
        approx_distinct_users_daily,
        distinct_users_daily,
    )

    exact = (
        distinct_users_daily(spark, SF_SMOKE)
        .toPandas()
        .set_index("day")["n_users"]
    )
    approx = (
        approx_distinct_users_daily(spark, SF_SMOKE)
        .toPandas()
        .set_index("day")["n_users_approx"]
    )
    assert set(exact.index) == set(approx.index)
    rel = ((approx - exact).abs() / exact).max()
    assert rel <= 5 * APPROX_RSD, f"max relative error {rel}"


def test_image_cc_converged_and_dedups(spark):
    """The image dHash component assignment must be CONVERGED at the
    fixed unroll (one more iteration changes no label — otherwise the
    SQL oracle and the Spark loop are both under-iterated), must
    actually drop duplicate images, and keeps exactly the component
    minima."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        connected_canonical,
        simhash_near_dup_pairs,
    )
    from tradesignal_mtm_runner_spark.operators.multimodal import extract_dhash
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_BUCKET,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline_extras import (
        DHASH_MAX_HAMMING,
        _image_assets,
    )

    sig = extract_dhash(_image_assets(spark, SF_SMOKE)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("dhash_hi").alias("simhash_hi"),
        F.col("dhash_lo").alias("simhash_lo"),
    )
    pairs = simhash_near_dup_pairs(
        sig, max_hamming=DHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
    )
    ids = sig.select("doc_id")
    a = (
        connected_canonical(ids, pairs, iters=DEDUP_CC_ITERS)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        connected_canonical(ids, pairs, iters=DEDUP_CC_ITERS + 1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (a["canonical_id"].values == b["canonical_id"].values).all()
    assert (~a["keep"]).sum() > 0
    assert set(a[a["keep"]]["doc_id"]) == set(a["canonical_id"])


def test_hll_sketch_rollup_merges_correctly(spark):
    """The mergeable-sketch contract (B38): every daily estimate AND
    the union-merged TOTAL land within tolerance of the exact distinct
    counts, the TOTAL's event count is the exact corpus total, and the
    merged distinct is far below the sum of dailies (the union really
    dedups overlapping users instead of adding)."""
    import pyspark.sql.functions as SF

    from tradesignal_mtm_runner_spark.queries_analytics import (
        sketch_rollup_hll,
    )
    from tradesignal_mtm_runner_spark.sources import load_table

    out = sketch_rollup_hll(spark, SF_SMOKE).toPandas().set_index("day")
    ev = load_table(spark, SF_SMOKE, "events").select(
        SF.to_date("ts").alias("day"), "user_id"
    )
    exact_daily = {
        str(r["day"]): r["n"]
        for r in ev.groupBy("day")
        .agg(SF.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = ev.select("user_id").distinct().count()
    n_events = ev.count()

    total_row = out.loc["TOTAL"]
    assert int(total_row["n_events"]) == n_events
    assert abs(total_row["est_users"] - exact_total) / exact_total <= 0.10
    daily = out.drop("TOTAL")
    assert set(daily.index) == set(exact_daily)
    for day, row in daily.iterrows():
        e = exact_daily[day]
        assert abs(row["est_users"] - e) / e <= 0.10, (day, row["est_users"], e)
    assert total_row["est_users"] < daily["est_users"].sum() / 2


def test_theta_overlap_matches_exact_sets(spark):
    """Theta-sketch set algebra (B39) vs the exact sets: below the
    sampling threshold theta sketches are exact, so every estimate
    must match the true set sizes, and inclusion-exclusion must hold
    on the output row."""
    import pyspark.sql.functions as SF

    from tradesignal_mtm_runner_spark.queries_analytics import (
        audience_overlap_theta,
    )
    from tradesignal_mtm_runner_spark.sources import load_table

    row = audience_overlap_theta(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events")
    users = lambda t: {  # noqa: E731
        r["user_id"]
        for r in ev.filter(SF.col("event_type") == t)
        .select("user_id")
        .distinct()
        .collect()
    }
    p, c = users("purchase"), users("click")
    assert row["purchase_users"] == len(p)
    assert row["click_users"] == len(c)
    assert row["union_users"] == len(p | c)
    assert row["both_users"] == len(p & c)
    assert row["purchase_only_users"] == len(p - c)
    assert (
        row["union_users"]
        == row["purchase_users"] + row["click_users"] - row["both_users"]
    )


def test_lr_training_loss_decreases(spark):
    """The distributed logistic-regression trainer (C50) must actually
    DESCEND: mean log-loss of the trained model must sit below the
    zero-weight model's ln(2), and the final scores must not be
    degenerate (both classes of score sign present or the weights at
    least nonzero)."""
    import math

    import pyspark.sql.functions as SF

    from tradesignal_mtm_runner_spark.queries_pipeline_extras import (
        classifier_train_lr,
    )

    out = classifier_train_lr(spark, SF_SMOKE).cache()
    n = out.count()
    assert n > 0
    # log-loss from the (rounded) scores: -[y ln p + (1-y) ln(1-p)]
    p = SF.lit(1.0) / (SF.lit(1.0) + SF.exp(-SF.col("score")))
    eps = SF.lit(1e-15)
    ll = -(
        SF.col("label") * SF.log(p + eps)
        + (SF.lit(1) - SF.col("label")) * SF.log(SF.lit(1.0) - p + eps)
    )
    mean_loss = out.select(SF.avg(ll).alias("l")).collect()[0]["l"]
    assert mean_loss < math.log(2.0) - 1e-3, mean_loss
    # non-degenerate: the model moved off zero
    assert out.filter(SF.col("score") != 0.0).count() > 0


def test_lloyd_training_inertia_is_monotone(spark):
    """Multi-iteration Lloyd refinement must converge: under cosine
    similarity the rounded-mean update is spherical k-means, so the
    inertia sum(1 - best_cos) measured at each iteration's assignment
    is non-increasing (up to the 1e-6 mean rounding)."""
    from pyspark.sql import functions as F

    from tradesignal_mtm_runner_spark.operators.similarity import (
        _centroid,
        lloyd_train,
        with_double_vec,
    )
    from tradesignal_mtm_runner_spark.sources import load_table

    emb = with_double_vec(load_table(spark, SF_SMOKE, "embeddings")).select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("_cv")
    )
    seed_rows = emb.orderBy("corpus_id").limit(8).collect()
    cents = [
        _centroid(int(r["corpus_id"]), [float(x) for x in r["_cv"]])
        for r in seed_rows
    ]
    _, inertia = lloyd_train(emb, cents, iters=4)
    assert len(inertia) == 4
    for prev, cur in zip(inertia, inertia[1:]):
        assert cur <= prev + 1e-4, f"inertia increased: {inertia}"
    # training must actually improve on the seed assignment
    assert inertia[-1] < inertia[0]


def test_approx_quantiles_within_rank_tolerance(spark):
    """approx_percentile (mergeable sketch, the 100 TB drop-in for
    exact B13 quantiles) must land within the exact values at
    q +/- eps, where eps covers the sketch's rank error bound
    n/accuracy plus slack."""
    import pyspark.sql.functions as F

    from tradesignal_mtm_runner_spark.queries_analytics import (
        APPROX_PCT_ACCURACY,
        QUANTILES,
        approx_price_quantiles,
    )
    from tradesignal_mtm_runner_spark.sources import load_table

    approx = (
        approx_price_quantiles(spark, SF_SMOKE).toPandas().set_index("l_returnflag")
    )
    li = load_table(spark, SF_SMOKE, "lineitem")
    n_max = int(approx["n"].max())
    eps = max(2.0 * n_max / APPROX_PCT_ACCURACY / n_max, 0.002)
    lo_hi = li.groupBy("l_returnflag").agg(
        *[
            F.expr(f"percentile(l_extendedprice, {max(q - eps, 0.0)})").alias(
                f"lo{int(q * 100)}"
            )
            for q in QUANTILES
        ],
        *[
            F.expr(f"percentile(l_extendedprice, {min(q + eps, 1.0)})").alias(
                f"hi{int(q * 100)}"
            )
            for q in QUANTILES
        ],
    ).toPandas().set_index("l_returnflag")
    assert set(approx.index) == set(lo_hi.index)
    for q in QUANTILES:
        p = f"p{int(q * 100)}"
        for flag in approx.index:
            v = approx.loc[flag, p]
            lo = lo_hi.loc[flag, f"lo{int(q * 100)}"]
            hi = lo_hi.loc[flag, f"hi{int(q * 100)}"]
            assert lo - 1e-6 <= v <= hi + 1e-6, (flag, p, v, lo, hi)


def test_aqe_splits_injected_skew(spark):
    """AQE skew-join demonstration (SURVEY §7.10): one key carrying
    ~90% of a 400k-row build side must be split into multiple tasks by
    adaptive execution (isSkewJoin in the final plan), pinning the
    behavior the salted-join docstring claims AQE provides for
    moderate skew."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        # thresholds low enough that local-scale skew triggers the split
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        big = spark.range(0, 400_000).select(
            # ~90% of rows hash to key 7, rest spread over 1000 keys
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        small = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        # NOTE: a downstream groupBy(k) would suppress the split (AQE
        # won't break the join's hash partitioning that the aggregate
        # requires) — the join itself must be the stage boundary
        joined = big.join(small, on="k")
        assert len(joined.collect()) == 400_000  # finalize AQE plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "isSkewJoin=true" in plan, plan[:2000]
        assert "skewed" in plan  # AQEShuffleRead applied the split
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_embedding_neardup_bucket_cap(spark):
    """max_bucket drops degenerate hot buckets from candidate
    generation (B identical vectors -> B^2 pairs otherwise) — the
    100 TB guard mirroring the MinHash path's cap."""
    from pyspark.sql import functions as F

    from tradesignal_mtm_runner_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    # 60 identical vectors: one bucket per table holds all of them
    emb = spark.range(0, 60).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), j -> 1.0)").alias("embedding"),
    )
    uncapped = embedding_near_dup_pairs(
        emb, num_planes=4, num_tables=1, cosine_threshold=0.9
    )
    capped = embedding_near_dup_pairs(
        emb, num_planes=4, num_tables=1, cosine_threshold=0.9, max_bucket=50
    )
    assert uncapped.count() == 60 * 59 // 2
    assert capped.count() == 0


def test_incremental_dedup_index_probe_is_bucket_aligned(spark, bucket_db):
    """The standing dedup index (VERDICT r4 item 3): persisted DISTINCT
    hashes bucketed on h. With broadcast disabled (so the plan can't
    cheat at toy scale), the ad-hoc probe's ONLY exchange is the
    batch side — the corpus-sized index reads in place — and a
    bucket-staged batch probes with zero exchanges end-to-end. That is
    the claim in dedup_incremental's docstring, made tested reality."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        probe_hash_index,
        write_hash_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("h")
    )
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    write_hash_index(base, f"{bucket_db}.dedup_idx", num_buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        adhoc = probe_hash_index(spark, batch, f"{bucket_db}.dedup_idx")
        assert P.exchange_count(adhoc) == 1, P.explain_str(adhoc)

        (
            batch.write.bucketBy(4, "h")
            .sortBy("h")
            .mode("overwrite")
            .saveAsTable(f"{bucket_db}.batch_staged")
        )
        staged = probe_hash_index(
            spark, spark.table(f"{bucket_db}.batch_staged"), f"{bucket_db}.dedup_idx"
        )
        assert P.exchange_count(staged) == 0, P.explain_str(staged)

        expect = batch.join(base.select("h").distinct(), "h", "left_anti")
        assert sorted(r["doc_id"] for r in staged.collect()) == sorted(
            r["doc_id"] for r in expect.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_lsh_bucket_cap(spark):
    """max_bucket drops degenerate hot (band, band_sig) buckets from
    MinHash candidate generation (B identical docs -> B^2/2 pairs
    otherwise) — the 100 TB guard the embedding path already had,
    now on the MinHash path too (VERDICT r5 item 4)."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        lsh_bands_from_wide,
        lsh_candidate_pairs,
        minhash_signatures_wide,
    )

    # 60 identical documents: every band bucket holds all of them
    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the corpus").alias(
            "text"
        ),
    )
    bands = lsh_bands_from_wide(
        minhash_signatures_wide(docs, num_hashes=8, shingle_k=3),
        num_bands=2,
        num_hashes=8,
    )
    uncapped = lsh_candidate_pairs(bands)
    capped = lsh_candidate_pairs(bands, max_bucket=50)
    assert uncapped.count() == 60 * 59 // 2
    assert capped.count() == 0


def test_lsh_candidate_pairs_tolerates_duplicate_band_rows(spark):
    """Duplicated (band, band_sig, doc_id) input rows (public API,
    tolerated by the pre-r6 self-join shape) must not emit self-pairs
    from the row-local array expansion (ADVICE r6)."""
    from tradesignal_mtm_runner_spark.operators.dedup import lsh_candidate_pairs

    rows = [(0, "sig", d) for d in (1, 1, 2)] * 2
    bands = spark.createDataFrame(rows, "band int, band_sig string, doc_id int")
    got = sorted(map(tuple, lsh_candidate_pairs(bands).collect()))
    assert got == [(1, 2)]


def test_simhash_hot_band_cap(spark):
    """max_bucket drops degenerate hot (band, val) values from SimHash
    candidate generation (B boilerplate docs sharing one 16-bit band
    value -> B^2/2 self-join rows otherwise) — the same 100 TB guard
    the MinHash and embedding generators carry (VERDICT r6 item 1)."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    # 60 identical documents: identical signatures, every band value
    # holds all 60 docs
    docs = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated across the corpus").alias(
            "text"
        ),
    )
    sig = simhash_signatures(docs)
    uncapped = simhash_near_dup_pairs(sig, max_hamming=2)
    capped = simhash_near_dup_pairs(sig, max_hamming=2, max_bucket=50)
    assert uncapped.count() == 60 * 59 // 2
    assert capped.count() == 0

    # a mixed corpus: the hot band is dropped but distinct docs that
    # only collide on COLD band values still pair (graceful recall,
    # not an output blackout)
    import pyspark.sql.functions as SF

    mixed = docs.unionByName(
        spark.createDataFrame(
            [
                (100, "alpha beta gamma delta epsilon zeta"),
                (101, "alpha beta gamma delta epsilon zeta"),
            ],
            "doc_id long, text string",
        ).select(SF.col("doc_id"), SF.col("text"))
    )
    msig = simhash_signatures(mixed)
    mcapped = simhash_near_dup_pairs(msig, max_hamming=2, max_bucket=50)
    got = sorted(map(tuple, mcapped.select("id_a", "id_b").collect()))
    assert got == [(100, 101)]


def test_band_index_probe_is_bucket_aligned(spark, bucket_db):
    """The standing NEAR-dup band index (VERDICT r5 item 3): persisted
    DISTINCT (band, band_sig) bucketed on both keys. With broadcast
    disabled (so the plan can't cheat at toy scale), the ad-hoc
    probe's ONLY exchange is the batch side — the corpus-sized index
    reads in place — and a bucket-staged batch probes with zero
    exchanges end-to-end. The base corpus is shingled once at
    index-build time; the probe never touches base content —
    dedup_incremental_near's production form, made tested reality."""
    from tradesignal_mtm_runner_spark.operators.dedup import (
        lsh_bands_from_wide,
        minhash_signatures_wide,
        probe_band_index,
        write_band_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    bands = lsh_bands_from_wide(
        minhash_signatures_wide(docs, num_hashes=8, shingle_k=3),
        num_bands=2,
        num_hashes=8,
    )
    base_b = bands.filter(F.col("doc_id") % 4 != 0)
    batch_b = bands.filter(F.col("doc_id") % 4 == 0)
    write_band_index(base_b, f"{bucket_db}.band_idx", num_buckets=4)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # the probe input in production is the staged batch table, not
        # the live shingling pipeline — materialize it the same way
        (
            batch_b.write.bucketBy(4, "band", "band_sig")
            .sortBy("band", "band_sig")
            .mode("overwrite")
            .saveAsTable(f"{bucket_db}.batch_bands")
        )
        staged_in = spark.table(f"{bucket_db}.batch_bands")
        staged = probe_band_index(spark, staged_in, f"{bucket_db}.band_idx")
        assert P.exchange_count(staged) == 0, P.explain_str(staged)

        adhoc_in = batch_b.select("doc_id", "band", "band_sig")
        adhoc = probe_band_index(spark, adhoc_in, f"{bucket_db}.band_idx")
        # the only exchanges belong to the batch's own band pipeline
        # (its minhash aggregate), never the index side: probing adds
        # no exchange beyond what building the batch bands costs
        assert P.exchange_count(adhoc) <= P.exchange_count(adhoc_in) + 1

        expect = batch_b.join(
            base_b.select("band", "band_sig").distinct(),
            ["band", "band_sig"],
            "left_semi",
        )
        assert sorted(
            (r["doc_id"], r["band"]) for r in staged.collect()
        ) == sorted((r["doc_id"], r["band"]) for r in expect.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ivf_index_probe_prunes_partitions_and_matches_live(spark, tmp_path):
    """The persisted IVF index (ANN twin of the dedup indexes): the
    corpus is cell-assigned ONCE and stored partitioned by cell; a
    probe's scan carries a partition filter on the probed cells (the
    on-disk form of 'search only the probed lists'), and the top-k
    matches the live ivf_topk computation on identical seed
    centroids."""
    from tradesignal_mtm_runner_spark.operators.similarity import (
        _centroid,
        ivf_topk,
        probe_ivf_index,
        with_double_vec,
        write_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    cent_rows = (
        with_double_vec(emb)
        .orderBy("vec_id")
        .limit(8)
        .collect()
    )
    cents = [
        _centroid(int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in cent_rows
    ]
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, cents)

    probe = probe_ivf_index(spark, queries, path, k=3, nprobe=2)
    plan = P.explain_str(probe)
    assert "PartitionFilters" in plan and "cell" in plan

    live = ivf_topk(emb, queries, k=3, num_centroids=8, nprobe=2)
    got = sorted(map(tuple, probe.collect()))
    want = sorted(map(tuple, live.collect()))
    assert got == want and len(got) > 0


def test_ivf_index_incremental_append(spark, tmp_path):
    """New vectors enter the index by assigning against the FROZEN
    centroids and appending into their cell partitions — no retrain,
    no corpus re-assignment, and the base index's files are untouched
    (the incremental-ingest contract, mirroring dedup's standing
    indexes)."""
    import glob as _glob

    from tradesignal_mtm_runner_spark.operators.similarity import (
        _centroid,
        append_to_ivf_index,
        probe_ivf_index,
        with_double_vec,
        write_ivf_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    cent_rows = with_double_vec(base).orderBy("vec_id").limit(8).collect()
    cents = [
        _centroid(int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in cent_rows
    ]
    path = str(tmp_path / "ivf_inc")
    write_ivf_index(base, path, cents)
    before = set(_glob.glob(f"{path}/cell=*/*.parquet"))

    append_to_ivf_index(batch, path)
    after = set(_glob.glob(f"{path}/cell=*/*.parquet"))
    assert before <= after, "append must not rewrite existing files"
    assert len(after) > len(before)

    n_base = spark.read.parquet(path).count()
    assert n_base == emb.count()

    # a query near an appended vector must now surface it
    queries = batch.limit(2)
    res = probe_ivf_index(spark, queries, path, k=3, nprobe=2).toPandas()
    assert len(res) > 0
    appended_ids = {int(r["vec_id"]) for r in batch.collect()}
    assert any(int(c) in appended_ids for c in res["corpus_id"])


def test_tracked_persists_are_releasable(spark):
    """The capped candidate generators persist their bands relation so
    the count-filter branch and the collect branch share one
    computation; those caches must be registered with the central
    cache registry so a long-lived session can release them at a
    checkpoint instead of leaning on LRU eviction (ADVICE r7). Pin:
    running a capped dedup query leaves >= 1 tracked live cache, and
    release_caches() empties both the registry and Spark's cache
    manager of them."""
    from tradesignal_mtm_runner_spark.cache_registry import (
        _LIVE,
        release_caches,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        dedup_minhash_lsh,
    )

    release_caches()  # start clean regardless of test order
    dedup_minhash_lsh(spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()
    assert len(_LIVE) >= 1
    cached = [df for df in _LIVE if df.storageLevel.useMemory]
    assert cached, "tracked relations should be persisted"
    n = release_caches()
    assert n >= 1 and not _LIVE
    assert all(not df.storageLevel.useMemory for df in cached)


def test_cc_label_index_probe_matches_live_and_is_bucket_aligned(
    spark, bucket_db
):
    """The standing CC-label index (VERDICT r9 item 3): the corpus's
    dedup decision state persists as three bucketed tables (band rows
    on (band, val), labels on doc_id, keep-best rollup on
    canonical_id) and the per-drop admission runs from those tables
    alone — cc_probe_from_index must (a) reproduce the self-contained
    oracle-checked dedup_cc_probe query exactly, and (b) resolve
    labels with ZERO exchange when the matched pairs are staged
    bucketed on the index's key, the proof that the corpus-sized side
    never reshuffles at 100 TB."""
    from tradesignal_mtm_runner_spark.functions.text import tokens
    from tradesignal_mtm_runner_spark.operators.dedup import (
        cc_probe_from_index,
        connected_canonical,
        probe_cc_labels,
        simhash_near_dup_pairs,
        simhash_signatures,
        write_cc_labels,
        write_simhash_band_index,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import (
        DEDUP_CC_ITERS,
        SIMHASH_MAX_BUCKET,
        SIMHASH_MAX_HAMMING,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline_extras import INC_MOD
    from tradesignal_mtm_runner_spark.queries_r10 import dedup_cc_probe

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    sig = simhash_signatures(docs)
    base_sig = sig.filter(F.col("doc_id") % INC_MOD != 0)
    new_sig = sig.filter(F.col("doc_id") % INC_MOD == 0)
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_toks")
    )

    # index build: the once-per-refresh half
    write_simhash_band_index(
        base_sig,
        f"{bucket_db}.cc_bands",
        max_bucket=SIMHASH_MAX_BUCKET,
        num_buckets=4,
    )
    pairs = simhash_near_dup_pairs(
        base_sig,
        max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket=SIMHASH_MAX_BUCKET,
    )
    labels = connected_canonical(
        base_sig.select("doc_id"), pairs, iters=DEDUP_CC_ITERS
    ).select("doc_id", "canonical_id").join(lens, "doc_id")
    write_cc_labels(
        labels,
        f"{bucket_db}.cc_labels",
        num_buckets=4,
        best_table=f"{bucket_db}.cc_best",
    )

    # the probe batch: new docs' signatures + token counts
    batch = new_sig.join(lens, "doc_id")
    got = cc_probe_from_index(
        spark,
        batch,
        f"{bucket_db}.cc_bands",
        f"{bucket_db}.cc_labels",
        f"{bucket_db}.cc_best",
        max_hamming=SIMHASH_MAX_HAMMING,
    )
    want = dedup_cc_probe(spark, SF_SMOKE)
    assert_frames_match(
        got.toPandas().sort_values("doc_id").reset_index(drop=True),
        want.toPandas().sort_values("doc_id").reset_index(drop=True),
        "cc_probe_index_vs_live",
    )
    gp = got.toPandas()
    matched = gp[~gp["is_new_component"]]
    fresh = gp[gp["is_new_component"]]
    assert len(matched) > 0, "no batch doc matched an existing component"
    assert (fresh["component_id"] == fresh["doc_id"]).all()
    assert (fresh["n_matches"] == 0).all()
    assert not fresh["supersedes"].any()

    # bucket alignment: label resolution over a bucket-staged pair
    # relation runs with zero exchanges (index side never reshuffles)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            want.select(F.col("doc_id").alias("base_id"))
            .write.bucketBy(4, "base_id")
            .sortBy("base_id")
            .mode("overwrite")
            .saveAsTable(f"{bucket_db}.staged_pairs")
        )
        staged = probe_cc_labels(
            spark, spark.table(f"{bucket_db}.staged_pairs"), f"{bucket_db}.cc_labels"
        )
        assert P.exchange_count(staged) == 0, P.explain_str(staged)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pq_index_probe_matches_live_and_reads_no_vectors(spark, tmp_path):
    """The persisted PQ index (VERDICT r11 item 6 — the last ANN
    batch/standing asymmetry): the corpus is encoded ONCE into the
    code relation with the frozen codebooks in a sibling table; a
    probe's top-k is VALUE-IDENTICAL to the live pq_topk on the same
    corpus (both route through the shared _adc_topk fold), and the
    probe plan scans only (corpus_id, codes) — never embedding
    bytes."""
    from tradesignal_mtm_runner_spark.operators.similarity import (
        pq_topk,
        probe_pq_index,
        write_pq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "pq_idx")
    write_pq_index(emb, path, num_subspaces=4, num_codes=8)

    probe = probe_pq_index(spark, queries, path, k=3)
    live = pq_topk(emb, queries, k=3, num_subspaces=4, num_codes=8)
    got = sorted(map(tuple, probe.collect()))
    want = sorted(map(tuple, live.collect()))
    assert got == want and len(got) > 0

    # the index scan side must read codes only, never the vectors
    plan = P.explain_str(probe)
    scan_lines = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln or "ReadSchema" in ln
    ]
    idx_lines = [ln for ln in scan_lines if "pq_idx" in ln or "codes" in ln]
    assert idx_lines, plan
    assert not any("embedding" in ln for ln in idx_lines), idx_lines


def test_pq_index_incremental_append(spark, tmp_path):
    """New vectors enter the PQ index by encoding against the FROZEN
    codebooks and appending to the code relation — no retrain, no
    corpus re-encode, base files untouched (the incremental-ingest
    contract shared by the hash/band/CC/IVF indexes)."""
    import glob as _glob

    from tradesignal_mtm_runner_spark.operators.similarity import (
        append_to_pq_index,
        probe_pq_index,
        write_pq_index,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "pq_inc")
    write_pq_index(base, path, num_subspaces=4, num_codes=8)
    before = set(_glob.glob(f"{path}/*.parquet"))

    append_to_pq_index(batch, path)
    after = set(_glob.glob(f"{path}/*.parquet"))
    assert before <= after, "append must not rewrite existing files"
    assert len(after) > len(before)
    assert spark.read.parquet(path).count() == emb.count()

    # appended codes must flow through probe scoring end-to-end;
    # unlike IVF (cell co-location) the coarse M=4 x K=8 ADC gives no
    # top-3 recall guarantee, so rank the full corpus and check the
    # appended ids are scored candidates
    n_total = int(emb.count())
    queries = batch.limit(2)
    res = probe_pq_index(spark, queries, path, k=n_total).toPandas()
    assert len(res) > 0
    appended_ids = {int(r["vec_id"]) for r in batch.collect()}
    assert appended_ids - {int(q["vec_id"]) for q in queries.collect()} <= {
        int(c) for c in res["corpus_id"]
    }


def test_write_pq_index_rejects_append_mode(spark, tmp_path):
    """ADVICE r12: write_pq_index(mode='append') would append a second
    codebook generation to the sibling table, inflating num_k so
    probe_pq_index mis-indexes the flattened ADC LUT — the writer now
    refuses anything but overwrite and points at append_to_pq_index."""
    import pytest as _pytest

    from tradesignal_mtm_runner_spark.operators.similarity import write_pq_index
    from tradesignal_mtm_runner_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(16)
    with _pytest.raises(ValueError, match="append_to_pq_index"):
        write_pq_index(emb, f"{tmp_path}/pq", mode="append")


def test_bm25_index_probe_matches_live_and_prunes_scan(spark, bucket_db):
    """The standing BM25 lexical index (VERDICT r12 item 1): postings
    with denormalized doc length + append-only df/stats partials,
    probed at query-vocabulary cost. The probe must (a) reproduce the
    live oracle-checked bm25_topk exactly, and (b) push the query
    vocabulary into the postings scan as a data filter instead of
    reading the whole relation."""
    from tradesignal_mtm_runner_spark.operators.lexical import (
        probe_bm25_index,
        write_bm25_index,
    )
    from tradesignal_mtm_runner_spark.queries_r8 import (
        BM25_QUERIES,
        BM25_TOPK,
        bm25_topk,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    table = f"{bucket_db}.bm25_post"
    write_bm25_index(docs, table, num_buckets=4)

    probe = probe_bm25_index(spark, BM25_QUERIES, table, k=BM25_TOPK)
    live = bm25_topk(spark, SF_SMOKE)
    assert_frames_match(probe.toPandas(), live.toPandas(), "bm25_index_probe")

    # the query vocabulary must reach the parquet scan of BOTH index
    # relations as a pushed In(tok, ...) filter — the probe reads the
    # probed tokens' row groups, never the whole postings relation
    plan = P.explain_str(probe)
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters" in ln and "In(tok" in ln
    ]
    assert len(pushed) >= 2, plan


def test_bm25_index_append_equals_full_build(spark, bucket_db):
    """build(A) + append(B) must probe identically to build(A ∪ B):
    the append-only df/stats partial-count layout makes the global
    BM25 statistics exact under ingest (no frozen-model staleness, no
    rewrite). Also pins that appends never rewrite existing postings
    files."""
    import glob as _glob

    from tradesignal_mtm_runner_spark.operators.lexical import (
        append_to_bm25_index,
        probe_bm25_index,
        write_bm25_index,
    )
    from tradesignal_mtm_runner_spark.queries_r8 import BM25_QUERIES, BM25_TOPK

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    inc_t = f"{bucket_db}.bm25_inc"
    full_t = f"{bucket_db}.bm25_full"
    write_bm25_index(base, inc_t, num_buckets=4)
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {inc_t}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    before = set(_glob.glob(f"{loc.removeprefix('file:')}/*"))
    append_to_bm25_index(batch, inc_t, num_buckets=4)
    after = set(_glob.glob(f"{loc.removeprefix('file:')}/*"))
    assert before <= after and len(after) > len(before)

    write_bm25_index(docs, full_t, num_buckets=4)
    got = probe_bm25_index(spark, BM25_QUERIES, inc_t, k=BM25_TOPK)
    want = probe_bm25_index(spark, BM25_QUERIES, full_t, k=BM25_TOPK)
    assert_frames_match(got.toPandas(), want.toPandas(), "bm25_append_parity")
    assert got.count() > 0


def test_bm25_append_check_ids_guard(spark, bucket_db):
    """ADVICE r13: a re-append of already-indexed doc_ids silently
    double-counts postings/df/stats (the append-only partial layout
    hides it until probe scores drift). ``check_ids=True`` must reject
    an overlapping batch LOUDLY — naming offending ids — and must pass
    a genuinely-new batch through unchanged."""
    import pytest

    from tradesignal_mtm_runner_spark.operators.lexical import (
        append_to_bm25_index,
        validate_bm25_batch,
        write_bm25_index,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    t = f"{bucket_db}.bm25_guard"
    write_bm25_index(docs.filter(F.col("doc_id") % 4 != 0), t, num_buckets=4)

    overlap = docs.filter(F.col("doc_id") % 4 != 0).limit(3)
    with pytest.raises(ValueError, match="already-indexed"):
        append_to_bm25_index(overlap, t, num_buckets=4, check_ids=True)
    # the rejected append must not have touched the stats partials
    assert spark.table(f"{t}_stats").count() == 1

    fresh = docs.filter(F.col("doc_id") % 4 == 0)
    validate_bm25_batch(fresh, t)  # standalone helper: no raise
    append_to_bm25_index(fresh, t, num_buckets=4, check_ids=True)
    assert spark.table(f"{t}_stats").count() == 2


def test_edge_index_probe_matches_live_graph_queries(spark, bucket_db):
    """VERDICT r13 item 4: the standing co-purchase EDGE index must
    close the graph family's batch/standing asymmetry the way BM25/PQ
    did for retrieval. write_edge_index persists the support-cut graph
    (edges + degrees, bucketed); triangles_from_index and
    pagerank_from_index must reproduce the live lineitem-rescan
    queries value-for-value (the kernels are shared, so this pins the
    WRITE/READ path), and the probe plans must read ZERO lineitem
    bytes — graph-proportional cost is the whole point."""
    from tradesignal_mtm_runner_spark.operators.graph import (
        clustering_from_index,
        communities_from_index,
        components_from_index,
        embeddedness_from_index,
        kcore_from_index,
        linkpred_from_index,
        pagerank_from_index,
        topk_similar_from_index,
        triangles_from_index,
        write_edge_index,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import (
        PR_DAMP,
        PR_ITERS,
        _basket_pair_counts,
        copurchase_pagerank,
    )
    from tradesignal_mtm_runner_spark.queries_r13 import copurchase_triangles
    from tradesignal_mtm_runner_spark.queries_r14 import (
        KCORE_K,
        KCORE_PEELS,
        SIMILAR_TOPK,
        basket_support,
        copurchase_kcore,
        copurchase_topk_similar,
    )
    from tradesignal_mtm_runner_spark.queries_r14b import (
        LINK_MAX_DEG,
        LINK_TOPK,
        LPA_ROUNDS,
        copurchase_clustering,
        copurchase_communities,
        copurchase_link_predict,
    )

    baskets, pairs = _basket_pair_counts(spark, SF_SMOKE)
    t = f"{bucket_db}.edge_idx"
    write_edge_index(pairs, t, num_buckets=4, sup=basket_support(baskets))

    tri_probe = triangles_from_index(spark, t)
    pr_probe = pagerank_from_index(spark, t, PR_DAMP, PR_ITERS)
    kc_probe = kcore_from_index(spark, t, KCORE_K, KCORE_PEELS)
    cl_probe = clustering_from_index(spark, t)
    lp_probe = linkpred_from_index(spark, t, LINK_MAX_DEG, LINK_TOPK)
    ts_probe = topk_similar_from_index(spark, t, SIMILAR_TOPK)
    em_probe = embeddedness_from_index(spark, t)
    # graph-proportional: no lineitem (or any base-table) scan in the
    # probe plans — only the persisted index tables. (The LPA probe's
    # plan is checked the same way below, after its lineage cuts run.)
    for probe in (
        tri_probe, pr_probe, kc_probe, cl_probe, lp_probe, ts_probe, em_probe
    ):
        plan = P.explain_str(probe)
        assert "lineitem" not in plan.lower(), plan
    co_probe = communities_from_index(spark, t, LPA_ROUNDS)
    assert "lineitem" not in P.explain_str(co_probe).lower()
    from tradesignal_mtm_runner_spark.queries_r15 import (
        COMP_ITERS,
        copurchase_components,
    )

    cc_probe = components_from_index(spark, t, COMP_ITERS)
    assert "lineitem" not in P.explain_str(cc_probe).lower()

    assert_frames_match(
        tri_probe.toPandas(),
        copurchase_triangles(spark, SF_SMOKE).toPandas(),
        "edge_index_triangles",
    )
    assert_frames_match(
        pr_probe.toPandas(),
        copurchase_pagerank(spark, SF_SMOKE).toPandas(),
        "edge_index_pagerank",
    )
    assert_frames_match(
        kc_probe.toPandas(),
        copurchase_kcore(spark, SF_SMOKE).toPandas(),
        "edge_index_kcore",
    )
    assert_frames_match(
        co_probe.toPandas(),
        copurchase_communities(spark, SF_SMOKE).toPandas(),
        "edge_index_communities",
    )
    assert_frames_match(
        cl_probe.toPandas(),
        copurchase_clustering(spark, SF_SMOKE).toPandas(),
        "edge_index_clustering",
    )
    assert_frames_match(
        lp_probe.toPandas(),
        copurchase_link_predict(spark, SF_SMOKE).toPandas(),
        "edge_index_linkpred",
    )
    assert_frames_match(
        ts_probe.toPandas(),
        copurchase_topk_similar(spark, SF_SMOKE).toPandas(),
        "edge_index_topk_similar",
    )
    assert_frames_match(
        cc_probe.toPandas(),
        copurchase_components(spark, SF_SMOKE).toPandas(),
        "edge_index_components",
    )
    from tradesignal_mtm_runner_spark.queries_r15 import (
        copurchase_edge_embeddedness,
    )

    assert_frames_match(
        em_probe.toPandas(),
        copurchase_edge_embeddedness(spark, SF_SMOKE).toPandas(),
        "edge_index_embeddedness",
    )
    # the sup sidecar is opt-in: an index written WITHOUT it must fail
    # loud on the similarity probe (never silently rescan lineitem)
    t2 = f"{bucket_db}.edge_idx_nosup"
    write_edge_index(pairs, t2, num_buckets=4)
    with pytest.raises(ValueError, match="no 'sup' column"):
        topk_similar_from_index(spark, t2, SIMILAR_TOPK)
    # and a sup relation that does not cover every edge endpoint
    # surfaces as NULLs in the sidecar — the probe must refuse to rank
    # over them (review r15), never emit NULL-jaccard top-k rows
    t3 = f"{bucket_db}.edge_idx_gapsup"
    narrow_sup = basket_support(baskets).limit(1)
    write_edge_index(pairs, t3, num_buckets=4, sup=narrow_sup)
    with pytest.raises(ValueError, match="NULL sup"):
        topk_similar_from_index(spark, t3, SIMILAR_TOPK)


def test_edge_partials_append_equals_full_build(spark, bucket_db):
    """The append-only ingest form of the co-purchase graph: pair
    counts are ADDITIVE when batches are whole orders, so
    build(A) + append(B) must FOLD identically to build(A ∪ B) and to
    the live support-cut pair relation — including a pair whose count
    only crosses the support cut once both batches are in (the
    non-monotonicity that forces write_edge_index to rebuild is
    exactly what fold-time cutting absorbs). Appends must write new
    files only; the orders sidecar must reject a re-appended order."""
    import glob as _glob

    import pytest

    from tradesignal_mtm_runner_spark.operators.graph import (
        append_to_edge_partials,
        edges_from_partials,
        node_degrees,
        triangle_counts,
        validate_edge_batch,
        write_edge_partials,
    )
    from tradesignal_mtm_runner_spark.queries_r10b import (
        BASKET_MIN_SUP,
        _basket_pair_counts,
    )
    from tradesignal_mtm_runner_spark.queries_r13 import copurchase_triangles

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    half_a = li.filter(F.col("l_orderkey") % 2 == 0)
    half_b = li.filter(F.col("l_orderkey") % 2 == 1)

    inc_t = f"{bucket_db}.edge_inc"
    full_t = f"{bucket_db}.edge_full"
    write_edge_partials(half_a, inc_t, num_buckets=4)
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {inc_t}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    before = set(_glob.glob(f"{loc.removeprefix('file:')}/*"))
    append_to_edge_partials(half_b, inc_t, num_buckets=4, check_orders=True)
    after = set(_glob.glob(f"{loc.removeprefix('file:')}/*"))
    assert before <= after and len(after) > len(before)

    write_edge_partials(li, full_t, num_buckets=4)
    inc_edges = edges_from_partials(spark, inc_t, BASKET_MIN_SUP)
    full_edges = edges_from_partials(spark, full_t, BASKET_MIN_SUP)
    # the fold is SHUFFLE-FREE: bucketing on part_a already clusters
    # (part_a, part_b), so the sum+cut aggregate rides the bucket
    # layout in place — probing the partials never re-shuffles them
    assert P.exchange_count(inc_edges) == 0, P.explain_str(inc_edges)
    live_pairs = _basket_pair_counts(spark, SF_SMOKE)[1]
    assert_frames_match(
        inc_edges.toPandas(), full_edges.toPandas(), "edge_partials_append"
    )
    assert_frames_match(
        inc_edges.toPandas(), live_pairs.toPandas(), "edge_partials_vs_live"
    )
    # the additivity matters: some pair must be sub-cut in EACH batch
    # alone (per-batch partial rows all < MIN_SUP) yet cross the cut
    # combined — else the fold-time-cut pin is vacuous
    crossers = (
        spark.table(inc_t)
        .groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("pair_cnt").alias("mx"),
            F.sum("pair_cnt").alias("tot"),
        )
        .filter(
            (F.col("n_rows") >= 2)
            & (F.col("mx") < BASKET_MIN_SUP)
            & (F.col("tot") >= BASKET_MIN_SUP)
        )
        .count()
    )
    assert crossers > 0

    # downstream kernels consume the fold directly
    tri = triangle_counts(
        inc_edges, node_degrees(inc_edges).select("pk", "deg")
    )
    assert_frames_match(
        tri.toPandas(),
        copurchase_triangles(spark, SF_SMOKE).toPandas(),
        "edge_partials_triangles",
    )

    # guard: re-appending half_b's orders must fail loudly and leave
    # the orders sidecar untouched
    n_orders = spark.table(f"{inc_t}_orders").count()
    with pytest.raises(ValueError, match="already-indexed"):
        append_to_edge_partials(
            half_b.limit(10), inc_t, num_buckets=4, check_orders=True
        )
    validate_edge_batch(half_a.limit(0), inc_t)  # empty batch: no raise
    assert spark.table(f"{inc_t}_orders").count() == n_orders


def test_novelty_index_probe_matches_live_and_is_idempotent(spark, bucket_db):
    """The standing n-gram first-seen index (operators/novelty.py):
    (1) probe == the live split query value-for-value (shared kernel);
    (2) the probe plan reads ZERO documents bytes — only the persisted
    gram partials and the batch relation; (3) build(A) + append(B)
    folds identically to build(A ∪ B) for an ARBITRARY split (min is
    commutative — no whole-order / ingest-order contract); (4) the
    index is IDEMPOTENT: re-appending the same batch changes nothing
    in the fold — the family's only standing index where a retried
    append needs no identity guard at all."""
    from tradesignal_mtm_runner_spark.operators.novelty import (
        append_to_novelty_index,
        folded_first_seen,
        probe_novelty_index,
        write_novelty_index,
    )
    from tradesignal_mtm_runner_spark.queries_pipeline import _docs
    from tradesignal_mtm_runner_spark.queries_r15 import (
        NOVELTY_N,
        ngram_novelty_probe,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    max_id = d.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    t = (int(max_id) * 2) // 3
    base = d.filter(F.col("doc_id") <= t)
    batch = d.filter(F.col("doc_id") > t)

    idx = f"{bucket_db}.novelty_idx"
    write_novelty_index(base, idx, NOVELTY_N, num_buckets=4)

    probe = probe_novelty_index(spark, batch, idx, NOVELTY_N)
    live = ngram_novelty_probe(spark, SF_SMOKE)
    assert_frames_match(
        probe.toPandas(), live.toPandas(), "novelty_index_probe"
    )

    # zero corpus bytes: the probe plan scans the index + the batch
    # relation only (the batch here is a planted in-memory frame)
    planted = spark.createDataFrame(
        [(10_000_000, "zq zq zq zq")], "doc_id long, text string"
    )
    plan = P.explain_str(probe_novelty_index(spark, planted, idx, NOVELTY_N))
    assert "documents" not in plan.lower(), plan

    # arbitrary-split additivity: even/odd halves, NOT an ordered cut
    inc = f"{bucket_db}.novelty_idx_inc"
    write_novelty_index(d.filter(F.col("doc_id") % 2 == 0), inc, NOVELTY_N,
                        num_buckets=4)
    append_to_novelty_index(d.filter(F.col("doc_id") % 2 == 1), inc,
                            NOVELTY_N, num_buckets=4)
    full = f"{bucket_db}.novelty_idx_full"
    write_novelty_index(d, full, NOVELTY_N, num_buckets=4)
    assert_frames_match(
        folded_first_seen(spark, inc).toPandas(),
        folded_first_seen(spark, full).toPandas(),
        "novelty_append_equals_build",
    )

    # idempotence: re-append the SAME odd half — the fold is unchanged
    append_to_novelty_index(d.filter(F.col("doc_id") % 2 == 1), inc,
                            NOVELTY_N, num_buckets=4)
    assert_frames_match(
        folded_first_seen(spark, inc).toPandas(),
        folded_first_seen(spark, full).toPandas(),
        "novelty_reappend_idempotent",
    )


def test_compact_novelty_index(spark, bucket_db):
    """compact_novelty_index (VERDICT r15 item 4): fold the partial
    generations into one WITHOUT a corpus rebuild. Pins: (1) probe
    results are byte-identical before and after compaction (min of
    min-partials == min of the folded relation); (2) the physical
    footprint shrinks — fewer files AND fewer rows (the retried-append
    duplicates fold away); (3) the swapped-in table keeps the bucketed
    layout; (4) re-compacting an already-compact index is a no-op
    fold."""
    from tradesignal_mtm_runner_spark.operators.novelty import (
        append_to_novelty_index,
        compact_novelty_index,
        probe_novelty_index,
        write_novelty_index,
    )
    from tradesignal_mtm_runner_spark.queries_r15 import NOVELTY_N

    d = load_table(spark, SF_SMOKE, "documents")
    idx = f"{bucket_db}.novelty_idx_cpt"
    write_novelty_index(d.filter(F.col("doc_id") % 3 == 0), idx,
                        NOVELTY_N, num_buckets=4)
    append_to_novelty_index(d.filter(F.col("doc_id") % 3 == 1), idx,
                            NOVELTY_N, num_buckets=4)
    append_to_novelty_index(d.filter(F.col("doc_id") % 3 == 2), idx,
                            NOVELTY_N, num_buckets=4)
    # a RETRIED batch: harmless for the fold, pure space until compaction
    append_to_novelty_index(d.filter(F.col("doc_id") % 3 == 2), idx,
                            NOVELTY_N, num_buckets=4)

    batch = d.filter(F.col("doc_id") % 7 == 3)
    before = probe_novelty_index(spark, batch, idx, NOVELTY_N).toPandas()
    files_before = len(spark.table(idx).inputFiles())
    rows_before = spark.table(idx).count()

    compact_novelty_index(spark, idx, num_buckets=4)

    after = probe_novelty_index(spark, batch, idx, NOVELTY_N).toPandas()
    assert_frames_match(before, after, "novelty_probe_before_vs_after")
    assert len(spark.table(idx).inputFiles()) < files_before
    assert spark.table(idx).count() < rows_before  # duplicates folded away
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {idx}").collect()
    }
    assert desc.get("Num Buckets") == "4"
    assert "ngram" in desc.get("Bucket Columns", "")

    # idempotent: compacting the already-compact index changes nothing
    rows_compact = spark.table(idx).count()
    compact_novelty_index(spark, idx, num_buckets=4)
    assert spark.table(idx).count() == rows_compact
    assert_frames_match(
        probe_novelty_index(spark, batch, idx, NOVELTY_N).toPandas(),
        after,
        "novelty_probe_recompact",
    )
