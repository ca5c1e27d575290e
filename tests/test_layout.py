"""Z-order layout: multi-dimensional file skipping beats single-column
sort on the off-sort dimension, at equal write cost (one range
shuffle). See operators/layout.py for the 100 TB rationale."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE
from tradesignal_mtm_runner_spark.operators.layout import (
    file_skip_stats,
    write_zordered,
    zorder_value,
)
from tradesignal_mtm_runner_spark.sources import load_table

N_FILES = 16


def _bounds(df, cols):
    row = df.agg(
        *[f(c).alias(f"{n}_{c}") for c in cols for n, f in (("lo", F.min), ("hi", F.max))]
    ).first()
    return {c: (float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in cols}


def test_zorder_skips_on_both_dims(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value", "event_id")
    bounds = _bounds(ev, ["user_id", "value"])

    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    # single-column clustering: perfect on user_id, blind on value
    (
        ev.repartitionByRange(N_FILES, "user_id", "event_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    write_zordered(ev, zord, ["user_id", "value"], bounds, num_files=N_FILES)

    u_lo, u_hi = bounds["user_id"]
    v_lo, v_hi = bounds["value"]
    u_span, v_span = u_hi - u_lo, v_hi - v_lo
    # top-quarter box on user_id; a mid-high band on value (the events
    # value column is right-skewed, so a band ABOVE the dense mass
    # isolates the layout effect — a tail box would also get lucky
    # accidental pruning on the linear layout, a mass box prunes
    # nothing anywhere)
    u_box = (u_hi - u_span / 4.0, u_hi)
    v_box = (v_lo + 0.40 * v_span, v_lo + 0.50 * v_span)

    lin_u, total_lin = file_skip_stats(linear, "user_id", *u_box)
    lin_v, _ = file_skip_stats(linear, "value", *v_box)
    z_u, total_z = file_skip_stats(zord, "user_id", *u_box)
    z_v, _ = file_skip_stats(zord, "value", *v_box)

    assert total_lin >= N_FILES and total_z >= N_FILES
    # the single-column sort prunes its own dimension near-perfectly...
    assert lin_u >= total_lin // 2
    # ...and (almost) nothing on the off-sort one
    assert lin_v <= total_lin // 8
    # z-order prunes BOTH dimensions substantially
    assert z_u >= total_z * 3 // 8, f"zorder user_id skip {z_u}/{total_z}"
    assert z_v >= total_z // 2, f"zorder value skip {z_v}/{total_z}"
    assert z_v > lin_v


def test_zorder_value_is_jvm_side(spark):
    """The Morton code compiles into the plan (no Python eval): the
    physical plan for the z-value projection is pure Project over the
    scan, inside WholeStageCodegen."""
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    z = zorder_value(ev, ["user_id", "value"], {"user_id": (0, 15), "value": (0.0, 330.0)})
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(N)" is the WholeStageCodegen marker in executedPlan toString
    assert plan.lstrip().startswith("*("), plan[:200]


def test_zorder_write_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value", "event_id")
    path = str(tmp_path / "zw")
    write_zordered(
        ev, path, ["user_id", "value"], _bounds(ev, ["user_id", "value"]), num_files=8
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


def test_static_and_dynamic_partition_pruning(spark, tmp_path):
    """Hive-style partitioned layout: (1) a literal predicate on the
    partition column prunes at PLANNING time (only matching
    directories are even listed into the scan); (2) a join against a
    filtered dim prunes at RUNTIME via dynamic partition pruning —
    the fact scan's partition filter is fed from the dim's broadcast
    (the mechanism that saves the 100 TB fact scan when the query's
    selectivity lives on the dim side)."""
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "ev_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(path)
    fact = spark.read.parquet(path)

    # (1) static pruning: the file list itself shrinks
    some_day = ev.select(F.min("day").alias("d")).first()["d"]
    pruned = fact.filter(F.col("day") == F.lit(some_day))
    n_files_pruned = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    n_files_total = len(fact.inputFiles())
    assert 0 < n_files_pruned < n_files_total
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert pruned.count() == ev.filter(F.col("day") == F.lit(some_day)).count()

    # (2) dynamic pruning: dim is an independent tiny relation with a
    # non-partition-column filter, so the fact-side partition list is
    # only knowable at runtime
    days = [r["d"] for r in ev.select(F.col("day").alias("d")).distinct().collect()]
    dim = spark.createDataFrame(
        [(d, i % 7) for i, d in enumerate(sorted(days))], "day date, bucket int"
    )
    joined = fact.join(dim.filter(F.col("bucket") == 0), on="day")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:500]
    want = ev.join(
        dim.filter(F.col("bucket") == 0).select("day"), on="day"
    ).count()
    assert joined.count() == want > 0


def test_compact_files_shrinks_file_count(spark, tmp_path):
    """200 tiny files compact to the metadata-computed target count
    with every row preserved — the streaming-sink maintenance job."""
    from tradesignal_mtm_runner_spark.operators.layout import compact_files

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    frag = str(tmp_path / "fragmented")
    ev.repartition(200).write.mode("overwrite").parquet(frag)
    import glob

    n_small = len(glob.glob(f"{frag}/*.parquet"))
    assert n_small >= 150

    compacted = str(tmp_path / "compacted")
    n_target = compact_files(spark, frag, compacted, target_file_bytes=1 << 20)
    n_big = len(glob.glob(f"{compacted}/*.parquet"))
    assert n_big <= max(4, n_target + 1) < n_small
    back = spark.read.parquet(compacted)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]


def test_register_views_enables_raw_sql(spark):
    """The SQL surface: registered views answer raw ANSI SQL with the
    same result as the DataFrame query (same logical plans under
    Catalyst)."""
    from tradesignal_mtm_runner_spark.sources import register_views

    names = register_views(spark, SF_SMOKE)
    assert "lineitem" in names and "orders" in names
    got = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority"
    )
    want = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_quantile_bounds_clip_the_tail(spark, tmp_path):
    """quantile_bounds must clip heavy tails: the hi bound for the
    right-skewed events value column lands well below max(value), the
    grid still covers the data (clamped, row-count preserved), and the
    clipped-grid z-order prunes the dense value body at least as well
    as the min/max grid."""
    from tradesignal_mtm_runner_spark.operators.layout import quantile_bounds

    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "value", "event_id"
    )
    qb = quantile_bounds(ev, ["user_id", "value"], clip=0.02)
    v_max = ev.agg(F.max("value")).first()[0]
    assert qb["value"][1] < v_max * 0.9, (qb["value"], v_max)
    assert qb["value"][0] <= qb["value"][1]

    mm = _bounds(ev, ["user_id", "value"])
    p_mm, p_qb = str(tmp_path / "mm"), str(tmp_path / "qb")
    write_zordered(ev, p_mm, ["user_id", "value"], mm, num_files=N_FILES)
    write_zordered(ev, p_qb, ["user_id", "value"], qb, num_files=N_FILES)
    assert spark.read.parquet(p_qb).count() == ev.count()

    # probe a band inside the dense value body (between the clipped
    # quantiles), where the clipped grid has strictly finer cells
    lo, hi = qb["value"]
    band = (lo + 0.40 * (hi - lo), lo + 0.50 * (hi - lo))
    skip_mm, tot_mm = file_skip_stats(p_mm, "value", *band)
    skip_qb, tot_qb = file_skip_stats(p_qb, "value", *band)
    assert tot_qb >= N_FILES
    assert skip_qb >= skip_mm, f"quantile grid {skip_qb}/{tot_qb} vs min/max {skip_mm}/{tot_mm}"


def test_quantile_bounds_all_null_column_is_clear_error(spark):
    """An all-NULL column used to die with an unpack ValueError deep in
    the zip; it must name the offending column instead (ADVICE r4)."""
    import pytest as _pytest

    from tradesignal_mtm_runner_spark.operators.layout import quantile_bounds

    df = spark.range(10).selectExpr(
        "cast(id as double) AS ok", "cast(NULL as double) AS dead"
    )
    with _pytest.raises(ValueError, match="dead"):
        quantile_bounds(df, ["ok", "dead"])
    assert set(quantile_bounds(df, ["ok"])) == {"ok"}


def test_interleave_bits_rejects_int64_overflowing_geometry(spark):
    """Review r12: JVM shiftleft masks the shift count to 6 bits, so
    bit position 64 silently wraps to 0 and columns alias — the guard
    must reject any len(cols)*bits > 63 up front."""
    import pytest

    from tradesignal_mtm_runner_spark.operators.layout import (
        interleave_bits,
    )

    with pytest.raises(ValueError, match="wrap"):
        interleave_bits([F.lit(1)] * 5, bits=16)  # 80 positions
    with pytest.raises(ValueError, match="wrap"):
        interleave_bits([F.lit(1)] * 4, bits=16)  # sign bit + wrap
    interleave_bits([F.lit(1)] * 3, bits=21)  # 63 — legal


def test_file_skip_stats_names_missing_column(spark, tmp_path):
    """Review r12: a misspelled column must raise a ValueError naming
    it, not pyarrow's cryptic 'IndexError: -1 out of bounds'."""
    import pytest

    from tradesignal_mtm_runner_spark.operators.layout import (
        file_skip_stats,
    )

    p = str(tmp_path / "t")
    load_table(spark, SF_SMOKE, "events").limit(10).write.parquet(p)
    with pytest.raises(ValueError, match="user_idd"):
        file_skip_stats(p, "user_idd", 0, 1)
