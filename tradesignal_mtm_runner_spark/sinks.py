"""Output connectors (sinks).

The reference publishes one JSON document per (strategy, symbol) run
with pnl / drawdown / sharpe / epochs / trade-archive sizes
(reference: models.py:203 Mtm_Result.to_query_dict, sample at
samples/sample_pnlresult.jsonl). ``write_results_jsonl`` reproduces
that surface as a DISTRIBUTED write: the result lines are built with
column expressions (to_json over a struct — no driver-side loop), so
a 10^6-symbol sweep writes from every executor in parallel.

``write_timeline`` persists bar-level timelines partitioned for
downstream consumers; ``write_bucketed`` is the write-side of the
co-located join pattern (pay the shuffle once at write time, join
shuffle-free forever after — see tests/test_scale_patterns.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference Mtm_Result queryable fields (models.py:240-255)
RESULT_FIELDS = [
    "batch_id",
    "data_key",
    "strategy_name",
    "strategy_id",
    "symbol",
    "pnl",
    "max_drawdown",
    "sharpe_ratio",
    "mkt_start_epoch",
    "mkt_end_epoch",
    "run_start_epoch",
    "run_end_epoch",
    "long_trades_archive_size",
    "short_trades_archive_size",
    "long_trades_outstanding_size",
    "short_trades_outstanding_size",
]


def _count(direction: str, closed: bool):
    hit = (F.col("direction") == direction) & (F.col("is_closed") == closed)
    return F.sum(hit.cast("long"))


def mtm_result_lines(
    summary: DataFrame,
    trades: DataFrame | None = None,
    batch_id: str = "",
    data_key: str = "",
    strategy_name: str = "",
    strategy_id: str = "",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One JSON line per group in the reference's result shape.

    ``summary`` is summarize_timeline output; ``trades`` (optional)
    fills the four archive/outstanding size fields, 0 when absent.
    Entirely declarative: a count aggregate, one join on the group
    key, and a to_json projection."""
    group_cols = group_cols or ["symbol"]
    out = summary
    if trades is not None:
        counts = trades.groupBy(*group_cols).agg(
            _count("LONG", True).alias("long_trades_archive_size"),
            _count("SHORT", True).alias("short_trades_archive_size"),
            _count("LONG", False).alias("long_trades_outstanding_size"),
            _count("SHORT", False).alias("short_trades_outstanding_size"),
        )
        out = out.join(counts, on=group_cols, how="left")
    for c in (
        "long_trades_archive_size",
        "short_trades_archive_size",
        "long_trades_outstanding_size",
        "short_trades_outstanding_size",
    ):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(0).cast("long"))
    out = out.na.fill(0, subset=[c for c in out.columns if c.endswith("_size")])
    meta = {
        "batch_id": batch_id,
        "data_key": data_key,
        "strategy_name": strategy_name,
        "strategy_id": strategy_id,
    }
    fields = []
    emitted: set[str] = set()
    for name in RESULT_FIELDS:
        # precedence (review r12): an explicitly-passed meta value
        # wins; an EMPTY meta default must NOT shadow a real
        # same-named summary column (a sweep whose summary carries
        # strategy_name previously emitted "" instead of the value)
        if name in meta and (meta[name] != "" or name not in out.columns):
            fields.append(F.lit(meta[name]).alias(name))
        elif name in out.columns:
            fields.append(F.col(name))
        elif name in ("run_start_epoch", "run_end_epoch"):
            # distributed sweeps have no per-result run clock; keep the
            # reference's queryable key set with its 0 default
            fields.append(F.lit(0).cast("long").alias(name))
        else:
            continue
        emitted.add(name)
    # group cols beyond symbol (e.g. config_id from a sweep) ride
    # along — unless already emitted above (duplicate JSON keys break
    # strict parsers, review r12)
    fields += [F.col(c) for c in group_cols if c != "symbol" and c not in emitted]
    # ignoreNullFields=false: a NULL metric must surface as null, not
    # silently vanish from the reference's fixed queryable key set
    return out.select(
        F.to_json(F.struct(*fields), {"ignoreNullFields": "false"}).alias(
            "value"
        )
    )


def write_results_jsonl(
    summary: DataFrame,
    path: str,
    trades: DataFrame | None = None,
    mode: str = "overwrite",
    **meta: str,
) -> None:
    """Distributed JSONL result sink (reference sample_pnlresult.jsonl
    shape). Coalesce is deliberately NOT applied — at scale you want
    many small result files, not one driver-melting file."""
    mtm_result_lines(summary, trades, **meta).write.mode(mode).text(path)


def write_timeline(
    timeline: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist a bar-level timeline. Default is UNpartitioned parquet:
    a directory per symbol is right for 100s of symbols and wrong for
    10^6 (file-per-partition explosion) — callers choose. Parquet gets
    column pruning + predicate pushdown on read either way."""
    w = timeline.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    available_now: bool = True,
):
    """Streaming parquet sink. The file sink's commit log gives
    exactly-once per micro-batch: a re-run after failure resumes from
    the checkpoint and never double-writes a batch — the durable
    output path for the streaming MTM timeline. Returns the started
    StreamingQuery (caller awaits/stops)."""
    w = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def ensure_table_absent(spark, table: str) -> None:
    """DROP TABLE IF EXISTS *plus* best-effort removal of the managed
    table's warehouse location. A killed session leaves the location
    directory on disk while the (in-memory) catalog forgets the table
    — the next ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode. Call before
    creating any managed table whose name can recur across sessions
    (the streaming band index, test fixtures)."""
    import os
    import shutil
    from urllib.parse import urlparse

    def _local_path(uri: str) -> str | None:
        # file:/p, file:///p, or a bare path -> local path; anything
        # else (hdfs://, s3a://) is not ours to rmtree.
        parsed = urlparse(uri)
        if parsed.scheme in ("", "file"):
            return parsed.path or uri
        return None

    # While the table is still cataloged, ask the catalog for its REAL
    # location (honors custom LOCATION, case folding, remote warehouses)
    # rather than string-guessing from the warehouse dir.
    loc = None
    cataloged_remote = False
    try:
        if spark.catalog.tableExists(table):
            for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if row[0] == "Location":
                    loc = _local_path(row[1])
                    # a cataloged table with a REMOTE location is not
                    # ours to rmtree — and guessing a local path for it
                    # would delete an unrelated directory (review r12)
                    cataloged_remote = loc is None
                    break
    except Exception:
        pass

    spark.sql(f"DROP TABLE IF EXISTS {table}")

    if cataloged_remote:
        return
    if loc is None:
        # Orphaned-directory case: the catalog already forgot the table,
        # so fall back to the default managed location under the
        # warehouse dir (URI-parsed, not prefix-stripped).
        warehouse = _local_path(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        )
        if warehouse is None:
            return  # remote warehouse: nothing to clean locally
        # rightmost two parts = (db, name): a 3-part
        # catalog.db.name must not be split as db='catalog'
        # (review r12: that guessed a path that never exists and the
        # real orphan survived to kill the next saveAsTable)
        parts = table.split(".")
        if len(parts) >= 2:
            db, name = parts[-2], parts[-1]
            loc = os.path.join(warehouse, f"{db.lower()}.db", name.lower())
        else:
            loc = os.path.join(warehouse, table.lower())
    shutil.rmtree(loc, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write as a bucketed table: joins/aggregations on the bucket
    key then need zero shuffles (tests/test_scale_patterns.py pins
    this). ``table`` may be db-qualified.

    OPTIMIZATION r16 (guide §6 — output file sizing): repartition by
    the bucket columns into a multiple of ``num_buckets`` partitions
    BEFORE the write. A bucketed write emits one file per (task,
    bucket) pair, so an N-partition input produced up to
    N×num_buckets tiny files per table (measured 4.8 s for a trivial
    5000-row 32-bucket write — ~1024 files — vs 0.4 s for the same
    rows as one parquet file); aligning the shuffle with the bucket
    hash makes each task hold rows of exactly one bucket.

    ADVICE r16 (write parallelism / hot-bucket stragglers): the
    partition count is k×num_buckets with k = ceil(cores /
    num_buckets), not num_buckets flat — (h mod k·n) mod n == h mod n
    for Murmur3 hashes, so every shuffle partition still lands in ONE
    bucket (k files per bucket), but a bucket's data now spreads over
    k tasks instead of serializing on one: at cluster scale a hot
    bucket key stops being a single-task straggler and the write uses
    the whole cluster. Locally k = 1 (32 cores / 32 buckets) — the
    bench layout and numbers are unchanged."""
    k = max(
        1,
        -(-df.sparkSession.sparkContext.defaultParallelism // num_buckets),
    )
    df = df.repartition(k * num_buckets, *[F.col(c) for c in bucket_cols])
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
