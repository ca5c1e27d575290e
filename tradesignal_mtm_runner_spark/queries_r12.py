"""Round-12 batch: tokenizer-ready SHARD PACKING — the one pipeline
stage named in the brief with no dedicated key until now (VERDICT r11
item 8). ``corpus_pack_shards`` composes the C64 global shuffle
(affine-bijection permutation → shard + in-shard order, no RNG
service, no global sort) with the C24 context-window packing (running
token count cut at PACK_CONTEXT boundaries) so the output is the
manifest a training data loader streams directly: one row per
(shard, pack) carrying the ORDERED doc ids, doc count and token count.

No counterpart in the pandas reference (its scope is the MTM loop,
reference runner_mtm.py:71); this is the LLM-data-pipeline surface the
build brief adds on top of the reference.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as TX
from .queries_pipeline import _docs
from .queries_pipeline_extras import PACK_CONTEXT
from .queries_r11 import N_SHARDS, PERM_A, PERM_B, PERM_P, _perm


def pack_shard_rows(
    spark: SparkSession, sf_dir: str, num_shards: int = N_SHARDS
) -> DataFrame:
    """The per-doc pack assignment feeding both the manifest query and
    the physical writer (operators/layout.write_packed_shards): one
    row per doc with (shard, doc_id, n, shard_pos, pack_id). Both
    window expressions (in-shard position + running token offset)
    share the shard partitioning and (perm, doc_id) order, so they
    cost ONE exchange together.

    NULL text (failed extraction — the same population the r12
    dedup_exact fix acknowledges) counts as 0 tokens: without the
    coalesce, size(split(trim(NULL))) is NULL, the running offset and
    pack_id go NULL, and those docs silently drop out of positional
    packing — the bijection/token-conservation invariants would fail
    for exactly the rows hardest to notice (ADVICE r12). The oracle
    mirrors the coalesce; a NULL-text row is pinned in
    tests/test_r12.py."""
    n = F.coalesce(F.size(TX.tokens(F.col("text"))).cast("long"), F.lit(0).cast("long"))
    perm = _perm(F.col("doc_id"))
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.alias("n"),
        perm.alias("perm"),
        (perm % num_shards).cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("perm", "doc_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.select(
        "shard",
        "doc_id",
        "n",
        F.row_number().over(w).cast("long").alias("shard_pos"),
        F.floor(
            (F.sum("n").over(wc) - F.col("n")) / F.lit(float(PACK_CONTEXT))
        )
        .cast("long")
        .alias("pack_id"),
    )


def pack_corpus_to_shards(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    num_shards: int | None = None,
    target_shard_bytes: int | None = None,
) -> int:
    """The PRODUCTION packing entry point (VERDICT r13 item 7): shard-
    assign the corpus and physically materialize the packed shards in
    one call, with the shard count AUTO-SIZED from the corpus bytes by
    default — ``num_shards=None`` → ``auto_num_shards`` over the
    documents parquet (ceil(bytes / 1 GiB target), Hadoop-FS metadata
    listing, no data read). A fixed shard count is a scale trap: at
    100 TB, N=16 means 6 TB single-task sorts; auto-sizing yields ~10⁵
    bounded tasks instead (per-task input ≤ target pinned in
    tests/test_r12.py). The ``corpus_pack_shards`` QUERY key keeps the
    fixed N_SHARDS so its oracle stays stable; this wrapper is what a
    deployment calls. Returns the shard count used."""
    from .operators.layout import (
        TARGET_SHARD_BYTES,
        auto_num_shards,
        write_packed_shards,
    )

    if num_shards is None:
        num_shards = auto_num_shards(
            spark,
            _os.path.join(sf_dir, "documents.parquet"),
            target_shard_bytes=target_shard_bytes or TARGET_SHARD_BYTES,
        )
    write_packed_shards(
        pack_shard_rows(spark, sf_dir, num_shards=num_shards),
        out_path,
        num_shards,
    )
    return num_shards


def corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-ready packed shards: every doc is placed by the C64
    affine permutation (shard = perm mod N_SHARDS, in-shard order =
    (perm, doc_id) — deterministic, uniformly shuffled, bijective on
    the id domain < PERM_P), then packed in that order into
    PACK_CONTEXT-token context windows with the C24 convention (a doc
    belongs to the pack its START offset falls in). Output: one row
    per (shard, pack_id) with the ordered ``doc_ids`` manifest (comma
    string — engine-portable), doc count and token count.

    Plan shape: ONE shard-partitioned window computes both the
    running token offset and the in-shard position (same partition +
    order ⇒ one exchange), the groupBy(shard, pack_id) is a prefix of
    that partitioning, and nothing global is ever sorted — per-task
    state is bounded by corpus/N_SHARDS rows at any scale. Bijection
    + token conservation pinned in tests/test_r12.py."""
    c = pack_shard_rows(spark, sf_dir)
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("shard_pos", "doc_id"))),
        lambda el: el["doc_id"].cast("string"),
    )
    return (
        c.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("pack_tokens"),
            F.array_join(ordered, ",").alias("doc_ids"),
        )
        .select("shard", "pack_id", "n_docs", "pack_tokens", "doc_ids")
    )


CORPUS_PACK_SHARDS_SQL = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         COALESCE(CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT),
                  0) AS n,
         ({PERM_A} * (doc_id % {PERM_P}) + {PERM_B}) % {PERM_P} AS perm
  FROM documents
),
c AS (
  SELECT CAST(perm % {N_SHARDS} AS BIGINT) AS shard,
         doc_id, n,
         CAST(row_number() OVER (PARTITION BY perm % {N_SHARDS}
                                 ORDER BY perm, doc_id) AS BIGINT)
           AS shard_pos,
         CAST(floor((sum(n) OVER (PARTITION BY perm % {N_SHARDS}
                                  ORDER BY perm, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - n)
                    / {float(PACK_CONTEXT)}) AS BIGINT) AS pack_id
  FROM d
)
SELECT shard, pack_id,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS pack_tokens,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY shard_pos)
         AS doc_ids
FROM c
GROUP BY shard, pack_id
"""


R12_QUERIES: dict = {
    "corpus_pack_shards": corpus_pack_shards,
}

R12_ORACLES: dict = {
    "corpus_pack_shards": CORPUS_PACK_SHARDS_SQL,
}
