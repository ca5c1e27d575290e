"""LLM-data-pipeline queries (SURVEY.md §2 block C) over documents /
embeddings, each with a DuckDB oracle.

Portability contract: every hash is md5-hex (bit-identical across
engines); tokenization is split-on-spaces with identical semantics;
integer counts cast to BIGINT on both sides; ratios/cosines rounded
to 9 decimals; ANN ranking happens on the ROUNDED cosine so rank
assignment cannot diverge on sub-rounding float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as TX
from .sources import load_table

R = 9
MINHASH_K = 16
BANDS = 4
SHINGLE_K = 3
ANN_QUERIES = 10
ANN_TOPK = 5
JACCARD_MIN = 0.1
#: Hot-bucket guard for LSH candidate generation: a (band, band_sig)
#: bucket of B docs yields ~B^2/2 candidate pairs, so one degenerate
#: bucket (boilerplate, empty docs) can dwarf the rest of the corpus
#: combined. Buckets past the cap are dropped from candidate
#: generation on BOTH engines (mirrored in the oracle SQL); realistic
#: dup clusters sit far below it at every tested SF, so results are
#: unchanged while the blowup is structurally impossible.
LSH_MAX_BUCKET = 1000


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# --- C1 exact dedup ---------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_docs(spark, sf_dir)).select(
        "content_hash",
        F.col("canonical_id").cast("long").alias("canonical_id"),
        F.col("n_duplicates").cast("long").alias("n_duplicates"),
    )


DEDUP_EXACT_SQL = """
SELECT coalesce(md5(text), 'null-text:' || CAST(doc_id AS VARCHAR))
         AS content_hash,
       min(doc_id) AS canonical_id,
       count(*) AS n_duplicates
FROM documents
GROUP BY coalesce(md5(text), 'null-text:' || CAST(doc_id AS VARCHAR))
"""


# --- C2 minhash LSH candidate pairs ----------------------------------------

def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import (
        lsh_bands_from_wide,
        lsh_candidate_pairs,
        minhash_signatures_wide,
    )

    sig = minhash_signatures_wide(
        _docs(spark, sf_dir), num_hashes=MINHASH_K, shingle_k=SHINGLE_K
    )
    pairs = lsh_candidate_pairs(
        lsh_bands_from_wide(sig, num_bands=BANDS, num_hashes=MINHASH_K),
        max_bucket=LSH_MAX_BUCKET,
    )
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )


_SHINGLES_SQL = f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, s.s AS shingle
  FROM toks, UNNEST(
    CASE WHEN len(t) >= {SHINGLE_K}
         THEN list_transform(range(1, len(t) - {SHINGLE_K} + 2),
                             i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
         ELSE [] END) AS s(s)
)"""

_BANDS_SQL = f"""
{_SHINGLES_SQL},
seeded AS (
  SELECT doc_id, sd.seed AS seed,
         md5(sd.seed || ':' || shingle) AS h
  FROM sh, UNNEST(range(0, {MINHASH_K})) AS sd(seed)
),
sig AS (
  SELECT doc_id, seed, min(h) AS minhash FROM seeded GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id, seed % {BANDS} AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
  FROM sig GROUP BY doc_id, seed % {BANDS}
)"""

#: bucket-capped bands CTE (appended after _BANDS_SQL): drops hot
#: (band, band_sig) buckets before pair generation, same cap as the
#: Spark path's lsh_candidate_pairs(max_bucket=LSH_MAX_BUCKET)
_BANDS_CAPPED_SQL = f"""
bsz AS (
  SELECT band, band_sig, count(*) AS _n FROM bands GROUP BY band, band_sig
),
bands_c AS (
  SELECT b.doc_id, b.band, b.band_sig
  FROM bands b JOIN bsz USING (band, band_sig)
  WHERE bsz._n <= {LSH_MAX_BUCKET}
)"""

DEDUP_MINHASH_SQL = f"""
WITH {_BANDS_SQL},
{_BANDS_CAPPED_SQL}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands_c a
JOIN bands_c b ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


# --- C3 ngram jaccard on LSH candidates ------------------------------------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_dedup_pairs

    j = minhash_dedup_pairs(
        _docs(spark, sf_dir),
        num_hashes=MINHASH_K,
        num_bands=BANDS,
        shingle_k=SHINGLE_K,
        jaccard_threshold=JACCARD_MIN,
        max_bucket=LSH_MAX_BUCKET,
    )
    return j.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", R).alias("jaccard"),
    )


DEDUP_JACCARD_SQL = f"""
WITH {_BANDS_SQL},
{_BANDS_CAPPED_SQL},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_c a
  JOIN bands_c b ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_inter
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b AND a.shingle = b.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT i.id_a, i.id_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), {R}) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_MIN}
"""


# --- C4 text stats ----------------------------------------------------------

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        TX.word_count(t).cast("long").alias("n_words"),
        TX.unique_word_count(t).cast("long").alias("n_unique_words"),
        F.round(TX.avg_word_len(t), R).alias("avg_word_len"),
        F.round(TX.stopword_ratio(t), R).alias("stopword_ratio"),
    )


_SW = {k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in TX.LANG_STOPWORDS.items()}

TEXT_STATS_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars,
       len(t) AS n_words,
       len(list_distinct(t)) AS n_unique_words,
       round(CAST(list_sum(list_transform(t, w -> length(w))) AS DOUBLE) / len(t), {R}) AS avg_word_len,
       round(CAST(len(list_filter(t, w -> list_contains({_SW['en']}, w))) AS DOUBLE) / len(t), {R}) AS stopword_ratio
FROM (SELECT doc_id, text, string_split_regex(trim(text), ' +') AS t FROM documents)
"""


# --- C4b Gopher-style quality filter ----------------------------------------

QF_MIN_WORDS = 20
QF_MIN_UNIQ = 0.35
QF_MAX_TOPWORD = 0.125


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-centric quality signals (Gopher-style) + a keep
    flag. All row-local column expressions — no shuffle, the filter
    rides the parquet scan at any scale. Thresholds compare on the
    ROUNDED ratios so the keep cut is engine-stable."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    uniq_ratio = F.round(
        TX.unique_word_count(t).cast("double") / TX.word_count(t), R
    )
    topw = F.round(TX.top_word_ratio(t), R)
    dupbg = F.round(TX.dup_bigram_ratio(t), R)
    keep = (
        (TX.word_count(t) >= QF_MIN_WORDS)
        & (uniq_ratio >= QF_MIN_UNIQ)
        & (topw <= QF_MAX_TOPWORD)
    )
    return d.select(
        "doc_id",
        TX.word_count(t).cast("long").alias("n_words"),
        uniq_ratio.alias("uniq_word_ratio"),
        topw.alias("top_word_ratio"),
        dupbg.alias("dup_bigram_ratio"),
        keep.alias("keep"),
    )


TEXT_QUALITY_SQL = f"""
WITH s AS (
  SELECT doc_id, len(t) AS n_words,
         round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), {R}) AS uniq_word_ratio,
         round(CAST(list_max(list_transform(list_distinct(t),
               w -> len(list_filter(t, x -> x = w)))) AS DOUBLE) / len(t), {R}) AS top_word_ratio,
         round(CASE WHEN len(t) >= 2
               THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
               ELSE 0.0 END, {R}) AS dup_bigram_ratio
  FROM (SELECT doc_id, t,
               CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)), i -> concat_ws(' ', t[i], t[i+1]))
                    ELSE [] END AS bg
        FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents))
)
SELECT doc_id, n_words, uniq_word_ratio, top_word_ratio, dup_bigram_ratio,
       (n_words >= {QF_MIN_WORDS} AND uniq_word_ratio >= {QF_MIN_UNIQ}
        AND top_word_ratio <= {QF_MAX_TOPWORD}) AS keep
FROM s
"""


# --- C5 language ID heuristic ----------------------------------------------

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    scores = dict(TX.lang_scores(t))
    s_en, s_de, s_es, s_fr = scores["en"], scores["de"], scores["es"], scores["fr"]
    pred = (
        F.when((s_en >= s_de) & (s_en >= s_es) & (s_en >= s_fr), F.lit("en"))
        .when((s_de >= s_es) & (s_de >= s_fr), F.lit("de"))
        .when(s_es >= s_fr, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        F.round(s_en, R).alias("score_en"),
        F.round(s_de, R).alias("score_de"),
        F.round(s_es, R).alias("score_es"),
        F.round(s_fr, R).alias("score_fr"),
    )


LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(t, w -> list_contains({_SW['en']}, w))) AS DOUBLE) / len(t) AS s_en,
    CAST(len(list_filter(t, w -> list_contains({_SW['de']}, w))) AS DOUBLE) / len(t) AS s_de,
    CAST(len(list_filter(t, w -> list_contains({_SW['es']}, w))) AS DOUBLE) / len(t) AS s_es,
    CAST(len(list_filter(t, w -> list_contains({_SW['fr']}, w))) AS DOUBLE) / len(t) AS s_fr
  FROM (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS t FROM documents)
)
SELECT doc_id, lang,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS lang_pred,
       round(s_en, {R}) AS score_en,
       round(s_de, {R}) AS score_de,
       round(s_es, {R}) AS score_es,
       round(s_fr, {R}) AS score_fr
FROM s
"""


# --- C6 token count ---------------------------------------------------------

def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TX.word_count(t).cast("long").alias("n_words"),
        TX.token_count_bpe_ish(t).cast("long").alias("n_tokens_bpe_ish"),
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(t) AS n_words,
       CAST(list_sum(list_transform(t, w -> (length(w) + 3) // 4)) AS BIGINT) AS n_tokens_bpe_ish
FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents)
"""


# --- C6b vocabulary / token histogram ---------------------------------------

VOCAB_TOPK = 100


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-K tokens by total frequency with
    document frequency. Two-level aggregate — per-(doc, token) counts
    first, then per-token — so doc_freq is a plain count, never a
    count(DISTINCT) expand; both levels partial-aggregate map-side.
    The top-K cut ranks on (term_freq DESC, token ASC) so it is
    deterministic across engines."""
    d = _docs(spark, sf_dir)
    per_doc = (
        d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = per_doc.groupBy("token").agg(
        F.sum("c").alias("term_freq"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # partial top-k, NOT a single-partition global sort; the rank
    # window then runs over just the K survivors
    top = vocab.orderBy(F.desc("term_freq"), F.asc("token")).limit(VOCAB_TOPK)
    w = Window.orderBy(F.desc("term_freq"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token",
        F.col("term_freq").cast("long").alias("term_freq"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.col("rank").cast("int").alias("rank"),
    )


TOKEN_HISTOGRAM_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, u.token AS token, count(*) AS c
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
       UNNEST(t) AS u(token)
  GROUP BY doc_id, u.token
),
vocab AS (
  SELECT token, sum(c) AS term_freq, count(*) AS doc_freq FROM per_doc GROUP BY token
),
r AS (
  SELECT *, row_number() OVER (ORDER BY term_freq DESC, token ASC) AS rank FROM vocab
)
SELECT token, CAST(term_freq AS BIGINT) AS term_freq,
       CAST(doc_freq AS BIGINT) AS doc_freq, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {VOCAB_TOPK}
"""


# --- C6c TF-IDF top terms ----------------------------------------------------

TFIDF_TOPK = 5


def tf_idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K characteristic terms per document by tf-idf. Three
    partial-agg-friendly aggregates (per-doc-term tf, per-term df,
    corpus N) joined back on token; the N scalar rides a broadcast
    cross join. The per-doc top-K window partitions by doc_id so it
    scales with the corpus."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tf_idf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), R),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf_idf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("long").alias("tf"),
            "tf_idf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


TF_IDF_SQL = f"""
WITH tf AS (
  SELECT doc_id, u.token AS token, count(*) AS tf
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
       UNNEST(t) AS u(token)
  GROUP BY doc_id, u.token
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df), {R}) AS tf_idf
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tf_idf DESC, token ASC) AS rank
  FROM scored
)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, tf_idf, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {TFIDF_TOPK}
"""


# --- C6d document chunking ---------------------------------------------------

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into fixed-token chunks with overlap — the
    standard pre-embedding step of a RAG/training pipeline. Pure
    row-local array algebra (sequence of starts -> slice -> join):
    the explode multiplies rows ~len/stride x but shuffles nothing;
    chunking rides the scan at any corpus size."""
    d = _docs(spark, sf_dir)
    t = TX.tokens(F.col("text"))
    # clamp to >=1 chunk: for an empty token array the raw formula
    # yields 0 and sequence(0, -1) would DESCEND to two rows while the
    # oracle's range(0, 0) yields none (ADVICE r1) — one empty chunk
    # per doc keeps both engines aligned
    n_chunks = F.greatest(F.floor((F.size(t) - 1) / _CHUNK_STRIDE) + 1, F.lit(1))
    chunked = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(t, i * _CHUNK_STRIDE + 1, CHUNK_TOKENS),
            )
        ).alias("chunk_id", "chunk_toks"),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("chunk_toks").cast("long").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


DOC_CHUNKS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
),
c AS (
  SELECT doc_id, i AS chunk_id,
         t[i * {_CHUNK_STRIDE} + 1 : i * {_CHUNK_STRIDE} + {CHUNK_TOKENS}] AS chunk_toks
  FROM toks, UNNEST(range(0, greatest(CAST(floor((len(t) - 1) / {_CHUNK_STRIDE}) AS BIGINT) + 1, 1))) AS r(i)
)
SELECT doc_id, chunk_id, len(chunk_toks) AS n_tokens,
       array_to_string(chunk_toks, ' ') AS chunk_text
FROM c
"""


# --- C7 fingerprint ---------------------------------------------------------

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TX.fingerprint(F.col("text")).alias("fingerprint"))


DOC_FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


# --- C8 brute-force cosine top-k --------------------------------------------

def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < ANN_QUERIES)
    # rank on the rounded cosine so rank assignment is engine-stable
    return cosine_topk(emb, queries, k=ANN_TOPK, round_digits=R)


ANN_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings
),
q AS (SELECT * FROM v WHERE vec_id < {ANN_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round(list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), {R}) AS cosine
  FROM v c, q WHERE c.vec_id != q.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= {ANN_TOPK}
"""


# --- C8b IVF-style ANN -------------------------------------------------------

_V_SQL = "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings)"

IVF_CENTROIDS = 8
#: 3 of 8 cells probed. Retuned 2 -> 3 in round 5: recall@5 vs the
#: brute-force baseline at sf0.01 was 0.80 (seeded) / 0.86 (trained)
#: at nprobe=2, and is 0.82 / 0.92 at nprobe=3 — the floor is pinned
#: in tests/test_pipeline_extras.py::test_ann_recall_floor_vs_exact.
IVF_NPROBE = 3


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: Voronoi-cell partition on deterministic seed centroids
    (the IVF_CENTROIDS lowest vec_ids), probe IVF_NPROBE cells per
    query, exact cosine re-rank. See operators/similarity.ivf_topk for
    the 100 TB plan notes (assignment is a pure projection — no
    shuffle)."""
    from .operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < ANN_QUERIES)
    return ivf_topk(
        emb,
        queries,
        k=ANN_TOPK,
        num_centroids=IVF_CENTROIDS,
        nprobe=IVF_NPROBE,
        round_digits=R,
    )


_IVF_CA_SQL = f"""
ca AS (
  SELECT v.vec_id, c.cent_id,
         round(list_dot_product(v.e, c.w)
               / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(c.w, c.w))), {R}) AS cos
  FROM v CROSS JOIN cent c
)"""

_IVF_TAIL_SQL = f"""
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
    FROM ca
  ) WHERE rn = 1
),
probe AS (
  SELECT vec_id AS query_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
    FROM ca WHERE vec_id < {ANN_QUERIES}
  ) WHERE rn <= {IVF_NPROBE}
),
cand AS (
  SELECT p.query_id, a.vec_id AS corpus_id
  FROM probe p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id
),
scored AS (
  SELECT query_id, corpus_id,
         round(list_dot_product(q.e, c.e)
               / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), {R}) AS cosine
  FROM cand JOIN v q ON q.vec_id = query_id JOIN v c ON c.vec_id = corpus_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, cosine, CAST(rank AS INT) AS rank FROM r WHERE rank <= {ANN_TOPK}
"""

ANN_IVF_SQL = f"""
WITH {_V_SQL},
cent AS (SELECT vec_id AS cent_id, e AS w FROM v ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
{_IVF_CA_SQL},
{_IVF_TAIL_SQL}
"""


# --- C8c IVF with Lloyd-trained centroids ------------------------------------

IVF_MEAN_ROUND = 6
IVF_LLOYD_ITERS = 3


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-iteration k-means (Lloyd) refinement of the
    seed centroids: assign -> per-cell per-dimension mean (rounded to
    6 decimals so both engines train identical centroids) ->
    re-assign, {IVF_LLOYD_ITERS} times. Training is one Arrow
    assignment pass + one C-row groupBy per iteration; trained
    centroids ride the assignment UDF closure, so query-time
    assignment remains shuffle-free. Convergence (monotone inertia)
    is pinned in tests/test_scale_patterns.py."""
    from .operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < ANN_QUERIES)
    return ivf_topk(
        emb,
        queries,
        k=ANN_TOPK,
        num_centroids=IVF_CENTROIDS,
        nprobe=IVF_NPROBE,
        round_digits=R,
        lloyd_iters=IVF_LLOYD_ITERS,
        mean_round=IVF_MEAN_ROUND,
    )


def _lloyd_iter_sql(k: int) -> str:
    """One oracle-side Lloyd iteration: assign to cent{k-1} (seed for
    k=0), then per-cell per-dimension rounded means -> cent{k}."""
    prev = "seed" if k == 0 else f"cent{k - 1}"
    return f"""
ca{k} AS (
  SELECT v.vec_id, s.cent_id,
         round(list_dot_product(v.e, s.w)
               / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(s.w, s.w))), {R}) AS cos
  FROM v CROSS JOIN {prev} s
),
a{k} AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
    FROM ca{k}
  ) WHERE rn = 1
),
means{k} AS (
  SELECT a{k}.cell, r.i AS i, round(avg(v.e[r.i]), {IVF_MEAN_ROUND}) AS m
  FROM a{k} JOIN v USING (vec_id), UNNEST(range(1, len(v.e) + 1)) AS r(i)
  GROUP BY a{k}.cell, r.i
),
cent{k} AS (SELECT cell AS cent_id, list(m ORDER BY i) AS w FROM means{k} GROUP BY cell)"""


_LLOYD_ITERS_SQL = ",".join(_lloyd_iter_sql(k) for k in range(IVF_LLOYD_ITERS))

ANN_IVF_TRAINED_SQL = f"""
WITH {_V_SQL},
seed AS (SELECT vec_id AS cent_id, e AS w FROM v ORDER BY vec_id LIMIT {IVF_CENTROIDS}),
{_LLOYD_ITERS_SQL},
cent AS (SELECT * FROM cent{IVF_LLOYD_ITERS - 1}),
{_IVF_CA_SQL},
{_IVF_TAIL_SQL}
"""


# --- C9 random-hyperplane LSH buckets ---------------------------------------

LSH_PLANES = 8
NEARDUP_PLANES = 4
NEARDUP_TABLES = 2
NEARDUP_COS = 0.35


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import hyperplane_buckets

    return hyperplane_buckets(
        _emb(spark, sf_dir), num_planes=LSH_PLANES, table=0
    ).select(F.col("vec_id").cast("long").alias("vec_id"), "bucket")


def _plane_sql(t: int, p: int) -> str:
    """Projection of e onto deterministic plane (t, p) — the exact
    formula hyperplane_buckets uses (md5 -> uint32 -> [-1, 1))."""
    return (
        "list_sum(list_transform(range(0, len(e)), j -> e[j+1] * "
        f"(('0x' || substring(md5('{t}:{p}:' || j), 1, 8))::BIGINT"
        " / 2147483648.0 - 1.0)))"
    )


def _bucket_sql(t: int, planes: int) -> str:
    bits = ", ".join(
        f"CASE WHEN {_plane_sql(t, p)} >= 0 THEN '1' ELSE '0' END"
        for p in range(planes)
    )
    return f"concat({bits})"


ANN_LSH_BUCKETS_SQL = f"""
WITH {_V_SQL}
SELECT vec_id, {_bucket_sql(0, LSH_PLANES)} AS bucket FROM v
"""


# --- C-extra embedding-cosine near-dup ---------------------------------------

def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _emb(spark, sf_dir),
        num_planes=NEARDUP_PLANES,
        num_tables=NEARDUP_TABLES,
        cosine_threshold=NEARDUP_COS,
        round_digits=R,
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )


_NEARDUP_BANDS = "\n  UNION ALL\n".join(
    f"  SELECT vec_id, {t} AS tbl, {_bucket_sql(t, NEARDUP_PLANES)} AS bucket FROM v"
    for t in range(NEARDUP_TABLES)
)

DEDUP_EMBEDDING_SQL = f"""
WITH {_V_SQL},
b AS (
{_NEARDUP_BANDS}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
  FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
),
scored AS (
  SELECT id_a, id_b,
         round(list_dot_product(va.e, vb.e)
               / (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))), {R}) AS cosine
  FROM cand JOIN v va ON va.vec_id = id_a JOIN v vb ON vb.vec_id = id_b
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {NEARDUP_COS}
"""


# --- C10 simhash -------------------------------------------------------------

# measured on testdata: true near-dups sit at hamming 0-2; the
# background pair distribution only starts at 3+ (451/41/123 vs 411
# at 3 rising to ~2000/bin) — 2 separates signal from noise.
SIMHASH_MAX_HAMMING = 2
#: Hot-band guard for SimHash blocking (the C10 twin of
#: LSH_MAX_BUCKET): one (band, 16-bit val) shared by B near-identical
#: docs yields B^2/2 self-join rows before the hamming filter. Band
#: values past the cap are dropped from candidate generation on BOTH
#: engines (mirrored in the oracle SQL); the largest band bucket at
#: every tested SF sits far below it, so results are unchanged while
#: the blowup is structurally impossible.
SIMHASH_MAX_BUCKET = 1000


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("simhash_hi").cast("long").alias("simhash_hi"),
        F.col("simhash_lo").cast("long").alias("simhash_lo"),
    )


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_near_dup_pairs, simhash_signatures

    sig = simhash_signatures(_docs(spark, sf_dir))
    return simhash_near_dup_pairs(
        sig, max_hamming=SIMHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


_SIMHASH_SUMS = ", ".join(
    f"sum(2*(({half} >> {j}) & 1) - 1) AS s_{half}_{j}"
    for half in ("hi", "lo")
    for j in range(32)
)


def _simhash_assemble(half: str) -> str:
    return " + ".join(
        f"(CASE WHEN s_{half}_{j} >= 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(32)
    )


_SIMHASH_CORE = f"""
tok AS (
  SELECT DISTINCT doc_id, u.w AS w
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents),
       UNNEST(t) AS u(w)
),
h AS (
  SELECT doc_id,
         ('0x' || substring(md5(w), 1, 8))::BIGINT AS hi,
         ('0x' || substring(md5(w), 9, 8))::BIGINT AS lo
  FROM tok
),
s AS (SELECT doc_id, {_SIMHASH_SUMS} FROM h GROUP BY doc_id),
sig AS (
  SELECT doc_id,
         {_simhash_assemble('hi')} AS simhash_hi,
         {_simhash_assemble('lo')} AS simhash_lo
  FROM s
)"""

SIMHASH_SQL = f"""
WITH {_SIMHASH_CORE}
SELECT doc_id, simhash_hi, simhash_lo FROM sig
"""

_SIMHASH_BANDS_CAND = f"""
bands AS (
  SELECT doc_id, simhash_hi, simhash_lo, 0 AS band, simhash_hi >> 16 AS val FROM sig
  UNION ALL
  SELECT doc_id, simhash_hi, simhash_lo, 1, simhash_hi & 65535 FROM sig
  UNION ALL
  SELECT doc_id, simhash_hi, simhash_lo, 2, simhash_lo >> 16 FROM sig
  UNION ALL
  SELECT doc_id, simhash_hi, simhash_lo, 3, simhash_lo & 65535 FROM sig
),
bhot AS (
  SELECT band, val FROM bands GROUP BY band, val
  HAVING count(*) > {SIMHASH_MAX_BUCKET}
),
bands_c AS (
  SELECT b.* FROM bands b
  WHERE NOT EXISTS (SELECT 1 FROM bhot h WHERE h.band = b.band AND h.val = b.val)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash_hi AS hi_a, a.simhash_lo AS lo_a,
         b.simhash_hi AS hi_b, b.simhash_lo AS lo_b
  FROM bands_c a JOIN bands_c b ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
)"""

SIMHASH_PAIRS_SQL = f"""
WITH {_SIMHASH_CORE},
{_SIMHASH_BANDS_CAND}
SELECT id_a, id_b,
       CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= {SIMHASH_MAX_HAMMING}
"""


# --- C10b connected-component canonical dedup --------------------------------

DEDUP_CC_ITERS = 3


def dedup_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the dedup DECISION: canonical id per document over
    the simhash near-dup graph via min-label propagation (the
    dataframe form of connected components; DEDUP_CC_ITERS hops —
    LSH dup clusters are shallow, and tests assert convergence).
    keep = doc is its own component minimum."""
    from .operators.dedup import (
        connected_canonical,
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    d = _docs(spark, sf_dir)
    sig = simhash_signatures(d)
    pairs = simhash_near_dup_pairs(
        sig, max_hamming=SIMHASH_MAX_HAMMING, max_bucket=SIMHASH_MAX_BUCKET
    )
    out = connected_canonical(d.select("doc_id"), pairs, iters=DEDUP_CC_ITERS)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("canonical_id").cast("long").alias("canonical_id"),
        "keep",
    )


def _cc_iter_sql(k: int) -> str:
    prev = f"l{k - 1}"
    return f"""
l{k} AS (
  SELECT l.doc_id, least(l.lab, coalesce(min(n.lab), l.lab)) AS lab
  FROM {prev} l
  LEFT JOIN e ON e.src = l.doc_id
  LEFT JOIN {prev} n ON n.doc_id = e.dst
  GROUP BY l.doc_id, l.lab
)"""


_CC_ITERS_SQL = ",".join(_cc_iter_sql(k) for k in range(1, DEDUP_CC_ITERS + 1))

DEDUP_CONNECTED_SQL = f"""
WITH {_SIMHASH_CORE},
{_SIMHASH_BANDS_CAND},
p AS (
  SELECT id_a, id_b FROM cand
  WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= {SIMHASH_MAX_HAMMING}
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM p
),
l0 AS (SELECT doc_id, doc_id AS lab FROM documents),
{_CC_ITERS_SQL}
SELECT doc_id, lab AS canonical_id, doc_id = lab AS keep FROM l{DEDUP_CC_ITERS}
"""


# --- C11 multimodal decode ---------------------------------------------------

def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode: image payloads are REAL PNG/JPEG
    containers (dims written into the header bytes) and the feature
    pass parses format/width/height straight out of the bytes with a
    dependency-free parser (operators/multimodal.py). The oracle
    reconstructs the same container blobs in SQL and derives the
    expected dims arithmetically — if either the synthesis or the
    parse is wrong, the hashes/dims mismatch."""
    from .operators.multimodal import attach_payloads, extract_features

    out = extract_features(attach_payloads(_docs(spark, sf_dir)))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "media_type",
        "n_bytes",
        "payload_md5",
        "img_format",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    )


from .operators.multimodal import (  # noqa: E402
    _JPEG_PREFIX_HEX,
    _JPEG_SOF_TAIL_HEX,
    _PNG_IHDR_TAIL_HEX,
    _PNG_SIG_IHDR_HEX,
)

MULTIMODAL_SQL = f"""
WITH p AS (
  SELECT doc_id, text,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
    CASE
      WHEN doc_id % 6 = 0 THEN
        from_hex('{_PNG_SIG_IHDR_HEX}')
        || from_hex(printf('%08X', doc_id % 640 + 1))
        || from_hex(printf('%08X', doc_id % 480 + 1))
        || from_hex('{_PNG_IHDR_TAIL_HEX}') || encode(text)
      WHEN doc_id % 6 = 3 THEN
        from_hex('{_JPEG_PREFIX_HEX}')
        || from_hex(printf('%04X', doc_id % 480 + 1))
        || from_hex(printf('%04X', doc_id % 640 + 1))
        || from_hex('{_JPEG_SOF_TAIL_HEX}') || encode(text) || from_hex('FFD9')
      ELSE encode(text)
    END AS payload
  FROM documents
)
SELECT doc_id, media_type,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       md5(hex(payload)) AS payload_md5,
       CASE WHEN doc_id % 6 = 0 THEN 'png' WHEN doc_id % 6 = 3 THEN 'jpeg' END AS img_format,
       CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 640 + 1 AS INT) END AS width,
       CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 480 + 1 AS INT) END AS height
FROM p
"""


PIPELINE_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "text_stats": text_stats,
    "lang_id": lang_id,
    "token_count": token_count,
    "token_histogram": token_histogram,
    "tf_idf_top_terms": tf_idf_top_terms,
    "doc_chunks": doc_chunks,
    "doc_fingerprint": doc_fingerprint,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_trained": ann_ivf_trained,
    "ann_lsh_buckets": ann_lsh_buckets,
    "dedup_embedding": dedup_embedding,
    "text_quality": text_quality,
    "simhash": simhash,
    "simhash_pairs": simhash_pairs,
    "dedup_connected": dedup_connected,
    "multimodal_decode": multimodal_decode,
}

PIPELINE_ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_ngram_jaccard": DEDUP_JACCARD_SQL,
    "text_stats": TEXT_STATS_SQL,
    "lang_id": LANG_ID_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "token_histogram": TOKEN_HISTOGRAM_SQL,
    "tf_idf_top_terms": TF_IDF_SQL,
    "doc_chunks": DOC_CHUNKS_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "ann_cosine_topk": ANN_TOPK_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    "ann_ivf_trained": ANN_IVF_TRAINED_SQL,
    "ann_lsh_buckets": ANN_LSH_BUCKETS_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "simhash": SIMHASH_SQL,
    "simhash_pairs": SIMHASH_PAIRS_SQL,
    "dedup_connected": DEDUP_CONNECTED_SQL,
    "multimodal_decode": MULTIMODAL_SQL,
}
