"""Text-analysis Column helpers for the documents pipeline.

All JVM-side (split/transform/aggregate higher-order functions) — no
Python UDFs. Every function has a DuckDB-equivalent SQL shape used by
the oracle queries; hashing is md5-hex which is bit-identical across
engines, so dedup/fingerprint results are enginely portable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: small multilingual stopword sets for the language-ID heuristic.
#: Deterministic and tiny on purpose — the operator pattern (per-lang
#: token-hit ratio + argmax) is what matters at scale, not the lists.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "auf"],
    "es": ["el", "la", "los", "y", "de", "es", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "et", "de", "est", "en", "un", "une", "pour"],
}

#: generic English-ish stopwords for quality scoring
STOPWORDS_EN = LANG_STOPWORDS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; identical to DuckDB
    string_split_regex(trim(text), ' +').

    Contract notes (review r12 — these are deliberate, both engines
    agree and every oracle mirrors them): the split is on SPACE runs
    only — tab/newline-separated words stay joined, so normalize
    first (text_normalize collapses all whitespace to single spaces;
    the canonical pipeline runs it before tokenizing); and an
    empty/whitespace-only text yields [''] (word_count 1), matching
    the SQL grammar — callers needing empty-doc semantics filter on
    length(trim(text)) > 0 upstream."""
    return F.split(F.trim(text), " +")


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-shingles as space-joined strings (empty array when the
    document has fewer than k tokens).

    ``toks`` is let-bound via a single-element transform so it is
    evaluated ONCE per row: referencing the tokenization expression
    directly inside the per-index lambda would re-evaluate it (a full
    regex split of the text) for EVERY shingle — O(tokens^2) per doc,
    measured ~2x wall on the minhash pipeline."""

    def from_bound(t: Column) -> Column:
        return F.when(
            F.size(t) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - k + 1),
                lambda i: F.array_join(F.slice(t, i, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(toks), from_bound))


def shingle_set(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles, computed row-locally (no explode /
    distinct shuffle)."""
    return F.array_distinct(shingles(tokens(text), k))


def word_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_word_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_word_len(text: Column) -> Column:
    # _let-bound: the token array is referenced twice (sum + size);
    # unbound, Catalyst re-ran the regex split per reference —
    # doubling tokenization cost at the quality-filter stage
    return _let(
        tokens(text),
        lambda t: F.aggregate(
            t, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.size(t),
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    return _let(
        tokens(text),
        lambda t: F.size(F.filter(t, lambda x: F.array_contains(sw, x))).cast(
            "double"
        )
        / F.size(t),
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_ratio(text, sw)) for lang, sw in LANG_STOPWORDS.items()]


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword count: each word contributes ceil(len/4) tokens
    (the whitespace count is word_count). Deterministic, portable."""
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0), lambda acc, x: acc + ((F.length(x) + 3) / 4).cast("int")
    )


def _let(bound: Column, body) -> Column:
    """Let-bind ``bound`` so it evaluates once per row: wrap in a
    1-element array, transform with ``body``, take the element.
    Referencing a tokenization expression twice would re-run the regex
    split per reference (see shingles())."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def top_word_ratio(text: Column) -> Column:
    """Frequency of the most repeated word / word count — the
    repetition signal used by Gopher-style quality filters. Row-local
    (O(unique x words) per doc, zero shuffle) rather than an
    explode+groupBy, so at 100 TB it rides the scan."""

    def from_bound(t: Column) -> Column:
        maxc = F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda w: F.size(F.filter(t, lambda x: x == w)),
            )
        )
        return maxc.cast("double") / F.size(t)

    return _let(tokens(text), from_bound)


def dup_bigram_ratio(text: Column) -> Column:
    """Fraction of word bigrams that are repeats: 1 - distinct/total
    (0 for docs with fewer than 2 words)."""

    def from_bound(bg: Column) -> Column:
        return F.when(
            F.size(bg) > 0,
            1.0 - F.size(F.array_distinct(bg)).cast("double") / F.size(bg),
        ).otherwise(F.lit(0.0))

    return _let(shingles(tokens(text), 2), from_bound)


def normalize_text(text: Column) -> Column:
    """lower + collapse whitespace — canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (identical to
    DuckDB md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))."""
    return F.md5(normalize_text(text))
