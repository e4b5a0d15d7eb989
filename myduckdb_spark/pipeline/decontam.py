"""Benchmark decontamination, PII scrubbing, repetition scoring.

Standard large-scale training-data hygiene operators (additive to the
reference's surface, like the rest of pipeline/):

- ``ngram_contamination``: flag corpus documents sharing any word
  n-gram with a benchmark set — the n-gram-overlap decontamination used
  by LLM training pipelines. 100 TB design: the benchmark side is small
  by construction (eval sets are thousands of docs, not billions), so
  its n-gram set BROADCASTS; the corpus side is a map-side explode +
  broadcast semi-join + partial-aggregated count per doc — no shuffle
  of corpus text, no driver materialization.
- ``pii_scrub``: regex redaction of emails/phones (JVM codegen
  regexp_replace; patterns kept to RE2∩Java syntax so the DuckDB oracle
  runs the identical patterns).
- ``repetition_stats``: distinct-word and distinct-bigram ratios — the
  cheap within-document repetition signal (high repetition → low
  quality); pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORDS = "filter(split({col}, ' '), w -> w != '')"


def _ngrams_expr(col: str, n: int) -> Column:
    """Array of word n-grams of ``col`` (space-joined), [] when shorter
    than n words."""
    words = _WORDS.format(col=col)
    return F.expr(
        f"CASE WHEN size({words}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> array_join(slice({words}, i, {n}), ' ')) END"
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-doc count of word n-grams that appear in ANY benchmark
    document. Returns (id, n_hits, contaminated) for docs with ≥1 hit."""
    bench_grams = (
        benchmark.select(F.explode(_ngrams_expr(text_col, n)).alias("g")).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_ngrams_expr(text_col, n)).alias("g")
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(id_col, "n_hits", F.lit(True).alias("contaminated"))
    )


# RE2 ∩ Java-regex subset: no lookarounds, no \b ambiguity across engines
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact emails/phone numbers (JVM regexp, codegen)."""
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(c, F.lit(PHONE_RE)),
            "scrubbed": scrubbed,
        }
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word / distinct-bigram ratios (1.0 = no repetition)."""
    words = _WORDS.format(col=text_col)
    bigrams = _ngrams_expr(text_col, 2)
    return df.withColumns(
        {
            "n_words": F.expr(f"size({words})").cast("long"),
            "uniq_word_ratio": (
                F.expr(f"size(array_distinct({words}))")
                / F.greatest(F.expr(f"size({words})"), F.lit(1))
            ).cast("double"),
            "uniq_bigram_ratio": (
                F.size(F.array_distinct(bigrams))
                / F.greatest(F.size(bigrams), F.lit(1))
            ).cast("double"),
        }
    )
