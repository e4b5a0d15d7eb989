"""Text analysis: token counting, quality scoring, language ID,
fingerprinting. All pure JVM expressions (split/regexp/aggregate) — the
hot path stays in whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Deliberately small and explicit so the same lists can be inlined into an
# oracle SQL query.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokenization, empty tokens dropped (JVM-side)."""
    return F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t <> '')")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """BPE-flavored token estimate: word-boundary regex pieces, counting
    punctuation runs and number runs as separate tokens — the standard
    cheap proxy for tokenizer counts on a 100 TB corpus."""
    return F.size(
        F.expr(
            rf"filter(regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+', 0), t -> t <> '')"
        )
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, distinct-token ratio, mean token
    length, punctuation & digit ratios — the quality-score raw features."""
    toks = tokens_expr(text_col)
    return df.withColumns(
        {
            "n_chars_actual": F.length(text_col),
            "n_tokens": F.size(toks),
            "n_distinct_tokens": F.size(F.array_distinct(toks)),
            "mean_token_len": F.expr(
                f"CAST(aggregate(filter(split({text_col}, '\\\\s+'), t -> t <> ''),"
                f" CAST(0 AS BIGINT), (a, t) -> a + length(t)) AS DOUBLE)"
            )
            / F.greatest(F.size(toks), F.lit(1)),
            "punct_ratio": F.size(
                F.expr(rf"regexp_extract_all({text_col}, '[^a-zA-Z0-9\\s]', 0)")
            )
            / F.greatest(F.length(text_col), F.lit(1)),
            "digit_ratio": F.size(F.expr(rf"regexp_extract_all({text_col}, '[0-9]', 0)"))
            / F.greatest(F.length(text_col), F.lit(1)),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: penalize too-short/too-long docs,
    low lexical diversity, heavy punctuation. Deterministic arithmetic —
    oracle-expressible."""
    s = text_stats(df, text_col)
    len_score = F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
    diversity = F.col("n_distinct_tokens") / F.greatest(F.col("n_tokens"), F.lit(1))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 5)
    return s.withColumn(
        "quality", F.round((len_score + diversity + punct_penalty) / 3.0, 6)
    )


def stopword_fraction(text_col: str, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    words = ",".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"CAST(size(filter(split(lower({text_col}), '\\\\s+'), t -> t IN ({words}))) AS DOUBLE)"
        f" / greatest(size(filter(split({text_col}, '\\\\s+'), t -> t <> '')), 1)"
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword fractions,
    ties broken by language code. greatest() over a struct array keeps it
    one expression — no UDF, no shuffle."""
    scored = df.withColumn(
        "__scores",
        F.array(
            *[
                F.struct(
                    stopword_fraction(text_col, lang).alias("score"),
                    F.lit(lang).alias("lang"),
                )
                for lang in sorted(STOPWORDS)
            ]
        ),
    )
    best = F.expr(
        "array_sort(__scores, (a, b) -> CASE WHEN a.score > b.score THEN -1"
        " WHEN a.score < b.score THEN 1"
        " WHEN a.lang < b.lang THEN -1 ELSE 1 END)[0]"
    )
    return scored.withColumn(out_col, best.getField("lang")).withColumn(
        "lang_score", F.round(best.getField("score"), 6)
    ).drop("__scores")


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (md5 exists in both Spark and DuckDB → oracle-matchable; the rolling-
    hash variant for shingle fingerprints lives in dedup.minhash_signature.)"""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.withColumn(out_col, F.md5(F.trim(norm)))
