"""SQL front door (reference EP1: parser→binder→optimizer→executor,
SURVEY.md §3 — all replaced by spark.sql).

``sql()`` registers the catalog views and runs the text through Spark SQL
after a light dialect-translation pass for the DuckDB-isms that appear in
the reference's test corpus. The translation is intentionally textual and
conservative: Spark SQL already accepts the large shared ANSI surface;
only the named idioms below are rewritten.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from myduckdb_spark.catalog import register_views

# (pattern, replacement) — applied in order.
_REWRITES: list[tuple[re.Pattern, str]] = [
    # json arrow operators: j->'k' / j->>'k'  →  get_json_object(j, '$.k')
    (re.compile(r"(\w+)\s*->>\s*'([^']+)'"), r"get_json_object(\1, '$.\2')"),
    (re.compile(r"(\w+)\s*->\s*'([^']+)'"), r"get_json_object(\1, '$.\2')"),
    # list_* higher-order aliases → Spark HOF names
    (re.compile(r"\blist_transform\(", re.I), "transform("),
    (re.compile(r"\blist_filter\(", re.I), "filter("),
    (re.compile(r"\blist_reduce\(", re.I), "reduce("),
    (re.compile(r"\blist_sort\(", re.I), "array_sort("),
    (re.compile(r"\blist_distinct\(", re.I), "array_distinct("),
    (re.compile(r"\blist_contains\(", re.I), "array_contains("),
    (re.compile(r"\blist_concat\(", re.I), "concat("),
    (re.compile(r"\blen\(", re.I), "length("),
    (re.compile(r"\bstring_split\(", re.I), "split("),
    (re.compile(r"\bstrftime\(", re.I), "date_format("),
    # string_agg(x, sep) — Spark 4 has string_agg? keep listagg fallback
    (re.compile(r"\bstring_agg\(", re.I), "listagg("),
    # USING SAMPLE n% (bernoulli) → TABLESAMPLE
    (re.compile(r"\bUSING\s+SAMPLE\s+(\d+)\s*%", re.I), r"TABLESAMPLE (\1 PERCENT)"),
    # exclusion of unsupported storage-era syntax is intentional: sequences,
    # ART indexes, transactions are out of scope (SURVEY.md §7).
]

_QUALIFY = re.compile(r"\bQUALIFY\b", re.I)


def translate(text: str) -> str:
    """DuckDB dialect → Spark SQL dialect (textual, conservative)."""
    out = text
    for pat, rep in _REWRITES:
        out = pat.sub(rep, out)
    return out


def sql(spark: SparkSession, text: str, sf_dir: str | None = None) -> DataFrame:
    """Run SQL against the engine catalog. Spark ≥3.5 supports QUALIFY-less
    dialect only; translated text must be valid Spark SQL."""
    if sf_dir:
        register_views(spark, sf_dir)
    return spark.sql(translate(text))
