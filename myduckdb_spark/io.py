"""Sources & sinks — the reference's scan/COPY surface, Spark-first.

Reference parity (SURVEY.md §2.2):

* ``read_csv`` ≈ read_csv_auto (reference ``src/function/table/read_csv.cpp``
  + sniffer ``src/execution/operator/csv_scanner/sniffer/``): Spark's
  ``inferSchema`` covers type detection; a light driver-side sniff covers
  dialect (delimiter) and header detection, which Spark lacks.
* ``read_json`` ≈ read_json/read_json_objects
  (``extension/json/json_functions/read_json.cpp``): Spark infers JSON
  structure natively (NDJSON by default, ``multiLine`` for arrays).
* ``read_parquet`` ≈ parquet_scan (``extension/parquet/parquet_extension.cpp``):
  row-group parallelism, column pruning and predicate/stats pushdown are
  native to Spark's parquet source — verify with ``.explain`` showing
  PushedFilters/ReadSchema.
* ``read_arrow`` ≈ the zero-ish-copy Arrow scan (``src/function/table/arrow.cpp``).
* ``write_csv/json/parquet`` ≈ COPY … TO (``src/function/table/copy_csv.cpp``,
  ``extension/parquet/parquet_writer.cpp``,
  ``extension/json/json_functions/copy_json.cpp``). Spark writes a
  directory of part files (one per partition — the distributed-sink
  contract); ``single_file=True`` coalesces to one part for small exports.
* ``glob_paths`` ≈ the glob table function (``src/function/table/glob.cpp``).

All readers return plain DataFrames; scale behavior (splittable files,
partition-parallel scan, pushdown) is inherited from the Spark source
implementations rather than reimplemented.
"""

from __future__ import annotations

import csv as _csv
import io as _io

from pyspark.sql import DataFrame, SparkSession

_DELIMS = [",", "|", ";", "\t"]
_QUOTES = ['"', "'"]
_MAX_SKIP = 8


def _try_parse(lines: list[str], sep: str, quote: str, escape: str) -> list[list[str]] | None:
    """Parse the sample strictly under one dialect candidate; None on a
    parse error (the reference sniffer discards candidates the same way —
    dialect_detection.cpp state machine errors)."""
    try:
        rows = list(
            _csv.reader(
                _io.StringIO("\n".join(lines)),
                delimiter=sep,
                quotechar=quote,
                doublequote=(escape == quote),
                escapechar=None if escape == quote else escape,
                strict=True,
            )
        )
    except _csv.Error:
        return None
    return [r for r in rows if r]


def sniff_csv(spark: SparkSession, path: str, sample_lines: int = 64) -> dict:
    """Detect delimiter / quote / escape / skip-rows / header from a small
    sample, mirroring the reference's sniffer matrix
    (``sniffer/dialect_detection.cpp`` candidate search over delimiter ×
    quote × escape × skip-rows, ``header_detection.cpp`` for the header
    vote). Candidate scoring follows the reference: a dialect must parse
    the post-skip sample with a CONSISTENT column count; among consistent
    candidates prefer fewer skipped rows, more columns, then the default
    quote (") and quote-doubling escape. Returns ``{"sep", "header",
    "quote", "escape", "skip_rows"}`` (escape == quote means doubling,
    DuckDB's default).
    """
    lines = [r[0] for r in spark.read.text(path).limit(sample_lines).collect()]
    if not lines:
        return {"sep": ",", "header": False, "quote": '"', "escape": '"', "skip_rows": 0}
    best = None  # (score tuple, sep, quote, escape, skip, rows)
    max_skip = min(_MAX_SKIP, max(0, len(lines) - 2))
    for sep in _DELIMS:
        for quote in _QUOTES:
            for escape in (quote, "\\"):
                for skip in range(0, max_skip + 1):
                    rows = _try_parse(lines[skip:], sep, quote, escape)
                    if not rows:
                        continue
                    counts = {len(r) for r in rows}
                    if len(counts) != 1:
                        continue
                    cols = counts.pop()
                    score = (
                        cols > 1,          # a real table beats 1 column
                        -skip,             # explain as much of the file as possible
                        cols,
                        quote == '"',      # defaults win ties
                        escape == quote,
                        -_DELIMS.index(sep),
                    )
                    if best is None or score > best[0]:
                        best = (score, sep, quote, escape, skip, rows)
                    break  # smallest skip for this dialect found
    if best is None:
        return {"sep": ",", "header": False, "quote": '"', "escape": '"', "skip_rows": 0}
    _, best_sep, best_quote, best_escape, skip_rows, parsed = best
    lines = lines[skip_rows:]
    first = parsed[0] if parsed else []

    def _numeric(cell: str) -> bool:
        try:
            float(cell)
            return True
        except ValueError:
            return False

    later_rows = parsed[1:]
    later_numeric = any(_numeric(c) for row in later_rows for c in row)
    first_non_numeric = bool(first) and not any(_numeric(c) for c in first)
    if first_non_numeric and later_numeric:
        header = True
    elif first_non_numeric:
        # All-string file (no numeric cell anywhere) — the reference's
        # header_detection also falls back to name/shape heuristics here:
        # treat a first row of distinct, non-empty cells that never repeats
        # verbatim in the data as a header (column names are unique and
        # don't recur as data).
        header = (
            len(set(first)) == len(first)
            and all(c.strip() for c in first)
            and first not in later_rows
        )
    else:
        header = False
    return {
        "sep": best_sep,
        "header": header,
        "quote": best_quote,
        "escape": best_escape,
        "skip_rows": skip_rows,
    }


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    auto_detect: bool = True,
    **options,
) -> DataFrame:
    """CSV scan with dialect+type inference (read_csv_auto parity).

    With ``auto_detect`` (the default, like the reference) the dialect is
    sniffed driver-side and types are inferred by Spark's own schema
    inference pass; pass ``schema`` (DDL string) to skip inference —
    the fast path for production pipelines, exactly like giving the
    reference explicit ``columns=``.
    """
    reader = spark.read
    skip_rows = int(options.pop("skip_rows", options.pop("skip", 0)))
    if auto_detect and ("sep" not in options or "header" not in options):
        sniffed = sniff_csv(spark, path)
        options.setdefault("sep", sniffed["sep"])
        options.setdefault("header", sniffed["header"])
        options.setdefault("quote", sniffed["quote"])
        # Spark expresses quote-doubling as escape == quote
        options.setdefault("escape", sniffed["escape"])
        skip_rows = skip_rows or sniffed["skip_rows"]
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif auto_detect:
        reader = reader.option("inferSchema", True)
    if skip_rows:
        # leading junk lines (reference skip_rows): drop them from a text
        # scan, then parse the remainder with the same reader options.
        # zipWithIndex is per-file deterministic; skip-rows files are
        # driver-sized exports, not multi-file table scans.
        txt = (
            spark.read.text(path)
            .rdd.zipWithIndex()
            .filter(lambda t: t[1] >= skip_rows)
            .map(lambda t: t[0][0])
        )
        return reader.csv(txt)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    """NDJSON/JSON scan with structure inference (read_json parity)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan — row-group parallel, stats pruning, pushdown native."""
    return spark.read.parquet(*paths)


def read_arrow(spark: SparkSession, table) -> DataFrame:
    """Arrow table → DataFrame (Arrow batches cross the boundary)."""
    return spark.createDataFrame(table.to_pandas())


def glob_paths(spark: SparkSession, pattern: str) -> list[str]:
    """List files matching a glob (reference glob table function)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = p.getFileSystem(conf)
    statuses = fs.globStatus(p)
    return [] if statuses is None else [s.getPath().toString() for s in statuses]


def _write(df: DataFrame, path: str, fmt: str, mode: str, single_file: bool, **options):
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite",
    header: bool = True, single_file: bool = False, **options,
) -> None:
    """COPY … TO (FORMAT CSV): directory of part files; header per part."""
    _write(df, path, "csv", mode, single_file, header=header, **options)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False, **options) -> None:
    """COPY … TO (FORMAT JSON): NDJSON part files."""
    _write(df, path, "json", mode, single_file, **options)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None, compression: str = "zstd", **options,
) -> None:
    """COPY … TO (FORMAT PARQUET) incl. PARTITION_BY — at scale, always
    partition on the downstream filter key so scans prune directories."""
    writer = df.write.mode(mode).option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED managed table (hash-partitioned into
    ``n_buckets`` files per partition on ``bucket_cols``, optionally
    sorted within buckets).

    This is the 100 TB co-location primitive: two tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle — Spark's
    planner sees the matching hash distribution and elides both
    Exchanges (the reference gets the analogous effect from its
    radix-partitioned hash join building in-memory; at cluster scale
    pre-bucketing is how that partitioning is made durable). Asserted in
    tests/test_plans.py::test_bucketed_join_has_no_exchange."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (possibly bucketed) table; bucket metadata flows
    into the plan so joins/aggregations on the bucket key avoid
    shuffles."""
    return spark.table(table)
