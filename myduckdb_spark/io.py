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


def sniff_csv(spark: SparkSession, path: str, sample_lines: int = 64) -> dict:
    """Detect delimiter and header presence from a small sample.

    Mirrors the reference's dialect/header sniffer
    (``sniffer/dialect_detection.cpp``, ``header_detection.cpp``) with a
    driver-side sample: the delimiter is the candidate yielding the most
    columns with a consistent count across sample lines; the file has a
    header if the first row's cells are non-numeric while later rows are
    numeric somewhere. Returns ``{"sep": str, "header": bool}``.
    """
    lines = [r[0] for r in spark.read.text(path).limit(sample_lines).collect()]
    if not lines:
        return {"sep": ",", "header": False}
    best_sep, best_cols = ",", 1
    for sep in _DELIMS:
        try:
            rows = list(_csv.reader(_io.StringIO("\n".join(lines)), delimiter=sep))
        except _csv.Error:
            continue
        counts = {len(r) for r in rows if r}
        if len(counts) == 1 and (cols := counts.pop()) > best_cols:
            best_sep, best_cols = sep, cols
    first = next(_csv.reader(_io.StringIO(lines[0]), delimiter=best_sep), [])

    def _numeric(cell: str) -> bool:
        try:
            float(cell)
            return True
        except ValueError:
            return False

    later_rows = [
        next(_csv.reader(_io.StringIO(line), delimiter=best_sep), []) for line in lines[1:]
    ]
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
    return {"sep": best_sep, "header": header}


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
    if auto_detect and ("sep" not in options or "header" not in options):
        sniffed = sniff_csv(spark, path)
        options.setdefault("sep", sniffed["sep"])
        options.setdefault("header", sniffed["header"])
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif auto_detect:
        reader = reader.option("inferSchema", True)
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
