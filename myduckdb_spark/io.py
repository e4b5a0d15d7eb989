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
import re

from pyspark.sql import DataFrame, SparkSession

_DELIMS = [",", "|", ";", "\t"]
_QUOTES = ['"', "'"]
_MAX_SKIP = 8


def _try_parse(
    lines: list[str], sep: str, quote: str, escape: str,
    skipinit: bool = False,
) -> list[list[str]] | None:
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
                skipinitialspace=skipinit,
                strict=True,
            )
        )
    except _csv.Error:
        return None
    return [r for r in rows if r]


def sniff_csv(
    spark: SparkSession, path: str, sample_lines: int = 64,
    force_sep: str | None = None, force_quote: str | None = None,
    force_header: bool | None = None, force_skip: int | None = None,
) -> dict:
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
    # sniff ONE file: a multi-file glob interleaves lines from several
    # files into the sample, which breaks header/skip detection (the
    # reference sniffer also operates on the first file)
    sniff_path = path
    try:
        first = _local_json_files(path, limit=1)
        if first:
            sniff_path = first[0]
    except OSError:
        pass
    lines = [
        r[0] for r in spark.read.text(sniff_path).limit(sample_lines).collect()
    ]
    # CR-only line endings (issue5077): Hadoop's text reader keeps bare
    # \r inside the "line" — split manually and remember the separator so
    # the CSV parse uses it too (duck's scanner treats \r as a newline)
    cr_linesep = any("\r" in ln for ln in lines)
    if cr_linesep:
        lines = [p for ln in lines for p in ln.split("\r")]
    if force_skip:
        # an explicit skip= pins the header/data start exactly there —
        # the dialect search must not auto-skip further (live oracle:
        # read_csv(..., header=1, skip=3) on a ragged tab file falls back
        # to a single column rather than skipping the header row too)
        lines = lines[force_skip:]
    if not lines:
        return {"sep": ",", "header": False, "quote": '"', "escape": '"',
                "skip_rows": 0, "skipinit": False, "keep_varchar": [],
                "multiline": False, "comment": None, "linesep": None}
    best = None  # (score tuple, sep, quote, escape, skipinit, comment, skip, rows)
    # skipping may leave a single data row (issue5077_aligned.csv: 2
    # lines, duck skips the first) — cap at len-1, not len-2
    max_skip = 0 if force_skip else min(_MAX_SKIP, max(0, len(lines) - 1))
    delims = [force_sep] if force_sep else _DELIMS
    quotes = [force_quote] if force_quote else _QUOTES
    # live DuckDB does NOT auto-detect comment lines (verified against
    # data/csv/comments/simple.csv — they come back as data); comments
    # only apply via the explicit comment= option, so the sniffer search
    # keeps a single no-comment candidate
    comments = [None]
    for sep in delims:
        for quote in quotes:
            for escape in (quote, "\\"):
                for skipinit in (False, True):
                  for comment in comments:
                    sample = (
                        lines if comment is None else
                        [ln for ln in lines
                         if not ln.lstrip().startswith(comment)]
                    )
                    for skip in range(0, max_skip + 1):
                        rows = _try_parse(sample[skip:], sep, quote, escape, skipinit)
                        if not rows:
                            continue
                        counts = {len(r) for r in rows}
                        if len(counts) != 1:
                            continue
                        cols = counts.pop()
                        if skip and cols > 1:
                            # the reference's dialect scan starts at the
                            # FIRST row that parses at the candidate
                            # width and requires consistency from there
                            # (dialect_detection.cpp rows_consistent): a
                            # same-width row inside the skipped prefix
                            # means the consistent region did not start
                            # here — the candidate is invalid, not
                            # "skippable further" (comments/empty_space)
                            pre = _try_parse(
                                sample[:skip], sep, quote, escape, skipinit
                            ) or []  # unparseable prefix = skippable junk
                            # a same-width prefix row means the region
                            # didn't start here; a WIDER one means this
                            # candidate under-counts columns (the oracle
                            # keeps single-column for `1;3#5;7` over
                            # `6;7`, test_comment_midline.test) — narrow
                            # prose prefixes (fewer cols) are the only
                            # legitimately skippable shape
                            if any(len(r) >= cols for r in pre):
                                break
                        # a parse that leaves a cell STARTING with a quote
                        # char didn't consume the quoting (space-before-
                        # quote files, wrong-quote candidates) — prefer
                        # parses with no unconsumed opening quotes
                        clean = not any(
                            cell.lstrip()[:1] in _QUOTES
                            for r in rows[:16] for cell in r
                        )
                        score = (
                            cols > 1,      # a real table beats 1 column
                            -skip,         # explain as much of the file as possible
                            cols,
                            clean,
                            comment is None,  # plain beats comment-strip
                            quote == '"',  # defaults win ties
                            escape == quote,
                            not skipinit,  # plain parse beats space-strip
                            -delims.index(sep),
                        )
                        if best is None or score > best[0]:
                            best = (score, sep, quote, escape, skipinit,
                                    comment, skip, rows)
                        break  # smallest skip for this dialect found
    if best is None:
        return {"sep": ",", "header": False, "quote": '"', "escape": '"',
                "skip_rows": 0, "skipinit": False, "keep_varchar": [],
                "multiline": False, "comment": None,
                "linesep": "\r" if cr_linesep else None}
    drop_malformed = False
    if len(best[7][0]) == 1 and not force_sep \
            and force_header is None and force_skip is None:
        # salvage only applies to fully-auto reads: an explicit header=
        # pins the first (post-skip) row as the header, which must parse
        # at the data width — dropping it as "malformed" contradicts the
        # user's dialect (live oracle: header=1,skip=3 on a ragged tab
        # file yields ONE column, test_sniffer_tab_delimiter.test)
        # No multi-column LINE-skip candidate survived, but the
        # reference's start_row is counted in ROWS: a quoted multi-line
        # blob is ONE (malformed, wrong-width) row, and the scanner
        # resumes at the first row of the eventual width, skipping the
        # dirty prefix (csv_quoted_newline_incorrect.test: 10 prose
        # lines fold into 2 one-column rows before `84,hello world`).
        # Salvage: a candidate whose width-m rows form the exact tail,
        # every prefix row a DIFFERENT width, wins over single-column.
        salvage = None
        for sep in delims:
            for quote in quotes:
                rows = _try_parse(lines, sep, quote, quote, False)
                if not rows or len(rows) < 2:
                    continue
                m = len(rows[-1])
                if m <= 1:
                    continue
                i0 = next(
                    (i for i, r in enumerate(rows) if len(r) == m), None,
                )
                if i0 is None or i0 == 0:
                    continue
                if all(len(r) == m for r in rows[i0:]) and \
                        all(len(r) < m for r in rows[:i0]):
                    if salvage is None or m > len(salvage[3][0]):
                        salvage = (sep, quote, quote, rows[i0:])
        if salvage is not None:
            best = ((), salvage[0], salvage[1], salvage[2], False,
                    None, 0, salvage[3])
            drop_malformed = True
    (_, best_sep, best_quote, best_escape, skipinit, best_comment,
     skip_rows, parsed) = best
    lines = lines[skip_rows:]
    first = parsed[0] if parsed else []

    def _numeric(cell: str) -> bool:
        try:
            float(cell)
            return True
        except ValueError:
            return False

    later_rows = parsed[1:]

    # The reference's header vote (header_detection.cpp): type the DATA
    # rows per column, then the first row is a header iff (a) some value
    # fails the cast to its column's detected type, or (b) every column
    # detected VARCHAR (indistinguishable — the reference defaults to
    # header). A first row that casts cleanly into a typed table is data.
    # Verified against the live oracle: duplicates of the first row in
    # the data and empty header cells do NOT veto the header.
    def _cell_type(cell: str) -> str:
        c = cell.strip()
        if not c:
            return "EMPTY"
        if c.lower() in ("true", "false", "t", "f"):
            # the reference's bool cast accepts t/f (type_detection.cpp)
            return "BOOL"
        if _numeric(c):
            return "NUM"
        from datetime import datetime as _dt

        for f, t in (("%Y-%m-%d", "DATE"), ("%m-%d-%Y", "DATE"),
                     ("%d-%m-%Y", "DATE"), ("%Y/%m/%d", "DATE"),
                     ("%m/%d/%Y", "DATE"), ("%d/%m/%Y", "DATE"),
                     ("%H:%M:%S", "TIME"),
                     ("%Y-%m-%d %H:%M:%S", "TS")):
            try:
                _dt.strptime(c, f)
                return t
            except ValueError:
                pass
        return "VARCHAR"

    ncols_h = max((len(r) for r in parsed), default=0)
    col_types = []
    for i in range(ncols_h):
        ts = {_cell_type(r[i]) for r in later_rows if len(r) > i}
        ts.discard("EMPTY")
        col_types.append(ts.pop() if len(ts) == 1 else "VARCHAR")
    if not first:
        header = False
    elif later_rows:
        if all(t == "VARCHAR" for t in col_types):
            header = True
        else:
            header = any(
                col_types[i] != "VARCHAR"
                and _cell_type(v) not in (col_types[i], "EMPTY")
                for i, v in enumerate(first) if i < len(col_types)
            )
    else:
        # single-row file: an all-text line IS the header for a zero-row
        # table; a typed single line (number/date/bool) is data
        header = all(_cell_type(v) in ("VARCHAR", "EMPTY") for v in first)
    if force_header is not None:
        header = force_header
    # numeric-LOOKING cells the reference's sniffer refuses to type as
    # numbers: leading '+' and leading zeros (type_detection.cpp digit
    # path) — those columns must stay VARCHAR even though Spark's
    # inference would parse them
    ncols = max((len(r) for r in parsed), default=0)
    keep_varchar = []
    for i in range(ncols):
        cells = [r[i] for r in parsed[(1 if header else 0):] if len(r) > i]
        vals = [c.strip() for c in cells if c.strip()]
        if vals and any(
            re.match(r"^\+\d", v) or re.match(r"^-?0\d", v) for v in vals
        ) and all(_numeric(v) for v in vals):
            keep_varchar.append(i)
            continue
        # partial time-ish cells ('12:0', '05:40'): Spark's inference
        # happily parses them as timestamps, the reference keeps them
        # VARCHAR (its sniffer TIME template is strictly %H:%M:%S)
        if vals and any(
            re.match(r"^\d{1,2}:\d{1,2}(:\d{1,2}(\.\d+)?)?$", v)
            and not re.match(r"^\d{1,2}:\d{2}:\d{2}(\.\d+)?$", v)
            for v in vals
        ):
            keep_varchar.append(i)
    # an odd quote count in a sampled line = a quoted cell spanning lines;
    # Spark needs multiLine for those files
    multiline = any(ln.count(best_quote) % 2 == 1 for ln in lines)
    return {
        "sep": best_sep,
        "header": header,
        "quote": best_quote,
        "escape": best_escape,
        "skip_rows": skip_rows,
        "skipinit": skipinit,
        "keep_varchar": keep_varchar,
        "multiline": multiline or drop_malformed,
        "comment": best_comment,
        "linesep": "\r" if cr_linesep else None,
        "drop_malformed": drop_malformed,
        "ncols": max((len(r) for r in parsed), default=0),
    }


# duck type name → Spark DDL type, for explicit read_csv columns=/types=
_DUCK2SPARK = {
    "VARCHAR": "STRING", "TEXT": "STRING", "CHAR": "STRING",
    "BPCHAR": "STRING", "UUID": "STRING", "JSON": "STRING",
    "INTEGER": "INT", "INT": "INT", "INT4": "INT", "SIGNED": "INT",
    "BIGINT": "BIGINT", "INT8": "BIGINT", "LONG": "BIGINT",
    "SMALLINT": "SMALLINT", "INT2": "SMALLINT", "SHORT": "SMALLINT",
    "TINYINT": "TINYINT", "INT1": "TINYINT",
    "HUGEINT": "DECIMAL(38,0)", "UHUGEINT": "DECIMAL(38,0)",
    "UTINYINT": "SMALLINT", "USMALLINT": "INT", "UINTEGER": "BIGINT",
    "UBIGINT": "DECIMAL(20,0)",
    "DOUBLE": "DOUBLE", "FLOAT8": "DOUBLE", "FLOAT": "FLOAT",
    "FLOAT4": "FLOAT", "REAL": "FLOAT",
    "BOOLEAN": "BOOLEAN", "BOOL": "BOOLEAN",
    "DATE": "DATE", "TIMESTAMP": "TIMESTAMP_NTZ",
    "DATETIME": "TIMESTAMP_NTZ", "TIMESTAMPTZ": "TIMESTAMP_LTZ",
    "BLOB": "BINARY", "BYTEA": "BINARY",
}


def _duck2spark_type(t: str) -> str:
    t = t.strip().upper()
    if t.startswith(("DECIMAL", "NUMERIC")):
        return t.replace("NUMERIC", "DECIMAL") if "(" in t \
            else "DECIMAL(18,3)"
    return _DUCK2SPARK.get(t, t)


# SQL keywords (libpg_query grammar, duckdb_keywords()): normalize_names
# prefixes a normalized column that collides with any of these
_SQL_KEYWORDS = frozenset(
    """abort absolute access action add admin after aggregate all also alter
always analyse analyze and anti any array as asc asof assertion
assignment asymmetric at attach attribute authorization backward
before begin between bigint binary bit boolean both by cache call
called cascade cascaded case cast catalog centuries century chain char
character characteristics check checkpoint class close cluster
coalesce collate collation column columns comment comments commit
committed compression concurrently configuration conflict connection
constraint constraints content continue conversion copy cost create
cross csv cube current cursor cycle data database day days deallocate
dec decade decades decimal declare default defaults deferrable
deferred definer delete delimiter delimiters depends desc describe
detach dictionary disable discard distinct do document domain double
drop each else enable encoding encrypted end enum escape event except
exclude excluding exclusive execute exists explain export export_state
extension extensions external extract false family fetch filter first
float following for force foreign forward freeze from full function
functions generated glob global grant granted group grouping
grouping_id groups handler having header hold hour hours identity if
ignore ilike immediate immutable implicit import in include including
increment index indexes inherit inherits initially inline inner inout
input insensitive insert install instead int integer intersect
interval into invoker is isnull isolation join json key label language
large last lateral leading leakproof left level like limit listen load
local location lock locked logged macro map mapping match materialized
maxvalue method microsecond microseconds millennia millennium
millisecond milliseconds minute minutes minvalue mode month months
move name names national natural nchar new next no none not nothing
notify notnull nowait null nullif nulls numeric object of off offset
oids old on only operator option options or order ordinality others
out outer over overlaps overlay overriding owned owner parallel parser
partial partition passing password percent persistent pivot
pivot_longer pivot_wider placing plans policy position positional
pragma preceding precision prepare prepared preserve primary prior
privileges procedural procedure program publication qualify quarter
quarters quote range read real reassign recheck recursive ref
references referencing refresh reindex relative release rename
repeatable replace replica reset respect restart restrict returning
returns revoke right role rollback rollup row rows rule sample
savepoint schema schemas scope scroll search second seconds secret
security select semi sequence sequences serializable server session
set setof sets share show similar simple skip smallint snapshot some
sql stable standalone start statement statistics stdin stdout storage
stored strict strip struct subscription substring summarize symmetric
sysid system table tables tablesample tablespace temp template
temporary text then ties time timestamp to trailing transaction
transform treat trigger trim true truncate trusted try_cast type types
unbounded uncommitted unencrypted union unique unknown unlisten
unlogged unpivot until update use user using vacuum valid validate
validator value values varchar variadic varying verbose version view
views virtual volatile week weeks when where whitespace window with
within without work wrapper write xml xmlattributes xmlconcat
xmlelement xmlexists xmlforest xmlnamespaces xmlparse xmlpi xmlroot
xmlserialize xmltable year years yes zone""".split()
)


def _normalize_csv_name(name: str) -> str:
    """read_csv normalize_names: lowercase, non-alnum -> '_', prefix '_'
    when the name starts with a digit (csv sniffer NormalizeColumnNames)."""
    import unicodedata

    s = unicodedata.normalize("NFKD", name.strip())
    s = "".join(c for c in s if not unicodedata.combining(c))
    out = re.sub(r"[^0-9A-Za-z_]", "_", s).lower()
    out = re.sub(r"_+", "_", out).strip("_")
    if not out:
        return "_"
    if out[0].isdigit() or out in _SQL_KEYWORDS:
        out = "_" + out
    return out


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
    names = options.pop("names", None)
    types = options.pop("types", None)
    columns = options.pop("columns", None)
    all_varchar = options.pop("all_varchar", False)
    normalize_names = options.pop("normalize_names", False)
    if columns:
        # explicit name->type map (read_csv columns=): fixed schema, no
        # type inference — exactly the reference's explicit-columns path
        schema = ", ".join(
            f"`{n}` {_duck2spark_type(t)}" for n, t in columns.items()
        )
        if len(columns) == 1 and "sep" not in options:
            # a declared single-column file reads whole lines (the
            # reference pins the sniffer to the declared column count, so
            # no delimiter can split the line)
            options["sep"] = "\x01"
        if "header" not in options:
            # with explicit columns= the reference detects a header row
            # by NAME match against the declared columns, not by type
            try:
                ln = spark.read.text(path).limit(1).collect()
                cells = [
                    c.strip().strip('"')
                    for c in ln[0][0].split(options.get("sep", ","))
                ] if ln else []
                options["header"] = (
                    [c.lower() for c in cells]
                    == [n.lower() for n in columns]
                )
            except Exception:
                pass
    if isinstance(path, str):
        path = _force_compression(path, options.pop("compression", None))
    else:
        options.pop("compression", None)
    if isinstance(path, str) and "**" in path:
        import glob as _glob

        p = path[len("file://"):] if path.startswith("file://") else path
        import os as _os

        # duck's ** crawl includes hidden files but not symlinks
        # (glob.cpp crawl); Spark sink artifacts (_SUCCESS, .crc) stay out
        hits = sorted(
            f for f in _glob.glob(p, recursive=True, include_hidden=True)
            if _os.path.isfile(f) and not _os.path.islink(f)
            and not f.rsplit("/", 1)[-1].startswith("_")
            and not f.endswith(".crc")
        )
        if any(h.rsplit("/", 1)[-1].startswith(".") for h in hits):
            # Hadoop's input format silently drops dot-prefixed paths
            # even when listed explicitly — stage hidden files under
            # sanitized names (corpus-scale crawl oddity, not a hot path)
            import shutil as _sh
            import tempfile as _tf

            staged = _tf.mkdtemp(prefix="mdbs_hidden_")
            out_hits = []
            for i, h in enumerate(hits):
                base = h.rsplit("/", 1)[-1]
                if base.startswith("."):
                    dst = _os.path.join(staged, f"h{i}_{base.lstrip('.')}")
                    _sh.copyfile(h, dst)
                    out_hits.append(dst)
                else:
                    out_hits.append(h)
            hits = out_hits
        if hits:
            path = hits
    reader = spark.read
    skip_rows = int(options.pop("skip_rows", options.pop("skip", 0)))
    drop_mal_ncols = None
    keep_varchar: list[int] = []
    if auto_detect and ("sep" not in options or "header" not in options):
        # a caller-supplied sep constrains the dialect search (header/
        # quote detection must see the file through THAT delimiter)
        fh = options.get("header")
        if isinstance(fh, str):
            fh = fh.lower() in ("true", "1")
        # multi-file scans sniff EACH file (the reference sniffs per
        # file — a glob may mix dialects); heterogeneous dialects read
        # per-file and union positionally under the first file's names.
        # Capped at 16 files — larger fleets assume one dialect (the
        # production case; a 100k-file lake scan must not sniff serially)
        if "sep" not in options and schema is None:
            try:
                _files = _local_json_files(path, limit=16)
            except OSError:
                _files = []
            if 1 < len(_files) <= 16:
                dialects = {
                    (s["sep"], s["header"], s["quote"], s["escape"])
                    for s in (sniff_csv(spark, f) for f in _files)
                }
                if len(dialects) > 1:
                    sub = dict(options)
                    for kk, vv in (("names", names), ("types", types),
                                   ("all_varchar", all_varchar),
                                   ("normalize_names", normalize_names)):
                        if vv:
                            sub[kk] = vv
                    dfs = [
                        read_csv(spark, f, auto_detect=True, **sub)
                        for f in _files
                    ]
                    out = dfs[0]
                    for d in dfs[1:]:
                        out = out.union(d.toDF(*out.columns))
                    return out
        sniffed = sniff_csv(
            spark, path,
            force_sep=options.get("sep"),
            force_quote=options.get("quote"),
            force_header=fh if "header" in options else None,
            force_skip=skip_rows or None,
        )
        options.setdefault("sep", sniffed["sep"])
        options.setdefault("header", sniffed["header"])
        options.setdefault("quote", sniffed["quote"])
        # Spark expresses quote-doubling as escape == quote
        options.setdefault("escape", sniffed["escape"])
        if sniffed["skipinit"]:
            options.setdefault("ignoreLeadingWhiteSpace", "true")
        if sniffed["multiline"]:
            options.setdefault("multiLine", "true")
        if sniffed["comment"]:
            options.setdefault("comment", sniffed["comment"])
        if sniffed.get("linesep"):
            options.setdefault("lineSep", sniffed["linesep"])
        keep_varchar = sniffed["keep_varchar"]
        skip_rows = skip_rows or sniffed["skip_rows"]
        if sniffed.get("drop_malformed") and schema is None:
            # dirty-prefix salvage: rows at the wrong width are dropped
            # (the reference's scanner skips malformed lines) — an
            # all-string schema at the sniffed width replaces inference
            # (Spark can't infer over malformed rows), types are
            # promoted sample-side in _csv_refine
            drop_mal_ncols = sniffed["ncols"]
            options.setdefault("mode", "DROPMALFORMED")
            schema = ", ".join(
                f"_c{i} STRING" for i in range(drop_mal_ncols)
            )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif auto_detect and not all_varchar:
        reader = reader.option("inferSchema", True)

    def _post(df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if names:
            cur = df.columns
            df = df.toDF(*[
                names[i] if i < len(names) else c
                for i, c in enumerate(cur)
            ])
        if types:
            pairs = (
                [(c, t) for c, t in types.items()]
                if isinstance(types, dict) else list(zip(df.columns, types))
            )
            low = {c.lower(): c for c in df.columns}
            for c, t in pairs:
                c = low.get(c.lower(), c)
                df = df.withColumn(c, F.col(f"`{c}`").cast(
                    _duck2spark_type(t)
                ))
        if normalize_names:
            df = df.toDF(*[_normalize_csv_name(c) for c in df.columns])
        return df

    if skip_rows:
        # leading junk lines (reference skip_rows): drop them from a text
        # scan, then parse the remainder with the same reader options.
        # zipWithIndex is per-file deterministic; skip-rows files are
        # driver-sized exports, not multi-file table scans.
        _tr = spark.read
        if options.get("lineSep"):
            _tr = _tr.option("lineSep", options["lineSep"])
        txt = (
            _tr.text(path)
            .rdd.zipWithIndex()
            .filter(lambda t: t[1] >= skip_rows)
            .map(lambda t: t[0][0])
        )
        return _post(_csv_refine(reader.csv(txt)))
    df = reader.csv(path)
    if schema is not None or not auto_detect:
        if drop_mal_ncols:
            return _post(_csv_refine(df, promote_numeric=True))
        return _post(df)
    if keep_varchar:
        # sniffer saw '+'-prefixed / zero-padded numerics: those columns
        # must stay VARCHAR verbatim — re-read with the inferred schema
        # demoted at those positions (a cast-back would lose the padding)
        from pyspark.sql import types as T

        fields = list(df.schema.fields)
        changed = False
        for i in keep_varchar:
            if i < len(fields) and not isinstance(
                fields[i].dataType, T.StringType
            ):
                fields[i] = T.StructField(
                    fields[i].name, T.StringType(), True
                )
                changed = True
        if changed:
            df = reader.schema(T.StructType(fields)).csv(path)

    def _raw():
        r = spark.read
        for k, v in options.items():
            r = r.option(k, v)
        return r.csv(path)

    return _post(_csv_refine(df, _raw))


_COMP_EXT = {"gzip": ".gz", "zstd": ".zst", "bz2": ".bz2", "xz": ".xz"}


def _force_compression(path: str, comp: str | None) -> str:
    """An explicit COMPRESSION codec on a file whose extension doesn't
    advertise it (reference read_csv compression flag): Spark picks the
    codec from the extension, so read through a correctly-suffixed
    symlink — zero-copy, works for any size."""
    comp = (comp or "").lower().strip("'\"")
    ext = _COMP_EXT.get(comp)
    if not ext or path.endswith(ext) or "*" in path or "?" in path:
        return path
    import os as _os
    import tempfile as _tempfile

    p = path[len("file://"):] if path.startswith("file://") else path
    if not _os.path.isfile(p):
        return path
    d = _tempfile.mkdtemp(prefix="csvcomp_")
    link = _os.path.join(d, _os.path.basename(p) + ext)
    _os.symlink(_os.path.abspath(p), link)
    return link


def _csv_refine(df: DataFrame, raw=None, promote_numeric: bool = False) -> DataFrame:
    """Align Spark's CSV inference with the reference sniffer's type
    lattice (type_detection.cpp: SQLNULL→BOOLEAN→BIGINT→DOUBLE→TIME→DATE→
    TIMESTAMP→VARCHAR): integers are always BIGINT (never INT/SMALLINT),
    bare times stay times (not today-anchored timestamps), and slash/dot
    date formats are detected. ``raw`` (optional zero-arg callable → the
    same parse with an all-strings schema) resolves cases where the raw
    cell text decides the type: DATE is tried BEFORE TIMESTAMP in the
    reference lattice, so date-only text — even with surrounding padding
    that makes Spark infer TIMESTAMP — types as DATE
    (copy/csv/auto/test_type_detection.test, *_trailing.csv)."""
    from pyspark.sql import functions as F

    df = _fix_time_columns(df)
    tscols = [c for c, t in df.dtypes if t.startswith("timestamp")]
    if tscols and raw is not None:
        try:
            rdf = raw() if callable(raw) else raw
            pos = {c: i for i, c in enumerate(df.columns)}
            picks = [(c, rdf.columns[pos[c]]) for c in tscols
                     if pos[c] < len(rdf.columns)]
            sample = rdf.select(
                *[F.trim(F.col(f"`{rc}`")).alias(f"c_{i}")
                  for i, (_c, rc) in enumerate(picks)]
            ).limit(1024).collect()
            import re as _re

            _dre = _re.compile(r"^\d{4}-\d{1,2}-\d{1,2}$")
            demote = set()
            for i, (c, _rc) in enumerate(picks):
                vals = [r[f"c_{i}"] for r in sample
                        if r[f"c_{i}"] not in (None, "")]
                if vals and all(_dre.match(v) for v in vals):
                    demote.add(c)
            if demote:
                df = df.select(
                    *[F.col(f"`{c}`").cast("date").alias(c)
                      if c in demote else F.col(f"`{c}`")
                      for c in df.columns]
                )
        except Exception:
            pass
    df = _detect_temporal_columns(
        df, _CSV_DATE_CANDIDATES, _CSV_TS_CANDIDATES
    )
    if promote_numeric:
        # all-string salvage schema (DROPMALFORMED path): Spark's
        # inference never ran, so promote numeric columns from a bounded
        # sample the way the reference lattice does (BIGINT before
        # DOUBLE, type_detection.cpp)
        strcols_n = [c for c, t in df.dtypes if t == "string"]
        if strcols_n:
            aggs_n = []
            for i, c in enumerate(strcols_n):
                qc = F.trim(F.col(f"`{c}`"))
                aggs_n.append(F.count(F.when(qc != "", 1)).alias(f"n_{i}"))
                aggs_n.append(F.count(F.when(
                    qc.try_cast("bigint").isNotNull(), 1)).alias(f"i_{i}"))
                aggs_n.append(F.count(F.when(
                    qc.try_cast("double").isNotNull(), 1)).alias(f"d_{i}"))
            row_n = df.limit(1024).agg(*aggs_n).first()
            promo = {}
            for i, c in enumerate(strcols_n):
                n = row_n[f"n_{i}"]
                if not n:
                    continue
                if row_n[f"i_{i}"] == n:
                    promo[c] = "bigint"
                elif row_n[f"d_{i}"] == n:
                    promo[c] = "double"
            if promo:
                df = df.select(
                    *[F.col(f"`{c}`").cast(promo[c]).alias(c)
                      if c in promo else F.col(f"`{c}`")
                      for c in df.columns]
                )
    # t/f bool spellings: the reference's sniffer types a column of
    # t/f/true/false as BOOLEAN (type_detection.cpp bool cast accepts
    # t/f); Spark only infers true/false, leaving t/f as STRING
    strcols_b = [c for c, t in df.dtypes if t == "string"]
    if strcols_b:
        sample_b = df.select(
            *[F.lower(F.trim(F.col(f"`{c}`"))).alias(f"c_{i}")
              for i, c in enumerate(strcols_b)]
        ).limit(1024).collect()
        _bool = {"t", "f", "true", "false"}
        demote_b = set()
        for i, c in enumerate(strcols_b):
            vals = [r[f"c_{i}"] for r in sample_b
                    if r[f"c_{i}"] not in (None, "")]
            if vals and all(v in _bool for v in vals):
                demote_b.add(c)
        if demote_b:
            df = df.select(
                *[F.when(F.lower(F.trim(F.col(f"`{c}`"))).isin("t", "true"),
                         F.lit(True))
                  .when(F.lower(F.trim(F.col(f"`{c}`"))).isin("f", "false"),
                        F.lit(False))
                  .alias(c)
                  if c in demote_b else F.col(f"`{c}`")
                  for c in df.columns]
            )
    ints = {c for c, t in df.dtypes if t in ("int", "smallint", "tinyint")}
    if ints:
        df = df.select(
            *[F.col(f"`{c}`").cast("bigint").alias(c) if c in ints
              else F.col(f"`{c}`") for c in df.columns]
        )
    # The reference sniffer never yields TIMESTAMP WITH TIME ZONE:
    # offset-bearing cells are normalized to UTC and stored as naive
    # TIMESTAMP (csv_scanner type lattice ends at TIMESTAMP). Spark infers
    # offset-bearing cells as instant TIMESTAMP (LTZ); with the session
    # pinned to UTC the NTZ cast is value-preserving and restores parity.
    ltz = {c for c, t in df.dtypes if t == "timestamp"}
    if ltz:
        df = df.select(
            *[F.col(f"`{c}`").cast("timestamp_ntz").alias(c) if c in ltz
              else F.col(f"`{c}`") for c in df.columns]
        )
    return df


def _fix_time_columns(df: DataFrame) -> DataFrame:
    """DuckDB's CSV sniffer types bare ``HH:MM:SS`` cells as TIME; Spark's
    inference promotes them to TIMESTAMP *anchored at the read date*
    (nondeterministic output!). Detect timestamp columns whose sampled
    rendering is time-only-at-today and demote to the canonical time text
    (the engine's scan-level TIME surface — the DDL TIME type is the
    separate µs-BIGINT convention, sql.py TYPE map)."""
    from datetime import date

    from pyspark.sql import functions as F

    tscols = [c for c, t in df.dtypes if t.startswith("timestamp")]
    if not tscols:
        return df
    today = date.today().isoformat()
    sample = df.select(
        *[F.col(f"`{c}`").cast("string").alias(f"c_{i}")
          for i, c in enumerate(tscols)]
    ).limit(1024).collect()
    demote = set()
    for i, c in enumerate(tscols):
        vals = [r[f"c_{i}"] for r in sample if r[f"c_{i}"] is not None]
        if vals and all(v.startswith(today + " ") for v in vals):
            demote.add(c)
    if not demote:
        return df
    return df.select(
        *[
            F.date_format(F.col(f"`{c}`"), "HH:mm:ss").alias(
                # the declared type is TIME (reference sniffer lattice,
                # type_detection.cpp); the carrier is STRING — field
                # metadata lets typeof() rebind the duck name
                # (copy/csv/auto/test_type_detection.test)
                c, metadata={"duck_type": "TIME"})
            if c in demote else F.col(f"`{c}`")
            for c in df.columns
        ]
    )


# DuckDB's read_json auto-detects DATE / TIMESTAMP string columns by
# checking every sampled value against a fixed candidate-format list; the
# LAST candidate still consistent with all values wins (reference
# extension/json/json_scan.cpp:102-105 format templates;
# include/json_scan.hpp DateFormatMap::GetFormat returns .back()).
# Formats here are the Spark DateTimeFormatter spellings of those
# templates; the bool marks two-digit-year formats (%y), whose Java
# parse (2000-2099) must be shifted to DuckDB's POSIX pivot (69-99 ->
# 1900s; strftime_format.cpp:968-972).
_JSON_DATE_CANDIDATES = [
    ("MM-dd-yyyy", False), ("MM-dd-yy", True), ("dd-MM-yyyy", False),
    ("dd-MM-yy", True), ("yyyy-MM-dd", False), ("yy-MM-dd", True),
]
_JSON_TS_CANDIDATES = [
    ("yyyy-MM-dd HH:mm:ss.SSSSSS", False),
    ("MM-dd-yyyy hh:mm:ss a", False), ("MM-dd-yy hh:mm:ss a", True),
    ("dd-MM-yyyy HH:mm:ss", False), ("dd-MM-yy HH:mm:ss", True),
    ("yyyy-MM-dd HH:mm:ss", False), ("yy-MM-dd HH:mm:ss", True),
    ("yyyy-MM-dd'T'HH:mm:ss'Z'", False),
]
_JSON_DETECT_SAMPLE = 20480  # DuckDB json auto-detect sample_size default


def _temporal_cast_sql(col: str, fmt: str, two_digit: bool, as_date: bool) -> str:
    b = f"`{col}`"
    f_lit = fmt.replace("'", "''")
    ts = f"try_to_timestamp({b}, '{f_lit}')"
    if two_digit:
        ts = (
            f"CASE WHEN year({ts}) >= 2069 THEN {ts} - INTERVAL 100 YEARS "
            f"ELSE {ts} END"
        )
    return (f"CAST(({ts}) AS DATE) AS {b}" if as_date else f"({ts}) AS {b}")


# The CSV sniffer tries the same templates under '-', '/' and '.'
# separators (reference csv_scanner/sniffer/type_detection.cpp format
# candidates; the dialect's separator is substituted into the template).
_CSV_DATE_CANDIDATES = [
    (fmt.replace("-", sep), two)
    for sep in ("-", "/", ".")
    for fmt, two in _JSON_DATE_CANDIDATES
]
_CSV_TS_CANDIDATES = [
    (fmt.replace("-", sep, 2) if sep != "-" else fmt, two)
    for sep in ("-", "/", ".")
    for fmt, two in _JSON_TS_CANDIDATES
    if not (sep != "-" and fmt.startswith("yyyy-MM-dd'T'"))
]


_UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def _detect_temporal_columns(
    df: DataFrame, date_cands=None, ts_cands=None, detect_uuid=False
) -> DataFrame:
    """Refine all-parseable string columns to DATE/TIMESTAMP on a bounded
    sample (one driver-side agg over <= _JSON_DETECT_SAMPLE rows — never a
    full extra scan of a large input). With ``detect_uuid`` (read_json:
    the reference's json type detection includes UUID; the CSV lattice
    does not), all-uuid string columns keep the STRING carrier but carry
    ``duck_type: UUID`` field metadata for the typeof() registry bind."""
    from pyspark.sql import functions as F

    date_cands = date_cands or _JSON_DATE_CANDIDATES
    ts_cands = ts_cands or _JSON_TS_CANDIDATES
    strcols = [c for c, t in df.dtypes if t == "string"
               and c != "_corrupt_record"]
    if not strcols or [c for c, _ in df.dtypes] == ["_corrupt_record"]:
        # unparseable input (corrupt-record-only frames can't even be
        # queried — Spark QUERY_ONLY_CORRUPT_RECORD_COLUMN)
        return df
    cands = date_cands + ts_cands
    sample = df.limit(_JSON_DETECT_SAMPLE)
    aggs = []
    for i, c in enumerate(strcols):
        qc = F.col(f"`{c}`")
        aggs.append(F.count(qc).alias(f"n_{i}"))
        for j, (fmt, _) in enumerate(cands):
            aggs.append(
                F.count(F.try_to_timestamp(qc, F.lit(fmt))).alias(f"c_{i}_{j}")
            )
        if detect_uuid:
            aggs.append(
                F.count(F.when(qc.rlike(_UUID_RE), 1)).alias(f"u_{i}")
            )
    row = sample.agg(*aggs).first()
    n_date = len(date_cands)
    casts: dict[str, str] = {}
    uuids: set[str] = set()
    for i, c in enumerate(strcols):
        n = row[f"n_{i}"]
        if not n:
            continue
        date_js = [j for j in range(n_date) if row[f"c_{i}_{j}"] == n]
        ts_js = [j for j in range(n_date, len(cands)) if row[f"c_{i}_{j}"] == n]
        if date_js:
            fmt, two = date_cands[date_js[-1]]
            casts[c] = _temporal_cast_sql(c, fmt, two, as_date=True)
        elif ts_js:
            fmt, two = cands[ts_js[-1]]
            casts[c] = _temporal_cast_sql(c, fmt, two, as_date=False)
        elif detect_uuid and row[f"u_{i}"] == n:
            uuids.add(c)
    if not casts and not uuids:
        return df
    return df.select(
        *[
            F.expr(casts[c]) if c in casts
            else F.col(f"`{c}`").alias(c, metadata={"duck_type": "UUID"})
            if c in uuids
            else F.col(f"`{c}`")
            for c in df.columns
        ]
    )


def _local_json_files(path: str, limit: int = 4) -> list[str]:
    """Resolve a local path/glob to data files, descending one level into
    Spark-written directories (part files; _SUCCESS/.crc skipped)."""
    import glob as _glob
    import os as _os

    if isinstance(path, list):
        path = path[0] if path else ""
    p = path[len("file://"):] if path.startswith("file://") else path
    out: list[str] = []
    for m in sorted(_glob.glob(p)) or [p]:
        if _os.path.isdir(m):
            out.extend(
                _os.path.join(m, f) for f in sorted(_os.listdir(m))
                if not f.startswith((".", "_"))
            )
        else:
            out.append(m)
        if len(out) >= limit:
            break
    return out[:limit]


def _sniff_json_format(path: str) -> bool:
    """True when the file is a top-level JSON *array* (DuckDB read_json
    format='auto' array detection, extension/json/json_scan.cpp). Spark
    needs multiLine=true for those. Local-FS sniff of the first file's
    first non-whitespace byte; silently false for non-local/glob-miss."""
    try:
        files = _local_json_files(path, limit=1)
        if not files:
            return False
        with open(files[0], "rb") as fh:
            head = fh.read(8192).lstrip()
        return head.startswith(b"[")
    except OSError:
        return False


def _empty_object_paths(path: str, multiline: bool) -> list[tuple[str, ...]]:
    """Field paths whose value is an always-empty JSON object. Spark's
    inference silently DROPS such fields (empty structs are pruned);
    DuckDB types them MAP(VARCHAR, JSON) (json_structure.cpp empty-object
    rule). Bounded local-FS sample; [] on any parse trouble."""
    import json as _json

    try:
        docs = []
        for m in _local_json_files(path):
            with open(m, "rb") as fh:
                raw = fh.read(1 << 20)
            if multiline:
                docs.extend(x for x in _json.loads(raw) if isinstance(x, dict))
            else:
                for line in raw.splitlines()[:2048]:
                    line = line.strip()
                    if line:
                        d = _json.loads(line)
                        if isinstance(d, dict):
                            docs.append(d)
    except (OSError, ValueError):
        return []

    empties: dict[tuple[str, ...], bool] = {}

    def walk(obj, prefix):
        for k, v in obj.items():
            kp = prefix + (k,)
            if isinstance(v, dict):
                if v:
                    empties[kp] = False
                    walk(v, kp)
                elif kp not in empties:
                    empties[kp] = True
    for d in docs:
        walk(d, ())
    return [kp for kp, only_empty in empties.items() if only_empty]


def _schema_with_variants(schema, paths: list[tuple[str, ...]]):
    """Insert VariantType fields at the given (dropped) paths. VARIANT is
    our carrier for DuckDB's JSON logical type (typeof renders it JSON —
    functions/typenames.py); the JSON reader parses any value into it and
    leaves it NULL where the field is absent."""
    from pyspark.sql import types as T

    def rebuild(st: T.StructType, prefix: tuple) -> T.StructType:
        names = {f.name for f in st.fields}
        fields = []
        for f in st.fields:
            sub = [p for p in paths if p[:len(prefix)] == prefix
                   and len(p) > len(prefix) + 1 and p[len(prefix)] == f.name]
            dt = f.dataType
            if isinstance(dt, T.StructType) and sub:
                dt = rebuild(dt, prefix + (f.name,))
            fields.append(T.StructField(f.name, dt, f.nullable))
        for p in sorted(paths):
            if p[:len(prefix)] == prefix and len(p) == len(prefix) + 1 \
                    and p[len(prefix)] not in names:
                fields.append(T.StructField(p[len(prefix)], T.VariantType(), True))
        return T.StructType(fields)

    return rebuild(schema, ())


def read_json(spark: SparkSession, path: str, schema: str | None = None, **options) -> DataFrame:
    """NDJSON/JSON scan with structure inference (read_json parity):
    array-format (multiLine) sniffing, DuckDB temporal auto-detection,
    and empty-object fields recovered as MAP(VARCHAR, JSON)."""
    detect = options.pop("detect_temporal", True)
    multiline = options.pop("multiLine", None)
    if isinstance(multiline, str):
        # Spark reader options arrive as strings; 'false'/'0' must not be
        # truthy (mirrors read_csv's header normalization)
        multiline = multiline.strip().lower() in ("true", "1")
    if multiline is None and isinstance(path, str):
        multiline = _sniff_json_format(path)
    reader = spark.read
    if multiline:
        reader = reader.option("multiLine", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
        return reader.json(path)
    df = reader.json(path)
    if detect:
        empties = _empty_object_paths(path, bool(multiline))
        if empties:
            df = reader.schema(
                _schema_with_variants(df.schema, empties)
            ).json(path)
        df = _detect_temporal_columns(df, detect_uuid=True)
    return df


def fix_nanos_timestamps(df: DataFrame, *paths: str) -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as BIGINT nanos (the
    session sets spark.sql.legacy.parquet.nanosAsLong — Spark has no ns
    unit); the reference's reader converts to µs timestamps
    (parquet/column_reader.cpp, copy/parquet/parquet_4442.test). Detect
    ns fields from one file's footer (pyarrow) and convert. Integer DIV,
    not float division: ns epochs exceed 2^53."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        first = None
        for p in paths:
            if not isinstance(p, str):
                continue
            fl = _local_json_files(p, limit=1)
            if fl:
                first = fl[0]
                break
        if first is None:
            return df
        sch = pq.read_schema(first)
        ns = {
            f.name for f in sch
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
        dts = dict(df.dtypes)
        conv = [c for c in df.columns if c in ns and dts.get(c) == "bigint"]
        if not conv:
            return df
        from pyspark.sql import functions as F

        return df.select(
            *[F.expr(
                f"CAST(timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT)) "
                f"AS TIMESTAMP_NTZ)"
            ).alias(c) if c in conv else F.col(f"`{c}`")
              for c in df.columns]
        )
    except Exception:
        return df


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet scan — row-group parallel, stats pruning, pushdown native."""
    return fix_nanos_timestamps(spark.read.parquet(*paths), *paths)


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
