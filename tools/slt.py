"""Mini sqllogictest runner over the reference's public test corpus.

The reference's primary test strategy is sqllogictest files
(SURVEY.md §5; runner test/sqlite/sqllogic_test_runner.hpp). This runner
executes a .test file's statements in DuckDB (the state builder: CREATE/
INSERT/etc.), and for every ``query`` block runs the SAME SQL through BOTH
the engine's SQL front door (myduckdb_spark.sql.sql, i.e. dialect
translation + spark.sql over temp views snapshotting the DuckDB state)
AND DuckDB itself, comparing canonicalized row sets. That checks OUR
engine against the reference behavior on the reference's own tests —
including expected-output bugs in the fork's files (the comparison target
is DuckDB's actual result, not the file's expected block, exactly like
``PRAGMA enable_verification`` re-verifies internally).

Scope: files whose SQL the dialect front door supports; the curated list
lives in tests/test_slt_corpus.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class Record:
    kind: str  # "statement_ok" | "statement_error" | "query"
    sql: str
    types: str = ""
    sortmode: str = ""


def parse(path: str) -> list[Record]:
    recs: list[Record] = []
    lines = open(path).read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("statement"):
            kind = "statement_error" if "error" in line else "statement_ok"
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() not in ("", "----"):
                sql_lines.append(lines[i])
                i += 1
            # skip an expected-error block after ----
            if i < len(lines) and lines[i].strip() == "----":
                i += 1
                while i < len(lines) and lines[i].strip() != "":
                    i += 1
            recs.append(Record(kind, "\n".join(sql_lines)))
        elif line.startswith("query"):
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            sortmode = parts[2] if len(parts) > 2 else ""
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            while i < len(lines) and lines[i].strip() != "":
                i += 1  # skip expected block (we verify against live DuckDB)
            recs.append(Record("query", "\n".join(sql_lines), types, sortmode))
        elif line.startswith(("loop", "foreach", "endloop", "mode", "require")):
            raise NotImplementedError(f"unsupported sqllogictest directive: {line}")
        else:
            i += 1
    return recs


def _canon(rows) -> list[str]:
    out = []
    for r in rows:
        cells = []
        for v in r:
            if v is None:
                cells.append("NULL")
            elif isinstance(v, bool):
                cells.append(str(int(v)))
            elif isinstance(v, float):
                cells.append(f"{v:.6f}")
            else:
                cells.append(str(v))
        out.append("|".join(cells))
    return sorted(out)


def run_file(spark, path: str) -> tuple[int, int]:
    """Returns (queries_checked, statements_applied); raises on mismatch."""
    import duckdb

    from myduckdb_spark.sql import sql as engine_sql

    con = duckdb.connect()
    n_q = n_s = 0
    for rec in parse(path):
        if rec.kind == "statement_ok":
            if re.match(r"\s*PRAGMA", rec.sql, re.I):
                continue  # engine pragmas (enable_verification) are no-ops here
            con.sql(rec.sql)
            n_s += 1
        elif rec.kind == "statement_error":
            try:
                con.sql(rec.sql)
                raise AssertionError(f"expected error, statement succeeded: {rec.sql}")
            except AssertionError:
                raise
            except Exception:
                pass
        else:
            # snapshot DuckDB state into Spark temp views
            tables = [r[0] for r in con.sql("SELECT table_name FROM duckdb_tables()").fetchall()]
            for t in tables:
                spark.createDataFrame(con.table(t).df()).createOrReplaceTempView(t)
            got = _canon([tuple(r) for r in engine_sql(spark, rec.sql).collect()])
            want = _canon(con.sql(rec.sql).fetchall())
            assert got == want, f"mismatch for {rec.sql!r}:\n spark={got[:5]}\n duck={want[:5]}"
            n_q += 1
    return n_q, n_s
