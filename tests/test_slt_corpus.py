"""Reference sqllogictest corpus through the engine (tools/slt.py).

Curated files from /root/reference/test/sql/ whose SQL the dialect front
door supports — including the fork's OWN amusjoin tests (which exercise
the AM_US_JOIN operator end-to-end; note their expected-output block has
a known typo, `108 12` vs inserted `(108, 1)` — irrelevant here because
the runner verifies against live DuckDB, not the file's expected text).
"""

import pytest

from tools.slt import run_file

REF = "/root/reference/test/sql"

# One sequential session per GROUP: later files depend on earlier state
# (create → insert → join), exactly like the reference runner.
GROUPS = {
    "amusjoin": [
        f"{REF}/amusjoin/simple_tables_create.test",
        f"{REF}/amusjoin/simple_tables_insert.test",
        f"{REF}/amusjoin/simple_tables_amusjoin.test",
    ],
}


@pytest.mark.parametrize("group", sorted(GROUPS))
def test_slt_group(spark, group):
    import duckdb

    from tools import slt

    # run all files of the group against ONE shared DuckDB state
    con = duckdb.connect()
    total_q = 0
    for path in GROUPS[group]:
        recs = slt.parse(path)
        for rec in recs:
            if rec.kind == "statement_ok":
                if rec.sql.strip().upper().startswith("PRAGMA"):
                    continue
                con.sql(rec.sql)
            elif rec.kind == "statement_error":
                with pytest.raises(Exception):
                    con.sql(rec.sql)
            else:
                tables = [
                    r[0] for r in con.sql("SELECT table_name FROM duckdb_tables()").fetchall()
                ]
                for t in tables:
                    spark.createDataFrame(con.table(t).df()).createOrReplaceTempView(t)
                from myduckdb_spark.sql import sql as engine_sql

                got = slt._canon([tuple(r) for r in engine_sql(spark, rec.sql).collect()])
                want = slt._canon(con.sql(rec.sql).fetchall())
                assert got == want, (path, rec.sql, got[:5], want[:5])
                total_q += 1
    assert total_q >= 1


def test_slt_single_file_runner(spark):
    """run_file() drives a self-contained file end-to-end."""
    n_q, n_s = run_file(spark, f"{REF}/cte/test_cte.test")
    assert n_q >= 5 and n_s >= 2
