"""Catalog-metadata registry (myduckdb_spark/infoschema.py): constraint
naming parity vs live DuckDB, schema oid stability, mirror round-trip."""

import duckdb
import pytest

from myduckdb_spark import infoschema as ischema


@pytest.fixture(autouse=True)
def _fresh_registry():
    ischema.reset()
    yield
    ischema.reset()


def test_constraint_names_match_live_duckdb():
    con = duckdb.connect()
    con.execute("create table integers(i int primary key, check (i < 10))")
    con.execute(
        "create table test(i varchar unique, k varchar,"
        " check(len(i || k) < 10))"
    )
    con.execute(
        "create table fk_integers(j int,"
        " foreign key (j) references integers(i))"
    )
    con.execute("create table multi (a int, b int, primary key(a, b))")
    want = {
        r[0]
        for r in con.execute(
            "SELECT constraint_name FROM information_schema.table_constraints"
        ).fetchall()
    }
    ischema.mirror_duckdb(con)
    got = {r[2] for r in ischema.table_constraints_rows()}
    assert got == want


def test_referential_resolves_unique_constraint():
    con = duckdb.connect()
    con.execute("create table dept (dept_id int primary key)")
    con.execute("create table emp (dept_id int references dept(dept_id))")
    want = con.execute(
        "SELECT constraint_name, unique_constraint_name "
        "FROM information_schema.referential_constraints"
    ).fetchall()
    ischema.mirror_duckdb(con)
    got = [(r[2], r[5]) for r in ischema.referential_constraints_rows()]
    assert got == [tuple(w) for w in want]


def test_schema_oid_stable_across_later_creates():
    first = ischema.create_schema("myschema")
    ischema.create_schema("bla")
    ischema.create_schema("test33")
    assert ischema.SCHEMAS["myschema"] == first
    assert len({*ischema.SCHEMAS.values()}) == 3  # unique oids


def test_drop_schema_removes_members_and_constraints():
    ischema.create_schema("s1")
    ischema.register_table("s1__t", "memory", "s1", "t", "BASE TABLE")
    ischema.register_columns(
        "s1__t", [ischema.column_row("i", 1, "INTEGER", nullable=False)]
    )
    ischema.CONSTRAINTS.append({
        "catalog": "memory", "schema": "s1", "table": "t",
        "ctype": "PRIMARY KEY", "text": "PRIMARY KEY(i)", "columns": ["i"],
    })
    dropped = ischema.drop_schema("s1")
    assert dropped == ["s1__t"]
    assert not ischema.TABLE_META and not ischema.CONSTRAINTS
    assert "s1" not in ischema.SCHEMAS


def test_column_row_declared_types():
    r = ischema.column_row("h", 1, "HUGEINT")
    assert (r["dtype"], r["prec"], r["scale"]) == ("HUGEINT", 128, 0)
    r = ischema.column_row("d", 2, "DECIMAL(16, 4)")
    assert (r["dtype"], r["prec"], r["scale"]) == ("DECIMAL(16,4)", 16, 4)
    r = ischema.column_row("f", 3, "FLOAT", nullable=False)
    assert (r["prec"], r["scale"], r["nullable"]) == (24, 0, False)
    # engine DDL spells Spark names; the registry records duck spellings
    assert ischema.column_row("i", 4, "INT")["dtype"] == "INTEGER"
    assert ischema.column_row("s", 5, "STRING")["dtype"] == "VARCHAR"
