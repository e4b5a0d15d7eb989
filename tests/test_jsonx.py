"""json_structure / json_type / json_transform parity vs live DuckDB
(reference extension/json/json_functions/{json_structure,json_type,
json_transform}.cpp)."""

import json
import re

import duckdb
import pytest

from myduckdb_spark.functions.jsonx import (
    json_structure_py,
    json_type_py,
    structure_to_ddl,
)
from myduckdb_spark.sql import sql as run_sql, translate

DOCS = [
    '{"a": 1, "b": "x", "c": [1.5, 2.5]}',
    '[null, 1]',
    '[1, -5]',
    '[1.5, 1]',
    '[true, false]',
    '[null]',
    '[]',
    '[[1],[2.5]]',
    '[[1],["x"]]',
    '[{"a":1},{"a":"x"}]',
    '[{"a":1},{"a":2.5}]',
    '[{"a":[1]},{"a":[2.5]}]',
    '["x", null]',
    '[1, true]',
    '{"a": 9223372036854775807}',
    '"x"',
    '3.0',
    '[{"a":1},5]',
    '[[1], 1]',
    '[{"a":null},{"a":1}]',
    '[{"a":1},{"b":2}]',
    'null',
    '-5',
    'true',
    '{"deep": {"x": [{"y": [1, 2.5]}]}}',
]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_json_structure_matches_duckdb(duck):
    for doc in DOCS:
        want = duck.sql(
            "SELECT json_structure(?::JSON)", params=[doc]
        ).fetchone()[0]
        assert json_structure_py(doc) == want, doc


def test_json_type_matches_duckdb(duck):
    for doc in DOCS:
        want = duck.sql("SELECT json_type(?::JSON)", params=[doc]).fetchone()[0]
        assert json_type_py(doc) == want, doc


def test_json_type_paths(duck):
    doc = '{"a": 1, "b": [2.5, {"c": "x"}], "n": null}'
    for path in ["$.a", "$.b", "$.b[0]", "$.b[1].c", "$.missing", "/a", "/b/1/c", "a"]:
        want = duck.sql(
            "SELECT json_type(?::JSON, ?)", params=[doc, path]
        ).fetchone()[0]
        assert json_type_py(doc, path) == want, path


def test_structure_to_ddl():
    ddl, cont = structure_to_ddl('{"a": "INTEGER", "b": "VARCHAR", "c": ["DOUBLE"]}')
    assert ddl == "STRUCT<`a`: INT, `b`: STRING, `c`: ARRAY<DOUBLE>>" and cont
    ddl, cont = structure_to_ddl('["BIGINT"]')
    assert ddl == "ARRAY<BIGINT>" and cont
    ddl, cont = structure_to_ddl('"DATE"')
    assert ddl == "DATE" and not cont
    with pytest.raises(ValueError):
        structure_to_ddl('{"a": "NOT_A_TYPE"}')


def test_translate_json_transform():
    # structure docs compile to a specialized transform UDF (r8: from_json
    # can't express DuckDB's element-wise lenient casts); struct roots get
    # a NULL/'null' guard because a pandas frame can't carry NULL structs
    out = translate("""SELECT json_transform(j, '{"a": "INTEGER"}') FROM t""")
    assert re.search(r"__jt_[0-9a-f]{10}\(j\)", out)
    assert "CAST(NULL AS STRUCT<`a`: INT>)" in out
    out = translate("""SELECT json_transform(j, '"DATE"') FROM t""")
    assert re.search(r"__jt_[0-9a-f]{10}\(j\)", out)
    # DuckDB's from_json alias with a structure doc converts; DDL passes
    out = translate("""SELECT from_json(j, '{"a": "INTEGER"}') FROM t""")
    assert re.search(r"__jt_[0-9a-f]{10}\(j\)", out)
    out = translate("SELECT from_json(j, 'a INT') FROM t")
    assert "from_json(j, 'a INT')" in out
    # 1-arg json_type gains the whole-document path; json_typeof aliases;
    # the input is serialized to STRING (VARIANT columns carry JSON)
    out = translate("SELECT json_type(j) FROM t")
    assert "json_type(CAST(j AS STRING), '$')" in out
    out = translate("SELECT json_typeof(j, '$.a') FROM t")
    assert "json_type(CAST(j AS STRING), '$.a')" in out


def test_sql_end_to_end(spark, duck):
    rows = run_sql(
        spark,
        """SELECT json_transform('{"a": 7, "t": "2021-01-01 05:06:07"}',
               '{"a": "INTEGER", "t": "TIMESTAMP"}') AS s""",
    ).collect()
    assert rows[0].s.a == 7 and rows[0].s.t.year == 2021
    docs = [d for d in DOCS if d not in ("null",)]
    got = {
        r.d: (r.s, r.t)
        for r in run_sql(
            spark,
            "SELECT d, json_structure(d) AS s, json_type(d) AS t "
            "FROM VALUES "
            + ", ".join("('" + d.replace("'", "''") + "')" for d in docs)
            + " AS v(d)",
        ).collect()
    }
    for doc in docs:
        want_s = duck.sql("SELECT json_structure(?::JSON)", params=[doc]).fetchone()[0]
        want_t = duck.sql("SELECT json_type(?::JSON)", params=[doc]).fetchone()[0]
        assert got[doc] == (want_s, want_t), doc


def test_transform_lenient_null_on_bad_cast(spark, duck):
    q = """SELECT json_transform('{"a": "bad"}', '{"a": "INTEGER"}') AS s"""
    assert run_sql(spark, q).collect()[0].s.a is None
    assert duck.sql(q).fetchone()[0] == {"a": None}


# ---------------------------------------------------------------- r8: the
# python transform engine itself (compile_transform) — pure-python checks
# against live DuckDB for the lenient-cast lattice


def _jt(doc, structure, strict=False):
    from myduckdb_spark.functions.jsonx import _loads, compile_transform

    fn = compile_transform(json.loads(structure), strict)
    return fn(_loads(doc))


@pytest.mark.parametrize("doc,structure", [
    ("2.5", '"INTEGER"'),        # JSON number: round-half-even -> 2
    ('"2.5"', '"INTEGER"'),      # string: VARCHAR cast, half away -> 3
    ("true", '"DECIMAL(3,1)"'),
    ("-42", '"UINTEGER"'),       # unsigned guard -> NULL
    ("42", '"DECIMAL(2,1)"'),    # precision overflow -> NULL
    ("128", '"TINYINT"'),
    ("null", '"VARCHAR"'),
    ('"abc"', '"BOOLEAN"'),
    ("42.5", '"BOOLEAN"'),
    ('[{}, [42]]', '[["BIGINT"]]'),   # per-element NULL on mismatch
    ('[1,"a",3]', '["INTEGER"]'),
    ('{"a":2.5}', '{"a":"INTEGER"}'),
    ('[1,2]', '{"a":"INTEGER"}'),     # non-object -> all-NULL fields
    ('"42"', '"UUID"'),
])
def test_transform_matches_duckdb(duck, doc, structure):
    want = duck.sql(
        f"SELECT json_transform('{doc}', '{structure}')"
    ).fetchone()[0]
    got = _jt(doc, structure)
    import uuid
    from decimal import Decimal

    if isinstance(want, uuid.UUID):
        want = str(want)
    if isinstance(got, Decimal) and isinstance(want, (int, float, Decimal)):
        got, want = float(got), float(want)
    if isinstance(got, dict) or isinstance(want, dict):
        assert got == want, (doc, structure)
    else:
        assert got == want, (doc, structure)


def test_transform_strict_raises():
    from myduckdb_spark.functions.jsonx import _TransformError

    with pytest.raises(_TransformError):
        _jt('"abc"', '"INTEGER"', strict=True)
    # JSON null is legitimate even in strict mode
    assert _jt("null", '"INTEGER"', strict=True) is None


def test_extract_wildcards_match_duckdb(duck):
    cases = [
        ('{"duck":42, "goose":43}', "$.*"),
        ('[{"duck":42},{"duck":43}]', "$[*].duck"),
        ('[{"duck":null},{"duck":42},{"duck":null},{}]', "$[*].*"),
        ('{"duck":[42,43]}', "$.*[-1]"),
    ]
    from myduckdb_spark.functions.jsonx import json_extract_multi_py

    for doc, path in cases:
        want = duck.sql(
            f"SELECT json_extract('{doc}', '{path}')"
        ).fetchone()[0]
        got = json_extract_multi_py(doc, path)
        assert got == want, (doc, path)


def test_extract_end_indexes(duck):
    from myduckdb_spark.functions.jsonx import json_extract_py

    for path, want in [("$[#-1]", "3"), ("$[-1]", "3"), ("$[#]", None),
                       ("$[1]", "2")]:
        assert json_extract_py("[1,2,3]", path) == want, path
