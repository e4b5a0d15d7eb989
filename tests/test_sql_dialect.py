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
    assert translate("SELECT j->'k' FROM t") == "SELECT get_json_object(j, '$.k') FROM t"


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
    assert translate("SELECT len([1,2,3]) FROM t") == "SELECT size([1,2,3]) FROM t"
    assert (
        translate("SELECT len(string_split(s, ',')) FROM t")
        == "SELECT size(split(s, ',')) FROM t"
    )


def test_len_nested_commas():
    # balanced-paren arg parsing: commas inside the call must not split
    assert (
        translate("SELECT len(concat(a, b)) FROM t") == "SELECT length(concat(a, b)) FROM t"
    )


def test_identifier_ending_in_len_untouched():
    out = translate("SELECT maxlen(x) FROM t")
    assert out == "SELECT maxlen(x) FROM t"


def test_list_sort_forms():
    assert translate("SELECT list_sort(xs)") == "SELECT array_sort(xs)"
    assert translate("SELECT list_sort(xs, 'DESC')") == "SELECT sort_array(xs, false)"
    assert translate("SELECT list_sort(xs, 'ASC')") == "SELECT sort_array(xs, true)"
    assert translate("SELECT list_reverse_sort(xs)") == "SELECT sort_array(xs, false)"


def test_list_sum():
    assert (
        translate("SELECT list_sum(xs)")
        == "SELECT aggregate(xs, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def test_name_rules_only_on_calls():
    # 'strftime' as part of a literal stays put
    out = translate("SELECT 'use strftime(x) here', strftime(d, '%Y') FROM t")
    assert "'use strftime(x) here'" in out
    assert "date_format(d, '%Y')" in out


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
