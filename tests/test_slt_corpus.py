"""Reference sqllogictest corpus through the engine (tools/slt.py).

Curated files from /root/reference/test/sql/ (the reference's primary test
asset — 2,535 .test files, SURVEY §5). Every ``query`` block a file
contains runs through BOTH the SQL front door and live DuckDB; a value
mismatch fails the test. Statements/queries the harness can't execute
(fork-file bugs, dialect gaps like Spark's ANSI div-by-zero or
non-null-aware IN-subquery, DuckDB version drift) are recorded as skips —
each file asserts a FLOOR of value-checked queries so coverage can't
silently erode.

The amusjoin group runs its three files against one shared DuckDB state
(create → insert → join), exactly like the reference runner; note their
create file INSERTs into a table ``a`` it never creates (a fork-author
bug — the reference runner itself would fail there), which the runner
records as a skipped statement.
"""

import duckdb
import pytest

from tools.slt import run_file

REF = "/root/reference/test/sql"

# file → minimum value-checked queries (recorded at curation time; a drop
# below the floor means a dialect/runner regression, not corpus noise)
CORPUS = {
    "aggregate/having/test_scalar_having.test": 12,
    "aggregate/aggregates/test_avg.test": 6,
    "aggregate/aggregates/test_sum.test": 7,
    "aggregate/distinct/test_distinct_on.test": 20,
    "aggregate/distinct/distinct_on_nulls.test": 8,
    "aggregate/distinct/test_distinct_order_by.test": 5,
    "function/string/test_ascii.test": 12,
    "join/inner/test_join.test": 11,
    "types/date/date_implicit_cast.test": 1,
    "types/timestamp/test_timestamp.test": 11,
    "aggregate/having/test_having.test": 10,
    "aggregate/group/test_group_by.test": 21,
    "aggregate/group/test_group_by_alias.test": 8,
    "cte/test_cte.test": 13,
    "cte/test_recursive_cte_union_all.test": 7,
    "cte/test_recursive_cte_tutorial.test": 4,
    "conjunction/or_between.test": 1,
    "conjunction/or_comparison.test": 1,
    "filter/test_constant_comparisons.test": 11,
    "join/cross_product/test_cross_product.test": 3,
    "join/semianti/antijoin.test": 10,
    "join/semianti/semijoin.test": 11,
    "join/test_nested_inequality.test": 5,
    "limit/test_preserve_insertion_order.test": 6,
    "order/test_nulls_first.test": 13,
    "order/test_order_by.test": 24,
    "setops/test_nested_except.test": 1,
    "setops/union_limit.test": 1,
    "setops/value_union.test": 8,
    "setops/union_shared_scan.test": 1,
    "setops/test_union_binding.test": 21,
    "setops/test_union_type_cast.test": 6,
    "subquery/test_neumann.test": 3,
    "subquery/any_all/test_any_all.test": 12,
    "subquery/any_all/test_uncorrelated_all_subquery.test": 31,
    "subquery/any_all/test_correlated_any_all.test": 20,
    "subquery/scalar/test_window_function_subquery.test": 5,
    "subquery/scalar/test_uncorrelated_scalar_subquery.test": 14,
    "subquery/scalar/test_count_star_subquery.test": 7,
    "join/left_outer/test_left_outer.test": 20,
    "join/natural/natural_join.test": 10,
    "join/full_outer/test_full_outer_join.test": 3,
    "aggregate/group/test_group_by_multi_column.test": 1,
    "aggregate/group/test_group_by_large_string.test": 1,
    "subquery/exists/test_correlated_exists.test": 9,
    "subquery/scalar/test_complex_correlated_subquery.test": 8,
    "types/null/test_null.test": 8,
    "window/test_window_exclude.test": 12,
    "window/test_window_binding_ctes.test": 5,
    "window/test_window_dbplyr.test": 3,
    "window/test_window_clause.test": 1,
    "types/null/test_null_aggr.test": 5,
    "function/date/date_part_stats.test": 13,
    "types/decimal/cast_from_decimal.test": 6,
    "types/list/list_comparison.test": 30,
    "types/list/list_distinct.test": 10,
    "types/null/test_boolean_null.test": 3,
}


@pytest.mark.parametrize("relpath", sorted(CORPUS))
def test_slt_file(spark, relpath):
    res = run_file(spark, f"{REF}/{relpath}")  # raises on value mismatch
    assert res.queries >= CORPUS[relpath], (
        f"checked {res.queries} < floor {CORPUS[relpath]}; "
        f"skips={res.skipped_queries[:3]}"
    )


def test_slt_group_amusjoin(spark):
    """Three files, one shared DuckDB state — exercises AM_US join SQL."""
    con = duckdb.connect()
    total_q = 0
    for name in (
        "simple_tables_create.test",
        "simple_tables_insert.test",
        "simple_tables_amusjoin.test",
    ):
        res = run_file(spark, f"{REF}/amusjoin/{name}", con=con)
        total_q += res.queries
    # the corpus holds exactly one intact query block across the three
    # files (the join itself); the create file's probe SELECT targets the
    # never-created table `a`
    assert total_q >= 1


def test_slt_single_file_runner(spark):
    """run_file() drives a self-contained file end-to-end, including the
    loop/require/mode directives used throughout the corpus."""
    n_q, n_s = run_file(spark, f"{REF}/cte/test_cte.test")
    assert n_q >= 5 and n_s >= 2
