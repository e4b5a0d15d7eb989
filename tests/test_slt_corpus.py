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
    "aggregate/aggregates/test_aggr_string.test": 8,
    "aggregate/aggregates/test_aggregate_types.test": 13,
    "aggregate/aggregates/test_bit_and.test": 3,
    "aggregate/aggregates/test_bit_or.test": 3,
    "aggregate/aggregates/test_bit_xor.test": 3,
    "aggregate/aggregates/test_bool.test": 10,
    "aggregate/aggregates/test_corr.test": 5,
    "aggregate/aggregates/test_covar.test": 6,
    "aggregate/aggregates/test_empty_aggregate.test": 3,
    "aggregate/aggregates/test_first_noninlined.test": 6,
    "aggregate/aggregates/test_group_on_expression.test": 9,
    "aggregate/aggregates/test_last_noninlined.test": 6,
    "aggregate/aggregates/test_mode.test": 18,
    "aggregate/aggregates/test_perfect_ht.test": 4,
    "aggregate/aggregates/test_scalar_aggr.test": 6,
    "aggregate/aggregates/test_simple_filter.test": 6,
    "aggregate/aggregates/test_stddev.test": 21,
    "aggregate/distinct/grouped/combined_with_grouping.test": 5,
    "aggregate/distinct/grouped/multiple_grouping_sets.test": 15,
    "aggregate/distinct/test_distinct.test": 7,
    "aggregate/distinct/ungrouped/test_distinct_ungrouped.test": 16,
    "aggregate/group/group_by_all.test": 12,
    "aggregate/group/group_by_all_having.test": 3,
    "aggregate/group/group_by_all_order.test": 4,
    "aggregate/group/group_by_limits.test": 4,
    "aggregate/group/test_group_by_nested.test": 28,
    "aggregate/grouping_sets/cube.test": 6,
    "aggregate/grouping_sets/grouping.test": 7,
    "aggregate/grouping_sets/grouping_sets.test": 15,
    "aggregate/grouping_sets/grouping_sets_filter.test": 4,
    "aggregate/grouping_sets/rollup.test": 6,
    "generated_columns/virtual/cascading_delete.test": 5,
    "generated_columns/virtual/group_by.test": 8,
    "generated_columns/virtual/insert.test": 3,
    "generated_columns/virtual/referencing_gencols.test": 3,
    "generated_columns/virtual/select.test": 3,
    "generated_columns/virtual/select_alias.test": 36,
    "generated_columns/virtual/update.test": 4,
    "json/table/read_json_dates.test": 13,
    "table_function/range_function_different_iterators.test": 8,
    "table_function/test_range_function.test": 19,
    "binder/string_literal_binding.test": 11,
    "binder/test_alias.test": 3,
    "binder/test_having_alias.test": 6,
    "binder/test_implicit_struct_pack.test": 3,
    "binder/test_null_type_propagation.test": 22,
    "binder/test_select_clause_alias.test": 3,
    "cast/boolean_autocast.test": 16,
    "cast/decimal_integer_cast.test": 8,
    "cast/double_float_cast.test": 4,
    "cast/string_to_integer_decimal_cast.test": 4,
    "cast/string_to_integer_exponent_cast.test": 7,
    "cast/test_boolean_cast.test": 32,
    "cast/test_exponent_in_cast.test": 4,
    "cast/test_try_cast.test": 5,
    "collate/test_collate_and_grouping_sets.test": 6,
    "collate/test_default_collations.test": 4,
    "collate/test_icu_collate.test": 8,
    "cte/materialized/dml_materialized_cte.test": 5,
    "cte/recursive_hang_2745.test": 4,
    "cte/test_cte_in_cte.test": 7,
    "cte/test_recursive_cte_union.test": 5,
    "filter/filter_cache.test": 3,
    "filter/test_obsolete_filters.test": 51,
    "filter/test_struct_pushdown.test": 10,
    "filter/test_transitive_filters.test": 44,
    "filter/test_zonemap_segment.test": 16,
    "join/asof/test_asof_join_doubles.test": 6,
    "join/empty_joins.test": 20,
    "join/full_outer/full_outer_join_union.test": 5,
    "join/iejoin/iejoin_issue_6861.test": 4,
    "join/iejoin/iejoin_issue_7278.test": 4,
    "join/iejoin/iejoin_projection_maps.test": 3,
    "join/iejoin/predicate_expressions.test": 3,
    "join/iejoin/test_iejoin.test": 3,
    "join/iejoin/test_iejoin_east_west.test": 4,
    "join/inner/equality_join_limits.test": 4,
    "join/inner/join_cache.test": 4,
    "join/inner/test_eq_ineq_join.test": 13,
    "join/inner/test_lt_join.test": 4,
    "join/inner/test_range_join.test": 6,
    "join/inner/test_unequal_join.test": 5,
    "join/inner/test_using_join.test": 8,
    "join/inner/test_varchar_join.test": 5,
    "join/left_outer/left_join_issue_1172.test": 11,
    "join/left_outer/left_join_issue_6341.test": 3,
    "join/left_outer/test_left_join_on_true.test": 3,
    "join/pushdown/pushdown_join_subquery.test": 6,
    "join/pushdown/pushdown_join_types.test": 8,
    "join/right_outer/test_right_outer.test": 18,
    "join/semianti/10406-anti-on-ints-strings.test": 4,
    "join/semianti/plan_blockwise_NL_join_with_mutliple_conditions.test": 6,
    "join/test_complex_join_expr.test": 4,
    "join/test_complex_join_structs.test": 15,
    "join/test_complex_range_join.test": 14,
    "join/test_nested_keys.test": 26,
    "optimizer/expression/test_conjunction_optimization.test": 15,
    "optimizer/expression/test_cse.test": 9,
    "optimizer/expression/test_equal_or_null_optimization.test": 8,
    "optimizer/expression/test_nop_arithmetic.test": 11,
    "optimizer/plan/test_filter_pushdown.test": 21,
    "optimizer/plan/test_filter_pushdown_large.test": 27,
    "optimizer/plan/test_table_filter_pushdown.test": 5,
    "optimizer/plan/test_unused_column_after_join.test": 6,
    "optimizer/test_in_rewrite_rule.test": 3,
    "order/order_by_all.test": 3,
    "order/test_limit.test": 4,
    "order/test_order_by_exceptions.test": 4,
    "order/test_order_range_mapping.test": 10,
    "overflow/bigint_overflow.test": 15,
    "overflow/table_overflow.test": 13,
    "overflow/test_overflow.test": 3,
    "parser/from_first.test": 8,
    "parser/test_operator_precedence.test": 13,
    "pivot/pivot_bigquery.test": 6,
    "pivot/pivot_databricks.test": 5,
    "projection/select_star_exclude.test": 10,
    "projection/select_struct_star.test": 3,
    "projection/test_complex_expressions.test": 30,
    "projection/test_row_id.test": 4,
    "projection/test_row_id_expression.test": 3,
    "projection/test_scalar_projection.test": 8,
    "projection/test_simple_projection.test": 9,
    "projection/test_table_star.test": 7,
    "projection/test_value_list.test": 9,
    "returning/no_crash_when_no_returning_columns.test": 3,
    "returning/returning_update.test": 3,
    "setops/setops_pushdown.test": 9,
    "setops/test_full_outer_join_union.test": 12,
    "setops/test_pg_union.test": 44,
    "setops/test_setops.test": 16,
    "setops/union_aggregate.test": 7,
    "setops/union_all_projection_pushdown.test": 14,
    "setops/union_pipeline.test": 3,
    "subquery/any_all/test_scalar_any_all.test": 8,
    "subquery/any_all/test_scalar_in.test": 11,
    "subquery/any_all/test_simple_not_in.test": 3,
    "subquery/any_all/test_uncorrelated_any_subquery.test": 15,
    "subquery/exists/test_scalar_exists.test": 4,
    "subquery/exists/test_uncorrelated_exists_subquery.test": 15,
    "subquery/lateral/lateral_arrays.test": 6,
    "subquery/lateral/lateral_join_nested.test": 4,
    "subquery/lateral/lateral_left_join.test": 5,
    "subquery/lateral/pg_lateral.test": 15,
    "subquery/scalar/test_correlated_subquery_cte.test": 14,
    "subquery/scalar/test_grouped_correlated_subquery.test": 4,
    "subquery/scalar/test_issue_4216.test": 3,
    "subquery/scalar/test_many_correlated_columns.test": 4,
    "subquery/scalar/test_scalar_subquery.test": 17,
    "subquery/scalar/test_scalar_subquery_cte.test": 17,
    "subquery/scalar/test_subquery_any_join.test": 5,
    "subquery/scalar/test_uncorrelated_varchar_subquery.test": 8,
    "subquery/scalar/test_unnest_subquery.test": 12,
    "subquery/scalar/test_update_subquery.test": 5,
    "subquery/scalar/test_varchar_correlated_subquery.test": 11,
    "subquery/table/test_table_subquery.test": 6,
    "subquery/table/test_unnamed_subquery.test": 5,
    "topn/test_top_n.test": 5,
    "topn/test_top_n_nulls_first.test": 4,
    "topn/test_top_n_nulls_small.test": 26,
    "topn/test_top_n_structs.test": 8,
    "topn/tpcds_q14_topn.test": 4,
    "window/test_basic_window.test": 10,
    "window/test_naive_aggregation.test": 9,
    "window/test_no_default_window_spec.test": 3,
    "window/test_ntile.test": 4,
    "window/test_streaming_window.test": 6,
    "window/test_window_bool.test": 6,
    "window/test_window_filter.test": 4,
    "window/test_window_fusion.test": 10,
    "window/test_window_wisconsin.test": 17,
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
