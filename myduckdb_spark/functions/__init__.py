"""Scalar/aggregate function surface (reference: SURVEY.md §2.9 —
src/core_functions/function_list.cpp registers 382 names).

``registry`` maps DuckDB function names onto Spark Column builders;
``compat`` holds oracle-exactness helpers (decimal-cast aggregation so
floating-point results are order-independent and engine-identical).
"""
