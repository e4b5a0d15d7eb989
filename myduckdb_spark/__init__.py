"""myduckdb_spark — a PySpark-native analytical engine.

From-scratch rebuild of the capability surface of the reference
``akashmaji946/myduckdb`` (a DuckDB fork; see SURVEY.md) as an idiomatic
Spark layer: Catalyst/Tungsten replace the reference's binder/optimizer/
vectorized executor, and this package contributes

* a SparkSession factory tuned for analytics (``session``),
* parquet/csv/json source & sink helpers (``sources``),
* a DuckDB-style scalar/aggregate function registry mapped onto
  ``pyspark.sql.functions`` (``functions``),
* the join family incl. as-of / mark / single / positional joins and the
  fork's two signature behaviors — the AM_US small-input join policy
  (broadcast hints) and the GroupJoin aggregate-through-join rewrite
  (``operators``),
* large-scale training-data pipeline operators: dedup, similarity search,
  text analysis, multimodal column plumbing (``pipeline``),
* structured-streaming variants of the core operators (``streaming``).
"""

from myduckdb_spark.session import get_spark
from myduckdb_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "load_table", "register_views", "TABLES"]
__version__ = "0.1.0"
