"""Driver-checked queries over the managed storage layer (storage.py).

Row-level DML is stateful, so each builder materializes a FRESH managed
table in a temp directory, applies the DML, and returns the final table
state; the oracle is the algebraic SELECT-equivalent of the same DML
sequence over the source data (DELETE = anti-filter, UPDATE = CASE
projection, INSERT = UNION ALL) — DuckDB computing the same final state
declaratively. A hash match therefore proves the copy-on-write
delete/update/insert semantics end-to-end (reference
physical_delete.cpp / physical_update.cpp / physical_insert.cpp).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table
from myduckdb_spark.queries import register
from myduckdb_spark.storage import ManagedTable, SequenceStore


@register(
    "dml_roundtrip",
    oracle="""
    WITH base AS (
        SELECT s_suppkey, s_name, s_nationkey FROM supplier
        UNION ALL
        SELECT 900001, 'Supplier#900001', 7
        UNION ALL
        SELECT 900002, 'Supplier#900002', 12
    )
    SELECT s_suppkey,
           CASE WHEN s_nationkey % 5 = 3 THEN upper(s_name) ELSE s_name END
               AS s_name,
           CASE WHEN s_nationkey % 5 = 3 THEN s_nationkey + 100
                ELSE s_nationkey END AS s_nationkey
    FROM base
    WHERE NOT (s_nationkey % 5 = 0 AND s_suppkey % 2 = 0)
    ORDER BY s_suppkey
    """,
    tags=("storage", "dml"),
)
def dml_roundtrip(spark, sf_dir):
    """CREATE TABLE AS → INSERT → DELETE → UPDATE on a copy-on-write
    managed table; returns the final table contents."""
    src = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    root = tempfile.mkdtemp(prefix="mdbs_q_dml_")
    t = ManagedTable.create(spark, root, src.repartitionByRange(4, "s_suppkey"))
    t.insert(
        spark.createDataFrame(
            [(900001, "Supplier#900001", 7), (900002, "Supplier#900002", 12)],
            src.schema,
        )
    )
    t.delete("s_nationkey % 5 = 0 AND s_suppkey % 2 = 0")
    t.update(
        {"s_name": "upper(s_name)", "s_nationkey": "s_nationkey + 100"},
        "s_nationkey % 5 = 3",
    )
    return t.scan().orderBy("s_suppkey")


@register(
    "upsert_on_conflict",
    oracle="""
    WITH incoming(n_nationkey, n_name, n_regionkey) AS (
        SELECT n_nationkey, 'DUP-' || n_name, n_regionkey
        FROM nation WHERE n_nationkey % 3 = 0
        UNION ALL
        SELECT n_nationkey + 100, 'NEW-' || n_name, n_regionkey
        FROM nation WHERE n_nationkey % 4 = 0
    )
    SELECT b.n_nationkey,
           CASE WHEN i.n_nationkey IS NOT NULL AND b.n_regionkey < 3
                THEN i.n_name ELSE b.n_name END AS n_name,
           CASE WHEN i.n_nationkey IS NOT NULL AND b.n_regionkey < 3
                THEN b.n_regionkey + 10 ELSE b.n_regionkey END AS n_regionkey
    FROM nation b LEFT JOIN incoming i USING (n_nationkey)
    UNION ALL
    SELECT i.n_nationkey, i.n_name, i.n_regionkey
    FROM incoming i ANTI JOIN nation b USING (n_nationkey)
    ORDER BY n_nationkey
    """,
    tags=("storage", "dml", "upsert"),
)
def upsert_on_conflict(spark, sf_dir):
    """INSERT ... ON CONFLICT (key) DO UPDATE (reference
    physical_insert.cpp OnConflictHandling): conflicting keys update the
    stored row from `excluded` under a WHERE guard; fresh keys append.
    Oracle = the algebraic left-join/anti-join equivalent in DuckDB."""
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    root = tempfile.mkdtemp(prefix="mdbs_q_upsert_")
    t = ManagedTable.create(spark, root, src.repartitionByRange(4, "n_nationkey"))
    t.set_key(["n_nationkey"])
    incoming = src.filter("n_nationkey % 3 = 0").select(
        "n_nationkey", F.concat(F.lit("DUP-"), "n_name").alias("n_name"), "n_regionkey"
    ).union(
        src.filter("n_nationkey % 4 = 0").select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"),
            F.concat(F.lit("NEW-"), "n_name").alias("n_name"),
            "n_regionkey",
        )
    )
    t.upsert(
        incoming,
        ["n_nationkey"],
        "update",
        {"n_name": "__exc_n_name", "n_regionkey": "n_regionkey + 10"},
        where="n_regionkey < 3",
    )
    return t.scan().orderBy("n_nationkey")


@register(
    "seq_bulk_ids",
    oracle="""
    SELECT n_nationkey,
           1000 + (ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1) * 3 AS row_id
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("storage", "sequence"),
)
def seq_bulk_ids(spark, sf_dir):
    """Sequence bulk allocation (CREATE SEQUENCE + per-row ids): one
    counter reservation, distributed numbering — the cluster-scale form
    of nextval-per-row."""
    store = SequenceStore(tempfile.mktemp(suffix=".json", prefix="mdbs_q_seq_"))
    seq = store.create("ids", start=1000, increment=3)
    df = load_table(spark, sf_dir, "nation")
    return (
        seq.attach_column(df, "row_id", ["n_nationkey"])
        .select("n_nationkey", F.col("row_id").cast("long"))
        .orderBy("n_nationkey")
    )
