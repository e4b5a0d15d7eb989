"""Structured-Streaming smoke + SQL front door + Relation API."""

import pytest
from pyspark.sql import functions as F

from myduckdb_spark.relation import Relation
from myduckdb_spark.sql import sql, translate
from myduckdb_spark.streaming.ops import (
    read_events_stream,
    run_to_memory,
    sessionize,
    windowed_counts,
)


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    # copy the events parquet into a dir usable as a file-source
    import shutil

    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "stream"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    stream = read_events_stream(spark, str(d))
    agg = windowed_counts(stream, window="6 hours")
    run_to_memory(agg, "win_out")
    got = spark.sql("SELECT sum(n) AS n FROM win_out").collect()[0]["n"]
    batch = spark.read.parquet(src).count()
    assert got == batch  # every event lands in exactly one tumbling window


def test_streaming_sessionize_batch_equivalence(spark, sf_dir, tmp_path):
    import shutil

    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "stream2"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    stream = sessionize(read_events_stream(spark, str(d)), gap="30 minutes")
    run_to_memory(stream, "sess_out")
    n_stream = spark.sql("SELECT count(*) AS c FROM sess_out").collect()[0]["c"]
    assert n_stream > 0


def test_sql_translate():
    assert translate("SELECT j->>'k' FROM t") == "SELECT get_json_object(j, '$.k') FROM t"
    assert "transform(" in translate("SELECT list_transform(xs, x -> x+1) FROM t")
    assert "TABLESAMPLE (10 PERCENT)" in translate("SELECT * FROM t USING SAMPLE 10%")


def test_sql_front_door(spark, sf_dir):
    out = sql(
        spark,
        """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        sf_dir=sf_dir,
    )
    assert out.count() == 3


def test_relation_api(spark, sf_dir):
    orders = Relation.table(spark, sf_dir, "orders")
    li = Relation.table(spark, sf_dir, "lineitem")
    out = (
        orders.group_join(
            li,
            keys=[("o_orderkey", "l_orderkey")],
            aggs=[F.count(F.lit(1)).alias("n")],
        )
        .filter(F.col("n") > 2)
        .project("o_orderkey", "n")
        .order(F.col("o_orderkey"))
        .limit(5)
    )
    rows = out.collect()
    assert 0 < len(rows) <= 5 and all(r["n"] > 2 for r in rows)


def test_relation_write_roundtrip(spark, sf_dir, tmp_path):
    r = Relation.table(spark, sf_dir, "region")
    p = str(tmp_path / "region_out")
    r.write_parquet(p)
    assert spark.read.parquet(p).count() == r.count()
