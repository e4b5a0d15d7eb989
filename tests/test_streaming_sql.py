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


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState custom stateful operator: after draining the
    stream (files arrive across multiple triggers), the LAST emitted
    snapshot per user equals the batch groupBy totals."""
    import shutil

    from myduckdb_spark.streaming.ops import read_events_stream
    from myduckdb_spark.streaming.stateful import running_user_totals

    d = tmp_path / "events_state"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-0.parquet")

    stream = running_user_totals(read_events_stream(spark, str(d)))
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = (
        spark.sql(
            "SELECT user_id, n_events, total_value FROM ("
            " SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rk"
            " FROM state_out) WHERE rk = 1"
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    from pyspark.sql import functions as F

    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    assert (got["n_events"] == want["n_events"]).all()
