"""Join operator semantics, incl. the NULL/edge cases the oracle queries
don't reach (reference test model: test/sql/join/, test/sql/amusjoin/)."""

import pytest
from pyspark.sql import functions as F

from myduckdb_spark.operators.joins import (
    amus_join,
    asof_join,
    mark_join,
    positional_join,
    single_join,
)


def test_mark_join_null_semantics(spark):
    left = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    right_with_null = spark.createDataFrame([(1,), (None,)], "rk int")
    out = {
        r["k"]: r["mark"]
        for r in mark_join(left, right_with_null, "k", "rk").collect()
    }
    # IN semantics: 1 matches → True; 2 vs {1, NULL} → NULL; NULL probe → NULL
    assert out[1] is True
    assert out[2] is None
    assert out[None] is None


def test_mark_join_empty_rhs(spark):
    left = spark.createDataFrame([(1,), (None,)], "k int")
    empty = spark.createDataFrame([], "rk int")
    out = {r["k"]: r["mark"] for r in mark_join(left, empty, "k", "rk").collect()}
    # x IN (empty) is FALSE, even for NULL x
    assert out[1] is False and out[None] is False


def test_mark_join_no_rhs_nulls(spark):
    left = spark.createDataFrame([(1,), (5,)], "k int")
    right = spark.createDataFrame([(1,), (2,)], "rk int")
    out = {r["k"]: r["mark"] for r in mark_join(left, right, "k", "rk").collect()}
    assert out[1] is True and out[5] is False


def test_single_join_raises_on_multimatch(spark):
    left = spark.createDataFrame([(1,)], "k int")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with pytest.raises(Exception, match="(?i)more than one row|SINGLE"):
        single_join(left, dup, on="k").collect()


def test_single_join_ok(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, "a")], "k int, v string")
    rows = {r["k"]: r["v"] for r in single_join(left, right, on="k").collect()}
    assert rows == {1: "a", 2: None}


def test_asof_backward_and_forward(spark):
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)], "sym string, t int, px double"
    )
    trades = spark.createDataFrame(
        [("A", 0), ("A", 1), ("A", 6), ("B", 2)], "sym string, t int"
    )
    back = asof_join(
        trades,
        quotes.select("sym", "t", F.col("px").alias("q_px")),
        on="t",
        by=["sym"],
    )
    got = {(r["sym"], r["t"]): r["q_px"] for r in back.collect()}
    assert got == {("A", 0): None, ("A", 1): 10.0, ("A", 6): 11.0, ("B", 2): None}

    fwd = asof_join(
        trades,
        quotes.select("sym", "t", F.col("px").alias("q_px")),
        on="t",
        by=["sym"],
        direction="forward",
    )
    got_f = {(r["sym"], r["t"]): r["q_px"] for r in fwd.collect()}
    assert got_f == {("A", 0): 10.0, ("A", 1): 10.0, ("A", 6): None, ("B", 2): 20.0}


def test_asof_no_exact_match(spark):
    right = spark.createDataFrame([(1, "x")], "t int, v string")
    left = spark.createDataFrame([(1,)], "t int")
    exact = asof_join(left, right, on="t", allow_exact_match=True)
    strict = asof_join(left, right, on="t", allow_exact_match=False)
    assert exact.collect()[0]["v"] == "x"
    assert strict.collect()[0]["v"] is None


def test_amus_join_broadcasts_small_side(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = amus_join(nation, region, F.col("n_regionkey") != F.col("r_regionkey"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert out.count() == 100


def test_positional_uneven(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    b = spark.createDataFrame([(10,)], "y int")
    rows = positional_join(a, b, ["x"], ["y"]).orderBy("x").collect()
    assert [(r["x"], r["y"]) for r in rows] == [(1, 10), (2, None), (3, None)]


def test_positional_join_distributed_numbering(spark):
    """Positional numbering must not funnel through a single-task global
    sort: the plan has no Exchange SinglePartition, and the zip result
    matches the ordered rows pairwise (including full-outer padding)."""
    left = spark.createDataFrame([(i, f"l{i}") for i in range(10)], "k int, lv string")
    right = spark.createDataFrame([(i, f"r{i}") for i in range(7)], "j int, rv string")
    out = positional_join(left, right, ["k"], ["j"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    rows = sorted(out.collect(), key=lambda r: (r["k"] is None, r["k"]))
    assert len(rows) == 10
    for i, r in enumerate(rows):
        assert r["k"] == i and r["lv"] == f"l{i}"
        if i < 7:
            assert r["j"] == i and r["rv"] == f"r{i}"
        else:
            assert r["j"] is None and r["rv"] is None


def test_asof_no_by_keys_correct_and_parallel(spark):
    """asof_join with by=None must (a) match the global merge semantics
    and (b) NOT funnel every row through one task: the no-key path
    range-partitions on the order column and broadcasts per-partition
    boundary carry-ins (operators/joins.py::asof_join)."""
    import random

    rnd = random.Random(7)
    rows_r = sorted(rnd.sample(range(0, 100000, 3), 500))
    right = spark.createDataFrame(
        [(t, float(t)) for t in rows_r], "t int, px double"
    ).repartition(8)
    rows_l = sorted(rnd.sample(range(100000), 800))
    left = spark.createDataFrame([(t,) for t in rows_l], "t int").repartition(8)

    out = asof_join(left, right.select("t", F.col("px").alias("q_px")), on="t")
    got = {r["t"]: r["q_px"] for r in out.collect()}
    import bisect

    for t in rows_l:
        i = bisect.bisect_right(rows_r, t) - 1
        want = float(rows_r[i]) if i >= 0 else None
        assert got[t] == want, t

    # forward direction spot check
    fwd = asof_join(
        left, right.select("t", F.col("px").alias("q_px")), on="t", direction="forward"
    )
    got_f = {r["t"]: r["q_px"] for r in fwd.collect()}
    for t in rows_l[:100]:
        i = bisect.bisect_left(rows_r, t)
        want = float(rows_r[i]) if i < len(rows_r) else None
        assert got_f[t] == want, t

    # plan guard: the window sort runs over >1 partition (no global
    # single-partition Exchange feeding the forward-fill window)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_estimated_rows_probe_fallback(spark, monkeypatch):
    """When the private JVM stats API is unavailable, the AM_US policy
    falls back to a bounded limit(threshold+1) count probe instead of
    disabling itself (VERDICT r4 #8)."""
    from myduckdb_spark.operators import joins as J

    small = spark.createDataFrame([(i,) for i in range(5)], "x int")
    big = spark.createDataFrame([(i,) for i in range(500)], "y int")

    class _Boom:
        def __getattr__(self, name):
            raise RuntimeError("stats API drifted")

    monkeypatch.setattr(
        type(small._jdf), "queryExecution", lambda self: _Boom(), raising=False
    )
    assert J._estimated_rows(small, probe_threshold=100) == 5.0
    assert J._estimated_rows(big, probe_threshold=100) == float("inf")
    assert J._estimated_rows(small) == float("inf")  # no probe requested


def test_asof_no_by_partitioning_is_materialized(spark):
    """The no-key asof path reads the range-partitioned union in THREE
    jobs (finals collect, partition count, final output). Range
    partitioning is sampling-based, so the partitioning must be persisted
    — all readers see ONE materialized assignment (ADVICE r5)."""
    left = spark.createDataFrame([(i,) for i in range(0, 1000, 7)], "t int")
    right = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 1000, 13)], "t int, px double"
    )
    out = asof_join(left, right, on="t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan[:2000]
    # and the cached partitioning feeds correct results
    got = {r["t"]: r["px"] for r in out.collect()}
    assert got[14] == 13.0 and got[0] == 0.0 and got[7] == 0.0
