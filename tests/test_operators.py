"""Operator semantics: group-join rewrite, samples, top-k, window
EXCLUDE, recursive CTE distinct mode, pivots/unnest."""

from pyspark.sql import functions as F

from myduckdb_spark.operators.groupjoin import group_join, is_group_join_candidate
from myduckdb_spark.operators.pivots import unnest_multi, unpivot
from myduckdb_spark.operators.recursive import recursive_cte
from myduckdb_spark.operators.sample import (
    bernoulli_sample,
    reservoir_sample,
    system_sample,
)
from myduckdb_spark.operators.topk import limit_percent, top_k_per_group
from myduckdb_spark.operators.window_ex import sum_exclude


def test_group_join_equals_agg_after_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fused = group_join(
        orders,
        li,
        keys=[("o_orderkey", "l_orderkey")],
        aggs=[F.count(F.lit(1)).alias("n")],
    ).select("o_orderkey", "n")
    naive = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert fused.subtract(naive).isEmpty() and naive.subtract(fused).isEmpty()


def test_group_join_candidate_predicate():
    assert is_group_join_candidate(["a"], ["a", "b"])
    assert not is_group_join_candidate(["a", "c"], ["a", "b"])


def test_group_join_build_reduced_before_join(spark, sf_dir):
    """The fused plan must aggregate BELOW the join (the whole point)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    fused = group_join(
        orders, li, keys=[("o_orderkey", "l_orderkey")],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    plan = fused._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join")
    agg_pos = plan.rfind("Aggregate")
    assert join_pos != -1 and agg_pos != -1 and agg_pos > join_pos


def test_samples(spark):
    df = spark.range(10_000)
    n = bernoulli_sample(df, 0.1, seed=7).count()
    assert 700 < n < 1300
    assert reservoir_sample(df, 50, seed=7).count() == 50
    frac = system_sample(df.repartition(32), 0.5, seed=7).count() / 10_000
    assert 0.15 < frac < 0.85  # block-granular: coarse by design


def test_limit_percent(spark):
    df = spark.range(200)
    assert limit_percent(df, [F.col("id")], 10).count() == 20


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", i) for i in range(3)], "g string, v int"
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], 2)
    got = sorted((r["g"], r["v"]) for r in out.collect())
    assert got == [("a", 8), ("a", 9), ("b", 1), ("b", 2)]


def test_window_exclude_modes(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 20.0), ("g", 2, 30.0), ("g", 3, 40.0)],
        "g string, o int, v double",
    )
    for mode, expected in {
        "current row": {10.0: 90.0, 20.0: 80.0, 30.0: 70.0, 40.0: 60.0},
        "group": {10.0: 90.0, 20.0: 50.0, 30.0: 50.0, 40.0: 60.0},
        "ties": {10.0: 100.0, 20.0: 70.0, 30.0: 80.0, 40.0: 100.0},
        "no others": {10.0: 100.0, 20.0: 100.0, 30.0: 100.0, 40.0: 100.0},
    }.items():
        out = sum_exclude(
            df, F.col("v"), ["g"], [F.col("o")], exclude=mode, out_col="s"
        )
        got = {r["v"]: r["s"] for r in out.collect()}
        assert got == expected, mode


def test_recursive_distinct_mode(spark):
    # graph reachability with a cycle: UNION (distinct) must terminate
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    base = spark.createDataFrame([(1,)], "node int")

    def step(frontier):
        return (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
        )

    out = recursive_cte(base, step, union_all=False, max_iterations=10)
    assert sorted(r["node"] for r in out.collect()) == [1, 2, 3]


def test_unpivot_unnest_multi(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id int, a double, b double")
    up = unpivot(df, ["id"], ["a", "b"])
    assert sorted((r["name"], r["value"]) for r in up.collect()) == [("a", 2.0), ("b", 3.0)]

    df2 = spark.createDataFrame([(1, [1, 2], ["x"])], "id int, xs array<int>, ys array<string>")
    rows = unnest_multi(df2, ["xs", "ys"]).collect()
    assert sorted((r["xs"], r["ys"]) for r in rows) == [(1, "x"), (2, None)]


def test_relation_builder_additions(spark, sf_dir):
    """Round-3 Relation builders: pivot/unpivot/unnest/qualify/top_k/macro
    route through the engine operators (reference EP3 relation surface)."""
    from pyspark.sql import functions as F

    from myduckdb_spark.functions import macros
    from myduckdb_spark.relation import Relation

    orders = Relation.table(spark, sf_dir, "orders")
    piv = orders.pivot("o_orderpriority", "o_orderstatus", F.count(F.lit(1))).df
    assert "o_orderpriority" in piv.columns and len(piv.columns) >= 2

    unp = (
        Relation.table(spark, sf_dir, "part")
        .project("p_partkey", "p_size", "p_retailprice")
        .unpivot(["p_partkey"], ["p_size", "p_retailprice"])
        .df
    )
    assert set(unp.columns) == {"p_partkey", "name", "value"}

    unn = Relation.values(spark, [(1, [10, 20])], "id int, xs array<int>").unnest("xs").df
    assert unn.count() == 2

    q = (
        orders.qualify(
            lambda df: F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "o_custkey"
                ).orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            )
            <= 1
        )
        .df
    )
    assert q.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0] == 1

    top = orders.top_k([F.col("o_totalprice").desc()], 3).df
    assert top.count() == 3

    macros.create_macro("rel_tax", ["x"], "x * 2")
    got = orders.project(Relation.from_df(orders.df).macro("rel_tax", F.col("o_totalprice")).alias("t")).df
    assert got.columns == ["t"]
    macros.drop_macro("rel_tax")


def test_collation_helpers_match_duckdb(spark):
    """collate_key / collated_sort / collated_join vs DuckDB COLLATE
    (reference test/sql/collate/test_collate_case_insensitive.test)."""
    import duckdb

    from myduckdb_spark.operators.collation import (
        collate_key,
        collated_eq,
        collated_join,
        collated_sort,
    )

    rows = [("hello",), ("WoRlD",), ("world",), ("Mühleisen",)]
    df = spark.createDataFrame(rows, "s string")
    con = duckdb.connect()
    con.execute("CREATE TABLE ct(s VARCHAR COLLATE NOCASE)")
    con.executemany("INSERT INTO ct VALUES (?)", rows)

    # equality filter under NOCASE
    got = sorted(r["s"] for r in df.filter(collated_eq("s", "HeLlo", "nocase")).collect())
    want = sorted(r[0] for r in con.execute("SELECT s FROM ct WHERE s='HeLlo'").fetchall())
    assert got == want == ["hello"]

    # NOCASE.NOACCENT folds the umlaut too
    assert df.filter(collated_eq("s", "MUHLEISEN", "nocase.noaccent")).count() == 1

    # sort under NOCASE: collated key order with binary tiebreak
    s = [r["s"] for r in collated_sort(df, "s", "nocase").collect()]
    assert s == ["hello", "Mühleisen", "WoRlD", "world"]

    # join under NOCASE matches DuckDB's collated join
    other = spark.createDataFrame([("HeLlO", 1), ("mÜHLEISEN", 3)], "s string, i int")
    got_j = sorted(
        (r["i"],) for r in collated_join(df, other, "s", "s", "nocase.noaccent").collect()
    )
    assert got_j == [(1,), (3,)]
