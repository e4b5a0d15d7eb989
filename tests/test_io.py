"""Sources/sinks: CSV sniffer, JSON, parquet partitioned writes, glob.

Parity model: reference read_csv_auto sniffer
(src/execution/operator/csv_scanner/sniffer/), COPY ... TO
(src/function/table/copy_csv.cpp, extension/parquet/parquet_writer.cpp),
glob (src/function/table/glob.cpp).
"""

import os

from pyspark.sql import functions as F

from myduckdb_spark import io as mio


def test_csv_roundtrip_with_sniffer(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", -4.0)],
        "id long, name string, score double",
    )
    p = str(tmp_path / "csv_out")
    mio.write_csv(df, p, single_file=True)
    back = mio.read_csv(spark, p)  # sniffed: comma, header=True
    assert back.columns == ["id", "name", "score"]
    assert back.schema["id"].dataType.typeName() == "integer" or \
        back.schema["id"].dataType.typeName() in ("long", "integer")
    assert sorted(r.name for r in back.collect()) == ["alpha", "beta", "gamma"]


def test_csv_sniffer_pipe_delim_no_header(spark, tmp_path):
    p = str(tmp_path / "pipes.csv")
    with open(p, "w") as f:
        f.write("1|x|10.5\n2|y|11.5\n3|z|12.5\n")
    sniffed = mio.sniff_csv(spark, p)
    assert (sniffed["sep"], sniffed["header"]) == ("|", False)
    back = mio.read_csv(spark, p)
    assert back.count() == 3 and len(back.columns) == 3


def test_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"a": 2})], "id long, payload map<string,int>"
    )
    p = str(tmp_path / "json_out")
    mio.write_json(df, p)
    back = mio.read_json(spark, p)
    assert back.count() == 2
    assert set(back.columns) == {"id", "payload"}


def test_parquet_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
    p = str(tmp_path / "part_out")
    mio.write_parquet(df, p, partition_by=["bucket"])
    assert sorted(
        d for d in os.listdir(p) if d.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2", "bucket=3"]
    back = mio.read_parquet(spark, p).filter(F.col("bucket") == 2)
    assert back.count() == 25
    # partition pruning: the physical scan must not list all 4 dirs
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "bucket=2" in plan or "PartitionFilters" in plan


def test_glob_paths(spark, tmp_path):
    for n in ("a.txt", "b.txt", "c.log"):
        (tmp_path / n).write_text("x")
    hits = mio.glob_paths(spark, str(tmp_path / "*.txt"))
    assert len(hits) == 2 and all(h.endswith(".txt") for h in hits)


def test_read_arrow(spark):
    import pyarrow as pa

    t = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    df = mio.read_arrow(spark, t)
    assert df.count() == 3 and set(df.columns) == {"k", "v"}


MESSY = {
    # name -> file content (reference sniffer matrix: quotes, escapes,
    # skip-rows; tests/test_io exercises each against DuckDB sniff_csv)
    "embedded_delim.csv": 'a,b,c\n1,"x,y",2\n3,"z",4\n',
    "skiprows_pipe.csv": "# comment line\n# another\nid|name|val\n1|x|2.5\n2|y|3.5\n",
    "doubled_quotes.csv": 'a;b\n"he said ""hi""";2\n"plain";3\n',
    "backslash_escape.csv": 'x\ty\n"a\\"q"\t1\n"b"\t2\n',
}


def test_csv_sniffer_matches_duckdb_dialect(spark, tmp_path):
    """sniff_csv vs DuckDB's own sniffer on quoted/escaped/skip-row files
    (reference csv_scanner/sniffer/dialect_detection.cpp matrix)."""
    import duckdb

    con = duckdb.connect()
    for name, content in MESSY.items():
        p = str(tmp_path / name)
        with open(p, "w") as f:
            f.write(content)
        want = con.sql(
            f"SELECT Delimiter, Quote, Escape, SkipRows, HasHeader FROM sniff_csv('{p}')"
        ).fetchone()
        got = mio.sniff_csv(spark, p)
        assert got["sep"] == want[0], name
        assert got["quote"] == want[1], name
        assert got["escape"] == want[2], name
        assert got["skip_rows"] == want[3], name
        assert got["header"] == want[4], name


def test_csv_read_matches_duckdb_values(spark, tmp_path):
    import duckdb

    con = duckdb.connect()
    for name, content in MESSY.items():
        p = str(tmp_path / name)
        with open(p, "w") as f:
            f.write(content)
        want = [tuple(r) for r in con.sql(f"SELECT * FROM read_csv_auto('{p}')").fetchall()]
        got = [tuple(r) for r in mio.read_csv(spark, p).collect()]
        assert sorted(got, key=str) == sorted(want, key=str), name
