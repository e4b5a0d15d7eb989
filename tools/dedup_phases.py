"""Phase-level timing of dedup_minhash_lsh at sf0.1 (guide §1: measure
before changing). Times each driver-visible action inside
minhash_lsh_pairs by replaying the same steps with explicit timers.

Usage: python tools/dedup_phases.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.3f}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from myduckdb_spark.catalog import load_table
    from myduckdb_spark.pipeline import dedup as D
    from myduckdb_spark.session import get_spark

    spark = get_spark("dedup-phases")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    for rep in range(3):
        print(f"--- rep {rep} ---", file=sys.stderr)
        docs = load_table(spark, SF_DIR, "documents")
        par = spark.sparkContext.defaultParallelism
        sh = t("build sh (lazy)", lambda: (
            docs.repartition(par)
            .select(F.col("doc_id").alias("id"), D.char_shingles_expr("text", 3).alias("sh"))
            .persist()
        ))
        n_docs = t("sh.count()", sh.count)
        exploded = sh.select("id", F.explode("sh").alias("s")).persist()
        vocab = t("vocab probe", lambda: [
            r[0] for r in exploded.select("s").distinct().limit(D._BITMAP_VOCAB_MAX + 1).collect()
        ])
        print(f"  n_docs={n_docs} vocab={len(vocab)}", file=sys.stderr)
        full = t("full query end-to-end (noop)", lambda: (
            D.minhash_lsh_pairs(load_table(spark, SF_DIR, "documents"),
                                id_col="doc_id", k=3, num_hashes=128, bands=32,
                                threshold=0.7)
            .orderBy("id_a", "id_b")
            .write.mode("overwrite").format("noop").save()
        ))
        sh.unpersist()
        exploded.unpersist()
        del full
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
