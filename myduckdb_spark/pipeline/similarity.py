"""Similarity search over embedding columns (array<float>).

Two paths, same output contract (probe_id, neighbor_id, cos_sim, rank):

* ``brute_force_topk`` — exact: probe × corpus dot products, per-probe
  top-k via window. O(P·N); correct baseline, fine when P is small or N
  fits a broadcast.
* ``lsh_bucketed_topk`` — scale path: random-hyperplane signatures bucket
  the corpus (one shuffle on bucket key); probes only score their bucket
  (and optional multi-probe neighbors). Approximate, tunable recall.

Dot products are pure JVM expressions (zip_with + aggregate) — no Python
in the hot path. For very wide vectors a Pandas-UDF/numpy batch variant
is provided (`numpy_topk_per_partition`) — Arrow-batched matrix math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from myduckdb_spark.pipeline.dedup import dot_dec_expr, norm_sq_dec_expr


def brute_force_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (excluding self).

    The P·N dot products run as explode → broadcast-join on dim index →
    codegen decimal sum: the corpus explodes to (id, pos, x) rows once,
    each row joins the (broadcast) exploded probes on pos, and
    groupBy(probe, neighbor) sums the per-position products — all
    whole-stage codegen with map-side partial aggregation. A per-PAIR
    higher-order-function dot (interpreted, ~ms/eval) measured 30×
    slower at 80k pairs. Norms are decimal-exact per VECTOR (P+N HOF
    evals, not P·N)."""
    par = corpus.sparkSession.sparkContext.defaultParallelism
    pn = probes.select(
        F.col(id_col).alias("probe_id"),
        F.sqrt(norm_sq_dec_expr(vec_col)).alias("p_norm"),
    )
    cn = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.sqrt(norm_sq_dec_expr(vec_col)).alias("c_norm"),
    )
    pe = probes.select(
        F.col(id_col).alias("probe_id"), F.posexplode(vec_col).alias("pos", "px")
    ).select("probe_id", "pos", F.col("px").cast("double").alias("px"))
    ce = corpus.repartition(par).select(
        F.col(id_col).alias("neighbor_id"), F.posexplode(vec_col).alias("pos", "cx")
    ).select("neighbor_id", "pos", F.col("cx").cast("double").alias("cx"))
    dots = (
        ce.join(F.broadcast(pe), "pos")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(
            F.sum((F.col("px") * F.col("cx")).cast("decimal(18,15)"))
            .cast("double")
            .alias("dot")
        )
    )
    scored = (
        dots.join(F.broadcast(pn), "probe_id")
        .join(F.broadcast(cn), "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            F.round(F.col("dot") / (F.col("p_norm") * F.col("c_norm")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec_col: str, planes: int = 16, dim: int = 64, seed: int = 42) -> F.Column:
    """Random-hyperplane LSH signature as a packed BIGINT: bit p = sign of
    <v, h_p> where h_p's components are ±1 derived from xxhash64(seed,p,i)
    — deterministic, computed JVM-side, no stored model."""
    return F.expr(
        f"""
        aggregate(
          transform(sequence(0, {planes - 1}), p ->
            CASE WHEN aggregate(
              zip_with({vec_col}, sequence(0, {dim - 1}), (x, i) ->
                CASE WHEN (xxhash64({seed}, p, i) & 1) = 1
                     THEN CAST(x AS DOUBLE) ELSE -CAST(x AS DOUBLE) END),
              CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0
            THEN shiftleft(CAST(1 AS BIGINT), p) ELSE CAST(0 AS BIGINT) END),
          CAST(0 AS BIGINT), (acc, v) -> acc | v)
        """
    )


def lsh_bucketed_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: equi-join probe and corpus on the hyperplane
    bucket (ONE shuffle, hash-partitioned by bucket), score within bucket,
    window top-k. Recall grows with fewer planes / multi-probe; at 100 TB
    this is the path — brute force is P·N dot products."""
    # norms precomputed per VECTOR (P+N evals), only the dot is per pair
    sig = lambda df, idn, vn, nn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vn),
        F.sqrt(norm_sq_dec_expr(vec_col)).alias(nn),
        hyperplane_signature(vec_col, planes, dim).alias("bucket"),
    )
    par = probes.sparkSession.sparkContext.defaultParallelism
    p = sig(probes.repartition(par), "probe_id", "pv", "pn")
    c = sig(corpus.repartition(par), "neighbor_id", "cv", "cn")
    scored = (
        p.join(c, "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                dot_dec_expr("pv", "cv") / (F.col("pn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def numpy_topk_per_partition(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched exact top-k: the corpus is broadcast as a numpy
    matrix; each probe partition computes a matmul per Arrow batch.
    The Pandas-UDF escape hatch for wide vectors where per-element
    SQL expressions dominate."""
    import numpy as np

    corpus_rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in corpus_rows], dtype=np.int64)
    mat = np.array([r[1] for r in corpus_rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    sc = probes.sparkSession.sparkContext
    b_ids, b_mat, b_norms = sc.broadcast(ids), sc.broadcast(mat), sc.broadcast(norms)

    def score(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for pid, vec in zip(pdf[id_col], pdf[vec_col]):
                v = np.asarray(vec, dtype=np.float64)
                sims = (b_mat.value @ v) / (b_norms.value * np.linalg.norm(v) + 1e-300)
                mask = b_ids.value != pid
                cand_idx = np.argsort(-sims[mask])[:k]
                cids = b_ids.value[mask][cand_idx]
                csims = sims[mask][cand_idx]
                for rank, (nid, s) in enumerate(zip(cids, csims), 1):
                    out.append((pid, int(nid), round(float(s), 6), rank))
            yield pd.DataFrame(out, columns=["probe_id", "neighbor_id", "cos_sim", "rank"])

    return probes.select(id_col, vec_col).mapInPandas(
        score, schema="probe_id long, neighbor_id long, cos_sim double, rank int"
    )
