"""Deduplication operators over document tables.

Scale design: every method here is expressed as shuffle-bounded DataFrame
ops — shingling and hashing are per-row (no shuffle), candidate
generation is a groupBy/join on bucket keys (one shuffle, bucket count ≫
skew), and exact verification only touches candidate pairs (never the
n² cross product). At 100 TB the all-pairs variants (`*_all_pairs`) are
for oracle testing only and say so.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text; adds group size.

    hash-groupBy on the full text — at scale, group on md5(text) instead
    of the text bytes to shrink shuffle width (same result, 16-byte keys).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("__h"))
        .agg(
            F.min(id_col).alias(id_col),
            F.first(text_col).alias(text_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__h")
    )


# ---------------------------------------------------------------------------
# Shingling / n-grams
# ---------------------------------------------------------------------------

def char_shingles_expr(text_col: str, k: int = 3, distinct: bool = True) -> Column:
    """SQL-expression form of char k-gram shingling (JVM codegen, no UDF)."""
    inner = (
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 0)),"
        f" i -> substring({text_col}, i, {k}))"
    )
    if distinct:
        inner = f"array_distinct({inner})"
    return F.expr(inner)


def word_ngrams_expr(text_col: str, n: int = 3) -> Column:
    """Word n-grams via split + slice (JVM-side)."""
    return F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 0)),"
        f" i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))"
    )


# ---------------------------------------------------------------------------
# Jaccard on shingle sets
# ---------------------------------------------------------------------------

def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two (distinct-element) arrays, JVM-side."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    partition_col: str | None = None,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold (id_a < id_b).

    ORACLE/TEST PATH: O(n²) within partition_col groups. At scale use
    ``minhash_lsh_pairs`` (candidates via LSH, verify with this metric).
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par).select(
        F.col(id_col), *([partition_col] if partition_col else []),
        char_shingles_expr(text_col, k).alias("sh"),
    )
    a = sh.select(
        *([F.col(partition_col).alias("p")] if partition_col else []),
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
    )
    b = sh.select(
        *([F.col(partition_col).alias("p")] if partition_col else []),
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    pairs = a.join(b, cond if not partition_col else (a["p"] == b["p"]) & cond)
    out = pairs.select(
        "id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("__j")
    )
    # threshold on the raw value, round only for output (boundary-safe)
    return out.filter(F.col("__j") >= threshold).select(
        "id_a", "id_b", F.round(F.col("__j"), 6).alias("jacc")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash+LSH, verified with exact Jaccard.

    Signature computation is Spark-first: explode shingles to rows, hash
    each shingle ONCE (codegen'd xxhash64), then groupBy(id) with
    ``min(xxhash64(h, seed_i))`` per hash function — whole-stage codegen
    end-to-end, with map-side partial aggregation so the shuffle carries
    only ``num_hashes`` longs per document. (A nested higher-order-
    function formulation [transform(seq, s -> array_min(transform(...)))]
    runs on Catalyst's interpreted eval path and gets re-inlined into
    every band-key expression by projection collapse — measured 100×
    slower; do not regress to it.)

    Pipeline: repartition docs (single-file inputs otherwise put all
    per-row work in one task) → explode+hash → sig (one narrow shuffle)
    → band keys → self-join on (band, key) → distinct candidate pairs →
    exact-Jaccard verify ≥ threshold. With b bands × r rows the catch
    probability at s=threshold is 1-(1-s^r)^b (≈0.9997 for 16×4 at 0.8),
    so the verified output matches the exact all-pairs result with
    near-certainty — at O(candidates) cost instead of O(n²).
    """
    r = num_hashes // bands
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = (
        docs.repartition(par)
        .select(F.col(id_col).alias("id"), char_shingles_expr(text_col, k).alias("sh"))
        .persist()
    )
    exploded = sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    sig = exploded.groupBy("id").agg(
        *[F.min(F.xxhash64("h", F.lit(i))).alias(f"m{i}") for i in range(num_hashes)]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * r + j}") for j in range(r)]).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sig.select("id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # candidate pairs carry ONLY ids through the band self-join (keeping
    # the shingle arrays here would multiply the shuffle payload ×bands);
    # shingles are re-attached to the deduped pair list afterwards.
    a = banded.select("band", "key", F.col("id").alias("id_a"))
    b = banded.select("band", "key", F.col("id").alias("id_b"))
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    with_sh = (
        cands.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    return (
        with_sh.select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("__j"))
        .filter(F.col("__j") >= threshold)
        .select("id_a", "id_b", F.round(F.col("__j"), 6).alias("jacc"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_expr(tokens_sql: str, bits: int = 64) -> Column:
    """SimHash fingerprint as one SQL expression (whole-stage codegen):
    counts[i] = Σ over tokens of ±1 by bit i of xxhash64(token); the
    fingerprint packs sign(counts[i]) bits into a BIGINT. ``tokens_sql``
    is a SQL fragment producing an array<string>. (Python F.shiftleft
    requires literal shift amounts; the SQL form accepts expressions.)"""
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate({tokens_sql}, array_repeat(0, {bits}),
              (acc, t) -> zip_with(acc,
                transform(sequence(0, {bits - 1}),
                  i -> IF((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)),
                (a, b) -> a + b)),
            sequence(0, {bits - 1}),
            (c, i) -> IF(c > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
          CAST(0 AS BIGINT), (acc, v) -> acc | v)
        """
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, blocked join on
    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ some 16-bit block equal),
    verify with bit_count(xor) ≤ max_hamming. One shuffle on block keys."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    fp = docs.repartition(par).select(
        F.col(id_col).alias("id"),
        simhash_expr(f"array_distinct(split({text_col}, ' '))").alias("fp"),
    )
    nblocks = 64 // block_bits
    mask = (1 << block_bits) - 1
    blocked = fp.select(
        "id", "fp",
        F.explode(
            F.expr(
                f"transform(sequence(0, {nblocks - 1}), b -> named_struct("
                f"'blk', b, 'key', shiftrightunsigned(fp, b * {block_bits}) & {mask}))"
            )
        ).alias("bk"),
    ).select("id", "fp", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a = blocked.select("blk", "key", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = blocked.select("blk", "key", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_sim_expr(a: str, b: str, scale: int = 15) -> Column:
    """Cosine similarity of two float-array columns, decimal-exact
    accumulation (order-independent → engine-reproducible).

    DECIMAL(18,15) keeps every intermediate in 64-bit long arithmetic
    (precision ≤18) instead of int128 — ~5× faster, exact for unit-scale
    embeddings up to ~900 dims (|sum| < 1000). Per-element products are
    identical doubles in any engine; their decimal roundings and the
    exact decimal sum are therefore identical too."""
    p = 18
    dot = F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL({p},{scale}))),"
        f" CAST(0 AS DECIMAL({p},{scale})), (acc, v) -> CAST(acc + v AS DECIMAL({p},{scale}))) AS DOUBLE)"
    )
    na = F.expr(
        f"CAST(aggregate(transform({a}, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL({p},{scale}))),"
        f" CAST(0 AS DECIMAL({p},{scale})), (acc, v) -> CAST(acc + v AS DECIMAL({p},{scale}))) AS DOUBLE)"
    )
    nb = F.expr(
        f"CAST(aggregate(transform({b}, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL({p},{scale}))),"
        f" CAST(0 AS DECIMAL({p},{scale})), (acc, v) -> CAST(acc + v AS DECIMAL({p},{scale}))) AS DOUBLE)"
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (test scale). The scale path is
    similarity.lsh_bucketed_topk (random-hyperplane buckets)."""
    par = emb.sparkSession.sparkContext.defaultParallelism
    a = emb.repartition(par).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_sim_expr("va", "vb").alias("__c"))
        .filter(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.round(F.col("__c"), 6).alias("cos_sim"))
    )
