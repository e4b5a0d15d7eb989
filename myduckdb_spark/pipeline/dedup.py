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
    sh = docs.select(
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

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed s, min over shingles of
    xxhash64(shingle, s). Pure JVM expression — one pass per row,
    no shuffle, no UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(F.transform(shingles, lambda x: F.xxhash64(x, s))),
    )


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: band b's key = hash of its r-slice. Returns
    array of structs (band, key) ready to explode into the bucket join."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(",", F.transform(F.slice(sig, b * rows_per_band + 1, rows_per_band), lambda v: v.cast("string")))
            ).alias("key"),
        ),
    )


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

    Pipeline: shingle → 64-hash MinHash signature (per-row, JVM) →
    16 bands × 4 rows → explode band keys → self-join on (band, key)
    [the ONLY shuffle, keyed by bucket] → distinct candidate pairs →
    exact-Jaccard verify ≥ threshold. With b=16, r=4 the catch
    probability at s=0.8 is 1-(1-0.8⁴)^16 ≈ 0.9997, so the verified
    output matches the exact all-pairs result with near-certainty —
    while doing O(candidates) work instead of O(n²).
    """
    r = num_hashes // bands
    sh = docs.select(
        F.col(id_col).alias("id"), char_shingles_expr(text_col, k).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = sh.select(
        "id", "sh", F.explode(lsh_band_keys(F.col("sig"), bands, r)).alias("bk")
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col("band"), F.col("key"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = banded.select(F.col("band"), F.col("key"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("__j"))
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
    fp = docs.select(
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
    accumulation (order-independent → engine-reproducible)."""
    dot = F.expr(
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(30,{scale}))),"
        f" CAST(0 AS DECIMAL(38,{scale})), (acc, v) -> CAST(acc + v AS DECIMAL(38,{scale}))) AS DOUBLE)"
    )
    na = F.expr(
        f"CAST(aggregate(transform({a}, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,{scale}))),"
        f" CAST(0 AS DECIMAL(38,{scale})), (acc, v) -> CAST(acc + v AS DECIMAL(38,{scale}))) AS DOUBLE)"
    )
    nb = F.expr(
        f"CAST(aggregate(transform({b}, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,{scale}))),"
        f" CAST(0 AS DECIMAL(38,{scale})), (acc, v) -> CAST(acc + v AS DECIMAL(38,{scale}))) AS DOUBLE)"
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
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_sim_expr("va", "vb").alias("__c"))
        .filter(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.round(F.col("__c"), 6).alias("cos_sim"))
    )
