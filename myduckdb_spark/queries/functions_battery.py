"""Scalar-function batteries — SURVEY.md §2.9's function library exercised
end-to-end with oracle checks (reference registry:
src/core_functions/function_list.cpp:51-428; built-ins under
src/function/scalar/).

Each battery is a single projection over a real table, selecting only
functions whose results are bit-identical between Spark and DuckDB
(integer/string/date semantics, IEEE-exact double ops like sqrt, exact
decimal arithmetic). Functions with engine-divergent last-bit rounding
(exp/ln/trig — libm vs StrictMath) are exercised in tests/test_functions.py
with tolerance instead, and are available through
myduckdb_spark.functions.registry.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myduckdb_spark.catalog import load_table
from myduckdb_spark.queries import register


@register(
    "fn_string_battery",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           CAST(length(p_name) AS INT) AS len,
           substring(p_name, 1, 4) AS sub,
           concat_ws('-', p_brand, p_type) AS cw,
           lpad(p_brand, 12, '*') AS lp, rpad(p_type, 10, '.') AS rp,
           trim('  ' || p_name || ' ') AS tr,
           replace(p_name, ' ', '_') AS rep,
           reverse(p_type) AS rev,
           split_part(p_name, ' ', 1) AS sp1,
           CAST(starts_with(p_name, 'small') AS BOOLEAN) AS sw,
           CAST(contains(p_name, 'gear') AS BOOLEAN) AS has_gear,
           p_name LIKE '%bolt%' AS like_bolt,
           CAST(ascii(p_type) AS INT) AS asc1,
           CAST(levenshtein(p_name, 'small ring') AS INT) AS lev,
           md5(p_name) AS h_md5,
           CAST(strpos(p_name, 'e') AS INT) AS pos_e,
           repeat(p_brand, 2) AS rep2,
           translate(p_type, 'AEO', 'aeo') AS trans,
           left(p_name, 3) AS l3, right(p_name, 3) AS r3,
           regexp_extract(p_name, '([a-z]+)$', 1) AS re_last,
           regexp_replace(p_name, '[aeiou]', '#', 'g') AS re_sub
    FROM part
    ORDER BY p_partkey
    """,
    tags=("functions", "string"),
)
def fn_string_battery(spark, sf_dir):
    """String library (reference src/function/scalar/string/ +
    src/core_functions/scalar/string/). All JVM built-ins — whole-stage
    codegen, no UDFs."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").cast("int").alias("len"),
        F.substring("p_name", 1, 4).alias("sub"),
        F.concat_ws("-", "p_brand", "p_type").alias("cw"),
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_type", 10, ".").alias("rp"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("tr"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("rep"),
        F.reverse("p_type").alias("rev"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("sp1"),
        F.startswith(F.col("p_name"), F.lit("small")).alias("sw"),
        F.contains(F.col("p_name"), F.lit("gear")).alias("has_gear"),
        F.col("p_name").like("%bolt%").alias("like_bolt"),
        F.ascii("p_type").alias("asc1"),
        F.levenshtein(F.col("p_name"), F.lit("small ring")).alias("lev"),
        F.md5("p_name").alias("h_md5"),
        F.instr("p_name", "e").alias("pos_e"),
        F.repeat("p_brand", 2).alias("rep2"),
        F.translate("p_type", "AEO", "aeo").alias("trans"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("re_last"),
        F.regexp_replace("p_name", "[aeiou]", "#").alias("re_sub"),
    ).orderBy("p_partkey")


@register(
    "fn_math_battery",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS ab,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sg,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           CAST(CAST(round(CAST(p_retailprice AS DECIMAL(12,2)), 1) AS DECIMAL(12,1)) AS DOUBLE) AS rnd,
           sqrt(p_retailprice) AS sq,
           p_retailprice * p_retailprice AS sqr,
           CAST(p_size % 7 AS INT) AS md,
           greatest(p_size, 25) AS gr, least(p_size, 25) AS le,
           CAST(factorial(CAST(p_size % 10 AS INTEGER)) AS BIGINT) AS fact,
           CAST(p_size << 2 AS INT) AS shl,
           CAST(p_size & 12 AS INT) AS band,
           CAST(p_size | 3 AS INT) AS bor,
           CAST(xor(p_size, 5) AS INT) AS bxor,
           CAST(bit_count(p_size) AS INT) AS bcnt,
           CAST(isnan(p_retailprice) AS BOOLEAN) AS nn,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS dec2,
           CAST(try_cast(p_brand AS INTEGER) IS NULL AS BOOLEAN) AS badcast
    FROM part
    ORDER BY p_partkey
    """,
    tags=("functions", "math"),
)
def fn_math_battery(spark, sf_dir):
    """Math/bit library (reference src/core_functions/scalar/math/
    numeric.cpp + operators). Only IEEE-exact ops (abs/sqrt/x*x/round/
    integer bit ops) — transcendentals live in the registry with
    tolerance tests."""
    part = load_table(spark, sf_dir, "part")
    p = F.col("p_retailprice")
    s = F.col("p_size")
    return part.select(
        "p_partkey",
        F.abs(p - 1000.0).alias("ab"),
        F.signum(p - 1000.0).alias("sg"),
        F.ceil(p).alias("ce"),
        F.floor(p).alias("fl"),
        # decimal round, not double round: double round(x, 1) is engine- and
        # session-sensitive at representation boundaries; decimal is exact.
        # Final cast back to DOUBLE: a DECIMAL output column is driver-hostile
        # (duckdb's pandas conversion renders DECIMAL as float64 while Spark's
        # renders Decimal objects — "900.10" vs "900.1" hash-mismatch).
        F.round(p.cast("decimal(12,2)"), 1).cast("decimal(12,1)").cast("double").alias("rnd"),
        F.sqrt(p).alias("sq"),
        (p * p).alias("sqr"),
        (s % 7).alias("md"),
        F.greatest(s, F.lit(25)).alias("gr"),
        F.least(s, F.lit(25)).alias("le"),
        F.factorial((s % 10).cast("bigint")).cast("bigint").alias("fact"),
        F.shiftleft(s, 2).alias("shl"),
        s.bitwiseAND(F.lit(12)).alias("band"),
        s.bitwiseOR(F.lit(3)).alias("bor"),
        s.bitwiseXOR(F.lit(5)).alias("bxor"),
        F.bit_count(s).cast("int").alias("bcnt"),
        F.isnan(p).alias("nn"),
        p.cast("decimal(12,2)").cast("double").alias("dec2"),
        F.expr("try_cast(p_brand AS INT)").isNull().alias("badcast"),
    ).orderBy("p_partkey")


@register(
    "fn_datetime_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(CASE WHEN dayofweek(o_orderdate) = 0 THEN 7 ELSE dayofweek(o_orderdate) END AS INT) AS dow_iso,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS trunc_m,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS trunc_q,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS dd,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(o_orderdate AS DATE) AS as_date,
           strftime(o_orderdate, '%Y-%m-%d') AS fmt,
           CAST(make_date(2024, 2, 29) AS DATE) AS md
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("functions", "datetime"),
)
def fn_datetime_battery(spark, sf_dir):
    """Date/time library (reference src/core_functions/scalar/date/).
    dayofweek aligned to ISO (DuckDB: 0=Sun..6=Sat; Spark: 1=Sun..7=Sat
    → both mapped to 1=Mon..7=Sun)."""
    orders = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
        F.quarter(ts).alias("q"),
        F.dayofyear(ts).alias("doy"),
        F.when(F.dayofweek(ts) == 1, 7).otherwise(F.dayofweek(ts) - 1).cast("int").alias("dow_iso"),
        F.weekofyear(ts).alias("woy"),
        F.date_trunc("month", ts).cast("date").alias("trunc_m"),
        F.date_trunc("quarter", ts).cast("date").alias("trunc_q"),
        F.last_day(ts.cast("date")).alias("eom"),
        F.datediff(ts.cast("date"), F.lit("1995-01-01").cast("date")).alias("dd"),
        F.date_add(ts.cast("date"), 30).alias("plus30"),
        ts.cast("date").alias("as_date"),
        F.date_format(ts, "yyyy-MM-dd").alias("fmt"),
        F.make_date(F.lit(2024), F.lit(2), F.lit(29)).alias("md"),
    ).orderBy("o_orderkey")


@register(
    "fn_list_battery",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n,
           embedding[1] AS first_el,
           embedding[len(embedding)] AS last_el,
           array_to_string(list_transform(embedding[1:3],
             x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) AS VARCHAR)), ',') AS head3,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           array_to_string(list_transform(embedding[1:2],
             x -> CAST(CAST(CAST(x AS DOUBLE) * 2.0 AS DECIMAL(18,9)) AS VARCHAR)), ',') AS twice,
           CAST(CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)))) AS DECIMAL(18,9)) AS DOUBLE) AS total,
           list_reverse_sort(embedding)[1] AS mx,
           list_sort(embedding)[1] AS mn,
           CAST(list_contains(list_transform(embedding, x -> x > 0.5), true) AS BOOLEAN) AS any_big,
           array_to_string(list_transform(flatten([embedding[1:2], embedding[3:4]]),
             x -> CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) AS VARCHAR)), ',') AS flat4
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("functions", "list", "hof"),
)
def fn_list_battery(spark, sf_dir):
    """List/lambda library (reference src/core_functions/scalar/list/ +
    lambda engine src/core_functions/lambda_functions.cpp) → Spark
    higher-order functions, all JVM-side. Float sums accumulate in
    decimal for cross-engine exactness. Array outputs are serialized to
    strings (decimal-canonical elements, comma-joined) — the driver's
    canonicalizer cannot hash list cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")

    def dec_str(x):
        return x.cast("decimal(18,9)").cast("string")

    return emb.select(
        "vec_id",
        F.size(e).alias("n"),
        e.getItem(0).alias("first_el"),
        F.element_at(e, -1).alias("last_el"),
        F.array_join(F.transform(F.slice(e, 1, 3), lambda x: dec_str(x.cast("double"))), ",").alias(
            "head3"
        ),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.array_join(
            F.transform(F.slice(e, 1, 2), lambda x: dec_str(x.cast("double") * 2.0)), ","
        ).alias("twice"),
        F.aggregate(
            F.transform(e, lambda x: x.cast("double").cast("decimal(18,9)")),
            F.lit(0).cast("decimal(18,9)"),
            lambda acc, v: (acc + v).cast("decimal(18,9)"),
        )
        .cast("double")
        .alias("total"),
        F.array_max(e).alias("mx"),
        F.array_min(e).alias("mn"),
        F.array_contains(F.transform(e, lambda x: x > 0.5), True).alias("any_big"),
        F.array_join(
            F.transform(
                F.flatten(F.array(F.slice(e, 1, 2), F.slice(e, 3, 2))),
                lambda x: dec_str(x.cast("double")),
            ),
            ",",
        ).alias("flat4"),
    ).orderBy("vec_id")


@register(
    "fn_json_battery",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS no_key,
           CAST(json_valid(props) AS BOOLEAN) AS ok,
           CAST(json_structure(props::JSON) AS VARCHAR) AS structure,
           json_type(props::JSON) AS jtype,
           json_type(props::JSON, '$.k') AS ktype,
           CAST((json_transform(props, '{"k": "BIGINT"}')).k * 2 AS BIGINT)
               AS t_k2
    FROM events
    ORDER BY event_id
    """,
    tags=("functions", "json"),
)
def fn_json_battery(spark, sf_dir):
    """JSON library (reference extension/json/json_functions/) →
    get_json_object / from_json. json_valid emulated via try-parse
    (Spark has no json_valid built-in); json_structure/json_type are
    Arrow-batched pandas UDFs, json_transform compiles to from_json with
    a DDL schema (functions/jsonx.py)."""
    from myduckdb_spark.functions.jsonx import register_json_udfs

    register_json_udfs(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("no_key"),
        F.try_variant_get(F.try_parse_json("props"), "$", "string")
        .isNotNull()
        .alias("ok"),
        F.call_udf("json_structure", F.col("props")).alias("structure"),
        F.call_udf("json_type", F.col("props"), F.lit("$")).alias("jtype"),
        F.call_udf("json_type", F.col("props"), F.lit("$.k")).alias("ktype"),
        (F.from_json("props", "STRUCT<`k`: BIGINT>").getField("k") * 2)
        .cast("bigint")
        .alias("t_k2"),
    ).orderBy("event_id")


@register(
    "fn_struct_map_battery",
    oracle="""
    SELECT n_nationkey,
           struct_extract(struct_pack(k := n_nationkey, nm := n_name), 'nm') AS s_nm,
           struct_extract(struct_pack(k := n_nationkey, nm := n_name), 'k') AS s_k,
           map(['key'], [n_name])['key'][1] AS m_val,
           CAST(cardinality(map([n_name], [n_nationkey])) AS INT) AS m_size,
           map_keys(map([n_name], [n_nationkey]))[1] AS m_key
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("functions", "struct", "map"),
)
def fn_struct_map_battery(spark, sf_dir):
    """Struct/map construction + extraction (reference
    src/core_functions/scalar/{struct,map}/). Results projected back to
    scalars so the value-hash compares engine-neutrally."""
    nat = load_table(spark, sf_dir, "nation")
    st = F.struct(F.col("n_nationkey").alias("k"), F.col("n_name").alias("nm"))
    mp = F.create_map(F.lit("key"), F.col("n_name"))
    mp2 = F.create_map(F.col("n_name"), F.col("n_nationkey"))
    return nat.select(
        "n_nationkey",
        st.getField("nm").alias("s_nm"),
        st.getField("k").alias("s_k"),
        F.element_at(mp, "key").alias("m_val"),
        F.size(mp2).alias("m_size"),
        F.element_at(F.map_keys(mp2), 1).alias("m_key"),
    ).orderBy("n_nationkey")


@register(
    "fn_union_battery",
    oracle="""
    SELECT n_nationkey,
           CAST(union_tag(union_value(num := n_nationkey)) AS VARCHAR) AS tag_num,
           union_extract(union_value(num := n_nationkey), 'num') AS uval,
           CAST(union_tag(union_value(nm := n_name)) AS VARCHAR) AS tag_nm,
           union_extract(union_value(nm := n_name), 'nm') AS sval
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("functions", "union"),
)
def fn_union_battery(spark, sf_dir):
    """UNION-type functions (reference src/core_functions/scalar/union/
    union_value.cpp, union_tag.cpp, union_extract.cpp). Spark has no
    tagged-union type; the documented emulation (SURVEY §1.2) is a struct
    carrying the active tag + one field per member — tag/extract become
    struct field accesses, which hash-match DuckDB's native union ops."""
    from myduckdb_spark.functions.registry import fn

    nat = load_table(spark, sf_dir, "nation")
    u_num = fn("union_value")(num=F.col("n_nationkey"))
    u_nm = fn("union_value")(nm=F.col("n_name"))
    return nat.select(
        "n_nationkey",
        fn("union_tag")(u_num).alias("tag_num"),
        fn("union_extract")(u_num, "num").alias("uval"),
        fn("union_tag")(u_nm).alias("tag_nm"),
        fn("union_extract")(u_nm, "nm").alias("sval"),
    ).orderBy("n_nationkey")


@register(
    "fn_blob_battery",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name)) AS b64,
           decode(from_base64(base64(encode(p_brand)))) AS b64_rt,
           hex(p_brand) AS hx,
           sha256(p_name) AS sh,
           to_base(p_size, 2) AS base2,
           to_base(p_size, 16) AS base16,
           CAST(hamming(substring(p_name, 1, 3), substring(p_type, 1, 3)) AS INT) AS ham,
           ROUND(jaccard(p_name, p_type), 6) AS jac
    FROM part
    ORDER BY p_partkey
    """,
    tags=("functions", "blob"),
)
def fn_blob_battery(spark, sf_dir):
    """Blob/encoding + similarity-metric functions (reference
    src/core_functions/scalar/blob/base64.cpp, string/hex.cpp,
    sha256, to_base; hamming/jaccard in string/levenshtein-family).
    All JVM built-ins or composed expressions — no UDFs. jaccard is
    DuckDB's character-SET jaccard, reproduced with
    array_distinct/intersect/union over split characters."""
    from myduckdb_spark.functions.registry import fn

    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("p_brand").cast("binary"))).cast("string").alias("b64_rt"),
        F.hex(F.col("p_brand")).alias("hx"),
        F.sha2(F.col("p_name"), 256).alias("sh"),
        F.conv(F.col("p_size").cast("string"), 10, 2).alias("base2"),
        F.conv(F.col("p_size").cast("string"), 10, 16).alias("base16"),
        fn("hamming")(F.substring("p_name", 1, 3), F.substring("p_type", 1, 3))
        .cast("int")
        .alias("ham"),
        F.round(fn("jaccard")(F.col("p_name"), F.col("p_type")), 6).alias("jac"),
    ).orderBy("p_partkey")


@register(
    "fn_timetz_battery",
    oracle="""
    WITH v AS (
      SELECT o_orderkey AS id,
             o_orderkey % 24 AS hh, (o_orderkey * 7) % 60 AS mi,
             (o_orderkey * 13) % 60 AS ss, (o_orderkey * 997) % 1000000 AS us,
             o_orderkey % 15 AS oh, 15 * (o_orderkey % 4) AS om,
             15 * (1 + o_orderkey % 3) AS om6, 1 + (o_orderkey * 11) % 59 AS os2
      FROM orders WHERE o_orderkey % 31 = 0
    ),
    s AS (
      SELECT id, CASE id % 8
        WHEN 0 THEN printf('%02d:%02d:%02d', hh, mi, ss)
        WHEN 1 THEN printf('%02d:%02d:%02d.%06d+%02d', hh, mi, ss, us, oh)
        WHEN 2 THEN printf('%02d:%02d:%02d+%02d:%02d', hh, mi, ss, oh, om)
        WHEN 3 THEN printf('%02d:%02d:%02d-%02d:%02d', hh, mi, ss, oh, om)
        WHEN 4 THEN printf('%02d:%02d:%02d.%06d+%02d%02d', hh, mi, ss, us, oh, om)
        WHEN 5 THEN printf('2024-03-05 %02d:%02d:%02d.%06d', hh, mi, ss, us)
        WHEN 6 THEN printf('%02d:%02d:%02d+%02d:%02d:%02d', hh, mi, ss, oh, om6, os2)
        ELSE printf('%02d:61:00', hh) END AS s
      FROM v
    ),
    t AS (SELECT id, s, TRY_CAST(s AS TIMETZ) AS ttz FROM s)
    SELECT id, s,
           CAST(ttz AS VARCHAR) AS ttz_str,
           CAST((extract(hour FROM CAST(ttz AS TIME)) * 3600
                 + extract(minute FROM CAST(ttz AS TIME)) * 60) * 1000000
                + extract(microsecond FROM CAST(ttz AS TIME)) AS BIGINT) AS tmic,
           CAST(extract(timezone FROM ttz) AS BIGINT) AS offs,
           CAST(row_number() OVER (ORDER BY ttz NULLS LAST, id) AS BIGINT) AS rnk
    FROM t ORDER BY id
    """,
    tags=("datetime", "timetz"),
)
def fn_timetz_battery(spark, sf_dir):
    """TIME WITH TIME ZONE parity (reference dtime_tz_t, time.hpp;
    test/sql/types/time/test_time_tz.test): VARCHAR->TIMETZ parsing
    across every offset spelling the reference accepts (+HH, ±HH:MM,
    ±HH:MM:SS, compact ±HHMM, timestamp-shaped, none), TIMETZ->VARCHAR
    shortest-form rendering, TIME extraction, offset extraction, and the
    packed-key ordering (wall clock first, offset DESC on ties) checked
    via row_number against DuckDB's ORDER BY ttz. Invalid inputs (61
    minutes) must be NULL in every derived column and rank after all
    valid keys. The TIMETZ key is a plain BIGINT (same bit layout as
    dtime_tz_t), so compare/sort/rank all stay in whole-stage codegen."""
    from pyspark.sql import Window

    from myduckdb_spark.functions.timetz import (
        timetz_format,
        timetz_micros,
        timetz_offset,
        to_timetz,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 31 == 0)
    i = F.col("id")
    v = o.select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_orderkey") % 24).alias("hh"),
        (F.col("o_orderkey") * 7 % 60).alias("mi"),
        (F.col("o_orderkey") * 13 % 60).alias("ss"),
        (F.col("o_orderkey") * 997 % 1000000).alias("us"),
        (F.col("o_orderkey") % 15).alias("oh"),
        (F.lit(15) * (F.col("o_orderkey") % 4)).alias("om"),
        (F.lit(15) * (F.lit(1) + F.col("o_orderkey") % 3)).alias("om6"),
        (F.lit(1) + F.col("o_orderkey") * 11 % 59).alias("os2"),
    )
    fs = F.format_string
    s = v.select(
        "id",
        F.when(i % 8 == 0, fs("%02d:%02d:%02d", "hh", "mi", "ss"))
        .when(i % 8 == 1, fs("%02d:%02d:%02d.%06d+%02d", "hh", "mi", "ss", "us", "oh"))
        .when(i % 8 == 2, fs("%02d:%02d:%02d+%02d:%02d", "hh", "mi", "ss", "oh", "om"))
        .when(i % 8 == 3, fs("%02d:%02d:%02d-%02d:%02d", "hh", "mi", "ss", "oh", "om"))
        .when(i % 8 == 4, fs("%02d:%02d:%02d.%06d+%02d%02d", "hh", "mi", "ss", "us", "oh", "om"))
        .when(i % 8 == 5, fs("2024-03-05 %02d:%02d:%02d.%06d", "hh", "mi", "ss", "us"))
        .when(i % 8 == 6, fs("%02d:%02d:%02d+%02d:%02d:%02d", "hh", "mi", "ss", "oh", "om6", "os2"))
        .otherwise(fs("%02d:61:00", "hh"))
        .alias("s"),
    )
    key = to_timetz(F.col("s"))
    w = Window.orderBy(key.asc_nulls_last(), "id")
    return s.select(
        "id",
        "s",
        timetz_format(key).alias("ttz_str"),
        timetz_micros(key).alias("tmic"),
        timetz_offset(key).alias("offs"),
        F.row_number().over(w).cast("bigint").alias("rnk"),
    ).orderBy("id")
