"""TIME WITH TIME ZONE (TIMETZ) shim — pure JVM expressions.

The reference's TIMETZ (src/include/duckdb/common/types/time.hpp,
dtime_tz_t) packs a wall-clock time and a UTC offset into one sortable
64-bit value: the top 40 bits carry micros-since-midnight and the low
24 bits carry ``MAX_OFFSET - offset_seconds``, so plain integer
comparison yields DuckDB's documented ordering — wall-clock time first,
ties broken by offset DESCENDING ("a clock time east of Greenwich is
earlier than the same clock time further west",
test/sql/types/time/test_time_tz.test:86).

We use the identical packing as a BIGINT column, which keeps every
comparison/sort/group inside whole-stage codegen: a TIMETZ column is
just a BIGINT to Spark, and ORDER BY key == DuckDB's ORDER BY ttz.

Supported cast surface (mirrors the reference test file):
- VARCHAR -> TIMETZ: 'HH:MM:SS[.ffffff]' with optional offset
  '+HH' | '+HH:MM' | '+HH:MM:SS' | '+HHMM' (compact), default +00;
  timestamp-shaped strings take their time-of-day part ('+00').
- TIMETZ -> VARCHAR: shortest-offset rendering ('+04', '+04:30',
  '+04:30:45'), micros shown only when nonzero.
- TIMETZ -> TIME: drop the offset (micros-since-midnight BIGINT).
- TIME/TIMESTAMP -> TIMETZ: offset +00.

All functions return NULL on unparseable input (DuckDB TRY_CAST
behavior; a strict CAST error channel is out of scope for expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# dtime_tz_t constants (duckdb/common/types/time.hpp): offsets span
# ±15:59:59 and the offset field is 24 bits wide.
MAX_OFFSET = 15 * 3600 + 59 * 60 + 59  # 57599
OFFSET_BITS = 24
_SCALE = 1 << OFFSET_BITS

# time-of-day with optional fraction and optional [+-]HH[[:]MM[[:]SS]]
# offset; '24:00:00' is a valid DuckDB time (end-of-day sentinel).
_TIME_RE = (
    r"^\s*(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?"
    r"(?:\s*([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?)?\s*$"
)
# timestamp-shaped input: take the time part, offset +00
_TS_RE = r"^\s*\d{4}-\d{2}-\d{2}[ T](\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?\s*$"


def _c(x) -> Column:
    return x if isinstance(x, Column) else (F.col(x) if isinstance(x, str) else F.lit(x))


def _num(g: Column) -> Column:
    """regexp_extract group -> BIGINT; empty match -> NULL (ANSI-safe)."""
    return F.when(g != "", g).cast("bigint")


def _micros_from_groups(s: Column, pat: str) -> Column:
    """micros-since-midnight from regex groups 1-4 of `pat` (NULL if no match)."""
    hh = _num(F.regexp_extract(s, pat, 1))
    mm = _num(F.regexp_extract(s, pat, 2))
    ss = _num(F.regexp_extract(s, pat, 3))
    frac = _num(F.rpad(F.regexp_extract(s, pat, 4), 6, "0"))  # '.123' -> 123000 micros
    micros = (
        hh * 3_600_000_000
        + mm * 60_000_000
        + ss * 1_000_000
        + F.coalesce(frac, F.lit(0))
    )
    # range check: minutes/seconds < 60; the hour field itself is NOT
    # capped (DuckDB accepts '26:00:00'::TIMETZ, time_limits.test)
    valid = hh.isNotNull() & (mm < 60) & (ss < 60)
    return F.when(valid, micros)


def _offset_secs(s: Column) -> Column:
    """UTC offset seconds from groups 5-8 of _TIME_RE; 0 when absent.

    Compact '+HHMM' arrives as group6='HH' group7='MM' because the
    optional-colon groups are both two digits; '+H'/' +HH' leave 7/8 empty.
    """
    sign = F.regexp_extract(s, _TIME_RE, 5)
    oh = _num(F.regexp_extract(s, _TIME_RE, 6))
    om = _num(F.regexp_extract(s, _TIME_RE, 7))
    osec = _num(F.regexp_extract(s, _TIME_RE, 8))
    mag = (
        F.coalesce(oh, F.lit(0)) * 3600
        + F.coalesce(om, F.lit(0)) * 60
        + F.coalesce(osec, F.lit(0))
    )
    secs = F.when(sign == "-", -mag).otherwise(mag)
    return F.when(sign == "", F.lit(0)).otherwise(
        F.when((mag <= MAX_OFFSET), secs)  # out-of-range offset -> NULL
    )


def pack_timetz(micros: Column, offset_secs: Column) -> Column:
    """DuckDB dtime_tz_t packing: sortable BIGINT key."""
    return (
        _c(micros).cast("bigint") * _SCALE
        + (F.lit(MAX_OFFSET).cast("bigint") - _c(offset_secs).cast("bigint"))
    )


def to_timetz(s) -> Column:
    """VARCHAR -> TIMETZ key (NULL on parse failure), reference cast
    semantics (test_time_tz.test:8-55)."""
    s = _c(s)
    t_micros = _micros_from_groups(s, _TIME_RE)
    ts_micros = _micros_from_groups(s, _TS_RE)
    return (
        F.when(t_micros.isNotNull(), pack_timetz(t_micros, _offset_secs(s)))
        .when(ts_micros.isNotNull(), pack_timetz(ts_micros, F.lit(0)))
    )


def timetz_micros(key) -> Column:
    """TIMETZ -> TIME (micros since midnight)."""
    return F.floor(_c(key) / _SCALE).cast("bigint")


def timetz_offset(key) -> Column:
    """TIMETZ -> UTC offset seconds."""
    return (F.lit(MAX_OFFSET).cast("bigint") - _c(key) % _SCALE).cast("bigint")


def _two(n: Column) -> Column:
    return F.lpad(n.cast("string"), 2, "0")


def timetz_format(key) -> Column:
    """TIMETZ -> VARCHAR, DuckDB rendering: fractional seconds only when
    nonzero (right-trimmed), offset in shortest form (+HH / +HH:MM /
    +HH:MM:SS), zero offset as '+00'."""
    key = _c(key)
    micros = timetz_micros(key)
    off = timetz_offset(key)

    hh = _two(F.floor(micros / 3_600_000_000))
    mm = _two(F.floor(micros / 60_000_000) % 60)
    ss = _two(F.floor(micros / 1_000_000) % 60)
    sub = (micros % 1_000_000).cast("bigint")
    frac = F.when(
        sub > 0,
        F.concat(F.lit("."), F.regexp_replace(F.lpad(sub.cast("string"), 6, "0"), "0+$", "")),
    ).otherwise(F.lit(""))

    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    mag = F.abs(off)
    o_h = _two(F.floor(mag / 3600))
    o_m = F.floor(mag / 60) % 60
    o_s = mag % 60
    off_str = F.concat(
        sign,
        o_h,
        F.when(o_s > 0, F.concat(F.lit(":"), _two(o_m), F.lit(":"), _two(o_s)))
        .when(o_m > 0, F.concat(F.lit(":"), _two(o_m)))
        .otherwise(F.lit("")),
    )
    return F.when(
        key.isNotNull(), F.concat(hh, F.lit(":"), mm, F.lit(":"), ss, frac, off_str)
    )


def register_timetz() -> None:
    """Expose the TIMETZ family under DuckDB-ish names in the function
    registry (timetz constructor name mirrors make_time/make_timestamptz,
    function_list.cpp make_time entry)."""
    from myduckdb_spark.functions.registry import _reg

    _reg("to_timetz")(to_timetz)
    _reg("timetz_format")(timetz_format)
    _reg("timetz_micros")(timetz_micros)
    _reg("timetz_offset")(timetz_offset)
    _reg("make_timetz")(
        lambda h, m, s, off=0: pack_timetz(
            _c(h).cast("bigint") * 3_600_000_000
            + _c(m).cast("bigint") * 60_000_000
            + (_c(s) * 1_000_000).cast("bigint"),
            off,
        )
    )
