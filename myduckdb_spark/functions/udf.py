"""User-defined function surface (reference
src/include/duckdb/function/udf_function.hpp — CreateScalarFunction :21-36,
CreateAggregateFunction :77-121; Python client UDFs under tools/pythonpkg/).

Spark-first mapping:

* scalar UDF → Arrow-batched ``pandas_udf`` (vectorized; 10-100x faster
  than row-at-a-time python UDFs — the ONLY sanctioned Python hot path);
* UDAF → ``pandas_udf`` in grouped-aggregate form (Series -> scalar),
  usable inside ``groupBy().agg(...)``;
* both register into ``spark.udf`` so the SQL front door sees them too.

UDFs remain the slow path: anything expressible with built-in
``pyspark.sql.functions`` should use the function registry instead
(functions/registry.py) — these helpers exist for genuinely custom logic.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_CREATED: dict[str, object] = {}


def create_scalar_function(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> Callable:
    """CreateScalarFunction: ``fn`` maps pandas Series -> pandas Series
    (vectorized over Arrow batches). Returns the Column-producing callable
    and registers ``name`` for SQL."""
    udf = pandas_udf(return_type)(fn)
    spark.udf.register(name, udf)
    _CREATED[name] = udf
    return udf


def create_aggregate_function(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> Callable:
    """CreateAggregateFunction: ``fn`` maps pandas Series (one group) ->
    scalar. Usable in ``df.groupBy(...).agg(udaf(col))`` and registered
    for SQL aggregate calls. Partial aggregation is NOT available to
    grouped-agg UDFs (whole groups ship to Python) — prefer composing
    built-in aggregates when the math allows; this is the escape hatch
    the reference offers for genuinely custom state machines."""
    from pyspark.sql.functions import PandasUDFType

    udf = pandas_udf(return_type, PandasUDFType.GROUPED_AGG)(fn)
    spark.udf.register(name, udf)
    _CREATED[name] = udf
    return udf


def created() -> dict[str, object]:
    return dict(_CREATED)


# ---------------------------------------------------------------------------
# Prebuilt pandas-UDF string metrics (reference jaro_winkler.cpp /
# damerau_levenshtein in src/core_functions/scalar/string/): per-pair
# dynamic programming has no codegen-expression form, so these run as
# Arrow-batched UDFs — the sanctioned slow path. levenshtein / hamming /
# jaccard ARE expressions (functions/registry.py).
# ---------------------------------------------------------------------------


def _jaro_sim(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    window = max(n1, n2) // 2 - 1
    m1 = [False] * n1
    m2 = [False] * n2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / n1 + matches / n2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    """Jaro-Winkler similarity. The prefix boost applies only when the base
    Jaro score exceeds 0.7, matching the reference implementation
    (third_party/jaro_winkler/details/jaro_impl.hpp:463)."""
    j = _jaro_sim(s1 or "", s2 or "")
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip((s1 or "")[:4], (s2 or "")[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def damerau_levenshtein(s1: str, s2: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (adjacent transpositions),
    the reference's variant."""
    s1, s2 = s1 or "", s2 or ""
    n1, n2 = len(s1), len(s2)
    maxdist = n1 + n2
    da: dict[str, int] = {}
    d = [[maxdist] * (n2 + 2) for _ in range(n1 + 2)]
    for i in range(n1 + 1):
        d[i + 1][1] = i
    for j in range(n2 + 1):
        d[1][j + 1] = j
    for i in range(1, n1 + 1):
        db = 0
        for j in range(1, n2 + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return d[n1 + 1][n2 + 1]


def register_string_metrics(spark: SparkSession) -> None:
    """Register jaro_winkler_similarity / damerau_levenshtein as
    Arrow-batched UDFs (SQL + Column callable via spark.udf)."""

    # NULL in, NULL out — the reference's string metrics are not
    # null-coalescing (test_damerau_levenshtein.test, test_jaro_winkler)
    def _null2(fn):
        # NULL propagates; two EMPTY strings score 0.0 (live DuckDB;
        # jaro_impl returns 0 when either length is 0)
        return lambda x, y: (
            None if x is None or y is None
            else (0.0 if fn is not damerau_levenshtein
                  and (len(x) == 0 or len(y) == 0) else fn(x, y))
        )

    def _jw(a, b):
        return a.combine(b, _null2(jaro_winkler))

    def _j(a, b):
        return a.combine(b, _null2(_jaro_sim))

    def _dl(a, b):
        return a.combine(b, _null2(damerau_levenshtein))

    create_scalar_function(spark, "jaro_winkler_similarity", _jw, "double")
    create_scalar_function(spark, "jaro_similarity", _j, "double")
    create_scalar_function(spark, "damerau_levenshtein", _dl, "int")


def register_numeric_udfs(spark: SparkSession) -> None:
    """IEEE-754 step functions with no Spark builtin (reference
    function/scalar/math: nextafter) — vectorized over numpy."""
    import numpy as np

    def _nextafter(a, b):
        import pandas as pd

        # NaN must PROPAGATE (reference: nextafter(nan, x) = nan); SQL
        # NULLs are indistinguishable from NaN in a float64 batch, so the
        # SQL front door wraps the call in an IS NULL guard instead.
        # FLOAT inputs step in float32 ULPs (nextafter('inf'::FLOAT, 0)
        # is the largest finite float32, not float64). The reference
        # promotes mixed (INTEGER, FLOAT) arguments to FLOAT — float32
        # applies whenever a float32 is present and no float64 is
        # (nan_functions.test: nextafter(3, '-inf'::FLOAT))
        dtypes = (str(a.dtype), str(b.dtype))
        if "float32" in dtypes and "float64" not in dtypes:
            out = np.nextafter(
                a.to_numpy(dtype="float32"), b.to_numpy(dtype="float32")
            )
        else:
            out = np.nextafter(
                a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64")
            )
        return pd.Series(out.astype("float64"), index=a.index)

    create_scalar_function(spark, "nextafter", _nextafter, "double")


def duck_split_regex_py(s: str | None, pat: str) -> list[str] | None:
    """The reference's regex split loop (core_functions/scalar/string/
    string_split.cpp StringSplitter::Split): a ZERO-WIDTH match at the
    current position consumes the next character as its own token (no
    leading/trailing empty from zero-width matches), while a non-empty
    match that ends at end-of-string still yields the final '' token.
    Java's String.split differs on every zero-width edge, so the SQL
    front door routes empty-matchable patterns here."""
    import re as _re

    if s is None:
        return None
    rx = _re.compile(pat)
    out: list[str] = []
    while len(s) > 0:
        m = rx.search(s)
        if m is None:
            break
        pos, msz = m.start(), m.end() - m.start()
        if msz == 0 and pos == 0:
            pos = 1  # consume one character as its own token
            if pos == len(s):
                break
        out.append(s[:pos])
        s = s[pos + msz:]
    out.append(s)
    return out


def register_split_regex(spark: SparkSession) -> None:
    def _u(s, p):
        return s.combine(p, duck_split_regex_py)

    create_scalar_function(spark, "__duck_split_regex", _u, "array<string>")


def blob_render_py(b) -> str | None:
    """DuckDB's BLOB -> VARCHAR rendering (blob.cpp ToString): printable
    ASCII bytes verbatim, backslash and non-printables as \\xNN."""
    if b is None:
        return None
    if isinstance(b, str):
        b = b.encode("utf-8", "surrogateescape")
    return "".join(
        chr(x) if 32 <= x <= 126 and x != 92 else "\\x%02X" % x
        for x in bytes(b)
    )


def register_blob_render(spark: SparkSession) -> None:
    def _u(s):
        return s.map(blob_render_py)

    create_scalar_function(spark, "__blob_str", _u, "string")


def blob_parse_py(s) -> bytes | None:
    """DuckDB's VARCHAR -> BLOB cast (blob.cpp TryCastToBlob): \\xNN
    escapes decode to bytes, everything else is taken verbatim."""
    if s is None:
        return None
    if isinstance(s, (bytes, bytearray)):
        return bytes(s)
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 3 < len(s) + 1 and s[i + 1 : i + 2] == "x" \
                and len(s) >= i + 4:
            try:
                out.append(int(s[i + 2 : i + 4], 16))
                i += 4
                continue
            except ValueError:
                pass
        out.extend(c.encode("utf-8"))
        i += 1
    return bytes(out)


def register_blob_parse(spark: SparkSession) -> None:
    def _u(s):
        return s.map(blob_parse_py)

    create_scalar_function(spark, "__blob_parse", _u, "binary")
