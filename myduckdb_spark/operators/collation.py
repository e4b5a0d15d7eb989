"""Collation shim (reference src/main/extension/icu — COLLATE NOCASE /
NOACCENT / combined NOCASE.NOACCENT; exercised by test/sql/collate/).

Spark has no per-column collation metadata, so collations are expressed
as KEY EXPRESSIONS: comparisons, joins, group-bys, and sorts run over
``collate_key(col, collation)`` while the original string is carried
through for output. This is exactly how a collation-aware engine
evaluates them internally (a sort key transform), and it keeps every
operation JVM-side (lower/translate are codegen expressions) — no UDF,
scale-safe at any corpus size.

NOACCENT uses an explicit Latin diacritic fold table (the common case the
reference's tests exercise); full ICU normalization would need an
external library, which this container doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Latin diacritic fold (both cases). Pairs aligned by index for translate().
_ACCENT_SRC = (
    "áàâãäåāăéèêëēěíìîïīóòôõöōúùûüūůýÿñçšžřťďĺľ"
    "ÁÀÂÃÄÅĀĂÉÈÊËĒĚÍÌÎÏĪÓÒÔÕÖŌÚÙÛÜŪŮÝŸÑÇŠŽŘŤĎĹĽ"
)
_ACCENT_DST = "aaaaaaaaeeeeeeiiiiioooooouuuuuuyyncszrtdll" "AAAAAAAAEEEEEEIIIIIOOOOOOUUUUUUYYNCSZRTDLL"


def collate_key(col: Column | str, collation: str = "binary") -> Column:
    """Build the comparison key for ``collation`` — dotted combinations
    compose left-to-right as in DuckDB (``NOCASE.NOACCENT``)."""
    c = F.col(col) if isinstance(col, str) else col
    for part in collation.lower().split("."):
        if part in ("binary", "c", "posix", ""):
            continue
        if part == "nocase":
            c = F.lower(c)
        elif part == "noaccent":
            c = F.translate(c, _ACCENT_SRC, _ACCENT_DST)
        else:
            raise ValueError(f"unsupported collation: {part}")
    return c


def collated_eq(col: Column | str, value: Column | str, collation: str) -> Column:
    """``col = value COLLATE collation`` as a filter/join predicate."""
    v = F.lit(value) if isinstance(value, str) else value
    return collate_key(col, collation) == collate_key(v, collation)


def collated_sort(df: DataFrame, col: str, collation: str, ascending: bool = True) -> DataFrame:
    """ORDER BY col COLLATE collation — collated key first, binary value
    as the deterministic tiebreak (DuckDB leaves intra-group order
    unspecified; pinning it keeps results reproducible)."""
    key = collate_key(col, collation)
    keys = [key.asc() if ascending else key.desc(), F.col(col).asc()]
    return df.orderBy(*keys)


def collated_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    collation: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join under a collation: a plain hash join on the collated
    keys (the key expression shuffles exactly like any join key)."""
    return left.join(
        right,
        collate_key(left[left_col], collation) == collate_key(right[right_col], collation),
        how,
    )
