"""DuckDB type-name rendering for typeof() on compound types.

The reference renders logical types via LogicalType::ToString
(src/common/types.cpp): ``STRUCT(k1 VARCHAR, k2 INTEGER[])``,
``MAP(VARCHAR, BIGINT)``, ``INTEGER[]``. Spark's ``typeof()`` returns its
own lowercase spelling (``struct<k1:string,k2:array<int>>``); scalar names
are mapped inline in the SQL translator (sql.py ``_typeof_names``), and
compound names route through the ``__duck_typename`` helper registered
here (Arrow-batched; typeof is a test/introspection surface, never a
hot path).
"""

from __future__ import annotations

_SCALARS = {
    "int": "INTEGER",
    "integer": "INTEGER",
    "bigint": "BIGINT",
    "smallint": "SMALLINT",
    "tinyint": "TINYINT",
    "string": "VARCHAR",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "binary": "BLOB",
    "void": '"NULL"',
    "interval": "INTERVAL",
    # VARIANT is the engine's carrier for DuckDB's JSON logical type
    # (read_json empty/heterogeneous-object inference — io.py
    # _schema_with_variants; reference extension/json json_structure
    # falls back to JSON when an object has no consistent STRUCT shape)
    "variant": "JSON",
}


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (angle/paren nesting aware)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def duck_typename_py(t: str | None) -> str | None:
    if t is None:
        return None
    t = t.strip()
    low = t.lower()
    if low.startswith("array<") and t.endswith(">"):
        return f"{duck_typename_py(t[6:-1])}[]"
    if low.startswith("map<") and t.endswith(">"):
        kv = _split_top(t[4:-1])
        if len(kv) == 2:
            return (
                f"MAP({duck_typename_py(kv[0])}, {duck_typename_py(kv[1])})"
            )
        return t.upper()
    if low.startswith("struct<") and t.endswith(">"):
        fields = []
        body = t[7:-1]
        if not body.strip():
            return "STRUCT()"
        for f in _split_top(body):
            name, _, ftype = f.partition(":")
            fields.append(f"{name.strip()} {duck_typename_py(ftype)}")
        return f"STRUCT({', '.join(fields)})"
    if low.startswith("decimal"):
        return "DECIMAL" + t[len("decimal"):].replace(" ", "")
    if low.startswith("time("):  # Spark TIME carries precision
        return "TIME"
    return _SCALARS.get(low, t.upper())


_REGISTERED: set[int] = set()


def register_typename_udf(spark) -> None:
    """Idempotent per-session registration of ``__duck_typename``."""
    if id(spark) in _REGISTERED:
        return
    from myduckdb_spark.functions.udf import create_scalar_function

    def _udf(s):
        return s.map(duck_typename_py)

    create_scalar_function(spark, "__duck_typename", _udf, "string")
    _REGISTERED.add(id(spark))
