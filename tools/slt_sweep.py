"""Sweep the reference sqllogictest corpus and triage every file.

Unlike tools/slt.py::run_file (which raises on the first value mismatch —
right for the curated pytest corpus), the sweep records mismatches per
file and keeps going, producing a JSON triage report:

    {file: {"checked": N, "mismatch": M, "skip_q": K, "skip_s": S,
            "mismatches": [(sql, spark_head, duck_head), ...]}}

Files with checked>0 and mismatch==0 are candidates for the curated
corpus (tests/test_slt_corpus.py); files with mismatch>0 are engine bugs
to fix. Usage:

    python tools/slt_sweep.py aggregate join order ... > sweep.json
    python tools/slt_sweep.py --all            # every test/sql subdir
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback

REF = "/root/reference/test/sql"

# directories whose semantics are out of engine scope (storage internals,
# extension loading, concurrency, pragmas about the C++ engine itself)
SKIP_DIRS = {
    "storage", "attach", "pragma", "parallelism", "secrets", "extensions",
    "logging", "settings", "error", "explain", "show_select", "describe",
    "detach", "export", "catalog", "checkpoint", "transactions", "index",
    "alter", "create", "delete", "update", "insert", "copy", "tpch",
    "tpcds", "fuzzer", "prepared", "pg_catalog", "information_schema",
    "upsert", "constraints", "sequence", "vacuum",
}


# files whose statements crash the PROCESS natively (duckdb segfault /
# divide trap observed in dmesg) — a try/except can't survive those
CRASHERS = {
    "types/nested/list/test_list_functions_with_null_structs.test",
    "function/timestamp/test_icu_time_bucket_timestamptz.test",
    "function/list/list_resize.test",
    # spins the JVM/driver past any alarm
    "json/issues/issue13212.test",
}


def sweep_file(spark, path: str, max_queries: int = 60) -> dict:
    import duckdb

    from myduckdb_spark.sql import sql as engine_sql
    from tools.slt import _canon, _snapshot, parse

    con = duckdb.connect()
    out = {"checked": 0, "mismatch": 0, "skip_q": 0, "skip_s": 0, "mismatches": []}
    dirty = True
    try:
        recs = parse(path)
    except Exception as e:
        out["parse_error"] = str(e)
        return out
    import tempfile

    from tools.slt import localize_paths

    test_dir = tempfile.mkdtemp(prefix="sltsw_")
    for rec in recs:
        rec.sql = localize_paths(rec.sql, test_dir)
        if not rec.sql.strip():
            continue
        if rec.kind in ("statement_ok", "statement_maybe"):
            if re.match(r"\s*PRAGMA", rec.sql, re.I):
                continue
            try:
                con.execute(rec.sql)
                dirty = True
            except Exception:
                if rec.kind == "statement_ok":
                    out["skip_s"] += 1
        elif rec.kind == "statement_error":
            try:
                con.execute(rec.sql).fetchall()
                dirty = True
            except Exception:
                pass
        else:
            if out["checked"] + out["mismatch"] >= max_queries:
                break
            if re.match(r"\s*(EXPLAIN|DESCRIBE|SHOW|PRAGMA)\b", rec.sql, re.I):
                out["skip_q"] += 1
                continue
            if re.match(
                r"\s*(CREATE|INSERT|UPDATE|DELETE|DROP|ALTER|SET|ATTACH|COPY|BEGIN|COMMIT|ROLLBACK)\b",
                rec.sql, re.I,
            ):
                try:
                    con.execute(rec.sql)
                    dirty = True
                except Exception:
                    out["skip_s"] += 1
                continue
            if re.search(
                r"\b(INSERT|UPDATE|DELETE|CREATE|DROP|ALTER)\b", rec.sql, re.I
            ) and re.match(r"\s*(WITH|FROM)\b", rec.sql, re.I):
                try:
                    con.execute(rec.sql)
                    dirty = True
                except Exception:
                    out["skip_s"] += 1
                continue
            try:
                cur = con.execute(rec.sql)
                if cur.description is None:
                    dirty = True
                    continue
                duck_cols = [d[0] for d in cur.description]
                want = _canon(cur.fetchall())
            except Exception:
                out["skip_q"] += 1
                continue
            if dirty:
                try:
                    _snapshot(spark, con)
                except Exception:
                    out["skip_q"] += 1
                    continue
                dirty = False
            try:
                df = engine_sql(spark, rec.sql)
                low = {c.lower(): c for c in df.columns}
                if (
                    len(df.columns) == len(duck_cols)
                    and len(set(c.lower() for c in duck_cols)) == len(duck_cols)
                    and all(c.lower() in low for c in duck_cols)
                ):
                    df = df.select([low[c.lower()] for c in duck_cols])
                got = _canon([tuple(r) for r in df.collect()])
            except Exception as e:
                out["skip_q"] += 1
                out.setdefault("engine_errors", []).append(
                    (rec.sql[:200], str(e).split("\n")[0][:200])
                )
                continue
            if got == want:
                out["checked"] += 1
            else:
                out["mismatch"] += 1
                out["mismatches"].append((rec.sql[:300], got[:3], want[:3]))
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from myduckdb_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--all" in sys.argv:
        args = sorted(
            d for d in os.listdir(REF)
            if os.path.isdir(os.path.join(REF, d)) and d not in SKIP_DIRS
        )
    curated: set[str] = set()
    if "--new-only" in sys.argv:  # skip files already in the pytest corpus
        import tests.test_slt_corpus as tc

        curated = set(tc.CORPUS)
    for a in sys.argv[1:]:
        if a.startswith("--done="):  # resume: skip already-triaged files
            dec = json.JSONDecoder()
            for ln in open(a[len("--done="):]):
                ln = ln.strip()
                pos = 0
                while pos < len(ln):
                    try:
                        obj, end = dec.raw_decode(ln, pos)
                        curated.update(obj.keys())
                        pos = end
                        while pos < len(ln) and ln[pos] in " \t":
                            pos += 1
                    except Exception:
                        break
    max_q = 60
    spark = get_spark()
    report: dict[str, dict] = {}
    for sub in args:
        for root, _dirs, files in os.walk(os.path.join(REF, sub)):
            for f in sorted(files):
                if not f.endswith(".test"):
                    continue
                rel = os.path.relpath(os.path.join(root, f), REF)
                if rel in curated:
                    continue
                if rel in CRASHERS:
                    report[rel] = {"skipped": "native-crash file"}
                    print(json.dumps({rel: report[rel]}), flush=True)
                    continue
                # crash fence: native duckdb segfaults kill the process
                # before a result is written; a --done resume must skip
                print(json.dumps({rel: {"fatal": "started (native crash?)"}}),
                      flush=True)
                try:
                    # per-file wall clock cap — a few corpus files drive the
                    # JVM into multi-minute analysis; don't let one file
                    # stall the whole sweep
                    import signal

                    def _timeout(signum, frame):
                        raise TimeoutError("per-file sweep timeout")

                    signal.signal(signal.SIGALRM, _timeout)
                    signal.alarm(120)
                    try:
                        report[rel] = sweep_file(spark, os.path.join(root, f), max_q)
                    finally:
                        signal.alarm(0)
                except Exception:
                    report[rel] = {"fatal": traceback.format_exc()[-300:]}
                line = report[rel]
                print(
                    f"{rel}: checked={line.get('checked', 0)} "
                    f"mismatch={line.get('mismatch', 0)} skips={line.get('skip_q', 0)}",
                    file=sys.stderr,
                )
                # stream one JSON line per file so a native crash later in
                # the run doesn't lose everything before it
                print(json.dumps({rel: line}, default=str), flush=True)


if __name__ == "__main__":
    main()
