"""Sweep the reference's DML test dirs (insert/update/delete/upsert/
create) through the DUAL-state runner (tools/slt.py::run_file_dual):
statements apply through the engine's storage front door AND DuckDB,
queries compare each engine's own state. Triage output: one JSON line per
file with checked/mismatch/resync counts — files with checked>0 and
mismatch==0 are candidates for tests/test_slt_corpus.py::DML_CORPUS.

    python tools/dml_sweep.py delete update insert upsert create
"""

from __future__ import annotations

import json
import os
import signal
import sys
import traceback

REF = "/root/reference/test/sql"

# files that hang past the alarm (py4j/JVM calls defer SIGALRM): the
# per-file watchdog cannot interrupt them, so they are skipped outright
HANGERS = {
    "copy/csv/test_non_unicode_header.test",
    # native duckdb crash observed mid-sweep (r7)
    "types/nested/map/map_from_entries/data_types.test",
    # fuzzer-generated parquet corpus: kills the process natively (r8)
    "copy/parquet/afl.test",
    # known native crashers (shared with slt_sweep.CRASHERS)
    "types/nested/list/test_list_functions_with_null_structs.test",
    "function/timestamp/test_icu_time_bucket_timestamptz.test",
    "function/list/list_resize.test",
    "json/issues/issue13212.test",
    # recursive macro + enable_macro_dependencies: live duckdb 1.x spins
    # natively (SIGALRM deferred inside the C extension) — r9
    "catalog/function/test_recursive_macro.test",
    "catalog/function/test_recursive_macro_no_dependency.test",
}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from myduckdb_spark.session import get_spark

    from tools.slt import run_file_dual

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    done: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--done="):  # resume: skip files already triaged
            for ln in open(a[len("--done="):]):
                if ln.strip():
                    done.update(json.loads(ln).keys())
    spark = get_spark()
    for sub in args:
        base = os.path.join(REF, sub)
        files = (
            [base]
            if base.endswith(".test")
            else sorted(
                os.path.join(r, f)
                for r, _d, fs in os.walk(base)
                for f in fs
                if f.endswith(".test")
            )
        )
        for path in files:
            rel = os.path.relpath(path, REF)
            if rel in done:
                continue
            if rel in HANGERS:
                print(json.dumps({rel: {"skipped": "hang file"}}), flush=True)
                continue
            # crash fence: a native duckdb segfault kills the process
            # before the result line is written — emit a started marker
            # first so a --done resume skips the killer file
            print(json.dumps({rel: {"fatal": "started (native crash?)"}}),
                  flush=True)

            def _timeout(signum, frame):
                raise TimeoutError("per-file sweep timeout")

            signal.signal(signal.SIGALRM, _timeout)
            signal.alarm(240)
            try:
                r = run_file_dual(spark, path, max_queries=60, collect_mismatches=True)
                line = {
                    "checked": r.queries,
                    "rejects": getattr(r, "rejects", 0),
                    "statements": r.statements,
                    "mismatch": len(r.mismatches),
                    "resyncs": r.resyncs,
                    "skip_q": len(r.skipped_queries),
                    "skip_s": len(r.skipped_statements),
                    "mismatches": r.mismatches[:5],
                    "skipped_queries": [
                        (q[:160], e[:160]) for q, e in r.skipped_queries[:5]
                    ],
                }
            except Exception:
                line = {"fatal": traceback.format_exc()[-400:]}
            finally:
                signal.alarm(0)
            print(
                f"{rel}: checked={line.get('checked', 0)} "
                f"mismatch={line.get('mismatch', 0)} resyncs={line.get('resyncs', 0)} "
                f"skips={line.get('skip_q', 0)}/{line.get('skip_s', 0)}"
                + (" FATAL" if "fatal" in line else ""),
                file=sys.stderr,
            )
            print(json.dumps({rel: line}, default=str), flush=True)


if __name__ == "__main__":
    main()
