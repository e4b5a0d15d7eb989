"""Operator library — Spark-first implementations of the reference's
physical-operator inventory (SURVEY.md §2).

Most reference operators map 1:1 onto DataFrame methods and need no code
here; this package holds the ones that need composition or policy:

* ``joins`` — theta/as-of/mark/single/positional joins + the fork's AM_US
  small-input join policy,
* ``groupjoin`` — the fork's GroupJoin fusion as a plan rewrite,
* ``setops`` / ``sample`` / ``topk`` / ``window_ex`` / ``recursive`` /
  ``pivots`` — set operations, sampling modes, top-k, window extensions
  (QUALIFY, EXCLUDE), recursive CTEs, pivot/unpivot.
"""
