"""Engine options — the reference's SET/PRAGMA client config surface
(reference src/main/settings/settings.cpp; the fork's own knob is
`am_us_join_threshold`, settings.cpp:1402-1411, default 100 at
client_config.hpp:104).

Options live engine-side (plain dict); Spark confs are set through
``spark.conf`` as usual. The SQL front door routes ``SET name = value``
here for engine options and to ``spark.conf`` for dotted Spark keys.
"""

from __future__ import annotations

_DEFAULTS = {
    # fork knob: both-sides-small join threshold for the AM_US policy
    "am_us_join_threshold": 100,
    # recursive CTE safety cap (operators/recursive.py)
    "max_recursion_depth": 100,
}

_OPTIONS = dict(_DEFAULTS)


def set_option(name: str, value) -> None:
    key = name.lower()
    if key not in _DEFAULTS:
        raise KeyError(f"unknown engine option: {name}")
    _OPTIONS[key] = type(_DEFAULTS[key])(value)


def get_option(name: str):
    return _OPTIONS[name.lower()]


def reset_option(name: str) -> None:
    _OPTIONS[name.lower()] = _DEFAULTS[name.lower()]


def options() -> dict:
    return dict(_OPTIONS)
