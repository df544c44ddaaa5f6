"""CF-conventions time decoding (SURVEY.md §2 S1 parity: the
reference's ``xr.open_dataset`` decodes coordinate times per CF
``units``/``calendar`` attributes before any resample runs —
wrf_voronoi.py:115 feeds A2's ``resample(XTIME="1D")``).

Pure-python/numpy implementation of the CF time grammar:
``<unit> since <reference datetime>`` with unit in
seconds/minutes/hours/days (singular or plural, plus the common
abbreviations), standard/gregorian/proleptic_gregorian calendars ->
``datetime64[ns]``.  Model-only calendars (360_day, noleap) are
rejected loudly rather than silently mapped onto real dates — the
xarray behavior users rely on (it refuses datetime64 for those too).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["parse_cf_time_units", "cf_times_to_datetime64"]

_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "sec": 1, "secs": 1, "s": 1,
    "minute": 60, "minutes": 60, "min": 60, "mins": 60,
    "hour": 3600, "hours": 3600, "hr": 3600, "hrs": 3600, "h": 3600,
    "day": 86400, "days": 86400, "d": 86400,
}

_REF_RE = re.compile(
    r"^\s*(\d{1,4})-(\d{1,2})-(\d{1,2})"
    r"(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?)?"
    r"\s*(?:Z|UTC|[+-]0{1,2}:?0{0,2})?\s*$"
)

_SUPPORTED_CALENDARS = {
    "standard", "gregorian", "proleptic_gregorian", None,
}


def parse_cf_time_units(units: str) -> tuple[int, np.datetime64]:
    """``"hours since 2020-01-01 00:00:00"`` ->
    (seconds per unit, reference datetime64[ns])."""
    m = re.match(r"^\s*(\w+)\s+since\s+(.*)$", units, re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable CF time units {units!r}")
    unit, ref = m.group(1).lower(), m.group(2)
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported CF time unit {unit!r}")
    rm = _REF_RE.match(ref)
    if not rm:
        raise ValueError(f"unparseable CF reference datetime {ref!r}")
    y, mo, d = int(rm.group(1)), int(rm.group(2)), int(rm.group(3))
    hh = int(rm.group(4) or 0)
    mm = int(rm.group(5) or 0)
    ss = float(rm.group(6) or 0.0)
    base = np.datetime64(f"{y:04d}-{mo:02d}-{d:02d}", "ns")
    base = (
        base
        + np.timedelta64(hh, "h")
        + np.timedelta64(mm, "m")
        + np.timedelta64(round(ss * 1_000_000_000), "ns")
    )
    return _UNIT_SECONDS[unit], base


def cf_times_to_datetime64(
    values, units: str, calendar: str | None = "standard"
) -> np.ndarray:
    """Numeric CF time values -> ``datetime64[ns]``.  Floats keep
    sub-second precision (rounded to whole nanoseconds)."""
    cal = calendar.lower() if isinstance(calendar, str) else calendar
    if cal not in _SUPPORTED_CALENDARS:
        raise ValueError(
            f"calendar {calendar!r} has no datetime64 representation "
            "(360_day/noleap need model-calendar arithmetic)"
        )
    step, base = parse_cf_time_units(units)
    v = np.asarray(values, dtype="float64")
    ns = np.rint(v * step * 1e9).astype("int64")
    return base + ns.astype("timedelta64[ns]")
