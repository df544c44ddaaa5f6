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


# datetime64[ns] spans 1677-09-21T00:12:43.145224193 ..
# 2262-04-11T23:47:16.854775807 (int64 ns around the 1970 epoch).
# Kept as int constants so range checks are exact python-int
# arithmetic, never wrapping int64.
_NS_MIN = -(2**63) + 1  # NaT is -2**63
_NS_MAX = 2**63 - 1


def _ref_epoch_ns(ref: str) -> int:
    """CF reference datetime string -> nanoseconds since the Unix
    epoch as an exact python int (proleptic Gregorian).  Parsed at
    seconds resolution first so references far outside the
    datetime64[ns] window (e.g. ``0001-01-01``) never touch wrapping
    int64 arithmetic — numpy 1.26 silently wraps
    ``np.datetime64('1600-01-01', 'ns')`` to 2184-07-20."""
    rm = _REF_RE.match(ref)
    if not rm:
        raise ValueError(f"unparseable CF reference datetime {ref!r}")
    y, mo, d = int(rm.group(1)), int(rm.group(2)), int(rm.group(3))
    hh = int(rm.group(4) or 0)
    mm = int(rm.group(5) or 0)
    ss = float(rm.group(6) or 0.0)
    # days since 1970-01-01 via datetime64[D] at year resolution is
    # still wrap-prone; use the proleptic-Gregorian day-number formula
    # (valid for all years >= 1) instead.
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        raise ValueError(f"unparseable CF reference datetime {ref!r}")
    a = (14 - mo) // 12
    yy = y + 4800 - a
    mm_ = mo + 12 * a - 3
    jdn = d + (153 * mm_ + 2) // 5 + 365 * yy + yy // 4 - yy // 100 + yy // 400 - 32045
    days = jdn - 2440588  # JDN of 1970-01-01
    frac_ns = round(ss * 1_000_000_000)
    return ((days * 24 + hh) * 60 + mm) * 60 * 1_000_000_000 + frac_ns


def parse_cf_time_units(units: str) -> tuple[int, int]:
    """``"hours since 2020-01-01 00:00:00"`` ->
    (seconds per unit, reference epoch in exact-int nanoseconds).

    The reference may fall OUTSIDE the datetime64[ns] window (common
    epochs like ``days since 0001-01-01`` do); only base+offset must
    land inside it, which :func:`cf_times_to_datetime64` enforces."""
    m = re.match(r"^\s*(\w+)\s+since\s+(.*)$", units, re.IGNORECASE)
    if not m:
        raise ValueError(f"unparseable CF time units {units!r}")
    unit, ref = m.group(1).lower(), m.group(2)
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported CF time unit {unit!r}")
    return _UNIT_SECONDS[unit], _ref_epoch_ns(ref)


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
    step, base_ns = parse_cf_time_units(units)
    v = np.asarray(values, dtype="float64")
    out = np.empty(v.shape, dtype="int64")
    flat_v = v.ravel()
    flat_o = out.ravel()
    step_ns = step * 1_000_000_000
    for i, x in enumerate(flat_v):
        # exact python-int arithmetic end to end: the base may sit far
        # outside the ns window (days since 0001-01-01) as long as
        # base+offset lands inside it
        if not np.isfinite(x):
            raise ValueError(f"non-finite CF time value {x!r}")
        ns = base_ns + round(float(x) * step_ns)
        if not (_NS_MIN <= ns <= _NS_MAX):
            raise ValueError(
                f"CF time value {x!r} {units!r} is outside the "
                "datetime64[ns] representable range (1677-09-21 .. "
                "2262-04-11); refusing to wrap silently"
            )
        flat_o[i] = ns
    return out.view("datetime64[ns]")
