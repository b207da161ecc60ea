"""ES date-math expressions: ``now-7d/d``, ``2024-01-05||+1M/d``.

Reference: server/src/main/java/org/elasticsearch/common/time/
JavaDateMathParser.java (anchor ``now`` or ``<date>||``, then a
sequence of ``+N<unit>`` / ``-N<unit>`` adjustments and ``/<unit>``
roundings, units y M w d h H m s).

Range-query rounding semantics (RangeQueryBuilder / docs "date math"):
``gt`` and ``lte`` round UP (to the last millisecond of the unit) so
``lte: 2014-11-18||/M`` includes the whole month; ``gte`` and ``lt``
round DOWN. Callers pass ``round_up`` accordingly.

Expressions are query-time literals, so parsing happens driver-side and
the result lands in the plan as a foldable timestamp literal — filters
stay pushable to the parquet scan.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_TOKEN = re.compile(r"([+\-/])(\d*)([yMwdhHms])")

_FIXED = {
    "s": timedelta(seconds=1),
    "m": timedelta(minutes=1),
    "h": timedelta(hours=1),
    "H": timedelta(hours=1),
    "d": timedelta(days=1),
    "w": timedelta(weeks=1),
}

# a settable "now" so tests and oracle twins are deterministic
_FIXED_NOW: datetime | None = None


def set_fixed_now(dt: datetime | None) -> None:
    global _FIXED_NOW
    _FIXED_NOW = dt


def _add_months(dt: datetime, n: int) -> datetime:
    m = dt.month - 1 + n
    y = dt.year + m // 12
    m = m % 12 + 1
    return dt.replace(year=y, month=m, day=min(dt.day, calendar.monthrange(y, m)[1]))


def _truncate(dt: datetime, unit: str) -> datetime:
    if unit == "s":
        return dt.replace(microsecond=0)
    if unit == "m":
        return dt.replace(second=0, microsecond=0)
    if unit in ("h", "H"):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "d":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "w":  # ISO week: Monday
        day = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return day - timedelta(days=day.weekday())
    if unit == "M":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "y":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"date math: unknown rounding unit {unit!r}")


def _bump(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "M":
        return _add_months(dt, n)
    if unit == "y":
        return _add_months(dt, 12 * n)
    return dt + n * _FIXED[unit]


def is_date_math(value: object) -> bool:
    return isinstance(value, str) and (value.startswith("now") or "||" in value)


def parse_date_math(
    expr: str, now: datetime | None = None, round_up: bool = False
) -> datetime:
    """Resolve a date-math string to a datetime (naive UTC)."""
    if expr.startswith("now"):
        anchor = now or _FIXED_NOW or datetime.now(timezone.utc).replace(tzinfo=None)
        rest = expr[3:]
    elif "||" in expr:
        head, rest = expr.split("||", 1)
        anchor = _parse_anchor(head)
    else:
        return _parse_anchor(expr)
    pos = 0
    dt = anchor
    while pos < len(rest):
        m = _TOKEN.match(rest, pos)
        if not m:
            raise ValueError(f"date math: cannot parse {rest[pos:]!r} in {expr!r}")
        op, num, unit = m.groups()
        if op == "/":
            if num:
                raise ValueError(f"date math: rounding takes no number: {expr!r}")
            dt = _truncate(dt, unit)
            if round_up:
                dt = _bump(dt, "M" if unit == "M" else ("y" if unit == "y" else unit), 1)
                dt = dt - timedelta(milliseconds=1)
        else:
            n = int(num or 1)
            dt = _bump(dt, unit, n if op == "+" else -n)
        pos = m.end()
    return dt


def _parse_anchor(s: str) -> datetime:
    for fmt in (
        "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S.%f",
        "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m", "%Y",
    ):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"date math: unparseable anchor {s!r}")
