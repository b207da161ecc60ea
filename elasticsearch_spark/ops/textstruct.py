"""find_structure (x-pack/plugin/text-structure).

FindStructureAction inspects a text sample and reports its structure:
ndjson / delimited / semi_structured_text, column names, delimiter,
header detection, and the timestamp field+format. This deterministic
re-derivation covers the same decision tree; the result feeds a Spark
reader (schema + options) the way the reference's result feeds an
ingest pipeline.
"""

from __future__ import annotations

import json
import re

_DELIMITERS = [",", "\t", ";", "|"]

_TS_PATTERNS: list[tuple[str, str]] = [
    (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
     "ISO8601"),
    (r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}", "SYSLOG"),
    (r"\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2}", "APACHE_COMBINED"),
]

_NUM = re.compile(r"^-?\d+(\.\d+)?$")


def _timestamp_format(lines: list[str]) -> str | None:
    for pat, name in _TS_PATTERNS:
        if all(re.search(pat, ln) for ln in lines if ln.strip()):
            return name
    return None


def find_structure(sample: str, max_lines: int = 1000) -> dict:
    lines = [ln for ln in sample.splitlines() if ln.strip()][:max_lines]
    if not lines:
        raise ValueError("empty sample")

    # 1) NDJSON: every line parses as a JSON object
    try:
        objs = [json.loads(ln) for ln in lines]
        if all(isinstance(o, dict) for o in objs):
            cols = sorted({k for o in objs for k in o})
            ts = next((c for c in cols
                       if c in ("@timestamp", "timestamp", "time", "ts")),
                      None)
            return {"format": "ndjson", "column_names": cols,
                    "timestamp_field": ts,
                    "num_lines_analyzed": len(lines)}
    except (json.JSONDecodeError, ValueError):
        pass

    # 2) delimited: a delimiter splitting every line into the same
    #    number (>1) of fields
    for d in _DELIMITERS:
        counts = {ln.count(d) for ln in lines}
        if len(counts) == 1 and counts.pop() >= 1:
            rows = [ln.split(d) for ln in lines]
            width = len(rows[0])
            # header when first row is all-non-numeric but a later row
            # has numerics in the same columns
            body_numeric = any(
                any(_NUM.match(c.strip()) for c in r) for r in rows[1:])
            header = (not any(_NUM.match(c.strip()) for c in rows[0])
                      and body_numeric)
            names = ([c.strip() for c in rows[0]] if header else
                     [f"column{i + 1}" for i in range(width)])
            return {"format": "delimited", "delimiter": d,
                    "has_header_row": header, "column_names": names,
                    "timestamp_format": _timestamp_format(
                        lines[1:] if header else lines),
                    "num_lines_analyzed": len(lines)}

    # 3) semi-structured log: require a recognizable timestamp
    ts = _timestamp_format(lines)
    if ts is None:
        raise ValueError("unable to determine the structure of the sample")
    return {"format": "semi_structured_text", "timestamp_format": ts,
            "num_lines_analyzed": len(lines)}
