"""Dynamic mapping inference.

Reference: index/mapper/DynamicFieldsBuilder.java +
RootObjectMapper's date_detection / dynamic_templates — when a
document arrives with unmapped fields, ES infers a mapping: numbers ->
long/double, booleans -> boolean, parseable date strings -> date, and
other strings -> text with a ``keyword`` multi-field.

Spark-first shape: the DataFrame ALREADY carries a typed schema, so
inference is metadata-only (no data pass) except optional ES-style
date detection on string columns, which samples a bounded number of
rows once. dynamic_templates match on field NAME patterns
(``match``/``unmatch`` globs) or on the inferred JSON type
(``match_mapping_type``), first template wins — the reference's
resolution order.
"""

from __future__ import annotations

import re
from fnmatch import fnmatch

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ES's default date detection formats: strict_date_optional_time
# (ISO8601 date, optional time) — DynamicFieldsBuilder tries the
# configured dynamic_date_formats before falling back to text.
_ISO_DATE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
    r"(Z|[+-]\d{2}:?\d{2})?)?$")

_SCALARS = {
    T.LongType: "long",
    T.IntegerType: "integer",
    T.ShortType: "short",
    T.ByteType: "byte",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.TimestampType: "date",
    T.DateType: "date",
    T.BinaryType: "binary",
    T.DecimalType: "scaled_float",
}

# the JSON-level type a Spark type corresponds to, for
# match_mapping_type (the reference matches on the JSON parser's type)
_JSON_TYPE = {
    "long": "long", "integer": "long", "short": "long", "byte": "long",
    "double": "double", "float": "double", "scaled_float": "double",
    "boolean": "boolean", "date": "date", "binary": "binary",
}


def _default_string() -> dict:
    return {"type": "text",
            "fields": {"keyword": {"type": "keyword",
                                   "ignore_above": 256}}}


def _apply_templates(name: str, json_type: str,
                     templates: list[dict] | None) -> dict | None:
    for entry in templates or []:
        # {"template_name": {"match": ..., "mapping": {...}}}
        (_, t), = entry.items()
        if "match" in t and not fnmatch(name, t["match"]):
            continue
        if "unmatch" in t and fnmatch(name, t["unmatch"]):
            continue
        if ("match_mapping_type" in t
                and t["match_mapping_type"] not in ("*", json_type)):
            continue
        return dict(t["mapping"])
    return None


def infer_mappings(
    df: DataFrame,
    date_detection: bool = True,
    dynamic_templates: list[dict] | None = None,
    sample_rows: int = 100,
) -> dict:
    """Infer an ES-style mapping for every column. Returns
    ``{"properties": {...}}``. String columns whose sampled non-null
    values ALL parse as ISO dates map to ``date`` (ES date_detection);
    the sample is bounded (``limit(sample_rows)``, driver-safe)."""
    date_strings: set[str] = set()
    if date_detection:
        str_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType, T.StringType)]
        if str_cols:
            sample = df.select(*str_cols).limit(int(sample_rows)).collect()
            for c in str_cols:
                vals = [r[c] for r in sample if r[c] is not None]
                if vals and all(_ISO_DATE.match(v) for v in vals):
                    date_strings.add(c)

    def field_mapping(name: str, dt: T.DataType) -> dict:
        if isinstance(dt, T.ArrayType):
            # ES arrays are implicit: the mapping is the element's
            return field_mapping(name, dt.elementType)
        if isinstance(dt, T.StructType):
            return {"type": "object",
                    "properties": {f.name: field_mapping(f.name, f.dataType)
                                   for f in dt.fields}}
        if isinstance(dt, T.MapType):
            return {"type": "flattened"}
        for klass, es in _SCALARS.items():
            if isinstance(dt, klass):
                base = {"type": es}
                break
        else:
            base = ({"type": "date"} if name in date_strings
                    else _default_string())
        json_type = ("date" if name in date_strings
                     else _JSON_TYPE.get(base["type"], "string"))
        return _apply_templates(name, json_type, dynamic_templates) or base

    return {"properties": {f.name: field_mapping(f.name, f.dataType)
                           for f in df.schema.fields}}
