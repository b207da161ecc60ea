"""flattened field type — whole-JSON-object indexing.

Reference: server/src/main/java/org/elasticsearch/index/mapper/
flattened/FlattenedFieldMapper.java and FlattenedFieldParser.java:30
(SEPARATOR = '\\0'): the mapper walks a JSON object and indexes every
leaf twice — once under the ROOT field name (so a term query on the
root matches any leaf value anywhere in the object) and once as
"path\\0value" under the ``.keyed`` sub-field (so term/prefix/exists
address one dotted leaf path), honoring ``depth_limit`` /
``ignore_above`` / ``null_value``.

Spark-first re-expression: ONE vectorized Arrow pass at ingest turns
the JSON string into a sorted ``array<struct<key,value>>`` pair column
(the exact keyed term stream the reference emits, '.' joining paths
instead of '\\0'), and every query kind compiles to a JVM-side
higher-order function over the pairs — no Python in the query path:

  - keyed term      exists(pairs, p -> p.key = k AND p.value = v)
  - root term       exists(pairs, p -> p.value = v)
  - exists(key)     exists(pairs, p -> p.key = k)
  - keyed prefix    exists(pairs, p -> p.key = k AND startswith(...))
  - terms agg       explode + filter key + groupBy value

Arrays of scalars produce one pair per element (multi-valued keys),
exactly like the reference's one-term-per-leaf indexing — which is why
the canonical shape is a pair array, not ``map<string,string>``.

At 100 TB the flatten pass runs once at write time and the pair column
is stored columnar; the higher-order predicates stay inside
whole-stage codegen, and a hot keyed lookup can additionally be
materialized as its own keyword column (generated column) for
dictionary-encoded pruning.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

PAIR_TYPE = "array<struct<key:string,value:string>>"


def _leaf_text(v) -> str:
    """The parser-text form of a JSON leaf (what the reference indexes
    and what SQL json_extract_string returns): bools lowercase, numbers
    via their JSON literal, strings verbatim."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        # round-trip integers parsed as float keep the JSON int form
        return str(int(v))
    return str(v)


def flattened(
    json_col: Column | str,
    depth_limit: int = 20,
    ignore_above: int | None = None,
    null_value: str | None = None,
) -> Column:
    """Parse a JSON-object string column into the sorted keyed pair
    array (the ingest-time half of the mapper). Vectorized: one Arrow
    batch in, one list column out."""

    @pandas_udf(PAIR_TYPE)
    def _flatten(s: pd.Series) -> pd.Series:
        def walk(obj: dict, path: str, out: list, depth: int) -> None:
            if depth > depth_limit:
                raise ValueError(
                    f"flattened: depth_limit {depth_limit} exceeded")
            for k, v in obj.items():
                p = f"{path}.{k}" if path else k
                if isinstance(v, dict):
                    walk(v, p, out, depth + 1)
                elif isinstance(v, list):
                    for item in v:
                        if isinstance(item, dict):
                            walk(item, p, out, depth + 1)
                        else:
                            put(p, item, out)
                else:
                    put(p, v, out)

        def put(p: str, v, out: list) -> None:
            if v is None:
                if null_value is None:
                    return
                text = null_value
            else:
                text = _leaf_text(v)
            if ignore_above is not None and len(text) > ignore_above:
                return
            out.append({"key": p, "value": text})

        res = []
        for raw in s:
            if raw is None:
                res.append(None)
                continue
            obj = json.loads(raw)
            if not isinstance(obj, dict):
                raise ValueError("flattened: value is not a JSON object")
            pairs: list = []
            walk(obj, "", pairs, 0)
            pairs.sort(key=lambda d: (d["key"], d["value"]))
            res.append(pairs)
        return pd.Series(res)

    col = F.col(json_col) if isinstance(json_col, str) else json_col
    return _flatten(col)


# ---- query-side compilers (pure Catalyst, no Python) -----------------


def keyed_term(pairs: Column | str, key: str, value: str) -> Column:
    """term on field.key (KeyedFlattenedLeafFieldData semantics)."""
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    return F.exists(
        c, lambda p: (p["key"] == F.lit(key)) & (p["value"] == F.lit(value))
    )


def root_term(pairs: Column | str, value: str) -> Column:
    """term on the root field: any leaf value anywhere matches."""
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    return F.exists(c, lambda p: p["value"] == F.lit(value))


def key_exists(pairs: Column | str, key: str) -> Column:
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    return F.exists(c, lambda p: p["key"] == F.lit(key))


def keyed_prefix(pairs: Column | str, key: str, prefix: str) -> Column:
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    return F.exists(
        c,
        lambda p: (p["key"] == F.lit(key))
        & p["value"].startswith(prefix),
    )


def keyed_value(pairs: Column | str, key: str) -> Column:
    """First value for a leaf path (doc-values read for sort/agg; the
    reference's keyed doc values are SORTED_SET, first = minimum —
    pairs are sorted (key, value), so element 1 of the filter is it)."""
    c = F.col(pairs) if isinstance(pairs, str) else pairs
    return F.try_element_at(
        F.filter(c, lambda p: p["key"] == F.lit(key)), F.lit(1)
    )["value"]


def keyed_terms_agg(
    df: DataFrame, pairs_col: str, key: str, size: int = 10
) -> DataFrame:
    """terms aggregation on field.key: keep the addressed path's pairs,
    dedupe within the doc (the reference's keyed doc values are a
    SORTED_SET — one count per doc per distinct value), explode, then
    partial/final count per leaf value."""
    return (
        df.select(F.explode(F.array_distinct(F.filter(
            F.col(pairs_col), lambda p: p["key"] == F.lit(key)
        ))).alias("p"))
        .groupBy(F.col("p.value").alias("value"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("value"))
        .limit(size)
    )
