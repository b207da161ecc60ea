"""flattened field type: JSON-object -> keyed pairs + query compilers
(FlattenedFieldMapper / FlattenedFieldParser semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search.flattened import (
    flattened, key_exists, keyed_prefix, keyed_term, keyed_terms_agg,
    keyed_value, root_term,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, '{"a": 1, "b": {"c": "x", "d": [2, 3]}}'),
        (2, '{"a": "x", "b": {"c": "y"}, "e": true}'),
        (3, '{"a": null, "b": {"c": "x"}}'),
        (4, None),
        (5, '{"arr": [{"k": "v1"}, {"k": "v2"}], "n": 2.5}'),
    ]
    df = spark.createDataFrame(rows, "id int, j string")
    return df.withColumn("f", flattened("j")).cache()


def test_leaf_paths_and_text_forms(docs):
    got = {r["id"]: [(p["key"], p["value"]) for p in (r["f"] or [])]
           for r in docs.collect()}
    assert got[1] == [("a", "1"), ("b.c", "x"), ("b.d", "2"), ("b.d", "3")]
    assert got[2] == [("a", "x"), ("b.c", "y"), ("e", "true")]
    assert got[3] == [("b.c", "x")]  # null leaf dropped without null_value
    assert got[4] == []  # NULL json -> NULL pairs -> empty list view
    assert got[5] == [("arr.k", "v1"), ("arr.k", "v2"), ("n", "2.5")]


def test_null_value_and_ignore_above(spark):
    df = spark.createDataFrame(
        [(1, '{"a": null, "b": "toolongvalue"}')], "id int, j string")
    pairs = df.select(flattened(
        "j", null_value="NULL", ignore_above=5).alias("f")).first()["f"]
    assert [(p["key"], p["value"]) for p in pairs] == [("a", "NULL")]


def test_depth_limit(spark):
    df = spark.createDataFrame([(1, '{"a": {"b": {"c": 1}}}')],
                               "id int, j string")
    with pytest.raises(Exception):
        df.select(flattened("j", depth_limit=1)).collect()


def test_query_compilers(docs):
    def ids(cond):
        return sorted(r["id"] for r in docs.where(cond).collect())

    assert ids(keyed_term("f", "b.c", "x")) == [1, 3]
    assert ids(root_term("f", "x")) == [1, 2, 3]  # a=x OR b.c=x
    assert ids(key_exists("f", "e")) == [2]
    assert ids(keyed_prefix("f", "arr.k", "v")) == [5]
    assert ids(keyed_term("f", "b.d", "3")) == [1]  # array element


def test_keyed_value_and_terms_agg(docs):
    vals = {r["id"]: r["v"] for r in docs.select(
        "id", keyed_value("f", "b.c").alias("v")).collect()}
    assert vals == {1: "x", 2: "y", 3: "x", 4: None, 5: None}
    agg = keyed_terms_agg(docs, "f", "b.c").collect()
    assert [(r["value"], r["doc_count"]) for r in agg] == [("x", 2), ("y", 1)]


def test_query_path_is_jvm_side(docs, spark, tmp_path):
    """Flattening is a one-time ingest pass; once the pair column is
    stored (parquet), every query compiles to a Catalyst higher-order
    function — no BatchEvalPython / ArrowEvalPython stage in the plan."""
    out = str(tmp_path / "flat")
    docs.select("id", "f").write.parquet(out)
    stored = spark.read.parquet(out)
    plan = stored.where(keyed_term("f", "b.c", "x"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
