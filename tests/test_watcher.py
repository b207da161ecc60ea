"""Watcher: input search -> condition -> index-action alert rows
(x-pack/plugin/watcher semantics: compare/array_compare, some/all)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops.watcher import Watch, compare, execute_watch, run_watches


@pytest.fixture(scope="module")
def payload_fn(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 3), ("c", 25)], "bucket string, n int")
    return lambda s: df


def test_compare_ops(spark, payload_fn):
    df = payload_fn(spark)
    assert df.where(compare("n", "gte", 10)).count() == 2
    assert df.where(compare("n", "eq", 3)).count() == 1
    assert df.where(compare("bucket", "not_eq", "a")).count() == 2
    with pytest.raises(ValueError):
        compare("n", "between", 1)


def test_some_quantifier_fires_with_matching_rows(spark, payload_fn):
    w = Watch("w1", payload_fn, compare("n", "gte", 10), "some")
    got = execute_watch(spark, w).orderBy("bucket").collect()
    assert [(r["bucket"], r["n"], r["watch_id"]) for r in got] == [
        ("a", 10, "w1"), ("c", 25, "w1")]


def test_some_quantifier_empty_when_no_match(spark, payload_fn):
    w = Watch("w2", payload_fn, compare("n", "gt", 100), "some")
    assert execute_watch(spark, w).count() == 0


def test_all_quantifier(spark, payload_fn):
    met = Watch("w3", payload_fn, compare("n", "gte", 3), "all")
    assert execute_watch(spark, met).count() == 3
    # one failing row -> the WHOLE watch does not fire (array_compare all)
    notmet = Watch("w4", payload_fn, compare("n", "gte", 5), "all")
    assert execute_watch(spark, notmet).count() == 0


def test_all_quantifier_empty_payload_does_not_fire(spark):
    w = Watch("w5", lambda s: s.createDataFrame([], "bucket string, n int"),
              True, "all")
    assert execute_watch(spark, w).count() == 0


def test_never_and_always_conditions(spark, payload_fn):
    assert execute_watch(spark, Watch("w6", payload_fn, False)).count() == 0
    assert execute_watch(spark, Watch("w7", payload_fn, True)).count() == 3


def test_run_watches_unions_alerts(spark, payload_fn):
    got = run_watches(spark, [
        Watch("hot", payload_fn, compare("n", "gte", 25)),
        Watch("cold", payload_fn, compare("n", "lte", 3)),
    ]).orderBy("watch_id").collect()
    assert [(r["watch_id"], r["bucket"]) for r in got] == [
        ("cold", "b"), ("hot", "c")]
