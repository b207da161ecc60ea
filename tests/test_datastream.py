"""Data stream generations, rollover conditions, manifest-based
generation pruning, ILM retention."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops.datastream import DataStream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").cache()


def test_rollover_by_max_docs(spark, events):
    ds = DataStream(tempfile.mkdtemp(prefix="ds_"))
    chunk = events.limit(40)
    ds.append(chunk)
    assert not ds.rollover(max_docs=100)       # under the condition
    assert ds.meta()["generation"] == 1
    ds.append(chunk)
    assert ds.rollover(max_docs=50)            # 80 >= 50 -> roll
    assert ds.meta()["generation"] == 2
    assert not ds.rollover(max_docs=50)        # empty open gen: refuse
    ds.append(chunk)
    total = ds.read(spark).count()
    assert total == 120
    gens = dict(ds.read(spark).groupBy("_generation").count().collect())
    assert gens == {1: 80, 2: 40}


def test_generation_pruning_by_ts(spark, events):
    lo = events.orderBy("ts").limit(50)
    hi = events.orderBy(F.desc("ts")).limit(50)
    ds = DataStream(tempfile.mkdtemp(prefix="ds_"))
    ds.append(lo)
    ds.rollover(force=True)
    ds.append(hi)
    cut = events.agg(F.max("ts").cast("string")).first()[0]
    # a range that only the newest generation can satisfy must not
    # even list the old generation's files
    pruned = ds.read(spark, ts_from=cut)
    files = pruned.inputFiles()
    assert files and all("gen-000002" in f for f in files)
    assert pruned.count() >= 1


def test_retention_delete_keeps_open_generation(spark, events):
    ds = DataStream(tempfile.mkdtemp(prefix="ds_"))
    for _ in range(3):
        ds.append(events.limit(10))
        ds.rollover(force=True)
    ds.append(events.limit(5))
    dropped = ds.retention_delete(keep_last=1)
    assert dropped == [1, 2]
    left = ds.read(spark).groupBy("_generation").count().collect()
    assert {r["_generation"] for r in left} == {3, 4}
