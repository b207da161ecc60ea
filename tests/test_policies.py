"""Engine-wide policy enforcement (SURVEY.md §7.3 hard parts).

  - No per-row Python UDFs anywhere in the engine (input_hint: pandas/
    Arrow-batched only) — enforced by scanning the source.
  - Plan shape: query-term predicates must reach the Parquet scan
    (PushedFilters), and the scorer shuffle must be a single exchange
    on part_id — regression guards for the physical plan.
"""

from __future__ import annotations

import os
import re

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "elasticsearch_spark")


def test_no_row_at_a_time_udfs():
    bad = []
    pat = re.compile(r"(?<!pandas_)\budf\s*\(|@F\.udf|functions\.udf\(")
    for root, _dirs, files in os.walk(PKG):
        for name in files:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            with open(path) as f:
                src = f.read()
            if pat.search(src):
                bad.append(path)
    assert not bad, f"row-at-a-time Python UDFs found in: {bad}"


def test_no_collect_in_hot_paths():
    """collect() is allowed only for driver-side statistics (term_dict /
    coll_stats / manifests / agg shells) — never over postings rows."""
    with open(os.path.join(PKG, "search", "executor.py")) as f:
        src = f.read()
    # the scorer path must not collect posting/doc frames
    for fn_src in re.split(r"\ndef ", src):
        if fn_src.startswith(("match_topk", "phrase_topk", "multi_term_topk")):
            assert ".collect()" not in fn_src, "collect() in a scorer path"


@pytest.fixture(scope="module")
def index(spark):
    import __spark_entry__ as e

    return e._doc_index(spark, "/root/testdata/sf0.001")


def test_term_filter_pushdown(spark, tmp_path):
    from elasticsearch_spark.index.builder import build_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk

    # an index at its OWN path: any handle sharing the entry-point
    # index's path would be substituted by the CacheManager with the
    # pinned InMemoryRelation (the cached fast path); pushdown must
    # hold on the uncached parquet path used at scale
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fresh = build_index(
        docs.select("doc_id", "text"), str(tmp_path / "pushdown_idx"),
        fields={"text": "ascii_word"}, num_partitions=4,
        input_snapshot="pushdown",
    )
    df = match_topk(fresh, "text", ["table", "scan"], k=10,
                     params=BM25Params(quantize_norms=False))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert re.search(r"In\(term, \[.*scan.*table.*\]\)|In\(term, \[.*table.*scan.*\]\)", plan), plan[:2000]
    # exactly one exchange feeds the scorer (the part_id shuffle)
    assert plan.count("Exchange hashpartitioning(part_id") == 1
    # column pruning: positions are not read by the match scorer
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "positions" not in m.group(1), m.group(1)


def test_phrase_prefix_single_pass(spark, tmp_path):
    """phrase_prefix must be ONE scan + ONE part_id exchange — round 1
    unioned up to 50 per-expansion phrase plans (50x scan + shuffle)."""
    from elasticsearch_spark.index.builder import build_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import phrase_prefix_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fresh = build_index(
        docs.select("doc_id", "text"), str(tmp_path / "ppidx"),
        fields={"text": "ascii_word"}, num_partitions=4,
        input_snapshot="pp",
    )
    df = phrase_prefix_topk(fresh, "text", ["key", "ord"], k=10,
                            params=BM25Params(quantize_norms=False))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(part_id") == 1, plan[:2000]
    assert plan.count("Scan parquet") == 1


def test_filter_query_pushdown(spark, tmp_path):
    import shutil

    from elasticsearch_spark.search.dsl import filter_query

    # read from a private copy: other tests .cache() the shared path and
    # the CacheManager would substitute this scan with InMemoryRelation
    path = str(tmp_path / "documents.parquet")
    shutil.copy("/root/testdata/sf0.001/documents.parquet", path)
    docs = spark.read.parquet(path)
    df = filter_query(docs, {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"range": {"n_chars": {"gte": 100}}},
    ]}}).select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(lang,en)" in plan
    assert "GreaterThanOrEqual(n_chars,100)" in plan
    # column pruning: the scan must not read `text`
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1), m.group(1) if m else plan[:500]
