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


def test_filtered_search_keeps_pruning_plan(spark, index):
    """bool{must: match, filter: ...} must push the filter INTO the
    scorer (WAND/theta pruning stays active), not run a k=None
    full-scoring pass followed by a semi-join. search() uses the
    cogroup strategy (single plan, no driver round-trip)."""
    from elasticsearch_spark.search.api import search
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = {"bool": {"must": [{"match": {"text": "query data"}}],
                  "filter": [{"term": {"lang": "en"}}]}}
    out = search(index, docs, q, k=10,
                 params=BM25Params(quantize_norms=False))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scored side must NOT be semi-joined against the filter
    assert "LeftSemi" not in plan, plan[:3000]
    # beyond the broadcast threshold the allowlist cogroups instead
    allowed = docs.filter(docs.lang == "en").select("doc_id")
    big = match_topk(index, "text", ["query", "data"], k=10,
                     params=BM25Params(quantize_norms=False),
                     allowed=allowed)
    plan2 = big._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan2, plan2[:3000]


def test_filtered_search_parity_with_fallback(spark, index):
    """Pushed-allowlist scoring must be row-identical to the unpruned
    score-everything + semi-join fallback, across operators and msm."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.search import dsl
    from elasticsearch_spark.search.api import _scored_df, search
    from elasticsearch_spark.search.bm25 import BM25Params

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    params = BM25Params(quantize_norms=False)
    cases = [
        {"bool": {"must": [{"match": {"text": "table scan merge"}}],
                  "filter": [{"range": {"n_chars": {"gte": 300}}}]}},
        {"bool": {"must": [{"match": {"text": {"query": "window filter",
                                               "operator": "and"}}}],
                  "filter": [{"term": {"lang": "fr"}}]}},
        {"bool": {"must": [{"match": {"text": {
                      "query": "table scan merge",
                      "minimum_should_match": 2}}}],
                  "filter": [{"term": {"lang": "en"}}]}},
        # zero-hit filter
        {"bool": {"must": [{"match": {"text": "table"}}],
                  "filter": [{"term": {"lang": "zz_nope"}}]}},
    ]
    for q in cases:
        got = [
            (r["doc_id"], r["s"])
            for r in search(index, docs, q, k=10, params=params)
            .select("doc_id", F.round("score", 6).alias("s")).collect()
        ]
        body = q["bool"]
        scores = _scored_df(
            index, {"bool": {"must": body["must"], "should": []}}, params)
        allowed = docs.filter(dsl.compile_filter(
            {"bool": {"filter": body["filter"], "must_not": []}}, "doc_id"
        )).select("doc_id")
        want = [
            (r["doc_id"], r["s"])
            for r in scores.join(allowed, "doc_id", "left_semi")
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10)
            .select("doc_id", F.round("score", 6).alias("s")).collect()
        ]
        assert got == want, q


def test_filtered_match_cogroup_strategy_parity(spark, index):
    """broadcast and cogroup allowlist strategies return identical
    rows."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    allowed = docs.filter(F.col("n_chars") >= 300).select("doc_id")
    params = BM25Params(quantize_norms=False)

    def rows(**kw):
        return [
            (r["doc_id"], r["s"])
            for r in match_topk(index, "text", ["table", "scan", "merge"],
                                k=10, params=params, allowed=allowed, **kw)
            .select("doc_id", F.round("score", 6).alias("s")).collect()
        ]

    assert rows(allowed_strategy="broadcast") == rows()
    assert rows(allowed_strategy="auto") == rows()


def test_term_stats_fallback_pushdown(spark, tmp_path):
    """When the term dictionary exceeds the driver cache budget, the
    per-query stats lookup must push In(term, ...) to the parquet scan
    (not scan the whole dictionary)."""
    from elasticsearch_spark.index.builder import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fresh = build_index(
        docs.select("doc_id", "text"), str(tmp_path / "ts_idx"),
        fields={"text": "ascii_word"}, num_partitions=2,
        input_snapshot="ts",
    )
    fresh._term_cache_state = "too_big"  # force the fallback path
    df = fresh._term_stats_scan("text", ["table", "scan"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan[:2000]
    rows = fresh.term_stats("text", ["table", "scan"])
    assert {r["term"] for r in rows} == {"table", "scan"}


def test_term_stats_cache_matches_scan(spark, tmp_path):
    """Tuple-backed cache rows must agree with the pushed-scan rows."""
    from elasticsearch_spark.index.builder import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fresh = build_index(
        docs.select("doc_id", "text"), str(tmp_path / "tc_idx"),
        fields={"text": "ascii_word"}, num_partitions=2,
        input_snapshot="tc",
    )
    cached = {r["term"]: (r["df"], r["cf"], r["max_tf"], r["min_dl"])
              for r in fresh.term_stats("text", ["table", "scan"])}
    assert fresh._term_cache_state == "cached"
    scanned = {r["term"]: (r["df"], r["cf"], r["max_tf"], r["min_dl"])
               for r in fresh._term_stats_scan("text", ["table", "scan"]).collect()}
    assert cached == scanned and cached


def test_disjunction_decomposition_parity(spark, index):
    """dis_max / multi_match best_fields at tie_breaker=0 decompose
    into per-leaf PRUNED top-k + max-combine; rows and scores must be
    identical to the k=None score-everything fallback, with and
    without a filter."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.search import dsl
    from elasticsearch_spark.search.api import (
        _max_disjunction_leaves, _scored_df, search,
    )
    from elasticsearch_spark.search.bm25 import BM25Params

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    params = BM25Params(quantize_norms=False)
    cases = [
        {"multi_match": {"query": "table scan merge",
                         "fields": ["text", "text_en"]}},
        {"dis_max": {"queries": [
            {"match": {"text": "window filter"}},
            {"match": {"text_en": {"query": "windows filtering",
                                   "boost": 1.5}}}]}},
        {"bool": {"must": [{"multi_match": {
                      "query": "table scan merge",
                      "fields": ["text", "text_en"]}}],
                  "filter": [{"range": {"n_chars": {"gte": 300}}}]}},
        {"bool": {"must": [{"dis_max": {"queries": [
                      {"match": {"text": "window filter"}},
                      {"match": {"text_en": "windows filtering"}}]}}],
                  "filter": [{"term": {"lang": "en"}}]}},
    ]
    for q in cases:
        got = [
            (r["doc_id"], r["s"])
            for r in search(index, docs, q, k=10, params=params)
            .select("doc_id", F.round("score", 6).alias("s")).collect()
        ]
        if next(iter(q)) == "bool":
            scored = {"bool": {"must": q["bool"]["must"], "should": []}}
            flt = dsl.compile_filter(
                {"bool": {"filter": q["bool"]["filter"], "must_not": []}},
                "doc_id")
            base = _scored_df(index, scored, params).join(
                docs.filter(flt).select("doc_id"), "doc_id", "left_semi")
        else:
            base = _scored_df(index, q, params)
        want = [
            (r["doc_id"], r["s"])
            for r in base.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(10).select("doc_id", F.round("score", 6).alias("s"))
            .collect()
        ]
        assert got == want, q
    # a nonzero tie_breaker must NOT decompose (scores need every leaf)
    assert _max_disjunction_leaves(
        {"dis_max": {"tie_breaker": 0.3, "queries":
                     [{"match": {"text": "a"}}]}}, True) is None
    assert _max_disjunction_leaves(
        {"multi_match": {"query": "a", "fields": ["text"],
                         "type": "most_fields"}}, True) is None


def test_filtered_disjunction_keeps_pruning_plan(spark, index):
    """A filtered multi_match must push the filter id set into every
    leaf scorer (cogroup), never semi-join after scoring everything."""
    from elasticsearch_spark.search.api import search
    from elasticsearch_spark.search.bm25 import BM25Params

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = {"bool": {"must": [{"multi_match": {
             "query": "query data", "fields": ["text", "text_en"]}}],
         "filter": [{"term": {"lang": "en"}}]}}
    out = search(index, docs, q, k=10,
                 params=BM25Params(quantize_norms=False))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan, plan[:3000]
    assert plan.count("FlatMapCoGroupsInPandas") >= 2, plan[:3000]
