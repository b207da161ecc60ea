"""more_like_this / suggest / collapse / search_after / rescore /
highlight / explain / significant_text over the sf0.001 documents index."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search import extras
from elasticsearch_spark.search.bm25 import BM25Params
from elasticsearch_spark.search.executor import match_topk

SF = "/root/testdata/sf0.001"
EXACT = BM25Params(quantize_norms=False)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def index(spark, docs):
    import __spark_entry__ as e

    return e._doc_index(spark, SF)


def test_more_like_this(index, docs):
    out = extras.more_like_this(index, docs, like_id=0, k=5, params=EXACT).collect()
    assert 0 < len(out) <= 5
    assert all(r["doc_id"] != 0 for r in out)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_term_suggest(index):
    out = extras.term_suggest(index, "text", "tabel").collect()
    assert out, "expected suggestions for misspelled 'tabel'"
    assert out[0]["term"] == "table"
    assert out[0]["distance"] <= 2


def test_collapse(index, docs):
    scored = match_topk(index, "text", ["table", "scan"], k=None, params=EXACT)
    out = extras.collapse_topk(scored, docs, "lang", k=10).collect()
    langs = [r["lang"] for r in out]
    assert len(langs) == len(set(langs))  # one hit per key
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_search_after_pagination(index):
    full = match_topk(index, "text", ["table"], k=20, params=EXACT).collect()
    page1 = full[:5]
    after = page1[-1]
    page2 = extras.search_after(
        match_topk(index, "text", ["table"], k=None, params=EXACT),
        after["score"], after["doc_id"], k=5,
    ).collect()
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in full[5:10]]


def test_rescore(index):
    base = match_topk(index, "text", ["table"], k=None, params=EXACT)
    out = extras.rescore(
        index, base, ["scan"], window_size=10, rescore_query_weight=2.0,
        k=5, params=EXACT,
    ).collect()
    assert len(out) == 5
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_highlight(index, docs):
    topk = match_topk(index, "text", ["table"], k=3, params=EXACT)
    hits = docs.join(F.broadcast(topk), "doc_id")
    out = extras.highlight(hits, ["table"], n_fragments=2).collect()
    assert len(out) == 3
    for r in out:
        assert r["highlights"]
        assert "<em>" in r["highlights"][0]


def test_explain_matches_scores(index):
    topk = match_topk(index, "text", ["table", "scan"], k=3, params=EXACT).collect()
    ids = [r["doc_id"] for r in topk]
    ex = extras.explain_scores(index, "text", ["table", "scan"], ids, params=EXACT)
    by_doc = {}
    for r in ex.collect():
        by_doc.setdefault(r["doc_id"], 0.0)
        by_doc[r["doc_id"]] += r["contribution"]
    for r in topk:
        assert math.isclose(by_doc[r["doc_id"]], r["score"], rel_tol=1e-9)


def test_significant_text(docs):
    out = extras.significant_text(
        docs, F.col("lang") == "en", size=5, min_doc_count=2
    ).collect()
    assert out
    assert all(r["jlh"] > 0 for r in out)
    jlhs = [r["jlh"] for r in out]
    assert jlhs == sorted(jlhs, reverse=True)


def test_geo_distance(spark):
    import math

    from elasticsearch_spark.search.geo import geo_distance

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 52.52, 13.405), (4, 48.8566, 2.3522)],
        "doc_id long, lat double, lon double",
    )
    out = {r["doc_id"]: r["distance_km"]
           for r in geo_distance(df, origin=(0.0, 0.0), sort=False).collect()}
    assert out[1] == 0.0
    # one degree of longitude at the equator ~= 111.19 km
    assert math.isclose(out[2], 111.19, rel_tol=1e-3)
    # Berlin->origin vs Paris->origin sanity: Paris is closer to (0,0)
    assert out[4] < out[3]
    near = geo_distance(df, origin=(0.0, 0.0), distance_km=200.0, k=10).collect()
    assert [r["doc_id"] for r in near] == [1, 2]


def test_phrase_suggest_index_path_matches_text_path(index, docs):
    """The index-backed suggester (term_dict.cf unigrams + persisted
    posting-position bigrams) must reproduce the raw-text path exactly
    — same candidates, same stupid-backoff scores."""
    legacy = extras.phrase_suggest(docs, "dat san", size=3).collect()
    backed = extras.phrase_suggest(
        docs, "dat san", size=3, index=index, field="text"
    ).collect()
    assert [(r["text"], r["score"]) for r in backed] == \
           [(r["text"], r["score"]) for r in legacy]
    assert backed, "expected suggestions"


def test_bigram_stats_cached_until_index_changes(index, tmp_path):
    """ensure_bigram_stats builds once per index generation: a second
    call must read the persisted table, not rebuild (same mtime)."""
    import os

    extras.ensure_bigram_stats(index, "text")
    meta = os.path.join(index.path, "bigrams_text", "_stats_meta.json")
    m1 = os.path.getmtime(meta)
    extras.ensure_bigram_stats(index, "text")
    assert os.path.getmtime(meta) == m1


def test_highlight_multi_fragment_options(spark):
    from elasticsearch_spark.search import extras

    text = ("alpha table beta " + "x" * 80 + " gamma table delta table end "
            + "y" * 80 + " table last")
    hits = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = extras.highlight(
        hits, ["table"], fragment_size=30, n_fragments=3,
        pre_tag="[", post_tag="]").collect()[0]["highlights"]
    assert len(out) == 3
    # every fragment tags its matches; nearby matches share a passage
    assert all("[table]" in f for f in out)
    assert "[table] delta [table]" in out[1]
    # order=score puts the 2-match passage first (stable ties)
    scored = extras.highlight(
        hits, ["table"], fragment_size=30, n_fragments=1,
        pre_tag="[", post_tag="]", order="score").collect()[0]["highlights"]
    assert scored[0].count("[table]") == 2
    # custom tags + fragment budget respected
    one = extras.highlight(
        hits, ["table"], fragment_size=10, n_fragments=1).collect()[0]
    assert len(one["highlights"]) == 1 and "<em>table</em>" in one["highlights"][0]
