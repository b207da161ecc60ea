"""Span algebra (SearchModule.java:788-798) + intervals sources."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_spark.search.spans import (
    eval_span,
    intervals_to_span,
    span_match,
    span_terms,
)

POS = {
    ("f", "a"): np.array([0, 5]),
    ("f", "b"): np.array([2, 9]),
    ("f", "c"): np.array([1]),
}


def _near(clauses, slop, in_order=True):
    return {"span_near": {"clauses": clauses, "slop": slop,
                           "in_order": in_order}}


def _t(t):
    return {"span_term": {"f": t}}


def test_span_near_ordered_slop():
    assert eval_span(_near([_t("a"), _t("b")], 1), POS) == [(0, 2, 3)]
    assert eval_span(_near([_t("a"), _t("b")], 0), POS) == []
    # slop 4 admits (5,9) too
    assert eval_span(_near([_t("a"), _t("b")], 4), POS) == [(0, 2, 3), (5, 9, 5)]


def test_span_near_unordered():
    assert eval_span(_near([_t("b"), _t("a")], 1, in_order=False), POS) == [
        (0, 2, 3)
    ]
    assert eval_span(_near([_t("b"), _t("a")], 1, in_order=True), POS) == []


def test_span_or_not_first_within():
    assert eval_span({"span_or": {"clauses": [_t("a"), _t("c")]}}, POS) == [
        (0, 0, 1), (1, 1, 1), (5, 5, 1)
    ]
    snot = {"span_not": {"include": _t("a"),
                          "exclude": _near([_t("a"), _t("c")], 0)}}
    assert eval_span(snot, POS) == [(5, 5, 1)]
    sf = {"span_first": {"match": _t("b"), "end": 3}}
    assert eval_span(sf, POS) == [(2, 2, 1)]
    within = {"span_within": {"little": _t("c"),
                               "big": _near([_t("a"), _t("b")], 1)}}
    assert eval_span(within, POS) == [(1, 1, 1)]
    containing = {"span_containing": {"little": _t("c"),
                                        "big": _near([_t("a"), _t("b")], 1)}}
    assert eval_span(containing, POS) == [(0, 2, 3)]


def test_nested_span_near_slop_accounting():
    # inner near occupies its full width when nested
    inner = _near([_t("a"), _t("c")], 0)          # (0,1,2)
    outer = _near([inner, _t("b")], 0)            # b@2 adjacent -> width 3
    assert eval_span(outer, POS) == [(0, 2, 3)]
    assert eval_span(_near([inner, _t("b")], 0), {
        "a": np.array([0]), "c": np.array([1]), "b": np.array([4]),
    }) == []  # gap 2 > slop 0


def test_intervals_compilation_and_terms():
    tree = intervals_to_span({"all_of": {"intervals": [
        {"match": {"query": "a"}},
        {"any_of": {"intervals": [{"match": {"query": "b"}},
                                     {"match": {"query": "c"}}]}},
    ], "max_gaps": 1, "ordered": True}})
    from elasticsearch_spark.search.spans import _bind_field

    tree = _bind_field(tree, "f")
    assert sorted(span_terms(tree)) == ["a", "b", "c"]
    assert eval_span(tree, POS) == [(0, 1, 2), (0, 2, 3)]


def test_span_near_zero_slop_equals_phrase(spark, tmp_path):
    """span_near(slop=0, in_order) matches exactly the phrase docs."""
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import phrase_topk

    corpus = generate_corpus(spark, 150, seed=13)
    idx = build_index(corpus, str(tmp_path / "spanidx"),
                      fields={"content": "code"}, num_partitions=2,
                      id_cols=["repo", "path", "commit"], input_snapshot="v1")
    ph = phrase_topk(idx, "content", ["import", "return"], k=None,
                     params=BM25Params(quantize_norms=False)).collect()
    sp = span_match(idx, "content", _near(
        [{"span_term": {"content": "import"}},
         {"span_term": {"content": "return"}}], 0), k=None).collect()
    assert {r["doc_id"] for r in ph} == {r["doc_id"] for r in sp}
