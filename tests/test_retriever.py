from __future__ import annotations

import pytest

from elasticsearch_spark.search.retriever import linear_fusion, rrf_fusion


def _hits(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_formula_hand_check(spark):
    # ranking A: 1,2,3 ; ranking B: 3,1 — RRF with constant 60:
    # doc1 = 1/61 + 1/62, doc3 = 1/63 + 1/61, doc2 = 1/62
    a = _hits(spark, [(1, 9.0), (2, 5.0), (3, 2.0)])
    b = _hits(spark, [(3, 0.9), (1, 0.4)])
    out = {r["doc_id"]: r["score"]
           for r in rrf_fusion([a, b], rank_constant=60).collect()}
    assert out[1] == pytest.approx(1 / 61 + 1 / 62)
    assert out[3] == pytest.approx(1 / 63 + 1 / 61)
    assert out[2] == pytest.approx(1 / 62)
    order = [r["doc_id"] for r in
             rrf_fusion([a, b], rank_constant=60).collect()]
    assert order == [1, 3, 2]


def test_rrf_window_caps_contribution(spark):
    a = _hits(spark, [(1, 9.0), (2, 5.0), (3, 2.0)])
    out = {r["doc_id"]: r["score"]
           for r in rrf_fusion([a], rank_constant=10,
                               window_size=2).collect()}
    assert set(out) == {1, 2}  # rank 3 falls outside the window


def test_rrf_tie_breaks_by_doc_id(spark):
    # equal scores rank by doc_id asc on both engines
    a = _hits(spark, [(7, 1.0), (4, 1.0)])
    out = rrf_fusion([a], rank_constant=0).collect()
    assert [(r["doc_id"], r["score"]) for r in out] == \
        [(4, 1.0), (7, pytest.approx(0.5))]


def test_linear_minmax_weighted(spark):
    a = _hits(spark, [(1, 10.0), (2, 0.0)])     # minmax: 1 -> 1.0, 2 -> 0.0
    b = _hits(spark, [(2, 3.0), (1, 1.0)])      # minmax: 2 -> 1.0, 1 -> 0.0
    out = {r["doc_id"]: r["score"]
           for r in linear_fusion([a, b], weights=[0.7, 0.3]).collect()}
    assert out[1] == pytest.approx(0.7)
    assert out[2] == pytest.approx(0.3)


def test_linear_minmax_degenerate_all_equal(spark):
    a = _hits(spark, [(1, 5.0), (2, 5.0)])
    out = {r["doc_id"]: r["score"]
           for r in linear_fusion([a], weights=[2.0]).collect()}
    assert out == {1: pytest.approx(2.0), 2: pytest.approx(2.0)}


def test_linear_l2_and_none_normalizers(spark):
    a = _hits(spark, [(1, 3.0), (2, 4.0)])
    out = {r["doc_id"]: r["score"]
           for r in linear_fusion([a], normalizers="l2_norm").collect()}
    assert out[1] == pytest.approx(0.6)
    assert out[2] == pytest.approx(0.8)
    raw = {r["doc_id"]: r["score"]
           for r in linear_fusion([a], normalizers="none").collect()}
    assert raw == {1: 3.0, 2: 4.0}


def test_fusion_arg_validation(spark):
    a = _hits(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        rrf_fusion([])
    with pytest.raises(ValueError):
        linear_fusion([a], weights=[1.0, 2.0])
    with pytest.raises(ValueError):
        linear_fusion([a], normalizers="zscore").collect()
