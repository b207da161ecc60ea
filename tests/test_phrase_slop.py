"""match_phrase slop: sloppy phrase matching/scoring (Lucene
PhraseQuery slop semantics — offset-shifted positions fit a slop-wide
window; transposition costs 2; sloppyWeight 1/(1+matchLength))."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search.dsl import (
    compile_filter,
    sloppy_phrase_pred,
)
from elasticsearch_spark.search.executor import _sloppy_phrase_freq


def _adjacency_count(plists):
    cand = np.asarray(plists[0])
    for i, p in enumerate(plists[1:], start=1):
        cand = np.intersect1d(cand + 1, np.asarray(p), assume_unique=True)
        if cand.size == 0:
            return 0
    return int(cand.size)


def test_sloppy_freq_slop0_equals_adjacency_count():
    rng = np.random.default_rng(42)
    for _ in range(300):
        n_terms = int(rng.integers(2, 5))
        plists = []
        for _t in range(n_terms):
            size = int(rng.integers(1, 8))
            plists.append(np.unique(rng.integers(0, 20, size=size)))
        got = _sloppy_phrase_freq(plists, 0)
        assert got == float(_adjacency_count(plists)), plists


def test_sloppy_freq_windows_and_weights():
    # transposed two-term phrase: window 2 -> matches at slop 2 with
    # weight 1/3, not at slop 1
    assert _sloppy_phrase_freq([np.array([1]), np.array([0])], 1) == 0.0
    assert _sloppy_phrase_freq([np.array([1]), np.array([0])], 2) == \
        pytest.approx(1.0 / 3.0)
    # one-gap in-order phrase: window 1 -> slop 1, weight 1/2
    assert _sloppy_phrase_freq([np.array([0]), np.array([2])], 0) == 0.0
    assert _sloppy_phrase_freq([np.array([0]), np.array([2])], 1) == \
        pytest.approx(0.5)
    # exact adjacency keeps weight 1.0 even at higher slop
    assert _sloppy_phrase_freq([np.array([0]), np.array([1])], 3) >= 1.0
    # empty list -> 0
    assert _sloppy_phrase_freq([np.array([0]), np.array([])], 5) == 0.0


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "fast table scan"),          # adjacent
            (2, "fast and slow table"),      # gap 2, in order
            (3, "table fast"),               # transposed (cost 2)
            (4, "fast"),                     # missing term
            (5, None),                       # NULL field
            (6, "fast big table big fast table"),  # multiple windows
        ],
        "doc_id long, text string",
    )


def _match_ids(docs, slop):
    q = {"match_phrase": {"text": {"query": "fast table", "slop": slop}}}
    return sorted(r["doc_id"]
                  for r in docs.filter(compile_filter(q)).collect())


def test_filter_context_slop_windows(docs):
    assert _match_ids(docs, 0) == [1, 6]
    assert _match_ids(docs, 1) == [1, 6]
    assert _match_ids(docs, 2) == [1, 2, 3, 6]
    # monotone in slop
    prev: list = []
    for s in range(4):
        cur = _match_ids(docs, s)
        assert set(prev) <= set(cur)
        prev = cur


def test_filter_context_three_terms_and_dup_terms(spark):
    d = spark.createDataFrame(
        [(1, "a x b c"), (2, "c b a"), (3, "a b"), (4, "big"),
         (5, "big big")],
        "doc_id long, text string")
    q3 = {"match_phrase": {"text": {"query": "a b c", "slop": 1}}}
    assert sorted(r["doc_id"] for r in d.filter(compile_filter(q3))
                  .collect()) == [1]
    # full reversal of 3 terms: shifted window = 4
    q3r = {"match_phrase": {"text": {"query": "a b c", "slop": 4}}}
    assert 2 in {r["doc_id"] for r in d.filter(compile_filter(q3r))
                 .collect()}
    # repeated phrase terms need DISTINCT positions
    toks = F.regexp_extract_all(F.lower(F.col("text")),
                                F.lit("[a-z0-9_]+"), 0)
    dup = d.filter(sloppy_phrase_pred(toks, ["big", "big"], 1))
    assert sorted(r["doc_id"] for r in dup.collect()) == [5]


def test_phrase_topk_slop_superset_and_scoring(spark, tmp_path):
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import phrase_topk

    corpus = generate_corpus(spark, 150, seed=13)
    idx = build_index(corpus, str(tmp_path / "slopidx"),
                      fields={"content": "code"}, num_partitions=2,
                      id_cols=["repo", "path", "commit"],
                      input_snapshot="v1")
    p = BM25Params(quantize_norms=False)
    exact = {r["doc_id"]: r["score"]
             for r in phrase_topk(idx, "content", ["import", "return"],
                                  k=None, params=p).collect()}
    sloppy = {r["doc_id"]: r["score"]
              for r in phrase_topk(idx, "content", ["import", "return"],
                                   k=None, params=p, slop=4).collect()}
    assert set(exact) <= set(sloppy)
    # sloppy freq >= exact freq per doc -> monotone scores
    for d, s in exact.items():
        assert sloppy[d] >= s - 1e-9
    with pytest.raises(ValueError, match="repeated"):
        phrase_topk(idx, "content", ["import", "import"], slop=1)


def test_percolator_verify_slop_phrase(spark, docs):
    from elasticsearch_spark.search.percolate import (
        percolate,
        percolate_verified,
    )

    stored = [(1, {"match_phrase": {"text": {"query": "fast table",
                                             "slop": 2}}}),
              (2, {"match_phrase": {"text": "fast table"}})]
    # slop>0 refuses on the fast path...
    with pytest.raises(ValueError, match="slop"):
        percolate(spark, docs, [stored[0]], text_fields=["text"])
    # ...and routes through verify, agreeing with the filter context
    out = percolate_verified(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (2, 1), (3, 1), (6, 1), (6, 2)]
