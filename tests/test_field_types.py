"""Round-4 field-type tail: wildcard field (ngram-accelerated),
sparse_vector script functions, annotated_text mapper, fingerprint
analyzer, script_fields fetch subphase."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.analysis import ANALYZERS, analyze
from elasticsearch_spark.ops import similarity
from elasticsearch_spark.search import wildcard_field as wf
from elasticsearch_spark.search.extras import script_fields

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


# ---- wildcard field ---------------------------------------------------

VALUES = [
    "src1-en-4", "src1-en-44", "src12-de-4", "alpha", "a", "",
    "src1-fr-9", "xsrc1-en-4x", "SRC1-EN-4", "s?c-lit",
]


@pytest.fixture(scope="module")
def wdocs(spark):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(VALUES)], "doc_id long, v string"
    ).cache()


@pytest.mark.parametrize("pattern", [
    "src1*", "*en-4", "src1-??-4", "*rc1*", "a", "*a*", "src1-en-4",
    "*", "?", "s\\?c*", "zzz*",
])
def test_wildcard_accelerated_equals_full_scan(spark, wdocs, pattern):
    postings = wf.wildcard_postings(wdocs, "v").cache()
    got = sorted(r["doc_id"] for r in
                 wf.wildcard_field_search(postings, wdocs, "v", pattern)
                 .collect())
    want = sorted(r["doc_id"] for r in
                  wdocs.where(F.col("v").rlike(wf.wildcard_regex(pattern)))
                  .collect())
    assert got == want


def test_wildcard_regex_anchoring():
    assert wf.wildcard_regex("a*b?c") == "^a.*b.c$"
    # non-alnum literals are escaped (the '.' must not match any char)
    assert wf.wildcard_regex("a.c") == "^a\\.c$"


def test_wildcard_candidates_prune(spark, wdocs):
    # the approximation must cut candidates, not just pass everything
    postings = wf.wildcard_postings(wdocs, "v")
    grams = wf.required_grams("src12*")
    cand = (postings.where(F.col("gram").isin(grams))
            .groupBy("doc_id").agg(F.count_distinct("gram").alias("n"))
            .where(F.col("n") == len(grams)))
    ids = {r["doc_id"] for r in cand.collect()}
    assert ids == {2}  # only "src12-de-4" contains both \x01sr..c12 grams


# ---- sparse_vector ----------------------------------------------------

@pytest.fixture(scope="module")
def sparse_df(spark):
    rows = [
        (0, {0: 1.0, 3: 2.0}),
        (1, {0: 2.0, 5: 1.0}),
        (2, {7: 4.0}),
        (3, {0: 1.0, 3: 2.0, 9: 0.5}),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, sparse map<int,double>").cache()


def _np_sparse(q, d, fn):
    keys = set(q) | set(d)
    x = np.array([q.get(k, 0.0) for k in keys])
    y = np.array([d.get(k, 0.0) for k in keys])
    if fn == "dot_product":
        return float(x @ y)
    if fn == "cosine":
        return float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))
    if fn == "l1norm":
        return float(np.abs(x - y).sum())
    return float(np.sqrt(((x - y) ** 2).sum()))


@pytest.mark.parametrize("fn", ["dot_product", "cosine", "l1norm", "l2norm"])
def test_sparse_score_matches_numpy(spark, sparse_df, fn):
    q = {0: 1.0, 3: 1.0, 11: 2.0}
    got = {r["vec_id"]: r["score"] for r in
           similarity.sparse_score_topk(sparse_df, q, fn=fn, k=10).collect()}
    data = {0: {0: 1.0, 3: 2.0}, 1: {0: 2.0, 5: 1.0}, 2: {7: 4.0},
            3: {0: 1.0, 3: 2.0, 9: 0.5}}
    for vid, d in data.items():
        assert got[vid] == pytest.approx(_np_sparse(q, d, fn), rel=1e-9)


def test_sparse_topk_ordering(spark, sparse_df):
    top = similarity.sparse_score_topk(
        sparse_df, {0: 1.0, 3: 1.0}, fn="cosine", k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 3]


# ---- annotated_text ---------------------------------------------------

def test_annotated_text_injects_at_anchor_position():
    toks = analyze("[New York](City&Big%20Apple) wins", "annotated_text")
    assert ("new", 0) in toks and ("york", 1) in toks
    assert ("City", 0) in toks and ("Big Apple", 0) in toks
    assert ("wins", 2) in toks


def test_annotated_text_plain_positions_unchanged():
    plain = analyze("one two three", "standard")
    ann = [t for t in analyze("one [two](X) three", "annotated_text")
           if t[0] != "X"]
    assert ann == plain


# ---- fingerprint analyzer --------------------------------------------

def test_fingerprint_analyzer_registry():
    assert analyze("B b a. c C", "fingerprint") == [("a b c", 0)]
    assert analyze("", "fingerprint") == []
    # oversized output emits nothing (FingerprintFilter semantics)
    long = " ".join(f"tok{i}" for i in range(200))
    assert analyze(long, "fingerprint") == []
    # matches the JVM-side ops.text fingerprint expression pre-hash
    assert ANALYZERS["fingerprint"]("Red blue RED")[0] == ["blue red"]


# ---- script_fields ----------------------------------------------------

def test_script_fields_expr(spark, docs):
    out = script_fields(
        docs.limit(5),
        {"chars_x2": "n_chars * 2", "src_up": F.upper("source")})
    rows = out.select("n_chars", "chars_x2", "source", "src_up").collect()
    for r in rows:
        assert r["chars_x2"] == r["n_chars"] * 2
        assert r["src_up"] == r["source"].upper()
