"""Corpus mixing (stratified_sample) + bigram-LM perplexity-proxy
scoring: determinism, up/downsampling, SQL-twin identity, LM sanity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_stratified_sample_deterministic_and_rates(spark, docs):
    from elasticsearch_spark.ops.dataset import stratified_sample

    rates = {"src0": 2.0, "src1": 0.5, "src2": 0.0}
    a = stratified_sample(docs, rates, seed="s1")
    b = stratified_sample(docs, rates, seed="s1")
    assert sorted(map(tuple, a.select("doc_id", "copy_id").collect())) == \
        sorted(map(tuple, b.select("doc_id", "copy_id").collect()))
    per = {r["source"]: r["n"] for r in
           a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == 2 * base["src0"]          # exact 2x upsample
    assert "src2" not in per                        # rate 0 drops all
    assert 0 < per.get("src1", 0) < base["src1"]    # strict downsample
    for s in per:                                   # default rate 1.0
        if s not in rates:
            assert per[s] == base[s]
    # growing the corpus never resamples old rows
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = stratified_sample(half, rates, seed="s1")
    kept_full = {tuple(r) for r in a.select("doc_id", "copy_id").collect()
                 if r["doc_id"] % 2 == 0}
    assert {tuple(r) for r in sub.select("doc_id", "copy_id").collect()} \
        == kept_full


def test_stratified_sample_sql_twin(spark, docs):
    import duckdb

    from elasticsearch_spark.ops.dataset import (
        stratified_sample, stratified_sample_sql)

    rates = {"src0": 1.7, "src1": 0.3}
    got = sorted(map(tuple, stratified_sample(docs, rates, seed="tw")
                     .select("doc_id", "copy_id").collect()))
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    want = sorted(map(tuple, duck.execute(
        "SELECT doc_id, copy_id FROM ("
        + stratified_sample_sql("documents", rates, seed="tw")
        + ")").fetchall()))
    assert got == want and got


def test_ngram_lm_scores_fluent_below_garble(spark):
    from elasticsearch_spark.ops.text import ngram_lm_score, ngram_lm_train

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
        + [(100 + i, "a stitch in time saves nine every time") for i in range(20)],
        "doc_id long, text string")
    bi, uni, v = ngram_lm_train(ref)
    cand = spark.createDataFrame(
        [(1, "the quick brown fox"),        # in-domain
         (2, "zq xv bleep fnord gargle"),   # out-of-domain garble
         (3, "x")],                         # no bigram -> NULL
        "doc_id long, text string")
    got = {r["doc_id"]: r["nll"] for r in
           ngram_lm_score(cand, bi, uni, v).collect()}
    assert got[1] < got[2]
    assert got.get(3) is None
    # hand-check one bigram prob: c("the quick")=20, c("the")=40, V counted
    p = (20 + 1) / (40 + 1 * v)
    assert got[1] < -math.log(p) + 5  # same order of magnitude


def test_ngram_lm_sql_twin(spark, docs):
    import duckdb

    from elasticsearch_spark.ops.text import (
        ngram_lm_score, ngram_lm_score_sql, ngram_lm_train)

    ref = docs.filter(F.col("lang") == "en")
    bi, uni, v = ngram_lm_train(ref)
    got = {r["doc_id"]: round(r["nll"], 6) for r in
           ngram_lm_score(docs.filter(F.col("lang") == "de"),
                          bi, uni, v).collect()}
    duck = duckdb.connect()
    duck.register("documents", docs.toPandas())
    want = {r[0]: round(r[1], 6) for r in duck.execute(
        "WITH " + ngram_lm_score_sql(
            "documents", ref_filter="lang = 'en'", doc_filter="lang = 'de'")
        + "SELECT doc_id, nll FROM scored_lm").fetchall()}
    assert got == want and got
