"""CCR segment-level following: follower == leader after each poll,
read-only while following, writable after unfollow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.corpus import generate_corpus
from elasticsearch_spark.index.builder import assign_doc_ids, build_index, load_index
from elasticsearch_spark.ops.ccr import follow, is_follower, poll_follow, unfollow
from elasticsearch_spark.search.bm25 import BM25Params
from elasticsearch_spark.search.executor import match_topk
from elasticsearch_spark.streaming.refresh import ingest_batch

EXACT = BM25Params(quantize_norms=False)


def _topk(idx, terms):
    return [(r["doc_id"], round(r["score"], 9)) for r in
            match_topk(idx, "content", terms, k=10, params=EXACT).collect()]


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    corpus = assign_doc_ids(
        generate_corpus(spark, 200, seed=13), ["repo", "path", "commit"]
    ).cache()
    base = corpus.where(F.col("doc_id") % 3 != 0)
    extra1 = corpus.where(F.col("doc_id") % 3 == 0).where(
        F.col("doc_id") % 2 == 0)
    extra2 = corpus.where(F.col("doc_id") % 3 == 0).where(
        F.col("doc_id") % 2 == 1)
    leader = str(tmp_path_factory.mktemp("leader"))
    follower = str(tmp_path_factory.mktemp("fol")) + "/f1"
    build_index(base, leader, fields={"content": "code"}, num_partitions=4,
                id_cols=None, input_snapshot="ccr")
    ingest_batch(extra1, leader, {"content": "code"}, 4, batch_id=1)
    return leader, follower, extra2


def test_follow_bootstrap_rank_identical(spark, dirs):
    leader, follower, _ = dirs
    meta = follow(spark, leader, follower)
    assert meta["synced_batches"] == [1]
    assert is_follower(follower)
    li, fi = load_index(spark, leader), load_index(spark, follower)
    for q in (["import"], ["return", "def"], ["public", "static"]):
        assert _topk(li, q) == _topk(fi, q)


def test_follower_refuses_writes_until_unfollow(spark, dirs):
    leader, follower, extra2 = dirs
    with pytest.raises(ValueError, match="read-only"):
        ingest_batch(extra2, follower, {"content": "code"}, 4, batch_id=9)
    with pytest.raises(ValueError):
        follow(spark, leader, follower)  # already an index


def test_poll_catches_up_new_leader_segment(spark, dirs):
    leader, follower, extra2 = dirs
    ingest_batch(extra2, leader, {"content": "code"}, 4, batch_id=2)
    meta = poll_follow(spark, follower)
    assert meta["synced_batches"] == [1, 2]
    li, fi = load_index(spark, leader), load_index(spark, follower)
    for q in (["import"], ["scan", "table"], ["read_buf_cfg"]):
        assert _topk(li, q) == _topk(fi, q)
    # idempotent re-poll
    assert poll_follow(spark, follower)["synced_batches"] == [1, 2]


def test_unfollow_promotes_to_writable(spark, dirs):
    leader, follower, extra2 = dirs
    unfollow(follower)
    assert not is_follower(follower)
    ingest_batch(extra2.limit(0), follower, {"content": "code"}, 4,
                 batch_id=99)  # empty batch, but the write path is open
    with pytest.raises(ValueError):
        unfollow(follower)
    with pytest.raises(ValueError):
        poll_follow(spark, follower)
