"""search_as_you_type (mapper-extras SearchAsYouTypeFieldMapper):
an edge-ngram-indexed subfield turns prefix search into an exact TERM
lookup (the 100-TB path: no term-dict scan at query time), and
match_bool_prefix is the query-side path over the plain field."""

from __future__ import annotations

from elasticsearch_spark.index.builder import build_index
from elasticsearch_spark.search.bm25 import BM25Params
from elasticsearch_spark.search.executor import (
    match_bool_prefix_topk,
    match_topk,
)

EXACT = BM25Params(quantize_norms=False)


def test_edge_ngram_indexed_prefix_lookup(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "parse index buffer"),
            (2, "partial indexes"),
            (3, "nothing here"),
        ],
        "doc_id long, title string",
    )
    idx = build_index(
        docs.withColumn("title_sayt", docs.title),
        str(tmp_path / "sayt"),
        fields={"title": "ascii_word", "title_sayt": "edge_ngram"},
        num_partitions=1, input_snapshot="v1",
    )
    # typing "par" -> exact term hit on the edge-ngram subfield
    hits = match_topk(idx, "title_sayt", ["par"], k=5, params=EXACT).collect()
    assert {r["doc_id"] for r in hits} == {1, 2}
    hits = match_topk(idx, "title_sayt", ["parse"], k=5, params=EXACT).collect()
    assert {r["doc_id"] for r in hits} == {1}


def test_match_bool_prefix(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "quick brown fox"),
            (2, "quick brawl"),
            (3, "brown bear"),
        ],
        "doc_id long, body string",
    )
    idx = build_index(docs, str(tmp_path / "mbp"),
                      fields={"body": "ascii_word"}, num_partitions=1,
                      input_snapshot="v1")
    hits = match_bool_prefix_topk(idx, "body", ["quick", "bro"], k=5,
                                  params=EXACT).collect()
    by_id = {r["doc_id"]: r for r in hits}
    # doc1 matches the term AND the prefix (2 clauses); doc2 term only;
    # doc3 prefix only (score exactly 1.0, the constant-score rewrite)
    assert set(by_id) == {1, 2, 3}
    assert by_id[1]["matched"] == 2
    assert by_id[3]["score"] == 1.0
    assert by_id[1]["score"] > by_id[2]["score"]
