"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Conventions used throughout so Spark and DuckDB hash-match:
  - every computed column is aliased identically on both sides;
  - floating-point aggregates are rounded to 4-6 decimals on both
    sides (both engines compute in float64 with the same formula);
  - full-text queries use the engine's inverted index with the
    ``ascii_word`` analyzer + exact-dl BM25 (quantize_norms=False),
    whose SQL twin is regexp_extract_all(lower(text),'[a-z0-9_]+') —
    Lucene-parity quantized scoring is gated separately in tests/
    (pure-Python oracle), since 1-byte SmallFloat norms are not
    reasonably expressible in ANSI SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_spark.analysis import analyze
from elasticsearch_spark.index.builder import InvertedIndex, build_index, load_index
from elasticsearch_spark.oracle.sql_oracle import bm25_topk_sql
from elasticsearch_spark.search.api import search
from elasticsearch_spark.search.bm25 import BM25Params
from elasticsearch_spark.search.dsl import filter_query
from elasticsearch_spark.search.executor import match_topk

_SCRATCH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scratch")
_EXACT = BM25Params(quantize_norms=False)
_INDEX_PARTS = 8


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_INDEX_CACHE: dict[str, InvertedIndex] = {}


def _doc_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """Inverted index over documents.text, built once per sf_dir."""
    key = os.path.abspath(sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = key.strip("/").replace("/", "_")
    path = os.path.join(_SCRATCH, f"docindex_{tag}")
    if not os.path.exists(os.path.join(path, "index_meta.json")):
        docs = _t(spark, sf_dir, "documents")
        build_index(
            docs.select("doc_id", "text"),
            path,
            fields={"text": "ascii_word"},
            num_partitions=_INDEX_PARTS,
            input_snapshot=key,
        )
    _INDEX_CACHE[key] = load_index(spark, path)
    return _INDEX_CACHE[key]


def _bm25(
    spark: SparkSession,
    sf_dir: str,
    text: str,
    k: int = 10,
    operator: str = "or",
    msm: int = 1,
) -> DataFrame:
    idx = _doc_index(spark, sf_dir)
    terms = [t for t, _ in analyze(text, "ascii_word")]
    out = match_topk(
        idx, "text", terms, k=k, operator=operator,
        minimum_should_match=msm, params=_EXACT,
    )
    return out.select("doc_id", F.round("score", 4).alias("score"))


def _bm25_oracle(text: str, k: int = 10, operator: str = "or", msm: int = 1) -> str:
    terms = [t for t, _ in analyze(text, "ascii_word")]
    return bm25_topk_sql(terms, k=k, operator=operator, minimum_should_match=msm)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 match top-10 over sf0.001 documents."""
    return _bm25(spark, "/root/testdata/sf0.001", "spark query data", k=10)


# ---------------------------------------------------------------------
# queries / oracles (SURVEY.md §2 inventory)
# ---------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- full-text scoring (match family) over the inverted index ---
    q["match_or"] = lambda s, d: _bm25(s, d, "spark query data")
    q["match_and"] = lambda s, d: _bm25(s, d, "table scan", operator="and")
    q["match_msm2"] = lambda s, d: _bm25(s, d, "window filter merge", msm=2)
    q["match_high_df"] = lambda s, d: _bm25(s, d, "table")
    q["match_zero_hits"] = lambda s, d: _bm25(s, d, "zzznoterm qqqmissing")
    q["match_k50"] = lambda s, d: _bm25(s, d, "stream batch", k=50)

    # --- scored query + filter context combined (bool) ---
    def bool_match_filter(s: SparkSession, d: str) -> DataFrame:
        idx = _doc_index(s, d)
        docs = _t(s, d, "documents")
        hits = search(
            idx, docs,
            {"bool": {
                "must": [{"match": {"text": "query data"}}],
                "filter": [
                    {"term": {"lang": "en"}},
                    {"range": {"n_chars": {"gte": 150}}},
                ],
            }},
            k=10, params=_EXACT,
        )
        return hits.select("doc_id", "lang", F.round("score", 4).alias("score"))

    q["bool_match_filter"] = bool_match_filter

    # --- filter-context queries (native Catalyst predicates) ---
    def _docs_filter(query: dict, cols: list[str]):
        def fn(s: SparkSession, d: str) -> DataFrame:
            return filter_query(_t(s, d, "documents"), query).select(*cols)
        return fn

    q["term_filter"] = _docs_filter({"term": {"lang": "fr"}}, ["doc_id", "lang"])
    q["terms_filter"] = _docs_filter(
        {"terms": {"lang": ["de", "zh"]}}, ["doc_id", "lang"]
    )
    q["range_filter"] = _docs_filter(
        {"range": {"n_chars": {"gte": 100, "lt": 300}}}, ["doc_id", "n_chars"]
    )
    q["prefix_filter"] = _docs_filter(
        {"prefix": {"source": "src1"}}, ["doc_id", "source"]
    )
    q["wildcard_filter"] = _docs_filter(
        {"wildcard": {"source": "src*5"}}, ["doc_id", "source"]
    )
    q["regexp_filter"] = _docs_filter(
        {"regexp": {"source": "src1[0-3]"}}, ["doc_id", "source"]
    )
    q["ids_filter"] = _docs_filter(
        {"ids": {"values": [1, 2, 3, 5, 8, 13, 21]}}, ["doc_id"]
    )
    q["fuzzy_filter"] = _docs_filter(
        {"fuzzy": {"lang": {"value": "eng", "fuzziness": 1}}}, ["doc_id", "lang"]
    )
    q["exists_filter"] = _docs_filter({"exists": {"field": "lang"}}, ["doc_id"])
    q["bool_filter"] = _docs_filter(
        {"bool": {
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
            "must_not": [{"term": {"lang": "zh"}}],
            "should": [{"term": {"lang": "en"}}, {"term": {"lang": "fr"}}],
            "minimum_should_match": 1,
        }},
        ["doc_id", "lang", "n_chars"],
    )

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["match_or"] = _bm25_oracle("spark query data")
    o["match_and"] = _bm25_oracle("table scan", operator="and")
    o["match_msm2"] = _bm25_oracle("window filter merge", msm=2)
    o["match_high_df"] = _bm25_oracle("table")
    o["match_zero_hits"] = _bm25_oracle("zzznoterm qqqmissing")
    o["match_k50"] = _bm25_oracle("stream batch", k=50)

    o["bool_match_filter"] = f"""
WITH cand AS ({bm25_topk_sql([t for t, _ in analyze('query data', 'ascii_word')], k=1000000)})
SELECT d.doc_id, d.lang, c.score
FROM cand c JOIN documents d ON c.doc_id = d.doc_id
WHERE d.lang = 'en' AND d.n_chars >= 150
ORDER BY c.score DESC, d.doc_id ASC
LIMIT 10
"""

    o["term_filter"] = "SELECT doc_id, lang FROM documents WHERE lang = 'fr'"
    o["terms_filter"] = (
        "SELECT doc_id, lang FROM documents WHERE lang IN ('de','zh')"
    )
    o["range_filter"] = (
        "SELECT doc_id, n_chars FROM documents WHERE n_chars >= 100 AND n_chars < 300"
    )
    o["prefix_filter"] = (
        "SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'"
    )
    o["wildcard_filter"] = (
        "SELECT doc_id, source FROM documents WHERE regexp_matches(source, '^src.*5$')"
    )
    o["regexp_filter"] = (
        "SELECT doc_id, source FROM documents WHERE regexp_matches(source, '^(?:src1[0-3])$')"
    )
    o["ids_filter"] = (
        "SELECT doc_id FROM documents WHERE doc_id IN (1,2,3,5,8,13,21)"
    )
    o["fuzzy_filter"] = (
        "SELECT doc_id, lang FROM documents WHERE levenshtein(lang, 'eng') <= 1"
    )
    o["exists_filter"] = "SELECT doc_id FROM documents WHERE lang IS NOT NULL"
    o["bool_filter"] = """
SELECT doc_id, lang, n_chars FROM documents
WHERE n_chars >= 100 AND NOT lang = 'zh'
  AND ((CASE WHEN lang='en' THEN 1 ELSE 0 END) + (CASE WHEN lang='fr' THEN 1 ELSE 0 END)) >= 1
"""
    return o
