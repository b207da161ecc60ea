"""elasticsearch_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new engine (NOT a port) with the query capabilities of the
Elasticsearch reference (javanna/elasticsearch, ES 8.0.0-SNAPSHOT /
Lucene 8.9): analyzers -> per-partition sorted postings segments with
delta+VByte compression -> global term dictionary with df / field-length
statistics -> top-k Okapi BM25 (k1=1.2, b=0.75) with block-max-WAND
pruning — expressed as idiomatic PySpark DataFrame programs.

Layout (see SURVEY.md §7):
  analysis/   tokenizers + analyzers (vectorized pandas, Arrow-batched)
  index/      postings codec, index build, checkpoint/resume
  search/     BM25 scoring, query DSL -> DataFrame compiler
  aggs/       aggregation surface (ES aggs -> Spark groupBy/window)
  ops/        training-data pipeline ops (dedup, similarity, text)
  oracle/     pure-Python BM25 oracle for golden tests
"""

__version__ = "0.1.0"

from elasticsearch_spark.session import get_spark  # noqa: F401
