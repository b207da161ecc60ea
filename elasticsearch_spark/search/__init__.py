from elasticsearch_spark.search.bm25 import BM25Params  # noqa: F401
