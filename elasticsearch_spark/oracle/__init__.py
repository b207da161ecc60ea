from elasticsearch_spark.oracle.bm25_oracle import oracle_topk  # noqa: F401
