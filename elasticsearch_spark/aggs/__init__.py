from elasticsearch_spark.aggs.translate import aggregate, pipeline_agg  # noqa: F401
