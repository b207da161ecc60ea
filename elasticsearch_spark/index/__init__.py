from elasticsearch_spark.index.builder import InvertedIndex, build_index, load_index  # noqa: F401
