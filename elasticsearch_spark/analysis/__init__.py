from elasticsearch_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    analyze,
    analyze_batch,
)
