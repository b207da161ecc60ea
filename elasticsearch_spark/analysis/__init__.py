from elasticsearch_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    analyze,
    analyze_batch,
)
import elasticsearch_spark.analysis.filters  # noqa: F401,E402  (registers extras)
import elasticsearch_spark.analysis.annotated  # noqa: F401,E402  (registers annotated_text)
