from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from elasticsearch_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
