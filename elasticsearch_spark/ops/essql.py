"""ES SQL endpoint (x-pack/plugin/sql).

The reference ships a full SQL dialect that it TRANSLATES into search
requests (x-pack/plugin/sql/src/main/java/org/elasticsearch/xpack/sql/
planner/ — logical plan -> QueryContainer). This engine's native
planner already IS a SQL engine (Catalyst), so the endpoint is direct:
register the index tables as temp views and hand the statement to
spark.sql. What the reference gains from translation (pushdown into
the index) Catalyst does natively — filters/aggregates push into the
parquet scans, and the plan is visible through the _translate
analogue below.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def essql(
    spark: SparkSession, sql: str, sf_dir: str,
    tables: tuple[str, ...] = TABLES,
) -> DataFrame:
    """_sql endpoint: run an ES-SQL statement over the index tables.
    Views are only (re)registered for tables present in `sf_dir`."""
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    return spark.sql(sql)


def essql_translate(df: DataFrame) -> str:
    """_sql/translate analogue: the reference returns the search
    request a statement compiles to; here it is the optimized physical
    plan (scans show the pushed filters/pruned columns the translation
    achieved)."""
    return df._jdf.queryExecution().executedPlan().toString()
