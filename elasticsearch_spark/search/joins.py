"""Parent-child relation queries (the parent-join module).

Reference: modules/parent-join/src/main/java/org/elasticsearch/join/
query/HasChildQueryBuilder.java / HasParentQueryBuilder.java /
ParentIdQueryBuilder.java — ES's only join-like operators, executed
there as block joins inside one shard. In Spark the parent and child
sets are plain tables and these are real joins + aggregations:

  has_child : parents with >= min_children (<= max_children) children
              matching the child query; parent score = score_mode
              (none|sum|avg|max|min) over child scores.
  has_parent: children whose parent matches the parent query
              (score = parent score when score=True).
  parent_id : children of one specific parent.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from elasticsearch_spark.search import dsl

_SCORE_AGGS = {
    "sum": F.sum, "avg": F.avg, "max": F.max, "min": F.min,
}


def has_child(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    query: dict[str, Any],
    score_mode: str = "none",
    child_score: Column | None = None,
    min_children: int = 1,
    max_children: int | None = None,
) -> DataFrame:
    """Parents having matching children. ``child_score`` is the per-child
    score expression (default 1.0 — filter-context children); the parent
    ``score`` column is the score_mode aggregate (1.0 for none)."""
    matched = children.filter(dsl.compile_filter(query, id_col=child_key))
    score = child_score if child_score is not None else F.lit(1.0)
    aggs = [F.count(F.lit(1)).alias("_n_children")]
    if score_mode != "none":
        aggs.append(_SCORE_AGGS[score_mode](F.col("_cs")).alias("score"))
    grouped = (
        matched.withColumn("_cs", score)
        .groupBy(F.col(child_key).alias("_pk"))
        .agg(*aggs)
    )
    cond = F.col("_n_children") >= F.lit(min_children)
    if max_children is not None:
        cond = cond & (F.col("_n_children") <= F.lit(max_children))
    grouped = grouped.filter(cond)
    out = parents.join(
        grouped, parents[parent_key] == grouped["_pk"], "inner"
    ).drop("_pk")
    if score_mode == "none":
        out = out.withColumn("score", F.lit(1.0))
    return out


def has_child_inner_hits(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    query: dict[str, Any],
    size: int = 3,
    sort_by: list[tuple[str, bool]] | None = None,
) -> DataFrame:
    """has_child WITH inner_hits (HasChildQueryBuilder.innerHit +
    InnerHitsPhase.java): for each parent that has matching children,
    the top-``size`` matching child rows. One window rank per parent +
    a left-semi filter of the parents — the child table is scanned
    once."""
    from pyspark.sql import Window

    matched = children.filter(dsl.compile_filter(query, id_col=child_key))
    order = [
        (F.col(f).asc() if asc else F.col(f).desc()) for f, asc in (sort_by or [])
    ] or [F.asc(child_key)]
    w = Window.partitionBy(child_key).orderBy(*order)
    top = matched.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= size
    )
    live_parents = parents.join(
        top.select(F.col(child_key).alias("_pk")).distinct(),
        parents[parent_key] == F.col("_pk"), "left_semi",
    )
    return live_parents.join(
        top, live_parents[parent_key] == top[child_key], "inner"
    )


def has_parent(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_key: str,
    query: dict[str, Any],
    score: bool = False,
    parent_score: Column | None = None,
) -> DataFrame:
    """Children whose parent matches the parent query."""
    matched = parents.filter(dsl.compile_filter(query, id_col=parent_key))
    ps = (parent_score if parent_score is not None else F.lit(1.0)).alias("score")
    sel = matched.select(F.col(parent_key).alias("_pk"), ps)
    out = children.join(sel, children[child_key] == sel["_pk"], "inner").drop("_pk")
    if not score:
        out = out.withColumn("score", F.lit(1.0))
    return out


def parent_id(
    children: DataFrame, child_key: str, parent: Any
) -> DataFrame:
    """Children of one specific parent (ParentIdQueryBuilder)."""
    return children.filter(F.col(child_key) == F.lit(parent))


def children_agg(
    parents: DataFrame,
    children: DataFrame,
    join_key: str,
    bucket_col: str,
    child_aggs: list[Column],
) -> DataFrame:
    """``children`` aggregation (modules/parent-join/.../aggregations/
    ChildrenAggregationBuilder.java): inside each parent bucket, step
    into the child documents and aggregate THEIR fields. One equi-join
    on the join key (broadcast when the bucketed parent side is small,
    shuffle otherwise — Catalyst/AQE's call) + one partial-agg groupBy;
    the child table is scanned once regardless of bucket count."""
    p = parents.select(F.col(join_key), F.col(bucket_col))
    return (
        p.join(children, join_key)
        .groupBy(bucket_col)
        .agg(F.count("*").alias("child_doc_count"), *child_aggs)
    )


def parent_agg(
    parents: DataFrame,
    children: DataFrame,
    join_key: str,
    bucket_col: str,
    parent_aggs: list[Column],
) -> DataFrame:
    """``parent`` aggregation (ParentAggregationBuilder.java): from
    child buckets step UP to the distinct parent documents and
    aggregate parent fields. The dedup happens BEFORE the parent-field
    aggregation (a parent with many matching children counts once per
    bucket), matching the reference's bitset-per-bucket semantics."""
    c = children.select(F.col(join_key), F.col(bucket_col)).distinct()
    return (
        c.join(parents, join_key)
        .groupBy(bucket_col)
        .agg(F.count("*").alias("parent_doc_count"), *parent_aggs)
    )
