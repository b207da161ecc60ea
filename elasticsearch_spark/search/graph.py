"""Graph explore API — relationships between indexed terms.

Reference: x-pack/plugin/graph/src/main/java/org/elasticsearch/xpack/
graph/action/TransportGraphExploreAction.java — a hop runs the current
query, finds the significant (or most frequent) terms per vertex field
among the matching docs, then the next hop's query is the term set just
found; connections are the co-occurrences between consecutive hops'
vertices, weighted by doc count.

Spark shape: every hop is one hash aggregation over the doc table
(fg/bg counts per term) — the same partial/final agg pattern as
significant_terms — and the "query for the found vertices" is a
broadcast semi-join of the tiny vertex set (≤ size rows) against the
scan, so a hop never shuffles the corpus: vertex selection collapses
map-side and edges aggregate on (source, target) pairs. Significance
weights reuse the integer-exact JLH rational (jlh_num/jlh_den) so
ranking is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .extras import _rank_jlh


def graph_vertices(
    df: DataFrame,
    seed,
    field: str,
    size: int = 5,
    min_doc_count: int = 1,
    use_significance: bool = True,
) -> DataFrame:
    """One hop's vertex set for ``field`` given the current query
    ``seed`` (a boolean Column): terms ranked by JLH significance of
    the seed docs against the whole table (use_significance=True, the
    reference default) or by plain foreground doc count
    (use_significance=False). Returns (term, fg_count, bg_count[,
    jlh_num, jlh_den])."""
    if use_significance:
        from .extras import significant_terms

        out = significant_terms(df, field, seed, size=size,
                                min_doc_count=min_doc_count)
        return out.select("term", "fg_count", "bg_count",
                          "jlh_num", "jlh_den")
    counts = (
        df.groupBy(F.col(field).alias("term"))
        .agg(
            F.sum(seed.cast("long")).alias("fg_count"),
            F.count("*").alias("bg_count"),
        )
        .filter(F.col("fg_count") >= min_doc_count)
    )
    return (
        counts.orderBy(F.desc("fg_count"), F.asc("term"))
        .limit(size)
    )


def graph_explore(
    df: DataFrame,
    seed,
    vertex_field: str,
    connection_field: str,
    size: int = 5,
    min_doc_count: int = 1,
    use_significance: bool = True,
) -> DataFrame:
    """Two-hop explore: seed query -> vertices in ``vertex_field`` ->
    the vertices' term query -> target vertices in ``connection_field``
    -> edges (source, target, doc_count) between the two vertex sets,
    counted over the second hop's matching docs.

    The vertex sets are ≤ size rows (the API bounds them), so the term
    sets collect to the driver and the membership tests are In-list
    literals pushed into the scan — a hop is ONE aggregation over the
    corpus with no join, and the edge aggregation shuffles only the
    (source, target) pair counts, never doc payloads."""
    src = graph_vertices(df, seed, vertex_field, size,
                         min_doc_count, use_significance)
    src_terms = [r["term"] for r in src.collect()]
    hop2_seed = F.col(vertex_field).isin(src_terms)
    tgt = graph_vertices(df, hop2_seed, connection_field, size,
                         min_doc_count, use_significance)
    tgt_terms = [r["term"] for r in tgt.collect()]
    return (
        df.filter(hop2_seed & F.col(connection_field).isin(tgt_terms))
        .groupBy(
            F.col(vertex_field).alias("source"),
            F.col(connection_field).alias("target"),
        )
        .agg(F.count("*").alias("doc_count"))
    )
