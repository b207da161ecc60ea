"""Retriever-tree fusion: reciprocal-rank fusion and linear score
combination over independently-produced top-k hit lists.

The reference snapshot (8.0) predates the retriever API, but hybrid
text+vector fusion is the standard way a search/RAG pipeline combines a
BM25 retriever with a knn retriever, so it is implemented here as a
first-class op.  Semantics follow the public formulations:

  - RRF: Cormack, Clarke & Buettcher, "Reciprocal Rank Fusion
    outperforms Condorcet and individual Rank Learning Methods"
    (SIGIR 2009): score(d) = sum over rankings r of
    1 / (rank_constant + rank_r(d)), ranks 1-based, a document absent
    from a ranking contributing nothing from it.
  - linear: weighted sum of per-retriever normalized scores
    (normalizers: none | minmax | l2_norm), a document absent from a
    retriever contributing 0 from it.

Spark shape: every input frame is already a top-k hit list (<= the
retriever's rank window, driver-bounded rows), so rank assignment and
min/max normalization run as whole-frame windows over a handful of rows
and the fusion itself is a union + one tiny hash aggregation — the
expensive work (posting-list scoring, vector scan) stays inside each
child retriever's own distributed plan, exactly like the coordinator
merging per-retriever top-docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rrf_fusion", "linear_fusion"]


def _ranked(hits: DataFrame, id_col: str, window_size: int) -> DataFrame:
    """(id, score) -> (id, rank) over the top ``window_size`` rows by
    (score desc, id asc) — the same global tie-break every top-k op in
    this engine uses, so ranks are deterministic across runs."""
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (hits.select(F.col(id_col), F.col("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= window_size))


def rrf_fusion(
    frames: list[DataFrame],
    rank_constant: int = 60,
    window_size: int = 10,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse hit lists by reciprocal rank.

    Returns DataFrame(id_col, score) ordered by (score desc, id asc),
    limited to ``k``.  ``rank_constant`` is ES's default 60;
    ``window_size`` caps how deep each child ranking contributes.
    """
    if not frames:
        raise ValueError("rrf_fusion needs at least one hit frame")
    contrib = None
    for hits in frames:
        r = _ranked(hits, id_col, window_size).select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(rank_constant)) + F.col("rank")))
            .alias("_c"))
        contrib = r if contrib is None else contrib.unionByName(r)
    return (contrib.groupBy(id_col)
            .agg(F.sum("_c").alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))


def _normalized(hits: DataFrame, id_col: str, normalizer: str,
                window_size: int) -> DataFrame:
    top = _ranked(hits, id_col, window_size)
    if normalizer == "none":
        norm = F.col("score")
    elif normalizer == "minmax":
        # degenerate all-equal window maps to 1.0 (every doc is "best")
        w = Window.partitionBy()
        lo, hi = F.min("score").over(w), F.max("score").over(w)
        norm = F.when(hi == lo, F.lit(1.0)) \
            .otherwise((F.col("score") - lo) / (hi - lo))
    elif normalizer == "l2_norm":
        w = Window.partitionBy()
        l2 = F.sqrt(F.sum(F.col("score") * F.col("score")).over(w))
        norm = F.when(l2 == 0, F.lit(0.0)).otherwise(F.col("score") / l2)
    else:
        raise ValueError(f"unknown normalizer {normalizer!r}")
    return top.select(F.col(id_col), norm.alias("_n"))


def linear_fusion(
    frames: list[DataFrame],
    weights: list[float] | None = None,
    normalizers: list[str] | str = "minmax",
    window_size: int = 10,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sum of normalized per-retriever scores.

    ``normalizers`` is one name applied to all frames or a per-frame
    list (``none`` | ``minmax`` | ``l2_norm``).  Missing docs
    contribute 0 from that retriever.
    """
    if not frames:
        raise ValueError("linear_fusion needs at least one hit frame")
    if weights is None:
        weights = [1.0] * len(frames)
    if len(weights) != len(frames):
        raise ValueError("weights must align with frames")
    if isinstance(normalizers, str):
        normalizers = [normalizers] * len(frames)
    if len(normalizers) != len(frames):
        raise ValueError("normalizers must align with frames")
    contrib = None
    for hits, wgt, nrm in zip(frames, weights, normalizers):
        r = _normalized(hits, id_col, nrm, window_size).select(
            F.col(id_col), (F.col("_n") * F.lit(float(wgt))).alias("_c"))
        contrib = r if contrib is None else contrib.unionByName(r)
    return (contrib.groupBy(id_col)
            .agg(F.sum("_c").alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
