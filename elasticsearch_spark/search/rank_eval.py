"""Rank-evaluation metrics (reference: modules/rank-eval/.../
PrecisionAtK.java, RecallAtK.java, MeanReciprocalRank.java,
DiscountedCumulativeGain.java, ExpectedReciprocalRank.java,
RankEvalSpec.java).

Pure-Python over small ranked lists (these run on top-k results, never
on the corpus) — used by the acceptance gate in tests/ to diagnose any
rank-parity failure, and exposed as a library API.
"""

from __future__ import annotations

import math


def precision_at_k(ranked: list[int], relevant: set[int], k: int = 10) -> float:
    top = ranked[:k]
    if not top:
        return 0.0
    return sum(1 for d in top if d in relevant) / len(top)


def recall_at_k(ranked: list[int], relevant: set[int], k: int = 10) -> float:
    if not relevant:
        return 0.0
    return sum(1 for d in ranked[:k] if d in relevant) / len(relevant)


def mean_reciprocal_rank(ranked: list[int], relevant: set[int], k: int = 10) -> float:
    for i, d in enumerate(ranked[:k], start=1):
        if d in relevant:
            return 1.0 / i
    return 0.0


def dcg_at_k(ranked: list[int], gains: dict[int, float], k: int = 10) -> float:
    """DCG with the reference's formula: sum (2^rel - 1) / log2(rank+1)."""
    out = 0.0
    for i, d in enumerate(ranked[:k], start=1):
        rel = gains.get(d, 0.0)
        out += (2.0 ** rel - 1.0) / math.log2(i + 1)
    return out


def ndcg_at_k(ranked: list[int], gains: dict[int, float], k: int = 10) -> float:
    ideal = sorted(gains.values(), reverse=True)[:k]
    idcg = sum(
        (2.0 ** rel - 1.0) / math.log2(i + 1)
        for i, rel in enumerate(ideal, start=1)
    )
    if idcg == 0:
        return 0.0
    return dcg_at_k(ranked, gains, k) / idcg


def err_at_k(
    ranked: list[int], gains: dict[int, float], k: int = 10, max_rel: float = 3.0
) -> float:
    """Expected reciprocal rank (cascade model)."""
    p_stop_prev = 1.0
    out = 0.0
    for i, d in enumerate(ranked[:k], start=1):
        rel = gains.get(d, 0.0)
        p = (2.0 ** rel - 1.0) / (2.0 ** max_rel)
        out += p_stop_prev * p / i
        p_stop_prev *= 1.0 - p
    return out


def evaluate(
    results: dict[str, list[int]],
    judgments: dict[str, dict[int, float]],
    k: int = 10,
) -> dict[str, dict[str, float]]:
    """RankEvalSpec analogue: per-query + mean metrics over a query set.

    results: {query_id: ranked doc ids};
    judgments: {query_id: {doc_id: relevance grade}} (grade > 0 = relevant).
    """
    per_query: dict[str, dict[str, float]] = {}
    for qid, ranked in results.items():
        gains = judgments.get(qid, {})
        relevant = {d for d, g in gains.items() if g > 0}
        per_query[qid] = {
            "precision": precision_at_k(ranked, relevant, k),
            "recall": recall_at_k(ranked, relevant, k),
            "mrr": mean_reciprocal_rank(ranked, relevant, k),
            "ndcg": ndcg_at_k(ranked, gains, k),
            "err": err_at_k(ranked, gains, k),
        }
    if per_query:
        mean = {
            m: sum(v[m] for v in per_query.values()) / len(per_query)
            for m in ("precision", "recall", "mrr", "ndcg", "err")
        }
        per_query["_mean"] = mean
    return per_query
