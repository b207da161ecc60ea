"""Pure-Python BM25 oracle for golden tests (no Spark, no numpy tricks).

Implements exactly the semantics in SURVEY.md §1.3 / FIXTURES.md §3:
k1=1.2 b=0.75, discount_overlaps=true, DFS-style global statistics,
optional Lucene SmallFloat 1-byte norm quantization, tie-break
(score DESC, doc_id ASC). Used to generate golden top-k for the engine's
rank-identity gate (the reference's rank-eval-style harness,
modules/rank-eval/.../RankEvalSpec.java).
"""

from __future__ import annotations

import math

import numpy as np

from elasticsearch_spark.analysis import ANALYZERS, analyze
from elasticsearch_spark.search.bm25 import BM25Params, quantize_dl


def build_oracle_index(docs: dict[int, str], analyzer: str = "standard"):
    """docs: {doc_id: text}. Returns (tf_index, dl, avgdl, n_docs)."""
    fn = ANALYZERS[analyzer]
    tf_index: dict[str, dict[int, int]] = {}
    dl: dict[int, int] = {}
    sum_ttf = 0
    for doc_id, text in docs.items():
        terms, positions = fn(text or "")
        # number of position-advancing tokens (FieldInvertState length
        # with discountOverlaps) — gaps from removed stopwords don't count
        dl[doc_id] = len(set(positions))
        sum_ttf += len(terms)
        for t in terms:
            tf_index.setdefault(t, {})
            tf_index[t][doc_id] = tf_index[t].get(doc_id, 0) + 1
    n_docs = len(docs)
    avgdl = sum_ttf / n_docs if n_docs else 0.0
    return tf_index, dl, avgdl, n_docs


def oracle_topk(
    docs: dict[int, str],
    query: str,
    k: int = 10,
    analyzer: str = "standard",
    operator: str = "or",
    minimum_should_match: int = 1,
    params: BM25Params | None = None,
) -> list[tuple[int, float]]:
    """Exhaustive BM25 top-k: [(doc_id, score)] sorted (score desc, id asc)."""
    params = params or BM25Params()
    tf_index, dl, avgdl, n_docs = build_oracle_index(docs, analyzer)
    qterms = [t for t, _ in analyze(query, analyzer)]
    # Lucene BooleanQuery KEEPS duplicate TermQuery clauses and sums
    # them: a repeated query term contributes (and counts toward msm)
    # once per occurrence — weight each unique term by its multiplicity.
    from collections import Counter

    mult = Counter(qterms)
    seen: set[str] = set()
    uniq = [t for t in qterms if not (t in seen or seen.add(t))]
    msm = len(qterms) if operator == "and" else max(minimum_should_match, 1)

    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for t in uniq:
        w = mult[t]
        postings = tf_index.get(t)
        if not postings:
            if operator == "and":
                return []
            continue
        df = len(postings)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for doc_id, tf in postings.items():
            d = dl[doc_id]
            if params.quantize_norms:
                d = int(quantize_dl(np.array([d]))[0])
            tfn = tf / (tf + params.k1 * (1.0 - params.b + params.b * d / avgdl))
            scores[doc_id] = scores.get(doc_id, 0.0) + w * (params.k1 + 1.0) * idf * tfn
            counts[doc_id] = counts.get(doc_id, 0) + w
    hits = [
        (doc_id, s) for doc_id, s in scores.items() if counts[doc_id] >= msm
    ]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]
