"""Filtered-search scale demonstration: WAND pruning UNDER a filter.

A `bool{must: match, filter: ...}` query used to score EVERY matching
doc with pruning off (k=None) and semi-join the filter afterwards; the
pushed-allowlist path cogroups the filter's doc ids with the posting
blocks so each shard scores only allowed docs with theta/block-max
pruning active (the reference intersects the filter bitset inside the
collector: search/query/TopDocsCollectorContext.java:202-206).

This tool A/Bs the two plans on the same 1M-doc index with INTERLEAVED
samples (host noise drifts over seconds — see BENCH/BASELINE.md
variance protocol), asserts they are rank-identical, and appends the
table to BENCH/BASELINE.md.

Usage: python tools/filtered_bench.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import (
        assign_doc_ids, build_index, load_index,
    )
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk
    from elasticsearch_spark.session import get_spark

    shards = max(32, n_docs // 8000)
    spark = get_spark("filtered", cores=cores, shuffle_partitions=2 * shards)
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=2 * shards).cache()
    corpus.count()

    out = tempfile.mkdtemp(prefix="filtered_idx_")
    idx = build_index(corpus, out, fields={"content": "code"},
                      num_partitions=shards,
                      id_cols=["repo", "path", "commit"],
                      input_snapshot="filtered")
    idx = load_index(spark, out).cache()
    docs = assign_doc_ids(corpus, ["repo", "path", "commit"])

    exact = BM25Params(quantize_norms=False)
    filters = {
        # ~8% of docs
        "rust8pct": F.col("lang") == "rust",
        # ~7% of docs: conjunction
        "selective7pct": (F.col("lang") == "go")
        & (F.length("content") >= F.lit(600)),
        # ~0.1%: the needle case where per-block range skipping fires
        # (allowed ids sparser than one per posting block)
        "needle01pct": F.pmod(F.xxhash64("path"), F.lit(1000)) < F.lit(1),
    }
    queries = {
        "common3": "import return static",
        "mixed4": "parseIndex scanBuffer read token",
    }
    results: dict[str, dict[str, float]] = {}
    for fname, pred in filters.items():
        allowed = docs.filter(pred).select("doc_id").cache()
        n_allowed = allowed.count()
        for qname, qtext in queries.items():
            terms = [t for t, _ in analyze(qtext, "code")]

            def pushed():
                return match_topk(idx, "content", terms, k=10,
                                  params=exact, allowed=allowed)

            def fallback():
                # the pre-round-4 plan: score everything unpruned,
                # semi-join the filter, then global top-k
                scores = match_topk(idx, "content", terms, k=None,
                                    params=exact)
                return (scores.join(allowed, "doc_id", "left_semi")
                        .orderBy(F.desc("score"), F.asc("doc_id"))
                        .limit(10))

            a = [(r["doc_id"], round(r["score"], 6))
                 for r in pushed().collect()]          # warm + result
            b = [(r["doc_id"], round(r["score"], 6))
                 for r in fallback().collect()]
            assert a == b, (fname, qname, a, b)

            samples: dict[str, list[float]] = {"pushed": [], "fallback": []}
            for _ in range(7):
                for variant, fn in (("pushed", pushed),
                                    ("fallback", fallback)):
                    t0 = time.time()
                    fn().collect()
                    samples[variant].append(time.time() - t0)
            row = {
                "pushed": round(min(samples["pushed"]), 3),
                "fallback": round(min(samples["fallback"]), 3),
                "n_allowed": n_allowed,
            }
            row["speedup"] = round(row["fallback"] / row["pushed"], 3)
            results[f"{fname}/{qname}"] = row
        allowed.unpersist()
    corpus.unpersist()
    shutil.rmtree(out, ignore_errors=True)

    payload = {"n_docs": n_docs, "cores": cores, "shards": shards,
               "filtered_search": results}
    print(json.dumps(payload))

    lines = [
        f"\n## Filtered search: pushed allowlist vs score-all+semi-join "
        f"({n_docs:,} docs, local[{cores}], {shards} shards)\n\n",
        "Interleaved best-of-7 fresh samples per variant; identical "
        "top-10 asserted before timing.\n\n",
        "| filter/query | allowed docs | pushed (s) | fallback (s) | "
        "speedup |\n|---|---|---|---|---|\n",
    ]
    for name, row in results.items():
        lines.append(
            f"| {name} | {row['n_allowed']:,} | {row['pushed']} "
            f"| {row['fallback']} | {row['speedup']}x |\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
