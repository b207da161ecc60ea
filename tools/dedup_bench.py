"""MinHash-LSH cost-center A/B: physical strategies on the same corpus.

Round 3 flagged dedup_minhash_lsh as >50% of the headline bench sum.
Round 4 fuses the signature computation into one projection
(use_arrays) and collapses the job to a single exchange (bucketed
strategy). This tool interleaves the strategy variants (host noise
protocol, BENCH/BASELINE.md) and appends the table.

Usage: python tools/dedup_bench.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.ops import dedup
    from elasticsearch_spark.session import get_spark

    spark = get_spark("dedupbench", cores=cores,
                      shuffle_partitions=2 * cores)
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=2 * cores).cache()
    corpus.count()
    docs = corpus.selectExpr("id AS doc_id", "content AS text")

    variants = {
        "join_explode_r3": dict(strategy="join", use_arrays=False),
        "join_arrays": dict(strategy="join", use_arrays=True),
        "bucketed_explode": dict(strategy="bucketed", use_arrays=False),
        "bucketed_arrays_r4": dict(strategy="bucketed", use_arrays=True),
    }
    # warm + identical-result assert
    base = None
    for name, kw in variants.items():
        got = dedup.minhash_lsh_pairs(docs, **kw).count()
        if base is None:
            base = got
        assert got == base, (name, got, base)
        spark.catalog.clearCache()
        corpus.cache().count()

    samples = {name: [] for name in variants}
    for _ in range(5):
        for name, kw in variants.items():
            t0 = time.time()
            dedup.minhash_lsh_pairs(docs, **kw).count()
            samples[name].append(time.time() - t0)
            # the join+arrays variant persists internally; clear so the
            # next sample starts cold like the others
            spark.catalog.clearCache()
            corpus.cache().count()

    results = {n: round(min(v), 3) for n, v in samples.items()}
    payload = {"n_docs": n_docs, "cores": cores, "pairs": base,
               "lsh_variants": results}
    print(json.dumps(payload))

    lines = [
        f"\n## MinHash-LSH strategy A/B ({n_docs:,} docs, local[{cores}])\n\n",
        "Interleaved best-of-5; identical candidate sets asserted "
        f"({base} pairs).\n\n",
        "| variant | best (s) |\n|---|---|\n",
    ]
    for name, sec in results.items():
        lines.append(f"| {name} | {sec} |\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
