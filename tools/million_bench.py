"""1M-doc scale demonstration: build throughput + WAND/MaxScore
pruning effectiveness at a corpus size where block skipping matters
(each partition holds enough posting blocks for theta cutoffs to
skip real work — at sf0.1's 5k docs it cannot).

Usage: python tools/million_bench.py [n_docs] [cores]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
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
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index, load_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk
    from elasticsearch_spark.session import get_spark

    shards = max(32, n_docs // 8000)
    spark = get_spark("million", cores=cores, shuffle_partitions=2 * shards)
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=2 * shards).cache()
    corpus.count()

    out = tempfile.mkdtemp(prefix="million_idx_")
    t0 = time.time()
    idx = build_index(corpus, out, fields={"content": "code"},
                      num_partitions=shards,
                      id_cols=["repo", "path", "commit"],
                      input_snapshot="million")
    build_sec = time.time() - t0
    corpus.unpersist()
    idx = load_index(spark, out).cache()

    exact = BM25Params(quantize_norms=False)
    queries = {
        "common3": "import return static",
        "mixed4": "parseIndex scanBuffer read token",
        "rare2": "read_buf_cfg writeIndexHeader",
    }
    results: dict[str, dict[str, float]] = {}
    for name, qtext in queries.items():
        terms = [t for t, _ in analyze(qtext, "code")]
        match_topk(idx, "content", terms, k=10, params=exact,
                   prune=True).collect()  # warm
        # INTERLEAVED on/off samples: host noise and cache warmth drift
        # over seconds, so consecutive-block measurement makes whichever
        # variant runs second look faster; alternating cancels the bias
        row: dict[str, float] = {}
        samples = {True: [], False: []}
        match_topk(idx, "content", terms, k=10, params=exact,
                   prune=False).collect()  # warm the off-path too
        for _ in range(7):
            for flag in (True, False):
                t0 = time.time()
                match_topk(idx, "content", terms, k=10, params=exact,
                           prune=flag).collect()
                samples[flag].append(time.time() - t0)
        row["prune_on"] = round(min(samples[True]), 3)
        row["prune_off"] = round(min(samples[False]), 3)
        row["speedup"] = round(row["prune_off"] / row["prune_on"], 3)
        results[name] = row
    shutil.rmtree(out, ignore_errors=True)

    payload = {
        "n_docs": n_docs,
        "cores": cores,
        "shards": shards,
        "build_sec": round(build_sec, 1),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "docs_per_sec_per_core": round(n_docs / build_sec / cores, 1),
        "wand": results,
    }
    print(json.dumps(payload))

    lines = [
        f"\n## {n_docs:,}-doc build + WAND pruning (local[{cores}], "
        f"{shards} shards)\n\n",
        f"Build: {build_sec:.0f}s = {n_docs / build_sec:,.0f} docs/s "
        f"({n_docs / build_sec / cores:,.0f} docs/s/core).\n\n",
        "| query | prune on (s) | prune off (s) | speedup |\n|---|---|---|---|\n",
    ]
    for name, row in results.items():
        lines.append(
            f"| {name} | {row['prune_on']} | {row['prune_off']} "
            f"| {row['speedup']}x |\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
