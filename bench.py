"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Extras: index-build throughput (docs/sec) over the sf documents table
and over a larger synthetic source-code corpus (the north_rule's input
shape), plus query p50/p99 across repeats.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "match_or",
    "match_and",
    "match_phrase",
    "match_k50",
    "msearch_batch",
    "bool_match_filter",
    "agg_terms_metrics",
    "agg_date_histogram",
    "agg_histogram",
    "agg_top_hits",
    "dedup_minhash_lsh",
    "ann_cosine_batch",
    "text_fingerprint",
]

REPEATS = 3
BUILD_REPEATS = 2  # best-of: sandbox noise only ever SLOWS a run


def main() -> None:
    import __spark_entry__ as entry
    from elasticsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark("bench", cores=cpus)

    # ---- index-build throughput over the sf documents table ----
    from elasticsearch_spark.index.builder import build_index

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    # best-of-N: the sandbox host shows large run-to-run noise (identical
    # fresh builds measured 4x apart minutes apart); noise only ever
    # slows a run, so min time is the honest capacity estimate — the
    # same protocol tools/scaling_bench.py documents.
    build_sec = float("inf")
    for _ in range(BUILD_REPEATS):
        idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
        t0 = time.time()
        build_index(
            docs.select("doc_id", "text"), idx_dir,
            fields={"text": "ascii_word"},
            num_partitions=int(cpus) if str(cpus).isdigit() else 8,
            input_snapshot="bench",
        )
        build_sec = min(build_sec, time.time() - t0)
        shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- index-build throughput over the synthetic code corpus ----
    from elasticsearch_spark.corpus import generate_corpus

    # large enough that per-job fixed overhead doesn't dominate the
    # measured docs/sec (the throughput-bound regime)
    n_code = int(os.environ.get("BENCH_CODE_DOCS", "50000"))
    corpus = generate_corpus(spark, n_code, seed=42).cache()
    corpus.count()  # materialize generation outside the timed window
    code_build_sec = float("inf")
    for _ in range(BUILD_REPEATS):
        code_dir = tempfile.mkdtemp(prefix="bench_code_idx_")
        t0 = time.time()
        build_index(
            corpus, code_dir, fields={"content": "code"},
            num_partitions=int(cpus) if str(cpus).isdigit() else 8,
            id_cols=["repo", "path", "commit"], input_snapshot="bench",
        )
        code_build_sec = min(code_build_sec, time.time() - t0)
        shutil.rmtree(code_dir, ignore_errors=True)
    corpus.unpersist()

    # ---- headline queries (entry-point cache reused across repeats) ----
    qs = entry.queries()
    per_query: dict[str, float] = {}
    p50s: dict[str, float] = {}
    p99s: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warmup (also builds the cached index)
        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            times.append(time.time() - t0)
        # min across repeats (same best-of noise protocol as builds);
        # p50/p99 keep the distribution honest
        per_query[name] = round(min(times), 4)
        p50s[name] = round(statistics.median(times), 4)
        p99s[name] = round(max(times), 4)

    # ---- pruning effectiveness: WAND/MaxScore on vs exhaustive ----
    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk

    idx = entry._doc_index(spark, sf_dir)
    exact = BM25Params(quantize_norms=False)
    pq = [t for t, _ in analyze("table scan merge window", "ascii_word")]
    match_topk(idx, "text", pq, k=10, params=exact, prune=True).collect()
    prune_times = {}
    for flag in (True, False):
        ts = []
        for _ in range(REPEATS):
            t0 = time.time()
            match_topk(idx, "text", pq, k=10, params=exact, prune=flag).collect()
            ts.append(time.time() - t0)
        prune_times["prune_on" if flag else "prune_off"] = round(min(ts), 4)

    out = {
        "metric": "headline query seconds (sum of per-query best-of-3) + index-build docs/sec",
        "value": round(sum(per_query.values()), 4),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "cpus": cpus,
        "index_build": {
            "documents_rows": n_docs,
            "documents_build_sec": round(build_sec, 3),
            "documents_docs_per_sec": round(n_docs / build_sec, 1),
            "code_corpus_rows": n_code,
            "code_corpus_build_sec": round(code_build_sec, 3),
            "code_corpus_docs_per_sec": round(n_code / code_build_sec, 1),
        },
        "p99": p99s,
        "wand_pruning": prune_times,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
