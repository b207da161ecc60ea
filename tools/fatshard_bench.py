"""Fat-shard pruning A/B: does block-max pruning win wall-clock when
decode+score dominates?

The sandbox's default ~8k-docs/shard sizing leaves queries bound by the
~0.3-1s scan+scheduling floor, where pruning bookkeeping ~= savings
(BENCH/BASELINE.md round-4 tables). This run builds FEW, FAT shards
(>=2M docs each) so per-term posting lists are millions of entries and
block decode+scoring is the dominant cost — the regime a 1000-executor
cluster at 10^12 docs lives in, where each shard holds a large doc
count regardless of how many shards exist.

Protocol: one index; prune on/off strictly interleaved, best-of-N,
identical top-10 asserted; afterwards one instrumented pass per query
per variant (ES_SPARK_PRUNE_STATS_DIR) reports how many blocks each
variant decoded vs skipped — wall-clock AND the mechanism, together.

Usage: python tools/fatshard_bench.py [docs_per_shard] [shards] [cores] [reps]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_stats(stats_dir: str) -> dict[str, int]:
    agg: dict[str, int] = {}
    for p in glob.glob(os.path.join(stats_dir, "*.json")):
        with open(p) as f:
            d = json.load(f)
        for k, v in d.items():
            agg[k] = agg.get(k, 0) + int(v)
        os.remove(p)
    return agg


def main() -> None:
    docs_per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    n_docs = docs_per_shard * shards

    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index, load_index
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk
    from elasticsearch_spark.session import get_spark

    # set BEFORE the session: python workers inherit the JVM's env,
    # which inherits the driver's at session start — a later setenv
    # never reaches them. Cost while on: one tiny JSON per scorer task.
    stats_dir = tempfile.mkdtemp(prefix="prune_stats_")
    os.environ["ES_SPARK_PRUNE_STATS_DIR"] = stats_dir

    spark = get_spark("fatshard", cores=cores,
                      shuffle_partitions=max(cores, 2 * shards))
    t0 = time.time()
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=4 * cores).cache()
    corpus.count()
    out = tempfile.mkdtemp(prefix="fatshard_idx_")
    build_index(corpus, out, fields={"content": "code"},
                num_partitions=shards,
                id_cols=["repo", "path", "commit"],
                input_snapshot="fatshard")
    corpus.unpersist()
    build_s = round(time.time() - t0, 1)
    idx = load_index(spark, out).cache()
    print(f"built {n_docs:,} docs in {shards} shards: {build_s}s",
          file=sys.stderr)

    exact = BM25Params(quantize_norms=False)
    queries = {
        "single_common": "import",
        "single_mid": "parseIndex",
        "common3": "import return static",
        "mixed4": "parseIndex scanBuffer read token",
    }
    variants = {"prune_off": False, "prune_on": True}

    results: dict[str, dict] = {}
    for qname, qtext in queries.items():
        terms = [t for t, _ in analyze(qtext, "code")]
        expect = None
        for vname, pr in variants.items():
            got = [(r["doc_id"], round(r["score"], 6)) for r in
                   match_topk(idx, "content", terms, k=10, params=exact,
                              prune=pr).collect()]
            if expect is None:
                expect = got
            assert got == expect, (qname, vname)
        samples: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(reps):
            for vname, pr in variants.items():
                t1 = time.time()
                match_topk(idx, "content", terms, k=10, params=exact,
                           prune=pr).collect()
                samples[vname].append(time.time() - t1)
        # instrumented pass: block counters per variant (drain whatever
        # the timing runs wrote first)
        read_stats(stats_dir)
        counters: dict[str, dict] = {}
        for vname, pr in variants.items():
            match_topk(idx, "content", terms, k=10, params=exact,
                       prune=pr).collect()
            counters[vname] = read_stats(stats_dir)
        results[qname] = {
            "best": {v: round(min(s), 3) for v, s in samples.items()},
            "counters": counters,
        }
        print(qname, json.dumps(results[qname]), file=sys.stderr)

    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(stats_dir, ignore_errors=True)

    payload = {"n_docs": n_docs, "docs_per_shard": docs_per_shard,
               "shards": shards, "cores": cores, "build_s": build_s,
               "fatshard_ab": results}
    print(json.dumps(payload))

    lines = [
        f"\n## Fat-shard pruning A/B ({n_docs:,} docs, {shards} shards "
        f"x {docs_per_shard:,} docs/shard, local[{cores}])\n\n",
        "Same index, interleaved best-of-"
        f"{reps}, identical top-10 asserted; counters from one "
        "instrumented pass per variant (blocks = posting blocks of the "
        "query's terms in scanned partitions).\n\n",
        "| query | off (s) | on (s) | speedup | blocks | decoded off "
        "| decoded on | skipped on |\n|---|---|---|---|---|---|---|---|\n",
    ]
    for qname, row in results.items():
        off = row["best"]["prune_off"]
        on = row["best"]["prune_on"]
        c_off = row["counters"]["prune_off"]
        c_on = row["counters"]["prune_on"]
        skipped = (c_on.get("skip_theta_range", 0)
                   + c_on.get("skip_member", 0)
                   + c_on.get("skip_restrict_empty", 0))
        lines.append(
            f"| {qname} | {off} | {on} | {round(off / on, 2)}x "
            f"| {c_on.get('blocks', 0)} | {c_off.get('decoded', 0)} "
            f"| {c_on.get('decoded', 0)} | {skipped} |\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
