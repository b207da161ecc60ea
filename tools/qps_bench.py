"""Query-side scaling evidence: BM25 top-10 QPS at two parallelism
levels over the SAME on-disk 500k-doc index (built once — queries only
read it, so unlike scaling_bench the build does not gate the repeats
and each level affords many more fresh-JVM samples against host noise).

Two modes (env QPS_MODE):
  - ``stream`` (legacy): 60 queries as independent concurrent jobs,
    queue depth 8. Each job pays the full local-mode scheduler
    round-trip, so the measured efficiency is capped by driver fixed
    costs that a real multi-executor cluster does not multiply.
  - ``batch`` (default): the same 60 queries through
    ``match_topk_batch`` — ONE job whose every task scores all 60
    queries (the _msearch shape a cluster would run for a query
    stream). Per-task work is 60x the stream mode's, so the measured
    ratio reflects scoring compute, which is what actually scales
    with executors.

Usage: python tools/qps_bench.py [n_docs] [lo_cores] [hi_cores]
Appends the measured table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys, time
from concurrent.futures import ThreadPoolExecutor
sys.path.insert(0, {repo!r})
from elasticsearch_spark.session import get_spark
from elasticsearch_spark.index.builder import load_index
from elasticsearch_spark.search.executor import match_topk
from elasticsearch_spark.analysis import analyze

cores, idx_dir = int(sys.argv[1]), sys.argv[2]
# identical plan shape at both levels; SHUFFLE_PARTS is an experiment
# knob (the scorer exchange carries k rows/shard, so narrower is
# mostly a scheduling-overhead lever)
parts = int(os.environ.get("SHUFFLE_PARTS", "128"))
spark = get_spark(f"qps{{cores}}", cores=cores, shuffle_partitions=parts)
idx = load_index(spark, idx_dir).cache()
queries = ["import return static", "parseIndex scanBuffer", "def lambda yield",
           "public class void", "read_buf_cfg token"]
terms = [[t for t, _ in analyze(q, "code")] for q in queries]
# two warmup rounds: the first JIT-compiles the scorer codegen, the
# second settles it — a single round leaves the measured stream paying
# compilation on some hot paths (observed as 2-3x sample spread at
# higher core counts)
for _ in range(2):
    for ts in terms:
        match_topk(idx, "content", ts, k=10).collect()
N = 60
# fixed queue depth of 8 in-flight queries at BOTH levels: each job is
# internally data-parallel (62 scan tasks), so one in-flight job can
# already saturate either level and the worker count only sets queue
# depth. A per-core depth (4*cores = 32 at local[8]) was A/B-tested and
# LOST (best 1.818 vs 2.27 QPS): 32 concurrent py4j submitters + their
# job stages thrash the single local-mode scheduler thread.
t0 = time.time()
with ThreadPoolExecutor(max_workers=8) as ex:
    futs = [ex.submit(lambda ts=terms[i % len(terms)]:
                      match_topk(idx, "content", ts, k=10).collect())
            for i in range(N)]
    for f in futs:
        f.result()
print(json.dumps({{"cores": cores, "qps": N / (time.time() - t0)}}))
"""

CHILD_BATCH = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from elasticsearch_spark.session import get_spark
from elasticsearch_spark.index.builder import load_index
from elasticsearch_spark.search.executor import match_topk_batch
from elasticsearch_spark.analysis import analyze

cores, idx_dir = int(sys.argv[1]), sys.argv[2]
parts = int(os.environ.get("SHUFFLE_PARTS", "128"))
spark = get_spark(f"qps{{cores}}", cores=cores, shuffle_partitions=parts)
idx = load_index(spark, idx_dir).cache()
base = ["import return static", "parseIndex scanBuffer", "def lambda yield",
        "public class void", "read_buf_cfg token"]
queries = [base[i % len(base)] for i in range(60)]
terms = [[t for t, _ in analyze(q, "code")] for q in queries]
# one warmup batch is enough here: a single batch already runs 60
# queries through the scorer, so JIT is warm after it
match_topk_batch(idx, "content", terms, k=10).collect()
N = len(terms)
rounds = 2
t0 = time.time()
for _ in range(rounds):
    match_topk_batch(idx, "content", terms, k=10).collect()
print(json.dumps({{"cores": cores,
                   "qps": rounds * N / (time.time() - t0)}}))
"""


MODE = os.environ.get("QPS_MODE", "batch")


def _one(cores: int, idx_dir: str) -> float:
    child = CHILD_BATCH if MODE == "batch" else CHILD
    proc = subprocess.run(
        [sys.executable, "-c", child.format(repo=REPO),
         str(cores), idx_dir],
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError(f"child cores={cores} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])["qps"]


def qps_interleaved(lo: int, hi: int, idx_dir: str,
                    repeats: int) -> tuple[list[float], list[float]]:
    """Alternate lo/hi samples so slow host drift hits both levels
    equally instead of biasing whichever level ran second."""
    lo_vals, hi_vals = [], []
    for i in range(repeats):
        lo_vals.append(_one(lo, idx_dir))
        hi_vals.append(_one(hi, idx_dir))
        sys.stderr.write(
            f"round {i + 1}/{repeats}: lo={lo_vals[-1]:.3f} "
            f"hi={hi_vals[-1]:.3f}\n")
    return lo_vals, hi_vals


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else lo * 4
    repeats = int(os.environ.get("QPS_REPEATS", "5"))

    idx_dir = os.environ.get("QPS_IDX_DIR")  # reuse a prior build
    if not idx_dir:
        from elasticsearch_spark.corpus import generate_corpus
        from elasticsearch_spark.index.builder import build_index
        from elasticsearch_spark.session import get_spark

        shards = max(32, n_docs // 8000)
        spark = get_spark("qpsbuild", cores=16, shuffle_partitions=2 * shards)
        corpus = generate_corpus(spark, n_docs, seed=42,
                                 partitions=2 * shards).cache()
        idx_dir = tempfile.mkdtemp(prefix="qps_idx_")
        build_index(corpus, idx_dir, fields={"content": "code"},
                    num_partitions=shards, id_cols=["repo", "path", "commit"],
                    input_snapshot="qps")
        spark.stop()

    lo_vals, hi_vals = qps_interleaved(lo, hi, idx_dir, repeats)
    eff = max(hi_vals) / ((hi / lo) * max(lo_vals))
    out = {
        "n_docs": n_docs,
        f"qps_local{lo}": sorted(round(v, 3) for v in lo_vals),
        f"qps_local{hi}": sorted(round(v, 3) for v in hi_vals),
        f"qps_scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
    }
    print(json.dumps(out))
    proto = (
        "each sample is a fresh JVM running 2 batched rounds of the "
        "same 60 queries through match_topk_batch — one job per round, "
        "every task scores all 60 queries"
        if MODE == "batch" else
        "each sample is a fresh JVM running the same 60-query "
        "concurrent stream"
    )
    section = (
        f"\n## Query QPS scaling ({MODE} mode) — {n_docs:,}-doc index, "
        f"best of {repeats} fresh JVMs per level\n\n"
        f"| level | QPS samples | best |\n|---|---|---|\n"
        f"| local[{lo}] | {out[f'qps_local{lo}']} | {max(lo_vals):.3f} |\n"
        f"| local[{hi}] | {out[f'qps_local{hi}']} | {max(hi_vals):.3f} |\n\n"
        f"**QPS scaling efficiency ({lo} -> {hi} cores): {eff:.3f}** "
        f"(index built once; {proto}).\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(section)


if __name__ == "__main__":
    main()
