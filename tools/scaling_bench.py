"""Scaling-efficiency evidence for the north_rule (N -> 4N executors).

No real cluster in the sandbox, so the same index-build job runs at two
parallelism levels (local[8] vs local[32]) on the SAME input, in fresh
subprocesses (one JVM each). Efficiency = throughput_32 / (4 x
throughput_8). Writes BENCH/BASELINE.md with the measured table.

Usage: python tools/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from elasticsearch_spark.session import get_spark
from elasticsearch_spark.corpus import generate_corpus
from elasticsearch_spark.index.builder import build_index
from elasticsearch_spark.search.executor import match_topk
from elasticsearch_spark.index.builder import load_index
from elasticsearch_spark.analysis import analyze

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
spark = get_spark(f"scale{{cores}}", cores=cores, shuffle_partitions=max(cores, 8))
corpus = generate_corpus(spark, n_docs, seed=42, partitions=cores * 2).cache()
corpus.count()
out = tempfile.mkdtemp(prefix=f"scale_idx_{{cores}}_")
t0 = time.time()
idx = build_index(corpus, out, fields={{"content": "code"}},
                  num_partitions=cores, id_cols=["repo", "path", "commit"],
                  input_snapshot="scaling")
build_sec = time.time() - t0

# query throughput: repeated top-10 BM25 over the built index
queries = ["import return static", "parseIndex scanBuffer", "def lambda yield",
           "public class void", "read_buf_cfg token"]
terms = [[t for t, _ in analyze(q, "code")] for q in queries]
t0 = time.time()
n_runs = 0
for _ in range(3):
    for ts in terms:
        match_topk(idx, "content", ts, k=10).collect()
        n_runs += 1
query_sec = (time.time() - t0) / n_runs
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cores": cores, "build_sec": build_sec,
                   "docs_per_sec": n_docs / build_sec,
                   "query_sec": query_sec}}))
"""


def run(cores: int, n_docs: int) -> dict:
    code = CHILD.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_DRIVER_MEM": "24g"},
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"child (cores={cores}) failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    lo = run(8, n_docs)
    hi = run(32, n_docs)
    eff = hi["docs_per_sec"] / (4.0 * lo["docs_per_sec"])
    qspeedup = lo["query_sec"] / hi["query_sec"]
    result = {
        "n_docs": n_docs,
        "local8": lo,
        "local32": hi,
        "build_scaling_efficiency_8_to_32": round(eff, 3),
        "query_speedup_8_to_32": round(qspeedup, 3),
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured numbers\n\n"
            "Scaling evidence for the north_rule (N -> 4N executors), sandbox\n"
            "proxy: the SAME index-build + query job at local[8] vs local[32]\n"
            "(fresh JVM each), identical input "
            f"({n_docs} synthetic source-code docs, seed=42).\n\n"
            "| metric | local[8] | local[32] |\n|---|---|---|\n"
            f"| index build sec | {lo['build_sec']:.1f} | {hi['build_sec']:.1f} |\n"
            f"| index docs/sec | {lo['docs_per_sec']:.0f} | {hi['docs_per_sec']:.0f} |\n"
            f"| BM25 top-10 query sec (avg of 15) | {lo['query_sec']:.3f} | {hi['query_sec']:.3f} |\n\n"
            f"**Build scaling efficiency (8 -> 32 cores): "
            f"{eff:.3f}** (north_rule gate: >= 0.8 at 4x)\n\n"
            f"Query speedup 8 -> 32: {qspeedup:.2f}x\n\n"
            "Latest full bench line (sf0.1): see BENCH_r*.json recorded by the driver.\n"
        )


if __name__ == "__main__":
    main()
