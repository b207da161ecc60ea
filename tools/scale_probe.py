"""One-off probe: where does build time go at pinned 2 vs 8 cores?

Runs the scaling_bench child shape once per level (fresh JVM, taskset
pin), printing the builder's phase_ms breakdown so the non-scaling
phase is identified by measurement instead of guesswork.
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

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
shards = max(32, n_docs // 8000)
spark = get_spark(f"probe{{cores}}", cores=cores, shuffle_partitions=2 * shards)
corpus = generate_corpus(spark, n_docs, seed=42, partitions=2 * shards).cache()
corpus.count()
out = tempfile.mkdtemp(prefix=f"probe_idx_{{cores}}_")
t0 = time.time()
idx = build_index(corpus, out, fields={{"content": "code"}},
                  num_partitions=shards, id_cols=["repo", "path", "commit"],
                  input_snapshot="probe")
build_sec = time.time() - t0
with open(os.path.join(out, "index_meta.json")) as f:
    meta = json.load(f)
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cores": cores, "build_sec": build_sec,
                   "docs_per_sec": n_docs / build_sec,
                   "phase_ms": meta.get("phase_ms", {{}})}}))
"""


def one(cores: int, n_docs: int) -> dict:
    code = CHILD.format(repo=REPO)
    cmd = [sys.executable, "-c", code, str(cores), str(n_docs)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                          env={**os.environ, "SPARK_DRIVER_MEM": "24g"})
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"child (cores={cores}) failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    for cores in (2, 8):
        r = one(cores, n_docs)
        print(json.dumps(r))
