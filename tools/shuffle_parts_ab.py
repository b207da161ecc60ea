"""Interleaved A/B: query QPS at local[8] with shuffle_partitions 128
vs 32 over the same on-disk index. Per the host-noise protocol the two
variants alternate (fresh JVM each sample) so drift hits both equally.

Usage: python tools/shuffle_parts_ab.py [n_docs] [repeats] [partsA] [partsB]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from qps_bench import CHILD  # noqa: E402  (same measured child)


def one(cores: int, idx_dir: str, parts: int) -> float:
    env = dict(os.environ, SHUFFLE_PARTS=str(parts))
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), idx_dir],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:])
        raise RuntimeError("child failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])["qps"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    pa = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    pb = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index
    from elasticsearch_spark.session import get_spark

    shards = max(32, n_docs // 8000)
    spark = get_spark("abbuild", cores=16, shuffle_partitions=2 * shards)
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=2 * shards).cache()
    idx_dir = tempfile.mkdtemp(prefix="ab_idx_")
    build_index(corpus, idx_dir, fields={"content": "code"},
                num_partitions=shards, id_cols=["repo", "path", "commit"],
                input_snapshot="ab")
    spark.stop()

    a, b = [], []
    for i in range(repeats):
        a.append(one(8, idx_dir, pa))
        b.append(one(8, idx_dir, pb))
        sys.stderr.write(
            f"round {i + 1}/{repeats}: parts{pa}={a[-1]:.3f} "
            f"parts{pb}={b[-1]:.3f}\n")
    print(json.dumps({
        "n_docs": n_docs,
        f"qps_parts{pa}": sorted(round(v, 3) for v in a),
        f"qps_parts{pb}": sorted(round(v, 3) for v in b),
        f"best_{pa}": max(a), f"best_{pb}": max(b),
    }))


if __name__ == "__main__":
    main()
