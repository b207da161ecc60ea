"""Interleaved A/B: encode-stage parallelism pinning on vs off.

The sandbox host drifts 2-5x between runs minutes apart, so the only
reliable comparison is ALTERNATING fresh-JVM builds of the same corpus
(noise hits both arms equally). Usage:

    python tools/encode_pin_ab.py [n_docs] [cores] [rounds]

Appends the measured table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from elasticsearch_spark.session import get_spark
from elasticsearch_spark.corpus import generate_corpus
from elasticsearch_spark.index.builder import build_index

cores, n_docs = int(sys.argv[1]), int(sys.argv[2])
shards = max(32, n_docs // 8000)
spark = get_spark(f"ab{{cores}}", cores=cores, shuffle_partitions=2 * shards)
corpus = generate_corpus(spark, n_docs, seed=42,
                         partitions=2 * shards).cache()
corpus.count()
out = tempfile.mkdtemp(prefix="ab_idx_")
t0 = time.time()
build_index(corpus, out, fields={{"content": "code"}},
            num_partitions=shards, id_cols=["repo", "path", "commit"],
            input_snapshot="ab")
print(json.dumps({{"build_sec": time.time() - t0}}))
"""


def one(cores: int, n_docs: int, pin: bool) -> float:
    env = dict(os.environ, ES_SPARK_PIN_ENCODE="1" if pin else "0")
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1800, env=env)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        raise RuntimeError("child failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])["build_sec"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pin_on, pin_off = [], []
    for i in range(rounds):
        pin_off.append(one(cores, n_docs, False))
        pin_on.append(one(cores, n_docs, True))
        sys.stderr.write(
            f"round {i + 1}/{rounds}: off={pin_off[-1]:.1f}s "
            f"on={pin_on[-1]:.1f}s\n")
    out = {
        "n_docs": n_docs, "cores": cores,
        "pin_off_sec": sorted(round(v, 1) for v in pin_off),
        "pin_on_sec": sorted(round(v, 1) for v in pin_on),
        "best_ratio_off_over_on": round(min(pin_off) / min(pin_on), 3),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Encode-pin interleaved A/B — {n_docs:,} docs, "
            f"local[{cores}], {rounds} alternating fresh-JVM rounds\n\n"
            f"| arm | build sec (sorted) | best |\n|---|---|---|\n"
            f"| AQE-coalesced (pin off) | {out['pin_off_sec']} | "
            f"{min(pin_off):.1f} |\n"
            f"| pinned (shards x fields) | {out['pin_on_sec']} | "
            f"{min(pin_on):.1f} |\n\n"
            f"**best-of ratio off/on: {out['best_ratio_off_over_on']}** "
            f"(>1 means pinning wins).\n"
        )


if __name__ == "__main__":
    main()
