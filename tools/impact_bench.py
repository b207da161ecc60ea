"""Three-way interleaved A/B on ONE 1M-doc index:

  prune_off            — exhaustive scoring
  prune_on / impact    — block restriction + impact-ordered last-term
                         scan with chunked theta refresh (r4)
  prune_on / no-impact — block restriction only (r3 behavior)

Separates what impact ordering adds from what plain restriction adds,
on the same build (host noise protocol: interleave, best-of-N).

Usage: python tools/impact_bench.py [n_docs] [cores]
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

    from elasticsearch_spark.analysis import analyze
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import build_index, load_index
    from elasticsearch_spark.search import executor
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.executor import match_topk
    from elasticsearch_spark.session import get_spark

    # overridable: FAT shards (fewer, longer posting lists) put the
    # query in the decode+score-bound regime where pruning can show a
    # wall-clock win; the default ~8k-docs/shard sizing is the BUILD
    # sweet spot but leaves queries overhead-bound at sandbox scale
    shards = (int(sys.argv[3]) if len(sys.argv) > 3
              else max(32, n_docs // 8000))
    spark = get_spark("impact", cores=cores, shuffle_partitions=2 * shards)
    corpus = generate_corpus(spark, n_docs, seed=42,
                             partitions=2 * shards).cache()
    corpus.count()
    out = tempfile.mkdtemp(prefix="impact_idx_")
    build_index(corpus, out, fields={"content": "code"},
                num_partitions=shards,
                id_cols=["repo", "path", "commit"],
                input_snapshot="impact")
    corpus.unpersist()
    idx = load_index(spark, out).cache()

    exact = BM25Params(quantize_norms=False)
    queries = {
        "single_common": "import",
        "single_mid": "parseIndex",
        "common3": "import return static",
        "mixed4": "parseIndex scanBuffer read token",
    }
    variants = {
        "prune_off": (False, True),
        "prune_impact": (True, True),
        "prune_noimpact": (True, False),
    }
    results: dict[str, dict[str, float]] = {}
    for qname, qtext in queries.items():
        terms = [t for t, _ in analyze(qtext, "code")]
        expect = None
        for vname, (pr, imp) in variants.items():
            executor.IMPACT_ORDERING = imp
            got = [(r["doc_id"], round(r["score"], 6)) for r in
                   match_topk(idx, "content", terms, k=10, params=exact,
                              prune=pr).collect()]
            if expect is None:
                expect = got
            assert got == expect, (qname, vname)
        samples = {v: [] for v in variants}
        for _ in range(7):
            for vname, (pr, imp) in variants.items():
                executor.IMPACT_ORDERING = imp
                t0 = time.time()
                match_topk(idx, "content", terms, k=10, params=exact,
                           prune=pr).collect()
                samples[vname].append(time.time() - t0)
        executor.IMPACT_ORDERING = True
        results[qname] = {v: round(min(s), 3) for v, s in samples.items()}
    shutil.rmtree(out, ignore_errors=True)

    payload = {"n_docs": n_docs, "cores": cores, "shards": shards,
               "impact_ab": results}
    print(json.dumps(payload))

    lines = [
        f"\n## Impact-ordering three-way A/B ({n_docs:,} docs, "
        f"local[{cores}], {shards} shards)\n\n",
        "Same index, interleaved best-of-7, identical top-10 asserted.\n\n",
        "| query | prune off (s) | prune+impact (s) | prune no-impact (s) |\n"
        "|---|---|---|---|\n",
    ]
    for qname, row in results.items():
        lines.append(
            f"| {qname} | {row['prune_off']} | {row['prune_impact']} "
            f"| {row['prune_noimpact']} |\n")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.writelines(lines)


if __name__ == "__main__":
    main()
