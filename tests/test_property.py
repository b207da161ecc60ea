"""Randomized engine-vs-oracle equivalence + skew behavior.

The reference's randomized-testing strategy (SURVEY.md §5.1,
AbstractQueryTestCase/AggregatorTestCase style): seeded random corpora
and queries, engine results must be rank- and score-identical to the
pure-Python oracle in BOTH scoring modes.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.index.builder import build_index, load_index
from elasticsearch_spark.oracle import oracle_topk
from elasticsearch_spark.search.bm25 import BM25Params
from elasticsearch_spark.search.executor import match_topk

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu getFoo setBar read_buf camelCaseX snake_case_y THE the"
).split()


def _random_corpus(rng: random.Random, n_docs: int) -> dict[int, str]:
    docs = {}
    for i in range(n_docs):
        n_tok = rng.randint(0, 60)
        docs[i] = " ".join(rng.choice(VOCAB) for _ in range(n_tok))
    # ensure a ubiquitous high-DF term and an empty doc
    docs[0] = ""
    for i in range(1, n_docs):
        docs[i] = docs[i] + " ubiq"
    return docs


@pytest.mark.parametrize("seed", [7, 23, 99])
@pytest.mark.parametrize("quantize", [True, False])
def test_random_corpus_rank_identical(spark, tmp_path, seed, quantize):
    rng = random.Random(seed)
    docs = _random_corpus(rng, 40)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    out = str(tmp_path / f"idx_{seed}_{quantize}")
    idx = build_index(df, out, fields={"text": "code"}, num_partitions=3,
                      input_snapshot=f"prop{seed}")
    params = BM25Params(quantize_norms=quantize)
    for _ in range(4):
        k = rng.choice([3, 10])
        n_terms = rng.randint(1, 4)
        qterms = [rng.choice(VOCAB + ["ubiq", "missingzz"]) for _ in range(n_terms)]
        op = rng.choice(["or", "and"])
        msm = rng.randint(1, n_terms) if op == "or" else 1
        got = match_topk(idx, "text", [t.lower() for t in _analyzed(qterms)],
                          k=k, operator=op, minimum_should_match=msm,
                          params=params).collect()
        want = oracle_topk(docs, " ".join(qterms), k=k, analyzer="code",
                            operator=op, minimum_should_match=msm, params=params)
        assert [r["doc_id"] for r in got] == [d for d, _ in want], (
            seed, qterms, op, msm,
        )
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9, abs_tol=1e-9)


def _analyzed(raw_terms):
    from elasticsearch_spark.analysis import analyze

    out = []
    for rt in raw_terms:
        out.extend(t for t, _ in analyze(rt, "code"))
    return out


def test_high_df_skew_balanced(spark, tmp_path):
    """A term present in EVERY doc must not hot-spot one partition:
    doc-hash routing spreads its postings across all parts."""
    rng = random.Random(5)
    rows = [
        (i, "ubiq " + " ".join(rng.choice(VOCAB) for _ in range(30)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "skew_idx")
    idx = build_index(df, out, fields={"text": "code"}, num_partitions=8,
                      input_snapshot="skew")
    per_part = {
        r["part_id"]: r["n"]
        for r in idx.postings.filter(F.col("term") == "ubiq")
        .groupBy("part_id").agg(F.sum("n").alias("n")).collect()
    }
    assert len(per_part) == 8, "ubiquitous term must appear in every partition"
    assert max(per_part.values()) <= 3 * min(per_part.values())
    # and the query on it is still rank-correct
    docs = {i: t for i, t in rows}
    got = match_topk(idx, "text", ["ubiq"], k=10,
                      params=BM25Params(quantize_norms=False)).collect()
    want = oracle_topk(docs, "ubiq", k=10, analyzer="code",
                        params=BM25Params(quantize_norms=False))
    assert [r["doc_id"] for r in got] == [d for d, _ in want]


def test_bulk_apply_random_batches_match_simulator(spark):
    """Randomized bulk batches: the set-algebra plan must equal a
    plain-Python dict simulator applying the same per-item contract."""
    rng = random.Random(1234)
    base = {i: (f"n{i}", i * 10) for i in range(30)}
    docs = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in base.items()],
        "doc_id long, name string, v long")

    from elasticsearch_spark.ops.bulk import bulk_apply

    for trial in range(5):
        ids = rng.sample(range(60), 12)
        actions, sim = [], dict(base)
        expect_results = []
        for did in ids:
            op = rng.choice(["index", "create", "update", "delete"])
            if op == "delete":
                actions.append({"delete": {"doc_id": did}})
                expect_results.append(
                    "deleted" if did in sim else "not_found")
                sim.pop(did, None)
            elif op == "index":
                actions.append({"index": {"doc_id": did,
                                          "name": f"x{did}", "v": 1}})
                expect_results.append(
                    "updated" if did in sim else "created")
                sim[did] = (f"x{did}", 1)
            elif op == "create":
                actions.append({"create": {"doc_id": did,
                                           "name": f"c{did}", "v": 2}})
                if did in sim:
                    expect_results.append(
                        "version_conflict_engine_exception")
                else:
                    expect_results.append("created")
                    sim[did] = (f"c{did}", 2)
            else:
                actions.append({"update": {"doc_id": did,
                                           "doc": {"v": 99}}})
                if did in sim:
                    expect_results.append("updated")
                    sim[did] = (sim[did][0], 99)
                else:
                    expect_results.append("document_missing_exception")
        out, items = bulk_apply(docs, actions)
        assert [i.get("result", i.get("error")) for i in items] == \
            expect_results, f"trial {trial}"
        got = {r["doc_id"]: (r["name"], r["v"]) for r in out.collect()}
        assert got == sim, f"trial {trial}"
