"""Universal percolator verify path: candidate pruning + compiled
per-query verification (reference: PercolateQueryBuilder.java two-phase
candidate/verify weight; PercolatorFieldMapper extraction_result=failed
-> verify-every-doc).

The load-bearing property: for every query the FAST set-algebra path
accepts, forcing it through the verify path returns identical
(doc, query) pairs — the two phases implement one semantics.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.search.percolate import (
    extract_candidate_terms,
    percolate,
    percolate_verified,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en", 10.0),
            (2, "quick quick shard index merge", "en", 55.0),
            (3, "posting lists compress well", "de", 90.0),
            (4, "fox index shard routing", "fr", 30.0),
            (5, None, "en", None),
            (6, "brown shard", None, 70.0),
        ],
        "doc_id long, text string, lang string, score double",
    )


DECOMPOSABLE = [
    (1, {"term": {"text": "fox"}}),
    (2, {"terms": {"lang": ["en", "de"]}}),
    (3, {"match": {"text": {"query": "quick shard", "operator": "and"}}}),
    (4, {"match": {"text": {"query": "fox posting merge",
                            "minimum_should_match": 2}}}),
    (5, {"match_phrase": {"text": "quick brown"}}),
    (6, {"prefix": {"text": "post"}}),
    (7, {"wildcard": {"text": "sh?rd"}}),
    (8, {"range": {"score": {"gte": 50, "lt": 90}}}),
    (9, {"exists": {"field": "lang"}}),
    (10, {"bool": {"must": [{"term": {"lang": "en"}}],
                   "must_not": [{"term": {"text": "merge"}}]}}),
    (11, {"bool": {"should": [{"term": {"text": "fox"}},
                              {"term": {"text": "merge"}},
                              {"term": {"text": "compress"}}],
                   "minimum_should_match": 2}}),
    (12, {"constant_score": {"filter": {"term": {"text": "posting"}}}}),
]


def _pairs(df):
    return sorted((r["doc_id"], r["query_id"]) for r in df.collect())


def test_verify_path_matches_fast_path(spark, docs):
    """Every decomposable query: verify-forced == fast set algebra."""
    kw = dict(text_fields=["text"], keyword_fields=["lang"],
              numeric_fields=["score"])
    fast = percolate(spark, docs, DECOMPOSABLE, **kw)
    ver = percolate_verified(spark, docs, DECOMPOSABLE, mode="verify", **kw)
    assert _pairs(fast) == _pairs(ver)
    # and auto mode routes them all through the fast path, same answer
    auto = percolate_verified(spark, docs, DECOMPOSABLE, **kw)
    assert _pairs(auto) == _pairs(fast)


def test_pure_negative_and_double_negation(spark, docs):
    stored = [
        # pure-negative: refused by the fast path, verify-all here
        (1, {"bool": {"must_not": [{"match": {"text": "shard"}}]}}),
        # double negation: NOT(index AND NOT shard)
        (2, {"bool": {
            "must": [{"term": {"lang": "en"}}],
            "must_not": [{"bool": {
                "must": [{"match": {"text": "index"}}],
                "must_not": [{"match": {"text": "quick"}}]}}]}}),
    ]
    with pytest.raises(ValueError):
        percolate(spark, docs, stored, text_fields=["text"],
                  keyword_fields=["lang"])
    out = percolate_verified(spark, docs, stored, text_fields=["text"],
                             keyword_fields=["lang"])
    # q1: docs without token "shard" = 1, 3, 5 (null text never matches
    # the positive, so NOT matches)
    # q2: en docs = 1, 2, 5; doc 2 has index AND quick -> inner false
    #     -> kept; doc 1/5 no index -> kept
    assert _pairs(out) == [(1, 1), (1, 2), (2, 2), (3, 1), (5, 1), (5, 2)]


def test_regexp_fuzzy_ids_only_verify(spark, docs):
    stored = [
        (1, {"regexp": {"text": "shard(ing|s)?"}}),
        (2, {"fuzzy": {"lang": {"value": "enn", "fuzziness": 1}}}),
        (3, {"ids": {"values": [3, 5]}}),
    ]
    out = percolate_verified(spark, docs, stored, text_fields=["text"],
                             keyword_fields=["lang"])
    assert _pairs(out) == [(1, 2), (2, 1), (2, 2), (3, 3), (4, 1),
                           (5, 2), (5, 3), (6, 1)]


def test_nested_stored_query(spark):
    docs = spark.createDataFrame(
        [
            (1, "building", [("F", 100.0), ("O", 900.0)]),
            (2, "metal", [("O", 50.0)]),
            (3, "building", []),
            (4, "building", None),
            (5, "metal", [("F", 800.0), ("F", 20.0)]),
        ],
        "doc_id long, seg string, "
        "orders array<struct<status string, total double>>",
    )
    stored = [
        (1, {"nested": {"path": "orders", "query": {"bool": {"must": [
            {"term": {"orders.status": "F"}},
            {"range": {"orders.total": {"gte": 500}}}]}}}}),
        (2, {"bool": {
            "must": [{"term": {"seg": "building"}}],
            "must_not": [{"nested": {"path": "orders", "query":
                          {"term": {"orders.status": "O"}}}}]}}),
    ]
    out = percolate_verified(
        spark, docs, stored, text_fields=[], keyword_fields=["seg"],
        numeric_fields=[],
        nested_fields={"orders": {"keyword": ["status"],
                                  "numeric": ["total"]}})
    # q1: any order with status F and total >= 500 -> doc 5 only
    # q2: building docs with NO "O" order -> 3 (empty), 4 (null)
    assert _pairs(out) == [(3, 2), (4, 2), (5, 1)]


def test_candidate_extraction_rules():
    # conjunction: union of extractable conjuncts (any-of superset)
    got = extract_candidate_terms({"bool": {"must": [
        {"match": {"text": "quick fox"}},
        {"range": {"score": {"gte": 1}}}]}})
    assert got == frozenset({("text", "quick"), ("text", "fox")})
    # disjunction with a non-extractable disjunct: failed
    assert extract_candidate_terms({"bool": {"should": [
        {"term": {"text": "a"}}, {"range": {"score": {"gte": 1}}}],
        "minimum_should_match": 1}}) is None
    # must_not never constrains candidates: pure-negative fails
    assert extract_candidate_terms(
        {"bool": {"must_not": [{"term": {"text": "a"}}]}}) is None
    # numeric term has no term superset
    assert extract_candidate_terms(
        {"term": {"score": 5}}, numeric_fields={"score"}) is None
    # nested extracts through, keeping the dotted field path
    assert extract_candidate_terms(
        {"nested": {"path": "o", "query": {"term": {"o.status": "F"}}}}
    ) == frozenset({("o.status", "f")})
    # unsatisfiable conjunct -> empty candidate set
    assert extract_candidate_terms({"bool": {"must": [
        {"match_none": {}}, {"term": {"text": "a"}}]}}) == frozenset()


def test_pruning_is_lossless(spark, docs):
    """Candidate pruning must be a pure superset filter: results with
    pruning == results with every query forced to verify-all."""
    stored = [
        (1, {"bool": {"must": [{"match": {"text": "fox"}},
                               {"regexp": {"lang": "e."}}]}}),
    ]
    kw = dict(text_fields=["text"], keyword_fields=["lang"])
    pruned = percolate_verified(spark, docs, stored, mode="verify", **kw)

    import elasticsearch_spark.search.percolate as pp
    orig = pp.extract_candidate_terms
    try:
        pp.extract_candidate_terms = lambda *a, **k: None
        full = percolate_verified(spark, docs, stored, mode="verify", **kw)
    finally:
        pp.extract_candidate_terms = orig
    assert _pairs(pruned) == _pairs(full)


def test_function_score_wrapper_gates_on_inner(spark, docs):
    stored = [(1, {"function_score": {
        "query": {"bool": {"must_not": [{"term": {"lang": "en"}}]}},
        "functions": [{"weight": 3.0}]}})]
    out = percolate_verified(spark, docs, stored, text_fields=["text"],
                             keyword_fields=["lang"])
    assert _pairs(out) == [(3, 1), (4, 1), (6, 1)]


def test_unknown_field_raises(spark, docs):
    with pytest.raises(ValueError, match="not declared"):
        percolate_verified(
            spark, docs, [(1, {"bool": {"must_not": [
                {"term": {"nope": "x"}}]}})],
            text_fields=["text"], keyword_fields=["lang"])


def test_span_stored_queries_vs_eval_span(spark):
    """Span percolation cross-check: the compiled HOF predicates must
    agree with the reference span algebra (spans.eval_span) evaluated
    per doc on the same token positions."""
    import re as _re

    import numpy as np

    from elasticsearch_spark.search.spans import eval_span

    rng = np.random.default_rng(7)
    vocab = ["quick", "fox", "brown", "merge", "posting", "x"]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 12)))))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def st(t):
        return {"span_term": {"text": t}}

    stored = [
        (1, {"span_near": {"clauses": [st("quick"), st("fox")],
                           "slop": 1, "in_order": True}}),
        (2, {"span_near": {"clauses": [st("fox"), st("quick")],
                           "slop": 2, "in_order": False}}),
        (3, {"span_first": {"match": st("brown"), "end": 2}}),
        (4, {"span_or": {"clauses": [st("merge"), st("posting")]}}),
        (5, {"span_near": {"clauses": [st("quick"), st("x"), st("fox")],
                           "slop": 0, "in_order": True}}),
    ]
    out = percolate_verified(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())

    expected = []
    for doc_id, text in rows:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        pos = {}
        for p, t in enumerate(toks):
            pos.setdefault(("text", t), []).append(p)
        pos = {k: np.array(v) for k, v in pos.items()}
        for qid, tree in stored:
            if eval_span(tree, pos):
                expected.append((doc_id, qid))
    assert got == sorted(expected)


def test_span_near_mixed_fields_refuses(spark, docs):
    with pytest.raises(ValueError, match="share one field"):
        percolate_verified(
            spark, docs,
            [(1, {"span_near": {"clauses": [
                {"span_term": {"text": "fox"}},
                {"span_term": {"lang": "en"}}], "slop": 1}})],
            text_fields=["text"], keyword_fields=["lang"])


def test_intervals_stored_query(spark):
    """Intervals stored queries compile through the shared span
    compiler; verified against eval_span per doc."""
    import re as _re

    import numpy as np

    from elasticsearch_spark.search.spans import (
        _bind_field,
        eval_span,
        intervals_to_span,
    )

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 10)))))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stored = [
        (1, {"intervals": {"text": {"match": {
            "query": "alpha beta", "max_gaps": 1, "ordered": True}}}}),
        (2, {"intervals": {"text": {"any_of": {"intervals": [
            {"match": {"query": "gamma"}},
            {"match": {"query": "delta"}}]}}}}),
    ]
    out = percolate_verified(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())

    expected = []
    for doc_id, text in rows:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        pos = {}
        for p, t in enumerate(toks):
            pos.setdefault(("text", t), []).append(p)
        pos = {k: np.array(v) for k, v in pos.items()}
        for qid, dsl in stored:
            (_, body), = dsl.items()
            (field, src), = body.items()
            tree = _bind_field(intervals_to_span(src), field)
            if eval_span(tree, pos):
                expected.append((doc_id, qid))
    assert got == sorted(expected)


def test_percolate_stream_matches_static(spark, docs, tmp_path):
    """Streaming percolation: the stateless inline-predicate plan over
    a file-source stream produces exactly the static verify-path
    pairs, end-to-end through a memory sink."""
    from elasticsearch_spark.search.percolate import percolate_stream

    stored = [
        (1, {"bool": {"must_not": [{"match": {"text": "shard"}}]}}),
        (2, {"match_phrase": {"text": {"query": "quick fox",
                                       "slop": 2}}}),
        (3, {"bool": {"must": [{"term": {"lang": "en"}},
                               {"range": {"score": {"gte": 50}}}]}}),
    ]
    kw = dict(text_fields=["text"], keyword_fields=["lang"],
              numeric_fields=["score"])
    want = _pairs(percolate_verified(spark, docs, stored,
                                     mode="verify", **kw))

    src = str(tmp_path / "perc_src")
    docs.coalesce(2).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = percolate_stream(stream, stored, **kw)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("perc_alerts")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted((r["doc_id"], r["query_id"])
                 for r in spark.sql("SELECT * FROM perc_alerts").collect())
    assert got == want and want  # non-empty


def test_nested_span_compositions_vs_eval_span(spark):
    """NESTED span algebra through the verify path: span_or /
    span_near / span_not / span_within / span_containing composed
    under span_near, cross-checked against spans.eval_span per doc."""
    import re as _re

    import numpy as np

    from elasticsearch_spark.search.spans import eval_span

    rng = np.random.default_rng(11)
    vocab = ["quick", "fox", "brown", "merge", "posting", "x"]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(3, 14)))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def st(t):
        return {"span_term": {"text": t}}

    stored = [
        # span_or nested under span_near
        (1, {"span_near": {"clauses": [
            {"span_or": {"clauses": [st("quick"), st("brown")]}},
            st("fox")], "slop": 1, "in_order": True}}),
        # span_near nested under span_near (composite spans count
        # their whole width)
        (2, {"span_near": {"clauses": [
            {"span_near": {"clauses": [st("quick"), st("fox")],
                           "slop": 0, "in_order": True}},
            st("merge")], "slop": 3, "in_order": False}}),
        # span_not at the top
        (3, {"span_not": {
            "include": {"span_near": {"clauses": [st("quick"), st("fox")],
                                      "slop": 2, "in_order": True}},
            "exclude": st("brown")}}),
        # span_within / span_containing
        (4, {"span_within": {
            "little": st("posting"),
            "big": {"span_near": {"clauses": [st("merge"), st("x")],
                                  "slop": 4, "in_order": False}}}}),
        (5, {"span_containing": {
            "little": st("x"),
            "big": {"span_near": {"clauses": [st("fox"), st("brown")],
                                  "slop": 5, "in_order": False}}}}),
        # span_first over a nested or
        (6, {"span_first": {"match": {"span_or": {"clauses": [
            st("merge"), st("fox")]}}, "end": 3}}),
    ]
    out = percolate_verified(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())

    expected = []
    for doc_id, text in rows:
        toks = _re.findall(r"[a-z0-9_]+", text.lower())
        pos = {}
        for p, t in enumerate(toks):
            pos.setdefault(("text", t), []).append(p)
        pos = {k: np.array(v) for k, v in pos.items()}
        for qid, tree in stored:
            if eval_span(tree, pos):
                expected.append((doc_id, qid))
    assert got == sorted(expected)


def test_span_field_masking_verify(spark):
    """span_field_masking: positions come from the inner field, the
    mask only satisfies the shared-field rule."""
    rows = [(1, "quick fox", "fox quick"), (2, "fox brown", "quick fox")]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, alt string")
    stored = [
        (1, {"span_near": {"clauses": [
            {"span_term": {"text": "quick"}},
            {"span_field_masking": {
                "query": {"span_term": {"alt": "quick"}},
                "field": "text"}}],
            "slop": 2, "in_order": False}}),
    ]
    out = percolate_verified(spark, docs, stored,
                             text_fields=["text", "alt"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    # doc 1: text quick@0, alt quick@1 -> distinct positions, near ok
    # doc 2: text has no 'quick'; alt quick@0 -> missing clause
    assert got == [(1, 1)]
