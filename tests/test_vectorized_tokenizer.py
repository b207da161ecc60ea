"""Vectorized (flat) tokenizer == scalar reference path, exactly.

The flat analyzers and the numpy assembly kernels must produce the SAME
index bytes as the per-document reference path — checked at both the
analyzer level (token/position streams) and the built-index level
(posting blocks compared row-for-row)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from elasticsearch_spark.analysis.analyzers import (
    ANALYZERS,
    FLAT_ANALYZERS,
    analyze_flat,
)

TRICKY_TEXTS = [
    "",
    None,
    "the quick brown fox of the doom",
    "parseIndexBuffer readHTTPResponse snake_case_id x86_64",
    "MixedCASE123 foo_bar BAZ9qux",
    "  leading and trailing   spaces  ",
    "ünïcödé wörds Ünïcödé",
    "a" * 300 + " short " + "B" * 512,
    "tab\tsep\nnewline tokens",
    "repeat repeat repeat repeat",
    "1234 5678 90",
    "!!! ??? ,,,",
]


@pytest.mark.parametrize("analyzer", sorted(FLAT_ANALYZERS))
def test_flat_equals_scalar(analyzer):
    texts = pd.Series(TRICKY_TEXTS)
    d, t, p = analyze_flat(texts, analyzer)
    fn = ANALYZERS[analyzer]
    want_d, want_t, want_p = [], [], []
    for i, text in enumerate(texts.fillna("").tolist()):
        tt, pp = fn(text)
        want_d += [i] * len(tt)
        want_t += tt
        want_p += pp
    # same multiset per (doc, position); order within one position may
    # differ for overlap tokens — compare sorted triples
    got = sorted(zip(d.tolist(), p.tolist(), t.tolist()))
    want = sorted(zip(want_d, want_p, want_t))
    assert got == want


def test_flat_fallback_for_unregistered_analyzer():
    # analyzers without a flat variant route through the scalar loop
    texts = pd.Series(["a b", "c"])
    d, t, p = analyze_flat(texts, "keyword")
    assert t.tolist() == ["a b", "c"]
    assert d.tolist() == [0, 1] and p.tolist() == [0, 0]


@pytest.mark.parametrize("analyzer", ["code", "standard", "stop", "ascii_word"])
def test_built_index_identical_vectorized_vs_scalar(spark, tmp_path, analyzer):
    from elasticsearch_spark.corpus import generate_corpus
    from elasticsearch_spark.index.builder import (
        TOKENIZED_SCHEMA,
        _encode_blocks,
        _make_tokenizer,
        assign_doc_ids,
    )
    from pyspark.sql import functions as F

    corpus = assign_doc_ids(
        generate_corpus(spark, 120, seed=9), ["repo", "path", "commit"]
    ).withColumn("part_id", F.pmod(F.xxhash64("doc_id"), F.lit(3)).cast("int"))

    def blocks(vectorized):
        tok = corpus.select("part_id", "doc_id", "content").mapInPandas(
            _make_tokenizer({"content": analyzer}, vectorized=vectorized),
            schema=TOKENIZED_SCHEMA,
        )
        from pyspark.sql import functions as F  # noqa: F811
        from elasticsearch_spark.index.builder import BLOCKS_SCHEMA

        out = tok.groupBy("part_id", "field").applyInPandas(
            _encode_blocks, schema=BLOCKS_SCHEMA
        )
        rows = out.collect()
        tuples = [
            (
                r["part_id"], r["field"], r["term"], r["block_id"], r["n"],
                bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["dls"]),
                bytes(r["positions"]), r["max_tf"], r["min_dl"],
                r["sum_tf"], r["first_doc"], r["last_doc"],
            )
            for r in rows
        ]
        return sorted(tuples, key=lambda x: (x[0], x[1], str(x[2]), x[3]))

    assert blocks(True) == blocks(False)
