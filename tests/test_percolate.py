"""Percolator tests: requirement decomposition + join-based matching.

Reference semantics: modules/percolator/.../PercolateQueryBuilder.java
(extraction + verify); here matching is a requirement-table join and
the DuckDB twin replays the identical algebra.
"""

from __future__ import annotations

import duckdb
import pytest

from elasticsearch_spark.search.percolate import (
    decompose_queries,
    percolate,
    percolate_requirements_sql,
)

SF = "/root/testdata/sf0.001"


def test_decompose_bool_groups():
    terms, pats, _phr, ranges, groups = decompose_queries([
        ("a", {"bool": {"must": [
            {"term": {"lang": "EN"}},
            {"match": {"text": {"query": "alpha beta", "operator": "and"}}},
            {"range": {"n": {"gte": 1, "lt": 5}}},
        ]}}),
    ])
    assert [(r[2], r[3]) for r in terms] == [
        ("lang", "en"), ("text", "alpha"), ("text", "beta")]
    assert ranges == [("a", 2, "n", 1.0, 5.0, False, True)]
    # msm: term group 1, match-and group 2, range marker 0
    assert [(g[1], g[2]) for g in groups] == [(0, 1), (1, 2), (2, 0)]


def test_decompose_rejects_unknown_kind():
    with pytest.raises(ValueError):
        decompose_queries([(1, {"fancy": {"x": 1}})])


def test_percolate_matches_duckdb_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stored = [
        (1, {"match": {"text": "table scan"}}),
        (2, {"match": {"text": {"query": "window merge filter",
                                "operator": "and"}}}),
        (3, {"bool": {"must": [
            {"terms": {"lang": ["fr", "de"]}},
            {"range": {"n_chars": {"gte": 100, "lte": 400}}}]}}),
    ]
    got = percolate(
        spark, docs, stored, text_fields=["text"],
        keyword_fields=["lang"], numeric_fields=["n_chars"],
    ).toPandas().astype("int64")
    got = got.sort_values(["doc_id", "query_id"]).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(percolate_requirements_sql(
        stored, keyword_fields=["lang"], numeric_fields=["n_chars"],
    )).df().astype("int64")
    want = want.sort_values(["doc_id", "query_id"]).reset_index(drop=True)
    assert len(got) > 0
    assert got.equals(want)


def test_percolate_msm_and_conjunction(spark):
    # one doc, hand-checkable: msm=2 of 3 terms; range must also hold
    docs = spark.createDataFrame(
        [(1, "alpha beta other", 10), (2, "alpha only here", 10),
         (3, "alpha beta gamma", 999)],
        "doc_id long, text string, n long")
    stored = [
        (7, {"bool": {"must": [
            {"match": {"text": {"query": "alpha beta gamma",
                                "minimum_should_match": 2}}},
            {"range": {"n": {"lte": 100}}}]}}),
    ]
    out = percolate(spark, docs, stored, text_fields=["text"],
                    numeric_fields=["n"]).toPandas()
    assert sorted(out["doc_id"].tolist()) == [1]


def test_decompose_must_not_and_filter_maps_to_groups():
    import pytest

    from elasticsearch_spark.search.percolate import decompose_queries

    # must_not -> complemented group (neg flag set)
    t, _pt, _phr, _r, g = decompose_queries([(1, {"bool": {
        "must": [{"term": {"lang": "en"}}],
        "must_not": [{"term": {"lang": "fr"}}]}})])
    assert len(g) == 2 and len(t) == 2
    assert sorted(neg for _q, _gid, _m, neg in g) == [False, True]
    # pure-negative queries would need a per-query corpus anti-join
    with pytest.raises(ValueError, match="only must_not"):
        decompose_queries([(1, {"bool": {
            "must_not": [{"term": {"lang": "fr"}}]}})])
    # NOT(AND of groups) is not flat -> nested must/filter bool refused
    with pytest.raises(ValueError, match="single-group"):
        decompose_queries([(1, {"bool": {
            "must": [{"term": {"lang": "en"}}],
            "must_not": [{"bool": {"must": [
                {"term": {"lang": "fr"}},
                {"term": {"source": "s"}}]}}]}})])
    # bool.filter participates exactly like must (filter context has
    # identical matching semantics for percolation)
    t, _pt, _phr, r, g = decompose_queries([(1, {"bool": {
        "filter": [{"term": {"lang": "en"}},
                   {"range": {"n": {"gte": 5}}}]}})])
    assert len(g) == 2 and len(t) == 1 and len(r) == 1
    # should-only bool has disjunctive semantics we do not decompose
    with pytest.raises(ValueError, match="should"):
        decompose_queries([(1, {"bool": {
            "should": [{"term": {"lang": "en"}}]}})])


def test_percolate_validates_numeric_fields(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha", 10)], "doc_id long, text string, n long")
    stored = [(7, {"range": {"n": {"gte": 5}}})]
    with pytest.raises(ValueError, match="numeric_fields"):
        percolate(spark, docs, stored, text_fields=["text"],
                  numeric_fields=[])
    with pytest.raises(ValueError, match="numeric_fields"):
        percolate(spark, docs, stored, text_fields=["text"],
                  numeric_fields=["other"])


def test_decompose_prefix_wildcard_and_should_msm():
    t, p, _phr, r, g = decompose_queries([
        (1, {"prefix": {"text": "tab"}}),
        (2, {"wildcard": {"text": "sc*n_?"}}),
        (3, {"bool": {
            "should": [{"term": {"lang": "en"}},
                       {"terms": {"lang": ["fr", "de"]}},
                       {"prefix": {"text": "mer"}}],
            "minimum_should_match": 2}}),
    ])
    assert p[0] == (1, 0, "text", "tab%", 0)
    assert p[1] == (2, 0, "text", "sc%n\\__", 0)
    # should group: term clause 0, both terms-values clause 1, prefix 2
    assert [(x[3], x[4]) for x in t if x[0] == 3] == [
        ("en", 0), ("fr", 1), ("de", 1)]
    assert (3, 0, "text", "mer%", 2) in p
    assert (3, 0, 2, False) in g


def test_percolate_prefix_wildcard_should(spark):
    import duckdb

    docs = spark.createDataFrame(
        [(1, "alpha table xyz", "en"), (2, "merge scan here", "fr"),
         (3, "scan_7 only", "zh"), (4, "nothing else", "de")],
        "doc_id long, text string, lang string")
    stored = [
        (10, {"prefix": {"text": "tab"}}),            # doc 1
        (11, {"wildcard": {"text": "scan_?"}}),       # doc 3
        (12, {"bool": {"should": [
            {"term": {"lang": "en"}},
            {"prefix": {"text": "mer"}},
            {"term": {"text": "scan"}}],
            "minimum_should_match": 2}}),             # doc 2 (mer+scan)
    ]
    out = percolate(spark, docs, stored, text_fields=["text"],
                    keyword_fields=["lang"]).toPandas()
    got = sorted(map(tuple, out[["doc_id", "query_id"]].to_numpy()))
    assert got == [(1, 10), (2, 12), (3, 11)]
    # DuckDB twin agrees
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)",
                    [(1, "alpha table xyz", "en"),
                     (2, "merge scan here", "fr"),
                     (3, "scan_7 only", "zh"), (4, "nothing else", "de")])
    want = sorted(map(tuple, con.execute(percolate_requirements_sql(
        stored, table="d", text_fields=["text"], keyword_fields=["lang"],
    )).fetchall()))
    assert got == want


def test_percolate_match_phrase(spark):
    """match_phrase stored queries: contiguous analyzed-token
    containment (slop=0), verified against the DuckDB twin."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "quick brown dog"),
         (3, "brown quick fox"),          # terms present, order wrong
         (4, "a QUICK, brown: fox here")],  # analyzer normalizes
        "doc_id long, text string")
    stored = [
        (1, {"match_phrase": {"text": "quick brown fox"}}),
        (2, {"bool": {"must": [
            {"match_phrase": {"text": "brown fox"}},
            {"term": {"text": "jumps"}}]}}),
    ]
    out = percolate(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (4, 1)]

    import duckdb as _dd
    con = _dd.connect()
    con.register("documents", docs.toPandas())
    want = sorted(map(tuple, con.execute(percolate_requirements_sql(
        stored)).fetchall()))
    assert got == [(int(a), int(b)) for a, b in want]

    with pytest.raises(ValueError, match="slop"):
        decompose_queries([(1, {"match_phrase": {
            "text": {"query": "a b", "slop": 1}}})])
    with pytest.raises(ValueError, match="text_fields"):
        percolate(spark, docs,
                  [(1, {"match_phrase": {"title": "x y"}})],
                  text_fields=["text"])


def test_decompose_queries_df_distributed(spark):
    """Distributed decomposition: DataFrame-in, requirement
    DataFrames out; equals the in-memory decomposition; poison
    queries land in errors instead of killing the job."""
    import json

    from elasticsearch_spark.search.percolate import (
        decompose_queries, decompose_queries_df,
    )

    stored = [
        (1, {"match": {"text": "alpha beta"}}),
        (2, {"bool": {"must": [
            {"term": {"lang": "en"}},
            {"range": {"n": {"gte": 1.5, "lt": 9}}}]}}),
        (3, {"match_phrase": {"text": "quick fox"}}),
        (4, {"prefix": {"text": "tab"}}),
    ]
    rows = [(qid, json.dumps(dsl)) for qid, dsl in stored]
    rows.append((99, json.dumps({"fancy": {"x": 1}})))  # poison
    df = spark.createDataFrame(rows, "query_id long, dsl string")
    out = decompose_queries_df(df.repartition(3))

    t, p, ph, r, g = decompose_queries(stored)
    assert sorted(map(tuple, (tuple(x) for x in
                              out["terms"].collect()))) == sorted(t)
    assert sorted(tuple(x) for x in out["patterns"].collect()) == sorted(p)
    assert sorted(tuple(x) for x in out["phrases"].collect()) == sorted(ph)
    assert sorted(tuple(x) for x in out["ranges"].collect()) == sorted(r)
    assert sorted(tuple(x) for x in out["groups"].collect()) == sorted(g)
    errs = out["errors"].collect()
    assert len(errs) == 1 and errs[0]["query_id"] == 99
    assert "fancy" in errs[0]["error"]


def test_percolate_prepared_matches_inline(spark):
    """percolate_prepared over decompose_queries_df output == the
    in-memory percolate() — the persist-once scale path end to end."""
    import json

    from elasticsearch_spark.search.percolate import (
        decompose_queries_df, percolate_prepared,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stored = [
        (1, {"match": {"text": "table scan"}}),
        (2, {"bool": {"must": [
            {"terms": {"lang": ["fr", "de"]}},
            {"range": {"n_chars": {"gte": 100, "lte": 400}}}]}}),
        (3, {"match_phrase": {"text": "the index"}}),
        (4, {"prefix": {"text": "tabl"}}),
    ]
    reqs = decompose_queries_df(spark.createDataFrame(
        [(q, json.dumps(d)) for q, d in stored], "query_id long, dsl string"))
    got = percolate_prepared(
        spark, docs, reqs, text_fields=["text"],
        keyword_fields=["lang"], numeric_fields=["n_chars"])
    want = percolate(
        spark, docs, stored, text_fields=["text"],
        keyword_fields=["lang"], numeric_fields=["n_chars"])
    g = sorted((r["doc_id"], r["query_id"]) for r in got.collect())
    w = sorted((r["doc_id"], r["query_id"]) for r in want.collect())
    assert g == w and g
    # non-broadcast (big-registry) path agrees too
    got2 = percolate_prepared(
        spark, docs, reqs, text_fields=["text"],
        keyword_fields=["lang"], numeric_fields=["n_chars"],
        broadcast_reqs=False)
    assert sorted((r["doc_id"], r["query_id"])
                  for r in got2.collect()) == w


def test_percolate_must_not_end_to_end(spark):
    """must-coverage AND NOT must_not-coverage (complemented groups;
    PercolateQueryBuilder.java:83 verification semantics)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta", "en", 10),
         (2, "alpha error", "en", 10),
         (3, "alpha beta", "fr", 10),
         (4, "alpha beta", "en", 500)],
        "doc_id long, text string, lang string, n long")
    stored = [
        (1, {"bool": {"must": [{"match": {"text": "alpha"}}],
                      "must_not": [{"match": {"text": "error"}}]}}),
        (2, {"bool": {"must": [{"term": {"lang": "en"}}],
                      "must_not": [{"range": {"n": {"gte": 100}}}]}}),
        (3, {"bool": {"must": [{"match": {"text": "alpha"}}],
                      "must_not": [{"term": {"lang": "fr"}},
                                   {"prefix": {"text": "err"}}]}}),
    ]
    out = percolate(spark, docs, stored, text_fields=["text"],
                    keyword_fields=["lang"], numeric_fields=["n"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    assert got == [(1, 1), (1, 2), (1, 3), (2, 2), (3, 1), (4, 1), (4, 3)]


def test_percolate_scoring_wrappers_transparent(spark):
    """function_score / constant_score / boosting gate matching only
    through their inner query (QueryAnalyzer extracts through
    wrappers; percolation has no scores to modify)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma only")],
        "doc_id long, text string")
    stored = [
        (1, {"function_score": {"query": {"match": {"text": "alpha"}},
                                "functions": [{"weight": 3}]}}),
        (2, {"constant_score": {"filter": {"term": {"text": "gamma"}}}}),
        (3, {"boosting": {"positive": {"match": {"text": "beta"}},
                          "negative": {"match": {"text": "alpha"}},
                          "negative_boost": 0.2}}),
    ]
    out = percolate(spark, docs, stored, text_fields=["text"])
    got = sorted((r["doc_id"], r["query_id"]) for r in out.collect())
    assert got == [(1, 1), (1, 3), (2, 2)]


def test_decompose_exists_and_geo():
    _t, pats, _ph, ranges, groups = decompose_queries([
        ("e", {"exists": {"field": "tag"}}),
        ("g", {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 40.0, "lon": -100.0},
            "bottom_right": {"lat": -40.0, "lon": 60.0}}}}),
        ("x", {"geo_bounding_box": {"loc": {
            "top_left": (70.0, 150.0),
            "bottom_right": (-70.0, -150.0)}}}),
    ])
    # exists: match-any pattern + fully open range in the SAME group
    assert ("e", 0, "tag", "%", 0) in pats
    assert ("e", 0, "tag", None, None, False, False) in ranges
    # plain box: lat group + single-leg lon group
    assert ("g", 0, "loc.lat", -40.0, 40.0, False, False) in ranges
    assert ("g", 1, "loc.lon", -100.0, 60.0, False, False) in ranges
    # date-line box: lon group holds BOTH hemispheric legs
    x_lon = [r for r in ranges if r[0] == "x" and r[2] == "loc.lon"]
    assert {(r[3], r[4]) for r in x_lon} == {(150.0, None), (None, -150.0)}
    assert len({r[1] for r in x_lon}) == 1
    # geo under must_not is NOT(AND) -> refuses
    with pytest.raises(ValueError):
        decompose_queries([("n", {"bool": {
            "must": [{"term": {"lang": "en"}}],
            "must_not": [{"geo_bounding_box": {"loc": {
                "top_left": (1.0, -1.0), "bottom_right": (-1.0, 1.0)}}}],
        }})])


def test_percolate_exists_and_geo_matching(spark):
    """exists matches only docs with the field set (text, keyword, or
    numeric); geo boxes match by lat AND lon, date-line boxes by the
    strip union."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta", "t1", 5.0, 10.0, 20.0),
         (2, "gamma", None, None, 10.0, 170.0),
         (3, None, "t3", 2.0, 10.0, -170.0),
         (4, "delta", None, None, 60.0, 20.0)],
        "doc_id long, text string, tag string, num double,"
        " lat double, lon double",
    ).withColumn("loc", F.struct(F.col("lat").alias("lat"),
                                 F.col("lon").alias("lon")))
    stored = [
        (100, {"exists": {"field": "tag"}}),
        (101, {"exists": {"field": "num"}}),
        (102, {"exists": {"field": "text"}}),
        (103, {"geo_bounding_box": {"loc": {
            "top_left": (50.0, 0.0), "bottom_right": (0.0, 40.0)}}}),
        (104, {"geo_bounding_box": {"loc": {
            "top_left": (50.0, 160.0), "bottom_right": (0.0, -160.0)}}}),
    ]
    out = percolate(
        spark, docs, stored, text_fields=["text"], keyword_fields=["tag"],
        numeric_fields=["num", "loc.lat", "loc.lon"])
    got = {(r["doc_id"], r["query_id"]) for r in out.collect()}
    assert got == {(1, 100), (3, 100), (1, 101), (3, 101),
                   (1, 102), (2, 102), (4, 102),
                   (1, 103), (2, 104), (3, 104)}
