"""DLS/FLS security filtering (x-pack security authz): disjunction
semantics, union-FLS, index scoping, scan-level enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.ops.security import (
    Role,
    dls_predicate,
    dls_predicate_sql,
    field_visible,
    role_applies,
    secured_search,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i % 7} text", ["en", "de", "fr"][i % 3], i * 13 % 1000)
        for i in range(300)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).cache()


R_RANGE = Role("reader_mid", indices=("docs*",),
               query={"range": {"n_chars": {"gte": 200, "lt": 600}}})
R_EN = Role("reader_en", indices=("docs", "logs-*"),
            query={"term": {"lang": "en"}},
            grant=("lang", "n_*"), except_=("n_tokens",))
R_ALL = Role("superuser", indices=("*",))


def test_role_applies_patterns():
    assert role_applies(R_RANGE, "docs")
    assert role_applies(R_RANGE, "docs-2026")
    assert not role_applies(R_EN, "documents")
    assert role_applies(R_EN, "logs-web")


def test_field_visible_union_and_metadata():
    # union: R_RANGE grants * so everything is visible with both roles
    assert field_visible("text", [R_RANGE, R_EN])
    # R_EN alone: grant lang/n_* except n_tokens; doc_id is metadata
    assert field_visible("lang", [R_EN])
    assert field_visible("n_chars", [R_EN])
    assert not field_visible("n_tokens", [R_EN])
    assert not field_visible("text", [R_EN])
    assert field_visible("doc_id", [R_EN])


def test_dls_disjunction(docs):
    got = {r["doc_id"] for r in
           docs.filter(dls_predicate([R_RANGE, R_EN])).collect()}
    want = {r["doc_id"] for r in docs.collect()
            if (200 <= r["n_chars"] < 600) or r["lang"] == "en"}
    assert got == want and got


def test_role_without_query_grants_all(docs):
    assert docs.filter(dls_predicate([R_RANGE, R_ALL])).count() == 300
    # and no applicable roles -> no documents
    assert docs.filter(dls_predicate([])).count() == 0


def test_secured_search_scopes_and_prunes(docs):
    out = secured_search(docs, [R_RANGE, R_EN, R_ALL], index="docs")
    # R_ALL grants all docs and all fields, so full access
    assert out.count() == 300 and set(out.columns) == set(docs.columns)
    # only R_EN applies to logs-*: DLS term filter + FLS pruning
    out = secured_search(docs, [R_RANGE, R_EN], index="logs-web")
    assert set(out.columns) == {"doc_id", "lang", "n_chars"}
    assert out.filter(F.col("lang") != "en").count() == 0
    assert out.count() == 100
    with pytest.raises(PermissionError):
        secured_search(docs, [R_RANGE, R_EN], index="secrets")


def test_dls_sql_twin(docs):
    import duckdb

    def sql_for(q):
        if "range" in q:
            f, spec = next(iter(q["range"].items()))
            return f"{f} >= {spec['gte']} AND {f} < {spec['lt']}"
        f, v = next(iter(q["term"].items()))
        return f"{f} = '{v}'"

    pred = dls_predicate_sql([R_RANGE, R_EN], sql_for)
    duck = duckdb.connect()
    duck.register("d", docs.toPandas())
    want = {r[0] for r in duck.execute(
        f"SELECT doc_id FROM d WHERE {pred}").fetchall()}
    got = {r["doc_id"] for r in
           docs.filter(dls_predicate([R_RANGE, R_EN])).collect()}
    assert got == want
    assert dls_predicate_sql([R_ALL, R_EN], sql_for) == "TRUE"
    assert dls_predicate_sql([], sql_for) == "FALSE"


def test_fls_prunes_parquet_scan(docs, tmp_path):
    # FLS lands as ReadSchema pruning, not post-fetch stripping
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    out = secured_search(
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
        .read.parquet(p),
        [R_EN], index="docs")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[-1]
