"""Lucene expression scripts (modules/lang-expression): translation
onto the painless transpiler, dual-dialect SQL identity, score/sort
integration, subset refusal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.scripts import (
    ExpressionError,
    compile_expression,
    expression_column,
)


def test_unprefixed_math_and_constants():
    sql = compile_expression("ln(doc['v'].value) + sqrt(4) * PI")
    assert "ln(" in sql and "pi()" in sql
    got = compile_expression("logn(2, 8.0)")
    assert "ln" in got  # logn(base,x) = ln(x)/ln(base)


def test_expression_evaluates_like_python(spark):
    df = spark.createDataFrame([(1, 9.0, 2.0)], "doc_id long, v double, w double")
    out = df.select(
        expression_column(
            "max(ln(doc['v'].value), 0) * pow(doc['w'].value, 2)"
            " + min(doc['v'].value, 5.0)").alias("s"))
    want = max(math.log(9.0), 0) * 2.0 ** 2 + min(9.0, 5.0)
    assert abs(out.first()["s"] - want) < 1e-12


def test_dialect_twin_agrees(spark):
    import duckdb

    src = ("doc['v'].value > 3 ? ln(doc['v'].value) * params.boost"
           " : sqrt(abs(doc['v'].value))")
    params = {"boost": 2.5}
    df = spark.createDataFrame(
        [(i, float(i - 3)) for i in range(8)], "doc_id long, v double")
    got = [round(r["s"], 10) for r in df.select(
        F.expr(compile_expression(src, params)).alias("s")).collect()]
    duck = duckdb.connect()
    duck.register("t", df.toPandas())
    want = [round(r[0], 10) for r in duck.execute(
        f"SELECT {compile_expression(src, params, dialect='duckdb')} AS s"
        " FROM t ORDER BY doc_id").fetchall()]
    assert got == want


def test_unsupported_functions_refuse():
    with pytest.raises(ExpressionError, match="no SQL twin"):
        compile_expression("sinh(doc['v'].value)")
    with pytest.raises(ExpressionError):
        compile_expression("ln(doc['v'].value")  # unbalanced


def test_function_score_lang_expression(spark):
    from elasticsearch_spark.search.api import _function_value

    hits = spark.createDataFrame(
        [(1, 1.0, 10.0), (2, 2.0, 100.0)],
        "doc_id long, score double, pop double")
    cond, val = _function_value(
        {"script_score": {"script": {
            "lang": "expression",
            "source": "_score * log10(doc['pop'].value)"}}})
    rows = {r["doc_id"]: r["s"] for r in
            hits.select("doc_id", val.alias("s")).collect()}
    assert abs(rows[1] - 1.0) < 1e-12 and abs(rows[2] - 4.0) < 1e-12


def test_stored_expression_script_validates(tmp_path):
    from elasticsearch_spark.scripts.painless import put_stored_script

    put_stored_script(str(tmp_path), "exp1",
                      "ln(doc['v'].value) + params.b", lang="expression")
    with pytest.raises(ExpressionError):
        put_stored_script(str(tmp_path), "bad",
                          "cosh(doc['v'].value)", lang="expression")
