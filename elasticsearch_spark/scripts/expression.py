"""Lucene expression scripts (``"lang": "expression"``).

Reference: modules/lang-expression — ExpressionScriptEngine compiles a
javascript-like NUMERIC expression (org.apache.lucene.expressions.js.
JavascriptCompiler) over ``doc['field'].value`` bindings and ``_score``;
every value is a double, functions are the unprefixed Lucene math set
(``ln``, ``log10``, ``logn``, ``pow``, ``min``, ``max``, ...), and the
engine is only valid for scoring/sort/agg contexts (no mutation, no
statements — exactly an expression).

Spark-first shape: the grammar is a strict subset of the painless
EXPRESSION subset modulo surface spelling, so this module is a
token-level translation onto :func:`compile_painless` — unprefixed
function names gain their ``Math.`` spelling, ``logn(base, x)``
rewrites to ``Math.log(x) / Math.log(base)``, and the bare ``PI`` /
``E`` constants become ``Math.PI`` / ``Math.E``. The result is the
same dual-dialect SQL string every other script context uses (Spark
whole-stage codegen + the DuckDB oracle twin), so expression scripts
ride the fast path rather than a per-row engine.
"""

from __future__ import annotations

from typing import Any

from elasticsearch_spark.scripts.painless import (
    PainlessError,
    _tokenize,
    compile_painless,
)

__all__ = ["compile_expression", "expression_column", "ExpressionError"]


class ExpressionError(ValueError):
    """Script outside the supported lucene-expression subset."""


# unprefixed lucene-expression name -> painless Math.* spelling
# (JavascriptCompiler.DEFAULT_FUNCTIONS; the subset with a direct SQL
# twin — sinh/cosh/tanh/haversin raise)
_FN_TO_MATH = {
    "abs": "abs", "ceil": "ceil", "exp": "exp", "floor": "floor",
    "ln": "log", "log10": "log10", "sqrt": "sqrt", "cbrt": "cbrt",
    "pow": "pow", "min": "min", "max": "max", "sin": "sin",
    "cos": "cos", "tan": "tan", "atan": "atan", "atan2": "atan2",
    "signum": "signum", "round": "round",
}
_CONSTS = {"PI": "Math.PI", "E": "Math.E"}


def _translate(source: str) -> str:
    """Token-level rewrite of lucene-expression surface syntax into the
    painless expression subset (same tokenizer, so quoting/number edge
    cases can't diverge between the two languages)."""
    try:
        toks = _tokenize(source)
    except PainlessError as e:
        raise ExpressionError(str(e)) from None
    out: list[str] = []
    i = 0
    while i < len(toks):
        kind, text = toks[i]
        nxt = toks[i + 1][1] if i + 1 < len(toks) else ""
        prev = toks[i - 1][1] if i > 0 else ""
        if kind == "name" and prev != ".":
            if text == "logn" and nxt == "(":
                # logn(base, x) -> (Math.log(x) / Math.log(base)):
                # recurse on the two argument slices
                depth, j, comma = 1, i + 2, None
                while j < len(toks) and depth:
                    t = toks[j][1]
                    if t == "(":
                        depth += 1
                    elif t == ")":
                        depth -= 1
                    elif t == "," and depth == 1:
                        comma = j
                    j += 1
                if depth or comma is None:
                    raise ExpressionError("logn needs (base, x)")
                base = _detok(toks[i + 2:comma])
                x = _detok(toks[comma + 1:j - 1])
                out.append(f"( Math.log( {_translate(x)} ) / "
                           f"Math.log( {_translate(base)} ) )")
                i = j
                continue
            if text in _FN_TO_MATH and nxt == "(":
                out.append(f"Math.{_FN_TO_MATH[text]}")
                i += 1
                continue
            if text in _CONSTS and nxt != "(":
                out.append(_CONSTS[text])
                i += 1
                continue
            if text in ("sinh", "cosh", "tanh", "haversin") and nxt == "(":
                raise ExpressionError(
                    f"lucene-expression function {text!r} has no SQL twin")
        out.append(text)
        i += 1
    return " ".join(out)


def _detok(toks: list[tuple[str, str]]) -> str:
    return " ".join(t for _, t in toks)


def compile_expression(
    source: str,
    params: dict[str, Any] | None = None,
    score_col: str = "score",
    dialect: str = "spark",
) -> str:
    """Compile a lucene-expression script to a SQL expression string
    (same contract as :func:`compile_painless`, both dialects)."""
    try:
        return compile_painless(
            _translate(source), params, score_col, dialect)
    except PainlessError as e:
        raise ExpressionError(str(e)) from None


def expression_column(source: str, params: dict | None = None,
                      score_col: str = "score"):
    from pyspark.sql import functions as F

    return F.expr(compile_expression(source, params, score_col))
