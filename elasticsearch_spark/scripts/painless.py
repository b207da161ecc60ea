"""Painless expression subset -> portable SQL transpiler.

Reference: modules/lang-painless (PainlessScriptEngine / the ANTLR
grammar in modules/lang-painless/src/main/antlr — PUBLIC grammar
surface only; this is an independent recursive-descent implementation
of the EXPRESSION subset scripts actually use in script_score /
script_fields / runtime fields / bucket_script), plus the script-access
conventions documented for search scripts: ``doc['field'].value``,
``params.name``, ``_score``, ``Math.*``.

Design: scripts compile ONCE on the driver to a SQL expression string
that both Spark (``F.expr``) and DuckDB (the correctness oracle) can
run — the per-row work happens inside whole-stage codegen, never in a
Python interpreter. This is the engine's analogue of painless'
compile-to-JVM-bytecode: compile-to-Catalyst.

Supported grammar (C-like precedence, lowest first):

    ternary   ::= or ('?' ternary ':' ternary)?
    or        ::= and ('||' and)*
    and       ::= equality ('&&' equality)*
    equality  ::= relational (('=='|'!=') relational)*
    relational::= additive (('<'|'<='|'>'|'>=') additive)*
    additive  ::= multiplicative (('+'|'-') multiplicative)*
    multiplicative ::= unary (('*'|'/'|'%') unary)*
    unary     ::= ('-'|'!')* primary
    primary   ::= number | string | 'true' | 'false' | 'null'
                | '(' ternary ')'
                | 'doc' '[' string ']' ('.value' | '.empty' | '.size()')
                | 'params' ('.' ident | '[' string ']')
                | '_score' | '_doc_count' | ident
                | 'Math' '.' mathfn '(' args ')' | 'Math.PI' | 'Math.E'

``params`` values inline as literals at compile time (the reference
also binds them per-compilation — params changes don't recompile but
DO re-specialize; inlining is the Catalyst equivalent and lets the
optimizer constant-fold). ``doc['f'].size()`` emits ``size(f)`` under
Spark dialect and ``len(f)`` under DuckDB; everything else in the
subset emits IDENTICAL text for both engines.
"""

from __future__ import annotations

import json
import re
from typing import Any

__all__ = ["compile_painless", "maybe_painless", "painless_column",
           "painless_execute"]

_TOKEN_RE = re.compile(
    r"""
    (?P<num>\d+\.\d+|\d+\.?(?![.\w])|\.\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%<>!?:()\[\].,])
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)

# painless Math.* -> SQL function (identical in Spark SQL and DuckDB)
_MATH_FNS = {
    "log": ("ln", 1),
    "log10": ("log10", 1),
    "sqrt": ("sqrt", 1),
    "abs": ("abs", 1),
    "exp": ("exp", 1),
    "floor": ("floor", 1),
    "ceil": ("ceil", 1),
    "pow": ("power", 2),
    "max": ("greatest", 2),
    "min": ("least", 2),
    "sin": ("sin", 1),
    "cos": ("cos", 1),
    "tan": ("tan", 1),
    "atan": ("atan", 1),
    "atan2": ("atan2", 2),
    "round": ("round", 1),
    "signum": ("sign", 1),
    "cbrt": ("cbrt", 1),
}

_MATH_CONSTS = {"PI": "pi()", "E": "exp(1)"}


class PainlessError(ValueError):
    """Script outside the supported painless expression subset."""


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise PainlessError(f"painless: bad character at {src[i:i+10]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


def _sql_str(raw: str) -> str:
    """Painless string literal token -> SQL single-quoted literal."""
    body = raw[1:-1].replace("\\'", "'").replace('\\"', '"')
    return "'" + body.replace("'", "''") + "'"


def _lit(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise PainlessError(f"painless: unsupported params value {v!r}")


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]], params: dict,
                 score_col: str, dialect: str):
        self.toks = tokens
        self.pos = 0
        self.params = params
        self.score_col = score_col
        self.dialect = dialect

    def peek(self) -> tuple[str, str]:
        return self.toks[self.pos]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.next()
        if v != val:
            raise PainlessError(f"painless: expected {val!r}, got {v!r}")

    # -- precedence climb ------------------------------------------------
    def ternary(self) -> str:
        cond = self.or_()
        if self.peek()[1] == "?":
            self.next()
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return f"CASE WHEN {cond} THEN {a} ELSE {b} END"
        return cond

    def _binop(self, sub, ops: dict[str, str]) -> str:
        left = sub()
        while self.peek()[1] in ops:
            op = ops[self.next()[1]]
            left = f"({left} {op} {sub()})"
        return left

    def or_(self) -> str:
        return self._binop(self.and_, {"||": "OR"})

    def and_(self) -> str:
        return self._binop(self.equality, {"&&": "AND"})

    def equality(self) -> str:
        return self._binop(self.relational, {"==": "=", "!=": "<>"})

    def relational(self) -> str:
        return self._binop(
            self.additive, {"<": "<", "<=": "<=", ">": ">", ">=": ">="})

    def additive(self) -> str:
        return self._binop(self.multiplicative, {"+": "+", "-": "-"})

    def multiplicative(self) -> str:
        return self._binop(self.unary, {"*": "*", "/": "/", "%": "%"})

    def unary(self) -> str:
        k, v = self.peek()
        if v == "-":
            self.next()
            return f"(- {self.unary()})"
        if v == "!":
            self.next()
            return f"(NOT {self.unary()})"
        return self.primary()

    # -- primaries -------------------------------------------------------
    def primary(self) -> str:
        k, v = self.next()
        if k == "num":
            return v
        if k == "str":
            return _sql_str(v)
        if k == "op" and v == "(":
            inner = self.ternary()
            self.expect(")")
            return f"({inner})"
        if k != "name":
            raise PainlessError(f"painless: unexpected token {v!r}")
        if v in ("true", "false", "null"):
            return {"true": "TRUE", "false": "FALSE", "null": "NULL"}[v]
        if v == "doc":
            return self._doc_access()
        if v == "params":
            return self._params_access()
        if v == "Math":
            return self._math()
        if v == "_score":
            return self.score_col
        if v == "_doc_count":
            return "doc_count"
        # bare identifier: a runtime-field/bucket-path reference
        # (bucket_script paths arrive as bare names)
        return v

    def _doc_access(self) -> str:
        self.expect("[")
        k, fname = self.next()
        if k != "str":
            raise PainlessError("painless: doc[...] needs a string literal")
        self.expect("]")
        field = fname[1:-1]
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", field):
            raise PainlessError(f"painless: bad field name {field!r}")
        ref = field  # simple/dotted column reference, both dialects
        if self.peek()[1] != ".":
            return ref
        self.next()
        k, attr = self.next()
        if attr == "value":
            return ref
        if attr == "empty":
            return f"({ref} IS NULL)"
        if attr == "size":
            self.expect("(")
            self.expect(")")
            return (f"size({ref})" if self.dialect == "spark"
                    else f"len({ref})")
        if attr == "length":  # String.length() on a keyword value
            self.expect("(")
            self.expect(")")
            return f"length({ref})"
        raise PainlessError(f"painless: unsupported doc accessor .{attr}")

    def _params_access(self) -> str:
        k, v = self.next()
        if v == ".":
            k, name = self.next()
            if k != "name":
                raise PainlessError("painless: params. needs a name")
        elif v == "[":
            k, s = self.next()
            if k != "str":
                raise PainlessError("painless: params[...] needs a string")
            self.expect("]")
            name = s[1:-1]
        else:
            raise PainlessError("painless: bare params is not a value")
        if name not in self.params:
            raise PainlessError(f"painless: missing param {name!r}")
        return _lit(self.params[name])

    def _math(self) -> str:
        self.expect(".")
        k, name = self.next()
        if name in _MATH_CONSTS and self.peek()[1] != "(":
            return _MATH_CONSTS[name]
        if name not in _MATH_FNS:
            raise PainlessError(f"painless: unsupported Math.{name}")
        fn, arity = _MATH_FNS[name]
        self.expect("(")
        args = [self.ternary()]
        while self.peek()[1] == ",":
            self.next()
            args.append(self.ternary())
        self.expect(")")
        if len(args) != arity:
            raise PainlessError(
                f"painless: Math.{name} takes {arity} args, got {len(args)}")
        return f"{fn}({', '.join(args)})"


def compile_painless(
    source: str,
    params: dict | None = None,
    score_col: str = "score",
    dialect: str = "spark",
) -> str:
    """Compile a painless expression to a SQL expression string.

    ``dialect`` is ``"spark"`` or ``"duckdb"`` — identical output except
    for ``doc['f'].size()`` (``size`` vs ``len``). Raises
    :class:`PainlessError` outside the subset."""
    # `is not None`, not truthiness: the validation-time _AnyParams
    # mapping is empty-but-permissive
    p = _Parser(_tokenize(source),
                params if params is not None else {}, score_col, dialect)
    out = p.ternary()
    if p.peek()[0] != "eof":
        raise PainlessError(
            f"painless: trailing input at {p.peek()[1]!r}")
    return out


_MARKERS = re.compile(r"doc\[|params[.\[]|Math\.|_score\b|&&|\|\||\?")


def maybe_painless(source: str, params: dict | None = None,
                   score_col: str = "score") -> str:
    """Route a request script through the transpiler when it looks like
    painless (``doc['f']`` / ``params.x`` / ``Math.*`` / ``_score`` /
    ``&&``/``||``/ternary); otherwise pass it through as a raw SQL
    expression (the engine's native script dialect, like the
    reference's non-default ``"lang"`` values)."""
    if _MARKERS.search(source):
        return compile_painless(source, params, score_col)
    return source


def painless_column(source: str, params: dict | None = None,
                    score_col: str = "score"):
    """Compile straight to a Catalyst Column (``F.expr``)."""
    from pyspark.sql import functions as F

    return F.expr(compile_painless(source, params, score_col))


def painless_execute(
    spark,
    source: str,
    params: dict | None = None,
    context_row: dict | None = None,
):
    """The _scripts/painless/_execute API (reference:
    modules/lang-painless/.../action/PainlessExecuteAction.java):
    evaluate one script, optionally against a one-document context,
    and return the value — the script-debugging endpoint.

    ``context_row`` plays the role of the request's ``document``:
    ``doc['field']`` references resolve against it. Runs as a single
    Catalyst expression over a one-row frame (zero shuffles, one
    collect)."""
    from pyspark.sql import functions as F

    expr = compile_painless(source, params)
    if context_row:
        df = spark.createDataFrame([tuple(context_row.values())],
                                   list(context_row.keys()))
    else:
        df = spark.range(1)
    return df.select(F.expr(expr).alias("result")).first()["result"]


# ---- stored scripts (_scripts/<id>) -------------------------------------
# Reference: action/admin/cluster/storedscripts/ (Put/Get/Delete
# StoredScriptAction) — scripts kept in cluster state and referenced by
# {"id": ...} wherever an inline {"source": ...} is accepted. Here the
# store is one JSON file committed atomically (the engine's
# cluster-state idiom); resolve_script() is what request compilers call
# so {"id"} and {"source"} are interchangeable.


class _AnyParams(dict):
    """Validation-time params: every name resolves (to 0) so a stored
    script compiles without its runtime params, as PutStoredScript
    validates."""

    def __contains__(self, k):  # noqa: D105
        return True

    def __getitem__(self, k):  # noqa: D105
        return 0


def validate_painless(source: str) -> None:
    """Parse-check a script with params unbound (PutStoredScript's
    compile-time validation)."""
    compile_painless(source, _AnyParams())


def put_stored_script(registry_dir: str, script_id: str,
                      source: str, lang: str = "painless") -> None:
    import os

    if lang == "painless":
        validate_painless(source)
    os.makedirs(registry_dir, exist_ok=True)
    p = os.path.join(registry_dir, "stored_scripts.json")
    reg = {}
    if os.path.exists(p):
        with open(p) as f:
            reg = json.load(f)
    reg[script_id] = {"lang": lang, "source": source}
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def get_stored_script(registry_dir: str, script_id: str) -> dict:
    import os

    p = os.path.join(registry_dir, "stored_scripts.json")
    if os.path.exists(p):
        with open(p) as f:
            reg = json.load(f)
        if script_id in reg:
            return reg[script_id]
    raise ValueError(f"stored script {script_id!r} not found")


def delete_stored_script(registry_dir: str, script_id: str) -> None:
    import os

    p = os.path.join(registry_dir, "stored_scripts.json")
    reg = {}
    if os.path.exists(p):
        with open(p) as f:
            reg = json.load(f)
    if script_id not in reg:
        raise ValueError(f"stored script {script_id!r} not found")
    del reg[script_id]
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, p)


def resolve_script(script: dict, registry_dir: str | None = None) -> dict:
    """{"id": ...} -> the stored {"lang", "source"} (+ caller params);
    {"source": ...} passes through — the Script.parse() dual form."""
    if "id" in script:
        if registry_dir is None:
            raise ValueError("stored-script reference needs registry_dir")
        stored = get_stored_script(registry_dir, script["id"])
        out = dict(stored)
        if "params" in script:
            out["params"] = script["params"]
        return out
    return script
