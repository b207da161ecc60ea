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
           "painless_execute", "compile_painless_update",
           "compile_painless_program", "is_statement_script"]

_TOKEN_RE = re.compile(
    r"""
    (?P<num>\d+\.\d+|\d+\.?(?![.\w])|\.\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|\+\+|--|\+=|-=|\*=|/=|[-+*/%<>!?:()\[\].,;{}=])
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

# painless String methods -> SQL (postfix method calls on any value
# expression; (min_args, max_args, emit(expr, args, dialect))). The
# instr-based forms are 1-indexed SQL translated back to Java's
# 0-indexed contract. startsWith/endsWith differ by one underscore
# between the engines — the ONLY dialect-split entries.
_STR_METHODS = {
    "toLowerCase": (0, 0, lambda e, a, d: f"lower({e})"),
    "toUpperCase": (0, 0, lambda e, a, d: f"upper({e})"),
    "trim": (0, 0, lambda e, a, d: f"trim({e})"),
    "length": (0, 0, lambda e, a, d: f"length({e})"),
    "isEmpty": (0, 0, lambda e, a, d: f"(length({e}) = 0)"),
    "contains": (1, 1, lambda e, a, d: f"(instr({e}, {a[0]}) > 0)"),
    "indexOf": (1, 1, lambda e, a, d: f"(instr({e}, {a[0]}) - 1)"),
    "startsWith": (1, 1, lambda e, a, d:
                   (f"startswith({e}, {a[0]})" if d == "spark"
                    else f"starts_with({e}, {a[0]})")),
    "endsWith": (1, 1, lambda e, a, d:
                 (f"endswith({e}, {a[0]})" if d == "spark"
                  else f"ends_with({e}, {a[0]})")),
    "replace": (2, 2, lambda e, a, d: f"replace({e}, {a[0]}, {a[1]})"),
    "equals": (1, 1, lambda e, a, d: f"({e} = {a[0]})"),
    "substring": (1, 2, lambda e, a, d:
                  (f"substring({e}, ({a[0]}) + 1)" if len(a) == 1 else
                   f"substring({e}, ({a[0]}) + 1, ({a[1]}) - ({a[0]}))")),
}


class PainlessError(ValueError):
    """Script outside the supported painless expression subset."""


_STRINGY_RE = re.compile(
    r"^\(*(?:'|(?:lower|upper|trim|concat|substring|replace)\()")


def _is_stringy(sql: str) -> bool:
    """True when an emitted SQL fragment is evidently string-typed — a
    string literal or a string-function result (possibly parenthesized
    or CASE-merged with string arms)."""
    if _STRINGY_RE.match(sql):
        return True
    if sql.startswith("CASE WHEN "):
        # a CASE merged from branches: string iff its THEN arm is
        m = re.search(r" THEN (.+) ELSE ", sql)
        return bool(m and _is_stringy(m.group(1)))
    return False


def _as_string(sql: str) -> str:
    return sql if _is_stringy(sql) else f"CAST({sql} AS STRING)"


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
                 score_col: str, dialect: str,
                 locals_: dict | None = None,
                 ctx_src: dict | None = None,
                 funcs: dict | None = None,
                 execer: "Any" = None):
        self.toks = tokens
        self.pos = 0
        self.params = params
        self.score_col = score_col
        self.dialect = dialect
        # statement-context symbol tables: local variables (name -> SQL
        # expr) and the ctx._source shadow (field -> SQL expr of its
        # CURRENT value after earlier assignments). None = expression
        # context, where locals/ctx are rejected.
        self.locals = locals_
        self.ctx_src = ctx_src
        # user-defined functions (name -> (param_names, body_stmts)) and
        # the _SymExec that inlines their bodies at call sites
        self.funcs = funcs or {}
        self.execer = execer

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
        # Java '+' is string concatenation when either operand is a
        # String. Symbolic SQL has no type inference, so the subset is
        # SYNTACTICALLY-EVIDENT strings: literals and string-function
        # results (covers the 'prefix' + x / x.substring(..) + y.trim()
        # idiom painless scripts actually use); an all-numeric-looking
        # '+' stays arithmetic. CAST(.. AS STRING) parses identically
        # in Spark SQL and DuckDB (STRING is a VARCHAR alias there).
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.multiplicative()
            if op == "+" and (_is_stringy(left) or _is_stringy(right)):
                left = (f"concat({_as_string(left)}, "
                        f"{_as_string(right)})")
            else:
                left = f"({left} {op} {right})"
        return left

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
        return self._postfix(self.primary())

    def _postfix(self, e: str) -> str:
        """String method calls chained onto any value expression
        (``doc['f'].value.toLowerCase().contains('x')``). Only fires on
        ``.name(`` where name is a known String method — a trailing
        plain ``.attr`` belongs to whichever primary produced ``e``."""
        while (self.peek()[1] == "."
               and self.toks[min(self.pos + 1, len(self.toks) - 1)][1]
               in _STR_METHODS
               and self.toks[min(self.pos + 2, len(self.toks) - 1)][1]
               == "("):
            self.next()
            _, name = self.next()
            self.next()  # '('
            args = []
            if self.peek()[1] != ")":
                args.append(self.ternary())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.ternary())
            self.expect(")")
            lo, hi, emit = _STR_METHODS[name]
            if not lo <= len(args) <= hi:
                raise PainlessError(
                    f"painless: .{name}() takes {lo}"
                    + (f"-{hi}" if hi != lo else "")
                    + f" args, got {len(args)}")
            e = emit(e, args, self.dialect)
        return e

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
        if v == "ctx":
            return self._ctx_access()
        if self.locals is not None and v in self.locals:
            val = self.locals[v]
            if isinstance(val, dict):
                return self._map_access(v, val)
            return val
        if v in self.funcs and self.peek()[1] == "(":
            return self._call(v)
        # bare identifier: a runtime-field/bucket-path reference
        # (bucket_script paths arrive as bare names)
        return v

    def _call(self, name: str) -> str:
        """User-defined function call — the body is INLINED at the call
        site by symbolically executing it with the argument SQL bound to
        the parameter names (call-by-value substitution; painless user
        functions are static: they see only their parameters, never
        doc/ctx — enforced at definition parse time). Recursion has no
        SQL analogue and refuses."""
        self.expect("(")
        args = []
        if self.peek()[1] != ")":
            args.append(self.ternary())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.ternary())
        self.expect(")")
        pnames, body = self.funcs[name]
        if len(args) != len(pnames):
            raise PainlessError(
                f"painless: {name}() takes {len(pnames)} args, "
                f"got {len(args)}")
        ex = self.execer
        if ex is None:
            raise PainlessError(
                "painless: function calls need statement context")
        if name in ex._callstack:
            raise PainlessError(
                f"painless: recursive function {name!r} is not supported")
        ex._callstack.append(name)
        try:
            varz = {p: f"({a})" for p, a in zip(pnames, args)}
            f_src, f_op, ret = ex.run(list(body), varz, {}, "'index'")
        finally:
            ex._callstack.pop()
        if f_src or f_op != "'index'":
            raise PainlessError(
                f"painless: function {name!r} may not mutate ctx")
        if ret is None:
            raise PainlessError(
                f"painless: function {name!r} must return a value")
        return f"({ret})"

    def _map_access(self, name: str, m: dict) -> str:
        """Read access on a Map-typed local. Keys are compile-time
        string literals (enforced at put), so containsKey/size fold to
        literals and a missing key reads as NULL — painless's
        HashMap.get(absent) == null."""
        k, v = self.next()
        if v == "[":
            kk, s = self.next()
            if kk != "str":
                raise PainlessError(
                    "painless: map read key must be a string literal")
            self.expect("]")
            return m.get(s[1:-1], "NULL")
        if v != ".":
            raise PainlessError(
                f"painless: bare map {name!r} is not a value")
        kk, attr = self.next()
        if self.peek()[1] != "(":
            return m.get(attr, "NULL")  # shorthand field read
        self.next()
        if attr in ("containsKey", "get", "getOrDefault"):
            kk, s = self.next()
            if kk != "str":
                raise PainlessError(
                    f"painless: {attr} key must be a string literal")
            key = s[1:-1]
            if attr == "getOrDefault":
                self.expect(",")
                dflt = self.ternary()
                self.expect(")")
                return m.get(key, f"({dflt})")
            self.expect(")")
            if attr == "containsKey":
                return "TRUE" if key in m else "FALSE"
            return m.get(key, "NULL")
        if attr in ("size", "isEmpty"):
            self.expect(")")
            if attr == "size":
                return str(len(m))
            return "TRUE" if not m else "FALSE"
        raise PainlessError(f"painless: unsupported Map method .{attr}")

    def _ctx_access(self) -> str:
        """``ctx._source.field`` read inside an update-context script.

        Resolves through the shadow map so reads AFTER an assignment see
        the assigned value (painless update scripts mutate ctx._source
        sequentially — reference: TransportUpdateByQueryAction /
        UpdateHelper ctx map semantics)."""
        if self.ctx_src is None:
            raise PainlessError(
                "painless: ctx is only valid in update-context scripts")
        self.expect(".")
        k, a = self.next()
        if a != "_source":
            raise PainlessError(
                f"painless: unsupported ctx accessor .{a} in an expression")
        self.expect(".")
        k, f = self.next()
        if k != "name":
            raise PainlessError("painless: ctx._source. needs a field name")
        return self.ctx_src.get(f, f)

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


# ---------------------------------------------------------------------------
# Statement subset: local declarations, if/else, for-each over params
# lists, ctx._source mutation, ctx.op, return.
#
# Reference: modules/lang-painless statement grammar (PainlessParser —
# public ANTLR surface; independent implementation) and the update-by-
# query script contract (ctx._source / ctx.op "index"|"noop"|"delete",
# reference server/src/main/java/org/elasticsearch/action/update/
# UpdateHelper.java). The reference interprets statements per document
# on the JVM; here the whole program is SYMBOLICALLY EXECUTED once on
# the driver into pure SQL expressions — control flow becomes CASE
# WHEN, for-each over a compile-time params list unrolls, local
# variables substitute inline — so per-row work stays inside
# whole-stage codegen (and the same text runs on the DuckDB oracle).
#
#     program ::= stmt*
#     stmt    ::= type name ('=' expr)? ';'
#               | 'if' '(' expr ')' block ('else' (if | block))?
#               | 'for' '(' type name ':' params-list ')' block
#               | target ('='|'+='|'-='|'*='|'/=') expr ';'
#               | 'return' expr ';'
#     target  ::= name | 'ctx' '.' '_source' '.' name | 'ctx' '.' 'op'
#     block   ::= '{' stmt* '}' | stmt
# ---------------------------------------------------------------------------

_TYPES = {"def", "var", "int", "long", "float", "double", "boolean",
          "String", "Map"}
_MAX_UNROLL = 1000


class _StmtParser:
    """Tokens -> statement AST. Expressions stay as raw token slices so
    they can compile later under the symbol table that is live at their
    program point."""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.pos = 0

    def peek(self, ahead: int = 0) -> tuple[str, str]:
        i = min(self.pos + ahead, len(self.toks) - 1)
        return self.toks[i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, val: str) -> None:
        k, v = self.next()
        if v != val:
            raise PainlessError(f"painless: expected {val!r}, got {v!r}")

    def parse_program(self) -> list:
        out = []
        while self.peek()[0] != "eof":
            out.append(self.stmt())
        return out

    def block(self) -> list:
        if self.peek()[1] == "{":
            self.next()
            out = []
            while self.peek()[1] != "}":
                if self.peek()[0] == "eof":
                    raise PainlessError("painless: unterminated block")
                out.append(self.stmt())
            self.next()
            return out
        return [self.stmt()]

    def stmt(self):
        k, v = self.peek()
        if v == "if":
            return self.if_()
        if v == "for":
            return self.for_()
        if v == "while":
            self.next()
            self.expect("(")
            cond = self.expr_until_close_paren()
            return ("while", cond, self.block())
        if v == "do":
            self.next()
            body = self.block()
            self.expect("while")
            self.expect("(")
            cond = self.expr_until_close_paren()
            self.expect(";")
            return ("dowhile", cond, body)
        if v == "return":
            self.next()
            return ("return", self.expr_until_semi())
        if v in _TYPES and self.peek(1)[0] == "name":
            if self.peek(2)[1] == "(":
                return self.func_()
            _, typ = self.next()
            _, name = self.next()
            if self.peek()[1] == "=":
                self.next()
                return ("decl", name, self.expr_until_semi(), typ)
            self.expect(";")
            return ("decl", name, None, typ)
        if v in ("++", "--"):  # prefix increment statement
            self.next()
            target = self.target()
            self.expect(";")
            return ("assign", target, "+=" if v == "++" else "-=",
                    [("num", "1")])
        target = self.target()
        _, aop = self.next()
        if aop in ("++", "--"):  # postfix increment statement
            self.expect(";")
            return ("assign", target, "+=" if aop == "++" else "-=",
                    [("num", "1")])
        if aop not in ("=", "+=", "-=", "*=", "/="):
            raise PainlessError(
                f"painless: expected an assignment operator, got {aop!r}")
        return ("assign", target, aop, self.expr_until_semi())

    def func_(self):
        """User-defined function: ``<type> <name>(<type> <pname>, ...)
        block`` (reference: modules/lang-painless function grammar —
        painless user functions are static and see only their
        parameters). Body statements may not touch doc/ctx/params —
        token-scanned here so the refusal is at definition, not at some
        later call site."""
        start = self.pos
        self.next()                       # return type
        _, name = self.next()
        self.expect("(")
        pnames = []
        if self.peek()[1] != ")":
            while True:
                k, t = self.next()
                if t not in _TYPES:
                    raise PainlessError(
                        f"painless: function parameter needs a type, "
                        f"got {t!r}")
                k, pn = self.next()
                if k != "name":
                    raise PainlessError(
                        "painless: function parameter needs a name")
                pnames.append(pn)
                if self.peek()[1] == ",":
                    self.next()
                    continue
                break
        self.expect(")")
        body_start = self.pos
        body = self.block()
        for kk, vv in self.toks[body_start:self.pos]:
            if kk == "name" and vv in ("doc", "ctx", "params", "_score"):
                raise PainlessError(
                    f"painless: function {name!r} may only use its "
                    f"parameters (found {vv!r}; pass values as arguments)")
        return ("func", name, pnames, body)

    def target(self):
        k, v = self.next()
        if k != "name":
            raise PainlessError(f"painless: bad statement start {v!r}")
        if v != "ctx":
            nk, nv = self.peek()
            if nv == "." and self.peek(2)[1] in ("=", "+=", "-=", "*=", "/="):
                self.next()
                kk, key = self.next()
                if kk != "name":
                    raise PainlessError("painless: map put needs a key name")
                return ("map", v, key)
            if nv == "[":
                self.next()
                kk, s = self.next()
                if kk != "str":
                    raise PainlessError(
                        "painless: map put key must be a string literal")
                self.expect("]")
                return ("map", v, s[1:-1])
            return ("var", v)
        self.expect(".")
        _, a = self.next()
        if a == "op":
            return ("op",)
        if a != "_source":
            raise PainlessError(f"painless: unsupported ctx target .{a}")
        self.expect(".")
        k, f = self.next()
        if k != "name":
            raise PainlessError("painless: ctx._source. needs a field name")
        return ("src", f)

    def if_(self):
        self.next()
        self.expect("(")
        cond = self.expr_until_close_paren()
        then = self.block()
        els = None
        if self.peek()[1] == "else":
            self.next()
            els = [self.if_()] if self.peek()[1] == "if" else self.block()
        return ("if", cond, then, els)

    def for_(self):
        self.next()
        self.expect("(")
        k, t = self.next()
        if t not in _TYPES:
            raise PainlessError(
                "painless: for needs a typed loop variable "
                "(for (def x : params.list) / for (int i = 0; ...))")
        _, var = self.next()
        k, sep = self.next()
        if sep == "=":  # classic counter loop
            init = self.expr_until_semi()
            cond = self.expr_until_semi()
            incr = self.expr_until_close_paren()
            return ("cfor", var, init, cond, incr, self.block())
        if sep != ":":
            raise PainlessError(f"painless: bad for header near {sep!r}")
        k, v = self.next()
        if v != "params":
            raise PainlessError(
                "painless: for-each source must be a params list "
                "(compile-time unroll)")
        _, sep = self.next()
        if sep == ".":
            k, pname = self.next()
            if k != "name":
                raise PainlessError("painless: params. needs a name")
        elif sep == "[":
            k, s = self.next()
            if k != "str":
                raise PainlessError("painless: params[...] needs a string")
            self.expect("]")
            pname = s[1:-1]
        else:
            raise PainlessError("painless: bad for-each source")
        self.expect(")")
        return ("for", var, pname, self.block())

    def expr_until_semi(self) -> list:
        depth, out = 0, []
        while True:
            k, v = self.peek()
            if k == "eof":
                raise PainlessError("painless: missing ';'")
            if depth == 0 and v == ";":
                self.next()
                return out
            if v in ("(", "["):
                depth += 1
            elif v in (")", "]"):
                depth -= 1
            out.append(self.next())

    def expr_until_close_paren(self) -> list:
        depth, out = 0, []
        while True:
            k, v = self.next()
            if k == "eof":
                raise PainlessError("painless: unbalanced parentheses")
            if v == "(":
                depth += 1
            elif v == ")":
                if depth == 0:
                    return out
                depth -= 1
            out.append((k, v))


def _merge_vals(cond: str, a: str, b: str) -> str:
    if cond == "TRUE":  # compile-time-decided branch (e.g. containsKey)
        return a
    if cond == "FALSE":
        return b
    return a if a == b else f"CASE WHEN {cond} THEN {a} ELSE {b} END"


def _copy_vars(varz: dict) -> dict:
    """Branch-local copy of the symbol table; Map-typed locals (dict
    values) need their own copy so a put inside one branch cannot leak
    into the other."""
    return {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in varz.items()}


def _merge_var(cond: str, a, b):
    if isinstance(a, dict) or isinstance(b, dict):
        if not (isinstance(a, dict) and isinstance(b, dict)):
            raise PainlessError(
                "painless: a local cannot be a Map in one branch and a "
                "scalar in the other")
        return {k: _merge_vals(cond, a.get(k, "NULL"), b.get(k, "NULL"))
                for k in set(a) | set(b)}
    return _merge_vals(cond, a, b)


class _SymExec:
    """Symbolic executor: statements -> (ctx._source shadow, ctx.op
    expr, return expr), each a SQL string over the ORIGINAL document
    columns. Control flow with ``return`` uses continuation passing
    (each if-branch executes the remainder of the program), so early
    returns and post-if assignments merge correctly."""

    def __init__(self, params: dict, score_col: str, dialect: str,
                 funcs: dict | None = None):
        self.params = params
        self.score_col = score_col
        self.dialect = dialect
        self.funcs = funcs or {}
        self._callstack: list[str] = []
        # names declared `String`: their stored SQL is kept evidently
        # stringy (concat-wrapped) so a later `s + x` concatenates
        self.str_vars: set[str] = set()

    def _string_typed(self, name: str, toks: list, val: str) -> str:
        """A value flowing into a String-typed local must be evidently
        string-typed. A '+' that compiled to ARITHMETIC here means the
        operands were type-opaque (e.g. two bare doc refs): on string
        fields the reference concatenates, while SQL '+' silently
        yields NULL — refuse loudly instead of answering wrong
        (ADVICE r5). A plain opaque value (no '+') is wrapped in
        concat(), which is the identity on strings in both dialects
        and marks the local stringy for downstream '+'."""
        if _is_stringy(val):
            return val
        if any(v == "+" for _, v in toks):
            raise PainlessError(
                f"painless: String {name!r}: '+' over type-opaque "
                "operands would compile to arithmetic (silent NULL on "
                "string fields); make one operand evidently a string "
                "(literal or String-typed local) or use concat-style "
                "methods")
        return f"concat({val})"

    def expr(self, toks: list, varz: dict, src: dict) -> str:
        p = _Parser(toks + [("eof", "")], self.params, self.score_col,
                    self.dialect, locals_=varz, ctx_src=src,
                    funcs=self.funcs, execer=self)
        out = p.ternary()
        if p.peek()[0] != "eof":
            raise PainlessError(
                f"painless: trailing input at {p.peek()[1]!r}")
        return out

    def run(self, stmts: list, varz: dict, src: dict, op: str):
        """CPS walk; returns (src, op, ret) where ret is None when the
        program falls off the end without a return."""
        for i, s in enumerate(stmts):
            if s[0] == "if":
                cond = self.expr(s[1], varz, src)
                rest = stmts[i + 1:]
                st, ot, rt = self.run(
                    list(s[2]) + rest, _copy_vars(varz), dict(src), op)
                se, oe, re_ = self.run(
                    list(s[3] or []) + rest, _copy_vars(varz), dict(src), op)
                src_m = {}
                for key in set(st) | set(se):
                    dflt = src.get(key, key)
                    src_m[key] = _merge_vals(
                        cond, st.get(key, dflt), se.get(key, dflt))
                op_m = _merge_vals(cond, ot, oe)
                if rt is None and re_ is None:
                    ret = None
                else:
                    ret = _merge_vals(cond,
                                      rt if rt is not None else "NULL",
                                      re_ if re_ is not None else "NULL")
                return src_m, op_m, ret
            if s[0] == "return":
                return src, op, self.expr(s[1], varz, src)
            op = self._simple(s, varz, src, op)
        return src, op, None

    def run_linear(self, stmts: list, varz: dict, src: dict, op: str):
        """Loop-body walk: no return, if/else merges in place."""
        for s in stmts:
            if s[0] == "return":
                raise PainlessError(
                    "painless: return inside a loop is not supported")
            if s[0] == "if":
                cond = self.expr(s[1], varz, src)
                vt, st = _copy_vars(varz), dict(src)
                ot = self.run_linear(s[2], vt, st, op)
                ve, se = _copy_vars(varz), dict(src)
                oe = self.run_linear(s[3] or [], ve, se, op)
                for key in list(varz):
                    varz[key] = _merge_var(cond, vt[key], ve[key])
                for key in set(st) | set(se):
                    dflt = src.get(key, key)
                    src[key] = _merge_vals(
                        cond, st.get(key, dflt), se.get(key, dflt))
                op = _merge_vals(cond, ot, oe)
            else:
                op = self._simple(s, varz, src, op)
        return op

    def _fold_consts(self, varz: dict) -> None:
        """Collapse compile-time-constant locals back to literals so an
        unrolled loop's emitted SQL stays compact (without this, a
        counter's shadow grows one '(... + 1)' layer per iteration).
        Row-dependent locals fail the DuckDB probe and are kept
        symbolic — exactly the ones the unroll must inline."""
        import duckdb

        for k, v in list(varz.items()):
            if not isinstance(v, str) or len(v) <= 24:
                continue
            try:
                val = duckdb.execute("SELECT " + v).fetchone()[0]
            except Exception:
                continue
            if val is None:
                varz[k] = "NULL"
            elif isinstance(val, (bool, int, float, str)):
                varz[k] = _lit(val)

    def _const_eval(self, toks: list, varz: dict, src: dict):
        """Evaluate a loop condition at compile time. The condition must
        reduce to a column-free expression over locals/params literals
        in the dialect-shared arithmetic core (+,-,*,/,%, comparisons,
        &&/||/!, ternary, Math.*) — DuckDB evaluates the folded SQL and
        any document-column reference fails loudly."""
        sql = self.expr(toks, varz, src)
        import duckdb

        try:
            return duckdb.execute("SELECT " + sql).fetchone()[0]
        except Exception as ex:
            raise PainlessError(
                "painless: loop condition must be compile-time evaluable "
                f"(locals/params arithmetic only): {ex}") from None

    def _simple(self, s, varz: dict, src: dict, op: str) -> str:
        kind = s[0]
        if kind == "decl":
            _, name, toks, typ = s
            if toks is not None and [v for _, v in toks] in (
                    ["new", "HashMap", "(", ")"], ["[", ":", "]"]):
                varz[name] = {}
            else:
                val = (self.expr(toks, varz, src)
                       if toks is not None else None)
                if typ == "String" and val is not None:
                    val = self._string_typed(name, toks, val)
                varz[name] = f"({val})" if val is not None else "NULL"
                if typ == "String":
                    self.str_vars.add(name)
        elif kind in ("while", "dowhile", "cfor"):
            if kind == "cfor":
                _, var, init, cond_toks, incr, body = s
                saved, had = varz.get(var), var in varz
                varz[var] = "(" + self.expr(init, varz, src) + ")"
                tail = [_parse_single_stmt(incr)]
            else:
                _, cond_toks, body = s
                tail = []
            n = 0
            if kind == "dowhile":
                op = self.run_linear(body, varz, src, op)
                n = 1
            while True:
                self._fold_consts(varz)
                val = self._const_eval(cond_toks, varz, src)
                if not isinstance(val, bool):
                    raise PainlessError(
                        "painless: loop condition must be boolean, got "
                        f"{val!r}")
                if not val:
                    break
                if n >= _MAX_UNROLL:
                    raise PainlessError(
                        f"painless: loop exceeds the {_MAX_UNROLL}-"
                        "iteration unroll cap")
                op = self.run_linear(list(body) + tail, varz, src, op)
                n += 1
            if kind == "cfor":
                if had:
                    varz[var] = saved
                else:
                    varz.pop(var, None)
        elif kind == "assign":
            _, target, aop, toks = s
            val = self.expr(toks, varz, src)
            if target[0] == "map":
                _, name, key = target
                m = varz.get(name)
                if not isinstance(m, dict):
                    raise PainlessError(
                        f"painless: {name!r} is not a Map")
                if aop == "=":
                    m[key] = f"({val})"
                else:
                    if key not in m:
                        raise PainlessError(
                            f"painless: {aop} on missing map key {key!r}")
                    m[key] = f"({m[key]} {aop[0]} ({val}))"
                return op
            if target[0] == "op":
                if aop != "=":
                    raise PainlessError("painless: ctx.op takes plain =")
                return val
            if target[0] == "var":
                name = target[1]
                if aop == "=":
                    if name in self.str_vars:
                        val = self._string_typed(name, toks, val)
                    varz[name] = f"({val})"
                else:
                    if name not in varz:
                        raise PainlessError(
                            f"painless: {aop} on undeclared {name!r}")
                    if name in self.str_vars and aop == "+=":
                        # String += is concatenation, never arithmetic
                        varz[name] = (f"(concat({varz[name]}, "
                                      f"{_as_string(val)}))")
                    else:
                        varz[name] = f"({varz[name]} {aop[0]} ({val}))"
            else:  # ctx._source.field
                f = target[1]
                cur = src.get(f, f)
                src[f] = (f"({val})" if aop == "="
                          else f"({cur} {aop[0]} ({val}))")
        elif kind == "for":
            _, var, pname, body = s
            if pname not in self.params:
                raise PainlessError(f"painless: missing param {pname!r}")
            seq = self.params[pname]
            if not isinstance(seq, (list, tuple)):
                raise PainlessError(
                    f"painless: for-each param {pname!r} must be a list")
            if len(seq) > _MAX_UNROLL:
                raise PainlessError(
                    f"painless: for-each over {len(seq)} elements exceeds "
                    f"the {_MAX_UNROLL}-iteration unroll cap")
            saved = varz.get(var)
            had = var in varz
            for v in seq:
                varz[var] = _lit(v)
                op = self.run_linear(body, varz, src, op)
            if had:
                varz[var] = saved
            else:
                varz.pop(var, None)
        elif kind == "func":
            raise PainlessError(
                "painless: functions must be declared at the top level")
        else:  # pragma: no cover - parser emits only the kinds above
            raise PainlessError(f"painless: bad statement {kind!r}")
        return op


def _parse_single_stmt(toks: list):
    """Parse a statement from a bare token slice (a classic-for's
    increment clause, which arrives without its ';')."""
    p = _StmtParser(list(toks) + [("op", ";"), ("eof", "")])
    return p.stmt()


_STMT_MARKERS = re.compile(r";|\bctx\b")


def is_statement_script(source: str) -> bool:
    """True when a script needs the statement compiler (has ';' or
    touches ctx)."""
    return _STMT_MARKERS.search(source) is not None


def compile_painless_update(
    source: str,
    params: dict | None = None,
    dialect: str = "spark",
) -> dict:
    """Compile an update-context statement script.

    Returns ``{"set": {field: sql_expr}, "op": sql_expr | None}`` —
    ``set`` maps each assigned ctx._source field to a SQL expression
    over the ORIGINAL columns; ``op`` evaluates to
    'index'|'noop'|'delete' per row (None when the script never touches
    ctx.op). Reference: update-by-query script contract,
    server/src/main/java/org/elasticsearch/action/update/UpdateHelper.java."""
    funcs, stmts = _split_funcs(
        _StmtParser(_tokenize(source)).parse_program())
    ex = _SymExec(params if params is not None else {}, "score", dialect,
                  funcs=funcs)
    src, op, _ret = ex.run(stmts, {}, {}, "'index'")
    return {"set": src, "op": None if op == "'index'" else op}


def _split_funcs(stmts: list) -> tuple[dict, list]:
    """Separate top-level function definitions from the program body."""
    funcs, body = {}, []
    for s in stmts:
        if s[0] == "func":
            if s[1] in funcs:
                raise PainlessError(
                    f"painless: duplicate function {s[1]!r}")
            funcs[s[1]] = (s[2], s[3])
        else:
            body.append(s)
    return funcs, body


def compile_painless_program(
    source: str,
    params: dict | None = None,
    score_col: str = "score",
    dialect: str = "spark",
) -> str:
    """Compile a painless script that may contain STATEMENTS to one SQL
    expression (its return value). Falls back to the plain expression
    compiler when the script has no statement markers. Raises when a
    statement script mutates ctx (use :func:`compile_painless_update`)
    or never returns."""
    if not is_statement_script(source):
        return compile_painless(source, params, score_col, dialect)
    funcs, stmts = _split_funcs(
        _StmtParser(_tokenize(source)).parse_program())
    ex = _SymExec(params if params is not None else {}, score_col, dialect,
                  funcs=funcs)
    src, op, ret = ex.run(stmts, {}, {}, "'index'")
    if src or op != "'index'":
        raise PainlessError(
            "painless: ctx mutation is only valid in update contexts")
    if ret is None:
        raise PainlessError("painless: statement script must return a value")
    return ret


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
    compile-time validation). Statement scripts get a structural parse
    only — for-each unrolling needs bound params."""
    if is_statement_script(source):
        _StmtParser(_tokenize(source)).parse_program()
        return
    compile_painless(source, _AnyParams())


def put_stored_script(registry_dir: str, script_id: str,
                      source: str, lang: str = "painless") -> None:
    import os

    if lang == "painless":
        validate_painless(source)
    elif lang == "expression":
        from elasticsearch_spark.scripts.expression import compile_expression

        compile_expression(source, _AnyParams())
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
