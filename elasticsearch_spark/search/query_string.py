"""query_string / simple_query_string mini-language -> query-dict AST.

Re-creates the useful core of the reference's Lucene query-string
syntax (index/query/QueryStringQueryBuilder.java:923, parser
index/search/QueryStringQueryParser.java; simple variant
SimpleQueryStringBuilder.java):

  foo bar               -> match (default field, default OR)
  foo AND bar / &&      -> bool.must of matches
  foo OR bar  / ||      -> bool.should
  NOT foo / -foo / !foo -> bool.must_not
  field:foo             -> match on that field
  "exact phrase"        -> match_phrase
  field:"a b"           -> match_phrase on field
  foo*                  -> prefix (trailing-star only) / wildcard
  /regex/               -> regexp
  foo~ / foo~1          -> fuzzy
  term^2.5              -> boost
  ( ... )               -> grouping
  [1 TO 5] / {1 TO 5}   -> range (inclusive/exclusive)

The output is the same dict AST dsl.compile_filter / api.search accept,
so parsing and execution are decoupled exactly like the reference
(query string -> QueryBuilder tree -> Lucene query).
"""

from __future__ import annotations

import re
from typing import Any

_TOKEN_RE = re.compile(
    r"""
    \s*(
        \(|\)|
        [\w.]+:"(?:[^"\\]|\\.)*"|   # field:"phrase"
        [\w.]+:\[[^\]]*\]|          # field:[range]
        [\w.]+:\{[^}]*\}|           # field:{range}
        "(?:[^"\\]|\\.)*"|          # quoted phrase
        /(?:[^/\\]|\\.)+/|          # regex
        \[[^\]]*\]|\{[^}]*\}|       # ranges
        \|\||&&|
        [^\s()]+                    # bare term (may include field: prefix)
    )
    """,
    re.VERBOSE,
)


def _tokenize(q: str) -> list[str]:
    return [m.group(1) for m in _TOKEN_RE.finditer(q)]


class _Parser:
    def __init__(self, tokens: list[str], default_field: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    # expr := and_expr (OR and_expr)*
    def parse_expr(self) -> dict[str, Any]:
        parts = [self.parse_and()]
        while self.peek() in ("OR", "||"):
            self.next()
            parts.append(self.parse_and())
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    # and_expr := unary ((AND unary) | unary)*  — explicit AND items are
    # musts, bare NOT items are must_nots at the same level (Lucene
    # behavior for "a AND b NOT c"), remaining adjacent items default to
    # OR (ES default_operator=OR).
    def parse_and(self) -> dict[str, Any]:
        items: list[tuple[str, dict]] = [("seq", self.parse_unary())]
        while True:
            nxt = self.peek()
            if nxt in ("AND", "&&"):
                self.next()
                items.append(("and", self.parse_unary()))
            elif nxt is not None and nxt not in ("OR", "||", ")"):
                items.append(("seq", self.parse_unary()))
            else:
                break

        def is_pure_not(n: dict) -> bool:
            return set(n) == {"bool"} and set(n["bool"]) == {"must_not"}

        if len(items) == 1:
            return items[0][1]
        kinds = [k for k, _ in items]
        must: list[dict] = []
        must_not: list[dict] = []
        should: list[dict] = []
        for idx, (k, node) in enumerate(items):
            if is_pure_not(node):
                must_not.extend(node["bool"]["must_not"])
            elif k == "and" or (idx + 1 < len(items) and kinds[idx + 1] == "and"):
                # an AND operand (right side, or the left neighbour of
                # an explicit AND) is a must clause
                must.append(node)
            else:
                should.append(node)
        body: dict[str, Any] = {}
        if must:
            body["must"] = must
        if must_not:
            body["must_not"] = must_not
        if should:
            body["should"] = should
            body["minimum_should_match"] = 0 if must else 1
        return {"bool": body}

    def parse_unary(self) -> dict[str, Any]:
        t = self.peek()
        if t in ("NOT", "!"):
            self.next()
            inner = self.parse_unary()
            return {"bool": {"must_not": [inner]}}
        if t is not None and t.startswith("-") and len(t) > 1:
            self.toks[self.i] = t[1:]
            inner = self.parse_unary()
            return {"bool": {"must_not": [inner]}}
        if t == "(":
            self.next()
            node = self.parse_expr()
            if self.peek() == ")":
                self.next()
            return node
        return self.parse_term()

    def parse_term(self) -> dict[str, Any]:
        t = self.next()
        field = self.default_field
        # field prefix
        m = re.match(r"^([\w.]+):(.*)$", t)
        rest = t
        if m and m.group(2):
            field, rest = m.group(1), m.group(2)
        elif m and not m.group(2):
            rest = self.next()  # field: "phrase" split across tokens
            field = m.group(1)
        # boost suffix
        boost = 1.0
        bm = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", rest)
        if bm:
            rest, boost = bm.group(1), float(bm.group(2))

        node: dict[str, Any]
        if rest.startswith('"') and rest.endswith('"'):
            node = {"match_phrase": {field: {"query": rest[1:-1]}}}
        elif rest.startswith("/") and rest.endswith("/"):
            node = {"regexp": {field: {"value": rest[1:-1]}}}
        elif (rest.startswith("[") or rest.startswith("{")) and (
            rest.endswith("]") or rest.endswith("}")
        ):
            inner = rest[1:-1]
            lo, _, hi = inner.partition(" TO ")
            spec: dict[str, Any] = {}
            lo, hi = lo.strip(), hi.strip()
            if lo and lo != "*":
                spec["gte" if rest.startswith("[") else "gt"] = _num(lo)
            if hi and hi != "*":
                spec["lte" if rest.endswith("]") else "lt"] = _num(hi)
            node = {"range": {field: spec}}
        elif rest.endswith("~") or re.search(r"~\d$", rest):
            fm = re.match(r"^(.*?)~(\d?)$", rest)
            node = {"fuzzy": {field: {
                "value": fm.group(1),
                "fuzziness": int(fm.group(2) or 2),
            }}}
        elif rest.endswith("*") and "*" not in rest[:-1] and "?" not in rest:
            node = {"prefix": {field: {"value": rest[:-1]}}}
        elif "*" in rest or "?" in rest:
            node = {"wildcard": {field: {"value": rest}}}
        else:
            node = {"match": {field: {"query": rest}}}
        if boost != 1.0:
            body = next(iter(node.values()))
            spec = next(iter(body.values()))
            if isinstance(spec, dict):
                spec["boost"] = boost
        return node


def _num(s: str):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def parse_query_string(q: str, default_field: str = "text") -> dict[str, Any]:
    """Parse a query_string expression into the engine's query dict."""
    toks = _tokenize(q)
    if not toks:
        return {"match_all": {}}
    return _Parser(toks, default_field).parse_expr()
