"""ES SQL endpoint (x-pack/plugin/sql).

The reference ships a full SQL dialect that it TRANSLATES into search
requests (x-pack/plugin/sql/src/main/java/org/elasticsearch/xpack/sql/
planner/ — logical plan -> QueryContainer). This engine's native
planner already IS a SQL engine (Catalyst), so the endpoint is direct:
register the index tables as temp views and hand the statement to
spark.sql. What the reference gains from translation (pushdown into
the index) Catalyst does natively — filters/aggregates push into the
parquet scans, and the plan is visible through the _translate
analogue below.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def essql(
    spark: SparkSession, sql: str, sf_dir: str,
    tables: tuple[str, ...] = TABLES,
) -> DataFrame:
    """_sql endpoint: run an ES-SQL statement over the index tables.
    Views are only (re)registered for tables present in `sf_dir`.
    Catalog commands (SHOW TABLES / DESCRIBE) answer from the table
    registry without touching data."""
    meta = essql_meta(spark, sql, sf_dir, tables)
    if meta is not None:
        return meta
    sql = rewrite_histogram(sql)
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    return spark.sql(sql)


# ES-SQL HISTOGRAM() grouping function (x-pack/plugin/sql/.../expression/
# function/grouping/Histogram.java): HISTOGRAM(ts, INTERVAL 1 DAY)
# buckets timestamps, HISTOGRAM(col, step) buckets numerics. Both
# rewrite to portable SQL (date_trunc / floor arithmetic) that Catalyst
# folds into an ordinary GROUP BY — the reference translates it to a
# date_histogram/histogram agg the same way.
_HIST_CALL = re.compile(
    r"\bHISTOGRAM\s*\(\s*([\w.]+)\s*,\s*"
    r"(?:INTERVAL\s+(\d+)\s+(\w+)|([0-9]+(?:\.[0-9]+)?))\s*\)",
    re.IGNORECASE)
_HIST_UNITS = {"minute", "hour", "day", "week", "month", "quarter",
               "year"}


def rewrite_histogram(sql: str) -> str:
    def sub(m: re.Match) -> str:
        col = m.group(1)
        if m.group(4) is not None:  # numeric step
            step = m.group(4)
            return f"(CAST(floor({col} / {step}) AS BIGINT) * {step})"
        n, unit = int(m.group(2)), m.group(3).lower()
        if n != 1 or unit not in _HIST_UNITS:
            raise ValueError(
                f"HISTOGRAM interval {n} {unit}: only 1-unit calendar "
                f"intervals {sorted(_HIST_UNITS)} rewrite portably")
        return f"date_trunc('{unit}', {col})"

    return _HIST_CALL.sub(sub, sql)


# ---------------------------------------------------------------------
# ES-SQL fulltext predicates: MATCH() / QUERY() / SCORE()
# ---------------------------------------------------------------------
# The reference resolves these through the search engine, not the SQL
# executor: MatchQueryPredicate / MultiMatchQueryPredicate /
# StringQueryPredicate (x-pack/plugin/sql/src/main/java/org/elasticsearch/
# xpack/sql/expression/predicate/fulltext/) compile to match /
# multi_match / query_string queries in the translated search request
# (planner/QueryTranslator.java:89), and Score.java exposes _score as a
# SQL-visible column. The Spark shape below mirrors that split: fulltext
# predicates are pre-parsed out of the statement, resolved through the
# BM25 engine into a scored (doc_id, _score) frame, and the statement is
# rewritten to an inner join against that frame with SCORE() ->
# _score — Catalyst then plans the relational remainder as usual.

_FT_CALL = re.compile(r"\b(MATCH|QUERY)\s*\(", re.IGNORECASE)
_SCORE_CALL = re.compile(r"\bSCORE\s*\(\s*\)", re.IGNORECASE)


def _scan_call(sql: str, start: int) -> int:
    """Index just past the balanced close-paren of a call whose open
    paren is at ``start`` (single-quoted strings skipped)."""
    depth = 0
    i = start
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parens in fulltext call at {start}")


def _split_args(argtext: str) -> list[str]:
    """Split call args on top-level commas (quotes respected)."""
    out, depth, cur, i = [], 0, [], 0
    while i < len(argtext):
        ch = argtext[i]
        if ch == "'":
            j = i + 1
            while j < len(argtext) and argtext[j] != "'":
                j += 1
            cur.append(argtext[i:j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return out


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1].replace("''", "'")
    return s


def _parse_options(opt: str) -> dict[str, str]:
    """ES-SQL fulltext options: 'k1=v1;k2=v2' (FullTextPredicate)."""
    out = {}
    for pair in _unquote(opt).split(";"):
        if pair.strip():
            k, _, v = pair.partition("=")
            out[k.strip()] = v.strip()
    return out


def _fulltext_clause(fn: str, args: list[str]) -> dict:
    """One MATCH()/QUERY() call -> engine query dict."""
    if fn == "QUERY":
        if not args:
            raise ValueError("QUERY() needs a query string")
        opts = _parse_options(args[1]) if len(args) > 1 else {}
        return {"_query_string": {"query": _unquote(args[0]), **opts}}
    if len(args) < 2:
        raise ValueError("MATCH() needs (field, query)")
    field = _unquote(args[0])
    opts = _parse_options(args[2]) if len(args) > 2 else {}
    if "," in field:
        # MultiMatchQueryPredicate: MATCH('f1,f2', 'text')
        fields = [f.strip() for f in field.split(",")]
        return {"multi_match": {"query": _unquote(args[1]),
                                "fields": fields,
                                "type": opts.pop("type", "best_fields"),
                                **opts}}
    spec: dict = {"query": _unquote(args[1])}
    if "operator" in opts:
        spec["operator"] = opts.pop("operator").lower()
    if "minimum_should_match" in opts:
        spec["minimum_should_match"] = int(opts.pop("minimum_should_match"))
    spec.update(opts)
    return {"match": {field: spec}}


def parse_fulltext(sql: str) -> tuple[str, list[dict], bool, list[bool]]:
    """Extract fulltext predicates from an ES-SQL statement.

    Returns (statement with the i-th call replaced by the marker
    ``__ft_m{i}`` and SCORE() by ``__ft_score``, clause dicts,
    uses_score, negated-flags). ``negated[i]`` is True when the call
    sits directly under NOT — those clauses match must_not semantics
    and contribute nothing to SCORE() (QueryTranslator folds them into
    the bool tree with no score contribution)."""
    clauses: list[dict] = []
    negated: list[bool] = []
    out: list[str] = []
    pos = 0
    for m in _FT_CALL.finditer(sql):
        if m.start() < pos:
            continue  # inside a previously-consumed call
        end = _scan_call(sql, m.end() - 1)
        argtext = sql[m.end():end - 1]
        clauses.append(_fulltext_clause(m.group(1).upper(), _split_args(argtext)))
        negated.append(bool(re.search(r"\bNOT\s*$", sql[:m.start()],
                                      re.IGNORECASE)))
        out.append(sql[pos:m.start()])
        out.append(f"__ft_m{len(clauses) - 1}")
        pos = end
    out.append(sql[pos:])
    rewritten = "".join(out)
    uses_score = bool(_SCORE_CALL.search(rewritten))
    rewritten = _SCORE_CALL.sub("__ft_score", rewritten)
    return rewritten, clauses, uses_score, negated


def _tree_mode(sql: str) -> bool:
    """True when the WHERE clause combines fulltext predicates with OR
    or NOT — those need the general left-join bool-tree plan; a plain
    AND conjunction keeps the pruning inner-join fast path."""
    where = re.search(r"\bWHERE\b(.*?)(\bGROUP\b|\bORDER\b|\bLIMIT\b|$)",
                      sql, re.IGNORECASE | re.DOTALL)
    wtext = where.group(1) if where else ""
    return bool(re.search(r"\bOR\b", wtext, re.IGNORECASE)) or bool(
        re.search(r"\bNOT\s+(MATCH|QUERY)\s*\(", wtext, re.IGNORECASE))


def essql_fulltext(
    spark: SparkSession,
    sql: str,
    sf_dir: str,
    index,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    params=None,
    tables: tuple[str, ...] = TABLES,
) -> DataFrame:
    """_sql with fulltext: resolve MATCH()/QUERY() through the BM25
    engine, rewrite the statement to join the scored frame, run the
    relational remainder on Catalyst.

    An AND-only conjunction takes the pruning fast path: a doc must
    match every clause, so the scored frames inner-join on ``doc_id``
    and scores sum — BooleanQuery conjunction scoring, which commutes
    with the relational WHERE because BM25 uses index-wide stats.

    OR / NOT combinations take the general bool-tree plan (the
    reference folds these into the query DSL tree,
    planner/QueryTranslator.java): every clause is scored
    independently, one union + groupBy builds a per-doc flag/score
    frame ``_ft(doc_id, s0..sk, _score)`` in a single shuffle, the
    statement LEFT-joins it (docs matching no clause must survive for
    NOT), each call site becomes ``s{i} IS NOT NULL`` and SCORE() the
    sum of matched non-negated clause scores — must_not contributes
    nothing, per Lucene bool scoring."""
    from functools import reduce

    from elasticsearch_spark.search.api import _scored_df
    from elasticsearch_spark.search.bm25 import BM25Params
    from elasticsearch_spark.search.query_string import parse_query_string
    from pyspark.sql import functions as F

    params = params or BM25Params()
    rewritten, clauses, _, negated = parse_fulltext(sql)
    if not clauses:
        return essql(spark, sql, sf_dir, tables=tables)

    resolved = []
    for c in clauses:
        if "_query_string" in c:
            body = c["_query_string"]
            qdict = parse_query_string(
                body["query"],
                default_field=body.get("default_field", "text"))
            resolved.append(qdict)
        else:
            resolved.append(c)

    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)

    if not _tree_mode(sql):
        # fast path: inner join prunes the scan to matching docs
        scored = _scored_df(index, resolved[0], params)
        for extra in resolved[1:]:
            nxt = _scored_df(index, extra, params
                             ).withColumnRenamed("score", "s2")
            scored = (scored.join(nxt, "doc_id")
                      .withColumn("score", F.col("score") + F.col("s2"))
                      .drop("s2"))
        scored.select(F.col("doc_id").alias(id_col),
                      F.col("score").alias("_score")
                      ).createOrReplaceTempView("_ft")
        rewritten = re.sub(r"__ft_m\d+", "TRUE", rewritten)
        rewritten = rewritten.replace("__ft_score", "_ft._score")
        join_kw = "JOIN"
    else:
        # bool-tree plan: one flag/score column per clause, one shuffle
        frames = [
            _scored_df(index, c, params).select(
                "doc_id", F.lit(i).alias("cid"), "score")
            for i, c in enumerate(resolved)
        ]
        u = reduce(lambda a, b: a.unionByName(b), frames)
        aggs = [F.max(F.when(F.col("cid") == i, F.col("score"))
                      ).alias(f"s{i}") for i in range(len(resolved))]
        ft = u.groupBy("doc_id").agg(*aggs)
        pos_scores = [F.coalesce(F.col(f"s{i}"), F.lit(0.0))
                      for i, neg in enumerate(negated) if not neg]
        total = pos_scores[0] if pos_scores else F.lit(0.0)
        for e in pos_scores[1:]:
            total = total + e
        ft = ft.withColumn("_score", total)
        ft.withColumnRenamed("doc_id", id_col
                             ).createOrReplaceTempView("_ft")
        # descending so __ft_m1 can't clobber the prefix of __ft_m10
        for i in reversed(range(len(resolved))):
            rewritten = rewritten.replace(
                f"__ft_m{i}", f"(_ft.s{i} IS NOT NULL)")
        rewritten = rewritten.replace(
            "__ft_score", "COALESCE(_ft._score, 0.0)")
        join_kw = "LEFT JOIN"

    # splice the _ft join into the (single, simple) FROM table — the
    # match is recomputed AFTER marker substitution so offsets are live
    frm = re.search(
        r"\bFROM\s+([A-Za-z_][\w]*)(\s+(?:AS\s+)?(?!WHERE|GROUP|ORDER|LIMIT|JOIN|ON\b)([A-Za-z_][\w]*))?",
        rewritten, re.IGNORECASE)
    if not frm:
        raise ValueError("fulltext statements need a simple FROM <table>")
    alias = frm.group(3) or frm.group(1)
    joined = (f"FROM {frm.group(0)[5:].strip()} "
              f"{join_kw} _ft ON {alias}.{id_col} = _ft.{id_col}")
    rewritten = rewritten[:frm.start()] + joined + rewritten[frm.end():]
    return spark.sql(rewritten)


def essql_translate(df: DataFrame) -> str:
    """_sql/translate analogue: the reference returns the search
    request a statement compiles to; here it is the optimized physical
    plan (scans show the pushed filters/pruned columns the translation
    achieved)."""
    return df._jdf.queryExecution().executedPlan().toString()


_SHOW_TABLES = re.compile(r"^\s*SHOW\s+TABLES\s*;?\s*$", re.IGNORECASE)
_DESCRIBE = re.compile(
    r"^\s*(?:DESCRIBE|DESC)\s+(\w+)\s*;?\s*$", re.IGNORECASE)


def essql_meta(
    spark: SparkSession, sql: str, sf_dir: str,
    tables: tuple[str, ...] = TABLES,
) -> DataFrame | None:
    """ES-SQL catalog commands (x-pack/plugin/sql command grammar:
    SysTables / SysColumns behind ``SHOW TABLES`` / ``DESCRIBE t``).
    Returns None when ``sql`` is not a catalog command — callers fall
    through to the ordinary executor."""
    if _SHOW_TABLES.match(sql):
        rows = [(t, "TABLE") for t in tables
                if os.path.exists(os.path.join(sf_dir, f"{t}.parquet"))]
        return spark.createDataFrame(rows, "name string, type string")
    m = _DESCRIBE.match(sql)
    if m:
        t = m.group(1).lower()
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            raise ValueError(f"essql: unknown table {t!r}")
        schema = spark.read.parquet(p).schema
        rows = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        return spark.createDataFrame(rows, "column string, type string")
    return None


# -- cursor paging (sql.query fetch_size + cursor / sql.clear_cursor) --

_HAS_ORDER = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)


def essql_page(
    spark: SparkSession, sql: str, sf_dir: str,
    fetch_size: int = 1000, cursor: str | None = None,
    tables: tuple[str, ...] = TABLES,
) -> tuple[DataFrame, str | None]:
    """sql.query with ``fetch_size`` / ``cursor`` (x-pack/plugin/sql
    TextFormatterCursor + SqlQueryRequest paging): returns one page and
    an opaque cursor for the next.

    The reference pages a server-held scroll; a stateless engine
    re-executes deterministically instead, so the cursor encodes
    (statement digest, row offset) and the statement MUST carry a
    total ORDER BY — refused loudly otherwise (the same reason ES
    refuses scroll-less paging on unsorted composite output). Deep
    pages re-run the sort, exactly like ES's documented
    deep-pagination cost; the plan itself stays one
    TakeOrderedAndProject per page.
    """
    import base64
    import hashlib
    import json

    if fetch_size <= 0:
        raise ValueError("essql_page: fetch_size must be positive")
    if not _HAS_ORDER.search(sql):
        raise ValueError(
            "essql_page: cursor paging needs a deterministic ORDER BY")
    digest = hashlib.sha256(sql.encode()).hexdigest()[:16]
    offset = 0
    if cursor is not None:
        state = json.loads(base64.b64decode(cursor))
        if state.get("sig") != digest:
            raise ValueError(
                "essql_page: cursor does not belong to this statement")
        offset = int(state["offset"])
    df = essql(spark, sql, sf_dir, tables)
    page = df.offset(offset).limit(fetch_size)
    n = page.count()
    nxt = None
    if n == fetch_size:
        nxt = base64.b64encode(json.dumps(
            {"sig": digest, "offset": offset + fetch_size}
        ).encode()).decode()
    return page, nxt


def essql_clear_cursor(cursor: str) -> bool:
    """sql.clear_cursor: cursors are stateless (statement digest +
    offset), so there is nothing server-side to free — returns True
    for any well-formed cursor, mirroring the endpoint's contract."""
    import base64
    import json

    state = json.loads(base64.b64decode(cursor))
    return "sig" in state and "offset" in state
