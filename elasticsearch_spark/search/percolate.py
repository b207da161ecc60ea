"""Percolate query: reverse search — store queries, find which stored
queries match each document.

Reference: modules/percolator/src/main/java/org/elasticsearch/
percolator/PercolateQueryBuilder.java:83 and
PercolatorFieldMapper.java — Elasticsearch indexes each stored query's
EXTRACTED TERMS in the percolator field, pre-filters candidate queries
with a covering (minimum-should-match) query over those terms, then
verifies candidates against a single-doc MemoryIndex.

Spark-first re-expression (not a translation): stored queries are
DECOMPOSED once into requirement-row tables — one row per
(query, clause-group, term) plus one per numeric range — and
percolation is an ordinary equi-join of document terms against the
requirement table with a per-(doc, query, group) coverage count.
There is no per-query loop and no per-doc MemoryIndex: a billion
stored queries and a billion docs both scale as hash joins / partial
aggregations on (field, term), which is exactly the shape Catalyst +
AQE already optimize (the requirement side broadcasts while small,
shuffles when huge).

Supported percolated query subset — each query becomes 1+ groups and a
doc matches iff EVERY group is satisfied:

  {"term":  {f: v}}                      -> term group, msm=1
  {"terms": {f: [v, ...]}}               -> term group, msm=1
  {"match": {f: text}}                   -> term group, msm=1 ("or")
  {"match": {f: {"query": text, "operator": "and"}}}      -> msm=n
  {"match": {f: {"query": text, "minimum_should_match"}}} -> msm=k
  {"prefix":   {f: v}}                   -> pattern group (v*), msm=1
  {"wildcard": {f: pat}}                 -> pattern group (*/?), msm=1
  {"match_phrase": {f: text}}            -> phrase group (slop=0):
      verified as contiguous-token containment on the analyzed field
      (the reference extracts the phrase's terms for the covering
      query and verifies positions in the MemoryIndex; here the
      space-joined token text IS the position check)
  {"range": {f: {gte|gt|lte|lt}}}        -> numeric range group
  {"bool":  {"must"/"filter": [...]}}    -> union of the subs' groups
  {"bool":  {"should": [...], "minimum_should_match": k}}
      -> ONE group; every should clause gets a clause id and k distinct
         clauses must be satisfied (a should list alongside must
         WITHOUT msm is scoring-only and is ignored)
  {"bool":  {"must_not": [...]}}         -> COMPLEMENTED groups: the doc
      matches iff every positive group is satisfied AND no negative
      group is; must_not subs must be single-group (flat negation), and
      at least one positive requirement must exist (a pure-negative
      query would need a per-query corpus anti-join)
  {"function_score"/"constant_score"/"boosting": ...} -> transparent:
      matching gates only on the wrapped query (percolation emits ids,
      not scores)

Clause counting: requirement rows carry a clause id; a group is
satisfied when count(DISTINCT clause) >= msm, so a terms clause
matching two of its values still counts as ONE satisfied clause —
Lucene's BooleanQuery msm counts clauses, not terms.

This mirrors the extraction in PercolatorFieldMapper.createQueryBuilder
(term/disjunction extraction with minimum-should-match) while the
conjunction-of-groups check plays the role of the verify phase.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from elasticsearch_spark.analysis.analyzers import analyze

_TOKEN_RE = "[a-z0-9_]+"


def _match_terms(field: str, body: Any) -> tuple[list[str], int]:
    """Terms + msm for a match clause body (str or options dict)."""
    if isinstance(body, str):
        text, operator, msm = body, "or", None
    else:
        text = body["query"]
        operator = body.get("operator", "or")
        msm = body.get("minimum_should_match")
    terms = list(dict.fromkeys(t for t, _ in analyze(text, "ascii_word")))
    if msm is None:
        msm = len(terms) if operator == "and" else 1
    return terms, int(msm)


def _like_escape(literal: str) -> str:
    """Escape LIKE metacharacters in a literal (backslash escape —
    Spark's default; the DuckDB twin adds an explicit ESCAPE clause)."""
    return (literal.replace("\\", "\\\\")
            .replace("%", "\\%").replace("_", "\\_"))


def _wildcard_like(pattern: str) -> str:
    """ES wildcard (* any run, ? one char) -> SQL LIKE pattern."""
    out = []
    for ch in pattern:
        if ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(ch)
    return "".join(out)


def decompose_queries(
    stored: list[tuple[Any, dict]],
) -> tuple[list[tuple], list[tuple], list[tuple], list[tuple],
           list[tuple]]:
    """Decompose stored (query_id, dsl) pairs into requirement rows.

    Returns (term_rows, pat_rows, phrase_rows, range_rows, group_rows):
      term_rows:   (query_id, group_id, field, term, clause)
      pat_rows:    (query_id, group_id, field, like_pattern, clause)
      phrase_rows: (query_id, group_id, field, phrase)  # slop=0
      range_rows:  (query_id, group_id, field, lo, hi, lo_open, hi_open)
      group_rows:  (query_id, group_id, msm, neg)  # msm=0: range,
                   -1: phrase; neg: a must_not (complemented) group
    Decomposition is per-query and stateless — for a huge stored-query
    table run it inside mapInPandas; here it feeds createDataFrame.
    """
    term_rows: list[tuple] = []
    pat_rows: list[tuple] = []
    phrase_rows: list[tuple] = []
    range_rows: list[tuple] = []
    group_rows: list[tuple] = []

    def add_should_group(qid: Any, gid: int, should: list, msm: int,
                         neg: bool = False) -> None:
        """One group for a should list: every clause gets a clause id;
        msm distinct clause ids must be satisfied."""
        for ci, sub in enumerate(should):
            (skind, sbody), = sub.items()
            if skind == "term":
                (field, value), = sbody.items()
                if isinstance(value, dict):
                    value = value["value"]
                term_rows.append((qid, gid, field, str(value).lower(), ci))
            elif skind == "terms":
                (field, values), = sbody.items()
                for v in values:
                    term_rows.append((qid, gid, field, str(v).lower(), ci))
            elif skind == "match":
                (field, body2), = sbody.items()
                terms, msm2 = _match_terms(field, body2)
                if msm2 != 1:
                    raise ValueError(
                        "percolator: match inside should supports only "
                        "operator=or / msm=1 (nested msm has no flat "
                        "clause decomposition)"
                    )
                for t in terms:
                    term_rows.append((qid, gid, field, t, ci))
            elif skind == "prefix":
                (field, value), = sbody.items()
                if isinstance(value, dict):
                    value = value["value"]
                pat_rows.append((
                    qid, gid, field,
                    _like_escape(str(value).lower()) + "%", ci))
            elif skind == "wildcard":
                (field, value), = sbody.items()
                if isinstance(value, dict):
                    value = value.get("value", value.get("wildcard"))
                pat_rows.append((
                    qid, gid, field,
                    _wildcard_like(str(value).lower()), ci))
            else:
                raise ValueError(
                    f"percolator: unsupported should clause kind {skind!r}"
                )
        group_rows.append((qid, gid, int(msm), neg))

    def add_clause(qid: Any, gid: int, clause: dict,
                   neg: bool = False) -> int:
        (kind, body), = clause.items()
        if kind in ("function_score", "constant_score", "boosting"):
            # scoring wrappers are transparent to percolation: the doc
            # matches iff the wrapped query matches (percolate emits
            # matching query ids, not scores; the reference extracts
            # terms straight through these wrappers too —
            # percolator QueryAnalyzer). boosting's negative section
            # only demotes scores, so only `positive` gates matching.
            inner = (body.get("query") if kind == "function_score"
                     else body.get("filter") if kind == "constant_score"
                     else body.get("positive"))
            if inner is None:
                raise ValueError(
                    f"percolator: {kind} needs its inner query")
            return add_clause(qid, gid, inner, neg)
        if kind == "bool":
            # Conjunctive decomposition: must and filter (identical
            # matching semantics here) map to requirement groups;
            # should + minimum_should_match becomes ONE clause-counted
            # group.  must_not decomposes into COMPLEMENTED groups: the
            # doc matches iff every positive group is satisfied AND no
            # negative group is (reference modules/percolator/.../
            # PercolateQueryBuilder.java:83 — candidate matching then
            # verification; here verification IS the group algebra).
            # A should list WITHOUT msm alongside must is scoring-only
            # in ES and is ignored.
            unsupported = set(body) - {"must", "filter", "should",
                                       "must_not",
                                       "minimum_should_match"}
            if unsupported:
                raise ValueError(
                    f"percolator: unsupported bool sections {sorted(unsupported)}"
                )
            should = list(body.get("should") or [])
            msm_b = body.get("minimum_should_match")
            if should and msm_b:
                add_should_group(qid, gid, should, int(msm_b), neg)
                gid += 1
            elif should and not body.get("must") and not body.get("filter"):
                raise ValueError(
                    "percolator: bool with only 'should' needs "
                    "minimum_should_match (disjunctive group)"
                )
            for sub in list(body.get("must", [])) + list(body.get("filter", [])):
                gid = add_clause(qid, gid, sub, neg)
            for sub in body.get("must_not", []):
                (nkind,) = tuple(sub.keys())
                if nkind == "bool" and not (
                        set(sub["bool"]) <= {"should",
                                             "minimum_should_match"}):
                    # NOT(AND of groups) is not flat — only single-group
                    # sub-clauses (incl. a pure should+msm bool) negate
                    raise ValueError(
                        "percolator: must_not supports single-group "
                        "sub-clauses only (no nested must/filter bool)")
                if neg:
                    raise ValueError(
                        "percolator: nested must_not (double negation) "
                        "is not supported")
                gid = add_clause(qid, gid, sub, True)
            return gid
        if kind == "term":
            (field, value), = body.items()
            if isinstance(value, dict):
                value = value["value"]
            term_rows.append((qid, gid, field, str(value).lower(), 0))
            group_rows.append((qid, gid, 1, neg))
        elif kind == "terms":
            (field, values), = body.items()
            for v in values:
                term_rows.append((qid, gid, field, str(v).lower(), 0))
            group_rows.append((qid, gid, 1, neg))
        elif kind == "match":
            (field, body2), = body.items()
            terms, msm = _match_terms(field, body2)
            for ci, t in enumerate(terms):
                term_rows.append((qid, gid, field, t, ci))
            group_rows.append((qid, gid, msm, neg))
        elif kind == "prefix":
            (field, value), = body.items()
            if isinstance(value, dict):
                value = value["value"]
            pat_rows.append((
                qid, gid, field,
                _like_escape(str(value).lower()) + "%", 0))
            group_rows.append((qid, gid, 1, neg))
        elif kind == "wildcard":
            (field, value), = body.items()
            if isinstance(value, dict):
                value = value.get("value", value.get("wildcard"))
            pat_rows.append((
                qid, gid, field, _wildcard_like(str(value).lower()), 0))
            group_rows.append((qid, gid, 1, neg))
        elif kind == "match_phrase":
            (field, body2), = body.items()
            if isinstance(body2, dict):
                if int(body2.get("slop", 0)) != 0:
                    raise ValueError(
                        "percolator: match_phrase supports slop=0 only")
                text = body2["query"]
            else:
                text = body2
            toks = [t for t, _ in analyze(text, "ascii_word")]
            if not toks:
                raise ValueError(
                    f"percolator: empty match_phrase in query {qid!r}")
            phrase_rows.append((qid, gid, field, " ".join(toks)))
            group_rows.append((qid, gid, -1, neg))
        elif kind == "range":
            (field, bounds), = body.items()
            lo = bounds.get("gte", bounds.get("gt"))
            hi = bounds.get("lte", bounds.get("lt"))
            range_rows.append((
                qid, gid, field,
                float(lo) if lo is not None else None,
                float(hi) if hi is not None else None,
                "gt" in bounds, "lt" in bounds,
            ))
            group_rows.append((qid, gid, 0, neg))
        elif kind == "exists":
            field = body["field"] if isinstance(body, dict) else body
            # satisfiable through EITHER path of the same group: any
            # term of a text/keyword field (LIKE '%'), or any non-null
            # numeric value (fully open range)
            pat_rows.append((qid, gid, field, "%", 0))
            range_rows.append((qid, gid, field, None, None, False, False))
            group_rows.append((qid, gid, 1, neg))
        elif kind == "geo_bounding_box":
            # GeoBoundingBoxQueryBuilder: two closed range groups (lat,
            # lon), the date-line-crossing box's lon group holding the
            # two hemispheric strip legs (group = OR of its range rows).
            # Corners accept {"lat","lon"} dicts or (lat, lon) pairs —
            # the geo.py convention.
            if neg:
                raise ValueError(
                    "percolator: geo_bounding_box under must_not is not "
                    "flat (NOT(lat AND lon) is not a single group)")
            (field, box), = body.items()

            def _pt(p):
                if isinstance(p, dict):
                    return float(p["lat"]), float(p["lon"])
                return float(p[0]), float(p[1])

            top, left = _pt(box["top_left"])
            bottom, right = _pt(box["bottom_right"])
            range_rows.append((qid, gid, f"{field}.lat",
                               bottom, top, False, False))
            group_rows.append((qid, gid, 0, neg))
            gid += 1
            if left <= right:
                range_rows.append((qid, gid, f"{field}.lon",
                                   left, right, False, False))
            else:  # crosses the antimeridian
                range_rows.append((qid, gid, f"{field}.lon",
                                   left, None, False, False))
                range_rows.append((qid, gid, f"{field}.lon",
                                   None, right, False, False))
            group_rows.append((qid, gid, 0, neg))
        else:
            raise ValueError(f"percolator: unsupported query kind {kind!r}")
        return gid + 1

    for qid, dsl in stored:
        gid = 0
        gid = add_clause(qid, gid, dsl)
        if gid == 0:
            raise ValueError(f"query {qid!r} produced no requirement groups")
        if not any(g[0] == qid and not g[3] for g in group_rows):
            # a pure-negative query would need an anti-join against the
            # WHOLE corpus per query — out of the decomposable subset
            raise ValueError(
                f"percolator: query {qid!r} has only must_not clauses; "
                "add at least one must/filter/should requirement")
    return term_rows, pat_rows, phrase_rows, range_rows, group_rows


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    stored: list[tuple[Any, dict]],
    text_fields: list[str],
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Return (doc_id, query_id) for every stored query matching a doc.

    One pass over ``docs``: text fields tokenize JVM-side
    (regexp_extract_all — the ascii_word analyzer's exact expression),
    keyword fields contribute themselves, and the resulting
    (doc, field, term) set joins the broadcast requirement tables.
    """
    (term_rows, pat_rows, phrase_rows, range_rows,
     group_rows) = decompose_queries(stored)
    missing_phrase_fields = {r[2] for r in phrase_rows} - set(text_fields)
    if missing_phrase_fields:
        raise ValueError(
            "percolator: stored match_phrase clauses reference fields "
            f"not in text_fields: {sorted(missing_phrase_fields)}"
        )
    # exists on a text/keyword field is satisfied through the pattern
    # path; its fully-open range row is only needed for numeric fields,
    # so drop it when the field isn't numeric (keeps the loud
    # missing-field check below accurate)
    range_rows = [
        r for r in range_rows
        if not (r[3] is None and r[4] is None
                and r[2] not in numeric_fields
                and (r[2] in text_fields or r[2] in keyword_fields))
    ]
    # A range requirement on a field not listed in numeric_fields can
    # never be satisfied (and empty numeric_fields would crash below on
    # vals=None) — fail loudly instead of silently never-matching.
    missing_range_fields = {r[2] for r in range_rows} - set(numeric_fields)
    if missing_range_fields:
        raise ValueError(
            "percolator: stored range clauses reference fields not in "
            f"numeric_fields: {sorted(missing_range_fields)}"
        )
    qid_type = "string" if isinstance(stored[0][0], str) else "long"
    groups = spark.createDataFrame(
        group_rows,
        f"query_id {qid_type}, group_id int, msm int, neg boolean")

    # total POSITIVE groups per query (matching requires all of them
    # satisfied and NO negative group satisfied)
    need = groups.where(~F.col("neg")).groupBy("query_id").agg(
        F.count("*").alias("need_groups"))

    sat_parts: list[DataFrame] = []

    if term_rows or pat_rows:
        per_field = []
        for fld in text_fields:
            per_field.append(
                docs.select(
                    F.col(id_col),
                    F.lit(fld).alias("field"),
                    F.explode(F.array_distinct(F.regexp_extract_all(
                        F.lower(F.col(fld)), F.lit(_TOKEN_RE), 0)),
                    ).alias("term"),
                ))
        for fld in keyword_fields:
            per_field.append(
                docs.select(
                    F.col(id_col),
                    F.lit(fld).alias("field"),
                    F.lower(F.col(fld).cast("string")).alias("term"),
                ).where(F.col("term").isNotNull()))
        doc_terms = per_field[0]
        for p in per_field[1:]:
            doc_terms = doc_terms.unionByName(p)
        clause_hits = None
        if term_rows:
            reqs = spark.createDataFrame(
                term_rows,
                f"query_id {qid_type}, group_id int, field string, "
                "term string, clause int")
            clause_hits = doc_terms.join(
                F.broadcast(reqs), ["field", "term"]
            ).select(id_col, "query_id", "group_id", "clause")
        if pat_rows:
            # prefix/wildcard requirements: equi-join on field, LIKE on
            # the pattern (broadcast side stays tiny; the doc-term side
            # is the same single tokenize pass)
            preqs = spark.createDataFrame(
                pat_rows,
                f"query_id {qid_type}, group_id int, pfield string, "
                "pattern string, clause int")
            pat_hits = doc_terms.join(
                F.broadcast(preqs),
                (F.col("field") == F.col("pfield"))
                & F.expr("term LIKE pattern"),
            ).select(id_col, "query_id", "group_id", "clause")
            clause_hits = (
                pat_hits if clause_hits is None
                else clause_hits.unionByName(pat_hits)
            )
        term_msm = groups.where(F.col("msm") > 0)
        sat_terms = (
            clause_hits
            .groupBy(id_col, "query_id", "group_id")
            .agg(F.count_distinct("clause").alias("hits"))
            .join(F.broadcast(term_msm), ["query_id", "group_id"])
            .where(F.col("hits") >= F.col("msm"))
            .select(id_col, "query_id", "group_id")
        )
        sat_parts.append(sat_terms)

    if phrase_rows:
        # phrase verification: contiguous-token containment on the
        # space-joined analyzed field (slop=0 positions check); one
        # extra projection per phrase field, broadcast requirement side
        phr = spark.createDataFrame(
            phrase_rows,
            f"query_id {qid_type}, group_id int, pfield string, "
            "phrase string")
        pj = None
        for fld in sorted({r[2] for r in phrase_rows}):
            j = docs.select(
                F.col(id_col),
                F.lit(fld).alias("field"),
                F.concat(
                    F.lit(" "),
                    F.array_join(F.regexp_extract_all(
                        F.lower(F.col(fld)), F.lit(_TOKEN_RE), 0), " "),
                    F.lit(" "),
                ).alias("joined"),
            )
            pj = j if pj is None else pj.unionByName(j)
        sat_phrases = (
            pj.join(
                F.broadcast(phr),
                (F.col("field") == F.col("pfield"))
                & F.expr("contains(joined, ' ' || phrase || ' ')"),
            ).select(id_col, "query_id", "group_id")
        )
        sat_parts.append(sat_phrases)

    if range_rows:
        rreqs = spark.createDataFrame(
            range_rows,
            f"query_id {qid_type}, group_id int, field string, "
            "lo double, hi double, lo_open boolean, hi_open boolean")
        vals = None
        for fld in numeric_fields:
            v = docs.select(
                F.col(id_col),
                F.lit(fld).alias("field"),
                F.col(fld).cast("double").alias("val"),
            ).where(F.col("val").isNotNull())
            vals = v if vals is None else vals.unionByName(v)
        lo_ok = (
            F.col("lo").isNull()
            | F.when(F.col("lo_open"), F.col("val") > F.col("lo"))
               .otherwise(F.col("val") >= F.col("lo"))
        )
        hi_ok = (
            F.col("hi").isNull()
            | F.when(F.col("hi_open"), F.col("val") < F.col("hi"))
               .otherwise(F.col("val") <= F.col("hi"))
        )
        sat_ranges = (
            vals.join(F.broadcast(rreqs), "field")
            .where(lo_ok & hi_ok)
            .select(id_col, "query_id", "group_id")
        )
        sat_parts.append(sat_ranges)

    sat = sat_parts[0]
    for p in sat_parts[1:]:
        sat = sat.unionByName(p)

    # must_not: one extra broadcast join tags each satisfied group with
    # its polarity; a satisfied NEGATIVE group vetoes the match
    gflags = F.broadcast(groups.select("query_id", "group_id", "neg"))
    return (
        sat.join(gflags, ["query_id", "group_id"])
        .groupBy(id_col, "query_id")
        .agg(
            F.count_distinct(
                F.when(~F.col("neg"), F.col("group_id"))).alias("got"),
            F.max(F.col("neg").cast("int")).alias("neg_hit"),
        )
        .join(F.broadcast(need), "query_id")
        .where((F.col("got") == F.col("need_groups"))
               & (F.col("neg_hit") == 0))
        .select(id_col, "query_id")
    )


def percolate_requirements_sql(
    stored: list[tuple[Any, dict]],
    table: str = "documents",
    id_col: str = "doc_id",
    text_fields: list[str] = ("text",),
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
) -> str:
    """DuckDB twin of :func:`percolate` over the same stored queries —
    identical decomposition, tokenization regex, and group algebra."""
    (term_rows, pat_rows, phrase_rows, range_rows,
     group_rows) = decompose_queries(stored)
    range_rows = [  # same exists-row pruning as percolate()
        r for r in range_rows
        if not (r[3] is None and r[4] is None
                and r[2] not in numeric_fields
                and (r[2] in text_fields or r[2] in keyword_fields))
    ]

    def q(v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        return "'" + str(v).replace("'", "''") + "'"

    groups_v = ", ".join(
        f"({q(a)}, {b}, {m}, {q(n)})" for a, b, m, n in group_rows)
    parts = []
    doc_term_selects = [
        f"SELECT {id_col} AS doc_id, '{fld}' AS field, unnest(list_distinct("
        f"regexp_extract_all(lower({fld}), '{_TOKEN_RE}'))) AS term "
        f"FROM {table}"
        for fld in text_fields
    ] + [
        f"SELECT {id_col} AS doc_id, '{fld}' AS field, "
        f"lower(CAST({fld} AS VARCHAR)) AS term FROM {table} "
        f"WHERE {fld} IS NOT NULL"
        for fld in keyword_fields
    ]
    if term_rows or pat_rows:
        dt = " UNION ALL ".join(doc_term_selects)
        hit_selects = []
        if term_rows:
            reqs_v = ", ".join(
                f"({q(a)}, {b}, {q(c)}, {q(d)}, {e})"
                for a, b, c, d, e in term_rows)
            hit_selects.append(f"""
  SELECT dt.doc_id, r.query_id, r.group_id, r.clause
  FROM ({dt}) dt
  JOIN (VALUES {reqs_v}) AS r(query_id, group_id, field, term, clause)
    ON r.field = dt.field AND r.term = dt.term""")
        if pat_rows:
            preqs_v = ", ".join(
                f"({q(a)}, {b}, {q(c)}, {q(d)}, {e})"
                for a, b, c, d, e in pat_rows)
            hit_selects.append(f"""
  SELECT dt.doc_id, p.query_id, p.group_id, p.clause
  FROM ({dt}) dt
  JOIN (VALUES {preqs_v}) AS p(query_id, group_id, field, pattern, clause)
    ON p.field = dt.field AND dt.term LIKE p.pattern ESCAPE '\\'""")
        parts.append(f"""
  SELECT h.doc_id, h.query_id, h.group_id
  FROM ({' UNION ALL '.join(hit_selects)}) h
  JOIN (VALUES {groups_v}) AS g(query_id, group_id, msm, neg)
    ON g.query_id = h.query_id AND g.group_id = h.group_id AND g.msm > 0
  GROUP BY h.doc_id, h.query_id, h.group_id
  HAVING count(DISTINCT h.clause) >= any_value(g.msm)""")
    if phrase_rows:
        phr_v = ", ".join(
            f"({q(a)}, {b}, {q(c)}, {q(d)})" for a, b, c, d in phrase_rows)
        joined_selects = " UNION ALL ".join(
            f"SELECT {id_col} AS doc_id, '{fld}' AS field, "
            f"' ' || array_to_string(regexp_extract_all(lower({fld}), "
            f"'{_TOKEN_RE}'), ' ') || ' ' AS joined FROM {table}"
            for fld in sorted({r[2] for r in phrase_rows}))
        parts.append(f"""
  SELECT dj.doc_id, p.query_id, p.group_id
  FROM ({joined_selects}) dj
  JOIN (VALUES {phr_v}) AS p(query_id, group_id, field, phrase)
    ON p.field = dj.field
  WHERE contains(dj.joined, ' ' || p.phrase || ' ')""")
    if range_rows:
        rreqs_v = ", ".join(
            f"({q(a)}, {b}, {q(c)}, {q(lo)}, {q(hi)}, {q(lop)}, {q(hop)})"
            for a, b, c, lo, hi, lop, hop in range_rows)
        val_selects = " UNION ALL ".join(
            f"SELECT {id_col} AS doc_id, '{fld}' AS field, "
            f"CAST({fld} AS DOUBLE) AS val FROM {table} "
            f"WHERE {fld} IS NOT NULL"
            for fld in numeric_fields)
        parts.append(f"""
  SELECT v.doc_id, r.query_id, r.group_id
  FROM ({val_selects}) v
  JOIN (VALUES {rreqs_v})
    AS r(query_id, group_id, field, lo, hi, lo_open, hi_open)
    ON r.field = v.field
  WHERE (r.lo IS NULL OR (CASE WHEN r.lo_open THEN v.val > r.lo
                               ELSE v.val >= r.lo END))
    AND (r.hi IS NULL OR (CASE WHEN r.hi_open THEN v.val < r.hi
                               ELSE v.val <= r.hi END))""")
    sat = " UNION ALL ".join(f"({p})" for p in parts)
    return f"""
WITH sat(doc_id, query_id, group_id) AS ({sat}),
need AS (
  SELECT query_id, count(*) AS need_groups
  FROM (VALUES {groups_v}) AS g(query_id, group_id, msm, neg)
  WHERE NOT neg
  GROUP BY query_id
)
SELECT s.doc_id, s.query_id
FROM (
  SELECT t.doc_id, t.query_id,
         count(DISTINCT CASE WHEN NOT g.neg THEN t.group_id END) AS got,
         max(CASE WHEN g.neg THEN 1 ELSE 0 END) AS neg_hit
  FROM sat t
  JOIN (VALUES {groups_v}) AS g(query_id, group_id, msm, neg)
    ON g.query_id = t.query_id AND g.group_id = t.group_id
  GROUP BY t.doc_id, t.query_id
) s JOIN need n ON n.query_id = s.query_id
WHERE s.got = n.need_groups AND s.neg_hit = 0
"""


def decompose_queries_df(stored_df: DataFrame) -> dict[str, DataFrame]:
    """Distributed decomposition for a HUGE stored-query table.

    ``stored_df``: (query_id long|string, dsl string) — one stored
    query per row, DSL as JSON text (how a real percolator index would
    persist them). Each partition decomposes its queries independently
    (decompose_queries is per-query and stateless), so a billion stored
    queries become ordinary DataFrames of requirement rows — persist
    them once and every percolate() call joins against them without
    re-parsing.

    Returns {"terms": df, "patterns": df, "phrases": df, "ranges": df,
    "groups": df} with the same columns percolate() builds from the
    in-memory lists. Queries that fail decomposition (unsupported
    kinds) surface in "errors" (query_id, error) instead of raising —
    at this scale a poison query must not kill the job.
    """
    import json as _json

    import pandas as pd

    qid_type = dict(stored_df.dtypes)["query_id"]

    def part(batches):
        for pdf in batches:
            t_rows, p_rows, ph_rows, r_rows, g_rows, errs = \
                [], [], [], [], [], []
            for qid, dsl in zip(pdf["query_id"], pdf["dsl"]):
                try:
                    t, p, ph, r, g = decompose_queries(
                        [(qid, _json.loads(dsl))])
                except (ValueError, KeyError) as ex:
                    errs.append((qid, str(ex)))
                    continue
                t_rows += t
                p_rows += p
                ph_rows += ph
                r_rows += r
                g_rows += g
            def enc(row: tuple) -> str:
                # stringify every element (None stays null) so the
                # payload parses as array<string> and unpack() casts
                return _json.dumps(
                    [None if v is None else str(v) for v in row])

            yield pd.DataFrame({
                "kind": (["t"] * len(t_rows) + ["p"] * len(p_rows)
                         + ["h"] * len(ph_rows) + ["r"] * len(r_rows)
                         + ["g"] * len(g_rows) + ["e"] * len(errs)),
                "payload": [enc(x) for x in
                            t_rows + p_rows + ph_rows + r_rows
                            + g_rows + errs],
            })

    tagged = stored_df.mapInPandas(
        part, schema="kind string, payload string").cache()

    def unpack(kind: str, schema: str) -> DataFrame:
        sel = tagged.where(F.col("kind") == kind).select(
            F.from_json("payload", "array<string>").alias("a"))
        # positional unpack with casts per schema
        fields = [f.strip() for f in schema.split(",")]
        cols = []
        for i, fld in enumerate(fields):
            name, typ = fld.split(" ", 1)
            cols.append(F.element_at("a", i + 1).cast(typ).alias(name))
        return sel.select(*cols)

    return {
        "terms": unpack(
            "t", f"query_id {qid_type}, group_id int, field string, "
                 "term string, clause int"),
        "patterns": unpack(
            "p", f"query_id {qid_type}, group_id int, field string, "
                 "pattern string, clause int"),
        "phrases": unpack(
            "h", f"query_id {qid_type}, group_id int, field string, "
                 "phrase string"),
        "ranges": unpack(
            "r", f"query_id {qid_type}, group_id int, field string, "
                 "lo double, hi double, lo_open boolean, hi_open boolean"),
        "groups": unpack(
            "g", f"query_id {qid_type}, group_id int, msm int, "
                 "neg boolean"),
        "errors": unpack("e", f"query_id {qid_type}, error string"),
    }


def percolate_prepared(
    spark: SparkSession,
    docs: DataFrame,
    reqs: dict[str, DataFrame],
    text_fields: list[str],
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
    id_col: str = "doc_id",
    broadcast_reqs: bool = True,
) -> DataFrame:
    """Percolate against PREPARED requirement tables — the output of
    :func:`decompose_queries_df`, persisted once for a billion stored
    queries and joined on every matching call without re-parsing any
    DSL (the reference's analogue: the percolator FIELD, where
    extracted terms live in the index, not in the request).

    Same group algebra as :func:`percolate`; the requirement sides are
    DataFrames, broadcast when ``broadcast_reqs`` (small registries) or
    shuffled as ordinary joins when the stored-query corpus itself is
    big data.
    """
    def side(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_reqs else df

    groups = reqs["groups"]
    need = groups.where(~F.col("neg")).groupBy("query_id").agg(
        F.count("*").alias("need_groups"))
    sat_parts: list[DataFrame] = []

    per_field = []
    for fld in text_fields:
        per_field.append(
            docs.select(
                F.col(id_col),
                F.lit(fld).alias("field"),
                F.explode(F.array_distinct(F.regexp_extract_all(
                    F.lower(F.col(fld)), F.lit(_TOKEN_RE), 0)),
                ).alias("term"),
            ))
    for fld in keyword_fields:
        per_field.append(
            docs.select(
                F.col(id_col),
                F.lit(fld).alias("field"),
                F.lower(F.col(fld).cast("string")).alias("term"),
            ).where(F.col("term").isNotNull()))
    doc_terms = per_field[0]
    for p in per_field[1:]:
        doc_terms = doc_terms.unionByName(p)

    clause_hits = doc_terms.join(
        side(reqs["terms"]), ["field", "term"]
    ).select(id_col, "query_id", "group_id", "clause")
    pat = reqs["patterns"].withColumnRenamed("field", "pfield")
    pat_hits = doc_terms.join(
        side(pat),
        (F.col("field") == F.col("pfield"))
        & F.expr("term LIKE pattern"),
    ).select(id_col, "query_id", "group_id", "clause")
    clause_hits = clause_hits.unionByName(pat_hits)
    term_msm = groups.where(F.col("msm") > 0)
    sat_parts.append(
        clause_hits.groupBy(id_col, "query_id", "group_id")
        .agg(F.count_distinct("clause").alias("hits"))
        .join(side(term_msm), ["query_id", "group_id"])
        .where(F.col("hits") >= F.col("msm"))
        .select(id_col, "query_id", "group_id")
    )

    phr = reqs["phrases"].withColumnRenamed("field", "pfield")
    pj = None
    for fld in text_fields:
        j = docs.select(
            F.col(id_col),
            F.lit(fld).alias("field"),
            F.concat(
                F.lit(" "),
                F.array_join(F.regexp_extract_all(
                    F.lower(F.col(fld)), F.lit(_TOKEN_RE), 0), " "),
                F.lit(" "),
            ).alias("joined"),
        )
        pj = j if pj is None else pj.unionByName(j)
    sat_parts.append(
        pj.join(
            side(phr),
            (F.col("field") == F.col("pfield"))
            & F.expr("contains(joined, ' ' || phrase || ' ')"),
        ).select(id_col, "query_id", "group_id")
    )

    if numeric_fields:
        vals = None
        for fld in numeric_fields:
            v = docs.select(
                F.col(id_col),
                F.lit(fld).alias("field"),
                F.col(fld).cast("double").alias("val"),
            ).where(F.col("val").isNotNull())
            vals = v if vals is None else vals.unionByName(v)
        lo_ok = (
            F.col("lo").isNull()
            | F.when(F.col("lo_open"), F.col("val") > F.col("lo"))
               .otherwise(F.col("val") >= F.col("lo"))
        )
        hi_ok = (
            F.col("hi").isNull()
            | F.when(F.col("hi_open"), F.col("val") < F.col("hi"))
               .otherwise(F.col("val") <= F.col("hi"))
        )
        sat_parts.append(
            vals.join(side(reqs["ranges"]), "field")
            .where(lo_ok & hi_ok)
            .select(id_col, "query_id", "group_id")
        )

    sat = sat_parts[0]
    for p in sat_parts[1:]:
        sat = sat.unionByName(p)
    gflags = side(groups.select("query_id", "group_id", "neg"))
    return (
        sat.join(gflags, ["query_id", "group_id"])
        .groupBy(id_col, "query_id")
        .agg(
            F.count_distinct(
                F.when(~F.col("neg"), F.col("group_id"))).alias("got"),
            F.max(F.col("neg").cast("int")).alias("neg_hit"),
        )
        .join(side(need), "query_id")
        .where((F.col("got") == F.col("need_groups"))
               & (F.col("neg_hit") == 0))
        .select(id_col, "query_id")
    )


# ---------------------------------------------------------------------------
# Universal verify path: candidate pruning + compiled per-query verification
#
# The reference percolates queries OUTSIDE the extractable subset by
# pre-filtering candidates with whatever terms the QueryAnalyzer could
# extract (or matching ALL docs when extraction "failed" —
# PercolatorFieldMapper.java extraction_result=failed) and then running
# the real query against a single-doc MemoryIndex
# (PercolateQueryBuilder.java:83, PercolateQuery's verified/candidate
# two-phase weight).  The Spark-first analogue keeps both phases inside
# ONE Catalyst plan: candidates come from the same (doc, field, term)
# equi-join the fast path uses, and verification is a per-query boolean
# expression compiled once on the driver and dispatched with a CASE
# chain on query_id — whole-stage codegen, no per-doc Python, no
# MemoryIndex.  Cost scales as O(candidate pairs), exactly like the
# reference's verify phase.
# ---------------------------------------------------------------------------


def _field_type(
    field: str,
    text_fields: set[str],
    keyword_fields: set[str],
    numeric_fields: set[str],
) -> str:
    if field in text_fields:
        return "text"
    if field in keyword_fields:
        return "keyword"
    if field in numeric_fields:
        return "numeric"
    raise ValueError(
        f"percolator verify: field {field!r} not declared in "
        "text_fields / keyword_fields / numeric_fields / nested_fields")


def _span_positions(tokens, term: str):
    """Positions of ``term`` in an ordered token-array Column."""
    return F.filter(
        F.transform(tokens, lambda x, i: F.when(x == F.lit(term), i)),
        lambda p: p.isNotNull(),
    )


def compile_verify_predicate(
    dsl: dict,
    *,
    text_fields: set[str],
    keyword_fields: set[str],
    numeric_fields: set[str],
    id_col: str = "doc_id",
    resolve=None,
):
    """Compile one stored query to a boolean Column with the SAME
    matching semantics as the requirement-decomposition fast path
    (analyzed-token membership for text fields, lowercased equality for
    keyword fields, double-cast numerics), extended to the constructs
    the fast path refuses: arbitrary bool nesting (incl. nested
    must_not / pure-negative), ``nested`` sub-document queries
    (ESToParentBlockJoinQuery in filter context: ANY array element
    satisfies the inner query), regexp / fuzzy / ids, and scoring
    wrappers.  ES NULL-field semantics: a predicate over a missing
    field is False, never NULL (BooleanQuery set semantics)."""
    if resolve is None:
        resolve = F.col

    def _false_if_null(pred):
        return F.coalesce(pred, F.lit(False))

    def toks(field: str, distinct: bool = False):
        ftype = _field_type(field, text_fields, keyword_fields,
                            numeric_fields)
        c = resolve(field)
        if ftype == "text":
            arr = F.regexp_extract_all(F.lower(c), F.lit(_TOKEN_RE), 0)
            return F.array_distinct(arr) if distinct else arr
        if ftype == "keyword":
            return F.filter(F.array(F.lower(c.cast("string"))),
                            lambda x: x.isNotNull())
        raise ValueError(
            f"percolator verify: term-level clause on numeric field "
            f"{field!r} (use range/term with a number)")

    def num(field: str):
        _field_type(field, text_fields, keyword_fields, numeric_fields)
        return resolve(field).cast("double")

    def _span_eff_fields(node: dict) -> set:
        """Effective field(s) of a span tree (span_field_masking rebinds
        its subtree's field, Lucene SpanQuery.getField contract); every
        combiner requires ONE shared effective field."""
        (kind, body), = node.items()
        if kind == "span_term":
            (field, _spec), = body.items()
            return {field}
        if kind == "span_field_masking":
            inner = _span_eff_fields(body["query"])
            if len(inner) != 1:
                raise ValueError(
                    "percolator verify: span_field_masking inner query "
                    f"must be single-field, got {sorted(inner)}")
            return {body["field"]}
        children = {
            "span_or": lambda b: list(b["clauses"]),
            "span_near": lambda b: list(b["clauses"]),
            "span_not": lambda b: [b["include"], b["exclude"]],
            "span_within": lambda b: [b["little"], b["big"]],
            "span_containing": lambda b: [b["little"], b["big"]],
            "span_first": lambda b: [b["match"]],
        }
        if kind not in children:
            raise ValueError(
                f"percolator verify: unsupported span query {kind!r}")
        fields = set()
        for c in children[kind](body):
            fields |= _span_eff_fields(c)
        if len(fields) != 1:
            raise ValueError(
                f"percolator verify: {kind} clauses must share "
                f"one field, got {sorted(fields)}")
        return fields

    def _spans(node: dict):
        """Span tree -> Column array<struct<s,e,c>> of matching spans
        over the analyzed token positions — the column-compiled twin of
        spans.eval_span (same (start, end, covered) algebra), so ANY
        span composition verifies, including nesting under span_near."""
        (kind, body), = node.items()
        if kind == "span_term":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            pos = _span_positions(toks(field), str(value).lower())
            return F.transform(pos, lambda p: F.struct(
                p.cast("int").alias("s"), p.cast("int").alias("e"),
                F.lit(1).alias("c")))
        if kind == "span_field_masking":
            # positions come from the INNER field verbatim
            return _spans(body["query"])
        if kind == "span_or":
            arrs = [_spans(c) for c in body["clauses"]]
            return arrs[0] if len(arrs) == 1 else F.concat(*arrs)
        if kind == "span_first":
            end = int(body["end"])
            return F.filter(_spans(body["match"]),
                            lambda x: x["e"] < F.lit(end))
        if kind == "span_not":
            inc, exc = _spans(body["include"]), _spans(body["exclude"])
            return F.filter(inc, lambda i: ~F.coalesce(
                F.exists(exc, lambda x:
                         (x["s"] <= i["e"]) & (x["e"] >= i["s"])),
                F.lit(False)))
        if kind == "span_within":
            little, big = _spans(body["little"]), _spans(body["big"])
            return F.filter(little, lambda l: F.coalesce(
                F.exists(big, lambda b:
                         (b["s"] <= l["s"]) & (l["e"] <= b["e"])),
                F.lit(False)))
        if kind == "span_containing":
            little, big = _spans(body["little"]), _spans(body["big"])
            return F.filter(big, lambda b: F.coalesce(
                F.exists(little, lambda l:
                         (b["s"] <= l["s"]) & (l["e"] <= b["e"])),
                F.lit(False)))
        if kind == "span_near":
            slop = int(body.get("slop", 0))
            in_order = bool(body.get("in_order", True))
            arrs = [_spans(c) for c in body["clauses"]]
            n = len(arrs)
            if n == 1:
                return arrs[0]

            def combos(i: int, chosen: list):
                # cross-product over sub-span choices via nested
                # transform + flatten; each full choice folds to one
                # composite span (or NULL when the combination is
                # invalid), filtered at the top. Candidate-pair-only
                # evaluation bounds the product by per-doc term
                # frequency.
                if i == n:
                    min_s = F.least(*[c["s"] for c in chosen])
                    max_e = F.greatest(*[c["e"] for c in chosen])
                    width = max_e - min_s + F.lit(1)
                    csum = chosen[0]["c"]
                    for c in chosen[1:]:
                        csum = csum + c["c"]
                    if in_order:
                        cond = chosen[1]["s"] > chosen[0]["e"]
                        for a in range(1, n - 1):
                            cond = cond & (
                                chosen[a + 1]["s"] > chosen[a]["e"])
                    else:
                        cond = F.lit(True)
                        for a in range(n):
                            for b_ in range(a + 1, n):
                                cond = cond & (
                                    (chosen[a]["s"] > chosen[b_]["e"])
                                    | (chosen[b_]["s"] > chosen[a]["e"]))
                    cond = cond & ((width - csum) <= F.lit(slop))
                    return F.array(F.when(cond, F.struct(
                        min_s.cast("int").alias("s"),
                        max_e.cast("int").alias("e"),
                        width.cast("int").alias("c"))))
                return F.flatten(F.transform(
                    arrs[i], lambda x: combos(i + 1, chosen + [x])))

            return F.filter(combos(0, []), lambda x: x.isNotNull())
        raise ValueError(
            f"percolator verify: unsupported span query {kind!r}")

    def build(node: dict):
        if len(node) != 1:
            raise ValueError(
                f"query object must have exactly one key: {node}")
        (kind, body), = node.items()

        if kind == "match_all":
            return F.lit(True)
        if kind == "match_none":
            return F.lit(False)
        if kind in ("constant_score", "function_score", "boosting",
                    "wrapper"):
            if kind == "wrapper":
                import base64
                import json as _json
                return build(_json.loads(base64.b64decode(body["query"])))
            inner = (body.get("query") if kind == "function_score"
                     else body.get("filter") if kind == "constant_score"
                     else body.get("positive"))
            if inner is None:
                raise ValueError(
                    f"percolator verify: {kind} needs its inner query")
            return build(inner)
        if kind == "ids":
            return F.col(id_col).isin(list(body["values"]))
        if kind == "term":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            ftype = _field_type(field, text_fields, keyword_fields,
                                numeric_fields)
            if ftype == "numeric":
                return _false_if_null(num(field) == F.lit(float(value)))
            return _false_if_null(F.array_contains(
                toks(field, distinct=True), str(value).lower()))
        if kind == "terms":
            (field, values), = body.items()
            ftype = _field_type(field, text_fields, keyword_fields,
                                numeric_fields)
            if ftype == "numeric":
                return _false_if_null(
                    num(field).isin([float(v) for v in values]))
            return _false_if_null(F.arrays_overlap(
                toks(field, distinct=True),
                F.array(*[F.lit(str(v).lower()) for v in values])))
        if kind == "match":
            (field, body2), = body.items()
            terms, msm = _match_terms(field, body2)
            if not terms:
                return F.lit(False)
            return _false_if_null(
                F.size(F.array_intersect(
                    toks(field, distinct=True),
                    F.array(*[F.lit(t) for t in terms]))) >= F.lit(msm))
        if kind == "match_phrase":
            (field, body2), = body.items()
            slop = 0
            if isinstance(body2, dict):
                slop = int(body2.get("slop", 0))
                text = body2["query"]
            else:
                text = body2
            ptoks = [t for t, _ in analyze(text, "ascii_word")]
            if not ptoks:
                return F.lit(False)
            if slop > 0:
                from elasticsearch_spark.search.dsl import \
                    sloppy_phrase_pred
                return sloppy_phrase_pred(toks(field), ptoks, slop)
            joined = F.concat(F.lit(" "),
                              F.array_join(toks(field), " "), F.lit(" "))
            return _false_if_null(
                joined.contains(" " + " ".join(ptoks) + " "))
        if kind == "prefix":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            return _false_if_null(F.exists(
                toks(field, distinct=True),
                lambda t: t.startswith(str(value).lower())))
        if kind == "wildcard":
            (field, spec), = body.items()
            if isinstance(spec, dict):
                value = spec.get("value", spec.get("wildcard"))
            else:
                value = spec
            from elasticsearch_spark.search.dsl import _wildcard_to_regex
            rx = _wildcard_to_regex(str(value).lower())
            return _false_if_null(F.exists(
                toks(field, distinct=True), lambda t: t.rlike(rx)))
        if kind == "regexp":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            return _false_if_null(F.exists(
                toks(field, distinct=True),
                lambda t: t.rlike(f"^(?:{value})$")))
        if kind == "fuzzy":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            fuzz = (int(spec.get("fuzziness", 2))
                    if isinstance(spec, dict) else 2)
            return _false_if_null(F.exists(
                toks(field, distinct=True),
                lambda t: F.levenshtein(t, F.lit(str(value).lower()))
                <= F.lit(fuzz)))
        if kind == "exists":
            field = body["field"] if isinstance(body, dict) else body
            ftype = _field_type(field, text_fields, keyword_fields,
                                numeric_fields)
            if ftype == "text":
                return _false_if_null(F.size(toks(field)) > 0)
            return resolve(field).isNotNull()
        if kind == "range":
            (field, bounds), = body.items()
            c = num(field)
            conds = []
            if "gte" in bounds:
                conds.append(c >= F.lit(float(bounds["gte"])))
            if "gt" in bounds:
                conds.append(c > F.lit(float(bounds["gt"])))
            if "lte" in bounds:
                conds.append(c <= F.lit(float(bounds["lte"])))
            if "lt" in bounds:
                conds.append(c < F.lit(float(bounds["lt"])))
            if not conds:
                return resolve(field).isNotNull()
            out = conds[0]
            for x in conds[1:]:
                out = out & x
            return _false_if_null(out)
        if kind == "geo_bounding_box":
            (field, box), = body.items()

            def _pt(p):
                if isinstance(p, dict):
                    return float(p["lat"]), float(p["lon"])
                return float(p[0]), float(p[1])

            top, left = _pt(box["top_left"])
            bottom, right = _pt(box["bottom_right"])
            lat = resolve(f"{field}.lat").cast("double")
            lon = resolve(f"{field}.lon").cast("double")
            lat_ok = (lat >= F.lit(bottom)) & (lat <= F.lit(top))
            if left <= right:
                lon_ok = (lon >= F.lit(left)) & (lon <= F.lit(right))
            else:  # crosses the antimeridian
                lon_ok = (lon >= F.lit(left)) | (lon <= F.lit(right))
            return _false_if_null(lat_ok & lon_ok)
        if kind == "intervals":
            # IntervalsSourceProvider -> the shared span compiler; the
            # resulting span tree (nested all_of included) verifies
            # through the full span-algebra combinators below
            from elasticsearch_spark.search.spans import (
                _bind_field,
                intervals_to_span,
            )

            (field, src), = body.items()
            return build(_bind_field(intervals_to_span(src), field))
        if kind in ("span_term", "span_or", "span_first", "span_near",
                    "span_not", "span_within", "span_containing",
                    "span_field_masking"):
            # Full span algebra, compiled to array<struct<s,e,c>>
            # combinators mirroring spans.eval_span exactly (Lucene
            # SpanQuery semantics: non-overlap, ordered chains, slop =
            # uncovered width, composed spans count their whole width).
            _span_eff_fields(node)
            return _false_if_null(F.size(_spans(node)) > 0)
        if kind == "nested":
            path = body["path"]
            inner = body["query"]
            prefix = path + "."
            sub = {f[len(prefix):]
                   for f in (text_fields | keyword_fields | numeric_fields)
                   if f.startswith(prefix)}
            if not sub:
                raise ValueError(
                    f"percolator verify: nested path {path!r} has no "
                    "declared subfields (declare them as "
                    f"'{path}.<field>' in the field lists)")

            def make_resolver(x):
                def r(f: str):
                    return x[f[len(prefix):]] if f.startswith(prefix) \
                        else resolve(f)
                return r

            def inner_pred(x):
                return compile_verify_predicate(
                    inner,
                    text_fields=text_fields,
                    keyword_fields=keyword_fields,
                    numeric_fields=numeric_fields,
                    id_col=id_col, resolve=make_resolver(x))

            return _false_if_null(F.exists(resolve(path), inner_pred))
        if kind == "bool":
            unsupported = set(body) - {"must", "filter", "should",
                                       "must_not", "minimum_should_match"}
            if unsupported:
                raise ValueError(
                    "percolator verify: unsupported bool sections "
                    f"{sorted(unsupported)}")
            clauses = []
            for q_ in list(body.get("must") or []) + list(
                    body.get("filter") or []):
                clauses.append(_false_if_null(build(q_)))
            has_positive = bool(clauses)
            should = list(body.get("should") or [])
            if should:
                msm = body.get("minimum_should_match")
                if msm is None:
                    msm = 0 if has_positive else 1
                if int(msm) > 0:
                    n = sum(_false_if_null(build(q_)).cast("int")
                            for q_ in should)
                    clauses.append(n >= F.lit(int(msm)))
            for q_ in body.get("must_not") or []:
                clauses.append(~_false_if_null(build(q_)))
            if not clauses:
                return F.lit(True)
            out = clauses[0]
            for c in clauses[1:]:
                out = out & c
            return out
        raise ValueError(
            f"percolator verify: unsupported query kind {kind!r}")

    return build(dsl)


def extract_candidate_terms(
    dsl: dict,
    numeric_fields: set[str] = frozenset(),
) -> frozenset | None:
    """Best-effort extraction of a pruning term set for one stored
    query: a doc can only match if it contains AT LEAST ONE of the
    returned (field, term) pairs.  ``None`` means extraction failed
    (the reference's extraction_result=failed) and every doc is a
    candidate; an EMPTY set means the query is unsatisfiable (no doc
    is a candidate).  Mirrors percolator QueryAnalyzer.java: must_not
    never constrains candidates, a conjunction is covered by the union
    of its extractable conjuncts, a disjunction only extracts when
    EVERY disjunct does."""

    def ext(node: dict):
        (kind, body), = node.items()
        if kind in ("constant_score", "function_score", "boosting",
                    "wrapper"):
            if kind == "wrapper":
                import base64
                import json as _json
                return ext(_json.loads(base64.b64decode(body["query"])))
            inner = (body.get("query") if kind == "function_score"
                     else body.get("filter") if kind == "constant_score"
                     else body.get("positive"))
            return ext(inner) if inner is not None else None
        if kind == "term":
            (field, spec), = body.items()
            if field in numeric_fields:
                return None
            value = spec["value"] if isinstance(spec, dict) else spec
            return {(field, str(value).lower())}
        if kind == "terms":
            (field, values), = body.items()
            if field in numeric_fields:
                return None
            return {(field, str(v).lower()) for v in values}
        if kind == "match":
            (field, body2), = body.items()
            terms, _ = _match_terms(field, body2)
            return {(field, t) for t in terms}
        if kind == "match_phrase":
            (field, body2), = body.items()
            text = body2["query"] if isinstance(body2, dict) else body2
            return {(field, t) for t, _ in analyze(text, "ascii_word")}
        if kind == "match_none":
            return set()
        if kind == "intervals":
            from elasticsearch_spark.search.spans import (
                _bind_field,
                intervals_to_span,
            )

            (field, src), = body.items()
            return ext(_bind_field(intervals_to_span(src), field))
        if kind == "span_term":
            (field, spec), = body.items()
            value = spec["value"] if isinstance(spec, dict) else spec
            return {(field, str(value).lower())}
        if kind == "span_near":
            # conjunction of its clauses: union of any extractable one
            got = [ext(c) for c in body.get("clauses", [])]
            succ = [g for g in got if g is not None]
            if not succ:
                return None
            u = set()
            for g in succ:
                u |= g
            return u
        if kind == "span_or":
            got = [ext(c) for c in body.get("clauses", [])]
            if any(g is None for g in got) or not got:
                return None
            u = set()
            for g in got:
                u |= g
            return u
        if kind == "span_first":
            return ext(body["match"])
        if kind == "span_not":
            return ext(body["include"])  # exclude is not necessary
        if kind in ("span_within", "span_containing"):
            # conjunction of little and big: union of any extractable
            got = [ext(body["little"]), ext(body["big"])]
            succ = [g for g in got if g is not None]
            if not succ:
                return None
            u = set()
            for g in succ:
                u |= g
            return u
        if kind == "span_field_masking":
            return ext(body["query"])
        if kind == "nested":
            # inner fields are written with their full dotted path, so
            # the extracted pairs join the nested doc-term rows as-is
            return ext(body["query"])
        if kind == "bool":
            pos = list(body.get("must") or []) + list(
                body.get("filter") or [])
            got = [ext(q_) for q_ in pos]
            succ = [g for g in got if g is not None]
            if any(g == set() for g in succ):
                return set()  # an unsatisfiable conjunct: never matches
            should = list(body.get("should") or [])
            msm = body.get("minimum_should_match")
            gating = bool(should) and (msm is not None or not pos)
            if gating:
                sg = [ext(q_) for q_ in should]
                if all(g is not None for g in sg):
                    u = set()
                    for g in sg:
                        u |= g
                    succ.append(u)
                elif not succ:
                    return None
            if succ:
                u = set()
                for g in succ:
                    u |= g
                return frozenset(u)
            return None
        # range / exists / prefix / wildcard / regexp / fuzzy / ids /
        # geo / script / match_all: no safe term superset
        return None

    out = ext(dsl)
    return frozenset(out) if out is not None else None


def _doc_term_frame(
    docs: DataFrame,
    text_fields: list[str],
    keyword_fields: list[str],
    nested_fields: dict[str, dict[str, list[str]]] | None,
    id_col: str,
) -> DataFrame:
    """(doc, field, term) rows: one tokenize pass per text field,
    lowercased identity for keyword fields, and the same per-element
    for nested paths (field name = the dotted path)."""
    parts = []
    for fld in text_fields:
        parts.append(docs.select(
            F.col(id_col), F.lit(fld).alias("field"),
            F.explode(F.array_distinct(F.regexp_extract_all(
                F.lower(F.col(fld)), F.lit(_TOKEN_RE), 0))).alias("term")))
    for fld in keyword_fields:
        parts.append(docs.select(
            F.col(id_col), F.lit(fld).alias("field"),
            F.lower(F.col(fld).cast("string")).alias("term"),
        ).where(F.col("term").isNotNull()))
    for path, spec in (nested_fields or {}).items():
        ex = docs.select(F.col(id_col),
                         F.explode(F.col(path)).alias("__e"))
        for sub in spec.get("text", []):
            parts.append(ex.select(
                F.col(id_col), F.lit(f"{path}.{sub}").alias("field"),
                F.explode(F.array_distinct(F.regexp_extract_all(
                    F.lower(F.col(f"__e.{sub}")), F.lit(_TOKEN_RE), 0)),
                ).alias("term")))
        for sub in spec.get("keyword", []):
            parts.append(ex.select(
                F.col(id_col), F.lit(f"{path}.{sub}").alias("field"),
                F.lower(F.col(f"__e.{sub}").cast("string")).alias("term"),
            ).where(F.col("term").isNotNull()))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def percolate_verified(
    spark: SparkSession,
    docs: DataFrame,
    stored: list[tuple[Any, dict]],
    text_fields: list[str],
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
    nested_fields: dict[str, dict[str, list[str]]] | None = None,
    id_col: str = "doc_id",
    mode: str = "auto",
    chunk: int = 100,
) -> DataFrame:
    """Percolate with universal coverage: requirement-decomposable
    stored queries run through the set-algebra fast path
    (:func:`percolate`), everything else — nested, double negation,
    pure-negative, regexp/fuzzy/ids, free bool nesting — through
    candidate pruning + compiled verification.  ``mode="verify"``
    forces every query through the verify path (parity testing).

    Scale shape: candidates come from the SAME single tokenize pass
    and broadcast term join as the fast path; verification is a CASE
    chain over compiled per-query predicates evaluated only on
    candidate (doc, query) pairs, chunked ``chunk`` queries per plan
    branch so codegen stays bounded for large stored-query registries.
    Extraction-failed queries verify against every doc, exactly like
    the reference's extraction_result=failed candidates."""
    if mode not in ("auto", "verify"):
        raise ValueError(f"percolate_verified: unknown mode {mode!r}")
    tset = set(text_fields)
    kset = set(keyword_fields)
    nset = set(numeric_fields)
    for path, spec in (nested_fields or {}).items():
        tset |= {f"{path}.{s}" for s in spec.get("text", [])}
        kset |= {f"{path}.{s}" for s in spec.get("keyword", [])}
        nset |= {f"{path}.{s}" for s in spec.get("numeric", [])}

    fast: list[tuple[Any, dict]] = []
    verify: list[tuple[Any, dict]] = []
    if mode == "verify":
        verify = list(stored)
    else:
        for qid, dsl in stored:
            try:
                decompose_queries([(qid, dsl)])
                fast.append((qid, dsl))
            except ValueError:
                verify.append((qid, dsl))

    qid_type = "string" if isinstance(stored[0][0], str) else "long"
    outs: list[DataFrame] = []
    if fast:
        outs.append(percolate(
            spark, docs, fast, text_fields=list(text_fields),
            keyword_fields=list(keyword_fields),
            numeric_fields=list(numeric_fields), id_col=id_col))

    if verify:
        extracted = [(qid, dsl,
                      extract_candidate_terms(dsl, numeric_fields=nset))
                     for qid, dsl in verify]
        req_rows = [(qid, f, t) for qid, _, terms in extracted
                    if terms is not None for f, t in sorted(terms)]
        all_qids = [qid for qid, _, terms in extracted if terms is None]

        cand_parts: list[DataFrame] = []
        if req_rows:
            reqs = spark.createDataFrame(
                req_rows,
                f"query_id {qid_type}, field string, term string")
            doc_terms = _doc_term_frame(
                docs, list(text_fields), list(keyword_fields),
                nested_fields, id_col)
            cand_parts.append(
                doc_terms.join(F.broadcast(reqs), ["field", "term"])
                .select(id_col, "query_id").distinct())
        if all_qids:
            allq = spark.createDataFrame(
                [(qid,) for qid in all_qids], f"query_id {qid_type}")
            cand_parts.append(
                docs.select(id_col).crossJoin(F.broadcast(allq)))
        cands = cand_parts[0]
        for p in cand_parts[1:]:
            cands = cands.unionByName(p)

        preds = {qid: compile_verify_predicate(
            dsl, text_fields=tset, keyword_fields=kset,
            numeric_fields=nset, id_col=id_col)
            for qid, dsl, _ in extracted}
        qids = [qid for qid, _, _ in extracted]
        for i in range(0, len(qids), chunk):
            batch = qids[i:i + chunk]
            pred = F.lit(False)
            cond = None
            for qid in batch:
                c = F.col("query_id") == F.lit(qid)
                cond = c if cond is None else (cond | c)
                pred = F.when(c, preds[qid]).otherwise(pred)
            outs.append(
                docs.join(cands.where(cond), id_col)
                .where(pred).select(id_col, "query_id"))

    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out


def percolate_matches_column(
    stored: list[tuple[Any, dict]],
    text_fields: list[str],
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
    nested_fields: dict[str, dict[str, list[str]]] | None = None,
    id_col: str = "doc_id",
):
    """Array-of-matching-query-ids Column over a doc row — every
    stored query compiled once, evaluated inline. Stateless (no join,
    no aggregation), so the same expression serves static frames and
    Structured Streaming micro-batches."""
    tset = set(text_fields)
    kset = set(keyword_fields)
    nset = set(numeric_fields)
    for path, spec in (nested_fields or {}).items():
        tset |= {f"{path}.{s}" for s in spec.get("text", [])}
        kset |= {f"{path}.{s}" for s in spec.get("keyword", [])}
        nset |= {f"{path}.{s}" for s in spec.get("numeric", [])}
    cells = [
        F.when(compile_verify_predicate(
            dsl, text_fields=tset, keyword_fields=kset,
            numeric_fields=nset, id_col=id_col), F.lit(qid))
        for qid, dsl in stored
    ]
    return F.filter(F.array(*cells), lambda x: x.isNotNull())


def percolate_stream(
    docs: DataFrame,
    stored: list[tuple[Any, dict]],
    text_fields: list[str],
    keyword_fields: list[str] = (),
    numeric_fields: list[str] = (),
    nested_fields: dict[str, dict[str, list[str]]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming percolation (the reference's percolator + watcher
    alerting shape): ``docs`` may be a Structured Streaming frame; the
    output streams one (doc, query) row per match, ready for any alert
    sink. Completely stateless — no watermark, no state store, exactly
    the per-record evaluation the reference performs per indexed doc.

    Scale note: every stored query's compiled predicate evaluates per
    record (no candidate pruning — pruning needs a doc-terms join,
    which is a per-batch concern). Right for alerting registries up to
    a few thousand queries; for percolating a huge registry over a
    stream, run :func:`percolate_verified` inside foreachBatch
    instead, where the candidate term join amortizes per micro-batch.
    """
    matched = percolate_matches_column(
        stored, text_fields, keyword_fields, numeric_fields,
        nested_fields, id_col)
    return docs.select(F.col(id_col),
                       F.explode(matched).alias("query_id"))
