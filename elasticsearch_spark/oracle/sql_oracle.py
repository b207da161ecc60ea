"""ANSI-SQL (DuckDB-runnable) twins of engine queries.

The BM25 oracle reproduces the engine's exact-dl scoring mode
(quantize_norms=False) with the ``ascii_word`` analyzer, whose SQL twin
is ``regexp_extract_all(lower(text), '[a-z0-9_]+')``. Scores are
float64 on both sides and rounded to 4 decimals before comparison.

``bm25_ctes`` emits a prefixed CTE block so multiple scored clauses
(multi_match, dis_max, rescore, more_like_this) compose in one query.
"""

from __future__ import annotations

K1 = 1.2
B = 0.75


def _sql_str_list(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({quoted})"


def _dedup(terms: list[str]) -> list[str]:
    return list(dict.fromkeys(terms))


def english_light_list_sql(text_col: str = "text") -> str:
    """Token-list SQL for the ``english_light`` analyzer: ascii_word
    tokens -> english stopword removal -> S-stemmer cascade — the exact
    twin of analyzers._analyze_english_light."""
    from elasticsearch_spark.analysis.analyzers import ENGLISH_STOPWORDS
    from elasticsearch_spark.analysis.stem import s_stem_sql

    stops = _sql_str_list(sorted(ENGLISH_STOPWORDS))
    return (
        f"list_transform(list_filter(regexp_extract_all(lower({text_col}),"
        f" '[a-z0-9_]+'), t -> t NOT IN {stops}), t -> {s_stem_sql('t')})"
    )


def bm25_ctes(
    terms: list[str] | None,
    prefix: str = "",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    terms_cte: str | None = None,
    tok_list_expr: str | None = None,
    tok_select: str | None = None,
    dl_expr: str = "count(*)",
) -> str:
    """CTE block computing ``{prefix}scored(doc_id, score, matched)``.

    ``terms`` is an explicit term list (IN filter); alternatively pass
    ``terms_cte``, the name of a CTE with a ``term`` column (used by the
    more_like_this oracle). All intermediate CTE names carry ``prefix``
    so several blocks can coexist in one WITH clause.
    ``tok_list_expr`` overrides the analyzer's token-list SQL (default
    ascii_word; pass english_light_list_sql(...) for the stemmed field).
    ``tok_select`` replaces the whole tok CTE body (must yield doc_id,
    term and whatever ``dl_expr`` reads — used with position-overlapping
    token streams such as synonym expansion, where field length is
    ``count(DISTINCT pos)`` per Lucene discountOverlaps while avgdl
    still counts every token, engine rebuild_global_stats parity).
    """
    p = prefix
    if terms_cte is not None:
        tf_filter = f"JOIN {terms_cte} q ON q.term = x.term"
        where = ""
    else:
        tf_filter = ""
        where = f"WHERE x.term IN {_sql_str_list(_dedup(terms))}"
    tok_list = tok_list_expr or (
        f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+')"
    )
    tok_body = tok_select or f"""
  SELECT {id_col} AS doc_id,
         unnest({tok_list}) AS term
  FROM {table}"""
    return f"""
{p}tok AS ({tok_body}
),
{p}stats AS (
  SELECT (SELECT count(*) FROM {p}tok) * 1.0
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT count(*) FROM {table}) * 1.0 AS n
),
{p}dl AS (SELECT doc_id, {dl_expr} * 1.0 AS dl FROM {p}tok GROUP BY doc_id),
{p}tf AS (
  SELECT x.doc_id, x.term, count(*) * 1.0 AS tf
  FROM {p}tok x {tf_filter}
  {where}
  GROUP BY x.doc_id, x.term
),
{p}df AS (SELECT term, count(*) * 1.0 AS df FROM {p}tf GROUP BY term),
{p}scored AS (
  SELECT tf.doc_id,
         sum(({K1} + 1.0)
             * ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf
             / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl))
         ) AS score,
         count(*) AS matched
  FROM {p}tf tf
  JOIN {p}df df ON tf.term = df.term
  JOIN {p}dl dl ON tf.doc_id = dl.doc_id
  CROSS JOIN {p}stats s
  GROUP BY tf.doc_id
)"""


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    operator: str = "or",
    minimum_should_match: int = 1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_list_expr: str | None = None,
) -> str:
    terms = _dedup(terms)
    msm = len(terms) if operator == "and" else max(minimum_should_match, 1)
    return f"""
WITH {bm25_ctes(terms, table=table, id_col=id_col, text_col=text_col,
                tok_list_expr=tok_list_expr)}
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE matched >= {msm}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def synonym_topk_sql(
    groups: list[list[str]],
    k: int = 10,
    minimum_should_match: int = 1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """SQL twin of executor.synonym_match_topk (Lucene SynonymQuery):
    per group, df = MAX of members' doc freqs, tf = SUM of members' tfs;
    groups sum like bool-OR clauses."""
    group_ctes = []
    score_selects = []
    for i, g in enumerate(groups):
        members = _sql_str_list(_dedup(g))
        dfs = ", ".join(
            f"(SELECT count(DISTINCT doc_id) FROM tok WHERE term = '"
            + t.replace("'", "''") + "')"
            for t in _dedup(g)
        )
        group_ctes.append(f"""
g{i} AS (
  SELECT doc_id, count(*) * 1.0 AS tf
  FROM tok WHERE term IN {members} GROUP BY doc_id
),
g{i}df AS (SELECT greatest({dfs}) * 1.0 AS df)""")
        score_selects.append(f"""
  SELECT g.doc_id,
         ({K1} + 1.0)
           * ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * g.tf / (g.tf + {K1} * (1.0 - {B} + {B} * dl.dl / s.avgdl)) AS score
  FROM g{i} g JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN g{i}df d CROSS JOIN stats s""")
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9_]+')) AS term
  FROM {table}
),
stats AS (
  SELECT (SELECT count(*) FROM tok) * 1.0
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT count(*) FROM {table}) * 1.0 AS n
),
dl AS (SELECT doc_id, count(*) * 1.0 AS dl FROM tok GROUP BY doc_id),
{','.join(group_ctes)},
allscores AS ({' UNION ALL '.join(score_selects)})
SELECT doc_id, round(sum(score), 4) AS score
FROM allscores
GROUP BY doc_id
HAVING count(*) >= {max(minimum_should_match, 1)}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def phrase_topk_sql(
    terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """match_phrase twin: tf = exact-adjacency phrase occurrences,
    idf = sum of per-term idfs (Lucene PhraseWeight semantics)."""
    m = len(terms)
    adj = " AND ".join(
        f"ts[i + {j}] = '" + t.replace("'", "''") + "'" for j, t in enumerate(terms)
    )
    # per-term dfs via scalar subqueries (no lateral join needed)
    df_cols = []
    for i, t in enumerate(dict.fromkeys(terms)):
        tq = t.replace("'", "''")
        df_cols.append(
            f"(SELECT count(*) FROM tok WHERE list_contains(ts, '{tq}')) * 1.0 AS df{i}"
        )
    idf_sum = " + ".join(
        f"ln(1.0 + (stats.n - df.df{i} + 0.5) / (df.df{i} + 0.5))"
        for i in range(len(dict.fromkeys(terms)))
    )
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '[a-z0-9_]+') AS ts
  FROM {table}
),
stats AS (
  SELECT (SELECT sum(len(ts)) FROM tok) * 1.0
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT count(*) FROM {table}) * 1.0 AS n
),
df AS (SELECT {', '.join(df_cols)}),
ph AS (
  SELECT doc_id, len(ts) * 1.0 AS dl,
         len(list_filter(generate_series(1, len(ts) - {m - 1}),
                         i -> {adj})) * 1.0 AS tf
  FROM tok
),
scored AS (
  SELECT doc_id,
         ({K1} + 1.0) * ({idf_sum})
           * ph.tf / (ph.tf + {K1} * (1.0 - {B} + {B} * ph.dl / stats.avgdl)) AS score
  FROM ph, stats, df
  WHERE ph.tf > 0
)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def synonym_expanded_tok_select(
    rules: list[str],
    expand: bool = True,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """tok-CTE body reproducing the engine's index-time synonym filter
    for SINGLE-token left-hand sides: each token LEFT JOINs the rule
    mapping (built by the same ``parse_synonym_rules``), matched tokens
    fan out to every output AT THE SAME POSITION, unmatched tokens pass
    through. Feed to ``bm25_ctes(tok_select=..., dl_expr=
    'count(DISTINCT pos)')``."""
    from elasticsearch_spark.analysis.filters import parse_synonym_rules

    mapping = parse_synonym_rules(rules, expand=expand)
    pairs = []
    for lhs, outs in sorted(mapping.items()):
        if len(lhs) != 1:
            raise ValueError("SQL twin supports single-token LHS only")
        for o in outs:
            pairs.append(f"('{lhs[0]}', '{o}')")
    values = ", ".join(pairs)
    return f"""
  SELECT t.doc_id, coalesce(m.out_term, t.tok) AS term, t.pos
  FROM (
    SELECT {id_col} AS doc_id, unnest(ts) AS tok,
           unnest(range(1, len(ts) + 1)) AS pos
    FROM (SELECT {id_col},
                 regexp_extract_all(lower({text_col}), '[a-z0-9_]+') AS ts
          FROM {table})
  ) t LEFT JOIN (VALUES {values}) AS m(in_term, out_term)
    ON m.in_term = t.tok"""


def light_language_list_sql(
    stopwords: frozenset, rules: list[tuple[str, str]],
    text_col: str = "text",
    token_re: str = "[a-z0-9_]+",
) -> str:
    """Token-list SQL for any light language analyzer registered via
    _register_light_language: tokens -> stopword removal -> the
    language's suffix cascade (cascade_sql, global-replace). The
    default ASCII token regex is exact for the ASCII contract corpus
    (pass e.g. a Devanagari-inclusive class for the hindi twin);
    accented-token parity is covered by the word-list twin tests."""
    from elasticsearch_spark.analysis.stem import cascade_sql

    stops = _sql_str_list(sorted(stopwords))
    return (
        f"list_transform(list_filter(regexp_extract_all(lower({text_col}),"
        f" '{token_re}'), t -> t NOT IN {stops}),"
        f" t -> {cascade_sql(rules, 't')})"
    )


def common_grams_tok_select(
    common_words: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """tok-CTE body reproducing the common_grams token filter: base
    tokens plus, for every adjacent pair touching a common word, the
    joined bigram at the first word's position. Pair with
    ``dl_expr='count(DISTINCT pos)'`` (grams are posInc-0 overlaps)."""
    common = _sql_str_list(sorted(set(common_words)))
    base = f"""
    SELECT {id_col} AS doc_id, unnest(ts) AS tok,
           unnest(range(1, len(ts) + 1)) AS pos
    FROM (SELECT {id_col},
                 regexp_extract_all(lower({text_col}), '[a-z0-9_]+') AS ts
          FROM {table})"""
    return f"""
  SELECT doc_id, tok AS term, pos FROM ({base})
  UNION ALL
  SELECT a.doc_id, a.tok || '_' || b.tok AS term, a.pos
  FROM ({base}) a JOIN ({base}) b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.tok IN {common} OR b.tok IN {common}"""
