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


def bm25_ctes(
    terms: list[str] | None,
    prefix: str = "",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    terms_cte: str | None = None,
) -> str:
    """CTE block computing ``{prefix}scored(doc_id, score, matched)``.

    ``terms`` is an explicit term list (IN filter); alternatively pass
    ``terms_cte``, the name of a CTE with a ``term`` column (used by the
    more_like_this oracle). All intermediate CTE names carry ``prefix``
    so several blocks can coexist in one WITH clause.
    """
    p = prefix
    if terms_cte is not None:
        tf_filter = f"JOIN {terms_cte} q ON q.term = x.term"
        where = ""
    else:
        tf_filter = ""
        where = f"WHERE x.term IN {_sql_str_list(_dedup(terms))}"
    return f"""
{p}tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '[a-z0-9_]+')) AS term
  FROM {table}
),
{p}stats AS (
  SELECT (SELECT count(*) FROM {p}tok) * 1.0
           / (SELECT count(*) FROM {table}) AS avgdl,
         (SELECT count(*) FROM {table}) * 1.0 AS n
),
{p}dl AS (SELECT doc_id, count(*) * 1.0 AS dl FROM {p}tok GROUP BY doc_id),
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
) -> str:
    terms = _dedup(terms)
    msm = len(terms) if operator == "and" else max(minimum_should_match, 1)
    return f"""
WITH {bm25_ctes(terms, table=table, id_col=id_col, text_col=text_col)}
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE matched >= {msm}
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
