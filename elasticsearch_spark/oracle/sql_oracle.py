"""ANSI-SQL (DuckDB-runnable) twins of engine queries.

The BM25 oracle reproduces the engine's exact-dl scoring mode
(quantize_norms=False) with the ``ascii_word`` analyzer, whose SQL twin
is ``regexp_extract_all(lower(text), '[a-z0-9_]+')``. Scores are
float64 on both sides and rounded to 4 decimals before comparison.
"""

from __future__ import annotations

K1 = 1.2
B = 0.75


def _sql_str_list(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({quoted})"


def bm25_topk_sql(
    terms: list[str],
    k: int = 10,
    operator: str = "or",
    minimum_should_match: int = 1,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    seen: set[str] = set()
    terms = [t for t in terms if not (t in seen or seen.add(t))]
    msm = len(terms) if operator == "and" else max(minimum_should_match, 1)
    tlist = _sql_str_list(terms)
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
tf AS (
  SELECT doc_id, term, count(*) * 1.0 AS tf
  FROM tok WHERE term IN {tlist}
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) * 1.0 AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(({K1} + 1.0)
             * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf
             / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl / stats.avgdl))
         ) AS score,
         count(*) AS matched
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scored
WHERE matched >= {msm}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
