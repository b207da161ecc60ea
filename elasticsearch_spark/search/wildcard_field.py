"""wildcard field type: ngram-accelerated wildcard/regexp matching.

Reference: x-pack/plugin/wildcard/src/main/java/org/elasticsearch/
xpack/wildcard/mapper/WildcardFieldMapper.java — the field indexes
anchored 3-grams of the value alongside a doc-values copy; a wildcard
query is rewritten into an "approximation" (a conjunction of the
3-grams every match must contain) that prunes the candidate set, and
the surviving candidates are verified against the stored value with
the real automaton.

Spark-first translation:
  - index: one exploded (gram, doc_id) postings table, grams drawn
    from ANCHOR + value + ANCHOR so prefix/suffix constraints become
    ordinary grams. Persisted sorted by gram -> parquet min/max stats
    prune row groups, and the query-time `gram IN (...)` filter is
    pushed to the scan (PushedFilters), so a wildcard query reads the
    postings of its required grams only — never the whole column.
  - query: required_grams() extracts the literal runs of the pattern
    (split on * and ?), anchors the ends, and emits their 3-grams.
    Candidates = doc_ids containing ALL required grams (single
    partial-agg groupBy, count == n_grams). Verification = rlike on
    the candidates only (a broadcast-sized set at any realistic
    selectivity), joined back to the docs table.
  - a pattern with no literal run long enough to produce a gram
    (e.g. "*a*") degrades to the full verify scan, exactly like the
    reference's verify-only approximation (MatchAllButRequireVerify).

The candidate set is a strict superset of the true matches (every
required gram is a substring of any accepted value), so accelerated
results == full-scan rlike results — which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Same role as WildcardFieldMapper.TOKEN_START_OR_END_CHAR (U+0000):
# a char that cannot occur in values, so edge grams encode anchoring.
ANCHOR = "\x01"
GRAM = 3


def _grams(s: str) -> list[str]:
    return [s[i:i + GRAM] for i in range(len(s) - GRAM + 1)]


def wildcard_postings(
    docs: DataFrame, col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Explode a string column into anchored 3-gram postings
    (gram, doc_id). Values shorter than one gram still emit their
    whole anchored form, so exact matches on short values keep an
    index path."""
    anchored = F.concat(F.lit(ANCHOR), F.col(col), F.lit(ANCHOR))
    n = F.length(anchored)
    idx = F.sequence(F.lit(0), F.greatest(n - GRAM, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.substring(anchored, i + 1, GRAM)))
    return (docs
            .where(F.col(col).isNotNull())
            .select(F.explode(grams).alias("gram"), F.col(id_col)))


def build_wildcard_index(
    docs: DataFrame, col: str, out_dir: str,
    id_col: str = "doc_id", num_partitions: int = 8,
) -> DataFrame:
    """Persist the postings sorted by gram: one shuffle on gram hash,
    sortWithinPartitions so parquet row-group min/max stats make the
    query-time IN-filter prune at the scan."""
    (wildcard_postings(docs, col, id_col)
     .repartition(num_partitions, "gram")
     .sortWithinPartitions("gram", id_col)
     .write.mode("overwrite").parquet(out_dir))
    return docs.sparkSession.read.parquet(out_dir)


def required_grams(pattern: str) -> list[str]:
    """The 3-grams every value matching `pattern` must contain.
    Mirrors WildcardFieldMapper.getNgramTokens over the pattern's
    literal runs; * and ? break runs, leading/trailing literals are
    anchored."""
    runs: list[str] = []
    cur = []
    for ch in pattern:
        if ch in "*?":
            if cur:
                runs.append("".join(cur))
                cur = []
            runs.append(ch)
        else:
            cur.append(ch)
    if cur:
        runs.append("".join(cur))
    grams: list[str] = []
    for i, run in enumerate(runs):
        if run in ("*", "?"):
            continue
        frag = run
        if i == 0:
            frag = ANCHOR + frag
        if i == len(runs) - 1:
            frag = frag + ANCHOR
        grams.extend(_grams(frag))
    # dedupe, keep deterministic order
    return sorted(set(grams))


def wildcard_regex(pattern: str) -> str:
    """ES wildcard (* any run, ? one char) -> anchored Java/RE2 regex."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append("" if ch.isalnum() else "\\")
            out.append(ch)
    return "^" + "".join(out) + "$"


def wildcard_field_search(
    postings: DataFrame, docs: DataFrame, col: str, pattern: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact wildcard match over the field via the ngram approximation.
    Returns the matching rows of `docs`."""
    verified = F.col(col).rlike(wildcard_regex(pattern))
    grams = required_grams(pattern)
    if not grams:
        # verify-only approximation: no literal run long enough
        return docs.where(verified)
    cand = (postings
            .where(F.col("gram").isin(grams))
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("_ng"))
            .where(F.col("_ng") == len(grams))
            .select(id_col))
    return (docs
            .join(F.broadcast(cand), id_col, "left_semi")
            .where(verified))
