"""Text analysis operators for training-data pipelines.

All expressions are pure Spark SQL (JVM, codegen) with exact DuckDB SQL
twins, so every operator is oracle-checkable:
  - token_count: whitespace + regex word tokens
  - language id: stopword-hit-ratio heuristic over fixed per-language
    stopword lists (deterministic, SQL-expressible)
  - quality score: length / punctuation / stopword-ratio / mean word
    length formula
  - fingerprint: the reference's fingerprint analyzer semantics
    (sorted unique lowercased tokens joined by single space, then
    hashed) — analysis-common CommonAnalysisPlugin.java fingerprint
    registration; ingest fingerprint processor analogue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from elasticsearch_spark.spread import spread_input

WORD_RE = "[a-z0-9_]+"

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "for", "with", "that", "this"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "pour", "dans", "que"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "es": ["el", "la", "los", "de", "y", "es", "para", "con", "que", "una"],
}


def tokens(text_col: str) -> Column:
    return F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    # spread_input on every per-row regex operator here: the scan of a
    # 1-row-group file would otherwise run the whole regex pass on one
    # core (guide §2.5 input skew; no-op on well-split inputs)
    return spread_input(df).withColumn(out, F.size(tokens(text_col)))


def stopword_ratio(text_col: str, lang: str) -> Column:
    toks = tokens(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def language_id(
    df: DataFrame, text_col: str = "text", out: str = "lang_pred"
) -> DataFrame:
    """Deterministic stopword-ratio language guess across the fixed
    lists; 'unk' if no stopword hits at all. Ties break by language
    code order (en < fr < de < es evaluation order)."""
    ratios = {lang: stopword_ratio(text_col, lang) for lang in STOPWORDS}
    best = F.greatest(*ratios.values())
    expr = F.lit("unk")
    # build reversed so earlier langs win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((ratios[lang] > 0) & (ratios[lang] == best), F.lit(lang)).otherwise(expr)
    return spread_input(df).withColumn(out, expr)


def quality_score(
    df: DataFrame, text_col: str = "text", out: str = "quality"
) -> DataFrame:
    """Deterministic quality heuristic in [0,1]:
    0.25*len_score + 0.25*word_len_score + 0.3*alpha_ratio + 0.2*stop_en.
    len_score saturates at 200 tokens; word_len_score penalizes mean
    token length outside [3, 10]."""
    toks = tokens(text_col)
    n = F.size(toks)
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    total_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_wl = total_chars / F.greatest(n, F.lit(1))
    word_len_score = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.3))
    alpha_ratio = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")) / \
        F.greatest(F.length(text_col), F.lit(1))
    stop_en = stopword_ratio(text_col, "en")
    q = (
        F.lit(0.25) * len_score
        + F.lit(0.25) * word_len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_en * 5, F.lit(1.0))
    )
    return spread_input(df).withColumn(out, F.round(q, 6))


def fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """ES fingerprint analyzer: sorted unique lowercase tokens joined by
    one space; hashed (md5) for compact comparison."""
    fp = F.array_join(F.array_sort(F.array_distinct(tokens(text_col))), " ")
    return spread_input(df).withColumn(out, F.md5(fp))


# ---- SQL twins (DuckDB) -------------------------------------------------

def token_count_sql(table: str = "documents", text_col: str = "text") -> str:
    return (
        f"SELECT doc_id, len(regexp_extract_all(lower({text_col}), '{WORD_RE}')) "
        f"AS n_tokens FROM {table}"
    )


def fingerprint_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           regexp_extract_all(lower({text_col}), '{WORD_RE}'))), ' ')) AS fingerprint
FROM {table}
"""


# PII scrubbing for training-data pipelines: redact spans matching
# well-known identifier shapes. Pure regexp_replace chain — JVM-side,
# whole-stage codegen, one pass per pattern; the same RE2-compatible
# patterns run verbatim in the DuckDB twin (global replace).
PII_PATTERNS: list[tuple[str, str]] = [
    # email before phone/number rules (local parts can contain digits)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 13-19 digit runs with optional separators (card-shaped)
    (r"\b\d(?:[ -]?\d){12,18}\b", "<CARD>"),
    # international/US phone shapes
    (r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b",
     "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", out: str = "text_scrubbed"
) -> DataFrame:
    col = F.col(text_col)
    for pat, rep in PII_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return spread_input(df).withColumn(out, col)


def pii_scrub_sql(table: str = "documents", text_col: str = "text") -> str:
    expr = text_col
    for pat, rep in PII_PATTERNS:
        # DuckDB standard single-quote literals do NOT process
        # backslash escapes, so the RE2 pattern goes in verbatim
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS text_scrubbed FROM {table}"


def version_sort_key(col) -> Column:
    """Semver-aware sort key for `version`-mapped fields (reference:
    x-pack/plugin/mapper-version — VersionStringFieldMapper encodes
    versions so that "1.10.0" sorts after "1.2.0" and any pre-release
    sorts before its release). The key is one codegen expression:

      release part: each dot segment zero-padded to 10 digits
                    (non-numeric segments sort after numeric ones,
                    matching the semver rule)
      + '-' boundary marker: a version WITH a pre-release suffix gets
        the suffix appended after '0', a release gets '1' — so
        1.0.0-alpha < 1.0.0 < 1.0.1 under plain string ordering.

    Sort/compare on the returned key; keep the original string for
    display.
    Pre-release suffixes compare as whole strings (the reference
    additionally splits them into dot identifiers; both engines here
    share the simpler rule, stated for parity).
    """
    c = F.col(col) if isinstance(col, str) else col
    release = F.get(F.split(c, "-", 2), 0)
    pre = F.get(F.split(c, "-", 2), 1)
    seg = F.transform(
        F.split(release, r"\."),
        lambda s: F.when(
            s.rlike(r"^[0-9]+$"), F.lpad(s, 10, "0")
        ).otherwise(F.concat(F.lit("~"), s)),  # '~' > '9': after numerics
    )
    key = F.array_join(seg, ".")
    return F.concat(
        key,
        F.when(pre.isNull(), F.lit(".1")).otherwise(
            F.concat(F.lit(".0-"), pre)),
    )


def version_sort_key_sql(version_expr: str) -> str:
    """DuckDB twin of version_sort_key (same segment padding, same
    pre-release boundary markers)."""
    release = f"split_part({version_expr}, '-', 1)"
    pre = f"nullif(split_part({version_expr}, '-', 2), '')"
    seg = (
        f"list_transform(string_split({release}, '.'), "
        "s -> CASE WHEN regexp_matches(s, '^[0-9]+$') "
        "THEN lpad(s, 10, '0') ELSE '~' || s END)"
    )
    return (
        f"array_to_string({seg}, '.') || "
        f"CASE WHEN {pre} IS NULL THEN '.1' ELSE '.0-' || {pre} END"
    )


# ---- phonetic (analysis-phonetic plugin) --------------------------------

_SOUNDEX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_SOUNDEX_TO = "111122222222334556000000"


def soundex_expr(col) -> Column:
    """American Soundex as ONE codegen expression chain (reference:
    plugins/analysis-phonetic — PhoneticTokenFilterFactory with the
    commons-codec Soundex encoder). Rules: keep first letter; H/W do
    not separate codes (stripped before coding); vowels separate but
    emit nothing; adjacent equal codes collapse; 3 digits, 0-padded.
    translate() does the letter->digit map and seven digit-wise
    regexp_replace passes do the adjacent-dedup (RE2-safe: no
    backreferences)."""
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    first = F.substring(up, 1, 1)
    tail = F.regexp_replace(F.substring(up, 2, 1 << 30), "[HW]", "")
    codes = F.translate(F.concat(first, tail), _SOUNDEX_FROM, _SOUNDEX_TO)
    for d in "0123456":
        codes = F.regexp_replace(codes, d + "+", d)
    digits = F.regexp_replace(F.substring(codes, 2, 1 << 30), "0", "")
    out = F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    return F.when(up == "", F.lit("")).otherwise(out)


def soundex_sql(expr: str) -> str:
    """DuckDB twin of soundex_expr — identical pass structure."""
    up = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    first = f"{up}[1:1]"
    tail = f"regexp_replace({up}[2:], '[HW]', '', 'g')"
    codes = f"translate({first} || {tail}, '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    for d in "0123456":
        codes = f"regexp_replace({codes}, '{d}+', '{d}', 'g')"
    digits = f"regexp_replace({codes}[2:], '0', '', 'g')"
    return (f"CASE WHEN {up} = '' THEN '' "
            f"ELSE {first} || rpad({digits}[1:3], 3, '0') END")


def soundex(token: str) -> str:
    """Scalar twin for the _analyze token-filter path."""
    up = "".join(ch for ch in token.upper() if ch.isalpha() and ch.isascii())
    if not up:
        return ""
    tail = up[1:].replace("H", "").replace("W", "")
    table = str.maketrans(_SOUNDEX_FROM, _SOUNDEX_TO)
    codes = (up[0] + tail).translate(table)
    dedup = []
    for ch in codes:
        if not dedup or dedup[-1] != ch:
            dedup.append(ch)
    digits = "".join(ch for ch in dedup[1:] if ch != "0")
    return up[0] + (digits[:3]).ljust(3, "0")


def repetition_signals(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Appendix A quality heuristics —
    published rules widely reused in C4/RefinedWeb-style pipelines):

      dup_line_frac      fraction of lines that are duplicates
                         (1 - distinct/total, blank lines dropped)
      dup_line_char_frac fraction of characters sitting in duplicated
                         lines (repeated occurrences beyond the first)
      top_bigram_share   characters in the most frequent word 2-gram /
                         total token characters
      dup_word_frac      1 - distinct/total over word tokens

    All pure Catalyst (split + higher-order array folds), one
    projection, no shuffle — the filter thresholds (e.g. Gopher drops
    docs with dup_line_frac > 0.3) stay the caller's policy."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    n_lines = F.size(lines)
    d_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - d_lines) / n_lines).otherwise(F.lit(0.0))
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda a, s: a + F.length(s))
    distinct_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda a, s: a + F.length(s))
    dup_line_char_frac = F.when(
        total_line_chars > 0,
        (total_line_chars - distinct_line_chars) / total_line_chars,
    ).otherwise(F.lit(0.0))

    toks = tokens(text_col)
    n_tok = F.size(toks)
    dup_word_frac = F.when(
        n_tok > 0,
        (n_tok - F.size(F.array_distinct(toks))) / n_tok,
    ).otherwise(F.lit(0.0))
    # most frequent word bigram's character share: build the bigram
    # list with zip_with over the shifted array, then fold a max of
    # (count * bigram-char-length) over the distinct bigrams
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # linear-time max-run fold over the SORTED bigram array (a
    # distinct×filter scan would be quadratic per doc): track
    # (prev, run-length, best count*(chars-minus-space))
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def brun(a, g):
        run = F.when(g == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.greatest(a["best"],
                       (run * (F.length(g) - 1)).cast("int")).alias("best"),
        )

    top_bigram_chars = F.aggregate(
        F.array_sort(bigrams), acc0, brun, lambda a: a["best"])
    tok_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    top_bigram_share = F.when(
        tok_chars > 0, top_bigram_chars / tok_chars).otherwise(F.lit(0.0))
    return (
        spread_input(df)
        .withColumn("dup_line_frac", F.round(dup_line_frac, 6))
        .withColumn("dup_line_char_frac", F.round(dup_line_char_frac, 6))
        .withColumn("dup_word_frac", F.round(dup_word_frac, 6))
        .withColumn("top_bigram_share", F.round(top_bigram_share, 6))
    )


# ---- n-gram LM perplexity-proxy quality scoring ------------------------
#
# CCNet-style corpus filtering: train a bigram language model on a
# reference corpus, score every candidate document by its per-token
# negative log-likelihood, drop the worst tail. (The public CCNet
# pipeline uses KenLM 5-grams; the Spark-native re-expression keeps the
# same decision shape with an add-alpha bigram model whose training and
# scoring are both single-shuffle declarative aggregations.)

def _bigrams(text_col: str) -> Column:
    """Adjacent-token bigram array ("w1 w2" strings), one projection."""
    t = tokens(text_col)
    return F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def ngram_lm_train(
    corpus: DataFrame, text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Train the bigram LM: returns (bigram counts, unigram counts,
    vocabulary size). Two hash aggregations (map-side partials — the
    shuffle carries one row per distinct n-gram per partition, never
    the corpus): the right shape when the reference corpus is TBs."""
    corpus = spread_input(corpus)
    uni = (
        corpus.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("c1"))
    )
    bi = (
        corpus.select(F.explode(_bigrams(text_col)).alias("b"))
        .groupBy("b").agg(F.count("*").alias("c2"))
    )
    vocab = uni.count()
    return bi, uni, vocab


def ngram_lm_score(
    docs: DataFrame,
    bi: DataFrame,
    uni: DataFrame,
    vocab: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    out: str = "nll",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the bigram LM
    with add-``alpha`` smoothing:

        -mean over bigrams (w1 w2) of
            log( (c(w1 w2) + alpha) / (c(w1) + alpha * V) )

    Low = fluent (in-domain), high = boilerplate/garble — threshold or
    quantile-filter downstream. Physical shape: explode doc bigrams,
    ONE shuffle join against the bigram table (Spark broadcasts it when
    small; at 100 TB both sides hash-partition on the n-gram key), one
    re-aggregation keyed by doc — ids and counts only, the document
    text never reshuffles. Docs with no bigram (0-1 tokens) score NULL.
    """
    ex = spread_input(docs).select(
        F.col(id_col), F.explode(_bigrams(text_col)).alias("b"))
    ex = ex.withColumn("w1", F.split(F.col("b"), " ").getItem(0))
    joined = (
        ex.join(bi, "b", "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
    )
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(float(alpha) * vocab))
    )
    return joined.groupBy(id_col).agg((-F.avg(logp)).alias(out))


def ngram_lm_score_sql(
    table: str = "documents",
    ref_filter: str = "TRUE",
    doc_filter: str = "TRUE",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    prefix: str = "",
) -> str:
    """DuckDB twin: the same tokenizer regex, counts, and smoothing
    (train on ``table WHERE ref_filter``, score ``table WHERE
    doc_filter``). Returns (doc_id, nll) in ``{prefix}scored_lm``;
    ``prefix`` namespaces the CTEs so two models (e.g. the DSIR
    target/base pair) compose in one WITH clause."""
    toks = f"regexp_extract_all(lower({text_col}), '{WORD_RE}')"
    p = prefix
    return f"""
{p}tk AS (SELECT {id_col}, {toks} AS ts FROM {table}),
{p}bg0 AS (
  SELECT {id_col},
         unnest(list_transform(generate_series(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1])) AS b
  FROM {p}tk),
{p}bg AS (SELECT {id_col}, b, split_part(b, ' ', 1) AS w1 FROM {p}bg0),
{p}uni AS (
  SELECT w, count(*)::BIGINT AS c1 FROM (
    SELECT unnest(ts) AS w FROM {p}tk
    WHERE {id_col} IN (SELECT {id_col} FROM {table} WHERE {ref_filter}))
  GROUP BY w),
{p}v AS (SELECT count(*)::BIGINT AS vocab FROM {p}uni),
{p}bi AS (
  SELECT b, count(*)::BIGINT AS c2 FROM {p}bg
  WHERE {id_col} IN (SELECT {id_col} FROM {table} WHERE {ref_filter})
  GROUP BY b),
{p}scored_lm AS (
  SELECT g.{id_col},
         -avg(ln((coalesce(bi.c2, 0) + {float(alpha)!r})
                 / (coalesce(uni.c1, 0) + {float(alpha)!r} * v.vocab)))
           AS nll
  FROM {p}bg g
  LEFT JOIN {p}bi bi ON bi.b = g.b
  LEFT JOIN {p}uni uni ON uni.w = g.w1, {p}v v
  WHERE g.{id_col} IN (SELECT {id_col} FROM {table} WHERE {doc_filter})
  GROUP BY g.{id_col})
"""


# ---------------------------------------------------------------------
# URL canonicalization (web-corpus dedup key)
# ---------------------------------------------------------------------
# The standard CommonCrawl-style pipeline step: two pages are the same
# document when their canonical URLs match, long before any content
# hash runs. One regexp_replace chain — pure codegen, no UDF:
#   1. lowercase scheme+host (path stays case-sensitive)
#   2. drop the #fragment
#   3. drop tracking params (utm_*, gclid, fbclid, ref)
#   4. drop default ports :80/:443, a trailing lone '?', and a
#      trailing '/' on non-root paths

_URL_TRACKING = r"(?:utm_[a-z]+|gclid|fbclid|ref)=[^&#]*"


def canonicalize_url(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host (group 1), keep the rest
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/?#]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z]+://[^/?#]*", ""),
    )
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, _URL_TRACKING + r"&", "")
    c = F.regexp_replace(c, r"[?&]" + _URL_TRACKING + r"$", "")
    c = F.regexp_replace(
        c, r"^(https?://[^/?#]*):(?:80|443)([/?].*)?$", r"$1$2")
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, r"(^[a-z]+://[^/?#]+/.+?)/$", r"$1")
    return c


def canonicalize_url_sql(expr: str) -> str:
    out = (f"lower(regexp_extract({expr}, '^([a-zA-Z]+://[^/?#]*)', 1)) || "
           f"regexp_replace({expr}, '^[a-zA-Z]+://[^/?#]*', '')")
    out = f"regexp_replace({out}, '#.*$', '')"
    out = f"regexp_replace({out}, '{_URL_TRACKING}&', '')"
    out = f"regexp_replace({out}, '[?&]{_URL_TRACKING}$', '')"
    # RE2 (DuckDB) has no lookahead: capture the tail instead
    out = (f"regexp_replace({out}, "
           f"'^(https?://[^/?#]*):(?:80|443)([/?].*)?$', '\\1\\2')")
    out = f"regexp_replace({out}, '\\?$', '')"
    out = f"regexp_replace({out}, '(^[a-z]+://[^/?#]+/.+?)/$', '\\1')"
    return out


def dedup_by_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """Keep the lowest-id doc per canonical URL: one hash-partitioned
    min aggregation — at 100 TB the map-side partial reduces each
    split to its distinct canonical URLs before the exchange."""
    return (spread_input(df).withColumn("_curl", canonicalize_url(url_col))
            .groupBy("_curl")
            .agg(F.min(id_col).alias(id_col))
            .withColumnRenamed("_curl", "canonical_url"))


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) with the bigram LM as the feature model: weight
    each raw-corpus doc by how much more likely its text is under the
    TARGET domain's LM than under the raw corpus's own LM,

        log_weight = nll_base - nll_target

    (positive = target-like). Downstream sampling keeps docs by
    weight-proportional probability; a deterministic variant thresholds
    at a quantile. Physical shape: two LM trainings (hash aggs over
    n-grams — the shuffles carry distinct n-grams, never documents) and
    ONE shared doc-bigram explode scored against both count tables;
    document text never reshuffles.
    """
    ex = docs.select(F.col(id_col), F.col(text_col))
    bi_t, uni_t, v_t = ngram_lm_train(target, text_col)
    bi_b, uni_b, v_b = ngram_lm_train(docs, text_col)
    t = ngram_lm_score(ex, bi_t, uni_t, v_t, text_col, id_col,
                       alpha, out="nll_target")
    b = ngram_lm_score(ex, bi_b, uni_b, v_b, text_col, id_col,
                       alpha, out="nll_base")
    return (t.join(b, id_col)
            .select(id_col, "nll_target", "nll_base",
                    (F.col("nll_base") - F.col("nll_target"))
                    .alias("log_weight")))


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 10,
    min_chars: int = 10,
    out: str = "text_clean",
) -> DataFrame:
    """Corpus-level boilerplate-line removal (the Dolma / CCNet
    paragraph-dedup step): a LINE occurring in more than ``max_df``
    distinct documents is boilerplate (headers, footers, nav, license
    banners) and is dropped from every document; short lines
    (< ``min_chars``) are exempt so code/prose structure survives.

    Plan: explode lines WITH their position (posexplode keeps
    reassembly order without a window), one distinct (line -> df) hash
    agg (map-side partial carries distinct lines per split, never the
    corpus), anti-join the boilerplate set back, re-assemble with
    array_join over sort_array of (pos, line) structs. Shuffles carry
    lines and ids only — never whole documents.
    """
    lines = spread_input(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    line_df = (lines.where(F.length("line") >= min_chars)
               .groupBy("line")
               .agg(F.countDistinct(id_col).alias("line_df")))
    boiler = line_df.where(F.col("line_df") > max_df).select("line")
    kept = lines.join(
        boiler.withColumn("_b", F.lit(1)), "line", "left"
    ).where(F.col("_b").isNull()).drop("_b")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct(F.col("pos"), F.col("line")))),
                       lambda s: s["line"]),
                   "\n").alias(out)))
    # docs whose every line was boilerplate come back as empty string
    return (df.join(rebuilt, id_col, "left")
            .withColumn(out, F.coalesce(F.col(out), F.lit(""))))
