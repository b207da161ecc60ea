"""Analyzers: text -> (term, position) streams, pandas-vectorized.

Re-creates the reference's analysis chain (not a port):
  - ``standard``: UAX#29-style word tokenizer + lowercase, max token
    length 255 (reference: index/analysis/StandardAnalyzerProvider.java:25-28,
    analysis registries in indices/analysis/AnalysisModule.java:69-85).
    Approximation: ``\\w+`` runs (unicode letters/digits/underscore —
    UAX#29 ExtendNumLet joins words across '_', which \\w matches).
  - ``code``: standard tokenization on the original-case text, then a
    word_delimiter_graph-style split (camelCase, snake_case,
    letter/digit boundaries) emitting the original token plus its
    sub-tokens at the SAME position (overlap tokens, discounted from
    field length like Lucene's discountOverlaps — reference:
    analysis-common CommonAnalysisPlugin.java:170,217 registration of
    word_delimiter_graph; SimilarityProviders.java:234-244
    discount_overlaps=true).
  - ``simple``: letter runs, lowercased (AnalysisModule.java:233-235).
  - ``whitespace``: split on whitespace, no lowercase.
  - ``keyword``: whole string as one token.
  - ``stop``: standard + english stopword removal (positions preserved,
    i.e. position increments still count removed tokens — Lucene
    StopFilter keeps position increments).
  - ``ascii_word``: lowercase + ``[a-z0-9_]+`` runs. This analyzer has
    an exact ANSI-SQL twin (regexp_extract_all(lower(x),'[a-z0-9_]+'))
    used by the DuckDB correctness oracle.

Positions are 0-based and only advance for non-overlap tokens.
Field length (dl) = number of position-advancing tokens
(discount_overlaps=true semantics).
"""

from __future__ import annotations

import re
from typing import Callable

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255  # standard analyzer default (reference :25-28)

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_ASCII_WORD_RE = re.compile(r"[a-z0-9_]+")
_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
_WS_RE = re.compile(r"\S+")
# word_delimiter_graph-style sub-token split: camelCase humps, ALLCAPS
# runs, digit runs; '_' and other non-alnum are boundaries.
_CAMEL_RE = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+")

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (the `_english_` list the
# `stop` analyzer defaults to).
ENGLISH_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)


def _chunk255(tok: str) -> list[str]:
    if len(tok) <= MAX_TOKEN_LENGTH:
        return [tok]
    return [tok[i : i + MAX_TOKEN_LENGTH] for i in range(0, len(tok), MAX_TOKEN_LENGTH)]


def _analyze_standard(text: str) -> tuple[list[str], list[int]]:
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for raw in _WORD_RE.findall(text.lower()):
        for tok in _chunk255(raw):
            terms.append(tok)
            positions.append(pos)
            pos += 1
    return terms, positions


def _analyze_ascii_word(text: str) -> tuple[list[str], list[int]]:
    terms = _ASCII_WORD_RE.findall(text.lower())
    return terms, list(range(len(terms)))


_DEVA_WORD_RE = re.compile(r"[\wऀ-ॿ]+", re.UNICODE)


def _analyze_deva_word(text: str) -> tuple[list[str], list[int]]:
    """Devanagari-aware word tokenizer: ``\\w`` excludes combining
    matras/viramas (category Mn/Mc), so plain standard tokenization
    shreds Hindi words at every vowel sign — this base keeps the whole
    U+0900-097F block inside a token (the UAX#29 behavior Lucene's
    StandardTokenizer gives Indic scripts)."""
    terms = _DEVA_WORD_RE.findall(text.lower())
    return terms, list(range(len(terms)))


_BENG_WORD_RE = re.compile(r"[\wঀ-৿]+", re.UNICODE)


def _analyze_beng_word(text: str) -> tuple[list[str], list[int]]:
    """Bengali-script analog of ``deva_word``: keeps the U+0980-09FF
    block (matras/virama are Mn/Mc, excluded by ``\\w``) inside one
    token, the UAX#29 treatment Lucene's StandardTokenizer gives the
    Bengali analyzer's input."""
    terms = _BENG_WORD_RE.findall(text.lower())
    return terms, list(range(len(terms)))


def _analyze_simple(text: str) -> tuple[list[str], list[int]]:
    terms = [t.lower() for t in _LETTER_RE.findall(text)]
    return terms, list(range(len(terms)))


def _analyze_whitespace(text: str) -> tuple[list[str], list[int]]:
    terms = _WS_RE.findall(text)
    return terms, list(range(len(terms)))


def _analyze_keyword(text: str) -> tuple[list[str], list[int]]:
    return [text], [0]


def _analyze_stop(text: str) -> tuple[list[str], list[int]]:
    terms, positions = _analyze_standard(text)
    keep = [(t, p) for t, p in zip(terms, positions) if t not in ENGLISH_STOPWORDS]
    if not keep:
        return [], []
    ts, ps = zip(*keep)
    return list(ts), list(ps)


# token -> emitted (lowercased original + distinct sub-token) list.
# Source-code vocabularies are Zipf-heavy, so the same identifiers recur
# millions of times at corpus scale — memoizing the per-token split is a
# large index-build win. Capped to bound worker memory.
_CODE_SPLIT_CACHE: dict[str, list[str]] = {}
_CODE_SPLIT_CACHE_MAX = 500_000


def _code_split(chunk: str) -> list[str]:
    hit = _CODE_SPLIT_CACHE.get(chunk)
    if hit is not None:
        return hit
    low = chunk.lower()
    out = [low]
    subs = _CAMEL_RE.findall(chunk)
    if len(subs) > 1:
        seen = {low}
        for s in subs:
            sl = s.lower()
            if sl not in seen:
                seen.add(sl)
                out.append(sl)
    if len(_CODE_SPLIT_CACHE) >= _CODE_SPLIT_CACHE_MAX:
        _CODE_SPLIT_CACHE.clear()
    _CODE_SPLIT_CACHE[chunk] = out
    return out


def _analyze_code(text: str) -> tuple[list[str], list[int]]:
    """standard tokens (original case) + word_delimiter_graph sub-tokens.

    Original token is lowercased and emitted at position p; sub-tokens
    (when the split is non-trivial) are emitted at the same position p
    as overlaps. Duplicate sub-token == original is not re-emitted.
    """
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for raw in _WORD_RE.findall(text):
        for chunk in _chunk255(raw):
            emitted = _code_split(chunk)
            terms.extend(emitted)
            positions.extend([pos] * len(emitted))
            pos += 1
    return terms, positions


# per-token stem caches (Zipf vocabularies: memoization is the main win)
_PORTER_CACHE: dict[str, str] = {}
_SSTEM_CACHE: dict[str, str] = {}
_STEM_CACHE_MAX = 500_000


def _porter_cached(tok: str) -> str:
    from elasticsearch_spark.analysis.stem import porter_stem

    hit = _PORTER_CACHE.get(tok)
    if hit is None:
        if len(_PORTER_CACHE) >= _STEM_CACHE_MAX:
            _PORTER_CACHE.clear()
        hit = _PORTER_CACHE[tok] = porter_stem(tok)
    return hit


def _s_stem_cached(tok: str) -> str:
    from elasticsearch_spark.analysis.stem import s_stem

    hit = _SSTEM_CACHE.get(tok)
    if hit is None:
        if len(_SSTEM_CACHE) >= _STEM_CACHE_MAX:
            _SSTEM_CACHE.clear()
        hit = _SSTEM_CACHE[tok] = s_stem(tok)
    return hit


def _analyze_english(text: str) -> tuple[list[str], list[int]]:
    """english analyzer: standard tokens -> english stop removal ->
    Porter stemming (reference: AnalysisModule language analyzers +
    CommonAnalysisPlugin.java:217 stemmer registration). Positions keep
    stop-filter gaps (Lucene StopFilter preserves increments)."""
    terms, positions = _analyze_standard(text)
    out_t: list[str] = []
    out_p: list[int] = []
    for t, p in zip(terms, positions):
        if t not in ENGLISH_STOPWORDS:
            out_t.append(_porter_cached(t))
            out_p.append(p)
    return out_t, out_p


def _analyze_english_light(text: str) -> tuple[list[str], list[int]]:
    """english_light: ascii_word tokens -> stop removal -> S-stemmer.
    Chosen so the WHOLE chain has an exact ANSI-SQL twin
    (list_filter + nested regexp_replace) for the DuckDB oracle."""
    terms = _ASCII_WORD_RE.findall(text.lower())
    out_t: list[str] = []
    out_p: list[int] = []
    for p, t in enumerate(terms):
        if t not in ENGLISH_STOPWORDS:
            out_t.append(_s_stem_cached(t))
            out_p.append(p)
    return out_t, out_p


ANALYZERS: dict[str, Callable[[str], tuple[list[str], list[int]]]] = {
    "standard": _analyze_standard,
    "code": _analyze_code,
    "simple": _analyze_simple,
    "whitespace": _analyze_whitespace,
    "keyword": _analyze_keyword,
    "stop": _analyze_stop,
    "ascii_word": _analyze_ascii_word,
    "english": _analyze_english,
    "english_light": _analyze_english_light,
    "deva_word": _analyze_deva_word,
    "beng_word": _analyze_beng_word,
}


def analyze(text: str, analyzer: str = "standard") -> list[tuple[str, int]]:
    """_analyze-API-style entry point: token + position list.

    Reference: action/admin/indices/analyze/TransportAnalyzeAction.java:110-127.
    """
    terms, positions = ANALYZERS[analyzer](text or "")
    return list(zip(terms, positions))


# Demo index-time synonym analyzer (the reference configures synonym
# filters per-index in analysis settings; registering here makes the
# name resolvable inside Spark's Python workers, which import this
# module fresh and would not see driver-side registry mutations).
DOC_SYNONYM_RULES = ["join, merge", "table => relation"]
DOC_COMMON_WORDS = ["the", "a"]


def _register_composed() -> None:
    from elasticsearch_spark.analysis.filters import (
        common_grams_filter,
        synonym_filter,
    )

    base = ANALYZERS["ascii_word"]
    syn = synonym_filter(DOC_SYNONYM_RULES)

    def _analyze_ascii_word_syn(text: str) -> tuple[list[str], list[int]]:
        return syn(*base(text))

    ANALYZERS["ascii_word_syn"] = _analyze_ascii_word_syn

    grams = common_grams_filter(DOC_COMMON_WORDS)

    def _analyze_ascii_word_grams(text: str) -> tuple[list[str], list[int]]:
        return grams(*base(text))

    ANALYZERS["ascii_word_grams"] = _analyze_ascii_word_grams


_register_composed()


# ---------------------------------------------------------------------
# Flat (batch-vectorized) analyzers: one C-level regex pass over a whole
# Arrow batch instead of a Python loop per document. Returns
# (doc_idx, terms, positions) as flat numpy arrays, doc-major with
# positions ascending within each doc — the index builder's hot path
# (the per-doc loop was the 100-TB build cost center).
# ---------------------------------------------------------------------

_FLAT_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=object),
    np.empty(0, dtype=np.int64),
)

# codes representation: (doc_idx, codes, uniques, positions) — tokens as
# int64 indices into a per-batch unique-string dictionary. All hot-path
# work (sorting, grouping, stopword masks, sub-token expansion) happens
# on ints; strings are touched once per UNIQUE token per batch.
_CODES_EMPTY = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=object),
    np.empty(0, dtype=np.int64),
)

# RE2 token-class complements matching the scalar Python regexes:
# \w (unicode) == [\p{L}\p{N}_]; \S == NOT [\s \p{Z} \x1c-\x1f \x85]
_NEG_WORD = r"[^\p{L}\p{N}_]+"
_NEG_ASCII = r"[^a-z0-9_]+"
_NEG_LETTER = r"[^\p{L}]+"
_NEG_NONSPACE = r"[\s\p{Z}\x1c-\x1f\x85]+"


def _split_codes(texts: pd.Series, neg_pattern: str, lower: bool):
    """One Arrow C++ pass: split every doc on the COMPLEMENT of the
    token class, dictionary-encode the fragments, drop empty fragments,
    and derive (doc_idx, code, within-doc position) from the list
    offsets. Equivalent to findall(token_pattern) per doc with zero
    per-match Python. Returns (doc_idx, codes, uniques, ulens, pos)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    s = texts.reset_index(drop=True).fillna("")
    arr = pa.Array.from_pandas(s.astype(str))
    if lower:
        arr = pc.utf8_lower(arr)
    split = pc.split_pattern_regex(arr, pattern=neg_pattern)
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    values = split.values
    if len(values) == 0:
        return _CODES_EMPTY + (np.empty(0, dtype=np.int64),)
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = values.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = dic.dictionary.to_numpy(zero_copy_only=False)
    ulens = np.fromiter(map(len, uniques), dtype=np.int64, count=len(uniques))
    tokens_per_doc = np.diff(offsets)
    doc_idx = np.repeat(
        np.arange(tokens_per_doc.size, dtype=np.int64), tokens_per_doc
    )
    # empty fragments appear only at doc edges (leading/trailing
    # separators); they are not tokens — drop by code, not by string
    empty_ids = np.flatnonzero(ulens == 0)
    if empty_ids.size:
        keep = codes != empty_ids[0]
        codes = codes[keep]
        doc_idx = doc_idx[keep]
    if codes.size == 0:
        return _CODES_EMPTY + (np.empty(0, dtype=np.int64),)
    cnt = np.bincount(doc_idx, minlength=tokens_per_doc.size)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    pos = np.arange(doc_idx.size, dtype=np.int64) - np.repeat(starts, cnt)
    return doc_idx, codes, uniques, ulens, pos


def _refactorize(d, t, p):
    codes, uniq = pd.factorize(t)
    return d, codes.astype(np.int64), np.asarray(uniq, dtype=object), p


def _long_token_fallback_codes(texts, codes_tuple, ulens, scalar_fn):
    """Docs containing a >MAX_TOKEN_LENGTH token (rare) are re-analyzed
    with the scalar analyzer so 255-chunking parity holds exactly."""
    d, c, u, p = codes_tuple
    bad_code = np.flatnonzero(ulens > MAX_TOKEN_LENGTH)
    if bad_code.size == 0:
        return codes_tuple
    bad_lut = np.zeros(len(u), dtype=bool)
    bad_lut[bad_code] = True
    bad_docs = np.unique(d[bad_lut[c]])
    keep = ~np.isin(d, bad_docs)
    parts_d = [d[keep]]
    parts_t = [u[c[keep]]]
    parts_p = [p[keep]]
    s = texts.reset_index(drop=True).fillna("")
    for di in bad_docs:
        tt, pp = scalar_fn(s.iloc[int(di)])
        parts_d.append(np.full(len(tt), di, dtype=np.int64))
        parts_t.append(np.array(tt, dtype=object))
        parts_p.append(np.array(pp, dtype=np.int64))
    dd = np.concatenate(parts_d)
    tt = np.concatenate(parts_t)
    pp = np.concatenate(parts_p)
    order = np.lexsort((pp, dd))  # stable: overlaps keep relative order
    return _refactorize(dd[order], tt[order], pp[order])


def _codes_standard(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_WORD, lower=True)
    if ul.size and int(ul.max()) > MAX_TOKEN_LENGTH:
        return _long_token_fallback_codes(texts, (d, c, u, p), ul, _analyze_standard)
    return d, c, u, p


def _codes_ascii_word(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_ASCII, lower=True)
    return d, c, u, p


def _codes_simple(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_LETTER, lower=True)
    return d, c, u, p


# RE2 twin of _DEVA_WORD_RE's complement (the Devanagari block spelled
# as literal range endpoints, which RE2 accepts in a class)
_NEG_DEVA = r"[^\p{L}\p{N}_ऀ-ॿ]+"


def _codes_deva_word(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_DEVA, lower=True)
    return d, c, u, p


_NEG_BENG = r"[^\p{L}\p{N}_ঀ-৿]+"


def _codes_beng_word(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_BENG, lower=True)
    return d, c, u, p


def _codes_whitespace(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_NONSPACE, lower=False)
    return d, c, u, p


def _codes_keyword(texts: pd.Series):
    import pyarrow as pa

    s = texts.reset_index(drop=True).fillna("")
    n = len(s)
    dic = pa.Array.from_pandas(s.astype(str)).dictionary_encode()
    return (
        np.arange(n, dtype=np.int64),
        dic.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        dic.dictionary.to_numpy(zero_copy_only=False),
        np.zeros(n, dtype=np.int64),
    )


def _drop_stopwords_codes(d, c, u, p):
    if not c.size:
        return d, c, u, p
    stop_lut = np.fromiter(
        (w in ENGLISH_STOPWORDS for w in u), dtype=bool, count=len(u)
    )
    keep = ~stop_lut[c]
    # positions preserved (StopFilter keeps position increments)
    return d[keep], c[keep], u, p[keep]


def _codes_stop(texts: pd.Series):
    return _drop_stopwords_codes(*_codes_standard(texts))


def _transform_uniques_codes(d, c, u, p, word_fn):
    """Apply a token->token transform once per UNIQUE token, then
    re-factorize so colliding outputs (different raws -> same stem)
    share ONE code — the builder requires one code per distinct term."""
    if not c.size:
        return d, c, u, p
    new_words = np.empty(len(u), dtype=object)
    for i, w in enumerate(u.tolist()):
        new_words[i] = word_fn(w)
    codes2, uniq2 = pd.factorize(new_words)
    return d, codes2.astype(np.int64)[c], np.asarray(uniq2, dtype=object), p


def _codes_english(texts: pd.Series):
    return _transform_uniques_codes(*_codes_stop(texts), _porter_cached)


def _codes_english_light(texts: pd.Series):
    d, c, u, ul, p = _split_codes(texts, _NEG_ASCII, lower=True)
    return _transform_uniques_codes(
        *_drop_stopwords_codes(d, c, u, p), _s_stem_cached
    )


def _codes_code(texts: pd.Series):
    """Vectorized `code` analyzer: one regex pass for the raw tokens,
    then the word_delimiter_graph split computed ONCE PER UNIQUE token
    (memoized — code vocabularies are Zipf-heavy) and expanded back to
    every occurrence with a vectorized int-gather. Docs containing a
    >255-char raw token (rare) are re-analyzed whole with the scalar
    analyzer AFTER expansion, so 255-chunking parity holds without
    double-splitting their tokens."""
    d, c, u, ul, p = _split_codes(texts, _NEG_WORD, lower=False)
    bad_docs = np.empty(0, dtype=np.int64)
    if ul.size and int(ul.max()) > MAX_TOKEN_LENGTH:
        bad_lut = np.zeros(len(u), dtype=bool)
        bad_lut[ul > MAX_TOKEN_LENGTH] = True
        bad_docs = np.unique(d[bad_lut[c]])
        keep = ~np.isin(d, bad_docs)
        d, c, p = d[keep], c[keep], p[keep]
    if not c.size and not bad_docs.size:
        return d, c, u, p
    # per-UNIQUE-raw-token split into emitted sub-token ids
    vocab: dict[str, int] = {}
    setd = vocab.setdefault
    flat_ids: list[int] = []
    exp_lens = np.empty(len(u), dtype=np.int64)
    for i, tok in enumerate(u.tolist()):
        sl = _code_split(tok)
        flat_ids.extend(setd(w, len(vocab)) for w in sl)
        exp_lens[i] = len(sl)
    exp_ids = np.array(flat_ids, dtype=np.int64)
    exp_offs = np.concatenate(([0], np.cumsum(exp_lens)))
    tok_lens = exp_lens[c]
    total = int(tok_lens.sum())
    cum0 = np.cumsum(tok_lens) - tok_lens
    gather = (
        np.repeat(exp_offs[c], tok_lens)
        + np.arange(total, dtype=np.int64)
        - np.repeat(cum0, tok_lens)
    )
    new_u = np.empty(len(vocab), dtype=object)
    for w, i in vocab.items():
        new_u[i] = w
    d2 = np.repeat(d, tok_lens)
    c2 = exp_ids[gather]
    p2 = np.repeat(p, tok_lens)
    if bad_docs.size:
        s = texts.reset_index(drop=True).fillna("")
        parts_d = [d2]
        parts_t = [new_u[c2]]
        parts_p = [p2]
        for di in bad_docs:
            tt, pp = _analyze_code(s.iloc[int(di)])
            parts_d.append(np.full(len(tt), di, dtype=np.int64))
            parts_t.append(np.array(tt, dtype=object))
            parts_p.append(np.array(pp, dtype=np.int64))
        dd = np.concatenate(parts_d)
        tt = np.concatenate(parts_t)
        pp = np.concatenate(parts_p)
        order = np.lexsort((pp, dd))  # stable: overlaps keep order
        return _refactorize(dd[order], tt[order], pp[order])
    return d2, c2, new_u, p2


FLAT_ANALYZERS: dict[str, Callable] = {
    "standard": _codes_standard,
    "ascii_word": _codes_ascii_word,
    "simple": _codes_simple,
    "whitespace": _codes_whitespace,
    "keyword": _codes_keyword,
    "stop": _codes_stop,
    "code": _codes_code,
    "english": _codes_english,
    "english_light": _codes_english_light,
    "deva_word": _codes_deva_word,
    "beng_word": _codes_beng_word,
}


# Small public stopword lists for the light language analyzers
FRENCH_STOPWORDS = frozenset(
    """le la les de des du un une et en est dans pour que qui au aux ce
    cette sur ne pas plus par il elle avec son sa ses ou mais nous vous
    ils elles se sont""".split()
)
GERMAN_STOPWORDS = frozenset(
    """der die das den dem des ein eine einer eines einem und ist in im
    fur mit auf nicht von zu dass sich auch es an als bei nach wie aus
    wird sind oder für""".split()
)


def _register_light_language(
    name: str, stopwords: frozenset, stem_fn, base: str = "standard"
) -> None:
    """Register a light language analyzer (base tokens -> stopword
    removal -> suffix-cascade stem), scalar + vectorized codes variants
    — the pattern the reference's 30+ language analyzers follow
    (AnalysisModule language registrations; *_light stemmers in
    StemmerTokenFilterFactory). ``base='ascii_word'`` gives the chain
    an exact regexp SQL twin (used by the oracle-checked languages)."""
    base_scalar = ANALYZERS[base]
    base_codes = FLAT_ANALYZERS[base]
    cache: dict[str, str] = {}

    def word_fn(tok: str) -> str:
        hit = cache.get(tok)
        if hit is None:
            if len(cache) >= _STEM_CACHE_MAX:
                cache.clear()
            hit = cache[tok] = stem_fn(tok)
        return hit

    def scalar(text: str) -> tuple[list[str], list[int]]:
        terms, positions = base_scalar(text)
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            if t not in stopwords:
                out_t.append(word_fn(t))
                out_p.append(p)
        return out_t, out_p

    def codes(texts: pd.Series):
        d, c, u, p = base_codes(texts)
        if c.size:
            lut = np.fromiter(
                (w in stopwords for w in u), dtype=bool, count=len(u)
            )
            keep = ~lut[c]
            d, c, p = d[keep], c[keep], p[keep]
        return _transform_uniques_codes(d, c, u, p, word_fn)

    ANALYZERS[name] = scalar
    FLAT_ANALYZERS[name] = codes


SPANISH_STOPWORDS = frozenset(
    """el la los las de del un una unos unas y o en es son que con por
    para como se su sus al lo le les este esta estos estas pero mas no
    si ya fue han ser""".split()
)
ITALIAN_STOPWORDS = frozenset(
    """il lo la i gli le di del della dei delle un una uno e o in che
    con per come si su non sono al alla ai anche ma piu questo questa
    questi queste da dal""".split()
)
PORTUGUESE_STOPWORDS = frozenset(
    """o a os as de do da dos das um uma uns umas e ou em que com por
    para como se seu sua seus suas ao nao mais este esta isto foi sao
    ser ja pelo pela""".split()
)
DUTCH_STOPWORDS = frozenset(
    """de het een en van in is dat die op te zijn voor met als maar om
    aan er ook door naar bij dan nog uit over ze dit deze worden wordt
    niet""".split()
)
# Nordic/Finnish stopwords are written in NATIVE diacritic form, as in
# Lucene's snowball stopword files: the standard tokenizer keeps
# diacritics and stop-removal runs BEFORE the stemmer's folding, so an
# ascii-folded list ("pa", "ar") would never match the real tokens
# ("på", "är").
SWEDISH_STOPWORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till
    är men ett om hade de av icke mig du henne då sin nu har inte hans
    honom""".split()
)
NORWEGIAN_STOPWORDS = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke der
    så var meg seg men ett har om vi min mitt ha hadde hun nå over da
    ved fra du ut""".split()
)
DANISH_STOPWORDS = frozenset(
    """og i jeg det at en den til er som på de med han af ikke der så
    var mig sig men et har om vi min havde ham hun nu over da fra du
    ud sin dem os""".split()
)
FINNISH_STOPWORDS = frozenset(
    """olla olen on ovat ja ei se että hän me he minä sinä te tämä nämä
    joka mikä kun niin myös jos mutta vain nyt sitten kuin sen sitä
    ole""".split()
)
RUSSIAN_STOPWORDS = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к
    у же вы за бы по только ее мне было вот от меня еще нет о из ему
    теперь когда даже ну ли если уже или ни быть был него до вас""".split()
)


def _register_default_languages() -> None:
    from elasticsearch_spark.analysis.stem import (
        dutch_light_stem,
        french_light_stem,
        german_light_stem,
        italian_light_stem,
        portuguese_light_stem,
        spanish_light_stem,
    )

    _register_light_language("french_light", FRENCH_STOPWORDS, french_light_stem)
    _register_light_language("german_light", GERMAN_STOPWORDS, german_light_stem)
    _register_light_language("spanish_light", SPANISH_STOPWORDS,
                             spanish_light_stem)
    _register_light_language("italian_light", ITALIAN_STOPWORDS,
                             italian_light_stem)
    _register_light_language("portuguese_light", PORTUGUESE_STOPWORDS,
                             portuguese_light_stem)
    _register_light_language("dutch_light", DUTCH_STOPWORDS, dutch_light_stem)

    from elasticsearch_spark.analysis.stem import (
        danish_light_stem,
        finnish_light_stem,
        norwegian_light_stem,
        russian_light_stem,
        swedish_light_stem,
    )

    _register_light_language("swedish_light", SWEDISH_STOPWORDS,
                             swedish_light_stem)
    _register_light_language("norwegian_light", NORWEGIAN_STOPWORDS,
                             norwegian_light_stem)
    _register_light_language("danish_light", DANISH_STOPWORDS,
                             danish_light_stem)
    _register_light_language("finnish_light", FINNISH_STOPWORDS,
                             finnish_light_stem)
    _register_light_language("russian_light", RUSSIAN_STOPWORDS,
                             russian_light_stem)

    from elasticsearch_spark.analysis.stem import (
        arabic_light_stem,
        czech_light_stem,
        greek_light_stem,
        romanian_light_stem,
        turkish_light_stem,
    )

    _register_light_language("arabic_light", ARABIC_STOPWORDS,
                             arabic_light_stem)
    _register_light_language("turkish_light", TURKISH_STOPWORDS,
                             turkish_light_stem)
    _register_light_language("greek_light", GREEK_STOPWORDS,
                             greek_light_stem)
    _register_light_language("czech_light", CZECH_STOPWORDS,
                             czech_light_stem)
    _register_light_language("romanian_light", ROMANIAN_STOPWORDS,
                             romanian_light_stem)

    from elasticsearch_spark.analysis.stem import (
        bulgarian_light_stem,
        hindi_light_stem,
        hungarian_light_stem,
        indonesian_light_stem,
        persian_light_stem,
    )

    _register_light_language("hungarian_light", HUNGARIAN_STOPWORDS,
                             hungarian_light_stem)
    _register_light_language("bulgarian_light", BULGARIAN_STOPWORDS,
                             bulgarian_light_stem)
    _register_light_language("hindi_light", HINDI_STOPWORDS,
                             hindi_light_stem, base="deva_word")
    _register_light_language("persian_light", PERSIAN_STOPWORDS,
                             persian_light_stem)
    _register_light_language("indonesian_light", INDONESIAN_STOPWORDS,
                             indonesian_light_stem)

    from elasticsearch_spark.analysis.stem import (
        armenian_light_stem,
        basque_light_stem,
        bengali_light_stem,
        brazilian_light_stem,
        catalan_light_stem,
        estonian_light_stem,
        galician_light_stem,
        irish_light_stem,
        latvian_light_stem,
        lithuanian_light_stem,
        sorani_light_stem,
    )

    _register_light_language("brazilian_light", BRAZILIAN_STOPWORDS,
                             brazilian_light_stem)
    _register_light_language("catalan_light", CATALAN_STOPWORDS,
                             catalan_light_stem)
    _register_light_language("galician_light", GALICIAN_STOPWORDS,
                             galician_light_stem)
    _register_light_language("basque_light", BASQUE_STOPWORDS,
                             basque_light_stem)
    _register_light_language("irish_light", IRISH_STOPWORDS,
                             irish_light_stem)
    _register_light_language("estonian_light", ESTONIAN_STOPWORDS,
                             estonian_light_stem)
    _register_light_language("latvian_light", LATVIAN_STOPWORDS,
                             latvian_light_stem)
    _register_light_language("lithuanian_light", LITHUANIAN_STOPWORDS,
                             lithuanian_light_stem)
    _register_light_language("armenian_light", ARMENIAN_STOPWORDS,
                             armenian_light_stem)
    _register_light_language("sorani_light", SORANI_STOPWORDS,
                             sorani_light_stem)
    _register_light_language("bengali_light", BENGALI_STOPWORDS,
                             bengali_light_stem, base="beng_word")

    from elasticsearch_spark.analysis.stem import (
        polish_light_stem,
        ukrainian_light_stem,
    )

    _register_light_language("polish_light", POLISH_STOPWORDS,
                             polish_light_stem)
    _register_light_language("ukrainian_light", UKRAINIAN_STOPWORDS,
                             ukrainian_light_stem)


# Native-form stopword lists for the r4 tier (same sourcing note as the
# Nordic lists: written as Lucene's snowball/plugin stopword files are,
# in the script the tokenizer actually emits).
ARABIC_STOPWORDS = frozenset(
    """في من على إلى عن أن إن كان مع هذا هذه ذلك التي الذي هو هي ما لا
    لم لن قد كل بعد قبل عند أو ثم حتى إذا كما لكن بين غير أي عليه منها
    فيه وقد وهو وهي""".split()
)
TURKISH_STOPWORDS = frozenset(
    """ve bir bu da de için ile olarak daha çok en gibi kadar sonra ama
    ancak veya her ne ki mi o şu ben sen biz siz onlar değil var yok
    olan oldu ise diye""".split()
)
GREEK_STOPWORDS = frozenset(
    """και το τη την η ο οι τα του τησ των στο στη στην με για από δεν
    που είναι να θα ωσ αν ή αλλά όπωσ έχει ένα μια αυτό αυτή σε κατά
    προσ""".split()
)
CZECH_STOPWORDS = frozenset(
    """a v na je se z do ze že o k i po pro jako ale jeho její jsou byl
    byla bylo být s od u za při nebo však tento tato toto co když již
    jen tak""".split()
)
ROMANIAN_STOPWORDS = frozenset(
    """și în la cu de pe un o a al ale lui care este sunt din pentru nu
    se mai ca dar sau fi fost acest această după până prin când unde
    ei ele""".split()
)
HUNGARIAN_STOPWORDS = frozenset(
    """a az és van volt hogy nem is egy ez azt de ha már csak meg mi ki
    mint el le fel ők mert vagy még őt én te ti lesz itt ott""".split()
)
BULGARIAN_STOPWORDS = frozenset(
    """и в на с за от не се да е са по това този тази което като но или
    ако ние вие те аз ти той тя то при със има ще бе беше""".split()
)
HINDI_STOPWORDS = frozenset(
    """और का के की में है हैं को से पर यह वह एक नहीं भी हो गया था थी थे
    कि जो कर ने हम तुम वे इस उस अब तो""".split()
)
PERSIAN_STOPWORDS = frozenset(
    """و در به از که این آن را با است بود برای تا هم یا اگر ما شما او
    نه هر چه می بر شد شده باید""".split()
)
INDONESIAN_STOPWORDS = frozenset(
    """yang dan di ke dari untuk pada dengan adalah ini itu tidak akan
    ada atau juga saya kamu dia mereka kami kita sudah bisa telah oleh
    karena""".split()
)
# Final analyzer tier (native diacritic/script form — stop-removal runs
# before the stemmer's folding, same ordering note as the Nordic lists).
BRAZILIAN_STOPWORDS = frozenset(
    """o a os as de do da dos das um uma e ou em que com por para não
    como se seu sua ao mais este esta foi são ser já pelo pela ele ela
    nos isso""".split()
)
CATALAN_STOPWORDS = frozenset(
    """i el la els les de del dels un una és en que què amb per a al no
    es més aquest aquesta com són o si ja ho hi se va ser té hem
    perquè""".split()
)
GALICIAN_STOPWORDS = frozenset(
    """o a os as de do da dos das un unha uns unhas e ou en que con por
    para non como se é ao máis este esta foi son xa polo pola el ela
    nós""".split()
)
BASQUE_STOPWORDS = frozenset(
    """eta da dira zen ez bat batean du dute ere baina edo hau hori
    horiek bere nire zure gure izan dela baita zer nola non dago egin
    ditu""".split()
)
IRISH_STOPWORDS = frozenset(
    """agus an na is i ar le go do de ag ó sé sí mé tú muid siad atá
    bhí tá ní nach a ach as nó mar seo sin chun faoi roimh aige
    bhfuil""".split()
)
ESTONIAN_STOPWORDS = frozenset(
    """ja on ei see et ta ma sa me te nad oma kui aga või ka siis nii
    veel juba kes mis oli olid olema selle seda need üle välja
    ning""".split()
)
LATVIAN_STOPWORDS = frozenset(
    """un ir nav es tu viņš viņa mēs jūs kas ka bet vai arī no uz ar
    par pēc pie šis šī tas tā to bija būt kā ja lai gan tikai
    jau""".split()
)
LITHUANIAN_STOPWORDS = frozenset(
    """ir yra nėra aš tu jis ji mes jūs kas kad bet ar taip pat iš į su
    apie po prie šis ši tas ta tai buvo būti kaip jei dar tik
    jau""".split()
)
ARMENIAN_STOPWORDS = frozenset(
    """և է են էր ու որ այս այն նա ես դու մենք դուք նրանք իր ինչ չի մի
    էլ կամ բայց համար հետ մեջ վրա որպես երբ ինչպես այդ""".split()
)
SORANI_STOPWORDS = frozenset(
    """و لە بە بۆ کە ئەو ئەم من تۆ ئێمە ئێوە ئەوان دە هەر چی بەڵام یان
    لەگەڵ سەر ناو دوای پێش بوو بووە هەیە نییە ئەگەر چۆن""".split()
)
BENGALI_STOPWORDS = frozenset(
    """এবং ও এই সে তা আমি তুমি আমরা তারা যে কি না হয় ছিল করে থেকে
    জন্য সাথে এক আর কিন্তু বা তার এটা এখন আছে যদি কেন""".split()
)
POLISH_STOPWORDS = frozenset(
    """i w na z do nie się jest że to co jak ale po o od za przez dla
    tak który która które być był była było są oraz lub czy gdy ten
    ta te ich jego jej nas was""".split()
)
UKRAINIAN_STOPWORDS = frozenset(
    """і в на з до не що це як та але по від за для так який яка яке
    є був була було бути ми ви вони він вона воно його її їх у же ж
    чи коли або""".split()
)
THAI_STOPWORDS = frozenset(
    """และ ที่ ใน ของ มี ไม่ เป็น การ ได้ ให้ จะ มา ว่า กับ แล้ว ก็ เรา
    คุณ เขา นี้ นั้น อยู่ ด้วย จาก ถึง""".split()
)


# ---------------------------------------------------------------------
# CJK bigram analyzer (the reference's `cjk` analyzer: StandardTokenizer
# -> lowercase -> CJKBigramFilter -> english stopwords; Lucene
# CJKBigramFilter joins adjacent Han/Hiragana/Katakana/Hangul characters
# into overlapping bigrams, each at its own position, while non-CJK
# tokens pass through unchanged).
# ---------------------------------------------------------------------

_CJK_RANGE = (
    "ᄀ-ᇿ"   # Hangul Jamo
    "぀-ヿ"   # Hiragana + Katakana
    "ㇰ-ㇿ"   # Katakana phonetic extensions
    "㐀-䶿"   # CJK ext A
    "一-鿿"   # CJK unified
    "가-힯"   # Hangul syllables
    "豈-﫿"   # CJK compatibility
)
_CJK_ANY_RE = re.compile(f"[{_CJK_RANGE}]")
_CJK_SEG_RE = re.compile(f"[{_CJK_RANGE}]+|[^{_CJK_RANGE}]+")

_CJK_SPLIT_CACHE: dict[str, list[str]] = {}


def _cjk_expand(tok: str) -> list[str]:
    """One lowercased standard token -> emitted CJK-bigram stream."""
    hit = _CJK_SPLIT_CACHE.get(tok)
    if hit is not None:
        return hit
    if not _CJK_ANY_RE.search(tok):
        out = [tok]
    else:
        out = []
        for seg in _CJK_SEG_RE.findall(tok):
            if _CJK_ANY_RE.match(seg):
                if len(seg) == 1:
                    out.append(seg)  # lone ideogram stays a unigram
                else:
                    out.extend(seg[i:i + 2] for i in range(len(seg) - 1))
            else:
                out.append(seg)
    if len(_CJK_SPLIT_CACHE) >= _CODE_SPLIT_CACHE_MAX:
        _CJK_SPLIT_CACHE.clear()
    _CJK_SPLIT_CACHE[tok] = out
    return out


def _analyze_cjk(text: str) -> tuple[list[str], list[int]]:
    """cjk analyzer: standard tokens -> CJK bigrams (each advancing the
    position, as CJKBigramFilter emits posInc=1 grams) -> english stop
    removal (increments preserved)."""
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for raw in _WORD_RE.findall(text.lower()):
        for chunk in _chunk255(raw):
            for t in _cjk_expand(chunk):
                if t not in ENGLISH_STOPWORDS:
                    terms.append(t)
                    positions.append(pos)
                pos += 1
    return terms, positions


def _codes_cjk(texts: pd.Series):
    """Vectorized cjk: ONE Arrow split pass for raw tokens, bigram
    expansion computed once per UNIQUE token (memoized, Zipf) and
    broadcast back with the same int-gather as the `code` analyzer;
    positions are re-derived doc-major because bigrams ADVANCE positions
    (unlike code's overlap tokens)."""
    d, c, u, ul, p = _split_codes(texts, _NEG_WORD, lower=True)
    if ul.size and int(ul.max()) > MAX_TOKEN_LENGTH:
        # rare long-token docs: scalar fallback for the whole batch
        return _codes_via_scalar(texts, _analyze_cjk)
    if not c.size:
        return d, c, u, p
    vocab: dict[str, int] = {}
    setd = vocab.setdefault
    flat_ids: list[int] = []
    exp_lens = np.empty(len(u), dtype=np.int64)
    for i, tok in enumerate(u.tolist()):
        sl = _cjk_expand(tok)
        flat_ids.extend(setd(w, len(vocab)) for w in sl)
        exp_lens[i] = len(sl)
    exp_ids = np.array(flat_ids, dtype=np.int64)
    exp_offs = np.concatenate(([0], np.cumsum(exp_lens)))
    tok_lens = exp_lens[c]
    total = int(tok_lens.sum())
    cum0 = np.cumsum(tok_lens) - tok_lens
    gather = (
        np.repeat(exp_offs[c], tok_lens)
        + np.arange(total, dtype=np.int64)
        - np.repeat(cum0, tok_lens)
    )
    new_u = np.empty(len(vocab), dtype=object)
    for w, i in vocab.items():
        new_u[i] = w
    d2 = np.repeat(d, tok_lens)
    c2 = exp_ids[gather]
    # positions: every emitted token advances within its doc (d2 is
    # doc-major ascending, so a grouped arange suffices)
    if d2.size:
        cnt = np.bincount(d2, minlength=int(d2.max()) + 1)
        cnt = cnt[cnt > 0]
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        p2 = np.arange(d2.size, dtype=np.int64) - np.repeat(starts, cnt)
    else:
        p2 = np.empty(0, dtype=np.int64)
    # english stop removal by code (positions preserved)
    stop_lut = np.fromiter(
        (w in ENGLISH_STOPWORDS for w in new_u), dtype=bool,
        count=len(new_u))
    keep = ~stop_lut[c2]
    return d2[keep], c2[keep], new_u, p2[keep]


def _codes_via_scalar(texts: pd.Series, scalar_fn):
    parts_d, parts_t, parts_p = [], [], []
    for i, text in enumerate(texts.fillna("").tolist()):
        t, p = scalar_fn(text)
        if t:
            parts_d.append(np.full(len(t), i, dtype=np.int64))
            parts_t.append(np.array(t, dtype=object))
            parts_p.append(np.array(p, dtype=np.int64))
    if not parts_d:
        return _CODES_EMPTY
    return _refactorize(
        np.concatenate(parts_d), np.concatenate(parts_t),
        np.concatenate(parts_p),
    )


ANALYZERS["cjk"] = _analyze_cjk
FLAT_ANALYZERS["cjk"] = _codes_cjk


# ---------------------------------------------------------------------
# Thai analyzer. The reference's `thai` analyzer
# (modules/analysis-common/.../CommonAnalysisPlugin.java thai
# registration -> Lucene ThaiAnalyzer) segments with a dictionary
# BreakIterator that is not available here, so this re-expression uses
# the CJK-bigram strategy over Thai GRAPHEME CLUSTERS (a lead character
# plus its combining vowels/tone marks): recall-equivalent matching
# without a word dictionary, the standard fallback for unsegmented
# scripts. Thai/English stopwords are dropped at the raw-run level
# (one position increment per dropped run, StopFilter-style); Latin
# tokens pass through unchanged.
# ---------------------------------------------------------------------

_THAI_RANGE = "฀-๿"  # U+0E00-0E7F
_THAI_ANY_RE = re.compile(f"[{_THAI_RANGE}]")
_THAI_SEG_RE = re.compile(f"[{_THAI_RANGE}]+|[^{_THAI_RANGE}]+")
# \w drops Thai combining marks (Mn), so the base split keeps the block
_THAI_WORD_RE = re.compile(rf"[\w{_THAI_RANGE}]+", re.UNICODE)
# one cluster: lead char + trailing sara/mai marks (U+0E31, U+0E34-3A,
# U+0E47-4E are the block's combining codepoints)
_THAI_CLUSTER_RE = re.compile(
    "[฀-๿][ัิ-ฺ็-๎]*")

_THAI_SPLIT_CACHE: dict[str, list[str]] = {}


def _thai_expand(tok: str) -> list[str]:
    """One lowercased token -> emitted cluster-bigram stream."""
    hit = _THAI_SPLIT_CACHE.get(tok)
    if hit is not None:
        return hit
    if not _THAI_ANY_RE.search(tok):
        out = [tok]
    else:
        out = []
        for seg in _THAI_SEG_RE.findall(tok):
            if _THAI_ANY_RE.match(seg):
                cl = _THAI_CLUSTER_RE.findall(seg)
                if len(cl) == 1:
                    out.append(cl[0])
                else:
                    out.extend(cl[i] + cl[i + 1]
                               for i in range(len(cl) - 1))
            else:
                out.append(seg)
    if len(_THAI_SPLIT_CACHE) >= _CODE_SPLIT_CACHE_MAX:
        _THAI_SPLIT_CACHE.clear()
    _THAI_SPLIT_CACHE[tok] = out
    return out


def _analyze_thai(text: str) -> tuple[list[str], list[int]]:
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for raw in _THAI_WORD_RE.findall(text.lower()):
        for chunk in _chunk255(raw):
            if chunk in THAI_STOPWORDS or chunk in ENGLISH_STOPWORDS:
                pos += 1
                continue
            for t in _thai_expand(chunk):
                terms.append(t)
                positions.append(pos)
                pos += 1
    return terms, positions


_NEG_THAI = rf"[^\p{{L}}\p{{N}}_{_THAI_RANGE}]+"


def _codes_thai(texts: pd.Series):
    """Vectorized thai: one Arrow split pass, per-UNIQUE-token cluster
    bigram expansion (memoized), variable position ADVANCE (stop runs
    emit nothing but still advance one position)."""
    d, c, u, ul, p = _split_codes(texts, _NEG_THAI, lower=True)
    if ul.size and int(ul.max()) > MAX_TOKEN_LENGTH:
        return _codes_via_scalar(texts, _analyze_thai)
    if not c.size:
        return d, c, u, p
    vocab: dict[str, int] = {}
    setd = vocab.setdefault
    flat_ids: list[int] = []
    emit_lens = np.empty(len(u), dtype=np.int64)
    adv_lens = np.empty(len(u), dtype=np.int64)
    for i, tok in enumerate(u.tolist()):
        if tok in THAI_STOPWORDS or tok in ENGLISH_STOPWORDS:
            emit_lens[i] = 0
            adv_lens[i] = 1
        else:
            sl = _thai_expand(tok)
            flat_ids.extend(setd(w, len(vocab)) for w in sl)
            emit_lens[i] = adv_lens[i] = len(sl)
    exp_ids = np.array(flat_ids, dtype=np.int64)
    exp_offs = np.concatenate(([0], np.cumsum(emit_lens)))
    tok_e = emit_lens[c]
    tok_a = adv_lens[c]
    total = int(tok_e.sum())
    cum0 = np.cumsum(tok_e) - tok_e
    within = np.arange(total, dtype=np.int64) - np.repeat(cum0, tok_e)
    gather = np.repeat(exp_offs[c], tok_e) + within
    new_u = np.empty(len(vocab), dtype=object)
    for w, i in vocab.items():
        new_u[i] = w
    # start position of each raw token: per-doc exclusive cumsum of the
    # ADVANCE lengths (d is doc-major ascending from _split_codes)
    ca = np.cumsum(tok_a) - tok_a
    change = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
    counts = np.diff(np.append(change, d.size))
    start = ca - np.repeat(ca[change], counts)
    return (np.repeat(d, tok_e), exp_ids[gather], new_u,
            np.repeat(start, tok_e) + within)


ANALYZERS["thai"] = _analyze_thai
FLAT_ANALYZERS["thai"] = _codes_thai


# ---------------------------------------------------------------------
# Thai DICTIONARY analyzer (`thai_dict`). The reference's `thai`
# analyzer delegates to Lucene's ThaiTokenizer, a dictionary-driven
# ICU BreakIterator (analysis-common CommonAnalysisPlugin.java thai ->
# lucene/analysis/th/ThaiTokenizer.java); the ICU data files are not
# in this container, so this re-expression embeds a compact common-word
# lexicon and segments each Thai run by GREEDY LONGEST MATCH (maximal
# matching, the classical Thai word-segmentation baseline): at each
# offset take the longest dictionary word that (a) prefixes the rest of
# the run and (b) does not end immediately before a combining mark
# (which would split a grapheme cluster); spans no dictionary word
# covers fall back to one grapheme-cluster token (documented divergence
# from ICU's statistical tie-breaks). Segments then pass a StopFilter:
# Thai stopwords drop but still advance one position, exactly like the
# reference's thai analyzer stopword stage. `thai` (cluster bigrams,
# no dictionary) remains the recall-oriented fallback analyzer.
# ---------------------------------------------------------------------

THAI_DICT = frozenset("""
การ ความ ค้นหา ข้อมูล ระบบ เอกสาร แมว น้ำ รวดเร็ว ประมวล ผล
ประเทศ ไทย ภาษา หนังสือ โรงเรียน นักเรียน ครู อาหาร บ้าน เมือง คน
ทำ งาน วัน ปี เวลา รัก ใจ ดี ใหญ่ เล็ก มาก น้อย ใหม่ เก่า สวย เร็ว
ช้า กิน นอน เดิน วิ่ง อ่าน เขียน พูด ฟัง เรียน สอน ซื้อ ขาย เงิน รถ
ถนน ตลาด โต๊ะ คอมพิวเตอร์ โทรศัพท์ อินเทอร์เน็ต เทคโนโลยี ปลา
และ ที่ ใน ของ มี ไม่ เป็น ได้ ให้ จะ มา ว่า กับ แล้ว ก็ เรา คุณ เขา
นี้ นั้น อยู่ ด้วย จาก ถึง
""".split())

_THAI_DICT_MAXLEN = max(len(w) for w in THAI_DICT)
_THAI_COMBINING = frozenset("ัิีึืฺุู็่้๊๋์ํ๎")

_THAI_DICT_CACHE: dict[str, list[str]] = {}


def _thai_dict_segment(run: str) -> list[str]:
    """One Thai run -> greedy longest-match segments (OOV -> cluster)."""
    hit = _THAI_DICT_CACHE.get(run)
    if hit is not None:
        return hit
    out: list[str] = []
    i, n = 0, len(run)
    while i < n:
        for ln in range(min(_THAI_DICT_MAXLEN, n - i), 0, -1):
            cand = run[i:i + ln]
            if cand in THAI_DICT and (
                    i + ln >= n or run[i + ln] not in _THAI_COMBINING):
                out.append(cand)
                i += ln
                break
        else:
            m = _THAI_CLUSTER_RE.match(run, i)
            out.append(m.group(0))
            i = m.end()
    if len(_THAI_DICT_CACHE) >= _CODE_SPLIT_CACHE_MAX:
        _THAI_DICT_CACHE.clear()
    _THAI_DICT_CACHE[run] = out
    return out


def _thai_dict_expand(tok: str) -> tuple[list[str], list[int], int]:
    """One lowercased raw token -> (emitted segments, their relative
    positions, total position advance). Thai stopword SEGMENTS drop but
    advance (StopFilter); Latin tokens pass through whole."""
    if not _THAI_ANY_RE.search(tok):
        if tok in ENGLISH_STOPWORDS:
            return [], [], 1
        return [tok], [0], 1
    segs: list[str] = []
    for part in _THAI_SEG_RE.findall(tok):
        if _THAI_ANY_RE.match(part):
            segs.extend(_thai_dict_segment(part))
        else:
            segs.append(part)
    emitted, relpos = [], []
    for j, s in enumerate(segs):
        if s not in THAI_STOPWORDS and s not in ENGLISH_STOPWORDS:
            emitted.append(s)
            relpos.append(j)
    return emitted, relpos, len(segs)


def _analyze_thai_dict(text: str) -> tuple[list[str], list[int]]:
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for raw in _THAI_WORD_RE.findall(text.lower()):
        for chunk in _chunk255(raw):
            emitted, relpos, adv = _thai_dict_expand(chunk)
            terms.extend(emitted)
            positions.extend(pos + r for r in relpos)
            pos += adv
    return terms, positions


def _codes_thai_dict(texts: pd.Series):
    """Vectorized thai_dict: one Arrow split pass, per-UNIQUE-token
    memoized dictionary segmentation; emitted relative positions are
    gathered explicitly (stop segments leave position gaps)."""
    d, c, u, ul, p = _split_codes(texts, _NEG_THAI, lower=True)
    if ul.size and int(ul.max()) > MAX_TOKEN_LENGTH:
        return _codes_via_scalar(texts, _analyze_thai_dict)
    if not c.size:
        return d, c, u, p
    vocab: dict[str, int] = {}
    setd = vocab.setdefault
    flat_ids: list[int] = []
    flat_rel: list[int] = []
    emit_lens = np.empty(len(u), dtype=np.int64)
    adv_lens = np.empty(len(u), dtype=np.int64)
    for i, tok in enumerate(u.tolist()):
        emitted, relpos, adv = _thai_dict_expand(tok)
        flat_ids.extend(setd(w, len(vocab)) for w in emitted)
        flat_rel.extend(relpos)
        emit_lens[i] = len(emitted)
        adv_lens[i] = adv
    exp_ids = np.array(flat_ids, dtype=np.int64)
    exp_rel = np.array(flat_rel, dtype=np.int64)
    exp_offs = np.concatenate(([0], np.cumsum(emit_lens)))
    tok_e = emit_lens[c]
    tok_a = adv_lens[c]
    total = int(tok_e.sum())
    if not total:
        return _CODES_EMPTY
    cum0 = np.cumsum(tok_e) - tok_e
    within = np.arange(total, dtype=np.int64) - np.repeat(cum0, tok_e)
    gather = np.repeat(exp_offs[c], tok_e) + within
    new_u = np.empty(len(vocab), dtype=object)
    for w, i in vocab.items():
        new_u[i] = w
    ca = np.cumsum(tok_a) - tok_a
    change = np.flatnonzero(np.diff(d, prepend=d[0] - 1))
    counts = np.diff(np.append(change, d.size))
    start = ca - np.repeat(ca[change], counts)
    keep_d = np.repeat(d, tok_e)
    return (keep_d, exp_ids[gather], new_u,
            np.repeat(start, tok_e) + exp_rel[gather])


ANALYZERS["thai_dict"] = _analyze_thai_dict
FLAT_ANALYZERS["thai_dict"] = _codes_thai_dict

_register_default_languages()


def analyze_flat_codes(
    texts: pd.Series, analyzer: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized batch analysis -> (doc_idx, codes, uniques, positions);
    tokens stay integer codes into `uniques`. Falls back to the scalar
    analyzer (then factorizes) for names without a flat variant."""
    fn = FLAT_ANALYZERS.get(analyzer)
    if fn is not None:
        return fn(texts)
    scalar = ANALYZERS[analyzer]
    parts_d, parts_t, parts_p = [], [], []
    for i, text in enumerate(texts.fillna("").tolist()):
        t, p = scalar(text)
        if t:
            parts_d.append(np.full(len(t), i, dtype=np.int64))
            parts_t.append(np.array(t, dtype=object))
            parts_p.append(np.array(p, dtype=np.int64))
    if not parts_d:
        return _CODES_EMPTY
    return _refactorize(
        np.concatenate(parts_d),
        np.concatenate(parts_t),
        np.concatenate(parts_p),
    )


def analyze_flat(
    texts: pd.Series, analyzer: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized batch analysis -> (doc_idx, terms, positions) with
    materialized term strings (parity-test / generic-consumer API)."""
    d, c, u, p = analyze_flat_codes(texts, analyzer)
    if not c.size:
        return _FLAT_EMPTY
    return d, u[c], p


def analyze_batch(
    texts: pd.Series, analyzer: str = "standard"
) -> tuple[list[list[str]], list[list[int]]]:
    """Vectorized batch analysis: one (terms, positions) pair per row.

    Used inside mapInPandas/applyInPandas — Arrow-batched, never
    row-at-a-time at the Spark level.
    """
    fn = ANALYZERS[analyzer]
    all_terms: list[list[str]] = []
    all_pos: list[list[int]] = []
    for text in texts.fillna("").tolist():
        t, p = fn(text)
        all_terms.append(t)
        all_pos.append(p)
    return all_terms, all_pos
