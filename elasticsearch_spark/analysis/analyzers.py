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


ANALYZERS: dict[str, Callable[[str], tuple[list[str], list[int]]]] = {
    "standard": _analyze_standard,
    "code": _analyze_code,
    "simple": _analyze_simple,
    "whitespace": _analyze_whitespace,
    "keyword": _analyze_keyword,
    "stop": _analyze_stop,
    "ascii_word": _analyze_ascii_word,
}


def analyze(text: str, analyzer: str = "standard") -> list[tuple[str, int]]:
    """_analyze-API-style entry point: token + position list.

    Reference: action/admin/indices/analyze/TransportAnalyzeAction.java:110-127.
    """
    terms, positions = ANALYZERS[analyzer](text or "")
    return list(zip(terms, positions))


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
