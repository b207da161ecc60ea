"""Token filters + extra tokenizers (reference: analysis-common
CommonAnalysisPlugin.java registrations — ngram, edge_ngram, shingle,
asciifolding, pattern, path_hierarchy, trim/truncate/unique/length/
reverse/elision).

Filters are list->list functions composable after any ANALYZERS entry;
``compose(analyzer, *filters)`` builds a new analyzer callable usable
everywhere an analyzer name is (register via ANALYZERS[name] = ...).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

TokenStream = tuple[list[str], list[int]]


def ngram_filter(min_gram: int = 1, max_gram: int = 2):
    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            for n in range(min_gram, max_gram + 1):
                for i in range(0, len(t) - n + 1):
                    out_t.append(t[i : i + n])
                    out_p.append(p)
        return out_t, out_p
    return fn


def edge_ngram_filter(min_gram: int = 1, max_gram: int = 10):
    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            for n in range(min_gram, min(max_gram, len(t)) + 1):
                out_t.append(t[:n])
                out_p.append(p)
        return out_t, out_p
    return fn


def shingle_filter(min_size: int = 2, max_size: int = 2, sep: str = " "):
    """Word shingles (the shingle token filter; also the unit for
    MinHash dedup)."""
    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for size in range(min_size, max_size + 1):
            for i in range(0, len(terms) - size + 1):
                out_t.append(sep.join(terms[i : i + size]))
                out_p.append(positions[i])
        return out_t, out_p
    return fn


def asciifolding(terms: list[str], positions: list[int]) -> TokenStream:
    folded = [
        unicodedata.normalize("NFKD", t).encode("ascii", "ignore").decode("ascii")
        or t
        for t in terms
    ]
    return folded, positions


def trim_filter(terms: list[str], positions: list[int]) -> TokenStream:
    return [t.strip() for t in terms], positions


def truncate_filter(length: int = 10):
    def fn(terms, positions):
        return [t[:length] for t in terms], positions
    return fn


def unique_filter(terms: list[str], positions: list[int]) -> TokenStream:
    seen: set[str] = set()
    out_t, out_p = [], []
    for t, p in zip(terms, positions):
        if t not in seen:
            seen.add(t)
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def length_filter(min_len: int = 0, max_len: int = 255):
    def fn(terms, positions):
        keep = [(t, p) for t, p in zip(terms, positions) if min_len <= len(t) <= max_len]
        if not keep:
            return [], []
        ts, ps = zip(*keep)
        return list(ts), list(ps)
    return fn


def reverse_filter(terms: list[str], positions: list[int]) -> TokenStream:
    return [t[::-1] for t in terms], positions


def keep_filter(words):
    """keep token filter (KeepWordFilterFactory): drop every token NOT
    in the keep list — the inverse of stop."""
    keep = frozenset(words)

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        pairs = [(t, p) for t, p in zip(terms, positions) if t in keep]
        return [t for t, _ in pairs], [p for _, p in pairs]

    return fn


def token_type(tok: str) -> str:
    """Token type as the standard tokenizer would assign it (the subset
    our \\w+-style streams can carry): <NUM> for all-digit runs,
    <ALPHANUM> otherwise."""
    return "<NUM>" if tok.isdigit() else "<ALPHANUM>"


def keep_types_filter(types, mode: str = "include"):
    """keep_types token filter (KeepTypesFilterFactory): keep (or with
    mode='exclude' drop) tokens whose type is in the set. Types are
    derived from token shape (``token_type``) since list->list streams
    carry no tokenizer type attribute — covers the <NUM>/<ALPHANUM>
    split the filter is almost always used for."""
    tset = frozenset(types)
    want = mode == "include"

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        pairs = [
            (t, p) for t, p in zip(terms, positions)
            if (token_type(t) in tset) == want
        ]
        return [t for t, _ in pairs], [p for _, p in pairs]

    return fn


def pattern_capture_filter(patterns, preserve_original: bool = True):
    """pattern_capture token filter (PatternCaptureGroupTokenFilter):
    emit every capture group of every pattern as an extra token at the
    SAME position (position increment 0); optionally keep the
    original."""
    compiled = [re.compile(p) for p in patterns]

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            emitted: list[str] = [t] if preserve_original else []
            for pat in compiled:
                for m in pat.finditer(t):
                    for g in m.groups():
                        if g and g not in emitted:
                            emitted.append(g)
            if not emitted:
                emitted = [t]
            for e in emitted:
                out_t.append(e)
                out_p.append(p)
        return out_t, out_p

    return fn


def common_grams_filter(common_words, query_mode: bool = False,
                        sep: str = "_"):
    """common_grams token filter (CommonGramsFilterFactory): for every
    adjacent pair where either side is a common word, ALSO emit the
    joined bigram at the first word's position (position increment 0 —
    Lucene CommonGramsFilter). ``query_mode`` additionally drops the
    common unigrams themselves (CommonGramsQueryFilter), so phrase-ish
    queries hit only the grams."""
    common = frozenset(common_words)

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        n = len(terms)
        for i, (t, p) in enumerate(zip(terms, positions)):
            gram = (
                i + 1 < n and (t in common or terms[i + 1] in common)
            )
            if not (query_mode and t in common):
                out_t.append(t)
                out_p.append(p)
            if gram:
                out_t.append(t + sep + terms[i + 1])
                out_p.append(p)
        return out_t, out_p

    return fn


FRENCH_ELISION_ARTICLES = frozenset(
    "l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split()
)


def elision_filter(articles=FRENCH_ELISION_ARTICLES):
    """elision token filter (reg. CommonAnalysisPlugin): strip a
    leading article + apostrophe ("l'avion" -> "avion"). Applies to
    tokenizers that keep apostrophes inside tokens."""
    arts = frozenset(articles)

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out = []
        for t in terms:
            for ap in ("'", "’"):
                head, _, rest = t.partition(ap)
                if rest and head in arts:
                    t = rest
                    break
            out.append(t)
        return out, positions

    return fn


def parse_synonym_rules(
    rules: list[str], expand: bool = True
) -> dict[tuple[str, ...], list[str]]:
    """Parse Solr-format synonym rules (the reference's synonym /
    synonym_graph token filters, analysis-common
    CommonAnalysisPlugin.java:320 + Lucene SynonymMap.Parser):

    - ``"a, b, c"`` — equivalence set. With ``expand`` (the default)
      every member maps to ALL members; with ``expand=False`` every
      member maps to the first.
    - ``"a, b => c"`` — explicit mapping: each left-hand side is
      REPLACED by the right-hand side terms.

    Left-hand sides may be multi-word ("machine learning => ml") —
    matched greedily longest-first over the token stream. Multi-word
    OUTPUTS would need position-graph tokens (SynonymGraphFilter); this
    engine's flat positions cannot represent them, so they raise."""
    mapping: dict[tuple[str, ...], list[str]] = {}

    def add(lhs: str, outs: list[str]) -> None:
        key = tuple(lhs.split())
        for o in outs:
            if " " in o:
                raise ValueError(
                    f"multi-word synonym output {o!r} needs graph positions"
                )
        mapping.setdefault(key, [])
        for o in outs:
            if o not in mapping[key]:
                mapping[key].append(o)

    for rule in rules:
        if "=>" in rule:
            lhs_s, rhs_s = rule.split("=>", 1)
            outs = [t.strip() for t in rhs_s.split(",") if t.strip()]
            for lhs in (t.strip() for t in lhs_s.split(",")):
                if lhs:
                    add(lhs, outs)
        else:
            members = [t.strip() for t in rule.split(",") if t.strip()]
            targets = members if expand else members[:1]
            for m in members:
                add(m, targets)
    return mapping


def synonym_filter(rules: list[str], expand: bool = True):
    """Index/query-time synonym token filter. Emits every mapped output
    at the POSITION OF THE MATCH START (position increment 0 between
    outputs), so document frequencies, collection frequencies and
    norms reflect the expansion — dl discounts same-position overlaps
    exactly like Lucene's discountOverlaps (index/builder.py dl =
    distinct positions). Greedy longest-match like Lucene's FST-backed
    SynonymMap; unmatched tokens pass through unchanged."""
    mapping = parse_synonym_rules(rules, expand=expand)
    max_len = max((len(k) for k in mapping), default=1)
    starts = {k[0] for k in mapping}

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        i = 0
        n = len(terms)
        while i < n:
            t = terms[i]
            if t in starts:
                matched = None
                for L in range(min(max_len, n - i), 0, -1):
                    key = tuple(terms[i:i + L])
                    if key in mapping:
                        matched = (L, mapping[key])
                        break
                if matched is not None:
                    L, outs = matched
                    for o in outs:
                        out_t.append(o)
                        out_p.append(positions[i])
                    i += L
                    continue
            out_t.append(t)
            out_p.append(positions[i])
            i += 1
        return out_t, out_p

    return fn


def dictionary_decompounder_filter(
    word_list,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """dictionary_decompounder token filter
    (CommonAnalysisPlugin.java registration of
    DictionaryCompoundWordTokenFilter): for every token of at least
    ``min_word_size`` chars, every dictionary word that occurs as a
    substring (with size within [min_subword_size, max_subword_size])
    is emitted as an extra token at the SAME position, once per
    matching start offset; the original token always stays.
    ``only_longest_match`` keeps only the longest matching subword per
    start offset (Lucene's flag).

    The hyphenation_decompounder variant is
    ``hyphenation_decompounder_filter`` below (inline Liang patterns
    instead of the reference's external XML grammar files).
    """
    words = sorted(
        {
            w.lower() for w in word_list
            if min_subword_size <= len(w) <= max_subword_size
        },
        key=lambda w: (-len(w), w),
    )

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            if only_longest_match:
                # longest dictionary hit per start offset
                for i in range(len(t)):
                    for w in words:  # sorted longest-first
                        if t.startswith(w, i) and w != t:
                            out_t.append(w)
                            out_p.append(p)
                            break
            else:
                # one subword token PER MATCHING START OFFSET, as
                # DictionaryCompoundWordTokenFilter does — a word that
                # occurs twice inside the token is emitted twice
                for i in range(len(t)):
                    for w in words:
                        if w != t and t.startswith(w, i):
                            out_t.append(w)
                            out_p.append(p)
        return out_t, out_p

    return fn


def _parse_liang_patterns(
    patterns,
) -> tuple[dict[str, tuple[int, ...]], int]:
    """Parse Liang (1983, "Word Hy-phen-a-tion by Com-put-er") TeX-style
    hyphenation patterns ("ab1c", ".ach4", "1ba") into
    letters -> inter-letter digit vector (len(letters)+1 values)."""
    table: dict[str, tuple[int, ...]] = {}
    max_len = 1
    for pat in patterns:
        letters: list[str] = []
        vals = [0]
        for ch in pat:
            if ch.isdigit():
                vals[-1] = int(ch)
            else:
                letters.append(ch)
                vals.append(0)
        key = "".join(letters)
        table[key] = tuple(vals)
        max_len = max(max_len, len(key))
    return table, max_len


def hyphenation_decompounder_filter(
    patterns,
    word_list=None,
    min_word_size: int = 5,
    min_subword_size: int = 2,
    max_subword_size: int = 15,
    only_longest_match: bool = False,
):
    """hyphenation_decompounder token filter
    (CommonAnalysisPlugin.java registration of
    HyphenationCompoundWordTokenFilter). The reference loads FOP XML
    hyphenation grammars from ``hyphenation_patterns_path``; this
    re-expression takes the SAME Liang patterns INLINE (list of
    TeX-style pattern strings, "." = word boundary) so no external file
    is needed — the scoring algorithm is Liang's published one.

    For each token of at least ``min_word_size`` chars: compute the
    hyphenation points (max pattern digit per inter-letter gap, odd =
    break), then every contiguous syllable span within
    [min_subword_size, max_subword_size] that passes the dictionary
    check (``word_list``; ``None`` = accept every span, Lucene's
    no-dictionary mode) is emitted at the token's position, once per
    span. ``only_longest_match`` keeps only the longest hit per start
    syllable."""
    table, max_len = _parse_liang_patterns(patterns)
    words = None
    if word_list is not None:
        words = {
            w.lower() for w in word_list
            if min_subword_size <= len(w) <= max_subword_size
        }

    def breaks(word: str) -> list[int]:
        """Positions p (0<p<len) where hyphenation is allowed."""
        w = f".{word}."
        n = len(w)
        # vals[k] = weight of the gap BEFORE w[k]
        vals = [0] * (n + 1)
        for i in range(n):
            top = min(n, i + max_len)
            for j in range(i + 1, top + 1):
                hit = table.get(w[i:j])
                if hit is not None:
                    for off, v in enumerate(hit):
                        if v > vals[i + off]:
                            vals[i + off] = v
        # gap before w[k] == gap before word[k-1]; interior breaks only
        return [k - 1 for k in range(2, n - 1) if vals[k] % 2 == 1]

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            out_t.append(t)
            out_p.append(p)
            if len(t) < min_word_size:
                continue
            cuts = [0] + breaks(t) + [len(t)]
            for a in range(len(cuts) - 1):
                best = None
                for b in range(a + 1, len(cuts)):
                    cand = t[cuts[a]:cuts[b]]
                    if cand == t or not (
                        min_subword_size <= len(cand) <= max_subword_size
                    ):
                        continue
                    if words is not None and cand not in words:
                        continue
                    if only_longest_match:
                        best = cand  # spans grow with b: keep longest
                    else:
                        out_t.append(cand)
                        out_p.append(p)
                if best is not None:
                    out_t.append(best)
                    out_p.append(p)
        return out_t, out_p

    return fn


def multiplexer_filter(*branches, preserve_original: bool = True):
    """multiplexer token filter (MultiplexerTokenFilterFactory): run
    each branch (a filter or tuple of filters forming a chain) over the
    stream; every branch's output is emitted at the source position
    (posInc 0 stacking); duplicate (term, position) pairs are removed
    as the reference's filter does."""
    chains = [b if isinstance(b, (tuple, list)) else (b,) for b in branches]

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out: list[tuple[int, str]] = []
        seen: set[tuple[int, str]] = set()

        def emit(ts: list[str], ps: list[int]) -> None:
            for t, p in zip(ts, ps):
                if t and (p, t) not in seen:
                    seen.add((p, t))
                    out.append((p, t))

        if preserve_original:
            emit(terms, positions)
        for chain in chains:
            ts, ps = list(terms), list(positions)
            for f in chain:
                ts, ps = f(ts, ps)
            emit(ts, ps)
        out.sort()
        return [t for _, t in out], [p for p, _ in out]

    return fn


def condition_filter(predicate: Callable[[str], bool], *filters):
    """condition token filter (ScriptedConditionTokenFilterFactory):
    apply the wrapped filter chain only to tokens where ``predicate``
    holds; other tokens pass through unchanged. The reference takes a
    Painless script — here any Python predicate over the term."""

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            if predicate(t):
                ts, ps = [t], [p]
                for f in filters:
                    ts, ps = f(ts, ps)
                out_t.extend(ts)
                out_p.extend(ps)
            else:
                out_t.append(t)
                out_p.append(p)
        return out_t, out_p

    return fn


def predicate_token_filter(predicate: Callable[[str], bool]):
    """predicate_token_filter (ScriptedPredicateTokenFilterFactory):
    keep only tokens where the predicate holds."""

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        pairs = [(t, p) for t, p in zip(terms, positions) if predicate(t)]
        return [t for t, _ in pairs], [p for _, p in pairs]

    return fn


def min_hash_filter(hash_count: int = 1, bucket_count: int = 512,
                    hash_set_size: int = 1, with_rotation: bool = True):
    """min_hash token filter (Lucene MinHashFilter, registered in
    CommonAnalysisPlugin.java): hash every input token, keep the
    ``hash_set_size`` smallest hashes per bucket (hash space split into
    ``bucket_count`` ranges), and emit the kept hashes as hex tokens —
    the index-side half of MinHash similarity. ``with_rotation`` fills
    empty buckets with the next non-empty bucket's value (Lucene
    default), keeping the output length fixed at bucket_count.

    Hashing is sha1-based (deterministic across JVM/Python), not
    Lucene's murmur — parity is with the ALGORITHM, not the bytes;
    the dedup MinHash pipeline (ops/dedup.py) is the scale path.
    """
    import hashlib

    def h(tok: str, salt: int) -> int:
        d = hashlib.sha1(f"{salt}:{tok}".encode()).digest()
        return int.from_bytes(d[:8], "big")

    span = (1 << 64) // bucket_count

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        if not terms:
            return [], []
        out_t: list[str] = []
        first_pos = positions[0] if positions else 1
        for salt in range(hash_count):
            buckets: list[list[int]] = [[] for _ in range(bucket_count)]
            for t in terms:
                v = h(t, salt)
                b = min(v // span, bucket_count - 1)
                keep = buckets[b]
                keep.append(v)
                keep.sort()
                del keep[hash_set_size:]
            if with_rotation:
                # rotate: empty buckets borrow the next non-empty value
                vals: list[list[int]] = [list(b) for b in buckets]
                for i in range(bucket_count):
                    if not vals[i]:
                        j = (i + 1) % bucket_count
                        while j != i and not buckets[j]:
                            j = (j + 1) % bucket_count
                        if buckets[j]:
                            vals[i] = [buckets[j][0]]
                buckets = vals
            for b in buckets:
                for v in b:
                    out_t.append(f"{v:016x}")
        return out_t, [first_pos] * len(out_t)

    return fn


def compose(base: Callable[[str], TokenStream], *filters) -> Callable[[str], TokenStream]:
    def analyzer(text: str) -> TokenStream:
        terms, positions = base(text)
        for f in filters:
            terms, positions = f(terms, positions)
        return terms, positions
    return analyzer


# ---- char filters (run BEFORE the tokenizer, like the reference's
# analysis chain: char_filter -> tokenizer -> token filters) ----

def mapping_char_filter(mappings: dict[str, str]):
    """MappingCharFilterFactory: literal replacements applied to the raw
    text (e.g. {"+": "_plus_"} so `c++` tokenizes as one term)."""
    def cf(text: str) -> str:
        for k, v in mappings.items():
            text = text.replace(k, v)
        return text
    return cf


def pattern_replace_char_filter(pattern: str, replacement: str = ""):
    """PatternReplaceCharFilterFactory: regex replacement pre-tokenize."""
    rx = re.compile(pattern)

    def cf(text: str) -> str:
        return rx.sub(replacement, text)
    return cf


def html_strip_char_filter():
    """HtmlStripCharFilterFactory: drop tags, keep text."""
    rx = re.compile(r"<[^>]*>")

    def cf(text: str) -> str:
        return rx.sub(" ", text)
    return cf


def with_char_filters(base: Callable[[str], TokenStream], *char_filters):
    """Prepend char filters to an analyzer (reference chain order)."""
    def analyzer(text: str) -> TokenStream:
        for cf in char_filters:
            text = cf(text)
        return base(text)
    return analyzer


# ---- extra tokenizers registered as analyzers ----

def path_hierarchy(text: str) -> TokenStream:
    """a/b/c -> [a, a/b, a/b/c]; Lucene PathHierarchyTokenizer emits the
    prefixes at position 0 (increment 1 then 0s)."""
    parts = [p for p in text.split("/") if p != ""]
    lead = "/" if text.startswith("/") else ""
    out: list[str] = []
    for i in range(1, len(parts) + 1):
        out.append(lead + "/".join(parts[:i]))
    return out, [0] * len(out)


_DEFAULT_PATTERN = re.compile(r"\W+", re.UNICODE)


def pattern_analyzer(text: str) -> TokenStream:
    """ES `pattern` analyzer defaults: split on \\W+, lowercase."""
    terms = [t for t in _DEFAULT_PATTERN.split(text.lower()) if t]
    return terms, list(range(len(terms)))


def letter_tokenizer(text: str) -> TokenStream:
    terms = re.findall(r"[^\W\d_]+", text, re.UNICODE)
    return terms, list(range(len(terms)))


_EMAIL_RE = r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"
_URL_RE = r"(?:https?|ftp)://[^\s<>\"']+|www\.[^\s<>\"']+"
_UAX_URL_EMAIL_RE = re.compile(
    f"(?:{_URL_RE})|(?:{_EMAIL_RE})|[\\w]+(?:['.]\\w+)*", re.UNICODE)


def uax_url_email_tokenizer(text: str) -> TokenStream:
    """`uax_url_email` tokenizer (Lucene UAX29URLEmailTokenizer via
    CommonAnalysisPlugin registration): standard word-break EXCEPT that
    URLs and email addresses stay single tokens — the web-corpus
    tokenizer (link extraction, spam features). Lowercased as the
    analyzer wrapping does."""
    terms = _UAX_URL_EMAIL_RE.findall(text.lower())
    return terms, list(range(len(terms)))


def classic_tokenizer(text: str) -> TokenStream:
    """`classic` tokenizer (Lucene ClassicTokenizer): like standard but
    keeps emails/hostnames whole, strips the dots from acronyms
    (U.S.A. -> usa), keeps internal-apostrophe words dropping a
    possessive trailing 's ("o'neill's" -> "o'neill"). Subset
    divergence documented: the company-name &/@ joining rule
    (AT&T) is not reproduced."""
    out: list[str] = []
    for raw in re.findall(
            f"(?:{_EMAIL_RE})|[\\w]+(?:['.&]\\w+)*", text.lower()):
        if "@" in raw:
            out.append(raw)
            continue
        if raw.endswith("'s"):
            raw = raw[:-2]
        if "." in raw:
            parts = raw.split(".")
            if all(len(p) == 1 for p in parts if p):
                raw = "".join(parts)      # acronym: U.S.A. -> usa
            # else hostname-like: keep whole
        out.append(raw)
    return out, list(range(len(out)))


def char_group_tokenizer(tokenize_on_chars: list[str]):
    """`char_group` tokenizer (CommonAnalysisPlugin CharGroupTokenizer
    registration): split on an explicit character set; the named
    classes `whitespace`/`letter`/`digit`/`punctuation`/`symbol` expand
    as in CharGroupTokenizerFactory."""
    classes = {"whitespace": r"\s", "letter": r"^\W\d_",
               "digit": r"\d", "punctuation": r"!-/:-@\[-`{-~"}
    parts = []
    for c in tokenize_on_chars:
        if c == "letter":
            raise ValueError("char_group: splitting on 'letter' unsupported")
        parts.append(classes.get(c, re.escape(c)))
    splitter = re.compile("[" + "".join(parts) + "]+")

    def fn(text: str) -> TokenStream:
        terms = [t for t in splitter.split(text.lower()) if t]
        return terms, list(range(len(terms)))

    return fn


def simple_pattern_tokenizer(pattern: str):
    """`simple_pattern` tokenizer: each regex MATCH is one token
    (SimplePatternTokenizerFactory)."""
    rx = re.compile(pattern)

    def fn(text: str) -> TokenStream:
        terms = rx.findall(text.lower())
        return terms, list(range(len(terms)))

    return fn


def simple_pattern_split_tokenizer(pattern: str):
    """`simple_pattern_split` tokenizer: the regex is the DELIMITER
    (SimplePatternSplitTokenizerFactory)."""
    rx = re.compile(pattern)

    def fn(text: str) -> TokenStream:
        terms = [t for t in rx.split(text.lower()) if t]
        return terms, list(range(len(terms)))

    return fn


def fingerprint_token_filter(max_output_size: int = 255, sep: str = " "):
    """Lucene FingerprintFilter semantics (reference: analysis-common
    CommonAnalysisPlugin `fingerprint` registrations — the analyzer is
    standard tokenize -> lowercase -> asciifold -> this filter): emit
    ONE token at position 0 holding the sorted, deduplicated input
    tokens joined by `sep`; emit nothing when the joined output would
    exceed `max_output_size` (FingerprintFilter.java skips oversized
    outputs rather than truncating)."""

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        if not terms:
            return [], []
        joined = sep.join(sorted(set(terms)))
        if len(joined) > max_output_size:
            return [], []
        return [joined], [0]

    return fn


def icu_folding(terms: list[str], positions: list[int]) -> TokenStream:
    """analysis-icu ICUFoldingFilter analogue: NFKD + combining marks
    stripped for EVERY script (asciifolding only folds into ASCII and
    leaves non-Latin text alone), then full case folding (ß -> ss,
    final sigma, etc.)."""
    out = []
    for t in terms:
        d = unicodedata.normalize("NFKD", t)
        d = "".join(ch for ch in d if not unicodedata.combining(ch))
        out.append(d.casefold())
    return out, positions


def phonetic_filter(encoder: str = "soundex", replace: bool = True):
    """analysis-phonetic plugin (PhoneticTokenFilterFactory): encode
    each token; `replace=False` emits the original alongside the code
    at the same position, as the plugin's `replace` option does."""
    if encoder != "soundex":
        raise ValueError(f"unsupported phonetic encoder {encoder!r}")
    from elasticsearch_spark.ops.text import soundex

    def fn(terms: list[str], positions: list[int]) -> TokenStream:
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            code = soundex(t)
            if not replace:
                out_t.append(t)
                out_p.append(p)
            if code:
                out_t.append(code)
                out_p.append(p)
        return out_t, out_p

    return fn


def register_extras() -> None:
    from elasticsearch_spark.analysis.analyzers import ANALYZERS

    ANALYZERS.setdefault("path_hierarchy", path_hierarchy)
    ANALYZERS.setdefault("pattern", pattern_analyzer)
    ANALYZERS.setdefault("letter", letter_tokenizer)
    ANALYZERS.setdefault("uax_url_email", uax_url_email_tokenizer)
    ANALYZERS.setdefault("classic", classic_tokenizer)
    base = ANALYZERS["standard"]
    ANALYZERS.setdefault("standard_asciifolding", compose(base, asciifolding))
    ANALYZERS.setdefault("edge_ngram", compose(base, edge_ngram_filter(1, 10)))
    ANALYZERS.setdefault("trigram", compose(base, shingle_filter(3, 3)))
    ANALYZERS.setdefault(
        "fingerprint",
        compose(compose(base, asciifolding), fingerprint_token_filter()),
    )
    ANALYZERS.setdefault("phonetic", compose(base, phonetic_filter()))
    ANALYZERS.setdefault("icu_folding", compose(base, icu_folding))
    # imported here (not only via the package __init__) so Spark
    # workers that import analyzers directly still see the mapper
    import elasticsearch_spark.analysis.annotated  # noqa: F401


register_extras()
