"""Randomized percolator fuzz: generated DSL trees evaluated three
ways — the set-algebra fast path, the compiled verify path, and an
independent pure-Python reference evaluator — must agree on every
(doc, query) pair. This is the differential test for the percolator's
semantic table (tokens, msm clause counting, ES NULL semantics,
sloppy windows, bool algebra)."""
from __future__ import annotations

import re

import numpy as np
import pytest

from elasticsearch_spark.search.percolate import percolate_verified

VOCAB = ["fast", "table", "scan", "merge", "index", "shard", "query",
         "spark", "row", "data"]
LANGS = ["en", "de", "fr", None]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _wc_regex(pat: str) -> str:
    out = []
    for ch in pat:
        out.append(".*" if ch == "*" else "." if ch == "?"
                   else re.escape(ch))
    return "".join(out)


def py_matches(dsl: dict, doc: dict) -> bool:
    """Reference evaluator: the percolator's documented semantics,
    written independently of both Spark paths."""
    (kind, body), = dsl.items()

    def toks(field):
        v = doc.get(field)
        if field == "lang":
            return [] if v is None else [str(v).lower()]
        return [] if v is None else re.findall(r"[a-z0-9_]+", v.lower())

    if kind == "match_all":
        return True
    if kind == "match_none":
        return False
    if kind in ("constant_score", "function_score", "boosting"):
        inner = (body.get("query") if kind == "function_score"
                 else body.get("filter") if kind == "constant_score"
                 else body.get("positive"))
        return py_matches(inner, doc)
    if kind == "ids":
        return doc["doc_id"] in body["values"]
    if kind == "term":
        (f, v), = body.items()
        v = v["value"] if isinstance(v, dict) else v
        if f == "score":
            return doc.get(f) is not None and float(doc[f]) == float(v)
        return str(v).lower() in toks(f)
    if kind == "terms":
        (f, vs), = body.items()
        return any(str(v).lower() in toks(f) for v in vs)
    if kind == "match":
        (f, spec), = body.items()
        text = spec["query"] if isinstance(spec, dict) else spec
        op = spec.get("operator", "or") if isinstance(spec, dict) else "or"
        msm = (spec.get("minimum_should_match")
               if isinstance(spec, dict) else None)
        qt = list(dict.fromkeys(re.findall(r"[a-z0-9_]+", text.lower())))
        if msm is None:
            msm = len(qt) if op == "and" else 1
        if not qt:
            return False
        return len(set(qt) & set(toks(f))) >= int(msm)
    if kind == "match_phrase":
        (f, spec), = body.items()
        text = spec["query"] if isinstance(spec, dict) else spec
        slop = int(spec.get("slop", 0)) if isinstance(spec, dict) else 0
        qt = re.findall(r"[a-z0-9_]+", text.lower())
        if not qt:
            return False
        ts = toks(f)
        pos = [[p for p, t in enumerate(ts) if t == q] for q in qt]
        if any(not p for p in pos):
            return False
        import itertools

        for combo in itertools.product(*pos):
            # repeated terms must sit at distinct positions
            if any(qt[i] == qt[j] and combo[i] == combo[j]
                   for i in range(len(qt))
                   for j in range(i + 1, len(qt))):
                continue
            shifted = [p - i for i, p in enumerate(combo)]
            if max(shifted) - min(shifted) <= slop:
                return True
        return False
    if kind == "prefix":
        (f, v), = body.items()
        v = v["value"] if isinstance(v, dict) else v
        return any(t.startswith(str(v).lower()) for t in toks(f))
    if kind == "wildcard":
        (f, v), = body.items()
        v = v["value"] if isinstance(v, dict) else v
        rx = re.compile(_wc_regex(str(v).lower()))
        return any(rx.fullmatch(t) for t in toks(f))
    if kind == "regexp":
        (f, v), = body.items()
        v = v["value"] if isinstance(v, dict) else v
        return any(re.fullmatch(v, t) for t in toks(f))
    if kind == "fuzzy":
        (f, spec), = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        fz = int(spec.get("fuzziness", 2)) if isinstance(spec, dict) else 2
        return any(_levenshtein(t, str(v).lower()) <= fz for t in toks(f))
    if kind == "exists":
        f = body["field"]
        if f == "score":
            return doc.get(f) is not None
        return bool(toks(f))
    if kind == "range":
        (f, b), = body.items()
        v = doc.get(f)
        if v is None:
            return False
        v = float(v)
        ok = True
        if "gte" in b:
            ok &= v >= float(b["gte"])
        if "gt" in b:
            ok &= v > float(b["gt"])
        if "lte" in b:
            ok &= v <= float(b["lte"])
        if "lt" in b:
            ok &= v < float(b["lt"])
        return ok
    if kind == "bool":
        clauses = [py_matches(q, doc)
                   for q in list(body.get("must") or [])
                   + list(body.get("filter") or [])]
        should = list(body.get("should") or [])
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                msm = 0 if clauses else 1
            if int(msm) > 0:
                clauses.append(
                    sum(py_matches(q, doc) for q in should) >= int(msm))
        for q in body.get("must_not") or []:
            clauses.append(not py_matches(q, doc))
        return all(clauses) if clauses else True
    raise AssertionError(kind)


def _gen_query(rng: np.random.Generator, depth: int = 0) -> dict:
    kinds = ["term", "terms", "match", "match_phrase", "prefix",
             "wildcard", "regexp", "fuzzy", "exists", "range", "ids",
             "kw_term"]
    if depth < 2:
        kinds += ["bool", "bool", "bool", "wrapperish"]
    kind = rng.choice(kinds)
    w = lambda: str(rng.choice(VOCAB))  # noqa: E731
    if kind == "term":
        return {"term": {"text": w()}}
    if kind == "kw_term":
        return {"term": {"lang": str(rng.choice(["en", "de", "fr", "zz"]))}}
    if kind == "terms":
        return {"terms": {"text": [w() for _ in range(
            int(rng.integers(1, 4)))]}}
    if kind == "match":
        n = int(rng.integers(1, 4))
        spec = {"query": " ".join(w() for _ in range(n))}
        if rng.random() < 0.4:
            spec["operator"] = "and"
        elif rng.random() < 0.4:
            spec["minimum_should_match"] = int(rng.integers(1, n + 1))
        return {"match": {"text": spec}}
    if kind == "match_phrase":
        n = int(rng.integers(2, 4))
        return {"match_phrase": {"text": {
            "query": " ".join(w() for _ in range(n)),
            "slop": int(rng.integers(0, 4))}}}
    if kind == "prefix":
        return {"prefix": {"text": w()[:int(rng.integers(1, 4))]}}
    if kind == "wildcard":
        t = w()
        pat = t[:2] + "*" if rng.random() < 0.5 else t[:1] + "?" + t[2:]
        return {"wildcard": {"text": pat}}
    if kind == "regexp":
        return {"regexp": {"text": f"{w()}|{w()}"}}
    if kind == "fuzzy":
        t = w()
        return {"fuzzy": {"text": {"value": t[:-1] + "x",
                                   "fuzziness": int(rng.integers(1, 3))}}}
    if kind == "exists":
        return {"exists": {"field": str(rng.choice(
            ["text", "lang", "score"]))}}
    if kind == "range":
        lo = float(rng.integers(0, 60))
        return {"range": {"score": {"gte": lo, "lt": lo + 35.0}}}
    if kind == "ids":
        return {"ids": {"values": [int(i) for i in
                                   rng.integers(0, 60, size=3)]}}
    if kind == "wrapperish":
        wrap = str(rng.choice(["constant_score", "function_score",
                               "boosting"]))
        inner = _gen_query(rng, depth + 1)
        key = {"constant_score": "filter", "function_score": "query",
               "boosting": "positive"}[wrap]
        return {wrap: {key: inner}}
    # bool
    b: dict = {}
    for section in ("must", "should", "must_not"):
        if rng.random() < (0.7 if section == "must" else 0.45):
            b[section] = [_gen_query(rng, depth + 1)
                          for _ in range(int(rng.integers(1, 3)))]
    if not b:
        b["must"] = [_gen_query(rng, depth + 1)]
    if "should" in b and rng.random() < 0.7:
        b["minimum_should_match"] = int(
            rng.integers(1, len(b["should"]) + 1))
    return {"bool": b}


@pytest.mark.parametrize("seed", [11, 23])
def test_percolate_fuzz_three_way(spark, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(60):
        if rng.random() < 0.06:
            text = None
        else:
            text = " ".join(rng.choice(VOCAB,
                                       size=int(rng.integers(1, 12))))
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        score = (None if rng.random() < 0.08
                 else float(rng.integers(0, 100)))
        rows.append((i, text, lang, score))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, score double")

    stored = [(qid, _gen_query(rng)) for qid in range(30)]
    expected = sorted(
        (doc_id, qid)
        for doc_id, text, lang, score in rows
        for qid, dsl in stored
        if py_matches(dsl, {"doc_id": doc_id, "text": text,
                            "lang": lang, "score": score}))

    kw = dict(text_fields=["text"], keyword_fields=["lang"],
              numeric_fields=["score"])
    ver = percolate_verified(spark, docs, stored, mode="verify", **kw)
    assert sorted((r["doc_id"], r["query_id"])
                  for r in ver.collect()) == expected
    auto = percolate_verified(spark, docs, stored, **kw)
    assert sorted((r["doc_id"], r["query_id"])
                  for r in auto.collect()) == expected
