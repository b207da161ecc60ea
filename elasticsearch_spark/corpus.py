"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Generates the engine's input table ``(repo, path, commit, lang,
content)`` — seeded, reproducible, no external data (FIXTURES.md §1):
  - repo sizes ~Zipf (skew),
  - per-lang keyword vocabulary + camelCase/snake_case identifiers
    drawn Zipf from a seeded vocab (exercises the code analyzer),
  - ultra-high-DF tokens (``import``, ``def``, ``return``) for skew,
  - token counts 10..2000 so BM25 length normalization is exercised.

Generation is DISTRIBUTED: ``spark.range(n)`` -> mapInPandas, each row
derived purely from its index via numpy.default_rng(seed + row-block) —
no driver-side materialization, scales to any n. The per-row invariant
column ``sha256 = sha2(content, 256)`` is computed JVM-side.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ["java", "python", "go", "js", "c", "rust", "md"]
LANG_WEIGHTS = np.array([0.22, 0.22, 0.12, 0.16, 0.10, 0.08, 0.10])
LANG_EXT = {
    "java": "java", "python": "py", "go": "go", "js": "js",
    "c": "c", "rust": "rs", "md": "md",
}
KEYWORDS = {
    "java": "public class void static final import return new private extends".split(),
    "python": "def return import class if else for while lambda yield".split(),
    "go": "func return import package var struct interface defer go chan".split(),
    "js": "function return import const let var class async await export".split(),
    "c": "int void return include struct static char const sizeof typedef".split(),
    "rust": "fn return use pub struct impl let mut match trait".split(),
    "md": "the a and of to in for with code example".split(),
}

_IDENT_HEADS = "get set make build parse read write find merge sort scan index query score fetch load store".split()
_IDENT_TAILS = "Buffer Index Query Token Term Doc Score Block Stats Cache Reader Writer Config Handler Stream".split()
_SNAKE_PARTS = "buf idx tok term doc score block stat cache read write cfg node list map".split()


def _vocab(rng: np.random.Generator, size: int = 2000) -> list[str]:
    """Seeded identifier vocabulary: camelCase + snake_case mixes."""
    out = []
    for i in range(size):
        style = i % 3
        if style == 0:
            out.append(
                rng.choice(_IDENT_HEADS) + rng.choice(_IDENT_TAILS) + str(rng.integers(0, 100))
            )
        elif style == 1:
            out.append(
                rng.choice(_SNAKE_PARTS) + "_" + rng.choice(_SNAKE_PARTS) + "_" + str(rng.integers(0, 100))
            )
        else:
            out.append(rng.choice(_IDENT_HEADS) + rng.choice(_SNAKE_PARTS).capitalize())
    return out


def _gen_rows(ids: np.ndarray, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(rng))
    n = ids.size
    # per-row rng derived from global seed + id -> order-independent
    row_rngs = [np.random.default_rng((seed << 20) ^ int(i)) for i in ids]
    repos, paths, commits, langs, contents = [], [], [], [], []
    zipf_cache = (1.0 / np.arange(1, vocab.size + 1) ** 1.1)
    zipf_p = zipf_cache / zipf_cache.sum()
    for i, r in zip(ids, row_rngs):
        org = int(r.zipf(1.5)) % 20
        proj = int(r.zipf(1.3)) % 50
        repos.append(f"org{org}/proj{proj}")
        lang = LANGS[int(r.choice(len(LANGS), p=LANG_WEIGHTS))]
        langs.append(lang)
        depth = int(r.integers(1, 4))
        parts = [str(vocab[int(r.integers(0, vocab.size))]).lower() for _ in range(depth)]
        fname = str(vocab[int(r.integers(0, vocab.size))])
        paths.append("/".join(["src", *parts, f"{fname}.{LANG_EXT[lang]}"]))
        commits.append("".join(f"{b:02x}" for b in r.bytes(20)))
        n_tokens = int(10 + (r.pareto(1.2) * 60)) % 2000 + 10
        kw = KEYWORDS[lang]
        kw_idx = r.integers(0, len(kw), size=n_tokens // 3)
        id_idx = r.choice(vocab.size, size=n_tokens - kw_idx.size, p=zipf_p)
        toks = np.empty(n_tokens, dtype=object)
        toks[: kw_idx.size] = [kw[j] for j in kw_idx]
        toks[kw_idx.size:] = vocab[id_idx]
        r.shuffle(toks)
        # sprinkle structure: punctuation, literals, comments
        body = []
        for j, t in enumerate(toks):
            body.append(t)
            if j % 7 == 3:
                body.append("(")
            if j % 7 == 5:
                body.append(");")
            if j % 23 == 11:
                body.append('"lit%d"' % (j % 97))
            if j % 31 == 17:
                body.append("// note")
        contents.append(" ".join(body))
    return pd.DataFrame(
        {
            "id": ids,
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
        }
    )


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of n_docs source files."""
    partitions = partitions or max(1, min(n_docs // 1000, 64))
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy(), seed)

    schema = "id long, repo string, path string, commit string, lang string, content string"
    df = base.mapInPandas(gen, schema=schema)
    # per-row invariant (input_hint): sha256 of content, JVM-side
    return df.withColumn("sha256", F.sha2(F.col("content"), 256))
