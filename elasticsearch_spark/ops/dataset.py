"""Training-dataset assembly ops: deterministic splits + sequence
packing.

Not reference operators — these belong to the large-scale
training-data pipeline mandate (the corpus this engine indexes is also
the corpus a training run consumes). Both ops are pure Catalyst
expressions with exact DuckDB twins (portable md5-based hashing and
window arithmetic — no RNG, no Python), so they are oracle-checkable
and reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dataset_split", "dataset_split_sql", "pack_sequences",
           "pack_sequences_sql", "chunk_documents", "chunk_documents_sql"]


def _bucket_expr(id_col: str, seed: str):
    """Deterministic uniform bucket in [0, 1e6) from md5(id || seed) —
    the SAME text both engines hash, so split membership is portable
    and stable under repartition/insertion order."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"),
                                   F.lit(seed))), 1, 8),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(1_000_000))


def dataset_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic train/val/test split.

    ``weights`` name->fraction (must sum to ~1). The bucket is a pure
    function of (id, seed): adding or removing OTHER rows never moves a
    row between splits (critical for incremental corpora — a reshuffled
    random split leaks val into train across snapshots). Skew-free and
    shuffle-free: one projection."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _bucket_expr(id_col, seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < int(round(acc * 1_000_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def dataset_split_sql(
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "",
) -> str:
    """DuckDB twin of the split expression (same md5 text, same
    thresholds)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = (f"(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '{seed}'),"
         f" 1, 8))::BIGINT % 1000000)")
    items = list(weights.items())
    acc = 0.0
    cases = []
    for name, w in items[:-1]:
        acc += w
        cases.append(f"WHEN {b} < {int(round(acc * 1_000_000))} "
                     f"THEN '{name}'")
    return ("CASE " + " ".join(cases)
            + f" ELSE '{items[-1][0]}' END")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    max_tokens: int,
    order_col: str = "doc_id",
    partition_col: str | None = None,
    out_col: str = "pack_id",
) -> DataFrame:
    """Sequence packing: group documents into bins targeting
    ``max_tokens`` tokens for context-window assembly.

    Deterministic streaming first-fit in ``order_col`` order:
    bin = floor(exclusive-cumulative-tokens / max_tokens). A bin may
    overshoot by at most one document (documents are never split;
    a doc longer than max_tokens owns its bins' span) — the standard
    shuffle-free packing approximation; exact bin-packing is NP-hard
    and order-dependent.

    With ``partition_col`` the cumulative sum runs per partition value
    (bins never span partitions and the window shuffles by that key);
    without it the window is global — fine for coordinator-scale
    frames, but at corpus scale ALWAYS pass a partition key (e.g. a
    date or shard column), otherwise the plan degenerates to a
    single-task sort."""
    w = (Window.partitionBy(partition_col) if partition_col
         else Window.partitionBy())
    w = w.orderBy(F.asc(order_col)).rowsBetween(
        Window.unboundedPreceding, -1)
    cum_excl = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(w), F.lit(0))
    return df.withColumn(
        out_col, F.floor(cum_excl / F.lit(int(max_tokens))).cast("long"))


def pack_sequences_sql(
    token_col: str,
    max_tokens: int,
    order_col: str = "doc_id",
    partition_col: str | None = None,
) -> str:
    """DuckDB twin of the pack expression."""
    part = f"PARTITION BY {partition_col} " if partition_col else ""
    return (
        f"CAST(floor(coalesce(sum({token_col}) OVER ({part}"
        f"ORDER BY {order_col} ASC ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND 1 PRECEDING), 0) / {int(max_tokens)}) AS BIGINT)"
    )


def chunk_documents(
    df: DataFrame,
    size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping word-window chunks — the
    semantic_text-style chunking step in front of embedding / inference
    (reference analogue: the inference processor's chunking settings).

    Chunks start every ``size - overlap`` words until the remaining
    tail is fully covered; the last chunk may be shorter. Pure Catalyst
    (regexp tokenize + sequence + slice inside one projection): chunking
    N docs is one narrow map stage — no shuffle, no UDF — so it
    pipelines straight into whatever consumes the chunks at 100 TB.

    Returns (id, chunk_id, n_tokens, chunk) with chunk_id counting from
    0 in document order and chunk = the space-joined word window
    (whitespace runs collapse — documented, offsets are word-level not
    byte-level)."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    toks = F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")
    from elasticsearch_spark.spread import spread_input

    d = spread_input(df).select(F.col(id_col), toks.alias("_toks"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("_toks") - overlap - 1, F.lit(0)),
        F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / F.lit(stride)).cast("int").alias("chunk_id"),
            F.slice(F.col("_toks"), s + 1, size).alias("w"),
        ),
    )
    return (
        d.where(F.size("_toks") > 0)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_id"),
            F.size("c.w").alias("n_tokens"),
            F.array_join("c.w", " ").alias("chunk"),
        )
    )


def chunk_documents_sql(
    size: int = 128,
    overlap: int = 32,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same tokenizer regex,
    same stride/window arithmetic)."""
    stride = size - overlap
    return f"""
WITH t AS (
  SELECT {id_col}, regexp_extract_all({text_col}, '\\S+') AS toks
  FROM {table}),
s AS (
  SELECT {id_col}, toks,
         unnest(range(0, greatest(len(toks) - {overlap}, 1), {stride}))
           AS st
  FROM t WHERE len(toks) > 0)
SELECT {id_col},
       (st // {stride})::INT AS chunk_id,
       len(list_slice(toks, st + 1, st + {size}))::INT AS n_tokens,
       array_to_string(list_slice(toks, st + 1, st + {size}), ' ')
         AS chunk
FROM s
"""


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
    default_rate: float = 1.0,
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic corpus MIXING: per-group sampling rates, with
    upsampling (rate > 1 emits floor(rate) copies plus a
    fractional-probability extra copy).

    The training-mixture op (e.g. "2x wikipedia, 0.3x commoncrawl"):
    membership and copy count are pure functions of (id, seed) via the
    same md5 bucket :func:`dataset_split` uses, so a re-run over a
    grown corpus never resamples old rows — required when mixtures are
    versioned against incremental crawls. Shuffle-free: one projection
    plus an explode for the copy index; never a driver-side sample()
    (Spark's sampleBy is partition-order dependent and not portable to
    the SQL twin).

    Emitted rows carry ``copy_col`` (1..n) so downstream packing can
    shuffle copies apart."""
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("sampling rates must be >= 0")
    bucket = _bucket_expr(id_col, "mix:" + seed)
    rate = F.lit(float(default_rate))
    for name, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == name, F.lit(float(r))).otherwise(rate)
    whole = F.floor(rate).cast("int")
    frac = rate - F.floor(rate)
    extra = (bucket < (frac * 1_000_000).cast("long")).cast("int")
    n = (whole + extra).alias("_n_copies")
    return (
        df.withColumn("_n_copies", n)
        .where(F.col("_n_copies") >= 1)
        .withColumn(copy_col,
                    F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def stratified_sample_sql(
    table: str,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
    default_rate: float = 1.0,
    copy_col: str = "copy_id",
) -> str:
    """DuckDB twin of :func:`stratified_sample` (same md5 text, same
    thresholds; copies via generate_series)."""
    b = (f"(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || 'mix:{seed}'),"
         f" 1, 8))::BIGINT % 1000000)")
    rate = f"{float(default_rate)!r}"
    for name, r in sorted(rates.items(), reverse=True):
        rate = (f"CASE WHEN {group_col} = '{name}' THEN {float(r)!r} "
                f"ELSE {rate} END")
    return f"""
SELECT * EXCLUDE (_n_copies),
       unnest(generate_series(1, _n_copies))::INT AS {copy_col}
FROM (
  SELECT *,
         (floor({rate})::INT
          + CASE WHEN {b} < CAST(({rate} - floor({rate})) * 1000000
                             AS BIGINT)
                 THEN 1 ELSE 0 END) AS _n_copies
  FROM {table}) t
"""
