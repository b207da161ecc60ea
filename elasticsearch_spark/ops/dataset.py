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
           "pack_sequences_sql"]


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
