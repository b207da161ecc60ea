"""Round-6 optimization measurements (guide §1): noop-sink isolation of
headline-query stages, labeled jobs, per-stage dedup profiling.

NOT the driver's bench — bench.py is frozen.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py dedup
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py headline
    python bench_extra.py plans          # dump explain(formatted) per query

Numbers are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPEATS = 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(label: str, spark, thunk, repeats: int = REPEATS) -> float:
    spark.sparkContext.setJobDescription(label)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        thunk()
        ts.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)
    best = min(ts)
    print(f"  {label:45s} best={best:7.3f}s  med={statistics.median(ts):7.3f}s")
    return best


def profile_dedup(spark, sf_dir: str) -> None:
    """Stage-by-stage minhash_lsh_pairs profile, noop sink each stage."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"dedup_minhash_lsh stages at {sf_dir} (best of {REPEATS}):")
    _time("read+project", spark, lambda: _noop(docs.select("doc_id", "text")))
    sh = dedup.word_shingles(docs, "text", "doc_id", 2)
    _time("shingles (explode)", spark, lambda: _noop(sh))
    sig = dedup.minhash_signatures(docs, "text", "doc_id", 2, 64)
    _time("signatures (explode+agg64)", spark, lambda: _noop(sig))
    pairs = dedup.minhash_lsh_pairs(docs, k=2, n_hashes=64, bands=32)
    _time("full pipeline (pairs+distinct)", spark, lambda: _noop(pairs))
    n = pairs.count()
    print(f"  candidate pairs: {n}")


def profile_dedup_fine(spark, sf_dir: str) -> None:
    """Sub-stage split of the bucketed LSH pipeline past signatures."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops import dedup

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    k, n_hashes, bands = 2, 64, 32
    rows = n_hashes // bands
    sig = dedup.minhash_signatures(docs, "text", "doc_id", k, n_hashes)
    band_cols = [
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col("doc_id"), *band_cols)
    stacked = banded.select(
        F.col("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_hash"))
            for b in range(bands)
        ])).alias("bd"),
    ).select("doc_id", "bd.band_id", "bd.band_hash")
    buckets = (
        stacked.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_set(F.col("doc_id"))).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= 1000))
    )
    ids = F.col("ids")
    pairs_expr = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.sequence(i + 1, F.size(ids) - 1),
            lambda j: F.struct(F.get(ids, i).alias("id_a"),
                               F.get(ids, j).alias("id_b")),
        ),
    ))
    pre = buckets.select(F.explode(pairs_expr).alias("p")).select(
        "p.id_a", "p.id_b")
    print(f"dedup fine stages at {sf_dir} (best of {REPEATS}):")
    _time("banded stacked rows", spark, lambda: _noop(stacked))
    _time("buckets (collect_set+filter)", spark, lambda: _noop(buckets))
    _time("pairs pre-distinct (explode)", spark, lambda: _noop(pre))
    _time("pairs distinct", spark, lambda: _noop(pre.distinct()))
    n_pre = pre.count()
    n_post = pre.distinct().count()
    print(f"  pre-distinct rows: {n_pre}, distinct pairs: {n_post}")


def profile_headline(spark, sf_dir: str) -> None:
    """Per-query noop-sink timing of each headline entry (computation
    only; bench.py's .collect() additionally pays driver transfer)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "match_or", "match_and", "match_phrase", "match_k50",
        "msearch_batch", "bool_match_filter", "agg_terms_metrics",
        "agg_date_histogram", "agg_histogram", "agg_top_hits",
        "dedup_minhash_lsh", "ann_cosine_batch", "text_fingerprint",
    ]
    print(f"headline queries at {sf_dir} (noop sink, best of {REPEATS}):")
    total = 0.0
    for name in names:
        fn = qs[name]
        _noop(fn(spark, sf_dir))  # warmup + index build
        total += _time(name, spark, lambda: _noop(fn(spark, sf_dir)))
    print(f"  TOTAL {total:.3f}s")


def dump_plans(spark, sf_dir: str, suffix: str) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "match_or", "match_and", "match_phrase", "match_k50",
        "msearch_batch", "bool_match_filter", "agg_terms_metrics",
        "agg_date_histogram", "agg_histogram", "agg_top_hits",
        "dedup_minhash_lsh", "ann_cosine_batch", "text_fingerprint",
    ]
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"  wrote {name}_{suffix}.txt")


def main() -> None:
    from elasticsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", cores=cpus)
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if mode == "dedup":
        profile_dedup(spark, sf_dir)
    elif mode == "dedup_fine":
        profile_dedup_fine(spark, sf_dir)
    elif mode == "headline":
        profile_headline(spark, sf_dir)
    elif mode == "plans":
        dump_plans(spark, sf_dir, sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
