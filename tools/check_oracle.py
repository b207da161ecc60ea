"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark at sf0.01 and the
matching oracle_sql() on DuckDB over the same parquet tables; compares
row count, column names, and an order-insensitive canonical value hash.

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str, pd.DataFrame]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = []
    for tup in df.itertuples(index=False):
        parts = []
        for v in tup:
            if isinstance(v, float):
                # Match the driver's canonicalization: plain str(), so an
                # int-typed Spark column vs a float-typed oracle column
                # hashes differently ("15000" vs "15000.0").  %.9g used to
                # collapse exactly that divergence and masked driver reds.
                if math.isnan(v):
                    parts.append("NaN")
                else:
                    parts.append(str(float(v)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h, df


def main() -> int:
    import __spark_entry__ as entry_mod
    from elasticsearch_spark.session import get_spark

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spark = get_spark("check_oracle", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"WEAK {name}: rows={len(got)} (no oracle, rows-only check)")
            n_weak += 1
            continue
        try:
            want = con.execute(os_[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        gn, gc, gh, gdf = canon(got)
        wn, wc, wh, wdf = canon(want)
        dt = time.time() - t0
        if gn == wn and gc == wc and gh == wh:
            print(f"PASS {name}: rows={gn} cols={gc} ({dt:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {gn} vs {wn}; cols {gc} vs {wc}; hash {gh[:8]} vs {wh[:8]}")
            if gn and wn:
                merged = gdf.merge(wdf, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(12).to_string())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
