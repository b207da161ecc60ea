"""Verify ArrowCollectDataFrame.collect() returns EXACTLY what the
classic pickle collect() returns, for every contract query at sf0.01.

Both paths execute the same plan; only the JVM->Python transfer
differs, so rows must match value-for-value and type-for-type
(order-insensitively — unordered queries may legally enumerate
partitions differently between two executions).

Usage:  python tools/check_collect_parity.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    """Hashable, NaN-stable normal form of one value (type-tagged)."""
    if isinstance(v, float) and math.isnan(v):
        return ("float", "nan")
    if isinstance(v, (list, tuple)):
        return (type(v).__name__, tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("dict", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return (type(v).__name__, v)


def main() -> None:
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    import __spark_entry__ as entry
    from elasticsearch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("collect_parity")
    qs = entry.queries()
    n_pass = n_fail = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            arrow_rows = df.collect()              # ArrowCollectDataFrame path
            classic_rows = ClassicDF.collect(df)   # base pickle path
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            failures.append(f"{name}: EXEC {type(ex).__name__}: {ex}")
            print(f"FAIL {name} (exec): {ex}")
            continue
        ok = len(arrow_rows) == len(classic_rows)
        if ok:
            a_fields = [tuple(r.__fields__) for r in arrow_rows[:1]]
            c_fields = [tuple(r.__fields__) for r in classic_rows[:1]]
            ok = a_fields == c_fields
        if ok:
            a_sorted = sorted((_norm(tuple(r)) for r in arrow_rows), key=repr)
            c_sorted = sorted((_norm(tuple(r)) for r in classic_rows), key=repr)
            ok = a_sorted == c_sorted
        if ok:
            n_pass += 1
            print(f"ok   {name} ({len(arrow_rows)} rows)")
        else:
            n_fail += 1
            failures.append(f"{name}: MISMATCH")
            print(f"FAIL {name}: rows {len(arrow_rows)} vs {len(classic_rows)}")
    print(f"\ncollect parity: {n_pass} pass / {n_fail} fail")
    for f in failures:
        print(" ", f)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
