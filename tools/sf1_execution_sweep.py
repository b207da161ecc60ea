"""Execute EVERY contract query at a given scale factor and time it.

Correctness is certified against DuckDB at sf0.01 (tools/
check_oracle.py); this sweep answers the orthogonal scale question —
does any of the 305 declared queries go pathological at 10x data? Each
query runs once to the noop sink (computation only, guide §1.4) with
its wall time recorded; the report lists every query over a threshold.

Usage: python tools/sf1_execution_sweep.py [sf_dir] [slow_threshold_s]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry
    from elasticsearch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    slow = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    spark = get_spark("sf1_sweep")
    qs = entry.queries()
    times: dict[str, float] = {}
    failures: list[str] = []
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sf1_sweep: {name}")
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
            print(f"ok   {name}: {times[name]}s", flush=True)
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
            print(f"FAIL {name}: {ex}", flush=True)
            traceback.print_exc(limit=3)
        spark.sparkContext.setJobDescription(None)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_ok": len(times),
        "n_fail": len(failures),
        "total_sec": round(sum(times.values()), 1),
        "over_threshold": [kv for kv in ranked if kv[1] >= slow],
        "top10": ranked[:10],
        "failures": failures,
    }, indent=2))


if __name__ == "__main__":
    main()
