"""Async search (x-pack/plugin/async-search).

submit() starts the search's materialization off the caller's thread
and returns an id; status()/get() poll it; delete() cancels via Spark
job-group cancellation (the reference's DELETE /_async_search/{id}).
The reference streams partial reduction states; Spark materializes per
job, so `is_partial` flips false at completion — the polling contract
(submit -> is_running -> response) is preserved.
"""

from __future__ import annotations

import threading
import uuid
from concurrent.futures import Future, ThreadPoolExecutor

from pyspark.sql import DataFrame

_pool = ThreadPoolExecutor(max_workers=4)
_jobs: dict[str, tuple[Future, str]] = {}
_lock = threading.Lock()


def submit(df: DataFrame, wait_for_completion_sec: float = 0.0) -> dict:
    """Kick off df.collect() in the background; mirror of POST
    /_async_search (wait_for_completion_timeout)."""
    sid = uuid.uuid4().hex[:16]
    spark = df.sparkSession
    group = f"async-search-{sid}"

    def run():
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", group)
        try:
            return df.collect()
        finally:
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    fut = _pool.submit(run)
    with _lock:
        _jobs[sid] = (fut, group)
    if wait_for_completion_sec:
        try:
            fut.result(timeout=wait_for_completion_sec)
        except Exception:
            pass
    return status(sid)


def status(sid: str) -> dict:
    fut, _ = _jobs[sid]
    return {"id": sid, "is_running": not fut.done(),
            "is_partial": not fut.done()}


def get(sid: str, wait_sec: float | None = None) -> dict:
    fut, _ = _jobs[sid]
    rows = fut.result(timeout=wait_sec)
    return {"id": sid, "is_running": False, "is_partial": False,
            "hits": rows}


def delete(sid: str, spark) -> None:
    with _lock:
        fut, group = _jobs.pop(sid)
    fut.cancel()
    spark.sparkContext.cancelJobGroup(group)
