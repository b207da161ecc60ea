"""The /verify skill's build-and-drive recipe as a script: corpus ->
index -> query through the public API, plan-shape assertions, plus a
smoke of the newest operator surface. Exits nonzero on failure."""
import sys
import tempfile

from elasticsearch_spark import get_spark
from elasticsearch_spark.corpus import generate_corpus
from elasticsearch_spark.index import build_index
from elasticsearch_spark.index.builder import assign_doc_ids
from elasticsearch_spark.analysis import analyze
from elasticsearch_spark.search.executor import match_topk, fetch


def main() -> int:
    spark = get_spark("drive", cores=8)
    corpus = generate_corpus(spark, 300, seed=7).cache()
    idx = build_index(
        corpus, tempfile.mkdtemp(prefix="esidx_"),
        fields={"content": "code"}, num_partitions=4,
        id_cols=["repo", "path", "commit"], input_snapshot="v1",
    )
    terms = [t for t, _ in analyze("parseIndex import", "code")]
    topk = match_topk(idx, "content", terms, k=5)
    docs = assign_doc_ids(corpus, ["repo", "path", "commit"])
    rows = fetch(topk, docs).collect()
    assert len(rows) == 5, rows
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        topk.explain("formatted")
    plan = buf.getvalue()
    assert "In(term" in plan, "term filter not pushed down"
    assert "TakeOrderedAndProject" in plan, "top-k not a TakeOrdered"
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    missing = [k for k in os_ if k not in qs]
    assert not missing, f"oracles without queries: {missing}"
    print(f"DRIVE_OK rows=5 queries={len(qs)} oracles={len(os_)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
