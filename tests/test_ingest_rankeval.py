"""Ingest pipeline processors + rank-eval metrics."""

from __future__ import annotations

import math

import pytest

from elasticsearch_spark.ops.ingest import apply_pipeline
from elasticsearch_spark.search import rank_eval as re_


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "2024-01-02 03:04:05 INFO 10.0.0.1 GET /index size=42 q=spark",
         " Hello <b>World</b> ", "a,b,c"),
        (2, "2024-02-03 04:05:06 ERROR 10.0.0.2 POST /bulk size=7 q=data",
         "x <i>y</i> z", "d,e,f"),
    ]
    return spark.createDataFrame(rows, "id int, line string, html string, csvf string")


def test_pipeline_chain(logs):
    out = apply_pipeline(
        logs,
        [
            {"grok": {"field": "line", "patterns": [
                "%{NOTSPACE:date} %{NOTSPACE:time} %{LOGLEVEL:level} %{IP:ip} "
                "%{WORD:verb} %{NOTSPACE:path} size=%{INT:size} q=%{WORD:query}"
            ]}},
            {"convert": {"field": "size", "type": "integer"}},
            {"lowercase": {"field": "verb"}},
            {"set": {"field": "pipeline", "value": "v1"}},
            {"html_strip": {"field": "html", "target_field": "clean"}},
            {"trim": {"field": "clean"}},
            {"split": {"field": "csvf", "separator": ",", "target_field": "arr"}},
            {"join": {"field": "arr", "separator": "-", "target_field": "joined"}},
            {"gsub": {"field": "path", "pattern": "^/", "replacement": ""}},
            {"fingerprint": {"fields": ["ip", "verb"], "target_field": "fp"}},
            {"script": {"target_field": "dt", "source": "concat(date, ' ', time)"}},
            {"date": {"field": "dt", "formats": ["yyyy-MM-dd HH:mm:ss"],
                       "target_field": "ts"}},
            {"script": {"target_field": "size2", "source": "size * 2"}},
        ],
    ).orderBy("id").collect()
    r = out[0]
    assert r["level"] == "INFO" and r["ip"] == "10.0.0.1"
    assert r["verb"] == "get" and r["path"] == "index"
    assert r["size"] == 42 and r["size2"] == 84
    assert r["pipeline"] == "v1"
    assert r["clean"] == "Hello World"
    assert r["joined"] == "a-b-c"
    assert len(r["fp"]) == 64
    assert str(r["ts"]).startswith("2024-01-02 03:04:05")


def test_dissect_and_kv(spark):
    df = spark.createDataFrame(
        [("alice-42@example", "k1=v1 k2=v2")], "s string, kv string"
    )
    out = apply_pipeline(
        df,
        [
            {"dissect": {"field": "s", "pattern": "%{user}-%{num}@%{domain}"}},
            {"kv": {"field": "kv", "field_split": " ", "value_split": "=",
                     "target_field": "m"}},
        ],
    ).collect()[0]
    assert out["user"] == "alice" and out["num"] == "42" and out["domain"] == "example"
    assert out["m"] == {"k1": "v1", "k2": "v2"}


def test_csv_rename_remove_append(spark):
    df = spark.createDataFrame([("1,foo,9.5", ["x"])], "row string, tags array<string>")
    out = apply_pipeline(
        df,
        [
            {"csv": {"field": "row", "target_fields": ["a", "b", "c"]}},
            {"rename": {"field": "a", "target_field": "ident"}},
            {"append": {"field": "tags", "values": ["y", "z"]}},
            {"remove": {"field": "row"}},
        ],
    ).collect()[0]
    assert out["ident"] == "1" and out["b"] == "foo"
    assert out["tags"] == ["x", "y", "z"]
    assert "row" not in out.asDict()


# ---- rank eval ----

def test_precision_recall_mrr():
    ranked = [1, 2, 3, 4]
    rel = {2, 4, 9}
    assert re_.precision_at_k(ranked, rel, 4) == 0.5
    assert math.isclose(re_.recall_at_k(ranked, rel, 4), 2 / 3)
    assert re_.mean_reciprocal_rank(ranked, rel) == 0.5


def test_ndcg_perfect_is_one():
    gains = {1: 3.0, 2: 2.0, 3: 1.0}
    assert math.isclose(re_.ndcg_at_k([1, 2, 3], gains), 1.0)
    assert re_.ndcg_at_k([3, 2, 1], gains) < 1.0


def test_err_orders():
    gains = {1: 3.0, 2: 0.0}
    assert re_.err_at_k([1, 2], gains) > re_.err_at_k([2, 1], gains)


def test_evaluate_means():
    results = {"q1": [1, 2], "q2": [3]}
    judg = {"q1": {1: 1.0}, "q2": {9: 1.0}}
    out = re_.evaluate(results, judg, k=10)
    assert out["q1"]["precision"] == 0.5
    assert out["q2"]["recall"] == 0.0
    assert math.isclose(out["_mean"]["mrr"], 0.5)


def test_foreach_urldecode_bytes_drop(spark):
    df = spark.createDataFrame(
        [(["A", " b "], "a%20b%2Fc", "2kb", 1), (["C"], "x", "3mb", 2)],
        "tags array<string>, url string, sz string, id int",
    )
    out = apply_pipeline(
        df,
        [
            {"foreach": {"field": "tags", "processor": {"lowercase": {}}}},
            {"urldecode": {"field": "url", "target_field": "decoded"}},
            {"bytes": {"field": "sz", "target_field": "nbytes"}},
            {"drop": {"if": "id = 2"}},
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tags"] == ["a", " b "]
    assert r["decoded"] == "a b/c"
    assert r["nbytes"] == 2048


def test_dot_expander(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "a.b"])
    out = apply_pipeline(df, [{"dot_expander": {"field": "a.b"}}]).collect()[0]
    assert out["a"]["b"] == "x"


def test_sort_dedupe_uri_registered_domain(spark):
    df = spark.createDataFrame(
        [(1, [3, 1, 2, 1], "https://sub.example.com:8080/a/b?x=1#frag")],
        ["id", "arr", "url"],
    )
    out = apply_pipeline(df, [
        {"dedupe": {"field": "arr"}},
        {"sort": {"field": "arr", "order": "asc"}},
        {"uri_parts": {"field": "url", "target_field": "u"}},
        {"registered_domain": {"field": "host",
                                "target_field": "reg"}},
    ][:3]).collect()[0]
    assert out["arr"] == [1, 2, 3]
    assert out["u"]["scheme"] == "https"
    assert out["u"]["domain"] == "sub.example.com"
    assert out["u"]["path"] == "/a/b"
    assert out["u"]["query"] == "x=1"
    assert out["u"]["fragment"] == "frag"
    df2 = spark.createDataFrame([(1, "sub.example.co",), (2, "example.com",),
                                  (3, "localhost",)], ["id", "host"])
    regs = {
        r["id"]: r["reg"]
        for r in apply_pipeline(
            df2, [{"registered_domain": {"field": "host", "target_field": "reg"}}]
        ).collect()
    }
    assert regs == {1: "example.co", 2: "example.com", 3: "localhost"}


def test_community_id_matches_reference_impl(spark):
    """Spark community_id == a direct Python implementation of the
    community-id v1 spec (seeded sha1 over the ordered flow tuple)."""
    import base64
    import hashlib
    import socket
    import struct

    def ref_cid(seed, sip, dip, proto, sp, dp):
        a = (socket.inet_aton(sip), sp)
        b = (socket.inet_aton(dip), dp)
        if a > b:
            a, b = b, a
        data = (
            struct.pack("!H", seed) + a[0] + b[0]
            + struct.pack("BB", proto, 0)
            + struct.pack("!HH", a[1], b[1])
        )
        return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()

    rows = [
        (1, "1.2.3.4", "5.6.7.8", 1122, 3344),
        (2, "10.0.0.2", "10.0.0.1", 80, 1024),
        (3, "192.168.1.1", "192.168.1.1", 5, 5),
    ]
    df = spark.createDataFrame(rows, ["id", "sip", "dip", "sp", "dp"])
    out = apply_pipeline(df, [{"community_id": {
        "source_ip": "sip", "destination_ip": "dip",
        "source_port": "sp", "destination_port": "dp",
        "iana_number": 6, "seed": 0,
    }}]).collect()
    for r in out:
        row = next(x for x in rows if x[0] == r["id"])
        assert r["community_id"] == ref_cid(0, row[1], row[2], 6, row[3], row[4])


# --- lookup-backed processors (round 4) ------------------------------


def test_enrich_processor(spark):
    from elasticsearch_spark.ops import ingest as ing

    users = spark.createDataFrame(
        [("alice", "eng", "berlin"), ("bob", "ops", "tokyo"),
         ("alice", "zz", "zz")],  # dup key: dedupe keeps the min tuple
        "login string, team string, city string")
    ing.register_enrich_policy("users", users, "login", ["team", "city"])
    docs = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "carol")], "id int, author string")
    out = ing.apply_pipeline(docs, [
        {"enrich": {"policy_name": "users", "field": "author",
                    "target_field": "user"}},
    ]).orderBy("id").collect()
    assert out[0]["user"]["team"] == "eng"
    assert out[0]["user"]["city"] == "berlin"
    assert out[1]["user"]["city"] == "tokyo"
    assert out[2]["user"] is None  # no match -> null struct (left join)


def test_geoip_processor(spark):
    from elasticsearch_spark.ops import ingest as ing

    db = spark.createDataFrame(
        [("10.0.0.0/8", "XA", "Privateland"),
         ("192.168.4.0/22", "XB", "Subnetia"),
         ("203.0.113.0/24", "XC", "Testrange")],
        "network string, country_iso_code string, country_name string")
    ing.register_geoip_database("default", db)
    docs = spark.createDataFrame(
        [(1, "10.200.3.4"),      # inside the /8 (spans many /16 buckets)
         (2, "192.168.7.255"),   # last address of the /22
         (3, "192.168.8.0"),     # first address PAST the /22
         (4, "203.0.113.77"),
         (5, "8.8.8.8")],        # no network
        "id int, ip string")
    out = ing.apply_pipeline(docs, [
        {"geoip": {"field": "ip"}},
    ]).orderBy("id").collect()
    got = [r["geoip"]["country_iso_code"] if r["geoip"] else None
           for r in out]
    assert got == ["XA", "XB", None, "XC", None]


def test_user_agent_processor(spark):
    from elasticsearch_spark.ops import ingest as ing

    uas = [
        (1, "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
            "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
        (2, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) "
            "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 "
            "Safari/605.1.15"),
        (3, "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 "
            "Firefox/119.0"),
        (4, "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like "
            "Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91"),
        (5, "Mozilla/5.0 (iPhone; CPU iPhone OS 17_5 like Mac OS X) "
            "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.5 "
            "Mobile/15E148 Safari/604.1"),
        (6, "Mozilla/5.0 (compatible; Googlebot/2.1; "
            "+http://www.google.com/bot.html)"),
    ]
    docs = spark.createDataFrame(uas, "id int, ua string")
    out = ing.apply_pipeline(docs, [
        {"user_agent": {"field": "ua"}},
    ]).orderBy("id").collect()
    ua = [r["user_agent"] for r in out]
    assert [u["name"] for u in ua] == [
        "Chrome", "Safari", "Firefox", "Edge", "Safari", "Other"]
    assert ua[0]["version"] == "120.0.0.0"
    assert ua[0]["os_name"] == "Windows" and ua[0]["os_version"] == "10.0"
    assert ua[1]["os_version"] == "10.15.7"
    assert ua[3]["version"].startswith("120.")
    assert ua[4]["os_name"] == "iOS" and ua[4]["os_version"] == "17.5"
    assert [u["device"] for u in ua] == [
        "Desktop", "Desktop", "Desktop", "Desktop", "Phone", "Spider"]


def test_inference_processor_regression(spark):
    from elasticsearch_spark.ops import ingest as ing

    ing.register_inference_model(
        "reg", kind="regression", weights=[2.0, -1.0], intercept=0.5,
        feature_fields=["x1", "x2"])
    docs = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 0.0, 3.0)], "id int, x1 double, x2 double")
    out = ing.apply_pipeline(docs, [
        {"inference": {"model_id": "reg", "target_field": "ml"}},
    ]).orderBy("id").collect()
    assert out[0]["ml"]["predicted_value"] == 1.5   # .5 + 2 - 1
    assert out[1]["ml"]["predicted_value"] == -2.5  # .5 + 0 - 3


def test_inference_processor_classification_vector(spark):
    import math as m

    from elasticsearch_spark.ops import ingest as ing

    ing.register_inference_model(
        "clf", kind="classification", weights=[1.0, 1.0], intercept=-1.0,
        vector_field="vec", classification_labels=["no", "yes"])
    docs = spark.createDataFrame(
        [(1, [2.0, 1.0]), (2, [0.0, 0.5])],
        "id int, vec array<double>")
    out = ing.apply_pipeline(docs, [
        {"inference": {"model_id": "clf", "target_field": "ml"}},
    ]).orderBy("id").collect()
    assert out[0]["ml"]["predicted_value"] == "yes"   # raw=2 -> p=.88
    p1 = 1 / (1 + m.exp(-2.0))
    assert abs(out[0]["ml"]["prediction_probability"] - p1) < 1e-12
    assert out[1]["ml"]["predicted_value"] == "no"    # raw=-.5 -> p=.38
    p2 = 1 / (1 + m.exp(0.5))
    assert abs(out[1]["ml"]["prediction_probability"] - (1 - p2)) < 1e-12


def test_attachment_processor(spark):
    import base64

    from elasticsearch_spark.ops import ingest as ing

    def b64(s):
        return base64.b64encode(s.encode()).decode()

    docs = spark.createDataFrame(
        [(1, b64("<html><body><p>Hello &amp; welcome</p></body></html>")),
         (2, b64("plain text body")),
         (3, b64("%PDF-1.7 binarystuff")),
         (4, b64("  <!DOCTYPE html><html>x</html>")),
         (5, b64("{\\rtf1 sample"))],
        "id int, data string")
    out = ing.apply_pipeline(docs, [
        {"attachment": {"field": "data"}},
    ]).orderBy("id").collect()
    att = [r["attachment"] for r in out]
    assert att[0]["content_type"] == "text/html"
    assert att[0]["content"] == "Hello & welcome"
    assert att[0]["content_length"] == 15
    assert att[1]["content_type"] == "text/plain"
    assert att[1]["content"] == "plain text body"
    assert att[2]["content_type"] == "application/pdf"
    assert att[2]["content"] is None  # parser stubbed: typed, no text
    assert att[3]["content_type"] == "text/html"
    assert att[3]["content"] == "x"
    assert att[4]["content_type"] == "application/rtf"


def test_fail_date_index_name_network_direction(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.ops.ingest import apply_processor

    df = spark.createDataFrame(
        [(1, "2024-03-15 10:30:00", "10.1.2.3", "192.168.1.5"),
         (2, "2024-03-16 23:59:59", "10.1.2.3", "8.8.8.8"),
         (3, "2024-04-01 00:00:00", "8.8.4.4", "172.16.0.9"),
         (4, "2024-04-02 12:00:00", "1.2.3.4", "8.8.8.8")],
        "id long, ts string, src string, dst string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    # date_index_name: monthly rounding with a prefix
    out = apply_processor(df, {"date_index_name": {
        "field": "ts", "index_name_prefix": "logs-",
        "date_rounding": "M", "index_name_format": "yyyy-MM"}})
    got = {r["id"]: r["_index"] for r in out.collect()}
    assert got == {1: "logs-2024-03", 2: "logs-2024-03",
                   3: "logs-2024-04", 4: "logs-2024-04"}

    # network_direction with the named 'private' range
    out = apply_processor(df, {"network_direction": {
        "source_ip": "src", "destination_ip": "dst",
        "internal_networks": ["private"]}})
    got = {r["id"]: r["network_direction"] for r in out.collect()}
    assert got == {1: "internal", 2: "outbound", 3: "inbound",
                   4: "external"}

    # fail: no match passes through; a match fails the job loudly
    ok = apply_processor(df, {"fail": {
        "if": "id > 100", "message": "boom"}})
    assert ok.count() == 4
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    bad = apply_processor(df, {"fail": {"if": "id = 3",
                                        "message": "boom"}})
    with _pytest.raises(Exception) as ei:
        bad.count()
    assert "boom" in str(ei.value)
