"""Ingest pipeline processors -> chained native column transforms.

The reference ships 32 ingest processors (modules/ingest-common/
src/main/java/org/elasticsearch/ingest/common/, wired by
ingest/IngestService.java); a pipeline is an ordered list of processor
specs applied to every incoming doc before indexing. Here a pipeline is
a list of dicts compiled onto a DataFrame — every processor is a
built-in Spark SQL expression (JVM, codegen), zero Python per row.

Supported processors (same names/fields as the reference JSON):
  set, rename, remove, convert, lowercase, uppercase, trim, split,
  join, gsub, grok (a pragmatic named-group regex subset), dissect
  (simple %{field} patterns), date, json, kv, csv, fingerprint,
  script (a Spark SQL expression), append, html_strip, and the
  lookup-backed tier: enrich (registered policy table -> broadcast
  hash join), geoip (registered CIDR table -> /16-bucketed broadcast
  join), user_agent (inline RE2-safe ua-parser subset), inference
  (registered coefficient model -> one codegen expression), attachment
  (magic-byte sniff + text/html extraction; binary parsers stubbed).
"""

from __future__ import annotations

import math
import re
from typing import Any

from pyspark.sql import DataFrame, functions as F

# --- lookup-backed processors (enrich / geoip) ------------------------
#
# The reference's enrich processor reads an internal `.enrich-*` index
# that `PUT _enrich/policy/<name>/_execute` materializes from a source
# index and every ingest node loads into memory
# (x-pack/plugin/enrich/.../EnrichProcessorFactory.java,
# EnrichPolicyRunner.java). The Spark analogue of "loaded into memory
# on every node" is a BROADCAST of the policy table; executing the
# policy = registering the lookup DataFrame here. geoip similarly
# side-loads a per-node database file (ingest-geoip/GeoIpProcessor.java
# over a MaxMind mmap) — re-expressed as a broadcast CIDR table.

_ENRICH_POLICIES: dict[str, dict[str, Any]] = {}
_GEOIP_DATABASES: dict[str, DataFrame] = {}


def register_enrich_policy(
    name: str,
    source: DataFrame,
    match_field: str,
    enrich_fields: list[str],
) -> None:
    """The _execute analogue: snapshot the policy's source table. The
    match key is deduplicated (keep the row with the smallest enrich
    tuple) so the processor join can never fan out."""
    lookup = (
        source.select(match_field, *enrich_fields)
        .groupBy(match_field)
        .agg(*[F.min(f).alias(f) for f in enrich_fields])
    )
    _ENRICH_POLICIES[name] = {
        "lookup": lookup,
        "match_field": match_field,
        "enrich_fields": list(enrich_fields),
    }


def register_geoip_database(name: str, db: DataFrame) -> None:
    """db: columns `network` (IPv4 CIDR string) + attribute columns.
    Networks must be non-overlapping (MaxMind GeoLite shape)."""
    _GEOIP_DATABASES[name] = db


_INFERENCE_MODELS: dict[str, dict[str, Any]] = {}


def register_inference_model(
    model_id: str,
    *,
    kind: str = "regression",
    weights: list[float],
    intercept: float = 0.0,
    feature_fields: list[str] | None = None,
    vector_field: str | None = None,
    classification_labels: list[str] | None = None,
) -> None:
    """The model-deployment analogue of PUT _ml/trained_models: the
    inference processor (x-pack/plugin/ml/.../inference/ingest/
    InferenceProcessor.java) runs a TRAINED model that was loaded onto
    every node; here the trained model is its coefficient vector,
    evaluated as one Catalyst expression (no Python in the hot path).
    kind: "regression" (linear) or "classification" (logistic over
    classification_labels, binary)."""
    if (feature_fields is None) == (vector_field is None):
        raise ValueError("exactly one of feature_fields/vector_field")
    if kind == "classification" and not classification_labels:
        raise ValueError("classification needs classification_labels")
    _INFERENCE_MODELS[model_id] = {
        "kind": kind,
        "weights": [float(w) for w in weights],
        "intercept": float(intercept),
        "feature_fields": feature_fields,
        "vector_field": vector_field,
        "labels": classification_labels,
    }


def _ipv4_num(c):
    o = F.split(c, r"\.")
    return (o[0].cast("long") * 16777216 + o[1].cast("long") * 65536
            + o[2].cast("long") * 256 + o[3].cast("long"))

_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NUMBER": r"(?:[+-]?(?:\d+(?:\.\d+)?))",
    "INT": r"[+-]?\d+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "NOTSPACE": r"\S+",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
}


def _grok_to_regex(pattern: str) -> tuple[str, list[str]]:
    """%{TYPE:name} -> named-group Java/RE2-compatible regex."""
    fields: list[str] = []

    def repl(m: re.Match) -> str:
        typ, _, name = m.group(1).partition(":")
        base = _GROK_PATTERNS.get(typ, r".*?")
        if name:
            fields.append(name)
            return f"({base})"
        return f"(?:{base})"

    regex = re.sub(r"%\{([^}]+)\}", repl, pattern)
    return regex, fields


def _dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """dissect %{field} patterns -> regex with greedy-lazy captures."""
    fields: list[str] = []
    out: list[str] = []
    pos = 0
    for m in re.finditer(r"%\{([^}]*)\}", pattern):
        out.append(re.escape(pattern[pos:m.start()]))
        name = m.group(1)
        if name:
            fields.append(name)
            out.append("(.*?)")
        else:
            out.append("(?:.*?)")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return "^" + "".join(out) + "$", fields


def apply_processor(df: DataFrame, spec: dict[str, Any]) -> DataFrame:
    kind, p = next(iter(spec.items()))
    if kind == "set":
        return df.withColumn(p["field"], F.lit(p["value"]))
    if kind == "rename":
        return df.withColumnRenamed(p["field"], p["target_field"])
    if kind == "remove":
        fields = p["field"] if isinstance(p["field"], list) else [p["field"]]
        return df.drop(*fields)
    if kind == "convert":
        t = {"integer": "int", "long": "long", "float": "float",
             "double": "double", "string": "string", "boolean": "boolean"}[p["type"]]
        return df.withColumn(
            p.get("target_field", p["field"]), F.col(p["field"]).cast(t)
        )
    if kind == "lowercase":
        return df.withColumn(p["field"], F.lower(F.col(p["field"])))
    if kind == "uppercase":
        return df.withColumn(p["field"], F.upper(F.col(p["field"])))
    if kind == "trim":
        return df.withColumn(p["field"], F.trim(F.col(p["field"])))
    if kind == "split":
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.split(F.col(p["field"]), p["separator"]),
        )
    if kind == "join":
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.array_join(F.col(p["field"]), p["separator"]),
        )
    if kind == "gsub":
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.regexp_replace(F.col(p["field"]), p["pattern"], p["replacement"]),
        )
    if kind == "grok":
        regex, fields = _grok_to_regex(p["patterns"][0])
        out = df
        for i, name in enumerate(fields, start=1):
            out = out.withColumn(name, F.regexp_extract(F.col(p["field"]), regex, i))
        return out
    if kind == "dissect":
        regex, fields = _dissect_to_regex(p["pattern"])
        out = df
        for i, name in enumerate(fields, start=1):
            out = out.withColumn(name, F.regexp_extract(F.col(p["field"]), regex, i))
        return out
    if kind == "date":
        # tolerant parse (null on failure) — the ES date processor routes
        # failures to on_failure handlers; null is our analogue
        return df.withColumn(
            p.get("target_field", "@timestamp"),
            F.try_to_timestamp(
                F.col(p["field"]),
                F.lit(p.get("formats", ["yyyy-MM-dd HH:mm:ss"])[0]),
            ),
        )
    if kind == "json":
        return df.withColumn(
            p.get("target_field", p["field"] + "_json"),
            F.from_json(F.col(p["field"]), p["schema"]),
        )
    if kind == "kv":
        fs = p.get("field_split", " ")
        vs = p.get("value_split", "=")
        pairs = F.split(F.col(p["field"]), fs)
        return df.withColumn(
            p.get("target_field", p["field"] + "_kv"),
            F.map_from_entries(
                F.transform(
                    pairs,
                    lambda kv: F.struct(
                        F.split(kv, vs).getItem(0).alias("key"),
                        F.split(kv, vs).getItem(1).alias("value"),
                    ),
                )
            ),
        )
    if kind == "csv":
        cols = p["target_fields"]
        parts = F.split(F.col(p["field"]), p.get("separator", ","))
        out = df
        for i, name in enumerate(cols):
            out = out.withColumn(name, parts.getItem(i))
        return out
    if kind == "fingerprint":
        fields = p["fields"]
        return df.withColumn(
            p.get("target_field", "fingerprint"),
            F.sha2(F.concat_ws("|", *[F.col(f) for f in fields]), 256),
        )
    if kind == "script":
        return df.withColumn(p["target_field"], F.expr(p["source"]))
    if kind == "append":
        return df.withColumn(
            p["field"],
            F.concat(
                F.coalesce(F.col(p["field"]), F.array()),
                F.array(*[F.lit(v) for v in p["values"]]),
            ),
        )
    if kind == "html_strip":
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.regexp_replace(F.col(p["field"]), "<[^>]*>", ""),
        )
    if kind == "foreach":
        # apply a simple sub-processor to every array element
        sub_kind, sub = next(iter(p["processor"].items()))
        fn = {
            "lowercase": F.lower, "uppercase": F.upper, "trim": F.trim,
        }[sub_kind]
        return df.withColumn(
            p["field"], F.transform(F.col(p["field"]), lambda x: fn(x))
        )
    if kind == "urldecode":
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.url_decode(F.col(p["field"])),
        )
    if kind == "bytes":
        # "1kb"/"2mb"/"3gb"/plain -> bytes (ES bytes processor)
        c = F.lower(F.trim(F.col(p["field"])))
        num = F.regexp_extract(c, r"^([0-9.]+)", 1).cast("double")
        unit = F.regexp_extract(c, r"([kmgt]?b)$", 1)
        mult = (
            F.when(unit == "kb", 1024.0)
            .when(unit == "mb", 1024.0 ** 2)
            .when(unit == "gb", 1024.0 ** 3)
            .when(unit == "tb", 1024.0 ** 4)
            .otherwise(1.0)
        )
        return df.withColumn(
            p.get("target_field", p["field"]), (num * mult).cast("long")
        )
    if kind == "drop":
        # drop documents matching the condition (a SQL expression)
        return df.filter(~F.expr(p["if"]))
    if kind == "dot_expander":
        # promote a literal dotted column name into a struct
        field = p["field"]
        parent, _, child = field.partition(".")
        return df.withColumn(
            parent, F.struct(F.col(f"`{field}`").alias(child))
        ).drop(field)
    if kind == "sort":
        order = p.get("order", "asc")
        c = F.sort_array(F.col(p["field"]), asc=(order == "asc"))
        return df.withColumn(p.get("target_field", p["field"]), c)
    if kind == "dedupe":
        # ES "remove duplicates from array" (the `unique`-style processor)
        return df.withColumn(
            p.get("target_field", p["field"]),
            F.array_distinct(F.col(p["field"])),
        )
    if kind == "uri_parts":
        # URIPartsProcessor.java: scheme/domain/port/path/query/fragment
        c = F.col(p["field"])
        tgt = p.get("target_field", "url")
        return df.withColumn(
            tgt,
            F.struct(
                F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
                F.parse_url(c, F.lit("HOST")).alias("domain"),
                F.parse_url(c, F.lit("PATH")).alias("path"),
                F.parse_url(c, F.lit("QUERY")).alias("query"),
                F.parse_url(c, F.lit("REF")).alias("fragment"),
            ),
        )
    if kind == "registered_domain":
        # RegisteredDomainProcessor.java without the public-suffix list
        # (not shipped here): registered domain = last two labels, a
        # documented approximation correct for gTLDs
        c = F.col(p["field"])
        parts = F.split(c, r"\.")
        n = F.size(parts)
        reg = F.when(
            n >= 2,
            F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
        ).otherwise(c)
        return df.withColumn(p.get("target_field", "registered_domain"), reg)
    if kind == "community_id":
        # CommunityIdProcessor.java (community-id-spec v1):
        # "1:" + base64(sha1(seed_be16 . src_ip . dst_ip . proto . 0 .
        # src_port_be16 . dst_port_be16)) with the flow tuple ordered so
        # the smaller (ip, port) endpoint comes first. Built entirely
        # from hex-string assembly -> unhex -> sha1 -> base64 (JVM-side).
        seed = int(p.get("seed", 0))
        src_ip, dst_ip = F.col(p["source_ip"]), F.col(p["destination_ip"])
        src_pt = F.col(p["source_port"]).cast("int")
        dst_pt = F.col(p["destination_port"]).cast("int")
        proto = F.lit(int(p.get("iana_number", 6)))

        def ip_hex(c):
            o = F.split(c, r"\.")
            return F.concat(*[
                F.lpad(F.hex(o[i].cast("int")), 2, "0") for i in range(4)
            ])

        def ip_num(c):
            o = F.split(c, r"\.")
            return (
                o[0].cast("long") * 16777216 + o[1].cast("long") * 65536
                + o[2].cast("long") * 256 + o[3].cast("long")
            )

        flip = (ip_num(src_ip) > ip_num(dst_ip)) | (
            (ip_num(src_ip) == ip_num(dst_ip)) & (src_pt > dst_pt)
        )
        ip1 = F.when(flip, dst_ip).otherwise(src_ip)
        ip2 = F.when(flip, src_ip).otherwise(dst_ip)
        pt1 = F.when(flip, dst_pt).otherwise(src_pt)
        pt2 = F.when(flip, src_pt).otherwise(dst_pt)
        hexstr = F.concat(
            F.lit(f"{seed:04x}"),
            ip_hex(ip1), ip_hex(ip2),
            F.lpad(F.hex(proto), 2, "0"), F.lit("00"),
            F.lpad(F.hex(pt1), 4, "0"), F.lpad(F.hex(pt2), 4, "0"),
        )
        digest = F.base64(F.unhex(F.sha1(F.unhex(F.lower(hexstr)))))
        return df.withColumn(
            p.get("target_field", "community_id"), F.concat(F.lit("1:"), digest)
        )
    if kind == "fail":
        # FailProcessor.java: raise on matching docs. The reference
        # fails the single document (on_failure-handled); a batch
        # engine's analogue is failing the job loudly at first match —
        # the condition guard (`if`) is the usual production shape.
        cond = F.expr(p["if"]) if "if" in p else F.lit(True)
        msg = p.get("message", "fail processor triggered")
        # a filter predicate can't be pruned away: matching rows
        # evaluate raise_error, everything else passes through TRUE
        guard = F.when(cond, F.raise_error(F.lit(msg))
                       .cast("boolean")).otherwise(F.lit(True))
        return df.filter(guard)
    if kind == "date_index_name":
        # DateIndexNameProcessor.java: route each doc to a time-based
        # index name — prefix + the date field rounded per
        # date_rounding, rendered with index_name_format. Pure codegen.
        unit = {"y": "year", "M": "month", "w": "week", "d": "day",
                "h": "hour", "m": "minute", "s": "second"}[
            p.get("date_rounding", "d")]
        fmt = p.get("index_name_format", "yyyy-MM-dd")
        rounded = F.date_trunc(unit, F.col(p["field"]))
        return df.withColumn(
            p.get("target_field", "_index"),
            F.concat(F.lit(p.get("index_name_prefix", "")),
                     F.date_format(rounded, fmt)))
    if kind == "network_direction":
        # NetworkDirectionProcessor.java: classify the flow against
        # internal_networks (CIDRs or the named ranges the reference
        # accepts) — internal/outbound/inbound/external. One OR-chain
        # of range predicates per endpoint, all JVM-side.
        named = {
            "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"],
            "loopback": ["127.0.0.0/8"],
            "link_local_unicast": ["169.254.0.0/16"],
        }
        cidrs: list[str] = []
        for n in p["internal_networks"]:
            cidrs.extend(named.get(n, [n]))

        def in_internal(ip_col):
            preds = []
            for c in cidrs:
                base, _, bits = c.partition("/")
                bits = int(bits or 32)
                base_num = 0
                for part in base.split("."):
                    base_num = base_num * 256 + int(part)
                mask = ((1 << 32) - 1) ^ ((1 << (32 - bits)) - 1)
                preds.append(
                    _ipv4_num(ip_col).bitwiseAND(F.lit(mask))
                    == F.lit(base_num & mask))
            out = preds[0]
            for q in preds[1:]:
                out = out | q
            return out

        src_in = in_internal(F.col(p.get("source_ip", "source_ip")))
        dst_in = in_internal(
            F.col(p.get("destination_ip", "destination_ip")))
        return df.withColumn(
            p.get("target_field", "network_direction"),
            F.when(src_in & dst_in, F.lit("internal"))
            .when(src_in, F.lit("outbound"))
            .when(dst_in, F.lit("inbound"))
            .otherwise(F.lit("external")))
    if kind == "enrich":
        # EnrichProcessor: broadcast hash join against the registered
        # policy table; the matched enrich doc lands at target_field as
        # a struct (max_matches=1, the reference default — the policy
        # registration dedupes the match key so no fan-out is possible)
        pol = _ENRICH_POLICIES[p["policy_name"]]
        mf, efs = pol["match_field"], pol["enrich_fields"]
        tgt = p.get("target_field", p["policy_name"])
        look = pol["lookup"].select(
            F.col(mf).alias("__enrich_key"),
            F.struct(*[F.col(f) for f in efs]).alias(tgt),
        )
        return df.join(
            F.broadcast(look),
            df[p["field"]] == look["__enrich_key"],
            "left",
        ).drop("__enrich_key")
    if kind == "geoip":
        # GeoIpProcessor: ip -> CIDR containment against the broadcast
        # database. Scale shape: each CIDR is exploded onto its /16
        # bucket range so the join is a broadcast HASH join on bucket
        # (never a nested-loop range join); the BETWEEN is a residual
        # filter. A /16-or-longer prefix lands in exactly one bucket.
        db = _GEOIP_DATABASES[p.get("database_file", "default")]
        attr_cols = [c for c in db.columns if c != "network"]
        base = _ipv4_num(F.split(F.col("network"), "/")[0])
        prefix = F.split(F.col("network"), "/")[1].cast("int")
        span = F.pow(F.lit(2.0), 32 - prefix).cast("long")
        start = (base - F.pmod(base, span)).alias("__net_start")
        db2 = (
            db.select(
                start,
                (base - F.pmod(base, span) + span - 1).alias("__net_end"),
                F.struct(*[F.col(c) for c in attr_cols]).alias("__geo"),
            )
            .withColumn(
                "__bucket",
                F.explode(F.sequence(
                    (F.col("__net_start") / 65536).cast("long"),
                    (F.col("__net_end") / 65536).cast("long"),
                )),
            )
        )
        ipn = _ipv4_num(F.col(p["field"]))
        tgt = p.get("target_field", "geoip")
        probed = df.withColumn("__ipn", ipn).withColumn(
            "__bucket", (F.col("__ipn") / 65536).cast("long")
        )
        return (
            probed.join(
                F.broadcast(db2),
                (probed["__bucket"] == db2["__bucket"])
                & probed["__ipn"].between(
                    db2["__net_start"], db2["__net_end"]),
                "left",
            )
            .withColumnRenamed("__geo", tgt)
            .drop("__ipn", "__bucket", "__net_start", "__net_end")
        )
    if kind == "user_agent":
        # UserAgentProcessor.java drives ua-parser's regexes.yaml; this
        # is an inline RE2-safe subset covering the major browser/OS/
        # device families, evaluated as one codegen CASE chain. Match
        # order matters: Edge and Opera send Chrome/ tokens, Chrome
        # sends Safari/ tokens.
        c = F.col(p["field"])
        ver = lambda pat: F.regexp_extract(c, pat, 1)

        def has(pat):
            return c.rlike(pat)

        name = (
            F.when(has(r"Edg[eA]?/"), F.lit("Edge"))
            .when(has(r"OPR/"), F.lit("Opera"))
            .when(has(r"Chrome/"), F.lit("Chrome"))
            .when(has(r"Firefox/"), F.lit("Firefox"))
            .when(has(r"Version/[0-9.]+.*Safari/"), F.lit("Safari"))
            .when(has(r"MSIE [0-9.]+|Trident/"),
                  F.lit("Internet Explorer"))
            .otherwise(F.lit("Other"))
        )
        version = (
            F.when(has(r"Edg[eA]?/"), ver(r"Edg[eA]?/([0-9.]+)"))
            .when(has(r"OPR/"), ver(r"OPR/([0-9.]+)"))
            .when(has(r"Chrome/"), ver(r"Chrome/([0-9.]+)"))
            .when(has(r"Firefox/"), ver(r"Firefox/([0-9.]+)"))
            .when(has(r"Version/[0-9.]+.*Safari/"),
                  ver(r"Version/([0-9.]+)"))
            .when(has(r"MSIE [0-9.]+"), ver(r"MSIE ([0-9.]+)"))
            .when(has(r"Trident/"), ver(r"rv:([0-9.]+)"))
            .otherwise(F.lit(""))
        )
        os_name = (
            F.when(has(r"Windows NT"), F.lit("Windows"))
            .when(has(r"iPhone OS|CPU OS"), F.lit("iOS"))
            .when(has(r"Mac OS X"), F.lit("Mac OS X"))
            .when(has(r"Android"), F.lit("Android"))
            .when(has(r"Linux"), F.lit("Linux"))
            .otherwise(F.lit("Other"))
        )
        os_version = (
            F.when(has(r"Windows NT"), ver(r"Windows NT ([0-9.]+)"))
            .when(has(r"iPhone OS|CPU OS"),
                  F.replace(ver(r"(?:iPhone OS|CPU OS) ([0-9_]+)"),
                            F.lit("_"), F.lit(".")))
            .when(has(r"Mac OS X"),
                  F.replace(ver(r"Mac OS X ([0-9_.]+)"),
                            F.lit("_"), F.lit(".")))
            .when(has(r"Android"), ver(r"Android ([0-9.]+)"))
            .otherwise(F.lit(""))
        )
        device = (
            F.when(has(r"(?i)bot|spider|crawl"), F.lit("Spider"))
            .when(has(r"iPad|Tablet"), F.lit("Tablet"))
            .when(has(r"Mobile|iPhone|Android"), F.lit("Phone"))
            .otherwise(F.lit("Desktop"))
        )
        tgt = p.get("target_field", "user_agent")
        return df.withColumn(
            tgt,
            F.struct(
                name.alias("name"), version.alias("version"),
                os_name.alias("os_name"), os_version.alias("os_version"),
                device.alias("device"),
            ),
        )
    if kind == "inference":
        # InferenceProcessor: the registered model's coefficients fold
        # into a single codegen expression — the Spark analogue of the
        # reference evaluating a loaded model node-locally per doc.
        m = _INFERENCE_MODELS[p["model_id"]]
        w, b = m["weights"], m["intercept"]
        if m["vector_field"] is not None:
            wcol = F.array(*[F.lit(x) for x in w])
            vec = F.transform(F.col(m["vector_field"]),
                              lambda x: x.cast("double"))
            raw = F.aggregate(
                F.zip_with(vec, wcol, lambda x, y: x * y),
                F.lit(b), lambda acc, x: acc + x)
        else:
            raw = F.lit(b)
            for f, x in zip(m["feature_fields"], w):
                raw = raw + F.col(f).cast("double") * F.lit(x)
        tgt = p.get("target_field", "ml_inference")
        if m["kind"] == "regression":
            out = F.struct(raw.alias("predicted_value"))
        elif m["kind"] == "classification":
            prob1 = F.lit(1.0) / (F.lit(1.0) + F.exp(-raw))
            lab = F.when(prob1 >= 0.5, F.lit(m["labels"][1])) \
                .otherwise(F.lit(m["labels"][0]))
            conf = F.greatest(prob1, F.lit(1.0) - prob1)
            out = F.struct(lab.alias("predicted_value"),
                           conf.alias("prediction_probability"))
        else:
            raise ValueError(f"unknown model kind {m['kind']!r}")
        return df.withColumn(tgt, out)
    if kind == "attachment":
        # AttachmentProcessor (ingest-attachment plugin over Tika):
        # base64/binary payload -> {content, content_type,
        # content_length}. Type detection is the same magic-byte
        # sniffing Tika leads with; content extraction is implemented
        # for the text/html/plain family (tag strip + entity decode).
        # Binary formats (pdf/zip/rtf) are TYPED but their content
        # extraction needs Tika's parsers (absent here, documented):
        # content stays NULL for them — the plumbing (decode, sniff,
        # dispatch, struct shape) is the real part.
        src = F.col(p["field"])
        if dict(df.dtypes)[p["field"]] == "binary":
            data = src
        else:
            data = F.unbase64(src)
        text = data.cast("string")
        lead = F.ltrim(text)
        ctype = (
            F.when(text.startswith("%PDF-"), F.lit("application/pdf"))
            .when(F.substring(data, 1, 4) == F.lit(b"PK\x03\x04"),
                  F.lit("application/zip"))
            .when(text.startswith("{\\rtf"), F.lit("application/rtf"))
            .when(F.lower(lead).rlike(r"^<(!doctype\s+html|html)"),
                  F.lit("text/html"))
            .otherwise(F.lit("text/plain"))
        )
        stripped = F.trim(F.regexp_replace(
            F.regexp_replace(text, "<[^>]*>", " "), r"\s+", " "))
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"),
                        ("&quot;", '"'), ("&#39;", "'")):
            stripped = F.replace(stripped, F.lit(ent), F.lit(ch))
        content = (
            F.when(ctype == "text/html", stripped)
            .when(ctype == "text/plain", text)
        )
        tgt = p.get("target_field", "attachment")
        return df.withColumn(
            tgt,
            F.struct(
                content.alias("content"), ctype.alias("content_type"),
                F.length(content).alias("content_length"),
            ),
        )
    if kind == "circle":
        # CircleProcessor (x-pack/plugin/spatial/.../ingest/
        # CircleProcessor.java): circle -> regular polygon whose vertex
        # count keeps the sagitta under error_distance:
        #   n = clamp(ceil(2*pi / acos(1 - error/radius)), 4, 1000)
        # shape_type="shape" is exact vertex parity with
        # SpatialUtils.createRegularShapePolygon (angle_i = i*360/n,
        # v = r*(cos,sin)(radians(angle)) + center; closing vertex
        # repeats vertex 0 via i % n).  All per-row math is Catalyst
        # sequence/transform — whole-stage codegen, no UDF.
        # shape_type="geo_shape" (the haversine spoke-honing loop of
        # createRegularGeoShapePolygon) is refused loudly.
        if p.get("shape_type", "shape") != "shape":
            raise NotImplementedError(
                "circle processor: only shape_type='shape' (cartesian) "
                "is supported; geo_shape needs the iterative haversine "
                "honing of SpatialUtils.createRegularGeoShapePolygon")
        err = float(p.get("error_distance", 1.0))
        c = F.col(p["field"])
        cx, cy, r = c["x"], c["y"], c["radius"].cast("double")
        n = F.least(
            F.lit(1000),
            F.greatest(
                F.lit(4),
                F.ceil(F.lit(2.0 * math.pi)
                       / F.acos(F.lit(1.0) - F.lit(err) / r)).cast("int")))
        i_to_angle = lambda i: F.radians(   # noqa: E731
            (i % n).cast("double") * (F.lit(360.0) / n.cast("double")))
        poly = F.transform(
            F.sequence(F.lit(0), n),
            lambda i: F.struct(
                (r * F.cos(i_to_angle(i)) + cx).alias("x"),
                (r * F.sin(i_to_angle(i)) + cy).alias("y")))
        return df.withColumn(p.get("target_field", p["field"]), poly)
    raise ValueError(f"unsupported processor: {kind}")


def apply_pipeline(df: DataFrame, pipeline: list[dict[str, Any]]) -> DataFrame:
    """Run an ingest pipeline (ordered processor list) over a table."""
    for spec in pipeline:
        df = apply_processor(df, spec)
    return df


def simulate_pipeline(
    spark,
    pipeline: list[dict[str, Any]],
    docs: list[dict[str, Any]],
    verbose: bool = False,
) -> list[dict[str, Any]]:
    """_ingest/pipeline/_simulate (reference: action/ingest/
    SimulatePipelineRequest + SimulateExecutionService): run the
    pipeline against sample documents WITHOUT indexing and return the
    transformed docs; ``verbose`` returns each processor's intermediate
    output per doc (the per-processor trace the endpoint emits).

    The sample is driver-small by definition (the reference caps the
    request body), so the one-row-frame per collect cost is the point:
    it exercises the EXACT same compiled processors production ingest
    runs."""
    import pandas as pd

    pdf = pd.DataFrame(docs)
    pdf["_sim_ord"] = range(len(pdf))  # pin request order across collects
    df = spark.createDataFrame(pdf)

    def rows(frame):
        got = sorted(frame.collect(), key=lambda r: r["_sim_ord"])
        return [{k: v for k, v in r.asDict(recursive=True).items()
                 if k != "_sim_ord"} for r in got]

    if not verbose:
        return rows(apply_pipeline(df, pipeline))
    out: list[list[dict]] = [[] for _ in docs]
    cur = df
    for spec in pipeline:
        (kind, _), = spec.items()
        cur = apply_processor(cur, spec)
        for i, doc in enumerate(rows(cur)):
            out[i].append({"processor_type": kind, "doc": doc})
    return [{"processor_results": trace} for trace in out]
