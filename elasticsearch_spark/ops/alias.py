"""Index aliases — the _aliases API.

Reference: server/.../action/admin/indices/alias/ (IndicesAliasesRequest
add/remove actions, filtered aliases applied as an extra query on every
search through the alias; alias resolution happens in
TransportSearchAction before shards are selected).

Spark shape: the registry is one JSON file (atomic os.replace commit,
like every other piece of metadata in this engine); resolution returns
a MultiIndex over the member paths plus the alias filter compiled by
the ordinary DSL compiler — the filter composes with the query exactly
as the reference's filtered alias does (an implicit bool.filter).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession

_REG = "aliases.json"


def _load(registry_dir: str) -> dict:
    p = os.path.join(registry_dir, _REG)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _save(registry_dir: str, reg: dict) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    tmp = os.path.join(registry_dir, f".{_REG}.tmp")
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(registry_dir, _REG))


def update_aliases(registry_dir: str, actions: list[dict]) -> dict:
    """POST /_aliases — the add/remove action list, applied
    ATOMICALLY (all actions land in one registry commit, the
    reference's single cluster-state update).

    action: {"add": {"index": path, "alias": name
                     [, "filter": dsl] [, "is_write_index": bool]}}
          | {"remove": {"index": path, "alias": name}}
    """
    reg = _load(registry_dir)
    for act in actions:
        (kind, body), = act.items()
        name = body["alias"]
        if kind == "add":
            entry = reg.setdefault(name, {"indices": []})
            if body["index"] not in entry["indices"]:
                entry["indices"].append(body["index"])
            if "filter" in body:
                entry["filter"] = body["filter"]
            if body.get("is_write_index"):
                entry["write_index"] = body["index"]
        elif kind == "remove":
            entry = reg.get(name)
            if entry is None or body["index"] not in entry["indices"]:
                raise ValueError(
                    f"alias {name!r} does not point at {body['index']!r}")
            entry["indices"].remove(body["index"])
            if entry.get("write_index") == body["index"]:
                entry.pop("write_index", None)
            if not entry["indices"]:
                del reg[name]
        else:
            raise ValueError(f"unknown alias action {kind!r}")
    _save(registry_dir, reg)
    return reg


def get_aliases(registry_dir: str) -> dict:
    """GET /_alias — the whole registry."""
    return _load(registry_dir)


def resolve_alias(
    spark: SparkSession, registry_dir: str, name: str
) -> tuple[Any, Any]:
    """Resolve an alias for searching: (index, filter_column|None).

    ``index`` is the member InvertedIndex (one member) or a MultiIndex
    (several); the filter column is the compiled alias filter to apply
    to the docs/fetch side (the implicit bool.filter every
    filtered-alias search carries)."""
    from elasticsearch_spark.index.builder import load_index, load_indices
    from elasticsearch_spark.search.dsl import compile_filter

    entry = _load(registry_dir).get(name)
    if entry is None:
        raise ValueError(f"unknown alias {name!r}")
    paths = entry["indices"]
    idx = (load_index(spark, paths[0]) if len(paths) == 1
           else load_indices(spark, paths))
    filt = (compile_filter(entry["filter"])
            if "filter" in entry else None)
    return idx, filt


def write_index(registry_dir: str, name: str) -> str:
    """The alias's write index (is_write_index) — writes through an
    alias must target exactly one index, as in the reference."""
    entry = _load(registry_dir).get(name)
    if entry is None:
        raise ValueError(f"unknown alias {name!r}")
    if len(entry["indices"]) == 1:
        return entry["indices"][0]
    wi = entry.get("write_index")
    if wi is None:
        raise ValueError(
            f"alias {name!r} points at {len(entry['indices'])} indices "
            "and none is marked is_write_index")
    return wi
