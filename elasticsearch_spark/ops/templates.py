"""Index templates: component + composable templates and simulation.

Reference: server/.../action/admin/indices/template/ (composable
templates: TransportPutComposableIndexTemplateAction; resolution +
merge: MetadataIndexTemplateService.resolveSettings/resolveMappings;
simulation: TransportSimulateIndexTemplateAction). The v2 semantics
re-created here:

  - component templates are reusable fragments (settings + mappings);
  - a composable template has index_patterns, a priority, an optional
    list of component templates (``composed_of``) and its own
    settings/mappings;
  - for a new index name, the HIGHEST-priority composable template
    whose pattern matches wins (ties on priority are rejected at PUT
    time for overlapping patterns, as the reference does);
  - effective config = components merged in composed_of ORDER, then
    the template's own settings/mappings merged LAST (later wins per
    key — the reference's merge order).

The registry is one atomically-committed JSON file (this engine's
cluster-state idiom). ``settings`` here carries build knobs
(num_partitions, ...) and ``mappings`` the fields->analyzer dict that
``build_index`` consumes — simulate_index returns exactly the kwargs a
caller passes on."""

from __future__ import annotations

import fnmatch
import json
import os
from typing import Any

_REG = "index_templates.json"


def _load(registry_dir: str) -> dict:
    p = os.path.join(registry_dir, _REG)
    if not os.path.exists(p):
        return {"component": {}, "composable": {}}
    with open(p) as f:
        return json.load(f)


def _save(registry_dir: str, reg: dict) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    tmp = os.path.join(registry_dir, f".{_REG}.tmp")
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(registry_dir, _REG))


def put_component_template(
    registry_dir: str, name: str,
    settings: dict | None = None, mappings: dict | None = None,
) -> None:
    reg = _load(registry_dir)
    reg["component"][name] = {
        "settings": settings or {}, "mappings": mappings or {}}
    _save(registry_dir, reg)


def put_index_template(
    registry_dir: str, name: str,
    index_patterns: list[str],
    priority: int = 0,
    composed_of: list[str] | None = None,
    settings: dict | None = None,
    mappings: dict | None = None,
) -> None:
    reg = _load(registry_dir)
    for comp in composed_of or []:
        if comp not in reg["component"]:
            raise ValueError(f"unknown component template {comp!r}")
    # the reference rejects a new template whose patterns overlap an
    # existing template AT THE SAME priority (resolution would be
    # ambiguous)
    for other, spec in reg["composable"].items():
        if other == name or spec["priority"] != priority:
            continue
        for a in index_patterns:
            for b in spec["index_patterns"]:
                if fnmatch.fnmatch(a.replace("*", "x"), b) or \
                        fnmatch.fnmatch(b.replace("*", "x"), a):
                    raise ValueError(
                        f"template {name!r} pattern {a!r} conflicts with "
                        f"{other!r} pattern {b!r} at priority {priority}")
    reg["composable"][name] = {
        "index_patterns": list(index_patterns),
        "priority": int(priority),
        "composed_of": list(composed_of or []),
        "settings": settings or {},
        "mappings": mappings or {},
    }
    _save(registry_dir, reg)


def simulate_index(registry_dir: str, index_name: str) -> dict:
    """TransportSimulateIndexTemplateAction: which template wins for
    ``index_name`` and the EFFECTIVE merged settings/mappings."""
    reg = _load(registry_dir)
    matches = [
        (spec["priority"], name, spec)
        for name, spec in reg["composable"].items()
        if any(fnmatch.fnmatch(index_name, p)
               for p in spec["index_patterns"])
    ]
    if not matches:
        return {"matched_template": None, "settings": {}, "mappings": {}}
    matches.sort(key=lambda t: (-t[0], t[1]))
    prio, name, spec = matches[0]
    settings: dict[str, Any] = {}
    mappings: dict[str, Any] = {}
    for comp in spec["composed_of"]:
        c = reg["component"][comp]
        settings.update(c["settings"])
        mappings.update(c["mappings"])
    settings.update(spec["settings"])
    mappings.update(spec["mappings"])
    return {
        "matched_template": name,
        "priority": prio,
        "overlapping": [n for _, n, _ in matches[1:]],
        "settings": settings,
        "mappings": mappings,
    }
