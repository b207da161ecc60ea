"""Document- and field-level security (X-Pack security authz).

Reference behavior:
  x-pack/plugin/core/src/main/java/org/elasticsearch/xpack/core/security/
    authz/permission/DocumentPermissions.java
      - DLS: each role carries a set of filter-context queries; the
        effective document filter is their DISJUNCTION (bool.should),
        and a role group WITHOUT a query grants unrestricted docs
        (hasDocumentLevelPermissions == false short-circuits to all).
    authz/permission/FieldPermissions.java
      - FLS: ``grant`` / ``except`` wildcard patterns compiled to a
        character automaton; a field is visible iff it matches a grant
        pattern and no except pattern. Metadata fields (here: the id
        column) are always visible. Multiple permission groups UNION
        (a field visible to any group is visible).
    authz/permission/IndicesPermission.java
      - roles scope to index name patterns; only the groups whose
        patterns match the searched index contribute.

Spark-first shape: DLS compiles through the same ``compile_filter``
DSL compiler every filter-context query uses, so it lands in the scan
as an ordinary pushed predicate; FLS is pure column pruning (a
``select``), which Catalyst turns into parquet ReadSchema pruning —
security enforcement is free at scan time rather than a post-fetch
source-stripping pass like the reference's SecurityIndexReaderWrapper.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_spark.search.dsl import compile_filter


@dataclass(frozen=True)
class Role:
    """One indices-permission group of a security role
    (RoleDescriptor.IndicesPrivileges): index patterns it applies to,
    an optional DLS query (filter-context DSL dict), and FLS
    grant/except field patterns (default: all fields, no exceptions).
    """

    name: str
    indices: tuple[str, ...] = ("*",)
    query: Optional[dict[str, Any]] = None
    grant: tuple[str, ...] = ("*",)
    except_: tuple[str, ...] = ()


def _pattern_re(patterns: Sequence[str]) -> re.Pattern:
    """ES field/index patterns support only ``*`` (FieldPermissions
    builds an automaton from exactly this grammar)."""
    alts = "|".join(
        ".*".join(re.escape(p) for p in pat.split("*")) for pat in patterns
    ) or "(?!)"
    return re.compile(f"^(?:{alts})$")


def role_applies(role: Role, index: str) -> bool:
    return bool(_pattern_re(role.indices).match(index))


def field_visible(field_name: str, roles: Sequence[Role],
                  id_col: str = "doc_id") -> bool:
    """Union-of-groups FLS check (FieldPermissions.grantsAccessTo):
    visible iff ANY role grants it, where a single role grants iff a
    grant pattern matches and no except pattern does."""
    if field_name == id_col:
        return True  # metadata fields are always readable
    for r in roles:
        if _pattern_re(r.grant).match(field_name) and not _pattern_re(
            r.except_
        ).match(field_name):
            return True
    return False


def dls_predicate(roles: Sequence[Role], resolve=None) -> Column:
    """Disjunction of the roles' DLS queries
    (DocumentPermissions.filter: bool with one should per query,
    minimum_should_match=1). A role without a query grants all docs."""
    preds = []
    for r in roles:
        if r.query is None:
            return F.lit(True)
        preds.append(compile_filter(r.query, resolve=resolve))
    if not preds:
        return F.lit(False)  # no applicable role: no documents
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def dls_predicate_sql(roles: Sequence[Role], sql_for_query) -> str:
    """DuckDB twin of ``dls_predicate``: caller supplies the per-query
    SQL (mirrors whatever twin the DSL entry uses)."""
    parts = []
    for r in roles:
        if r.query is None:
            return "TRUE"
        parts.append(f"({sql_for_query(r.query)})")
    return "(" + " OR ".join(parts) + ")" if parts else "FALSE"


def secured_search(
    df: DataFrame,
    roles: Sequence[Role],
    index: str = "docs",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a user's effective permissions to a search source: scope
    roles by index pattern, filter rows by the DLS disjunction, prune
    columns by union-FLS. Raises if no role grants the index at all
    (the reference's security exception, not an empty result)."""
    applicable = [r for r in roles if role_applies(r, index)]
    if not applicable:
        raise PermissionError(f"no role grants access to index {index!r}")
    cols = [c for c in df.columns if field_visible(c, applicable, id_col)]
    return df.filter(dls_predicate(applicable)).select(*cols)
