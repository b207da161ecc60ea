"""Completion suggester with contexts + fuzzy prefix.

Reference: server/.../search/suggest/completion/ —
CompletionSuggestionBuilder (prefix / fuzzy options), ContextMappings +
CategoryContextMapping (category contexts filter candidates and can
boost them), FuzzyCompletionQuery (edit-distance prefix matching with
``prefix_length`` exact chars and ``min_length`` gating).

Spark-first: suggestions live in an ordinary DataFrame
(suggestion string, weight long, contexts array<string>) — the
reference's dedicated suggest field — and suggest() is a filter +
score projection + top-k over it, all JVM-side (levenshtein and the
prefix tests are codegen expressions; no UDF). The FST's role is
played by predicate pushdown on the suggestion column: a parquet
suggestion table sorted by suggestion prefix-prunes row groups.

Scoring follows the reference: score = weight, multiplied by the best
matching context boost; candidates are deduplicated by suggestion
keeping the highest score (skip_duplicates=true).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def completion_suggest(
    suggestions: DataFrame,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
    fuzzy_prefix_length: int = 1,
    fuzzy_min_length: int = 3,
    contexts: dict[str, float] | None = None,
) -> DataFrame:
    """Top-``size`` completion options for ``prefix``.

    ``fuzziness`` allows up to that many edits in the typed prefix once
    it reaches ``fuzzy_min_length`` chars, with the first
    ``fuzzy_prefix_length`` chars required exact
    (FuzzyCompletionQuery's unicode-aware defaults). Edits may insert
    or delete, so the candidate's compared prefix length ranges over
    len(prefix) +/- fuzziness — the minimum levenshtein over that
    window decides the match.

    ``contexts`` maps context value -> boost; when given, only
    suggestions carrying at least one requested context survive, scored
    with the BEST matching boost (CategoryQueryContext semantics).

    Returns (suggestion, score) ordered score desc, suggestion asc.
    """
    p = prefix.lower()
    s = F.lower(F.col("suggestion"))
    n = len(p)

    if fuzziness > 0 and n >= fuzzy_min_length:
        head = p[:fuzzy_prefix_length]
        cands = []
        for length in range(max(n - fuzziness, fuzzy_prefix_length),
                            n + fuzziness + 1):
            cands.append(F.levenshtein(F.substring(s, 1, length), F.lit(p)))
        dist = F.least(*cands) if len(cands) > 1 else cands[0]
        matches = (
            F.substring(s, 1, fuzzy_prefix_length) == F.lit(head)
        ) & (dist <= F.lit(fuzziness))
    else:
        matches = s.startswith(p)

    out = suggestions.where(matches)
    score = F.col("weight").cast("double")
    if contexts:
        pairs = sorted(contexts.items())
        boost = F.lit(None).cast("double")
        # best (max) boost over the matching requested contexts
        boost = F.array_max(F.filter(
            F.array(*[
                F.when(F.array_contains(F.col("contexts"), F.lit(v)),
                       F.lit(float(b)))
                for v, b in pairs
            ]),
            lambda x: x.isNotNull(),
        ))
        out = out.where(boost.isNotNull())
        score = score * boost
    out = out.select(F.col("suggestion"), score.alias("score"))
    # skip_duplicates: one option per suggestion, best score
    out = out.groupBy("suggestion").agg(F.max("score").alias("score"))
    return out.orderBy(F.desc("score"), F.asc("suggestion")).limit(size)


def completion_suggest_sql(
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
    fuzzy_prefix_length: int = 1,
    fuzzy_min_length: int = 3,
    contexts: dict[str, float] | None = None,
    table: str = "suggestions",
    round_decimals: int | None = None,
) -> str:
    """DuckDB twin of :func:`completion_suggest` over a table with the
    same (suggestion, weight, contexts) columns."""
    p = prefix.lower().replace("'", "''")
    n = len(p)
    if fuzziness > 0 and n >= fuzzy_min_length:
        head = p[:fuzzy_prefix_length].replace("'", "''")
        dists = ", ".join(
            f"levenshtein(substr(lower(suggestion), 1, {length}), '{p}')"
            for length in range(max(n - fuzziness, fuzzy_prefix_length),
                                n + fuzziness + 1)
        )
        match = (
            f"substr(lower(suggestion), 1, {fuzzy_prefix_length}) = '{head}'"
            f" AND least({dists}) <= {fuzziness}"
        )
    else:
        match = f"lower(suggestion) LIKE '{p}%'"
    if contexts:
        pairs = sorted(contexts.items())
        boosts = ", ".join(
            f"CASE WHEN list_contains(contexts, '{v}') "
            f"THEN {float(b)!r} END" for v, b in pairs
        )
        score = f"weight * list_max(list_filter([{boosts}], x -> x IS NOT NULL))"
        ctx_filter = " AND (" + " OR ".join(
            f"list_contains(contexts, '{v}')" for v, _ in pairs) + ")"
    else:
        score = "CAST(weight AS DOUBLE)"
        ctx_filter = ""
    agg = f"max({score})"
    if round_decimals is not None:
        agg = f"round({agg}, {round_decimals})"
    return f"""
SELECT suggestion, {agg} AS score
FROM {table}
WHERE {match}{ctx_filter}
GROUP BY suggestion
ORDER BY score DESC, suggestion ASC
LIMIT {size}
"""


# -- geo contexts (GeoContextMapping / GeoQueryContext) ----------------

def _geohash_from_indices(lon_idx: int, lat_idx: int,
                          precision: int) -> str:
    from elasticsearch_spark.search.geo import GEOHASH32, _grid_indices

    total, nlon, nlat = _grid_indices(precision)
    combined = 0
    for i in range(total):
        if i % 2 == 0:
            bit = (lon_idx >> (nlon - 1 - i // 2)) & 1
        else:
            bit = (lat_idx >> (nlat - 1 - i // 2)) & 1
        combined |= bit << (total - 1 - i)
    return "".join(
        GEOHASH32[(combined >> (total - 5 * (c + 1))) & 31]
        for c in range(precision))


def geo_query_cells(lat: float, lon: float, precision: int = 4,
                    neighbours: bool = True) -> list[str]:
    """Geohash cell of a GeoQueryContext point plus (by default) its 8
    neighbours at the same precision — the reference's
    GeoContextMapping query expansion (GeoContextMapping.java
    toInternalQueryContexts adds neighbours so a point near a cell
    edge still matches suggestions indexed in the adjacent cell).

    Uses the SAME cell-index formula as search.geo.geohash (the
    Catalyst/SQL encoder), so driver-side query cells and doc-side
    indexed cells agree bit-for-bit.
    """
    from elasticsearch_spark.search.geo import _grid_indices

    _total, nlon, nlat = _grid_indices(precision)
    lon_idx = min(int((lon + 180.0) / 360.0 * (1 << nlon)),
                  (1 << nlon) - 1)
    lat_idx = min(int((lat + 90.0) / 180.0 * (1 << nlat)),
                  (1 << nlat) - 1)
    cells = [_geohash_from_indices(lon_idx, lat_idx, precision)]
    if neighbours:
        for dlat in (-1, 0, 1):
            for dlon in (-1, 0, 1):
                if dlat == 0 and dlon == 0:
                    continue
                la = lat_idx + dlat
                if not (0 <= la < (1 << nlat)):
                    continue  # no cell beyond the poles
                lo = (lon_idx + dlon) % (1 << nlon)  # date line wraps
                cells.append(_geohash_from_indices(lo, la, precision))
    return cells


def index_geo_contexts(lat_col: str, lon_col: str, precision: int = 4):
    """Column expression for the doc-side geo context array: the
    suggestion's point encoded at the mapping precision
    (GeoContextMapping index-time path). Attach as the
    ``geo_contexts`` column of a suggestion table."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.search.geo import geohash

    return F.array(geohash(lat_col, lon_col, precision))


def completion_suggest_geo(
    suggestions: DataFrame,
    prefix: str,
    lat: float,
    lon: float,
    size: int = 5,
    precision: int = 4,
    boost: float = 1.0,
    neighbours: bool = True,
    fuzziness: int = 0,
    context_col: str = "geo_contexts",
) -> DataFrame:
    """Completion suggest filtered/boosted by a geo context point: only
    suggestions whose indexed cell is the query point's cell (or a
    neighbour) survive, scored weight * boost. Reduces to the category
    machinery over the expanded cell set — one filter + top-k, no
    distance computation at query time (exactly the reference's
    geohash-prefix containment model)."""
    cells = geo_query_cells(lat, lon, precision, neighbours)
    renamed = suggestions.withColumn(
        "contexts", F.col(context_col)) if context_col != "contexts" \
        else suggestions
    return completion_suggest(
        renamed, prefix, size=size, fuzziness=fuzziness,
        contexts={c: boost for c in cells})


def completion_suggest_geo_sql(
    prefix: str,
    lat: float,
    lon: float,
    size: int = 5,
    precision: int = 4,
    boost: float = 1.0,
    neighbours: bool = True,
    table: str = "suggestions",
    context_col: str = "geo_contexts",
    round_decimals: int | None = None,
) -> str:
    """DuckDB twin of :func:`completion_suggest_geo`."""
    cells = geo_query_cells(lat, lon, precision, neighbours)
    inner = completion_suggest_sql(
        prefix, size=size, contexts={c: boost for c in cells},
        table=f"(SELECT suggestion, weight, {context_col} AS contexts "
              f"FROM {table})",
        round_decimals=round_decimals)
    return inner
