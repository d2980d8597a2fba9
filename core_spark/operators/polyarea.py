"""Polygon area + centroid over ring columns: the shoelace, within-row.

Zonal statistics, density normalization (docs per km²), and boundary
QA all need polygon AREA; label placement and cell assignment of a
REGION need its CENTROID. Both are pure ring arithmetic (the shoelace
/ surveyor's formula), and over a ``rings array<array<array<double>>>``
column (exactly what sources/geojson.py emits) they are WITHIN-ROW
fold HOFs — no shuffle, no Python, no geometry library.

Portability note worth recording: these are DOUBLE sums, yet still
bit-identical cross-engine — ``aggregate``/``list_reduce`` folds are
SEQUENTIAL over array order on both engines (the bpe.py precedent),
so unlike a groupBy SUM the association order is pinned and the IEEE
result is reproducible. The oracle still compares through selfcheck's
9-decimal rounding, and the driver fixture uses exact binary-fraction
coordinates where the arithmetic is exact outright.

Semantics: ``area2_abs`` is TWICE the polygon area (the raw shoelace
magnitude — callers halve it; keeping the factor avoids a division on
every row), holes subtracted by magnitude so ring winding never
matters (GeoJSON's CCW-exterior/CW-hole rule is a SHOULD that
real-world data violates constantly). The centroid is the area
centroid of the OUTER ring (the label-point use case; hole-aware
centroids need the full decomposition and rarely matter for labels);
degenerate rings (zero area) yield NULL centroids rather than a
division blow-up. Rings are REQUIRED closed (first == last) — the
geojson source guarantees it and errors otherwise.

Planar over equirectangular lon/lat (degrees² — multiply by the
latitude-dependent km²-per-degree² factor downstream if physical
areas are needed; that factor needs cos and is deliberately outside
the oracled operator per the no-trig rule).

No reference counterpart (specvital/core has no spatial subsystem);
the formula is the classical surveyor's formula (Meister 1769).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _shoelace2(ring: str, dialect: str) -> str:
    """Signed 2·area of a closed ring — a sequential fold, both engines.

    Guarded for rings with < 2 positions: Spark's ``sequence(0, -1)``
    is DESCENDING and under ANSI mode a negative/out-of-range array
    index is an error, not NULL — a 1-point ring would crash the
    executor without the size gate (the geojson source never emits one,
    but this operator is public API).
    """
    if dialect == "spark":
        return (
            f"CASE WHEN size({ring}) < 2 THEN CAST(0.0 AS DOUBLE) ELSE"
            f" aggregate(sequence(0, size({ring}) - 2), CAST(0.0 AS DOUBLE),"
            f" (acc, i) -> acc + {ring}[i][0] * {ring}[i + 1][1]"
            f" - {ring}[i + 1][0] * {ring}[i][1]) END"
        )
    # DuckDB: 1-based lists; generate_series is inclusive
    return (
        f"CASE WHEN len({ring}) < 2 THEN CAST(0.0 AS DOUBLE) ELSE"
        f" list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(generate_series(1, len({ring}) - 1),"
        f" i -> {ring}[i][1] * {ring}[i + 1][2]"
        f" - {ring}[i + 1][1] * {ring}[i][2])),"
        f" (acc, x) -> acc + x) END"
    )


def _centroid_num(ring: str, axis: int, dialect: str) -> str:
    """Σ (c_i + c_{i+1}) · cross_i — the centroid numerator on axis 0/1."""
    if dialect == "spark":
        return (
            f"CASE WHEN size({ring}) < 2 THEN CAST(0.0 AS DOUBLE) ELSE"
            f" aggregate(sequence(0, size({ring}) - 2), CAST(0.0 AS DOUBLE),"
            f" (acc, i) -> acc + ({ring}[i][{axis}] + {ring}[i + 1][{axis}])"
            f" * ({ring}[i][0] * {ring}[i + 1][1]"
            f" - {ring}[i + 1][0] * {ring}[i][1])) END"
        )
    a = axis + 1
    return (
        f"CASE WHEN len({ring}) < 2 THEN CAST(0.0 AS DOUBLE) ELSE"
        f" list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(generate_series(1, len({ring}) - 1),"
        f" i -> ({ring}[i][{a}] + {ring}[i + 1][{a}])"
        f" * ({ring}[i][1] * {ring}[i + 1][2]"
        f" - {ring}[i + 1][1] * {ring}[i][2]))),"
        f" (acc, x) -> acc + x) END"
    )


def area_exprs(rings_col: str, dialect: str) -> dict[str, str]:
    """(name -> expr) for: n_rings, n_vertices, area2_abs, cx, cy.

    ``area2_abs`` = |outer| − Σ|holes| (winding-independent);
    cx/cy = outer-ring area centroid, NULL when the outer ring is
    degenerate. Same emission both dialects bar index base and fold
    spelling.
    """
    if dialect == "spark":
        outer = f"{rings_col}[0]"
        holes = f"slice({rings_col}, 2, size({rings_col}) - 1)"
        nverts = (
            f"aggregate({rings_col}, CAST(0 AS BIGINT),"
            f" (acc, r) -> acc + size(r))"
        )
        nrings = f"CAST(size({rings_col}) AS BIGINT)"
        hole_sum = (
            f"aggregate({holes}, CAST(0.0 AS DOUBLE),"
            f" (acc, h) -> acc + abs({_shoelace2('h', dialect)}))"
        )
    else:
        outer = f"{rings_col}[1]"
        holes = f"{rings_col}[2:]"
        nverts = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform({rings_col}, r -> CAST(len(r) AS BIGINT))),"
            f" (acc, x) -> acc + x)"
        )
        nrings = f"CAST(len({rings_col}) AS BIGINT)"
        hole_sum = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform({holes},"
            f" h -> abs({_shoelace2('h', dialect)}))),"
            f" (acc, x) -> acc + x)"
        )
    signed = _shoelace2(outer, dialect)
    # empty rings arrays: rings[0] is an ANSI error on Spark, so every
    # outer-ring expr is gated; NULL area/centroid, zero counts
    size_fn = "size" if dialect == "spark" else "len"
    empty = f"{size_fn}({rings_col}) = 0"
    return {
        "n_rings": nrings,
        "n_vertices": nverts,
        "area2_abs": (
            f"CASE WHEN {empty} THEN NULL ELSE"
            f" abs({signed}) - {hole_sum} END"
        ),
        # ordered WHENs, not OR: boolean OR need not short-circuit, and
        # the signed term indexes rings[0]
        "cx": (
            f"CASE WHEN {empty} THEN NULL"
            f" WHEN {signed} = 0.0 THEN NULL ELSE"
            f" {_centroid_num(outer, 0, dialect)} / (3.0 * {signed}) END"
        ),
        "cy": (
            f"CASE WHEN {empty} THEN NULL"
            f" WHEN {signed} = 0.0 THEN NULL ELSE"
            f" {_centroid_num(outer, 1, dialect)} / (3.0 * {signed}) END"
        ),
    }


def polygon_area(df: DataFrame, rings_col: str = "rings") -> DataFrame:
    """Append n_rings, n_vertices, area2_abs, cx, cy per polygon row."""
    out = df
    for name, expr in area_exprs(rings_col, "spark").items():
        out = out.withColumn(name, F.expr(expr))
    return out
