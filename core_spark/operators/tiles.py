"""G3/G4 operators — tile assignment (HX res 5-9 + S2) as DataFrame stages.

Assignment is pure Column arithmetic (hexgrid.sql_cell via F.expr): stays in
whole-stage codegen, never leaves the JVM, and survives any partitioning —
exactly the property needed at 10^12 rows. S2 (functions/s2.py) is the one
numpy UDF stage, kept optional.

Reference analog: per-file framework stamping before aggregation
(pkg/parser/scanner.go:567-618 parseFile -> TestFile.Framework).
"""

from __future__ import annotations

from core_spark.functions import hexgrid as hx

DEFAULT_RESOLUTIONS = (5, 6, 7, 8, 9)


def assign_tiles(df, lat_col: str = "lat", lon_col: str = "lon",
                 resolutions=DEFAULT_RESOLUTIONS, s2_level: int | None = None):
    """Append h3_r{res} cell-id columns (and optionally s2_cell).

    NULL-safe: invalid/missing coordinates produce NULL cells, which
    groupBy/join naturally segregate (error-as-data).
    """
    out = df
    for res in resolutions:
        out = hx.apply_steps(out, hx.cell_steps(lat_col, lon_col, res, f"h3_r{res}"))
    if s2_level is not None:
        from core_spark.functions.s2 import s2_cell_col

        out = out.withColumn("s2_cell", s2_cell_col(lat_col, lon_col, s2_level))
    return out


def rollup_tiles(df, cell_col: str, levels: int):
    """Append parent columns for ``levels`` coarser resolutions via the exact
    aperture-7 parent relation (no re-assignment — H3-cellToParent semantics)."""
    out = df
    cur = cell_col
    for _ in range(levels):
        nxt = f"{cur}_p"
        out = hx.apply_steps(out, hx.parent_steps(cur, nxt))
        cur = nxt
    return out
