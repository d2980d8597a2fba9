"""k-anonymity audit: how re-identifiable is this release?

The standard privacy-risk audit (Sweeney 2002): rows sharing a
quasi-identifier combination (language x length bucket x region...)
form an equivalence class; a release is k-anonymous when every class
holds >= k rows. The audit reports the violating mass — classes
under k, the rows they expose, the worst class size — the number a
data-release review gates on BEFORE publishing a training corpus
(the pii.py family redacts direct identifiers; this measures the
INDIRECT identification surface that remains).

All-integer: class sizes, violating counts and exposed-row sums are
exact BIGINT hash-agg outputs; risk_share = rows_at_risk/n_rows is
the ONE trailing IEEE division, NULL on an empty release. NULL
quasi-identifier values form their own class (both engines group
NULLs together, and NULL is itself identifying — dropping such rows
would understate risk).

Scale shape: ONE hash-agg on the uniform quasi-identifier tuple
(map-side combine eats the row stream), then ONE 1-row conditional
re-agg. No window, no join, no collect.

The DuckDB twin is the INDEPENDENT count-of-counts plan (the
richness twin's pattern): class sizes -> a frequency-of-frequencies
grain -> filtered sums over THAT table.

No reference counterpart (specvital/core has no privacy subsystem);
the definition is the published k-anonymity formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# identical final projection text on both engines
_FINAL = (
    "CAST(k AS BIGINT) AS k",
    "CAST(n_rows AS BIGINT) AS n_rows",
    "CAST(n_groups AS BIGINT) AS n_groups",
    "CAST(n_violating AS BIGINT) AS n_violating",
    "CAST(rows_at_risk AS BIGINT) AS rows_at_risk",
    "CAST(min_group AS BIGINT) AS min_group",
    "CASE WHEN n_rows <> 0 THEN"
    " CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)"
    " END AS risk_share",
)


def k_anonymity(
    rows: DataFrame, quasi_cols: tuple[str, ...], k: int
) -> DataFrame:
    """One row (k, n_rows, n_groups, n_violating, rows_at_risk,
    min_group, risk_share): the k-anonymity audit of ``rows`` under
    the ``quasi_cols`` quasi-identifier tuple; NULL quasi values form
    their own class; min_group is 0 on an empty release."""
    quasi_cols = tuple(quasi_cols)
    if not quasi_cols or int(k) < 2:
        raise ValueError(
            f"k_anonymity: need >= 1 quasi column and k >= 2,"
            f" got {quasi_cols!r}, {k}")
    k = int(k)
    per = rows.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").cast("long").alias("c"))
    agg = per.agg(
        F.expr("CAST(COALESCE(SUM(c), 0) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_groups"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN c < {k} THEN 1 ELSE 0 END), 0)"
            " AS BIGINT)").alias("n_violating"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN c < {k} THEN c ELSE 0 END), 0)"
            " AS BIGINT)").alias("rows_at_risk"),
        F.expr("CAST(COALESCE(MIN(c), 0) AS BIGINT)").alias("min_group"),
    )
    return agg.selectExpr(f"{k} AS k", "*").selectExpr(*_FINAL)


# identical final projection text for the l-diversity audit
_L_FINAL = (
    "CAST(l AS BIGINT) AS l",
    "CAST(n_rows AS BIGINT) AS n_rows",
    "CAST(n_groups AS BIGINT) AS n_groups",
    "CAST(n_violating AS BIGINT) AS n_violating",
    "CAST(rows_at_risk AS BIGINT) AS rows_at_risk",
    "CAST(min_diversity AS BIGINT) AS min_diversity",
    "CASE WHEN n_rows <> 0 THEN"
    " CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE)"
    " END AS risk_share",
)


def l_diversity(
    rows: DataFrame,
    quasi_cols: tuple[str, ...],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """One row (l, n_rows, n_groups, n_violating, rows_at_risk,
    min_diversity, risk_share): the (distinct) l-diversity audit
    (Machanavajjhala 2007) — equivalence classes whose SENSITIVE
    column takes < l distinct values leak the attribute even when
    k-anonymous; NULL sensitive values count as a value (they leak
    "unknown", which is information). Two-level distinct plan: ONE
    distinct on the uniform (quasi..., sensitive) grain (the
    termstats rule — never a memory-heavy COUNT(DISTINCT) agg at
    scale), re-aggregated to per-class diversity, row counts joined
    from a parallel hash-agg on the same uniform tuple."""
    quasi_cols = tuple(quasi_cols)
    if not quasi_cols or int(l) < 2:
        raise ValueError(
            f"l_diversity: need >= 1 quasi column and l >= 2,"
            f" got {quasi_cols!r}, {l}")
    l = int(l)
    qcols = [F.col(c) for c in quasi_cols]
    div = (
        rows.select(*qcols, F.col(sensitive_col))
        .distinct()
        .groupBy(*qcols)
        .agg(F.count("*").cast("long").alias("ldiv"))
    )
    cnt = rows.groupBy(*qcols).agg(
        F.count("*").cast("long").alias("c"))
    per = cnt.join(div, list(quasi_cols))
    agg = per.agg(
        F.expr("CAST(COALESCE(SUM(c), 0) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_groups"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN ldiv < {l} THEN 1 ELSE 0 END),"
            " 0) AS BIGINT)").alias("n_violating"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN ldiv < {l} THEN c ELSE 0 END),"
            " 0) AS BIGINT)").alias("rows_at_risk"),
        F.expr("CAST(COALESCE(MIN(ldiv), 0) AS BIGINT)").alias(
            "min_diversity"),
    )
    return agg.selectExpr(f"{l} AS l", "*").selectExpr(*_L_FINAL)


def sql_l_diversity(
    rows_sql: str,
    quasi_cols: tuple[str, ...],
    sensitive_col: str,
    l: int,
) -> str:
    """DuckDB twin via the INDEPENDENT one-pass plan: a direct
    COUNT(DISTINCT sensitive) per class (no two-level distinct, no
    join); same final projection text. NULL sensitive counts as a
    value on both engines (COALESCE-tagged before the distinct)."""
    quasi_cols = tuple(quasi_cols)
    l = int(l)
    cols = ", ".join(quasi_cols)
    # COUNT(DISTINCT x) ignores NULL; add back a NULL-presence term so
    # NULL counts as a value (no sentinel string can collide this way)
    ldiv = (
        f"COUNT(DISTINCT {sensitive_col})"
        f" + MAX(CASE WHEN {sensitive_col} IS NULL THEN 1 ELSE 0 END)"
    )
    return f"""
        WITH per AS (
          SELECT {cols},
                 CAST(COUNT(*) AS BIGINT) AS c,
                 CAST({ldiv} AS BIGINT) AS ldiv
          FROM ({rows_sql}) s
          GROUP BY {cols}
        ),
        agg AS (
          SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_groups,
                 CAST(COALESCE(SUM(CASE WHEN ldiv < {l} THEN 1 ELSE 0
                   END), 0) AS BIGINT) AS n_violating,
                 CAST(COALESCE(SUM(CASE WHEN ldiv < {l} THEN c ELSE 0
                   END), 0) AS BIGINT) AS rows_at_risk,
                 CAST(COALESCE(MIN(ldiv), 0) AS BIGINT) AS min_diversity
          FROM per
        )
        SELECT {", ".join(_L_FINAL)} FROM (
          SELECT {l} AS l, * FROM agg
        ) t
    """


def sql_k_anonymity(
    rows_sql: str, quasi_cols: tuple[str, ...], k: int
) -> str:
    """DuckDB twin via the INDEPENDENT count-of-counts plan: class
    sizes -> (c, n_classes) frequency-of-frequencies -> filtered sums
    over that grain; same final projection text. ``rows_sql`` must
    yield the quasi columns."""
    quasi_cols = tuple(quasi_cols)
    k = int(k)
    cols = ", ".join(quasi_cols)
    return f"""
        WITH per AS (
          SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS c
          FROM ({rows_sql}) s
          GROUP BY {cols}
        ),
        foff AS (
          SELECT c, CAST(COUNT(*) AS BIGINT) AS m
          FROM per GROUP BY c
        ),
        agg AS (
          SELECT CAST(COALESCE(SUM(c * m), 0) AS BIGINT) AS n_rows,
                 CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n_groups,
                 CAST(COALESCE(SUM(m) FILTER (WHERE c < {k}), 0)
                   AS BIGINT) AS n_violating,
                 CAST(COALESCE(SUM(c * m) FILTER (WHERE c < {k}), 0)
                   AS BIGINT) AS rows_at_risk,
                 CAST(COALESCE(MIN(c), 0) AS BIGINT) AS min_group
          FROM foff
        )
        SELECT {", ".join(_FINAL)} FROM (
          SELECT {k} AS k, * FROM agg
        ) t
    """
