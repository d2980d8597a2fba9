"""Count-Min sketch: mergeable approximate frequencies in fixed space.

Third member of the sketch family (cardsketch.py: linear counting + HLL
answer "how many DISTINCT"; qsketch.py answers "what quantile"); CMS
(Cormode & Muthukrishnan 2005) answers "how often does item x occur"
from d·w BIGINT counters, regardless of item cardinality. At 10^12 rows
an exact per-item count table rivals the corpus (the same wall
heavyhitters.py documents); the CMS state is a few KB, is MERGEABLE by
plain per-cell addition (shards, days, micro-batches), and can answer
point queries decided AFTER the scan — the two properties the exact
two-pass heavy-hitter operator fundamentally lacks (it needs the
threshold up front and a second pass over the corpus).

Guarantee: est(x) >= true(x) always (counters only ever add), and
est(x) <= true(x) + eps*N with probability 1 - delta for w = ceil(e/eps),
d = ceil(ln(1/delta)) — the textbook bound; the overestimate direction
is pinned as a property test under forced collisions.

Plan shape at 100 TB: build = within-row explode (×d, d is 3-4) into
(row_hash_r) cells, then ONE hash-agg whose key space is bounded by
d·w cells — map-side combine crushes every partition's contribution to
at most d·w rows before the shuffle, so the exchange carries KBs no
matter the input size. Probing joins the probe directory against the
BROADCAST counter table (d·w rows) and takes a per-item MIN — no
shuffle of the corpus, ever. Merging shard sketches = one hash-agg
summing per-cell counts (partition-invariance and shard-union identity
pinned in tests, same discipline as HLL's register MAX).

Portability: cells come from the repo's 60-bit md5 slice, counts are
BIGINT — every compared value is exact on both engines; the DuckDB
twin is the same construction, so the oracle gates the FULL sketch
state plus the estimates, not a summary.

No reference counterpart (specvital/core has no sketch subsystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = ":cms"


def _cell(key_sql: str, w: int, dialect: str) -> str:
    """Hash-row-r cell index in [0, w): md5(key || ':cms' || r)."""
    if dialect == "spark":
        return (
            f"CAST(conv(substr(md5(CAST({key_sql} AS STRING) || '{_SALT}' ||"
            f" CAST(r AS STRING)), 1, 15), 16, 10) AS BIGINT) % {w}"
        )
    return (
        f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || '{_SALT}' ||"
        f" CAST(r AS VARCHAR)), 1, 15))::BIGINT % {w}"
    )


def cms_counters(
    df: DataFrame, key_sql: str, d: int = 4, w: int = 512
) -> DataFrame:
    """(r, c, cnt): the sketch state — one row per non-zero counter.

    d hash rows × w columns; counter (r, c) holds the number of input
    rows whose row-r hash lands in column c. Absent cells are zero.
    """
    if d < 1 or w < 1:
        raise ValueError(f"cms: d and w must be >= 1, got d={d} w={w}")
    # NULL keys hash to NULL cells — phantom state rows no probe can
    # ever reach; dropped on ingest (twin too), same as redirects.
    cell = _cell("_k", w, "spark")
    return (
        df.selectExpr(f"{key_sql} AS _k")
        .where("_k IS NOT NULL")
        .selectExpr("_k", f"explode(sequence(0, {d - 1})) AS r")
        .selectExpr("r", f"{cell} AS c")
        .groupBy("r", "c")
        .agg(F.count("*").alias("cnt"))
    )


def merge_cms(*counter_dfs: DataFrame) -> DataFrame:
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)): per-cell SUM."""
    it = iter(counter_dfs)
    out = next(it)
    for other in it:
        out = out.unionByName(other)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    d: int = 4,
    w: int = 512,
) -> DataFrame:
    """(item, cms_est): point-query estimates, est = min over the d rows.

    ``counters`` (≤ d·w rows) is broadcast; the probe directory never
    shuffles. Items absent from the sketch estimate to the smallest
    counter their cells collide into (>= 0; == 0 when any cell is
    empty) — the overestimate direction of the CMS guarantee.
    """
    cell = _cell(item_col, w, "spark")
    probes = items.where(
        F.col(item_col).isNotNull()
    ).selectExpr(
        item_col, f"explode(sequence(0, {d - 1})) AS r"
    ).selectExpr(item_col, "r", f"{cell} AS c")
    return (
        probes.join(F.broadcast(counters), ["r", "c"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def sql_cms_counters(
    table_sql: str, key_sql: str, d: int = 4, w: int = 512
) -> str:
    """DuckDB twin of :func:`cms_counters` — same cells, same counts."""
    if d < 1 or w < 1:
        raise ValueError(f"cms: d and w must be >= 1, got d={d} w={w}")
    cell = _cell("_k", w, "duckdb")
    return f"""
        SELECT r, {cell} AS c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT {key_sql} AS _k FROM ({table_sql})
              WHERE {key_sql} IS NOT NULL)
        CROSS JOIN generate_series(0, {d - 1}) t(r)
        GROUP BY r, {cell}
    """


def sql_cms_estimate(
    counters_sql: str,
    items_sql: str,
    item_col: str = "item",
    d: int = 4,
    w: int = 512,
) -> str:
    """DuckDB twin of :func:`cms_estimate` over a counters relation."""
    return f"""
        SELECT {item_col},
               CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_est
        FROM (
          SELECT i.{item_col}, t.r, {_cell(f"i.{item_col}", w, "duckdb")} AS c
          FROM ({items_sql}) i
          CROSS JOIN generate_series(0, {d - 1}) t(r)
        ) p
        LEFT JOIN ({counters_sql}) s ON s.r = p.r AND s.c = p.c
        GROUP BY {item_col}
    """
