"""Bucketed document tables: co-located storage on the cell id.

At 10^12 rows the zonal rollup's one shuffle — hash(cell) — is the dominant
network cost. Bucketing the docs table BY CELL at write time moves that
shuffle into the (one-off) ingestion job: a bucketed scan reports
``HashPartitioning(cell)``, which satisfies the clustering requirement of
any aggregate grouping on (cell, ...) and of equi-joins on cell — Catalyst
plans NO Exchange (verified against the physical plan in
tests/test_bucketed.py).

This is the Spark-native equivalent of an Iceberg table partitioned by
``bucket(N, cell)``; the write path here uses the session catalog
(``saveAsTable`` — bucket metadata lives in the metastore, which is why a
plain ``.parquet(path)`` write cannot express it).

Scale sizing: buckets ~= target parallelism of downstream aggregations;
cell ids are uniform (hex lattice), so buckets balance except for mega-cells
— which the two-phase zonal aggregation already pre-combines map-side.
"""

from __future__ import annotations


def write_bucketed_docs(df, table: str, n_buckets: int, cell_col: str,
                        path: str | None = None, sort: bool = True):
    """Write ``df`` bucketed (and optionally sorted) by ``cell_col``."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, cell_col)
    if sort:
        w = w.sortBy(cell_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def zonal_rollup_bucketed(spark, table: str, cell_col: str, lang_col: str = "lang"):
    """Per-cell rollup over a bucketed table — plans with zero Exchange."""
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .groupBy(cell_col, lang_col)
        .agg(F.count("*").alias("n"))
    )


def join_bucketed(spark, left_table: str, right_table: str, key: str):
    """Co-located equi-join of two tables bucketed on the SAME key with
    the SAME bucket count — the canonical shuffle-free big-join layout.

    Both scans report ``HashPartitioning(key, n)``, so the sort-merge
    join's clustering requirement is already satisfied on BOTH sides and
    Catalyst plans ZERO Exchange (pinned in tests/test_bucketed.py) —
    at 100 TB this is the difference between re-shuffling two petabyte
    fact tables per join and streaming co-located bucket pairs. With
    ``sortBy`` at write time the per-bucket sort is pre-paid too.

    This is fact-to-fact joining (doc table x per-doc feature table);
    for small dimension sides, ``broadcast()`` remains the right tool —
    bucketing earns its ingestion-time shuffle only when BOTH sides are
    too big to broadcast and the join repeats.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def has_exchange(df) -> bool:
    """Does the physical plan contain a shuffle Exchange? (test/audit aid)

    Matches EVERY shuffle flavor — hashpartitioning, rangepartitioning,
    SinglePartition — but not BroadcastExchange (a broadcast is not a
    shuffle). A hash-only substring check would let a rangepartitioning
    or global-agg shuffle creep back into a pinned zero-Exchange plan.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return bool(re.search(r"(?<!Broadcast)Exchange", plan))
