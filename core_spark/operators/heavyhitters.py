"""Guaranteed-exact frequent items (heavy hitters) without a
full-cardinality shuffle.

The classic two-pass distributed shape (Misra-Gries family): a tiny
candidate summary per input slice, then an exact recount of candidates
only. At 100 TB the naive `GROUP BY item HAVING count >= s*N` shuffles
EVERY distinct item (web-scale vocabularies and URL hosts rival the
corpus in cardinality); here the only shuffle carries candidate keys
plus one residual bucket per map partition.

Pass 1 — candidates (ONE Arrow stage, no shuffle): each Arrow batch
emits the items whose WITHIN-BATCH count reaches the threshold fraction
of the batch (``cnt * den >= num * batch_rows``). Pigeonhole guarantee:
if an item's global count is >= (num/den)*N over batches of sizes n_b,
some batch has count_b >= (num/den)*n_b — so the union of batch
summaries is a COMPLETE candidate superset (no false negatives, ever);
each batch contributes at most den/num items, so the union stays
broadcastable.

Pass 2 — exact recount (one bounded-key shuffle): every row is bucketed
to its item if it is a candidate, else to one NULL residual bucket (a
value no real candidate can collide with — pandas value_counts never
emits nulls); a hash-agg with map-side combine counts both, the grand
total N comes from summing the same aggregate (one-row broadcast cross
join, no window), and the final filter is pure BIGINT
cross-multiplication ``cnt * den >= num * N`` — no float, no second
scan for N.

Result: EXACTLY the items with global frequency >= num/den, with exact
counts — which is why the DuckDB oracle can be a plain GROUP BY /
HAVING. The corpus is scanned twice (candidates + recount), the same
documented trade as lmscore: re-reading a raw scan beats materializing
it.

No reference counterpart (specvital/core has no sketch subsystem);
mergeable-summary design follows the published Misra-Gries/SpaceSaving
literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from core_spark.plans.materialize import pin


def bucketed_counts(
    df: DataFrame, col: str = "item", num: int = 1, den: int = 100
) -> DataFrame:
    """Pass 1 + 2 UNPINNED: (item-or-NULL-residual, cnt) with the key
    space bounded by the candidate set. Exposed so tests can assert the
    broadcast-join plan shape before the pin truncates lineage."""
    import pandas as pd

    if not (0 < num < den):
        raise ValueError("threshold num/den must be in (0, 1)")
    # normalize the key to string so the candidate join's type always
    # matches the Arrow stage's string summary
    df = df.withColumn(col, F.col(col).cast("string"))

    def candidates(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            vc = pdf[col].value_counts()  # drops nulls — see module doc
            hits = vc[vc * den >= num * n]
            yield pd.DataFrame({"item": hits.index.astype(str)})

    cands = (
        df.select(col)
        .mapInPandas(candidates, "item string")
        .distinct()
        .withColumnRenamed("item", col)
        .withColumn("_hit", F.lit(1))
    )
    return (
        df.join(F.broadcast(cands), col, "left")
        .groupBy(F.when(F.col("_hit") == 1, F.col(col)).alias("item"))
        .agg(F.count("*").alias("cnt"))
    )


def frequent_items(
    df: DataFrame, col: str = "item", num: int = 1, den: int = 100
) -> DataFrame:
    """(item, cnt) for every item with count*den >= num*N — exact."""
    # bucketed is multi-consumer (grand total + final filter) and tiny
    # (bounded by the candidate set + one residual bucket) — pin it so
    # neither branch re-runs the scan + Arrow candidate stage
    # (CLAUDE.md multi-consumer rule; the broadcast-join plan shape is
    # asserted on the pre-pin stage in tests)
    bucketed = pin(bucketed_counts(df, col, num, den))
    total = bucketed.agg(F.sum("cnt").alias("_n"))
    return (
        bucketed.crossJoin(F.broadcast(total))
        .where(F.col("item").isNotNull())
        .where(F.col("cnt") * den >= num * F.col("_n"))
        .select("item", "cnt")
    )


def sql_frequent_items(
    table_sql: str, col: str = "item", num: int = 1, den: int = 100
) -> str:
    """DuckDB oracle: the definitionally-equivalent full GROUP BY /
    HAVING (affordable at oracle scale; the Spark plan exists to avoid
    exactly this shuffle at corpus scale)."""
    return f"""
SELECT {col} AS item, COUNT(*) AS cnt
FROM ({table_sql})
WHERE {col} IS NOT NULL
GROUP BY {col}
HAVING COUNT(*) * {den} >= {num} * (SELECT COUNT(*) FROM ({table_sql}))
"""
