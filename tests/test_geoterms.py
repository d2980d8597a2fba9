"""Per-cell distinctive terms: model parity both engines, cuts, plan."""

from __future__ import annotations

import math

import duckdb
import pytest

from core_spark.operators.geoterms import geo_terms, sql_geo_terms

# cell 1.0: west cell (0,0) talks about 'harbor', east cell (0,5)
# about 'mesa'; 'the' is everywhere (common -> ranked after rare terms)
DOCS = [
    (1, 0.1, 0.1, "the harbor boats harbor"),
    (2, 0.2, 0.3, "the harbor fish"),
    (3, 0.3, 0.5, "the boats"),
    (4, 0.1, 5.1, "the mesa trail"),
    (5, 0.2, 5.3, "the mesa sun"),
    (6, 0.3, 5.5, "the trail"),
    (7, 0.4, 5.7, "solo"),          # singleton term: cut by min_cell_df=2
    (8, None, 5.7, "dropped row"),  # NULL position
    (9, 0.5, 5.9, None),            # NULL text
]


def model(docs, g=1.0, k=3, min_cell_df=2):
    hits = set()
    for i, la, lo, text in docs:
        if la is None or lo is None:
            continue
        cell = (math.floor(la / g), math.floor(lo / g))
        for t in set((text or "").split(" ")):
            if t:
                hits.add((i, cell, t))
    gdf = {}
    for _, _, t in hits:
        gdf[t] = gdf.get(t, 0) + 1
    cell_tf = {}
    for _, cell, t in hits:
        cell_tf[(cell, t)] = cell_tf.get((cell, t), 0) + 1
    out = {}
    by_cell = {}
    for (cell, t), n in cell_tf.items():
        if n >= min_cell_df:
            by_cell.setdefault(cell, []).append((-n, gdf[t], t))
    for cell, entries in by_cell.items():
        for r, (nn, df, t) in enumerate(sorted(entries)[:k], start=1):
            out[(cell[0], cell[1], t)] = (-nn, df, r)
    return out


EXPECT = model(DOCS)


def test_model_hand_checks():
    # west: the(3) ranks FIRST on support; harbor(2, rarer) then boats(2)
    assert EXPECT[(0, 0, "the")] == (3, 6, 1)
    assert EXPECT[(0, 0, "boats")] == (2, 2, 2)   # df tie -> term asc
    assert EXPECT[(0, 0, "harbor")] == (2, 2, 3)
    # east: the(3) first, then mesa/trail (df tie -> term asc)
    assert EXPECT[(0, 5, "the")] == (3, 6, 1)
    assert EXPECT[(0, 5, "mesa")] == (2, 2, 2)
    assert EXPECT[(0, 5, "trail")] == (2, 2, 3)
    assert (0, 5, "solo") not in EXPECT
    assert len(EXPECT) == 6


def _vals():
    rows = ", ".join(
        f"({i}, "
        + ("NULL" if la is None else repr(la)) + ", "
        + ("NULL" if lo is None else repr(lo)) + ", "
        + ("NULL" if t is None else f"'{t}'") + ")"
        for i, la, lo, t in DOCS
    )
    return f"SELECT * FROM (VALUES {rows}) t(doc_id, lat, lon, text)"


@pytest.mark.parametrize("k,mdf", [(3, 2), (1, 2), (10, 1)])
def test_duckdb_twin_matches_model(k, mdf):
    got = {
        (r[0], r[1], r[2]): (r[3], r[4], r[5])
        for r in duckdb.sql(sql_geo_terms(_vals(), 1.0, k, mdf)).fetchall()
    }
    assert got == model(DOCS, k=k, min_cell_df=mdf)


@pytest.mark.spark
@pytest.mark.parametrize("k,mdf", [(3, 2), (10, 1)])
def test_spark_matches_model(spark, k, mdf):
    df = spark.createDataFrame(
        DOCS, "doc_id long, lat double, lon double, text string")
    got = {
        (r["cell_i"], r["cell_j"], r["term"]):
            (r["cell_df"], r["df"], r["rank"])
        for r in geo_terms(df, 1.0, k, mdf).collect()
    }
    assert got == model(DOCS, k=k, min_cell_df=mdf)


@pytest.mark.spark
def test_plan_window_group_limit(spark):
    """rank<=k compiles to WindowGroupLimit: only k rows per cell
    survive the window shuffle."""
    df = spark.createDataFrame(
        DOCS, "doc_id long, lat double, lon double, text string")
    plan = (
        geo_terms(df, 1.0, 3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        geo_terms(None, 0.0, 3)
    with pytest.raises(ValueError):
        geo_terms(None, 1.0, 0)
    with pytest.raises(ValueError):
        geo_terms(None, 1.0, 3, min_cell_df=0)
