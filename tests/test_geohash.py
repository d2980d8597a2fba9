"""Geohash: published vectors, dual-impl parity, prefix property, guards."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from core_spark.functions.geohash import (
    geohash_py,
    geohash_steps,
    with_geohash,
)

# Published test vectors (geohash.org / the original worked examples)
VECTORS = [
    (42.605, -5.603, 5, "ezs42"),
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (0.0, 0.0, 6, geohash_py(0.0, 0.0, 6)),
    (90.0, 180.0, 6, geohash_py(90.0, 180.0, 6)),     # top corner clamps
    (-90.0, -180.0, 6, "000000"),                      # bottom corner
]


def _duck_hash(lat: float, lon: float, precision: int) -> str | None:
    inner = f"SELECT CAST({lat!r} AS DOUBLE) AS lat, CAST({lon!r} AS DOUBLE) AS lon"
    for name, expr in geohash_steps("lat", "lon", precision, "duckdb"):
        inner = f"SELECT *, {expr} AS {name} FROM ({inner})"
    return duckdb.sql(f"SELECT geohash FROM ({inner})").fetchone()[0]


def test_published_vectors_model():
    for lat, lon, p, want in VECTORS:
        assert geohash_py(lat, lon, p) == want


def test_published_vectors_duckdb_emission():
    for lat, lon, p, want in VECTORS:
        assert _duck_hash(lat, lon, p) == want


@settings(max_examples=150, deadline=None)
@given(
    st.integers(-360, 360).map(lambda v: v * 0.25),
    st.integers(-720, 720).map(lambda v: v * 0.25),
    st.integers(1, 12),
)
def test_emission_matches_halving_model_fuzz(lat, lon, p):
    """Grid-aligned coords (exact binary fractions, so the floor path and
    the halving path cannot disagree by rounding) across the full range
    incl. out-of-bounds — emission == interval-halving model, or NULL
    exactly when out of range."""
    got = _duck_hash(lat, lon, p)
    if abs(lat) > 90.0 or abs(lon) > 180.0:
        assert got is None
    else:
        assert got == geohash_py(lat, lon, p)


def test_prefix_property():
    """The first k digits of a precision-p hash ARE the precision-k hash."""
    for lat, lon in [(42.605, -5.603), (57.64911, 10.40744), (-33.9, 151.2)]:
        full = geohash_py(lat, lon, 12)
        for k in range(1, 12):
            assert geohash_py(lat, lon, k) == full[:k]
            assert _duck_hash(lat, lon, k) == full[:k]


def test_nan_null_through_duckdb_emission():
    """NaN/NULL must flow to a NULL hash without a BIGINT-cast error in
    EITHER engine — the _quant-level guard, not just the output CASE
    (Spark 4 ANSI throws on CAST(NaN AS BIGINT) if a materialized step
    ever evaluates it)."""
    for lat in ("CAST('nan' AS DOUBLE)", "NULL::DOUBLE", "91.0::DOUBLE"):
        inner = f"SELECT {lat} AS lat, 10.0::DOUBLE AS lon"
        for name, expr in geohash_steps("lat", "lon", 6, "duckdb"):
            inner = f"SELECT *, {expr} AS {name} FROM ({inner})"
        assert duckdb.sql(f"SELECT geohash FROM ({inner})").fetchone()[0] is None


def test_rejects_bad_precision():
    with pytest.raises(ValueError):
        geohash_steps(precision=0)
    with pytest.raises(ValueError):
        geohash_steps(precision=13)


@pytest.mark.spark
def test_spark_matches_duckdb_and_model(spark):
    rows = [
        (i, lat, lon)
        for i, (lat, lon) in enumerate(
            [(42.605, -5.603), (57.64911, 10.40744), (0.25, 0.25),
             (-89.75, 179.75), (90.0, 180.0)]
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lat", "lon"])
    got = {
        r["doc_id"]: r["geohash"]
        for r in with_geohash(df, precision=9).collect()
    }
    for i, lat, lon in rows:
        assert got[i] == geohash_py(lat, lon, 9)
        assert got[i] == _duck_hash(lat, lon, 9)


@pytest.mark.spark
def test_null_nan_out_of_range_yield_null(spark):
    df = spark.createDataFrame(
        [(0, None, 10.0), (1, float("nan"), 10.0), (2, 91.0, 10.0),
         (3, 45.0, -180.5), (4, 45.0, 10.0)],
        "doc_id long, lat double, lon double",
    )
    got = {
        r["doc_id"]: r["geohash"]
        for r in with_geohash(df, precision=6).collect()
    }
    assert got[0] is None and got[1] is None
    assert got[2] is None and got[3] is None
    assert got[4] == geohash_py(45.0, 10.0, 6)
