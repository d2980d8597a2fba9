"""Colocation PI: Python-model parity on both engines, hand values on
a planted colocated/segregated fixture, distinct-participation
invariant, hygiene."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.colocation import colocation_pi, sql_colocation_pi

R = 1.5


def model(rows, radius=R):
    clean = [r for r in rows if all(v is not None for v in r)]
    pairs = []
    for i in range(len(clean)):
        for j in range(i + 1, len(clean)):
            k1, c1, la1, lo1 = clean[i]
            k2, c2, la2, lo2 = clean[j]
            d2 = (la1 - la2) ** 2 + (lo1 - lo2) ** 2
            if c1 != c2 and d2 < radius * radius:
                lo, hi = sorted((c1, c2))
                pairs.append((lo, hi, (k1, c1), (k2, c2)))
    totals = {}
    for _, c, _, _ in clean:
        totals[c] = totals.get(c, 0) + 1
    out = {}
    keys = sorted({(lo, hi) for lo, hi, _, _ in pairs})
    for lo, hi in keys:
        ps = [(a, b) for l2, h2, a, b in pairs if (l2, h2) == (lo, hi)]
        members = {m for a, b in ps for m in (a, b)}
        pa = sum(1 for k, c in members if c == lo)
        pb = sum(1 for k, c in members if c == hi)
        na, nb = totals[lo], totals[hi]
        pra, prb = pa / na, pb / nb
        out[(lo, hi)] = (len(ps), pa, pb, na, nb, pra, prb, min(pra, prb))
    return out


# A at x=0..4 (step 1), B at the same spots offset 0.5 (always within
# R), C far away except ONE instance near A's x=0 — pr asymmetry live.
ROWS = (
    [(i, "A", float(i), 0.0) for i in range(5)]
    + [(10 + i, "B", float(i) + 0.5, 0.0) for i in range(5)]
    + [(20 + i, "C", 100.0 + 10 * i, 50.0) for i in range(4)]
    + [(30, "C", 0.0, 1.0)]
    + [(40, None, 0.0, 0.0), (None, "A", 0.0, 0.0),
       (41, "A", None, 0.0), (42, "A", 0.0, None)]
)


def test_model_hand_checks():
    m = model(ROWS)
    # every A has a B neighbor and vice versa
    assert m[("A", "B")][5] == 1.0 and m[("A", "B")][6] == 1.0
    assert m[("A", "B")][7] == 1.0
    # exactly one C colocates, reaching A0 (dist 1) and A1 (dist √2):
    # pr(A) = 2/5 but pr(C) = 1/5 — PI takes the weaker side
    n_pairs, pa, pb, na, nb, pra, prb, pi = m[("A", "C")]
    assert (n_pairs, pa, pb, na, nb) == (2, 2, 1, 5, 5)
    assert pi == 0.2
    assert ("B", "C") in m          # B at 0.5 is within 1.5 of C(0,1)


def _vals(rows):
    sql_rows = ", ".join(
        "(" + ", ".join(
            "NULL" if v is None else (f"'{v}'" if isinstance(v, str) else repr(v))
            for v in r) + ")"
        for r in rows
    )
    return (f"SELECT * FROM (VALUES {sql_rows})"
            " t(doc_id, cat, lat, lon)")


def _key(r):
    return (r[0], r[1])


def test_duckdb_twin_matches_model():
    got = {
        (r[0], r[1]): tuple(r[2:])
        for r in duckdb.sql(sql_colocation_pi(_vals(ROWS), R)).fetchall()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_spark_matches_model(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id long, cat string, lat double, lon double")
    got = {
        (r["cat_a"], r["cat_b"]): (
            r["n_pairs"], r["part_a"], r["part_b"], r["n_a"], r["n_b"],
            r["pr_a"], r["pr_b"], r["pi"])
        for r in colocation_pi(df, R, cat_col="cat").collect()
    }
    assert got == model(ROWS)


@pytest.mark.spark
def test_engines_bit_identical(spark):
    rows = [
        (i, f"t{i % 4}", float((i * 3) % 17) * 0.5,
         float((i * 7) % 13) * 0.5)
        for i in range(250)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, cat string, lat double, lon double")
    srows = sorted(
        tuple(r) for r in colocation_pi(df, R, cat_col="cat").collect())
    orows = sorted(
        tuple(r)
        for r in duckdb.sql(sql_colocation_pi(_vals(rows), R)).fetchall()
    )
    assert srows == orows


@pytest.mark.spark
def test_empty_and_validation(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, cat string, lat double, lon double")
    assert colocation_pi(empty, R, cat_col="cat").count() == 0
    with pytest.raises(ValueError):
        colocation_pi(empty, 0.0, cat_col="cat")
