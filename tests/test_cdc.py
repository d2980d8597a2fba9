"""Battery for operators/cdc.py — MERGE INTO / SCD1 changelog apply."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.cdc import cdc_merge, sql_cdc_merge

pytestmark = pytest.mark.spark


def _dfs(spark, base, changes):
    b = spark.createDataFrame(base, "key BIGINT, val BIGINT")
    c = spark.createDataFrame(
        changes, "key BIGINT, op STRING, seq BIGINT, val BIGINT")
    return b, c


def _got(spark, base, changes):
    b, c = _dfs(spark, base, changes)
    return {r.key: r.val for r in cdc_merge(b, c).collect()}


def test_upsert_delete_carry(spark):
    got = _got(
        spark,
        [(1, 10), (2, 20), (3, 30)],
        [(2, "U", 100, 21),        # update existing
         (3, "D", 101, None),      # delete existing
         (4, "I", 102, 40),        # insert new
         (5, "D", 103, None)],     # delete absent key: idempotent no-op
    )
    assert got == {1: 10, 2: 21, 4: 40}


def test_highest_seq_wins_within_key(spark):
    got = _got(
        spark,
        [(1, 10)],
        [(1, "U", 5, 50), (1, "U", 9, 90), (1, "U", 7, 70)],
    )
    assert got == {1: 90}
    # a late delete erases earlier upserts; an even later insert revives
    got = _got(spark, [], [(2, "I", 1, 5), (2, "D", 2, None),
                           (2, "I", 3, 7)])
    assert got == {2: 7}


def test_delete_then_lower_seq_update_stays_deleted(spark):
    got = _got(spark, [(1, 10)],
               [(1, "U", 5, 55), (1, "D", 9, None)])
    assert got == {}


def test_null_keys_dropped(spark):
    got = _got(spark, [(None, 1), (1, 10)], [(None, "U", 1, 2)])
    assert got == {1: 10}


def test_invalid_op_fails_loudly(spark):
    b, c = _dfs(spark, [(1, 10)], [(1, "X", 5, 50)])
    with pytest.raises(Exception) as ei:
        cdc_merge(b, c).collect()
    assert "invalid op" in str(ei.value)


def test_duckdb_twin_matches(spark):
    base = [(i, i * 10) for i in range(20)]
    changes = [
        (i % 25, "DUI"[i % 3], i + 100, i * 7)
        for i in range(40)
    ]
    got = _got(spark, base, changes)
    con = duckdb.connect()
    con.execute("CREATE TABLE b (key BIGINT, val BIGINT)")
    con.executemany("INSERT INTO b VALUES (?, ?)", base)
    con.execute(
        "CREATE TABLE c (key BIGINT, op VARCHAR, seq BIGINT, val BIGINT)")
    con.executemany("INSERT INTO c VALUES (?, ?, ?, ?)", changes)
    want = dict(con.sql(
        sql_cdc_merge("SELECT * FROM b", "SELECT * FROM c")
    ).fetchall())
    assert got == want


def test_null_seq_changes_dropped(spark):
    # an unsequenced change cannot be ordered: dropped on BOTH engines
    got = _got(spark, [(1, 10)], [(1, "U", None, 99), (1, "U", 5, 55)])
    assert got == {1: 55}
    con = duckdb.connect()
    con.execute("CREATE TABLE b2 (key BIGINT, val BIGINT)")
    con.execute("INSERT INTO b2 VALUES (1, 10)")
    con.execute(
        "CREATE TABLE c2 (key BIGINT, op VARCHAR, seq BIGINT,"
        " val BIGINT)")
    con.executemany("INSERT INTO c2 VALUES (?, ?, ?, ?)",
                    [(1, "U", None, 99), (1, "U", 5, 55)])
    want = dict(con.sql(
        sql_cdc_merge("SELECT * FROM b2", "SELECT * FROM c2")
    ).fetchall())
    assert want == {1: 55}
