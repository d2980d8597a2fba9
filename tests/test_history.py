"""SCD2 crawl-history intervals: model parity, semantics, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from core_spark.operators.history import scd2_intervals, sql_scd2_intervals

ROWS = [
    # url, ts, fp
    ("u1", 10, "A"),
    ("u1", 20, "A"),   # same content recrawl: extends version 1
    ("u1", 30, "B"),   # change -> version 2
    ("u1", 40, "A"),   # REAPPEARS -> version 3 (linear history)
    ("u2", 5, "X"),    # single snapshot
    ("u3", 7, "P"),
    ("u3", 7, "Q"),    # equal ts: fp tie-break orders P before Q
]

WANT = {
    ("u1", "A", 10, 30, 1),
    ("u1", "B", 30, 40, 2),
    ("u1", "A", 40, None, 3),
    ("u2", "X", 5, None, 1),
    ("u3", "P", 7, 7, 1),
    ("u3", "Q", 7, None, 2),
}


@pytest.mark.spark
class TestSCD2:
    def _spark(self, spark, rows):
        df = spark.createDataFrame(rows, "url string, warc_ts long, fp string")
        return {tuple(r) for r in scd2_intervals(df).collect()}

    def test_semantics(self, spark):
        assert self._spark(spark, ROWS) == WANT

    def test_duckdb_twin(self):
        con = duckdb.connect()
        vals = ", ".join(f"('{u}', {t}, '{f}')" for u, t, f in ROWS)
        con.execute(
            f"CREATE TABLE s AS SELECT * FROM (VALUES {vals}) _(url, warc_ts, fp)"
        )
        got = {
            tuple(r)
            for r in con.execute(sql_scd2_intervals("s")).fetchall()
        }
        assert got == WANT

    def test_intervals_partition_time(self, spark):
        """Per url: valid_from strictly increases with version, valid_to of
        version k == valid_from of version k+1, last valid_to is NULL."""
        rows = self._spark(spark, ROWS)
        by_url = {}
        for u, fp, vf, vt, ver in rows:
            by_url.setdefault(u, []).append((ver, vf, vt))
        for u, ivs in by_url.items():
            ivs.sort()
            for i, (ver, vf, vt) in enumerate(ivs):
                assert ver == i + 1
                if i + 1 < len(ivs):
                    assert vt == ivs[i + 1][1]
                else:
                    assert vt is None

    def test_consecutive_dup_never_splits(self, spark):
        rows = [("u", t, "same") for t in range(50)]
        got = self._spark(spark, rows)
        assert got == {("u", "same", 0, None, 1)}

    def test_plan_single_exchange(self, spark):
        """All four per-url steps share hash(url) clustering: ONE shuffle."""
        df = spark.createDataFrame(ROWS, "url string, warc_ts long, fp string")
        plan = (
            scd2_intervals(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1

    def test_null_fp_is_a_real_state(self, spark):
        """A NULL fingerprint (failed fetch) opens/extends versions like
        any other value — including as the FIRST snapshot — and both
        engines agree (eqNullSafe == IS DISTINCT FROM; fp NULLS FIRST)."""
        rows = [
            ("u", 1, None),   # leading NULL run -> version 1
            ("u", 2, None),   # extends it
            ("u", 3, "A"),    # change -> version 2
            ("u", 4, None),   # NULL reappears -> version 3
            ("v", 7, "P"),
            ("v", 7, None),   # ts tie: NULL orders FIRST on both engines
        ]
        want = {
            ("u", None, 1, 3, 1),
            ("u", "A", 3, 4, 2),
            ("u", None, 4, None, 3),
            ("v", None, 7, 7, 1),
            ("v", "P", 7, None, 2),
        }
        assert self._spark(spark, rows) == want

        con = duckdb.connect()
        vals = ", ".join(
            f"('{u}', {t}, {'NULL' if f is None else repr(f)})"
            for u, t, f in rows
        )
        con.execute(
            f"CREATE TABLE sn AS SELECT * FROM (VALUES {vals}) _(url, warc_ts, fp)"
        )
        got = {
            tuple(r) for r in con.execute(sql_scd2_intervals("sn")).fetchall()
        }
        assert got == want

    def test_null_ts_orders_first_on_both_engines(self, spark):
        """A NULL timestamp (observation with no capture time) orders
        FIRST under Spark's asc default; the DuckDB twin must say
        NULLS FIRST on ts too (its default is NULLS LAST) or the run
        segmentation — and every interval — diverges."""
        rows = [
            ("u", None, "A"),  # NULL ts sorts before ts=5 -> version 1
            ("u", 5, "B"),     # -> version 2
            ("u", 9, "A"),     # reappearance -> version 3
            ("w", None, "X"),  # NULL-ts-only url
        ]
        want = {
            ("u", "A", None, 5, 1),  # valid_from: MIN skips NULL -> NULL run
            ("u", "B", 5, 9, 2),
            ("u", "A", 9, None, 3),
            ("w", "X", None, None, 1),
        }
        got_spark = self._spark(spark, rows)
        assert got_spark == want

        con = duckdb.connect()
        vals = ", ".join(
            f"('{u}', {'NULL' if t is None else t}, '{f}')"
            for u, t, f in rows
        )
        con.execute(
            f"CREATE TABLE st AS SELECT * FROM (VALUES {vals}) "
            "_(url, warc_ts, fp)"
        )
        got = {
            tuple(r) for r in con.execute(sql_scd2_intervals("st")).fetchall()
        }
        assert got == got_spark
