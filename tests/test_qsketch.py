"""Log-bucket quantile sketch: Python-model parity on both engines,
the 25% error bound, merge-under-any-partitioning, and edge domains."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.operators.qsketch import (
    DEFAULT_PS,
    group_quantile_sketch,
    sql_group_quantile_sketch,
    value_sketch,
)


def _bucket(v: int) -> tuple[int, int]:
    assert v >= 0
    if v < 4:
        return v, v
    e = v.bit_length() - 1
    sub = v >> (e - 2)
    return 4 * e + sub - 4, sub << (e - 2)


def _model(rows, ps=DEFAULT_PS):
    """(group, p, est) from the pure-Python sketch."""
    from collections import defaultdict

    groups = defaultdict(list)
    for g, v in rows:
        if v is not None:
            groups[g].append(v)
    out = set()
    for g, vs in groups.items():
        buckets = defaultdict(int)
        for v in vs:
            buckets[_bucket(v)] += 1
        ordered = sorted(buckets.items())
        n = len(vs)
        for label, num, den in ps:
            rank = (n * num + den - 1) // den
            cum = 0
            for (b, lb), cnt in ordered:
                cum += cnt
                if cum >= rank:
                    out.add((g, label, lb))
                    break
    return out


ROWS = (
    [("a", v) for v in [0, 1, 2, 3, 5, 9, 17, 100, 1000, 12345]]
    + [("b", v) for v in range(1, 200)]
    + [("b", None), ("c", 7)]
)


@pytest.mark.spark
class TestQSketch:
    def _spark(self, spark, rows):
        df = spark.createDataFrame(rows, "g string, v long")
        res = group_quantile_sketch(df, "g", "v")
        return {tuple(r) for r in res.collect()}

    def test_matches_python_model(self, spark):
        assert self._spark(spark, ROWS) == _model(ROWS)

    def test_duckdb_twin_matches_model(self):
        con = duckdb.connect()
        vals = ", ".join(
            f"('{g}', {'NULL' if v is None else v})" for g, v in ROWS
        )
        con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) _(g, v)")
        sql = sql_group_quantile_sketch("t", "g", "v")
        assert {tuple(r) for r in con.execute(sql).fetchall()} == _model(ROWS)

    def test_error_bound(self, spark):
        """est <= exact quantile, and exact < est + bucket width (25% rel)."""
        import math

        vs = sorted(v for g, v in ROWS if g == "b" and v is not None)
        got = {r[1]: r[2] for r in self._spark(spark, ROWS) if r[0] == "b"}
        for label, num, den in DEFAULT_PS:
            rank = (len(vs) * num + den - 1) // den
            exact = vs[rank - 1]
            est = got[label]
            assert est <= exact
            width = 1 if exact < 4 else 1 << (exact.bit_length() - 3)
            assert exact < est + width
            if exact >= 4:
                assert (exact - est) / exact <= 0.25

    def test_merge_under_any_partitioning(self, spark):
        df = spark.createDataFrame(
            [r for r in ROWS if r[1] is not None], "g string, v long"
        )
        want = {
            tuple(r) for r in value_sketch(df, "g", "v").collect()
        }
        for n in (1, 7, 32):
            got = {
                tuple(r)
                for r in value_sketch(df.repartition(n), "g", "v").collect()
            }
            assert got == want

    def test_negative_raises(self, spark):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException

        df = spark.createDataFrame([("a", -1)], "g string, v long")
        with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                           match="negative"):
            group_quantile_sketch(df, "g", "v").collect()

    def test_null_dropped_empty_group_absent(self, spark):
        df = spark.createDataFrame(
            [("a", 5), ("z", None)], "g string, v long"
        )
        got = self._spark(spark, [("a", 5), ("z", None)])
        assert {r[0] for r in got} == {"a"}

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["x", "y"]),
                st.integers(min_value=0, max_value=2**40),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_duckdb_twin_fuzz(self, rows):
        con = duckdb.connect()
        vals = ", ".join(f"('{g}', {v})" for g, v in rows)
        con.execute(
            f"CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES {vals}) _(g, v)"
        )
        sql = sql_group_quantile_sketch("t", "g", "v")
        assert {tuple(r) for r in con.execute(sql).fetchall()} == _model(rows)
