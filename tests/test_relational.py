"""Invariant + Python-model battery for the relational classics
completion wave (__spark_entry__: revenue_forecast, market_share,
product_profit, late_shipments, cust_order_dist, part_value_share,
supplier_cardinality, small_qty_revenue, waiting_suppliers,
idle_customers, min_cost_supplier).

The DuckDB oracles gate exactness (selfcheck); these tests gate the
SEMANTICS against independent pandas models at sf0.001 — a third
engine with a third plan — plus the structural invariants the SQL
cannot see (one row per part, histogram mass conservation, the
strict-late tie rule).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.spark


def _pq(table: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_SMOKE, f"{table}.parquet"))


def _cents(price, disc):
    return math.floor(price * (1.0 - disc) * 100.0)


def test_revenue_forecast_scalar(spark):
    from __spark_entry__ import q_revenue_forecast

    row = q_revenue_forecast(spark, SF_SMOKE).collect()[0]
    li = _pq("lineitem")
    m = (
        (li.l_shipdate >= "1997-01-01")
        & (li.l_shipdate < "1998-01-01")
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24.0)
    )
    want = int(
        sum(
            math.floor(p * d * 100.0)
            for p, d in zip(li[m].l_extendedprice, li[m].l_discount)
        )
    )
    assert row.revenue_cents == want
    assert row.n_lines == int(m.sum())


def test_market_share_ratio_and_bounds(spark):
    from __spark_entry__ import q_market_share

    rows = q_market_share(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.num_cents <= r.den_cents
        assert r.mkt_share == r.num_cents / r.den_cents


def test_product_profit_covers_every_gear_year(spark):
    from __spark_entry__ import q_product_profit

    got = q_product_profit(spark, SF_SMOKE).toPandas()
    li, part, orders = _pq("lineitem"), _pq("part"), _pq("orders")
    sup, nat = _pq("supplier"), _pq("nation")
    j = (
        li.merge(part[part.p_name.str.contains("gear")], left_on="l_partkey",
                 right_on="p_partkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    )
    j["profit"] = [
        _cents(p, d) - math.floor(rp * q * 50.0)
        for p, d, rp, q in zip(
            j.l_extendedprice, j.l_discount, j.p_retailprice, j.l_quantity
        )
    ]
    j["o_year"] = j.o_orderdate.dt.year
    want = (
        j.groupby(["n_name", "o_year"]).profit.sum().reset_index()
        .rename(columns={"n_name": "nation", "profit": "profit_cents"})
    )
    got = got.sort_values(["nation", "o_year"]).reset_index(drop=True)
    want = want.sort_values(["nation", "o_year"]).reset_index(drop=True)
    assert got.nation.tolist() == want.nation.tolist()
    assert got.profit_cents.tolist() == want.profit_cents.tolist()


def test_late_shipments_mass_conservation(spark):
    from __spark_entry__ import q_late_shipments

    got = q_late_shipments(spark, SF_SMOKE).toPandas()
    assert set(got.lag_bucket) <= {"fast", "normal", "slow"}
    li = _pq("lineitem")
    in_window = (
        (li.l_shipdate >= "1997-01-01") & (li.l_shipdate < "1998-01-01")
    ).sum()
    assert int((got.high_lines + got.low_lines).sum()) == int(in_window)


def test_cust_order_dist_histogram_mass(spark):
    from __spark_entry__ import q_cust_order_dist

    got = q_cust_order_dist(spark, SF_SMOKE).toPandas()
    cust, orders = _pq("customer"), _pq("orders")
    # every customer lands in exactly one bucket
    assert int(got.custdist.sum()) == len(cust)
    # total counted orders = all orders minus the excluded priority
    kept = (orders.o_orderpriority != "4-NOT SPECIFIED").sum()
    assert int((got.c_count * got.custdist).sum()) == int(kept)


def test_part_value_share_threshold_exact(spark):
    from __spark_entry__ import _Q11_DEN, _Q11_NUM, q_part_value_share

    got = q_part_value_share(spark, SF_SMOKE).toPandas()
    li = _pq("lineitem")
    li["cents"] = [
        _cents(p, d) for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    vals = li.groupby("l_partkey").cents.sum()
    total = int(vals.sum())
    want = {int(k) for k, v in vals.items() if v * _Q11_DEN > total * _Q11_NUM}
    assert set(got.l_partkey) == want
    assert dict(zip(got.l_partkey, got.value_cents)) == {
        k: int(vals[k]) for k in want
    }


def test_supplier_cardinality_model(spark):
    from __spark_entry__ import q_supplier_cardinality

    got = q_supplier_cardinality(spark, SF_SMOKE).toPandas()
    li, part, sup = _pq("lineitem"), _pq("part"), _pq("supplier")
    bad = set(sup[sup.s_acctbal < 0.0].s_suppkey)
    j = li[~li.l_suppkey.isin(bad)].merge(
        part[part.p_brand != "Brand#9"], left_on="l_partkey",
        right_on="p_partkey",
    )
    want = (
        j.groupby(["p_brand", "p_size"]).l_suppkey.nunique().reset_index()
    )
    gm = {(b, s): c for b, s, c in
          zip(got.p_brand, got.p_size, got.supplier_cnt)}
    wm = {(b, s): c for b, s, c in
          zip(want.p_brand, want.p_size, want.l_suppkey)}
    assert gm == wm
    assert "Brand#9" not in set(got.p_brand)


def test_small_qty_revenue_strict_threshold(spark):
    from __spark_entry__ import q_small_qty_revenue

    row = q_small_qty_revenue(spark, SF_SMOKE).collect()[0]
    li, part = _pq("lineitem"), _pq("part")
    j = li.merge(part[part.p_brand == "Brand#3"], left_on="l_partkey",
                 right_on="p_partkey")
    j["qty_i"] = j.l_quantity.astype("int64")
    stats = j.groupby("l_partkey").qty_i.agg(["sum", "count"])
    m = [
        q * 5 * stats.loc[pk, "count"] < stats.loc[pk, "sum"]
        for pk, q in zip(j.l_partkey, j.qty_i)
    ]
    sel = j[pd.Series(m, index=j.index)]
    want = int(sum(math.floor(p * 100.0) for p in sel.l_extendedprice))
    assert row.total_cents == want
    assert row.n_lines == len(sel)
    assert row.avg_yearly_cents == want / 7.0


def test_waiting_suppliers_strictly_last_and_multi(spark):
    from __spark_entry__ import q_waiting_suppliers

    got = q_waiting_suppliers(spark, SF_SMOKE).toPandas()
    assert len(got) <= 10 and (got.waits >= 1).all()
    li, orders, sup = _pq("lineitem"), _pq("orders"), _pq("supplier")
    fo = set(orders[orders.o_orderstatus == "F"].o_orderkey)
    j = li[li.l_orderkey.isin(fo)]
    per = j.groupby(["l_orderkey", "l_suppkey"]).l_shipdate.max()
    wins: dict[str, int] = {}
    for ok, grp in per.groupby(level=0):
        if len(grp) < 2:
            continue  # single-supplier orders never qualify
        mx = grp.max()
        achievers = grp[grp == mx]
        if len(achievers) == 1:  # a TIE at the max disqualifies everyone
            sk = achievers.index[0][1]
            wins[sk] = wins.get(sk, 0) + 1
    names = dict(zip(sup.s_suppkey, sup.s_name))
    by_name: dict[str, int] = {}
    for sk, c in wins.items():
        by_name[names[sk]] = by_name.get(names[sk], 0) + c
    want = sorted(by_name.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got.s_name, got.waits)) == want


def test_idle_customers_above_avg_and_no_recent(spark):
    from __spark_entry__ import _Q22_SINCE, q_idle_customers

    got = q_idle_customers(spark, SF_SMOKE).toPandas()
    cust, orders = _pq("customer"), _pq("orders")
    cust["bal_cents"] = [
        math.floor(b * 100.0) for b in cust.c_acctbal
    ]
    pos = cust[cust.bal_cents > 0]
    sum_pos, cnt_pos = int(pos.bal_cents.sum()), len(pos)
    recent = set(
        orders[orders.o_orderdate >= _Q22_SINCE.split(" ")[0]].o_custkey
    )
    sel = cust[
        (~cust.c_custkey.isin(recent))
        & (cust.bal_cents * cnt_pos > sum_pos)
    ]
    want = sel.groupby("c_nationkey").agg(
        numcust=("c_custkey", "size"), tot=("bal_cents", "sum")
    )
    gm = {n: (c, t) for n, c, t in
          zip(got.c_nationkey, got.numcust, got.totbal_cents)}
    wm = {int(n): (int(r.numcust), int(r.tot)) for n, r in want.iterrows()}
    assert gm == wm


def test_min_cost_supplier_model(spark):
    from __spark_entry__ import q_min_cost_supplier

    got = q_min_cost_supplier(spark, SF_SMOKE).toPandas()
    li, part, sup = _pq("lineitem"), _pq("part"), _pq("supplier")
    j = li.merge(part[part.p_size == 15], left_on="l_partkey",
                 right_on="p_partkey")
    j["unit"] = [
        math.floor(p * 100.0 / q)
        for p, q in zip(j.l_extendedprice, j.l_quantity)
    ]
    names = dict(zip(sup.s_suppkey, sup.s_name))
    want = {}
    for pk, grp in j.groupby("p_partkey"):
        mn = int(grp.unit.min())
        sk = int(grp[grp.unit == mn].l_suppkey.min())  # tie -> lowest key
        want[int(pk)] = (mn, sk, names[sk])
    # exactly one row per qualifying part
    assert got.p_partkey.is_unique and set(got.p_partkey) == set(want)
    gm = {
        int(pk): (int(mc), int(sk), nm)
        for pk, mc, sk, nm in zip(
            got.p_partkey, got.min_unit_cents, got.s_suppkey, got.s_name
        )
    }
    assert gm == want


def test_abc_classes_mass_and_monotone(spark):
    from __spark_entry__ import _ABC_A, _ABC_B, q_abc_classes

    got = q_abc_classes(spark, SF_SMOKE).toPandas()
    li = _pq("lineitem")
    li["cents"] = [
        _cents(p, d) for p, d in zip(li.l_extendedprice, li.l_discount)
    ]
    vals = li.groupby("l_partkey").cents.sum().sort_values(
        ascending=False)
    total = int(vals.sum())
    # every part classified exactly once; totals conserved
    assert len(got) == len(vals)
    assert int(got.rev.sum()) == total
    # class assignment matches the cumulative-share model with the
    # (rev DESC, key ASC) tie order
    order = sorted(vals.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, want = 0, {}
    for k, v in order:
        cum += int(v)
        want[int(k)] = ("A" if cum * 100 <= _ABC_A * total
                        else "B" if cum * 100 <= _ABC_B * total
                        else "C")
    assert dict(zip(got.l_partkey, got.abc)) == want
    # A revenue share is at most the breakpoint, and classes are live
    assert {"A", "B", "C"} <= set(got.abc)


def test_skew_report_model(spark):
    from __spark_entry__ import q_skew_report

    r = q_skew_report(spark, SF_SMOKE).collect()[0]
    li = _pq("lineitem")
    counts = li.groupby("l_partkey").size()
    assert r.n_keys == len(counts) and r.n_rows == len(li)
    assert r.max_c == int(counts.max())
    sc = sorted(counts)
    # integer-rank percentiles: smallest value with cum count >= p%
    def rank(p):
        need = (p * len(sc) + 99) // 100
        return sc[need - 1]
    assert r.p50_c == rank(50) and r.p99_c == rank(99)
    assert r.skew_num == r.max_c * r.n_keys
    assert r.skew_factor == r.skew_num / r.n_rows
