"""Relational surface ops: top-N per group, anti-join, star revenue,
transition bigrams, clustering coefficient — hand-checked fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from sbustreamspot_core_ray.stages.relational import (
    anti_join_keys,
    revenue_by_nation,
    top_n_per_group,
)


def test_top_n_per_group():
    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
            "id": pa.array([10, 11, 12, 13, 20, 21], pa.int64()),
            # group 1: values 5, 9, 9, 1 -> top3 = id 11 (9), 12 (9, tie by id), 10 (5)
            "v": pa.array([5.0, 9.0, 9.0, 1.0, 3.0, 7.0], pa.float64()),
        }
    )
    out = (
        top_n_per_group(ray.data.from_arrow(t), "g", "v", "id", n=3, num_parts=2)
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    got = list(zip(out["g"], out["id"], out["rn"]))
    assert got == [(1, 11, 1), (1, 12, 2), (1, 10, 3), (2, 21, 1), (2, 20, 2)]


def test_anti_join_keys():
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 2, 4], pa.int64())})
    )
    out = anti_join_keys(left, right, "k", num_partitions=2).to_pandas()
    assert sorted(out["k"]) == [1, 3]
    assert sorted(out["name"]) == ["a", "c"]


def test_revenue_by_nation_exact_units():
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_suppkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([100.0, 50.0, 10.0], pa.float64()),
                "l_discount": pa.array([0.1, 0.0, 0.5], pa.float64()),
            }
        )
    )
    supp = ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([0, 1], pa.int32()),
            }
        )
    )
    dim = pa.table(
        {
            "n_nationkey": pa.array([0, 1], pa.int32()),
            "n_name": pa.array(["FRANCE", "GERMANY"]),
            "r_name": pa.array(["EUROPE", "EUROPE"]),
        }
    )
    out = revenue_by_nation(li, supp, dim, num_partitions=2).to_pandas()
    got = {
        (r, n): u for r, n, u in zip(out["r_name"], out["n_name"], out["units"])
    }
    # supplier 1: 100*0.9 + 50*1.0 = 140.0 -> 1_400_000 units; supplier 2: 5.0
    assert got == {("EUROPE", "FRANCE"): 1_400_000, ("EUROPE", "GERMANY"): 50_000}


def test_transition_counts():
    from sbustreamspot_core_ray.stages.events import transition_counts

    US = 1_000_000
    rows = [  # user 1: a->b->a ; user 2: b->b
        (0, 0 * US, 1, "a"),
        (1, 1 * US, 1, "b"),
        (2, 2 * US, 1, "a"),
        (3, 0 * US, 2, "b"),
        (4, 5 * US, 2, "b"),
    ]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
            }
        )
    )
    out = transition_counts(ev, num_parts=2).to_pandas()
    got = {(f, t): n for f, t, n in zip(out["from_type"], out["to_type"], out["n"])}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_clustering_coefficient():
    from sbustreamspot_core_ray.pipelines.superstep import clustering_coefficient

    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4).
    # deg: 1->3, 2->3, 3->2, 4->2; tri: 1->2, 2->2, 3->1, 4->1
    # cc: 1,2 -> 2*2/(3*2)=0.666..; 3,4 -> 2*1/(2*1)=1.0
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "dst": pa.array([2, 3, 4, 3, 4], pa.int64()),
            }
        )
    )
    out = (
        clustering_coefficient(edges, num_partitions=2)
        .to_pandas()
        .set_index("vertex")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 4]
    assert list(out["deg"]) == [3, 3, 2, 2]
    assert list(out["triangles"]) == [2, 2, 1, 1]
    assert out.loc[1, "cc"] == pytest.approx(2 / 3)
    assert out.loc[3, "cc"] == 1.0


def test_clustering_coefficient_bigpath_parity():
    """Force the co-partitioned (non-broadcast) triangle regime and check
    with_degrees output matches the broadcast regime."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2, 5], pa.int64()),
                "dst": pa.array([2, 3, 4, 3, 4, 6], pa.int64()),
            }
        )
    )
    small = (
        triangle_count(edges, 2, per_vertex=True, with_degrees=True,
                       broadcast_edges_max=0)
        .to_pandas().sort_values("vertex").reset_index(drop=True)
    )
    fast = (
        triangle_count(edges, 2, per_vertex=True, with_degrees=True)
        .to_pandas().sort_values("vertex").reset_index(drop=True)
    )
    assert small.equals(fast)
    assert list(small["vertex"]) == [1, 2, 3, 4, 5, 6]
    assert list(small["deg"]) == [3, 3, 2, 2, 1, 1]
    assert list(small["triangles"]) == [2, 2, 1, 1, 0, 0]


def test_edge_support_both_regimes():
    """Per-edge triangle support matches between broadcast and
    co-partitioned regimes on K4 minus an edge."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "dst": pa.array([2, 3, 4, 3, 4], pa.int64()),
            }
        )
    )
    # triangles (1,2,3), (1,2,4): edge (1,2) support 2, others 1
    want = {(1, 2): 2, (1, 3): 1, (1, 4): 1, (2, 3): 1, (2, 4): 1}
    for kwargs in ({}, {"broadcast_edges_max": 0}):
        out = triangle_count(edges, 2, per_edge=True, **kwargs).to_pandas()
        got = {(a, b): s for a, b, s in zip(out["a"], out["b"], out["support"])}
        assert got == want, kwargs


def test_ktruss_k4():
    from sbustreamspot_core_ray.pipelines.superstep import ktruss

    # full K4: every edge sits in 2 triangles -> the whole graph is a
    # 4-truss (support >= 2)
    k4 = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
                "dst": pa.array([2, 3, 4, 3, 4, 4], pa.int64()),
            }
        )
    )
    out = ktruss(k4, k=4, num_partitions=2).to_pandas()
    assert len(out) == 6 and (out["support"] == 2).all()

    # K4 minus an edge: peeling empties the graph at k=4
    k4m = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "dst": pa.array([2, 3, 4, 3, 4], pa.int64()),
            }
        )
    )
    out2 = ktruss(k4m, k=4, num_partitions=2).to_pandas()
    assert len(out2) == 0


def test_copurchase_pairs_hand_checked():
    """Orders: o1 {p1,p2,p3}, o2 {p1,p2}, o3 {p1,p2} (via duplicate
    lineitems), o4 {p9}: (p1,p2) x3, (p1,p3) x1, (p2,p3) x1."""
    from sbustreamspot_core_ray.stages.relational import copurchase_pairs

    ok = [1, 1, 1, 2, 2, 3, 3, 3, 4]
    pk = [1, 2, 3, 1, 2, 1, 2, 2, 9]
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        )
    )
    t = copurchase_pairs(li, num_partitions=2, min_count=1, topn=10).to_pandas()
    t = t.set_index(["part_a", "part_b"])["cnt"]
    assert t.loc[(1, 2)] == 3
    assert t.loc[(1, 3)] == 1
    assert t.loc[(2, 3)] == 1
    assert len(t) == 3


def test_frequent_triples_hand_checked():
    """Baskets: o1 {1,2,3}, o2 {1,2,3}, o3 {1,2,3,4}, o4 {5,6,7}.
    Item supports: 1,2,3 -> 3 orders; 4,5,6,7 -> 1 order. With
    item_min=2 only {1,2,3} survive pruning, so the single frequent
    triple is (1,2,3) x3 — basket o4 and the extension item 4 drop out."""
    from sbustreamspot_core_ray.stages.relational import frequent_triples

    ok = [1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4]
    pk = [1, 2, 3, 1, 2, 3, 1, 2, 3, 4, 5, 6, 7]
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        )
    )
    t = frequent_triples(
        li, num_partitions=2, item_min=2, min_count=1, topn=10
    ).to_pandas()
    assert len(t) == 1
    assert (
        int(t["p1"][0]), int(t["p2"][0]), int(t["p3"][0]), int(t["cnt"][0])
    ) == (1, 2, 3, 3)


def test_local_supplier_revenue_hand_checked():
    """One qualifying order (customer nation 1 == supplier nation 1,
    in-window); a second order fails the nation match, a third the date
    window."""
    import numpy as np

    from sbustreamspot_core_ray.stages.relational import local_supplier_revenue

    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([10, 20, 30], pa.int64()),
                "o_custkey": pa.array([1, 2, 1], pa.int64()),
                "o_orderdate": pa.array([100, 100, 999], pa.timestamp("us")),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([1, 2], pa.int32()),
            }
        )
    )
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([10, 10, 20, 30], pa.int64()),
                "l_suppkey": pa.array([7, 7, 7, 7], pa.int64()),
                "l_extendedprice": pa.array([100.0, 50.0, 10.0, 10.0]),
                "l_discount": pa.array([0.0, 0.5, 0.0, 0.0]),
            }
        )
    )
    sup = pa.table(
        {
            "s_suppkey": pa.array([7], pa.int64()),
            "s_nationkey": pa.array([1], pa.int32()),
        }
    )
    out = local_supplier_revenue(
        orders, customer, lineitem, sup,
        region_nations=np.array([1, 2], np.int64),
        date_lo_us=0, date_hi_us=500, num_partitions=2,
    ).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "n_nationkey"] == 1
    assert out.loc[0, "units"] == 1_250_000  # (100 + 25) * 1e4


def _ts_us(vals):
    return pa.array(np.array(vals, "datetime64[us]"))


def test_priority_semi_counts():
    from sbustreamspot_core_ray.stages.relational import priority_semi_counts

    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                # order 4 outside the window
                "o_orderdate": _ts_us(
                    ["1996-06-01", "1996-07-01", "1997-01-01", "1999-01-01"]
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "1-URGENT", "5-LOW", "1-URGENT"]
                ),
            }
        )
    )
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                # orders 1 and 3 have an R lineitem; 2 only N; 4 R but out of window
                "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
                "l_returnflag": pa.array(["R", "N", "N", "R", "R"]),
            }
        )
    )
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)
    out = (
        priority_semi_counts(orders, lineitem, lo, hi, "R", num_partitions=2)
        .to_pandas()
        .set_index("o_orderpriority")["order_count"]
        .to_dict()
    )
    assert out == {"1-URGENT": 1, "5-LOW": 1}


def test_priority_class_counts():
    from sbustreamspot_core_ray.stages.relational import priority_class_counts

    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "2-HIGH"]),
            }
        )
    )
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
                "l_linestatus": pa.array(["F", "O", "F", "F", "F"]),
                # last one shipped outside the window
                "l_shipdate": _ts_us(
                    ["1996-02-01", "1996-03-01", "1996-04-01", "1996-05-01", "1999-01-01"]
                ),
            }
        )
    )
    lo = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi = np.datetime64("1998-01-01", "us").astype(np.int64)
    out = (
        priority_class_counts(
            orders, lineitem, lo, hi, ("1-URGENT", "2-HIGH"), num_partitions=2
        )
        .to_pandas()
        .set_index("l_linestatus")
    )
    # F: order1 urgent (1 high), order2 low (1 low), order3 high (1 high)
    assert out.loc["F", "high_line_count"] == 2
    assert out.loc["F", "low_line_count"] == 1
    # O: order1 urgent
    assert out.loc["O", "high_line_count"] == 1
    assert out.loc["O", "low_line_count"] == 0


def test_promo_revenue_share():
    from sbustreamspot_core_ray.stages.relational import promo_revenue_share

    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([10, 11, 10, 12], pa.int64()),
                "l_extendedprice": pa.array([100.0, 100.0, 50.0, 200.0]),
                "l_discount": pa.array([0.0, 0.5, 0.0, 0.0]),
                "l_shipdate": _ts_us(
                    ["1996-02-10", "1996-02-20", "1996-03-05", "1996-03-06"]
                ),
            }
        )
    )
    part = ray.data.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([10, 11, 12], pa.int64()),
                "p_type": pa.array(["PROMO BRUSHED", "STANDARD X", "PROMO Y"]),
            }
        )
    )
    out = (
        promo_revenue_share(lineitem, part, num_partitions=2)
        .to_pandas()
        .set_index("ym")
    )
    # 199602: promo 100 (part10), total 100 + 50 (part11 discounted) = 150
    assert out.loc[199602, "promo_revenue"] == 100.0
    assert out.loc[199602, "total_revenue"] == 150.0
    assert abs(out.loc[199602, "promo_share"] - round(100 * 100 / 150, 6)) < 1e-9
    # 199603: promo 50 (part10) + 200 (part12) = 250, total 250
    assert out.loc[199603, "promo_share"] == 100.0


def test_market_share_both_regimes_agree():
    from sbustreamspot_core_ray.stages.relational import market_share

    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
                "l_orderkey": pa.array([10, 11, 10, 12], pa.int64()),
                "l_suppkey": pa.array([100, 101, 100, 101], pa.int64()),
                "l_extendedprice": pa.array([100.0, 200.0, 50.0, 80.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0, 0.5]),
            }
        )
    )
    part = ray.data.from_arrow(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], pa.int64()),
                # part 3 is the wrong type -> order 12 drops out
                "p_type": pa.array(["STANDARD A", "STANDARD B", "ECONOMY C"]),
            }
        )
    )
    supplier = ray.data.from_arrow(
        pa.table(
            {
                "s_suppkey": pa.array([100, 101], pa.int64()),
                "s_nationkey": pa.array([7, 8], pa.int32()),
            }
        )
    )
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([1000, 1001, 1000], pa.int64()),
                "o_orderdate": _ts_us(["1996-03-01", "1997-03-01", "1996-05-01"]),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([1000, 1001], pa.int64()),
                # 1001 outside the region -> order 11 drops out
                "c_nationkey": pa.array([7, 3], pa.int32()),
            }
        )
    )
    kwargs = dict(
        type_prefix="STANDARD",
        target_nationkey=7,
        region_nationkeys=np.array([7, 12], np.int64),
        num_partitions=2,
    )
    bcast = market_share(
        lineitem, part, supplier, orders, customer, **kwargs
    ).to_pandas()
    shuf = market_share(
        lineitem, part, supplier, orders, customer, broadcast_max=0, **kwargs
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        bcast.sort_values("o_year").reset_index(drop=True),
        shuf.sort_values("o_year").reset_index(drop=True),
    )
    # 1996: order 10 only (100 + 50 revenue, all from nation 7)
    r = bcast.set_index("o_year")
    assert r.loc[1996, "total_revenue"] == 150.0
    assert r.loc[1996, "mkt_share"] == 100.0
    assert 1997 not in r.index  # order 11's customer is outside the region


def test_pareto_skyline_matches_brute_force():
    """Random 2-D points: distributed two-phase frontier equals the O(n^2)
    dominance definition; duplicate frontier points are all kept."""
    from sbustreamspot_core_ray.stages.relational import pareto_skyline

    rng = np.random.default_rng(7)
    x = rng.integers(0, 20, 300).astype(np.float64)
    y = rng.integers(0, 20, 300).astype(np.int64)
    t = pa.table(
        {
            "id": pa.array(np.arange(300), pa.int64()),
            "x": pa.array(x),
            "y": pa.array(y),
        }
    )
    got = (
        pareto_skyline(
            ray.data.from_arrow(t).repartition(7), x_col="x", y_col="y"
        )
        .to_pandas()
        .sort_values("id")
    )
    keep = [
        i
        for i in range(300)
        if not any(
            (x[j] <= x[i])
            and (y[j] <= y[i])
            and (x[j] < x[i] or y[j] < y[i])
            for j in range(300)
        )
    ]
    assert list(got["id"]) == keep


def test_butterfly_count_hand_and_random():
    """K_{2,2} on orders {1,2} x parts {10,11} = exactly 1 butterfly;
    then a random bipartite graph vs the O(n^2) pair-count definition
    (duplicate lineitem rows must not inflate distinct edges)."""
    from itertools import combinations

    from sbustreamspot_core_ray.stages.relational import butterfly_count

    def make(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                }
            )
        )

    k22 = [(1, 10), (1, 11), (2, 10), (2, 11), (1, 10)]  # one duplicate
    t = butterfly_count(make(k22), num_partitions=3).to_pandas()
    assert t["n_edges"].tolist() == [4]
    assert t["butterflies"].tolist() == [1]
    assert t["wedges_order"].tolist() == [2]
    assert t["wedges_part"].tolist() == [2]

    rng = np.random.default_rng(11)
    rows = {(int(o), int(p)) for o, p in
            zip(rng.integers(0, 40, 600), rng.integers(100, 130, 600))}
    t = butterfly_count(make(sorted(rows)), num_partitions=5).to_pandas()
    parts_of = {}
    for o, p in rows:
        parts_of.setdefault(o, set()).add(p)
    bf = 0
    for o1, o2 in combinations(sorted(parts_of), 2):
        c = len(parts_of[o1] & parts_of[o2])
        bf += c * (c - 1) // 2
    assert t["butterflies"].tolist() == [bf]
    assert t["n_edges"].tolist() == [len(rows)]


def test_butterfly_count_max_deg_cap():
    """Hub cap with drop accounting: a star order touching every part
    exceeds max_deg on the (smaller-wedge) order side, so its pairs are
    skipped and it is counted in dropped_centers; an uncapped run on the
    same graph and a brute-force count pin the exact total, and a cap
    above every degree reproduces the exact census with zero drops."""
    from itertools import combinations

    from sbustreamspot_core_ray.stages.relational import butterfly_count

    rng = np.random.default_rng(7)
    rows = {(int(o), int(p)) for o, p in
            zip(rng.integers(0, 30, 300), rng.integers(100, 120, 300))}
    rows |= {(999, p) for p in range(100, 120)}  # hub order, deg 20

    def make(r):
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([o for o, _ in sorted(r)], pa.int64()),
                    "l_partkey": pa.array([p for _, p in sorted(r)], pa.int64()),
                }
            )
        )

    parts_of = {}
    for o, p in rows:
        parts_of.setdefault(o, set()).add(p)

    def brute(max_deg=None):
        keep = {o: ps for o, ps in parts_of.items()
                if max_deg is None or len(ps) <= max_deg}
        bf = 0
        for o1, o2 in combinations(sorted(keep), 2):
            c = len(keep[o1] & keep[o2])
            bf += c * (c - 1) // 2
        return bf

    # part degrees here exceed order degrees, so the order side is the
    # smaller-wedge (center) side — the cap applies to order degrees
    wedges = lambda d: sum(len(v) * (len(v) - 1) // 2 for v in d.values())
    inv = {}
    for o, p in rows:
        inv.setdefault(p, set()).add(o)
    assert wedges(parts_of) < wedges(inv)

    capped = butterfly_count(make(rows), num_partitions=3, max_deg=15)
    t = capped.to_pandas()
    assert t["dropped_centers"].tolist() == [1]  # only the hub
    assert t["butterflies"].tolist() == [brute(max_deg=15)]

    loose = butterfly_count(make(rows), num_partitions=3, max_deg=1000)
    t2 = loose.to_pandas()
    assert t2["dropped_centers"].tolist() == [0]
    assert t2["butterflies"].tolist() == [brute()]

    exact = butterfly_count(make(rows), num_partitions=3).to_pandas()
    assert exact["butterflies"].tolist() == [brute()]
    assert "dropped_centers" not in exact.columns


def test_snapshot_diff_hand_case():
    """A={1:10, 2:20, 3:30}, B={2:20, 3:31, 4:40}: delete 1, update 3,
    insert 4; unchanged 2 emits nothing; sentinels fill absent sides."""
    from sbustreamspot_core_ray.stages.relational import snapshot_diff

    def snap(d):
        return ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(list(d), pa.int64()),
                    "v": pa.array([float(x) for x in d.values()]),
                }
            )
        )

    got = (
        snapshot_diff(
            snap({1: 10, 2: 20, 3: 30}),
            snap({2: 20, 3: 31, 4: 40}),
            key_col="k",
            val_col="v",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("k")
    )
    assert list(zip(got["k"], got["change_type"])) == [
        (1, "delete"),
        (3, "update"),
        (4, "insert"),
    ]
    assert got["old_val"].tolist() == [10.0, 30.0, -1.0]
    assert got["new_val"].tolist() == [-1.0, 31.0, 40.0]


def test_bloom_semi_join_audit_hand_checked():
    """Tiny filter (m=8 bits) forces false positives we can enumerate by
    recomputing positions directly; the exact witness must never be
    exceeded by the filter."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from sbustreamspot_core_ray.stages.relational import bloom_semi_join_audit

    build = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    )
    probe = ray.data.from_arrow(
        pa.table({"q": pa.array(list(range(1, 21)), pa.int64())})
    )
    consts = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F)
    out = bloom_semi_join_audit(
        build, probe, "k", "q", m_bits=8, hash_consts=consts,
        num_partitions=2,
    ).to_pandas().iloc[0]

    bits = set()
    def pos(x):
        return [int((np.uint64(x) * np.uint64(c)) % np.uint64(8))
                for c in consts]
    for x in (1, 2, 3):
        bits.update(pos(x))
    expect_pass = sum(1 for x in range(1, 21) if set(pos(x)) <= bits)
    assert out["n_set_bits"] == len(bits)
    assert out["n_probe"] == 20
    assert out["n_pass"] == expect_pass
    assert out["n_member"] == 3
    assert out["n_false_pos"] == expect_pass - 3
    assert out["n_pass"] >= out["n_member"]


def test_exact_ntile_vs_sorted_reference():
    """Sample-sort ntile vs the single-machine definition, with ties on
    the metric (key breaks them) and enough rows to span real buckets."""
    from sbustreamspot_core_ray.stages.relational import exact_ntile

    rng = np.random.default_rng(5)
    keys = np.arange(1, 1501, dtype=np.int64)
    vals = rng.integers(0, 40, 1500).astype(np.int64)  # heavy ties
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    )
    got = (
        exact_ntile(ds, "v", "k", 5, num_parts=8, sample_shift=58)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    order = np.lexsort((keys, vals))
    rank = np.empty(len(keys), np.int64)
    rank[order] = np.arange(len(keys))
    want = (rank * 5) // len(keys)
    assert got["tile"].to_numpy().tolist() == want[
        np.argsort(keys, kind="stable")
    ].tolist()
    # every tile holds exactly n/5 rows (n divisible by 5 here)
    assert np.bincount(want).tolist() == [300] * 5


def test_item_cosine_vs_bruteforce():
    """Cosine normalization vs the O(n^2) definition on hand baskets:
    a popular pair with low cosine must rank below a rare-but-exclusive
    pair, and item counts must be globally deduplicated."""
    from sbustreamspot_core_ray.stages.relational import item_cosine

    baskets = {
        1: [10, 11], 2: [10, 11], 3: [10, 11],      # exclusive pair
        4: [20, 21, 10], 5: [20, 21, 11], 6: [20, 21],
        7: [20, 30], 8: [20, 31], 9: [20, 32],       # 20 is popular
        10: [10, 11],                                 # duplicate rows below
    }
    rows_o, rows_p = [], []
    for o, ps in baskets.items():
        for p in ps:
            rows_o.extend([o, o])  # duplicate every lineitem row
            rows_p.extend([p, p])
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array(rows_o, pa.int64()),
                "l_partkey": pa.array(rows_p, pa.int64()),
            }
        )
    )
    got = item_cosine(li, min_count=2, topn=10, num_parts=4).to_pandas()

    import itertools
    from collections import Counter

    cnt = Counter()
    icnt = Counter()
    for o, ps in baskets.items():
        ps = sorted(set(ps))
        icnt.update(ps)
        cnt.update(itertools.combinations(ps, 2))
    want = []
    for (a, b), n in cnt.items():
        if n >= 2:
            raw = n / (np.sqrt(icnt[a]) * np.sqrt(icnt[b]))
            want.append((raw, a, b, n))
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    assert got[["part_a", "part_b", "n_pairs"]].to_numpy().tolist() == [
        [a, b, n] for _, a, b, n in want[:10]
    ]
    # (10, 11): 4/ (2 sqrt(5)) ~ 0.894 beats (20, 21): 3/(sqrt(6*3)) ~ 0.707
    assert got.iloc[0][["part_a", "part_b"]].tolist() == [10, 11]


def test_order_wide_table_hand_case():
    """Wide-table build on hand rows: per-order revenue floors per ITEM
    before summing, item counts, max ship day, and the dim chain."""
    from sbustreamspot_core_ray.stages.relational import order_wide_table

    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([7, 8], pa.int64()),
            }
        )
    )
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                "l_extendedprice": pa.array([10.005, 20.0, 5.5], pa.float64()),
                "l_discount": pa.array([0.1, 0.0, 0.5], pa.float64()),
                "l_shipdate": pa.array([86400000000 * d for d in (3, 9, 4)],
                                       pa.timestamp("us")),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([7, 8], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        )
    )
    nr = pa.table(
        {
            "n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["FRANCE", "PERU"], pa.string()),
            "r_name": pa.array(["EUROPE", "AMERICA"], pa.string()),
        }
    )
    got = (
        order_wide_table(orders, li, customer, nr, num_parts=4)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    import math

    rev1 = math.floor(10.005 * 0.9 * 10000 + 0.5) + math.floor(20.0 * 10000 + 0.5)
    rev2 = math.floor(5.5 * 0.5 * 10000 + 0.5)
    assert got.iloc[0][["o_custkey", "nation", "region"]].tolist() == \
        [7, "FRANCE", "EUROPE"]
    assert int(got.iloc[0]["revenue_units"]) == rev1
    assert int(got.iloc[0]["n_items"]) == 2
    assert int(got.iloc[0]["last_ship_day"]) == 9
    assert int(got.iloc[1]["revenue_units"]) == rev2
    assert got.iloc[1]["region"] == "AMERICA"


def test_abc_classes_vs_sorted_reference():
    """Weighted-prefix classification vs a single-machine reference with
    revenue ties at the 80% boundary and many buckets."""
    from sbustreamspot_core_ray.stages.relational import abc_classes

    rng = np.random.default_rng(11)
    parts = np.arange(1, 501, dtype=np.int64)
    revs = rng.integers(1, 50, 500).astype(np.int64)
    revs[:3] = 10_000  # dominant A heads with exact ties
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array(np.repeat(parts, 2)),
                "l_extendedprice": pa.array(
                    np.repeat(revs, 2).astype(np.float64) / 2 / 10000 * 10000
                    / 10000
                ),
                "l_discount": pa.array(np.zeros(1000, np.float64)),
            }
        )
    )
    got = (
        abc_classes(li, num_parts=8, sample_shift=58)
        .to_pandas()
        .set_index("cls")
    )
    # reference on the same floored units
    units = np.floor(revs.astype(np.float64) / 2 / 10000 * 10000 / 10000
                     * 10000 + 0.5).astype(np.int64) * 2
    o = np.lexsort((parts, -units))
    u = units[o]
    cum_prev = np.concatenate([[0], np.cumsum(u)[:-1]])
    total = int(u.sum())
    cls = np.where(5 * cum_prev < 4 * total, 0,
                   np.where(20 * cum_prev < 19 * total, 1, 2))
    for i, name in enumerate("ABC"):
        m = cls == i
        if m.any():
            assert int(got.loc[name, "n_parts"]) == int(m.sum())
            assert int(got.loc[name, "revenue_units"]) == int(u[m].sum())
        else:
            assert name not in got.index
    assert int(got.loc["A", "n_parts"]) >= 3


def test_basket_cap_refuses_then_truncates_on_optin():
    """Round 4 (ADVICE r03): baskets over basket_cap must raise by default
    (the SQL oracle enumerates all pairs/triples, so silent truncation
    would break parity) and only truncate under allow_truncate=True."""
    import pytest

    from sbustreamspot_core_ray.stages.relational import (
        copurchase_pairs,
        frequent_triples,
    )

    # one order with 6 distinct parts > cap of 4
    li = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1] * 6 + [2, 2], pa.int64()),
                "l_partkey": pa.array([10, 11, 12, 13, 14, 15, 10, 11], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="basket_cap"):
        copurchase_pairs(li, num_partitions=2, min_count=1, basket_cap=4)
    t = copurchase_pairs(
        li, num_partitions=2, min_count=1, basket_cap=4, allow_truncate=True
    ).to_pandas()
    assert len(t) > 0  # truncated but functional under explicit opt-in

    with pytest.raises(Exception, match="basket_cap"):
        frequent_triples(
            li, num_partitions=2, item_min=1, min_count=1, basket_cap=4
        )
    t3 = frequent_triples(
        li, num_partitions=2, item_min=1, min_count=1, basket_cap=4,
        allow_truncate=True,
    ).to_pandas()
    assert len(t3) > 0
