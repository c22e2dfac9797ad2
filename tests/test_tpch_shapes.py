"""Adversarial edge-case fixtures for the reshaped TPC-H Q2/Q21 shapes:
tie handling in the correlated per-part MIN (Q2) and the sole-late-shipper
EXISTS / NOT-EXISTS exclusions (Q21). The same fixture drives BOTH the Ray
pipeline and its DuckDB oracle SQL, so divergence in either direction fails."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


D0 = pd.Timestamp("1996-01-01")


def _ts(days: int) -> pd.Timestamp:
    return D0 + pd.Timedelta(days=days)


def _write_sf(tmp_path) -> str:
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    # orders: 1-2 are 'F' multi-supplier cases, 3 is non-F (excluded),
    # 4 is F single-supplier (excluded by ns > 1), 5 hosts the Q2 rows
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "o_custkey": pa.array([1] * 5, pa.int64()),
                "o_orderstatus": pa.array(["F", "F", "O", "F", "O"]),
                "o_totalprice": pa.array([100.0] * 5, pa.float64()),
                "o_orderdate": pa.array([D0] * 5, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 5),
            }
        ),
        f"{sf}/orders.parquet",
    )
    # lineitem: order 1 -> s1 late (and the max must fold across the
    # on-time d+5 partial), s2 on time => s1 is the SOLE late shipper;
    # order 2 -> both late => excluded; order 3 non-F; order 4 single
    # supplier; order 5 carries the Q2 price rows (min tie at 50.0 for
    # s1/s2 on part 101; s3 cheaper but out of region; 102 size-excluded,
    # 103 type-excluded)
    rows = [
        # (ok, pk, sk, qty, price, ship_days)
        (1, 101, 1, 1, 999.0, 5),
        (1, 101, 1, 1, 999.0, 100),
        (1, 101, 2, 1, 999.0, 10),
        (2, 101, 1, 1, 999.0, 95),
        (2, 101, 2, 1, 999.0, 120),
        (3, 101, 1, 1, 999.0, 200),
        (4, 101, 1, 1, 999.0, 150),
        (5, 101, 1, 1, 60.0, 1),
        (5, 101, 1, 1, 50.0, 1),
        (5, 101, 2, 1, 50.0, 1),
        (5, 101, 3, 1, 10.0, 1),
        (5, 102, 1, 1, 5.0, 1),
        (5, 103, 1, 1, 1.0, 1),
    ]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array(
                    list(range(1, len(rows) + 1)), pa.int32()
                ),
                "l_quantity": pa.array(
                    [float(r[3]) for r in rows], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [r[4] for r in rows], pa.float64()
                ),
                "l_discount": pa.array([0.0] * len(rows), pa.float64()),
                "l_tax": pa.array([0.0] * len(rows), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(rows)),
                "l_linestatus": pa.array(["O"] * len(rows)),
                "l_shipdate": pa.array(
                    [_ts(r[5]) for r in rows], pa.timestamp("us")
                ),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["S1", "S2", "S3"]),
                "s_nationkey": pa.array([2, 7, 0], pa.int32()),
                # s2's higher balance must sort it FIRST in the Q2 tie
                "s_acctbal": pa.array([100.0, 200.0, 50.0], pa.float64()),
            }
        ),
        f"{sf}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([101, 102, 103], pa.int64()),
                "p_name": pa.array(["red widget", "red bolt", "blue gear"]),
                "p_brand": pa.array(["Brand#1"] * 3),
                "p_type": pa.array(
                    ["SMALL brushed", "SMALL plated", "PROMO brushed"]
                ),
                "p_size": pa.array([12, 30, 12], pa.int32()),
                "p_retailprice": pa.array([900.0, 910.0, 920.0], pa.float64()),
            }
        ),
        f"{sf}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 2, 7], pa.int32()),
                "n_name": pa.array(["NATION_0", "NATION_2", "NATION_7"]),
                # nations 2 and 7 sit in Q2_REGIONKEY=2; nation 0 does not
                "n_regionkey": pa.array([0, 2, 2], pa.int32()),
            }
        ),
        f"{sf}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 2], pa.int32()),
                "r_name": pa.array(["REGION_0", "REGION_2"]),
            }
        ),
        f"{sf}/region.parquet",
    )
    return sf


def _oracle(sf: str, name: str) -> pd.DataFrame:
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ["orders", "lineitem", "supplier", "part", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    return con.sql(E.oracle_sql()[name]).df()


def test_q21_sole_late_shipper_exclusions(tmp_path):
    import __ray_entry__ as E

    sf = _write_sf(tmp_path)
    got = E.queries()["q21_waiting_suppliers"](sf)
    # only supplier 1 (order 1): order 2 has TWO late shippers, order 3
    # is not 'F', order 4 has one supplier, order 5 ships on time
    assert got["s_suppkey"].tolist() == [1]
    assert got["numwait"].tolist() == [1]
    assert got["s_name"].tolist() == ["S1"]
    want = _oracle(sf, "q21_waiting_suppliers")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_q2_min_cost_ties_and_region_filter(tmp_path):
    import __ray_entry__ as E

    sf = _write_sf(tmp_path)
    got = E.queries()["q2_min_cost_supplier"](sf)
    # s1 and s2 tie at 50.0 on part 101 (s1's 60.0 row must not win);
    # s3's cheaper 10.0 is out of region; parts 102/103 are filtered.
    # acctbal desc puts s2 first.
    assert list(zip(got["p_partkey"], got["s_suppkey"])) == [
        (101, 2),
        (101, 1),
    ]
    assert got["min_cost"].tolist() == [50.0, 50.0]
    assert got["n_name"].tolist() == ["NATION_7", "NATION_2"]
    want = _oracle(sf, "q2_min_cost_supplier")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_q6_forecast_predicate_boundaries(tmp_path):
    """Every Q6 predicate edge: shipdate [lo, hi) half-open bounds,
    discount bracket inclusive at both float-safe ends, quantity strict
    cut — checked by hand and against the SQL oracle on the same file."""
    import __ray_entry__ as E

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    rows = [
        # (ship, qty, disc, price, keep?)
        (pd.Timestamp("1996-01-01"), 1.0, 0.05, 1000.0, True),   # lo edge in
        (pd.Timestamp("1996-12-31"), 1.0, 0.06, 2000.0, True),   # hi-1 in
        (pd.Timestamp("1997-01-01"), 1.0, 0.05, 1000.0, False),  # hi edge out
        (pd.Timestamp("1995-12-31"), 1.0, 0.05, 1000.0, False),  # below lo
        (pd.Timestamp("1996-06-01"), 23.0, 0.05, 400.0, True),   # qty 23 in
        (pd.Timestamp("1996-06-01"), 24.0, 0.05, 400.0, False),  # qty 24 out
        (pd.Timestamp("1996-06-01"), 1.0, 0.04, 9999.0, False),  # disc low out
        (pd.Timestamp("1996-06-01"), 1.0, 0.07, 9999.0, False),  # disc high out
    ]
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(list(range(1, n + 1)), pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
                "l_extendedprice": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
                "l_discount": pa.array([r[2] for r in rows], pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n),
                "l_linestatus": pa.array(["O"] * n),
                "l_shipdate": pa.array(
                    [r[0] for r in rows], pa.timestamp("us")
                ),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    got = E.queries()["q6_forecast"](sf).to_pandas()
    # 1000*0.05 + 2000*0.06 + 400*0.05 = 50 + 120 + 20 = 190.0 over 3 rows
    assert got["revenue"].tolist() == [190.0]
    assert got["n_items"].tolist() == [3]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    want = con.sql(E.oracle_sql()["q6_forecast"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
