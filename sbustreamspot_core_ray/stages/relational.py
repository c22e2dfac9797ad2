"""Relational surface operators: per-group top-N, anti-join, and the
broadcast star-schema rollup.

The reference has no relational layer (SURVEY §2.7) — these fill the gap
idiomatically: every op is one cheap-key shuffle (or none) + a vectorized
per-partition kernel, the shapes that survive 100 TB. Money columns are
summed as exact integer 1e-4 units (the q1_revenue technique) so results
are bit-identical to a SQL mirror regardless of block/partition order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import part_of


def top_n_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    tie_col: str,
    n: int,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Top-n rows per group by (order_col DESC, tie_col ASC) — the
    window-function ROW_NUMBER() <= n pattern. ONE shuffle on
    hash(group) % P, then a per-partition lexsort + run-rank scan (no
    per-group Python). Output: group, tie, order value, rn (1-based).

    Scale: output is bounded at n rows per group; the kernel is O(rows
    log rows) per partition and holds only its partition in memory."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: g,
                tie_col: pc.cast(t[tie_col], pa.int64()),
                order_col: t[order_col],
                "__p": pa.array(part_of(g, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy()
        tie = t[tie_col].to_numpy()
        val = t[order_col].to_numpy(zero_copy_only=False)
        # lexsort: group asc, value desc, tie asc
        order = np.lexsort((tie, -val, g))
        g, tie, val = g[order], tie[order], val[order]
        starts = np.concatenate([[True], g[1:] != g[:-1]]) if len(g) else np.empty(0, bool)
        run_id = np.cumsum(starts) - 1
        pos = np.arange(len(g), dtype=np.int64)
        first_pos = pos[starts][run_id] if len(g) else pos
        rn = pos - first_pos + 1
        keep = rn <= n
        return pa.table(
            {
                group_col: g[keep],
                tie_col: tie[keep],
                order_col: val[keep],
                "rn": rn[keep],
            }
        )

    return (
        ds.select_columns([group_col, tie_col, order_col])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def anti_join_keys(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    key_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Rows of `left` whose key matches NO row of `right_keys` — relational
    NOT EXISTS. Build side is the DISTINCT key set (bounded by key
    cardinality, not right-side row count); probe is a hash left-outer
    join + null filter, all streaming."""
    import pyarrow.compute as pc

    distinct = (
        right_keys.select_columns([key_col])
        .groupby(key_col)
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    key_col: t[key_col],
                    "__hit": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
    )
    probed = left.join(
        distinct,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(key_col,),
    )

    def miss(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["__hit"])).drop_columns(["__hit"])

    return probed.map_batches(miss, batch_format="pyarrow")


def shipping_priority(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    segment: str,
    cutoff_us: int,
    num_partitions: int = 16,
    topn: int = 10,
) -> "pa.Table":
    """TPC-H-Q3-shaped shipping-priority report: revenue (exact 1e-4
    integer units) of lineitems shipped AFTER the cutoff, restricted to
    orders placed BEFORE the cutoff by customers of one market segment;
    the top-n orders by revenue.

    Scale shape: lineitem is combiner-shrunk to <= one row per orderkey
    per block BEFORE its shuffle; both joins are the house union-with-
    marker co-partition pattern (ONE cheap-key shuffle each — custkey,
    then orderkey — with a vectorized searchsorted kernel; Dataset.join
    is avoided because chained hash-join operators choke on the
    schema-less empty partitions tiny inputs produce). The top-n is a
    per-partition partial cut (<= n rows leave each kernel) followed by a
    driver fold over n*partitions rows. Integer revenue units make every
    comparison and the (units DESC, orderdate ASC, orderkey ASC)
    tie-break exact — orderkey is unique, so the order is total."""
    import pyarrow.compute as pc

    def ord_pre(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        f = t.filter(pc.less(od, pa.scalar(cutoff_us, pa.int64())))
        key = f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": key,
                "o_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
                "orderdate_us": pc.cast(f["o_orderdate"], pa.int64()),
                "priority": pc.cast(f["o_orderpriority"], pa.string()),
                "is_build": pa.array(np.zeros(len(key), bool)),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def cust_pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))
        key = f["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(key)
        return pa.table(
            {
                "key": key,
                "o_orderkey": pa.array(np.zeros(n, np.int64)),
                "orderdate_us": pa.array(np.zeros(n, np.int64)),
                "priority": pa.array([""] * n, pa.string()),
                "is_build": pa.array(np.ones(n, bool)),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def semi_kernel(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        ck = np.unique(key[build])
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(ck) and len(k):
            idx = np.minimum(np.searchsorted(ck, k), len(ck) - 1)
            sel = sel[ck[idx] == k]
        else:
            sel = sel[:0]
        pos = pa.array(sel)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].take(pos),
                "orderdate_us": t["orderdate_us"].take(pos),
                "priority": t["priority"].take(pos),
            }
        )

    semi = (
        orders.map_batches(ord_pre, batch_format="pyarrow")
        .union(customer.map_batches(cust_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(semi_kernel, batch_format="pyarrow")
    )

    def li_pre(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship > cutoff_us
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)[keep]
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": uk,
                "units": sums,
                "orderdate_us": np.zeros(len(uk), np.int64),
                "priority": pa.array([""] * len(uk), pa.string()),
                "is_build": pa.array(np.ones(len(uk), bool)),
                "__p": pa.array(part_of(uk, num_partitions), pa.int32()),
            }
        )

    def semi_tag(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": ok,
                "units": np.zeros(len(ok), np.int64),
                "orderdate_us": t["orderdate_us"],
                "priority": t["priority"],
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def join_cut(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "o_orderkey": np.empty(0, np.int64),
                "units": np.empty(0, np.int64),
                "orderdate_us": np.empty(0, np.int64),
                "priority": pa.array([], pa.string()),
            }
        )
        # revenue partials can split one orderkey across input blocks;
        # they all land here, so the local fold is globally exact
        rk = ok[build]
        if not len(rk):
            return empty
        uk, inv = np.unique(rk, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, units[build])
        sel = np.flatnonzero(~build)
        k = ok[sel]
        if not len(k):
            return empty
        idx = np.minimum(np.searchsorted(uk, k), len(uk) - 1)
        hit = uk[idx] == k
        sel, idx = sel[hit], idx[hit]
        u = sums[idx]
        od = t["orderdate_us"].to_numpy(zero_copy_only=False)[sel]
        cut = np.lexsort((ok[sel], od, -u))[:topn]
        pos = pa.array(sel[cut])
        return pa.table(
            {
                "o_orderkey": pa.array(ok[sel][cut], pa.int64()),
                "units": pa.array(u[cut], pa.int64()),
                "orderdate_us": pa.array(od[cut], pa.int64()),
                "priority": t["priority"].take(pos),
            }
        )

    parts = (
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(li_pre, batch_format="pyarrow")
        .union(semi.map_batches(semi_tag, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(join_cut, batch_format="pyarrow")
        .take_all()
    )
    ok = np.array([r["o_orderkey"] for r in parts], np.int64)
    u = np.array([r["units"] for r in parts], np.int64)
    od = np.array([r["orderdate_us"] for r in parts], np.int64)
    pr = np.array([r["priority"] for r in parts], object)
    order = np.lexsort((ok, od, -u))[:topn] if len(ok) else np.empty(0, np.int64)
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "orderkey": pa.array(ok[order], pa.int64()),
            "revenue": pa.array(
                round_half_away(u[order].astype(np.float64) / 10000.0, 2),
                pa.float64(),
            ),
            "orderdate_us": pa.array(od[order], pa.int64()),
            "priority": pa.array(pr[order].tolist(), pa.string()),
        }
    )


def local_supplier_revenue(
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    supplier_dim: "pa.Table",
    region_nations: np.ndarray,
    date_lo_us: int,
    date_hi_us: int,
    num_partitions: int = 16,
) -> "pa.Table":
    """TPC-H-Q5-shaped local-supplier revenue: lineitem revenue (exact 1e-4
    integer units) of orders placed in [date_lo, date_hi) where the
    supplier and the ordering customer share a nation, restricted to one
    region's nations; grouped per nation.

    Scale shape (the three-fact-join problem): the supplier dim is
    BROADCAST (suppliers are ~1e4 x SF — the small side by construction;
    `ray.put` once, searchsorted in every task, never a shuffle). The two
    big joins are each ONE cheap-key co-partition shuffle with the house
    union-with-marker pattern: (1) orders x customer on custkey to attach
    the customer's nation, (2) lineitem partials x the dated orders on
    orderkey. Lineitem rows are combined to <= one row per (orderkey,
    supp_nation) per block BEFORE the shuffle, and each join kernel emits
    only <= 25 per-nation partial sums, so the final groupby moves a few
    hundred integer rows. Returns (n_nationkey, units) — callers attach
    names and round.

    The reference has no joins at all (SURVEY §2.7); this is the
    idiomatic Ray Data shape for its gap."""
    import pyarrow.compute as pc

    nat_set = np.unique(np.asarray(region_nations, np.int64))
    sup = supplier_dim.combine_chunks().sort_by("s_suppkey")
    sup_keys = sup["s_suppkey"].to_numpy().astype(np.int64)
    sup_nat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sup_ref = ray.put((sup_keys, sup_nat, nat_set))

    # ---- join 1: dated orders x customer on custkey -> (orderkey, c_nat)
    def ord_pre(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (od >= date_lo_us) & (od < date_hi_us)
        key = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "key": key,
                "payload": ok,
                "is_build": pa.array(np.zeros(len(key), bool)),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def cust_pre(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, nat_set)
        key = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "key": key,
                "payload": nk[keep],
                "is_build": pa.array(np.ones(len(key), bool)),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def cust_join(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        payload = t["payload"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk, bn = key[build], payload[build]
        order = np.argsort(bk, kind="stable")
        bk, bn = bk[order], bn[order]
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            hit = bk[idx] == k
            sel, idx = sel[hit], idx[hit]
        else:
            sel, idx = sel[:0], np.empty(0, np.int64)
        ok = payload[sel]
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "c_nat": pa.array(bn[idx] if len(idx) else np.empty(0, np.int64)),
            }
        )

    dated = (
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ord_pre, batch_format="pyarrow")
        .union(
            customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
                cust_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(cust_join, batch_format="pyarrow")
    )

    # ---- join 2: lineitem partials x dated orders on orderkey ----------
    def li_pre(t: pa.Table) -> pa.Table:
        ks, kn, ns = ray.get(sup_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(ks, sk), len(ks) - 1)
        snat = kn[idx]
        keep = (ks[idx] == sk) & np.isin(snat, ns)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)[keep]
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        # per-batch combine on composite (orderkey, supp_nation): nation
        # keys are < 32 by TPC-H construction, so the pack is collision-free
        comp = ok * 32 + snat[keep]
        uk, inv = np.unique(comp, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        okey = uk >> 5
        return pa.table(
            {
                "key": okey,
                "nat": uk & 31,
                "units": sums,
                "is_build": pa.array(np.zeros(len(uk), bool)),
                "__p": pa.array(part_of(okey, num_partitions), pa.int32()),
            }
        )

    def ord_tag(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": ok,
                "nat": t["c_nat"],
                "units": np.zeros(len(ok), np.int64),
                "is_build": pa.array(np.ones(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def final_join(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        nat = t["nat"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk, bn = key[build], nat[build]  # orderkey unique in orders
        order = np.argsort(bk, kind="stable")
        bk, bn = bk[order], bn[order]
        sel = np.flatnonzero(~build)
        k = sel_nat = None
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            hit = bk[idx] == k
            sel, idx = sel[hit], idx[hit]
            # Q5's local-supplier predicate: supplier nation == customer nation
            local = nat[sel] == bn[idx]
            sel = sel[local]
        else:
            sel = sel[:0]
        sel_nat = nat[sel]
        sums = np.bincount(sel_nat, weights=units[sel], minlength=32).astype(np.int64)
        nz = np.flatnonzero(sums)
        return pa.table(
            {
                "n_nationkey": pa.array(nz, pa.int64()),
                "units": pa.array(sums[nz], pa.int64()),
            }
        )

    return (
        lineitem.select_columns(
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
        )
        .map_batches(li_pre, batch_format="pyarrow")
        .union(dated.map_batches(ord_tag, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(final_join, batch_format="pyarrow")
        .groupby("n_nationkey")
        .sum("units")
        .rename_columns({"sum(units)": "units"})
    )


def copurchase_pairs(
    lineitem: ray.data.Dataset,
    num_partitions: int = 16,
    min_count: int = 2,
    topn: int = 100,
    basket_cap: int = 256,
    allow_truncate: bool = False,
) -> "pa.Table":
    """Market-basket pair mining: the top-n pairs of parts that co-occur in
    the most orders (count >= min_count), ties broken (part_a, part_b) — a
    frequent-itemset-pairs pass, the relational self-join the reference's
    LSH co-bucket pairing (cluster.cpp:59-74) approximates for graphs.

    Scale shape: ONE shuffle on hash(orderkey); per partition the basket
    pairs are enumerated with the closed-form triangular decode (the
    simhash band kernel's shape, dedup.py), baskets over `basket_cap`
    items REFUSED by default (ValueError — the SQL oracle enumerates all
    pairs, so silent truncation would break parity; allow_truncate=True
    opts into the logged recall loss), and pair
    counts are COMBINED per partition before the SECOND shuffle — an
    int32 hash(pair) key into a fold + partial-top-n kernel (<= topn rows
    leave each partition; pair partitions are key-disjoint so the driver
    fold over P*topn rows is exact). Two cheap-key shuffles total, both
    over combined partials — never a sort-based multi-column groupby."""

    def tag(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": ok,
                "pk": t["l_partkey"],
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def basket_pairs(t: pa.Table) -> pa.Table:
        ok = t["ok"].to_numpy()
        pk = t["pk"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # distinct (order, part): quantities/lineitems repeat parts
        keep = np.concatenate([[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])])
        ok, pk = ok[keep], pk[keep]
        starts = np.flatnonzero(np.concatenate([[True], ok[1:] != ok[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(ok)]]))
        over = lens > basket_cap
        if over.any():
            if not allow_truncate:
                # parity guard: the SQL oracle enumerates ALL pairs, so a
                # silent truncation would break the value gate without a
                # failure — refuse unless the caller opted in (the
                # k4_count cap pattern; ADVICE.md round 3)
                raise ValueError(
                    f"copurchase_pairs: {int(over.sum())} baskets exceed "
                    f"basket_cap={basket_cap} (max {int(lens.max())}); "
                    f"pass allow_truncate=True to accept the recall loss "
                    f"or raise basket_cap"
                )
            print(
                f"copurchase_pairs: truncating {int(over.sum())} baskets "
                f"over cap={basket_cap} (explicit recall loss)"
            )
            lens = np.minimum(lens, basket_cap)
        npair = lens * (lens - 1) // 2
        tot = int(npair.sum())
        z = np.empty(0, np.int64)
        if tot == 0:
            return pa.table(
                {
                    "part_a": z,
                    "part_b": z,
                    "cnt": z,
                    "__q": pa.array(np.empty(0, np.int32), pa.int32()),
                }
            )
        run_id = np.repeat(np.arange(len(lens)), npair)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run_id]
        L = lens[run_id]
        i = np.floor(
            ((2 * L - 1) - np.sqrt((2 * L - 1).astype(np.float64) ** 2 - 8 * within))
            / 2
        ).astype(np.int64)
        j = within - (i * (L - 1) - i * (i - 1) // 2) + i + 1
        base = starts[run_id]
        a, b = pk[base + i], pk[base + j]  # a < b: parts sorted within order
        # partition-local combine: one row per distinct pair
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        idx = np.flatnonzero(first)
        cnt = np.diff(np.concatenate([idx, [len(a)]]))
        from ..pipelines.superstep import _pair_part

        return pa.table(
            {
                "part_a": a[idx],
                "part_b": b[idx],
                "cnt": cnt,
                "__q": pa.array(
                    _pair_part(a[idx], b[idx], num_partitions), pa.int32()
                ),
            }
        )

    def pair_fold(t: pa.Table) -> pa.Table:
        """All partials of a pair land here (hash(pair) partition): fold,
        filter min_count, partial top-n cut — <= topn rows leave."""
        a = t["part_a"].to_numpy()
        b = t["part_b"].to_numpy()
        c = t["cnt"].to_numpy()
        po = np.lexsort((b, a))
        a, b, c = a[po], b[po], c[po]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        idx = np.flatnonzero(first)
        sums = np.add.reduceat(c, idx) if len(c) else np.empty(0, np.int64)
        a, b = a[idx], b[idx]
        keep = sums >= min_count
        a, b, sums = a[keep], b[keep], sums[keep]
        sel = np.lexsort((b, a, -sums))[:topn]
        return pa.table({"part_a": a[sel], "part_b": b[sel], "cnt": sums[sel]})

    parts = (
        lineitem.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(basket_pairs, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(pair_fold, batch_format="pyarrow")
        .take_all()
    )
    a = np.array([r["part_a"] for r in parts], np.int64)
    b = np.array([r["part_b"] for r in parts], np.int64)
    c = np.array([r["cnt"] for r in parts], np.int64)
    sel = np.lexsort((b, a, -c))[:topn] if len(a) else np.empty(0, np.int64)
    return pa.table(
        {
            "part_a": pa.array(a[sel], pa.int64()),
            "part_b": pa.array(b[sel], pa.int64()),
            "cnt": pa.array(c[sel], pa.int64()),
        }
    )


def frequent_triples(
    lineitem: ray.data.Dataset,
    num_partitions: int = 16,
    item_min: int = 3,
    min_count: int = 2,
    topn: int = 100,
    basket_cap: int = 256,
    allow_truncate: bool = False,
) -> "pa.Table":
    """Apriori-style frequent 3-itemset mining: the top-n part triples
    co-occurring in >= min_count orders, candidate space pruned by global
    item support (only parts in >= item_min distinct orders enter a
    basket) — the downward-closure step that keeps the triple fan-out
    bounded at corpus scale.

    Scale shape: ONE shuffle on hash(orderkey) (the copurchase_pairs
    shape). Item supports are folded from per-partition partial counts
    (combiner rows, never a raw-key groupby), the surviving item set is
    `ray.put` ONCE and membership-tested per partition with a sorted
    searchsorted. Triples are enumerated with two vectorized repeat
    passes (pairs via the closed-form triangular decode, then each pair
    (i, j) extended by its basket tail k > j), baskets over `basket_cap`
    items REFUSED by default (ValueError — the SQL oracle enumerates all
    triples, so silent truncation would break parity; allow_truncate=True
    opts into the logged recall loss), counts COMBINED per partition
    before the SECOND shuffle on
    hash(triple); triple partitions are key-disjoint so per-partition
    top-n cuts compose into an exact driver fold of <= P * topn rows."""
    from ..pipelines.superstep import _pair_part, distinct

    de = distinct(
        lineitem.select_columns(["l_orderkey", "l_partkey"]).map_batches(
            lambda t: pa.table(
                {
                    "ok": t["l_orderkey"].cast(pa.int64()),
                    "pk": t["l_partkey"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["ok", "pk"],
    ).materialize()  # consumed by the support fold AND the basket pass

    def support_partial(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy()
        u, c = np.unique(pk, return_counts=True)
        return pa.table(
            {
                "pk": u,
                "c": c.astype(np.int64),
                "__p": pa.array(part_of(u, num_partitions), pa.int32()),
            }
        )

    def support_fold(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy()
        c = t["c"].to_numpy()
        u, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=c, minlength=len(u)).astype(np.int64)
        keep = s >= item_min
        return pa.table({"pk": u[keep]})

    freq = np.sort(
        de.map_batches(support_partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(support_fold, batch_format="pyarrow")
        .to_pandas()["pk"]
        .to_numpy(np.int64)
    )
    freq_ref = ray.put(freq)

    def tag(t: pa.Table) -> pa.Table:
        ok = t["ok"].to_numpy()
        return t.append_column(
            "__p", pa.array(part_of(ok, num_partitions), pa.int32())
        )

    def basket_triples(t: pa.Table) -> pa.Table:
        from ..functions.proccache import cached_get

        fr = cached_get(freq_ref)
        ok = t["ok"].to_numpy()
        pk = t["pk"].to_numpy()
        if len(fr):
            pos = np.minimum(np.searchsorted(fr, pk), len(fr) - 1)
            keepm = fr[pos] == pk
        else:
            keepm = np.zeros(len(pk), bool)
        ok, pk = ok[keepm], pk[keepm]
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.flatnonzero(np.concatenate([[True], ok[1:] != ok[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(ok)]]))
        over = lens > basket_cap
        if over.any():
            if not allow_truncate:
                # parity guard: the SQL oracle enumerates ALL triples, so
                # silent truncation would break the value gate without a
                # failure — refuse unless the caller opted in (the
                # k4_count cap pattern; ADVICE.md round 3)
                raise ValueError(
                    f"frequent_triples: {int(over.sum())} baskets exceed "
                    f"basket_cap={basket_cap} (max {int(lens.max())}); "
                    f"pass allow_truncate=True to accept the recall loss "
                    f"or raise basket_cap"
                )
            print(
                f"frequent_triples: truncating {int(over.sum())} baskets "
                f"over cap={basket_cap} (explicit recall loss)"
            )
            lens = np.minimum(lens, basket_cap)
        z = np.empty(0, np.int64)
        empty = pa.table(
            {
                "p1": z,
                "p2": z,
                "p3": z,
                "cnt": z,
                "__q": pa.array(np.empty(0, np.int32), pa.int32()),
            }
        )
        npair = lens * (lens - 1) // 2
        tot = int(npair.sum())
        if tot == 0:
            return empty
        # stage 1: (i, j) pairs per basket — closed-form triangular decode
        run_id = np.repeat(np.arange(len(lens)), npair)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run_id]
        L = lens[run_id]
        i = np.floor(
            ((2 * L - 1) - np.sqrt((2 * L - 1).astype(np.float64) ** 2 - 8 * within))
            / 2
        ).astype(np.int64)
        j = within - (i * (L - 1) - i * (i - 1) // 2) + i + 1
        # stage 2: extend each pair by its basket tail (k = j+1 .. L-1)
        ext = L - 1 - j
        tot3 = int(ext.sum())
        if tot3 == 0:
            return empty
        pair_id = np.repeat(np.arange(tot), ext)
        koff = np.arange(tot3) - np.concatenate([[0], np.cumsum(ext)])[pair_id]
        k = j[pair_id] + 1 + koff
        base = starts[run_id][pair_id]
        a = pk[base + i[pair_id]]
        b = pk[base + j[pair_id]]
        c = pk[base + k]
        # partition-local combine: one row per distinct triple
        po = np.lexsort((c, b, a))
        a, b, c = a[po], b[po], c[po]
        first = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (c[1:] != c[:-1])]
        )
        idx = np.flatnonzero(first)
        cnt = np.diff(np.concatenate([idx, [len(a)]]))
        a, b, c = a[idx], b[idx], c[idx]
        return pa.table(
            {
                "p1": a,
                "p2": b,
                "p3": c,
                "cnt": cnt,
                "__q": pa.array(
                    _pair_part(_mix3(a, b), c, num_partitions), pa.int32()
                ),
            }
        )

    def triple_fold(t: pa.Table) -> pa.Table:
        a = t["p1"].to_numpy()
        b = t["p2"].to_numpy()
        c = t["p3"].to_numpy()
        n = t["cnt"].to_numpy()
        po = np.lexsort((c, b, a))
        a, b, c, n = a[po], b[po], c[po], n[po]
        first = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (c[1:] != c[:-1])]
        )
        idx = np.flatnonzero(first)
        sums = np.add.reduceat(n, idx) if len(n) else np.empty(0, np.int64)
        a, b, c = a[idx], b[idx], c[idx]
        keep = sums >= min_count
        a, b, c, sums = a[keep], b[keep], c[keep], sums[keep]
        sel = np.lexsort((c, b, a, -sums))[:topn]
        return pa.table({"p1": a[sel], "p2": b[sel], "p3": c[sel], "cnt": sums[sel]})

    parts = (
        de.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(basket_triples, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(triple_fold, batch_format="pyarrow")
        .take_all()
    )
    a = np.array([r["p1"] for r in parts], np.int64)
    b = np.array([r["p2"] for r in parts], np.int64)
    c = np.array([r["p3"] for r in parts], np.int64)
    n = np.array([r["cnt"] for r in parts], np.int64)
    sel = (
        np.lexsort((c, b, a, -n))[:topn] if len(a) else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "p1": pa.array(a[sel], pa.int64()),
            "p2": pa.array(b[sel], pa.int64()),
            "p3": pa.array(c[sel], pa.int64()),
            "cnt": pa.array(n[sel], pa.int64()),
        }
    )


def _mix3(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fold two int64 columns into one mixed uint64 key (feeds _pair_part
    for a 3-column composite partition id)."""
    with np.errstate(over="ignore"):
        return a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
            np.uint64
        )


DAY_US = 86_400_000_000


def open_orders_daily(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    num_partitions: int = 16,
) -> "pa.Table":
    """Sweep-line interval-concurrency count: for every day carrying a
    change, how many orders are OPEN (placed, not yet fully shipped —
    open on days [orderdate_day, max_shipdate_day]). The classic
    interval-stabbing query, computed as +-1 boundary deltas and one
    prefix sum — never a days x orders join.

    Scale shape: lineitem is combiner-shrunk to <= one (orderkey,
    max_ship_day) row per block, then ONE orderkey-key co-partition
    shuffle joins it to the orders side; each partition emits its
    day-delta partials COMBINED (<= 2 rows per distinct boundary day);
    the driver prefix-sums a calendar-bounded table (#distinct days,
    independent of order count). Returns (day, open_orders)."""
    import pyarrow.compute as pc

    def li_pre(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), -1, np.int64)
        np.maximum.at(mx, inv, d)
        return pa.table(
            {
                "key": uk,
                "day": mx,
                "is_build": pa.array(np.ones(len(uk), bool)),
                "__p": pa.array(part_of(uk, num_partitions), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
            // DAY_US
        )
        return pa.table(
            {
                "key": ok,
                "day": d,
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def deltas(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        day = t["day"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        # fold lineitem partials: true per-order max ship day
        bk, bd = key[build], day[build]
        uk, inv = np.unique(bk, return_inverse=True)
        mx = np.full(len(uk), -1, np.int64)
        np.maximum.at(mx, inv, bd)
        sel = np.flatnonzero(~build)
        k, d0 = key[sel], day[sel]
        if len(uk) and len(k):
            idx = np.minimum(np.searchsorted(uk, k), len(uk) - 1)
            hit = uk[idx] == k
            d0, idx = d0[hit], idx[hit]
        else:
            d0, idx = d0[:0], np.empty(0, np.int64)
        d1 = mx[idx]
        days = np.concatenate([d0, d1 + 1])
        dd = np.concatenate(
            [np.ones(len(d0), np.int64), -np.ones(len(d1), np.int64)]
        )
        u, inv2 = np.unique(days, return_inverse=True)
        s = np.bincount(inv2, weights=dd, minlength=len(u)).astype(np.int64)
        nz = s != 0
        return pa.table({"day": u[nz], "delta": s[nz]})

    parts = (
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
                ord_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(deltas, batch_format="pyarrow")
        .take_all()
    )
    days = np.array([r["day"] for r in parts], np.int64)
    dd = np.array([r["delta"] for r in parts], np.int64)
    u, inv = np.unique(days, return_inverse=True)
    s = np.bincount(inv, weights=dd, minlength=len(u)).astype(np.int64)
    keep = s != 0
    u, s = u[keep], s[keep]
    running = np.cumsum(s)
    return pa.table(
        {
            "day": pa.array(u, pa.int64()),
            "open_orders": pa.array(running, pa.int64()),
        }
    )


def order_fill_rate(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    window_us: int,
    num_partitions: int = 16,
) -> "pa.Table":
    """Per-priority order fill rate: fraction of orders whose LAST
    lineitem ships within `window_us` of the order date. One orderkey
    co-partition shuffle (lineitem combiner-shrunk to per-order max ship
    time per block); each partition emits <= |priorities| integer rows;
    the single fill-rate division happens once per priority on exact
    counts. Returns (priority, n_orders, n_filled, fill_rate)."""
    import pyarrow.compute as pc

    def li_pre(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.table(
            {
                "key": uk,
                "t": mx,
                "priority": pa.array([""] * len(uk), pa.string()),
                "is_build": pa.array(np.ones(len(uk), bool)),
                "__p": pa.array(part_of(uk, num_partitions), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = pc.cast(t["o_orderdate"], pa.int64())
        return pa.table(
            {
                "key": ok,
                "t": od,
                "priority": pc.cast(t["o_orderpriority"], pa.string()),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        tt = t["t"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk, bt = key[build], tt[build]
        uk, inv = np.unique(bk, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, bt)
        sel = np.flatnonzero(~build)
        k, od = key[sel], tt[sel]
        if len(uk) and len(k):
            idx = np.minimum(np.searchsorted(uk, k), len(uk) - 1)
            hit = uk[idx] == k
            sel, od, idx = sel[hit], od[hit], idx[hit]
        else:
            sel, od, idx = sel[:0], od[:0], np.empty(0, np.int64)
        filled = (mx[idx] - od) <= window_us
        import pandas as pd

        pr = t["priority"].to_pandas().iloc[sel].to_numpy(object)
        df = pd.DataFrame({"priority": pr, "ok": filled.astype(np.int64)})
        g = df.groupby("priority", sort=False).agg(
            n=("ok", "size"), filled=("ok", "sum")
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["filled"] = g["filled"].astype(np.int64)
        return pa.table(
            {
                "priority": pa.array(g["priority"], pa.string()),
                "n": pa.array(g["n"].to_numpy()),
                "filled": pa.array(g["filled"].to_numpy()),
            }
        )

    parts = (
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            orders.select_columns(
                ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ).map_batches(ord_pre, batch_format="pyarrow")
        )
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    import pandas as pd

    from ..functions.rounding import round_half_away

    df = pd.DataFrame(parts)
    g = df.groupby("priority", sort=True)[["n", "filled"]].sum().reset_index()
    n = g["n"].to_numpy(np.int64)
    f = g["filled"].to_numpy(np.int64)
    return pa.table(
        {
            "priority": pa.array(g["priority"], pa.string()),
            "n_orders": pa.array(n),
            "n_filled": pa.array(f),
            "fill_rate": pa.array(
                round_half_away(f.astype(np.float64) / n, 6), pa.float64()
            ),
        }
    )


def supplier_share(
    lineitem: ray.data.Dataset,
    supplier_dim: "pa.Table",
    nation_dim: "pa.Table",
    num_partitions: int = 16,
) -> "pa.Table":
    """Market-concentration report: per nation, the revenue share of its
    single largest supplier (exact integer 1e-4 units; one division per
    nation). Combiner-shrunk per-supplier sums -> one supplier-key
    groupby -> broadcast dim attach -> 25-row driver fold."""

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        return pa.table({"s_suppkey": uk, "units": sums})

    per_supp = (
        lineitem.select_columns(["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("units")
        .take_all()
    )
    import pandas as pd

    from ..functions.rounding import round_half_away

    df = pd.DataFrame(per_supp).rename(columns={"sum(units)": "units"})
    sup = supplier_dim.to_pandas().set_index("s_suppkey")["s_nationkey"]
    df["nk"] = df["s_suppkey"].map(sup).astype(np.int64)
    g = df.groupby("nk", sort=True)["units"].agg(["max", "sum"]).reset_index()
    names = nation_dim.to_pandas().set_index("n_nationkey")["n_name"]
    top = g["max"].to_numpy(np.int64)
    tot = g["sum"].to_numpy(np.int64)
    return pa.table(
        {
            "n_name": pa.array(g["nk"].map(names), pa.string()),
            "top_units": pa.array(top),
            "total_units": pa.array(tot),
            "share": pa.array(
                round_half_away(top.astype(np.float64) / tot, 6), pa.float64()
            ),
        }
    )


def revenue_by_nation(
    lineitem: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation_region: "pa.Table",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Star-schema revenue rollup: lineitem revenue (exact 1e-4 integer
    units) pre-aggregated per supplier BEFORE any shuffle, joined to the
    supplier dim on the supplier key, then mapped through a broadcast
    25-row nationkey -> (n_name, r_name) lookup (ray.put once, read in
    every task — never a shuffle join on a fixed-size dim).

    Returns (r_name, n_name, units: int64) — callers divide/round.

    Scale shape: the combiner shrinks lineitem to <= |suppliers| rows per
    block; the only shuffles are the supplier-key aggregate/join; the
    nation/region dims never move."""

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-batch combine: one row per distinct supplier in the batch
        uk, inv = np.unique(sk, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        return pa.table({"s_suppkey": uk, "units": sums})

    def norm(t: pa.Table) -> pa.Table:
        # tiny inputs can surface schema-less EMPTY aggregate blocks (Ray
        # Data drops the schema with the rows), which the downstream
        # Project/join reject ("no match for key field s_suppkey");
        # re-stamp the schema (and fold the rename in) so every block,
        # empty or not, is join-compatible
        if "s_suppkey" not in t.column_names:
            return pa.table(
                {
                    "s_suppkey": pa.array([], pa.int64()),
                    "units": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {"s_suppkey": t["s_suppkey"], "units": t["sum(units)"]}
        )

    per_supp = (
        lineitem.select_columns(["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("s_suppkey")
        .sum("units")
        .map_batches(norm, batch_format="pyarrow")
    )
    # supplier is a DIMENSION (10k rows/sf1): broadcast its
    # suppkey -> nationkey map once instead of a shuffle join — the same
    # attach pattern as the 25-row nation/region lut (and it sidesteps
    # Ray Data's hash-join crash on the schema-less empty aggregate
    # blocks tiny inputs produce; map_batches is not even CALLED for
    # empty blocks, so they pass through every normalization harmlessly)
    sdf = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    so = np.argsort(sdf["s_suppkey"].to_numpy(np.int64))
    supp_ref = ray.put(
        (
            sdf["s_suppkey"].to_numpy(np.int64)[so],
            sdf["s_nationkey"].to_numpy(np.int64)[so],
        )
    )

    lut = nation_region.combine_chunks().sort_by("n_nationkey")
    lookup_ref = ray.put(lut)

    def attach(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sk_keys, sk_nation = ray.get(supp_ref)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        spos = np.searchsorted(sk_keys, sk)
        np.clip(spos, 0, max(len(sk_keys) - 1, 0), out=spos)
        if len(sk_keys):
            ok = sk_keys[spos] == sk  # inner-join semantics
        else:
            ok = np.zeros(len(sk), bool)
        dim = ray.get(lookup_ref)
        keys = dim["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = sk_nation[spos[ok]]
        idx = np.searchsorted(keys, nk)  # vectorized dim lookup, no row loop
        return pa.table(
            {
                "r_name": pc.take(dim["r_name"], pa.array(idx)),
                "n_name": pc.take(dim["n_name"], pa.array(idx)),
                "units": pa.array(
                    t["units"].to_numpy(zero_copy_only=False)[ok]
                ),
            }
        )

    return (
        per_supp.map_batches(attach, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .sum("units")
        .rename_columns({"sum(units)": "units"})
    )


def priority_semi_counts(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    date_lo_us: int,
    date_hi_us: int,
    returnflag: str,
    num_partitions: int = 16,
) -> "pa.Table":
    """TPC-H-Q4-shaped EXISTS semi-join count: orders placed in
    [date_lo_us, date_hi_us) with AT LEAST ONE lineitem of the given
    return flag, counted per o_orderpriority.

    Scale shape: the build side is combiner-shrunk to <= one orderkey row
    per block BEFORE the shuffle (semi-join needs existence only, never
    the lineitem payload); ONE orderkey co-partition shuffle; each
    partition emits <= |priorities| integer partial counts, folded
    driver-side over a priorities x partitions bounded table. Orderkey is
    the orders PK, so probe hits count each order exactly once."""
    import pyarrow.compute as pc

    def li_pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], pa.scalar(returnflag)))
        uk = np.unique(
            f["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "key": uk,
                "priority": pa.array([""] * len(uk), pa.string()),
                "is_build": pa.array(np.ones(len(uk), bool)),
                "__p": pa.array(part_of(uk, num_partitions), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(od, pa.scalar(date_lo_us, pa.int64())),
                pc.less(od, pa.scalar(date_hi_us, pa.int64())),
            )
        )
        ok = f["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ok,
                "priority": pc.cast(f["o_orderpriority"], pa.string()),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        import pandas as pd

        key = t["key"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk = np.unique(key[build])
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            sel = sel[bk[idx] == k]
        else:
            sel = sel[:0]
        pr = t["priority"].to_pandas().iloc[sel]
        agg = pr.value_counts()
        return pa.table(
            {
                "o_orderpriority": pa.array(agg.index.to_numpy(object), pa.string()),
                "order_count": pa.array(agg.to_numpy(np.int64), pa.int64()),
            }
        )

    parts = (
        lineitem.select_columns(["l_orderkey", "l_returnflag"])
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            orders.select_columns(
                ["o_orderkey", "o_orderdate", "o_orderpriority"]
            ).map_batches(ord_pre, batch_format="pyarrow")
        )
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    import pandas as pd

    df = pd.DataFrame(parts, columns=["o_orderpriority", "order_count"])
    out = (
        df.groupby("o_orderpriority", as_index=False)["order_count"]
        .sum()
        .sort_values("o_orderpriority")
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(
                out["o_orderpriority"].to_numpy(object), pa.string()
            ),
            "order_count": pa.array(out["order_count"].to_numpy(np.int64)),
        }
    )


def priority_class_counts(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    ship_lo_us: int,
    ship_hi_us: int,
    high_priorities: tuple[str, ...],
    num_partitions: int = 16,
) -> "pa.Table":
    """TPC-H-Q12-shaped fact-fact join + conditional aggregation: lineitems
    shipped in [ship_lo_us, ship_hi_us), joined to their order's priority,
    counted per l_linestatus split into high- vs low-priority classes.

    Scale shape: lineitem is combiner-shrunk per block to <= one
    (orderkey, linestatus, count) row before the ONE orderkey co-partition
    shuffle (the build side carries counts, not rows); orders is the probe
    carrying the priority; each partition emits <= |linestatus| partial
    (high, low) integer rows, folded driver-side."""
    import pyarrow.compute as pc

    def li_pre(t: pa.Table) -> pa.Table:
        import pandas as pd

        ship = pc.cast(t["l_shipdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(ship_lo_us, pa.int64())),
                pc.less(ship, pa.scalar(ship_hi_us, pa.int64())),
            )
        )
        ok = f["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = f["l_linestatus"].to_pandas().to_numpy(object)
        df = pd.DataFrame({"key": ok, "status": st})
        agg = df.groupby(["key", "status"], as_index=False).size()
        key = agg["key"].to_numpy(np.int64)
        return pa.table(
            {
                "key": key,
                "status": pa.array(agg["status"].to_numpy(object), pa.string()),
                "cnt": pa.array(agg["size"].to_numpy(np.int64)),
                "is_build": pa.array(np.ones(len(key), bool)),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ok,
                "status": pc.cast(t["o_orderpriority"], pa.string()),
                "cnt": pa.array(np.zeros(len(ok), np.int64)),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    hi = set(high_priorities)

    def kern(t: pa.Table) -> pa.Table:
        import pandas as pd

        key = t["key"].to_numpy()
        cnt = t["cnt"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sv = t["status"].to_pandas().to_numpy(object)
        # probe table: orderkey -> is_high (orders PK: unique within partition)
        sel_o = np.flatnonzero(~build)
        pk = key[sel_o]
        order_sorted = np.argsort(pk, kind="stable")
        pk = pk[order_sorted]
        is_high = np.array(
            [s in hi for s in sv[sel_o][order_sorted]], bool
        )
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        if len(pk) and len(lk):
            idx = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            hit = pk[idx] == lk
            sel_l, idx = sel_l[hit], idx[hit]
        else:
            sel_l, idx = sel_l[:0], np.empty(0, np.int64)
        h = is_high[idx]
        df = pd.DataFrame(
            {
                "l_linestatus": sv[sel_l],
                "high": np.where(h, cnt[sel_l], 0),
                "low": np.where(h, 0, cnt[sel_l]),
            }
        )
        agg = df.groupby("l_linestatus", as_index=False).sum()
        return pa.table(
            {
                "l_linestatus": pa.array(
                    agg["l_linestatus"].to_numpy(object), pa.string()
                ),
                "high": pa.array(agg["high"].to_numpy(np.int64)),
                "low": pa.array(agg["low"].to_numpy(np.int64)),
            }
        )

    parts = (
        lineitem.select_columns(["l_orderkey", "l_linestatus", "l_shipdate"])
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            orders.select_columns(["o_orderkey", "o_orderpriority"]).map_batches(
                ord_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    import pandas as pd

    df = pd.DataFrame(parts, columns=["l_linestatus", "high", "low"])
    out = (
        df.groupby("l_linestatus", as_index=False)[["high", "low"]]
        .sum()
        .sort_values("l_linestatus")
    )
    return pa.table(
        {
            "l_linestatus": pa.array(
                out["l_linestatus"].to_numpy(object), pa.string()
            ),
            "high_line_count": pa.array(out["high"].to_numpy(np.int64)),
            "low_line_count": pa.array(out["low"].to_numpy(np.int64)),
        }
    )


def promo_revenue_share(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    promo_prefix: str = "PROMO",
    num_partitions: int = 16,
) -> "pa.Table":
    """TPC-H-Q14-shaped promo revenue share per calendar month: the share
    of lineitem revenue on parts whose p_type starts with `promo_prefix`.

    Scale shape: lineitem is combiner-shrunk per block to <= one
    (partkey, month, units) integer row before the ONE partkey
    co-partition shuffle; the part side ships only (partkey, is_promo)
    bits; each partition emits <= |months| partial (promo, total) unit
    sums, folded driver-side over a months x partitions bounded table.
    The single share division happens once per month on exact int64 unit
    sums (< 2^53, exact in float64), so the result is bit-identical to
    the SQL mirror regardless of block order."""
    import pyarrow.compute as pc

    def part_pre(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        promo = pc.starts_with(t["p_type"], promo_prefix).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "key": pk,
                "ym": pa.array(promo.astype(np.int64)),
                "units": pa.array(np.zeros(len(pk), np.int64)),
                "is_build": pa.array(np.ones(len(pk), bool)),
                "__p": pa.array(part_of(pk, num_partitions), pa.int32()),
            }
        )

    def li_pre(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        m = (
            t["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        if not len(pk):
            return pa.table(
                {
                    "key": np.empty(0, np.int64),
                    "ym": pa.array(np.empty(0, np.int64)),
                    "units": pa.array(np.empty(0, np.int64)),
                    "is_build": pa.array(np.empty(0, bool)),
                    "__p": pa.array(np.empty(0, np.int32), pa.int32()),
                }
            )
        # block-local composite fold key (partkey, month) — rebased on the
        # block's month range so it is collision-free for any date span
        mmin = m.min()
        span = int(m.max() - mmin) + 1
        fold_key = pk * span + (m - mmin)
        uk, inv = np.unique(fold_key, return_inverse=True)
        su = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        out_pk = uk // span
        out_m = uk % span + mmin
        out_ym = (1970 + out_m // 12) * 100 + (out_m % 12 + 1)
        return pa.table(
            {
                "key": out_pk,
                "ym": pa.array(out_ym),
                "units": pa.array(su),
                "is_build": pa.array(np.zeros(len(uk), bool)),
                "__p": pa.array(part_of(out_pk, num_partitions), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        ym = t["ym"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk = key[build]
        order_sorted = np.argsort(bk, kind="stable")
        bk = bk[order_sorted]
        promo = ym[build][order_sorted] != 0
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            hit = bk[idx] == k
            sel, idx = sel[hit], idx[hit]
        else:
            sel, idx = sel[:0], np.empty(0, np.int64)
        u = units[sel]
        mth = ym[sel]
        isp = promo[idx]
        um, inv = np.unique(mth, return_inverse=True)
        tot = np.bincount(inv, weights=u, minlength=len(um)).astype(np.int64)
        pro = np.bincount(
            inv, weights=np.where(isp, u, 0), minlength=len(um)
        ).astype(np.int64)
        return pa.table(
            {
                "ym": pa.array(um),
                "promo_u": pa.array(pro),
                "total_u": pa.array(tot),
            }
        )

    parts = (
        lineitem.select_columns(
            ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            part.select_columns(["p_partkey", "p_type"]).map_batches(
                part_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    ym = np.array([r["ym"] for r in parts], np.int64)
    pu = np.array([r["promo_u"] for r in parts], np.int64)
    tu = np.array([r["total_u"] for r in parts], np.int64)
    um, inv = np.unique(ym, return_inverse=True)
    pro = np.bincount(inv, weights=pu, minlength=len(um)).astype(np.int64)
    tot = np.bincount(inv, weights=tu, minlength=len(um)).astype(np.int64)
    keep = tot > 0
    um, pro, tot = um[keep], pro[keep], tot[keep]
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "ym": pa.array(um, pa.int64()),
            "promo_revenue": pa.array(
                round_half_away(pro.astype(np.float64) / 10000.0, 2), pa.float64()
            ),
            "total_revenue": pa.array(
                round_half_away(tot.astype(np.float64) / 10000.0, 2), pa.float64()
            ),
            "promo_share": pa.array(
                round_half_away(
                    100.0 * pro.astype(np.float64) / tot.astype(np.float64), 6
                ),
                pa.float64(),
            ),
        }
    )


def disjunctive_bracket_revenue(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    brackets: list[tuple[str, int, int, int, int]],
    num_partitions: int = 16,
) -> "pa.Table":
    """TPC-H-Q19-shaped disjunctive predicate revenue: total revenue of
    lineitems matching ANY (brand, size range, quantity range) bracket —
    the compound OR-of-ANDs predicate that spans both join sides.

    Scale shape: the part side ships one BITMASK per partkey (which
    brackets its brand/size satisfies); lineitem is combiner-shrunk per
    block to (partkey, quantity, units) integer rows (quantity is integral
    in this corpus — asserted); after the ONE partkey co-partition shuffle
    each partition applies the per-bracket quantity windows against the
    looked-up masks fully vectorized and emits a single unit sum. Driver
    folds P scalars. Returns one row (revenue,) in exact integer units
    divided once."""
    import pyarrow.compute as pc

    def part_pre(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        brand = t["p_brand"].to_pandas().to_numpy(object)
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.zeros(len(pk), np.int64)
        for i, (br, slo, shi, _qlo, _qhi) in enumerate(brackets):
            m = (brand == br) & (size >= slo) & (size <= shi)
            mask |= m.astype(np.int64) << i
        keep = mask != 0  # parts matching no bracket never contribute
        return pa.table(
            {
                "key": pk[keep],
                "qty": pa.array(mask[keep]),
                "units": pa.array(np.zeros(int(keep.sum()), np.int64)),
                "is_build": pa.array(np.ones(int(keep.sum()), bool)),
                "__p": pa.array(part_of(pk[keep], num_partitions), pa.int32()),
            }
        )

    def li_pre(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = t["l_quantity"].to_numpy(zero_copy_only=False)
        q = np.floor(qf + 0.5).astype(np.int64)
        assert np.all(q == qf), "l_quantity must be integral for the fold key"
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        if not len(pk):
            return pa.table(
                {
                    "key": np.empty(0, np.int64),
                    "qty": pa.array(np.empty(0, np.int64)),
                    "units": pa.array(np.empty(0, np.int64)),
                    "is_build": pa.array(np.empty(0, bool)),
                    "__p": pa.array(np.empty(0, np.int32), pa.int32()),
                }
            )
        qspan = int(q.max()) + 1
        fold = pk * qspan + q
        uk, inv = np.unique(fold, return_inverse=True)
        su = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        okey = uk // qspan
        oq = uk % qspan
        return pa.table(
            {
                "key": okey,
                "qty": pa.array(oq),
                "units": pa.array(su),
                "is_build": pa.array(np.zeros(len(uk), bool)),
                "__p": pa.array(part_of(okey, num_partitions), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        qty = t["qty"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bk = key[build]
        order_sorted = np.argsort(bk, kind="stable")
        bk = bk[order_sorted]
        bmask = qty[build][order_sorted]
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            hit = bk[idx] == k
            sel, idx = sel[hit], idx[hit]
        else:
            sel, idx = sel[:0], np.empty(0, np.int64)
        m = bmask[idx]
        q = qty[sel]
        keep = np.zeros(len(sel), bool)
        for i, (_br, _slo, _shi, qlo, qhi) in enumerate(brackets):
            keep |= (((m >> i) & 1) != 0) & (q >= qlo) & (q <= qhi)
        return pa.table(
            {"units": pa.array([int(units[sel][keep].sum())], pa.int64())}
        )

    parts = (
        lineitem.select_columns(
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
        )
        .map_batches(li_pre, batch_format="pyarrow")
        .union(
            part.select_columns(["p_partkey", "p_brand", "p_size"]).map_batches(
                part_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    total = int(sum(r["units"] for r in parts))
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "revenue": pa.array(
                [float(round_half_away(np.float64(total) / 10000.0, 2))],
                pa.float64(),
            )
        }
    )


def market_share(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    supplier: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    type_prefix: str,
    target_nationkey: int,
    region_nationkeys: "np.ndarray",
    num_partitions: int = 16,
    broadcast_max: int = 20_000_000,
) -> "pa.Table":
    """TPC-H-Q8-shaped national market share: per order-year, the share of
    revenue (parts of one type, sold to customers of one region) supplied
    by one target nation — the four-join chain
    lineitem x part x supplier x orders x customer.

    Scale shape: four sequential union-with-marker co-partition stages,
    each ONE cheap-key shuffle (partkey, suppkey, orderkey, custkey) with
    a vectorized searchsorted kernel, and each stage combiner-folds its
    output before the next shuffle (per (orderkey, suppkey), per orderkey,
    per (custkey, year), per year) so volume shrinks monotonically along
    the chain. All revenue is exact 1e-4 integer units; the single share
    division per year happens driver-side over the bounded years table."""
    import pyarrow.compute as pc

    region_set = np.sort(np.asarray(region_nationkeys, np.int64))

    def _empty():
        return pa.table(
            {
                "key": np.empty(0, np.int64),
                "v1": pa.array(np.empty(0, np.int64)),
                "v2": pa.array(np.empty(0, np.int64)),
                "v3": pa.array(np.empty(0, np.int64)),
                "is_build": pa.array(np.empty(0, bool)),
                "__p": pa.array(np.empty(0, np.int32), pa.int32()),
            }
        )

    def _tbl(key, v1, v2, v3, build):
        return pa.table(
            {
                "key": key,
                "v1": pa.array(v1),
                "v2": pa.array(v2),
                "v3": pa.array(v3),
                "is_build": pa.array(
                    np.full(len(key), build, bool)
                ),
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def _probe(t: pa.Table):
        """Split a merged partition into sorted build keys + probe rows."""
        key = t["key"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        bsel = np.flatnonzero(build)
        order_sorted = bsel[np.argsort(key[bsel], kind="stable")]
        bk = key[order_sorted]
        sel = np.flatnonzero(~build)
        k = key[sel]
        if len(bk) and len(k):
            idx = np.minimum(np.searchsorted(bk, k), len(bk) - 1)
            hit = bk[idx] == k
            sel, idx = sel[hit], idx[hit]
        else:
            sel, idx = sel[:0], np.empty(0, np.int64)
        return t, sel, order_sorted[idx]

    # --- stage A: partkey semi (type prefix) ----------------------------
    def part_pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.starts_with(t["p_type"], type_prefix))
        pk = f["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(pk), np.int64)
        return _tbl(pk, z, z, z, True)

    def li_pre(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(pk):
            return _empty()
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        return _tbl(pk, ok, sk, units, False)

    def kern_a(t: pa.Table) -> pa.Table:
        import pandas as pd

        t, sel, _ = _probe(t)
        df = pd.DataFrame(
            {
                "key": t["v2"].to_numpy()[sel],  # suppkey becomes the key
                "v1": t["v1"].to_numpy()[sel],   # orderkey rides along
                "v3": t["v3"].to_numpy()[sel],   # units
            }
        )
        g = df.groupby(["key", "v1"], as_index=False)["v3"].sum()
        key = g["key"].to_numpy(np.int64)
        z = np.zeros(len(key), np.int64)
        return _tbl(key, g["v1"].to_numpy(np.int64), z, g["v3"].to_numpy(np.int64), False)

    # Broadcast regime for the two dimension sides (rich_club's pattern):
    # part and supplier are dims an order of magnitude below the fact
    # table; below the threshold their key arrays broadcast once via
    # ray.put and stages A/B become map-side (NO shuffle of raw lineitem
    # rows). Above it, the union-marker co-partition path below runs.
    MS_BROADCAST_MAX = broadcast_max

    li_proj = lineitem.select_columns(
        ["l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    part_small = part.count() <= MS_BROADCAST_MAX
    supp_small = supplier.count() <= MS_BROADCAST_MAX

    if part_small:
        pk_rows = (
            part.select_columns(["p_partkey", "p_type"])
            .map_batches(part_pre, batch_format="pyarrow")
            .select_columns(["key"])
            .take_all()
        )
        pkeys_ref = ray.put(
            np.sort(np.array([r["key"] for r in pk_rows], np.int64))
        )

        def a_map(t: pa.Table) -> pa.Table:
            import pandas as pd

            raw = li_pre(t)
            pkeys = ray.get(pkeys_ref)
            k = raw["key"].to_numpy()
            if len(pkeys) and len(k):
                idx = np.minimum(np.searchsorted(pkeys, k), len(pkeys) - 1)
                keep = pkeys[idx] == k
            else:
                keep = np.zeros(len(k), bool)
            df = pd.DataFrame(
                {
                    "key": raw["v2"].to_numpy()[keep],  # suppkey
                    "v1": raw["v1"].to_numpy()[keep],   # orderkey
                    "v3": raw["v3"].to_numpy()[keep],   # units
                }
            )
            g = df.groupby(["key", "v1"], as_index=False)["v3"].sum()
            key = g["key"].to_numpy(np.int64)
            z = np.zeros(len(key), np.int64)
            return _tbl(
                key, g["v1"].to_numpy(np.int64), z, g["v3"].to_numpy(np.int64),
                False,
            )

        a_out = li_proj.map_batches(a_map, batch_format="pyarrow")
    else:
        a_out = (
            li_proj.map_batches(li_pre, batch_format="pyarrow")
            .union(
                part.select_columns(["p_partkey", "p_type"]).map_batches(
                    part_pre, batch_format="pyarrow"
                )
            )
            .groupby("__p")
            .map_groups(kern_a, batch_format="pyarrow")
        )

    # --- stage B: suppkey join -> target flag ---------------------------
    def supp_pre(t: pa.Table) -> pa.Table:
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(sk), np.int64)
        return _tbl(sk, nat, z, z, True)

    def kern_b(t: pa.Table) -> pa.Table:
        import pandas as pd

        t, sel, bidx = _probe(t)
        nat = t["v1"].to_numpy()[bidx]
        ok = t["v1"].to_numpy()[sel]
        units = t["v3"].to_numpy()[sel]
        tun = np.where(nat == target_nationkey, units, 0)
        df = pd.DataFrame({"key": ok, "u": units, "tu": tun})
        g = df.groupby("key", as_index=False)[["u", "tu"]].sum()
        key = g["key"].to_numpy(np.int64)
        return _tbl(
            key, g["u"].to_numpy(np.int64), g["tu"].to_numpy(np.int64),
            np.zeros(len(key), np.int64), False,
        )

    if supp_small:
        sp_rows = (
            supplier.select_columns(["s_suppkey", "s_nationkey"])
            .map_batches(supp_pre, batch_format="pyarrow")
            .select_columns(["key", "v1"])
            .take_all()
        )
        sk_arr = np.array([r["key"] for r in sp_rows], np.int64)
        nat_arr = np.array([r["v1"] for r in sp_rows], np.int64)
        order_s = np.argsort(sk_arr, kind="stable")
        supp_ref = ray.put((sk_arr[order_s], nat_arr[order_s]))

        def b_map(t: pa.Table) -> pa.Table:
            import pandas as pd

            sk, nat_s = ray.get(supp_ref)
            k = t["key"].to_numpy()
            if len(sk) and len(k):
                idx = np.minimum(np.searchsorted(sk, k), len(sk) - 1)
                keep = sk[idx] == k
            else:
                idx = np.zeros(len(k), np.int64)
                keep = np.zeros(len(k), bool)
            nat = nat_s[idx[keep]] if keep.any() else np.empty(0, np.int64)
            ok = t["v1"].to_numpy()[keep]
            units = t["v3"].to_numpy()[keep]
            tun = np.where(nat == target_nationkey, units, 0)
            df = pd.DataFrame({"key": ok, "u": units, "tu": tun})
            g = df.groupby("key", as_index=False)[["u", "tu"]].sum()
            key = g["key"].to_numpy(np.int64)
            return _tbl(
                key, g["u"].to_numpy(np.int64), g["tu"].to_numpy(np.int64),
                np.zeros(len(key), np.int64), False,
            )

        b_out = a_out.map_batches(b_map, batch_format="pyarrow")
    else:
        b_out = (
            a_out.union(
                supplier.select_columns(["s_suppkey", "s_nationkey"]).map_batches(
                    supp_pre, batch_format="pyarrow"
                )
            )
            .groupby("__p")
            .map_groups(kern_b, batch_format="pyarrow")
        )

    # --- stage C: orderkey join -> (custkey, year) ----------------------
    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = 1970 + t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        ).astype(np.int64)
        return _tbl(ok, ck, yr, np.zeros(len(ok), np.int64), True)

    def kern_c(t: pa.Table) -> pa.Table:
        import pandas as pd

        t, sel, bidx = _probe(t)
        ck = t["v1"].to_numpy()[bidx]
        yr = t["v2"].to_numpy()[bidx]
        u = t["v1"].to_numpy()[sel]
        tu = t["v2"].to_numpy()[sel]
        df = pd.DataFrame({"key": ck, "yr": yr, "u": u, "tu": tu})
        g = df.groupby(["key", "yr"], as_index=False)[["u", "tu"]].sum()
        key = g["key"].to_numpy(np.int64)
        return _tbl(
            key, g["yr"].to_numpy(np.int64), g["u"].to_numpy(np.int64),
            g["tu"].to_numpy(np.int64), False,
        )

    c_out = (
        b_out.union(
            orders.select_columns(
                ["o_orderkey", "o_custkey", "o_orderdate"]
            ).map_batches(ord_pre, batch_format="pyarrow")
        )
        .groupby("__p")
        .map_groups(kern_c, batch_format="pyarrow")
    )

    # --- stage D: custkey region semi -> per-year partials --------------
    def cust_pre(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, region_set)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        z = np.zeros(len(ck), np.int64)
        return _tbl(ck, z, z, z, True)

    def kern_d(t: pa.Table) -> pa.Table:
        t, sel, _ = _probe(t)
        yr = t["v1"].to_numpy()[sel]
        u = t["v2"].to_numpy()[sel]
        tu = t["v3"].to_numpy()[sel]
        yu, inv = np.unique(yr, return_inverse=True)
        su = np.bincount(inv, weights=u, minlength=len(yu)).astype(np.int64)
        st = np.bincount(inv, weights=tu, minlength=len(yu)).astype(np.int64)
        return pa.table({"yr": yu, "u": su, "tu": st})

    parts = (
        c_out.union(
            customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
                cust_pre, batch_format="pyarrow"
            )
        )
        .groupby("__p")
        .map_groups(kern_d, batch_format="pyarrow")
        .take_all()
    )
    yr = np.array([r["yr"] for r in parts], np.int64)
    u = np.array([r["u"] for r in parts], np.int64)
    tu = np.array([r["tu"] for r in parts], np.int64)
    yu, inv = np.unique(yr, return_inverse=True)
    su = np.bincount(inv, weights=u, minlength=len(yu)).astype(np.int64)
    st = np.bincount(inv, weights=tu, minlength=len(yu)).astype(np.int64)
    keep = su > 0
    yu, su, st = yu[keep], su[keep], st[keep]
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "o_year": pa.array(yu, pa.int64()),
            "nation_revenue": pa.array(
                round_half_away(st.astype(np.float64) / 10000.0, 2), pa.float64()
            ),
            "total_revenue": pa.array(
                round_half_away(su.astype(np.float64) / 10000.0, 2), pa.float64()
            ),
            "mkt_share": pa.array(
                round_half_away(
                    100.0 * st.astype(np.float64) / su.astype(np.float64), 6
                ),
                pa.float64(),
            ),
        }
    )


def forecast_revenue(
    lineitem: ray.data.Dataset,
    date_lo_us: int,
    date_hi_us: int,
    disc_lo: float,
    disc_hi: float,
    qty_lt: float,
) -> "pa.Table":
    """TPC-H-Q6-shaped forecast-revenue-change: total discount revenue
    (SUM(extendedprice * discount)) over lineitems in a one-year shipdate
    window, a discount bracket, and a quantity cap.

    Scale shape: NO shuffle at all — each block folds to a single
    (units, n_items) int64 partial inside map_batches; the driver sums a
    #blocks-row table. Per-row units are floor(price*disc*1e4 + 0.5)
    computed in float64 with the identical expression the SQL mirror
    uses, so the int64 sum (< 2^53) is bit-identical regardless of block
    order. The one division + round happens once on the driver."""

    def pre(t: pa.Table) -> pa.Table:
        ship = (
            t["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        m = (
            (ship >= date_lo_us)
            & (ship < date_hi_us)
            & (disc >= disc_lo)
            & (disc <= disc_hi)
            & (qty < qty_lt)
        )
        units = np.floor(price[m] * disc[m] * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "u": pa.array([int(units.sum())], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    parts = (
        lineitem.select_columns(
            ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"]
        )
        .map_batches(pre, batch_format="pyarrow")
        .take_all()
    )
    total = sum(r["u"] for r in parts)
    n = sum(r["n"] for r in parts)
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "revenue": pa.array(
                [float(round_half_away(np.float64(total) / 10000.0, 2))],
                pa.float64(),
            ),
            "n_items": pa.array([n], pa.int64()),
        }
    )


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D minimizing Pareto frontier: row i is
    kept iff no row has (x <= x_i AND y <= y_i) with at least one strict.
    Duplicated (x, y) points do not dominate each other, so every copy of
    a frontier point is kept. Fully vectorized: one lexsort, group-head
    detection on x, a shifted running min of per-group minimal y."""
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    n = len(xs)
    keep_sorted = np.zeros(n, dtype=bool)
    if n:
        heads = np.empty(n, dtype=bool)
        heads[0] = True
        heads[1:] = xs[1:] != xs[:-1]
        gidx = np.cumsum(heads) - 1  # group id per row (equal-x runs)
        gmin = ys[heads]  # y sorted within group -> head holds group min
        prefix = np.minimum.accumulate(gmin)  # min y over groups <= g
        # min y over STRICTLY smaller x (groups < g); +inf for group 0
        before = np.empty(len(gmin))
        before[0] = np.inf
        before[1:] = prefix[:-1]
        keep_sorted = (ys == gmin[gidx]) & (ys < before[gidx])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def pareto_skyline(
    ds: ray.data.Dataset, x_col: str, y_col: str
) -> ray.data.Dataset:
    """2-D skyline (Pareto frontier, minimizing both columns): rows not
    dominated by any other row (dominate = <= on both, < on at least one).

    Scale shape: skyline is a tree-reducible combiner —
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so each block
    folds to its local frontier inside map_batches (bounded by the
    block's distinct x values), and one final pass over the concatenated
    candidates (tiny: <= global distinct-x frontier points) produces the
    exact global frontier. No shuffle; comparisons only, no float
    arithmetic, so values pass through bit-identical to the SQL
    NOT EXISTS mirror."""

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = _skyline_mask(
            t[x_col].to_numpy(zero_copy_only=False),
            t[y_col].to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(m))

    cand = ds.map_batches(local, batch_format="pyarrow")
    return cand.repartition(1).map_batches(local, batch_format="pyarrow")


def butterfly_count(
    lineitem: ray.data.Dataset,
    num_partitions: int = 16,
    max_deg: int | None = None,
) -> "pa.Table":
    """Bipartite-motif census of the order–part graph: distinct
    edges, wedges centered on each side (sum of C(deg, 2)), and
    butterflies (complete K_{2,2} subgraphs — 2 orders x 2 parts, the
    bipartite analog of the triangle and the standard cohesion motif for
    two-mode networks).

    butterflies = sum over distinct part pairs of C(co-order count, 2);
    enumerating from the order side or the part side gives the identical
    total, so the pair enumeration runs on whichever side has the SMALLER
    wedge sum (decided from the two cheap degree aggregates — the hub
    side never explodes the pair volume). Even the smaller side can hide
    million-degree hubs on a skewed 100-TB bipartite graph, so `max_deg`
    caps the per-center pair fan-out exactly like the link-prediction
    family's CN_MAX_DEG: centers whose degree exceeds the cap contribute
    no pairs, and the census reports them in a `dropped_centers` column
    (drop-accounted, never silent; the SQL oracle applies the identical
    cap on the identical side). max_deg=None keeps the exact census.
    Scale shape: one hash(center) shuffle for per-center pair partials
    (the copurchase triangular-decode kernel), one hash(pair) shuffle
    folding partial counts, a per-partition sum of C(c, 2), and a
    #partitions-row driver fold. All integers end-to-end."""

    def tag(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": ok,
                "pk": t["l_partkey"],
                "__p": pa.array(part_of(ok, num_partitions), pa.int32()),
            }
        )

    def dedup_edges(t: pa.Table) -> pa.Table:
        ok = t["ok"].to_numpy()
        pk = t["pk"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        )
        return pa.table({"ok": ok[keep], "pk": pk[keep]})

    # distinct edges, partitioned by order (exact: orders are disjoint)
    edges = (
        lineitem.select_columns(["l_orderkey", "l_partkey"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(dedup_edges, batch_format="pyarrow")
        .materialize()
    )

    from ray.data.aggregate import Sum

    def _deg_partial(col):
        def f(t: pa.Table) -> pa.Table:
            k, cnt = np.unique(t[col].to_numpy(), return_counts=True)
            return pa.table({"k": k, "c": cnt.astype(np.int64)})

        return f

    def _wedge_fold(t: pa.Table) -> pa.Table:
        d = t["d"].to_numpy()
        over = int((d > max_deg).sum()) if max_deg is not None else 0
        return pa.table(
            {
                "w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64()),
                "over": pa.array([over], pa.int64()),
            }
        )

    def _wedge_sum(col: str) -> tuple[int, int]:
        # exact: per-batch key partials -> one keyed sum -> C(d,2) (and the
        # over-cap center count) folded over the aggregated table
        agg = (
            edges.map_batches(_deg_partial(col), batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("c", alias_name="d"))
        )
        rows = agg.map_batches(_wedge_fold, batch_format="pyarrow").take_all()
        return sum(r["w"] for r in rows), sum(r["over"] for r in rows)

    wedges_order, over_order = _wedge_sum("ok")
    wedges_part, over_part = _wedge_sum("pk")
    n_edges = edges.count()

    # enumerate pairs on the cheaper side; relabel so "center" partitions
    center, leaf = ("ok", "pk") if wedges_order <= wedges_part else ("pk", "ok")
    dropped_centers = over_order if center == "ok" else over_part

    def retag(t: pa.Table) -> pa.Table:
        c = t[center].to_numpy()
        return pa.table(
            {
                "c": c,
                "l": t[leaf],
                "__p": pa.array(part_of(c, num_partitions), pa.int32()),
            }
        )

    def center_pairs(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy()
        l = t["l"].to_numpy()
        order = np.lexsort((l, c))
        c, l = c[order], l[order]
        starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(c)]]))
        npair = lens * (lens - 1) // 2
        if max_deg is not None:
            # hub cap: over-cap centers contribute no pairs (counted in
            # dropped_centers from the degree aggregate, never silent)
            npair = np.where(lens <= max_deg, npair, 0)
        tot = int(npair.sum())
        if tot == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {"a": z, "b": z, "cnt": z,
                 "__q": pa.array(np.empty(0, np.int32), pa.int32())}
            )
        run_id = np.repeat(np.arange(len(lens)), npair)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run_id]
        L = lens[run_id]
        i = np.floor(
            ((2 * L - 1)
             - np.sqrt((2 * L - 1).astype(np.float64) ** 2 - 8 * within))
            / 2
        ).astype(np.int64)
        j = within - (i * (L - 1) - i * (i - 1) // 2) + i + 1
        base = starts[run_id]
        a, b = l[base + i], l[base + j]  # a < b: leaves sorted per center
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        idx = np.flatnonzero(first)
        cnt = np.diff(np.concatenate([idx, [len(a)]]))
        from ..pipelines.superstep import _pair_part

        return pa.table(
            {
                "a": a[idx],
                "b": b[idx],
                "cnt": cnt,
                "__q": pa.array(
                    _pair_part(a[idx], b[idx], num_partitions), pa.int32()
                ),
            }
        )

    def fold_butterflies(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        c = t["cnt"].to_numpy()
        po = np.lexsort((b, a))
        a, b, c = a[po], b[po], c[po]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        sums = (
            np.add.reduceat(c, np.flatnonzero(first))
            if len(c)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {"bf": pa.array([int((sums * (sums - 1) // 2).sum())], pa.int64())}
        )

    parts = (
        edges.map_batches(retag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(center_pairs, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(fold_butterflies, batch_format="pyarrow")
        .take_all()
    )
    out = {
        "n_edges": pa.array([int(n_edges)], pa.int64()),
        "wedges_order": pa.array([wedges_order], pa.int64()),
        "wedges_part": pa.array([wedges_part], pa.int64()),
        "butterflies": pa.array([sum(r["bf"] for r in parts)], pa.int64()),
    }
    if max_deg is not None:
        out["dropped_centers"] = pa.array([dropped_centers], pa.int64())
    return pa.table(out)


def snapshot_diff(
    snap_a: ray.data.Dataset,
    snap_b: ray.data.Dataset,
    key_col: str,
    val_col: str,
    num_partitions: int = 16,
    missing: float = -1.0,
) -> ray.data.Dataset:
    """Change-data-capture diff of two keyed snapshots (unique key per
    snapshot): emits one row per changed key with change_type
    'insert' (only in B), 'delete' (only in A) or 'update' (value
    changed), plus old/new values (`missing` sentinel where absent —
    keeps the schema null-free for bit-exact comparison).

    Scale shape: both snapshots are tagged with the same hash(key)
    partition and a side bit, ONE co-partitioning shuffle, then a
    per-partition sorted-array membership kernel (np.searchsorted —
    no pairwise join): every key meets its counterpart in exactly one
    partition. Value comparison is exact (no arithmetic here; any
    snapshot-derivation arithmetic must be float-exact upstream)."""

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "k": k,
                    "v": t[val_col],
                    "side": pa.array(np.full(len(k), side, np.int8)),
                    "__p": pa.array(part_of(k, num_partitions), pa.int32()),
                }
            )

        return f

    def kernel(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        v = t["v"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy()
        am, bm = side == 0, side == 1
        ka, va = k[am], v[am]
        kb, vb = k[bm], v[bm]
        oa, ob = np.argsort(ka), np.argsort(kb)
        ka, va, kb, vb = ka[oa], va[oa], kb[ob], vb[ob]
        pos = np.searchsorted(kb, ka)
        in_b = np.zeros(len(ka), bool)
        valid = pos < len(kb)
        in_b[valid] = kb[pos[valid]] == ka[valid]
        pos2 = np.searchsorted(ka, kb)
        in_a = np.zeros(len(kb), bool)
        valid2 = pos2 < len(ka)
        in_a[valid2] = ka[pos2[valid2]] == kb[valid2]
        dels = ~in_b
        ins = ~in_a
        common = np.flatnonzero(in_b)
        upd = common[va[common] != vb[pos[common]]]
        keys = np.concatenate([ka[dels], kb[ins], ka[upd]])
        ctype = np.concatenate(
            [
                np.full(int(dels.sum()), "delete", object),
                np.full(int(ins.sum()), "insert", object),
                np.full(len(upd), "update", object),
            ]
        )
        old = np.concatenate(
            [va[dels], np.full(int(ins.sum()), missing), va[upd]]
        )
        new = np.concatenate(
            [np.full(int(dels.sum()), missing), vb[ins], vb[pos[upd]]]
        )
        return pa.table(
            {
                key_col: keys.astype(np.int64),
                "change_type": pa.array(ctype, pa.string()),
                "old_val": old.astype(np.float64),
                "new_val": new.astype(np.float64),
            }
        )

    return (
        snap_a.map_batches(tag(0), batch_format="pyarrow")
        .union(snap_b.map_batches(tag(1), batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def bloom_semi_join_audit(
    build_keys: ray.data.Dataset,
    probe_keys: ray.data.Dataset,
    key_col: str,
    probe_col: str,
    m_bits: int = 4096,
    hash_consts: tuple[int, ...] = (
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0xFF51AFD7ED558CCD,
    ),
    num_partitions: int = 16,
) -> pa.Table:
    """Bloom-filter semi-join with an exact witness — the classic
    distributed-join pre-filter, audited: build an m_bits Bloom filter
    over the DISTINCT build keys (each batch ORs a local bitmap; the
    per-batch bitmaps tree-reduce on the driver — one fixed m_bits/8-byte
    row per batch, never a key row), broadcast it, probe every probe-side
    key vectorized, and compare against the exact hash-partitioned
    semi-join. Bit positions are ((key * C_i) mod 2^64) mod m_bits per
    hash constant; a key passes iff every one of its DISTINCT positions
    is set — all integer, so the SQL mirror recomputes the filter
    bit-for-bit in HUGEINT. Returns ONE row: (m_bits, k_hashes,
    n_set_bits, n_probe, n_pass, n_member, n_false_pos); n_false_pos is
    the Bloom's measured false-positive count (never negative — the
    filter admits every true member by construction)."""
    import pyarrow.compute as pc

    CS = tuple(np.uint64(c) for c in hash_consts)
    M = np.uint64(m_bits)
    nbytes = m_bits // 8

    def positions(k: np.ndarray) -> list[np.ndarray]:
        k = k.astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            return [((k * c) % M).astype(np.int64) for c in CS]

    def local_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        k = t[key_col].to_numpy(zero_copy_only=False)
        for pos in positions(k):
            np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = build_keys.select_columns([key_col]).map_batches(
        local_bitmap, batch_format="pyarrow"
    ).take_all()
    bitmap = np.zeros(nbytes, np.uint8)
    for r in parts:
        bitmap |= np.frombuffer(r["bm"], np.uint8)
    n_set_bits = int(np.unpackbits(bitmap).sum())
    bm_ref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        k = t[probe_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = np.ones(len(k), bool)
        for pos in positions(k):
            ok &= ((bm[pos >> 3] >> (pos & 7)) & 1).astype(bool)
        return pa.table(
            {
                "n": pa.array([len(k)], pa.int64()),
                "n_pass": pa.array([int(ok.sum())], pa.int64()),
            }
        )

    probe_ds = probe_keys.select_columns([probe_col]).materialize()
    tallies = probe_ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    n_probe = int(tallies["n"].sum())
    n_pass = int(tallies["n_pass"].sum())

    # exact witness: hash semi-join against the distinct build keys
    kd = probe_ds
    if probe_col != key_col:
        kd = kd.map_batches(
            lambda t: pa.table({key_col: t[probe_col]}),
            batch_format="pyarrow",
        )
    n_member = n_probe - anti_join_keys(
        kd, build_keys, key_col, num_partitions
    ).count()

    return pa.table(
        {
            "m_bits": pa.array([m_bits], pa.int64()),
            "k_hashes": pa.array([len(CS)], pa.int64()),
            "n_set_bits": pa.array([n_set_bits], pa.int64()),
            "n_probe": pa.array([n_probe], pa.int64()),
            "n_pass": pa.array([n_pass], pa.int64()),
            "n_member": pa.array([n_member], pa.int64()),
            "n_false_pos": pa.array([n_pass - n_member], pa.int64()),
        }
    )


def exact_ntile(
    keyed: ray.data.Dataset,
    metric_col: str,
    key_col: str,
    n_tiles: int,
    num_parts: int = 32,
    sample_shift: int = 56,
) -> ray.data.Dataset:
    """Distributed EXACT ntile assignment over the total order
    (metric, key) — the engine's ORDER BY + NTILE primitive, built as a
    sample-sort: tile(row) = ((global_rank) * n_tiles) // n with rank the
    0-based position in the total order (ties broken by the key column —
    fully deterministic, mirrored by SQL ROW_NUMBER).

    Scale shape: hash-gated sample folds to P-1 equi-spaced (metric, key)
    splitters on the driver -> ONE range shuffle (each row to exactly one
    bucket) -> per-bucket lexsort gives local ranks; bucket sizes prefix-
    sum on the driver (P integers) and broadcast, so global rank = bucket
    base + local rank without a second shuffle. Returns
    (key_col, metric_col, tile)."""
    import pandas as pd

    from ..functions.proccache import cached_get

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    kd = keyed.select_columns([key_col, metric_col]).materialize()
    n_total = kd.count()

    def sampled(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            gate = (k.view(np.uint64) * GOLD) >> np.uint64(sample_shift) == 0
        idx = pa.array(np.flatnonzero(gate))
        return pa.table(
            {
                "m": pa.compute.take(t[metric_col], idx),
                "k": pa.compute.take(t[key_col], idx),
            }
        )

    sdf = kd.map_batches(sampled, batch_format="pyarrow").to_pandas()
    if len(sdf):
        sm = sdf["m"].to_numpy(np.int64)
        sk = sdf["k"].to_numpy(np.int64)
        o = np.lexsort((sk, sm))
        sm, sk = sm[o], sk[o]
    else:
        sm = sk = np.empty(0, np.int64)
    n_buckets = max(1, min(num_parts, len(sm)))
    if n_buckets > 1:
        idx = (np.arange(1, n_buckets) * len(sm)) // n_buckets
        split_m, split_k = sm[idx], sk[idx]
    else:
        split_m = split_k = np.empty(0, np.int64)
    spl = ray.put((split_m, split_k))

    def route(t: pa.Table) -> pa.Table:
        m0, k0 = cached_get(spl)
        m = t[metric_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(m0):
            sp = np.empty(len(m0), dtype=[("m", "<i8"), ("k", "<i8")])
            sp["m"], sp["k"] = m0, k0
            q = np.empty(len(m), dtype=sp.dtype)
            q["m"], q["k"] = m, k
            b = np.searchsorted(sp, q, side="right").astype(np.int32)
        else:
            b = np.zeros(len(m), np.int32)
        return pa.table({key_col: k, metric_col: m, "__p": pa.array(b)})

    routed = kd.map_batches(route, batch_format="pyarrow").materialize()

    # bucket sizes -> exact global base offsets (P integers on the driver)
    sizes = (
        routed.groupby("__p")
        .count()
        .to_pandas()
        .sort_values("__p")
    )
    bases = np.zeros(n_buckets + 1, np.int64)
    if len(sizes):
        bvals = np.zeros(n_buckets, np.int64)
        bvals[sizes["__p"].to_numpy(np.int64)] = sizes["count()"].to_numpy(
            np.int64
        )
        bases[1:] = np.cumsum(bvals)
    base_ref = ray.put(bases)

    def rank_tile(t: pa.Table) -> pa.Table:
        bases_l = cached_get(base_ref)
        b = int(t["__p"][0].as_py())
        m = t[metric_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((k, m))
        rank = np.empty(len(m), np.int64)
        rank[o] = np.arange(len(m)) + bases_l[b]
        tile = (rank * n_tiles) // max(n_total, 1)
        return pa.table({key_col: k, metric_col: m, "tile": tile})

    return routed.groupby("__p").map_groups(rank_tile, batch_format="pyarrow")


def rfm_cells(
    orders: ray.data.Dataset,
    n_tiles: int = 5,
    num_parts: int = 32,
) -> "pa.Table":
    """RFM customer segmentation — the classic feature-engineering rollup:
    per customer Recency (last order day), Frequency (order count),
    Monetary (exact 1e-4-unit total), each ranked into exact n_tiles by
    the deterministic (metric, custkey) total order via
    :func:`exact_ntile`, then the (r, f, m) cell census (<= n_tiles^3
    rows). All integers end to end.

    Scale shape: ONE hash(custkey) shuffle folds the per-customer metrics,
    three sample-sort ntile passes over the customer-scale table (never
    the order-scale input), two co-partitioned int-key joins reunite the
    tiles, one fixed-cardinality census groupby."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..pipelines.superstep import _attach_value

    def tag(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame({"cust": c, "day": day, "cents": cents})
        g = df.groupby("cust", sort=False).agg(
            last_day=("day", "max"), n_orders=("day", "size"),
            total=("cents", "sum"),
        ).reset_index()
        g["__p"] = part_of(g["cust"].to_numpy(np.int64), num_parts)
        return pa.table(g)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cust", sort=False).agg(
            last_day=("last_day", "max"), n_orders=("n_orders", "sum"),
            total=("total", "sum"),
        ).reset_index()
        return g[["cust", "last_day", "n_orders", "total"]]

    metrics = (
        orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )
    r = exact_ntile(metrics, "last_day", "cust", n_tiles, num_parts)
    f = exact_ntile(metrics, "n_orders", "cust", n_tiles, num_parts)
    m = exact_ntile(metrics, "total", "cust", n_tiles, num_parts)

    def _pick(name):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"cust": t["cust"], name: t["tile"]})

        return fn

    rt = r.map_batches(_pick("r_tile"), batch_format="pyarrow")
    ft = f.map_batches(_pick("f_tile"), batch_format="pyarrow")
    mt = m.map_batches(_pick("m_tile"), batch_format="pyarrow")
    j = _attach_value(rt, ft, "cust", ["r_tile"], "f_tile", "f_tile",
                      num_parts, lookup_key="cust")
    j = _attach_value(j, mt, "cust", ["r_tile", "f_tile"], "m_tile", "m_tile",
                      num_parts, lookup_key="cust")

    def census(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = (
            df.groupby(["r_tile", "f_tile", "m_tile"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.table(g)

    parts = j.map_batches(census, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby(["r_tile", "f_tile", "m_tile"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    return pa.table(
        {
            "r_tile": pa.array(g["r_tile"].to_numpy(np.int64)),
            "f_tile": pa.array(g["f_tile"].to_numpy(np.int64)),
            "m_tile": pa.array(g["m_tile"].to_numpy(np.int64)),
            "n": pa.array(g["n"].to_numpy(np.int64)),
        }
    )


def item_cosine(
    lineitem: ray.data.Dataset,
    min_count: int = 2,
    topn: int = 100,
    num_parts: int = 16,
) -> "pa.Table":
    """Item-item cosine similarity from co-purchase baskets — the recsys
    normalization of the raw market-basket pair counts: cosine(a, b) =
    n_ab / (sqrt(n_a) * sqrt(n_b)) with n_x the number of orders
    containing part x, ranked by (raw cosine desc, a, b) top-n. The raw
    count favors popular items; the cosine surfaces genuinely associated
    pairs. All counts are exact integers; the cosine is the _q_cos parity
    chain (exact dot, two correctly-rounded sqrts, one multiply, one
    divide), ROUND(6) only on output.

    Scale shape: ONE hash(order) shuffle -> per-partition triangular
    basket-pair enumeration with per-partition pair-count COMBINING ->
    ONE hash(pair) shuffle folds global pair counts and prunes
    count < min_count -> item counts via the degree combiner -> two
    co-partitioned int-key joins attach n_a/n_b -> per-partition partial
    top-n on the raw cosine, driver folds P*topn rows."""
    import pandas as pd

    from ..functions.rounding import round_half_away
    from ..pipelines.superstep import _attach_value, int_degrees

    def tag(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"o": o, "p": p}).drop_duplicates()
        return pa.table(
            {
                "o": df["o"].to_numpy(np.int64),
                "p": df["p"].to_numpy(np.int64),
                "__p": pa.array(
                    part_of(df["o"].to_numpy(np.int64), num_parts), pa.int32()
                ),
            }
        )

    def basket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["o", "p"]].drop_duplicates().sort_values(["o", "p"])
        o = df["o"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(o)]]))
        npair = lens * (lens - 1) // 2
        tot = int(npair.sum())
        if tot == 0:
            z = np.empty(0, np.int64)
            return pd.DataFrame({"pa": z, "pb": z, "n": z})
        run = np.repeat(np.arange(len(lens)), npair)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run]
        L = lens[run]
        i = np.floor(
            ((2 * L - 1) - np.sqrt((2 * L - 1).astype(np.float64) ** 2
                                   - 8 * within)) / 2
        ).astype(np.int64)
        off = i * (L - 1) - i * (i - 1) // 2
        j = within - off + i + 1
        base = starts[run]
        g = (
            pd.DataFrame({"pa": p[base + i], "pb": p[base + j]})
            .groupby(["pa", "pb"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def tag_pair(t: pa.Table) -> pa.Table:
        a = t["pa"].to_numpy(zero_copy_only=False)
        b = t["pb"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.astype(
                np.uint64
            )
        return pa.table(
            {"pa": a, "pb": b, "n": t["n"],
             "__p": pa.array(part_of(key, num_parts), pa.int32())}
        )

    def fold_pair(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["pa", "pb"], sort=False)["n"].sum().reset_index()
        g = g[g["n"] >= min_count]
        # arrow out: downstream rename/Project must not see pandas blocks
        return pa.table(
            {
                "pa": g["pa"].to_numpy(np.int64),
                "pb": g["pb"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
            }
        )

    baskets = lineitem.select_columns(["l_orderkey", "l_partkey"]).map_batches(
        tag, batch_format="pyarrow"
    ).materialize()
    pairs = (
        baskets.groupby("__p")
        .map_groups(basket_pairs, batch_format="pandas")
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold_pair, batch_format="pandas")
    )
    # item frequencies must come from GLOBALLY distinct (order, part):
    # the tag-side dedup is batch-local only, but every row of an order
    # lands in one hash(order) partition, so a per-partition dedup is
    # globally exact before the degree combiner
    def dedup_items(df: pd.DataFrame) -> pa.Table:
        g = df[["o", "p"]].drop_duplicates()
        return pa.table({"vertex": g["p"].to_numpy(np.int64)})

    items = int_degrees(
        baskets.groupby("__p").map_groups(dedup_items, batch_format="pandas"),
        num_parts,
    ).materialize()
    j = _attach_value(
        pairs.rename_columns({"pa": "k"}), items, "k", ["pb", "n"],
        "deg", "na", num_parts,
    ).rename_columns({"k": "pa"})
    j = _attach_value(
        j.rename_columns({"pb": "k"}), items, "k", ["pa", "n", "na"],
        "deg", "nb", num_parts,
    ).rename_columns({"k": "pb"})

    def partial_top(t: pa.Table) -> pa.Table:
        nab = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        raw = nab / (np.sqrt(na) * np.sqrt(nb))
        a = t["pa"].to_numpy(zero_copy_only=False)
        b = t["pb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -raw))[:topn]
        return pa.table(
            {
                "part_a": a[order],
                "part_b": b[order],
                "n_pairs": t["n"].to_numpy(zero_copy_only=False)[order],
                "raw": raw[order],
            }
        )

    top = j.map_batches(partial_top, batch_format="pyarrow").to_pandas()
    top = top.sort_values(
        ["raw", "part_a", "part_b"], ascending=[False, True, True],
        kind="stable",
    ).head(topn)
    return pa.table(
        {
            "part_a": pa.array(top["part_a"].to_numpy(np.int64)),
            "part_b": pa.array(top["part_b"].to_numpy(np.int64)),
            "n_pairs": pa.array(top["n_pairs"].to_numpy(np.int64)),
            "cosine": pa.array(
                round_half_away(top["raw"].to_numpy(np.float64), 6)
            ),
        }
    )


def order_wide_table(
    orders: ray.data.Dataset,
    lineitem: ray.data.Dataset,
    customer: ray.data.Dataset,
    nation_region: "pa.Table",
    num_parts: int = 16,
) -> ray.data.Dataset:
    """Denormalized order-360 wide table — the canonical ETL build a
    serving layer reads: one row per order carrying the customer key,
    nation and region names, exact integer revenue (1e-4 units, floored
    per item BEFORE summing — the q1 technique), item count, and the
    latest ship day. The op every warehouse pipeline runs nightly.

    Scale shape: lineitem pre-aggregates per order INSIDE each batch
    (combiner) -> one orderkey-key aggregate -> co-partitioned int-key
    join onto orders -> co-partitioned join onto the customer dim on
    custkey (customer does NOT broadcast at corpus scale) -> the 25-row
    nation->(n_name, r_name) map broadcasts via ray.put and resolves in
    place. Output stays distributed (order-scale)."""
    import pyarrow.compute as pc

    from ..functions.proccache import cached_get

    def pre(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        cnts = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, day)
        return pa.table(
            {"o_orderkey": uk, "revenue_units": sums, "n_items": cnts,
             "last_ship_day": mx}
        )

    def tag_p(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__p", pa.array(part_of(ok.astype(np.int64), num_parts), pa.int32())
        )

    def fold_order(df) -> pa.Table:
        g = df.groupby("o_orderkey", as_index=False).agg(
            revenue_units=("revenue_units", "sum"),
            n_items=("n_items", "sum"),
            last_ship_day=("last_ship_day", "max"),
        )
        return pa.table({c: g[c].to_numpy(np.int64) for c in
                         ["o_orderkey", "revenue_units", "n_items",
                          "last_ship_day"]})

    # hashed __p fold, NEVER a raw orderkey map_groups (order cardinality
    # is corpus-scale; per-group Python would be 150k calls at sf0.1)
    per_order = (
        lineitem.select_columns(
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        )
        .map_batches(pre, batch_format="pyarrow")
        .map_batches(tag_p, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold_order, batch_format="pandas")
    )
    base = orders.select_columns(["o_orderkey", "o_custkey"]).join(
        per_order, join_type="inner", num_partitions=num_parts,
        on=("o_orderkey",),
    )
    wide = base.join(
        customer.select_columns(["c_custkey", "c_nationkey"]).rename_columns(
            {"c_custkey": "o_custkey"}
        ),
        join_type="inner",
        num_partitions=num_parts,
        on=("o_custkey",),
    )
    nr_ref = ray.put(
        {
            int(r["n_nationkey"]): (str(r["n_name"]), str(r["r_name"]))
            for r in nation_region.to_pylist()
        }
    )

    def resolve(t: pa.Table) -> pa.Table:
        nr = cached_get(nr_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = [nr.get(int(k), ("", "")) for k in nk.tolist()]
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "nation": pa.array([a for a, _ in names], pa.string()),
                "region": pa.array([b for _, b in names], pa.string()),
                "revenue_units": t["revenue_units"],
                "n_items": t["n_items"],
                "last_ship_day": t["last_ship_day"],
            }
        )

    return wide.map_batches(resolve, batch_format="pyarrow")


def abc_classes(
    lineitem: ray.data.Dataset,
    num_parts: int = 32,
    sample_shift: int = 56,
) -> "pa.Table":
    """ABC (Pareto) inventory classification of parts by revenue — the
    classic 80/95 cumulative-share analysis, exact: parts sort by
    (revenue desc, partkey), each part classes on the cumulative revenue
    STRICTLY BEFORE it with integer cross-multiplication (5*cum < 4*T ->
    A, 20*cum < 19*T -> B, else C; no float share anywhere). Returns
    (cls, n_parts, revenue_units).

    Scale shape: lineitem shrinks to per-part integer revenue via the
    combiner + one part-key fold; the class pass is a sample-sort
    WEIGHTED prefix sum — splitters on (-revenue, partkey) route each
    part to one range bucket, per-bucket revenue totals prefix-sum on
    the driver (P integers), and each bucket classes its parts from its
    base offset. The exact_ntile pattern extended from rank counting to
    weighted cumulative sums."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.proccache import cached_get

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def pre(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        sums = np.bincount(inv, weights=units, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "part": uk,
                "rev": sums,
                "__p": pa.array(part_of(uk, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("part", as_index=False)["rev"].sum()
        return pa.table(
            {"part": g["part"].to_numpy(np.int64),
             "rev": g["rev"].to_numpy(np.int64)}
        )

    parts_ds = (
        lineitem.select_columns(["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )

    def sampled(t: pa.Table) -> pa.Table:
        k = t["part"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            gate = (k.view(np.uint64) * GOLD) >> np.uint64(sample_shift) == 0
        idx = pa.array(np.flatnonzero(gate))
        return pa.table(
            {"rev": pc.take(t["rev"], idx), "part": pc.take(t["part"], idx)}
        )

    sdf = parts_ds.map_batches(sampled, batch_format="pyarrow").to_pandas()
    if len(sdf):
        o = np.lexsort((sdf["part"].to_numpy(np.int64),
                        -sdf["rev"].to_numpy(np.int64)))
        sm = sdf["rev"].to_numpy(np.int64)[o]
        sk = sdf["part"].to_numpy(np.int64)[o]
    else:
        sm = sk = np.empty(0, np.int64)
    nb = max(1, min(num_parts, len(sm)))
    if nb > 1:
        idx = (np.arange(1, nb) * len(sm)) // nb
        split_m, split_k = sm[idx], sk[idx]
    else:
        split_m = split_k = np.empty(0, np.int64)
    spl = ray.put((split_m, split_k))

    def route(t: pa.Table) -> pa.Table:
        m0, k0 = cached_get(spl)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        pk = t["part"].to_numpy(zero_copy_only=False)
        if len(m0):
            sp = np.empty(len(m0), dtype=[("m", "<i8"), ("k", "<i8")])
            sp["m"], sp["k"] = -m0, k0   # descending revenue order key
            q = np.empty(len(rev), dtype=sp.dtype)
            q["m"], q["k"] = -rev, pk
            b = np.searchsorted(sp, q, side="right").astype(np.int32)
        else:
            b = np.zeros(len(rev), np.int32)
        return pa.table({"part": pk, "rev": rev, "__p": pa.array(b)})

    routed = parts_ds.map_batches(route, batch_format="pyarrow").materialize()
    sums = (
        routed.groupby("__p").sum("rev").to_pandas().sort_values("__p")
    )
    bvals = np.zeros(nb, np.int64)
    if len(sums):
        bvals[sums["__p"].to_numpy(np.int64)] = sums["sum(rev)"].to_numpy(
            np.int64
        )
    bases = np.concatenate([[0], np.cumsum(bvals)[:-1]])
    total = int(bvals.sum())
    base_ref = ray.put(bases)

    def classify(t: pa.Table) -> pa.Table:
        bl = cached_get(base_ref)
        b = int(t["__p"][0].as_py())
        rev = t["rev"].to_numpy(zero_copy_only=False)
        pk = t["part"].to_numpy(zero_copy_only=False)
        o = np.lexsort((pk, -rev))
        rev_s = rev[o]
        cum_prev = int(bl[b]) + np.concatenate(
            [[0], np.cumsum(rev_s)[:-1]]
        )
        cls = np.where(
            5 * cum_prev < 4 * total, 0,
            np.where(20 * cum_prev < 19 * total, 1, 2),
        )
        out = np.zeros((3, 2), np.int64)
        np.add.at(out[:, 0], cls, 1)
        np.add.at(out[:, 1], cls, rev_s)
        return pa.table(
            {
                "cls": np.array([0, 1, 2], np.int64),
                "n_parts": out[:, 0],
                "revenue_units": out[:, 1],
            }
        )

    agg = (
        routed.groupby("__p")
        .map_groups(classify, batch_format="pyarrow")
        .to_pandas()
        .groupby("cls", sort=True)[["n_parts", "revenue_units"]]
        .sum()
    )
    agg = agg[agg["n_parts"] > 0]
    names = np.array(["A", "B", "C"], object)
    return pa.table(
        {
            "cls": pa.array([names[i] for i in agg.index], pa.string()),
            "n_parts": pa.array(agg["n_parts"].to_numpy(np.int64)),
            "revenue_units": pa.array(
                agg["revenue_units"].to_numpy(np.int64)
            ),
        }
    )


def weighted_median(
    lineitem: ray.data.Dataset,
    num_parts: int = 32,
) -> "pd.DataFrame":
    """Exact quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity weight (ordered by price)
    reaches ceil(total_weight / 2) — the inventory-valuation median where
    each line weighs by units, not rows.

    Scale shape: prices are cent-quantized, so the value DOMAIN is bounded
    (<= 10^7 distinct cents) regardless of data volume — the
    grouped_value_percentiles cent-histogram argument. The combiner folds
    each batch to sparse (grp, cents, sum_w) partials; ONE
    hash(grp, cents) shuffle completes exact per-key weights
    (partition-disjoint keys); the driver cumsums the bounded sparse
    histogram per group and selects the crossing row. All arithmetic is
    int64; the only float is the final cents / 100 display division."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    def pre(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        w = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = np.asarray(
            t["l_returnflag"].to_numpy(zero_copy_only=False), object
        )
        df = (
            pd.DataFrame({"grp": grp, "cents": cents, "w": w})
            .groupby(["grp", "cents"], sort=False)["w"]
            .sum()
            .reset_index()
        )
        kh = (
            pd.util.hash_array(
                (df["grp"] + "\x00" + df["cents"].astype(str)).to_numpy(object)
            )
            .astype(np.uint64)
        )
        df["__p"] = part_of(kh, num_parts).astype(np.int32)
        return pa.table(
            {
                "grp": pa.array(df["grp"], pa.string()),
                "cents": pa.array(df["cents"].to_numpy(np.int64)),
                "w": pa.array(df["w"].to_numpy(np.int64)),
                "__p": pa.array(df["__p"].to_numpy(np.int32)),
            }
        )

    def fold(df: "pd.DataFrame") -> pa.Table:
        g = df.groupby(["grp", "cents"], as_index=False)["w"].sum()
        return pa.table(
            {
                "grp": pa.array(g["grp"], pa.string()),
                "cents": pa.array(g["cents"].to_numpy(np.int64)),
                "w": pa.array(g["w"].to_numpy(np.int64)),
            }
        )

    hist = (
        lineitem.select_columns(
            ["l_returnflag", "l_extendedprice", "l_quantity"]
        )
        .map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    rows = []
    for grp, g in hist.groupby("grp", sort=True):
        o = np.argsort(g["cents"].to_numpy(np.int64))
        c = g["cents"].to_numpy(np.int64)[o]
        w = g["w"].to_numpy(np.int64)[o]
        cum = np.cumsum(w)
        tot = int(cum[-1])
        r = (tot + 1) // 2
        i = int(np.searchsorted(cum, r))
        rows.append(
            (grp, int(c[i]), tot, round_half_away(c[i] / 100.0, 2))
        )
    return pd.DataFrame(
        rows, columns=["grp", "median_cents", "total_weight", "wmedian"]
    )
