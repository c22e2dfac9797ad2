"""Event-stream operators over the `events` table: sessionization and
top-k reports.

Sessionization is the gap-window generalization of the reference's
edge-count-triggered windows (`/root/reference/param.h:20`,
`main.cpp:393-398` emit on a fixed count; here the trigger is a time gap
per key). Shape: ONE shuffle on hash(user) % P, then a fully vectorized
per-partition kernel (lexsort + gap scan + run-boundary reduce) — no
per-user Python.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import part_of


def sessionize(
    events: ray.data.Dataset,
    gap_us: int = 1_800_000_000,
    num_parts: int = 32,
    value_scale: int | None = None,
) -> ray.data.Dataset:
    """(user_id, session_id, n_events, first_us, last_us, sum_value):
    per-user sessions split where the inter-event gap exceeds gap_us.
    session_id is 0-based per user in time order (ties broken by
    event_id, mirrored in the SQL oracle).

    value_scale: when set (e.g. 100 for cent-exact values), each value is
    quantized to floor(value*scale + 0.5) integer units, summed in int64
    (exact, order-independent — eliminates the float sum-order divergence
    vs a SQL SUM), and divided back by scale. SQL mirror:
    ``CAST(SUM(CAST(floor(value*scale + 0.5) AS BIGINT)) AS DOUBLE)/scale``."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, us, val = u[order], us[order], val[order]
        n = len(u)
        if n == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {"user_id": z, "session_id": z, "n_events": z,
                 "first_us": z, "last_us": z,
                 "sum_value": np.empty(0, np.float64)}
            )
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap_break = np.concatenate([[True], (us[1:] - us[:-1]) > gap_us])
        brk = new_user | gap_break
        sess_global = np.cumsum(brk) - 1  # global run id
        # 0-based per user: subtract the user's first run id
        run_starts = np.flatnonzero(brk)
        user_first_run = np.cumsum(new_user) - 1
        first_run_of_user = sess_global[np.flatnonzero(new_user)][user_first_run]
        session_id = sess_global - first_run_of_user
        bounds = np.concatenate([run_starts, [n]])
        counts = np.diff(bounds)
        if value_scale:
            units = np.floor(val * float(value_scale) + 0.5).astype(np.int64)
            sums = np.add.reduceat(units, run_starts) / float(value_scale)
        else:
            sums = np.add.reduceat(val, run_starts)
        return pa.table(
            {
                "user_id": u[run_starts],
                "session_id": session_id[run_starts],
                "n_events": counts.astype(np.int64),
                "first_us": us[run_starts],
                "last_us": us[bounds[1:] - 1],
                "sum_value": sums,
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def running_totals(
    events: ray.data.Dataset,
    num_parts: int = 32,
    value_scale: int = 100,
) -> ray.data.Dataset:
    """Per-user running totals in event-time order (the window-function
    analog SUM() OVER (PARTITION BY user ORDER BY ts, event_id)): one
    shuffle on hash(user) % P, then a per-partition lexsort + segmented
    cumsum over integer value units (exact prefix sums — no float
    accumulation-order surface; the divide back to currency happens per
    output element, mirroring CAST(x AS DOUBLE)/scale)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, us, u))
        u, e, us, val = u[order], e[order], us[order], val[order]
        n = len(u)
        if n == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {"event_id": z, "user_id": z,
                 "running": np.empty(0, np.float64)}
            )
        units = np.floor(val * float(value_scale) + 0.5).astype(np.int64)
        tot = np.cumsum(units)
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(new_user)
        base = np.concatenate([[0], tot[starts[1:] - 1]])
        run_id = np.cumsum(new_user) - 1
        running = (tot - base[run_id]) / float(value_scale)
        return pa.table(
            {
                "event_id": e,
                "user_id": u,
                "running": running,
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def asof_join(
    events: ray.data.Dataset,
    left_type: str = "purchase",
    right_type: str = "click",
    num_parts: int = 32,
) -> ray.data.Dataset:
    """As-of join (the brief's custom-operator family): for each left-type
    event, the LATEST right-type event of the same user with ts <= left ts
    (inner semantics: unmatched lefts drop). Returns
    (event_id, user_id, us, matched_event_id, matched_us, gap_us).

    Shape: ONE shuffle on hash(user) % P co-locates both sides, then a
    per-partition sorted C merge (pandas merge_asof). Rights are first
    deduped to one row per (user, us) keeping the max event_id, so the
    tie-break is deterministic and SQL-mirrorable (the matching DuckDB
    oracle ranks by us DESC after the same dedup)."""
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        m = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(m)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "user_id": pa.array(u),
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(df) -> pa.Table:
        import pandas as pd

        l = (
            df[df["event_type"] == left_type]
            .sort_values("us", kind="stable")
            .reset_index(drop=True)
        )
        r = (
            df[df["event_type"] == right_type]
            .groupby(["user_id", "us"], as_index=False)["event_id"]
            .max()
            .sort_values("us", kind="stable")
            .reset_index(drop=True)
        )
        if len(l) == 0 or len(r) == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {
                    "event_id": z, "user_id": z, "us": z,
                    "matched_event_id": z, "matched_us": z, "gap_us": z,
                }
            )
        out = pd.merge_asof(
            l[["event_id", "user_id", "us"]],
            r.rename(columns={"event_id": "matched_event_id", "us": "matched_us"}),
            left_on="us",
            right_on="matched_us",
            by="user_id",
            direction="backward",
        ).dropna(subset=["matched_event_id"])
        return pa.table(
            {
                "event_id": out["event_id"].to_numpy(np.int64),
                "user_id": out["user_id"].to_numpy(np.int64),
                "us": out["us"].to_numpy(np.int64),
                "matched_event_id": out["matched_event_id"].to_numpy(np.int64),
                "matched_us": out["matched_us"].to_numpy(np.int64),
                "gap_us": (
                    out["us"].to_numpy(np.int64)
                    - out["matched_us"].to_numpy(np.int64)
                ),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pandas")
    )


def quantize_units(val: np.ndarray, scale: int) -> np.ndarray:
    """floor(value*scale + 0.5) as integer-valued float64 units. Sums of
    integer-valued float64 are exact (order-independent) while totals stay
    below 2^53, so any Sum aggregate over units is bit-reproducible and
    SQL-mirrorable as ``SUM(CAST(floor(value*scale + 0.5) AS BIGINT))``."""
    return np.floor(np.asarray(val, np.float64) * float(scale) + 0.5)


def hopping_window_agg(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    value_scale: int | None = None,
) -> ray.data.Dataset:
    """Hopping (sliding) window aggregate: each event lands in every window
    [w*hop, w*hop + window) covering its timestamp — the overlapping-window
    generalization of the tumbling events_windowed query. Returns
    (event_type, window_start_us, n, sum_value) per covered window.

    Shape: a flat_map fan-out of window_us/hop_us rows per event inside
    map_batches (vectorized repeat), then a combiner + one groupby — no
    per-event Python.

    value_scale: when set (e.g. 100 for cent-exact values), sum in exact
    integer units and divide back — order-independent, SQL-parity-safe
    (see quantize_units)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    fan = window_us // hop_us

    def expand(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(us)
        # windows w with w*hop <= us < w*hop + window
        w_hi = us // hop_us  # last window containing the event
        offs = np.arange(fan, dtype=np.int64)
        w = w_hi[:, None] - offs[None, :]  # (n, fan)
        keep = (w >= 0).ravel()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        if value_scale:
            val = quantize_units(val, value_scale)
        return pa.table(
            {
                "event_type": np.repeat(et, fan)[keep],
                "window_start_us": (w.ravel() * hop_us)[keep],
                "value": np.repeat(val, fan)[keep],
            }
        )

    out = (
        events.select_columns(["ts", "event_type", "value"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start_us"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
    )
    if value_scale:

        def unscale(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index("sum_value"),
                "sum_value",
                pa.array(
                    t["sum_value"].to_numpy(zero_copy_only=False)
                    / float(value_scale)
                ),
            )

        out = out.map_batches(unscale, batch_format="pyarrow")
    return out


def top_k_by_sum(
    events: ray.data.Dataset,
    key: str = "user_id",
    value: str = "value",
    k: int = 20,
    value_scale: int | None = None,
) -> ray.data.Dataset:
    """Top-k keys by summed value (the reference's sort-desc report shape,
    SURVEY.md §7.3 top-k row): combiner partial sums per batch → small
    groupby sum → sort desc → limit. Ties broken by key ascending.

    value_scale: sum in exact integer units (order-independent, SQL-parity
    -safe; see quantize_units) and divide back — no rounding needed."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = t[value].to_numpy(zero_copy_only=False)
        if value_scale:
            vv = quantize_units(vv, value_scale)
        ku, inv = np.unique(kv, return_inverse=True)
        sums = np.bincount(inv, weights=vv, minlength=len(ku))
        return pa.table({key: ku, value: sums})

    agg = (
        events.select_columns([key, value])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum(value, alias_name="total"))
    )

    def rnd(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if value_scale:
            # exact integer units -> one IEEE division, bit-reproducible
            total = pa.array(
                t["total"].to_numpy(zero_copy_only=False) / float(value_scale)
            )
        else:
            # half_towards_infinity == SQL ROUND (half away from zero);
            # Arrow's default half_to_even would diverge from the DuckDB
            # oracle on ties
            total = pc.round(
                t["total"], ndigits=4, round_mode="half_towards_infinity"
            )
        return pa.table({key: t[key], "total": total})

    return (
        agg.map_batches(rnd, batch_format="pyarrow")
        .sort(["total", key], descending=[True, False])
        .limit(k)
    )


def interval_join(
    events: ray.data.Dataset,
    left_type: str = "error",
    right_type: str = "purchase",
    window_us: int = 600_000_000,
    num_parts: int = 32,
    value_scale: int = 100,
) -> ray.data.Dataset:
    """Range/interval join (the brief's custom-operator family): for each
    left-type event, aggregate the same-user right-type events whose ts
    falls in [left.ts, left.ts + window_us) — e.g. "purchases within 10
    minutes of each error". Returns
    (event_id, user_id, us, n_in_window, sum_value).

    Shape: ONE shuffle on hash(user) % P co-locates both sides; the
    per-partition kernel is fully vectorized via a composite-key
    searchsorted — rights are lexsorted by (user, ts), each right gets the
    key ``user_code * M + rank(ts)`` where rank() is the left-searchsorted
    position in the partition's ts-sorted right array (monotone in ts, so
    key order == (user, ts) order), and every left window becomes two
    binary searches [lo_key, hi_key). Counts are index differences; sums
    are one cumsum lookup of integer-quantized values (exact and
    order-independent, same technique as :func:`sessionize`). No per-user
    or per-window Python loop; per-partition int64 key headroom needs
    users_per_part * (rights_per_part + 1) < 2^63 (any sane block size).
    """
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        mask = pc.is_in(
            t["event_type"], value_set=pa.array([left_type, right_type])
        )
        t = t.filter(mask)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "value": t["value"],
                "is_left": pc.equal(t["event_type"], left_type),
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        val = t["value"].to_numpy(zero_copy_only=False)
        is_l = t["is_left"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "event_id": np.empty(0, np.int64),
                "user_id": np.empty(0, np.int64),
                "us": np.empty(0, np.int64),
                "n_in_window": np.empty(0, np.int64),
                "sum_value": np.empty(0, np.float64),
            }
        )
        if len(u) == 0 or not is_l.any():
            return empty
        codes = np.searchsorted(np.unique(u), u).astype(np.int64)
        r_sel = ~is_l
        r_u, r_us = codes[r_sel], us[r_sel]
        r_units = np.floor(val[r_sel] * float(value_scale) + 0.5).astype(
            np.int64
        )
        order = np.lexsort((r_us, r_u))
        r_u, r_us, r_units = r_u[order], r_us[order], r_units[order]
        ts_sorted = np.sort(r_us)
        M = np.int64(len(r_us) + 1)
        keys_r = r_u * M + np.searchsorted(ts_sorted, r_us)
        cum = np.concatenate([[0], np.cumsum(r_units)])
        l_u, l_e, l_us = codes[is_l], e[is_l], us[is_l]
        lo = np.searchsorted(keys_r, l_u * M + np.searchsorted(ts_sorted, l_us))
        hi = np.searchsorted(
            keys_r, l_u * M + np.searchsorted(ts_sorted, l_us + window_us)
        )
        return pa.table(
            {
                "event_id": l_e,
                "user_id": u[is_l],
                "us": l_us,
                "n_in_window": (hi - lo).astype(np.int64),
                "sum_value": (cum[hi] - cum[lo]) / float(value_scale),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def funnel(
    events: ray.data.Dataset,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Ordered-funnel analysis: for each user, greedy earliest-completion
    matching of the step sequence — t_1 = MIN(ts of step 1), t_k = MIN(ts
    of step k with ts >= t_{k-1}). Returns (user_id, max_step, first_us,
    last_us) for every user who reached step 1; max_step is the deepest
    step reached, last_us its timestamp. All-integer outputs (exact SQL
    parity: the same chain of MIN/>= in plain SQL).

    Shape: rows are filtered to the step event types at the tag stage, ONE
    shuffle on hash(user) % num_parts, then a vectorized kernel — a
    constant K-step loop of per-user minimum.at scans, no per-user Python.
    The greedy chain is the streaming-window generalization of the
    reference's ordered edge consumption (main.cpp:393-398 processes the
    stream strictly in seq order)."""
    import pyarrow.compute as pc

    step_arr = pa.array(list(steps), pa.string())

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=step_arr)
        t = t.filter(keep)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sidx = pc.index_in(t["event_type"], value_set=step_arr)
        return pa.table(
            {
                "user_id": u,
                "us": pc.cast(t["ts"], pa.int64()),
                "step": pc.cast(sidx, pa.int64()),
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    K = len(steps)
    INF = np.iinfo(np.int64).max

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        us = t["us"].to_numpy()
        st = t["step"].to_numpy()
        z = np.empty(0, np.int64)
        if len(u) == 0:
            return pa.table(
                {"user_id": z, "max_step": z, "first_us": z, "last_us": z}
            )
        uq, inv = np.unique(u, return_inverse=True)
        prev = np.full(len(uq), np.iinfo(np.int64).min)
        max_step = np.zeros(len(uq), np.int64)
        first = np.zeros(len(uq), np.int64)
        last = np.zeros(len(uq), np.int64)
        for k in range(K):
            cand = np.full(len(uq), INF)
            m = (st == k) & (us >= prev[inv])
            np.minimum.at(cand, inv[m], us[m])
            hit = (cand < INF) & (max_step == k)
            if k == 0:
                first[hit] = cand[hit]
            max_step[hit] = k + 1
            last[hit] = cand[hit]
            # users who stalled at step k can never match later steps
            prev = np.where(hit, cand, INF)
        reached = max_step >= 1
        return pa.table(
            {
                "user_id": uq[reached],
                "max_step": max_step[reached],
                "first_us": first[reached],
                "last_us": last[reached],
            }
        )

    return (
        events.select_columns(["ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def transition_counts(
    events: ray.data.Dataset,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Markov transition counts: for each user's event stream in
    (ts, event_id) order, count consecutive (event_type -> next event_type)
    bigrams, aggregated globally. The window-function LEAD() pattern.

    ONE shuffle on hash(user) % P; the per-partition kernel factorizes the
    type strings once (np.unique codes), finds within-user adjacent pairs
    with a shifted compare, and emits per-partition PARTIAL counts — the
    final groupby moves at most |types|^2 rows per partition."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        types, codes = np.unique(
            np.asarray(t["event_type"].to_numpy(zero_copy_only=False), dtype=object),
            return_inverse=True,
        )
        if len(u) == 0:
            return pa.table(
                {"from_type": pa.array([], pa.string()),
                 "to_type": pa.array([], pa.string()),
                 "n": np.empty(0, np.int64)}
            )
        order = np.lexsort((e, us, u))
        u, codes = u[order], codes[order]
        same_user = u[1:] == u[:-1]
        frm, to = codes[:-1][same_user], codes[1:][same_user]
        k = len(types)
        pair = frm * k + to
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_type": pa.array(types[uniq // k], pa.string()),
                "to_type": pa.array(types[uniq % k], pa.string()),
                "n": cnt.astype(np.int64),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def modal_event_type(
    events: ray.data.Dataset,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-user modal event type (most frequent; ties broken by the
    lexicographically smallest type) — the grouped-MODE aggregate.

    ONE shuffle on hash(user) % P; the per-partition kernel factorizes the
    type strings once, counts (user, type) pairs by run-length over a
    lexsort, and picks each user's (count desc, type asc) winner — no
    per-user Python."""

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        if len(u) == 0:
            return pa.table(
                {
                    "user_id": np.empty(0, np.int64),
                    "event_type": pa.array([], pa.string()),
                    "n": np.empty(0, np.int64),
                }
            )
        types, codes = np.unique(
            np.asarray(
                t["event_type"].to_numpy(zero_copy_only=False), dtype=object
            ),
            return_inverse=True,
        )
        order = np.lexsort((codes, u))
        u, codes = u[order], codes[order]
        new = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (codes[1:] != codes[:-1])]
        )
        starts = np.flatnonzero(new)
        uu, cc = u[starts], codes[starts]
        cnt = np.diff(np.concatenate([starts, [len(u)]]))
        pick = np.lexsort((cc, -cnt, uu))
        first = np.concatenate([[True], uu[pick][1:] != uu[pick][:-1]])
        win = pick[first]
        return pa.table(
            {
                "user_id": uu[win],
                "event_type": pa.array(list(types[cc[win]]), pa.string()),
                "n": cnt[win].astype(np.int64),
            }
        )

    return (
        events.select_columns(["user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def pivot_type_counts(
    events: ray.data.Dataset,
    types: tuple[str, ...],
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Wide-format pivot: one row per user, one count column per event
    type (`n_<type>`) plus n_total. `types` is the FIXED column domain
    (schema can't depend on data); unknown types raise loudly.

    Counts are additive, so each batch emits a PARTIAL pivot and one
    hash(user) shuffle folds partials — rows crossing the wire are
    per-(batch, user), not per-event."""
    tlist = list(types)
    tindex = {t: i for i, t in enumerate(tlist)}

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(
            t["event_type"].to_numpy(zero_copy_only=False), dtype=object
        )
        codes = np.empty(len(ty), np.int64)
        for i, s in enumerate(ty):
            try:
                codes[i] = tindex[s]
            except KeyError:
                raise ValueError(
                    f"pivot_type_counts: unknown event_type {s!r}; extend "
                    f"the declared domain {tlist}"
                ) from None
        uu, inv = np.unique(u, return_inverse=True)
        k = len(tlist)
        mat = np.zeros((len(uu), k), np.int64)
        np.add.at(mat, (inv, codes), 1)
        cols = {"user_id": uu}
        for j, name in enumerate(tlist):
            cols[f"n_{name}"] = mat[:, j]
        cols["__p"] = pa.array(part_of(uu, num_parts), pa.int32())
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        uu, inv = np.unique(u, return_inverse=True)
        cols = {"user_id": uu}
        total = np.zeros(len(uu), np.int64)
        for name in tlist:
            c = np.bincount(
                inv, weights=t[f"n_{name}"].to_numpy(), minlength=len(uu)
            ).astype(np.int64)
            cols[f"n_{name}"] = c
            total += c
        cols["n_total"] = total
        return pa.table(cols)

    return (
        events.select_columns(["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge, batch_format="pyarrow")
    )


def interarrival_stats(
    events: ray.data.Dataset,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-user inter-arrival gap statistics in exact integer microseconds:
    (n_gaps, gap_sum_us, gap_min_us, gap_max_us) over the (ts, event_id)
    ordering; users with a single event have no gaps and are omitted.

    ONE shuffle on hash(user) % P, then a vectorized diff + run-boundary
    reduce per partition."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        empty = pa.table(
            {
                "user_id": np.empty(0, np.int64),
                "n_gaps": np.empty(0, np.int64),
                "gap_sum_us": np.empty(0, np.int64),
                "gap_min_us": np.empty(0, np.int64),
                "gap_max_us": np.empty(0, np.int64),
            }
        )
        if len(u) == 0:
            return empty
        order = np.lexsort((e, us, u))
        u, us = u[order], us[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        gaps = (us[1:] - us[:-1])[same]
        gu = u[1:][same]
        new = np.concatenate([[True], gu[1:] != gu[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(gu)]])
        return pa.table(
            {
                "user_id": gu[starts],
                "n_gaps": (ends - starts).astype(np.int64),
                "gap_sum_us": np.add.reduceat(gaps, starts),
                "gap_min_us": np.minimum.reduceat(gaps, starts),
                "gap_max_us": np.maximum.reduceat(gaps, starts),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def throttle_events(
    events: ray.data.Dataset,
    min_gap_us: int,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Gap-based throttle (temporal dedup): keep an event iff it is the
    first of its (user, event_type) key or arrives more than `min_gap_us`
    after the key's IMMEDIATELY PRECEDING event (LAG semantics, mirrored
    by the SQL window oracle — not the sequential kept-chain debounce).

    ONE shuffle on hash(user) % P; per-partition lexsort + vectorized
    shifted-gap scan. Returns (event_id, user_id, event_type, ts_us)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        types, codes = (
            np.unique(et, return_inverse=True)
            if len(et)
            else (np.empty(0, object), np.empty(0, np.int64))
        )
        order = np.lexsort((e, us, codes, u))
        u, e, us, codes = u[order], e[order], us[order], codes[order]
        if len(u):
            new_key = np.concatenate(
                [[True], (u[1:] != u[:-1]) | (codes[1:] != codes[:-1])]
            )
            gap_ok = np.concatenate([[True], (us[1:] - us[:-1]) > min_gap_us])
            keep = new_key | gap_ok
        else:
            keep = np.empty(0, bool)
        return pa.table(
            {
                "event_id": e[keep],
                "user_id": u[keep],
                "event_type": pa.array(types[codes[keep]], pa.string()),
                "ts_us": us[keep],
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def grouped_value_percentiles(
    events: ray.data.Dataset,
    quantiles: dict[str, float] | None = None,
    value_scale: int = 100,
) -> ray.data.Dataset:
    """Exact per-event-type value percentiles: quantize values to integer
    cents (floor(v*scale + 0.5)), build a (type, cents) histogram with a
    per-batch combiner + ONE groupby, then pick the 1-based rank
    ``ceil(q * n)`` element from each type's cumulative counts — never a
    global sort of the events. ``ceil(q * n)`` is evaluated in float64 on
    both sides (SQL literal ``0.5e0``), and the output divide back to
    currency is one IEEE op — bit-exact vs the SQL window mirror."""
    from ray.data.aggregate import Sum

    qs = quantiles or {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    scale = float(value_scale)

    def hist_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * scale + 0.5).astype(np.int64)
        types, codes = np.unique(et, return_inverse=True)
        key = np.stack([codes.astype(np.int64), cents], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[uniq[:, 0]], pa.string()),
                "cents": uniq[:, 1],
                "cnt": cnt.astype(np.int64),
            }
        )

    hist = (
        events.select_columns(["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g) -> "pa.Table":
        g = g.sort_values("cents")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        vals = g["cents"].to_numpy(np.int64)
        n = int(cum[-1])
        out = {
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.array([n], np.int64),
        }
        for name, q in qs.items():
            rank = np.ceil(q * n)  # float64, mirrors SQL ceil(qe0 * n)
            v = vals[np.searchsorted(cum, rank)]
            out[name] = np.array([v / scale], np.float64)
        import pandas as _pd

        return _pd.DataFrame(out)

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


def distinct_users_per_window(
    events: ray.data.Dataset,
    window_us: int = 86_400_000_000,
) -> ray.data.Dataset:
    """COUNT(DISTINCT user) per tumbling window (daily active users): a
    per-batch (window, user) dedup combiner, ONE composite-key groupby to
    finish the global dedup, then a window-keyed partial-count fold —
    the scale-correct count-distinct shape (the exploded pairs cross the
    shuffle once, already batch-deduped)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = us // window_us
        pairs = np.unique(np.stack([w, u], axis=1), axis=0)
        return pa.table({"window": pairs[:, 0], "user_id": pairs[:, 1]})

    def fold(t: pa.Table) -> pa.Table:
        w = t["window"].to_numpy()
        wu, cnt = np.unique(w, return_counts=True)
        return pa.table({"window": wu, "n_partial": cnt.astype(np.int64)})

    return (
        events.select_columns(["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["window", "user_id"])
        .count()
        .map_batches(fold, batch_format="pyarrow")
        .groupby("window")
        .sum("n_partial")
        .rename_columns({"sum(n_partial)": "users"})
    )


def rolling_distinct_users(
    events: ray.data.Dataset,
    window_days: int = 7,
    day_us: int = 86_400_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Rolling COUNT(DISTINCT user) — WAU(t) = distinct users active on
    any day in [t - window + 1, t], reported for every day t covered by
    at least one active window (the rolling-DAU→WAU engagement metric).

    Scale shape: ONE shuffle on hash(user) % P puts each user's whole day
    set in one partition; the kernel dedups (user, day), fans each pair
    out to its `window_days` target days (a bounded 7x on the DEDUPED
    pairs, not the raw events), dedups (user, target) locally — globally
    correct because users never straddle partitions — and emits per-day
    integer partials folded by a tiny final groupby."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "day": us // day_us,
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        d = t["day"].to_numpy()
        uw = np.unique(np.stack([u, d], axis=1), axis=0)
        if not len(uw):
            z = np.empty(0, np.int64)
            return pa.table({"day": z, "n_partial": z})
        off = np.arange(window_days, dtype=np.int64)
        tgt = (uw[:, 1][:, None] + off[None, :]).ravel()
        usr = np.repeat(uw[:, 0], window_days)
        ut = np.unique(np.stack([usr, tgt], axis=1), axis=0)
        days, cnt = np.unique(ut[:, 1], return_counts=True)
        return pa.table({"day": days, "n_partial": cnt.astype(np.int64)})

    return (
        events.select_columns(["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("day")
        .sum("n_partial")
        .rename_columns({"sum(n_partial)": "wau"})
    )


def weekly_retention(
    events: ray.data.Dataset,
    window_us: int = 604_800_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Cohort retention: per window w, how many active users are also
    active in w+1. ONE shuffle on hash(user) % P (each user's window set
    lives wholly in one partition); the kernel dedups (user, window),
    marks adjacent-window presence with a shifted compare, and emits
    per-window PARTIALS folded by a tiny final groupby. rate is one IEEE
    divide of exact integer counts, mirrored by the SQL LEAD oracle."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "window": us // window_us,
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        w = t["window"].to_numpy()
        uw = np.unique(np.stack([u, w], axis=1), axis=0)
        if not len(uw):
            z = np.empty(0, np.int64)
            return pa.table({"window": z, "active": z, "retained": z})
        uu, ww = uw[:, 0], uw[:, 1]
        same_user = np.concatenate([uu[1:] == uu[:-1], [False]])
        next_adjacent = np.concatenate([ww[1:] == ww[:-1] + 1, [False]])
        retained = same_user & next_adjacent
        wu, inv = np.unique(ww, return_inverse=True)
        active = np.bincount(inv, minlength=len(wu)).astype(np.int64)
        ret = np.bincount(inv, weights=retained, minlength=len(wu)).astype(
            np.int64
        )
        return pa.table({"window": wu, "active": active, "retained": ret})

    from ray.data.aggregate import Sum

    agg = (
        events.select_columns(["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("window")
        .aggregate(
            Sum("active", alias_name="active"),
            Sum("retained", alias_name="retained"),
        )
    )

    def rate(t: pa.Table) -> pa.Table:
        a = t["active"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["retained"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "window": t["window"],
                "active": a,
                "retained": r,
                "rate": r.astype(np.float64) / a,  # one divide of exact ints
            }
        )

    return agg.map_batches(rate, batch_format="pyarrow")


def value_outliers(
    events: ray.data.Dataset,
    z_thresh: float = 3.0,
    value_scale: int = 100,
) -> ray.data.Dataset:
    """Per-event-type z-score outliers: flag events whose quantized value
    is more than z_thresh population stddevs from the type mean.

    Float-parity posture: n, S = Σcents, SS = Σcents² are exact integer
    partials (one combiner map + a tiny type-keyed groupby); the driver
    computes m = float(S)/float(n) and
    sd = sqrt(float(SS*n - S*S) / float(n*n)) — each operand rounded to
    double exactly like SQL CAST(HUGEINT AS DOUBLE), and sqrt is
    correctly rounded per IEEE (unlike ln, no libm variance) — then the
    flag compare and the z expression are identical chains on both sides.
    The per-type stats dict is tiny and broadcast into the second pass."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    scale = float(value_scale)

    def pre(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        val = t["value"].to_numpy(zero_copy_only=False)
        c = np.floor(val * scale + 0.5).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(types)).astype(np.int64)
        # int64 scatter-adds (np.add.at), NOT float bincount weights —
        # per-batch Σc² can pass 2^53 and must stay exact
        s = np.zeros(len(types), np.int64)
        np.add.at(s, inv, c)
        ss = np.zeros(len(types), np.int64)
        np.add.at(ss, inv, c * c)
        return pa.table(
            {"event_type": pa.array(types, pa.string()), "n": n, "s": s, "ss": ss}
        )

    stats = (
        events.select_columns(["event_type", "value"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .to_pandas()
    )
    params = {}
    for _, row in stats.iterrows():
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        m = float(s) / float(n)
        sd = math.sqrt(float(ss * n - s * s) / float(n * n))
        params[str(row["event_type"])] = (m, sd)
    params_ref = _ray.put(params)

    def flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = _ray.get(params_ref)
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        val = t["value"].to_numpy(zero_copy_only=False)
        c = np.floor(val * scale + 0.5).astype(np.int64)
        types, inv = np.unique(et, return_inverse=True)
        ms = np.array([p[x][0] for x in types.tolist()])[inv]
        sds = np.array([p[x][1] for x in types.tolist()])[inv]
        dev = c.astype(np.float64) - ms
        keep = np.abs(dev) > z_thresh * sds
        from ..functions.rounding import round_half_away

        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64())
                .to_numpy(zero_copy_only=False)[keep],
                "event_type": pa.array(et[keep], pa.string()),
                "value": val[keep],
                "z": round_half_away(dev[keep] / sds[keep], 6),
            }
        )

    return events.select_columns(["event_id", "event_type", "value"]).map_batches(
        flag, batch_format="pyarrow"
    )


def counts_per_window_filled(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
) -> ray.data.Dataset:
    """Per-type event counts on a DENSE window calendar (time-series
    resample with gap filling): one combiner + (type, window) groupby for
    the sparse counts, then a per-type vectorized fill (arange over the
    type's [min, max] window range, searchsorted to place the sparse
    rows). Missing windows emit 0 — downstream time-series ops (moving
    averages, anomaly windows) need the dense grid. Also emits n_ma7, the
    trailing 7-window count sum (integer cumsum difference — the ROWS 6
    PRECEDING window aggregate, exact).

    The dense output is bounded by types x window span, independent of
    event volume."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        w = us // window_us
        types, inv = np.unique(et, return_inverse=True)
        key = np.stack([inv.astype(np.int64), w], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[uniq[:, 0]], pa.string()),
                "win": uniq[:, 1],
                "n": cnt.astype(np.int64),
            }
        )

    sparse = (
        events.select_columns(["ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )

    def fill(g) -> "pa.Table":
        g = g.sort_values("win")
        w = g["win"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        grid = np.arange(w[0], w[-1] + 1, dtype=np.int64)
        dense = np.zeros(len(grid), np.int64)
        dense[np.searchsorted(grid, w)] = n
        cum = np.cumsum(dense)
        ma7 = cum - np.concatenate(
            [
                np.zeros(min(7, len(cum)), np.int64),
                cum[:-7] if len(cum) > 7 else np.empty(0, np.int64),
            ]
        )
        import pandas as _pd

        return _pd.DataFrame(
            {
                "event_type": np.full(len(grid), g["event_type"].iloc[0], object),
                "win": grid,
                "n": dense,
                "n_ma7": ma7.astype(np.int64),
            }
        )

    return sparse.groupby("event_type").map_groups(fill, batch_format="pandas")


_ARRIVAL_MIX = 2654435761  # Knuth multiplicative constant
_ARRIVAL_MOD = 2147483648  # 2^31


def late_events(
    events: ray.data.Dataset,
    allowed_lateness_us: int = 300_000_000,
    arrival_bucket_us: int = 600_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Watermark / late-data detection: an event is LATE when its event
    time falls more than `allowed_lateness_us` behind the per-user
    watermark — the running max event time in ARRIVAL order. The events
    table carries no arrival column (event_id is globally time-ordered,
    so real disorder is zero); arrival is SIMULATED deterministically by
    scrambling events within `arrival_bucket_us` buckets: arrival order =
    (bucket, event_id * Knuth mod 2^31, event_id), the same expression
    the SQL oracle sorts its watermark window by. Max possible lateness
    is bounded by the bucket width.

    ONE shuffle on hash(user) % P; the kernel is a per-partition lexsort
    + pandas' C segmented cumulative max + integer compare. Returns
    flagged rows (event_id, user_id, ts_us, watermark_us, lateness_us)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        bucket = us // arrival_bucket_us
        mix = (e * _ARRIVAL_MIX) % _ARRIVAL_MOD
        order = np.lexsort((e, mix, bucket, u))
        u, e, us = u[order], e[order], us[order]
        n = len(u)
        if n == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {"event_id": z, "user_id": z, "ts_us": z,
                 "watermark_us": z, "lateness_us": z}
            )
        # segmented cumulative max (per-user watermark): pandas' grouped
        # cummax is a single C pass over the already-sorted rows
        import pandas as _pd

        cm = (
            _pd.Series(us).groupby(u, sort=False).cummax().to_numpy(np.int64)
        )
        late = (cm - us) > allowed_lateness_us
        return pa.table(
            {
                "event_id": e[late],
                "user_id": u[late],
                "ts_us": us[late],
                "watermark_us": cm[late],
                "lateness_us": (cm - us)[late],
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def props_field_stats(
    events: ray.data.Dataset, key: str = "k"
) -> ray.data.Dataset:
    """Semi-structured extraction + aggregate: pull integer field `key`
    out of the JSON `props` string column with one vectorized regex
    (identical RE semantics to the SQL regexp_extract mirror), then fold
    per event_type: n, sum, min, max — all integers. Rows without the
    field drop on both sides."""
    import pandas as pd

    from ray.data.aggregate import Count, Max, Min, Sum

    pat = r'"' + key + r'":\s*(-?\d+)'

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        v = df["props"].fillna("").str.extract(pat, expand=False)
        m = v.notna()
        return pd.DataFrame(
            {
                "event_type": df["event_type"][m].to_numpy(dtype=object),
                "v": v[m].astype(np.int64).to_numpy(),
            }
        )

    return (
        events.select_columns(["event_type", "props"])
        .map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("v", alias_name="sum_v"),
            Min("v", alias_name="min_v"),
            Max("v", alias_name="max_v"),
        )
    )


# ---- HyperLogLog distinct-user sketch (deterministic, SQL-mirrored) ------

HLL_MIX = 11400714819323198485  # Fibonacci/Knuth 64-bit multiplier (mod 2^64)
HLL_B = 6  # 2^6 = 64 registers
HLL_W_BITS = 64 - HLL_B  # 58 value bits below the bucket
# raw-HLL bias constant and the fixed numerator alpha * m^2 * 2^59: the
# integer register sum S folds 2^(W_BITS + 1 - M_j) terms (M_j can reach
# W_BITS + 1 when the value bits are all zero, so the scale must be
# 2^(W_BITS+1) to stay integral); identical literal chain in SQL
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 64.0)
HLL_NUM = HLL_ALPHA * 64.0 * 64.0 * float(1 << (HLL_W_BITS + 1))


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (propagate-then-popcount
    SWAR) — float log2 would mis-round at mantissa boundaries."""
    w = w.astype(np.uint64, copy=True)
    for s in (1, 2, 4, 8, 16, 32):
        w |= w >> np.uint64(s)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        w = w - ((w >> np.uint64(1)) & m1)
        w = (w & m2) + ((w >> np.uint64(2)) & m2)
        w = (w + (w >> np.uint64(4))) & m4
        return ((w * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(
            np.int64
        )


def hll_users(events: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT user) per event type via a deterministic
    HyperLogLog (Flajolet et al.): hash = user * Fibonacci-mix mod 2^64,
    top 6 bits pick one of 64 registers, register value = leading-zero
    rank of the low 58 bits. Returns (event_type, exact_users,
    hll_estimate) — the exact count rides along as the accuracy witness.

    Parity: everything up to the register table is integer-exact; the
    register fold S = sum(2^(59 - M_j)) is an exact Python-int / SQL
    HUGEINT sum (never a float sum — 64 powers of two spanning 2^0..2^58
    do NOT sum exactly in float64), and the estimate is the single IEEE
    divide NUM / float(S), raw HLL without small/large-range corrections
    (documented; the oracle applies the identical formula).

    Scale shape: ONE cheap int-key shuffle on hash(user) % P (each user's
    rows land in one partition, so the per-partition (type, user) dedup is
    globally exact — no string-composite groupby); the kernel emits
    (type, bucket, max rank, pair count) partials, folded by one tiny
    (type, bucket) aggregate; the driver folds |types| * 64 rows."""
    import pandas as pd

    from ray.data.aggregate import Max, Sum

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["event_type", "user_id"]].drop_duplicates()
        g = g.assign(__p=part_of(g["user_id"].to_numpy(np.int64), num_parts))
        return g

    def registers(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["event_type", "user_id"])
        u = df["user_id"].to_numpy(np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = u * np.uint64(HLL_MIX)
        bucket = (h >> np.uint64(HLL_W_BITS)).astype(np.int64)
        w = h & np.uint64((1 << HLL_W_BITS) - 1)
        rnk = np.where(w == 0, HLL_W_BITS + 1, HLL_W_BITS + 1 - _bitlen_u64(w))
        g = (
            pd.DataFrame(
                {"event_type": df["event_type"], "bucket": bucket, "rnk": rnk}
            )
            .groupby(["event_type", "bucket"], sort=False)
            .agg(rnk=("rnk", "max"), n_pairs=("rnk", "size"))
            .reset_index()
        )
        g["n_pairs"] = g["n_pairs"].astype(np.int64)
        return g

    reg = (
        events.select_columns(["event_type", "user_id"])
        .map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(registers, batch_format="pandas")
        .groupby(["event_type", "bucket"])
        .aggregate(Max("rnk", alias_name="rnk"), Sum("n_pairs", alias_name="n"))
        .to_pandas()
    )
    from ..functions.rounding import round_half_away

    out_t, out_exact, out_est = [], [], []
    for et, g in reg.groupby("event_type", sort=True):
        regs = np.zeros(64, np.int64)
        regs[g["bucket"].to_numpy(np.int64)] = g["rnk"].to_numpy(np.int64)
        s = sum(1 << (HLL_W_BITS + 1 - int(m)) for m in regs)  # exact int
        out_t.append(et)
        out_exact.append(int(g["n"].sum()))
        out_est.append(float(round_half_away(np.array([HLL_NUM / float(s)]), 4)[0]))
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "exact_users": pa.array(out_exact, pa.int64()),
                "hll_estimate": pa.array(out_est, pa.float64()),
            }
        )
    )


# ---- Count-Min sketch heavy hitters (deterministic, SQL-mirrored) --------

CMS_ROWS = (  # four odd 64-bit multipliers (Fibonacci + splitmix-style)
    11400714819323198485,
    13787848793156543929,
    10723151780598845931,
    15839092249703872147,
)
CMS_W_BITS = 9  # 512 counters per row


def cms_top_users(
    events: ray.data.Dataset, top_k: int = 20, num_parts: int = 32
) -> ray.data.Dataset:
    """Heavy hitters via a Count-Min sketch (Cormode–Muthukrishnan): a
    4 x 512 integer counter matrix over multiplicative hashes of user_id;
    each user's CMS estimate is the MIN of its four counters (always >=
    the true count). Reports the exact top_k users (count DESC, user ASC)
    with exact and estimated counts side by side — the accuracy witness,
    like :func:`hll_users`.

    Everything is integer, so the SQL mirror is exact by construction.
    Scale shape: batch combiners emit long-form partials (counter cells
    with non-negative keys, per-user exact counts with negative keys);
    ONE cheap int-key shuffle on hash(key) % P completes both folds in a
    vectorized kernel, which emits its partition's counter cells (the
    matrix is FIXED SIZE, 4x512) plus only its TOP-K exact rows — the
    driver merges <= 2048 + P*k rows, never the per-user table."""
    import pandas as pd

    shift = np.uint64(64 - CMS_W_BITS)

    def cols_for(u: np.ndarray) -> np.ndarray:
        """(len(u), 4) counter columns per user: the top CMS_W_BITS bits
        of the mod-2^64 multiplicative hash, one column per row constant."""
        out = np.empty((len(u), len(CMS_ROWS)), np.int64)
        uu = u.astype(np.uint64)
        with np.errstate(over="ignore"):
            for i, c in enumerate(CMS_ROWS):
                out[:, i] = ((uu * np.uint64(c)) >> shift).astype(np.int64)
        return out

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        uu, cnt = np.unique(u, return_counts=True)
        cols = cols_for(uu)
        d = len(CMS_ROWS)
        rows = np.repeat(np.arange(d, dtype=np.int64)[None, :], len(uu), 0)
        key = rows.ravel() * (1 << CMS_W_BITS) + cols.ravel()
        cw = np.repeat(cnt.astype(np.int64), d)
        ku, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(ku), np.int64)
        np.add.at(sums, inv, cw)
        out = pd.DataFrame({"key": ku, "cnt": sums})
        # exact-count partials ride along with a disjoint (negative) key
        # space, so one shuffle folds counters AND exact counts
        out2 = pd.DataFrame(
            {"key": -uu - 1, "cnt": cnt.astype(np.int64)}
        )
        out = pd.concat([out, out2], ignore_index=True)
        out["__p"] = part_of(out["key"].to_numpy(np.int64), num_parts)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        k = df["key"].to_numpy(np.int64)
        c = df["cnt"].to_numpy(np.int64)
        ku, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(ku), np.int64)
        np.add.at(sums, inv, c)
        keep_cells = ku >= 0
        # per-partition exact top-k cut: final winners are complete here
        # (keys are user-partitioned), so the global cut only needs P*k
        # candidate rows
        uk, uc = ku[~keep_cells], sums[~keep_cells]
        cut = np.lexsort((-uk, uc))[::-1][:top_k]  # cnt desc, user asc
        return pd.DataFrame(
            {
                "key": np.concatenate([ku[keep_cells], uk[cut]]),
                "cnt": np.concatenate([sums[keep_cells], uc[cut]]),
            }
        )

    agg = (
        events.select_columns(["user_id"])
        .map_batches(partials, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()  # <= 2048 counter cells + num_parts * top_k rows
    )
    k = agg["key"].to_numpy(np.int64)
    c = agg["cnt"].to_numpy(np.int64)
    is_cnt = k >= 0
    counters = np.zeros(len(CMS_ROWS) << CMS_W_BITS, np.int64)
    counters[k[is_cnt]] = c[is_cnt]
    users = -k[~is_cnt] - 1
    exact = c[~is_cnt]
    order = np.lexsort((users, -exact))[:top_k]
    users, exact = users[order], exact[order]
    cols = cols_for(users)
    idx = np.arange(len(CMS_ROWS), dtype=np.int64)[None, :] * (1 << CMS_W_BITS) + cols
    est = counters[idx].min(axis=1)
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "exact_n": pa.array(exact, pa.int64()),
                "cms_n": pa.array(est, pa.int64()),
            }
        )
    )


def event_trigrams(
    events: ray.data.Dataset, top_k: int = 20, num_parts: int = 32
) -> ray.data.Dataset:
    """Sequential-pattern mining one step past :func:`transition_counts`:
    global counts of consecutive event-type TRIPLES per user (ordered by
    ts, event_id), top_k by (cnt DESC, a, b, c). ONE hash(user) shuffle;
    the kernel double-shifts the lexsorted arrays — per-partition partial
    counts are bounded by |types|^3, so the driver fold is tiny."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        e = t["event_id"].to_numpy()
        us = t["us"].to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "c": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(u) < 3:
            return empty
        order = np.lexsort((e, us, u))
        u, et = u[order], et[order]
        same = (u[2:] == u[:-2]) & (u[1:-1] == u[:-2])
        if not same.any():
            return empty
        g = (
            pd.DataFrame(
                {"a": et[:-2][same], "b": et[1:-1][same], "c": et[2:][same]}
            )
            .groupby(["a", "b", "c"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "a": pa.array(g["a"], pa.string()),
                "b": pa.array(g["b"], pa.string()),
                "c": pa.array(g["c"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()  # <= num_parts * |types|^3 rows
    )
    g = (
        parts.groupby(["a", "b", "c"], sort=True)["cnt"]
        .sum()
        .reset_index()
    )
    cnt = g["cnt"].to_numpy(np.int64)
    order = np.lexsort((np.arange(len(g)), -cnt))[:top_k]  # abc asc via sort=True
    g = g.iloc[order]
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(g["a"], pa.string()),
                "b": pa.array(g["b"], pa.string()),
                "c": pa.array(g["c"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64()),
            }
        )
    )


def top_users_per_type(
    events: ray.data.Dataset, n: int = 3, num_parts: int = 32
) -> ray.data.Dataset:
    """Grouped top-N: each event type's N most active users (count DESC,
    user ASC), the ROW_NUMBER() <= n window pattern over a two-key count.
    ONE hash(user) shuffle — each user's rows are complete in its
    partition, so per-partition (type, user) counts are globally exact and
    the per-partition top-N per type is a valid candidate cut; the driver
    folds num_parts * |types| * n candidate rows."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(),
            }
        )
        g = (
            df.groupby(["event_type", "user_id"], sort=False)
            .size()
            .reset_index(name="n_events")
        )
        g = g.sort_values(
            ["event_type", "n_events", "user_id"],
            ascending=[True, False, True],
        )
        g = g.groupby("event_type", sort=False).head(n)
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "user_id": pa.array(g["user_id"].to_numpy(np.int64), pa.int64()),
                "n_events": pa.array(
                    g["n_events"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    cand = (
        events.select_columns(["user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()  # <= num_parts * |types| * n rows
    )
    cand = cand.sort_values(
        ["event_type", "n_events", "user_id"], ascending=[True, False, True]
    )
    out = cand.groupby("event_type", sort=True).head(n).reset_index(drop=True)
    rn = out.groupby("event_type", sort=False).cumcount() + 1
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "user_id": pa.array(out["user_id"].to_numpy(np.int64), pa.int64()),
                "n_events": pa.array(
                    out["n_events"].to_numpy(np.int64), pa.int64()
                ),
                "rn": pa.array(rn.to_numpy(np.int64), pa.int64()),
            }
        )
    )


def event_type_pmi(events: ray.data.Dataset, num_parts: int = 32) -> pa.Table:
    """Pointwise mutual information between event-type pairs at the USER
    level: for each unordered type pair (a < b), how many users performed
    both, and PMI = ln(N * c_ab / (c_a * c_b)) in integer nanonats
    (floor(1e9 * ln(x)) — one IEEE divide and one libm ln on an
    identically computed double, the bm25/doc_logprob parity chain).
    Co-occurrence mining for behavioral features / recommendation priors.

    Scale shape: ONE shuffle on hash(user) %% P; each partition holds all
    rows of its users, so per-user distinct types, per-type user partials,
    distinct-user partials, and within-user type-pair counts are all
    partition-local (types per user bounded by the type vocabulary);
    only O(|types|^2) integer partial rows reach the driver fold."""
    import pandas as pd

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "event_type"]].drop_duplicates()
        users = d["user_id"].to_numpy(np.int64)
        codes, types = pd.factorize(d["event_type"].to_numpy(object), sort=True)
        order = np.lexsort((codes, users))
        users, codes = users[order], codes[order]
        starts = np.flatnonzero(
            np.concatenate([[True], users[1:] != users[:-1]])
        )
        lens = np.diff(np.concatenate([starts, [len(users)]]))
        # triangular type pairs per user (types sorted within user run)
        npair = lens * (lens - 1) // 2
        tot = int(npair.sum())
        rows = []
        if tot:
            run_id = np.repeat(np.arange(len(lens)), npair)
            within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run_id]
            L = lens[run_id]
            i = np.floor(
                ((2 * L - 1)
                 - np.sqrt((2 * L - 1).astype(np.float64) ** 2 - 8 * within)) / 2
            ).astype(np.int64)
            j = within - (i * (L - 1) - i * (i - 1) // 2) + i + 1
            base = starts[run_id]
            a, b = codes[base + i], codes[base + j]
            pk = a * len(types) + b
            uq, cnt = np.unique(pk, return_counts=True)
            rows.append(
                pd.DataFrame(
                    {
                        "type_a": types[(uq // len(types))],
                        "type_b": types[(uq % len(types))],
                        "cnt": cnt.astype(np.int64),
                        "tag": np.zeros(len(uq), np.int64),
                    }
                )
            )
        tu, tc = np.unique(codes, return_counts=True)
        rows.append(
            pd.DataFrame(
                {
                    "type_a": types[tu],
                    "type_b": [""] * len(tu),
                    "cnt": tc.astype(np.int64),
                    "tag": np.ones(len(tu), np.int64),
                }
            )
        )
        rows.append(
            pd.DataFrame(
                {
                    "type_a": [""],
                    "type_b": [""],
                    "cnt": np.array([len(starts)], np.int64),
                    "tag": np.array([2], np.int64),
                }
            )
        )
        return pd.concat(rows, ignore_index=True)

    parts = pd.DataFrame(
        events.select_columns(["user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pandas")
        .take_all()
    )
    n_users = int(parts.loc[parts["tag"] == 2, "cnt"].sum())
    c = (
        parts[parts["tag"] == 1]
        .groupby("type_a")["cnt"].sum()
    )
    p = (
        parts[parts["tag"] == 0]
        .groupby(["type_a", "type_b"])["cnt"].sum()
        .reset_index()
        .sort_values(["type_a", "type_b"])
    )
    cab = p["cnt"].to_numpy(np.int64)
    ca = c.loc[p["type_a"]].to_numpy(np.int64)
    cb = c.loc[p["type_b"]].to_numpy(np.int64)
    x = (n_users * cab).astype(np.float64) / (ca * cb).astype(np.float64)
    pmi = np.floor(1e9 * np.log(x)).astype(np.int64)
    return pa.table(
        {
            "type_a": pa.array(p["type_a"].tolist(), pa.string()),
            "type_b": pa.array(p["type_b"].tolist(), pa.string()),
            "n_users_both": pa.array(cab, pa.int64()),
            "pmi_e9": pa.array(pmi, pa.int64()),
        }
    )


def user_entropy(events: ray.data.Dataset, num_parts: int = 32) -> ray.data.Dataset:
    """Per-user Shannon entropy of the event-type distribution — a
    behavioral-diversity feature (bots/scrapers cluster near 0). The
    order-free decomposition keeps it bit-exact: H = ln(n) - S/(1e9*n)
    where S = sum over types of c_i * floor(1e9 * ln(c_i)) is an exact
    int64 sum (each term one libm ln on an integer — the bm25 parity
    chain), and the final two-double expression is computed identically
    on both sides. Returns (user_id, n_events, n_types, entropy).

    Scale shape: ONE shuffle on hash(user) %% P; per partition a
    (user, type) factorized count, a per-unique-count ln lookup (ln is
    evaluated once per DISTINCT count value, not per row), and the
    vectorized fold."""
    import pandas as pd

    from ..functions.rounding import round_half_away

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kern(df: pd.DataFrame) -> pd.DataFrame:
        import math

        u = df["user_id"].to_numpy(np.int64)
        tcodes, _ = pd.factorize(df["event_type"].to_numpy(object), sort=False)
        comp = u * (tcodes.max() + 1 if len(tcodes) else 1) + tcodes
        cu, cc = np.unique(comp, return_counts=True)
        users = cu // (tcodes.max() + 1 if len(tcodes) else 1)
        # ln evaluated once per distinct count value
        vals = np.unique(cc)
        ln_e9 = np.array(
            [math.floor(1e9 * math.log(int(v))) for v in vals], np.int64
        )
        term = cc.astype(np.int64) * ln_e9[np.searchsorted(vals, cc)]
        uu, inv = np.unique(users, return_inverse=True)
        n = np.bincount(inv, weights=cc, minlength=len(uu)).astype(np.int64)
        ntypes = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        s = np.bincount(inv, weights=term, minlength=len(uu)).astype(np.int64)
        ent = round_half_away(
            np.log(n.astype(np.float64)) - s.astype(np.float64) / (1e9 * n), 6
        )
        return pd.DataFrame(
            {
                "user_id": uu,
                "n_events": n,
                "n_types": ntypes,
                "entropy": ent,
            }
        )

    return (
        events.select_columns(["user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pandas")
    )


def grouped_mad(
    events: ray.data.Dataset, value_scale: int = 100, k: float = 3.0
) -> ray.data.Dataset:
    """Robust per-type outlier statistics: exact integer-cents median,
    median absolute deviation (MAD), and the count of values beyond
    k*MAD of the median — the robust sibling of the z-score pass (immune
    to the outliers it hunts). Both medians come from ONE histogram: the
    deviation distribution is a re-keying of the value histogram by
    |cents - median|, so no second pass over events. Lower-median
    convention: value at 1-based rank ceil(0.5*n) ascending (ceil in
    float64, the value_percentiles parity chain). Returns (event_type,
    n_events, median_cents, mad_cents, n_outliers) — all exact int64.

    Scale shape: per-batch (type, cents) combiner, ONE fixed-cardinality
    groupby, per-type kernels on bounded histograms."""
    from ray.data.aggregate import Sum

    scale = float(value_scale)

    def hist_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * scale + 0.5).astype(np.int64)
        types, codes = np.unique(et, return_inverse=True)
        key = np.stack([codes.astype(np.int64), cents], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[uniq[:, 0]], pa.string()),
                "cents": uniq[:, 1],
                "cnt": cnt.astype(np.int64),
            }
        )

    hist = (
        events.select_columns(["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g) -> "pd.DataFrame":
        import pandas as _pd

        g = g.sort_values("cents")
        vals = g["cents"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])
        med = int(vals[np.searchsorted(cum, np.ceil(0.5 * n))])
        d = np.abs(vals - med)
        order = np.argsort(d, kind="stable")
        du, inv = np.unique(d[order], return_inverse=True)
        dc = np.bincount(inv, weights=cnts[order]).astype(np.int64)
        dcum = dc.cumsum()
        mad = int(du[np.searchsorted(dcum, np.ceil(0.5 * n))])
        n_out = int(dc[du > k * mad].sum())
        return _pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([n], np.int64),
                "median_cents": np.array([med], np.int64),
                "mad_cents": np.array([mad], np.int64),
                "n_outliers": np.array([n_out], np.int64),
            }
        )

    return hist.groupby("event_type").map_groups(pick, batch_format="pandas")


def bottomk_median_sketch(
    events: ray.data.Dataset,
    k: int = 32,
    value_scale: int = 100,
) -> "pa.Table":
    """Bottom-k hash-sample quantile sketch per event type, with the exact
    median as a same-query witness (the HLL / Count-Min pattern): the
    sample is the k events with the smallest Fibonacci-mixed hash of
    event_id — a uniform, deterministic, mergeable sample — and the
    estimate is the sample's ceil(k/2)-rank value.

    Scale shape: every block folds to <= k rows per event type (a
    bottom-k combiner — bounded state, mergeable in any order), ONE tiny
    event_type groupby finishes the fold; the witness reuses the
    (type, cents) histogram combiner. Ranks are ceil(0.5 * n) in float64
    and the cents divide is the identical IEEE expression on both sides."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .curation import FIB_MIX

    scale = float(value_scale)

    def bk_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * scale + 0.5).astype(np.int64)
        with np.errstate(over="ignore"):
            h = ((ids.astype(np.uint64) * FIB_MIX) >> np.uint64(32)).astype(
                np.int64
            )
        types, codes = np.unique(et, return_inverse=True)
        order = np.lexsort((ids, h, codes))
        codes_s = codes[order]
        # first-k-per-type cut over the (type, h, id)-sorted rows
        new_g = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        starts = np.flatnonzero(new_g)
        pos_in_g = np.arange(len(codes_s)) - starts[np.cumsum(new_g) - 1]
        keep = order[pos_in_g < k]
        return pa.table(
            {
                "event_type": pa.array(et[keep], pa.string()),
                "h": pa.array(h[keep]),
                "event_id": pa.array(ids[keep]),
                "cents": pa.array(cents[keep]),
            }
        )

    def bk_final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["h", "event_id"]).head(k)
        cs = np.sort(g["cents"].to_numpy(np.int64))
        ku = len(cs)
        rank = np.ceil(0.5 * ku)  # float64, mirrors SQL ceil(0.5e0 * k)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "k_used": np.array([ku], np.int64),
                "est_cents": np.array([cs[int(rank) - 1]], np.int64),
            }
        )

    samp = (
        events.select_columns(["event_type", "event_id", "value"])
        .map_batches(bk_partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(bk_final, batch_format="pandas")
        .to_pandas()
    )

    # exact-median witness from the (type, cents) histogram combiner
    def hist_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * scale + 0.5).astype(np.int64)
        types, codes = np.unique(et, return_inverse=True)
        key = np.stack([codes.astype(np.int64), cents], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[uniq[:, 0]], pa.string()),
                "cents": uniq[:, 1],
                "cnt": cnt.astype(np.int64),
            }
        )

    def epick(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("cents")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        vals = g["cents"].to_numpy(np.int64)
        n = int(cum[-1])
        rank = np.ceil(0.5 * n)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([n], np.int64),
                "exact_cents": np.array(
                    [vals[np.searchsorted(cum, rank)]], np.int64
                ),
            }
        )

    wit = (
        events.select_columns(["event_type", "value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .groupby("event_type")
        .map_groups(epick, batch_format="pandas")
        .to_pandas()
    )
    m = samp.merge(wit, on="event_type").sort_values("event_type")
    est = m["est_cents"].to_numpy(np.int64)
    exa = m["exact_cents"].to_numpy(np.int64)
    return pa.table(
        {
            "event_type": pa.array(m["event_type"].astype(str)),
            "n_events": pa.array(m["n_events"].to_numpy(np.int64)),
            "k_used": pa.array(m["k_used"].to_numpy(np.int64)),
            "est_median": pa.array(est.astype(np.float64) / scale),
            "exact_median": pa.array(exa.astype(np.float64) / scale),
            "err_cents": pa.array(np.abs(est - exa)),
        }
    )


def interval_coverage(
    events: ray.data.Dataset,
    window_us: int = 300_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """(user_id, covered_us, n_events): total length of the union of the
    per-event activity intervals [ts, ts + window_us) for each user.

    Equal-length intervals sorted by start have monotone ends, so the
    union telescopes with no sweep state: covered = sum over consecutive
    events of min(gap, window) plus one trailing window per user. One
    hashed-user shuffle, one lexsort + np.diff per partition; integer
    microseconds end-to-end (bit-exact vs the SQL LEAD/LEAST mirror)."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "us": pc.cast(t["ts"], pa.int64()),
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        us = t["us"].to_numpy()
        order = np.lexsort((us, u))
        u, us = u[order], us[order]
        n = len(u)
        if n == 0:
            z = np.empty(0, np.int64)
            return pa.table(
                {"user_id": z, "covered_us": z, "n_events": z}
            )
        new_user = np.concatenate([[True], u[1:] != u[:-1]])
        gap = np.minimum(np.diff(us), window_us)
        gap[new_user[1:]] = 0  # cross-user diffs contribute nothing
        # per-user: sum of clipped gaps + one trailing window
        starts = np.flatnonzero(new_user)
        cum = np.concatenate([[0], np.cumsum(gap)])
        per_user = cum[np.concatenate([starts[1:], [n]]) - 1] - cum[starts]
        counts = np.diff(np.concatenate([starts, [n]]))
        return pa.table(
            {
                "user_id": u[starts],
                "covered_us": (per_user + window_us).astype(np.int64),
                "n_events": counts.astype(np.int64),
            }
        )

    return (
        events.select_columns(["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
    )


def decayed_counts(
    events: ray.data.Dataset,
    half_life_days: int = 1,
    cap_days: int = 40,
) -> ray.data.Dataset:
    """(user_id, decay_units, decayed): exponentially time-decayed event
    counter per user — each event contributes 2^(-age/half_life) where
    age is whole days before the corpus's latest event day, ages past
    `cap_days` half-lives contribute 0 (their exact weight underflows the
    fixed-point scale, and the cutoff is part of the semantics).

    The decay base 2 makes every per-event weight an exact integer at
    scale 2^cap: weight_units = 1 << (cap - age_halflives), so the int64
    sum is order-independent and bit-identical to the SQL bit-shift
    mirror; `decayed` = units / 2^cap is one IEEE division. Two passes:
    a #blocks-row max-day fold, then per-block (user -> units) partials
    into ONE user-key sum — no sort, no window function."""
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000

    def day_max(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        return pa.table(
            {"d": pa.array([int(us.max() // day_us)] if len(us) else [],
                           pa.int64())}
        )

    src = events.select_columns(["ts", "user_id"]).materialize()
    horizon = max(
        r["d"] for r in src.map_batches(day_max, batch_format="pyarrow").take_all()
    )

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        age = (horizon - us // day_us) // half_life_days
        m = age <= cap_days
        w = np.zeros(len(u), np.int64)
        w[m] = np.int64(1) << (cap_days - age[m]).astype(np.int64)
        order = np.argsort(u, kind="stable")
        u, w = u[order], w[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]])
        )
        # int64 reduceat (never float-weighted bincount): exact at any
        # per-user event volume up to int64 range
        sums = (
            np.add.reduceat(w, starts) if len(w) else np.empty(0, np.int64)
        )
        return pa.table(
            {"user_id": u[starts], "units": sums.astype(np.int64)}
        )

    agg = (
        src.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("units", alias_name="decay_units"))
    )

    def finish(t: pa.Table) -> pa.Table:
        du = t["decay_units"].to_numpy()
        return pa.table(
            {
                "user_id": t["user_id"],
                "decay_units": du,
                "decayed": du / np.float64(np.int64(1) << cap_days),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cusum_by_type(events: ray.data.Dataset, num_parts: int = 8) -> "pa.Table":
    """Integer-exact CUSUM level-shift detection per event type (Page
    1954): over the type's own [first, last] active-day span with missing
    days zero-filled, the deviation path S_k = N * prefix_k - T * (k+1)
    (counts scaled by N = span days and T = total events, so the mean
    path is subtracted without fractions); the change-point statistic is
    max |S_k| and the shift day is its earliest argmax. Emits
    (event_type, n_days, total, max_dev, shift_day).

    Scale shape: a per-batch combiner pre-folds to (type, day, n)
    partials — bounded by |types| * span, not row count — then ONE
    hashed-type shuffle co-locates each type's day histogram; the
    zero-fill + prefix scan is a numpy pass over a span-length array.
    Skew note: with few types the shuffle is trivially small; the
    per-type state is O(span), never O(events)."""
    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def combiner(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        g = (
            pd.DataFrame({"event_type": t["event_type"].to_pylist(), "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .reset_index(name="n")
        )
        th = stable_id64(g["event_type"].to_numpy(object)).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "__p": pa.array(part_of(th, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            day = grp["day"].to_numpy(np.int64)
            n = grp["n"].to_numpy(np.int64)
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            counts = np.bincount(day - lo, weights=n, minlength=span).astype(
                np.int64
            )
            total = int(counts.sum())
            dev = span * np.cumsum(counts) - total * np.arange(1, span + 1)
            adev = np.abs(dev)
            at = int(np.argmax(adev))  # argmax returns the FIRST maximum
            rows.append((et, span, total, int(adev[at]), lo + at))
        return pd.DataFrame(
            rows, columns=["event_type", "n_days", "total", "max_dev", "shift_day"]
        )

    out = (
        events.select_columns(["event_type", "ts"])
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(
            lambda df: fold(
                df.groupby(["event_type", "day"], sort=False)["n"]
                .sum()
                .reset_index()
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_days": pa.array(out["n_days"].to_numpy(np.int64)),
            "total": pa.array(out["total"].to_numpy(np.int64)),
            "max_dev": pa.array(out["max_dev"].to_numpy(np.int64)),
            "shift_day": pa.array(out["shift_day"].to_numpy(np.int64)),
        }
    )


# AMS sign-hash constants (odd, PCG64 seed 424242) — INPUTS to the sketch,
# embedded verbatim in the SQL oracle like the other sketch families
AMS_CONSTS = (
    8754766711547910655, 1938524422270434261, 5316597535795654845,
    4437344803314687615, 13135359453188745291, 9853890317057118461,
    2349288510670763613, 16970271743943454635, 2511279364587061135,
)


def f2_moment(events: ray.data.Dataset, num_parts: int = 32) -> "pa.Table":
    """Second frequency moment F2 = sum_u f_u^2 of the per-user event
    counts, with an AMS tug-of-war sketch estimate alongside (Alon,
    Matias, Szegedy, STOC'96): estimator r is Z_r = sum_u s_r(u) * f_u
    with the four-wise-ish sign s_r(u) = +1 iff (u * C_r mod 2^64) <
    2^63; the reported estimate is the exact median of the 9 integer
    Z_r^2 values. Emits ONE row (f2_exact, f2_med_est) — the exact moment
    is the accuracy witness, the sketch the scale path (its state is 9
    counters regardless of user cardinality).

    Scale shape: ONE int-key shuffle on hash(user) % P so each user's
    partial counts co-locate; every partition emits 9 signed sums + its
    exact sum of squares (10 integers), and the driver folds P such rows.
    All arithmetic is uint64-wraparound / int64 on the Ray side and
    HUGEINT mod 2^64 in SQL — bit-identical by construction."""
    import pandas as pd

    from ..functions.hashing import part_of

    R = len(AMS_CONSTS)

    def tag(t: pa.Table) -> pa.Table:
        import pandas as pd

        u = t["user_id"].to_numpy().astype(np.int64, copy=False)
        g = pd.DataFrame({"u": u}).groupby("u", sort=False).size()
        uu = g.index.to_numpy(np.int64)
        return pa.table(
            {
                "u": pa.array(uu),
                "n": pa.array(g.to_numpy(np.int64)),
                "__p": pa.array(part_of(uu, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", sort=False)["n"].sum()
        u = g.index.to_numpy(np.int64).astype(np.uint64)
        f = g.to_numpy(np.int64)
        out = {"f2": np.int64(np.dot(f, f))}
        with np.errstate(over="ignore"):
            for r, c in enumerate(AMS_CONSTS):
                h = u * np.uint64(c)
                sign = np.where(h < np.uint64(1 << 63), 1, -1)
                out[f"z{r}"] = np.int64(np.dot(sign, f))
        return pd.DataFrame([out])

    parts = (
        events.select_columns(["user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    f2 = int(parts["f2"].sum())
    ests = sorted(int(parts[f"z{r}"].sum()) ** 2 for r in range(R))
    return pa.table(
        {
            "f2_exact": pa.array([f2], pa.int64()),
            "f2_med_est": pa.array([ests[R // 2]], pa.int64()),
        }
    )


def rate_spikes(
    events: ray.data.Dataset,
    trailing: int = 7,
    top_n: int = 20,
    num_parts: int = 8,
) -> "pa.Table":
    """Daily rate-spike detection per event type: for every day with a
    full `trailing`-day history (zero-filled over the type's own
    [first, last] span), the spike ratio in exact integer thousandths is
    spike_e3 = 1000 * trailing * n_day // sum(previous `trailing` days)
    (integer floor division — both sides), undefined (skipped) when the
    trailing sum is zero. Emits the top_n (event_type, day, n, spike_e3)
    by (spike_e3 desc, type, day) — the operational alarm view next to
    the CUSUM level-shift report.

    Scale shape: the same (type, day, n) combiner partials as
    cusum_by_type (bounded by |types| * span), ONE hashed-type shuffle,
    then a span-length vector scan per type; the global cut merges
    per-partition top_n pre-cuts."""
    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def combiner(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        g = (
            pd.DataFrame({"event_type": t["event_type"].to_pylist(), "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .reset_index(name="n")
        )
        th = stable_id64(g["event_type"].to_numpy(object)).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day": pa.array(g["day"].to_numpy(np.int64)),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "__p": pa.array(part_of(th, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["event_type", "day"], sort=False)["n"].sum().reset_index()
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            day = grp["day"].to_numpy(np.int64)
            n = grp["n"].to_numpy(np.int64)
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            counts = np.bincount(day - lo, weights=n, minlength=span).astype(
                np.int64
            )
            if span <= trailing:
                continue
            csum = np.concatenate([[0], np.cumsum(counts)])
            d = np.arange(trailing, span)
            tsum = csum[d] - csum[d - trailing]
            ok = tsum > 0
            spike = (
                1000 * trailing * counts[d[ok]] // tsum[ok]
            )
            for dd, nn, sp in zip(d[ok], counts[d[ok]], spike):
                rows.append((et, lo + int(dd), int(nn), int(sp)))
        out = pd.DataFrame(
            rows, columns=["event_type", "day", "n", "spike_e3"]
        )
        return out.sort_values(
            ["spike_e3", "event_type", "day"], ascending=[False, True, True]
        ).head(top_n)

    cands = (
        events.select_columns(["event_type", "ts"])
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = cands.sort_values(
        ["spike_e3", "event_type", "day"], ascending=[False, True, True]
    ).head(top_n)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"].to_numpy(np.int64)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "spike_e3": pa.array(out["spike_e3"].to_numpy(np.int64)),
        }
    )


def linear_attribution(
    events: ray.data.Dataset,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_us: int = 7 * 86_400_000_000,
    credit_unit: int = 1_000_000,
    num_parts: int = 32,
) -> "pa.Table":
    """Multi-touch LINEAR attribution: each conversion splits one unit of
    credit equally across ALL the user's touch events in the window
    strictly before it (the complement of asof_join's last-touch model).
    Credits are integer micro-units — credit_unit // k per touch with the
    remainder going to the k earliest touches in (ts, event_id) order —
    so per-conversion credit sums to exactly credit_unit and the totals
    are order-independent integers (bit-exact vs the SQL mirror).

    Returns one row per touch event_type: (event_type, n_touches,
    credit_micro).

    Scale shape: type filter at the read -> ONE shuffle on hash(user) % P
    -> per-partition vectorized kernel: lexsort by (user, ts, event_id),
    per-conversion touch ranges via TWO struct searchsorteds over the
    partition's touch rows (no per-user loop), grouped-arange pair
    expansion, remainder by within-conversion position, and a
    per-partition (type, credit) fold so only P x |types| rows reach the
    driver. Pair volume is bounded by conversions x touches-per-window,
    never |events|^2."""
    import pandas as pd
    import pyarrow.compute as pc

    types = [conv_type, *touch_types]

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array(types))
        t = t.filter(keep)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "t": pc.cast(t["ts"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(object)
        is_conv = et == conv_type
        tu, tt = u[~is_conv], t[~is_conv]
        tet = et[~is_conv]
        cu, ct = u[is_conv], t[is_conv]
        out = {"event_type": [], "n_touches": [], "credit_micro": []}
        if len(tu) and len(cu):
            tk = np.empty(len(tu), dtype=[("u", "<i8"), ("t", "<i8")])
            tk["u"], tk["t"] = tu, tt
            qlo = np.empty(len(cu), dtype=tk.dtype)
            qlo["u"], qlo["t"] = cu, ct - window_us
            qhi = np.empty(len(cu), dtype=tk.dtype)
            qhi["u"], qhi["t"] = cu, ct  # strictly-before: side="left"
            lo = np.searchsorted(tk, qlo, side="left")
            hi = np.searchsorted(tk, qhi, side="left")
            k = hi - lo
            sel = k > 0
            lo, k = lo[sel], k[sel]
            tot = int(k.sum())
            if tot:
                rep = np.repeat(np.arange(len(k)), k)
                pos = np.arange(tot) - np.repeat(np.cumsum(k) - k, k)
                tidx = np.repeat(lo, k) + pos
                kk = np.repeat(k, k)
                credit = credit_unit // kk + (pos < credit_unit % kk)
                # touch rows are (t, event_id)-sorted within each user, so
                # `pos` IS the within-conversion rank the SQL ROW_NUMBER
                # (ORDER BY ts, event_id) assigns
                pt = pd.DataFrame(
                    {"event_type": tet[tidx], "credit": credit}
                )
                g = pt.groupby("event_type", sort=True)
                agg = g["credit"].agg(["count", "sum"])
                out["event_type"] = list(agg.index)
                out["n_touches"] = agg["count"].astype(np.int64).tolist()
                out["credit_micro"] = agg["sum"].astype(np.int64).tolist()
        return pd.DataFrame(out)

    parts = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_touches": pa.array([], pa.int64()),
                "credit_micro": pa.array([], pa.int64()),
            }
        )
    g = parts.groupby("event_type", sort=True).agg(
        n_touches=("n_touches", "sum"), credit_micro=("credit_micro", "sum")
    )
    return pa.table(
        {
            "event_type": pa.array(list(g.index), pa.string()),
            "n_touches": pa.array(g["n_touches"].to_numpy(np.int64)),
            "credit_micro": pa.array(g["credit_micro"].to_numpy(np.int64)),
        }
    )


def kmv_overlap(
    events: ray.data.Dataset,
    type_a: str = "click",
    type_b: str = "purchase",
    k: int = 256,
    num_parts: int = 32,
) -> "pa.Table":
    """KMV (k-minimum-values / bottom-k) sketch INTERSECTION: estimate the
    number of distinct users who performed BOTH event types from two
    bottom-k hash sketches (Beyer et al.'s distinct-value estimator:
    jaccard ~= rho / k over the union's bottom-k, |A u B| ~= (k-1)*2^64 /
    tau), with the exact intersection count riding along as the accuracy
    witness. The set-OPERATION counterpart of hll_users' per-set
    cardinalities — sketches compose under union, so per-shard sketches
    of a 100 TB corpus merge to one k-row state on the driver.

    Parity: hash = user * Fibonacci-mix mod 2^64 (HUGEINT-mirrored in
    SQL); sketch contents, tau, rho and the exact witness are integers;
    the two estimates are the identical IEEE divide/multiply sequence on
    both sides.

    Scale shape: type filter + per-block (user, typebit) dedup -> ONE
    cheap shuffle on hash(user) % P (each user's rows in one partition,
    so the per-user bit-OR and the exact both-types count are globally
    exact) -> per-partition bottom-k partials (bounded k rows per type
    per partition) -> driver merges P tiny partials. No sort, no
    second shuffle."""
    import pandas as pd
    import pyarrow.compute as pc

    POW64F = 18446744073709551616.0

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array([type_a, type_b]))
        t = t.filter(keep)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bit = np.where(
            np.asarray(t["event_type"].to_pandas()) == type_a, 1, 2
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": u, "bit": bit}).drop_duplicates()
        df["__p"] = part_of(df["user_id"].to_numpy(np.int64), num_parts)
        return pa.table(
            {
                "user_id": df["user_id"].to_numpy(np.int64),
                "bit": df["bit"].to_numpy(np.int64),
                "__p": pa.array(df["__p"].to_numpy(np.int32)),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        bit = df["bit"].to_numpy(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        mask = np.zeros(len(uu), np.int64)
        np.bitwise_or.at(mask, inv, bit)
        with np.errstate(over="ignore"):
            h = uu.astype(np.uint64) * np.uint64(HLL_MIX)
        rows = {"kind": [], "val": []}
        for kind, m in ((0, 1), (1, 2)):
            hs = np.sort(h[(mask & m) > 0])[:k]
            rows["kind"].extend([kind] * len(hs))
            rows["val"].extend(hs.view(np.int64).tolist())
        rows["kind"].append(2)
        rows["val"].append(int((mask == 3).sum()))
        return pd.DataFrame(rows)

    parts = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )

    def out(k_used, rho, exact_both, jac, inter):
        return pa.table(
            {
                "k_used": pa.array([k_used], pa.int64()),
                "rho": pa.array([rho], pa.int64()),
                "exact_both": pa.array([exact_both], pa.int64()),
                "jaccard_est": pa.array([jac], pa.float64()),
                "inter_est": pa.array([inter], pa.float64()),
            }
        )

    if not len(parts):
        return out(0, 0, 0, 0.0, 0.0)
    exact_both = int(parts[parts["kind"] == 2]["val"].sum())
    sa = np.unique(
        parts[parts["kind"] == 0]["val"].to_numpy(np.int64).view(np.uint64)
    )[:k]
    sb = np.unique(
        parts[parts["kind"] == 1]["val"].to_numpy(np.int64).view(np.uint64)
    )[:k]
    un = np.unique(np.concatenate([sa, sb]))[:k]
    k_used = len(un)
    if k_used == 0:
        return out(0, 0, exact_both, 0.0, 0.0)
    tau = un[-1]
    rho = int((np.isin(un, sa) & np.isin(un, sb)).sum())
    jac = np.float64(rho) / np.float64(k_used)
    union_est = np.float64(k_used - 1) * POW64F / np.float64(tau)
    return out(k_used, rho, exact_both, float(jac), float(jac * union_est))


PSI_SPLIT_US = 1705363200000000  # 2024-01-16T00:00:00Z: ref half | cur half
PSI_STEP_CENTS = 2000
PSI_NBINS = 25


def psi_drift(
    events: ray.data.Dataset,
    split_us: int = PSI_SPLIT_US,
    step_cents: int = PSI_STEP_CENTS,
    nbins: int = PSI_NBINS,
    num_parts: int = 32,
) -> "pa.Table":
    """Population Stability Index per event type — the distribution-drift
    monitor of an ML feature pipeline (CUSUM watches the mean; PSI
    watches the whole histogram): value is cent-quantized into fixed
    integer bins, the stream splits into reference (ts < split) and
    current halves, and PSI = sum_b (p_b - q_b) * ln(p_b / q_b) over
    Laplace-smoothed bin frequencies. Every per-bin term is
    floor(1e9 * term) — an int64 nanonat — so the cross-bin total is an
    ORDER-INDEPENDENT integer sum (the bm25/doc_logprob parity chain:
    exact-integer-valued doubles into one divide, one libm ln, two
    multiplies, floor). Returns (event_type, n_ref, n_cur, psi_e9).

    Scale shape: pure combiner — per-batch (type, half, bin) counts (a
    fixed |types| * 2 * nbins grid), one tiny fixed-cardinality groupby,
    driver folds the grid. No row-scale shuffle anywhere."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        b = np.clip(cents // step_cents, 0, nbins - 1)
        half = (ts >= split_us).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(t["event_type"].to_pandas(), object),
                "half": half,
                "bin": b,
            }
        )
        g = df.groupby(["event_type", "half", "bin"], sort=False).size()
        g = g.reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return pa.table(g)

    parts = (
        events.select_columns(["event_type", "ts", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(parts):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_ref": pa.array([], pa.int64()),
                "n_cur": pa.array([], pa.int64()),
                "psi_e9": pa.array([], pa.int64()),
            }
        )
    g = (
        parts.groupby(["event_type", "half", "bin"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    types = sorted(g["event_type"].unique())
    out_t, out_r, out_c, out_p = [], [], [], []
    for et in types:
        sub = g[g["event_type"] == et]
        q = np.zeros(nbins, np.int64)  # reference
        p = np.zeros(nbins, np.int64)  # current
        rq = sub[sub["half"] == 0]
        rp = sub[sub["half"] == 1]
        q[rq["bin"].to_numpy(np.int64)] = rq["n"].to_numpy(np.int64)
        p[rp["bin"].to_numpy(np.int64)] = rp["n"].to_numpy(np.int64)
        # Laplace +1 smoothing: no empty-bin infinities, still integers
        sq, sp = q + 1, p + 1
        SQ, SP = int(sq.sum()), int(sp.sum())
        spq = float(SP) * float(SQ)  # <= 1e12: exact in float64
        # per-bin scalar chain with math.log — bit-identical to DuckDB's
        # ln (same libm); np.log's SIMD path is deliberately avoided (the
        # bm25/doc_logprob parity rule)
        psi = 0
        for i in range(nbins):
            af = float(sp[i]) * SQ - float(sq[i]) * SP  # exact integers
            rr = (float(sp[i]) * SQ) / (float(sq[i]) * SP)
            psi += math.floor((af / spq) * math.log(rr) * 1e9)
        out_t.append(et)
        out_r.append(int(q.sum()))
        out_c.append(int(p.sum()))
        out_p.append(int(psi))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n_ref": pa.array(out_r, pa.int64()),
            "n_cur": pa.array(out_c, pa.int64()),
            "psi_e9": pa.array(out_p, pa.int64()),
        }
    )


def cooccurrence_links(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Windowed co-occurrence identity linking — the shared-device /
    shared-key entity-resolution candidate generator: pairs of DISTINCT
    users with events on the same props key within `window_us` of each
    other. Returns per unordered user pair (user_a < user_b):
    n_meetings (distinct qualifying event pairs) and n_keys (distinct
    shared keys). Exact, not heuristic.

    Scale shape: bucket = t // window; every event ships to its bucket
    AND the next one (halo copy), so any pair within the window lands in
    at least one shared (key, bucket) group — completeness by
    construction, duplicates removed by one distinct on the event-pair
    id. ONE shuffle on hash(key, bucket) % P, vectorized searchsorted
    window-pair expansion per group (never all-pairs per key), distinct,
    then a hash(user-pair) fold. Pair volume is bounded by events x
    window occupancy, not |events|^2."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = (
            pd.Series(np.asarray(t["props"].to_pandas(), object))
            .str.extract(r"(\d+)", expand=False)
            .fillna("-1")
            .astype(np.int64)
            .to_numpy()
        )
        b = ts // window_us
        n = len(u)
        # halo: each row to its bucket and the next
        uu = np.tile(u, 2)
        tt = np.tile(ts, 2)
        ee = np.tile(eid, 2)
        kk2 = np.tile(kk, 2)
        bb = np.concatenate([b, b + 1])
        with np.errstate(over="ignore"):
            key = kk2.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + bb.astype(
                np.uint64
            )
        return pa.table(
            {
                "u": uu,
                "t": tt,
                "eid": ee,
                "kk": kk2,
                "bb": bb,
                "__p": pa.array(part_of(key, num_parts), pa.int32()),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["kk", "bb", "t", "eid"], kind="stable")
        kkb = df[["kk", "bb"]].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        u = df["u"].to_numpy(np.int64)
        e = df["eid"].to_numpy(np.int64)
        n = len(t)
        grp = np.ones(n, bool)
        grp[1:] = (kkb[1:] != kkb[:-1]).any(axis=1)
        gid = np.cumsum(grp) - 1
        # per-row window end: last index in the SAME group with t <= t_i + W,
        # via ONE searchsorted over a (group << 44 | t-offset) composite —
        # offsets span < 2^44 us (~200 days) and gids < 2^19 per partition
        # (partition sizes are block-bounded), so the composite is exact
        assert len(gid) == 0 or gid[-1] < (1 << 19)
        gkey = gid.astype(np.int64) << np.int64(44)
        comp = gkey + np.clip(t - t.min(), 0, (1 << 44) - 1)
        hi = np.searchsorted(
            comp, gkey + np.clip(t - t.min() + window_us, 0, (1 << 44) - 1),
            side="right",
        )
        pos = np.arange(n)
        cnt = hi - pos - 1
        cnt[cnt < 0] = 0
        tot = int(cnt.sum())
        if tot == 0:
            z = np.empty(0, np.int64)
            return pd.DataFrame({"ua": z, "ub": z, "kk": z, "ea": z, "eb": z})
        rep = np.repeat(pos, cnt)
        within = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        mate = rep + 1 + within
        keep = u[rep] != u[mate]
        rep, mate = rep[keep], mate[keep]
        ua = np.minimum(u[rep], u[mate])
        ub = np.maximum(u[rep], u[mate])
        ea = np.minimum(e[rep], e[mate])
        eb = np.maximum(e[rep], e[mate])
        return pd.DataFrame(
            {"ua": ua, "ub": ub, "kk": df["kk"].to_numpy(np.int64)[rep],
             "ea": ea, "eb": eb}
        )

    from ..sources.edges import distinct_int_rows

    cand = distinct_int_rows(
        events.select_columns(["event_id", "ts", "user_id", "props"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(pairs, batch_format="pandas"),
        ["ua", "ub", "kk", "ea", "eb"],
        num_parts,
    )

    def tag_pair(t: pa.Table) -> pa.Table:
        ua = t["ua"].to_numpy(zero_copy_only=False)
        ub = t["ub"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            key = ua.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + ub.astype(
                np.uint64
            )
        return pa.table(
            {
                "ua": ua, "ub": ub, "kk": t["kk"],
                "__p": pa.array(part_of(key, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["ua", "ub"], sort=True).agg(
            n_meetings=("kk", "size"), n_keys=("kk", "nunique")
        ).reset_index()
        return pd.DataFrame(
            {
                "user_a": g["ua"].to_numpy(np.int64),
                "user_b": g["ub"].to_numpy(np.int64),
                "n_meetings": g["n_meetings"].to_numpy(np.int64),
                "n_keys": g["n_keys"].to_numpy(np.int64),
            }
        )

    return (
        cand.map_batches(tag_pair, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


def markov_eval(
    events: ray.data.Dataset,
    split_us: int = PSI_SPLIT_US,
    num_parts: int = 32,
) -> "pa.Table":
    """Train/eval split for a first-order Markov next-event predictor —
    the model-evaluation loop of a behavioral pipeline, exact end to end:
    transitions are per-user consecutive (ts, event_id)-ordered event
    pairs, assigned to TRAIN when the first event precedes `split_us`
    and to EVAL otherwise; the model predicts, per from_type, the
    max-train-count next type (ties to the lexicographically smallest);
    eval accuracy is integer hits over integer totals with one mirrored
    ROUND(6) divide. Returns (from_type, predicted, n_eval, n_hits,
    accuracy); from_types absent from training are excluded (inner-join
    semantics, mirrored in SQL).

    Scale shape: ONE hash(user) shuffle; the per-partition kernel emits
    |types|^2 x 2 partial counts; the driver folds the fixed-cardinality
    grid, fits the argmax model, and scores — model state never exceeds
    the type vocabulary."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    def tag(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": u,
                "e": pc.cast(t["event_id"], pa.int64()),
                "t": pc.cast(t["ts"], pa.int64()),
                "ty": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "t", "e"], kind="stable")
        u = df["u"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        ty = df["ty"].to_numpy(object)
        if len(u) < 2:
            return pd.DataFrame(
                {"ft": [], "tt": [], "iseval": [], "n": []}
            )
        same = u[1:] == u[:-1]
        ft, tt = ty[:-1][same], ty[1:][same]
        iseval = (t[:-1][same] >= split_us).astype(np.int64)
        g = (
            pd.DataFrame({"ft": ft, "tt": tt, "iseval": iseval})
            .groupby(["ft", "tt", "iseval"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    empty = pa.table(
        {
            "from_type": pa.array([], pa.string()),
            "predicted": pa.array([], pa.string()),
            "n_eval": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64()),
            "accuracy": pa.array([], pa.float64()),
        }
    )
    if not len(parts):
        return empty
    g = (
        parts.groupby(["ft", "tt", "iseval"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    trn = g[g["iseval"] == 0]
    ev = g[g["iseval"] == 1]
    if not len(trn) or not len(ev):
        return empty
    model = (
        trn.sort_values(["ft", "n", "tt"],
                        ascending=[True, False, True], kind="stable")
        .drop_duplicates("ft")
        .set_index("ft")["tt"]
    )
    rows = []
    for ft, sub in ev.groupby("ft", sort=True):
        if ft not in model.index:
            continue
        pred = model.loc[ft]
        n_eval = int(sub["n"].sum())
        n_hits = int(sub[sub["tt"] == pred]["n"].sum())
        acc = float(round_half_away(
            np.array([n_hits / n_eval]), 6)[0])
        rows.append((ft, pred, n_eval, n_hits, acc))
    return pa.table(
        {
            "from_type": pa.array([r[0] for r in rows], pa.string()),
            "predicted": pa.array([r[1] for r in rows], pa.string()),
            "n_eval": pa.array([r[2] for r in rows], pa.int64()),
            "n_hits": pa.array([r[3] for r in rows], pa.int64()),
            "accuracy": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


SEASONAL_TOPN = 20


def seasonal_deviation(
    events: ray.data.Dataset,
    split_us: int = PSI_SPLIT_US,
    topn: int = SEASONAL_TOPN,
    num_parts: int = 32,
) -> "pa.Table":
    """Weekly-seasonality deviation alarms — the deseasonalized
    complement of rate_spikes' trailing-window test: the reference half
    (before `split_us`) learns each event type's day-of-week profile
    (pure integer counts keyed on epoch-day % 7, identical on both
    sides); each current-half day is scored by its integer
    cross-multiplied deviation from the profile-scaled expectation,
    dev_e3 = (|n_day * R - C * r_dow| * 1000) // (C * r_dow) — exact
    thousandths of relative deviation with NO float anywhere. Returns
    the top-n (event_type, day, n, dev_e3) by (dev_e3 desc, type, day).
    Days whose dow the reference never saw are skipped (both sides).

    Scale shape: pure combiner — per-batch (type, half, day) counts, one
    fixed-cardinality fold (types x days observed), driver scores the
    tiny grid."""
    import pandas as pd
    import pyarrow.compute as pc

    US_DAY = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // US_DAY
        half = (ts >= split_us).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(t["event_type"].to_pandas(), object),
                    "half": half,
                    "day": day,
                }
            )
            .groupby(["event_type", "half", "day"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return pa.table(g)

    parts = (
        events.select_columns(["event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "dev_e3": pa.array([], pa.int64()),
        }
    )
    if not len(parts):
        return empty
    g = (
        parts.groupby(["event_type", "half", "day"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    rows = []
    for et, sub in g.groupby("event_type", sort=True):
        ref = sub[sub["half"] == 0]
        cur = sub[sub["half"] == 1]
        if not len(ref) or not len(cur):
            continue
        rd = np.zeros(7, np.int64)
        dow = ref["day"].to_numpy(np.int64) % 7
        np.add.at(rd, dow, ref["n"].to_numpy(np.int64))
        R = int(rd.sum())
        C = int(cur["n"].sum())
        for day, n in zip(
            cur["day"].to_numpy(np.int64), cur["n"].to_numpy(np.int64)
        ):
            r = int(rd[day % 7])
            if r == 0 or C == 0:
                continue
            dev = (abs(int(n) * R - C * r) * 1000) // (C * r)
            rows.append((et, int(day), int(n), dev))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:topn]
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "day": pa.array([r[1] for r in rows], pa.int64()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "dev_e3": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


GAP_SLO_PCTS = (50, 95, 99)


def gap_slo(
    events: ray.data.Dataset,
    pcts: tuple[int, ...] = GAP_SLO_PCTS,
    num_parts: int = 32,
) -> "pa.Table":
    """Exact inter-arrival SLO percentiles per event type — p50/p95/p99
    of the gaps between consecutive events of each type in global
    (ts, event_id) order, selected EXACTLY (value at 0-based rank
    ((n-1)*q)//100 of the sorted gap multiset — the discrete lower
    percentile, deterministic regardless of tie order). The
    unbounded-cardinality complement of the cent-histogram value
    percentiles: microsecond gaps can't histogram, so selection runs on
    the sample-sort ranking primitive.

    Scale shape: ONE hash(type) shuffle computes per-type consecutive
    gaps (each type's stream sorts within its partition — type
    cardinality is the vocabulary, the per-type order is inherent to the
    metric); gaps re-key as ONE composite int64 (type_code * 2^44 + gap,
    gaps < 2^44 us ~ 200 days) and the exact_ntile machinery with
    n_tiles = n ranks them globally in one range shuffle; the target
    ranks (|types| * |pcts| integers) broadcast and one filter pass
    emits the selected rows."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.proccache import cached_get
    from .relational import exact_ntile

    def tag(t: pa.Table) -> pa.Table:
        ty = np.asarray(t["event_type"].to_pandas(), object)
        codes = pd.Series(ty).astype("category")
        return pa.table(
            {
                "event_type": t["event_type"],
                "t": pc.cast(t["ts"], pa.int64()),
                "e": pc.cast(t["event_id"], pa.int64()),
                "__p": pa.array(
                    part_of(
                        pd.util.hash_array(ty).astype(np.uint64), num_parts
                    ),
                    pa.int32(),
                ),
            }
        )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "t", "e"], kind="stable")
        ty = df["event_type"].to_numpy(object)
        t = df["t"].to_numpy(np.int64)
        e = df["e"].to_numpy(np.int64)
        if len(t) < 2:
            return pd.DataFrame({"event_type": [], "gap": [], "gid": []})
        same = ty[1:] == ty[:-1]
        return pd.DataFrame(
            {
                "event_type": ty[1:][same],
                "gap": (t[1:] - t[:-1])[same],
                "gid": e[1:][same],
            }
        )

    gp = (
        events.select_columns(["event_id", "ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(gaps, batch_format="pandas")
        .materialize()
    )
    # type vocabulary + per-type gap counts (tiny)
    cnts = (
        gp.map_batches(
            lambda df: df.groupby("event_type", sort=True)
            .size()
            .reset_index(name="n"),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if not len(cnts):
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "pct": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
    cnts = cnts.groupby("event_type", sort=True)["n"].sum()
    types = list(cnts.index)
    n_per = cnts.to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_per)[:-1]])
    code_map = {t: i for i, t in enumerate(types)}
    code_ref = ray.put(code_map)

    def composite(df: pd.DataFrame) -> pa.Table:
        cm = cached_get(code_ref)
        code = df["event_type"].map(cm).to_numpy(np.int64)
        gap = df["gap"].to_numpy(np.int64)
        assert (gap < (1 << 44)).all() and (gap >= 0).all()
        return pa.table(
            {
                "k": df["gid"].to_numpy(np.int64),
                "m": code * (1 << 44) + gap,
            }
        )

    ranked = exact_ntile(
        gp.map_batches(composite, batch_format="pandas"),
        "m",
        "k",
        n_tiles=int(n_per.sum()),
        num_parts=num_parts,
    )
    targets: dict[int, list] = {}
    for i, ty in enumerate(types):
        for q in pcts:
            rk = int(offsets[i] + ((n_per[i] - 1) * q) // 100)
            targets.setdefault(rk, []).append((ty, q))  # ranks can collide
    tref = ray.put(targets)

    def pick(t: pa.Table) -> pa.Table:
        tg = cached_get(tref)
        tile = t["tile"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        keep = np.isin(tile, np.fromiter(tg.keys(), np.int64))
        rows = [
            (ty, q, int(v) & ((1 << 44) - 1))
            for r, v in zip(tile[keep], m[keep])
            for ty, q in tg[int(r)]
        ]
        return pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "pct": pa.array([r[1] for r in rows], pa.int64()),
                "gap_us": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    out = ranked.map_batches(pick, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["event_type", "pct"]).reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "pct": pa.array(out["pct"].to_numpy(np.int64)),
            "gap_us": pa.array(out["gap_us"].to_numpy(np.int64)),
        }
    )


def burstiness(
    events: ray.data.Dataset,
    window_us: int = 3_600_000_000,
) -> "pd.DataFrame":
    """Per-type burstiness: the Fano factor (variance / mean) of the
    per-window event-count series over the type's dense [min, max] window
    range (missing windows count 0) — a Poisson process scores ~1, bursty
    traffic >> 1. The rate-anomaly screen that decides whether rate_spikes
    thresholds can assume Poisson noise.

    Exact-parity construction: the combiner pre-folds to sparse
    (type, window, n) partials; one (type, window) groupby completes exact
    counts; per type the moments (n_windows, sum n, sum n^2) are integers,
    and fano = (N * sxx - sx^2) / (N * sx) is evaluated as ONE exact
    integer numerator/denominator (Python bigint, no overflow) cast to
    float64 for a single division — bit-identical to the SQL
    HUGEINT-then-DOUBLE mirror. Output is types-sized."""
    import pandas as pd

    from ..functions.rounding import round_half_away

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), object)
        w = us // window_us
        types, inv = np.unique(et, return_inverse=True)
        key = np.stack([inv.astype(np.int64), w], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(types[uniq[:, 0]], pa.string()),
                "win": uniq[:, 1],
                "n": cnt.astype(np.int64),
            }
        )

    sparse = (
        events.select_columns(["ts", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
        .to_pandas()
    )
    rows = []
    for et, g in sparse.groupby("event_type", sort=True):
        w = g["win"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        N = int(w.max() - w.min()) + 1
        sx = int(n.sum())
        sxx = int((n.astype(object) * n.astype(object)).sum())
        fano = float(N * sxx - sx * sx) / float(N * sx)
        rows.append((et, N, sx, round_half_away(fano, 6)))
    return pd.DataFrame(
        rows, columns=["event_type", "n_windows", "n_events", "fano"]
    )


def longest_streak(
    events: ray.data.Dataset,
    day_us: int = 86_400_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-user longest run of consecutive active days plus total active
    days — the classic gaps-and-islands engagement metric. ONE
    hash(user) shuffle; per partition the distinct (user, day) rows sort
    once and the island key (day - rank-within-user) falls out of a
    vectorized cumcount, so runs group exactly with no per-user Python.
    Output is users-sized."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = us // day_us
        key = np.stack([uid, day], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {
                "user_id": uniq[:, 0],
                "day": uniq[:, 1],
                "__p": pa.array(
                    part_of(uniq[:, 0].astype(np.uint64), num_parts),
                    pa.int32(),
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        d = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"]
        )
        uid = d["user_id"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        # rank within user = position - user start position
        pos = np.arange(len(uid))
        start = np.maximum.accumulate(np.where(new_user, pos, 0))
        island = day - (pos - start)
        g = (
            pd.DataFrame({"user_id": uid, "island": island})
            .groupby(["user_id", "island"], sort=False)
            .size()
            .reset_index(name="len")
        )
        a = g.groupby("user_id", sort=False)["len"].agg(
            longest_streak="max", active_days="sum"
        )
        a = a.reset_index()
        return pa.table(
            {
                "user_id": pa.array(a["user_id"].to_numpy(np.int64)),
                "longest_streak": pa.array(
                    a["longest_streak"].to_numpy(np.int64)
                ),
                "active_days": pa.array(a["active_days"].to_numpy(np.int64)),
            }
        )

    return (
        events.select_columns(["ts", "user_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


def conversion_lag(
    events: ray.data.Dataset,
    from_type: str = "signup",
    to_type: str = "purchase",
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Funnel conversion lag: per user, the first `from_type` event and
    the first `to_type` event AT OR AFTER it, with the lag in
    microseconds — the time-to-convert table cohort dashboards aggregate.
    Users who never convert are omitted (inner semantics, mirrors the SQL
    join).

    ONE hash(user) shuffle of the two event types' (user, ts) rows (the
    sessionize cost class — the 'first purchase after the first signup'
    dependency makes per-batch purchase minima uncombinable, so raw rows
    route once); per partition both resolutions are vectorized groupby
    minima."""
    import pandas as pd
    import pyarrow.compute as pc

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(
            pc.equal(et, from_type), pc.equal(et, to_type)
        )
        t = t.filter(keep)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": uid,
                "us": pc.cast(t["ts"], pa.int64()),
                "is_to": pc.equal(t["event_type"], to_type),
                "__p": pa.array(
                    part_of(uid.astype(np.uint64), num_parts), pa.int32()
                ),
            }
        )

    def fold(df: pd.DataFrame) -> pa.Table:
        f = df[~df["is_to"]]
        su = f.groupby("user_id", sort=False)["us"].min()
        t = df[df["is_to"]].copy()
        t["su"] = t["user_id"].map(su)
        t = t[t["su"].notna() & (t["us"] >= t["su"])]
        pu = t.groupby("user_id", sort=False)["us"].min()
        out = su.to_frame("signup_us").join(pu.to_frame("purchase_us"), how="inner")
        out = out.reset_index().sort_values("user_id")
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(np.int64)),
                "signup_us": pa.array(out["signup_us"].to_numpy(np.int64)),
                "purchase_us": pa.array(
                    out["purchase_us"].to_numpy(np.int64)
                ),
                "lag_us": pa.array(
                    (out["purchase_us"] - out["signup_us"]).to_numpy(np.int64)
                ),
            }
        )

    return (
        events.select_columns(["ts", "user_id", "event_type"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


def decay_attribution(
    events: ray.data.Dataset,
    conv_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    window_us: int = 7 * 86_400_000_000,
    credit_unit: int = 1_000_000,
    num_parts: int = 32,
) -> "pd.DataFrame":
    """Multi-touch TIME-DECAY attribution: each conversion splits one unit
    of credit over its prior-window touches proportionally to
    w = 2^(6 - age_days) (64 for same-day, halving per day, 1 at >= 6
    days) — the recency-weighted complement of linear_attribution. Credits
    are integer micro-units: base_i = credit_unit * w_i // sum(w), with
    the remainder going +1 to the earliest touches in (ts, event_id)
    order, so per-conversion credit sums to exactly credit_unit and all
    totals are order-independent integers (bit-exact vs the SQL mirror).

    Same scale shape as linear_attribution: type filter at the read, ONE
    hash(user) shuffle, per-partition struct-searchsorted ranges +
    grouped-arange expansion, per-partition (type, credit) fold."""
    import pandas as pd
    import pyarrow.compute as pc

    types = [conv_type, *touch_types]
    DAY = 86_400_000_000

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array(types))
        t = t.filter(keep)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": u,
                "t": pc.cast(t["ts"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "__p": pa.array(part_of(u, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "t", "event_id"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(object)
        is_conv = et == conv_type
        tu, tt = u[~is_conv], t[~is_conv]
        tet = et[~is_conv]
        cu, ct = u[is_conv], t[is_conv]
        out = {"event_type": [], "n_touches": [], "credit_micro": []}
        if len(tu) and len(cu):
            tk = np.empty(len(tu), dtype=[("u", "<i8"), ("t", "<i8")])
            tk["u"], tk["t"] = tu, tt
            qlo = np.empty(len(cu), dtype=tk.dtype)
            qlo["u"], qlo["t"] = cu, ct - window_us
            qhi = np.empty(len(cu), dtype=tk.dtype)
            qhi["u"], qhi["t"] = cu, ct
            lo = np.searchsorted(tk, qlo, side="left")
            hi = np.searchsorted(tk, qhi, side="left")
            k = hi - lo
            sel = k > 0
            lo, k = lo[sel], k[sel]
            cts = ct[sel]
            tot = int(k.sum())
            if tot:
                rep = np.repeat(np.arange(len(k)), k)
                pos = np.arange(tot) - np.repeat(np.cumsum(k) - k, k)
                tidx = np.repeat(lo, k) + pos
                age = (np.repeat(cts, k) - tt[tidx]) // DAY
                w = np.where(age <= 5, 64 >> np.minimum(age, 5), 1).astype(
                    np.int64
                )
                starts = np.cumsum(k) - k
                sw = np.add.reduceat(w, starts)
                base = credit_unit * w // np.repeat(sw, k)
                sbase = np.add.reduceat(base, starts)
                rem = credit_unit - sbase
                credit = base + (pos < np.repeat(rem, k))
                pt = pd.DataFrame(
                    {"event_type": tet[tidx], "credit": credit}
                )
                agg = pt.groupby("event_type", sort=True)["credit"].agg(
                    ["count", "sum"]
                )
                out["event_type"] = list(agg.index)
                out["n_touches"] = agg["count"].astype(np.int64).tolist()
                out["credit_micro"] = agg["sum"].astype(np.int64).tolist()
        return pd.DataFrame(out)

    parts = (
        events.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {"event_type": [], "n_touches": [], "credit_micro": []}
        )
    out = (
        parts.groupby("event_type", sort=True)
        .agg(n_touches=("n_touches", "sum"), credit_micro=("credit_micro", "sum"))
        .reset_index()
    )
    out["n_touches"] = out["n_touches"].astype(np.int64)
    out["credit_micro"] = out["credit_micro"].astype(np.int64)
    return out
