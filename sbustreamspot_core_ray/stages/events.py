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

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import part_of


def sessionize(
    events: ray.data.Dataset,
    gap_us: int = 1_800_000_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """(user_id, session_id, n_events, first_us, last_us, sum_value):
    per-user sessions split where the inter-event gap exceeds gap_us.
    session_id is 0-based per user in time order (ties broken by
    event_id, mirrored in the SQL oracle)."""

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


def top_k_by_sum(
    events: ray.data.Dataset,
    key: str = "user_id",
    value: str = "value",
    k: int = 20,
) -> ray.data.Dataset:
    """Top-k keys by summed value (the reference's sort-desc report shape,
    SURVEY.md §7.3 top-k row): combiner partial sums per batch → small
    groupby sum → sort desc → limit. Ties broken by key ascending."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        kv = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = t[value].to_numpy(zero_copy_only=False)
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

        # half_towards_infinity == SQL ROUND (half away from zero); Arrow's
        # default half_to_even would diverge from the DuckDB oracle on ties
        return pa.table(
            {
                key: t[key],
                "total": pc.round(
                    t["total"], ndigits=4, round_mode="half_towards_infinity"
                ),
            }
        )

    return (
        agg.map_batches(rnd, batch_format="pyarrow")
        .sort(["total", key], descending=[True, False])
        .limit(k)
    )
