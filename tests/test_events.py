"""Sessionization + top-k over the events table (hand-checked fixture)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.stages.events import sessionize, top_k_by_sum

US = 1_000_000


def _events() -> ray.data.Dataset:
    # user 1: events at t=0s, 10s, 3000s (gap>1800s -> 2 sessions)
    # user 2: events at t=5s, 2000s, 2100s (2 sessions: [5], [2000, 2100])
    rows = [
        (0, 0 * US, 1, 1.0),
        (1, 10 * US, 1, 2.0),
        (2, 3000 * US, 1, 4.0),
        (3, 5 * US, 2, 10.0),
        (4, 2000 * US, 2, 20.0),
        (5, 2100 * US, 2, 40.0),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def test_sessionize_gap_splits():
    out = sessionize(_events(), gap_us=1800 * US, num_parts=2).to_pandas()
    got = {
        (r.user_id, r.session_id): (r.n_events, r.first_us, r.last_us, r.sum_value)
        for r in out.itertuples()
    }
    assert got[(1, 0)] == (2, 0, 10 * US, 3.0)
    assert got[(1, 1)] == (1, 3000 * US, 3000 * US, 4.0)
    assert got[(2, 0)] == (1, 5 * US, 5 * US, 10.0)
    assert got[(2, 1)] == (2, 2000 * US, 2100 * US, 60.0)
    assert len(out) == 4


def test_top_k_by_sum():
    out = top_k_by_sum(_events(), k=1).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["user_id"] == 2
    assert np.isclose(out.iloc[0]["total"], 70.0)
