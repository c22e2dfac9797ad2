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


def test_asof_join_semantics():
    """Hand-checked attribution: latest prior click per purchase; equal-ts
    clicks collapse to max event_id; clickless purchases drop."""
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.events import asof_join

    rows = [
        # (event_id, us, user, type)
        (1, 100, 7, "click"),
        (2, 100, 7, "click"),      # same ts: max event_id (2) wins
        (3, 150, 7, "purchase"),   # -> click 2, gap 50
        (4, 200, 7, "click"),
        (5, 200, 7, "purchase"),   # ts tie with click 4 -> matched (<=)
        (6, 50, 9, "purchase"),    # user 9 has no prior click -> dropped
        (7, 60, 9, "click"),
        (8, 90, 9, "purchase"),    # -> click 7, gap 30
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    out = (
        asof_join(ray.data.from_arrow(t), num_parts=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.event_id): (int(r.matched_event_id), int(r.gap_us))
        for r in out.itertuples()
    }
    assert got == {3: (2, 50), 5: (4, 0), 8: (7, 30)}


def test_hopping_window_agg():
    """1-unit-hop, 2-unit-window: each event lands in two windows."""
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.events import hopping_window_agg

    t = pa.table(
        {
            "ts": pa.array([5, 15, 25], pa.timestamp("us")),
            "event_type": pa.array(["a", "a", "b"]),
            "value": pa.array([1.0, 2.0, 4.0]),
        }
    )
    out = (
        hopping_window_agg(ray.data.from_arrow(t), window_us=20, hop_us=10)
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    got = {
        (r.event_type, int(r.window_start_us)): (int(r.n), r.sum_value)
        for r in out.itertuples()
    }
    # event at 5 covers windows starting 0 (only: window -10 clipped);
    # event at 15 covers 0 and 10; event at 25 covers 10 and 20
    assert got == {
        ("a", 0): (2, 3.0),
        ("a", 10): (1, 2.0),
        ("b", 10): (1, 4.0),
        ("b", 20): (1, 4.0),
    }


def test_interval_join_semantics():
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.events import interval_join

    # user 1: error at t=100; purchases at 100 (inclusive), 150, 699,
    #         700 (exclusive end), 50 (before) -> 3 in [100, 700)
    # user 2: error at t=0; no purchases
    # user 3: purchase only (no error -> no output row)
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array([100, 100, 150, 699, 700, 50, 0, 10], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 1, 1, 2, 3], pa.int64()),
            "event_type": pa.array(
                ["error", "purchase", "purchase", "purchase", "purchase",
                 "purchase", "error", "purchase"]
            ),
            "value": pa.array([0.0, 1.25, 2.5, 4.0, 8.0, 16.0, 0.0, 32.0]),
        }
    )
    out = (
        interval_join(
            ray.data.from_arrow(t), window_us=600, num_parts=4, value_scale=100
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [0, 6]
    assert out["n_in_window"].tolist() == [3, 0]
    assert out["sum_value"].tolist() == [7.75, 0.0]


def test_interval_join_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.events import interval_join

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10_000_000, n), unit="us"
            ).astype("datetime64[us]"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(
                ["error", "purchase", "click"], n, p=[0.2, 0.5, 0.3]
            ),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    got = (
        interval_join(
            ray.data.from_pandas(df), window_us=600_000, num_parts=4
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'error'
), r AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS units
  FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.us,
  COALESCE(count(r.us), 0) AS n_in_window,
  CAST(COALESCE(sum(r.units), 0) AS DOUBLE) / 100 AS sum_value
FROM l LEFT JOIN r
  ON r.user_id = l.user_id AND r.us >= l.us AND r.us < l.us + 600000
GROUP BY l.event_id, l.user_id, l.us
ORDER BY l.event_id
""").df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_running_totals_prefix_semantics():
    import numpy as np
    import pandas as pd
    import ray.data

    from sbustreamspot_core_ray.stages.events import running_totals

    rows = [
        {"event_id": 1, "user_id": 7, "ts": pd.Timestamp("2026-01-01 10:00"), "value": 1.25},
        {"event_id": 2, "user_id": 7, "ts": pd.Timestamp("2026-01-01 10:05"), "value": 2.50},
        {"event_id": 3, "user_id": 7, "ts": pd.Timestamp("2026-01-01 10:05"), "value": 0.25},
        {"event_id": 4, "user_id": 9, "ts": pd.Timestamp("2026-01-01 09:00"), "value": 10.0},
    ]
    out = (
        running_totals(ray.data.from_items(rows), num_parts=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # ts tie between events 2 and 3 breaks by event_id
    assert np.allclose(out["running"].to_numpy(), [1.25, 3.75, 4.0, 10.0])


def test_funnel_greedy_order_semantics():
    """Funnel matching is strictly ordered and greedy: a click BEFORE the
    first view doesn't count; a user stalling at a step never reaches
    later steps; equal timestamps (>=) do match."""
    from sbustreamspot_core_ray.stages.events import funnel

    rows = [
        # user 1 completes: view@10, click@20, purchase@30
        (10 * US, 1, "view"), (20 * US, 1, "click"), (30 * US, 1, "purchase"),
        # user 2: click BEFORE view -> stalls at step 1 (view@50)
        (40 * US, 2, "click"), (50 * US, 2, "view"), (45 * US, 2, "purchase"),
        # user 3: view+click same timestamp (>= matches), no purchase -> 2
        (70 * US, 3, "view"), (70 * US, 3, "click"),
        # user 4: no view at all -> absent from output
        (80 * US, 4, "purchase"),
    ]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    out = (
        funnel(ev, steps=("view", "click", "purchase"), num_parts=4)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "max_step"] == 3 and out.loc[1, "last_us"] == 30 * US
    assert out.loc[2, "max_step"] == 1 and out.loc[2, "first_us"] == 50 * US
    assert out.loc[3, "max_step"] == 2 and out.loc[3, "last_us"] == 70 * US


def test_throttle_events_gap():
    from sbustreamspot_core_ray.stages.events import throttle_events

    # user 1 type a at 0s, 5s, 20s with 10s gap -> keep 0s (first), drop 5s
    # (gap 5), keep 20s (gap 15); user 1 type b at 6s -> kept (own key)
    rows = [
        (0, 0 * US, 1, "a"),
        (1, 5 * US, 1, "a"),
        (2, 20 * US, 1, "a"),
        (3, 6 * US, 1, "b"),
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
    out = throttle_events(ev, min_gap_us=10 * US, num_parts=2).to_pandas()
    assert sorted(out["event_id"]) == [0, 2, 3]


def test_grouped_value_percentiles_exact():
    from sbustreamspot_core_ray.stages.events import grouped_value_percentiles

    # type a: cents 100..1000 (10 values); p50 -> rank 5 -> 5.00,
    # p90 -> rank 9 -> 9.00, p99 -> rank 10 -> 10.00
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a"] * 10 + ["b"]),
                "value": pa.array([float(i) for i in range(1, 11)] + [2.5]),
            }
        )
    )
    out = (
        grouped_value_percentiles(ev)
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert out.loc["a", "n_events"] == 10
    assert (out.loc["a", ["p50", "p90", "p99"]] == [5.0, 9.0, 10.0]).all()
    assert out.loc["b", "p50"] == 2.5


def test_distinct_users_per_window():
    from sbustreamspot_core_ray.stages.events import distinct_users_per_window

    DAY = 86_400_000_000
    rows = [(0, 1), (10, 1), (20, 2), (DAY + 5, 1), (DAY + 6, 1)]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    out = distinct_users_per_window(ev).to_pandas().set_index("window")
    assert out.loc[0, "users"] == 2 and out.loc[1, "users"] == 1


def test_weekly_retention():
    from sbustreamspot_core_ray.stages.events import weekly_retention

    WEEK = 604_800_000_000
    # user 1 active weeks 0,1,3 -> retained at week 0 only
    # user 2 active weeks 0,2 -> never retained
    rows = [(1, 0), (1, WEEK), (1, 3 * WEEK), (2, 0), (2, 2 * WEEK), (2, 1)]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
            }
        )
    )
    out = weekly_retention(ev, num_parts=2).to_pandas().set_index("window")
    assert out.loc[0, "active"] == 2 and out.loc[0, "retained"] == 1
    assert out.loc[0, "rate"] == 0.5
    assert out.loc[1, "active"] == 1 and out.loc[1, "retained"] == 0
    assert out.loc[2, "active"] == 1 and out.loc[2, "retained"] == 0
    assert out.loc[3, "active"] == 1 and out.loc[3, "retained"] == 0


def test_value_outliers_zscore():
    from sbustreamspot_core_ray.stages.events import value_outliers

    # type a: nineteen 10.00s and one 100.00 -> the 100 is >3 sd out
    vals = [10.0] * 19 + [100.0]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(list(range(20)), pa.int64()),
                "event_type": pa.array(["a"] * 20),
                "value": pa.array(vals, pa.float64()),
            }
        )
    )
    out = value_outliers(ev).to_pandas()
    assert list(out["event_id"]) == [19]
    import math

    c = [1000] * 19 + [10000]
    n, s = 20, sum(c)
    ss = sum(x * x for x in c)
    m = float(s) / float(n)
    sd = math.sqrt(float(ss * n - s * s) / float(n * n))
    assert out.loc[0, "z"] == round((10000 - m) / sd, 6)


def test_counts_per_window_filled():
    from sbustreamspot_core_ray.stages.events import counts_per_window_filled

    HOUR = 3_600_000_000
    # type a: events in hours 0 (x2) and 3 (x1) -> dense grid 0..3 with
    # zeros at 1, 2; ma7 = trailing 7-window sums
    rows = [(0, "a"), (1, "a"), (3 * HOUR, "a"), (3 * HOUR + 5, "b")]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[1] for r in rows]),
            }
        )
    )
    out = (
        counts_per_window_filled(ev)
        .to_pandas()
        .sort_values(["event_type", "win"])
        .reset_index(drop=True)
    )
    a = out[out["event_type"] == "a"]
    assert list(a["win"]) == [0, 1, 2, 3]
    assert list(a["n"]) == [2, 0, 0, 1]
    assert list(a["n_ma7"]) == [2, 2, 2, 3]
    b = out[out["event_type"] == "b"]
    assert list(b["n"]) == [1] and list(b["n_ma7"]) == [1]


def test_late_events_watermark():
    from sbustreamspot_core_ray.stages.events import late_events

    # bucket = 100s; within one bucket arrival is scrambled by
    # (event_id * 2654435761) % 2^31. Use explicit ids whose mixed order
    # inverts the time order so a late row exists.
    mix = lambda e: (e * 2654435761) % 2147483648
    # choose two ids where the LATER ts arrives FIRST in mixed order
    a, b = 1, 2
    if mix(a) > mix(b):
        a, b = b, a
    # event a (arrives first) at t=90s, event b (arrives second) at t=10s
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([a, b], pa.int64()),
                "ts": pa.array([90 * US, 10 * US], pa.timestamp("us")),
                "user_id": pa.array([7, 7], pa.int64()),
            }
        )
    )
    out = late_events(
        ev, allowed_lateness_us=50 * US, arrival_bucket_us=100 * US,
        num_parts=2,
    ).to_pandas()
    assert list(out["event_id"]) == [b]
    assert out.loc[0, "watermark_us"] == 90 * US
    assert out.loc[0, "lateness_us"] == 80 * US


def test_props_field_stats():
    from sbustreamspot_core_ray.stages.events import props_field_stats

    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a", "a", "b", "b"]),
                "props": pa.array(
                    ['{"k": 3}', '{"k": -2}', '{"x": 1}', '{"k": 10}']
                ),
            }
        )
    )
    out = props_field_stats(ev).to_pandas().set_index("event_type")
    assert out.loc["a", "n"] == 2 and out.loc["a", "sum_v"] == 1
    assert out.loc["a", "min_v"] == -2 and out.loc["a", "max_v"] == 3
    assert out.loc["b", "n"] == 1 and out.loc["b", "sum_v"] == 10


def test_modal_event_type_tiebreak():
    """Modal type per user; equal counts resolve to the lexicographically
    smallest type."""
    import pyarrow as pa
    import ray.data

    from sbustreamspot_core_ray.stages.events import modal_event_type

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
            "event_type": pa.array(
                ["b", "a", "b", "z", "a", "q"], pa.string()
            ),
        }
    )
    out = (
        modal_event_type(ray.data.from_arrow(t), num_parts=4)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "event_type"] == "b" and out.loc[1, "n"] == 2
    assert out.loc[2, "event_type"] == "a" and out.loc[2, "n"] == 1  # tie -> min
    assert out.loc[3, "event_type"] == "q"


def test_pivot_type_counts_and_unknown_type():
    import pyarrow as pa
    import pytest
    import ray.data

    from sbustreamspot_core_ray.stages.events import pivot_type_counts

    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "a", "a", "b"], pa.string()),
        }
    )
    out = (
        pivot_type_counts(ray.data.from_arrow(t), types=("a", "b"), num_parts=2)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1].tolist() == [1, 1, 2]
    assert out.loc[2].tolist() == [2, 1, 3]

    bad = pa.table(
        {
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["zzz"], pa.string()),
        }
    )
    with pytest.raises(Exception, match="unknown event_type"):
        pivot_type_counts(
            ray.data.from_arrow(bad), types=("a", "b"), num_parts=2
        ).to_pandas()


def test_interarrival_stats_gaps():
    import pyarrow as pa
    import ray.data

    from sbustreamspot_core_ray.stages.events import interarrival_stats

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([100, 250, 600, 10, 999], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 8, 9], pa.int64()),
        }
    )
    out = (
        interarrival_stats(ray.data.from_arrow(t), num_parts=2)
        .to_pandas()
        .set_index("user_id")
    )
    # user 7: gaps 150, 350; users 8 and 9 have one event each -> omitted
    assert list(out.index) == [7]
    assert out.loc[7].tolist() == [2, 500, 150, 350]


def test_event_type_pmi_hand_checked():
    """Users 1,2 do {x,y}; user 3 does {x}: N=3, c_x=3, c_y=2, c_xy=2,
    PMI = ln(3*2/(3*2)) = 0."""
    import numpy as np

    from sbustreamspot_core_ray.stages.events import event_type_pmi

    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2, 2, 3, 1], pa.int64()),
                "event_type": pa.array(["x", "y", "x", "y", "x", "x"], pa.string()),
            }
        )
    )
    t = event_type_pmi(ev, num_parts=2).to_pandas()
    assert len(t) == 1
    assert t.loc[0, "type_a"] == "x" and t.loc[0, "type_b"] == "y"
    assert t.loc[0, "n_users_both"] == 2
    assert t.loc[0, "pmi_e9"] == 0


def test_user_entropy_hand_checked():
    import math

    from sbustreamspot_core_ray.stages.events import user_entropy

    # user 1: 2x a, 2x b -> H = ln 2; user 2: 3x a -> H = 0
    ev = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
                "event_type": pa.array(list("abab") + list("aaa"), pa.string()),
            }
        )
    )
    t = user_entropy(ev, num_parts=2).to_pandas().set_index("user_id")
    s = 4 * math.floor(1e9 * math.log(2))  # two types with c=2
    expect = round(math.log(4) - s / (1e9 * 4), 6)
    assert abs(t.loc[1, "entropy"] - expect) < 1e-12
    assert t.loc[1, "n_types"] == 2
    assert t.loc[2, "entropy"] == 0.0 and t.loc[2, "n_types"] == 1


def test_bottomk_median_sketch_hand_case():
    """k smaller than one group (sampling real) and larger than the other
    (k_used = n, estimate == exact). The bottom-k membership is fixed by
    the Fibonacci hash, so the expectation is computed with the same hash
    here — the assertion pins rank arithmetic, not hash luck."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.curation import FIB_MIX
    from sbustreamspot_core_ray.stages.events import bottomk_median_sketch

    ids = np.arange(1, 101, dtype=np.int64)
    vals = (ids % 10).astype(np.float64)  # cents 0..900
    rows = {
        "event_id": np.concatenate([ids, ids + 1000]),
        "event_type": ["a"] * 100 + ["b"] * 100,
        "value": np.concatenate([vals, vals]),
    }
    ev = ray.data.from_arrow(pa.table(rows))
    out = bottomk_median_sketch(ev, k=8).to_pandas().set_index("event_type")
    # expected: bottom-8 by hash within each type, rank ceil(4) of sorted cents
    df = pd.DataFrame(rows)
    for t in ["a", "b"]:
        g = df[df["event_type"] == t]
        h = (g["event_id"].to_numpy(np.uint64) * FIB_MIX) >> np.uint64(32)
        take = g.iloc[np.lexsort((g["event_id"], h))[:8]]
        cs = np.sort(np.floor(take["value"].to_numpy() * 100 + 0.5).astype(int))
        assert out.loc[t, "est_median"] == cs[3] / 100.0
        assert out.loc[t, "k_used"] == 8
        assert out.loc[t, "n_events"] == 100
        ac = np.sort(np.floor(g["value"].to_numpy() * 100 + 0.5).astype(int))
        assert out.loc[t, "exact_median"] == ac[49] / 100.0  # ceil(50)-th
    # tiny group: k_used == n, estimate equals exact
    ev2 = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "event_type": pa.array(["z"] * 3),
                "value": pa.array([1.0, 5.0, 9.0]),
            }
        )
    )
    o2 = bottomk_median_sketch(ev2, k=8).to_pandas()
    assert o2["k_used"].tolist() == [3]
    assert o2["est_median"].tolist() == o2["exact_median"].tolist() == [5.0]
    assert o2["err_cents"].tolist() == [0]


def test_interval_coverage_union_semantics():
    """Overlap chain + disjoint island: user 1 has events at 0, 30, 200
    with W=100 -> union [0,130)+[200,300) = 230; user 2 single event ->
    100; duplicate timestamps add nothing."""
    from sbustreamspot_core_ray.stages.events import interval_coverage

    t = pa.table(
        {
            "ts": pa.array(
                [0, 30, 200, 500, 500], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        }
    )
    got = (
        interval_coverage(ray.data.from_arrow(t), window_us=100, num_parts=2)
        .to_pandas()
        .sort_values("user_id")
    )
    assert list(got["covered_us"]) == [230, 100]
    assert list(got["n_events"]) == [3, 2]


def test_decayed_counts_exact_weights():
    """Horizon = day of latest event; weights are exact powers of two:
    user 1 has events at age 0, 1, 1 -> units = 2^5 + 2^4 + 2^4 (cap 5);
    user 2's single event at age 7 is past the cap -> 0 units."""
    from sbustreamspot_core_ray.stages.events import decayed_counts

    D = 86_400_000_000
    t = pa.table(
        {
            "ts": pa.array(
                [7 * D, 6 * D, 6 * D + 5, 0], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        }
    )
    got = (
        decayed_counts(ray.data.from_arrow(t), half_life_days=1, cap_days=5)
        .to_pandas()
        .sort_values("user_id")
    )
    assert got["decay_units"].tolist() == [32 + 16 + 16, 0]
    assert got["decayed"].tolist() == [64 / 32, 0.0]


def test_cusum_by_type_hand_case():
    """Zero-filled span, scaled integer deviation path, earliest argmax.
    type a: days [0,0,0,2] -> counts [3,0,1], T=4, N=3,
    S = 3*[3,3,4] - 4*[1,2,3] = [5,1,0] -> max_dev 5 at day 0."""
    from sbustreamspot_core_ray.stages.events import cusum_by_type

    us = 3_600_000_000
    rows = [("a", 1 * us), ("a", 2 * us), ("a", 3 * us),
            ("a", 49 * us), ("b", 132 * us)]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], "datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = cusum_by_type(ev, num_parts=4).to_pandas().sort_values("event_type")
    a, b = out.iloc[0], out.iloc[1]
    assert tuple(a[["n_days", "total", "max_dev", "shift_day"]]) == (3, 4, 5, 0)
    assert tuple(b[["n_days", "total", "max_dev", "shift_day"]]) == (1, 1, 0, 5)


def test_f2_moment_exact_and_estimate():
    """Exact F2 of per-user counts; sketch estimate equals the sorted
    middle of the 9 signed-sum squares computed independently here."""
    from sbustreamspot_core_ray.stages.events import AMS_CONSTS, f2_moment

    users = [1, 1, 1, 2, 2, 3, 7]
    ev = ray.data.from_arrow(
        pa.table({"user_id": pa.array(users, pa.int64())})
    )
    out = f2_moment(ev, num_parts=4).to_pandas().iloc[0]
    assert out["f2_exact"] == 3 * 3 + 2 * 2 + 1 + 1
    u = np.array([1, 2, 3, 7], np.uint64)
    f = np.array([3, 2, 1, 1], np.int64)
    ests = []
    with np.errstate(over="ignore"):
        for c in AMS_CONSTS:
            sign = np.where(u * np.uint64(c) < np.uint64(1 << 63), 1, -1)
            ests.append(int(np.dot(sign, f)) ** 2)
    assert out["f2_med_est"] == sorted(ests)[4]


def test_rate_spikes_hand_case():
    """Flat week then a 4x day: day 7 spike 1000 (steady), day 8 spike
    7000*4//7 = 4000; days without full history skipped."""
    from sbustreamspot_core_ray.stages.events import rate_spikes

    DAY = 86_400_000_000
    HOUR = 3_600_000_000
    ts = []
    for d in range(9):
        ts.append(d * DAY + HOUR)
    ts += [8 * DAY + 2 * HOUR, 8 * DAY + 3 * HOUR, 8 * DAY + 4 * HOUR]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a"] * len(ts), pa.string()),
                "ts": pa.array(np.array(ts, "datetime64[us]"), pa.timestamp("us")),
            }
        )
    )
    out = rate_spikes(ev, trailing=7, top_n=20, num_parts=4).to_pandas()
    assert list(map(tuple, out.to_numpy())) == [
        ("a", 8, 4, 4000),
        ("a", 7, 1, 1000),
    ]


def test_linear_attribution_vs_bruteforce():
    """Integer micro-credit split vs the O(n^2) definition, covering
    remainder assignment order, the strict ts < conv bound, the window
    lower bound, and conversions with zero touches."""
    import pandas as pd

    from sbustreamspot_core_ray.stages.events import linear_attribution

    W = 100
    rows = [
        # (event_id, t_us, user, type)
        (1, 10, 1, "click"), (2, 20, 1, "view"), (3, 25, 1, "click"),
        (4, 30, 1, "purchase"),          # 3 touches: 333334/333333/333333
        (5, 30, 1, "click"),             # ts == purchase ts -> excluded
        (6, 200, 1, "purchase"),         # touches at 200-W=100..199: none
        (7, 150, 2, "view"), (8, 151, 2, "view"),
        (9, 160, 2, "purchase"),         # k=2: 500000 each
        (10, 5, 3, "error"),             # non-touch type never credited
        (11, 50, 3, "purchase"),         # no touches at all
    ]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )
    got = (
        linear_attribution(events, window_us=W, num_parts=4)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # brute force
    credits: dict[str, list[int]] = {}
    convs = [r for r in rows if r[3] == "purchase"]
    for c in convs:
        tch = sorted(
            (r for r in rows
             if r[3] in ("click", "view") and r[2] == c[2]
             and c[1] - W <= r[1] < c[1]),
            key=lambda r: (r[1], r[0]),
        )
        k = len(tch)
        for pos, r in enumerate(tch):
            credits.setdefault(r[3], []).append(
                1_000_000 // k + (1 if pos < 1_000_000 % k else 0)
            )
    want = pd.DataFrame(
        sorted(
            (t, len(v), sum(v)) for t, v in credits.items()
        ),
        columns=["event_type", "n_touches", "credit_micro"],
    )
    assert got.to_numpy().tolist() == want.to_numpy().tolist()
    # every conversion with touches pays out exactly 1e6
    assert int(want["credit_micro"].sum()) == 2_000_000


def test_kmv_overlap_small_k_vs_bruteforce():
    """With k smaller than the union, the sketch estimate must follow the
    Beyer et al. formula exactly; with k larger, rho == exact overlap."""
    from sbustreamspot_core_ray.stages.events import HLL_MIX, kmv_overlap

    users_a = list(range(1, 61))          # click users 1..60
    users_b = list(range(41, 121))        # purchase users 41..120 (20 shared)
    rows = [(u, "click") for u in users_a] + [(u, "purchase") for u in users_b]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
            }
        )
    )
    for k in (16, 512):
        got = kmv_overlap(events, k=k, num_parts=4).to_pandas().iloc[0]
        h = (np.array(sorted(set(users_a + users_b)), np.uint64)
             * np.uint64(HLL_MIX))
        ha = np.sort(np.array(users_a, np.uint64) * np.uint64(HLL_MIX))[:k]
        hb = np.sort(np.array(users_b, np.uint64) * np.uint64(HLL_MIX))[:k]
        un = np.unique(np.concatenate([ha, hb]))[:k]
        rho = int((np.isin(un, ha) & np.isin(un, hb)).sum())
        assert int(got["k_used"]) == len(un)
        assert int(got["rho"]) == rho
        assert int(got["exact_both"]) == 20
        jac = np.float64(rho) / np.float64(len(un))
        est = jac * (np.float64(len(un) - 1)
                     * 18446744073709551616.0 / np.float64(un[-1]))
        assert got["jaccard_est"] == jac and got["inter_est"] == float(est)
    # big-k sanity: sketch contains everything -> rho equals exact overlap
    got = kmv_overlap(events, k=512, num_parts=4).to_pandas().iloc[0]
    assert int(got["rho"]) == 20


def test_psi_drift_vs_reference():
    """PSI vs a scalar reference: a planted shift must score far above an
    unshifted type, terms must all be nonnegative, and smoothing must keep
    empty bins finite."""
    import math

    from sbustreamspot_core_ray.stages.events import psi_drift

    split = 1_000
    rows = []
    # type 'stable': identical distribution both halves
    for half, t0 in ((0, 0), (1, split)):
        for i in range(200):
            rows.append(("stable", t0 + i, (i % 10) * 30.0))
    # type 'shifted': values jump 10x in the second half
    for i in range(200):
        rows.append(("shifted", i, (i % 10) * 30.0))
    for i in range(200):
        rows.append(("shifted", split + i, 300.0 + (i % 10) * 30.0))
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )
    nb, step = 25, 2000
    got = (
        psi_drift(events, split_us=split, step_cents=step, nbins=nb,
                  num_parts=4)
        .to_pandas()
        .set_index("event_type")
    )

    def ref_psi(vals0, vals1):
        q = np.zeros(nb, np.int64)
        p = np.zeros(nb, np.int64)
        for v in vals0:
            q[min(max(int(math.floor(v * 100 + 0.5)) // step, 0), nb - 1)] += 1
        for v in vals1:
            p[min(max(int(math.floor(v * 100 + 0.5)) // step, 0), nb - 1)] += 1
        sq, sp = q + 1, p + 1
        SQ, SP = int(sq.sum()), int(sp.sum())
        return sum(
            math.floor(
                ((float(sp[i]) * SQ - float(sq[i]) * SP)
                 / (float(SP) * float(SQ)))
                * math.log((float(sp[i]) * SQ) / (float(sq[i]) * SP)) * 1e9
            )
            for i in range(nb)
        )

    base = [(i % 10) * 30.0 for i in range(200)]
    shift = [300.0 + (i % 10) * 30.0 for i in range(200)]
    assert int(got.loc["stable", "psi_e9"]) == ref_psi(base, base)
    assert int(got.loc["shifted", "psi_e9"]) == ref_psi(base, shift)
    assert int(got.loc["shifted", "psi_e9"]) > 100 * max(
        1, abs(int(got.loc["stable", "psi_e9"]))
    )
    assert (got["n_ref"] == 200).all() and (got["n_cur"] == 200).all()


def test_cooccurrence_links_vs_bruteforce():
    """Halo-bucketed window pairs vs the O(n^2) definition, with pairs
    spanning bucket boundaries (the halo case), same-user suppression,
    multi-key pairs, and exact boundary |dt| == window."""
    from sbustreamspot_core_ray.stages.events import cooccurrence_links

    W = 100
    rows = [
        # (event_id, t, user, k)
        (1, 0, 10, 5), (2, 50, 20, 5),      # in-bucket pair
        (3, 95, 30, 5), (4, 180, 40, 5),    # cross-bucket within W (halo)
        (5, 200, 10, 5), (6, 301, 20, 5),   # dt=101 > W: NOT a pair
        (7, 400, 10, 5), (8, 500, 20, 5),   # dt=100 == W: boundary pair
        (9, 600, 10, 7), (10, 650, 20, 7),  # second shared key
        (11, 700, 10, 9), (12, 750, 10, 9), # same user: suppressed
    ]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "props": pa.array(
                    ['{"k": %d}' % r[3] for r in rows], pa.string()
                ),
            }
        )
    )
    got = (
        cooccurrence_links(events, window_us=W, num_parts=4)
        .to_pandas()
        .sort_values(["user_a", "user_b"])
        .reset_index(drop=True)
    )
    # brute force
    agg: dict[tuple, list] = {}
    for a in rows:
        for b in rows:
            if a[0] < b[0] and a[3] == b[3] and a[2] != b[2] \
                    and abs(a[1] - b[1]) <= W:
                key = (min(a[2], b[2]), max(a[2], b[2]))
                agg.setdefault(key, []).append(a[3])
    want = sorted(
        (ua, ub, len(ks), len(set(ks))) for (ua, ub), ks in agg.items()
    )
    assert got.to_numpy().tolist() == [list(r) for r in want]
    assert (10, 20) in agg and len(agg[(10, 20)]) == 4  # three key-5 meetings (incl. the dt==W boundary) + one key-7
    assert (30, 40) in agg  # the halo-spanning pair was found


def test_markov_eval_hand_case():
    """Argmax model + tie-break + split assignment on a hand-built
    stream: transitions straddling the split train on the FIRST event's
    half; a from_type seen only in eval is excluded."""
    from sbustreamspot_core_ray.stages.events import markov_eval

    S = 1000
    rows = [
        # user 1 trains A->B twice, A->C once (model: A->B)
        (1, 0, 1, "A"), (2, 10, 1, "B"), (3, 20, 1, "A"), (4, 30, 1, "C"),
        (5, 40, 1, "A"), (6, 50, 1, "B"),
        # user 2 trains B->A and B->C once each (tie -> predicted 'A')
        (7, 0, 2, "B"), (8, 10, 2, "A"), (9, 20, 2, "B"), (10, 30, 2, "C"),
        # straddle: first event before split -> TRAIN (C->A)
        (11, S - 5, 2, "C"), (12, S + 5, 2, "A"),
        # eval: user 1 after split: A->B (hit), A->C (miss), B->A
        (13, S + 10, 1, "A"), (14, S + 20, 1, "B"),
        (15, S + 30, 1, "A"), (16, S + 40, 1, "C"),
        (17, S + 50, 1, "B"), (18, S + 60, 1, "A"),
        # eval-only from_type D: excluded (no training row)
        (19, S + 70, 2, "D"), (20, S + 80, 2, "A"),
    ]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )
    got = (
        markov_eval(events, split_us=S, num_parts=4)
        .to_pandas()
        .set_index("from_type")
    )
    # eval transitions: u1: A->B, B->A(14->15? no: 14 B@+20 -> 15 A@+30 yes),
    # A->C, C->B(16->17), B->A(17->18); u2: C->A? trained (straddle);
    # eval u2: A->D (13? no, u2: 12 A@S+5 -> 19 D@S+70), D->A
    assert got.loc["A", "predicted"] == "B"
    assert got.loc["B", "predicted"] == "A"   # tie broken lexicographically
    assert "D" not in got.index               # never trained
    # A eval rows: u1 A->B (hit), u1 A->C (miss), u2 A->D (miss) = 1/3
    assert int(got.loc["A", "n_eval"]) == 3
    assert int(got.loc["A", "n_hits"]) == 1
    # B eval: u1 B->A @+20->+30 (hit), u1 B->A @+50->+60 (hit) = 2/2
    assert int(got.loc["B", "n_eval"]) == 2 and int(got.loc["B", "n_hits"]) == 2


def test_seasonal_deviation_hand_case():
    """Integer deviation scoring vs the definition computed in-test:
    planted spike, dow never seen in the reference skipped from scoring
    but still counted in the current total."""
    from sbustreamspot_core_ray.stages.events import seasonal_deviation

    US_DAY = 86_400_000_000
    split = 14 * US_DAY
    counts = {}
    for d in range(14):
        if d % 7 == 6:
            continue
        counts[d] = 10 if d % 2 == 0 else 5
    cur_counts = {14: 30, 15: 5, 20: 99}  # 20 has dow 6: skipped, still in C
    rows = []
    for d, n in {**counts, **cur_counts}.items():
        rows += [("X", d * US_DAY + i) for i in range(n)]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
    )
    got = seasonal_deviation(events, split_us=split, num_parts=4).to_pandas()

    rd = {}
    for d, n in counts.items():
        rd[d % 7] = rd.get(d % 7, 0) + n
    R = sum(counts.values())
    C = sum(cur_counts.values())
    want = []
    for d, n in cur_counts.items():
        r = rd.get(d % 7, 0)
        if r == 0:
            continue
        want.append(("X", d, n, (abs(n * R - C * r) * 1000) // (C * r)))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got.to_numpy().tolist() == [list(r) for r in want]
    assert 20 not in got["day"].tolist()  # dow-6 day skipped (r == 0)
    assert len(got) == 2


def test_gap_slo_vs_sorted_reference():
    """Exact discrete percentile selection vs a plain sorted reference,
    including ties, a type with a single gap, and rank formula edges."""
    from sbustreamspot_core_ray.stages.events import gap_slo

    rows = []
    # type A: 101 events with gaps 1..100 shuffled deterministically
    gaps = [((i * 37) % 100) + 1 for i in range(100)]
    t = 0
    rows.append(("A", 1_000, t))
    for i, g in enumerate(gaps):
        t += g
        rows.append(("A", 1_001 + i, t))
    # type B: two events -> one gap
    rows += [("B", 2_000, 10), ("B", 2_001, 510)]
    events = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            }
        )
    )
    got = gap_slo(events, pcts=(50, 95, 99), num_parts=4).to_pandas()
    sa = sorted(gaps)
    for q in (50, 95, 99):
        want = sa[((len(sa) - 1) * q) // 100]
        row = got[(got["event_type"] == "A") & (got["pct"] == q)]
        assert int(row["gap_us"].iloc[0]) == want
    for q in (50, 95, 99):
        row = got[(got["event_type"] == "B") & (got["pct"] == q)]
        assert int(row["gap_us"].iloc[0]) == 500
    assert len(got) == 6
