"""Resumable partitioned output: skip-finished semantics + round trip."""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.sources.sinks import (
    read_partitioned,
    write_partitioned_resumable,
)


def _ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "bucket": pa.array([0, 0, 1, 1, 2], pa.int64()),
                "x": pa.array([10, 11, 20, 21, 30], pa.int64()),
            }
        )
    )


def test_write_then_resume_skips_finished(tmp_path):
    root = str(tmp_path / "out")
    r1 = write_partitioned_resumable(_ds(), root, "bucket")
    assert r1["written"] == ["0", "1", "2"] and r1["skipped"] == []
    # simulate a partial failure: partition 1 lost its marker
    os.remove(os.path.join(root, "bucket=1", "_SUCCESS"))
    r2 = write_partitioned_resumable(_ds(), root, "bucket")
    assert r2["written"] == ["1"]
    assert r2["skipped"] == ["0", "2"]
    back = read_partitioned(root).to_pandas().sort_values("x")
    assert back["x"].tolist() == [10, 11, 20, 21, 30]
    assert os.path.exists(os.path.join(root, "_MANIFEST.json"))


def test_stage_metrics_table_and_write(tmp_path):
    """S4: per-stage counters table (reference main.cpp:433-465 analog)."""
    from sbustreamspot_core_ray.functions.metrics import StageMetrics

    m = StageMetrics()
    with m.stage("graph_sketch_update", units=100):
        pass
    m.add("cluster_update", 10, 0.5)
    t = m.table().to_pandas().set_index("stage")
    assert t.loc["cluster_update", "units"] == 10
    assert abs(t.loc["cluster_update", "mean_us_per_unit"] - 50_000) < 1e-6
    assert t.loc["graph_sketch_update", "calls"] == 1
    path = m.write(str(tmp_path))
    import pyarrow.parquet as pq

    assert pq.read_table(path).num_rows == 2


def test_score_stream_writes_metrics(tmp_path):
    """The windowed scorer writes _METRICS.parquet beside the snapshots."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.pipelines.streamspot import (
        bootstrap_pipeline,
        score_stream,
    )
    from sbustreamspot_core_ray.sources.bootstrap import fixture_bootstrap
    from sbustreamspot_core_ray.sources.edges import streamspot_fixture_edges

    ds = streamspot_fixture_edges()
    train = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["gid"], 1)), batch_format="pyarrow"
    )
    test = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["gid"], 2)), batch_format="pyarrow"
    )
    state = bootstrap_pipeline(train, fixture_bootstrap(), 10)
    score_stream(state, test, 10, interval=4, snapshot_dir=str(tmp_path / "s"))
    mt = pq.read_table(str(tmp_path / "s" / "_METRICS.parquet")).to_pandas()
    stages = set(mt["stage"])
    assert {"graph_sketch_update", "cluster_update"} <= stages
    row = mt.set_index("stage").loc["graph_sketch_update"]
    assert row["units"] == 7  # all streamed test edges counted once
