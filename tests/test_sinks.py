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
