"""Resumable partitioned Parquet output.

The brief's output contract: write one directory per partition (key range /
input shard), never one giant file, so a failed run skips finished
partitions on restart. Layout::

    root/<col>=<value>/part.parquet      (written atomically via .tmp)
    root/<col>=<value>/_SUCCESS          (completion marker)
    root/_MANIFEST.json                  (partition list + row counts)

`write_partitioned_resumable` is idempotent: partitions whose _SUCCESS
marker exists are skipped entirely (their upstream work is still computed
by Ray unless the caller prunes, but no output is rewritten — rerun cost
is read-side only). The same layout backs the superstep checkpoints
(`state/csr.py` / `ShardedGraph.checkpoint`) and the StreamSpot interval
snapshots (`pipelines/streamspot.score_stream`).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def write_partitioned_resumable(
    ds: ray.data.Dataset, root: str, partition_col: str
) -> dict:
    """Write `ds` under root/<partition_col>=<value>/, skipping partitions
    already marked complete. Returns {"written": [...], "skipped": [...]}.

    The shuffle is one groupby on the partition column; each partition is
    written by the task that owns its group (parallel, no driver data)."""
    os.makedirs(root, exist_ok=True)

    def write_one(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"value": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64()),
                 "skipped": pa.array([], pa.bool_())}
            )
        val = str(t[partition_col][0].as_py())
        d = os.path.join(root, f"{partition_col}={val}")
        marker = os.path.join(d, "_SUCCESS")
        if os.path.exists(marker):
            return pa.table(
                {"value": [val], "rows": pa.array([t.num_rows], pa.int64()),
                 "skipped": [True]}
            )
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part.parquet")
        pq.write_table(t, path + ".tmp")
        os.replace(path + ".tmp", path)  # atomic
        with open(marker, "w") as f:
            f.write("")
        return pa.table(
            {"value": [val], "rows": pa.array([t.num_rows], pa.int64()),
             "skipped": [False]}
        )

    report = (
        ds.groupby(partition_col)
        .map_groups(write_one, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = {
        "partition_col": partition_col,
        "partitions": {
            str(r.value): int(r.rows) for r in report.itertuples()
        },
    }
    tmp = os.path.join(root, "_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, "_MANIFEST.json"))
    return {
        "written": sorted(report[~report.skipped]["value"]),
        "skipped": sorted(report[report.skipped]["value"]),
    }


def read_partitioned(root: str) -> ray.data.Dataset:
    """Read back a resumable layout (only completed partitions)."""
    dirs = [
        os.path.join(root, d, "part.parquet")
        for d in sorted(os.listdir(root))
        if "=" in d and os.path.exists(os.path.join(root, d, "_SUCCESS"))
    ]
    return ray.data.read_parquet(dirs)
