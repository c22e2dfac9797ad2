"""F3 parity: incremental chunk-delta sketches == batch recompute — the
reference's own conformance oracle (`graph.cpp:346-363`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.sources.edges import (
    EDGE_SCHEMA,
    streamspot_fixture_table,
)
from sbustreamspot_core_ray.stages.incremental import IncrementalSketcher
from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
from sbustreamspot_core_ray.stages.sketch import construct_streamhash_sketches


def _batch_sketches(table: pa.Table, c: int) -> dict[int, np.ndarray]:
    ds = ray.data.from_arrow(table)
    sk = construct_streamhash_sketches(
        construct_shingle_vectors(ds, c), c
    ).to_pandas()
    return {
        int(g): np.asarray(p, np.int64)
        for g, p in zip(sk["gid"], sk["projection"])
    }


def _incremental_sketches(
    table: pa.Table, c: int, feed_sizes: list[int], num_parts: int = 2
) -> dict[int, np.ndarray]:
    inc = IncrementalSketcher(num_parts, c)
    lo = 0
    for sz in feed_sizes:
        inc.feed(table.slice(lo, sz))
        lo += sz
    assert lo == table.num_rows
    out = inc.sketches().to_pandas()
    return {
        int(g): np.asarray(p, np.int64)
        for g, p in zip(out["gid"], out["projection"])
    }


def _assert_equal(a: dict, b: dict):
    assert set(a) == set(b)
    for g in a:
        assert (a[g] == b[g]).all(), f"gid {g} projection mismatch"


def test_incremental_equals_batch_on_fixture():
    t = streamspot_fixture_table()
    for c in (4, 5, 10):
        batch = _batch_sketches(t, c)
        for feeds in ([12], [1] * 12, [5, 4, 3]):
            inc = _incremental_sketches(t, c, feeds)
            _assert_equal(inc, batch)


def _random_stream(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, 20, n)
    return pa.table(
        {
            "src": src.astype(np.int64),
            "dst": rng.integers(0, 50, n).astype(np.int64),
            "src_type": rng.integers(97, 103, n).astype(np.uint8),
            "dst_type": rng.integers(97, 103, n).astype(np.uint8),
            "e_type": rng.integers(112, 117, n).astype(np.uint8),
            "gid": (src % 5).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
        },
        schema=EDGE_SCHEMA,
    )


def test_incremental_equals_batch_on_random_stream():
    """Caveat: src_type per (gid, src) must be consistent for the batch
    recompute's (src, src_type) run grouping — regenerate with a
    deterministic src_type per src."""
    t = _random_stream(400, seed=23)
    stype = (97 + (t["src"].to_numpy() % 5)).astype(np.uint8)
    t = t.set_column(2, "src_type", pa.array(stype, pa.uint8()))
    for c in (4, 7):
        batch = _batch_sketches(t, c)
        inc = _incremental_sketches(t, c, [100, 150, 150], num_parts=3)
        _assert_equal(inc, batch)
