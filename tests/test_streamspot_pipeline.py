"""Bootstrap + windowed scoring pipeline tests (SURVEY.md §3.1/§3.2).

Uses the reference's 12-edge fixture: train gids {0,1} (2 bootstrap
clusters), test gids {2,3} streamed. Graph 2 is edge-identical to graph 1,
so it must join cluster 1 with ~zero distance; windowed eviction must equal
batch recompute of the final window (FIXTURES.md §5 properties)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from sbustreamspot_core_ray.pipelines.streamspot import (
    ANOMALY,
    UNSEEN,
    bootstrap_pipeline,
    score_stream,
    sketch_dataset_to_numpy,
)
from sbustreamspot_core_ray.sources.bootstrap import fixture_bootstrap
from sbustreamspot_core_ray.sources.edges import streamspot_fixture_edges
from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
from sbustreamspot_core_ray.stages.sketch import construct_streamhash_sketches

C = 10


def split_fixture():
    ds = streamspot_fixture_edges()
    train = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["gid"], 1)), batch_format="pyarrow"
    )
    test = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["gid"], 2)), batch_format="pyarrow"
    )
    return train, test


def test_bootstrap_state():
    train, _ = split_fixture()
    state = bootstrap_pipeline(train, fixture_bootstrap(), C)
    assert set(state.projections) == {0, 1}
    assert state.cluster_map == {0: 0, 1: 1}
    # single-member clusters: centroid == member projection -> distance 0
    assert state.anomaly_scores[0] == 0.0
    assert state.anomaly_scores[1] == 0.0
    # centroid sketch equals the member's sketch
    assert (state.centroid_sketch[1] == state.sketches[1]).all()


def test_score_stream_assigns_identical_graph():
    train, test = split_fixture()
    state = bootstrap_pipeline(train, fixture_bootstrap(), C)
    snaps = score_stream(state, test, C, interval=100)
    last = snaps[snaps["interval"] == snaps["interval"].max()]
    row2 = last[last["gid"] == 2].iloc[0]
    # graph 2 == graph 1 -> joins cluster 1 at distance ~0
    assert row2["cluster_id"] == 1
    assert row2["anomaly_score"] < 1e-9
    # all four gids reported each snapshot, sentinels respected
    assert set(last["gid"]) == {0, 1, 2, 3}
    assert set(last["cluster_id"]) <= {0, 1, ANOMALY, UNSEEN}


def test_stream_reads_edges_once():
    """Scale property: score_stream consumes the edge table in ONE pass
    (one sort + one iter_batches) — with 20 windows, each edge row passes
    the read stage exactly once, never once per window."""
    import ray

    train, _ = split_fixture()
    state = bootstrap_pipeline(train, fixture_bootstrap(), C)

    n = 40
    stream = pa.table(
        {
            "src": pa.array([4] * n, pa.int64()),
            "dst": pa.array(list(range(100, 100 + n)), pa.int64()),
            "src_type": pa.array([ord("a")] * n, pa.uint8()),
            "dst_type": pa.array([ord("b")] * n, pa.uint8()),
            "e_type": pa.array([ord("t")] * n, pa.uint8()),
            "gid": pa.array([2] * n, pa.int64()),
            "seq": pa.array(list(range(n)), pa.int64()),
        }
    )

    @ray.remote(num_cpus=0)
    class Counter:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def get(self):
            return self.n

    counter = Counter.remote()

    def count(t: pa.Table) -> pa.Table:
        ray.get(counter.add.remote(t.num_rows))
        return t

    ds = ray.data.from_arrow(stream).map_batches(count, batch_format="pyarrow")
    snaps = score_stream(state, ds, C, interval=2)
    assert snaps["interval"].nunique() == n // 2  # 20 windows emitted
    assert ray.get(counter.get.remote()) == n  # every edge read exactly once


def test_windowed_eviction_equals_batch_recompute(tmp_path):
    """W1 property: streaming N windows with a max_edges cache equals one
    batch recompute over the last max_edges window."""
    train, test = split_fixture()
    state = bootstrap_pipeline(train, fixture_bootstrap(), C)
    max_edges = 4
    snaps = score_stream(
        state, test, C, interval=2, max_edges=max_edges,
        snapshot_dir=str(tmp_path / "snaps"),
    )
    # direct recompute over the final active window (same window arithmetic
    # as score_stream: windows of `interval` starting at the min test seq)
    tbl = streamspot_fixture_edges().take_all()
    seqs = [r["seq"] for r in tbl if r["gid"] >= 2]
    lo, hi = min(seqs), max(seqs)
    interval = 2
    n_windows = (hi - lo) // interval + 1
    w_end = lo + n_windows * interval - 1
    active = [
        r for r in tbl if r["gid"] >= 2 and w_end - max_edges + 1 <= r["seq"] <= w_end
    ]
    act_ds = ray.data.from_arrow(
        pa.Table.from_pylist(active, schema=streamspot_fixture_edges().schema().base_schema)
    )
    sk = construct_streamhash_sketches(
        construct_shingle_vectors(act_ds, C), C
    )
    gids, proj, sketches = sketch_dataset_to_numpy(sk)
    seen = set()
    for i, g in enumerate(gids):
        seen.add(int(g))
        assert (state.projections[int(g)] == proj[i]).all(), g
        assert (state.sketches[int(g)] == sketches[i]).all(), g
    # test gids fully evicted by the final window -> zero projection
    for g in {2, 3} - seen:
        assert (state.projections[g] == 0).all(), g
    # snapshots wrote one parquet per interval
    import glob

    assert len(glob.glob(str(tmp_path / "snaps" / "interval=*/snapshot.parquet"))) == \
        snaps["interval"].nunique()


def test_score_stream_checkpoint_resume(tmp_path):
    """North-rule resumability for the scoring path: a run cut off after
    two windows, then resumed from the on-disk checkpoint with the full
    stream, must end in exactly the state an uninterrupted run reaches."""
    import pyarrow.parquet as pq

    train, test = split_fixture()

    # uninterrupted reference
    s_full = bootstrap_pipeline(train, fixture_bootstrap(), C)
    full = score_stream(
        s_full, test, C, interval=2, snapshot_dir=str(tmp_path / "full")
    )

    # "crashed" run: stream truncated at the window-1 boundary (seq <= 8)
    import pyarrow.compute as pc_

    part1 = test.map_batches(
        lambda t: t.filter(pc_.less_equal(t["seq"], 8)), batch_format="pyarrow"
    )
    s_a = bootstrap_pipeline(train, fixture_bootstrap(), C)
    score_stream(s_a, part1, C, interval=2, snapshot_dir=str(tmp_path / "r"))

    # restart from scratch: fresh state + resume=True picks up the ckpt
    s_b = bootstrap_pipeline(train, fixture_bootstrap(), C)
    rest = score_stream(
        s_b, test, C, interval=2, snapshot_dir=str(tmp_path / "r"), resume=True
    )
    assert rest["interval"].min() == 2  # windows 0-1 not re-scored

    last_full = full[full["interval"] == full["interval"].max()].reset_index(drop=True)
    last_rest = rest[rest["interval"] == rest["interval"].max()].reset_index(drop=True)
    assert last_full.equals(last_rest)
    # the on-disk interval snapshots cover every window across both runs
    import glob

    snaps = sorted(glob.glob(str(tmp_path / "r" / "interval=*/snapshot.parquet")))
    assert len(snaps) == full["interval"].nunique()
    # and the final written snapshot equals the reference's final one
    a = pq.read_table(snaps[-1]).to_pandas()
    assert a.equals(last_full)
