"""The StreamSpot scoring pipelines re-expressed as windowed dataflow.

Reference lifecycle (SURVEY.md §3):
- §3.1 bootstrap: shingles → sketches → per-cluster centroids (C5,
  `cluster.cpp:76-101`) → initial anomaly scores (C7, `main.cpp:277-283`).
- §3.2 online loop: per edge, update graph + sketch, then
  `update_distances_and_clusters` (C6, `cluster.cpp:103-298`) and a snapshot
  of all scores/assignments every CLUSTER_UPDATE_INTERVAL=10,000 edges (S3).

Ours is the **mini-batch re-expression** (SURVEY.md C6 row, §7.4):

- the stream is consumed window-by-window (window id = seq //
  interval — W3); within a window, touched graphs' shingle vectors and
  sketches are **batch-recomputed** from the active edge set. The reference
  itself asserts incremental == batch recompute (`graph.cpp:346-363`), so
  this is semantics-preserving for the sketches.
- the sliding edge cache (W1, `--max-num-edges`) becomes a `seq`-window
  predicate: a graph's active edges are those with
  ``seq > window_end - max_edges`` — eviction by recompute, not mutation.
- C6's per-edge running-mean centroid updates become a per-window exact
  recompute: assign/flag each touched graph against the broadcast
  centroids, then recompute each centroid as the exact mean of its current
  members' projections (order-free). **Documented semantic delta**: the
  reference nudges centroids per edge; ours moves them per window. Both
  emit outputs only at interval boundaries (`main.cpp:478-490`), where the
  two coincide on stable streams.

Scale shape: per window = one shingle/sketch recompute over the active
edges (groupby(gid) shuffle) + one broadcast distance `map_batches` + one
small centroid aggregation. Cluster state (centroids, assignment map,
scores) is O(#clusters·L + #gids) — kept on the driver and broadcast, with
per-window parquet snapshots as checkpoint/lineage (S3 doubles as resume).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.hashing import L
from ..sources.bootstrap import BootstrapClusters
from ..stages.shingle import construct_shingle_vectors
from ..stages.sketch import (
    construct_streamhash_sketches,
    pack_sketch,
    streamhash_similarity_np,
)

ANOMALY = -1  # reference cluster.h:18
UNSEEN = -2  # reference cluster.h:19


def _distance_matrix(sketches: np.ndarray, centroid_sketches: np.ndarray, l: int) -> np.ndarray:
    """d = 1 - cos(pi * (1 - bit_agreement)) for every (graph, centroid)."""
    n, c = len(sketches), len(centroid_sketches)
    out = np.empty((n, c))
    for j in range(c):
        sim = streamhash_similarity_np(sketches, centroid_sketches[j][None, :], l)
        out[:, j] = 1.0 - np.cos(np.pi * (1.0 - sim))
    return out


def sketch_dataset_to_numpy(sk: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(gids, projections (n,L) int64, packed sketches (n,L/8) uint8)."""
    df = sk.to_pandas()
    gids = df["gid"].to_numpy(np.int64)
    proj = np.stack([np.asarray(p, np.int64) for p in df["projection"]]) if len(df) else np.zeros((0, L), np.int64)
    sketches = (
        np.stack([np.frombuffer(b, np.uint8) for b in df["sketch"]])
        if len(df)
        else np.zeros((0, L // 8), np.uint8)
    )
    return gids, proj, sketches


class StreamSpotState:
    """Driver-held cluster state: O(#clusters * L + #gids). Snapshotted per
    window; reconstructable from the last snapshot (resume path)."""

    def __init__(self, bootstrap: BootstrapClusters, l: int = L):
        self.l = l
        self.bootstrap = bootstrap
        self.nclusters = bootstrap.nclusters
        self.centroid_proj = np.zeros((self.nclusters, l))
        self.centroid_sketch = np.zeros((self.nclusters, l // 8), np.uint8)
        self.cluster_map: dict[int, int] = dict(bootstrap.cluster_map)
        self.anomaly_scores: dict[int, float] = {}
        self.projections: dict[int, np.ndarray] = {}  # latest per-gid proj
        self.sketches: dict[int, np.ndarray] = {}

    def recompute_centroids(self) -> None:
        """C5/C6 centroid refresh: exact mean of member projections."""
        sums = np.zeros((self.nclusters, self.l))
        counts = np.zeros(self.nclusters, np.int64)
        for gid, c in self.cluster_map.items():
            if c >= 0 and gid in self.projections:
                sums[c] += self.projections[gid]
                counts[c] += 1
        for c in range(self.nclusters):
            if counts[c]:
                self.centroid_proj[c] = sums[c] / counts[c]
            self.centroid_sketch[c] = pack_sketch(self.centroid_proj[c])

    def snapshot_table(self, interval: int) -> pa.Table:
        gids = sorted(set(self.cluster_map) | set(self.anomaly_scores))
        return pa.table(
            {
                "interval": pa.array([interval] * len(gids), pa.int32()),
                "gid": pa.array(gids, pa.int64()),
                "anomaly_score": pa.array(
                    [self.anomaly_scores.get(g, float(UNSEEN)) for g in gids],
                    pa.float64(),
                ),
                "cluster_id": pa.array(
                    [self.cluster_map.get(g, UNSEEN) for g in gids], pa.int32()
                ),
            }
        )


def bootstrap_pipeline(
    train_edges: ray.data.Dataset,
    bootstrap: BootstrapClusters,
    chunk_length: int,
    l: int = L,
    seed: int = 23,
) -> StreamSpotState:
    """§3.1: shingles → sketches → centroids → initial member scores.

    Entirely stateless tasks + groupby shuffles; the resulting cluster
    state is tiny and lives on the driver (broadcast to scoring tasks).
    """
    shingles = construct_shingle_vectors(train_edges, chunk_length)
    sk = construct_streamhash_sketches(shingles, chunk_length, l=l, seed=seed)
    gids, proj, sketches = sketch_dataset_to_numpy(sk)

    state = StreamSpotState(bootstrap, l=l)
    for i, g in enumerate(gids):
        state.projections[int(g)] = proj[i]
        state.sketches[int(g)] = sketches[i]
    state.recompute_centroids()

    # C7: initial anomaly score = distance to own cluster centroid
    for g in bootstrap.train_gids:
        c = state.cluster_map[g]
        if g in state.sketches:
            sim = streamhash_similarity_np(
                state.sketches[g][None, :], state.centroid_sketch[c][None, :], l
            )[0]
            state.anomaly_scores[g] = float(1.0 - np.cos(np.pi * (1.0 - sim)))
    return state


def score_stream(
    state: StreamSpotState,
    test_edges: ray.data.Dataset,
    chunk_length: int,
    interval: int = 10_000,
    max_edges: int | None = None,
    snapshot_dir: str | None = None,
    l: int = L,
    seed: int = 23,
) -> pd.DataFrame:
    """§3.2 as windowed mini-batch scoring; returns the snapshot table
    (interval, gid, anomaly_score, cluster_id) over all intervals.

    The driver iterates windows; all heavy work per window is Ray dataflow:
    shingle/sketch recompute (groupby(gid)), distance scoring (broadcast
    centroids inside map_batches). max_edges implements W1 eviction as a
    seq-window predicate. Snapshots land in parquet per interval
    (checkpoint + lineage unit) when snapshot_dir is given.
    """
    bounds = test_edges.select_columns(["seq"]).materialize()
    if bounds.count() == 0:
        return state.snapshot_table(0).to_pandas()
    lo = bounds.min("seq")
    hi = bounds.max("seq")
    edges_mat = test_edges.materialize()

    snapshots: list[pa.Table] = []
    n_windows = (hi - lo) // interval + 1
    prev_active_lo = 0
    for w in range(n_windows):
        w_end = lo + (w + 1) * interval - 1
        w_lo = lo + w * interval
        active_lo = 0 if max_edges is None else max(0, w_end - max_edges + 1)

        # gids touched in this window, plus gids that LOST edges to the
        # sliding cache this window (the reference mutates the evicted
        # graph immediately, graph.cpp:39-78 — recompute them too)
        def in_window(t: pa.Table, w_lo=w_lo, w_end=w_end, e_lo=prev_active_lo,
                      e_hi=active_lo) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.and_(
                pc.greater_equal(t["seq"], pa.scalar(w_lo)),
                pc.less_equal(t["seq"], pa.scalar(w_end)),
            )
            if e_hi > e_lo:
                evict = pc.and_(
                    pc.greater_equal(t["seq"], pa.scalar(e_lo)),
                    pc.less(t["seq"], pa.scalar(e_hi)),
                )
                m = pc.or_(m, evict)
            return t.filter(m)

        touched = set(
            edges_mat.map_batches(in_window, batch_format="pyarrow")
            .select_columns(["gid"])
            .unique("gid")
        )
        prev_active_lo = active_lo
        if touched:
            # active edge set for touched graphs (W1 eviction by predicate)
            def active(t: pa.Table, g=tuple(sorted(touched)), alo=active_lo, wend=w_end) -> pa.Table:
                import pyarrow.compute as pc

                m = pc.and_(
                    pc.is_in(t["gid"], value_set=pa.array(g, pa.int64())),
                    pc.and_(
                        pc.greater_equal(t["seq"], pa.scalar(alo)),
                        pc.less_equal(t["seq"], pa.scalar(wend)),
                    ),
                )
                return t.filter(m)

            act = edges_mat.map_batches(active, batch_format="pyarrow")
            shingles = construct_shingle_vectors(act, chunk_length)
            sk = construct_streamhash_sketches(shingles, chunk_length, l=l, seed=seed)
            gids, proj, sketches = sketch_dataset_to_numpy(sk)
            # touched gids whose active edge set is now empty: empty graph ->
            # zero projection, all-ones sketch (projection >= 0 everywhere)
            emptied = touched - set(int(g) for g in gids)
            if emptied:
                zeros = np.zeros(l, np.int64)
                gids = np.concatenate([gids, np.fromiter(emptied, np.int64)])
                proj = np.concatenate([proj, np.tile(zeros, (len(emptied), 1))])
                sketches = np.concatenate(
                    [sketches, np.tile(pack_sketch(zeros), (len(emptied), 1))]
                )

            # C6 mini-batch: distances to broadcast centroids, vectorized
            dists = _distance_matrix(sketches, state.centroid_sketch, l)
            nearest = dists.argmin(axis=1)
            min_d = dists.min(axis=1)
            thr = np.minimum(
                state.bootstrap.global_threshold,
                np.asarray(state.bootstrap.cluster_thresholds)[nearest],
            )
            for i, g in enumerate(gids):
                g = int(g)
                state.projections[g] = proj[i]
                state.sketches[g] = sketches[i]
                state.anomaly_scores[g] = float(min_d[i])
                state.cluster_map[g] = (
                    ANOMALY if min_d[i] > thr[i] else int(nearest[i])
                )
            state.recompute_centroids()
            # refresh scores against the moved centroids (reference refreshes
            # the updated graph's score after every centroid move)
            for i, g in enumerate(gids):
                g = int(g)
                c = state.cluster_map[g]
                ref_sketch = (
                    state.centroid_sketch[c] if c >= 0 else state.centroid_sketch[nearest[i]]
                )
                sim = streamhash_similarity_np(
                    state.sketches[g][None, :], ref_sketch[None, :], l
                )[0]
                state.anomaly_scores[g] = float(1.0 - np.cos(np.pi * (1.0 - sim)))

        snap = state.snapshot_table(w)
        snapshots.append(snap)
        if snapshot_dir:
            d = os.path.join(snapshot_dir, f"interval={w}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, "snapshot.parquet")
            pq.write_table(snap, path + ".tmp")
            os.replace(path + ".tmp", path)

    return pa.concat_tables(snapshots).to_pandas()
