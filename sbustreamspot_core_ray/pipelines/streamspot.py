"""The StreamSpot scoring pipelines re-expressed as windowed dataflow.

Reference lifecycle (SURVEY.md §3):
- §3.1 bootstrap: shingles → sketches → per-cluster centroids (C5,
  `cluster.cpp:76-101`) → initial anomaly scores (C7, `main.cpp:277-283`).
- §3.2 online loop: per edge, update graph + sketch, then
  `update_distances_and_clusters` (C6, `cluster.cpp:103-298`) and a snapshot
  of all scores/assignments every CLUSTER_UPDATE_INTERVAL=10,000 edges (S3).

Ours is the **mini-batch re-expression** (SURVEY.md C6 row, §7.4):

- the stream is sorted by `seq` ONCE (one shuffle) and consumed in a single
  `iter_batches` pass; window boundaries (W3: window id = seq // interval)
  are contiguous runs of the sorted stream, so no window ever re-reads the
  edge table.
- per-gid sketch state (the L-sized projections and packed sketches) lives
  in the hash(gid)-partitioned `IncrementalSketchShard` actor pool
  (stages/incremental.py), which applies the reference's chunk-delta rules
  per batch and per-source delta-eviction for the sliding cache (W1,
  `--max-num-edges` as a `seq >= window_end - max_edges + 1` predicate).
  The driver holds only O(#clusters·L) centroid state plus scalar per-gid
  outputs (cluster id, anomaly score) — never per-gid vectors.
- C6's per-edge running-mean centroid updates become per-window exact
  means, maintained incrementally as INTEGER projection sums per cluster:
  when a touched graph changes projection or membership, its old int64
  projection is subtracted and its new one added — bit-identical to a full
  recompute because the sums are exact. **Documented semantic delta**: the
  reference nudges centroids per edge; ours moves them per window. Both
  emit outputs only at interval boundaries (`main.cpp:478-490`), where the
  two coincide on stable streams.

Scale shape: one sort shuffle up front, then per window: one routed
actor-pool delta batch + one O(touched × clusters) distance kernel on the
driver + an O(touched) centroid-sum update. Snapshots land as per-interval
parquet (S3 doubles as checkpoint/lineage for resume).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..functions.hashing import L
from ..sources.bootstrap import BootstrapClusters
from ..stages.incremental import IncrementalSketcher
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
    """Driver-held cluster state: O(#clusters * L) centroid vectors plus
    scalar per-gid outputs (cluster id, anomaly score). Per-gid L-vectors
    live in the actor pool (`self.pool`); the bounded bootstrap set's
    vectors are kept for centroid-delta bookkeeping and inspection."""

    def __init__(self, bootstrap: BootstrapClusters, l: int = L):
        self.l = l
        self.bootstrap = bootstrap
        self.nclusters = bootstrap.nclusters
        # exact integer projection sums per cluster -> float centroids
        self.centroid_sums = np.zeros((self.nclusters, l), np.int64)
        self.centroid_counts = np.zeros(self.nclusters, np.int64)
        self.centroid_proj = np.zeros((self.nclusters, l))
        self.centroid_sketch = np.zeros((self.nclusters, l // 8), np.uint8)
        self.cluster_map: dict[int, int] = dict(bootstrap.cluster_map)
        self.anomaly_scores: dict[int, float] = {}
        # bounded: bootstrap (training) gids only
        self._train_proj: dict[int, np.ndarray] = {}
        self._train_sketch: dict[int, np.ndarray] = {}
        self._boot_consumed: set[int] = set()
        self.pool: IncrementalSketcher | None = None

    # -- centroid maintenance ------------------------------------------------

    def _refresh_centroids(self) -> None:
        for c in range(self.nclusters):
            if self.centroid_counts[c]:
                self.centroid_proj[c] = self.centroid_sums[c] / self.centroid_counts[c]
            self.centroid_sketch[c] = pack_sketch(self.centroid_proj[c])

    def _old_contribution(self, gid: int, pool_old: np.ndarray) -> np.ndarray:
        """The projection this gid last contributed to a centroid sum: its
        bootstrap vector until first re-touch, the pool's window-start
        vector afterwards."""
        if gid in self._train_proj and gid not in self._boot_consumed:
            self._boot_consumed.add(gid)
            return self._train_proj[gid]
        return pool_old

    # -- inspection views (tests / small graphs; NOT the scale path) --------

    @property
    def projections(self) -> dict[int, np.ndarray]:
        out = dict(self._train_proj)
        if self.pool is not None:
            df = self.pool.sketches().to_pandas()
            for g, p in zip(df["gid"], df["projection"]):
                out[int(g)] = np.asarray(p, np.int64)
        return out

    @property
    def sketches(self) -> dict[int, np.ndarray]:
        out = dict(self._train_sketch)
        if self.pool is not None:
            df = self.pool.sketches().to_pandas()
            for g, b in zip(df["gid"], df["sketch"]):
                out[int(g)] = np.frombuffer(b, np.uint8)
        return out

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
    state is tiny (the training set is the bounded bootstrap file) and the
    centroid sums live on the driver as exact integers.
    """
    shingles = construct_shingle_vectors(train_edges, chunk_length)
    sk = construct_streamhash_sketches(shingles, chunk_length, l=l, seed=seed)
    gids, proj, sketches = sketch_dataset_to_numpy(sk)

    state = StreamSpotState(bootstrap, l=l)
    state._chunk_length = chunk_length
    state._seed = seed
    for i, g in enumerate(gids):
        g = int(g)
        state._train_proj[g] = proj[i]
        state._train_sketch[g] = sketches[i]
        c = state.cluster_map.get(g, UNSEEN)
        if c >= 0:
            state.centroid_sums[c] += proj[i]
            state.centroid_counts[c] += 1
    state._refresh_centroids()

    # C7: initial anomaly score = distance to own cluster centroid
    for g in bootstrap.train_gids:
        c = state.cluster_map[g]
        if g in state._train_sketch:
            sim = streamhash_similarity_np(
                state._train_sketch[g][None, :], state.centroid_sketch[c][None, :], l
            )[0]
            state.anomaly_scores[g] = float(1.0 - np.cos(np.pi * (1.0 - sim)))
    return state


def _write_scoring_ckpt(snapshot_dir: str, state: StreamSpotState, w: int, lo: int) -> None:
    """Checkpoint the full scoring state (driver centroid sums/maps + every
    shard's sketch state) atomically beside the snapshots — W4's
    'actor-pool state checkpointed per window', the resume source."""
    import pickle

    d = os.path.join(snapshot_dir, "_STATE")
    os.makedirs(d, exist_ok=True)
    blob = pickle.dumps(
        {
            "w": w,
            "lo": lo,
            "centroid_sums": state.centroid_sums,
            "centroid_counts": state.centroid_counts,
            "cluster_map": state.cluster_map,
            "anomaly_scores": state.anomaly_scores,
            "train_proj": state._train_proj,
            "train_sketch": state._train_sketch,
            "boot_consumed": state._boot_consumed,
            "num_parts": state.pool.P,
            "shards": state.pool.dump_states(),
        }
    )
    tmp = os.path.join(d, "state.pkl.tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(d, "state.pkl"))


def _load_scoring_ckpt(
    snapshot_dir: str, state: StreamSpotState, chunk_length: int, l: int, seed: int
) -> tuple[int, int] | None:
    """Restore driver + shard state from the latest checkpoint; returns
    (last_completed_window, lo) or None when there is nothing to resume."""
    import pickle

    path = os.path.join(snapshot_dir, "_STATE", "state.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        st = pickle.load(f)
    state.centroid_sums = st["centroid_sums"]
    state.centroid_counts = st["centroid_counts"]
    state.cluster_map = st["cluster_map"]
    state.anomaly_scores = st["anomaly_scores"]
    state._train_proj = st["train_proj"]
    state._train_sketch = st["train_sketch"]
    state._boot_consumed = st["boot_consumed"]
    state._refresh_centroids()
    state.pool = IncrementalSketcher(st["num_parts"], chunk_length, l=l, seed=seed)
    state.pool.load_states(st["shards"])
    return int(st["w"]), int(st["lo"])


def score_stream(
    state: StreamSpotState,
    test_edges: ray.data.Dataset,
    chunk_length: int,
    interval: int = 10_000,
    max_edges: int | None = None,
    snapshot_dir: str | None = None,
    l: int = L,
    seed: int = 23,
    num_parts: int = 4,
    resume: bool = False,
    ckpt_every: int = 1,
) -> pd.DataFrame:
    """§3.2 as windowed mini-batch scoring; returns the snapshot table
    (interval, gid, anomaly_score, cluster_id) over all intervals.

    ONE sort by `seq` (windows become contiguous runs), ONE streaming pass:
    each window's edges are routed to the sketch actor pool (chunk-delta
    appends + delta-eviction for max_edges), the pool reports the touched
    gids' (old, new) projections and sketches, and the driver runs the C6
    mini-batch kernel: distances to broadcast centroids, assign/flag,
    exact integer centroid-sum update, score refresh. Snapshots land in
    parquet per interval (checkpoint + lineage unit) when snapshot_dir is
    given."""
    from ..functions.metrics import StageMetrics

    start_w = 0
    resumed_lo: int | None = None
    if resume and snapshot_dir:
        got = _load_scoring_ckpt(snapshot_dir, state, chunk_length, l, seed)
        if got is not None:
            last_w, resumed_lo = got
            start_w = last_w + 1
    if state.pool is None:
        state.pool = IncrementalSketcher(num_parts, chunk_length, l=l, seed=seed)
    pool = state.pool
    snapshots: list[pa.Table] = []
    # S4: the reference's four per-edge timers (graph update, shingle
    # construction, sketch update, cluster update; main.cpp:433-465) map to
    # these stages; written alongside the snapshots
    metrics = StageMetrics()
    state.metrics = metrics

    def close_window(w: int, lo: int) -> None:
        w_end = lo + (w + 1) * interval - 1
        if max_edges is not None:
            with metrics.stage("evict"):
                n_ev = pool.evict_before(max(0, w_end - max_edges + 1))
            metrics.add("evicted_edges", n_ev, 0.0)
        res = pool.window_result()
        if res.num_rows:
            gids = res["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
            proj = np.stack(
                [np.asarray(p, np.int64) for p in res["projection"].to_pylist()]
            )
            old_proj = np.stack(
                [np.asarray(p, np.int64) for p in res["old_projection"].to_pylist()]
            )
            sketches = np.stack(
                [np.frombuffer(b, np.uint8) for b in res["sketch"].to_pylist()]
            )
            # C6 mini-batch: distances to the window-start centroids
            t_cl = time.perf_counter()
            dists = _distance_matrix(sketches, state.centroid_sketch, l)
            nearest = dists.argmin(axis=1)
            min_d = dists.min(axis=1)
            thr = np.minimum(
                state.bootstrap.global_threshold,
                np.asarray(state.bootstrap.cluster_thresholds)[nearest],
            )
            for i, g in enumerate(gids):
                g = int(g)
                c_old = state.cluster_map.get(g, UNSEEN)
                if c_old >= 0:
                    state.centroid_sums[c_old] -= state._old_contribution(
                        g, old_proj[i]
                    )
                    state.centroid_counts[c_old] -= 1
                else:
                    state._old_contribution(g, old_proj[i])  # mark consumed
                c_new = ANOMALY if min_d[i] > thr[i] else int(nearest[i])
                if c_new >= 0:
                    state.centroid_sums[c_new] += proj[i]
                    state.centroid_counts[c_new] += 1
                state.cluster_map[g] = c_new
                state.anomaly_scores[g] = float(min_d[i])
            state._refresh_centroids()
            # refresh scores against the moved centroids (reference refreshes
            # the updated graph's score after every centroid move)
            for i, g in enumerate(gids):
                g = int(g)
                c = state.cluster_map[g]
                ref_sketch = (
                    state.centroid_sketch[c]
                    if c >= 0
                    else state.centroid_sketch[nearest[i]]
                )
                sim = streamhash_similarity_np(
                    sketches[i][None, :], ref_sketch[None, :], l
                )[0]
                state.anomaly_scores[g] = float(1.0 - np.cos(np.pi * (1.0 - sim)))
            metrics.add("cluster_update", len(gids), time.perf_counter() - t_cl)
        snap = state.snapshot_table(w)
        snapshots.append(snap)
        if snapshot_dir:
            d = os.path.join(snapshot_dir, f"interval={w}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, "snapshot.parquet")
            pq.write_table(snap, path + ".tmp")
            os.replace(path + ".tmp", path)
            if w % ckpt_every == 0:
                _write_scoring_ckpt(snapshot_dir, state, w, lo)

    # one shuffle; windows are contiguous runs of the sorted stream
    stream = test_edges.sort("seq")
    lo: int | None = resumed_lo
    w = start_w
    for batch in stream.iter_batches(batch_format="pyarrow", batch_size=8192):
        if batch.num_rows == 0:
            continue
        seqs = batch["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        if lo is None:
            lo = int(seqs[0])
        wid = (seqs - lo) // interval
        if start_w:  # resumed: windows before start_w were already scored
            keep = wid >= start_w
            if not keep.any():
                continue
            batch = batch.filter(pa.array(keep))
            wid = wid[keep]
        for u in np.unique(wid):
            u = int(u)
            while w < u:  # close finished windows (empty ones still evict)
                close_window(w, lo)
                w += 1
            part = batch.filter(pa.array(wid == u))
            # graph update + shingle construction + sketch update happen
            # together inside the chunk-delta actors (one routed push)
            with metrics.stage("graph_sketch_update", units=part.num_rows):
                pool.feed(part)
    if lo is None:
        return state.snapshot_table(0).to_pandas()
    close_window(w, lo)
    if snapshot_dir:
        metrics.write(snapshot_dir)
    return pa.concat_tables(snapshots).to_pandas()
