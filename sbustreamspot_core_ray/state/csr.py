"""CSR graph shards: the stateful actor pool backing the superstep engine.

Per BASELINE.json north_star: "Edges are hash-partitioned into CSR shards
held by a stateful actor pool, with each superstep expressed as map_batches
gather-scatter over zero-copy Arrow batches followed by a groupby-aggregate
shuffle to combine per-vertex contributions."

A raw Ray actor is justified here (and only here) because the CSR shard is a
shared *mutable-state* index reused across supersteps — the one semantics
the Dataset API can't express (SURVEY.md §7.1). All heavy data enters and
leaves the actor as Arrow/numpy (zero-copy through the object store).

Partitioning contract:
- edge (src, dst) lives in shard ``part(src)`` (plus the reverse edge in
  shard ``part(dst)`` when the graph is symmetrized);
- vertex v is *owned* by shard ``part(v)``; owned vertices are registered
  via a second streaming pass over dst ids so dst-only vertices are known.
- partition count P is fixed per run (scaling runs vary CPUs, not P), so
  layouts are comparable and checkpoints line up across cluster sizes.

Fault tolerance: shard state is rebuilt from the edge dataset (lineage) or
from per-partition parquet checkpoints written by the engine
(``pipelines/checkpoint.py``); actors themselves are disposable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import part_of


@ray.remote(num_cpus=0)
class CsrShard:
    """One hash partition of the graph + the vertex state it owns."""

    def __init__(self, part: int, num_parts: int):
        self.part = part
        self.P = num_parts
        self._src_chunks: list[np.ndarray] = []
        self._dst_chunks: list[np.ndarray] = []
        self._vtx_chunks: list[np.ndarray] = []
        # built by finalize():
        self.srcs: np.ndarray | None = None  # unique local src ids, sorted
        self.indptr: np.ndarray | None = None
        self.dsts: np.ndarray | None = None  # adjacency targets, CSR order
        self.outdeg: np.ndarray | None = None  # per unique src
        self.owned: np.ndarray | None = None  # owned vertex ids, sorted
        self.dst_u: np.ndarray | None = None  # unique dst ids (scatter combine)
        self.dst_inv: np.ndarray | None = None  # edge → dst_u index
        self.dst_part: np.ndarray | None = None  # part(dst_u)
        # per-algorithm vertex state (aligned with self.owned):
        self.rank: np.ndarray | None = None
        self.label: np.ndarray | None = None
        self.changed: np.ndarray | None = None
        self.src_in_owned: np.ndarray | None = None  # srcs → index into owned

    # ---- build ----------------------------------------------------------

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_chunks.append(np.asarray(src, np.int64))
        self._dst_chunks.append(np.asarray(dst, np.int64))
        return len(src)

    def add_vertices(self, vtx: np.ndarray) -> int:
        self._vtx_chunks.append(np.asarray(vtx, np.int64))
        return len(vtx)

    def finalize(self) -> dict:
        """Dedup + sort into CSR. Idempotent: retried pushes collapse in
        the unique() (the duplicate-on-task-retry guard)."""
        if self._src_chunks:
            src = np.concatenate(self._src_chunks)
            dst = np.concatenate(self._dst_chunks)
            pairs = np.stack([src, dst], axis=1)
            pairs = np.unique(pairs, axis=0)  # sorts by (src, dst) + dedups
            src, dst = pairs[:, 0], pairs[:, 1]
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
        self._src_chunks = self._dst_chunks = None  # type: ignore
        self.srcs, counts = np.unique(src, return_counts=True)
        self.outdeg = counts.astype(np.int64)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.dsts = dst
        vown = np.concatenate(self._vtx_chunks) if self._vtx_chunks else np.empty(0, np.int64)
        self._vtx_chunks = None  # type: ignore
        self.owned = np.unique(np.concatenate([self.srcs, vown]))
        self.dst_u, self.dst_inv = np.unique(dst, return_inverse=True)
        self.dst_part = part_of(self.dst_u, self.P)
        self.src_in_owned = np.searchsorted(self.owned, self.srcs)
        # per-destination-partition index lists for the direct exchange
        order = np.argsort(self.dst_part, kind="stable")
        bounds = np.searchsorted(self.dst_part[order], np.arange(self.P + 1))
        self.dst_by_part = [
            order[bounds[p] : bounds[p + 1]] for p in range(self.P)
        ]
        self.has_out = np.isin(self.owned, self.srcs, assume_unique=True)
        return {"part": self.part, "edges": len(dst), "owned": len(self.owned)}

    def num_owned(self) -> int:
        return int(len(self.owned))

    def owned_vertices(self) -> np.ndarray:
        return self.owned

    # ---- generic state access ------------------------------------------

    def _rank_per_edge(self, values: np.ndarray) -> np.ndarray:
        """Expand per-unique-src values to per-edge (CSR repeat)."""
        return np.repeat(values, self.outdeg)

    def state_table(self, col: str) -> pa.Table:
        state = self.rank if col == "rank" else self.label
        return pa.table({"vertex": self.owned, col: state})

    def load_state(self, col: str, vertex: np.ndarray, values: np.ndarray) -> int:
        """Restore vertex state from a checkpoint (resume path)."""
        idx = np.searchsorted(self.owned, vertex)
        arr = np.asarray(values)
        target = np.empty(len(self.owned), arr.dtype)
        target[idx] = arr
        if col == "rank":
            self.rank = target.astype(np.float64)
        else:
            self.label = target.astype(np.int64)
            self.changed = np.ones(len(self.owned), bool)
        return len(vertex)

    # ---- PageRank -------------------------------------------------------

    def pagerank_init(self, n_total: int) -> None:
        self.n_total = n_total
        self.rank = np.full(len(self.owned), 1.0 / n_total)

    def set_n_total(self, n_total: int) -> None:
        self.n_total = n_total

    def pagerank_scatter(self, damping: float) -> pa.Table:
        """Gather-scatter: contributions rank*d/outdeg combined by dst.

        Returns (dpart, dst, contrib) with one row per distinct local dst —
        the partial/combiner half of the per-vertex aggregation.
        """
        src_rank = self.rank[self.src_in_owned]
        per_edge = self._rank_per_edge(src_rank / self.outdeg)
        sums = np.bincount(self.dst_inv, weights=per_edge, minlength=len(self.dst_u))
        return pa.table(
            {
                "dpart": self.dst_part,
                "vertex": self.dst_u,
                "contrib": sums * damping,
            }
        )

    def dangling_rank(self) -> float:
        # owned vertices with no out-edges (incl. dst-only vertices)
        return float(self.rank[~self.has_out].sum())

    # ---- direct actor-to-actor exchange (default combine path) ----------
    #
    # The scatter partials are already hash-partitioned by destination
    # (dst_by_part), so the per-superstep shuffle can be a direct object
    # store exchange: scatter returns P slices (num_returns=P), the driver
    # forwards each ref to its owning shard, combine happens shard-side.
    # O(P^2) refs per superstep — fine to P ~ thousands; the Dataset
    # groupby path (superstep.py combine="dataset") expresses the same
    # partial/final aggregation through Ray Data when P is larger.

    def pagerank_scatter_parts(self, damping: float):
        src_rank = self.rank[self.src_in_owned]
        per_edge = self._rank_per_edge(src_rank / self.outdeg)
        sums = np.bincount(self.dst_inv, weights=per_edge, minlength=len(self.dst_u))
        sums *= damping
        return tuple(
            (self.dst_u[idx], sums[idx]) for idx in self.dst_by_part
        )

    def pagerank_apply_parts(
        self, dangling: float, damping: float, *parts
    ) -> float:
        parts = [p for p in parts if len(p[0])]
        if parts:
            v = np.concatenate([p[0] for p in parts])
            c = np.concatenate([p[1] for p in parts])
            vu, inv = np.unique(v, return_inverse=True)
            sums = np.bincount(inv, weights=c, minlength=len(vu))
        else:
            vu = np.empty(0, np.int64)
            sums = np.empty(0, np.float64)
        return self.pagerank_apply(vu, sums, dangling, damping)

    def cc_scatter_parts(self):
        active = self.changed[self.src_in_owned]
        if not active.any():
            e = (np.empty(0, np.int64), np.empty(0, np.int64))
            return tuple(e for _ in range(self.P))
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        act_edge = np.repeat(active, self.outdeg)
        inv = self.dst_inv[act_edge]
        lbl = lbl_edge[act_edge]
        mins = np.full(len(self.dst_u), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, lbl)
        out = []
        for idx in self.dst_by_part:
            m = mins[idx]
            live = m != np.iinfo(np.int64).max
            out.append((self.dst_u[idx][live], m[live]))
        return tuple(out)

    def cc_apply_parts(self, *parts) -> int:
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return self.cc_apply(np.empty(0, np.int64), np.empty(0, np.int64))
        v = np.concatenate([p[0] for p in parts])
        l = np.concatenate([p[1] for p in parts])
        order = np.lexsort((l, v))
        v, l = v[order], l[order]
        first = np.concatenate([[True], v[1:] != v[:-1]])
        return self.cc_apply(v[first], l[first])

    def lp_scatter_parts(self):
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        pairs = np.stack([self.dst_inv, lbl_edge], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        inv = uniq[:, 0].astype(np.int64)
        dpart = self.dst_part[inv]
        order = np.argsort(dpart, kind="stable")
        bounds = np.searchsorted(dpart[order], np.arange(self.P + 1))
        out = []
        for p in range(self.P):
            sl = order[bounds[p] : bounds[p + 1]]
            out.append(
                (self.dst_u[inv[sl]], uniq[sl, 1], counts[sl].astype(np.int64))
            )
        return tuple(out)

    def lp_apply_parts(self, *parts) -> int:
        parts = [p for p in parts if len(p[0])]
        if not parts:
            return self.lp_apply(
                np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
            )
        v = np.concatenate([p[0] for p in parts])
        l = np.concatenate([p[1] for p in parts])
        c = np.concatenate([p[2] for p in parts])
        pairs = np.stack([v, l], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.bincount(inv, weights=c, minlength=len(uniq)).astype(np.int64)
        return self.lp_apply(uniq[:, 0], uniq[:, 1], sums)

    def pagerank_apply(
        self, vertex: np.ndarray, contrib: np.ndarray, dangling: float, damping: float
    ) -> float:
        base = (1.0 - damping) / self.n_total + damping * dangling / self.n_total
        new = np.full(len(self.owned), base)
        if len(vertex):
            idx = np.searchsorted(self.owned, vertex)
            new[idx] += contrib
        delta = float(np.abs(new - self.rank).sum())
        self.rank = new
        return delta

    # ---- Connected components (min-label) -------------------------------

    def cc_init(self) -> None:
        self.label = self.owned.copy()
        self.changed = np.ones(len(self.owned), bool)

    def cc_scatter(self) -> pa.Table:
        """Frontier scatter: labels of changed srcs propagated to dsts,
        combined by dst with min (the partial aggregate)."""
        active = self.changed[self.src_in_owned]
        if not active.any():
            return pa.table(
                {
                    "dpart": np.empty(0, np.int32),
                    "vertex": np.empty(0, np.int64),
                    "label": np.empty(0, np.int64),
                }
            )
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        act_edge = self._rank_per_edge(active.astype(np.int64)).astype(bool)
        inv = self.dst_inv[act_edge]
        lbl = lbl_edge[act_edge]
        mins = np.full(len(self.dst_u), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, lbl)
        live = mins != np.iinfo(np.int64).max
        return pa.table(
            {
                "dpart": self.dst_part[live],
                "vertex": self.dst_u[live],
                "label": mins[live],
            }
        )

    def cc_apply(self, vertex: np.ndarray, label: np.ndarray) -> int:
        self.changed = np.zeros(len(self.owned), bool)
        if len(vertex) == 0:
            return 0
        idx = np.searchsorted(self.owned, vertex)
        better = label < self.label[idx]
        self.label[idx[better]] = label[better]
        self.changed[idx[better]] = True
        return int(better.sum())

    # ---- Label propagation (mode, tie-break min) -------------------------

    def lp_init(self) -> None:
        self.label = self.owned.copy()

    def lp_scatter(self) -> pa.Table:
        """Emit per-(dst, label) counts — the combiner for the mode agg."""
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        pairs = np.stack([self.dst_inv, lbl_edge], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        inv = uniq[:, 0].astype(np.int64)
        return pa.table(
            {
                "dpart": self.dst_part[inv],
                "vertex": self.dst_u[inv],
                "label": uniq[:, 1],
                "cnt": counts.astype(np.int64),
            }
        )

    def lp_apply(self, vertex: np.ndarray, label: np.ndarray, cnt: np.ndarray) -> int:
        """new label(v) = argmax count, ties → min label; isolated keep own."""
        if len(vertex) == 0:
            return 0
        order = np.lexsort((label, -cnt, vertex))
        v, lb = vertex[order], label[order]
        first = np.concatenate([[True], v[1:] != v[:-1]])
        vv, ll = v[first], lb[first]
        idx = np.searchsorted(self.owned, vv)
        changed = int((self.label[idx] != ll).sum())
        self.label[idx] = ll
        return changed
