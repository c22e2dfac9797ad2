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

import asyncio

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import part_of


@ray.remote(num_cpus=0)
class CsrShard:
    """One hash partition of the graph + the vertex state it owns.

    Async actor: the superstep exchange is PUSH-based — every shard fires
    its pre-partitioned partials directly at the owning peers
    (`receive_parts`, actor-to-actor through the object store) and
    `apply_pushed` awaits the P-message barrier before reducing. The driver
    touches only 2P refs per superstep; with the earlier driver-routed
    ref-matrix the P^2 object handoffs dominated wall-time beyond P~16."""

    def __init__(self, part: int, num_parts: int):
        self.part = part
        self.P = num_parts
        self._src_chunks: list[np.ndarray] = []
        self._dst_chunks: list[np.ndarray] = []
        self._vtx_chunks: list[np.ndarray] = []
        self._edges_in = 0
        self._vtx_in = 0
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
        # push-exchange state
        self.peers: list | None = None
        self._inbox: list = []
        self._barrier = asyncio.Event()
        self._hot_received = 0
        self._hot_barrier = asyncio.Event()

    # ---- build ----------------------------------------------------------

    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_chunks.append(np.asarray(src, np.int64))
        self._dst_chunks.append(np.asarray(dst, np.int64))
        self._edges_in += len(src)
        return len(src)

    def add_vertices(self, vtx: np.ndarray) -> int:
        self._vtx_chunks.append(np.asarray(vtx, np.int64))
        self._vtx_in += len(vtx)
        return len(vtx)

    def ingest(self, src: np.ndarray, dst: np.ndarray, vtx: np.ndarray) -> int:
        """One combined build push (edges + vertex registrations) — a
        single actor round trip per (batch, partition) instead of three."""
        self.add_edges(src, dst)
        self.add_vertices(vtx)
        return len(src)

    def ingest_counts(self) -> tuple[int, int]:
        """(edges received, vertices received) — the build's completion
        barrier compares these against the routed totals, so in-flight
        fire-and-forget pushes are awaited without a per-batch barrier."""
        return self._edges_in, self._vtx_in

    def finalize(self, weighted: bool = False) -> dict:
        """Dedup + sort into CSR. Idempotent: retried pushes collapse in
        the unique() (the duplicate-on-task-retry guard).

        weighted: keep the MULTIPLICITY of each (src, dst) pair as an
        integer edge weight (raw un-deduped streams encode weights as
        repetition — e.g. one edge per lineitem row). CAVEAT: unlike the
        unweighted path, multiplicity counting is NOT idempotent under a
        route-task retry that re-delivers already-pushed batches; a
        weighted build that sees a route-task failure must be restarted
        from scratch (cheap: the build is one streaming pass). The >=
        counter barrier makes over-delivery detectable (received > routed
        totals would flag it) but the engine currently treats a clean
        barrier as exactly-once."""
        self.wts = None
        self.w_out = None
        if self._src_chunks:
            src = np.concatenate(self._src_chunks)
            dst = np.concatenate(self._dst_chunks)
            pairs = np.stack([src, dst], axis=1)
            if weighted:
                pairs, wts = np.unique(pairs, axis=0, return_counts=True)
                # float64 is exact for multiplicity counts (< 2^53)
                self.wts = wts.astype(np.float64)
            else:
                pairs = np.unique(pairs, axis=0)  # sorts by (src,dst) + dedups
            src, dst = pairs[:, 0], pairs[:, 1]
        else:
            src = np.empty(0, np.int64)
            dst = np.empty(0, np.int64)
            if weighted:
                self.wts = np.empty(0, np.float64)
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
        # owner-local routing indexes (dst_route[p][i] = position of
        # dst_u[dst_by_part[p][i]] within owner p's owned array) are filled
        # by ShardedGraph.build via one build-time exchange — supersteps
        # then need no per-iteration searchsorted on the apply side
        self.dst_route: list[np.ndarray | None] = [None] * self.P
        self.has_out = np.isin(self.owned, self.srcs, assume_unique=True)
        if self.wts is not None and len(self.srcs):
            # per unique src: total outgoing weight (exact integer sums)
            self.w_out = np.add.reduceat(self.wts, self.indptr[:-1])
        elif self.wts is not None:
            self.w_out = np.empty(0, np.float64)
        return {"part": self.part, "edges": len(dst), "owned": len(self.owned)}

    # ---- high-degree salting (vertex-cut mirrors) -----------------------
    #
    # BASELINE.json mandate: "skewed high-degree vertices are salted and
    # split across partitions". After finalize, hot sources' adjacency is
    # split into P chunks shipped to every shard as MIRRORS; each
    # superstep the owner pushes the hot ranks once per peer (O(#hot)
    # rows) and every mirror scatters its chunk locally. Combined with the
    # combiner on the inbound side (a hot DESTINATION receives at most P
    # pre-summed rows), both tails of a power-law degree distribution are
    # spread across the pool.

    def hot_srcs(self, threshold: int) -> np.ndarray:
        return self.srcs[self.outdeg > threshold]

    def split_hot(self, threshold: int) -> list:
        """Remove hot sources' adjacency from the local CSR and return P
        chunk tables [(src, total_outdeg, dsts), ...] — one per peer
        (round-robin slices of each hot adjacency list)."""
        hot_mask = self.outdeg > threshold
        if not hot_mask.any():
            return [None] * self.P
        chunks: list[list] = [[] for _ in range(self.P)]
        keep_edge = np.ones(len(self.dsts), bool)
        for i in np.flatnonzero(hot_mask):
            lo, hi = self.indptr[i], self.indptr[i + 1]
            keep_edge[lo:hi] = False
            dsts = self.dsts[lo:hi]
            total = hi - lo
            for p in range(self.P):
                sl = dsts[p::self.P]
                if len(sl):
                    chunks[p].append((int(self.srcs[i]), int(total), sl))
        # rebuild the local CSR without the hot adjacency
        src_edge = np.repeat(self.srcs, self.outdeg)[keep_edge]
        dst_edge = self.dsts[keep_edge]
        self.srcs, counts = np.unique(src_edge, return_counts=True)
        self.outdeg = counts.astype(np.int64)
        self.indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.dsts = dst_edge
        self.dst_u, self.dst_inv = np.unique(dst_edge, return_inverse=True)
        self.dst_part = part_of(self.dst_u, self.P)
        order = np.argsort(self.dst_part, kind="stable")
        bounds = np.searchsorted(self.dst_part[order], np.arange(self.P + 1))
        self.dst_by_part = [order[bounds[p] : bounds[p + 1]] for p in range(self.P)]
        self.dst_route = [None] * self.P
        self.src_in_owned = np.searchsorted(self.owned, self.srcs)
        # owner keeps the hot vertices' rank/dangling bookkeeping: they
        # still HAVE out-edges (now at mirrors), so has_out stays True
        return chunks

    def add_mirror(self, owner: int, entries: list) -> int:
        """Accept mirror chunks [(src, total_outdeg, dsts), ...] from
        `owner`. Mirror srcs are keyed (owner, position) — the owner pushes
        ranks in the same order every superstep."""
        if not hasattr(self, "mirrors"):
            self.mirrors: dict[int, dict] = {}
        if not entries:
            return 0
        src = np.array([e[0] for e in entries], np.int64)
        deg = np.array([e[1] for e in entries], np.int64)
        dsts = np.concatenate([e[2] for e in entries])
        cnt = np.array([len(e[2]) for e in entries], np.int64)
        self.mirrors[owner] = {
            "src": src,
            "deg": deg,
            "cnt": cnt,
            "dsts": dsts,
            "rank": np.zeros(len(src)),
        }
        return len(src)

    def finalize_mirrors(self) -> int:
        """Precompute per-mirror dst grouping: unique dsts, inverse, and
        per-destination-part slices (ids; routes are filled by a second
        routing exchange in ShardedGraph)."""
        if not hasattr(self, "mirrors"):
            self.mirrors = {}
        all_dsts = (
            np.concatenate([m["dsts"] for m in self.mirrors.values()])
            if self.mirrors
            else np.empty(0, np.int64)
        )
        self.m_dst_u, self.m_dst_inv = np.unique(all_dsts, return_inverse=True)
        m_part = part_of(self.m_dst_u, self.P)
        self.m_dst_partof = m_part
        order = np.argsort(m_part, kind="stable")
        bounds = np.searchsorted(m_part[order], np.arange(self.P + 1))
        self.m_dst_by_part = [order[bounds[p] : bounds[p + 1]] for p in range(self.P)]
        self.m_dst_route: list[np.ndarray | None] = [None] * self.P
        # segmented-reduce layout over the concatenated mirror edges (for
        # element-min partials: nmh): edge order sorted by destination + run
        # starts, mirroring nmh_init's local layout
        self._m_order = np.argsort(self.m_dst_inv, kind="stable")
        self._m_starts = np.searchsorted(
            self.m_dst_inv[self._m_order], np.arange(len(self.m_dst_u))
        )
        return len(self.m_dst_u)

    def mirror_route_request(self, p: int) -> np.ndarray:
        return self.m_dst_u[self.m_dst_by_part[p]]

    def set_mirror_route(self, p: int, idx: np.ndarray) -> None:
        self.m_dst_route[p] = np.asarray(idx, np.int32)
        if all(r is not None for r in self.m_dst_route):
            # flat lookup m_dst_u position -> (owner part, owner-local idx)
            self.m_dst_loc = np.empty(len(self.m_dst_u), np.int32)
            self.m_dst_partof = part_of(self.m_dst_u, self.P)
            for pp, route in enumerate(self.m_dst_route):
                self.m_dst_loc[self.m_dst_by_part[pp]] = route

    def set_hot_order(self, srcs: np.ndarray) -> None:
        self.hot_order = np.sort(np.asarray(srcs, np.int64))

    async def push_hot_ranks(self, algo: str = "pagerank") -> int:
        """Owner side: fire the hot sources' per-superstep state at every
        peer holding mirrors from this shard — ranks for pagerank,
        (labels, changed) for cc, labels for lp."""
        hot = getattr(self, "hot_order", None)
        if hot is None or len(hot) == 0:
            return 0
        idx = np.searchsorted(self.owned, self.hot_order)
        if algo == "pagerank":
            state = (self.rank[idx], None)
        elif algo == "cc":
            state = (self.label[idx], self.changed[idx])
        elif algo == "nmh":
            state = (self.nmh[idx], None)  # (hot, k) sketch rows
        else:  # lp
            state = (self.label[idx], None)
        sends = []
        for p, peer in enumerate(self.peers):
            if p == self.part:
                self.receive_hot_ranks(self.part, self.hot_order, *state)
            else:
                sends.append(
                    peer.receive_hot_ranks.remote(self.part, self.hot_order, *state)
                )
        # await delivery acks: a lost mirror-state message must raise here,
        # not leave the receiver's _hot_barrier waiting forever
        if sends:
            await asyncio.gather(*sends)
        return len(idx)

    def receive_hot_ranks(self, owner: int, srcs, values, changed=None) -> None:
        if getattr(self, "mirrors", None) and owner in self.mirrors:
            m = self.mirrors[owner]
            pos = np.searchsorted(srcs, m["src"])
            m["rank"] = np.asarray(values)[pos]
            m["changed"] = (
                np.asarray(changed)[pos]
                if changed is not None
                else np.ones(len(pos), bool)
            )
            self._hot_received += 1
            if self._hot_received >= len(self.mirrors):
                self._hot_barrier.set()

    def _mirror_partials(self):
        """Per-destination-part (idx, contrib) slices from mirror chunks."""
        if not getattr(self, "mirrors", None) or len(self.m_dst_u) == 0:
            return None
        per_edge = np.concatenate(
            [
                np.repeat(m["rank"] / m["deg"], m["cnt"])
                for m in self.mirrors.values()
            ]
        )
        sums = np.bincount(
            self.m_dst_inv, weights=per_edge, minlength=len(self.m_dst_u)
        )
        return sums

    def _mirror_nmh_mins(self) -> np.ndarray | None:
        """Elementwise-min sketch per mirror destination from the salted hot
        sources' pushed sketch rows (None when this shard holds no mirrors).
        Same per-perm gather + minimum.reduceat kernel as the local path."""
        if not getattr(self, "mirrors", None) or len(self.m_dst_u) == 0:
            return None
        rows = np.concatenate(
            [np.repeat(m["rank"], m["cnt"], axis=0) for m in self.mirrors.values()],
            axis=0,
        )  # (mirror_edges, k), rows aligned with the concatenated dsts
        k = rows.shape[1]
        out = np.empty((len(self.m_dst_u), k), rows.dtype)
        sl = self._m_order
        for j in range(k):
            out[:, j] = np.minimum.reduceat(rows[sl, j], self._m_starts)
        return out

    async def await_hot_delivery(self) -> int:
        """Dataset-combine counterpart of the push_parts hot barrier: the
        driver awaits this on every shard (after push_hot_ranks) before
        issuing scatter calls, so mirror state for THIS superstep is in
        place and the barrier counters are consumed."""
        if getattr(self, "mirrors", None):
            await self._hot_barrier.wait()
            self._hot_received = 0
            self._hot_barrier.clear()
        return self.part

    def route_request(self, p: int) -> np.ndarray:
        """The dst vertex ids this shard scatters to owner p."""
        return self.dst_u[self.dst_by_part[p]]

    def rank_vertices(self, vertices: np.ndarray) -> np.ndarray:
        """Owner-side: positions of `vertices` within this shard's owned
        array (all of them are owned here by the partitioning contract)."""
        return np.searchsorted(self.owned, vertices).astype(np.int32)

    def set_route(self, p: int, idx: np.ndarray) -> None:
        self.dst_route[p] = np.asarray(idx, np.int32)
        if all(r is not None for r in self.dst_route):
            # flat lookup dst_u position -> owner-local index (lp path)
            self.dst_loc = np.empty(len(self.dst_u), np.int32)
            for pp, route in enumerate(self.dst_route):
                self.dst_loc[self.dst_by_part[pp]] = route

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
        self.teleport = None  # uniform teleport (clears any prior PPR state)
        self.rank = np.full(len(self.owned), 1.0 / n_total)

    def ppr_init(self, seeds: np.ndarray, n_seeds: int) -> None:
        """Personalized PageRank init: teleport mass 1/n_seeds on the seed
        vertices this shard owns; rank0 = teleport (the standard PPR power
        iteration start). Seeds absent from the graph contribute nothing
        (their 1/n_seeds share of mass is simply never injected — mirrored
        by the oracle's CASE over present vertices)."""
        t = np.zeros(len(self.owned), np.float64)
        seeds = np.asarray(seeds, np.int64)
        idx = np.searchsorted(self.owned, seeds)
        m = idx < len(self.owned)
        idx, s = idx[m], seeds[m]
        hit = self.owned[idx] == s
        t[idx[hit]] = 1.0 / n_seeds
        self.teleport = t
        self.rank = t.copy()
        self.n_total = n_seeds  # unused on the PPR path; set for safety

    def set_n_total(self, n_total: int) -> None:
        self.n_total = n_total

    def ppr_set_teleport(self, seeds: np.ndarray, n_seeds: int) -> None:
        """Rebuild ONLY the personalized teleport vector (resume path):
        ranks were just restored from a checkpoint and must not be reset,
        but self.teleport is derived state the checkpoint does not carry —
        recompute it from the caller's seed set (deterministic, so the
        resumed run continues the identical iteration sequence)."""
        t = np.zeros(len(self.owned), np.float64)
        seeds = np.asarray(seeds, np.int64)
        idx = np.searchsorted(self.owned, seeds)
        m = idx < len(self.owned)
        idx, s = idx[m], seeds[m]
        hit = self.owned[idx] == s
        t[idx[hit]] = 1.0 / n_seeds
        self.teleport = t
        self.n_total = n_seeds

    def pagerank_scatter(self, damping: float) -> pa.Table:
        """Gather-scatter: contributions rank*d/outdeg combined by dst.

        Returns (dpart, dst, contrib) with one row per distinct local dst —
        the partial/combiner half of the per-vertex aggregation.
        """
        src_rank = self.rank[self.src_in_owned]
        if self.wts is not None:
            per_edge = (
                self._rank_per_edge(src_rank) * self.wts
            ) / self._rank_per_edge(self.w_out)
        else:
            per_edge = self._rank_per_edge(src_rank / self.outdeg)
        sums = np.bincount(
            self.dst_inv, weights=per_edge, minlength=len(self.dst_u)
        ).astype(np.float64, copy=False)
        dpart, vertex, contrib = self.dst_part, self.dst_u, sums * damping
        msums = self._mirror_partials()
        if msums is not None:
            # salted hot sources: mirror-chunk partials ride along as extra
            # rows (the dataset combine SUMS per vertex, duplicates are fine)
            dpart = np.concatenate([dpart, self.m_dst_partof])
            vertex = np.concatenate([vertex, self.m_dst_u])
            contrib = np.concatenate([contrib, msums * damping])
        return pa.table({"dpart": dpart, "vertex": vertex, "contrib": contrib})

    def dangling_rank(self) -> float:
        # owned vertices with no out-edges (incl. dst-only vertices)
        return float(self.rank[~self.has_out].sum())

    # ---- neighborhood min-hash sketches (ANF/HyperANF-style) -------------
    #
    # Per-vertex bottom sketch of the set of vertices reaching it within
    # <= t hops after t supersteps: k permuted hashes, superstep aggregate
    # = elementwise min over in-neighbors. Per-edge work is k element mins
    # (vs PageRank's one multiply-add), so this is the COMPUTE-BOUND
    # superstep workload of the engine (the scaling benchmark's honest
    # high-arithmetic-intensity leg) as well as a real operator
    # (neighborhood-function / reachable-set cardinality estimation).

    def nmh_init(self, num_perm: int, seed: int = 23) -> int:
        """h_j(v) = ((v*a_j mod 2^64) + b_j mod 2^64) mod (2^61-1) — the
        same uint64-wraparound modmul family as the minhash dedup stage
        (SQL-mirrorable with HUGEINT arithmetic)."""
        rng = np.random.Generator(np.random.PCG64(seed))
        a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.uint64)
        b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.nmh_p = np.uint64((1 << 61) - 1)
        v = self.owned.astype(np.uint64)
        with np.errstate(over="ignore"):
            self.nmh = ((v[:, None] * a[None, :]) + b[None, :]) % self.nmh_p
        # per-edge gather index (owned row of the edge's source) in
        # dst-sorted order + run starts, for segment-min via reduceat
        esrc_owned = np.repeat(self.src_in_owned, self.outdeg)
        order = np.argsort(self.dst_inv, kind="stable")
        self._nmh_ge = esrc_owned[order]
        di = self.dst_inv[order]
        self._nmh_starts = np.searchsorted(di, np.arange(len(self.dst_u)))
        return len(v)

    # edge-chunk budget: bounds the per-column gathered temp to ~128 MB
    _NMH_EDGE_BUDGET = 1 << 24

    def nmh_scatter_parts(self):
        S = self.nmh
        k = S.shape[1]
        nd = len(self.dst_u)
        mins = np.empty((nd, k), np.uint64)
        ge, starts = self._nmh_ge, self._nmh_starts
        E = len(ge)
        # per-PERM 1-D gather + reduceat: ~4x faster than the 2-D axis-0
        # form (ufunc.reduceat's 2-D inner loop is strided); ST rows are
        # contiguous so each column gather is a linear scan
        ST = np.ascontiguousarray(S.T)
        r0 = 0
        while r0 < nd:
            # edge-chunk aligned to destination-run boundaries
            r1 = int(np.searchsorted(starts, starts[r0] + self._NMH_EDGE_BUDGET))
            r1 = max(r1, r0 + 1)
            e0 = int(starts[r0])
            e1 = int(starts[r1]) if r1 < nd else E
            sl = ge[e0:e1]
            st = starts[r0:r1] - e0
            for j in range(k):
                mins[r0:r1, j] = np.minimum.reduceat(ST[j][sl], st)
            r0 = r1
        # each peer's part is a LIST of (route, mins) pairs: the local slice
        # plus (salted graphs) the mirror-chunk slice. The pairs stay
        # separate because a destination may appear in both, and the apply
        # kernel's fancy-index min is only collision-free WITHIN a pair.
        mmins = self._mirror_nmh_mins()
        out = []
        for p, idx in enumerate(self.dst_by_part):
            pairs = [(self.dst_route[p], mins[idx])]
            if mmins is not None:
                midx = self.m_dst_by_part[p]
                if len(midx):
                    pairs.append((self.m_dst_route[p], mmins[midx]))
            out.append(pairs)
        return tuple(out)

    def nmh_apply_parts(self, *parts) -> float:
        new = self.nmh
        changed_any = np.zeros(len(self.owned), bool)
        for pairs in parts:
            for idx, m in pairs:
                if len(idx):
                    # idx rows are distinct within a pair (each route lists a
                    # destination once), so fancy-index min is collision-free;
                    # pairs apply sequentially against the refreshed state
                    cur = new[idx]
                    upd = np.minimum(cur, m)
                    ch = (upd != cur).any(axis=1)
                    if ch.any():
                        new[idx] = upd
                        changed_any[idx] |= ch
        return float(changed_any.sum())

    def nmh_state(self) -> pa.Table:
        """(vertex, nf_est): k-min cardinality estimate of the <= t-hop
        in-reachable set, n̂ = k / sum_j(m_j / p) - 1."""
        m = self.nmh.astype(np.float64) / float(self.nmh_p)
        est = self.nmh.shape[1] / m.sum(axis=1) - 1.0
        return pa.table(
            {
                "vertex": pa.array(self.owned, pa.int64()),
                "nf_est": pa.array(est, pa.float64()),
            }
        )

    # ---- push-based actor-to-actor exchange (default combine path) ------

    def set_peers(self, peers: list) -> None:
        self.peers = peers

    _SCATTERS = {
        "katz": "katz_scatter_parts",
        "mis_min": "mis_min_scatter_parts",
        "mis_excl": "mis_excl_scatter_parts",
        "pagerank": "pagerank_scatter_parts",
        "cc": "cc_scatter_parts",
        "lp": "lp_scatter_parts",
        "nmh": "nmh_scatter_parts",
        "kcore": "kcore_scatter_parts",
        "bfs": "bfs_scatter_parts",
        "sigma": "sigma_scatter_parts",
        "gcount": "gcount_scatter_parts",
        "bfsm": "bfsm_scatter_parts",
        "hits": "hits_scatter_parts",
        "hits_pull": "hits_pull_scatter_parts",
        "nagg": "nagg_scatter_parts",
        "scc": "scc_scatter_parts",
        "match_min": "match_min_scatter_parts",
        "match_mut": "match_mut_scatter_parts",
    }
    _APPLIES = {
        "katz": "katz_apply_parts",
        "mis_min": "mis_min_apply_parts",
        "mis_excl": "mis_excl_apply_parts",
        "pagerank": "pagerank_apply_parts",
        "cc": "cc_apply_parts",
        "lp": "lp_apply_parts",
        "nmh": "nmh_apply_parts",
        "kcore": "kcore_apply_parts",
        "bfs": "bfs_apply_parts",
        "sigma": "sigma_apply_parts",
        "gcount": "gcount_apply_parts",
        "bfsm": "bfsm_apply_parts",
        "hits": "hits_apply_parts",
        "hits_pull": "hits_pull_apply_parts",
        "nagg": "nagg_apply_parts",
        "scc": "scc_apply_parts",
        "match_min": "match_min_apply_parts",
        "match_mut": "match_mut_apply_parts",
    }

    async def push_parts(self, algo: str, *scatter_args) -> int:
        """Compute this shard's partials and fire each destination slice at
        its owning peer (fire-and-forget actor calls; ordering is driver-
        barriered per superstep). With salted hot sources, awaits this
        superstep's hot-rank delivery first (cross-sender actor calls have
        no ordering guarantee)."""
        if getattr(self, "mirrors", None):
            await self._hot_barrier.wait()
            self._hot_received = 0
            self._hot_barrier.clear()
        parts = getattr(self, self._SCATTERS[algo])(*scatter_args)
        sends = []
        for p, peer in enumerate(self.peers):
            if p == self.part:
                self._deliver(parts[p])
            else:
                sends.append(peer.receive_parts.remote(parts[p]))
        # await delivery acks: a lost superstep message (peer death,
        # serialization failure) must fail loudly here instead of hanging
        # the apply-side P-message barrier; peers keep processing incoming
        # receive_parts while this task awaits, so no cross-shard deadlock
        if sends:
            await asyncio.gather(*sends)
        return self.part

    def _deliver(self, part) -> None:
        self._inbox.append(part)
        if len(self._inbox) >= self.P:
            self._barrier.set()

    def receive_parts(self, part) -> None:
        self._deliver(part)

    async def apply_pushed(self, algo: str, *apply_args):
        """Await all P partials, then run the reduce+apply kernel."""
        await self._barrier.wait()
        parts, self._inbox = self._inbox, []
        self._barrier.clear()
        return getattr(self, self._APPLIES[algo])(*apply_args, *parts)

    # ---- direct actor-to-actor exchange (ref-matrix variant) -------------
    #
    # The scatter partials are already hash-partitioned by destination
    # (dst_by_part), so the per-superstep shuffle can be a direct object
    # store exchange: scatter returns P slices (num_returns=P), the driver
    # forwards each ref to its owning shard, combine happens shard-side.
    # O(P^2) refs per superstep — fine to P ~ thousands; the Dataset
    # groupby path (superstep.py combine="dataset") expresses the same
    # partial/final aggregation through Ray Data when P is larger.

    def pagerank_scatter_parts(self, damping: float):
        """Partial contributions per destination owner, addressed by the
        PRECOMPUTED owner-local int32 route (no ids on the wire, no
        searchsorted on the apply side). Mirror chunks of salted hot
        sources contribute through their own precomputed routes."""
        src_rank = self.rank[self.src_in_owned]
        if self.wts is not None:
            # weighted: (rank * w) / W per edge — the exact association the
            # SQL mirror uses (r.rank * we.w / wout.W, left-assoc IEEE)
            per_edge = (
                self._rank_per_edge(src_rank) * self.wts
            ) / self._rank_per_edge(self.w_out)
        else:
            per_edge = self._rank_per_edge(src_rank / self.outdeg)
        # np.bincount returns int64 (not float64) when the input is EMPTY,
        # even with float weights — normalize the dtype for empty shards
        sums = np.bincount(
            self.dst_inv, weights=per_edge, minlength=len(self.dst_u)
        ).astype(np.float64, copy=False)
        sums *= damping
        msums = self._mirror_partials()
        out = []
        for p, idx in enumerate(self.dst_by_part):
            i1 = self.dst_route[p]
            c1 = sums[idx]
            if msums is not None:
                midx = self.m_dst_by_part[p]
                if len(midx):
                    i1 = np.concatenate([i1, self.m_dst_route[p]])
                    c1 = np.concatenate([c1, msums[midx] * damping])
            out.append((i1, c1))
        return tuple(out)

    def pagerank_apply_parts(
        self, dangling: float, damping: float, *parts
    ) -> float:
        t = getattr(self, "teleport", None)
        if t is None:  # uniform teleport (classic PageRank)
            base = (1.0 - damping) / self.n_total + damping * dangling / self.n_total
        else:  # personalized: teleport AND dangling mass land on the seeds
            base = (1.0 - damping) * t + damping * dangling * t
        live = [p for p in parts if len(p[0])]
        if live:
            # ONE concatenated bincount over owner-local indexes:
            # O(rows + |owned|), independent of the sender count
            idx = np.concatenate([p[0] for p in live])
            c = np.concatenate([p[1] for p in live])
            new = base + np.bincount(idx, weights=c, minlength=len(self.owned))
        else:
            new = np.zeros(len(self.owned)) + base
        delta = float(np.abs(new - self.rank).sum())
        self.rank = new
        return delta

    # ---- Katz centrality --------------------------------------------------
    #
    # x_{k+1}(v) = beta + alpha * sum_{u->v} x_k(u): the attenuation-walk
    # centrality (beta per vertex, alpha per hop). Same routes and state
    # array as PageRank (self.rank) but no degree division and no dangling
    # redistribution — each in-edge carries the source's full score.

    def katz_init(self, beta: float) -> None:
        self.teleport = None
        self.rank = np.full(len(self.owned), float(beta))

    def katz_scatter_parts(self, alpha: float):
        src_rank = self.rank[self.src_in_owned]
        per_edge = self._rank_per_edge(src_rank)
        sums = np.bincount(
            self.dst_inv, weights=per_edge, minlength=len(self.dst_u)
        ).astype(np.float64, copy=False)
        sums *= alpha
        return tuple(
            (self.dst_route[p], sums[idx])
            for p, idx in enumerate(self.dst_by_part)
        )

    def katz_apply_parts(self, beta: float, *parts) -> float:
        live = [p for p in parts if len(p[0])]
        if live:
            idx = np.concatenate([p[0] for p in live])
            c = np.concatenate([p[1] for p in live])
            new = beta + np.bincount(idx, weights=c, minlength=len(self.owned))
        else:
            new = np.full(len(self.owned), float(beta))
        delta = float(np.abs(new - self.rank).sum())
        self.rank = new
        return delta

    def _mirror_label_mins(self):
        """Min label per mirror destination from CHANGED salted sources
        (None when this shard holds no mirrors)."""
        if not getattr(self, "mirrors", None) or len(self.m_dst_u) == 0:
            return None
        lbl = np.concatenate(
            [np.repeat(m["rank"], m["cnt"]) for m in self.mirrors.values()]
        ).astype(np.int64)
        act = np.concatenate(
            [np.repeat(m["changed"], m["cnt"]) for m in self.mirrors.values()]
        ).astype(bool)
        if not act.any():
            return None
        mins = np.full(len(self.m_dst_u), np.iinfo(np.int64).max)
        np.minimum.at(mins, self.m_dst_inv[act], lbl[act])
        return mins

    def cc_scatter_parts(self):
        INF = np.iinfo(np.int64).max
        active = self.changed[self.src_in_owned]
        if active.any():
            lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
            act_edge = np.repeat(active, self.outdeg)
            inv = self.dst_inv[act_edge]
            lbl = lbl_edge[act_edge]
            mins = np.full(len(self.dst_u), INF)
            np.minimum.at(mins, inv, lbl)
        else:
            mins = None
        mmins = self._mirror_label_mins()
        out = []
        for p in range(self.P):
            idxs, vals = [], []
            if mins is not None:
                idx = self.dst_by_part[p]
                m = mins[idx]
                live = m != INF
                idxs.append(self.dst_route[p][live])
                vals.append(m[live])
            if mmins is not None:
                midx = self.m_dst_by_part[p]
                mm = mmins[midx]
                live = mm != INF
                idxs.append(self.m_dst_route[p][live])
                vals.append(mm[live])
            if idxs:
                out.append((np.concatenate(idxs), np.concatenate(vals)))
            else:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
        return tuple(out)

    def cc_apply_parts(self, *parts) -> int:
        """Min-combine incoming labels via the precomputed owner-local
        indexes (no searchsorted, no sort)."""
        self.changed = np.zeros(len(self.owned), bool)
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        mins = np.full(len(self.owned), np.iinfo(np.int64).max)
        for idx, l in live:
            np.minimum.at(mins, idx, l)
        better = mins < self.label
        self.label[better] = mins[better]
        self.changed[better] = True
        return int(better.sum())

    # ---- k-core peeling ---------------------------------------------------
    #
    # Distributed k-core decomposition by round-based peeling: a vertex
    # dies when its remaining degree drops below k; each death pushes ONE
    # decrement per incident edge to the neighbor's owner. Total message
    # volume across ALL rounds is O(E) (every edge carries at most one
    # decrement per endpoint death), unlike recompute-degrees-per-round
    # formulations whose volume is O(E * rounds). Requires a symmetric,
    # unsalted graph (the adjacency of an owned vertex is its full
    # neighborhood).

    def kcore_init(self, k: int) -> int:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "kcore supports unsalted graphs only; rebuild without "
                "salt_threshold (salted mirror chunks would need their own "
                "decrement routes)"
            )
        self.kc_k = int(k)
        deg = np.zeros(len(self.owned), np.int64)
        deg[self.src_in_owned] = self.outdeg
        self.kc_deg = deg
        self.kc_alive = deg >= self.kc_k
        # newly-dead vertices queue their decrements for the first superstep
        self.kc_pending = ~self.kc_alive
        return int(self.kc_pending.sum())

    def kcore_scatter_parts(self):
        """Decrement counts toward the neighbors of newly-dead vertices,
        combined per destination and addressed by the precomputed
        owner-local routes (same shape as the pagerank scatter)."""
        dead_src = self.kc_pending[self.src_in_owned]
        decs = None
        if dead_src.any():
            mask = np.repeat(dead_src, self.outdeg)
            decs = np.bincount(self.dst_inv[mask], minlength=len(self.dst_u))
        out = []
        for p in range(self.P):
            if decs is None:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
                continue
            idx = self.dst_by_part[p]
            c = decs[idx]
            live = c > 0
            out.append((self.dst_route[p][live], c[live].astype(np.int64)))
        return tuple(out)

    def kcore_apply_parts(self, *parts) -> int:
        """Apply incoming decrements; vertices falling below k die and
        become the next round's frontier. Returns the newly-dead count."""
        live = [p for p in parts if len(p[0])]
        if not live:
            self.kc_pending = np.zeros(len(self.owned), bool)
            return 0
        idx = np.concatenate([p[0] for p in live])
        c = np.concatenate([p[1] for p in live])
        self.kc_deg -= np.bincount(
            idx, weights=c, minlength=len(self.owned)
        ).astype(np.int64)
        newly = self.kc_alive & (self.kc_deg < self.kc_k)
        self.kc_alive[newly] = False
        self.kc_pending = newly
        return int(newly.sum())

    def kcore_state(self) -> pa.Table:
        """(vertex, core_deg) for k-core members; core_deg is the degree
        within the surviving core (initial degree minus one decrement per
        dead neighbor)."""
        m = self.kc_alive
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "core_deg": pa.array(self.kc_deg[m], pa.int64()),
            }
        )

    # ---- neighbor-feature aggregation -------------------------------------
    #
    # One-superstep gather-scatter feature engineering: each vertex
    # aggregates (sum, max) of its in-neighbors' integer attribute — with a
    # symmetric build, of ALL neighbors. The attribute here is the vertex
    # out-degree (== full degree on symmetric builds). Exact int64
    # arithmetic end-to-end. Unsalted graphs only.

    def nagg_init(self) -> int:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "neighbor_degree_agg supports unsalted graphs only; build "
                "the ShardedGraph without salt_threshold"
            )
        deg = np.zeros(len(self.owned), np.int64)
        deg[self.src_in_owned] = self.outdeg
        self.nagg_attr = deg
        return len(self.owned)

    def nagg_scatter_parts(self):
        """(sum, max) of source attributes combined per destination — the
        combiner halves of both aggregates ride one message."""
        a_edge = self._rank_per_edge(self.nagg_attr[self.src_in_owned])
        sums = np.zeros(len(self.dst_u), np.int64)
        np.add.at(sums, self.dst_inv, a_edge)
        maxs = np.full(len(self.dst_u), np.iinfo(np.int64).min)
        np.maximum.at(maxs, self.dst_inv, a_edge)
        out = []
        for p in range(self.P):
            idx = self.dst_by_part[p]
            live = maxs[idx] > np.iinfo(np.int64).min
            out.append(
                (self.dst_route[p][live], sums[idx][live], maxs[idx][live])
            )
        return tuple(out)

    def nagg_apply_parts(self, *parts) -> int:
        self.nagg_sum = np.zeros(len(self.owned), np.int64)
        self.nagg_max = np.full(len(self.owned), np.iinfo(np.int64).min)
        for p in parts:
            if len(p[0]):
                idx, s, m = p
                np.add.at(self.nagg_sum, idx, s)
                np.maximum.at(self.nagg_max, idx, m)
        return int((self.nagg_max > np.iinfo(np.int64).min).sum())

    def nagg_state(self) -> pa.Table:
        """(vertex, nbr_deg_sum, nbr_deg_max) for vertices with >= 1
        in-neighbor (mirrors the SQL GROUP BY's row set)."""
        m = self.nagg_max > np.iinfo(np.int64).min
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "nbr_deg_sum": pa.array(self.nagg_sum[m], pa.int64()),
                "nbr_deg_max": pa.array(self.nagg_max[m], pa.int64()),
            }
        )

    # ---- HITS hubs & authorities -----------------------------------------
    #
    # Kleinberg's HITS with per-iteration L1 normalization: the auth update
    # is the standard forward scatter (hub mass along out-edges, combined
    # per destination — the pagerank exchange without the degree division);
    # the hub update needs auth values of each shard's OUT-NEIGHBORS, which
    # live at their owners, so it runs as a PULL: owners serve their auth
    # values along pre-registered reverse routes (pull_route[q] is exactly
    # the idx array shard q already holds as dst_route[p] — one build-time
    # registration, zero per-iteration searchsorted). Per-iteration volume
    # is O(distinct (shard, neighbor) pairs) both ways, same as pagerank.
    # Unsalted graphs only.

    def hits_init(self) -> int:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "hits supports unsalted graphs only; build the ShardedGraph "
                "without salt_threshold"
            )
        self.hub = np.full(len(self.owned), 1.0)
        self.auth = np.zeros(len(self.owned))
        return len(self.owned)

    def set_pull_route(self, q: int, idx: np.ndarray) -> None:
        """Owner-side reverse route: owner-local positions of the vertices
        shard q scatters to here — served back to q in the pull step."""
        if not hasattr(self, "pull_route"):
            self.pull_route = [None] * self.P
        self.pull_route[q] = np.asarray(idx, np.int32)

    async def send_pull_routes(self) -> int:
        """Register this shard's dst routes with every owner (the reverse
        index the HITS pull step serves along). Build-time, once."""
        sends = []
        for p, peer in enumerate(self.peers):
            if p == self.part:
                self.set_pull_route(self.part, self.dst_route[p])
            else:
                sends.append(
                    peer.set_pull_route.remote(self.part, self.dst_route[p])
                )
        if sends:
            await asyncio.gather(*sends)
        return self.part

    def hits_scatter_parts(self):
        """Per-destination partial sums of the current hub values along
        out-edges (pagerank scatter without the degree division)."""
        h_edge = self._rank_per_edge(self.hub[self.src_in_owned])
        sums = np.bincount(
            self.dst_inv, weights=h_edge, minlength=len(self.dst_u)
        ).astype(np.float64, copy=False)
        out = []
        for p in range(self.P):
            idx = self.dst_by_part[p]
            s = sums[idx]
            live = s != 0.0
            out.append((self.dst_route[p][live], s[live]))
        return tuple(out)

    def hits_apply_parts(self, *parts) -> float:
        """auth_raw = summed incoming hub mass; returns the local L1 sum
        (the driver reduces the P scalars into the normalization divisor)."""
        live = [p for p in parts if len(p[0])]
        if live:
            idx = np.concatenate([p[0] for p in live])
            c = np.concatenate([p[1] for p in live])
            self.auth = np.bincount(idx, weights=c, minlength=len(self.owned))
        else:
            self.auth = np.zeros(len(self.owned))
        return float(self.auth.sum())

    def hits_pull_scatter_parts(self):
        """Serve this owner's auth values along the registered reverse
        routes; the payload carries the sender part so receivers can align
        slices to their dst_by_part order."""
        out = []
        for q in range(self.P):
            idx = self.pull_route[q]
            vals = (
                self.auth[idx]
                if idx is not None and len(idx)
                else np.empty(0, np.float64)
            )
            out.append((self.part, vals))
        return tuple(out)

    def hits_pull_apply_parts(self, *parts) -> float:
        """Assemble the out-neighbors' auth values, then hub_raw per owned
        src = segmented sum over the CSR runs; returns the local L1 sum."""
        authv = np.zeros(len(self.dst_u))
        for sender, vals in parts:
            if len(vals):
                authv[self.dst_by_part[sender]] = vals
        hub = np.zeros(len(self.owned))
        if len(self.dsts) and len(self.srcs):
            per_edge = authv[self.dst_inv]
            hub[self.src_in_owned] = np.add.reduceat(
                per_edge, self.indptr[:-1]
            )
        self.hub = hub
        return float(hub.sum())

    def hits_normalize(self, col: str, total: float) -> None:
        if col == "auth":
            self.auth = self.auth / total
        else:
            self.hub = self.hub / total

    def hits_state(self) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.array(self.owned, pa.int64()),
                "auth": pa.array(self.auth, pa.float64()),
                "hub": pa.array(self.hub, pa.float64()),
            }
        )

    # ---- multi-source BFS hop distance -----------------------------------
    #
    # Frontier-based min-distance propagation: only vertices whose distance
    # improved last round scatter dist+1 to their out-neighbors (the cc
    # min-label exchange with an incremented payload). Message volume per
    # round is bounded by the frontier's out-edges, total O(E * diameter)
    # worst case but O(E) on expander-like graphs where each vertex settles
    # once. Unsalted graphs only (mirror chunks would need their own
    # distance state).

    def bfs_init(self, seeds: np.ndarray, weighted: bool = False) -> int:
        """weighted=True turns the hop relaxation into integer-weight SSSP
        (Bellman-Ford style): the scatter ships dist + w(u,v) instead of
        dist + 1. Requires a weighted build (finalize(weighted=True))."""
        if getattr(self, "mirrors", None):
            raise ValueError(
                "bfs_distance supports unsalted graphs only; build the "
                "ShardedGraph without salt_threshold"
            )
        if weighted:
            if self.wts is None:
                raise ValueError(
                    "weighted SSSP needs ShardedGraph.build(weighted=True)"
                )
            # multiplicity counts are exact integers; min-combine in int64
            self._bfs_step = self.wts.astype(np.int64)
        else:
            self._bfs_step = None
        INF = np.iinfo(np.int64).max
        self.dist = np.full(len(self.owned), INF, np.int64)
        self.changed = np.zeros(len(self.owned), bool)
        seeds = np.asarray(seeds, np.int64)
        idx = np.searchsorted(self.owned, seeds)
        m = idx < len(self.owned)
        idx, s = idx[m], seeds[m]
        hit = self.owned[idx] == s
        self.dist[idx[hit]] = 0
        self.changed[idx[hit]] = True
        return int(self.changed.sum())

    def bfs_scatter_parts(self):
        """dist+1 toward the out-neighbors of last round's improved
        vertices, min-combined per destination."""
        INF = np.iinfo(np.int64).max
        active = self.changed[self.src_in_owned]
        if active.any():
            # INF + step wraps for inactive sources; act_edge masks them out
            d_edge = self._rank_per_edge(self.dist[self.src_in_owned])
            d_edge = d_edge + (
                self._bfs_step if self._bfs_step is not None else 1
            )
            act_edge = np.repeat(active, self.outdeg)
            mins = np.full(len(self.dst_u), INF)
            np.minimum.at(mins, self.dst_inv[act_edge], d_edge[act_edge])
        else:
            mins = None
        out = []
        for p in range(self.P):
            if mins is None:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
                continue
            idx = self.dst_by_part[p]
            m = mins[idx]
            live = m != INF
            out.append((self.dst_route[p][live], m[live]))
        return tuple(out)

    def bfs_apply_parts(self, *parts) -> int:
        self.changed = np.zeros(len(self.owned), bool)
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        mins = np.full(len(self.owned), np.iinfo(np.int64).max)
        for idx, dd in live:
            np.minimum.at(mins, idx, dd)
        better = mins < self.dist
        self.dist[better] = mins[better]
        self.changed[better] = True
        return int(better.sum())

    def bfs_state(self) -> pa.Table:
        """(vertex, dist) for REACHED vertices only (unreached rows would
        be an INF sentinel that no consumer wants)."""
        m = self.dist < np.iinfo(np.int64).max
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "dist": pa.array(self.dist[m], pa.int64()),
            }
        )

    # ---- shortest-path counts (Brandes sigma, single-seed BFS) ---------
    #
    # sigma(v) = number of distinct shortest seed->v paths. In a BFS from
    # ONE seed every vertex of level k receives ALL its sigma mass in the
    # superstep whose frontier is level k-1 (each in-neighbor on a
    # shortest path sits exactly there), so a one-shot sum per newly
    # reached vertex is exact — the count stage of Brandes' betweenness.

    def sigma_init(self, seeds: np.ndarray) -> int:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "shortest_path_counts supports unsalted graphs only; build "
                "the ShardedGraph without salt_threshold"
            )
        INF = np.iinfo(np.int64).max
        self.dist = np.full(len(self.owned), INF, np.int64)
        self.sigma = np.zeros(len(self.owned), np.int64)
        self.changed = np.zeros(len(self.owned), bool)
        seeds = np.asarray(seeds, np.int64)
        idx = np.searchsorted(self.owned, seeds)
        m = idx < len(self.owned)
        idx, s = idx[m], seeds[m]
        hit = self.owned[idx] == s
        self.dist[idx[hit]] = 0
        self.sigma[idx[hit]] = 1
        self.changed[idx[hit]] = True
        return int(self.changed.sum())

    def sigma_scatter_parts(self):
        """Frontier vertices push their sigma toward out-neighbors,
        sum-combined per destination."""
        active = self.changed[self.src_in_owned]
        if active.any():
            s_edge = self._rank_per_edge(self.sigma[self.src_in_owned])
            act_edge = np.repeat(active, self.outdeg)
            sums = np.zeros(len(self.dst_u), np.int64)
            np.add.at(sums, self.dst_inv[act_edge], s_edge[act_edge].astype(np.int64))
        else:
            sums = None
        out = []
        for p in range(self.P):
            if sums is None:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
                continue
            idx = self.dst_by_part[p]
            m = sums[idx]
            live = m > 0
            out.append((self.dst_route[p][live], m[live]))
        return tuple(out)

    def sigma_apply_parts(self, rnd: int, *parts) -> int:
        self.changed = np.zeros(len(self.owned), bool)
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        sums = np.zeros(len(self.owned), np.int64)
        for idx, ss in live:
            np.add.at(sums, idx, ss)
        newly = (sums > 0) & (self.dist == np.iinfo(np.int64).max)
        self.dist[newly] = rnd
        self.sigma[newly] = sums[newly]
        self.changed = newly
        return int(newly.sum())

    def sigma_state(self, seed: int) -> pa.Table:
        m = self.dist < np.iinfo(np.int64).max
        n = int(m.sum())
        return pa.table(
            {
                "seed": pa.array(np.full(n, seed, np.int64)),
                "vertex": pa.array(self.owned[m], pa.int64()),
                "dist": pa.array(self.dist[m], pa.int64()),
                "sigma": pa.array(self.sigma[m], pa.int64()),
            }
        )

    # ---- batched multi-seed BFS (one exchange round serves S seeds) ----
    #
    # dist state is a (V_owned, S) matrix; messages carry (route_idx,
    # seed_idx, dist) triples so one superstep advances every seed's
    # frontier at once — S x fewer exchange barriers than looping seeds
    # (the fixed per-superstep latency dominates sampled-centrality
    # queries at sandbox scale; message VOLUME is unchanged).

    def bfsm_init(self, seeds: np.ndarray) -> int:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "multi-seed BFS supports unsalted graphs only; build the "
                "ShardedGraph without salt_threshold"
            )
        seeds = np.asarray(seeds, np.int64)
        INF = np.iinfo(np.int64).max
        S = len(seeds)
        self.mseeds = seeds
        self.mdist = np.full((len(self.owned), S), INF, np.int64)
        self.mchanged = np.zeros((len(self.owned), S), bool)
        idx = np.searchsorted(self.owned, seeds)
        ok = idx < len(self.owned)
        j = np.flatnonzero(ok)
        idx, sv = idx[ok], seeds[ok]
        hit = self.owned[idx] == sv
        self.mdist[idx[hit], j[hit]] = 0
        self.mchanged[idx[hit], j[hit]] = True
        return int(self.mchanged.sum())

    def bfsm_scatter_parts(self):
        INF = np.iinfo(np.int64).max
        S = self.mdist.shape[1]
        per_part_idx = [[] for _ in range(self.P)]
        per_part_seed = [[] for _ in range(self.P)]
        per_part_dd = [[] for _ in range(self.P)]
        src_rows = self.src_in_owned
        for j in range(S):
            active = self.mchanged[src_rows, j]
            if not active.any():
                continue
            d_edge = self._rank_per_edge(self.mdist[src_rows, j]) + 1
            act_edge = np.repeat(active, self.outdeg)
            mins = np.full(len(self.dst_u), INF)
            np.minimum.at(mins, self.dst_inv[act_edge], d_edge[act_edge])
            for p in range(self.P):
                idx = self.dst_by_part[p]
                m = mins[idx]
                live = m != INF
                if live.any():
                    per_part_idx[p].append(self.dst_route[p][live])
                    per_part_seed[p].append(
                        np.full(int(live.sum()), j, np.int16)
                    )
                    per_part_dd[p].append(m[live])
        out = []
        for p in range(self.P):
            if per_part_idx[p]:
                out.append(
                    (
                        np.concatenate(per_part_idx[p]),
                        np.concatenate(per_part_seed[p]),
                        np.concatenate(per_part_dd[p]),
                    )
                )
            else:
                out.append(
                    (
                        np.empty(0, np.int32),
                        np.empty(0, np.int16),
                        np.empty(0, np.int64),
                    )
                )
        return tuple(out)

    def bfsm_apply_parts(self, *parts) -> int:
        S = self.mdist.shape[1]
        self.mchanged = np.zeros(self.mdist.shape, bool)
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        flat_min = np.full(self.mdist.size, np.iinfo(np.int64).max)
        for idx, sj, dd in live:
            flat = idx.astype(np.int64) * S + sj
            np.minimum.at(flat_min, flat, dd)
        mins = flat_min.reshape(self.mdist.shape)
        better = mins < self.mdist
        self.mdist[better] = mins[better]
        self.mchanged = better
        return int(better.sum())

    def bfsm_fold_farness(self) -> int:
        """Fold every seed column into the farness accumulators at once
        (identical arithmetic to farness_fold per seed)."""
        INF = np.iinfo(np.int64).max
        m = self.mdist < INF
        self.far_cnt += m.sum(axis=1).astype(np.int64)
        d = np.where(m, self.mdist, 0)
        self.far_sum += d.sum(axis=1)
        pos = m & (self.mdist > 0)
        h = np.zeros(self.mdist.shape, np.int64)
        h[pos] = np.floor(
            1e9 / self.mdist[pos].astype(np.float64) + 0.5
        ).astype(np.int64)
        self.far_harm += h.sum(axis=1)
        return int(m.sum())

    def bfsm_hist(self, max_hops: int) -> pa.Table:
        """(seed, dist, n) histogram rows across all seed columns."""
        INF = np.iinfo(np.int64).max
        seeds_out, dists_out, counts_out = [], [], []
        for j, s in enumerate(self.mseeds):
            col = self.mdist[:, j]
            m = col < INF
            if not m.any():
                continue
            cnt = np.bincount(col[m], minlength=max_hops + 1)
            nz = np.flatnonzero(cnt)
            seeds_out.append(np.full(len(nz), s, np.int64))
            dists_out.append(nz.astype(np.int64))
            counts_out.append(cnt[nz].astype(np.int64))
        if not seeds_out:
            z = np.empty(0, np.int64)
            return pa.table({"seed": z, "dist": z, "n": z})
        return pa.table(
            {
                "seed": pa.array(np.concatenate(seeds_out)),
                "dist": pa.array(np.concatenate(dists_out)),
                "n": pa.array(np.concatenate(counts_out)),
            }
        )

    def bfsm_parity_masks(self) -> pa.Table:
        """(vertex, masks) for owned vertices reached by >= 1 seed: bit j
        of the low 31 bits = reached by seed j, bit (31+j) = dist_j is
        odd. One int64 per vertex regardless of seed count (S <= 31), so
        the bipartite conflict join ships V-scale rows once, not V*S."""
        INF = np.iinfo(np.int64).max
        fin = self.mdist < INF
        any_r = fin.any(axis=1)
        if not any_r.any():
            z = np.empty(0, np.int64)
            return pa.table({"vertex": z, "masks": z})
        S = self.mdist.shape[1]
        bits = (np.int64(1) << np.arange(S, dtype=np.int64))[None, :]
        rm = np.where(fin[any_r], bits, 0).sum(axis=1)
        odd = fin[any_r] & ((self.mdist[any_r] & 1) == 1)
        pm = np.where(odd, bits, 0).sum(axis=1)
        return pa.table(
            {
                "vertex": pa.array(self.owned[any_r], pa.int64()),
                "masks": pa.array(rm | (pm << np.int64(31)), pa.int64()),
            }
        )

    def bfsm_sample_dists(self, mod: int) -> pa.Table:
        """(vertex, seed, dist) rows for owned SAMPLE vertices (vertex %
        mod == 0) per reaching seed — the landmark distance table. Ships
        |owned|/mod * S rows max; everything else stays in the shard."""
        INF = np.iinfo(np.int64).max
        sel = np.flatnonzero(self.owned % mod == 0)
        z = np.empty(0, np.int64)
        if len(sel) == 0:
            return pa.table({"vertex": z, "seed": z, "dist": z})
        d = self.mdist[sel]
        ri, rj = np.nonzero(d < INF)
        if len(ri) == 0:
            return pa.table({"vertex": z, "seed": z, "dist": z})
        return pa.table(
            {
                "vertex": pa.array(self.owned[sel][ri], pa.int64()),
                "seed": pa.array(self.mseeds[rj], pa.int64()),
                "dist": pa.array(d[ri, rj], pa.int64()),
            }
        )

    # ---- downstream shortest-path counts (Brandes back-propagation) ----
    #
    # After a sigma BFS, g(v) = number of shortest paths STARTING at v
    # within the (truncated) BFS DAG: g(v) = sum over DAG successors w
    # (dist(w) = dist(v)+1) of (1 + g(w)). Computed level-by-level from
    # the deepest hop downward; on a SYMMETRIC graph the DAG predecessors
    # of a level-(k+1) vertex are exactly its neighbors at level k, so the
    # reverse exchange reuses the same forward routes. stress_s(v) =
    # sigma(v) * g(v) — the per-seed stress centrality, all exact int64.

    def gcount_init(self) -> int:
        self.g = np.zeros(len(self.owned), np.int64)
        return int((self.dist < np.iinfo(np.int64).max).sum())

    def gcount_scatter_parts(self, k: int):
        """Level-(k+1) vertices push (1 + g) toward all out-neighbors;
        only level-k receivers accept (the DAG-edge filter)."""
        active = self.dist[self.src_in_owned] == k + 1
        if active.any():
            v_edge = self._rank_per_edge(self.g[self.src_in_owned] + 1)
            act_edge = np.repeat(active, self.outdeg)
            sums = np.zeros(len(self.dst_u), np.int64)
            np.add.at(sums, self.dst_inv[act_edge], v_edge[act_edge].astype(np.int64))
        else:
            sums = None
        out = []
        for p in range(self.P):
            if sums is None:
                out.append((np.empty(0, np.int32), np.empty(0, np.int64)))
                continue
            idx = self.dst_by_part[p]
            m = sums[idx]
            live = m > 0
            out.append((self.dst_route[p][live], m[live]))
        return tuple(out)

    def gcount_apply_parts(self, k: int, *parts) -> int:
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        sums = np.zeros(len(self.owned), np.int64)
        for idx, ss in live:
            np.add.at(sums, idx, ss)
        ok = (self.dist == k) & (sums > 0)
        self.g[ok] += sums[ok]
        return int(ok.sum())

    def gcount_state(self, seed: int) -> pa.Table:
        m = self.dist < np.iinfo(np.int64).max
        n = int(m.sum())
        return pa.table(
            {
                "seed": pa.array(np.full(n, seed, np.int64)),
                "vertex": pa.array(self.owned[m], pa.int64()),
                "dist": pa.array(self.dist[m], pa.int64()),
                "sigma": pa.array(self.sigma[m], pa.int64()),
                "paths_from": pa.array(self.g[m], pa.int64()),
                "stress": pa.array(self.sigma[m] * self.g[m], pa.int64()),
            }
        )

    # ---- strongly connected components (forward-backward refinement) ---
    #
    # Label state: per owned vertex a block id PAIR (scc_bf, scc_bb) and a
    # phase value scc_val. Each phase is min-label propagation constrained
    # to stay WITHIN the current block: messages carry the sender's block
    # pair and the receiver accepts a min only when the pair matches its
    # own. Two ShardedGraph pools (forward / reversed edges) run the same
    # kernel; the superstep driver refines blocks to (f, b) fixpoint.

    def scc_init(self) -> None:
        if getattr(self, "mirrors", None):
            raise ValueError(
                "strongly_connected_components supports unsalted graphs "
                "only; build the ShardedGraph without salt_threshold"
            )
        n = len(self.owned)
        self.scc_bf = np.zeros(n, np.int64)
        self.scc_bb = np.zeros(n, np.int64)
        self.scc_val = self.owned.copy()
        # per-dst_u routing (triple-combined scatters can't reuse the
        # positional dst_by_part slices): part + owner-local index per dst
        self._dstu_part = np.empty(len(self.dst_u), np.int32)
        self._dstu_route = np.empty(len(self.dst_u), np.int32)
        for p in range(self.P):
            self._dstu_part[self.dst_by_part[p]] = p
            self._dstu_route[self.dst_by_part[p]] = self.dst_route[p]

    def scc_phase_init(self) -> int:
        """Start a propagation phase: every vertex reaches itself."""
        self.scc_val = self.owned.copy()
        self.changed = np.ones(len(self.owned), bool)
        return len(self.owned)

    def scc_scatter_parts(self):
        empty = (
            np.empty(0, np.int32),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
        active = self.changed[self.src_in_owned]
        if not active.any():
            return tuple(empty for _ in range(self.P))
        val_e = self._rank_per_edge(self.scc_val[self.src_in_owned])
        bf_e = self._rank_per_edge(self.scc_bf[self.src_in_owned])
        bb_e = self._rank_per_edge(self.scc_bb[self.src_in_owned])
        act = np.repeat(active, self.outdeg)
        du, val_e, bf_e, bb_e = (
            self.dst_inv[act], val_e[act], bf_e[act], bb_e[act],
        )
        # min-combine per (dst, block_f, block_b) triple
        trip = np.stack([du, bf_e, bb_e], axis=1)
        uniq, inv = np.unique(trip, axis=0, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(mins, inv, val_e)
        tdu = uniq[:, 0]
        tp = self._dstu_part[tdu]
        out = []
        for p in range(self.P):
            m = tp == p
            out.append(
                (
                    self._dstu_route[tdu[m]],
                    uniq[:, 1][m],
                    uniq[:, 2][m],
                    mins[m],
                )
            )
        return tuple(out)

    def scc_apply_parts(self, *parts) -> int:
        self.changed = np.zeros(len(self.owned), bool)
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        INF = np.iinfo(np.int64).max
        cand = np.full(len(self.owned), INF)
        for idx, bf, bb, val in live:
            ok = (self.scc_bf[idx] == bf) & (self.scc_bb[idx] == bb)
            np.minimum.at(cand, idx[ok], val[ok])
        better = cand < self.scc_val
        self.scc_val[better] = cand[better]
        self.changed[better] = True
        return int(better.sum())

    def scc_vals(self) -> np.ndarray:
        return self.scc_val

    def scc_owned_ids(self) -> np.ndarray:
        return self.owned

    def scc_set_blocks(self, bf: np.ndarray, bb: np.ndarray) -> int:
        ch = (bf != self.scc_bf) | (bb != self.scc_bb)
        self.scc_bf = np.asarray(bf, np.int64)
        self.scc_bb = np.asarray(bb, np.int64)
        return int(ch.sum())

    def scc_state(self) -> pa.Table:
        if not (self.scc_bf == self.scc_bb).all():
            raise AssertionError("SCC fixpoint violated: f != b")
        return pa.table(
            {
                "vertex": pa.array(self.owned, pa.int64()),
                "scc_id": pa.array(self.scc_bf, pa.int64()),
            }
        )

    def bfs_hist(self, max_hops: int) -> np.ndarray:
        """Shard-local histogram of the current BFS distances (reached
        vertices only) — a bounded (max_hops+1)-long vector, so a per-seed
        hop profile costs O(hops) driver traffic per shard, never a
        per-vertex table."""
        m = self.dist < np.iinfo(np.int64).max
        d = np.minimum(self.dist[m], max_hops)
        return np.bincount(d, minlength=max_hops + 1)

    # ---- maximal independent set (greedy-by-id, parallel rounds) -------
    #
    # Luby-style rounds with the DETERMINISTIC priority = vertex id: an
    # undecided vertex joins when no smaller-id undecided neighbor exists,
    # then its neighbors are excluded. Computes the lexicographically-first
    # MIS (identical to the sequential greedy by ascending id), two
    # exchanges per round, frontier shrinks geometrically.

    def mis_init(self) -> int:
        self.mis_state = np.zeros(len(self.owned), np.int8)  # 0 = undecided
        self.mis_round = np.zeros(len(self.owned), np.int64)
        self.mis_joined = np.zeros(len(self.owned), bool)
        return len(self.owned)

    def mis_min_scatter_parts(self):
        """Min undecided-neighbor id toward each destination."""
        INF = np.iinfo(np.int64).max
        und = self.mis_state[self.src_in_owned] == 0
        mins = np.full(len(self.dst_u), INF)
        if und.any():
            ids = self._rank_per_edge(self.owned[self.src_in_owned])
            act = np.repeat(und, self.outdeg)
            np.minimum.at(mins, self.dst_inv[act], ids[act])
        out = []
        for p in range(self.P):
            idx = self.dst_by_part[p]
            m = mins[idx]
            live = m != INF
            out.append((self.dst_route[p][live], m[live]))
        return tuple(out)

    def mis_min_apply_parts(self, rnd: int, *parts) -> int:
        INF = np.iinfo(np.int64).max
        mins = np.full(len(self.owned), INF)
        for idx, mm in parts:
            if len(idx):
                np.minimum.at(mins, idx, mm)
        join = (self.mis_state == 0) & (self.owned < mins)
        self.mis_joined = join
        self.mis_state[join] = 1
        self.mis_round[join] = rnd
        return int(join.sum())

    def mis_excl_scatter_parts(self):
        """One exclusion flag per destination adjacent to a new member."""
        flags = np.zeros(len(self.dst_u), bool)
        j = self.mis_joined[self.src_in_owned]
        if j.any():
            act = np.repeat(j, self.outdeg)
            flags[self.dst_inv[act]] = True
        return tuple(
            (self.dst_route[p][flags[self.dst_by_part[p]]],)
            for p in range(self.P)
        )

    def mis_excl_apply_parts(self, *parts) -> int:
        excl = np.zeros(len(self.owned), bool)
        for (idx,) in parts:
            if len(idx):
                excl[idx] = True
        newly = excl & (self.mis_state == 0)
        self.mis_state[newly] = 2
        return int(newly.sum())

    # ---- maximal matching (deterministic mutual-min handshake rounds) --
    #
    # Each round every FREE vertex points at its minimum-id free neighbor;
    # an edge is matched iff the pointers are mutual. Whenever any free
    # vertex still has a free neighbor, the globally minimal such vertex
    # is always mutually pointed at, so every round matches >= 1 pair and
    # the fixpoint is a MAXIMAL matching. Two exchanges per round: the
    # pointer min, then (min src, that src's pointer) so each vertex sees
    # m(m(v)) without shipping per-edge pointer tables.

    def match_init(self) -> int:
        INF = np.iinfo(np.int64).max
        self.mt_free = np.ones(len(self.owned), bool)
        self.mt_partner = np.full(len(self.owned), -1, np.int64)
        self.mt_round = np.zeros(len(self.owned), np.int64)
        self.mt_ptr = np.full(len(self.owned), INF, np.int64)
        return len(self.owned)

    def match_min_scatter_parts(self):
        """Min free-src id toward each destination (pointer candidates)."""
        INF = np.iinfo(np.int64).max
        fr = self.mt_free[self.src_in_owned]
        mins = np.full(len(self.dst_u), INF)
        if fr.any():
            ids = self._rank_per_edge(self.owned[self.src_in_owned])
            act = np.repeat(fr, self.outdeg)
            np.minimum.at(mins, self.dst_inv[act], ids[act])
        out = []
        for p in range(self.P):
            idx = self.dst_by_part[p]
            m = mins[idx]
            live = m != INF
            out.append((self.dst_route[p][live], m[live]))
        return tuple(out)

    def match_min_apply_parts(self, *parts) -> int:
        INF = np.iinfo(np.int64).max
        mins = np.full(len(self.owned), INF)
        for idx, mm in parts:
            if len(idx):
                np.minimum.at(mins, idx, mm)
        mins[~self.mt_free] = INF
        self.mt_ptr = mins
        return int((mins != INF).sum())

    def match_mut_scatter_parts(self):
        """Per destination: the min free src id AND that src's pointer
        (src ids are unique per destination after CSR dedup, so the
        argmin's pointer is fetched by one equality mask)."""
        INF = np.iinfo(np.int64).max
        src_ptr = self.mt_ptr[self.src_in_owned]
        fr = self.mt_free[self.src_in_owned] & (src_ptr != INF)
        mins = np.full(len(self.dst_u), INF)
        ptrs = np.full(len(self.dst_u), INF)
        if fr.any():
            ids = self._rank_per_edge(self.owned[self.src_in_owned])
            pts = self._rank_per_edge(src_ptr)
            act = np.repeat(fr, self.outdeg)
            ids_f, pts_f, dinv_f = ids[act], pts[act], self.dst_inv[act]
            np.minimum.at(mins, dinv_f, ids_f)
            eq = ids_f == mins[dinv_f]
            ptrs[dinv_f[eq]] = pts_f[eq]
        out = []
        for p in range(self.P):
            idx = self.dst_by_part[p]
            m = mins[idx]
            live = m != INF
            out.append(
                (self.dst_route[p][live], m[live], ptrs[idx][live])
            )
        return tuple(out)

    def match_mut_apply_parts(self, rnd: int, *parts) -> int:
        INF = np.iinfo(np.int64).max
        mins = np.full(len(self.owned), INF)
        ptrs = np.full(len(self.owned), INF)
        for idx, mm, pp in parts:
            if len(idx):
                upd = mm < mins[idx]
                mins[idx[upd]] = mm[upd]
                ptrs[idx[upd]] = pp[upd]
        matched = self.mt_free & (mins != INF) & (ptrs == self.owned)
        self.mt_partner[matched] = mins[matched]
        self.mt_round[matched] = rnd
        self.mt_free[matched] = False
        return int(matched.sum())

    def match_state_table(self) -> pa.Table:
        """(vertex, partner, round), one row per matched PAIR — emitted
        from the lower endpoint only."""
        m = (self.mt_partner >= 0) & (self.owned < self.mt_partner)
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "partner": pa.array(self.mt_partner[m], pa.int64()),
                "round": pa.array(self.mt_round[m], pa.int64()),
            }
        )

    # ---- greedy distance-1 coloring (iterated MIS phases) --------------
    #
    # color k = greedy-by-id MIS of the subgraph induced on still-
    # uncolored vertices (the distributed scheduling-coloring of the
    # GraphLab/Gonzalez lineage). Colored vertices park in mis_state 3 so
    # the unchanged MIS kernels ignore them; exclusion (state 2) clears at
    # each phase boundary, returning those vertices to the pool.

    def color_init(self) -> int:
        self.color = np.zeros(len(self.owned), np.int64)  # 0 = uncolored
        return len(self.owned)

    def color_phase_init(self) -> int:
        und = self.color == 0
        self.mis_state = np.where(und, 0, 3).astype(np.int8)
        self.mis_round = np.zeros(len(self.owned), np.int64)
        self.mis_joined = np.zeros(len(self.owned), bool)
        return int(und.sum())

    def color_assign(self, c: int) -> int:
        mem = self.mis_state == 1
        self.color[mem] = c
        return int(mem.sum())

    def color_state(self) -> pa.Table:
        m = self.color > 0
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "color": pa.array(self.color[m], pa.int64()),
            }
        )

    def mis_state_table(self) -> pa.Table:
        m = self.mis_state == 1
        return pa.table(
            {
                "vertex": pa.array(self.owned[m], pa.int64()),
                "round": pa.array(self.mis_round[m], pa.int64()),
            }
        )

    # ---- sampled farness (closeness from a seed sample) ---------------

    def farness_init(self) -> None:
        self.far_cnt = np.zeros(len(self.owned), np.int64)
        self.far_sum = np.zeros(len(self.owned), np.int64)
        self.far_harm = np.zeros(len(self.owned), np.int64)

    def farness_fold(self) -> int:
        """Fold the current BFS dist state into the farness accumulators
        (reached vertices only) — called once per sample seed's BFS. The
        harmonic accumulator adds floor(1e9/d + 0.5) integer nano-units
        per positive distance (the seed's own d=0 contributes nothing),
        so sums stay exact and order-independent."""
        m = self.dist < np.iinfo(np.int64).max
        self.far_cnt[m] += 1
        self.far_sum[m] += self.dist[m]
        pos = m & (self.dist > 0)
        self.far_harm[pos] += np.floor(
            1e9 / self.dist[pos].astype(np.float64) + 0.5
        ).astype(np.int64)
        return int(m.sum())

    def farness_state(self, harmonic: bool = False) -> pa.Table:
        m = self.far_cnt > 0
        cols = {
            "vertex": pa.array(self.owned[m], pa.int64()),
            "reach_cnt": pa.array(self.far_cnt[m], pa.int64()),
            "dist_sum": pa.array(self.far_sum[m], pa.int64()),
        }
        if harmonic:
            cols["harmonic_e9"] = pa.array(self.far_harm[m], pa.int64())
        return pa.table(cols)

    # ---- warm-start (incremental) PageRank ---------------------------

    def warm_init_rank(self, default: float) -> None:
        """Initialize every owned vertex's rank to `default` — the base
        for a warm-start overlay (new vertices keep the default)."""
        self.rank = np.full(len(self.owned), default, np.float64)

    def warm_overlay_label(self, vertex: np.ndarray, values: np.ndarray) -> int:
        """Overlay prior component labels for warm-start (incremental)
        CC; marks every vertex changed so the next round re-propagates
        from the overlaid state (idempotent for min-label convergence)."""
        vertex = np.asarray(vertex, np.int64)
        values = np.asarray(values, np.int64)
        if not len(self.owned) or not len(vertex):
            return 0
        idx = np.clip(np.searchsorted(self.owned, vertex), 0, len(self.owned) - 1)
        m = self.owned[idx] == vertex
        self.label[idx[m]] = values[m]
        self.changed = np.ones(len(self.owned), bool)
        return int(m.sum())

    def warm_overlay_rank(self, vertex: np.ndarray, values: np.ndarray) -> int:
        """Overlay prior ranks onto owned vertices (ignores rows this
        shard does not own — the router sends exact slices anyway)."""
        vertex = np.asarray(vertex, np.int64)
        values = np.asarray(values, np.float64)
        if not len(self.owned) or not len(vertex):
            return 0
        idx = np.clip(np.searchsorted(self.owned, vertex), 0, len(self.owned) - 1)
        m = self.owned[idx] == vertex
        self.rank[idx[m]] = values[m]
        return int(m.sum())

    # ---- deterministic random walks ----------------------------------

    _WALK_C1 = 2654435761  # Knuth multiplicative constant
    _WALK_C2 = 40503

    def walk_next(self, walk_ids: np.ndarray, vs: np.ndarray, step: int):
        """One walk step for walks currently AT vertices this shard owns:
        next vertex = the ((walk_id*C1 + step*C2) mod deg)-th neighbor in
        sorted-dst order (the CSR adjacency is (src, dst)-sorted, so the
        pick mirrors a SQL row_number() OVER (ORDER BY dst) selection).
        Returns (walk_ids, next_vertex) for walks whose vertex exists and
        has out-edges; the rest terminate silently."""
        walk_ids = np.asarray(walk_ids, np.int64)
        vs = np.asarray(vs, np.int64)
        if not len(self.srcs) or not len(vs):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        i = np.clip(np.searchsorted(self.srcs, vs), 0, len(self.srcs) - 1)
        live = self.srcs[i] == vs
        walk_ids, i = walk_ids[live], i[live]
        start = self.indptr[i]
        deg = self.outdeg[i]
        r = (walk_ids * self._WALK_C1 + step * self._WALK_C2) % deg
        return walk_ids, self.dsts[start + r]

    def lp_scatter_parts(self):
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        pairs = np.stack([self.dst_inv, lbl_edge], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        inv = uniq[:, 0].astype(np.int64)
        dpart = self.dst_part[inv]
        loc = self.dst_loc[inv]
        lab = uniq[:, 1]
        cnt = counts.astype(np.int64)
        # salted hot sources: per-(mirror dst, label) counts ride along
        if getattr(self, "mirrors", None) and len(self.m_dst_u):
            mlbl = np.concatenate(
                [np.repeat(m["rank"], m["cnt"]) for m in self.mirrors.values()]
            ).astype(np.int64)
            mpairs = np.stack([self.m_dst_inv, mlbl], axis=1)
            muniq, mcounts = np.unique(mpairs, axis=0, return_counts=True)
            minv = muniq[:, 0].astype(np.int64)
            dpart = np.concatenate([dpart, self.m_dst_partof[minv]])
            loc = np.concatenate([loc, self.m_dst_loc[minv]])
            lab = np.concatenate([lab, muniq[:, 1]])
            cnt = np.concatenate([cnt, mcounts.astype(np.int64)])
        order = np.argsort(dpart, kind="stable")
        bounds = np.searchsorted(dpart[order], np.arange(self.P + 1))
        out = []
        for p in range(self.P):
            sl = order[bounds[p] : bounds[p + 1]]
            out.append((loc[sl], lab[sl], cnt[sl]))
        return tuple(out)

    def lp_apply_parts(self, *parts) -> int:
        """Mode aggregation in owner-local index space (ties → min label)."""
        live = [p for p in parts if len(p[0])]
        if not live:
            return 0
        idx = np.concatenate([p[0] for p in live]).astype(np.int64)
        lab = np.concatenate([p[1] for p in live])
        cnt = np.concatenate([p[2] for p in live])
        pairs = np.stack([idx, lab], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.bincount(inv, weights=cnt, minlength=len(uniq)).astype(np.int64)
        order = np.lexsort((uniq[:, 1], -sums, uniq[:, 0]))
        u2 = uniq[order]
        first = np.concatenate([[True], u2[1:, 0] != u2[:-1, 0]])
        vidx = u2[first, 0]
        ll = u2[first, 1]
        changed = int((self.label[vidx] != ll).sum())
        self.label[vidx] = ll
        return changed

    def pagerank_apply(
        self, vertex: np.ndarray, contrib: np.ndarray, dangling: float, damping: float
    ) -> float:
        t = getattr(self, "teleport", None)
        if t is None:
            base = (1.0 - damping) / self.n_total + damping * dangling / self.n_total
            new = np.full(len(self.owned), base)
        else:
            new = (1.0 - damping) * t + damping * dangling * t
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
        combined by dst with min (the partial aggregate). Salted mirror
        chunks contribute extra rows (the dataset combine min-dedups)."""
        INF = np.iinfo(np.int64).max
        active = self.changed[self.src_in_owned]
        dparts, verts, lbls = [], [], []
        if active.any():
            lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
            act_edge = self._rank_per_edge(active.astype(np.int64)).astype(bool)
            inv = self.dst_inv[act_edge]
            lbl = lbl_edge[act_edge]
            mins = np.full(len(self.dst_u), INF)
            np.minimum.at(mins, inv, lbl)
            live = mins != INF
            dparts.append(self.dst_part[live])
            verts.append(self.dst_u[live])
            lbls.append(mins[live])
        mmins = self._mirror_label_mins()
        if mmins is not None:
            live = mmins != INF
            dparts.append(self.m_dst_partof[live])
            verts.append(self.m_dst_u[live])
            lbls.append(mmins[live])
        if not dparts:
            return pa.table(
                {
                    "dpart": np.empty(0, np.int32),
                    "vertex": np.empty(0, np.int64),
                    "label": np.empty(0, np.int64),
                }
            )
        return pa.table(
            {
                "dpart": np.concatenate(dparts).astype(np.int32),
                "vertex": np.concatenate(verts),
                "label": np.concatenate(lbls),
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
        """Emit per-(dst, label) counts — the combiner for the mode agg.
        Salted mirror chunks ride along as extra rows (the dataset combine
        sums counts per (vertex, label))."""
        lbl_edge = self._rank_per_edge(self.label[self.src_in_owned])
        pairs = np.stack([self.dst_inv, lbl_edge], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        inv = uniq[:, 0].astype(np.int64)
        dpart = self.dst_part[inv]
        vertex = self.dst_u[inv]
        lab = uniq[:, 1]
        cnt = counts.astype(np.int64)
        if getattr(self, "mirrors", None) and len(self.m_dst_u):
            mlbl = np.concatenate(
                [np.repeat(m["rank"], m["cnt"]) for m in self.mirrors.values()]
            ).astype(np.int64)
            mpairs = np.stack([self.m_dst_inv, mlbl], axis=1)
            muniq, mcounts = np.unique(mpairs, axis=0, return_counts=True)
            minv = muniq[:, 0].astype(np.int64)
            dpart = np.concatenate([dpart, self.m_dst_partof[minv]])
            vertex = np.concatenate([vertex, self.m_dst_u[minv]])
            lab = np.concatenate([lab, muniq[:, 1]])
            cnt = np.concatenate([cnt, mcounts.astype(np.int64)])
        return pa.table(
            {"dpart": dpart, "vertex": vertex, "label": lab, "cnt": cnt}
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
