"""The superstep engine + the four north-star link-graph algorithms.

Architecture (BASELINE.json north_star, SURVEY.md §7.1): edges are
hash-partitioned into CSR shards held by a stateful actor pool
(`state/csr.py`); one superstep =

1. **gather-scatter**: every shard emits per-vertex partial contributions
   as an Arrow table (already combined by destination inside the shard —
   the combiner half of the aggregation);
2. **groupby-aggregate shuffle**: the partials become a Ray `Dataset`
   (`from_arrow_refs`, zero-copy) and are hash-shuffled by destination
   partition; per-partition reduce merges partials and pushes the result
   back into the owning shard;
3. convergence is a tiny per-partition scalar reduced on the driver.

Per-superstep data movement is O(partials) = O(min(E, V·P)) after
combining, never O(E) re-shuffles of the graph itself. Skewed high-degree
destinations are absorbed by the combiner (each shard emits at most one row
per distinct destination per superstep — this IS the salting: a hot vertex's
in-contributions arrive pre-summed per source partition, max P rows).

The generalization of the reference's only iterative graph routine — the
BFS connected components over the LSH co-bucket graph
(`/root/reference/main.cpp:672-721`) — plus the three algorithms the north
rule adds (PageRank, label propagation, triangle counting).

Triangle counting is pure Dataset dataflow (degree-ordered orientation +
wedge hash join, SURVEY.md §7.4) — no mutable state, so no actors.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import part_of
from ..state.csr import CsrShard

_EMPTY_I64 = np.empty(0, np.int64)
_EMPTY_F64 = np.empty(0, np.float64)

# per-worker-process in-flight window for graph-build ingest pushes: module
# globals persist across map_batches invocations inside one Ray worker, so
# the fused read+route task overlaps parsing with shard ingest instead of
# barriering every batch (completion is enforced by the build's counter
# barrier, not by draining this list)
_ROUTE_PENDING: list = []


class ShardedGraph:
    """A graph distributed over a CsrShard actor pool."""

    def __init__(self, num_parts: int, symmetric: bool):
        self.P = num_parts
        self.symmetric = symmetric
        self.salted = False
        self.weighted = False
        self.actors = [CsrShard.remote(p, num_parts) for p in range(num_parts)]
        # fire-and-forget: per-caller actor mailboxes are FIFO, so set_peers
        # is processed before any later call; blocking here would serialize
        # on every actor process cold-start
        for a in self.actors:
            a.set_peers.remote(self.actors)
        self.n_vertices = 0
        self._owner_pid = os.getpid()

    def shutdown(self, drain_timeout: float = 60.0) -> None:
        """Kill the shard pool. REQUIRED for actor reclamation: set_peers
        gives every shard handles to all its peers, an actor-handle CYCLE
        that Ray's distributed refcounting never collects — dropping the
        driver-side handles alone leaks the whole pool for the session
        lifetime (the accumulation behind the r03 full-suite flake: ~500
        idle CsrShard processes eventually exhaust worker threads).

        Drains each actor's FIFO mailbox first (a __ray_ready__ barrier
        behind any state_table/from_arrow_refs fetches already submitted,
        whose results then live in the object store owned by this driver
        and survive the kill), so `g = build(); return pagerank(g)` stays
        safe when the wrapper is dropped at function exit. Idempotent;
        safe after ray.shutdown()."""
        actors, self.actors = getattr(self, "actors", []), []
        if not actors:
            return
        try:
            refs = [a.__ray_ready__.remote() for a in actors]
            ray.wait(refs, num_returns=len(refs), timeout=drain_timeout)
        except Exception:
            pass
        for a in actors:
            try:
                ray.kill(a, no_restart=True)
            except Exception:
                pass

    def __del__(self):  # driver-side wrapper is cycle-free -> prompt GC
        try:
            if os.getpid() == getattr(self, "_owner_pid", -1):
                self.shutdown()
        except Exception:
            pass

    @classmethod
    def build(
        cls,
        edges: ray.data.Dataset,
        num_parts: int = 32,
        symmetric: bool = False,
        salt_threshold: int | None = None,
        weighted: bool = False,
    ) -> "ShardedGraph":
        """Stream the (src, dst) dataset into shards — no global shuffle.

        weighted=True: keep each (src, dst) pair's MULTIPLICITY in the raw
        stream as an integer edge weight (e.g. one row per lineitem →
        weight = lineitem count); pagerank then scatters rank*w/W instead
        of rank/outdeg. Incompatible with salt_threshold (mirror chunks
        carry no weights).

        Each read/extract task routes its batch rows directly to the owning
        shard actors (edge → part(src), reverse edge → part(dst) when
        symmetric, vertex registration → part(vertex)). finalize() dedups,
        so task retries are idempotent.

        salt_threshold: sources with out-degree above it are SALTED — their
        adjacency is split into P mirror chunks spread across all shards
        (store-to-store, never via the driver); each superstep the owner
        pushes the hot state (ranks / labels+changed) once per peer. Wired
        for PageRank, CC and LP; the combiner independently bounds
        hot-DESTINATION fan-in at P rows.
        """
        if weighted and salt_threshold is not None:
            raise ValueError(
                "weighted builds do not support salting; drop salt_threshold"
            )
        g = cls(num_parts, symmetric)
        g.weighted = weighted
        actors = g.actors
        P = num_parts

        def route(batch: pa.Table) -> pa.Table:
            """ONE combined ingest call per (batch, partition), and no
            per-batch barrier: sends stay in a bounded per-worker in-flight
            window (`_ROUTE_PENDING`, module-global so it persists across
            batches in the fused read+route task), overlapping parse with
            shard ingest. Completion is guaranteed by the counter barrier
            below, not by awaiting each batch."""
            src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            sp = part_of(src, P)
            dp = part_of(dst, P)
            for p in range(P):
                ms = sp == p
                md = dp == p
                if symmetric:
                    e_src = np.concatenate([src[ms], dst[md]])
                    e_dst = np.concatenate([dst[ms], src[md]])
                    vtx = np.concatenate([dst[md], src[ms]])
                else:
                    e_src, e_dst, vtx = src[ms], dst[ms], dst[md]
                if len(e_src) or len(vtx):
                    _ROUTE_PENDING.append(
                        actors[p].ingest.remote(e_src, e_dst, vtx)
                    )
            if len(_ROUTE_PENDING) > 64:
                _, rest = ray.wait(
                    _ROUTE_PENDING,
                    num_returns=len(_ROUTE_PENDING) - 32,
                    fetch_local=False,
                )
                _ROUTE_PENDING[:] = rest
            k = 2 if symmetric else 1
            return pa.table(
                {
                    "e": pa.array([len(src) * k], pa.int64()),
                    "v": pa.array([len(dst) + (len(src) if symmetric else 0)], pa.int64()),
                }
            )

        routed = edges.select_columns(["src", "dst"]).map_batches(
            route, batch_format="pyarrow", batch_size=65536
        )
        expected_e = expected_v = 0
        for r in routed.take_all():
            expected_e += r["e"]
            expected_v += r["v"]
        # completion barrier: wait until every shard has RECEIVED the routed
        # totals (>=, not ==: a retried route task re-delivers and
        # finalize() dedups). Fails loudly only when delivery STALLS: the
        # deadline is an inactivity window that resets whenever the received
        # counters make progress, so a large or contended build that is
        # still legitimately draining never trips it.
        import time as _time

        STALL_S = 300.0
        deadline = _time.monotonic() + STALL_S
        last = (-1, -1)
        while True:
            got = ray.get([a.ingest_counts.remote() for a in actors])
            ge = sum(e for e, _ in got)
            gv = sum(v for _, v in got)
            if ge >= expected_e and gv >= expected_v:
                break
            if (ge, gv) != last:
                last = (ge, gv)
                deadline = _time.monotonic() + STALL_S
            elif _time.monotonic() > deadline:
                raise RuntimeError(
                    f"graph build barrier stalled >{STALL_S:.0f}s: got "
                    f"({ge},{gv}) expected ({expected_e},{expected_v})"
                )
            _time.sleep(0.005)
        infos = ray.get([a.finalize.remote(weighted) for a in actors])
        g.n_vertices = sum(i["owned"] for i in infos)
        g.n_edges = sum(i["edges"] for i in infos)

        g.salted = False
        if salt_threshold is not None:
            hot = ray.get([a.hot_srcs.remote(salt_threshold) for a in actors])
            if any(len(h) for h in hot):
                g.salted = True
                # chunk refs flow store-to-store: the driver only forwards
                # ObjectRefs, never the adjacency data
                refs = []
                for a in actors:
                    f = a.split_hot.options(num_returns=P)
                    r = f.remote(salt_threshold)
                    refs.append([r] if P == 1 else list(r))
                ray.get(
                    [
                        actors[p].add_mirror.remote(q, refs[q][p])
                        for q in range(P)
                        for p in range(P)
                    ]
                )
                ray.get(
                    [a.set_hot_order.remote(h) for a, h in zip(actors, hot)]
                )
                ray.get([a.finalize_mirrors.remote() for a in actors])

        # one-time routing exchange: owner-local int32 indexes for every
        # shard's destination slices — supersteps then ship indexes, not
        # vertex ids, and the apply side needs no searchsorted
        pending = []
        for q in range(P):
            for p in range(P):
                vref = actors[q].route_request.remote(p)
                iref = actors[p].rank_vertices.remote(vref)
                pending.append(actors[q].set_route.remote(p, iref))
        if g.salted:
            for q in range(P):
                for p in range(P):
                    vref = actors[q].mirror_route_request.remote(p)
                    iref = actors[p].rank_vertices.remote(vref)
                    pending.append(actors[q].set_mirror_route.remote(p, iref))
        ray.get(pending)
        return g

    # ------------------------------------------------------------------

    def _exchange(self, algo: str, scatter_args=(), apply_args=()):
        """One superstep via the push-based actor-to-actor exchange (see
        state/csr.py): every shard fires its pre-partitioned partials
        directly at the owning peers; applies await the P-message barrier.
        Driver cost is 2P refs per superstep (the earlier driver-routed
        ref matrix cost O(P^2) object handoffs and dominated wall-time at
        P>16). The Dataset groupby path (_combine_push) expresses the same
        partial/final aggregation as dataflow when preferred."""
        ray.get([a.push_parts.remote(algo, *scatter_args) for a in self.actors])
        return ray.get(
            [a.apply_pushed.remote(algo, *apply_args) for a in self.actors]
        )

    def _combine_push(self, scatter_refs, combine_and_apply):
        """Steps 2-3 of a superstep: groupby-aggregate shuffle of partials,
        reduce-side merge, push into owning shard. Returns {part: result}."""
        contribs = ray.data.from_arrow_refs(scatter_refs)

        def push(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"part": _EMPTY_I64, "res": _EMPTY_F64})
            p = int(g["dpart"][0].as_py())
            res = combine_and_apply(p, g)
            return pa.table(
                {
                    "part": pa.array([p], pa.int64()),
                    "res": pa.array([float(res)], pa.float64()),
                }
            )

        rows = (
            contribs.groupby("dpart")
            .map_groups(push, batch_format="pyarrow")
            .take_all()
        )
        return {int(r["part"]): r["res"] for r in rows}

    def state_dataset(self, col: str) -> ray.data.Dataset:
        return ray.data.from_arrow_refs(
            [a.state_table.remote(col) for a in self.actors]
        )

    def checkpoint(self, col: str, ckpt_dir: str, iteration: int, counters: dict):
        """Per-partition parquet + manifest (lineage unit, north_rule)."""
        import pyarrow.parquet as pq

        d = os.path.join(ckpt_dir, f"iter={iteration}")
        os.makedirs(d, exist_ok=True)
        tables = ray.get([a.state_table.remote(col) for a in self.actors])
        for p, t in enumerate(tables):
            path = os.path.join(d, f"part-{p:05d}.parquet")
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
        manifest = {
            "iteration": iteration,
            "column": col,
            "num_parts": self.P,
            "counters": counters,
        }
        tmp = os.path.join(ckpt_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))

    def restore(self, ckpt_dir: str) -> dict | None:
        """Load the latest complete checkpoint into the shards; returns the
        manifest (or None when there is nothing to resume from)."""
        import pyarrow.parquet as pq

        mpath = os.path.join(ckpt_dir, "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            manifest = json.load(f)
        col = manifest["column"]
        d = os.path.join(ckpt_dir, f"iter={manifest['iteration']}")
        pending = []
        for p, a in enumerate(self.actors):
            t = pq.read_table(os.path.join(d, f"part-{p:05d}.parquet"))
            pending.append(
                a.load_state.remote(
                    col,
                    t["vertex"].to_numpy(),
                    t[col].to_numpy(zero_copy_only=False),
                )
            )
        ray.get(pending)
        return manifest


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def pagerank(
    graph: ShardedGraph,
    damping: float = 0.85,
    max_iters: int = 100,
    tol: float = 1e-10,
    ckpt_dir: str | None = None,
    ckpt_every: int = 5,
    combine: str = "direct",
    teleport_seeds: np.ndarray | None = None,
    skip_init: bool = False,
) -> ray.data.Dataset:
    """Synchronous power iteration with dangling-mass redistribution.

    rank_{t+1}(v) = (1-d)/N + d * (dangling_t/N + sum_{u->v} rank_t(u)/deg(u));
    stops when the L1 delta < tol or at max_iters. Matches the single-node
    oracle to allclose(1e-6) (order-free float sums within f64 tolerance).

    teleport_seeds: PERSONALIZED PageRank — teleport (and dangling) mass
    lands uniformly on the seed set instead of all vertices; rank0 = the
    teleport vector. Same scatter/exchange; only the per-vertex base term
    changes (state/csr.py ppr_init / pagerank_apply_parts).

    combine="direct" (default): actor-to-actor object-store exchange of the
    pre-partitioned partials. combine="dataset": the same partial/final
    aggregation as a Ray Data groupby shuffle (for very large P).
    """
    actors = graph.actors
    mode = "ppr" if teleport_seeds is not None else "classic"
    start_iter = 0
    if ckpt_dir is not None:
        manifest = graph.restore(ckpt_dir)
        if manifest is not None and manifest["column"] == "rank":
            ck_mode = manifest.get("counters", {}).get("mode", "classic")
            if ck_mode != mode:
                raise ValueError(
                    f"checkpoint at {ckpt_dir} was written by a {ck_mode} "
                    f"pagerank run but this run is {mode}; resuming would "
                    f"silently change semantics — use a fresh ckpt_dir"
                )
            start_iter = manifest["iteration"] + 1
    if skip_init:
        # warm start: ranks were pre-seeded (warm_start_ranks); only the
        # per-vertex base term needs the vertex count
        ray.get([a.set_n_total.remote(graph.n_vertices) for a in actors])
    elif start_iter == 0:
        if teleport_seeds is not None:
            seeds = np.unique(np.asarray(teleport_seeds, np.int64))
            ray.get([a.ppr_init.remote(seeds, len(seeds)) for a in actors])
        else:
            ray.get([a.pagerank_init.remote(graph.n_vertices) for a in actors])
    elif teleport_seeds is not None:
        # resume: ranks came from the checkpoint; rebuild only the derived
        # teleport vector from the (deterministic) seed set
        seeds = np.unique(np.asarray(teleport_seeds, np.int64))
        ray.get([a.ppr_set_teleport.remote(seeds, len(seeds)) for a in actors])
    else:
        ray.get([a.set_n_total.remote(graph.n_vertices) for a in actors])

    for it in range(start_iter, max_iters):
        dangling = sum(ray.get([a.dangling_rank.remote() for a in actors]))
        if graph.salted:
            # owners fan the salted hot ranks out to mirror holders; the
            # scatter on each holder awaits this superstep's delivery
            ray.get([a.push_hot_ranks.remote() for a in actors])
        if combine == "direct":
            deltas = graph._exchange(
                "pagerank",
                scatter_args=(damping,),
                apply_args=(dangling, damping),
            )
            delta = sum(deltas)
        else:
            if graph.salted:
                # consume the hot barrier before scatters read mirror state
                ray.get([a.await_hot_delivery.remote() for a in actors])
            refs = [a.pagerank_scatter.remote(damping) for a in actors]

            def apply_pr(p: int, g: pa.Table) -> float:
                v = g["vertex"].to_numpy()
                c = g["contrib"].to_numpy()
                vu, inv = np.unique(v, return_inverse=True)
                sums = np.bincount(inv, weights=c, minlength=len(vu))
                return ray.get(
                    actors[p].pagerank_apply.remote(vu, sums, dangling, damping)
                )

            results = graph._combine_push(refs, apply_pr)
            # partitions with no contributions still need teleport+dangling
            for p in range(graph.P):
                if p not in results:
                    results[p] = ray.get(
                        actors[p].pagerank_apply.remote(
                            _EMPTY_I64, _EMPTY_F64, dangling, damping
                        )
                    )
            delta = sum(results.values())
        if ckpt_dir is not None and (it % ckpt_every == 0 or delta < tol):
            graph.checkpoint(
                "rank",
                ckpt_dir,
                it,
                {"l1_delta": delta, "dangling": dangling, "mode": mode},
            )
        if delta < tol:
            break
    return graph.state_dataset("rank")


# ---------------------------------------------------------------------------
# Connected components (min-label propagation to fixpoint)
# ---------------------------------------------------------------------------


def connected_components(
    graph: ShardedGraph,
    max_iters: int = 200,
    combine: str = "direct",
    ckpt_dir: str | None = None,
    ckpt_every: int = 10,
    skip_init: bool = False,
) -> ray.data.Dataset:
    """Min-label propagation over the symmetrized graph until no label
    changes. Frontier-based: only vertices whose label changed last round
    scatter (the generalization of the reference's BFS co-bucket clustering,
    `main.cpp:672-721`). Requires graph built with symmetric=True.

    ckpt_dir: per-partition parquet + manifest every ckpt_every supersteps;
    a restarted run resumes from the manifest (restore marks every vertex
    changed, so the next round re-propagates from the restored labels —
    idempotent for min-label convergence)."""
    assert graph.symmetric, "connected_components needs a symmetric graph"
    actors = graph.actors
    start_iter = 0
    if ckpt_dir is not None:
        manifest = graph.restore(ckpt_dir)
        if manifest is not None and manifest["column"] == "label":
            ck_mode = manifest.get("counters", {}).get("mode", "cc")
            if ck_mode != "cc":
                raise ValueError(
                    f"checkpoint at {ckpt_dir} was written by a {ck_mode} "
                    "run but this run is connected_components; resuming "
                    "would silently change semantics — use a fresh ckpt_dir"
                )
            start_iter = manifest["iteration"] + 1
    if start_iter == 0 and not skip_init:
        ray.get([a.cc_init.remote() for a in actors])
    for it in range(start_iter, max_iters):
        if graph.salted:
            ray.get([a.push_hot_ranks.remote("cc") for a in actors])
        if combine == "direct":
            changed = sum(graph._exchange("cc"))
        else:
            if graph.salted:
                ray.get([a.await_hot_delivery.remote() for a in actors])
            refs = [a.cc_scatter.remote() for a in actors]

            def apply_cc(p: int, g: pa.Table) -> float:
                v = g["vertex"].to_numpy()
                l = g["label"].to_numpy()
                order = np.lexsort((l, v))
                v, l = v[order], l[order]
                first = np.concatenate([[True], v[1:] != v[:-1]])
                return ray.get(actors[p].cc_apply.remote(v[first], l[first]))

            results = graph._combine_push(refs, apply_cc)
            for p in range(graph.P):
                if p not in results:
                    ray.get(actors[p].cc_apply.remote(_EMPTY_I64, _EMPTY_I64))
            changed = sum(results.values())
        # checkpoint on the path COMMON to both combine modes — resumability
        # must not silently depend on the exchange strategy
        if ckpt_dir is not None and (it % ckpt_every == 0 or changed == 0):
            graph.checkpoint(
                "label", ckpt_dir, it, {"changed": changed, "mode": "cc"}
            )
        if changed == 0:
            break
    return graph.state_dataset("label").rename_columns({"label": "component"})


# ---------------------------------------------------------------------------
# Label propagation (mode aggregation, deterministic tie-break)
# ---------------------------------------------------------------------------


def label_propagation(
    graph: ShardedGraph,
    iters: int = 5,
    combine: str = "direct",
    ckpt_dir: str | None = None,
    ckpt_every: int = 2,
) -> ray.data.Dataset:
    """Synchronous LP: label_{t+1}(v) = most frequent label among in-neighbors
    (symmetrized graph → all neighbors), ties broken by min label, isolated
    vertices keep their own. Fixed iteration count for determinism.

    ckpt_dir: per-partition parquet + mode-tagged manifest every ckpt_every
    supersteps (and at the final one); a restarted run resumes the
    remaining iterations from the restored labels. A CC checkpoint in the
    same directory is rejected (same state column, different semantics)."""
    assert graph.symmetric, "label_propagation needs a symmetric graph"
    actors = graph.actors
    start_iter = 0
    if ckpt_dir is not None:
        manifest = graph.restore(ckpt_dir)
        if manifest is not None and manifest["column"] == "label":
            ck_mode = manifest.get("counters", {}).get("mode", "cc")
            if ck_mode != "lp":
                raise ValueError(
                    f"checkpoint at {ckpt_dir} was written by a {ck_mode} "
                    "run but this run is label_propagation; resuming would "
                    "silently change semantics — use a fresh ckpt_dir"
                )
            start_iter = manifest["iteration"] + 1
    if start_iter == 0:
        ray.get([a.lp_init.remote() for a in actors])
    for it in range(start_iter, iters):
        if graph.salted:
            ray.get([a.push_hot_ranks.remote("lp") for a in actors])
        if combine == "direct":
            graph._exchange("lp")
        else:
            if graph.salted:
                ray.get([a.await_hot_delivery.remote() for a in actors])
            refs = [a.lp_scatter.remote() for a in actors]

            def apply_lp(p: int, g: pa.Table) -> float:
                v = g["vertex"].to_numpy()
                l = g["label"].to_numpy()
                c = g["cnt"].to_numpy()
                pairs = np.stack([v, l], axis=1)
                uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
                sums = np.bincount(
                    inv, weights=c, minlength=len(uniq)
                ).astype(np.int64)
                return ray.get(
                    actors[p].lp_apply.remote(uniq[:, 0], uniq[:, 1], sums)
                )

            graph._combine_push(refs, apply_lp)
        # checkpoint on the path COMMON to both combine modes
        if ckpt_dir is not None and (it % ckpt_every == 0 or it == iters - 1):
            graph.checkpoint("label", ckpt_dir, it, {"mode": "lp"})
    return graph.state_dataset("label")


def neighborhood_sketch(
    graph: ShardedGraph,
    iters: int = 2,
    num_perm: int = 16,
    seed: int = 23,
) -> ray.data.Dataset:
    """ANF/HyperANF-style neighborhood-function estimation on the superstep
    engine: every vertex keeps k permuted min-hashes of the vertex set
    reaching it within <= `iters` hops (superstep aggregate = elementwise
    min over in-neighbors); returns (vertex, nf_est) with the k-min
    cardinality estimate n̂ = k / Σ(m_j/p) − 1.

    Doubles as the engine's COMPUTE-BOUND scaling workload: per-edge work
    is k element-mins versus PageRank's single multiply-add, so wall time
    is dominated by vectorized arithmetic rather than memory traffic
    (bench.py --scaling runs it at num_perm=64)."""
    actors = graph.actors
    ray.get([a.nmh_init.remote(num_perm, seed) for a in actors])
    for _ in range(iters):
        if graph.salted:
            # owners fan the hot sources' CURRENT sketch rows to their
            # mirror holders; push_parts awaits delivery before scattering
            ray.get([a.push_hot_ranks.remote("nmh") for a in actors])
        graph._exchange("nmh")
    return ray.data.from_arrow_refs([a.nmh_state.remote() for a in actors])


def kcore(graph: ShardedGraph, k: int, max_iters: int = 1_000_000) -> ray.data.Dataset:
    """Distributed k-core decomposition by round-based peeling on the
    superstep engine: vertices whose remaining degree drops below k die and
    push one decrement per incident edge to each neighbor's owner; rounds
    continue until no vertex dies. Total message volume across the whole
    run is O(E) — each edge carries at most one decrement per endpoint
    death — so the cost is one graph build plus a geometrically-shrinking
    frontier, not O(E * rounds).

    Returns (vertex, core_deg) for the members of the k-core, where
    core_deg is the vertex's degree within the core. Requires a symmetric,
    unsalted graph (clear error otherwise)."""
    if graph.salted:
        raise ValueError(
            "kcore supports unsalted graphs only; build the ShardedGraph "
            "without salt_threshold"
        )
    if not graph.symmetric:
        raise ValueError("kcore needs a symmetric graph (symmetric=True build)")
    actors = graph.actors
    pending = sum(ray.get([a.kcore_init.remote(k) for a in actors]))
    it = 0
    while pending and it < max_iters:
        pending = sum(graph._exchange("kcore"))
        it += 1
    return ray.data.from_arrow_refs([a.kcore_state.remote() for a in actors])


def hits(graph: ShardedGraph, iters: int = 8) -> ray.data.Dataset:
    """Kleinberg's HITS hubs & authorities with per-iteration L1
    normalization: auth_k = normalize(sum of hub_{k-1} over in-edges),
    hub_k = normalize(sum of auth_k over out-edges). The auth update is the
    standard forward exchange; the hub update is a PULL along build-time
    reverse routes (state/csr.py hits_pull_*). Returns (vertex, auth, hub).

    Directed by design (build with symmetric=False; a symmetric build just
    makes hub == auth). Unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "hits supports unsalted graphs only; build the ShardedGraph "
            "without salt_threshold"
        )
    actors = graph.actors
    ray.get([a.hits_init.remote() for a in actors])
    ray.get([a.send_pull_routes.remote() for a in actors])
    for _ in range(iters):
        s = sum(graph._exchange("hits"))
        if s > 0.0:
            ray.get([a.hits_normalize.remote("auth", s) for a in actors])
        t = sum(graph._exchange("hits_pull"))
        if t > 0.0:
            ray.get([a.hits_normalize.remote("hub", t) for a in actors])
    return ray.data.from_arrow_refs([a.hits_state.remote() for a in actors])


def katz_centrality(
    graph: ShardedGraph, alpha: float = 0.05, beta: float = 1.0, iters: int = 8
) -> ray.data.Dataset:
    """Katz centrality by fixed-iteration attenuated-walk propagation:
    x_{k+1}(v) = beta + alpha * sum_{u->v} x_k(u), x_0 = beta. Counts walks
    of every length into v, damped alpha^len — the classic centrality the
    north-star family (PageRank/HITS) generalizes. Fixed `iters` keeps the
    result deterministic and SQL-mirrorable (the oracle unrolls the same
    chain); pick alpha < 1/lambda_max for a convergent truncation.

    Same scatter volume as a PageRank superstep (one f64 per distinct
    (shard, dst)); reuses the rank state column. Unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "katz_centrality supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    ray.get([a.katz_init.remote(beta) for a in actors])
    for _ in range(iters):
        graph._exchange("katz", scatter_args=(alpha,), apply_args=(beta,))
    return graph.state_dataset("rank").rename_columns({"rank": "katz"})


def walk_counts(graph: ShardedGraph, iters: int = 3) -> ray.data.Dataset:
    """Exact k-walk-count centrality: x_0 = 1, x_{k+1}(v) = sum_{u->v}
    x_k(u), so x_k(v) is the number of distinct length-k walks ending at v
    (row sums of A^k applied to the all-ones vector) — the un-attenuated
    truncation of Katz / eigenvector centrality. Reuses the Katz exchange
    hooks with alpha=1, beta=0 after a beta=1 init; the float64 state is
    EXACT for counts < 2^53, asserted per shard before the int64 cast.

    Same scatter volume as one PageRank superstep per iteration. Unsalted
    graphs only (same constraint as katz_centrality)."""
    if graph.salted:
        raise ValueError(
            "walk_counts supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    ray.get([a.katz_init.remote(1.0) for a in actors])
    for _ in range(iters):
        graph._exchange("katz", scatter_args=(1.0,), apply_args=(0.0,))
    ds = graph.state_dataset("rank")

    def to_int(t: "pa.Table") -> "pa.Table":
        w = t["rank"].to_numpy(zero_copy_only=False)
        # correctness guard, not a debug assert: past 2^53 the float64
        # accumulator silently truncates integers, so this must survive
        # `python -O` (ADVICE.md round 3)
        if not np.all(w < 2.0**53):
            raise ValueError(
                "walk counts exceed float64 exactness (>= 2^53); reduce k "
                "or switch the accumulator to int64 exchange"
            )
        return pa.table(
            {"vertex": t["vertex"], "walks": w.astype(np.int64)}
        )

    return ds.map_batches(to_int, batch_format="pyarrow")


def neighbor_degree_agg(graph: ShardedGraph) -> ray.data.Dataset:
    """Graph feature engineering in ONE superstep: every vertex aggregates
    (sum, max) of its in-neighbors' out-degrees — on a symmetric build,
    of all neighbors' full degrees. Exact int64 end-to-end; returns
    (vertex, nbr_deg_sum, nbr_deg_max) for vertices with >= 1 in-neighbor.
    Unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "neighbor_degree_agg supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    ray.get([a.nagg_init.remote() for a in actors])
    graph._exchange("nagg")
    return ray.data.from_arrow_refs([a.nagg_state.remote() for a in actors])


def bfs_distance(
    graph: ShardedGraph, seeds, max_hops: int = 64
) -> ray.data.Dataset:
    """Multi-source BFS hop distance on the superstep engine: dist 0 on the
    seed set, each round the improved frontier pushes dist+1 min-combined to
    its out-neighbors' owners; stops when the frontier empties or at
    `max_hops`. Returns (vertex, dist) for REACHED vertices only.

    Works on directed graphs (directed distance) or symmetric builds
    (undirected distance — the reference's BFS co-bucket walk generalized to
    hop counts, `main.cpp:672-721`). Unsalted graphs only; a salted build
    raises with the supported configuration named."""
    if graph.salted:
        raise ValueError(
            "bfs_distance supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    seeds = np.unique(np.asarray(seeds, np.int64))
    frontier = sum(ray.get([a.bfs_init.remote(seeds) for a in actors]))
    it = 0
    while frontier and it < max_hops:
        frontier = sum(graph._exchange("bfs"))
        it += 1
    return ray.data.from_arrow_refs([a.bfs_state.remote() for a in actors])


def maximal_independent_set(
    graph: ShardedGraph, max_rounds: int = 10_000
) -> ray.data.Dataset:
    """Deterministic maximal independent set (the lexicographically-first
    MIS — identical to sequential greedy by ascending vertex id) via
    Luby-style parallel rounds with priority = id: each round, every
    undecided vertex with no smaller-id undecided neighbor joins, then its
    neighbors are excluded. Two superstep exchanges per round; the
    undecided set shrinks every round (the round's global-min undecided
    vertex always joins), so termination is guaranteed. Returns
    (vertex, round) for the members. Symmetric unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "maximal_independent_set supports unsalted graphs only; build "
            "the ShardedGraph without salt_threshold"
        )
    if not graph.symmetric:
        raise ValueError(
            "maximal_independent_set needs a symmetric graph "
            "(symmetric=True build)"
        )
    actors = graph.actors
    ray.get([a.mis_init.remote() for a in actors])
    rnd = 1
    while rnd <= max_rounds:
        joined = sum(graph._exchange("mis_min", apply_args=(rnd,)))
        if joined == 0:
            break
        graph._exchange("mis_excl")
        rnd += 1
    return ray.data.from_arrow_refs([a.mis_state_table.remote() for a in actors])


def maximal_matching(
    graph: ShardedGraph, max_rounds: int = 10_000
) -> ray.data.Dataset:
    """Deterministic maximal matching via mutual-min handshake rounds:
    every free vertex points at its minimum-id free neighbor; mutually
    pointing pairs marry and leave the pool. The globally minimal free
    vertex with a free neighbor is always mutually pointed at, so each
    round matches >= 1 pair and the fixpoint is a maximal matching.

    Two exchanges per round (pointer min, then min-src + its pointer so
    both endpoints decide the mutuality test locally and symmetrically);
    message volume per round is one (id, ptr) pair per destination owner,
    never a per-edge pointer table. `max_rounds` caps the rounds and is
    part of the semantics when hit (mirrors the unrolled SQL oracle).
    Returns one row per matched pair (vertex < partner, round).
    Symmetric unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "maximal_matching supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    if not graph.symmetric:
        raise ValueError(
            "maximal_matching needs a symmetric graph (symmetric=True build)"
        )
    actors = graph.actors
    ray.get([a.match_init.remote() for a in actors])
    rnd = 1
    while rnd <= max_rounds:
        pointing = sum(graph._exchange("match_min"))
        if pointing == 0:
            break
        matched = sum(graph._exchange("match_mut", apply_args=(rnd,)))
        if matched == 0:
            break
        rnd += 1
    return ray.data.from_arrow_refs(
        [a.match_state_table.remote() for a in actors]
    )


def two_sweep_diameter(
    graph: ShardedGraph, seed: int, max_hops: int = 64
) -> "pa.Table":
    """Double-sweep diameter lower bound (the standard BFS heuristic):
    BFS from `seed`, take the farthest vertex (ties -> min id), BFS again
    from it; the second eccentricity is a certified lower bound on the
    graph diameter (exact on trees). Two superstep BFS runs; the argmax
    fold ships one (dist, vertex) pair per shard. Returns one row
    (seed, far_vertex, ecc1, diameter_lb) — all exact integers.
    Unsalted graphs only (the BFS kernel's constraint)."""
    import pyarrow.compute as pc

    def far_of(ds: ray.data.Dataset) -> tuple[int, int]:
        # per-block partial argmax (dist desc, vertex asc), tiny driver fold
        def cut(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            d = t["dist"].to_numpy()
            v = t["vertex"].to_numpy()
            i = np.lexsort((v, -d))[0]
            return pa.table(
                {"vertex": v[i : i + 1], "dist": d[i : i + 1]}
            )

        rows = ds.map_batches(cut, batch_format="pyarrow").take_all()
        best = max(rows, key=lambda r: (r["dist"], -r["vertex"]))
        return int(best["vertex"]), int(best["dist"])

    d1 = bfs_distance(graph, [seed], max_hops=max_hops)
    far, ecc1 = far_of(d1)
    d2 = bfs_distance(graph, [far], max_hops=max_hops)
    _, ecc2 = far_of(d2)
    return pa.table(
        {
            "seed": pa.array([seed], pa.int64()),
            "far_vertex": pa.array([far], pa.int64()),
            "ecc1": pa.array([ecc1], pa.int64()),
            "diameter_lb": pa.array([ecc2], pa.int64()),
        }
    )


def greedy_coloring(
    graph: ShardedGraph, max_colors: int = 64, max_rounds: int = 10_000
) -> ray.data.Dataset:
    """Distance-1 graph coloring by iterated greedy-by-id MIS phases:
    color k = the lexicographically-first MIS of the subgraph induced on
    still-uncolored vertices — the distributed conflict-scheduling
    coloring (vertices of one color can be updated in parallel). Proper
    by construction: two adjacent vertices can never join the same
    phase's MIS. Deterministic (id priorities, no randomness). Returns
    (vertex, color) with colors 1-based; vertices still uncolored after
    `max_colors` phases are omitted (callers pick max_colors >= the
    graph's greedy color count — the phase loop stops early when every
    vertex is colored).

    Reuses the MIS exchange kernels unchanged; per phase the exclusion
    set returns to the pool and colored vertices park in an inert state.
    Symmetric unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "greedy_coloring supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    if not graph.symmetric:
        raise ValueError(
            "greedy_coloring needs a symmetric graph (symmetric=True build)"
        )
    actors = graph.actors
    ray.get([a.color_init.remote() for a in actors])
    c = 0
    while c < max_colors:
        und = sum(ray.get([a.color_phase_init.remote() for a in actors]))
        if und == 0:
            break
        c += 1
        rnd = 1
        while rnd <= max_rounds:
            joined = sum(graph._exchange("mis_min", apply_args=(rnd,)))
            if joined == 0:
                break
            graph._exchange("mis_excl")
            rnd += 1
        ray.get([a.color_assign.remote(c) for a in actors])
    return ray.data.from_arrow_refs([a.color_state.remote() for a in actors])


def sampled_farness(
    graph: ShardedGraph, seeds, max_hops: int = 64, harmonic: bool = False
) -> ray.data.Dataset:
    """Sampled closeness/farness centrality: one BFS per sample seed, with
    per-vertex (reach_cnt, dist_sum) accumulated INSIDE the shards between
    runs — the standard pivot-sampling approximation of closeness at scales
    where all-sources BFS is impossible (only the final per-vertex table
    leaves the actors; nothing per-seed crosses the driver). Exact int64
    throughout; closeness estimate = reach_cnt / dist_sum downstream.

    Unsalted graphs only (the BFS kernel's constraint)."""
    if graph.salted:
        raise ValueError(
            "sampled_farness supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    ray.get([a.farness_init.remote() for a in actors])
    seeds = np.unique(np.asarray(seeds, np.int64))
    # batched multi-seed BFS: one exchange round advances every seed's
    # frontier (same arithmetic as the per-seed loop, S x fewer barriers)
    frontier = sum(ray.get([a.bfsm_init.remote(seeds) for a in actors]))
    it = 0
    while frontier and it < max_hops:
        frontier = sum(graph._exchange("bfsm"))
        it += 1
    ray.get([a.bfsm_fold_farness.remote() for a in actors])
    return ray.data.from_arrow_refs(
        [a.farness_state.remote(harmonic) for a in actors]
    )


def shortest_path_counts(
    graph: ShardedGraph, seeds, max_hops: int = 32
) -> ray.data.Dataset:
    """Per-seed shortest-path counts — the counting (sigma) stage of
    Brandes' betweenness algorithm: for each sample seed, every reached
    vertex reports its hop distance and the NUMBER of distinct shortest
    seed->vertex paths, all exact int64. One BFS per seed on the superstep
    engine; sigma mass for a level-k vertex arrives entirely in the
    superstep whose frontier is level k-1, so a one-shot sum is exact.
    Returns (seed, vertex, dist, sigma). Unsalted graphs only."""
    if graph.salted:
        raise ValueError(
            "shortest_path_counts supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    refs = []
    for s in np.unique(np.asarray(seeds, np.int64)):
        one = np.array([s], np.int64)
        frontier = sum(ray.get([a.sigma_init.remote(one) for a in actors]))
        rnd = 0
        while frontier and rnd < max_hops:
            rnd += 1
            frontier = sum(graph._exchange("sigma", apply_args=(rnd,)))
        refs.extend(a.sigma_state.remote(int(s)) for a in actors)
    return ray.data.from_arrow_refs(refs)


def stress_centrality(
    graph: ShardedGraph, seeds, max_hops: int = 32
) -> ray.data.Dataset:
    """Per-seed stress centrality (full Brandes shape, exact integers):
    after the sigma BFS, back-propagate g(v) = sum over BFS-DAG successors
    of (1 + g(w)) — the number of shortest paths STARTING at v in the
    (hop-capped) DAG — level by level from the deepest hop down; then
    stress_s(v) = sigma(v) * g(v) counts the shortest s->t paths passing
    through v, all int64 (no float dependency ratios — the integer-exact
    sibling of betweenness dependency accumulation).

    On a SYMMETRIC graph the DAG predecessors of a level-(k+1) vertex are
    its neighbors at level k, so the reverse rounds reuse the forward
    routes on the same shard pool — no twin reverse pool. Requires
    symmetric unsalted builds (directed stress would need the SCC-style
    reversed pool). Returns (seed, vertex, dist, sigma, paths_from,
    stress)."""
    if graph.salted:
        raise ValueError(
            "stress_centrality supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    if not graph.symmetric:
        raise ValueError(
            "stress_centrality needs a symmetric graph (symmetric=True "
            "build); directed stress needs a reversed twin pool"
        )
    actors = graph.actors
    refs = []
    for s in np.unique(np.asarray(seeds, np.int64)):
        one = np.array([s], np.int64)
        frontier = sum(ray.get([a.sigma_init.remote(one) for a in actors]))
        rnd = 0
        while frontier and rnd < max_hops:
            rnd += 1
            frontier = sum(graph._exchange("sigma", apply_args=(rnd,)))
        deepest = rnd - 1 if frontier == 0 else rnd
        ray.get([a.gcount_init.remote() for a in actors])
        for k in range(deepest - 1, -1, -1):
            graph._exchange("gcount", scatter_args=(k,), apply_args=(k,))
        refs.extend(a.gcount_state.remote(int(s)) for a in actors)
    return ray.data.from_arrow_refs(refs)


def strongly_connected_components(
    edges: ray.data.Dataset, num_partitions: int = 32, max_rounds: int = 64
) -> ray.data.Dataset:
    """Directed strongly connected components by forward–backward label
    refinement: repeat { f(v) = min in-block vertex that REACHES v along
    forward edges; b(v) = min in-block vertex v reaches (the same kernel
    on the reversed graph); new block id pair = (f, b) } until no block
    changes. Invariants: an SCC never splits (its members always share
    (f, b) — mutual reachability stays inside any block containing it),
    and at the fixpoint f == b == min(SCC) for every vertex (self-reach
    forces f <= own id and b <= own id, which squeezes f = b), so the
    converged pair IS the canonical component id. Returns
    (vertex, scc_id = min member id), singletons included.

    Scale shape: two ShardedGraph pools (forward + reversed edge sets,
    same hash partitioning, so per-part owned arrays align and block
    tables transfer as positional numpy arrays); each phase is the
    frontier-based push exchange with messages min-combined per
    (dst, block) — block-constrained propagation never crosses component
    boundaries once blocks tighten, so late rounds touch only unsettled
    regions. Rounds needed = refinement depth (worst case the SCC-DAG
    chain length; single digits on the benchmarked graphs).

    Unsalted graphs only (the label kernel's constraint)."""
    import pyarrow.compute as pc

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        )

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    de = distinct(
        edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()  # consumed by both builds
    fwd = ShardedGraph.build(de, num_parts=num_partitions, symmetric=False)
    rev = ShardedGraph.build(
        de.map_batches(swap, batch_format="pyarrow"),
        num_parts=num_partitions,
        symmetric=False,
    )
    ray.get([a.scc_init.remote() for a in fwd.actors])
    ray.get([a.scc_init.remote() for a in rev.actors])
    own_f = ray.get([a.scc_owned_ids.remote() for a in fwd.actors])
    own_r = ray.get([a.scc_owned_ids.remote() for a in rev.actors])
    for of, orr in zip(own_f, own_r):
        if not np.array_equal(of, orr):
            raise AssertionError(
                "SCC pools misaligned: forward/reverse builds own "
                "different vertex sets for the same partition"
            )

    def run_phase(graph: ShardedGraph) -> list[np.ndarray]:
        frontier = sum(ray.get([a.scc_phase_init.remote() for a in graph.actors]))
        while frontier:
            frontier = sum(graph._exchange("scc"))
        return ray.get([a.scc_vals.remote() for a in graph.actors])

    for _ in range(max_rounds):
        f = run_phase(fwd)
        b = run_phase(rev)
        ch = sum(
            ray.get(
                [a.scc_set_blocks.remote(fp, bp) for a, fp, bp in zip(fwd.actors, f, b)]
                + [a.scc_set_blocks.remote(fp, bp) for a, fp, bp in zip(rev.actors, f, b)]
            )
        )
        if ch == 0:
            break
    else:
        raise RuntimeError(f"SCC did not converge in {max_rounds} rounds")
    return ray.data.from_arrow_refs([a.scc_state.remote() for a in fwd.actors])


def condensation_summary(
    edges: ray.data.Dataset, num_partitions: int = 32, max_rounds: int = 64
) -> ray.data.Dataset:
    """One-row summary of the SCC condensation DAG: component count,
    largest component size, distinct condensation edges, and source/sink
    component counts (no incoming / no outgoing condensation edge).

    Scale shape: SCC labels attach to both edge endpoints via the
    co-partitioned `_attach_value` join (V-scale lookup, never broadcast);
    condensation edges dedup through the house distinct; every output is
    a count aggregate (sources = n_sccs - |distinct dst|, sinks =
    n_sccs - |distinct src|), so only one-row partials reach the driver
    besides the bounded distinct-count folds."""
    import pyarrow.compute as pc

    scc = strongly_connected_components(
        edges, num_partitions=num_partitions, max_rounds=max_rounds
    ).materialize()  # consumed by two attach passes

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        )

    de = distinct(
        edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"]
    )
    w1 = _attach_value_auto(de, scc, "src", ["dst"], "scc_id", "cs", num_partitions)
    w2 = _attach_value_auto(
        w1, scc, "dst", ["cs"], "scc_id", "cd", num_partitions
    )

    def cedge(t: pa.Table) -> pa.Table:
        cs = t["cs"].to_numpy()
        cd = t["cd"].to_numpy()
        keep = cs != cd
        return pa.table({"cs": cs[keep], "cd": cd[keep]})

    ce = distinct(
        w2.map_batches(cedge, batch_format="pyarrow"), ["cs", "cd"]
    ).materialize()  # consumed by three count folds

    def count_rows(ds: ray.data.Dataset) -> int:
        return ds.count()

    n_cedges = count_rows(ce)
    n_src_covered = count_rows(distinct(ce.select_columns(["cs"]), ["cs"]))
    n_dst_covered = count_rows(distinct(ce.select_columns(["cd"]), ["cd"]))

    # component count + max size via the hashed-key fold (a raw-key
    # groupby(scc_id).count() is a V-scale sort-aggregate — the stall
    # pattern recorded in BASELINE.md; the fold reduces to one row per
    # partition)
    def size_partials(t: pa.Table) -> pa.Table:
        lbl = t["scc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lbl, return_counts=True)
        return pa.table(
            {
                "scc_id": u,
                "n": c.astype(np.int64),
                "__p": pa.array(part_of(u, num_partitions), pa.int32()),
            }
        )

    def size_fold(t: pa.Table) -> pa.Table:
        lbl = t["scc_id"].to_numpy()
        n = t["n"].to_numpy()
        u, inv = np.unique(lbl, return_inverse=True)
        s = np.bincount(inv, weights=n, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([len(u)], pa.int64()),
                "mx": pa.array([int(s.max()) if len(s) else 0], pa.int64()),
            }
        )

    sizes = (
        scc.map_batches(size_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(size_fold, batch_format="pyarrow")
        .take_all()
    )
    n_sccs = sum(int(r["one"]) for r in sizes)
    largest = max((int(r["mx"]) for r in sizes), default=0)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_sccs": pa.array([n_sccs], pa.int64()),
                "largest_scc": pa.array([largest], pa.int64()),
                "n_condensation_edges": pa.array([n_cedges], pa.int64()),
                "n_source_sccs": pa.array([n_sccs - n_dst_covered], pa.int64()),
                "n_sink_sccs": pa.array([n_sccs - n_src_covered], pa.int64()),
            }
        )
    )


def modularity_summary(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 32,
) -> "pa.Table":
    """Newman modularity Q of a community assignment as an exact-integer
    witness: over the distinct undirected self-loop-free edge set,
    Q = sum_c [ m_c/m - (d_c/2m)^2 ] = q_num / (4 m^2) with
    q_num = sum_c (4*m*m_c - d_c^2) — every term integer, so the single
    final IEEE division is the only float op (mirrored by the SQL oracle).
    `labels` is any (vertex, label) int64 assignment (here: LPA's output).

    Scale shape: labels attach to both edge endpoints via the
    co-partitioned `_attach_value` join (V-scale lookup, never broadcast);
    per-label intra-edge counts and degree sums arrive via ONE label-key
    groupby over union-tagged partials; only per-label integer rows and a
    one-row fold reach the driver. One row out:
    (m_edges, n_communities, q_num, modularity)."""
    import pyarrow.compute as pc

    def canon(t: pa.Table) -> pa.Table:
        s = pc_cast_i64(t["src"])
        d = pc_cast_i64(t["dst"])
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        keep = lo != hi
        return pa.table({"src": lo[keep], "dst": hi[keep]})

    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()  # consumed by the count, the degree pass, and the attach
    m = und.count()

    labels = labels.materialize()  # consumed by three attach passes
    w1 = _attach_value_auto(und, labels, "src", ["dst"], "label", "ls", num_partitions)
    w2 = _attach_value_auto(w1, labels, "dst", ["ls"], "label", "ld", num_partitions)

    # per-label intra-community edge partials, tagged for the union-groupby
    def intra(t: pa.Table) -> pa.Table:
        ls = t["ls"].to_numpy()
        ld = t["ld"].to_numpy()
        lab = ls[ls == ld]
        lu, cnt = np.unique(lab, return_counts=True)
        return pa.table(
            {
                "label": lu,
                "m_in": cnt.astype(np.int64),
                "d_sum": np.zeros(len(lu), np.int64),
            }
        )

    # per-label degree-sum partials: degree table -> attach label -> combine
    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
            }
        )

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_partitions
    )
    degl = _attach_value_auto(deg, labels, "vertex", ["deg"], "label", "lab", num_partitions)

    def dsum(t: pa.Table) -> pa.Table:
        lab = t["lab"].to_numpy()
        d = t["deg"].to_numpy()
        lu, inv = np.unique(lab, return_inverse=True)
        s = np.bincount(inv, weights=d, minlength=len(lu)).astype(np.int64)
        return pa.table(
            {
                "label": lu,
                "m_in": np.zeros(len(lu), np.int64),
                "d_sum": s,
            }
        )

    def tag_label(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy()
        return pa.table(
            {
                "label": lab,
                "m_in": t["m_in"],
                "d_sum": t["d_sum"],
                "__q": pa.array(part_of(lab, num_partitions), pa.int32()),
            }
        )

    def fold_label(t: pa.Table) -> pa.Table:
        lab = t["label"].to_numpy()
        u, inv = np.unique(lab, return_inverse=True)
        mi = np.bincount(inv, weights=t["m_in"].to_numpy(), minlength=len(u))
        ds_ = np.bincount(inv, weights=t["d_sum"].to_numpy(), minlength=len(u))
        return pa.table(
            {
                "label": u,
                "sum(m_in)": mi.astype(np.int64),
                "sum(d_sum)": ds_.astype(np.int64),
            }
        )

    # hashed-label-key fold (the ngram_novelty/condensation_depth lesson:
    # Ray Data's sort-aggregate on a raw V-scale key stalls on this shape)
    per_label = (
        w2.map_batches(intra, batch_format="pyarrow")
        .union(degl.map_batches(dsum, batch_format="pyarrow"))
        .map_batches(tag_label, batch_format="pyarrow")
        .groupby("__q")
        .map_groups(fold_label, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        mi = t["sum(m_in)"].to_numpy()
        ds_ = t["sum(d_sum)"].to_numpy()
        live = ds_ > 0  # every community with an edge endpoint has degree
        q = int(np.sum(4 * m * mi[live] - ds_[live] * ds_[live]))
        return pa.table(
            {
                "n_comm": pa.array([int(live.sum())], pa.int64()),
                "q_num": pa.array([q], pa.int64()),
            }
        )

    parts = per_label.map_batches(fold, batch_format="pyarrow").take_all()
    n_comm = sum(int(r["n_comm"]) for r in parts)
    q_num = sum(int(r["q_num"]) for r in parts)
    from ..functions.rounding import round_half_away

    mod = round_half_away(
        np.array([q_num / (4.0 * float(m) * float(m))]), 6
    )[0] if m else 0.0
    return pa.table(
        {
            "m_edges": pa.array([m], pa.int64()),
            "n_communities": pa.array([n_comm], pa.int64()),
            "q_num": pa.array([q_num], pa.int64()),
            "modularity": pa.array([mod], pa.float64()),
        }
    )


def condensation_depth(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Topological layering of the SCC condensation DAG: for every
    component, the length of the LONGEST condensation path into it
    (sources = 0) — the stage/wave number a scheduler would run it at.
    Fixpoint of depth(c) = max(depth(c), max over preds p of depth(p)+1),
    reached in diameter(DAG) rounds; depths only grow, so an unchanged
    global depth-sum certifies convergence.

    Scale shape: SCC labels attach to both edge endpoints via the
    co-partitioned `_attach_value` join; per round ONE attach (depth onto
    condensation-edge sources) + a comp-key groupby max — no broadcast,
    no driver-side per-component state (the driver holds one scalar
    depth-sum). Returns (scc_id, depth)."""

    scc = strongly_connected_components(
        edges, num_partitions=num_partitions
    ).materialize()

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": pc_cast_i64(t["src"]), "dst": pc_cast_i64(t["dst"])}
        )

    de = distinct(edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"])
    w1 = _attach_value_auto(de, scc, "src", ["dst"], "scc_id", "cs", num_partitions)
    w2 = _attach_value_auto(w1, scc, "dst", ["cs"], "scc_id", "cd", num_partitions)

    def cedge(t: pa.Table) -> pa.Table:
        cs = t["cs"].to_numpy()
        cd = t["cd"].to_numpy()
        keep = cs != cd
        return pa.table({"cs": cs[keep], "cd": cd[keep]})

    ce = distinct(
        w2.map_batches(cedge, batch_format="pyarrow"), ["cs", "cd"]
    ).materialize()

    def comp_zero(t: pa.Table) -> pa.Table:
        u = np.unique(t["scc_id"].to_numpy())
        return pa.table({"comp": u, "depth": np.zeros(len(u), np.int64)})

    depth = distinct(scc.select_columns(["scc_id"]), ["scc_id"]).map_batches(
        comp_zero, batch_format="pyarrow"
    ).materialize()
    total = int(depth.sum("depth") or 0)

    for _ in range(max_rounds):
        msg = _attach_value(
            ce, depth, "cs", ["cd"], "depth", "dp", num_partitions,
            lookup_key="comp",
        )

        def bump(t: pa.Table) -> pa.Table:
            cd = t["cd"].to_numpy()
            dp = t["dp"].to_numpy() + 1
            u, inv = np.unique(cd, return_inverse=True)
            mx = np.full(len(u), -1, np.int64)
            np.maximum.at(mx, inv, dp)
            return pa.table(
                {
                    "comp": u,
                    "depth": mx,
                    "__p": pa.array(part_of(u, num_partitions), pa.int32()),
                }
            )

        def tag_depth(t: pa.Table) -> pa.Table:
            c = t["comp"].to_numpy()
            return pa.table(
                {
                    "comp": c,
                    "depth": t["depth"],
                    "__p": pa.array(part_of(c, num_partitions), pa.int32()),
                }
            )

        def fold_max(t: pa.Table) -> pa.Table:
            c = t["comp"].to_numpy()
            d = t["depth"].to_numpy()
            u, inv = np.unique(c, return_inverse=True)
            mx = np.full(len(u), -1, np.int64)
            np.maximum.at(mx, inv, d)
            return pa.table({"comp": u, "depth": mx})

        # hashed-comp-key fold (Ray Data's sort-aggregate on the raw key
        # stalls ~10x longer on this shape)
        depth = (
            msg.map_batches(bump, batch_format="pyarrow")
            .union(depth.map_batches(tag_depth, batch_format="pyarrow"))
            .groupby("__p")
            .map_groups(fold_max, batch_format="pyarrow")
            .materialize()
        )
        new_total = int(depth.sum("depth") or 0)
        if new_total == total:
            break
        total = new_total

    return depth.map_batches(
        lambda t: pa.table({"scc_id": t["comp"], "depth": t["depth"]}),
        batch_format="pyarrow",
    )


def bfs_hop_histogram(
    graph: ShardedGraph, seeds, max_hops: int = 64
) -> ray.data.Dataset:
    """Per-seed BFS hop profile: (seed, dist, n_vertices) — how many
    vertices sit at each hop distance from each sample seed (the
    neighborhood-growth / effective-diameter evidence that ANF-style
    sketches approximate).

    One BFS per seed on the superstep engine; after each BFS every shard
    returns only its bounded (max_hops+1)-long local histogram, summed on
    the driver — O(seeds * hops) driver state, never a per-vertex table.

    Unsalted graphs only (the BFS kernel's constraint)."""
    if graph.salted:
        raise ValueError(
            "bfs_hop_histogram supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    actors = graph.actors
    seeds = np.unique(np.asarray(seeds, np.int64))
    # batched multi-seed BFS: one exchange round serves every seed
    frontier = sum(ray.get([a.bfsm_init.remote(seeds) for a in actors]))
    it = 0
    while frontier and it < max_hops:
        frontier = sum(graph._exchange("bfsm"))
        it += 1
    tables = ray.get([a.bfsm_hist.remote(max_hops) for a in actors])
    merged = pa.concat_tables(tables).to_pandas()
    g = (
        merged.groupby(["seed", "dist"], sort=True)["n"].sum().reset_index()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "seed": pa.array(g["seed"].to_numpy(np.int64)),
                "dist": pa.array(g["dist"].to_numpy(np.int64)),
                "n_vertices": pa.array(g["n"].to_numpy(np.int64)),
            }
        )
    )


def landmark_distances(
    graph: ShardedGraph,
    seeds,
    sample_mod: int = 97,
    max_hops: int = 8,
    topn: int = 200,
    block: int = 512,
) -> "pa.Table":
    """Landmark (ALT-style) distance estimation: exact BFS distances from
    a small landmark set, then for every pair of SAMPLE vertices (id %
    sample_mod == 0, reached by >= 1 landmark) the triangle-inequality
    bounds lb = max_l |d(l,u) - d(l,v)| and ub = min_l (d(l,u) + d(l,v))
    over landmarks reaching BOTH endpoints. Returns the topn closest
    candidate pairs by (ub, u, v) — the index-free close-pair primitive
    landmark routing builds on.

    Scale shape: ONE batched multi-seed BFS (one exchange stream serves
    every landmark); each shard ships only its owned sample rows
    (V/sample_mod * L, never V*L). The tiny (ids, D) landmark matrix is
    `ray.put` ONCE; pair scoring is a blocked map_batches over row-block
    tasks, each scoring the strict upper triangle in (block x block x L)
    TILES (peak memory per task is bounded by the tile, never block x n x
    L) with exact per-tile top-n cuts that compose because tiles partition
    disjoint pairs — so the driver fold over <= nblocks * topn rows is
    exact. Unsalted graphs only (the BFS kernel's constraint)."""
    if graph.salted:
        raise ValueError(
            "landmark_distances supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    from ..functions.proccache import cached_get

    actors = graph.actors
    seeds = np.unique(np.asarray(seeds, np.int64))
    frontier = sum(ray.get([a.bfsm_init.remote(seeds) for a in actors]))
    it = 0
    while frontier and it < max_hops:
        frontier = sum(graph._exchange("bfsm"))
        it += 1
    t = pa.concat_tables(
        ray.get([a.bfsm_sample_dists.remote(sample_mod) for a in actors])
    )
    v = t["vertex"].to_numpy()
    sd = t["seed"].to_numpy()
    dist = t["dist"].to_numpy()
    ids = np.unique(v)
    n, L = len(ids), len(seeds)
    BIG = np.int64(1) << np.int64(31)
    D = np.full((n, L), BIG, np.int64)
    D[np.searchsorted(ids, v), np.searchsorted(seeds, sd)] = dist
    cols = {
        "u": pa.array(np.empty(0, np.int64)),
        "v": pa.array(np.empty(0, np.int64)),
        "lb": pa.array(np.empty(0, np.int64)),
        "ub": pa.array(np.empty(0, np.int64)),
    }
    if n < 2:
        return pa.table(cols)
    ref = ray.put((ids, D))
    starts = list(range(0, n - 1, block))

    def score_block(bt: pa.Table) -> pa.Table:
        ids_, D_ = cached_get(ref)
        nn = len(ids_)
        outs = []
        for lo in bt["lo"].to_numpy():
            hi = min(lo + block, nn)
            bi = D_[lo:hi]  # (b, L)
            bfin = bi < BIG
            # the j axis is tiled too: the untiled (b, n, L) temporaries
            # grow quadratically with graph size (~1.8 GB/array at sf1,
            # ADVICE.md round 3); per (b, jb, L) tile peak memory is
            # bounded and the per-tile top-n cuts compose exactly because
            # tiles partition disjoint (u, v) pairs
            cand_u, cand_v, cand_lb, cand_ub = [], [], [], []
            for j0 in range(lo, nn, block):
                j1 = min(j0 + block, nn)
                dj = D_[j0:j1]                                  # (jb, L)
                sums = bi[:, None, :] + dj[None, :, :]          # (b, jb, L)
                both = bfin[:, None, :] & (dj[None, :, :] < BIG)
                ub = np.where(both, sums, BIG).min(axis=2)      # (b, jb)
                diffs = np.abs(bi[:, None, :] - dj[None, :, :])
                lb = np.where(both, diffs, -1).max(axis=2)
                # strict upper triangle: each row i scores against j > i
                jj = np.arange(j0, j1)[None, :]
                ii = (lo + np.arange(hi - lo))[:, None]
                ok = (jj > ii) & (ub < BIG)
                ri, rj = np.nonzero(ok)
                if not len(ri):
                    continue
                u = ids_[lo + ri]
                w = ids_[j0 + rj]
                ubv = ub[ri, rj]
                lbv = lb[ri, rj]
                sel = np.lexsort((w, u, ubv))[:topn]
                cand_u.append(u[sel])
                cand_v.append(w[sel])
                cand_lb.append(lbv[sel])
                cand_ub.append(ubv[sel])
            if not cand_u:
                continue
            u = np.concatenate(cand_u)
            w = np.concatenate(cand_v)
            lbv = np.concatenate(cand_lb)
            ubv = np.concatenate(cand_ub)
            sel = np.lexsort((w, u, ubv))[:topn]
            outs.append(
                pa.table(
                    {
                        "u": pa.array(u[sel], pa.int64()),
                        "v": pa.array(w[sel], pa.int64()),
                        "lb": pa.array(lbv[sel], pa.int64()),
                        "ub": pa.array(ubv[sel], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else pa.table(cols)

    parts = (
        ray.data.from_arrow(
            pa.table({"lo": pa.array(starts, pa.int64())})
        )
        .repartition(len(starts))
        .map_batches(score_block, batch_format="pyarrow", batch_size=1)
        .take_all()
    )
    u = np.array([r["u"] for r in parts], np.int64)
    w = np.array([r["v"] for r in parts], np.int64)
    lb = np.array([r["lb"] for r in parts], np.int64)
    ub = np.array([r["ub"] for r in parts], np.int64)
    sel = np.lexsort((w, u, ub))[:topn] if len(u) else np.empty(0, np.int64)
    return pa.table(
        {
            "u": pa.array(u[sel], pa.int64()),
            "v": pa.array(w[sel], pa.int64()),
            "lb": pa.array(lb[sel], pa.int64()),
            "ub": pa.array(ub[sel], pa.int64()),
        }
    )


def bipartite_check(
    graph: ShardedGraph,
    edges: ray.data.Dataset,
    seeds,
    max_hops: int = 64,
    num_partitions: int = 32,
) -> "pa.Table":
    """Per-seed 2-colorability (odd-cycle) check of the explored subgraph:
    BFS parity from each sample seed; an edge whose endpoints sit at
    equal-parity hop distance certifies an odd cycle through the seed's
    component, so the reached subgraph is bipartite iff no such edge
    exists (exact within `max_hops`; the cap is part of the semantics and
    mirrored by the oracle).

    Scale shape: ONE batched multi-seed BFS (one exchange stream serves
    every seed), then each shard emits one (vertex, packed reached|parity
    int64 bitmask) row — V rows total, not V*S — joined onto the
    canonical undirected edge list by two co-partitioned searchsorted
    attaches; conflicts fold to S-long int64 partials per block. Returns
    (seed, n_reached, n_edges_both, odd_edges, is_bipartite); all exact
    integers. Unsalted symmetric graphs only (the BFS kernel's
    constraint)."""
    import pyarrow.compute as pc

    if graph.salted:
        raise ValueError(
            "bipartite_check supports unsalted graphs only; build the "
            "ShardedGraph without salt_threshold"
        )
    seeds = np.unique(np.asarray(seeds, np.int64))
    S = len(seeds)
    if S > 31:
        raise ValueError("bipartite_check packs masks into 31 bits: S <= 31")
    actors = graph.actors
    frontier = sum(ray.get([a.bfsm_init.remote(seeds) for a in actors]))
    it = 0
    while frontier and it < max_hops:
        frontier = sum(graph._exchange("bfsm"))
        it += 1
    # n_reached per seed from the bounded per-shard histograms
    hists = pa.concat_tables(
        ray.get([a.bfsm_hist.remote(max_hops) for a in actors])
    ).to_pandas()
    reach = hists.groupby("seed")["n"].sum()
    masks = ray.data.from_arrow_refs(
        [a.bfsm_parity_masks.remote() for a in actors]
    ).materialize()

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    )
    wa = _attach_value(und, masks, "a", ["b"], "masks", "m_a", num_partitions)
    wb = _attach_value(
        wa.rename_columns({"a": "oa", "b": "a"}),
        masks,
        "a",
        ["oa", "m_a"],
        "masks",
        "m_b",
        num_partitions,
    )

    LOW = np.int64((1 << 31) - 1)

    def fold(t: pa.Table) -> pa.Table:
        ma = t["m_a"].to_numpy(zero_copy_only=False)
        mb = t["m_b"].to_numpy(zero_copy_only=False)
        both = (ma & LOW) & (mb & LOW)
        same = ~((ma >> np.int64(31)) ^ (mb >> np.int64(31)))
        nb = np.empty(S, np.int64)
        nc = np.empty(S, np.int64)
        for j in range(S):
            bj = (both >> np.int64(j)) & 1
            nb[j] = int(bj.sum())
            nc[j] = int((bj & (same >> np.int64(j))).sum())
        return pa.table(
            {
                "j": pa.array(np.arange(S, dtype=np.int64)),
                "nb": pa.array(nb),
                "nc": pa.array(nc),
            }
        )

    parts = wb.map_batches(fold, batch_format="pyarrow").take_all()
    nb = np.zeros(S, np.int64)
    nc = np.zeros(S, np.int64)
    for r in parts:
        nb[r["j"]] += r["nb"]
        nc[r["j"]] += r["nc"]
    return pa.table(
        {
            "seed": pa.array(seeds, pa.int64()),
            "n_reached": pa.array(
                [int(reach.get(s, 0)) for s in seeds], pa.int64()
            ),
            "n_edges_both": pa.array(nb, pa.int64()),
            "odd_edges": pa.array(nc, pa.int64()),
            "is_bipartite": pa.array(nc == 0, pa.bool_()),
        }
    )


def sssp_distance(
    graph: ShardedGraph, seeds, max_rounds: int = 64
) -> ray.data.Dataset:
    """Multi-source single-source-shortest-path over INTEGER edge weights
    (the pair's multiplicity in a weighted build): Bellman-Ford-style
    frontier relaxation on the superstep engine — each round, vertices
    improved last round push dist + w(u,v), min-combined at the owner.
    Terminates at the true fixpoint (empty frontier): with positive
    integer weights every relaxation round strictly increases the
    improved distance, so rounds <= max finite distance. Returns
    (vertex, dist) for reached vertices; exact (all-integer mins).

    Requires ShardedGraph.build(weighted=True) (and therefore unsalted)."""
    if not graph.weighted:
        raise ValueError("sssp_distance needs ShardedGraph.build(weighted=True)")
    actors = graph.actors
    seeds = np.unique(np.asarray(seeds, np.int64))
    frontier = sum(ray.get([a.bfs_init.remote(seeds, True) for a in actors]))
    it = 0
    while frontier and it < max_rounds:
        frontier = sum(graph._exchange("bfs"))
        it += 1
    return ray.data.from_arrow_refs([a.bfs_state.remote() for a in actors])


def driver_components(
    src: np.ndarray, dst: np.ndarray, vertices: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side vectorized connected components for SMALL graphs
    (min-label propagation + pointer jumping over numpy index arrays).

    The fast path for CC consumers whose pair tables are tiny relative to
    the cluster (LSH co-bucket graphs, verified near-dup pairs): building a
    ShardedGraph actor pool for a few thousand vertices costs ~10s of fixed
    machinery; this converges in O(log n) vectorized rounds. Returns
    (vertex, component) with component = min vertex id of the component —
    identical output to `connected_components` on the superstep engine."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    vs = np.unique(np.concatenate([np.asarray(vertices, np.int64), src, dst]))
    lab = np.arange(len(vs), dtype=np.int64)
    s = np.searchsorted(vs, src)
    d = np.searchsorted(vs, dst)
    while True:
        new = lab.copy()
        if len(s):
            np.minimum.at(new, d, lab[s])
            np.minimum.at(new, s, lab[d])
        while True:  # pointer jumping (path halving)
            nn = new[new]
            if (nn == new).all():
                break
            new = nn
        if (new == lab).all():
            break
        lab = new
    return vs, vs[lab]


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered wedge join — pure Dataset dataflow)
# ---------------------------------------------------------------------------


def distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Distinct int rows — hash-partitioned vectorized dedup (one cheap-key
    shuffle; see sources/edges.distinct_int_rows)."""
    from ..sources.edges import distinct_int_rows

    return distinct_int_rows(ds, cols)


def int_degrees(
    ds: ray.data.Dataset, num_parts: int = 32
) -> ray.data.Dataset:
    """(vertex, deg) from a 'vertex' column: batch-local bincount combiner
    → one shuffle on hash(vertex) %% P → vectorized per-partition merge."""

    def local(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        vu, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {
                "vertex": vu,
                "deg": cnt.astype(np.int64),
                "__p": pa.array(part_of(vu, num_parts), pa.int32()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy()
        c = t["deg"].to_numpy()
        vu, inv = np.unique(v, return_inverse=True)
        sums = np.bincount(inv, weights=c, minlength=len(vu)).astype(np.int64)
        return pa.table({"vertex": vu, "deg": sums})

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge, batch_format="pyarrow")
    )


def _pair_struct(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,) structured int64-pair array (lexicographically comparable)."""
    out = np.empty(len(a), dtype=[("a", "<i8"), ("b", "<i8")])
    out["a"] = a
    out["b"] = b
    return out


def _pair_part(v: np.ndarray, w: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for a composite (v, w) key."""
    with np.errstate(over="ignore"):
        mixed = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + w.astype(
            np.uint64
        )
    return part_of(mixed, num_parts)


ATTACH_BROADCAST_ROWS = 2_000_000  # lookup rows below this broadcast once


def _attach_value_auto(
    keyed: ray.data.Dataset,
    lookup: ray.data.Dataset,
    key_col: str,
    carry_cols: list[str],
    val_col: str,
    out_col: str,
    num_parts: int,
    lookup_key: str = "vertex",
    broadcast_rows: int = ATTACH_BROADCAST_ROWS,
) -> ray.data.Dataset:
    """`_attach_value` with a small-side fast path: when the (MATERIALIZED)
    lookup is below `broadcast_rows`, pull it once, `ray.put` the sorted
    key/value arrays, and join inside a stateless `map_batches`
    searchsorted — zero shuffles instead of one union shuffle per attach.
    Above the threshold it falls back to the co-partitioned join (the
    V-scale path a 100-TB run needs). Callers pass a materialized lookup
    so the row count is free."""
    if lookup.count() > broadcast_rows:
        return _attach_value(
            keyed, lookup, key_col, carry_cols, val_col, out_col,
            num_parts, lookup_key,
        )
    from ..functions.proccache import cached_get

    ks, vs = [], []
    for b in lookup.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            ks.append(b[lookup_key].to_numpy(zero_copy_only=False))
            vs.append(b[val_col].to_numpy(zero_copy_only=False))
    k = (
        np.concatenate(ks).astype(np.int64)
        if ks
        else np.array([], np.int64)
    )
    v = (
        np.concatenate(vs).astype(np.int64)
        if vs
        else np.array([], np.int64)
    )
    order = np.argsort(k, kind="stable")
    ref = ray.put((k[order], v[order]))

    def merge(t: pa.Table) -> pa.Table:
        lk, lv = cached_get(ref)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lk):
            pos = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
            hit = lk[pos] == keys
        else:
            pos = np.zeros(len(keys), np.int64)
            hit = np.zeros(len(keys), bool)
        cols = {key_col: pa.array(keys[hit], pa.int64())}
        for c in carry_cols:
            cols[c] = pa.array(
                t[c].to_numpy(zero_copy_only=False)[hit], pa.int64()
            )
        cols[out_col] = pa.array(lv[pos][hit], pa.int64())
        return pa.table(cols)

    return keyed.map_batches(merge, batch_format="pyarrow")


def _attach_value(
    keyed: ray.data.Dataset,
    lookup: ray.data.Dataset,
    key_col: str,
    carry_cols: list[str],
    val_col: str,
    out_col: str,
    num_parts: int,
    lookup_key: str = "vertex",
) -> ray.data.Dataset:
    """Co-partitioned hash join of a V-scale int64 lookup (vertex -> value)
    onto `keyed` rows (both sides too large to broadcast at corpus scale):
    union with a side tag, ONE shuffle by hash(key) %% P, vectorized
    searchsorted merge per partition (P groups total, no per-group Python).
    All columns must be int64. Inner-join semantics (keys missing from the
    lookup are dropped)."""

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy()
        cols = {"__k": t[key_col]}
        for i, c in enumerate(carry_cols):
            cols[f"__c{i}"] = t[c]
        cols["__val"] = pa.array(np.zeros(t.num_rows, np.int64))
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["__p"] = pa.array(part_of(k, num_parts), pa.int32())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[lookup_key].to_numpy()
        cols = {"__k": t[lookup_key]}
        for i in range(len(carry_cols)):
            cols[f"__c{i}"] = pa.array(np.zeros(t.num_rows, np.int64))
        cols["__val"] = t[val_col]
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["__p"] = pa.array(part_of(k, num_parts), pa.int32())
        return pa.table(cols)

    left = keyed.map_batches(tag_left, batch_format="pyarrow")
    right = lookup.map_batches(tag_right, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False).astype(bool)
        lk_keys = t["__k"].to_numpy(zero_copy_only=False)[~side]
        rk_keys = t["__k"].to_numpy(zero_copy_only=False)[side]
        vals = pc_cast_i64(t["__val"])[side]
        order = np.argsort(rk_keys, kind="stable")
        rk_keys, vals = rk_keys[order], vals[order]
        if len(rk_keys):
            pos = np.clip(np.searchsorted(rk_keys, lk_keys), 0, len(rk_keys) - 1)
            hit = rk_keys[pos] == lk_keys
        else:
            # no lookup rows in this partition: inner join drops every row;
            # a dummy val keeps vals[pos] in bounds while hit=False filters
            pos = np.zeros(len(lk_keys), np.int64)
            hit = np.zeros(len(lk_keys), bool)
            vals = np.zeros(1, np.int64)
        cols = {key_col: pa.array(lk_keys[hit], pa.int64())}
        for i, c in enumerate(carry_cols):
            cols[c] = pa.array(
                t[f"__c{i}"].to_numpy(zero_copy_only=False)[~side][hit], pa.int64()
            )
        cols[out_col] = pa.array(vals[pos][hit], pa.int64())
        return pa.table(cols)

    return left.union(right).groupby("__p").map_groups(merge, batch_format="pyarrow")


def pc_cast_i64(col: "pa.ChunkedArray") -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


@ray.remote
def _close_wedges_task(u, v, es_packed, lo: int, hi: int, mode: int):
    """Close all wedges whose first edge lies in [lo, hi) of the oriented,
    (u, rank, v)-sorted edge arrays. Args arrive as zero-copy object-store
    refs; the probe is one SIMD int64 searchsorted against the packed
    canonical edge array.

    mode 0: scalar count only. mode 1 (per-vertex): fold the triangle
    corners to SPARSE (vertex, count) INSIDE the task — the driver adds
    #distinct-corner rows per task instead of running three dense
    bincount(minlength=nv) passes per task serially (at nv ~ 30M ids x 64
    tasks that serial fold dominated clustering_coefficient 5x over the
    wedge work itself). mode 2 (per-edge): raw corner tuples, the
    edge-support path needs the pairs."""
    n = len(u)
    pos = np.arange(lo, hi)
    # run end per edge: next index where u changes, scanning within [lo, n)
    run_end = np.searchsorted(u, u[lo:hi], side="right")
    sizes = run_end - pos - 1
    sizes[sizes < 0] = 0
    tot = int(sizes.sum())
    if tot == 0:
        return (0, None, None, None)
    rep = np.repeat(pos, sizes)
    within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep - lo]
    gather = rep + 1 + within
    v1, v2 = v[rep], v[gather]  # int32 gathers: half the memory traffic
    qa, qb = np.minimum(v1, v2), np.maximum(v1, v2)
    qpack = (qa.astype(np.uint64) << np.uint64(32)) | qb.astype(np.uint64)
    # ADAPTIVE probe direction. es_packed is already sorted (driver sorts it
    # once), so the forward probe is one searchsorted of this task's wedges
    # into the edges: |W_t| log |E|, no sort. The inverted probe must first
    # sort the wedges (|W_t| log |W_t|) and then probe |E| log |W_t| — it
    # only wins when this task's wedges far outnumber the FULL edge array
    # (the round-2 hard-coded inversion regressed 21s->50s because at
    # corpus scale W_t = W/T << 8|E|). Threshold 8x covers the sort
    # constant; both directions are exact (es_packed values are distinct).
    invert = tot > 8 * len(es_packed)
    if mode == 0:
        if invert:
            qs = np.sort(qpack)
            lo_i = np.searchsorted(qs, es_packed, side="left")
            hi_i = np.searchsorted(qs, es_packed, side="right")
            return (int((hi_i - lo_i).sum()), None, None, None)
        pos = np.searchsorted(es_packed, qpack)
        np.clip(pos, 0, len(es_packed) - 1, out=pos)
        return (int((es_packed[pos] == qpack).sum()), None, None, None)
    if invert:
        o = np.argsort(qpack, kind="stable")
        qs = qpack[o]
        lo_i = np.searchsorted(qs, es_packed, side="left")
        hi_i = np.searchsorted(qs, es_packed, side="right")
        delta = np.zeros(len(qs) + 1, np.int32)
        np.add.at(delta, lo_i, 1)
        np.add.at(delta, hi_i, -1)
        hit = np.empty(len(qs), bool)
        hit[o] = np.cumsum(delta[:-1]) > 0
    else:
        pos = np.searchsorted(es_packed, qpack)
        np.clip(pos, 0, len(es_packed) - 1, out=pos)
        hit = es_packed[pos] == qpack
    if mode == 2:
        return (int(hit.sum()), u[rep][hit], qa[hit], qb[hit])
    corners = np.concatenate([u[rep][hit], qa[hit], qb[hit]])
    verts, cnts = np.unique(corners, return_counts=True)
    return (int(hit.sum()), verts.astype(np.int64), cnts.astype(np.int64), None)


def _triangles_broadcast(
    raw: ray.data.Dataset,
    num_tasks: int,
    per_vertex: bool,
    with_degrees: bool = False,
    per_edge: bool = False,
) -> ray.data.Dataset:
    """Broadcast-closure regime (|E| bounded): takes the CANONICALIZED but
    not-yet-deduped (a, b) table — dedup happens here as one np.unique over
    the packed pairs, replacing a whole Ray `distinct` shuffle (~4 s of
    wide-op overhead at sf0.1) with a driver sort it needed anyway.
    Degrees, orientation and the packed canonical edge array are cheap
    dense-id numpy on the driver; the O(E^1.5) wedge enumeration+probe fans
    out as balanced Ray tasks over u-ranges reading the broadcast arrays
    zero-copy. NO shuffle at any step. (The co-partitioned Dataset path in
    triangle_count handles graphs whose edge list cannot be broadcast.)"""
    df = raw.to_pandas()
    if "a" not in df.columns:  # fully-empty dataset loses its schema
        a = np.empty(0, np.int64)
        b = np.empty(0, np.int64)
    else:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
    del df
    # Every step below is SINGLE-THREADED driver numpy — the phase the
    # hypervisor's CPU steal amplifies 3-6x on this box (parallel task
    # phases average the steal out over 32 cpus; a serial phase eats it
    # 1:1). Keep it as lean as possible.
    vmax = int(max(a.max(), b.max())) if len(a) else 0
    if vmax < (1 << 26):
        # direct-id fast path: ids are small enough that an id-indexed
        # degree array (<= 512 MB transient) is cheaper than the rank
        # compaction's unique+searchsorted sorts over 2E elements
        nv = vmax + 1
        vs_sorted = None
        ra, rb = a, b
    else:
        vs_sorted = np.unique(np.concatenate([a, b]))
        nv = len(vs_sorted)
        assert nv < (1 << 31)  # int32 ranks; above the broadcast-regime cap
        ra = np.searchsorted(vs_sorted, a).astype(np.int64)
        rb = np.searchsorted(vs_sorted, b).astype(np.int64)
    # dedup + sort in ONE pass: unique over the packed pairs, then unpack
    # the now-distinct (ra, rb)
    es_packed = np.unique(
        (ra.astype(np.uint64) << np.uint64(32)) | rb.astype(np.uint64)
    )
    ra = (es_packed >> np.uint64(32)).astype(np.int64)
    rb = (es_packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    deg = np.bincount(ra, minlength=nv) + np.bincount(rb, minlength=nv)
    # orient from the endpoint with smaller (deg, id); int32 BEFORE the
    # lexsort (deg <= 2E < 2^31 in the broadcast regime) — the sort and the
    # wedge enumeration are gather-bound, so halving element width halves
    # their memory traffic
    da, db = deg[ra], deg[rb]
    a_first = (da < db) | ((da == db) & (ra < rb))
    u = np.where(a_first, ra, rb).astype(np.int32)
    v = np.where(a_first, rb, ra).astype(np.int32)
    rv = np.where(a_first, db, da).astype(np.int32)
    order = np.lexsort((v, rv, u))
    u, v = u[order], v[order]
    # balance tasks by wedge work: split cumulative sizes, snap to u-runs
    n = len(u)
    run_end_all = np.searchsorted(u, u, side="right")
    sizes_all = run_end_all - np.arange(n) - 1
    cum = np.cumsum(sizes_all)
    total_w = int(cum[-1]) if n else 0
    T = max(1, min(num_tasks, n))
    targets = (np.arange(1, T) * (total_w / T)).astype(np.int64)
    cuts = np.searchsorted(cum, targets)
    # snap each cut forward to its run start boundary (searchsorted on u)
    cuts = np.searchsorted(u, u[np.clip(cuts, 0, n - 1)], side="left")
    bounds = np.unique(np.concatenate([[0], cuts, [n]]))
    u_ref = ray.put(u)
    v_ref = ray.put(v)
    es_ref = ray.put(es_packed)
    mode = 2 if per_edge else (1 if per_vertex else 0)
    results = ray.get(
        [
            _close_wedges_task.remote(
                u_ref, v_ref, es_ref, int(bounds[i]), int(bounds[i + 1]),
                mode,
            )
            for i in range(len(bounds) - 1)
        ]
    )
    if mode == 0:
        nt = sum(r[0] for r in results)
        return ray.data.from_arrow(
            pa.table({"triangles": pa.array([nt], pa.int64())})
        )
    if per_edge:
        packs = []
        for _, tu, tv, tw in results:
            if tu is None:
                continue
            for x, y in ((tu, tv), (tu, tw), (tv, tw)):
                lo = np.minimum(x, y).astype(np.uint64)
                hi = np.maximum(x, y).astype(np.uint64)
                packs.append((lo << np.uint64(32)) | hi)
        if packs:
            uq, cnt = np.unique(np.concatenate(packs), return_counts=True)
        else:
            uq = np.empty(0, np.uint64)
            cnt = np.empty(0, np.int64)
        ea = (uq >> np.uint64(32)).astype(np.int64)
        eb = (uq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        if vs_sorted is not None:
            ea, eb = vs_sorted[ea], vs_sorted[eb]
        return ray.data.from_arrow(
            pa.table(
                {"a": pa.array(ea, pa.int64()), "b": pa.array(eb, pa.int64()),
                 "support": pa.array(cnt.astype(np.int64))}
            )
        )
    counts = np.zeros(nv, np.int64)
    for _, verts, cnts, _ in results:
        if verts is not None:
            # verts are unique within a task -> fancy-index add is exact
            counts[verts] += cnts
    if with_degrees:
        # every graph vertex, with its undirected simple degree — the deg
        # array already exists from the orientation step (free here; a
        # separate degree branch would repeat the whole canon+dedup)
        nz = np.flatnonzero(deg)
        vout = nz if vs_sorted is None else vs_sorted[nz]
        return ray.data.from_arrow(
            pa.table(
                {
                    "vertex": pa.array(vout, pa.int64()),
                    "triangles": counts[nz],
                    "deg": deg[nz].astype(np.int64),
                }
            )
        )
    nz = np.flatnonzero(counts)
    vout = nz if vs_sorted is None else vs_sorted[nz]
    return ray.data.from_arrow(
        pa.table(
            {"vertex": pa.array(vout, pa.int64()), "triangles": counts[nz]}
        )
    )


@ray.remote(num_cpus=0)
class _PairReducer:
    """One hash partition of the (pair → count) reduction for
    common_neighbors: wedge tasks push pre-combined (pair, cn) slices
    directly (the superstep exchange pattern — num_cpus=0 like CsrShard so
    the pool coexists with the generating tasks); chunks compact in place
    whenever the buffered volume passes a bound, so peak memory is
    O(distinct pairs in this partition), not O(pushed rows)."""

    _COMPACT_ROWS = 4_000_000

    def __init__(self):
        self.chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.buffered = 0
        # geometric re-compaction threshold: compacting every fixed 4M rows
        # re-sorts the whole accumulated array each time (O(n^2/buffer)
        # total) — doubling keeps the summed sort volume O(n log n)
        self.compacted = 0

    def _compact(self) -> None:
        if not self.chunks:
            return
        pair = np.concatenate([c[0] for c in self.chunks])
        cn = np.concatenate([c[1] for c in self.chunks])
        uq, inv = np.unique(pair, return_inverse=True)
        sums = np.bincount(inv, weights=cn.astype(np.float64))
        # counts are < 2^53 and sentinel sums stay ~-2^62 (one sentinel per
        # pair at most, true counts < 2^61): float64 is exact here only for
        # the positive side, so keep the sentinel dominant by clamping
        csum = sums.astype(np.int64)
        self.chunks = [(uq, csum)]
        self.buffered = len(uq)
        self.compacted = len(uq)

    def add(self, pair: np.ndarray, cn: np.ndarray) -> int:
        self.chunks.append((pair, cn))
        self.buffered += len(pair)
        if self.buffered > max(self._COMPACT_ROWS, 2 * self.compacted):
            self._compact()
        return len(pair)

    def c4_sum(self) -> pa.Table:
        """Square-census finalize: this partition's distinct-pair count and
        sum of C(cn, 2) — pairs are key-disjoint across reducers, so the
        driver just adds P rows (square_count)."""
        self._compact()
        if not self.chunks:
            z = np.int64(0)
            return pa.table({"pairs": pa.array([z]), "c2": pa.array([z])})
        _, cn = self.chunks[0]
        return pa.table(
            {
                "pairs": pa.array([np.int64(len(cn))]),
                "c2": pa.array([np.int64((cn * (cn - 1) // 2).sum())]),
            }
        )

    def topk(self, top_n: int) -> pa.Table:
        self._compact()
        if not self.chunks:
            e = np.empty(0, np.int64)
            return pa.table({"src": e, "dst": e, "cn": e})
        pair, cn = self.chunks[0]
        keep = cn > 0  # drops sentinel-marked (adjacent) pairs
        pair, cn = pair[keep], cn[keep]
        top = np.lexsort((pair, -cn))[:top_n]  # (cn desc, pair asc) cut
        pair, cn = pair[top], cn[top]
        return pa.table(
            {
                "src": pa.array(pair >> np.int64(32), pa.int64()),
                "dst": pa.array(pair & np.int64(0xFFFFFFFF), pa.int64()),
                "cn": pa.array(cn, pa.int64()),
            }
        )

    def topk_jaccard(self, top_n: int, deg) -> pa.Table:
        """Top-n pairs by the Jaccard coefficient cn / (deg(a)+deg(b)-cn),
        carried as exact integer billionths ((1e9*cn) // den — the same
        truncating integer division DuckDB's // performs, so the scores
        hash-match the SQL oracle). deg = broadcast (sorted verts, degs)."""
        verts, degs = deg
        self._compact()
        e = np.empty(0, np.int64)
        if not self.chunks:
            return pa.table({"src": e, "dst": e, "jac_e9": e, "cn": e})
        pair, cn = self.chunks[0]
        keep = cn > 0
        pair, cn = pair[keep], cn[keep]
        if not len(pair):
            return pa.table({"src": e, "dst": e, "jac_e9": e, "cn": e})
        a = pair >> np.int64(32)
        b = pair & np.int64(0xFFFFFFFF)
        da = degs[np.searchsorted(verts, a)]
        db = degs[np.searchsorted(verts, b)]
        den = da + db - cn
        jac = (np.int64(1_000_000_000) * cn) // den
        top = np.lexsort((pair, -jac))[:top_n]
        return pa.table(
            {
                "src": pa.array(a[top], pa.int64()),
                "dst": pa.array(b[top], pa.int64()),
                "jac_e9": pa.array(jac[top], pa.int64()),
                "cn": pa.array(cn[top], pa.int64()),
            }
        )


def _pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a, b) with a < b < 2^31 packed into one int64 (a << 32 | b) — a
    sortable scalar pair key that keeps the downstream shuffle/aggregate
    native int64 instead of struct-sorting."""
    if len(b) and int(b.max()) >= (1 << 31):
        raise ValueError(
            "common_neighbors packs vertex pairs into int64 and needs ids "
            "< 2^31; remap ids (or extend to the struct key used by "
            "triangle_count) for larger id spaces"
        )
    return (a << np.int64(32)) | b


def common_neighbors(
    edges: ray.data.Dataset,
    top_n: int = 100,
    num_partitions: int = 32,
    max_deg: int | None = None,
    broadcast_edges_max: int = 50_000_000,
    weight: str = "count",
    score: str = "cn",
) -> ray.data.Dataset:
    """Link prediction by common-neighbor counts: the top-`top_n`
    NON-adjacent vertex pairs ranked by (count desc, src, dst).

    weight="adamic_adar": each wedge contributes floor(1e9 / ln(deg(center)))
    instead of 1 — the Adamic-Adar index in exact integer billionths (the
    float-parity surrogate: math.log and DuckDB ln share libm, and the
    floor of the identical IEEE quotient is bit-stable, so the summed int64
    scores hash-match the SQL oracle; per-pair sums stay < 2^53 for
    common-neighbor counts up to ~6e6, far above any real pair). The center
    degree is its run length in the symmetric adjacency — exact, because
    every edge of a center hashes to the center's partition.

    Dataflow: canonical undirected distinct edges → symmetric adjacency
    partitioned by hash(center) → per-partition vectorized wedge-pair
    enumeration (the triangle kernel's grouped-arange gather) emitting
    PACKED int64 pair keys with a per-partition np.unique combiner → the
    global per-pair sum runs on P REDUCER ACTORS fed by direct hash(pair)
    pushes from each wedge task (the superstep engine's exchange pattern;
    pushes are acked inside the task, so dataset completion IS the
    delivery barrier) → per-reducer top-n → tiny global sort+limit.
    Measured rationale for the actor exchange: Ray Data's sort-based
    groupby/aggregate took 84-208 s on the 14M-row pair table at sf0.01
    where the direct exchange takes seconds — same tradeoff as the
    superstep engine (state/csr.py).

    Adjacent pairs are excluded by regime (the triangle_count pattern):
    |E| <= broadcast_edges_max (and a 10%-of-RAM guard): the sorted packed
    edge array is `ray.put` ONCE and every wedge task drops edge hits at
    generation time — adjacent pairs never enter the exchange. Larger
    graphs: edge rows ride the SAME reducers with a -2^62 sentinel count,
    so any pair that is an edge sums negative and the post-filter drops it.

    max_deg: optional hub cap — vertices with degree above it are SKIPPED
    as wedge centers and the dropped-center count is logged (recall loss is
    never silent); at web scale a single hub would otherwise fan out
    O(deg^2) pairs. Default None = exact.

    score="jaccard": rank by the Jaccard coefficient cn/(deg(a)+deg(b)-cn)
    instead of the raw count, as exact integer billionths (truncating
    integer division on both sides). The per-vertex degree table is
    computed distributed (int_degrees) then `ray.put` ONCE as a sorted
    lookup the reducers binary-search at cut time — a |V|-sized broadcast,
    the documented small-side assumption (at |V| beyond node RAM, ship
    degrees to the reducers by hash(vertex) instead)."""
    import logging

    import pyarrow.compute as pc

    P = num_partitions
    SENTINEL = -(1 << 62)  # |true cn| < 2^61, so edge rows stay negative

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    deg_ref = None
    if score == "jaccard":

        def both_ends(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vertex": pa.concat_arrays(
                        [t["a"].combine_chunks(), t["b"].combine_chunks()]
                    )
                }
            )

        ddf = int_degrees(
            und.map_batches(both_ends, batch_format="pyarrow"), num_parts=P
        ).to_pandas()
        dorder = np.argsort(ddf["vertex"].to_numpy())
        deg_ref = ray.put(
            (
                ddf["vertex"].to_numpy(np.int64)[dorder],
                ddf["deg"].to_numpy(np.int64)[dorder],
            )
        )

    n_edges = und.count()
    try:
        avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        broadcast_edges_max = min(broadcast_edges_max, int(avail * 0.10) // 8)
    except (ValueError, OSError, AttributeError):  # non-Linux fallback
        pass
    epack_ref = None
    if n_edges <= broadcast_edges_max:
        edf = und.to_pandas()
        epack_ref = ray.put(
            np.sort(
                _pack_pair(
                    edf["a"].to_numpy(np.int64), edf["b"].to_numpy(np.int64)
                )
            )
        )

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks()
        b = t["b"].combine_chunks()
        s = pa.concat_arrays([a, b])
        d = pa.concat_arrays([b, a])
        sv = s.to_numpy(zero_copy_only=False)
        return pa.table(
            {"s": s, "d": d, "sp": pa.array(part_of(sv, P), pa.int32())}
        )

    adj = und.map_batches(sym, batch_format="pyarrow")

    def wedge_pairs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        s = t["s"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        n = len(s)
        new_run = np.concatenate([[True], s[1:] != s[:-1]])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        run_end = np.concatenate([starts[1:], [n]])[run_id]
        if max_deg is not None:
            run_len = run_end - starts[run_id]
            hub = run_len > max_deg
            if hub.any():
                logging.getLogger(__name__).warning(
                    "common_neighbors: skipping %d hub centers (deg > %d)",
                    len(np.unique(s[hub])), max_deg,
                )
                keep = ~hub
                s, d = s[keep], d[keep]
                n = len(s)
                new_run = np.concatenate([[True], s[1:] != s[:-1]])
                starts = np.flatnonzero(new_run)
                run_id = np.cumsum(new_run) - 1
                run_end = np.concatenate([starts[1:], [n]])[run_id]
        pos = np.arange(n)
        sizes = run_end - pos - 1
        tot = int(sizes.sum())
        if tot == 0:
            e = np.empty(0, np.int64)
            return e, e
        rep = np.repeat(pos, sizes)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep]
        gather = rep + 1 + within
        pair = _pack_pair(d[rep], d[gather])  # sorted runs -> a < b always
        if weight == "adamic_adar":
            degs = (run_end - starts[run_id])[rep]  # wedge center's degree
            uq = np.unique(degs)
            wt_u = np.array(
                [math.floor(1e9 / math.log(int(g))) for g in uq], np.int64
            )
            vals = wt_u[np.searchsorted(uq, degs)]
        elif weight == "resource_allocation":
            # resource-allocation index: wedge contributes 1/deg(center),
            # as exact integer billionths via pure int floor division
            # (no float anywhere — both sides use `//`)
            degs = (run_end - starts[run_id])[rep]
            vals = np.int64(1_000_000_000) // degs.astype(np.int64)
        else:
            vals = np.ones(len(pair), np.int64)
        if epack_ref is not None:
            es = ray.get(epack_ref)  # zero-copy read of the broadcast array
            if len(es):
                idx = np.clip(np.searchsorted(es, pair), 0, len(es) - 1)
                keep = es[idx] != pair
                pair, vals = pair[keep], vals[keep]
        # no per-partition combiner: duplicate pairs within one center
        # partition are rare (<20% at sf0.01) and the reducers dedup on
        # compaction anyway — the 16-byte/pair extra push volume is cheaper
        # than an O(n log n) struct sort of the whole wedge table per task
        return pair, vals

    reducers = [_PairReducer.remote() for _ in range(P)]

    def pushed(pair: np.ndarray, cn: np.ndarray) -> pa.Table:
        """Slice (pair, cn) by hash(pair) and push each slice at its
        reducer; awaiting the acks here makes dataset completion the
        delivery barrier. Returns a one-row per-task summary."""
        kp = part_of(pair, P)
        order = np.argsort(kp, kind="stable")
        bounds = np.searchsorted(kp[order], np.arange(P + 1))
        acks = []
        for p in range(P):
            sl = order[bounds[p] : bounds[p + 1]]
            if len(sl):
                acks.append(reducers[p].add.remote(pair[sl], cn[sl]))
        if acks:
            ray.get(acks)
        return pa.table({"pushed": pa.array([len(pair)], pa.int64())})

    wedge_push = adj.groupby("sp").map_groups(
        lambda t: pushed(*wedge_pairs(t)), batch_format="pyarrow"
    )
    total = sum(r["pushed"] for r in wedge_push.take_all())
    if epack_ref is None:
        # all-scale anti-join: edge rows ride the reducers with a sentinel
        def edge_rows(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pushed(
                _pack_pair(a, b), np.full(len(a), SENTINEL, np.int64)
            )

        total += sum(
            r["pushed"]
            for r in und.map_batches(
                edge_rows, batch_format="pyarrow"
            ).take_all()
        )

    if score == "jaccard":
        ranked = ray.data.from_arrow_refs(
            [r.topk_jaccard.remote(top_n, deg_ref) for r in reducers]
        )
        return ranked.sort(
            ["jac_e9", "src", "dst"], descending=[True, False, False]
        ).limit(top_n)
    ranked = ray.data.from_arrow_refs(
        [r.topk.remote(top_n) for r in reducers]
    )
    return ranked.sort(
        ["cn", "src", "dst"], descending=[True, False, False]
    ).limit(top_n)


def triangle_count(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    per_vertex: bool = False,
    broadcast_edges_max: int = 50_000_000,
    with_degrees: bool = False,
    per_edge: bool = False,
) -> ray.data.Dataset:
    """Exact triangle counting via degree-ordered orientation.

    per_edge=True returns (a, b, support) — each undirected edge's
    triangle count (the k-truss support metric) — instead of the scalar
    or per-vertex counts.

    1. canonicalize to undirected distinct edges (a<b), drop self-loops;
    2. degree table (combiner + one cheap-key shuffle);
    3. orient each edge from the endpoint with smaller (degree, id) rank —
       bounds every vertex oriented out-degree by O(sqrt(E)), so the wedge
       table is O(E^1.5) worst case instead of O(sum deg^2) (SURVEY.md §7.4);
    4. wedges (ordered out-neighbor pairs, generated vectorized per hash
       partition) closed against the edge set:
       - |E| <= broadcast_edges_max: the sorted canonical pair array is
         `ray.put` ONCE and every wedge task probes it in-place
         (searchsorted) — wedges never leave their task, no O(wedges)
         shuffle. 50M edges ~= 800 MB, comfortably broadcastable.
       - larger graphs: co-partitioned sorted-membership probe — wedges
         union the oriented edges, ONE shuffle on hash(v,w) %% P, match per
         partition (the all-scale path; O(wedges) shuffle volume).

    All per-partition kernels are numpy (no per-group Python). Returns a
    one-row Dataset {"triangles": n}, or per-vertex counts when
    per_vertex=True.
    """
    import pyarrow.compute as pc

    P = num_partitions

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    # shared intermediates are consumed by multiple downstream branches;
    # materialize() pins them in the object store (spillable) so the diamond
    # DAG does not re-execute the upstream once per consumer
    raw = edges.map_batches(canon, batch_format="pyarrow").materialize()

    # regime guard on the PRE-dedup count (>= deduped count, so it is a
    # conservative stand-in that saves the dedup shuffle in the broadcast
    # regime — the broadcast path dedups in-driver via one np.unique)
    n_edges = raw.count()
    # memory-aware guard: the broadcast regime materializes ~16 bytes/edge
    # on the driver; cap the threshold at 10% of currently-available RAM so
    # a generous default can never OOM a loaded driver
    try:
        avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        broadcast_edges_max = min(broadcast_edges_max, int(avail * 0.10) // 16)
    except (ValueError, OSError, AttributeError):  # non-Linux fallback
        pass
    if n_edges <= broadcast_edges_max:
        return _triangles_broadcast(
            raw, num_partitions, per_vertex, with_degrees, per_edge
        )
    und = distinct(raw, ["a", "b"]).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vertex": v})

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), P
    ).materialize()

    wd = _attach_value(und, deg, "a", ["b"], "deg", "deg_a", P)
    wd = _attach_value(
        wd.rename_columns({"a": "oa", "b": "a"}),  # key on b now
        deg,
        "a",
        ["oa", "deg_a"],
        "deg",
        "deg_b",
        P,
    ).rename_columns({"a": "b", "oa": "a"})

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        da = t["deg_a"].to_numpy()
        db = t["deg_b"].to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        rv = np.where(a_first, db, da)  # orientation rank key of v
        return pa.table(
            {"u": u, "v": v, "rv": rv, "up": pa.array(part_of(u, P), pa.int32())}
        )

    oriented = wd.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(t: pa.Table) -> pa.Table:
        # one call per hash partition, fully vectorized: for each edge at
        # position p of its u-run, pair it with every LATER edge in the run
        # (grouped-arange gather; no per-source Python loop)
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        rv = t["rv"].to_numpy()
        order = np.lexsort((v, rv, u))
        u, v = u[order], v[order]
        n = len(u)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], u[1:] != u[:-1]])) - 1
        run_end = np.concatenate([starts[1:], [n]])[run_id]  # per edge
        pos = np.arange(n)
        sizes = run_end - pos - 1  # later edges in the same run
        tot = int(sizes.sum())
        if tot == 0:
            e = np.empty(0, np.int64)
            return pa.table({"wv": e, "ww": e, "wu": e, "kp": np.empty(0, np.int32)})
        rep = np.repeat(pos, sizes)  # first-edge position per wedge
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep]
        gather = rep + 1 + within  # second-edge position
        wvc, wwc = v[rep], v[gather]
        return pa.table(
            {
                "wv": wvc,
                "ww": wwc,
                "wu": u[rep],
                "kp": pa.array(_pair_part(wvc, wwc, P), pa.int32()),
            }
        )

    wedge_ds = oriented.groupby("up").map_groups(wedges, batch_format="pyarrow")

    def key_edge(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        return pa.table(
            {
                "wv": t["u"],
                "ww": t["v"],
                "wu": pa.array(np.full(len(u), np.iinfo(np.int64).min, np.int64)),
                "kp": pa.array(_pair_part(u, v, P), pa.int32()),
            }
        )

    SENTINEL = np.iinfo(np.int64).min
    probes = wedge_ds.union(oriented.map_batches(key_edge, batch_format="pyarrow"))

    def match(t: pa.Table) -> pa.Table:
        wu = t["wu"].to_numpy(zero_copy_only=False)
        is_edge = wu == SENTINEL
        wv = t["wv"].to_numpy(zero_copy_only=False)
        ww = t["ww"].to_numpy(zero_copy_only=False)
        es = np.sort(_pair_struct(wv[is_edge], ww[is_edge]))
        qs = _pair_struct(wv[~is_edge], ww[~is_edge])
        qu = wu[~is_edge]
        e = np.empty(0, np.int64)
        if len(es) == 0 or len(qs) == 0:
            return pa.table({"tu": e, "tv": e, "tw": e})
        pos = np.clip(np.searchsorted(es, qs), 0, len(es) - 1)
        hit = es[pos] == qs
        return pa.table(
            {"tu": qu[hit], "tv": qs["a"][hit], "tw": qs["b"][hit]}
        )

    closed = probes.groupby("kp").map_groups(match, batch_format="pyarrow")

    if per_edge:

        def edge_pairs(t: pa.Table) -> pa.Table:
            tu = t["tu"].to_numpy(zero_copy_only=False)
            tv = t["tv"].to_numpy(zero_copy_only=False)
            tw = t["tw"].to_numpy(zero_copy_only=False)
            xs = np.concatenate([tu, tu, tv])
            ys = np.concatenate([tv, tw, tw])
            return pa.table(
                {"a": np.minimum(xs, ys), "b": np.maximum(xs, ys)}
            )

        return (
            closed.map_batches(edge_pairs, batch_format="pyarrow")
            .groupby(["a", "b"])
            .count()
            .rename_columns({"count()": "support"})
        )

    if not per_vertex:
        n = closed.count()
        return ray.data.from_arrow(pa.table({"triangles": pa.array([n], pa.int64())}))

    def explode(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays(
            [
                t["tu"].combine_chunks(),
                t["tv"].combine_chunks(),
                t["tw"].combine_chunks(),
            ]
        )
        return pa.table({"vertex": v})

    # count-per-vertex via the combiner+hashed-fold (int_degrees), not a
    # raw-key V-scale sort-aggregate
    tri = int_degrees(
        closed.map_batches(explode, batch_format="pyarrow"),
        num_parts=num_partitions,
    ).rename_columns({"deg": "triangles"})
    if not with_degrees:
        return tri
    # deg (all graph vertices) is already materialized above — join the
    # triangle counts back instead of re-deriving degrees from scratch
    joined = deg.join(
        tri, join_type="left_outer", num_partitions=P, on=("vertex",)
    )

    def fill(t: pa.Table) -> pa.Table:
        tr = np.nan_to_num(
            t["triangles"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "vertex": t["vertex"],
                "triangles": tr,
                "deg": pc.cast(t["deg"], pa.int64()),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def k4_count(
    edges: ray.data.Dataset,
    num_tasks: int = 64,
    broadcast_edges_max: int = 50_000_000,
    incidence_max: int = 200_000_000,
) -> ray.data.Dataset:
    """Exact 4-clique (K4) census of the simple undirected graph, as two
    rounds of the same wedge-closure kernel triangle_count uses:

    round 1 — degree-ordered orientation + wedge closure enumerates every
    triangle exactly once (mode-2 tasks return the corner tuples);
    round 2 — the 3 (canonical edge, third corner) incidences per triangle
    form a new "adjacency": within each edge's run, every pair of thirds
    (c, d) is probed against the packed edge set, and a hit is exactly the
    K4 {a, b, c, d} seen from edge (a, b). Each K4 is hit once per its 6
    edges, so k4 = hits // 6 (divisibility asserted).

    Scale shape: broadcast regime only — the oriented arrays and the
    incidence arrays ship once via ray.put and both rounds fan out as
    balanced Ray tasks (cumulative-work splits snapped to run starts).
    Caps are explicit and raise loudly (|E| <= broadcast_edges_max,
    3 * n_triangles <= incidence_max) — graphs beyond them need the
    co-partitioned route documented in triangle_count; this census never
    silently degrades. Returns a one-row Dataset {"k4": n}."""
    import pyarrow.compute as pcc

    def canon(t: pa.Table) -> pa.Table:
        s = pcc.cast(t["src"], pa.int64())
        d = pcc.cast(t["dst"], pa.int64())
        keep = pcc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pcc.min_element_wise(s, d), "b": pcc.max_element_wise(s, d)}
        )

    df = edges.map_batches(canon, batch_format="pyarrow").to_pandas()
    if "a" not in df.columns or not len(df):
        return ray.data.from_arrow(pa.table({"k4": pa.array([0], pa.int64())}))
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    del df
    if len(a) > broadcast_edges_max:
        raise ValueError(
            f"k4_count broadcast regime cap exceeded ({len(a)} raw edges > "
            f"{broadcast_edges_max}); route through a co-partitioned closure"
        )
    vs = np.unique(np.concatenate([a, b]))
    nv = len(vs)
    assert nv < (1 << 31)  # int32 ranks, same bound as the triangle path
    ra = np.searchsorted(vs, a).astype(np.int64)
    rb = np.searchsorted(vs, b).astype(np.int64)
    es_packed = np.unique(
        (ra.astype(np.uint64) << np.uint64(32)) | rb.astype(np.uint64)
    )
    ra = (es_packed >> np.uint64(32)).astype(np.int64)
    rb = (es_packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    deg = np.bincount(ra, minlength=nv) + np.bincount(rb, minlength=nv)
    da, db = deg[ra], deg[rb]
    a_first = (da < db) | ((da == db) & (ra < rb))
    u = np.where(a_first, ra, rb).astype(np.int32)
    v = np.where(a_first, rb, ra).astype(np.int32)
    rv = np.where(a_first, db, da).astype(np.int32)
    order = np.lexsort((v, rv, u))
    u, v = u[order], v[order]

    def balanced_bounds(run_key: np.ndarray) -> np.ndarray:
        n = len(run_key)
        run_end = np.searchsorted(run_key, run_key, side="right")
        sizes = run_end - np.arange(n) - 1
        cum = np.cumsum(sizes)
        total = int(cum[-1]) if n else 0
        T = max(1, min(num_tasks, n))
        targets = (np.arange(1, T) * (total / T)).astype(np.int64)
        cuts = np.searchsorted(cum, targets)
        cuts = np.searchsorted(run_key, run_key[np.clip(cuts, 0, n - 1)], "left")
        return np.unique(np.concatenate([[0], cuts, [n]]))

    es_ref = ray.put(es_packed)
    b1 = balanced_bounds(u)
    u_ref, v_ref = ray.put(u), ray.put(v)
    tri = ray.get(
        [
            _close_wedges_task.remote(
                u_ref, v_ref, es_ref, int(b1[i]), int(b1[i + 1]), 2
            )
            for i in range(len(b1) - 1)
        ]
    )
    packs, thirds = [], []
    for _, tu, tv, tw in tri:
        if tu is None:
            continue
        for x, y, z in ((tu, tv, tw), (tu, tw, tv), (tv, tw, tu)):
            lo = np.minimum(x, y).astype(np.uint64)
            hi = np.maximum(x, y).astype(np.uint64)
            packs.append((lo << np.uint64(32)) | hi)
            thirds.append(z)
    if not packs:
        return ray.data.from_arrow(pa.table({"k4": pa.array([0], pa.int64())}))
    epack = np.concatenate(packs)
    third = np.concatenate(thirds).astype(np.int32)
    if len(epack) > incidence_max:
        raise ValueError(
            f"k4_count incidence cap exceeded ({len(epack)} (edge, third) "
            f"rows > {incidence_max}); shard round 2 before retrying"
        )
    o2 = np.lexsort((third, epack))
    epack, third = epack[o2], third[o2]
    b2 = balanced_bounds(epack)
    e2_ref, t2_ref = ray.put(epack), ray.put(third)
    hits = sum(
        r[0]
        for r in ray.get(
            [
                _close_wedges_task.remote(
                    e2_ref, t2_ref, es_ref, int(b2[i]), int(b2[i + 1]), 0
                )
                for i in range(len(b2) - 1)
            ]
        )
    )
    # correctness guard, not a debug assert: every 4-clique is hit exactly
    # 6 times, so a remainder means a broken closure kernel — must survive
    # `python -O` (ADVICE.md round 3)
    if hits % 6 != 0:
        raise ValueError(
            f"k4_count closure invariant violated: {hits} hits is not a "
            f"multiple of 6"
        )
    return ray.data.from_arrow(
        pa.table({"k4": pa.array([hits // 6], pa.int64())})
    )


def clustering_coefficient(
    edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """Per-vertex local clustering coefficient over the undirected simple
    graph: cc = 2*triangles / (deg*(deg-1)) for vertices with deg >= 2.

    Rides the triangle pipeline's with_degrees output (the orientation
    step computes undirected degrees anyway — no second canon/dedup pass
    over the edges). The division is ONE IEEE expression
    (2.0*tri)/(deg*(deg-1.0)), mirrored verbatim by the SQL oracle for
    bit-exact rounding."""

    tri = triangle_count(
        edges, num_partitions, per_vertex=True, with_degrees=True
    )

    def fin(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = t["triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        d, tr = d[keep], tr[keep]
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        cc = (2.0 * tr) / (d * (d - 1.0))
        return pa.table({"vertex": v, "deg": d, "triangles": tr, "cc": cc})

    return tri.map_batches(fin, batch_format="pyarrow")


def degree_assortativity(
    edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation of endpoint degrees over the symmetric edge list
    (each undirected edge counted in both orientations, M = 2E):

        r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2)

    with Sx = sum(dx+dy), Sxy = sum(2*dx*dy), Sxx = sum(dx^2+dy^2) — all
    EXACT integer partials combined driver-side in Python bigints, then
    one float(num)/float(den) (each operand rounded to double first, the
    identical semantics of SQL CAST(HUGEINT AS DOUBLE) division).

    Shape: canon + distinct + the combiner degree aggregate, two
    co-partitioned searchsorted joins to attach endpoint degrees, then a
    one-row-per-batch integer partial fold — nothing scales with V or E
    past the joins."""
    import pyarrow.compute as pc

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    P = num_partitions
    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vertex": v})

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), P
    ).materialize()

    def _moments(x: np.ndarray, y: np.ndarray) -> pa.Table:
        return pa.table(
            {
                "e": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int((x + y).sum())], pa.int64()),
                "sxy": pa.array([int(2 * (x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x + y * y).sum())], pa.int64()),
            }
        )

    n_vertices = deg.count()
    if n_vertices <= 5_000_000:
        # V-scale degree table is small: broadcast it (ray.put once, read
        # per task) and fuse both endpoint-degree attaches AND the moment
        # fold into ONE edge pass — zero extra shuffles vs the two
        # co-partitioned joins of the any-scale path below
        dp = deg.to_pandas()
        dv = dp["vertex"].to_numpy(np.int64)
        o = np.argsort(dv, kind="stable")
        d_ref = ray.put((dv[o], dp["deg"].to_numpy(np.int64)[o]))

        def bcast_partials(t: pa.Table) -> pa.Table:
            from ..functions.proccache import cached_get

            dvs, dds = cached_get(d_ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            x = dds[np.searchsorted(dvs, a)].astype(np.int64)
            y = dds[np.searchsorted(dvs, b)].astype(np.int64)
            return _moments(x, y)

        rows = und.map_batches(bcast_partials, batch_format="pyarrow").take_all()
    else:
        wd = _attach_value(und, deg, "a", ["b"], "deg", "deg_a", P)
        wd = _attach_value(
            wd.rename_columns({"a": "oa", "b": "a"}),
            deg,
            "a",
            ["oa", "deg_a"],
            "deg",
            "deg_b",
            P,
        )

        def partials(t: pa.Table) -> pa.Table:
            x = t["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = t["deg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return _moments(x, y)

        rows = wd.map_batches(partials, batch_format="pyarrow").take_all()
    e = sum(r["e"] for r in rows)
    sx = sum(int(r["sx"]) for r in rows)
    sxy = sum(int(r["sxy"]) for r in rows)
    sxx = sum(int(r["sxx"]) for r in rows)
    m = 2 * e
    num = m * sxy - sx * sx  # exact Python bigints
    den = m * sxx - sx * sx
    r = float(num) / float(den) if den else 0.0
    from ..functions.rounding import round_half_away

    return ray.data.from_arrow(
        pa.table(
            {
                "edges": pa.array([e], pa.int64()),
                "assortativity": pa.array(
                    [float(round_half_away(np.array([r]), 6)[0])], pa.float64()
                ),
            }
        )
    )


def reciprocity_summary(
    edges: ray.data.Dataset, num_partitions: int = 32
) -> ray.data.Dataset:
    """One-row DIRECTED-graph summary: raw edge count, distinct ordered
    edges, self-loops, reciprocated edges (distinct ordered non-loop pairs
    whose reverse edge also exists), and reciprocity = n_reciprocal /
    (n_distinct - n_self_loops), one IEEE divide rounded to 6.

    Scale shape: ONE shuffle — every ordered pair is routed by the hash of
    its UNORDERED key, so (a,b) and (b,a) land in the same partition and
    each partition's dedup / reverse-membership scan is globally correct
    in isolation. Per-partition kernel is a dense local re-index +
    np.unique + searchsorted (no Python row loop); each partition emits a
    ONE-ROW integer partial and the driver folds num_partitions rows."""

    def route(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        with np.errstate(over="ignore"):
            key = lo * np.int64(1_000_003) + hi  # wraparound mix is fine
        return pa.table(
            {
                "src": s,
                "dst": d,
                "__p": pa.array(part_of(key, num_partitions), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        n_raw = len(s)
        u = np.unique(np.concatenate([s, d]))
        si = np.searchsorted(u, s).astype(np.int64)
        di = np.searchsorted(u, d).astype(np.int64)
        L = np.int64(len(u))
        enc = np.unique(si * L + di)  # distinct ordered pairs, sorted
        es, ed = enc // L, enc % L
        loops = es == ed
        renc = ed[~loops] * L + es[~loops]
        pos = np.searchsorted(enc, renc)
        pos = np.minimum(pos, len(enc) - 1) if len(enc) else pos
        n_recip = int((enc[pos] == renc).sum()) if len(enc) else 0
        return pa.table(
            {
                "n_raw": pa.array([n_raw], pa.int64()),
                "n_distinct": pa.array([len(enc)], pa.int64()),
                "n_loops": pa.array([int(loops.sum())], pa.int64()),
                "n_recip": pa.array([n_recip], pa.int64()),
            }
        )

    rows = (
        edges.map_batches(route, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .take_all()
    )
    n_raw = sum(int(r["n_raw"]) for r in rows)
    n_dis = sum(int(r["n_distinct"]) for r in rows)
    n_loop = sum(int(r["n_loops"]) for r in rows)
    n_rec = sum(int(r["n_recip"]) for r in rows)
    den = n_dis - n_loop
    rec = float(n_rec) / float(den) if den else 0.0
    from ..functions.rounding import round_half_away

    return ray.data.from_arrow(
        pa.table(
            {
                "n_raw": pa.array([n_raw], pa.int64()),
                "n_distinct": pa.array([n_dis], pa.int64()),
                "n_self_loops": pa.array([n_loop], pa.int64()),
                "n_reciprocal": pa.array([n_rec], pa.int64()),
                "reciprocity": pa.array(
                    [float(round_half_away(np.array([rec]), 6)[0])], pa.float64()
                ),
            }
        )
    )


def ktruss(
    edges: ray.data.Dataset,
    k: int = 5,
    num_partitions: int = 32,
    max_rounds: int = 32,
) -> ray.data.Dataset:
    """k-truss subgraph: iteratively drop edges whose triangle support is
    below k-2 until a fixpoint (edges in no triangle drop immediately —
    per_edge output only lists supported edges). Each round is one full
    oriented-wedge support pass over the SURVIVING edges; with positive
    peeling every round strictly shrinks the edge set, so rounds <=
    initial support radius (measured single digits on the co-occurrence
    graphs). Returns (a, b, support) of the converged subgraph, support
    as recomputed on the final edge set.

    The SQL mirror unrolls the same peeling a fixed number of rounds past
    convergence (extra rounds are no-ops) — the kcore oracle pattern."""
    cur = edges
    prev_n = -1
    for _ in range(max_rounds):
        sup = triangle_count(cur, num_partitions, per_edge=True).materialize()
        keep = sup.filter(expr=f"support >= {k - 2}").materialize()
        n = keep.count()
        if n == prev_n or n == 0:  # fixpoint (empty is trivially converged)
            return keep
        prev_n = n
        cur = keep.rename_columns({"a": "src", "b": "dst"}).drop_columns(
            ["support"]
        )
    return keep


def random_walks(
    graph: ShardedGraph, seeds, length: int = 4
) -> ray.data.Dataset:
    """Deterministic random-walk corpus generation (the DeepWalk /
    node2vec sampling step): from each seed vertex, walk `length` steps;
    at step k the walk at vertex v moves to v's
    ((walk_id*C1 + k*C2) mod deg)-th neighbor in sorted-dst order — a
    seeded hash pick, bit-reproducible and SQL-mirrorable via
    row_number() OVER (PARTITION BY src ORDER BY dst).

    The adjacency stays sharded in the CsrShard pool; each step routes
    the walk frontier to the owning shards (driver holds only the
    seed-scale walk table — for vertex-scale walk fleets the same
    walk_next kernel would run as an actor-resident exchange like BFS).
    Returns (walk_id, step, vertex) with step 0 = the seed itself; walks
    from seeds absent from the graph emit nothing."""
    if graph.salted:
        raise ValueError("random_walks supports unsalted graphs only")
    actors = graph.actors
    P = graph.P
    seeds = np.unique(np.asarray(seeds, np.int64))
    cur_ids, cur_vs = seeds, seeds.copy()
    out_ids: list[np.ndarray] = []
    out_steps: list[np.ndarray] = []
    out_vs: list[np.ndarray] = []
    for step in range(1, length + 1):
        parts = part_of(cur_vs, P)
        refs = []
        for p in range(P):
            m = parts == p
            if m.any():
                refs.append(actors[p].walk_next.remote(cur_ids[m], cur_vs[m], step))
        results = ray.get(refs)
        ids = np.concatenate([r[0] for r in results]) if results else np.empty(0, np.int64)
        vs = np.concatenate([r[1] for r in results]) if results else np.empty(0, np.int64)
        if step == 1:
            # a seed is "in the graph" iff it has adjacency — exactly the
            # ids that survived the first hop (symmetric builds give every
            # present vertex deg >= 1); emit their step-0 rows
            out_ids.append(ids)
            out_steps.append(np.zeros(len(ids), np.int64))
            out_vs.append(ids)
        out_ids.append(ids)
        out_steps.append(np.full(len(ids), step, np.int64))
        out_vs.append(vs)
        cur_ids, cur_vs = ids, vs
        if not len(cur_ids):
            break
    return ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array(np.concatenate(out_ids) if out_ids else np.empty(0, np.int64)),
                "step": pa.array(np.concatenate(out_steps) if out_steps else np.empty(0, np.int64)),
                "vertex": pa.array(np.concatenate(out_vs) if out_vs else np.empty(0, np.int64)),
            }
        )
    )


def walk_skipgrams(
    walks: ray.data.Dataset, window: int = 2, num_parts: int = 32
) -> ray.data.Dataset:
    """Skip-gram (center, context) pair counts over walk sequences — the
    corpus-preparation step a word2vec/DeepWalk trainer consumes. ONE
    shuffle on hash(walk_id) % P (each walk's steps co-locate), then a
    vectorized shifted-compare kernel emits per-partition PARTIAL counts
    for every offset 1..window in both directions; a tiny final groupby
    folds them."""

    def tag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = t["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "walk_id": w,
                "step": pc.cast(t["step"], pa.int64()),
                "vertex": pc.cast(t["vertex"], pa.int64()),
                "__p": pa.array(part_of(w, num_parts), pa.int32()),
            }
        )

    def kernel(t: pa.Table) -> pa.Table:
        w = t["walk_id"].to_numpy()
        s = t["step"].to_numpy()
        v = t["vertex"].to_numpy()
        order = np.lexsort((s, w))
        w, s, v = w[order], s[order], v[order]
        centers, contexts = [], []
        for d in range(1, window + 1):
            same = (w[d:] == w[:-d]) & (s[d:] == s[:-d] + d)
            a, b = v[:-d][same], v[d:][same]
            centers.append(a)  # forward context
            contexts.append(b)
            centers.append(b)  # backward context
            contexts.append(a)
        if centers:
            c = np.concatenate(centers)
            x = np.concatenate(contexts)
        else:
            c = x = np.empty(0, np.int64)
        key = np.stack([c, x], axis=1)
        uq, cnt = (
            np.unique(key, axis=0, return_counts=True)
            if len(key)
            else (np.empty((0, 2), np.int64), np.empty(0, np.int64))
        )
        return pa.table(
            {
                "center": uq[:, 0],
                "context": uq[:, 1],
                "n": cnt.astype(np.int64),
            }
        )

    return (
        walks.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["center", "context"])
        .sum("n")
        .rename_columns({"sum(n)": "n"})
    )


def warm_start_labels(graph: ShardedGraph, prior: ray.data.Dataset) -> int:
    """Seed component labels for warm-start (incremental) connected
    components: cc_init (label = own id) then stream-route the prior
    (vertex, component) table onto the owning shards. Prior labels are
    subgraph-component minima — valid upper bounds that min-propagation
    tightens on the expanded graph, so the warm fixpoint equals the cold
    one in fewer rounds. Follow with
    ``connected_components(graph, skip_init=True)``."""
    actors = graph.actors
    P = graph.P
    ray.get([a.cc_init.remote() for a in actors])

    def route(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = part_of(v, P)
        refs = []
        for p in range(P):
            m = parts == p
            if m.any():
                refs.append(actors[p].warm_overlay_label.remote(v[m], c[m]))
        hit = sum(ray.get(refs)) if refs else 0
        return pa.table({"hit": pa.array([hit], pa.int64())})

    rows = prior.select_columns(["vertex", "component"]).map_batches(
        route, batch_format="pyarrow"
    ).take_all()
    return int(sum(r["hit"] for r in rows))


def warm_start_ranks(
    graph: ShardedGraph, prior: ray.data.Dataset, default: float
) -> int:
    """Seed a graph's rank state for warm-start (incremental) PageRank:
    every owned vertex starts at `default` (new vertices keep it), then
    the prior (vertex, rank) table is routed to the owning shards in a
    streaming map_batches pass (no driver materialization of the prior).
    Returns the number of overlaid vertices. Follow with
    ``pagerank(graph, ..., skip_init=True)``."""
    actors = graph.actors
    P = graph.P
    ray.get([a.warm_init_rank.remote(default) for a in actors])

    def route(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
        parts = part_of(v, P)
        refs = []
        for p in range(P):
            m = parts == p
            if m.any():
                refs.append(actors[p].warm_overlay_rank.remote(v[m], r[m]))
        hit = sum(ray.get(refs)) if refs else 0
        return pa.table({"hit": pa.array([hit], pa.int64())})

    rows = prior.select_columns(["vertex", "rank"]).map_batches(
        route, batch_format="pyarrow"
    ).take_all()
    return int(sum(r["hit"] for r in rows))


# ---------------------------------------------------------------------------
# Boruvka minimum spanning forest (pure Dataset dataflow)
# ---------------------------------------------------------------------------


def _attach_map(
    keyed: ray.data.Dataset,
    mapping: ray.data.Dataset,
    key_col: str,
    carry_cols: list[str],
    out_col: str,
    num_parts: int,
    map_key: str = "c",
    map_val: str = "nc",
) -> ray.data.Dataset:
    """Total (identity-default) co-partitioned remap: like _attach_value
    but LEFT-join semantics where a key missing from the mapping maps to
    itself. Used to fold a partial relabeling (only changed keys present)
    over a full key column in one shuffle. All columns int64."""

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__k": pa.array(k)}
        for i, c in enumerate(carry_cols):
            cols[f"__c{i}"] = t[c]
        cols["__val"] = pa.array(np.zeros(t.num_rows, np.int64))
        cols["__side"] = pa.array(np.zeros(t.num_rows, np.int8))
        cols["__p"] = pa.array(part_of(k, num_parts), pa.int32())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[map_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"__k": pa.array(k)}
        for i in range(len(carry_cols)):
            cols[f"__c{i}"] = pa.array(np.zeros(t.num_rows, np.int64))
        cols["__val"] = t[map_val]
        cols["__side"] = pa.array(np.ones(t.num_rows, np.int8))
        cols["__p"] = pa.array(part_of(k, num_parts), pa.int32())
        return pa.table(cols)

    left = keyed.map_batches(tag_left, batch_format="pyarrow")
    right = mapping.map_batches(tag_right, batch_format="pyarrow")

    def merge(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False).astype(bool)
        lk = t["__k"].to_numpy(zero_copy_only=False)[~side]
        rk = t["__k"].to_numpy(zero_copy_only=False)[side]
        vals = pc_cast_i64(t["__val"])[side]
        order = np.argsort(rk, kind="stable")
        rk, vals = rk[order], vals[order]
        if len(rk):
            pos = np.clip(np.searchsorted(rk, lk), 0, len(rk) - 1)
            hit = rk[pos] == lk
            out_val = np.where(hit, vals[pos], lk)
        else:
            out_val = lk
        cols = {key_col: pa.array(lk, pa.int64())}
        for i, c in enumerate(carry_cols):
            cols[c] = pa.array(
                t[f"__c{i}"].to_numpy(zero_copy_only=False)[~side], pa.int64()
            )
        cols[out_col] = pa.array(out_val, pa.int64())
        return pa.table(cols)

    return left.union(right).groupby("__p").map_groups(merge, batch_format="pyarrow")


def _driver_boruvka_tail(
    u: np.ndarray,
    v: np.ndarray,
    w: np.ndarray,
    cu: np.ndarray,
    cv: np.ndarray,
    phase0: int,
) -> pa.Table:
    """Finish the remaining Boruvka phases on the driver: the EXACT same
    per-phase schedule as the distributed loop (lexmin cross edge per
    component by (w, u, v), CC over the hook pairs, relabel, drop merged
    edges) replayed in numpy, so the emitted (u, v, w, phase) rows are
    bit-identical to what the Dataset path would produce. Called only
    below `driver_finish_threshold` live rows — the geometric shrink of
    the cross set means at any scale only the cheap tail folds here,
    while the distributed loop remains the all-scale fallback. Output may
    contain the same edge twice within a phase (chosen by both endpoint
    components) exactly like the distributed path; the caller's final
    distinct dedupes."""
    outs: list[tuple[np.ndarray, ...]] = []
    ph = phase0
    # strictly merging components => terminates; bound defensively anyway
    for _ in range(64):
        if not len(u):
            break
        c = np.concatenate([cu, cv])
        oc = np.concatenate([cv, cu])
        sw = np.concatenate([w, w])
        su = np.concatenate([u, u])
        sv = np.concatenate([v, v])
        order = np.lexsort((sv, su, sw, c))
        c, oc, sw, su, sv = c[order], oc[order], sw[order], su[order], sv[order]
        first = np.ones(len(c), bool)
        first[1:] = c[1:] != c[:-1]
        hc, hoc = c[first], oc[first]
        outs.append(
            (su[first], sv[first], sw[first],
             np.full(int(first.sum()), ph, np.int64))
        )
        vs, lab = driver_components(hc, hoc, hc)
        # every live component holds >=1 cross edge, so it appears in the
        # hook table and the lookup is total
        ncu = lab[np.searchsorted(vs, cu)]
        ncv = lab[np.searchsorted(vs, cv)]
        keep = ncu != ncv
        u, v, w = u[keep], v[keep], w[keep]
        cu, cv = ncu[keep], ncv[keep]
        ph += 1
    if not outs:
        return pa.table(
            {col: pa.array([], pa.int64()) for col in ("u", "v", "w", "phase")}
        )
    return pa.table(
        {
            "u": pa.array(np.concatenate([o[0] for o in outs]), pa.int64()),
            "v": pa.array(np.concatenate([o[1] for o in outs]), pa.int64()),
            "w": pa.array(np.concatenate([o[2] for o in outs]), pa.int64()),
            "phase": pa.array(
                np.concatenate([o[3] for o in outs]), pa.int64()
            ),
        }
    )


def boruvka_msf(
    edges: ray.data.Dataset,
    num_parts: int = 32,
    max_phases: int = 32,
    driver_cc_threshold: int = 2_000_000,
    driver_finish_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """Distributed Boruvka minimum spanning forest over canonical int64
    edges (u < v, deduped, columns u/v/w). Weights need not be distinct:
    the total order (w, u, v) breaks ties deterministically, which makes
    the MSF unique and bit-reproducible (classic Boruvka correctness
    holds under any total edge order).

    The working set is the live CROSS-component edge table (u, v, w, cu,
    cv) — intra-component edges never re-activate, so it shrinks
    geometrically and later phases are nearly free; there is no vertex
    label table at all (phase 1's labels are the identity, and the MSF
    output never needs per-vertex components). Per phase, all Dataset
    dataflow — edges never materialize on the driver:
      1. per-component lexmin edge by (w, u, v): symmetric emit +
         batch-local lexmin combiner, then ONE shuffle on hash(comp) %% P
         and a vectorized per-partition lexmin (the hashed-__p fold);
      2. contraction = connected components over the chosen hook pairs
         (component -> other endpoint's component). The hook table has at
         most one row per active component and shrinks geometrically;
         below `driver_cc_threshold` rows it folds on the driver
         (`driver_components`, vectorized pointer jumping), above it the
         pairs build a symmetric ShardedGraph and run the distributed CC
         superstep — the 10^12-scale path for phase 1, where hook count
         approaches the vertex count;
      3. relabel the cross set through the contraction map (two
         identity-default co-partitioned remaps, `_attach_map`) and drop
         edges whose endpoints merged.

    Component count at least halves per phase inside every final
    component, so phases <= ceil(log2(max component size)). The cross set
    is materialized per phase (natural checkpoint boundary). Returns one
    row per MSF edge: (u, v, w, phase) — the same edge may be chosen by
    both endpoints' components within a phase (never across phases), so
    one final distinct dedupes exactly. Raises RuntimeError if
    `max_phases` is reached before the cross-edge set empties.

    Nearest reference analogue: the BFS co-bucket cluster traversal
    (main.cpp:672-721) generalized; Boruvka/MSF itself is public classic
    material."""
    import time as _time

    from ..sources.edges import distinct_int_rows

    P = num_parts
    _dbg = bool(os.environ.get("MSF_TIMING"))

    def seed(t: pa.Table) -> pa.Table:
        # phase-1 labels are the identity: cu = u, cv = v
        return pa.table(
            {"u": t["u"], "v": t["v"], "w": t["w"],
             "cu": t["u"], "cv": t["v"]}
        )

    cur = edges.map_batches(seed, batch_format="pyarrow").materialize()

    def prep(t: pa.Table) -> pa.Table:
        # symmetric (c, oc) emit + batch-local lexmin per c by (w, u, v)
        # as the pre-shuffle combiner
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("c", "oc", "w", "u", "v")}
                | {"__p": pa.array([], pa.int32())}
            )
        cu = t["cu"].to_numpy(zero_copy_only=False)
        cv = t["cv"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        c = np.concatenate([cu, cv])
        oc = np.concatenate([cv, cu])
        sw = np.concatenate([w, w])
        su = np.concatenate([u, u])
        sv = np.concatenate([v, v])
        order = np.lexsort((sv, su, sw, c))
        c, oc, sw, su, sv = c[order], oc[order], sw[order], su[order], sv[order]
        first = np.ones(len(c), bool)
        first[1:] = c[1:] != c[:-1]
        c, oc, sw, su, sv = c[first], oc[first], sw[first], su[first], sv[first]
        return pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "oc": pa.array(oc, pa.int64()),
                "w": pa.array(sw, pa.int64()),
                "u": pa.array(su, pa.int64()),
                "v": pa.array(sv, pa.int64()),
                "__p": pa.array(part_of(c, P), pa.int32()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["c", "oc", "w", "u", "v"])
        c = t["c"].to_numpy(zero_copy_only=False)
        oc = t["oc"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u, w, c))
        c, oc, w, u, v = c[order], oc[order], w[order], u[order], v[order]
        first = np.ones(len(c), bool)
        first[1:] = c[1:] != c[:-1]
        return pa.table(
            {
                "c": pa.array(c[first], pa.int64()),
                "oc": pa.array(oc[first], pa.int64()),
                "w": pa.array(w[first], pa.int64()),
                "u": pa.array(u[first], pa.int64()),
                "v": pa.array(v[first], pa.int64()),
            }
        )

    msf_parts: list[ray.data.Dataset] = []
    for phase in range(1, max_phases + 1):
        _t0 = _time.time()
        n_live = cur.count()
        if n_live == 0:
            break
        if n_live <= driver_finish_threshold:
            # tail phases: the live cross set is small — finish the exact
            # same phase schedule on the driver (bounded materialization,
            # <= driver_finish_threshold rows x 5 int64) instead of paying
            # 3 shuffles + 3 materializations of fixed overhead per tiny
            # phase; the distributed loop above remains the any-scale path
            tp = cur.to_pandas()
            tail = _driver_boruvka_tail(
                tp["u"].to_numpy(np.int64), tp["v"].to_numpy(np.int64),
                tp["w"].to_numpy(np.int64), tp["cu"].to_numpy(np.int64),
                tp["cv"].to_numpy(np.int64), phase,
            )
            if _dbg:
                print(f"[msf] phases {phase}+ driver tail "
                      f"({n_live} live rows) {_time.time()-_t0:.1f}s")
            if tail.num_rows:
                msf_parts.append(ray.data.from_arrow(tail))
            break
        minrows = (
            cur.map_batches(prep, batch_format="pyarrow")
            .groupby("__p")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )
        n_hooks = minrows.count()
        if _dbg:
            print(f"[msf] phase {phase}: fold {_time.time()-_t0:.1f}s "
                  f"hooks={n_hooks}")
        if n_hooks == 0:
            break

        msf_parts.append(
            minrows.select_columns(["u", "v", "w"]).map_batches(
                lambda t, ph=phase: t.append_column(
                    "phase", pa.array(np.full(t.num_rows, ph, np.int64))
                ),
                batch_format="pyarrow",
            )
        )

        if n_hooks <= driver_cc_threshold:
            hooks = minrows.select_columns(["c", "oc"]).to_pandas()
            vs, lab = driver_components(
                hooks["c"].to_numpy(), hooks["oc"].to_numpy(),
                hooks["c"].to_numpy(),
            )
            mapping = ray.data.from_arrow(
                pa.table({"c": pa.array(vs, pa.int64()),
                          "nc": pa.array(lab, pa.int64())})
            ).materialize()
        else:
            def sym(t: pa.Table) -> pa.Table:
                a = t["c"].to_numpy(zero_copy_only=False)
                b = t["oc"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {"src": np.concatenate([a, b]),
                     "dst": np.concatenate([b, a])}
                )

            g = ShardedGraph.build(
                minrows.map_batches(sym, batch_format="pyarrow"),
                num_parts=P, symmetric=True,
            )
            mapping = connected_components(g).map_batches(
                lambda t: pa.table({"c": t["vertex"], "nc": t["component"]}),
                batch_format="pyarrow",
            ).materialize()

        # relabel the cross set through the contraction map and drop
        # merged edges; the remap is identity-default so components
        # untouched this phase flow through
        re_cu = _attach_map(
            cur, mapping, "cu", ["u", "v", "w", "cv"], "ncu", P
        )
        re_cv = _attach_map(
            re_cu, mapping, "cv", ["u", "v", "w", "ncu"], "ncv", P
        )

        def live(t: pa.Table) -> pa.Table:
            a = t["ncu"].to_numpy(zero_copy_only=False)
            b = t["ncv"].to_numpy(zero_copy_only=False)
            keep = a != b
            return pa.table(
                {
                    "u": pa.array(
                        t["u"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                    ),
                    "v": pa.array(
                        t["v"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                    ),
                    "w": pa.array(
                        t["w"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                    ),
                    "cu": pa.array(a[keep], pa.int64()),
                    "cv": pa.array(b[keep], pa.int64()),
                }
            )

        cur = re_cv.map_batches(live, batch_format="pyarrow").materialize()
        if _dbg:
            print(f"[msf] phase {phase}: total {_time.time()-_t0:.1f}s "
                  f"live={cur.count()}")
        if cur.count() == 0:
            break
    else:
        raise RuntimeError(
            f"boruvka_msf did not converge within {max_phases} phases"
        )

    if not msf_parts:
        return ray.data.from_arrow(
            pa.table({c: pa.array([], pa.int64())
                      for c in ("u", "v", "w", "phase")})
        )
    out = msf_parts[0]
    for p in msf_parts[1:]:
        out = out.union(p)
    return distinct_int_rows(out, ["u", "v", "w", "phase"], P)


def temporal_reachability(
    edges: ray.data.Dataset,
    seeds,
    num_partitions: int = 32,
    max_rounds: int = 32,
    start_t: int = 0,
    broadcast_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """Earliest-arrival reachability over a TEMPORAL edge table
    (src, dst, t): a path is time-respecting iff each edge departs no
    earlier than the arrival at its source, and arrival(v) is the minimum
    over such paths of the last edge's timestamp (Wu et al., "Path
    problems in temporal graphs", VLDB'14). Static reachability is the
    special case t = const; with real timestamps a static BFS OVERcounts
    (it happily walks backward in time), so this is a genuinely different
    operator from bfs_distance.

    Delta-iterated dataflow — pure Dataset ops, documented shuffles:
    each round, last round's improved arrivals (the frontier) meet the
    edge table on src — broadcast (`ray.put` of two sorted arrays +
    per-batch searchsorted, NO edge shuffle) while the frontier is below
    `broadcast_threshold` rows, else the co-partitioned `_attach_value`
    hash join (one shuffle of the edge table; the honest V-scale path) —
    then edges with t >= arrival(src) emit candidate (dst, t) rows that
    merge into the arrival table in ONE hashed-vertex shuffle (the min
    fold and the old/new compare share the same partition key, so they
    share the shuffle); rows that improved become the next frontier.
    Arrival times only decrease and every improvement is witnessed by a
    strictly shorter time-respecting prefix, so the loop reaches the
    exact fixpoint in at most (longest time-respecting path) rounds;
    per-round state is materialized (V-scale, never per-path).

    Duplicate (src, dst, t) rows are harmless (min-fold), so the caller
    need not pre-distinct the edge table. Seeds enter with arrival
    `start_t` iff they appear as a source in the edge table (mirroring
    the SQL `WHERE s IN (SELECT src FROM te)` guard). Returns
    (vertex, t_arr) int64 for every reached vertex."""
    import pyarrow.compute as pc

    P = num_partitions

    srcs = edges.map_batches(
        lambda t: pa.table({"vertex": pc.unique(t["src"])}),
        batch_format="pyarrow",
    )
    present = np.unique(
        np.concatenate(
            [b["vertex"].to_numpy() for b in srcs.iter_batches(batch_format="pyarrow")]
            or [np.array([], np.int64)]
        )
    )
    seeds = np.unique(np.asarray(seeds, np.int64))
    seeds = seeds[np.isin(seeds, present)]

    # --- small-state regime: while the arrival table AND frontier are
    # below broadcast_threshold, each round is ONE broadcast edge scan
    # whose per-batch output is already min-folded per dst, merged into
    # driver-side sorted arrays — no shuffle, no per-round Dataset
    # materialization. Arrival state is O(reached vertices); if it
    # outgrows the threshold the loop below takes over with the exact
    # same min-fold semantics (min over ints is order-free, so the two
    # regimes are bit-identical).
    arr_v = seeds.copy()  # sorted (np.unique)
    arr_t = np.full(len(seeds), start_t, np.int64)
    fv, ft = arr_v, arr_t
    rounds_used = 0
    while (
        rounds_used < max_rounds
        and 0 < len(fv) <= broadcast_threshold
        and len(arr_v) <= broadcast_threshold
    ):
        o = np.argsort(fv, kind="stable")
        f_ref = ray.put((fv[o], ft[o]))

        def cand_partial(t: pa.Table) -> pa.Table:
            from ..functions.proccache import cached_get

            fv_s, ftv_s = cached_get(f_ref)
            s = t["src"].to_numpy()
            pos = np.clip(np.searchsorted(fv_s, s), 0, len(fv_s) - 1)
            hit = fv_s[pos] == s
            tt = t["t"].to_numpy()[hit]
            keep = tt >= ftv_s[pos[hit]]
            d = t["dst"].to_numpy()[hit][keep]
            tt = tt[keep]
            oo = np.lexsort((tt, d))
            d, tt = d[oo], tt[oo]
            first = np.ones(len(d), bool)
            first[1:] = d[1:] != d[:-1]
            return pa.table(
                {
                    "dst": pa.array(d[first], pa.int64()),
                    "t": pa.array(tt[first], pa.int64()),
                }
            )

        chunks = [
            b
            for b in edges.map_batches(
                cand_partial, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        rounds_used += 1
        if not chunks:
            fv = np.array([], np.int64)
            break
        dv = np.concatenate([c["dst"].to_numpy() for c in chunks])
        dt = np.concatenate([c["t"].to_numpy() for c in chunks])
        oo = np.lexsort((dt, dv))
        dv, dt = dv[oo], dt[oo]
        first = np.ones(len(dv), bool)
        first[1:] = dv[1:] != dv[:-1]
        dv, dt = dv[first], dt[first]
        pos = np.clip(np.searchsorted(arr_v, dv), 0, max(len(arr_v) - 1, 0))
        known = len(arr_v) > 0
        hit = (arr_v[pos] == dv) if known else np.zeros(len(dv), bool)
        better = hit & (dt < (arr_t[pos] if known else dt))
        new = ~hit
        # in-place improvements + sorted insert of new vertices
        arr_t[pos[better]] = dt[better]
        if new.any():
            ins = np.searchsorted(arr_v, dv[new])
            arr_v = np.insert(arr_v, ins, dv[new])
            arr_t = np.insert(arr_t, ins, dt[new])
        fv = np.concatenate([dv[better], dv[new]])
        ft = np.concatenate([dt[better], dt[new]])
    if len(fv) == 0 or rounds_used >= max_rounds:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vertex": pa.array(arr_v, pa.int64()),
                    "t_arr": pa.array(arr_t, pa.int64()),
                }
            )
        )

    # --- state outgrew the broadcast threshold: hand off to the
    # shuffle-merge loop (the any-scale path) with the rounds budget left
    max_rounds = max_rounds - rounds_used
    arr = ray.data.from_arrow(
        pa.table(
            {
                "vertex": pa.array(arr_v, pa.int64()),
                "t_arr": pa.array(arr_t, pa.int64()),
            }
        )
    ).materialize()
    frontier = ray.data.from_arrow(
        pa.table(
            {
                "vertex": pa.array(fv, pa.int64()),
                "t_arr": pa.array(ft, pa.int64()),
            }
        )
    ).materialize()

    def usable(t: pa.Table) -> pa.Table:
        # candidate rows ride straight into the merge shuffle, side-tagged
        tt = t["t"].to_numpy()
        keep = tt >= t["src_arr"].to_numpy()
        d = t["dst"].to_numpy()[keep]
        return pa.table(
            {
                "vertex": pa.array(d, pa.int64()),
                "t_val": pa.array(tt[keep], pa.int64()),
                "__side": pa.array(np.ones(len(d), np.int8)),
                "__p": pa.array(part_of(d, P), pa.int32()),
            }
        )

    n_frontier = frontier.count()
    for _ in range(max_rounds):
        if n_frontier <= broadcast_threshold:
            ft = frontier.to_pandas()
            fv = ft["vertex"].to_numpy(np.int64)
            o = np.argsort(fv, kind="stable")
            f_ref = ray.put((fv[o], ft["t_arr"].to_numpy(np.int64)[o]))

            def bcast_attach(t: pa.Table) -> pa.Table:
                from ..functions.proccache import cached_get

                fv_s, ftv_s = cached_get(f_ref)
                s = t["src"].to_numpy()
                if len(fv_s):
                    pos = np.clip(np.searchsorted(fv_s, s), 0, len(fv_s) - 1)
                    hit = fv_s[pos] == s
                else:
                    pos = np.zeros(len(s), np.int64)
                    hit = np.zeros(len(s), bool)
                    ftv_s = np.zeros(1, np.int64)
                return pa.table(
                    {
                        "dst": t["dst"].filter(pa.array(hit)),
                        "t": t["t"].filter(pa.array(hit)),
                        "src_arr": pa.array(ftv_s[pos][hit], pa.int64()),
                    }
                )

            att = edges.map_batches(bcast_attach, batch_format="pyarrow")
        else:
            att = _attach_value(
                edges, frontier, "src", ["dst", "t"], "t_arr", "src_arr", P
            )
        cand = att.map_batches(usable, batch_format="pyarrow")

        def tag_arr(t: pa.Table) -> pa.Table:
            v = t["vertex"].to_numpy()
            return pa.table(
                {
                    "vertex": t["vertex"],
                    "t_val": t["t_arr"],
                    "__side": pa.array(np.zeros(t.num_rows, np.int8)),
                    "__p": pa.array(part_of(v, P), pa.int32()),
                }
            )

        def merge(t: pa.Table) -> pa.Table:
            v = t["vertex"].to_numpy()
            tv = t["t_val"].to_numpy()
            side = t["__side"].to_numpy(zero_copy_only=False)
            # min per vertex; improved = min strictly below the old value
            # (or a vertex with no old value at all)
            order = np.lexsort((tv, side, v))
            v, tv, side = v[order], tv[order], side[order]
            first = np.concatenate([[True], v[1:] != v[:-1]])
            starts = np.flatnonzero(first)
            best = np.minimum.reduceat(tv, starts)
            had_old = side[starts] == 0  # sorted so an old row leads its run
            old = tv[starts]
            imp = (~had_old) | (best < old)
            return pa.table(
                {
                    "vertex": pa.array(v[starts], pa.int64()),
                    "t_arr": pa.array(best, pa.int64()),
                    "imp": pa.array(imp.astype(np.int8)),
                }
            )

        merged = (
            arr.map_batches(tag_arr, batch_format="pyarrow")
            .union(cand)
            .groupby("__p")
            .map_groups(merge, batch_format="pyarrow")
        ).materialize()
        frontier = merged.map_batches(
            lambda t: t.filter(
                pc.equal(t["imp"], 1)
            ).select(["vertex", "t_arr"]),
            batch_format="pyarrow",
        ).materialize()
        arr = merged.select_columns(["vertex", "t_arr"]).materialize()
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
    return arr


def link_negative_samples(
    edges: ray.data.Dataset,
    k: int = 2,
    num_partitions: int = 32,
    c1: int = 0x9E3779B97F4A7C15,
    c2: int = 0xC2B2AE3D27D4EB4F,
    c3: int = 0xFF51AFD7ED558CCD,
    broadcast_keys_threshold: int = 50_000_000,
) -> ray.data.Dataset:
    """Deterministic negative sampling for link-prediction training data:
    every DISTINCT edge (src, dst) becomes a label-1 row, and for each
    edge k seeded-hash candidates (src, w_j) are drawn from the distinct
    destination universe — w_j = dsts[((src*c1 + dst*c2 + j*c3) mod 2^64)
    mod |dsts|] — then candidates that are REAL edges are dropped by an
    exact anti-join, leaving label-0 rows. All-integer uint64-wraparound
    arithmetic, so a SQL mirror recomputes every candidate in HUGEINT and
    the output (src, dst, label) matches bit-for-bit. The standard
    skip-gram/link-prediction noise generator, made reproducible: no RNG
    state, any shard can regenerate its candidates from (src, dst, j).

    Scale shape: the sorted destination universe is broadcast once via
    `ray.put` (id list, not per-edge state; a 10^12-edge corpus whose
    distinct-dst set exceeds worker memory needs a rank-keyed
    co-partitioned join instead — raise-documented below). Candidate
    generation is a stateless vectorized map; membership filtering
    broadcasts the sorted packed (src << 32 | dst) key set and fuses the
    anti-join into the generation pass (zero shuffles) while it fits the
    same 50M cap, else falls back to ONE shuffle of packed keys with a
    per-partition searchsorted. Input edges must be distinct (positives
    are emitted as-is)."""
    import pyarrow.compute as pc

    P = num_partitions
    C1, C2, C3 = np.uint64(c1), np.uint64(c2), np.uint64(c3)

    def pack(s: np.ndarray, d: np.ndarray) -> np.ndarray:
        if len(s) and (
            int(s.max()) >= (1 << 31)
            or int(d.max()) >= (1 << 31)
            or int(s.min()) < 0
            or int(d.min()) < 0
        ):
            raise ValueError("vertex ids must fit in 31 bits for key packing")
        return (s << np.int64(32)) | d

    # one driver pull of the packed edge keys serves BOTH the distinct-dst
    # universe (dst = key & 0xFFFFFFFF) and, when it fits, the broadcast
    # membership side of the anti-join
    key_parts = edges.map_batches(
        lambda t: pa.table(
            {
                "k": pa.array(
                    pack(
                        pc.cast(t["src"], pa.int64()).to_numpy(
                            zero_copy_only=False
                        ),
                        pc.cast(t["dst"], pa.int64()).to_numpy(
                            zero_copy_only=False
                        ),
                    ),
                    pa.int64(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    real_keys = np.sort(
        np.concatenate(
            [
                b["k"].to_numpy()
                for b in key_parts.iter_batches(batch_format="pyarrow")
            ]
            or [np.array([], np.int64)]
        )
    )
    dsts = np.unique(real_keys & np.int64(0xFFFFFFFF))
    if len(dsts) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    if len(dsts) > 50_000_000:
        raise ValueError(
            "distinct-dst universe too large to broadcast; attach sampled "
            "ranks with a rank-keyed co-partitioned join instead"
        )
    n_dst = np.uint64(len(dsts))
    dst_ref = ray.put(dsts)

    def gen(t: pa.Table) -> pa.Table:
        from ..functions.proccache import cached_get

        universe = cached_get(dst_ref)
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        su = s.astype(np.int64).view(np.uint64)
        du = d.astype(np.int64).view(np.uint64)
        outs, outd = [], []
        with np.errstate(over="ignore"):
            for j in range(1, k + 1):
                idx = ((su * C1 + du * C2 + np.uint64(j) * C3) % n_dst).astype(
                    np.int64
                )
                outs.append(s)
                outd.append(universe[idx])
        cs = np.concatenate(outs) if outs else np.array([], np.int64)
        cd = np.concatenate(outd) if outd else np.array([], np.int64)
        key = pack(cs, cd)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "__side": pa.array(np.zeros(len(key), np.int8)),
                "__p": pa.array(part_of(key, P), pa.int32()),
            }
        )

    def tag_real(t: pa.Table) -> pa.Table:
        key = pack(t["src"].to_numpy(), t["dst"].to_numpy())
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "__side": pa.array(np.ones(len(key), np.int8)),
                "__p": pa.array(part_of(key, P), pa.int32()),
            }
        )

    def keep_nonmembers(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        side = t["__side"].to_numpy(zero_copy_only=False).astype(bool)
        cand = key[~side]
        real = np.sort(key[side])
        if len(real):
            pos = np.clip(np.searchsorted(real, cand), 0, len(real) - 1)
            cand = cand[real[pos] != cand]
        return pa.table(
            {
                "src": pa.array(cand >> np.int64(32), pa.int64()),
                "dst": pa.array(cand & np.int64(0xFFFFFFFF), pa.int64()),
                "label": pa.array(np.zeros(len(cand), np.int64)),
            }
        )

    if len(real_keys) <= broadcast_keys_threshold:
        # the sorted packed edge-key set fits in plasma (same cap as the
        # dst universe): broadcast it and fuse candidate generation with
        # the anti-join in ONE stateless edge pass — zero shuffles; the
        # union + hashed-key shuffle below is the any-scale path
        real_ref = ray.put(real_keys)

        def gen_neg(t: pa.Table) -> pa.Table:
            from ..functions.proccache import cached_get

            universe = cached_get(dst_ref)
            real = cached_get(real_ref)
            s = t["src"].to_numpy()
            d = t["dst"].to_numpy()
            su = s.astype(np.int64).view(np.uint64)
            du = d.astype(np.int64).view(np.uint64)
            outs, outd = [], []
            with np.errstate(over="ignore"):
                for j in range(1, k + 1):
                    idx = (
                        (su * C1 + du * C2 + np.uint64(j) * C3) % n_dst
                    ).astype(np.int64)
                    outs.append(s)
                    outd.append(universe[idx])
            cs = np.concatenate(outs) if outs else np.array([], np.int64)
            cd = np.concatenate(outd) if outd else np.array([], np.int64)
            key = pack(cs, cd)
            if len(real):
                pos = np.clip(np.searchsorted(real, key), 0, len(real) - 1)
                nonmember = real[pos] != key
                cs, cd = cs[nonmember], cd[nonmember]
            return pa.table(
                {
                    "src": pa.array(cs, pa.int64()),
                    "dst": pa.array(cd, pa.int64()),
                    "label": pa.array(np.zeros(len(cs), np.int64)),
                }
            )

        neg = edges.map_batches(gen_neg, batch_format="pyarrow")
    else:
        neg = (
            edges.map_batches(gen, batch_format="pyarrow")
            .union(edges.map_batches(tag_real, batch_format="pyarrow"))
            .groupby("__p")
            .map_groups(keep_nonmembers, batch_format="pyarrow")
        )
    pos = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
                "label": pa.array(np.ones(t.num_rows, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    return pos.union(neg)


def linkpred_holdout_auc(
    edges: ray.data.Dataset,
    test_pct: int = 10,
    num_partitions: int = 32,
    c1: int = 0x9E3779B97F4A7C15,
    c2: int = 0xC2B2AE3D27D4EB4F,
    c3: int = 0xFF51AFD7ED558CCD,
    broadcast_threshold: int = 50_000_000,
) -> "pa.Table":
    """End-to-end link-prediction evaluation: hold out `test_pct`%% of the
    DISTINCT canonical edges by a deterministic pair hash, score every
    held-out (positive) pair and one seeded-hash negative per positive by
    the Adamic-Adar index computed over the TRAIN graph only (exact
    integer billionths, floor(1e9/ln(deg)) per common neighbor), then
    report the exact tie-corrected Mann-Whitney AUC — the leakage-free
    offline metric a link-graph team reads before shipping a
    recommend-links model. One row (n_pos, n_neg, u2, auc).

    Composition of the repo's own exact primitives: the hash split is the
    pagerank_drift thinning hash, negatives are link_negative_samples'
    seeded scheme (canonicalized, real edges excluded), scores are
    adamic_adar's integer weights, the AUC fold is dup_auc's midrank
    algebra — all integer until the one mirrored ROUND(6) divide.

    Scale shape: canon dedup is the standard one-shuffle distinct; the
    canonical key set (<= broadcast_threshold, raise-documented), per-
    vertex train degrees and the query-pair CSR broadcast once via
    ray.put; scoring is ONE stateless pass over the canonical edge table
    — each train sym edge (w, x) expands only x's query partners (most
    batches expand nothing) and membership-checks (w, b) against the
    broadcast key set, so no wedge is ever enumerated outside the query
    set and nothing E-scale shuffles after the distinct."""
    import pyarrow.compute as pc

    from ..functions.proccache import cached_get
    from ..functions.rounding import round_half_away

    P = num_partitions
    C1, C2, C3 = np.uint64(c1), np.uint64(c2), np.uint64(c3)

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    cn = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()

    def pack(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        if len(x) and (
            int(x.max()) >= (1 << 31)
            or int(y.max()) >= (1 << 31)
            or int(x.min()) < 0
            or int(y.min()) < 0
        ):
            raise ValueError("vertex ids must fit in 31 bits for key packing")
        return (x << np.int64(32)) | y

    chunks = [
        b
        for b in cn.map_batches(
            lambda t: pa.table(
                {"k": pa.array(pack(t["a"].to_numpy(), t["b"].to_numpy()))}
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    keys = np.sort(
        np.concatenate([c["k"].to_numpy() for c in chunks])
        if chunks
        else np.array([], np.int64)
    )
    if len(keys) > broadcast_threshold:
        raise ValueError(
            "canonical edge-key set too large to broadcast; co-partition "
            "the query pairs and membership keys by hash(pair) instead"
        )
    ka = keys >> np.int64(32)
    kb = keys & np.int64(0xFFFFFFFF)
    is_test = (ka * 2654435761 + kb * 40503) % 100 < test_pct
    ta, tb = ka[is_test], kb[is_test]
    train_keys = keys[~is_test]

    # train degrees + adamic-adar center weights (deg < 2 can never be a
    # common neighbor; weight 0 keeps the ln() domain safe)
    verts, deg = np.unique(
        np.concatenate([train_keys >> np.int64(32),
                        train_keys & np.int64(0xFFFFFFFF)]),
        return_counts=True,
    )
    wt = np.zeros(len(verts), np.int64)
    big = deg >= 2
    wt[big] = np.floor(1e9 / np.log(deg[big])).astype(np.int64)

    # one seeded-hash negative per test pair, canonicalized, real edges
    # (train OR test) excluded — duplicates kept (separate samples), the
    # SQL mirror recomputes them row-for-row
    uni = np.unique(np.concatenate([ka, kb]))
    if len(uni):
        with np.errstate(over="ignore"):
            idx = (
                (
                    ta.view(np.uint64) * C1
                    + tb.view(np.uint64) * C2
                    + C3
                )
                % np.uint64(len(uni))
            ).astype(np.int64)
        w_ = uni[idx]
        na = np.minimum(ta, w_)
        nb = np.maximum(ta, w_)
        ok = na != nb
        if len(keys):
            kq = pack(na[ok], nb[ok])
            pos_ = np.clip(np.searchsorted(keys, kq), 0, len(keys) - 1)
            ok2 = keys[pos_] != kq
            na, nb = na[ok][ok2], nb[ok][ok2]
        else:
            na, nb = na[ok], nb[ok]
    else:
        na = nb = np.array([], np.int64)

    n_pos, n_neg = len(ta), len(na)
    if n_pos == 0 or n_neg == 0:
        return pa.table(
            {
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "u2": pa.array([0], pa.int64()),
                "auc": pa.array([0.0], pa.float64()),
            }
        )

    # query CSR grouped by the LOWER-TRAIN-DEGREE endpoint (ties: the
    # smaller id): each wedge is still found via exactly one sym edge
    # (w, indexed endpoint) — detection is endpoint-symmetric — but the
    # expansion volume drops from sum(deg(a)) to sum(min(deg(a), deg(b)))
    # across query pairs, which is what hub endpoints would otherwise blow
    qa = np.concatenate([ta, na])
    qb = np.concatenate([tb, nb])

    def _deg_of(v: np.ndarray) -> np.ndarray:
        if not len(verts):
            return np.zeros(len(v), np.int64)
        p_ = np.clip(np.searchsorted(verts, v), 0, len(verts) - 1)
        return np.where(verts[p_] == v, deg[p_], 0)

    swap = _deg_of(qb) < _deg_of(qa)
    qa, qb = np.where(swap, qb, qa), np.where(swap, qa, qb)
    order = np.argsort(qa, kind="stable")
    qa_s, qb_s = qa[order], qb[order]
    qid_s = np.arange(len(qa), dtype=np.int64)[order]
    qv, qcnt = np.unique(qa_s, return_counts=True)
    qoff = np.cumsum(qcnt) - qcnt
    bref = ray.put((train_keys, verts, wt, qv, qcnt, qoff, qb_s, qid_s))

    def score_partial(t: pa.Table) -> pa.Table:
        tk, vs, wts, qvv, qcc, qoo, qbb, qii = cached_get(bref)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        tr = (a * 2654435761 + b * 40503) % 100 >= test_pct
        a, b = a[tr], b[tr]
        w = np.concatenate([a, b])  # sym: both orientations, w = center
        x = np.concatenate([b, a])
        xi = np.clip(np.searchsorted(qvv, x), 0, max(len(qvv) - 1, 0))
        sel = (len(qvv) > 0) & (qvv[xi] == x) if len(qvv) else np.zeros(
            len(x), bool
        )
        w, xi = w[sel], xi[sel]
        cnt = qcc[xi]
        tot = int(cnt.sum())
        if tot == 0:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        starts = np.cumsum(cnt) - cnt
        ridx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(starts, cnt)
            + np.repeat(qoo[xi], cnt)
        )
        rw = np.repeat(w, cnt)
        rb = qbb[ridx]
        rq = qii[ridx]
        wi = np.clip(np.searchsorted(vs, rw), 0, max(len(vs) - 1, 0))
        wv = np.where(vs[wi] == rw, wts[wi], 0) if len(vs) else np.zeros(
            len(rw), np.int64
        )
        lo = np.minimum(rw, rb)
        hi = np.maximum(rw, rb)
        live = (rw != rb) & (wv > 0)
        kq = pack(lo[live], hi[live])
        if len(tk):
            pp = np.clip(np.searchsorted(tk, kq), 0, len(tk) - 1)
            hit = tk[pp] == kq
        else:
            hit = np.zeros(len(kq), bool)
        rq, wv = rq[live][hit], wv[live][hit]
        if not len(rq):
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        u_, inv = np.unique(rq, return_inverse=True)
        sums = np.bincount(inv, weights=wv, minlength=len(u_)).astype(
            np.int64
        )
        return pa.table({"qid": pa.array(u_), "s": pa.array(sums)})

    parts = [
        b
        for b in cn.map_batches(
            score_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    scores = np.zeros(len(qa), np.int64)
    if parts:
        pq = np.concatenate([p["qid"].to_numpy() for p in parts])
        ps = np.concatenate([p["s"].to_numpy() for p in parts])
        np.add.at(scores, pq, ps)

    # exact midrank AUC (dup_auc algebra): 2*midrank = 2*cum_prev+cnt+1
    labels = np.concatenate(
        [np.ones(n_pos, np.int64), np.zeros(n_neg, np.int64)]
    )
    g_scores, inv = np.unique(scores, return_inverse=True)
    np_ = np.bincount(inv, weights=labels, minlength=len(g_scores)).astype(
        np.int64
    )
    nn_ = np.bincount(inv, minlength=len(g_scores)).astype(np.int64) - np_
    cnt_g = np_ + nn_
    cum_prev = np.concatenate([[0], np.cumsum(cnt_g)[:-1]])
    two_mid = 2 * cum_prev + cnt_g + 1
    two_rs = int((np_ * two_mid).sum())
    u2 = two_rs - n_pos * (n_pos + 1)
    auc = float(
        round_half_away(
            np.array([u2 / (2.0 * n_pos * n_neg)]), 6
        )[0]
    )
    return pa.table(
        {
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "u2": pa.array([int(u2)], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        }
    )


def salsa_scores(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    hub_threshold: int = 20_000_000,
    digits: int = 9,
) -> ray.data.Dataset:
    """SALSA hub/authority scores (Lempel-Moran, public) over a bipartite
    link graph (src ids >= hub_threshold are hubs, dst ids below are
    authorities — callers pass disjoint id ranges). Uses the paper's
    closed-form stationary distribution instead of iterating the random
    walk: within each connected component C of the bipartite support,
    authority(i) = (|A_C| / |A|) * (d(i) / E_C) and symmetrically for
    hubs, where E_C is the component's edge count (= the component sum of
    either side's degrees). One row per vertex:
    (vertex, side, deg, score).

    Scale shape: NO co-citation projection is ever materialized (the
    naive SALSA builds it; it is quadratic in hub fan-out). distinct
    edges -> superstep min-label CC -> per-vertex degree fold (hashed
    partials) -> component label attach + two component-sum attaches, all
    through the co-partitioned `_attach_value` join — V-scale state never
    broadcasts and never lands on the driver; the only driver scalars are
    the two side totals. Scores divide as (n_side/total) * (deg/E_C) in
    that exact operation order, mirrored by the SQL oracle, so the
    doubles are bit-identical."""
    import pyarrow.compute as pc

    from ..functions.rounding import round_half_away

    P = num_partitions

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        )

    de = distinct(
        edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()  # consumed by the CC build and the degree fold
    g = ShardedGraph.build(de, num_parts=P, symmetric=True)
    cc = connected_components(g)

    def deg_partials(t: pa.Table) -> pa.Table:
        both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
        u, c = np.unique(both, return_counts=True)
        return pa.table(
            {
                "vertex": u,
                "deg": c.astype(np.int64),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def deg_fold(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy()
        c = t["deg"].to_numpy()
        u, inv = np.unique(v, return_inverse=True)
        s = np.bincount(inv, weights=c, minlength=len(u)).astype(np.int64)
        return pa.table({"vertex": u, "deg": s})

    degs = (
        de.map_batches(deg_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(deg_fold, batch_format="pyarrow")
    )
    w = _attach_value_auto(degs, cc.materialize(), "vertex", ["deg"], "component", "comp", P)

    # component aggregates (hub count, authority count, edge count): the
    # edge count is the authority-side degree sum — exact per component
    def comp_partials(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy()
        dg = t["deg"].to_numpy()
        cp = t["comp"].to_numpy()
        hub = v >= hub_threshold
        u, inv = np.unique(cp, return_inverse=True)
        nh = np.bincount(inv, weights=hub, minlength=len(u)).astype(np.int64)
        na = np.bincount(inv, weights=~hub, minlength=len(u)).astype(np.int64)
        ec = np.bincount(
            inv, weights=np.where(hub, 0, dg), minlength=len(u)
        ).astype(np.int64)
        return pa.table(
            {
                "comp": u,
                "nh": nh,
                "na": na,
                "ec": ec,
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def comp_fold(t: pa.Table) -> pa.Table:
        cp = t["comp"].to_numpy()
        u, inv = np.unique(cp, return_inverse=True)
        out = {"comp": u}
        for c in ("nh", "na", "ec"):
            out[c] = np.bincount(
                inv, weights=t[c].to_numpy(), minlength=len(u)
            ).astype(np.int64)
        # pack the two side counts into one attach value (both < 2^31)
        out["nhna"] = (out["nh"] << np.int64(32)) | out["na"]
        return pa.table(out)

    sums = (
        w.map_batches(comp_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(comp_fold, batch_format="pyarrow")
        .materialize()  # consumed by two attaches and the totals fold
    )

    n_hubs = 0
    n_auth = 0
    for b in sums.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            n_hubs += int(b["nh"].to_numpy().sum())
            n_auth += int(b["na"].to_numpy().sum())

    w2 = _attach_value_auto(
        w, sums, "comp", ["vertex", "deg"], "nhna", "nhna", P, lookup_key="comp"
    )
    w3 = _attach_value_auto(
        w2, sums, "comp", ["vertex", "deg", "nhna"], "ec", "ec", P,
        lookup_key="comp",
    )

    def score(t: pa.Table) -> pa.Table:
        v = t["vertex"].to_numpy()
        dg = t["deg"].to_numpy().astype(np.float64)
        nhna = t["nhna"].to_numpy()
        ec = t["ec"].to_numpy().astype(np.float64)
        hub = v >= hub_threshold
        n_side = np.where(
            hub, nhna >> np.int64(32), nhna & np.int64(0xFFFFFFFF)
        ).astype(np.float64)
        tot = np.where(hub, float(n_hubs), float(n_auth))
        sc = round_half_away((n_side / tot) * (dg / ec), digits)
        return pa.table(
            {
                "vertex": pa.array(v),
                "side": pa.array(np.where(hub, "hub", "auth")),
                "deg": t["deg"],
                "score": pa.array(sc, pa.float64()),
            }
        )

    return w3.map_batches(score, batch_format="pyarrow")


def spam_mass(
    graph: "ShardedGraph",
    trusted_seeds: np.ndarray,
    damping: float = 0.85,
    max_iters: int = 10,
) -> ray.data.Dataset:
    """TrustRank spam mass (Gyongyi/Garcia-Molina/Pedersen, public): run
    classic PageRank and seed-personalized PageRank (TrustRank) over the
    SAME sharded graph, then per vertex report spam_mass =
    (pagerank - trustrank) / pagerank — the fraction of a page's rank
    that does NOT flow from the trusted seed set. Both ranks round to 7
    digits BEFORE the division (the identical doubles both engines
    produce), the mass to 6 after, so the mirror stays bit-exact.

    Scale shape: two superstep power iterations reuse one actor pool and
    CSR build; each run's per-partition rank table snapshots as an
    immutable object-store ref (actor task ordering guarantees the
    snapshot precedes the second run's re-init), and the zip/divide runs
    as one remote task per partition — no shuffle, no driver-side V-scale
    state, vertex order aligned by construction (both tables are the
    partition's sorted owned array)."""
    from ..functions.rounding import round_half_away

    pagerank(graph, damping=damping, max_iters=max_iters, tol=0.0)
    base_refs = [a.state_table.remote("rank") for a in graph.actors]
    pagerank(
        graph,
        damping=damping,
        max_iters=max_iters,
        tol=0.0,
        teleport_seeds=np.asarray(trusted_seeds, np.int64),
    )
    trust_refs = [a.state_table.remote("rank") for a in graph.actors]

    @ray.remote
    def zip_mass(pt: pa.Table, tt: pa.Table) -> pa.Table:
        if not np.array_equal(
            pt["vertex"].to_numpy(), tt["vertex"].to_numpy()
        ):
            raise AssertionError(
                "spam_mass: partition vertex sets diverged between runs"
            )
        pr = round_half_away(pt["rank"].to_numpy(), 7)
        tr = round_half_away(tt["rank"].to_numpy(), 7)
        pos = pr > 0
        mass = np.where(
            pos,
            round_half_away((pr - tr) / np.where(pos, pr, 1.0), 6),
            0.0,
        )
        return pa.table(
            {
                "vertex": pt["vertex"],
                "pagerank": pr,
                "trustrank": tr,
                "spam_mass": mass,
            }
        )

    return ray.data.from_arrow_refs(
        [zip_mass.remote(p_, t_) for p_, t_ in zip(base_refs, trust_refs)]
    )


BOWTIE_CLASSES = ("core", "in", "out", "tubes", "tendrils", "disconnected")


def bowtie_decomposition(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    max_rounds: int = 64,
    collect_threshold: int = 50_000_000,
) -> "pa.Table":
    """Bow-tie decomposition of a directed link graph (the Broder et al.
    web-structure taxonomy, public): CORE = the largest SCC (ties: the
    smallest canonical scc_id), IN = components that reach the core, OUT
    = components the core reaches, TUBES = remaining components on an
    IN->OUT path that avoids the core, TENDRILS = the rest of the core's
    weak component, DISCONNECTED = everything else. Always returns six
    rows (class, n_components, n_vertices), zero-filled.

    Scale shape: SCC labels come from the distributed forward-backward
    superstep; labels attach to both edge endpoints through the
    co-partitioned `_attach_value` join (V-scale, never broadcast) and
    condensation edges dedup through the house distinct. Only
    COMPONENT-scale state reaches the driver — the (scc_id, size) table
    (pre-aggregated per hash partition) and the deduped condensation
    edges — both bounded by `collect_threshold` (raises with guidance
    instead of silently materializing); the five reachability sweeps run
    as vectorized frontier BFS over those component arrays, so no pass
    ever touches V- or E-scale data on the driver."""
    import pyarrow.compute as pc

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["src"], pa.int64()),
                "dst": pc.cast(t["dst"], pa.int64()),
            }
        )

    de = distinct(
        edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"]
    ).materialize()  # consumed by the SCC build and the label attach
    scc = strongly_connected_components(
        de, num_partitions=num_partitions, max_rounds=max_rounds
    ).materialize()

    # per-component sizes: partial unique per batch, exact fold per hash
    # partition (all rows of one scc_id share a partition), then the
    # C-scale result concatenates on the driver
    def size_partials(t: pa.Table) -> pa.Table:
        lbl = t["scc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lbl, return_counts=True)
        return pa.table(
            {
                "scc_id": u,
                "n": c.astype(np.int64),
                "__p": pa.array(part_of(u, num_partitions), pa.int32()),
            }
        )

    def size_fold(t: pa.Table) -> pa.Table:
        lbl = t["scc_id"].to_numpy()
        n = t["n"].to_numpy()
        u, inv = np.unique(lbl, return_inverse=True)
        s = np.bincount(inv, weights=n, minlength=len(u)).astype(np.int64)
        return pa.table({"scc_id": u, "n": s})

    size_chunks = [
        b
        for b in scc.map_batches(size_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(size_fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    comp = (
        np.concatenate([c["scc_id"].to_numpy() for c in size_chunks])
        if size_chunks
        else np.array([], np.int64)
    )
    csize = (
        np.concatenate([c["n"].to_numpy() for c in size_chunks])
        if size_chunks
        else np.array([], np.int64)
    )
    if len(comp) > collect_threshold:
        raise ValueError(
            "condensation too large for driver-side reachability; shard "
            "the component BFS through the superstep engine instead"
        )
    order = np.argsort(comp, kind="stable")
    comp, csize = comp[order], csize[order]
    C = len(comp)

    empty = pa.table(
        {
            "class": pa.array(list(BOWTIE_CLASSES)),
            "n_components": pa.array([0] * 6, pa.int64()),
            "n_vertices": pa.array([0] * 6, pa.int64()),
        }
    )
    if C == 0:
        return empty

    # condensation edges (component-indexed), deduped distributed
    w1 = _attach_value_auto(de, scc, "src", ["dst"], "scc_id", "cs", num_partitions)
    w2 = _attach_value_auto(w1, scc, "dst", ["cs"], "scc_id", "cd", num_partitions)

    def cedge(t: pa.Table) -> pa.Table:
        cs = t["cs"].to_numpy()
        cd = t["cd"].to_numpy()
        keep = cs != cd
        return pa.table({"cs": cs[keep], "cd": cd[keep]})

    ce_chunks = [
        b
        for b in distinct(
            w2.map_batches(cedge, batch_format="pyarrow"), ["cs", "cd"]
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if ce_chunks:
        es = np.searchsorted(
            comp, np.concatenate([c["cs"].to_numpy() for c in ce_chunks])
        )
        ed = np.searchsorted(
            comp, np.concatenate([c["cd"].to_numpy() for c in ce_chunks])
        )
    else:
        es = ed = np.array([], np.int64)
    if len(es) > collect_threshold:
        raise ValueError(
            "condensation too large for driver-side reachability; shard "
            "the component BFS through the superstep engine instead"
        )

    def reach(seeds: np.ndarray, heads: np.ndarray, tails: np.ndarray) -> np.ndarray:
        """Boolean reachability over the component DAG: vectorized
        frontier BFS (CSR by sorted heads, searchsorted fan-out)."""
        seen = seeds.copy()
        if not len(heads):
            return seen
        o = np.argsort(heads, kind="stable")
        hs, ts = heads[o], tails[o]
        uh, start = np.unique(hs, return_index=True)
        cnt = np.diff(np.append(start, len(hs)))
        frontier = np.flatnonzero(seen)
        while len(frontier):
            p = np.searchsorted(uh, frontier)
            ok = (p < len(uh)) & (uh[np.clip(p, 0, len(uh) - 1)] == frontier)
            p = p[ok]
            if not len(p):
                break
            idxs = np.concatenate(
                [np.arange(start[i], start[i] + cnt[i]) for i in p]
            )
            nxt = np.unique(ts[idxs])
            nxt = nxt[~seen[nxt]]
            seen[nxt] = True
            frontier = nxt
        return seen

    # CORE: largest size, ties -> smallest scc_id (comp is sorted by id,
    # so the first argmax IS the tie-break winner)
    core_i = int(np.argmax(csize))
    is_core = np.zeros(C, bool)
    is_core[core_i] = True
    rp = reach(is_core, es, ed)
    rm = reach(is_core, ed, es)
    in_ = rm & ~is_core
    out_ = rp & ~is_core
    wk = reach(is_core, np.concatenate([es, ed]), np.concatenate([ed, es]))
    other = wk & ~is_core & ~in_ & ~out_
    keep = ~is_core[es] & ~is_core[ed]  # core-avoiding condensation edges
    res, red = es[keep], ed[keep]
    from_in = reach(in_.copy(), res, red)
    to_out = reach(out_.copy(), red, res)
    tube = other & from_in & to_out
    tend = other & ~tube
    disc = ~wk

    masks = {
        "core": is_core,
        "in": in_,
        "out": out_,
        "tubes": tube,
        "tendrils": tend,
        "disconnected": disc,
    }
    return pa.table(
        {
            "class": pa.array(list(BOWTIE_CLASSES)),
            "n_components": pa.array(
                [int(masks[k].sum()) for k in BOWTIE_CLASSES], pa.int64()
            ),
            "n_vertices": pa.array(
                [int(csize[masks[k]].sum()) for k in BOWTIE_CLASSES],
                pa.int64(),
            ),
        }
    )


WL_CG = 1203980568741239047   # neighbor-contribution multiplier
WL_CS = 1549187396127840017   # own-color multiplier
WL_CO = 876049781234569241    # out-neighborhood multiplier
WL_CI = 2017492831764523901   # in-neighborhood multiplier


def wl_refinement(
    edges: ray.data.Dataset,
    rounds: int = 2,
    max_vertices: int = 20_000_000,
) -> ray.data.Dataset:
    """Weisfeiler-Leman color refinement over the directed edge table —
    the classic structural-equivalence features graph-ML kernels start
    from (1-WL / colour refinement; Shervashidze et al., JMLR'11). Two
    vertices get equal colors after R rounds iff their depth-R directed
    neighborhood trees agree, so the color histogram is a graph
    fingerprint and per-vertex colors are node features.

    The multiset of neighbor colors is hashed COMMUTATIVELY — each round
    c'(v) = (c(v)*CS + S_out(v)*CO + S_in(v)*CI + 1) mod (2^61-1) with
    S_out(v) = Σ_{v→u} c(u)*CG and S_in(v) = Σ_{u→v} c(u)*CG, all mod the
    Mersenne prime — so the combine is order-free (exactly mirrorable in
    SQL HUGEINT, and partial sums can fold anywhere in the tree). Sum
    collisions are 2^-61-scale events, the standard trade of hashed WL.

    Scale shape (broadcast regime): the color table rides `ray.put` once
    per round and every edge batch emits COMBINER rows — per-batch
    modular sums per (vertex, direction), never per-edge rows — that
    tree-fold on the driver; one distributed pass per round, ZERO
    shuffles. The driver fold is V-scale, so corpora beyond
    `max_vertices` must swap the broadcast for the co-partitioned
    `_attach_value` pattern (see temporal_reachability) — raised as an
    explicit error, never a silent OOM. Returns (vertex, wl_color) with
    wl_color < 2^61 as int64."""
    import pyarrow.compute as pc

    from ..functions.hashing import M61, mod61, mulmod61

    vparts = edges.map_batches(
        lambda t: pa.table(
            {"v": pc.unique(pa.concat_arrays(
                [t["src"].combine_chunks(), t["dst"].combine_chunks()]
            ))}
        ),
        batch_format="pyarrow",
    )
    verts = np.unique(
        np.concatenate(
            [b["v"].to_numpy() for b in vparts.iter_batches(batch_format="pyarrow")]
            or [np.array([], np.int64)]
        )
    )
    if len(verts) > max_vertices:
        raise ValueError(
            "vertex universe exceeds max_vertices; replace the broadcast "
            "color table with the co-partitioned _attach_value rounds"
        )
    v_ref = ray.put(verts)
    colors = np.ones(len(verts), np.uint64)

    def modsum_runs(vals: np.ndarray, starts: np.ndarray) -> np.ndarray:
        # exact Σ mod (2^61-1) per run: hi/lo 32-bit split keeps every
        # partial inside uint64 for runs shorter than 2^31
        lo = np.add.reduceat(vals & np.uint64(0xFFFFFFFF), starts)
        hi = np.add.reduceat(vals >> np.uint64(32), starts)
        hi = mod61(hi)
        hi = (hi >> np.uint64(29)) + (
            (hi & np.uint64((1 << 29) - 1)) << np.uint64(32)
        )
        return mod61(mod61(lo) + mod61(hi))

    for _ in range(rounds):
        c_ref = ray.put(colors)

        def contrib(t: pa.Table) -> pa.Table:
            from ..functions.proccache import cached_get

            vs = cached_get(v_ref)
            cs = cached_get(c_ref)
            si = np.searchsorted(vs, t["src"].to_numpy())
            di = np.searchsorted(vs, t["dst"].to_numpy())
            g_src = mulmod61(cs[si], WL_CG)
            g_dst = mulmod61(cs[di], WL_CG)
            # combiner: (vertex_idx, side) modular sums within the batch
            idx = np.concatenate([si, di])
            side = np.concatenate(
                [np.zeros(len(si), np.int8), np.ones(len(di), np.int8)]
            )
            val = np.concatenate([g_dst, g_src])  # out gets c(dst), in c(src)
            order = np.lexsort((idx, side))
            idx, side, val = idx[order], side[order], val[order]
            first = np.concatenate(
                [[True], (idx[1:] != idx[:-1]) | (side[1:] != side[:-1])]
            )
            starts = np.flatnonzero(first)
            return pa.table(
                {
                    "idx": pa.array(idx[starts], pa.int64()),
                    "side": pa.array(side[starts], pa.int8()),
                    "val": pa.array(
                        modsum_runs(val, starts).astype(np.int64), pa.int64()
                    ),
                }
            )

        pt = edges.map_batches(contrib, batch_format="pyarrow").to_pandas()
        s_out = np.zeros(len(verts), np.uint64)
        s_in = np.zeros(len(verts), np.uint64)
        if len(pt):
            idx = pt["idx"].to_numpy(np.int64)
            side = pt["side"].to_numpy(np.int8)
            val = pt["val"].to_numpy(np.int64).view(np.uint64)
            order = np.lexsort((idx, side))
            idx, side, val = idx[order], side[order], val[order]
            first = np.concatenate(
                [[True], (idx[1:] != idx[:-1]) | (side[1:] != side[:-1])]
            )
            starts = np.flatnonzero(first)
            sums = modsum_runs(val, starts)
            out_mask = side[starts] == 0
            s_out[idx[starts][out_mask]] = sums[out_mask]
            s_in[idx[starts][~out_mask]] = sums[~out_mask]
        colors = mod61(
            mulmod61(colors, WL_CS)
            + mulmod61(s_out, WL_CO)
            + mulmod61(s_in, WL_CI)
            + np.uint64(1)
        )

    return ray.data.from_arrow(
        pa.table(
            {
                "vertex": pa.array(verts, pa.int64()),
                "wl_color": pa.array(colors.astype(np.int64), pa.int64()),
            }
        )
    )


def densest_subgraph_peel(
    edges: ray.data.Dataset,
    eps_num: int = 11,
    eps_den: int = 10,
    max_rounds: int = 64,
    max_broadcast_vertices: int = 50_000_000,
) -> "pa.Table":
    """Densest-subgraph greedy peeling, the MapReduce batched variant
    (Bahmani, Kumar & Vassilvitskii, VLDB'12): each round removes EVERY
    vertex whose degree is at most 2·(eps_num/eps_den)·E/V — checked by
    the exact integer cross-multiplication deg·eps_den·V <= 2·eps_num·E,
    no float density anywhere — and the round with the maximum E/V over
    its survivors 2(1+eps)-approximates the densest subgraph in
    O(log_{1+eps} V) rounds (vs V sequential rounds for Charikar's
    one-at-a-time peel). Degrees count both endpoints of the directed
    edge table (= undirected degree; the layered supply graph has no
    reciprocal pairs), and a round's vertex set is the set incident to
    its surviving edges.

    Scale shape (broadcast regime): per round ONE distributed combiner
    pass emits per-batch (vertex, partial-degree) rows that fold on the
    driver (V-scale, like the WL color table), and the survivor id array
    is `ray.put`-broadcast into a vectorized isin filter over the edge
    blocks — no shuffle at all; beyond `max_broadcast_vertices` swap the
    driver fold for a hashed groupby + co-partitioned semi-join (explicit
    error, never a silent OOM). Returns the per-round audit table
    (round, n_vertices, n_edges) for every non-empty round, round 0 = the
    input graph."""
    import pyarrow.compute as pc

    cur = edges
    rows = []
    for rnd in range(max_rounds):
        def deg_combiner(t: pa.Table) -> pa.Table:
            both = np.concatenate([t["src"].to_numpy(), t["dst"].to_numpy()])
            u, c = np.unique(both, return_counts=True)
            return pa.table(
                {
                    "vertex": pa.array(u, pa.int64()),
                    "d": pa.array(c.astype(np.int64)),
                }
            )

        deg_parts = cur.map_batches(
            deg_combiner, batch_format="pyarrow"
        ).to_pandas()
        if not len(deg_parts):
            break
        agg = deg_parts.groupby("vertex", sort=True)["d"].sum()
        verts = agg.index.to_numpy(np.int64)
        deg = agg.to_numpy(np.int64)
        if len(verts) > max_broadcast_vertices:
            raise ValueError(
                "vertex universe exceeds max_broadcast_vertices; swap the "
                "driver degree fold for a hashed groupby + co-partitioned "
                "semi-join"
            )
        n_v = len(verts)
        n_e = int(deg.sum()) // 2
        rows.append((rnd, n_v, n_e))
        keep = deg * eps_den * n_v > 2 * eps_num * n_e
        if keep.all():
            break  # fixpoint: nothing peels, later rounds are identical
        surv = verts[keep]
        if len(surv) == 0:
            break
        s_ref = ray.put(surv)

        def flt(t: pa.Table) -> pa.Table:
            from ..functions.proccache import cached_get

            sv = cached_get(s_ref)
            s = t["src"].to_numpy()
            d = t["dst"].to_numpy()
            ok = np.isin(s, sv, assume_unique=False) & np.isin(
                d, sv, assume_unique=False
            )
            return t.filter(pa.array(ok))

        cur = cur.map_batches(flt, batch_format="pyarrow").materialize()
    return pa.table(
        {
            "round": pa.array([r[0] for r in rows], pa.int64()),
            "n_vertices": pa.array([r[1] for r in rows], pa.int64()),
            "n_edges": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def neighbor_sample(
    edges: ray.data.Dataset,
    seeds,
    fanouts: tuple[int, ...] = (3, 2),
    num_parts: int = 16,
) -> "pa.Table":
    """GraphSAGE-style fixed-fanout neighborhood sampling (Hamilton et
    al., NeurIPS 2017): starting from a seed batch, keep at most
    fanouts[h] out-neighbors of every frontier vertex at hop h, chosen by
    the deterministic per-edge priority
    h = (src*2654435761 + dst*40503) mod (2^31 - 1), ties by dst — the
    computation-graph extraction step a distributed GNN trainer runs per
    mini-batch. Returns the sampled subgraph as (hop, src, dst) rows.

    Scale shape: the frontier is mini-batch-sized (<= |seeds| *
    prod(fanouts) vertices, by construction), so each hop broadcasts it
    once (`ray.put` of one sorted array, per-batch searchsorted
    membership) — the edge table is NEVER shuffled on raw vertex keys.
    Candidates pre-cut to the local top-K per source inside the batch
    combiner (at most K rows per source per batch survive), then ONE
    hashed-src shuffle completes the exact global top-K. A vertex is
    expanded at most once: its sample depends only on (src, dst), never
    on which seed reached it, so the sampled subgraph is the
    deduplicated union over seeds and hop h+1's frontier is the sampled
    dst set minus everything already expanded."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.hashing import part_of
    from ..functions.proccache import cached_get

    def topk_per_src(src, dst, pri, k):
        order = np.lexsort((dst, pri, src))
        s, d, h = src[order], dst[order], pri[order]
        if len(s) == 0:
            return s, d, h
        # drop duplicate (src, dst) pairs first (pri is a function of the
        # pair, so dups are adjacent after the lexsort): the sample is
        # over the DISTINCT neighbor set, which lets the caller feed the
        # raw un-deduped edge stream with no global distinct shuffle
        uniq = np.ones(len(s), bool)
        uniq[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s, d, h = s[uniq], d[uniq], h[uniq]
        new = np.empty(len(s), bool)
        new[0] = True
        np.not_equal(s[1:], s[:-1], out=new[1:])
        first = np.maximum.accumulate(np.where(new, np.arange(len(s)), 0))
        rank = np.arange(len(s)) - first
        keep = rank < k
        return s[keep], d[keep], h[keep]

    expanded = np.array([], np.int64)
    frontier = np.unique(np.asarray(seeds, np.int64))
    out_frames = []
    for hop, k in enumerate(fanouts, start=1):
        if len(frontier) == 0:
            break
        f_ref = ray.put(frontier)

        def combiner(t: pa.Table, f_ref=f_ref, k=k) -> pa.Table:
            fv = cached_get(f_ref)
            src = t["src"].to_numpy().astype(np.int64, copy=False)
            dst = t["dst"].to_numpy().astype(np.int64, copy=False)
            idx = np.searchsorted(fv, src)
            idx_c = np.minimum(idx, len(fv) - 1)
            keep = (idx < len(fv)) & (fv[idx_c] == src)
            src, dst = src[keep], dst[keep]
            pri = (src * 2654435761 + dst * 40503) % 2147483647
            s, d, h = topk_per_src(src, dst, pri, k)
            return pa.table(
                {
                    "src": pa.array(s, pa.int64()),
                    "dst": pa.array(d, pa.int64()),
                    "h": pa.array(h, pa.int64()),
                    "__p": pa.array(part_of(s, num_parts), pa.int32()),
                }
            )

        def fold(df: pd.DataFrame, k=k) -> pd.DataFrame:
            s, d, h = topk_per_src(
                df["src"].to_numpy(np.int64),
                df["dst"].to_numpy(np.int64),
                df["h"].to_numpy(np.int64),
                k,
            )
            return pd.DataFrame({"src": s, "dst": d})

        partials = edges.map_batches(combiner, batch_format="pyarrow")
        if len(frontier) * k <= 1_000_000:
            # mini-batch regime (the GNN-trainer case by construction):
            # per-batch survivors are <= k per frontier source, so the
            # global exact top-k folds on the driver — no shuffle per hop
            chunks = [
                b
                for b in partials.iter_batches(batch_format="pyarrow")
                if b.num_rows
            ]
            if chunks:
                s, d, _ = topk_per_src(
                    np.concatenate([c["src"].to_numpy() for c in chunks]),
                    np.concatenate([c["dst"].to_numpy() for c in chunks]),
                    np.concatenate([c["h"].to_numpy() for c in chunks]),
                    k,
                )
            else:
                s = d = np.array([], np.int64)
            hop_df = pd.DataFrame({"src": s, "dst": d})
        else:
            hop_df = (
                partials.groupby("__p")
                .map_groups(fold, batch_format="pandas")
                .to_pandas()
            )
        if len(hop_df) == 0:  # no frontier vertex has out-edges: done
            break
        hop_df.insert(0, "hop", np.int64(hop))
        out_frames.append(hop_df)
        expanded = np.union1d(expanded, frontier)
        sampled = np.unique(hop_df["dst"].to_numpy(np.int64))
        frontier = np.setdiff1d(sampled, expanded)

    if not out_frames:
        out = pd.DataFrame(
            {
                "hop": np.array([], np.int64),
                "src": np.array([], np.int64),
                "dst": np.array([], np.int64),
            }
        )
    else:
        out = pd.concat(out_frames, ignore_index=True)
    return pa.table(
        {
            "hop": pa.array(out["hop"].to_numpy(np.int64)),
            "src": pa.array(out["src"].to_numpy(np.int64)),
            "dst": pa.array(out["dst"].to_numpy(np.int64)),
        }
    )


def square_count(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    max_deg: int | None = None,
    wedge_fanout: int = 64,
) -> "pa.Table":
    """Exact 4-cycle (square / C4) census of the simple undirected graph:
    squares = (1/2) * sum over unordered vertex pairs of C(cn, 2), where
    cn is the pair's common-neighbor count — every 4-cycle x-a-y-b has
    exactly the two diagonals (x,y) and (a,b), so the wedge-pair sum
    counts it twice. The quadrilateral analog of triangle_count; emits
    ONE row (squares, wedge_pairs).

    Scale shape: canonical distinct undirected edges → symmetric
    adjacency hash-partitioned by wedge center (ONE shuffle) → per
    partition the wedge pairs come out of the closed-form triangular
    decode over each center's sorted neighbor run, PACKED into int64
    keys and pushed straight at P `_PairReducer` actors by hash(pair)
    (the common_neighbors exchange — measured 10x cheaper than a second
    Dataset groupby on the 145M-row sf0.1 pair table, 129 s → seconds);
    each reducer compacts incrementally, holds O(its distinct pairs),
    and finalizes to TWO integers (distinct pairs, sum C(cn, 2)), so
    per-pair results never leave the actors and the driver adds P rows.
    max_deg: optional hub cap (centers above it skipped, drop count
    logged — recall loss is never silent); default None = exact, the
    honest O(sum deg^2) wedge cost every square counter pays.

    Measured at sf0.1 (213M wedges, 32 cpus): ~14 s distinct edges, ~27 s
    wedge enumeration, ~100 s pair exchange+finalize — the exchange IS
    the sum-deg^2 term and is excluded from the default bench sweep;
    max_deg is the scale lever when the census may be approximate."""
    import pyarrow.compute as pc

    P = num_partitions

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    und = distinct(edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"])

    W = max(wedge_fanout, P)  # wedge tasks decouple from the reducer count

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        c = np.concatenate([a, b])
        v = np.concatenate([b, a])
        return pa.table(
            {
                "c": pa.array(c),
                "v": pa.array(v),
                "__p": pa.array(part_of(c, W), pa.int32()),
            }
        )

    def wedge_pairs(t: pa.Table) -> np.ndarray:
        # sqrt-free grouped-arange gather (the common_neighbors kernel):
        # rep walks each sorted neighbor run, gather picks every later
        # neighbor, so pairs come out a < b without a triangular decode
        c = t["c"].to_numpy()
        v = t["v"].to_numpy()
        order = np.lexsort((v, c))
        c, v = c[order], v[order]
        n = len(c)
        if n == 0:
            return np.empty(0, np.int64)
        new_run = np.concatenate([[True], c[1:] != c[:-1]])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        run_end = np.concatenate([starts[1:], [n]])[run_id]
        if max_deg is not None:
            run_len = run_end - starts[run_id]
            hub = run_len > max_deg
            if hub.any():
                print(
                    f"square_count: skipping "
                    f"{len(np.unique(c[hub]))} hub centers over "
                    f"max_deg={max_deg} (explicit recall loss)"
                )
                keep = ~hub
                c, v = c[keep], v[keep]
                n = len(c)
                if n == 0:
                    return np.empty(0, np.int64)
                new_run = np.concatenate([[True], c[1:] != c[:-1]])
                starts = np.flatnonzero(new_run)
                run_id = np.cumsum(new_run) - 1
                run_end = np.concatenate([starts[1:], [n]])[run_id]
        pos = np.arange(n)
        sizes = run_end - pos - 1
        tot = int(sizes.sum())
        if tot == 0:
            return np.empty(0, np.int64)
        rep = np.repeat(pos, sizes)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep]
        gather = rep + 1 + within
        return _pack_pair(v[rep], v[gather])

    reducers = [_PairReducer.remote() for _ in range(P)]

    def pushed(t: pa.Table) -> pa.Table:
        """Enumerate this center partition's wedge pairs and push slices at
        their reducers; awaiting the acks makes dataset completion the
        delivery barrier (the common_neighbors pattern)."""
        pk = wedge_pairs(t)
        kp = part_of(pk, P)
        order = np.argsort(kp, kind="stable")
        bounds = np.searchsorted(kp[order], np.arange(P + 1))
        acks = []
        for p in range(P):
            sl = order[bounds[p] : bounds[p + 1]]
            if len(sl):
                acks.append(
                    reducers[p].add.remote(pk[sl], np.ones(len(sl), np.int64))
                )
        if acks:
            ray.get(acks)
        return pa.table({"pushed": pa.array([len(pk)], pa.int64())})

    push = (
        und.map_batches(sym, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(pushed, batch_format="pyarrow")
    )
    sum(r["pushed"] for r in push.take_all())  # delivery barrier
    parts = ray.data.from_arrow_refs(
        [r.c4_sum.remote() for r in reducers]
    ).to_pandas()
    c2 = int(parts["c2"].sum()) if len(parts) else 0
    return pa.table(
        {
            "squares": pa.array([c2 // 2], pa.int64()),
            "wedge_pairs": pa.array(
                [int(parts["pairs"].sum()) if len(parts) else 0], pa.int64()
            ),
        }
    )


def percolation_sweep(
    edges: ray.data.Dataset,
    keeps: tuple[int, ...] = (100, 80, 40),
    num_parts: int = 8,
) -> "pa.Table":
    """Bond-percolation robustness sweep: for each keep percentage K the
    edge set is thinned by the deterministic per-edge hash
    (src*2654435761 + dst*40503) mod 100 < K and connected components are
    recomputed, reporting (keep_pct, n_vertices, n_edges, n_components,
    giant_size) — how fast the graph fragments as links fail, the
    resilience curve an infrastructure/link-graph operator reads before
    trusting connectivity-derived features. Vertices that lose every
    edge drop out (n_vertices counts kept-edge endpoints).

    Scale shape: per level, ONE vectorized filter pass feeds the
    standard CSR-shard build + superstep min-label CC (nothing new
    shuffles beyond what CC itself does); component statistics fold as
    bounded per-partition partials — labels are hash-disjoint across
    partitions, so count/max/sum combine exactly on the driver from P
    rows per level. Levels run sequentially to bound peak actor count at
    one shard pool."""
    import pyarrow.compute as pc

    from ..functions.hashing import part_of

    rows = []
    for K in keeps:

        def filt(t: pa.Table, K=K) -> pa.Table:
            s = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
            d = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
            h = (s * 2654435761 + d * 40503) % 100
            keep = h < K
            return pa.table(
                {"src": pa.array(s[keep]), "dst": pa.array(d[keep])}
            )

        kept = edges.map_batches(filt, batch_format="pyarrow").materialize()
        n_edges = kept.count()
        if n_edges == 0:
            rows.append((K, 0, 0, 0, 0))
            continue
        if n_edges <= 2_000_000:
            # small kept set: vectorized driver CC (same fast path as the
            # LSH co-bucket clusters) — a CSR shard pool costs ~5s of
            # fixed machinery per level; the superstep branch below is
            # the any-scale path
            kp = kept.to_pandas()
            vs, lab = driver_components(
                kp["src"].to_numpy(np.int64), kp["dst"].to_numpy(np.int64),
                kp["src"].to_numpy(np.int64),
            )
            comps, sizes = np.unique(lab, return_counts=True)
            rows.append(
                (K, int(len(vs)), int(n_edges), int(len(comps)),
                 int(sizes.max()) if len(sizes) else 0)
            )
            continue
        g = ShardedGraph.build(kept, num_parts=num_parts, symmetric=True)
        cc = connected_components(g)

        def label_partial(t: pa.Table) -> pa.Table:
            lab = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(lab, return_counts=True)
            return pa.table(
                {
                    "component": u,
                    "n": c.astype(np.int64),
                    "__p": pa.array(part_of(u, num_parts), pa.int32()),
                }
            )

        def fold(t: pa.Table) -> pa.Table:
            lab = t["component"].to_numpy()
            n = t["n"].to_numpy()
            u, inv = np.unique(lab, return_inverse=True)
            sizes = np.bincount(inv, weights=n, minlength=len(u)).astype(
                np.int64
            )
            return pa.table(
                {
                    "n_components": pa.array([np.int64(len(u))]),
                    "giant": pa.array(
                        [np.int64(sizes.max()) if len(sizes) else np.int64(0)]
                    ),
                    "n_vertices": pa.array([np.int64(sizes.sum())]),
                }
            )

        parts = (
            cc.map_batches(label_partial, batch_format="pyarrow")
            .groupby("__p")
            .map_groups(fold, batch_format="pyarrow")
            .to_pandas()
        )
        rows.append(
            (
                K,
                int(parts["n_vertices"].sum()),
                int(n_edges),
                int(parts["n_components"].sum()),
                int(parts["giant"].max()) if len(parts) else 0,
            )
        )
    return pa.table(
        {
            "keep_pct": pa.array([r[0] for r in rows], pa.int64()),
            "n_vertices": pa.array([r[1] for r in rows], pa.int64()),
            "n_edges": pa.array([r[2] for r in rows], pa.int64()),
            "n_components": pa.array([r[3] for r in rows], pa.int64()),
            "giant_size": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Directed triad census (complete triads)
# ---------------------------------------------------------------------------

# Holland–Leinhardt MAN codes for the seven COMPLETE triads (all three
# vertex pairs connected), networkx-convention semantics (pinned against
# nx.triadic_census in tests/test_graph_extras.py):
#   030C cyclic 3 one-way arcs; 030T transitive 3 one-way arcs;
#   120D one mutual dyad, off-dyad vertex points INTO the dyad (out-deg 2);
#   120U one mutual dyad, dyad points to the off-dyad vertex (in-deg 2);
#   120C one mutual dyad, mixed one-in-one-out; 210 two mutual; 300 all.
TRIAD_NAMES = ("030C", "030T", "120D", "120U", "120C", "210", "300")


def _classify_triads(
    tu: np.ndarray,
    tv1: np.ndarray,
    tv2: np.ndarray,
    m_uv1: np.ndarray,
    m_uv2: np.ndarray,
    m_v12: np.ndarray,
) -> np.ndarray:
    """Vectorized triad classification. Each row is a triangle over
    vertices (tu, tv1, tv2) with edges (tu,tv1), (tu,tv2), (tv1,tv2);
    each mask is the CANONICAL direction bitset of its undirected edge —
    bit0: low-id -> high-id arc present, bit1: the reverse arc — so a
    mask is 1, 2 or 3 and is independent of the argument order here.
    Returns int8 codes indexing TRIAD_NAMES."""
    x = np.minimum(np.minimum(tu, tv1), tv2)
    z = np.maximum(np.maximum(tu, tv1), tv2)
    y = tu + tv1 + tv2 - x - z
    lo1, hi1 = np.minimum(tu, tv1), np.maximum(tu, tv1)
    lo2, hi2 = np.minimum(tu, tv2), np.maximum(tu, tv2)
    # slot the three masks onto the sorted pairs (x,y), (x,z), (y,z):
    # hi==y uniquely selects the (x,y) edge, lo==y the (y,z) edge
    m_xy = np.where(hi1 == y, m_uv1, np.where(hi2 == y, m_uv2, m_v12))
    m_yz = np.where(lo1 == y, m_uv1, np.where(lo2 == y, m_uv2, m_v12))
    m_xz = np.where(
        (lo1 == x) & (hi1 == z),
        m_uv1,
        np.where((lo2 == x) & (hi2 == z), m_uv2, m_v12),
    )
    nm = (
        (m_xy == 3).astype(np.int8)
        + (m_xz == 3).astype(np.int8)
        + (m_yz == 3).astype(np.int8)
    )
    # arc source per edge (meaningful only when that mask != 3)
    s_xy = np.where(m_xy == 1, x, y)
    s_xz = np.where(m_xz == 1, x, z)
    s_yz = np.where(m_yz == 1, y, z)
    # nm == 0: cyclic iff every vertex emits exactly one arc, i.e. the
    # three sources are pairwise distinct
    cyc = (s_xy != s_xz) & (s_xy != s_yz) & (s_xz != s_yz)
    # nm == 1: off-dyad vertex = the one NOT on the mutual edge; its
    # out-count over the two one-way arcs picks D (2) / U (0) / C (1)
    zv = np.where(m_xy == 3, z, np.where(m_xz == 3, y, x))
    zout = (
        ((m_xy != 3) & (s_xy == zv)).astype(np.int8)
        + ((m_xz != 3) & (s_xz == zv)).astype(np.int8)
        + ((m_yz != 3) & (s_yz == zv)).astype(np.int8)
    )
    return np.where(
        nm == 3,
        6,
        np.where(
            nm == 2,
            5,
            np.where(
                nm == 1,
                np.where(zout == 2, 2, np.where(zout == 0, 3, 4)),
                np.where(cyc, 0, 1),
            ),
        ),
    ).astype(np.int8)


@ray.remote
def _triad_wedges_task(u, v, m, es_packed, es_mask, lo: int, hi: int):
    """Triad-census variant of _close_wedges_task: close the wedges whose
    first edge lies in [lo, hi), classify each closed triangle from the
    three edge masks, return a 7-long count vector. Always probes forward
    (wedges into the sorted edge array): the census needs each hit's es
    POSITION to fetch the closing edge's mask, which the inverted
    interval-count probe does not produce."""
    n = len(u)
    pos0 = np.arange(lo, hi)
    run_end = np.searchsorted(u, u[lo:hi], side="right")
    sizes = run_end - pos0 - 1
    sizes[sizes < 0] = 0
    tot = int(sizes.sum())
    if tot == 0:
        return np.zeros(7, np.int64)
    rep = np.repeat(pos0, sizes)
    within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep - lo]
    gather = rep + 1 + within
    v1, v2 = v[rep], v[gather]
    qa, qb = np.minimum(v1, v2), np.maximum(v1, v2)
    qpack = (qa.astype(np.uint64) << np.uint64(32)) | qb.astype(np.uint64)
    p = np.searchsorted(es_packed, qpack)
    np.clip(p, 0, len(es_packed) - 1, out=p)
    hit = es_packed[p] == qpack
    if not hit.any():
        return np.zeros(7, np.int64)
    codes = _classify_triads(
        u[rep][hit].astype(np.int64),
        v1[hit].astype(np.int64),
        v2[hit].astype(np.int64),
        m[rep][hit].astype(np.int64),
        m[gather][hit].astype(np.int64),
        es_mask[p[hit]].astype(np.int64),
    )
    return np.bincount(codes, minlength=7).astype(np.int64)


def triad_census(
    edges: ray.data.Dataset,
    num_partitions: int = 32,
    broadcast_edges_max: int = 50_000_000,
) -> "pa.Table":
    """Exact directed triad census over the COMPLETE (closed-triangle)
    triads of a directed graph — counts of 030C/030T/120D/120U/120C/210/300
    (see TRIAD_NAMES). The motif layer the scalar triangle count and the
    reciprocity summary can't see: distinguishes feed-forward (030T) from
    feedback (030C) structure and how mutual dyads embed in triangles.

    Pipeline: canonicalize each directed arc to its undirected edge plus a
    direction bit (1: low-id->high-id, 2: reverse) -> per-edge mask = OR of
    the bits -> degree-ordered orientation -> the triangle_count wedge
    machinery, with the three edge masks riding along so each closed
    triangle classifies locally in the task/partition that closes it.

    Two regimes, mirroring triangle_count:
      - |E| <= broadcast_edges_max: edge array + masks broadcast once
        (ray.put), balanced wedge tasks probe in place; NO shuffle.
      - larger: masks travel through the oriented/wedge tables; ONE
        hash(v,w) shuffle co-partitions wedges with closing edges and the
        census folds per partition.
    Returns a tiny (triad, n) Arrow table (nonzero classes only, sorted by
    name — matches the SQL oracle's GROUP BY)."""
    import pyarrow.compute as pc

    P = num_partitions

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "a": np.minimum(s, d),
                "b": np.maximum(s, d),
                "dm": np.where(s < d, 1, 2).astype(np.int64),
            }
        )

    raw = edges.map_batches(canon, batch_format="pyarrow").materialize()
    n_edges = raw.count()
    try:
        avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        broadcast_edges_max = min(broadcast_edges_max, int(avail * 0.10) // 24)
    except (ValueError, OSError, AttributeError):
        pass

    def census_table(counts: np.ndarray) -> pa.Table:
        keep = counts > 0
        names = [TRIAD_NAMES[i] for i in np.flatnonzero(keep)]
        return pa.table(
            {
                "triad": pa.array(names, pa.string()),
                "n": pa.array(counts[keep], pa.int64()),
            }
        )

    if n_edges <= broadcast_edges_max:
        df = raw.to_pandas()
        if "a" not in df.columns or not len(df):
            return census_table(np.zeros(7, np.int64))
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        dm = df["dm"].to_numpy()
        del df
        vmax = int(max(a.max(), b.max()))
        if vmax < (1 << 26):
            nv = vmax + 1
            ra, rb = a, b
        else:
            vs_sorted = np.unique(np.concatenate([a, b]))
            nv = len(vs_sorted)
            assert nv < (1 << 31)
            ra = np.searchsorted(vs_sorted, a).astype(np.int64)
            rb = np.searchsorted(vs_sorted, b).astype(np.int64)
        packed = (ra.astype(np.uint64) << np.uint64(32)) | rb.astype(np.uint64)
        order = np.argsort(packed, kind="stable")
        packed = packed[order]
        dm_s = dm[order].astype(np.int64)
        new = np.ones(len(packed), bool)
        new[1:] = packed[1:] != packed[:-1]
        starts = np.flatnonzero(new)
        es_packed = packed[starts]
        es_mask = np.bitwise_or.reduceat(dm_s, starts)
        ra = (es_packed >> np.uint64(32)).astype(np.int64)
        rb = (es_packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        deg = np.bincount(ra, minlength=nv) + np.bincount(rb, minlength=nv)
        da, db = deg[ra], deg[rb]
        a_first = (da < db) | ((da == db) & (ra < rb))
        u = np.where(a_first, ra, rb).astype(np.int32)
        v = np.where(a_first, rb, ra).astype(np.int32)
        rv = np.where(a_first, db, da).astype(np.int32)
        em = es_mask.astype(np.int8)
        o2 = np.lexsort((v, rv, u))
        u, v, em = u[o2], v[o2], em[o2]
        n = len(u)
        if n == 0:
            return census_table(np.zeros(7, np.int64))
        run_end_all = np.searchsorted(u, u, side="right")
        sizes_all = run_end_all - np.arange(n) - 1
        cum = np.cumsum(sizes_all)
        total_w = int(cum[-1]) if n else 0
        T = max(1, min(num_partitions, n))
        targets = (np.arange(1, T) * (total_w / T)).astype(np.int64)
        cuts = np.searchsorted(cum, targets)
        cuts = np.searchsorted(u, u[np.clip(cuts, 0, n - 1)], side="left")
        bounds = np.unique(np.concatenate([[0], cuts, [n]]))
        u_ref = ray.put(u)
        v_ref = ray.put(v)
        m_ref = ray.put(em)
        es_ref = ray.put(es_packed)
        esm_ref = ray.put(es_mask.astype(np.int8))
        parts = ray.get(
            [
                _triad_wedges_task.remote(
                    u_ref, v_ref, m_ref, es_ref, esm_ref,
                    int(bounds[i]), int(bounds[i + 1]),
                )
                for i in range(len(bounds) - 1)
            ]
        )
        return census_table(np.sum(parts, axis=0).astype(np.int64))

    # ---- co-partitioned regime (|E| too large to broadcast) ----
    und3 = distinct(raw, ["a", "b", "dm"]).materialize()

    def local_mask(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        dm = t["dm"].to_numpy()
        o = np.lexsort((b, a))
        a, b, dm = a[o], b[o], dm[o]
        new = np.ones(len(a), bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "a": a[st],
                "b": b[st],
                "m": np.bitwise_or.reduceat(dm, st) if len(st) else dm[:0],
                "__p": pa.array(_pair_part(a[st], b[st], P), pa.int32()),
            }
        )

    def merge_mask(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        dm = t["m"].to_numpy()
        o = np.lexsort((b, a))
        a, b, dm = a[o], b[o], dm[o]
        new = np.ones(len(a), bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        st = np.flatnonzero(new)
        return pa.table(
            {
                "a": a[st],
                "b": b[st],
                "m": np.bitwise_or.reduceat(dm, st) if len(st) else dm[:0],
            }
        )

    und = (
        und3.map_batches(local_mask, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(merge_mask, batch_format="pyarrow")
        .materialize()
    )

    def both_ends(t: pa.Table) -> pa.Table:
        vv = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vertex": vv})

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), P
    ).materialize()
    wd = _attach_value(und, deg, "a", ["b", "m"], "deg", "deg_a", P)
    wd = _attach_value(
        wd.rename_columns({"a": "oa", "b": "a"}),
        deg,
        "a",
        ["oa", "m", "deg_a"],
        "deg",
        "deg_b",
        P,
    ).rename_columns({"a": "b", "oa": "a"})

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        da = t["deg_a"].to_numpy()
        db = t["deg_b"].to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        uu = np.where(a_first, a, b)
        vv = np.where(a_first, b, a)
        rvv = np.where(a_first, db, da)
        return pa.table(
            {
                "u": uu,
                "v": vv,
                "rv": rvv,
                "m": t["m"],
                "up": pa.array(part_of(uu, P), pa.int32()),
            }
        )

    oriented = wd.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        rv = t["rv"].to_numpy()
        m = t["m"].to_numpy()
        order = np.lexsort((v, rv, u))
        u, v, m = u[order], v[order], m[order]
        n = len(u)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], u[1:] != u[:-1]])) - 1
        run_end = np.concatenate([starts[1:], [n]])[run_id]
        pos = np.arange(n)
        sizes = run_end - pos - 1
        tot = int(sizes.sum())
        if tot == 0:
            e = np.empty(0, np.int64)
            return pa.table(
                {"wv": e, "ww": e, "wu": e, "m1": e, "m2": e,
                 "kp": np.empty(0, np.int32)}
            )
        rep = np.repeat(pos, sizes)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep]
        gather = rep + 1 + within
        wvc, wwc = v[rep], v[gather]
        return pa.table(
            {
                "wv": wvc,
                "ww": wwc,
                "wu": u[rep],
                "m1": m[rep],
                "m2": m[gather],
                "kp": pa.array(_pair_part(wvc, wwc, P), pa.int32()),
            }
        )

    wedge_ds = oriented.groupby("up").map_groups(wedges, batch_format="pyarrow")
    SENTINEL = np.iinfo(np.int64).min

    def key_edge(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        z = np.zeros(len(u), np.int64)
        return pa.table(
            {
                "wv": t["u"],
                "ww": t["v"],
                "wu": pa.array(np.full(len(u), SENTINEL, np.int64)),
                "m1": t["m"],
                "m2": z,
                "kp": pa.array(_pair_part(u, v, P), pa.int32()),
            }
        )

    probes = wedge_ds.union(oriented.map_batches(key_edge, batch_format="pyarrow"))

    def match(t: pa.Table) -> pa.Table:
        wu = t["wu"].to_numpy(zero_copy_only=False)
        is_edge = wu == SENTINEL
        wv = t["wv"].to_numpy(zero_copy_only=False)
        ww = t["ww"].to_numpy(zero_copy_only=False)
        m1 = t["m1"].to_numpy(zero_copy_only=False)
        m2 = t["m2"].to_numpy(zero_copy_only=False)
        es = _pair_struct(wv[is_edge], ww[is_edge])
        esm = m1[is_edge]
        o = np.argsort(es, kind="stable")
        es, esm = es[o], esm[o]
        qs = _pair_struct(wv[~is_edge], ww[~is_edge])
        qu = wu[~is_edge]
        qm1 = m1[~is_edge]
        qm2 = m2[~is_edge]
        counts = np.zeros(7, np.int64)
        if len(es) and len(qs):
            p = np.clip(np.searchsorted(es, qs), 0, len(es) - 1)
            hit = es[p] == qs
            if hit.any():
                codes = _classify_triads(
                    qu[hit], qs["a"][hit], qs["b"][hit],
                    qm1[hit], qm2[hit], esm[p[hit]],
                )
                counts = np.bincount(codes, minlength=7).astype(np.int64)
        return pa.table(
            {"code": np.arange(7, dtype=np.int64), "n": counts}
        )

    parts = (
        probes.groupby("kp")
        .map_groups(match, batch_format="pyarrow")
        .to_pandas()
    )
    totals = np.zeros(7, np.int64)
    if len(parts):
        np.add.at(totals, parts["code"].to_numpy(), parts["n"].to_numpy())
    return census_table(totals)


def attack_sweep(
    edges: ray.data.Dataset,
    removes: tuple[int, ...] = (0, 1, 5, 10),
    num_parts: int = 8,
) -> "pa.Table":
    """Targeted-attack robustness sweep — the hub-removal complement of
    :func:`percolation_sweep`'s random link failure (the classic
    scale-free asymmetry: resilient to random failure, fragile to
    attack): for each percentage R the top ceil(V*R/100) vertices by
    (degree DESC, id ASC) are deleted and connected components are
    recomputed over the surviving induced subgraph. Reports per level
    (remove_pct, n_removed, n_vertices, n_edges, n_components,
    giant_size); the graph is the canonical distinct undirected edge set
    (self-loops dropped), n_vertices counts surviving-edge endpoints.

    Scale shape: distinct + degree fold (one cheap-key shuffle);
    the removal cutoff comes from a per-degree histogram (bounded by max
    degree, tiny on the driver) — only the TIE CLASS at the cutoff
    degree is pulled to the driver to resolve the id order (size
    logged); the removal set broadcasts once (ray.put, <= V*R/100 int64s)
    and every filter task probes it with searchsorted; per level the
    standard CSR build + superstep CC runs, stats fold as bounded
    partials. Levels run sequentially to bound actor count."""
    import pyarrow.compute as pc

    from ..functions.hashing import part_of
    from ..functions.proccache import cached_get

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()
    n_edges_full = und.count()

    def both_ends(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vertex": v})

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_parts
    ).materialize()
    n_v = deg.count()

    # per-degree histogram: bounded by max degree, folded on the driver
    def dhist(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"deg": u, "n": c.astype(np.int64)})

    hist = deg.map_batches(dhist, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("deg", sort=True)["n"].sum().sort_index(ascending=False)
    degs_desc = hist.index.to_numpy()
    cnts_desc = hist.to_numpy(np.int64)
    cum = np.cumsum(cnts_desc)

    rows = []
    for R in removes:
        k = (n_v * R) // 100
        if k == 0:
            removed_ref = ray.put(np.empty(0, np.int64))
            n_removed = 0
        else:
            ci = int(np.searchsorted(cum, k))  # first degree class crossing k
            dstar = int(degs_desc[ci])
            n_above = int(cum[ci - 1]) if ci else 0
            n_ties = k - n_above  # smallest ids win within the tie class

            def above(t: pa.Table, dstar=dstar) -> pa.Table:
                d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
                m = d > dstar
                return pa.table({"vertex": t["vertex"].to_numpy(
                    zero_copy_only=False)[m]})

            def at(t: pa.Table, dstar=dstar) -> pa.Table:
                d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
                m = d == dstar
                return pa.table({"vertex": t["vertex"].to_numpy(
                    zero_copy_only=False)[m]})

            hard = deg.map_batches(above, batch_format="pyarrow").to_pandas()
            ties = deg.map_batches(at, batch_format="pyarrow").to_pandas()
            # all-empty map outputs lose their schema in to_pandas
            hv = (hard["vertex"].to_numpy(np.int64)
                  if "vertex" in hard.columns else np.empty(0, np.int64))
            tv = (ties["vertex"].to_numpy(np.int64)
                  if "vertex" in ties.columns else np.empty(0, np.int64))
            tie_ids = np.sort(tv)[:n_ties]
            removed = np.sort(np.concatenate([hv, tie_ids]))
            n_removed = len(removed)
            removed_ref = ray.put(removed)

        def filt(t: pa.Table, ref=removed_ref) -> pa.Table:
            rm = cached_get(ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            if len(rm):
                pa_ = np.searchsorted(rm, a)
                pb_ = np.searchsorted(rm, b)
                ina = (pa_ < len(rm)) & (rm[np.clip(pa_, 0, len(rm) - 1)] == a)
                inb = (pb_ < len(rm)) & (rm[np.clip(pb_, 0, len(rm) - 1)] == b)
                keep = ~(ina | inb)
                a, b = a[keep], b[keep]
            return pa.table({"src": pa.array(a), "dst": pa.array(b)})

        kept = und.map_batches(filt, batch_format="pyarrow").materialize()
        n_edges = kept.count()
        if n_edges == 0:
            rows.append((R, n_removed, 0, 0, 0, 0))
            continue
        g = ShardedGraph.build(kept, num_parts=num_parts, symmetric=True)
        cc = connected_components(g)

        def label_partial(t: pa.Table) -> pa.Table:
            lab = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(lab, return_counts=True)
            return pa.table(
                {
                    "component": u,
                    "n": c.astype(np.int64),
                    "__p": pa.array(part_of(u, num_parts), pa.int32()),
                }
            )

        def fold(t: pa.Table) -> pa.Table:
            lab = t["component"].to_numpy()
            n = t["n"].to_numpy()
            u, inv = np.unique(lab, return_inverse=True)
            sizes = np.bincount(inv, weights=n, minlength=len(u)).astype(
                np.int64
            )
            return pa.table(
                {
                    "n_components": pa.array([np.int64(len(u))]),
                    "giant": pa.array(
                        [np.int64(sizes.max()) if len(sizes) else np.int64(0)]
                    ),
                    "n_vertices": pa.array([np.int64(sizes.sum())]),
                }
            )

        parts = (
            cc.map_batches(label_partial, batch_format="pyarrow")
            .groupby("__p")
            .map_groups(fold, batch_format="pyarrow")
            .to_pandas()
        )
        rows.append(
            (
                R,
                n_removed,
                int(parts["n_vertices"].sum()),
                int(n_edges),
                int(parts["n_components"].sum()),
                int(parts["giant"].max()) if len(parts) else 0,
            )
        )
    return pa.table(
        {
            "remove_pct": pa.array([r[0] for r in rows], pa.int64()),
            "n_removed": pa.array([r[1] for r in rows], pa.int64()),
            "n_vertices": pa.array([r[2] for r in rows], pa.int64()),
            "n_edges": pa.array([r[3] for r in rows], pa.int64()),
            "n_components": pa.array([r[4] for r in rows], pa.int64()),
            "giant_size": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


def community_conductance(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    topn: int = 10,
    num_parts: int = 8,
) -> "pa.Table":
    """Per-community conductance over a (vertex, label) assignment — the
    cut-quality audit modularity doesn't give: for each community S,
    vol(S) = sum of member degrees, cut(S) = edges with exactly one
    endpoint in S, phi = cut/vol (one mirrored ROUND(6) divide; all
    counts exact integers). Communities rank by (n_vertices desc, label),
    top-n; vertices with degree 0 (self-loop-only) are excluded on both
    sides. Works with any label table (LPA, CC, WL colors).

    Scale shape: canonical distinct edge set + degree combiner (one
    cheap-key shuffle), TWO co-partitioned int-key label attaches onto
    edges and one onto degrees, per-partition (label, cut/vol/n) partials,
    driver folds a community-cardinality grid."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.hashing import part_of
    from ..functions.rounding import round_half_away

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"]
    ).materialize()
    lab = labels.materialize()

    def both_ends(t: pa.Table) -> pa.Table:
        v = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        return pa.table({"vertex": v})

    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_parts
    )
    # (vertex, deg, label) for deg>0 vertices
    dl = _attach_value(deg, lab, "vertex", ["deg"], "label", "label",
                       num_parts)

    def vol_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pa.Table.to_pandas(t)
        g = df.groupby("label", sort=False).agg(
            vol=("deg", "sum"), n_vertices=("deg", "size")
        ).reset_index()
        return pa.table(
            {
                "label": g["label"].to_numpy(np.int64),
                "vol": g["vol"].to_numpy(np.int64),
                "n_vertices": g["n_vertices"].to_numpy(np.int64),
                "cut": np.zeros(len(g), np.int64),
            }
        )

    el = _attach_value(und, lab, "a", ["b"], "label", "la", num_parts)
    el = _attach_value(
        el.rename_columns({"a": "oa", "b": "a"}), lab, "a", ["oa", "la"],
        "label", "lb", num_parts,
    ).rename_columns({"a": "b", "oa": "a"})

    def cut_partial(t: pa.Table) -> pa.Table:
        la = t["la"].to_numpy(zero_copy_only=False)
        lb = t["lb"].to_numpy(zero_copy_only=False)
        m = la != lb
        both = np.concatenate([la[m], lb[m]])
        u, c = np.unique(both, return_counts=True)
        z = np.zeros(len(u), np.int64)
        return pa.table(
            {"label": u.astype(np.int64), "vol": z, "n_vertices": z,
             "cut": c.astype(np.int64)}
        )

    parts = (
        dl.map_batches(vol_partial, batch_format="pyarrow")
        .union(el.map_batches(cut_partial, batch_format="pyarrow"))
        .to_pandas()
    )
    if not len(parts):
        return pa.table(
            {
                "label": pa.array([], pa.int64()),
                "n_vertices": pa.array([], pa.int64()),
                "vol": pa.array([], pa.int64()),
                "cut": pa.array([], pa.int64()),
                "conductance": pa.array([], pa.float64()),
            }
        )
    g = parts.groupby("label", sort=True)[["vol", "n_vertices", "cut"]].sum()
    g = g[g["vol"] > 0].reset_index()
    g = g.sort_values(["n_vertices", "label"], ascending=[False, True],
                      kind="stable").head(topn)
    phi = g["cut"].to_numpy(np.float64) / g["vol"].to_numpy(np.float64)
    return pa.table(
        {
            "label": pa.array(g["label"].to_numpy(np.int64)),
            "n_vertices": pa.array(g["n_vertices"].to_numpy(np.int64)),
            "vol": pa.array(g["vol"].to_numpy(np.int64)),
            "cut": pa.array(g["cut"].to_numpy(np.int64)),
            "conductance": pa.array(round_half_away(phi, 6)),
        }
    )
