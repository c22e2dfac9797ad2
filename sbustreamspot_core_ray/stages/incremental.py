"""F3 incremental StreamHash sketch maintenance (reference
`graph.cpp:262-430`), re-expressed as a gid-hash-partitioned actor pool.

The reference appends one edge, derives which fixed-length chunks of the
source's traversal string changed (only the last chunk can change, plus
newly created chunks — the case analysis at `graph.cpp:239-261`), and
updates the projection by ±hashmulti(chunk). Ours applies the same delta
rule per BATCH of edges: chars are appended per (gid, src), outgoing = the
previously-partial last chunk, incoming = all chunks covering the appended
region; all delta chunks across the batch are hashed in ONE vectorized
hashmulti call and scatter-added into the per-gid projections.

Sliding-window eviction (W1, reference `graph.cpp:39-78`) is a per-SOURCE
delta: evicting a source's oldest edges shifts every later character of its
traversal string, so the source's old chunks all leave and its new chunks
all arrive — O(evicted-source string length), not O(graph). A lazy min-heap
of (oldest seq, key) finds affected sources without scanning all state.

Parity contract (the reference's own DEBUG assertion, `graph.cpp:346-363`):
after any prefix of the stream — and, with eviction, after any window — the
incremental projections EXACTLY equal the batch recompute
(`stages/sketch.construct_streamhash_sketches`) over the same active edges;
projections are integer vectors, so the equality is exact, not approximate.
tests/test_incremental.py and tests/test_streamspot_pipeline.py enforce it.

Scale shape: state is per-gid and partitioned by hash(gid) % P across the
actor pool; edges must be fed in per-source seq order (the stream order,
W2). The windowed scoring pipeline (`pipelines/streamspot.score_stream`)
holds ALL per-gid L-vectors here — the driver keeps only centroids and
scalar per-gid outputs.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray

from ..functions.hashing import L, hash_family, hashmulti_batch, part_of


@ray.remote(num_cpus=0)
class IncrementalSketchShard:
    """Holds per-gid incremental sketch state for gids with
    hash(gid) % P == part."""

    def __init__(self, part: int, num_parts: int, chunk_length: int,
                 l: int = L, seed: int = 23):
        self.part = part
        self.P = num_parts
        self.C = chunk_length
        self.l = l
        self.H = hash_family(chunk_length, l=l, seed=seed)
        # (gid, src) -> bytearray of the traversal string (' ' + stype +
        # (etype dtype)*); gid -> projection int64[l]
        self.strings: dict[tuple[int, int], bytearray] = {}
        self.seqs: dict[tuple[int, int], list[int]] = {}
        self.proj: dict[int, np.ndarray] = {}
        # window bookkeeping: gids modified since the last window_result()
        # and their projection at first touch (for exact centroid deltas)
        self._touched: set[int] = set()
        self._old: dict[int, np.ndarray] = {}
        # lazy min-heap of (oldest seq, key) for eviction
        self._heap: list[tuple[int, tuple[int, int]]] = []

    def _touch(self, g: int) -> None:
        if g not in self._old:
            self._old[g] = (
                self.proj[g].copy() if g in self.proj else np.zeros(self.l, np.int64)
            )
        self._touched.add(g)

    def _chunks_of(self, s: bytearray) -> list[str]:
        C = self.C
        return [s[lo : lo + C].decode("utf-8") for lo in range(0, len(s), C)]

    def add_edges(self, t: pa.Table) -> int:
        """Append a batch of edges (MUST arrive in seq order per source —
        the caller routes stream-ordered batches)."""
        gid = t["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        stype = t["src_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
        etype = t["e_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
        dtype_ = t["dst_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
        seq = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        C = self.C
        out_chunks: list[str] = []   # -1 occurrences
        out_gids: list[int] = []
        in_chunks: list[str] = []    # +1 occurrences
        in_gids: list[int] = []
        # group consecutive rows of the same (gid, src) so a burst of
        # appends computes its delta once
        n = len(gid)
        i = 0
        while i < n:
            j = i
            while j < n and gid[j] == gid[i] and src[j] == src[i]:
                j += 1
            key = (int(gid[i]), int(src[i]))
            s = self.strings.get(key)
            if s is None:
                s = bytearray((0x20, int(stype[i])))
                self.strings[key] = s
                self.seqs[key] = []
                heapq.heappush(self._heap, (int(seq[i]), key))
                m0 = 0  # whole string is new
            else:
                m0 = len(s)
            ks = self.seqs[key]
            for k in range(i, j):
                s.append(int(etype[k]))
                s.append(int(dtype_[k]))
                ks.append(int(seq[k]))
            m1 = len(s)
            g = key[0]
            self._touch(g)
            if g not in self.proj:
                self.proj[g] = np.zeros(self.l, np.int64)
            # delta chunks: the old partial last chunk (if any) leaves,
            # every chunk covering [start, m1) arrives
            if m0 % C != 0 and m0 > 0:
                lo0 = (m0 // C) * C
                out_chunks.append(s[lo0:m0].decode("utf-8"))
                out_gids.append(g)
            first = (m0 // C) * C if m0 else 0
            for lo in range(first, m1, C):
                in_chunks.append(s[lo : lo + C].decode("utf-8"))
                in_gids.append(g)
            i = j
        self._apply(out_chunks, out_gids, in_chunks, in_gids)
        return n

    def evict_before(self, seq_lo: int) -> int:
        """W1 delta-eviction: drop every edge with seq < seq_lo. Affected
        sources subtract their whole old string's chunks and add the
        rebuilt string's chunks (prefix removal shifts every character, so
        per-source full re-chunk IS the minimal delta). Returns the number
        of evicted edges."""
        out_chunks: list[str] = []
        out_gids: list[int] = []
        in_chunks: list[str] = []
        in_gids: list[int] = []
        evicted = 0
        while self._heap and self._heap[0][0] < seq_lo:
            first, key = heapq.heappop(self._heap)
            ks = self.seqs.get(key)
            if ks is None:
                continue  # stale entry: key fully evicted earlier
            if not ks or ks[0] != first:
                if ks:
                    heapq.heappush(self._heap, (ks[0], key))
                continue
            m = 0
            while m < len(ks) and ks[m] < seq_lo:
                m += 1
            if m == 0:
                heapq.heappush(self._heap, (ks[0], key))
                continue
            g = key[0]
            self._touch(g)
            s = self.strings[key]
            for c in self._chunks_of(s):
                out_chunks.append(c)
                out_gids.append(g)
            del ks[:m]
            evicted += m
            if ks:
                del s[2 : 2 + 2 * m]  # drop the evicted (etype, dtype) pairs
                for c in self._chunks_of(s):
                    in_chunks.append(c)
                    in_gids.append(g)
                heapq.heappush(self._heap, (ks[0], key))
            else:
                # source emptied: its entire string (header included) leaves
                del self.strings[key]
                del self.seqs[key]
        self._apply(out_chunks, out_gids, in_chunks, in_gids)
        return evicted

    def _apply(self, out_chunks, out_gids, in_chunks, in_gids) -> None:
        """One vectorized hash call per delta direction for the whole batch."""
        if out_chunks:
            signs = hashmulti_batch(out_chunks, self.H).astype(np.int64)
            for g, row in zip(out_gids, signs):
                self.proj[g] -= row
        if in_chunks:
            signs = hashmulti_batch(in_chunks, self.H).astype(np.int64)
            for g, row in zip(in_gids, signs):
                self.proj[g] += row

    def _state_table(self, gids: list[int], with_old: bool) -> pa.Table:
        from .sketch import pack_sketch

        projs = [self.proj[g] for g in gids]
        cols = {
            "gid": pa.array(gids, pa.int64()),
            "projection": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.concatenate(projs) if projs else np.empty(0, np.int64),
                    pa.int64(),
                ),
                self.l,
            ),
            "sketch": pa.array(
                [pack_sketch(p).tobytes() for p in projs], pa.binary()
            ),
        }
        if with_old:
            olds = [self._old[g] for g in gids]
            cols["old_projection"] = pa.FixedSizeListArray.from_arrays(
                pa.array(
                    np.concatenate(olds) if olds else np.empty(0, np.int64),
                    pa.int64(),
                ),
                self.l,
            )
        return pa.table(cols)

    def window_result(self) -> pa.Table:
        """(gid, projection, sketch, old_projection) for every gid modified
        since the previous call; clears the window bookkeeping."""
        gids = sorted(self._touched)
        t = self._state_table(gids, with_old=True)
        self._touched = set()
        self._old = {}
        return t

    def sketches(self) -> pa.Table:
        return self._state_table(sorted(self.proj), with_old=False)

    # -- checkpoint/resume (per-shard state as opaque bytes; the driver
    # owns placement so the layout matches the superstep checkpoints) -----

    def dump_state(self) -> bytes:
        import pickle

        return pickle.dumps(
            {
                "strings": {k: bytes(v) for k, v in self.strings.items()},
                "seqs": self.seqs,
                "proj": self.proj,
                "heap": self._heap,
            }
        )

    def load_state(self, blob: bytes) -> int:
        import pickle

        st = pickle.loads(blob)
        self.strings = {k: bytearray(v) for k, v in st["strings"].items()}
        self.seqs = st["seqs"]
        self.proj = st["proj"]
        self._heap = st["heap"]
        self._touched = set()
        self._old = {}
        return len(self.proj)


class IncrementalSketcher:
    """Actor-pool front: routes stream-ordered edge batches to the owning
    shard (hash(gid) % P), drives windowed eviction, and collects state."""

    def __init__(self, num_parts: int, chunk_length: int, l: int = L,
                 seed: int = 23):
        self.P = num_parts
        self.shards = [
            IncrementalSketchShard.remote(p, num_parts, chunk_length, l, seed)
            for p in range(num_parts)
        ]

    def feed(self, t: pa.Table) -> None:
        """Route one stream-ordered batch. Waits for application so the
        next batch cannot overtake (per-shard FIFO would suffice for a
        single feeder; the barrier also covers multiple feeders)."""
        gid = t["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = part_of(gid, self.P)
        pending = []
        for p in np.unique(parts):
            pending.append(self.shards[p].add_edges.remote(t.filter(pa.array(parts == p))))
        ray.get(pending)

    def evict_before(self, seq_lo: int) -> int:
        return sum(ray.get([s.evict_before.remote(seq_lo) for s in self.shards]))

    def window_result(self) -> pa.Table:
        tables = ray.get([s.window_result.remote() for s in self.shards])
        return pa.concat_tables(tables)

    def sketches(self) -> pa.Table:
        """Full state dump — inspection/tests only (O(#gids x L) on the
        driver); the scoring pipeline consumes per-window `window_result`."""
        tables = ray.get([s.sketches.remote() for s in self.shards])
        return pa.concat_tables([t for t in tables if t.num_rows])

    def dump_states(self) -> list[bytes]:
        return ray.get([s.dump_state.remote() for s in self.shards])

    def load_states(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.P, "shard count changed between runs"
        ray.get(
            [s.load_state.remote(b) for s, b in zip(self.shards, blobs)]
        )
