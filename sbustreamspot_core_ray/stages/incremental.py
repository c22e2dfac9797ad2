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

Parity contract (the reference's own DEBUG assertion, `graph.cpp:346-363`):
after any prefix of the stream, the incremental projections EXACTLY equal
the batch recompute (`stages/sketch.construct_streamhash_sketches`) over
the same edges — tests/test_incremental.py enforces it.

Scale shape: state is per-gid and partitioned by hash(gid) % P across the
actor pool; edges must be fed in per-source seq order (the stream order,
W2). Append-only — sliding-window eviction uses the batch-recompute path
(W1, `pipelines/streamspot.score_stream`), which the parity contract makes
equivalent.
"""

from __future__ import annotations

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
        self.proj: dict[int, np.ndarray] = {}

    def add_edges(self, t: pa.Table) -> int:
        """Append a batch of edges (MUST arrive in seq order per source —
        the caller routes stream-ordered batches)."""
        gid = t["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        stype = t["src_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
        etype = t["e_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
        dtype_ = t["dst_type"].to_numpy(zero_copy_only=False).astype(np.uint8)
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
                m0 = 0  # whole string is new
            else:
                m0 = len(s)
            for k in range(i, j):
                s.append(int(etype[k]))
                s.append(int(dtype_[k]))
            m1 = len(s)
            g = key[0]
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
        # one vectorized hash call for every delta chunk in the batch
        if out_chunks:
            signs = hashmulti_batch(out_chunks, self.H).astype(np.int64)
            for g, row in zip(out_gids, signs):
                self.proj[g] -= row
        if in_chunks:
            signs = hashmulti_batch(in_chunks, self.H).astype(np.int64)
            for g, row in zip(in_gids, signs):
                self.proj[g] += row
        return n

    def sketches(self) -> pa.Table:
        gids = sorted(self.proj)
        projs = [self.proj[g] for g in gids]
        from .sketch import pack_sketch

        return pa.table(
            {
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
        )


class IncrementalSketcher:
    """Actor-pool front: routes stream-ordered edge batches to the owning
    shard (hash(gid) % P) and collects the final sketch table."""

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

    def sketches(self) -> pa.Table:
        tables = ray.get([s.sketches.remote() for s in self.shards])
        return pa.concat_tables([t for t in tables if t.num_rows])
