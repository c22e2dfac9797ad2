"""F1: shingle feature extraction (reference `graph.cpp:80-133`, K=1).

Semantics re-expressed as dataflow: for each (gid, source node) the
reference walks the source's out-edges in timestamp order and builds the
string ``' ' + src_type + concat(e_type + dst_type per out-edge)``; the
string is split into fixed-length chunks (M5, `graph.cpp:432-438`, last
chunk ragged) and chunk frequencies are accumulated per graph.

Ours: ``groupby("gid").map_groups`` (each gid's graph is small by the
reference's own model — per-graph state is gid-local, SURVEY.md §1.1), with
a numpy sort by (src, src_type, seq) inside the group. Order-sensitivity
warning from SURVEY.md §7.4: the shingle string depends on seq order within
each source — the sort is mandatory, a bare groupby order would silently
change shingles.

Output: long-form ``(gid: int64, shingle: string, count: int64)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def get_string_chunks(s: str, chunk_length: int) -> list[str]:
    """M5: split into chunk_length pieces, last one ragged."""
    return [s[i : i + chunk_length] for i in range(0, len(s), chunk_length)]


def shingles_for_group(g: pd.DataFrame, chunk_length: int) -> dict[str, int]:
    """Chunk→count map for one gid (test/bootstrap-scale reference form —
    the dataflow path uses the vectorized `_chunk_counts_table`)."""
    t = _chunk_counts_table(g, chunk_length)
    return dict(zip(t["shingle"].to_pylist(), t["shingle_count"].to_pylist()))


def _chunk_counts_table(g: pd.DataFrame, C: int) -> pa.Table:
    """Fully vectorized F1: per-(src,src_type) traversal strings built by a
    numpy byte scatter, chunk boundaries derived arithmetically, the chunk
    column materialized as ONE Arrow string array over the shared byte
    buffer (no per-string Python), counted by Arrow group_by.

    Type bytes must be ASCII (<128) so the buffer is valid UTF-8 — true by
    construction (types come from ord(single_char))."""
    order = np.lexsort(
        (g["seq"].to_numpy(), g["src_type"].to_numpy(), g["src"].to_numpy())
    )
    src = g["src"].to_numpy()[order]
    stype = g["src_type"].to_numpy()[order].astype(np.uint8)
    etype = g["e_type"].to_numpy()[order].astype(np.uint8)
    dtype_ = g["dst_type"].to_numpy()[order].astype(np.uint8)
    n = len(src)
    first = np.concatenate(
        [[True], (src[1:] != src[:-1]) | (stype[1:] != stype[:-1])]
    )
    run_starts = np.flatnonzero(first)
    nruns = len(run_starts)
    run_len = np.diff(np.concatenate([run_starts, [n]]))
    m = 2 + 2 * run_len  # per-run string length: ' ' + stype + (etype dtype)*
    S = np.concatenate([[0], np.cumsum(m)])  # run string offsets
    M = int(S[-1])
    buf = np.empty(M, np.uint8)
    buf[S[:-1]] = 0x20  # ' '
    buf[S[:-1] + 1] = stype[run_starts]
    rep = np.repeat(np.arange(nruns), run_len)
    within = np.arange(n) - run_starts[rep]
    pos = S[:-1][rep] + 2 + 2 * within
    buf[pos] = etype
    buf[pos + 1] = dtype_
    # chunk starts tile the buffer exactly (runs are contiguous), so the
    # Arrow offsets vector is just every chunk start plus the final M
    n_chunks = (m + C - 1) // C
    K = int(n_chunks.sum())
    crep = np.repeat(np.arange(nruns), n_chunks)
    cwithin = np.arange(K) - np.concatenate([[0], np.cumsum(n_chunks)])[crep]
    offsets = np.concatenate([S[:-1][crep] + C * cwithin, [M]]).astype(np.int32)
    chunks = pa.Array.from_buffers(
        pa.utf8(),
        K,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )
    return pa.table({"shingle": chunks}).group_by("shingle").aggregate(
        [("shingle", "count")]
    )


def construct_shingle_vectors(
    edges: ray.data.Dataset, chunk_length: int
) -> ray.data.Dataset:
    """F1/F2 batch recompute over all gids → (gid, shingle, count) rows.

    The reference asserts incremental == batch recompute
    (`graph.cpp:346-363`); the batch form is the canonical semantics here
    and the incremental actor path must match it (tests/test_streamspot).
    """

    def per_gid(g: pa.Table) -> pa.Table:
        t = _chunk_counts_table(g, chunk_length)
        gid = g["gid"][0].as_py()
        return pa.table(
            {
                "gid": pa.array(np.full(t.num_rows, gid, np.int64)),
                "shingle": t["shingle"],
                "count": t["shingle_count"].cast(pa.int64()),
            }
        )

    return edges.groupby("gid").map_groups(per_gid, batch_format="pyarrow")
