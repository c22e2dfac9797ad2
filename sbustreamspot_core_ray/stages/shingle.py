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

import ray.data


def get_string_chunks(s: str, chunk_length: int) -> list[str]:
    """M5: split into chunk_length pieces, last one ragged."""
    return [s[i : i + chunk_length] for i in range(0, len(s), chunk_length)]


def shingles_for_group(g: pd.DataFrame, chunk_length: int) -> dict[str, int]:
    """Chunk→count map for one gid (the reference's temp shingle vector)."""
    g = g.sort_values(["src", "src_type", "seq"], kind="stable")
    src = g["src"].to_numpy()
    stype = g["src_type"].to_numpy()
    etype = g["e_type"].to_numpy()
    dtype_ = g["dst_type"].to_numpy()
    counts: dict[str, int] = {}
    # boundaries of each (src, src_type) run
    key_change = np.flatnonzero(
        np.concatenate([[True], (src[1:] != src[:-1]) | (stype[1:] != stype[:-1])])
    )
    bounds = np.concatenate([key_change, [len(src)]])
    for i in range(len(key_change)):
        lo, hi = bounds[i], bounds[i + 1]
        parts = [" ", chr(stype[lo])]
        for j in range(lo, hi):
            parts.append(chr(etype[j]))
            parts.append(chr(dtype_[j]))
        shingle = "".join(parts)
        for chunk in get_string_chunks(shingle, chunk_length):
            counts[chunk] = counts.get(chunk, 0) + 1
    return counts


def construct_shingle_vectors(
    edges: ray.data.Dataset, chunk_length: int
) -> ray.data.Dataset:
    """F1/F2 batch recompute over all gids → (gid, shingle, count) rows.

    The reference asserts incremental == batch recompute
    (`graph.cpp:346-363`); the batch form is the canonical semantics here
    and the incremental actor path must match it (tests/test_streamspot).
    """

    def per_gid(g: pd.DataFrame) -> pd.DataFrame:
        counts = shingles_for_group(g, chunk_length)
        gid = int(g["gid"].iloc[0])
        return pd.DataFrame(
            {
                "gid": np.full(len(counts), gid, np.int64),
                "shingle": list(counts.keys()),
                "count": np.fromiter(counts.values(), np.int64, len(counts)),
            }
        )

    return edges.groupby("gid").map_groups(per_gid, batch_format="pandas")
