"""StreamHash / SimHash sketches and similarities (reference H4-H10).

- H4 `construct_streamhash_sketch` (`streamhash.cpp:22-41`):
  projection[i] = sum_shingles count * h_i(shingle); sketch bit i =
  (projection[i] >= 0). Ours is a two-phase additive aggregation
  (SURVEY.md H4): per-batch partial L-vectors inside ``map_batches`` (the
  combiner), then a tiny ``groupby(gid)`` merge — projections are additive,
  so partial+final aggregation is exact, not approximate.
- H5/H8 similarity (`streamhash.cpp:17-20`): fraction of equal bits,
  vectorized with XOR + popcount over bit-packed uint8 sketches.
- H7 exact SimHash: same machinery with an independent hash family — a
  Rademacher variable per (bit, shingle) replaces the reference's dense
  vocab-indexed random vectors (`main.cpp:607-646`), which is the same
  distribution without a global vocabulary build.
- H9 exact cosine of two sparse shingle vectors (`graph.cpp:440-461`).
- H10 all-pairs similarity report (`main.cpp:584-605`) for validation
  corpora (O(n^2): only ever run on small gid sets; the scale path is LSH).

The hash family is built once on the driver and broadcast via ``ray.put``;
every UDF reads it zero-copy from the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import L, hash_family, hashmulti_arrow, hashmulti_batch

_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)


def broadcast_hash_family(chunk_length: int, l: int = L, seed: int = 23):
    """H3: seeded family, ray.put once (SURVEY.md §1.2 hash-family row)."""
    return ray.put(hash_family(chunk_length, l=l, seed=seed))


class _PartialProjection:
    """map_batches combiner: rows (gid, shingle, count) → per-gid partial
    projection vectors for the shingles seen in this batch."""

    def __init__(self, h_ref, l: int):
        # h_ref arrives as [ObjectRef] / (ObjectRef,) (wrapped so Ray does
        # not auto-resolve it at arg time; each worker fetches it zero-copy,
        # memoized per process by cached_get)
        if isinstance(h_ref, (list, tuple)):
            h_ref = h_ref[0]
        from ..functions.proccache import cached_get

        self.H = cached_get(h_ref) if isinstance(h_ref, ray.ObjectRef) else h_ref
        self.l = l

    def __call__(self, batch: pa.Table) -> pa.Table:
        gids = batch["gid"].to_numpy()
        counts = batch["count"].to_numpy()
        signs = hashmulti_arrow(batch["shingle"], self.H)  # (n, L) ±1
        contrib = signs.astype(np.int64) * counts[:, None]
        order = np.argsort(gids, kind="stable")
        gs, cs = gids[order], contrib[order]
        starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
        sums = np.add.reduceat(cs, starts, axis=0)
        return pa.table(
            {
                "gid": pa.array(gs[starts], pa.int64()),
                "projection": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.int64()), self.l
                ),
            }
        )


def pack_sketch(projection: np.ndarray) -> np.ndarray:
    """Sign vector → bit-packed uint8[l/8]; bit i set iff projection[i]>=0."""
    return np.packbits((projection >= 0).astype(np.uint8), axis=-1)


def construct_streamhash_sketches(
    shingles: ray.data.Dataset, chunk_length: int, l: int = L, seed: int = 23
) -> ray.data.Dataset:
    """H4 over all gids → (gid, projection: fsl<int64,l>, sketch: binary).

    Shuffle volume after the combiner is O(#gids-per-batch × l), never
    O(#shingle-rows × l).
    """
    h_ref = broadcast_hash_family(chunk_length, l=l, seed=seed)
    # task-based with a per-process singleton: the state (one ray.get of
    # the broadcast family) is too cheap to justify actor-pool cold-starts
    # (~2 s per execution measured; see functions/proccache.py)
    from functools import partial as _partial

    from ..functions.proccache import call_singleton

    partials = shingles.map_batches(
        _partial(call_singleton, _PartialProjection, (h_ref,), l),
        batch_format="pyarrow",
        batch_size=8192,
    )

    def merge(g: pa.Table) -> pa.Table:
        gid = g["gid"][0].as_py()
        mat = np.stack(
            [np.asarray(x, dtype=np.int64) for x in g["projection"].to_pylist()]
        )
        proj = mat.sum(axis=0)
        return pa.table(
            {
                "gid": pa.array([gid], pa.int64()),
                "projection": pa.FixedSizeListArray.from_arrays(
                    pa.array(proj, pa.int64()), l
                ),
                "sketch": pa.array([pack_sketch(proj).tobytes()], pa.binary()),
            }
        )

    return partials.groupby("gid").map_groups(merge, batch_format="pyarrow")


def streamhash_similarity_np(s1: np.ndarray, s2: np.ndarray, l: int = L) -> np.ndarray:
    """H5 vectorized: fraction of equal bits between packed sketch rows.

    s1, s2: uint8 arrays (..., l/8). Trailing pad bits (l % 8) cancel out
    because both sketches pack the same positions.
    """
    neq = _POPCNT[np.bitwise_xor(s1, s2)].sum(axis=-1)
    return 1.0 - neq / l


def sketch_angular_distance(sim: np.ndarray) -> np.ndarray:
    """The reference's cosine transform of bit agreement:
    cos(pi * (1 - sim)) (`main.cpp:260-262`, `cluster.cpp:124-126`)."""
    return np.cos(np.pi * (1.0 - sim))


def construct_simhash_sketches(
    shingles: ray.data.Dataset, chunk_length: int, l: int = L, seed: int = 101
) -> ray.data.Dataset:
    """H6+H7: exact SimHash — independent Rademacher family (seed differs
    from StreamHash's) applied to the full shingle vectors."""
    return construct_streamhash_sketches(shingles, chunk_length, l=l, seed=seed)


def cosine_similarity_sparse(
    v1: dict[str, int], v2: dict[str, int]
) -> float:
    """H9: exact cosine of two sparse shingle vectors (graph.cpp:440-461)."""
    dot = sum(c * v2.get(s, 0) for s, c in v1.items())
    n1 = np.sqrt(sum(c * c for c in v1.values()))
    n2 = np.sqrt(sum(c * c for c in v2.values()))
    if n1 == 0 or n2 == 0:
        return 0.0
    sim = dot / (n1 * n2)
    assert -1e-9 <= sim <= 1 + 1e-9
    return float(min(max(sim, 0.0), 1.0))


def compute_similarities(
    shingles: ray.data.Dataset,
    sketches: ray.data.Dataset,
    l: int = L,
    simhash_sketches: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """H10: all-pairs validation report mirroring the reference's full
    column set (`main.cpp:584-605`): per pair (gid_a < gid_b) the exact
    sparse cosine, the angular similarity 1-acos(cosine)/pi, the StreamHash
    bit-agreement + its cos(pi*(1-sim)) estimate and the estimate's error
    vs angular; when `simhash_sketches` is given (the seed-101 exact
    SimHash family, H6/H7) also simhash_sim + simhash_est.

    Cartesian over gids — the small-side is collected and broadcast; only
    for validation corpora (the reference's dead batch path). The
    production similarity path is stages/lsh.py.
    """
    import pandas as pd

    sh = shingles.to_pandas()
    vecs: dict[int, dict[str, int]] = {}
    for gid, grp in sh.groupby("gid"):
        vecs[int(gid)] = dict(zip(grp["shingle"], grp["count"]))
    sk = sketches.to_pandas()
    sk_map = {
        int(g): np.frombuffer(b, dtype=np.uint8)
        for g, b in zip(sk["gid"], sk["sketch"])
    }
    sim_map: dict[int, np.ndarray] | None = None
    if simhash_sketches is not None:
        sm = simhash_sketches.to_pandas()
        sim_map = {
            int(g): np.frombuffer(b, dtype=np.uint8)
            for g, b in zip(sm["gid"], sm["sketch"])
        }
    gids = sorted(vecs)
    rows = []
    for i, a in enumerate(gids):
        for b in gids[i + 1 :]:
            cos = cosine_similarity_sparse(vecs[a], vecs[b])
            ang = 1.0 - np.arccos(min(cos, 1.0)) / np.pi
            ssim = float(streamhash_similarity_np(sk_map[a], sk_map[b], l))
            est = float(sketch_angular_distance(np.float64(ssim)))
            row = {
                "gid_a": a,
                "gid_b": b,
                "cosine": cos,
                "angular": float(ang),
                "streamhash_sim": ssim,
                "streamhash_est": est,
                "streamhash_err": float(ssim - ang),
            }
            if sim_map is not None:
                hsim = float(streamhash_similarity_np(sim_map[a], sim_map[b], l))
                row["simhash_sim"] = hsim
                row["simhash_est"] = float(sketch_angular_distance(np.float64(hsim)))
            rows.append(row)
    return ray.data.from_pandas(pd.DataFrame(rows))
