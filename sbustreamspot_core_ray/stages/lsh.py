"""LSH banding + co-bucket analytics (reference C1-C4).

The reference's B hash tables keyed by R-bit bands (`cluster.cpp:23-42`,
`main.cpp:88`) become ONE relational table of rows
``(gid: int64, band_idx: int32, band_value: int64)`` — bucket membership is
just a groupby key, the anomaly test (C2, `cluster.cpp:44-57`) is an
anti-join, shared-bucket lookup (C3, `cluster.cpp:59-74`) is a semi-join,
and the reference's BFS bucket clustering (C4, `main.cpp:672-721`) is
connected components over the co-bucket pair graph, run on the superstep
engine.

Deviation from the reference, documented: param.h sets B=100, R=20 with
L=1000, but `hash_bands` (`cluster.cpp:29-41`) shifts by R*i for i<B, so
bands 50..99 read past the 1000-bit sketch and are identically zero — every
graph trivially co-buckets in them, which defeats the band test. We use the
consistent B = L/R = 50 real bands by default (b/r remain parameters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import B, L, R, part_of


def _distinct(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Native vectorized distinct (groupby-count, no per-group Python)."""
    return ds.groupby(cols).count().drop_columns(["count()"])


class _BandStage:
    """C1 vectorized: packed sketch → B (gid, band_idx, band_value) rows."""

    def __init__(self, b: int, r: int, l: int):
        assert b * r == l
        self.b, self.r, self.l = b, r, l
        self.pow2 = (1 << np.arange(r, dtype=np.int64))[::-1].copy()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        gids = batch["gid"].to_numpy()
        raw = np.frombuffer(
            b"".join(batch["sketch"].to_pylist()), dtype=np.uint8
        ).reshape(n, -1)
        bits = np.unpackbits(raw, axis=1)[:, : self.l]  # (n, L)
        bands = bits.reshape(n, self.b, self.r).astype(np.int64) @ self.pow2
        return pa.table(
            {
                "gid": np.repeat(gids, self.b),
                "band_idx": np.tile(np.arange(self.b, dtype=np.int64), n),
                "band_value": bands.ravel(),
            }
        )


def hash_bands(
    sketches: ray.data.Dataset, b: int = L // R, r: int = R, l: int = L
) -> ray.data.Dataset:
    """C1: sketch table → band table (the LSH 'index' as data, not pointers)."""
    return sketches.select_columns(["gid", "sketch"]).map_batches(
        _BandStage,
        fn_constructor_kwargs={"b": b, "r": r, "l": l},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )


def isolated_gids(
    query_bands: ray.data.Dataset,
    index_bands: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """C2 `is_isolated` as an anti-join: a gid is anomalous iff NONE of its
    B band buckets exists in the index (`cluster.cpp:44-57`).

    Returns (gid, isolated: bool). Distinct index buckets first so the join
    build side is bounded by the bucket count, not the gid count."""
    idx = _distinct(
        index_bands.select_columns(["band_idx", "band_value"]),
        ["band_idx", "band_value"],
    ).map_batches(
        lambda t: t.append_column("hit", pa.array(np.ones(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )
    probed = query_bands.join(
        idx,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("band_idx", "band_value"),
    )

    def fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t["gid"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = (
            pc.fill_null(t["hit"], 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(g, kind="stable")
        gs, hs = g[order], hit[order]
        starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
        return pa.table(
            {
                "gid": pa.array(gs[starts], pa.int64()),
                "hits": pa.array(np.maximum.reduceat(hs, starts)),
            }
        )

    agg = (
        probed.map_batches(fold, batch_format="pyarrow")
        .groupby("gid")
        .max("hits")
        .rename_columns({"max(hits)": "hits"})
    )
    def mark(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"gid": t["gid"], "isolated": pc.equal(t["hits"], 0)})

    return agg.map_batches(mark, batch_format="pyarrow")


def shared_bucket_pairs(
    bands: ray.data.Dataset, num_parts: int = 32, id_col: str = "gid"
) -> ray.data.Dataset:
    """C3/C4 support: co-bucket pair edges (src, dst) — for each bucket,
    star edges from the minimum member to the others (sufficient for
    connectivity, avoids the O(k^2) clique blow-up on hot buckets).

    One shuffle on hash(band key) % num_parts; pair generation is a
    vectorized numpy run-scan per partition (no per-bucket Python)."""

    def tag(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "band_idx", "band_value"])
        with np.errstate(over="ignore"):
            mixed = t["band_idx"].to_numpy().astype(np.uint64) * np.uint64(
                0x9E3779B97F4A7C15
            ) + t["band_value"].to_numpy().astype(np.uint64)
        return t.append_column("kp", pa.array(part_of(mixed, num_parts), pa.int32()))

    def pairs(t: pa.Table) -> pa.Table:
        bi = t["band_idx"].to_numpy()
        bv = t["band_value"].to_numpy()
        gid = t[id_col].to_numpy(zero_copy_only=False)
        keys = np.stack([bi.astype(np.int64), bv, gid], axis=1)
        keys = np.unique(keys, axis=0)  # sorts by (band_idx, band_value, gid)
        bi, bv, gid = keys[:, 0], keys[:, 1], keys[:, 2]
        starts = np.concatenate([[True], (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])])
        run_id = np.cumsum(starts) - 1
        firsts = gid[starts][run_id]  # min gid of each bucket, broadcast
        mask = ~starts
        return pa.table({"src": firsts[mask], "dst": gid[mask]})

    return (
        bands.map_batches(tag, batch_format="pyarrow")
        .groupby("kp")
        .map_groups(pairs, batch_format="pyarrow")
    )


def shared_bucket_gids(
    query_bands: ray.data.Dataset,
    index_bands: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """C3: distinct gids sharing >=1 band bucket with the query's bands
    (semi-join, `cluster.cpp:59-74`). Returns (gid)."""
    q = _distinct(
        query_bands.select_columns(["band_idx", "band_value"]),
        ["band_idx", "band_value"],
    )
    hit = index_bands.join(
        q, join_type="inner", num_partitions=num_partitions, on=("band_idx", "band_value")
    )
    return _distinct(hit.select_columns(["gid"]), ["gid"])


def lsh_clusters(
    sketches: ray.data.Dataset,
    num_parts: int = 8,
    b: int = L // R,
    r: int = R,
    l: int = L,
    small_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """C4 `print_lsh_clusters`: connected components over the co-bucket
    relation (`main.cpp:672-721`). Returns (gid, cluster) where cluster =
    min gid of the component; singletons keep their own gid.

    Regime split: when the pair table AND the gid count fit the driver
    (<= small_threshold rows), a vectorized driver-side components pass
    replaces the ShardedGraph actor pool — the pool's fixed build cost
    dwarfs a toy graph. Large graphs take the superstep engine."""
    sketches = sketches.materialize()  # consumed by bands AND the gid list
    bands = hash_bands(sketches, b=b, r=r, l=l)
    pairs = shared_bucket_pairs(bands).materialize()
    singles = sketches.select_columns(["gid"]).materialize()
    if pairs.count() <= small_threshold and singles.count() <= small_threshold:
        from ..pipelines.superstep import driver_components

        pt = pairs.to_pandas()
        vs, comp = driver_components(
            pt["src"].to_numpy(), pt["dst"].to_numpy(),
            singles.to_pandas()["gid"].to_numpy(np.int64),
        )
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table({"gid": pa.array(vs), "cluster": pa.array(comp)})
        )
    from ..pipelines.superstep import ShardedGraph, connected_components

    # self-loops register isolated gids as vertices of the CC graph
    loops = singles.map_batches(
        lambda t: pa.table({"src": t["gid"], "dst": t["gid"]}),
        batch_format="pyarrow",
    )
    g = ShardedGraph.build(pairs.union(loops), num_parts=num_parts, symmetric=True)
    return connected_components(g).rename_columns(
        {"vertex": "gid", "component": "cluster"}
    )
