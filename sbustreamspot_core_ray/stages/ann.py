"""Similarity search over the `embeddings` table (list<float> column).

- brute-force cosine top-k: the baseline — numpy matmul per batch against a
  broadcast query matrix (`ray.put` once, read zero-copy in every task),
  per-batch partial top-k, tiny final merge. One pass, no shuffle.
- IVF (inverted-file) variant: the scale path — k-means-ish coarse
  centroids (seeded sample), vectors bucketed by nearest centroid
  (groupby), queries probe only the nearest n_probe buckets.
- embedding-cosine near-dup: all-pairs within LSH-ish buckets (random
  hyperplane signs) → pairs above a cosine threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _mat(batch_col, dtype=np.float32) -> np.ndarray:
    """(n, d) matrix from a list<float> / fixed_size_list<float> column —
    flatten + reshape (zero-copy from Arrow when dtypes line up), never a
    per-row Python materialization."""
    col = (
        batch_col.combine_chunks()
        if isinstance(batch_col, pa.ChunkedArray)
        else batch_col
    )
    n = len(col)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if n and flat.size % n == 0:
        # divisibility alone is not proof of rectangularity (rows of lengths
        # 2 and 4 divide evenly but would reshape misaligned) — require a
        # fixed_size_list type or uniform offsets before the zero-copy path
        if pa.types.is_fixed_size_list(col.type):
            return flat.astype(dtype, copy=False).reshape(n, -1)
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        if (np.diff(offsets) == flat.size // n).all():
            return flat.astype(dtype, copy=False).reshape(n, -1)
    return np.stack([np.asarray(v, dtype) for v in col.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# ---- integer-quantized exact-parity arithmetic ---------------------------
# float32 embeddings quantized as floor(x*2^16 + 0.5) give integer-valued
# float64 vectors whose dots and squared norms are EXACT in float64 for
# d <= ~1000 (|q| < 2^19 -> products < 2^38, sums < 2^48 < 2^53): any
# summation order — numpy SIMD-pairwise or SQL sequential — yields the
# identical value. cosine is then the fixed 4-op IEEE expression
# dot / (sqrt(na) * sqrt(nb)), bit-identical between numpy elementwise ops
# and DuckDB scalar ops. This turns float sum-order parity (the round-2
# hash failures) into integer parity.

QUANT_SCALE = 65536.0  # 2^16: x*scale is exact (power of two), then +0.5/floor


def quantize(m, scale: float = QUANT_SCALE) -> np.ndarray:
    """floor(x*scale + 0.5) as integer-valued float64 (SQL-mirrorable:
    ``floor(CAST(x AS DOUBLE) * scale + 0.5)``)."""
    return np.floor(np.asarray(m, np.float64) * scale + 0.5)


def exact_cosine(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """(nA, nB) cosine matrix of integer-valued float64 rows via the fixed
    expression dot / (sqrt(na) * sqrt(nb)) — each output element is one
    exact dot, two correctly-rounded sqrts, one multiply, one divide, so it
    is bit-identical to DuckDB's
    ``list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) * sqrt(list_dot_product(b,b)))``.
    Zero vectors get cosine 0 (guarded denominator)."""
    dots = A @ B.T
    na = np.sqrt((A * A).sum(axis=1))
    nb = np.sqrt((B * B).sum(axis=1))
    denom = na[:, None] * nb[None, :]
    denom[denom == 0] = 1.0
    return dots / denom


class _BruteTopK:
    """Per-batch partial top-k against the broadcast query matrix.

    dtype float32 by default (the scale path); quantize_scale switches to
    the integer-quantized exact-parity kernel (bit-identical to the SQL
    oracle, with deterministic (cosine desc, vec_id asc) tie-breaks)."""

    def __init__(self, q_ref, k: int, dtype=np.float32, quantize_scale=None):
        q = ray.get(q_ref[0]) if isinstance(q_ref, list) else ray.get(q_ref)
        self.dtype = dtype
        self.qscale = quantize_scale
        if quantize_scale:
            self.q = quantize(np.asarray(q, np.float64), quantize_scale)
        else:
            self.q = _normalize(np.asarray(q, dtype))  # (nq, d)
        self.k = k

    def _sims(self, batch: pa.Table) -> np.ndarray:
        if self.qscale:
            vecs = quantize(_mat(batch["embedding"], np.float64), self.qscale)
            return exact_cosine(vecs, self.q)  # (n, nq)
        vecs = _normalize(_mat(batch["embedding"], self.dtype))
        return vecs @ self.q.T

    def _top(self, col: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
        if self.qscale:
            # exact mode: full (cosine desc, vec_id asc) order so boundary
            # ties resolve identically to the SQL row_number window
            return np.lexsort((ids, -col))[:k]
        return np.argpartition(-col, k - 1)[:k]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        sims = self._sims(batch)  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = self._top(col, ids, k)
            out_q.append(np.full(k, qi, np.int64))
            out_id.append(ids[top].astype(np.int64))
            out_sim.append(col[top].astype(np.float64))
        return pa.table(
            {
                "query_idx": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def knn_brute_force(
    embeddings: ray.data.Dataset, queries: np.ndarray, k: int = 10,
    dtype=np.float32, quantize_scale=None,
) -> ray.data.Dataset:
    """Exact cosine top-k per query row. Partial top-k per batch (map), one
    small global sort+limit per query at the end (the partials are k rows
    per batch per query — tiny)."""
    q_ref = ray.put(np.asarray(queries, np.float64 if quantize_scale else dtype))
    partials = embeddings.map_batches(
        _BruteTopK,
        fn_constructor_kwargs={
            "q_ref": [q_ref], "k": k, "dtype": dtype,
            "quantize_scale": quantize_scale,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_idx").map_groups(final, batch_format="pandas")


def kmeans_centroids(
    X: np.ndarray, n_centroids: int, iters: int = 5, seed: int = 23
) -> np.ndarray:
    """Seeded spherical k-means on an in-memory sample (pure numpy,
    deterministic; shared by the Ray pipeline and the SQL-oracle constant
    generation so both sides quantize with identical centroids)."""
    X = _normalize(np.asarray(X))
    rng = np.random.Generator(np.random.PCG64(seed))
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def train_ivf_centroids(
    embeddings: ray.data.Dataset, n_centroids: int = 16, sample: int = 2048,
    iters: int = 5, seed: int = 23, dtype=np.float32
) -> np.ndarray:
    """Seeded mini-batch k-means on a driver-side sample (the coarse
    quantizer is a small model; training data is a bounded sample)."""
    samp = embeddings.random_sample(1.0, seed=seed).limit(sample).to_pandas()
    X = np.stack([np.asarray(v, dtype) for v in samp["embedding"]])
    return kmeans_centroids(X, n_centroids, iters=iters, seed=seed)


def ivf_assign(
    embeddings: ray.data.Dataset, centroids: np.ndarray, dtype=np.float32,
    quantize_scale=None,
) -> ray.data.Dataset:
    """Bucket each vector by nearest coarse centroid (broadcast lookup).
    In quantized mode the argmax runs over exact integer dots (ties take
    the lowest centroid index — numpy argmax first-max == the SQL
    ``ORDER BY dot DESC, c`` rank-1 window)."""
    c_ref = ray.put(np.asarray(centroids, np.float64 if quantize_scale else dtype))

    class Assign:
        def __init__(self):
            c = ray.get(c_ref)
            self.c = quantize(c, quantize_scale) if quantize_scale else _normalize(c)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if quantize_scale:
                vecs = quantize(_mat(batch["embedding"], np.float64), quantize_scale)
            else:
                vecs = _normalize(_mat(batch["embedding"], dtype))
            bucket = (vecs @ self.c.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("bucket", pa.array(bucket, pa.int32()))

    return embeddings.map_batches(
        Assign, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )


def knn_ivf(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 23,
    dtype=np.float32,
    centroids: np.ndarray | None = None,
    quantize_scale=None,
) -> ray.data.Dataset:
    """IVF approximate top-k: probe only the n_probe nearest buckets per
    query — at scale the filter prunes (1 - n_probe/n_centroids) of data.
    Pass precomputed `centroids` to pin the quantizer (e.g. shared with an
    external oracle); quantize_scale switches assignment/probing/top-k to
    the integer-quantized exact-parity kernels."""
    cent = (
        np.asarray(centroids, np.float64 if quantize_scale else dtype)
        if centroids is not None
        else train_ivf_centroids(embeddings, n_centroids, seed=seed, dtype=dtype)
    )
    assigned = ivf_assign(embeddings, cent, dtype=dtype, quantize_scale=quantize_scale)
    if quantize_scale:
        qn = quantize(np.asarray(queries, np.float64), quantize_scale)
        qdots = qn @ quantize(cent, quantize_scale).T  # exact integer dots
        # top n_probe per query on (dot desc, centroid idx asc) — ties
        # mirror the SQL rank window exactly
        idx = np.arange(qdots.shape[1])
        probes = np.stack(
            [np.lexsort((idx, -row))[:n_probe] for row in qdots]
        )
    else:
        qn = _normalize(np.asarray(queries, dtype))
        probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    wanted = set(np.unique(probes).tolist())
    pruned = assigned.filter(
        expr=f"bucket in {sorted(wanted)}" if wanted else "bucket < 0"
    )
    # in quantized mode ship the RAW queries; _BruteTopK re-quantizes
    q_ref = ray.put(np.asarray(queries, np.float64) if quantize_scale else qn)
    probe_ref = ray.put(probes)

    class TopK(_BruteTopK):
        def __init__(self):
            super().__init__([q_ref], k, dtype=dtype, quantize_scale=quantize_scale)
            self.probes = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            bucket = batch["bucket"].to_numpy()
            sims = self._sims(batch)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(bucket, self.probes[qi])
                if not mask.any():
                    continue
                col = sims[mask, qi]
                kk = min(k, len(col))
                top = self._top(col, ids[mask], kk)
                out_q.append(np.full(kk, qi, np.int64))
                out_id.append(ids[mask][top].astype(np.int64))
                out_sim.append(col[top].astype(np.float64))
            if not out_q:
                return pa.table(
                    {
                        "query_idx": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_idx": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_id),
                    "cosine": np.concatenate(out_sim),
                }
            )

    partials = pruned.map_batches(
        TopK, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_idx").map_groups(final, batch_format="pandas")


def sign_bucket_assign(
    embeddings: ray.data.Dataset,
    planes: np.ndarray,
    quantize_scale=None,
    dtype=np.float32,
    keep_embedding: bool = True,
) -> ray.data.Dataset:
    """Append an int64 `bucket` column: the sign bits of the vector against
    the broadcast hyperplanes (LSH bucket key). One map, no shuffle."""
    n_planes = len(planes)
    p_ref = ray.put(np.asarray(planes, np.float64 if quantize_scale else dtype))

    class Bucket:
        def __init__(self):
            p = ray.get(p_ref)
            self.planes = quantize(p, quantize_scale) if quantize_scale else p
            self.pow2 = (1 << np.arange(n_planes)).astype(np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if quantize_scale:
                vecs = quantize(_mat(batch["embedding"], np.float64), quantize_scale)
            else:
                vecs = _normalize(_mat(batch["embedding"], dtype))
            bucket = ((vecs @ self.planes.T) >= 0) @ self.pow2
            cols = {"vec_id": batch["vec_id"]}
            if keep_embedding:
                cols["embedding"] = batch["embedding"]
            cols["bucket"] = pa.array(bucket, pa.int64())
            return pa.table(cols)

    return embeddings.map_batches(
        Bucket, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )


class _ProbeTopK(_BruteTopK):
    """Per-batch partial top-k restricted to each query's probe buckets
    (shared by bucketed ANN variants; candidates carry a `bucket` column)."""

    def __init__(self, q_ref, probe_ref, k, dtype=np.float32, quantize_scale=None):
        super().__init__(q_ref, k, dtype=dtype, quantize_scale=quantize_scale)
        self.probes = ray.get(probe_ref[0] if isinstance(probe_ref, list) else probe_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        bucket = batch["bucket"].to_numpy()
        sims = self._sims(batch)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            mask = np.isin(bucket, self.probes[qi])
            if not mask.any():
                continue
            col = sims[mask, qi]
            kk = min(self.k, len(col))
            top = self._top(col, ids[mask], kk)
            out_q.append(np.full(kk, qi, np.int64))
            out_id.append(ids[mask][top].astype(np.int64))
            out_sim.append(col[top].astype(np.float64))
        if not out_q:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_idx": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "cosine": np.concatenate(out_sim),
            }
        )


def knn_lsh(
    embeddings: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 23,
    dtype=np.float32,
    quantize_scale=None,
) -> ray.data.Dataset:
    """LSH-bucketed approximate top-k (the hash-bucket scale path, sibling
    of the IVF variant): vectors land in 2^n_planes sign buckets; each
    query multiprobes its own bucket plus the n_planes hamming-1 neighbors
    (one flipped sign bit), so only (n_planes+1)/2^n_planes of the data is
    scanned. Same exact integer-quantized parity kernel as knn_brute_force
    when quantize_scale is set; deterministic (raw cosine desc, vec_id)
    tie-break mirrors the SQL row_number window."""
    q = np.asarray(queries, np.float64 if quantize_scale else dtype)
    planes = hyperplanes(
        n_planes, q.shape[1], seed=seed, dtype=np.float64 if quantize_scale else dtype
    )
    pmat = quantize(planes, quantize_scale) if quantize_scale else planes
    qmat = quantize(q, quantize_scale) if quantize_scale else _normalize(q)
    pow2 = (1 << np.arange(n_planes)).astype(np.int64)
    qb = ((qmat @ pmat.T) >= 0) @ pow2  # (nq,) own bucket
    probes = np.stack([qb] + [qb ^ (1 << i) for i in range(n_planes)], axis=1)

    bucketed = sign_bucket_assign(
        embeddings, planes, quantize_scale=quantize_scale, dtype=dtype
    )
    wanted = sorted(set(np.unique(probes).tolist()))
    pruned = bucketed.filter(
        expr=f"bucket in {wanted}" if wanted else "bucket < 0"
    )
    # ship RAW queries; the quantized kernel re-quantizes in the worker
    q_ref = ray.put(np.asarray(queries, np.float64) if quantize_scale else qmat)
    probe_ref = ray.put(probes)
    partials = pruned.map_batches(
        _ProbeTopK,
        fn_constructor_kwargs={
            "q_ref": [q_ref], "probe_ref": [probe_ref], "k": k,
            "dtype": dtype, "quantize_scale": quantize_scale,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_idx").map_groups(final, batch_format="pandas")


def hyperplanes(n_planes: int, d: int, seed: int = 23, dtype=np.float32) -> np.ndarray:
    """Seeded random hyperplanes for sign-bucketing (shared with the SQL
    oracle's embedded constants)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.normal(size=(n_planes, d)).astype(dtype)


def embedding_near_dup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 23,
    dtype=np.float32,
    quantize_scale=None,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: random-hyperplane bucket (n_planes sign
    bits) → within-bucket all-pairs cosine → (src, dst, cosine) above
    threshold. Recall grows with fewer planes; exactness within buckets.
    quantize_scale: sign bits and pair cosines computed on quantized
    integers (exact-parity mode)."""
    first = embeddings.take(1)
    d = len(first[0]["embedding"])
    planes = hyperplanes(
        n_planes, d, seed=seed, dtype=np.float64 if quantize_scale else dtype
    )
    p_ref = ray.put(planes)

    class Bucket:
        def __init__(self):
            p = ray.get(p_ref)
            self.planes = quantize(p, quantize_scale) if quantize_scale else p
            self.pow2 = (1 << np.arange(n_planes)).astype(np.int64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if quantize_scale:
                vecs = quantize(_mat(batch["embedding"], np.float64), quantize_scale)
            else:
                vecs = _normalize(_mat(batch["embedding"]))
            signs = (vecs @ self.planes.T) >= 0
            bucket = signs @ self.pow2
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "embedding": batch["embedding"],
                    "bucket": pa.array(bucket, pa.int64()),
                }
            )

    bucketed = embeddings.map_batches(
        Bucket, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    )

    BLOCK = 2048  # tile edge: peak sim matrix is BLOCK^2 floats (~32 MB)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64),
                 "cosine": np.empty(0, np.float64)}
            )
        g = g.sort_values("vec_id", kind="stable")
        ids = g["vec_id"].to_numpy()
        raw = np.stack(
            [np.asarray(v, np.float64 if quantize_scale else dtype)
             for v in g["embedding"]]
        )
        if quantize_scale:
            vecs = quantize(raw, quantize_scale)
            nrm = np.sqrt((vecs * vecs).sum(axis=1))
            nrm[nrm == 0] = 1.0
        else:
            vecs = _normalize(raw)
            nrm = None
        n = len(ids)
        # hot-bucket safeguard: the O(n^2) pass runs in BLOCK x BLOCK tiles
        # of the upper triangle, so a degenerate bucket costs bounded peak
        # memory (work stays O(n^2) but never materializes an n x n matrix)
        out_s, out_d, out_c = [], [], []
        for i0 in range(0, n, BLOCK):
            vi = vecs[i0 : i0 + BLOCK]
            for j0 in range(i0, n, BLOCK):
                sims = vi @ vecs[j0 : j0 + BLOCK].T
                if quantize_scale:
                    # exact dot / (sqrt(na)*sqrt(nb)) — the SQL expression
                    sims = sims / (
                        nrm[i0 : i0 + BLOCK, None]
                        * nrm[None, j0 : j0 + BLOCK]
                    )
                w = sims.shape[1]
                flat = np.flatnonzero(sims.ravel() >= threshold)
                iu, ju = flat // w, flat % w
                if i0 == j0:
                    m = ju > iu  # upper triangle only on diagonal tiles
                    iu, ju = iu[m], ju[m]
                out_s.append(ids[i0 + iu].astype(np.int64))
                out_d.append(ids[j0 + ju].astype(np.int64))
                out_c.append(sims[iu, ju].astype(np.float64))
        return pd.DataFrame(
            {
                "src": np.concatenate(out_s),
                "dst": np.concatenate(out_d),
                "cosine": np.concatenate(out_c),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")

def embedding_dedup(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 23,
    dtype=np.float32,
    quantize_scale=None,
    num_parts: int = 8,
    small_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """Semantic dedup: hyperplane-bucketed cosine near-dup pairs →
    connected components → (vec_id, dup_group) where dup_group is the min
    vec_id of the near-dup cluster (singletons map to themselves — keeping
    `vec_id == dup_group` rows IS the dedup).

    Same two CC regimes as minhash_lsh_dedup (dedup.py): pair tables and
    id counts <= small_threshold take the vectorized driver-side
    components fast path; larger graphs run on the superstep engine with
    per-vector self-loops so isolated vectors survive as singletons."""
    pairs = (
        embedding_near_dup(
            embeddings,
            threshold=threshold,
            n_planes=n_planes,
            seed=seed,
            dtype=dtype,
            quantize_scale=quantize_scale,
        )
        .select_columns(["src", "dst"])
        .materialize()
    )
    ids = embeddings.select_columns(["vec_id"]).materialize()
    if pairs.count() <= small_threshold and ids.count() <= small_threshold:
        from ..pipelines.superstep import driver_components

        pt = pairs.to_pandas()
        vs, comp = driver_components(
            pt["src"].to_numpy(),
            pt["dst"].to_numpy(),
            ids.to_pandas()["vec_id"].to_numpy(np.int64),
        )
        return ray.data.from_arrow(
            pa.table({"vec_id": pa.array(vs), "dup_group": pa.array(comp)})
        )
    from ..pipelines.superstep import ShardedGraph, connected_components

    loops = ids.map_batches(
        lambda t: pa.table({"src": t["vec_id"], "dst": t["vec_id"]}),
        batch_format="pyarrow",
    )
    g = ShardedGraph.build(
        pairs.union(loops), num_parts=num_parts, symmetric=True
    )
    return connected_components(g).rename_columns(
        {"vertex": "vec_id", "component": "dup_group"}
    )


def embedding_centroids(
    embs: ray.data.Dataset, group_col: str = "label", dim: int = 64
) -> ray.data.Dataset:
    """Mean-pooled centroid per group (semantic-cluster prototypes /
    class prototypes for embedding-space curation): embeddings are
    integer-quantized (floor(x*2^16+0.5), exact int64 sums in any order),
    combined per batch, folded by ONE (group, dim)-keyed groupby, and the
    mean is the fixed chain (float(sum)/n)/65536.0 rounded at output —
    bit-identical to the SQL mirror. Long-form output (group, dim,
    centroid): |groups| x dim rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        M = quantize(_mat(t["embedding"], np.float64)).astype(np.int64)
        gu, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(gu), M.shape[1]), np.int64)
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv, minlength=len(gu)).astype(np.int64)
        k = M.shape[1]
        return pa.table(
            {
                "grp": np.repeat(gu, k),
                "dim": np.tile(np.arange(1, k + 1, dtype=np.int64), len(gu)),
                "s": sums.ravel(),
                "n": np.repeat(cnt, k),
            }
        )

    agg = (
        embs.select_columns([group_col, "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["grp", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def fin(t: pa.Table) -> pa.Table:
        from ..functions.rounding import round_half_away

        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (s.astype(np.float64) / n) / QUANT_SCALE
        return pa.table(
            {
                "label": t["grp"],
                "dim": t["dim"],
                "centroid": round_half_away(c, 6),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


def embedding_int8_quantize(embs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vector symmetric int8 quantization (the storage/serving
    compression step): q_i = floor(x_i / maxabs * 127 + 0.5) with the
    per-vector scale maxabs = max|x_i|; all-zero vectors quantize to
    zeros with scale 0. Stateless map — no shuffle at any scale; the
    matrix kernel is one numpy pass per batch.

    Parity: float32 -> float64 casts are exact, maxabs is a max over
    exact values, and the quantizer is the fixed IEEE chain
    (x / m) * 127.0 + 0.5 -> floor, mirrored verbatim by the SQL
    list_transform oracle. Output rows carry the quantized vector as a
    canonical CSV string (bit-exact to SQL array_to_string) plus integer
    checksums, so the driver hash covers every component."""

    def kernel(t: pa.Table) -> pa.Table:
        M = _mat(t["embedding"], np.float32).astype(np.float64)
        m = np.abs(M).max(axis=1)
        safe = np.where(m > 0.0, m, 1.0)
        Q = np.floor((M / safe[:, None]) * 127.0 + 0.5).astype(np.int64)
        Q[m == 0.0] = 0
        csv = pd.DataFrame(Q).astype(str).agg(",".join, axis=1).to_numpy(object)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "n_dims": np.full(len(m), M.shape[1], np.int64),
                "scale": pa.array(m, pa.float64()),
                "l1_q": np.abs(Q).sum(axis=1),
                "q_csv": pa.array(csv, pa.string()),
            }
        )

    return embs.select_columns(["vec_id", "embedding"]).map_batches(
        kernel, batch_format="pyarrow"
    )


OUTLIER_COARSE = 256  # drop 8 quantization bits: c*u fits int64 squared-sum


def embedding_outliers(
    embs: ray.data.Dataset,
    group_col: str = "label",
    top_k: int = 3,
) -> "pa.Table":
    """Per-label embedding outliers — the top_k vectors FARTHEST from
    their label centroid (mislabeled-sample / noisy-cluster mining). Kept
    integer-exact by clearing the denominators: with u = quantized
    coarse-int embedding, c = label count, s = per-dim label sums,
    c^2 * ||x - mean||^2 = sum_dim (c*u - s)^2 — pure int64 (the coarse
    //256 re-quantization bounds the squared sums below 2^63), and
    ranking within a label shares c, so the d2_num order IS the distance
    order. Ties break (d2_num desc, vec_id asc).

    Scale shape: pass 1 = combiner label-sums (|labels| x dim partials,
    take_all on a fixed-cardinality table); pass 2 = stateless map with
    the broadcast sums, per-batch partial top-k per label; driver folds
    <= top_k * |labels| * blocks rows."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        M = (
            quantize(_mat(t["embedding"], np.float64)).astype(np.int64)
            // OUTLIER_COARSE
        )
        gu, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(gu), M.shape[1]), np.int64)
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv, minlength=len(gu)).astype(np.int64)
        k = M.shape[1]
        return pa.table(
            {
                "grp": np.repeat(gu, k),
                "dim": np.tile(np.arange(k, dtype=np.int64), len(gu)),
                "s": sums.ravel(),
                "n": np.repeat(cnt, k),
            }
        )

    rows = (
        embs.select_columns([group_col, "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )  # <= |labels| * dim * blocks integer rows — fixed cardinality
    import pandas as pd

    pr = pd.DataFrame(rows)
    agg = pr.groupby(["grp", "dim"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")
    ).reset_index()
    labels = np.unique(agg["grp"].to_numpy(np.int64))
    dim = int(agg["dim"].max()) + 1
    S = np.zeros((len(labels), dim), np.int64)
    C = np.zeros(len(labels), np.int64)
    li = np.searchsorted(labels, agg["grp"].to_numpy(np.int64))
    S[li, agg["dim"].to_numpy(np.int64)] = agg["s"].to_numpy(np.int64)
    C[li] = agg["n"].to_numpy(np.int64)
    ref = _ray.put((labels, S, C))

    def score(t: pa.Table) -> pa.Table:
        labels_, S_, C_ = _ray.get(ref)
        g = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = (
            quantize(_mat(t["embedding"], np.float64)).astype(np.int64)
            // OUTLIER_COARSE
        )
        li_ = np.searchsorted(labels_, g)
        diff = C_[li_, None] * M - S_[li_]
        d2 = np.einsum("ij,ij->i", diff, diff)
        # per-batch partial top-k per label
        order = np.lexsort((vid, -d2, g))
        g2, v2, d22 = g[order], vid[order], d2[order]
        starts = np.concatenate([[True], g2[1:] != g2[:-1]]) if len(g2) else np.empty(0, bool)
        run = np.cumsum(starts) - 1
        pos = np.arange(len(g2))
        first = pos[starts][run] if len(g2) else pos
        keep = (pos - first) < top_k
        return pa.table(
            {
                "label": g2[keep],
                "vec_id": v2[keep],
                "d2_num": d22[keep],
            }
        )

    parts = (
        embs.select_columns(["vec_id", group_col, "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts)
    df = df.sort_values(
        ["label", "d2_num", "vec_id"], ascending=[True, False, True]
    )
    df = df.groupby("label", sort=True).head(top_k)
    return pa.table(
        {
            "label": pa.array(df["label"].to_numpy(np.int64)),
            "vec_id": pa.array(df["vec_id"].to_numpy(np.int64)),
            "d2_num": pa.array(df["d2_num"].to_numpy(np.int64)),
        }
    )


MARGIN_SHIFT = 1 << 20  # lifts quantized coords non-negative (|x| << 16)


def label_margin(embs: ray.data.Dataset, dim: int = 64) -> "pa.Table":
    """Cluster-quality audit per label: how many points sit strictly
    nearest to their OWN label's floor-centroid (ties broken toward the
    lowest label id) — the all-integer analog of a silhouette check for
    embedding-space curation.

    Exactness: coordinates are quantized floor(x*2^16 + 0.5) and SHIFTED
    by 2^20 so every value, sum and centroid is non-negative — integer
    floor division then agrees between numpy (floors) and SQL (truncates),
    and squared distances are shift-invariant. Two passes: a (label, dim)
    partial-sum fold builds the L x dim centroid table (tiny, broadcast
    via ray.put), then one stateless map_batches computes the B x L
    integer distance matrix per block (int64 matmul) and folds per-label
    (n, correct) partials; the driver sums a #blocks x L table. The one
    share division is the identical ROUND(c/n, 6) on both sides."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        M = quantize(_mat(t["embedding"], np.float64)).astype(np.int64)
        M += MARGIN_SHIFT
        gu, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(gu), M.shape[1]), np.int64)
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv, minlength=len(gu)).astype(np.int64)
        k = M.shape[1]
        return pa.table(
            {
                "grp": np.repeat(gu, k),
                "dim": np.tile(np.arange(k, dtype=np.int64), len(gu)),
                "s": sums.ravel(),
                "n": np.repeat(cnt, k),
            }
        )

    agg = (
        embs.select_columns(["label", "embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["grp", "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    labels = np.sort(agg["grp"].unique().astype(np.int64))
    L = len(labels)
    C = np.zeros((L, dim), np.int64)
    li = {int(l): i for i, l in enumerate(labels)}
    gi = agg["grp"].to_numpy(np.int64)
    di = agg["dim"].to_numpy(np.int64)
    sv = agg["s"].to_numpy(np.int64)
    nv = agg["n"].to_numpy(np.int64)
    rows = np.array([li[int(x)] for x in gi], np.int64)
    C[rows, di] = sv // nv  # all non-negative: floor == truncate
    c_ref = ray.put((labels, C, (C * C).sum(axis=1)))

    def margins(t: pa.Table) -> pa.Table:
        lab, Cm, c2 = ray.get(c_ref)
        g = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = quantize(_mat(t["embedding"], np.float64)).astype(np.int64)
        Q += MARGIN_SHIFT
        # integer distance matrix: ||q||^2 - 2 q.C^T + ||C||^2 (exact)
        D = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ Cm.T) + c2[None, :]
        best = lab[np.argmin(D, axis=1)]  # first min = lowest label id
        gu, inv = np.unique(g, return_inverse=True)
        n = np.bincount(inv, minlength=len(gu)).astype(np.int64)
        ok = np.bincount(
            inv, weights=(best == g), minlength=len(gu)
        ).astype(np.int64)
        return pa.table(
            {"label": pa.array(gu), "n": pa.array(n), "ok": pa.array(ok)}
        )

    parts = (
        embs.select_columns(["label", "embedding"])
        .map_batches(margins, batch_format="pyarrow")
        .take_all()
    )
    n = np.zeros(L, np.int64)
    ok = np.zeros(L, np.int64)
    for r in parts:
        i = li[int(r["label"])]
        n[i] += r["n"]
        ok[i] += r["ok"]
    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "n_points": pa.array(n, pa.int64()),
            "n_correct": pa.array(ok, pa.int64()),
            "correct_share": pa.array(
                round_half_away(ok.astype(np.float64) / n, 6), pa.float64()
            ),
        }
    )


class _KmeansAssign:
    """Actor-pool stage: quantized centroid matrix fetched once per
    worker; per batch emits long-form partial sums (c, d, s) + counts, or
    the final per-cluster (n, inertia) partials when finalize=True."""

    def __init__(self, cent_ref, finalize: bool = False):
        from ..functions.proccache import cached_get

        self.C = cached_get(cent_ref)  # (k, d) integer-valued float64
        self.cn = (self.C * self.C).sum(axis=1)  # exact: fits in float64
        self.finalize = finalize

    def __call__(self, t: pa.Table) -> pa.Table:
        X = quantize(_mat(t["embedding"], np.float64))
        # exact integer arithmetic in float64: products <= 2^34, row sums
        # <= 2^40 << 2^53, so the BLAS summation order cannot round
        d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ self.C.T) + self.cn
        assign = np.argmin(d2, axis=1)  # ties -> lowest c (first argmin)
        k, dim = self.C.shape
        if self.finalize:
            n = np.bincount(assign, minlength=k).astype(np.int64)
            inertia = np.zeros(k, np.float64)
            np.add.at(inertia, assign, d2[np.arange(len(assign)), assign])
            return pa.table(
                {
                    "c": np.arange(k, dtype=np.int64),
                    "n": n,
                    "inertia": inertia.astype(np.int64),
                }
            )
        S = np.zeros((k, dim), np.float64)
        np.add.at(S, assign, X)
        cnt = np.bincount(assign, minlength=k).astype(np.int64)
        cc = np.repeat(np.arange(k, dtype=np.int64), dim)
        dd = np.tile(np.arange(dim, dtype=np.int64), k)
        return pa.table(
            {
                "c": cc,
                "d": dd,
                "s": S.reshape(-1).astype(np.int64),
                "cnt": np.repeat(cnt, dim),
            }
        )


def kmeans_lloyd(
    embeddings: ray.data.Dataset,
    k: int = 8,
    iters: int = 3,
    num_parts: int = 32,
) -> "pa.Table":
    """Lloyd's k-means over the quantized embedding space with EXACT
    integer arithmetic end to end — the iterative-training loop of the ML
    family, bit-mirrorable by an unrolled SQL oracle: centroids start at
    the k lowest vec_ids, every distance/assignment/update is an
    integer-valued float64 op (products <= 2^34, sums << 2^53), the
    update is floor(sum/count) per dimension, ties break to the lowest
    centroid id, and empty clusters carry their previous centroid.
    Returns per final cluster (cluster, n, inertia, cent_sum) — counts,
    summed final distances, and the centroid-coordinate checksum, all
    exact integers.

    Scale shape: the classic scalable Lloyd loop — quantized dataset
    materialized ONCE; per iteration the (k x d) centroid matrix is
    broadcast via ray.put (fetched once per worker, `cached_get`) and one
    `map_batches` pass emits k*d-row partial sums that fold to new
    centroids on the driver. iters+1 linear passes, no shuffle at any
    step, driver state O(k*d)."""
    import pandas as pd

    import pyarrow.compute as pc

    emb = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    seed = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], pa.scalar(k))),
            batch_format="pyarrow",
        )
        .sort("vec_id")
        .take_all()
    )
    C = quantize(np.stack([np.asarray(r["embedding"], np.float64) for r in seed]))
    dim = C.shape[1]
    for _ in range(iters):
        ref = ray.put(C)
        parts = emb.map_batches(
            _KmeansAssign,
            fn_constructor_args=(ref,),
            batch_format="pyarrow",
            concurrency=(1, num_parts),
        ).to_pandas()
        g = parts.groupby(["c", "d"], sort=True)[["s", "cnt"]].sum()
        s = g["s"].to_numpy(np.int64).reshape(k, dim)
        cnt = g["cnt"].to_numpy(np.int64).reshape(k, dim)[:, 0]
        nz = cnt > 0
        newC = C.copy()
        # floor(sum/count): quotient magnitudes are exact in float64, so
        # floor-of-double-divide == integer floor division (SQL mirror)
        newC[nz] = np.floor(s[nz].astype(np.float64) / cnt[nz, None])
        C = newC
    ref = ray.put(C)
    fin = emb.map_batches(
        _KmeansAssign,
        fn_constructor_args=(ref, True),
        batch_format="pyarrow",
        concurrency=(1, num_parts),
    ).to_pandas()
    g = fin.groupby("c", sort=True)[["n", "inertia"]].sum()
    n = g["n"].to_numpy(np.int64)
    keep = n > 0
    cs = C.sum(axis=1).astype(np.int64)
    return pa.table(
        {
            "cluster": pa.array(g.index.to_numpy(np.int64)[keep]),
            "n": pa.array(n[keep]),
            "inertia": pa.array(g["inertia"].to_numpy(np.int64)[keep]),
            "cent_sum": pa.array(cs[keep]),
        }
    )


def cosine_threshold_join(
    embeddings: ray.data.Dataset,
    threshold: float = 0.35,
    block_rows: int = 2048,
    num_parts: int = 32,
    max_exact_rows: int = 250_000,
    on_overflow: str = "raise",
) -> ray.data.Dataset:
    """COMPLETE exact-threshold cosine self-join — every pair src < dst
    with cosine >= threshold, no hashing, no recall loss: the exact
    baseline the hyperplane-bucket near-dup (recall < 1 by construction)
    and LSH paths are measured against, the embedding analog of
    allpairs_jaccard_join. Threshold tested on the RAW cosine; ROUND(6)
    only on output (the _q_cos parity expression, bit-exact vs SQL).

    Scale shape: the classic block-replicated all-pairs join — rows are
    tiled into vec_id-range blocks of `block_rows`; each row ships to its
    B pair-partitions (i,j), i <= j, so the ONE shuffle carries n*B rows
    while the O(n^2) multiply work lands in (B^2+B)/2 independent tile
    tasks (each one exact-integer matmul over <= block_rows^2 pairs).
    Work is inherently quadratic — this is the exact-completeness path;
    sign_bucket near-dup is the sub-quadratic scale path.

    Regime guard (the triangle/Boruvka pattern): the quadratic witness is
    only legitimate on witness-sized inputs, so tables over
    `max_exact_rows` either refuse loudly (on_overflow="raise", default —
    the caller must opt into a path whose cost they understand) or
    auto-switch to the sub-quadratic hyperplane-banded near-dup with the
    identical quantized-cosine arithmetic and output contract
    (on_overflow="banded"; recall < 1 by construction, logged)."""
    import pyarrow.compute as pc

    n_rows = embeddings.count()
    if n_rows > max_exact_rows:
        if on_overflow == "banded":
            import logging

            logging.getLogger(__name__).warning(
                "cosine_threshold_join: %d rows > max_exact_rows=%d; "
                "switching to the hyperplane-banded near-dup path "
                "(sub-quadratic, recall < 1 — explicit completeness loss)",
                n_rows, max_exact_rows,
            )
            from ..functions.rounding import round_half_away

            nd = embedding_near_dup(
                embeddings, threshold=threshold, quantize_scale=QUANT_SCALE
            )

            def rnd(t: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "src": t["src"],
                        "dst": t["dst"],
                        "cosine": round_half_away(
                            t["cosine"].to_numpy(zero_copy_only=False), 6
                        ),
                    }
                )

            return nd.map_batches(rnd, batch_format="pyarrow")
        raise ValueError(
            f"cosine_threshold_join is the O(n^2) exact-completeness "
            f"witness and refuses {n_rows} rows (max_exact_rows="
            f"{max_exact_rows}). Use embedding_near_dup (sub-quadratic, "
            f"recall < 1), pass on_overflow='banded' to auto-switch, or "
            f"raise max_exact_rows explicitly if the quadratic cost is "
            f"intended."
        )

    nmax = embeddings.max("vec_id")
    B = int(nmax) // block_rows + 1

    def fanout(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = quantize(_mat(t["embedding"], np.float64))
        bk = ids // block_rows
        # pair-partition ids for row in block b: (i, b) for i <= b and
        # (b, j) for j >= b — vectorized per distinct block in the batch
        out_id, out_kp, out_side, out_rows = [], [], [], []
        for b in np.unique(bk):
            m = bk == b
            lo = np.arange(0, b + 1)            # (i, b): this row is side 1
            hi = np.arange(b, B)                # (b, j): this row is side 0
            kp_lo = lo * B + b
            kp_hi = b * B + hi
            kps = np.concatenate([kp_lo, kp_hi[1:]])  # skip (b,b) duplicate
            sides = np.concatenate(
                [np.ones(len(lo), np.int8), np.zeros(len(hi) - 1, np.int8)]
            )
            nrep = len(kps)
            idx = np.flatnonzero(m)
            out_rows.append(np.repeat(idx, nrep))
            out_id.append(np.repeat(ids[m], nrep))
            out_kp.append(np.tile(kps, len(idx)))
            out_side.append(np.tile(sides, len(idx)))
        rows = np.concatenate(out_rows)
        flat = Q[rows]
        return pa.table(
            {
                "vec_id": np.concatenate(out_id),
                "kp": pa.array(np.concatenate(out_kp).astype(np.int32)),
                "side": pa.array(np.concatenate(out_side)),
                "q": pa.array(
                    list(flat), pa.list_(pa.float64())
                ),
            }
        )

    def tile(t: pa.Table) -> pa.Table:
        kp = int(t["kp"][0].as_py())
        i, j = kp // B, kp % B
        side = t["side"].to_numpy(zero_copy_only=False)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = _mat(t["q"], np.float64)
        if i == j:
            # diagonal tile: one copy of each row (side==1), triangular mask
            m = side == 1
            ai, A = ids[m], Q[m]
            sims = exact_cosine(A, A)
            r, c = np.nonzero(np.triu(sims >= threshold, k=1))
            src, dst = ai[r], ai[c]
        else:
            m0, m1 = side == 0, side == 1
            ai, A = ids[m0], Q[m0]   # block i rows (side 0 = (b, j) tag)
            bi, Bm = ids[m1], Q[m1]  # block j rows
            if not len(ai) or not len(bi):
                e = np.empty(0, np.int64)
                return pa.table({"src": e, "dst": e,
                                 "cosine": np.empty(0, np.float64)})
            sims = exact_cosine(A, Bm)
            r, c = np.nonzero(sims >= threshold)
            src, dst = ai[r], bi[c]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        cos = (
            sims[r, c] if len(r) else np.empty(0, np.float64)
        )
        from ..functions.rounding import round_half_away

        return pa.table(
            {
                "src": lo,
                "dst": hi,
                "cosine": round_half_away(cos, 6),
            }
        )

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(fanout, batch_format="pyarrow")
        .groupby("kp")
        .map_groups(tile, batch_format="pyarrow")
    )


def mmr_select(
    embeddings: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.5,
    quantize_scale: float = QUANT_SCALE,
) -> pd.DataFrame:
    """Maximal-marginal-relevance diversified top-k: greedily select `k`
    results from the `n_candidates` highest-cosine candidates, each step
    maximizing lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)
    with a (score desc, vec_id asc) tie-break — the standard
    search-result / RAG-context diversification operator.

    Exact-parity construction: the candidate scan is the proven
    knn_brute_force quantized kernel (distributed partial top-k, one tiny
    merge); the greedy loop runs on the driver over <= n_candidates rows
    with every relevance and pairwise similarity produced by
    exact_cosine's fixed expression over integer-valued float64 vectors,
    so scores are bit-identical to the unrolled SQL-oracle chain. Returns
    (rnk, vec_id, score) with UNROUNDED scores (callers round on output)."""
    import pyarrow.compute as pcc

    q = np.asarray(query, np.float64)
    cand = (
        knn_brute_force(
            embeddings, q[None, :], k=n_candidates,
            quantize_scale=quantize_scale,
        )
        .to_pandas()
        .sort_values(["cosine", "vec_id"], ascending=[False, True])
        .reset_index(drop=True)
    )
    ids = cand["vec_id"].to_numpy(np.int64)
    rel = cand["cosine"].to_numpy(np.float64)
    ids_ref = ray.put(ids)

    def pick(t: pa.Table) -> pa.Table:
        keep = pcc.is_in(
            pcc.cast(t["vec_id"], pa.int64()),
            value_set=pa.array(ray.get(ids_ref), pa.int64()),
        )
        return t.filter(keep)

    sub = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .set_index("vec_id")
        .loc[ids]
    )
    V = quantize(
        np.stack([np.asarray(v, np.float64) for v in sub["embedding"]]),
        quantize_scale,
    )
    S = exact_cosine(V, V)  # pairwise candidate sims, SQL-mirrorable
    n = len(ids)
    k = min(k, n)
    maxsim = np.zeros(n, np.float64)
    remaining = np.ones(n, bool)
    rows = []
    for rnk in range(1, k + 1):
        score = lam * rel - (1.0 - lam) * maxsim
        idx_rem = np.flatnonzero(remaining)
        best = idx_rem[np.lexsort((ids[idx_rem], -score[idx_rem]))[0]]
        rows.append((rnk, int(ids[best]), float(score[best])))
        remaining[best] = False
        maxsim = np.maximum(maxsim, S[:, best])
    return pd.DataFrame(rows, columns=["rnk", "vec_id", "score"])
