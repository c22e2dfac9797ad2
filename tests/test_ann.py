"""ANN stage tests: ragged-list safety, hot-bucket blocking, and the
driver-side components fast path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.stages.ann import (
    _mat,
    embedding_near_dup,
    hyperplanes,
    knn_brute_force,
    knn_lsh,
)


def test_mat_ragged_divisible_falls_back():
    """A ragged list<float> whose total element count divides the row count
    must NOT silently reshape (rows of len 2 and 4 divide evenly) — it pads
    via the per-row path, raising on truly ragged input is not required,
    but corrupting a matrix is forbidden."""
    col = pa.array([[1.0, 2.0], [3.0, 4.0, 5.0, 6.0]], pa.list_(pa.float32()))
    try:
        m = _mat(col)
        # if it stacked, numpy would have raised on ragged input — reaching
        # here means equal-length rows only, which contradicts the fixture
        raise AssertionError(f"ragged input produced a matrix {m.shape}")
    except ValueError:
        pass  # np.stack on ragged rows raises: the fallback path was taken


def test_mat_fixed_width_zero_copy():
    col = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float32()))
    m = _mat(col)
    assert m.shape == (2, 2)
    assert m[1, 0] == 3.0


def test_embedding_near_dup_hot_bucket_blocked():
    """Degenerate bucket: every vector lands in one bucket; the blocked
    O(n^2) pass (n > BLOCK tile edge) must finish and report exactly the
    planted duplicate pairs."""
    rng = np.random.Generator(np.random.PCG64(7))
    n, d = 5000, 32
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    # force one bucket: flip each vector to the positive side of the plane
    planes = hyperplanes(1, d, seed=23, dtype=np.float64)
    dots = vecs @ planes[0]
    vecs[dots < 0] *= -1.0
    # plant exact duplicates: vec[i+1] = vec[i] for a few i
    planted = [(10, 11), (500, 501), (4700, 4701)]
    for a, b in planted:
        vecs[b] = vecs[a]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    )
    out = embedding_near_dup(
        ds, threshold=0.999, n_planes=1, dtype=np.float64
    ).to_pandas()
    got = set(zip(out["src"], out["dst"]))
    assert got == set(planted)
    assert (out["cosine"] > 0.999).all()


def test_driver_components_matches_definition():
    from sbustreamspot_core_ray.pipelines.superstep import driver_components

    src = np.array([1, 2, 10, 30], np.int64)
    dst = np.array([2, 3, 11, 31], np.int64)
    vertices = np.array([1, 2, 3, 10, 11, 30, 31, 99], np.int64)
    vs, comp = driver_components(src, dst, vertices)
    m = dict(zip(vs, comp))
    assert m[1] == m[2] == m[3] == 1
    assert m[10] == m[11] == 10
    assert m[30] == m[31] == 30
    assert m[99] == 99


def test_knn_brute_force_small():
    rng = np.random.Generator(np.random.PCG64(5))
    vecs = rng.normal(size=(50, 8)).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(50, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    )
    out = knn_brute_force(ds, vecs[:2], k=5, dtype=np.float64).to_pandas()
    # each query's best match is itself (cosine 1)
    for q in (0, 1):
        top = out[out["query_idx"] == q].sort_values("cosine", ascending=False)
        assert top.iloc[0]["vec_id"] == q
        assert abs(top.iloc[0]["cosine"] - 1.0) < 1e-12


def test_knn_lsh_self_hit_and_probe_subset():
    """LSH top-k: each query's own bucket contains itself, so the best hit
    is the query vector (cosine 1); every returned candidate must live in a
    probed bucket (own bucket or one flipped sign bit)."""
    rng = np.random.Generator(np.random.PCG64(11))
    n, d, n_planes = 200, 16, 4
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    )
    out = knn_lsh(ds, vecs[:3], k=5, n_planes=n_planes, dtype=np.float64).to_pandas()
    planes = hyperplanes(n_planes, d, seed=23, dtype=np.float64)
    nrm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pow2 = 1 << np.arange(n_planes)
    bucket = ((nrm @ planes.T) >= 0) @ pow2
    for q in (0, 1, 2):
        rows = out[out["query_idx"] == q]
        assert len(rows) >= 1
        top = rows.sort_values("cosine", ascending=False)
        assert top.iloc[0]["vec_id"] == q
        assert abs(top.iloc[0]["cosine"] - 1.0) < 1e-12
        probes = {int(bucket[q])} | {int(bucket[q] ^ (1 << i)) for i in range(n_planes)}
        assert all(int(bucket[v]) in probes for v in rows["vec_id"])


def test_embedding_dedup_clusters_and_singletons():
    """Transitive near-dup chain a~b, b~c collapses to one dup_group (min
    id); unrelated vectors stay singletons mapping to themselves."""
    from sbustreamspot_core_ray.stages.ann import embedding_dedup

    rng = np.random.Generator(np.random.PCG64(11))
    d = 16
    base = rng.normal(size=d)
    tiny = rng.normal(size=d) * 1e-4
    vecs = np.stack(
        [
            base,               # 0 ~ 1 ~ 2 form a chain of near-dups
            base + tiny,
            base + 2 * tiny,
            rng.normal(size=d),  # 3, 4: singletons
            rng.normal(size=d),
        ]
    ).astype(np.float64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(5, dtype=np.int64) + 100),
                "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
            }
        )
    )
    out = (
        embedding_dedup(ds, threshold=0.9999, n_planes=1, dtype=np.float64)
        .to_pandas()
        .set_index("vec_id")["dup_group"]
        .to_dict()
    )
    assert out == {100: 100, 101: 100, 102: 100, 103: 103, 104: 104}


def test_embedding_centroids_exact():
    import numpy as np
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.ann import embedding_centroids

    embs = ray.data.from_arrow(
        pa.table(
            {
                "label": pa.array([0, 0, 1], pa.int32()),
                "embedding": pa.array(
                    [[0.5, 1.0], [1.5, 2.0], [3.0, -1.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = (
        embedding_centroids(embs, dim=2)
        .to_pandas()
        .set_index(["label", "dim"])
        .sort_index()
    )
    assert out.loc[(0, 1), "centroid"] == 1.0   # mean(0.5, 1.5)
    assert out.loc[(0, 2), "centroid"] == 1.5   # mean(1.0, 2.0)
    assert out.loc[(1, 1), "centroid"] == 3.0
    assert out.loc[(1, 2), "centroid"] == -1.0


def test_label_margin_hand_case():
    """Two tight clusters + one point parked at the other cluster's
    centroid: that point counts against its own label's share. Floor
    centroids and the lowest-label tie-break are exercised by label 1's
    (0,0) interloper sitting EXACTLY on label 0's centroid."""
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.ann import label_margin

    dim = 64

    def vec(a, b):
        v = [0.0] * dim
        v[0], v[1] = a, b
        return v

    rows = [
        (0, 0, vec(0.0, 0.0)),
        (1, 0, vec(0.0, 0.0)),
        (2, 1, vec(0.5, 0.5)),
        (3, 1, vec(0.5, 0.5)),
        (4, 1, vec(0.0, 0.0)),  # label-1 point on label-0's centroid
    ]
    embs = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "label": pa.array([r[1] for r in rows], pa.int32()),
                "embedding": pa.array(
                    [r[2] for r in rows], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = label_margin(embs).to_pandas().set_index("label")
    assert out.loc[0, "n_points"] == 2
    assert out.loc[0, "n_correct"] == 2
    assert out.loc[1, "n_points"] == 3
    # label 1's centroid = floor(mean of (.5,.5)x2 and (0,0)) -> (1/3, 1/3);
    # the interloper at (0,0) is nearer label 0's (0,0) centroid
    assert out.loc[1, "n_correct"] == 2
    assert out.loc[1, "correct_share"] == 0.666667


def test_kmeans_lloyd_vs_numpy_reference():
    """Distributed Lloyd vs a straight numpy implementation of the same
    spec (seed rows, floor-div updates, lowest-c ties, empty-cluster
    carry), including a forced empty cluster."""
    from sbustreamspot_core_ray.stages.ann import kmeans_lloyd, quantize

    rng = np.random.default_rng(77)
    # two tight blobs + one isolated far point; k=4 guarantees an empty
    # cluster after the first update (seeds 0..3 all start in blob A)
    A = rng.normal(0.0, 0.05, (30, 8))
    B = rng.normal(3.0, 0.05, (20, 8))
    far = np.full((1, 8), 40.0)
    X = np.vstack([A, B, far]).astype(np.float32)
    X[3] = X[2]  # identical seeds: ties go to the lower c, so c3 starves
    k, iters = 4, 3

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in X],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    got = (
        kmeans_lloyd(emb, k=k, iters=iters, num_parts=4)
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )

    Q = quantize(X.astype(np.float64))
    C = Q[:k].copy()
    saw_empty = False
    for _ in range(iters):
        d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + (C * C).sum(1)
        a = np.argmin(d2, axis=1)
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                newC[c] = np.floor(Q[m].sum(0) / m.sum())
            else:
                saw_empty = True  # carry-over path exercised
        C = newC
    d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + (C * C).sum(1)
    a = np.argmin(d2, axis=1)
    want = []
    for c in range(k):
        m = a == c
        if m.any():
            want.append(
                (c, int(m.sum()), int(d2[m, c].sum()), int(C[c].sum()))
            )
    assert got.to_numpy().tolist() == [list(r) for r in want]
    # the duplicate seed starves c3 in round 1 (ties go to the lower c);
    # the carried seed centroid then recaptures the duplicate pair, so the
    # empty-cluster carry path is genuinely on the compared trajectory
    assert saw_empty


def test_cosine_threshold_join_complete_vs_bruteforce():
    """Block-replicated exact join vs the O(n^2) definition with
    block_rows small enough to exercise diagonal AND off-diagonal tiles,
    plus completeness vs the recall-lossy sign-bucket path's ground set."""
    from sbustreamspot_core_ray.stages.ann import (
        cosine_threshold_join,
        exact_cosine,
        quantize,
    )

    rng = np.random.default_rng(99)
    base = rng.normal(0, 1, (10, 16))
    # near-duplicates of the first 10 rows + noise rows
    X = np.vstack([base, base + rng.normal(0, 0.05, (10, 16)),
                   rng.normal(0, 1, (15, 16))]).astype(np.float32)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in X], pa.list_(pa.float32())
                ),
            }
        )
    )
    thr = 0.9
    got = (
        cosine_threshold_join(emb, threshold=thr, block_rows=8, num_parts=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    Q = quantize(X.astype(np.float64))
    sims = exact_cosine(Q, Q)
    want = [
        (i, j, sims[i, j])
        for i in range(len(X))
        for j in range(i + 1, len(X))
        if sims[i, j] >= thr
    ]
    assert len(want) >= 10  # the 10 planted near-dup pairs at least
    assert [(int(r.src), int(r.dst)) for r in got.itertuples()] \
        == [(i, j) for i, j, _ in want]
    from sbustreamspot_core_ray.functions.rounding import round_half_away

    assert got["cosine"].to_numpy().tolist() == [
        float(round_half_away(np.array([c]), 6)[0]) for _, _, c in want
    ]


def test_cosine_threshold_join_guard_and_banded_fallback():
    """Regime guard: above max_exact_rows the quadratic witness refuses by
    default (ValueError), and on_overflow='banded' auto-switches to the
    sub-quadratic hyperplane path — which must report the identical pair
    set as the exact join when every qualifying pair is an exact duplicate
    (identical vectors always share a sign bucket, so no recall loss)."""
    import pytest

    from sbustreamspot_core_ray.stages.ann import cosine_threshold_join

    rng = np.random.default_rng(17)
    X = rng.normal(0, 1, (40, 16)).astype(np.float32)
    # planted exact duplicates — the only pairs above threshold 0.999
    planted = [(3, 4), (10, 11), (30, 31)]
    for a, b in planted:
        X[b] = X[a]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
                "embedding": pa.array(
                    [list(map(float, r)) for r in X], pa.list_(pa.float32())
                ),
            }
        )
    )
    with pytest.raises(ValueError, match="max_exact_rows"):
        cosine_threshold_join(emb, threshold=0.999, max_exact_rows=10)

    exact = (
        cosine_threshold_join(emb, threshold=0.999, block_rows=8)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    banded = (
        cosine_threshold_join(
            emb, threshold=0.999, max_exact_rows=10, on_overflow="banded"
        )
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert [(int(r.src), int(r.dst)) for r in exact.itertuples()] == planted
    assert banded[["src", "dst"]].values.tolist() \
        == exact[["src", "dst"]].values.tolist()
    assert banded["cosine"].tolist() == exact["cosine"].tolist()


def test_mmr_prefers_diverse_over_redundant():
    """Query along e1; candidates: near-duplicates of the query vs one
    orthogonal-ish vector. After picking the best match, MMR must pick the
    diverse vector over a second near-duplicate."""
    import pandas as pd

    from sbustreamspot_core_ray.stages.ann import mmr_select

    vecs = {
        1: [0.99, 0.14, 0.0],  # best match
        2: [0.98, 0.19, 0.0],  # near-dup of 1
        3: [0.5, 0.0, 0.87],   # relevant but diverse
    }
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(vecs), pa.int64()),
                "embedding": pa.array(
                    [vecs[i] for i in vecs], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = mmr_select(
        emb, np.array([1.0, 0.0, 0.0]), k=2, n_candidates=3, lam=0.5
    )
    assert out["vec_id"].tolist() == [1, 3]
    assert out["rnk"].tolist() == [1, 2]
