"""Engine vs single-node oracle parity for the four link-graph algorithms
(FIXTURES.md §4: PageRank allclose 1e-6, CC / labels / triangles exact)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from sbustreamspot_core_ray.pipelines.superstep import (
    ShardedGraph,
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from .oracles import (
    oracle_components,
    oracle_label_propagation,
    oracle_pagerank,
    oracle_triangles,
    random_graph,
)

P = 8  # partitions (small but >1 so the shuffle paths are exercised)


@pytest.fixture(scope="module")
def edges():
    return random_graph(n=250, m=1500, seed=23)


def edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    ).repartition(6)


def test_pagerank_matches_oracle(edges):
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    got = pagerank(g, damping=0.85, max_iters=60, tol=1e-12).to_pandas()
    want = oracle_pagerank(edges, damping=0.85, max_iters=60, tol=1e-12)
    assert len(got) == len(want)
    got_map = dict(zip(got["vertex"], got["rank"]))
    for v, r in want.items():
        assert got_map[v] == pytest.approx(r, abs=1e-6)
    assert abs(sum(got_map.values()) - 1.0) < 1e-9


def test_connected_components_matches_oracle(edges):
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    got = connected_components(g).to_pandas()
    want = oracle_components(edges)
    got_map = dict(zip(got["vertex"], got["component"]))
    assert got_map == want
    assert len(set(got_map.values())) == len(set(want.values()))


def test_label_propagation_matches_oracle(edges):
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    got = label_propagation(g, iters=5).to_pandas()
    want = oracle_label_propagation(edges, iters=5)
    got_map = dict(zip(got["vertex"], got["label"]))
    assert got_map == want


def test_triangle_count_matches_oracle(edges):
    total, per = oracle_triangles(edges)
    got_pv = triangle_count(edges_ds(edges), num_partitions=2, per_vertex=True).to_pandas()
    got_map = dict(zip(got_pv["vertex"], got_pv["triangles"]))
    assert got_map == per
    assert int(got_pv["triangles"].sum()) == 3 * total


def test_triangle_copartitioned_fallback_matches_oracle(edges):
    """The >broadcast-threshold shuffle path (forced via
    broadcast_edges_max=0) must agree with the broadcast path."""
    total, per = oracle_triangles(edges)
    got = triangle_count(
        edges_ds(edges), num_partitions=2, per_vertex=True, broadcast_edges_max=0
    ).to_pandas()
    got_map = dict(zip(got["vertex"], got["triangles"]))
    assert got_map == per
    assert int(got["triangles"].sum()) == 3 * total


def test_triangle_compaction_path_matches_direct(edges):
    """The broadcast regime's two id layouts — direct-id (small ids) vs
    rank-compaction (ids >= 2^26) — must agree: same graph shifted into the
    huge-id range yields the same count and shifted per-vertex table."""
    total, per = oracle_triangles(edges)
    OFF = 1 << 40
    shifted = [(s + OFF, d + OFF) for s, d in edges]
    got = triangle_count(
        edges_ds(shifted), num_partitions=2, per_vertex=True
    ).to_pandas()
    got_map = {int(v) - OFF: int(t) for v, t in zip(got["vertex"], got["triangles"])}
    assert got_map == per
    assert int(got["triangles"].sum()) == 3 * total


def test_combine_paths_agree(edges):
    """The direct actor-exchange and the Ray Data groupby shuffle are two
    implementations of the same partial/final aggregation — identical
    results (PageRank to 1e-12; CC/LP exact)."""
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    direct = pagerank(g1, max_iters=15, tol=0.0, combine="direct").to_pandas()
    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    viads = pagerank(g2, max_iters=15, tol=0.0, combine="dataset").to_pandas()
    a = dict(zip(direct["vertex"], direct["rank"]))
    b = dict(zip(viads["vertex"], viads["rank"]))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)

    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    g4 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    cc_a = connected_components(g3, combine="direct").to_pandas()
    cc_b = connected_components(g4, combine="dataset").to_pandas()
    assert dict(zip(cc_a["vertex"], cc_a["component"])) == dict(
        zip(cc_b["vertex"], cc_b["component"])
    )

    g5 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    g6 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    lp_a = label_propagation(g5, iters=3, combine="direct").to_pandas()
    lp_b = label_propagation(g6, iters=3, combine="dataset").to_pandas()
    assert dict(zip(lp_a["vertex"], lp_a["label"])) == dict(
        zip(lp_b["vertex"], lp_b["label"])
    )


def test_salted_pagerank_matches_unsalted(edges):
    """High-degree salting (vertex-cut mirrors) must not change results:
    a skewed graph (one hub with 300 out-edges) run with salt_threshold
    low enough to trigger splitting equals the unsalted run to 1e-12."""
    hub_edges = list(edges) + [(9999, i) for i in range(300)]
    g_plain = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=False)
    plain = pagerank(g_plain, max_iters=25, tol=0.0).to_pandas()

    g_salt = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=False, salt_threshold=50
    )
    assert g_salt.salted
    salted = pagerank(g_salt, max_iters=25, tol=0.0).to_pandas()

    a = dict(zip(plain["vertex"], plain["rank"]))
    b = dict(zip(salted["vertex"], salted["rank"]))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_salted_cc_lp_match_unsalted(edges):
    hub_edges = list(edges) + [(9999, i) for i in range(300)]
    g_plain = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=True)
    g_salt = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=True, salt_threshold=50
    )
    assert g_salt.salted
    cc_a = connected_components(g_plain).to_pandas()
    cc_b = connected_components(g_salt).to_pandas()
    assert dict(zip(cc_a["vertex"], cc_a["component"])) == dict(
        zip(cc_b["vertex"], cc_b["component"])
    )

    g3 = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=True)
    g4 = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=True, salt_threshold=50
    )
    lp_a = label_propagation(g3, iters=4).to_pandas()
    lp_b = label_propagation(g4, iters=4).to_pandas()
    assert dict(zip(lp_a["vertex"], lp_a["label"])) == dict(
        zip(lp_b["vertex"], lp_b["label"])
    )


def test_salted_dataset_combine_matches_unsalted(edges):
    """Round-3 wiring: salted graphs through the Ray Data groupby combine
    path (mirror contributions ride along as extra scatter rows) must equal
    the unsalted run — PageRank to 1e-12, CC/LP exact."""
    hub_edges = list(edges) + [(9999, i) for i in range(300)]

    g_plain = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=False)
    plain = pagerank(g_plain, max_iters=20, tol=0.0, combine="dataset").to_pandas()
    g_salt = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=False, salt_threshold=50
    )
    assert g_salt.salted
    salted = pagerank(g_salt, max_iters=20, tol=0.0, combine="dataset").to_pandas()
    a = dict(zip(plain["vertex"], plain["rank"]))
    b = dict(zip(salted["vertex"], salted["rank"]))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)

    g1 = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=True)
    g2 = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=True, salt_threshold=50
    )
    cc_a = connected_components(g1, combine="dataset").to_pandas()
    cc_b = connected_components(g2, combine="dataset").to_pandas()
    assert dict(zip(cc_a["vertex"], cc_a["component"])) == dict(
        zip(cc_b["vertex"], cc_b["component"])
    )

    g3 = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=True)
    g4 = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=True, salt_threshold=50
    )
    lp_a = label_propagation(g3, iters=4, combine="dataset").to_pandas()
    lp_b = label_propagation(g4, iters=4, combine="dataset").to_pandas()
    assert dict(zip(lp_a["vertex"], lp_a["label"])) == dict(
        zip(lp_b["vertex"], lp_b["label"])
    )


def test_salted_nmh_matches_unsalted(edges):
    """Round-3 wiring: neighborhood sketches on a salted graph (owner pushes
    hot sketch rows to mirrors each superstep) — bitwise-equal estimates."""
    from sbustreamspot_core_ray.pipelines.superstep import neighborhood_sketch

    hub_edges = list(edges) + [(9999, i) for i in range(300)]
    g_plain = ShardedGraph.build(edges_ds(hub_edges), num_parts=P, symmetric=False)
    plain = neighborhood_sketch(g_plain, iters=3, num_perm=8).to_pandas()
    g_salt = ShardedGraph.build(
        edges_ds(hub_edges), num_parts=P, symmetric=False, salt_threshold=50
    )
    assert g_salt.salted
    salted = neighborhood_sketch(g_salt, iters=3, num_perm=8).to_pandas()
    a = dict(zip(plain["vertex"], plain["nf_est"]))
    b = dict(zip(salted["vertex"], salted["nf_est"]))
    assert a == b  # integer min-hash state -> bitwise-equal floats


def test_cc_checkpoint_resume(tmp_path, edges):
    ck = str(tmp_path / "cc_ck")
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    full = connected_components(g1).to_pandas()

    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    connected_components(g2, max_iters=2, ckpt_dir=ck, ckpt_every=1)  # "killed"
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    resumed = connected_components(g3, ckpt_dir=ck, ckpt_every=1).to_pandas()

    assert dict(zip(full["vertex"], full["component"])) == dict(
        zip(resumed["vertex"], resumed["component"])
    )


def test_pagerank_checkpoint_resume(tmp_path, edges):
    """Kill-and-resume: a run restarted from the checkpoint manifest ends in
    the identical state (FIXTURES.md §5 resume property)."""
    ck = str(tmp_path / "ck")
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    full = pagerank(g1, max_iters=40, tol=0.0).to_pandas()

    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    pagerank(g2, max_iters=20, tol=0.0, ckpt_dir=ck, ckpt_every=1)  # "killed" at 20
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    resumed = pagerank(g3, max_iters=40, tol=0.0, ckpt_dir=ck, ckpt_every=1).to_pandas()

    a = dict(zip(full["vertex"], full["rank"]))
    b = dict(zip(resumed["vertex"], resumed["rank"]))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_personalized_pagerank_checkpoint_resume(tmp_path, edges):
    """PPR kill-and-resume (round 4): the restore path rebuilds the derived
    teleport vector from the caller's seed set, so a resumed run ends in
    the identical state as an uninterrupted one."""
    seeds = [1, 7, 42]
    ck = str(tmp_path / "ppr_ck")
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    full = pagerank(
        g1, max_iters=40, tol=0.0, teleport_seeds=seeds
    ).to_pandas()

    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    pagerank(
        g2, max_iters=20, tol=0.0, teleport_seeds=seeds,
        ckpt_dir=ck, ckpt_every=1,
    )  # "killed" at 20
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    resumed = pagerank(
        g3, max_iters=40, tol=0.0, teleport_seeds=seeds,
        ckpt_dir=ck, ckpt_every=1,
    ).to_pandas()

    a = dict(zip(full["vertex"], full["rank"]))
    b = dict(zip(resumed["vertex"], resumed["rank"]))
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)

    # mode-mismatch guard: resuming a PPR checkpoint as classic (or vice
    # versa) must refuse instead of silently changing semantics
    g4 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    with pytest.raises(ValueError, match="ppr"):
        pagerank(g4, max_iters=5, ckpt_dir=ck)


def test_neighborhood_sketch_parity(edges):
    """nmh supersteps == synchronous numpy simulation (exact: the state is
    integer min-hashes, so equality is bitwise)."""
    from sbustreamspot_core_ray.pipelines.superstep import neighborhood_sketch

    k, iters, seed = 8, 3, 23
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=False)
    out = (
        neighborhood_sketch(g, iters=iters, num_perm=k, seed=seed)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )

    # pure-numpy oracle with the identical seeded permutation family
    src = np.array([e[0] for e in edges], np.int64)
    dst = np.array([e[1] for e in edges], np.int64)
    vs = np.unique(np.concatenate([src, dst]))
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**61 - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, 2**61 - 1, size=k, dtype=np.uint64)
    p = np.uint64((1 << 61) - 1)
    with np.errstate(over="ignore"):
        S = ((vs.astype(np.uint64)[:, None] * a[None, :]) + b[None, :]) % p
    si = np.searchsorted(vs, src)
    di = np.searchsorted(vs, dst)
    for _ in range(iters):
        nxt = S.copy()
        np.minimum.at(nxt, di, S[si])
        S = nxt
    est = k / (S.astype(np.float64) / float(p)).sum(axis=1) - 1.0

    assert (out["vertex"].to_numpy() == vs).all()
    assert np.array_equal(out["nf_est"].to_numpy(), est)
    # sanity: estimates grow with reach and are >= 0-ish for singles
    assert (out["nf_est"] > -0.5).all()


def test_kcore_multi_round_peeling():
    """Triangle {1,2,3} with a tail 3-4-5: k=2 peeling kills 5 (deg 1),
    then 4 (deg drops to 1) — two rounds — leaving the triangle with
    core degrees 2/2/2. Also checks the numpy brute-force on a random
    graph."""
    from sbustreamspot_core_ray.pipelines.superstep import kcore

    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    out = kcore(g, k=2).to_pandas().sort_values("vertex").reset_index(drop=True)
    assert list(out["vertex"]) == [1, 2, 3]
    assert list(out["core_deg"]) == [2, 2, 2]

    rnd = random_graph(n=120, m=500, seed=7)
    g2 = ShardedGraph.build(edges_ds(rnd), num_parts=4, symmetric=True)
    got = kcore(g2, k=3).to_pandas().sort_values("vertex").reset_index(drop=True)
    # numpy brute-force peeling oracle
    a = np.array([min(e) for e in rnd]); b = np.array([max(e) for e in rnd])
    m = a != b
    pairs = np.unique(np.stack([a[m], b[m]], 1), axis=0)
    s = np.concatenate([pairs[:, 0], pairs[:, 1]])
    d = np.concatenate([pairs[:, 1], pairs[:, 0]])
    verts = np.unique(s)
    si = np.searchsorted(verts, s); di = np.searchsorted(verts, d)
    alive = np.ones(len(verts), bool)
    while True:
        deg = np.bincount(si[alive[si] & alive[di]], minlength=len(verts))
        newdead = alive & (deg < 3)
        if not newdead.any():
            break
        alive[newdead] = False
    want_v = verts[alive]
    want_deg = np.bincount(si[alive[si] & alive[di]], minlength=len(verts))[alive]
    assert list(got["vertex"]) == list(want_v)
    assert list(got["core_deg"]) == list(want_deg)


def test_common_neighbors_both_regimes():
    """Square 1-2-4-3 with diagonal 2-3: the only non-adjacent pair is
    (1,4) with common neighbors {2,3}. Both anti-join regimes (broadcast
    edge array; sentinel rows through the reducers) must agree."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    for cap in (50_000_000, 0):  # broadcast regime / sentinel regime
        out = (
            common_neighbors(
                edges_ds(edges), top_n=10, num_partitions=4,
                broadcast_edges_max=cap,
            )
            .to_pandas()
            .reset_index(drop=True)
        )
        assert list(out["src"]) == [1], (cap, out)
        assert list(out["dst"]) == [4]
        assert list(out["cn"]) == [2]


def test_personalized_pagerank_seed_mass():
    """PPR on a small graph: total rank mass stays 1 (teleport + dangling
    both land on seeds), non-seed source-only components get zero, and
    seeds dominate their own neighborhoods."""
    from sbustreamspot_core_ray.pipelines.superstep import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=False)
    out = (
        pagerank(g, max_iters=30, tol=0.0, teleport_seeds=np.array([1]))
        .to_pandas()
        .set_index("vertex")["rank"]
    )
    assert abs(out.sum() - 1.0) < 1e-9
    # the 10<->11 component is unreachable from seed 1: zero mass
    assert out[10] == 0.0 and out[11] == 0.0
    # seed 1 holds the most mass in its cycle
    assert out[1] > out[2] > 0 and out[1] > out[3] > 0


def test_bfs_distance_layers():
    """Multi-source BFS on a path + branch graph: exact hop layers, the
    unreachable component absent, and the max_hops cap honored."""
    from sbustreamspot_core_ray.pipelines.superstep import bfs_distance

    # path 1-2-3-4-5 plus branch 3-6; separate component 10-11
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6), (10, 11)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    out = (
        bfs_distance(g, seeds=[1], max_hops=8)
        .to_pandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 3}

    capped = (
        bfs_distance(g, seeds=[1], max_hops=2)
        .to_pandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert capped == {1: 0, 2: 1, 3: 2}


def test_landmark_distances_path():
    """Single landmark 1 on the path 1-2-3-4: lb = |d(1,u)-d(1,v)|,
    ub = d(1,u)+d(1,v) for every sampled pair, ordered by (ub, u, v);
    the disconnected component never appears (no common landmark)."""
    from sbustreamspot_core_ray.pipelines.superstep import landmark_distances

    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    t = landmark_distances(
        g, seeds=[1], sample_mod=1, max_hops=8, topn=100, block=2
    ).to_pandas()
    rows = list(t.itertuples(index=False, name=None))
    assert rows == [
        (1, 2, 1, 1),
        (1, 3, 2, 2),
        (1, 4, 3, 3),
        (2, 3, 1, 3),
        (2, 4, 2, 4),
        (3, 4, 1, 5),
    ]


def test_adamic_adar_weights():
    """AA on a known wedge structure matches the hand-computed integer
    surrogate floor(1e9/ln(deg(center))) summed per non-adjacent pair."""
    import math

    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    # centers: 3 connects {1,2,4}; 5 connects {1,4}; pair (1,4) gets both
    edges = [(1, 3), (2, 3), (4, 3), (1, 5), (4, 5)]
    out = (
        common_neighbors(
            edges_ds(edges), top_n=10, num_partitions=4, weight="adamic_adar"
        )
        .to_pandas()
        .set_index(["src", "dst"])["cn"]
        .to_dict()
    )
    w3 = math.floor(1e9 / math.log(3))  # deg(3) = 3
    w5 = math.floor(1e9 / math.log(2))  # deg(5) = 2
    assert out[(1, 4)] == w3 + w5
    assert out[(1, 2)] == w3 and out[(2, 4)] == w3
    assert out[(3, 5)] == 2 * w5  # wedges through centers 1 and 4 (deg 2)
    # adjacent pairs excluded
    assert (1, 3) not in out and (4, 5) not in out


def test_hits_vs_numpy_oracle():
    """HITS on a random directed graph matches a dense numpy power
    iteration (same L1 normalization) to 1e-12 — exercises both the
    forward exchange and the reverse-route pull."""
    from sbustreamspot_core_ray.pipelines.superstep import hits

    rng = np.random.default_rng(23)
    n, m = 120, 700
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    g = ShardedGraph.build(
        edges_ds([tuple(r) for r in edges]), num_parts=4, symmetric=False
    )
    out = hits(g, iters=6).to_pandas().set_index("vertex").sort_index()

    verts = np.unique(edges)
    vi = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for s, d in edges:
        A[vi[s], vi[d]] = 1.0
    h = np.ones(len(verts))
    for _ in range(6):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    assert np.allclose(out["auth"].to_numpy(), a[np.searchsorted(verts, out.index)], atol=1e-12)
    assert np.allclose(out["hub"].to_numpy(), h[np.searchsorted(verts, out.index)], atol=1e-12)
    assert abs(out["auth"].sum() - 1.0) < 1e-9 and abs(out["hub"].sum() - 1.0) < 1e-9


def test_neighbor_degree_agg_exact():
    """One-superstep (sum, max) neighbor-degree aggregation on a small
    symmetric graph matches hand computation; degree = full degree."""
    from sbustreamspot_core_ray.pipelines.superstep import neighbor_degree_agg

    # star 1-{2,3,4} plus edge 2-3: deg(1)=3, deg(2)=2, deg(3)=2, deg(4)=1
    edges = [(1, 2), (1, 3), (1, 4), (2, 3)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    out = neighbor_degree_agg(g).to_pandas().set_index("vertex")
    want = {
        1: (2 + 2 + 1, 2),  # neighbors 2,3,4
        2: (3 + 2, 3),      # neighbors 1,3
        3: (3 + 2, 3),      # neighbors 1,2
        4: (3, 3),          # neighbor 1
    }
    for v, (s, m) in want.items():
        assert out.loc[v, "nbr_deg_sum"] == s and out.loc[v, "nbr_deg_max"] == m


def test_weighted_pagerank_multiplicity():
    """Weighted build counts duplicate (src,dst) rows as edge weight;
    pagerank matches a dense numpy weighted power iteration; weighted +
    salting is rejected."""
    # 1->2 (w=3), 1->3 (w=1), 2->3 (w=2), 3->1 (w=1)
    raw = [(1, 2)] * 3 + [(1, 3)] + [(2, 3)] * 2 + [(3, 1)]
    g = ShardedGraph.build(edges_ds(raw), num_parts=4, symmetric=False, weighted=True)
    got = (
        pagerank(g, damping=0.85, max_iters=30, tol=0.0)
        .to_pandas()
        .set_index("vertex")["rank"]
        .sort_index()
    )

    verts = [1, 2, 3]
    W = {(1, 2): 3.0, (1, 3): 1.0, (2, 3): 2.0, (3, 1): 1.0}
    import collections
    wout = collections.Counter()
    for (s, _), w in W.items():
        wout[s] += w
    r = {v: 1 / 3 for v in verts}
    for _ in range(30):
        contrib = {v: 0.0 for v in verts}
        for (s, d), w in W.items():
            contrib[d] += r[s] * w / wout[s]
        dang = sum(r[v] for v in verts if wout[v] == 0)
        r = {v: 0.15 / 3 + 0.85 * (contrib[v] + dang / 3) for v in verts}
    for v in verts:
        assert got[v] == pytest.approx(r[v], abs=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9

    with pytest.raises(ValueError, match="salting"):
        ShardedGraph.build(
            edges_ds(raw), num_parts=4, weighted=True, salt_threshold=1
        )


def test_sssp_weighted_multiplicity():
    """Integer-weight SSSP on a weighted symmetric build matches hand
    Dijkstra; unweighted builds are rejected."""
    from sbustreamspot_core_ray.pipelines.superstep import sssp_distance

    # undirected weights: (1,2)=1, (2,3)=1, (1,3)=5, (3,4)=2
    raw = [(1, 2)] + [(2, 3)] + [(1, 3)] * 5 + [(3, 4)] * 2
    g = ShardedGraph.build(
        edges_ds(raw), num_parts=4, symmetric=True, weighted=True
    )
    out = (
        sssp_distance(g, seeds=np.array([1], np.int64))
        .to_pandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert out == {1: 0, 2: 1, 3: 2, 4: 4}

    g2 = ShardedGraph.build(edges_ds(raw), num_parts=4, symmetric=True)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        sssp_distance(g2, seeds=np.array([1], np.int64))


def test_degree_assortativity_star():
    """A star K1,3 is perfectly disassortative: r = -1."""
    from sbustreamspot_core_ray.pipelines.superstep import degree_assortativity

    out = degree_assortativity(
        edges_ds([(1, 2), (1, 3), (1, 4)]), num_partitions=2
    ).to_pandas()
    assert out.loc[0, "edges"] == 3
    assert out.loc[0, "assortativity"] == -1.0


def test_random_walks_deterministic():
    """Walks follow the seeded-hash neighbor pick over sorted adjacency;
    absent seeds emit nothing; two runs are identical."""
    from sbustreamspot_core_ray.pipelines.superstep import random_walks

    # path graph 1-2-3 plus 2-4 (symmetric)
    edges = [(1, 2), (2, 3), (2, 4)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    seeds = np.array([1, 99], np.int64)  # 99 absent
    out = (
        random_walks(g, seeds=seeds, length=3)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    assert set(out["walk_id"]) == {1}
    assert list(out["step"]) == [0, 1, 2, 3]
    # replay the pick rule by hand
    adj = {1: [2], 2: [3, 4, 1], 3: [2], 4: [2]}
    for k, v in adj.items():
        v.sort()
    v, walk = 1, [1]
    for step in (1, 2, 3):
        nbrs = adj[v]
        v = nbrs[(1 * 2654435761 + step * 40503) % len(nbrs)]
        walk.append(v)
    assert list(out["vertex"]) == walk

    out2 = random_walks(g, seeds=seeds, length=3).to_pandas()
    assert sorted(out2["vertex"]) == sorted(out["vertex"])


def test_walk_skipgrams_window():
    """Hand-checked pair counts for one walk [10, 20, 30, 40], window 2."""
    import pyarrow as pa

    from sbustreamspot_core_ray.pipelines.superstep import walk_skipgrams

    walks = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([7, 7, 7, 7], pa.int64()),
                "step": pa.array([0, 1, 2, 3], pa.int64()),
                "vertex": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    out = walk_skipgrams(walks, window=2, num_parts=2).to_pandas()
    got = {(c, x): n for c, x, n in zip(out["center"], out["context"], out["n"])}
    want_pairs = set()
    seq = [10, 20, 30, 40]
    for i in range(4):
        for j in range(4):
            if i != j and abs(i - j) <= 2:
                want_pairs.add((seq[i], seq[j]))
    assert set(got) == want_pairs
    assert all(n == 1 for n in got.values())
    assert sum(got.values()) == 10  # 3 adjacent pairs *2 + 2 dist-2 pairs *2


def test_pagerank_warm_start_overlay():
    """warm_start_ranks seeds prior ranks + default for new vertices, and
    skip_init pagerank continues from them; identical to a dense numpy
    two-phase iteration."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        pagerank,
        warm_start_ranks,
    )

    # phase 1: 1->2, 2->1 (2-cycle); phase 2 adds 2->3
    g1 = ShardedGraph.build(edges_ds([(1, 2), (2, 1)]), num_parts=2)
    r1 = pagerank(g1, damping=0.85, max_iters=3, tol=0.0)
    g2 = ShardedGraph.build(edges_ds([(1, 2), (2, 1), (2, 3)]), num_parts=2)
    overlaid = warm_start_ranks(g2, r1, default=1.0 / 3.0)
    assert overlaid == 2
    got = (
        pagerank(g2, damping=0.85, max_iters=2, tol=0.0, skip_init=True)
        .to_pandas()
        .set_index("vertex")["rank"]
        .to_dict()
    )

    # dense replay
    r = {1: 0.5, 2: 0.5}
    for _ in range(3):  # phase 1 on the 2-cycle
        r = {1: 0.15 / 2 + 0.85 * r[2], 2: 0.15 / 2 + 0.85 * r[1]}
    rr = {1: r[1], 2: r[2], 3: 1.0 / 3.0}
    adj = {1: [2], 2: [1, 3]}
    for _ in range(2):  # phase 2 warm
        contrib = {1: 0.0, 2: 0.0, 3: 0.0}
        for s, outs in adj.items():
            for t in outs:
                contrib[t] += rr[s] / len(outs)
        dang = rr[3]  # vertex 3 dangles
        rr = {v: 0.15 / 3 + 0.85 * (contrib[v] + dang / 3) for v in (1, 2, 3)}
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(rr[v], abs=1e-12)


def test_katz_vs_numpy_oracle():
    """Katz centrality on a random directed graph matches a dense numpy
    replay of x_{k+1} = beta + alpha * A^T x_k to 1e-12."""
    from sbustreamspot_core_ray.pipelines.superstep import katz_centrality

    rng = np.random.default_rng(29)
    n, m = 120, 700
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    g = ShardedGraph.build(
        edges_ds([tuple(r) for r in edges]), num_parts=4, symmetric=False
    )
    out = katz_centrality(g, alpha=0.05, beta=1.0, iters=6).to_pandas()
    out = out.set_index("vertex").sort_index()

    verts = np.unique(edges)
    vi = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for s, d in edges:
        A[vi[s], vi[d]] = 1.0
    x = np.ones(len(verts))
    for _ in range(6):
        x = 1.0 + 0.05 * (A.T @ x)
    assert np.allclose(
        out["katz"].to_numpy(), x[np.searchsorted(verts, out.index)], atol=1e-12
    )


def test_sampled_farness_vs_python_bfs():
    """Per-vertex (reach_cnt, dist_sum) over 3 sample seeds matches a
    plain Python BFS replay on an undirected random graph."""
    from collections import deque

    from sbustreamspot_core_ray.pipelines.superstep import sampled_farness

    rng = np.random.default_rng(31)
    n, m = 100, 260
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = [tuple(r) for r in np.stack([src[keep], dst[keep]], axis=1)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    seeds = [3, 17, 42]
    out = (
        sampled_farness(g, seeds=np.array(seeds, np.int64), max_hops=64)
        .to_pandas()
        .set_index("vertex")
        .sort_index()
    )

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    cnt, tot = {}, {}
    for seed in seeds:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, dd in dist.items():
            cnt[v] = cnt.get(v, 0) + 1
            tot[v] = tot.get(v, 0) + dd
    assert set(out.index) == set(cnt)
    for v in cnt:
        assert out.loc[v, "reach_cnt"] == cnt[v]
        assert out.loc[v, "dist_sum"] == tot[v]


def test_jaccard_links_vs_bruteforce():
    """score="jaccard" ranks non-adjacent pairs by exact integer-billionth
    Jaccard; matches a brute-force set computation."""
    from itertools import combinations

    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    rng = np.random.default_rng(37)
    n, m = 60, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = [tuple(r) for r in np.stack([src[keep], dst[keep]], axis=1)]
    got = (
        common_neighbors(edges_ds(edges), top_n=25, num_partitions=4, score="jaccard")
        .to_pandas()
        .reset_index(drop=True)
    )

    adj = {}
    eset = set()
    for s, d in edges:
        a, b = (s, d) if s < d else (d, s)
        if a == b:
            continue
        eset.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for a, b in combinations(sorted(adj), 2):
        if (a, b) in eset:
            continue
        cn = len(adj[a] & adj[b])
        if cn == 0:
            continue
        den = len(adj[a]) + len(adj[b]) - cn
        rows.append((1_000_000_000 * cn // den, a, b, cn))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = rows[:25]
    assert len(got) == len(want)
    for i, (jac, a, b, cn) in enumerate(want):
        assert (
            got.loc[i, "src"],
            got.loc[i, "dst"],
            got.loc[i, "jac_e9"],
            got.loc[i, "cn"],
        ) == (a, b, jac, cn)


def test_mis_matches_sequential_greedy():
    """The parallel greedy-by-id MIS equals the sequential greedy by
    ascending id (lexicographically-first MIS), and is independent+maximal."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        maximal_independent_set,
    )

    rng = np.random.default_rng(41)
    n, m = 120, 400
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    edges = [tuple(r) for r in np.stack([src[keep], dst[keep]], axis=1)]
    g = ShardedGraph.build(edges_ds(edges), num_parts=4, symmetric=True)
    got = set(maximal_independent_set(g).to_pandas()["vertex"])

    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    mis = set()
    for v in sorted(adj):
        if not (adj[v] & mis):
            mis.add(v)
    assert got == mis
    for v in got:  # independence
        assert not (adj[v] & got - {v})
    for v in set(adj) - got:  # maximality
        assert adj[v] & got


def test_warm_start_cc_matches_cold(edges):
    """Incremental CC: converge on half the edges, warm-start on the full
    set — fixpoint must equal cold CC on the full graph."""
    from sbustreamspot_core_ray.pipelines.superstep import warm_start_labels

    half = edges[: len(edges) // 2]
    g1 = ShardedGraph.build(edges_ds(half), num_parts=P, symmetric=True)
    c1 = connected_components(g1)
    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    warm_start_labels(g2, c1)
    warm = (
        connected_components(g2, skip_init=True)
        .to_pandas()
        .set_index("vertex")["component"]
        .sort_index()
    )
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    cold = (
        connected_components(g3)
        .to_pandas()
        .set_index("vertex")["component"]
        .sort_index()
    )
    assert (warm == cold).all()


def test_bipartite_check_path_vs_triangle():
    """Hand-checked: component {0-1-2-3} is an even path (bipartite);
    component {10,11,12} is a triangle (odd cycle) with a pendant 13.
    Seeds 0 and 10; seed 99 is absent from the graph (all-zero row)."""
    from sbustreamspot_core_ray.pipelines.superstep import bipartite_check

    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (12, 13)]
    ds = edges_ds(edges)
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    t = bipartite_check(
        g, ds, seeds=np.array([0, 10, 99], np.int64), max_hops=8,
        num_partitions=P,
    ).to_pandas().set_index("seed")
    assert t.loc[0, "n_reached"] == 4
    assert t.loc[0, "n_edges_both"] == 3
    assert t.loc[0, "odd_edges"] == 0
    assert bool(t.loc[0, "is_bipartite"])
    assert t.loc[10, "n_reached"] == 4
    assert t.loc[10, "n_edges_both"] == 4
    # triangle 10-11-12 from seed 10: dists 0,1,1 -> edge (11,12) is the
    # sole equal-parity edge
    assert t.loc[10, "odd_edges"] == 1
    assert not bool(t.loc[10, "is_bipartite"])
    assert t.loc[99, "n_reached"] == 0
    assert t.loc[99, "n_edges_both"] == 0
    assert bool(t.loc[99, "is_bipartite"])


def test_bipartite_check_hop_cap_hides_far_conflict():
    """The cap is part of the semantics: a triangle 3 hops away is not
    reached at max_hops=2, so the explored subgraph reads bipartite."""
    from sbustreamspot_core_ray.pipelines.superstep import bipartite_check

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3)]
    ds = edges_ds(edges)
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    t = bipartite_check(
        g, ds, seeds=np.array([0], np.int64), max_hops=2, num_partitions=P
    ).to_pandas()
    assert t["n_reached"].tolist() == [3]  # 0,1,2
    assert t["odd_edges"].tolist() == [0]
    assert t["is_bipartite"].tolist() == [True]


def test_maximal_matching_path_chain_rounds():
    """Path 1-2-3-4-5: mutual-min matches (1,2) in round 1 — pointers
    3->2, 4->3, 5->4 all chase taken/unrequited partners — then (3,4) in
    round 2; 5 stays single. Matches the sequential handshake by hand."""
    from sbustreamspot_core_ray.pipelines.superstep import maximal_matching

    g = ShardedGraph.build(
        edges_ds([(1, 2), (2, 3), (3, 4), (4, 5)]), num_parts=P,
        symmetric=True,
    )
    df = maximal_matching(g).to_pandas().sort_values("vertex")
    assert list(zip(df["vertex"], df["partner"], df["round"])) == [
        (1, 2, 1),
        (3, 4, 2),
    ]


def test_maximal_matching_is_maximal_and_valid():
    """On a random graph: no vertex in two pairs, every pair is an edge,
    and no remaining edge has both endpoints free (maximality)."""
    from sbustreamspot_core_ray.pipelines.superstep import maximal_matching
    from .oracles import random_graph

    edges = random_graph(n=120, m=600, seed=7)
    g = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    df = maximal_matching(g).to_pandas()
    matched = set(df["vertex"]) | set(df["partner"])
    assert len(matched) == 2 * len(df)  # disjoint pairs
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for a, b in zip(df["vertex"], df["partner"]):
        assert (a, b) in und
    for a, b in und:
        assert a in matched or b in matched  # maximal


def test_temporal_reachability_hand_case():
    """Time-respecting semantics must differ from static BFS: vertex 3 is
    statically reachable but its only in-edge departs before any arrival
    at 2; vertex 30 is reached via the later of two paths' minimum."""
    from sbustreamspot_core_ray.pipelines.superstep import temporal_reachability

    e = [
        (1, 2, 5),
        (2, 3, 3),    # departs at 3 < arrival(2)=5 -> 3 unreachable
        (2, 4, 7),
        (1, 5, 2),
        (5, 30, 4),
        (2, 30, 9),   # later witness; min stays 4
        (9, 9, 1),    # disconnected self-loop, not a seed
    ]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
                "t": pa.array([x[2] for x in e], pa.int64()),
            }
        )
    )
    # all three regimes must agree: driver-merged small state (default),
    # a mid-computation handoff to the shuffle loop (threshold 2: the
    # arrival table outgrows it after round 1), and the co-partitioned
    # _attach_value fallback from round 1 (threshold 0)
    for bt in (1_000_000, 2, 0):
        got = (
            temporal_reachability(
                edges, seeds=[1, 77], num_partitions=4, start_t=0,
                broadcast_threshold=bt,
            )
            .to_pandas()
            .sort_values("vertex")
            .reset_index(drop=True)
        )
        # seed 77 is not a source in the edge table -> dropped
        assert got["vertex"].tolist() == [1, 2, 4, 5, 30]
        assert got["t_arr"].tolist() == [0, 5, 7, 2, 4]


def test_temporal_reachability_multi_round_improvement():
    """A later round must lower an arrival set in an earlier round: the
    direct edge to 4 arrives at 9, the two-hop path lowers it to 6."""
    from sbustreamspot_core_ray.pipelines.superstep import temporal_reachability

    e = [(1, 4, 9), (1, 2, 1), (2, 3, 2), (3, 4, 6)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
                "t": pa.array([x[2] for x in e], pa.int64()),
            }
        )
    )
    got = (
        temporal_reachability(edges, seeds=[1], num_partitions=2, start_t=0)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert got["vertex"].tolist() == [1, 2, 3, 4]
    assert got["t_arr"].tolist() == [0, 1, 2, 6]


def test_link_negative_samples_vs_python_oracle():
    """The seeded-hash candidates and anti-join must match a direct
    python recomputation, and no negative may be a real edge."""
    from sbustreamspot_core_ray.pipelines.superstep import link_negative_samples

    e = [(1, 100), (1, 101), (2, 100), (3, 102), (7, 103)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )
    K = 3
    C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD)
    # both anti-join regimes must agree: broadcast key set (default) and
    # the hashed-key shuffle fallback (threshold 0)
    regimes = [
        link_negative_samples(edges, k=K, num_partitions=4,
                              c1=C[0], c2=C[1], c3=C[2],
                              broadcast_keys_threshold=bt)
        .to_pandas()
        .sort_values(["label", "src", "dst"])
        .reset_index(drop=True)
        for bt in (50_000_000, 0)
    ]
    assert regimes[0].equals(regimes[1])
    got = regimes[0]

    dsts = sorted({d for _, d in e})
    n = len(dsts)
    eset = set(e)
    want_neg = []
    for s, d in e:
        for j in range(1, K + 1):
            idx = ((s * C[0] + d * C[1] + j * C[2]) % (1 << 64)) % n
            w = dsts[idx]
            if (s, w) not in eset:
                want_neg.append((s, w, 0))
    want = sorted(want_neg) + sorted((s, d, 1) for s, d in e)
    assert got[["src", "dst", "label"]].to_numpy().tolist() == [
        list(x) for x in sorted(want, key=lambda r: (r[2], r[0], r[1]))
    ]
    negs = got[got["label"] == 0]
    assert len(negs) > 0
    assert not any((s, d) in eset for s, d in zip(negs["src"], negs["dst"]))


def test_wl_refinement_vs_bigint_oracle():
    """Colors after 2 rounds must equal a direct Python big-int
    recomputation, and structurally equivalent vertices (the two leaves
    of a star) must share a color that the hub does not."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        WL_CG, WL_CI, WL_CO, WL_CS, wl_refinement,
    )

    P61 = (1 << 61) - 1
    e = [(1, 2), (1, 3), (4, 5), (5, 6), (6, 4)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )
    got = (
        wl_refinement(edges, rounds=2)
        .to_pandas()
        .set_index("vertex")["wl_color"]
        .to_dict()
    )

    verts = sorted({v for x in e for v in x})
    c = {v: 1 for v in verts}
    for _ in range(2):
        so = {v: 0 for v in verts}
        si = {v: 0 for v in verts}
        for s, d in e:
            so[s] = (so[s] + c[d] * WL_CG) % P61
            si[d] = (si[d] + c[s] * WL_CG) % P61
        c = {
            v: (c[v] * WL_CS + so[v] * WL_CO + si[v] * WL_CI + 1) % P61
            for v in verts
        }
    assert got == c
    # leaves 2 and 3 are structurally identical; hub 1 differs
    assert got[2] == got[3] != got[1]
    # the directed 3-cycle vertices are all equivalent
    assert got[4] == got[5] == got[6]


def test_densest_subgraph_peel_vs_numpy_replica():
    """K4 plus a pendant chain: round 0 peels the chain, round 1 is the
    K4 whose uniform degree 3 <= 2*1.1*(6/4) peels everything (loop
    breaks after recording it). Checked against a generic numpy replica
    of the identical integer thresholds."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        densest_subgraph_peel,
    )

    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )
    got = densest_subgraph_peel(edges, eps_num=11, eps_den=10).to_pandas()

    s = np.array([x[0] for x in e], np.int64)
    d = np.array([x[1] for x in e], np.int64)
    want = []
    rnd = 0
    while len(s):
        v, c = np.unique(np.concatenate([s, d]), return_counts=True)
        nv, ne = len(v), len(s)
        want.append((rnd, nv, ne))
        keep = c * 10 * nv > 2 * 11 * ne
        if keep.all():
            break
        sv = v[keep]
        ok = np.isin(s, sv) & np.isin(d, sv)
        s, d = s[ok], d[ok]
        rnd += 1
    assert got.to_numpy().tolist() == [list(r) for r in want]
    assert want == [(0, 6, 8), (1, 4, 6)]


def test_square_count_known_graphs():
    """C4 census: one plain 4-cycle (+chord unchanged), K4 has 3, K_{2,3}
    has C(3,2)=3."""
    from sbustreamspot_core_ray.pipelines.superstep import square_count

    def sq(pairs):
        import ray.data

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], pa.int64()),
                    "dst": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )
        return square_count(edges, num_partitions=4).to_pandas().iloc[0]

    assert sq([(1, 2), (2, 3), (3, 4), (4, 1)])["squares"] == 1
    assert sq([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])["squares"] == 1
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert sq(k4)["squares"] == 3
    k23 = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)]
    assert sq(k23)["squares"] == 3
    # duplicate + reversed + self-loop rows must not change the census
    assert sq(k23 + [(10, 1), (1, 10), (5, 5)])["squares"] == 3


def test_percolation_sweep_hand_case():
    """keep=100 keeps both components intact; keep=0 empties the graph;
    intermediate levels match a local replication of the hash filter."""
    import ray.data

    from sbustreamspot_core_ray.pipelines.superstep import percolation_sweep

    src = np.array([1, 1, 2, 5, 6], np.int64)
    dst = np.array([2, 3, 3, 6, 7], np.int64)
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    )
    out = (
        percolation_sweep(edges, keeps=(100, 60, 0), num_parts=4)
        .to_pandas()
        .set_index("keep_pct")
    )
    # components {1,2,3} and {5,6,7}: 6 vertices, 5 edges, giant size 3
    assert tuple(out.loc[100]) == (6, 5, 2, 3)
    assert tuple(out.loc[0]) == (0, 0, 0, 0)
    # replicate the 60% filter locally
    h = (src * 2654435761 + dst * 40503) % 100
    kept = h < 60
    assert out.loc[60]["n_edges"] == int(kept.sum())


def test_pagerank_drift_semantics():
    """Drift = rank_full - rank_thinned on the shared vertex set, cut by
    (|delta| desc, vertex); a vertex whose only in-edge is dropped by the
    hash filter must show positive drift when it returns."""
    import __ray_entry__ as E

    out = E.q_pagerank_drift("/root/testdata/sf0.001").to_pandas()
    assert list(out.columns) == ["vertex", "rank_old", "rank_new", "delta"]
    assert len(out) == E.PR_DRIFT_TOPN
    d = out["delta"].to_numpy()
    assert np.allclose(d, out["rank_new"] - out["rank_old"])
    a = np.abs(d)
    assert (a[:-1] >= a[1:] - 1e-15).all()  # non-increasing |delta|
    assert a[0] > 0  # thinning 10% of edges moves at least one rank


def test_attack_sweep_vs_networkx():
    """Hub-removal sweep vs networkx on a hub-and-spoke fixture where the
    attack provably shatters the graph (and ties at the cutoff degree are
    resolved by smallest id, mirrored here)."""
    import networkx as nx

    from sbustreamspot_core_ray.pipelines.superstep import attack_sweep

    # two hubs (1, 2) each with 40 spokes, bridged by one edge; plus a
    # separate 10-cycle so removal ties exercise the id order
    arcs = [(1, 100 + i) for i in range(40)] + [(2, 200 + i) for i in range(40)]
    arcs += [(1, 2)]
    arcs += [(300 + i, 300 + (i + 1) % 10) for i in range(10)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in arcs], pa.int64()),
                "dst": pa.array([b for _, b in arcs], pa.int64()),
            }
        )
    )
    got = (
        attack_sweep(edges, removes=(0, 2, 20), num_parts=4)
        .to_pandas()
        .set_index("remove_pct")
    )

    g0 = nx.Graph(arcs)
    n_v = g0.number_of_nodes()
    deg = dict(g0.degree())
    order = sorted(deg, key=lambda v: (-deg[v], v))
    for R in (0, 2, 20):
        k = (n_v * R) // 100
        g = g0.copy()
        g.remove_nodes_from(order[:k])
        g.remove_nodes_from([v for v in list(g) if g.degree(v) == 0])
        comps = list(nx.connected_components(g))
        row = got.loc[R]
        assert int(row["n_removed"]) == k
        assert int(row["n_vertices"]) == g.number_of_nodes()
        assert int(row["n_edges"]) == g.number_of_edges()
        assert int(row["n_components"]) == len(comps)
        assert int(row["giant_size"]) == (
            max(len(c) for c in comps) if comps else 0
        )
    # the attack must actually shatter the hubs at 2% (k=1: hub 1 removed)
    assert int(got.loc[2, "giant_size"]) < int(got.loc[0, "giant_size"])


def test_community_conductance_hand_case():
    """cut/vol on a two-cluster barbell with a hand-checkable bridge:
    conductance of each triangle community is 1/7, and the label table is
    supplied directly so the test pins the operator, not LPA."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        community_conductance,
    )

    # two triangles {1,2,3} and {4,5,6} joined by bridge (3, 4); plus an
    # isolated self-loop vertex 9 that must be excluded (degree 0)
    arcs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (9, 9)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in arcs], pa.int64()),
                "dst": pa.array([b for _, b in arcs], pa.int64()),
            }
        )
    )
    labels = ray.data.from_arrow(
        pa.table(
            {
                "vertex": pa.array([1, 2, 3, 4, 5, 6, 9], pa.int64()),
                "label": pa.array([1, 1, 1, 4, 4, 4, 9], pa.int64()),
            }
        )
    )
    got = (
        community_conductance(edges, labels, topn=10, num_parts=4)
        .to_pandas()
        .set_index("label")
    )
    assert set(got.index) == {1, 4}  # label 9 excluded: vol 0
    for lbl in (1, 4):
        row = got.loc[lbl]
        # vol = 2+2+3 = 7 (bridge endpoint has deg 3), cut = 1
        assert int(row["n_vertices"]) == 3
        assert int(row["vol"]) == 7
        assert int(row["cut"]) == 1
        assert abs(row["conductance"] - round(1 / 7, 6)) < 1e-12


def test_sharded_graph_pool_reclaimed_on_drop():
    """Regression for the session-lifetime shard-pool leak: set_peers forms
    an actor-handle cycle Ray's refcounting never collects, so dropping the
    driver wrapper must explicitly kill the pool (__del__ -> shutdown).
    Results fetched before the drop must survive the kill (drain barrier)."""
    import gc

    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        pagerank,
    )

    def alive_shards() -> int:
        try:
            from ray.util.state import list_actors

            return sum(
                1
                for a in list_actors(
                    filters=[("state", "=", "ALIVE")], limit=10_000
                )
                if a.class_name == "CsrShard"
            )
        except Exception:  # state API unavailable -> skip-count
            return -1

    before = alive_shards()
    t = pa.table(
        {
            "src": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "dst": pa.array([2, 3, 4, 1, 3], pa.int64()),
        }
    )
    g = ShardedGraph.build(ray.data.from_arrow(t), num_parts=4)
    during = alive_shards()
    pr = pagerank(g, max_iters=5)
    del g
    gc.collect()
    df = pr.to_pandas()  # consumed AFTER the wrapper drop: drain must hold
    assert len(df) == 4 and abs(df["rank"].sum() - 1.0) < 1e-9
    after = alive_shards()
    if before >= 0:
        assert during >= before + 4
        assert after <= before


def test_label_propagation_checkpoint_resume(tmp_path, edges):
    """LP kill-and-resume (round 4): a run restarted from the mode-tagged
    manifest after 2 of 5 iterations ends bit-identical to an
    uninterrupted 5-iteration run."""
    from sbustreamspot_core_ray.pipelines.superstep import label_propagation

    ck = str(tmp_path / "lp_ck")
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    full = label_propagation(g1, iters=5).to_pandas()

    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    label_propagation(g2, iters=2, ckpt_dir=ck, ckpt_every=1)  # "killed"
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    resumed = label_propagation(
        g3, iters=5, ckpt_dir=ck, ckpt_every=1
    ).to_pandas()

    assert dict(zip(full["vertex"], full["label"])) == dict(
        zip(resumed["vertex"], resumed["label"])
    )


def test_lp_and_cc_checkpoints_are_mutually_rejected(tmp_path, edges):
    """Both algorithms checkpoint the `label` column; the mode tag must
    prevent silently resuming one from the other's state."""
    from sbustreamspot_core_ray.pipelines.superstep import label_propagation

    ck_lp = str(tmp_path / "lp_ck")
    g1 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    label_propagation(g1, iters=2, ckpt_dir=ck_lp, ckpt_every=1)
    g2 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    with pytest.raises(ValueError, match="lp run"):
        connected_components(g2, ckpt_dir=ck_lp)

    ck_cc = str(tmp_path / "cc_ck")
    g3 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    connected_components(g3, max_iters=2, ckpt_dir=ck_cc, ckpt_every=1)
    g4 = ShardedGraph.build(edges_ds(edges), num_parts=P, symmetric=True)
    with pytest.raises(ValueError, match="cc run"):
        label_propagation(g4, iters=3, ckpt_dir=ck_cc)
