"""Round-3 additions: reciprocity summary, rolling distinct users,
chunk-level exact dedup, int8 embedding quantization, shipping priority,
harmonic farness — hand-checked fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

US = 1_000_000
DAY_US = 86_400_000_000


def test_reciprocity_summary():
    from sbustreamspot_core_ray.pipelines.superstep import reciprocity_summary

    # raw: (1,2)x2, (2,1), (3,3), (1,3) -> distinct 4; loops 1 [(3,3)];
    # reciprocal ordered non-loop pairs with reverse present: (1,2),(2,1)
    src = [1, 1, 2, 3, 1]
    dst = [2, 2, 1, 3, 3]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    out = reciprocity_summary(edges, num_partitions=3).to_pandas().iloc[0]
    assert out["n_raw"] == 5
    assert out["n_distinct"] == 4
    assert out["n_self_loops"] == 1
    assert out["n_reciprocal"] == 2
    assert out["reciprocity"] == round(2 / 3.0, 6)


def test_rolling_distinct_users():
    from sbustreamspot_core_ray.stages.events import rolling_distinct_users

    # user 1 active day 0; user 2 active days 0 and 9 (twice on day 9)
    rows = [(0, 1), (0, 2), (9, 2), (9, 2)]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([d * DAY_US + 5 * US for d, _ in rows],
                               pa.timestamp("us")),
                "user_id": pa.array([u for _, u in rows], pa.int64()),
            }
        )
    )
    out = (
        rolling_distinct_users(ev, window_days=7, num_parts=2)
        .to_pandas()
        .set_index("day")["wau"]
        .sort_index()
    )
    # days 0-6 covered by day-0 activity (2 users); days 9-15 by user 2
    assert out.loc[0] == 2 and out.loc[6] == 2
    assert 7 not in out.index and 8 not in out.index
    assert out.loc[9] == 1 and out.loc[15] == 1
    assert len(out) == 14


def test_chunk_exact_dedup():
    from sbustreamspot_core_ray.stages.dedup import chunk_exact_dedup

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # chunk size 2: doc1 -> ["a b", "c"], doc2 -> ["a b"],
                # doc3 -> ["c"]  (so "a b" x2 first-owner doc1/chunk0,
                # "c" x2 first-owner doc1/chunk1)
                "text": pa.array(["a b c", "a b", "c"]),
            }
        )
    )
    out = (
        chunk_exact_dedup(docs, chunk_tokens=2, num_parts=2)
        .to_pandas()
        .sort_values("sha")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    by_owner = out.set_index(["doc_id", "chunk_id"])["n_copies"]
    assert by_owner.loc[(1, 0)] == 2  # "a b"
    assert by_owner.loc[(1, 1)] == 2  # "c"


def test_embedding_int8_quantize():
    from sbustreamspot_core_ray.stages.ann import embedding_int8_quantize

    embs = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = embedding_int8_quantize(embs).to_pandas().set_index("vec_id")
    # maxabs=2: q = floor([63.5+0.5, -127+0.5, 31.75+0.5]) = [64, -127, 32]
    assert out.loc[1, "q_csv"] == "64,-127,32"
    assert out.loc[1, "scale"] == 2.0
    assert out.loc[1, "l1_q"] == 64 + 127 + 32
    assert out.loc[2, "q_csv"] == "0,0,0"
    assert out.loc[2, "scale"] == 0.0 and out.loc[2, "l1_q"] == 0


def test_shipping_priority():
    from sbustreamspot_core_ray.stages.relational import shipping_priority

    cutoff = 100 * US
    orders = ray.data.from_arrow(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([10, 11, 10], pa.int64()),
                "o_orderdate": pa.array(
                    [50 * US, 50 * US, 200 * US], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-LOW"]),
            }
        )
    )
    customer = ray.data.from_arrow(
        pa.table(
            {
                "c_custkey": pa.array([10, 11], pa.int64()),
                "c_mktsegment": pa.array(["BUILDING", "MACHINERY"]),
            }
        )
    )
    # order 1: two lineitems after cutoff (10*0.9 + 20*1.0 = 29.0), one
    # before cutoff (ignored); order 2 (wrong segment), order 3 (late
    # orderdate) must not appear.
    lineitem = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 99.0, 5.0, 5.0]),
                "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0]),
                "l_shipdate": pa.array(
                    [150 * US, 160 * US, 50 * US, 150 * US, 150 * US],
                    pa.timestamp("us"),
                ),
            }
        )
    )
    out = shipping_priority(
        orders, customer, lineitem, "BUILDING", cutoff,
        num_partitions=2, topn=10,
    ).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "orderkey"] == 1
    assert out.loc[0, "revenue"] == 29.0
    assert out.loc[0, "priority"] == "1-URGENT"


def test_farness_harmonic_accumulator():
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        sampled_farness,
    )

    # path graph 1-2-3 (symmetric): from seed 1, d(2)=1 d(3)=2
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([1, 2], pa.int64()),
             "dst": pa.array([2, 3], pa.int64())}
        )
    )
    g = ShardedGraph.build(edges, num_parts=2, symmetric=True)
    out = (
        sampled_farness(g, seeds=np.array([1], np.int64), harmonic=True)
        .to_pandas()
        .set_index("vertex")
    )
    assert out.loc[1, "harmonic_e9"] == 0
    assert out.loc[2, "harmonic_e9"] == 1_000_000_000
    assert out.loc[3, "harmonic_e9"] == 500_000_000
    assert out.loc[3, "dist_sum"] == 2


def test_bfs_hop_histogram():
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        bfs_hop_histogram,
    )

    # path 1-2-3-4 plus isolated seed id 9 (absent -> no rows)
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([1, 2, 3], pa.int64()),
             "dst": pa.array([2, 3, 4], pa.int64())}
        )
    )
    g = ShardedGraph.build(edges, num_parts=2, symmetric=True)
    out = (
        bfs_hop_histogram(g, seeds=np.array([1, 9], np.int64), max_hops=8)
        .to_pandas()
        .set_index(["seed", "dist"])["n_vertices"]
    )
    assert out.loc[(1, 0)] == 1 and out.loc[(1, 3)] == 1
    assert len(out) == 4  # dists 0..3 for seed 1, nothing for seed 9


def test_hll_users_exact_and_estimate():
    from sbustreamspot_core_ray.stages.events import (
        HLL_MIX,
        HLL_NUM,
        HLL_W_BITS,
        hll_users,
    )

    users = list(range(1, 201))
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["x"] * 200 + ["y"] * 50),
                "user_id": pa.array(users + users[:50], pa.int64()),
            }
        )
    )
    out = hll_users(ev, num_parts=2).to_pandas().set_index("event_type")
    assert out.loc["x", "exact_users"] == 200
    assert out.loc["y", "exact_users"] == 50
    # independent scalar-python HLL for type y
    regs = [0] * 64
    for u in users[:50]:
        h = (u * HLL_MIX) % (1 << 64)
        b = h >> HLL_W_BITS
        w = h % (1 << HLL_W_BITS)
        rnk = HLL_W_BITS + 1 if w == 0 else HLL_W_BITS + 1 - w.bit_length()
        regs[b] = max(regs[b], rnk)
    s = sum(1 << (HLL_W_BITS + 1 - m) for m in regs)
    import numpy as _np

    from sbustreamspot_core_ray.functions.rounding import round_half_away

    want = float(round_half_away(_np.array([HLL_NUM / float(s)]), 4)[0])
    assert out.loc["y", "hll_estimate"] == want
    # the estimate should be in the right ballpark (64 registers ~ 13% rse)
    assert 25 < out.loc["y", "hll_estimate"] < 100


def test_source_stats_and_sampling_weights():
    from sbustreamspot_core_ray.stages.curation import (
        sampling_weights,
        source_stats,
    )

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": pa.array(["a", "a", "b", "a"]),
                "lang": pa.array(["en", "de", "en", "en"]),
                "n_chars": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    st = source_stats(docs).to_pandas().set_index("source")
    assert st.loc["a", "n_docs"] == 3 and st.loc["a", "n_langs"] == 2
    assert st.loc["a", "total_chars"] == 70
    assert st.loc["a", "mean_chars"] == round(70 / 3.0, 2)
    assert st.loc["b", "n_docs"] == 1 and st.loc["b", "mean_chars"] == 30.0

    import math

    w = sampling_weights(docs).to_pandas().set_index("lang")
    assert w.loc["en", "weight"] == 1.0
    assert w.loc["de", "weight"] == round(math.sqrt(1.0) / math.sqrt(3.0), 6)


def test_pack_sequences():
    from sbustreamspot_core_ray.stages.text import pack_sequences

    # doc 1: 3 toks (offsets 0-2), doc 2: 0 toks, doc 3: 4 toks (3-6),
    # doc 5: 2 toks (7-8); L=4 -> seq0 = d1[0:3]+d3[0:1], seq1 = d3[1:4]+
    # d5[0:1], seq2 = d5[1:2]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 5], pa.int64()),
                "text": pa.array(["a b c", "", "d e f g", "h i"]),
            }
        )
    )
    out = (
        pack_sequences(docs, seq_tokens=4, bucket_docs=2, num_parts=2)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = [
        (0, 1, 0, 3),
        (0, 3, 0, 1),
        (1, 3, 1, 3),
        (1, 5, 0, 1),
        (2, 5, 1, 1),
    ]
    assert [tuple(r) for r in out.to_numpy()] == want


def test_bpe_pair_counts():
    from sbustreamspot_core_ray.stages.text import bpe_pair_counts

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                # pairs: doc1 "abab cd" -> ab, ba, ab, cd; doc2 "ab" -> ab
                "text": pa.array(["abab cd", "ab"]),
            }
        )
    )
    out = bpe_pair_counts(docs, top_k=3).to_pandas()
    assert out.loc[0, "pair"] == "ab" and out.loc[0, "cnt"] == 3
    # ties (ba=1, cd=1) break by code point: "ba" < "cd"
    assert out.loc[1, "pair"] == "ba" and out.loc[2, "pair"] == "cd"
    assert out.loc[1, "a"] == ord("b") and out.loc[1, "b"] == ord("a")


def test_cms_top_users():
    from sbustreamspot_core_ray.stages.events import (
        CMS_ROWS,
        CMS_W_BITS,
        cms_top_users,
    )

    # user 7 x5, user 3 x2, user 9 x1
    ev = ray.data.from_arrow(
        pa.table({"user_id": pa.array([7] * 5 + [3] * 2 + [9], pa.int64())})
    )
    out = cms_top_users(ev, top_k=2, num_parts=2).to_pandas()
    assert out["user_id"].tolist() == [7, 3]
    assert out["exact_n"].tolist() == [5, 2]
    # CMS never underestimates
    assert (out["cms_n"] >= out["exact_n"]).all()
    # independent scalar CMS for user 7
    counters = {}
    for u, n in [(7, 5), (3, 2), (9, 1)]:
        for i, c in enumerate(CMS_ROWS):
            col = ((u * c) % (1 << 64)) >> (64 - CMS_W_BITS)
            counters[(i, col)] = counters.get((i, col), 0) + n
    est7 = min(
        counters[(i, ((7 * c) % (1 << 64)) >> (64 - CMS_W_BITS))]
        for i, c in enumerate(CMS_ROWS)
    )
    assert out.loc[0, "cms_n"] == est7


def test_oov_rate():
    from sbustreamspot_core_ray.stages.text import oov_rate

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                # counts: a=3, b=2, c=1 -> top_v=2 keeps {a, b}; c is OOV
                "text": pa.array(["a a b", "a b c", ""]),
            }
        )
    )
    out = oov_rate(docs, top_v=2).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_oov"] == 0 and out.loc[1, "oov_rate"] == 0.0
    assert out.loc[2, "n_tokens"] == 3 and out.loc[2, "n_oov"] == 1
    assert out.loc[2, "oov_rate"] == round(1 / 3.0, 6)
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "oov_rate"] == 0.0


def test_event_trigrams_and_top_users():
    from sbustreamspot_core_ray.stages.events import (
        event_trigrams,
        top_users_per_type,
    )

    # user 1: x y x y  -> triples xyx, yxy; user 2: x y x -> xyx
    rows = [
        (1, 0, 1, "x"), (2, 1, 1, "y"), (3, 2, 1, "x"), (4, 3, 1, "y"),
        (5, 0, 2, "x"), (6, 1, 2, "y"), (7, 2, 2, "x"),
    ]
    ev = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
            }
        )
    )
    tri = event_trigrams(ev, top_k=5, num_parts=2).to_pandas()
    assert tri.iloc[0][["a", "b", "c"]].tolist() == ["x", "y", "x"]
    assert tri.iloc[0]["cnt"] == 2
    assert len(tri) == 2 and tri.iloc[1]["cnt"] == 1

    top = top_users_per_type(ev, n=1, num_parts=2).to_pandas()
    # x: user1 2x vs user2 2x -> tie, user 1 wins; y: user1 2x
    byt = top.set_index("event_type")
    assert byt.loc["x", "user_id"] == 1 and byt.loc["x", "n_events"] == 2
    assert byt.loc["y", "user_id"] == 1 and byt.loc["y", "rn"] == 1


def test_strongly_connected_components():
    from sbustreamspot_core_ray.pipelines.superstep import (
        strongly_connected_components,
    )

    # SCCs: {1,2,3} (3-cycle), {4,5} (2-cycle), {6} (sink)
    src = [1, 2, 3, 3, 4, 5, 3]
    dst = [2, 3, 1, 4, 5, 4, 6]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    out = (
        strongly_connected_components(edges, num_partitions=2)
        .to_pandas()
        .set_index("vertex")["scc_id"]
        .sort_index()
    )
    assert out.loc[1] == 1 and out.loc[2] == 1 and out.loc[3] == 1
    assert out.loc[4] == 4 and out.loc[5] == 4
    assert out.loc[6] == 6
    assert len(out) == 6


def test_condensation_summary():
    from sbustreamspot_core_ray.pipelines.superstep import condensation_summary

    # SCCs {1,2,3}, {4,5}, {6}; condensation edges: {123}->{45}, {123}->{6}
    src = [1, 2, 3, 3, 4, 5, 3]
    dst = [2, 3, 1, 4, 5, 4, 6]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    out = condensation_summary(edges, num_partitions=2).to_pandas().iloc[0]
    assert out["n_sccs"] == 3
    assert out["largest_scc"] == 3
    assert out["n_condensation_edges"] == 2
    assert out["n_source_sccs"] == 1  # {1,2,3}
    assert out["n_sink_sccs"] == 2  # {4,5} and {6}


def test_shortest_path_counts_vs_bfs_oracle():
    """Sigma (Brandes path-count stage) parity vs a per-level numpy BFS
    count on the seeded random graph, symmetrized."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        shortest_path_counts,
    )
    from .oracles import random_graph

    edges = random_graph(n=120, m=700, seed=7)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    g = ShardedGraph.build(ray.data.from_arrow(t), num_parts=4, symmetric=True)
    out = (
        shortest_path_counts(g, seeds=[1, 5], max_hops=6)
        .to_pandas()
        .set_index(["seed", "vertex"])
        .sort_index()
    )

    # oracle: level-synchronous BFS accumulating path counts
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for seed in (1, 5):
        dist = {seed: 0}
        sigma = {seed: 1}
        frontier = [seed]
        hop = 0
        while frontier and hop < 6:
            hop += 1
            nxt: dict[int, int] = {}
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, s_ in nxt.items():
                dist[v] = hop
                sigma[v] = s_
            frontier = list(nxt)
        got = out.loc[seed]
        assert len(got) == len(dist)
        for v, d_ in dist.items():
            assert got.loc[v, "dist"] == d_
            assert got.loc[v, "sigma"] == sigma[v]


def test_modularity_witness_hand_checked():
    """Two triangles joined by one bridge edge, labels = the two triangles:
    m=7, each community m_in=3, d_sum=7 -> q_num = 2*(4*7*3 - 49) = 70,
    Q = 70/196."""
    from sbustreamspot_core_ray.pipelines.superstep import modularity_summary

    src = [1, 2, 3, 4, 5, 6, 3]
    dst = [2, 3, 1, 5, 6, 4, 4]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    labels = ray.data.from_arrow(
        pa.table(
            {
                "vertex": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "label": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            }
        )
    )
    t = modularity_summary(edges, labels, num_partitions=2)
    assert t["m_edges"][0].as_py() == 7
    assert t["n_communities"][0].as_py() == 2
    assert t["q_num"][0].as_py() == 2 * (4 * 7 * 3 - 49)
    assert abs(t["modularity"][0].as_py() - round(70 / 196, 6)) < 1e-12


def test_condensation_depth_hand_checked():
    """SCCs {1,2,3} -> {4,5}, {1,2,3} -> {6}, plus {4,5} -> {7}:
    depths 0 / 1 / 1 / 2."""
    from sbustreamspot_core_ray.pipelines.superstep import condensation_depth

    src = [1, 2, 3, 3, 4, 5, 3, 5]
    dst = [2, 3, 1, 4, 5, 4, 6, 7]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    d = (
        condensation_depth(edges, num_partitions=2)
        .to_pandas()
        .set_index("scc_id")["depth"]
    )
    assert d.loc[1] == 0 and d.loc[4] == 1 and d.loc[6] == 1 and d.loc[7] == 2


def test_stress_centrality_vs_bruteforce():
    """stress_s(v) = number of shortest s->t paths through v (v interior
    or endpoint t) within the hop cap — brute-force DAG enumeration on the
    seeded random graph."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        stress_centrality,
    )
    from .oracles import random_graph

    edges = random_graph(n=80, m=400, seed=11)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    g = ShardedGraph.build(ray.data.from_arrow(t), num_parts=4, symmetric=True)
    H = 5
    out = (
        stress_centrality(g, seeds=[1], max_hops=H)
        .to_pandas()
        .set_index("vertex")
        .sort_index()
    )

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # BFS with sigma
    dist = {1: 0}
    sigma = {1: 1}
    frontier = [1]
    hop = 0
    while frontier and hop < H:
        hop += 1
        nxt: dict[int, int] = {}
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt[v] = nxt.get(v, 0) + sigma[u]
        for v, s_ in nxt.items():
            dist[v] = hop
            sigma[v] = s_
        frontier = list(nxt)
    # g: downstream DAG path counts, deepest level first
    gmap = {v: 0 for v in dist}
    for v in sorted(dist, key=lambda x: -dist[x]):
        for w in adj.get(v, ()):
            if w in dist and dist[w] == dist[v] + 1:
                gmap[v] += 1 + gmap[w]
    assert len(out) == len(dist)
    for v in dist:
        assert out.loc[v, "sigma"] == sigma[v]
        assert out.loc[v, "paths_from"] == gmap[v]
        assert out.loc[v, "stress"] == sigma[v] * gmap[v]


def test_greedy_coloring_proper_and_deterministic():
    """Coloring is proper (no monochromatic edge) and equals the
    sequential iterated-greedy-MIS result on the seeded random graph."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        greedy_coloring,
    )
    from .oracles import random_graph

    edges = random_graph(n=60, m=300, seed=5)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    g = ShardedGraph.build(ray.data.from_arrow(t), num_parts=4, symmetric=True)
    out = (
        greedy_coloring(g, max_colors=64)
        .to_pandas()
        .set_index("vertex")["color"]
    )

    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    # every vertex colored, no conflicts
    assert set(out.index) == set(adj)
    for v, ns in adj.items():
        for w in ns:
            assert out.loc[v] != out.loc[w]
    # sequential oracle: iterated greedy-by-id MIS
    expect = {}
    remaining = set(adj)
    c = 0
    while remaining:
        c += 1
        und = set(remaining)
        members = set()
        while und:
            joins = {v for v in und if all(
                w not in und or w > v for w in adj[v]
            )}
            if not joins:
                break
            members |= joins
            excl = {w for v in joins for w in adj[v] if w in und}
            und -= joins | excl
        for v in members:
            expect[v] = c
        remaining -= members
    for v, col in expect.items():
        assert out.loc[v] == col


def test_two_sweep_diameter_on_path_graph():
    """Path 1-2-3-4-5 plus a branch: BFS from 3 finds 1 (dist 2), second
    sweep from 1 reaches 5 at dist 4 = the true diameter."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        two_sweep_diameter,
    )

    src = [1, 2, 3, 4]
    dst = [2, 3, 4, 5]
    t = pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )
    g = ShardedGraph.build(ray.data.from_arrow(t), num_parts=2, symmetric=True)
    out = two_sweep_diameter(g, seed=3, max_hops=16).to_pandas()
    assert out.loc[0, "far_vertex"] == 1
    assert out.loc[0, "ecc1"] == 2
    assert out.loc[0, "diameter_lb"] == 4


def test_boruvka_msf_vs_kruskal():
    """Both contraction paths (driver fold and distributed superstep CC)
    must equal an independent Kruskal union-find oracle under the same
    (w, u, v) total order — including deliberate weight ties."""
    from sbustreamspot_core_ray.pipelines.superstep import boruvka_msf

    rng = np.random.default_rng(7)
    n_v, n_e = 120, 360
    a = rng.integers(0, n_v, n_e)
    b = rng.integers(0, n_v, n_e)
    keep = a != b
    lo, hi = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    u, v = pairs[:, 0].astype(np.int64), pairs[:, 1].astype(np.int64)
    w = rng.integers(0, 15, len(u)).astype(np.int64)  # many ties

    def kruskal():
        par = list(range(n_v))

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        out = []
        for i in np.lexsort((v, u, w)):
            ra, rb = find(int(u[i])), find(int(v[i]))
            if ra != rb:
                par[ra] = rb
                out.append((int(u[i]), int(v[i]), int(w[i])))
        return sorted(out)

    oracle = kruskal()
    eds = ray.data.from_arrow(pa.table({"u": u, "v": v, "w": w}))
    for thr in (10**6, 0):  # driver fold, then forced distributed CC
        res = boruvka_msf(eds, num_parts=3, driver_cc_threshold=thr)
        got = sorted(
            (int(r["u"]), int(r["v"]), int(r["w"])) for r in res.take_all()
        )
        assert got == oracle


def test_neighbor_sample_vs_bruteforce():
    """Fixed-fanout sampling matches a brute-force reference applying the
    identical hash-priority rule, and each vertex expands at most once."""
    from sbustreamspot_core_ray.pipelines.superstep import neighbor_sample

    src = [1, 1, 1, 2, 2, 10, 10, 11, 12, 20, 30]
    dst = [10, 11, 12, 10, 20, 30, 31, 30, 40, 50, 60]
    edges = ray.data.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    fanouts = (2, 1)
    got = (
        neighbor_sample(edges, [1, 2], fanouts=fanouts, num_parts=4)
        .to_pandas()
        .sort_values(["hop", "src", "dst"])
        .reset_index(drop=True)
    )

    adj = {}
    for s, d in zip(src, dst):
        h = (s * 2654435761 + d * 40503) % 2147483647
        adj.setdefault(s, []).append((h, d))
    expanded, frontier, expect = set(), {1, 2}, []
    for hop, k in enumerate(fanouts, start=1):
        nxt = set()
        for v in sorted(frontier):
            for h, d in sorted(adj.get(v, []))[:k]:
                expect.append((hop, v, d))
                nxt.add(d)
        expanded |= frontier
        frontier = nxt - expanded
    got_rows = list(map(tuple, got[["hop", "src", "dst"]].to_numpy()))
    assert sorted(got_rows) == sorted(expect)
    # hop-1 fan-out respected and hop-2 sources never include seeds
    h1 = got[got["hop"] == 1]
    assert h1.groupby("src").size().max() <= 2
    assert not set(got[got["hop"] == 2]["src"]) & {1, 2}


def test_triad_census_vs_networkx_both_regimes():
    """Both census regimes (broadcast and co-partitioned) against
    nx.triadic_census on a deterministic directed graph dense enough to
    populate all seven complete-triad classes."""
    import networkx as nx

    from sbustreamspot_core_ray.pipelines.superstep import (
        TRIAD_NAMES,
        triad_census,
    )

    # seeded-PCG arcs over 40 vertices (~570 distinct: mutual pairs, self
    # loops and duplicates all present by construction)
    rng = np.random.default_rng(1234)
    n = 40
    arcs = list(
        zip(
            rng.integers(0, n, 700).tolist(),
            rng.integers(0, n, 700).tolist(),
        )
    )
    g = nx.DiGraph((s, d) for s, d in arcs if s != d)
    want = {
        k: v for k, v in nx.triadic_census(g).items() if k in TRIAD_NAMES and v
    }

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a[0] for a in arcs], pa.int64()),
                "dst": pa.array([a[1] for a in arcs], pa.int64()),
            }
        )
    )
    for cap in (10**9, 1):  # broadcast regime, then force the shuffle path
        got_t = triad_census(edges, num_partitions=4, broadcast_edges_max=cap)
        got = dict(
            zip(got_t["triad"].to_pylist(), got_t["n"].to_pylist())
        )
        assert got == want, (cap, got, want)
    assert len(want) == 7  # the fixture must exercise every class


def test_linkpred_holdout_auc_python_oracle():
    """The full split -> negatives -> train-AA scores -> midrank AUC chain
    must match a direct python recomputation on a seeded random graph."""
    import math

    from sbustreamspot_core_ray.pipelines.superstep import linkpred_holdout_auc

    rng = np.random.default_rng(77)
    n = 60
    arcs = list(
        zip(
            rng.integers(0, n, 900).tolist(),
            rng.integers(0, n, 900).tolist(),
        )
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a[0] for a in arcs], pa.int64()),
                "dst": pa.array([a[1] for a in arcs], pa.int64()),
            }
        )
    )
    PCT = 20
    C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD)
    got = linkpred_holdout_auc(
        edges, test_pct=PCT, num_partitions=4, c1=C[0], c2=C[1], c3=C[2]
    ).to_pandas()

    # python oracle
    canon = sorted({(min(s, d), max(s, d)) for s, d in arcs if s != d})
    test = [(a, b) for a, b in canon if (a * 2654435761 + b * 40503) % 100 < PCT]
    train = [e for e in canon if e not in set(test)]
    verts = sorted({v for e in canon for v in e})
    adj: dict[int, set[int]] = {}
    for a, b in train:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wt = {
        v: math.floor(1e9 / math.log(len(ns)))
        for v, ns in adj.items()
        if len(ns) >= 2
    }
    cset = set(canon)
    neg = []
    for a, b in test:
        w = verts[((a * C[0] + b * C[1] + C[2]) % (1 << 64)) % len(verts)]
        p = (min(a, w), max(a, w))
        if a != w and p not in cset:
            neg.append(p)

    def score(p):
        a, b = p
        return sum(
            wt.get(w, 0) for w in adj.get(a, set()) & adj.get(b, set())
        )

    rows = [(score(p), 1) for p in test] + [(score(p), 0) for p in neg]
    rows.sort()
    # midrank AUC over the (score, label) multiset
    n_pos = sum(l for _, l in rows)
    n_neg = len(rows) - n_pos
    from collections import Counter

    by_score = Counter(s for s, _ in rows)
    cum = 0
    two_rs = 0
    for s in sorted(by_score):
        cnt = by_score[s]
        two_mid = 2 * cum + cnt + 1
        two_rs += two_mid * sum(l for sc, l in rows if sc == s)
        cum += cnt
    u2 = two_rs - n_pos * (n_pos + 1)

    assert int(got["n_pos"][0]) == n_pos
    assert int(got["n_neg"][0]) == n_neg
    assert int(got["u2"][0]) == u2
    assert 0.0 < got["auc"][0] <= 1.0


def test_bowtie_decomposition_all_classes():
    """Hand-built fixture with every bow-tie class populated: core cycle
    1-2-3, IN chain 11->10->1, OUT chain 3->20->21, tube 10->50->20,
    in-tendril 10->30, out-tendril 40->20, disconnected 2-cycle 60-61."""
    from sbustreamspot_core_ray.pipelines.superstep import bowtie_decomposition

    arcs = [
        (1, 2), (2, 3), (3, 1),          # core SCC (size 3, largest)
        (10, 1), (11, 10),               # IN
        (3, 20), (20, 21),               # OUT
        (10, 50), (50, 20),              # tube
        (10, 30),                        # in-tendril
        (40, 20),                        # out-tendril
        (60, 61), (61, 60),              # disconnected SCC (size 2)
    ]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in arcs], pa.int64()),
                "dst": pa.array([b for _, b in arcs], pa.int64()),
            }
        )
    )
    got = bowtie_decomposition(edges, num_partitions=4).to_pandas()
    res = {
        r["class"]: (int(r["n_components"]), int(r["n_vertices"]))
        for _, r in got.iterrows()
    }
    assert res == {
        "core": (1, 3),
        "in": (2, 2),
        "out": (2, 2),
        "tubes": (1, 1),
        "tendrils": (2, 2),
        "disconnected": (1, 2),
    }


def test_spam_mass_untrusted_branch_is_all_spam():
    """A vertex unreachable from the trusted seeds gets trustrank 0 and
    spam_mass exactly 1; the seed keeps most of its rank trusted."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, spam_mass

    arcs = [(1, 2), (3, 2), (2, 4)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in arcs], pa.int64()),
                "dst": pa.array([b for _, b in arcs], pa.int64()),
            }
        )
    )
    g = ShardedGraph.build(edges, num_parts=2, symmetric=False)
    df = spam_mass(g, np.array([1], np.int64), max_iters=10).to_pandas()
    df = df.set_index("vertex")
    assert df.loc[3, "trustrank"] == 0.0
    assert df.loc[3, "spam_mass"] == 1.0
    assert df.loc[1, "spam_mass"] < 1.0
    assert (df["spam_mass"] <= 1.0).all()


def test_salsa_closed_form_two_components():
    """Two disjoint bipartite stars: scores must match the Lempel-Moran
    closed form (component-weighted degree fractions) computed by hand."""
    from sbustreamspot_core_ray.pipelines.superstep import salsa_scores

    # comp 1: hub 100 -> auths 1,2,3 ; comp 2: hubs 200,201 -> auth 4
    arcs = [(100, 1), (100, 2), (100, 3), (200, 4), (201, 4)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in arcs], pa.int64()),
                "dst": pa.array([b for _, b in arcs], pa.int64()),
            }
        )
    )
    df = (
        salsa_scores(edges, num_partitions=2, hub_threshold=100)
        .to_pandas()
        .set_index("vertex")
    )
    # |H|=3, |A|=4; comp1: nh=1, na=3, E=3; comp2: nh=2, na=1, E=2
    assert df.loc[100, "score"] == round((1 / 3) * (3 / 3), 9)
    assert df.loc[1, "score"] == round((3 / 4) * (1 / 3), 9)
    assert df.loc[200, "score"] == round((2 / 3) * (1 / 2), 9)
    assert df.loc[4, "score"] == round((1 / 4) * (2 / 2), 9)
    assert set(df[df.index >= 100]["side"]) == {"hub"}
    assert set(df[df.index < 100]["side"]) == {"auth"}


def test_moment_stats_perfect_lines():
    """Exact-moment OLS and Pearson on hand data: perfect lines recover
    slope/intercept exactly with r2 = 1 and r = +/-1."""
    from sbustreamspot_core_ray.stages.stats import (
        grouped_moment_sums,
        ols_table,
        pearson_table,
    )

    t = pa.table(
        {
            "g": pa.array(["a"] * 5 + ["b"] * 4),
            "x": pa.array([1, 2, 3, 4, 5, 1, 2, 3, 4], pa.int64()),
            "y": pa.array([3, 5, 7, 9, 11, 10, 8, 6, 4], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t)

    def ex(b):
        return (
            b["g"].to_numpy(zero_copy_only=False),
            b["x"].to_numpy(),
            b["y"].to_numpy(),
        )

    m = grouped_moment_sums(ds, ex)
    ot = ols_table(m).to_pandas().set_index("grp")
    assert ot.loc["a", "slope"] == 2.0 and ot.loc["a", "intercept"] == 1.0
    assert ot.loc["b", "slope"] == -2.0 and ot.loc["b", "intercept"] == 12.0
    assert ot.loc["a", "r2"] == 1.0 and ot.loc["b", "r2"] == 1.0
    pt = pearson_table(m).to_pandas().set_index("pair")
    assert pt.loc["a", "r"] == 1.0 and pt.loc["b", "r"] == -1.0


def test_pca_projection_line():
    """Rank-1 data along direction (1, 2): the centered PC1 projection is
    k * (t - mean) for collinear points, so projections are strictly
    monotone in t and antisymmetric around the centroid."""
    from sbustreamspot_core_ray.stages.stats import pca_power_projection

    ts = [-2.0, -1.0, 0.0, 1.0, 2.0]
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(5)), pa.int64()),
                "embedding": pa.array(
                    [[t, 2.0 * t] for t in ts], pa.list_(pa.float32())
                ),
            }
        )
    )
    out = (
        pca_power_projection(emb, q=1 << 14, vscale=1 << 14, iters=12)
        .to_pandas()
        .sort_values("vec_id")["proj"]
        .to_numpy()
    )
    assert (np.diff(out) > 0).all() or (np.diff(out) < 0).all()
    assert out[2] == 0  # centroid projects to zero exactly
    assert out[0] == -out[4] and out[1] == -out[3]


def test_walk_counts_path_graph():
    """Directed path 1->2->3->4: length-2 walk counts are 0,0,1,1 (only
    vertices 3 and 4 terminate a 2-walk)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        walk_counts,
    )

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([2, 3, 4], pa.int64()),
            }
        )
    )
    g = ShardedGraph.build(edges, num_parts=2, symmetric=False)
    df = walk_counts(g, iters=2).to_pandas().set_index("vertex")["walks"]
    assert df.to_dict() == {1: 0, 2: 0, 3: 1, 4: 1}


def test_k4_count_k5_plus_tail():
    """K5 has C(5,4)=5 four-cliques; a pendant edge adds none."""
    from itertools import combinations

    from sbustreamspot_core_ray.pipelines.superstep import k4_count

    pairs = list(combinations(range(5), 2)) + [(4, 99)]
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in pairs], pa.int64()),
                "dst": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    out = k4_count(edges, num_tasks=3).to_pandas()
    assert out["k4"].tolist() == [5]


def test_k4_count_triangle_free():
    """A 4-cycle has no triangles, hence no K4."""
    from sbustreamspot_core_ray.pipelines.superstep import k4_count

    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([0, 1, 2, 3], pa.int64()),
                "dst": pa.array([1, 2, 3, 0], pa.int64()),
            }
        )
    )
    assert k4_count(edges).to_pandas()["k4"].tolist() == [0]


def test_burstiness_constant_vs_bursty():
    """A perfectly even series has Fano 0; concentrating the same events
    into one window maximizes it."""
    import pandas as pd

    from sbustreamspot_core_ray.stages.events import burstiness

    hour = 3_600_000_000
    even = [i * hour + 5 for i in range(8)]          # 1 event/window x 8
    burst = [3 * hour + i for i in range(8)]          # 8 events, 1 window
    ts = pa.array(
        [pd.Timestamp(t, unit="us") for t in even + burst],
        pa.timestamp("us"),
    )
    ev = ray.data.from_arrow(
        pa.table({"ts": ts, "event_type": ["even"] * 8 + ["burst"] * 8})
    )
    out = burstiness(ev).set_index("event_type")
    assert out.loc["even", "fano"] == 0.0
    assert out.loc["burst", "n_windows"] == 1 and out.loc["burst", "fano"] == 0.0


def test_weighted_median_fixture():
    """Weights pull the median to the heavy value: prices 1.00/2.00/3.00
    with quantities 1/1/5 -> weighted median 3.00."""
    from sbustreamspot_core_ray.stages.relational import weighted_median

    li = ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": ["A", "A", "A"],
                "l_extendedprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
                "l_quantity": pa.array([1.0, 1.0, 5.0], pa.float64()),
            }
        )
    )
    out = weighted_median(li, num_parts=2)
    assert out["median_cents"].tolist() == [300]
    assert out["total_weight"].tolist() == [7]


def test_longest_streak_islands():
    """Days {0,1,2, 5,6, 9} -> longest 3, active 6."""
    import pandas as pd

    from sbustreamspot_core_ray.stages.events import longest_streak

    day = 86_400_000_000
    days = [0, 1, 2, 5, 6, 9]
    ts = pa.array(
        [pd.Timestamp(d * day + 7, unit="us") for d in days],
        pa.timestamp("us"),
    )
    ev = ray.data.from_arrow(
        pa.table({"ts": ts, "user_id": pa.array([42] * 6, pa.int64())})
    )
    out = longest_streak(ev, num_parts=2).to_pandas()
    assert out["longest_streak"].tolist() == [3]
    assert out["active_days"].tolist() == [6]
