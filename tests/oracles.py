"""Single-node pure-numpy oracles for parity tests (FIXTURES.md §4).

These define the exact semantics the distributed engine must match:
per-vertex PageRank allclose(1e-6), CC / labels / triangles exact.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _vertices(edges: list[tuple[int, int]]) -> list[int]:
    vs = set()
    for s, d in edges:
        vs.add(s)
        vs.add(d)
    return sorted(vs)


def oracle_pagerank(
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    max_iters: int = 100,
    tol: float = 1e-10,
) -> dict[int, float]:
    """Power iteration, distinct edges, dangling mass redistributed uniformly."""
    edges = sorted(set(edges))
    vs = _vertices(edges)
    n = len(vs)
    idx = {v: i for i, v in enumerate(vs)}
    out = np.zeros(n)
    for s, d in edges:
        out[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    src = np.array([idx[s] for s, d in edges])
    dst = np.array([idx[d] for s, d in edges])
    for _ in range(max_iters):
        contrib = np.zeros(n)
        per_edge = rank[src] / out[src]
        np.add.at(contrib, dst, per_edge)
        dangling = rank[out == 0].sum()
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < tol:
            break
    return {v: rank[idx[v]] for v in vs}


def oracle_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component id = min vertex id in the component."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        for v in (s, d):
            parent.setdefault(v, v)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, r), v)
    return {v: comp_min[find(v)] for v in parent}


def oracle_label_propagation(
    edges: list[tuple[int, int]], iters: int = 5
) -> dict[int, int]:
    """Synchronous LP on the symmetrized simple graph: new label = mode of
    neighbor labels, ties -> min label, isolated vertices keep their own."""
    adj = defaultdict(set)
    for s, d in set(edges):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    vs = _vertices(edges)
    label = {v: v for v in vs}
    for _ in range(iters):
        new = {}
        for v in vs:
            if not adj[v]:
                new[v] = label[v]
                continue
            cnt = Counter(label[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def oracle_triangles(edges: list[tuple[int, int]]) -> tuple[int, dict[int, int]]:
    """Exact global + per-vertex triangle counts on the simple graph."""
    adj = defaultdict(set)
    for s, d in set(edges):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    per = Counter()
    total = 0
    vs = sorted(adj)
    for u in vs:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, dict(per)


def random_graph(n: int, m: int, seed: int = 23) -> list[tuple[int, int]]:
    """Seeded random directed multigraph with some skew + isolated clusters."""
    rng = np.random.Generator(np.random.PCG64(seed))
    # power-ish degree skew: square of uniform concentrates mass
    src = (rng.random(m) ** 2 * n).astype(np.int64) + 1
    dst = rng.integers(1, n + 1, size=m)
    edges = [(int(s), int(d)) for s, d in zip(src, dst) if s != d]
    # add a detached clique so >1 component exists
    base = n + 100
    for i in range(4):
        for j in range(i + 1, 4):
            edges.append((base + i, base + j))
    return edges
