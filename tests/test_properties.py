"""Hypothesis property tests for the distributed kernels against plain
pandas/numpy oracles (FIXTURES.md §4: per-operator parity on arbitrary
inputs, not just fixtures)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray.data

from sbustreamspot_core_ray.sources.edges import distinct_int_rows
from sbustreamspot_core_ray.stages.events import sessionize

_settings = settings(max_examples=12, deadline=None)

pairs = st.lists(
    st.tuples(st.integers(-1000, 1000), st.integers(-1000, 1000)),
    min_size=0,
    max_size=300,
)


@given(pairs)
@_settings
def test_distinct_int_rows_equals_pandas(rows):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    got = distinct_int_rows(ds, ["src", "dst"], num_parts=4).to_pandas()
    want = (
        pd.DataFrame(rows, columns=["src", "dst"]).drop_duplicates()
        if rows
        else pd.DataFrame({"src": [], "dst": []})
    )
    got_set = set(map(tuple, got.to_numpy()))
    want_set = set(map(tuple, want.to_numpy().astype(np.int64)))
    assert got_set == want_set


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # user
        st.integers(0, 10_000),  # t seconds
        st.floats(0, 100, allow_nan=False, width=32),
    ),
    min_size=0,
    max_size=200,
)


def _oracle_sessions(rows, gap_s: int):
    df = pd.DataFrame(rows, columns=["user_id", "t", "value"])
    df["event_id"] = np.arange(len(df))
    df = df.sort_values(["user_id", "t", "event_id"], kind="stable")
    out = {}
    for uid, g in df.groupby("user_id"):
        sess = -1
        prev = None
        for r in g.itertuples():
            if prev is None or r.t - prev > gap_s:
                sess += 1
                out[(uid, sess)] = [0, r.t, r.t, 0.0]
            rec = out[(uid, sess)]
            rec[0] += 1
            rec[2] = r.t
            rec[3] += r.value
            prev = r.t
    return out


@given(events_strategy)
@_settings
def test_sessionize_equals_oracle(rows):
    gap_s = 100
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array(list(range(len(rows))), pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
    )
    got = sessionize(ds, gap_us=gap_s * 1_000_000, num_parts=3).to_pandas()
    want = _oracle_sessions(rows, gap_s)
    got_map = {
        (r.user_id, r.session_id): (
            r.n_events,
            r.first_us // 1_000_000,
            r.last_us // 1_000_000,
        )
        for r in got.itertuples()
    }
    assert set(got_map) == set(want)
    for k, (n, lo, hi, sv) in want.items():
        gn, glo, ghi = got_map[k]
        assert (gn, glo, ghi) == (n, lo, hi)
        row = got[(got.user_id == k[0]) & (got.session_id == k[1])]
        assert np.isclose(row["sum_value"].iloc[0], sv, atol=1e-6)


@_settings
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=25,
    )
)
def test_scc_matches_closure_reference(pairs):
    """SCC refinement == brute-force mutual-reachability closure on random
    small digraphs (self-loops and duplicates included)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        strongly_connected_components,
    )

    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    edges = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out = (
        strongly_connected_components(edges, num_partitions=2)
        .to_pandas()
        .set_index("vertex")["scc_id"]
        .to_dict()
    )
    # reference: boolean closure (Floyd-Warshall style) over <= 10 ids
    vs = np.unique(np.concatenate([src, dst]))
    n = len(vs)
    idx = {v: i for i, v in enumerate(vs)}
    R = np.eye(n, dtype=bool)
    for a, b in zip(src, dst):
        R[idx[a], idx[b]] = True
    for k in range(n):
        R |= R[:, k][:, None] & R[k, :][None, :]
    mutual = R & R.T
    want = {int(v): int(vs[np.flatnonzero(mutual[i])[0]]) for v, i in ((v, idx[v]) for v in vs)}
    assert out == want


def test_doc_keywords_vs_reference():
    """tf*idf keyword extraction vs a scalar reference: idf nanonat
    parity, lexicographic tie-break, top-k cut, rare term beats common."""
    import math

    from sbustreamspot_core_ray.stages.text import doc_keywords

    texts = {
        1: "apple apple banana cherry",
        2: "apple banana banana durian",
        3: "apple cherry cherry cherry durian elderberry",
        4: "fig fig fig apple",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = (
        doc_keywords(docs, top_k=2, num_parts=4)
        .to_pandas()
        .sort_values(["doc_id", "score", "term"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # reference
    from collections import Counter

    N = len(texts)
    tf = {d: Counter(t.split()) for d, t in texts.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    want = []
    for d in sorted(texts):
        scored = sorted(
            (
                (-c * math.floor(math.log(N / df[t]) * 1e9), t, c)
                for t, c in tf[d].items()
            )
        )[:2]
        for negs, t, c in scored:
            want.append([d, t, c, -negs])
    assert got.to_numpy().tolist() == want
    # 'fig' (df=1) must top doc 4 over ubiquitous 'apple' (df=4, idf=0)
    assert got[got["doc_id"] == 4].iloc[0]["term"] == "fig"


bip_edges = st.lists(
    st.tuples(st.integers(0, 25), st.integers(100, 118)),
    min_size=0,
    max_size=250,
)


@given(bip_edges, st.integers(1, 12))
@_settings
def test_butterfly_count_capped_equals_bruteforce(rows, max_deg):
    """Capped butterfly census == brute-force C(co-count,2) over centers
    with degree <= max_deg on the engine's chosen (smaller-wedge) side,
    with dropped_centers = the over-cap center count, on arbitrary
    bipartite multigraphs (duplicates must not inflate distinct edges)."""
    from itertools import combinations

    from sbustreamspot_core_ray.stages.relational import butterfly_count

    ds = ray.data.from_arrow(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )
    t = butterfly_count(ds, num_partitions=3, max_deg=max_deg).to_pandas()
    es = set(rows)
    fwd, rev = {}, {}
    for o, p in es:
        fwd.setdefault(o, set()).add(p)
        rev.setdefault(p, set()).add(o)
    wedges = lambda d: sum(len(v) * (len(v) - 1) // 2 for v in d.values())
    side = fwd if wedges(fwd) <= wedges(rev) else rev
    keep = {c: ls for c, ls in side.items() if len(ls) <= max_deg}
    bf = 0
    for a, b in combinations(sorted(keep), 2):
        c = len(keep[a] & keep[b])
        bf += c * (c - 1) // 2
    assert t["n_edges"].tolist() == [len(es)]
    assert t["wedges_order"].tolist() == [wedges(fwd)]
    assert t["wedges_part"].tolist() == [wedges(rev)]
    assert t["butterflies"].tolist() == [bf]
    assert t["dropped_centers"].tolist() == [
        sum(1 for ls in side.values() if len(ls) > max_deg)
    ]


ws_docs = st.lists(
    st.tuples(st.integers(0, 10_000_000), st.integers(0, 40)),
    min_size=0,
    max_size=120,
    unique_by=lambda t: t[0],
)


@given(ws_docs, st.integers(1, 30))
@_settings
def test_weighted_sample_equals_bruteforce(docs, n):
    """A-ES selection == the brute-force smallest-(-ln(u)/len) set for
    arbitrary non-negative ids and lengths (zero-length docs excluded)."""
    import math

    from sbustreamspot_core_ray.stages.curation import FIB_MIX, weighted_sample

    texts = {i: "a" * ln for i, ln in docs}
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
            }
        )
    )
    got = weighted_sample(ds, n).to_pandas()
    if not any(texts.values()):
        # Ray Data never invokes map_batches on empty blocks, so the empty
        # result carries no schema — emptiness is the whole contract here
        assert len(got) == 0
        return

    def key(i):
        h = (i * int(FIB_MIX)) % (1 << 64)
        u = ((h >> 11) + 1.0) / float(1 << 53)
        return math.floor(-math.log(u) / len(texts[i]) * 1e9 + 0.5)

    ref = sorted((key(i), i) for i in texts if texts[i])[:n]
    assert list(got["doc_id"]) == [i for _, i in ref]
    assert list(got["weight"]) == [len(texts[i]) for _, i in ref]
