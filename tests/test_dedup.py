"""Dedup family: exact / minhash-LSH / simhash / n-gram Jaccard.

Fixtures are built so ground truth is known: exact duplicates, one
near-duplicate pair (small edit), and distinct fillers."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.stages.dedup import (
    _MinHash,
    candidate_pairs,
    exact_dedup,
    minhash_band_table,
    minhash_lsh_dedup,
    ngram_jaccard_verify,
    simhash_dedup,
)


def _docs() -> ray.data.Dataset:
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun, thinking about dinner"
    )
    texts = {
        0: base,
        1: base,  # exact dup of 0
        2: base.replace("afternoon", "morning"),  # near dup of 0
        3: "completely different content about ray data pipelines and arrow",
        4: "another unrelated document mentioning minhash and lsh banding",
        5: base,  # exact dup of 0
    }
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)]),
            }
        )
    )


def test_exact_dedup_keeps_min_id():
    out = exact_dedup(_docs()).to_pandas()
    kept = set(out["doc_id"])
    assert 0 in kept and 1 not in kept and 5 not in kept
    assert {2, 3, 4} <= kept
    assert len(out) == 4
    # content_hash is the real sha256
    import hashlib

    row = out[out["doc_id"] == 3].iloc[0]
    assert row["content_hash"] == hashlib.sha256(row["text"].encode()).hexdigest()


def test_minhash_bands_deterministic_across_calls():
    a = minhash_band_table(_docs()).to_pandas().sort_values(
        ["doc_id", "band_idx"]
    )
    b = minhash_band_table(_docs()).to_pandas().sort_values(
        ["doc_id", "band_idx"]
    )
    assert (a["band_value"].to_numpy() == b["band_value"].to_numpy()).all()
    # identical texts -> identical signatures in every band
    pivot = a.pivot(index="doc_id", columns="band_idx", values="band_value")
    assert (pivot.loc[0] == pivot.loc[1]).all()
    assert (pivot.loc[0] == pivot.loc[5]).all()
    assert not (pivot.loc[0] == pivot.loc[3]).all()


def test_candidate_pairs_star_shape():
    bands = minhash_band_table(_docs())
    pairs = candidate_pairs(bands).to_pandas()
    got = {tuple(r) for r in pairs[["src", "dst"]].to_numpy()}
    assert (0, 1) in got and (0, 5) in got  # exact dups always co-bucket
    assert all(s < d for s, d in got)  # star pairs from the min member


def test_ngram_jaccard_scores():
    docs = _docs()
    pairs = ray.data.from_arrow(
        pa.table(
            {"src": pa.array([0, 0], pa.int64()), "dst": pa.array([1, 3], pa.int64())}
        )
    )
    out = ngram_jaccard_verify(pairs, docs, threshold=0.0).to_pandas()
    j = dict(zip(zip(out["src"], out["dst"]), out["jaccard"]))
    assert j[(0, 1)] == 1.0  # identical
    assert j[(0, 3)] < 0.2  # unrelated


def test_minhash_lsh_dedup_groups():
    out = minhash_lsh_dedup(_docs(), threshold=0.7, num_parts=4).to_pandas()
    grp = dict(zip(out["doc_id"], out["dup_group"]))
    assert grp[0] == grp[1] == grp[5] == 0
    assert grp[2] == 0  # near-dup joins the group at threshold 0.7
    assert grp[3] == 3 and grp[4] == 4  # singletons keep their own id
    assert len(out) == 6


def test_simhash_dedup_buckets():
    out = simhash_dedup(_docs()).to_pandas()
    grp = dict(zip(out["doc_id"], out["dup_group"]))
    assert grp[0] == grp[1] == grp[5] == 0  # identical text, same simhash
    assert len(out) == 6
    sh = dict(zip(out["doc_id"], out["simhash"]))
    assert sh[0] == sh[1] == sh[5]


def test_minhash_signature_similarity_tracks_jaccard():
    """MinHash property: P(sig match) ~= true shingle Jaccard."""
    from sbustreamspot_core_ray.stages.dedup import _char_shingles

    rng = np.random.default_rng(23)
    words = ["".join(rng.choice(list("abcdefghij"), 6)) for _ in range(120)]
    base = " ".join(words)
    variant = " ".join(words[:110] + ["zzz" + w for w in words[110:]])
    sa = set(_char_shingles(base, 5).tolist())
    sb = set(_char_shingles(variant, 5).tolist())
    true_j = len(sa & sb) / len(sa | sb)
    mh = _MinHash(num_perm=256, k=5, bands=64)
    est = (mh.signature(base) == mh.signature(variant)).mean()
    assert abs(est - true_j) < 0.12  # 256 permutations -> se ~= 0.03
    s3 = mh.signature("entirely different text with no shared shingles at all")
    assert (mh.signature(base) == s3).mean() < 0.2


def test_simhash_near_dup_banded():
    """Hamming>0 path: a small edit keeps the pair within the hamming
    budget and the banded candidates find it; unrelated docs don't pair at
    tight budgets."""
    import pyarrow as pa

    from sbustreamspot_core_ray.stages.dedup import simhash_near_dup

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill in the afternoon sun thinking about dinner"
    )
    texts = [
        base,
        base.replace("dinner", "supper"),  # near-dup of 0
        "completely different content about graph engines and arrow batches "
        "streaming through a ray data pipeline with actor pools",
        base,  # exact dup of 0 -> hamming 0
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    out = simhash_near_dup(ds, max_hamming=10, bands=4).to_pandas()
    got = {(int(r.src), int(r.dst)): int(r.hamming) for r in out.itertuples()}
    assert got[(0, 3)] == 0  # exact dup
    assert (0, 1) in got and got[(0, 1)] <= 10  # small edit
    assert (1, 3) in got and got[(1, 3)] == got[(0, 1)]
    assert (0, 2) not in got and (1, 2) not in got and (2, 3) not in got


def test_levenshtein_kernel_matches_reference():
    """The vectorized two-row DP equals a classic O(nm) reference on random
    strings, including the early-abandon sentinel."""
    import random

    from sbustreamspot_core_ray.stages.dedup import _codepoints, _levenshtein

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(43)
    for _ in range(60):
        a = "".join(rng.choice("abcde") for _ in range(rng.randrange(0, 14)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randrange(0, 14)))
        want = ref(a, b)
        got = _levenshtein(_codepoints(a), _codepoints(b), 100)
        assert got == want, (a, b, got, want)
        capped = _levenshtein(_codepoints(a), _codepoints(b), 2)
        # contract: exact when within the cap, anything > cap otherwise
        assert capped == want if want <= 2 else capped > 2


def test_edit_distance_near_dup_pairs():
    """Banded near-dup finds the planted pair and skips the distant one."""
    import pyarrow as pa
    import ray.data

    from sbustreamspot_core_ray.stages.dedup import edit_distance_near_dup

    base = "the quick brown fox jumps over the lazy dog " * 4
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    base,
                    base[:-6] + "qx",        # small edit, same prefix band
                    "completely different text that shares nothing at all",
                    base[:10] + "Z" * 200,   # same band, way past max_dist
                ],
                pa.string(),
            ),
        }
    )
    out = (
        edit_distance_near_dup(
            ray.data.from_arrow(docs), band_chars=10, max_chars=256,
            max_dist=8, num_parts=4,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out[["doc_a", "doc_b"]].to_numpy())) == [(1, 2)]
    assert out.loc[0, "edit_dist"] > 0


def test_dup_stats_histogram():
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.dedup import dup_stats

    texts = ["a", "a", "a", "b", "b", "c"]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, 7)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    t = dup_stats(docs, num_parts=2).to_pandas().set_index("group_size")
    assert t.loc[1, "n_groups"] == 1 and t.loc[1, "n_docs"] == 1
    assert t.loc[2, "n_groups"] == 1 and t.loc[2, "n_docs"] == 2
    assert t.loc[3, "n_groups"] == 1 and t.loc[3, "n_docs"] == 3


def test_containment_kernel():
    import pandas as pd

    from sbustreamspot_core_ray.stages.dedup import (
        _char_shingles,
        _containment_kernel,
    )

    a = "the quick brown fox jumps over the lazy dog"
    b = a + " and then some extra tail text beyond"
    df = pd.DataFrame(
        {"src": [1], "dst": [2], "text_src": [a], "text_dst": [b]}
    )
    out = _containment_kernel(df, shingle_k=5, threshold=0.0).to_pandas()
    sa = _char_shingles(a, 5)
    sb = _char_shingles(b, 5)
    import numpy as np

    inter = np.intersect1d(sa, sb, assume_unique=True).size
    assert out.loc[0, "containment_src"] == inter / sa.size
    assert out.loc[0, "containment_dst"] == inter / sb.size
    # src is (near-)contained in dst: src-direction containment ~1
    assert out.loc[0, "containment_src"] > 0.95
    assert out.loc[0, "containment_dst"] < out.loc[0, "containment_src"]


def test_sorted_neighborhood_dedup_hand_checked():
    """4 docs, window 4 covers every pair; verify (doc_a, doc_b, inter,
    uni) against hand-computed distinct-token Jaccard at threshold 6/10.
    doc_a is the earlier doc in (key, doc_id) order."""
    import pyarrow as pa
    import ray.data
    from sbustreamspot_core_ray.stages.dedup import sorted_neighborhood_dedup

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c d", "a b c x", "z z z", "a b c d"], pa.string()
                ),
            }
        )
    )
    out = sorted_neighborhood_dedup(docs, window=4, num_parts=2)
    got = sorted(
        (int(r["doc_a"]), int(r["doc_b"]), int(r["inter"]), int(r["uni"]))
        for r in out.take_all()
    )
    # sort order: 0, 3 ("a b c d", tie on key -> doc_id), 1, 2
    assert got == [(0, 1, 3, 5), (0, 3, 4, 4), (3, 1, 3, 5)]


def test_allpairs_jaccard_complete_vs_bruteforce():
    """Prefix filtering must be COMPLETE: a seeded random corpus with a
    tight shared vocabulary (worst case for prefix pruning) compared
    pair-for-pair, integer-for-integer against the O(n^2) brute force."""
    import itertools
    import random

    from sbustreamspot_core_ray.stages.dedup import allpairs_jaccard_join

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(40):
        k = rng.randint(3, 12)
        texts.append(" ".join(rng.choice(vocab) for _ in range(k)))
    texts += ["", "   ", texts[0], texts[1] + " extra"]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    TN, TD = 5, 10
    got = (
        allpairs_jaccard_join(docs, thr_num=TN, thr_den=TD, num_parts=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )

    sets = [frozenset(w for w in t.lower().split(" ") if w) for t in texts]
    want = []
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if uni > 0 and TD * inter >= TN * uni:
            want.append((a, b, inter, uni))
    want_df = pd.DataFrame(want, columns=["src", "dst", "inter", "uni"])
    assert len(got) == len(want_df)
    assert got[["src", "dst", "inter", "uni"]].to_numpy().tolist() == \
        want_df.to_numpy().tolist()
    assert len(want_df) >= 3  # the fixture must actually exercise matches


def test_prefix_duplicates_complete_vs_bruteforce():
    """Sorted-adjacency prefix detection vs the O(n^2) definition,
    including duplicate texts and multi-bucket stitching."""
    from sbustreamspot_core_ray.stages.dedup import prefix_duplicates

    texts = {
        1: "abc", 2: "abcdef", 3: "abc", 4: "abd", 5: "ab",
        6: "zzz", 7: "zz", 8: "zz", 9: "q", 10: "qr", 11: "xyz",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = {
        (int(r["doc_id"]), int(r["prefix_len"]))
        for _, r in prefix_duplicates(docs, num_parts=4, sample_shift=63)
        .to_pandas()
        .iterrows()
    }
    expect = set()
    for d, t in texts.items():
        if any(len(u) > len(t) and u.startswith(t) for u in texts.values()):
            expect.add((d, len(t)))
    assert got == expect


def test_dup_auc_vs_sklearn_style_reference():
    """Tie-corrected Mann-Whitney AUC vs a direct midrank computation on
    a fixture with heavy score ties and known prefix structure."""
    from sbustreamspot_core_ray.stages.dedup import dup_auc

    texts = {}
    # ten long docs; docs 11..14 are strict prefixes (positives), with
    # lengths that TIE with some negatives
    for i in range(1, 11):
        texts[i] = "w" + " x" * (20 + i)   # distinct long docs
    texts[11] = texts[1][:10]
    texts[12] = texts[2][:10]              # same length as 11 (tie)
    texts[13] = texts[3][:30]
    texts[14] = texts[4][: len(texts[5][:30])]  # more tie pressure
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
                "n_chars": pa.array(
                    [len(texts[i]) for i in sorted(texts)], pa.int64()
                ),
            }
        )
    )
    got = dup_auc(docs, num_parts=4).to_pandas().iloc[0]
    # reference: midrank AUC over (score, pos)
    pos_ids = {
        d for d, t in texts.items()
        if any(len(u) > len(t) and u.startswith(t) for u in texts.values())
    }
    pairs = sorted((len(t), 1 if d in pos_ids else 0) for d, t in texts.items())
    scores = np.array([p[0] for p in pairs], np.float64)
    labels = np.array([p[1] for p in pairs], np.int64)
    order = np.argsort(scores, kind="stable")
    s_sorted, l_sorted = scores[order], labels[order]
    ranks = np.empty(len(s_sorted), np.float64)
    i = 0
    while i < len(s_sorted):
        j = i
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2  # 1-based midrank
        i = j
    n_pos, n_neg = int(l_sorted.sum()), int((1 - l_sorted).sum())
    u = ranks[l_sorted == 1].sum() - n_pos * (n_pos + 1) / 2
    want_auc = u / (n_pos * n_neg)
    assert int(got["n_pos"]) == n_pos and int(got["n_neg"]) == n_neg
    assert abs(got["auc"] - round(want_auc, 6)) < 1e-12
    assert int(got["u2"]) == int(round(2 * u))


def test_incremental_near_dup_vs_full_recompute():
    """Delta-touching pairs must equal the FULL bucket-pair near-dup
    restricted to pairs with a new endpoint — including old-new pairs
    where the OLD doc has the larger id is impossible by id convention,
    but old docs pairing with earlier-id NEW docs is exercised."""
    from sbustreamspot_core_ray.stages.dedup import (
        _MinHash,
        incremental_near_dup,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = {
        1: base,
        2: base.replace("kappa", "kappa2"),      # near-dup of 1 (old-old)
        5: base.replace("zeta", "zeta9"),        # old, near 1 and 2
        10: base.replace("mu", "mu7"),           # NEW: near all of 1,2,5
        11: base,                                 # NEW exact text of 1
        12: "unrelated totally different words nothing shared here at all "
            "with the other documents in this tiny corpus fixture",
        3: "another old unique document with its own vocabulary entirely",
    }
    DELTA = 10
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    got = (
        incremental_near_dup(docs, delta_min_id=DELTA, threshold=0.5,
                             num_parts=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    # reference: full bucket co-membership pairs filtered to delta-touching,
    # verified by exact shingle jaccard
    mh = _MinHash(128, 5, 32)
    import pandas as pd

    bt = mh(pd.DataFrame({"doc_id": sorted(texts),
                          "text": [texts[i] for i in sorted(texts)]}))
    buckets = {}
    for _, r in bt.iterrows():
        buckets.setdefault((r["band_idx"], r["band_value"]), set()).add(
            int(r["doc_id"])
        )
    cand = set()
    for mem in buckets.values():
        for a in mem:
            for b in mem:
                if a < b and (a >= DELTA or b >= DELTA):
                    cand.add((a, b))

    def shingles(t):
        s = t.encode()
        return {t[i:i + 5] for i in range(max(len(t) - 4, 1))}

    want = []
    for a, b in sorted(cand):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            want.append((a, b))
    assert [(int(r.src), int(r.dst)) for r in got.itertuples()] == want
    # fixture exercises: new-new (10,11)? 10 vs 11 near; old-new (1,10) etc.
    assert any(a < DELTA <= b for a, b in want)   # old-new present
    assert any(a >= DELTA and b >= DELTA for a, b in want)  # new-new present
    assert all(a >= DELTA or b >= DELTA for a, b in want)
    assert (1, 2) not in want                     # old-old excluded


def test_substring_dedup_marks_cross_doc_positions_only():
    """Hand oracle: k=8, stride 2. Docs 1 and 2 share a long run; doc 3 is
    unique but repeats a gram internally (must NOT count — within-doc
    repeats alone are intradoc_dedup's signal); doc 4 is shorter than k
    (excluded)."""
    from sbustreamspot_core_ray.stages.dedup import substring_dedup

    shared = "abcdefghijklmnop"  # 16 chars
    texts = {
        1: shared + "XXXX",
        2: "YY" + shared,
        3: "qrstuvwqrstuvwqr",  # period-7 self-repeat, no cross-doc gram
        4: "short",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
                "n_chars": pa.array(
                    [len(texts[i]) for i in sorted(texts)], pa.int64()
                ),
            }
        )
    )
    out = (
        substring_dedup(docs, k=8, stride=2, num_parts=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # brute-force oracle
    k, stride = 8, 2
    grams: dict[str, set[int]] = {}
    pos: dict[int, list[str]] = {}
    for did, t in texts.items():
        if len(t) < k:
            continue
        gs = [t[i : i + k] for i in range(0, len(t) - k + 1, stride)]
        pos[did] = gs
        for g in gs:
            grams.setdefault(g, set()).add(did)
    assert sorted(out.index) == sorted(pos)
    for did, gs in pos.items():
        dup = sum(1 for g in gs if len(grams[g]) >= 2)
        assert out.loc[did, "n_grams"] == len(gs)
        assert out.loc[did, "dup_grams"] == dup
        assert out.loc[did, "dup_ppm"] == dup * 1_000_000 // len(gs)
    assert out.loc[3, "dup_grams"] == 0  # self-repeat not marked
    assert out.loc[1, "dup_grams"] > 0 and out.loc[2, "dup_grams"] > 0


def test_winnow_dups_matches_bruteforce_moss():
    """Brute-force oracle: recompute winnow fingerprints per doc (reusing
    the stage's own index as ground truth is avoided — the pair logic is
    recomputed from scratch over doc-level fingerprint sets)."""
    from sbustreamspot_core_ray.stages.dedup import winnow_dups
    from sbustreamspot_core_ray.stages.text import winnow_fingerprints

    clone = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: clone + " alpha variant tail one",
        2: clone + " beta variant tail two",
        3: "completely different content about arrow batches and shuffles",
        4: clone + " gamma variant tail three",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
            }
        )
    )
    out = winnow_dups(
        docs, min_shared=2, max_docs_per_fp=8, num_parts=4
    ).to_pandas()
    got = {
        (a, b): n
        for a, b, n in zip(out["doc_a"], out["doc_b"], out["shared_fps"])
    }

    # oracle from the fingerprint index (doc-level distinct sets)
    idx = winnow_fingerprints(docs).to_pandas()
    sets = {
        did: set(idx[idx["doc_id"] == did]["fp"]) for did in sorted(texts)
    }
    from collections import Counter

    fp_docs = Counter()
    for did, s in sets.items():
        for fp in s:
            fp_docs[fp] += 1
    expect = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            n = sum(
                1
                for fp in sets[a] & sets[b]
                if 2 <= fp_docs[fp] <= 8
            )
            if n >= 2:
                expect[(a, b)] = n
    assert got == expect
    assert (1, 2) in got and (1, 4) in got and (2, 4) in got
    assert all(3 not in p for p in got)


def test_cdc_dedup_shift_robustness_vs_bruteforce():
    """The CDC property fixed-size chunking lacks: prepending bytes to a
    document shifts content, but chunk boundaries re-synchronize, so the
    shared tail still dedups. Oracle is a from-scratch Python rolling-hash
    chunker over the same constants."""
    from sbustreamspot_core_ray.stages.dedup import cdc_dedup
    from sbustreamspot_core_ray.stages.text import _MERS, _winnow_pows

    base = (
        "the shared long passage about streaming dataflow engines and "
        "content defined chunk boundaries resynchronizing after an edit "
        "which fixed size chunking can never recover from at all"
    )
    texts = {
        1: base,
        2: "PREPENDED HEADER >> " + base,  # shifted copy
        3: "entirely different text with no overlap whatsoever here",
    }
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
            }
        )
    )
    out = (
        cdc_dedup(docs, num_parts=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    # brute-force oracle
    pows = _winnow_pows(8)

    def chunks(s: str) -> list[str]:
        b = s.encode()
        cuts = [0]
        for i in range(len(b) - 7):
            h = sum(b[i + j] * pows[j] for j in range(8)) % int(_MERS)
            if h % 64 == 0 and i + 8 < len(b):
                cuts.append(i + 8)
        cuts = sorted(set(cuts)) + [len(b)]
        return [
            b[cuts[x] : cuts[x + 1]].decode() for x in range(len(cuts) - 1)
        ]

    ch = {d: chunks(t) for d, t in texts.items()}
    holders: dict[str, set[int]] = {}
    for d, cs in ch.items():
        for c in cs:
            holders.setdefault(c, set()).add(d)
    for d, cs in ch.items():
        dup = sum(1 for c in cs if len(holders[c]) >= 2)
        assert out.loc[d, "n_chunks"] == len(cs)
        assert out.loc[d, "dup_chunks"] == dup
        assert out.loc[d, "dup_ppm"] == dup * 1_000_000 // len(cs)
    # re-synchronization: the shifted copy still shares most chunks
    assert out.loc[2, "dup_chunks"] >= out.loc[2, "n_chunks"] - 2
    assert out.loc[3, "dup_chunks"] == 0


def test_cdc_dedup_long_documents_vs_bruteforce():
    """Documents far over the old 1023-byte witness bound (the lifted SQL
    position limit): a 5 KB seeded text, a shifted copy sharing its tail,
    and an unrelated 3 KB doc, all checked chunk-for-chunk against the
    from-scratch Python rolling-hash chunker."""
    from sbustreamspot_core_ray.stages.dedup import cdc_dedup
    from sbustreamspot_core_ray.stages.text import _MERS, _winnow_pows

    rng = np.random.default_rng(42)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta"]
    long_a = " ".join(words[i] for i in rng.integers(0, 7, 900))  # ~5 KB
    long_c = " ".join(words[i] for i in rng.integers(0, 7, 550))
    texts = {
        1: long_a,
        2: "SHIFT-HEADER-BYTES :: " + long_a,
        3: long_c,
    }
    assert min(len(t.encode()) for t in texts.values()) > 1023
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array(
                    [texts[i] for i in sorted(texts)], pa.string()
                ),
            }
        )
    )
    out = (
        cdc_dedup(docs, num_parts=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    pows = _winnow_pows(8)

    def chunks(s: str) -> list[str]:
        b = s.encode()
        cuts = [0]
        for i in range(len(b) - 7):
            h = sum(b[i + j] * pows[j] for j in range(8)) % int(_MERS)
            if h % 64 == 0 and i + 8 < len(b):
                cuts.append(i + 8)
        cuts = sorted(set(cuts)) + [len(b)]
        return [
            b[cuts[x] : cuts[x + 1]].decode() for x in range(len(cuts) - 1)
        ]

    ch = {d: chunks(t) for d, t in texts.items()}
    holders: dict[str, set[int]] = {}
    for d, cs in ch.items():
        for c in cs:
            holders.setdefault(c, set()).add(d)
    for d, cs in ch.items():
        dup = sum(1 for c in cs if len(holders[c]) >= 2)
        assert out.loc[d, "n_chunks"] == len(cs)
        assert out.loc[d, "dup_chunks"] == dup
        assert out.loc[d, "dup_ppm"] == dup * 1_000_000 // len(cs)
    assert out.loc[1, "n_chunks"] > 10  # real multi-chunk regime
    assert out.loc[2, "dup_chunks"] >= out.loc[2, "n_chunks"] - 2
