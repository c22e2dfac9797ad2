"""Corpus generation, sha256-validated ingest, and edge extraction."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sbustreamspot_core_ray.functions.hashing import stable_id64
from sbustreamspot_core_ray.sources.corpus import generate_corpus, ingest_corpus
from sbustreamspot_core_ray.sources.edges import (
    ET_CONTAINS,
    ET_IMPORTS,
    EdgeExtractor,
    extract_edges,
)


def test_edge_extractor_semantics():
    batch = pa.table(
        {
            "repo": ["org/a", "org/b"],
            "path": ["src/x.py", "src/y.py"],
            "content": [
                "import org/b/src/y.py\nimport org/a/src/x.py\ncode here",
                "no imports at all",
            ],
        }
    )
    out = EdgeExtractor(num_gids=10)(batch)
    rows = list(zip(out["src"].to_pylist(), out["dst"].to_pylist(),
                    out["e_type"].to_pylist()))
    ra = int(np.int64(stable_id64(["org/a"], "R:")[0].view(np.int64)))
    rb = int(np.int64(stable_id64(["org/b"], "R:")[0].view(np.int64)))
    pa_full = int(np.int64(stable_id64(["org/a/src/x.py"], "P:")[0].view(np.int64)))
    pb_full = int(np.int64(stable_id64(["org/b/src/y.py"], "P:")[0].view(np.int64)))
    # contains edges for both rows, ONE import edge (the self-import of
    # org/a/src/x.py is dropped)
    assert (ra, pa_full, ET_CONTAINS) in rows
    assert (rb, pb_full, ET_CONTAINS) in rows
    assert (ra, pb_full, ET_IMPORTS) in rows
    assert len(rows) == 3
    # deterministic across calls (seq included)
    out2 = EdgeExtractor(num_gids=10)(batch)
    assert out.equals(out2)


def test_corpus_roundtrip_and_invariant(tmp_path):
    root = str(tmp_path / "corp")
    generate_corpus(root, n_files=300, seed=23)
    corpus = ingest_corpus(root, num_partitions=2)  # raises on sha mismatch
    assert corpus.count() == 300
    edges = extract_edges(corpus)
    n = edges.count()
    assert n >= 300  # at least the contains edges
    schema = edges.schema()
    assert schema.names == [
        "src", "dst", "src_type", "dst_type", "e_type", "gid", "seq"
    ]


def test_ingest_rejects_corruption(tmp_path):
    import pyarrow.parquet as pq
    import os

    root = str(tmp_path / "corp2")
    generate_corpus(root, n_files=100, seed=23)
    part = os.path.join(root, "corpus", "part-00000.parquet")
    t = pq.read_table(part)
    tampered = t.set_column(
        t.column_names.index("content"),
        "content",
        pa.array(["tampered!"] + t["content"].to_pylist()[1:]),
    )
    pq.write_table(tampered, part)
    with pytest.raises(ValueError, match="ingest invariant"):
        ingest_corpus(root, num_partitions=2)


def test_shared_import_targets_ranking_and_selfdrop():
    """lib/a is imported by 2 distinct repos (3 statements), lib/b by 2
    repos (2 statements) — n_imports breaks the n_repos tie; r1's
    self-import of its own fullpath is dropped."""
    import ray.data

    from sbustreamspot_core_ray.sources.corpus import shared_import_targets

    rows = [
        ("r1", "f1", "import lib/a\nimport lib/a\nimport lib/b\nimport r1/f1"),
        ("r2", "f2", "import lib/a\nimport lib/b"),
        ("r3", "f3", "import only/here"),
    ]
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "content": pa.array([r[2] for r in rows]),
            }
        )
    )
    out = shared_import_targets(corpus, k=3, num_parts=4).to_pandas()
    assert out["target"].tolist() == ["lib/a", "lib/b", "only/here"]
    assert out["n_repos"].tolist() == [2, 2, 1]
    assert out["n_imports"].tolist() == [3, 2, 1]


def test_path_rollup_hand_case():
    """Prefix explosion, additive counts, distinct langs, and the
    (n_files desc, prefix asc) per-depth cut, checked by hand."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.sources.corpus import path_rollup

    rows = [
        ("o/r1", "src/a/f1.py", "py"),
        ("o/r1", "src/a/f2.go", "go"),
        ("o/r1", "src/b/f3.py", "py"),
        ("o/r2", "src/a/f4.py", "py"),
    ]
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )
    got = path_rollup(corpus, top_n=2, num_parts=4).to_pandas()
    by = {
        (int(r["depth"]), r["prefix"]): (int(r["n_files"]), int(r["n_langs"]))
        for _, r in got.iterrows()
    }
    assert by[(1, "o")] == (4, 2)
    assert by[(2, "o/r1")] == (3, 2)
    assert by[(2, "o/r2")] == (1, 1)
    assert by[(3, "o/r1/src")] == (3, 2)
    assert by[(4, "o/r1/src/a")] == (2, 2)
    # depth-4 cut: top-2 of {o/r1/src/a: 2, o/r1/src/b: 1, o/r2/src/a: 1}
    d4 = got[got["depth"] == 4]["prefix"].tolist()
    assert d4 == ["o/r1/src/a", "o/r1/src/b"]  # tie broken by prefix asc


def test_fork_candidates_hand_case():
    """Per-path repo pairs, lexicographic order, threshold, dedup of
    duplicate (repo, path) rows."""
    from sbustreamspot_core_ray.sources.corpus import fork_candidates

    import ray.data

    rows = [
        ("r2", "a.py"), ("r1", "a.py"), ("r3", "a.py"),
        ("r1", "b.py"), ("r2", "b.py"),
        ("r1", "c.py"), ("r3", "c.py"),
        ("r1", "c.py"),  # duplicate row must not double-count
        ("r9", "only.py"),
    ]
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": pa.array([r[0] for r in rows], pa.string()),
                "path": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    got = (
        fork_candidates(corpus, min_shared=2, num_parts=4)
        .to_pandas()
        .sort_values(["repo_a", "repo_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.to_numpy())) == [
        ("r1", "r2", 2),  # a.py, b.py
        ("r1", "r3", 2),  # a.py, c.py
    ]


def test_identifier_tokens_hand_case():
    """Identifier extraction, snake split, per-lang count + tie-break."""
    import ray.data

    from sbustreamspot_core_ray.sources.corpus import identifier_tokens

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(["py", "py", "go"], pa.string()),
                "content": pa.array(
                    [
                        "fn main_loop() { main_init(); }",
                        "x = main_loop + 42",
                        "var loop_count int",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    got = identifier_tokens(corpus, top_n=3, num_parts=4).to_pandas()
    py = got[got["lang"] == "py"]
    # py tokens: fn,main,loop,main,init,x,main,loop -> main:3, loop:2, fn/init/x:1
    assert list(map(tuple, py.to_numpy())) == [
        ("py", "main", 3),
        ("py", "loop", 2),
        ("py", "fn", 1),
    ]
    go = got[got["lang"] == "go"]
    assert list(map(tuple, go.to_numpy())) == [
        ("go", "count", 1),
        ("go", "int", 1),
        ("go", "loop", 1),
    ]


def test_dedup_int_rows_paths_agree():
    """Packed 2-col fast path vs lexsort fallback vs np.unique(axis=0):
    identical outputs, including negatives (fallback) and 3 columns."""
    from sbustreamspot_core_ray.sources.edges import _dedup_int_rows

    rng = np.random.default_rng(5)
    a = rng.integers(0, 1000, (5000, 2)).astype(np.int64)
    a = np.concatenate([a, a[:100]])  # force dups
    assert np.array_equal(_dedup_int_rows(a.copy()), np.unique(a, axis=0))
    b = a.copy()
    b[0, 0] = -7  # negative: packed path must NOT trigger
    assert np.array_equal(_dedup_int_rows(b.copy()), np.unique(b, axis=0))
    c = rng.integers(-50, 50, (3000, 3)).astype(np.int64)
    assert np.array_equal(_dedup_int_rows(c.copy()), np.unique(c, axis=0))
    big = a.copy()
    big[0, 1] = 1 << 40  # beyond 2^31: fallback
    assert np.array_equal(_dedup_int_rows(big.copy()), np.unique(big, axis=0))
    assert _dedup_int_rows(np.empty((0, 2), np.int64)).shape == (0, 2)


def test_boilerplate_lines_fixture(tmp_path):
    import ray.data
    """Three files sharing one long line; a unique long line and short
    lines never qualify."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.sources.corpus import boilerplate_lines

    shared = "import common/license/header.py"
    rows = {
        "repo": ["r0", "r1", "r2"],
        "path": ["a.py", "b.py", "c.py"],
        "commit": ["c", "c", "c"],
        "lang": ["py", "py", "py"],
        "content": [
            shared + "\n" + shared + "\nunique line zero zero",
            shared + "\nshort",
            shared + "\n  " + shared + "  ",
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = boilerplate_lines(ds, min_len=8, min_files=2, top_n=10).to_pandas()
    assert out["line"].tolist() == [shared]
    assert out["n_files"].tolist() == [3]  # per-file dedup: 3 files, not 5 hits
