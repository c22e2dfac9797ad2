"""Synthetic source-code corpus: generator + validated ingest.

The engine's external-facing input shape (BASELINE.json ``input_hint``):
Parquet table ``(repo: string, path: string, commit: string, lang: string,
content: string)``. This module

- synthesizes a deterministic, seeded corpus at any scale (FIXTURES.md §1):
  Zipf(a=1.5) repo→file fan-out for high-degree skew, contents containing
  ``import {repo}/{path}`` lines referencing other rows so cross-repo edges
  exist, and a manifest parquet of per-row ``sha256(content)``;
- ingests a corpus with the per-row sha256 invariant enforced inside
  ``map_batches`` (the manifest is hash-joined on the (repo,path,commit)
  key — at 10^12-file scale this is a co-partitioned hash join, never a
  driver-side lookup).

No external data; everything is generated from the seed.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

SEED = 23
LANGS = ["py", "c", "cpp", "js", "go"]
_EXT = {"py": "py", "c": "c", "cpp": "cc", "js": "js", "go": "go"}

CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


def generate_corpus(
    out_dir: str,
    n_files: int = 2000,
    seed: int = SEED,
    files_per_shard: int = 250_000,
    imports_per_file: int = 3,
) -> str:
    """Write a deterministic synthetic corpus + manifest under ``out_dir``.

    Layout (resumable: a rerun skips shards that already exist)::

        out_dir/corpus/part-{i:05d}.parquet
        out_dir/manifest/part-{i:05d}.parquet   (repo, path, commit, content_sha256)

    Fan-out: repo of row k is drawn Zipf(a=1.5) over ``n_repos`` ranks so a
    few repos own most files (the skew the salting path must survive).
    Imports reference other rows' (repo, path) pairs chosen by a seeded
    uniform draw, so the repo→import graph is connected across repos.
    """
    corpus_dir = os.path.join(out_dir, "corpus")
    manifest_dir = os.path.join(out_dir, "manifest")
    os.makedirs(corpus_dir, exist_ok=True)
    os.makedirs(manifest_dir, exist_ok=True)

    rng = np.random.Generator(np.random.PCG64(seed))
    n_repos = max(4, n_files // 40)

    # repo rank per file: Zipf truncated to n_repos
    ranks = rng.zipf(1.5, size=n_files * 2)
    ranks = ranks[ranks <= n_repos][:n_files]
    while len(ranks) < n_files:
        extra = rng.zipf(1.5, size=n_files)
        ranks = np.concatenate([ranks, extra[extra <= n_repos]])[:n_files]
    repo_idx = ranks - 1  # 0-based repo index per file

    langs = rng.choice(len(LANGS), size=n_files)
    mods = rng.integers(0, max(2, n_files // 100), size=n_files)
    # per-repo running file number → unique path within repo
    file_no = np.zeros(n_files, dtype=np.int64)
    counters: dict[int, int] = {}
    for i, r in enumerate(repo_idx):
        c = counters.get(int(r), 0)
        file_no[i] = c
        counters[int(r)] = c + 1

    repos = [f"org{r % 97}/repo{r}" for r in repo_idx]
    paths = [
        f"src/mod{mods[i]}/file{file_no[i]}.{_EXT[LANGS[langs[i]]]}"
        for i in range(n_files)
    ]
    commit_bytes = rng.integers(0, 256, size=(n_files, 20), dtype=np.uint8)
    commits = [bytes(row).hex() for row in commit_bytes]

    # import targets: uniform over all rows (self-imports dropped at extract)
    targets = rng.integers(0, n_files, size=(n_files, imports_per_file))

    shard = 0
    for lo in range(0, n_files, files_per_shard):
        hi = min(lo + files_per_shard, n_files)
        cpath = os.path.join(corpus_dir, f"part-{shard:05d}.parquet")
        mpath = os.path.join(manifest_dir, f"part-{shard:05d}.parquet")
        if os.path.exists(cpath) and os.path.exists(mpath):
            shard += 1
            continue
        contents, shas = [], []
        for i in range(lo, hi):
            lines = [f"// {repos[i]}:{paths[i]} lang={LANGS[langs[i]]}"]
            for t in targets[i]:
                if t != i:
                    lines.append(f"import {repos[t]}/{paths[t]}")
            lines.append(f"fn main_{file_no[i]}() {{ return {int(mods[i])}; }}")
            content = "\n".join(lines)
            contents.append(content)
            shas.append(hashlib.sha256(content.encode()).hexdigest())
        tbl = pa.table(
            {
                "repo": repos[lo:hi],
                "path": paths[lo:hi],
                "commit": commits[lo:hi],
                "lang": [LANGS[l] for l in langs[lo:hi]],
                "content": contents,
            },
            schema=CORPUS_SCHEMA,
        )
        pq.write_table(tbl, cpath + ".tmp")
        os.replace(cpath + ".tmp", cpath)  # atomic → resumable
        mtbl = pa.table(
            {
                "repo": repos[lo:hi],
                "path": paths[lo:hi],
                "commit": commits[lo:hi],
                "content_sha256": shas,
            }
        )
        pq.write_table(mtbl, mpath + ".tmp")
        os.replace(mpath + ".tmp", mpath)
        shard += 1
    return out_dir


class _Sha256Stage:
    """Actor-pool stage: append content_sha256 to each batch (zero-copy in)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        shas = [
            hashlib.sha256(v.encode("utf-8")).hexdigest()
            for v in batch["content"].to_pylist()
        ]
        return batch.append_column("computed_sha256", pa.array(shas, pa.string()))


def read_corpus(corpus_root: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read the corpus with schema validation (fixed explicit contract)."""
    ds = ray.data.read_parquet(os.path.join(corpus_root, "corpus"), columns=columns)
    want = set(columns) if columns else set(CORPUS_SCHEMA.names)
    have = set(ds.schema().names)
    if not want <= have:
        raise ValueError(f"corpus schema mismatch: missing {want - have}")
    return ds


def ingest_corpus(corpus_root: str, num_partitions: int = 32) -> ray.data.Dataset:
    """Validated ingest: per-row sha256(content) equality vs the manifest.

    Re-expresses the reference's fixed-schema trusted parse (`io.cpp:57-95`)
    as a typed-Parquet contract plus a content-integrity invariant
    (BASELINE.json input_hint). The manifest join is a hash-partitioned
    equi-join on (repo, path, commit) — both sides shuffle once; at corpus
    scale neither side is broadcastable.

    Raises ValueError if any row's content hash disagrees with the manifest.
    Returns the validated corpus dataset (original 5 columns).
    """
    ds = read_corpus(corpus_root).map_batches(
        _Sha256Stage, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096
    )
    manifest = ray.data.read_parquet(os.path.join(corpus_root, "manifest"))
    joined = ds.join(
        manifest,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("repo", "path", "commit"),
    )

    def _check(batch: pa.Table) -> pa.Table:
        got = batch["computed_sha256"].to_pylist()
        want = batch["content_sha256"].to_pylist()
        bad = sum(1 for g, w in zip(got, want) if w is None or g != w)
        return pa.table({"bad": pa.array([bad], pa.int64())})

    bad_total = sum(
        r["bad"] for r in joined.map_batches(_check, batch_format="pyarrow").take_all()
    )
    if bad_total:
        raise ValueError(f"ingest invariant violated: {bad_total} rows failed sha256")
    return read_corpus(corpus_root)


def shared_import_targets(
    corpus: ray.data.Dataset, k: int = 20, num_parts: int = 16
) -> "pa.Table":
    """Library detection over the corpus import graph: the k import
    targets referenced by the most DISTINCT repos (total import statements
    as the tiebreak) — the reuse signal a curation pipeline uses to
    separate vendored/library files from first-party code.

    Scale shape: a stateless map_batches extracts (target, repo) import
    pairs (one vectorized extractall per block, the EdgeExtractor regex)
    and dedups them per block before ONE
    (target, repo) groupby completes the distinct count; per-block
    (target, n_repos, n_imports) partials fold through a second tiny
    target-keyed groupby; the top-k cut is a per-block partial top-k
    merged on the driver (k rows per block, never the full target table).
    Deterministic order: (n_repos desc, n_imports desc, target asc)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .edges import _IMPORT_RE

    def pairs(t: pa.Table) -> pa.Table:
        repos = pd.Series(t["repo"].to_pylist())
        full = repos + "/" + pd.Series(t["path"].to_pylist())
        hits = pd.Series(t["content"].to_pylist()).str.extractall(_IMPORT_RE)
        row_idx = hits.index.get_level_values(0).to_numpy()
        tgts = hits[0].to_numpy()
        keep = tgts != full.to_numpy()[row_idx]  # self-imports dropped
        df = pd.DataFrame(
            {"tgt": tgts[keep], "repo": repos.to_numpy()[row_idx[keep]]}
        )
        g = df.groupby(["tgt", "repo"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "tgt": pa.array(g["tgt"], pa.string()),
                "repo": pa.array(g["repo"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(np.int64)),
            }
        )

    per_pair = (
        corpus.select_columns(["repo", "path", "content"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["tgt", "repo"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def fold(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "tgt": np.asarray(t["tgt"].to_numpy(zero_copy_only=False), object),
                "cnt": t["cnt"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("tgt", sort=False).agg(
            pr=("cnt", "size"), pi=("cnt", "sum")
        ).reset_index()
        return pa.table(
            {
                "tgt": pa.array(g["tgt"], pa.string()),
                "pr": pa.array(g["pr"].to_numpy(np.int64)),
                "pi": pa.array(g["pi"].to_numpy(np.int64)),
            }
        )

    totals = (
        per_pair.map_batches(fold, batch_format="pyarrow")
        .groupby("tgt")
        .aggregate(Sum("pr", alias_name="n_repos"), Sum("pi", alias_name="n_imports"))
    )

    def cut(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["n_repos", "n_imports", "tgt"], ascending=[False, False, True]
        )
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    rows = (
        totals.map_batches(cut, batch_format="pyarrow").to_pandas()
        .sort_values(["n_repos", "n_imports", "tgt"], ascending=[False, False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "target": pa.array(rows["tgt"].astype(str)),
            "n_repos": pa.array(rows["n_repos"].to_numpy(np.int64)),
            "n_imports": pa.array(rows["n_imports"].to_numpy(np.int64)),
        }
    )


def path_rollup(
    corpus: ray.data.Dataset, top_n: int = 10, num_parts: int = 16
) -> "pa.Table":
    """Hierarchical path rollup over the repo corpus: every directory
    prefix of repo-qualified file paths (org/repo/src/mod/file.py ->
    org, org/repo, org/repo/src, org/repo/src/mod) aggregated to
    (depth, prefix, n_files, n_langs), cut to the top_n prefixes per
    depth by (n_files desc, prefix asc) — the directory-size census a
    trillion-file filesystem crawl starts from.

    Scale shape: a per-batch combiner explodes prefixes and pre-folds to
    (depth, prefix, lang) partial counts — hierarchy cardinality shrinks
    geometrically with depth, so combiner output is ~vocabulary-sized —
    then ONE hash(prefix) shuffle completes n_files (additive) and
    n_langs (distinct langs co-located per prefix); the per-partition
    top_n pre-cut bounds what the driver merges at P*top_n rows per
    depth, never the full prefix table."""
    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def combiner(t: pa.Table) -> pa.Table:
        full = pd.Series(t["repo"].to_pylist()) + "/" + pd.Series(
            t["path"].to_pylist()
        )
        lang = pd.Series(t["lang"].to_pylist())
        parts = full.str.split("/")
        frames = []
        max_depth = int(parts.str.len().max() or 0)
        for d in range(1, max_depth):
            sel = parts.str.len() > d
            if not sel.any():
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "depth": np.int64(d),
                        "prefix": parts[sel].str[:d].str.join("/"),
                        "lang": lang[sel],
                    }
                )
            )
        if not frames:
            return pa.table(
                {
                    "depth": pa.array([], pa.int64()),
                    "prefix": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "__p": pa.array([], pa.int32()),
                }
            )
        df = pd.concat(frames, ignore_index=True)
        g = (
            df.groupby(["depth", "prefix", "lang"], sort=False)
            .size()
            .reset_index(name="n")
        )
        ph = stable_id64(g["prefix"].to_numpy(object)).astype(np.int64)
        return pa.table(
            {
                "depth": pa.array(g["depth"].to_numpy(np.int64)),
                "prefix": pa.array(g["prefix"], pa.string()),
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "__p": pa.array(part_of(ph, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = (
            df.groupby(["depth", "prefix"], sort=False)
            .agg(n_files=("n", "sum"), n_langs=("lang", "nunique"))
            .reset_index()
        )
        # per-partition pre-cut: global top_n per depth survives any cut
        # that keeps the local top_n of every partition
        a = a.sort_values(
            ["depth", "n_files", "prefix"], ascending=[True, False, True]
        )
        return a.groupby("depth", sort=False).head(top_n)

    cands = (
        corpus.select_columns(["repo", "path", "lang"])
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    cands = cands.sort_values(
        ["depth", "n_files", "prefix"], ascending=[True, False, True]
    )
    out = cands.groupby("depth", sort=True).head(top_n).reset_index(drop=True)
    return pa.table(
        {
            "depth": pa.array(out["depth"].to_numpy(np.int64)),
            "prefix": pa.array(out["prefix"], pa.string()),
            "n_files": pa.array(out["n_files"].to_numpy(np.int64)),
            "n_langs": pa.array(out["n_langs"].to_numpy(np.int64)),
        }
    )


def fork_candidates(
    corpus: ray.data.Dataset,
    min_shared: int = 2,
    num_parts: int = 16,
    path_cap: int = 4096,
) -> "pa.Table":
    """Fork / vendored-copy candidate mining over a code corpus: pairs of
    repos that carry >= min_shared files under the IDENTICAL relative
    path, the first-pass signal a trillion-file corpus uses to collapse
    forks before content-level dedup. Emits (repo_a, repo_b, n_shared)
    with repo_a < repo_b lexicographically.

    Scale shape: ONE shuffle on hash(path) co-locates each path's repo
    list; per partition the co-path pairs come out of the closed-form
    triangular decode over the sorted (path, repo) runs (the
    copurchase/simhash-band kernel shape), with paths capped at
    `path_cap` repos under an explicit log line (a boilerplate path
    shared by millions of repos must not quadratically explode — recall
    loss is never silent); partition-local pair counts are pre-combined,
    then one hashed-pair shuffle completes the exact counts and applies
    the threshold. No all-pairs join over repos ever materializes."""
    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def tag(t: pa.Table) -> pa.Table:
        path = np.asarray(t["path"].to_pylist(), dtype=object)
        repo = np.asarray(t["repo"].to_pylist(), dtype=object)
        ph = stable_id64(path).astype(np.int64)
        return pa.table(
            {
                "path": pa.array(path, pa.string()),
                "repo": pa.array(repo, pa.string()),
                "__p": pa.array(part_of(ph, num_parts), pa.int32()),
            }
        )

    def path_pairs(df: pd.DataFrame) -> pd.DataFrame:
        path = df["path"].to_numpy(str)
        repo = df["repo"].to_numpy(str)
        order = np.lexsort((repo, path))
        path, repo = path[order], repo[order]
        keep = np.ones(len(path), bool)
        if len(path) > 1:
            keep[1:] = (path[1:] != path[:-1]) | (repo[1:] != repo[:-1])
        path, repo = path[keep], repo[keep]
        starts = np.flatnonzero(
            np.concatenate([[True], path[1:] != path[:-1]])
            if len(path)
            else np.array([], bool)
        )
        lens = np.diff(np.concatenate([starts, [len(path)]]))
        over = lens > path_cap
        if over.any():
            print(
                f"fork_candidates: truncating {int(over.sum())} paths "
                f"over cap={path_cap} repos (explicit recall loss)"
            )
            lens = np.minimum(lens, path_cap)
        npair = lens * (lens - 1) // 2
        tot = int(npair.sum())
        if tot == 0:
            return pd.DataFrame(
                {"repo_a": [], "repo_b": [], "cnt": [], "__q": []}
            ).astype({"cnt": np.int64, "__q": np.int32})
        run_id = np.repeat(np.arange(len(lens)), npair)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(npair)])[run_id]
        L = lens[run_id]
        i = np.floor(
            ((2 * L - 1) - np.sqrt((2 * L - 1).astype(np.float64) ** 2 - 8 * within))
            / 2
        ).astype(np.int64)
        j = within - (i * (L - 1) - i * (i - 1) // 2) + i + 1
        base = starts[run_id]
        a, b = repo[base + i], repo[base + j]  # a < b: repos sorted per path
        g = (
            pd.DataFrame({"repo_a": a, "repo_b": b})
            .groupby(["repo_a", "repo_b"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        qh = stable_id64(
            (g["repo_a"] + "\x00" + g["repo_b"]).to_numpy(object)
        ).astype(np.int64)
        g["__q"] = part_of(qh, num_parts).astype(np.int32)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["repo_a", "repo_b"], sort=False)["cnt"]
            .sum()
            .reset_index(name="n_shared")
        )
        return g[g["n_shared"] >= min_shared]

    out = (
        corpus.select_columns(["repo", "path"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(path_pairs, batch_format="pandas")
        .groupby("__q")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return pa.table(
        {
            "repo_a": pa.array(out["repo_a"], pa.string()),
            "repo_b": pa.array(out["repo_b"], pa.string()),
            "n_shared": pa.array(out["n_shared"].to_numpy(np.int64)),
        }
    )


_IDENT_RE = None  # compiled once per worker process


def identifier_tokens(
    corpus: ray.data.Dataset, top_n: int = 20, num_parts: int = 16
) -> "pa.Table":
    """Identifier-subtoken mining over code content: extract identifiers
    ([A-Za-z_][A-Za-z0-9_]*), split snake_case on '_', and keep the
    top_n subtokens per language by (count desc, token asc) — the
    vocabulary census a code-LM tokenizer audit starts from (camelCase
    splitting is a no-op on this corpus and is documented out of scope).

    Scale shape: the per-batch combiner extracts + splits + pre-folds to
    (lang, token, n) partials — output is vocabulary-sized, not
    content-sized — then ONE hash(lang, token) shuffle completes exact
    counts with a per-partition top_n-per-lang pre-cut (the global top_n
    survives any cut keeping every partition's local top_n, the
    path_rollup argument); the driver merges P * top_n rows per lang."""
    import re

    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def combiner(t: pa.Table) -> pa.Table:
        global _IDENT_RE
        if _IDENT_RE is None:
            _IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        langs, toks = [], []
        for lang, content in zip(t["lang"].to_pylist(), t["content"].to_pylist()):
            for ident in _IDENT_RE.findall(content):
                for piece in ident.split("_"):
                    if piece:
                        langs.append(lang)
                        toks.append(piece)
        g = (
            pd.DataFrame({"lang": langs, "tok": toks})
            .groupby(["lang", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )
        kh = stable_id64(
            (g["lang"] + "\x00" + g["tok"]).to_numpy(object)
        ).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "tok": pa.array(g["tok"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
                "__p": pa.array(part_of(kh, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = df.groupby(["lang", "tok"], sort=False)["n"].sum().reset_index()
        a = a.sort_values(["lang", "n", "tok"], ascending=[True, False, True])
        return a.groupby("lang", sort=False).head(top_n)

    cands = (
        corpus.select_columns(["lang", "content"])
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    cands = cands.sort_values(["lang", "n", "tok"], ascending=[True, False, True])
    out = cands.groupby("lang", sort=True).head(top_n).reset_index(drop=True)
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "tok": pa.array(out["tok"], pa.string()),
            "n": pa.array(out["n"].to_numpy(np.int64)),
        }
    )


def boilerplate_lines(
    corpus: ray.data.Dataset,
    min_len: int = 8,
    min_files: int = 2,
    top_n: int = 100,
    num_parts: int = 16,
) -> "pa.Table":
    """Cross-document boilerplate-line detection (the C4-style curation
    step that strips license headers / repeated import blocks before
    training): the top_n space-trimmed lines of length >= min_len that
    occur in >= min_files DISTINCT files, ordered (n_files desc, line
    asc).

    Scale shape: each file is one row, so per-file line dedup is
    batch-local (vectorized split + explode + drop_duplicates); the
    combiner emits (line, n_files_partial) — boilerplate-vocabulary-sized,
    never the exploded line stream — keyed by a stable line hash into
    num_parts partitions; ONE __p groupby folds exact counts and applies
    the min_files filter plus a local top_n pre-cut (a line's full count
    lives in exactly one partition, so the global top_n survives the
    per-partition cut); the driver merges <= num_parts * top_n rows.
    Trimming is strip(' ') to mirror SQL trim() exactly."""
    import pandas as pd

    from ..functions.hashing import part_of, stable_id64

    def combiner(t: pa.Table) -> pa.Table:
        s = pd.Series(t["content"].to_pylist(), dtype=object).fillna("")
        ex = s.str.split("\n").explode()
        line = ex.str.strip(" ")
        keep = line.str.len() >= min_len
        sub = pd.DataFrame(
            {
                "f": ex.index.to_numpy()[keep.to_numpy()],
                "line": line[keep].to_numpy(object),
            }
        ).drop_duplicates()
        g = sub.groupby("line", sort=False).size().reset_index(name="nf")
        kh = stable_id64(g["line"].to_numpy(object)).astype(np.int64)
        return pa.table(
            {
                "line": pa.array(g["line"], pa.string()),
                "nf": pa.array(g["nf"].to_numpy(np.int64)),
                "__p": pa.array(part_of(kh, num_parts), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = df.groupby("line", sort=False)["nf"].sum().reset_index(name="n_files")
        a = a[a["n_files"] >= min_files]
        a = a.sort_values(["n_files", "line"], ascending=[False, True])
        return a.head(top_n)[["line", "n_files"]]

    cands = (
        corpus.select_columns(["content"])
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cands.sort_values(["n_files", "line"], ascending=[False, True])
        .head(top_n)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "line": pa.array(out["line"], pa.string()),
            "n_files": pa.array(out["n_files"].to_numpy(np.int64)),
        }
    )
