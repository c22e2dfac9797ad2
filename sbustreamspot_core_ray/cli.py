"""S5: the reference-shaped CLI entrypoint.

Mirrors the reference driver surface (`/root/reference/main.cpp:31-51`):

    streamspot --edges <tsv> --bootstrap <clusters> --chunk-length C
               --num-parallel-graphs P [--max-num-edges N]
               [--dataset all|ydc|gfc]

composed from the engine's own operators: `read_streamspot_tsv` (S1/M1) →
train/test split on the bootstrap gids (`io.cpp:101-111`) → seeded group
interleave (M6/W5, `main.cpp:193-230,321-346`) → `bootstrap_pipeline`
(§3.1) → `score_stream` (§3.2, windowed C6 scoring with interval
snapshots, the S4 stage timers and optional checkpoint/resume) → the
final anomaly-score/cluster table, plus `--evaluate`: the reference's
offline anomaly evaluation (`main.cpp:531-557`, `test_anomalies` at
`main.cpp:723-738`) as a per-scenario precision/recall report.

Engine extensions beyond the reference flags: --snapshot-dir, --interval,
--num-parts, --seed, --resume, --evaluate, --output.

The CLI owns no Ray session: `main()` initialises Ray only when the caller
has not (`streamspot_cli.py` at the repo root is the console wrapper).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .sources.bootstrap import BootstrapClusters, read_bootstrap_clusters
from .sources.edges import read_streamspot_tsv


def split_train_test(
    edges: ray.data.Dataset, train_gids: set[int]
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """`io.cpp:101-111`: edges of bootstrap gids are training edges; the
    rest form the test stream. Vectorized is_in filters; the test stream is
    NOT renumbered here — `interleave_groups` assigns the arrival order."""
    import pyarrow.compute as pc

    gids = pa.array(sorted(train_gids), pa.int64())

    def mk(keep_train: bool):
        def flt(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["gid"], value_set=gids)
            return t.filter(m if keep_train else pc.invert(m))

        return flt

    return (
        edges.map_batches(mk(True), batch_format="pyarrow"),
        edges.map_batches(mk(False), batch_format="pyarrow"),
    )


def interleave_groups(
    test_edges: ray.data.Dataset, par: int, seed: int = 23
) -> ray.data.Dataset:
    """M6/W5: the reference's simulated parallelism (`main.cpp:193-230`):
    shuffle the test gids, chunk into groups of `par`, stream groups
    sequentially with the edges of a group's gids randomly interleaved
    (per-gid edge order preserved, `main.cpp:336-346`).

    Order-preserving random interleave, vectorized: each gid's edges get
    sorted-uniform keys (normalized cumsum of seeded exponentials) and one
    lexsort by (group, key) yields the arrival order. This matches the
    reference's semantics (a seeded random merge of the per-gid streams);
    mt19937_64 bit-parity of the draw sequence is a documented non-goal
    (SURVEY H3). The id columns (gid, seq) come to the driver — O(16B) per
    test edge, bounded by the StreamSpot regime of <=600 bounded graphs —
    while the edge payload is re-sequenced distributed, per block."""
    ids = test_edges.select_columns(["gid", "seq"]).to_pandas()
    if not len(ids):
        return test_edges
    rng = np.random.Generator(np.random.PCG64(seed))

    gid = ids["gid"].to_numpy(np.int64)
    seq = ids["seq"].to_numpy(np.int64)
    uniq = np.unique(gid)
    perm = rng.permutation(len(uniq))  # shuffled test gids
    group_of = np.empty(len(uniq), np.int64)
    group_of[perm] = np.arange(len(uniq)) // par
    g_idx = np.searchsorted(uniq, gid)
    group = group_of[g_idx]

    # per-gid sorted-uniform keys, edges in per-gid seq order
    order = np.lexsort((seq, gid))
    e = rng.standard_exponential(len(gid))
    cs = np.cumsum(e)
    starts = np.flatnonzero(
        np.concatenate([[True], gid[order][1:] != gid[order][:-1]])
    )
    base = np.repeat(cs[starts] - e[order][starts], np.diff(np.append(starts, len(gid))))
    key_sorted = cs - base  # increasing within each gid run
    key = np.empty(len(gid))
    key[order] = key_sorted

    arrival = np.lexsort((key, group))
    new_seq = np.empty(len(gid), np.int64)
    new_seq[arrival] = np.arange(len(gid))

    # map old seq -> new seq inside each block (old seqs are unique)
    lut_keys = seq
    lut_order = np.argsort(lut_keys)
    lut_ref = ray.put((lut_keys[lut_order], new_seq[lut_order]))

    def reseq(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(lut_ref)
        s = t["seq"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ks, s)
        return t.set_column(
            t.schema.get_field_index("seq"), "seq", pa.array(vs[pos], pa.int64())
        )

    return test_edges.map_batches(reseq, batch_format="pyarrow")


def anomaly_report(
    all_edges: ray.data.Dataset,
    chunk_length: int,
    num_graphs: int | None = None,
) -> pd.DataFrame:
    """The reference's offline anomaly evaluation (`main.cpp:531-557` +
    `test_anomalies` `main.cpp:723-738`) as a per-scenario report: build
    exact SimHash sketches (seed-101 family, H6/H7) of EVERY graph, LSH
    tables indexed on the NORMAL gids, flag a gid anomalous iff it is
    isolated (C2 anti-join), then aggregate precision/recall per scenario
    (gid//100). Attack labels follow the reference: gids 300-399 when
    num_graphs == 600 (the 'UIC data hack'), else the upper half."""
    from .stages.lsh import hash_bands, isolated_gids
    from .stages.shingle import construct_shingle_vectors
    from .stages.sketch import construct_simhash_sketches

    sk = construct_simhash_sketches(
        construct_shingle_vectors(all_edges, chunk_length), chunk_length
    ).materialize()
    gids = np.sort(sk.select_columns(["gid"]).to_pandas()["gid"].to_numpy(np.int64))
    n = int(num_graphs) if num_graphs else int(gids.max()) + 1
    if n == 600:
        attack = set(range(300, 400))
    else:
        attack = set(range(n // 2, n))

    bands = hash_bands(sk).materialize()
    normal_arr = pa.array(sorted(set(gids.tolist()) - attack), pa.int64())

    def keep_normal(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["gid"], value_set=normal_arr))

    idx = bands.map_batches(keep_normal, batch_format="pyarrow")
    iso = isolated_gids(bands, idx, num_partitions=4).to_pandas()

    iso["scenario"] = iso["gid"] // 100
    iso["is_attack"] = iso["gid"].isin(attack)
    rows = []
    for scen, grp in iso.groupby("scenario"):
        flagged = grp["isolated"].to_numpy(bool)
        att = grp["is_attack"].to_numpy(bool)
        tp = int((flagged & att).sum())
        n_flag = int(flagged.sum())
        n_att = int(att.sum())
        rows.append(
            {
                "scenario": int(scen),
                "n_graphs": len(grp),
                "n_attack": n_att,
                "n_flagged": n_flag,
                "true_pos": tp,
                "precision": tp / n_flag if n_flag else float("nan"),
                "recall": tp / n_att if n_att else float("nan"),
            }
        )
    return pd.DataFrame(rows).sort_values("scenario").reset_index(drop=True)


def run_streamspot(
    edges_path: str,
    bootstrap_path: str,
    chunk_length: int,
    par: int,
    max_edges: int | None = None,
    dataset: str = "all",
    snapshot_dir: str | None = None,
    interval: int = 10_000,
    num_parts: int = 4,
    seed: int = 23,
    resume: bool = False,
    evaluate: bool = False,
) -> dict:
    """Compose the full reference pipeline; returns a dict with the final
    snapshot table (interval, gid, anomaly_score, cluster_id), the bootstrap
    summary, and (with evaluate=True) the per-scenario anomaly report."""
    from .pipelines.streamspot import bootstrap_pipeline, score_stream

    bc: BootstrapClusters = read_bootstrap_clusters(bootstrap_path)
    edges = read_streamspot_tsv(edges_path, dataset).materialize()
    train, test = split_train_test(edges, bc.train_gids)
    test = interleave_groups(test, par, seed=seed).materialize()
    n_test = test.count()
    if edges.count() == 0:
        raise SystemExit(f"0 graphs for dataset: {dataset}")
    if n_test == 0:
        raise SystemExit(f"0 test edges for dataset: {dataset}")

    state = bootstrap_pipeline(train, bc, chunk_length, seed=seed)
    snapshots = score_stream(
        state,
        test,
        chunk_length,
        interval=interval,
        max_edges=max_edges,
        snapshot_dir=snapshot_dir,
        seed=seed,
        num_parts=num_parts,
        resume=resume,
    )
    out: dict = {
        "snapshots": snapshots,
        "num_test_edges": n_test,
        "num_train_gids": len(bc.train_gids),
        "nclusters": bc.nclusters,
        "metrics": state.metrics.table().to_pandas() if state.metrics else None,
    }
    if evaluate:
        out["anomaly_report"] = anomaly_report(edges, chunk_length)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="streamspot",
        description="StreamSpot on Ray Data (reference CLI surface, "
        "main.cpp:31-51).",
    )
    ap.add_argument("--edges", required=True, help="incoming stream of edges (TSV)")
    ap.add_argument("--bootstrap", required=True, help="bootstrap clusters file")
    ap.add_argument("--chunk-length", type=int, required=True, help="parameter C")
    ap.add_argument(
        "--num-parallel-graphs", type=int, required=True, help="parameter P"
    )
    ap.add_argument(
        "--max-num-edges", type=int, default=None, help="parameter N [default: inf]"
    )
    ap.add_argument(
        "--dataset", default="all", choices=["all", "ydc", "gfc"],
        help="'all', 'ydc', 'gfc' [default: all]",
    )
    ap.add_argument("--snapshot-dir", default=None, help="interval snapshot output")
    ap.add_argument("--interval", type=int, default=10_000)
    ap.add_argument("--num-parts", type=int, default=4)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--evaluate", action="store_true",
        help="per-scenario anomaly precision report (main.cpp:531-557)",
    )
    ap.add_argument("--output", default=None, help="write snapshots parquet here")
    args = ap.parse_args(argv)

    if args.chunk_length < 4:
        # the reference asserts K == 1 && chunk_length >= 4 (main.cpp:149)
        ap.error("--chunk-length must be >= 4")

    print(
        f"StreamSpot (C={args.chunk_length}, L=1000, "
        f"N={args.max_num_edges if args.max_num_edges is not None else -1}, "
        f"P={args.num_parallel_graphs}, DATA={args.dataset})"
    )
    res = run_streamspot(
        args.edges,
        args.bootstrap,
        args.chunk_length,
        args.num_parallel_graphs,
        max_edges=args.max_num_edges,
        dataset=args.dataset,
        snapshot_dir=args.snapshot_dir,
        interval=args.interval,
        num_parts=args.num_parts,
        seed=args.seed,
        resume=args.resume,
        evaluate=args.evaluate,
    )
    snaps: pd.DataFrame = res["snapshots"]
    last = snaps[snaps["interval"] == snaps["interval"].max()]
    print(f"Streamed {res['num_test_edges']} test edges; "
          f"{snaps['interval'].nunique()} snapshot intervals")
    print("Final anomaly scores:")
    for _, r in last.sort_values("gid").iterrows():
        print(f"  {int(r['gid'])}\t{r['anomaly_score']:.6f}\t"
              f"cluster={int(r['cluster_id'])}")
    if res.get("metrics") is not None:
        print("Runtimes (per stage):")
        print(res["metrics"].to_string(index=False))
    if "anomaly_report" in res:
        print("Per-scenario anomaly evaluation:")
        print(res["anomaly_report"].to_string(index=False))
    if args.output:
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(snaps), args.output)
        print(f"snapshots -> {args.output}")
    return 0


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        code = main()
    finally:
        ray.shutdown()
    sys.exit(code)
