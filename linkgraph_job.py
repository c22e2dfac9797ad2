#!/usr/bin/env python
"""`ray job submit` entrypoint for the flagship link-graph pipeline.

The north-star deployment shape (BASELINE.json): ingest a Parquet corpus of
source-code repositories (repo, path, commit, lang, content) with the
per-row sha256 content invariant, extract repo->path/import reference
edges, build hash-partitioned CSR shards in a stateful actor pool, and run
the four graph kernels — PageRank, connected components, label
propagation, triangle count — with per-partition checkpoints, writing each
result as resumable partitioned Parquet plus a run-metrics JSON.

On a real cluster::

    ray job submit --working-dir . -- python linkgraph_job.py \
        --corpus /data/repos --output /out/run1 --num-parts 256 \
        --algos pagerank,cc,lp,triangles --checkpoint-dir /out/run1/ckpt

In this sandbox the same script runs against a local session
(RAY_ADDRESS=local is preset); `--demo` generates the deterministic
synthetic corpus first so the whole flow is one command::

    python linkgraph_job.py --demo /tmp/lgdemo --output /tmp/lgout

The script owns the Ray session ONLY when none exists (so it also runs
under the pytest fixture / driver-owned sessions without touching their
lifecycle).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa

import ray
import ray.data

ALGOS = ("pagerank", "cc", "lp", "triangles")


def _bucketed(ds: ray.data.Dataset, key: str, n_buckets: int) -> ray.data.Dataset:
    """Add the output-partition column (hash bucket of the key) the
    resumable sink partitions by."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    def tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array(part_of(k, n_buckets), pa.int32())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def run_job(args: argparse.Namespace) -> dict:
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from sbustreamspot_core_ray.sources.corpus import ingest_corpus
    from sbustreamspot_core_ray.sources.edges import extract_edges
    from sbustreamspot_core_ray.sources.sinks import write_partitioned_resumable

    algos = [a.strip() for a in args.algos.split(",") if a.strip()]
    unknown = [a for a in algos if a not in ALGOS]
    if unknown:
        raise SystemExit(f"unknown algos {unknown}; choose from {ALGOS}")
    os.makedirs(args.output, exist_ok=True)
    metrics: dict = {
        "corpus": args.corpus,
        "num_parts": args.num_parts,
        "algos": algos,
        "stages": {},
    }

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        metrics["stages"][name] = round(time.perf_counter() - t0, 3)
        return out

    # ingest (sha256 invariant enforced inside) -> typed edge table
    corpus = timed(
        "ingest", lambda: ingest_corpus(args.corpus, num_partitions=args.num_parts)
    )
    edges = timed(
        "extract_edges",
        lambda: extract_edges(corpus).select_columns(["src", "dst"]).materialize(),
    )
    metrics["n_edge_rows"] = edges.count()

    ckpt = args.checkpoint_dir
    salt = args.salt_threshold if args.salt_threshold > 0 else None

    g_dir = None
    if "pagerank" in algos:
        g_dir = timed(
            "build_directed",
            lambda: ShardedGraph.build(
                edges, num_parts=args.num_parts, symmetric=False,
                salt_threshold=salt,
            ),
        )
        pr = timed(
            "pagerank",
            lambda: pagerank(
                g_dir,
                max_iters=args.pagerank_iters,
                ckpt_dir=os.path.join(ckpt, "pagerank") if ckpt else None,
            ),
        )
        res = timed(
            "write_pagerank",
            lambda: write_partitioned_resumable(
                _bucketed(pr, "vertex", args.out_buckets),
                os.path.join(args.output, "pagerank"),
                "bucket",
            ),
        )
        metrics["pagerank_partitions"] = res

    g_sym = None
    if "cc" in algos or "lp" in algos:
        g_sym = timed(
            "build_symmetric",
            lambda: ShardedGraph.build(
                edges, num_parts=args.num_parts, symmetric=True,
                salt_threshold=salt,
            ),
        )
    if "cc" in algos:
        cc = timed(
            "connected_components",
            lambda: connected_components(
                g_sym, ckpt_dir=os.path.join(ckpt, "cc") if ckpt else None
            ),
        )
        res = timed(
            "write_cc",
            lambda: write_partitioned_resumable(
                _bucketed(cc, "vertex", args.out_buckets),
                os.path.join(args.output, "cc"),
                "bucket",
            ),
        )
        metrics["cc_partitions"] = res
    if "lp" in algos:
        lp = timed(
            "label_propagation",
            lambda: label_propagation(g_sym, iters=args.lp_iters),
        )
        res = timed(
            "write_lp",
            lambda: write_partitioned_resumable(
                _bucketed(lp, "vertex", args.out_buckets),
                os.path.join(args.output, "lp"),
                "bucket",
            ),
        )
        metrics["lp_partitions"] = res

    if "triangles" in algos:
        tri = timed(
            "triangles", lambda: triangle_count(edges, args.num_parts).to_pandas()
        )
        n = int(tri["triangles"].iloc[0]) if len(tri) else 0
        metrics["triangles"] = n
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({"triangles": pa.array([n], pa.int64())}),
            os.path.join(args.output, "triangles.parquet"),
        )

    with open(os.path.join(args.output, "_METRICS.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", help="Parquet corpus root (repo/path/commit/lang/content)")
    ap.add_argument("--demo", metavar="DIR",
                    help="generate the deterministic synthetic corpus here and use it")
    ap.add_argument("--demo-files", type=int, default=3000)
    ap.add_argument("--output", required=True)
    ap.add_argument("--algos", default="pagerank,cc,lp,triangles")
    ap.add_argument("--num-parts", type=int, default=8)
    ap.add_argument("--out-buckets", type=int, default=16,
                    help="output partition count per result table")
    ap.add_argument("--pagerank-iters", type=int, default=20)
    ap.add_argument("--lp-iters", type=int, default=5)
    ap.add_argument("--salt-threshold", type=int, default=0,
                    help=">0: salt sources with out-degree above this")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)

    if args.demo:
        from sbustreamspot_core_ray.sources.corpus import generate_corpus

        generate_corpus(args.demo, n_files=args.demo_files, seed=23)
        args.corpus = args.demo
    if not args.corpus:
        ap.error("--corpus or --demo is required")

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        metrics = run_job(args)
    finally:
        if owns_session:
            ray.shutdown()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
