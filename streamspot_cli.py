#!/usr/bin/env python
"""Console wrapper for the reference-shaped StreamSpot CLI (S5).

    python streamspot_cli.py --edges E --bootstrap B --chunk-length C \
        --num-parallel-graphs P [--max-num-edges N] [--dataset all|ydc|gfc] \
        [--snapshot-dir D] [--evaluate]

Owns the Ray session (the library never calls ray.init)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ray

from sbustreamspot_core_ray.cli import main

if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        code = main()
    finally:
        ray.shutdown()
    sys.exit(code)
