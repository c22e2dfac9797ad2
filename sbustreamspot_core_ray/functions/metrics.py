"""S4 runtime/metrics sink.

The reference accumulates per-edge nanosecond timers for its four stages
(graph update, shingle construction, sketch update, cluster update) and
prints the means at exit (`/root/reference/main.cpp:296-305,433-465`).
Ours is a per-stage counters TABLE — (stage, calls, units, seconds,
mean_us_per_unit) — written as parquet alongside pipeline outputs, so the
numbers ride the same lineage as the data they describe (north_rule:
"per-partition lineage + metrics").
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.parquet as pq


class StageMetrics:
    """Driver-side accumulator: tiny (one row per stage), cheap to carry."""

    def __init__(self):
        self._stages: dict[str, list[float]] = {}  # name -> [calls, units, sec]

    def add(self, stage: str, units: int, seconds: float) -> None:
        row = self._stages.setdefault(stage, [0, 0, 0.0])
        row[0] += 1
        row[1] += units
        row[2] += seconds

    @contextmanager
    def stage(self, name: str, units: int = 0):
        """Time a block: ``with metrics.stage("sketch_update", units=n): ...``"""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, units, time.perf_counter() - t0)

    def table(self) -> pa.Table:
        names = sorted(self._stages)
        calls = [self._stages[n][0] for n in names]
        units = [self._stages[n][1] for n in names]
        secs = [self._stages[n][2] for n in names]
        return pa.table(
            {
                "stage": pa.array(names, pa.string()),
                "calls": pa.array(calls, pa.int64()),
                "units": pa.array(units, pa.int64()),
                "seconds": pa.array(secs, pa.float64()),
                # the reference's headline number: mean time per unit
                "mean_us_per_unit": pa.array(
                    [s / u * 1e6 if u else 0.0 for s, u in zip(secs, units)],
                    pa.float64(),
                ),
            }
        )

    def write(self, directory: str, name: str = "_METRICS.parquet") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, name)
        pq.write_table(self.table(), path + ".tmp")
        os.replace(path + ".tmp", path)
        return path
