import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _reap_actor_handles():
    """Collect dropped actor handles promptly after every test: ShardedGraph
    shard actors / _PairReducer pools die when their handle refcount hits
    zero, and without an explicit gc the CPython cycle collector can delay
    that for many tests, accumulating idle worker processes — the
    thread-exhaustion flake seen when the suite shares the box with another
    Ray session (VERDICT r03 item 5)."""
    yield
    import gc

    gc.collect()
