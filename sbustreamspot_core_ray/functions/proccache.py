"""Per-worker-process caches for cheap stage state.

Ray Data actor pools (``map_batches(Cls, concurrency=N)``) spawn FRESH
actors for every dataset execution; on this engine that costs a measured
~1.5-2.4 s of cold-start per stage per run, vs ~0.3 s for a task-based
stage over the same input (see BASELINE.md).  Task workers, by contrast,
are long-lived processes reused across executions.  So stages whose state
is cheap to build but worth building once (compiled regexes, seeded hash
coefficient arrays, a broadcast lookup fetched from the object store) run
as plain functions and keep their state in these module-level per-process
caches: built on first use in each worker, reused for every later batch
AND every later query in the session.

Actor pools remain the right tool for genuinely expensive state (model
weights, codec contexts) — the multimodal decode stages keep that idiom.
"""

from __future__ import annotations

from typing import Any, Callable

_INSTANCES: dict[Any, Any] = {}


def singleton(cls: type, *args: Any) -> Any:
    """Return the per-process instance of ``cls(*args)`` (args hashable)."""
    key = (cls, args)
    inst = _INSTANCES.get(key)
    if inst is None:
        inst = _INSTANCES[key] = cls(*args)
    return inst


_OBJECTS: dict[Any, Any] = {}


def cached_get(ref: Any) -> Any:
    """``ray.get(ref)`` memoized per worker process.

    For non-numpy payloads (dicts, string arrays) ``ray.get`` re-deserializes
    on every call; broadcast lookups read per batch would pay that cost per
    batch. One fetch per process amortizes it to zero."""
    val = _OBJECTS.get(ref)
    if val is None:
        import ray

        val = _OBJECTS[ref] = ray.get(ref)
    return val


def call_singleton(cls: type, *args_and_batch: Any) -> Any:
    """Apply the per-process instance of ``cls(*ctor_args)`` to a batch.

    Designed for ``functools.partial(call_singleton, Cls, *ctor_args)`` as a
    task-based ``map_batches`` fn: partial binds the constructor args first
    and Ray appends the batch as the final positional argument."""
    *ctor_args, batch = args_and_batch
    return singleton(cls, *ctor_args)(batch)
