"""Driver-contract conformance: every queries() entry has an oracle, all
names are stable identifiers, and the SQL strings are non-trivial."""

from __future__ import annotations

import importlib.util
import os
import re


def _load_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", os.path.join(root, "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_conformance():
    m = _load_entry()
    q = m.queries()
    o = m.oracle_sql()
    assert len(q) >= 115
    assert set(q) == set(o), (set(q) ^ set(o))
    for name, fn in q.items():
        assert re.fullmatch(r"[a-z0-9_]+", name), name
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_bench_queries_exist():
    import bench

    m = _load_entry()
    q = m.queries()
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, missing
