"""Unit tests for the hashing kernels (reference H1/H3 semantics)."""

import numpy as np

from sbustreamspot_core_ray.functions.hashing import (
    hash_family,
    hashmulti_batch,
    part_of,
    stable_id64,
)


def hashmulti_scalar(key: str, randbits: np.ndarray) -> int:
    """Direct transcription of the H1 definition (hash.cpp:20-26 semantics):
    uint64 wraparound sum, MSB -> +1/-1."""
    s = int(randbits[0])
    for i, ch in enumerate(key.encode("utf-8")):
        s = (s + int(randbits[i + 1]) * ch) % (1 << 64)
    return 1 if (s >> 63) & 1 else -1


def test_hashmulti_matches_scalar_definition():
    H = hash_family(chunk_length=8, l=64, seed=23)
    chunks = ["", "a", "ab", " tbq", "tbtbtbtb", "xy", "zzzz", " a"]
    got = hashmulti_batch(chunks, H)
    assert got.shape == (len(chunks), 64)
    for j, c in enumerate(chunks):
        for i in [0, 7, 33, 63]:
            assert got[j, i] == hashmulti_scalar(c, H[i]), (c, i)


def test_hashmulti_deterministic_and_balanced():
    H = hash_family(chunk_length=6, l=1000, seed=23)
    a = hashmulti_batch(["hello", "world"], H)
    b = hashmulti_batch(["hello", "world"], H)
    assert (a == b).all()
    # roughly balanced signs for a universal hash
    frac = (a == 1).mean()
    assert 0.35 < frac < 0.65


def test_stable_id64_nonzero_and_deterministic():
    ids1 = stable_id64(["x", "y", "x"], "R:")
    ids2 = stable_id64(["x", "y", "x"], "R:")
    assert (ids1 == ids2).all()
    assert ids1[0] == ids1[2] != ids1[1]
    assert (ids1 != 0).all()
    # prefix separates namespaces
    assert stable_id64(["x"], "R:")[0] != stable_id64(["x"], "P:")[0]


def test_part_of_uniform_on_sequential_keys():
    parts = part_of(np.arange(1, 100_001, dtype=np.uint64), 32)
    counts = np.bincount(parts, minlength=32)
    assert counts.min() > 100_000 / 32 * 0.8
    assert (parts == part_of(np.arange(1, 100_001, dtype=np.uint64), 32)).all()
