"""Hashing kernels (vectorized re-expressions of the reference's hash layer).

Reference semantics (behavior only, no code reuse):
- H1 `hashmulti` — multilinear universal string hash to {-1,+1}
  (Kaser & Lemire; `/root/reference/hash.cpp:20-26`): over uint64
  wraparound arithmetic, ``sum = r0 + sum_i r[i+1] * byte_i``; output is the
  MSB mapped to +1 (set) / -1 (clear).
- H3 `allocate_random_bits` — hash family H of L rows of (C+2) random
  uint64 (`/root/reference/main.cpp:562-582`), seeded (SEED=23).

Ours is numpy-vectorized: one matmul per (batch of chunks) x L instead of a
per-string loop, with explicit ``np.uint64`` wraparound semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np

SEED = 23  # reference param.h:19
L = 1000  # sketch bits, reference param.h:18
B = 100  # LSH bands, reference param.h:14
R = 20  # bits per band, reference param.h:15 (L == B * R)


def hash_family(chunk_length: int, l: int = L, seed: int = SEED) -> np.ndarray:
    """Seeded hash family H: shape (l, chunk_length + 2) of uint64.

    Mirrors the reference's shape contract (C+2 coefficients per row:
    one bias + one per byte of a max-length chunk + one spare for the
    ragged-last-chunk case, `main.cpp:566`). Uses PCG64 instead of
    mt19937_64 — the north rule requires self-consistency, not bit parity
    with the C++ binary (SURVEY.md H3 note).
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**64, size=(l, chunk_length + 2), dtype=np.uint64)


class MT19937_64:
    """Bit-exact MT19937-64 (Nishimura & Matsumoto 2004) — the generator
    behind ``std::mt19937_64``, whose parameters AND 10000th default-seeded
    output (9981545732273789042) are pinned by ISO C++ [rand.predef]; the
    test suite checks that constant plus an independent scalar oracle.

    This closes the reference's last fidelity gap (SURVEY.md H3): with
    `reference_hash_family` below, the H coefficients equal what the C++
    binary's ``mt19937_64 prng(SEED)`` feeds `allocate_random_bits`
    (`/root/reference/main.cpp:562-582`, SEED=23 `param.h:19`), so sketch
    bits become comparable byte-for-byte against a reference run (when the
    binary's pre-H prng draws — the test-gid shuffle — are accounted for:
    pass `skip` for the number of values std::shuffle consumed).

    Generation is blockwise-vectorized: the 312-word twist runs as three
    numpy segment updates, tempering as four vector ops."""

    _NN, _MM = 312, 156
    _MATRIX_A = np.uint64(0xB5026F5AA96619E9)
    _UM = np.uint64(0xFFFFFFFF80000000)
    _LM = np.uint64(0x7FFFFFFF)

    def __init__(self, seed: int = 5489, skip: int = 0):
        mt = np.empty(self._NN, np.uint64)
        mt[0] = np.uint64(seed)
        f = np.uint64(6364136223846793005)
        with np.errstate(over="ignore"):
            for i in range(1, self._NN):
                mt[i] = f * (mt[i - 1] ^ (mt[i - 1] >> np.uint64(62))) + np.uint64(i)
        self._mt = mt
        self._idx = self._NN
        if skip:
            self.next(skip)

    def _twist(self) -> None:
        NN, MM = self._NN, self._MM
        old = self._mt
        new = np.empty(NN, np.uint64)
        one = np.uint64(1)

        def f(x):
            return (x >> one) ^ np.where(
                (x & one).astype(bool), self._MATRIX_A, np.uint64(0)
            )

        # segment 1: i in [0, NN-MM) — all inputs are OLD state
        x = (old[: NN - MM] & self._UM) | (old[1 : NN - MM + 1] & self._LM)
        new[: NN - MM] = old[MM:NN] ^ f(x)
        # segment 2: i in [NN-MM, NN-1) — mt[i+MM-NN] is NEW state
        x = (old[NN - MM : NN - 1] & self._UM) | (old[NN - MM + 1 : NN] & self._LM)
        new[NN - MM : NN - 1] = new[: MM - 1] ^ f(x)
        # last word wraps to new[0]
        x = (old[NN - 1] & self._UM) | (new[0] & self._LM)
        new[NN - 1] = new[MM - 1] ^ f(np.asarray([x], np.uint64))[0]
        self._mt = new
        self._idx = 0

    def next(self, n: int = 1) -> np.ndarray:
        """The next n raw uint64 outputs (tempered), in sequence."""
        out = np.empty(n, np.uint64)
        got = 0
        while got < n:
            if self._idx >= self._NN:
                self._twist()
            take = min(n - got, self._NN - self._idx)
            x = self._mt[self._idx : self._idx + take].copy()
            x ^= (x >> np.uint64(29)) & np.uint64(0x5555555555555555)
            x ^= (x << np.uint64(17)) & np.uint64(0x71D67FFFEDA60000)
            x ^= (x << np.uint64(37)) & np.uint64(0xFFF7EEE000000000)
            x ^= x >> np.uint64(43)
            out[got : got + take] = x
            self._idx += take
            got += take
        return out


def reference_hash_family(
    chunk_length: int, l: int = L, seed: int = SEED, skip: int = 0
) -> np.ndarray:
    """H exactly as the reference binary draws it: row-major
    ``H[i][j] = prng()`` over an mt19937_64(seed) stream
    (`/root/reference/main.cpp:562-582`). `skip` accounts for prng values
    consumed before `allocate_random_bits` in a given run (the binary's
    test-gid std::shuffle, `main.cpp:201` — 0 when the test set is empty).
    Drop-in replacement for `hash_family` when byte-for-byte sketch parity
    with a C++ reference run is wanted."""
    draws = MT19937_64(seed, skip=skip).next(l * (chunk_length + 2))
    return draws.reshape(l, chunk_length + 2)


def hashmulti_batch(chunks: list[str] | np.ndarray, H: np.ndarray) -> np.ndarray:
    """Vectorized H1 for a batch of chunk strings.

    Returns an int8 array of shape (len(chunks), L) with values in {-1,+1}:
    ``out[j, i] = sign_bit(H[i,0] + sum_k H[i,k+1] * byte(chunks[j][k]))``
    mapped to +1 if the MSB is set else -1 (reference `hash.cpp:24-25`).

    Chunks of differing lengths are grouped by length so each group is one
    uint64 matmul (mod 2^64 wraparound via explicit uint64 dtype).
    """
    n = len(chunks)
    out = np.empty((n, H.shape[0]), dtype=np.int8)
    if n == 0:
        return out
    lengths = np.fromiter((len(c) for c in chunks), dtype=np.int64, count=n)
    order = np.argsort(lengths, kind="stable")
    H0 = H[:, 0]
    i = 0
    while i < n:
        j = i
        ln = lengths[order[i]]
        while j < n and lengths[order[j]] == ln:
            j += 1
        idx = order[i:j]
        if ln == 0:
            sums = np.broadcast_to(H0, (len(idx), H.shape[0]))
        else:
            # byte matrix: (group, ln) uint64
            raw = b"".join(
                chunks[k].encode("utf-8", errors="surrogateescape") for k in idx
            )
            bytes_mat = np.frombuffer(raw, dtype=np.uint8).reshape(len(idx), ln)
            coeff = H[:, 1 : ln + 1]  # (L, ln)
            with np.errstate(over="ignore"):
                sums = (
                    bytes_mat.astype(np.uint64) @ coeff.T.astype(np.uint64)
                ) + H0  # wraps mod 2^64
        out[idx] = np.where((sums >> np.uint64(63)) & np.uint64(1), 1, -1).astype(
            np.int8
        )
        i = j
    return out


def hashmulti_arrow(col, H: np.ndarray) -> np.ndarray:
    """H1 for an Arrow string/binary column — same output as
    `hashmulti_batch` but reads the offsets + byte buffer directly (no
    per-string Python objects)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    out = np.empty((n, H.shape[0]), dtype=np.int8)
    if n == 0:
        return out
    odtype = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    offsets = np.frombuffer(arr.buffers()[1], odtype)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = np.diff(offsets).astype(np.int64)
    order = np.argsort(lengths, kind="stable")
    H0 = H[:, 0]
    i = 0
    while i < n:
        j = i
        ln = int(lengths[order[i]])
        while j < n and lengths[order[j]] == ln:
            j += 1
        idx = order[i:j]
        if ln == 0:
            sums = np.broadcast_to(H0, (len(idx), H.shape[0]))
        else:
            bytes_mat = data[starts[idx][:, None] + np.arange(ln)]
            coeff = H[:, 1 : ln + 1]
            with np.errstate(over="ignore"):
                sums = (
                    bytes_mat.astype(np.uint64) @ coeff.T.astype(np.uint64)
                ) + H0
        out[idx] = np.where((sums >> np.uint64(63)) & np.uint64(1), 1, -1).astype(
            np.int8
        )
        i = j
    return out


def sha256_hex(values) -> list[str]:
    """Per-row sha256 hexdigest of a sequence of strings (ingest invariant)."""
    return [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in values]


def stable_id64(values, prefix: str = "") -> np.ndarray:
    """Deterministic 64-bit vertex ids for strings via blake2b-8.

    Collision probability over 10^12 vertices is ~2.7e-5 (birthday bound on
    64 bits); at that scale switch digest_size to 16. ids are guaranteed
    nonzero (0 is reserved as a sentinel).
    """
    out = np.empty(len(values), dtype=np.uint64)
    pfx = prefix.encode()
    for i, v in enumerate(values):
        d = hashlib.blake2b(pfx + v.encode("utf-8"), digest_size=8).digest()
        x = int.from_bytes(d, "little")
        out[i] = x if x != 0 else 1
    return out


def part_of(vertex: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition assignment for a uint64 vertex id column.

    Fibonacci-style multiplicative mix before the modulo so sequential
    integer keys (TPC-H keys) spread uniformly across partitions.
    """
    v = vertex.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        mixed = v * np.uint64(0x9E3779B97F4A7C15)
    return ((mixed >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int32)


M61 = (1 << 61) - 1  # Mersenne prime 2^61 - 1


def mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for uint64 x (any value < 2^64): one fold using
    2^61 ≡ 1, then a conditional subtract. Vectorized, no Python ints."""
    p = np.uint64(M61)
    r = (x >> np.uint64(61)) + (x & p)
    return np.where(r >= p, r - p, r)


def mulmod61(a: np.ndarray, k: int) -> np.ndarray:
    """(a * k) mod (2^61 - 1) for a uint64 vector a < 2^61 and a scalar
    constant k < 2^61, via 32-bit split products (every intermediate fits
    uint64; 2^64 ≡ 8 and x*2^32 mod p needs only shifts because
    2^61 ≡ 1 mod p). The exact mirror of SQL HUGEINT
    ``(a * k) %% 2305843009213693951``."""
    p = np.uint64(M61)
    a = a.astype(np.uint64, copy=False)
    kh, kl = np.uint64(k >> 32), np.uint64(k & 0xFFFFFFFF)
    ah = a >> np.uint64(32)          # < 2^29
    al = a & np.uint64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        t0 = mod61(al * kl)          # al*kl < 2^64
        t1 = mod61(ah * kl + al * kh)  # < 2^62
        # t1 * 2^32 mod p: (t1 >> 29) + ((t1 & (2^29-1)) << 32), < 2^61+2^32
        t1 = (t1 >> np.uint64(29)) + (
            (t1 & np.uint64((1 << 29) - 1)) << np.uint64(32)
        )
        t1 = np.where(t1 >= p, t1 - p, t1)
        t2 = mod61((ah * kh) << np.uint64(3))  # ah*kh*2^64 ≡ ah*kh*8, < 2^61
        r = t0 + t1 + t2                        # < 3·2^61 < 2^63
    return mod61(r)
