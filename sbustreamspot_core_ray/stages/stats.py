"""Distributed exact-moment statistics: one streaming pass accumulates
integer moment sums (n, Sx, Sy, Sxx, Sxy, Syy) per group inside
`map_batches`, the driver folds the tiny partial rows with unbounded
Python integers, and the closed-form OLS / Pearson expressions divide
exactly once at the end — so a SQL mirror computing the same HUGEINT
sums lands on bit-identical doubles.

Scale shape: the input streams once (column-pruned), every batch reduces
to <= n_groups rows of int64 partials (each bounded by batch_rows *
max|x*y| — callers quantize features so per-batch sums fit int64), and
only those partials reach the driver. No shuffle, no V-scale state.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.rounding import round_half_away

MOMENT_COLS = ("n", "sx", "sy", "sxx", "sxy", "syy")


def grouped_moment_sums(
    ds: ray.data.Dataset,
    extract: Callable[[pa.Table], tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> dict[str, tuple[int, int, int, int, int, int]]:
    """Accumulate exact per-group second-order moments of integer feature
    pairs. `extract(batch) -> (group, x, y)` where group is any numpy
    array usable as a key (stringable) and x, y are int64 feature arrays.
    Returns {group: (n, Sx, Sy, Sxx, Sxy, Syy)} folded with Python ints
    (no driver-side overflow regardless of total volume)."""

    def partials(t: pa.Table) -> pa.Table:
        g, x, y = extract(t)
        u, inv = np.unique(g, return_inverse=True)
        k = len(u)

        def agg(w: np.ndarray) -> np.ndarray:
            return np.bincount(inv, weights=w, minlength=k).astype(np.int64)

        ones = np.ones(len(x), np.int64)
        return pa.table(
            {
                "g": pa.array(u.astype(str)),
                "n": agg(ones),
                "sx": agg(x),
                "sy": agg(y),
                "sxx": agg(x * x),
                "sxy": agg(x * y),
                "syy": agg(y * y),
            }
        )

    acc: dict[str, list[int]] = {}
    for b in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if not b.num_rows:
            continue
        gs = b["g"].to_pylist()
        cols = [b[c].to_numpy() for c in MOMENT_COLS]
        for i, gkey in enumerate(gs):
            cur = acc.setdefault(gkey, [0, 0, 0, 0, 0, 0])
            for j in range(6):
                cur[j] += int(cols[j][i])
    return {g: tuple(v) for g, v in acc.items()}


def ols_table(
    moments: dict[str, tuple[int, int, int, int, int, int]],
    group_col: str = "grp",
    digits: int = 6,
) -> pa.Table:
    """Closed-form per-group simple OLS from exact integer moments:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept =
    (Sy*Sxx - Sx*Sxy) / (same denominator), r2 = (n*Sxy - Sx*Sy)^2 /
    ((n*Sxx - Sx^2) * (n*Syy - Sy^2)). Numerators and denominators stay
    exact Python integers; the one float divide (and its ROUND) is the
    expression a HUGEINT SQL mirror reproduces bit-for-bit. Degenerate
    groups (zero variance) emit NULL-free zeros, mirrored by the SQL
    CASE."""
    rows = []
    for g in sorted(moments):
        n, sx, sy, sxx, sxy, syy = moments[g]
        den = n * sxx - sx * sx
        deny = n * syy - sy * sy
        num = n * sxy - sx * sy
        slope = float(num) / float(den) if den != 0 else 0.0
        icpt = float(sy * sxx - sx * sxy) / float(den) if den != 0 else 0.0
        r2 = (
            float(num * num) / float(den * deny)
            if den != 0 and deny != 0
            else 0.0
        )
        rows.append((g, n, slope, icpt, r2))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "slope": pa.array(
                round_half_away(np.array([r[2] for r in rows]), digits),
                pa.float64(),
            ),
            "intercept": pa.array(
                round_half_away(np.array([r[3] for r in rows]), digits),
                pa.float64(),
            ),
            "r2": pa.array(
                round_half_away(np.array([r[4] for r in rows]), digits),
                pa.float64(),
            ),
        }
    )


def embedding_covariance(
    ds: ray.data.Dataset,
    col: str = "embedding",
    q: int = 1 << 20,
    digits: int = 12,
) -> pa.Table:
    """Exact sample covariance matrix of an embedding column: every
    vector quantizes to integers (floor(x * q + 0.5) on the float64
    upcast — both engines produce the same int), one streaming pass
    accumulates n, the per-dimension sums, and the integer Gram matrix
    (X^T X, one d x d int64 matmul per batch), the driver folds with
    Python ints, and cov(i, j) = (n*Sxy - Sx_i*Sx_j) / (n*(n-1)) / q^2
    divides in exactly that order so the HUGEINT SQL mirror matches
    bit-for-bit. Output: upper triangle (i, j 1-based, n, cov).

    Scale shape: each batch reduces to one (d, d) integer Gram — the
    dataset streams once and only O(d^2) partials per batch reach the
    driver; at d=64 that is 4 KB per batch regardless of corpus size."""
    from .ann import _mat

    def partials(t: pa.Table) -> pa.Table:
        e = _mat(t[col], np.float64)
        x = np.floor(e * float(q) + 0.5).astype(np.int64)
        d = x.shape[1]
        g = x.T @ x
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": np.concatenate(
                    [iu + 1, np.arange(1, d + 1), np.array([0])]
                ).astype(np.int64),
                "j": np.concatenate(
                    [ju + 1, np.zeros(d, np.int64), np.array([0])]
                ).astype(np.int64),
                "v": np.concatenate(
                    [g[iu, ju], x.sum(axis=0), np.array([x.shape[0]])]
                ).astype(np.int64),
            }
        )

    gram: dict[tuple[int, int], int] = {}
    sums: dict[int, int] = {}
    n = 0
    for b in ds.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if not b.num_rows:
            continue
        ii = b["i"].to_numpy()
        jj = b["j"].to_numpy()
        vv = b["v"].to_numpy()
        for i_, j_, v_ in zip(ii.tolist(), jj.tolist(), vv.tolist()):
            if i_ == 0:
                n += v_
            elif j_ == 0:
                sums[i_] = sums.get(i_, 0) + v_
            else:
                gram[(i_, j_)] = gram.get((i_, j_), 0) + v_
    rows_i, rows_j, rows_c = [], [], []
    den = n * (n - 1)
    qq = float(q) * float(q)
    for (i_, j_), sxy in sorted(gram.items()):
        num = n * sxy - sums[i_] * sums[j_]
        cov = float(num) / float(den) / qq if den > 0 else 0.0
        rows_i.append(i_)
        rows_j.append(j_)
        rows_c.append(cov)
    return pa.table(
        {
            "i": pa.array(rows_i, pa.int64()),
            "j": pa.array(rows_j, pa.int64()),
            "n": pa.array([n] * len(rows_i), pa.int64()),
            "cov": pa.array(
                round_half_away(np.array(rows_c, np.float64), digits),
                pa.float64(),
            ),
        }
    )


def pearson_table(
    moments: dict[str, tuple[int, int, int, int, int, int]],
    group_col: str = "pair",
    digits: int = 6,
) -> pa.Table:
    """Per-group Pearson correlation from the same exact moments:
    r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)).
    The sqrt runs on the exact integer product cast to double — one
    deterministic IEEE op each side."""
    rows = []
    for g in sorted(moments):
        n, sx, sy, sxx, sxy, syy = moments[g]
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        num = n * sxy - sx * sy
        r = float(num) / float(np.sqrt(float(den))) if den > 0 else 0.0
        rows.append((g, n, r))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows]),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "r": pa.array(
                round_half_away(np.array([r[2] for r in rows]), digits),
                pa.float64(),
            ),
        }
    )


def pca_power_projection(
    ds: ray.data.Dataset,
    col: str = "embedding",
    q: int = 1 << 14,
    vscale: int = 1 << 14,
    iters: int = 12,
) -> ray.data.Dataset:
    """Approximate first principal component by EXACT-integer power
    iteration, then the (scaled) PC1 projection of every embedding.

    All arithmetic is integers end to end, so the result is bit-identical
    to a HUGEINT SQL mirror with no float-summation-order exposure (the
    technique that carried the covariance/ANN oracles):
    - vectors quantize to x = floor(e * q + 0.5) (float64 upcast);
    - the centered scatter matrix C = n * Sxy - Sx Sx^T folds from
      per-batch integer Gram partials (Python-int driver fold — C fits
      HUGEINT at any realistic n; see the bound in the SQL mirror);
    - `iters` rounds of v <- C v renormalized by SIGN-AWARE TRUNCATED
      division v_i = trunc(y_i * vscale / max|y|) — the one nonlinear
      step, expressed identically in numpy/Python ints and SQL CASE +
      HUGEINT division (both truncate toward zero);
    - output proj_i = n * (x_i . v) - (Sx . v): the centered projection
      scaled by n, an exact int64.

    Scale shape: one streaming pass folds O(d^2) partials per batch (the
    embedding_covariance shape); the d x d power iteration is driver-side
    Python ints (d = 64: microseconds); the projection pass broadcasts v
    (d int64s) and streams. C is PSD, so the iteration converges to PC1
    without sign oscillation; `iters` is fixed and part of the mirrored
    semantics, not a convergence test."""
    from .ann import _mat

    def partials(t: pa.Table) -> pa.Table:
        e = _mat(t[col], np.float64)
        x = np.floor(e * float(q) + 0.5).astype(np.int64)
        d = x.shape[1]
        g = x.T @ x
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": np.concatenate(
                    [iu + 1, np.arange(1, d + 1), np.array([0])]
                ).astype(np.int64),
                "j": np.concatenate(
                    [ju + 1, np.zeros(d, np.int64), np.array([0])]
                ).astype(np.int64),
                "v": np.concatenate(
                    [g[iu, ju], x.sum(axis=0), np.array([x.shape[0]])]
                ).astype(np.int64),
            }
        )

    gram: dict[tuple[int, int], int] = {}
    sums: dict[int, int] = {}
    n = 0
    src = ds.materialize()  # consumed twice: Gram fold + projection
    for b in src.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if not b.num_rows:
            continue
        for i_, j_, v_ in zip(
            b["i"].to_numpy().tolist(),
            b["j"].to_numpy().tolist(),
            b["v"].to_numpy().tolist(),
        ):
            if i_ == 0:
                n += v_
            elif j_ == 0:
                sums[i_] = sums.get(i_, 0) + v_
            else:
                gram[(i_, j_)] = gram.get((i_, j_), 0) + v_
    d = max(sums) if sums else 0
    sx = [sums.get(i + 1, 0) for i in range(d)]
    C = [[0] * d for _ in range(d)]
    for (i_, j_), sxy in gram.items():
        c = n * sxy - sx[i_ - 1] * sx[j_ - 1]
        C[i_ - 1][j_ - 1] = c
        C[j_ - 1][i_ - 1] = c
    v = [vscale] * d
    for _ in range(iters):
        y = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max((abs(t) for t in y), default=0)
        if m == 0:
            break
        v = [
            (abs(t) * vscale // m) * (1 if t >= 0 else -1) for t in y
        ]
    varr = np.array(v, np.int64)
    c0 = sum(s * w for s, w in zip(sx, v))
    nn = n

    def project(t: pa.Table) -> pa.Table:
        e = _mat(t[col], np.float64)
        x = np.floor(e * float(q) + 0.5).astype(np.int64)
        proj = nn * (x @ varr) - c0
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "proj": pa.array(proj, pa.int64()),
            }
        )

    return src.map_batches(project, batch_format="pyarrow")
