"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one entry per implemented pipeline/operator from
SURVEY.md §2 (plus the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for every SQL-expressible one. Column names and
rounding are mirrored exactly between the Ray pipelines and the SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Graph queries run over a deterministic edge table derived from the TPC-H
tables (see ``sources/edges.py``): vertices are arithmetic ids
(customer key; order/part/supplier keys offset by 1e7/2e7/3e7), so the
identical derivation is expressible in SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from sbustreamspot_core_ray.functions.rounding import round_half_away

P = 8  # partition count for query-scale runs (fixed per run)
PR_ITERS = 10
PR_DAMPING = 0.85
LP_ITERS = 3
SHINGLE_C = 5
KNN_K = 10
KNN_NQ = 3

# --------------------------------------------------------------------------
# shared edge derivations (Ray side; SQL mirrors below)
# --------------------------------------------------------------------------


def _edges_full(sf_dir: str, dedup: bool = True) -> ray.data.Dataset:
    from sbustreamspot_core_ray.sources.edges import edges_from_tpch

    return edges_from_tpch(sf_dir, dedup=dedup)


def _edges_custorder(sf_dir: str) -> ray.data.Dataset:
    # (o_custkey, o_orderkey) is unique by construction (o_orderkey is the
    # PK), so no dedup shuffle; the CSR shards dedup defensively anyway
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )

    def co(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t["o_custkey"], pa.int64()),
                "dst": pc.add(pc.cast(t["o_orderkey"], pa.int64()), 10_000_000),
            }
        )

    return orders.map_batches(co, batch_format="pyarrow")


def _edges_triangle(sf_dir: str) -> ray.data.Dataset:
    """order-part, part-supplier, order-supplier (lineitem co-occurrence) --
    a graph that actually contains triangles. No pre-dedup: triangle_count's
    first step canonicalizes + dedups anyway."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_suppkey"]
    )

    def mk(t: pa.Table) -> pa.Table:
        o = pc.add(pc.cast(t["l_orderkey"], pa.int64()), 10_000_000).combine_chunks()
        p = pc.add(pc.cast(t["l_partkey"], pa.int64()), 20_000_000).combine_chunks()
        s = pc.add(pc.cast(t["l_suppkey"], pa.int64()), 30_000_000).combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([o, p, o]),
                "dst": pa.concat_arrays([p, s, s]),
            }
        )

    return li.map_batches(mk, batch_format="pyarrow")


def _edges_typed(sf_dir: str) -> ray.data.Dataset:
    """Typed edge table for the shingle query: char node/edge types per
    layer, gid = src % 53, seq = dst (deterministic out-edge order that the
    SQL mirrors with string_agg ORDER BY dst)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_suppkey"]
    )

    def typed(src, dst, st: str, dt: str, et: str) -> pa.Table:
        s = src.to_numpy(zero_copy_only=False).astype(np.int64)
        d = dst.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(s)
        return pa.table(
            {
                "src": s,
                "dst": d,
                "src_type": np.full(n, ord(st), np.uint8),
                "dst_type": np.full(n, ord(dt), np.uint8),
                "e_type": np.full(n, ord(et), np.uint8),
                "gid": s % 53,
                "seq": d,
            }
        )

    def co(t: pa.Table) -> pa.Table:
        return typed(
            pc.cast(t["o_custkey"], pa.int64()),
            pc.add(pc.cast(t["o_orderkey"], pa.int64()), 10_000_000),
            "c", "o", "x",
        )

    def pairs(t: pa.Table) -> pa.Table:
        o = pc.add(pc.cast(t["l_orderkey"], pa.int64()), 10_000_000).combine_chunks()
        p = pc.add(pc.cast(t["l_partkey"], pa.int64()), 20_000_000).combine_chunks()
        s = pc.add(pc.cast(t["l_suppkey"], pa.int64()), 30_000_000).combine_chunks()
        return pa.table({"src": pa.concat_arrays([o, p]), "dst": pa.concat_arrays([p, s])})

    def typed_by_range(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        is_op = s < 20_000_000  # src layer decides the (st, dt, et) triple
        return pa.table(
            {
                "src": s,
                "dst": d,
                "src_type": np.where(is_op, ord("o"), ord("p")).astype(np.uint8),
                "dst_type": np.where(is_op, ord("p"), ord("s")).astype(np.uint8),
                "e_type": np.where(is_op, ord("y"), ord("z")).astype(np.uint8),
                "gid": s % 53,
                "seq": d,
            }
        )

    from sbustreamspot_core_ray.sources.edges import distinct_int_rows

    # ONE distinct over the union of both lineitem layers — their id ranges
    # are disjoint, so distinct(union) == union(distinct per layer), and the
    # type columns are recoverable from the src range afterward. One
    # lineitem read and one shuffle replace two of each (the orders layer
    # needs neither: o_orderkey is the PK).
    ded = distinct_int_rows(
        li.map_batches(pairs, batch_format="pyarrow"), ["src", "dst"], 16
    )
    return orders.map_batches(co, batch_format="pyarrow").union(
        ded.map_batches(typed_by_range, batch_format="pyarrow")
    )


_SQL_EDGES = """
  SELECT DISTINCT o_custkey AS src, 10000000 + o_orderkey AS dst FROM orders
  UNION
  SELECT DISTINCT 10000000 + l_orderkey, 20000000 + l_partkey FROM lineitem
  UNION
  SELECT DISTINCT 20000000 + l_partkey, 30000000 + l_suppkey FROM lineitem
"""

_SQL_EDGES_CO = """
  SELECT DISTINCT o_custkey AS src, 10000000 + o_orderkey AS dst FROM orders
"""

_SQL_EDGES_TRI = """
  SELECT DISTINCT 10000000 + l_orderkey AS src, 20000000 + l_partkey AS dst FROM lineitem
  UNION
  SELECT DISTINCT 20000000 + l_partkey, 30000000 + l_suppkey FROM lineitem
  UNION
  SELECT DISTINCT 10000000 + l_orderkey, 30000000 + l_suppkey FROM lineitem
"""


# --------------------------------------------------------------------------
# sketch-family SQL oracles: the seeded hash constants are INPUTS (the same
# family the Ray stages draw), embedded as VALUES; all hash arithmetic is
# recomputed independently in SQL via HUGEINT modular math (uint64
# wraparound == % 2^64; products stay under 2^127).
# --------------------------------------------------------------------------

_POW64 = "18446744073709551616::HUGEINT"  # 2^64
_MSB64 = "9223372036854775808::HUGEINT"  # 2^63

# typed-graph shingle chain (identical text is the body of the passing
# `shingles` oracle)
_SQL_SHINGLE_CTES = f"""
te AS (
  SELECT DISTINCT o_custkey AS src, 10000000 + o_orderkey AS dst,
         'c' AS st, 'o' AS dt, 'x' AS et FROM orders
  UNION
  SELECT DISTINCT 10000000 + l_orderkey, 20000000 + l_partkey, 'o', 'p', 'y' FROM lineitem
  UNION
  SELECT DISTINCT 20000000 + l_partkey, 30000000 + l_suppkey, 'p', 's', 'z' FROM lineitem
),
strs AS (
  SELECT src % 53 AS gid, src,
         ' ' || st || string_agg(et || dt, '' ORDER BY dst) AS s
  FROM te GROUP BY src % 53, src, st
),
chunks AS (
  SELECT gid, substring(s, CAST(i AS INT), {SHINGLE_C}) AS shingle
  FROM strs, generate_series(1, 8192, {SHINGLE_C}) g(i)
  WHERE g.i <= length(s)
),
shing AS (SELECT gid, shingle, count(*) AS cnt FROM chunks GROUP BY gid, shingle)"""


def _hash_family_values(seed: int, c: int = SHINGLE_C) -> str:
    """The seeded H family (L x (C+2) uint64) as a VALUES list — one row
    per hash i with its first C+1 coefficients (chunks are <= C bytes)."""
    from sbustreamspot_core_ray.functions.hashing import hash_family

    H = hash_family(c, seed=seed)
    return ",".join(
        "({},{})".format(i, ",".join(f"{v}::HUGEINT" for v in r[: c + 1]))
        for i, r in enumerate(H)
    )


def _sketch_bits_ctes(seed: int, c: int = SHINGLE_C) -> str:
    """CTEs hh/sg/proj/bits: hashmulti (H1) + projection (H4) + sign bits,
    over the `shing` CTE. hashmulti = (r0 + sum_k r_{k+1}*byte_k) mod 2^64,
    MSB set -> +1 (reference hash.cpp:20-26 semantics)."""
    byte_terms = " + ".join(
        f"hh.r{k} * CASE WHEN length(s.shingle) >= {k} THEN"
        f" ascii(substring(s.shingle,{k},1)) ELSE 0 END"
        for k in range(1, c + 1)
    )
    cols = ", ".join(f"r{k}" for k in range(c + 1))
    return f"""
hh(i, {cols}) AS (VALUES {_hash_family_values(seed, c)}),
sg AS (
  SELECT s.gid, s.cnt, hh.i,
    CASE WHEN ((hh.r0 + {byte_terms}) % {_POW64}) >= {_MSB64}
         THEN 1 ELSE -1 END AS sgn
  FROM shing s CROSS JOIN hh
),
proj AS (SELECT gid, i, SUM(cnt * sgn) AS p FROM sg GROUP BY gid, i),
bits AS (SELECT gid, i, CASE WHEN p >= 0 THEN 1 ELSE 0 END AS bit FROM proj)"""


_SQL_SKETCH_HEX = """
byt AS (SELECT gid, i // 8 AS byte_idx, SUM(bit * (128 >> (i % 8))) AS bv
        FROM bits GROUP BY gid, i // 8),
hx AS (SELECT gid, string_agg(printf('%02x', CAST(bv AS INT)), '' ORDER BY byte_idx)
              AS sketch_hex
       FROM byt GROUP BY gid)"""

# LSH bands (C1): band b = bits [20b, 20b+20), MSB-first within the band
_SQL_BANDS_CTE = """
bands AS (
  SELECT gid, i // 20 AS band_idx,
         SUM(bit * (1 << (19 - (i % 20)))) AS band_value
  FROM bits GROUP BY gid, i // 20
)"""


def _streamhash_sketches_sql() -> str:
    return (
        f"WITH {_SQL_SHINGLE_CTES}, {_sketch_bits_ctes(23)}, {_SQL_SKETCH_HEX}\n"
        "SELECT h.gid, h.sketch_hex, CAST(p.pop AS BIGINT) AS pop FROM hx h\n"
        "JOIN (SELECT gid, SUM(bit) AS pop FROM bits GROUP BY gid) p USING (gid)"
    )


def _simhash_sketches_sql() -> str:
    return (
        f"WITH {_SQL_SHINGLE_CTES}, {_sketch_bits_ctes(101)}, {_SQL_SKETCH_HEX}\n"
        "SELECT gid, sketch_hex FROM hx"
    )


def _lsh_isolated_sql() -> str:
    """C2 anti-join: query gid (>=40) isolated iff none of its band buckets
    exists in the index (gid < 40)."""
    return f"""
WITH {_SQL_SHINGLE_CTES}, {_sketch_bits_ctes(23)}, {_SQL_BANDS_CTE}
SELECT q.gid, (COUNT(ix.band_value) = 0) AS isolated
FROM (SELECT * FROM bands WHERE gid >= 40) q
LEFT JOIN (SELECT DISTINCT band_idx, band_value FROM bands WHERE gid < 40) ix
  USING (band_idx, band_value)
GROUP BY q.gid"""


def _lsh_clusters_sql() -> str:
    """C4: connected components over the co-bucket star-pair graph;
    cluster = min gid of the component."""
    return f"""
WITH RECURSIVE {_SQL_SHINGLE_CTES}, {_sketch_bits_ctes(23)}, {_SQL_BANDS_CTE},
bp AS (
  SELECT min(gid) OVER (PARTITION BY band_idx, band_value) AS src, gid AS dst
  FROM bands
),
sym AS (SELECT src AS s, dst AS d FROM bp WHERE src <> dst
        UNION SELECT dst, src FROM bp WHERE src <> dst),
reach(vx, lbl) AS (
  SELECT DISTINCT gid, gid FROM bands
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN sym e ON e.s = r.vx
)
SELECT vx AS gid, MIN(lbl) AS cluster FROM reach GROUP BY vx"""


# ---- document shingle / minhash / simhash chain over `documents` ---------


def _doc_shingle_ctes() -> str:
    """dsh CTE: distinct 64-bit k-gram rolling hashes per doc (base
    1099511628211 Horner over UTF-8 bytes, uint64 wraparound) — the SQL twin
    of dedup._char_shingles (text is ASCII-checked synthetic data, so
    ascii(char) == byte)."""
    base = 1099511628211
    pows = [pow(base, SHINGLE_C - 1 - j, 1 << 64) for j in range(SHINGLE_C)]
    terms = " + ".join(
        f"(ascii(substring(text, CAST(i+{j} AS INT), 1)) * {pows[j]}::HUGEINT) % {_POW64}"
        for j in range(SHINGLE_C)
    )
    return f"""
dpos AS (
  SELECT doc_id, text, g.i AS i
  FROM documents, generate_series(1, 8192) g(i)
  WHERE g.i <= length(text) - {SHINGLE_C - 1}
),
dsh AS (SELECT DISTINCT doc_id, ({terms}) % {_POW64} AS sh FROM dpos)"""


def _minhash_band_ctes(num_perm: int = 128, bands: int = 32, seed: int = 23) -> str:
    """perm/gp/sig/bandv CTEs: minhash signatures (uint64-wraparound
    (a*x+b) mod 2^61-1, matching dedup._MinHash) banded with the
    golden-ratio fold — shared by the star-candidate chain and the
    incremental delta-candidate chain."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
    perm_vals = ",".join(
        f"({m},{a[m]}::HUGEINT,{b[m]}::HUGEINT)" for m in range(num_perm)
    )
    rows = num_perm // bands
    gold = 0x9E3779B97F4A7C15
    gp_vals = ",".join(
        f"({j},{pow(gold, rows - 1 - j, 1 << 64)}::HUGEINT)" for j in range(rows)
    )
    return f"""
perm(m, a, b) AS (VALUES {perm_vals}),
gp(j, g) AS (VALUES {gp_vals}),
sig AS (
  SELECT doc_id, m,
         MIN((((sh * a) % {_POW64} + b) % {_POW64}) % 2305843009213693951::HUGEINT) AS s
  FROM dsh CROSS JOIN perm GROUP BY doc_id, m
),
bandv AS (
  SELECT doc_id, m // {rows} AS band_idx,
         CAST((SUM((s * gp.g) % {_POW64}) % {_POW64}) // 2 AS BIGINT) AS band_value
  FROM sig JOIN gp ON gp.j = m % {rows}
  GROUP BY doc_id, m // {rows}
)"""


def _minhash_cand_ctes(num_perm: int = 128, bands: int = 32, seed: int = 23) -> str:
    """band CTEs + the star candidate pairs per bucket."""
    return f"""{_minhash_band_ctes(num_perm, bands, seed)},
cand AS (
  SELECT DISTINCT src, dst FROM (
    SELECT min(doc_id) OVER (PARTITION BY band_idx, band_value) AS src,
           doc_id AS dst
    FROM bandv
  ) WHERE src <> dst
)"""


def _ngram_jaccard_core() -> str:
    """jac CTE: exact shingle-set Jaccard for every candidate pair."""
    return f"""
{_doc_shingle_ctes()},
{_minhash_cand_ctes()},
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT c.src, c.dst, count(*) AS ninter
  FROM cand c
  JOIN dsh a ON a.doc_id = c.src
  JOIN dsh b2 ON b2.doc_id = c.dst AND b2.sh = a.sh
  GROUP BY c.src, c.dst
),
jac AS (
  SELECT c.src, c.dst,
         CAST(COALESCE(i.ninter, 0) AS DOUBLE)
           / (sa.n + sb.n - COALESCE(i.ninter, 0)) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.src = c.src AND i.dst = c.dst
  JOIN sizes sa ON sa.doc_id = c.src
  JOIN sizes sb ON sb.doc_id = c.dst
)"""


def _ngram_jaccard_sql() -> str:
    return f"WITH {_ngram_jaccard_core()}\nSELECT src, dst, ROUND(jaccard, 6) AS jaccard FROM jac"


def _ngram_containment_sql() -> str:
    """Asymmetric containment per candidate pair: ninter/|A| and
    ninter/|B| — same shingle/candidate CTEs as the jaccard oracle, one
    exact integer division per direction."""
    return f"""
WITH {_doc_shingle_ctes()},
{_minhash_cand_ctes()},
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT c.src, c.dst, count(*) AS ninter
  FROM cand c
  JOIN dsh a ON a.doc_id = c.src
  JOIN dsh b2 ON b2.doc_id = c.dst AND b2.sh = a.sh
  GROUP BY c.src, c.dst
)
SELECT c.src, c.dst,
       ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE) / sa.n, 6)
         AS containment_src,
       ROUND(CAST(COALESCE(i.ninter, 0) AS DOUBLE) / sb.n, 6)
         AS containment_dst
FROM cand c
LEFT JOIN inter i ON i.src = c.src AND i.dst = c.dst
JOIN sizes sa ON sa.doc_id = c.src
JOIN sizes sb ON sb.doc_id = c.dst
"""


def _minhash_groups_core(threshold: float = 0.8) -> str:
    """Shared CTE chain: verified pairs (unrounded jaccard >= threshold)
    -> connected components (recursive CTE) -> mh_groups(doc_id,
    dup_group = min member id)."""
    return f"""{_ngram_jaccard_core()},
ver AS (SELECT src, dst FROM jac WHERE jaccard >= {threshold}),
sym AS (SELECT src AS s, dst AS d FROM ver UNION SELECT dst, src FROM ver),
reach(vx, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN sym e ON e.s = r.vx
),
mh_groups AS (
  SELECT vx AS doc_id, MIN(lbl) AS dup_group FROM reach GROUP BY vx
)"""


def _minhash_dedup_sql(threshold: float = 0.8) -> str:
    """Full near-dup pipeline in SQL: the shared group core, projected."""
    return f"""
WITH RECURSIVE {_minhash_groups_core(threshold)}
SELECT doc_id, dup_group FROM mh_groups"""


def _simhash_ctes() -> str:
    """dsh/shb/simh CTEs: the 64-bit simhash per document (bit b of each
    shingle votes +/-1; bit set iff score >= 0; top bit masked off)."""
    return f"""{_doc_shingle_ctes()},
shb AS (
  SELECT doc_id, b.b AS bit_pos,
    SUM(2 * (CASE WHEN b.b < 32
             THEN (CAST(sh % 4294967296 AS BIGINT) >> b.b)
             ELSE (CAST(sh // 4294967296 AS BIGINT) >> (b.b - 32)) END & 1) - 1)
      AS score
  FROM dsh CROSS JOIN generate_series(0, 63) b(b)
  GROUP BY doc_id, b.b
),
simh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN score >= 0 AND bit_pos < 63
                  THEN (1::BIGINT << CAST(bit_pos AS INT)) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM shb GROUP BY doc_id
)"""


def _simhash_dedup_sql() -> str:
    """Groups = equal simhash, group id = min doc_id."""
    return f"""
WITH {_simhash_ctes()}
SELECT doc_id, simhash, MIN(doc_id) OVER (PARTITION BY simhash) AS dup_group
FROM simh"""


def _simhash_near_dup_sql(max_hamming: int = 16, bands: int = 4) -> str:
    """Banded simhash candidates (pigeonhole on equal bit-bands) verified
    by bit_count(xor) <= max_hamming — mirrors dedup.simhash_near_dup."""
    width = 64 // bands
    return f"""
WITH {_simhash_ctes()},
bnd AS (
  SELECT doc_id, simhash, g.k AS band,
         (simhash >> CAST(g.k * {width} AS INT)) & {(1 << width) - 1} AS bv
  FROM simh, generate_series(0, {bands - 1}) g(k)
),
cand AS (
  SELECT DISTINCT a.doc_id AS src, b2.doc_id AS dst,
         a.simhash AS ha, b2.simhash AS hb
  FROM bnd a
  JOIN bnd b2 ON b2.band = a.band AND b2.bv = a.bv AND a.doc_id < b2.doc_id
)
SELECT src, dst, bit_count(xor(ha, hb)) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""


NMH_ITERS = 2
NMH_K = 16


def _neighborhood_sketch_sql(iters: int = NMH_ITERS, k: int = NMH_K, seed: int = 23) -> str:
    """ANF sketch unrolled: per (vertex, perm) min-hash over the <= t-hop
    in-reachable set, iterated as t chained CTEs; the permutation constants
    are the same seeded draw the engine makes (uint64-wraparound modmul in
    HUGEINT)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**61 - 1, size=k, dtype=np.uint64)
    b = rng.integers(0, 2**61 - 1, size=k, dtype=np.uint64)
    pj = ",".join(f"({j},{a[j]}::HUGEINT,{b[j]}::HUGEINT)" for j in range(k))
    ctes = [
        f"e AS ({_SQL_EDGES_CO})",
        "v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        f"pj(j, a, b) AS (VALUES {pj})",
        f"s0 AS (SELECT vertex, j, CAST(((vertex::HUGEINT * a) % {_POW64} + b)"
        f" % {_POW64} % 2305843009213693951::HUGEINT AS BIGINT) AS m"
        f" FROM v CROSS JOIN pj)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"s{t} AS (SELECT vertex, j, MIN(m) AS m FROM ("
            f" SELECT vertex, j, m FROM s{t - 1}"
            f" UNION ALL SELECT e.dst, s.j, s.m FROM e"
            f" JOIN s{t - 1} s ON s.vertex = e.src"
            f") GROUP BY vertex, j)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, ROUND({float(k)} / SUM(m / 2305843009213693951.0)"
        f" - 1.0, 6) AS nf_est FROM s{iters} GROUP BY vertex"
    )


# ---- fixture-based oracles (reference 12-edge smoke data as VALUES) ------


def _fixture_shing_ctes(c: int = SHINGLE_C) -> str:
    """F1 shingle chain over the reference's 12-edge fixture: per (gid,
    src, src_type) traversal string in seq order, chunked by C, counted —
    the `shing` CTE the sketch machinery consumes."""
    from sbustreamspot_core_ray.sources.edges import STREAMSPOT_FIXTURE

    vals = ",".join(
        f"({r[0]},'{r[1]}','{r[3]}','{r[4]}',{r[5]},{i})"
        for i, r in enumerate(STREAMSPOT_FIXTURE)
    )
    return f"""
fx(src, st, dt, et, gid, seq) AS (VALUES {vals}),
strs AS (
  SELECT gid, ' ' || st || string_agg(et || dt, '' ORDER BY seq) AS s
  FROM fx GROUP BY gid, src, st
),
chunks AS (
  SELECT gid, substring(s, CAST(i AS INT), {c}) AS shingle
  FROM strs, generate_series(1, 512, {c}) g(i) WHERE g.i <= length(s)
),
shing AS (SELECT gid, shingle, count(*) AS cnt FROM chunks GROUP BY gid, shingle)"""


def _incremental_sketches_sql() -> str:
    """The incremental chunk-delta path must equal the batch recompute (the
    reference's own invariant, graph.cpp:346-363) — so its oracle IS the
    batch sketch of the fixture, recomputed in SQL."""
    return (
        f"WITH {_fixture_shing_ctes()}, {_sketch_bits_ctes(23)}, {_SQL_SKETCH_HEX}\n"
        "SELECT gid, sketch_hex FROM hx"
    )


def _sketch_bits_ctes_suffixed(seed: int, suffix: str, c: int = SHINGLE_C) -> str:
    """The hh/sg/proj/bits CTE chain with every CTE name suffixed, so two
    independent hash families (StreamHash seed 23, SimHash seed 101) can
    coexist in one query."""
    import re

    sql = _sketch_bits_ctes(seed, c)
    for name in ("hh", "sg", "proj", "bits"):
        sql = re.sub(rf"\b{name}\b", f"{name}{suffix}", sql)
    return sql


def _similarity_report_sql() -> str:
    """H10 all-pairs report over the fixture, the reference's FULL column
    set (`main.cpp:584-605`): exact sparse-vector cosine (integer dot/norms
    — exact in double on both sides), angular similarity 1-acos(cos)/pi,
    bit-agreement + cos(pi*(1-sim)) estimate for BOTH sketch families
    (StreamHash seed 23, exact SimHash seed 101), and the StreamHash
    estimate's error vs angular — every double expression in the same op
    order as the numpy implementation."""
    return f"""
WITH {_fixture_shing_ctes()}, {_sketch_bits_ctes(23)},
{_sketch_bits_ctes_suffixed(101, "2")},
gids AS (SELECT DISTINCT gid FROM shing),
pr AS (SELECT a.gid AS ga, b.gid AS gb FROM gids a JOIN gids b ON a.gid < b.gid),
dotp AS (
  SELECT p.ga, p.gb, SUM(a.cnt * b.cnt) AS dp
  FROM pr p
  JOIN shing a ON a.gid = p.ga
  JOIN shing b ON b.gid = p.gb AND b.shingle = a.shingle
  GROUP BY p.ga, p.gb
),
nrm AS (SELECT gid, sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nn FROM shing GROUP BY gid),
neq AS (
  SELECT a.gid AS ga, b.gid AS gb,
         SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS ne
  FROM bits a JOIN bits b ON b.i = a.i AND a.gid < b.gid
  GROUP BY a.gid, b.gid
),
neq2 AS (
  SELECT a.gid AS ga, b.gid AS gb,
         SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS ne
  FROM bits2 a JOIN bits2 b ON b.i = a.i AND a.gid < b.gid
  GROUP BY a.gid, b.gid
),
raw AS (
  SELECT p.ga, p.gb,
         CAST(COALESCE(d.dp, 0) AS DOUBLE) / (na.nn * nb.nn) AS cos_raw,
         1.0 - n.ne / 1000.0 AS ssim,
         1.0 - n2.ne / 1000.0 AS hsim
  FROM pr p
  LEFT JOIN dotp d ON d.ga = p.ga AND d.gb = p.gb
  JOIN nrm na ON na.gid = p.ga
  JOIN nrm nb ON nb.gid = p.gb
  JOIN neq n ON n.ga = p.ga AND n.gb = p.gb
  JOIN neq2 n2 ON n2.ga = p.ga AND n2.gb = p.gb
)
SELECT ga AS gid_a, gb AS gid_b,
       ROUND(cos_raw, 6) AS cosine,
       ROUND(1.0 - acos(LEAST(cos_raw, 1.0)) / pi(), 6) AS angular,
       ROUND(ssim, 6) AS streamhash_sim,
       ROUND(cos(pi() * (1.0 - ssim)), 6) AS streamhash_est,
       ROUND(ssim - (1.0 - acos(LEAST(cos_raw, 1.0)) / pi()), 6) AS streamhash_err,
       ROUND(hsim, 6) AS simhash_sim,
       ROUND(cos(pi() * (1.0 - hsim)), 6) AS simhash_est
FROM raw"""


def _anomaly_scenarios_sql(shingle_ctes: str | None = None) -> str:
    """The CLI's per-scenario anomaly evaluation (main.cpp:531-557 +
    test_anomalies): seed-101 SimHash LSH isolation with the index built
    from the NORMAL gids (lower half of 53 graphs -> gids < 26 normal,
    >= 26 attack), aggregated per scenario (gid//100). `shingle_ctes`
    swaps in a perturbed fixture (the injected-scramble witness)."""
    return f"""
WITH {shingle_ctes or _SQL_SHINGLE_CTES}, {_sketch_bits_ctes(101)}, {_SQL_BANDS_CTE},
iso AS (
  SELECT q.gid, (COUNT(ix.band_value) = 0) AS isolated
  FROM bands q
  LEFT JOIN (SELECT DISTINCT band_idx, band_value FROM bands WHERE gid < 26) ix
    USING (band_idx, band_value)
  GROUP BY q.gid
)
SELECT gid // 100 AS scenario,
       COUNT(*) AS n_graphs,
       CAST(SUM(CASE WHEN gid >= 26 THEN 1 ELSE 0 END) AS BIGINT) AS n_attack,
       CAST(SUM(CASE WHEN isolated THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN isolated AND gid >= 26 THEN 1 ELSE 0 END) AS BIGINT)
         AS true_pos,
       ROUND(CASE WHEN SUM(CASE WHEN isolated THEN 1 ELSE 0 END) = 0 THEN -1.0
             ELSE CAST(SUM(CASE WHEN isolated AND gid >= 26 THEN 1 ELSE 0 END)
                       AS DOUBLE)
                  / SUM(CASE WHEN isolated THEN 1 ELSE 0 END) END, 6)
         AS precision,
       ROUND(CASE WHEN SUM(CASE WHEN gid >= 26 THEN 1 ELSE 0 END) = 0 THEN -1.0
             ELSE CAST(SUM(CASE WHEN isolated AND gid >= 26 THEN 1 ELSE 0 END)
                       AS DOUBLE)
                  / SUM(CASE WHEN gid >= 26 THEN 1 ELSE 0 END) END, 6)
         AS recall
FROM iso GROUP BY gid // 100"""


def _corpus_pipeline_sql() -> str:
    """Independent SQL extraction over the SAME deterministic corpus files
    the query ingests: contains = one edge per corpus row; imports = each
    '^import <target>$' line whose target is not the row itself. The corpus
    is (re)generated here so the oracle is order-independent (generation is
    seeded, shard-atomic and skips existing files)."""
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return r"""
WITH c AS (
  SELECT repo, path, content
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')
),
imp AS (
  SELECT repo || '/' || path AS fullpath,
         unnest(regexp_extract_all(content, '(?m)^import\s+(\S+)$', 1)) AS tgt
  FROM c
)
SELECT CAST(0 AS BIGINT) AS e_type, count(*) AS n_edges FROM c
UNION ALL
SELECT 1, count(*) FROM imp WHERE tgt <> fullpath
"""


def _streamspot_snapshots_sql() -> str:
    """The full bootstrap + windowed scoring pipeline on the fixture,
    recomputed in SQL. Window structure of THIS fixture (interval=4, test
    gids {2,3}; lo = min test seq = 5): window 0 touches only gid 2 (its
    edges all fall in seqs 5-8), window 1 only gid 3 (seqs 9-11), and both
    graphs' cumulative sketches equal their full-fixture sketches — so the
    two C6 mini-batch rounds unroll to two assignment/centroid-update
    stages. Every arithmetic step (hashmulti, integer centroid sums,
    1-cos(pi*(1-sim)) distances, min(global, cluster) thresholds, argmin
    tie-break, post-move score refresh) mirrors pipelines/streamspot.py
    exactly; the bootstrap constants ({0},{1}, thr 0.5/0.5, global 0.6)
    are the reference's own fixture."""
    C = 10  # q_streamspot_snapshots runs with chunk_length=10
    dist = "1.0 - cos(pi() * (1.0 - (1.0 - ({ne}) / 1000.0)))"
    return f"""
WITH {_fixture_shing_ctes(C)}, {_sketch_bits_ctes(23, C)},
thr(k, t) AS (VALUES (0, 0.5), (1, 0.5)),
-- bootstrap: singleton clusters -> integer sums = member projections
csum0 AS (SELECT gid AS k, i, p AS s FROM proj WHERE gid IN (0, 1)),
cbits0 AS (SELECT k, i, CASE WHEN s / 1.0 >= 0 THEN 1 ELSE 0 END AS bit FROM csum0),
boot AS (
  SELECT b.gid, {dist.format(ne="SUM(CASE WHEN b.bit <> c.bit THEN 1 ELSE 0 END)")} AS score
  FROM bits b JOIN cbits0 c ON c.i = b.i AND c.k = b.gid
  WHERE b.gid IN (0, 1) GROUP BY b.gid
),
-- window 0: gid 2 vs bootstrap centroids
d0 AS (
  SELECT c.k, {dist.format(ne="SUM(CASE WHEN b.bit <> c.bit THEN 1 ELSE 0 END)")} AS d
  FROM (SELECT i, bit FROM bits WHERE gid = 2) b
  JOIN cbits0 c ON c.i = b.i GROUP BY c.k
),
a0 AS (
  SELECT k AS nearest, d,
         CASE WHEN d > least(0.6, (SELECT t FROM thr WHERE thr.k = q.k))
              THEN -1 ELSE k END AS cl
  FROM (SELECT k, d, row_number() OVER (ORDER BY d, k) AS rn FROM d0) q
  WHERE rn = 1
),
csum1 AS (
  SELECT c.k, c.i,
         c.s + CASE WHEN (SELECT cl FROM a0) = c.k
                    THEN (SELECT p FROM proj WHERE gid = 2 AND proj.i = c.i)
                    ELSE 0 END AS s,
         1 + CASE WHEN (SELECT cl FROM a0) = c.k THEN 1 ELSE 0 END AS n
  FROM csum0 c
),
cbits1 AS (SELECT k, i, CASE WHEN s / CAST(n AS DOUBLE) >= 0 THEN 1 ELSE 0 END AS bit FROM csum1),
sc2 AS (
  SELECT {dist.format(ne="SUM(CASE WHEN b.bit <> c.bit THEN 1 ELSE 0 END)")} AS score
  FROM (SELECT i, bit FROM bits WHERE gid = 2) b
  JOIN cbits1 c ON c.i = b.i AND c.k = (SELECT nearest FROM a0)
),
-- window 1: gid 3 vs the window-0 centroids
d1 AS (
  SELECT c.k, {dist.format(ne="SUM(CASE WHEN b.bit <> c.bit THEN 1 ELSE 0 END)")} AS d
  FROM (SELECT i, bit FROM bits WHERE gid = 3) b
  JOIN cbits1 c ON c.i = b.i GROUP BY c.k
),
a1 AS (
  SELECT k AS nearest, d,
         CASE WHEN d > least(0.6, (SELECT t FROM thr WHERE thr.k = q.k))
              THEN -1 ELSE k END AS cl
  FROM (SELECT k, d, row_number() OVER (ORDER BY d, k) AS rn FROM d1) q
  WHERE rn = 1
),
csum2 AS (
  SELECT c.k, c.i,
         c.s + CASE WHEN (SELECT cl FROM a1) = c.k
                    THEN (SELECT p FROM proj WHERE gid = 3 AND proj.i = c.i)
                    ELSE 0 END AS s,
         c.n + CASE WHEN (SELECT cl FROM a1) = c.k THEN 1 ELSE 0 END AS n
  FROM csum1 c
),
cbits2 AS (SELECT k, i, CASE WHEN s / CAST(n AS DOUBLE) >= 0 THEN 1 ELSE 0 END AS bit FROM csum2),
sc3 AS (
  SELECT {dist.format(ne="SUM(CASE WHEN b.bit <> c.bit THEN 1 ELSE 0 END)")} AS score
  FROM (SELECT i, bit FROM bits WHERE gid = 3) b
  JOIN cbits2 c ON c.i = b.i AND c.k = (SELECT nearest FROM a1)
)
SELECT CAST(iv AS INT) AS interval, gid, ROUND(score, 6) AS anomaly_score,
       CAST(cl AS INT) AS cluster_id
FROM (
  SELECT 0 AS iv, gid, score, gid AS cl FROM boot
  UNION ALL SELECT 0, 2, (SELECT score FROM sc2), (SELECT cl FROM a0)
  UNION ALL SELECT 1, gid, score, gid FROM boot
  UNION ALL SELECT 1, 2, (SELECT score FROM sc2), (SELECT cl FROM a0)
  UNION ALL SELECT 1, 3, (SELECT score FROM sc3), (SELECT cl FROM a1)
)"""


# ---- ANN oracles (constants generated lazily in oracle_sql) --------------

# The driver compares at sf0.01; the local gate (scripts/check_oracles.py)
# overrides this when it runs at another scale so data-derived oracle
# constants (IVF centroids, embedding dims) match the engine's input —
# without the override, knn_ivf/ann_recall diverge at sf0.001 because the
# SQL embeds sf0.01-trained centroids while the engine trains on sf_dir.
_ORACLE_SF = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _sql_list(vec) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


# quantized-embedding SQL fragments (mirror stages/ann.py quantize /
# exact_cosine: integer dots are exact in DOUBLE regardless of summation
# order, then one sqrt/sqrt/mul/div chain — bit-identical to numpy)
_Q_EMB = (
    "list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 65536.0 + 0.5))"
)


def _q_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _knn_cosine_sql() -> str:
    """Exact brute-force top-k oracle (also the ground truth inside
    _ann_recall_sql)."""
    return f"""
WITH qe AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings),
q AS (SELECT vec_id AS qid, q AS qq FROM qe WHERE vec_id < {KNN_NQ}),
sims AS (
  SELECT q.qid AS query_idx, e.vec_id,
         {_q_cos('q.qq', 'e.q')} AS raw
  FROM q, qe e
)
SELECT query_idx, vec_id, ROUND(raw, 6) AS cosine FROM sims
QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY raw DESC, vec_id) <= {KNN_K}
"""


def _ann_recall_sql() -> str:
    """recall@k of each approximate index vs the exact ground truth:
    integer overlap counts per query, one division by the literal k."""
    parts = []
    for method, sql in (("ivf", _knn_ivf_sql()), ("lsh", _knn_lsh_sql())):
        parts.append(f"""
SELECT '{method}' AS method, ex.query_idx,
       CAST(COUNT(iv.vec_id) AS BIGINT) AS n_hits,
       ROUND(CAST(COUNT(iv.vec_id) AS DOUBLE) / {KNN_K}, 6) AS recall
FROM ({_knn_cosine_sql()}) ex
LEFT JOIN ({sql}) iv
  ON iv.query_idx = ex.query_idx AND iv.vec_id = ex.vec_id
GROUP BY ex.query_idx""")
    return "\nUNION ALL\n".join(parts)


def _knn_ivf_sql() -> str:
    """IVF in SQL over quantized integers: centroids embedded as quantized
    constants; assignment = argmax exact dot (tie -> lowest c), probes =
    top n_probe centroids per query, top-k by (raw cosine desc, vec_id)
    among probed buckets; ROUND only on output."""
    from sbustreamspot_core_ray.stages.ann import quantize

    cent = quantize(_ivf_centroids(_ORACLE_SF))
    cvals = ",".join(f"({c}, {_sql_list(v)})" for c, v in enumerate(cent))
    return f"""
WITH qe AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings),
cent(c, v) AS (VALUES {cvals}),
asg AS (
  SELECT vec_id, c AS bucket FROM (
    SELECT e.vec_id, c.c,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.q, c.v) DESC, c.c) AS rn
    FROM qe e CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, q AS qq FROM qe WHERE vec_id < {KNN_NQ}),
probe AS (
  SELECT qid, c AS bucket FROM (
    SELECT q.qid, c.c,
           row_number() OVER (PARTITION BY q.qid
             ORDER BY list_dot_product(q.qq, c.v) DESC, c.c) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= {IVF_NPROBE}
),
sims AS (
  SELECT q.qid AS query_idx, a.vec_id,
         {_q_cos('q.qq', 'e.q')} AS raw
  FROM q JOIN probe p ON p.qid = q.qid
  JOIN asg a ON a.bucket = p.bucket
  JOIN qe e ON e.vec_id = a.vec_id
)
SELECT query_idx, vec_id, ROUND(raw, 6) AS cosine FROM sims
QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY raw DESC, vec_id)
        <= {KNN_K}"""


def _embedding_near_dup_sql() -> str:
    """Sign-bucket near-dup in SQL over quantized integers: hyperplanes
    embedded as quantized constants, so sign bits are exact-integer dot
    signs; within-bucket pair cosines via the exact 4-op expression with
    the threshold tested on the raw value (ROUND only on output)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"])
    d = len(t["embedding"][0])
    from sbustreamspot_core_ray.stages.ann import hyperplanes, quantize

    planes = quantize(hyperplanes(NEARDUP_PLANES, d, seed=23, dtype=np.float64))
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(q, {_sql_list(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH qe AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings),
bk AS (
  SELECT vec_id, q, {bucket_terms} AS bucket FROM qe
)
SELECT a.vec_id AS src, b.vec_id AS dst,
       ROUND({_q_cos('a.q', 'b.q')}, 6) AS cosine
FROM bk a JOIN bk b ON b.bucket = a.bucket AND a.vec_id < b.vec_id
WHERE {_q_cos('a.q', 'b.q')} >= {NEARDUP_THRESH}"""


# ---- multimodal fake-codec oracles ---------------------------------------
# The sandbox media codecs are deterministic byte functions of the ASCII
# payload (stages/multimodal.py: _decode_image tiles bytes into (h,w,c);
# _decode_audio maps bytes to (b-128)/128; VideoFrameSample slices byte
# chunks), so each feature is recomputable in SQL over ascii(substring(..)).

# media rows with doc_id % REAL_MEDIA_MOD == 0 carry REAL containers (a
# spec-valid PNG / PCM16 WAV) whose decoded content is the closed-form
# spec in stages/multimodal.real_image_pixels / real_audio_samples — the
# oracle recomputes those decoded values directly, so the gate verifies the
# REAL codec path end-to-end without a SQL-side codec.
REAL_MEDIA_MOD = 10
_RIMG = 16  # multimodal.REAL_IMG_DIM
_RAUD = 1024  # multimodal.REAL_AUDIO_N

_SQL_MEDIA_FEATURES = f"""
WITH img AS (
  SELECT doc_id, text, length(text) AS n,
         CASE WHEN doc_id % {REAL_MEDIA_MOD} = 0 THEN {_RIMG}
              ELSE greatest(CAST(floor(sqrt(length(text))) AS BIGINT), 1)
         END AS w,
         (doc_id % {REAL_MEDIA_MOD} = 0) AS is_real
  FROM documents WHERE doc_id % 3 = 0
),
dims AS (
  SELECT doc_id, text, n, w, is_real,
         CASE WHEN is_real THEN {_RIMG} * {_RIMG} * 3
              ELSE greatest(n // w, 1) * w * 3 END AS need
  FROM img
),
px AS (
  SELECT doc_id, n, w, need, g.i AS i,
         CASE WHEN is_real THEN (doc_id * 7 + g.i * 31) % 256
              ELSE ascii(substring(text, CAST((g.i % n) + 1 AS INT), 1))
         END AS b
  FROM dims, generate_series(0, 8191) g(i) WHERE g.i < need
),
m AS (SELECT doc_id, AVG(CAST(b AS DOUBLE)) AS mean FROM px GROUP BY doc_id),
sd AS (
  SELECT p.doc_id, sqrt(AVG((p.b - m.mean) * (p.b - m.mean))) AS sdev
  FROM px p JOIN m ON m.doc_id = p.doc_id GROUP BY p.doc_id
),
ed AS (
  SELECT a.doc_id, AVG(CAST(abs(b2.b - a.b) AS DOUBLE)) AS ee
  FROM px a JOIN px b2 ON b2.doc_id = a.doc_id AND b2.i = a.i + 3
  WHERE (a.i // 3) % a.w <> a.w - 1
  GROUP BY a.doc_id
)
SELECT m.doc_id AS media_id, ROUND(m.mean, 6) AS px_mean,
       ROUND(sd.sdev, 6) AS px_std, ROUND(ed.ee, 6) AS edge_energy
FROM m JOIN sd ON sd.doc_id = m.doc_id JOIN ed ON ed.doc_id = m.doc_id
"""

_SQL_AUDIO_FRAMES = f"""
WITH aud AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % {REAL_MEDIA_MOD} = 0 THEN {_RAUD}
              ELSE length(text) END AS n,
         (doc_id % {REAL_MEDIA_MOD} = 0) AS is_real
  FROM documents WHERE doc_id % 3 = 1
),
starts AS (
  SELECT doc_id, text, n, is_real, g.s AS fstart, g.s // 2048 AS frame_idx
  FROM aud, generate_series(0, 65536, 2048) g(s)
  WHERE (g.s <= n - 512 AND g.s // 2048 < 16) OR (n < 512 AND g.s = 0)
),
vals AS (
  -- frame indexes are CLIPPED to the last sample (numpy np.clip semantics
  -- in AudioFrames), so short payloads repeat their final byte, not zeros;
  -- real-WAV rows recompute the decoded dyadic sample values closed-form
  SELECT s.doc_id, s.frame_idx,
         SUM((CASE WHEN s.is_real
              THEN ((s.doc_id * 11 + least(s.fstart + g.j, s.n - 1) * 17) % 256
                    - 128.0) / 128.0
              ELSE (ascii(substring(s.text, CAST(least(s.fstart + g.j, s.n - 1) + 1 AS INT), 1))
               - 128.0) / 128.0 END)
             * (CASE WHEN s.is_real
              THEN ((s.doc_id * 11 + least(s.fstart + g.j, s.n - 1) * 17) % 256
                    - 128.0) / 128.0
              ELSE (ascii(substring(s.text, CAST(least(s.fstart + g.j, s.n - 1) + 1 AS INT), 1))
               - 128.0) / 128.0 END)) AS ss
  FROM starts s, generate_series(0, 511) g(j)
  GROUP BY s.doc_id, s.frame_idx
)
SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
       ROUND(sqrt(ss / 512.0), 6) AS rms
FROM vals
"""

_SQL_VIDEO_FRAMES = """
WITH vid AS (
  SELECT doc_id, length(text) AS n, greatest(length(text) // 256, 1) AS nf
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id AS media_id, CAST(g.f AS INT) AS frame_no,
       least(256, 2 * n - ((g.f * 256) % n)) AS frame_bytes
FROM vid, generate_series(0, 65536, 4) g(f)
WHERE g.f < nf AND g.f // 4 < 8
"""


def _pagerank_ctes(edges_sql: str, pfx: str = "") -> list:
    """Power iteration unrolled to PR_ITERS chained CTEs (same semantics as
    pipelines/superstep.pagerank: teleport + uniform dangling mass); `pfx`
    namespaces the CTEs so two runs compose in one statement (drift)."""
    d = PR_DAMPING
    # MATERIALIZED: each CTE is computed once — the naive inlining rescans
    # the parquet views per reference and exhausts file descriptors
    x = pfx
    ctes = [
        f"{x}e AS MATERIALIZED ({edges_sql})",
        f"{x}v AS MATERIALIZED (SELECT src AS vertex FROM {x}e UNION SELECT dst FROM {x}e)",
        f"{x}n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) nv FROM {x}v)",
        f"{x}deg AS MATERIALIZED (SELECT src AS vertex, CAST(count(*) AS DOUBLE) d FROM {x}e GROUP BY src)",
        f"{x}r0 AS MATERIALIZED (SELECT vertex, 1.0/(SELECT nv FROM {x}n) AS rank FROM {x}v)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        ctes.append(
            f"{x}dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM {x}r{p} r"
            f" LEFT JOIN {x}deg ON {x}deg.vertex = r.vertex WHERE {x}deg.vertex IS NULL)"
        )
        ctes.append(
            f"{x}c{k} AS MATERIALIZED (SELECT e.dst AS vertex, SUM(r.rank / deg.d) AS contrib"
            f" FROM {x}e e JOIN {x}r{p} r ON r.vertex = e.src"
            f" JOIN {x}deg deg ON deg.vertex = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"{x}r{k} AS MATERIALIZED (SELECT v.vertex, (1.0 - {d})/(SELECT nv FROM {x}n)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM {x}dang{k})/(SELECT nv FROM {x}n)) AS rank"
            f" FROM {x}v v LEFT JOIN {x}c{k} c ON c.vertex = v.vertex)"
        )
    return ctes


def _pagerank_sql() -> str:
    return (
        "WITH " + ",\n".join(_pagerank_ctes(_SQL_EDGES))
        + f"\nSELECT vertex, ROUND(rank, 7) AS rank FROM r{PR_ITERS}"
    )


def _lp_ctes(e0_sql: str | None = None) -> list:
    ctes = [
        f"e0 AS ({e0_sql or _SQL_EDGES_CO})",
        "e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0)",
        "v AS (SELECT s AS vertex FROM e UNION SELECT d FROM e)",
        "l0 AS (SELECT vertex, vertex AS label FROM v)",
    ]
    for k in range(1, LP_ITERS + 1):
        p = k - 1
        ctes.append(
            f"m{k} AS (SELECT vertex, lbl FROM ("
            f" SELECT e.d AS vertex, r.label AS lbl,"
            f" row_number() OVER (PARTITION BY e.d ORDER BY count(*) DESC, r.label ASC) rn"
            f" FROM e JOIN l{p} r ON r.vertex = e.s GROUP BY e.d, r.label"
            f") WHERE rn = 1)"
        )
        ctes.append(
            f"l{k} AS (SELECT v.vertex, COALESCE(m.lbl, r.label) AS label"
            f" FROM v JOIN l{p} r ON r.vertex = v.vertex"
            f" LEFT JOIN m{k} m ON m.vertex = v.vertex)"
        )
    return ctes


def _lp_sql() -> str:
    return (
        "WITH " + ",\n".join(_lp_ctes())
        + f"\nSELECT vertex, label FROM l{LP_ITERS}"
    )


def _modularity_sql() -> str:
    """Modularity of the LPA labels as the same exact-integer witness the
    Ray side computes: q_num = sum_c (4*m*m_c - d_c^2) over the distinct
    undirected self-loop-free edge set; one final division, mirrored."""
    ctes = _lp_ctes() + [
        "und AS (SELECT s, d FROM e WHERE s < d)",
        "mm AS (SELECT COUNT(*) AS m FROM und)",
        f"lab AS (SELECT vertex, label FROM l{LP_ITERS})",
        "intra AS (SELECT la.label AS label, COUNT(*) AS m_in"
        " FROM und JOIN lab la ON la.vertex = und.s"
        " JOIN lab lb ON lb.vertex = und.d"
        " WHERE la.label = lb.label GROUP BY la.label)",
        "deg AS (SELECT s AS vertex, COUNT(*) AS deg FROM e WHERE s <> d"
        " GROUP BY s)",
        "dsum AS (SELECT label, SUM(deg) AS d_sum FROM deg"
        " JOIN lab ON lab.vertex = deg.vertex GROUP BY label)",
        "terms AS (SELECT ds.label, COALESCE(i.m_in, 0) AS m_in, ds.d_sum"
        " FROM dsum ds LEFT JOIN intra i ON i.label = ds.label)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT (SELECT m FROM mm) AS m_edges,
       COUNT(*) AS n_communities,
       CAST(SUM(4 * (SELECT m FROM mm) * m_in - d_sum * d_sum) AS BIGINT)
         AS q_num,
       ROUND(CAST(SUM(4 * (SELECT m FROM mm) * m_in - d_sum * d_sum) AS DOUBLE)
             / (4.0 * (SELECT m FROM mm) * (SELECT m FROM mm)), 6) AS modularity
FROM terms
"""
    )


def _lang_id_sql() -> str:
    """Generated from the SAME marker table the Ray stage uses; each marker
    counted independently on the padded string (cascading replaces would
    interact when a removal glues two markers together)."""
    from sbustreamspot_core_ray.stages.text import _LANG_MARKERS

    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        terms = [
            f"(length(t) - length(replace(t, '{m}', ''))) / {len(m)}"
            for m in markers
        ]
        score_cols.append(" + ".join(terms) + f" AS {lang}")
    langs = list(_LANG_MARKERS)  # tie-break: first-of-max in this order
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"{lang} >= {o}" for o in langs[i + 1:])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case = (
        "CASE WHEN greatest(" + ", ".join(langs) + ") = 0 THEN 'unk' "
        + " ".join(cases)
        + f" ELSE '{langs[-1]}' END"
    )
    return f"""
WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
s AS (SELECT doc_id, {', '.join(score_cols)} FROM p)
SELECT doc_id, {case} AS lang_pred FROM s
"""


# --------------------------------------------------------------------------
# query implementations (Ray side)
# --------------------------------------------------------------------------


def q_edge_table(sf_dir: str):
    return _edges_full(sf_dir)


def q_degrees(sf_dir: str):
    """Distinct-destination out-degree per source: batch-local (src, dst)
    pair dedup as the combiner, then ONE hash(src) shuffle whose
    co-location makes the per-partition dedup + run-count globally exact
    — replaces the distinct shuffle + native sort-based groupby pair."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    def local(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        keep = np.ones(len(s), bool)
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s, d = s[keep], d[keep]
        return pa.table(
            {"src": s, "dst": d, "__p": pa.array(part_of(s, P), pa.int32())}
        )

    def fold(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        keep = np.ones(len(s), bool)
        keep[1:] = (s[1:] != s[:-1]) | (d[1:] != d[:-1])
        s = s[keep]
        first = np.ones(len(s), bool)
        first[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(s)))
        return pa.table(
            {
                "src": pa.array(s[starts], pa.int64()),
                "outdeg": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        _edges_full(sf_dir, dedup=False)
        .map_batches(local, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pyarrow")
    )


def q_pagerank(sf_dir: str):
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, pagerank

    # dedup=False: the CSR shards dedup locally, so the pre-shuffle is skipped
    g = ShardedGraph.build(_edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False)
    df = pagerank(g, damping=PR_DAMPING, max_iters=PR_ITERS, tol=0.0).to_pandas()
    df["rank"] = round_half_away(df["rank"], 7)
    return df


_SQL_EDGES_RAW = """
  SELECT o_custkey AS src, 10000000 + o_orderkey AS dst FROM orders
  UNION ALL
  SELECT 10000000 + l_orderkey, 20000000 + l_partkey FROM lineitem
  UNION ALL
  SELECT 20000000 + l_partkey, 30000000 + l_suppkey FROM lineitem
"""


def q_weighted_pagerank(sf_dir: str):
    """Weighted PageRank: edge weight = the (src, dst) pair's multiplicity
    in the RAW (un-deduped) derived edge stream — e.g. an order->part edge
    weighs one per lineitem carrying that part. The scatter ships
    rank*w/W instead of rank/outdeg; the weight never crosses the wire
    (multiplicity is counted inside each shard's finalize)."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, pagerank

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False,
        weighted=True,
    )
    df = pagerank(g, damping=PR_DAMPING, max_iters=PR_ITERS, tol=0.0).to_pandas()
    df["rank"] = round_half_away(df["rank"], 7)
    return df


def _weighted_pagerank_sql(we_sql: str | None = None) -> str:
    """The pagerank chain over multiplicity weights: contribution
    rank * w / W (left-associated IEEE, mirrored by the engine's
    (rank*w)/W per-edge expression). `we_sql` overrides the weighted-edge
    CTE body (src, dst, w) — the host-contracted variant passes its own."""
    d = PR_DAMPING
    ctes = [
        f"we AS MATERIALIZED ({we_sql})"
        if we_sql
        else "we AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w"
        f" FROM ({_SQL_EDGES_RAW}) GROUP BY src, dst)",
        "v AS MATERIALIZED (SELECT src AS vertex FROM we UNION SELECT dst FROM we)",
        "n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) nv FROM v)",
        "wout AS MATERIALIZED (SELECT src AS vertex, SUM(w) AS tw"
        " FROM we GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT vertex, 1.0/(SELECT nv FROM n) AS rank FROM v)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        ctes.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM r{p} r"
            f" LEFT JOIN wout ON wout.vertex = r.vertex WHERE wout.vertex IS NULL)"
        )
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT we.dst AS vertex,"
            f" SUM(r.rank * we.w / wout.tw) AS contrib"
            f" FROM we JOIN r{p} r ON r.vertex = we.src"
            f" JOIN wout ON wout.vertex = we.src GROUP BY we.dst)"
        )
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT v.vertex, (1.0 - {d})/(SELECT nv FROM n)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM dang{k})/(SELECT nv FROM n)) AS rank"
            f" FROM v LEFT JOIN c{k} c ON c.vertex = v.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, ROUND(rank, 7) AS rank FROM r{PR_ITERS}"
    )


def q_ols_regression(sf_dir: str):
    """Distributed simple OLS per l_returnflag: regress whole-dollar
    extended price on quantity. One streaming pass accumulates exact
    integer moment sums per group (batch partials, Python-int driver
    fold), then the closed-form slope/intercept/r2 divide once —
    mirrored by HUGEINT sums in SQL."""
    from sbustreamspot_core_ray.stages.stats import grouped_moment_sums, ols_table

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def extract(t: pa.Table):
        g = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        return g, x, y

    return ols_table(grouped_moment_sums(li, extract), group_col="grp")


def _ols_sql() -> str:
    return """
WITH m AS (
  SELECT l_returnflag AS grp,
         CAST(count(*) AS HUGEINT) AS n,
         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)) AS sx,
         SUM(CAST(floor(l_extendedprice + 0.5) AS HUGEINT)) AS sy,
         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)
             * CAST(floor(l_quantity + 0.5) AS HUGEINT)) AS sxx,
         SUM(CAST(floor(l_quantity + 0.5) AS HUGEINT)
             * CAST(floor(l_extendedprice + 0.5) AS HUGEINT)) AS sxy,
         SUM(CAST(floor(l_extendedprice + 0.5) AS HUGEINT)
             * CAST(floor(l_extendedprice + 0.5) AS HUGEINT)) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT grp, CAST(n AS BIGINT) AS n,
  CASE WHEN n*sxx - sx*sx <> 0
       THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE), 6) ELSE 0.0 END AS slope,
  CASE WHEN n*sxx - sx*sx <> 0
       THEN ROUND(CAST(sy*sxx - sx*sxy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE), 6) ELSE 0.0 END AS intercept,
  CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
       THEN ROUND(CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE)
                  / CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE), 6)
       ELSE 0.0 END AS r2
FROM m"""


def q_pearson_corr(sf_dir: str):
    """Pairwise Pearson correlations over three integer-quantized
    lineitem features (quantity, whole-dollar price, discount basis
    points) in ONE streaming pass: the pair name is the moment group, so
    all three correlations fold from the same batch partials."""
    from sbustreamspot_core_ray.stages.stats import (
        grouped_moment_sums,
        pearson_table,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )

    def extract(t: pa.Table):
        q = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        pr = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        dc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 10000.0 + 0.5
        ).astype(np.int64)
        n = len(q)
        g = np.concatenate(
            [
                np.full(n, "qty_price"),
                np.full(n, "qty_disc"),
                np.full(n, "price_disc"),
            ]
        )
        return g, np.concatenate([q, q, pr]), np.concatenate([pr, dc, dc])

    return pearson_table(grouped_moment_sums(li, extract), group_col="pair")


def _pearson_sql() -> str:
    def leg(name: str, xe: str, ye: str) -> str:
        return f"""
  SELECT '{name}' AS pair, CAST(count(*) AS HUGEINT) AS n,
         SUM({xe}) AS sx, SUM({ye}) AS sy,
         SUM({xe} * {xe}) AS sxx, SUM({xe} * {ye}) AS sxy,
         SUM({ye} * {ye}) AS syy
  FROM lineitem"""

    q = "CAST(floor(l_quantity + 0.5) AS HUGEINT)"
    pr = "CAST(floor(l_extendedprice + 0.5) AS HUGEINT)"
    dc = "CAST(floor(l_discount * 10000.0 + 0.5) AS HUGEINT)"
    return f"""
WITH m AS ({leg('qty_price', q, pr)} UNION ALL {leg('qty_disc', q, dc)}
  UNION ALL {leg('price_disc', pr, dc)})
SELECT pair, CAST(n AS BIGINT) AS n,
  CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0
       THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                  / sqrt(CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE)), 6)
       ELSE 0.0 END AS r
FROM m"""


def q_token_fertility(sf_dir: str):
    """Tokenizer fertility per language: whitespace tokens per character
    (the multilingual-pipeline health metric — a language whose fertility
    collapses is being mis-segmented). One combiner pass: per-batch
    (lang, docs, tokens, chars) partials, driver fold, one mirrored
    ROUND divide."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text", "n_chars"]
    )

    def partials(df):
        import pandas as pd

        stripped = df["text"].fillna("").str.replace(
            r"^\s+|\s+$", "", regex=True
        )
        toks = np.where(
            stripped == "", 0, stripped.str.split(r"\s+").str.len()
        ).astype(np.int64)
        g = pd.DataFrame(
            {"lang": df["lang"], "t": toks, "c": df["n_chars"]}
        ).groupby("lang", sort=False)
        out = g.agg(docs=("t", "size"), tokens=("t", "sum"), chars=("c", "sum"))
        return out.reset_index()

    acc: dict[str, list[int]] = {}
    for b in docs.map_batches(partials, batch_format="pandas").iter_batches(
        batch_format="pyarrow"
    ):
        for lang, d_, t_, c_ in zip(
            b["lang"].to_pylist(),
            b["docs"].to_pylist(),
            b["tokens"].to_pylist(),
            b["chars"].to_pylist(),
        ):
            cur = acc.setdefault(lang, [0, 0, 0])
            cur[0] += int(d_)
            cur[1] += int(t_)
            cur[2] += int(c_)
    langs = sorted(acc)
    fert = np.array(
        [acc[l][1] / acc[l][2] if acc[l][2] else 0.0 for l in langs]
    )
    return pa.table(
        {
            "lang": pa.array(langs),
            "n_docs": pa.array([acc[l][0] for l in langs], pa.int64()),
            "tokens": pa.array([acc[l][1] for l in langs], pa.int64()),
            "chars": pa.array([acc[l][2] for l in langs], pa.int64()),
            "fertility": pa.array(round_half_away(fert, 6), pa.float64()),
        }
    )


def _token_fertility_sql() -> str:
    return r"""
WITH t AS (
  SELECT lang, n_chars,
    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
         ELSE len(regexp_split_to_array(
                regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
    END AS ws
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS tokens,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CASE WHEN SUM(n_chars) > 0
            THEN ROUND(CAST(SUM(ws) AS DOUBLE) / SUM(n_chars), 6)
            ELSE 0.0 END AS fertility
FROM t GROUP BY lang"""


def q_lang_source_mi(sf_dir: str):
    """Mutual information between document language and source in
    integer nanonats per observed (lang, source) cell: term_e9 =
    floor(1e9 * c_ls * ln(N*c_ls / (c_l*c_s)) / N) — the libm-parity
    chain (exact-integer doubles, one divide, one ln), so the corpus MI
    is the order-independent integer sum of the cells. Pure combiner
    pass over a tiny grid."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )

    acc: dict[tuple[str, str], int] = {}
    for b in docs.map_batches(
        lambda df: df.groupby(["lang", "source"], sort=False)
        .size()
        .rename("n")
        .reset_index(),
        batch_format="pandas",
    ).iter_batches(batch_format="pyarrow"):
        for l_, s_, n_ in zip(
            b["lang"].to_pylist(), b["source"].to_pylist(), b["n"].to_pylist()
        ):
            acc[(l_, s_)] = acc.get((l_, s_), 0) + int(n_)
    n_tot = sum(acc.values())
    cl: dict[str, int] = {}
    cs: dict[str, int] = {}
    for (l_, s_), c in acc.items():
        cl[l_] = cl.get(l_, 0) + c
        cs[s_] = cs.get(s_, 0) + c
    cells = sorted(acc)
    terms = []
    for l_, s_ in cells:
        c = acc[(l_, s_)]
        t = np.log(float(n_tot * c) / float(cl[l_] * cs[s_]))
        terms.append(int(np.floor(1e9 * float(c) * t / float(n_tot))))
    return pa.table(
        {
            "lang": pa.array([c[0] for c in cells]),
            "source": pa.array([c[1] for c in cells]),
            "n": pa.array([acc[c] for c in cells], pa.int64()),
            "mi_term_e9": pa.array(terms, pa.int64()),
        }
    )


def _lang_source_mi_sql() -> str:
    return """
WITH c AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
nl AS (SELECT lang, SUM(n) AS cl FROM c GROUP BY lang),
ns AS (SELECT source, SUM(n) AS cs FROM c GROUP BY source),
nt AS (SELECT SUM(n) AS n_tot FROM c)
SELECT c.lang, c.source, CAST(c.n AS BIGINT) AS n,
       CAST(floor(1e9 * CAST(c.n AS DOUBLE) * ln(
              CAST((SELECT n_tot FROM nt) * c.n AS DOUBLE)
              / CAST(nl.cl * ns.cs AS DOUBLE))
            / CAST((SELECT n_tot FROM nt) AS DOUBLE)) AS BIGINT) AS mi_term_e9
FROM c JOIN nl USING (lang) JOIN ns USING (source)"""


def q_decision_stump(sf_dir: str):
    """Exact decision-stump induction: best quantity threshold splitting
    lineitem rows on the returned-flag target by weighted Gini impurity.
    Per-batch (quantity, n, pos) partials (the feature has a tiny
    integer domain), Python-int driver fold, and the argmin compares the
    exact rationals by HUGEINT-style cross-multiplication — ties break
    to the smaller threshold, identically in SQL. One row:
    (best_t, n_left, n_right, pos_left, pos_right, gini)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_returnflag"]
    )

    def partials(t: pa.Table) -> pa.Table:
        q = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        pos = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        u, inv = np.unique(q, return_inverse=True)
        return pa.table(
            {
                "q": u,
                "n": np.bincount(inv, minlength=len(u)).astype(np.int64),
                "p": np.bincount(inv, weights=pos, minlength=len(u)).astype(
                    np.int64
                ),
            }
        )

    cnt: dict[int, list[int]] = {}
    for b in li.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for q_, n_, p_ in zip(
            b["q"].to_pylist(), b["n"].to_pylist(), b["p"].to_pylist()
        ):
            cur = cnt.setdefault(int(q_), [0, 0])
            cur[0] += int(n_)
            cur[1] += int(p_)
    qs = sorted(cnt)
    n_tot = sum(v[0] for v in cnt.values())
    p_tot = sum(v[1] for v in cnt.values())
    best = None  # (num, den, t, nl, pl)
    nl = pl = 0
    for t_ in qs[:-1]:  # a split needs both sides non-empty
        nl += cnt[t_][0]
        pl += cnt[t_][1]
        nr, pr = n_tot - nl, p_tot - pl
        # weighted gini numerator over common denominator nl*nr:
        # G = A/nl + B/nr, A = nl^2 - pl^2 - (nl-pl)^2
        a = nl * nl - pl * pl - (nl - pl) * (nl - pl)
        b_ = nr * nr - pr * pr - (nr - pr) * (nr - pr)
        num, den = a * nr + b_ * nl, nl * nr
        if best is None or num * best[1] < best[0] * den:
            best = (num, den, t_, nl, pl)
    num, den, t_, nl, pl = best
    gini = float(num) / float(den) / float(n_tot)
    return pa.table(
        {
            "best_t": pa.array([t_], pa.int64()),
            "n_left": pa.array([nl], pa.int64()),
            "n_right": pa.array([n_tot - nl], pa.int64()),
            "pos_left": pa.array([pl], pa.int64()),
            "pos_right": pa.array([p_tot - pl], pa.int64()),
            "gini": pa.array(
                round_half_away(np.array([gini]), 9), pa.float64()
            ),
        }
    )


def _decision_stump_sql() -> str:
    return """
WITH c AS (
  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS HUGEINT) AS p
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(n) AS nt, SUM(p) AS pt FROM c),
cum AS (
  SELECT q AS t,
         SUM(n) OVER (ORDER BY q) AS nl,
         SUM(p) OVER (ORDER BY q) AS pl
  FROM c),
cand AS (
  SELECT t, nl, pl, (SELECT nt FROM tot) - nl AS nr,
         (SELECT pt FROM tot) - pl AS pr
  FROM cum WHERE nl < (SELECT nt FROM tot)),
sc AS (
  SELECT t, nl, pl, nr, pr,
         (nl*nl - pl*pl - (nl-pl)*(nl-pl)) * nr
           + (nr*nr - pr*pr - (nr-pr)*(nr-pr)) * nl AS num,
         nl * nr AS den
  FROM cand),
best AS (
  SELECT * FROM sc a WHERE NOT EXISTS (
    SELECT 1 FROM sc b
    WHERE b.num * a.den < a.num * b.den
       OR (b.num * a.den = a.num * b.den AND b.t < a.t)))
SELECT CAST(t AS BIGINT) AS best_t,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       CAST(pl AS BIGINT) AS pos_left, CAST(pr AS BIGINT) AS pos_right,
       ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
             / CAST((SELECT nt FROM tot) AS DOUBLE), 9) AS gini
FROM best"""


EMB_COV_Q = 1 << 20  # embedding quantization step for the covariance pass


def q_embedding_covariance(sf_dir: str):
    """Exact 64x64 sample covariance of the embedding table (upper
    triangle): integer-quantized vectors, per-batch integer Gram
    partials, Python-int driver fold, one mirrored divide chain."""
    from sbustreamspot_core_ray.stages.stats import embedding_covariance

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    return embedding_covariance(emb, q=EMB_COV_Q)


def _embedding_covariance_sql() -> str:
    q = float(EMB_COV_Q)
    return f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {q} + 0.5)
              AS HUGEINT) AS xv
  FROM embeddings
),
nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
s AS MATERIALIZED (SELECT i, SUM(xv) AS sx FROM x GROUP BY i),
g AS (
  SELECT a.i AS i, b.i AS j, SUM(a.xv * b.xv) AS sxy
  FROM x a JOIN x b ON b.vec_id = a.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
)
SELECT g.i, g.j, CAST(nn.n AS BIGINT) AS n,
       ROUND(CAST(nn.n * g.sxy - sa.sx * sb.sx AS DOUBLE)
             / CAST(nn.n * (nn.n - 1) AS DOUBLE) / ({q} * {q}), 12) AS cov
FROM g
JOIN s sa ON sa.i = g.i
JOIN s sb ON sb.i = g.j
CROSS JOIN nn"""


PCA_Q = 1 << 14       # embedding quantization for the PCA pass
PCA_VSCALE = 1 << 14  # power-iteration vector renormalization scale
PCA_ITERS = 12


def q_pca_projection(sf_dir: str):
    """First-principal-component projection by exact-integer power
    iteration on the centered scatter matrix C = n*Sxy - Sx Sx^T:
    12 fixed v <- Cv rounds with sign-aware truncated renormalization,
    then proj = n*(x . v) - (Sx . v) per vector — integers end to end,
    HUGEINT-mirrorable (no float summation order anywhere)."""
    from sbustreamspot_core_ray.stages.stats import pca_power_projection

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pca_power_projection(
        emb, q=PCA_Q, vscale=PCA_VSCALE, iters=PCA_ITERS
    )


def _pca_projection_sql() -> str:
    q = float(PCA_Q)
    vs = PCA_VSCALE
    ctes = [f"""x AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {q} + 0.5)
              AS HUGEINT) AS xv
  FROM embeddings
)""",
        "nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings)",
        "s AS MATERIALIZED (SELECT i, SUM(xv) AS sx FROM x GROUP BY i)",
        """g AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, SUM(a.xv * b.xv) AS sxy
  FROM x a JOIN x b ON b.vec_id = a.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
)""",
        """cu AS (
  SELECT g.i, g.j, nn.n * g.sxy - sa.sx * sb.sx AS c
  FROM g JOIN s sa ON sa.i = g.i JOIN s sb ON sb.i = g.j CROSS JOIN nn
)""",
        "c AS MATERIALIZED (SELECT i, j, c FROM cu "
        "UNION ALL SELECT j, i, c FROM cu WHERE i <> j)",
        f"v0 AS (SELECT DISTINCT i, CAST({vs} AS HUGEINT) AS val FROM x)",
    ]
    for k in range(1, PCA_ITERS + 1):
        p = k - 1
        ctes.append(
            f"y{k} AS MATERIALIZED (SELECT c.i AS i, SUM(c.c * v{p}.val) AS y"
            f" FROM c JOIN v{p} ON v{p}.i = c.j GROUP BY c.i)"
        )
        ctes.append(f"m{k} AS (SELECT MAX(ABS(y)) AS m FROM y{k})")
        ctes.append(
            f"v{k} AS MATERIALIZED (SELECT i, CASE WHEN y >= 0"
            f" THEN (y * {vs}) // m"
            f" ELSE -(((-y) * {vs}) // m) END AS val FROM y{k}, m{k})"
        )
    T = PCA_ITERS
    ctes.append(
        f"c0 AS (SELECT SUM(s.sx * v{T}.val) AS c0 FROM s"
        f" JOIN v{T} ON v{T}.i = s.i)"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT x.vec_id,
       CAST(nn.n * SUM(x.xv * vv.val) - c0.c0 AS BIGINT) AS proj
FROM x JOIN v{T} vv ON vv.i = x.i CROSS JOIN nn CROSS JOIN c0
GROUP BY x.vec_id, nn.n, c0.c0"""
    )


HOST_FOLD = 100  # pages per synthetic "host" (id // HOST_FOLD)


def q_host_pagerank(sf_dir: str):
    """Host-level PageRank by graph contraction: every page id maps to
    its host (id // HOST_FOLD), intra-host links drop, inter-host link
    multiplicities become edge weights, then weighted PageRank runs on
    the contracted graph — the standard site-level authority pipeline.
    The contraction is one stateless map over the raw edge stream; the
    multiplicity count happens inside each CSR shard's finalize (the
    weighted build), so nothing page-scale shuffles after the map."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, pagerank

    raw = _edges_full(sf_dir, dedup=False)

    def hostify(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy() // HOST_FOLD
        d = t["dst"].to_numpy() // HOST_FOLD
        keep = s != d
        return pa.table({"src": s[keep], "dst": d[keep]})

    g = ShardedGraph.build(
        raw.map_batches(hostify, batch_format="pyarrow"),
        num_parts=P,
        symmetric=False,
        weighted=True,
    )
    df = pagerank(g, damping=PR_DAMPING, max_iters=PR_ITERS, tol=0.0).to_pandas()
    df["rank"] = round_half_away(df["rank"], 7)
    return df


def _host_pagerank_sql() -> str:
    we = (
        "SELECT hs AS src, hd AS dst, CAST(count(*) AS DOUBLE) AS w FROM ("
        f"SELECT src // {HOST_FOLD} AS hs, dst // {HOST_FOLD} AS hd"
        f" FROM ({_SQL_EDGES_RAW})) WHERE hs <> hd GROUP BY hs, hd"
    )
    return _weighted_pagerank_sql(we)


PR_WARM_ITERS1 = 5
PR_WARM_ITERS2 = 5


def q_pagerank_incremental(sf_dir: str):
    """Incremental / warm-start PageRank: phase 1 converges on the
    customer->order subgraph; phase 2 adds the lineitem-derived edges and
    resumes from the prior ranks (new vertices start at 1/N2, no
    renormalization — the documented warm-start semantics the SQL mirror
    unrolls in two chained phases). Exercises W4's incremental-state
    surface on the north-star algorithm."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        pagerank,
        warm_start_ranks,
    )

    g1 = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P)
    r1 = pagerank(g1, damping=PR_DAMPING, max_iters=PR_WARM_ITERS1, tol=0.0)
    g2 = ShardedGraph.build(_edges_full(sf_dir), num_parts=P)
    warm_start_ranks(g2, r1, default=1.0 / float(g2.n_vertices))
    df = pagerank(
        g2, damping=PR_DAMPING, max_iters=PR_WARM_ITERS2, tol=0.0,
        skip_init=True,
    ).to_pandas()
    df["rank"] = round_half_away(df["rank"], 7)
    return df


def _pagerank_incremental_sql() -> str:
    """Two chained unrolled power iterations: phase 1 on the
    customer->order subgraph, phase 2 on the full graph warm-started via
    COALESCE(prior, 1/N2)."""
    d = PR_DAMPING
    ctes = [
        "e1 AS MATERIALIZED (SELECT o_custkey AS src,"
        " 10000000 + o_orderkey AS dst FROM orders)",
        "v1 AS MATERIALIZED (SELECT src AS vertex FROM e1 UNION SELECT dst FROM e1)",
        "n1 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) nv FROM v1)",
        "deg1 AS MATERIALIZED (SELECT src AS vertex, CAST(count(*) AS DOUBLE) d"
        " FROM e1 GROUP BY src)",
        "a0 AS MATERIALIZED (SELECT vertex, 1.0/(SELECT nv FROM n1) AS rank FROM v1)",
    ]
    for k in range(1, PR_WARM_ITERS1 + 1):
        p = k - 1
        ctes.append(
            f"adang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m"
            f" FROM a{p} r LEFT JOIN deg1 ON deg1.vertex = r.vertex"
            f" WHERE deg1.vertex IS NULL)"
        )
        ctes.append(
            f"ac{k} AS MATERIALIZED (SELECT e1.dst AS vertex,"
            f" SUM(r.rank / deg1.d) AS contrib FROM e1"
            f" JOIN a{p} r ON r.vertex = e1.src"
            f" JOIN deg1 ON deg1.vertex = e1.src GROUP BY e1.dst)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT v1.vertex, (1.0 - {d})/(SELECT nv FROM n1)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM adang{k})/(SELECT nv FROM n1)) AS rank"
            f" FROM v1 LEFT JOIN ac{k} c ON c.vertex = v1.vertex)"
        )
    ctes += [
        f"e2 AS MATERIALIZED ({_SQL_EDGES})",
        "v2 AS MATERIALIZED (SELECT src AS vertex FROM e2 UNION SELECT dst FROM e2)",
        "n2 AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) nv FROM v2)",
        "deg2 AS MATERIALIZED (SELECT src AS vertex, CAST(count(*) AS DOUBLE) d"
        " FROM e2 GROUP BY src)",
        f"b0 AS MATERIALIZED (SELECT v2.vertex,"
        f" COALESCE(p1.rank, 1.0/(SELECT nv FROM n2)) AS rank"
        f" FROM v2 LEFT JOIN a{PR_WARM_ITERS1} p1 ON p1.vertex = v2.vertex)",
    ]
    for k in range(1, PR_WARM_ITERS2 + 1):
        p = k - 1
        ctes.append(
            f"bdang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m"
            f" FROM b{p} r LEFT JOIN deg2 ON deg2.vertex = r.vertex"
            f" WHERE deg2.vertex IS NULL)"
        )
        ctes.append(
            f"bc{k} AS MATERIALIZED (SELECT e2.dst AS vertex,"
            f" SUM(r.rank / deg2.d) AS contrib FROM e2"
            f" JOIN b{p} r ON r.vertex = e2.src"
            f" JOIN deg2 ON deg2.vertex = e2.src GROUP BY e2.dst)"
        )
        ctes.append(
            f"b{k} AS MATERIALIZED (SELECT v2.vertex, (1.0 - {d})/(SELECT nv FROM n2)"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM bdang{k})/(SELECT nv FROM n2)) AS rank"
            f" FROM v2 LEFT JOIN bc{k} c ON c.vertex = v2.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, ROUND(rank, 7) AS rank FROM b{PR_WARM_ITERS2}"
    )


PPR_SEEDS = (1, 2, 3, 4, 5)  # customer keys, present at every sf


def q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank from a 5-customer seed set over the full
    derived graph: teleport + dangling mass land on the seeds (the
    seed-based importance variant of the north-star algorithm)."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, pagerank

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    df = pagerank(
        g,
        damping=PR_DAMPING,
        max_iters=PR_ITERS,
        tol=0.0,
        teleport_seeds=np.array(PPR_SEEDS, np.int64),
    ).to_pandas()
    df["rank"] = round_half_away(df["rank"], 7)
    return df


def _ppr_sql() -> str:
    """Unrolled PPR oracle: the pagerank chain with the uniform teleport
    replaced by the seed-set vector (mass 1/|S| on each seed; dangling mass
    redistributed to the seeds)."""
    d = PR_DAMPING
    seeds = ", ".join(str(s) for s in PPR_SEEDS)
    ns = len(PPR_SEEDS)
    ctes = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "deg AS MATERIALIZED (SELECT src AS vertex, CAST(count(*) AS DOUBLE) d"
        " FROM e GROUP BY src)",
        f"t AS MATERIALIZED (SELECT vertex, CASE WHEN vertex IN ({seeds})"
        f" THEN 1.0/{ns} ELSE 0.0 END AS tv FROM v)",
        "r0 AS MATERIALIZED (SELECT vertex, tv AS rank FROM t)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        ctes.append(
            f"dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m FROM r{p} r"
            f" LEFT JOIN deg ON deg.vertex = r.vertex WHERE deg.vertex IS NULL)"
        )
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT e.dst AS vertex, SUM(r.rank / deg.d) AS contrib"
            f" FROM e JOIN r{p} r ON r.vertex = e.src"
            f" JOIN deg ON deg.vertex = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT t.vertex, (1.0 - {d}) * t.tv"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM dang{k}) * t.tv) AS rank"
            f" FROM t LEFT JOIN c{k} c ON c.vertex = t.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, ROUND(rank, 7) AS rank FROM r{PR_ITERS}"
    )


def q_spam_mass(sf_dir: str):
    """TrustRank spam mass per vertex: classic PageRank and seed-
    personalized PageRank over the same graph, spam_mass =
    (pagerank - trustrank)/pagerank. Ranks round 7 before the one
    division, the mass 6 after — both mirrored in SQL."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        spam_mass,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    return spam_mass(
        g,
        np.array(PPR_SEEDS, np.int64),
        damping=PR_DAMPING,
        max_iters=PR_ITERS,
    )


def _spam_mass_sql() -> str:
    """Both unrolled chains share one prefixed-CTE statement: p_* is the
    classic-pagerank chain, t_* the seed-teleport chain (trust vector tv
    with mass 1/|S| per seed; dangling mass lands on the seeds)."""
    d = PR_DAMPING
    seeds = ", ".join(str(s) for s in PPR_SEEDS)
    ns = len(PPR_SEEDS)
    ctes = _pagerank_ctes(_SQL_EDGES, "p_")
    ctes += [
        "tv AS MATERIALIZED (SELECT vertex, CASE WHEN vertex IN"
        f" ({seeds}) THEN 1.0/{ns} ELSE 0.0 END AS tv FROM p_v)",
        "t_r0 AS MATERIALIZED (SELECT vertex, tv AS rank FROM tv)",
    ]
    for k in range(1, PR_ITERS + 1):
        p = k - 1
        ctes.append(
            f"t_dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0.0) AS m"
            f" FROM t_r{p} r LEFT JOIN p_deg deg ON deg.vertex = r.vertex"
            f" WHERE deg.vertex IS NULL)"
        )
        ctes.append(
            f"t_c{k} AS MATERIALIZED (SELECT e.dst AS vertex, SUM(r.rank / deg.d) AS contrib"
            f" FROM p_e e JOIN t_r{p} r ON r.vertex = e.src"
            f" JOIN p_deg deg ON deg.vertex = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"t_r{k} AS MATERIALIZED (SELECT t.vertex, (1.0 - {d}) * t.tv"
            f" + {d} * (COALESCE(c.contrib, 0.0)"
            f" + (SELECT m FROM t_dang{k}) * t.tv) AS rank"
            f" FROM tv t LEFT JOIN t_c{k} c ON c.vertex = t.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT vertex, pr AS pagerank, tr AS trustrank,
       CASE WHEN pr > 0 THEN ROUND((pr - tr) / pr, 6) ELSE 0.0 END AS spam_mass
FROM (
  SELECT p.vertex, ROUND(p.rank, 7) AS pr, ROUND(t.rank, 7) AS tr
  FROM p_r{PR_ITERS} p JOIN t_r{PR_ITERS} t ON t.vertex = p.vertex
)"""
    )


SALSA_QTY = 5  # lineitem thinning filter: keeps real component structure


def q_salsa(sf_dir: str):
    """SALSA hub/authority scores via the closed-form stationary
    distribution over bipartite part->order support components (no
    co-citation projection): score = (n_side_C / side_total) *
    (deg / E_C), rounded 9."""
    from sbustreamspot_core_ray.pipelines.superstep import salsa_scores

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_quantity"],
    )

    def mk(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = q <= SALSA_QTY
        p_ = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({"src": 20_000_000 + p_, "dst": 10_000_000 + o})

    return salsa_scores(
        li.map_batches(mk, batch_format="pyarrow"),
        num_partitions=P,
        hub_threshold=20_000_000,
    )


def _salsa_sql() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT 20000000 + l_partkey AS h, 10000000 + l_orderkey AS a
  FROM lineitem WHERE l_quantity <= {SALSA_QTY}
),
sym AS (SELECT h AS s, a AS d FROM e UNION SELECT a, h FROM e),
v AS (SELECT DISTINCT s AS v FROM sym),
reach(s, d) AS (
  SELECT s, d FROM sym
  UNION
  SELECT r.s, sym.d FROM reach r JOIN sym ON sym.s = r.d
),
comp AS (
  SELECT v.v AS vertex, LEAST(v.v, COALESCE(MIN(r.d), v.v)) AS comp
  FROM v LEFT JOIN reach r ON r.s = v.v GROUP BY v.v
),
deg AS (
  SELECT x AS vertex, count(*) AS deg
  FROM (SELECT h AS x FROM e UNION ALL SELECT a FROM e) GROUP BY x
),
j AS (
  SELECT d.vertex, d.deg, c.comp, d.vertex >= 20000000 AS hub
  FROM deg d JOIN comp c USING (vertex)
),
cs AS (
  SELECT comp,
         SUM(CASE WHEN hub THEN 1 ELSE 0 END) AS nh,
         SUM(CASE WHEN hub THEN 0 ELSE 1 END) AS na,
         SUM(CASE WHEN hub THEN 0 ELSE deg END) AS ec
  FROM j GROUP BY comp
),
tot AS (SELECT SUM(nh) AS th, SUM(na) AS ta FROM cs)
SELECT j.vertex,
       CASE WHEN j.hub THEN 'hub' ELSE 'auth' END AS side,
       CAST(j.deg AS BIGINT) AS deg,
       ROUND((CAST(CASE WHEN j.hub THEN cs.nh ELSE cs.na END AS DOUBLE)
              / CAST(CASE WHEN j.hub THEN tot.th ELSE tot.ta END AS DOUBLE))
             * (CAST(j.deg AS DOUBLE) / CAST(cs.ec AS DOUBLE)), 9) AS score
FROM j JOIN cs USING (comp) CROSS JOIN tot"""


def q_connected_components(sf_dir: str):
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        connected_components,
    )

    g = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=True)
    return connected_components(g)


def q_cc_incremental(sf_dir: str):
    """Incremental / warm-start connected components: phase 1 converges
    on the customer->order subgraph, phase 2 adds the lineitem-derived
    edges and resumes min-label propagation from the prior labels (valid
    upper bounds — the warm fixpoint equals cold CC on the full graph,
    which is what the oracle computes). Exercises W4's incremental-state
    surface on the second north-star algorithm."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        connected_components,
        warm_start_labels,
    )

    g1 = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=True)
    c1 = connected_components(g1)
    g2 = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    warm_start_labels(g2, c1)
    return connected_components(g2, skip_init=True)


CC_INC_SQL_ROUNDS = 16  # >= ecc(min id of any component); measured 7 + margin


def _cc_full_sql() -> str:
    """CC over the FULL derived graph by ITERATED min-label rounds (its
    giant component makes the transitive-closure CTE the custorder oracle
    uses explode to ~|V|^2 reach rows): label_k(v) = min over self +
    neighbors of label_{k-1}, unrolled past the min-vertex eccentricity."""
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "e AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0"
        " UNION SELECT dst, src FROM e0)",
        "v AS MATERIALIZED (SELECT DISTINCT s AS vertex FROM e)",
        "l0 AS (SELECT vertex, vertex AS label FROM v)",
    ]
    for k in range(1, CC_INC_SQL_ROUNDS + 1):
        p = k - 1
        ctes.append(
            f"m{k} AS MATERIALIZED (SELECT e.d AS vertex, MIN(l.label) AS ml"
            f" FROM e JOIN l{p} l ON l.vertex = e.s GROUP BY e.d)"
        )
        ctes.append(
            f"l{k} AS MATERIALIZED (SELECT l.vertex,"
            f" LEAST(l.label, COALESCE(m.ml, l.label)) AS label"
            f" FROM l{p} l LEFT JOIN m{k} m ON m.vertex = l.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, label AS component FROM l{CC_INC_SQL_ROUNDS}"
    )


def q_component_sizes(sf_dir: str):
    """Connected-component size histogram: (size, n_components,
    n_vertices) — the structure report read before sampling subgraphs.
    Per-block partial label counts -> one label fold -> bounded size
    histogram partials (dup_stats' shape on graph labels)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        connected_components,
    )

    g = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=True)
    cc = connected_components(g)

    def size_partial(t: pa.Table) -> pa.Table:
        from sbustreamspot_core_ray.functions.hashing import part_of

        lab = t["component"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(lab, return_counts=True)
        return pa.table(
            {
                "component": u,
                "n": c.astype(np.int64),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        lab = t["component"].to_numpy()
        n = t["n"].to_numpy()
        u, inv = np.unique(lab, return_inverse=True)
        sizes = np.bincount(inv, weights=n, minlength=len(u)).astype(np.int64)
        su, sc = np.unique(sizes, return_counts=True)
        return pa.table(
            {
                "size": su,
                "n_components": sc.astype(np.int64),
                "n_vertices": (su * sc).astype(np.int64),
            }
        )

    parts = (
        cc.map_batches(size_partial, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts)
    g2 = (
        df.groupby("size", sort=True)[["n_components", "n_vertices"]]
        .sum()
        .reset_index()
    )
    return pa.table(
        {
            "size": pa.array(g2["size"].to_numpy(np.int64)),
            "n_components": pa.array(g2["n_components"].to_numpy(np.int64)),
            "n_vertices": pa.array(g2["n_vertices"].to_numpy(np.int64)),
        }
    )


def q_degree_gini(sf_dir: str):
    """Degree-inequality summary: exact Gini coefficient of the
    undirected degree distribution, computed in closed form from the
    bounded degree histogram (rank-weighted sum per equal-degree block =
    v*(c*cum - c*(c-1)//2), all integers; one final two-term float
    expression mirrored by SQL). The skew evidence behind the salting
    design decision, as one auditable number."""
    from sbustreamspot_core_ray.pipelines.superstep import distinct, int_degrees

    edges = _edges_full(sf_dir, dedup=False)

    def cast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.compute.cast(t["src"], pa.int64()),
                "dst": pa.compute.cast(t["dst"], pa.int64()),
            }
        )

    de = distinct(edges.map_batches(cast, batch_format="pyarrow"), ["src", "dst"])

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
            }
        )

    deg = int_degrees(de.map_batches(both, batch_format="pyarrow"), P)

    def hist_partial(t: pa.Table) -> pa.Table:
        d = t["deg"].to_numpy()
        u, c = np.unique(d, return_counts=True)
        return pa.table({"v": u, "c": c.astype(np.int64)})

    parts = deg.map_batches(hist_partial, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts).groupby("v", sort=True)["c"].sum().reset_index()
    v = df["v"].to_numpy(np.int64)
    c = df["c"].to_numpy(np.int64)
    cum = np.cumsum(c)
    n = int(c.sum())
    s1 = int((v * c).sum())
    s2 = int((v * (c * cum - c * (c - 1) // 2)).sum())
    gini = round_half_away(
        np.array([2.0 * s2 / (n * s1) - float(n + 1) / n]), 6
    )[0]
    return pa.table(
        {
            "n_vertices": pa.array([n], pa.int64()),
            "sum_deg": pa.array([s1], pa.int64()),
            "rank_weighted_sum": pa.array([s2], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def q_label_propagation(sf_dir: str):
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        label_propagation,
    )

    g = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=True)
    return label_propagation(g, iters=LP_ITERS)


def q_modularity(sf_dir: str):
    """Newman modularity of the LPA community assignment as an exact
    integer witness (q_num) plus the single-division Q — one row."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        label_propagation,
        modularity_summary,
    )

    g = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=True)
    labels = label_propagation(g, iters=LP_ITERS)
    return modularity_summary(_edges_custorder(sf_dir), labels, num_partitions=P)


def q_neighborhood_sketch(sf_dir: str):
    """ANF/HyperANF-style neighborhood-function estimates over the
    customer->order graph (k=16 permuted min-hashes, 2 supersteps);
    SQL-mirrored with the seeded permutation constants embedded."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        neighborhood_sketch,
    )

    g = ShardedGraph.build(_edges_custorder(sf_dir), num_parts=P, symmetric=False)
    df = neighborhood_sketch(g, iters=NMH_ITERS, num_perm=NMH_K, seed=23).to_pandas()
    df["nf_est"] = round_half_away(df["nf_est"], 6)
    return df


KCORE_K = 5
KCORE_SQL_ROUNDS = 12  # peeling converges in 3 rounds at sf0.01; 4x margin


def q_kcore(sf_dir: str):
    """k-core decomposition (k=5) of the full derived graph on the
    superstep engine: round-based peeling where newly-dead vertices push
    per-edge decrements (O(E) total message volume across all rounds).
    Returns (vertex, core_deg) for core members."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, kcore

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return kcore(g, k=KCORE_K)


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_SQL_ROUNDS) -> str:
    """Unrolled peeling oracle: each round keeps vertices with >= k
    neighbors among the previous round's survivors. Extra rounds past
    convergence are no-ops, so the fixed unroll is safe as long as it
    exceeds the true round count (measured 3 at sf0.01; unroll 12)."""
    # every CTE is MATERIALIZED: each round references the previous one
    # twice, so default inlining would expand the plan (and the parquet
    # scans) 2^rounds times — enough to exhaust the process fd limit
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0 "
        "UNION ALL SELECT dst, src FROM e0)",
        f"v0 AS MATERIALIZED (SELECT s AS v FROM sym GROUP BY s HAVING count(*) >= {k})",
    ]
    for r in range(1, rounds + 1):
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT s AS v FROM sym "
            f"JOIN v{r - 1} x ON x.v = sym.s JOIN v{r - 1} y ON y.v = sym.d "
            f"GROUP BY s HAVING count(*) >= {k})"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT s AS vertex, count(*) AS core_deg
FROM sym JOIN v{rounds} x ON x.v = sym.s JOIN v{rounds} y ON y.v = sym.d
GROUP BY s"""
    )


CN_TOP = 100
# Hub cap for the exact link-prediction family: wedge centers with degree
# above this are skipped (with drop accounting logged by the kernel) and the
# SQL oracles mirror the identical cap, so parity stays bit-exact. Rationale:
# the wedge term is sum(deg^2); at sf0.1 the derived graph's 1000 supplier
# hubs (deg ~600) carry 350M of the 429M total, so capping at 128 cuts the
# pair exchange 5.4x and keeps these queries inside the sf0.1 bench sweep.
# The uncapped exact path stays available (max_deg=None) and is exercised by
# the linkpred_cap_recall witness query, which reports the capped top-100's
# overlap against the exact top-100 on the same input.
CN_MAX_DEG = 128


def q_common_neighbors(sf_dir: str):
    """Link prediction: top-100 non-adjacent vertex pairs by common-neighbor
    count over the full derived graph (wedge enumeration with per-partition
    combiners, one pair-keyed shuffle, local top-n, tiny global cut).
    Wedge centers above CN_MAX_DEG are skipped (drop-accounted; the SQL
    oracle applies the identical cap)."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    # dedup=False: common_neighbors canonicalizes + dedups internally, so
    # the pre-shuffle would be a second identical distinct
    return common_neighbors(
        _edges_full(sf_dir, dedup=False),
        top_n=CN_TOP,
        num_partitions=P,
        max_deg=CN_MAX_DEG,
    )


def q_adamic_adar(sf_dir: str):
    """Link prediction by the Adamic-Adar index over the full derived
    graph: top-100 non-adjacent pairs by sum(1/ln(deg(common neighbor))),
    carried as exact integer billionths (floor(1e9/ln(deg)) per wedge
    center) so the int64 sums hash-match the SQL oracle bit-for-bit."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    return common_neighbors(
        _edges_full(sf_dir, dedup=False),
        top_n=CN_TOP,
        num_partitions=P,
        weight="adamic_adar",
        max_deg=CN_MAX_DEG,
    ).rename_columns({"cn": "aa_e9"})


def q_resource_allocation(sf_dir: str):
    """Link prediction by the resource-allocation index: top-100
    non-adjacent pairs by sum(1/deg(common neighbor)), carried as exact
    integer billionths via pure integer floor division (1e9 // deg on both
    sides — no float in the parity chain at all)."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    return common_neighbors(
        _edges_full(sf_dir, dedup=False),
        top_n=CN_TOP,
        num_partitions=P,
        weight="resource_allocation",
        max_deg=CN_MAX_DEG,
    ).rename_columns({"cn": "ra_e9"})


def q_jaccard_links(sf_dir: str):
    """Link prediction by the Jaccard coefficient over the full derived
    graph: top-100 non-adjacent pairs by cn/(deg(a)+deg(b)-cn), carried as
    exact integer billionths (truncating integer division on both sides);
    degrees broadcast once to the pair reducers."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    return common_neighbors(
        _edges_full(sf_dir, dedup=False),
        top_n=CN_TOP,
        num_partitions=P,
        score="jaccard",
        max_deg=CN_MAX_DEG,
    )


def q_linkpred_cap_recall(sf_dir: str):
    """Witness for the CN_MAX_DEG hub cap: the capped top-100
    common-neighbor pair list's overlap against the uncapped EXACT top-100
    on the same derived graph — the cap's recall loss is measured, never
    assumed. One row (capped_top, exact_top, overlap)."""
    from sbustreamspot_core_ray.pipelines.superstep import common_neighbors

    capped = common_neighbors(
        _edges_full(sf_dir, dedup=False),
        top_n=CN_TOP,
        num_partitions=P,
        max_deg=CN_MAX_DEG,
    ).to_pandas()
    exact = common_neighbors(
        _edges_full(sf_dir, dedup=False), top_n=CN_TOP, num_partitions=P
    ).to_pandas()
    cset = set(zip(capped["src"], capped["dst"]))
    eset = set(zip(exact["src"], exact["dst"]))
    return pd.DataFrame(
        {
            "capped_top": [len(cset)],
            "exact_top": [len(eset)],
            "overlap": [len(cset & eset)],
        }
    )


_SQL_LINKPRED_CAP_RECALL = f"""
WITH e0 AS MATERIALIZED ({{edges}}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
deg AS MATERIALIZED (SELECT s, count(*) AS dg FROM sym GROUP BY s),
we AS (
  SELECT x.d AS a, y.d AS b, count(*) AS cn
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d
  GROUP BY x.d, y.d
),
top_e AS (
  SELECT we.a, we.b FROM we ANTI JOIN canon c ON c.a = we.a AND c.b = we.b
  ORDER BY we.cn DESC, we.a, we.b LIMIT {CN_TOP}
),
wc AS (
  SELECT x.d AS a, y.d AS b, count(*) AS cn
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d
  JOIN deg dc ON dc.s = x.s AND dc.dg <= {CN_MAX_DEG}
  GROUP BY x.d, y.d
),
top_c AS (
  SELECT wc.a, wc.b FROM wc ANTI JOIN canon c ON c.a = wc.a AND c.b = wc.b
  ORDER BY wc.cn DESC, wc.a, wc.b LIMIT {CN_TOP}
)
SELECT (SELECT count(*) FROM top_c) AS capped_top,
       (SELECT count(*) FROM top_e) AS exact_top,
       (SELECT count(*) FROM top_c SEMI JOIN top_e
          ON top_e.a = top_c.a AND top_e.b = top_c.b) AS overlap"""


_SQL_JACCARD_LINKS = f"""
WITH e0 AS MATERIALIZED ({{edges}}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
deg AS MATERIALIZED (SELECT s AS vertex, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY s),
w AS (
  SELECT x.d AS a, y.d AS b, CAST(count(*) AS BIGINT) AS cn
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d
  JOIN deg dc ON dc.vertex = x.s AND dc.dg <= {CN_MAX_DEG}
  GROUP BY x.d, y.d
),
nonadj AS (SELECT w.a, w.b, w.cn FROM w ANTI JOIN canon c ON c.a = w.a AND c.b = w.b)
SELECT n.a AS src, n.b AS dst,
       (1000000000 * n.cn) // (da.dg + db.dg - n.cn) AS jac_e9, n.cn AS cn
FROM nonadj n
JOIN deg da ON da.vertex = n.a JOIN deg db ON db.vertex = n.b
ORDER BY jac_e9 DESC, src, dst LIMIT {{top}}"""


HITS_ITERS = 8


def q_hits(sf_dir: str):
    """HITS hubs & authorities over the directed full derived graph
    (customer->order->part->supplier): 8 L1-normalized power iterations on
    the superstep engine (forward exchange for auth, reverse-route pull for
    hub)."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, hits

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    df = hits(g, iters=HITS_ITERS).to_pandas()
    df["auth"] = round_half_away(df["auth"], 7)
    df["hub"] = round_half_away(df["hub"], 7)
    return df


def _hits_sql(iters: int = HITS_ITERS) -> str:
    """Unrolled HITS oracle: each iteration's raw sums as LEFT JOINs over
    the vertex set, each normalized by its scalar L1 sum. MATERIALIZED
    CTEs (every round references the previous twice — default inlining
    would explode the plan 2^rounds)."""
    ctes = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT vertex, 1.0 AS h FROM v)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        ctes.append(
            f"ar{k} AS MATERIALIZED (SELECT v.vertex, COALESCE(s.x, 0.0) AS a"
            f" FROM v LEFT JOIN (SELECT e.dst AS vertex, SUM(h.h) AS x FROM e"
            f" JOIN h{p} h ON h.vertex = e.src GROUP BY e.dst) s"
            f" ON s.vertex = v.vertex)"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT vertex,"
            f" a / (SELECT SUM(a) FROM ar{k}) AS a FROM ar{k})"
        )
        ctes.append(
            f"hr{k} AS MATERIALIZED (SELECT v.vertex, COALESCE(s.x, 0.0) AS h"
            f" FROM v LEFT JOIN (SELECT e.src AS vertex, SUM(a.a) AS x FROM e"
            f" JOIN a{k} a ON a.vertex = e.dst GROUP BY e.src) s"
            f" ON s.vertex = v.vertex)"
        )
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT vertex,"
            f" h / (SELECT SUM(h) FROM hr{k}) AS h FROM hr{k})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.vertex, ROUND(a.a, 7) AS auth, ROUND(h.h, 7) AS hub"
        f" FROM a{iters} a JOIN h{iters} h ON h.vertex = a.vertex"
    )


KATZ_ALPHA = 0.05
KATZ_BETA = 1.0
KATZ_ITERS = 8


def q_katz(sf_dir: str):
    """Katz centrality over the directed full derived graph: 8 fixed
    attenuated-walk iterations (x = beta + alpha * A^T x) on the superstep
    engine — same exchange shape as PageRank, no degree division."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        katz_centrality,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    df = katz_centrality(
        g, alpha=KATZ_ALPHA, beta=KATZ_BETA, iters=KATZ_ITERS
    ).to_pandas()
    df["katz"] = round_half_away(df["katz"], 7)
    return df


def _katz_sql(iters: int = KATZ_ITERS) -> str:
    """Unrolled Katz oracle: each round a LEFT JOIN of the in-edge sums
    over the vertex set (beta + alpha * sum of the previous round's scores
    over in-neighbors)."""
    ctes = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        f"x0 AS MATERIALIZED (SELECT vertex, {KATZ_BETA} AS x FROM v)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT v.vertex,"
            f" {KATZ_BETA} + {KATZ_ALPHA} * COALESCE(s.c, 0.0) AS x"
            f" FROM v LEFT JOIN (SELECT e.dst AS vertex, SUM(x.x) AS c FROM e"
            f" JOIN x{p} x ON x.vertex = e.src GROUP BY e.dst) s"
            f" ON s.vertex = v.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, ROUND(x, 7) AS katz FROM x{iters}"
    )


WALK_ITERS = 3


def q_walk_centrality(sf_dir: str):
    """Exact k-walk-count centrality over the directed full derived graph:
    number of length-3 walks ending at each vertex (A^T applied 3 times to
    the ones vector), int64-exact on both sides — the un-attenuated Katz
    truncation."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        walk_counts,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    return walk_counts(g, iters=WALK_ITERS)


def _walk_sql(iters: int = WALK_ITERS) -> str:
    """Unrolled integer walk-count oracle: x0 = 1 on the vertex set, each
    round sums the previous round over in-edges (BIGINT throughout)."""
    ctes = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e UNION SELECT dst FROM e)",
        "x0 AS MATERIALIZED (SELECT vertex, CAST(1 AS BIGINT) AS x FROM v)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT v.vertex,"
            f" COALESCE(s.c, 0) AS x"
            f" FROM v LEFT JOIN (SELECT e.dst AS vertex,"
            f" CAST(SUM(x.x) AS BIGINT) AS c FROM e"
            f" JOIN x{p} x ON x.vertex = e.src GROUP BY e.dst) s"
            f" ON s.vertex = v.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vertex, x AS walks FROM x{iters}"
    )


def q_neighbor_features(sf_dir: str):
    """Graph feature engineering: per-vertex (sum, max) of all neighbors'
    degrees over the symmetrized full derived graph — ONE superstep
    exchange, exact int64 aggregation."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        neighbor_degree_agg,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return neighbor_degree_agg(g)


_SQL_NEIGHBOR_FEATURES = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0
                     UNION ALL SELECT dst, src FROM e0),
deg AS MATERIALIZED (SELECT s, count(*) AS dg FROM sym GROUP BY s)
SELECT sym.s AS vertex, CAST(SUM(nd.dg) AS BIGINT) AS nbr_deg_sum,
       MAX(nd.dg) AS nbr_deg_max
FROM sym JOIN deg nd ON nd.s = sym.d GROUP BY sym.s"""


BFS_SEEDS = (1, 2, 3, 4, 5)  # customer keys, present at every sf
BFS_MAX_HOPS = 8


def q_bfs_distance(sf_dir: str):
    """Multi-source BFS hop distance from the 5-customer seed set over the
    symmetrized full derived graph (superstep frontier propagation);
    returns (vertex, dist) for reached vertices within 8 hops."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        bfs_distance,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return bfs_distance(g, seeds=np.array(BFS_SEEDS, np.int64), max_hops=BFS_MAX_HOPS)


LANDMARK_MOD = 97
LANDMARK_TOPN = 200


def q_landmark_distances(sf_dir: str):
    """ALT-style landmark distance bounds: exact BFS distances from the
    5-landmark set, triangle-inequality (lb, ub) per sample vertex pair
    (id % 97 == 0), top-200 closest candidate pairs. One batched
    multi-seed BFS + a blocked broadcast pair scorer."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        landmark_distances,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return landmark_distances(
        g,
        seeds=np.array(BFS_SEEDS, np.int64),
        sample_mod=LANDMARK_MOD,
        max_hops=BFS_MAX_HOPS,
        topn=LANDMARK_TOPN,
    )


def _landmark_sql() -> str:
    seeds = ", ".join(f"({s})" for s in BFS_SEEDS)
    return f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
walk(seed, vertex, dist) AS (
  SELECT s, s, 0 FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT walk.seed, e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {BFS_MAX_HOPS}
),
dd AS (SELECT seed, vertex, MIN(dist) AS dist FROM walk GROUP BY 1, 2),
sv AS (SELECT DISTINCT vertex FROM dd WHERE vertex % {LANDMARK_MOD} = 0),
p AS (SELECT a.vertex AS u, b.vertex AS v FROM sv a JOIN sv b ON b.vertex > a.vertex),
m AS (
  SELECT p.u, p.v,
         MAX(ABS(da.dist - db.dist)) AS lb,
         MIN(da.dist + db.dist) AS ub
  FROM p JOIN dd da ON da.vertex = p.u
         JOIN dd db ON db.vertex = p.v AND db.seed = da.seed
  GROUP BY p.u, p.v
)
SELECT u, v, CAST(lb AS BIGINT) AS lb, CAST(ub AS BIGINT) AS ub
FROM m ORDER BY ub, u, v LIMIT {LANDMARK_TOPN}"""


BIPARTITE_CO_SEEDS = (1, 2, 3)  # customer keys, present at every sf
BIPARTITE_TRI_SEEDS = (30_000_001, 30_000_002, 30_000_003)  # suppliers


def q_bipartite(sf_dir: str):
    """Per-seed 2-colorability / odd-cycle certificate within BFS_MAX_HOPS
    of each sample seed: one batched multi-seed BFS per graph, packed
    parity bitmasks, two co-partition joins onto the canonical edge list.
    Run on TWO derived graphs so both branches are exercised: the
    customer-order graph (bipartite by construction) and the
    order-part-supplier co-occurrence graph (odd cycles via its
    triangles)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        bipartite_check,
    )

    out = []
    for tag, edges_fn, seeds in (
        (0, _edges_custorder, BIPARTITE_CO_SEEDS),
        (1, _edges_triangle, BIPARTITE_TRI_SEEDS),
    ):
        g = ShardedGraph.build(edges_fn(sf_dir), num_parts=P, symmetric=True)
        t = bipartite_check(
            g,
            edges_fn(sf_dir),
            seeds=np.array(seeds, np.int64),
            max_hops=BFS_MAX_HOPS,
            num_partitions=P,
        )
        out.append(
            t.add_column(0, "graph", pa.array([tag] * t.num_rows, pa.int64()))
        )
    return pa.concat_tables(out)


MATCH_ROUNDS = 16  # mutual-min handshake cap; fixpoint at 10 (sf0.01) / 13 (sf0.1)


def q_matching(sf_dir: str):
    """Deterministic maximal matching (mutual-min handshake rounds) over
    the symmetrized derived graph: one row per matched pair
    (vertex < partner, round). The round cap is part of the semantics and
    mirrored by the unrolled SQL oracle; the fixpoint lands well inside it
    at every test scale."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        maximal_matching,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return maximal_matching(g, max_rounds=MATCH_ROUNDS)


def _matching_sql() -> str:
    """Unrolled mutual-min handshake rounds: free_k shrinks by the round's
    mutual pairs; rounds past the fixpoint join empty sets."""
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0 WHERE src <> dst"
        " UNION SELECT dst, src FROM e0 WHERE src <> dst)",
        "free0 AS MATERIALIZED (SELECT DISTINCT s AS vertex FROM sym)",
    ]
    for k in range(1, MATCH_ROUNDS + 1):
        p = k - 1
        ctes.append(
            f"mm{k} AS MATERIALIZED (SELECT e.d AS v, MIN(e.s) AS m"
            f" FROM sym e"
            f" JOIN free{p} fs ON fs.vertex = e.s"
            f" JOIN free{p} fd ON fd.vertex = e.d"
            f" GROUP BY e.d)"
        )
        ctes.append(
            f"match{k} AS MATERIALIZED (SELECT a.v AS a, a.m AS b"
            f" FROM mm{k} a JOIN mm{k} b ON b.v = a.m"
            f" WHERE b.m = a.v AND a.v < a.m)"
        )
        ctes.append(
            f"free{k} AS MATERIALIZED (SELECT vertex FROM free{p}"
            f" EXCEPT SELECT a FROM match{k}"
            f" EXCEPT SELECT b FROM match{k})"
        )
    final = " UNION ALL ".join(
        f"SELECT a AS vertex, b AS partner, {k} AS round FROM match{k}"
        for k in range(1, MATCH_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({final})"


def _bipartite_block(edges_sql: str, seeds: tuple, tag: int) -> str:
    vals = ", ".join(f"({s})" for s in seeds)
    return f"""
SELECT * FROM (
WITH RECURSIVE e0 AS ({edges_sql}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
e AS (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
walk(seed, vertex, dist) AS (
  SELECT s, s, 0 FROM (VALUES {vals}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT walk.seed, e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {BFS_MAX_HOPS}
),
md AS MATERIALIZED (
  SELECT seed, vertex, MIN(dist) AS dist FROM walk GROUP BY seed, vertex
),
conf AS (
  SELECT x.seed, COUNT(*) AS n_edges_both,
         COUNT(*) FILTER (WHERE (x.dist % 2) = (y.dist % 2)) AS odd_edges
  FROM canon c
  JOIN md x ON x.vertex = c.a
  JOIN md y ON y.vertex = c.b AND y.seed = x.seed
  GROUP BY x.seed
),
rch AS (SELECT seed, COUNT(*) AS n_reached FROM md GROUP BY seed)
SELECT {tag} AS graph, t.s AS seed,
       COALESCE(r.n_reached, 0) AS n_reached,
       COALESCE(c.n_edges_both, 0) AS n_edges_both,
       COALESCE(c.odd_edges, 0) AS odd_edges,
       COALESCE(c.odd_edges, 0) = 0 AS is_bipartite
FROM (VALUES {vals}) t(s)
LEFT JOIN rch r ON r.seed = t.s
LEFT JOIN conf c ON c.seed = t.s
) blk{tag}"""


def _bipartite_sql() -> str:
    return (
        _bipartite_block(_SQL_EDGES_CO, BIPARTITE_CO_SEEDS, 0)
        + "\nUNION ALL\n"
        + _bipartite_block(_SQL_EDGES_TRI, BIPARTITE_TRI_SEEDS, 1)
        + "\nORDER BY graph, seed"
    )


SIGMA_SEEDS = (1, 2)  # customer keys, present at every sf
SIGMA_HOPS = 4

# Boruvka MSF: deterministic integer edge weights w = ((u*K1 + v*K2) mod
# 2^64) mod MSF_WMOD — numpy uint64 wraparound on the Ray side, HUGEINT
# recompute in SQL (the sketch-oracle idiom). Ties are broken by the total
# order (w, u, v), so weights need not be collision-free.
MSF_K1 = 0x9E3779B97F4A7C15
MSF_K2 = 0xC2B2AE3D27D4EB4F
MSF_WMOD = 1_000_003
MSF_PHASES = 8  # >= ceil(log2(max component size)); components here <= ~60
_MSF_ORD = 10_000_000
_MSF_PRT = 100_000_000
_MSF_PSALT = 1_000_000


def _edges_purchase(sf_dir: str) -> "ray.data.Dataset":
    """The per-customer purchase graph: customer—order, order—salted-part
    and customer—salted-part edges, where a part vertex is salted by the
    buying customer (vid = 1e8 + custkey*1e6 + partkey). Salting keeps
    every component inside one customer (size <= 1 + orders + parts, so
    Boruvka's phase bound is tiny) while the customer—part edges close a
    cycle through every (order, part) pair — a genuinely cyclic MSF input.
    The lineitem -> custkey attachment is the co-partitioned _attach_value
    hash join (both sides row-scale; no broadcast)."""
    from sbustreamspot_core_ray.pipelines.superstep import _attach_value
    from sbustreamspot_core_ray.sources.edges import distinct_int_rows

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def okey(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pc.cast(t["o_orderkey"], pa.int64()),
                "cust": pc.cast(t["o_custkey"], pa.int64()),
            }
        )

    def lkey(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": pc.cast(t["l_orderkey"], pa.int64()),
                "pkey": pc.cast(t["l_partkey"], pa.int64()),
            }
        )

    joined = _attach_value(
        li.map_batches(lkey, batch_format="pyarrow"),
        orders.map_batches(okey, batch_format="pyarrow"),
        "okey", ["pkey"], "cust", "cust", P,
    )

    def li_edges(t: pa.Table) -> pa.Table:
        o = t["okey"].to_numpy(zero_copy_only=False)
        p = t["pkey"].to_numpy(zero_copy_only=False)
        c = t["cust"].to_numpy(zero_copy_only=False)
        assert p.max(initial=0) < _MSF_PSALT
        pv = _MSF_PRT + c * _MSF_PSALT + p
        a = np.concatenate([_MSF_ORD + o, c])
        b = np.concatenate([pv, pv])
        return pa.table(
            {"u": np.minimum(a, b), "v": np.maximum(a, b)}
        )

    def co_edges(t: pa.Table) -> pa.Table:
        a = pc.cast(t["o_custkey"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.add(
            pc.cast(t["o_orderkey"], pa.int64()), _MSF_ORD
        ).to_numpy(zero_copy_only=False)
        return pa.table({"u": np.minimum(a, b), "v": np.maximum(a, b)})

    raw = joined.map_batches(li_edges, batch_format="pyarrow").union(
        orders.map_batches(co_edges, batch_format="pyarrow")
    )

    def weigh(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            w = (u * np.uint64(MSF_K1) + v * np.uint64(MSF_K2)) % np.uint64(
                MSF_WMOD
            )
        return t.append_column("w", pa.array(w.astype(np.int64)))

    return distinct_int_rows(raw, ["u", "v"], P).map_batches(
        weigh, batch_format="pyarrow"
    )


def q_msf(sf_dir: str):
    """Boruvka minimum spanning forest over the salted per-customer
    purchase graph: one row per MSF edge (u, v, w, phase). Fully
    distributed Dataset dataflow (label joins + hashed lexmin folds per
    phase); the (w, u, v) total order makes the forest unique, and the
    SQL oracle replays the identical phase schedule unrolled."""
    from sbustreamspot_core_ray.pipelines.superstep import boruvka_msf

    return boruvka_msf(_edges_purchase(sf_dir), num_parts=P,
                       max_phases=MSF_PHASES)


def _msf_phase_sql(k: int) -> str:
    return f"""
x{k} AS MATERIALIZED (SELECT e.u, e.v, e.w, lu.c AS cu, lv.c AS cv
  FROM msf_e e JOIN l{k-1} lu ON lu.vx = e.u JOIN l{k-1} lv ON lv.vx = e.v
  WHERE lu.c <> lv.c),
s{k} AS MATERIALIZED (SELECT cu AS c, cv AS oc, w, u, v FROM x{k}
  UNION ALL SELECT cv, cu, w, u, v FROM x{k}),
m{k} AS MATERIALIZED (SELECT c, oc, w, u, v FROM s{k}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) = 1),
h{k} AS MATERIALIZED (SELECT c AS s, oc AS d FROM m{k} UNION SELECT oc, c FROM m{k}),
r{k} (vx, lbl) AS (
  SELECT s, s FROM h{k}
  UNION
  SELECT h{k}.d, r{k}.lbl FROM r{k} JOIN h{k} ON h{k}.s = r{k}.vx),
n{k} AS MATERIALIZED (SELECT vx AS hc, MIN(lbl) AS nc FROM r{k} GROUP BY vx),
l{k} AS MATERIALIZED (SELECT l{k-1}.vx, COALESCE(n{k}.nc, l{k-1}.c) AS c
  FROM l{k-1} LEFT JOIN n{k} ON n{k}.hc = l{k-1}.c),
msf{k} AS (SELECT DISTINCT u, v, w, {k} AS phase FROM m{k})"""


def _msf_sql() -> str:
    """Unrolled Boruvka phases: per phase, cross edges against the current
    labeling, lexmin (w, u, v) per component, contraction = recursive-CTE
    connected components over the chosen hook pairs (new label = MIN old
    component id — exactly the engine's contraction), labels folded with
    an identity default. Weights recomputed in HUGEINT mod 2^64 mod
    MSF_WMOD, matching the engine's numpy uint64 wraparound bit-for-bit.
    Phases past the fixpoint see no cross edges and contribute nothing."""
    phases = ",".join(_msf_phase_sql(k) for k in range(1, MSF_PHASES + 1))
    union = " UNION ALL ".join(
        f"SELECT * FROM msf{k}" for k in range(1, MSF_PHASES + 1)
    )
    return f"""
WITH RECURSIVE
msf_raw AS MATERIALIZED (
  SELECT o_custkey AS a, {_MSF_ORD} + o_orderkey AS b FROM orders
  UNION
  SELECT DISTINCT {_MSF_ORD} + l_orderkey,
         {_MSF_PRT} + o_custkey * {_MSF_PSALT} + l_partkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  UNION
  SELECT DISTINCT o_custkey,
         {_MSF_PRT} + o_custkey * {_MSF_PSALT} + l_partkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
msf_e AS MATERIALIZED (
  SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
         CAST(((CAST(LEAST(a, b) AS HUGEINT) * {MSF_K1}
              + CAST(GREATEST(a, b) AS HUGEINT) * {MSF_K2})
              % 18446744073709551616) % {MSF_WMOD} AS BIGINT) AS w
  FROM msf_raw
),
msf_v AS (SELECT u AS vx FROM msf_e UNION SELECT v FROM msf_e),
l0 AS MATERIALIZED (SELECT vx, vx AS c FROM msf_v),
{phases}
SELECT * FROM ({union})
"""


def q_path_counts(sf_dir: str):
    """Per-seed shortest-path counts (Brandes' sigma stage): hop distance
    and exact number of distinct shortest paths from each sample seed over
    the symmetrized full derived graph."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        shortest_path_counts,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return shortest_path_counts(
        g, seeds=np.array(SIGMA_SEEDS, np.int64), max_hops=SIGMA_HOPS
    )


def _sigma_ctes() -> list:
    """Iterated per-hop CTEs (a recursive CTE's UNION dedups rows, which
    breaks path COUNTING): f_k = frontier at hop k with summed sigma from
    the hop-(k-1) frontier, excluding already-reached vertices."""
    seeds = ", ".join(f"({s})" for s in SIGMA_SEEDS)
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "e AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0"
        " UNION SELECT dst, src FROM e0)",
        f"f0 AS (SELECT s AS seed, s AS vertex, CAST(1 AS BIGINT) AS sigma"
        f" FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e))",
        "r0 AS (SELECT seed, vertex, 0 AS dist, sigma FROM f0)",
    ]
    for k in range(1, SIGMA_HOPS + 1):
        p = k - 1
        ctes.append(
            f"f{k} AS MATERIALIZED (SELECT f.seed, e.d AS vertex,"
            f" CAST(SUM(f.sigma) AS BIGINT) AS sigma"
            f" FROM f{p} f JOIN e ON e.s = f.vertex"
            f" LEFT JOIN r{p} r ON r.seed = f.seed AND r.vertex = e.d"
            f" WHERE r.vertex IS NULL GROUP BY f.seed, e.d)"
        )
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT * FROM r{p}"
            f" UNION ALL SELECT seed, vertex, {k} AS dist, sigma FROM f{k})"
        )
    return ctes


def _sigma_sql() -> str:
    return (
        "WITH " + ",\n".join(_sigma_ctes())
        + f"\nSELECT seed, vertex, dist, sigma FROM r{SIGMA_HOPS}"
    )


def q_stress_centrality(sf_dir: str):
    """Per-seed stress centrality: sigma BFS + integer back-propagation of
    downstream path counts on the same symmetric shard pool; stress =
    sigma * paths_from, exact int64."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        stress_centrality,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return stress_centrality(
        g, seeds=np.array(SIGMA_SEEDS, np.int64), max_hops=SIGMA_HOPS
    )


def _stress_sql() -> str:
    """Sigma chain + BFS-DAG edges + downward g accumulation: g(v) =
    sum over DAG successors (1 + g(w)), levels H-1 .. 0."""
    H = SIGMA_HOPS
    ctes = _sigma_ctes()
    ctes.append(
        f"de AS MATERIALIZED (SELECT ra.seed, e.s AS v, e.d AS w,"
        f" ra.dist AS vd"
        f" FROM e JOIN r{H} ra ON ra.vertex = e.s"
        f" JOIN r{H} rb ON rb.vertex = e.d AND rb.seed = ra.seed"
        f" WHERE rb.dist = ra.dist + 1)"
    )
    ctes.append(
        f"g{H} AS (SELECT seed, vertex, CAST(0 AS BIGINT) AS g"
        f" FROM r{H} WHERE dist = {H})"
    )
    for k in range(H - 1, -1, -1):
        ctes.append(
            f"g{k} AS MATERIALIZED (SELECT * FROM g{k + 1}"
            f" UNION ALL"
            f" SELECT r.seed, r.vertex, COALESCE(s.g, 0) AS g"
            f" FROM (SELECT seed, vertex FROM r{H} WHERE dist = {k}) r"
            f" LEFT JOIN (SELECT de.seed, de.v, CAST(SUM(1 + gw.g) AS BIGINT) AS g"
            f"   FROM de JOIN g{k + 1} gw"
            f"     ON gw.seed = de.seed AND gw.vertex = de.w"
            f"   WHERE de.vd = {k} GROUP BY de.seed, de.v) s"
            f" ON s.seed = r.seed AND s.v = r.vertex)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT r.seed, r.vertex, r.dist, r.sigma,
       g0.g AS paths_from,
       r.sigma * g0.g AS stress
FROM r{H} r JOIN g0 ON g0.seed = r.seed AND g0.vertex = r.vertex
"""
    )


MIS_SQL_ROUNDS = 6  # >= the rounds the derived 4-layer graph needs (3)


def q_mis(sf_dir: str):
    """Deterministic maximal independent set (lexicographically-first MIS)
    over the symmetrized derived graph: greedy-by-id Luby rounds on the
    superstep engine; returns (vertex, round joined)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        maximal_independent_set,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return maximal_independent_set(g)


def _mis_sql(rounds: int = MIS_SQL_ROUNDS) -> str:
    """Unrolled greedy-by-id MIS rounds: join when no smaller undecided
    neighbor exists, exclude the new members' neighbors. Unrolls more
    rounds than the derived graph's fixpoint needs (extra rounds produce
    empty join sets)."""
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0 WHERE src <> dst"
        " UNION SELECT dst, src FROM e0 WHERE src <> dst)",
        "u0 AS MATERIALIZED (SELECT DISTINCT s AS vertex FROM sym)",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        ctes.append(
            f"j{k} AS MATERIALIZED (SELECT u.vertex FROM u{p} u"
            f" WHERE NOT EXISTS (SELECT 1 FROM sym e"
            f" JOIN u{p} w ON w.vertex = e.s"
            f" WHERE e.d = u.vertex AND e.s < u.vertex))"
        )
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT DISTINCT e.d AS vertex"
            f" FROM sym e JOIN j{k} j ON j.vertex = e.s)"
        )
        ctes.append(
            f"u{k} AS MATERIALIZED (SELECT vertex FROM u{p}"
            f" EXCEPT SELECT vertex FROM j{k}"
            f" EXCEPT SELECT vertex FROM x{k})"
        )
    members = " UNION ALL ".join(
        f"SELECT vertex, {k} AS round FROM j{k}" for k in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({members})"


DIAM_SEED = 1
DIAM_HOPS = 16


def q_diameter(sf_dir: str):
    """Double-sweep BFS diameter lower bound over the symmetrized derived
    graph (one row, exact integers)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        two_sweep_diameter,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return two_sweep_diameter(g, seed=DIAM_SEED, max_hops=DIAM_HOPS)


_SQL_DIAMETER = f"""
WITH RECURSIVE e0 AS ({{edges}}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
w1(vertex, dist) AS (
  SELECT {DIAM_SEED}, 0
  UNION
  SELECT e.d, w1.dist + 1 FROM w1 JOIN e ON e.s = w1.vertex
  WHERE w1.dist < {DIAM_HOPS}
),
d1 AS (SELECT vertex, MIN(dist) AS dist FROM w1 GROUP BY vertex),
far AS (SELECT vertex, dist FROM d1 ORDER BY dist DESC, vertex LIMIT 1),
w2(vertex, dist) AS (
  SELECT vertex, 0 FROM far
  UNION
  SELECT e.d, w2.dist + 1 FROM w2 JOIN e ON e.s = w2.vertex
  WHERE w2.dist < {DIAM_HOPS}
),
d2 AS (SELECT vertex, MIN(dist) AS dist FROM w2 GROUP BY vertex)
SELECT CAST({DIAM_SEED} AS BIGINT) AS seed,
       CAST((SELECT vertex FROM far) AS BIGINT) AS far_vertex,
       CAST((SELECT dist FROM far) AS BIGINT) AS ecc1,
       CAST((SELECT MAX(dist) FROM d2) AS BIGINT) AS diameter_lb
"""


COLOR_PHASES = 4  # derived graph colors in 2 greedy-MIS phases; 2x margin
COLOR_SQL_ROUNDS = 6  # MIS fixpoint within a phase is 3 rounds; 2x margin


def q_coloring(sf_dir: str):
    """Distance-1 greedy coloring by iterated MIS phases over the
    symmetrized derived graph; (vertex, color), colors 1-based."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        greedy_coloring,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return greedy_coloring(g, max_colors=COLOR_PHASES)


def _coloring_sql() -> str:
    """Unrolled greedy-MIS coloring phases: phase ph's MIS runs
    COLOR_SQL_ROUNDS unrolled rounds over the vertices still uncolored;
    extra phases/rounds join empty sets (the fixpoint margin)."""
    R = COLOR_SQL_ROUNDS
    ctes = [
        f"e0 AS MATERIALIZED ({_SQL_EDGES})",
        "sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e0 WHERE src <> dst"
        " UNION SELECT dst, src FROM e0 WHERE src <> dst)",
        "rem0 AS MATERIALIZED (SELECT DISTINCT s AS vertex FROM sym)",
    ]
    for ph in range(1, COLOR_PHASES + 1):
        ctes.append(f"u{ph}_0 AS (SELECT vertex FROM rem{ph - 1})")
        for k in range(1, R + 1):
            p = k - 1
            ctes.append(
                f"j{ph}_{k} AS MATERIALIZED (SELECT u.vertex FROM u{ph}_{p} u"
                f" WHERE NOT EXISTS (SELECT 1 FROM sym e"
                f" JOIN u{ph}_{p} w ON w.vertex = e.s"
                f" WHERE e.d = u.vertex AND e.s < u.vertex))"
            )
            ctes.append(
                f"x{ph}_{k} AS MATERIALIZED (SELECT DISTINCT e.d AS vertex"
                f" FROM sym e JOIN j{ph}_{k} j ON j.vertex = e.s)"
            )
            ctes.append(
                f"u{ph}_{k} AS MATERIALIZED (SELECT vertex FROM u{ph}_{p}"
                f" EXCEPT SELECT vertex FROM j{ph}_{k}"
                f" EXCEPT SELECT vertex FROM x{ph}_{k})"
            )
        members = " UNION ALL ".join(
            f"SELECT vertex FROM j{ph}_{k}" for k in range(1, R + 1)
        )
        ctes.append(f"m{ph} AS MATERIALIZED (SELECT vertex FROM ({members}))")
        ctes.append(
            f"rem{ph} AS MATERIALIZED (SELECT vertex FROM rem{ph - 1}"
            f" EXCEPT SELECT vertex FROM m{ph})"
        )
    final = " UNION ALL ".join(
        f"SELECT vertex, {ph} AS color FROM m{ph}"
        for ph in range(1, COLOR_PHASES + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({final})"


FAR_SEEDS = BFS_SEEDS
FAR_MAX_HOPS = 8


def q_closeness_sample(sf_dir: str):
    """Sampled closeness (farness) centrality: one BFS per seed customer
    over the symmetrized derived graph, (reach_cnt, dist_sum) accumulated
    inside the CSR shards — the pivot-sampling closeness approximation,
    exact int64."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        sampled_farness,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return sampled_farness(
        g, seeds=np.array(FAR_SEEDS, np.int64), max_hops=FAR_MAX_HOPS
    )


def _closeness_sample_sql() -> str:
    seeds = ", ".join(f"({s})" for s in FAR_SEEDS)
    return f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
walk(seed, vertex, dist) AS (
  SELECT s, s, 0 FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT walk.seed, e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {FAR_MAX_HOPS}
),
md AS (SELECT seed, vertex, MIN(dist) AS dist FROM walk GROUP BY seed, vertex)
SELECT vertex, CAST(count(*) AS BIGINT) AS reach_cnt,
       CAST(SUM(dist) AS BIGINT) AS dist_sum
FROM md GROUP BY vertex"""


def q_harmonic_sample(sf_dir: str):
    """Sampled harmonic centrality: the farness BFS engine with an extra
    integer accumulator — each reached vertex adds floor(1e9/d + 0.5)
    nano-units per seed, so the sums are exact and order-independent."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        sampled_farness,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return sampled_farness(
        g, seeds=np.array(FAR_SEEDS, np.int64), max_hops=FAR_MAX_HOPS,
        harmonic=True,
    ).select_columns(["vertex", "reach_cnt", "harmonic_e9"])


def _harmonic_sample_sql() -> str:
    seeds = ", ".join(f"({s})" for s in FAR_SEEDS)
    return f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
walk(seed, vertex, dist) AS (
  SELECT s, s, 0 FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT walk.seed, e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {FAR_MAX_HOPS}
),
md AS (SELECT seed, vertex, MIN(dist) AS dist FROM walk GROUP BY seed, vertex)
SELECT vertex, CAST(count(*) AS BIGINT) AS reach_cnt,
       CAST(SUM(CASE WHEN dist > 0
                THEN CAST(floor(1e9 / dist + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS harmonic_e9
FROM md GROUP BY vertex"""


def q_partition_skew(sf_dir: str):
    """Partitioning/skew audit (the north rule's explicit-partitioning
    requirement, made inspectable): per-partition edge counts under the
    engine's own hash partitioner (part_of: Fibonacci multiplicative mix
    >> 33, mod P) on the src key, plus each partition's integer ppm share
    — the diagnostic a skew-salting decision reads."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    def tag(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        p = part_of(src, P)
        cnt = np.bincount(p, minlength=P)
        return pa.table(
            {
                "part": pa.array(np.arange(P, dtype=np.int64)),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = (
        _edges_full(sf_dir)  # dedup=True: the audit is over DISTINCT edges
        .map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .sum("n_partial")
        .to_pandas()
        .rename(columns={"sum(n_partial)": "n_rows"})
        .sort_values("part")
        .reset_index(drop=True)
    )
    # report only non-empty partitions: the SQL oracle GROUPs over observed
    # rows, so it can never yield a zero-count partition — without this
    # filter an empty partition (tiny sf / large P) would row-count
    # mismatch the gate (ADVICE.md round 3)
    parts = parts[parts["n_rows"] > 0].reset_index(drop=True)
    total = int(parts["n_rows"].sum())
    parts["share_ppm"] = (
        parts["n_rows"].to_numpy(np.int64) * 1_000_000 // total
    )
    return parts


_SQL_PARTITION_SKEW = f"""
WITH e AS ({_SQL_EDGES}),
p AS (
  SELECT CAST((((CAST(src AS HUGEINT) * 11400714819323198485)
                % 18446744073709551616) // 8589934592) % {P} AS BIGINT)
         AS part
  FROM e
),
c AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows FROM p GROUP BY part),
t AS (SELECT SUM(n_rows) AS total FROM c)
SELECT part, n_rows,
       CAST(n_rows * 1000000 // t.total AS BIGINT) AS share_ppm
FROM c, t ORDER BY part
"""


def q_effective_diameter(sf_dir: str):
    """Per-seed effective diameter (90th-percentile BFS distance): the
    smallest hop h whose cumulative reached count crosses 90% of the
    seed's total reach — integer cross-multiplied (10 * cum >= 9 * total),
    composed over the bfs_hop_histogram superstep output."""
    df = (
        q_hop_histogram(sf_dir)
        .to_pandas()
        .sort_values(["seed", "dist"])
        .reset_index(drop=True)
    )
    rows = []
    for seed, g in df.groupby("seed", sort=True):
        n = g["n_vertices"].to_numpy(np.int64)
        d = g["dist"].to_numpy(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1])
        i = int(np.flatnonzero(10 * cum >= 9 * total)[0])
        rows.append((int(seed), int(d[i]), total))
    return pd.DataFrame(rows, columns=["seed", "eff_diam", "reached"])


def _effective_diameter_sql() -> str:
    return f"""
WITH h AS ({_hop_histogram_sql()}),
c AS (
  SELECT seed, dist, n_vertices,
         SUM(n_vertices) OVER (PARTITION BY seed ORDER BY dist) AS cum,
         SUM(n_vertices) OVER (PARTITION BY seed) AS total
  FROM h
)
SELECT seed, CAST(dist AS BIGINT) AS eff_diam,
       CAST(total AS BIGINT) AS reached
FROM c WHERE 10 * cum >= 9 * total
QUALIFY row_number() OVER (PARTITION BY seed ORDER BY dist) = 1
ORDER BY seed
"""


def q_hop_histogram(sf_dir: str):
    """Per-seed BFS hop profile (seed, dist, n_vertices): one BFS per
    sample seed; each shard returns only a bounded per-hop histogram."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        bfs_hop_histogram,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return bfs_hop_histogram(
        g, seeds=np.array(FAR_SEEDS, np.int64), max_hops=FAR_MAX_HOPS
    )


def _hop_histogram_sql() -> str:
    seeds = ", ".join(f"({s})" for s in FAR_SEEDS)
    return f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
walk(seed, vertex, dist) AS (
  SELECT s, s, 0 FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT walk.seed, e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {FAR_MAX_HOPS}
),
md AS (SELECT seed, vertex, MIN(dist) AS dist FROM walk GROUP BY seed, vertex)
SELECT seed, dist, CAST(count(*) AS BIGINT) AS n_vertices
FROM md GROUP BY seed, dist"""


WALK_SEEDS = tuple(range(1, 51))  # customer keys, present at every sf
WALK_LEN = 4


def q_random_walks(sf_dir: str):
    """DeepWalk-style corpus generation: deterministic seeded-hash walks
    over the symmetrized derived graph, adjacency resident in the CSR
    shard pool (one routed exchange per step)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        random_walks,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    return random_walks(
        g, seeds=np.array(WALK_SEEDS, np.int64), length=WALK_LEN
    )


def _random_walks_sql() -> str:
    seeds = ", ".join(f"({s})" for s in WALK_SEEDS)
    ctes = [
        f"de AS MATERIALIZED ({_SQL_EDGES})",
        "sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM de"
        " UNION SELECT dst, src FROM de)",
        "adj AS MATERIALIZED (SELECT s, d,"
        " CAST(row_number() OVER (PARTITION BY s ORDER BY d) - 1 AS BIGINT) AS rn,"
        " CAST(count(*) OVER (PARTITION BY s) AS BIGINT) AS deg FROM sym)",
        f"w0 AS (SELECT s AS walk_id, s AS v FROM (VALUES {seeds}) t(s)"
        " WHERE s IN (SELECT s FROM adj))",
    ]
    for k in range(1, WALK_LEN + 1):
        ctes.append(
            f"w{k} AS (SELECT w.walk_id, adj.d AS v FROM w{k - 1} w"
            f" JOIN adj ON adj.s = w.v"
            f" AND adj.rn = (w.walk_id * 2654435761 + {k} * 40503) % adj.deg)"
        )
    selects = [
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, v AS vertex FROM w{k}"
        for k in range(0, WALK_LEN + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


SKIPGRAM_WINDOW = 2


def q_walk_skipgrams(sf_dir: str):
    """Skip-gram (center, context) pair counts over the deterministic
    walks — the word2vec/DeepWalk corpus-prep step."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        random_walks,
        walk_skipgrams,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True
    )
    walks = random_walks(g, seeds=np.array(WALK_SEEDS, np.int64), length=WALK_LEN)
    return walk_skipgrams(walks, window=SKIPGRAM_WINDOW, num_parts=P)


def _walk_skipgrams_sql() -> str:
    return f"""
WITH walks AS MATERIALIZED (
{_random_walks_sql()}
)
SELECT a.vertex AS center, b.vertex AS context, count(*) AS n
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id AND a.step <> b.step
 AND abs(a.step - b.step) <= {SKIPGRAM_WINDOW}
GROUP BY 1, 2"""


def q_assortativity(sf_dir: str):
    """Degree assortativity of the undirected derived graph — exact
    integer moments, one float division chain mirrored by the SQL."""
    from sbustreamspot_core_ray.pipelines.superstep import degree_assortativity

    return degree_assortativity(_edges_full(sf_dir), num_partitions=P)


RECIP_MOD = 997  # vertex-id fold for the directed interaction graph


def _edges_directed(sf_dir: str) -> ray.data.Dataset:
    """Directed interaction graph with genuine reverse pairs and self
    loops: (l_partkey % m, l_suppkey % m) folds both key spaces onto one
    id range so (a,b) and (b,a) both occur — the shape reciprocity needs."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def mk(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": p % RECIP_MOD, "dst": s % RECIP_MOD})

    return li.map_batches(mk, batch_format="pyarrow")


def q_scc(sf_dir: str):
    """Directed strongly connected components (forward-backward label
    refinement on twin shard pools); scc_id = min member id."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        strongly_connected_components,
    )

    return strongly_connected_components(
        _edges_directed(sf_dir), num_partitions=P
    )


_SQL_SCC = f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT l_partkey % {{m}} AS s, l_suppkey % {{m}} AS d
  FROM lineitem
),
v AS (SELECT DISTINCT x AS v FROM (SELECT s AS x FROM e UNION SELECT d FROM e)),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
mut AS (
  SELECT a.s AS v, a.d AS u
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s
),
mn AS (SELECT v, MIN(u) AS mu FROM mut GROUP BY v)
SELECT v.v AS vertex,
       CAST(LEAST(v.v, COALESCE(mn.mu, v.v)) AS BIGINT) AS scc_id
FROM v LEFT JOIN mn ON mn.v = v.v
"""


def q_condensation(sf_dir: str):
    """SCC condensation-DAG summary (one row): component count/max size,
    condensation edges, source/sink components — all count aggregates."""
    from sbustreamspot_core_ray.pipelines.superstep import condensation_summary

    return condensation_summary(_edges_directed(sf_dir), num_partitions=P)


def q_condensation_depth(sf_dir: str):
    """Longest-path layering of the SCC condensation DAG: per component
    the topological wave number (sources = 0); exact integers."""
    from sbustreamspot_core_ray.pipelines.superstep import condensation_depth

    return condensation_depth(_edges_directed(sf_dir), num_partitions=P)


_SQL_CONDENSATION_DEPTH = """
WITH RECURSIVE e AS (
  SELECT DISTINCT l_partkey % {m} AS s, l_suppkey % {m} AS d
  FROM lineitem
),
v AS (SELECT DISTINCT x AS v FROM (SELECT s AS x FROM e UNION SELECT d FROM e)),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
mut AS (
  SELECT a.s AS v, a.d AS u
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s
),
mn AS (SELECT v, MIN(u) AS mu FROM mut GROUP BY v),
scc AS (
  SELECT v.v AS vertex, CAST(LEAST(v.v, COALESCE(mn.mu, v.v)) AS BIGINT) AS scc_id
  FROM v LEFT JOIN mn ON mn.v = v.v
),
ce AS (
  SELECT DISTINCT a.scc_id AS cs, b.scc_id AS cd
  FROM e JOIN scc a ON a.vertex = e.s JOIN scc b ON b.vertex = e.d
  WHERE a.scc_id <> b.scc_id
),
comps AS (SELECT DISTINCT scc_id FROM scc),
walk(c, depth) AS (
  SELECT scc_id, 0 FROM comps
  UNION
  SELECT ce.cd, walk.depth + 1 FROM walk JOIN ce ON ce.cs = walk.c
)
SELECT c AS scc_id, CAST(MAX(depth) AS BIGINT) AS depth FROM walk GROUP BY c
"""


_SQL_CONDENSATION = """
WITH RECURSIVE e AS (
  SELECT DISTINCT l_partkey % {m} AS s, l_suppkey % {m} AS d
  FROM lineitem
),
v AS (SELECT DISTINCT x AS v FROM (SELECT s AS x FROM e UNION SELECT d FROM e)),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
mut AS (
  SELECT a.s AS v, a.d AS u
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s
),
mn AS (SELECT v, MIN(u) AS mu FROM mut GROUP BY v),
scc AS (
  SELECT v.v AS vertex, LEAST(v.v, COALESCE(mn.mu, v.v)) AS scc_id
  FROM v LEFT JOIN mn ON mn.v = v.v
),
ce AS (
  SELECT DISTINCT sa.scc_id AS cs, sb.scc_id AS cd
  FROM e
  JOIN scc sa ON sa.vertex = e.s
  JOIN scc sb ON sb.vertex = e.d
  WHERE sa.scc_id <> sb.scc_id
),
sz AS (SELECT scc_id, count(*) AS n FROM scc GROUP BY scc_id)
SELECT CAST((SELECT count(*) FROM sz) AS BIGINT) AS n_sccs,
       CAST((SELECT max(n) FROM sz) AS BIGINT) AS largest_scc,
       CAST((SELECT count(*) FROM ce) AS BIGINT) AS n_condensation_edges,
       CAST((SELECT count(*) FROM sz)
            - (SELECT count(DISTINCT cd) FROM ce) AS BIGINT) AS n_source_sccs,
       CAST((SELECT count(*) FROM sz)
            - (SELECT count(DISTINCT cs) FROM ce) AS BIGINT) AS n_sink_sccs
"""


BOWTIE_M = 2999    # vertex fold for the bow-tie link layer
BOWTIE_MULT = 31   # supplier spread multiplier (coprime with BOWTIE_M)


def _edges_bowtie(sf_dir: str) -> ray.data.Dataset:
    """Directed graph with genuine bow-tie structure: a sparse folded
    part->supplier layer (one lineitem row per order keeps mean degree
    low enough that the giant SCC stays partial: real IN/OUT/tendril
    classes) plus a disjoint orders-derived island in the id range
    [BOWTIE_M, BOWTIE_M+211) that exercises the DISCONNECTED class."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_linenumber"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    )

    def mk_link(t: pa.Table) -> pa.Table:
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        keep = ln == 1
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {"src": p % BOWTIE_M, "dst": (s * BOWTIE_MULT) % BOWTIE_M}
        )

    def mk_island(t: pa.Table) -> pa.Table:
        ok_ = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ok_ % 97 == 0
        ok_, ck = ok_[keep], ck[keep]
        return pa.table(
            {
                "src": BOWTIE_M + ck % 211,
                "dst": BOWTIE_M + (ok_ * 13) % 211,
            }
        )

    return li.map_batches(mk_link, batch_format="pyarrow").union(
        orders.map_batches(mk_island, batch_format="pyarrow")
    )


def q_bowtie(sf_dir: str):
    """Web-graph bow-tie decomposition (Broder taxonomy): six rows
    (class, n_components, n_vertices) — CORE largest SCC, IN/OUT by
    condensation reachability, TUBES on core-avoiding IN->OUT paths,
    TENDRILS the rest of the core's weak component, DISCONNECTED the
    remainder."""
    from sbustreamspot_core_ray.pipelines.superstep import bowtie_decomposition

    return bowtie_decomposition(_edges_bowtie(sf_dir), num_partitions=P)


def _bowtie_sql() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT l_partkey % {BOWTIE_M} AS s,
         (l_suppkey * {BOWTIE_MULT}) % {BOWTIE_M} AS d
  FROM lineitem WHERE l_linenumber = 1
  UNION
  SELECT DISTINCT {BOWTIE_M} + o_custkey % 211,
         {BOWTIE_M} + (o_orderkey * 13) % 211
  FROM orders WHERE o_orderkey % 97 = 0
),
v AS (SELECT DISTINCT x AS v FROM (SELECT s AS x FROM e UNION SELECT d FROM e)),
reach(s, d) AS (
  SELECT s, d FROM e
  UNION
  SELECT r.s, e.d FROM reach r JOIN e ON e.s = r.d
),
mut AS (
  SELECT a.s AS v, a.d AS u
  FROM reach a JOIN reach b ON b.s = a.d AND b.d = a.s
),
mn AS (SELECT v, MIN(u) AS mu FROM mut GROUP BY v),
scc AS (
  SELECT v.v AS vertex, LEAST(v.v, COALESCE(mn.mu, v.v)) AS scc_id
  FROM v LEFT JOIN mn ON mn.v = v.v
),
sz AS (SELECT scc_id, count(*) AS n FROM scc GROUP BY scc_id),
core AS (SELECT scc_id FROM sz ORDER BY n DESC, scc_id LIMIT 1),
ce AS (
  SELECT DISTINCT sa.scc_id AS cs, sb.scc_id AS cd
  FROM e
  JOIN scc sa ON sa.vertex = e.s
  JOIN scc sb ON sb.vertex = e.d
  WHERE sa.scc_id <> sb.scc_id
),
rp(c) AS (
  SELECT scc_id FROM core
  UNION
  SELECT ce.cd FROM rp JOIN ce ON ce.cs = rp.c
),
rm(c) AS (
  SELECT scc_id FROM core
  UNION
  SELECT ce.cs FROM rm JOIN ce ON ce.cd = rm.c
),
ue AS (SELECT cs, cd FROM ce UNION SELECT cd, cs FROM ce),
wk(c) AS (
  SELECT scc_id FROM core
  UNION
  SELECT ue.cd FROM wk JOIN ue ON ue.cs = wk.c
),
ins AS (SELECT c FROM rm WHERE c NOT IN (SELECT scc_id FROM core)),
outs AS (SELECT c FROM rp WHERE c NOT IN (SELECT scc_id FROM core)),
re AS (SELECT cs, cd FROM ce
       WHERE cs NOT IN (SELECT scc_id FROM core)
         AND cd NOT IN (SELECT scc_id FROM core)),
fi(c) AS (
  SELECT c FROM ins
  UNION
  SELECT re.cd FROM fi JOIN re ON re.cs = fi.c
),
toc(c) AS (
  SELECT c FROM outs
  UNION
  SELECT re.cs FROM toc JOIN re ON re.cd = toc.c
),
cls AS (
  SELECT sz.scc_id, sz.n,
    CASE
      WHEN sz.scc_id IN (SELECT scc_id FROM core) THEN 'core'
      WHEN sz.scc_id IN (SELECT c FROM ins) THEN 'in'
      WHEN sz.scc_id IN (SELECT c FROM outs) THEN 'out'
      WHEN sz.scc_id NOT IN (SELECT c FROM wk) THEN 'disconnected'
      WHEN sz.scc_id IN (SELECT c FROM fi)
       AND sz.scc_id IN (SELECT c FROM toc) THEN 'tubes'
      ELSE 'tendrils'
    END AS class
  FROM sz
),
names(class) AS (
  VALUES ('core'), ('in'), ('out'), ('tubes'), ('tendrils'), ('disconnected'))
SELECT names.class,
       CAST(COALESCE(count(cls.scc_id), 0) AS BIGINT) AS n_components,
       CAST(COALESCE(sum(cls.n), 0) AS BIGINT) AS n_vertices
FROM names LEFT JOIN cls ON cls.class = names.class
GROUP BY names.class"""


def q_graph_summary(sf_dir: str):
    """One-row directed-graph summary (raw/distinct/self-loop/reciprocal
    edge counts + reciprocity): one unordered-key shuffle, per-partition
    integer partials, driver folds P rows."""
    from sbustreamspot_core_ray.pipelines.superstep import reciprocity_summary

    return reciprocity_summary(_edges_directed(sf_dir), num_partitions=P)


SSSP_CAP = 60  # recursion guard; must exceed the max finite distance


def q_sssp_distance(sf_dir: str):
    """Multi-source shortest path over integer multiplicity weights on the
    symmetrized derived graph (weighted build; Bellman-Ford frontier
    relaxation to the true fixpoint — all-integer, exact)."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        sssp_distance,
    )

    g = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=True,
        weighted=True,
    )
    return sssp_distance(g, seeds=np.array(BFS_SEEDS, np.int64))


def _sssp_sql() -> str:
    seeds = ", ".join(f"({s})" for s in BFS_SEEDS)
    return f"""
WITH RECURSIVE raw AS ({_SQL_EDGES_RAW}),
we AS (SELECT src, dst, count(*) AS w FROM raw GROUP BY src, dst),
e AS (SELECT src AS s, dst AS d, w FROM we UNION ALL SELECT dst, src, w FROM we),
walk(vertex, dist) AS (
  SELECT s, CAST(0 AS BIGINT) FROM (VALUES {seeds}) t(s)
  WHERE s IN (SELECT s FROM e)
  UNION
  SELECT e.d, walk.dist + e.w FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {SSSP_CAP}
)
SELECT vertex, MIN(dist) AS dist FROM walk GROUP BY vertex"""


def _bfs_sql() -> str:
    seeds = ", ".join(f"({s})" for s in BFS_SEEDS)
    return f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
walk(vertex, dist) AS (
  SELECT s, 0 FROM (VALUES {seeds}) t(s) WHERE s IN (SELECT s FROM e)
  UNION
  SELECT e.d, walk.dist + 1 FROM walk JOIN e ON e.s = walk.vertex
  WHERE walk.dist < {BFS_MAX_HOPS}
)
SELECT vertex, MIN(dist) AS dist FROM walk GROUP BY vertex"""


_SQL_ADAMIC_ADAR = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
wt AS MATERIALIZED (
  SELECT s, CAST(floor(1e9 / ln(count(*))) AS BIGINT) AS w
  FROM sym GROUP BY s HAVING count(*) >= 2 AND count(*) <= {CN_MAX_DEG}
),
w AS (
  SELECT x.d AS a, y.d AS b, SUM(wt.w) AS aa
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d JOIN wt ON wt.s = x.s
  GROUP BY x.d, y.d
),
nonadj AS (SELECT w.a, w.b, w.aa FROM w ANTI JOIN canon c ON c.a = w.a AND c.b = w.b)
SELECT a AS src, b AS dst, CAST(aa AS BIGINT) AS aa_e9 FROM nonadj
ORDER BY aa DESC, a, b LIMIT {CN_TOP}"""


_SQL_RESOURCE_ALLOCATION = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
wt AS MATERIALIZED (
  SELECT s, 1000000000 // count(*) AS w
  FROM sym GROUP BY s HAVING count(*) >= 2 AND count(*) <= {CN_MAX_DEG}
),
w AS (
  SELECT x.d AS a, y.d AS b, SUM(wt.w) AS ra
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d JOIN wt ON wt.s = x.s
  GROUP BY x.d, y.d
),
nonadj AS (SELECT w.a, w.b, w.ra FROM w ANTI JOIN canon c ON c.a = w.a AND c.b = w.b)
SELECT a AS src, b AS dst, CAST(ra AS BIGINT) AS ra_e9 FROM nonadj
ORDER BY ra DESC, a, b LIMIT {CN_TOP}"""


_SQL_COMMON_NEIGHBORS = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS MATERIALIZED (SELECT a AS s, b AS d FROM canon UNION ALL SELECT b, a FROM canon),
deg AS MATERIALIZED (SELECT s, count(*) AS dg FROM sym GROUP BY s),
w AS (
  SELECT x.d AS a, y.d AS b, count(*) AS cn
  FROM sym x JOIN sym y ON y.s = x.s AND y.d > x.d
  JOIN deg dc ON dc.s = x.s AND dc.dg <= {CN_MAX_DEG}
  GROUP BY x.d, y.d
),
nonadj AS (SELECT w.a, w.b, w.cn FROM w ANTI JOIN canon c ON c.a = w.a AND c.b = w.b)
SELECT a AS src, b AS dst, cn FROM nonadj
ORDER BY cn DESC, a, b LIMIT {CN_TOP}"""


def q_triangle_count(sf_dir: str):
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    # 4P closure tasks: the broadcast regime's wedge work is balanced by
    # cumulative size, so more tasks = better core usage at zero cost
    return triangle_count(_edges_triangle(sf_dir), num_partitions=4 * P)


def q_triangles_per_vertex(sf_dir: str):
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    return triangle_count(
        _edges_triangle(sf_dir), num_partitions=4 * P, per_vertex=True
    )


def q_transitivity(sf_dir: str):
    """Global clustering coefficient (transitivity) of the co-occurrence
    graph: 3 * triangles / wedges, wedges = sum C(deg, 2) — both exact
    integers off the triangle pipeline's with_degrees output, one float
    division at the end."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    df = triangle_count(
        _edges_triangle(sf_dir), num_partitions=4 * P,
        per_vertex=True, with_degrees=True,
    ).to_pandas()
    tri = int(df["triangles"].sum()) // 3  # each triangle counted at 3 corners
    deg = df["deg"].to_numpy(np.int64)
    wedges = int((deg * (deg - 1) // 2).sum())
    return pd.DataFrame(
        {
            "triangles": np.array([tri], np.int64),
            "wedges": np.array([wedges], np.int64),
            "transitivity": [
                round_half_away(float(3 * tri) / float(wedges), 6)
            ],
        }
    )


_SQL_TRANSITIVITY = f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS d FROM (
          SELECT a AS vertex FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vertex),
w AS (SELECT SUM(d * (d - 1) // 2) AS wedges FROM deg),
tri AS (SELECT CAST(count(*) AS BIGINT) AS n
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT tri.n AS triangles, CAST(w.wedges AS BIGINT) AS wedges,
       ROUND(CAST(3 * tri.n AS DOUBLE) / CAST(w.wedges AS DOUBLE), 6)
         AS transitivity
FROM tri, w
"""


def q_scan_stat(sf_dir: str):
    """Scan statistic (graph anomaly detection, the StreamSpot theme):
    scan1(v) = edges in the closed 1-hop neighborhood = deg(v) +
    triangles(v) — rides the oriented-wedge triangle pipeline's
    with_degrees output, one added vectorized column."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    ds = triangle_count(
        _edges_triangle(sf_dir), num_partitions=4 * P,
        per_vertex=True, with_degrees=True,
    )

    def scan(t: pa.Table) -> pa.Table:
        return t.append_column(
            "scan1", pc.add(t["deg"], t["triangles"])
        )

    return ds.map_batches(scan, batch_format="pyarrow")


_SQL_SCAN_STAT = f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS deg FROM (
          SELECT a AS vertex FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vertex),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tv AS (SELECT vertex, CAST(count(*) AS BIGINT) AS triangles FROM (
         SELECT x AS vertex FROM tri UNION ALL
         SELECT y FROM tri UNION ALL
         SELECT z FROM tri
       ) GROUP BY vertex)
SELECT d.vertex, COALESCE(t.triangles, 0) AS triangles, d.deg,
       d.deg + COALESCE(t.triangles, 0) AS scan1
FROM deg d LEFT JOIN tv t ON t.vertex = d.vertex
"""


def q_edge_support(sf_dir: str):
    """Per-edge triangle support (the k-truss metric) on the co-occurrence
    graph — rides the oriented-wedge triangle pipeline with per_edge
    output."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    return triangle_count(
        _edges_triangle(sf_dir), num_partitions=4 * P, per_edge=True
    )


def q_edge_jaccard(sf_dir: str):
    """Per-edge neighborhood Jaccard (tie strength) for every
    triangle-participating edge of the co-occurrence graph:
    |N(a) ∩ N(b)| / |N(a) ∪ N(b) − {a,b}| = support / (da + db − 2 −
    support) — the embeddedness score strong-tie detection thresholds.
    Rides the per-edge triangle pipeline (support) plus its with_degrees
    twin; the merge is over the triangle-edge table (≤ the support table,
    far below |E|)."""
    from sbustreamspot_core_ray.pipelines.superstep import triangle_count

    sup = triangle_count(
        _edges_triangle(sf_dir), num_partitions=4 * P, per_edge=True
    ).to_pandas()
    deg = (
        triangle_count(
            _edges_triangle(sf_dir), num_partitions=4 * P,
            per_vertex=True, with_degrees=True,
        )
        .to_pandas()
        .set_index("vertex")["deg"]
    )
    da = sup["a"].map(deg).to_numpy(np.int64)
    db = sup["b"].map(deg).to_numpy(np.int64)
    s = sup["support"].to_numpy(np.int64)
    sup["jaccard"] = round_half_away(
        s.astype(np.float64) / (da + db - 2 - s), 6
    )
    return sup.sort_values(["a", "b"]).reset_index(drop=True)


_SQL_EDGE_JACCARD = f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS d FROM (
          SELECT a AS vertex FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vertex),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
sup AS (SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
          SELECT x AS a, y AS b FROM tri UNION ALL
          SELECT x, z FROM tri UNION ALL
          SELECT y, z FROM tri
        ) GROUP BY a, b)
SELECT s.a, s.b, s.support,
       ROUND(CAST(s.support AS DOUBLE)
             / (da.d + db.d - 2 - s.support), 6) AS jaccard
FROM sup s JOIN deg da ON da.vertex = s.a JOIN deg db ON db.vertex = s.b
ORDER BY s.a, s.b
"""


KTRUSS_K = 4
KTRUSS_SQL_ROUNDS = 20  # measured 15 peel rounds at sf0.01; extra are no-ops


def q_ktruss(sf_dir: str):
    """k-truss subgraph (k=4): iterative support peeling to the fixpoint
    on the co-occurrence graph (15 rounds at sf0.01, 66 surviving
    edges)."""
    from sbustreamspot_core_ray.pipelines.superstep import ktruss

    return ktruss(_edges_triangle(sf_dir), k=KTRUSS_K, num_partitions=4 * P)


def _ktruss_sql(k: int = KTRUSS_K, rounds: int = KTRUSS_SQL_ROUNDS) -> str:
    """Unrolled peeling oracle (the kcore pattern): each round recomputes
    triangle support over the previous survivors and keeps support >=
    k-2. MATERIALIZED throughout — each round references the previous CTE
    three times, so default inlining would explode the plan 3^rounds."""
    ctes = [
        f"de AS MATERIALIZED ({_SQL_EDGES_TRI})",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,"
        " greatest(src, dst) AS b FROM de WHERE src <> dst)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
            f" FROM e{p} e1 JOIN e{p} e2 ON e1.b = e2.a"
            f" JOIN e{p} e3 ON e3.a = e1.a AND e3.b = e2.b)"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT a, b, count(*) AS sup FROM ("
            f"SELECT x AS a, y AS b FROM t{r} UNION ALL"
            f" SELECT x, z FROM t{r} UNION ALL SELECT y, z FROM t{r}"
            f") GROUP BY a, b HAVING count(*) >= {k - 2})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a, b, sup AS support FROM e{rounds}"
    )


def q_lsh_isolated(sf_dir: str):
    """C2 anti-join (SQL-mirrored): typed-graph sketches split into an index
    (gid < 40) and queries (gid >= 40); a query gid is isolated iff none of
    its band buckets exists in the index."""
    from sbustreamspot_core_ray.stages.lsh import hash_bands, isolated_gids
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
    from sbustreamspot_core_ray.stages.sketch import construct_streamhash_sketches

    sk = construct_streamhash_sketches(
        construct_shingle_vectors(_edges_typed(sf_dir), SHINGLE_C), SHINGLE_C
    ).materialize()
    bands = hash_bands(sk).materialize()
    idx = bands.filter(expr="gid < 40")
    qry = bands.filter(expr="gid >= 40")
    return isolated_gids(qry, idx, num_partitions=4)


def q_similarity_report(sf_dir: str):
    """H10 all-pairs validation report over the StreamSpot 12-edge fixture
    graphs — the reference's full column set (main.cpp:584-605): exact
    cosine, angular similarity, StreamHash sim/estimate/error, and the
    seed-101 exact-SimHash sim/estimate."""
    from sbustreamspot_core_ray.sources.edges import streamspot_fixture_edges
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
    from sbustreamspot_core_ray.stages.sketch import (
        compute_similarities,
        construct_simhash_sketches,
        construct_streamhash_sketches,
    )

    sh = construct_shingle_vectors(streamspot_fixture_edges(), 5).materialize()
    sk = construct_streamhash_sketches(sh, 5)
    sm = construct_simhash_sketches(sh, 5)
    out = compute_similarities(sh, sk, simhash_sketches=sm).to_pandas()
    for col in out.columns:
        if col not in ("gid_a", "gid_b"):
            out[col] = round_half_away(out[col], 6)
    return out


def q_anomaly_scenarios(sf_dir: str):
    """The CLI's per-scenario anomaly evaluation kernel (SQL-mirrored):
    seed-101 SimHash LSH isolation over the typed TPC-H graph, indexed on
    the normal gids (lower half), aggregated per scenario. NaN ratios are
    mapped to the -1.0 sentinel so both sides hash identically."""
    from sbustreamspot_core_ray.cli import anomaly_report

    rep = anomaly_report(_edges_typed(sf_dir), SHINGLE_C)
    for col in ("precision", "recall"):
        rep[col] = round_half_away(rep[col].fillna(-1.0), 6)
    for col in ("scenario", "n_graphs", "n_attack", "n_flagged", "true_pos"):
        rep[col] = rep[col].astype(np.int64)
    return rep


def q_anomaly_scenarios_injected(sf_dir: str):
    """Non-sentinel-branch witness for the --evaluate surface
    (main.cpp:531-557): the edge types of gids >= 48 are deterministically
    scrambled (lowercase -> uppercase), making those five attack graphs
    structurally alien, so n_flagged > 0 and the precision/recall
    real-ratio arithmetic (1.0 and 5/27 at every sf) is driver-covered
    instead of the -1.0 sentinel the unperturbed fixture produces."""
    from sbustreamspot_core_ray.cli import anomaly_report

    def scramble(t: pa.Table) -> pa.Table:
        gid = t["gid"].to_numpy(zero_copy_only=False)
        et = t["e_type"].to_numpy(zero_copy_only=False).copy()
        m = gid >= 48
        et[m] = et[m] - 32  # ascii lower -> upper, the SQL's upper(et)
        return t.set_column(
            t.schema.get_field_index("e_type"), "e_type",
            pa.array(et, pa.uint8()),
        )

    rep = anomaly_report(
        _edges_typed(sf_dir).map_batches(scramble, batch_format="pyarrow"),
        SHINGLE_C,
    )
    for col in ("precision", "recall"):
        rep[col] = round_half_away(rep[col].fillna(-1.0), 6)
    for col in ("scenario", "n_graphs", "n_attack", "n_flagged", "true_pos"):
        rep[col] = rep[col].astype(np.int64)
    return rep


def q_shingles(sf_dir: str):
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors

    return construct_shingle_vectors(_edges_typed(sf_dir), SHINGLE_C)


def q_streamhash_sketches(sf_dir: str):
    """(gid, sketch_hex, pop) for the typed TPC-H graph. SQL-mirrored: the
    seeded H family is embedded as constants and hashmulti/projection/sign
    are recomputed in DuckDB HUGEINT arithmetic."""
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
    from sbustreamspot_core_ray.stages.sketch import construct_streamhash_sketches

    sk = construct_streamhash_sketches(
        construct_shingle_vectors(_edges_typed(sf_dir), SHINGLE_C), SHINGLE_C
    )

    def fmt(t: pa.Table) -> pa.Table:
        raw = [bytes(b) for b in t["sketch"].to_pylist()]
        return pa.table(
            {
                "gid": t["gid"],
                "sketch_hex": pa.array([b.hex() for b in raw]),
                "pop": pa.array(
                    [int(np.unpackbits(np.frombuffer(b, np.uint8)).sum()) for b in raw],
                    pa.int64(),
                ),
            }
        )

    return sk.map_batches(fmt, batch_format="pyarrow")


def q_simhash_sketches(sf_dir: str):
    """H6/H7 exact-SimHash sketches (independent Rademacher family, seed
    101) over the typed TPC-H graph; SQL-mirrored like streamhash."""
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
    from sbustreamspot_core_ray.stages.sketch import construct_simhash_sketches

    sk = construct_simhash_sketches(
        construct_shingle_vectors(_edges_typed(sf_dir), SHINGLE_C), SHINGLE_C
    )

    def fmt(t: pa.Table) -> pa.Table:
        raw = [bytes(b) for b in t["sketch"].to_pylist()]
        return pa.table(
            {
                "gid": t["gid"],
                "sketch_hex": pa.array([b.hex() for b in raw]),
            }
        )

    return sk.map_batches(fmt, batch_format="pyarrow")


def q_incremental_sketches(sf_dir: str):
    """Rows-only: F3 incremental chunk-delta sketches on the reference's
    12-edge fixture fed as a 3-batch stream (parity with the batch
    recompute is the reference's own invariant, tested in
    tests/test_incremental.py)."""
    from sbustreamspot_core_ray.sources.edges import streamspot_fixture_table
    from sbustreamspot_core_ray.stages.incremental import IncrementalSketcher

    t = streamspot_fixture_table()
    inc = IncrementalSketcher(num_parts=2, chunk_length=5)
    for lo, sz in ((0, 5), (5, 4), (9, 3)):
        inc.feed(t.slice(lo, sz))
    out = inc.sketches().to_pandas()
    return pa.table(
        {
            "gid": pa.array(out["gid"].to_numpy(), pa.int64()),
            "sketch_hex": pa.array([bytes(b).hex() for b in out["sketch"]]),
        }
    )


def q_lsh_clusters(sf_dir: str):
    """LSH co-bucket clustering of the typed-graph sketches (SQL-mirrored:
    band table + star pairs + recursive-CTE connected components)."""
    from sbustreamspot_core_ray.stages.lsh import lsh_clusters
    from sbustreamspot_core_ray.stages.shingle import construct_shingle_vectors
    from sbustreamspot_core_ray.stages.sketch import construct_streamhash_sketches

    sk = construct_streamhash_sketches(
        construct_shingle_vectors(_edges_typed(sf_dir), SHINGLE_C), SHINGLE_C
    )
    return lsh_clusters(sk, num_parts=4)


def q_streamspot_snapshots(sf_dir: str):
    """Rows-only: the full bootstrap + windowed scoring pipeline on the
    reference's 12-edge fixture (deterministic)."""
    from sbustreamspot_core_ray.pipelines.streamspot import (
        bootstrap_pipeline,
        score_stream,
    )
    from sbustreamspot_core_ray.sources.bootstrap import fixture_bootstrap
    from sbustreamspot_core_ray.sources.edges import streamspot_fixture_edges

    ds = streamspot_fixture_edges()
    train = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t["gid"], 1)), batch_format="pyarrow"
    )
    test = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["gid"], 2)), batch_format="pyarrow"
    )
    state = bootstrap_pipeline(train, fixture_bootstrap(), 10)
    snaps = score_stream(state, test, 10, interval=4)
    snaps["anomaly_score"] = round_half_away(snaps["anomaly_score"], 6)
    return snaps


def q_q1_revenue(sf_dir: str):
    """TPC-H Q1-shaped rollup. Revenue is summed in exact integer 1e-4
    units: the per-row product p = l_extendedprice * (1 - l_discount) is
    the identical IEEE expression on both sides, floor(p*1e4 + 0.5) the
    identical quantization, and the int64 sum is order-independent — so
    the rounded output is bit-identical to the SQL mirror."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def pre(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "revenue": units,
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = round_half_away(out["sum_qty"], 2)
    out["sum_revenue"] = round_half_away(
        out["sum_revenue"].astype(np.float64) / 10000.0, 2
    )
    return out


IVM_DEL_MOD = 97
IVM_INS_MOD = 89


def q_ivm_refresh(sf_dir: str):
    """Incremental view maintenance of the Q1 rollup under a deterministic
    refresh batch (TPC-H RF-style: DELETE lineitems with l_orderkey %
    IVM_DEL_MOD == 0, INSERT re-keyed copies of l_orderkey % IVM_INS_MOD
    == 0): the maintained result is base + insert-partials −
    delete-partials, folded per group in ONE corpus pass (each batch emits
    all/del/ins partial columns) — never a rescan of the modified
    relation. The oracle recomputes from the modified relation directly,
    so value parity proves the combine algebra is a correct IVM."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def pre(t: pa.Table) -> pa.Table:
        import pandas as pd

        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        isdel = (ok % IVM_DEL_MOD == 0).astype(np.int64)
        isins = (ok % IVM_INS_MOD == 0).astype(np.int64)
        df = pd.DataFrame(
            {
                "rf": np.asarray(
                    t["l_returnflag"].to_numpy(zero_copy_only=False), object
                ),
                "ls": np.asarray(
                    t["l_linestatus"].to_numpy(zero_copy_only=False), object
                ),
                "q_all": qty,
                "u_all": units,
                "n_all": np.ones(len(ok), np.int64),
                "q_del": qty * isdel,
                "u_del": units * isdel,
                "n_del": isdel,
                "q_ins": qty * isins,
                "u_ins": units * isins,
                "n_ins": isins,
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["rf", "ls"], as_index=False).sum(),
            preserve_index=False,
        )

    g = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby(["rf", "ls"])
        .sum(
            ["q_all", "u_all", "n_all", "q_del", "u_del", "n_del",
             "q_ins", "u_ins", "n_ins"]
        )
        .to_pandas()
    )
    qty = (
        g["sum(q_all)"] - g["sum(q_del)"] + g["sum(q_ins)"]
    ).to_numpy(np.int64)
    units = (
        g["sum(u_all)"] - g["sum(u_del)"] + g["sum(u_ins)"]
    ).to_numpy(np.int64)
    n = (
        g["sum(n_all)"] - g["sum(n_del)"] + g["sum(n_ins)"]
    ).to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "l_returnflag": g["rf"],
            "l_linestatus": g["ls"],
            "sum_qty": round_half_away(qty.astype(np.float64), 2),
            "sum_revenue": round_half_away(
                units.astype(np.float64) / 10000.0, 2
            ),
            "n_rows": n,
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True
    )


_SQL_IVM_REFRESH = f"""
WITH mod AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_discount
  FROM lineitem WHERE l_orderkey % {IVM_DEL_MOD} <> 0
  UNION ALL
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, l_discount
  FROM lineitem WHERE l_orderkey % {IVM_INS_MOD} = 0
)
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0
                                 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0,
             2) AS sum_revenue,
       count(*) AS n_rows
FROM mod GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_events_windowed(sf_dir: str):
    """Tumbling 1h windows. sum_value summed in exact integer cents
    (order-independent; see stages/events.py quantize_units) so the value
    is bit-identical to the SQL mirror regardless of block order."""
    from sbustreamspot_core_ray.stages.events import quantize_units

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def pre(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())  # epoch micros
        hour = pc.divide(us, pa.scalar(3_600_000_000, pa.int64()))
        units = quantize_units(t["value"].to_numpy(zero_copy_only=False), 100)
        return pa.table(
            {"event_type": t["event_type"], "hour_bucket": hour, "value": units}
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ev.map_batches(pre, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"] / 100.0
    return out


def q_sessionize(sf_dir: str):
    """Gap-window sessionization. sum_value is summed in exact integer
    cents (value_scale=100 — the synthetic `value` column is cent-exact) so
    the int64 sum is order-independent and the final /100.0 is a single
    IEEE division, bit-identical to the SQL mirror."""
    from sbustreamspot_core_ray.stages.events import sessionize

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return sessionize(ev, num_parts=8, value_scale=100).to_pandas()


COVERAGE_WINDOW_US = 300_000_000  # 5-minute activity interval per event


def q_interval_coverage(sf_dir: str):
    """Per-user interval-union coverage: total microseconds covered by the
    union of [ts, ts+5min) activity intervals. Equal-length intervals make
    the union telescope (sum of gap-clipped diffs + one trailing window),
    so the kernel is one lexsort + np.diff per hashed-user partition —
    integer microseconds end-to-end."""
    from sbustreamspot_core_ray.stages.events import interval_coverage

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return interval_coverage(
        ev, window_us=COVERAGE_WINDOW_US, num_parts=8
    ).to_pandas()


_SQL_INTERVAL_COVERAGE = f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN nxt IS NULL THEN {COVERAGE_WINDOW_US}
                ELSE LEAST(nxt - us, {COVERAGE_WINDOW_US}) END) AS BIGINT)
         AS covered_us,
       COUNT(*) AS n_events
FROM e GROUP BY user_id"""


DECAY_CAP_DAYS = 40  # ages past this many half-lives contribute 0


def q_decayed_counts(sf_dir: str):
    """Per-user exponentially time-decayed event counter (half-life = 1
    day, base 2): each event weighs 2^(-age_days), carried as exact
    integer units 1 << (cap - age) so the int64 sum is order-independent
    and bit-identical to the SQL bit-shift mirror; one user-key sum, no
    sort."""
    from sbustreamspot_core_ray.stages.events import decayed_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return decayed_counts(
        ev, half_life_days=1, cap_days=DECAY_CAP_DAYS
    ).to_pandas()


_SQL_DECAYED_COUNTS = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
h AS (SELECT max(day) AS h FROM d),
s AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN (h.h - day) <= {DECAY_CAP_DAYS}
                  THEN (1::BIGINT << CAST({DECAY_CAP_DAYS} - (h.h - day) AS INT))
                  ELSE 0 END) AS BIGINT) AS decay_units
  FROM d, h GROUP BY user_id
)
SELECT user_id, decay_units,
       CAST(decay_units AS DOUBLE) / {1 << 40} AS decayed
FROM s"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str):
    """Ordered-funnel analysis (view -> click -> purchase): greedy
    earliest-completion per user, all-integer outputs (microsecond
    timestamps), one user-key shuffle + vectorized K-step minimum scans."""
    from sbustreamspot_core_ray.stages.events import funnel

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"]
    )
    return funnel(ev, steps=FUNNEL_STEPS, num_parts=8)


def _funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """The greedy MIN/>= chain in plain SQL: s_k = per-user MIN(ts of step
    k at-or-after s_{k-1})."""
    s1, s2, s3 = steps
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
s1 AS (SELECT user_id, MIN(us) AS u1 FROM e WHERE event_type = '{s1}'
       GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.us) AS u2 FROM e JOIN s1 ON s1.user_id = e.user_id
       WHERE e.event_type = '{s2}' AND e.us >= s1.u1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.us) AS u3 FROM e JOIN s2 ON s2.user_id = e.user_id
       WHERE e.event_type = '{s3}' AND e.us >= s2.u2 GROUP BY e.user_id)
SELECT s1.user_id,
       CASE WHEN s3.u3 IS NOT NULL THEN 3
            WHEN s2.u2 IS NOT NULL THEN 2 ELSE 1 END AS max_step,
       s1.u1 AS first_us,
       COALESCE(s3.u3, s2.u2, s1.u1) AS last_us
FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
LEFT JOIN s3 ON s3.user_id = s2.user_id"""


def q_asof_attribution(sf_dir: str):
    """As-of join (attribution): each purchase matched to the user's latest
    prior click; SQL-mirrored with an explicit rank-1 window (deterministic
    tie-break = max event_id per (user, ts) on the right side)."""
    from sbustreamspot_core_ray.stages.events import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return asof_join(ev, num_parts=8)


def q_interval_join(sf_dir: str):
    """Range/interval join: same-user purchases within 10 minutes after
    each error event (count + cent-exact value sum per incident window)."""
    from sbustreamspot_core_ray.stages.events import interval_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    return interval_join(ev, num_parts=8)


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate (1h windows every 15min) over the events
    stream — the overlapping-window generalization of events_windowed."""
    from sbustreamspot_core_ray.stages.events import hopping_window_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return hopping_window_agg(ev, value_scale=100).to_pandas()


def q_top_users(sf_dir: str):
    """Top-20 users by summed value, in exact integer cents (value_scale)
    so the totals — and therefore the desc sort and the LIMIT cut — are
    bit-identical to the SQL mirror."""
    from sbustreamspot_core_ray.stages.events import top_k_by_sum

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    return top_k_by_sum(ev, k=20, value_scale=100)


def q_event_pmi(sf_dir: str):
    """User-level PMI between event-type pairs in integer nanonats (one
    IEEE divide + one libm ln, mirrored)."""
    from sbustreamspot_core_ray.stages.events import event_type_pmi

    return event_type_pmi(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        num_parts=P,
    )


def q_value_mad(sf_dir: str):
    """Robust per-type outliers: integer-cents median, MAD, and
    |v - med| > 3*MAD counts from one histogram."""
    from sbustreamspot_core_ray.stages.events import grouped_mad

    return grouped_mad(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
    )


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of event types (order-free integer
    nanonat decomposition; one ln + one divide mirrored)."""
    from sbustreamspot_core_ray.stages.events import user_entropy

    return user_entropy(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        num_parts=P,
    )


def q_event_transitions(sf_dir: str):
    """Markov bigram counts of consecutive event types per user (the LEAD
    window pattern): one hash(user) shuffle, vectorized shifted-compare
    kernel, per-partition partial counts folded by a tiny final groupby."""
    from sbustreamspot_core_ray.stages.events import transition_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    return transition_counts(ev, num_parts=P)


def q_top_orders_per_customer(sf_dir: str):
    """Top-3 orders per customer by (o_totalprice DESC, o_orderkey) — the
    ROW_NUMBER()-per-group pattern: one hash(custkey) shuffle + a
    per-partition lexsort/run-rank scan. Values are passthrough parquet
    doubles, so the comparison-only kernel is bit-exact by construction."""
    from sbustreamspot_core_ray.stages.relational import top_n_per_group

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )
    return top_n_per_group(
        orders, "o_custkey", "o_totalprice", "o_orderkey", n=3, num_parts=P
    )


def q_customers_no_urgent(sf_dir: str):
    """Relational NOT EXISTS: customers with no 1-URGENT order. The
    priority predicate is pushed into the parquet read (row-group
    pruning); the build side is the distinct matching custkey set; the
    probe is a streaming hash left-outer join + null filter."""
    from sbustreamspot_core_ray.stages.relational import anti_join_keys

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    ).rename_columns({"c_custkey": "custkey"})
    ords = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
        )
        .filter(expr="o_orderpriority == '1-URGENT'")
        .select_columns(["o_custkey"])
        .rename_columns({"o_custkey": "custkey"})
    )
    out = anti_join_keys(cust, ords, "custkey", num_partitions=P)
    return out.rename_columns({"custkey": "c_custkey"}).select_columns(
        ["c_custkey", "c_name", "c_acctbal"]
    )


def _nation_region_dim(sf_dir: str) -> pa.Table:
    """25-row nationkey -> (n_name, r_name) dim, read driver-side (fixed
    size regardless of sf) and broadcast via ray.put inside the stage."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    return nat.join(reg, keys="n_regionkey", right_keys="r_regionkey").select(
        ["n_nationkey", "n_name", "r_name"]
    )


def q_revenue_by_nation(sf_dir: str):
    """Star-schema rollup: lineitem revenue (exact 1e-4 integer units,
    combiner-shrunk per supplier before the shuffle) x supplier dim x
    broadcast 25-row nation/region lookup."""
    from sbustreamspot_core_ray.stages.relational import revenue_by_nation

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    out = revenue_by_nation(li, supp, _nation_region_dim(sf_dir), num_partitions=P)
    df = out.to_pandas()
    df["revenue"] = round_half_away(df["units"].astype(np.float64) / 10000.0, 2)
    return df[["r_name", "n_name", "revenue"]]


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF_US = 883_612_800_000_000  # 1998-01-01 (mid-range of o_orderdate)
Q3_TOPN = 10


def q_q3_shipping(sf_dir: str):
    """TPC-H-Q3-shaped shipping priority: segment semi-join x date-split
    lineitem/orders join, exact integer revenue units, per-block partial
    top-10 + driver fold on a bounded table."""
    from sbustreamspot_core_ray.stages.relational import shipping_priority

    return shipping_priority(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ),
        segment=Q3_SEGMENT,
        cutoff_us=Q3_CUTOFF_US,
        num_partitions=P,
        topn=Q3_TOPN,
    )


COPURCHASE_TOPN = 100
COPURCHASE_MIN = 2


def q_weighted_median(sf_dir: str):
    """Exact quantity-weighted median extended price per return flag:
    cent-quantized bounded-domain histogram fold, int64 cumulative
    crossing at ceil(total/2)."""
    from sbustreamspot_core_ray.stages.relational import weighted_median

    return weighted_median(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice", "l_quantity"],
        ),
        num_parts=P,
    )


_SQL_WEIGHTED_MEDIAN = """
WITH k AS (
  SELECT l_returnflag AS grp,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT grp, SUM(w) AS tot FROM k GROUP BY grp),
c AS (SELECT grp, cents, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY cents) AS cum
      FROM k)
SELECT c.grp, c.cents AS median_cents, CAST(t.tot AS BIGINT) AS total_weight,
       ROUND(c.cents / 100.0, 2) AS wmedian
FROM c JOIN t ON t.grp = c.grp
WHERE c.cum >= (t.tot + 1) // 2
QUALIFY row_number() OVER (PARTITION BY c.grp ORDER BY c.cents) = 1
ORDER BY c.grp
"""


def q_copurchase_pairs(sf_dir: str):
    """Market-basket pair mining: top-100 part pairs co-occurring in the
    most orders, one orderkey shuffle + triangular basket enumeration +
    combined pair counts."""
    from sbustreamspot_core_ray.stages.relational import copurchase_pairs

    return copurchase_pairs(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ),
        num_partitions=P,
        min_count=COPURCHASE_MIN,
        topn=COPURCHASE_TOPN,
    )


def _edges_copurchase(sf_dir: str) -> ray.data.Dataset:
    """Distinct co-purchase part-pair edges (least, greatest per order):
    ONE hash(orderkey) shuffle, triangular basket decode per partition,
    within-partition pair dedup (k4_count's driver prep uniques the packed
    pairs globally, so no second shuffle)."""
    import pandas as pd

    from sbustreamspot_core_ray.functions.hashing import part_of

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def tag(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": ok,
                "pk": pc.cast(t["l_partkey"], pa.int64()),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def pairs(df: "pd.DataFrame") -> pa.Table:
        ok = df["ok"].to_numpy()
        pk = df["pk"].to_numpy()
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        )
        ok, pk = ok[keep], pk[keep]
        n = len(ok)
        empty = pa.table(
            {
                "src": pa.array(np.empty(0, np.int64)),
                "dst": pa.array(np.empty(0, np.int64)),
            }
        )
        if n == 0:
            return empty
        run_end = np.searchsorted(ok, ok, side="right")
        sizes = run_end - np.arange(n) - 1
        tot = int(sizes.sum())
        if tot == 0:
            return empty
        rep = np.repeat(np.arange(n), sizes)
        within = np.arange(tot) - np.concatenate([[0], np.cumsum(sizes)])[rep]
        gather = rep + 1 + within
        x, y = pk[rep], pk[gather]
        lo = np.minimum(x, y).astype(np.uint64)
        hi = np.maximum(x, y).astype(np.uint64)
        uq = np.unique((lo << np.uint64(32)) | hi)
        return pa.table(
            {
                "src": pa.array((uq >> np.uint64(32)).astype(np.int64)),
                "dst": pa.array(
                    (uq & np.uint64(0xFFFFFFFF)).astype(np.int64)
                ),
            }
        )

    return (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(pairs, batch_format="pandas")
    )


def q_k4_count(sf_dir: str):
    """Exact 4-clique census of the part co-purchase graph: two rounds of
    the degree-oriented wedge-closure kernel (triangles, then third-corner
    pairs probed against the edge set; hits // 6)."""
    from sbustreamspot_core_ray.pipelines.superstep import k4_count

    return k4_count(_edges_copurchase(sf_dir), num_tasks=4 * P)


_SQL_K4 = """
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (SELECT DISTINCT least(x.p, y.p) AS a, greatest(x.p, y.p) AS b2
      FROM b x JOIN b y ON x.o = y.o AND x.p < y.p),
tri AS (SELECT e1.a AS a, e1.b2 AS b, e2.b2 AS c
        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b2 > e1.b2
        JOIN e e3 ON e3.a = e1.b2 AND e3.b2 = e2.b2)
SELECT CAST(COUNT(*) AS BIGINT) AS k4
FROM tri t
JOIN e x ON x.a = t.c
JOIN e y ON y.a = t.b AND y.b2 = x.b2
JOIN e z ON z.a = t.a AND z.b2 = x.b2
"""


TRIPLE_ITEM_MIN = 3
TRIPLE_MIN = 2
TRIPLE_TOPN = 100


def q_frequent_triples(sf_dir: str):
    """Apriori 3-itemset mining: top-100 supplier triples co-occurring in
    >= 2 orders, candidate space pruned by global item support (>= 3
    orders) before the basket triple fan-out — one orderkey shuffle,
    broadcast frequent-item set, two vectorized repeat passes. Suppliers
    (not parts): the denser key space gives real repeat counts at every
    sf."""
    from sbustreamspot_core_ray.stages.relational import frequent_triples

    return frequent_triples(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
        ).map_batches(
            lambda t: t.rename_columns(["l_orderkey", "l_partkey"]),
            batch_format="pyarrow",
        ),
        num_partitions=P,
        item_min=TRIPLE_ITEM_MIN,
        min_count=TRIPLE_MIN,
        topn=TRIPLE_TOPN,
    )


_SQL_FREQUENT_TRIPLES = f"""
WITH d AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS pk FROM lineitem),
freq AS (SELECT pk FROM d GROUP BY pk HAVING count(*) >= {TRIPLE_ITEM_MIN}),
df AS MATERIALIZED (SELECT ok, pk FROM d JOIN freq USING (pk)),
t AS (
  SELECT a.pk AS p1, b.pk AS p2, c.pk AS p3, COUNT(*) AS cnt
  FROM df a JOIN df b ON b.ok = a.ok AND b.pk > a.pk
            JOIN df c ON c.ok = a.ok AND c.pk > b.pk
  GROUP BY 1, 2, 3
)
SELECT p1, p2, p3, cnt FROM t WHERE cnt >= {TRIPLE_MIN}
ORDER BY cnt DESC, p1, p2, p3 LIMIT {TRIPLE_TOPN}
"""


def q_snapshot_diff(sf_dir: str):
    """Change-data-capture diff between two deterministic snapshots of
    orders (A = keys not divisible by 7; B = keys not divisible by 11,
    with prices of keys divisible by 3 bumped by exactly 1.0 — float-exact
    at TPC-H magnitudes): emits insert/delete/update rows with old/new
    prices. One co-partitioning shuffle + a sorted-membership kernel."""
    from sbustreamspot_core_ray.stages.relational import snapshot_diff

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).materialize()

    def snap_a(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        k = t["o_orderkey"].to_numpy()
        return t.filter(pa.array(k % 7 != 0))

    def snap_b(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        v = t["o_totalprice"].to_numpy(zero_copy_only=False).copy()
        v[k % 3 == 0] += 1.0
        out = pa.table({"o_orderkey": k, "o_totalprice": v})
        return out.filter(pa.array(k % 11 != 0))

    return snapshot_diff(
        orders.map_batches(snap_a, batch_format="pyarrow"),
        orders.map_batches(snap_b, batch_format="pyarrow"),
        key_col="o_orderkey",
        val_col="o_totalprice",
        num_partitions=P,
    )


_SQL_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 7 <> 0
),
b AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS v
  FROM orders WHERE o_orderkey % 11 <> 0
)
SELECT COALESCE(a.k, b.k) AS o_orderkey,
       CASE WHEN a.k IS NULL THEN 'insert'
            WHEN b.k IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       COALESCE(a.v, -1.0) AS old_val,
       COALESCE(b.v, -1.0) AS new_val
FROM a FULL OUTER JOIN b ON b.k = a.k
WHERE a.k IS NULL OR b.k IS NULL OR a.v <> b.v"""


BF_MAX_DEG = 256


def q_butterflies(sf_dir: str):
    """Bipartite-motif census of the order–part graph: distinct edges,
    per-side wedge sums, and butterflies (K_{2,2} — the bipartite
    triangle analog). Pair enumeration runs on the side with the smaller
    wedge sum (decided from two cheap degree aggregates) so the hub side
    never explodes the pair volume, and centers above BF_MAX_DEG on the
    chosen side contribute no pairs (drop-accounted in the
    dropped_centers column; the SQL oracle applies the identical cap on
    the identically-chosen side). One hash(center) + one hash(pair)
    shuffle, integer counts end-to-end."""
    from sbustreamspot_core_ray.stages.relational import butterfly_count

    return butterfly_count(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ),
        num_partitions=P,
        max_deg=BF_MAX_DEG,
    )


def q_butterfly_cap_witness(sf_dir: str):
    """Witness for the BF_MAX_DEG hub cap (the linkpred_cap_recall
    pattern): the capped census against the uncapped EXACT census on the
    same graph — the cap's loss is measured, never assumed. One row
    (exact_bf, capped_bf, dropped_centers)."""
    from sbustreamspot_core_ray.stages.relational import butterfly_count

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    capped = butterfly_count(li, num_partitions=P, max_deg=BF_MAX_DEG)
    exact = butterfly_count(li, num_partitions=P)
    return pd.DataFrame(
        {
            "exact_bf": np.array([exact["butterflies"][0].as_py()], np.int64),
            "capped_bf": np.array(
                [capped["butterflies"][0].as_py()], np.int64
            ),
            "dropped_centers": np.array(
                [capped["dropped_centers"][0].as_py()], np.int64
            ),
        }
    )


_SQL_BUTTERFLY_CTES = f"""
e AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
do_ AS MATERIALIZED (SELECT o AS k, count(*) AS d FROM e GROUP BY o),
dp AS MATERIALIZED (SELECT p AS k, count(*) AS d FROM e GROUP BY p),
wo AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS w
       FROM do_),
wp AS (SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT) AS w
       FROM dp),
ppo AS (
  SELECT x.p AS a, y.p AS b, count(*) AS c
  FROM e x JOIN e y ON y.o = x.o AND y.p > x.p
  JOIN do_ dc ON dc.k = x.o AND dc.d <= {BF_MAX_DEG}
  GROUP BY 1, 2),
ppp AS (
  SELECT x.o AS a, y.o AS b, count(*) AS c
  FROM e x JOIN e y ON y.p = x.p AND y.o > x.o
  JOIN dp dc ON dc.k = x.p AND dc.d <= {BF_MAX_DEG}
  GROUP BY 1, 2),
bfo AS (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS bf
        FROM ppo),
bfp AS (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS bf
        FROM ppp),
dro AS (SELECT CAST(count(*) AS BIGINT) AS n FROM do_ WHERE d > {BF_MAX_DEG}),
drp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dp WHERE d > {BF_MAX_DEG})"""

_SQL_BUTTERFLIES = f"""
WITH {_SQL_BUTTERFLY_CTES}
SELECT
  (SELECT count(*) FROM e) AS n_edges,
  wo.w AS wedges_order,
  wp.w AS wedges_part,
  CASE WHEN wo.w <= wp.w THEN bfo.bf ELSE bfp.bf END AS butterflies,
  CASE WHEN wo.w <= wp.w THEN dro.n ELSE drp.n END AS dropped_centers
FROM wo, wp, bfo, bfp, dro, drp"""

_SQL_BUTTERFLY_CAP_WITNESS = f"""
WITH {_SQL_BUTTERFLY_CTES},
ppx AS (
  SELECT x.p AS a, y.p AS b, count(*) AS c
  FROM e x JOIN e y ON y.o = x.o AND y.p > x.p GROUP BY 1, 2),
bfx AS (SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT) AS bf
        FROM ppx)
SELECT
  bfx.bf AS exact_bf,
  CASE WHEN wo.w <= wp.w THEN bfo.bf ELSE bfp.bf END AS capped_bf,
  CASE WHEN wo.w <= wp.w THEN dro.n ELSE drp.n END AS dropped_centers
FROM wo, wp, bfo, bfp, dro, drp, bfx"""


Q5_REGION = "ASIA"
Q5_DATE_LO_US = 820_454_400_000_000  # 1996-01-01
Q5_DATE_HI_US = 883_612_800_000_000  # 1998-01-01


def q_q5_local_supplier(sf_dir: str):
    """TPC-H-Q5-shaped local-supplier revenue: three-fact join (orders x
    customer on custkey, lineitem x supplier via broadcast dim, then x
    dated orders on orderkey) with the supplier-nation == customer-nation
    predicate, one region, a 2-year order window; exact integer units."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.stages.relational import local_supplier_revenue

    dim = _nation_region_dim(sf_dir)
    nat = dim.filter(
        pa.compute.equal(dim["r_name"], pa.scalar(Q5_REGION))
    )["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    out = local_supplier_revenue(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        sup,
        nat,
        Q5_DATE_LO_US,
        Q5_DATE_HI_US,
        num_partitions=P,
    ).to_pandas()
    names = dim.to_pandas().set_index("n_nationkey")["n_name"]
    out["n_name"] = out["n_nationkey"].map(names)
    out["revenue"] = round_half_away(out["units"].astype(np.float64) / 10000.0, 2)
    return out[["n_name", "revenue"]]


FILL_WINDOW_US = 90 * 86_400_000_000  # 90 days


def q_fill_rate(sf_dir: str):
    """Per-priority fraction of orders fully shipped within 90 days of
    the order date (one orderkey co-partition shuffle, exact counts)."""
    from sbustreamspot_core_ray.stages.relational import order_fill_rate

    return order_fill_rate(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ),
        window_us=FILL_WINDOW_US,
        num_partitions=P,
    )


def q_supplier_share(sf_dir: str):
    """Per-nation revenue share of the largest supplier (market
    concentration; integer units, one division per nation)."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.stages.relational import supplier_share

    return supplier_share(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        ),
        pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ),
        num_partitions=P,
    )


def q_open_orders(sf_dir: str):
    """Orders open per day (placed, not fully shipped): sweep-line +-1
    deltas + one prefix sum over a calendar-bounded table."""
    from sbustreamspot_core_ray.stages.relational import open_orders_daily

    return open_orders_daily(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ),
        num_partitions=P,
    )


Q4_LO_US = 820_454_400_000_000  # 1996-01-01
Q4_HI_US = 883_612_800_000_000  # 1998-01-01
Q4_FLAG = "R"


def q_q4_priority(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join: orders placed in a 2-year window
    with at least one returned ('R') lineitem, counted per priority.
    Build side combiner-shrunk to distinct orderkeys per block; one
    orderkey co-partition shuffle; exact integer counts."""
    from sbustreamspot_core_ray.stages.relational import priority_semi_counts

    return priority_semi_counts(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"]
        ),
        date_lo_us=Q4_LO_US,
        date_hi_us=Q4_HI_US,
        returnflag=Q4_FLAG,
        num_partitions=P,
    )


Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_q12_priority_class(sf_dir: str):
    """TPC-H-Q12-shaped fact-fact join + conditional aggregation: lineitems
    shipped in a 2-year window classified by their order's priority
    (urgent/high vs rest), counted per linestatus. Lineitem side is
    combiner-shrunk to (orderkey, status, count) partials before the one
    orderkey shuffle; exact integer counts."""
    from sbustreamspot_core_ray.stages.relational import priority_class_counts

    return priority_class_counts(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linestatus", "l_shipdate"],
        ),
        ship_lo_us=Q4_LO_US,
        ship_hi_us=Q4_HI_US,
        high_priorities=Q12_HIGH,
        num_partitions=P,
    )


def q_q14_promo_share(sf_dir: str):
    """TPC-H-Q14-shaped promo revenue share per calendar month: lineitem
    x part co-partition join on partkey (lineitem combiner-shrunk to
    per-(partkey, month) integer unit sums; part side ships one bit per
    key), share division once per month on exact int64 sums."""
    from sbustreamspot_core_ray.stages.relational import promo_revenue_share

    return promo_revenue_share(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ),
        promo_prefix="PROMO",
        num_partitions=P,
    )


HH_TOPK = 5
HH_MIN_WINDOWS = 3


def q_persistent_hitters(sf_dir: str):
    """Persistent heavy hitters: users ranked in the hourly top-K by event
    count for at least M distinct hours — the cross-window frequent-item
    miner (a CMS/top-k stream sketch's exact offline counterpart). Counts
    fold per (hour, user) with block-local combiners and ONE hashed-pair
    shuffle; the per-hour top-K cut reuses top_n_per_group (bounded K rows
    per hour leave the kernel); the window-persistence fold runs on that
    bounded table driver-side. All integers."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.functions.hashing import part_of
    from sbustreamspot_core_ray.stages.relational import top_n_per_group

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hh, hinv = np.unique(hour, return_inverse=True)
        uu, uinv = np.unique(user, return_inverse=True)
        key = hinv.astype(np.int64) * len(uu) + uinv
        uk, kinv = np.unique(key, return_inverse=True)
        n = np.bincount(kinv, minlength=len(uk)).astype(np.int64)
        oh = hh[uk // len(uu)]
        ou = uu[uk % len(uu)]
        # collisions in the shuffle key only co-locate extra rows; the
        # in-partition fold re-groups on the true (hour, user) pair
        return pa.table(
            {
                "hour": oh,
                "user_id": ou,
                "cnt": n,
                "__p": pa.array(part_of(oh * 1_000_003 + ou, P), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["hour", "user_id"], as_index=False)["cnt"].sum()
        return g[["hour", "user_id", "cnt"]]

    counts = (
        ev.map_batches(partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )
    ranked = top_n_per_group(
        counts, "hour", "cnt", "user_id", n=HH_TOPK, num_parts=P
    ).to_pandas()  # <= K rows per hour by construction
    g = (
        ranked.groupby("user_id", as_index=False)
        .size()
        .rename(columns={"size": "n_windows"})
    )
    g = g[g["n_windows"] >= HH_MIN_WINDOWS].reset_index(drop=True)
    g["n_windows"] = g["n_windows"].astype(np.int64)
    return g[["user_id", "n_windows"]]


Q8_REGION = "ASIA"
Q8_NATIONKEY = 12
Q8_TYPE_PREFIX = "STANDARD"


def q_q8_market_share(sf_dir: str):
    """TPC-H-Q8-shaped national market share per order-year: four
    sequential co-partition joins (partkey type semi, suppkey nation
    attach, orderkey year/custkey attach, custkey region semi), each
    combiner-folded before the next shuffle; exact integer units; the
    25-row region dim resolves driver-side."""
    from sbustreamspot_core_ray.stages.relational import market_share

    dim = _nation_region_dim(sf_dir)
    region_keys = (
        dim.filter(pa.compute.equal(dim["r_name"], Q8_REGION))["n_nationkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return market_share(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_orderkey", "l_suppkey",
                "l_extendedprice", "l_discount",
            ],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        type_prefix=Q8_TYPE_PREFIX,
        target_nationkey=Q8_NATIONKEY,
        region_nationkeys=region_keys,
        num_partitions=P,
    )


Q22_RECENT_US = 915_148_800_000_000  # 1999-01-01


def q_q22_idle_balances(sf_dir: str):
    """TPC-H-Q22-shaped 'global-customer-relationship' query: customers
    with above-average positive balance and NO RECENT orders (none since
    the cutoff), counted per nation. The scalar-subquery average comparison is denominator-cleared
    (cents * N > total_cents — exact integer cross-multiply, no float
    average); the no-orders predicate is the house anti-join; per-nation
    partials are bounded (<= 25 rows per batch)."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.stages.relational import anti_join_keys

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partials(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {
                "n": pa.array([int(pos.sum())], pa.int64()),
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
            }
        )

    stats = cust.map_batches(bal_partials, batch_format="pyarrow").take_all()
    n_pos = sum(int(r["n"]) for r in stats)
    s_pos = sum(int(r["s"]) for r in stats)

    def above_avg(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        keep = (cents > 0) & (cents * n_pos > s_pos)
        return pa.table(
            {
                "custkey": pc.cast(t["c_custkey"], pa.int64()).filter(
                    pa.array(keep)
                ),
                "c_nationkey": pa.array(
                    t["c_nationkey"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]
                ),
                "cents": pa.array(cents[keep]),
            }
        )

    candidates = cust.map_batches(above_avg, batch_format="pyarrow")
    def recent_keys(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        f = t.filter(pc.greater_equal(od, pa.scalar(Q22_RECENT_US, pa.int64())))
        return pa.table({"custkey": pc.cast(f["o_custkey"], pa.int64())})

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent_keys, batch_format="pyarrow")
    idle = anti_join_keys(candidates, ords, "custkey", num_partitions=P)

    def nation_partials(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy()
        cents = t["cents"].to_numpy()
        u, inv = np.unique(nk, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        s = np.bincount(inv, weights=cents, minlength=len(u)).astype(np.int64)
        return pa.table({"c_nationkey": u, "n_cust": n, "cents": s})

    parts = idle.map_batches(nation_partials, batch_format="pyarrow").take_all()
    df = pd.DataFrame(parts, columns=["c_nationkey", "n_cust", "cents"])
    g = df.groupby("c_nationkey", as_index=False)[["n_cust", "cents"]].sum()
    return pd.DataFrame(
        {
            "c_nationkey": g["c_nationkey"].to_numpy(np.int64),
            "n_cust": g["n_cust"].to_numpy(np.int64),
            "total_acctbal": round_half_away(
                g["cents"].to_numpy(np.float64) / 100.0, 2
            ),
        }
    )


def q_q13_order_counts(sf_dir: str):
    """TPC-H-Q13-shaped customer-order-count distribution INCLUDING the
    zero class: per order count c, how many customers placed exactly c
    orders. Per-custkey counts fold through one hashed shuffle into
    bounded per-partition histograms; the zero class is total customers
    minus ordering customers (two scalar aggregates) — the left-join-with-
    zeros shape without materializing the join."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.functions.hashing import part_of

    ords = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partials(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "ck": u,
                "n": c.astype(np.int64),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def hist(t: pa.Table) -> pa.Table:
        ck = t["ck"].to_numpy()
        n = t["n"].to_numpy()
        u, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(inv, weights=n, minlength=len(u)).astype(np.int64)
        cu, cc = np.unique(s, return_counts=True)
        return pa.table(
            {"c_count": cu, "custdist": cc.astype(np.int64)}
        )

    parts = (
        ords.map_batches(partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(hist, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["c_count", "custdist"])
    g = df.groupby("c_count", as_index=False)["custdist"].sum()
    # zero class: every ordering customer appears in exactly one c_count
    # bucket, so total customers minus the histogram mass is the zeros
    ordering = int(g["custdist"].sum())
    total_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()
    zero = total_cust - ordering
    out = pd.concat(
        [
            pd.DataFrame({"c_count": [0], "custdist": [zero]}),
            g[["c_count", "custdist"]],
        ],
        ignore_index=True,
    )
    out = out[out["custdist"] > 0].reset_index(drop=True)
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return out


def q_q17_small_orders(sf_dir: str):
    """TPC-H-Q17-shaped small-quantity revenue: revenue of lineitems whose
    quantity is below 20% of their part's average quantity. The per-part
    scalar subquery is denominator-cleared: qty < 0.2 * (sum/n) becomes
    5*qty*n < sum in exact int64 (quantities are integral) — no float
    average on either side. One hashed partkey shuffle carries block-level
    (partkey, qty, units, count) partials; each partition emits one
    integer (revenue, count) pair."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.functions.hashing import part_of

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def pre(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = t["l_quantity"].to_numpy(zero_copy_only=False)
        q = np.floor(qf + 0.5).astype(np.int64)
        assert np.all(q == qf), "l_quantity must be integral"
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "pk": pk,
                "q": pa.array(q),
                "units": pa.array(units),
                "__p": pa.array(part_of(pk, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        pk = t["pk"].to_numpy()
        q = t["q"].to_numpy()
        units = t["units"].to_numpy()
        u, inv = np.unique(pk, return_inverse=True)
        sq = np.bincount(inv, weights=q, minlength=len(u)).astype(np.int64)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        keep = 5 * q * n[inv] < sq[inv]
        return pa.table(
            {
                "units": pa.array([int(units[keep].sum())], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    parts = (
        li.map_batches(pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    total = int(sum(r["units"] for r in parts))
    nrows = int(sum(r["n_rows"] for r in parts))
    return pd.DataFrame(
        {
            "small_revenue": [round_half_away(np.float64(total) / 10000.0, 2)],
            "n_lineitems": np.array([nrows], np.int64),
        }
    )


Q16_EXCLUDE_PREFIX = "PROMO"


def q_q16_supplier_counts(sf_dir: str):
    """TPC-H-Q16-shaped exact COUNT(DISTINCT) aggregate: distinct
    suppliers per (brand, size) over parts NOT of an excluded type.
    Distinct (partkey, suppkey) pairs fold through one hashed-pair
    shuffle; the part dim broadcasts (documented dim-regime bound — the
    co-partition attach pattern of market_share applies above it); the
    (brand, size, suppkey) triples then dedup through a second hashed
    shuffle so per-partition partial counts sum to the exact global
    distinct count."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.functions.hashing import part_of

    import pyarrow.parquet as pq

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size", "p_type"],
    ).to_pandas()
    pt = pt[~pt["p_type"].str.startswith(Q16_EXCLUDE_PREFIX)]
    brands, bidx = np.unique(pt["p_brand"].to_numpy(object), return_inverse=True)
    pk = pt["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk, kind="stable")
    dim_ref = ray.put(
        (
            pk[order],
            bidx.astype(np.int64)[order],
            pt["p_size"].to_numpy(np.int64)[order],
        )
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # composite pair key: requires sk < 1e9 and pk < ~9.2e9 (int64);
        # both hold for TPC-H-shaped keys at any sf — fail loudly otherwise
        if len(ls):
            assert ls.max() < 1_000_000_007 and lp.max() < 9_200_000_000, (
                "q16 composite key bounds exceeded; widen to a 2-col unique"
            )
        c = lp * 1_000_000_007 + ls
        u = np.unique(c)
        opk = u // 1_000_000_007
        osk = u % 1_000_000_007
        return pa.table(
            {
                "pk": opk,
                "sk": osk,
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def triple_partials(t: pa.Table) -> pa.Table:
        pkv, bv, sv = ray.get(dim_ref)
        k = t["pk"].to_numpy()
        sk = t["sk"].to_numpy()
        # dedup (pk, sk) within the partition, then attach (brand, size)
        c = k * 1_000_000_007 + sk
        u = np.unique(c)
        k = u // 1_000_000_007
        sk = u % 1_000_000_007
        if len(pkv) and len(k):
            idx = np.minimum(np.searchsorted(pkv, k), len(pkv) - 1)
            hit = pkv[idx] == k
        else:
            idx = np.zeros(len(k), np.int64)
            hit = np.zeros(len(k), bool)
        b = bv[idx[hit]] if hit.any() else np.empty(0, np.int64)
        sz = sv[idx[hit]] if hit.any() else np.empty(0, np.int64)
        sk = sk[hit]
        # triple key: (brand, size, suppkey) — route all copies together
        tk = (b * 100 + sz) * 1_000_000_007 + sk
        return pa.table(
            {"tk": tk, "__p": pa.array(part_of(tk, P), pa.int32())}
        )

    def count_fold(t: pa.Table) -> pa.Table:
        u = np.unique(t["tk"].to_numpy())
        g = u // 1_000_000_007
        gu, cnt = np.unique(g, return_counts=True)
        return pa.table(
            {"g": gu, "supplier_cnt": cnt.astype(np.int64)}
        )

    ev = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )
    parts = (
        ev.map_batches(pair_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(triple_partials, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(count_fold, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["g", "supplier_cnt"])
    g = df.groupby("g", as_index=False)["supplier_cnt"].sum()
    gv = g["g"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "p_brand": brands[gv // 100],
            "p_size": (gv % 100).astype(np.int64),
            "supplier_cnt": g["supplier_cnt"].to_numpy(np.int64),
        }
    )


Q7_NAT_A = 12
Q7_NAT_B = 7
Q7_LO_US = 820_454_400_000_000  # 1996-01-01
Q7_HI_US = 883_612_800_000_000  # 1998-01-01


def q_q7_nation_volume(sf_dir: str):
    """TPC-H-Q7-shaped cross-nation shipping volume: revenue between a
    supplier nation and a customer nation (both directions) per ship
    year. Supplier nation attaches via a broadcast dim (suppliers are the
    small dim); the customer nation needs TWO chained co-partition joins
    (orderkey then custkey), each side combiner-folded before its
    shuffle; exact integer units throughout; the final group is <= 4
    rows (2 directions x 2 years)."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(sk, kind="stable")
    supp_ref = ray.put(
        (sk[order], supp["s_nationkey"].to_numpy(np.int64)[order])
    )
    nats = (Q7_NAT_A, Q7_NAT_B)

    def li_pre(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(Q7_LO_US, pa.int64())),
                pc.less(ship, pa.scalar(Q7_HI_US, pa.int64())),
            )
        )
        skv, snv = ray.get(supp_ref)
        ls = f["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(skv) and len(ls):
            idx = np.minimum(np.searchsorted(skv, ls), len(skv) - 1)
            snat = np.where(skv[idx] == ls, snv[idx], -1)
        else:
            snat = np.full(len(ls), -1, np.int64)
        keep = (snat == nats[0]) | (snat == nats[1])
        f = f.filter(pa.array(keep))
        snat = snat[keep]
        ok = f["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = pc.year(f["l_shipdate"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        # fold per (orderkey, year, snat) before the shuffle: code packs
        # (year, which-nation) into 2 bits
        code = (yr - 1996) * 2 + (snat == nats[1]).astype(np.int64)
        key = ok * 4 + code
        u, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        ok_u = u // 4
        return pa.table(
            {
                "key": ok_u,
                "code": pa.array(u % 4),
                "units": pa.array(s),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(ok_u, P), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ok,
                "code": pa.array(ck),  # probe rows carry the custkey here
                "units": pa.array(np.zeros(len(ok), np.int64)),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def kern1(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        code = t["code"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_o = np.flatnonzero(~build)
        pk = key[sel_o]
        osort = np.argsort(pk, kind="stable")
        pk = pk[osort]
        pck = code[sel_o][osort]
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        if len(pk) and len(lk):
            idx = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            hit = pk[idx] == lk
            sel_l, idx = sel_l[hit], idx[hit]
        else:
            sel_l, idx = sel_l[:0], np.empty(0, np.int64)
        ck = pck[idx]
        # fold per (custkey, code) before the second shuffle
        k2 = ck * 4 + code[sel_l]
        u, inv = np.unique(k2, return_inverse=True)
        s = np.bincount(
            inv, weights=units[sel_l], minlength=len(u)
        ).astype(np.int64)
        ck_u = u // 4
        return pa.table(
            {
                "key": ck_u,
                "code": pa.array(u % 4),
                "units": pa.array(s),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(ck_u, P), pa.int32()),
            }
        )

    def cust_pre(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (cn == nats[0]) | (cn == nats[1])
        ck, cn = ck[keep], cn[keep]
        return pa.table(
            {
                "key": ck,
                "code": pa.array(cn),
                "units": pa.array(np.zeros(len(ck), np.int64)),
                "is_build": pa.array(np.zeros(len(ck), bool)),
                "__p": pa.array(part_of(ck, P), pa.int32()),
            }
        )

    def kern2(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        code = t["code"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_c = np.flatnonzero(~build)
        pk = key[sel_c]
        osort = np.argsort(pk, kind="stable")
        pk = pk[osort]
        cnat = code[sel_c][osort]
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        if len(pk) and len(lk):
            idx = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            hit = pk[idx] == lk
            sel_l, idx = sel_l[hit], idx[hit]
        else:
            sel_l, idx = sel_l[:0], np.empty(0, np.int64)
        cn = cnat[idx]
        cd = code[sel_l]
        snat = np.where(cd % 2 == 1, nats[1], nats[0])
        yr = 1996 + cd // 2
        keep = snat != cn
        # <= 4 distinct (snat, cnat, year) rows per partition
        k3 = (snat[keep] * 100 + cn[keep]) * 10 + (yr[keep] - 1996)
        u, inv = np.unique(k3, return_inverse=True)
        s = np.bincount(
            inv, weights=units[sel_l][keep], minlength=len(u)
        ).astype(np.int64)
        return pa.table({"k3": u, "units": pa.array(s)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        ],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    parts = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .union(orders.map_batches(ord_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern1, batch_format="pyarrow")
        .union(cust.map_batches(cust_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern2, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["k3", "units"])
    g = df.groupby("k3", as_index=False)["units"].sum()
    k3 = g["k3"].to_numpy(np.int64)
    dim = _nation_region_dim(sf_dir)
    nk = dim["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = dim["n_name"].to_pandas().to_numpy(object)
    name_of = dict(zip(nk.tolist(), nn.tolist()))
    out = pd.DataFrame(
        {
            "supp_nation": [name_of[int(v)] for v in k3 // 1000],
            "cust_nation": [name_of[int(v)] for v in (k3 // 10) % 100],
            "l_year": (1996 + k3 % 10).astype(np.int64),
            "revenue": round_half_away(
                g["units"].to_numpy(np.float64) / 10000.0, 2
            ),
        }
    )
    return out.sort_values(
        ["supp_nation", "cust_nation", "l_year"]
    ).reset_index(drop=True)


Q10_LO_US = 820_454_400_000_000  # 1996-01-01
Q10_HI_US = 828_316_800_000_000  # 1996-04-01
Q10_TOPK = 20


def q_q10_returns(sf_dir: str):
    """TPC-H-Q10-shaped returned-item reporting: top customers by revenue
    of RETURNED lineitems on orders placed in one quarter. One orderkey
    co-partition join (lineitem folded to per-order integer units first),
    one custkey hashed fold, per-partition exact totals cut to a local
    top-k so the driver merges <= k*P rows; the <= k winners' names
    attach via a key-filtered dim read (row-group pruned). The cut key is
    (integer units desc, custkey asc) on BOTH sides — no float ties."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.functions.hashing import part_of

    def li_pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        ok = f["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        u, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "key": u,
                "units": pa.array(s),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        od = pc.cast(t["o_orderdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(od, pa.scalar(Q10_LO_US, pa.int64())),
                pc.less(od, pa.scalar(Q10_HI_US, pa.int64())),
            )
        )
        ok = f["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = f["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": ok,
                "units": pa.array(ck),  # probe rows carry custkey here
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def kern1(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_o = np.flatnonzero(~build)
        pk = key[sel_o]
        osort = np.argsort(pk, kind="stable")
        pk = pk[osort]
        pck = units[sel_o][osort]
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        if len(pk) and len(lk):
            idx = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            hit = pk[idx] == lk
            sel_l, idx = sel_l[hit], idx[hit]
        else:
            sel_l, idx = sel_l[:0], np.empty(0, np.int64)
        ck = pck[idx]
        u, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(
            inv, weights=units[sel_l], minlength=len(u)
        ).astype(np.int64)
        return pa.table(
            {
                "ck": u,
                "units": pa.array(s),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def kern2(t: pa.Table) -> pa.Table:
        ck = t["ck"].to_numpy()
        units = t["units"].to_numpy()
        u, inv = np.unique(ck, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        # local exact totals -> local top-k by (units desc, custkey asc)
        ordr = np.lexsort((u, -s))[:Q10_TOPK]
        return pa.table({"ck": u[ordr], "units": pa.array(s[ordr])})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    parts = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .union(orders.map_batches(ord_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern1, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern2, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["ck", "units"])
    ordr = np.lexsort((df["ck"].to_numpy(), -df["units"].to_numpy()))
    df = df.iloc[ordr[:Q10_TOPK]].reset_index(drop=True)
    keys = df["ck"].to_numpy(np.int64)
    cdim = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", keys.tolist())],
    ).to_pandas()
    cdim = cdim.set_index("c_custkey").loc[keys]
    dim = _nation_region_dim(sf_dir)
    nk = dim["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = dim["n_name"].to_pandas().to_numpy(object)
    name_of = dict(zip(nk.tolist(), nn.tolist()))
    return pd.DataFrame(
        {
            "c_custkey": keys,
            "c_name": cdim["c_name"].to_numpy(object),
            "revenue": round_half_away(
                df["units"].to_numpy(np.float64) / 10000.0, 2
            ),
            "c_acctbal": cdim["c_acctbal"].to_numpy(np.float64),
            "n_name": [
                name_of[int(v)] for v in cdim["c_nationkey"].to_numpy()
            ],
        }
    )


Q18_MIN_QTY = 250
Q18_TOPK = 100


def q_q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped large-volume-customer query: orders whose total
    quantity exceeds a threshold (HAVING SUM over the fact), with order
    attributes attached. Per-block integer qty partials fold through one
    orderkey co-partition shuffle where the exact per-order total is cut
    against the threshold AND to a local top-k, so the driver merges
    <= k*P rows. Dates ship as epoch-us BIGINT on both sides."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    def li_pre(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = t["l_quantity"].to_numpy(zero_copy_only=False)
        q = np.floor(qf + 0.5).astype(np.int64)
        assert np.all(q == qf), "l_quantity must be integral"
        u, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=q, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "key": u,
                "a": pa.array(s),
                "b": pa.array(np.zeros(len(u), np.int64)),
                "c": pa.array(np.zeros(len(u), np.int64)),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        tp = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "key": ok,
                "a": pa.array(ck),
                "b": pa.array(od),
                "c": pa.array(tp),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        ccol = t["c"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        u, inv = np.unique(lk, return_inverse=True)
        qty = np.bincount(
            inv, weights=a[sel_l], minlength=len(u)
        ).astype(np.int64)
        keep = qty > Q18_MIN_QTY
        u, qty = u[keep], qty[keep]
        sel_o = np.flatnonzero(~build)
        pk = key[sel_o]
        osort = np.argsort(pk, kind="stable")
        pk = pk[osort]
        so = sel_o[osort]
        if len(pk) and len(u):
            idx = np.minimum(np.searchsorted(pk, u), len(pk) - 1)
            hit = pk[idx] == u
            u, qty, idx = u[hit], qty[hit], idx[hit]
        else:
            u, qty, idx = u[:0], qty[:0], np.empty(0, np.int64)
        src = so[idx]
        cut = np.lexsort((u, -qty))[:Q18_TOPK]
        return pa.table(
            {
                "o_orderkey": u[cut],
                "total_qty": pa.array(qty[cut]),
                "c_custkey": pa.array(a[src][cut]),
                "o_orderdate_us": pa.array(b[src][cut]),
                "tp_cents": pa.array(ccol[src][cut]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    parts = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .union(orders.map_batches(ord_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(
        parts,
        columns=[
            "o_orderkey", "total_qty", "c_custkey", "o_orderdate_us",
            "tp_cents",
        ],
    )
    ordr = np.lexsort(
        (df["o_orderkey"].to_numpy(), -df["total_qty"].to_numpy())
    )[:Q18_TOPK]
    df = df.iloc[ordr].reset_index(drop=True)
    return pd.DataFrame(
        {
            "c_custkey": df["c_custkey"].to_numpy(np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderdate_us": df["o_orderdate_us"].to_numpy(np.int64),
            "o_totalprice": round_half_away(
                df["tp_cents"].to_numpy(np.float64) / 100.0, 2
            ),
            "total_qty": df["total_qty"].to_numpy(np.int64),
        }
    )


def q_q9_profit(sf_dir: str):
    """TPC-H-Q9-shaped product-profit query reshaped to this schema
    (there is no partsupp/supplycost table): profit per supplier nation
    per order year, where cost is quantity x the part's retail price.
    Part retail units and the supplier nation attach via broadcast dims
    (the documented dim-regime bound — the Q8 co-partition attach chain
    applies above it); the per-(order, nation) integer profit partials
    take ONE orderkey co-partition join to pick up the order year; the
    final group is <= 25 nations x years rows."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy(np.int64)
    so = np.argsort(sk, kind="stable")
    part_df = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    pk = part_df["p_partkey"].to_numpy(np.int64)
    po = np.argsort(pk, kind="stable")
    retail_units = np.floor(
        part_df["p_retailprice"].to_numpy(np.float64) * 10000.0 + 0.5
    ).astype(np.int64)
    dims_ref = ray.put(
        (
            sk[so],
            supp["s_nationkey"].to_numpy(np.int64)[so],
            pk[po],
            retail_units[po],
        )
    )

    def li_pre(t: pa.Table) -> pa.Table:
        skv, snv, pkv, ruv = ray.get(dims_ref)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = t["l_quantity"].to_numpy(zero_copy_only=False)
        q = np.floor(qf + 0.5).astype(np.int64)
        idx = np.minimum(np.searchsorted(skv, ls), len(skv) - 1)
        snat = np.where(skv[idx] == ls, snv[idx], -1)
        jdx = np.minimum(np.searchsorted(pkv, lp), len(pkv) - 1)
        ru = np.where(pkv[jdx] == lp, ruv[jdx], 0)
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        profit = units - q * ru
        keep = snat >= 0
        key = ok[keep] * 32 + snat[keep]  # nationkey < 25 < 32
        u, inv = np.unique(key, return_inverse=True)
        s = np.bincount(
            inv, weights=profit[keep], minlength=len(u)
        ).astype(np.int64)
        ok_u = u // 32
        return pa.table(
            {
                "key": ok_u,
                "code": pa.array(u % 32),
                "units": pa.array(s),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(ok_u, P), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "key": ok,
                "code": pa.array(yr),
                "units": pa.array(np.zeros(len(ok), np.int64)),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        code = t["code"].to_numpy()
        units = t["units"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_o = np.flatnonzero(~build)
        okp = key[sel_o]
        osort = np.argsort(okp, kind="stable")
        okp = okp[osort]
        oyr = code[sel_o][osort]
        sel_l = np.flatnonzero(build)
        lk = key[sel_l]
        if len(okp) and len(lk):
            idx = np.minimum(np.searchsorted(okp, lk), len(okp) - 1)
            hit = okp[idx] == lk
            sel_l, idx = sel_l[hit], idx[hit]
        else:
            sel_l, idx = sel_l[:0], np.empty(0, np.int64)
        yr = oyr[idx]
        k2 = code[sel_l] * 10000 + yr
        u, inv = np.unique(k2, return_inverse=True)
        s = np.bincount(
            inv, weights=units[sel_l], minlength=len(u)
        ).astype(np.int64)
        return pa.table({"k2": u, "units": pa.array(s)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_partkey", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    parts = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .union(orders.map_batches(ord_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["k2", "units"])
    g = df.groupby("k2", as_index=False)["units"].sum()
    k2 = g["k2"].to_numpy(np.int64)
    dim = _nation_region_dim(sf_dir)
    nk = dim["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = dim["n_name"].to_pandas().to_numpy(object)
    name_of = dict(zip(nk.tolist(), nn.tolist()))
    return pd.DataFrame(
        {
            "n_name": [name_of[int(v)] for v in k2 // 10000],
            "o_year": (k2 % 10000).astype(np.int64),
            "profit": round_half_away(
                g["units"].to_numpy(np.float64) / 10000.0, 2
            ),
        }
    )


Q15_LO_US = 820_454_400_000_000  # 1996-01-01
Q15_HI_US = 828_316_800_000_000  # 1996-04-01


def q_q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped top supplier: the supplier(s) whose revenue over
    one ship quarter equals the global maximum (the scalar-max-subquery
    shape, ties included). Per-block integer partials fold through one
    suppkey hashed shuffle; each partition emits only its local-max rows
    (a global winner's exact total IS its partition's local max), so the
    driver compares O(P) candidates. Winner names attach via a
    key-filtered dim read."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.functions.hashing import part_of

    def li_pre(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(Q15_LO_US, pa.int64())),
                pc.less(ship, pa.scalar(Q15_HI_US, pa.int64())),
            )
        )
        skv = f["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        u, inv = np.unique(skv, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "sk": u,
                "units": pa.array(s),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        skv = t["sk"].to_numpy()
        units = t["units"].to_numpy()
        u, inv = np.unique(skv, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        m = s.max() if len(s) else 0
        at = s == m
        return pa.table({"sk": u[at], "units": pa.array(s[at])})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    parts = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts, columns=["sk", "units"])
    m = int(df["units"].max())
    win = df[df["units"] == m].sort_values("sk")
    keys = win["sk"].to_numpy(np.int64)
    sdim = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys.tolist())],
    ).to_pandas().set_index("s_suppkey").loc[keys]
    return pd.DataFrame(
        {
            "s_suppkey": keys,
            "s_name": sdim["s_name"].to_numpy(object),
            "total_revenue": round_half_away(
                win["units"].to_numpy(np.float64) / 10000.0, 2
            ),
        }
    )


Q11_NATIONKEY = 3
Q11_FRAC_DEN = 1000  # keep parts whose value > total_value / 1000


def q_q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shaped important-part identification reshaped to this
    schema (no partsupp): per-part revenue from ONE nation's suppliers,
    keeping parts whose value exceeds a fixed fraction of the nation
    total (the HAVING-vs-scalar-subquery shape). The supplier-nation
    filter is a broadcast dim; per-part integer units fold through one
    hashed shuffle into an exact dim-sized table, which is materialized
    ONCE (bounded by |part|) and re-consumed for the global total and
    the integer cross-multiplied cut — no float division on either
    side."""
    from sbustreamspot_core_ray.functions.hashing import part_of

    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    keep_sk = np.sort(
        supp.loc[supp["s_nationkey"] == Q11_NATIONKEY, "s_suppkey"]
        .to_numpy(np.int64)
    )
    sk_ref = ray.put(keep_sk)

    def li_pre(t: pa.Table) -> pa.Table:
        skv = ray.get(sk_ref)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(skv):
            idx = np.minimum(np.searchsorted(skv, ls), len(skv) - 1)
            keep = skv[idx] == ls
        else:
            keep = np.zeros(len(ls), bool)
        f = t.filter(pa.array(keep))
        lp = f["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = pc.multiply(
            f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"])
        ).to_numpy(zero_copy_only=False)
        units = np.floor(rev * 10000.0 + 0.5).astype(np.int64)
        u, inv = np.unique(lp, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        return pa.table(
            {
                "pk": u,
                "units": pa.array(s),
                "__p": pa.array(part_of(u, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        pkv = t["pk"].to_numpy()
        units = t["units"].to_numpy()
        u, inv = np.unique(pkv, return_inverse=True)
        s = np.bincount(inv, weights=units, minlength=len(u)).astype(np.int64)
        return pa.table({"pk": u, "units": pa.array(s)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    per_part = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .materialize()  # dim-sized: <= |part| exact rows
    )

    def totals(t: pa.Table) -> pa.Table:
        return pa.table(
            {"s": pa.array([int(t["units"].to_numpy().sum())], pa.int64())}
        )

    total = sum(
        int(r["s"])
        for r in per_part.map_batches(totals, batch_format="pyarrow").take_all()
    )

    def cut(t: pa.Table) -> pa.Table:
        units = t["units"].to_numpy()
        keep = units * Q11_FRAC_DEN > total
        return pa.table(
            {
                "p_partkey": t["pk"].to_numpy()[keep],
                "units": pa.array(units[keep]),
            }
        )

    rows = per_part.map_batches(cut, batch_format="pyarrow").take_all()
    df = pd.DataFrame(rows, columns=["p_partkey", "units"])
    ordr = np.lexsort((df["p_partkey"].to_numpy(), -df["units"].to_numpy()))
    df = df.iloc[ordr].reset_index(drop=True)
    return pd.DataFrame(
        {
            "p_partkey": df["p_partkey"].to_numpy(np.int64),
            "value": round_half_away(
                df["units"].to_numpy(np.float64) / 10000.0, 2
            ),
        }
    )


Q2_SIZE_LO, Q2_SIZE_HI = 10, 15
Q2_TYPE_PREFIX = "SMALL"
Q2_REGIONKEY = 2
Q2_TOPK = 100
_PAIR_MOD = 1_000_000_007


def q_q2_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shaped minimum-cost-supplier query reshaped to this
    schema (no partsupp): for parts in a size band with a type prefix,
    among suppliers of one region, the (part, supplier) pairs achieving
    that part's minimum observed sale price (the correlated-MIN-subquery
    shape, ties included). Part and region-supplier dims broadcast;
    per-(part, supplier) integer MIN partials fold through one hashed
    partkey shuffle where the per-part min and its achieving pairs
    resolve exactly; winner attributes attach via key-filtered dim
    reads. The sort key uses acctbal CENTS so the cut is integer-exact
    on both sides."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.functions.hashing import part_of

    pt = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size", "p_type"]
    )
    keep_p = (
        (pt["p_size"] >= Q2_SIZE_LO)
        & (pt["p_size"] <= Q2_SIZE_HI)
        & pt["p_type"].str.startswith(Q2_TYPE_PREFIX)
    )
    pk_set = np.sort(pt.loc[keep_p, "p_partkey"].to_numpy(np.int64))
    ndim = pd.read_parquet(f"{sf_dir}/nation.parquet")
    nat_keys = np.sort(
        ndim.loc[ndim["n_regionkey"] == Q2_REGIONKEY, "n_nationkey"]
        .to_numpy(np.int64)
    )
    supp = pd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    keep_s = np.isin(supp["s_nationkey"].to_numpy(np.int64), nat_keys)
    sk_set = np.sort(supp.loc[keep_s, "s_suppkey"].to_numpy(np.int64))
    dims_ref = ray.put((pk_set, sk_set))

    def li_pre(t: pa.Table) -> pa.Table:
        pkv, skv = ray.get(dims_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.zeros(len(lp), bool)
        if len(pkv) and len(skv) and len(lp):
            i = np.minimum(np.searchsorted(pkv, lp), len(pkv) - 1)
            j = np.minimum(np.searchsorted(skv, ls), len(skv) - 1)
            keep = (pkv[i] == lp) & (skv[j] == ls)
        f = t.filter(pa.array(keep))
        lp, ls = lp[keep], ls[keep]
        units = np.floor(
            f["l_extendedprice"].to_numpy(zero_copy_only=False) * 10000.0
            + 0.5
        ).astype(np.int64)
        if len(ls):
            assert ls.max() < _PAIR_MOD and lp.max() < 9_200_000_000, (
                "q2 composite key bounds exceeded; widen to a 2-col fold"
            )
        ckey = lp * _PAIR_MOD + ls
        # per-block MIN partial per (part, supplier)
        order = np.argsort(ckey, kind="stable")
        ckey_s = ckey[order]
        u, start = np.unique(ckey_s, return_index=True)
        mins = np.minimum.reduceat(units[order], start) if len(u) else units[:0]
        opk = u // _PAIR_MOD
        return pa.table(
            {
                "pk": opk,
                "sk": pa.array(u % _PAIR_MOD),
                "cu": pa.array(mins),
                "__p": pa.array(part_of(opk, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        pkv = t["pk"].to_numpy()
        skv = t["sk"].to_numpy()
        cu = t["cu"].to_numpy()
        ckey = pkv * _PAIR_MOD + skv
        order = np.argsort(ckey, kind="stable")
        ckey_s = ckey[order]
        u, start = np.unique(ckey_s, return_index=True)
        pair_min = np.minimum.reduceat(cu[order], start)
        ppk = u // _PAIR_MOD
        # per-part min across the pair mins (the partition owns the part)
        pu, pstart = np.unique(ppk, return_index=True)
        part_min = np.minimum.reduceat(pair_min, pstart)
        at = pair_min == np.repeat(
            part_min, np.diff(np.append(pstart, len(ppk)))
        )
        return pa.table(
            {
                "pk": ppk[at],
                "sk": pa.array(u[at] % _PAIR_MOD),
                "cu": pa.array(pair_min[at]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    rows = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(rows, columns=["pk", "sk", "cu"])
    skeys = np.unique(df["sk"].to_numpy(np.int64))
    sdim = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
        filters=[("s_suppkey", "in", skeys.tolist())],
    ).to_pandas().set_index("s_suppkey")
    srows = sdim.loc[df["sk"].to_numpy(np.int64)]
    bal_cents = np.floor(
        srows["s_acctbal"].to_numpy(np.float64) * 100.0 + 0.5
    ).astype(np.int64)
    dim = _nation_region_dim(sf_dir)
    nk = dim["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = dim["n_name"].to_pandas().to_numpy(object)
    name_of = dict(zip(nk.tolist(), nn.tolist()))
    out = pd.DataFrame(
        {
            "s_acctbal": round_half_away(
                bal_cents.astype(np.float64) / 100.0, 2
            ),
            "s_name": srows["s_name"].to_numpy(object),
            "n_name": [
                name_of[int(v)] for v in srows["s_nationkey"].to_numpy()
            ],
            "p_partkey": df["pk"].to_numpy(np.int64),
            "s_suppkey": df["sk"].to_numpy(np.int64),
            "min_cost": round_half_away(
                df["cu"].to_numpy(np.float64) / 10000.0, 2
            ),
        }
    )
    ordr = np.lexsort(
        (
            out["s_suppkey"].to_numpy(),
            out["p_partkey"].to_numpy(),
            -bal_cents,
        )
    )[:Q2_TOPK]
    return out.iloc[ordr].reset_index(drop=True)


Q20_NAME_PREFIX = "red "
Q20_YEAR = 1997
Q20_NATIONKEY = 3
Q20_SHARE_DEN = 4  # qualify when share > 1/4 of the part's shipped qty


def q_q20_excess_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped excess-share semi-join reshaped to this schema
    (no partsupp/availqty): suppliers of one nation that shipped MORE
    THAN a fixed share of some name-prefixed part's total quantity in
    one year (the EXISTS-with-correlated-threshold shape). The prefix
    part set broadcasts; per-(part, supplier) integer qty partials fold
    through one hashed partkey shuffle where the per-part total and the
    integer cross-multiplied share cut resolve exactly; the surviving
    supplier set is distinct-folded and nation-filtered driver-side
    (bounded by the supplier dim)."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.functions.hashing import part_of

    pt = pd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    pk_set = np.sort(
        pt.loc[
            pt["p_name"].str.startswith(Q20_NAME_PREFIX), "p_partkey"
        ].to_numpy(np.int64)
    )
    pk_ref = ray.put(pk_set)
    yr_lo = pd.Timestamp(f"{Q20_YEAR}-01-01").value // 1000
    yr_hi = pd.Timestamp(f"{Q20_YEAR + 1}-01-01").value // 1000

    def li_pre(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.int64())
        f = t.filter(
            pc.and_(
                pc.greater_equal(ship, pa.scalar(yr_lo, pa.int64())),
                pc.less(ship, pa.scalar(yr_hi, pa.int64())),
            )
        )
        pkv = ray.get(pk_ref)
        lp = f["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pkv) and len(lp):
            i = np.minimum(np.searchsorted(pkv, lp), len(pkv) - 1)
            keep = pkv[i] == lp
        else:
            keep = np.zeros(len(lp), bool)
        f = f.filter(pa.array(keep))
        lp = lp[keep]
        ls = f["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qf = f["l_quantity"].to_numpy(zero_copy_only=False)
        q = np.floor(qf + 0.5).astype(np.int64)
        if len(ls):
            assert ls.max() < _PAIR_MOD and lp.max() < 9_200_000_000, (
                "q20 composite key bounds exceeded; widen to a 2-col fold"
            )
        ckey = lp * _PAIR_MOD + ls
        u, inv = np.unique(ckey, return_inverse=True)
        s = np.bincount(inv, weights=q, minlength=len(u)).astype(np.int64)
        opk = u // _PAIR_MOD
        return pa.table(
            {
                "pk": opk,
                "sk": pa.array(u % _PAIR_MOD),
                "q": pa.array(s),
                "__p": pa.array(part_of(opk, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        pkv = t["pk"].to_numpy()
        skv = t["sk"].to_numpy()
        qv = t["q"].to_numpy()
        ckey = pkv * _PAIR_MOD + skv
        u, inv = np.unique(ckey, return_inverse=True)
        qs = np.bincount(inv, weights=qv, minlength=len(u)).astype(np.int64)
        ppk = u // _PAIR_MOD
        pu, pinv = np.unique(ppk, return_inverse=True)
        qt = np.bincount(pinv, weights=qs, minlength=len(pu)).astype(np.int64)
        keep = Q20_SHARE_DEN * qs > qt[pinv]
        return pa.table({"sk": np.unique(u[keep] % _PAIR_MOD)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    rows = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .take_all()
    )
    sks = np.unique(np.array([int(r["sk"]) for r in rows], np.int64))
    if len(sks):
        sdim = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey"],
            filters=[("s_suppkey", "in", sks.tolist())],
        ).to_pandas().set_index("s_suppkey").loc[sks]
        hit = sdim["s_nationkey"].to_numpy() == Q20_NATIONKEY
        sks = sks[hit]
        names = sdim["s_name"].to_numpy(object)[hit]
    else:
        names = np.empty(0, object)
    return pd.DataFrame({"s_suppkey": sks, "s_name": names})


Q21_LATE_US = 7_776_000_000_000  # 90 days
Q21_TOPK = 100


def q_q21_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped suppliers-who-kept-orders-waiting reshaped to
    this schema (no commit/receipt dates): for finished ('F') orders
    with MORE THAN ONE supplier, count per supplier the orders where it
    was the ONLY late shipper (latest item > 90 days after the order
    date) — the EXISTS / NOT-EXISTS pair over order groups. Lineitem
    folds to per-(order, supplier) MAX-shipdate partials before the ONE
    orderkey co-partition shuffle; the whole order group resolves inside
    its partition; per-supplier counts fold through a second small
    hashed shuffle."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.functions.hashing import part_of

    def li_pre(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ship = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(sk):
            assert sk.max() < _PAIR_MOD and ok.max() < 9_200_000_000, (
                "q21 composite key bounds exceeded; widen to a 2-col fold"
            )
        ckey = ok * _PAIR_MOD + sk
        order = np.argsort(ckey, kind="stable")
        ckey_s = ckey[order]
        u, start = np.unique(ckey_s, return_index=True)
        ms = np.maximum.reduceat(ship[order], start) if len(u) else ship[:0]
        ook = u // _PAIR_MOD
        return pa.table(
            {
                "key": ook,
                "sk": pa.array(u % _PAIR_MOD),
                "ms": pa.array(ms),
                "is_build": pa.array(np.ones(len(u), bool)),
                "__p": pa.array(part_of(ook, P), pa.int32()),
            }
        )

    def ord_pre(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        ok = f["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = pc.cast(f["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "key": ok,
                "sk": pa.array(np.zeros(len(ok), np.int64)),
                "ms": pa.array(od),
                "is_build": pa.array(np.zeros(len(ok), bool)),
                "__p": pa.array(part_of(ok, P), pa.int32()),
            }
        )

    def kern(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy()
        sk = t["sk"].to_numpy()
        ms = t["ms"].to_numpy()
        build = t["is_build"].to_numpy(zero_copy_only=False)
        sel_o = np.flatnonzero(~build)
        okp = key[sel_o]
        osort = np.argsort(okp, kind="stable")
        okp = okp[osort]
        od = ms[sel_o][osort]
        sel_l = np.flatnonzero(build)
        # exact per-(order, supplier) max across block partials
        ckey = key[sel_l] * _PAIR_MOD + sk[sel_l]
        order = np.argsort(ckey, kind="stable")
        ckey_s = ckey[order]
        u, start = np.unique(ckey_s, return_index=True)
        pm = (
            np.maximum.reduceat(ms[sel_l][order], start)
            if len(u)
            else np.empty(0, np.int64)
        )
        ook = u // _PAIR_MOD
        osk = u % _PAIR_MOD
        # keep only 'F' orders (present on the probe side)
        if len(okp) and len(ook):
            idx = np.minimum(np.searchsorted(okp, ook), len(okp) - 1)
            hit = okp[idx] == ook
        else:
            idx = np.zeros(len(ook), np.int64)
            hit = np.zeros(len(ook), bool)
        ook, osk, pm, idx = ook[hit], osk[hit], pm[hit], idx[hit]
        late = pm > od[idx] + Q21_LATE_US
        # per-order supplier and late counts (u sorted => ook sorted)
        ou, ostart = np.unique(ook, return_index=True)
        counts = np.diff(np.append(ostart, len(ook)))
        nlate = np.add.reduceat(late.astype(np.int64), ostart) if len(ou) else late[:0]
        ns_r = np.repeat(counts, counts)
        nl_r = np.repeat(nlate, counts)
        win = late & (ns_r > 1) & (nl_r == 1)
        wu, wc = np.unique(osk[win], return_counts=True)
        return pa.table(
            {
                "sk": wu,
                "numwait": pa.array(wc.astype(np.int64)),
                "__p": pa.array(part_of(wu, P), pa.int32()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        skv = t["sk"].to_numpy()
        nw = t["numwait"].to_numpy()
        u, inv = np.unique(skv, return_inverse=True)
        s = np.bincount(inv, weights=nw, minlength=len(u)).astype(np.int64)
        cut = np.lexsort((u, -s))[:Q21_TOPK]
        return pa.table({"sk": u[cut], "numwait": pa.array(s[cut])})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    )
    rows = (
        li.map_batches(li_pre, batch_format="pyarrow")
        .union(orders.map_batches(ord_pre, batch_format="pyarrow"))
        .groupby("__p")
        .map_groups(kern, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(rows, columns=["sk", "numwait"])
    ordr = np.lexsort((df["sk"].to_numpy(), -df["numwait"].to_numpy()))[
        :Q21_TOPK
    ]
    df = df.iloc[ordr].reset_index(drop=True)
    keys = df["sk"].to_numpy(np.int64)
    sdim = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys.tolist())],
    ).to_pandas().set_index("s_suppkey").loc[keys]
    return pd.DataFrame(
        {
            "s_suppkey": keys,
            "s_name": sdim["s_name"].to_numpy(object),
            "numwait": df["numwait"].to_numpy(np.int64),
        }
    )


Q19_BRACKETS = [
    ("Brand#12", 1, 10, 1, 15),
    ("Brand#13", 1, 20, 10, 25),
    ("Brand#14", 1, 30, 20, 35),
]

Q6_LO_US = 820_454_400_000_000  # 1996-01-01
Q6_HI_US = 852_076_800_000_000  # 1997-01-01
Q6_DISC_LO = 0.045  # discount bracket 0.05 +/- 0.01, float-safe bounds
Q6_DISC_HI = 0.065
Q6_QTY_LT = 24.0


def q_q6_forecast(sf_dir: str):
    """TPC-H-Q6-shaped forecast revenue change: SUM(extendedprice *
    discount) over a one-year shipdate window, a discount bracket, and a
    quantity cap. The only shuffle-free TPC-H shape: one column-pruned
    scan, one int64 partial per block, one driver-side fold (cf.
    `main.cpp` has no relational layer at all — SURVEY §2.7)."""
    from sbustreamspot_core_ray.stages.relational import forecast_revenue

    return forecast_revenue(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate",
                "l_quantity",
                "l_discount",
                "l_extendedprice",
            ],
        ),
        date_lo_us=Q6_LO_US,
        date_hi_us=Q6_HI_US,
        disc_lo=Q6_DISC_LO,
        disc_hi=Q6_DISC_HI,
        qty_lt=Q6_QTY_LT,
    )


def q_pareto_skyline(sf_dir: str):
    """2-D Pareto frontier of parts minimizing (p_retailprice, p_size):
    rows no other part dominates (<= on both, < somewhere). Tree-reduced:
    per-block local frontier inside map_batches, then one exact pass over
    the tiny candidate union — no shuffle, comparisons only (no float
    arithmetic), bit-identical to the SQL NOT EXISTS mirror. (The
    reference has no relational layer — SURVEY §2.7.)"""
    from sbustreamspot_core_ray.stages.relational import pareto_skyline

    return pareto_skyline(
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_retailprice", "p_size"],
        ),
        x_col="p_retailprice",
        y_col="p_size",
    )


_SQL_PARETO_SKYLINE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
)"""


def q_q19_brackets(sf_dir: str):
    """TPC-H-Q19-shaped disjunctive predicate revenue: OR of
    (brand, size-range, quantity-range) brackets spanning both join
    sides. Part side ships a bracket bitmask per key; lineitem is folded
    to (partkey, quantity, units) integer rows per block; one partkey
    co-partition shuffle; exact integer units, one division."""
    from sbustreamspot_core_ray.stages.relational import (
        disjunctive_bracket_revenue,
    )

    return disjunctive_bracket_revenue(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
        ),
        brackets=Q19_BRACKETS,
        num_partitions=P,
    )


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP analog with explicit 'ALL' placeholder labels:
    nation level, region level, grand total — all re-aggregated from the
    25-row per-nation integer-unit result (the distributed work happens
    once; the rollup re-aggregation is on a fixed-size table)."""
    from sbustreamspot_core_ray.stages.relational import revenue_by_nation

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    base = revenue_by_nation(
        li, supp, _nation_region_dim(sf_dir), num_partitions=P
    ).to_pandas()  # <= 25 rows by construction
    lv0 = base.assign(lvl=0)
    lv1 = (
        base.groupby("r_name", as_index=False)["units"].sum().assign(n_name="ALL", lvl=1)
    )
    lv2 = pd.DataFrame(
        {"r_name": ["ALL"], "n_name": ["ALL"], "units": [base["units"].sum()], "lvl": [2]}
    )
    df = pd.concat([lv0, lv1, lv2], ignore_index=True)
    df["revenue"] = round_half_away(df["units"].astype(np.float64) / 10000.0, 2)
    return df[["lvl", "r_name", "n_name", "revenue"]]


def q_clustering_coefficient(sf_dir: str):
    """Per-vertex local clustering coefficient on the undirected co-occurrence
    graph: 2*tri/(deg*(deg-1)) for deg >= 2, one IEEE division mirrored by
    the SQL oracle."""
    from sbustreamspot_core_ray.pipelines.superstep import clustering_coefficient

    df = clustering_coefficient(
        _edges_triangle(sf_dir), num_partitions=4 * P
    ).to_pandas()
    df["cc"] = round_half_away(df["cc"], 6)
    return df


LATE_US = 300_000_000  # 5 min allowed lateness
LATE_BUCKET_US = 600_000_000  # deterministic arrival-scramble bucket (10 min)


def q_late_events(sf_dir: str):
    """Watermark / late-data flags: events >5min behind the per-user
    running-max event time in (deterministically simulated) arrival
    order — the table's event_id is globally time-sorted, so arrival is
    scrambled within 10-min buckets identically on both sides."""
    from sbustreamspot_core_ray.stages.events import late_events

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return late_events(
        ev, allowed_lateness_us=LATE_US, arrival_bucket_us=LATE_BUCKET_US,
        num_parts=P,
    )


def q_hourly_filled(sf_dir: str):
    """Time-series resample: per-type hourly counts on a DENSE calendar
    (gaps emit 0) — sparse combiner counts + a per-type vectorized
    arange/searchsorted fill."""
    from sbustreamspot_core_ray.stages.events import counts_per_window_filled

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    return counts_per_window_filled(ev)


def q_burstiness(sf_dir: str):
    """Per-type Fano factor of hourly event counts over the type's dense
    window range — exact integer moments, one division at the end."""
    from sbustreamspot_core_ray.stages.events import burstiness

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    return burstiness(ev)


_SQL_BURSTINESS = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS win FROM events
),
s AS (
  SELECT event_type, win, CAST(COUNT(*) AS BIGINT) AS n
  FROM h GROUP BY 1, 2
),
a AS (
  SELECT event_type,
         CAST(MAX(win) - MIN(win) + 1 AS HUGEINT) AS nwin,
         SUM(CAST(n AS HUGEINT)) AS sx,
         SUM(CAST(n AS HUGEINT) * n) AS sxx
  FROM s GROUP BY event_type
)
SELECT event_type, CAST(nwin AS BIGINT) AS n_windows,
       CAST(sx AS BIGINT) AS n_events,
       ROUND(CAST(nwin * sxx - sx * sx AS DOUBLE)
             / CAST(nwin * sx AS DOUBLE), 6) AS fano
FROM a ORDER BY event_type
"""


def q_embedding_outliers(sf_dir: str):
    """Top-3 farthest vectors from their label centroid, integer-exact
    (c^2-scaled squared distance clears the mean's denominator)."""
    from sbustreamspot_core_ray.stages.ann import embedding_outliers

    return embedding_outliers(
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"), top_k=3
    )


def q_embedding_centroids(sf_dir: str):
    """Mean-pooled class prototypes per label: integer-quantized exact
    sums, one (label, dim) groupby, fixed mean chain."""
    from sbustreamspot_core_ray.stages.ann import embedding_centroids

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return embedding_centroids(embs)


def q_label_margin(sf_dir: str):
    """Per-label cluster-quality audit: points strictly nearest their own
    label's floor-centroid (ties -> lowest label id); all-integer
    distances on shifted quantized coordinates."""
    from sbustreamspot_core_ray.stages.ann import label_margin

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return label_margin(embs)


def q_embedding_quantize(sf_dir: str):
    """Per-vector symmetric int8 quantization: stateless vectorized map,
    fixed IEEE chain (x/maxabs)*127+0.5 -> floor, CSV-canonical output
    mirrored by the SQL list_transform oracle."""
    from sbustreamspot_core_ray.stages.ann import embedding_int8_quantize

    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_int8_quantize(embs)


def q_props_stats(sf_dir: str):
    """Semi-structured extraction: integer field k regex-extracted from
    the JSON props column, folded per event_type (all-integer stats)."""
    from sbustreamspot_core_ray.stages.events import props_field_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return props_field_stats(ev, key="k")


def q_value_outliers(sf_dir: str):
    """Per-type z-score outlier flags: exact integer moments, a broadcast
    per-type (mean, stddev) dict, and an identical IEEE flag/z chain on
    both sides (sqrt is correctly rounded — no libm variance)."""
    from sbustreamspot_core_ray.stages.events import value_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return value_outliers(ev)


def q_longest_streak(sf_dir: str):
    """Per-user longest consecutive-active-day streak + total active days
    (gaps-and-islands), one user-key shuffle, vectorized island scan."""
    from sbustreamspot_core_ray.stages.events import longest_streak

    return longest_streak(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
        ),
        num_parts=P,
    )


def q_conversion_lag(sf_dir: str):
    """Per-user signup -> first-subsequent-purchase lag (funnel
    time-to-convert), one user-key shuffle, vectorized per-partition
    minima."""
    from sbustreamspot_core_ray.stages.events import conversion_lag

    return conversion_lag(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "user_id", "event_type"],
        ),
        num_parts=P,
    )


_SQL_CONVERSION_LAG = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS signup_us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.signup_us
  GROUP BY e.user_id
)
SELECT s.user_id, s.signup_us, p.purchase_us,
       p.purchase_us - s.signup_us AS lag_us
FROM s JOIN p ON p.user_id = s.user_id ORDER BY s.user_id
"""


_SQL_LONGEST_STREAK = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
),
s AS (SELECT user_id, island, count(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM s GROUP BY user_id ORDER BY user_id
"""


def q_daily_users(sf_dir: str):
    """COUNT(DISTINCT user) per day — batch-deduped pairs cross one
    composite-key shuffle, then a tiny window-keyed fold."""
    from sbustreamspot_core_ray.stages.events import distinct_users_per_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return distinct_users_per_window(ev)


def q_hll_users(sf_dir: str):
    """Approximate distinct users per event type (deterministic
    HyperLogLog, 64 registers) with the exact count as witness; the
    register fold is integer-exact, the estimate a single IEEE divide."""
    from sbustreamspot_core_ray.stages.events import hll_users

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_users(ev, num_parts=P)


def _hll_users_sql() -> str:
    from sbustreamspot_core_ray.stages.events import HLL_MIX, HLL_W_BITS

    two_w = 1 << HLL_W_BITS
    return f"""
WITH p AS (SELECT DISTINCT event_type, user_id FROM events),
h AS (
  SELECT event_type,
         CAST((CAST(user_id AS HUGEINT) * {HLL_MIX})
              % 18446744073709551616 AS HUGEINT) AS h
  FROM p
),
r AS (
  SELECT event_type,
         CAST(h // {two_w} AS BIGINT) AS bucket,
         CAST(h % {two_w} AS BIGINT) AS w
  FROM h
),
rk AS (
  SELECT event_type, bucket,
         CASE WHEN w = 0 THEN {HLL_W_BITS + 1}
              ELSE {HLL_W_BITS + 1} - length(bin(w)) END AS rnk
  FROM r
),
reg AS (
  SELECT event_type, bucket, MAX(rnk) AS mj
  FROM rk GROUP BY event_type, bucket
),
types AS (SELECT DISTINCT event_type FROM p),
allb AS (
  SELECT t.event_type, g.b
  FROM types t, unnest(generate_series(0, 63)) AS g(b)
),
filled AS (
  SELECT a.event_type, COALESCE(reg.mj, 0) AS mj
  FROM allb a
  LEFT JOIN reg ON reg.event_type = a.event_type AND reg.bucket = a.b
),
s AS (
  SELECT event_type,
         SUM(CAST(1 AS HUGEINT) << ({HLL_W_BITS + 1} - mj)) AS sreg
  FROM filled GROUP BY event_type
),
cnt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
  FROM p GROUP BY event_type
)
SELECT cnt.event_type, cnt.exact_users,
       ROUND(0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0 * {float(2 * two_w)!r}
             / CAST(s.sreg AS DOUBLE), 4) AS hll_estimate
FROM cnt JOIN s ON s.event_type = cnt.event_type
"""


CMS_TOPK = 20


def q_cms_top_users(sf_dir: str):
    """Count-Min-sketch heavy hitters: exact top-20 users with the exact
    and the (always >=) CMS-estimated counts side by side; the counter
    matrix is a fixed 4x512 integer fold."""
    from sbustreamspot_core_ray.stages.events import cms_top_users

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id"]
    )
    return cms_top_users(ev, top_k=CMS_TOPK, num_parts=P)


def _cms_top_users_sql() -> str:
    from sbustreamspot_core_ray.stages.events import CMS_ROWS, CMS_W_BITS

    consts = ", ".join(f"({i}, {c})" for i, c in enumerate(CMS_ROWS))
    div = 1 << (64 - CMS_W_BITS)
    return f"""
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY user_id
),
top AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id LIMIT {CMS_TOPK}),
r(i, m) AS (VALUES {consts}),
h AS (
  SELECT r.i AS i,
         CAST(((CAST(c.user_id AS HUGEINT) * r.m) % 18446744073709551616)
              // {div} AS BIGINT) AS col,
         CAST(SUM(c.n) AS BIGINT) AS cnt
  FROM c CROSS JOIN r GROUP BY 1, 2
),
e AS (
  SELECT t.user_id, t.n, MIN(h.cnt) AS est
  FROM top t
  CROSS JOIN r
  JOIN h ON h.i = r.i
        AND h.col = CAST(((CAST(t.user_id AS HUGEINT) * r.m)
              % 18446744073709551616) // {div} AS BIGINT)
  GROUP BY t.user_id, t.n
)
SELECT user_id, n AS exact_n, CAST(est AS BIGINT) AS cms_n FROM e
"""


WAU_DAYS = 7


def q_wau_rolling(sf_dir: str):
    """Rolling 7-day COUNT(DISTINCT user) per day: one hash(user)
    shuffle, bounded 7x fan-out on the DEDUPED (user, day) pairs, integer
    partials folded by a tiny day-keyed groupby."""
    from sbustreamspot_core_ray.stages.events import rolling_distinct_users

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return rolling_distinct_users(ev, window_days=WAU_DAYS, num_parts=P)


def q_modal_event_type(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (ties -> the
    lexicographically smallest type); one hash(user) shuffle, vectorized
    run-length counting per partition."""
    from sbustreamspot_core_ray.stages.events import modal_event_type

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return modal_event_type(ev, num_parts=P)


_SQL_MODAL_EVENT_TYPE = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type, n FROM r WHERE rn = 1"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str):
    """Wide-format pivot: per-user count columns for the fixed event-type
    domain plus a total — additive partial pivots, one hash(user) fold."""
    from sbustreamspot_core_ray.stages.events import pivot_type_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return pivot_type_counts(ev, types=EVENT_TYPES, num_parts=P)


_SQL_EVENT_TYPE_PIVOT = (
    "SELECT user_id,\n"
    + ",\n".join(
        f"  CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0)"
        f" AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    + ",\n  CAST(count(*) AS BIGINT) AS n_total\nFROM events GROUP BY user_id"
)


def q_interarrival_stats(sf_dir: str):
    """Per-user inter-arrival gap stats (count/sum/min/max, integer
    microseconds) over the (ts, event_id) ordering; single-event users
    omitted."""
    from sbustreamspot_core_ray.stages.events import interarrival_stats

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return interarrival_stats(ev, num_parts=P)


_SQL_INTERARRIVAL_STATS = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS gap_sum_us,
       MIN(gap) AS gap_min_us, MAX(gap) AS gap_max_us
FROM g WHERE gap IS NOT NULL GROUP BY user_id"""


def q_degree_histogram(sf_dir: str):
    """Degree distribution of the undirected derived graph: (degree,
    vertex count) — the scale-free shape check. Distinct canonical edges ->
    distributed degree counting -> per-batch partial histograms; only the
    tiny histograms reach the driver."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.pipelines.superstep import (
        distinct,
        int_degrees,
    )

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                )
            }
        )

    def local_hist(t: pa.Table) -> pa.Table:
        du, cnt = np.unique(t["deg"].to_numpy(), return_counts=True)
        return pa.table({"deg": du, "n_vertices": cnt.astype(np.int64)})

    und = distinct(
        _edges_full(sf_dir, dedup=False).map_batches(
            canon, batch_format="pyarrow"
        ),
        ["a", "b"],
    )
    partials = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_parts=P
    ).map_batches(local_hist, batch_format="pyarrow")
    # final fold: the partial histograms are O(distinct degrees) rows
    df = partials.to_pandas()
    out = df.groupby("deg", as_index=False)["n_vertices"].sum()
    return out.sort_values("deg").reset_index(drop=True)


_SQL_DEGREE_HISTOGRAM = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS (SELECT a AS s FROM canon UNION ALL SELECT b FROM canon),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY s)
SELECT dg AS deg, CAST(count(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY dg"""


_SQL_RICH_CLUB = f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
sym AS (SELECT a AS s FROM canon UNION ALL SELECT b FROM canon),
deg AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY s),
em AS MATERIALIZED (
  SELECT least(da.dg, db.dg) AS m
  FROM canon JOIN deg da ON da.s = canon.a JOIN deg db ON db.s = canon.b
),
ks AS (SELECT DISTINCT dg AS k FROM deg),
agg AS (
  SELECT k,
         (SELECT count(*) FROM deg WHERE dg > k) AS n_k,
         (SELECT count(*) FROM em WHERE m > k) AS e_k
  FROM ks
)
SELECT k, CAST(n_k AS BIGINT) AS n_k, CAST(e_k AS BIGINT) AS e_k,
       ROUND(2.0 * e_k / (n_k * (n_k - 1.0)), 6) AS rich_club
FROM agg WHERE n_k >= 2"""


def q_weekly_retention(sf_dir: str):
    """Cohort retention per week (active users also active next week):
    one hash(user) shuffle, adjacent-window shifted compare, integer
    partials; rate is one IEEE divide of exact counts."""
    from sbustreamspot_core_ray.stages.events import weekly_retention

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    return weekly_retention(ev, num_parts=P)


def q_value_percentiles(sf_dir: str):
    """Exact per-event-type value percentiles from an integer-cents
    histogram (combiner + one groupby; rank = ceil(q*n) in float64 on both
    sides)."""
    from sbustreamspot_core_ray.stages.events import grouped_value_percentiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )
    return grouped_value_percentiles(ev)


BOTTOMK_K = 32


def q_bottomk_median(sf_dir: str):
    """Bottom-k hash-sample quantile sketch per event type with the exact
    median as a same-query witness: per-block bottom-k combiner (bounded
    state), one tiny event_type groupby, histogram-exact witness."""
    from sbustreamspot_core_ray.stages.events import bottomk_median_sketch

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "event_id", "value"]
    )
    return bottomk_median_sketch(ev, k=BOTTOMK_K)


THROTTLE_GAP_US = 600_000_000  # 10 min


def q_throttle_events(sf_dir: str):
    """Temporal dedup (gap throttle): keep events >10min after the previous
    event of the same (user, event_type) — the LAG window pattern, one
    hash(user) shuffle + vectorized shifted-gap scan."""
    from sbustreamspot_core_ray.stages.events import throttle_events

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return throttle_events(ev, min_gap_us=THROTTLE_GAP_US, num_parts=P)


UNIGRAM_V = 20  # top-V vocabulary cut; sf0.01 vocab is 31 terms, so OOV fires


def q_doc_logprob(sf_dir: str):
    """Unigram LM corpus-quality score in integer nanonats: exact term
    counts -> one IEEE divide + math.log per vocab term (libm-parity with
    DuckDB ln) -> per-token int64 quantization -> order-independent sums."""
    from sbustreamspot_core_ray.stages.text import unigram_logprob

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return unigram_logprob(docs, top_v=UNIGRAM_V)


def q_bigram_logprob(sf_dir: str):
    """Bigram LM corpus-quality score in integer nanonats: corpus bigram
    counts via one (a, b) groupby, conditional probability c(a,b)/c_left(a)
    as ONE IEEE divide + math.log (libm-parity with DuckDB ln), per-bigram
    int64 quantization -> order-independent sums."""
    from sbustreamspot_core_ray.stages.text import bigram_logprob

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bigram_logprob(docs)


CHUNK_TOKENS = 32


def q_chunk_documents(sf_dir: str):
    """Context-window preparation: non-overlapping 32-token chunks per
    document (stateless map, no shuffle)."""
    from sbustreamspot_core_ray.stages.text import chunk_documents

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(docs, chunk_tokens=CHUNK_TOKENS)


def q_chunk_dedup(sf_dir: str):
    """Sub-document exact dedup: sha256 per 32-token chunk, one
    digest-key shuffle, first-wins owner on the composite
    (doc_id, chunk_id) key."""
    from sbustreamspot_core_ray.stages.dedup import chunk_exact_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_exact_dedup(docs, chunk_tokens=CHUNK_TOKENS)


def q_substring_dedup(sf_dir: str):
    """Cross-document repeated-substring coverage (Lee et al. char-level
    dedup signal, arXiv:2107.06499): 32-char grams at stride 4, positions
    whose gram occurs in >= 2 distinct docs, per-doc counts + ppm. ONE
    hash(gram) shuffle; per-doc totals are arithmetic on n_chars."""
    from sbustreamspot_core_ray.stages.dedup import substring_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return substring_dedup(docs)


def q_winnow_dups(sf_dir: str):
    """MOSS clone-pair report: doc pairs sharing >= 2 distinct winnowing
    fingerprints after dropping fingerprints held by > 8 docs (the
    common-code filter that also bounds pair expansion). One hash(fp)
    shuffle + one hash(pair) fold over the shuffle-free winnow index."""
    from sbustreamspot_core_ray.stages.dedup import winnow_dups

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return winnow_dups(docs, min_shared=2, max_docs_per_fp=8)


def _cdc_vals() -> str:
    from sbustreamspot_core_ray.stages.text import _winnow_pows

    return ", ".join(f"({j}, {p})" for j, p in enumerate(_winnow_pows(8)))


def q_cdc_dedup(sf_dir: str):
    """Content-defined-chunking dedup (rsync/LBFS boundary rule, winnow's
    61-bit rolling hash, cut when gram hash %% 64 == 0): per-doc chunk
    counts + cross-doc duplicate-chunk ppm. One hash(chunk) shuffle."""
    from sbustreamspot_core_ray.stages.dedup import cdc_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return cdc_dedup(docs)


def q_kn_logprob(sf_dir: str):
    """Interpolated Kneser-Ney bigram corpus score (d=0.75, integer
    nanonats): discounted ML term + continuation-probability backoff,
    one hashed-pair combiner shuffle, broadcast (bigram, q) lookup."""
    from sbustreamspot_core_ray.stages.text import kneser_ney_logprob

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return kneser_ney_logprob(docs)


def q_importance_weights(sf_dir: str):
    """DSIR-style importance weights (arXiv:2302.03169, unigram features):
    int64-nanonat log-ratio of add-1-smoothed target-domain (lang='en')
    vs corpus unigram probabilities, summed per document. One
    vocabulary-keyed groupby + broadcast (term, q) lookup; no corpus
    shuffle."""
    from sbustreamspot_core_ray.stages.curation import importance_weights

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return importance_weights(docs, target_lang="en", top_v=DSIR_V)


# top-V cut below the synthetic corpus vocabulary (~31 terms) so the OOV
# log-ratio path fires in every check, mirroring the UNIGRAM_V posture
DSIR_V = 24


OOV_V = 20


def q_oov_rate(sf_dir: str):
    """Vocabulary-coverage (OOV) rate per doc vs the corpus top-20 vocab:
    one vocab groupby, broadcast V-row table, stateless membership pass."""
    from sbustreamspot_core_ray.stages.text import oov_rate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return oov_rate(docs, top_v=OOV_V)


TRIGRAM_TOP = 20


def q_event_trigrams(sf_dir: str):
    """Top-20 consecutive event-type triples per user ordering (double
    LEAD window mirror); one user shuffle, |types|^3-bounded partials."""
    from sbustreamspot_core_ray.stages.events import event_trigrams

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_trigrams(ev, top_k=TRIGRAM_TOP, num_parts=P)


TOPUSERS_N = 3


def q_top_users_per_type(sf_dir: str):
    """Grouped top-N (ROW_NUMBER <= n): each event type's 3 most active
    users; one user shuffle, bounded candidate fold."""
    from sbustreamspot_core_ray.stages.events import top_users_per_type

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return top_users_per_type(ev, n=TOPUSERS_N, num_parts=P)


BPE_TOP = 20


def q_bpe_pairs(sf_dir: str):
    """Tokenizer induction (first BPE merge): top-20 adjacent character
    pairs within whitespace tokens, corpus-wide exact counts."""
    from sbustreamspot_core_ray.stages.text import bpe_pair_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return bpe_pair_counts(docs, top_k=BPE_TOP)


PACK_TOKENS = 128


def q_pack_sequences(sf_dir: str):
    """Training-sequence packing plan (docs concatenated in doc_id order,
    split into fixed 128-token sequences; rows = (seq, doc) pieces):
    distributed integer prefix sum over doc_id buckets, one bucket-key
    shuffle."""
    from sbustreamspot_core_ray.stages.text import pack_sequences

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pack_sequences(docs, seq_tokens=PACK_TOKENS, num_parts=P)


BUDGET_TOKENS = 6000  # ~40% of the sf0.01 pool; non-trivial cut at every sf


def q_budget_fill(sf_dir: str):
    """Token-budget corpus selection: admit docs in (stopword-density
    quality key desc, doc_id) priority order until the cumulative
    whitespace-token count would exceed the budget — a distributed
    integer prefix sum in priority order (pack_sequences' machinery
    re-keyed to (quality, id-range) buckets)."""
    from sbustreamspot_core_ray.stages.curation import budget_fill

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return budget_fill(docs, budget_tokens=BUDGET_TOKENS, num_parts=P)


def q_doc_quality(sf_dir: str):
    from sbustreamspot_core_ray.stages.text import quality

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return quality(docs).select_columns(
        ["doc_id", "punct_ratio", "alpha_ratio", "mean_word_len", "stopword_ratio"]
    )


def q_token_counts(sf_dir: str):
    from sbustreamspot_core_ray.stages.text import token_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return token_counts(docs).select_columns(["doc_id", "ws_tokens", "re_tokens"])


def q_lang_id(sf_dir: str):
    from sbustreamspot_core_ray.stages.text import lang_id

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return lang_id(docs).select_columns(["doc_id", "lang_pred"])


def q_fingerprints(sf_dir: str):
    """sha256-slice + 61-bit polynomial rolling-hash fingerprints (both
    SQL-mirrored: hex-slice cast / HUGEINT Horner sum)."""
    from sbustreamspot_core_ray.stages.text import fingerprints

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return fingerprints(docs).select_columns(["doc_id", "fingerprint", "rolling61"])


# driver config for the stratified-sample query: downsample the dominant
# language to rebalance the mix; rates in basis points of SAMPLE_BUCKETS
STRATA_RATES_BP = {"en": 2000, "de": 8000, "fr": 8000, "es": 8000}


def q_source_stats(sf_dir: str):
    """Per-source corpus composition (doc count, distinct langs, char
    totals + mean): combiner-shrunk (source, lang) groupby, bounded fold."""
    from sbustreamspot_core_ray.stages.curation import source_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )
    return source_stats(docs)


def q_sampling_weights(sf_dir: str):
    """Temperature (alpha=0.5) data-mixing weights per language:
    sqrt(n)/sqrt(max n) — sqrt is correctly rounded, so the chain is
    bit-exact without integer tricks."""
    from sbustreamspot_core_ray.stages.curation import sampling_weights

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang"]
    )
    return sampling_weights(docs)


def q_repetition_signals(sf_dir: str):
    """Gopher-style repetition quality signals (distinct-word / top-word /
    top-bigram fractions), whitespace tokenization mirrored in SQL."""
    from sbustreamspot_core_ray.stages.curation import repetition_signals

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return repetition_signals(docs)


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language hash-bucket downsampling (data mixing).
    Pure filter — the Fibonacci-hash bucket is mirrored in HUGEINT SQL."""
    from sbustreamspot_core_ray.stages.curation import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_sample(docs, STRATA_RATES_BP)


WS_N = 100


def q_weighted_sample(sf_dir: str):
    """Weighted reservoir sample (Efraimidis-Spirakis A-ES, deterministic
    hash-u variant): the WS_N docs with the smallest -ln(u)/length keys in
    integer nanounits. Per-batch combiner top-n, one <= n x blocks cut —
    the corpus never shuffles."""
    from sbustreamspot_core_ray.stages.curation import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return weighted_sample(docs, WS_N)


_SQL_WEIGHTED_SAMPLE = f"""
WITH t AS (
  SELECT doc_id, length(text) AS w,
         (CAST((((CAST(doc_id AS HUGEINT) * 11400714819323198485)
                 % 18446744073709551616) // 2048) AS DOUBLE) + 1.0)
           / 9007199254740992.0 AS u
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(w AS BIGINT) AS weight,
       CAST(floor((-ln(u)) / w * 1e9 + 0.5) AS BIGINT) AS key_e9
FROM t
ORDER BY key_e9, doc_id LIMIT {WS_N}"""


def q_pii_redact(sf_dir: str):
    """PII counts + redacted-text sha fingerprint (emails→phones→IPv4 in
    fixed order; RE2-compatible patterns, parity pytest-enforced)."""
    from sbustreamspot_core_ray.stages.curation import pii_redact

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pii_redact(docs)


# driver config for the decontamination query: every 7th doc_id plays the
# role of the (small) held-out benchmark/eval set; the rest is the corpus
DECON_BENCH_MOD = 7


def q_ngram_novelty(sf_dir: str):
    """Per-document word-5-gram novelty: fraction of a doc's distinct
    grams first seen (min doc_id) in that doc; one gram-key shuffle."""
    from sbustreamspot_core_ray.stages.curation import ngram_novelty

    return ngram_novelty(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        num_parts=P,
    )


def q_corpus_manifest(sf_dir: str):
    """End-to-end curation manifest: exact dedup -> integer-exact quality
    floor -> lang-ID filter -> per-(source, lang) integer rollup."""
    from sbustreamspot_core_ray.stages.curation import corpus_manifest

    return corpus_manifest(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        ),
        num_parts=P,
    )


def _corpus_manifest_sql() -> str:
    from sbustreamspot_core_ray.stages.curation import (
        MANIFEST_ALPHA_DEN,
        MANIFEST_ALPHA_NUM,
        MANIFEST_MIN_TOKENS,
    )

    return rf"""
WITH li AS ({_lang_id_sql()}),
w AS (
  SELECT doc_id, source, text FROM documents
  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
),
m AS (
  SELECT w.doc_id, w.source, li.lang_pred,
    length(w.text) AS chars,
    length(regexp_replace(w.text, '[^A-Za-z]', '', 'g')) AS alpha_chars,
    CASE WHEN regexp_replace(w.text, '^\s+|\s+$', '', 'g') = '' THEN 0
         ELSE len(regexp_split_to_array(
                regexp_replace(w.text, '^\s+|\s+$', '', 'g'), '\s+'))
    END AS ws_tokens
  FROM w JOIN li ON li.doc_id = w.doc_id
),
f AS (
  SELECT * FROM m
  WHERE {MANIFEST_ALPHA_DEN} * alpha_chars >= {MANIFEST_ALPHA_NUM} * chars
    AND ws_tokens >= {MANIFEST_MIN_TOKENS} AND lang_pred <> 'unk'
)
SELECT source, lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws_tokens) AS BIGINT) AS tokens,
       CAST(SUM(chars) AS BIGINT) AS chars,
       ROUND(CAST(SUM(alpha_chars) AS DOUBLE) / SUM(chars), 6) AS alpha_frac
FROM f GROUP BY source, lang_pred
"""


def q_lang_confusion(sf_dir: str):
    """Language-metadata audit: confusion counts between the stored lang
    column and the marker-heuristic prediction — the data-quality check
    run before trusting either label. One fixed-cardinality groupby of
    combiner partials."""
    from sbustreamspot_core_ray.stages.text import lang_id

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pred = lang_id(docs)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["lang", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (
        pred.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "lang_pred"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    return agg


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: word-5-gram overlap of the corpus against
    a broadcast benchmark set (docs with doc_id % 7 == 0). Gram membership
    is string equality on both sides — no hash to keep in parity."""
    import numpy as np
    import pyarrow as pa

    from sbustreamspot_core_ray.stages.curation import decontaminate

    def _is_bench(t):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return ids % DECON_BENCH_MOD == 0

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    bench = docs.map_batches(
        lambda t: t.filter(pa.array(_is_bench(t))), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        lambda t: t.filter(pa.array(~_is_bench(t))), batch_format="pyarrow"
    )
    return decontaminate(corpus, bench)


ED_BAND = 24
ED_MAXCHARS = 256
ED_MAXDIST = 8


def q_edit_distance_dedup(sf_dir: str):
    """Edit-distance near-dup pairs: prefix banding (first 24 chars) ->
    per-band candidate pairs -> early-abandoning Levenshtein verify over
    the first 256 chars, keep dist <= 8. Exact int64 distances (the same
    unit-cost metric as DuckDB's levenshtein())."""
    from sbustreamspot_core_ray.stages.dedup import edit_distance_near_dup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return edit_distance_near_dup(
        docs,
        band_chars=ED_BAND,
        max_chars=ED_MAXCHARS,
        max_dist=ED_MAXDIST,
        num_parts=P,
    )


_SQL_EDIT_DISTANCE_DEDUP = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {ED_MAXCHARS}) AS pre,
         substr(text, 1, {ED_BAND}) AS band
  FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         levenshtein(a.pre, b.pre) AS ed
  FROM d a JOIN d b ON b.band = a.band AND b.doc_id > a.doc_id
)
SELECT doc_a, doc_b, CAST(ed AS BIGINT) AS edit_dist
FROM p WHERE ed <= {ED_MAXDIST}"""


def q_exact_dedup(sf_dir: str):
    from sbustreamspot_core_ray.stages.dedup import exact_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return exact_dedup(docs).select_columns(["doc_id", "content_hash"])


BLOOM_M = 4096
BLOOM_CONSTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD)


def q_bloom_semi(sf_dir: str):
    """Bloom-filter semi-join audit: filter built over the distinct
    custkeys holding an URGENT-priority order (a ~20% subset, so
    non-members and measurable false positives exist at every sf;
    per-batch OR bitmaps, driver tree-reduce, broadcast),
    probed by every customer; exact hash semi-join as witness. One
    all-integer row (m_bits, k_hashes, n_set_bits, n_probe, n_pass,
    n_member, n_false_pos)."""
    from sbustreamspot_core_ray.stages.relational import bloom_semi_join_audit

    import pyarrow.compute as _pc

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            _pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return bloom_semi_join_audit(
        orders, cust, "o_custkey", "c_custkey",
        m_bits=BLOOM_M, hash_consts=BLOOM_CONSTS, num_partitions=P,
    )


def _bloom_sql() -> str:
    """HUGEINT recompute of the exact same bit positions; a probe key
    passes iff its DISTINCT positions are all set (COUNT DISTINCT match,
    robust to within-key position collisions)."""
    two64 = 1 << 64
    pos_build = " UNION ".join(
        f"SELECT DISTINCT CAST(((CAST(o_custkey AS HUGEINT) * {c}) % {two64})"
        f" % {BLOOM_M} AS BIGINT) AS p FROM orders"
        f" WHERE o_orderpriority = '1-URGENT'"
        for c in BLOOM_CONSTS
    )
    pos_probe = " UNION ALL ".join(
        f"SELECT c_custkey AS k, CAST(((CAST(c_custkey AS HUGEINT) * {c})"
        f" % {two64}) % {BLOOM_M} AS BIGINT) AS p FROM customer"
        for c in BLOOM_CONSTS
    )
    return f"""
WITH bits AS MATERIALIZED ({pos_build}),
pp AS MATERIALIZED (SELECT DISTINCT k, p FROM ({pos_probe})),
hit AS (
  SELECT pp.k, COUNT(*) AS np,
         COUNT(CASE WHEN bits.p IS NOT NULL THEN 1 END) AS nh
  FROM pp LEFT JOIN bits ON bits.p = pp.p
  GROUP BY pp.k),
passed AS (SELECT k FROM hit WHERE np = nh),
member AS (SELECT DISTINCT o_custkey AS k FROM orders
           JOIN customer ON c_custkey = o_custkey
           WHERE o_orderpriority = '1-URGENT')
SELECT {BLOOM_M} AS m_bits, {len(BLOOM_CONSTS)} AS k_hashes,
  (SELECT COUNT(*) FROM bits) AS n_set_bits,
  (SELECT COUNT(*) FROM customer) AS n_probe,
  (SELECT COUNT(*) FROM passed) AS n_pass,
  (SELECT COUNT(*) FROM member) AS n_member,
  (SELECT COUNT(*) FROM passed) - (SELECT COUNT(*) FROM member)
    AS n_false_pos
"""


SNM_KEY_CHARS = 24
SNM_WINDOW = 4
SNM_THR_NUM, SNM_THR_DEN = 6, 10


def q_snm_dedup(sf_dir: str):
    """Sorted-neighborhood (SNM) near-dup pairs: global sort by the
    24-char text-prefix blocking key, rank window of 4, exact
    distinct-token Jaccard verify with the integer cross-multiplied
    threshold 6/10. Range partitioning via a deterministic hash-gated key
    sample; halo = the neighbor bucket."""
    from sbustreamspot_core_ray.stages.dedup import sorted_neighborhood_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return sorted_neighborhood_dedup(
        docs, key_chars=SNM_KEY_CHARS, window=SNM_WINDOW,
        thr_num=SNM_THR_NUM, thr_den=SNM_THR_DEN, num_parts=P,
    )


def _snm_sql() -> str:
    """ROW_NUMBER window over the identical (key, doc_id) order; in-window
    pairs verified with DISTINCT-token intersection counts — all integer,
    so the threshold test is bit-exact on both sides."""
    return f"""
WITH dd AS MATERIALIZED (
  SELECT doc_id, substr(text, 1, {SNM_KEY_CHARS}) AS k, text FROM documents),
r AS MATERIALIZED (
  SELECT doc_id, k, text, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn
  FROM dd),
cand AS MATERIALIZED (
  SELECT a.doc_id AS da, b.doc_id AS db, a.text AS ta, b.text AS tb
  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {SNM_WINDOW}),
ta AS MATERIALIZED (
  SELECT DISTINCT da, db, s.tok FROM cand,
  UNNEST(string_split(ta, ' ')) AS s(tok) WHERE s.tok <> ''),
tb AS MATERIALIZED (
  SELECT DISTINCT da, db, s.tok FROM cand,
  UNNEST(string_split(tb, ' ')) AS s(tok) WHERE s.tok <> ''),
na AS (SELECT da, db, COUNT(*) AS ca FROM ta GROUP BY da, db),
nb AS (SELECT da, db, COUNT(*) AS cb FROM tb GROUP BY da, db),
ii AS (SELECT ta.da, ta.db, COUNT(*) AS inter FROM ta JOIN tb
       ON ta.da = tb.da AND ta.db = tb.db AND ta.tok = tb.tok
       GROUP BY ta.da, ta.db)
SELECT doc_a, doc_b, inter, uni FROM (
  SELECT c.da AS doc_a, c.db AS doc_b,
         COALESCE(ii.inter, 0) AS inter,
         COALESCE(na.ca, 0) + COALESCE(nb.cb, 0) - COALESCE(ii.inter, 0)
           AS uni
  FROM (SELECT DISTINCT da, db FROM cand) c
  LEFT JOIN na ON na.da = c.da AND na.db = c.db
  LEFT JOIN nb ON nb.da = c.da AND nb.db = c.db
  LEFT JOIN ii ON ii.da = c.da AND ii.db = c.db
)
WHERE uni > 0 AND {SNM_THR_DEN} * inter >= {SNM_THR_NUM} * uni
"""


PATH_ROLLUP_N = 10


def q_path_rollup(sf_dir: str):
    """Hierarchical directory rollup of the repo corpus: top-10 prefixes
    per depth by file count (langs-distinct alongside) — the census a
    trillion-file source-tree crawl starts from."""
    from sbustreamspot_core_ray.sources.corpus import (
        generate_corpus,
        ingest_corpus,
        path_rollup,
    )

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    return path_rollup(
        ingest_corpus(root, num_partitions=4), top_n=PATH_ROLLUP_N
    )


def _path_rollup_sql() -> str:
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return f"""
WITH c AS (
  SELECT string_split(repo || '/' || path, '/') AS parts, lang
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')
),
p AS (
  SELECT g.d AS depth, array_to_string(parts[1:g.d], '/') AS prefix, lang
  FROM c CROSS JOIN generate_series(1, 16) g(d)
  WHERE g.d <= len(parts) - 1
),
a AS (
  SELECT depth, prefix, count(*) AS n_files,
         count(DISTINCT lang) AS n_langs
  FROM p GROUP BY depth, prefix
)
SELECT CAST(depth AS BIGINT) AS depth, prefix,
       CAST(n_files AS BIGINT) AS n_files,
       CAST(n_langs AS BIGINT) AS n_langs
FROM a
QUALIFY row_number() OVER (PARTITION BY depth ORDER BY n_files DESC, prefix)
        <= {PATH_ROLLUP_N}"""


SPLIT_TRAIN, SPLIT_VAL = 80, 10


def q_corpus_split(sf_dir: str):
    """Leakage-free train/val/test split: near-dup components (the
    minhash pipeline) assigned WHOLE to one split by a seeded hash of the
    dup_group — near-duplicates never straddle the split boundary."""
    from sbustreamspot_core_ray.stages.curation import leakage_free_split

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return leakage_free_split(
        docs, train_pct=SPLIT_TRAIN, val_pct=SPLIT_VAL, num_parts=4
    )


def _corpus_split_sql() -> str:
    from sbustreamspot_core_ray.stages.curation import SPLIT_SALT

    two64 = 1 << 64
    return f"""
WITH RECURSIVE {_minhash_groups_core(0.8)}
SELECT doc_id, dup_group,
  CAST(CASE WHEN b < {SPLIT_TRAIN} THEN 0
            WHEN b < {SPLIT_TRAIN + SPLIT_VAL} THEN 1
            ELSE 2 END AS BIGINT) AS split
FROM (
  SELECT doc_id, dup_group,
         ((CAST(dup_group AS HUGEINT) * {SPLIT_SALT}) % {two64}) % 100 AS b
  FROM mh_groups
)"""


DSG_NUM, DSG_DEN = 11, 10  # (1+eps) = 11/10
DSG_SQL_ROUNDS = 4  # unroll depth; the data reaches fixpoint at round 1


def q_densest_peel(sf_dir: str):
    """Densest-subgraph greedy peeling (Bahmani et al. batched 2(1+eps)
    approximation): per-round (n_vertices, n_edges) audit with the exact
    integer threshold deg*den*V <= 2*num*E deciding each peel."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        densest_subgraph_peel,
    )

    return densest_subgraph_peel(
        _edges_full(sf_dir, dedup=True).materialize(),
        eps_num=DSG_NUM,
        eps_den=DSG_DEN,
    )


def _densest_peel_sql() -> str:
    """Unrolled peel rounds; round k's row is emitted iff its edge set is
    non-empty AND every earlier round actually peeled something (the Ray
    loop breaks after appending a fixpoint round)."""
    w = [f"e0 AS MATERIALIZED ({_SQL_EDGES})"]
    selects = []
    for k in range(DSG_SQL_ROUNDS):
        w.append(
            f"deg{k} AS MATERIALIZED (SELECT vertex, count(*) AS d FROM ("
            f"SELECT src AS vertex FROM e{k}"
            f" UNION ALL SELECT dst FROM e{k}) GROUP BY vertex)"
        )
        w.append(
            f"st{k} AS (SELECT (SELECT count(*) FROM deg{k}) AS v,"
            f" (SELECT count(*) FROM e{k}) AS e)"
        )
        w.append(
            f"surv{k} AS (SELECT vertex FROM deg{k}, st{k}"
            f" WHERE d * {DSG_DEN} * v > 2 * {DSG_NUM} * e)"
        )
        gates = [f"(SELECT e FROM st{k}) > 0"] + [
            f"(SELECT count(*) FROM surv{j}) < (SELECT v FROM st{j})"
            for j in range(k)
        ]
        selects.append(
            f"SELECT {k} AS round, (SELECT v FROM st{k}) AS n_vertices,"
            f" (SELECT e FROM st{k}) AS n_edges"
            f" WHERE {' AND '.join(gates)}"
        )
        if k + 1 < DSG_SQL_ROUNDS:
            w.append(
                f"e{k+1} AS MATERIALIZED (SELECT src, dst FROM e{k}"
                f" WHERE src IN (SELECT vertex FROM surv{k})"
                f" AND dst IN (SELECT vertex FROM surv{k}))"
            )
    return (
        "WITH "
        + ",\n".join(w)
        + "\nSELECT CAST(round AS BIGINT) AS round,"
        " CAST(n_vertices AS BIGINT) AS n_vertices,"
        " CAST(n_edges AS BIGINT) AS n_edges FROM ("
        + " UNION ALL ".join(selects)
        + ")"
    )


WL_ROUNDS = 2


def q_wl_colors(sf_dir: str):
    """Weisfeiler-Leman color refinement (2 rounds, directed): per-vertex
    structural-equivalence colors via a commutative Mersenne-61 multiset
    hash — the node features 1-WL graph kernels are built from."""
    from sbustreamspot_core_ray.pipelines.superstep import wl_refinement

    return wl_refinement(
        _edges_full(sf_dir, dedup=True).materialize(), rounds=WL_ROUNDS
    )


def _wl_sql() -> str:
    from sbustreamspot_core_ray.pipelines.superstep import (
        WL_CG,
        WL_CI,
        WL_CO,
        WL_CS,
    )

    p61 = (1 << 61) - 1
    w = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "v AS MATERIALIZED (SELECT src AS vertex FROM e"
        " UNION SELECT dst FROM e)",
        "c0 AS (SELECT vertex, CAST(1 AS HUGEINT) AS c FROM v)",
    ]
    for r in range(1, WL_ROUNDS + 1):
        pr = f"c{r-1}"
        w.append(
            f"so{r} AS (SELECT e.src AS vertex,"
            f" SUM((c.c * {WL_CG}) % {p61}) % {p61} AS s"
            f" FROM e JOIN {pr} c ON c.vertex = e.dst GROUP BY e.src)"
        )
        w.append(
            f"si{r} AS (SELECT e.dst AS vertex,"
            f" SUM((c.c * {WL_CG}) % {p61}) % {p61} AS s"
            f" FROM e JOIN {pr} c ON c.vertex = e.src GROUP BY e.dst)"
        )
        w.append(
            f"c{r} AS (SELECT p.vertex,"
            f" ((p.c * {WL_CS}) % {p61}"
            f" + (COALESCE(so{r}.s, 0) * {WL_CO}) % {p61}"
            f" + (COALESCE(si{r}.s, 0) * {WL_CI}) % {p61} + 1) % {p61} AS c"
            f" FROM {pr} p"
            f" LEFT JOIN so{r} ON so{r}.vertex = p.vertex"
            f" LEFT JOIN si{r} ON si{r}.vertex = p.vertex)"
        )
    return (
        "WITH "
        + ",\n".join(w)
        + f"\nSELECT vertex, CAST(c AS BIGINT) AS wl_color FROM c{WL_ROUNDS}"
    )


NEG_K = 2
NEG_C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD)
LP_TEST_PCT = 10


def q_linkpred_auc(sf_dir: str):
    """Leakage-free link-prediction evaluation: 10%% of the distinct
    canonical edges held out by pair hash, Adamic-Adar scored over the
    TRAIN graph only (integer billionths) against one seeded negative
    per positive, exact tie-corrected Mann-Whitney AUC. One row
    (n_pos, n_neg, u2, auc)."""
    from sbustreamspot_core_ray.pipelines.superstep import linkpred_holdout_auc

    return linkpred_holdout_auc(
        _edges_full(sf_dir, dedup=False),
        test_pct=LP_TEST_PCT,
        num_partitions=P,
        c1=NEG_C[0],
        c2=NEG_C[1],
        c3=NEG_C[2],
    )


def _linkpred_auc_sql() -> str:
    two64 = 1 << 64
    return f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
canon AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
lab AS (SELECT a, b,
               (a * 2654435761 + b * 40503) % 100 < {LP_TEST_PCT} AS is_test
        FROM canon),
train AS MATERIALIZED (SELECT a, b FROM lab WHERE NOT is_test),
tst AS MATERIALIZED (SELECT a, b FROM lab WHERE is_test),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT a AS v FROM canon UNION SELECT b FROM canon)),
vr AS MATERIALIZED (
  SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM verts),
-- the negative's target rank is computed in a PROJECTION first so the
-- vr join is a pure equi-join (hash join): a scalar subquery inside the
-- join condition forces a ~tst x vr nested loop (~5 min at sf0.01)
negk AS MATERIALIZED (
  SELECT t.a, t.b, CAST(
    ((CAST(t.a AS HUGEINT) * {NEG_C[0]} + CAST(t.b AS HUGEINT) * {NEG_C[1]}
      + {NEG_C[2]}) % {two64}) % (SELECT count(*) FROM verts) AS BIGINT) AS r
  FROM tst t),
neg AS MATERIALIZED (
  SELECT least(k.a, vr.v) AS a, greatest(k.a, vr.v) AS b
  FROM negk k JOIN vr ON vr.r = k.r
  WHERE k.a <> vr.v
    AND NOT EXISTS (SELECT 1 FROM canon c
                    WHERE c.a = least(k.a, vr.v) AND c.b = greatest(k.a, vr.v))
),
qn AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY pos, a, b) AS qid, a, b, pos FROM (
    SELECT a, b, 1 AS pos FROM tst UNION ALL SELECT a, b, 0 FROM neg)),
sym AS MATERIALIZED (
  SELECT a AS s, b AS d FROM train UNION ALL SELECT b, a FROM train),
wt AS MATERIALIZED (
  SELECT s, CAST(floor(1e9 / ln(count(*))) AS BIGINT) AS w
  FROM sym GROUP BY s HAVING count(*) >= 2),
-- common neighbors as a composite-key (qid, center) intersection of the
-- two adjacency fan-outs: the naive x-then-y wedge probe makes the
-- planner expand sum(deg(N(a)) * deg(center)) intermediate rows (~7 min
-- at sf0.01); this form hash-joins two |query-pair-neighborhood|-sized
-- sets and runs in seconds with the identical result
na AS MATERIALIZED (SELECT qn.qid, x.s AS c FROM qn JOIN sym x ON x.d = qn.a),
nb AS MATERIALIZED (SELECT qn.qid, y.s AS c FROM qn JOIN sym y ON y.d = qn.b),
sc0 AS (
  SELECT na.qid, SUM(wt.w) AS score
  FROM na JOIN nb ON nb.qid = na.qid AND nb.c = na.c
  JOIN wt ON wt.s = na.c
  GROUP BY na.qid),
sc AS (SELECT qn.qid, qn.pos, COALESCE(sc0.score, 0) AS score
       FROM qn LEFT JOIN sc0 USING (qid)),
g AS (SELECT score, CAST(SUM(pos) AS BIGINT) AS np_,
             CAST(SUM(1 - pos) AS BIGINT) AS nn_
      FROM sc GROUP BY score),
w2 AS (
  SELECT score, np_, nn_,
         2 * (COALESCE(SUM(np_ + nn_) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
           + (np_ + nn_) + 1 AS two_mid
  FROM g),
t AS (SELECT SUM(np_) AS n_pos, SUM(nn_) AS n_neg,
             SUM(np_ * two_mid) AS two_rs
      FROM w2)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(two_rs - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       ROUND(CAST(two_rs - n_pos * (n_pos + 1) AS DOUBLE)
             / (2 * n_pos * n_neg), 6) AS auc
FROM t"""


def q_link_negatives(sf_dir: str):
    """Link-prediction training rows: every distinct edge labeled 1 plus
    k=2 seeded-hash negative candidates per edge drawn from the distinct
    destination universe, real edges anti-joined away — deterministic
    uint64 arithmetic end-to-end, HUGEINT-mirrored in SQL."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        link_negative_samples,
    )

    return link_negative_samples(
        _edges_full(sf_dir, dedup=True).materialize(),
        k=NEG_K,
        num_partitions=P,
        c1=NEG_C[0],
        c2=NEG_C[1],
        c3=NEG_C[2],
    )


def _link_negatives_sql() -> str:
    two64 = 1 << 64
    js = ", ".join(f"({j})" for j in range(1, NEG_K + 1))
    return f"""
WITH e AS MATERIALIZED ({_SQL_EDGES}),
d AS MATERIALIZED (SELECT DISTINCT dst FROM e),
dr AS MATERIALIZED (
  SELECT dst, row_number() OVER (ORDER BY dst) - 1 AS r FROM d),
cand AS MATERIALIZED (
  SELECT e.src,
         CAST(((CAST(e.src AS HUGEINT) * {NEG_C[0]}
                + CAST(e.dst AS HUGEINT) * {NEG_C[1]}
                + CAST(j AS HUGEINT) * {NEG_C[2]}) % {two64})
              % (SELECT count(*) FROM d) AS BIGINT) AS r
  FROM e CROSS JOIN (VALUES {js}) t(j)
),
neg AS (
  SELECT c.src, dr.dst FROM cand c JOIN dr ON dr.r = c.r
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.src AND e.dst = dr.dst)
)
SELECT src, dst, CAST(1 AS BIGINT) AS label FROM e
UNION ALL
SELECT src, dst, CAST(0 AS BIGINT) AS label FROM neg
"""


TR_SEEDS = tuple(range(1, 11))  # customer keys, present at every sf
TR_START_DAY = 10227  # 1998-01-01 as epoch days: the clock the seeds start at


def q_temporal_reach(sf_dir: str):
    """Earliest-arrival reachability over the TEMPORAL supply graph
    (customer -> order at o_orderdate, order -> part and part -> supplier
    at l_shipdate, all epoch days): a path counts only if every edge
    departs no earlier than the arrival at its source — the synthetic
    data ships ~3%% of lineitems BEFORE the order date, so this is
    provably not a static BFS. Exact integer days throughout."""
    from sbustreamspot_core_ray.pipelines.superstep import temporal_reachability

    def days(col: pd.Series) -> np.ndarray:
        return col.to_numpy().astype("datetime64[D]").astype(np.int64)

    def o_edges(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(df["o_custkey"].to_numpy(np.int64)),
                "dst": pa.array(
                    10_000_000 + df["o_orderkey"].to_numpy(np.int64)
                ),
                "t": pa.array(days(df["o_orderdate"])),
            }
        )

    def l_edges(df: pd.DataFrame) -> pa.Table:
        ok = 10_000_000 + df["l_orderkey"].to_numpy(np.int64)
        pk = 20_000_000 + df["l_partkey"].to_numpy(np.int64)
        sk = 30_000_000 + df["l_suppkey"].to_numpy(np.int64)
        t = days(df["l_shipdate"])
        return pa.table(
            {
                "src": pa.array(np.concatenate([ok, pk])),
                "dst": pa.array(np.concatenate([pk, sk])),
                "t": pa.array(np.concatenate([t, t])),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    ).map_batches(o_edges, batch_format="pandas")
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_shipdate"],
    ).map_batches(l_edges, batch_format="pandas")
    return temporal_reachability(
        orders.union(line).materialize(),
        seeds=np.array(TR_SEEDS, np.int64),
        num_partitions=P,
        start_t=TR_START_DAY,
    )


def _temporal_reach_sql() -> str:
    """Recursive min-arrival walk: the UNION dedups (vertex, t) states, so
    the explored set is bounded by the edge count; MIN at the end is the
    earliest arrival. Seeds admitted iff they occur as a source."""
    seeds = ", ".join(f"({s})" for s in TR_SEEDS)
    return f"""
WITH RECURSIVE te AS MATERIALIZED (
  SELECT o_custkey AS src, 10000000 + o_orderkey AS dst,
         CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
              AS BIGINT) AS t
  FROM orders
  UNION ALL
  SELECT 10000000 + l_orderkey, 20000000 + l_partkey,
         CAST(date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 20000000 + l_partkey, 30000000 + l_suppkey,
         CAST(date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) AS BIGINT)
  FROM lineitem
),
walk(vertex, t_at) AS (
  SELECT s, CAST({TR_START_DAY} AS BIGINT) FROM (VALUES {seeds}) v(s)
  WHERE s IN (SELECT src FROM te)
  UNION
  SELECT te.dst, te.t FROM walk
  JOIN te ON te.src = walk.vertex AND te.t >= walk.t_at
)
SELECT vertex, MIN(t_at) AS t_arr FROM walk GROUP BY vertex
"""


APJ_NUM, APJ_DEN = 9, 10


def q_allpairs_jaccard(sf_dir: str):
    """Exact-threshold all-pairs Jaccard self-join (AllPairs/PPJoin
    prefix filtering over df-ordered word tokens): COMPLETE — every pair
    with token-set Jaccard >= 9/10 is returned, verified in exact
    integers (src, dst, inter, uni)."""
    from sbustreamspot_core_ray.stages.dedup import allpairs_jaccard_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    return allpairs_jaccard_join(
        docs, thr_num=APJ_NUM, thr_den=APJ_DEN, num_parts=P
    )


def _allpairs_jaccard_sql() -> str:
    """Brute-force token self-join (the oracle need not be clever) with
    the identical integer threshold inequality — no float anywhere."""
    return f"""
WITH tok AS MATERIALIZED (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
    FROM documents
  ) WHERE term <> ''
),
sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
i AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS inter
  FROM tok a JOIN tok b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.src, i.dst, CAST(inter AS BIGINT) AS inter,
       CAST(sa.n + sb.n - inter AS BIGINT) AS uni
FROM i JOIN sz sa ON sa.doc_id = i.src JOIN sz sb ON sb.doc_id = i.dst
WHERE {APJ_DEN} * inter >= {APJ_NUM} * (sa.n + sb.n - inter)
"""


def q_dedup_by_source(sf_dir: str):
    """Per-source exact-dedup impact: total docs, first-wins kept docs,
    integer ppm removal rate — one sha-key shuffle, additive per-source
    partials."""
    from sbustreamspot_core_ray.stages.dedup import dedup_by_source

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return dedup_by_source(docs, num_parts=P)


_SQL_DEDUP_BY_SOURCE = """
WITH k AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST((count(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END))
            * 1000000 // count(*) AS BIGINT) AS removed_ppm
FROM k GROUP BY source ORDER BY source
"""


def q_minhash_dedup(sf_dir: str):
    """Minhash-LSH near-dup groups. SQL-mirrored end-to-end: seeded
    permutation constants -> HUGEINT minhash/banding -> star candidate
    pairs -> exact Jaccard verify -> recursive-CTE components."""
    from sbustreamspot_core_ray.stages.dedup import minhash_lsh_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_lsh_dedup(docs, threshold=0.8, num_parts=4)


def q_simhash_dedup(sf_dir: str):
    """64-bit simhash buckets (SQL-mirrored bit-vote recomputation)."""
    from sbustreamspot_core_ray.stages.dedup import simhash_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_dedup(docs)


def q_simhash_near_dup(sf_dir: str):
    """Banded simhash near-dup pairs for hamming distance > 0 (pigeonhole
    candidates on 16-bit bands, popcount-verified); SQL-mirrored via
    bit_count(xor) over the recomputed simhashes."""
    from sbustreamspot_core_ray.stages.dedup import simhash_near_dup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_near_dup(docs, max_hamming=16, bands=4)


def q_knn_cosine(sf_dir: str):
    """Exact cosine top-k of every embedding vs the first KNN_NQ vectors,
    in integer-quantized parity mode (stages/ann.py QUANT_SCALE): dots and
    norms are exact integers on both sides, the cut ranks on the RAW
    cosine with a (desc, vec_id) tie-break identical to the SQL window,
    and rounding happens only on output."""
    from sbustreamspot_core_ray.stages.ann import QUANT_SCALE, knn_brute_force

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qdf = emb.filter(expr=f"vec_id < {KNN_NQ}").to_pandas().sort_values("vec_id")
    queries = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = knn_brute_force(
        emb, queries, k=KNN_K, quantize_scale=QUANT_SCALE
    ).to_pandas()
    out["query_idx"] = qdf["vec_id"].to_numpy()[out["query_idx"].to_numpy()]
    out["cosine"] = round_half_away(out["cosine"], 6)
    return out.reset_index(drop=True)


def q_ann_recall(sf_dir: str):
    """recall@k evaluation of BOTH approximate indexes (IVF, sign-LSH)
    against the exact brute-force ground truth — the quality gate an ANN
    deployment runs before trusting the scale path. Per (method, query):
    integer overlap count and recall = n_hits / k (one exact division).
    Composes the three existing pipelines; the SQL mirror composes their
    three oracles identically."""
    ex = q_knn_cosine(sf_dir)[["query_idx", "vec_id"]]
    frames = []
    for method, fn in (("ivf", q_knn_ivf), ("lsh", q_knn_lsh)):
        ap = fn(sf_dir)[["query_idx", "vec_id"]].copy()
        ap["hit"] = 1
        m = ex.merge(ap, on=["query_idx", "vec_id"], how="left")
        g = (
            m.groupby("query_idx", as_index=False)["hit"]
            .sum()
            .rename(columns={"hit": "n_hits"})
        )
        g["n_hits"] = g["n_hits"].fillna(0).astype(np.int64)
        g["method"] = method
        g["recall"] = round_half_away(
            g["n_hits"].to_numpy(np.float64) / KNN_K, 6
        )
        frames.append(g[["method", "query_idx", "n_hits", "recall"]])
    return pd.concat(frames, ignore_index=True)


MMR_K = 10
MMR_CAND = 50
MMR_LAMBDA = 0.5


def q_mmr_diversify(sf_dir: str):
    """MMR-diversified top-k for query vector = embedding of vec_id 0:
    greedy lam*rel - (1-lam)*max-sim-to-selected over the top-MMR_CAND
    cosine candidates, bit-identical to the unrolled SQL greedy chain
    (integer-quantized parity arithmetic throughout)."""
    from sbustreamspot_core_ray.stages.ann import mmr_select

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    q0 = emb.filter(expr="vec_id == 0").to_pandas()["embedding"].iloc[0]
    out = mmr_select(
        emb,
        np.asarray(q0, np.float64),
        k=MMR_K,
        n_candidates=MMR_CAND,
        lam=MMR_LAMBDA,
    )
    out["score"] = round_half_away(out["score"], 6)
    return out


def _mmr_sql() -> str:
    """Unrolled MMR greedy chain: candidate top-MMR_CAND by raw quantized
    cosine, pairwise candidate sims, then MMR_K argmax steps each joining
    the accumulated selection (score desc, vec_id tie-break) — every float
    expression identical to the Ray side."""
    lam, com = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    ctes = [
        f"qe AS MATERIALIZED (SELECT vec_id, {_Q_EMB} AS q FROM embeddings)",
        "q0 AS (SELECT q AS qq FROM qe WHERE vec_id = 0)",
        f"cand AS MATERIALIZED (SELECT e.vec_id, {_q_cos('q0.qq', 'e.q')} AS raw, e.q"
        f" FROM q0, qe e"
        f" QUALIFY row_number() OVER (ORDER BY raw DESC, e.vec_id) <= {MMR_CAND})",
        f"pw AS MATERIALIZED (SELECT x.vec_id AS i, y.vec_id AS j,"
        f" {_q_cos('x.q', 'y.q')} AS s FROM cand x, cand y)",
        f"acc1 AS MATERIALIZED (SELECT vec_id, {lam} * raw - {com} * 0.0"
        f" AS score, CAST(1 AS BIGINT) AS rnk FROM cand"
        f" ORDER BY score DESC, vec_id LIMIT 1)",
    ]
    for r in range(2, MMR_K + 1):
        p = r - 1
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT c.vec_id,"
            f" {lam} * c.raw - {com} * m.ms AS score,"
            f" CAST({r} AS BIGINT) AS rnk FROM cand c"
            f" JOIN (SELECT p.i AS vec_id, MAX(p.s) AS ms FROM pw p"
            f" JOIN acc{p} s ON s.vec_id = p.j GROUP BY p.i) m"
            f" ON m.vec_id = c.vec_id"
            f" WHERE c.vec_id NOT IN (SELECT vec_id FROM acc{p})"
            f" ORDER BY score DESC, c.vec_id LIMIT 1)"
        )
        ctes.append(
            f"acc{r} AS MATERIALIZED (SELECT * FROM acc{p}"
            f" UNION ALL SELECT * FROM a{r})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT rnk, vec_id, ROUND(score, 6) AS score FROM acc{MMR_K}"
        " ORDER BY rnk"
    )


IVF_NC = 8
IVF_NPROBE = 3
NEARDUP_PLANES = 4
NEARDUP_THRESH = 0.35


def _ivf_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic IVF quantizer: pure-numpy spherical k-means (float64)
    on the first 2048 embedding rows. Shared verbatim between q_knn_ivf and
    the SQL oracle's embedded constants — the quantizer is a model INPUT;
    assignment, probing and top-k are recomputed independently in SQL."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.stages.ann import kmeans_centroids

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    X = np.stack(
        [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()[:2048]]
    )
    return kmeans_centroids(X, IVF_NC, seed=23)


def q_knn_ivf(sf_dir: str):
    """IVF approximate top-k (bucketed scale path) in integer-quantized
    parity mode. Centroids embedded as quantized constants in SQL; bucket
    assignment (argmax of exact integer dot, tie -> lowest centroid),
    probe choice, and pruned top-k (raw cosine desc, vec_id) recomputed
    independently on both sides over the identical integers."""
    from sbustreamspot_core_ray.stages.ann import QUANT_SCALE, knn_ivf

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qdf = emb.filter(expr=f"vec_id < {KNN_NQ}").to_pandas().sort_values("vec_id")
    queries = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = knn_ivf(
        emb,
        queries,
        k=KNN_K,
        n_centroids=IVF_NC,
        n_probe=IVF_NPROBE,
        centroids=_ivf_centroids(sf_dir),
        quantize_scale=QUANT_SCALE,
    ).to_pandas()
    out["query_idx"] = qdf["vec_id"].to_numpy()[out["query_idx"].to_numpy()]
    out["cosine"] = round_half_away(out["cosine"], 6)
    return out.reset_index(drop=True)


def q_embedding_near_dup(sf_dir: str):
    """Hyperplane-bucketed cosine near-dup pairs in integer-quantized
    parity mode: sign bits and pair cosines computed on the identical
    exact integers both sides; threshold tested on the raw value."""
    from sbustreamspot_core_ray.stages.ann import QUANT_SCALE, embedding_near_dup

    out = embedding_near_dup(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        threshold=NEARDUP_THRESH,
        n_planes=NEARDUP_PLANES,
        quantize_scale=QUANT_SCALE,
    ).to_pandas()
    out["cosine"] = round_half_away(out["cosine"], 6)
    return out


def q_embedding_dedup(sf_dir: str):
    """Semantic dedup cluster assignment: near-dup pairs (integer-quantized
    hyperplane buckets + exact-parity cosines) → connected components →
    (vec_id, dup_group = min vec_id of the cluster; singletons = self)."""
    from sbustreamspot_core_ray.stages.ann import QUANT_SCALE, embedding_dedup

    return embedding_dedup(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        threshold=NEARDUP_THRESH,
        n_planes=NEARDUP_PLANES,
        quantize_scale=QUANT_SCALE,
    )


def _embedding_dedup_sql() -> str:
    """Near-dup pair SQL + recursive min-label components + COALESCE to
    self for singleton vectors."""
    return f"""
WITH RECURSIVE prs AS MATERIALIZED ({_embedding_near_dup_sql()}),
e AS (SELECT src AS s, dst AS d FROM prs UNION SELECT dst, src FROM prs),
reach(vx, lbl) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM e) t(s)
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN e ON e.s = r.vx
),
comp AS (SELECT vx, MIN(lbl) AS c FROM reach GROUP BY vx)
SELECT v.vec_id, COALESCE(comp.c, v.vec_id) AS dup_group
FROM embeddings v LEFT JOIN comp ON comp.vx = v.vec_id"""


def q_ngram_jaccard(sf_dir: str):
    """Exact n-gram Jaccard scores for LSH candidate pairs (SQL-mirrored;
    the seeded minhash permutations are embedded as SQL constants)."""
    from sbustreamspot_core_ray.stages.dedup import (
        candidate_pairs,
        minhash_band_table,
        ngram_jaccard_verify,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cands = candidate_pairs(minhash_band_table(docs))
    out = ngram_jaccard_verify(cands, docs, threshold=0.0).to_pandas()
    out["jaccard"] = round_half_away(out["jaccard"], 6)
    return out


def q_ngram_containment(sf_dir: str):
    """Asymmetric n-gram containment for LSH candidate pairs: |A∩B|/|A|
    and |A∩B|/|B| — the near-superset detector Jaccard misses when one
    document embeds a much larger one (quote/boilerplate inclusion).
    Same seeded minhash candidate generation as ngram_jaccard; integer
    intersection counts and one division per direction keep both sides
    bit-identical."""
    from sbustreamspot_core_ray.stages.dedup import (
        candidate_pairs,
        minhash_band_table,
        ngram_containment_verify,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cands = candidate_pairs(minhash_band_table(docs))
    out = ngram_containment_verify(cands, docs, threshold=0.0).to_pandas()
    out["containment_src"] = round_half_away(out["containment_src"], 6)
    out["containment_dst"] = round_half_away(out["containment_dst"], 6)
    return out


def q_rich_club(sf_dir: str):
    """Rich-club coefficient per degree threshold k: among the N_k
    vertices of degree > k, the fraction of possible edges present,
    2*E_k / (N_k*(N_k-1)). E_k is a suffix sum of the per-edge
    min-endpoint-degree histogram and N_k a suffix sum of the degree
    histogram — two bounded histograms reach the driver, never a k x E
    sweep."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.pipelines.superstep import (
        _attach_value,
        distinct,
        int_degrees,
    )

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                )
            }
        )

    # shared sub-plans consumed twice -> materialize once
    und = distinct(
        _edges_full(sf_dir, dedup=False).map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
    ).materialize()
    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_parts=P
    ).materialize()

    # two-regime degree lookup (triangle_count's pattern): below the
    # threshold the V-scale (vertex, deg) table broadcasts once via
    # ray.put and each edge batch resolves min(deg_a, deg_b) with two
    # searchsorteds — ZERO extra shuffles; above it, fall back to the two
    # co-partitioned attach joins (each one E-scale shuffle).
    RICH_CLUB_BROADCAST_MAX = 20_000_000  # vertices (~320 MB of int64 pairs)
    if deg.count() <= RICH_CLUB_BROADCAST_MAX:
        dtab = deg.to_pandas()
        vs = dtab["vertex"].to_numpy(np.int64)
        ds_ = dtab["deg"].to_numpy(np.int64)
        order = np.argsort(vs, kind="stable")
        deg_ref = ray.put((vs[order], ds_[order]))

        def min_hist_b(t: pa.Table) -> pa.Table:
            verts, degs = ray.get(deg_ref)
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            da = degs[np.searchsorted(verts, a)]
            db = degs[np.searchsorted(verts, b)]
            m = np.minimum(da, db)
            u, c = np.unique(m, return_counts=True)
            return pa.table({"m": u, "cnt": c.astype(np.int64)})

        mh_rows = und.map_batches(min_hist_b, batch_format="pyarrow").take_all()
    else:
        e1 = _attach_value(und, deg, "a", ["b"], "deg", "da", num_parts=P)
        e2 = _attach_value(e1, deg, "b", ["a", "da"], "deg", "db", num_parts=P)

        def min_hist(t: pa.Table) -> pa.Table:
            m = np.minimum(t["da"].to_numpy(), t["db"].to_numpy())
            u, c = np.unique(m, return_counts=True)
            return pa.table({"m": u, "cnt": c.astype(np.int64)})

        mh_rows = e2.map_batches(min_hist, batch_format="pyarrow").take_all()

    def deg_hist(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["deg"].to_numpy(), return_counts=True)
        return pa.table({"deg": u, "cnt": c.astype(np.int64)})

    mh = pd.DataFrame(mh_rows, columns=["m", "cnt"])
    dh = pd.DataFrame(
        deg.map_batches(deg_hist, batch_format="pyarrow").take_all(),
        columns=["deg", "cnt"],
    )
    mh = mh.groupby("m", as_index=False)["cnt"].sum().sort_values("m")
    dh = dh.groupby("deg", as_index=False)["cnt"].sum().sort_values("deg")
    du = dh["deg"].to_numpy(np.int64)
    dcnt = dh["cnt"].to_numpy(np.int64)
    mu = mh["m"].to_numpy(np.int64)
    mcnt = mh["cnt"].to_numpy(np.int64)
    total_v = dcnt.sum()
    total_e = mcnt.sum()
    # suffix counts: n_k = #vertices deg > k; e_k = #edges min-end-deg > k
    n_k = total_v - np.cumsum(dcnt)[np.searchsorted(du, du, side="right") - 1]
    e_k = total_e - np.concatenate([[0], np.cumsum(mcnt)])[
        np.searchsorted(mu, du, side="right")
    ]
    keep = n_k >= 2
    k, n_k, e_k = du[keep], n_k[keep], e_k[keep]
    rc = round_half_away(
        2.0 * e_k.astype(np.float64) / (n_k.astype(np.float64) * (n_k - 1.0)), 6
    )
    return pd.DataFrame(
        {"k": k, "n_k": n_k, "e_k": e_k, "rich_club": rc}
    )


def q_image_phash(sf_dir: str):
    """Perceptual blockhash image dedup over the derived media table:
    64-block mean-threshold bits packed into int64 (integer-only — the
    block-vs-global mean test is cross-multiplied), dup_group = min
    media_id per hash. Bit-exact SQL mirror via byte-level substring."""
    from sbustreamspot_core_ray.stages.multimodal import (
        image_blockhash,
        media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return image_blockhash(media_from_documents(docs), num_partitions=P)


def q_media_features(sf_dir: str):
    """Binary media columns -> actor-pool decode -> per-image pixel
    features. Every REAL_MEDIA_MOD-th image row carries a REAL PNG payload
    (pure-stdlib zlib decode end-to-end); the rest go through the
    deterministic fake codec. Both paths are value-checked by the oracle,
    which recomputes the real rows' decoded pixels closed-form."""
    from sbustreamspot_core_ray.stages.multimodal import (
        image_features,
        media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = image_features(
        media_from_documents(docs, real_mod=REAL_MEDIA_MOD)
    ).to_pandas()
    for c in ("px_mean", "px_std", "edge_energy"):
        out[c] = round_half_away(out[c], 6)
    return out


def q_audio_frames(sf_dir: str):
    """Audio payloads -> frame-sampled RMS energy rows. Every
    REAL_MEDIA_MOD-th audio row carries a REAL PCM16 WAV payload (RIFF
    parse decode end-to-end); the rest go through the deterministic fake
    codec. Both paths value-checked by the oracle."""
    from sbustreamspot_core_ray.stages.multimodal import (
        audio_frames,
        media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = audio_frames(
        media_from_documents(docs, real_mod=REAL_MEDIA_MOD)
    ).to_pandas()
    out["rms"] = round_half_away(out["rms"], 6)
    return out


def q_video_frames(sf_dir: str):
    """Video payloads -> sampled frame payload rows (frame count + byte
    length per sampled frame); SQL-mirrored through the deterministic fake
    codec's byte arithmetic."""
    from sbustreamspot_core_ray.stages.multimodal import (
        media_from_documents,
        video_frame_sample,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    frames = video_frame_sample(media_from_documents(docs))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["media_id"],
                "frame_no": t["frame_no"],
                "frame_bytes": pc.cast(
                    pc.binary_length(t["frame_payload"]), pa.int64()
                ),
            }
        )

    return frames.map_batches(fmt, batch_format="pyarrow")


RESIZE_TO = 16


def q_image_resize(sf_dir: str):
    """Multimodal resize path: fake-decode -> REAL vectorized
    nearest-neighbor resize to 16x16 -> per-image features. The SQL oracle
    replays the integer index mapping ri=(oi*h)//16, ci=(oj*w)//16 over the
    tiled byte space."""
    from sbustreamspot_core_ray.stages.multimodal import (
        image_features,
        media_from_documents,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = image_features(
        media_from_documents(docs), resize_to=RESIZE_TO
    ).to_pandas()
    for c in ("px_mean", "px_std", "edge_energy"):
        out[c] = round_half_away(out[c], 6)
    return out


_SQL_IMAGE_RESIZE = f"""
WITH img AS (
  SELECT doc_id, text, length(text) AS n,
         greatest(CAST(floor(sqrt(length(text))) AS BIGINT), 1) AS w
  FROM documents WHERE doc_id % 3 = 0
),
dims AS (SELECT doc_id, text, n, w, greatest(n // w, 1) AS h FROM img),
px AS (
  SELECT doc_id, g.oi AS oi, g2.oj AS oj, g3.ch AS ch,
         ascii(substring(text,
           CAST((((((g.oi * h) // {RESIZE_TO}) * w + ((g2.oj * w) // {RESIZE_TO}))
                  * 3 + g3.ch) % n) + 1 AS INT), 1)) AS b
  FROM dims,
       generate_series(0, {RESIZE_TO - 1}) g(oi),
       generate_series(0, {RESIZE_TO - 1}) g2(oj),
       generate_series(0, 2) g3(ch)
),
m AS (SELECT doc_id, AVG(CAST(b AS DOUBLE)) AS mean FROM px GROUP BY doc_id),
sd AS (
  SELECT p.doc_id, sqrt(AVG((p.b - m.mean) * (p.b - m.mean))) AS sdev
  FROM px p JOIN m ON m.doc_id = p.doc_id GROUP BY p.doc_id
),
ed AS (
  SELECT a.doc_id, AVG(CAST(abs(b2.b - a.b) AS DOUBLE)) AS ee
  FROM px a JOIN px b2 ON b2.doc_id = a.doc_id AND b2.oi = a.oi
                      AND b2.ch = a.ch AND b2.oj = a.oj + 1
  GROUP BY a.doc_id
)
SELECT m.doc_id AS media_id, ROUND(m.mean, 6) AS px_mean,
       ROUND(sd.sdev, 6) AS px_std, ROUND(ed.ee, 6) AS edge_energy
FROM m JOIN sd ON sd.doc_id = m.doc_id JOIN ed ON ed.doc_id = m.doc_id
"""


def q_scene_cuts(sf_dir: str):
    """Shot-boundary detection over video payloads: frame-to-frame
    intensity deltas through the deterministic fake codec, cuts flagged at
    |delta| >= threshold; SQL-mirrored by per-frame char-code sums over
    the identical wrapped slices."""
    from sbustreamspot_core_ray.stages.multimodal import (
        media_from_documents,
        scene_cuts,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return scene_cuts(media_from_documents(docs))


_SQL_SCENE_CUTS = """
WITH vid AS (
  SELECT doc_id, text, length(text) AS n,
         least(greatest(length(text) // 256, 1), 32) AS nf
  FROM documents WHERE doc_id % 3 = 2
),
fr AS (
  SELECT doc_id, CAST(g.f AS INT) AS frame_no,
         CAST(list_sum(list_transform(
             string_split(substr(text || text,
                                 ((g.f * 256) % greatest(n, 1)) + 1, 256), ''),
             c -> ascii(c))) AS BIGINT) AS inten
  FROM vid, generate_series(0, 31) g(f)
  WHERE g.f < nf AND nf >= 2
),
tr AS (
  SELECT doc_id, frame_no, inten,
         inten - LAG(inten) OVER (PARTITION BY doc_id ORDER BY frame_no)
           AS delta
  FROM fr
)
SELECT doc_id AS media_id, frame_no, inten AS intensity, delta,
       abs(delta) >= 300 AS is_cut
FROM tr WHERE delta IS NOT NULL
"""


def q_corpus_pipeline(sf_dir: str):
    """The flagship corpus pipeline (synthetic deterministic corpus ->
    sha256-validated ingest -> edge extraction -> counts); SQL-mirrored by
    an independent regexp extraction over the same corpus files."""
    from sbustreamspot_core_ray.sources.corpus import generate_corpus, ingest_corpus
    from sbustreamspot_core_ray.sources.edges import extract_edges

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    corpus = ingest_corpus(root, num_partitions=4)
    edges = extract_edges(corpus)
    out = (
        edges.groupby("e_type")
        .count()
        .rename_columns({"count()": "n_edges"})
        .to_pandas()
    )
    out["e_type"] = out["e_type"].astype(np.int64)
    return out.sort_values("e_type").reset_index(drop=True)


SHARED_IMPORTS_K = 20


def q_shared_imports(sf_dir: str):
    """Library detection on the corpus import graph: top-k import targets
    by distinct importing repos (total imports, then target, as
    tiebreaks). Pair-dedup combiner -> one (target, repo) groupby ->
    additive per-target fold -> per-block top-k cut."""
    from sbustreamspot_core_ray.sources.corpus import (
        generate_corpus,
        ingest_corpus,
        shared_import_targets,
    )

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    return shared_import_targets(
        ingest_corpus(root, num_partitions=4), k=SHARED_IMPORTS_K
    )


def _shared_imports_sql() -> str:
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return rf"""
WITH c AS (
  SELECT repo, path, content
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')
),
imp AS (
  SELECT repo, repo || '/' || path AS fullpath,
         unnest(regexp_extract_all(content, '(?m)^import\s+(\S+)$', 1)) AS tgt
  FROM c
)
SELECT tgt AS target, COUNT(DISTINCT repo) AS n_repos,
       COUNT(*) AS n_imports
FROM imp WHERE tgt <> fullpath
GROUP BY tgt
ORDER BY n_repos DESC, n_imports DESC, tgt
LIMIT {SHARED_IMPORTS_K}"""


BP_MIN_LEN = 8
BP_MIN_FILES = 2
BP_TOP = 100


def q_boilerplate_lines(sf_dir: str):
    """C4-style boilerplate detection over the code corpus: top repeated
    space-trimmed lines (len >= BP_MIN_LEN) by DISTINCT-file count, kept
    when shared by >= BP_MIN_FILES files. Per-file dedup is batch-local
    (one row per file) -> hashed-partition fold -> driver merge."""
    from sbustreamspot_core_ray.sources.corpus import (
        boilerplate_lines,
        generate_corpus,
        ingest_corpus,
    )

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    return boilerplate_lines(
        ingest_corpus(root, num_partitions=4),
        min_len=BP_MIN_LEN,
        min_files=BP_MIN_FILES,
        top_n=BP_TOP,
    )


def _boilerplate_sql() -> str:
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return f"""
WITH c AS (
  SELECT repo || '/' || path AS f, content
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')
),
raw AS (SELECT f, unnest(string_split(content, chr(10))) AS x FROM c),
n AS (
  SELECT DISTINCT f, trim(x) AS line FROM raw
  WHERE length(trim(x)) >= {BP_MIN_LEN}
),
cnt AS (SELECT line, CAST(COUNT(*) AS BIGINT) AS n_files FROM n GROUP BY line)
SELECT line, n_files FROM cnt WHERE n_files >= {BP_MIN_FILES}
ORDER BY n_files DESC, line LIMIT {BP_TOP}"""


KNN_LSH_PLANES = 5


def q_knn_lsh(sf_dir: str):
    """LSH sign-bucketed approximate top-k (the hash-bucket scale path,
    sibling of IVF) in integer-quantized parity mode: hyperplanes embedded
    as quantized SQL constants, each query multiprobes its own bucket plus
    the hamming-1 neighbors, top-k ranks on (raw cosine desc, vec_id)."""
    from sbustreamspot_core_ray.stages.ann import QUANT_SCALE, knn_lsh

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    qdf = emb.filter(expr=f"vec_id < {KNN_NQ}").to_pandas().sort_values("vec_id")
    queries = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    out = knn_lsh(
        emb, queries, k=KNN_K, n_planes=KNN_LSH_PLANES, quantize_scale=QUANT_SCALE
    ).to_pandas()
    out["query_idx"] = qdf["vec_id"].to_numpy()[out["query_idx"].to_numpy()]
    out["cosine"] = round_half_away(out["cosine"], 6)
    return out.reset_index(drop=True)


def _knn_lsh_sql() -> str:
    """LSH ANN in SQL over quantized integers: the seeded hyperplanes are
    embedded as quantized constants (model input); bucket bits, multiprobe
    set (own bucket UNION one-bit xor flips) and the pruned top-k are
    recomputed independently over the identical integers."""
    import pyarrow.parquet as pq

    from sbustreamspot_core_ray.stages.ann import hyperplanes, quantize

    t = pq.read_table(f"{_ORACLE_SF}/embeddings.parquet", columns=["embedding"])
    d = len(t["embedding"][0])
    planes = quantize(hyperplanes(KNN_LSH_PLANES, d, seed=23, dtype=np.float64))
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(q, {_sql_list(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    flips = ", ".join(f"({1 << i})" for i in range(KNN_LSH_PLANES))
    return f"""
WITH qe AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings),
bk AS (SELECT vec_id, q, {bucket_terms} AS bucket FROM qe),
qq AS (SELECT vec_id AS qid, q AS qv, bucket AS qb FROM bk WHERE vec_id < {KNN_NQ}),
probe AS (
  SELECT qid, qb AS bucket FROM qq
  UNION
  SELECT qid, xor(qb, f.b) FROM qq, (VALUES {flips}) f(b)
),
sims AS (
  SELECT q.qid AS query_idx, a.vec_id, {_q_cos('q.qv', 'a.q')} AS raw
  FROM qq q JOIN probe p ON p.qid = q.qid JOIN bk a ON a.bucket = p.bucket
)
SELECT query_idx, vec_id, ROUND(raw, 6) AS cosine FROM sims
QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY raw DESC, vec_id)
        <= {KNN_K}"""


def q_term_df(sf_dir: str):
    """Top-100 corpus terms by document frequency (vocabulary/stopword
    stats): per-batch distinct-(doc, term) combiner -> one groupby over
    partial counts -> sort+limit. Tokenization = lower + single-space
    split, mirroring string_split(lower(text), ' ') exactly."""
    from sbustreamspot_core_ray.stages.text import term_doc_freq

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return term_doc_freq(docs, top_n=100)


def q_type_token_ratio(sf_dir: str):
    """Per-source lexical diversity (type-token ratio): distinct terms /
    total tokens per source, hashed-(source, term)-partition fold, one
    cheap-key shuffle."""
    from sbustreamspot_core_ray.stages.text import type_token_ratio

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return type_token_ratio(docs)


_SQL_TTR = """
WITH t AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types
  FROM t WHERE term <> '' GROUP BY source
)
SELECT source, n_types, n_tokens,
       ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
FROM tt ORDER BY source
"""


VOCAB_BUCKET = 2  # doc_id bucket width (synthetic corpus vocab saturates fast)


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: new-terms-per-doc_id-bucket and the
    cumulative vocabulary curve. First occurrence = min(doc_id) per term
    (order-independent combinable), so one vocabulary-sized groupby-min
    shuffle + a tiny bucket fold replaces any sequential corpus scan."""
    from sbustreamspot_core_ray.stages.text import vocab_growth

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return vocab_growth(docs, bucket_width=VOCAB_BUCKET)


_SQL_VOCAB_GROWTH = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
f AS (
  SELECT term, min(doc_id) AS first_doc FROM t WHERE term <> '' GROUP BY term
),
b AS (
  SELECT CAST(floor(first_doc / {VOCAB_BUCKET}) AS BIGINT) AS bucket,
         count(*) AS new_terms
  FROM f GROUP BY 1
)
SELECT bucket, new_terms,
       CAST(SUM(new_terms) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab
FROM b ORDER BY bucket"""


def q_term_tf(sf_dir: str):
    """Zipf head: top-100 corpus terms by TOTAL occurrence count —
    same combiner shape as term_df without the per-doc distinct."""
    from sbustreamspot_core_ray.stages.text import term_total_freq

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return term_total_freq(docs, top_n=100)


FH_DIM = 256  # feature-hashing output dimensionality


def q_feature_hashing(sf_dir: str):
    """Hashing-trick featurization: sparse signed `FH_DIM`-bucket term
    features per document (j = term_hash % dim, sign from bit 8 of the
    61-bit hash), zero cells dropped. Vocabulary-free — each batch hashes
    only its distinct terms."""
    from sbustreamspot_core_ray.stages.text import feature_hashing

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return feature_hashing(docs, dim=FH_DIM, num_parts=P)


def _feature_hashing_sql() -> str:
    m = (1 << 61) - 1
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tt AS (SELECT doc_id, term FROM t WHERE term <> ''),
vocab AS (SELECT DISTINCT term FROM tt),
pw(i, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i+1, (p * 257) % {m} FROM pw
  WHERE i < (SELECT max(length(term)) FROM vocab)
),
b AS (
  SELECT term, g.i AS pos, ascii(substring(term, CAST(g.i AS INT), 1)) AS byte,
         length(term) AS n
  FROM vocab, generate_series(1, 256) g(i) WHERE g.i <= length(term)
),
h AS (
  SELECT term,
         CAST(SUM((CAST(byte AS HUGEINT) * pw.p) % {m}) % {m} AS BIGINT) AS h
  FROM b JOIN pw ON pw.i = b.n - b.pos GROUP BY term
),
f AS (
  SELECT tt.doc_id, h.h % {FH_DIM} AS j,
         CASE WHEN (h.h // 256) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM tt JOIN h USING (term)
)
SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(SUM(sgn) AS BIGINT) AS val
FROM f GROUP BY doc_id, j HAVING SUM(sgn) <> 0"""


IC_ROUNDS = 4
IC_TH = (3 << 64) // 10  # activation gate: hash < 0.3 * 2^64 (exact int)
IC_C = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x94D049BB133111EB)


def q_ic_cascade(sf_dir: str):
    """Deterministic independent-cascade diffusion from the seed
    customers: an edge (u, v) fires in round k iff the seeded integer
    hash (u*C1 + v*C2 + k*C3) mod 2^64 falls below the exact integer
    threshold 0.3*2^64 — randomness replaced by a mirrored hash gate, so
    the simulation is reproducible and SQL-checkable. Synchronous
    rounds; output (round, n_new) newly-activated counts.

    Scale shape: the active set broadcasts per round (sorted array via
    ray.put) and the distinct edge table streams once per round with a
    vectorized gate — T passes, no shuffle; a web-scale active set would
    switch to the co-partitioned membership join, same contract as the
    attach fast path."""
    from sbustreamspot_core_ray.functions.proccache import cached_get
    from sbustreamspot_core_ray.pipelines.superstep import distinct

    C1, C2, C3 = (np.uint64(c) for c in IC_C)
    th = np.uint64(IC_TH)

    de = distinct(_edges_full(sf_dir, dedup=False), ["src", "dst"]).materialize()

    # seeds that exist in the graph (round 0): per-batch presence bitmask
    # (|seeds| <= 64), driver ORs the tiny ints — edges never leave workers
    seeds = np.array(PPR_SEEDS, np.int64)

    def seed_mask(t: pa.Table) -> pa.Table:
        hit = np.isin(seeds, t["src"].to_numpy()) | np.isin(
            seeds, t["dst"].to_numpy()
        )
        m = int(np.sum((1 << np.arange(len(seeds)))[hit]))
        return pa.table({"m": pa.array([m], pa.int64())})

    mask = 0
    for b in de.map_batches(seed_mask, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for m in b["m"].to_pylist():
            mask |= int(m)
    present = (mask >> np.arange(len(seeds))) & 1 == 1
    active = np.sort(seeds[present])
    out_rounds = [0]
    out_new = [int(len(active))]

    for k in range(1, IC_ROUNDS + 1):
        ref = ray.put(active)
        kk = np.uint64(k)

        def gate(t: pa.Table, _ref=ref, _k=kk) -> pa.Table:
            act = cached_get(_ref)
            s = t["src"].to_numpy()
            d = t["dst"].to_numpy()
            si = np.searchsorted(act, s)
            src_on = (si < len(act)) & (
                act[np.clip(si, 0, max(len(act) - 1, 0))] == s
            )
            di = np.searchsorted(act, d)
            dst_off = ~(
                (di < len(act))
                & (act[np.clip(di, 0, max(len(act) - 1, 0))] == d)
            )
            cand = src_on & dst_off
            s_, d_ = s[cand], d[cand]
            with np.errstate(over="ignore"):
                h = (
                    s_.view(np.uint64) * np.uint64(IC_C[0])
                    + d_.view(np.uint64) * np.uint64(IC_C[1])
                    + _k * np.uint64(IC_C[2])
                )
            fire = h < np.uint64(IC_TH)
            return pa.table({"v": pa.array(np.unique(d_[fire]))})

        news = []
        for b in de.map_batches(gate, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if b.num_rows:
                news.append(b["v"].to_numpy())
        new = (
            np.setdiff1d(np.unique(np.concatenate(news)), active)
            if news
            else np.array([], np.int64)
        )
        out_rounds.append(k)
        out_new.append(int(len(new)))
        active = np.union1d(active, new)

    return pa.table(
        {
            "round": pa.array(out_rounds, pa.int64()),
            "n_new": pa.array(out_new, pa.int64()),
        }
    )


def _ic_cascade_sql() -> str:
    two64 = 1 << 64
    seeds = ", ".join(str(s) for s in PPR_SEEDS)
    ctes = [
        f"e AS MATERIALIZED ({_SQL_EDGES})",
        "verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        f"a0 AS MATERIALIZED (SELECT v FROM verts WHERE v IN ({seeds}))",
    ]
    for k in range(1, IC_ROUNDS + 1):
        p = k - 1
        ctes.append(
            f"n{k} AS MATERIALIZED (SELECT DISTINCT e.dst AS v FROM e"
            f" JOIN a{p} ON a{p}.v = e.src"
            f" WHERE e.dst NOT IN (SELECT v FROM a{p})"
            f" AND (CAST(e.src AS HUGEINT) * {IC_C[0]}"
            f"      + CAST(e.dst AS HUGEINT) * {IC_C[1]}"
            f"      + {k} * CAST({IC_C[2]} AS HUGEINT)) % {two64} < {IC_TH})"
        )
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT v FROM a{p} UNION SELECT v FROM n{k})"
        )
    selects = ["SELECT 0 AS round, CAST(count(*) AS BIGINT) AS n_new FROM a0"]
    selects += [
        f"SELECT {k}, CAST(count(*) AS BIGINT) FROM n{k}"
        for k in range(1, IC_ROUNDS + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def q_partitioned_write(sf_dir: str):
    """End-to-end resumable-sink round trip through the driver contract:
    write documents partitioned by lang (one directory per partition,
    atomic part files, _SUCCESS markers, manifest), read only completed
    partitions back, and return per-lang row counts — proving the write
    path, not just the transform. The scratch root is wiped first so the
    query is deterministic; the skip-on-resume behavior is covered by
    test_sinks."""
    import shutil

    from sbustreamspot_core_ray.sources.sinks import (
        read_partitioned,
        write_partitioned_resumable,
    )

    root = f"/tmp/graft_pwrite_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(root, ignore_errors=True)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    write_partitioned_resumable(docs, root, "lang")
    back = read_partitioned(root)

    acc: dict[str, int] = {}
    for b in back.map_batches(
        lambda df: df.groupby("lang", sort=False)
        .size()
        .rename("n")
        .reset_index(),
        batch_format="pandas",
    ).iter_batches(batch_format="pyarrow"):
        for l_, n_ in zip(b["lang"].to_pylist(), b["n"].to_pylist()):
            acc[l_] = acc.get(l_, 0) + int(n_)
    langs = sorted(acc)
    return pa.table(
        {
            "lang": pa.array(langs),
            "n_docs": pa.array([acc[l] for l in langs], pa.int64()),
        }
    )


def _partitioned_write_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang"""


KANON_BUCKET = 100_000  # acctbal cents per quasi-identifier bucket


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the customer quasi-identifier triple
    (nation, market segment, account-balance bucket): the histogram of
    equivalence-class sizes (k, n_groups, n_rows) — the table a privacy
    review reads to find re-identifiable rows (k = 1 singletons first).
    Combiner pass: per-batch QI counts, one bounded-cardinality fold,
    driver histogram."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partials(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        bucket = np.floor_divide(cents, KANON_BUCKET)
        import pandas as pd

        g = (
            pd.DataFrame({"nk": nk, "seg": seg, "bk": bucket})
            .groupby(["nk", "seg", "bk"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    acc: dict[tuple, int] = {}
    for b in cust.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for nk, seg, bk, n_ in zip(
            b["nk"].to_pylist(),
            b["seg"].to_pylist(),
            b["bk"].to_pylist(),
            b["n"].to_pylist(),
        ):
            key = (int(nk), seg, int(bk))
            acc[key] = acc.get(key, 0) + int(n_)
    sizes: dict[int, int] = {}
    for n_ in acc.values():
        sizes[n_] = sizes.get(n_, 0) + 1
    ks = sorted(sizes)
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_groups": pa.array([sizes[k] for k in ks], pa.int64()),
            "n_rows": pa.array([k * sizes[k] for k in ks], pa.int64()),
        }
    )


def _k_anonymity_sql() -> str:
    return f"""
WITH q AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                    / {KANON_BUCKET}.0) AS BIGINT) AS bk,
         count(*) AS n
  FROM customer GROUP BY 1, 2, 3)
SELECT n AS k, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(n * count(*) AS BIGINT) AS n_rows
FROM q GROUP BY n"""


def q_integrity_audit(sf_dir: str):
    """Referential-integrity and null-rate audit across the star schema:
    orphan counts for three FK relations (lineitem->orders,
    lineitem->part, orders->customer) via the bounded-key anti-join,
    plus empty-text and nonpositive-length counts on documents. One row
    per check (check, n_bad, n_total) — the data-validation gate a
    pipeline runs before training. The three PK key sets are dimension-
    bounded, so they broadcast once (sorted arrays via ray.put) and each
    fact table streams ONCE checking all its FK columns by searchsorted
    — two passes total instead of three anti-join shuffles; a key set
    over the documented threshold would fall back to the bounded-key
    anti-join (`stages/relational.anti_join_keys`)."""
    from sbustreamspot_core_ray.functions.proccache import cached_get

    def key_array(table: str, col: str) -> np.ndarray:
        ks = [
            b[col].to_numpy(zero_copy_only=False)
            for b in ray.data.read_parquet(
                f"{sf_dir}/{table}.parquet", columns=[col]
            ).iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        return np.sort(np.concatenate(ks)) if ks else np.array([], np.int64)

    ok_ref = ray.put(key_array("orders", "o_orderkey"))
    pk_ref = ray.put(key_array("part", "p_partkey"))
    ck_ref = ray.put(key_array("customer", "c_custkey"))

    def miss_count(vals: np.ndarray, keys: np.ndarray) -> int:
        if not len(keys):
            return len(vals)
        pos = np.clip(np.searchsorted(keys, vals), 0, len(keys) - 1)
        return int((keys[pos] != vals).sum())

    n_li = bad_ord = bad_part = 0
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def li_partial(t: pa.Table) -> pa.Table:
        ok_ = cached_get(ok_ref)
        pk = cached_get(pk_ref)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "bo": pa.array(
                    [miss_count(t["l_orderkey"].to_numpy(), ok_)], pa.int64()
                ),
                "bp": pa.array(
                    [miss_count(t["l_partkey"].to_numpy(), pk)], pa.int64()
                ),
            }
        )

    for b in li.map_batches(li_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for n_, bo, bp in zip(
            b["n"].to_pylist(), b["bo"].to_pylist(), b["bp"].to_pylist()
        ):
            n_li += int(n_)
            bad_ord += int(bo)
            bad_part += int(bp)

    n_ord = bad_cust = 0
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )

    def ord_partial(t: pa.Table) -> pa.Table:
        ck = cached_get(ck_ref)
        return pa.table(
            {
                "n": pa.array([t.num_rows], pa.int64()),
                "bc": pa.array(
                    [miss_count(t["o_custkey"].to_numpy(), ck)], pa.int64()
                ),
            }
        )

    for b in orders.map_batches(
        ord_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for n_, bc in zip(b["n"].to_pylist(), b["bc"].to_pylist()):
            n_ord += int(n_)
            bad_cust += int(bc)

    checks = [
        ("lineitem_orphan_order", bad_ord, n_li),
        ("lineitem_orphan_part", bad_part, n_li),
        ("order_orphan_customer", bad_cust, n_ord),
    ]
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
    )
    bad_empty = 0
    bad_len = 0
    n_docs = 0
    for b in docs.map_batches(
        lambda t: pa.table(
            {
                "e": pa.array(
                    [
                        int(
                            (
                                pc.equal(
                                    pc.coalesce(t["text"], ""), ""
                                ).to_numpy(zero_copy_only=False)
                            ).sum()
                        )
                    ]
                ),
                "l": pa.array(
                    [
                        int(
                            (
                                t["n_chars"].to_numpy(zero_copy_only=False)
                                <= 0
                            ).sum()
                        )
                    ]
                ),
                "n": pa.array([t.num_rows]),
            }
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for e_, l_, n_ in zip(
            b["e"].to_pylist(), b["l"].to_pylist(), b["n"].to_pylist()
        ):
            bad_empty += int(e_)
            bad_len += int(l_)
            n_docs += int(n_)
    checks.append(("doc_empty_text", bad_empty, n_docs))
    checks.append(("doc_nonpositive_len", bad_len, n_docs))
    return pa.table(
        {
            "chk": pa.array([c[0] for c in checks]),
            "n_bad": pa.array([c[1] for c in checks], pa.int64()),
            "n_total": pa.array([c[2] for c in checks], pa.int64()),
        }
    )


def _integrity_audit_sql() -> str:
    return """
SELECT 'lineitem_orphan_order' AS chk,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_bad,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_total
UNION ALL
SELECT 'lineitem_orphan_part',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT)
UNION ALL
SELECT 'order_orphan_customer',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       CAST((SELECT count(*) FROM orders) AS BIGINT)
UNION ALL
SELECT 'doc_empty_text',
       CAST((SELECT count(*) FROM documents
             WHERE COALESCE(text, '') = '') AS BIGINT),
       CAST((SELECT count(*) FROM documents) AS BIGINT)
UNION ALL
SELECT 'doc_nonpositive_len',
       CAST((SELECT count(*) FROM documents WHERE n_chars <= 0) AS BIGINT),
       CAST((SELECT count(*) FROM documents) AS BIGINT)"""


ZIPF_TOP = 200  # head size for the log-log fit


def q_zipf_slope(sf_dir: str):
    """Zipf exponent of the corpus: distributed term-frequency combiner
    -> top-200 head (tf desc, term asc) -> log-log OLS. Rank and
    frequency map to integer micronats (floor(1e6*ln(x)), the libm-
    parity chain), so the 200-point fit uses the exact-moment OLS
    closed form — one row (n, slope, intercept, r2)."""
    from sbustreamspot_core_ray.stages.stats import ols_table
    from sbustreamspot_core_ray.stages.text import term_total_freq

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    head = term_total_freq(docs, top_n=ZIPF_TOP).to_pandas()
    tf = head["tf"].to_numpy(np.int64)  # already (tf desc, term asc)
    r = np.arange(1, len(tf) + 1, dtype=np.int64)
    x = np.floor(1e6 * np.log(r.astype(np.float64))).astype(np.int64)
    y = np.floor(1e6 * np.log(tf.astype(np.float64))).astype(np.int64)
    n = len(x)
    mom = {
        "zipf": (
            n,
            int(x.sum()),
            int(y.sum()),
            int((x * x).sum()),
            int((x * y).sum()),
            int((y * y).sum()),
        )
    }
    return ols_table(mom, group_col="grp")


def _zipf_slope_sql() -> str:
    return f"""
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT term, count(*) AS tf FROM t WHERE term <> '' GROUP BY term
       ORDER BY tf DESC, term ASC LIMIT {ZIPF_TOP}),
top AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS r FROM tf),
pts AS (
  SELECT CAST(floor(1e6 * ln(CAST(r AS DOUBLE))) AS HUGEINT) AS x,
         CAST(floor(1e6 * ln(CAST(tf AS DOUBLE))) AS HUGEINT) AS y
  FROM top),
m AS (SELECT CAST(count(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      FROM pts)
SELECT 'zipf' AS grp, CAST(n AS BIGINT) AS n,
  CASE WHEN n*sxx - sx*sx <> 0
       THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE), 6) ELSE 0.0 END AS slope,
  CASE WHEN n*sxx - sx*sx <> 0
       THEN ROUND(CAST(sy*sxx - sx*sxy AS DOUBLE)
                  / CAST(n*sxx - sx*sx AS DOUBLE), 6) ELSE 0.0 END AS intercept,
  CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
       THEN ROUND(CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE)
                  / CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE), 6)
       ELSE 0.0 END AS r2
FROM m"""


def q_neighbor_degree_curve(sf_dir: str):
    """Degree-correlation curve knn(k): for each degree k, the mean
    degree of the neighbors of degree-k endpoints over the undirected
    simple graph. Degrees broadcast once (rich_club's regime), each edge
    batch contributes both endpoint directions to a bounded per-degree
    (count, neighbor-degree-sum) histogram, driver folds, one mirrored
    divide."""
    import pyarrow.compute as pc

    from sbustreamspot_core_ray.functions.proccache import cached_get
    from sbustreamspot_core_ray.pipelines.superstep import distinct, int_degrees

    def canon(t: pa.Table) -> pa.Table:
        s = pc.cast(t["src"], pa.int64())
        d = pc.cast(t["dst"], pa.int64())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        return pa.table(
            {"a": pc.min_element_wise(s, d), "b": pc.max_element_wise(s, d)}
        )

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vertex": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                )
            }
        )

    und = distinct(
        _edges_full(sf_dir, dedup=False).map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
    ).materialize()
    deg = int_degrees(
        und.map_batches(both_ends, batch_format="pyarrow"), num_parts=P
    )
    dtab = deg.to_pandas()
    vs = dtab["vertex"].to_numpy(np.int64)
    ds_ = dtab["deg"].to_numpy(np.int64)
    order = np.argsort(vs, kind="stable")
    ref = ray.put((vs[order], ds_[order]))

    def partials(t: pa.Table) -> pa.Table:
        verts, degs = cached_get(ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = degs[np.searchsorted(verts, a)]
        db = degs[np.searchsorted(verts, b)]
        k = np.concatenate([da, db])
        nd = np.concatenate([db, da])
        u, inv = np.unique(k, return_inverse=True)
        return pa.table(
            {
                "k": u,
                "cnt": np.bincount(inv, minlength=len(u)).astype(np.int64),
                "s": np.bincount(inv, weights=nd, minlength=len(u)).astype(
                    np.int64
                ),
            }
        )

    acc: dict[int, list[int]] = {}
    for b in und.map_batches(partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k_, c_, s_ in zip(
            b["k"].to_pylist(), b["cnt"].to_pylist(), b["s"].to_pylist()
        ):
            cur = acc.setdefault(int(k_), [0, 0])
            cur[0] += int(c_)
            cur[1] += int(s_)
    ks = sorted(acc)
    knn = np.array([acc[k][1] / acc[k][0] for k in ks])
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_endpoints": pa.array([acc[k][0] for k in ks], pa.int64()),
            "knn": pa.array(round_half_away(knn, 6), pa.float64()),
        }
    )


def _neighbor_degree_curve_sql() -> str:
    return f"""
WITH e0 AS MATERIALIZED ({_SQL_EDGES}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e0 WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT v AS vertex, count(*) AS deg
  FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und) GROUP BY v),
ends AS (
  SELECT da.deg AS k, db.deg AS nd
  FROM und JOIN deg da ON da.vertex = und.a JOIN deg db ON db.vertex = und.b
  UNION ALL
  SELECT db.deg, da.deg
  FROM und JOIN deg da ON da.vertex = und.a JOIN deg db ON db.vertex = und.b)
SELECT k, CAST(count(*) AS BIGINT) AS n_endpoints,
       ROUND(CAST(SUM(nd) AS DOUBLE) / count(*), 6) AS knn
FROM ends GROUP BY k"""


def q_dup_stats(sf_dir: str):
    """Histogram of exact-duplicate group sizes: (group_size, n_groups,
    n_docs) — dedup telemetry from bounded per-partition histograms."""
    from sbustreamspot_core_ray.stages.dedup import dup_stats

    return dup_stats(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        num_parts=P,
    )


def q_doc_percentiles(sf_dir: str):
    """Exact per-language percentiles (p50/p90/p99) of whitespace token
    counts via histogram pre-aggregation; percentile-q = value at 1-based
    rank ceil(q*n) ascending, rank arithmetic in float64 on both sides."""
    from sbustreamspot_core_ray.stages.text import lang_token_percentiles

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return lang_token_percentiles(docs)


GROUP_SAMPLE_N = 50


def q_group_sample(sf_dir: str):
    """Exact-n deterministic uniform sample per language (bijective
    Fibonacci-mix hash order; combiner caps each batch at n per stratum)."""
    from sbustreamspot_core_ray.stages.curation import group_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return group_sample(docs, n_per_group=GROUP_SAMPLE_N)


_SQL_GROUP_SAMPLE = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (CAST(doc_id AS HUGEINT) * 11400714819323198485)
                    % 18446744073709551616, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= {GROUP_SAMPLE_N}"""


def q_events_cumsum(sf_dir: str):
    """Per-user running totals (the SUM OVER window analog): segmented
    integer-cents prefix sums after one hash(user) shuffle — bit-exact vs
    the SQL window (int64 prefix sums have no accumulation-order surface)."""
    from sbustreamspot_core_ray.stages.events import running_totals

    return running_totals(
        ray.data.read_parquet(f"{sf_dir}/events.parquet"), num_parts=P
    )


_SQL_EVENTS_CUMSUM = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS DOUBLE) / 100.0 AS running
FROM events"""


def q_tfidf_topterms(sf_dir: str):
    """Per-document top-3 keywords by the integer-exact tf-idf surrogate
    (tf * N * 10^6) // df — no float surface, pure BIGINT parity."""
    from sbustreamspot_core_ray.stages.text import tfidf_top_terms

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf_top_terms(docs, top_k=3)


_SQL_TFIDF_TOPTERMS = """
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM t WHERE term <> '' GROUP BY 1, 2
),
dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS c FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term,
         (tf.tf * n.c * 1000000) // dfx.df AS score_micro
  FROM tf, n JOIN dfx ON dfx.term = tf.term
)
SELECT doc_id, term, score_micro,
       row_number() OVER (PARTITION BY doc_id
                          ORDER BY score_micro DESC, term) AS rank
FROM sc QUALIFY rank <= 3"""


BM25_TERMS = ("stream", "join", "vector", "window", "dup")
BM25_TOP = 50
BM25_K1 = 1.2
BM25_B = 0.75


def q_bm25_search(sf_dir: str):
    """BM25 seed-query retrieval over the corpus (top-50 docs for a fixed
    5-term query). Bit-exact vs SQL: integer corpus stats + one fixed IEEE
    expression chain per term + math.log == DuckDB ln (same libm); ranked
    on the raw score, rounded only on output."""
    from sbustreamspot_core_ray.stages.text import bm25_search

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = bm25_search(
        docs, BM25_TERMS, top_n=BM25_TOP, k1=BM25_K1, b=BM25_B
    ).to_pandas()
    out["score"] = round_half_away(out["score"], 6)
    return out.reset_index(drop=True)


QL_MU = 2000.0
QL_TOP = 50


def q_ql_search(sf_dir: str):
    """Dirichlet query-likelihood retrieval (product form, no per-doc
    logs) for the fixed 5-term query: top-50 by P(q|d)*1e15, exact integer
    corpus stats + one fixed IEEE factor chain per doc."""
    from sbustreamspot_core_ray.stages.text import ql_search

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = ql_search(docs, BM25_TERMS, mu=QL_MU, top_n=QL_TOP).to_pandas()
    out["score_e15"] = round_half_away(out["score_e15"], 6)
    return out.reset_index(drop=True)


def _ql_sql() -> str:
    """Independent SQL recomputation of the Dirichlet QL product chain:
    same tokenization, own corpus stats, identical left-associated factor
    product (float literals repr-rendered)."""
    mu = repr(QL_MU)
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    ctf_cols = ", ".join(
        f"sum(tf{i}) AS ctf{i}" for i in range(len(BM25_TERMS))
    )
    score = " * ".join(
        f"((b.tf{i} + {mu} * (CAST(st.ctf{i} AS DOUBLE)"
        f" / CAST(st.sdl AS DOUBLE))) / (b.dl + {mu}))"
        for i in range(len(BM25_TERMS))
    )
    anyhit = " + ".join(f"b.tf{i}" for i in range(len(BM25_TERMS)))
    return f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id, len(ts) AS dl,
         {tf_cols}
  FROM tok
),
st AS (SELECT sum(dl) AS sdl, {ctf_cols} FROM base),
sc AS (SELECT b.doc_id, ({score}) * 1.0e15 AS score_e15
       FROM base b, st WHERE ({anyhit}) > 0)
SELECT doc_id, ROUND(score_e15, 6) AS score_e15 FROM sc
QUALIFY row_number() OVER (ORDER BY score_e15 DESC, doc_id) <= {QL_TOP}"""


def q_retrieval_overlap(sf_dir: str):
    """Retrieval-system agreement audit: set overlap of the BM25 top-50
    and the Dirichlet-QL top-50 for the same fixed query — exact integer
    counts + ppm Jaccard, the sanity check run before fusing rankers."""
    a = set(q_bm25_search(sf_dir)["doc_id"].tolist())
    b = set(q_ql_search(sf_dir)["doc_id"].tolist())
    inter = len(a & b)
    union = len(a | b)
    return pd.DataFrame(
        {
            "n_bm25": np.array([len(a)], np.int64),
            "n_ql": np.array([len(b)], np.int64),
            "n_common": np.array([inter], np.int64),
            "jaccard_ppm": np.array([inter * 1_000_000 // union], np.int64),
        }
    )


def _retrieval_overlap_sql() -> str:
    return f"""
WITH a AS ({_bm25_sql()}),
b AS ({_ql_sql()}),
s AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_bm25,
         (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_ql,
         (SELECT CAST(count(*) AS BIGINT) FROM a
          JOIN b ON b.doc_id = a.doc_id) AS n_common
)
SELECT n_bm25, n_ql, n_common,
       CAST(n_common * 1000000 // (n_bm25 + n_ql - n_common) AS BIGINT)
         AS jaccard_ppm
FROM s"""


RRF_K = 60
RRF_FUSE = 20


def q_rank_fusion(sf_dir: str):
    """Reciprocal-rank fusion of BM25 and total-term-frequency rankings
    for the fixed 5-term query: rrf_e9 = sum of floor(1e9/(60+rank)) over
    the two systems' top-50 lists; top-20 fused docs. Exact integers."""
    from sbustreamspot_core_ray.stages.text import rank_fusion

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return rank_fusion(
        docs, BM25_TERMS, top_n=BM25_TOP, fuse_n=RRF_FUSE, k=RRF_K,
        k1=BM25_K1, b=BM25_B,
    )


def _rank_fusion_sql() -> str:
    """Both rankings re-derived independently (the _bm25_sql expression
    chain verbatim for system A; integer term-frequency totals for system
    B), fused with integer nanounit reciprocal ranks."""
    k1p1 = repr(BM25_K1 + 1.0)
    k1 = repr(BM25_K1)
    omb = repr(1.0 - BM25_B)
    bb = repr(BM25_B)
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"(ln((st.n - st.df{i} + 0.5e0) / (st.df{i} + 0.5e0) + 1.0e0)"
        f" * (b.tf{i} * {k1p1}e0)"
        f" / (b.tf{i} + {k1}e0 * ({omb}e0 + {bb}e0"
        f" * (b.dl / (CAST(st.sdl AS DOUBLE) / st.n)))))"
        for i in range(len(BM25_TERMS))
    )
    tft = " + ".join(f"tf{i}" for i in range(len(BM25_TERMS)))
    return f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id, len(ts) AS dl,
         {tf_cols}
  FROM tok
),
st AS (SELECT count(*) AS n, sum(dl) AS sdl, {df_cols} FROM base),
sc AS (SELECT b.doc_id, {score} AS score FROM base b, st),
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM sc WHERE score > 0.0e0
  QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= {BM25_TOP}
),
tf AS (SELECT doc_id, {tft} AS tft FROM base WHERE {tft} > 0),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY tft DESC, doc_id) AS r
  FROM tf
  QUALIFY row_number() OVER (ORDER BY tft DESC, doc_id) <= {BM25_TOP}
),
u AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         COALESCE(1000000000 // ({RRF_K} + ra.r), 0)
         + COALESCE(1000000000 // ({RRF_K} + rb.r), 0) AS rrf_e9
  FROM ra FULL JOIN rb ON rb.doc_id = ra.doc_id
)
SELECT doc_id, CAST(rrf_e9 AS BIGINT) AS rrf_e9 FROM u
ORDER BY rrf_e9 DESC, doc_id LIMIT {RRF_FUSE}"""


def _bm25_sql() -> str:
    """The independent SQL recomputation: same tokenization, its own corpus
    stats, the identical left-associated score expression (float literals
    rendered with repr() so both parsers bind the same doubles)."""
    k1p1 = repr(BM25_K1 + 1.0)
    k1 = repr(BM25_K1)
    omb = repr(1.0 - BM25_B)
    bb = repr(BM25_B)
    tf_cols = ",\n         ".join(
        f"len(list_filter(ts, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"(ln((st.n - st.df{i} + 0.5e0) / (st.df{i} + 0.5e0) + 1.0e0)"
        f" * (b.tf{i} * {k1p1}e0)"
        f" / (b.tf{i} + {k1}e0 * ({omb}e0 + {bb}e0"
        f" * (b.dl / (CAST(st.sdl AS DOUBLE) / st.n)))))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
base AS (
  SELECT doc_id, len(ts) AS dl,
         {tf_cols}
  FROM tok
),
st AS (SELECT count(*) AS n, sum(dl) AS sdl, {df_cols} FROM base),
sc AS (SELECT b.doc_id, {score} AS score FROM base b, st)
SELECT doc_id, ROUND(score, 6) AS score FROM sc WHERE score > 0.0e0
QUALIFY row_number() OVER (ORDER BY score DESC, doc_id) <= {BM25_TOP}"""


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derived edge table ->
    sharded CSR graph -> PageRank."""
    return q_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # ORDER MATTERS: the driver checks a prefix of this registry each
        # round. Front: the two r04 driver-red rows (oracle dtype artifact,
        # fixed r5 — must be re-checked), then every never-driver-checked
        # query fastest-first (driver coverage r01-r04 = 131/268), then the
        # StreamSpot-pipeline family (last driver-checked r02), then the
        # already-driver-green remainder. All entries pass
        # scripts/check_oracles.py --exact at sf0.001+sf0.01 (2026-08-20).
        "sessionize": q_sessionize,
        "anomaly_scenarios": q_anomaly_scenarios,
        "anomaly_scenarios_injected": q_anomaly_scenarios_injected,
        "weighted_sample": q_weighted_sample,
        "f2_moment": q_f2_moment,
        "interval_coverage": q_interval_coverage,
        "longest_streak": q_longest_streak,
        "q13_order_counts": q_q13_order_counts,
        "events_cumsum": q_events_cumsum,
        "throttle_events": q_throttle_events,
        "embedding_outliers": q_embedding_outliers,
        "funnel": q_funnel,
        "burstiness": q_burstiness,
        "rate_spikes": q_rate_spikes,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "event_pmi": q_event_pmi,
        "corpus_manifest": q_corpus_manifest,
        "scene_cuts": q_scene_cuts,
        "prefix_dups": q_prefix_dups,
        "embedding_centroids": q_embedding_centroids,
        "q11_important_parts": q_q11_important_parts,
        "value_outliers": q_value_outliers,
        "dup_stats": q_dup_stats,
        "edit_distance_dedup": q_edit_distance_dedup,
        "ql_search": q_ql_search,
        "type_token_ratio": q_type_token_ratio,
        "cosine_join": q_cosine_join,
        "persistent_hitters": q_persistent_hitters,
        "hourly_filled": q_hourly_filled,
        "q16_supplier_counts": q_q16_supplier_counts,
        "bm25_search": q_bm25_search,
        "term_tf": q_term_tf,
        "event_transitions": q_event_transitions,
        "bpe_pairs": q_bpe_pairs,
        "component_sizes": q_component_sizes,
        "weighted_median": q_weighted_median,
        "decayed_counts": q_decayed_counts,
        "wau_rolling": q_wau_rolling,
        "weekly_retention": q_weekly_retention,
        "chunk_dedup": q_chunk_dedup,
        "percolation": q_percolation,
        "pack_sequences": q_pack_sequences,
        "source_stats": q_source_stats,
        "dup_auc": q_dup_auc,
        "snapshot_diff": q_snapshot_diff,
        "daily_users": q_daily_users,
        "transitivity": q_transitivity,
        "image_phash": q_image_phash,
        "knn_lsh": q_knn_lsh,
        "label_margin": q_label_margin,
        "embedding_dedup": q_embedding_dedup,
        "tfidf_topterms": q_tfidf_topterms,
        "q14_promo_share": q_q14_promo_share,
        "scan_stat": q_scan_stat,
        "incremental_near_dup": q_incremental_near_dup,
        "open_orders": q_open_orders,
        "q19_brackets": q_q19_brackets,
        "doc_percentiles": q_doc_percentiles,
        "abc_classes": q_abc_classes,
        "edge_support": q_edge_support,
        "clustering_coefficient": q_clustering_coefficient,
        "vocab_growth": q_vocab_growth,
        "value_percentiles": q_value_percentiles,
        "revenue_by_nation": q_revenue_by_nation,
        "bigram_logprob": q_bigram_logprob,
        "q18_large_orders": q_q18_large_orders,
        "value_mad": q_value_mad,
        "revenue_rollup": q_revenue_rollup,
        "copurchase_pairs": q_copurchase_pairs,
        "q12_priority_class": q_q12_priority_class,
        "mmr_diversify": q_mmr_diversify,
        "ngram_novelty": q_ngram_novelty,
        "dup_spans": q_dup_spans,
        "fill_rate": q_fill_rate,
        "q9_profit": q_q9_profit,
        "q4_priority": q_q4_priority,
        "oov_rate": q_oov_rate,
        "cooccurrence_links": q_cooccurrence_links,
        "snm_dedup": q_snm_dedup,
        "term_df": q_term_df,
        "doc_logprob": q_doc_logprob,
        "budget_fill": q_budget_fill,
        "hll_users": q_hll_users,
        "rank_fusion": q_rank_fusion,
        "image_resize": q_image_resize,
        "retrieval_overlap": q_retrieval_overlap,
        "gap_slo": q_gap_slo,
        "props_stats": q_props_stats,
        "ngram_containment": q_ngram_containment,
        "q10_returns": q_q10_returns,
        "boilerplate_lines": q_boilerplate_lines,
        "walk_centrality": q_walk_centrality,
        "katz": q_katz,
        "identifier_tokens": q_identifier_tokens,
        "customers_no_urgent": q_customers_no_urgent,
        "bottomk_median": q_bottomk_median,
        "q21_waiting_suppliers": q_q21_waiting_suppliers,
        "neighbor_features": q_neighbor_features,
        "frequent_triples": q_frequent_triples,
        "hits": q_hits,
        "ktruss": q_ktruss,
        "fork_candidates": q_fork_candidates,
        "path_rollup": q_path_rollup,
        "q22_idle_balances": q_q22_idle_balances,
        "corpus_split": q_corpus_split,
        "kcore": q_kcore,
        "temporal_reach": q_temporal_reach,
        "butterfly_cap_witness": q_butterfly_cap_witness,
        "linkpred_cap_recall": q_linkpred_cap_recall,
        "shared_imports": q_shared_imports,
        "bloom_semi": q_bloom_semi,
        "edge_jaccard": q_edge_jaccard,
        "k4_count": q_k4_count,
        "order_360": q_order_360,
        "q7_nation_volume": q_q7_nation_volume,
        "ann_recall": q_ann_recall,
        "dedup_stack": q_dedup_stack,
        "cc_incremental": q_cc_incremental,
        "q3_shipping": q_q3_shipping,
        "densest_peel": q_densest_peel,
        "modularity": q_modularity,
        "q8_market_share": q_q8_market_share,
        "degree_gini": q_degree_gini,
        "pagerank_drift": q_pagerank_drift,
        "linkpred_auc": q_linkpred_auc,
        "degree_histogram": q_degree_histogram,
        "wl_colors": q_wl_colors,
        "link_negatives": q_link_negatives,
        "q5_local_supplier": q_q5_local_supplier,
        "item_cosine": q_item_cosine,
        "rich_club": q_rich_club,
        "butterflies": q_butterflies,
        "rfm_cells": q_rfm_cells,
        "common_neighbors": q_common_neighbors,
        "attack_percolation": q_attack_percolation,
        "adamic_adar": q_adamic_adar,
        "resource_allocation": q_resource_allocation,
        "conductance": q_conductance,
        "kmeans": q_kmeans,
        "allpairs_jaccard": q_allpairs_jaccard,
        "square_count": q_square_count,
        "jaccard_links": q_jaccard_links,
        "shingles": q_shingles,
        "streamhash_sketches": q_streamhash_sketches,
        "incremental_sketches": q_incremental_sketches,
        "lsh_clusters": q_lsh_clusters,
        "streamspot_snapshots": q_streamspot_snapshots,
        "similarity_report": q_similarity_report,
        "lsh_isolated": q_lsh_isolated,
        "simhash_sketches": q_simhash_sketches,
        "pagerank": q_pagerank,
        "decision_stump": q_decision_stump,
        "stratified_sample": q_stratified_sample,
        "k_anonymity": q_k_anonymity,
        "char_entropy": q_char_entropy,
        "intradoc_dedup": q_intradoc_dedup,
        "lang_source_mi": q_lang_source_mi,
        "q6_forecast": q_q6_forecast,
        "fingerprints": q_fingerprints,
        "pareto_skyline": q_pareto_skyline,
        "embedding_covariance": q_embedding_covariance,
        "psi_drift": q_psi_drift,
        "embedding_quantize": q_embedding_quantize,
        "pii_redact": q_pii_redact,
        "seasonal_deviation": q_seasonal_deviation,
        "ols_regression": q_ols_regression,
        "repetition_signals": q_repetition_signals,
        "pearson_corr": q_pearson_corr,
        "winnow": q_winnow,
        "benford": q_benford,
        "token_counts": q_token_counts,
        "token_fertility": q_token_fertility,
        "pca_projection": q_pca_projection,
        "phash_near_dup": q_phash_near_dup,
        "doc_keywords": q_doc_keywords,
        "partitioned_write": q_partitioned_write,
        "late_events": q_late_events,
        "simhash_dedup": q_simhash_dedup,
        "top_users_per_type": q_top_users_per_type,
        "conversion_lag": q_conversion_lag,
        "cdc_dedup": q_cdc_dedup,
        "user_entropy": q_user_entropy,
        "modal_event_type": q_modal_event_type,
        "chunk_documents": q_chunk_documents,
        "graph_summary": q_graph_summary,
        "q15_top_supplier": q_q15_top_supplier,
        "top_orders_per_customer": q_top_orders_per_customer,
        "interarrival_stats": q_interarrival_stats,
        "kmv_overlap": q_kmv_overlap,
        "doc_quality": q_doc_quality,
        "cusum_shift": q_cusum_shift,
        "sampling_weights": q_sampling_weights,
        "markov_eval": q_markov_eval,
        "lang_id": q_lang_id,
        "event_trigrams": q_event_trigrams,
        "interval_join": q_interval_join,
        "decay_attribution": q_decay_attribution,
        "linear_attribution": q_linear_attribution,
        "q20_excess_suppliers": q_q20_excess_suppliers,
        "event_type_pivot": q_event_type_pivot,
        "asof_attribution": q_asof_attribution,
        "lang_confusion": q_lang_confusion,
        "q17_small_orders": q_q17_small_orders,
        "cms_top_users": q_cms_top_users,
        "events_windowed": q_events_windowed,
        "group_sample": q_group_sample,
        "ivm_refresh": q_ivm_refresh,
        "dedup_by_source": q_dedup_by_source,
        "exact_dedup": q_exact_dedup,
        "supplier_share": q_supplier_share,
        "feature_hashing": q_feature_hashing,
        "decontaminate": q_decontaminate,
        "simhash_near_dup": q_simhash_near_dup,
        "zipf_slope": q_zipf_slope,
        "embedding_near_dup": q_embedding_near_dup,
        "connected_components": q_connected_components,
        "events_hopping": q_events_hopping,
        "top_users": q_top_users,
        "neighborhood_sketch": q_neighborhood_sketch,
        "triad_census": q_triad_census,
        "winnow_dups": q_winnow_dups,
        "label_propagation": q_label_propagation,
        "knn_cosine": q_knn_cosine,
        "knn_ivf": q_knn_ivf,
        "integrity_audit": q_integrity_audit,
        "kn_logprob": q_kn_logprob,
        "triangle_count": q_triangle_count,
        "substring_dedup": q_substring_dedup,
        "triangles_per_vertex": q_triangles_per_vertex,
        "importance_weights": q_importance_weights,
        "q1_revenue": q_q1_revenue,
        "audio_frames": q_audio_frames,
        "video_frames": q_video_frames,
        "host_pagerank": q_host_pagerank,
        "media_features": q_media_features,
        "neighbor_sample": q_neighbor_sample,
        "random_walks": q_random_walks,
        "weighted_pagerank": q_weighted_pagerank,
        "ngram_jaccard": q_ngram_jaccard,
        "personalized_pagerank": q_personalized_pagerank,
        "spam_mass": q_spam_mass,
        "walk_skipgrams": q_walk_skipgrams,
        "path_counts": q_path_counts,
        "effective_diameter": q_effective_diameter,
        "minhash_dedup": q_minhash_dedup,
        "sssp_distance": q_sssp_distance,
        "coloring": q_coloring,
        "bfs_distance": q_bfs_distance,
        "mis": q_mis,
        "stress_centrality": q_stress_centrality,
        "diameter": q_diameter,
        "scc": q_scc,
        "hop_histogram": q_hop_histogram,
        "closeness_sample": q_closeness_sample,
        "harmonic_sample": q_harmonic_sample,
        "corpus_pipeline": q_corpus_pipeline,
        "edge_table": q_edge_table,
        "matching": q_matching,
        "landmark_distances": q_landmark_distances,
        "degrees": q_degrees,
        "partition_skew": q_partition_skew,
        "salsa": q_salsa,
        "ic_cascade": q_ic_cascade,
        "condensation": q_condensation,
        "pagerank_incremental": q_pagerank_incremental,
        "neighbor_degree_curve": q_neighbor_degree_curve,
        "bowtie": q_bowtie,
        "condensation_depth": q_condensation_depth,
        "assortativity": q_assortativity,
        "bipartite": q_bipartite,
        "msf": q_msf,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edge_table": f"SELECT src, dst FROM ({_SQL_EDGES})",
        "degrees": f"SELECT src, count(*) AS outdeg FROM ({_SQL_EDGES}) GROUP BY src",
        "pagerank": _pagerank_sql(),
        "weighted_pagerank": _weighted_pagerank_sql(),
        "pagerank_incremental": _pagerank_incremental_sql(),
        "personalized_pagerank": _ppr_sql(),
        "spam_mass": _spam_mass_sql(),
        "salsa": _salsa_sql(),
        "host_pagerank": _host_pagerank_sql(),
        "ols_regression": _ols_sql(),
        "embedding_covariance": _embedding_covariance_sql(),
        "pca_projection": _pca_projection_sql(),
        "token_fertility": _token_fertility_sql(),
        "lang_source_mi": _lang_source_mi_sql(),
        "decision_stump": _decision_stump_sql(),
        "zipf_slope": _zipf_slope_sql(),
        "k_anonymity": _k_anonymity_sql(),
        "integrity_audit": _integrity_audit_sql(),
        "partitioned_write": _partitioned_write_sql(),
        "ic_cascade": _ic_cascade_sql(),
        "feature_hashing": _feature_hashing_sql(),
        "neighbor_degree_curve": _neighbor_degree_curve_sql(),
        "pearson_corr": _pearson_sql(),
        "bfs_distance": _bfs_sql(),
        "landmark_distances": _landmark_sql(),
        "bipartite": _bipartite_sql(),
        "matching": _matching_sql(),
        "msf": _msf_sql(),
        "path_counts": _sigma_sql(),
        "stress_centrality": _stress_sql(),
        "closeness_sample": _closeness_sample_sql(),
        "hop_histogram": _hop_histogram_sql(),
        "effective_diameter": _effective_diameter_sql(),
        "partition_skew": _SQL_PARTITION_SKEW,
        "harmonic_sample": _harmonic_sample_sql(),
        "mis": _mis_sql(),
        "coloring": _coloring_sql(),
        "diameter": _SQL_DIAMETER.format(edges=_SQL_EDGES),
        "sssp_distance": _sssp_sql(),
        "random_walks": _random_walks_sql(),
        "walk_skipgrams": _walk_skipgrams_sql(),
        "neighbor_sample": _neighbor_sample_sql(),
        "intradoc_dedup": _intradoc_dedup_sql(),
        "cusum_shift": _cusum_shift_sql(),
        "f2_moment": _f2_moment_sql(),
        "char_entropy": _char_entropy_sql(),
        "identifier_tokens": _identifier_tokens_sql(),
        "square_count": _square_count_sql(),
        "percolation": _percolation_sql(),
        "winnow": _winnow_sql(),
        "pagerank_drift": _pagerank_drift_sql(),
        "rate_spikes": _rate_spikes_sql(),
        "triad_census": _SQL_TRIAD_CENSUS.format(m=TRIAD_MOD),
        "linear_attribution": _SQL_LINEAR_ATTribution,
        "decay_attribution": _SQL_DECAY_ATTRIBUTION,
        "benford": _SQL_BENFORD,
        "kmv_overlap": _kmv_overlap_sql(),
        "dup_spans": _dup_spans_sql(),
        "kmeans": _kmeans_sql(),
        "cosine_join": _cosine_join_sql(),
        "psi_drift": _psi_drift_sql(),
        "rfm_cells": _SQL_RFM,
        "dedup_stack": _dedup_stack_sql(),
        "phash_near_dup": _SQL_PHASH_NEAR_DUP,
        "cooccurrence_links": _SQL_COOC,
        "markov_eval": _markov_eval_sql(),
        "attack_percolation": _attack_sql(),
        "item_cosine": _SQL_ITEM_COSINE,
        "seasonal_deviation": _seasonal_sql(),
        "conductance": _conductance_sql(),
        "gap_slo": _gap_slo_sql(),
        "dup_auc": _SQL_DUP_AUC,
        "incremental_near_dup": _incremental_near_dup_sql(),
        "order_360": _SQL_ORDER_360,
        "abc_classes": _SQL_ABC,
        "doc_keywords": _SQL_DOC_KEYWORDS,
        "prefix_dups": _prefix_dups_sql(),
        "scc": _SQL_SCC.format(m=RECIP_MOD),
        "bowtie": _bowtie_sql(),
        "condensation": _SQL_CONDENSATION.format(m=RECIP_MOD),
        "condensation_depth": _SQL_CONDENSATION_DEPTH.format(m=RECIP_MOD),
        "graph_summary": f"""
WITH e AS (
  SELECT l_partkey % {RECIP_MOD} AS src, l_suppkey % {RECIP_MOD} AS dst
  FROM lineitem
),
d AS (SELECT DISTINCT src, dst FROM e),
st AS (
  SELECT
    (SELECT count(*) FROM e) AS n_raw,
    (SELECT count(*) FROM d) AS n_distinct,
    (SELECT count(*) FROM d WHERE src = dst) AS n_self_loops,
    (SELECT count(*) FROM d a JOIN d b ON b.src = a.dst AND b.dst = a.src
      WHERE a.src <> a.dst) AS n_reciprocal
)
SELECT CAST(n_raw AS BIGINT) AS n_raw,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_self_loops AS BIGINT) AS n_self_loops,
       CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
       ROUND(CAST(n_reciprocal AS DOUBLE)
             / (n_distinct - n_self_loops), 6) AS reciprocity
FROM st
""",
        "assortativity": f"""
WITH de AS ({_SQL_EDGES}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
deg AS (SELECT vertex, count(*) AS deg FROM (
          SELECT a AS vertex FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vertex),
ed AS (SELECT da.deg AS x, db.deg AS y
       FROM und JOIN deg da ON da.vertex = und.a
       JOIN deg db ON db.vertex = und.b),
s AS (SELECT count(*) AS e,
             SUM(CAST(x AS HUGEINT) + y) AS sx,
             SUM(2 * CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x + CAST(y AS HUGEINT) * y) AS sxx
      FROM ed)
SELECT e AS edges,
       ROUND(CAST(2 * e * sxy - sx * sx AS DOUBLE)
             / CAST(2 * e * sxx - sx * sx AS DOUBLE), 6) AS assortativity
FROM s
""",
        "adamic_adar": _SQL_ADAMIC_ADAR,
        "resource_allocation": _SQL_RESOURCE_ALLOCATION,
        "jaccard_links": _SQL_JACCARD_LINKS.format(edges=_SQL_EDGES, top=CN_TOP),
        "hits": _hits_sql(),
        "katz": _katz_sql(),
        "walk_centrality": _walk_sql(),
        "neighbor_features": _SQL_NEIGHBOR_FEATURES,
        "connected_components": f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES_CO}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
v AS (SELECT s AS vertex FROM e UNION SELECT d FROM e),
reach(vx, lbl) AS (
  SELECT vertex, vertex FROM v
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN e ON e.s = r.vx
)
SELECT vx AS vertex, MIN(lbl) AS component FROM reach GROUP BY vx
""",
        "label_propagation": _lp_sql(),
        "cc_incremental": _cc_full_sql(),
        "degree_gini": f"""
WITH e0 AS ({_SQL_EDGES}),
sym AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
deg AS (SELECT s, COUNT(*) AS dg FROM sym GROUP BY s),
h AS (SELECT dg AS v, COUNT(*) AS c FROM deg GROUP BY dg),
r AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM h),
t AS (
  SELECT SUM(c) AS n, SUM(v * c) AS s1,
         SUM(v * (c * cum - (c * (c - 1)) // 2)) AS s2
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_vertices,
       CAST(s1 AS BIGINT) AS sum_deg,
       CAST(s2 AS BIGINT) AS rank_weighted_sum,
       ROUND(2.0 * s2 / (n * s1) - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
FROM t
""",
        "component_sizes": f"""
WITH RECURSIVE e0 AS ({_SQL_EDGES_CO}),
e AS (SELECT src AS s, dst AS d FROM e0 UNION SELECT dst, src FROM e0),
v AS (SELECT s AS vertex FROM e UNION SELECT d FROM e),
reach(vx, lbl) AS (
  SELECT vertex, vertex FROM v
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN e ON e.s = r.vx
),
cc AS (SELECT vx AS vertex, MIN(lbl) AS component FROM reach GROUP BY vx),
cs AS (SELECT component, COUNT(*) AS sz FROM cc GROUP BY component)
SELECT sz AS size,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(sz) AS BIGINT) AS n_vertices
FROM cs GROUP BY sz ORDER BY sz
""",
        "modularity": _modularity_sql(),
        "neighborhood_sketch": _neighborhood_sketch_sql(),
        "triangle_count": f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst)
SELECT count(*) AS triangles
FROM und e1 JOIN und e2 ON e1.b = e2.a JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
""",
        "triangles_per_vertex": f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT vertex, count(*) AS triangles FROM (
  SELECT x AS vertex FROM tri UNION ALL
  SELECT y FROM tri UNION ALL
  SELECT z FROM tri
) GROUP BY vertex
""",
        "edge_support": f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT a, b, count(*) AS support FROM (
  SELECT x AS a, y AS b FROM tri UNION ALL
  SELECT x, z FROM tri UNION ALL
  SELECT y, z FROM tri
) GROUP BY a, b
""",
        "scan_stat": _SQL_SCAN_STAT,
        "transitivity": _SQL_TRANSITIVITY,
        "edge_jaccard": _SQL_EDGE_JACCARD,
        "ktruss": _ktruss_sql(),
        "shingles": f"""
WITH e AS (
  SELECT DISTINCT o_custkey AS src, 10000000 + o_orderkey AS dst,
         'c' AS st, 'o' AS dt, 'x' AS et FROM orders
  UNION
  SELECT DISTINCT 10000000 + l_orderkey, 20000000 + l_partkey, 'o', 'p', 'y' FROM lineitem
  UNION
  SELECT DISTINCT 20000000 + l_partkey, 30000000 + l_suppkey, 'p', 's', 'z' FROM lineitem
),
strs AS (
  SELECT src % 53 AS gid, src,
         ' ' || st || string_agg(et || dt, '' ORDER BY dst) AS s
  FROM e GROUP BY src % 53, src, st
),
chunks AS (
  SELECT gid, substring(s, CAST(i AS INT), {SHINGLE_C}) AS shingle
  FROM strs, generate_series(1, 8192, {SHINGLE_C}) g(i)
  WHERE g.i <= length(s)
)
SELECT gid, shingle, count(*) AS "count" FROM chunks GROUP BY gid, shingle
""",
        "q1_revenue": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0
                                 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0,
             2) AS sum_revenue,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "events_windowed": """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       count(*) AS n,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events GROUP BY 1, 2
""",
        "ivm_refresh": _SQL_IVM_REFRESH,
        "interval_coverage": _SQL_INTERVAL_COVERAGE,
        "decayed_counts": _SQL_DECAYED_COUNTS,
        "sessionize": """
WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
s AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
t AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                  AS session_id
      FROM s)
SELECT user_id, session_id, count(*) AS n_events,
       min(us) AS first_us, max(us) AS last_us,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM t GROUP BY user_id, session_id
""",
        "funnel": _funnel_sql(),
        "interval_join": """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'error'
), r AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS units
  FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, l.us,
  COALESCE(count(r.us), 0) AS n_in_window,
  CAST(COALESCE(sum(r.units), 0) AS DOUBLE) / 100 AS sum_value
FROM l LEFT JOIN r
  ON r.user_id = l.user_id AND r.us >= l.us AND r.us < l.us + 600000000
GROUP BY l.event_id, l.user_id, l.us
ORDER BY l.event_id
""",
        "asof_attribution": """
WITH l AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)
),
j AS (
  SELECT l.event_id, l.user_id, l.us,
         r.event_id AS matched_event_id, r.us AS matched_us,
         row_number() OVER (PARTITION BY l.event_id ORDER BY r.us DESC) AS rn
  FROM l JOIN r ON r.user_id = l.user_id AND r.us <= l.us
)
SELECT event_id, user_id, us, matched_event_id, matched_us,
       us - matched_us AS gap_us
FROM j WHERE rn = 1
""",
        "events_hopping": """
WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events),
x AS (
  SELECT event_type, value,
         (us // 900000000 - g.k) * 900000000 AS window_start_us
  FROM e, generate_series(0, 3) g(k)
  WHERE us // 900000000 - g.k >= 0
)
SELECT event_type, window_start_us, count(*) AS n,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM x GROUP BY 1, 2
""",
        "top_users": """
SELECT user_id,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
         AS total
FROM events GROUP BY user_id
ORDER BY total DESC, user_id ASC LIMIT 20
""",
        "value_mad": """
WITH u AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
h AS (SELECT event_type, cents, count(*) AS c FROM u GROUP BY 1, 2),
r AS (
  SELECT event_type, cents,
         SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
),
med AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN cum >= ceil(0.5e0 * n) THEN cents END) AS BIGINT) AS m,
         CAST(MAX(n) AS BIGINT) AS n
  FROM r GROUP BY event_type
),
a AS (
  SELECT h.event_type, abs(h.cents - med.m) AS d, SUM(h.c) AS c
  FROM h JOIN med ON med.event_type = h.event_type GROUP BY 1, 2
),
r2 AS (
  SELECT event_type, d,
         SUM(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM a
),
mad AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN cum >= ceil(0.5e0 * n) THEN d END) AS BIGINT) AS mad
  FROM r2 GROUP BY event_type
)
SELECT med.event_type, med.n AS n_events, med.m AS median_cents,
       mad.mad AS mad_cents,
       CAST(COALESCE((SELECT SUM(a2.c) FROM a a2
                      WHERE a2.event_type = med.event_type
                        AND a2.d > 3 * mad.mad), 0) AS BIGINT) AS n_outliers
FROM med JOIN mad ON mad.event_type = med.event_type
""",
        "user_entropy": """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id, SUM(c) AS n, COUNT(*) AS nt,
         SUM(c * CAST(floor(1e9 * ln(c)) AS BIGINT)) AS s
  FROM c GROUP BY user_id
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(nt AS BIGINT) AS n_types,
       ROUND(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / (1e9 * n), 6)
         AS entropy
FROM s
""",
        "event_pmi": """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM events),
c AS (SELECT event_type, COUNT(*) AS cu FROM d GROUP BY event_type),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cab
  FROM d a JOIN d b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
       CAST(cab AS BIGINT) AS n_users_both,
       CAST(floor(1e9 * ln(
         CAST((SELECT nu FROM n) * cab AS DOUBLE) / (ca.cu * cb.cu)
       )) AS BIGINT) AS pmi_e9
FROM p
JOIN c ca ON ca.event_type = p.ta
JOIN c cb ON cb.event_type = p.tb
""",
        "event_transitions": """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
""",
        "top_orders_per_customer": """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rn
FROM orders
QUALIFY rn <= 3
""",
        "customers_no_urgent": """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
        "q3_shipping": f"""
WITH r AS (
  SELECT l_orderkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS u
  FROM lineitem WHERE epoch_us(l_shipdate) > {Q3_CUTOFF_US}
  GROUP BY l_orderkey
)
SELECT o.o_orderkey AS orderkey,
       ROUND(CAST(r.u AS DOUBLE) / 10000.0, 2) AS revenue,
       epoch_us(o.o_orderdate) AS orderdate_us,
       o.o_orderpriority AS priority
FROM r
JOIN orders o ON o.o_orderkey = r.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE epoch_us(o.o_orderdate) < {Q3_CUTOFF_US}
  AND c.c_mktsegment = '{Q3_SEGMENT}'
ORDER BY r.u DESC, orderdate_us, orderkey
LIMIT {Q3_TOPN}
""",
        "q4_priority": f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE epoch_us(o_orderdate) >= {Q4_LO_US}
  AND epoch_us(o_orderdate) < {Q4_HI_US}
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = '{Q4_FLAG}')
GROUP BY o_orderpriority
""",
        "q19_brackets": (
            """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT) AS u
  FROM lineitem
)
SELECT ROUND(CAST(COALESCE(SUM(u), 0) AS DOUBLE) / 10000.0, 2) AS revenue
FROM li JOIN part ON p_partkey = l_partkey
WHERE """
            + " OR ".join(
                f"(p_brand = '{br}' AND p_size BETWEEN {slo} AND {shi}"
                f" AND q BETWEEN {qlo} AND {qhi})"
                for br, slo, shi, qlo, qhi in Q19_BRACKETS
            )
        ),
        "q6_forecast": f"""
SELECT ROUND(CAST(COALESCE(SUM(
         CAST(floor(l_extendedprice * l_discount * 10000.0 + 0.5) AS BIGINT)
       ), 0) AS DOUBLE) / 10000.0, 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= make_timestamp({Q6_LO_US})
  AND l_shipdate < make_timestamp({Q6_HI_US})
  AND l_discount >= {Q6_DISC_LO} AND l_discount <= {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY_LT}
""",
        "pareto_skyline": _SQL_PARETO_SKYLINE,
        "persistent_hitters": f"""
WITH c AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour, user_id,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hour, user_id,
         ROW_NUMBER() OVER (PARTITION BY hour ORDER BY cnt DESC, user_id)
           AS rn
  FROM c
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_windows
FROM r WHERE rn <= {HH_TOPK}
GROUP BY user_id HAVING COUNT(*) >= {HH_MIN_WINDOWS}
""",
        "q8_market_share": f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT) AS u
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type LIKE '{Q8_TYPE_PREFIX}%'
),
j AS (
  SELECT year(o_orderdate) AS o_year, u,
         CASE WHEN s_nationkey = {Q8_NATIONKEY} THEN u ELSE 0 END AS tu
  FROM li
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{Q8_REGION}'
)
SELECT o_year,
       ROUND(CAST(SUM(tu) AS DOUBLE) / 10000.0, 2) AS nation_revenue,
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) AS total_revenue,
       ROUND(100.0 * CAST(SUM(tu) AS DOUBLE) / CAST(SUM(u) AS DOUBLE), 6)
         AS mkt_share
FROM j GROUP BY o_year
""",
        "q16_supplier_counts": f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p_brand, p_size, l_suppkey
  FROM ps JOIN part ON p_partkey = l_partkey
  WHERE p_type NOT LIKE '{Q16_EXCLUDE_PREFIX}%'
)
SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM j GROUP BY p_brand, p_size
""",
        "q22_idle_balances": """
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
  FROM customer WHERE floor(c_acctbal * 100.0 + 0.5) > 0
),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(cents) AS s FROM pos),
sel AS (
  SELECT p.c_nationkey, p.cents FROM pos p, stats
  WHERE p.cents * stats.n > stats.s
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                    AND epoch_us(o.o_orderdate) >= 915148800000000)
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total_acctbal
FROM sel GROUP BY c_nationkey
""",
        "q13_order_counts": """
WITH oc AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM oc GROUP BY c_count
""",
        "q7_nation_volume": f"""
WITH li AS (
  SELECT l_orderkey, s_nationkey AS snat, year(l_shipdate) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT) AS u
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE epoch_us(l_shipdate) >= {Q7_LO_US}
    AND epoch_us(l_shipdate) < {Q7_HI_US}
    AND s_nationkey IN ({Q7_NAT_A}, {Q7_NAT_B})
),
j AS (
  SELECT snat, c_nationkey AS cnat, l_year, u
  FROM li
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  WHERE c_nationkey IN ({Q7_NAT_A}, {Q7_NAT_B}) AND c_nationkey <> snat
)
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(l_year AS BIGINT) AS l_year,
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) AS revenue
FROM j
JOIN nation ns ON ns.n_nationkey = snat
JOIN nation nc ON nc.n_nationkey = cnat
GROUP BY 1, 2, 3
""",
        "q10_returns": f"""
WITH r AS (
  SELECT o_custkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS units
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
    AND epoch_us(o_orderdate) >= {Q10_LO_US}
    AND epoch_us(o_orderdate) < {Q10_HI_US}
  GROUP BY o_custkey
  ORDER BY units DESC, o_custkey
  LIMIT {Q10_TOPK}
)
SELECT c_custkey, c_name,
       ROUND(CAST(units AS DOUBLE) / 10000.0, 2) AS revenue,
       c_acctbal, n_name
FROM r
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
""",
        "q18_large_orders": f"""
WITH q AS (
  SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {Q18_MIN_QTY}
)
SELECT o_custkey AS c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       ROUND(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
             AS DOUBLE) / 100.0, 2) AS o_totalprice,
       total_qty
FROM q JOIN orders ON o_orderkey = l_orderkey
ORDER BY total_qty DESC, o_orderkey
LIMIT {Q18_TOPK}
""",
        "q9_profit": """
WITH li AS (
  SELECT l_orderkey, s_nationkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)
         - CAST(l_quantity AS BIGINT)
           * CAST(floor(p_retailprice * 10000.0 + 0.5) AS BIGINT) AS pu
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN part ON p_partkey = l_partkey
)
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(pu) AS DOUBLE) / 10000.0, 2) AS profit
FROM li
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1, 2
""",
        "q15_top_supplier": f"""
WITH r AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS units
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {Q15_LO_US}
    AND epoch_us(l_shipdate) < {Q15_HI_US}
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       ROUND(CAST(units AS DOUBLE) / 10000.0, 2) AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE units = (SELECT MAX(units) FROM r)
""",
        "q11_important_parts": f"""
WITH v AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS units
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey = {Q11_NATIONKEY}
  GROUP BY l_partkey
)
SELECT p_partkey,
       ROUND(CAST(units AS DOUBLE) / 10000.0, 2) AS value
FROM v
WHERE units * {Q11_FRAC_DEN} > (SELECT SUM(units) FROM v)
""",
        "q2_min_cost_supplier": f"""
WITH cand AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         MIN(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS cu
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND p_type LIKE '{Q2_TYPE_PREFIX}%'
    AND n_regionkey = {Q2_REGIONKEY}
  GROUP BY 1, 2
),
win AS (
  SELECT pk, sk, cu FROM cand c
  WHERE cu = (SELECT MIN(cu) FROM cand x WHERE x.pk = c.pk)
)
SELECT ROUND(CAST(CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS DOUBLE)
             / 100.0, 2) AS s_acctbal,
       s_name, n_name, pk AS p_partkey, sk AS s_suppkey,
       ROUND(CAST(cu AS DOUBLE) / 10000.0, 2) AS min_cost
FROM win
JOIN supplier ON s_suppkey = sk
JOIN nation ON n_nationkey = s_nationkey
ORDER BY CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) DESC, pk, sk
LIMIT {Q2_TOPK}
""",
        "q20_excess_suppliers": f"""
WITH q AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS BIGINT)) AS qs
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
    AND year(l_shipdate) = {Q20_YEAR}
  GROUP BY 1, 2
),
tot AS (SELECT pk, SUM(qs) AS qt FROM q GROUP BY pk)
SELECT DISTINCT s_suppkey, s_name
FROM q
JOIN tot USING (pk)
JOIN supplier ON s_suppkey = sk
WHERE {Q20_SHARE_DEN} * qs > qt AND s_nationkey = {Q20_NATIONKEY}
""",
        "q21_waiting_suppliers": f"""
WITH ls AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         MAX(epoch_us(l_shipdate)) AS ms
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
j AS (
  SELECT ok, sk,
         CASE WHEN ms > epoch_us(o_orderdate) + {Q21_LATE_US}
              THEN 1 ELSE 0 END AS late
  FROM ls JOIN orders ON o_orderkey = ok
),
agg AS (SELECT ok, COUNT(*) AS ns, SUM(late) AS nl FROM j GROUP BY ok),
w AS (
  SELECT sk, CAST(COUNT(*) AS BIGINT) AS numwait
  FROM j JOIN agg USING (ok)
  WHERE late = 1 AND ns > 1 AND nl = 1
  GROUP BY sk
)
SELECT sk AS s_suppkey, s_name, numwait
FROM w JOIN supplier ON s_suppkey = sk
ORDER BY numwait DESC, sk
LIMIT {Q21_TOPK}
""",
        "q17_small_orders": """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT) AS u
  FROM lineitem
),
st AS (
  SELECT l_partkey, SUM(q) AS sq, CAST(COUNT(*) AS BIGINT) AS n
  FROM li GROUP BY l_partkey
)
SELECT ROUND(CAST(COALESCE(SUM(u), 0) AS DOUBLE) / 10000.0, 2)
         AS small_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM li JOIN st USING (l_partkey)
WHERE 5 * q * n < sq
""",
        "q12_priority_class": f"""
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_us(l_shipdate) >= {Q4_LO_US}
  AND epoch_us(l_shipdate) < {Q4_HI_US}
GROUP BY l_linestatus
""",
        "q14_promo_share": """
WITH li AS (
  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
         CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT) AS u,
         l_partkey
  FROM lineitem
),
j AS (
  SELECT ym, u,
         CASE WHEN p_type LIKE 'PROMO%' THEN u ELSE 0 END AS pu
  FROM li JOIN part ON p_partkey = l_partkey
)
SELECT ym,
       ROUND(CAST(SUM(pu) AS DOUBLE) / 10000.0, 2) AS promo_revenue,
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) AS total_revenue,
       ROUND(100.0 * CAST(SUM(pu) AS DOUBLE) / CAST(SUM(u) AS DOUBLE), 6)
         AS promo_share
FROM j GROUP BY ym
""",
        "q5_local_supplier": f"""
WITH li AS (
  SELECT l_orderkey, s_nationkey AS nat,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS u
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{Q5_REGION}'
  GROUP BY l_orderkey, s_nationkey
)
SELECT n_name,
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) AS revenue
FROM li
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey AND c_nationkey = li.nat
JOIN nation ON n_nationkey = li.nat
WHERE epoch_us(o_orderdate) >= {Q5_DATE_LO_US}
  AND epoch_us(o_orderdate) < {Q5_DATE_HI_US}
GROUP BY n_name
""",
        "fill_rate": f"""
WITH le AS (
  SELECT l_orderkey, MAX(epoch_us(l_shipdate)) AS m FROM lineitem GROUP BY 1
),
j AS (
  SELECT o_orderpriority AS pr,
         CASE WHEN m - epoch_us(o_orderdate) <= {FILL_WINDOW_US}
              THEN 1 ELSE 0 END AS ok
  FROM orders JOIN le ON l_orderkey = o_orderkey
)
SELECT pr AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(ok) AS BIGINT) AS n_filled,
       ROUND(CAST(SUM(ok) AS DOUBLE) / COUNT(*), 6) AS fill_rate
FROM j GROUP BY pr
""",
        "supplier_share": """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS u
  FROM lineitem GROUP BY l_suppkey
),
j AS (
  SELECT s_nationkey AS nk, u FROM rev JOIN supplier ON s_suppkey = l_suppkey
),
a AS (SELECT nk, MAX(u) AS top_u, SUM(u) AS tot FROM j GROUP BY nk)
SELECT n_name,
       CAST(top_u AS BIGINT) AS top_units,
       CAST(tot AS BIGINT) AS total_units,
       ROUND(CAST(top_u AS DOUBLE) / tot, 6) AS share
FROM a JOIN nation ON n_nationkey = nk
""",
        "open_orders": """
WITH le AS (
  SELECT l_orderkey, MAX(epoch_us(l_shipdate) // 86400000000) AS d1
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS d0 FROM orders
),
j AS (SELECT o.d0, le.d1 FROM o JOIN le ON le.l_orderkey = o.o_orderkey),
d AS (
  SELECT d0 AS day, 1 AS delta FROM j
  UNION ALL
  SELECT d1 + 1, -1 FROM j
),
g AS (SELECT day, SUM(delta) AS dd FROM d GROUP BY day HAVING SUM(delta) <> 0)
SELECT day, CAST(SUM(dd) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM g ORDER BY day
""",
        "butterflies": _SQL_BUTTERFLIES,
        "butterfly_cap_witness": _SQL_BUTTERFLY_CAP_WITNESS,
        "frequent_triples": _SQL_FREQUENT_TRIPLES,
        "snapshot_diff": _SQL_SNAPSHOT_DIFF,
        "k4_count": _SQL_K4,
        "weighted_median": _SQL_WEIGHTED_MEDIAN,
        "copurchase_pairs": f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS cnt
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, cnt FROM p WHERE cnt >= {COPURCHASE_MIN}
ORDER BY cnt DESC, part_a, part_b LIMIT {COPURCHASE_TOPN}
""",
        "revenue_by_nation": """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS u
  FROM lineitem GROUP BY l_suppkey
)
SELECT r_name, n_name,
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) AS revenue
FROM rev
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
""",
        "revenue_rollup": """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000.0 + 0.5)
             AS BIGINT)) AS u
  FROM lineitem GROUP BY l_suppkey
),
nr AS (
  SELECT r_name, n_name, SUM(u) AS u
  FROM rev
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY r_name, n_name
)
SELECT CAST(0 AS BIGINT) AS lvl, r_name, n_name,
       ROUND(CAST(u AS DOUBLE) / 10000.0, 2) AS revenue FROM nr
UNION ALL
SELECT CAST(1 AS BIGINT), r_name, 'ALL',
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) FROM nr GROUP BY r_name
UNION ALL
SELECT CAST(2 AS BIGINT), 'ALL', 'ALL',
       ROUND(CAST(SUM(u) AS DOUBLE) / 10000.0, 2) FROM nr
""",
        "clustering_coefficient": f"""
WITH de AS ({_SQL_EDGES_TRI}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM de WHERE src <> dst),
deg AS (SELECT vertex, count(*) AS deg FROM (
          SELECT a AS vertex FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vertex),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tpv AS (SELECT vertex, count(*) AS triangles FROM (
          SELECT x AS vertex FROM tri UNION ALL
          SELECT y FROM tri UNION ALL
          SELECT z FROM tri
        ) GROUP BY vertex)
SELECT d.vertex, d.deg, COALESCE(t.triangles, 0) AS triangles,
       ROUND(2.0e0 * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1.0e0)), 6)
         AS cc
FROM deg d LEFT JOIN tpv t ON t.vertex = d.vertex
WHERE d.deg >= 2
""",
        "late_events": f"""
WITH s AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id
           ORDER BY epoch_us(ts) // {LATE_BUCKET_US},
                    (event_id * 2654435761) % 2147483648,
                    event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS watermark_us
  FROM events
)
SELECT event_id, user_id, ts_us, watermark_us,
       watermark_us - ts_us AS lateness_us
FROM s WHERE watermark_us - ts_us > {LATE_US}
""",
        "burstiness": _SQL_BURSTINESS,
        "hourly_filled": """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS win, count(*) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT event_type, MIN(win) AS h0, MAX(win) AS h1 FROM c GROUP BY 1),
cal AS (SELECT event_type, unnest(generate_series(h0, h1)) AS win FROM b),
filled AS (
  SELECT cal.event_type, cal.win, COALESCE(c.n, 0) AS n
  FROM cal LEFT JOIN c ON c.event_type = cal.event_type AND c.win = cal.win
)
SELECT event_type, win, n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY win
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_ma7
FROM filled
""",
        "embedding_quantize": """
WITH s AS (
  SELECT vec_id,
         len(embedding) AS n_dims,
         list_max(list_transform(embedding, e -> abs(CAST(e AS DOUBLE)))) AS m
  FROM embeddings
),
q AS (
  SELECT s.vec_id, s.n_dims, s.m,
         CASE WHEN s.m = 0
              THEN list_transform(e.embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(e.embedding,
                x -> CAST(floor((CAST(x AS DOUBLE) / s.m) * 127.0 + 0.5)
                          AS BIGINT))
         END AS ql
  FROM s JOIN embeddings e ON e.vec_id = s.vec_id
)
SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims, m AS scale,
       CAST(list_sum(list_transform(ql, x -> abs(x))) AS BIGINT) AS l1_q,
       array_to_string(ql, ',') AS q_csv
FROM q
""",
        "embedding_outliers": """
WITH q AS (
  SELECT vec_id, label, g.i AS dim,
         CAST(floor(CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 65536.0 + 0.5)
              AS DOUBLE) / 256) AS BIGINT) AS u
  FROM embeddings, generate_series(1, 64) g(i)
),
s AS (SELECT label, dim, SUM(u) AS s, COUNT(*) AS c FROM q GROUP BY 1, 2),
d AS (
  SELECT q.vec_id, CAST(q.label AS BIGINT) AS label,
         CAST(SUM((s.c * q.u - s.s) * (s.c * q.u - s.s)) AS BIGINT) AS d2_num
  FROM q JOIN s ON s.label = q.label AND s.dim = q.dim
  GROUP BY 1, 2
)
SELECT label, vec_id, d2_num FROM d
QUALIFY row_number() OVER (PARTITION BY label ORDER BY d2_num DESC, vec_id) <= 3
""",
        "embedding_centroids": """
WITH q AS (
  SELECT label, g.i AS dim,
         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 65536.0 + 0.5)
              AS BIGINT) AS u
  FROM embeddings, generate_series(1, 64) g(i)
),
s AS (SELECT label, dim, SUM(u) AS s, count(*) AS n FROM q GROUP BY 1, 2)
SELECT CAST(label AS BIGINT) AS label, dim,
       ROUND(CAST(s AS DOUBLE) / n / 65536.0, 6) AS centroid
FROM s
""",
        "label_margin": """
WITH q AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, g.i AS dim,
         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 65536.0 + 0.5)
              AS BIGINT) + 1048576 AS v
  FROM embeddings, generate_series(1, 64) g(i)
),
c AS (
  SELECT label, dim, SUM(v) // COUNT(*) AS cv FROM q GROUP BY label, dim
),
d AS (
  SELECT q.vec_id, q.label AS own, c.label AS cand,
         SUM((q.v - c.cv) * (q.v - c.cv)) AS d2
  FROM q JOIN c ON c.dim = q.dim
  GROUP BY q.vec_id, q.label, c.label
),
best AS (
  SELECT vec_id, own, cand,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cand) AS rn
  FROM d
)
SELECT own AS label, COUNT(*) AS n_points,
       COUNT(*) FILTER (WHERE cand = own) AS n_correct,
       ROUND(CAST(COUNT(*) FILTER (WHERE cand = own) AS DOUBLE)
             / COUNT(*), 6) AS correct_share
FROM best WHERE rn = 1 GROUP BY own
""",
        "props_stats": """
WITH x AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS v
  FROM events
  WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT event_type, count(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM x GROUP BY event_type
""",
        "value_outliers": """
WITH u AS (
  SELECT event_id, event_type, value,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
st AS (
  SELECT event_type, count(*) AS n,
         SUM(CAST(c AS HUGEINT)) AS s,
         SUM(CAST(c AS HUGEINT) * c) AS ss
  FROM u GROUP BY event_type
),
p AS (
  SELECT event_type,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         sqrt(CAST(ss * n - s * s AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)) AS sd
  FROM st
)
SELECT u.event_id, u.event_type, u.value,
       ROUND((CAST(u.c AS DOUBLE) - p.m) / p.sd, 6) AS z
FROM u JOIN p USING (event_type)
WHERE abs(CAST(u.c AS DOUBLE) - p.m) > 3.0e0 * p.sd
""",
        "oov_rate": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tk AS (SELECT doc_id, t FROM toks WHERE t <> ''),
cnt AS (SELECT t, count(*) AS c FROM tk GROUP BY t),
topv AS (SELECT t FROM cnt ORDER BY c DESC, t LIMIT {OOV_V}),
s AS (
  SELECT tk.doc_id, CASE WHEN topv.t IS NULL THEN 1 ELSE 0 END AS o
  FROM tk LEFT JOIN topv ON topv.t = tk.t
),
agg AS (
  SELECT doc_id, count(*) AS n, SUM(o) AS no FROM s GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(agg.no, 0) AS BIGINT) AS n_oov,
       ROUND(CAST(COALESCE(agg.no, 0) AS DOUBLE)
             / GREATEST(COALESCE(agg.n, 0), 1), 6) AS oov_rate
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "event_trigrams": f"""
WITH s AS (
  SELECT user_id, event_type AS a,
         LEAD(event_type, 1) OVER w AS b,
         LEAD(event_type, 2) OVER w AS c
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT a, b, c, CAST(count(*) AS BIGINT) AS cnt
FROM s WHERE b IS NOT NULL AND c IS NOT NULL
GROUP BY a, b, c
ORDER BY cnt DESC, a, b, c LIMIT {TRIGRAM_TOP}
""",
        "top_users_per_type": f"""
WITH c AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, user_id
),
r AS (
  SELECT event_type, user_id, n_events,
         row_number() OVER (PARTITION BY event_type
           ORDER BY n_events DESC, user_id) AS rn
  FROM c
)
SELECT event_type, user_id, n_events, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= {TOPUSERS_N}
""",
        "hll_users": _hll_users_sql(),
        "cms_top_users": _cms_top_users_sql(),
        "wau_rolling": f"""
WITH p AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events
),
t AS (
  SELECT DISTINCT d + k AS day
  FROM p, unnest(generate_series(0, {WAU_DAYS - 1})) AS g(k)
)
SELECT t.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
FROM t JOIN p ON p.d BETWEEN t.day - {WAU_DAYS - 1} AND t.day
GROUP BY t.day
""",
        "longest_streak": _SQL_LONGEST_STREAK,
        "conversion_lag": _SQL_CONVERSION_LAG,
        "daily_users": """
WITH d AS (
  SELECT epoch_us(ts) // 86400000000 AS "window", user_id FROM events
)
SELECT "window", count(DISTINCT user_id) AS users FROM d GROUP BY "window"
""",
        "modal_event_type": _SQL_MODAL_EVENT_TYPE,
        "event_type_pivot": _SQL_EVENT_TYPE_PIVOT,
        "interarrival_stats": _SQL_INTERARRIVAL_STATS,
        "degree_histogram": _SQL_DEGREE_HISTOGRAM,
        "rich_club": _SQL_RICH_CLUB,
        "weekly_retention": """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS "window"
  FROM events
),
nxt AS (
  SELECT user_id, "window",
         LEAD("window") OVER (PARTITION BY user_id ORDER BY "window") AS nw
  FROM uw
)
SELECT "window", count(*) AS active,
  CAST(COALESCE(SUM(CASE WHEN nw = "window" + 1 THEN 1 END), 0) AS BIGINT)
    AS retained,
  CAST(COALESCE(SUM(CASE WHEN nw = "window" + 1 THEN 1 END), 0) AS DOUBLE)
    / count(*) AS rate
FROM nxt GROUP BY "window"
""",
        "bottomk_median": f"""
WITH h AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST((((CAST(event_id AS HUGEINT) * 11400714819323198485)
                 % 18446744073709551616) // 4294967296) AS BIGINT) AS hh
  FROM events
),
samp AS (
  SELECT event_type, cents FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY hh, event_id) AS rn
    FROM h) s WHERE rn <= {BOTTOMK_K}
),
spick AS (
  SELECT event_type, k_used, cents AS est_cents FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS k_used
    FROM samp) s
  WHERE r = CAST(ceil(0.5e0 * k_used) AS BIGINT)
),
epick AS (
  SELECT event_type, n_events, cents AS exact_cents FROM (
    SELECT event_type, cents,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS n_events
    FROM h) s
  WHERE r = CAST(ceil(0.5e0 * n_events) AS BIGINT)
)
SELECT e.event_type, e.n_events, s.k_used,
       CAST(s.est_cents AS DOUBLE) / 100.0 AS est_median,
       CAST(e.exact_cents AS DOUBLE) / 100.0 AS exact_median,
       abs(s.est_cents - e.exact_cents) AS err_cents
FROM epick e JOIN spick s ON s.event_type = e.event_type
ORDER BY e.event_type
""",
        "value_percentiles": """
WITH u AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
h AS (SELECT event_type, cents, count(*) AS c FROM u GROUP BY 1, 2),
r AS (
  SELECT event_type, cents,
         SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
  CAST(MIN(CASE WHEN cum >= ceil(0.5e0 * n) THEN cents END) AS DOUBLE)
    / 100.0 AS p50,
  CAST(MIN(CASE WHEN cum >= ceil(0.9e0 * n) THEN cents END) AS DOUBLE)
    / 100.0 AS p90,
  CAST(MIN(CASE WHEN cum >= ceil(0.99e0 * n) THEN cents END) AS DOUBLE)
    / 100.0 AS p99
FROM r GROUP BY event_type
""",
        "throttle_events": f"""
WITH s AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type, ts_us FROM s
WHERE prev_us IS NULL OR ts_us - prev_us > {THROTTLE_GAP_US}
""",
        "doc_logprob": f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents
),
tk AS (SELECT doc_id, t FROM toks WHERE t <> ''),
cnt AS (SELECT t, count(*) AS c FROM tk GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS C FROM cnt),
topv AS (SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT {UNIGRAM_V}),
q AS (SELECT t, CAST(floor(ln(CAST(c AS DOUBLE) / (SELECT C FROM tot)) * 1e9
                     + 0.5) AS BIGINT) AS qln FROM topv),
oov AS (SELECT CAST(floor(ln(1.0e0 / (SELECT C FROM tot)) * 1e9 + 0.5)
                AS BIGINT) AS qln),
s AS (SELECT tk.doc_id, COALESCE(q.qln, (SELECT qln FROM oov)) AS qln
      FROM tk LEFT JOIN q ON q.t = tk.t),
agg AS (SELECT doc_id, count(*) AS n, SUM(qln) AS lp FROM s GROUP BY doc_id)
SELECT d.doc_id, COALESCE(agg.n, 0) AS n_tokens,
       CAST(COALESCE(agg.lp, 0) AS BIGINT) AS logprob_e9
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "cdc_dedup": f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
           WHERE length(text) > 0),
b AS (
  SELECT doc_id, i - 1 AS pos,
         ord(substring(text, CAST(i AS INTEGER), 1)) AS byte, n
  FROM (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS i FROM d)),
pw AS (SELECT * FROM (VALUES {_cdc_vals()}) t(j, pw)),
g AS (
  SELECT b.doc_id, b.pos AS p,
         CAST(sum(CAST(b2.byte AS HUGEINT) * pw.pw) % 2305843009213693951
              AS BIGINT) AS h
  FROM b JOIN pw ON TRUE
  JOIN b b2 ON b2.doc_id = b.doc_id AND b2.pos = b.pos + pw.j
  WHERE b.pos + 8 <= b.n
  GROUP BY 1, 2),
cuts AS (
  SELECT g.doc_id, g.p + 8 AS cut
  FROM g JOIN d USING (doc_id)
  WHERE g.h % 64 = 0 AND g.p + 8 < d.n
  UNION ALL
  SELECT doc_id, 0 AS cut FROM d),
spans AS (
  SELECT c.doc_id, c.cut AS start,
         LEAD(c.cut, 1, d.n) OVER (
           PARTITION BY c.doc_id ORDER BY c.cut) AS stop
  FROM cuts c JOIN d USING (doc_id)),
ch AS (
  SELECT s.doc_id,
         substr(d.text, CAST(s.start + 1 AS INTEGER),
                CAST(s.stop - s.start AS INTEGER)) AS chunk
  FROM spans s JOIN d USING (doc_id)),
dg AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk)
SELECT ch.doc_id,
       count(*) AS n_chunks,
       count(*) FILTER (WHERE dg.nd >= 2) AS dup_chunks,
       count(*) FILTER (WHERE dg.nd >= 2) * 1000000 // count(*) AS dup_ppm
FROM ch JOIN dg USING (chunk)
GROUP BY ch.doc_id
""",
        "kn_logprob": """
WITH base AS (
  SELECT doc_id, string_split(lower(COALESCE(text, '')), ' ') AS arr
  FROM documents
),
w AS (
  SELECT doc_id, unnest(arr) AS t, generate_subscripts(arr, 1) AS pos
  FROM base
),
tk AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM w WHERE t <> ''
),
bg AS (
  SELECT a.doc_id, a.t AS wa, b.t AS wb
  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
),
cnt AS (SELECT wa, wb, count(*) AS c FROM bg GROUP BY wa, wb),
lt AS (SELECT wa, CAST(SUM(c) AS BIGINT) AS ca FROM cnt GROUP BY wa),
nf AS (SELECT wa, count(*) AS n1f FROM cnt GROUP BY wa),
nr AS (SELECT wb, count(*) AS n1r FROM cnt GROUP BY wb),
nt AS (SELECT count(*) AS n1t FROM cnt),
q AS (
  SELECT cnt.wa, cnt.wb,
         CAST(floor(ln(
           greatest(CAST(cnt.c AS DOUBLE) - 0.75, 0)
             / CAST(lt.ca AS DOUBLE)
           + (0.75 * CAST(nf.n1f AS DOUBLE)) / CAST(lt.ca AS DOUBLE)
             * (CAST(nr.n1r AS DOUBLE)
                / CAST((SELECT n1t FROM nt) AS DOUBLE))
         ) * 1e9 + 0.5) AS BIGINT) AS qln
  FROM cnt JOIN lt USING (wa) JOIN nf USING (wa) JOIN nr USING (wb)
),
s AS (
  SELECT bg.doc_id, q.qln
  FROM bg JOIN q ON q.wa = bg.wa AND q.wb = bg.wb
),
agg AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(qln) AS BIGINT) AS lp
  FROM s GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_bigrams,
       COALESCE(agg.lp, 0) AS kn_logprob_e9
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "bigram_logprob": """
WITH base AS (
  SELECT doc_id, string_split(lower(COALESCE(text, '')), ' ') AS arr
  FROM documents
),
w AS (
  SELECT doc_id, unnest(arr) AS t, generate_subscripts(arr, 1) AS pos
  FROM base
),
tk AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM w WHERE t <> ''
),
bg AS (
  SELECT a.doc_id, a.t AS wa, b.t AS wb
  FROM tk a JOIN tk b ON b.doc_id = a.doc_id AND b.rn = a.rn + 1
),
cnt AS (SELECT wa, wb, count(*) AS c FROM bg GROUP BY wa, wb),
lt AS (SELECT wa, CAST(SUM(c) AS BIGINT) AS ca FROM cnt GROUP BY wa),
q AS (
  SELECT cnt.wa, cnt.wb,
         CAST(floor(ln(CAST(cnt.c AS DOUBLE) / CAST(lt.ca AS DOUBLE)) * 1e9
                    + 0.5) AS BIGINT) AS qln
  FROM cnt JOIN lt USING (wa)
),
s AS (
  SELECT bg.doc_id, q.qln
  FROM bg JOIN q ON q.wa = bg.wa AND q.wb = bg.wb
),
agg AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(qln) AS BIGINT) AS lp
  FROM s GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_bigrams,
       COALESCE(agg.lp, 0) AS logprob_e9
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "winnow_dups": f"""
WITH d AS (
  SELECT DISTINCT doc_id, fp FROM ({_winnow_sql()}) wfp
),
cnt AS (SELECT fp, count(*) AS c FROM d GROUP BY fp),
ok AS (SELECT fp FROM cnt WHERE c BETWEEN 2 AND 8),
pairs AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM d a JOIN ok USING (fp) JOIN d b USING (fp)
  WHERE a.doc_id < b.doc_id
)
SELECT da AS doc_a, db AS doc_b, count(*) AS shared_fps
FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2
""",
        "substring_dedup": """
WITH d AS (SELECT doc_id, text, n_chars FROM documents WHERE n_chars >= 32),
idx AS (
  SELECT doc_id,
         unnest(generate_series(1, CAST(n_chars - 31 AS BIGINT), 4)) AS i
  FROM d
),
pos AS (
  SELECT idx.doc_id, substr(d.text, CAST(idx.i AS INTEGER), 32) AS gram
  FROM idx JOIN d USING (doc_id)
),
dg AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM pos GROUP BY gram)
SELECT p.doc_id,
       count(*) AS n_grams,
       count(*) FILTER (WHERE dg.nd >= 2) AS dup_grams,
       count(*) FILTER (WHERE dg.nd >= 2) * 1000000 // count(*) AS dup_ppm
FROM pos p JOIN dg USING (gram)
GROUP BY p.doc_id
""",
        "importance_weights": f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS t
  FROM documents
),
tk AS (SELECT doc_id, lang, t FROM toks WHERE t <> ''),
cnt AS (SELECT t, count(*) AS c,
               count(*) FILTER (WHERE lang = 'en') AS ct
        FROM tk GROUP BY t),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS C, CAST(SUM(ct) AS BIGINT) AS CT
        FROM cnt),
topv AS (SELECT t, c, ct FROM cnt ORDER BY c DESC, t LIMIT {DSIR_V}),
vv AS (SELECT count(*) AS v FROM topv),
q AS (SELECT t,
        CAST(floor(ln(CAST(ct + 1 AS DOUBLE)
             / CAST((SELECT CT FROM tot) + (SELECT v FROM vv) AS DOUBLE))
             * 1e9 + 0.5) AS BIGINT)
      - CAST(floor(ln(CAST(c + 1 AS DOUBLE)
             / CAST((SELECT C FROM tot) + (SELECT v FROM vv) AS DOUBLE))
             * 1e9 + 0.5) AS BIGINT) AS qd
      FROM topv),
oov AS (SELECT
        CAST(floor(ln(1.0e0
             / CAST((SELECT CT FROM tot) + (SELECT v FROM vv) AS DOUBLE))
             * 1e9 + 0.5) AS BIGINT)
      - CAST(floor(ln(1.0e0
             / CAST((SELECT C FROM tot) + (SELECT v FROM vv) AS DOUBLE))
             * 1e9 + 0.5) AS BIGINT) AS qd),
s AS (SELECT tk.doc_id, COALESCE(q.qd, (SELECT qd FROM oov)) AS qd
      FROM tk LEFT JOIN q ON q.t = tk.t),
agg AS (SELECT doc_id, count(*) AS n, CAST(SUM(qd) AS BIGINT) AS w
        FROM s GROUP BY doc_id)
SELECT d.doc_id, CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_tokens,
       COALESCE(agg.w, 0) AS weight_e9
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""",
        "chunk_dedup": f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
c AS (
  SELECT doc_id, toks, nt,
         unnest(generate_series(
           0, CAST(ceil(CAST(nt AS DOUBLE) / {CHUNK_TOKENS}) AS BIGINT) - 1
         )) AS ck
  FROM n WHERE nt > 0
),
ch AS (
  SELECT doc_id, ck AS chunk_id,
         array_to_string(
           toks[CAST(ck * {CHUNK_TOKENS} + 1 AS BIGINT)
                : CAST(LEAST(ck * {CHUNK_TOKENS} + {CHUNK_TOKENS}, nt) AS BIGINT)],
           ' ') AS chunk_text
  FROM c
),
h AS (
  SELECT sha256(chunk_text) AS sha, doc_id * 1000000 + chunk_id AS fk
  FROM ch
)
SELECT sha, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(MIN(fk) // 1000000 AS BIGINT) AS doc_id,
       CAST(MIN(fk) % 1000000 AS BIGINT) AS chunk_id
FROM h GROUP BY sha
""",
        "bpe_pairs": f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(COALESCE(text, ''), ' '),
                x -> x <> '')) AS tok
  FROM documents
),
pos AS (
  SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
  FROM toks WHERE length(tok) >= 2
),
pairs AS (
  SELECT unicode(substr(tok, i, 1)) AS a,
         unicode(substr(tok, i + 1, 1)) AS b,
         substr(tok, i, 2) AS pair
  FROM pos
)
SELECT pair, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS cnt
FROM pairs GROUP BY pair, a, b
ORDER BY cnt DESC, a, b LIMIT {BPE_TOP}
""",
        "pack_sequences": f"""
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> ''))
           AS nt
  FROM documents
),
o AS (
  SELECT doc_id, nt,
         COALESCE(SUM(nt) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM t
),
p AS (
  SELECT doc_id, nt, CAST(s AS BIGINT) AS s,
         CAST(s // {PACK_TOKENS} AS BIGINT) AS f,
         CAST((s + nt - 1) // {PACK_TOKENS} AS BIGINT) AS l
  FROM o WHERE nt > 0
),
x AS (SELECT doc_id, s, nt, unnest(generate_series(f, l)) AS k FROM p)
SELECT CAST(k AS BIGINT) AS seq_id, doc_id,
       CAST(GREATEST(k * {PACK_TOKENS}, s) - s AS BIGINT) AS doc_tok_start,
       CAST(LEAST((k + 1) * {PACK_TOKENS}, s + nt)
            - GREATEST(k * {PACK_TOKENS}, s) AS BIGINT) AS n_toks
FROM x
""",
        "chunk_documents": f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
n AS (SELECT doc_id, toks, len(toks) AS nt FROM t),
c AS (
  SELECT doc_id, toks, nt,
         unnest(generate_series(
           0, CAST(ceil(CAST(nt AS DOUBLE) / {CHUNK_TOKENS}) AS BIGINT) - 1
         )) AS ck
  FROM n WHERE nt > 0
)
SELECT doc_id, ck AS chunk_id,
       CAST(LEAST(ck * {CHUNK_TOKENS} + {CHUNK_TOKENS}, nt)
            - ck * {CHUNK_TOKENS} AS BIGINT) AS n_tokens,
       array_to_string(
         toks[CAST(ck * {CHUNK_TOKENS} + 1 AS BIGINT)
              : CAST(LEAST(ck * {CHUNK_TOKENS} + {CHUNK_TOKENS}, nt) AS BIGINT)],
         ' ') AS chunk_text
FROM c
""",
        "budget_fill": rf"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
         ELSE len(regexp_split_to_array(
                regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
    END AS n_tok,
    len(regexp_extract_all(lower(text),
        '\b(?:the|and|of|to|is|a|in|that|it)\b')) AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id, n_tok,
         (n_stop * 1000000) // greatest(n_tok, 1) AS qk
  FROM t
),
c AS (
  SELECT doc_id, qk, n_tok,
         SUM(n_tok) OVER (ORDER BY qk DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM q
)
SELECT doc_id, qk AS quality_key, n_tok AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens
FROM c WHERE cum <= {BUDGET_TOKENS}
""",
        "doc_quality": r"""
SELECT doc_id,
  ROUND(CAST(length(regexp_replace(text, '[\w\s]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS punct_ratio,
  ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1), 6) AS alpha_ratio,
  ROUND(CAST(length(text) AS DOUBLE)
        / (length(regexp_replace(text, '\S', '', 'g')) + 1), 6) AS mean_word_len,
  ROUND(CAST(len(regexp_extract_all(lower(text), '\b(?:the|and|of|to|is|a|in|that|it)\b')) AS DOUBLE)
        / greatest(CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = ''
                        THEN 0
                        ELSE len(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
                   END, 1), 6) AS stopword_ratio
FROM documents
""",
        "token_counts": r"""
SELECT doc_id,
  CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
       ELSE len(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
  END AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS re_tokens
FROM documents
""",
        "source_stats": """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / count(*), 2) AS mean_chars
FROM documents GROUP BY source
""",
        "sampling_weights": """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
m AS (SELECT MAX(n) AS mx FROM c)
SELECT lang, n AS n_docs,
       ROUND(sqrt(CAST(n AS DOUBLE)) / sqrt(CAST((SELECT mx FROM m) AS DOUBLE)),
             6) AS weight
FROM c
""",
        "repetition_signals": r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
  FROM documents WHERE trim(text) <> ''
), words AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS pos FROM base
), wc AS (
  SELECT doc_id, count(*) AS nw, count(DISTINCT w) AS nd
  FROM words GROUP BY doc_id
), twc AS (
  SELECT doc_id, max(c) AS topw FROM (
    SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
  ) GROUP BY doc_id
), bg AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM words a JOIN words b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
), bgc AS (
  SELECT doc_id, max(c) AS topb, sum(c) AS nb FROM (
    SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY doc_id, w1, w2
  ) GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(wc.nw, 0) AS n_words,
  ROUND(COALESCE(CAST(wc.nd AS DOUBLE) / wc.nw, 0.0), 6) AS distinct_word_frac,
  ROUND(COALESCE(CAST(twc.topw AS DOUBLE) / wc.nw, 0.0), 6) AS top_word_frac,
  ROUND(COALESCE(CAST(bgc.topb AS DOUBLE) / bgc.nb, 0.0), 6) AS top_bigram_frac
FROM documents d
LEFT JOIN wc USING (doc_id) LEFT JOIN twc USING (doc_id)
LEFT JOIN bgc USING (doc_id)
ORDER BY doc_id
""",
        "corpus_manifest": _corpus_manifest_sql(),
        "lang_confusion": (
            "WITH li AS (" + _lang_id_sql() + ")\n"
            "SELECT d.lang, li.lang_pred, CAST(COUNT(*) AS BIGINT) AS n\n"
            "FROM documents d JOIN li ON li.doc_id = d.doc_id\n"
            "GROUP BY d.lang, li.lang_pred"
        ),
        "ngram_novelty": r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents WHERE trim(text) <> ''
), g AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
  WHERE len(words) >= 5
), own AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram
), tot AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id
), nov AS (
  SELECT first_doc AS doc_id, COUNT(*) AS novel FROM own GROUP BY first_doc
)
SELECT d.doc_id,
  COALESCE(t.n_grams, 0) AS n_grams,
  COALESCE(v.novel, 0) AS novel_grams,
  ROUND(COALESCE(CAST(v.novel AS DOUBLE) / t.n_grams, 0.0), 6) AS novelty
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN nov v ON v.doc_id = d.doc_id
""",
        "decontaminate": r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents WHERE trim(text) <> ''
), bg AS (
  SELECT DISTINCT array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
  WHERE doc_id % 7 = 0 AND len(words) >= 5
), cg AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - 3)) AS t(i)
  WHERE doc_id % 7 <> 0 AND len(words) >= 5
), m AS (
  SELECT doc_id,
         count(*) AS n_grams,
         count(*) FILTER (WHERE gram IN (SELECT gram FROM bg)) AS matched
  FROM cg GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(m.n_grams, 0) AS n_grams,
  COALESCE(m.matched, 0) AS matched_grams,
  CAST(CASE WHEN COALESCE(m.matched, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
    AS contaminated,
  ROUND(COALESCE(CAST(m.matched AS DOUBLE) / m.n_grams, 0.0), 6)
    AS contamination_frac
FROM documents d LEFT JOIN m USING (doc_id)
WHERE d.doc_id % 7 <> 0
ORDER BY d.doc_id
""",
        "stratified_sample": r"""
SELECT doc_id, lang FROM documents
WHERE CAST(
    (((CAST(doc_id AS HUGEINT) * 11400714819323198485) % 18446744073709551616)
     // 4294967296) % 10000 AS BIGINT)
  < CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 8000
              WHEN 'fr' THEN 8000 WHEN 'es' THEN 8000 ELSE 10000 END
ORDER BY doc_id
""",
        "pii_redact": r"""
WITH s1 AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, n_emails,
    len(regexp_extract_all(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phones,
    regexp_replace(t1, '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT doc_id, n_emails, n_phones,
    len(regexp_extract_all(t2, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS n_ipv4,
    regexp_replace(t2, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_emails, n_phones, n_ipv4,
  CAST(('0x' || substring(sha256(t3), 1, 15)) AS BIGINT) AS redacted_sha
FROM s3 ORDER BY doc_id
""",
        "streamhash_sketches": _streamhash_sketches_sql(),
        "simhash_sketches": _simhash_sketches_sql(),
        "lsh_isolated": _lsh_isolated_sql(),
        "anomaly_scenarios": _anomaly_scenarios_sql(),
        "weighted_sample": _SQL_WEIGHTED_SAMPLE,
        "anomaly_scenarios_injected": _anomaly_scenarios_sql(
            _SQL_SHINGLE_CTES.replace(
                "string_agg(et || dt, '' ORDER BY dst)",
                "string_agg(CASE WHEN src % 53 >= 48 THEN upper(et)"
                " ELSE et END || dt, '' ORDER BY dst)",
            )
        ),
        "lsh_clusters": _lsh_clusters_sql(),
        "ngram_jaccard": _ngram_jaccard_sql(),
        "ngram_containment": _ngram_containment_sql(),
        "minhash_dedup": _minhash_dedup_sql(),
        "simhash_dedup": _simhash_dedup_sql(),
        "simhash_near_dup": _simhash_near_dup_sql(),
        "incremental_sketches": _incremental_sketches_sql(),
        "streamspot_snapshots": _streamspot_snapshots_sql(),
        "similarity_report": _similarity_report_sql(),
        "corpus_pipeline": _corpus_pipeline_sql(),
        "shared_imports": _shared_imports_sql(),
        "boilerplate_lines": _boilerplate_sql(),
        "kcore": _kcore_sql(),
        "common_neighbors": _SQL_COMMON_NEIGHBORS,
        "linkpred_cap_recall": _SQL_LINKPRED_CAP_RECALL.format(edges=_SQL_EDGES),
        "knn_ivf": _knn_ivf_sql(),
        "knn_lsh": _knn_lsh_sql(),
        "ann_recall": _ann_recall_sql(),
        "embedding_near_dup": _embedding_near_dup_sql(),
        "embedding_dedup": _embedding_dedup_sql(),
        "bm25_search": _bm25_sql(),
        "ql_search": _ql_sql(),
        "retrieval_overlap": _retrieval_overlap_sql(),
        "rank_fusion": _rank_fusion_sql(),
        "tfidf_topterms": _SQL_TFIDF_TOPTERMS,
        "group_sample": _SQL_GROUP_SAMPLE,
        "events_cumsum": _SQL_EVENTS_CUMSUM,
        "term_tf": """
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
)
SELECT term, count(*) AS tf FROM t WHERE term <> '' GROUP BY term
ORDER BY tf DESC, term ASC LIMIT 100
""",
        "dup_stats": """
WITH g AS (
  SELECT sha256(text) AS h, COUNT(*) AS sz FROM documents GROUP BY h
)
SELECT sz AS group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM g GROUP BY sz ORDER BY sz
""",
        "vocab_growth": _SQL_VOCAB_GROWTH,
        "type_token_ratio": _SQL_TTR,
        "term_df": """
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
), d AS (SELECT DISTINCT doc_id, term FROM t WHERE term <> '')
SELECT term, count(*) AS df FROM d GROUP BY term
ORDER BY df DESC, term ASC LIMIT 100
""",
        "doc_percentiles": r"""
WITH tc AS (
  SELECT lang,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS ws_tokens
  FROM documents
), r AS (
  SELECT lang, ws_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY ws_tokens) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM tc
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
  CAST(max(CASE WHEN rn = CAST(ceil(0.5e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p50,
  CAST(max(CASE WHEN rn = CAST(ceil(0.9e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p90,
  CAST(max(CASE WHEN rn = CAST(ceil(0.99e0 * n) AS BIGINT) THEN ws_tokens END)
       AS BIGINT) AS p99
FROM r GROUP BY lang
""",
        "image_phash": """
WITH RECURSIVE pw(i, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i + 1, p * 2 FROM pw WHERE i < 63
),
img AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0),
b AS (
  SELECT media_id, g.j // 64 AS blk,
         ascii(substring(text, CAST((g.j % length(text)) + 1 AS INT), 1))
           AS byte
  FROM img, generate_series(0, 4095) g(j)
  WHERE length(text) > 0
),
bs AS (SELECT media_id, blk, SUM(byte) AS s FROM b GROUP BY 1, 2),
tot AS (SELECT media_id, SUM(s) AS t FROM bs GROUP BY 1),
h AS (
  SELECT bs.media_id,
         SUM(CASE WHEN bs.s * 64 > tot.t THEN pw.p ELSE CAST(0 AS HUGEINT)
             END) AS hraw
  FROM bs JOIN tot USING (media_id) JOIN pw ON pw.i = bs.blk
  GROUP BY bs.media_id
),
ph AS (
  SELECT img.media_id,
         COALESCE(CAST(CASE
           WHEN h.hraw >= CAST(9223372036854775808 AS HUGEINT)
           THEN h.hraw - CAST(18446744073709551616 AS HUGEINT)
           ELSE h.hraw END AS BIGINT), 0) AS phash
  FROM img LEFT JOIN h USING (media_id)
)
SELECT media_id, phash, MIN(media_id) OVER (PARTITION BY phash) AS dup_group
FROM ph
""",
        "media_features": _SQL_MEDIA_FEATURES,
        "image_resize": _SQL_IMAGE_RESIZE,
        "audio_frames": _SQL_AUDIO_FRAMES,
        "video_frames": _SQL_VIDEO_FRAMES,
        "scene_cuts": _SQL_SCENE_CUTS,
        "lang_id": _lang_id_sql(),
        "fingerprints": """
WITH RECURSIVE pw(i, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i+1, (p * 257) % 2305843009213693951 FROM pw
  WHERE i < (SELECT max(length(text)) FROM documents)
),
b AS (
  SELECT doc_id, g.i AS pos, ascii(substring(text, CAST(g.i AS INT), 1)) AS byte,
         length(text) AS n
  FROM documents, generate_series(1, 8192) g(i) WHERE g.i <= length(text)
)
SELECT d.doc_id,
       CAST(('0x' || substring(sha256(d.text), 1, 15)) AS BIGINT) AS fingerprint,
       COALESCE(r.rolling61, 0) AS rolling61
FROM documents d LEFT JOIN (
  SELECT doc_id,
         CAST(SUM((CAST(byte AS HUGEINT) * pw.p) % 2305843009213693951)
              % 2305843009213693951 AS BIGINT) AS rolling61
  FROM b JOIN pw ON pw.i = b.n - b.pos GROUP BY doc_id
) r ON r.doc_id = d.doc_id
""",
        "edit_distance_dedup": _SQL_EDIT_DISTANCE_DEDUP,
        "snm_dedup": _snm_sql(),
        "bloom_semi": _bloom_sql(),
        "allpairs_jaccard": _allpairs_jaccard_sql(),
        "temporal_reach": _temporal_reach_sql(),
        "link_negatives": _link_negatives_sql(),
        "linkpred_auc": _linkpred_auc_sql(),
        "wl_colors": _wl_sql(),
        "densest_peel": _densest_peel_sql(),
        "corpus_split": _corpus_split_sql(),
        "path_rollup": _path_rollup_sql(),
        "fork_candidates": _fork_candidates_sql(),
        "dedup_by_source": _SQL_DEDUP_BY_SOURCE,
        "exact_dedup": """
SELECT doc_id, sha256(text) AS content_hash FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
""",
        "knn_cosine": _knn_cosine_sql(),
        "mmr_diversify": _mmr_sql(),
    }


NS_SEEDS = tuple(range(1, 41))  # customer keys, present at every sf
NS_FANOUTS = (3, 2, 2)


def q_neighbor_sample(sf_dir: str):
    """GraphSAGE mini-batch computation graph: deterministic fixed-fanout
    neighbor sampling (3, 2, 2) from 40 customer seeds over the derived
    edge table — the frontier is broadcast per hop, never shuffled."""
    from sbustreamspot_core_ray.pipelines.superstep import neighbor_sample

    # dedup=False: the sampler ranks over DISTINCT (src, dst) pairs
    # internally, so the global distinct shuffle is skipped; materialized
    # because every hop re-scans the table
    return neighbor_sample(
        _edges_full(sf_dir, dedup=False).materialize(),
        np.array(NS_SEEDS, np.int64),
        fanouts=NS_FANOUTS,
        num_parts=P,
    )


def _neighbor_sample_sql() -> str:
    seeds = ", ".join(f"({s})" for s in NS_SEEDS)
    ctes = [
        f"de AS MATERIALIZED ({_SQL_EDGES})",
        "pri AS MATERIALIZED (SELECT src, dst,"
        " (src * 2654435761 + dst * 40503) % 2147483647 AS h FROM de)",
        f"f1 AS (SELECT DISTINCT v FROM (VALUES {seeds}) t(v))",
        "x1 AS (SELECT v FROM f1)",
    ]
    for i, k in enumerate(NS_FANOUTS, start=1):
        ctes.append(
            f"h{i} AS (SELECT p.src, p.dst FROM pri p JOIN f{i} f ON p.src = f.v"
            f" QUALIFY row_number() OVER (PARTITION BY p.src ORDER BY p.h, p.dst)"
            f" <= {k})"
        )
        if i < len(NS_FANOUTS):
            ctes.append(
                f"f{i + 1} AS (SELECT DISTINCT dst AS v FROM h{i}"
                f" WHERE dst NOT IN (SELECT v FROM x{i}))"
            )
            ctes.append(
                f"x{i + 1} AS (SELECT v FROM x{i} UNION SELECT v FROM f{i + 1})"
            )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS hop, CAST(src AS BIGINT) AS src,"
        f" CAST(dst AS BIGINT) AS dst FROM h{i}"
        for i in range(1, len(NS_FANOUTS) + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


INTRADOC_W = 2


def q_intradoc_dedup(sf_dir: str):
    """Within-document repeated-segment removal (window=2 words): the
    intra-doc boilerplate cleanup pass before cross-document dedup.
    No shuffle — one vectorized map_batches pass."""
    from sbustreamspot_core_ray.stages.curation import intradoc_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return intradoc_dedup(docs, window=INTRADOC_W)


def _intradoc_dedup_sql() -> str:
    W = INTRADOC_W
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
s AS (
  SELECT doc_id, g.i AS seg_idx,
         array_to_string(ws[(g.i*{W}+1):((g.i+1)*{W})], ' ') AS seg,
         least(len(ws) - g.i*{W}, {W}) AS nw
  FROM w CROSS JOIN generate_series(0, 511) g(i)
  WHERE g.i * {W} < len(ws)),
k AS (SELECT *, row_number() OVER (PARTITION BY doc_id, seg ORDER BY seg_idx) = 1
         AS keep FROM s)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_segs,
  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_segs,
  CAST(sum(CASE WHEN keep THEN nw ELSE 0 END) AS BIGINT) AS n_kept_words
FROM k GROUP BY doc_id"""


def q_cusum_shift(sf_dir: str):
    """Integer-exact CUSUM level-shift detection per event type over
    zero-filled daily counts — max |deviation from the mean path| and its
    earliest argmax day."""
    from sbustreamspot_core_ray.stages.events import cusum_by_type

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    return cusum_by_type(ev, num_parts=P)


def _cusum_shift_sql() -> str:
    return """
WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
b AS (SELECT event_type, min(day) AS lo, max(day) AS hi, count(*) AS total
      FROM e GROUP BY 1),
d AS (SELECT b.event_type, b.lo + g.i AS day, b.total,
             b.hi - b.lo + 1 AS n_days
      FROM b CROSS JOIN generate_series(0, 255) g(i) WHERE b.lo + g.i <= b.hi),
c AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
z AS (SELECT d.event_type, d.day, d.n_days, d.total, COALESCE(c.n, 0) AS n
      FROM d LEFT JOIN c ON c.event_type = d.event_type AND c.day = d.day),
s AS (SELECT event_type, day, n_days, total,
        n_days * sum(n) OVER (PARTITION BY event_type ORDER BY day)
          - total * row_number() OVER (PARTITION BY event_type ORDER BY day)
          AS dev
      FROM z)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(total AS BIGINT) AS total,
       CAST(abs(dev) AS BIGINT) AS max_dev, CAST(day AS BIGINT) AS shift_day
FROM s
QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY abs(dev) DESC, day)
        = 1"""


def q_f2_moment(sf_dir: str):
    """AMS tug-of-war F2 sketch over per-user event counts with the exact
    second moment as witness — 9 integer counters of state, one int-key
    shuffle."""
    from sbustreamspot_core_ray.stages.events import f2_moment

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return f2_moment(ev, num_parts=P)


def _f2_moment_sql() -> str:
    from sbustreamspot_core_ray.stages.events import AMS_CONSTS

    vals = ", ".join(f"({r}, {c})" for r, c in enumerate(AMS_CONSTS))
    mid = len(AMS_CONSTS) // 2 + 1
    return f"""
WITH f AS (SELECT user_id AS u, count(*) AS n FROM events GROUP BY 1),
consts AS (SELECT * FROM (VALUES {vals}) t(r, c)),
s AS (SELECT r,
        CASE WHEN (CAST(u AS HUGEINT) * c) % 18446744073709551616
                  < 9223372036854775808 THEN n ELSE -n END AS sn
      FROM f CROSS JOIN consts),
est AS (SELECT r, sum(sn) AS z FROM s GROUP BY r),
med AS (SELECT z * z AS zz FROM est
        QUALIFY row_number() OVER (ORDER BY z * z) = {mid})
SELECT CAST((SELECT sum(n * n) FROM f) AS BIGINT) AS f2_exact,
       CAST((SELECT zz FROM med) AS BIGINT) AS f2_med_est"""


FORK_MIN_SHARED = 2


def q_fork_candidates(sf_dir: str):
    """Fork/vendored-copy candidates: repo pairs sharing >= 2 identical
    relative paths — path-grouped triangular pair decode, two cheap-key
    shuffles, no all-pairs repo join."""
    from sbustreamspot_core_ray.sources.corpus import (
        fork_candidates,
        generate_corpus,
        ingest_corpus,
    )

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    return fork_candidates(
        ingest_corpus(root, num_partitions=4),
        min_shared=FORK_MIN_SHARED,
        num_parts=P,
    )


def _fork_candidates_sql() -> str:
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return f"""
WITH f AS (
  SELECT DISTINCT repo, path
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')
)
SELECT a.repo AS repo_a, b.repo AS repo_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM f a JOIN f b ON a.path = b.path AND a.repo < b.repo
GROUP BY 1, 2
HAVING count(*) >= {FORK_MIN_SHARED}"""


def q_char_entropy(sf_dir: str):
    """Per-document character-distribution entropy (binary/compressed
    detector) — zero-shuffle vectorized bincount, bit-exact integer
    ln decomposition."""
    from sbustreamspot_core_ray.stages.text import char_entropy

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return char_entropy(docs)


def _char_entropy_sql() -> str:
    return """
WITH ch AS (
  SELECT doc_id, substring(text, g.i, 1) AS c
  FROM documents CROSS JOIN generate_series(1, 1024) g(i)
  WHERE g.i <= length(text)),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
s AS (SELECT doc_id, sum(n) AS nc, count(*) AS nd,
        sum(n * CAST(floor(1e9 * ln(CAST(n AS DOUBLE))) AS BIGINT)) AS st
      FROM cnt GROUP BY 1)
SELECT doc_id, CAST(nc AS BIGINT) AS n_chars, CAST(nd AS BIGINT) AS n_distinct,
       ROUND(ln(CAST(nc AS DOUBLE)) - CAST(st AS DOUBLE) / (1e9 * nc), 6)
         AS entropy
FROM s"""


IDENT_TOP_N = 20


def q_identifier_tokens(sf_dir: str):
    """Top-20 identifier subtokens per language over the code corpus —
    snake_case split, vocabulary-sized combiner partials, one hashed
    (lang, token) shuffle."""
    from sbustreamspot_core_ray.sources.corpus import (
        generate_corpus,
        identifier_tokens,
        ingest_corpus,
    )

    root = "/tmp/graft_corpus_q"
    generate_corpus(root, n_files=2000, seed=23)
    return identifier_tokens(
        ingest_corpus(root, num_partitions=4), top_n=IDENT_TOP_N, num_parts=P
    )


def _identifier_tokens_sql() -> str:
    from sbustreamspot_core_ray.sources.corpus import generate_corpus

    generate_corpus("/tmp/graft_corpus_q", n_files=2000, seed=23)
    return f"""
WITH ids AS (
  SELECT lang,
         unnest(regexp_extract_all(content, '[A-Za-z_][A-Za-z0-9_]*')) AS ident
  FROM read_parquet('/tmp/graft_corpus_q/corpus/*.parquet')),
sub AS (SELECT lang, unnest(string_split(ident, '_')) AS tok FROM ids),
c AS (SELECT lang, tok, count(*) AS n FROM sub WHERE tok <> '' GROUP BY 1, 2)
SELECT lang, tok, CAST(n AS BIGINT) AS n FROM c
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok)
        <= {IDENT_TOP_N}"""


def q_square_count(sf_dir: str):
    """4-cycle census of the derived graph — wedge-pair triangular decode,
    packed-int64 pair combine, key-disjoint C(n,2) reduce. Wedge centers
    above CN_MAX_DEG are skipped (drop-accounted; the SQL oracle applies
    the identical cap), keeping the sum(deg^2) exchange bounded at scale;
    max_deg=None gives the uncapped exact census."""
    from sbustreamspot_core_ray.pipelines.superstep import square_count

    return square_count(
        _edges_full(sf_dir),
        num_partitions=32,
        wedge_fanout=64,
        max_deg=CN_MAX_DEG,
    )


def _square_count_sql() -> str:
    return f"""
WITH de AS MATERIALIZED ({_SQL_EDGES}),
und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM de
        WHERE src <> dst GROUP BY 1, 2),
sym AS (SELECT a AS c, b AS v FROM und UNION ALL SELECT b, a FROM und),
dg AS (SELECT c, count(*) AS n FROM sym GROUP BY c),
w AS (SELECT s1.v AS x, s2.v AS y FROM sym s1 JOIN sym s2
      ON s1.c = s2.c AND s1.v < s2.v
      JOIN dg ON dg.c = s1.c AND dg.n <= {CN_MAX_DEG}),
cn AS (SELECT x, y, count(*) AS n FROM w GROUP BY 1, 2)
SELECT CAST(COALESCE(sum(n * (n - 1) // 2), 0) // 2 AS BIGINT) AS squares,
       CAST(count(*) AS BIGINT) AS wedge_pairs
FROM cn"""


PERC_KEEPS = (100, 80, 40)


def q_percolation(sf_dir: str):
    """Bond-percolation robustness: connected-component fragmentation at
    100/80/40%% deterministic edge retention over the customer-order
    graph."""
    from sbustreamspot_core_ray.pipelines.superstep import percolation_sweep

    return percolation_sweep(
        _edges_custorder(sf_dir), keeps=PERC_KEEPS, num_parts=P
    )


def _percolation_sql() -> str:
    parts = [
        f"e0 AS ({_SQL_EDGES_CO})",
        "f AS (SELECT src, dst,"
        " (src * 2654435761 + dst * 40503) % 100 AS h FROM e0)",
    ]
    sels = []
    for K in PERC_KEEPS:
        parts.append(f"ek{K} AS (SELECT src, dst FROM f WHERE h < {K})")
        parts.append(
            f"e{K} AS (SELECT src AS s, dst AS d FROM ek{K}"
            f" UNION SELECT dst, src FROM ek{K})"
        )
        parts.append(
            f"v{K} AS (SELECT s AS vertex FROM e{K} UNION SELECT d FROM e{K})"
        )
        parts.append(
            f"r{K}(vx, lbl) AS (SELECT vertex, vertex FROM v{K}"
            f" UNION SELECT e.d, r.lbl FROM r{K} r JOIN e{K} e ON e.s = r.vx)"
        )
        parts.append(
            f"m{K} AS (SELECT vx, MIN(lbl) AS comp FROM r{K} GROUP BY vx)"
        )
        parts.append(
            f"s{K} AS (SELECT comp, count(*) AS n FROM m{K} GROUP BY comp)"
        )
        sels.append(
            f"SELECT CAST({K} AS BIGINT) AS keep_pct,"
            f" CAST((SELECT count(*) FROM m{K}) AS BIGINT) AS n_vertices,"
            f" CAST((SELECT count(*) FROM ek{K}) AS BIGINT) AS n_edges,"
            f" CAST(count(*) AS BIGINT) AS n_components,"
            f" CAST(max(n) AS BIGINT) AS giant_size FROM s{K}"
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(sels)
    )


def q_winnow(sf_dir: str):
    """MOSS winnowing fingerprints (k=8 byte-grams, window 4): the
    clone-detection index rows (doc_id, pos, fp) — zero shuffles,
    batch-local sliding-min selection."""
    from sbustreamspot_core_ray.stages.text import winnow_fingerprints

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return winnow_fingerprints(docs)


def _winnow_sql() -> str:
    from sbustreamspot_core_ray.stages.text import (
        WINNOW_K,
        WINNOW_W,
        _winnow_pows,
    )

    vals = ", ".join(f"({j}, {p})" for j, p in enumerate(_winnow_pows(WINNOW_K)))
    return f"""
WITH b AS (
  SELECT doc_id, g.i - 1 AS pos, ord(substring(text, g.i, 1)) AS byte,
         length(text) AS n
  FROM documents CROSS JOIN generate_series(1, 1024) g(i)
  WHERE g.i <= length(text)),
pw AS (SELECT * FROM (VALUES {vals}) t(j, pw)),
g AS (
  SELECT b.doc_id, b.pos AS p,
         CAST(sum(CAST(b2.byte AS HUGEINT) * pw.pw) % 2305843009213693951
              AS BIGINT) AS h
  FROM b JOIN pw ON TRUE
  JOIN b b2 ON b2.doc_id = b.doc_id AND b2.pos = b.pos + pw.j
  WHERE b.pos + {WINNOW_K} <= b.n
  GROUP BY 1, 2),
pk AS (SELECT doc_id, p, (h % 4503599627370496) * 1024 + p AS packed,
              count(*) OVER (PARTITION BY doc_id) AS ng FROM g),
wn AS (SELECT doc_id, p AS s, ng,
        min(packed) OVER (PARTITION BY doc_id ORDER BY p
          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS m
      FROM pk),
sel AS (SELECT DISTINCT doc_id, m FROM wn WHERE s <= ng - {WINNOW_W})
SELECT doc_id, CAST(m % 1024 AS BIGINT) AS pos, CAST(m // 1024 AS BIGINT) AS fp
FROM sel"""


PR_DRIFT_KEEP = 90
PR_DRIFT_TOPN = 50


def q_pagerank_drift(sf_dir: str):
    """Temporal PageRank drift: the top-50 vertices whose rank moved most
    between the 90%%-edge snapshot (deterministic hash thinning) and the
    full graph — the rank-churn report a link-graph refresh publishes.
    Two standard PR runs; the join and cut are driver-side over the two
    V-sized rank tables."""
    from sbustreamspot_core_ray.pipelines.superstep import ShardedGraph, pagerank

    def filt(t: pa.Table) -> pa.Table:
        s = pa.compute.cast(t["src"], pa.int64()).to_numpy(zero_copy_only=False)
        d = pa.compute.cast(t["dst"], pa.int64()).to_numpy(zero_copy_only=False)
        keep = (s * 2654435761 + d * 40503) % 100 < PR_DRIFT_KEEP
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    g_old = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False).map_batches(filt, batch_format="pyarrow"),
        num_parts=P,
        symmetric=False,
    )
    r_old = pagerank(g_old, damping=PR_DAMPING, max_iters=PR_ITERS, tol=0.0).to_pandas()
    g_new = ShardedGraph.build(
        _edges_full(sf_dir, dedup=False), num_parts=P, symmetric=False
    )
    r_new = pagerank(g_new, damping=PR_DAMPING, max_iters=PR_ITERS, tol=0.0).to_pandas()
    r_old["rank"] = round_half_away(r_old["rank"], 7)
    r_new["rank"] = round_half_away(r_new["rank"], 7)
    j = r_new.merge(r_old, on="vertex", suffixes=("_new", "_old"))
    delta = (j["rank_new"] - j["rank_old"]).to_numpy()
    order = np.lexsort((j["vertex"].to_numpy(), -np.abs(delta)))[:PR_DRIFT_TOPN]
    out = j.iloc[order]
    return pa.table(
        {
            "vertex": pa.array(out["vertex"].to_numpy(np.int64)),
            "rank_old": pa.array(out["rank_old"].to_numpy(np.float64)),
            "rank_new": pa.array(out["rank_new"].to_numpy(np.float64)),
            "delta": pa.array(delta[order]),
        }
    )


def _pagerank_drift_sql() -> str:
    old_edges = (
        f"SELECT src, dst FROM ({_SQL_EDGES}) "
        f"WHERE (src * 2654435761 + dst * 40503) % 100 < {PR_DRIFT_KEEP}"
    )
    ctes = _pagerank_ctes(_SQL_EDGES, "a") + _pagerank_ctes(old_edges, "b")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
j AS (SELECT a.vertex, ROUND(a.rank, 7) AS rank_new, ROUND(b.rank, 7) AS rank_old
      FROM ar{PR_ITERS} a JOIN br{PR_ITERS} b ON a.vertex = b.vertex)
SELECT vertex, rank_old, rank_new, rank_new - rank_old AS delta
FROM j
QUALIFY row_number() OVER (ORDER BY abs(rank_new - rank_old) DESC, vertex)
        <= {PR_DRIFT_TOPN}"""
    )


RATE_TRAIL = 7
RATE_TOPN = 20


def q_rate_spikes(sf_dir: str):
    """Top-20 daily rate spikes per event type vs the trailing-7-day sum,
    exact integer thousandths — the operational alarm view."""
    from sbustreamspot_core_ray.stages.events import rate_spikes

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    return rate_spikes(ev, trailing=RATE_TRAIL, top_n=RATE_TOPN, num_parts=P)


def _rate_spikes_sql() -> str:
    T = RATE_TRAIL
    return f"""
WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events),
b AS (SELECT event_type, min(day) AS lo, max(day) AS hi FROM e GROUP BY 1),
d AS (SELECT b.event_type, b.lo + g.i AS day
      FROM b CROSS JOIN generate_series(0, 255) g(i) WHERE b.lo + g.i <= b.hi),
c AS (SELECT event_type, day, count(*) AS n FROM e GROUP BY 1, 2),
z AS (SELECT d.event_type, d.day, COALESCE(c.n, 0) AS n
      FROM d LEFT JOIN c ON c.event_type = d.event_type AND c.day = d.day),
s AS (SELECT event_type, day, n,
        sum(n) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN {T} PRECEDING AND 1 PRECEDING) AS tsum,
        row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM z)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,
       CAST(1000 * {T} * n // tsum AS BIGINT) AS spike_e3
FROM s WHERE rn > {T} AND tsum > 0
QUALIFY row_number() OVER (ORDER BY spike_e3 DESC, event_type, day)
        <= {RATE_TOPN}"""


def q_prefix_dups(sf_dir: str):
    """Proper-prefix duplicates (truncated re-crawls / cut-off docs):
    complete sorted-adjacency detection via sampled range partitioning —
    one shuffle, driver stitches bucket edges."""
    from sbustreamspot_core_ray.stages.dedup import prefix_duplicates

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return prefix_duplicates(docs, num_parts=P)


def _prefix_dups_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT text FROM documents),
nx AS (SELECT text, lead(text) OVER (ORDER BY text) AS nxt FROM d),
flag AS (
  SELECT text FROM nx
  WHERE nxt IS NOT NULL AND length(nxt) > length(text)
    AND substring(nxt, 1, length(text)) = text)
SELECT s.doc_id, CAST(length(s.text) AS BIGINT) AS prefix_len
FROM documents s JOIN flag ON flag.text = s.text"""


def q_triad_census(sf_dir: str):
    """Directed triad census over the complete (closed-triangle) triads of
    the folded interaction graph: 030C/030T/120D/120U/120C/210/300 counts
    (networkx-convention semantics, pinned in tests). Broadcast wedge
    closure with edge-direction masks riding along; no shuffle at sf scale,
    one hash(v,w) shuffle above the broadcast cap."""
    from sbustreamspot_core_ray.pipelines.superstep import triad_census

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    )

    def mk(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pk % TRIAD_MOD, "dst": sk % TRIAD_MOD})

    return triad_census(
        li.map_batches(mk, batch_format="pyarrow"), num_partitions=4 * P
    )


# wider fold than RECIP_MOD: at m=997 the sf0.1 graph is near-complete
# (~82M triangles) and the census measures raw wedge volume, not the
# operator; 2999 keeps every one of the 7 classes populated at sf0.01
# while cutting sf0.1 triangles ~4x
TRIAD_MOD = 2999


# e1=(x,y,m1), e2=(x,z,m2), e3=(y,z,m3) for sorted triple x<y<z; masks are
# canonical-direction bitsets (1: low->high arc, 2: reverse, 3: mutual) —
# the CASE ladder mirrors _classify_triads bit for bit
_SQL_TRIAD_CENSUS = """
WITH e0 AS (
  SELECT DISTINCT l_partkey % {m} AS s, l_suppkey % {m} AS d
  FROM lineitem WHERE l_partkey % {m} <> l_suppkey % {m}),
p AS (
  SELECT LEAST(s, d) AS a, GREATEST(s, d) AS b,
         CAST(SUM(DISTINCT CASE WHEN s < d THEN 1 ELSE 2 END) AS INT) AS m
  FROM e0 GROUP BY 1, 2),
t AS (
  SELECT p1.a AS x, p1.b AS y, p2.b AS z, p1.m AS m1, p2.m AS m2, p3.m AS m3
  FROM p p1
  JOIN p p2 ON p2.a = p1.a AND p2.b > p1.b
  JOIN p p3 ON p3.a = p1.b AND p3.b = p2.b),
c AS (
  SELECT CAST(m1 = 3 AS INT) + CAST(m2 = 3 AS INT) + CAST(m3 = 3 AS INT) AS nm,
         CASE WHEN m1 = 1 THEN x ELSE y END AS s1,
         CASE WHEN m2 = 1 THEN x ELSE z END AS s2,
         CASE WHEN m3 = 1 THEN y ELSE z END AS s3,
         CASE WHEN m1 = 3 THEN z WHEN m2 = 3 THEN y ELSE x END AS zv,
         m1, m2, m3
  FROM t),
k AS (
  SELECT CASE
    WHEN nm = 3 THEN '300'
    WHEN nm = 2 THEN '210'
    WHEN nm = 1 THEN (
      CASE (CASE WHEN m1 <> 3 AND s1 = zv THEN 1 ELSE 0 END)
         + (CASE WHEN m2 <> 3 AND s2 = zv THEN 1 ELSE 0 END)
         + (CASE WHEN m3 <> 3 AND s3 = zv THEN 1 ELSE 0 END)
        WHEN 2 THEN '120D' WHEN 0 THEN '120U' ELSE '120C' END)
    WHEN s1 <> s2 AND s1 <> s3 AND s2 <> s3 THEN '030C'
    ELSE '030T' END AS triad
  FROM c)
SELECT triad, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY triad"""


def q_linear_attribution(sf_dir: str):
    """Multi-touch linear attribution: every purchase splits 1e6 integer
    micro-credits equally over the user's click/view touches in the 7
    days strictly before it (remainder to the earliest touches) — the
    complement of asof_attribution's last-touch model. One hash(user)
    shuffle, vectorized struct-searchsorted ranges per partition."""
    from sbustreamspot_core_ray.stages.events import linear_attribution

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return linear_attribution(ev, num_parts=P)


_SQL_LINEAR_ATTribution = """
WITH conv AS (
  SELECT event_id AS cid, user_id, ts FROM events
  WHERE event_type = 'purchase'),
tch AS (
  SELECT event_id AS tid, user_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT c.cid, t.event_type, t.ts, t.tid
  FROM conv c JOIN tch t ON t.user_id = c.user_id
   AND t.ts < c.ts AND t.ts >= c.ts - INTERVAL 7 DAY),
k AS (
  SELECT event_type,
         COUNT(*) OVER (PARTITION BY cid) AS k,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY ts, tid) - 1 AS pos
  FROM pairs)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(1000000 // k
                + CASE WHEN pos < 1000000 % k THEN 1 ELSE 0 END)
            AS BIGINT) AS credit_micro
FROM k GROUP BY event_type"""


def q_decay_attribution(sf_dir: str):
    """Time-decay multi-touch attribution: per-conversion integer credit
    split proportional to 2^(6 - age_days) over the 7-day prior window,
    remainder to the earliest touches — exact integers end-to-end."""
    from sbustreamspot_core_ray.stages.events import decay_attribution

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return decay_attribution(ev, num_parts=P)


_SQL_DECAY_ATTRIBUTION = """
WITH conv AS (
  SELECT event_id AS cid, user_id, ts FROM events
  WHERE event_type = 'purchase'),
tch AS (
  SELECT event_id AS tid, user_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT c.cid, t.event_type, t.ts, t.tid,
         CASE CAST((epoch_us(c.ts) - epoch_us(t.ts)) // 86400000000
                   AS BIGINT)
           WHEN 0 THEN 64 WHEN 1 THEN 32 WHEN 2 THEN 16
           WHEN 3 THEN 8 WHEN 4 THEN 4 WHEN 5 THEN 2 ELSE 1 END AS w
  FROM conv c JOIN tch t ON t.user_id = c.user_id
   AND t.ts < c.ts AND t.ts >= c.ts - INTERVAL 7 DAY),
k AS (
  SELECT event_type, w,
         SUM(w) OVER (PARTITION BY cid) AS sw,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY ts, tid) - 1 AS pos,
         cid
  FROM pairs),
b AS (
  SELECT event_type, cid, pos, 1000000 * w // sw AS base,
         SUM(1000000 * w // sw) OVER (PARTITION BY cid) AS sbase
  FROM k)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(base + CASE WHEN pos < 1000000 - sbase THEN 1 ELSE 0 END)
            AS BIGINT) AS credit_micro
FROM b GROUP BY event_type ORDER BY event_type"""


def q_benford(sf_dir: str):
    """Benford first-digit audit of event values (fraud/data-quality
    screen): counts per leading digit of the positive integer cents, with
    integer ppm shares — vectorized string-head digit extraction, one
    tiny digit-key groupby."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def tag(t: pa.Table) -> pa.Table:
        import pandas as pd

        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        cents = cents[cents > 0]
        digit = (
            pd.Series(cents).astype(str).str[0].astype(np.int64).to_numpy()
        )
        cnt = np.bincount(digit, minlength=10)[1:]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n_partial": pa.array(cnt.astype(np.int64)),
            }
        )

    out = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("digit")
        .sum("n_partial")
        .to_pandas()
        .rename(columns={"sum(n_partial)": "n"})
        .sort_values("digit")
        .reset_index(drop=True)
    )
    total = int(out["n"].sum())
    out["ppm"] = out["n"].to_numpy(np.int64) * 1_000_000 // total
    return out


_SQL_BENFORD = """
WITH c AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events
),
d AS (
  SELECT CAST(left(CAST(cents AS VARCHAR), 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
),
g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS total FROM g)
SELECT digit, n, CAST(n * 1000000 // t.total AS BIGINT) AS ppm
FROM g, t ORDER BY digit
"""


KMV_K = 256


def q_kmv_overlap(sf_dir: str):
    """Bottom-k (KMV) sketch intersection: distinct users doing BOTH
    click and purchase, estimated from two mergeable k=256 sketches with
    the exact count as witness. One hash(user) shuffle; P bounded
    partials; integer sketch state, HUGEINT-mirrored hash."""
    from sbustreamspot_core_ray.stages.events import kmv_overlap

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return kmv_overlap(ev, k=KMV_K, num_parts=P)


def _kmv_overlap_sql() -> str:
    from sbustreamspot_core_ray.stages.events import HLL_MIX

    return f"""
WITH p AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE event_type IN ('click', 'purchase')),
h AS (
  SELECT event_type,
         CAST((CAST(user_id AS HUGEINT) * {HLL_MIX})
              % 18446744073709551616 AS HUGEINT) AS h
  FROM p),
sa AS (SELECT h FROM h WHERE event_type = 'click' ORDER BY h LIMIT {KMV_K}),
sb AS (SELECT h FROM h WHERE event_type = 'purchase' ORDER BY h LIMIT {KMV_K}),
un AS (
  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
  ORDER BY h LIMIT {KMV_K}),
stats AS (SELECT MAX(h) AS tau, CAST(COUNT(*) AS BIGINT) AS k_used FROM un),
rho AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rho FROM un
  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
bothc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_both FROM (
    SELECT user_id FROM p GROUP BY user_id
    HAVING COUNT(DISTINCT event_type) = 2))
SELECT s.k_used, r.rho, b.exact_both,
       CAST(r.rho AS DOUBLE) / CAST(s.k_used AS DOUBLE) AS jaccard_est,
       (CAST(r.rho AS DOUBLE) / CAST(s.k_used AS DOUBLE))
         * (CAST(s.k_used - 1 AS DOUBLE) * 18446744073709551616.0
            / CAST(s.tau AS DOUBLE)) AS inter_est
FROM stats s, rho r, bothc b"""


def q_dup_spans(sf_dir: str):
    """Cross-document duplicated-span coverage (exact substring-dedup
    signal): per doc, the token positions covered by a word-5-gram that
    also occurs in another document. One gram-key shuffle + one doc-key
    fold."""
    from sbustreamspot_core_ray.stages.curation import dup_span_coverage

    return dup_span_coverage(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        num_parts=P,
    )


def _dup_spans_sql() -> str:
    from sbustreamspot_core_ray.stages.curation import DECON_N as N

    return rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS words
  FROM documents WHERE trim(text) <> ''),
g AS (
  SELECT doc_id, i, array_to_string(words[i:i+{N - 1}], ' ') AS gram
  FROM w, UNNEST(range(1, len(words) - {N - 2})) AS t(i)
  WHERE len(words) >= {N}),
dupg AS (
  SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
  GROUP BY gram HAVING COUNT(*) >= 2),
d AS (SELECT doc_id, i FROM g WHERE gram IN (SELECT gram FROM dupg)),
dd AS (
  SELECT doc_id, i,
         lead(i) OVER (PARTITION BY doc_id ORDER BY i) AS nx
  FROM d),
cov AS (
  SELECT doc_id,
         CAST(SUM(LEAST(COALESCE(nx - i, {N}), {N})) AS BIGINT) AS covered
  FROM dd GROUP BY doc_id),
tok AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END
           AS n_tokens
  FROM documents)
SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens,
       COALESCE(c.covered, 0) AS covered_tokens,
       ROUND(CASE WHEN t.n_tokens > 0
                  THEN CAST(COALESCE(c.covered, 0) AS DOUBLE) / t.n_tokens
                  ELSE 0.0 END, 6) AS dup_frac
FROM tok t LEFT JOIN cov c USING (doc_id)"""


KMEANS_K = 8
KMEANS_ITERS = 3


def q_kmeans(sf_dir: str):
    """Lloyd's k-means (k=8, 3 update rounds) over integer-quantized
    embeddings — seed = lowest vec_ids, floor-division centroid updates,
    lowest-c tie-breaks, empty clusters carry over; exact integers end to
    end. Broadcast centroids + combiner partials; no shuffle."""
    from sbustreamspot_core_ray.stages.ann import kmeans_lloyd

    return kmeans_lloyd(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        num_parts=P,
    )


def _kmeans_sql() -> str:
    """Unrolled Lloyd iterations: every distance / floor-divide update /
    tie-break mirrors stages/ann.kmeans_lloyd on integer-valued DOUBLEs
    (products <= 2^34 — exact, so SUM order cannot round)."""
    K, T = KMEANS_K, KMEANS_ITERS
    ctes = [
        f"e AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings)",
        "ed AS (SELECT vec_id, d, q[d] AS val FROM e,"
        " UNNEST(range(1, len(q) + 1)) AS t(d))",
        f"c0 AS (SELECT vec_id AS c, d, val FROM ed WHERE vec_id < {K})",
    ]
    for i in range(1, T + 1):
        ctes.append(
            f"dist{i} AS (SELECT ed.vec_id, c.c,"
            " SUM((ed.val - c.val) * (ed.val - c.val)) AS dist"
            f" FROM ed JOIN c{i - 1} c USING (d) GROUP BY ed.vec_id, c.c)"
        )
        ctes.append(
            f"asg{i} AS (SELECT vec_id, c FROM dist{i} QUALIFY"
            " row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) = 1)"
        )
        ctes.append(
            f"upd{i} AS (SELECT a.c, ed.d,"
            " floor(SUM(ed.val) / COUNT(DISTINCT ed.vec_id)) AS val"
            f" FROM asg{i} a JOIN ed ON ed.vec_id = a.vec_id"
            " GROUP BY a.c, ed.d)"
        )
        ctes.append(
            f"c{i} AS (SELECT p.c, p.d, COALESCE(u.val, p.val) AS val"
            f" FROM c{i - 1} p LEFT JOIN upd{i} u"
            " ON u.c = p.c AND u.d = p.d)"
        )
    ctes.append(
        "distf AS (SELECT ed.vec_id, c.c,"
        " SUM((ed.val - c.val) * (ed.val - c.val)) AS dist"
        f" FROM ed JOIN c{T} c USING (d) GROUP BY ed.vec_id, c.c)"
    )
    ctes.append(
        "asgf AS (SELECT vec_id, c, dist FROM distf QUALIFY"
        " row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) = 1)"
    )
    ctes.append(
        f"csum AS (SELECT c, CAST(SUM(val) AS BIGINT) AS cent_sum"
        f" FROM c{T} GROUP BY c)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT a.c AS cluster, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(a.dist) AS BIGINT) AS inertia, MAX(cs.cent_sum) AS cent_sum"
        " FROM asgf a JOIN csum cs ON cs.c = a.c GROUP BY a.c"
    )


def q_cosine_join(sf_dir: str):
    """COMPLETE exact cosine-threshold self-join (no hashing, no recall
    loss) at the near-dup threshold — the exact baseline for the
    sign-bucket and LSH paths. Block-replicated all-pairs shuffle, exact
    integer tile matmuls."""
    from sbustreamspot_core_ray.stages.ann import cosine_threshold_join

    return cosine_threshold_join(
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        threshold=NEARDUP_THRESH,
        num_parts=P,
    )


def _cosine_join_sql() -> str:
    return f"""
WITH qe AS (SELECT vec_id, {_Q_EMB} AS q FROM embeddings)
SELECT a.vec_id AS src, b.vec_id AS dst,
       ROUND({_q_cos('a.q', 'b.q')}, 6) AS cosine
FROM qe a JOIN qe b ON b.vec_id > a.vec_id
WHERE {_q_cos('a.q', 'b.q')} >= {NEARDUP_THRESH}"""


def q_psi_drift(sf_dir: str):
    """Population Stability Index per event type: cent-binned value
    histograms of the reference half (ts < Jan 16) vs the current half,
    Laplace-smoothed, per-bin terms floored to int64 nanonats so the
    total is an order-independent integer sum. Pure combiner — no
    row-scale shuffle."""
    from sbustreamspot_core_ray.stages.events import psi_drift

    return psi_drift(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ),
        num_parts=P,
    )


def _psi_drift_sql() -> str:
    from sbustreamspot_core_ray.stages.events import (
        PSI_NBINS,
        PSI_SPLIT_US,
        PSI_STEP_CENTS,
    )

    return f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) >= {PSI_SPLIT_US} THEN 1 ELSE 0 END AS half,
         LEAST(GREATEST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                        // {PSI_STEP_CENTS}, 0), {PSI_NBINS - 1}) AS bin
  FROM events),
c AS (SELECT event_type, half, bin, CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2, 3),
grid AS (
  SELECT t.event_type, h.half, b.bin
  FROM (SELECT DISTINCT event_type FROM e) t,
       (SELECT UNNEST(range(0, 2)) AS half) h,
       (SELECT UNNEST(range(0, {PSI_NBINS})) AS bin) b),
f AS (
  SELECT g.event_type, g.half, g.bin, COALESCE(c.n, 0) + 1 AS sn,
         COALESCE(c.n, 0) AS rawn
  FROM grid g LEFT JOIN c
    ON c.event_type = g.event_type AND c.half = g.half AND c.bin = g.bin),
tot AS (
  SELECT event_type,
         SUM(sn) FILTER (half = 0) AS SQ,
         SUM(sn) FILTER (half = 1) AS SP,
         SUM(rawn) FILTER (half = 0) AS n_ref,
         SUM(rawn) FILTER (half = 1) AS n_cur
  FROM f GROUP BY event_type),
wide AS (
  SELECT f.event_type, f.bin,
         MAX(CASE WHEN f.half = 0 THEN f.sn END) AS sq,
         MAX(CASE WHEN f.half = 1 THEN f.sn END) AS sp
  FROM f GROUP BY f.event_type, f.bin),
terms AS (
  SELECT w.event_type,
         FLOOR(((CAST(w.sp AS DOUBLE) * t.SQ - CAST(w.sq AS DOUBLE) * t.SP)
                / (CAST(t.SP AS DOUBLE) * CAST(t.SQ AS DOUBLE)))
               * ln((CAST(w.sp AS DOUBLE) * t.SQ)
                    / (CAST(w.sq AS DOUBLE) * t.SP)) * 1e9) AS term
  FROM wide w JOIN tot t USING (event_type))
SELECT t.event_type, CAST(t.n_ref AS BIGINT) AS n_ref,
       CAST(t.n_cur AS BIGINT) AS n_cur,
       CAST(SUM(terms.term) AS BIGINT) AS psi_e9
FROM terms JOIN tot t USING (event_type)
GROUP BY t.event_type, t.n_ref, t.n_cur"""


def q_rfm_cells(sf_dir: str):
    """RFM segmentation census: per-customer recency/frequency/monetary,
    each exact-ntile(5)-ranked over the deterministic (metric, custkey)
    order via the sample-sort ranking primitive; (r, f, m) cell counts."""
    from sbustreamspot_core_ray.stages.relational import rfm_cells

    return rfm_cells(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        ),
        n_tiles=5,
        num_parts=P,
    )


_SQL_RFM = """
WITH m AS (
  SELECT o_custkey AS cust,
         MAX(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS total
  FROM orders GROUP BY o_custkey),
n AS (SELECT COUNT(*) AS n FROM m),
r AS (SELECT cust, ((ROW_NUMBER() OVER (ORDER BY last_day, cust) - 1) * 5)
                   // n.n AS r_tile FROM m, n),
f AS (SELECT cust, ((ROW_NUMBER() OVER (ORDER BY n_orders, cust) - 1) * 5)
                   // n.n AS f_tile FROM m, n),
mo AS (SELECT cust, ((ROW_NUMBER() OVER (ORDER BY total, cust) - 1) * 5)
                    // n.n AS m_tile FROM m, n)
SELECT CAST(r.r_tile AS BIGINT) AS r_tile,
       CAST(f.f_tile AS BIGINT) AS f_tile,
       CAST(mo.m_tile AS BIGINT) AS m_tile,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r JOIN f USING (cust) JOIN mo USING (cust)
GROUP BY 1, 2, 3"""


def q_dedup_stack(sf_dir: str):
    """Flagship dedup-stack attrition manifest: exact sha256 -> minhash
    near-dup components -> proper-prefix removal, each doc attributed to
    the first stage that removes it; (stage, n) decomposition."""
    from sbustreamspot_core_ray.stages.curation import dedup_stack

    return dedup_stack(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        threshold=0.8,
        num_parts=P,
        minhash_parts=4,
    )


def _dedup_stack_sql() -> str:
    mh = _minhash_dedup_sql()
    px = _dup_stack_prefix_sql()
    return f"""
WITH ex AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM documents),
mg AS (SELECT * FROM ({mh}) t),
pxs AS (SELECT DISTINCT doc_id FROM ({px}) t),
f AS (
  SELECT d.doc_id,
         (ex.rn > 1) AS f_ex,
         (mg.dup_group <> d.doc_id) AS f_nd,
         (pxs.doc_id IS NOT NULL) AS f_px
  FROM documents d
  JOIN ex ON ex.doc_id = d.doc_id
  JOIN mg ON mg.doc_id = d.doc_id
  LEFT JOIN pxs ON pxs.doc_id = d.doc_id),
c AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(SUM(CASE WHEN f_ex THEN 1 ELSE 0 END) AS BIGINT) AS rex,
         CAST(SUM(CASE WHEN NOT f_ex AND f_nd THEN 1 ELSE 0 END)
              AS BIGINT) AS rnd,
         CAST(SUM(CASE WHEN NOT f_ex AND NOT f_nd AND f_px THEN 1 ELSE 0 END)
              AS BIGINT) AS rpx
  FROM f)
SELECT 'input' AS stage, n_in AS n FROM c
UNION ALL SELECT 'removed_exact', rex FROM c
UNION ALL SELECT 'removed_near_dup', rnd FROM c
UNION ALL SELECT 'removed_prefix', rpx FROM c
UNION ALL SELECT 'kept', n_in - rex - rnd - rpx FROM c"""


def _dup_stack_prefix_sql() -> str:
    return _prefix_dups_sql()


PHASH_MAX_HAMMING = 7


def q_phash_near_dup(sf_dir: str):
    """Perceptual near-duplicate image pairs: COMPLETE pigeonhole-banded
    hamming join over the 64-bit blockhash (bands=8 > radius=7 — every
    pair within the radius is found). Rides the generic
    banded_hamming_pairs machinery."""
    from sbustreamspot_core_ray.stages.multimodal import (
        media_from_documents,
        phash_near_dup,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return phash_near_dup(
        media_from_documents(docs),
        max_hamming=PHASH_MAX_HAMMING,
        bands=8,
        num_parts=P,
    )


_SQL_PHASH_NEAR_DUP = """
WITH RECURSIVE pw(i, p) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i + 1, p * 2 FROM pw WHERE i < 63
),
img AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 0),
b AS (
  SELECT media_id, g.j // 64 AS blk,
         ascii(substring(text, CAST((g.j % length(text)) + 1 AS INT), 1))
           AS byte
  FROM img, generate_series(0, 4095) g(j)
  WHERE length(text) > 0
),
bs AS (SELECT media_id, blk, SUM(byte) AS s FROM b GROUP BY 1, 2),
tot AS (SELECT media_id, SUM(s) AS t FROM bs GROUP BY 1),
h AS (
  SELECT bs.media_id,
         SUM(CASE WHEN bs.s * 64 > tot.t THEN pw.p ELSE CAST(0 AS HUGEINT)
             END) AS hraw
  FROM bs JOIN tot USING (media_id) JOIN pw ON pw.i = bs.blk
  GROUP BY bs.media_id
),
ph AS (
  SELECT img.media_id,
         COALESCE(h.hraw, CAST(0 AS HUGEINT)) AS hraw,
         COALESCE(CAST(CASE
           WHEN h.hraw >= CAST(9223372036854775808 AS HUGEINT)
           THEN h.hraw - CAST(18446744073709551616 AS HUGEINT)
           ELSE h.hraw END AS BIGINT), 0) AS phash
  FROM img LEFT JOIN h USING (media_id)
),
bp(k, p) AS (VALUES (0,1::HUGEINT),(1,256::HUGEINT),(2,65536::HUGEINT),(3,16777216::HUGEINT),(4,4294967296::HUGEINT),(5,1099511627776::HUGEINT),(6,281474976710656::HUGEINT),(7,72057594037927936::HUGEINT)),
bnd AS (
  SELECT media_id, phash, bp.k AS band,
         CAST((hraw // bp.p) % 256 AS BIGINT) AS bv
  FROM ph, bp
),
cand AS (
  SELECT DISTINCT a.media_id AS src, b2.media_id AS dst,
         a.phash AS pha, b2.phash AS phb
  FROM bnd a
  JOIN bnd b2 ON b2.band = a.band AND b2.bv = a.bv
             AND a.media_id < b2.media_id
)
SELECT src, dst, bit_count(xor(pha, phb)) AS hamming
FROM cand WHERE bit_count(xor(pha, phb)) <= 7"""


COOC_WINDOW_US = 3_600_000_000  # 1 h


def q_cooccurrence_links(sf_dir: str):
    """Shared-key identity-linking candidates: unordered user pairs with
    events on the same props key within 1 h; exact via (key, bucket)+halo
    partitioning, one shuffle, windowed searchsorted pair expansion."""
    from sbustreamspot_core_ray.stages.events import cooccurrence_links

    return cooccurrence_links(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "props"],
        ),
        window_us=COOC_WINDOW_US,
        num_parts=P,
    )


_SQL_COOC = f"""
WITH e AS (
  SELECT user_id, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS kk,
         epoch_us(ts) AS t, event_id
  FROM events),
p AS (
  SELECT LEAST(a.user_id, b.user_id) AS ua,
         GREATEST(a.user_id, b.user_id) AS ub,
         a.kk
  FROM e a JOIN e b ON b.kk = a.kk
   AND a.event_id < b.event_id
   AND abs(b.t - a.t) <= {COOC_WINDOW_US}
   AND a.user_id <> b.user_id)
SELECT ua AS user_a, ub AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_meetings,
       CAST(COUNT(DISTINCT kk) AS BIGINT) AS n_keys
FROM p GROUP BY 1, 2"""


def q_markov_eval(sf_dir: str):
    """Train/eval Markov next-event predictor: transitions before Jan 16
    train the per-type argmax model (lexicographic ties), later
    transitions score it; integer hits, one mirrored ROUND(6) divide."""
    from sbustreamspot_core_ray.stages.events import markov_eval

    return markov_eval(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        ),
        num_parts=P,
    )


def _markov_eval_sql() -> str:
    from sbustreamspot_core_ray.stages.events import PSI_SPLIT_US

    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
s AS (
  SELECT event_type AS ft, t,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS tt
  FROM e),
tr AS (
  SELECT ft, tt, (t >= {PSI_SPLIT_US}) AS iseval
  FROM s WHERE tt IS NOT NULL),
trn AS (SELECT ft, tt, COUNT(*) AS n FROM tr WHERE NOT iseval GROUP BY 1, 2),
model AS (
  SELECT ft, tt AS predicted FROM trn
  QUALIFY row_number() OVER (PARTITION BY ft ORDER BY n DESC, tt) = 1),
ev AS (SELECT ft, tt FROM tr WHERE iseval)
SELECT m.ft AS from_type, m.predicted,
       CAST(COUNT(*) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN ev.tt = m.predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       ROUND(CAST(SUM(CASE WHEN ev.tt = m.predicted THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM ev JOIN model m ON m.ft = ev.ft
GROUP BY m.ft, m.predicted"""


ATTACK_REMOVES = (0, 1, 5, 10)


def q_attack_percolation(sf_dir: str):
    """Targeted-attack robustness: delete the top R%% of vertices by
    (degree desc, id) from the folded interaction graph and recompute
    connected components per level — the hub-attack complement of the
    random bond-percolation sweep."""
    from sbustreamspot_core_ray.pipelines.superstep import attack_sweep

    return attack_sweep(
        _edges_directed(sf_dir), removes=ATTACK_REMOVES, num_parts=P
    )


def _attack_sql() -> str:
    parts = [
        f"e0 AS (SELECT DISTINCT l_partkey % {RECIP_MOD} AS src,"
        f" l_suppkey % {RECIP_MOD} AS dst FROM lineitem)",
        "p AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b"
        " FROM e0 WHERE src <> dst)",
        "vv AS (SELECT a AS vertex FROM p UNION ALL SELECT b FROM p)",
        "dg AS (SELECT vertex, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM vv GROUP BY vertex)",
        "nv AS (SELECT COUNT(*) AS n FROM dg)",
    ]
    sels = []
    for R in ATTACK_REMOVES:
        parts.append(
            f"rm{R} AS (SELECT vertex FROM dg, nv QUALIFY"
            f" row_number() OVER (ORDER BY deg DESC, vertex)"
            f" <= (nv.n * {R}) // 100)"
        )
        parts.append(
            f"pk{R} AS (SELECT a, b FROM p"
            f" WHERE a NOT IN (SELECT vertex FROM rm{R})"
            f" AND b NOT IN (SELECT vertex FROM rm{R}))"
        )
        parts.append(
            f"ee{R} AS (SELECT a AS s, b AS d FROM pk{R}"
            f" UNION SELECT b, a FROM pk{R})"
        )
        parts.append(
            f"v{R} AS (SELECT s AS vertex FROM ee{R} UNION SELECT d FROM ee{R})"
        )
        parts.append(
            f"r{R}(vx, lbl) AS (SELECT vertex, vertex FROM v{R}"
            f" UNION SELECT e.d, r.lbl FROM r{R} r JOIN ee{R} e ON e.s = r.vx)"
        )
        parts.append(
            f"m{R} AS (SELECT vx, MIN(lbl) AS comp FROM r{R} GROUP BY vx)"
        )
        parts.append(
            f"s{R} AS (SELECT comp, count(*) AS n FROM m{R} GROUP BY comp)"
        )
        sels.append(
            f"SELECT CAST({R} AS BIGINT) AS remove_pct,"
            f" CAST((SELECT count(*) FROM rm{R}) AS BIGINT) AS n_removed,"
            f" CAST((SELECT count(*) FROM m{R}) AS BIGINT) AS n_vertices,"
            f" CAST((SELECT count(*) FROM pk{R}) AS BIGINT) AS n_edges,"
            f" CAST(count(*) AS BIGINT) AS n_components,"
            f" CAST(COALESCE(max(n), 0) AS BIGINT) AS giant_size FROM s{R}"
        )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(sels)
    )


ITEM_COS_MIN, ITEM_COS_TOPN = 2, 100


def q_item_cosine(sf_dir: str):
    """Item-item cosine from co-purchase baskets: top-100 part pairs by
    n_ab / (sqrt(n_a) * sqrt(n_b)) — the recsys normalization of the raw
    market-basket counts. Two cheap-key shuffles + degree combiner."""
    from sbustreamspot_core_ray.stages.relational import item_cosine

    return item_cosine(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ),
        min_count=ITEM_COS_MIN,
        topn=ITEM_COS_TOPN,
        num_parts=P,
    )


_SQL_ITEM_COSINE = f"""
WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM bp GROUP BY p),
pr AS (
  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS nab
  FROM bp a JOIN bp b ON b.o = a.o AND b.p > a.p
  GROUP BY 1, 2 HAVING COUNT(*) >= {ITEM_COS_MIN}),
c AS (
  SELECT pr.pa, pr.pb, pr.nab,
         CAST(pr.nab AS DOUBLE)
           / (sqrt(CAST(ia.n AS DOUBLE)) * sqrt(CAST(ib.n AS DOUBLE))) AS raw
  FROM pr JOIN ic ia ON ia.p = pr.pa JOIN ic ib ON ib.p = pr.pb)
SELECT pa AS part_a, pb AS part_b, nab AS n_pairs, ROUND(raw, 6) AS cosine
FROM c
QUALIFY row_number() OVER (ORDER BY raw DESC, pa, pb) <= {ITEM_COS_TOPN}"""


def q_seasonal_deviation(sf_dir: str):
    """Weekly-seasonality deviation alarms: reference-half day-of-week
    profiles score current-half days by integer cross-multiplied
    relative deviation (exact thousandths, no floats). Pure combiner."""
    from sbustreamspot_core_ray.stages.events import seasonal_deviation

    return seasonal_deviation(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ),
        num_parts=P,
    )


def _seasonal_sql() -> str:
    from sbustreamspot_core_ray.stages.events import (
        PSI_SPLIT_US,
        SEASONAL_TOPN,
    )

    return f"""
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CASE WHEN epoch_us(ts) >= {PSI_SPLIT_US} THEN 1 ELSE 0 END AS half
  FROM events),
c AS (SELECT event_type, half, day, CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2, 3),
rd AS (SELECT event_type, day % 7 AS dow, SUM(n) AS r
       FROM c WHERE half = 0 GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(n) AS R FROM c WHERE half = 0 GROUP BY 1),
ct AS (SELECT event_type, SUM(n) AS C FROM c WHERE half = 1 GROUP BY 1),
cur AS (SELECT event_type, day, n FROM c WHERE half = 1),
d AS (
  SELECT cur.event_type, cur.day, cur.n,
         (abs(cur.n * rt.R - ct.C * rd.r) * 1000) // (ct.C * rd.r) AS dev_e3
  FROM cur
  JOIN rt USING (event_type)
  JOIN ct USING (event_type)
  JOIN rd ON rd.event_type = cur.event_type AND rd.dow = cur.day % 7
  WHERE rd.r > 0 AND ct.C > 0)
SELECT event_type, CAST(day AS BIGINT) AS day, n,
       CAST(dev_e3 AS BIGINT) AS dev_e3
FROM d
QUALIFY row_number() OVER (ORDER BY dev_e3 DESC, event_type, day)
        <= {SEASONAL_TOPN}"""


COND_TOPN = 10


def q_conductance(sf_dir: str):
    """Per-community conductance (cut/vol) of LPA labels on the
    order-part-supplier co-occurrence graph — the cut-quality audit alongside the modularity
    witness. Top-10 communities by size; exact integer cut/vol with one
    mirrored divide."""
    from sbustreamspot_core_ray.pipelines.superstep import (
        ShardedGraph,
        community_conductance,
        label_propagation,
    )

    edges = _edges_triangle(sf_dir).materialize()
    g = ShardedGraph.build(edges, num_parts=P, symmetric=True)
    labels = label_propagation(g, iters=LP_ITERS)
    return community_conductance(edges, labels, topn=COND_TOPN, num_parts=P)


def _conductance_sql() -> str:
    ctes = _lp_ctes(_SQL_EDGES_TRI) + [
        f"lab AS (SELECT vertex, label FROM l{LP_ITERS})",
        "und AS (SELECT s AS a, d AS b FROM e WHERE s < d)",
        "dg AS (SELECT s AS vertex, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM e WHERE s <> d GROUP BY s)",
        "vols AS (SELECT lab.label, SUM(dg.deg) AS vol,"
        " CAST(COUNT(*) AS BIGINT) AS n_vertices"
        " FROM dg JOIN lab USING (vertex) GROUP BY lab.label)",
        "cutrows AS ("
        " SELECT la.label FROM und"
        "  JOIN lab la ON la.vertex = und.a"
        "  JOIN lab lb ON lb.vertex = und.b WHERE la.label <> lb.label"
        " UNION ALL"
        " SELECT lb.label FROM und"
        "  JOIN lab la ON la.vertex = und.a"
        "  JOIN lab lb ON lb.vertex = und.b WHERE la.label <> lb.label)",
        "cuts AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS cut"
        " FROM cutrows GROUP BY label)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT v.label, v.n_vertices, CAST(v.vol AS BIGINT) AS vol,
       COALESCE(c.cut, 0) AS cut,
       ROUND(CAST(COALESCE(c.cut, 0) AS DOUBLE) / v.vol, 6) AS conductance
FROM vols v LEFT JOIN cuts c USING (label)
WHERE v.vol > 0
QUALIFY row_number() OVER (ORDER BY v.n_vertices DESC, v.label)
        <= {COND_TOPN}"""
    )


def q_gap_slo(sf_dir: str):
    """Exact p50/p95/p99 inter-arrival gaps per event type — discrete
    lower percentile selected at rank ((n-1)*q)//100 via the sample-sort
    ranking primitive (microsecond gaps can't cent-histogram)."""
    from sbustreamspot_core_ray.stages.events import gap_slo

    return gap_slo(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type"],
        ),
        num_parts=P,
    )


def _gap_slo_sql() -> str:
    from sbustreamspot_core_ray.stages.events import GAP_SLO_PCTS

    vals = ",".join(f"({q})" for q in GAP_SLO_PCTS)
    return f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t, event_id FROM events),
g AS (
  SELECT event_type,
         t - lag(t) OVER (PARTITION BY event_type
                          ORDER BY t, event_id) AS gap
  FROM e),
g2 AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
r AS (
  SELECT event_type, gap,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g2)
SELECT event_type, CAST(q.q AS BIGINT) AS pct, CAST(gap AS BIGINT) AS gap_us
FROM r JOIN (VALUES {vals}) q(q) ON r.rk = ((r.n - 1) * q.q) // 100
ORDER BY event_type, pct"""


def q_dup_auc(sf_dir: str):
    """Exact tie-corrected AUC of n_chars as a prefix-duplicate
    predictor: Mann-Whitney over the (length, label) histogram grid —
    integers until one mirrored divide."""
    from sbustreamspot_core_ray.stages.dedup import dup_auc

    return dup_auc(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "n_chars"],
        ),
        num_parts=P,
    )


_SQL_DUP_AUC = f"""
WITH l AS (
  SELECT n_chars AS score,
         CASE WHEN doc_id IN (SELECT doc_id FROM ({_prefix_dups_sql()}) t)
              THEN 1 ELSE 0 END AS pos
  FROM documents),
g AS (
  SELECT score,
         CAST(SUM(pos) AS BIGINT) AS np_,
         CAST(SUM(1 - pos) AS BIGINT) AS nn_
  FROM l GROUP BY score),
w AS (
  SELECT score, np_, nn_,
         2 * (COALESCE(SUM(np_ + nn_) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
           + (np_ + nn_) + 1 AS two_mid
  FROM g),
t AS (
  SELECT SUM(np_) AS n_pos, SUM(nn_) AS n_neg,
         SUM(np_ * two_mid) AS two_rs
  FROM w)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(two_rs - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       ROUND(CAST(two_rs - n_pos * (n_pos + 1) AS DOUBLE)
             / (2 * n_pos * n_neg), 6) AS auc
FROM t"""


def q_incremental_near_dup(sf_dir: str):
    """Streaming-corpus near-dup maintenance: verified pairs touching the
    newest 10% of doc ids only (new-new and old-new), old-old pairs never
    enumerated — each ingestion round pays its delta's bucket fan-out."""
    from sbustreamspot_core_ray.stages.dedup import incremental_near_dup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()
    delta = int(docs.max("doc_id")) * 9 // 10
    out = incremental_near_dup(
        docs, delta_min_id=delta, threshold=0.8, num_parts=P
    ).to_pandas()
    out["jaccard"] = round_half_away(out["jaccard"], 6)
    return out


def _incremental_near_dup_sql(threshold: float = 0.8) -> str:
    return f"""
WITH {_doc_shingle_ctes()},
{_minhash_band_ctes()},
delta AS (SELECT (MAX(doc_id) * 9) // 10 AS d0 FROM documents),
cand AS (
  SELECT DISTINCT a.doc_id AS src, b2.doc_id AS dst
  FROM bandv a
  JOIN bandv b2 ON b2.band_idx = a.band_idx
               AND b2.band_value = a.band_value
               AND a.doc_id < b2.doc_id
  WHERE a.doc_id >= (SELECT d0 FROM delta)
     OR b2.doc_id >= (SELECT d0 FROM delta)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
inter AS (
  SELECT c.src, c.dst, count(*) AS ninter
  FROM cand c
  JOIN dsh a ON a.doc_id = c.src
  JOIN dsh b2 ON b2.doc_id = c.dst AND b2.sh = a.sh
  GROUP BY c.src, c.dst
),
jac AS (
  SELECT c.src, c.dst,
         CAST(COALESCE(i.ninter, 0) AS DOUBLE)
           / (sa.n + sb.n - COALESCE(i.ninter, 0)) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.src = c.src AND i.dst = c.dst
  JOIN sizes sa ON sa.doc_id = c.src
  JOIN sizes sb ON sb.doc_id = c.dst
)
SELECT src, dst, ROUND(jaccard, 6) AS jaccard FROM jac
WHERE jaccard >= {threshold}"""


def q_order_360(sf_dir: str):
    """Denormalized order-360 wide table: per order the customer key,
    nation/region names, exact integer revenue, item count, latest ship
    day — lineitem combiner + two co-partitioned joins + broadcast dims."""
    from sbustreamspot_core_ray.stages.relational import order_wide_table

    nr = _nation_region_dim(sf_dir)
    return order_wide_table(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        nr,
        num_parts=P,
    )


_SQL_ORDER_360 = """
WITH lo AS (
  SELECT l_orderkey AS o_orderkey,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS revenue_units,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         MAX(datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)))
           AS last_ship_day
  FROM lineitem GROUP BY l_orderkey)
SELECT o.o_orderkey, o.o_custkey, n.n_name AS nation, r.r_name AS region,
       CAST(lo.revenue_units AS BIGINT) AS revenue_units, lo.n_items,
       CAST(lo.last_ship_day AS BIGINT) AS last_ship_day
FROM orders o
JOIN lo USING (o_orderkey)
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey"""


def q_abc_classes(sf_dir: str):
    """ABC/Pareto inventory classes of parts by exact integer revenue:
    cumulative-share thresholds 80/95 tested by integer
    cross-multiplication over a sample-sort WEIGHTED prefix sum."""
    from sbustreamspot_core_ray.stages.relational import abc_classes

    return abc_classes(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        ),
        num_parts=P,
    )


_SQL_ABC = """
WITH pr AS (
  SELECT l_partkey AS part,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT SUM(rev) AS total FROM pr),
c AS (
  SELECT part, rev,
         COALESCE(SUM(rev) OVER (ORDER BY rev DESC, part
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM pr),
k AS (
  SELECT CASE WHEN 5 * cum_prev < 4 * (SELECT total FROM t) THEN 'A'
              WHEN 20 * cum_prev < 19 * (SELECT total FROM t) THEN 'B'
              ELSE 'C' END AS cls,
         rev
  FROM c)
SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_units
FROM k GROUP BY cls"""


def q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction: top-3 terms by integer tf*idf
    (idf = floor(1e9 * ln(N/df)) nanonats, libm-parity), lexicographic
    ties. Two cheap-key shuffles."""
    from sbustreamspot_core_ray.stages.text import doc_keywords

    return doc_keywords(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        top_k=3,
        num_parts=P,
    )


_SQL_DOC_KEYWORDS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term <> '' GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * CAST(floor(ln(CAST((SELECT n FROM n) AS DOUBLE) / df.df)
                            * 1e9) AS BIGINT) AS score
  FROM tf JOIN df USING (term))
SELECT doc_id, term, tf, score FROM sc
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)
        <= 3"""
