"""Corpus-curation ops for a large-scale training-data pipeline.

Three op families over the `documents` table, all embarrassingly parallel
(single `map_batches` pass, NO shuffle — each survives 100 TB unchanged):

- :func:`repetition_signals` — Gopher-style repetition quality signals
  (distinct-word fraction, top-word fraction, top-bigram fraction), the
  standard public filters for machine-generated / boilerplate text
  (Rae et al. 2021, "Scaling Language Models", App. A1.1 — public paper).
- :func:`stratified_sample` — deterministic hash-bucket downsampling with
  a per-stratum rate (data-mixing: e.g. downsample the dominant language
  to a target proportion). A pure filter: the keep/drop decision is a
  multiplicative Fibonacci hash of the row id, so re-runs, resumed runs
  and the SQL oracle all select the identical row set with zero state.
- :func:`pii_redact` — regex PII detection + redaction (emails, phones,
  IPv4), applied in a fixed pattern order so the counts and the redacted
  text are deterministic and SQL-mirrorable.

Like the `text` stages these run as task-based `map_batches` with
per-process singletons (``functions.proccache``) — state is compiled
regexes, far too cheap to justify actor-pool cold-starts.
"""

from __future__ import annotations

import re
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.proccache import call_singleton
from ..functions.rounding import round_half_away

# ---------------------------------------------------------------------------
# repetition signals


class RepetitionSignals:
    """Per-document word-repetition statistics, fully vectorized.

    Tokenization is whitespace-split (mirrors SQL
    ``regexp_split_to_array(trim(text), '\\s+')``). Per batch: factorize
    the flattened word stream once, then every per-doc statistic is a
    bincount / reduceat over the (doc, code) key space — no per-doc loop.
    """

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        word_lists = df["text"].fillna("").str.split()
        lens = word_lists.str.len().fillna(0).astype(np.int64).to_numpy()
        total = int(lens.sum())
        n_words = lens
        distinct = np.zeros(n, np.int64)
        top_word = np.zeros(n, np.int64)
        top_bigram = np.zeros(n, np.int64)
        n_bigrams = np.maximum(lens - 1, 0)
        if total:
            import itertools

            flat = list(itertools.chain.from_iterable(word_lists))
            codes, _ = pd.factorize(np.asarray(flat, dtype=object))
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            packed = (doc_idx.astype(np.uint64) << np.uint64(32)) | codes.astype(
                np.uint64
            )
            uniq, counts = np.unique(packed, return_counts=True)
            udoc = (uniq >> np.uint64(32)).astype(np.int64)
            distinct = np.bincount(udoc, minlength=n)
            # uniq is sorted => udoc groups are contiguous runs
            starts = np.flatnonzero(np.diff(udoc, prepend=-1))
            top_word[udoc[starts]] = np.maximum.reduceat(counts, starts)
            # bigrams: adjacent positions within the same doc
            adj = doc_idx[1:] == doc_idx[:-1]
            if adj.any():
                bd = doc_idx[:-1][adj]
                w1 = codes[:-1][adj]
                w2 = codes[1:][adj]
                order = np.lexsort((w2, w1, bd))
                bd, w1, w2 = bd[order], w1[order], w2[order]
                new = np.flatnonzero(
                    np.diff(bd, prepend=-1).astype(bool)
                    | np.diff(w1, prepend=-1).astype(bool)
                    | np.diff(w2, prepend=-1).astype(bool)
                )
                bcounts = np.diff(np.append(new, len(bd)))
                bstarts = np.flatnonzero(np.diff(bd[new], prepend=-1))
                top_bigram[bd[new][bstarts]] = np.maximum.reduceat(bcounts, bstarts)
        denom_w = np.maximum(n_words, 1)
        denom_b = np.maximum(n_bigrams, 1)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_words": n_words,
                "distinct_word_frac": round_half_away(distinct / denom_w, 6),
                "top_word_frac": round_half_away(top_word / denom_w, 6),
                "top_bigram_frac": round_half_away(top_bigram / denom_b, 6),
            }
        )
        return out


def repetition_signals(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        partial(call_singleton, RepetitionSignals), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# stratified hash sampling

# 2^64 / golden ratio — Fibonacci multiplicative hashing (Knuth, TAOCP v3
# §6.4; public knowledge). High 32 bits are well-mixed for sequential ids.
FIB_MIX = np.uint64(0x9E3779B97F4A7C15)
SAMPLE_BUCKETS = 10_000  # rates expressed in basis points


def sample_bucket(ids: np.ndarray, buckets: int = SAMPLE_BUCKETS) -> np.ndarray:
    """Deterministic bucket in [0, buckets) per int64 id.

    ``((id * FIB_MIX) mod 2^64) >> 32 mod buckets`` — one vectorized
    multiply; mirrored exactly in HUGEINT SQL (see oracle)."""
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * FIB_MIX
    return ((h >> np.uint64(32)) % np.uint64(buckets)).astype(np.int64)


def stratified_sample(
    ds: ray.data.Dataset,
    rates_bp: dict[str, int],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_bp: int = SAMPLE_BUCKETS,
) -> ray.data.Dataset:
    """Keep each row iff ``sample_bucket(id) < rates_bp[stratum]``.

    Pure per-batch filter — no shuffle, no state, no RNG; the same row set
    is selected on any cluster size, any partitioning, and on resume. Use
    for data-mixing (per-language / per-source target proportions)."""

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        b = sample_bucket(ids)
        thr = (
            pd.Series(t[strata_col].to_pandas())
            .map(rates_bp)
            .fillna(default_bp)
            .to_numpy(np.int64)
        )
        return t.filter(pa.array(b < thr))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII redaction

# fixed application order — counts are taken on the text as redacted so far,
# so the order is part of the op contract (mirrored in the SQL oracle)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phones", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("n_ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
]


class PiiRedact:
    """Count + redact PII spans per document (emails → phones → IPv4).

    Patterns use the RE2-compatible subset (no backrefs/lookaround) so
    Python `re` and DuckDB's RE2 produce identical matches; parity is
    pytest-enforced on adversarial strings. Emits the match counts and a
    60-bit sha256 fingerprint of the redacted text (the same int64
    hex-slice encoding as `text.Fingerprint`)."""

    def __init__(self):
        self.pats = [(n, re.compile(p), tok) for n, p, tok in PII_PATTERNS]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        cur = df["text"].fillna("")
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)})
        for name, pat, tok in self.pats:
            out[name] = cur.str.count(pat).astype(np.int64)
            cur = cur.str.replace(pat, tok, regex=True)
        out["redacted_sha"] = np.array(
            [
                int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in cur
            ],
            np.int64,
        )
        return out


def pii_redact(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        partial(call_singleton, PiiRedact), batch_format="pandas", batch_size=2048
    )
