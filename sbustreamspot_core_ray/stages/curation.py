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

from ..functions.proccache import cached_get, call_singleton
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


def group_sample(
    ds: ray.data.Dataset,
    n_per_group: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact-size deterministic uniform sample per stratum: the
    `n_per_group` rows with the SMALLEST Fibonacci-mix hash of their id.
    The multiply-mod-2^64 hash is a bijection, so ordering by it is a
    deterministic uniform permutation — an exact-n sample with no RNG,
    stable under any partitioning and on resume (the reservoir-sampling
    use case, made idempotent).

    Per-batch combiner keeps at most n rows per stratum, so the final
    per-stratum cut (groupby on the SMALL strata key) sees at most
    n x num_blocks rows — the shuffle never carries the corpus."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            h = df[id_col].to_numpy().astype(np.uint64) * FIB_MIX
        out = df[[id_col, strata_col]].copy()
        out["_h"] = h  # uint64: ascending == the SQL HUGEINT order
        return (
            out.sort_values([strata_col, "_h"], kind="stable")
            .groupby(strata_col, sort=False)
            .head(n_per_group)
        )

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_h", kind="stable").head(n_per_group)
        return g.drop(columns=["_h"])

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby(strata_col)
        .map_groups(cut, batch_format="pandas")
    )


def weighted_sample(
    ds: ray.data.Dataset,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Weighted reservoir sampling without replacement (Efraimidis &
    Spirakis 2006, A-ES): keep the n rows with the smallest -ln(u)/w,
    where w is the row weight (character length here — token-mass-
    proportional selection for training mixes) and u is a deterministic
    uniform in (0, 1] derived from the Fibonacci-mix hash of the id
    ((hash >> 11) + 1) / 2^53 — no RNG, so the SAME rows are selected on
    any cluster size, any partitioning, and on resume (the group_sample
    idempotence argument, weight-proportional).

    Keys are quantized to integer nanounits (floor(key*1e9 + 0.5), the
    doc_logprob pattern) so ordering is identical to the SQL mirror
    bit-for-bit. Scale shape: per-batch combiner keeps the n smallest
    keys, so the final single-partition cut sees <= n x num_blocks rows —
    the corpus itself never shuffles."""
    import pyarrow.compute as pc_

    def keys(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = pc_.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
        ok = ~pd.isna(w)
        w = np.where(ok, w, 0).astype(np.int64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * FIB_MIX
        u = ((h >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
        key = np.negative(np.log(u)) / w.astype(np.float64)
        key_e9 = np.floor(key * 1e9 + 0.5).astype(np.int64)
        order = np.lexsort((ids, key_e9))[:n]
        return pa.table(
            {
                "doc_id": ids[order],
                "weight": w[order],
                "key_e9": key_e9[order],
            }
        )

    def cut(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        key_e9 = t["key_e9"].to_numpy()
        order = np.lexsort((ids, key_e9))[:n]
        return pa.table(
            {
                "doc_id": ids[order],
                "weight": t["weight"].to_numpy()[order],
                "key_e9": key_e9[order],
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(keys, batch_format="pyarrow")
        .repartition(1)
        .map_batches(cut, batch_format="pyarrow")
    )


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


# ---------------------------------------------------------------------------
# benchmark decontamination

DECON_N = 5  # word n-gram order (public-standard range is 8-13 for token
#              n-grams; 5 keeps the synthetic fixture's overlap non-trivial)


def doc_word_ngrams(texts: list[str], n: int = DECON_N):
    """(flat gram array, per-doc gram counts) for whitespace-tokenized
    word n-grams. Grams are the literal joined strings (``'w1 w2 ... wn'``)
    so membership tests are string-equality on BOTH the engine and SQL
    sides — no hash to keep in sync. Vectorized: one flat word array per
    batch, gram assembly is n elementwise object-array concats (C loop),
    never a per-document Python loop."""
    word_lists = [t.split() for t in texts]
    lens = np.array([len(w) for w in word_lists], np.int64)
    counts = np.maximum(lens - (n - 1), 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=object), counts
    flat = np.empty(int(lens.sum()), dtype=object)
    flat[:] = [w for ws in word_lists for w in ws]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    gstarts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # start index (into flat) of every gram
    gs = np.repeat(starts - gstarts, counts) + np.arange(total)
    g = flat[gs]
    for k in range(1, n):
        g = g + " "
        g = g + flat[gs + k]
    return g, counts


class _DeconScan:
    """Per-process state: the broadcast benchmark gram set, fetched once
    per worker (``cached_get``) and binary-searched per batch."""

    def __init__(self, bench_ref):
        self.bench_ref = bench_ref

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        bench: np.ndarray = cached_get(self.bench_ref)  # sorted str array
        texts = df["text"].fillna("").tolist()
        grams, counts = doc_word_ngrams(texts)
        if len(grams) and len(bench):
            idx = np.searchsorted(bench, grams)
            idx_c = np.minimum(idx, len(bench) - 1)
            hit = (bench[idx_c] == grams) & (idx < len(bench))
        else:
            hit = np.zeros(len(grams), bool)
        gstarts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        matched = np.zeros(len(df), np.int64)
        nz = counts > 0
        if nz.any():
            matched[nz] = np.add.reduceat(hit.astype(np.int64), gstarts[nz])
        n_grams = counts
        frac = np.where(n_grams > 0, matched / np.maximum(n_grams, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_grams": n_grams,
                "matched_grams": matched,
                "contaminated": (matched > 0).astype(np.int64),
                "contamination_frac": round_half_away(frac, 6),
            }
        )


def decontaminate(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    n: int = DECON_N,
) -> ray.data.Dataset:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with a (small) benchmark/test set — the standard pre-training
    hygiene op (public method: n-gram-overlap decontamination as described
    in open LLM training reports).

    Scale shape: the benchmark side is SMALL by construction (eval sets);
    its distinct gram set is built once on the driver and broadcast via
    ``ray.put`` — the 100-TB corpus side is ONE stateless ``map_batches``
    pass with a per-worker cached binary search, no shuffle, no join."""
    import ray as _ray

    bench_texts = [
        r["text"] or "" for r in benchmark.select_columns(["text"]).take_all()
    ]
    grams, _ = doc_word_ngrams(bench_texts, n)
    bench = np.unique(grams.astype(str)) if len(grams) else np.empty(0, "U1")
    ref = _ray.put(bench)
    return docs.map_batches(
        partial(call_singleton, _DeconScan, ref),
        batch_format="pandas",
        batch_size=2048,
    )


def ngram_novelty(
    docs: ray.data.Dataset,
    n: int = DECON_N,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-document n-gram novelty: the fraction of a document's DISTINCT
    word n-grams whose global first occurrence (min doc_id) is this
    document — a repetition/contamination signal for corpus curation
    (novelty 1.0 = all-new text, ~0 = boilerplate seen earlier).

    Scale shape: one stateless gram-extraction ``map_batches`` (vectorized
    ``doc_word_ngrams``, per-doc distinct locally — each document lives in
    one row, so no cross-batch dedup is needed), then ONE shuffle keyed on
    hash(gram) %% P (int32 key; gram strings ride as payload) into a
    per-partition factorize + minimum-scatter kernel that emits BOTH
    per-doc partials (novel counts from gram ownership, gram totals) in a
    single pass; the partials meet in an int-key doc_id groupby. Returns
    (doc_id, n_grams, novel_grams, novelty) for every document, one IEEE
    division per row mirrored by the SQL oracle."""

    from ..functions.hashing import part_of

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").tolist()
        grams, counts = doc_word_ngrams(texts, n)
        ids = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        out = pd.DataFrame({"doc_id": ids, "gram": grams})
        out = out.drop_duplicates()  # distinct per doc (docs are row-local)
        h = pd.util.hash_array(out["gram"].to_numpy(object)).astype(np.uint64)
        out["__p"] = part_of(h, num_parts).astype(np.int32)
        return out

    def own_kernel(df: pd.DataFrame) -> pd.DataFrame:
        """Per partition (all rows of a gram land here): min doc per gram
        via factorize + minimum-scatter, then BOTH per-doc partials in one
        output — novel counts (docs owning a gram's first occurrence) and
        gram totals."""
        ids = df["doc_id"].to_numpy(np.int64)
        codes, _ = pd.factorize(df["gram"].to_numpy(object), sort=False)
        mins = np.full(codes.max() + 1 if len(codes) else 0, np.iinfo(np.int64).max)
        np.minimum.at(mins, codes, ids)
        nu, nc = np.unique(mins, return_counts=True)
        tu, tc = np.unique(ids, return_counts=True)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate([nu, tu]),
                "n_grams": np.concatenate(
                    [np.zeros(len(nu), np.int64), tc.astype(np.int64)]
                ),
                "novel_grams": np.concatenate(
                    [nc.astype(np.int64), np.zeros(len(tu), np.int64)]
                ),
            }
        )

    def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        z = np.zeros(len(ids), np.int64)
        return pd.DataFrame({"doc_id": ids, "n_grams": z, "novel_grams": z})

    # second shuffle keyed hash(doc_id) %% P with a per-partition fold —
    # Ray Data's sort-aggregate on the raw doc_id key measured ~13 s of
    # barrier stall on this shape; the house int32-partition fold is ~4x
    # faster end-to-end
    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__p2"] = part_of(
            df["doc_id"].to_numpy(np.int64), num_parts
        ).astype(np.int32)
        return df

    def fold_finish(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("doc_id", sort=True)[["n_grams", "novel_grams"]]
            .sum()
            .reset_index()
        )
        ng = g["n_grams"].to_numpy(np.int64)
        nv = g["novel_grams"].to_numpy(np.int64)
        frac = np.where(ng > 0, nv / np.maximum(ng, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_grams": ng,
                "novel_grams": nv,
                "novelty": round_half_away(frac, 6),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pandas", batch_size=1024)
        .groupby("__p")
        .map_groups(own_kernel, batch_format="pandas")
        .union(docs.select_columns(["doc_id"]).map_batches(
            zero_rows, batch_format="pandas"
        ))
        .map_batches(tag_doc, batch_format="pandas")
        .groupby("__p2")
        .map_groups(fold_finish, batch_format="pandas")
    )


MANIFEST_MIN_TOKENS = 10
# alpha-ratio floor 0.6 applied as the exact integer predicate
# 5*alpha_chars >= 3*chars (no float comparison anywhere)
MANIFEST_ALPHA_NUM, MANIFEST_ALPHA_DEN = 3, 5


def corpus_manifest(
    docs: ray.data.Dataset,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Flagship end-to-end curation composition — the manifest a training
    run reads: exact-dedup first-wins (sha256, min doc_id), integer-exact
    quality floor (5*alpha_chars >= 3*chars and >= MANIFEST_MIN_TOKENS
    whitespace tokens), language-ID filter (marker heuristic, 'unk'
    dropped), rolled up per (source, predicted lang) with exact integer
    sums; the per-group alpha fraction is ONE division of two integer
    sums (never a mean of per-doc floats — order-free, SQL-mirrored).

    Scale shape: one stateless scoring `map_batches` (language markers,
    char/alpha/token counts, sha256) → ONE digest-derived cheap-key
    shuffle for the dedup fold (winners keep their metric columns, so no
    second pass over text) → row-local filters → a fixed-cardinality
    (source, lang) groupby of integer partials. Returns
    (source, lang_pred, n_docs, tokens, chars, alpha_frac)."""
    import hashlib
    import re as _re

    from .text import _LANG_MARKERS

    def score(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        padded = " " + texts.str.lower() + " "
        scores = {
            lang: sum(padded.str.count(_re.escape(m)) for m in ms)
            for lang, ms in _LANG_MARKERS.items()
        }
        mat = pd.DataFrame(scores)
        best = mat.idxmax(axis=1)
        best[mat.max(axis=1) == 0] = "unk"
        chars = texts.str.len().to_numpy(np.int64)
        alpha = texts.str.count("[A-Za-z]").to_numpy(np.int64)
        toks = (
            texts.str.strip().str.split().map(len).to_numpy(np.int64)
        )
        digests = [hashlib.sha256(t.encode("utf-8")).digest() for t in texts]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "source": df["source"].astype(str),
                "lang_pred": best.to_numpy(),
                "chars": chars,
                "alpha_chars": alpha,
                "ws_tokens": toks,
                "sha": [d.hex() for d in digests],
                "__p": np.array(
                    [int.from_bytes(d[:8], "little") % num_parts for d in digests],
                    np.int32,
                ),
            }
        )

    def dedup_filter(df: pd.DataFrame) -> pd.DataFrame:
        # first-wins per digest: all copies of a text land in this partition
        w = df.sort_values(["sha", "doc_id"], kind="stable").drop_duplicates(
            "sha", keep="first"
        )
        keep = (
            (MANIFEST_ALPHA_DEN * w["alpha_chars"] >= MANIFEST_ALPHA_NUM * w["chars"])
            & (w["ws_tokens"] >= MANIFEST_MIN_TOKENS)
            & (w["lang_pred"] != "unk")
        )
        w = w[keep]
        g = (
            w.groupby(["source", "lang_pred"], sort=False)
            .agg(
                n_docs=("doc_id", "size"),
                tokens=("ws_tokens", "sum"),
                chars=("chars", "sum"),
                alpha=("alpha_chars", "sum"),
            )
            .reset_index()
        )
        for c in ("n_docs", "tokens", "chars", "alpha"):
            g[c] = g[c].astype(np.int64)
        return g

    from ray.data.aggregate import Sum

    agg = (
        docs.select_columns(["doc_id", "source", "text"])
        .map_batches(score, batch_format="pandas", batch_size=1024)
        .groupby("__p")
        .map_groups(dedup_filter, batch_format="pandas")
        .groupby(["source", "lang_pred"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("tokens", alias_name="tokens"),
            Sum("chars", alias_name="chars"),
            Sum("alpha", alias_name="alpha"),
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ch = df["chars"].to_numpy(np.int64)
        al = df["alpha"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "source": df["source"],
                "lang_pred": df["lang_pred"],
                "n_docs": df["n_docs"].to_numpy(np.int64),
                "tokens": df["tokens"].to_numpy(np.int64),
                "chars": ch,
                "alpha_frac": round_half_away(
                    al.astype(np.float64) / np.maximum(ch, 1), 6
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus composition: per-source stats + temperature sampling weights


def source_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source corpus composition: document count, distinct languages,
    total and mean characters — the first report any data-mixing decision
    reads. ONE combiner-shrunk (source, lang) groupby (per-batch partial
    sums shrink each block to <= |sources|*|langs| rows); the final
    per-source fold runs on that fixed-cardinality table. The mean is one
    IEEE divide of exact integer sums (SQL-mirrorable)."""
    from ray.data.aggregate import Sum

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["source", "lang"], sort=False)
            .agg(n=("doc_id", "size"), chars=("n_chars", "sum"))
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["chars"] = g["chars"].astype(np.int64)
        return g

    agg = (
        docs.select_columns(["doc_id", "source", "lang", "n_chars"])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
        .to_pandas()  # <= |sources| * |langs| rows by construction
    )
    g = (
        agg.groupby("source", sort=True)
        .agg(
            n_docs=("n", "sum"),
            n_langs=("lang", "nunique"),
            total_chars=("chars", "sum"),
        )
        .reset_index()
    )
    nd = g["n_docs"].to_numpy(np.int64)
    tc = g["total_chars"].to_numpy(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(nd, pa.int64()),
                "n_langs": pa.array(g["n_langs"].to_numpy(np.int64), pa.int64()),
                "total_chars": pa.array(tc, pa.int64()),
                "mean_chars": pa.array(
                    round_half_away(tc.astype(np.float64) / nd, 2), pa.float64()
                ),
            }
        )
    )


def sampling_weights(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Temperature-based (alpha = 0.5) data-mixing weights per language:
    weight = sqrt(n_lang) / sqrt(max_n) — the square-root rebalancing rule
    (multilingual-corpus temperature sampling), normalized by the LARGEST
    group so the parity chain is sqrt (correctly rounded per IEEE-754)
    plus ONE divide — never a float sum across groups. Combiner counts,
    one tiny lang groupby, driver fold on |langs| rows."""
    from ray.data.aggregate import Sum

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = (
        docs.select_columns(["lang"])
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("lang")
    )
    n = agg["n"].to_numpy(np.int64)
    w = np.sqrt(n.astype(np.float64)) / np.sqrt(float(n.max())) if len(n) else n
    return ray.data.from_arrow(
        pa.table(
            {
                "lang": pa.array(agg["lang"], pa.string()),
                "n_docs": pa.array(n, pa.int64()),
                "weight": pa.array(round_half_away(w, 6), pa.float64()),
            }
        )
    )


def budget_fill(
    docs: ray.data.Dataset,
    budget_tokens: int,
    sub_docs: int = 100_000,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Token-budget corpus selection: admit documents in priority order —
    integer stopword-density key desc (qk = n_stop * 1e6 // n_tok, the
    fluency heuristic), doc_id asc — until the cumulative whitespace-token
    count would exceed `budget_tokens`. The standard curation step for
    assembling a fixed-size training mix from a larger pool.

    Scale shape: a distributed prefix sum in PRIORITY order (the
    pack_sequences machinery re-keyed). Pass 1 folds per-block (qk,
    doc_id // sub_docs) token totals; the driver holds one row per
    (qk, sub) bucket — bounded by distinct-qk x id-range, never per-doc —
    prefix-sums the bucket bases exactly in int64 along the priority
    order, and broadcasts them. Pass 2 is ONE hash(bucket) shuffle; each
    complete bucket resolves its own docs by a local doc_id-sorted cumsum
    against the exact base. Sub-bucketing by id range bounds the hottest
    bucket at `sub_docs` docs even when one qk value dominates the pool.
    All arithmetic is integer, so the SQL window-SUM mirror is bit-exact."""
    from ..functions.hashing import part_of

    stop_re = r"\b(?:" + "|".join(
        ("the", "and", "of", "to", "is", "a", "in", "that", "it")
    ) + r")\b"

    def score(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        nt = text.str.split().str.len().fillna(0).astype(np.int64)
        ns = text.str.lower().str.count(stop_re).astype(np.int64)
        qk = (ns * 1_000_000) // np.maximum(nt, 1)
        d = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": d, "n_tok": nt, "qk": qk, "sub": d // sub_docs}
        )

    scored = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(score, batch_format="pandas")
        .materialize()  # doc_id/n_tok/qk only — far smaller than the corpus
    )
    totals = (
        scored.groupby(["qk", "sub"]).sum("n_tok").to_pandas()
    )  # one row per (qk, sub) bucket by construction
    # priority order: qk desc, sub asc (sub ranges are doc_id-ordered)
    totals = totals.sort_values(
        ["qk", "sub"], ascending=[False, True]
    ).reset_index(drop=True)
    tt = totals["sum(n_tok)"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(tt)[:-1]]).astype(np.int64)
    keys = (
        totals["qk"].to_numpy(np.int64),
        totals["sub"].to_numpy(np.int64),
        bases,
    )
    base_ref = ray.put(keys)
    B = int(budget_tokens)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__p"] = part_of(
            df["qk"].to_numpy(np.int64) * 1_000_003 + df["sub"].to_numpy(np.int64),
            num_parts,
        )
        return df

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "quality_key": pd.Series([], dtype=np.int64),
                "n_tokens": pd.Series([], dtype=np.int64),
                "cum_tokens": pd.Series([], dtype=np.int64),
            }
        )
        if not len(df):
            return empty
        bqk, bsub, bbases = ray.get(base_ref)
        qk = df["qk"].to_numpy(np.int64)
        sub = df["sub"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        nt = df["n_tok"].to_numpy(np.int64)
        # bucket-major (qk desc, sub asc), doc_id asc within bucket
        order = np.lexsort((d, sub, -qk))
        qk, sub, d, nt = qk[order], sub[order], d[order], nt[order]
        cum = np.cumsum(nt)
        new_b = np.concatenate(
            [[True], (qk[1:] != qk[:-1]) | (sub[1:] != sub[:-1])]
        )
        excl = cum - nt
        seg_start = excl[np.flatnonzero(new_b)][np.cumsum(new_b) - 1]
        # exact global base per bucket: lookup by (-qk, sub) sorted key
        lk = np.lexsort((bsub, -bqk))
        sk_q, sk_s, sk_b = -bqk[lk], bsub[lk], bbases[lk]
        # composite searchsorted via packed key (qk < 2^21, sub < 2^41)
        pack = lambda q, s: q * (int(sk_s.max()) + 1) + s  # noqa: E731
        pos = np.searchsorted(pack(sk_q, sk_s), pack(-qk, sub))
        base = sk_b[pos]
        end = base + (cum - seg_start)
        keep = end <= B
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "doc_id": d[keep],
                "quality_key": qk[keep],
                "n_tokens": nt[keep],
                "cum_tokens": end[keep],
            }
        )

    return (
        scored.map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(kernel, batch_format="pandas")
    )


SPLIT_SALT = 0x9E3779B97F4A7C15


def leakage_free_split(
    docs: ray.data.Dataset,
    train_pct: int = 80,
    val_pct: int = 10,
    threshold: float = 0.8,
    num_parts: int = 8,
) -> ray.data.Dataset:
    """Group-aware train/val/test split: documents are first grouped into
    near-duplicate components (minhash-LSH -> Jaccard verify -> connected
    components, the minhash_lsh_dedup pipeline), then the WHOLE component
    is assigned one split by a seeded hash of its dup_group id — so two
    near-duplicates can never land on opposite sides of the split (the
    train/test leakage every dedup paper warns about). Deterministic:
    bucket = ((dup_group * SPLIT_SALT) mod 2^64) mod 100; split 0 (train)
    below train_pct, 1 (val) below train_pct+val_pct, else 2 (test).
    Returns (doc_id, dup_group, split) — all int64, exactly mirrorable in
    HUGEINT SQL.

    Scale: adds ONE stateless vectorized map on top of the dedup
    pipeline's shapes (banded candidates, one cheap-key shuffle, CC on
    the superstep engine above the driver fast-path thresholds)."""
    from .dedup import minhash_lsh_dedup

    groups = minhash_lsh_dedup(
        docs, threshold=threshold, num_parts=num_parts
    )
    C = np.uint64(SPLIT_SALT)
    t_hi = np.uint64(train_pct)
    v_hi = np.uint64(train_pct + val_pct)

    def assign(t: pa.Table) -> pa.Table:
        g = t["dup_group"].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            b = (g * C) % np.uint64(100)
        split = np.where(b < t_hi, 0, np.where(b < v_hi, 1, 2)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "dup_group": t["dup_group"],
                "split": pa.array(split),
            }
        )

    return groups.map_batches(assign, batch_format="pyarrow")


def intradoc_dedup(docs: ray.data.Dataset, window: int = 2) -> ray.data.Dataset:
    """Within-document repeated-segment removal: split each document into
    consecutive non-overlapping `window`-word segments, keep the first
    occurrence of every distinct segment text, drop later repeats — the
    intra-document cleanup pass (repeated paragraphs / boilerplate lines)
    that runs before any cross-document dedup in an LLM curation
    pipeline. Emits (doc_id, n_segs, n_dup_segs, n_kept_words).

    Scale shape: embarrassingly parallel — ONE map_batches pass, no
    shuffle (each document is one row, so every comparison is local to
    its batch). Segments are compared exactly without re-joining
    strings: the batch's words are dictionary-encoded once, each segment
    becomes a padded row of int32 codes, and duplicates fall out of a
    single lexsort over (doc, codes, seg_idx) with an adjacent-equality
    scan — no per-document Python loop."""
    import pyarrow.compute as pc

    W = int(window)

    def kernel(t: pa.Table) -> pa.Table:
        n_docs = len(t)
        doc_id = t["doc_id"].to_numpy().astype(np.int64, copy=False)
        if n_docs == 0:
            empty = np.array([], np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(empty),
                    "n_segs": pa.array(empty),
                    "n_dup_segs": pa.array(empty),
                    "n_kept_words": pa.array(empty),
                }
            )
        words = pc.split_pattern(t["text"], " ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        offsets = words.offsets.to_numpy().astype(np.int64, copy=False)
        offsets = offsets - offsets[0]
        flat = words.flatten()  # aligned with the rebased offsets (values
        # of a sliced ListArray would keep child coordinates)
        codes = pc.dictionary_encode(flat).indices.to_numpy().astype(np.int32)
        n_words = np.diff(offsets)
        n_segs = (n_words + W - 1) // W
        doc_of_word = np.repeat(np.arange(n_docs), n_words)
        pos = np.arange(len(codes)) - np.repeat(offsets[:-1], n_words)
        seg_in_doc = pos // W
        seg_starts = np.concatenate(([0], np.cumsum(n_segs)))
        total_segs = int(seg_starts[-1])
        row = seg_starts[doc_of_word] + seg_in_doc
        mat = np.full((total_segs, W), -1, np.int32)
        mat[row, pos % W] = codes
        doc_of_seg = np.repeat(np.arange(n_docs), n_segs)
        seg_idx = np.arange(total_segs) - seg_starts[doc_of_seg]
        # group by (doc, code columns); least-significant key = seg_idx so
        # the earliest occurrence leads its equality run
        keys = [seg_idx] + [mat[:, c] for c in range(W - 1, -1, -1)] + [doc_of_seg]
        order = np.lexsort(keys)
        sd, sm = doc_of_seg[order], mat[order]
        same = np.zeros(total_segs, bool)
        if total_segs > 1:
            same[1:] = (sd[1:] == sd[:-1]) & (sm[1:] == sm[:-1]).all(axis=1)
        dup = np.zeros(total_segs, bool)
        dup[order] = same
        seg_words = np.minimum(W, n_words[doc_of_seg] - seg_idx * W)
        kept_words = np.bincount(
            doc_of_seg, weights=np.where(dup, 0, seg_words), minlength=n_docs
        ).astype(np.int64)
        n_dup = np.bincount(doc_of_seg, weights=dup, minlength=n_docs).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id),
                "n_segs": pa.array(n_segs.astype(np.int64)),
                "n_dup_segs": pa.array(n_dup),
                "n_kept_words": pa.array(kept_words),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )


def dup_span_coverage(
    docs: ray.data.Dataset,
    n: int = DECON_N,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-document CROSS-DOC duplicated-span coverage — the exact
    substring-dedup signal of Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better": the fraction of a document's token
    positions covered by some word n-gram that also occurs in at least
    one OTHER document (within-doc repeats do not count). ngram_novelty
    asks "did this doc coin the gram"; this asks "how much of this doc is
    shared text" — the quantity substring-level dedup would remove.

    Coverage is the exact union of the duplicated-gram intervals
    [i, i+n): with duplicated starts sorted, covered = sum over starts of
    min(next_start - start, n), last term n — one vectorized diff, no
    interval sweep.

    Scale shape: one stateless gram-extraction `map_batches` (positions
    ride along) -> ONE shuffle on hash(gram) % P -> per-partition
    factorize + distinct-doc count per gram marks duplicated occurrences
    -> ONE hash(doc_id) % P shuffle folds covered spans per doc (token
    totals ride the same fold as tagged rows). Returns every document:
    (doc_id, n_tokens, covered_tokens, dup_frac)."""

    from ..functions.hashing import part_of

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").tolist()
        grams, counts = doc_word_ngrams(texts, n)
        ids = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        gstarts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(int(counts.sum())) - np.repeat(gstarts, counts)
        out = pd.DataFrame({"doc_id": ids, "gram": grams, "pos": pos})
        h = pd.util.hash_array(out["gram"].to_numpy(object)).astype(np.uint64)
        out["__p"] = part_of(h, num_parts).astype(np.int32)
        return out

    def mark_dups(df: pd.DataFrame) -> pd.DataFrame:
        """All occurrences of a gram land here: keep the (doc, pos) rows
        of grams present in >= 2 distinct docs."""
        ids = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        codes, _ = pd.factorize(df["gram"].to_numpy(object), sort=False)
        pair = np.empty(len(ids), dtype=[("c", "<i8"), ("d", "<i8")])
        pair["c"], pair["d"] = codes, ids
        up = np.unique(pair)
        ndocs = np.bincount(up["c"], minlength=codes.max() + 1 if len(codes) else 0)
        keep = ndocs[codes] >= 2
        return pd.DataFrame(
            {"doc_id": ids[keep], "pos": pos[keep], "n_tokens": np.int64(-1)}
        )

    def token_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").tolist()
        nt = np.array([len(t.split()) for t in texts], np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "pos": np.zeros(len(nt), np.int64),
                "n_tokens": nt,
            }
        )

    def tag_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__p2"] = part_of(
            df["doc_id"].to_numpy(np.int64), num_parts
        ).astype(np.int32)
        return df

    def fold_cover(df: pd.DataFrame) -> pd.DataFrame:
        is_tok = df["n_tokens"].to_numpy(np.int64) >= 0
        tok = df[is_tok]
        spans = df[~is_tok].sort_values(["doc_id", "pos"], kind="stable")
        ids = spans["doc_id"].to_numpy(np.int64)
        pos = spans["pos"].to_numpy(np.int64)
        cov_ids = np.empty(0, np.int64)
        cov = np.empty(0, np.int64)
        if len(ids):
            last = np.concatenate([ids[1:] != ids[:-1], [True]])
            gap = np.empty(len(ids), np.int64)
            gap[:-1] = pos[1:] - pos[:-1]
            gap[last] = n
            seg = np.minimum(gap, n)
            bnd = np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))
            cov = np.add.reduceat(seg, bnd)
            cov_ids = ids[bnd]
        g = tok.groupby("doc_id", sort=True)["n_tokens"].max()
        d_ids = g.index.to_numpy()
        nt = g.to_numpy(np.int64)
        covered = np.zeros(len(d_ids), np.int64)
        if len(cov_ids):
            p = np.searchsorted(d_ids, cov_ids)
            covered[p] = cov
        frac = np.where(nt > 0, covered / np.maximum(nt, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": d_ids,
                "n_tokens": nt,
                "covered_tokens": covered,
                "dup_frac": round_half_away(frac, 6),
            }
        )

    marked = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pandas", batch_size=1024)
        .groupby("__p")
        .map_groups(mark_dups, batch_format="pandas")
    )
    totals = docs.select_columns(["doc_id", "text"]).map_batches(
        token_rows, batch_format="pandas"
    )
    return (
        marked.union(totals)
        .map_batches(tag_doc, batch_format="pandas")
        .groupby("__p2")
        .map_groups(fold_cover, batch_format="pandas")
    )


def dedup_stack(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_parts: int = 32,
    minhash_parts: int = 4,
) -> "pa.Table":
    """Flagship dedup-stack manifest — the attrition report of the full
    dedup pipeline a pre-training corpus actually runs, stages in the
    order they fire: exact sha256 first-wins, minhash-LSH near-dup
    components (keep the min-id representative), proper-prefix truncated
    re-crawl removal. Each doc is attributed to the FIRST stage that
    removes it, so the counts decompose the corpus exactly:
    input = removed_exact + removed_near_dup + removed_prefix + kept.
    Returns the long-form (stage, n) table.

    Scale shape: composes the three existing operators (each already
    one-cheap-key-shuffle shaped), then ONE hash(doc_id) co-partition of
    the four doc-scale flag streams with a vectorized per-partition set
    fold; the driver sums P count rows."""
    import pandas as pd

    from ..functions.hashing import part_of
    from .dedup import exact_dedup, minhash_lsh_dedup, prefix_duplicates

    kd = docs.select_columns(["doc_id", "text"]).materialize()

    def tag(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": d,
                    "kind": np.full(len(d), kind, np.int8),
                    "__p": pa.array(part_of(d, num_parts), pa.int32()),
                }
            )

        return fn

    all_ids = kd.map_batches(tag(0), batch_format="pyarrow")
    winners = exact_dedup(kd, num_parts=num_parts).map_batches(
        tag(1), batch_format="pyarrow"
    )
    groups = minhash_lsh_dedup(
        kd, threshold=threshold, num_parts=minhash_parts
    )

    def near_flags(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = t["dup_group"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = d[d != g]
        return pa.table(
            {
                "doc_id": d,
                "kind": np.full(len(d), 2, np.int8),
                "__p": pa.array(part_of(d, num_parts), pa.int32()),
            }
        )

    near = groups.map_batches(near_flags, batch_format="pyarrow")
    px = prefix_duplicates(kd, num_parts=num_parts)  # materialized table
    pxd = np.unique(px["doc_id"].to_numpy(zero_copy_only=False))
    prefix_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(pxd, pa.int64())})
    ).map_batches(tag(3), batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        piv = (
            df.groupby(["doc_id", "kind"]).size().unstack(fill_value=0)
        )
        for k in (0, 1, 2, 3):
            if k not in piv.columns:
                piv[k] = 0
        is_doc = piv[0] > 0
        f_ex = is_doc & (piv[1] == 0)          # not an exact winner
        f_nd = is_doc & ~f_ex & (piv[2] > 0)   # near-dup non-representative
        f_px = is_doc & ~f_ex & ~f_nd & (piv[3] > 0)
        n_in = int(is_doc.sum())
        return pd.DataFrame(
            {
                "input": [n_in],
                "removed_exact": [int(f_ex.sum())],
                "removed_near_dup": [int(f_nd.sum())],
                "removed_prefix": [int(f_px.sum())],
            }
        )

    parts = (
        all_ids.union(winners, near, prefix_ds)
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_in = int(parts["input"])
    rex = int(parts["removed_exact"])
    rnd = int(parts["removed_near_dup"])
    rpx = int(parts["removed_prefix"])
    return pa.table(
        {
            "stage": pa.array(
                ["input", "removed_exact", "removed_near_dup",
                 "removed_prefix", "kept"],
                pa.string(),
            ),
            "n": pa.array(
                [n_in, rex, rnd, rpx, n_in - rex - rnd - rpx], pa.int64()
            ),
        }
    )


DSIR_V = 5000


def importance_weights(
    docs: ray.data.Dataset,
    target_lang: str = "en",
    top_v: int = DSIR_V,
) -> ray.data.Dataset:
    """DSIR-style data-selection importance weights (Xie et al., "Data
    Selection for Language Models via Importance Resampling", arXiv:
    2302.03169, with unigram features instead of hashed n-grams so the SQL
    oracle is exact): per-document weight_e9 = Σ_tokens [q_tgt(t) -
    q_raw(t)] where q_*(t) quantizes ln of the add-1-smoothed unigram
    probability under the target domain (docs with lang = `target_lang`)
    and the raw corpus respectively. Positive weights mark documents that
    look like the target domain — the resampling key for corpus curation.

    Float-parity posture (the doc_logprob pattern): all counts and totals
    are exact integers, each probability is ONE correctly rounded IEEE
    divide of two integers, ln is math.log (libm-parity with DuckDB), and
    per-token quantization to int64 nanonats makes per-doc sums
    order-independent.

    Scale shape: pass 1 is a per-batch term-count combiner (corpus + target
    counts in one pandas groupby) into a P-group hashed-key fold (the
    BASELINE.md ngram_novelty lesson — never a vocabulary-scale raw-string
    sort-aggregate); each fold emits its partition totals plus its local
    top-V cut (exact: every term lives in exactly one partition), so the
    driver sees <= P*(V+1) rows; the (term, q) table is broadcast via
    ray.put once; pass 2 is a stateless vectorized searchsorted lookup —
    no shuffle touches the corpus rows."""
    import math

    import ray as _ray

    NPARTS = 32

    def term_partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        is_tgt = (
            df["lang"].reindex(ex.index).to_numpy(object) == target_lang
        )
        g = pd.DataFrame(
            {"term": ex.to_numpy(object), "t": is_tgt.astype(np.int64)}
        ).groupby("term", sort=False)
        out = g.agg(c_partial=("t", "size"), ct_partial=("t", "sum"))
        out = out.reset_index()
        h = pd.util.hash_array(out["term"].to_numpy(dtype=object))
        out["__p"] = (h % NPARTS).astype(np.int32)
        return out

    def term_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("term", sort=False)[["c_partial", "ct_partial"]]
            .sum()
            .reset_index()
            .rename(columns={"c_partial": "c", "ct_partial": "ct"})
        )
        tot = pd.DataFrame(
            {
                "term": [""],
                "c": [g["c"].sum()],
                "ct": [g["ct"].sum()],
                "is_tot": np.array([1], np.int8),
            }
        )
        cut = g.sort_values(
            ["c", "term"], ascending=[False, True], kind="stable"
        ).head(top_v)
        cut = cut.assign(is_tot=np.int8(0))
        return pd.concat([cut, tot], ignore_index=True)

    parts = (
        docs.select_columns(["text", "lang"])
        .map_batches(term_partials, batch_format="pandas")
        .groupby("__p")
        .map_groups(term_fold, batch_format="pandas")
        .to_pandas()
    )
    tots = parts[parts["is_tot"] == 1]
    T_all, T_tgt = int(tots["c"].sum()), int(tots["ct"].sum())
    top = (
        parts[parts["is_tot"] == 0]
        .sort_values(["c", "term"], ascending=[False, True], kind="stable")
        .head(top_v)
        .reset_index(drop=True)
    )
    Vv = len(top)
    order = np.argsort(top["term"].to_numpy(dtype=object), kind="stable")
    terms_sorted = top["term"].to_numpy(dtype=object)[order]
    c_sorted = top["c"].to_numpy(np.int64)[order]
    ct_sorted = top["ct"].to_numpy(np.int64)[order]
    den_tgt = float(T_tgt + Vv)
    den_all = float(T_all + Vv)

    def q_pair(ct: int, c: int) -> int:
        qt = math.floor(math.log((ct + 1) / den_tgt) * 1e9 + 0.5)
        qr = math.floor(math.log((c + 1) / den_all) * 1e9 + 0.5)
        return qt - qr

    q = np.array(
        [q_pair(ct, c) for ct, c in zip(ct_sorted.tolist(), c_sorted.tolist())],
        np.int64,
    )
    q_oov = q_pair(0, 0)
    vocab_ref = _ray.put((terms_sorted, q))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        terms, qv = _ray.get(vocab_ref)
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        tok = ex.to_numpy(dtype=object)
        if len(terms):
            idx = np.minimum(np.searchsorted(terms, tok), len(terms) - 1)
            hit = terms[idx] == tok
            per_tok = np.where(hit, qv[idx], q_oov)
        else:
            per_tok = np.full(len(tok), q_oov, np.int64)
        s = pd.Series(per_tok, index=ex.index)
        sums = s.groupby(level=0).sum().reindex(df.index, fill_value=0)
        ntok = s.groupby(level=0).size().reindex(df.index, fill_value=0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": ntok.to_numpy(np.int64),
                "weight_e9": sums.to_numpy(np.int64),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )
