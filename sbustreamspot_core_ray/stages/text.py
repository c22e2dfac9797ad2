"""Text-analysis ops over the `documents` table (training-data pipeline).

All stages are vectorized per batch (pandas string kernels / numpy); the
language-ID profiles and token regex are built once per worker process
(``functions.proccache``) and the stages run as Ray tasks — an actor pool
respawns per execution and costs ~2 s of cold-start per stage at bench
scale for state that takes microseconds to build. Each op has
a matching ANSI-SQL oracle in ``__ray_entry__.oracle_sql`` — column names
and rounding are mirrored exactly on both sides.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

from functools import partial

from ..functions.proccache import call_singleton
from ..functions.rounding import round_half_away

# tiny deterministic stopword/function-word profiles per language — a
# public-knowledge n-gram/stopword heuristic, not a trained model
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " und ", " die ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " la ", " de ", " que ", " los "],
}

_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


class QualityScore:
    """Quality scoring: length, punctuation ratio, stopword ratio,
    mean word length → a [0,1] heuristic quality score."""

    STOPWORDS = ("the", "and", "of", "to", "is", "a", "in", "that", "it")

    def __init__(self):
        # pattern string (pandas .str.count compiles it per call)
        self.stop_re = r"\b(?:" + "|".join(self.STOPWORDS) + r")\b"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_chars = text.str.len()
        n_alpha = text.str.count(r"[A-Za-z]")
        n_punct = text.str.count(r"[^\w\s]")
        n_space = text.str.count(r"\s")
        words = n_space + 1
        n_stop = text.str.lower().str.count(self.stop_re)
        ws_tokens = text.str.split().str.len().fillna(0).astype(np.int64)
        df = df.copy()
        df["punct_ratio"] = round_half_away(n_punct / n_chars.clip(lower=1), 6)
        df["alpha_ratio"] = round_half_away(n_alpha / n_chars.clip(lower=1), 6)
        df["mean_word_len"] = round_half_away(n_chars / words, 6)
        df["stopword_ratio"] = round_half_away(n_stop / ws_tokens.clip(lower=1), 6)
        return df


def quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        partial(call_singleton, QualityScore), batch_format="pandas"
    )


class TokenCount:
    """Token counting: whitespace tokens + a BPE-ish regex token count."""

    def __init__(self):
        self.re = re.compile(_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        df = df.copy()
        df["ws_tokens"] = text.str.split().str.len().fillna(0).astype(np.int64)
        df["re_tokens"] = text.map(lambda s: len(self.re.findall(s))).astype(np.int64)
        return df


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(partial(call_singleton, TokenCount), batch_format="pandas")


class LangId:
    """Marker-based language ID (stopword-profile heuristic); falls back to
    'unk' when no profile matches."""

    def __init__(self):
        self.markers = _LANG_MARKERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        padded = (" " + df["text"].fillna("").str.lower() + " ")
        scores = {
            lang: sum(padded.str.count(re.escape(m)) for m in ms)
            for lang, ms in self.markers.items()
        }
        mat = pd.DataFrame(scores)
        best = mat.idxmax(axis=1)
        best[mat.max(axis=1) == 0] = "unk"
        df = df.copy()
        df["lang_pred"] = best.to_numpy()
        return df


def lang_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(partial(call_singleton, LangId), batch_format="pandas")


_MERS = np.uint64((1 << 61) - 1)  # 2^61 - 1 (Mersenne prime)


def rolling_hash_61(texts) -> np.ndarray:
    """Vectorized 61-bit polynomial rolling hash per document:
    ``h = (h*257 + byte) mod (2^61 - 1)`` over the UTF-8 bytes — identical
    to the sequential Horner loop, computed without a Python byte loop.

    Per-byte contributions ``byte * 257^(n-1-i) mod p`` use the Mersenne
    split (2^61 ≡ 1 mod p, so ``x*2^32 mod p`` needs only shifts), then a
    log-depth modular fold sums each doc's contributions. All uint64."""
    enc = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in enc], np.int64)
    n = len(enc)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(n, np.int64)
    flat = np.frombuffer(b"".join(enc), np.uint8).astype(np.uint64)
    maxlen = int(lens.max())
    p = int(_MERS)
    pows = np.empty(maxlen, np.uint64)
    acc = 1
    for i in range(maxlen):  # O(maxlen), not O(corpus bytes)
        pows[i] = acc
        acc = (acc * 257) % p
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    pw = pows[np.repeat(lens, lens) - 1 - pos_in_doc]
    pw_hi = pw >> np.uint64(32)  # < 2^29
    pw_lo = pw & np.uint64(0xFFFFFFFF)
    x = flat * pw_hi  # < 2^37
    # x * 2^32 mod p == (x >> 29) + ((x & (2^29-1)) << 32), both < 2^61
    hi_part = (x >> np.uint64(29)) + ((x & np.uint64((1 << 29) - 1)) << np.uint64(32))
    contrib = hi_part + flat * pw_lo  # < 2^61 + 2^8 + 2^40 < 2^62, no overflow
    contrib = np.where(contrib >= _MERS, contrib - _MERS, contrib)
    contrib = np.where(contrib >= _MERS, contrib - _MERS, contrib)
    # pad into (n, pow2) and fold halves with one conditional subtract per
    # level (a+b < 2p fits uint64); memory bounded by map_batches batch_size
    width = 1 << int(maxlen - 1).bit_length() if maxlen > 1 else 1
    M = np.zeros((n, width), np.uint64)
    M[np.repeat(np.arange(n), lens), pos_in_doc] = contrib
    w = width
    while w > 1:
        h = w // 2
        s = M[:, :h] + M[:, h:w]
        M[:, :h] = np.where(s >= _MERS, s - _MERS, s)
        w = h
    return M[:, 0].astype(np.int64)


class Fingerprint:
    """Document fingerprinting (two deterministic fingerprints per doc):

    - ``fingerprint``: 60-bit int64 = first 15 hex chars of sha256(text)
      (hashlib's C kernel per row). SQL-mirrorable:
      ``CAST(('0x' || substring(sha256(text),1,15)) AS BIGINT)``.
    - ``rolling61``: the 61-bit polynomial rolling hash (base 257 mod
      2^61-1), vectorized via :func:`rolling_hash_61`.
    """

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        texts = df["text"].fillna("").tolist()
        df = df.copy()
        df["fingerprint"] = np.array(
            [
                int(hashlib.sha256(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in texts
            ],
            np.int64,
        )
        df["rolling61"] = rolling_hash_61(texts)
        return df


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(
        partial(call_singleton, Fingerprint),
        batch_format="pandas",
        batch_size=1024,
    )


class _TermDocFreqPartial:
    """Per-batch combiner for document frequency: explode lower-cased
    single-space tokens, dedup per document (each doc lives in exactly one
    batch, so per-batch distinct is exact), emit (term, partial count).
    Shrinks each batch to at most its distinct-term cardinality before the
    one global shuffle — the pre-aggregate pattern that keeps the groupby
    cheap at corpus scale."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        pairs = pd.DataFrame(
            {"d": ex.index.to_numpy(), "term": ex.to_numpy()}
        ).drop_duplicates()
        counts = pairs.groupby("term", sort=False).size()
        return pd.DataFrame(
            {
                "term": counts.index.to_numpy(dtype=object),
                "df_partial": counts.to_numpy(np.int64),
            }
        )


def term_doc_freq(docs: ray.data.Dataset, top_n: int = 100) -> ray.data.Dataset:
    """Corpus vocabulary stats: top-`top_n` terms by document frequency
    (stopword discovery / vocabulary pruning for curation). One combiner
    map, one groupby over (term) — partial counts only, never the exploded
    pairs — then a sort+limit over the vocabulary-sized aggregate.
    Tokenization is lower() + split on a single space, mirroring the SQL
    ``string_split(lower(text), ' ')`` oracle exactly."""
    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(
            partial(call_singleton, _TermDocFreqPartial), batch_format="pandas"
        )
        .groupby("term")
        .aggregate(Sum("df_partial", alias_name="df"))
    )
    return agg.sort(["df", "term"], descending=[True, False]).limit(top_n)


class _TermTfPartial:
    """Per-batch TOTAL term-frequency combiner (Zipf head): same
    tokenization as _TermDocFreqPartial but counting every occurrence."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        counts = ex.groupby(ex.to_numpy(), sort=False).size()
        return pd.DataFrame(
            {
                "term": counts.index.to_numpy(dtype=object),
                "tf_partial": counts.to_numpy(np.int64),
            }
        )


def term_total_freq(docs: ray.data.Dataset, top_n: int = 100) -> ray.data.Dataset:
    """Zipf head of the corpus: top-`top_n` terms by TOTAL occurrence
    count — the first plot of any corpus-statistics report (and the
    frequency table BPE/vocab construction starts from). Same combiner
    shape as term_doc_freq: per-batch value counts shrink each block to
    its distinct-term cardinality before the one term-key groupby."""
    from ray.data.aggregate import Sum

    agg = (
        docs.map_batches(
            partial(call_singleton, _TermTfPartial), batch_format="pandas"
        )
        .groupby("term")
        .aggregate(Sum("tf_partial", alias_name="tf"))
    )
    return agg.sort(["tf", "term"], descending=[True, False]).limit(top_n)


def tfidf_top_terms(
    docs: ray.data.Dataset,
    top_k: int = 3,
    max_vocab: int = 5_000_000,
) -> ray.data.Dataset:
    """Per-document keyword extraction: the top-`top_k` terms of each doc
    by an INTEGER-exact tf-idf surrogate, score_micro = (tf * N * 10^6) //
    df (monotone in tf * N/df; floor-div keeps both sides in int64, no
    float parity surface at all). Ties break (score desc, term asc).

    Two passes: the term_doc_freq combiner aggregate yields the vocabulary
    df map, which is broadcast (`ray.put` once) — the right shape for
    curated/stopword-scale vocabularies; corpora whose vocabulary exceeds
    `max_vocab` get a clear error pointing at a term-keyed co-partitioned
    join instead of a silent driver OOM. Pass two scores each doc's terms
    against the broadcast map, vectorized per batch."""
    import ray as _ray

    n_docs = docs.count()

    def df_tag(df: pd.DataFrame) -> pd.DataFrame:
        g = call_singleton(_TermDocFreqPartial, df)
        # int partition key: the wide op is a P-group hashed combine, not
        # a vocabulary-scale raw-string sort-aggregate (the BASELINE.md
        # stall pattern)
        h = pd.util.hash_array(g["term"].to_numpy(dtype=object))
        g["__p"] = (h % 32).astype(np.int32)
        return g

    def df_fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("term", sort=False)["df_partial"]
            .sum()
            .reset_index(name="df")
        )

    vdf = (
        docs.map_batches(df_tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(df_fold, batch_format="pandas")
        .to_pandas()
    )
    if len(vdf) > max_vocab:
        raise ValueError(
            f"vocabulary exceeds max_vocab={max_vocab}; use a term-keyed "
            "co-partitioned join for the df attach instead of the broadcast"
        )
    df_ref = _ray.put(pd.Series(vdf["df"].to_numpy(np.int64), index=vdf["term"]))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dmap = _ray.get(df_ref)
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        pairs = pd.DataFrame({"d": ex.index.to_numpy(), "term": ex.to_numpy()})
        tf = pairs.groupby(["d", "term"], sort=False).size().reset_index(name="tf")
        dfv = tf["term"].map(dmap).to_numpy(np.int64)
        tf["score_micro"] = (
            tf["tf"].to_numpy(np.int64) * np.int64(n_docs) * np.int64(1_000_000)
        ) // dfv
        tf = tf.sort_values(
            ["d", "score_micro", "term"], ascending=[True, False, True]
        )
        top = tf.groupby("d", sort=False).head(top_k).copy()
        top["rank"] = top.groupby("d", sort=False).cumcount() + 1
        doc_ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_ids[
                    df.index.get_indexer(top["d"].to_numpy())
                ],
                "term": top["term"].to_numpy(dtype=object),
                "score_micro": top["score_micro"].to_numpy(np.int64),
                "rank": top["rank"].to_numpy(np.int64),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


class _Bm25TermCounts:
    """Per-batch (doc_id, dl, tf_i...) table for a fixed query-term list:
    one explode + isin over the lower/single-space tokens — the same
    tokenization as term_doc_freq (and its SQL mirror)."""

    def __init__(self, terms: tuple):
        self.terms = list(terms)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        dl = (
            ex.groupby(level=0).size().reindex(df.index, fill_value=0)
            .to_numpy(np.int64)
        )
        out = {"doc_id": df["doc_id"].to_numpy(np.int64), "dl": dl}
        sel = ex[ex.isin(self.terms)]
        for i, t in enumerate(self.terms):
            out[f"tf{i}"] = (
                sel[sel == t].groupby(level=0).size()
                .reindex(df.index, fill_value=0).to_numpy(np.int64)
            )
        return pd.DataFrame(out)


def bm25_search(
    docs: ray.data.Dataset,
    terms: tuple,
    top_n: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """BM25 relevance ranking of the corpus against a fixed term list
    (seed-query retrieval for curation): top-`top_n` docs by
    score = Σ_i idf_i · tf_i(k1+1) / (tf_i + k1(1-b + b·dl/avgdl)).

    Float-parity posture (the oracle technique): every corpus statistic
    (N, Σdl, df_i, tf_i, dl) is an exact integer on both sides; the score
    is ONE fixed left-associated IEEE expression chain over those integers,
    and idf uses math.log — bit-identical to DuckDB's ln (both call the
    same libm; np.log's SIMD path is NOT and is deliberately avoided).
    Ranking is on the raw score; rounding happens only at output.

    One corpus pass (term-count map), a one-row-per-batch stats combiner
    summed on the driver (exact ints, order-free), then a broadcast-scalar
    scoring map + top-n sort of the matching docs only."""
    import math

    base = docs.map_batches(
        _Bm25TermCounts(tuple(terms)), batch_format="pandas"
    ).materialize()  # consumed twice: stats + scoring
    nt = len(terms)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {
            "n": np.array([len(df)], np.int64),
            "sdl": np.array([df["dl"].sum()], np.int64),
        }
        for i in range(nt):
            row[f"df{i}"] = np.array([(df[f"tf{i}"] > 0).sum()], np.int64)
        return pd.DataFrame(row)

    st = base.map_batches(stats_partial, batch_format="pandas").to_pandas().sum()
    n, sdl = int(st["n"]), int(st["sdl"])
    avgdl = float(sdl) / n  # mirrors CAST(sdl AS DOUBLE) / n
    idf = [
        math.log((n - int(st[f"df{i}"]) + 0.5) / (int(st[f"df{i}"]) + 0.5) + 1.0)
        for i in range(nt)
    ]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.int64)
        x = dl / avgdl
        acc = np.zeros(len(df), np.float64)
        for i in range(nt):
            tf = df[f"tf{i}"].to_numpy(np.int64)
            # EXACT mirror of the SQL term expression (same parenthesization)
            s = idf[i] * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * x))
            acc = acc + s
        out = pd.DataFrame({"doc_id": df["doc_id"], "score": acc})
        return out[out["score"] > 0.0]

    ranked = base.map_batches(score, batch_format="pandas")
    return ranked.sort(["score", "doc_id"], descending=[True, False]).limit(top_n)


def rank_fusion(
    docs: ray.data.Dataset,
    terms: tuple,
    top_n: int = 50,
    fuse_n: int = 20,
    k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
) -> "pa.Table":
    """Reciprocal-rank fusion (RRF) of two retrieval systems over the same
    fixed query: BM25 (bm25_search) and raw total query-term frequency.
    Each system contributes floor(1e9 / (k + rank)) for its top-`top_n`
    docs (exact integers — the float 1/(k+r) scaled to integer nanounits
    so fusion is order-free and SQL-mirrorable); fused score is the sum,
    output the top-`fuse_n` docs by (rrf_e9 DESC, doc_id).

    Scale shape: both rankings are distributed passes that each return
    <= top_n rows (BM25's stats-combiner + broadcast-scalar scorer; the
    tf ranking is a vectorized per-batch fold into sort+limit); the fuse
    step touches only 2 * top_n rows on the driver."""
    import pyarrow as pa

    a = bm25_search(docs, terms, top_n=top_n, k1=k1, b=b).to_pandas()
    nt = len(terms)
    base = docs.map_batches(_Bm25TermCounts(tuple(terms)), batch_format="pandas")

    def total(df: pd.DataFrame) -> pd.DataFrame:
        tft = df[[f"tf{i}" for i in range(nt)]].to_numpy(np.int64).sum(axis=1)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "tft": tft})
        return out[out["tft"] > 0]

    bt = (
        base.map_batches(total, batch_format="pandas")
        .sort(["tft", "doc_id"], descending=[True, False])
        .limit(top_n)
        .to_pandas()
    )
    fused: dict[int, int] = {}
    for ranking in (a["doc_id"].to_numpy(np.int64), bt["doc_id"].to_numpy(np.int64)):
        for r, d in enumerate(ranking, 1):
            fused[int(d)] = fused.get(int(d), 0) + 10**9 // (k + r)
    order = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:fuse_n]
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in order], pa.int64()),
            "rrf_e9": pa.array([s for _, s in order], pa.int64()),
        }
    )


class _LangTokenHistPartial:
    """Per-batch (lang, ws_tokens) histogram — whitespace token counts
    collapse to a tiny key space, so the global shuffle moves histograms,
    not documents."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ws = df["text"].fillna("").str.split().str.len().fillna(0).astype(np.int64)
        counts = (
            pd.DataFrame({"lang": df["lang"].to_numpy(), "ws_tokens": ws.to_numpy()})
            .groupby(["lang", "ws_tokens"], sort=False)
            .size()
        )
        out = counts.index.to_frame(index=False)
        out["cnt"] = counts.to_numpy(np.int64)
        return out


def lang_token_percentiles(
    docs: ray.data.Dataset, quantiles: dict[str, float] | None = None
) -> ray.data.Dataset:
    """Exact per-language token-count percentiles (distribution stats for
    corpus curation): the percentile-q value is the element at 1-based rank
    ``ceil(q * n)`` of the ascending token counts — computed from the
    aggregated histogram (cumulative counts + searchsorted), never from a
    global sort of the documents. ``ceil(q * n)`` is evaluated in float64
    on both sides (SQL literal ``0.9e0``), so rank parity is exact."""
    from ray.data.aggregate import Sum

    qs = quantiles or {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    hist = (
        docs.map_batches(
            partial(call_singleton, _LangTokenHistPartial), batch_format="pandas"
        )
        .groupby(["lang", "ws_tokens"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ws_tokens")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        vals = g["ws_tokens"].to_numpy(np.int64)
        n = int(cum[-1])
        out = {"lang": [g["lang"].iloc[0]], "n_docs": np.array([n], np.int64)}
        for name, q in qs.items():
            rank = int(np.ceil(q * n))  # float64, mirrors SQL ceil(qe0 * n)
            out[name] = np.array([vals[np.searchsorted(cum, rank)]], np.int64)
        return pd.DataFrame(out)

    return hist.groupby("lang").map_groups(pick, batch_format="pandas")


class _TermCountPartial:
    """Per-batch combiner for RAW term counts (not doc frequency): explode
    lower/single-space tokens and emit (term, partial count) — at most the
    batch's distinct-term cardinality crosses the one global shuffle."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        counts = ex.groupby(ex.to_numpy(), sort=False).size()
        return pd.DataFrame(
            {
                "term": counts.index.to_numpy(dtype=object),
                "c_partial": counts.to_numpy(np.int64),
            }
        )


def unigram_logprob(
    docs: ray.data.Dataset, top_v: int = 5000
) -> ray.data.Dataset:
    """Per-document unigram language-model score (corpus-quality signal):
    logprob_e9 = Σ_tokens floor(ln(p_t) * 1e9 + 0.5) as int64 nanonats,
    p_t = c_t / C for the top-`top_v` vocabulary (c = corpus term count,
    C = total token count) and 1/C for out-of-vocabulary tokens.

    Float-parity posture: c and C are exact integers, c/C is one correctly
    rounded IEEE divide, ln is math.log (bit-identical to DuckDB's ln —
    same libm; np.log's SIMD path is deliberately avoided), and the
    per-token quantization makes the per-doc sum an order-independent
    int64 — the whole output is integer-exact vs the SQL mirror.

    Scale shape: pass 1 is the term-count combiner + one vocabulary-keyed
    groupby; the top-V cut is a sort+limit over the vocabulary-sized
    aggregate; only the V-row (term, qln) table is broadcast (ray.put
    once); pass 2 is a stateless vectorized lookup (searchsorted over the
    sorted broadcast vocab) — no shuffle touches the corpus rows."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(
            partial(call_singleton, _TermCountPartial), batch_format="pandas"
        )
        .groupby("term")
        .aggregate(Sum("c_partial", alias_name="c"))
        .materialize()  # consumed twice: total + top-V cut
    )
    total = counts.aggregate(Sum("c", alias_name="C"))["C"]
    top = (
        counts.sort(["c", "term"], descending=[True, False])
        .limit(top_v)
        .to_pandas()
    )
    order = np.argsort(top["term"].to_numpy(dtype=object), kind="stable")
    terms_sorted = top["term"].to_numpy(dtype=object)[order]
    c_sorted = top["c"].to_numpy(np.int64)[order]
    C = float(total)
    qln = np.array(
        [math.floor(math.log(c / C) * 1e9 + 0.5) for c in c_sorted.tolist()],
        np.int64,
    )
    qln_oov = math.floor(math.log(1.0 / C) * 1e9 + 0.5)
    vocab_ref = _ray.put((terms_sorted, qln))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        terms, q = _ray.get(vocab_ref)
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        tok = ex.to_numpy(dtype=object)
        if len(terms):
            idx = np.minimum(np.searchsorted(terms, tok), len(terms) - 1)
            hit = terms[idx] == tok
            per_tok = np.where(hit, q[idx], qln_oov)
        else:
            per_tok = np.full(len(tok), qln_oov, np.int64)
        s = pd.Series(per_tok, index=ex.index)
        sums = s.groupby(level=0).sum().reindex(df.index, fill_value=0)
        ntok = s.groupby(level=0).size().reindex(df.index, fill_value=0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": ntok.to_numpy(np.int64),
                "logprob_e9": sums.to_numpy(np.int64),
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def _bigram_pairs(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_index, left, right) adjacent-token pairs per document (empty
    tokens dropped BEFORE pairing — the SQL mirror filters then pairs)."""
    toks = df["text"].fillna("").str.lower().str.split(" ")
    ex = toks.explode()
    ex = ex[ex.notna() & (ex != "")]
    idx = ex.index.to_numpy()
    vals = ex.to_numpy(dtype=object)
    if len(vals) < 2:
        e = np.empty(0, dtype=object)
        return np.empty(0, np.int64), e, e
    same = idx[1:] == idx[:-1]
    return idx[1:][same], vals[:-1][same], vals[1:][same]


def bigram_logprob(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document bigram language-model score in integer nanonats:
    logprob_e9 = Σ_bigrams floor(ln(c(a,b)/c_left(a)) * 1e9 + 0.5), where
    c(a,b) is the corpus bigram count and c_left(a) = Σ_b c(a,b). Every
    document bigram is in-vocabulary by construction (the table is the
    corpus's own counts), so no OOV branch exists; documents with < 2
    tokens score (0, 0).

    Same float-parity recipe as unigram_logprob (exact integer counts, one
    IEEE divide, math.log == DuckDB ln, per-bigram int64 quantization →
    order-independent sums). Scale shape: pass 1 is a batch-local pair
    combiner + ONE (a, b)-keyed groupby over the bigram vocabulary (corpus
    rows never shuffle); the scored lookup table is `ray.put` once. At a
    vocabulary too big to broadcast, apply unigram_logprob's top-V cut
    (score tail bigrams with a floor probability) — documented tradeoff."""
    import math

    import ray as _ray

    NPARTS = 32

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, a, b = _bigram_pairs(df)
        if not len(a):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "c_partial": pd.Series([], dtype=np.int64),
                 "__p": pd.Series([], dtype=np.int32)}
            )
        g = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="c_partial")
        )
        # int partition key from the pair hash: all partials of one bigram
        # land in one partition, so the fold below is exact and the wide op
        # is a P-group hashed combine, never a vocab-scale raw-string
        # sort-aggregate (the BASELINE.md stall pattern)
        h = pd.util.hash_array(
            (g["a"] + "\x1f" + g["b"]).to_numpy(dtype=object)
        )
        g["__p"] = (h % NPARTS).astype(np.int32)
        return g

    def pair_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["a", "b"], sort=False)["c_partial"]
            .sum()
            .reset_index(name="c")
        )
        return g

    counts = (
        docs.map_batches(pair_partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(pair_fold, batch_format="pandas")
        .to_pandas()
    )
    if len(counts):
        left = counts.groupby("a")["c"].transform("sum").to_numpy(np.int64)
        cab = counts["c"].to_numpy(np.int64)
        qln = np.array(
            [
                math.floor(math.log(float(x) / float(y)) * 1e9 + 0.5)
                for x, y in zip(cab.tolist(), left.tolist())
            ],
            np.int64,
        )
        key = (counts["a"] + "\x1f" + counts["b"]).to_numpy(dtype=object)
        order = np.argsort(key, kind="stable")
        vocab_ref = _ray.put((key[order], qln[order]))
    else:
        vocab_ref = _ray.put((np.empty(0, object), np.empty(0, np.int64)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        keys, q = _ray.get(vocab_ref)
        di, a, b = _bigram_pairs(df)
        out_n = np.zeros(len(df), np.int64)
        out_lp = np.zeros(len(df), np.int64)
        if len(a):
            k = (pd.Series(a) + "\x1f" + pd.Series(b)).to_numpy(dtype=object)
            idx = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
            assert (keys[idx] == k).all(), "bigram missing from corpus table"
            per = q[idx]
            s = pd.Series(per, index=di)
            sums = s.groupby(level=0).sum()
            ns = s.groupby(level=0).size()
            pos = {ix: i for i, ix in enumerate(df.index)}
            for ix, v in sums.items():
                out_lp[pos[ix]] = v
            for ix, v in ns.items():
                out_n[pos[ix]] = v
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_bigrams": out_n,
                "logprob_e9": out_lp,
            }
        )

    return docs.map_batches(score, batch_format="pandas")


def chunk_documents(
    docs: ray.data.Dataset, chunk_tokens: int = 32
) -> ray.data.Dataset:
    """Context-window preparation: split each document into consecutive
    `chunk_tokens`-token chunks (non-overlapping; the training-data
    "pack/window" step). Stateless map — no shuffle at any scale; output
    rows are (doc_id, chunk_id, n_tokens, chunk_text).

    Tokenization is the house single-space split (empties dropped),
    mirrored by the SQL list_filter(string_split(...)) oracle with
    1-based inclusive list slicing. The explode/regroup is vectorized;
    only the final per-chunk ' '.join is a Python call (amortized 1/32 of
    token rows, same posture as the decode loops)."""

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        if not len(ex):
            return pd.DataFrame(
                {
                    "doc_id": np.empty(0, np.int64),
                    "chunk_id": np.empty(0, np.int64),
                    "n_tokens": np.empty(0, np.int64),
                    "chunk_text": np.empty(0, object),
                }
            )
        pos = ex.groupby(level=0).cumcount().to_numpy(np.int64)
        g = pd.DataFrame(
            {
                "d": ex.index.to_numpy(),
                "ck": pos // chunk_tokens,
                "tok": ex.to_numpy(dtype=object),
            }
        )
        gb = g.groupby(["d", "ck"], sort=True)
        joined = gb["tok"].agg(" ".join)
        counts = gb.size()
        d_idx = joined.index.get_level_values(0).to_numpy()
        doc_ids = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_ids[df.index.get_indexer(d_idx)],
                "chunk_id": joined.index.get_level_values(1).to_numpy(np.int64),
                "n_tokens": counts.to_numpy(np.int64),
                "chunk_text": joined.to_numpy(dtype=object),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pandas"
    )


def pack_sequences(
    docs: ray.data.Dataset,
    seq_tokens: int = 128,
    bucket_docs: int = 4096,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Training-sequence packing plan: concatenate every document's tokens
    in doc_id order and split the global token stream into fixed
    `seq_tokens`-token sequences; emit one row per (sequence, document)
    piece: (seq_id, doc_id, doc_tok_start, n_toks). Documents cross
    sequence boundaries (the standard pre-training pack — no padding
    waste), unlike :func:`chunk_documents` which restarts per document.

    Scale shape: a distributed prefix sum. Pass 1 computes per-doc token
    counts (vectorized explode/reindex) and folds them into contiguous
    doc_id buckets (`bucket_docs` docs per bucket) — the driver holds ONE
    row per bucket (corpus_docs / bucket_docs, millions at 100 TB, never
    per-doc state), prefix-sums the bucket bases exactly in int64, and
    broadcasts them via ray.put. Pass 2 is ONE hash(bucket) shuffle; the
    kernel handles its complete buckets vectorized (segmented cumsum +
    arange fan-out, no per-doc Python). The small counts table is
    materialized once so the two consumers don't recompute tokenization.

    All arithmetic is integer, so the SQL mirror (window SUM + unnested
    generate_series) is bit-exact by construction."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split(" ")
        ex = toks.explode()
        nonempty = ex[ex.notna() & (ex != "")]
        nt = (
            nonempty.groupby(level=0)
            .size()
            .reindex(df.index, fill_value=0)
            .to_numpy(np.int64)
        )
        d = df["doc_id"].to_numpy(np.int64)
        return pd.DataFrame({"doc_id": d, "nt": nt, "bucket": d // bucket_docs})

    cnt = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(counts, batch_format="pandas")
        .materialize()  # doc_id/nt/bucket only — far smaller than the corpus
    )

    totals = (
        cnt.groupby("bucket").sum("nt").to_pandas()
    )  # one row per bucket by construction
    totals = totals.sort_values("bucket").reset_index(drop=True)
    buckets = totals["bucket"].to_numpy(np.int64)
    tt = totals["sum(nt)"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(tt)[:-1]]).astype(np.int64)
    base_ref = ray.put((buckets, bases))

    from ..functions.hashing import part_of

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__p"] = part_of(df["bucket"].to_numpy(np.int64), num_parts)
        return df

    L = seq_tokens

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "seq_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "doc_tok_start": pd.Series([], dtype=np.int64),
                "n_toks": pd.Series([], dtype=np.int64),
            }
        )
        if not len(df):
            return empty
        bkeys, bbases = ray.get(base_ref)
        b = df["bucket"].to_numpy(np.int64)
        d = df["doc_id"].to_numpy(np.int64)
        nt = df["nt"].to_numpy(np.int64)
        order = np.lexsort((d, b))
        b, d, nt = b[order], d[order], nt[order]
        # segmented exclusive cumsum within each (complete) bucket
        cum = np.concatenate([[0], np.cumsum(nt)[:-1]])
        new_b = np.concatenate([[True], b[1:] != b[:-1]])
        seg_start = cum[np.flatnonzero(new_b)][np.cumsum(new_b) - 1]
        base = bbases[np.searchsorted(bkeys, b)]
        s = base + (cum - seg_start)
        keep = nt > 0
        s, d, nt = s[keep], d[keep], nt[keep]
        if not len(d):
            return empty
        first = s // L
        last = (s + nt - 1) // L
        n_pieces = (last - first + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(d)), n_pieces)
        # per-piece k = first[doc] + (position within the doc's fan-out)
        pos = np.arange(len(rep), dtype=np.int64)
        piece0 = np.concatenate([[0], np.cumsum(n_pieces)[:-1]])
        k = first[rep] + (pos - piece0[rep])
        lo = np.maximum(k * L, s[rep])
        hi = np.minimum((k + 1) * L, (s + nt)[rep])
        return pd.DataFrame(
            {
                "seq_id": k,
                "doc_id": d[rep],
                "doc_tok_start": lo - s[rep],
                "n_toks": hi - lo,
            }
        )

    return (
        cnt.map_batches(tag, batch_format="pandas")
        .groupby("__p")
        .map_groups(kernel, batch_format="pandas")
    )


def bpe_pair_counts(docs: ray.data.Dataset, top_k: int = 20) -> ray.data.Dataset:
    """Tokenizer-induction statistics (the first BPE merge step): corpus
    counts of ADJACENT CHARACTER PAIRS within whitespace tokens; returns
    the top_k pairs by (count DESC, codepoint ASC, codepoint ASC) as
    (pair, a, b, cnt) — a/b are the integer code points, the exact
    SQL-mirrorable tie-break.

    Vectorized end to end: each batch is joined into one NUL-separated
    blob, decoded to a code-point array via the fixed-width utf-32
    buffer (no per-char Python), pair keys packed as a*2^21+b (code
    points < 2^21), counted with np.unique. ONE pair-key combiner shuffle
    folds exact int64 partials; the top-k cut runs on the bounded
    |observed-pairs| table."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        blob = "\x00".join(df["text"].fillna(""))
        cp = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        if len(cp) < 2:
            return pd.DataFrame(
                {"key": pd.Series([], dtype=np.int64),
                 "cnt": pd.Series([], dtype=np.int64)}
            )
        a, b = cp[:-1], cp[1:]
        # pairs live INSIDE tokens: neither side may be the doc separator
        # (NUL) or the tokenizer's split char (space)
        ok = (a != 0) & (b != 0) & (a != 32) & (b != 32)
        key = a[ok] * np.int64(1 << 21) + b[ok]
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"key": uk, "cnt": cnt.astype(np.int64)})

    agg = (
        docs.select_columns(["text"])
        .map_batches(partials, batch_format="pandas")
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # bounded by the observed-pair vocabulary
    )
    k = agg["key"].to_numpy(np.int64)
    c = agg["cnt"].to_numpy(np.int64)
    a, b = k >> 21, k & ((1 << 21) - 1)
    order = np.lexsort((b, a, -c))[:top_k]
    a, b, c = a[order], b[order], c[order]
    return ray.data.from_arrow(
        pa.table(
            {
                "pair": pa.array(
                    [chr(x) + chr(y) for x, y in zip(a.tolist(), b.tolist())],
                    pa.string(),
                ),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "cnt": pa.array(c, pa.int64()),
            }
        )
    )


def oov_rate(docs: ray.data.Dataset, top_v: int = 20) -> ray.data.Dataset:
    """Vocabulary-coverage signal (tokenizer-fit check): per document, the
    count and fraction of tokens OUTSIDE the corpus's top-`top_v`
    vocabulary (counts DESC, term ASC — the unigram_logprob cut). Returns
    (doc_id, n_tokens, n_oov, oov_rate) with oov_rate one IEEE divide of
    exact integers, rounded to 6.

    Scale shape: identical to unigram_logprob — term-count combiner + one
    vocabulary groupby, the V-row vocab broadcast once, then a stateless
    vectorized searchsorted membership pass (no corpus shuffle)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(
            partial(call_singleton, _TermCountPartial), batch_format="pandas"
        )
        .groupby("term")
        .aggregate(Sum("c_partial", alias_name="c"))
    )
    top = (
        counts.sort(["c", "term"], descending=[True, False])
        .limit(top_v)
        .to_pandas()
    )
    terms_sorted = np.sort(top["term"].to_numpy(dtype=object))
    vocab_ref = _ray.put(terms_sorted)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        terms = _ray.get(vocab_ref)
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        tok = ex.to_numpy(dtype=object)
        if len(terms) and len(tok):
            idx = np.minimum(np.searchsorted(terms, tok), len(terms) - 1)
            oov = terms[idx] != tok
        else:
            oov = np.ones(len(tok), bool)
        s = pd.Series(oov, index=ex.index)
        n_tok = s.groupby(level=0).size().reindex(df.index, fill_value=0)
        n_oov = s.groupby(level=0).sum().reindex(df.index, fill_value=0)
        nt = n_tok.to_numpy(np.int64)
        no = n_oov.to_numpy(np.int64)
        rate = round_half_away(
            no.astype(np.float64) / np.maximum(nt, 1), 6
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": nt,
                "n_oov": no,
                "oov_rate": rate,
            }
        )

    return docs.map_batches(score, batch_format="pandas")


class _TermFirstDocPartial:
    """Per-batch combiner for vocabulary growth: per distinct term, the
    minimum doc_id that contains it within the batch. Shrinks each block
    to its distinct-term cardinality before the one term-key shuffle."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        doc = df["doc_id"].reindex(ex.index).to_numpy(np.int64)
        m = ex.notna().to_numpy() & (ex != "").to_numpy()
        firsts = (
            pd.DataFrame({"term": ex.to_numpy()[m], "d": doc[m]})
            .groupby("term", sort=False)["d"]
            .min()
        )
        return pd.DataFrame(
            {
                "term": firsts.index.to_numpy(dtype=object),
                "first_partial": firsts.to_numpy(np.int64),
            }
        )


def vocab_growth(
    docs: ray.data.Dataset, bucket_width: int = 1000
) -> "pa.Table":
    """Heaps-law vocabulary-growth curve: number of NEVER-SEEN-BEFORE
    terms introduced per doc_id bucket, plus the running cumulative
    vocabulary size (the curve whose slope says when a corpus stops
    yielding new vocabulary — a standard curation diagnostic).

    Scale shape: a term's first occurrence is min(doc_id) — an
    order-independent, combinable aggregate — so the stream never needs
    sequential scanning: per-block (term -> min doc) partials, ONE
    vocabulary-sized groupby-min shuffle, then a bucket-count fold to a
    #buckets-row table and one tiny driver-side cumulative sum. All
    integers end-to-end."""
    from ray.data.aggregate import Min

    firsts = (
        docs.map_batches(
            partial(call_singleton, _TermFirstDocPartial),
            batch_format="pandas",
        )
        .groupby("term")
        .aggregate(Min("first_partial", alias_name="first_doc"))
    )

    def bucketize(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        fd = t["first_doc"].to_numpy()
        b = fd // bucket_width
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {"bucket": ub.astype(np.int64), "c": cnt.astype(np.int64)}
        )

    from ray.data.aggregate import Sum

    buckets = (
        firsts.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="new_terms"))
        .sort("bucket")
        .to_pandas()
    )
    import pyarrow as pa

    buckets["cum_vocab"] = buckets["new_terms"].cumsum().astype(np.int64)
    buckets["new_terms"] = buckets["new_terms"].astype(np.int64)
    return pa.Table.from_pandas(buckets, preserve_index=False)


def char_entropy(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document Shannon entropy of the character distribution — the
    binary-vs-text / compressed-blob detector a code-corpus ingest runs
    before any text stage (natural text sits near 4.2 bits, random or
    compressed bytes near 8). Emits (doc_id, n_chars, n_distinct,
    entropy) with entropy in nats.

    Bit-exact decomposition (the user_entropy / bm25 parity chain):
    H = ln(n) - S / (1e9 * n) where S = sum_c count_c *
    floor(1e9 * ln(count_c)) is an exact int64 sum; ln is evaluated once
    per DISTINCT count value. Zero shuffles — each document is one row,
    every distribution is batch-local; the batch's texts are joined into
    ONE byte buffer and counted via a single bincount over
    doc_index * 256 + byte, no per-document Python loop."""
    import math

    import pyarrow as pa

    def kernel(t: "pa.Table") -> "pa.Table":
        doc_id = t["doc_id"].to_numpy().astype(np.int64, copy=False)
        texts = t["text"].to_pylist()
        n_docs = len(texts)
        if n_docs == 0:
            z = np.array([], np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(z),
                    "n_chars": pa.array(z),
                    "n_distinct": pa.array(z),
                    "entropy": pa.array(np.array([], np.float64)),
                }
            )
        blob = "".join(texts).encode("utf-8", "surrogatepass")
        lens = np.array(
            [len(s.encode("utf-8", "surrogatepass")) for s in texts], np.int64
        )
        b = np.frombuffer(blob, np.uint8).astype(np.int64)
        doc_of = np.repeat(np.arange(n_docs), lens)
        comp = doc_of * 256 + b
        cu, cc = np.unique(comp, return_counts=True)
        d = cu // 256
        vals = np.unique(cc)
        ln_e9 = np.array(
            [math.floor(1e9 * math.log(int(v))) for v in vals], np.int64
        )
        term = cc.astype(np.int64) * ln_e9[np.searchsorted(vals, cc)]
        n = np.bincount(d, weights=cc, minlength=n_docs).astype(np.int64)
        nd = np.bincount(d, minlength=n_docs).astype(np.int64)
        s = np.bincount(d, weights=term, minlength=n_docs).astype(np.int64)
        safe_n = np.maximum(n, 1)
        ent = round_half_away(
            np.log(safe_n.astype(np.float64)) - s / (1e9 * safe_n), 6
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id),
                "n_chars": pa.array(n),
                "n_distinct": pa.array(nd),
                "entropy": pa.array(np.where(n > 0, ent, 0.0)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )


WINNOW_K = 8  # k-gram length in bytes
WINNOW_W = 4  # winnowing window (guarantee: any match >= k+w-1 bytes shares
#               a selected fingerprint — Schleimer/Wilkerson/Aiken, MOSS)
_WINNOW_POS_BITS = 10  # documents are bounded at 1024 bytes (chunk first)


def _winnow_pows(k: int) -> list[int]:
    p, out, acc = int(_MERS), [], 1
    for _ in range(k):
        out.append(acc)
        acc = (acc * 257) % p
    return list(reversed(out))  # 257^(k-1-j) for j = 0..k-1


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = WINNOW_K, w: int = WINNOW_W
) -> ray.data.Dataset:
    """MOSS winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD
    2003): every byte k-gram is hashed with the 61-bit polynomial rolling
    family (mod 2^61-1, base 257 — the fingerprints op's hash), and each
    length-w window of consecutive gram hashes selects its minimum (ties
    broken by earliest position via packing position into the low bits).
    The selected (doc_id, pos, fp) rows are the clone-detection index: any
    shared substring of length >= k+w-1 is guaranteed to share a selected
    fingerprint. Documents beyond 2^10 bytes raise — winnow bounded
    chunks (chunk_documents) at scale, keeping the position packing and
    the SQL mirror fixed.

    Scale shape: zero shuffles — each document is one row, so gram
    hashing (k vectorized Mersenne-split modmul terms over the batch's
    flattened bytes) and the sliding-window min (w-1 shifted
    np.minimum passes over a docs x max_grams matrix) are batch-local;
    dedup of selected minima is one lexsort run-scan. All arithmetic is
    uint64/HUGEINT-mirrorable: fp = h mod 2^52, packed = fp * 1024 + pos."""

    pows = np.array(_winnow_pows(k), np.uint64)
    FPMOD = np.uint64(1 << 52)
    POSW = np.uint64(1 << _WINNOW_POS_BITS)

    def kernel(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        doc_id = t["doc_id"].to_numpy().astype(np.int64, copy=False)
        enc = [s.encode("utf-8") for s in t["text"].to_pylist()]
        lens = np.array([len(b) for b in enc], np.int64)
        if len(lens) and int(lens.max()) >= (1 << _WINNOW_POS_BITS):
            raise ValueError(
                "winnow_fingerprints packs byte positions into "
                f"{_WINNOW_POS_BITS} bits; chunk documents over "
                f"{(1 << _WINNOW_POS_BITS) - 1} bytes first (chunk_documents)"
            )
        n_docs = len(lens)
        gd = np.maximum(lens - k + 1, 0)
        totg = int(gd.sum())
        empty = pa.table(
            {
                "doc_id": pa.array(np.array([], np.int64)),
                "pos": pa.array(np.array([], np.int64)),
                "fp": pa.array(np.array([], np.int64)),
            }
        )
        if totg == 0:
            return empty
        flat = np.frombuffer(b"".join(enc), np.uint8).astype(np.uint64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        doc_of = np.repeat(np.arange(n_docs), gd)
        p_in_doc = np.arange(totg, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(gd)[:-1]]), gd
        )
        base = starts[doc_of] + p_in_doc
        h = np.zeros(totg, np.uint64)
        mers = np.uint64(_MERS)
        for j in range(k):
            pw = pows[j]
            pw_hi = pw >> np.uint64(32)
            pw_lo = pw & np.uint64(0xFFFFFFFF)
            b = flat[base + j]
            x = b * pw_hi
            hi_part = (x >> np.uint64(29)) + (
                (x & np.uint64((1 << 29) - 1)) << np.uint64(32)
            )
            contrib = hi_part + b * pw_lo
            contrib = np.where(contrib >= mers, contrib - mers, contrib)
            contrib = np.where(contrib >= mers, contrib - mers, contrib)
            h = h + contrib  # < 2*p < 2^62: one conditional subtract
            h = np.where(h >= mers, h - mers, h)
        packed = ((h % FPMOD) * POSW + p_in_doc.astype(np.uint64)).astype(
            np.int64
        )
        maxg = int(gd.max())
        INF = np.int64((1 << 62))
        M = np.full((n_docs, maxg), INF, np.int64)
        M[doc_of, p_in_doc] = packed
        W = M.copy()
        for sh in range(1, w):
            if maxg - sh > 0:
                np.minimum(W[:, : maxg - sh], M[:, sh:], out=W[:, : maxg - sh])
        srow, scol = np.nonzero(W < INF)
        valid = scol <= (gd[srow] - w)
        srow, m = srow[valid], W[srow[valid], scol[valid]]
        order = np.lexsort((m, srow))
        srow, m = srow[order], m[order]
        keep = np.ones(len(m), bool)
        if len(m) > 1:
            keep[1:] = (srow[1:] != srow[:-1]) | (m[1:] != m[:-1])
        srow, m = srow[keep], m[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc_id[srow]),
                "pos": pa.array(m % np.int64(1 << _WINNOW_POS_BITS)),
                "fp": pa.array(m >> np.int64(_WINNOW_POS_BITS)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )


def doc_keywords(
    docs: ray.data.Dataset,
    top_k: int = 3,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Per-document keyword extraction: the top_k terms of each doc by
    integer tf*idf — score = tf * floor(1e9 * ln(N/df)) (idf in int64
    nanonats via the libm-parity chain: one double divide, one math.log,
    one multiply, floor), ties to the lexicographically smaller term.
    The per-doc counterpart of the corpus-level tfidf_topterms.

    Scale shape: per-batch (doc, term, tf) fold (docs are row-local, so
    per-doc tf is complete in one pass) -> ONE shuffle on hash(term) % P
    where the partition computes df over its complete term groups and
    merges scores back onto its rows (string-exact pandas merge inside
    the partition — never a cross-partition string join) -> ONE
    hash(doc) % P fold takes each doc's top_k. math.log runs once per
    DISTINCT term per partition (vocabulary-scale, the bm25 pattern),
    never per row."""
    import math

    import pandas as pd

    from ..functions.hashing import part_of

    n_docs = docs.count()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        g = (
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64)[
                        ex.index.to_numpy()
                    ],
                    "term": ex.to_numpy(object),
                }
            )
            .groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["tf"] = g["tf"].astype(np.int64)
        h = pd.util.hash_array(g["term"].to_numpy(object)).astype(np.uint64)
        g["__p"] = part_of(h, num_parts).astype(np.int32)
        return g

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("term", sort=False)["doc_id"].size()
        idf = {
            t: math.floor(math.log(float(n_docs) / int(c)) * 1e9)
            for t, c in dfreq.items()
        }
        out = df[["doc_id", "term", "tf"]].copy()
        out["score"] = (
            out["tf"].to_numpy(np.int64)
            * np.fromiter((idf[t] for t in out["term"]), np.int64,
                          count=len(out))
        )
        out["__p2"] = part_of(
            out["doc_id"].to_numpy(np.int64), num_parts
        ).astype(np.int32)
        return out

    def top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="stable")
        g = df.groupby("doc_id", sort=False).head(top_k)
        return g[["doc_id", "term", "tf", "score"]].reset_index(drop=True)

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pandas", batch_size=1024)
        .groupby("__p")
        .map_groups(score, batch_format="pandas")
        .groupby("__p2")
        .map_groups(top, batch_format="pandas")
    )


def feature_hashing(
    docs: ray.data.Dataset, dim: int = 256, num_parts: int = 16
) -> ray.data.Dataset:
    """The hashing trick (Weinberger et al., public): map every token to
    a signed bucket of a fixed `dim`-dimensional feature vector without a
    vocabulary pass — j = h % dim, sign = +1 iff bit 8 of the 61-bit
    term hash is clear, feature[j] += sign per occurrence. Output sparse
    rows (doc_id, j, val), zero cells dropped.

    Scale shape: each batch hashes only its DISTINCT terms (one
    vectorized rolling_hash_61 call), folds occurrences to (doc*dim+j)
    partial sums, and ONE int-keyed hashed groupby completes the sum —
    the doc x dim output is the only thing that shuffles."""
    from ..functions.hashing import part_of

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        keep = ex.notna() & (ex != "")
        ex = ex[keep]
        doc = df["doc_id"].reindex(ex.index).to_numpy(np.int64)
        terms = ex.to_numpy(dtype=object)
        if not len(terms):
            return pd.DataFrame(
                {"k": pd.Series([], dtype=np.int64),
                 "v": pd.Series([], dtype=np.int64),
                 "__p": pd.Series([], dtype=np.int32)}
            )
        u, inv = np.unique(terms, return_inverse=True)
        h = rolling_hash_61(list(u)).astype(np.int64)
        j = h % dim
        sgn = np.where((h >> 8) & 1 == 0, 1, -1).astype(np.int64)
        key = doc * dim + j[inv]
        uk, kinv = np.unique(key, return_inverse=True)
        v = np.bincount(kinv, weights=sgn[inv], minlength=len(uk)).astype(
            np.int64
        )
        return pd.DataFrame(
            {"k": uk, "v": v, "__p": part_of(uk, num_parts).astype(np.int32)}
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", sort=False)["v"].sum().reset_index()
        g = g[g["v"] != 0]
        out = pd.DataFrame(
            {
                "doc_id": (g["k"] // dim).astype(np.int64),
                "j": (g["k"] % dim).astype(np.int64),
                "val": g["v"].astype(np.int64),
            }
        )
        return out

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(partials, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
    )


def type_token_ratio(
    docs: ray.data.Dataset, num_parts: int = 16
) -> pd.DataFrame:
    """Per-source lexical diversity: type-token ratio = distinct terms /
    total tokens per source (lower() + single-space split, the corpus'
    standard tokenization) — the vocabulary-richness audit a data-mixing
    pass reads next to the composition stats.

    Scale shape: the per-batch combiner pre-folds to (source, term, n)
    partials (vocabulary x sources sized, never the token stream), keyed
    by hash(source, term) into num_parts partitions so each (source,
    term)'s total lives in exactly ONE partition; the per-partition fold
    emits (source, types_partial, tokens_partial) — num_parts * n_sources
    rows — and the driver sums and divides once. One cheap-key shuffle
    total."""
    import numpy as np

    from ..functions.hashing import part_of, stable_id64
    from ..functions.rounding import round_half_away

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.split(" ")
        ex = toks.explode()
        ex = ex[ex.notna() & (ex != "")]
        src = df["source"].to_numpy(object)[ex.index.to_numpy()]
        g = (
            pd.DataFrame({"source": src, "term": ex.to_numpy(object)})
            .groupby(["source", "term"], sort=False)
            .size()
            .reset_index(name="n")
        )
        kh = stable_id64(
            (g["source"] + "\x00" + g["term"]).to_numpy(object)
        ).astype(np.int64)
        g["__p"] = part_of(kh, num_parts).astype(np.int32)
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        per_key = df.groupby(["source", "term"], sort=False)["n"].sum()
        agg = per_key.reset_index().groupby("source", sort=False)["n"].agg(
            types_p="size", tokens_p="sum"
        )
        return agg.reset_index()

    parts = (
        docs.map_batches(combiner, batch_format="pandas")
        .groupby("__p")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("source", sort=True)
        .agg(n_types=("types_p", "sum"), n_tokens=("tokens_p", "sum"))
        .reset_index()
    )
    out["n_types"] = out["n_types"].astype(np.int64)
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    out["ttr"] = round_half_away(
        out["n_types"].to_numpy(np.float64) / out["n_tokens"].to_numpy(),
        6,
    )
    return out


def ql_search(
    docs: ray.data.Dataset,
    terms: tuple,
    mu: float = 2000.0,
    top_n: int = 50,
) -> ray.data.Dataset:
    """Dirichlet-smoothed query-likelihood retrieval (the LM-based sibling
    of bm25_search): rank docs by P(q|d) = Π_i (tf_i + mu·p_c(t_i)) /
    (dl + mu), kept in PRODUCT form — monotone-equal to the usual
    sum-of-logs score but with no per-document log, so the float chain
    stays a fixed left-associated IEEE expression over exact integer
    corpus stats (the bm25_search parity technique; np.log's SIMD path
    would break ulp parity and is avoided entirely). Emits
    score_e15 = P(q|d) * 1e15 (rounded on output by callers); docs
    matching no query term are filtered.

    Same scale shape as bm25_search: one term-count corpus pass, a
    one-row-per-batch integer stats combiner summed on the driver,
    broadcast-scalar scoring map, top-n sort of matching docs only."""
    base = docs.map_batches(
        _Bm25TermCounts(tuple(terms)), batch_format="pandas"
    ).materialize()  # consumed twice: stats + scoring
    nt = len(terms)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"sdl": np.array([df["dl"].sum()], np.int64)}
        for i in range(nt):
            row[f"ctf{i}"] = np.array([df[f"tf{i}"].sum()], np.int64)
        return pd.DataFrame(row)

    st = base.map_batches(stats_partial, batch_format="pandas").to_pandas().sum()
    sdl = int(st["sdl"])
    pc = [float(int(st[f"ctf{i}"])) / float(sdl) for i in range(nt)]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.int64)
        denom = dl + mu
        acc = None
        hit = np.zeros(len(df), bool)
        for i in range(nt):
            tf = df[f"tf{i}"].to_numpy(np.int64)
            hit |= tf > 0
            # EXACT mirror of the SQL factor (same parenthesization)
            f = (tf + mu * pc[i]) / denom
            acc = f if acc is None else acc * f
        out = pd.DataFrame(
            {"doc_id": df["doc_id"], "score_e15": acc * 1.0e15}
        )
        return out[hit]

    ranked = base.map_batches(score, batch_format="pandas")
    return ranked.sort(
        ["score_e15", "doc_id"], descending=[True, False]
    ).limit(top_n)


KN_DISCOUNT = 0.75


def kneser_ney_logprob(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document interpolated Kneser-Ney bigram score in integer
    nanonats (the smoothing used by KenLM-style corpus-filtering models;
    Kneser & Ney 1995, Chen & Goodman 1999): with fixed discount d = 0.75,

        p(b|a) = max(c(a,b) - d, 0)/c(a)
               + (d * N1+(a,·))/c(a) * (N1+(·,b)/N1+(·,·))

    where N1+(a,·) counts distinct continuations of a, N1+(·,b) distinct
    left-contexts of b (the continuation probability — KN's signature),
    and N1+(·,·) the distinct-bigram total. Scoring the corpus's own
    documents means every bigram is in-table (no unseen branch).

    Float-parity posture (doc_logprob pattern): all counts exact integers;
    the probability is the FIXED IEEE chain t1 + t2*t3 with
    t1 = (c-0.75)/ca, t2 = (0.75*n1f)/ca, t3 = n1r/n1t, parenthesized
    identically in the SQL mirror; ln is math.log (libm parity); per-
    bigram int64 quantization makes per-doc sums order-independent.

    Scale shape identical to bigram_logprob: ONE hashed-pair combiner
    shuffle builds the bigram table (corpus rows never shuffle), the
    continuation counts are vocabulary-scale transforms on that table,
    and the scored (bigram, q) table is ray.put once."""
    import math

    import ray as _ray

    NPARTS = 32

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, a, b = _bigram_pairs(df)
        if not len(a):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object),
                 "c_partial": pd.Series([], dtype=np.int64),
                 "__p": pd.Series([], dtype=np.int32)}
            )
        g = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="c_partial")
        )
        h = pd.util.hash_array(
            (g["a"] + "\x1f" + g["b"]).to_numpy(dtype=object)
        )
        g["__p"] = (h % NPARTS).astype(np.int32)
        return g

    def pair_fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["a", "b"], sort=False)["c_partial"]
            .sum()
            .reset_index(name="c")
        )

    counts = (
        docs.map_batches(pair_partial, batch_format="pandas")
        .groupby("__p")
        .map_groups(pair_fold, batch_format="pandas")
        .to_pandas()
    )
    if len(counts):
        ca = counts.groupby("a")["c"].transform("sum").to_numpy(np.int64)
        n1f = counts.groupby("a")["c"].transform("size").to_numpy(np.int64)
        n1r = counts.groupby("b")["c"].transform("size").to_numpy(np.int64)
        n1t = len(counts)
        cab = counts["c"].to_numpy(np.int64)
        d = KN_DISCOUNT
        qln = np.empty(len(counts), np.int64)
        for i in range(len(counts)):
            t1 = max(float(cab[i]) - d, 0.0) / float(ca[i])
            t2 = (d * float(n1f[i])) / float(ca[i])
            t3 = float(n1r[i]) / float(n1t)
            qln[i] = math.floor(math.log(t1 + t2 * t3) * 1e9 + 0.5)
        key = (counts["a"] + "\x1f" + counts["b"]).to_numpy(dtype=object)
        order = np.argsort(key, kind="stable")
        vocab_ref = _ray.put((key[order], qln[order]))
    else:
        vocab_ref = _ray.put((np.empty(0, object), np.empty(0, np.int64)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        keys, q = _ray.get(vocab_ref)
        di, a, b = _bigram_pairs(df)
        out_n = np.zeros(len(df), np.int64)
        out_lp = np.zeros(len(df), np.int64)
        if len(a):
            k = (pd.Series(a) + "\x1f" + pd.Series(b)).to_numpy(dtype=object)
            idx = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
            if not (keys[idx] == k).all():
                raise ValueError("bigram missing from corpus table")
            per = q[idx]
            s = pd.Series(per, index=di)
            sums = s.groupby(level=0).sum()
            ns = s.groupby(level=0).size()
            pos = {ix: i for i, ix in enumerate(df.index)}
            for ix, v in sums.items():
                out_lp[pos[ix]] = v
            for ix, v in ns.items():
                out_n[pos[ix]] = v
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_bigrams": out_n,
                "kn_logprob_e9": out_lp,
            }
        )

    return docs.map_batches(score, batch_format="pandas")
