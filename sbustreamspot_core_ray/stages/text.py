"""Text-analysis ops over the `documents` table (training-data pipeline).

All stages are vectorized per batch (pandas string kernels / numpy); the
language-ID model and token regex are compiled once per actor. Each op has
a matching ANSI-SQL oracle in ``__ray_entry__.oracle_sql`` — column names
and rounding are mirrored exactly on both sides.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

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
        df["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).round(6)
        df["alpha_ratio"] = (n_alpha / n_chars.clip(lower=1)).round(6)
        df["mean_word_len"] = (n_chars / words).round(6)
        df["stopword_ratio"] = (n_stop / ws_tokens.clip(lower=1)).round(6)
        return df


def quality(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 4))


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
    return docs.map_batches(TokenCount, batch_format="pandas", concurrency=(1, 4))


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
    return docs.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))


class Fingerprint:
    """Document fingerprinting: 64-bit polynomial rolling hash of the full
    text (deterministic; SQL-mirrorable as an iterative hash is not, so the
    query variant fingerprints via hash of text — see dedup.exact)."""

    MOD = (1 << 61) - 1
    BASE = 257

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = np.empty(len(df), np.int64)
        for i, s in enumerate(df["text"].fillna("")):
            h = 0
            for ch in s.encode("utf-8"):
                h = (h * self.BASE + ch) % self.MOD
            out[i] = h
        df = df.copy()
        df["fingerprint"] = out
        return df


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(Fingerprint, batch_format="pandas", concurrency=(1, 4))
