"""Multimodal (image / audio / video) columns as opaque Arrow binary.

Large-scale training-data pipelines carry media as `binary` payload columns
with typed metadata; the engine treats them exactly like any other column —
small batches, actor-pool stages, zero-copy Arrow in/out. The container has
no image/audio codecs, so the *codec* step is a deterministic fake (clearly
marked below: `_FAKE_DECODE = True`; a real deployment swaps `_decode_*` for
PIL / libsndfile / pyav behind the same signature). Everything Ray-side —
schema, batch sizing, actor signatures, output layout — is real and tested.

Media schema::

    media_id: int64
    kind:     string  ('image' | 'audio' | 'video')
    payload:  binary  (opaque encoded bytes)
    width, height, channels: int32   (image/video metadata)
    sample_rate, n_samples:  int32   (audio metadata)
    n_frames: int32                  (video metadata)
    sha256:   string                 (payload integrity, checked at ingest)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
        ("n_frames", pa.int32()),
        ("sha256", pa.string()),
    ]
)

_KINDS = ("image", "audio", "video")

# The decode step is a deterministic FAKE (no codecs in this container).
# Real deployments replace _decode_image/_decode_audio with PIL/soundfile
# equivalents; nothing else in this module changes.
_FAKE_DECODE = True


def media_from_documents(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Derive a deterministic media table from the documents table: payload
    bytes = utf-8 text (opaque to every stage downstream), kind = doc_id % 3,
    metadata derived from payload length. Stands in for `read_parquet` over
    a real media corpus; schema and layout are the production ones."""

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        n = len(ids)
        lens = np.array([len(b) for b in payloads], np.int64)
        kind = [_KINDS[i % 3] for i in ids]
        width = np.maximum(np.sqrt(lens).astype(np.int32), 1)
        return pa.table(
            {
                "media_id": ids,
                "kind": pa.array(kind),
                "payload": pa.array(payloads, pa.binary()),
                "width": width,
                "height": np.maximum(lens // np.maximum(width, 1), 1).astype(
                    np.int32
                ),
                "channels": np.full(n, 3, np.int32),
                "sample_rate": np.full(n, 16000, np.int32),
                "n_samples": lens.astype(np.int32),
                "n_frames": np.maximum(lens // 256, 1).astype(np.int32),
                "sha256": pa.array(
                    [hashlib.sha256(b).hexdigest() for b in payloads]
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        mk, batch_format="pyarrow", batch_size=256
    )


def _decode_image(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """FAKE image codec: tile payload bytes into (h, w, c) uint8.

    Deterministic in the payload alone, so tests and oracles are stable.
    Swap for ``np.asarray(PIL.Image.open(io.BytesIO(payload)))`` in a real
    deployment."""
    need = width * height * channels
    buf = np.frombuffer(payload, np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(height, width, channels)


def _decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """FAKE audio codec: payload bytes → float32 waveform in [-1, 1)."""
    buf = np.frombuffer(payload, np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    reps = -(-n_samples // len(buf))
    return (np.tile(buf, reps)[:n_samples].astype(np.float32) - 128.0) / 128.0


class ImageFeatures:
    """Actor-pool stage: decode image payloads and emit per-image features
    (mean/std/edge-energy per channel). Setup once per actor; small batches
    because a decoded batch is width*height*channels bytes per row."""

    def __init__(self, resize_to: int | None = None):
        self.resize_to = resize_to

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, means, stds, edges = [], [], [], []
        w = t["width"].to_numpy()
        h = t["height"].to_numpy()
        c = t["channels"].to_numpy()
        mids = t["media_id"].to_numpy()
        payloads = t["payload"].to_pylist()
        for i in range(t.num_rows):
            img = _decode_image(payloads[i], int(w[i]), int(h[i]), int(c[i]))
            if self.resize_to is not None:
                img = resize_nearest(img, self.resize_to, self.resize_to)
            f = img.astype(np.float64)
            ids.append(int(mids[i]))
            means.append(float(f.mean()))
            stds.append(float(f.std()))
            edges.append(float(np.abs(np.diff(f, axis=1)).mean()) if f.shape[1] > 1 else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "px_mean": pa.array(means, pa.float64()),
                "px_std": pa.array(stds, pa.float64()),
                "edge_energy": pa.array(edges, pa.float64()),
            }
        )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (real, not stubbed — pure numpy)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


class AudioFrames:
    """Actor-pool stage: decode audio payloads, frame-sample (frame_len
    window every hop samples), emit per-frame RMS energy rows (long form:
    one row per sampled frame — the layout a feature-extraction training
    pipeline consumes)."""

    def __init__(self, frame_len: int = 512, hop: int = 2048, max_frames: int = 16):
        self.frame_len = frame_len
        self.hop = hop
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_idx, out_rms = [], [], []
        mids = t["media_id"].to_numpy()
        ns = t["n_samples"].to_numpy()
        payloads = t["payload"].to_pylist()
        for i in range(t.num_rows):
            wave = _decode_audio(payloads[i], int(ns[i]))
            starts = np.arange(0, max(len(wave) - self.frame_len, 0) + 1, self.hop)[
                : self.max_frames
            ]
            if len(starts) == 0:
                starts = np.array([0])
                wave = np.pad(wave, (0, self.frame_len - len(wave)))
            idx = starts[:, None] + np.arange(self.frame_len)[None, :]
            frames = wave[np.clip(idx, 0, len(wave) - 1)]
            # float64 RMS: the float32 samples are exact dyadics (k/128), so
            # the accumulation dtype is the only precision difference vs the
            # double-arithmetic SQL oracle
            rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
            out_id.extend([int(mids[i])] * len(starts))
            out_idx.extend(range(len(starts)))
            out_rms.extend(rms.tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "rms": pa.array(out_rms, pa.float64()),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: sample every k-th frame of a (fake-decoded) video
    payload and emit one row per sampled frame with its own binary payload —
    the fan-out layout a downstream image stage consumes directly."""

    def __init__(self, every_k: int = 4, frame_bytes: int = 256, max_frames: int = 8):
        self.every_k = every_k
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_f, out_payload = [], [], []
        mids = t["media_id"].to_numpy()
        nf = t["n_frames"].to_numpy()
        payloads = t["payload"].to_pylist()
        for i in range(t.num_rows):
            buf = payloads[i] or b"\x00"
            for j, f in enumerate(range(0, int(nf[i]), self.every_k)):
                if j >= self.max_frames:
                    break
                lo = (f * self.frame_bytes) % max(len(buf), 1)
                chunk = (buf * 2)[lo : lo + self.frame_bytes]
                out_id.append(int(mids[i]))
                out_f.append(f)
                out_payload.append(chunk)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_no": pa.array(out_f, pa.int32()),
                "frame_payload": pa.array(out_payload, pa.binary()),
            }
        )


def image_features(
    media: ray.data.Dataset, resize_to: int | None = None, concurrency=(1, 8)
) -> ray.data.Dataset:
    return media.filter(expr="kind == 'image'").map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"resize_to": resize_to},
        batch_format="pyarrow",
        batch_size=64,  # decoded payloads are large: keep batches small
        concurrency=concurrency,
    )


def audio_frames(media: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return media.filter(expr="kind == 'audio'").map_batches(
        AudioFrames,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def video_frame_sample(media: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return media.filter(expr="kind == 'video'").map_batches(
        VideoFrameSample,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


PHASH_FIELD = 4096  # bytes of the tiled fake image hashed (64 blocks x 64)
PHASH_BLOCKS = 64


def image_phashes(media: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, phash): the 64-bit integer blockhash per image row —
    the shared hash stage behind image_blockhash (exact-match dedup) and
    phash_near_dup (banded hamming join). Materialized once."""

    def kernel(t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_numpy(zero_copy_only=False)
        keep = kinds == "image"
        ids = t["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        payloads = [
            p for p, k in zip(t["payload"].to_pylist(), keep.tolist()) if k
        ]
        n = len(ids)
        M = np.zeros((n, PHASH_FIELD), np.uint8)
        for i, p in enumerate(payloads):
            buf = np.frombuffer(p, np.uint8)
            if len(buf):
                M[i] = np.resize(buf, PHASH_FIELD)  # cyclic tile = fake decode
        width = PHASH_FIELD // PHASH_BLOCKS
        bs = M.reshape(n, PHASH_BLOCKS, width).sum(axis=2, dtype=np.int64)
        tot = bs.sum(axis=1)
        bits = (bs * PHASH_BLOCKS) > tot[:, None]
        weights = np.uint64(1) << np.arange(PHASH_BLOCKS, dtype=np.uint64)
        phash = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {"media_id": ids, "phash": phash.view(np.int64)}
        )

    return media.select_columns(["media_id", "kind", "payload"]).map_batches(
        kernel, batch_format="pyarrow", batch_size=256
    ).materialize()


def phash_near_dup(
    media: ray.data.Dataset,
    max_hamming: int = 7,
    bands: int = 8,
    num_parts: int = 32,
) -> ray.data.Dataset:
    """Perceptual near-duplicate image PAIRS: banded Hamming join over the
    64-bit blockhash (the multimodal counterpart of simhash_near_dup,
    riding stages/dedup.banded_hamming_pairs unchanged). With the default
    bands=8 > max_hamming=7 the pigeonhole candidate set is COMPLETE —
    every pair within the radius is found, no recall loss. Returns
    distinct (src, dst, hamming)."""
    from .dedup import banded_hamming_pairs

    hashed = image_phashes(media)

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["media_id"], "simhash": t["phash"]})

    return banded_hamming_pairs(
        hashed.map_batches(rename, batch_format="pyarrow"),
        id_col="doc_id",
        hash_col="simhash",
        max_hamming=max_hamming,
        bands=bands,
        num_parts=num_parts,
    )


def image_blockhash(media: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """Perceptual blockhash image dedup: tile the (fake-)decoded image's
    first PHASH_FIELD bytes into PHASH_BLOCKS blocks, set bit i when
    block i's byte sum * PHASH_BLOCKS exceeds the field total (block mean
    > global mean, integer cross-multiplied — no division, no float), and
    pack the 64 bits into an int64. dup_group = min media_id sharing the
    hash (exact-match perceptual dedup; a banded hamming>0 variant would
    reuse stages/dedup.py's simhash banding unchanged).

    Whole-batch vectorized after the per-row byte-buffer view (inherent to
    binary payload columns); one tiny hash-keyed groupby + join."""

    hashed = image_phashes(media)
    groups = hashed.groupby("phash").min("media_id").rename_columns(
        {"min(media_id)": "dup_group"}
    )
    return hashed.join(
        groups, join_type="inner", num_partitions=num_partitions, on=("phash",)
    ).select_columns(["media_id", "phash", "dup_group"])


SCENE_FRAME_BYTES = 256
SCENE_MAX_FRAMES = 32
SCENE_CUT_THRESHOLD = 300  # abs intensity delta that flags a cut


class SceneCuts:
    """Actor-pool stage: frame-to-frame intensity deltas over consecutive
    (fake-decoded) video frames, flagging scene cuts where the absolute
    delta crosses the threshold — the shot-boundary pass a video curation
    pipeline runs before frame sampling. Per-row decode loops are inherent
    to decoding; the per-frame intensity fold is one vectorized reduceat
    per video. Swap the fake codec for a real one and ONLY the slice-bytes
    step changes."""

    def __init__(
        self,
        frame_bytes: int = SCENE_FRAME_BYTES,
        max_frames: int = SCENE_MAX_FRAMES,
        threshold: int = SCENE_CUT_THRESHOLD,
    ):
        self.fb = frame_bytes
        self.max_frames = max_frames
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        out_id, out_f, out_i, out_d = [], [], [], []
        mids = t["media_id"].to_numpy()
        payloads = t["payload"].to_pylist()
        fb = self.fb
        for i in range(t.num_rows):
            buf = payloads[i] or b""
            n = len(buf)
            nf = min(max(n // fb, 1), self.max_frames)
            if nf < 2:
                continue
            tiled = np.frombuffer((buf * 2), np.uint8)
            starts = (np.arange(nf, dtype=np.int64) * fb) % max(n, 1)
            # per-frame byte sums over [start, start+fb) of the wrapped
            # buffer (one reduceat over the gathered slices)
            # nf >= 2 implies n >= 2*fb, so start+fb <= 2n always: every
            # slice is complete within the doubled buffer
            idx = starts[:, None] + np.arange(fb, dtype=np.int64)[None, :]
            inten = tiled[idx].astype(np.int64).sum(axis=1)
            delta = inten[1:] - inten[:-1]
            out_id.extend([int(mids[i])] * (nf - 1))
            out_f.extend(range(1, nf))
            out_i.extend(inten[1:].tolist())
            out_d.extend(delta.tolist())
        out_d = np.asarray(out_d, np.int64)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_no": pa.array(out_f, pa.int32()),
                "intensity": pa.array(out_i, pa.int64()),
                "delta": pa.array(out_d),
                "is_cut": pa.array(np.abs(out_d) >= self.threshold),
            }
        )


def scene_cuts(media: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return media.filter(expr="kind == 'video'").map_batches(
        SceneCuts,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
