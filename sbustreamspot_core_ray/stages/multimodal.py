"""Multimodal (image / audio / video) columns as opaque Arrow binary.

Large-scale training-data pipelines carry media as `binary` payload columns
with typed metadata; the engine treats them exactly like any other column —
small batches, actor-pool stages, zero-copy Arrow in/out.

Codecs: the decode step sniffs the container magic per payload. REAL
pure-stdlib decoders handle PNG (zlib inflate + full scanline unfiltering,
8-bit gray/RGB/RGBA) and WAV (RIFF parse, PCM16 -> float32) — genuinely
decoded bytes flow through the same actor stages. Payloads in no known
container fall back to the deterministic fake codec (`_FAKE_DECODE` below),
which remains the SQL-oracle parity path and the stand-in for formats this
container cannot decode (JPEG/video need external libs; swap `_decode_*`
for PIL / pyav behind the same signature in a full deployment). Everything
Ray-side — schema, batch sizing, actor signatures, output layout — is real
and tested either way.

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

# Payloads NOT in a recognized container (PNG / WAV, decoded for real
# below) go through a deterministic FAKE codec so tests and oracles stay
# stable; real deployments extend the sniffer with PIL/soundfile/pyav for
# the remaining formats. Nothing else in this module changes either way.
_FAKE_DECODE = True

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# REAL pure-stdlib codecs (no external libs): PNG via zlib, WAV via RIFF.
# ---------------------------------------------------------------------------


def png_encode(img: np.ndarray) -> bytes:
    """Encode an (h, w[, c]) uint8 array as a real PNG (8-bit, filter 0).

    Channel counts 1/3/4 map to gray/RGB/RGBA. The output is a spec-valid
    PNG any external viewer decodes; compression details may vary by zlib
    build, but the DECODED pixels are exact, which is what the oracles
    check."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError(f"png_encode needs uint8 pixels, got {img.dtype}")
    h, w, c = img.shape
    try:
        color_type = {1: 0, 3: 2, 4: 6}[c]
    except KeyError:
        raise ValueError(f"png_encode supports 1/3/4 channels, got {c}")
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> np.ndarray:
    """REAL PNG decoder: chunk walk, zlib inflate, and full scanline
    unfiltering (all five filter types: None/Sub/Up/Average/Paeth).
    Supports 8-bit gray (color type 0), RGB (2), and RGBA (6) — enough to
    decode any PNG this engine or common tools emit at those settings.
    Returns (h, w, c) uint8."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(
            f"png_decode supports 8-bit non-interlaced only "
            f"(depth={depth}, interlace={interlace})"
        )
    try:
        c = {0: 1, 2: 3, 6: 4}[color_type]
    except KeyError:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    cc = prev[x - c] if x >= c else 0  # up-left
                    p = a + b - cc
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 sample array as a real single-channel PCM16 WAV
    (RIFF/WAVE fmt+data), parseable by any audio tool."""
    import struct

    data = np.asarray(samples, "<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL WAV decoder: RIFF chunk walk, PCM16 mono/interleaved →
    float32 in [-1, 1) (value / 32768, the exact dyadic mapping) plus the
    container's sample rate."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    sample_rate, bits, channels = None, None, None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"wav_decode supports PCM16 only (fmt={fmt_code}, bits={bits})"
                )
        elif tag == b"data":
            data = body
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    wave = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    if channels and channels > 1:
        wave = wave.reshape(-1, channels).mean(axis=1)
    return wave, int(sample_rate)


# deterministic content of the REAL-container rows (real_mod below): small
# fixed dims so the SQL oracles can enumerate the decoded values exactly
REAL_IMG_DIM = 16  # real PNG rows are 16 x 16 x 3
REAL_AUDIO_N = 1024  # real WAV rows carry 1024 PCM16 samples


def real_image_pixels(doc_id: int) -> np.ndarray:
    """Deterministic pixel content of a real-PNG media row: flat index i
    (row-major h, w, c) holds (doc_id*7 + i*31) % 256 — closed-form, so
    the SQL oracle recomputes the decoded values without a codec."""
    i = np.arange(REAL_IMG_DIM * REAL_IMG_DIM * 3, dtype=np.int64)
    return ((doc_id * 7 + i * 31) % 256).astype(np.uint8).reshape(
        REAL_IMG_DIM, REAL_IMG_DIM, 3
    )


def real_audio_samples(doc_id: int) -> np.ndarray:
    """Deterministic PCM16 content of a real-WAV media row: sample k holds
    ((doc_id*11 + k*17) % 256 - 128) * 256, whose decoded float32 value is
    the exact dyadic ((...) % 256 - 128) / 128 — SQL-recomputable."""
    k = np.arange(REAL_AUDIO_N, dtype=np.int64)
    return (((doc_id * 11 + k * 17) % 256 - 128) * 256).astype(np.int16)


def media_from_documents(
    docs: ray.data.Dataset, real_mod: int | None = None
) -> ray.data.Dataset:
    """Derive a deterministic media table from the documents table: payload
    bytes = utf-8 text (opaque to every stage downstream), kind = doc_id % 3,
    metadata derived from payload length. Stands in for `read_parquet` over
    a real media corpus; schema and layout are the production ones.

    real_mod: when set, image/audio rows with doc_id % real_mod == 0 carry
    REAL containers instead — a spec-valid PNG (`png_encode`) of the
    `real_image_pixels` content and a PCM16 WAV (`wav_encode`) of the
    `real_audio_samples` content — so genuinely decoded payloads flow
    through the same downstream actor stages (the decode dispatch sniffs
    the magic). Content is closed-form deterministic, keeping the SQL
    oracles exact without a SQL-side codec."""

    def mk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        n = len(ids)
        kind = [_KINDS[i % 3] for i in ids]
        if real_mod:
            for j in range(n):
                did = int(ids[j])
                if did % real_mod != 0:
                    continue
                if kind[j] == "image":
                    payloads[j] = png_encode(real_image_pixels(did))
                elif kind[j] == "audio":
                    payloads[j] = wav_encode(real_audio_samples(did))
        lens = np.array([len(b) for b in payloads], np.int64)
        width = np.maximum(np.sqrt(lens).astype(np.int32), 1)
        height = np.maximum(lens // np.maximum(width, 1), 1).astype(np.int32)
        n_samples = lens.astype(np.int32)
        if real_mod:
            real = (ids % real_mod == 0)
            is_img = np.array([k == "image" for k in kind])
            is_aud = np.array([k == "audio" for k in kind])
            width = np.where(real & is_img, REAL_IMG_DIM, width).astype(np.int32)
            height = np.where(real & is_img, REAL_IMG_DIM, height).astype(np.int32)
            n_samples = np.where(real & is_aud, REAL_AUDIO_N, n_samples).astype(
                np.int32
            )
        return pa.table(
            {
                "media_id": ids,
                "kind": pa.array(kind),
                "payload": pa.array(payloads, pa.binary()),
                "width": width,
                "height": height,
                "channels": np.full(n, 3, np.int32),
                "sample_rate": np.full(n, 16000, np.int32),
                "n_samples": n_samples,
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
    """Image codec dispatch: a payload carrying the PNG magic is REALLY
    decoded (zlib inflate + unfilter, `png_decode` above — the container's
    own dimensions win); anything else goes through the deterministic FAKE
    (tile payload bytes into (h, w, c) uint8), which keeps tests and SQL
    oracles stable for container-less payloads. Swap the fallback for
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))`` in a full
    deployment."""
    if payload[:8] == _PNG_MAGIC:
        return png_decode(payload)
    need = width * height * channels
    buf = np.frombuffer(payload, np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    reps = -(-need // len(buf))
    return np.tile(buf, reps)[:need].reshape(height, width, channels)


def _decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """Audio codec dispatch: a RIFF/WAVE payload is REALLY decoded
    (`wav_decode` above — the container's own sample count wins); anything
    else goes through the deterministic FAKE (payload bytes → float32
    waveform in [-1, 1))."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return wav_decode(payload)[0]
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
