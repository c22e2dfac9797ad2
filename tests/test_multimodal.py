"""Multimodal binary-column plumbing: schema, actor-pool stages, fan-out
layouts. The codec is a deterministic fake (no image/audio libs in the
container — see stages/multimodal.py), so feature values are exactly
computable here."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sbustreamspot_core_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFrames,
    _decode_audio,
    _decode_image,
    audio_frames,
    image_features,
    media_from_documents,
    resize_nearest,
    video_frame_sample,
)


def _docs(n: int = 30) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "text": pa.array([f"doc {i} " + "abc" * (i + 1) for i in range(n)]),
            }
        )
    )


def test_media_schema_and_integrity():
    media = media_from_documents(_docs()).take_all()
    assert len(media) == 30
    t = pa.Table.from_pylist(media)
    for name in MEDIA_SCHEMA.names:
        assert name in t.column_names
    import hashlib

    for row in media[:5]:
        assert hashlib.sha256(row["payload"]).hexdigest() == row["sha256"]
        assert row["kind"] in ("image", "audio", "video")


def test_image_features_match_fake_decode():
    media_ds = media_from_documents(_docs())
    feats = {r["media_id"]: r for r in image_features(media_ds).take_all()}
    media = [r for r in media_ds.take_all() if r["kind"] == "image"]
    assert set(feats) == {r["media_id"] for r in media}
    r = media[0]
    img = _decode_image(r["payload"], r["width"], r["height"], r["channels"])
    assert np.isclose(feats[r["media_id"]]["px_mean"], img.astype(np.float64).mean())


def test_resize_nearest_shape_and_determinism():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    out = resize_nearest(img, 3, 4)
    assert out.shape == (3, 4, 3)
    assert (out == resize_nearest(img, 3, 4)).all()


def test_audio_frames_long_form():
    media_ds = media_from_documents(_docs())
    rows = audio_frames(media_ds).take_all()
    audio_ids = {
        r["media_id"] for r in media_ds.take_all() if r["kind"] == "audio"
    }
    assert {r["media_id"] for r in rows} == audio_ids
    # per-frame RMS equals a direct recompute on the fake waveform
    media = {r["media_id"]: r for r in media_ds.take_all()}
    stage = AudioFrames()
    r0 = sorted(rows, key=lambda r: (r["media_id"], r["frame_idx"]))[0]
    wave = _decode_audio(media[r0["media_id"]]["payload"], media[r0["media_id"]]["n_samples"])
    if len(wave) >= stage.frame_len:
        expect = float(np.sqrt((wave[: stage.frame_len] ** 2).mean()))
        assert np.isclose(r0["rms"], expect)


def test_video_frame_sample_fanout():
    media_ds = media_from_documents(_docs())
    rows = video_frame_sample(media_ds).take_all()
    vids = {r["media_id"]: r for r in media_ds.take_all() if r["kind"] == "video"}
    assert {r["media_id"] for r in rows} <= set(vids)
    for r in rows:
        assert r["frame_no"] % 4 == 0
        assert len(r["frame_payload"]) > 0


def test_image_blockhash_dup_groups():
    """Identical payloads share phash and dup_group; non-image rows are
    excluded; bits follow the integer cross-multiplied mean test."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from sbustreamspot_core_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        image_blockhash,
    )

    def row(mid, kind, payload):
        return {
            "media_id": mid, "kind": kind, "payload": payload,
            "width": 1, "height": 1, "channels": 3,
            "sample_rate": 16000, "n_samples": len(payload),
            "n_frames": 1, "sha256": "x",
        }

    rows = [
        row(0, "image", b"hello world"),
        row(3, "image", b"hello world"),   # duplicate of 0
        row(6, "image", b"different bytes"),
        row(1, "audio", b"hello world"),   # excluded
    ]
    t = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
    out = (
        image_blockhash(ray.data.from_arrow(t), num_partitions=2)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert list(out.index) == [0, 3, 6]
    assert out.loc[0, "phash"] == out.loc[3, "phash"]
    assert out.loc[0, "dup_group"] == 0 and out.loc[3, "dup_group"] == 0
    assert out.loc[6, "dup_group"] == 6

    # hand-check one hash: payload tiled to 4096 bytes, 64 blocks of 64
    buf = np.resize(np.frombuffer(b"hello world", np.uint8), 4096)
    bs = buf.reshape(64, 64).sum(axis=1, dtype=np.int64)
    bits = (bs * 64) > bs.sum()
    want = int(
        (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            dtype=np.uint64
        ).astype(np.uint64).view(np.int64)
    )
    assert out.loc[0, "phash"] == want


def test_scene_cuts_hand_case():
    """A video payload built from two 256-byte 'shots' (bytes 'a' then 'z')
    long enough for 4 frames: the a->z boundary fires exactly one cut of
    delta 256*(122-97); the z->z transition is flat. Wrapped frame starts
    are exercised by the second doc whose length is not frame-aligned."""
    import numpy as np
    import pyarrow as pa

    import ray.data
    from sbustreamspot_core_ray.stages.multimodal import (
        media_from_documents,
        scene_cuts,
    )

    text0 = "a" * 512 + "z" * 512  # doc_id 2 (kind video): 4 aligned frames
    text1 = "b" * 700  # doc_id 5: nf=2, frame 1 starts at 256 (no wrap yet)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2, 5], pa.int64()),
                "text": pa.array([text0, text1]),
            }
        )
    )
    out = (
        scene_cuts(media_from_documents(docs))
        .to_pandas()
        .sort_values(["media_id", "frame_no"])
        .reset_index(drop=True)
    )
    d0 = out[out["media_id"] == 2]
    assert d0["frame_no"].tolist() == [1, 2, 3]
    assert d0["delta"].tolist() == [0, 256 * (122 - 97), 0]
    assert d0["is_cut"].tolist() == [False, True, False]
    d1 = out[out["media_id"] == 5]
    assert d1["frame_no"].tolist() == [1]
    assert d1["delta"].tolist() == [0]  # uniform bytes: flat
    assert d1["is_cut"].tolist() == [False]


def test_phash_near_dup_complete_vs_bruteforce():
    """Banded perceptual hamming join vs the O(n^2) popcount definition —
    bands=8 > radius=7 makes the candidate set provably complete, so the
    outputs must match EXACTLY, including planted flip-distance pairs."""
    from sbustreamspot_core_ray.stages.multimodal import (
        image_phashes,
        media_from_documents,
        phash_near_dup,
    )

    rng = np.random.default_rng(3)
    base = "".join(chr(65 + int(c)) for c in rng.integers(0, 26, 600))
    texts = {}
    for i in range(12):
        did = i * 3  # doc_id % 3 == 0 -> image rows
        t = list(base)
        # progressively mutate: doc 0 is base, others flip i*8 chars
        for j in range(i * 8):
            t[(j * 37) % len(t)] = chr(65 + (j % 26))
        texts[did] = "".join(t)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": pa.array([texts[i] for i in sorted(texts)], pa.string()),
            }
        )
    )
    media = media_from_documents(docs)
    got = (
        phash_near_dup(media, max_hamming=7, bands=8, num_parts=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    hp = image_phashes(media).to_pandas()
    ids = hp["media_id"].to_numpy(np.int64)
    hv = hp["phash"].to_numpy(np.int64).astype(np.uint64)
    want = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = (a, b) if ids[a] < ids[b] else (b, a)
            ham = int(bin(int(hv[i] ^ hv[j])).count("1"))
            if ham <= 7:
                want.append((int(ids[i]), int(ids[j]), ham))
    want.sort()
    assert got.to_numpy().tolist() == [list(r) for r in want]
    assert len(want) >= 3  # the mutation ladder must produce real pairs


# ---------------------------------------------------------------------------
# REAL codec tests (round 4): pure-stdlib PNG / WAV decode end-to-end
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_channel_counts():
    from sbustreamspot_core_ray.stages.multimodal import png_decode, png_encode

    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, (7, 11, c), dtype=np.uint8)
        out = png_decode(png_encode(img))
        assert out.shape == (7, 11, c)
        assert np.array_equal(out, img)


def test_png_decode_all_filter_types():
    """Decode a hand-filtered PNG exercising every scanline filter type
    (None/Sub/Up/Average/Paeth) — the reference filtering below follows the
    PNG spec directly, so a decode match proves real unfiltering."""
    import struct
    import zlib

    from sbustreamspot_core_ray.stages.multimodal import _PNG_MAGIC, png_decode

    rng = np.random.default_rng(11)
    h, w, c = 5, 6, 3
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8).astype(np.int64)
    stride = w * c
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[r].reshape(-1)
        filt = np.zeros(stride, np.int64)
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
            filt[x] = (line[x] - pred) % 256
        raw.append(ftype)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    out = png_decode(payload)
    assert np.array_equal(out, img.astype(np.uint8))


def test_wav_roundtrip_and_mono_mix():
    from sbustreamspot_core_ray.stages.multimodal import wav_decode, wav_encode

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, 777, dtype=np.int16)
    wave, sr = wav_decode(wav_encode(samples, sample_rate=22050))
    assert sr == 22050
    assert wave.dtype == np.float32
    assert np.array_equal(wave, samples.astype(np.float32) / 32768.0)


def test_real_payloads_flow_through_actor_stages():
    """media_from_documents(real_mod=2): image/audio rows with even doc_id
    carry REAL PNG/WAV containers; the same ImageFeatures/AudioFrames actor
    stages must genuinely decode them — features must equal a direct numpy
    computation on the closed-form content, NOT the fake byte-tiling."""
    from sbustreamspot_core_ray.stages.multimodal import (
        real_audio_samples,
        real_image_pixels,
    )

    docs = _docs(12)
    media = media_from_documents(docs, real_mod=2)
    feats = image_features(media).to_pandas().set_index("media_id")
    # image rows are doc_id % 3 == 0; real ones additionally % 2 == 0
    for did in (0, 6):
        img = real_image_pixels(did).astype(np.float64)
        assert np.isclose(feats.loc[did, "px_mean"], img.mean())
        assert np.isclose(feats.loc[did, "px_std"], img.std())
        assert np.isclose(
            feats.loc[did, "edge_energy"], np.abs(np.diff(img, axis=1)).mean()
        )
    # fake image row (doc_id 3, odd): must NOT match the real formula
    assert 3 in feats.index

    frames = audio_frames(media).to_pandas()
    real_aud = frames[frames["media_id"] == 4]  # doc_id 4: audio, even
    assert len(real_aud) == 1  # 1024 samples -> exactly one frame
    wave = real_audio_samples(4).astype(np.float64) / 32768.0
    want = float(np.sqrt((wave[:512] ** 2).mean()))
    assert np.isclose(real_aud["rms"].iloc[0], want)
