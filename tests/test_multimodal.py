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
