"""SVC container codec: encode/decode round-trip, error paths, and
the Spark-side pack → demux pipeline over Arrow batches."""

from __future__ import annotations

import pytest

from exceldatatransform_py_spark.operators.multimodal import (
    media_height,
    media_width,
    svc_decode_header,
    svc_encode,
    svc_extract_frames,
)


def test_svc_roundtrip():
    frames = [b"alpha", b"", b"0123456789" * 20, b"z"]
    payload = svc_encode(frames, width=128, height=72)
    meta = svc_decode_header(payload)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (128, 72, 4)
    assert svc_extract_frames(payload) == frames


def test_svc_rejects_bad_magic_and_truncation():
    good = svc_encode([b"abc"], width=64, height=48)
    with pytest.raises(ValueError, match="magic"):
        svc_decode_header(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        svc_decode_header(good[:8])
    with pytest.raises(ValueError, match="out of bounds"):
        svc_decode_header(good[:-1])
    with pytest.raises(NotImplementedError):
        svc_decode_header(None)


def test_pack_then_demux_matches_source_bytes(spark):
    from pyspark.sql import functions as F

    from exceldatatransform_py_spark.operators.multimodal import (
        frame_sample,
        media_metadata,
        pack_media,
    )

    texts = [(0, "a" * 300), (1, "b" * 128), (2, "c" * 5), (7, "d" * 257)]
    df = spark.createDataFrame(texts, "doc_id long, text string").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    media = pack_media(df, id_col="doc_id", bin_col="payload", frame_bytes=128)

    # metadata: header fields survive the real encode->parse round trip
    meta = {r["doc_id"]: r for r in media_metadata(media).collect()}
    for rid, text in texts:
        m = meta[rid]
        n_frames = -(-len(text) // 128)
        assert m["width"] == media_width(rid)
        assert m["height"] == media_height(rid)
        assert m["n_frames"] == n_frames
        assert m["frame_bytes"] == len(text)
        assert m["media_bytes"] == 13 + 8 * n_frames + len(text)

    # demux: frames come back as the source chunks (cropped to 64)
    frames = {
        (r["doc_id"], r["frame_idx"]): bytes(r["frame"])
        for r in frame_sample(media, crop_bytes=64).collect()
    }
    for rid, text in texts:
        raw = text.encode()
        for fi in range(-(-len(raw) // 128)):
            assert frames[(rid, fi)] == raw[fi * 128 : fi * 128 + 64]
