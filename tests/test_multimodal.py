"""SVC container codec: encode/decode round-trip, error paths, and
the Spark-side pack → demux pipeline over Arrow batches."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

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
    with pytest.raises(ValueError):
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


# ---------------------------------------------------------------------------
# Real codecs (operators.codecs): BMP via struct, WAV via stdlib wave.
# ---------------------------------------------------------------------------


def test_bmp_encode_is_spec_exact():
    """Pin the on-disk layout against hand-built reference bytes for a
    2×2 image: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows,
    BGR channel order, rows padded to 4 bytes (2·3=6 → stride 8)."""
    import struct

    from exceldatatransform_py_spark.operators.codecs import bmp_encode

    # top-down RGB: row0 = red, green; row1 = blue, white
    rgb = bytes(
        [255, 0, 0, 0, 255, 0,
         0, 0, 255, 255, 255, 255]
    )
    got = bmp_encode(rgb, 2, 2)
    stride = 8
    body = (
        # stored bottom-up: file row 0 is image row 1, channels BGR
        bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
        + bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    )
    want = (
        struct.pack("<2sIHHI", b"BM", 54 + stride * 2, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, stride * 2,
                      2835, 2835, 0, 0)
        + body
    )
    assert got == want


def test_bmp_roundtrip_with_padding_and_rejects():
    import numpy as np
    import pytest

    from exceldatatransform_py_spark.operators.codecs import (
        bmp_decode,
        bmp_encode,
    )

    # width 13 → 39 pixel bytes/row → stride 40: padding must vanish
    rgb = bytes((i * 31) % 256 for i in range(13 * 5 * 3))
    w, h, img = bmp_decode(bmp_encode(rgb, 13, 5))
    assert (w, h) == (13, 5)
    assert img.tobytes() == rgb
    assert isinstance(img, np.ndarray) and img.shape == (5, 13, 3)
    with pytest.raises(ValueError, match="magic"):
        bmp_decode(b"XX" + bmp_encode(rgb, 13, 5)[2:])
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(bmp_encode(rgb, 13, 5)[:-4])


def test_nearest_resize_reference():
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import nearest_resize

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = nearest_resize(img, 2, 3)
    # xs = [0, 2], ys = [0, 2, 4]
    assert out.shape == (3, 2, 3)
    assert (out == img[[0, 2, 4]][:, [0, 2]]).all()


def test_wav_roundtrip_and_headers():
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import (
        wav_decode,
        wav_encode,
    )

    pcm = np.array([0, 1000, -32768, 32767, -1], dtype="<i2").tobytes()
    payload = wav_encode(pcm, rate=16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    d = wav_decode(payload)
    assert d["n_channels"] == 1 and d["sampwidth"] == 2
    assert d["framerate"] == 16000 and d["n_frames"] == 5
    assert d["samples"].tobytes() == pcm


def test_pack_bmp_resize_gray_matches_local_pixel_math(spark):
    """The distributed decode+resize+grayscale equals the same pixel
    math done locally on the raw bytes — Arrow transfer, batch
    boundaries, and the codec all byte-exact."""
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import nearest_resize
    from exceldatatransform_py_spark.operators.multimodal import (
        bmp_height,
        bmp_resize_gray,
        bmp_width,
        pack_bmp,
    )

    rows = [(i, bytes((i * 13 + j) % 256 for j in range(50 + i * 37)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, list(r.gray))
        for r in bmp_resize_gray(pack_bmp(df)).collect()
    }
    for rid, payload in rows:
        w, h = bmp_width(rid), bmp_height(rid)
        rgb = payload[: w * h * 3].ljust(w * h * 3, b"\x00")
        img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        small = nearest_resize(img, 8, 8).astype("int64")
        gray = ((small[:, :, 0] + small[:, :, 1] + small[:, :, 2]) // 3)
        assert got[rid] == (w, h, [int(v) for v in gray.reshape(-1)])


def test_image_phash_matches_local_recompute(spark):
    """The distributed pHash equals the average-hash rule applied
    locally to the decoded 8×8 grayscale: bit_i = gray_i·64 > Σgray
    over cells 0..62 — exact integers end to end."""
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import nearest_resize
    from exceldatatransform_py_spark.operators.multimodal import (
        bmp_height,
        bmp_width,
        image_phash,
        pack_bmp,
    )

    rows = [(i, bytes((i * 13 + j) % 256 for j in range(50 + i * 37)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.phash for r in image_phash(pack_bmp(df)).collect()
    }
    for rid, payload in rows:
        w, h = bmp_width(rid), bmp_height(rid)
        rgb = payload[: w * h * 3].ljust(w * h * 3, b"\x00")
        img = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
        small = nearest_resize(img, 8, 8).astype("int64")
        gray = ((small[:, :, 0] + small[:, :, 1] + small[:, :, 2]) // 3).reshape(-1)
        total = int(gray.sum())
        want = sum(1 << i for i in range(63) if int(gray[i]) * 64 > total)
        assert got[rid] == want


def test_image_near_dup_pairs_micro_semantics(spark):
    """Perceptual pairing property on hand-built images: a copy with
    a few brightened pixels pairs with its original at small hamming;
    the inverted image does not pair with it. Uses doc_ids with the
    SAME (w, h) class (ids ≡ 0 mod 20) so pixel perturbations — not
    resampling differences — are what the hashes see."""
    from exceldatatransform_py_spark.operators.dedup import simhash_near_dup
    from exceldatatransform_py_spark.operators.multimodal import (
        bmp_height,
        bmp_width,
        image_phash,
        pack_bmp,
    )

    w, h = bmp_width(0), bmp_height(0)
    assert (w, h) == (bmp_width(20), bmp_height(20)) == (bmp_width(40),
                                                         bmp_height(40))
    base = bytes((j * 7) % 200 for j in range(w * h * 3))
    tweaked = bytearray(base)
    for j in range(0, 6):  # brighten two sampled cells' worth of bytes
        tweaked[j] = min(255, tweaked[j] + 40)
    inverted = bytes(255 - b for b in base)
    rows = [(0, base), (20, bytes(tweaked)), (40, inverted)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = image_phash(pack_bmp(df))
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_near_dup(
            fp, "doc_id", "phash", ham_max=3, max_band_docs=50
        ).collect()
    }
    assert (0, 20) in pairs and pairs[(0, 20)] <= 3
    assert (0, 40) not in pairs and (20, 40) not in pairs


def test_incremental_image_dedup_matches_full_batch(spark, tmp_path):
    """The persisted image-pHash index (fingerprint-agnostic banded
    index) probed by a held-out batch must emit exactly the
    cross-split subset of the full-batch pairing — no corpus
    re-decode, same pairs."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_fingerprint_index,
        build_fingerprint_index,
        incremental_fingerprint_near_dup,
        simhash_near_dup,
    )
    from exceldatatransform_py_spark.operators.multimodal import (
        image_phash,
        pack_bmp,
    )

    rows = [(i, bytes((i * 11 + j * 3) % 251 for j in range(60 + i * 17)))
            for i in range(24)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = image_phash(pack_bmp(df, id_col="doc_id", bin_col="payload"))
    corpus_fp = fp.filter(F.col("doc_id") % 3 != 0)
    batch_fp = fp.filter(F.col("doc_id") % 3 == 0)
    prefix = "img_fp_idx"
    build_fingerprint_index(
        corpus_fp, prefix, n_buckets=4, path=str(tmp_path / "idx"),
        id_col="doc_id", fp_col="phash",
    )
    try:
        got = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in incremental_fingerprint_near_dup(
                spark, prefix, batch_fp, id_col="doc_id", fp_col="phash",
                ham_max=5, max_band_docs=None,
            ).collect()
        )
        full = simhash_near_dup(
            fp, "doc_id", "phash", ham_max=5, max_band_docs=10**9
        )
        want = sorted(
            (a, b, hd)
            for r in full.collect()
            for a, b, hd in [(r.a_id, r.b_id, r.hamming)]
            if (a % 3 == 0) != (b % 3 == 0)
        )
        # probe emits (new, corpus); normalize to sorted-id pairs
        got_norm = sorted((min(a, b), max(a, b), hd) for a, b, hd in got)
        assert got_norm == want

        # append the batch; re-probing one of its docs now also sees
        # batch-mates (the ingest loop admits what it probed)
        append_to_fingerprint_index(
            batch_fp, prefix, id_col="doc_id", fp_col="phash"
        )
        n_rows = spark.table(f"{prefix}_simbands").count()
        assert n_rows == 24 * 4  # every doc, every band
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_simbands")


def test_streaming_ingest_loop_with_image_phash(spark, tmp_path):
    """The image twin of the text dedup ingest loops: an image stream
    drained through foreachBatch, each micro-batch's pHashes probed
    against the persisted band index, near-dups dropped, survivors
    admitted so later batches see earlier ones. max_band_docs=None
    keeps the pigeonhole recall exact, so the stream's decisions are
    checkable against the live pairing ground truth."""
    from exceldatatransform_py_spark.operators.dedup import (
        append_to_fingerprint_index,
        build_fingerprint_index,
        incremental_fingerprint_near_dup,
        simhash_near_dup,
    )
    from exceldatatransform_py_spark.operators.multimodal import (
        image_phash,
        pack_bmp,
    )
    from exceldatatransform_py_spark.sources.readers import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    images = pack_bmp(docs, id_col="doc_id", bin_col="payload")

    def hashes(split):
        return image_phash(split, id_col="doc_id", image_col="image")

    seed = images.filter(F.col("doc_id") >= 300)
    wave1 = images.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    wave2 = images.filter(F.col("doc_id") < 150)

    prefix = "phash_stream_idx"
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    build_fingerprint_index(
        hashes(seed), prefix, n_buckets=4, path=str(tmp_path / "ph"),
        id_col="doc_id", fp_col="phash",
    )

    flagged: list[int] = []
    admitted: list[int] = []

    def ingest(batch_df, _bid):
        fp = hashes(batch_df)
        pairs = incremental_fingerprint_near_dup(
            spark, prefix, fp, id_col="doc_id", fp_col="phash",
            ham_max=3, max_band_docs=None,
        )
        dup_ids = pairs.select(F.col("id_a").alias("doc_id")).distinct()
        keep = batch_df.join(dup_ids, "doc_id", "left_anti")
        flagged.extend(r.doc_id for r in dup_ids.collect())
        admitted.extend(r.doc_id for r in keep.select("doc_id").collect())
        append_to_fingerprint_index(
            hashes(keep), prefix, id_col="doc_id", fp_col="phash"
        )

    def drain():
        q = (
            spark.readStream.schema(images.schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def live_pairs(subset):
        return simhash_near_dup(
            hashes(subset), "doc_id", "phash", ham_max=3,
            max_band_docs=10**9,
        )

    try:
        wave1.write.mode("append").parquet(in_dir)
        drain()
        admitted_w1 = sorted(admitted)
        wave2.write.mode("append").parquet(in_dir)
        drain()

        full1 = live_pairs(images.filter(F.col("doc_id") >= 150))
        w1_expected_flagged = sorted(
            {
                r.a_id
                for r in full1.filter(
                    (F.col("a_id") >= 150)
                    & (F.col("a_id") < 300)
                    & (F.col("b_id") >= 300)
                ).collect()
            }
        )
        got_w1_flagged = sorted(set(range(150, 300)) - set(admitted_w1))
        assert got_w1_flagged == w1_expected_flagged
        visible = set(range(300, 500)) & {
            r.doc_id for r in docs.select("doc_id").collect()
        } | set(admitted_w1)
        full_all = live_pairs(images)
        cross2 = {
            r.a_id
            for r in full_all.filter(F.col("a_id") < 150).collect()
            if r.b_id in visible
        }
        w2_flagged = set(flagged) - set(got_w1_flagged)
        assert w2_flagged == cross2
        assert flagged, "no image near-dups flagged across the stream"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_simbands")


def test_pack_video_frames_are_real_bmps(spark):
    """Every demuxed SVC frame from pack_video is a spec-valid 24-bit
    BMP whose decoded pixels equal the source payload chunk (zero-
    padded final chunk) — the motion-BMP contract."""
    from exceldatatransform_py_spark.operators.codecs import bmp_decode
    from exceldatatransform_py_spark.operators.multimodal import (
        pack_video,
        svc_extract_frames,
    )

    fw, fh = 8, 6
    fb = fw * fh * 3
    rows = [(i, bytes((i * 31 + j) % 256 for j in range(100 + i * 130)))
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    vids = {r.doc_id: bytes(r.video)
            for r in pack_video(df, fw=fw, fh=fh).collect()}
    for rid, payload in rows:
        frames = svc_extract_frames(vids[rid])
        assert len(frames) == -(-len(payload) // fb)
        for i, fr in enumerate(frames):
            w, h, img = bmp_decode(fr)  # raises on a non-BMP payload
            assert (w, h) == (fw, fh)
            chunk = payload[i * fb : (i + 1) * fb].ljust(fb, b"\x00")
            assert img.reshape(-1).tobytes() == chunk


def test_video_frame_stats_matches_local_pixel_math(spark):
    """Distributed demux→decode→frame-diff equals the same math done
    locally on the raw bytes; a repeated chunk yields abs_delta 0 and
    no scene cut, a flipped chunk yields a positive delta."""
    import numpy as np

    from exceldatatransform_py_spark.operators.multimodal import (
        pack_video,
        video_frame_stats,
    )

    fb = 8 * 6 * 3
    a = bytes((j * 7 + 3) % 256 for j in range(fb))
    flipped = bytes(255 - x for x in a)
    payload = a + a + flipped  # frames: a, a (no cut), flipped (cut)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    out = video_frame_stats(
        pack_video(df, fw=8, fh=6), cut_mean_delta=40
    ).collect()
    got = {r.frame_idx: r for r in out}
    assert len(got) == 3
    arr = np.frombuffer(a, dtype=np.uint8).astype("int64")
    farr = np.frombuffer(flipped, dtype=np.uint8).astype("int64")
    w = np.arange(fb)
    for i, ref in ((0, arr), (1, arr), (2, farr)):
        assert got[i].pixel_sum == int(ref.sum())
        assert got[i].wsum == int((w * ref).sum())
    assert got[0].abs_delta == 0 and not got[0].scene_cut
    assert got[1].abs_delta == 0 and not got[1].scene_cut
    exp_delta = int(np.abs(farr - arr).sum())
    assert got[2].abs_delta == exp_delta
    assert got[2].scene_cut == (exp_delta >= 40 * fb)
    assert got[2].scene_cut  # the flip is far past the threshold


def test_audio_fingerprint_matches_local_recompute(spark):
    """The distributed audio fingerprint equals the energy-delta rule
    applied locally to the decoded PCM: 64 equal spans (floor bounds),
    exact Σs² per span, bit_i = e_{i+1} > e_i — and the excerpt window
    truncates the samples BEFORE the span map."""
    from exceldatatransform_py_spark.operators.multimodal import (
        audio_fingerprint,
        pack_wav,
    )

    rows = [(i, bytes((i * 29 + j * 5) % 256 for j in range(40 + i * 63)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    for window in (None, 128):
        audio = pack_wav(df, id_col="doc_id", bin_col="payload")
        got = {
            r.doc_id: r.afp
            for r in audio_fingerprint(
                audio, window_samples=window
            ).collect()
        }
        for rid, payload in rows:
            s = [(b - 128) * 256 for b in payload]
            if window is not None:
                s = s[:window]
            n = len(s)
            bounds = [(j * n) // 64 for j in range(65)]
            es = [
                sum(v * v for v in s[bounds[j]:bounds[j + 1]])
                for j in range(64)
            ]
            want = sum(
                1 << i for i in range(63) if es[i + 1] > es[i]
            )
            assert got[rid] == want, (window, rid)


def test_audio_near_dup_excerpt_window_semantics(spark):
    """The fixed-duration excerpt makes the pairing tail-edit robust:
    a clip and its tail-appended copy share the leading 128 samples →
    hamming 0; a clip with a DIFFERENT opening does not pair."""
    from exceldatatransform_py_spark.operators.dedup import simhash_near_dup
    from exceldatatransform_py_spark.operators.multimodal import (
        audio_fingerprint,
        pack_wav,
    )

    base = bytes((j * 17 + 31) % 256 for j in range(200))
    appended = base + bytes(range(50))
    different = bytes((j * 23 + 7) % 256 for j in range(200))
    rows = [(0, base), (1, appended), (2, different)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = audio_fingerprint(
        pack_wav(df, id_col="doc_id", bin_col="payload"),
        window_samples=128,
    )
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_near_dup(
            fp, "doc_id", "afp", ham_max=3, max_band_docs=10**9
        ).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_video_keyframe_fingerprint_matches_local_recompute(spark):
    """The keyframe fingerprint equals the gradient-sign rule over
    frame 0's decoded scan-order grays — which, because encode+decode
    round-trips, are the 3-byte sums of the clip's first 144 payload
    bytes (zero-padded)."""
    from exceldatatransform_py_spark.operators.multimodal import (
        pack_video,
        video_fingerprint,
    )

    rows = [(i, bytes((i * 41 + j * 11) % 256 for j in range(30 + i * 80)))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.vfp
        for r in video_fingerprint(
            pack_video(df, id_col="doc_id", bin_col="payload")
        ).collect()
    }
    for rid, payload in rows:
        chunk = payload[:144].ljust(144, b"\x00")
        gs = [
            chunk[3 * m] + chunk[3 * m + 1] + chunk[3 * m + 2]
            for m in range(48)
        ]
        want = sum(1 << i for i in range(47) if gs[i + 1] > gs[i])
        assert got[rid] == want
