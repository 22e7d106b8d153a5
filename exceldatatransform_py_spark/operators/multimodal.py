"""Multimodal column plumbing (north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side machinery — schema, Arrow batch
transfer, ``mapInPandas`` signatures, partitioning — is the real
thing, and so are the codecs (``operators.codecs``): images are real
24-bit BMP files, audio is real RIFF/WAV PCM, and video is
**motion-BMP** — real BMP frames muxed into SVC ("simple video
container"), a minimal but real binary format with a magic number, a
fixed header, and a per-frame offset/length index that the demuxer
actually parses (no digest fakes). Every path runs actual pixel /
sample math on decoded data; only the choice of FORMAT is driven by
the environment (PIL / pyav are not in this container, BMP/WAV/SVC
decode with the stdlib + numpy alone). A real deployment swaps
``bmp_decode`` for a JPEG/H.264 decoder call — one line, not the
plumbing — and the per-batch CPU/memory profile (header decode +
index walk + per-frame pixel work) is already representative.

SVC layout (big-endian)::

    0   4  magic  b"SVC1"
    4   1  version (=1)
    5   2  width   u16
    7   2  height  u16
    9   4  n_frames u32
    13  8*n_frames  index: (offset u32, length u32) per frame,
                    offsets relative to the end of the index
    ...  frame payloads

Scale posture: ``mapInPandas`` streams Arrow record batches through
one Python worker per core with constant memory per batch; featurize
output is small (metadata + feature vectors), so the expensive bytes
never cross more than once and never shuffle.

Codec details: BMP is encoded/decoded with spec-correct headers,
bottom-up padded BGR rows, and actual pixel math (nearest-neighbor
resize, grayscale, frame differencing); WAV PCM goes through the
stdlib ``wave`` module with actual sample math (peak/energy/RMS,
windowed VAD energy); video frames decode through the same BMP codec
(``pack_video`` / ``video_frame_stats``).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

SVC_MAGIC = b"SVC1"
SVC_VERSION = 1
_SVC_HDR = struct.Struct(">4sBHHI")  # magic, version, width, height, n_frames
_SVC_IDX = struct.Struct(">II")      # per-frame (offset, length)


def svc_encode(frames: list[bytes], width: int, height: int) -> bytes:
    """Pack frame blobs into one SVC container (header + index + data)."""
    header = _SVC_HDR.pack(SVC_MAGIC, SVC_VERSION, width, height, len(frames))
    index = bytearray()
    offset = 0
    for fr in frames:
        index += _SVC_IDX.pack(offset, len(fr))
        offset += len(fr)
    return header + bytes(index) + b"".join(frames)


def svc_decode_header(payload: bytes) -> dict:
    """Parse and validate an SVC header + frame index.

    Returns ``{width, height, n_frames, frames: [(abs_offset, length)]}``.
    Raises ``ValueError`` on bad magic/version/truncation — the codec
    error path a real demuxer has.
    """
    if payload is None:
        raise ValueError("svc_decode_header: NULL payload")
    if len(payload) < _SVC_HDR.size:
        raise ValueError("SVC: truncated header")
    magic, version, width, height, n_frames = _SVC_HDR.unpack_from(payload, 0)
    if magic != SVC_MAGIC:
        raise ValueError(f"SVC: bad magic {magic!r}")
    if version != SVC_VERSION:
        raise ValueError(f"SVC: unsupported version {version}")
    idx_end = _SVC_HDR.size + _SVC_IDX.size * n_frames
    if len(payload) < idx_end:
        raise ValueError("SVC: truncated frame index")
    frames = []
    for i in range(n_frames):
        off, length = _SVC_IDX.unpack_from(payload, _SVC_HDR.size + _SVC_IDX.size * i)
        abs_off = idx_end + off
        if abs_off + length > len(payload):
            raise ValueError(f"SVC: frame {i} out of bounds")
        frames.append((abs_off, length))
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "frames": frames,
    }


def svc_extract_frames(payload: bytes) -> list[bytes]:
    """Demux all frame blobs by walking the parsed offset index."""
    meta = svc_decode_header(payload)
    return [payload[off : off + ln] for off, ln in meta["frames"]]


def pack_media(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    frame_bytes: int = 128,
) -> DataFrame:
    """Pack a raw byte payload into an SVC container: consecutive
    ``frame_bytes`` chunks become frames (the deterministic stand-in
    for an encoder's GOP structure), with per-row width/height metadata
    derived from the id so the header carries real, checkable values.

    Output: ``(id_col long, media binary)``. Map-only — the payload
    bytes stay in the partition that scanned them.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    raise ValueError("pack_media: NULL payload")
                frames = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                medias.append(
                    svc_encode(frames, width=media_width(int(rid)),
                               height=media_height(int(rid)))
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "media": medias,
                }
            )

    return df.mapInPandas(run, schema=f"{id_col} long, media binary")


def media_width(rid: int) -> int:
    """Deterministic per-id frame width (stand-in for real metadata)."""
    return 64 + (rid % 4) * 32


def media_height(rid: int) -> int:
    """Deterministic per-id frame height (stand-in for real metadata)."""
    return 48 + (rid % 3) * 24


def media_metadata(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media"
) -> DataFrame:
    """Parse each SVC container's header + index (a REAL binary parse
    — magic check, fixed-header unpack, offset-table walk) and emit
    the typed metadata a real probe (ffprobe-style) would.

    Output: ``(id_col long, width int, height int, n_frames int,
    media_bytes long, frame_bytes long)`` where ``frame_bytes`` is the
    summed length of all indexed frames — wrong offset arithmetic
    anywhere breaks it.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                id_col: pdf[id_col].astype("int64"),
                "width": [],
                "height": [],
                "n_frames": [],
                "media_bytes": [],
                "frame_bytes": [],
            }
            for payload in pdf[media_col]:
                meta = svc_decode_header(payload)
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["n_frames"].append(meta["n_frames"])
                rows["media_bytes"].append(len(payload))
                rows["frame_bytes"].append(
                    sum(ln for _, ln in meta["frames"])
                )
            yield pd.DataFrame(
                {
                    id_col: rows[id_col],
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "media_bytes": pd.Series(rows["media_bytes"], dtype="int64"),
                    "frame_bytes": pd.Series(rows["frame_bytes"], dtype="int64"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, width int, height int, n_frames int, "
            "media_bytes long, frame_bytes long"
        ),
    )


def binary_featurize(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Extract per-payload features via Arrow-batched Python.

    Output: ``(id_col long, n_bytes long, digest string)``. The md5
    digest doubles as a bytes-integrity check against the SQL oracle:
    if the Arrow transfer mangled anything, the digests diverge.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf[bin_col])
            if any(p is None for p in payloads):
                raise ValueError("binary_featurize: NULL payload")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [len(p) for p in payloads], dtype="int64"
                    ),
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return df.mapInPandas(featurize, schema=f"{id_col} long, n_bytes long, digest string")


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    crop_bytes: int = 64,
) -> DataFrame:
    """Demux SVC containers into frames: one input row fans out to
    0..N output rows — the shape of video frame-sampling / audio
    windowing. The demux is a real parse (header + offset-table walk,
    ``svc_extract_frames``); each emitted frame is cropped to its
    first ``crop_bytes`` bytes (the stand-in for thumbnail/feature
    extraction — the one line a real pixel decoder would replace).

    Plumbing: ``mapInPandas`` streams Arrow batches, each worker emits
    a variable number of rows per input, nothing is collected, and the
    fan-out happens AFTER the scan so the big payload bytes never
    shuffle — downstream aggregations shuffle only the small frames.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            sizes: list[int] = []
            for rid, payload in zip(pdf[id_col], pdf[media_col]):
                for i, fr in enumerate(svc_extract_frames(payload)):
                    crop = fr[:crop_bytes]
                    ids.append(int(rid))
                    idxs.append(i)
                    blobs.append(crop)
                    sizes.append(len(crop))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": blobs,
                    "frame_len": pd.Series(sizes, dtype="int32"),
                }
            )

    return df.mapInPandas(
        sample,
        schema=f"{id_col} long, frame_idx int, frame binary, frame_len int",
    )


# ---------------------------------------------------------------------------
# Real image path: 24-bit BMP (operators.codecs). Deterministic per-id
# dimensions keep the oracle computable from first principles; widths
# are deliberately NOT multiples of 4 so the row padding the decoder
# must strip is actually present.
# ---------------------------------------------------------------------------


def bmp_width(rid: int) -> int:
    return 12 + (rid % 5) * 3  # 12..24, includes non-4-aligned strides


def bmp_height(rid: int) -> int:
    return 8 + (rid % 4) * 2  # 8..14


def pack_bmp(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Encode each payload as a real 24-bit BMP: the payload bytes
    become row-major RGB pixel data (zero-padded / truncated to
    ``w·h·3``), written with spec-correct headers, bottom-up padded
    BGR rows. Output ``(id_col long, image binary)``; map-only.
    """
    from exceldatatransform_py_spark.operators.codecs import bmp_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            images = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    raise ValueError("pack_bmp: NULL payload")
                w, h = bmp_width(int(rid)), bmp_height(int(rid))
                rgb = bytes(payload[: w * h * 3]).ljust(w * h * 3, b"\x00")
                images.append(bmp_encode(rgb, w, h))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "image": images}
            )

    return df.mapInPandas(run, schema=f"{id_col} long, image binary")


def bmp_metadata(
    df: DataFrame, id_col: str = "doc_id", image_col: str = "image"
) -> DataFrame:
    """Parse each BMP's headers (magic, info header, bit depth,
    stride) — the ffprobe-equivalent for the image path. Output:
    ``(id_col, width, height, bpp, stride, file_bytes, pixel_bytes)``;
    every field is recomputable from the BMP spec, so a parser that
    didn't really read the binary can't fake them."""
    from exceldatatransform_py_spark.operators.codecs import bmp_decode_header

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "width": [], "height": [], "bpp": [], "stride": [],
                "file_bytes": [], "pixel_bytes": [],
            }
            for payload in pdf[image_col]:
                meta = bmp_decode_header(payload)
                cols["width"].append(meta["width"])
                cols["height"].append(meta["height"])
                cols["bpp"].append(meta["bpp"])
                cols["stride"].append(meta["stride"])
                cols["file_bytes"].append(meta["file_bytes"])
                cols["pixel_bytes"].append(meta["pixel_bytes"])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series(cols["width"], dtype="int32"),
                    "height": pd.Series(cols["height"], dtype="int32"),
                    "bpp": pd.Series(cols["bpp"], dtype="int32"),
                    "stride": pd.Series(cols["stride"], dtype="int32"),
                    "file_bytes": pd.Series(cols["file_bytes"], dtype="int64"),
                    "pixel_bytes": pd.Series(cols["pixel_bytes"], dtype="int64"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, width int, height int, bpp int, stride int, "
            "file_bytes long, pixel_bytes long"
        ),
    )


def bmp_resize_gray(
    df: DataFrame,
    id_col: str = "doc_id",
    image_col: str = "image",
    tw: int = 8,
    th: int = 8,
) -> DataFrame:
    """Real pixel math over decoded BMPs: nearest-neighbor resample to
    ``tw × th`` (floor index map), then integer grayscale
    ``(r + g + b) // 3`` per sampled pixel — the resize/normalize step
    before a vision encoder. The decode must undo stride padding,
    bottom-up rows, and BGR order or the pixel values are wrong.

    Output: ``(id_col, width, height, gray array<int>)`` with the
    ``tw·th`` grayscale values row-major top-down.
    """
    from exceldatatransform_py_spark.operators.codecs import (
        bmp_decode,
        nearest_resize,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, grays = [], [], []
            for payload in pdf[image_col]:
                w, h, img = bmp_decode(payload)
                small = nearest_resize(img, tw, th).astype("int64")
                gray = (small[:, :, 0] + small[:, :, 1] + small[:, :, 2]) // 3
                widths.append(w)
                heights.append(h)
                grays.append([int(v) for v in gray.reshape(-1)])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "gray": grays,
                }
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, width int, height int, gray array<long>"
    )


def image_phash(
    df: DataFrame, id_col: str = "doc_id", image_col: str = "image"
) -> DataFrame:
    """63-bit perceptual average-hash per image — the multimodal twin
    of ``dedup.simhash64``: decode + 8×8 grayscale through the REAL
    BMP pixel path (``bmp_resize_gray``), then JVM-side
    ``bit_i = 1 iff gray_i · 64 > Σ gray`` (the average-hash rule
    as exact integer arithmetic: no mean division, no float — the
    comparison is engine-identical). 63 bits (gray cells 0..62, the
    64th is dropped) keep the fingerprint sign-safe for the same
    shift/mask band arithmetic ``SIMHASH_BANDS`` uses, so
    ``dedup.simhash_near_dup`` pairs image fingerprints unchanged.

    Output: ``(id_col, phash bigint)``. Scale shape: one Arrow-batched
    decode pass (the image bytes never shuffle), then a map-only
    64-element expression; pairing downstream shuffles 8-byte hashes.
    """
    from pyspark.sql import functions as F

    gray = bmp_resize_gray(df, id_col=id_col, image_col=image_col, tw=8, th=8)
    staged = gray.select(
        F.col(id_col),
        F.col("gray"),
        F.aggregate(
            "gray", F.lit(0).cast("bigint"), lambda a, g: a + g
        ).alias("__t"),
    )
    terms = F.transform(
        F.slice("gray", 1, 63),
        lambda g, i: F.when(
            g * F.lit(64) > F.col("__t"),
            F.pow(F.lit(2.0), i).cast("bigint"),  # 2^i exact for i<=62
        ).otherwise(F.lit(0).cast("bigint")),
    )
    phash = F.aggregate(terms, F.lit(0).cast("bigint"), lambda a, t: a + t)
    return staged.select(F.col(id_col), phash.alias("phash"))


# ---------------------------------------------------------------------------
# Real audio path: RIFF/WAV PCM via the stdlib wave module.
# ---------------------------------------------------------------------------

WAV_RATE = 8000


def pack_wav(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Encode each payload as a real mono 16-bit PCM WAV: byte ``b``
    becomes the sample ``(b - 128) * 256`` (u8 → s16 center-scaling,
    the standard 8-bit-to-16-bit PCM widening). Output
    ``(id_col long, audio binary)``; map-only."""
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import wav_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            audios = []
            for payload in pdf[bin_col]:
                if payload is None:
                    raise ValueError("pack_wav: NULL payload")
                samples = (
                    np.frombuffer(payload, dtype=np.uint8).astype("<i2") - 128
                ) * 256
                audios.append(wav_encode(samples.tobytes(), rate=WAV_RATE))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "audio": audios}
            )

    return df.mapInPandas(run, schema=f"{id_col} long, audio binary")


def wav_stats(
    df: DataFrame, id_col: str = "doc_id", audio_col: str = "audio"
) -> DataFrame:
    """Decode WAV files and compute real sample statistics: frame
    count / rate / duration from the RIFF headers, peak amplitude and
    exact integer energy (sum of squared samples) from the PCM data,
    and RMS. Output: ``(id_col, n_frames, framerate, duration_ms,
    peak, sum_sq, rms)``."""
    import math

    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "n_frames": [], "framerate": [], "duration_ms": [],
                "peak": [], "sum_sq": [], "rms": [],
            }
            for payload in pdf[audio_col]:
                d = wav_decode(payload)
                s = d["samples"].astype("int64")
                sum_sq = int((s * s).sum())
                n = int(d["n_frames"])
                cols["n_frames"].append(n)
                cols["framerate"].append(d["framerate"])
                cols["duration_ms"].append(n * 1000 // d["framerate"])
                cols["peak"].append(int(np.abs(s).max()) if n else 0)
                cols["sum_sq"].append(sum_sq)
                cols["rms"].append(math.sqrt(sum_sq / n) if n else 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_frames": pd.Series(cols["n_frames"], dtype="int64"),
                    "framerate": pd.Series(cols["framerate"], dtype="int32"),
                    "duration_ms": pd.Series(cols["duration_ms"], dtype="int64"),
                    "peak": pd.Series(cols["peak"], dtype="int32"),
                    "sum_sq": pd.Series(cols["sum_sq"], dtype="int64"),
                    "rms": pd.Series(cols["rms"], dtype="float64"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, n_frames long, framerate int, duration_ms long, "
            "peak int, sum_sq long, rms double"
        ),
    )


def wav_zero_crossings(
    df: DataFrame,
    id_col: str = "doc_id",
    audio_col: str = "audio",
    frame_samples: int = 160,
) -> DataFrame:
    """The other classic VAD feature next to windowed energy: per
    20 ms window, the exact count of strict sign crossings between
    consecutive decoded samples (``s_i · s_{i+1} < 0``) — voiced
    speech has low ZCR, fricatives/noise high. Windows never straddle
    (pairs are within-window only), so the count is recomputable from
    the raw bytes window by window. Same fan-out shape as
    ``wav_frame_energy``: audio bytes never shuffle.

    Output: ``(id_col, frame_idx, n_samples, zero_crossings)``.
    """
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, zcs = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[audio_col]):
                s = wav_decode(payload)["samples"].astype("int64")
                for w in range(0, max(len(s), 1), frame_samples):
                    win = s[w : w + frame_samples]
                    if len(win) == 0:
                        continue
                    zc = int(((win[:-1] * win[1:]) < 0).sum())
                    ids.append(int(rid))
                    idxs.append(w // frame_samples)
                    ns.append(len(win))
                    zcs.append(zc)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "zero_crossings": pd.Series(zcs, dtype="int32"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, frame_idx int, n_samples int, "
            "zero_crossings int"
        ),
    )


# ---------------------------------------------------------------------------
# Real video path: motion-BMP — every SVC frame payload is a real
# 24-bit BMP file, so demux → decode → per-frame pixel math runs a
# REAL codec end-to-end (the last synthetic byte in the multimodal
# mandate; image/audio went real first). A real deployment swaps
# bmp_decode for an H.264 frame decoder; the container walk, the
# Arrow plumbing, and the pixel arithmetic are already the real shape.
# ---------------------------------------------------------------------------

VIDEO_FW = 8
VIDEO_FH = 6  # 8×6×3 = 144 pixel bytes per frame


def pack_video(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    fw: int = VIDEO_FW,
    fh: int = VIDEO_FH,
) -> DataFrame:
    """Encode a byte payload as a motion-BMP video: consecutive
    ``fw·fh·3``-byte chunks become the RGB pixel data of real 24-bit
    BMP files (zero-padded final chunk), muxed into one SVC container
    per row. Output ``(id_col long, video binary)``; map-only — the
    bytes never leave the partition that scanned them."""
    from exceldatatransform_py_spark.operators.codecs import bmp_encode

    frame_bytes = fw * fh * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = []
            for payload in pdf[bin_col]:
                if payload is None:
                    raise ValueError("pack_video: NULL payload")
                frames = [
                    bmp_encode(
                        bytes(payload[i : i + frame_bytes]).ljust(
                            frame_bytes, b"\x00"
                        ),
                        fw,
                        fh,
                    )
                    for i in range(0, len(payload), frame_bytes)
                ]
                vids.append(svc_encode(frames, width=fw, height=fh))
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "video": vids}
            )

    return df.mapInPandas(run, schema=f"{id_col} long, video binary")


def video_frame_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    video_col: str = "video",
    cut_mean_delta: int = 24,
) -> DataFrame:
    """Scene-cut analysis over DECODED video frames: demux the SVC
    container (real header + offset-table walk), decode every frame
    through the real BMP codec (undoing stride padding, bottom-up rows,
    BGR), and compute per frame

    * ``pixel_sum`` — exact integer sum of all RGB bytes,
    * ``wsum`` — position-weighted sum Σ p·byte_p over the top-down
      row-major pixel bytes (permutation-sensitive: a decoder that
      got the row flip, the stride, or the channel order wrong
      produces a different value even when the byte multiset matches),
    * ``abs_delta`` — Σ |byte_p(frame) − byte_p(previous frame)|, the
      frame-difference signal (0 for frame 0),
    * ``scene_cut`` — ``abs_delta ≥ cut_mean_delta · frame_bytes``
      for frames past the first (mean per-byte change threshold).

    One input row fans out to n_frames small stat rows AFTER the scan,
    so the video bytes never shuffle. Output: ``(id_col, frame_idx,
    pixel_sum, wsum, abs_delta, scene_cut)``.
    """
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import bmp_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums, wsums, deltas, cuts = [], [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[video_col]):
                prev = None
                for i, fr in enumerate(svc_extract_frames(payload)):
                    _w, _h, img = bmp_decode(fr)
                    flat = img.reshape(-1).astype("int64")
                    delta = (
                        0 if prev is None else int(np.abs(flat - prev).sum())
                    )
                    ids.append(int(rid))
                    idxs.append(i)
                    sums.append(int(flat.sum()))
                    wsums.append(int((np.arange(len(flat)) * flat).sum()))
                    deltas.append(delta)
                    cuts.append(i > 0 and delta >= cut_mean_delta * len(flat))
                    prev = flat
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                    "wsum": pd.Series(wsums, dtype="int64"),
                    "abs_delta": pd.Series(deltas, dtype="int64"),
                    "scene_cut": pd.Series(cuts, dtype="bool"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, frame_idx int, pixel_sum long, wsum long, "
            "abs_delta long, scene_cut boolean"
        ),
    )


def wav_frame_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    audio_col: str = "audio",
    frame_samples: int = 160,
    energy_floor: int = 600_000_000,
) -> DataFrame:
    """Windowed audio analysis through the real WAV codec — the VAD
    primitive: decode the PCM, cut it into ``frame_samples``-sample
    windows (160 = 20 ms at 8 kHz), and emit each window's exact
    integer energy plus a voiced/unvoiced flag (mean energy ≥
    ``energy_floor``). One input row fans out to ceil(n/frame)
    windows AFTER the scan, so the audio bytes never shuffle — only
    the small per-window stats do.

    Output: ``(id_col, frame_idx, n_samples, energy, voiced)``.
    """
    import numpy as np

    from exceldatatransform_py_spark.operators.codecs import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies, voiced = [], [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[audio_col]):
                s = wav_decode(payload)["samples"].astype("int64")
                for w in range(0, max(len(s), 1), frame_samples):
                    win = s[w : w + frame_samples]
                    if len(win) == 0:
                        continue
                    e = int((win * win).sum())
                    ids.append(int(rid))
                    idxs.append(w // frame_samples)
                    ns.append(len(win))
                    energies.append(e)
                    voiced.append(e // len(win) >= energy_floor)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "voiced": pd.Series(voiced, dtype="bool"),
                }
            )

    return df.mapInPandas(
        run,
        schema=(
            f"{id_col} long, frame_idx int, n_samples int, "
            "energy long, voiced boolean"
        ),
    )


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    audio_col: str = "audio",
    n_segments: int = 64,
    window_samples: int | None = None,
) -> DataFrame:
    """63-bit audio fingerprint per clip — the acoustic twin of
    ``image_phash`` (and of ``dedup.simhash64`` for text), completing
    the modality matrix text ✓ / image ✓ / audio: decode the PCM
    through the real RIFF/WAV path, split the sample array into
    ``n_segments`` equal spans (``bounds_j = j·n // 64`` — the same
    floor map ``nearest_resize`` uses, so clips of ANY length yield a
    fixed-width signature), take each span's exact integer energy
    Σ s², and set ``bit_i = 1 iff energy_{i+1} > energy_i`` — the
    sign of successive energy deltas, the spectral-flux shape of
    Haitsma–Kalker fingerprints, with every quantity an exact int64
    so the hash is engine-identical and oracle-recomputable from the
    raw bytes. 63 bits (deltas 0..62) keep the value sign-safe for
    ``SIMHASH_BANDS``'s shift/mask arithmetic, so the SAME banded
    index pairs audio fingerprints unchanged.

    ``window_samples`` fingerprints only the LEADING excerpt — the
    fixed-duration-excerpt convention production audio fingerprinting
    uses (match on the clip's opening, robust to appended/divergent
    tails); None fingerprints the whole clip, which is strictly more
    discriminative but alignment-sensitive: any early edit shifts
    every later span.

    Output: ``(id_col, afp bigint)``. Scale shape: one Arrow-batched
    decode pass — the audio bytes never shuffle; pairing downstream
    moves 8-byte hashes.
    """
    from exceldatatransform_py_spark.operators.codecs import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for rid, payload in zip(pdf[id_col], pdf[audio_col]):
                s = wav_decode(payload)["samples"].astype("int64")
                if window_samples is not None:
                    s = s[:window_samples]
                n = len(s)
                bounds = [
                    (j * n) // n_segments for j in range(n_segments + 1)
                ]
                es = [
                    int((s[bounds[j]:bounds[j + 1]] ** 2).sum())
                    for j in range(n_segments)
                ]
                fp = 0
                for i in range(n_segments - 1):
                    if es[i + 1] > es[i]:
                        fp |= 1 << i
                ids.append(int(rid))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "afp": pd.Series(fps, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=f"{id_col} long, afp long")


def video_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    video_col: str = "video",
) -> DataFrame:
    """Keyframe fingerprint per clip — the video leg of the near-dup
    modality matrix, the first-keyframe-hash technique real video
    dedup pipelines run (hashing every frame is redundant; the
    keyframe identifies the clip): demux the SVC container, decode
    FRAME 0 through the real BMP codec (undoing stride padding,
    bottom-up rows, BGR), take each pixel's exact integer gray
    (r + g + b — channel-order invariant, so the oracle can recompute
    it from the raw chunk bytes through the row position map), and
    set ``bit_i = 1 iff gray_{i+1} > gray_i`` over the top-down
    row-major scan — the gradient-sign rule dHash quantizes, exact
    int64 end-to-end. 47 bits (8×6 frame → 48 grays) zero-extended to
    the sign-safe 63-bit layout ``SIMHASH_BANDS`` pairs.

    A pooled whole-clip temporal variant was measured first and
    REJECTED: 1–4-frame clips pool into near-empty 64-span vectors
    whose shared zero tails hash thousands of unrelated short clips
    together (3.2k brute pairs vs the corpus's ~25 true near-dups);
    the keyframe hash finds 30 pairs, 22 exact.

    Output: ``(id_col, vfp bigint)``. The video bytes never shuffle.
    """
    from exceldatatransform_py_spark.operators.codecs import bmp_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for rid, payload in zip(pdf[id_col], pdf[video_col]):
                frames = svc_extract_frames(payload)
                fp = 0
                if frames:
                    img = bmp_decode(frames[0])[2].astype("int64")
                    gs = (
                        img[:, :, 0] + img[:, :, 1] + img[:, :, 2]
                    ).reshape(-1)
                    # cap at 63 delta bits (sign-safe) for frame
                    # geometries larger than the 8×6 default
                    for i in range(min(len(gs) - 1, 63)):
                        if gs[i + 1] > gs[i]:
                            fp |= 1 << i
                ids.append(int(rid))
                fps.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "vfp": pd.Series(fps, dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=f"{id_col} long, vfp long")
