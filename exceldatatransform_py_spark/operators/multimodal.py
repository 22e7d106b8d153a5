"""Multimodal column plumbing (north-star mandate).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The Spark-side machinery — schema, Arrow batch
transfer, ``mapInPandas`` signatures, partitioning — is real and
tested; the actual media *decoding* is stubbed (the codec libraries
are not in this environment) behind ``decode_stub`` so swapping in
PIL/ffmpeg later changes one function, not the plumbing.

Scale posture: ``mapInPandas`` streams Arrow record batches through
one Python worker per core with constant memory per batch; featurize
output is small (metadata + feature vectors), so the expensive bytes
never cross more than once and never shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake "decode" standing in for an image/audio codec.

    Real deployments replace this with PIL / torchaudio / pyav decode;
    everything else in the pipeline (schema, batching, partitioning)
    is agnostic to what runs here. Raises on None to mirror a codec
    error path.
    """
    if payload is None:
        raise NotImplementedError("decode_stub: NULL payload (codec error path)")
    return {
        "n_bytes": len(payload),
        "digest": hashlib.md5(payload).hexdigest(),
    }


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
            feats = [decode_stub(p) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [f["n_bytes"] for f in feats], dtype="int64"
                    ),
                    "digest": [f["digest"] for f in feats],
                }
            )

    return df.mapInPandas(featurize, schema=f"{id_col} long, n_bytes long, digest string")


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Sample "frames" from a media payload: one input row fans out to
    0..N output rows (every ``stride``-th fixed-size chunk), the shape
    of video frame-sampling / audio windowing.

    The chunker stands in for a real demuxer (pyav/ffmpeg — not in
    this container; swap ``_chunks`` only). The plumbing is the real
    thing: ``mapInPandas`` streams Arrow batches, each worker emits a
    variable number of rows per input, nothing is collected, and the
    fan-out happens AFTER the scan so the big payload bytes never
    shuffle — downstream aggregations shuffle only the small frames.
    """

    def _chunks(payload: bytes) -> list[bytes]:
        if payload is None:
            raise NotImplementedError("frame_sample: NULL payload (demux error path)")
        frames = [
            payload[i : i + frame_bytes]
            for i in range(0, len(payload), frame_bytes)
        ]
        return frames[::stride]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            blobs: list[bytes] = []
            sizes: list[int] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                for i, fr in enumerate(_chunks(payload)):
                    ids.append(int(rid))
                    idxs.append(i)
                    blobs.append(fr)
                    sizes.append(len(fr))
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


def resize_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    target_bytes: int = 32,
) -> DataFrame:
    """Normalize payloads to a fixed size (truncate/zero-pad) — the
    stand-in for image resize/letterbox before a vision encoder. Row
    count and partitioning are preserved (map-only, no shuffle);
    output schema carries the typed metadata a real resize would
    (original + final dimensions).
    """

    def _resize(payload: bytes) -> bytes:
        if payload is None:
            raise NotImplementedError("resize_stub: NULL payload (codec error path)")
        return payload[:target_bytes].ljust(target_bytes, b"\x00")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf[bin_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "orig_len": pd.Series(
                        [len(p) for p in payloads], dtype="int32"
                    ),
                    "resized": [_resize(p) for p in payloads],
                    "resized_len": pd.Series(
                        [target_bytes] * len(payloads), dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(
        run,
        schema=f"{id_col} long, orig_len int, resized binary, resized_len int",
    )
