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
