"""Real public-format media codecs, dependency-free.

The multimodal mandate needs actual image/audio decode, not just
container plumbing — but this environment has no PIL/pyav. Two
public formats are decodable with the stdlib alone, so those are the
image and audio paths:

* **BMP** (Windows DIB, 24-bit uncompressed) via ``struct``: the
  encoder writes a spec-correct BITMAPFILEHEADER + BITMAPINFOHEADER
  and BGR pixel rows stored bottom-up with 4-byte row padding — a
  file any image viewer opens; the decoder validates the magic /
  header sizes / bit depth, strips the row padding, re-flips the
  rows, and swaps BGR back to RGB. Wrong stride, flip, or channel
  order anywhere breaks the pixel-exact oracles downstream.
* **WAV** (RIFF PCM) via the stdlib ``wave`` module: mono 16-bit PCM
  encode/decode with real RIFF chunk headers.

Both codecs are pure byte/array transforms, safe to ship to Python
workers inside Arrow-batched ``mapInPandas`` (see
``operators.multimodal``).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (40 bytes)
BMP_HDR_BYTES = BMP_FILE_HDR.size + BMP_INFO_HDR.size  # 54
_PPM = 2835  # 72 DPI in pixels/metre, the conventional default


def bmp_row_stride(width: int) -> int:
    """Bytes per stored pixel row: 3·width rounded up to 4 bytes."""
    return (width * 3 + 3) // 4 * 4


def bmp_encode(rgb: bytes, width: int, height: int) -> bytes:
    """Encode row-major top-down RGB triples as a 24-bit BMP file.

    ``rgb`` must be exactly ``width * height * 3`` bytes. The file
    stores rows bottom-up, channels as BGR, rows padded to 4 bytes —
    the real on-disk layout, not a private container.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"bmp_encode: need {width * height * 3} bytes, got {len(rgb)}"
        )
    stride = bmp_row_stride(width)
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    body = rows.tobytes()
    info = BMP_INFO_HDR.pack(
        BMP_INFO_HDR.size, width, height, 1, 24, 0, stride * height,
        _PPM, _PPM, 0, 0,
    )
    file_hdr = BMP_FILE_HDR.pack(
        b"BM", BMP_HDR_BYTES + len(body), 0, 0, BMP_HDR_BYTES
    )
    return file_hdr + info + body


def bmp_decode_header(payload: bytes) -> dict:
    """Parse + validate the two BMP headers.

    Returns ``{width, height, bpp, stride, data_offset, file_bytes,
    pixel_bytes}``. Raises ``ValueError`` on anything this decoder
    does not support (compressed, paletted, top-down) — the honest
    codec error path.
    """
    if payload is None:
        raise ValueError("bmp_decode: NULL payload")
    if len(payload) < BMP_HDR_BYTES:
        raise ValueError("bmp_decode: truncated header")
    magic, file_size, _, _, offset = BMP_FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError(f"bmp_decode: bad magic {magic!r}")
    (
        info_size, width, height, planes, bpp, compression,
        _img_size, _xppm, _yppm, _clr_used, _clr_imp,
    ) = BMP_INFO_HDR.unpack_from(payload, BMP_FILE_HDR.size)
    if info_size < BMP_INFO_HDR.size:
        raise ValueError(f"bmp_decode: unsupported info header {info_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"bmp_decode: unsupported format (planes={planes}, "
            f"bpp={bpp}, compression={compression})"
        )
    if height <= 0 or width <= 0:
        raise ValueError("bmp_decode: top-down or degenerate bitmap")
    stride = bmp_row_stride(width)
    if offset + stride * height > len(payload):
        raise ValueError("bmp_decode: truncated pixel data")
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "stride": stride,
        "data_offset": offset,
        "file_bytes": file_size,
        "pixel_bytes": width * height * 3,
    }


def bmp_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 24-bit BMP to ``(width, height, uint8[h, w, 3] RGB)``
    in top-down row order — undoing the stride padding, the bottom-up
    storage, and the BGR channel order."""
    meta = bmp_decode_header(payload)
    w, h, stride, off = (
        meta["width"], meta["height"], meta["stride"], meta["data_offset"]
    )
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return w, h, rows[::-1, :, ::-1].copy()  # un-flip, BGR→RGB


def nearest_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample (floor index map — source pixel
    ``(y*H//th, x*W//tw)``), the standard pre-encoder normalization."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[ys][:, xs]


def wav_encode(pcm_s16le: bytes, rate: int = 8000) -> bytes:
    """Encode mono 16-bit little-endian PCM as a RIFF/WAV file via the
    stdlib ``wave`` writer (real chunk headers, fmt block, data)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm_s16le)
    return buf.getvalue()


def wav_decode(payload: bytes) -> dict:
    """Decode a WAV file: params + samples as int16 numpy array.

    Returns ``{n_channels, sampwidth, framerate, n_frames, samples}``.
    The stdlib parser raises on malformed RIFF structure.
    """
    if payload is None:
        raise ValueError("wav_decode: NULL payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        params = w.getparams()
        frames = w.readframes(params.nframes)
    if params.sampwidth != 2:
        raise ValueError(f"wav_decode: unsupported sampwidth {params.sampwidth}")
    samples = np.frombuffer(frames, dtype="<i2")
    return {
        "n_channels": params.nchannels,
        "sampwidth": params.sampwidth,
        "framerate": params.framerate,
        "n_frames": params.nframes,
        "samples": samples,
    }
