"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two decode tiers:

* **Real container parsing** (``parse_bmp`` / ``parse_wav`` + the
  ``decode_map`` kernel): pure-Python ``struct`` parsing of the BMP
  BITMAPINFOHEADER and the RIFF/WAVE chunk list — fixed public layouts that
  need no codec dependency (mirrors the reference's BMP-roundtrip ingest,
  ``tesserocr/tesserocr.pyx:362-369`` ``_image_buffer`` /
  ``SetImageBytesBmp`` ``:1752-1772``). Malformed or unknown payloads fall
  back to the deterministic stub rather than raising, so a 100 TB scan
  never dies on one bad blob.
* **Deterministic stub** (``_decode_one`` + ``decode_stub_map``): fake
  metadata as a pure function of the bytes, kept for payloads with no
  parseable container (and frozen by the ``multimodal_stub`` oracle law).
  Pixel decode / resample of compressed formats (PNG/JPEG/MP4) still needs
  PIL/ffmpeg and stays stubbed in ``resize_stub_map``.

Everything Spark-side — binary column handling, Arrow batch shape,
``mapInPandas`` signatures, partition independence — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd


def _decode_one(payload: bytes) -> dict:
    """STUB decoder: deterministic fake metadata derived from the bytes —
    the fallback for payloads with no parseable container header. A pure
    function of the payload so results are partition-independent."""
    n = len(payload)
    return {"n_bytes": n, "fake_width": n % 640, "n_frames": n % 7}


def parse_bmp(payload: bytes) -> dict | None:
    """REAL BMP header parser (BITMAPFILEHEADER + BITMAPINFOHEADER, the
    fixed public little-endian layout). Returns None unless the payload is
    a structurally valid uncompressed BMP whose declared pixel array fits
    inside the buffer. Negative height (top-down rows) is normalized."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:  # BITMAPCOREHEADER etc. — not carried
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32):
        return None
    if width <= 0 or height == 0 or width > 1 << 20 or abs(height) > 1 << 20:
        return None
    stride = ((width * bpp + 31) // 32) * 4  # rows pad to 4 bytes
    if pixel_off + stride * abs(height) > len(payload):
        return None
    return {
        "format": "bmp",
        "width": width,
        "height": abs(height),
        "bpp": bpp,
        "n_channels": 3 if bpp >= 16 else 1,
        "sample_rate": 0,
        "n_frames": 1,
        "n_bytes": len(payload),
    }


def parse_wav(payload: bytes) -> dict | None:
    """REAL RIFF/WAVE parser: walks the word-aligned chunk list for the
    ``fmt `` and ``data`` chunks (tolerates extra chunks like LIST before
    either). Returns None unless both are present and self-consistent."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    off, fmt, data_size = 12, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        if off + 8 + size > len(payload):
            return None
        if cid == b"fmt " and size >= 16:
            _tag, ch, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, off + 8
            )
            fmt = (ch, rate, bits)
        elif cid == b"data":
            data_size = size
        off += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data_size is None:
        return None
    ch, rate, bits = fmt
    frame_bytes = ch * (bits // 8)
    if ch == 0 or bits % 8 or frame_bytes == 0:
        return None
    return {
        "format": "wav",
        "width": 0,
        "height": 0,
        "bpp": bits,
        "n_channels": ch,
        "sample_rate": rate,
        "n_frames": data_size // frame_bytes,
        "n_bytes": len(payload),
    }


def decode_media(payload: bytes) -> dict:
    """Real decode with stub fallback: BMP → WAV → deterministic stub
    (format='raw', stub law for width/frames, so unknown blobs still yield
    stable, partition-independent metadata instead of failing the scan)."""
    meta = parse_bmp(payload) or parse_wav(payload)
    if meta is not None:
        return meta
    stub = _decode_one(payload)
    return {
        "format": "raw",
        "width": stub["fake_width"],
        "height": 0,
        "bpp": 8,
        "n_channels": 1,
        "sample_rate": 0,
        "n_frames": stub["n_frames"],
        "n_bytes": stub["n_bytes"],
    }


DECODE_SCHEMA = (
    "doc_id bigint, format string, width int, height int, bpp int, "
    "n_channels int, sample_rate int, n_frames int, n_bytes bigint"
)


def decode_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload:binary) -> DECODE_SCHEMA rows
    via the real BMP/WAV parsers with stub fallback."""
    cols = [c.split()[0] for c in DECODE_SCHEMA.split(", ")]
    for pdf in batches:
        # NULL payloads (normal in a binary column at corpus scale) decode
        # as empty blobs via the stub fallback — a scan never dies on one
        metas = [
            decode_media(bytes(p) if p is not None else b"")
            for p in pdf["payload"]
        ]
        out = pd.DataFrame(metas, columns=cols[1:])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def make_bmp(width: int, height: int, bpp: int = 24, fill: int = 0) -> bytes:
    """Build a structurally valid uncompressed bottom-up BMP (test/synth
    helper — also documents the exact layout ``parse_bmp`` reads)."""
    stride = ((width * bpp + 31) // 32) * 4
    data = bytes([fill & 0xFF]) * (stride * height)
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def make_wav(channels: int, rate: int, bits: int, n_frames: int) -> bytes:
    """Build a valid PCM RIFF/WAVE container (test/synth helper)."""
    data = bytes(n_frames * channels * (bits // 8))
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_payload_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: doc_id -> deterministic real container bytes
    (WAV for doc_id % 3 == 0, else 24-bpp BMP) — the payload source for the
    ``multimodal_decode`` oracle query, whose DuckDB twin predicts the
    header fields arithmetically from doc_id."""
    for pdf in batches:
        payloads = []
        for doc_id in pdf["doc_id"]:
            i = int(doc_id)
            if i % 3 == 0:
                payloads.append(
                    make_wav(1 + i % 2, 8000 + (i % 5) * 1000, 8 + (i % 2) * 8,
                             100 + i % 50)
                )
            else:
                payloads.append(make_bmp(1 + i % 64, 1 + i % 32, 24, i % 256))
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payloads})


def decode_stub_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload:binary) -> decoded metadata."""
    for pdf in batches:
        metas = [_decode_one(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def frame_sample_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: explode each payload into its sampled 'frames'
    (one row per frame) — the fan-out shape a video pipeline needs.
    Frame payloads are stubbed as byte slices."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            meta = _decode_one(payload)
            for f in range(meta["n_frames"]):
                chunk = bytes(payload[f::7][:16])
                rows.append((doc_id, f, chunk))
        yield pd.DataFrame(rows, columns=["doc_id", "frame_id", "frame_bytes"])

N_FEATURES = 16


def feature_extract_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload:binary) -> fixed-width feature
    vector. Unlike the decode stub this is REAL: a normalized 16-bin byte
    histogram is a legitimate content feature (usable for embedding-style
    similarity) and needs no codec. Output column ``features`` is
    array<double> of length N_FEATURES, partition-independent."""
    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            hist = [0] * N_FEATURES
            for b in payload:
                hist[b >> 4] += 1
            n = max(1, len(payload))
            feats.append([c / n for c in hist])
        yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "features": feats})


def resize_stub_map(
    target_width: int,
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    """mapInPandas kernel factory: (doc_id, payload:binary) -> resized
    payload + new geometry. The pixel resample itself needs an image codec
    and is STUBBED as a deterministic byte subsample proportional to the
    scale factor; the Spark plumbing (closure parameterization, binary in /
    binary out, metadata columns) is the real shape a resize stage has."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = _decode_one(payload)
                src_w = max(1, meta["fake_width"])
                scale = min(1.0, target_width / src_w)
                step = max(1, int(round(1 / scale)) if scale < 1 else 1)
                resized = bytes(payload[::step])
                rows.append(
                    (doc_id, min(src_w, target_width), len(resized), resized)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "n_bytes", "payload"]
            )

    return kernel
