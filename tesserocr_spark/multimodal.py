"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video codecs are not available in this container, so the
decode step is a clearly-marked deterministic stub; everything Spark-side —
binary column handling, Arrow batch shape, ``mapInPandas`` signature,
partition independence — is real and tested. Swap ``_decode_one`` for a real
decoder (PIL/ffmpeg) on a cluster with the libs installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def _decode_one(payload: bytes) -> dict:
    """STUB decoder: deterministic fake metadata derived from the bytes.

    A real implementation would parse the container header (e.g. PNG IHDR,
    WAV fmt chunk) — raise NotImplementedError there if given an unknown
    codec. The fake is a pure function of the payload so results are
    partition-independent.
    """
    n = len(payload)
    return {"n_bytes": n, "fake_width": n % 640, "n_frames": n % 7}


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
