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
