"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata, processed batch-wise
through ``mapInPandas`` (Arrow binary arrays — zero-copy into Python
``bytes``). The actual decoders (PIL/librosa/ffmpeg) are NOT in this
container, so the decode kernel is a clearly-marked deterministic fake /
``NotImplementedError`` gate; everything around it — schema, batch shape,
partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

HAS_REAL_DECODERS = False  # flips when PIL/soundfile are importable
try:  # pragma: no cover - not available in this container
    import PIL.Image  # noqa: F401

    HAS_REAL_DECODERS = True
except Exception:
    pass


def _fake_decode_features(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'decode': derive (width, height, mean_luma) from
    an md5 of the payload. Stands in for a real image decode (replace the
    body with PIL when available); md5 keeps it DuckDB-replicable so the
    driver oracle checks the whole plumbing end-to-end."""
    h = hashlib.md5(payload).hexdigest()
    width = 64 + int(h[0:2], 16) % 192
    height = 64 + int(h[2:4], 16) % 192
    mean_luma = round(int(h[4:6], 16) / 255.0, 6)
    return width, height, mean_luma


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(id..., payload:binary) → typed metadata via per-batch extraction."""

    out_schema = "doc_id long, n_bytes int, width int, height int, mean_luma double"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf[payload_col]
            feats = np.array([_fake_decode_features(bytes(p)) for p in payloads], dtype=object)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "width": feats[:, 0].astype("int32"),
                    "height": feats[:, 1].astype("int32"),
                    "mean_luma": feats[:, 2].astype("float64"),
                }
            )

    return df.mapInPandas(extract, schema=out_schema)


HAS_VIDEO_DECODERS = False  # flips when pyav/ffmpeg are importable
try:  # pragma: no cover - not available in this container
    import av  # noqa: F401

    HAS_VIDEO_DECODERS = True
except Exception:
    pass


def _fake_frame_features(payload: bytes, frame_idx: int) -> tuple[float, int]:
    """Deterministic fake per-frame 'decode': (mean_luma, phash16) derived
    from md5(payload || '-' || frame_idx) — string-keyed so a DuckDB
    oracle reproduces it. Replace with pyav frame extraction when
    available (HAS_VIDEO_DECODERS)."""
    h = hashlib.md5(payload + b"-" + str(frame_idx).encode()).hexdigest()
    return round(int(h[0:2], 16) / 255.0, 6), int(h[2:6], 16)


def frame_sample(
    df: DataFrame, payload_col: str = "payload", every_n: int = 10
) -> DataFrame:
    """Video frame sampling over opaque binary payloads: one output row per
    sampled frame (every ``every_n``-th of the payload's frame count).
    The Spark plumbing — mapInPandas over Arrow binary, per-row explosion
    to frame rows, deterministic frame indexing — is real; the decode is a
    clearly-marked deterministic fake (frame count = 1 + n_bytes // 256)
    because ffmpeg/pyav are absent from this container
    (HAS_VIDEO_DECODERS gates the real path)."""

    out_schema = "doc_id long, frame_idx int, mean_luma double, phash16 int"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids, idxs, lumas, phashes = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf[payload_col]):
                payload = bytes(p)
                n_frames = 1 + len(payload) // 256
                for fi in range(0, n_frames, every_n):
                    luma, ph = _fake_frame_features(payload, fi)
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    lumas.append(luma)
                    phashes.append(ph)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(doc_ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "mean_luma": np.asarray(lumas, dtype=np.float64),
                    "phash16": np.asarray(phashes, dtype=np.int32),
                }
            )

    return df.mapInPandas(sample, schema=out_schema)
