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
    a sha1 of the payload. Stands in for a real image decode; replace the
    body with PIL when available."""
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
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


def frame_sample(df: DataFrame, payload_col: str = "payload", every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: real decode requires ffmpeg (absent)."""
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav, not present in this container; "
        "the binary-column plumbing path is binary_metadata()"
    )
