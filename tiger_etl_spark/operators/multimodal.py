"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` operators. The decode step itself is STUBBED (no
image/audio libraries in this container): `decoder=None` uses a
deterministic fake (byte-statistics "features") so the Spark-side
plumbing — schema, batching, partitioning, UDF signature — is real and
tested; pass a real decoder callable (e.g. PIL/librosa-backed) in
production.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "media_type string, width int, height int, duration_ms long, codec string"
)


def _fake_decode_features(blob: bytes | None, n_features: int) -> list[float] | None:
    """Deterministic stand-in for a real decoder: fixed-length byte
    statistics. Replace with a real decode+embed in production."""
    if blob is None:
        return None
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * n_features
    chunks = np.array_split(arr.astype(np.float64), n_features)
    return [float(c.mean()) if c.size else 0.0 for c in chunks]


def extract_media_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    n_features: int = 8,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """blob → float feature vector via mapInPandas (Arrow batches in and
    out; pandas ops only). At scale: repartition upstream so batches are
    bounded by `spark.sql.execution.arrow.maxRecordsPerBatch` × mean
    blob size; no driver involvement."""

    decode = decoder or (lambda b: _fake_decode_features(b, n_features))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": pdf[blob_col].map(
                        lambda b: decode(bytes(b)) if b is not None else None
                    ),
                }
            )

    schema = f"{id_col} long, features array<double>"
    return df.select(id_col, blob_col).mapInPandas(op, schema=schema)


def _fake_resize(blob: bytes | None, width: int, height: int) -> bytes | None:
    """Deterministic stand-in for an image resize: nearest-neighbor
    sample of the raw bytes down/up to width*height bytes (grayscale
    stand-in). Replace with a real decode→resize→encode in production."""
    if blob is None:
        return None
    n = width * height
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return bytes(n)
    idx = (np.arange(n) * arr.size // n).clip(0, arr.size - 1)
    return arr[idx].tobytes()


def resize_media(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int,
    height: int,
    resizer: Callable[[bytes], bytes] | None = None,
) -> DataFrame:
    """blob → resized blob via mapInPandas. The Spark-side plumbing
    (Arrow binary batches both directions, schema, batch bounds via
    spark.sql.execution.arrow.maxRecordsPerBatch) is real; the pixel
    work is the injected `resizer` (deterministic fake by default — see
    module docstring)."""
    resize = resizer or (lambda b: _fake_resize(b, width, height))

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": pdf[blob_col].map(
                        lambda b: resize(bytes(b)) if b is not None else None
                    ),
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        op, schema=f"{id_col} long, resized binary"
    )


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    n_frames: int,
) -> DataFrame:
    """Video-style frame sampling: each blob (a frame-concatenated
    stream stand-in) fans out to `n_frames` evenly-spaced chunk rows
    (frame_idx, frame). mapInPandas yields MORE rows than it consumes —
    the one-to-many shape real frame extraction needs; downstream
    per-frame operators (feature extract, dedup) then run row-wise. At
    scale, repartition upstream so a batch × n_frames of frame bytes
    stays within executor memory."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                chunks = np.array_split(arr, n_frames)
                for i, c in enumerate(chunks):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(c.tobytes())
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, blob_col).mapInPandas(
        op, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def real_decoder_stub(blob: bytes) -> list[float]:
    """The production decode hook. Image/audio libs are not available in
    this environment — wire PIL / torchvision / librosa here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; pass decoder=... to extract_media_features"
    )
