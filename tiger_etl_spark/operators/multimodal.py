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


def real_decoder_stub(blob: bytes) -> list[float]:
    """The production decode hook. Image/audio libs are not available in
    this environment — wire PIL / torchvision / librosa here."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; pass decoder=... to extract_media_features"
    )
