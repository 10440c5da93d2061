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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(blob: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Real PNG decode from the stdlib alone (zlib inflate + per-scanline
    de-filter, PNG spec §9 filters 0–4): returns (width, height,
    n_channels, uint8 pixel array of shape [height, width, channels]).
    Supports 8-bit grayscale (color type 0), RGB (2), grayscale+alpha
    (4) and RGBA (6), non-interlaced — the shapes crawl pipelines
    actually meet. No PIL/torchvision needed, so the decode path is a
    working production decoder for PNG, not a stub."""
    import struct
    import zlib

    if blob[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(blob):
        (length,), ctype = struct.unpack(">I", blob[pos:pos + 4]), blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = line + prev
        else:  # Sub / Average / Paeth need the in-progress row
            cur = line
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                b = int(prev[x])
                if f == 1:
                    cur[x] = (int(line[x]) + a) & 0xFF
                elif f == 3:
                    cur[x] = (int(line[x]) + (a + b) // 2) & 0xFF
                elif f == 4:
                    c = int(prev[x - channels]) if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
        out[y] = cur
        prev = out[y]
    return width, height, channels, out.reshape(height, width, channels)


def make_png_decoder(n_features: int = 8) -> Callable[[bytes], list[float]]:
    """A real decode→featurize hook for `extract_media_features`:
    PNG pixels (stdlib decode above) → n_features chunked means over the
    de-filtered pixel stream. The same callable shape a PIL/torch-backed
    embedder would have."""

    def decode(blob: bytes) -> list[float]:
        _, _, _, px = decode_png(blob)
        flat = px.astype(np.float64).ravel()
        chunks = np.array_split(flat, n_features)
        return [float(c.mean()) if c.size else 0.0 for c in chunks]

    return decode


def real_decoder_stub(blob: bytes) -> list[float]:
    """The production decode hook for non-PNG media. PNG decodes for
    real via `make_png_decoder` (pure stdlib); other formats (JPEG,
    audio, video) need libraries not present in this container — wire
    PIL / torchvision / librosa here."""
    if blob[:8] == PNG_MAGIC:
        return make_png_decoder()(blob)
    raise NotImplementedError(
        "non-PNG media decoding requires image/audio libraries not present "
        "in this container; pass decoder=... to extract_media_features"
    )
