"""Multimodal (image/audio/video) column operators (SURVEY §7).

Media are opaque ``binary`` columns plus typed metadata. The Spark
plumbing — schemas, Arrow-batched ``mapInPandas`` iteration, batch
shapes, partition behavior — is real and tested; the actual codec
calls are STUBBED because the image/audio libraries are not in this
container:

- if PIL/soundfile are importable they are used;
- otherwise ``allow_fake=True`` switches to a *deterministic fake*
  (features derived from md5 of the payload bytes) so the pipeline
  shape is exercised end-to-end, and ``allow_fake=False`` raises
  ``NotImplementedError`` — the clearly-marked stub boundary.

Scale notes: decode is the textbook Pandas-UDF case — pure Python
per-item work, Arrow-batched, embarrassingly parallel. The operators
keep media bytes OUT of shuffles: metadata/features are computed in a
map-only stage and the binary column is dropped before anything wide.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # noqa: BLE001
    _HAS_PIL = False


# magic-byte prefixes -> sniffed media type (JVM-side, no UDF)
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "riff",  # wav/avi container
    "664c6143": "audio/flac",
    "00000018": "video/mp4",
    "00000020": "video/mp4",
}


def attach_metadata(df: DataFrame, binary_col: str, id_cols: list[str]) -> DataFrame:
    """Typed metadata for an opaque binary column — size, content md5,
    magic-byte sniffed type. Pure built-in functions: stays in
    whole-stage codegen, no Python round trip."""
    hexhead = F.lower(F.hex(F.substring(F.col(binary_col), 1, 4)))
    sniff = F.lit("application/octet-stream")
    for magic, mime in _MAGIC.items():
        sniff = F.when(hexhead.startswith(magic), F.lit(mime)).otherwise(sniff)
    return df.select(
        *id_cols,
        F.length(F.col(binary_col)).alias("n_bytes"),
        F.md5(F.col(binary_col)).alias("content_md5"),
        sniff.alias("media_type"),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': dim floats in [-1, 1) derived from
    md5(payload || i). Stands in for a real image/audio feature
    extractor with identical schema/batch behavior."""
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        h = int(hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()[:12], 16)
        out[i] = (h % 2000) / 1000.0 - 1.0
    return out


def extract_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    dim: int = 16,
    allow_fake: bool = True,
) -> DataFrame:
    """Per-item feature extraction via ``mapInPandas`` (Arrow batches).

    Real decode path requires PIL (absent here); the deterministic
    fake keeps schema/batching real. Output: (id, feature
    array<float>, n_bytes)."""
    if not _HAS_PIL and not allow_fake:
        raise NotImplementedError(
            "media decode requires PIL/soundfile, not available in this "
            "container; pass allow_fake=True for the deterministic stub"
        )

    schema = f"{id_col} long, feature array<float>, n_bytes long"

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(b if isinstance(b, bytes) else bytes(b), dim)
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(b) for b in pdf[binary_col]],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(mapper, schema)


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    width: int = 64,
    height: int = 64,
    allow_fake: bool = True,
) -> DataFrame:
    """Thumbnail/resize plumbing via ``mapInPandas``.

    With PIL present each payload is decoded, resized to
    (width, height) and re-encoded PNG; without it the deterministic
    fake emits an md5-keystream payload of exactly width*height bytes
    (one byte per output pixel) so the schema, batch shape and output
    sizing behave like the real thing. Media bytes stay in a map-only
    stage — the resized column is produced and (by the caller) sunk
    without ever entering a shuffle."""
    if not _HAS_PIL and not allow_fake:
        raise NotImplementedError(
            "image resize requires PIL, not available in this container; "
            "pass allow_fake=True for the deterministic stub"
        )

    schema = f"{id_col} long, thumb binary, width int, height int, n_bytes_in long"

    def _fake_resize(payload: bytes) -> bytes:
        out = bytearray()
        seed = hashlib.md5(payload).digest()
        while len(out) < width * height:
            seed = hashlib.md5(seed).digest()
            out.extend(seed)
        return bytes(out[: width * height])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [b if isinstance(b, bytes) else bytes(b) for b in pdf[binary_col]]
            if _HAS_PIL:  # pragma: no cover - PIL absent in container
                import io

                thumbs = []
                for b in raw:
                    img = Image.open(io.BytesIO(b)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    thumbs.append(buf.getvalue())
            else:
                thumbs = [_fake_resize(b) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "thumb": thumbs,
                    "width": width,
                    "height": height,
                    "n_bytes_in": [len(b) for b in raw],
                }
            )

    return df.select(id_col, binary_col).mapInPandas(mapper, schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    n_frames_col: str,
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling *plan* for video rows: one output row per kept
    frame index. The decode of each frame is the stubbed step; the
    explode/selection plumbing (what actually shapes the 100 TB job)
    is real: sequence+explode is JVM-side and the fan-out happens
    AFTER filtering, so only kept frame indices materialize."""
    return (
        df.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_index"),
        )
    )
