"""Multimodal (image/audio/video) column plumbing.

Not in the reference (Kats is numeric-only); first-class pipeline
extension: media travels as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages.

The media libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernel is STUBBED — ``decode_features`` computes deterministic
byte-level pseudo-features (documented fake) unless a real decoder is
injected, and ``decode_real`` raises NotImplementedError naming the
missing dependency.  Everything Spark-side — schema, batching, partition
sizing, UDF signatures — is real and tested; swapping the kernel for a
PIL/ffmpeg implementation changes no plan shape.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of rows
fits executor memory, and prefer ``mapInPandas`` (iterator API) so only
one Arrow batch is resident per task.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, mime string, n_bytes bigint, sha256 string"
)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side: size, sha2, magic-based
    mime sniff (first bytes)."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("52494646"), "audio/wav")
        .when(magic.startswith("00000018"), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.withColumns(
        {
            "n_bytes": F.length(p).cast("bigint"),
            "sha256": F.sha2(p, 256),
            "mime": mime,
        }
    )


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
) -> DataFrame:
    """STUB decode -> feature vector.

    Deterministic fake: features are derived from the payload's sha256
    digest bytes (stable across runs/engines), standing in for a real
    embed/resize kernel.  The mapInPandas shape — iterator of batches in,
    (id, features array<float>) out — is exactly what a PIL/torch kernel
    uses."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                digest = hashlib.sha256(bytes(payload)).digest()
                vec = np.frombuffer(digest[: n_features * 4], dtype=np.uint32)
                feats.append((vec.astype(np.float64) / 2**32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=f"{id_col} bigint, features array<double>"
    )


def decode_real(*_args, **_kwargs):
    """Real decode path — requires PIL/ffmpeg, absent in this container."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg which are not installed; "
        "inject a kernel into decode_features instead"
    )


def resize(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """STUB resize -> (id, resized binary, width, height).

    Deterministic fake kernel: emits a payload of exactly width*height
    bytes cycled from the source bytes (stable across runs), standing in
    for a PIL ``Image.resize``.  The plumbing is the real contract: binary
    in / binary out through Arrow ``mapInPandas`` (one batch resident per
    task), target dims carried as columns so downstream stages are
    schema-driven, and the output row stays narrow enough to batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = width * height
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) or b"\x00"
                reps = -(-size // len(raw))
                out.append((raw * reps)[:size])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "resized": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=f"{id_col} bigint, resized binary, width int, height int"
    )


def frame_sample_spec(df: DataFrame, every_n: int = 10, id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plumbing: expand each video row into (media_id,
    frame_idx) tasks executor-side — the downstream decode joins payload
    by id.  Real frame extraction plugs into the same shape."""
    frames = F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx")
    return df.select(id_col, frames)
