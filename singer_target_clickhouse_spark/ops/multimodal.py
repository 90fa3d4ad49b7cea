"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED — this container ships no
image/audio libraries — behind ``_require_codec`` (NotImplementedError) with
a deterministic fake (`fake_decode=True`) so the Spark-side contract is real
and tested: schemas, batch shapes, partitioning, and the UDF signatures are
exactly what a PIL/ffmpeg-backed kernel would slot into.

Scale notes: media bytes never pass through the driver; ``mapInPandas``
streams Arrow batches executor-side, and the pre-repartition on the media-id
hash keeps decode work balanced regardless of per-file size skew.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Schema of a multimodal asset row: payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _require_codec(kind: str):
    raise NotImplementedError(
        f"no {kind} codec available in this environment — plug a real decoder "
        "(PIL / torchaudio / ffmpeg) into decode_features(fake_decode=False)"
    )


def _fake_features(payload: Optional[bytes], dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bytes of the
    payload hashed into ``dim`` float accumulators."""
    acc = [0.0] * dim
    if payload:
        for i, b in enumerate(payload):
            acc[i % dim] += (b - 127.5) / 127.5
    n = max(1, len(payload or b""))
    return [round(a / n, 6) for a in acc]


def decode_features(
    assets: DataFrame,
    fake_decode: bool = True,
    feature_dim: int = 8,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Decode + feature-extract media assets via Arrow-batched mapInPandas.

    Real deployments set ``fake_decode=False`` and implement the kernel; the
    plumbing (repartition on asset hash, Arrow batch iteration, output
    schema) is identical either way.
    """
    if partitions:
        assets = assets.repartition(partitions, F.xxhash64("asset_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                _require_codec("image/audio/video")
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0).astype("int32"),
                    "width": pd.array(
                        [
                            int.from_bytes(p[:2], "big") % 4096 if p and k == "image" else None
                            for p, k in zip(pdf["payload"], pdf["kind"])
                        ],
                        dtype="Int32",
                    ),
                    "height": pd.array(
                        [
                            int.from_bytes(p[2:4], "big") % 4096 if p and len(p) >= 4 and k == "image" else None
                            for p, k in zip(pdf["payload"], pdf["kind"])
                        ],
                        dtype="Int32",
                    ),
                    "duration_ms": pd.array(
                        [
                            len(p) if p and k in ("audio", "video") else None
                            for p, k in zip(pdf["payload"], pdf["kind"])
                        ],
                        dtype="Int32",
                    ),
                    "feature": [_fake_features(p, feature_dim) for p in pdf["payload"]],
                }
            )
            yield out

    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample_plan(videos: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand a video row into (asset_id, frame_idx, offset_ms) sampling
    instructions — the shuffle-free fan-out a frame decoder consumes. The
    duration comes from metadata; the expansion is a JVM sequence, not
    Python."""
    dur = F.coalesce(
        F.element_at(F.col("meta"), "duration_ms").cast("int"),
        F.length(F.col("payload")).cast("int"),
    )
    return videos.where(F.col("kind") == "video").select(
        "asset_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_idx", "offset_ms"),
    )
