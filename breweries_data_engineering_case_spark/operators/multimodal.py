"""Multimodal column operators — opaque binary payloads + typed metadata.

For a 100 TB training-data pipeline, images/audio/video ride through Spark as
``binary`` columns with a metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over ``mapInPandas`` so
the heavy per-item work happens C-side in vectorized batches, never row-at-a-
time Python.

The decode kernels themselves are STUBBED here (image/audio libs are not in
this container): ``decode_fn`` defaults to a deterministic fake that derives
"pixels" from the payload bytes, and raises ``NotImplementedError`` when
``require_real_codec=True``. Everything Spark-visible — schema contracts,
batch shapes, partition sizing, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Contract for a multimodal asset row.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media_type", StringType(), nullable=False),  # image|audio|video
        StructField("payload", BinaryType(), nullable=True),
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("duration_ms", LongType(), nullable=True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("media_type", StringType(), nullable=False),
        StructField("payload_sha256", StringType(), nullable=False),
        StructField("payload_bytes", LongType(), nullable=False),
        StructField("feature_dim", IntegerType(), nullable=False),
        StructField("feature_head", StringType(), nullable=False),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: derives a tiny 'feature
    vector' from the payload digest. Replace with PIL/torchaudio/ffmpeg in a
    real deployment — the Spark plumbing does not change."""
    digest = hashlib.sha256(payload or b"").digest()
    feats = [b / 255.0 for b in digest[:8]]
    return {"dim": len(feats), "head": ",".join(f"{x:.4f}" for x in feats)}


def extract_features(
    assets: DataFrame,
    decode_fn: Callable[[bytes, str], dict[str, Any]] | None = None,
    require_real_codec: bool = False,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Decode + feature-extract each asset via Arrow-batched mapInPandas.

    One map pass, no shuffle; each task processes pandas batches of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows. Binary payloads
    dominate partition size — keep input files sized so a partition's
    payloads fit executor memory (maxPartitionBytes governs this for the
    scan; asset tables should store payloads ≤ a few MB or hold pointers).
    """
    if require_real_codec:
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment; "
            "pass decode_fn wrapping PIL/torchaudio/ffmpeg in deployment"
        )
    decode = decode_fn or fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "payload_sha256": [
                    hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                ],
                "payload_bytes": [len(p or b"") for p in pdf["payload"]],
            }
            decoded = [
                decode(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out["feature_dim"] = [d["dim"] for d in decoded]
            out["feature_head"] = [d["head"] for d in decoded]
            yield pd.DataFrame(out)

    return assets.mapInPandas(process, schema=FEATURE_SCHEMA)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests/demos (payload = seeded
    bytes; metadata plausible)."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(str(i).encode()).digest() * 4  # 64 bytes
        mt = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                64 + i if mt == "image" else None,
                48 + i if mt == "image" else None,
                1000 * i if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expand each video asset into a frame-sampling work list (one row per
    frame timestamp) — pure JVM expressions (sequence+explode), so the
    expensive decode fan-out is planned by Catalyst, not driver loops."""
    videos = assets.filter(F.col("media_type") == "video").filter(
        F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0)
    )
    return videos.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
