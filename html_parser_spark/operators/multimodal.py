"""Multimodal column plumbing: image/audio/video as opaque binary.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (``decode_real`` raises NotImplementedError) plus a
deterministic fake decoder used by tests.  Everything Spark-side —
schema, Arrow batch shape, ``mapInPandas`` signatures, partitioning —
is real and tested; swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, MapType,
    StringType, StructField, StructType,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),          # image|audio|video
    StructField("payload", BinaryType(), True),        # opaque bytes
    StructField("meta", MapType(StringType(), StringType()), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("content_hash", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("histogram", ArrayType(DoubleType()), True),
])


def decode_real(payload: bytes, kind: str):
    """Real decode (PIL/librosa/ffmpeg) — unavailable in this container."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use fake_decode (deterministic) or plug a codec in here"
    )


def fake_decode(payload: bytes, kind: str):
    """Deterministic stand-in decoder: derives pseudo width/height and a
    16-bin byte histogram from the payload itself."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    hist = [0.0] * 16
    if payload:
        for b in payload:
            hist[b >> 4] += 1.0
        total = float(len(payload))
        hist = [round(c / total, 6) for c in hist]
    return width, height, hist


def extract_features(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow
    batches; no per-row Python UDF overhead)."""
    decode = decode_real if use_real_codec else fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    rows.append((asset_id, kind, None, None, None, None, None))
                    continue
                payload = bytes(payload)
                w, h, hist = decode(payload, kind)
                rows.append((
                    asset_id, kind, len(payload),
                    hashlib.md5(payload).hexdigest(), w, h, hist,
                ))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "kind", "n_bytes", "content_hash", "width", "height", "histogram"],
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def synth_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic asset table for tests/demos.

    Payload bytes are the ASCII sha256 hexdigest of the asset id,
    repeated — opaque binary to the pipeline, but reproducible by a
    SQL oracle (``repeat(sha256(cast(i as varchar)), 1 + i % 7)``) so
    the whole mapInPandas feature path is value-checked end to end.
    """
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).hexdigest().encode() * (1 + i % 7)
        rows.append((i, kinds[i % 3], bytearray(payload), {"src": f"synth://{i}"}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
