"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing (north-star
module; no reference analogue — WHPG's closest is bytea storage).

Design for 100 TB:
  - payloads are BinaryType columns inside parquet (or pointers to
    object-store keys when payloads exceed row-group budgets);
  - decode / resize / frame-sample run as mapInPandas stages — Arrow
    batches across the Python boundary, one pass, no driver collect;
  - real codec work (PIL/ffmpeg) is STUBBED in this container: the
    deterministic fake path keeps schema/partitioning/batching real
    and testable, the NotImplementedError path marks where the codec
    plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal schema: payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("duration_ms", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def decode_real(payload: bytes, kind: str):
    """Real codec entry point — not available in this container."""
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg; not installed here. "
        "Wire the codec in decode_real() — the Spark plumbing "
        "(extract_features) is already batch-correct."
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+embedder: md5-seeded floats.

    Keeps the pipeline testable end-to-end with bit-stable outputs."""
    h = hashlib.md5(payload).digest()
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dim)
    ]


def extract_features(
    media: DataFrame, batch_size_hint: int = 1024, use_stub: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves each partition across the Python boundary in batches;
    per-batch work is vectorizable; output schema is fixed
    (FEATURE_SCHEMA) so downstream plans stay columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for p in payloads:
                if p is None:
                    feats.append(None)
                elif use_stub:
                    feats.append(_fake_features(bytes(p)))
                else:
                    feats.append(decode_real(bytes(p), "image"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "digest": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                        if p is not None
                        else None
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (decode stubbed). Shows the explode-then-process shape
    that keeps frame work distributed."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
