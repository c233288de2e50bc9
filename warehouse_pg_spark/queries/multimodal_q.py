"""Multimodal-column queries over the documents fixture.

The binary payloads are built deterministically from documents.text
(utf-8 encode) so the *plumbing* — BinaryType columns, typed metadata
struct, Arrow-batched mapInPandas decode stage, explode-based frame
sampling — is exercised and oracle-checked end-to-end: byte length and
md5 digest of the payload are engine-independent facts DuckDB can
recompute from the text, while the embedder itself stays a
deterministic stub (multimodal/columns.py: decode_real raises until a
codec is wired in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import register, table


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            (F.col("n_chars") % 5000).alias("duration_ms"),
        ).alias("meta"),
    )


@register(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "mapinpandas"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the Arrow/mapInPandas
    stage (multimodal/columns.py extract_features). The oracle checks
    the decode-stage outputs that are codec-independent (payload size,
    md5 digest); the embedding vector itself is the stubbed part."""
    from warehouse_pg_spark.multimodal.columns import extract_features

    media = _media_frame(spark, sf_dir)
    return (
        extract_features(media)
        .select("media_id", "kind", "n_bytes", "digest")
        .orderBy("media_id")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, unnest(generate_series(0, doc_dur, 1000)) AS frame_ts_ms
    FROM (SELECT doc_id, CAST(n_chars % 5000 AS BIGINT) AS doc_dur
          FROM documents WHERE doc_id % 3 = 2)
    ORDER BY media_id, frame_ts_ms
    """,
    tags=("multimodal", "srf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (multimodal/columns.py
    frame_sample_plan): each video expands to its frame timestamps via
    explode(sequence(...)) — the distributed decode fan-out shape."""
    from warehouse_pg_spark.multimodal.columns import frame_sample_plan

    media = _media_frame(spark, sf_dir)
    return frame_sample_plan(media, every_ms=1000).orderBy(
        "media_id", "frame_ts_ms"
    )
