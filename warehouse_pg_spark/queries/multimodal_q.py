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


_HEXD = "strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1"


@register(
    "multimodal_phash_near_dup",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             md5({{norm}}) AS h
      FROM documents
    ), c AS (
      SELECT media_id,
             CAST(({_HEXD.format(h='h', i=1)}) * 4096
                + ({_HEXD.format(h='h', i=2)}) * 256
                + ({_HEXD.format(h='h', i=3)}) * 16
                + ({_HEXD.format(h='h', i=4)}) AS BIGINT) AS phash
      FROM m
    ), b AS (
      SELECT media_id, phash,
             phash // 1024 AS b0, (phash // 16) % 64 AS b1, phash % 16 AS b2
      FROM c
    ), cand AS (
      SELECT a.media_id AS id_a, z.media_id AS id_b, a.phash AS pa, z.phash AS pb
      FROM b a JOIN b z ON a.b0 = z.b0 AND a.media_id < z.media_id
      UNION
      SELECT a.media_id, z.media_id, a.phash, z.phash
      FROM b a JOIN b z ON a.b1 = z.b1 AND a.media_id < z.media_id
      UNION
      SELECT a.media_id, z.media_id, a.phash, z.phash
      FROM b a JOIN b z ON a.b2 = z.b2 AND a.media_id < z.media_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(pa, pb)) <= 2
    """.format(
        norm="trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g'))"
    ),
    tags=("multimodal", "dedup"),
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs — the binary-modality
    leg of the dedup matrix (text MinHash-LSH in dedup.py, embedding
    SRP-LSH in similarity.py). A real pHash needs the stubbed codec
    (multimodal/columns.py decode_real); the deterministic stand-in
    hashes the *perceptually normalized* payload (case/whitespace/
    punctuation-invariant, like pHash's resize+grayscale step), so
    variant encodings of the same content land at Hamming 0 and the
    pipeline shape is fully oracle-checkable.

    Scale shape: 16-bit codes, Hamming ≤ 2 found exactly via the
    pigeonhole band trick (3 bands: 6+6+4 bits; 2 flips can't touch
    all 3), band-local self-joins then exact bit_count(xor) confirm —
    the same candidates-then-confirm structure as every LSH here. At
    100 TB you'd widen the code (64-bit, 5 bands) so bands keep
    cardinality; the plan shape is unchanged.
    """
    media = _media_frame(spark, sf_dir)
    from warehouse_pg_spark.queries.dedup import _norm_text

    norm = _norm_text(F.decode(F.col("payload"), "UTF-8"))
    code = F.conv(F.substring(F.md5(F.encode(norm, "UTF-8")), 1, 4), 16, 10).cast(
        "long"
    )
    b = media.select(
        F.col("media_id"),
        code.alias("phash"),
        (code / 1024).cast("long").alias("b0"),
        ((code / 16).cast("long") % 64).alias("b1"),
        (code % 16).alias("b2"),
    )
    # Band table + ONE self-join on (band index, band value) — identical
    # candidate set to unioning one self-join per band, but the hash/
    # decode subtree behind `b` is evaluated once per join side instead
    # of once per band per side (3 bands = 6 evaluations before r17),
    # and the shuffle moves the band rows once instead of three times.
    bt = b.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("bi"), F.col("b0").alias("bv")),
                F.struct(F.lit(1).alias("bi"), F.col("b1").alias("bv")),
                F.struct(F.lit(2).alias("bi"), F.col("b2").alias("bv")),
            )
        ).alias("bb"),
    ).select("media_id", "phash", F.col("bb.bi").alias("bi"), F.col("bb.bv").alias("bv"))
    a, z = bt.alias("a"), bt.alias("z")
    cands = a.join(
        z,
        (F.col("a.bi") == F.col("z.bi"))
        & (F.col("a.bv") == F.col("z.bv"))
        & (F.col("a.media_id") < F.col("z.media_id")),
    ).select(
        F.col("a.media_id").alias("id_a"),
        F.col("z.media_id").alias("id_b"),
        F.col("a.phash").alias("pa"),
        F.col("z.phash").alias("pb"),
    )
    hamming = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cands.distinct()
        .filter(hamming <= 2)
        .select("id_a", "id_b", hamming.cast("long").alias("hamming"))
    )
