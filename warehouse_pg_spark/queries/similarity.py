"""Similarity search over the embeddings table (north-star module;
reference seed: gpcontrib/gp_sparse_vector/ svec dot/l2 operators).

Brute-force cosine is the correctness baseline; the label-blocked and
IVF-style variants are the 100 TB scale path (prune candidates before
computing distances).

Parity: dot products fold left-to-right over the 64-dim array in both
engines after casting to double; results rounded to 6 decimals (sum
order is identical element order, so divergence is ≤ last-ulp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import register, table


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


_DOT_SQL = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _cosine_sql(a: str, b: str) -> str:
    d = _DOT_SQL.format(a=a, b=b)
    na = _DOT_SQL.format(a=a, b=a)
    nb = _DOT_SQL.format(a=b, b=b)
    return f"({d}) / (sqrt({na}) * sqrt({nb}))"


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND({_cosine_sql('embedding', 'qv')}, 6) AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY {_cosine_sql('embedding', 'qv')} DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "bench"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0.

    The query vector is broadcast (single row) → no shuffle of the
    corpus; top-K via TakeOrderedAndProject. The query vector's norm
    is computed ONCE on the broadcast side — the inlined _cosine form
    re-evaluated sqrt(dot(qv,qv)) (a 64-element interpreted HOF fold)
    for every corpus row, a third of the per-row compute for a
    constant (r18; same operand order, bit-identical doubles)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("qnorm"),
    )
    cos = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * F.col("qnorm")
    )
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "sim_label_knn",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
             {_cosine_sql('a.embedding', 'b.embedding')} AS cos
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ), ranked AS (
      SELECT id_a, id_b, label, ROUND(cos, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, id_a, id_b) AS rn
      FROM pairs
    )
    SELECT id_a, id_b, label, cosine FROM ranked WHERE rn <= 5
    """,
    tags=("similarity",),
)
def sim_label_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most-similar pairs per label (blocked self-join — the
    candidate-pruning pattern: block key keeps the join off n²)."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.col("a.label").alias("label"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos").desc(), F.col("id_a"), F.col("id_b")
    )
    return (
        pairs.select(
            "id_a", "id_b", "label",
            F.round("cos", 6).alias("cosine"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select("id_a", "id_b", "label", "cosine")
    )


@register(
    "sim_ivf_bucketed",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_cosine_sql('e.embedding', 'c.cv')} DESC, c.cid) AS rn
      FROM embeddings e CROSS JOIN cents c
      WHERE e.vec_id >= 8
    ), assigned AS (
      SELECT vec_id, embedding, cid FROM scored WHERE rn = 1
    ), q AS (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), qscored AS (
      SELECT c.cid,
             ROW_NUMBER() OVER (ORDER BY {_cosine_sql('q.qv', 'c.cv')} DESC, c.cid) AS rn
      FROM cents c, q
    ), qcid AS (
      SELECT cid FROM qscored WHERE rn = 1
    )
    SELECT a.vec_id, a.cid,
           ROUND({_cosine_sql('a.embedding', 'q.qv')}, 6) AS cosine
    FROM assigned a, q, qcid
    WHERE a.cid = qcid.cid
    ORDER BY {_cosine_sql('a.embedding', 'q.qv')} DESC, a.vec_id
    LIMIT 5
    """,
    tags=("similarity", "ivf"),
)
def sim_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign vectors to nearest of 8 fixed centroids
    (vec_id 0-7 as deterministic seeds), search only the query's cell.

    At scale: centroids broadcast, assignment is a map-only pass, the
    probe touches 1/8 of the corpus (recall/latency tradeoff)."""
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    rest = e.filter(F.col("vec_id") >= 8)

    cos_c = _cosine(F.col("embedding"), F.col("cv"))
    w = Window.partitionBy("vec_id").orderBy(F.col("_c").desc(), F.col("cid"))
    assigned = (
        rest.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "embedding", "cid", cos_c.alias("_c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "_c")
    )

    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qcid = (
        q.crossJoin(F.broadcast(cents))
        .select("cid", _cosine(F.col("qv"), F.col("cv")).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("cid"))
        .limit(1)
        .select(F.col("cid").alias("qcid"))
    )

    cos_q = _cosine(F.col("embedding"), F.col("qv"))
    return (
        assigned.join(F.broadcast(qcid), assigned.cid == F.col("qcid"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "cid", cos_q.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(5)
        .select("vec_id", "cid", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "sim_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.95
    """,
    tags=("similarity", "dedup"),
)
def sim_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.95),
    label-blocked — the semantic-dedup primitive."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= 0.95)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "embed_scalar_quantize",
    oracle="""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), rng AS (
      SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM base
    ), q AS (
      SELECT vec_id, mn, mx,
             list_transform(v, x -> CAST(floor((x - mn) / (mx - mn) * 255.0)
                                         AS BIGINT)) AS codes
      FROM rng WHERE mx > mn
    )
    SELECT vec_id,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max,
           CAST(len(codes) AS INT) AS n_dims
    FROM q
    """,
    tags=("similarity", "multimodal", "pipeline"),
)
def embed_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8-style scalar quantization of embeddings — the
    compression step before ANN index build (4× smaller than float32,
    the IVF/SQ layout every large-scale vector store uses). Pure
    JVM-side array math (transform/aggregate): code_i =
    floor((x_i - min) / (max - min) * 255). Identical IEEE double ops
    on both engines → codes match exactly. Embarrassingly parallel;
    at 100 TB this runs as a map over the embedding table with no
    shuffle."""
    e = table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    e = e.select("vec_id", v.alias("v"))
    e = e.select(
        "vec_id",
        "v",
        F.array_min("v").alias("mn"),
        F.array_max("v").alias("mx"),
    ).filter(F.col("mx") > F.col("mn"))
    codes = F.transform(
        F.col("v"),
        lambda x: F.floor((x - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255.0),
    )
    e = e.select("vec_id", codes.alias("codes"))
    return e.select(
        "vec_id",
        F.aggregate(
            "codes", F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
        F.size("codes").alias("n_dims"),
    )


@register(
    "sim_label_knn_capped",
    oracle=f"""
    WITH capped AS (
      SELECT vec_id, label, embedding FROM (
        SELECT vec_id, label, embedding,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY {_DOT_SQL.format(a='embedding', b='embedding')} DESC,
                                           vec_id) AS rn
        FROM embeddings
      ) t WHERE rn <= 64
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
             {_cosine_sql('a.embedding', 'b.embedding')} AS cos
      FROM capped a JOIN capped b
        ON a.label = b.label AND a.vec_id < b.vec_id
    ), ranked AS (
      SELECT id_a, id_b, label, ROUND(cos, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, id_a, id_b) AS rn
      FROM pairs
    )
    SELECT id_a, id_b, label, cosine FROM ranked WHERE rn <= 5
    """,
    tags=("similarity", "skew"),
)
def sim_label_knn_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-bounded per-label KNN: a mega-label would turn the blocked
    self-join quadratic (sim_label_knn's scale caveat), so each label's
    candidate set is first capped to its 64 highest-energy vectors
    (deterministic: squared-norm desc, vec_id tiebreak) — the
    production-pipeline mitigation that bounds every block at cap², the
    same trade IVF makes per cell. Both engines apply the identical cap
    so the result stays oracle-exact."""
    e = table(spark, sf_dir, "embeddings")
    energy = _dot(F.col("embedding"), F.col("embedding"))
    cap_w = Window.partitionBy("label").orderBy(
        energy.desc(), F.col("vec_id")
    )
    capped = (
        e.select("vec_id", "label", "embedding",
                 F.row_number().over(cap_w).alias("__rn"))
        .filter(F.col("__rn") <= 64)
        .drop("__rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    cos = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.col("a.label").alias("label"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("label").orderBy(
        F.col("cos").desc(), F.col("id_a"), F.col("id_b")
    )
    return (
        pairs.select(
            "id_a", "id_b", "label",
            F.round("cos", 6).alias("cosine"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select("id_a", "id_b", "label", "cosine")
    )


@register(
    "embed_matryoshka_truncate",
    oracle=f"""
    WITH t AS (
      SELECT vec_id, label,
             list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS sub
      FROM embeddings WHERE vec_id < 200
    ), n AS (
      SELECT vec_id, label, sub,
             sqrt(list_sum(list_transform(sub, x -> x * x))) AS nrm
      FROM t
    )
    SELECT vec_id, label,
           ROUND(nrm, 6) AS sub_norm,
           array_to_string(list_transform(sub, x -> printf('%.6f', x / nrm)), ',')
               AS unit_sub
    FROM n ORDER BY vec_id
    """,
    tags=("similarity", "multimodal", "pipeline"),
)
def embed_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation: keep the first 16 dims of
    each embedding and re-normalize to unit length — the
    cost/quality knob of MRL-trained embedding stores. Map-only
    (slice + transform + aggregate), no shuffle; at 100 TB this is a
    pure scan-side projection that shrinks the vector store 4x."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    sub = F.transform(F.slice("embedding", 1, 16), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(sub, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    unit = F.transform(sub, lambda x: F.round(x / F.col("sub_norm_raw"), 6))
    return (
        e.select("vec_id", "label", sub.alias("sub"), nrm.alias("sub_norm_raw"))
        .select(
            "vec_id",
            "label",
            F.round("sub_norm_raw", 6).alias("sub_norm"),
            F.array_join(
                F.transform(
                    F.col("sub"),
                    lambda x: F.format_string(
                        "%.6f", x / F.col("sub_norm_raw")
                    ),
                ),
                ",",
            ).alias("unit_sub"),
        )
        .orderBy("vec_id")
    )


@register(
    "embed_label_centroids",
    oracle="""
    WITH expl AS (
      SELECT label, u.pos, u.val FROM (
        SELECT label,
               unnest(list_transform(embedding,
                      (x, i) -> struct_pack(pos := CAST(i - 1 AS INT),
                                            val := CAST(x AS DOUBLE)))) AS u
        FROM embeddings
      )
    ), dims AS (
      SELECT label, pos, AVG(val) AS dim_mean
      FROM expl GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list_transform(list(dim_mean ORDER BY pos),
                                          x -> printf('%.6f', x)), ',') AS centroid,
           CAST(COUNT(*) AS BIGINT) AS n_dims
    FROM dims GROUP BY label ORDER BY label
    """,
    tags=("similarity", "ivf", "pipeline"),
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors — the k-means M-step a real IVF index
    build runs at scale: posexplode each embedding to (label, dim,
    value), partial/final average per (label, dim) (one shuffle,
    map-side combine), reassemble ordered dense vectors. The classic
    'aggregate a vector column element-wise' pattern without any
    Python."""
    e = table(spark, sf_dir, "embeddings")
    expl = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select("label", "pos", F.col("val").cast("double").alias("val"))
    dims = expl.groupBy("label", "pos").agg(F.avg("val").alias("dim_mean"))
    return (
        dims.groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "dim_mean"))
                    ),
                    lambda s: F.format_string("%.6f", s["dim_mean"]),
                ),
                ",",
            ).alias("centroid"),
            F.count("*").alias("n_dims"),
        )
        .orderBy("label")
    )


# Deterministic sign-random-projection hyperplanes: 8 hyperplanes × 64
# dims, each entry ±1 derived from md5 so Spark and the oracle share the
# exact same literals (no RNG; stable across engines and runs).
def _srp_signs(bits: int = 6, dim: int = 64) -> list[list[float]]:
    import hashlib

    planes = []
    for j in range(bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"srp:{j}:{i}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


_SRP = _srp_signs()


def _srp_sig_sql(col: str) -> str:
    terms = []
    for j, plane in enumerate(_SRP):
        lit = "[" + ", ".join(str(s) for s in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}, {lit}::DOUBLE[]) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


def _srp_sig(col: Column) -> Column:
    sig = F.lit(0)
    for j, plane in enumerate(_SRP):
        dot = F.aggregate(
            F.zip_with(
                col,
                F.array(*[F.lit(s) for s in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


@register(
    "sim_srp_lsh_pairs",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding, {_srp_sig_sql('embedding')} AS sig
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(a.sig AS BIGINT) AS sig,
           ROUND({_cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.embedding', 'b.embedding')} >= 0.35
    """,
    tags=("similarity", "lsh"),
)
def sim_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine LSH via sign random projection (Charikar 2002, STOC —
    SimHash for real vectors; the embedding-space analogue of the
    MinHash-LSH banding in dedup.py): 6 fixed ±1 hyperplanes give every
    vector a 6-bit signature; same-signature vectors become candidate
    pairs (P[bit match] = 1 − θ/π), then exact cosine ≥ 0.35 confirms (threshold sized to the synthetic corpus, whose planted similarity tops out near 0.5).

    Scale shape: signature assignment is map-only (zip_with/aggregate,
    JVM-side, no shuffle); the self-join shuffles on `sig`, so work is
    bucket-local — 2^bits buckets bound the blow-up exactly like LSH
    bands, never an n² cross join.
    """
    e = table(spark, sf_dir, "embeddings")
    s = e.select("vec_id", "embedding", _srp_sig(F.col("embedding")).alias("sig"))
    a, b = s.alias("a"), s.alias("b")
    cos = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.sig").cast("long").alias("sig"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= 0.35)
        .select("id_a", "id_b", "sig", F.round("_cos", 6).alias("cosine"))
    )
