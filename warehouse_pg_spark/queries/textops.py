"""Text-analysis operators over documents (north-star module):
language ID, quality scoring, token counting — the pre-training-data
pipeline primitives. All pure pyspark.sql.functions (JVM-side, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import register, table

# n-gram-heuristic language ID: per-language marker words.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "a"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "que", "y"),
}


def _tokens(col):
    # One fused regex pass (string-identical to the two-step
    # replace-then-collapse form; see dedup._norm_text for the proof
    # and the r17 A/B numbers). The oracle _TOKENS_SQL keeps the
    # two-step form — an independent reconstruction.
    return F.split(
        F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")), " "
    )


_TOKENS_SQL = (
    "string_split(trim(regexp_replace(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
)


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
    FROM documents
    """,
    tags=("text",),
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + char stats (BPE-precursor metrics)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        ).cast("long").alias("n_spaces"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKENS_SQL} AS toks, CAST(length(text) AS DOUBLE) AS nc
      FROM documents
    )
    SELECT doc_id,
           ROUND(CAST(len(toks) AS DOUBLE) / greatest(nc, 1.0), 6) AS token_density,
           ROUND(nc / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS avg_token_len,
           ROUND(CAST(len(list_filter(toks, x -> x IN ('the','and','of','a','to','in')))
                 AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS BIGINT) AS vocab,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE)
                 / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS ttr
    FROM t
    """,
    tags=("text", "bench"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality metrics: token density, avg token length,
    stopword ratio, type-token ratio (filtering signals for training
    data curation).

    The token array is let-bound (transform over a singleton array, the
    `_shingles` idiom) so the regex-normalize + split subtree runs once
    per metric struct instead of once per output expression — the
    inlined form re-tokenized every document ~8x (r17 measurement:
    0.50s -> 0.29s at sf0.1; at scale it is a straight map-CPU cut)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    nc = F.length("text").cast("double")
    metrics = F.element_at(
        F.transform(
            F.array(toks),
            lambda ws: F.struct(
                F.size(ws).cast("double").alias("nt"),
                F.size(
                    F.filter(
                        ws,
                        lambda x: x.isin("the", "and", "of", "a", "to", "in"),
                    )
                ).cast("double").alias("stop"),
                F.size(F.array_distinct(ws)).alias("vocab"),
            ),
        ),
        1,
    )
    r = d.select("doc_id", nc.alias("nc"), metrics.alias("r"))
    return r.select(
        "doc_id",
        F.round(F.col("r.nt") / F.greatest(F.col("nc"), F.lit(1.0)), 6).alias(
            "token_density"
        ),
        F.round(F.col("nc") / F.greatest(F.col("r.nt"), F.lit(1.0)), 6).alias(
            "avg_token_len"
        ),
        F.round(
            F.col("r.stop") / F.greatest(F.col("r.nt"), F.lit(1.0)), 6
        ).alias("stopword_ratio"),
        F.col("r.vocab").cast("long").alias("vocab"),
        F.round(
            F.col("r.vocab").cast("double") / F.greatest(F.col("r.nt"), F.lit(1.0)),
            6,
        ).alias("ttr"),
    )


def _marker_score(toks, markers):
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(toks, x -> x IN ('the','and','of','a')))   AS s_en,
        len(list_filter(toks, x -> x IN ('der','die','und','das'))) AS s_de,
        len(list_filter(toks, x -> x IN ('le','la','et','les')))   AS s_fr,
        len(list_filter(toks, x -> x IN ('el','los','que','y')))   AS s_es
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es'
           END AS pred_lang
    FROM scores
    """,
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram heuristic; deterministic argmax
    with fixed precedence en > de > fr > es).

    Both the token array and the four marker scores are let-bound via
    nested transform-over-singleton lambdas: the inlined when-chain
    referenced the scores ~11 times, re-running the regex tokenizer per
    reference (r17; same fix class as text_quality_score)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))

    def _pred(s):
        return (
            F.when(
                (s.en >= s.de) & (s.en >= s.fr) & (s.en >= s.es),
                F.lit("en"),
            )
            .when((s.de >= s.fr) & (s.de >= s.es), F.lit("de"))
            .when(s.fr >= s.es, F.lit("fr"))
            .otherwise(F.lit("es"))
        )

    pred = F.element_at(
        F.transform(
            F.array(toks),
            lambda ws: F.element_at(
                F.transform(
                    F.array(
                        F.struct(
                            *[
                                _marker_score(ws, m).alias(k)
                                for k, m in _LANG_MARKERS.items()
                            ]
                        )
                    ),
                    _pred,
                ),
                1,
            ),
        ),
        1,
    )
    return d.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "text_source_stats",
    oracle=f"""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens
    FROM documents GROUP BY source, lang
    """,
    tags=("text",),
)
def text_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report by (source, lang) — the dataset-card
    numbers for a curated corpus."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(_tokens(F.col("text"))).cast("long")).alias("total_tokens"),
    )


@register(
    "pipeline_training_data_prep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, text, {_TOKENS_SQL} AS t
      FROM documents
    ), scored AS (
      SELECT doc_id, source, text, CAST(len(t) AS BIGINT) AS n_tokens,
             len(list_filter(t, x -> list_contains(['the','and','of','a','to','in'], x)))
               / greatest(CAST(len(t) AS DOUBLE), 1.0) AS stop_ratio
      FROM toks
    ), kept AS (
      SELECT doc_id, source, text, n_tokens
      FROM scored
      WHERE n_tokens >= 5 AND stop_ratio >= 0.02
    ), deduped AS (
      SELECT DISTINCT ON (md5(text)) doc_id, source, n_tokens
      FROM kept
      ORDER BY md5(text), doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM deduped
    GROUP BY source ORDER BY source
    """,
    tags=("pipeline", "dedup", "text", "bench"),
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation pipeline composed from the
    north-star primitives: tokenize → quality gate (min length +
    stopword-ratio) → exact dedup on content hash (keep lowest doc_id,
    the deterministic DISTINCT ON policy) → per-source corpus stats.

    One declarative plan: one tokenize pass per row, the dedup is one
    hash shuffle on md5(text) with WindowGroupLimit pre-aggregation
    (text itself never crosses the exchange), the stats are one more
    narrow agg. This is the shape a 100 TB curation run takes — no
    driver loops, no UDFs."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    # Let-bound quality gate (the _shingles idiom): one struct carries
    # n_tokens AND the keep decision, computed from a single tokenize
    # pass per reference. The inlined form re-ran the regex tokenizer
    # ~4x per row once the filter was pushed through the projection
    # (r17; the filter condition and each projected metric inlined
    # their own copy of the subtree).
    gate = F.element_at(
        F.transform(
            F.array(toks),
            lambda ws: F.struct(
                F.size(ws).cast("long").alias("nt"),
                (
                    (F.size(ws) >= 5)
                    & (
                        F.size(
                            F.filter(
                                ws,
                                lambda x: x.isin(
                                    "the", "and", "of", "a", "to", "in"
                                ),
                            )
                        ).cast("double")
                        / F.greatest(
                            F.size(ws).cast("double"), F.lit(1.0)
                        )
                        >= 0.02
                    )
                ).alias("keep"),
            ),
        ),
        1,
    )
    # Quality gate applied AFTER the dedup window: the gate is a pure
    # function of text, and md5(text) is the dedup key, so every row of
    # a window partition carries the same gate verdict — pre- and
    # post-window filtering keep exactly the same rows. Post-window the
    # tokenize gate is computed ONCE per row; the pre-window form let
    # Catalyst push the filter below the projection, and the Filter and
    # Project operators each inlined a full copy of the tokenize
    # subtree (no cross-operator CSE, visible in the r17 before-plan) —
    # 2x the dominant map CPU (r17: −21% interleaved A/B, rows
    # identical). The window exchange carries (doc_id, source, g, h) —
    # text itself is pruned either way.
    scored = d.select(
        "doc_id", "source", gate.alias("g"), F.md5("text").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("g.keep"))
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("g.nt")).alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_bpe_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             regexp_extract_all(text, '{_BPE_PATTERN}') AS t
      FROM documents
    )
    SELECT source,
           CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
           CAST(SUM(len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z]+$')))) AS BIGINT)
               AS n_word,
           CAST(SUM(len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$')))) AS BIGINT)
               AS n_num,
           CAST(SUM(len(list_filter(t, x -> NOT regexp_matches(x, '^[A-Za-z0-9]')))) AS BIGINT)
               AS n_punct,
           CAST(floor(CAST(SUM(list_sum(list_transform(t, x -> length(x)))) AS DOUBLE)
                      / SUM(len(t))) AS BIGINT) AS avg_tok_len_floor
    FROM toks GROUP BY source ORDER BY source
    """,
    tags=("text", "tokenize"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (GPT-2-style pre-tokenizer classes:
    letter runs | digit runs | single punctuation) with per-source
    class counts — the token-budget accounting pass of a pre-training
    pipeline. Pure regexp_extract_all + higher-order functions: stays
    in whole-stage codegen, no Python."""
    d = table(spark, sf_dir, "documents")
    t = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    n_all = F.size(t).cast("long")
    word = F.size(F.filter(t, lambda x: x.rlike("^[A-Za-z]+$"))).cast("long")
    num = F.size(F.filter(t, lambda x: x.rlike("^[0-9]+$"))).cast("long")
    punct = F.size(F.filter(t, lambda x: ~x.rlike("^[A-Za-z0-9]"))).cast(
        "long"
    )
    chars = F.aggregate(
        F.transform(t, F.length), F.lit(0), lambda a, x: a + x
    ).cast("long")
    return (
        d.select(
            "source",
            n_all.alias("na"),
            word.alias("nw"),
            num.alias("nn"),
            punct.alias("np"),
            chars.alias("nc"),
        )
        .groupBy("source")
        .agg(
            F.sum("na").alias("n_tokens"),
            F.sum("nw").alias("n_word"),
            F.sum("nn").alias("n_num"),
            F.sum("np").alias("n_punct"),
            (F.sum("nc") / F.sum("na")).cast("long").alias(
                "avg_tok_len_floor"
            ),
        )
        .orderBy("source")
    )


@register(
    "text_fts_rank",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS ts
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(ts, t -> t = 'spark')) +
                len(list_filter(ts, t -> t = 'join')) AS BIGINT) AS n_hits,
           CAST(len(list_filter(ts, t -> t = 'spark')) +
                len(list_filter(ts, t -> t = 'join')) AS DOUBLE)
             / CAST(len(ts) AS DOUBLE) AS rank
    FROM toks
    WHERE len(list_filter(ts, t -> t = 'spark')) > 0
      AND len(list_filter(ts, t -> t = 'join')) > 0
    """,
    tags=("text", "fts"),
)
def text_fts_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text search shim (tsvector.c / tsrank.c): documents matching
    plainto_tsquery('spark & join') ranked by term frequency — the
    to_tsvector @@ tsquery → ts_rank pipeline re-expressed as a
    tokenize → per-term containment filter → frequency score, all
    JVM-side array builtins (no UDF). Scale: embarrassingly parallel
    map over the corpus; the WHERE is a pushable per-row predicate."""
    TERMS = ["spark", "join"]
    d = table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
    )
    d = d.select("doc_id", toks.alias("ts"))
    hit = lambda term: F.size(F.filter(F.col("ts"), lambda t: t == F.lit(term)))
    n_hits = sum((hit(t) for t in TERMS), F.lit(0))
    return (
        d.filter((hit(TERMS[0]) > 0) & (hit(TERMS[1]) > 0))
        .select(
            "doc_id",
            n_hits.cast("bigint").alias("n_hits"),
            (
                n_hits.cast("double") / F.size(F.col("ts")).cast("double")
            ).alias("rank"),
        )
    )


@register(
    "text_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+[a-z]')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(raw,
               '[a-z0-9._]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM aug
    """,
    tags=("text", "pii", "pipeline"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training-data curation: detect + scrub email
    addresses and phone numbers with JVM-side regex (regexp_count /
    regexp_replace — no UDF). The fixture corpus is synthetic, so the
    PII is injected deterministically per-row first; the md5 of the
    scrubbed text proves both engines produced byte-identical
    redactions. Embarrassingly parallel map — no shuffle at any scale."""
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
    phone_re = "555-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(raw, F.lit(email_re)).cast("int").alias("n_emails"),
        F.regexp_count(raw, F.lit(phone_re)).cast("int").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "sample_stratified",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 20
    """,
    tags=("sample", "pipeline", "text"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling — up to 20 docs per language stratum, the
    balanced-corpus step of a training-data pipeline (TABLESAMPLE
    has no per-group form in PG; this is the standard window lowering).
    Hash-ordering by md5(doc_id) makes the draw pseudorandom but
    deterministic and engine-independent. One shuffle on the stratum
    key; at 100 TB the per-group top-K stays bounded by K per reducer
    (rank-filter pushes the limit into the sort)."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rn")
        )
        .filter(F.col("rn") <= 20)
    )


@register(
    "text_shard_packing",
    oracle="""
    WITH cum AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS csum
      FROM documents
    )
    SELECT CAST((csum - n_chars) // 50000 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM cum GROUP BY 1
    """,
    tags=("text", "pipeline"),
)
def text_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing: assign documents (in stable doc_id
    order) to contiguous training shards of ~50k chars via an exclusive
    running sum — the deterministic "pack examples into shards"
    step before tokenized-example writing. The global running sum is
    the two-pass distributed prefix sum (operators/prefix.running_sum):
    per-range local sums + broadcast per-range offsets — no
    Exchange SinglePartition anywhere in the plan (gated by
    tests/test_plans.py)."""
    from warehouse_pg_spark.operators.prefix import running_sum

    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = running_sum(d, order_by="doc_id", value="n_chars", out="csum")
    shard = ((F.col("csum") - F.col("n_chars")) / 50000).cast("bigint")
    return (
        cum.groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


from warehouse_pg_spark.queries.dedup import _NORM_SQL, _SHINGLES_SQL


@register(
    "text_decontaminate",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source,
             string_split({_NORM_SQL.format(c='text')}, ' ') AS words
      FROM documents
    ), sh AS (
      SELECT doc_id, source, unnest({_SHINGLES_SQL}) AS shingle FROM norm
    ), probe AS (
      SELECT DISTINCT shingle FROM sh WHERE source = 'src0'
    ), corpus AS (
      SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> 'src0'
    ), hot AS (
      SELECT shingle FROM corpus GROUP BY shingle HAVING COUNT(*) > 100
    ), kept AS (
      SELECT corpus.doc_id, corpus.shingle FROM corpus
      ANTI JOIN hot USING (shingle)
    )
    SELECT doc_id, COUNT(*) AS n_hits
    FROM kept JOIN probe USING (shingle)
    GROUP BY doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing word
    3-grams with a held-out eval set (source 'src0' plays the
    benchmark) — the standard pre-training hygiene pass that keeps
    eval answers out of the training corpus. Corpus-side hot shingles
    (df > 100) are dropped first, same bound as the near-dup join, so
    at 100 TB the probe join stays bucket-local: probe shingles are a
    benchmark-sized (small) set, broadcast to the corpus scan."""
    from warehouse_pg_spark.queries.dedup import _shingles

    d = table(spark, sf_dir, "documents")
    # No (doc_id, shingle) distinct: rows are unique by construction
    # (array_distinct per doc — test_shingle_rows_unique_by_construction);
    # the probe keeps its shingle-level distinct, which IS semantic.
    sh = lambda df: df.select(
        "doc_id", F.explode(_shingles("text")).alias("shingle")
    )
    probe = (
        sh(d.filter(F.col("source") == "src0")).select("shingle").distinct()
    )
    corpus = sh(d.filter(F.col("source") != "src0"))
    hot = (
        corpus.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > 100)
        .select("shingle")
    )
    kept = corpus.join(hot, "shingle", "left_anti")
    return (
        kept.join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


@register(
    "sample_source_weighted",
    oracle="""
    WITH kept AS (
      SELECT lang, n_chars FROM documents
      WHERE lang = 'en' OR substr(md5(text), 1, 2) < '80'
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY lang ORDER BY lang
    """,
    tags=("sample", "pipeline", "text"),
)
def sample_source_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/source mixing by deterministic hash thresholds — the
    'temperature resampling' step of a training-data pipeline: keep all
    English docs, downsample every other language to 50% by comparing a
    content-hash prefix to a hex cutoff ('80' = 128/256). Deterministic
    (same doc always keeps/drops, both engines agree on md5), map-only
    until the final tiny per-language aggregate — no per-row RNG, no
    shuffle before the agg."""
    d = table(spark, sf_dir, "documents")
    keep = (F.col("lang") == "en") | (
        F.substring(F.md5("text"), 1, 2) < "80"
    )
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "text_repetition_gopher",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
    ), g AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    )
    SELECT doc_id,
           ROUND(CAST(list_max(list_transform(list_distinct(toks),
                       x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE)
                 / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS top_word_frac,
           ROUND(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
                 / greatest(CAST(len(bigrams) AS DOUBLE), 1.0), 6) AS dup_bigram_frac,
           CAST(len(toks) AS BIGINT) AS n_tokens
    FROM g
    """,
    tags=("text", "quality"),
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    'Scaling Language Models', table A1): fraction of tokens taken by
    the single most frequent word, and fraction of duplicated word
    bigrams. High values flag boilerplate / spam for training-data
    filtering. All per-row array ops (higher-order functions, JVM-side):
    map-only, no shuffle, no UDF — scale-safe at 100 TB.
    """
    d = table(spark, sf_dir, "documents")
    # Let-bind the token array once per row (transform over a singleton
    # array): tokenization is regex work, and referencing it INSIDE the
    # per-element lambdas below would re-run it per distinct token /
    # per bigram — HOF lambdas are interpreted with no CSE (same
    # finding as dedup._shingles, caught at the sf10 scale check).
    def _stats(ts):
        nt = F.size(ts)
        # top-token count as the longest run in the SORTED array — one
        # O(n log n) sort + O(n) fold, replacing the r8 form
        # transform(array_distinct, x -> count-equal) whose cost is
        # O(distinct × n) per document (quadratic on diverse text; the
        # r8 bench watch-list flagged it). NULL on empty input matches
        # the old array_max(empty) and the oracle's list_max.
        def _run(acc, x):
            run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc.best, run).alias("best"),
            )

        top_cnt = F.when(
            nt == 0, F.lit(None).cast("int")
        ).otherwise(
            F.aggregate(
                F.array_sort(ts),
                F.struct(
                    F.lit("").alias("prev"),
                    F.lit(0).alias("run"),
                    F.lit(0).alias("best"),
                ),
                _run,
            ).best
        )
        bigrams = F.transform(
            F.slice(ts, 1, F.greatest(nt - 1, F.lit(0))),
            lambda x, i: F.concat_ws(" ", x, F.element_at(ts, i + F.lit(2))),
        )
        nb = F.size(bigrams).cast("double")
        return F.struct(
            nt.alias("nt"),
            top_cnt.alias("top_cnt"),
            F.size(F.array_distinct(bigrams)).alias("nb_distinct"),
            nb.alias("nb"),
        )

    st = F.element_at(
        F.transform(F.array(_tokens(F.col("text"))), _stats), 1
    )
    d = d.withColumn("__st", st)
    nt = F.col("__st.nt")
    return d.select(
        "doc_id",
        F.round(
            F.col("__st.top_cnt").cast("double")
            / F.greatest(nt.cast("double"), F.lit(1.0)),
            6,
        ).alias("top_word_frac"),
        F.round(
            F.lit(1.0)
            - F.col("__st.nb_distinct").cast("double")
            / F.greatest(F.col("__st.nb"), F.lit(1.0)),
            6,
        ).alias("dup_bigram_frac"),
        nt.cast("long").alias("n_tokens"),
    )


@register(
    "text_passage_dedup",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    chunks AS (
      SELECT doc_id, ci, array_to_string(l[ci*10+1 : ci*10+10], ' ') AS passage
      FROM words, unnest(range(CAST(ceil(len(l)/10.0) AS BIGINT))) AS t(ci)
    ),
    firsts AS (
      SELECT passage, MIN(doc_id * 100000 + ci) AS fk
      FROM chunks GROUP BY passage
    )
    SELECT c.doc_id,
           string_agg(c.passage, ' ' ORDER BY c.ci) AS dedup_text,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM chunks c
    JOIN firsts f
      ON c.passage = f.passage AND c.doc_id * 100000 + c.ci = f.fk
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    tags=("text", "dedup", "pipeline"),
)
def text_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (the C4/RefinedWeb line-dedup shape):
    chunk each document into consecutive 10-word passages, keep only
    each passage's FIRST corpus-wide occurrence (min (doc_id, pos)),
    and rebuild the surviving text in order.

    Scale design: first-occurrence is a groupBy(passage).min — a
    partial-aggregatable reduction, deliberately NOT a window over the
    passage key: a passage duplicated millions of times (boilerplate,
    the exact thing this op removes) would pile into one window
    partition, while map-side combine collapses it to one row per
    partition before the shuffle. Two shuffles total (passage agg +
    doc_id rebuild), both on high-cardinality keys.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    words = d.select("doc_id", F.split("text", " ").alias("l"))
    n_chunks = F.ceil(F.size("l") / F.lit(10.0)).cast("int")
    chunks = words.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice("l", i * 10 + 1, 10), " "),
            )
        ).alias("ci", "passage"),
    )
    okey = (F.col("doc_id") * 100000 + F.col("ci")).alias("okey")
    keyed = chunks.select("doc_id", "ci", "passage", okey)
    firsts = keyed.groupBy("passage").agg(F.min("okey").alias("fk")).select(
        F.col("passage").alias("f_passage"), "fk"
    )
    kept = keyed.join(
        firsts,
        (keyed.passage == firsts.f_passage) & (keyed.okey == firsts.fk),
    ).select("doc_id", "ci", "passage")
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("ci").alias("k"), F.col("passage").alias("v")))
        ),
        lambda s: s.getField("v"),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(ordered, " ").alias("dedup_text"),
            F.count("*").alias("n_kept"),
        )
        .orderBy("doc_id")
    )
