"""GP-specific type & function families (SURVEY §1.2 / §2.9):

  - complex number arithmetic      (reference: utils/adt/complex_type.c)
  - sparse vectors (svec) dot ops  (reference: gpcontrib/gp_sparse_vector/
                                    sparse_vector.c, operators.c)
  - matrix ops                     (reference: utils/adt/matrix.c:45)
  - ordered-set aggregates: deterministic mode(), percentile_disc
                                   (reference: utils/adt/orderedsetaggs.c:423)
  - HyperLogLog partial/merge      (reference: utils/hyperloglog/
                                    gp_hyperloglog.c, analyze.c:693)

Complex numbers are StructType(re, im) realized as flat double columns
in query outputs (parity rule 3 — flat columns compare cleanly).
Sparse vectors are (index, value) entry lists; the dot product is
computed the MPP way — explode entries, join on dimension, partial-sum —
which is exactly how a 100 TB sparse corpus would be laid out (inverted
index over dimensions, shuffle on dimension id, then per-vector final
agg). Quantization uses floor() (identical semantics in Spark/DuckDB;
round() tie-breaking differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from warehouse_pg_spark.queries.registry import dec, register, table


# --------------------------------------------------------------- ordered-set


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode_qty, cnt
    FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY count(*) DESC, l_quantity) AS rn
          FROM lineitem GROUP BY l_returnflag, l_quantity)
    WHERE rn = 1
    ORDER BY l_returnflag
    """,
    tags=("agg", "orderedset"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG mode() WITHIN GROUP (orderedsetaggs.c) with the PG tie-break
    (smallest value among equally-frequent) made explicit, so the result
    is deterministic across engines. count-per-value + row_number —
    fully distributed, no per-group materialization."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"), "cnt")
        .orderBy("l_returnflag")
    )


@register(
    "agg_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           MIN(CASE WHEN cd >= 0.25 THEN l_quantity END) AS p25,
           MIN(CASE WHEN cd >= 0.50 THEN l_quantity END) AS p50,
           MIN(CASE WHEN cd >= 0.90 THEN l_quantity END) AS p90
    FROM (SELECT l_returnflag, l_quantity,
                 cume_dist() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity) AS cd
          FROM lineitem)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("agg", "orderedset", "window"),
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG percentile_disc(p) WITHIN GROUP (ORDER BY x)
    (orderedsetaggs.c:423): the first value whose cumulative
    distribution reaches p. cume_dist window + conditional MIN —
    distributed, exact, no interpolation (contrast percentile_cont)."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    cd = F.cume_dist().over(w)
    base = li.select("l_returnflag", "l_quantity", cd.alias("cd"))
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("cd") >= 0.25, F.col("l_quantity"))).alias("p25"),
            F.min(F.when(F.col("cd") >= 0.50, F.col("l_quantity"))).alias("p50"),
            F.min(F.when(F.col("cd") >= 0.90, F.col("l_quantity"))).alias("p90"),
        )
        .orderBy("l_returnflag")
    )


# ----------------------------------------------------------------- complex


@register(
    "fn_complex_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_quantity + (l_linenumber + 1) AS sum_re,
           CAST(l_linenumber AS DOUBLE) + 2.0 AS sum_im,
           l_quantity * (l_linenumber + 1) - l_linenumber * 2.0 AS prod_re,
           l_quantity * 2.0 + l_linenumber * (l_linenumber + 1) AS prod_im,
           sqrt(l_quantity * l_quantity + l_linenumber * l_linenumber) AS magnitude
    FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("functions", "complex"),
)
def fn_complex_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GP complex type arithmetic (complex_type.c): + , * , |z| over
    struct(re, im) pairs built from integral-valued columns (products
    and sums of small integers are exact doubles → bit-identical)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    c1 = F.struct(
        F.col("l_quantity").alias("re"),
        F.col("l_linenumber").cast("double").alias("im"),
    )
    c2 = F.struct(
        (F.col("l_linenumber") + 1).cast("double").alias("re"),
        F.lit(2.0).alias("im"),
    )
    a, b = c1.alias("a"), c2.alias("b")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (a.re + b.re).alias("sum_re"),
        (a.im + b.im).alias("sum_im"),
        (a.re * b.re - a.im * b.im).alias("prod_re"),
        (a.re * b.im + a.im * b.re).alias("prod_im"),
        F.sqrt(a.re * a.re + a.im * a.im).alias("magnitude"),
    ).orderBy("l_orderkey", "l_linenumber")


# -------------------------------------------------------------------- svec


_QUANT_SQL = "CAST(floor(CAST({v}[i] AS DOUBLE) * 64) AS BIGINT)"


@register(
    "fn_svec_sparse_dot",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 65),
             i -> CASE WHEN {_QUANT_SQL.format(v='embedding')} <> 0
                        AND {_QUANT_SQL.format(v='qv')} <> 0
                       THEN {_QUANT_SQL.format(v='embedding')} * {_QUANT_SQL.format(v='qv')}
                       ELSE 0 END)) AS BIGINT) AS dot
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY dot DESC, vec_id
    LIMIT 20
    """,
    tags=("similarity", "svec"),
)
def fn_svec_sparse_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GP svec sparse dot product (gp_sparse_vector/operators.c) the
    MPP way: quantize, drop zero entries, explode to (dim, val) rows,
    hash-join the (tiny, broadcast) query vector's entries on dim,
    partial-sum per vec_id. At 100 TB this is the inverted-index
    layout: shuffle is on vec_id only for the final agg; the dim join
    is broadcast. Integer arithmetic → exact parity."""
    e = table(spark, sf_dir, "embeddings")
    quant = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * 64).cast("long")
    )
    entries = (
        e.select("vec_id", F.posexplode(quant).alias("dim", "val"))
        .filter(F.col("val") != 0)
    )
    q_entries = (
        e.filter(F.col("vec_id") == 0)
        .select(F.posexplode(quant).alias("dim", "qval"))
        .filter(F.col("qval") != 0)
    )
    return (
        entries.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q_entries), "dim")
        .groupBy("vec_id")
        .agg(F.sum(F.col("val") * F.col("qval")).alias("dot"))
        .orderBy(F.col("dot").desc(), "vec_id")
        .limit(20)
    )


# ------------------------------------------------------------------ matrix


@register(
    "fn_matrix_ops",
    oracle="""
    SELECT l_orderkey,
           SUM(l_quantity + l_linenumber)      AS m00,
           SUM(l_quantity - l_linenumber)      AS m01,
           SUM(l_quantity * 2)                 AS m10,
           SUM(CAST(l_linenumber AS DOUBLE))   AS m11
    FROM lineitem
    WHERE l_orderkey < 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    tags=("functions", "matrix"),
)
def fn_matrix_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GP matrix_add aggregate (matrix.c:45): per-row 2x2 matrices
    (nested arrays) summed element-wise across the group via
    zip_with-based matrix_add, then flattened for output. Integral
    doubles → exact sums in any order."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    row_matrix = F.array(
        F.array(
            F.col("l_quantity") + F.col("l_linenumber"),
            F.col("l_quantity") - F.col("l_linenumber"),
        ),
        F.array(
            F.col("l_quantity") * 2,
            F.col("l_linenumber").cast("double"),
        ),
    )

    def matrix_add(acc, m):
        return F.zip_with(
            acc, m, lambda ra, rb: F.zip_with(ra, rb, lambda x, y: x + y)
        )

    zero = F.array(
        F.array(F.lit(0.0), F.lit(0.0)), F.array(F.lit(0.0), F.lit(0.0))
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.aggregate(
                F.collect_list(row_matrix), zero, matrix_add
            ).alias("m")
        )
        .select(
            "l_orderkey",
            F.col("m")[0][0].alias("m00"),
            F.col("m")[0][1].alias("m01"),
            F.col("m")[1][0].alias("m10"),
            F.col("m")[1][1].alias("m11"),
        )
        .orderBy("l_orderkey")
    )


# --------------------------------------------------------------------- HLL


@register(
    "agg_hll_partial_merge",
    oracle="""
    SELECT n_regionkey,
           COUNT(DISTINCT c_custkey) AS exact_ndv,
           TRUE AS within_5pct
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("agg", "sketch"),
)
def agg_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gp_hyperloglog two-phase NDV (gp_hyperloglog.c; incremental
    ANALYZE merges per-leaf sketches, analyze.c:693): build per-nation
    customer sketches (partial), union-merge them per region (final),
    estimate. The sketch column is what a 100 TB incremental-stats
    pipeline would persist per partition.

    Raw sketch estimates aren't cross-engine comparable, so the
    checkable contract is exact NDV per region plus a Spark-computed
    boolean asserting the merged-sketch estimate is within ±5% of exact
    (oracle emits exact NDV + literal TRUE)."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    partials = joined.groupBy("n_regionkey", "n_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch")
    )
    merged = partials.groupBy("n_regionkey").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("hll_ndv")
    )
    exact = joined.groupBy("n_regionkey").agg(
        F.countDistinct("c_custkey").alias("exact_ndv")
    )
    return (
        exact.join(F.broadcast(merged), "n_regionkey")
        .select(
            "n_regionkey",
            "exact_ndv",
            (
                F.abs(F.col("hll_ndv") - F.col("exact_ndv"))
                <= 0.05 * F.col("exact_ndv")
            ).alias("within_5pct"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "fn_range_types",
    oracle="""
    WITH r AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS lo,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 25000 AS DECIMAL(18,2)) AS hi
      FROM orders WHERE o_orderkey < 400
    )
    SELECT o_orderkey, lo, hi,
           (lo < 100000.0 AND 50000.0 < hi) AS overlaps_probe,
           (lo <= 75000.0 AND 75000.0 < hi) AS contains_75k,
           CAST(CASE WHEN lo < 100000.0 AND 50000.0 < hi
                THEN greatest(lo, CAST(50000.0 AS DECIMAL(18,2))) END
                AS DECIMAL(18,2)) AS isect_lo,
           CAST(CASE WHEN lo < 100000.0 AND 50000.0 < hi
                THEN least(hi, CAST(100000.0 AS DECIMAL(18,2))) END
                AS DECIMAL(18,2)) AS isect_hi,
           (hi <= 50000.0) AS strictly_left
    FROM r ORDER BY o_orderkey
    """,
    tags=("functions", "rangetypes"),
)
def fn_range_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG range types (rangetypes.c) via the SURVEY §1.2 struct shim:
    a half-open numrange [lo, hi) is (lo, hi) columns; the operators
    lower to their defining comparisons — && overlap (lo1<hi2 AND
    lo2<hi1), @> containment, * intersection (greatest/least, NULL when
    empty), << strictly-left. Probe range: [50000, 100000)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    lo = dec("o_totalprice")
    hi = (lo + 25000).cast("decimal(18,2)")
    plo, phi = F.lit(50000.0).cast("decimal(18,2)"), F.lit(100000.0).cast(
        "decimal(18,2)"
    )
    ovl = (lo < phi) & (plo < hi)
    return o.select(
        "o_orderkey",
        lo.alias("lo"),
        hi.alias("hi"),
        ovl.alias("overlaps_probe"),
        ((lo <= 75000.0) & (F.lit(75000.0) < hi)).alias("contains_75k"),
        F.when(ovl, F.greatest(lo, plo)).alias("isect_lo"),
        F.when(ovl, F.least(hi, phi)).alias("isect_hi"),
        (hi <= plo).alias("strictly_left"),
    ).orderBy("o_orderkey")


@register(
    "fn_misc_type_shims",
    oracle="""
    SELECT c_custkey,
           substr(md5(c_name), 1, 8) || '-' || substr(md5(c_name), 9, 4)
             || '-' || substr(md5(c_name), 13, 4) || '-'
             || substr(md5(c_name), 17, 4) || '-' || substr(md5(c_name), 21, 12)
             AS uuid,
           printf('$%.2f', CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE))
             AS money,
           '10.' || CAST(c_custkey // 65536 % 256 AS VARCHAR) || '.'
                 || CAST(c_custkey // 256 % 256 AS VARCHAR) || '.'
                 || CAST(c_custkey % 256 AS VARCHAR) || '/24' AS inet,
           split_part('10.' || CAST(c_custkey // 65536 % 256 AS VARCHAR) || '.'
                 || CAST(c_custkey // 256 % 256 AS VARCHAR) || '.'
                 || CAST(c_custkey % 256 AS VARCHAR) || '/24', '/', 1) AS host,
           CAST(split_part('x/24', '/', 2) AS INT) AS masklen
    FROM customer WHERE c_custkey < 40
    """,
    tags=("functions", "types"),
)
def fn_misc_type_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §1.2 low-priority type shims, made concrete: uuid
    (utils/adt/uuid.c) as deterministic md5-derived 8-4-4-4-12 text;
    money (utils/adt/cash.c) as exact-decimal currency formatting;
    inet/cidr (utils/adt/network.c) as text + host()/masklen()
    accessors. All JVM-side string builtins — the point is that PG's
    exotic types degrade to cheap, codegen-friendly string/struct
    shims rather than UDFs."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 40)
    h = F.md5(F.col("c_name"))
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    k = F.col("c_custkey")
    ip = F.concat(
        F.lit("10."),
        ((k / 65536).cast("bigint") % 256).cast("string"),
        F.lit("."),
        ((k / 256).cast("bigint") % 256).cast("string"),
        F.lit("."),
        (k % 256).cast("string"),
        F.lit("/24"),
    )
    return c.select(
        "c_custkey",
        uuid.alias("uuid"),
        F.format_string("$%.2f", dec("c_acctbal").cast("double")).alias("money"),
        ip.alias("inet"),
        F.split_part(ip, F.lit("/"), F.lit(1)).alias("host"),
        F.split_part(ip, F.lit("/"), F.lit(2)).cast("int").alias("masklen"),
    )


@register(
    "fn_enum_ordering",
    oracle="""
    SELECT o_orderpriority,
           CAST(array_position(['1-URGENT','2-HIGH','3-MEDIUM',
                                '4-NOT SPECIFIED','5-LOW'], o_orderpriority)
                AS INT) AS enum_ord,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("functions", "types", "enum"),
)
def fn_enum_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TYPE ... AS ENUM (utils/adt/enum.c): enum values are
    strings with a catalog-defined sort order. Shim = the label list as
    an array literal; enum_ord (= enumsortorder) via array_position,
    usable in ORDER BY / comparisons. Ingest-side domain checking is
    the same expression != NULL."""
    labels = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("n")).select(
        "o_orderpriority",
        F.array_position(
            F.array(*[F.lit(x) for x in labels]), F.col("o_orderpriority")
        ).cast("int").alias("enum_ord"),
        "n",
    )
