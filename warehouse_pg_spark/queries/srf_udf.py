"""Set-returning functions, UDTFs, table functions, UDAs (SURVEY §2.2
ProjectSet, §2.1 FunctionScan/TableFunction, §2.11 UDF surface).

Reference: nodeProjectSet.c (SRFs in targetlist), nodeFunctionscan.c
(SRF in FROM), nodeTableFunction.c (GP anytable in/out),
commands/aggregatecmds.c (CREATE AGGREGATE).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warehouse_pg_spark.queries.registry import dec, dsum, register, table


@register(
    "srf_unnest_explode",
    oracle="""
    WITH a AS (
      SELECT n_regionkey, array_agg(n_nationkey ORDER BY n_nationkey) AS keys
      FROM nation GROUP BY n_regionkey
    )
    SELECT n_regionkey, unnest(keys) AS nationkey FROM a
    """,
    tags=("srf",),
)
def srf_unnest_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unnest/explode — SRF in targetlist (ProjectSet)."""
    n = table(spark, sf_dir, "nation")
    a = n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_nationkey")).alias("keys")
    )
    return a.select("n_regionkey", F.explode("keys").alias("nationkey"))


@register(
    "srf_posexplode_ordinality",
    oracle="""
    WITH a AS (
      SELECT n_regionkey, array_agg(n_name ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey
    )
    SELECT n_regionkey,
           CAST(generate_subscripts(names, 1) - 1 AS INT) AS pos,
           unnest(names) AS name
    FROM a
    """,
    tags=("srf",),
)
def srf_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode = unnest WITH ORDINALITY (0-based pos to match Spark)."""
    n = table(spark, sf_dir, "nation")
    a = n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("names")
    )
    return a.select("n_regionkey", F.posexplode("names").alias("pos", "name"))


@register(
    "udtf_python_split_words",
    oracle="""
    SELECT r_name, u.word, u.pos
    FROM (SELECT r_name,
                 unnest(list_transform(string_split(r_name, ' '),
                        (w, i) -> struct_pack(word := w,
                                              pos := CAST(i - 1 AS INT)))) AS u
          FROM region)
    """,
    tags=("srf", "udtf"),
)
def udtf_python_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+) — RETURNS SETOF analogue
    (execSRF.c / nodeFunctionscan.c): split region names into rows."""
    from pyspark.sql.functions import udtf

    # useArrow: the UDTF exchanges Arrow record batches with the JVM
    # (ArrowEvalPythonUDTF) instead of per-row pickling — gated by
    # tests/test_plans.py::test_no_row_at_a_time_python_udf...
    @udtf(returnType="word: string, pos: int", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    table(spark, sf_dir, "region").createOrReplaceTempView("region_udtf")
    return spark.sql(
        """
        SELECT r.r_name, t.word, t.pos
        FROM region_udtf r, LATERAL split_words(r.r_name) t
        """
    )


@register(
    "tablefunc_map_in_pandas",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM orders WHERE o_totalprice > 100000
    GROUP BY o_orderstatus
    """,
    tags=("tablefunc",),
)
def tablefunc_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GP TableFunction (anytable in → table out, nodeTableFunction.c:581)
    as mapInPandas: an Arrow-batched table-in/table-out transform
    (here: a filter+project stage) feeding a normal aggregation.

    The Python stage is the *capability* demo; the values stay
    oracle-checkable because the transform is deterministic."""
    o = table(spark, sf_dir, "orders")

    def big_orders(batches):
        for pdf in batches:
            out = pdf[pdf["o_totalprice"] > 100000]
            yield out[["o_orderstatus", "o_totalprice"]]

    transformed = o.mapInPandas(
        big_orders, "o_orderstatus string, o_totalprice double"
    )
    return transformed.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        dsum(dec("o_totalprice")).alias("total"),
    )


@register(
    "uda_pandas_grouped",
    oracle="""
    SELECT c_mktsegment,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_sq
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("uda",),
)
def uda_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE AGGREGATE analogue: vectorized pandas GROUPED_AGG UDA
    (commands/aggregatecmds.c). mean-of-squares with decimal-exact
    accumulation so the oracle matches bit-for-bit."""
    from decimal import Decimal
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_sq(v: pd.Series) -> float:
        # accumulate in Decimal (exact, order-independent) then one
        # double division — mirrors the engine-wide parity rules
        total = sum(
            (Decimal(str(round(x, 2))) * Decimal(str(round(x, 2))) for x in v),
            Decimal(0),
        )
        return round(float(total) / len(v), 4)

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(mean_sq("c_acctbal").alias("mean_sq"))


@register(
    "sample_bernoulli_rowsonly",
    oracle="""
    SELECT COUNT(*) AS total_rows, TRUE AS frac_in_bounds FROM lineitem
    """,
    tags=("sample",),
)
def sample_bernoulli_rowsonly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True TABLESAMPLE (nodeSamplescan.c, bernoulli.c:47): seeded
    df.sample — deterministic within Spark, not across engines, so the
    checkable contract is the population size plus a Spark-computed
    boolean asserting the sampled fraction is 0.1 ± 0.05 (oracle emits
    COUNT(*) + literal TRUE)."""
    li = table(spark, sf_dir, "lineitem")
    samp = li.sample(fraction=0.1, seed=42).agg(F.count("*").alias("n_sampled"))
    tot = li.agg(F.count("*").alias("total_rows"))
    return tot.crossJoin(F.broadcast(samp)).select(
        "total_rows",
        (
            F.abs(F.col("n_sampled") - 0.1 * F.col("total_rows"))
            <= 0.05 * F.col("total_rows")
        ).alias("frac_in_bounds"),
    )


@register(
    "order_nulls_last",
    oracle="""
    SELECT prio_or_null, o_orderkey FROM (
      SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio_or_null, o_orderkey
      FROM orders WHERE o_orderkey % 53 = 0
    ) t
    ORDER BY prio_or_null ASC NULLS LAST, o_orderkey
    LIMIT 25
    """,
    tags=("sort",),
)
def order_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG NULL ordering: ASC defaults to NULLS LAST (Spark defaults
    NULLS FIRST) — the engine's lowering always emits explicit
    asc_nulls_last (SURVEY §7.2)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 53 == 0)
    return (
        o.select(
            F.nullif("o_orderpriority", F.lit("4-NOT SPECIFIED")).alias(
                "prio_or_null"
            ),
            "o_orderkey",
        )
        .orderBy(F.col("prio_or_null").asc_nulls_last(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "srf_unnest_multi",
    oracle="""
    WITH a AS (
      SELECT n_regionkey,
             array_agg(n_name ORDER BY n_name) AS names,
             array_agg(n_nationkey ORDER BY n_name) AS keys
      FROM nation GROUP BY n_regionkey
    )
    SELECT n_regionkey, unnest(names) AS name, unnest(keys) AS key
    FROM a
    """,
    tags=("srf",),
)
def srf_unnest_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG multi-argument unnest(a, b) — parallel array expansion
    (arrayfuncs.c unnest, zipped row-wise like PG's SRF-in-FROM
    multi-unnest) → arrays_zip + explode. Equal-length arrays here;
    PG NULL-pads ragged ones, arrays_zip does the same."""
    n = table(spark, sf_dir, "nation")
    a = n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list(F.struct("n_name", "n_nationkey"))).alias("z")
    )
    return a.select(
        "n_regionkey", F.explode("z").alias("e")
    ).select(
        "n_regionkey",
        F.col("e.n_name").alias("name"),
        F.col("e.n_nationkey").alias("key"),
    )


@register(
    "external_csv_scan",
    oracle="""
    SELECT n.n_regionkey,
           COUNT(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS members
    FROM nation n GROUP BY n.n_regionkey ORDER BY n.n_regionkey
    """,
    tags=("external", "scan"),
)
def external_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External-table scan (CREATE EXTERNAL TABLE ... FORMAT 'CSV',
    external.c:412-811): the nation table staged to CSV, read back
    through the PERMISSIVE ingest path (sources/external.py — the
    SEGMENT REJECT LIMIT machinery), then aggregated. Proves the
    full unload → parallel-CSV-scan → query loop is lossless."""
    import hashlib
    import os

    from warehouse_pg_spark.functions.pg import string_agg
    from warehouse_pg_spark.sources.external import read_external

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    csv_dir = f"/tmp/warehouse_ext_nation_{tag}"
    if not os.path.exists(os.path.join(csv_dir, "_SUCCESS")):
        table(spark, sf_dir, "nation").coalesce(1).write.mode(
            "overwrite"
        ).option("header", "true").csv(csv_dir)
    good, bad = read_external(
        spark,
        csv_dir,
        fmt="csv",
        schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT",
        reject_limit=0,
    )
    assert bad.isEmpty()
    return (
        good.groupBy("n_regionkey")
        .agg(
            F.count("*").alias("n_nations"),
            string_agg("n_name", ",").alias("members"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "tablefunc_xmltable",
    oracle="""
    WITH src AS (SELECT * FROM orders WHERE o_orderkey < 300)
    SELECT o_orderkey, CAST(1 AS BIGINT) AS line_no,
           o_orderpriority AS prio,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount
    FROM src
    UNION ALL
    SELECT o_orderkey, CAST(2 AS BIGINT), o_orderstatus,
           CAST(o_custkey AS DOUBLE)
    FROM src
    """,
    tags=("tablefunc", "xml", "srf"),
)
def tablefunc_xmltable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XMLTABLE (nodeTableFuncscan.c, xml.c): serialize each order to an
    XML doc, then shred it back relationally — one output row per
    <line> element, attributes + child-element text extracted through
    the operators/xmltab.py mapInPandas table function. The oracle
    reconstructs the same rows straight from the source columns, so the
    whole XML round-trip is value-checked."""
    from warehouse_pg_spark.operators.xmltab import xmltable

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    xml = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey"),
        F.lit('"><line no="1"><tag>'),
        F.col("o_orderpriority"),
        F.lit("</tag><amt>"),
        dec("o_totalprice").cast("string"),
        F.lit('</amt></line><line no="2"><tag>'),
        F.col("o_orderstatus"),
        F.lit("</tag><amt>"),
        F.col("o_custkey"),
        F.lit("</amt></line></order>"),
    )
    docs = o.select("o_orderkey", xml.alias("doc"))
    return xmltable(
        docs,
        xml_col="doc",
        row_path="line",
        columns={
            "line_no": ("@no", "long"),
            "prio": ("tag", "string"),
            "amount": ("amt", "double"),
        },
        keep=("o_orderkey",),
    )


@register(
    "fn_xpath_extract",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS tag1,
           o_orderstatus AS tag2,
           CAST(2 AS BIGINT) AS n_lines,
           TRUE AS has_line2
    FROM orders WHERE o_orderkey < 300
    """,
    tags=("functions", "xml"),
)
def fn_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG xpath()/xpath_exists() (utils/adt/xml.c:4245): serialize each
    order to XML, extract child text, and probe a predicate path — the
    whole round-trip value-checked against the source columns. The
    xpath UDF is one Arrow-batched map over the scan; everything after
    (element_at, size) is Catalyst."""
    from warehouse_pg_spark.functions.xml import xpath, xpath_exists

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    doc = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey"),
        F.lit('"><line no="1"><tag>'),
        F.col("o_orderpriority"),
        F.lit('</tag></line><line no="2"><tag>'),
        F.col("o_orderstatus"),
        F.lit("</tag></line></order>"),
    )
    d = o.select("o_orderkey", doc.alias("doc"))
    tags = xpath("doc", "line/tag/text()")
    return d.select(
        "o_orderkey",
        F.element_at(tags, 1).alias("tag1"),
        F.element_at(tags, 2).alias("tag2"),
        F.size(xpath("doc", "line/@no")).cast("bigint").alias("n_lines"),
        xpath_exists("doc", "line[@no='2']").alias("has_line2"),
    )


@register(
    "agg_xmlagg_members",
    oracle="""
    SELECT n_regionkey,
           string_agg('<n name="' || n_name || '"/>', '' ORDER BY n_name)
               AS members_xml
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("ordered-agg", "xml"),
)
def agg_xmlagg_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG xmlagg(frag ORDER BY k) (xml.c; pg_proc xmlagg): XML fragment
    concatenation per group — pure JVM collect/sort/join, no Python on
    the aggregation path."""
    from warehouse_pg_spark.functions.xml import xmlagg

    n = table(spark, sf_dir, "nation")
    frag = F.concat(F.lit('<n name="'), F.col("n_name"), F.lit('"/>'))
    return (
        n.select("n_regionkey", frag.alias("frag"), "n_name")
        .groupBy("n_regionkey")
        .agg(xmlagg("frag", "n_name").alias("members_xml"))
        .orderBy("n_regionkey")
    )


@register(
    "srf_regexp_split_to_table",
    oracle="""
    SELECT doc_id, unnest(string_split_regex(text, '[^A-Za-z0-9]+')) AS tok
    FROM documents WHERE doc_id < 50
    """,
    tags=("srf", "regex"),
)
def srf_regexp_split_to_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG regexp_split_to_table(text, pat) set-returning function
    (utils/adt/regexp.c:1423) — explode(split(...)): the split stays in
    codegen, the SRF expansion is Spark's generator, no Python."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.explode(F.split("text", "[^A-Za-z0-9]+")).alias("tok"),
    )
