"""End-to-end PG-dialect SQL queries through the Engine facade.

Each query here enters the engine as *PostgreSQL SQL text* — the
interface a WHPG user actually has (reference: tcop/postgres.c
exec_simple_query, parser gram.y) — and flows through
sql_dialect.rewrite → spark.sql. This is the integration surface the
other registry modules exercise piecewise via the DataFrame API.

PG-isms covered: `::` casts (incl. numeric(p,s)), `->>` JSON
extraction, FROM generate_series(...) AS t(n), ILIKE, `||` concat,
DISTINCT ON (...), date_trunc / interval arithmetic, type names
text/int4/int8/float8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from warehouse_pg_spark.queries.registry import register


def _engine_sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    return eng.sql(text)


@register(
    "pgsql_q1_text",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("dialect", "agg"),
)
def pgsql_q1_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (reduced) as PG SQL text: `::numeric(p,s)` casts and a
    `::timestamp` literal exercise the cast-operator rewrite."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity::numeric(18,2))::numeric(38,2) AS sum_qty,
               sum(l_extendedprice::numeric(18,2)
                   * (1 - l_discount::numeric(18,2)))::numeric(38,4) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'::timestamp
        GROUP BY l_returnflag, l_linestatus
        """,
    )


@register(
    "pgsql_json_arrow_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("dialect", "json"),
)
def pgsql_json_arrow_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `props ->> 'k'` JSON extraction (jsonfuncs.c operators) via
    the arrow-operator rewrite, with `::int8` casts."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_type,
               sum((props ->> 'k')::int8) AS k_total,
               count(*) AS n
        FROM events
        WHERE (props ->> 'k')::int8 >= 50
        GROUP BY event_type ORDER BY event_type
        """,
    )


@register(
    "pgsql_generate_series_from",
    oracle="""
    SELECT n, n * n AS square, CAST(SUM(n) OVER (ORDER BY n) AS BIGINT) AS running
    FROM generate_series(1, 100) t(n)
    ORDER BY n
    """,
    tags=("dialect", "srf"),
)
def pgsql_generate_series_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `FROM generate_series(a, b) t(n)` set-returning function in
    FROM (nodeFunctionscan.c) → explode(sequence(...)) rewrite, plus a
    running-sum window on the generated rows."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT n, n * n AS square, sum(n) OVER (ORDER BY n) AS running
        FROM generate_series(1, 100) t(n)
        ORDER BY n
        """,
    )


@register(
    "pgsql_ilike_concat",
    oracle="""
    SELECT c_custkey, c_name || '/' || c_mktsegment AS tag
    FROM customer
    WHERE c_mktsegment ILIKE '%build%' AND c_custkey < 200
    ORDER BY c_custkey
    """,
    tags=("dialect", "strings"),
)
def pgsql_ilike_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ILIKE (like.c case-insensitive path) and `||` concatenation —
    both valid Spark SQL, passing through the shim untouched."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name || '/' || c_mktsegment AS tag
        FROM customer
        WHERE c_mktsegment ILIKE '%build%' AND c_custkey < 200
        ORDER BY c_custkey
        """,
    )


@register(
    "pgsql_distinct_on_latest_order",
    oracle="""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    """,
    tags=("dialect", "window"),
)
def pgsql_distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `SELECT DISTINCT ON (k) ... ORDER BY k, tiebreak` (each
    customer's latest order) → row_number-window rewrite. DuckDB runs
    the PG form natively, making it its own oracle."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey,
               o_orderdate::date AS o_orderdate
        FROM orders
        WHERE o_custkey < 100
        ORDER BY o_custkey, o_orderdate DESC, o_orderkey
        """,
    )


@register(
    "pgsql_date_trunc_interval",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1997-01-01'
    GROUP BY month ORDER BY month
    """,
    tags=("dialect", "datetime"),
)
def pgsql_date_trunc_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG date_trunc + interval arithmetic (timestamp.c, datetime.c):
    identical spellings in Spark SQL; the `::date`/`::timestamp` casts
    go through the shim."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT date_trunc('month', o_orderdate)::date AS month,
               count(*) AS n_orders
        FROM orders
        WHERE o_orderdate + INTERVAL '30' DAY < '1997-01-01'::timestamp
        GROUP BY month ORDER BY month
        """,
    )


_RECURSIVE_SERIES = """
    WITH RECURSIVE t(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM t WHERE n < 50
    )
    SELECT n, n * n AS sq, CAST(SUM(n) OVER (ORDER BY n) AS BIGINT) AS running
    FROM t ORDER BY n
"""

_RECURSIVE_CHAIN = """
    WITH RECURSIVE chain(custkey, root, depth) AS (
      SELECT c_custkey, c_custkey, 0
      FROM customer WHERE c_custkey < 3
      UNION ALL
      SELECT c.c_custkey, ch.root, ch.depth + 1
      FROM customer c JOIN chain ch
        ON CAST(floor(c.c_custkey / 10) AS BIGINT) = ch.custkey
       AND c.c_custkey <> ch.custkey
    )
    SELECT root, depth, count(*) AS n_members
    FROM chain
    GROUP BY root, depth
    ORDER BY root, depth
"""


@register(
    "pgsql_recursive_series",
    oracle=_RECURSIVE_SERIES,
    tags=("dialect", "recursive"),
)
def pgsql_recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE numeric series (nodeRecursiveunion.c) as PG SQL
    text — Spark 4 executes recursive CTEs natively (the DataFrame-level
    fixpoint in operators/recursive.py remains the pre-4.0 fallback and
    the hook for iteration caps / checkpointing)."""
    return _engine_sql(spark, sf_dir, _RECURSIVE_SERIES)


@register(
    "pgsql_recursive_referral_chain",
    oracle=_RECURSIVE_CHAIN,
    tags=("dialect", "recursive", "join"),
)
def pgsql_recursive_referral_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE over a fixture table: referral chains rooted at
    customers 0-2 via the derived parent key floor(c_custkey/10); each
    iteration is a distributed join of customer against the frontier
    (the worktable), exactly the RecursiveUnion execution shape."""
    return _engine_sql(spark, sf_dir, _RECURSIVE_CHAIN)


@register(
    "pgsql_within_group",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
           quantile_disc(o_totalprice, 0.9) AS p90_disc,
           mode() WITHIN GROUP (ORDER BY o_orderstatus) AS modal_status
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("dialect", "orderedset"),
)
def pgsql_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ordered-set aggregates as SQL text (orderedsetaggs.c:423/:557):
    percentile_cont / percentile_disc / mode WITHIN GROUP (ORDER BY ...)
    — Spark 4 parses WITHIN GROUP natively, no rewrite needed. mode()
    ties are broken by taking the smallest value (PG sorts the input),
    deterministic here because each priority has one modal status."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority,
               round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
                   AS med_price,
               percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS p90_disc,
               mode() WITHIN GROUP (ORDER BY o_orderstatus) AS modal_status
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    )


@register(
    "pgsql_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS members,
           string_agg(DISTINCT substr(n_name, 1, 7), ',' ORDER BY substr(n_name, 1, 7))
               AS prefixes
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    tags=("dialect", "ordered-agg"),
)
def pgsql_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG string_agg(x, sep ORDER BY y) (varlena.c string_agg_transfn;
    SURVEY §2.4 ordered aggregates) — the dialect shim moves the
    in-paren ORDER BY out to Spark 4 listagg's WITHIN GROUP clause;
    DISTINCT passes through."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT n_regionkey,
               string_agg(n_name, '|' ORDER BY n_name) AS members,
               listagg(DISTINCT substring(n_name, 1, 7), ',')
                   WITHIN GROUP (ORDER BY substring(n_name, 1, 7)) AS prefixes
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
        """,
    )


@register(
    "pgsql_extract_epoch",
    oracle="""
    SELECT o_orderkey,
           CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS epoch_s,
           (CAST(extract(epoch FROM o_orderdate) AS BIGINT) % 86400 = 0) AS is_midnight
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
    tags=("dialect", "datetime"),
)
def pgsql_extract_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG EXTRACT(EPOCH FROM ts) (timestamp.c date_part) — rewritten to
    unix_seconds by the dialect shim; Spark's EXTRACT has no epoch
    field. Session tz is UTC so naive and LTZ epochs agree."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               extract(epoch FROM o_orderdate) AS epoch_s,
               (extract(epoch FROM o_orderdate) % 86400 = 0) AS is_midnight
        FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
        """,
    )


@register(
    "pgsql_filter_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           GROUPING(o_orderpriority, o_orderstatus) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderpriority, o_orderstatus
    """,
    tags=("dialect", "agg", "groupingsets", "filter-clause"),
)
def pgsql_filter_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG GROUPING SETS + agg FILTER + GROUPING() id, all as SQL text
    (planner.c:170-262 grouping-sets preprocessing; parse_agg.c
    aggfilter) — both parse natively in Spark SQL; the grouping-id
    bit order matches PG's."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               grouping_id(o_orderpriority, o_orderstatus) AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderpriority, o_orderstatus
        """,
    )


@register(
    "pgsql_regex_match_ops",
    oracle="""
    SELECT c_custkey, c_name,
           regexp_matches(c_name, '00[0-9]$') AS tail_00x,
           regexp_matches(c_name, 'customer', 'i') AS ci_hit,
           NOT regexp_matches(c_name, '9') AS no_nine
    FROM customer
    WHERE regexp_matches(c_name, '0{3}[0-9]$') AND c_custkey < 500
    ORDER BY c_custkey
    """,
    tags=("dialect", "regex"),
)
def pgsql_regex_match_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG POSIX regex operators `~` / `~*` / `!~` (regexp.c:468
    textregexeq, texticregexeq, textregexne) → RLIKE rewrites; `~*`
    lowers to an inline (?i) flag."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name,
               c_name ~ '00[0-9]$' AS tail_00x,
               c_name ~* 'CUSTOMER' AS ci_hit,
               c_name !~ '9' AS no_nine
        FROM customer
        WHERE c_name ~ '0{3}[0-9]$' AND c_custkey < 500
        ORDER BY c_custkey
        """,
    )


@register(
    "pgsql_like_tilde_ops",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_mktsegment LIKE 'BUILD%' AND c_name ILIKE 'customer%'
          AND c_mktsegment NOT LIKE '%ZZZ%'
          AND c_custkey < 200
    ORDER BY c_custkey
    """,
    tags=("dialect", "strings"),
)
def pgsql_like_tilde_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG LIKE-operator spellings `~~` / `~~*` / `!~~` (like.c textlike,
    texticlike) → LIKE / ILIKE / NOT LIKE."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_mktsegment ~~ 'BUILD%' AND c_name ~~* 'CUSTOMER%'
              AND c_mktsegment !~~ '%ZZZ%'
              AND c_custkey < 200
        ORDER BY c_custkey
        """,
    )


@register(
    "pgsql_array_ctor_ops",
    oracle="""
    WITH a AS (
      SELECT n_regionkey, array_agg(n_name ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey
    )
    SELECT n_regionkey,
           array_to_string(names, ',') AS names,
           list_has_all(names, ['NATION_3']) AS has_n3,
           list_has_any(names, ['NATION_1', 'NATION_2']) AS touches_12,
           array_to_string(['probe_a', 'probe_b'], ',') AS probes
    FROM a
    WHERE list_has_all(names, ['NATION_0']) OR n_regionkey >= 0
    ORDER BY n_regionkey
    """,
    tags=("dialect", "arrays"),
)
def pgsql_array_ctor_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `ARRAY[...]` constructor (gram.y:15365) and the array
    operators `@>` containment / `&&` overlap (arrayfuncs.c) →
    array(...) + forall/array_contains + arrays_overlap rewrites."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        WITH a AS (
          SELECT n_regionkey, sort_array(collect_list(n_name)) AS names
          FROM nation GROUP BY n_regionkey
        )
        SELECT n_regionkey,
               names,
               names @> ARRAY['NATION_3'] AS has_n3,
               names && ARRAY['NATION_1', 'NATION_2'] AS touches_12,
               ARRAY['probe_a', 'probe_b'] AS probes
        FROM a
        WHERE names @> ARRAY['NATION_0'] OR n_regionkey >= 0
        ORDER BY n_regionkey
        """,
    )


@register(
    "pgsql_nulls_default_order",
    oracle="""
    SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio, o_orderkey
    FROM orders WHERE o_orderkey % 97 = 0
    ORDER BY prio ASC NULLS LAST, o_orderkey
    LIMIT 30
    """,
    tags=("dialect", "sort"),
)
def pgsql_nulls_default_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's default NULL ordering (ASC → NULLS LAST, gram.y:10114
    opt_nulls_order) — the SQL text carries no explicit NULLS clause;
    the shim injects it so Spark (default NULLS FIRST) matches PG."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio, o_orderkey
        FROM orders WHERE o_orderkey % 97 = 0
        ORDER BY prio, o_orderkey
        LIMIT 30
        """,
    )


@register(
    "pgsql_chained_json_arrows",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(
               '{"outer": ' || props || '}', '$.outer.k') AS BIGINT)) AS BIGINT)
               AS k_total
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("dialect", "json"),
)
def pgsql_chained_json_arrows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained JSON arrows `j -> 'outer' ->> 'k'` (jsonfuncs.c operator
    chains) fold into ONE get_json_object path ('$.outer.k') — the
    round-2 half-rewrite bug class, now exercised end-to-end."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_type,
               sum((('{"outer": ' || props || '}') -> 'outer' ->> 'k')::int8)
                   AS k_total
        FROM events
        GROUP BY event_type ORDER BY event_type
        """,
    )


@register(
    "pgsql_named_window_clause",
    oracle="""
    SELECT c_custkey, c_nationkey,
           rank() OVER w AS balance_rank,
           ROUND(avg(c_acctbal) OVER w2, 2) AS nation_avg
    FROM customer
    WHERE c_custkey <= 500
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           w2 AS (PARTITION BY c_nationkey)
    ORDER BY c_nationkey, balance_rank
    """,
    tags=("dialect", "window"),
)
def pgsql_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG named WINDOW clause (gram.y window_clause; multiple OVER
    references sharing one definition — transformWindowDefinitions in
    parse_clause.c). Spark SQL supports the clause natively, so the
    text passes through the dialect shim untouched; Catalyst collapses
    both window specs over the same partition into a single shuffle."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_nationkey,
               rank() OVER w AS balance_rank,
               ROUND(avg(c_acctbal) OVER w2, 2) AS nation_avg
        FROM customer
        WHERE c_custkey <= 500
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
               w2 AS (PARTITION BY c_nationkey)
        ORDER BY c_nationkey, balance_rank
        """,
    )


@register(
    "pgsql_time_bucket_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY 1, 2
    ORDER BY bucket, event_type
    LIMIT 200
    """,
    tags=("dialect", "timeseries", "functions"),
)
def pgsql_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-style time_bucket / PG 14 date_bin hypertable rollup
    (timestamp.c timestamp_bin; the continuous-aggregate primitive).
    Registered as SQL scalar functions (functions/pg.py) so they inline
    into whole-stage codegen — the bucketing is integer microsecond
    arithmetic on the scan, then one partial/final aggregate; at 100 TB
    this is the same map-side-combine shape as any GROUP BY."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT date_format(time_bucket(INTERVAL '15' MINUTE, ts),
                           'yyyy-MM-dd HH:mm:ss') AS bucket,
               event_type,
               count(*) AS n_events,
               ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS total_value
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1, 2
        ORDER BY bucket, event_type
        LIMIT 200
        """,
    )


@register(
    "pgsql_jsonpath_filter",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_total
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("dialect", "json"),
)
def pgsql_jsonpath_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG jsonpath predicate operators (jsonpath_exec.c): `@?` with a
    `? (@ > 50)` filter (jsonb_path_exists) and a bare-`@?` existence
    probe, lowered by the dialect shim to get_json_object comparisons —
    pure Catalyst expressions on the scan, no Python boundary."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_type,
               count(*) AS n,
               sum((props ->> 'k')::int8) AS k_total
        FROM events
        WHERE props @? '$.k'
          AND props @? '$.k ? (@ > 50)'
        GROUP BY event_type ORDER BY event_type
        """,
    )


@register(
    "pgsql_jsonpath_match",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 95
      AND event_type = 'purchase'
    ORDER BY event_id
    """,
    tags=("dialect", "json"),
)
def pgsql_jsonpath_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `@@` jsonb_path_match (jsonpath_exec.c executeJsonPath
    predicate form): `props @@ '$.k >= 95'` lowered to a cast-compare
    on get_json_object — stays inside whole-stage codegen."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_id, event_type, (props ->> 'k')::int8 AS k
        FROM events
        WHERE props @@ '$.k >= 95' AND event_type = 'purchase'
        ORDER BY event_id
        """,
    )


@register(
    "pgsql_is_distinct_from",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE NULLIF(o_orderstatus, 'F') IS DISTINCT FROM 'O'
      AND o_orderpriority IS NOT DISTINCT FROM NULLIF(o_orderpriority, '')
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("dialect", "functions"),
)
def pgsql_is_distinct_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `IS [NOT] DISTINCT FROM` null-safe comparison (gram.y a_expr,
    execExprInterp.c) lowered to Spark's `<=>` operator — NULLIF
    synthesizes NULLs so the null-vs-value branches are exercised."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        WHERE NULLIF(o_orderstatus, 'F') IS DISTINCT FROM 'O'
          AND o_orderpriority IS NOT DISTINCT FROM NULLIF(o_orderpriority, '')
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority
        """,
    )


@register(
    "pgsql_similar_to",
    oracle="""
    SELECT p_type, COUNT(*) AS n
    FROM part
    WHERE regexp_matches(p_type, '^(?:(ECO|STA).*)$')
      AND NOT regexp_matches(p_name, '^(?:part#.*[13579])$')
    GROUP BY p_type ORDER BY p_type
    """,
    tags=("dialect", "regex"),
)
def pgsql_similar_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG `[NOT] SIMILAR TO` SQL-regex (like_support.c similar_escape):
    % → .* and _ → . with regex metachars live, anchored both ends —
    lowered to RLIKE. The DuckDB oracle spells the translated regex
    directly since DuckDB's SIMILAR TO is plain regex (no %/_)."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT p_type, count(*) AS n
        FROM part
        WHERE p_type SIMILAR TO '(ECO|STA)%'
          AND p_name NOT SIMILAR TO 'part#%[13579]'
        GROUP BY p_type ORDER BY p_type
        """,
    )


@register(
    "pgsql_overlaps_predicate",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-02-01'
      AND TIMESTAMP '1997-01-01' < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("dialect", "datetime"),
)
def pgsql_overlaps_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL `(s1, e1) OVERLAPS (s2, e2)` (gram.y a_expr OVERLAPS;
    timestamp.c overlaps_timestamp) — rewritten to the normalized
    half-open interval predicate; the oracle spells that predicate
    directly (each order's 30-day window vs January 1997)."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE (o_orderdate, o_orderdate + INTERVAL '30' DAY)
              OVERLAPS (TIMESTAMP '1997-01-01', TIMESTAMP '1997-02-01')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    )


@register(
    "pgsql_fetch_with_ties",
    oracle="""
    SELECT l_orderkey, l_quantity FROM (
      SELECT l_orderkey, l_quantity,
             RANK() OVER (ORDER BY l_quantity DESC) AS rk
      FROM lineitem WHERE l_orderkey < 1000
    ) t WHERE rk <= 10 ORDER BY l_quantity DESC, l_orderkey
    """,
    tags=("dialect", "limit", "sort"),
)
def pgsql_fetch_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG 13 `FETCH FIRST n ROWS WITH TIES` (gram.y
    LIMIT_OPTION_WITH_TIES) — rows tying with the n-th survive the
    limit; lowered to a rank() window. Output re-sorted for the compare
    channel."""
    from pyspark.sql import functions as F

    df = _engine_sql(
        spark,
        sf_dir,
        """
        SELECT l_orderkey, l_quantity
        FROM lineitem WHERE l_orderkey < 1000
        ORDER BY l_quantity DESC
        FETCH FIRST 10 ROWS WITH TIES
        """,
    )
    return df.orderBy(F.col("l_quantity").desc(), F.col("l_orderkey"))


@register(
    "pgsql_keyset_pagination",
    # o_orderdate is a raw TIMESTAMP projection on the Spark side
    # (canonized to a 'yyyy-MM-dd HH:mm:ss' string); the driver's pandas
    # channel renders an all-midnight datetime64 oracle column date-only
    # under astype(str), so the oracle must emit the identical string —
    # parity rule in tests/parity.py (round-8 red, root-caused r8/r9).
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '1997-06-01', 2000)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 25
    """,
    tags=("dialect", "sort", "limit"),
)
def pgsql_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG row-wise comparison for keyset pagination (gram.y row expr;
    rowtypes.c row_gt) — `(k1, k2) > (v1, v2)` resumes an ordered scan
    after the last-seen key. Spark compares the row constructor
    natively; at 100 TB this is THE stateless pagination pattern (no
    OFFSET re-scan)."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderdate, o_orderkey, o_totalprice
        FROM orders
        WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '1997-06-01', 2000)
        ORDER BY o_orderdate, o_orderkey
        LIMIT 25
        """,
    )


@register(
    "pgsql_plpgsql_function",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 150000 THEN 'mid'
                ELSE 'low' END AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
    FROM orders
    GROUP BY band
    ORDER BY band
    """,
    tags=("dialect", "plpgsql", "udf"),
)
def pgsql_plpgsql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION ... LANGUAGE plpgsql (src/pl/plpgsql/src/
    pl_exec.c; pl_gram.y) compiled to ONE Catalyst expression
    (plpgsql.py): DECLARE + IF/ELSIF lower to CASE WHEN, so calling the
    function in a 100-TB scan stays inside whole-stage codegen — no
    interpreter, no Python boundary, and the oracle is the CASE the
    body compiles to."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        CREATE OR REPLACE FUNCTION price_band(p double precision)
        RETURNS text LANGUAGE plpgsql AS $$
        DECLARE band text := 'low';
        BEGIN
          IF p >= 300000 THEN band := 'high';
          ELSIF p >= 150000 THEN band := 'mid';
          END IF;
          RETURN band;
        END
        $$
        """
    )
    return eng.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               count(*) AS n,
               sum(o_totalprice::numeric(18,2))::numeric(38,2) AS total
        FROM orders
        GROUP BY band
        ORDER BY band
        """
    )


@register(
    "pgsql_lateral_topn_text",
    oracle="""
    SELECT n.n_name, top.c_name,
           CAST(top.c_acctbal AS DECIMAL(18,2)) AS c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2) top
    ORDER BY n.n_name, c_acctbal DESC, top.c_name
    """,
    tags=("dialect", "join", "lateral"),
)
def pgsql_lateral_topn_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT as PG SQL text
    (gram.y lateral_clause; the executor's parameterized rescan,
    nodeNestloop.c): top-2 customers per nation. Spark plans the
    correlated lateral as a ranked window join — per-group top-K with
    no driver loop, which is the scale-safe shape."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT n.n_name, top.c_name, top.c_acctbal::numeric(18,2) AS c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) top
        ORDER BY n.n_name, c_acctbal DESC, top.c_name
        """,
    )


@register(
    "pgsql_exists_correlated_text",
    oracle="""
    SELECT n_name, COUNT(*) AS heavy_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("dialect", "semi", "subquery"),
)
def pgsql_exists_correlated_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as PG SQL text (parse_expr.c EXISTS sublink →
    semi join): nations' suppliers that ever shipped a max-quantity
    line. Catalyst decorrelates to a LeftSemi hash join on l_suppkey —
    never a per-row rescan."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT n_name, count(*) AS heavy_suppliers
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49)
        GROUP BY n_name
        ORDER BY n_name
        """,
    )


@register(
    "pgsql_prepared_execute",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE o_totalprice > 250000 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("dialect", "prepared"),
)
def pgsql_prepared_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREPARE ... ($1, $2) / EXECUTE through the engine (commands/
    prepare.c): the driver-scored path now covers parameter
    substitution end-to-end, not just unit tests. The prepared body is
    planned per EXECUTE (Catalyst re-optimizes with the literals —
    equivalent to PG's custom plan, which is the right trade at scale
    since literal pushdown beats generic-plan reuse)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        PREPARE big_orders(numeric, text) AS
        SELECT o_orderpriority, count(*) AS n
        FROM orders
        WHERE o_totalprice > $1 AND o_orderstatus = $2
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )
    try:
        return eng.sql("EXECUTE big_orders(250000, 'F')")
    finally:
        eng.sql("DEALLOCATE big_orders")


@register(
    "pgsql_values_join",
    oracle="""
    SELECT v.grp, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS bal
    FROM customer c
    JOIN (VALUES ('BUILDING','b2c'), ('AUTOMOBILE','b2c'),
                 ('MACHINERY','b2b'), ('FURNITURE','b2b'),
                 ('HOUSEHOLD','b2c')) AS v(seg, grp)
      ON c.c_mktsegment = v.seg
    GROUP BY v.grp
    ORDER BY v.grp
    """,
    tags=("dialect", "values", "join"),
)
def pgsql_values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES list as an inline relation joined to a fact (ValuesScan,
    nodeValuesscan.c) — the idiomatic small-mapping-table join. The
    literal relation is driver-side and broadcast, so the join is
    map-only at any scale."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT v.grp, count(*) AS n,
               sum(c_acctbal::numeric(18,2))::numeric(38,2) AS bal
        FROM customer c
        JOIN (VALUES ('BUILDING','b2c'), ('AUTOMOBILE','b2c'),
                     ('MACHINERY','b2b'), ('FURNITURE','b2b'),
                     ('HOUSEHOLD','b2c')) AS v(seg, grp)
          ON c.c_mktsegment = v.seg
        GROUP BY v.grp
        ORDER BY v.grp
        """,
    )


@register(
    "pgsql_merge_upsert",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_mktsegment AS seg
      FROM customer WHERE c_custkey <= 400
    ),
    src AS (
      SELECT o_custkey, COUNT(*) AS n
      FROM orders WHERE o_custkey <= 800 GROUP BY o_custkey
    )
    SELECT c_custkey,
           CAST(CASE WHEN s.o_custkey IS NULL THEN t.bal
                     WHEN s.n >= 12 THEN t.bal + 1000
                     ELSE t.bal + s.n END AS DECIMAL(18,2)) AS bal,
           seg
    FROM tgt t LEFT JOIN src s ON t.c_custkey = s.o_custkey
    UNION ALL
    SELECT s.o_custkey AS c_custkey, CAST(s.n AS DECIMAL(18,2)) AS bal,
           'NEW' AS seg
    FROM src s LEFT JOIN tgt t ON t.c_custkey = s.o_custkey
    WHERE t.c_custkey IS NULL
    ORDER BY c_custkey
    """,
    tags=("dialect", "dml", "merge"),
)
def pgsql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text MERGE end-to-end (PG 15; parser/parse_merge.c,
    nodeModifyTable.c ExecMerge): CTAS a target slice, MERGE an
    aggregated source with ordered conditional UPDATE clauses plus a
    NOT MATCHED INSERT, read the merged table back. The oracle states
    the merged image as a pure SELECT (left join + anti-join UNION) —
    exactly the full-outer-join plan the engine lowers MERGE to, ONE
    shuffle on the merge keys at any scale."""
    import tempfile

    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark, warehouse_dir=tempfile.mkdtemp(prefix="merge_wh_"))
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        CREATE TABLE merge_tgt AS
        SELECT c_custkey, c_acctbal::numeric(18,2) AS bal,
               c_mktsegment AS seg
        FROM customer WHERE c_custkey <= 400
        """
    )
    eng.sql(
        """
        MERGE INTO merge_tgt AS t USING
          (SELECT o_custkey, count(*) AS n FROM orders
           WHERE o_custkey <= 800 GROUP BY o_custkey) AS s
          ON t.c_custkey = s.o_custkey
        WHEN MATCHED AND s.n >= 12 THEN UPDATE SET bal = t.bal + 1000
        WHEN MATCHED THEN UPDATE SET bal = t.bal + s.n
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, bal, seg) VALUES (s.o_custkey, s.n, 'NEW')
        """
    )
    return eng.sql("SELECT c_custkey, bal, seg FROM merge_tgt ORDER BY c_custkey")


@register(
    "pgsql_any_array_dow",
    oracle="""
    SELECT CAST(EXTRACT(dow FROM o_orderdate) AS INTEGER) AS dow,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY dow
    ORDER BY dow
    """,
    tags=("dialect", "datetime", "arrays"),
)
def pgsql_any_array_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar `= ANY(array)` (parse_oper.c make_scalar_array_op →
    exists()) plus EXTRACT(DOW) with PG's Sunday=0 numbering
    (timestamp.c timestamp_part; Spark's dayofweek is Sunday=1):
    urgent-order counts by day of week. The exists() lowering keeps
    three-valued NULL semantics and stays in codegen."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT extract(dow FROM o_orderdate)::int4 AS dow,
               count(*) AS n
        FROM orders
        WHERE o_orderpriority = ANY(ARRAY['1-URGENT', '2-HIGH'])
        GROUP BY dow
        ORDER BY dow
        """,
    )


@register(
    "pgsql_math_operator_spellings",
    oracle="""
    SELECT p_partkey,
           pow(p_size, 2) AS size_sq,
           CAST(xor(p_size, 3) AS BIGINT) AS size_xor,
           CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           NULLIF(regexp_extract(p_name, '[0-9]+', 0), '') AS first_num
    FROM part WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    tags=("dialect", "math"),
)
def pgsql_math_operator_spellings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG operator spellings (pg_operator.dat): ^ power (Spark's ^ is
    XOR — silent wrong answers without the rewrite), # int XOR, @ abs,
    |/ sqrt, plus regex-form substring (varlena.c textregexsubstr).
    All lower to codegen'd Catalyst expressions."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               p_size ^ 2 AS size_sq,
               (p_size # 3)::int8 AS size_xor,
               (@ (p_size - 25))::int8 AS size_dev,
               |/ p_size::float8 AS size_sqrt,
               substring(p_name FROM '[0-9]+') AS first_num
        FROM part WHERE p_partkey <= 100
        ORDER BY p_partkey
        """,
    )


@register(
    "pgsql_plpgsql_while_select_into",
    oracle="""
    SELECT CAST(FLOOR(LOG2(GREATEST(CAST(c_custkey AS DOUBLE), 1.0)
                           + 0.5)) AS INT)
             AS kbits,
           COUNT(*) AS n,
           MAX(c_acctbal / (SELECT CAST(SUM(CAST(c_acctbal AS
               DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer))
             AS max_share,
           MIN(c_acctbal / (SELECT CAST(SUM(CAST(c_acctbal AS
               DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM customer))
             AS min_share
    FROM customer
    GROUP BY kbits
    ORDER BY kbits
    """,
    tags=("dialect", "plpgsql", "udf"),
)
def pgsql_plpgsql_while_select_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL/pgSQL WHILE (pl_exec.c exec_stmt_while) and SELECT INTO
    (exec_stmt_execsql + INTO), both compiled — never interpreted:
    WHILE lowers to a JVM-side aggregate() fold over the loop-state
    struct (fuel-bounded; plpgsql._while_fold), SELECT INTO to an
    uncorrelated scalar subquery Catalyst evaluates once and broadcasts
    into the per-row expression. halvings(k) counts integer halvings
    to 1 = floor(log2 k) — the oracle's closed form (+0.5 dodges libm
    edge cases at exact powers of two); bal_share divides by the
    SELECT-INTO corpus average (decimal sum / count, parity rule 2)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        CREATE OR REPLACE FUNCTION halvings(k bigint)
        RETURNS int LANGUAGE plpgsql AS $$
        DECLARE c int := 0; v bigint := k;
        BEGIN
          WHILE v > 1 LOOP
            v := CAST(v / 2 AS bigint);
            c := c + 1;
          END LOOP;
          RETURN c;
        END
        $$
        """
    )
    eng.sql(
        """
        CREATE OR REPLACE FUNCTION bal_share(b double precision)
        RETURNS double precision LANGUAGE plpgsql AS $$
        DECLARE a double precision;
        BEGIN
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
            INTO STRICT a FROM customer;
          RETURN b / a;
        END
        $$
        """
    )
    return eng.sql(
        """
        SELECT halvings(c_custkey) AS kbits,
               count(*) AS n,
               max(bal_share(c_acctbal)) AS max_share,
               min(bal_share(c_acctbal)) AS min_share
        FROM customer
        GROUP BY kbits
        ORDER BY kbits
        """
    )


@register(
    "pgsql_misc_fn_spellings",
    oracle="""
    SELECT c_custkey % 7 AS grp,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN ROW(c_nationkey, c_custkey % 3) < ROW(12, 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS row_lt,
           CAST(MAX(gcd(c_custkey, 36)) AS BIGINT) AS max_gcd,
           CAST(MAX(lcm(c_custkey % 5 + 1, 4)) AS BIGINT) AS max_lcm,
           MAX((CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END)
             + (CASE WHEN NULL IS NOT NULL THEN 1 ELSE 0 END)
             + (CASE WHEN c_mktsegment IS NOT NULL THEN 1 ELSE 0 END))
             AS nn,
           CAST(MAX(len(string_to_array(c_name, '#'))) AS INT)
             AS name_parts
    FROM customer
    GROUP BY grp
    ORDER BY grp
    """,
    tags=("dialect", "functions", "arrays"),
)
def pgsql_misc_fn_spellings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG function/constructor spellings Spark lacks (rowtypes.c row
    comparison, int.c gcd/lcm, arrayfuncs.c array_length /
    string_to_array, num_nonnulls) — all pure dialect-text rewrites:
    ROW() becomes a struct comparison, gcd/lcm lower to a JVM-side
    Euclid fold, string_to_array regex-escapes its literal delimiter,
    num_nonnulls expands to a CASE sum. Everything stays in
    whole-stage codegen except the bounded 128-step gcd fold."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT c_custkey % 7 AS grp,
               count(*) AS n,
               sum(CASE WHEN ROW(c_nationkey, c_custkey % 3) < ROW(12, 1)
                        THEN 1 ELSE 0 END)::bigint AS row_lt,
               max(gcd(c_custkey, 36))::bigint AS max_gcd,
               max(lcm(c_custkey % 5 + 1, 4))::bigint AS max_lcm,
               max(num_nonnulls(c_name, NULL, c_mktsegment)) AS nn,
               max(array_length(string_to_array(c_name, '#'), 1))::int
                 AS name_parts
        FROM customer
        GROUP BY grp
        ORDER BY grp
        """
    )


@register(
    "pgsql_plpgsql_for_query",
    oracle="""
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_5
    FROM (SELECT o_totalprice FROM orders
          ORDER BY o_totalprice, o_orderkey LIMIT 5) t
    """,
    tags=("dialect", "plpgsql", "udf"),
)
def pgsql_plpgsql_for_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL/pgSQL `FOR rec IN SELECT ... LOOP` (pl_exec.c
    exec_stmt_fors) compiled — not interpreted — to a JVM aggregate()
    fold over ONE collect_list scalar subquery (plpgsql._for_query_fold):
    RECORD fields are struct members, ORDER BY becomes array_sort on
    leading key fields so iteration order matches PG, EXIT WHEN freezes
    the fold state. Sums the 5 cheapest orders = the oracle's
    ORDER BY/LIMIT closed form. Row-at-a-time loops are inherently
    serial (matching PG's own execution) — the 100-TB path for this
    shape is the plain aggregate the oracle uses; the loop exists for
    dialect parity."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        CREATE OR REPLACE FUNCTION cheapest5_total()
        RETURNS double precision LANGUAGE plpgsql AS $$
        DECLARE r RECORD; total DECIMAL(18,2) := 0; n int := 0;
        BEGIN
          FOR r IN SELECT o_totalprice, o_orderkey FROM orders
                   ORDER BY o_totalprice, o_orderkey LOOP
            EXIT WHEN n >= 5;
            -- cast back: decimal + decimal widens to (19,2), which
            -- would change the fold's state-struct type mid-loop
            total := CAST(total + CAST(r.o_totalprice AS DECIMAL(18,2))
                          AS DECIMAL(18,2));
            n := n + 1;
          END LOOP;
          RETURN CAST(total AS double precision);
        END
        $$
        """
    )
    return eng.sql("SELECT cheapest5_total() AS total_5")


@register(
    "pgsql_trim_functions",
    oracle="""
    SELECT c_custkey,
           ltrim(c_name, 'Custorme#0') AS bare,
           rtrim(c_name, '0123456789') AS no_digits,
           trim(c_name, 'Custorme#') AS num_part
    FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
    """,
    tags=("dialect", "strings", "functions"),
)
def pgsql_trim_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ltrim/rtrim/btrim(str, chars) (varlena.c): Spark's 2-arg
    ltrim/rtrim take (trimStr, str) — the REVERSED order — so running
    PG argument order through Spark silently trims the wrong string.
    The dialect swap is pinned here against DuckDB, whose ltrim/rtrim
    follow PG order natively."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               ltrim(c_name, 'Custorme#0') AS bare,
               rtrim(c_name, '0123456789') AS no_digits,
               btrim(c_name, 'Custorme#') AS num_part
        FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey
        """,
    )


@register(
    "pgsql_row_null_semantics",
    # expected values are PG's (rowtypes.c record_cmp/record_eq);
    # DuckDB's own row comparison diverges on the eq_false case, so the
    # oracle states the PG answers as literals
    oracle="""
    SELECT 'false' AS eq_false,
           'null' AS eq_null,
           'null' AS lt_null,
           'true' AS lt_true,
           'true' AS ne_true,
           'four: 4' AS concat_prec
    """,
    tags=("dialect", "functions"),
)
def pgsql_row_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG row-wise comparison three-valued logic (rowtypes.c): a FALSE
    pair dominates `=` (ROW(1,2,3)=ROW(1,NULL,4) is false, not NULL),
    while an UNKNOWN pair short-circuits `<` to NULL — Spark's struct
    comparison orders NULLs instead, so the dialect expands to explicit
    boolean logic. Plus PG's ||-vs-arithmetic precedence ('four: '||2+2
    concatenates the SUM)."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT COALESCE(CAST(ROW(1,2,3) = ROW(1,NULL,4) AS STRING), 'null') AS eq_false,
               COALESCE(CAST(ROW(1,2,3) = ROW(1,NULL,3) AS STRING), 'null') AS eq_null,
               COALESCE(CAST(ROW(1,2,3) < ROW(1,NULL,4) AS STRING), 'null') AS lt_null,
               COALESCE(CAST(ROW(1,2,3) < ROW(2,NULL,4) AS STRING), 'null') AS lt_true,
               COALESCE(CAST(ROW(1,2,3) <> ROW(1,NULL,4) AS STRING), 'null') AS ne_true,
               'four: ' || 2+2 AS concat_prec
        """,
    )


@register(
    "pgsql_jsonb_containment",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) = 42
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("dialect", "json"),
)
def pgsql_jsonb_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonb @> containment (jsonb_util.c JsonbDeepContains) as a row
    filter over the events props column: `props::jsonb @> '{"k":42}'`
    keeps exactly the rows whose JSON object contains the key/value
    pair — the oracle states the same predicate via path extraction.
    Row-at-a-time Python UDF by design (no Spark built-in has these
    recursive semantics); the scale path for known-shape predicates is
    get_json_object, as the oracle shows."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_type, COUNT(*) AS n
        FROM events
        WHERE props::jsonb @> '{"k": 42}'
        GROUP BY event_type ORDER BY event_type
        """,
    )


@register(
    "pgsql_range_ops_text",
    # DuckDB has no PG range types; the oracle states the PG-semantics
    # answers as literals and expresses the data-dependent predicate
    # through its bound arithmetic (same rows, no range machinery)
    oracle="""
    SELECT true AS ov, false AS ov2, true AS adj, true AS cont,
           true AS has_elem, true AS canon_eq, 'empty' AS emp,
           '[2.0,3.0)' AS inter,
           (SELECT COUNT(*) FROM orders
            WHERE o_totalprice >= 1000.0 AND o_totalprice < 50000.0)
             AS n_in_range
    """,
    tags=("dialect", "rangetypes", "functions"),
)
def pgsql_range_ops_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG range types as SQL text (rangetypes.c): numrange/int4range
    constructors with bounds spellings, && / -|- / @> / << operators,
    int canonicalization ([1,3] = [1,4)), empty detection, intersection
    — all lowered to pure-SQL functions over a bounds struct
    (functions/ranges.py: Catalyst-inlined, codegen, zero Python/row),
    plus a range predicate filtering a fact column, the shape a 100 TB
    scan would use."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT numrange(1.0, 3.0) && numrange(2.0, 4.0) AS ov,
               numrange(1.0, 2.0) && numrange(2.0, 3.0) AS ov2,
               numrange(1.0, 2.0) -|- numrange(2.0, 3.0, '[]') AS adj,
               numrange(1.0, 4.0) @> numrange(2.0, 3.0) AS cont,
               2.5 <@ numrange(1.0, 4.0) AS has_elem,
               int4range(1, 3, '[]') = int4range(1, 4) AS canon_eq,
               range_text(numrange(1.0, 1.0)) AS emp,
               range_text(numrange(1.0, 3.0) * numrange(2.0, 4.0)) AS inter,
               (SELECT COUNT(*) FROM orders
                WHERE numrange(1000.0, 50000.0) @> CAST(o_totalprice AS DOUBLE))
                 AS n_in_range
        """,
    )


@register(
    "pgsql_interval_qualifiers",
    # PG semantics stated as literals (DuckDB's interval grammar lacks
    # the field-qualifier forms) plus a data-dependent count through
    # an interval-shifted cutoff both engines compute
    oracle="""
    SELECT '2000-01-02 02:00:00' AS d2h,
           '2000-01-02 02:03:00' AS d2m,
           '2000-01-02 00:02:03' AS m2s,
           '2001-03-01 00:00:00' AS y2m,
           '2000-01-02 12:00:00' AS frac_day,
           '2000-01-01 00:12:34.57' AS prec2,
           (SELECT COUNT(*) FROM orders
            WHERE o_orderdate < DATE '1995-01-01' + INTERVAL 45 DAY)
             AS n_shifted
    """,
    tags=("dialect", "intervals", "functions"),
)
def pgsql_interval_qualifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL '<str>' <field range> literals (gram.y opt_interval;
    datetime.c DecodeInterval; regress sql/interval.sql:190-220):
    bare numbers bind to the range's low field, two-field times flip
    h:m vs m:s by range, finer-than-range fields are zeroed, fractions
    spill downward, second(p) rounds — all parsed at REWRITE time into
    make_interval, zero runtime cost."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '1 2:03' day to hour AS STRING) AS d2h,
               CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '1 2:03' day to minute AS STRING) AS d2m,
               CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '1 2:03' minute to second AS STRING) AS m2s,
               CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '1-2' year to month AS STRING) AS y2m,
               CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '1.5' day AS STRING) AS frac_day,
               CAST(TIMESTAMP '2000-01-01 00:00:00'
                    + interval '12:34.5678' minute to second(2)
                    AS STRING) AS prec2,
               (SELECT COUNT(*) FROM orders
                WHERE o_orderdate < DATE '1995-01-01'
                      + interval '45' day) AS n_shifted
        """,
    )


@register(
    "srf_lockstep_zip",
    # PG lockstep SRF semantics built in DuckDB with an explicit
    # full-join on ordinal (NULL padding to the longest)
    oracle="""
    SELECT a.g1, b.g2
    FROM (SELECT g AS g1, row_number() OVER (ORDER BY g) AS i
          FROM generate_series(1, 5) t(g)) a
    FULL JOIN (SELECT g AS g2, row_number() OVER (ORDER BY g) AS i
               FROM generate_series(3, 9) t(g)) b USING (i)
    """,
    tags=("srf", "dialect"),
)
def srf_lockstep_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple SRFs in one SELECT list iterate in LOCKSTEP, shorter
    ones NULL-padded to the longest (execSRF.c; regress sql/tsrf.sql
    'parallel iteration, different number of rows') — lowered to a
    single inline(arrays_zip(...)) generator whose zip padding IS the
    PG semantics; one generator node, no join, no shuffle."""
    return _engine_sql(
        spark,
        sf_dir,
        "SELECT generate_series(1, 5) AS g1, generate_series(3, 9) AS g2",
    )


@register(
    "pgsql_jsonb_path_vars",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INT) BETWEEN 10 AND 50
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("json", "jsonpath", "dialect"),
)
def pgsql_jsonb_path_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonb_path_exists with a vars object (jsonpath_exec.c
    executeJsonPath vars binding; regress sql/jsonb_jsonpath.sql):
    $lo/$hi substitute into the filter. Arrow-batched pandas UDF —
    the dialect-breadth slow path; the oracle shows the fast
    json_extract lowering for known-shape predicates."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_type, COUNT(*) AS n
        FROM events
        WHERE jsonb_path_exists(props, '$.k ? (@ >= $lo && @ <= $hi)',
                                vars => '{"lo": 10, "hi": 50}')
        GROUP BY event_type ORDER BY event_type
        """,
    )


@register(
    "srf_regexp_matches_g",
    # single-group pattern: each engine emits the matched text per
    # occurrence (the engine's text[] of one group canonizes to the
    # same scalar string)
    oracle="""
    SELECT n_name,
           unnest(regexp_extract_all(n_name, '([AEIOU])')) AS m
    FROM nation
    """,
    tags=("srf", "regex", "dialect"),
)
def srf_regexp_matches_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_matches(text, pattern, 'g') — a true SRF over every
    match (regexp.c; regress sql/strings.sql:208): one row per match
    carrying the capture-group array. Lowered to explode over JVM-side
    regexp_extract_all streams zipped per match — no Python, one
    generator, scales as a map-only pass over a fact column."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT n_name, regexp_matches(n_name, '([AEIOU])', 'g') AS m
        FROM nation
        """,
    )


@register(
    "pgsql_xml_construction",
    oracle="""
    SELECT r_regionkey,
           '<region id="' || r_regionkey || '"><name>' || r_name ||
           '</name><pos>' || (r_regionkey + 1) || '</pos></region>'
             AS x,
           '<!--hello--><?pi content?>' AS scalar_forms
    FROM region ORDER BY r_regionkey
    """,
    tags=("xml", "dialect", "functions"),
)
def pgsql_xml_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML value constructors (xml.c xmlelement/xmlattributes/
    xmlforest/xmlcomment/xmlpi/xmlconcat; regress sql/xml.sql): pure
    concat/escape string building, Catalyst-inlined — zero Python per
    row, so constructing XML over a 100 TB fact scan costs the same
    as string concatenation."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT r_regionkey,
               xmlelement(name region,
                          xmlattributes(r_regionkey AS id),
                          xmlforest(r_name AS name,
                                    r_regionkey + 1 AS pos)) AS x,
               xmlconcat(xmlcomment('hello'),
                         xmlpi(name pi, 'content')) AS scalar_forms
        FROM region ORDER BY r_regionkey
        """,
    )


@register(
    "pgsql_format_compose",
    # PG format() semantics stated as literals (DuckDB's printf lacks
    # %I/%L/positional widths) plus a per-row compose both engines run
    oracle="""
    SELECT r_regionkey,
           'INSERT INTO ' ||
           CASE WHEN regexp_matches(lower(r_name), '^[a-z_][a-z0-9_]*$')
                     AND lower(r_name) = r_name
                THEN r_name
                ELSE '"' || r_name || '"' END ||
           ' VALUES(''' || r_regionkey || ''')' AS stmt,
           '>>     Hello<<' AS width10,
           '>>"Hello"   <<' AS ident_left,
           '>>      NULL<<' AS null_l,
           'second, first' AS pos_variadic,
           't, f' AS bool_out
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "functions", "strings"),
)
def pgsql_format_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG format() compiled to a concat() at plan time (varlena.c
    text_format; regress text.out): %s/%I/%L conversions, %n$
    positions, static and */'*n$' indirect widths with PG's
    argument-advance rule, VARIADIC array arguments, SQL-literal
    quoting with NULL -> the bare word NULL. Zero runtime dispatch —
    the picture is a plan-time constant, so formatting a 100 TB column
    costs one string concat per row."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT r_regionkey,
               format('INSERT INTO %I VALUES(%L)', r_name, r_regionkey)
                 AS stmt,
               format('>>%*1$s<<', 10, 'Hello') AS width10,
               format('>>%1$-10I<<', 'Hello') AS ident_left,
               format('>>%2$*1$L<<', 10, NULL) AS null_l,
               format('%2$s, %1$s', variadic array['first', 'second'])
                 AS pos_variadic,
               format('%s, %s', variadic array[true, false]) AS bool_out
        FROM region ORDER BY r_regionkey
        """,
    )


@register(
    "pgsql_interval_out",
    # PG interval_out text stated as literals (DuckDB renders
    # intervals differently) plus a data-driven date count
    oracle="""
    SELECT '1 year 2 mons 3 days 04:05:06.699999' AS mixed,
           '-10 mons -3 days +03:55:06.7' AS neg_mix,
           '9 years 1 mon -12 days +13:14:00' AS norm,
           '1 mon 15 days' AS frac_mon,
           '83 years 3 mons' AS months_only,
           '29 days 23:00:00' AS justified,
           '3 days 00:00:00.005' AS millis,
           (SELECT COUNT(*) FROM orders
            WHERE o_orderdate < DATE '1995-02-28') AS n_before
    """,
    tags=("dialect", "intervals"),
)
def pgsql_interval_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG interval_out rendering for Calendar/year-month interval
    results (datetime.c EncodeInterval, postgres style; regress
    sql/interval.sql): per-field signs, '+' on a positive time after
    negative fields, zero fields omitted — applied at the engine's
    result boundary (functions/interval_out.py) because PySpark cannot
    collect those interval types at all. justify_interval folds at
    plan time (timestamp.c interval_justify_interval)."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT interval '1 year 2 mons 3 days 04:05:06.699999' AS mixed,
               interval '-10 mons -3 days +03:55:06.70' AS neg_mix,
               interval '10 years -11 month -12 days +13:14' AS norm,
               interval '1.5 months' AS frac_mon,
               interval '999' month AS months_only,
               justify_interval(interval '1 month -1 hour') AS justified,
               '3 days 5 milliseconds'::interval AS millis,
               (SELECT COUNT(*) FROM orders
                WHERE o_orderdate < DATE '1995-01-01'
                      + interval '2 mons -1 day') AS n_before
        """,
    )


@register(
    "pgsql_time_arithmetic",
    # PG time/timetz semantics as literals (DuckDB has TIME but not
    # PG's compact/zone-suffixed input forms) + a timestamp compose
    oracle="""
    SELECT o_orderkey,
           '04:05:06.789-08' AS tz_compact,
           '23:59:59.999999-07' AS tz_abbrev,
           '23:29:00-08' AS tz_minus_iv,
           '14:31:00-08' AS tz_wrap,
           CAST(14706 AS BIGINT) AS time_secs,
           CAST(27060 AS BIGINT) AS plus_iv_secs,
           strftime(TIMESTAMP '1991-02-03 12:05:06',
                    '%Y-%m-%d %H:%M:%S') AS date_plus_timetz,
           strftime(TIMESTAMP '1994-01-01 16:00:00',
                    '%Y-%m-%d %H:%M:%S') AS make_tstz,
           strftime(CAST(o_orderdate AS DATE)
                    + INTERVAL 11 HOUR + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS order_ts
    FROM orders WHERE o_orderkey <= 16 ORDER BY o_orderkey
    """,
    tags=("dialect", "datetime"),
)
def pgsql_time_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG time / time-with-time-zone input forms and arithmetic
    (utils/adt/date.c time_in/timetz_in/time_pl_interval; regress
    sql/time.sql, sql/timetz.sql): compact '[T]HHMMSS.fff±HH' input,
    zone abbreviations, literal arithmetic folding that wraps mod 24 h
    and ignores the interval's day/month fields, date + timetz
    producing the instant, and the timestamptz(date, timetz)
    constructor. time models as a day-time interval (sorts, composes
    with dates natively); timetz as canonical text."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderkey,
               time with time zone '040506.789-08' AS tz_compact,
               '23:59:59.999999 PDT'::timetz AS tz_abbrev,
               time with time zone '01:30-08' - interval '02:01'
                 AS tz_minus_iv,
               time with time zone '02:30-08' + interval '36:01'
                 AS tz_wrap,
               CAST('04:05:06'::time AS BIGINT) AS time_secs,
               CAST(time '03:30' + interval '1 month 04:01' AS BIGINT)
                 AS plus_iv_secs,
               CAST(date '1991-02-03'
                    + time with time zone '04:05:06 PST' AS STRING)
                 AS date_plus_timetz,
               CAST(timestamptz(date '1994-01-01', timetz '11:00-5')
                    AS STRING) AS make_tstz,
               CAST(o_orderdate + time '11:30' AS STRING) AS order_ts
        FROM orders WHERE o_orderkey <= 16 ORDER BY o_orderkey
        """,
    )


@register(
    "pgsql_to_number_pictures",
    # the same loose-scan semantics computed with DuckDB string ops
    oracle="""
    SELECT r_regionkey,
           -34338492.0 AS grouped,
           -564646.654564 AS pr_wrap,
           -5.01 AS trail_sign,
           544448.78 AS spaced,
           3450.0 AS sep_anywhere,
           123.0 AS slot_bound,
           1234.56 AS currency,
           42.0 AS ordinal,
           CAST(r_regionkey * 1000 + 234.56 AS DOUBLE) AS synth_amount
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "functions", "numeric"),
)
def pgsql_to_number_pictures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_number with PG pictures (formatting.c do_to_number; regress
    numeric.out to_number_1..22): grouping/currency/ordinal text is
    skipped wherever it appears, '-' anywhere (or a PR <...> wrap)
    negates, and the picture bounds how many integer/fraction digits
    are consumed. Literal calls fold to constants at plan time."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT r_regionkey,
               CAST(to_number('-34,338,492', '99G999G999') AS DOUBLE)
                 AS grouped,
               CAST(to_number('<564646.654564>', '999999.999999PR')
                    AS DOUBLE) AS pr_wrap,
               CAST(to_number('5.01-', 'FM9.999999S') AS DOUBLE)
                 AS trail_sign,
               CAST(to_number('5 4 4 4 4 8 . 7 8', '9 9 9 9 9 9 . 9 9')
                    AS DOUBLE) AS spaced,
               CAST(to_number('34,50', '999,99') AS DOUBLE)
                 AS sep_anywhere,
               CAST(to_number('123,000', '999G') AS DOUBLE) AS slot_bound,
               CAST(to_number('$1,234.56', 'L99,999.99') AS DOUBLE)
                 AS currency,
               CAST(to_number('42nd', '99th') AS DOUBLE) AS ordinal,
               CAST(r_regionkey * to_number('1,000', '9G999')
                    + to_number('$234.56', 'L999.99') AS DOUBLE)
                 AS synth_amount
        FROM region ORDER BY r_regionkey
        """,
    )


@register(
    "pgsql_network_types",
    # canonical-text semantics stated as literals (DuckDB's INET
    # extension is not loaded) plus a per-row compose both engines run
    oracle="""
    SELECT '127.0.1.2' AS plus257,
           '127.0.0.1' AS round_trip,
           '127::2:540b:e401' AS v6_plus,
           CAST(-1 AS BIGINT) AS diff,
           '08:00:2b:ff:fe:01:02:03' AS mac8_expand,
           '02:08:2b:ff:fe:01:02:03' AS set7bit,
           '192.168.1.0/24' AS cidr_net,
           '192.168.1.5' AS host_part,
           24 AS mask_len,
           6 AS fam,
           '10.0.' || r_regionkey || '.1' AS synth_ip,
           r_regionkey
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "network", "functions"),
)
def pgsql_network_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG network types (utils/adt/network.c inet_in/inet_out,
    network_plus/minus; mac8.c macaddr8_in/macaddr8_set7bit; regress
    sql/inet.sql, sql/macaddr8.sql): canonical-text model — literal
    casts and literal arithmetic fold at plan time (Python's stdlib
    ipaddress produces PG's canonical output form), while the
    host/masklen/family accessors are pure-SQL string ops that stay
    inside whole-stage codegen over a 100 TB log column."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT '127.0.0.1'::inet + 257 AS plus257,
               ('127.0.0.1'::inet + 257) - 257 AS round_trip,
               '127::1'::inet + 10000000000 AS v6_plus,
               '127::1'::inet - '127::2'::inet AS diff,
               '08:00:2b:01:02:03'::macaddr8 AS mac8_expand,
               macaddr8_set7bit('00:08:2b:01:02:03'::macaddr8)
                 AS set7bit,
               '192.168.1.5/24'::cidr AS cidr_net,
               host('192.168.1.5/24'::inet) AS host_part,
               masklen('192.168.1.5/24'::inet) AS mask_len,
               family('127::1'::inet) AS fam,
               host(('10.0.' || r_regionkey || '.1/16')::inet)
                 AS synth_ip,
               r_regionkey
        FROM region ORDER BY r_regionkey
        """,
    )


def _engine_script(spark: SparkSession, sf_dir: str,
                   stmts: list[str]) -> DataFrame:
    """Run a multi-statement PG script; return the LAST statement's
    result (DDL + query shapes, e.g. CREATE DOMAIN then SELECT)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    out = None
    for s in stmts:
        out = eng.sql(s)
    return out


@register(
    "pgsql_domain_check",
    # the domain lowers to its base type + plan-time CHECK guards, so
    # the oracle is the same arithmetic without the (passing) guards
    oracle="""
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal,
           upper(c_mktsegment) AS seg,
           'BUILDING' AS seg_first,
           'AUTOMOBILE' AS lab_lo,
           'MACHINERY' AS lab_hi
    FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey
    """,
    tags=("dialect", "types", "domain", "ddl"),
)
def pgsql_domain_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE DOMAIN + CREATE TYPE AS ENUM as engine DDL
    (commands/typecmds.c DefineDomain, utils/adt/enum.c; regress
    sql/domain.sql, sql/enum.sql). A domain cast lowers to the base
    type plus assert_true CHECK guards — one codegen'd boolean per
    constraint, zero runtime dispatch, so validating a 100 TB ingest
    column costs a scan-local predicate. Enum labels fold to
    constants at plan time."""
    return _engine_script(spark, sf_dir, [
        """CREATE DOMAIN balance_d AS numeric(12,2)
           CHECK (VALUE >= -1000 AND VALUE <= 10000)""",
        "CREATE DOMAIN code_d AS text NOT NULL CHECK (VALUE ~ '^[A-Z ]+$')",
        """CREATE TYPE segment_e AS ENUM
           ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')""",
        """
        SELECT c_custkey,
               (c_acctbal::balance_d)::float8 AS bal,
               upper(c_mktsegment)::code_d AS seg,
               'BUILDING'::segment_e AS seg_first,
               enum_first(NULL::segment_e) AS lab_lo,
               enum_last(NULL::segment_e) AS lab_hi
        FROM customer WHERE c_custkey <= 20 ORDER BY c_custkey
        """,
    ])


@register(
    "pgsql_composite_roundtrip",
    # composite = StructType: construction, literal input, field
    # access (rowtypes.c record_in / composite_types.sql)
    oracle="""
    SELECT s_suppkey,
           CAST(s_acctbal AS DOUBLE) AS px,
           CAST(s_suppkey AS DOUBLE) AS py,
           CAST(s_acctbal AS DOUBLE) + CAST(s_suppkey AS DOUBLE) AS psum,
           7.0 AS lit_sum,
           CAST(NULL AS DOUBLE) AS null_x
    FROM supplier ORDER BY s_suppkey
    """,
    tags=("dialect", "types", "composite", "ddl"),
)
def pgsql_composite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite CREATE TYPE ... AS (fields) as engine DDL
    (commands/typecmds.c DefineCompositeType; regress
    sql/composite_types.sql). Spark-first: a composite IS a
    StructType — ROW(..)::t / '(a,b)'::t lower to named_struct with
    per-field base casts, field access is Spark's native (expr).f, so
    a record column shuffles/aggregates like any struct at scale."""
    return _engine_script(spark, sf_dir, [
        "CREATE TYPE point_t AS (x float8, y float8)",
        """
        SELECT s_suppkey,
               ((s_acctbal, s_suppkey * 1.0)::point_t).x AS px,
               (ROW(s_acctbal, s_suppkey * 1.0)::point_t).y AS py,
               ((s_acctbal, s_suppkey * 1.0)::point_t).x
                 + ((s_acctbal, s_suppkey * 1.0)::point_t).y AS psum,
               ('(3,4)'::point_t).x + ('(3,4)'::point_t).y AS lit_sum,
               (NULL::point_t).x AS null_x
        FROM supplier ORDER BY s_suppkey
        """,
    ])


@register(
    "pgsql_geometric_ops",
    # geo values are structs and every operator is inline arithmetic,
    # so the oracle is the same math with the geometry unrolled;
    # 3-4-5 triangles keep the distances exact in IEEE doubles
    oracle="""
    SELECT s_suppkey,
           CAST(s_suppkey AS DOUBLE) AS axis_dist,
           CAST(5 * s_suppkey AS DOUBLE) AS tri_dist,
           (s_acctbal >= 100.0) AS box_has_100,
           (abs(s_acctbal) <= 1000.0) AS in_r1000,
           CAST(2 * s_suppkey AS DOUBLE) AS rect_area,
           CAST(s_suppkey AS DOUBLE) + 0.5 AS cx
    FROM supplier ORDER BY s_suppkey
    """,
    tags=("dialect", "types", "geometric"),
)
def pgsql_geometric_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG geometric types point/box/circle (utils/adt/geo_ops.c;
    regress sql/point.sql, box.sql, circle.sql). Spark-first: a geo
    value IS a struct and <->/@>/&&/area/center are inline Catalyst
    arithmetic dispatched statically on the operand type at rewrite
    time — distance over a 100 TB point column is fused
    multiply-adds inside whole-stage codegen, never a UDF."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey,
               point(s_suppkey * 1.0, 0.0) <-> point '(0,0)'
                 AS axis_dist,
               point(s_suppkey * 3.0, s_suppkey * 4.0)
                 <-> point '(0,0)' AS tri_dist,
               box(point '(0,0)',
                   point(s_acctbal, s_acctbal)) @> point '(100,100)'
                 AS box_has_100,
               circle '<(0,0),1000>' @> point(s_acctbal, 0.0)
                 AS in_r1000,
               area(box(point '(0,0)', point(s_suppkey * 1.0, 2.0)))
                 AS rect_area,
               (center(box(point(s_suppkey * 1.0, 0.0),
                           point(s_suppkey + 1.0, 2.0)))).x AS cx
        FROM supplier ORDER BY s_suppkey
        """,
    )


@register(
    "pgsql_quantified_null",
    # ANY/ALL three-valued logic (execExprInterp.c ExecScanSubPlan):
    # a NULL comparison that could decide the outcome yields NULL
    # NULL booleans stringify differently across the two pandas
    # channels, so the three-valued results encode as t/f/unknown text
    oracle="""
    SELECT r_regionkey,
           COALESCE(CAST((r_regionkey = ANY (SELECT NULL))
                         AS VARCHAR), 'unknown') AS any_null,
           COALESCE(CAST((r_regionkey = ANY (SELECT UNNEST([2, NULL])))
                         AS VARCHAR), 'unknown') AS any_maybe,
           COALESCE(CAST((r_regionkey < ALL (SELECT UNNEST([7, 9])))
                         AS VARCHAR), 'unknown') AS all_true,
           COALESCE(CAST((r_regionkey < ALL (SELECT UNNEST([7, NULL])))
                         AS VARCHAR), 'unknown') AS all_maybe,
           COALESCE(CAST((r_regionkey = ANY
                          (SELECT UNNEST(CAST([] AS INT[]))))
                         AS VARCHAR), 'unknown') AS any_empty
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "subquery", "quantified"),
)
def pgsql_quantified_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified ANY/ALL subquery comparisons keep PG's three-valued
    logic (parse_expr.c SubLink, execExprInterp.c): Unknown stays
    NULL instead of collapsing to false/true; the empty set is false
    (ANY) / true (ALL). Lowered to one aggregated CASE over the
    materialized subquery — the same bounded-subplan shape PG runs."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT r_regionkey,
               coalesce((r_regionkey = ANY (SELECT NULL))::text,
                        'unknown') AS any_null,
               coalesce((r_regionkey = ANY
                         (SELECT unnest(array[2, NULL])))::text,
                        'unknown') AS any_maybe,
               coalesce((r_regionkey < ALL
                         (SELECT unnest(array[7, 9])))::text,
                        'unknown') AS all_true,
               coalesce((r_regionkey < ALL
                         (SELECT unnest(array[7, NULL])))::text,
                        'unknown') AS all_maybe,
               coalesce((r_regionkey = ANY
                         (SELECT unnest(array[]::int[])))::text,
                        'unknown') AS any_empty
        FROM region ORDER BY r_regionkey
        """,
    )


@register(
    "pgsql_setof_table_function",
    # the SETOF function IS a parameterized view: the oracle is the
    # inlined body with the argument substituted
    oracle="""
    SELECT n_nationkey AS nk, n_name AS nname
    FROM nation WHERE n_regionkey = 2
    ORDER BY nk
    """,
    tags=("dialect", "srf", "functions"),
)
def pgsql_setof_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION ... RETURNS TABLE for a LANGUAGE sql body
    (functioncmds.c set-returning functions; regress
    sql/rangefuncs.sql), lowered to a native Spark SQL table function
    (r12). A FROM-call inlines as a Catalyst subquery over the nation
    scan — on a 1000-executor cluster this is exactly a view
    expansion: predicate pushdown and column pruning apply to the
    function body as if it were written inline."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        "CREATE FUNCTION r12_nations_of(rk int)"
        " RETURNS TABLE (nk int, nname text) AS $$"
        " SELECT n_nationkey, n_name FROM nation"
        " WHERE n_regionkey = rk $$ LANGUAGE sql"
    )
    return eng.sql("SELECT * FROM r12_nations_of(2) ORDER BY nk")


@register(
    "pgsql_enum_order_semantics",
    # enum declaration order via explicit ordinal CASE mapping
    # (DuckDB enums exist but CREATE TYPE can't ride in a single
    # oracle statement)
    oracle="""
    SELECT o_orderpriority,
           CASE min(CASE o_orderstatus WHEN 'P' THEN 1 WHEN 'O' THEN 2
                    WHEN 'F' THEN 3 END)
                WHEN 1 THEN 'P' WHEN 2 THEN 'O' WHEN 3 THEN 'F'
           END AS min_st,
           CASE max(CASE o_orderstatus WHEN 'P' THEN 1 WHEN 'O' THEN 2
                    WHEN 'F' THEN 3 END)
                WHEN 1 THEN 'P' WHEN 2 THEN 'O' WHEN 3 THEN 'F'
           END AS max_st,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("dialect", "types", "enum"),
)
def pgsql_enum_order_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum comparisons follow DECLARATION order, not text order
    (enum.c enum_cmp / enumsortorder; regress sql/enum.sql): the type
    below declares 'P' < 'O' < 'F' — the reverse of lexicographic —
    and min/max over the cast column must honor it. Lowered to
    array_position ordinals at plan time (r12 ADVICE fix), so the
    aggregate runs as a plain JVM integer min/max over the orders
    scan; the label maps back via element_at."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql("CREATE TYPE r12_ostatus AS ENUM ('P', 'O', 'F')")
    return eng.sql(
        """
        SELECT o_orderpriority,
               min(o_orderstatus::r12_ostatus) AS min_st,
               max(o_orderstatus::r12_ostatus) AS max_st,
               count(*) AS n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@register(
    "pgsql_xpath_sql_calls",
    # every column is FIXTURE-DERIVED (r13 oracle-strength fix): the
    # document's root tag varies by key parity, its child count by
    # key mod 3, so cnt/ex/root_tag all exercise the evaluator over
    # changing shapes instead of per-row constants
    oracle="""
    SELECT n_nationkey, n_name AS nm,
           CAST(1 + n_nationkey % 3 AS VARCHAR) AS cnt,
           (n_nationkey % 3) > 0 AS ex,
           CASE WHEN n_nationkey % 2 = 0 THEN 'nation' ELSE 'state'
           END AS root_tag
    FROM nation ORDER BY n_nationkey
    """,
    tags=("dialect", "xml", "srf"),
)
def pgsql_xpath_sql_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xpath()/xpath_exists() as SQL calls (xml.c:4245) route to the
    Arrow-batched ElementTree evaluator pg_xpath (r12) — never to
    Spark's Hive xpath, whose swapped (xml, path) argument order would
    read the PATH as the document. Covers text() extraction, count()
    scalars, name(), and existence over per-row documents whose root
    tag and child count both vary with the nation fixture key; one
    map-only stage, no shuffle."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT n_nationkey,
               (xpath('//name/text()', doc))[1] AS nm,
               (xpath('count(/*/*)', doc))[1] AS cnt,
               xpath_exists('//key', doc::xml) AS ex,
               (xpath('name(/*)', doc))[1] AS root_tag
        FROM (
          SELECT n_nationkey, n_name,
                 '<' || tag || '><name>' || n_name || '</name>' ||
                 repeat('<key/>', n_nationkey % 3) ||
                 '</' || tag || '>' AS doc
          FROM (
            SELECT n_nationkey, n_name,
                   CASE WHEN n_nationkey % 2 = 0 THEN 'nation'
                        ELSE 'state' END AS tag
            FROM nation
          ) t0
        ) t ORDER BY n_nationkey
        """
    )


@register(
    "pgsql_jsonb_concat_silent",
    oracle="""
    SELECT r_regionkey,
           '{"k": ' || CAST(r_regionkey AS VARCHAR) ||
           ', "x": 1}' AS merged,
           CAST(r_regionkey AS VARCHAR) AS first_el,
           2 AS nn
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "json"),
)
def pgsql_jsonb_concat_silent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonb || jsonb object merge (jsonfuncs.c jsonb_concat — r12:
    previously Spark's string concat, a silent wrong answer),
    jsonb_path_query_first with silent => true (jsonpath_exec.c
    jspThrowErrors false: the erroring element yields nothing, others
    still produce), and num_nonnulls (misc.c) — all over
    fixture-derived json built from the region scan; whole-stage
    codegen except the Arrow-batched concat shim."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT r_regionkey,
               ('{"k":' || r_regionkey::text || '}')::jsonb
                 || '{"x":1}'::jsonb AS merged,
               jsonb_path_query_first(
                 json_build_array(r_regionkey, r_regionkey + 1),
                 'strict $[0]', silent => true) AS first_el,
               num_nonnulls(r_name, NULL, r_regionkey) AS nn
        FROM region ORDER BY r_regionkey
        """
    )


@register(
    "pgsql_plpgsql_return_next",
    # the accumulation is deterministic: the oracle unrolls the same
    # rows the function's loop + RETURN QUERY append produce
    oracle="""
    SELECT * FROM (
      SELECT n_nationkey * 10 AS v FROM nation WHERE n_regionkey = 1
      UNION ALL
      SELECT -1 AS v
    ) t ORDER BY v
    """,
    tags=("dialect", "plpgsql", "srf"),
)
def pgsql_plpgsql_return_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PL/pgSQL RETURN NEXT accumulation (pl_exec.c
    exec_stmt_return_next; regress sql/plpgsql.sql, rangefuncs.sql),
    NEW r13: the backend's per-call tuplestore lowers to ONE
    array-valued Catalyst expression threaded through the compiled
    single-assignment model — a FOR-over-query loop appends per row,
    a trailing RETURN NEXT adds a sentinel, and the table function
    explodes the array. No per-row Python, no driver state: the
    accumulator is a struct field inside the same JVM fold the scalar
    compiler uses, so a 1000-executor plan sees an inlined subquery."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        """
        CREATE FUNCTION r13_keys_and_sentinel() RETURNS SETOF int
        LANGUAGE plpgsql AS $$
        DECLARE r RECORD;
        BEGIN
          FOR r IN SELECT n_nationkey AS k FROM nation
                   WHERE n_regionkey = 1 ORDER BY k LOOP
            RETURN NEXT r.k * 10;
          END LOOP;
          RETURN NEXT -1;
          RETURN;
        END $$
        """
    )
    return eng.sql(
        "SELECT * FROM r13_keys_and_sentinel() AS t(v) ORDER BY v"
    )


@register(
    "pgsql_variadic_function",
    # spread-call packing: greatest of the per-row argument list
    oracle="""
    SELECT r_regionkey,
           greatest(r_regionkey, 2, length(r_name)) AS g
    FROM region ORDER BY r_regionkey
    """,
    tags=("dialect", "functions"),
)
def pgsql_variadic_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIADIC user functions (functioncmds.c; regress
    sql/polymorphism.sql myleast), NEW r13: the parameter registers as
    its declared array type and the engine packs spread call
    arguments into one array() at statement-rewrite time — Spark SQL
    UDFs are fixed-arity, so `f(a, b, c)` and `f(VARIADIC arr)` both
    reach the same single-argument Catalyst-inlined SQL function."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        "CREATE FUNCTION r13_mygreatest(VARIADIC arr int[]) "
        "RETURNS int LANGUAGE sql AS $$ SELECT array_max(arr) $$"
    )
    return eng.sql(
        """
        SELECT r_regionkey,
               r13_mygreatest(r_regionkey, 2, length(r_name)) AS g
        FROM region ORDER BY r_regionkey
        """
    )


@register(
    "pgsql_custom_range_type",
    # text-range containment over the fixture names: '[C,P)' holds
    # names starting C..O (binary compare, matching the engine's
    # default collation posture)
    oracle="""
    SELECT n_name,
           (n_name >= 'C' AND n_name < 'P') AS in_range,
           NOT (n_name >= 'C' AND n_name < 'P') AS outside
    FROM nation ORDER BY n_name
    """,
    tags=("dialect", "types", "range"),
)
def pgsql_custom_range_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TYPE ... AS RANGE (rangetypes.c DefineRange; regress
    sql/rangetypes.sql textrange), NEW r13: a user range type over a
    text subtype lowers onto the engine's STRING-bound range family —
    the constructor call and the '[lo,hi)' literal cast both become
    pg_range_str(...), and @> containment rides the same codegen'd
    boolean expressions as the built-in range types (zero Python,
    broadcastable predicates at any scale)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql("CREATE TYPE r13_textrange AS RANGE (subtype = text)")
    return eng.sql(
        """
        SELECT n_name,
               r13_textrange('C', 'P') @> n_name AS in_range,
               NOT ('[C,P)'::r13_textrange @> n_name) AS outside
        FROM nation ORDER BY n_name
        """
    )


@register(
    "pgsql_json_arrow_quoting",
    # DuckDB's json -> is PG-faithful for string leaves (keeps JSON
    # quoting), so it oracles the engine's variant-backed arrow
    # directly; ->> unquotes in both
    oracle="""
    SELECT event_id,
           CAST(('{"t":"' || event_type || '"}')::json -> 't' AS VARCHAR)
             AS quoted_leaf,
           CAST(props -> 'k' AS VARCHAR) AS k_json,
           props ->> 'k' AS k_text
    FROM events WHERE event_id % 997 = 0
    ORDER BY event_id
    """,
    tags=("dialect", "json"),
)
def pgsql_json_arrow_quoting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json `->` returns JSON — string leaves keep their quoting
    (jsonfuncs.c json_object_field), unlike the text-returning `->>`.
    Lowered to to_json(try_variant_get(try_parse_json(x), path)):
    Spark 4 variant extraction, JVM-side, no Python per row. The
    chain-fold still collapses multi-step arrows to one path; only
    the final step's arrow picks the extractor."""
    return _engine_sql(
        spark,
        sf_dir,
        """
        SELECT event_id,
               ('{"t":"' || event_type || '"}')::json -> 't' AS quoted_leaf,
               props -> 'k' AS k_json,
               props ->> 'k' AS k_text
        FROM events WHERE event_id % 997 = 0
        ORDER BY event_id
        """,
    )


@register(
    "pgsql_polymorphic_function",
    # the oracle expresses the resolved calls directly: the SETOF
    # anyelement explode is an unnest, the scalar anyelement pick is
    # the array's first element (1-based in DuckDB like PG)
    oracle="""
    SELECT r AS region_key,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(n_name) AS first_name
    FROM (SELECT unnest([0, 1, 2, 3, 4]) AS r) t
    JOIN nation ON n_regionkey = r
    GROUP BY r
    ORDER BY region_key
    """,
    tags=("dialect", "udf"),
)
def pgsql_polymorphic_function(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Polymorphic SQL functions (parse_coerce.c
    check_generic_type_consistency; regress rangefuncs/polymorphism):
    anyarray/anyelement parameters resolve to the CALL site's
    concrete type. Registered as body templates and inlined per call
    — Catalyst types the expansion, which is exactly the planner's
    SQL-function inlining with the catalog lookup replaced by
    Spark's own type resolution. Covers the SETOF form in FROM
    (generate_subscripts body) and the scalar form (r15; NEW)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        "create or replace function poly_explode(anyarray) returns"
        " setof anyelement as $$ select $1[s] from"
        " generate_subscripts($1, 1) g(s) $$ language sql immutable"
    )
    eng.sql(
        "create or replace function poly_first(anyarray) returns"
        " anyelement as $$ select $1[1] $$ language sql immutable"
    )
    return eng.sql(
        """
        SELECT p.poly_explode AS region_key,
               count(*) AS cnt,
               poly_first(array[min(n.n_name), max(n.n_name)])
                 AS first_name
        FROM poly_explode(array[0, 1, 2, 3, 4]) p
        JOIN nation n ON n.n_regionkey = p.poly_explode
        GROUP BY p.poly_explode
        ORDER BY region_key
        """
    )
