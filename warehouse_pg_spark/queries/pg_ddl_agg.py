"""CREATE AGGREGATE DDL queries (split from pg_sql.py in the r16
size pass): the SQL-defined aggregate surface — transition-fold
lowering and the combinefunc two-stage partial/merge plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from warehouse_pg_spark.queries.registry import register


@register(
    "pgsql_create_aggregate",
    oracle="""
    SELECT n_regionkey,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("dialect", "agg", "uda"),
)
def pgsql_create_aggregate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE AGGREGATE over SQL transition/final functions
    (commands/aggregatecmds.c DefineAggregate; regress
    create_aggregate.sql my_avg family): the call lowers to the
    nodeAgg.c transition fold — aggregate(collect_list(x), initcond,
    sfunc) wrapped by finalfunc — with the retained SQL bodies
    inlined into the HOF lambda (r15; NEW)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        "create type r15_agg_state as (total bigint, count bigint)"
    )
    eng.sql(
        "create or replace function r15_sum_trans(s r15_agg_state,"
        " n int) returns r15_agg_state as $$ select"
        " row(coalesce(s.total, 0) + n, coalesce(s.count, 0) + 1)"
        "::r15_agg_state $$ language sql"
    )
    eng.sql(
        "create or replace function r15_sum_final(s r15_agg_state)"
        " returns int8 as $$ select s.total $$ language sql"
    )
    eng.sql(
        "create aggregate r15_nation_sum(int4) (stype ="
        " r15_agg_state, sfunc = r15_sum_trans, finalfunc ="
        " r15_sum_final, initcond = '(0,0)')"
    )
    return eng.sql(
        """
        SELECT n_regionkey,
               r15_nation_sum(n_nationkey) AS key_sum,
               count(*) AS cnt
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )


@register(
    "pgsql_combinefunc_aggregate",
    oracle="""
    SELECT n_regionkey,
           CAST(SUM(n_nationkey) AS DOUBLE) / COUNT(*) AS key_avg,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("dialect", "agg", "uda"),
)
def pgsql_combinefunc_aggregate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE AGGREGATE with a combinefunc lowers to a partial/merge
    two-stage plan (commands/aggregatecmds.c combinefunc;
    cdb/cdbgroupingpaths.c:258 multi-stage agg): the inner stage folds
    each (key, source-partition) cell with sfunc — bounded by
    partition size, never a whole group — and only per-partition
    STATES reach the merge stage, where combinefunc folds them and
    finalfunc projects. NEW r16 (closes the r15 collect_list
    whole-group-buffer scale wart for distributable aggregates)."""
    from warehouse_pg_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.attach_fixtures(sf_dir)
    eng.sql(
        "create type r16_avg_state as (total bigint, count bigint)"
    )
    eng.sql(
        "create or replace function r16_avg_trans(s r16_avg_state,"
        " n int) returns r16_avg_state as $$ select"
        " row(coalesce(s.total, 0) + n, coalesce(s.count, 0) + 1)"
        "::r16_avg_state $$ language sql"
    )
    eng.sql(
        "create or replace function r16_avg_combine(a r16_avg_state,"
        " b r16_avg_state) returns r16_avg_state as $$ select"
        " row(coalesce(a.total, 0) + coalesce(b.total, 0),"
        " coalesce(a.count, 0) + coalesce(b.count, 0))"
        "::r16_avg_state $$ language sql"
    )
    eng.sql(
        "create or replace function r16_avg_final(s r16_avg_state)"
        " returns double precision as $$ select s.total::float8"
        " / s.count $$ language sql"
    )
    eng.sql(
        "create aggregate r16_region_avg(int4) (stype ="
        " r16_avg_state, sfunc = r16_avg_trans, combinefunc ="
        " r16_avg_combine, finalfunc = r16_avg_final, initcond ="
        " '(0,0)')"
    )
    return eng.sql(
        """
        SELECT n_regionkey,
               r16_region_avg(n_nationkey) AS key_avg,
               count(*) AS cnt
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )
