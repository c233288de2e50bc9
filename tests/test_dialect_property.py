"""Property-based tests for the PG→Spark dialect shim (hypothesis).

The reference's parser is exercised by 531 regress scripts; our regex
shim's contract is narrower — bounded rewrites that never corrupt SQL
they don't recognize. These properties pin that contract down.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from warehouse_pg_spark import sql_dialect

_IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_PG_TYPES = st.sampled_from(
    ["text", "int2", "int4", "int8", "float4", "float8", "bool", "numeric"]
)
_SPARK_TYPES = {
    "text": "STRING",
    "int2": "SMALLINT",
    "int4": "INT",
    "int8": "BIGINT",
    "float4": "FLOAT",
    "float8": "DOUBLE",
    "bool": "BOOLEAN",
    "numeric": "DECIMAL(38,18)",
}


@settings(max_examples=200, deadline=None)
@given(ident=_IDENT, typ=_PG_TYPES)
def test_cast_operator_rewrites_every_type(ident, typ):
    out = sql_dialect.rewrite(f"SELECT {ident}::{typ} FROM t")
    assert f"CAST({ident} AS {_SPARK_TYPES[typ]})" in out
    assert "::" not in out


@settings(max_examples=100, deadline=None)
@given(ident=_IDENT, key=_IDENT)
def test_json_arrow_rewrite(ident, key):
    out = sql_dialect.rewrite(f"SELECT {ident} ->> '{key}' FROM t")
    assert f"get_json_object({ident}, '$.{key}')" in out


@settings(max_examples=100, deadline=None)
@given(
    sql=st.sampled_from(
        [
            "SELECT a, b FROM t WHERE a > 1 ORDER BY b",
            "SELECT count(*) FROM t GROUP BY a HAVING count(*) > 2",
            "SELECT * FROM t1 JOIN t2 ON t1.a = t2.a",
            "WITH c AS (SELECT 1 AS x) SELECT x FROM c",
            "SELECT 'it''s a literal' FROM t",
            "SELECT a FROM t UNION ALL SELECT b FROM u",
        ]
    )
)
def test_plain_sql_passes_through_unchanged(sql):
    assert sql_dialect.rewrite(sql) == sql


@settings(max_examples=50, deadline=None)
@given(on_col=_IDENT, other=_IDENT)
def test_distinct_on_rewrite_shape(on_col, other):
    sql = (
        f"SELECT DISTINCT ON ({on_col}) {on_col}, {other} "
        f"FROM t ORDER BY {on_col}, {other} DESC"
    )
    out = sql_dialect.rewrite(sql)
    assert "row_number() OVER" in out
    assert f"PARTITION BY {on_col}" in out
    assert "__rn = 1" in out
