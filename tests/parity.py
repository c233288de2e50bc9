"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a registered query through Spark AND its oracle SQL through DuckDB
over the same parquet fixtures, then compares:
  - row count
  - column names (sorted)
  - order-insensitive value comparison through the SAME canonical value
    channel the driver uses (registry._canonize on the Spark side):
    Decimal ≡ its correctly-rounded double, date ≡ ISO string,
    timestamp ≡ 'YYYY-MM-DD HH:MM:SS' string. Floats stay bit-strict
    (repr-compared) — only the *type tags* are canonical, so a Spark
    query that already emits canonized strings/doubles compares equal
    to a DuckDB oracle that still returns DECIMAL/DATE/TIMESTAMP.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from warehouse_pg_spark.catalog import FIXTURE_TABLES

_REL_TOL = 0.0  # strict by default; loosen per-query only if justified


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, Decimal):
        # _canonize final-casts DecimalType to double on the Spark side;
        # the same exact value converts to the identical double here.
        return _norm(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        # matches _canonize's date_format(ts, 'yyyy-MM-dd HH:mm:ss')
        return f"str:{v.strftime('%Y-%m-%d %H:%M:%S')}"
    if isinstance(v, datetime.date):
        # matches _canonize's DateType → ISO-string cast
        return f"str:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return f"b:{v.hex()}"
    return f"{type(v).__name__}:{v}"


def _table_to_rows(arrow_table):
    cols = sorted(arrow_table.column_names)
    data = arrow_table.select(cols).to_pylist()
    rows = [tuple(_norm(r[c]) for c in cols) for r in data]
    return cols, sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    spark_tbl = spark_df.toArrow()
    con = duckdb_connect(sf_dir)
    try:
        duck_tbl = con.execute(oracle_sql).arrow()
    finally:
        con.close()

    s_cols, s_rows = _table_to_rows(spark_tbl)
    d_cols, d_rows = _table_to_rows(duck_tbl)

    assert s_cols == d_cols, f"[{name}] column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, s, d)
            for i, (s, d) in enumerate(zip(s_rows, d_rows))
            if s != d
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark={s}\n    duck ={d}" for i, s, d in diffs
        )
        raise AssertionError(
            f"[{name}] value mismatch ({len(diffs)}+ differing rows of {len(s_rows)}):\n{msg}"
        )
