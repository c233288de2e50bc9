"""Local mirror of the driver's DuckDB-oracle correctness check.

DRIVER-FAITHFUL CHANNEL (round 9): the grading driver compares results
through *pandas* — Spark DataFrame -> toPandas(), DuckDB -> .df(),
columns sorted by name, every column rendered with `astype(str)`
(whole-column), rows sorted, values hashed. Pandas string rendering is
column-uniform and data-dependent: a datetime64 column whose values are
ALL midnight renders date-only ('1997-06-01'), while one mixed value
with a time part flips the whole column to '1997-06-01 00:00:00'.

The round-8 red (`pgsql_keyset_pagination`) shipped because the old
local mirror normalized per-cell (strftime each value), which CANNOT
represent that class: the Spark side emitted '1997-06-01 00:00:00'
strings (registry._canonize) while the driver's pandas channel rendered
the DuckDB datetime64 side date-only.  This module now reproduces the
driver's channel exactly, so any query green here is green there.

Consequences for oracle authors (see registry.py parity rules):
  - A Spark-side raw TIMESTAMP output (canonized to a
    'yyyy-MM-dd HH:mm:ss' string) needs the oracle projected through
    strftime(col, '%Y-%m-%d %H:%M:%S') so both sides are strings.
  - A Spark-side DATE output (canonized to 'yyyy-MM-dd') matches a
    DuckDB DATE/all-midnight-TIMESTAMP column as-is, but if the column
    is NULLABLE the pandas renderings diverge ('None' vs 'NaT') — wrap
    the oracle in strftime(col, '%Y-%m-%d') to make NULL render 'None'.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from warehouse_pg_spark.catalog import FIXTURE_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _pandas_rows(pdf: pd.DataFrame):
    """The driver's canonical form: sorted column names, astype(str)
    rendering (whole-column pandas semantics), sorted row tuples."""
    cols = sorted(pdf.columns)
    spdf = pdf[cols].astype(str)
    rows = sorted(map(tuple, spdf.itertuples(index=False, name=None)))
    return list(cols), rows


def compare(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    spark_pd = spark_df.toPandas()
    con = duckdb_connect(sf_dir)
    try:
        duck_pd = con.execute(oracle_sql).df()
    finally:
        con.close()

    s_cols, s_rows = _pandas_rows(spark_pd)
    d_cols, d_rows = _pandas_rows(duck_pd)

    assert s_cols == d_cols, f"[{name}] column mismatch: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [(i, s, d) for i, (s, d) in enumerate(zip(s_rows, d_rows)) if s != d][
            :5
        ]
        msg = "\n".join(
            f"  row {i}:\n    spark={s}\n    duck ={d}" for i, s, d in diffs
        )
        raise AssertionError(
            f"[{name}] value mismatch ({len(diffs)}+ differing rows of {len(s_rows)}):\n{msg}"
        )
