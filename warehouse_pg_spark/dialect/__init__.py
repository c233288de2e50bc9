"""PG -> Spark SQL dialect shim, split into ordered-pass modules.

The pipeline lives in warehouse_pg_spark.sql_dialect.rewrite();
these modules hold the passes it composes. All passes operate on
literal-masked text (see mask.py) and are pure string -> string.
"""
