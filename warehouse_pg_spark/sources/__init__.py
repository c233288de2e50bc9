from warehouse_pg_spark.sources.external import read_external, ExternalTableError

__all__ = ["read_external", "ExternalTableError"]
