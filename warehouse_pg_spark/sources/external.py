"""External-table ingest with single-row error handling.

Reference: external web tables scatter URLs across segments and apply
SEGMENT REJECT LIMIT via cdbsreh (access/external/external.c:412-811,
cdb/cdbsreh.c, COPY commands/copy.c). Spark equivalent: the built-in
parallel CSV/JSON readers (per-split parallelism replaces URL
scattering) in PERMISSIVE mode with a corrupt-record column replacing
the single-row error table; the reject limit is enforced after load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_CORRUPT = "_corrupt_record"


class ExternalTableError(RuntimeError):
    """Raised when rejects exceed the configured limit (SREH analogue)."""


def read_external(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    schema: StructType | str | None = None,
    reject_limit: int | None = None,
    reject_fraction: float | None = None,
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Load an external file set; returns (good_rows, rejected_rows).

    reject_limit / reject_fraction mirror
    `SEGMENT REJECT LIMIT n [ROWS | PERCENT]` (gram.y COPY/EXT grammar):
    exceeding it raises ExternalTableError, matching the reference's
    abort semantics (cdbsreh.c reject-limit logic).
    """
    reader = spark.read.format(fmt).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", _CORRUPT
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema = _parse_datatype_string(schema)
        # PERMISSIVE corrupt-record capture requires the column in-schema
        if _CORRUPT not in [f.name for f in schema.fields]:
            schema = schema.add(_CORRUPT, "string")
        reader = reader.schema(schema)
    df = reader.load(path)

    if _CORRUPT not in df.columns:
        return df, df.limit(0)

    df = df.cache()
    bad = df.filter(F.col(_CORRUPT).isNotNull())
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    n_bad = bad.count()
    if reject_limit is not None and n_bad > reject_limit:
        raise ExternalTableError(
            f"segment reject limit reached: {n_bad} rejected > limit {reject_limit}"
        )
    if reject_fraction is not None:
        total = df.count()
        if total and n_bad / total > reject_fraction:
            raise ExternalTableError(
                f"segment reject limit reached: {n_bad}/{total} rejected "
                f"> fraction {reject_fraction}"
            )
    return good, bad
