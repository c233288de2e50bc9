"""XMLTABLE — XML-to-relational table function (reference:
executor/nodeTableFuncscan.c, 526 LoC + utils/adt/xml.c xpath engine;
SQL/XML XMLTABLE(row_expr PASSING doc COLUMNS ...)).

Spark-first shape: the same Arrow-batched mapInPandas plumbing as the
JSON json_table analogue (queries/events_json.py) — per-batch Python
parses the XML documents with the stdlib ElementTree (no external
libs), emits one output row per matched row-element, and the output
schema is declared up front so Catalyst plans the downstream
projection/aggregation normally. Partitioning is inherited from the
input — the operator is map-only, no shuffle.

ElementTree supports the XPath subset PG's simple paths use
(tag/tag, predicates, @attr); that covers the XMLTABLE COLUMNS
patterns in the regress corpus (xml.sql uses row paths + relative
column paths + attributes).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TYPES = {"string": StringType(), "long": LongType(), "double": DoubleType()}


def _cast(v: str | None, typ: str):
    if v is None:
        return None
    if typ == "long":
        try:
            return int(v)
        except ValueError:
            return None
    if typ == "double":
        try:
            return float(v)
        except ValueError:
            return None
    return v


def xmltable(
    df: DataFrame,
    xml_col: str,
    row_path: str,
    columns: dict[str, tuple[str, str]],
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """XMLTABLE(row_path PASSING xml_col COLUMNS name type PATH path).

    columns: output name -> (relative path, type) where path is
      '@attr' (attribute of the row element), 'text()' (element text),
      or a relative ElementTree path whose first match's text is used.
    keep: input columns carried through (the lateral-join context).
    Malformed XML documents yield no rows (SREH-style skip), matching
    PG's behavior under XMLOPTION content errors.
    """
    import pandas as pd

    out_schema = StructType(
        [df.schema[k] for k in keep]
        + [StructField(n, _TYPES[t], True) for n, (_, t) in columns.items()]
    )
    col_names = list(keep) + list(columns)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                rec_d = dict(zip(pdf.columns, rec))
                try:
                    root = ET.fromstring(rec_d[xml_col])
                except ET.ParseError:
                    continue
                matches = [root] if row_path in (".", "/") else root.findall(row_path)
                for el in matches:
                    out = {k: rec_d[k] for k in keep}
                    for name, (path, typ) in columns.items():
                        if path.startswith("@"):
                            raw = el.get(path[1:])
                        elif path == "text()":
                            raw = el.text
                        else:
                            sub = el.find(path)
                            raw = None if sub is None else sub.text
                        out[name] = _cast(raw, typ)
                    rows.append(out)
            yield pd.DataFrame(rows, columns=col_names)

    return df.mapInPandas(gen, out_schema)
