"""XML type function family: xpath() / xpath_exists() / xmlagg.

Reference: utils/adt/xml.c (xpath evaluation over libxml2,
xml.c:4245 xpath(); xmlagg at pg_proc xmlagg/xmlconcat). Spark has no
XML type, so the engine's XML policy mirrors XMLTABLE
(operators/xmltab.py): XML documents are plain STRING columns;
xpath evaluation is an Arrow-batched pandas UDF over stdlib
ElementTree (map-only, no shuffle, no external libs); xmlagg is pure
JVM string aggregation (an XML fragment concat IS a string concat —
no Python boundary needed on the agg path).

ElementTree's XPath subset (tag/tag, predicates, @attr, text())
covers the simple-path usage in the reference regress corpus
(src/test/regress/sql/xml.sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def xpath(xml: Column | str, path: str) -> Column:
    """PG xpath(path, xml) → array of matched nodes, serialized.

    Subset semantics (xml.c:4245):
      - 'a/b/text()'  → text content of the matched elements
      - 'a/b/@attr'   → attribute values of the matched elements
      - 'a/b'         → full serialization of each matched element
    Matches are returned in document order; malformed XML yields an
    empty array (XMLOPTION-content error skip, like XMLTABLE).
    """
    xml_col = F.col(xml) if isinstance(xml, str) else xml

    mode, et_path, attr = "element", path, None
    if path.endswith("/text()"):
        mode, et_path = "text", path[: -len("/text()")]
    else:
        head, _, tail = path.rpartition("/")
        if tail.startswith("@"):
            mode, et_path, attr = "attr", head or ".", tail[1:]

    @F.pandas_udf(ArrayType(StringType()))
    def _xpath(s):  # type: ignore[no-untyped-def]
        import pandas as pd
        import xml.etree.ElementTree as ET

        out = []
        for doc in s:
            if doc is None:
                out.append(None)
                continue
            try:
                root = ET.fromstring(doc)
            except ET.ParseError:
                out.append([])
                continue
            els = [root] if et_path in (".", "") else root.findall(et_path)
            if mode == "text":
                out.append([e.text or "" for e in els])
            elif mode == "attr":
                out.append([e.get(attr) for e in els if e.get(attr) is not None])
            else:
                out.append([ET.tostring(e, encoding="unicode") for e in els])
        return pd.Series(out)

    return _xpath(xml_col)


def xpath_exists(xml: Column | str, path: str) -> Column:
    """PG xpath_exists(path, xml) (xml.c xmlexists)."""
    return F.size(xpath(xml, path)) > 0


def xmlagg(frag: Column | str, order_key: Column | str | None = None) -> Column:
    """PG xmlagg(xml [ORDER BY k]) — XML fragment concatenation.

    Pure JVM: collect_list + sort_array + array_join (Spark aggregates
    have no ORDER BY; the struct-sort trick makes the concat order
    deterministic — same machinery as functions/pg.string_agg)."""
    frag_c = F.col(frag) if isinstance(frag, str) else frag
    if order_key is None:
        return F.array_join(F.sort_array(F.collect_list(frag_c)), "")
    key_c = F.col(order_key) if isinstance(order_key, str) else order_key
    pairs = F.sort_array(
        F.collect_list(F.struct(key_c.alias("k"), frag_c.alias("v")))
    )
    return F.array_join(F.transform(pairs, lambda s: s.getField("v")), "")
