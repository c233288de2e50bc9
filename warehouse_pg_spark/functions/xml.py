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


def _xpath_py(doc, path):
    """SQL-callable PG xpath(path, xml) (xml.c:4245 evaluated over
    ElementTree) — the engine registers this as `pg_xpath(doc, path)`
    (args swapped to match the other doc-first shims). Returns the
    match list PG prints as a text[]:

      element matches  → serialized nodes
      /text() tails    → text content ('//text()' = every text node)
      @attr tails      → attribute values
      count(p) [op n]  → single-element array: the count, or the
                         boolean of the comparison (xpath returns the
                         value sequence; PG casts scalars to text)
      name(p)          → tag name of the first match

    The document node is modeled by a synthetic wrapper element, so
    absolute ('/a'), anywhere ('//a') and relative ('a') paths all
    evaluate with PG's document-node context. Malformed XML yields an
    empty array (XMLOPTION-content skip, like XMLTABLE); an
    unparseable path raises, as PG's 'invalid XPath expression'."""
    if doc is None or path is None:
        return None
    import re as _re
    import xml.etree.ElementTree as ET

    body = _re.sub(r"^\s*<\?xml[^>]*\?>", "", doc)
    try:
        wrap = ET.fromstring(f"<__pg_doc__>{body}</__pg_doc__>")
    except ET.ParseError:
        # xml.c xpath(): unlike the well-formed checks, evaluation
        # parses strictly — undeclared ns prefixes and broken markup
        # raise rather than yield an empty node-set
        raise ValueError("could not parse XML document")
    p = path.strip()

    def select(q):
        q = q.strip()
        if q in ("", "/", "."):
            return [wrap]
        if q.startswith("//"):
            q = ".//" + q[2:]
        elif q.startswith("/"):
            q = q[1:]
        try:
            return wrap.findall(q)
        except SyntaxError:
            raise ValueError(f"invalid XPath expression: {path}")

    m = _re.fullmatch(
        r"count\s*\((.*)\)\s*(?:(=|!=|<>|<=|>=|<|>)\s*(\d+))?\s*", p
    )
    if m:
        n = len(select(m.group(1)))
        if m.group(2) is None:
            return [str(n)]
        rhs = int(m.group(3))
        ok = {
            "=": n == rhs, "!=": n != rhs, "<>": n != rhs,
            "<": n < rhs, "<=": n <= rhs, ">": n > rhs, ">=": n >= rhs,
        }[m.group(2)]
        return ["true" if ok else "false"]
    m = _re.fullmatch(r"name\s*\((.*)\)\s*", p)
    if m:
        els = select(m.group(1))
        return [els[0].tag] if els else []

    mode, attr = "element", None
    if p.endswith("/text()") or p == "text()":
        mode = "text"
        p = p[: -len("/text()")] if p != "text()" else "."
    else:
        head, sep, tail = p.rpartition("/")
        if tail.startswith("@"):
            mode, attr, p = "attr", tail[1:], (head if sep else ".")
    if mode == "text" and p.strip() in ("", "/"):
        # '//text()': every text node in document order
        return [t for t in wrap.itertext() if t]
    if mode == "attr" and p.strip() in ("", "/"):
        els = list(wrap.iter())
    else:
        els = select(p)
    if mode == "text":
        out = []
        for e in els:
            if e is wrap:
                out.extend(t for t in e.itertext() if t)
            else:
                out.append(e.text or "")
        return out
    if mode == "attr":
        if attr == "*":
            return [v for e in els for v in e.attrib.values()]
        return [e.get(attr) for e in els if e.get(attr) is not None]
    def ser(e):
        # a node's serialization excludes its tail text, and PG/libxml
        # prints self-closing tags without the ElementTree space
        t = e.tail
        e.tail = None
        try:
            return ET.tostring(e, encoding="unicode").replace(" />", "/>")
        finally:
            e.tail = t

    return [ser(e) for e in els if e is not wrap]


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
