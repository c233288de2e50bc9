"""SQL-facing FTS adapters (split from functions/fts.py in the r16
size pass): thin string-in/string-out wrappers over the pure-Python
core, registered as Arrow-batched pandas UDFs in functions/pg.py.
Canonical tsvector/tsquery TEXT forms travel as Spark STRINGs."""

from __future__ import annotations

import functools
import json as _json
import math

from warehouse_pg_spark.functions.fts import (
    TSQuery,
    TSVector,
    array_to_tsvector,
    TOKEN_DESCRIPTIONS,
    parse_default,
    phraseto_tsquery,
    plainto_tsquery,
    querytree,
    setweight,
    to_tsquery,
    to_tsvector,
    to_tsvector_json,
    ts_filter,
    ts_headline,
    ts_lexize,
    ts_match,
    ts_rank,
    ts_rank_cd,
    ts_rewrite,
    tsq_mcontains,
    tsquery_and,
    tsquery_cmp,
    tsquery_not,
    tsquery_or,
    tsquery_phrase,
    tsvector_to_array,
    websearch_to_tsquery,
)

# Spark STRINGs)
# ---------------------------------------------------------------------------

def _as_int(v, default: int = 0) -> int:
    """Arrow hands SQL NULL ints to pandas as NaN floats."""
    if v is None:
        return default
    if isinstance(v, float) and math.isnan(v):
        return default
    return int(v)


def _sql_tsvector_in(s):
    if s is None:
        return None
    return TSVector.parse(s).text()


@functools.lru_cache(maxsize=4096)
def _sql_tsquery_in(s):
    if s is None:
        return None
    return TSQuery.parse(s).text()


def _sql_to_tsvector(cfg, s):
    if s is None or cfg is None:
        return None
    return to_tsvector(cfg, s).text()


def _sql_to_tsvector_json(cfg, doc, filt):
    if doc is None or cfg is None:
        return None
    return to_tsvector_json(cfg, doc, filt).text()


@functools.lru_cache(maxsize=4096)
def _sql_to_tsquery(cfg, s):
    if s is None or cfg is None:
        return None
    return to_tsquery(cfg, s).text()


@functools.lru_cache(maxsize=4096)
def _sql_plainto_tsquery(cfg, s):
    if s is None or cfg is None:
        return None
    return plainto_tsquery(cfg, s).text()


@functools.lru_cache(maxsize=4096)
def _sql_phraseto_tsquery(cfg, s):
    if s is None or cfg is None:
        return None
    return phraseto_tsquery(cfg, s).text()


@functools.lru_cache(maxsize=4096)
def _sql_websearch_to_tsquery(cfg, s):
    if s is None or cfg is None:
        return None
    return websearch_to_tsquery(cfg, s).text()


def _sql_ts_match(v, q):
    if v is None or q is None:
        return None
    return ts_match(TSVector.parse(v), TSQuery.parse(q))


def _sql_setweight(v, w, lexemes):
    if v is None or w is None:
        return None
    if lexemes is not None:
        lexemes = list(lexemes)
        if any(lx is None for lx in lexemes):
            raise ValueError("lexeme array may not contain nulls")
    return setweight(TSVector.parse(v), w, lexemes).text()


def _sql_strip(v):
    if v is None:
        return None
    return TSVector.parse(v).strip().text()


def _sql_tsvector_length(v):
    if v is None:
        return None
    return TSVector.parse(v).length()


def _sql_numnode(q):
    if q is None:
        return None
    return TSQuery.parse(q).size()


def _sql_querytree(q):
    if q is None:
        return None
    return querytree(TSQuery.parse(q))


def _sql_ts_rank(weights, v, q, method):
    if v is None or q is None:
        return None
    return float(ts_rank(TSVector.parse(v), TSQuery.parse(q),
                         weights, _as_int(method)))


@functools.lru_cache(maxsize=1024)
def _tsquery_obj(cfg: str, q: str) -> TSQuery:
    """Parsed-object cache for constant query strings (the per-row
    argument is almost always a literal)."""
    return to_tsquery(cfg, q)


def _sql_ts_rank_doc(cfg, text, q):
    """Fused to_tsvector + ts_rank over raw document text.

    Semantically identical to
    ts_rank(to_tsvector(cfg, text), to_tsquery(cfg, q)) — same core
    functions — but in ONE UDF call: the tsvector never makes the
    render-to-text → JVM → re-parse round trip that chaining
    pg_to_tsvector into pg_ts_rank costs (two ArrowEvalPython nodes,
    the vector text crossing the Python boundary twice, and a full
    TSVector.parse per row). Guide §4.1: control how many columns —
    and how many times — data crosses the boundary."""
    if text is None or cfg is None or q is None:
        return None
    return float(ts_rank(to_tsvector(cfg, text), _tsquery_obj(cfg, q), None, 0))


def _sql_ts_rank_cd(weights, v, q, method):
    if v is None or q is None:
        return None
    return float(ts_rank_cd(TSVector.parse(v), TSQuery.parse(q),
                            weights, _as_int(method)))


def _sql_ts_delete(v, lexemes):
    if v is None or lexemes is None:
        return None
    lst = list(lexemes)
    if any(lx is None for lx in lst):
        raise ValueError("lexeme array may not contain nulls")
    return TSVector.parse(v).delete(lst).text()


def _sql_ts_filter(v, weights):
    if v is None or weights is None:
        return None
    return ts_filter(TSVector.parse(v), list(weights)).text()


def _sql_tsvector_to_array(v):
    if v is None:
        return None
    return tsvector_to_array(TSVector.parse(v))


def _sql_array_to_tsvector(arr):
    if arr is None:
        return None
    return array_to_tsvector(list(arr)).text()


def _sql_tsvector_concat(a, b):
    if a is None or b is None:
        return None
    return TSVector.parse(a).concat(TSVector.parse(b)).text()


def _sql_tsquery_and(a, b):
    if a is None or b is None:
        return None
    return tsquery_and(TSQuery.parse(a), TSQuery.parse(b)).text()


def _sql_tsquery_or(a, b):
    if a is None or b is None:
        return None
    return tsquery_or(TSQuery.parse(a), TSQuery.parse(b)).text()


def _sql_tsquery_not(a):
    if a is None:
        return None
    return tsquery_not(TSQuery.parse(a)).text()


def _sql_tsquery_phrase(a, b, dist):
    if a is None or b is None:
        return None
    return tsquery_phrase(TSQuery.parse(a), TSQuery.parse(b),
                          _as_int(dist, 1)).text()


def _sql_tsq_mcontains(a, b):
    if a is None or b is None:
        return None
    return tsq_mcontains(TSQuery.parse(a), TSQuery.parse(b))


def _sql_ts_rewrite(q, target, sub):
    if q is None or target is None or sub is None:
        return None
    return ts_rewrite(TSQuery.parse(q), TSQuery.parse(target),
                      TSQuery.parse(sub)).text()


def _sql_ts_lexize(dictname, token):
    if dictname is None or token is None:
        return None
    return ts_lexize(dictname, token)


def _sql_ts_headline(cfg, doc, q, opts):
    if doc is None or q is None or cfg is None:
        return None
    return ts_headline(cfg, doc, TSQuery.parse(q), opts)


def _sql_ts_headline_json(cfg, doc, q, opts):
    """json/jsonb ts_headline: highlight inside each string value."""
    if doc is None or q is None or cfg is None:
        return None
    query = TSQuery.parse(q)

    def walk(v):
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, list):
            return [walk(x) for x in v]
        if isinstance(v, str):
            return ts_headline(cfg, v, query, opts)
        return v

    parsed = _json.loads(doc)
    return _json.dumps(walk(parsed), separators=(", ", ": "))


def _sql_tsquery_cmp(a, b):
    if a is None or b is None:
        return None
    return tsquery_cmp(TSQuery.parse(a), TSQuery.parse(b))


def _sql_ts_parse(text):
    """ts_parse('default', text) rows (wparser_def.c tok_alias)."""
    if text is None:
        return None
    return [{"tokid": t, "token": tok}
            for t, tok, _g in parse_default(text)]
