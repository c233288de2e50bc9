"""Function-DDL surface split out of engine.py (r15): CREATE
AGGREGATE lowering, polymorphic SQL-function templates, and the
user-type-aware declared-type resolver. Mixed into Engine — the
methods share its session state (_sql_aggregates, _poly_functions,
_scalar_fn_exprs, _user_types)."""

from __future__ import annotations

import re

class FunctionDDLMixin:
    _CREATE_AGG_RE = re.compile(
        r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:ORDERED\s+)?AGGREGATE"
        r"\s+([\w.]+|\"[^\"]+\")\s*"
        r"\(((?:[^()]|\([^()]*\))*)\)\s*(?:\((.*)\))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_AGG_RE = re.compile(
        r"^\s*DROP\s+AGGREGATE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*"
        r"\([^()]*\)\s*(?:CASCADE|RESTRICT)?\s*;?\s*$",
        re.IGNORECASE,
    )

    def _register_polymorphic(self, name, rawargs, rettype, tail):
        """Polymorphic SQL functions (parse_coerce.c
        check_generic_type_consistency: anyarray/anyelement &c): the
        concrete types exist only at the CALL, so the function
        registers as a TEMPLATE — the body text with named holes —
        and call sites expand by substitution, exactly the view
        inlining the planner does for SQL functions. LANGUAGE sql
        only; anything else stays loud."""
        from warehouse_pg_spark.engine import _split_exprs

        lang_m = re.search(r"\bLANGUAGE\s+'?(\w+)'?", tail, re.IGNORECASE)
        if (lang_m.group(1) if lang_m else "sql").lower() != "sql":
            raise NotImplementedError(
                "polymorphic parameters are supported for "
                "LANGUAGE sql bodies")
        body_m = re.search(
            r"\$([A-Za-z_]\w*|)\$(.*)\$\1\$", tail, re.DOTALL
        ) or re.search(
            r"\bAS\s+('(?:[^']|'')*')", tail,
            re.IGNORECASE | re.DOTALL,
        )
        if body_m is None:
            rb = re.search(r"\bRETURN\b(.*)$", tail,
                           re.IGNORECASE | re.DOTALL)
            if rb is None:
                raise ValueError("CREATE FUNCTION: no body")
            body = f"SELECT {rb.group(1).strip()}"
        else:
            body = body_m.group(2 if body_m.re.groups == 2 else 1)
            if body.startswith("'"):
                body = body[1:-1].replace("''", "'")
        try:
            if self.spark.catalog.functionExists(name.lower()):
                # a template would SHADOW a builtin for every call
                # (PG overloads by signature; the single-name
                # registry cannot) — the regress concat(text,
                # VARIADIC any) overload stays loud instead
                raise NotImplementedError(
                    f"polymorphic overload of built-in {name!r} is "
                    "not supported")
        except NotImplementedError:
            raise
        except Exception:
            pass
        pnames: list[str] = []
        variadic_at: int | None = None
        for i, a in enumerate(_split_exprs(rawargs)):
            toks = a.strip().split()
            if toks and toks[0].upper() == "VARIADIC":
                variadic_at = i
                toks = toks[1:]
            elif toks and toks[0].upper() == "IN":
                toks = toks[1:]
            pnames.append(
                toks[0] if len(toks) >= 2 else f"__poly{i + 1}"
            )
        body = re.sub(
            r"\$(\d+)\b",
            lambda m2: pnames[int(m2.group(1)) - 1]
            if 1 <= int(m2.group(1)) <= len(pnames) else m2.group(0),
            body,
        )
        last = [x for x in body.split(";") if x.strip()][-1].strip()
        self._poly_functions[name.lower()] = {
            "params": pnames,
            "body": last,
            "setof": bool(re.match(r"(?is)^\s*SETOF\b|^\s*TABLE\b",
                                   rettype)),
            "variadic_at": variadic_at,
        }
        return self._tag(0)

    def _substitute_polymorphic_calls(self, text: str) -> str:
        """Expand calls to registered polymorphic templates: the
        argument expressions substitute into the body text (per-call
        view inlining — the concrete anyelement type is whatever the
        argument's type is, which is precisely parse_coerce.c's
        resolution, done by Catalyst instead of a catalog). FROM-
        position calls become inline subqueries; scalar/sole-target
        calls become the body's single expression."""
        from warehouse_pg_spark.engine import _split_exprs

        if not self._poly_functions:
            return text
        for name, d in self._poly_functions.items():
            pat = re.compile(rf"(?is)\b{re.escape(name)}\s*\(")
            while True:
                m = pat.search(text)
                if m is None:
                    break
                depth, j = 1, m.end()
                while j < len(text) and depth:
                    if text[j] == "(":
                        depth += 1
                    elif text[j] == ")":
                        depth -= 1
                    j += 1
                args = [a.strip() for a in
                        _split_exprs(text[m.end(): j - 1])]
                va = d.get("variadic_at")
                if va is not None and len(args) >= va:
                    # spread arguments pack into the one array param
                    # (funcapi variadic), unless spelled VARIADIC arr
                    tailargs = args[va:]
                    if len(tailargs) == 1 and re.match(
                        r"(?is)^VARIADIC\b", tailargs[0]
                    ):
                        packed = re.sub(r"(?is)^VARIADIC\s+", "",
                                        tailargs[0])
                    else:
                        packed = "array(" + ", ".join(tailargs) + ")"
                    args = args[:va] + [packed]

                def _atomic(a: str) -> bool:
                    # an already-atomic argument substitutes bare so
                    # downstream SRF/array rewrites still pattern-match
                    return bool(re.fullmatch(
                        r"(?is)(?:[\w.$]+|'(?:[^']|'')*'"
                        r"|[\w.]+\s*\((?:[^()]|\([^()]*\))*\)"
                        r"|array\s*\[[^\[\]]*\])"
                        r"(?:\s*::\s*[\w ]+(?:\[\s*\])?)?", a))

                body = d["body"]
                for pn, av in zip(d["params"], args):
                    sub = av if _atomic(av) else f"({av})"
                    body = re.sub(rf"\b{re.escape(pn)}\b",
                                  sub.replace("\\", "\\\\"), body)
                before = text[: m.start()].rstrip()
                in_from = bool(re.search(
                    r"(?is)(?:\bFROM|\bJOIN|\bLATERAL|,)\s*$", before))
                if d["setof"]:
                    sm = re.match(
                        r"(?is)^\s*SELECT\s+(.*?)\s+(FROM\s+.*)$",
                        body,
                    )
                    if (sm and len(_split_exprs(sm.group(1))) == 1
                            and not re.search(r"(?is)\bAS\s+\w+\s*$",
                                              sm.group(1))):
                        # PG names the single result column after the
                        # function (funcapi.c)
                        body = (f"SELECT {sm.group(1)} AS {name} "
                                f"{sm.group(2)}")
                    has_alias = bool(re.match(
                        r"(?is)\s+(?:AS\s+)?[A-Za-z_]\w*", text[j:]
                    ) and not re.match(
                        r"(?is)\s+(?:WHERE|GROUP|ORDER|LIMIT|HAVING"
                        r"|UNION|INTERSECT|EXCEPT|JOIN|ON|LEFT|RIGHT"
                        r"|FULL|INNER|CROSS)\b", text[j:]))
                    repl = (
                        f"({body})" if (in_from and has_alias)
                        else f"({body}) AS {name}" if in_from
                        else f"({body})"
                    )
                else:
                    sm = re.match(r"(?is)^\s*SELECT\s+(.+)$", body)
                    inner = sm.group(1).strip() if sm else body
                    repl = (
                        f"({inner})"
                        if sm and not re.search(r"(?i)\bFROM\b", inner)
                        else f"({body})"
                    )
                text = text[: m.start()] + repl + text[j:]
        return text

    def _decl_type(self, t: str) -> str:
        """map_decl_type with the session's user types resolved first
        (parse_type.c typenameType over the per-session registry):
        composites -> STRUCT, domains -> their base, enums -> STRING,
        user ranges -> the bound-family struct; schema prefixes strip
        ($user/public resolve to the same per-session namespace)."""
        from warehouse_pg_spark.sql_dialect import map_decl_type
        from warehouse_pg_spark.user_types import _RANGE_SFX_ELEM

        raw = t.strip()
        arr = raw.endswith("[]")
        if arr:
            raw = raw[:-2].strip()
        key = raw.split("(")[0].strip().split(".")[-1].lower()
        ut = self._user_types
        if key in ut.composites:
            fields = ", ".join(
                f"{n}: {self._decl_type(ft)}"
                for n, ft in ut.composites[key].fields
            )
            base = f"STRUCT<{fields}>"
        elif key in ut.domains:
            base = self._decl_type(ut.domains[key].base)
        elif key in ut.enums:
            base = "STRING"
        elif key in ut.ranges:
            el = _RANGE_SFX_ELEM[ut.ranges[key]]
            base = (
                f"STRUCT<lo: {el}, hi: {el}, li: BOOLEAN, "
                "hi_i: BOOLEAN, empty: BOOLEAN>"
            )
        else:
            return map_decl_type(t.strip())
        return f"ARRAY<{base}>" if arr else base

    def _maybe_create_aggregate(self, text: str):
        """CREATE AGGREGATE (commands/aggregatecmds.c DefineAggregate):
        both the modern `name(argtypes) (options)` and the old GP
        one-paren `name (basetype = X, sfunc = ...)` forms register
        {sfunc, stype, finalfunc, initcond}; call sites then lower to
        a collect_list fold (_substitute_aggregate_calls). Parallel
        combinefunc/msfunc options are accepted and ignored — the
        fold is the semantic contract, Spark's exchange handles the
        distribution."""
        m = self._DROP_AGG_RE.match(text)
        if m:
            key = m.group(2).split(".")[-1].lower()
            if self._sql_aggregates.pop(key, None) is None and not m.group(1):
                raise ValueError(f'aggregate "{key}" does not exist')
            return self._tag(0)
        m = self._CREATE_AGG_RE.match(text)
        if m is None:
            return None
        name = m.group(1).split(".")[-1].strip('"').lower()
        first, second = m.group(2) or "", m.group(3)
        opts_src = second if second is not None else first
        if "=" not in opts_src:
            return None  # not an options list: stay loud
        opts: dict[str, str] = {}
        for item in self._split_args(opts_src):
            km = re.match(r'(?s)^\s*"?(\w+)"?\s*=\s*(.+?)\s*$', item)
            if km:
                k = km.group(1).lower()
                # GP's legacy two-stage spellings (aggregatecmds.c
                # pre-merge grammar): sfunc1/stype1/initcond1 are the
                # first-stage transition options
                if k in ("sfunc1", "stype1", "initcond1",
                         "finalfunc1"):
                    k = k[:-1]
                opts[k] = km.group(2).strip()
        sfunc, stype = opts.get("sfunc"), opts.get("stype")
        if not sfunc or not stype:
            raise ValueError(
                "aggregate sfunc and stype must be specified")
        init = opts.get("initcond")
        if init is not None:
            init = init.strip()
            if init.startswith("'") and init.endswith("'"):
                init = init[1:-1].replace("''", "'")
        self._sql_aggregates[name] = {
            "sfunc": sfunc.split(".")[-1],
            "stype": stype,
            "finalfunc": (opts.get("finalfunc") or "").split(".")[-1]
            or None,
            "initcond": init,
        }
        return self._tag(0)

    def _substitute_aggregate_calls(self, text: str) -> str:
        """Lower calls to CREATE AGGREGATE-defined aggregates:
        `my_agg(x)` becomes finalfunc(aggregate(collect_list(x),
        initcond::stype, (acc, v) -> sfunc(acc, v))) — the same
        transition-function fold nodeAgg.c runs, expressed with
        Spark's aggregate() HOF so the state type and the transition
        function (a registered SQL/PL-pgSQL-compiled function) stay
        JVM-resolved. Multi-arg / DISTINCT / ORDER BY call shapes are
        left untouched (loud)."""
        if not self._sql_aggregates:
            return text
        for name, d in self._sql_aggregates.items():
            if not re.search(rf"(?i)\b{re.escape(name)}\s*\(", text):
                continue

            def repl(m: re.Match, d=d) -> str:
                arg = m.group(1).strip()
                if (not arg or arg == "*" or "," in arg
                        or re.search(r"(?i)\bdistinct\b|\border\s+by\b",
                                     arg)):
                    return m.group(0)
                stype = d["stype"]
                if d["initcond"] is not None:
                    esc = d["initcond"].replace("'", "''")
                    init = f"'{esc}'::{stype}"
                else:
                    init = f"NULL::{stype}"
                # Spark's SQL-UDF inliner can't reach inside a HOF
                # lambda under an Aggregate — inline the transition
                # function's retained body by hand
                sf = self._scalar_fn_exprs.get(d["sfunc"].lower())
                if sf is None or len(sf[0]) != 2:
                    return m.group(0)  # non-SQL sfunc: stay loud
                step = sf[1]
                for pn, var in zip(sf[0], ("__acc", "__v")):
                    step = re.sub(rf"\b{re.escape(pn)}\b", var, step)
                inner = (
                    f"aggregate(collect_list({arg}), {init}, "
                    f"(__acc, __v) -> {step})"
                )
                if d["finalfunc"]:
                    inner = f"{d['finalfunc']}({inner})"
                return f"({inner})"

            text = re.sub(
                rf"(?i)\b{re.escape(name)}\s*\(([^()]*)\)", repl, text
            )
        return text

