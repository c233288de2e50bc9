"""Interpreted void procedures (split surface, r16): RETURNS VOID
PL/pgSQL functions whose bodies perform DML.

The compiled-expression model (plpgsql.py) cannot hold side effects,
but pl_exec.c's semantics for these bodies are a small imperative
subset: scalar DECLAREs, assignments, IF/ELSIF/CASE, WHILE and
integer-range FOR loops, PERFORM, RAISE, and INSERT/UPDATE/DELETE
statements whose expressions reference parameters and local scalars.
This mixin interprets that subset driver-side at CALL time — each
scalar expression evaluates through one `SELECT` (so every dialect
rewrite applies), each DML statement runs through Engine.sql with the
variable values substituted as literals. The loop fuel bound keeps a
runaway body loud instead of wedging the session (pl_exec.c loops
unboundedly; replay bodies are small).
"""

from __future__ import annotations

import re

_PROC_MAX_STEPS = 100_000


class ProcedureMixin:
    def _register_plpgsql_proc(self, name: str,
                               params: list[tuple[str, str]],
                               body: str) -> bool:
        """Accept a void plpgsql body containing DML for the
        interpreter; returns False when the body uses statements the
        subset cannot interpret (caller falls back to the compiler's
        loud error path)."""
        from warehouse_pg_spark import plpgsql as P

        masked, lits = P._mask(P._strip_comments(body))
        m = P._HEADER_RE.search(masked)
        if m is None:
            return False
        decl, inner = P._inline_cursor_loops(m.group("decl") or "",
                                             m.group("body"))
        try:
            stmts = P._parse_stmts(P._split_statements(inner))
        except P.PlpgsqlError:
            return False
        if not self._stmts_interpretable(stmts):
            return False
        declared: list[tuple[str, str | None]] = []
        for d in [x.strip() for x in decl.split(";") if x.strip()]:
            dm = re.match(
                r"^([A-Za-z_]\w*)\s+(?:CONSTANT\s+)?(?:[\w(), %]+?)"
                r"(?:\s*(?::=|=|DEFAULT)\s*(.+))?$",
                d, re.IGNORECASE | re.DOTALL)
            if dm is None:
                return False
            declared.append((dm.group(1).lower(),
                             P._unmask(dm.group(2), lits)
                             if dm.group(2) else None))
        self._void_procs[name.lower()] = (
            "plpgsql", [p for p, _t in params], declared, stmts, lits)
        return True

    @staticmethod
    def _stmts_interpretable(stmts) -> bool:
        ok_kinds = {"assign", "dml", "null", "return", "raise",
                    "if", "case", "while", "for"}

        def walk(ss) -> bool:
            for s in ss:
                if s[0] not in ok_kinds:
                    return False
                if s[0] in ("if", "case"):
                    for _c, b in s[1]:
                        if not walk(b):
                            return False
                    if s[2] and not walk(s[2]):
                        return False
                elif s[0] == "while":
                    if not walk(s[2]):
                        return False
                elif s[0] == "for":
                    if not walk(s[5]):
                        return False
            return True

        return walk(stmts)

    # ------------------------------------------------------ execution
    def _run_plpgsql_proc(self, proc, arg_exprs: list[str]) -> None:
        from warehouse_pg_spark import plpgsql as P

        _kind, pnames, declared, stmts, lits = proc
        args = [self._proc_eval_raw(a) for a in arg_exprs]
        env: dict[str, object] = {}
        for i, v in enumerate(args, start=1):
            env[f"${i}"] = v
            if i <= len(pnames):
                env[pnames[i - 1].lower()] = v
        for n, init in declared:
            env[n] = self._proc_eval(init, env) if init else None
        fuel = [_PROC_MAX_STEPS]
        self._proc_run_seq(stmts, env, lits, fuel)

    def _proc_sub(self, text: str, env: dict) -> str:
        """Substitute $n and variable names with SQL literals."""
        def lit(v) -> str:
            if v is None:
                return "NULL"
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (int, float)):
                return repr(v)
            return "'" + str(v).replace("'", "''") + "'"

        text = re.sub(r"\$(\d+)",
                      lambda m: lit(env.get(f"${m.group(1)}")),
                      text)
        names = sorted((k for k in env if not k.startswith("$")),
                       key=len, reverse=True)
        for n in names:
            text = re.sub(rf"(?i)\b{re.escape(n)}\b(?!\s*\()",
                          lit(env[n]), text)
        return text

    def _proc_eval_raw(self, expr: str):
        row = self.sql(f"SELECT {expr}").collect()[0]
        return row[0]

    def _proc_eval(self, expr: str, env: dict):
        return self._proc_eval_raw(self._proc_sub(expr, env))

    def _proc_run_seq(self, stmts, env, lits, fuel) -> bool:
        """Returns True when a RETURN unwound the body."""
        from warehouse_pg_spark import plpgsql as P

        for s in stmts:
            fuel[0] -= 1
            if fuel[0] <= 0:
                raise RuntimeError(
                    "interpreted procedure exceeded "
                    f"{_PROC_MAX_STEPS} statements (runaway loop?)")
            k = s[0]
            if k == "null":
                continue
            if k == "return":
                return True
            if k == "assign":
                env[s[1]] = self._proc_eval(
                    P._unmask(s[2], lits), env)
            elif k == "dml":
                self.sql(self._proc_sub(P._unmask(s[1], lits), env))
            elif k == "raise":
                # only EXCEPTION level parses to this kind
                raise RuntimeError(P._unmask(str(s[1]), lits))
            elif k in ("if", "case"):
                done = False
                for cond, branch in s[1]:
                    if self._proc_truthy(cond, env, lits):
                        done = self._proc_run_seq(branch, env, lits,
                                                  fuel)
                        break
                else:
                    if s[2]:
                        done = self._proc_run_seq(s[2], env, lits,
                                                  fuel)
                if done:
                    return True
            elif k == "while":
                while self._proc_truthy(s[1], env, lits):
                    fuel[0] -= 1
                    if fuel[0] <= 0:
                        raise RuntimeError(
                            "interpreted procedure exceeded "
                            f"{_PROC_MAX_STEPS} statements")
                    if self._proc_run_seq(s[2], env, lits, fuel):
                        return True
            elif k == "for":
                _, var, lo, hi, rev, body = s
                lo_v = int(self._proc_eval(P._unmask(lo, lits), env))
                hi_v = int(self._proc_eval(P._unmask(hi, lits), env))
                rng = (range(lo_v, hi_v - 1, -1) if rev
                       else range(lo_v, hi_v + 1))
                for i in rng:
                    env[var] = i
                    if self._proc_run_seq(body, env, lits, fuel):
                        return True
            # exit_when/continue_when: desugared flags are assignments
        return False

    def _proc_truthy(self, cond, env, lits) -> bool:
        from warehouse_pg_spark import plpgsql as P

        if cond is True or cond is None:
            return bool(cond is True)
        v = self._proc_eval(P._unmask(str(cond), lits), env)
        return bool(v)
