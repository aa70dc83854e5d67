"""``matchRecognize`` transform: SQL row-pattern matching (MATCH_RECOGNIZE).

The reference exposes MATCH_RECOGNIZE through Calcite in its beamsql module
(module/transform/BeamSQLTransformTest.java:166-279 testMatchRecognize:
PARTITION BY / ORDER BY / MEASURES with FIRST and PREV / PATTERN with
alternation / SUBSET / DEFINE).  Spark SQL has no MATCH_RECOGNIZE, so this
is a from-scratch implementation of the SQL:2016 row-pattern subset the
reference exercises:

  * PATTERN: concatenation, alternation ``|``, grouping, quantifiers
    ``* + ? {m} {m,} {m,n}`` (greedy), anchors ``^ $`` not supported
  * DEFINE: boolean expressions over the current row; ``PREV``/``NEXT``
    physical offsets; ``FIRST``/``LAST`` logical (per-variable) offsets;
    unqualified fields and ``VAR.field`` both read the current row while a
    variable is being defined, the last-mapped row of VAR otherwise
  * MEASURES: variable-qualified fields, FIRST/LAST/PREV/NEXT,
    CLASSIFIER(), MATCH_NUMBER(), and SUM/AVG/MIN/MAX/COUNT over a
    variable's mapped rows; SUBSET unions
  * ONE ROW PER MATCH (default) / ALL ROWS PER MATCH
  * AFTER MATCH SKIP PAST LAST ROW (default) / SKIP TO NEXT ROW

Scale posture: one shuffle on the partition keys, then each key's rows are
matched independently inside ``applyInPandas`` (sorted per group).  The
matcher is linear in rows for patterns without overlapping backtracking —
the same execution profile as Flink's CEP operator.  An un-partitioned
pattern funnels everything through one task, so partitionBy is required
unless ``allowGlobal: true``.  Hot-key guards: rows stay in the compact
columnar frame and are materialized as Python dicts lazily in bounded LRU
blocks (``_RowWindow``); ``maxRowsPerKey`` (default 20M) fails fast with
a partitioning hint instead of OOMing a task; ``maxSteps`` (default 2M
per anchor row) turns pathological backtracking (nested quantifiers over
alternation) into an actionable error instead of a hung executor.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_spark.registry import KIND_TRANSFORM, ModuleContext, module

# ---------------------------------------------------------------------------
# expression language (DEFINE / MEASURES)

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>`[^`]+`|[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><>|!=|>=|<=|=|>|<|\+|-|\*|/|\(|\)|,|\.)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IS", "IN", "BETWEEN"}
_FUNCS = {"PREV", "NEXT", "FIRST", "LAST", "CLASSIFIER", "MATCH_NUMBER",
          "SUM", "AVG", "MIN", "MAX", "COUNT", "ABS", "CAST"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"match_recognize: cannot tokenize at: {text[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "ident":
            ident = m.group("ident").strip("`")
            up = ident.upper()
            if up in _KEYWORDS or up in _FUNCS:
                out.append(("kw", up))
            else:
                out.append(("id", ident))
        else:
            out.append(("op", m.group("op")))
    return out


class _Ctx:
    """Evaluation context for one candidate row inside one partition.

    ``rows`` is the partition as a list of dicts; ``assign`` maps row index →
    variable name for rows matched so far; ``idx`` is the current row (None
    when evaluating MEASURES over a finished match); ``defining`` is the
    variable currently being tested (DEFINE scope)."""

    __slots__ = ("rows", "assign", "idx", "defining", "subsets", "match_no")

    def __init__(self, rows, assign, idx, defining, subsets, match_no=0):
        self.rows = rows
        self.assign = assign
        self.idx = idx
        self.defining = defining
        self.subsets = subsets
        self.match_no = match_no

    def var_rows(self, var: str) -> list[int]:
        names = self.subsets.get(var, [var])
        return [i for i in sorted(self.assign) if self.assign[i] in names]

    def field(self, field: str):
        if self.idx is None:
            raise ValueError(f"unqualified field '{field}' needs a current row")
        return self.rows[self.idx].get(field)

    def var_field(self, var: str, field: str):
        # while defining VAR, VAR.field (and any subset containing it)
        # reads the current row; otherwise the last mapped row of VAR
        if self.defining is not None and self.idx is not None and (
            var == self.defining or self.defining in self.subsets.get(var, ())
        ):
            return self.rows[self.idx].get(field)
        vr = self.var_rows(var)
        if not vr:
            return None
        return self.rows[vr[-1]].get(field)

    def prev(self, value_fn, n: int):
        if self.idx is None:
            raise ValueError("PREV needs a current row")
        j = self.idx - n
        if j < 0:
            return None
        return _Ctx(self.rows, self.assign, j, self.defining, self.subsets).run(value_fn)

    def next(self, value_fn, n: int):
        if self.idx is None:
            raise ValueError("NEXT needs a current row")
        j = self.idx + n
        if j >= len(self.rows):
            return None
        return _Ctx(self.rows, self.assign, j, self.defining, self.subsets).run(value_fn)

    def nav(self, kind: str, value_fn, var: str | None, n: int):
        """FIRST/LAST over a variable's mapped rows (logical navigation)."""
        vr = self.var_rows(var) if var else sorted(self.assign)
        if not vr:
            return None
        pos = n if kind == "first" else len(vr) - 1 - n
        if pos < 0 or pos >= len(vr):
            return None
        # defining=var so the qualified reference (e.g. FIRST(R.value))
        # reads the navigated row, not the variable's last mapped row
        return _Ctx(self.rows, self.assign, vr[pos], var, self.subsets).run(value_fn)

    def agg(self, op: str, value_fn, var: str | None):
        vr = self.var_rows(var) if var else sorted(self.assign)
        vals = [
            _Ctx(self.rows, self.assign, i, var, self.subsets).run(value_fn)
            for i in vr
        ]
        vals = [v for v in vals if v is not None]
        if op == "count":
            return len(vals)
        if not vals:
            return None
        if op == "sum":
            return sum(vals)
        if op == "avg":
            return sum(vals) / len(vals)
        if op == "min":
            return min(vals)
        if op == "max":
            return max(vals)
        raise ValueError(op)

    def classifier(self):
        if self.idx is None:
            vr = sorted(self.assign)
            return self.assign[vr[-1]] if vr else None
        return self.assign.get(self.idx)

    def run(self, fn):
        return fn(self)


class _ExprParser:
    """Recursive-descent parser → Callable[[_Ctx], Any].

    SQL three-valued logic is collapsed to two: a NULL comparison result is
    False (matching WHERE/DEFINE semantics where unknown rows don't match).
    """

    def __init__(self, tokens: list[tuple[str, str]], variables: set[str]):
        self.toks = tokens
        self.pos = 0
        self.vars = variables

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def eat(self, kind=None, value=None):
        t = self.peek()
        if kind and t[0] != kind:
            raise ValueError(f"expected {kind}, got {t}")
        if value and t[1] != value:
            raise ValueError(f"expected {value}, got {t}")
        self.pos += 1
        return t

    def parse(self) -> Callable[[_Ctx], Any]:
        fn = self.or_expr()
        if self.pos != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.pos:]}")
        return fn

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == ("kw", "OR"):
            self.eat()
            right = self.and_expr()
            left = (lambda l, r: lambda c: bool(l(c)) or bool(r(c)))(left, right)
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.peek() == ("kw", "AND"):
            self.eat()
            right = self.not_expr()
            left = (lambda l, r: lambda c: bool(l(c)) and bool(r(c)))(left, right)
        return left

    def not_expr(self):
        if self.peek() == ("kw", "NOT"):
            self.eat()
            inner = self.not_expr()
            return lambda c: not bool(inner(c))
        return self.cmp_expr()

    def cmp_expr(self):
        left = self.add_expr()
        kind, val = self.peek()
        if kind == "op" and val in ("=", "<>", "!=", ">", ">=", "<", "<="):
            self.eat()
            right = self.add_expr()

            def cmp(c, l=left, r=right, op=val):
                a, b = l(c), r(c)
                if a is None or b is None:
                    return False
                if op == "=":
                    return a == b
                if op in ("<>", "!="):
                    return a != b
                if op == ">":
                    return a > b
                if op == ">=":
                    return a >= b
                if op == "<":
                    return a < b
                return a <= b

            return cmp
        if kind == "kw" and val == "IS":
            self.eat()
            negate = False
            if self.peek() == ("kw", "NOT"):
                self.eat()
                negate = True
            self.eat("kw", "NULL")
            return (lambda l, neg: lambda c: (l(c) is None) != neg)(left, negate)
        if kind == "kw" and val == "IN":
            self.eat()
            self.eat("op", "(")
            items = [self.add_expr()]
            while self.peek() == ("op", ","):
                self.eat()
                items.append(self.add_expr())
            self.eat("op", ")")

            def in_fn(c, l=left, items=items):
                v = l(c)
                return v is not None and v in [i(c) for i in items]

            return in_fn
        return left

    def add_expr(self):
        left = self.mul_expr()
        while True:
            kind, val = self.peek()
            if kind == "op" and val in ("+", "-"):
                self.eat()
                right = self.mul_expr()

                def arith(c, l=left, r=right, op=val):
                    a, b = l(c), r(c)
                    if a is None or b is None:
                        return None
                    return a + b if op == "+" else a - b

                left = arith
            else:
                return left

    def mul_expr(self):
        left = self.unary()
        while True:
            kind, val = self.peek()
            if kind == "op" and val in ("*", "/"):
                self.eat()
                right = self.unary()

                def arith(c, l=left, r=right, op=val):
                    a, b = l(c), r(c)
                    if a is None or b is None:
                        return None
                    return a * b if op == "*" else a / b

                left = arith
            else:
                return left

    def unary(self):
        kind, val = self.peek()
        if kind == "op" and val == "-":
            self.eat()
            inner = self.unary()
            return lambda c: None if inner(c) is None else -inner(c)
        return self.primary()

    def _nav_args(self):
        """Parse `(value_expr [, n])` for PREV/NEXT/FIRST/LAST."""
        self.eat("op", "(")
        value = self.add_expr()
        n = 1
        if self.peek() == ("op", ","):
            self.eat()
            n = int(self.eat("num")[1])
        self.eat("op", ")")
        return value, n

    def primary(self):
        kind, val = self.peek()
        if kind == "num":
            self.eat()
            v = float(val) if "." in val else int(val)
            return lambda c: v
        if kind == "str":
            self.eat()
            return lambda c, v=val: v
        if kind == "kw" and val in ("TRUE", "FALSE"):
            self.eat()
            return (lambda c: True) if val == "TRUE" else (lambda c: False)
        if kind == "kw" and val == "NULL":
            self.eat()
            return lambda c: None
        if kind == "kw" and val == "CAST":
            self.eat()
            self.eat("op", "(")
            inner = self.add_expr()
            # `AS type` — the matcher is dynamically typed; numeric casts
            # coerce, everything else passes through
            if self.peek() == ("kw", None) or self.peek()[1] == "AS" or True:
                toks = []
                depth = 0
                while self.peek() != ("op", ")") or depth:
                    t = self.eat()
                    if t == ("op", "("):
                        depth += 1
                    elif t == ("op", ")"):
                        depth -= 1
                    toks.append(t)
            self.eat("op", ")")
            target = toks[-1][1].upper() if toks else ""
            if target in ("DOUBLE", "FLOAT", "DECIMAL", "REAL"):
                return lambda c: None if inner(c) is None else float(inner(c))
            if target in ("BIGINT", "INT", "INTEGER", "SMALLINT"):
                return lambda c: None if inner(c) is None else int(inner(c))
            return inner
        if kind == "kw" and val in ("PREV", "NEXT"):
            self.eat()
            value, n = self._nav_args()
            if val == "PREV":
                return lambda c, v=value, n=n: c.prev(v, n)
            return lambda c, v=value, n=n: c.next(v, n)
        if kind == "kw" and val in ("FIRST", "LAST"):
            self.eat()
            self.eat("op", "(")
            # peek for VAR.field inside to learn the variable
            var = None
            if (
                self.peek()[0] == "id"
                and self.peek()[1] in self.vars
                and self.toks[self.pos + 1 : self.pos + 2] == [("op", ".")]
            ):
                var = self.peek()[1]
            value = self.add_expr()
            n = 0
            if self.peek() == ("op", ","):
                self.eat()
                n = int(self.eat("num")[1])
            self.eat("op", ")")
            return lambda c, v=value, var=var, n=n, k=val.lower(): c.nav(k, v, var, n)
        if kind == "kw" and val in ("SUM", "AVG", "MIN", "MAX", "COUNT"):
            self.eat()
            self.eat("op", "(")
            var = None
            if (
                self.peek()[0] == "id"
                and self.peek()[1] in self.vars
                and self.toks[self.pos + 1 : self.pos + 2] == [("op", ".")]
            ):
                var = self.peek()[1]
            if self.peek() == ("op", "*"):
                self.eat()
                value = lambda c: 1
            else:
                value = self.add_expr()
            self.eat("op", ")")
            return lambda c, op=val.lower(), v=value, var=var: c.agg(op, v, var)
        if kind == "kw" and val == "CLASSIFIER":
            self.eat()
            self.eat("op", "(")
            self.eat("op", ")")
            return lambda c: c.classifier()
        if kind == "kw" and val == "MATCH_NUMBER":
            self.eat()
            self.eat("op", "(")
            self.eat("op", ")")
            return lambda c: c.match_no
        if kind == "kw" and val == "ABS":
            self.eat()
            self.eat("op", "(")
            inner = self.add_expr()
            self.eat("op", ")")
            return lambda c: None if inner(c) is None else abs(inner(c))
        if kind == "id":
            name = self.eat()[1]
            if self.peek() == ("op", "."):
                self.eat()
                field = self.eat("id")[1]
                if name not in self.vars:
                    raise ValueError(f"unknown pattern variable '{name}'")
                return lambda c, v=name, f=field: c.var_field(v, f)
            return lambda c, f=name: c.field(f)
        if kind == "op" and val == "(":
            self.eat()
            inner = self.or_expr()
            self.eat("op", ")")
            return inner
        raise ValueError(f"match_recognize: unexpected token {self.peek()}")


def compile_expr(text: str, variables: set[str]) -> Callable[[_Ctx], Any]:
    return _ExprParser(_tokenize(text), variables).parse()


class _ColumnBackend:
    """Translate a row-local DEFINE expression to a Spark Column so the
    per-row predicate evaluates inside whole-stage codegen (PREV/NEXT →
    lag/lead over the partition window) instead of per-row Python.  Only
    the row-local subset is translatable; the caller falls back to the
    Python evaluator for anything this raises on."""

    def __init__(self, tokens, variables, defined_var, window):
        self.toks = tokens
        self.pos = 0
        self.vars = variables
        self.defined = defined_var
        self.w = window

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def eat(self, kind=None, value=None):
        t = self.peek()
        if (kind and t[0] != kind) or (value and t[1] != value):
            raise ValueError(f"column backend: unexpected {t}")
        self.pos += 1
        return t

    def parse(self):
        c = self.or_expr()
        if self.pos != len(self.toks):
            raise ValueError("column backend: trailing tokens")
        return c

    def or_expr(self):
        left = self.and_expr()
        while self.peek() == ("kw", "OR"):
            self.eat()
            left = left | self.and_expr()
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.peek() == ("kw", "AND"):
            self.eat()
            left = left & self.not_expr()
        return left

    def not_expr(self):
        if self.peek() == ("kw", "NOT"):
            self.eat()
            return ~self.not_expr()
        return self.cmp_expr()

    def cmp_expr(self):
        left = self.add_expr()
        kind, val = self.peek()
        if kind == "op" and val in ("=", "<>", "!=", ">", ">=", "<", "<="):
            self.eat()
            right = self.add_expr()
            cmp = {
                "=": left == right, "<>": left != right, "!=": left != right,
                ">": left > right, ">=": left >= right,
                "<": left < right, "<=": left <= right,
            }[val]
            # NULL comparison → unknown → False, matching the Python
            # evaluator's two-valued collapse
            return F.coalesce(cmp, F.lit(False))
        if kind == "kw" and val == "IS":
            self.eat()
            negate = self.peek() == ("kw", "NOT")
            if negate:
                self.eat()
            self.eat("kw", "NULL")
            return ~left.isNull() if negate else left.isNull()
        if kind == "kw" and val == "IN":
            self.eat()
            self.eat("op", "(")
            items = [self.add_expr()]
            while self.peek() == ("op", ","):
                self.eat()
                items.append(self.add_expr())
            self.eat("op", ")")
            return F.coalesce(left.isin(*items), F.lit(False))
        return left

    def add_expr(self):
        left = self.mul_expr()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.eat()[1]
            right = self.mul_expr()
            left = left + right if op == "+" else left - right
        return left

    def mul_expr(self):
        left = self.unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/"):
            op = self.eat()[1]
            right = self.unary()
            left = left * right if op == "*" else left / right
        return left

    def unary(self):
        if self.peek() == ("op", "-"):
            self.eat()
            return -self.unary()
        return self.primary()

    def primary(self):
        kind, val = self.peek()
        if kind == "num":
            self.eat()
            return F.lit(float(val) if "." in val else int(val))
        if kind == "str":
            self.eat()
            return F.lit(val)
        if kind == "kw" and val in ("TRUE", "FALSE"):
            self.eat()
            return F.lit(val == "TRUE")
        if kind == "kw" and val == "NULL":
            self.eat()
            return F.lit(None)
        if kind == "kw" and val == "ABS":
            self.eat()
            self.eat("op", "(")
            inner = self.or_expr()
            self.eat("op", ")")
            return F.abs(inner)
        if kind == "kw" and val in ("PREV", "NEXT"):
            self.eat()
            self.eat("op", "(")
            inner = self.add_expr()
            n = 1
            if self.peek() == ("op", ","):
                self.eat()
                n = int(self.eat("num")[1])
            self.eat("op", ")")
            fn = F.lag if val == "PREV" else F.lead
            return fn(inner, n).over(self.w)
        if kind == "id":
            name = self.eat()[1]
            if self.peek() == ("op", "."):
                self.eat()
                field = self.eat("id")[1]
                if name != self.defined:
                    raise ValueError("column backend: cross-variable ref")
                return F.col(field)
            return F.col(name)
        if kind == "op" and val == "(":
            self.eat()
            inner = self.or_expr()
            self.eat("op", ")")
            return inner
        raise ValueError(f"column backend: cannot translate {self.peek()}")


def compile_expr_to_column(text, variables, defined_var, window):
    return _ColumnBackend(_tokenize(text), variables, defined_var, window).parse()


def expr_is_row_local(text: str, variables: set[str], defined_var: str) -> bool:
    """True when a DEFINE expression depends only on the current row and
    physical PREV/NEXT offsets — i.e. its value per row is the same for
    every match attempt, so it can be evaluated once per partition instead
    of on every NFA branch.  Cross-variable references, logical
    navigation, and aggregates are match-state-dependent."""
    toks = _tokenize(text)
    for i, (kind, val) in enumerate(toks):
        if kind == "kw" and val in ("FIRST", "LAST", "CLASSIFIER",
                                    "MATCH_NUMBER", "SUM", "AVG", "MIN",
                                    "MAX", "COUNT"):
            return False
        if (
            kind == "id"
            and val in variables
            and val != defined_var
            and toks[i + 1 : i + 2] == [("op", ".")]
        ):
            return False
    return True


# ---------------------------------------------------------------------------
# pattern language

class _PatNode:
    pass


class _PatVar(_PatNode):
    def __init__(self, name):
        self.name = name


class _PatSeq(_PatNode):
    def __init__(self, items):
        self.items = items


class _PatAlt(_PatNode):
    def __init__(self, options):
        self.options = options


class _PatQuant(_PatNode):
    def __init__(self, inner, lo, hi, greedy=True):
        self.inner, self.lo, self.hi, self.greedy = inner, lo, hi, greedy


def parse_pattern(text: str) -> tuple[_PatNode, list[str]]:
    """Parse `A B (D|C)+ E{1,3}` etc. → AST + variable list."""
    toks = re.findall(r"[A-Za-z_][A-Za-z_0-9]*|\{\d*,?\d*\}|[()|*+?]", text)
    pos = [0]
    variables: list[str] = []

    def alt():
        opts = [seq()]
        while pos[0] < len(toks) and toks[pos[0]] == "|":
            pos[0] += 1
            opts.append(seq())
        return opts[0] if len(opts) == 1 else _PatAlt(opts)

    def seq():
        items = []
        while pos[0] < len(toks) and toks[pos[0]] not in ("|", ")"):
            items.append(quant())
        return items[0] if len(items) == 1 else _PatSeq(items)

    def quant():
        node = primary()
        while pos[0] < len(toks) and (
            toks[pos[0]] in ("*", "+", "?") or toks[pos[0]].startswith("{")
        ):
            t = toks[pos[0]]
            pos[0] += 1
            if t == "*":
                node = _PatQuant(node, 0, None)
            elif t == "+":
                node = _PatQuant(node, 1, None)
            elif t == "?":
                if isinstance(node, _PatQuant):
                    node.greedy = False  # reluctant quantifier
                else:
                    node = _PatQuant(node, 0, 1)
            else:
                m = re.match(r"\{(\d*),?(\d*)\}", t)
                lo = int(m.group(1)) if m.group(1) else 0
                body = t[1:-1]
                if "," in body:
                    hi = int(m.group(2)) if m.group(2) else None
                else:
                    hi = lo
                node = _PatQuant(node, lo, hi)
        return node

    def primary():
        t = toks[pos[0]]
        if t == "(":
            pos[0] += 1
            node = alt()
            assert toks[pos[0]] == ")", "unbalanced pattern parens"
            pos[0] += 1
            return node
        pos[0] += 1
        if not re.match(r"[A-Za-z_]", t):
            raise ValueError(f"unexpected pattern token {t!r}")
        if t not in variables:
            variables.append(t)
        return _PatVar(t)

    node = alt()
    if pos[0] != len(toks):
        raise ValueError(f"trailing pattern tokens: {toks[pos[0]:]}")
    return node, variables


# ---------------------------------------------------------------------------
# matcher


def pattern_max_rows(node: _PatNode) -> int | None:
    """Max rows one match can span, or None for unbounded quantifiers."""
    if isinstance(node, _PatVar):
        return 1
    if isinstance(node, _PatSeq):
        total = 0
        for it in node.items:
            m = pattern_max_rows(it)
            if m is None:
                return None
            total += m
        return total
    if isinstance(node, _PatAlt):
        best = 0
        for opt in node.options:
            m = pattern_max_rows(opt)
            if m is None:
                return None
            best = max(best, m)
        return best
    if isinstance(node, _PatQuant):
        if node.hi is None:
            return None
        inner = pattern_max_rows(node.inner)
        return None if inner is None else inner * node.hi
    raise TypeError(node)


class _StepBudget:
    """Caps NFA walk steps per match anchor — nested quantifiers over
    alternations can backtrack exponentially, and a runaway pattern must
    fail with an actionable error, not hang an executor task."""

    __slots__ = ("limit", "steps")

    def __init__(self, limit: int):
        self.limit = limit
        self.steps = 0

    def tick(self):
        self.steps += 1
        if self.steps > self.limit:
            raise RuntimeError(
                f"matchRecognize exceeded maxSteps={self.limit} backtracking "
                "steps at one anchor row; the pattern is pathological for "
                "this data (nested quantifiers + alternation) — simplify it "
                "or raise maxSteps"
            )


class _RowWindow:
    """List-of-dicts view over a pandas frame, materialized lazily.

    ``applyInPandas`` hands the matcher one key's entire history as a
    pandas frame; converting it wholesale with ``to_dict("records")``
    costs ~10× the Arrow batch in Python-object memory, which is what
    made a hot key a scale-killer.  This view keeps the frame in its
    compact columnar form and converts rows to dicts on demand in
    fixed-size blocks held in a bounded LRU cache — the matcher scans
    mostly forward, so the working set is a handful of blocks no matter
    how many rows the key has.  Semantics are identical to the plain
    list (global indices, PREV/NEXT beyond any chunk boundary work)."""

    __slots__ = ("_pdf", "_n", "_block", "_cache", "_max_blocks")

    def __init__(self, pdf: pd.DataFrame, block: int = 8192, max_blocks: int = 64):
        self._pdf = pdf
        self._n = len(pdf)
        self._block = block
        self._max_blocks = max_blocks
        self._cache: dict[int, list[dict]] = {}

    def __len__(self) -> int:
        return self._n

    def _load(self, b: int) -> list[dict]:
        blk = self._cache.get(b)
        if blk is not None:
            # true LRU: refresh recency on hit (dict preserves order, so
            # re-insertion moves the block to the back of the evict queue)
            self._cache.pop(b)
            self._cache[b] = blk
            return blk
        lo = b * self._block
        chunk = self._pdf.iloc[lo : lo + self._block]
        chunk = chunk.astype(object).where(pd.notnull(chunk), None)
        blk = chunk.to_dict("records")
        if len(self._cache) >= self._max_blocks:
            # evict least-recently-used (front of insertion order)
            self._cache.pop(next(iter(self._cache)))
        self._cache[b] = blk
        return blk

    def __getitem__(self, i: int) -> dict:
        if i < 0 or i >= self._n:
            raise IndexError(i)
        return self._load(i // self._block)[i % self._block]


def _match_at(
    rows,
    start: int,
    pattern: _PatNode,
    defines: dict[str, Callable[[_Ctx], Any]],
    subsets: dict[str, list[str]],
    masks: dict[str, list[bool]] | None = None,
    budget: _StepBudget | None = None,
) -> dict[int, str] | None:
    """Backtracking NFA walk anchored at ``start``; returns row→var map of
    the leftmost-greedy match, or None.  ``masks`` holds per-row predicate
    results for row-local defines (precomputed once per partition)."""
    masks = masks or {}

    def walk(node, idx, assign):
        """Yield candidate end indexes (row after last consumed), mutating a
        copied assign per branch; generator order = greedy preference."""
        if budget is not None:
            budget.tick()
        if isinstance(node, _PatVar):
            if idx >= len(rows):
                return
            mask = masks.get(node.name)
            if mask is not None:
                if not mask[idx]:
                    return
            elif (pred := defines.get(node.name)) is not None:
                ctx = _Ctx(rows, assign, idx, node.name, subsets)
                if not bool(pred(ctx)):
                    return
            assign2 = dict(assign)
            assign2[idx] = node.name
            yield idx + 1, assign2
        elif isinstance(node, _PatSeq):
            def seq_walk(items, idx, assign):
                if not items:
                    yield idx, assign
                    return
                for nxt, a2 in walk(items[0], idx, assign):
                    yield from seq_walk(items[1:], nxt, a2)

            yield from seq_walk(node.items, idx, assign)
        elif isinstance(node, _PatAlt):
            for opt in node.options:
                yield from walk(opt, idx, assign)
        elif isinstance(node, _PatQuant):
            def rep(k, idx, assign):
                # k = repetitions taken so far
                hi_ok = node.hi is None or k < node.hi
                if node.greedy:
                    if hi_ok:
                        for nxt, a2 in walk(node.inner, idx, assign):
                            if nxt == idx and k >= node.lo:
                                break  # zero-width progress guard
                            yield from rep(k + 1, nxt, a2)
                    if k >= node.lo:
                        yield idx, assign
                else:
                    if k >= node.lo:
                        yield idx, assign
                    if hi_ok:
                        for nxt, a2 in walk(node.inner, idx, assign):
                            if nxt == idx and k >= node.lo:
                                break
                            yield from rep(k + 1, nxt, a2)

            yield from rep(0, idx, assign)
        else:
            raise TypeError(node)

    for _end, assign in walk(pattern, start, {}):
        if assign:
            return assign
    return None


def _partition_matches(rows, pattern, defines, subsets, skip_to_next,
                       row_local: set[str] | None = None,
                       masks: dict[str, list[bool]] | None = None,
                       max_steps: int | None = None):
    """All matches in one ordered partition, honoring AFTER MATCH SKIP.

    Defines named in ``row_local`` are evaluated once per row up front
    (empty assignment, the variable as defining scope) — correct because
    their value cannot depend on match state, and it turns the NFA's
    per-branch predicate calls into list lookups.  ``masks`` carries
    predicate vectors already computed JVM-side.  ``max_steps`` bounds
    the NFA walk per anchor row (pathological backtracking guard)."""
    masks = dict(masks or {})
    for var in row_local or ():
        if var in masks:
            continue
        pred = defines[var]
        masks[var] = bytearray(
            bool(pred(_Ctx(rows, {}, i, var, subsets))) for i in range(len(rows))
        )
    out = []
    start, match_no = 0, 0
    while start < len(rows):
        budget = _StepBudget(max_steps) if max_steps is not None else None
        assign = _match_at(rows, start, pattern, defines, subsets, masks, budget)
        if assign is None:
            start += 1
            continue
        match_no += 1
        out.append((match_no, assign))
        last = max(assign)
        start = start + 1 if skip_to_next else last + 1
    return out


# ---------------------------------------------------------------------------
# Spark integration

_AGG_FUNCS = ("SUM(", "AVG(", "COUNT(", "MIN(", "MAX(")


def _measure_dtype(expr: str, schema: T.StructType, variables: set[str]) -> T.DataType:
    """Best-effort static type for a measure expression."""
    up = expr.upper().replace(" ", "")
    fields = {f.name: f.dataType for f in schema.fields}
    m = re.match(
        r"^(?:FIRST|LAST|PREV|NEXT)?\(?`?([A-Za-z_][\w]*)`?(?:\.`?([\w]+)`?)?[,)]?",
        expr.replace(" ", ""),
    )
    if up.startswith("COUNT(") or up.startswith("MATCH_NUMBER("):
        return T.LongType()
    if up.startswith("CLASSIFIER("):
        return T.StringType()
    if up.startswith(("AVG(",)):
        return T.DoubleType()
    if up.startswith(("SUM(", "MIN(", "MAX(")):
        inner = re.match(r"^\w+\((.*)\)$", expr.strip(), re.DOTALL)
        if inner:
            return _measure_dtype(inner.group(1), schema, variables)
        return T.DoubleType()
    if up.startswith(("FIRST(", "LAST(", "PREV(", "NEXT(")):
        inner = re.match(r"^\w+\((.*?)(?:,\s*\d+)?\)$", expr.strip(), re.DOTALL)
        if inner:
            return _measure_dtype(inner.group(1), schema, variables)
    m = re.match(r"^`?([A-Za-z_]\w*)`?(?:\.`?(\w+)`?)?$", expr.strip())
    if m:
        base, sub = m.group(1), m.group(2)
        if sub and base in variables:
            if sub in fields:
                return fields[sub]
        elif not sub and base in fields:
            return fields[base]
    if re.match(r"^\d+$", expr.strip()):
        return T.LongType()
    if re.match(r"^'.*'$", expr.strip()):
        return T.StringType()
    return T.DoubleType()


def match_recognize(
    df: DataFrame,
    *,
    partition_by: list[str],
    order_by: list[str],
    measures: list[tuple[str, str]],
    pattern: str,
    define: dict[str, str],
    subset: dict[str, list[str]] | None = None,
    after_match: str = "skip past last row",
    all_rows: bool = False,
    allow_global: bool = False,
    max_steps: int | None = 2_000_000,
    max_rows_per_key: int | None = 20_000_000,
    hot_key_mode: str = "fail",
    hot_key_chunk_size: int = 1_000_000,
) -> DataFrame:
    """Run row-pattern matching; see module docstring for the subset.

    ``max_steps`` caps NFA backtracking per anchor row; ``max_rows_per_key``
    fails fast on a hot key whose full history one task would have to
    buffer (applyInPandas materializes the group's Arrow batch regardless,
    so past this bound the fix is a finer partitionBy, not more memory).
    ``None`` disables either guard explicitly; zero/negative values are
    rejected at THIS API so a typo can't silently turn a guard off (the
    YAML surface deliberately maps null/0/negative to "disabled" instead —
    see ``_guard_limit`` — because YAML has no other idiom for it).

    ``hot_key_mode="chunked"`` removes the one-task-per-key buffering
    limit entirely: each key's ordered history is split into
    ``hot_key_chunk_size``-row chunks processed as independent tasks,
    with the following chunk's first ``pattern_max_rows - 1`` rows
    duplicated as a carry-over window so boundary-spanning matches are
    found, and matches attributed to the chunk containing their start
    row.  Exactness requires (validated, with actionable errors):

      * a BOUNDED pattern (no unbounded quantifier) — otherwise no finite
        carry-over covers a match;
      * AFTER MATCH SKIP TO NEXT ROW — anchors are then independent, so
        chunk-parallel scanning reproduces the sequential result exactly
        (with skip-past-last-row, each match start depends on the full
        preceding match history, which chunking cannot preserve);
      * defines either row-local or compiled to JVM mask columns (masks
        are computed over the full partition window BEFORE chunking, so
        PREV/NEXT see true neighbours across chunk edges);
      * no MATCH_NUMBER() inside measures (per-chunk numbering would
        lie); the ALL ROWS __match_number__ column is renumbered
        globally after the fact instead."""
    if max_steps is not None and max_steps <= 0:
        raise ValueError("max_steps must be > 0, or None to disable the guard")
    if max_rows_per_key is not None and max_rows_per_key <= 0:
        raise ValueError(
            "max_rows_per_key must be > 0, or None to disable the guard"
        )
    if hot_key_mode not in ("fail", "chunked"):
        raise ValueError(f"hot_key_mode must be 'fail' or 'chunked', got {hot_key_mode!r}")
    if hot_key_chunk_size <= 1:
        raise ValueError("hot_key_chunk_size must be > 1")
    if not partition_by and not allow_global:
        raise ValueError(
            "match_recognize without partitionBy funnels all rows through one "
            "task; set allowGlobal: true to accept that"
        )
    from pyspark.sql import Window

    pat_ast, variables = parse_pattern(pattern)
    var_set = set(variables) | set(define) | set(subset or {})
    defines = {k: compile_expr(v, var_set) for k, v in define.items()}
    row_local = {k for k, v in define.items() if expr_is_row_local(v, var_set, k)}
    subsets = dict(subset or {})
    in_schema = df.schema  # before mask columns — they are matcher-internal

    if partition_by and hot_key_mode != "chunked":
        # Width-pin the whole Python-heavy pipeline BEFORE the mask
        # windows: this REPARTITION_BY_NUM then satisfies both the window
        # distribution and the final mapInPandas grouping, so no
        # ENSURE_REQUIREMENTS exchange appears downstream for AQE to
        # byte-coalesce (AQE sizing by bytes strands cores on
        # Python-expensive stages — measured 3 of 32 busy at sf0.1).
        # Chunked mode skips this: its grouping keys gain __chunk__, so
        # the grouped-apply substrate pins its own exchange and an early
        # repartition would only add a redundant shuffle per union branch.
        n_width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        df = df.repartition(n_width, *[F.col(c.strip("`")) for c in partition_by])

    # push row-local defines into whole-stage codegen: the predicate
    # becomes a boolean column (PREV/NEXT → lag/lead over the partition
    # window) and the Python side only walks the NFA over bitmaps.
    # Translation failures fall back to the per-row Python evaluator.
    order_exprs = [F.col(c.strip("`")) for c in order_by]
    if hot_key_mode == "chunked":
        # chunked plans re-evaluate every window subtree in both union
        # branches, so ANY window here (masks AND sequence) must order
        # deterministically — append a whole-input-row hash tiebreak.
        # Identical duplicate rows stay interchangeable: either assignment
        # yields the same chunk multisets, hence the same matches.
        order_exprs = [
            *order_exprs,
            F.xxhash64(*[F.col(f.name) for f in df.schema.fields]),
        ]
    jvm_masks: dict[str, str] = {}
    if order_exprs:
        wspec = (
            Window.partitionBy(*partition_by).orderBy(*order_exprs)
            if partition_by
            else Window.partitionBy().orderBy(*order_exprs)
        )
        for var in sorted(row_local):
            try:
                col = compile_expr_to_column(define[var], var_set, var, wspec)
            except ValueError:
                continue
            mask_name = f"__mr_mask_{var}__"
            df = df.withColumn(
                mask_name, F.coalesce(col.cast("boolean"), F.lit(False))
            )
            jvm_masks[var] = mask_name
            row_local.discard(var)
    measure_fns = [(name, compile_expr(expr, var_set)) for expr, name in measures]
    skip_to_next = "next row" in after_match.lower()

    chunked = hot_key_mode == "chunked"
    max_pat_rows = pattern_max_rows(pat_ast)
    if chunked:
        if max_pat_rows is None:
            raise ValueError(
                "hotKeyMode=chunked needs a bounded pattern (no unbounded "
                "quantifier like A+ or A*): no finite carry-over window can "
                "cover a match of unbounded length"
            )
        if not skip_to_next:
            raise ValueError(
                "hotKeyMode=chunked requires afterMatch 'skip to next row': "
                "with skip-past-last-row each match start depends on every "
                "preceding match, which chunk-parallel scanning cannot "
                "preserve — use a finer partitionBy instead"
            )
        unsafe = {
            v for v in define
            if v not in jvm_masks and not expr_is_row_local(define[v], var_set, v)
        }
        if unsafe:
            raise ValueError(
                f"hotKeyMode=chunked: defines {sorted(unsafe)} use navigation "
                "(PREV/NEXT/FIRST/LAST) but could not be compiled to "
                "partition-window mask columns; at a chunk edge they would "
                "see truncated history"
            )
        if any("MATCH_NUMBER" in expr.upper() for expr, _ in measures):
            raise ValueError(
                "hotKeyMode=chunked cannot evaluate MATCH_NUMBER() in "
                "measures (numbering is per-chunk); drop the measure or use "
                "hotKeyMode=fail"
            )
        if not order_exprs:
            raise ValueError("hotKeyMode=chunked requires orderBy")

    part_fields = [in_schema[c] for c in partition_by]
    measure_fields = [
        T.StructField(name, _measure_dtype(expr, in_schema, var_set), True)
        for expr, name in measures
    ]
    if all_rows:
        out_schema = T.StructType(
            list(in_schema.fields)
            + [T.StructField("__match_number__", T.LongType(), True),
               T.StructField("__classifier__", T.StringType(), True)]
            + measure_fields
        )
    else:
        out_schema = T.StructType(part_fields + measure_fields)
    if chunked:
        # start-row sequence carried out for global match renumbering
        out_schema = T.StructType(
            [*out_schema.fields, T.StructField("__start_seq__", T.LongType(), True)]
        )

    order_cols = [c.strip("`") for c in order_by]
    timestamp_cols = {
        f.name for f in in_schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType, T.DateType))
    }

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if not chunked and max_rows_per_key is not None and len(pdf) > max_rows_per_key:
            keyvals = {c: pdf[c].iloc[0] for c in partition_by} if partition_by else {}
            raise RuntimeError(
                f"matchRecognize key {keyvals!r} has {len(pdf)} rows > "
                f"maxRowsPerKey={max_rows_per_key}; one task must buffer the "
                "whole key history — use a finer partitionBy (e.g. add a date "
                "bucket), raise maxRowsPerKey, or set hotKeyMode: chunked "
                "(bounded patterns with afterMatch 'skip to next row')"
            )
        core_lo = core_hi = None
        if chunked:
            # sequence order is authoritative (order_cols may tie); core =
            # the chunk's own seq range, the tail rows are the carry-over
            pdf = pdf.sort_values("__seq__", kind="mergesort")
            chunk_idx = int(pdf["__chunk__"].iloc[0])
            core_lo = chunk_idx * hot_key_chunk_size + 1
            core_hi = (chunk_idx + 1) * hot_key_chunk_size
        else:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
        premasks = {
            var: bytearray(pdf[col].to_numpy(dtype=np.uint8))
            for var, col in jvm_masks.items()
        }
        pdf = pdf.drop(columns=list(jvm_masks.values()))
        if len(pdf) <= 32768:
            # NaN/NaT → None in one vectorized pass (a per-value Python
            # loop here measured 2× the cost of the actual matching);
            # numpy scalars are left as-is — the evaluator's comparisons
            # and aggregates handle them natively
            recs = pdf.astype(object).where(pd.notnull(pdf), None).to_dict("records")
        else:
            # large keys: keep the frame columnar, materialize dict rows
            # lazily in LRU blocks — bounds Python-object memory on hot keys
            recs = _RowWindow(pdf)
        matches = _partition_matches(
            recs, pat_ast, defines, subsets, skip_to_next, row_local, premasks,
            max_steps,
        )
        out_rows = []
        for match_no, assign in matches:
            start_idx = min(assign)
            if chunked:
                start_seq = recs[start_idx]["__seq__"]
                if not (core_lo <= start_seq <= core_hi):
                    continue  # carry-over row: the owning chunk reports it
            ctx = _Ctx(recs, assign, None, None, subsets, match_no)
            mvals = {}
            for name, fn in measure_fns:
                try:
                    mvals[name] = fn(ctx)
                except ValueError:
                    # measures needing a current row (unqualified fields)
                    # evaluate at the match's last row
                    last = max(assign)
                    mvals[name] = _Ctx(recs, assign, last, None, subsets, match_no).run(fn)
            if chunked:
                mvals["__start_seq__"] = start_seq
            if all_rows:
                for i in sorted(assign):
                    row = dict(recs[i])
                    row["__match_number__"] = match_no
                    row["__classifier__"] = assign[i]
                    row.update(mvals)
                    out_rows.append(row)
            else:
                row = {c: recs[start_idx][c] for c in partition_by}
                row.update(mvals)
                out_rows.append(row)
        if not out_rows:
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_schema.fields})
        out = pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])
        return out

    # r15 (guide §4.1 — pass only the columns the function needs): with
    # ONE ROW PER MATCH the Python side only reads the columns the
    # measures and the still-Python defines reference, plus the keys,
    # the ordering, and the matcher-internal columns.  Shipping the full
    # row pays Arrow transfer AND per-row dict materialization for
    # columns nobody reads (the chunked bench row carried 11 lineitem
    # columns where 4 are read).  Conservative token scan over the raw
    # expression texts — an over-match only keeps an extra column.
    # ALL ROWS PER MATCH emits the input row and prunes nothing.
    prune_keep: set[str] | None = None
    if not all_rows:
        _ident = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        ref_texts = [expr for expr, _n in measures]
        ref_texts += [t for v, t in define.items() if v not in jvm_masks]
        referenced: set[str] = set()
        for t in ref_texts:
            referenced.update(_ident.findall(t))
        prune_keep = (
            set(partition_by)
            | (referenced & set(in_schema.fieldNames()))
            | set(jvm_masks.values())
        )
        if not chunked:
            # the Python side re-sorts by the order columns; chunked
            # mode sorts by __seq__ (added below) instead
            prune_keep |= set(order_cols)

    if chunked:
        # ordered sequence per key (spillable JVM window sort — unlike the
        # applyInPandas Arrow batch, this never holds the key in memory),
        # chunk assignment, and a forward carry-over of pattern_max_rows-1
        # rows duplicated into the previous chunk
        # order_exprs already carries the whole-row hash tiebreak (added
        # above for chunked mode), so this row_number is deterministic
        # across the union's re-evaluated branches
        wspec_seq = (
            Window.partitionBy(*partition_by).orderBy(*order_exprs)
            if partition_by
            else Window.partitionBy().orderBy(*order_exprs)
        )
        overlap = max_pat_rows - 1
        if overlap >= hot_key_chunk_size:
            raise ValueError(
                f"hot_key_chunk_size={hot_key_chunk_size} must exceed the "
                f"pattern's max length {max_pat_rows}"
            )
        seqed = df.withColumn("__seq__", F.row_number().over(wspec_seq))
        # r15: carry-over via a single explode instead of a union of two
        # branches — the union form re-evaluated the whole window
        # subtree (the spillable sort of the full input, including the
        # whole-row-hash tiebreak) TWICE.  Each row lists the 1–2 chunks
        # that must see it (its own, plus the previous one for the first
        # ``overlap`` rows of a chunk); one evaluation, same multiset of
        # (row, chunk) pairs, bit-identical matches.  The hash tiebreak
        # stays: row_number must also be deterministic under task retry.
        chunk_expr = F.expr(f"(__seq__ - 1) div {hot_key_chunk_size}")
        if overlap > 0:
            chunk_ids = F.when(
                (chunk_expr > 0)
                & (((F.col("__seq__") - 1) % hot_key_chunk_size) < overlap),
                F.array(chunk_expr, chunk_expr - 1),
            ).otherwise(F.array(chunk_expr))
            chunked_df = seqed.withColumn("__chunk__", F.explode(chunk_ids))
        else:
            chunked_df = seqed.withColumn("__chunk__", chunk_expr)
        if prune_keep is not None:
            keep = prune_keep | {"__seq__", "__chunk__"}
            chunked_df = chunked_df.select(
                *[c for c in chunked_df.columns if c in keep]
            )
        group_cols = [*partition_by, "__chunk__"]
        # many-groups-per-batch substrate: explicit-width repartition +
        # mapInPandas avoids applyInPandas' per-group Arrow round trip and
        # AQE's byte-based coalescing of this Python-heavy stage
        # (functions/grouped_apply.py; measured ~4× on 1500 keys)
        from pipeline_spark.functions.grouped_apply import grouped_apply_in_pandas

        out = grouped_apply_in_pandas(chunked_df, group_cols, run_group, out_schema)
        if all_rows:
            # renumber matches globally per key by start position
            wnum = (
                Window.partitionBy(*partition_by).orderBy("__start_seq__")
                if partition_by
                else Window.partitionBy().orderBy("__start_seq__")
            )
            out = out.withColumn(
                "__match_number__", F.dense_rank().over(wnum).cast("long")
            )
        return out.drop("__start_seq__")

    if prune_keep is not None:
        df = df.select(*[c for c in df.columns if c in prune_keep])
    if partition_by:
        from pipeline_spark.functions.grouped_apply import grouped_apply_in_pandas

        return grouped_apply_in_pandas(df, list(partition_by), run_group, out_schema)
    return df.groupBy(F.lit(1).alias("__g__")).applyInPandas(
        lambda pdf: run_group(pdf.drop(columns="__g__", errors="ignore")), schema=out_schema
    )


def _guard_limit(p: dict, key: str, default: int) -> int | None:
    """Config surface for the safety guards: absent → default; explicit
    null / 0 / negative → None (guard disabled — mirrors the Python API's
    ``max_*=None``); positive int → that limit."""
    if key not in p:
        return default
    val = p[key]
    if val is None or int(val) <= 0:
        return None
    return int(val)


@module("matchRecognize", kind=KIND_TRANSFORM)
def match_recognize_transform(ctx: ModuleContext) -> dict[str, DataFrame]:
    p: dict[str, Any] = ctx.params
    measures_cfg = p.get("measures") or []
    measures = [
        (m["expression"], m["name"]) if isinstance(m, dict) else tuple(m)
        for m in measures_cfg
    ]
    out = match_recognize(
        ctx.input,
        partition_by=p.get("partitionBy") or [],
        order_by=p.get("orderBy") or [],
        measures=measures,
        pattern=p["pattern"],
        define=p.get("define") or {},
        subset=p.get("subset"),
        after_match=p.get("afterMatch", "skip past last row"),
        all_rows=bool(p.get("allRowsPerMatch", False)),
        allow_global=bool(p.get("allowGlobal", False)),
        max_steps=_guard_limit(p, "maxSteps", 2_000_000),
        max_rows_per_key=_guard_limit(p, "maxRowsPerKey", 20_000_000),
        hot_key_mode=str(p.get("hotKeyMode", "fail")),
        hot_key_chunk_size=int(p.get("hotKeyChunkSize", 1_000_000)),
    )
    return {"": out}


# ---------------------------------------------------------------------------
# SQL-clause front end (used by beamsql)

_MR_RE = re.compile(r"MATCH_RECOGNIZE\s*\(", re.IGNORECASE)


def split_match_recognize(sql: str):
    """Locate `FROM <tbl> MATCH_RECOGNIZE(...) [AS alias]` in a statement.

    Returns (prefix_sql, table_name, clause_body, alias, suffix_sql) or None
    if the statement has no MATCH_RECOGNIZE."""
    m = _MR_RE.search(sql)
    if not m:
        return None
    # balanced-paren scan for the clause body
    depth, i = 1, m.end()
    in_str = False
    while i < len(sql) and depth:
        ch = sql[i]
        if in_str:
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        i += 1
    body = sql[m.end() : i - 1]
    before = sql[: m.start()]
    after = sql[i:]
    tbl_m = re.search(r"FROM\s+`?([\w.]+)`?\s*$", before, re.IGNORECASE | re.DOTALL)
    if not tbl_m:
        raise ValueError("MATCH_RECOGNIZE must directly follow FROM <table>")
    # Alias: `AS name`, backticked name, or a bare word that is NOT a SQL
    # reserved word (otherwise `... ) WHERE x > 1` would swallow WHERE).
    alias, suffix = None, after
    am = re.match(r"\s*AS\s+`?(\w+)`?", after, re.IGNORECASE)
    if am is None:
        am = re.match(r"\s*`(\w+)`", after)
    if am is None:
        am = re.match(r"\s*(\w+)", after)
        if am and am.group(1).upper() in _SQL_RESERVED:
            am = None
    if am:
        alias = am.group(1)
        suffix = after[am.end() :]
    prefix = before[: tbl_m.start()]
    return prefix, tbl_m.group(1), body, alias, suffix


_SQL_RESERVED = {
    "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION", "EXCEPT",
    "INTERSECT", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "NATURAL", "ON", "USING", "AND", "OR", "OFFSET", "FETCH", "WINDOW",
    "QUALIFY", "AS",
}


def parse_clause(body: str) -> dict[str, Any]:
    """Parse the MATCH_RECOGNIZE clause body into match_recognize kwargs."""
    sections = {
        "PARTITION BY": r"\bPARTITION\s+BY\b",
        "ORDER BY": r"\bORDER\s+BY\b",
        "MEASURES": r"\bMEASURES\b",
        "ONE ROW PER MATCH": r"\bONE\s+ROW\s+PER\s+MATCH\b",
        "ALL ROWS PER MATCH": r"\bALL\s+ROWS\s+PER\s+MATCH\b",
        "AFTER MATCH": r"\bAFTER\s+MATCH\b",
        "PATTERN": r"\bPATTERN\b\s*(?=\()",
        "SUBSET": r"\bSUBSET\b",
        "DEFINE": r"\bDEFINE\b",
    }
    marks = []
    for name, pat in sections.items():
        for m in re.finditer(pat, body, re.IGNORECASE):
            marks.append((m.start(), m.end(), name))
    marks.sort()
    parts: dict[str, str] = {}
    for j, (s, e, name) in enumerate(marks):
        end = marks[j + 1][0] if j + 1 < len(marks) else len(body)
        parts[name] = body[e:end].strip().rstrip(",")

    def split_top(text):
        out, depth, cur, in_str = [], 0, "", False
        for ch in text:
            if in_str:
                cur += ch
                if ch == "'":
                    in_str = False
                continue
            if ch == "'":
                in_str = True
                cur += ch
            elif ch == "(":
                depth += 1
                cur += ch
            elif ch == ")":
                depth -= 1
                cur += ch
            elif ch == "," and depth == 0:
                out.append(cur.strip())
                cur = ""
            else:
                cur += ch
        if cur.strip():
            out.append(cur.strip())
        return out

    kwargs: dict[str, Any] = {
        "partition_by": [], "order_by": [], "measures": [],
        "define": {}, "subset": {}, "after_match": "skip past last row",
        "all_rows": False,
    }
    if "PARTITION BY" in parts:
        kwargs["partition_by"] = [c.strip().strip("`") for c in parts["PARTITION BY"].split(",")]
    if "ORDER BY" in parts:
        kwargs["order_by"] = [
            re.sub(r"\s+(ASC|DESC)$", "", c.strip(), flags=re.IGNORECASE).strip("`")
            for c in parts["ORDER BY"].split(",")
        ]
    if "MEASURES" in parts:
        for item in split_top(parts["MEASURES"]):
            mm = re.match(r"(.*)\s+AS\s+`?(\w+)`?\s*$", item, re.IGNORECASE | re.DOTALL)
            if not mm:
                raise ValueError(f"measure needs AS alias: {item!r}")
            kwargs["measures"].append((mm.group(1).strip(), mm.group(2)))
    if "ALL ROWS PER MATCH" in parts:
        kwargs["all_rows"] = True
    if "AFTER MATCH" in parts:
        kwargs["after_match"] = parts["AFTER MATCH"]
    if "PATTERN" in parts:
        pat = parts["PATTERN"].strip()
        if pat.startswith("("):
            # strip ONE balanced outer paren pair
            depth = 0
            for i, ch in enumerate(pat):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    pat = pat[1:i]
                    break
        kwargs["pattern"] = pat
    if "SUBSET" in parts:
        for item in split_top(parts["SUBSET"]):
            mm = re.match(r"(\w+)\s*=\s*\((.*)\)", item, re.DOTALL)
            if mm:
                kwargs["subset"][mm.group(1)] = [v.strip() for v in mm.group(2).split(",")]
    if "DEFINE" in parts:
        for item in split_top(parts["DEFINE"]):
            mm = re.match(r"(\w+)\s+AS\s+(.*)$", item, re.IGNORECASE | re.DOTALL)
            if not mm:
                raise ValueError(f"bad DEFINE item: {item!r}")
            kwargs["define"][mm.group(1)] = mm.group(2).strip()
    return kwargs
