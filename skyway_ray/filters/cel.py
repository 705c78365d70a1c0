"""CEL (Common Expression Language) predicate filter — vectorized subset.

The reference compiles a CEL program once and evaluates it per element
against a context of ``tags`` (map<string,string>), ``changeset``,
``user``, ``uid``, ``id``, ``timestamp``, ``visible``, ``type``
(``/root/reference/src/filter/cel/mod.rs:16-44``, docs table
``docs/src/cel-filters.md:12-22``).  Contract:

* the expression must yield a boolean — anything else is a compile/
  usage error (``cel/mod.rs:9-14``);
* a **runtime** evaluation error (e.g. indexing a missing tag key,
  comparing against an absent context field) drops that row with a
  warning (``cel/mod.rs:51-54``).

This implementation parses the practical CEL surface the reference's
docs exercise (boolean ops ``&& || !``, comparisons, arithmetic
``+ - * / %`` with CEL's truncated int division and no silent
int/double coercion, unary minus, ternary ``?:`` with branch-local
error scoping, list literals with ``in`` membership, map-key ``in``
over ``tags``, map indexing ``tags["k"]``, string methods
``startsWith / endsWith / contains / matches``, string ``+`` concat,
``size()``, ``has()`` macro, parentheses, int/float/string/bool
literals) and evaluates it vectorized over the batch with an explicit
per-row error mask — every node returns (values, err); errors
propagate and erroring rows are dropped, matching the reference.

Known deviation: int64 overflow wraps (numpy) instead of erroring.
"""

from __future__ import annotations

import re
import warnings

import numpy as np

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
      | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
      | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op>&&|\|\||[!<>=]=|[()\[\].,!<>?:+*/%-])
    )""",
    re.VERBOSE,
)

_CONTEXT_FIELDS = ("changeset", "user", "uid", "id", "timestamp", "visible", "type")


class CelParseError(ValueError):
    pass


class _Tok:
    def __init__(self, kind, value):
        self.kind = kind
        self.value = value

    def __repr__(self):
        return f"{self.kind}:{self.value}"


def _tokenize(src: str):
    toks = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise CelParseError(f"bad token at {src[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "string":
            raw = m.group("string")[1:-1]
            toks.append(_Tok("string", raw.replace('\\"', '"').replace("\\'", "'")
                             .replace("\\\\", "\\").replace("\\n", "\n").replace("\\t", "\t")))
        elif m.lastgroup == "number":
            raw = m.group("number")
            toks.append(_Tok("number",
                             float(raw) if ("." in raw or "e" in raw
                                            or "E" in raw) else int(raw)))
        elif m.lastgroup == "ident":
            toks.append(_Tok("ident", m.group("ident")))
        else:
            toks.append(_Tok("op", m.group("op")))
    return toks


# ---- AST ----------------------------------------------------------------

class _Lit:
    def __init__(self, value):
        self.value = value


class _Var:
    def __init__(self, name):
        self.name = name


class _Index:     # tags["key"]
    def __init__(self, base, key):
        self.base = base
        self.key = key


class _In:        # x in tags (map-key test) | x in [list]
    def __init__(self, key, base):
        self.key = key
        self.base = base


class _Arith:     # + - * / %
    def __init__(self, op, lhs, rhs):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs


class _Neg:       # unary -
    def __init__(self, inner):
        self.inner = inner


class _Ternary:   # cond ? a : b
    def __init__(self, cond, then, other):
        self.cond = cond
        self.then = then
        self.other = other


class _List:      # [a, b, c]
    def __init__(self, items):
        self.items = items


class _Has:       # has(tags.key)
    def __init__(self, base, key):
        self.base = base
        self.key = key


class _Method:    # x.startsWith("y"), size(x)
    def __init__(self, base, name, args):
        self.base = base
        self.name = name
        self.args = args


class _Cmp:
    def __init__(self, op, lhs, rhs):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs


class _Bool:
    def __init__(self, op, lhs, rhs):
        self.op = op
        self.lhs = lhs
        self.rhs = rhs


class _Not:
    def __init__(self, inner):
        self.inner = inner


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise CelParseError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, kind, value=None):
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise CelParseError(f"expected {kind} {value}, got {t!r}")
        return t

    def parse(self):
        e = self.parse_ternary()
        if self.peek() is not None:
            raise CelParseError(f"trailing tokens at {self.peek()!r}")
        return e

    def parse_ternary(self):
        cond = self.parse_or()
        t = self.peek()
        if t and t.kind == "op" and t.value == "?":
            self.next()
            then = self.parse_ternary()
            self.expect("op", ":")
            other = self.parse_ternary()
            return _Ternary(cond, then, other)
        return cond

    def parse_or(self):
        lhs = self.parse_and()
        while self.peek() and self.peek().kind == "op" and self.peek().value == "||":
            self.next()
            lhs = _Bool("||", lhs, self.parse_and())
        return lhs

    def parse_and(self):
        lhs = self.parse_cmp()
        while self.peek() and self.peek().kind == "op" and self.peek().value == "&&":
            self.next()
            lhs = _Bool("&&", lhs, self.parse_cmp())
        return lhs

    def parse_cmp(self):
        lhs = self.parse_add()
        t = self.peek()
        if t and t.kind == "op" and t.value in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return _Cmp(t.value, lhs, self.parse_add())
        if t and t.kind == "ident" and t.value == "in":
            self.next()
            return _In(lhs, self.parse_add())
        return lhs

    def parse_add(self):
        lhs = self.parse_mul()
        while self.peek() and self.peek().kind == "op" and \
                self.peek().value in ("+", "-"):
            op = self.next().value
            lhs = _Arith(op, lhs, self.parse_mul())
        return lhs

    def parse_mul(self):
        lhs = self.parse_unary()
        while self.peek() and self.peek().kind == "op" and \
                self.peek().value in ("*", "/", "%"):
            op = self.next().value
            lhs = _Arith(op, lhs, self.parse_unary())
        return lhs

    def parse_unary(self):
        t = self.peek()
        if t and t.kind == "op" and t.value == "!":
            self.next()
            return _Not(self.parse_unary())
        if t and t.kind == "op" and t.value == "-":
            self.next()
            inner = self.parse_unary()
            if isinstance(inner, _Lit) and isinstance(inner.value, (int, float)) \
                    and not isinstance(inner.value, bool):
                return _Lit(-inner.value)
            return _Neg(inner)
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_atom()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.value == "[":
                self.next()
                key = self.parse_ternary()
                self.expect("op", "]")
                e = _Index(e, key)
            elif t and t.kind == "op" and t.value == ".":
                self.next()
                name = self.expect("ident").value
                if self.peek() and self.peek().kind == "op" and self.peek().value == "(":
                    self.next()
                    args = []
                    if not (self.peek().kind == "op" and self.peek().value == ")"):
                        args.append(self.parse_ternary())
                        while self.peek().kind == "op" and self.peek().value == ",":
                            self.next()
                            args.append(self.parse_ternary())
                    self.expect("op", ")")
                    e = _Method(e, name, args)
                else:
                    e = _Index(e, _Lit(name))  # tags.key sugar
            else:
                return e

    def parse_atom(self):
        t = self.next()
        if t.kind == "string":
            return _Lit(t.value)
        if t.kind == "number":
            return _Lit(t.value)
        if t.kind == "ident":
            if t.value == "true":
                return _Lit(True)
            if t.value == "false":
                return _Lit(False)
            if t.value in ("size", "has") and self.peek() and \
                    self.peek().kind == "op" and self.peek().value == "(":
                self.next()
                arg = self.parse_ternary()
                self.expect("op", ")")
                if t.value == "size":
                    return _Method(arg, "size", [])
                if isinstance(arg, _Index):
                    return _Has(arg.base, arg.key)
                raise CelParseError("has() needs a field selection like has(tags.key)")
            return _Var(t.value)
        if t.kind == "op" and t.value == "(":
            e = self.parse_ternary()
            self.expect("op", ")")
            return e
        if t.kind == "op" and t.value == "[":
            items = []
            if not (self.peek() and self.peek().kind == "op"
                    and self.peek().value == "]"):
                items.append(self.parse_ternary())
                while self.peek() and self.peek().kind == "op" and \
                        self.peek().value == ",":
                    self.next()
                    items.append(self.parse_ternary())
            self.expect("op", "]")
            return _List(items)
        raise CelParseError(f"unexpected token {t!r}")


# ---- vectorized evaluation ---------------------------------------------
#
# Every node evaluates to (values: object ndarray | scalar, err: bool ndarray).
# `None` values represent CEL null / absent; using one in a comparison is a
# runtime error for that row.

class CelFilter:
    """Compiled CEL predicate. Callable over a batch context dict of
    numpy object arrays (keys: tags + _CONTEXT_FIELDS). Returns a keep
    mask; rows with runtime errors are dropped with one warning per
    batch (mirroring cel/mod.rs:51-54)."""

    def __init__(self, source: str):
        self.source = source
        self.ast = _Parser(_tokenize(source)).parse()

    # -- public API --

    def evaluate_context(self, ctx: dict, n: int) -> np.ndarray:
        vals, err = self._eval(self.ast, ctx, n)
        if isinstance(vals, str) or isinstance(vals, tuple):
            raise CelParseError("expression must yield a boolean, not a "
                                "map/list")
        vals = np.asarray(vals, dtype=object)
        bad_type = np.array([not isinstance(v, (bool, np.bool_)) for v in vals],
                            dtype=bool) & ~err
        if bad_type.any():
            # non-boolean output is a usage error in the reference
            # (convert_filter_output panics); we drop those rows + warn
            err = err | bad_type
        if err.any():
            warnings.warn(
                f"CEL runtime error on {int(err.sum())} row(s); dropping them "
                f"(expression: {self.source!r})", stacklevel=2)
        keep = np.zeros(n, dtype=bool)
        ok = ~err
        keep[ok] = vals[ok].astype(bool)
        return keep

    def apply_table(self, table):
        import pyarrow as pa

        from .tagarray import TagArray

        n = table.num_rows
        if n == 0:
            return table
        tags = TagArray.from_arrow(table["tags"], n) if "tags" in table.column_names else TagArray.from_dicts([{}] * n)
        ctx = {"tags": tags}
        # the reference's context is the fixed OSM field set
        # (cel/mod.rs:16-44); exposing every column of the batch as an
        # identifier is a strict superset that lets CEL filter
        # arbitrary tables (identifier-shaped names only)
        for f in table.column_names:
            if f != "tags" and f.isidentifier():
                ctx[f] = np.asarray(table[f].to_pylist(), dtype=object)
        keep = self.evaluate_context(ctx, n)
        return table.take(pa.array(np.flatnonzero(keep), pa.int64()))

    # -- node evaluation --

    @staticmethod
    def _order_cmp_fast(lv, rv, err, op, out) -> bool:
        """Vectorized <,<=,>,>= when both sides are homogeneous ints or
        homogeneous strings on the non-err rows (the common case);
        returns False to request the per-row fallback.  Booleans and
        mixed types must error per row, so they take the slow path."""
        ok = ~err
        if not ok.any():
            out[:] = None
            return True
        lt = {type(v) for v in lv[ok]}
        rt = {type(v) for v in rv[ok]}
        if bool in lt or bool in rt:
            return False
        numeric = {int, float}
        if lt <= numeric and rt <= numeric:
            a = lv[ok].astype(np.float64)
            b = rv[ok].astype(np.float64)
        elif lt == {str} and rt == {str}:
            a = lv[ok].astype(str)
            b = rv[ok].astype(str)
        else:
            return False
        if op == "<":
            res = a < b
        elif op == "<=":
            res = a <= b
        elif op == ">":
            res = a > b
        else:
            res = a >= b
        out[:] = None
        out[ok] = list(np.asarray(res, dtype=bool))
        return True

    @staticmethod
    def _map_has(tags, key, kerr, n):
        """Per-row map-key membership: grouped by distinct key value so
        the common constant-key case stays one vectorized ``has``."""
        out = np.zeros(n, dtype=bool)
        ok = ~kerr
        for k in {key[i] for i in np.flatnonzero(ok)}:
            rows = ok & (key == k)
            out[rows] = tags.has(str(k))[rows]
        return out.astype(object), kerr.copy()

    @staticmethod
    def _arith_fast(op, lv, rv, err, out) -> bool:
        """Vectorized arithmetic when both sides are homogeneous ints,
        homogeneous floats, or (for +) homogeneous strings on the
        non-err rows; returns False to request the per-row fallback."""
        ok = ~err
        if not ok.any():
            out[:] = None
            return True
        lt = {type(v) for v in lv[ok]}
        rt = {type(v) for v in rv[ok]}
        if bool in lt or bool in rt:
            return False
        if lt == {int} and rt == {int}:
            a = lv[ok].astype(np.int64)
            b = rv[ok].astype(np.int64)
            if op in ("/", "%"):
                if (b == 0).any():
                    return False
                q = np.abs(a) // np.abs(b)
                q = np.where((a < 0) != (b < 0), -q, q)
                res = q if op == "/" else a - q * b
            elif op == "+":
                res = a + b
            elif op == "-":
                res = a - b
            else:
                res = a * b
            out[:] = None
            out[ok] = [int(x) for x in res]
            return True
        if lt == {float} and rt == {float}:
            if op == "%":
                return False  # % undefined for doubles in CEL
            a = lv[ok].astype(np.float64)
            b = rv[ok].astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                res = {"+": a + b, "-": a - b, "*": a * b,
                       "/": a / b}[op]
            out[:] = None
            out[ok] = [float(x) for x in res]
            return True
        if op == "+" and lt == {str} and rt == {str}:
            out[:] = None
            out[ok] = [l + r for l, r in zip(lv[ok], rv[ok])]
            return True
        return False

    @staticmethod
    def _arith_rows(op, l, r):
        """One row of CEL arithmetic; returns None for a runtime error.
        CEL rules: no implicit int/double coercion; int / truncates
        toward zero; % is C-style (sign of dividend); / and % by zero
        error for ints; string + string concatenates."""
        lb, rb = type(l) is bool, type(r) is bool
        if lb or rb:
            return None
        if isinstance(l, str) and isinstance(r, str):
            return l + r if op == "+" else None
        if isinstance(l, str) or isinstance(r, str):
            return None
        if isinstance(l, float) != isinstance(r, float):
            return None  # int op double is a CEL type error
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if isinstance(l, float):
            if op == "/":
                return l / r if r != 0 else (float("inf") if l > 0 else
                                             float("-inf") if l < 0 else
                                             float("nan"))
            return None  # % undefined for doubles in CEL
        if r == 0:
            return None
        q = abs(l) // abs(r)
        if (l < 0) != (r < 0):
            q = -q
        return q if op == "/" else l - q * r

    def _eval(self, node, ctx, n):
        no_err = np.zeros(n, dtype=bool)
        if isinstance(node, _Lit):
            return np.full(n, node.value, dtype=object), no_err
        if isinstance(node, _List):
            return ("__LIST__", [self._eval(i, ctx, n)
                                 for i in node.items]), no_err
        if isinstance(node, _Neg):
            vals, err = self._eval(node.inner, ctx, n)
            out = np.empty(n, dtype=object)
            for i in range(n):
                v = vals[i] if not err[i] else None
                out[i] = (-v if isinstance(v, (int, float))
                          and type(v) is not bool else None)
            return out, np.array([v is None for v in out], dtype=bool)
        if isinstance(node, _Ternary):
            cv, cerr = self._eval(node.cond, ctx, n)
            tv, terr = self._eval(node.then, ctx, n)
            ov, oerr = self._eval(node.other, ctx, n)
            ct = np.asarray(cv == True, dtype=bool) & ~cerr   # noqa: E712
            cf = np.asarray(cv == False, dtype=bool) & ~cerr  # noqa: E712
            out = np.full(n, None, dtype=object)
            out[ct] = tv[ct]
            out[cf] = ov[cf]
            # branch-local error scoping: only the TAKEN branch's
            # errors propagate (CEL ternary is lazy)
            err = ~(ct | cf) | (ct & terr) | (cf & oerr)
            out[err] = None
            return out, err
        if isinstance(node, _Arith):
            lv, le = self._eval(node.lhs, ctx, n)
            rv, re_ = self._eval(node.rhs, ctx, n)
            err = le | re_
            out = np.empty(n, dtype=object)
            if not self._arith_fast(node.op, lv, rv, err, out):
                for i in range(n):
                    out[i] = (self._arith_rows(node.op, lv[i], rv[i])
                              if not err[i] else None)
            err = np.array([v is None for v in out], dtype=bool)
            # NaN from float 0/0 is a value, not an error
            for i in np.flatnonzero(err):
                if isinstance(out[i], float):
                    err[i] = False
            return out, err
        if isinstance(node, _Var):
            if node.name == "tags":
                return "__TAGS__", no_err
            if node.name in ctx:
                vals = ctx[node.name]
                # absent context field (null) -> runtime error when used;
                # flag now, comparisons will propagate
                err = np.array([v is None for v in vals], dtype=bool)
                return vals, err
            # Unknown identifier is an EXECUTION error in cel-interpreter
            # (compile succeeds), and the reference skips the element
            # with a warning (src/filter/cel/mod.rs:49-53) — so every
            # row errs (drops, warned once per batch by
            # evaluate_context) rather than aborting the pipeline.
            return np.full(n, None, dtype=object), np.ones(n, dtype=bool)
        if isinstance(node, _Index):
            base, berr = self._eval(node.base, ctx, n)
            key, kerr = self._eval(node.key, ctx, n)
            if not (isinstance(base, str) and base == "__TAGS__"):
                raise CelParseError("only tags[...] indexing is supported")
            tags = ctx["tags"]
            # constant key fast path
            k0 = key[0] if len(key) else None
            if all(k == k0 for k in key):
                vals = tags.get(str(k0))
            else:
                vals = np.array([tags.get(str(k))[i] for i, k in enumerate(key)],
                                dtype=object)
            err = berr | kerr | np.array([v is None for v in vals], dtype=bool)
            return vals, err
        if isinstance(node, _Has):
            key, kerr = self._eval(node.key, ctx, n)
            return self._map_has(ctx["tags"], key, kerr, n)
        if isinstance(node, _In):
            base, berr = self._eval(node.base, ctx, n)
            key, kerr = self._eval(node.key, ctx, n)
            if isinstance(base, str) and base == "__TAGS__":
                return self._map_has(ctx["tags"], key, kerr, n)
            if isinstance(base, tuple) and base[0] == "__LIST__":
                acc = np.zeros(n, dtype=bool)
                err = kerr.copy()
                for vals, verr in base[1]:
                    acc |= np.asarray(key == vals, dtype=bool) & ~verr & ~kerr
                return acc.astype(object), err
            raise CelParseError(
                "'in' requires a list literal or the tags map on the right")
        if isinstance(node, _Not):
            vals, err = self._eval(node.inner, ctx, n)
            vt = np.asarray(vals == True, dtype=bool) & ~err   # noqa: E712
            vf = np.asarray(vals == False, dtype=bool) & ~err  # noqa: E712
            out = np.full(n, None, dtype=object)
            out[vt] = False
            out[vf] = True
            return out, ~(vt | vf)
        if isinstance(node, _Bool):
            # vectorized three-valued logic with CEL short-circuit
            # (false && error == false; true || error == true)
            lv, le = self._eval(node.lhs, ctx, n)
            rv, re_ = self._eval(node.rhs, ctx, n)
            lt = np.asarray(lv == True, dtype=bool) & ~le   # noqa: E712
            lf = np.asarray(lv == False, dtype=bool) & ~le  # noqa: E712
            rt = np.asarray(rv == True, dtype=bool) & ~re_  # noqa: E712
            rf = np.asarray(rv == False, dtype=bool) & ~re_ # noqa: E712
            if node.op == "&&":
                out_t, out_f = lt & rt, lf | rf
            else:
                out_t, out_f = lt | rt, lf & rf
            out = np.full(n, None, dtype=object)
            out[out_t] = True
            out[out_f & ~out_t] = False
            err = ~(out_t | out_f)
            return out, err
        if isinstance(node, _Cmp):
            lv, le = self._eval(node.lhs, ctx, n)
            rv, re_ = self._eval(node.rhs, ctx, n)
            err = le | re_
            out = np.empty(n, dtype=object)
            op = node.op
            if op in ("==", "!="):
                # vectorized elementwise richcompare (C loop)
                eq = np.asarray(lv == rv, dtype=bool)
                # CEL: a bool never compares equal to a non-bool — a
                # bool on exactly one side is a type-mismatch error
                # (mirrors _order_cmp_fast), not Python's True == 1
                lb = np.fromiter((type(v) is bool for v in lv),
                                 dtype=bool, count=n)
                rb = np.fromiter((type(v) is bool for v in rv),
                                 dtype=bool, count=n)
                err = err | (lb ^ rb)
                out[:] = list(eq if op == "==" else ~eq)
                out[err] = None
            elif self._order_cmp_fast(lv, rv, err, op, out):
                pass  # homogeneous fast path filled `out`
            else:
                for i in range(n):
                    if err[i]:
                        out[i] = None
                        continue
                    l, r = lv[i], rv[i]
                    try:
                        if type(l) is bool or type(r) is bool or \
                                (isinstance(l, str) != isinstance(r, str)):
                            out[i] = None  # heterogeneous order cmp: error
                        elif op == "<":
                            out[i] = l < r
                        elif op == "<=":
                            out[i] = l <= r
                        elif op == ">":
                            out[i] = l > r
                        else:
                            out[i] = l >= r
                    except TypeError:
                        out[i] = None
            err = err | np.array([v is None for v in out], dtype=bool)
            return out, err
        if isinstance(node, _Method):
            base, berr = self._eval(node.base, ctx, n)
            if isinstance(base, str) and base == "__TAGS__":
                if node.name == "size":
                    tags = ctx["tags"]
                    counts = (np.bincount(tags.row, minlength=n)
                              if len(tags.row) else np.zeros(n, np.int64))
                    return counts.astype(object), berr
                raise CelParseError(f"unsupported tags method {node.name!r}")
            args = [self._eval(a, ctx, n) for a in node.args]
            out = np.empty(n, dtype=object)
            for i in range(n):
                b = base[i] if not berr[i] else None
                avs = [a[0][i] if not a[1][i] else None for a in args]
                try:
                    if b is None or any(v is None for v in avs):
                        out[i] = None
                    elif node.name == "startsWith":
                        out[i] = str(b).startswith(str(avs[0]))
                    elif node.name == "endsWith":
                        out[i] = str(b).endswith(str(avs[0]))
                    elif node.name == "contains":
                        out[i] = str(avs[0]) in str(b)
                    elif node.name == "matches":
                        out[i] = re.search(str(avs[0]), str(b)) is not None
                    elif node.name == "size":
                        out[i] = len(b)
                    else:
                        out[i] = None
                except Exception:
                    out[i] = None
            err = np.array([v is None for v in out], dtype=bool)
            return out, err
        raise CelParseError(f"cannot evaluate {node!r}")


def create_filter(source: str):
    """Mirror of the reference's ``create_filter`` dispatch
    (``src/filter/mod.rs:18-28``): try OSMFilter first, fall back to
    CEL; raise if neither parses (the reference panics)."""
    from .osmfilter import parse_osmfilter, FilterParseError
    from .vector import CompiledFilter

    try:
        return CompiledFilter(parse_osmfilter(source))
    except FilterParseError:
        pass
    try:
        return CelFilter(source)
    except CelParseError as e:
        raise ValueError(f"input is neither a valid OSMFilter nor CEL program: {e}")
