"""Lucene expressions module: the JavaScript expression compiler.

Reproduces ``expressions/src/java/org/apache/lucene/expressions/js``:

* Grammar — ``Javascript.g4``: numeric literals (decimal / hex / octal),
  variables, function calls, unary ``! ~ + -``, arithmetic ``* / % + -``,
  shifts ``<< >> >>>``, comparisons ``< <= > >= == !=``, bitwise
  ``& ^ |``, logical ``&& ||``, right-associative ``?:``.
* Semantics — ``JavascriptCompiler.java:460-740``: a *type-demand* stack.
  Every context demands DOUBLE, LONG or BOOLEAN(int) from its operand and
  the operand's natural value is converted with the exact JVM numeric
  casts (D2L/D2I truncate toward zero and saturate; NaN casts to 0).
  Arithmetic is all-double; shifts/bitwise are all-long (shift counts are
  D2I-cast ints, masked ``& 63`` by the JVM); comparisons/logicals produce
  booleans materialized as 1/0 in the demanded type; division follows
  IEEE-754 (x/0 = ±Inf, 0/0 = NaN) and ``%`` is the JVM ``drem`` (C
  ``fmod``: sign of the dividend).
* Functions — ``JavascriptCompiler.properties``: abs acos acosh asin
  asinh atan atan2 atanh ceil cos cosh exp floor haversin haversinMeters
  ln log10 logn max min pow sin sinh sqrt tan tanh.  ``acosh/asinh/atanh/
  logn`` follow ``core/util/MathUtil.java``; ``min/max`` follow
  ``Math.min/max`` (NaN-propagating); ``haversin`` returns kilometers
  (``ExpressionMath.haversinKilometers``).

Two backends:

* ``evaluate(bindings)`` — a pure-Python interpreter with bit-faithful
  JVM semantics (used by the ported reference test vectors:
  ``TestJavascriptOperations.java`` / ``TestJavascriptFunction.java``).
* ``to_sql(dialect, bindings)`` — an engine-neutral SQL emission for
  Spark SQL and DuckDB.  The SAME guarded formulas are emitted for both
  dialects wherever the engines share syntax, so a gate query and its
  DuckDB oracle twin compute bit-identical doubles.  Guards paper over
  the engines' non-Java edges: ANSI Spark raises on x/0, x%0 and
  overflowing double→long casts; DuckDB raises on out-of-domain
  ln/sqrt/asin/acos and returns NULL for x/0; both engines treat NaN as
  orderable (Java comparisons with NaN are false).  Known divergences
  (documented, all involving exotic operands no scoring expression
  produces): the sign of ±0.0 results, Math.min/max zero-sign rules,
  and D2L saturation between 2^63-1024 and 2^63.  Shift operators are
  Spark-only (DuckDB's ``<<``/``>>`` are overflow-checked, not wrapping);
  ``to_sql("duckdb")`` raises on them.

The engine entry point is ``FunctionScoreQuery(query, source)`` /
``FunctionRangeQuery`` — compile an expression, bind ``_score`` and the
doc columns, and pass ``.to_sql("spark", bindings)`` as the source (the
expressions-module ``SimpleBindings`` surface: ``DoubleValuesSource.
SCORES`` ≙ ``_score``, ``fromField`` ≙ a doc column).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

__all__ = ["JavascriptCompiler", "JavascriptExpression", "JavascriptParseError"]

_LONG_MIN = -(2**63)
_LONG_MAX = 2**63 - 1
_INT_MIN = -(2**31)
_INT_MAX = 2**31 - 1

# Largest double strictly below 2^63 (the D2L-safe cast range: every
# double < 2^63 truncates to an in-range long).
_TWO63 = float(2**63)


class JavascriptParseError(ValueError):
    """ParseException analog (JavascriptParserErrorStrategy rethrows all
    ANTLR recognition errors as checked ParseExceptions)."""


# ---------------------------------------------------------------------------
# Lexer (Javascript.g4 token rules)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\n\r]+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<decimal>(?:(?:0|[1-9][0-9]*)(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+\-]?[0-9]+)?)
  | (?P<variable>[_$a-zA-Z][_$a-zA-Z0-9]*
      (?:\[(?:'(?:\\'|\\\\|[^\\'])*?'|"(?:\\"|\\\\|[^\\"])*?"|0|[1-9][0-9]*)\])*
      (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*
      (?:\[(?:'(?:\\'|\\\\|[^\\'])*?'|"(?:\\"|\\\\|[^\\"])*?"|0|[1-9][0-9]*)\])*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[()\[\],!~*/%+\-<>&^|?:])
    """,
    re.VERBOSE,
)


def _lex(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise JavascriptParseError(
                f"unexpected character {text[pos]!r} at position {pos} in: {text}"
            )
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
        pos = m.end()
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Num:
    value: float | int
    kind: str  # "D" | "L"


@dataclass(frozen=True)
class _Var:
    name: str


@dataclass(frozen=True)
class _Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class _Unary:
    op: str  # ! ~ + -
    a: object


@dataclass(frozen=True)
class _Bin:
    op: str
    a: object
    b: object


@dataclass(frozen=True)
class _Cond:
    c: object
    a: object
    b: object


class _Parser:
    """Precedence-climbing parser in the grammar's tier order."""

    def __init__(self, tokens: list[tuple[str, str]], functions: dict):
        self.toks = tokens
        self.i = 0
        self.functions = functions

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> None:
        kind, tok = self.next()
        if tok != text:
            raise JavascriptParseError(f"expected {text!r}, found {tok!r}")

    def parse(self):
        e = self.conditional()
        if self.peek()[0] != "eof":
            raise JavascriptParseError(f"trailing input at {self.peek()[1]!r}")
        return e

    # expression tiers, loosest first ------------------------------------
    def conditional(self):
        c = self.boolor()
        if self.peek()[1] == "?":
            self.next()
            a = self.conditional()
            self.expect(":")
            b = self.conditional()  # <assoc=right>
            return _Cond(c, a, b)
        return c

    def _left(self, sub, ops):
        e = sub()
        while self.peek()[1] in ops:
            op = self.next()[1]
            e = _Bin(op, e, sub())
        return e

    def boolor(self):
        return self._left(self.booland, ("||",))

    def booland(self):
        return self._left(self.bwor, ("&&",))

    def bwor(self):
        return self._left(self.bwxor, ("|",))

    def bwxor(self):
        return self._left(self.bwand, ("^",))

    def bwand(self):
        return self._left(self.booleqne, ("&",))

    def booleqne(self):
        return self._left(self.boolcomp, ("==", "!="))

    def boolcomp(self):
        return self._left(self.bwshift, ("<", "<=", ">", ">="))

    def bwshift(self):
        return self._left(self.addsub, ("<<", ">>", ">>>"))

    def addsub(self):
        return self._left(self.muldiv, ("+", "-"))

    def muldiv(self):
        return self._left(self.unary, ("*", "/", "%"))

    def unary(self):
        tok = self.peek()[1]
        if tok in ("!", "~", "+", "-"):
            self.next()
            return _Unary(tok, self.unary())
        return self.primary()

    def primary(self):
        kind, tok = self.next()
        if tok == "(":
            e = self.conditional()
            self.expect(")")
            return e
        if kind == "hex":
            return _Num(int(tok, 16), "L")
        if kind == "octal":
            return _Num(int(tok, 8), "L")
        if kind == "decimal":
            if "." in tok or "e" in tok or "E" in tok:
                return _Num(float(tok), "D")
            return _Num(int(tok), "L")
        if kind == "variable":
            if self.peek()[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.conditional())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.conditional())
                self.expect(")")
                fn = self.functions.get(tok)
                if fn is None:
                    raise JavascriptParseError(f"Unrecognized function call ({tok})")
                if fn.arity != len(args):
                    raise JavascriptParseError(
                        f"Expected ({fn.arity}) arguments for function call "
                        f"({tok}), but found ({len(args)})."
                    )
                return _Call(tok, tuple(args))
            return _Var(tok)
        raise JavascriptParseError(f"unexpected token {tok!r}")


# ---------------------------------------------------------------------------
# JVM numeric semantics (the interpreter backend)
# ---------------------------------------------------------------------------


def _wrap_long(v: int) -> int:
    return ((v - _LONG_MIN) % (2**64)) + _LONG_MIN


def _d2l(x: float) -> int:
    """JVM D2L: NaN → 0, truncate toward zero, saturate."""
    if math.isnan(x):
        return 0
    if x >= _TWO63:
        return _LONG_MAX
    if x <= float(_LONG_MIN):
        return _LONG_MIN
    return int(x)


def _d2i(x: float) -> int:
    if math.isnan(x):
        return 0
    if x >= float(_INT_MAX):
        return _INT_MAX
    if x <= float(_INT_MIN):
        return _INT_MIN
    return int(x)


def _java_div(x: float, y: float) -> float:
    if y == 0.0:
        if x == 0.0 or math.isnan(x) or math.isnan(y):
            return math.nan
        sign = math.copysign(1.0, x) * math.copysign(1.0, y)
        return math.inf if sign > 0 else -math.inf
    return x / y


def _java_rem(x: float, y: float) -> float:
    if math.isnan(x) or math.isnan(y) or math.isinf(x) or y == 0.0:
        return math.nan
    if math.isinf(y):
        return x
    if x == 0.0:
        return x
    return math.fmod(x, y)


def _java_max(x: float, y: float) -> float:
    if math.isnan(x) or math.isnan(y):
        return math.nan
    if x == y == 0.0:  # Math.max(+0,-0) = +0
        return 0.0 if (math.copysign(1, x) > 0 or math.copysign(1, y) > 0) else -0.0
    return x if x > y else y


def _java_min(x: float, y: float) -> float:
    if math.isnan(x) or math.isnan(y):
        return math.nan
    if x == y == 0.0:
        return -0.0 if (math.copysign(1, x) < 0 or math.copysign(1, y) < 0) else 0.0
    return x if x < y else y


def _mu_asinh(a: float) -> float:
    """MathUtil.asinh:102-113 (sign via the raw bit, handles -0)."""
    sign = -1.0 if math.copysign(1.0, a) < 0 else 1.0
    a = abs(a)
    return sign * _safe_log(math.sqrt(a * a + 1.0) + a)


def _mu_acosh(a: float) -> float:
    sq = a * a - 1.0
    if sq < 0 or math.isnan(sq):
        return math.nan
    return _safe_log(math.sqrt(sq) + a)


def _mu_atanh(a: float) -> float:
    """MathUtil.atanh:144-154."""
    mult = -0.5 if math.copysign(1.0, a) < 0 else 0.5
    a = abs(a)
    if math.isnan(a) or a > 1.0:
        return math.nan
    if a == 1.0:
        return mult * math.inf
    return mult * _safe_log((1.0 + a) / (1.0 - a))


def _safe_log(x: float) -> float:
    """Math.log semantics: log(0)=-Inf, log(<0)=NaN (math.log raises)."""
    if math.isnan(x) or x < 0.0:
        return math.nan
    if x == 0.0:
        return -math.inf
    if math.isinf(x):
        return math.inf
    return math.log(x)


def _safe_log10(x: float) -> float:
    if math.isnan(x) or x < 0.0:
        return math.nan
    if x == 0.0:
        return -math.inf
    if math.isinf(x):
        return math.inf
    return math.log10(x)


def _safe_sqrt(x: float) -> float:
    if math.isnan(x) or x < 0.0:
        return math.nan
    return math.sqrt(x)


def _safe_asin(x: float) -> float:
    if math.isnan(x) or abs(x) > 1.0:
        return math.nan
    return math.asin(x)


def _safe_acos(x: float) -> float:
    if math.isnan(x) or abs(x) > 1.0:
        return math.nan
    return math.acos(x)


def _safe_pow(x: float, y: float) -> float:
    """Math.pow: libm pow with the IEEE special cases python raises on."""
    try:
        return math.pow(x, y)
    except OverflowError:
        return math.inf if abs(x) > 1.0 else 0.0
    except ValueError:
        if x == 0.0 and y < 0:  # pow(±0, -n) = ±Inf per odd-integer rules
            neg = math.copysign(1.0, x) < 0 and float(y).is_integer() and (
                int(y) % 2 != 0
            )
            return -math.inf if neg else math.inf
        return math.nan  # negative base, non-integer exponent


def _safe_exp(x: float) -> float:
    try:
        return math.exp(x)
    except OverflowError:
        return math.inf


def _haversin_meters(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """SloppyMath.haversinMeters/haversinSortKey:47-75 with true trig
    (the reference's table-based cos/asin approximations agree within
    ~1e-15 rel for cos / 1e-7 for asin — inside every ported vector's
    delta).  h = (1-cos(x1-x2)) + cos(x1)cos(x2)(1-cos(Δlon));
    meters = 2R·asin(min(1, sqrt(h/2)))."""
    to_rad = math.pi / 180.0
    x1 = lat1 * to_rad
    x2 = lat2 * to_rad
    h1 = 1.0 - math.cos(x1 - x2)
    h2 = 1.0 - math.cos((lon1 - lon2) * to_rad)
    h = h1 + math.cos(x1) * math.cos(x2) * h2
    return 6_371_008.7714 * 2.0 * _safe_asin(min(1.0, math.sqrt(h * 0.5)))


# ---------------------------------------------------------------------------
# Function table (JavascriptCompiler.properties)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Fn:
    arity: int
    py: object  # callable(*doubles) -> double
    sql: object  # callable(emitter, *sql_strings) -> sql string (double-typed)


def _sql_guard_log(e, x):
    return (
        f"(CASE WHEN isnan({x}) OR ({x}) < 0.0e0 THEN {e.nan} "
        f"WHEN ({x}) = 0.0e0 THEN {e.ninf} ELSE ln({x}) END)"
    )


def _sql_guard_log10(e, x):
    return (
        f"(CASE WHEN isnan({x}) OR ({x}) < 0.0e0 THEN {e.nan} "
        f"WHEN ({x}) = 0.0e0 THEN {e.ninf} ELSE log10({x}) END)"
    )


def _sql_guard_sqrt(e, x):
    return f"(CASE WHEN isnan({x}) OR ({x}) < 0.0e0 THEN {e.nan} ELSE sqrt({x}) END)"


def _sql_guard_asin(e, x):
    return f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0e0 THEN {e.nan} ELSE asin({x}) END)"


def _sql_guard_acos(e, x):
    return f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0e0 THEN {e.nan} ELSE acos({x}) END)"


def _sql_floor(e, x):
    # Math.floor returns double; SQL floor(double) is BIGINT in Spark (and
    # would overflow-raise under ANSI).  |x| >= 2^53 doubles are integral.
    return (
        f"(CASE WHEN isnan({x}) OR abs({x}) >= 9007199254740992.0e0 THEN ({x}) "
        f"ELSE CAST(FLOOR({x}) AS DOUBLE) END)"
    )


def _sql_ceil(e, x):
    return (
        f"(CASE WHEN isnan({x}) OR abs({x}) >= 9007199254740992.0e0 THEN ({x}) "
        f"ELSE CAST(CEIL({x}) AS DOUBLE) END)"
    )


def _sql_minmax(op):
    cmp_ = ">" if op == "max" else "<"

    def emit(e, x, y):
        return (
            f"(CASE WHEN isnan({x}) OR isnan({y}) THEN {e.nan} "
            f"WHEN ({x}) {cmp_} ({y}) THEN ({x}) ELSE ({y}) END)"
        )

    return emit


def _sql_sinh(e, x):
    return f"((exp({x}) - exp(0.0e0 - ({x}))) / 2.0e0)"


def _sql_cosh(e, x):
    return f"((exp({x}) + exp(0.0e0 - ({x}))) / 2.0e0)"


def _sql_tanh(e, x):
    # exp overflows to Inf past ~709 and the ratio would be NaN; tanh is
    # ±1 to the last ulp beyond |x| > 20.
    return (
        f"(CASE WHEN ({x}) > 20.0e0 THEN 1.0e0 WHEN ({x}) < -20.0e0 THEN -1.0e0 "
        f"WHEN isnan({x}) THEN {e.nan} "
        f"ELSE (exp(({x}) * 2.0e0) - 1.0e0) / (exp(({x}) * 2.0e0) + 1.0e0) END)"
    )


def _sql_asinh(e, x):
    inner = f"ln(sqrt(({x}) * ({x}) + 1.0e0) + abs({x}))"
    return (
        f"(CASE WHEN isnan({x}) THEN {e.nan} "
        f"WHEN ({x}) < 0.0e0 THEN 0.0e0 - {inner} ELSE {inner} END)"
    )


def _sql_acosh(e, x):
    sq = f"(({x}) * ({x}) - 1.0e0)"
    return (
        f"(CASE WHEN isnan({x}) OR {sq} < 0.0e0 THEN {e.nan} "
        f"ELSE ln(sqrt({sq}) + ({x})) END)"
    )


def _sql_atanh(e, x):
    return (
        f"(CASE WHEN isnan({x}) OR abs({x}) > 1.0e0 THEN {e.nan} "
        f"WHEN ({x}) = 1.0e0 THEN {e.pinf} WHEN ({x}) = -1.0e0 THEN {e.ninf} "
        f"WHEN ({x}) < 0.0e0 THEN -0.5e0 * ln((1.0e0 + abs({x})) / (1.0e0 - abs({x}))) "
        f"ELSE 0.5e0 * ln((1.0e0 + ({x})) / (1.0e0 - ({x}))) END)"
    )


def _sql_logn(e, base, x):
    return e.div(_sql_guard_log(e, x), _sql_guard_log(e, base))


def _sql_haversin_m(e, lat1, lon1, lat2, lon2):
    to_rad = "0.017453292519943295e0"  # PI/180
    h1 = f"(1.0e0 - cos(({lat1}) * {to_rad} - ({lat2}) * {to_rad}))"
    h2 = f"(1.0e0 - cos((({lon1}) - ({lon2})) * {to_rad}))"
    h = f"({h1} + cos(({lat1}) * {to_rad}) * cos(({lat2}) * {to_rad}) * {h2})"
    arg = f"sqrt({h} * 0.5e0)"
    return (
        f"(12742017.5428e0 * asin(CASE WHEN {arg} > 1.0e0 THEN 1.0e0 "
        f"ELSE {arg} END))"
    )


def _sql_haversin_km(e, lat1, lon1, lat2, lon2):
    return f"({_sql_haversin_m(e, lat1, lon1, lat2, lon2)} / 1000.0e0)"


_FUNCTIONS: dict[str, _Fn] = {
    "abs": _Fn(1, abs, lambda e, x: f"abs({x})"),
    "acos": _Fn(1, _safe_acos, _sql_guard_acos),
    "acosh": _Fn(1, _mu_acosh, _sql_acosh),
    "asin": _Fn(1, _safe_asin, _sql_guard_asin),
    "asinh": _Fn(1, _mu_asinh, _sql_asinh),
    "atan": _Fn(1, math.atan, lambda e, x: f"atan({x})"),
    "atan2": _Fn(2, math.atan2, lambda e, y, x: f"atan2({y}, {x})"),
    "atanh": _Fn(1, _mu_atanh, _sql_atanh),
    "ceil": _Fn(1, lambda x: float(math.ceil(x)) if math.isfinite(x) else x, _sql_ceil),
    "cos": _Fn(1, math.cos, lambda e, x: f"cos({x})"),
    "cosh": _Fn(1, math.cosh, _sql_cosh),
    "exp": _Fn(1, _safe_exp, lambda e, x: f"exp({x})"),
    "floor": _Fn(
        1, lambda x: float(math.floor(x)) if math.isfinite(x) else x, _sql_floor
    ),
    "haversin": _Fn(
        4, lambda *a: _haversin_meters(*a) / 1000.0, _sql_haversin_km
    ),
    "haversinMeters": _Fn(4, _haversin_meters, _sql_haversin_m),
    "ln": _Fn(1, _safe_log, _sql_guard_log),
    "log10": _Fn(1, _safe_log10, _sql_guard_log10),
    "logn": _Fn(2, lambda b, x: _java_div(_safe_log(x), _safe_log(b)), _sql_logn),
    "max": _Fn(2, _java_max, _sql_minmax("max")),
    "min": _Fn(2, _java_min, _sql_minmax("min")),
    "pow": _Fn(2, _safe_pow, lambda e, x, y: f"power({x}, {y})"),
    "sin": _Fn(1, math.sin, lambda e, x: f"sin({x})"),
    "sinh": _Fn(1, math.sinh, _sql_sinh),
    "sqrt": _Fn(1, _safe_sqrt, _sql_guard_sqrt),
    "tan": _Fn(1, math.tan, lambda e, x: f"tan({x})"),
    "tanh": _Fn(1, math.tanh, _sql_tanh),
}


# ---------------------------------------------------------------------------
# Interpreter (evaluate)
# ---------------------------------------------------------------------------


class _Interp:
    def __init__(self, bindings):
        self.bindings = bindings

    # each method returns the node's value in the DEMANDED type
    def d(self, n) -> float:
        if isinstance(n, _Num):
            return float(n.value)
        if isinstance(n, _Var):
            return float(self.bindings[n.name])
        if isinstance(n, _Call):
            fn = _FUNCTIONS[n.name]
            return float(fn.py(*[self.d(a) for a in n.args]))
        if isinstance(n, _Unary):
            if n.op == "+":
                return self.d(n.a)
            if n.op == "-":
                return -self.d(n.a)
            if n.op == "~":
                return float(self.l(n))
            return 1.0 if self.b(n) else 0.0  # !
        if isinstance(n, _Bin):
            op = n.op
            if op in ("*", "/", "%", "+", "-"):
                x, y = self.d(n.a), self.d(n.b)
                if op == "*":
                    return x * y
                if op == "/":
                    return _java_div(x, y)
                if op == "%":
                    return _java_rem(x, y)
                if op == "+":
                    return x + y
                return x - y
            if op in ("<<", ">>", ">>>", "&", "^", "|"):
                return float(self.l(n))
            return 1.0 if self.b(n) else 0.0
        if isinstance(n, _Cond):
            return self.d(n.a) if self.b(n.c) else self.d(n.b)
        raise AssertionError(n)

    def l(self, n) -> int:
        if isinstance(n, _Num):
            return n.value if n.kind == "L" else _d2l(float(n.value))
        if isinstance(n, _Bin) and n.op in ("<<", ">>", ">>>"):
            v = self.l(n.a)
            s = self.i(n.b) & 63
            if n.op == "<<":
                return _wrap_long(v << s)
            if n.op == ">>":
                return v >> s  # python >> on signed int == arithmetic
            return (v & 0xFFFFFFFFFFFFFFFF) >> s if s else v
        if isinstance(n, _Bin) and n.op in ("&", "^", "|"):
            x, y = self.l(n.a), self.l(n.b)
            if n.op == "&":
                return _wrap_long(x & y)
            if n.op == "^":
                return _wrap_long(x ^ y)
            return _wrap_long(x | y)
        if isinstance(n, _Unary) and n.op == "~":
            return _wrap_long(self.l(n.a) ^ -1)
        if isinstance(n, _Bin) and n.op in ("<", "<=", ">", ">=", "==", "!="):
            return 1 if self.b(n) else 0
        if isinstance(n, (_Bin, _Unary)) and getattr(n, "op", None) in (
            "&&",
            "||",
            "!",
        ):
            return 1 if self.b(n) else 0
        if isinstance(n, _Cond):
            return self.l(n.a) if self.b(n.c) else self.l(n.b)
        return _d2l(self.d(n))

    def i(self, n) -> int:
        """Demanded INT (shift counts): D2I or L2I (low 32 bits)."""
        if isinstance(n, _Num) and n.kind == "L":
            v = n.value & 0xFFFFFFFF
            return v - 2**32 if v >= 2**31 else v
        if isinstance(n, (_Bin, _Unary)) and getattr(n, "op", None) in (
            "<<",
            ">>",
            ">>>",
            "&",
            "^",
            "|",
            "~",
        ):
            v = self.l(n) & 0xFFFFFFFF
            return v - 2**32 if v >= 2**31 else v
        return _d2i(self.d(n))

    def b(self, n) -> bool:
        if isinstance(n, _Unary) and n.op == "!":
            return not self.b(n.a)
        if isinstance(n, _Bin):
            if n.op == "&&":
                return self.b(n.a) and self.b(n.b)
            if n.op == "||":
                return self.b(n.a) or self.b(n.b)
            if n.op in ("<", "<=", ">", ">=", "==", "!="):
                x, y = self.d(n.a), self.d(n.b)
                if math.isnan(x) or math.isnan(y):
                    return n.op == "!="
                return {
                    "<": x < y,
                    "<=": x <= y,
                    ">": x > y,
                    ">=": x >= y,
                    "==": x == y,
                    "!=": x != y,
                }[n.op]
        # numeric truthiness: D2I/L2I-cast then != 0 (pushBoolean demands INT)
        return self.i(n) != 0


# ---------------------------------------------------------------------------
# SQL emitter
# ---------------------------------------------------------------------------


class _Emitter:
    def __init__(self, dialect: str, bindings: dict[str, str]):
        if dialect not in ("spark", "duckdb"):
            raise ValueError(f"unknown dialect {dialect!r}")
        self.dialect = dialect
        self.bindings = bindings
        self.nan = "CAST('NaN' AS DOUBLE)"
        self.pinf = "CAST('Infinity' AS DOUBLE)"
        self.ninf = "CAST('-Infinity' AS DOUBLE)"

    # literals -----------------------------------------------------------
    def dlit(self, v: float) -> str:
        if math.isnan(v):
            return self.nan
        if math.isinf(v):
            return self.pinf if v > 0 else self.ninf
        s = repr(float(v))
        if "e" not in s and "E" not in s and "inf" not in s:
            s += "e0"  # force DOUBLE literal typing on both engines
        return f"({s})"

    def llit(self, v: int) -> str:
        if v == _LONG_MIN:
            return "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"
        return f"CAST({v} AS BIGINT)"

    # coercions ----------------------------------------------------------
    def d2l(self, x: str) -> str:
        """JVM D2L: NaN→0, truncate toward zero, saturate.  Spark CAST
        truncates but ANSI-raises on overflow; DuckDB CAST rounds."""
        if self.dialect == "spark":
            trunc = f"CAST({x} AS BIGINT)"
        else:
            trunc = f"CAST(trunc({x}) AS BIGINT)"
        return (
            f"(CASE WHEN isnan({x}) THEN CAST(0 AS BIGINT) "
            f"WHEN ({x}) >= 9.223372036854775808e18 THEN {self.llit(_LONG_MAX)} "
            f"WHEN ({x}) <= -9.223372036854775808e18 THEN {self.llit(_LONG_MIN)} "
            f"ELSE {trunc} END)"
        )

    def l2d(self, x: str) -> str:
        return f"CAST({x} AS DOUBLE)"

    def div(self, x: str, y: str) -> str:
        """IEEE division under ANSI Spark (raises on /0) and DuckDB
        (NULL on /0).  The sign of a ±0 divisor is unrecoverable in SQL;
        x/-0.0 emits +Inf·sign(x) (documented divergence)."""
        return (
            f"(CASE WHEN ({y}) = 0.0e0 THEN "
            f"(CASE WHEN ({x}) = 0.0e0 OR isnan({x}) THEN {self.nan} "
            f"WHEN ({x}) > 0.0e0 THEN {self.pinf} ELSE {self.ninf} END) "
            f"ELSE ({x}) / ({y}) END)"
        )

    def rem(self, x: str, y: str) -> str:
        """JVM drem — both engines' ``%`` on doubles is C fmod (sign of
        the dividend), so only the NaN edges need guarding."""
        return (
            f"(CASE WHEN isnan({x}) OR isnan({y}) OR ({y}) = 0.0e0 "
            f"OR abs({x}) = {self.pinf} THEN {self.nan} "
            f"WHEN abs({y}) = {self.pinf} THEN ({x}) "
            f"ELSE ({x}) % ({y}) END)"
        )

    # demand-typed emission ------------------------------------------------
    def d(self, n) -> str:
        if isinstance(n, _Num):
            return self.dlit(float(n.value)) if n.kind == "D" else self.l2d(
                self.llit(n.value)
            )
        if isinstance(n, _Var):
            try:
                return f"CAST({self.bindings[n.name]} AS DOUBLE)"
            except KeyError:
                raise JavascriptParseError(f"Unbound variable: {n.name}") from None
        if isinstance(n, _Call):
            fn = _FUNCTIONS[n.name]
            return fn.sql(self, *[self.d(a) for a in n.args])
        if isinstance(n, _Unary):
            if n.op == "+":
                return self.d(n.a)
            if n.op == "-":
                return f"(0.0e0 - {self.d(n.a)})"
            if n.op == "~":
                return self.l2d(self.l(n))
            return f"(CASE WHEN {self.b(n)} THEN 1.0e0 ELSE 0.0e0 END)"
        if isinstance(n, _Bin):
            op = n.op
            if op in ("*", "+", "-"):
                return f"({self.d(n.a)} {op} {self.d(n.b)})"
            if op == "/":
                return self.div(self.d(n.a), self.d(n.b))
            if op == "%":
                return self.rem(self.d(n.a), self.d(n.b))
            if op in ("<<", ">>", ">>>", "&", "^", "|"):
                return self.l2d(self.l(n))
            return f"(CASE WHEN {self.b(n)} THEN 1.0e0 ELSE 0.0e0 END)"
        if isinstance(n, _Cond):
            return f"(CASE WHEN {self.b(n.c)} THEN {self.d(n.a)} ELSE {self.d(n.b)} END)"
        raise AssertionError(n)

    def l(self, n) -> str:
        if isinstance(n, _Num) and n.kind == "L":
            return self.llit(n.value)
        if isinstance(n, _Bin) and n.op in ("<<", ">>", ">>>"):
            if self.dialect == "duckdb":
                raise NotImplementedError(
                    "shift operators are not emittable for DuckDB (its <<"
                    " and >> are overflow-checked, not JVM-wrapping)"
                )
            fn = {"<<": "shiftleft", ">>": "shiftright", ">>>": "shiftrightunsigned"}[
                n.op
            ]
            count = f"CAST(({self.icount(n.b)} & 63) AS INT)"
            return f"{fn}({self.l(n.a)}, {count})"
        if isinstance(n, _Bin) and n.op in ("&", "^", "|"):
            x, y = self.l(n.a), self.l(n.b)
            if n.op == "^" and self.dialect == "duckdb":
                return f"xor({x}, {y})"
            return f"({x} {n.op} {y})"
        if isinstance(n, _Unary) and n.op == "~":
            return f"(~{self.l(n.a)})"
        if isinstance(n, (_Bin, _Unary)) and getattr(n, "op", None) in (
            "<",
            "<=",
            ">",
            ">=",
            "==",
            "!=",
            "&&",
            "||",
            "!",
        ):
            return (
                f"(CASE WHEN {self.b(n)} THEN CAST(1 AS BIGINT) "
                f"ELSE CAST(0 AS BIGINT) END)"
            )
        if isinstance(n, _Cond):
            return f"(CASE WHEN {self.b(n.c)} THEN {self.l(n.a)} ELSE {self.l(n.b)} END)"
        return self.d2l(self.d(n))

    def icount(self, n) -> str:
        """Shift count: D2I clamp (saturating int cast), as a BIGINT."""
        if isinstance(n, _Num) and n.kind == "L":
            v = n.value & 0xFFFFFFFF
            v = v - 2**32 if v >= 2**31 else v
            return self.llit(v)
        x = self.d(n)
        return (
            f"(CASE WHEN isnan({x}) THEN CAST(0 AS BIGINT) "
            f"WHEN ({x}) >= 2147483647.0e0 THEN CAST(2147483647 AS BIGINT) "
            f"WHEN ({x}) <= -2147483648.0e0 THEN CAST(-2147483648 AS BIGINT) "
            f"ELSE CAST({x} AS BIGINT) END)"
            if self.dialect == "spark"
            else f"(CASE WHEN isnan({x}) THEN CAST(0 AS BIGINT) "
            f"WHEN ({x}) >= 2147483647.0e0 THEN CAST(2147483647 AS BIGINT) "
            f"WHEN ({x}) <= -2147483648.0e0 THEN CAST(-2147483648 AS BIGINT) "
            f"ELSE CAST(trunc({x}) AS BIGINT) END)"
        )

    def b(self, n) -> str:
        if isinstance(n, _Unary) and n.op == "!":
            return f"(NOT {self.b(n.a)})"
        if isinstance(n, _Bin):
            if n.op == "&&":
                return f"({self.b(n.a)} AND {self.b(n.b)})"
            if n.op == "||":
                return f"({self.b(n.a)} OR {self.b(n.b)})"
            if n.op in ("<", "<=", ">", ">=", "==", "!="):
                x, y = self.d(n.a), self.d(n.b)
                sqlop = {"==": "=", "!=": "<>"}.get(n.op, n.op)
                if n.op == "!=":
                    # Java: NaN != anything is TRUE
                    return (
                        f"(isnan({x}) OR isnan({y}) OR ({x}) {sqlop} ({y}))"
                    )
                # Java: any comparison with NaN is FALSE (SQL orders NaN)
                return (
                    f"((NOT isnan({x})) AND (NOT isnan({y})) "
                    f"AND ({x}) {sqlop} ({y}))"
                )
        # numeric truthiness == (int)value != 0
        return f"({self.l(n)} <> CAST(0 AS BIGINT))"


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class JavascriptExpression:
    """A compiled expression (``Expression`` analog)."""

    def __init__(self, source: str, ast):
        self.source = source
        self._ast = ast
        self.variables = tuple(sorted(self._collect_vars(ast)))

    @staticmethod
    def _collect_vars(n, acc=None):
        if acc is None:
            acc = set()
        if isinstance(n, _Var):
            acc.add(n.name)
        elif isinstance(n, _Call):
            for a in n.args:
                JavascriptExpression._collect_vars(a, acc)
        elif isinstance(n, _Unary):
            JavascriptExpression._collect_vars(n.a, acc)
        elif isinstance(n, _Bin):
            JavascriptExpression._collect_vars(n.a, acc)
            JavascriptExpression._collect_vars(n.b, acc)
        elif isinstance(n, _Cond):
            for a in (n.c, n.a, n.b):
                JavascriptExpression._collect_vars(a, acc)
        return acc

    def evaluate(self, bindings: dict[str, float] | None = None) -> float:
        """Expression.evaluate — the compile root demands DOUBLE."""
        return _Interp(bindings or {}).d(self._ast)

    def to_sql(
        self, dialect: str = "spark", bindings: dict[str, str] | None = None
    ) -> str:
        """Emit a double-typed SQL expression.  ``bindings`` maps each
        variable to a SQL expression (default: the variable name itself,
        which must then be a valid column reference)."""
        binds = dict(bindings or {})
        for v in self.variables:
            binds.setdefault(v, v)
        return _Emitter(dialect, binds).d(self._ast)


class JavascriptCompiler:
    """JavascriptCompiler.compile analog (DEFAULT_FUNCTIONS only — custom
    function maps are out of scope; the default zoo is complete)."""

    @staticmethod
    def compile(source: str) -> JavascriptExpression:
        ast = _Parser(_lex(source), _FUNCTIONS).parse()
        return JavascriptExpression(source, ast)
