"""Safe arithmetic score expressions — the Lucene expressions module
(org.apache.lucene.expressions.js.JavascriptCompiler) analogue.

Lucene compiles a javascript-like arithmetic source against named bindings
(``_score`` plus DoubleValuesSource fields) into a DoubleValuesSource used
by FunctionScoreQuery.  Here the source is parsed with Python's ``ast``
(expression mode) against a strict WHITELIST — binary/unary arithmetic,
numeric literals, bound variable names, and a fixed function table — and
compiled into a closure tree evaluating vectorized numpy over per-segment
arrays.  Everything outside the whitelist (attributes, subscripts,
comparisons, boolean logic, comprehensions, strings, calls to unknown
names…) raises :class:`ExpressionError` at COMPILE time with the offending
construct named, mirroring JavascriptCompiler's ParseException — a query
can never reach Python ``eval``.

Grammar: ``+ - * / % **`` (binary), unary ``-``/``+``, parentheses,
int/float literals, variables, and ``ln``, ``log2``, ``log10``, ``sqrt``,
``abs``, ``exp``, ``min``, ``max``, ``pow`` (min/max/pow take exactly two
arguments, the others one — JavascriptCompiler arity checking).  Division
follows IEEE float64 (x/0 → ±inf like Lucene's doubles); expressions whose
result is NaN for any scored doc are rejected loudly by the caller
(query.py::search_expression) because NaN breaks the (score desc, url asc)
total order.
"""

from __future__ import annotations

import ast
from typing import Callable, Mapping

import numpy as np

ExprFn = Callable[[Mapping[str, "np.ndarray | float"]], np.ndarray]


class ExpressionError(ValueError):
    """Raised at compile time for source outside the whitelist —
    ≙ JavascriptCompiler's ParseException."""


_MAX_SOURCE_CHARS = 10_000
_MAX_NODES = 1_000
_RESERVED_VARIABLES = frozenset({"_score", "doc_len", "warc_ts"})


def validate_bindings(bindings: "dict | None") -> dict[str, float]:
    """Shared binding validation for SearchEngine.search_expression and
    the sharded driver (one copy, so the built-in variable set cannot
    drift): reserved names may not be shadowed, every value must be a
    real number (bool rejected), values coerce to float."""
    out = dict(bindings or {})
    for k, v in out.items():
        if k in _RESERVED_VARIABLES:
            raise ValueError(f"binding {k!r} shadows a built-in variable")
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(
                f"binding {k!r} must be a number, got {type(v).__name__}"
            )
        out[k] = float(v)
    return out


_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
}

_FUNCS_1 = {
    "ln": np.log,
    "log2": np.log2,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
}
_FUNCS_2 = {
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}


def expression_variables(src: str) -> set[str]:
    """The variable names a compiled expression will read — callers use
    this to validate bindings BEFORE fan-out (sharded driver)."""
    return compile_expression(src, None)[1]


def compile_expression(
    src: str, allowed: "set[str] | None"
) -> tuple[ExprFn, set[str]]:
    """Compile ``src`` → (vectorized evaluator, referenced variable names).

    ``allowed``: the full variable universe; a Name outside it is a loud
    compile error naming the variable and the universe.  ``None`` skips the
    universe check (pure syntax validation / variable discovery)."""
    if not isinstance(src, str) or not src.strip():
        raise ExpressionError("expression must be a non-empty string")
    if len(src) > _MAX_SOURCE_CHARS:
        raise ExpressionError(
            f"expression too long ({len(src)} chars, cap {_MAX_SOURCE_CHARS})"
        )
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"expression syntax error: {e.msg}") from None
    except RecursionError:
        raise ExpressionError(
            "expression too deeply nested to parse"
        ) from None
    # the recursive build() below (and ast.parse above on some inputs)
    # is depth-bounded by the tree shape — a pathological '1+1+…' chain
    # would blow the interpreter recursion limit and escape as a 500
    # through the HTTP layer, so cap the node count FIRST (a legitimate
    # scoring formula is a few dozen nodes)
    n_nodes = sum(1 for _ in ast.walk(tree))
    if n_nodes > _MAX_NODES:
        raise ExpressionError(
            f"expression too complex ({n_nodes} syntax nodes, cap "
            f"{_MAX_NODES})"
        )
    used: set[str] = set()

    def build(node: ast.AST) -> ExprFn:
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, bool) or not isinstance(
                node.value, (int, float)
            ):
                raise ExpressionError(
                    f"only numeric literals are allowed, got {node.value!r}"
                )
            c = float(node.value)
            return lambda env: c
        if isinstance(node, ast.Name):
            name = node.id
            if allowed is not None and name not in allowed:
                raise ExpressionError(
                    f"unknown variable {name!r} (bound: {sorted(allowed)})"
                )
            used.add(name)
            return lambda env: env[name]
        if isinstance(node, ast.UnaryOp):
            if isinstance(node.op, ast.USub):
                inner = build(node.operand)
                return lambda env: np.negative(inner(env))
            if isinstance(node.op, ast.UAdd):
                return build(node.operand)
            raise ExpressionError(
                f"unsupported unary operator {type(node.op).__name__}"
            )
        if isinstance(node, ast.BinOp):
            fn = _BINOPS.get(type(node.op))
            if fn is None:
                raise ExpressionError(
                    f"unsupported operator {type(node.op).__name__}"
                )
            lhs, rhs = build(node.left), build(node.right)
            return lambda env: fn(lhs(env), rhs(env))
        if isinstance(node, ast.Call):
            if node.keywords or not isinstance(node.func, ast.Name):
                raise ExpressionError(
                    "function calls take plain positional arguments and a "
                    "bare function name"
                )
            fname = node.func.id
            if fname in _FUNCS_1:
                if len(node.args) != 1:
                    raise ExpressionError(f"{fname}() takes exactly 1 argument")
                fn1, a = _FUNCS_1[fname], build(node.args[0])
                return lambda env: fn1(a(env))
            if fname in _FUNCS_2:
                if len(node.args) != 2:
                    raise ExpressionError(f"{fname}() takes exactly 2 arguments")
                fn2 = _FUNCS_2[fname]
                a, b = build(node.args[0]), build(node.args[1])
                return lambda env: fn2(a(env), b(env))
            raise ExpressionError(
                f"unknown function {fname!r} (have "
                f"{sorted([*_FUNCS_1, *_FUNCS_2])})"
            )
        raise ExpressionError(
            f"unsupported expression element {type(node).__name__}"
        )

    fn = build(tree)
    return fn, used
