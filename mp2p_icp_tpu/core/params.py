"""Dynamic parameters: runtime-evaluated math expressions.

Reference parity: mp2p_icp_map/include/mp2p_icp/Parameterizable.h:51-186 —
any numeric field may be a compiled math expression over named variables
(``ICP_ITERATION``, ``vx..wz``, ``robot_x..robot_roll``, user vars), with
constant folding at parse time and re-evaluation on realize().

TPU-first: expressions are parsed once into Python ASTs and evaluated
host-side against a variable dict (cheap — they are scalar); values that
feed jitted code should change rarely (they become static config), while
fast-changing variables (twist, robot pose) are threaded as *traced* scalars
through the ``variables`` argument of filters.
"""

from __future__ import annotations

import ast
import math
import operator
from typing import Any, Dict, Optional

_ALLOWED_FUNCS = {
    "abs": abs,
    "sqrt": math.sqrt,
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "atan2": math.atan2,
    "exp": math.exp,
    "log": math.log,
    "floor": math.floor,
    "ceil": math.ceil,
    "min": min,
    "max": max,
    "pow": pow,
    "deg2rad": math.radians,
    "rad2deg": math.degrees,
}
_ALLOWED_CONSTS = {"pi": math.pi, "M_PI": math.pi, "e": math.e}

_BINOPS = {
    ast.Add: operator.add,
    ast.Sub: operator.sub,
    ast.Mult: operator.mul,
    ast.Div: operator.truediv,
    ast.Mod: operator.mod,
    ast.Pow: operator.pow,
    ast.FloorDiv: operator.floordiv,
}
_UNARY = {ast.USub: operator.neg, ast.UAdd: operator.pos}
_CMP = {
    ast.Lt: operator.lt,
    ast.LtE: operator.le,
    ast.Gt: operator.gt,
    ast.GtE: operator.ge,
    ast.Eq: operator.eq,
    ast.NotEq: operator.ne,
}


class Expression:
    """A parsed numeric expression over named variables (safe evaluator —
    no attribute access, no calls beyond the allowlist).

    Evaluates with python floats OR traced jax scalars in the variable
    environment (the arithmetic goes through operator.* so jnp arrays work),
    which is how ICP_ITERATION-dependent parameters run inside jit.
    Hashable/comparable by text so module configs holding Expressions stay
    valid jit cache keys."""

    def __hash__(self):
        return hash(("mp2p_expr", self.text))

    def __eq__(self, other):
        return isinstance(other, Expression) and other.text == self.text

    def __repr__(self):
        return f"Expression({self.text!r})"

    def __init__(self, text: str):
        self.text = text.strip()
        # the reference wraps expressions as '$f{...}' in YAML; accept both
        if self.text.startswith("$f{") and self.text.endswith("}"):
            self.text = self.text[3:-1]
        self._tree = ast.parse(self.text, mode="eval")
        self.variables = sorted(
            {
                n.id
                for n in ast.walk(self._tree)
                if isinstance(n, ast.Name)
                and n.id not in _ALLOWED_FUNCS
                and n.id not in _ALLOWED_CONSTS
            }
        )

    def __call__(self, variables: Optional[Dict[str, Any]] = None) -> float:
        return self._eval(self._tree.body, variables or {})

    def _eval(self, node, env):
        if isinstance(node, ast.Constant):
            if not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric constant: {node.value!r}")
            return node.value
        if isinstance(node, ast.Name):
            if node.id in _ALLOWED_CONSTS:
                return _ALLOWED_CONSTS[node.id]
            if node.id in env:
                return env[node.id]
            raise KeyError(
                f"undefined variable {node.id!r} in expression {self.text!r}"
            )
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            return _BINOPS[type(node.op)](
                self._eval(node.left, env), self._eval(node.right, env)
            )
        if isinstance(node, ast.UnaryOp) and type(node.op) in _UNARY:
            return _UNARY[type(node.op)](self._eval(node.operand, env))
        if isinstance(node, ast.Compare) and len(node.ops) == 1:
            res = _CMP[type(node.ops[0])](
                self._eval(node.left, env),
                self._eval(node.comparators[0], env),
            )
            if isinstance(res, (bool, int, float)):
                return float(res)
            # traced comparison (e.g. against ICP_ITERATION inside jit):
            # keep it traced — float() would raise ConcretizationTypeError
            import jax.numpy as jnp

            return res.astype(jnp.float32)
        if isinstance(node, ast.IfExp):
            test = self._eval(node.test, env)
            if isinstance(test, (bool, int, float)):
                return (
                    self._eval(node.body, env)
                    if test
                    else self._eval(node.orelse, env)
                )
            # traced condition: evaluate both arms (pure arithmetic) and
            # select — `if tracer:` would raise at trace time
            import jax.numpy as jnp

            return jnp.where(
                jnp.asarray(test).astype(bool),
                self._eval(node.body, env),
                self._eval(node.orelse, env),
            )
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            fn = _ALLOWED_FUNCS.get(node.func.id)
            if fn is None:
                raise ValueError(f"function not allowed: {node.func.id}")
            return fn(*(self._eval(a, env) for a in node.args))
        raise ValueError(
            f"unsupported syntax in expression {self.text!r}: {ast.dump(node)}"
        )


def resolve_value(value, variables: Optional[Dict[str, Any]] = None):
    """YAML scalar -> number. Strings are parsed as expressions (constant
    folding when they reference no unknown variables)."""
    if isinstance(value, (int, float, bool)):
        return value
    if isinstance(value, str):
        return Expression(value)(variables)
    raise TypeError(f"cannot resolve parameter value: {value!r}")


class ParameterSource:
    """Named-variable store attached to parameterised modules
    (reference: ParameterSource, Parameterizable.h:93-150)."""

    def __init__(self):
        self._vars: Dict[str, float] = {}

    def update_variable(self, name: str, value: float) -> None:
        self._vars[name] = float(value)

    def update_variables(self, d: Dict[str, float]) -> None:
        for k, v in d.items():
            self.update_variable(k, v)

    @property
    def variables(self) -> Dict[str, float]:
        return dict(self._vars)

    def realize(self, expr: Expression) -> float:
        return expr(self._vars)
