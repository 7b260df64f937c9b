"""Trace-time sparse forward-mode AD for the fused assembly kernels.

`sparse_jacfwd(f, z0)` returns `(out0, D)` where `D[k][oi]` is the
derivative tile of output `oi` w.r.t. input slot `k`, or ``None`` when
it is STRUCTURALLY zero. The fused kernel (ops/fused_p1.py) uses the
``None`` entries to skip whole multiply-accumulate chains at trace
time — for linear physics (thermal, cdr diffusion, ...) most of the
per-qp density Jacobian is structurally zero or constant, and the
`jax.linearize` + dense unit-tangent evaluation it replaces spent the
majority of its VPU work multiplying zero tiles (XLA does not fold
float x*0 — it would change NaN/Inf semantics).

This is the reference's Sacado-SFad analog rebuilt for the TPU: SFad
carries a fixed derivative array per scalar (sacado expression
templates); here the jaxpr of the density function is interpreted once
at trace time with per-slot tangent DICTS, so zero lanes vanish from
the emitted kernel instead of being computed.

Implementation: `jax.make_jaxpr` traces the density function (closure
tiles become constants), then a tiny jaxpr interpreter re-emits the
primal ops via `primitive.bind` while propagating {slot: tangent}
dicts through per-primitive JVP rules. Any primitive without a rule
whose inputs carry tangents raises `SparseFwdUnsupported`; the caller
falls back to `jax.linearize`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.extend import core as jex_core

__all__ = ["sparse_jacfwd", "SparseFwdUnsupported"]


class SparseFwdUnsupported(Exception):
    pass


def _tmap(fn, *tans):
    """Combine tangent dicts with fn(*slot_values); missing slots are
    structural zeros and are skipped unless another dict carries the
    slot (then the missing value enters as None and fn must handle
    it)."""
    keys = set()
    for t in tans:
        keys.update(t)
    out = {}
    for k in keys:
        vals = [t.get(k) for t in tans]
        r = fn(*vals)
        if r is not None:
            out[k] = r
    return out


def _lin1(c):
    """Unary linear map with coefficient tile/scalar c: t -> c*t."""
    return lambda t: None if t is None else c * t


def _add_rule(x, y):
    if x is None:
        return y
    if y is None:
        return x
    return x + y


def _sub_rule(x, y):
    if x is None:
        return -y
    if y is None:
        return x
    return x - y


# rules receive (primals, tangent_dicts, out_primal, params) and return
# the output tangent dict
def _mul(p, t, o, params):
    x, y = p
    return _tmap(lambda tx, ty:
                 _add_rule(None if tx is None else tx * y,
                           None if ty is None else x * ty), *t)


def _div(p, t, o, params):
    x, y = p
    return _tmap(lambda tx, ty:
                 _add_rule(None if tx is None else tx / y,
                           None if ty is None else -x * ty / (y * y)),
                 *t)


def _unary(dfun):
    def rule(p, t, o, params):
        c = dfun(p[0], o)
        return _tmap(_lin1(c), t[0])
    return rule


def _linear_all(p, t, o, params):
    return _tmap(lambda *vs: _sum_tangents(vs), *t)


def _sum_tangents(vs):
    acc = None
    for v in vs:
        acc = _add_rule(acc, v)
    return acc


def _dense(tan, primal_in):
    """Give a (possibly scalar-seeded) tangent the primal's shape so
    shape-transforming primitives can apply verbatim."""
    if jnp.shape(tan) == jnp.shape(primal_in):
        return tan
    return tan * jnp.ones_like(primal_in)


def _broadcast(p, t, o, params):
    def b(tan):
        if tan is None:
            return None
        return lax.broadcast_in_dim(_dense(tan, p[0]), params["shape"],
                                    params["broadcast_dimensions"])
    return _tmap(b, t[0])


def _convert(p, t, o, params):
    dt = params["new_dtype"]
    if not jnp.issubdtype(dt, jnp.floating):
        return {}
    return _tmap(_lin1(jnp.ones((), dt)), t[0])


def _integer_pow(p, t, o, params):
    y = params["y"]
    if y == 0:
        return {}
    c = y * lax.integer_pow(p[0], y - 1)
    return _tmap(_lin1(c), t[0])


def _pow(p, t, o, params):
    x, y = p
    tx, ty = t
    out = {}
    if tx:
        out = _tmap(_lin1(y * lax.pow(x, y - 1.0)), tx)
    if ty:
        oy = _tmap(_lin1(o * lax.log(x)), ty)
        out = _tmap(_add_rule, out, oy) if out else oy
    return out


def _max(p, t, o, params):
    x, y = p
    pick_x = lax.ge(x, y)

    def sel(tx, ty):
        zx = jnp.zeros_like(o) if tx is None else tx
        zy = jnp.zeros_like(o) if ty is None else ty
        return lax.select(pick_x, zx, zy)
    return _tmap(sel, *t)


def _min(p, t, o, params):
    x, y = p
    pick_x = lax.le(x, y)

    def sel(tx, ty):
        zx = jnp.zeros_like(o) if tx is None else tx
        zy = jnp.zeros_like(o) if ty is None else ty
        return lax.select(pick_x, zx, zy)
    return _tmap(sel, *t)


def _select_n(p, t, o, params):
    which = p[0]
    cases = p[1:]
    tans = t[1:]

    def sel(*ts):
        dense = [jnp.zeros_like(cases[i]) if ts[i] is None else ts[i]
                 for i in range(len(ts))]
        return lax.select_n(which, *dense)
    return _tmap(sel, *tans)


def _abs(p, t, o, params):
    return _tmap(_lin1(lax.sign(p[0])), t[0])


def _zero(p, t, o, params):
    return {}


_RULES = {
    "add": lambda p, t, o, params: _tmap(_add_rule, *t),
    "sub": lambda p, t, o, params: _tmap(_sub_rule, *t),
    "mul": _mul,
    "div": _div,
    "neg": lambda p, t, o, params: _tmap(_lin1(-1.0), t[0]),
    "sqrt": _unary(lambda x, o: 0.5 / lax.sqrt(x)),
    "rsqrt": _unary(lambda x, o: -0.5 * o / x),
    "exp": _unary(lambda x, o: o),
    "log": _unary(lambda x, o: 1.0 / x),
    "log1p": _unary(lambda x, o: 1.0 / (1.0 + x)),
    "expm1": _unary(lambda x, o: o + 1.0),
    "sin": _unary(lambda x, o: lax.cos(x)),
    "cos": _unary(lambda x, o: -lax.sin(x)),
    "tan": _unary(lambda x, o: 1.0 + o * o),
    "tanh": _unary(lambda x, o: 1.0 - o * o),
    "sinh": _unary(lambda x, o: lax.cosh(x)),
    "cosh": _unary(lambda x, o: lax.sinh(x)),
    "logistic": _unary(lambda x, o: o * (1.0 - o)),
    "erf": _unary(lambda x, o: 1.1283791670955126
                  * lax.exp(-x * x)),
    "abs": _abs,
    "sign": _zero,
    "floor": _zero,
    "ceil": _zero,
    "round": _zero,
    "stop_gradient": _zero,
    "eq": _zero, "ne": _zero, "lt": _zero,
    "le": _zero, "gt": _zero, "ge": _zero,
    "and": _zero, "or": _zero, "not": _zero, "xor": _zero,
    "is_finite": _zero,
    "iota": _zero,
    "max": _max,
    "min": _min,
    "select_n": _select_n,
    "integer_pow": _integer_pow,
    "pow": _pow,
    "broadcast_in_dim": _broadcast,
    "convert_element_type": _convert,
    "reshape": lambda p, t, o, params: _tmap(
        lambda tan: None if tan is None
        else lax.reshape(_dense(tan, p[0]), params["new_sizes"],
                         params["dimensions"]), t[0]),
    "transpose": lambda p, t, o, params: _tmap(
        lambda tan: None if tan is None
        else lax.transpose(_dense(tan, p[0]), params["permutation"]),
        t[0]),
    "reduce_sum": lambda p, t, o, params: _tmap(
        lambda tan: None if tan is None
        else lax.reduce_sum_p.bind(_dense(tan, p[0]), **params), t[0]),
    "squeeze": lambda p, t, o, params: _tmap(
        lambda tan: None if tan is None
        else lax.squeeze_p.bind(_dense(tan, p[0]), **params), t[0]),
    "copy": _linear_all,
    "atan2": lambda p, t, o, params: _tmap(
        lambda tx, ty: _add_rule(
            None if tx is None else p[1] * tx
            / (p[0] * p[0] + p[1] * p[1]),
            None if ty is None else -p[0] * ty
            / (p[0] * p[0] + p[1] * p[1])), *t),
}


def _eval_sparse(jaxpr, consts, args, tangents):
    """Interpret `jaxpr` re-emitting primal ops, propagating sparse
    tangent dicts. `tangents[i]` is the dict for input i."""
    env = {}

    def read(a):
        if isinstance(a, jex_core.Literal):
            v = a.val
            if not isinstance(v, (int, float, bool, complex)):
                v = jnp.asarray(v)   # TypedNdArray -> operable array
            return v, {}
        return env[a]

    def write(v, p, t):
        env[v] = (p, t)

    for v, c in zip(jaxpr.constvars, consts):
        # consts may surface as TypedNdArray (no operator overloads);
        # normalize to jnp arrays so JVP rules can do arithmetic
        write(v, jnp.asarray(c), {})
    for v, a, t in zip(jaxpr.invars, args, tangents):
        write(v, a, t)

    for eqn in jaxpr.eqns:
        ins = [read(v) for v in eqn.invars]
        primals = [p for p, _ in ins]
        tans = [t for _, t in ins]
        name = eqn.primitive.name
        if name in ("pjit", "jit"):
            inner = eqn.params["jaxpr"]
            outs = _eval_sparse(inner.jaxpr, inner.consts, primals,
                                tans)
            for v, (p, t) in zip(eqn.outvars, outs):
                write(v, p, t)
            continue
        if name == "custom_jvp_call":
            inner = eqn.params["call_jaxpr"]
            outs = _eval_sparse(inner.jaxpr, inner.consts, primals,
                                tans)
            for v, (p, t) in zip(eqn.outvars, outs):
                write(v, p, t)
            continue
        out_p = eqn.primitive.bind(*primals, **eqn.params)
        outs_p = out_p if eqn.primitive.multiple_results else [out_p]
        rule = _RULES.get(name)
        if rule is None:
            if any(t for t in tans):
                raise SparseFwdUnsupported(name)
            out_t = [{} for _ in outs_p]
        else:
            r = rule(primals, tans, outs_p[0]
                     if not eqn.primitive.multiple_results else outs_p,
                     eqn.params)
            out_t = [r] if not eqn.primitive.multiple_results \
                else list(r)
        for v, p, t in zip(eqn.outvars, outs_p, out_t):
            write(v, p, t)

    return [read(v) for v in jaxpr.outvars]


def sparse_jacfwd(f, z0):
    """(out0, D): primal outputs of f(z0) and D[k][oi] = d out[oi] /
    d z0[k] tile, or None where structurally zero. Falls back by
    raising SparseFwdUnsupported for the caller to catch."""
    closed = jax.make_jaxpr(f)(z0)
    n_in = len(z0)
    # scalar-1.0 seeds: tangents stay scalars through linear chains and
    # only densify when a rule needs the primal's shape
    tangents = [{k: 1.0} for k in range(n_in)]
    outs = _eval_sparse(closed.jaxpr, closed.consts, list(z0),
                        tangents)
    out0 = [p for p, _ in outs]
    n_out = len(out0)
    D = [[None] * n_out for _ in range(n_in)]
    for oi, (_p, tdict) in enumerate(outs):
        for k, tan in tdict.items():
            # scalar-1.0 seeds mean tangents may be scalars or tiles;
            # normalize lazily at use site (they broadcast anyway)
            D[k][oi] = tan
    return out0, D
