"""Hand-rolled fixed-shape Krylov solvers for the TPU hot path.

jax.scipy.sparse.linalg.gmres spends ~300 ms/iteration of pure
overhead on the TPU (dynamic-slice-heavy Arnoldi bookkeeping); these
replacements keep every iteration to a handful of elementwise ops,
vdots and the user matvec inside one lax.scan, which is what the
hardware actually executes well.  They are the production linear
solvers behind the matrix-free Newton (reference counterpart: the
Belos GMRES/BiCGStab instantiations, linearAlgebraInterface.cpp:358+).

All solvers run a FIXED number of iterations (no data-dependent exit)
so one compiled program serves every Newton step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["gmres_fixed", "bicgstab_fixed"]


def gmres_fixed(matvec, b, *, m=40, precond=None, x0=None):
    """GMRES(m), one restart cycle of m fixed Arnoldi steps.

    Modified Gram-Schmidt on a statically-shaped (m+1, n) basis; the
    small (m+1, m) Hessenberg least-squares is solved densely at the
    end.  precond: right preconditioner callable (applied as A M v).
    """
    n = b.shape[0]
    dtype = b.dtype
    M = precond if precond is not None else (lambda v: v)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    beta = jnp.linalg.norm(r0)
    scale = jnp.where(beta > 0, beta, 1.0)
    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(r0 / scale)
    H = jnp.zeros((m + 1, m), dtype=dtype)

    def body(carry, j):
        V, H = carry
        w = matvec(M(V[j]))
        # modified Gram-Schmidt against ALL basis vectors (rows > j are
        # zero so the extra dots are harmless and keep shapes static)
        h = V @ w                          # (m+1,)
        mask = (jnp.arange(m + 1) <= j)
        h = jnp.where(mask, h, 0.0)
        w = w - h @ V
        nrm = jnp.linalg.norm(w)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        h = h.at[j + 1].set(nrm)
        V = V.at[j + 1].set(w / safe)
        H = H.at[:, j].set(h)
        return (V, H), None

    (V, H), _ = jax.lax.scan(body, (V, H), jnp.arange(m))
    # least squares min ||beta e1 - H y|| via the (m, m) normal
    # equations (m is small and H is well-scaled by the Arnoldi norms)
    e1 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
    A = H.T @ H + jnp.asarray(1e-30, dtype) * jnp.eye(m, dtype=dtype)
    y = jnp.linalg.solve(A, H.T @ e1)
    return x0 + M(y @ V[:m])


def bicgstab_fixed(matvec, b, *, iters=20, precond=None, x0=None):
    """BiCGStab with a fixed iteration count and right preconditioner."""
    M = precond if precond is not None else (lambda v: v)
    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    rhat = r0
    eps = jnp.asarray(1e-30, dtype=b.dtype)

    def body(carry, _):
        x, r, p, v, rho, alpha, omega = carry
        rho1 = jnp.vdot(rhat, r)
        beta = (rho1 / (rho + eps)) * (alpha / (omega + eps))
        p = r + beta * (p - omega * v)
        ph = M(p)
        v = matvec(ph)
        alpha = rho1 / (jnp.vdot(rhat, v) + eps)
        s = r - alpha * v
        sh = M(s)
        t = matvec(sh)
        omega = jnp.vdot(t, s) / (jnp.vdot(t, t) + eps)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        return (x, r, p, v, rho1, alpha, omega), None

    one = jnp.asarray(1.0, dtype=b.dtype)
    zero = jnp.zeros_like(b)
    carry = (x0, r0, zero, zero, one, one, one)
    (x, r, *_), _ = jax.lax.scan(body, carry, None, length=iters)
    return x
