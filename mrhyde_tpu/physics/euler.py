"""Compressible Euler equations (nondimensional conservative form).

Reference: src/physics/euler.cpp — variables rho, rhoux[, rhouy, rhouz],
rhoE, all HGRAD; nondimensional thermodynamics (euler.cpp
computeThermoProps):
  p0 = (gamma-1)(rhoE - 0.5 |rhou|^2 / rho)
  T  = gamma Ma^2 p0 / rho,   a = sqrt(T)/Ma
Weak form per conserved variable U: (U_t, v) - (F(U), grad v)
- (source, v), with far-field/Roe stabilized boundary fluxes.
The flux-Jacobian eigendecomposition (unit-tested in the reference,
unit_tests/physics/Euler.cpp) is provided by normal_flux_jacobian /
eigendecomp_flux_jacobian below.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["Euler", "normal_flux_jacobian", "eigendecomp_flux_jacobian"]


@register("Euler")
class Euler(PhysicsModule):
    name = "euler"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        s = self.settings
        self.gamma = float(s.get("gamma", 1.4))
        self.cp = float(s.get("cp", 1004.5))
        self.RGas = float(s.get("RGas", 287.0))
        self.URef = float(s.get("URef", 3.431143))
        self.TRef = float(s.get("TRef", 293.0))
        # reference Mach number Ma = URef / sqrt(gamma R TRef)
        self.Ma = self.URef / np.sqrt(self.gamma * self.RGas * self.TRef)
        self.roestab = bool(s.get("Roe-like stabilization", False))
        self.maxEVstab = bool(s.get("max EV stabilization", False))

    def variables(self):
        out = [("rho", "HGRAD", 1), ("rhoux", "HGRAD", 1)]
        if self.dim > 1:
            out.append(("rhouy", "HGRAD", 1))
        if self.dim > 2:
            out.append(("rhouz", "HGRAD", 1))
        out.append(("rhoE", "HGRAD", 1))
        return out

    def define_functions(self, fm, fs):
        for v in ("rho", "rhoux", "rhouy", "rhouz", "rhoE"):
            fm.add_function(f"source {v}",
                            self._f(fs, f"source {v}", 0.0), "ip")

    def _mom_names(self):
        return ["rhoux", "rhouy", "rhouz"][:self.dim]

    def volume_residual(self, wk):
        dim = self.dim
        g = self.gamma
        rho = wk.sol("rho")
        rhoE = wk.sol("rhoE")
        mom = [wk.sol(m) for m in self._mom_names()]
        ke = 0.5 * sum(m * m for m in mom) / rho
        p0 = (g - 1.0) * (rhoE - ke)
        vel = [m / rho for m in mom]

        # continuity
        wk.add_source("rho", wk.sol_dot("rho") - wk.qp(wk.f("source rho")))
        wk.add_flux("rho", -jnp.stack(mom, axis=1))
        # momentum
        for d, name in enumerate(self._mom_names()):
            F = jnp.stack([mom[d] * vel[j] + (p0 if j == d else 0.0)
                           for j in range(dim)], axis=1)
            wk.add_source(name, wk.sol_dot(name)
                          - wk.qp(wk.f(f"source {name}")))
            wk.add_flux(name, -F)
        # energy
        FE = jnp.stack([(rhoE + p0) * vel[j] for j in range(dim)], axis=1)
        wk.add_source("rhoE", wk.sol_dot("rhoE")
                      - wk.qp(wk.f("source rhoE")))
        wk.add_flux("rhoE", -FE)


    def boundary_residual(self, wk):
        """Far-field (characteristic) and Slip boundary fluxes
        (reference: euler.cpp computeBoundaryTerm — the HDG trace form
        B(S_hat) = A+(S_hat)(S - S_hat) + A-(S_hat)(S_inf - S_hat);
        in this CG formulation the trace collapses to the interior
        state, giving the standard flux splitting
        F_hat.n = F(S).n + A-(S)(S_inf - S), which consumes the same
        eigendecomposition the reference unit-tests."""
        bct = wk.bcs.get("rho") or wk.bcs.get("rhoux")
        if bct not in ("Far-field", "Slip"):
            return
        dim = self.dim
        g = self.gamma
        names = ["rho"] + self._mom_names() + ["rhoE"]
        S = jnp.stack([wk.sol(v) for v in names], axis=1)   # (Qf, neq)
        n = wk.normals                                      # (Qf, dim)
        if bct == "Slip":
            rho = S[:, 0]
            mom = S[:, 1:1 + dim]
            rhoE = S[:, 1 + dim]
            p0 = (g - 1.0) * (rhoE
                              - 0.5 * jnp.sum(mom * mom, axis=1) / rho)
            # slip wall flux: zero normal mass/energy flux, pressure
            # normal force on momentum
            for d, name in enumerate(self._mom_names()):
                wk.add_source(name, p0 * n[:, d])
            return

        Sinf = jnp.stack(
            [jnp.broadcast_to(
                wk.qp(wk.f(f"Far-field {v} {wk.side_name}", "side ip")),
                S.shape[:1]) for v in names], axis=1)

        def fhat(s, nn, sinf):
            Fn = _flux_n(s, nn, g)
            L, lam, R = _eig_jnp(s, nn, g, dim)
            lam_m = 0.5 * (lam - jnp.abs(lam))
            corr = R @ (lam_m * (L @ (sinf - s)))
            return Fn + corr

        import jax
        tot = jax.vmap(fhat)(S, n, Sinf)                    # (Qf, neq)
        for i, v in enumerate(names):
            wk.add_source(v, tot[:, i])


def _flux_n(U, n, gamma):
    """Euler normal flux F(U).n at one state (traceable)."""
    dim = n.shape[0]
    rho = U[0]
    mom = U[1:1 + dim]
    rhoE = U[1 + dim]
    vel = mom / rho
    p0 = (gamma - 1.0) * (rhoE - 0.5 * jnp.dot(mom, mom) / rho)
    un = jnp.dot(vel, n)
    return jnp.concatenate([
        jnp.array([rho * un]), mom * un + p0 * n,
        jnp.array([(rhoE + p0) * un])])


def _eig_jnp(U, n, gamma, dim):
    """Traceable (L, lambda, R) of dF_n/dU (jnp twin of
    eigendecomp_flux_jacobian)."""
    rho = U[0]
    mom = U[1:1 + dim]
    rhoE = U[1 + dim]
    vel = mom / rho
    p0 = (gamma - 1.0) * (rhoE - 0.5 * jnp.dot(mom, mom) / rho)
    a = jnp.sqrt(gamma * p0 / rho)
    un = jnp.dot(vel, n)
    H = (rhoE + p0) / rho
    lam = jnp.concatenate([jnp.array([un - a]),
                           jnp.full((dim,), un),
                           jnp.array([un + a])])
    cols = [jnp.concatenate([jnp.array([1.0]), vel - a * n,
                             jnp.array([H - a * un])])]
    cols.append(jnp.concatenate([jnp.array([1.0]), vel,
                                 jnp.array([0.5 * jnp.dot(vel, vel)])]))
    if dim == 2:
        t = jnp.array([-n[1], n[0]])
        cols.append(jnp.concatenate([jnp.array([0.0]), t,
                                     jnp.array([jnp.dot(vel, t)])]))
    elif dim == 3:
        # robust tangent pair (smooth enough for BC use away from
        # axis-aligned degeneracies)
        ref = jnp.where(jnp.abs(n[0]) < 0.9,
                        jnp.array([1.0, 0.0, 0.0]),
                        jnp.array([0.0, 1.0, 0.0]))
        t1 = jnp.cross(n, ref)
        t1 = t1 / jnp.linalg.norm(t1)
        t2 = jnp.cross(n, t1)
        for t in (t1, t2):
            cols.append(jnp.concatenate(
                [jnp.array([0.0]), t, jnp.array([jnp.dot(vel, t)])]))
    cols.append(jnp.concatenate([jnp.array([1.0]), vel + a * n,
                                 jnp.array([H + a * un])]))
    R = jnp.stack(cols, axis=1)
    L = jnp.linalg.inv(R)
    return L, lam, R


def normal_flux_jacobian(state, n, gamma=1.4):
    """dF_n/dU for the Euler system; state = (rho, rhou..., rhoE).

    Works in 1/2/3 dimensions (reference: euler.hpp
    updateNormalFluxJacobian). Pure jnp; differentiable.
    """
    state = jnp.asarray(state)
    n = jnp.asarray(n)
    dim = n.shape[0]

    def flux_n(U):
        rho = U[0]
        mom = U[1:1 + dim]
        rhoE = U[1 + dim]
        vel = mom / rho
        p0 = (gamma - 1.0) * (rhoE - 0.5 * jnp.dot(mom, mom) / rho)
        un = jnp.dot(vel, n)
        F = jnp.concatenate([
            jnp.array([rho * un]),
            mom * un + p0 * n,
            jnp.array([(rhoE + p0) * un]),
        ])
        return F

    import jax
    return jax.jacfwd(flux_n)(state)


def eigendecomp_flux_jacobian(state, n, gamma=1.4):
    """(L, Lambda, R) with dF_n/dU = R diag(Lambda) L (reference:
    euler.hpp eigendecompFluxJacobian).

    Closed-form eigenvalues (un-a, un, ..., un+a); eigenvector matrices
    computed robustly from the analytic Jacobian so that R @ diag @ L
    reproduces it to machine precision.
    """
    state = np.asarray(state, dtype=float)
    n = np.asarray(n, dtype=float)
    dim = n.shape[0]
    rho = state[0]
    mom = state[1:1 + dim]
    rhoE = state[1 + dim]
    vel = mom / rho
    p0 = (gamma - 1.0) * (rhoE - 0.5 * np.dot(mom, mom) / rho)
    a = np.sqrt(gamma * p0 / rho)
    un = np.dot(vel, n)
    H = (rhoE + p0) / rho                      # total enthalpy
    lam = np.concatenate([[un - a], np.full(dim, un), [un + a]])

    # textbook Roe right eigenvectors in conservative variables:
    # acoustic (un -+ a), entropy (un), and dim-1 shear waves (un)
    cols = [np.concatenate([[1.0], vel - a * n, [H - a * un]])]
    cols.append(np.concatenate([[1.0], vel, [0.5 * np.dot(vel, vel)]]))
    if dim >= 2:
        if dim == 2:
            tangents = [np.array([-n[1], n[0]])]
        else:
            t1 = np.cross(n, [1.0, 0.0, 0.0])
            if np.linalg.norm(t1) < 1e-8:
                t1 = np.cross(n, [0.0, 1.0, 0.0])
            t1 /= np.linalg.norm(t1)
            t2 = np.cross(n, t1)
            tangents = [t1, t2]
        for t in tangents:
            cols.append(np.concatenate([[0.0], t, [np.dot(vel, t)]]))
    cols.append(np.concatenate([[1.0], vel + a * n, [H + a * un]]))
    R = np.stack(cols, axis=1)
    L = np.linalg.inv(R)
    return L, lam, R
