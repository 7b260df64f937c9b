"""Frequency-domain Maxwell via potentials (real/imag split).

Reference: src/physics/maxwells_fp.cpp — variables Arx,Aix,phir,phii
[,Ary,Aiy][,Arz,Aiz] (HGRAD components of the complex vector potential
A and scalar potential phi). The reference unrolls complex arithmetic
into real/imag pairs by hand; here the complex weak form is computed
directly and split:

  K_Ad(v)  = (1/mu)[(curl A) . curl(v e_d) + (div A) dv/dx_d]
             - w^2 eps A_d v - i w eps (dphi/dx_d v + phi dv/dx_d)
             - J_d v
  K_phi(q) = eps grad(phi) . grad(q) - w^2 eps^2 mu phi q
             - i w eps (div A q + A . grad q) - rho_c q

with the row mapping of the reference (shared real/imag basis):
  real row += Re(K) - Im(K),   imag row += Re(K) + Im(K).
"""

from __future__ import annotations

import jax.numpy as jnp

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.registry import register

__all__ = ["MaxwellsFP"]

# the 'test: 2' manufactured solution's coefficient/source functions,
# transcribed from the reference's hardcoded tables
# (maxwells_fp.cpp:820-965 getPermeability/getPermittivity/
# getInteriorCurrent/getInteriorCharge for test==2): complex
# permeability mu = (2+i)/(x^2+1), permittivity eps = (x^2+1)(1+i),
# A = (1,-1,2) sin(pi x) sin(pi y) sin(pi z), phi = same scalar shape
_TEST2_FNS = {
    "sx": "sin(pi*x)", "sy": "sin(pi*y)", "sz": "sin(pi*z)",
    "cx": "cos(pi*x)", "cy": "cos(pi*y)", "cz": "cos(pi*z)",
    "sss": "sx*sy*sz",
    "mur": "2.0/(x*x+1.0)", "mui": "1.0/(x*x+1.0)",
    "epsr": "x*x+1.0", "epsi": "x*x+1.0",
    "omega": "1.0",
    "Jxr": "(9*pi*pi*sss)/5 - 4*x*sss + (9*x*x*pi*pi*sss)/5 - "
           "(6*x*pi*cx*sy*sz)/5 + (6*x*pi*cy*sx*sz)/5 - "
           "(12*x*pi*cz*sx*sy)/5",
    "Jyr": "0.0-(3*pi*sz*(3*pi*sx*sy - 2*x*cx*sy - 2*x*cy*sx + "
           "3*x*x*pi*sx*sy))/5",
    "Jzr": "(6*pi*sy*(3*pi*sx*sz - 2*x*cx*sz + x*cz*sx + "
           "3*x*x*pi*sx*sz))/5",
    "Jxi": "(3*pi*pi*sss)/5 - 2*x*x*sss - 2*sss + "
           "(3*x*x*pi*pi*sss)/5 - (2*x*pi*cx*sy*sz)/5 + "
           "(2*x*pi*cy*sx*sz)/5 - (4*x*pi*cz*sx*sy)/5",
    "Jyi": "(3*sz*((10*sx*sy)/3 - pi*pi*sx*sy + (10*x*x*sx*sy)/3 - "
           "x*x*pi*pi*sx*sy + (2*x*pi*cx*sy)/3 + (2*x*pi*cy*sx)/3))/5",
    "Jzi": "0.0-(6*sy*((10*sx*sz)/3 - pi*pi*sx*sz + (10*x*x*sx*sz)/3 - "
           "x*x*pi*pi*sx*sz + (2*x*pi*cx*sz)/3 - (x*pi*cz*sx)/3))/5",
    "rhor": "2*sss*(3*x*x - 2*x + 3)",
    "rhoi": "0.0-2*sy*sz*(sx - 3*pi*pi*sx + x*x*sx - 3*x*x*pi*pi*sx + "
            "2*x*pi*cx)",
}


@register("maxwells_freq_pot")
class MaxwellsFP(PhysicsModule):
    name = "maxwells_fp"

    def variables(self):
        comps = "xyz"[:self.dim]
        out = []
        for c in comps:
            out += [(f"Ar{c}", "HGRAD", 1), (f"Ai{c}", "HGRAD", 1)]
        out += [("phir", "HGRAD", 1), ("phii", "HGRAD", 1)]
        return out

    def define_functions(self, fm, fs):
        if int(self.settings.get("test", 0) or 0) == 2 and self.dim == 3:
            # built-in manufactured coefficients (the reference's
            # getPermeability/... tables select on the 'test' flag)
            fs = {**_TEST2_FNS, **fs}
            for helper in ("sx", "sy", "sz", "cx", "cy", "cz", "sss"):
                if helper in fs:
                    fm.add_function(helper, fs[helper], "ip")
        for n, d in (("mur", 1.0), ("mui", 0.0), ("epsr", 1.0),
                     ("epsi", 0.0), ("omega", 1.0), ("rhor", 0.0),
                     ("rhoi", 0.0)):
            fm.add_function(n, self._f(fs, n, d), "ip")
        for c in "xyz":
            for p in ("r", "i"):
                fm.add_function(f"J{c}{p}",
                                self._f(fs, f"J{c}{p}", 0.0), "ip")

    def _add_complex(self, wk, var_r, var_i, source_vals, flux_vals):
        """Accumulate Re-Im / Re+Im of complex (source, flux) pairs."""
        for var, sgn in ((var_r, -1.0), (var_i, +1.0)):
            if source_vals is not None:
                wk.add_source(var, jnp.real(source_vals)
                              + sgn * jnp.imag(source_vals))
            if flux_vals is not None:
                wk.add_flux(var, jnp.real(flux_vals)
                            + sgn * jnp.imag(flux_vals))

    def volume_residual(self, wk):
        dim = self.dim
        comps = "xyz"[:dim]
        mu = wk.qp(wk.f("mur")) + 1j * wk.qp(wk.f("mui"))
        eps = wk.qp(wk.f("epsr")) + 1j * wk.qp(wk.f("epsi"))
        w = wk.qp(wk.f("omega"))
        rho_c = wk.qp(wk.f("rhor")) + 1j * wk.qp(wk.f("rhoi"))
        A = [wk.sol(f"Ar{c}") + 1j * wk.sol(f"Ai{c}") for c in comps]
        gA = [wk.grad(f"Ar{c}") + 1j * wk.grad(f"Ai{c}") for c in comps]
        phi = wk.sol("phir") + 1j * wk.sol("phii")
        gphi = wk.grad("phir") + 1j * wk.grad("phii")
        divA = sum(gA[d][:, d] for d in range(dim))
        J = [wk.qp(wk.f(f"J{c}r")) + 1j * wk.qp(wk.f(f"J{c}i"))
             for c in comps]

        if dim == 3:
            curlA = jnp.stack([gA[2][:, 1] - gA[1][:, 2],
                               gA[0][:, 2] - gA[2][:, 0],
                               gA[1][:, 0] - gA[0][:, 1]], axis=1)
        elif dim == 2:
            cz = gA[1][:, 0] - gA[0][:, 1]
            curlA = cz                       # scalar z-curl
        else:
            curlA = None

        invmu = 1.0 / mu
        for d, c in enumerate(comps):
            # flux = weak partner of grad(v e_d): curl-curl + gauge
            if dim == 3:
                # (curl A).curl(v e_d) expressed against grad(v):
                # e.g. curl(v e_x) = (0, dv/dz, -dv/dy)
                if d == 0:
                    fx = jnp.stack([jnp.zeros_like(curlA[:, 0]),
                                    -curlA[:, 2], curlA[:, 1]], axis=1)
                elif d == 1:
                    fx = jnp.stack([curlA[:, 2],
                                    jnp.zeros_like(curlA[:, 0]),
                                    -curlA[:, 0]], axis=1)
                else:
                    fx = jnp.stack([-curlA[:, 1], curlA[:, 0],
                                    jnp.zeros_like(curlA[:, 0])], axis=1)
                flux = invmu[:, None] * fx
            else:
                # 2D: curl(v e_x) = dv/dy * (-1)_z etc.
                if d == 0:
                    flux = jnp.stack([jnp.zeros_like(curlA),
                                      -invmu * curlA], axis=1)
                else:
                    flux = jnp.stack([invmu * curlA,
                                      jnp.zeros_like(curlA)], axis=1)
            # gauge term (1/mu) div A * dv/dx_d
            flux = flux.at[:, d].add(invmu * divA)
            # phi coupling in the flux: -i w eps phi dv/dx_d
            # (reference rows map to Re-Im / Re+Im of -i w eps P,
            # maxwells_fp.cpp:310-316 — note the MINUS)
            flux = flux.at[:, d].add(-1j * w * eps * phi)
            src = (-w * w * eps * A[d] - 1j * w * eps * gphi[:, d]
                   - J[d])
            self._add_complex(wk, f"Ar{c}", f"Ai{c}", src, flux)

        # scalar potential equation (Lorenz gauge)
        flux_phi = eps[:, None] * gphi \
            - (1j * w * eps)[:, None] * jnp.stack(A, axis=1)
        src_phi = (-w * w * eps * eps * mu * phi - 1j * w * eps * divA
                   - rho_c)
        self._add_complex(wk, "phir", "phii", src_phi, flux_phi)
