"""Crystal (cubic anisotropic) elasticity with per-grain rotations.

Reference: src/physics/CrystalElasticity.cpp — cubic stiffness tensor
from (C11, C12, C44) with defaults derived from lambda/mu, rotated per
grain: C'_ijkl = R_ia R_jb R_kc R_ld C_abcd. Used by linearelasticity
when 'use crystal elasticity' is set; grain rotations come from the
microstructure generator or per-element data.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.physics.base import PhysicsModule
from mrhyde_tpu.physics.linearelasticity import _DISP
from mrhyde_tpu.physics.registry import register

__all__ = ["CrystalElasticity", "cubic_stiffness", "rotate_stiffness"]


def cubic_stiffness(c11, c12, c44, dim=3) -> np.ndarray:
    """C_ijkl tensor replicating the reference's fill order EXACTLY
    (CrystalElasticity.cpp:88-147), including its asymmetry: the c55
    block writes (0,2,0,0) instead of (0,2,2,0), and the c15 block
    later overwrites (0,2,0,0) — so C(0,2,2,0)=0 while the other
    minor-symmetric partners carry c55. Gold parity requires the quirk.
    """
    c13 = c23 = c12
    c22 = c33 = c11
    c55 = c66 = c44
    c15 = c25 = c35 = c46 = 0.0
    C = np.zeros((3, 3, 3, 3))
    C[0, 0, 0, 0] = c11
    C[1, 1, 1, 1] = c22
    C[2, 2, 2, 2] = c33
    C[0, 0, 1, 1] = C[1, 1, 0, 0] = c12
    C[0, 0, 2, 2] = C[2, 2, 0, 0] = c13
    C[1, 1, 2, 2] = C[2, 2, 1, 1] = c23
    C[0, 1, 0, 1] = C[1, 0, 1, 0] = c66
    C[0, 1, 1, 0] = C[1, 0, 0, 1] = c66
    C[2, 0, 2, 0] = C[0, 2, 0, 2] = c55
    C[2, 0, 0, 2] = c55
    C[0, 2, 0, 0] = c55          # reference writes this, not (0,2,2,0)
    C[2, 1, 2, 1] = C[1, 2, 1, 2] = c44
    C[1, 2, 2, 1] = C[2, 1, 1, 2] = c44
    C[0, 0, 0, 2] = C[0, 0, 2, 0] = c15
    C[0, 2, 0, 0] = C[2, 0, 0, 0] = c15   # overwrites the c55 write
    C[1, 1, 0, 2] = C[1, 1, 2, 0] = c25
    C[0, 2, 1, 1] = C[2, 0, 1, 1] = c25
    C[2, 2, 0, 2] = C[2, 2, 2, 0] = c35
    C[0, 2, 2, 2] = C[2, 0, 2, 2] = c35
    C[1, 2, 0, 1] = C[1, 2, 1, 0] = c46
    C[2, 1, 0, 1] = C[2, 1, 1, 0] = c46
    C[0, 1, 1, 2] = C[1, 0, 1, 2] = c46
    C[0, 1, 2, 1] = C[1, 0, 2, 1] = c46
    return C[:dim, :dim, :dim, :dim]


def rotate_stiffness(C: np.ndarray, R: np.ndarray) -> np.ndarray:
    """C'_ijkl = R_ia R_jb R_kc R_ld C_abcd."""
    return np.einsum("ia,jb,kc,ld,abcd->ijkl", R, R, R, R, C)


@register("crystal elasticity")
class CrystalElasticity(PhysicsModule):
    name = "crystalelasticity"

    def __init__(self, settings=None, dim: int = 2):
        super().__init__(settings, dim)
        # reference defaults (CrystalElasticity.cpp:22-50): E=1, nu=0.4
        # give lambda/mu, C11=2mu+lambda, C12=lambda, C44=2mu; read from
        # the 'Crystal elastic parameters' sublist when present
        s = dict(self.settings.get("Crystal elastic parameters", {})
                 or {})
        E = float(s.get("E", 1.0))
        nu = float(s.get("nu", 0.4))
        lam = (E * nu) / ((1.0 + nu) * (1.0 - 2.0 * nu))
        mu = E / (2.0 * (1.0 + nu))
        self.c11 = float(s.get("C11", 2.0 * mu + lam))
        self.c12 = float(s.get("C12", lam))
        self.c44 = float(s.get("C44", 2.0 * mu))
        self.C_ref = cubic_stiffness(self.c11, self.c12, self.c44, dim)
        # per-element rotation angles (radians about z in 2D); set by the
        # microstructure generator or data import
        self.grain_angles = None

    def variables(self):
        return [(d, "HGRAD", 1) for d in _DISP[:self.dim]]

    def define_functions(self, fm, fs):
        for d in _DISP[:self.dim]:
            fm.add_function(f"source {d}",
                            self._f(fs, f"source {d}", 0.0), "ip")

    def element_stiffness(self, n_elem: int) -> np.ndarray:
        """Per-element rotated stiffness (E, d, d, d, d)."""
        if self.grain_angles is None:
            return np.broadcast_to(self.C_ref,
                                   (n_elem,) + self.C_ref.shape).copy()
        out = np.zeros((n_elem,) + self.C_ref.shape)
        for e in range(n_elem):
            th = self.grain_angles[e]
            if self.dim == 2:
                R = np.array([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
            else:
                R = np.asarray(th).reshape(self.dim, self.dim)
            out[e] = rotate_stiffness(self.C_ref, R)
        return out

    def volume_residual(self, wk):
        dim = self.dim
        grads = [wk.grad(d)[:, :dim] for d in _DISP[:dim]]
        G = jnp.stack(grads, axis=1)
        eps = 0.5 * (G + jnp.swapaxes(G, 1, 2))        # (Q, d, d)
        # stiffness at qp: per-element C arrives through extra fields
        # (flattened) or falls back to the reference cubic tensor
        Cq = wk.extra_fields.get("crystal_C")
        if Cq is None:
            C = jnp.asarray(self.C_ref)
            sigma = jnp.einsum("ijkl,qkl->qij", C, eps)
        else:
            C = Cq.reshape((dim,) * 4)
            sigma = jnp.einsum("ijkl,qkl->qij", C, eps)
        for d, name in enumerate(_DISP[:dim]):
            wk.add_flux(name, sigma[:, d, :])
            wk.add_source(name, -wk.qp(wk.f(f"source {name}")))

    def boundary_residual(self, wk):
        # Neumann tractions (reference: linearelasticity.cpp
        # boundaryResidual, shared by the crystal variant)
        for name in _DISP[:self.dim]:
            if wk.bcs.get(name) == "Neumann":
                g = wk.f(f"Neumann {name} {wk.side_name}", "side ip")
                wk.add_source(name, -wk.qp(g))
