"""Integrated quantities and flux responses.

Reference: PostprocessManager::addIntegratedQuantities / computeIntegratedQuantities
(postprocessManager.cpp:504-...) and physics-module IQ hooks
(e.g. thermal.cpp:422 setupIntegratedQuantities); flux responses
(:287, 'Flux responses' sublist) are boundary integrals of a weighted
flux over named sidesets.

Each quantity is (integrand expression, name, location) with location
'volume' or 'boundary'; boundary integrands may use n[x]/n[y]/n[z].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.postprocess.fields import GlobalFieldContext

__all__ = ["IntegratedQuantities", "BoundaryFieldContext"]

_AX = {"x": 0, "y": 1, "z": 2}


class BoundaryFieldContext:
    """Expression-leaf resolver on one boundary group (solution +
    normals + coordinates)."""

    def __init__(self, disc, bg, u, time=0.0, params=None):
        self.disc = disc
        self.bg = bg
        self.time = time
        self.params = params or {}
        lids = disc.lids[bg.elems]
        dm = disc.dofmap
        u_g = u[jnp.asarray(lids)]
        self._u_e = u_g * jnp.asarray(dm.signs[bg.elems], dtype=u.dtype)
        if dm.mix_pair is not None:   # tet HCURL >= 2 face-pair mixing
            self._u_e = self._u_e + \
                jnp.asarray(dm.mix_w[bg.elems], dtype=u.dtype) * \
                jnp.take_along_axis(
                    u_g, jnp.asarray(dm.mix_pair[bg.elems]), axis=1)
        self._cache = {}

    def resolve(self, leaf):
        disc = self.disc
        bg = self.bg
        if leaf in _AX and _AX[leaf] < disc.mesh.dim:
            return jnp.asarray(bg.ip)[:, :, _AX[leaf]]
        if leaf == "t":
            return self.time
        if leaf.startswith("n[") and leaf.endswith("]"):
            return jnp.asarray(bg.normals)[:, :, _AX[leaf[2]]]
        if leaf in disc.offsets:
            st, nd = disc.offsets[leaf]
            phi = jnp.asarray(bg.basis_vals[disc.basis_keys[leaf]])
            return self._u_e[:, st:st + nd] @ phi
        if leaf.startswith("grad(") and leaf.endswith("]"):
            var = leaf[5:leaf.index(")")]
            ax = _AX[leaf[-2]]
            st, nd = disc.offsets[var]
            dphi = jnp.asarray(bg.basis_grads[disc.basis_keys[var]])
            return jnp.einsum("ei,eiqd->eq", self._u_e[:, st:st + nd],
                              dphi[..., ax:ax + 1])[..., ]
        if leaf in self.params:
            return self.params[leaf]
        raise KeyError(f"cannot resolve {leaf!r} on boundary")


class IntegratedQuantities:
    def __init__(self, disc, fm, specs, params=None, sidesets=None):
        """specs: list of (integrand, name, location[, sideset])."""
        self.disc = disc
        self.fm = fm
        self.specs = list(specs)
        self.params = params or {}
        self.sidesets = sidesets    # optional restriction per spec

    @classmethod
    def from_problem(cls, problem, extra_config=None):
        specs = []
        for m in problem.modules:
            hook = getattr(m, "setup_integrated_quantities", None)
            if hook:
                specs.extend(hook(problem.mesh.dim))
        for name, sub in (extra_config or {}).items():
            specs.append((sub.get("integrand", "0.0"), name,
                          sub.get("location", "volume"),
                          sub.get("boundary names",
                                  sub.get("boundary name", None))))
        return cls(problem.disc, problem.fm, specs, problem.params)

    def compute(self, u, time=0.0, pvec=None) -> dict:
        params = dict(self.params)
        params.update(pvec or {})
        out = {}
        wts = jnp.asarray(self.disc.wts)
        for spec in self.specs:
            integrand, name, location = spec[0], spec[1], spec[2]
            restrict = spec[3] if len(spec) > 3 else None
            if location == "volume":
                ctx = GlobalFieldContext(self.disc, u, time, params)
                vals = jnp.broadcast_to(
                    self.fm.evaluate_expr(integrand, ctx), wts.shape)
                out[name] = float(jnp.sum(vals * wts))
            else:
                total = 0.0
                for bg in self.disc.boundary_groups:
                    if restrict and bg.sideset != restrict:
                        continue
                    ctx = BoundaryFieldContext(self.disc, bg, u, time,
                                               params)
                    w = jnp.asarray(bg.wts)
                    vals = jnp.broadcast_to(
                        self.fm.evaluate_expr(integrand, ctx), w.shape)
                    total += float(jnp.sum(vals * w))
                out[name] = total
        return out


def weighted_norm(u, weights=None, atol=1e-6, rtol=1e-6):
    """TN-style weighted norm of a solution vector (reference:
    'compute weighted norm')."""
    u = jnp.asarray(u)
    if weights is None:
        weights = 1.0 / (atol + rtol * jnp.abs(u))
    return float(jnp.sqrt(jnp.sum((weights * u) ** 2) / u.shape[0]))
