"""Peaceman well model for porous-media physics.

Reference: src/physics/wells.hpp — wells parsed from the physics
settings ('Wells' sublist: name -> type), each contributing a source
term q = WI * (p_bh - p) with the Peaceman well index
WI = 2 pi k h / (mu (ln(r_e / r_w))), r_e = 0.2 sqrt(hx hy).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["Wells"]


class Wells:
    def __init__(self, phys_settings: dict | None):
        self.wells = []
        for name, sub in ((phys_settings or {}).get("Wells", {})
                          or {}).items():
            if isinstance(sub, str):
                sub = {"type": sub}
            self.wells.append({
                "name": name,
                "type": sub.get("type", "production"),
                "location": np.asarray(sub.get("location", [0.5, 0.5]),
                                       dtype=float),
                "radius": float(sub.get("radius", 0.05)),
                "bottom hole pressure": float(
                    sub.get("bottom hole pressure", 1.0)),
                "rate": float(sub.get("rate", 0.0)),
            })

    def __bool__(self):
        return bool(self.wells)

    def add_sources(self, svals, wk, pvar="p", perm=1.0, visc=1.0):
        """Add Peaceman well sources at quadrature points.

        svals: current source values (Q,); returns updated values.
        Wells act within one element size h of their location.
        """
        if not self.wells:
            return svals
        # pressure only needed for BHP-driven wells (flow-rate wells —
        # reference wells.hpp:105-107 — add their rate directly, e.g.
        # under inc sat where no pressure variable exists)
        p = wk.sol(pvar) if any(
            w["type"] in ("production", "injection")
            for w in self.wells) else None
        h = wk.h
        for w in self.wells:
            loc = jnp.asarray(w["location"][:wk.dim])
            d2 = ((wk.ip - loc[None, :]) ** 2).sum(axis=1)
            near = jnp.exp(-d2 / (2.0 * (0.5 * h) ** 2))
            norm = near / (jnp.sum(near * wk.wts) + 1e-300)
            re = 0.2 * h
            WI = 2.0 * jnp.pi * perm / (visc *
                                        jnp.log(jnp.maximum(
                                            re / w["radius"], 1.0 + 1e-6)))
            if w["type"] in ("production", "injection"):
                q = WI * (w["bottom hole pressure"] - p)
            else:  # rate-controlled
                q = jnp.full_like(wk.wts, w["rate"])
            svals = svals + q * norm * jnp.sum(wk.wts)
        return svals
