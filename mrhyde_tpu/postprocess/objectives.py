"""Objective functions: integrated / sensors / discrete + regularizers.

Semantics match the reference PostprocessManager::computeObjective
(reference: src/managers/postprocessManager.cpp:1834-2280):

- integrated response:  weight * (int_Omega response dOmega - target)^2
                        per evaluation time
- integrated control:   int_Omega control dOmega (accumulated)
- sensors:              sum_pt weight * (response(x_pt, t) - data)^2 at
                        times matching sensor_times (tol 1e-12)
- discrete control:     weight * ||u - d||_2^2 vs a stored datagen
                        solution at matching times
- regularizations:      + reg_weight * int regularizer (volume or
                        boundary sideset)

All evaluations are traced jnp expressions of (u, pvec), so
jax.grad provides dJ/du and dJ/dp — the reference's hand-assembled
computeObjectiveGradState / computeSensitivities fall out for free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.postprocess.fields import (GlobalFieldContext,
                                           PointFieldContext, locate_points)

__all__ = ["ObjectiveManager", "ObjectiveSpec", "RegularizationSpec"]


@dataclass
class RegularizationSpec:
    name: str                 # expression/function name
    rtype: str = "integrated"
    location: str = "volume"  # volume | boundary
    weight: float = 1.0
    boundary_name: str = ""


@dataclass
class ObjectiveSpec:
    name: str
    otype: str                 # integrated response|integrated control|
    #                            sensors|discrete control
    weight: float = 1.0
    target: float = 0.0
    response: str | None = None
    sensor_points: np.ndarray | None = None    # (S, dim)
    sensor_times: np.ndarray | None = None     # (T,)
    sensor_data: np.ndarray | None = None      # (S, T)
    regularizations: list = field(default_factory=list)

    @classmethod
    def from_config(cls, name, sub: dict):
        otype = sub.get("type", "integrated response")
        alias = {"integrated": "integrated response",
                 "sensor response": "sensors",
                 "pointwise response": "sensors"}
        otype = alias.get(otype, otype)
        regs = []
        for rname, rsub in (sub.get("Regularization functions", {})
                            or {}).items():
            regs.append(RegularizationSpec(
                name=rsub.get("function", rname),
                rtype=rsub.get("type", "integrated"),
                location=rsub.get("location", "volume"),
                weight=float(rsub.get("weight", 1.0)),
                boundary_name=rsub.get("boundary name", "")))
        spec = cls(name=name, otype=otype,
                   weight=float(sub.get("weight", 1.0)),
                   target=float(sub.get("target", 0.0)),
                   response=sub.get("response"),
                   regularizations=regs)
        if "sensor points" in sub:
            spec.sensor_points = np.atleast_2d(
                np.asarray(sub["sensor points"], dtype=float))
        if "sensor times" in sub:
            spec.sensor_times = np.asarray(sub["sensor times"], dtype=float)
        if "sensor data" in sub:
            spec.sensor_data = np.atleast_2d(
                np.asarray(sub["sensor data"], dtype=float))
        return spec


class ObjectiveManager:
    def __init__(self, disc, fm, specs: list[ObjectiveSpec], params=None,
                 datagen_solutions=None):
        self.disc = disc
        self.fm = fm
        self.specs = specs
        self.params = params or {}
        # discretized-parameter registry (set by Problem)
        self.field_params = {}
        # time -> solution vector, for discrete-control misfits
        self.datagen = datagen_solutions or {}
        self._sensor_setup = {}
        for s in specs:
            if s.otype == "sensors" and s.sensor_points is not None:
                eids, refs = locate_points(disc.mesh, s.sensor_points)
                self._sensor_setup[s.name] = (eids, refs)

    def value(self, u, time, pvec=None) -> jnp.ndarray:
        """Objective contribution at one evaluation time (traced)."""
        params = dict(self.params)
        params.update(pvec or {})
        total = jnp.asarray(0.0, dtype=u.dtype)
        wts = jnp.asarray(self.disc.wts)
        for s in self.specs:
            if s.otype in ("integrated response", "integrated control"):
                ctx = GlobalFieldContext(self.disc, u, time, params,
                                         field_params=self.field_params)
                expr = s.response if s.response is not None else \
                    f"{s.name} response"
                vals = self.fm.evaluate_expr(expr, ctx) \
                    if s.response is not None else \
                    self.fm.evaluate(expr, ctx, "ip")
                vals = jnp.broadcast_to(vals, wts.shape)
                integ = jnp.sum(vals * wts)
                if s.otype == "integrated response":
                    total = total + s.weight * (integ - s.target) ** 2
                else:
                    total = total + s.weight * integ
            elif s.otype == "sensors":
                eids, refs = self._sensor_setup[s.name]
                ctx = PointFieldContext(self.disc, eids, refs,
                                        s.sensor_points, u, time, params)
                expr = s.response if s.response is not None else \
                    f"{s.name} response"
                vals = self.fm.evaluate_expr(expr, ctx)
                vals = jnp.broadcast_to(vals, (eids.shape[0],))
                if s.sensor_times is not None and s.sensor_data is not None:
                    match = np.abs(s.sensor_times
                                   - float(time)) < 1e-12 \
                        if not hasattr(time, "aval") else None
                    if match is None:
                        # traced time: weight by indicator computed in jnp
                        ind = (jnp.abs(jnp.asarray(s.sensor_times) - time)
                               < 1e-12)
                        data = jnp.asarray(s.sensor_data)
                        diff2 = (vals[:, None] - data) ** 2 * ind[None, :]
                        total = total + s.weight * jnp.sum(diff2)
                    elif match.any():
                        ti = int(np.argmax(match))
                        data = jnp.asarray(s.sensor_data[:, ti])
                        total = total + s.weight * jnp.sum(
                            (vals - data) ** 2)
                else:
                    total = total + s.weight * jnp.sum(vals ** 2)
            elif s.otype == "discrete control":
                key = round(float(time), 12) \
                    if not hasattr(time, "aval") else None
                if key is not None and key in self.datagen:
                    d = self.datagen[key]
                    total = total + s.weight * jnp.sum((u - d) ** 2)
            # regularizations
            for reg in s.regularizations:
                if reg.location == "volume":
                    ctx = GlobalFieldContext(self.disc, u, time, params,
                                             field_params=self.field_params)
                    vals = jnp.broadcast_to(
                        self.fm.evaluate(reg.name, ctx, "ip"), wts.shape)
                    total = total + reg.weight * jnp.sum(vals * wts)
                else:
                    for bg, fw in self._boundary_groups(reg.boundary_name):
                        ctx = _BoundaryRegContext(self.disc, bg, time,
                                                  params)
                        vals = jnp.broadcast_to(
                            self.fm.evaluate(reg.name, ctx, "side ip"),
                            fw.shape)
                        total = total + reg.weight * jnp.sum(vals * fw)
        return total

    def _boundary_groups(self, name):
        for bg in self.disc.boundary_groups:
            if bg.sideset == name:
                yield bg, jnp.asarray(bg.wts)


class _BoundaryRegContext:
    """Leaf resolver on a boundary group (params/coords only for now)."""

    def __init__(self, disc, bg, time, params):
        self.bg = bg
        self.time = time
        self.params = params or {}

    def resolve(self, leaf):
        ax = {"x": 0, "y": 1, "z": 2}.get(leaf)
        if ax is not None and ax < self.bg.ip.shape[-1]:
            return jnp.asarray(self.bg.ip)[:, :, ax]
        if leaf == "t":
            return self.time
        if leaf in self.params:
            return self.params[leaf]
        raise KeyError(f"cannot resolve {leaf!r} in boundary regularizer")
