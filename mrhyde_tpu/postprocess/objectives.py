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
    save_sensor_data: bool = False
    output_type: str = ""                      # "" | "dft" | "fft"
    dft_num_freqs: int = 0
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
        # 'integrated control' carries its integrand under 'function'
        # (reference: postprocessManager.cpp:483 addFunction(name,
        # newobj.function)); 'integrated response' uses 'response'
        spec = cls(name=name, otype=otype,
                   weight=float(sub.get("weight", 1.0)),
                   target=float(sub.get("target", 0.0)),
                   response=sub.get("response", sub.get("function")),
                   regularizations=regs)
        if "sensor points" in sub:
            spec.sensor_points = np.atleast_2d(
                np.asarray(sub["sensor points"], dtype=float))
        if "sensor times" in sub:
            spec.sensor_times = np.asarray(sub["sensor times"], dtype=float)
        if "sensor data" in sub:
            spec.sensor_data = np.atleast_2d(
                np.asarray(sub["sensor data"], dtype=float))
        # sensors from FILES (reference: importSensorsFromFiles,
        # postprocessManager.cpp; one-file data layout from
        # data.cpp importDataOneFile: row 0 = times, row i = sensor i-1)
        if "sensor points file" in sub:
            spec.sensor_points = np.atleast_2d(
                np.loadtxt(str(sub["sensor points file"])))
        if "sensor data file" in sub:
            raw = np.loadtxt(str(sub["sensor data file"]), ndmin=2)
            spec.sensor_times = raw[0]
            spec.sensor_data = raw[1:]
        # sensors on a GRID (reference: importSensorsOnGrid — 3D only
        # there; any dim here)
        if "sensor grid Nx" in sub:
            axes = []
            for ax in "xyz":
                n = int(sub.get(f"sensor grid N{ax}", 0))
                if n <= 0:
                    break
                lo = float(sub.get(f"sensor grid {ax}min", 0.0))
                hi = float(sub.get(f"sensor grid {ax}max", 1.0))
                axes.append(np.linspace(lo, hi, n))
            grids = np.meshgrid(*axes, indexing="ij")
            spec.sensor_points = np.stack(
                [g.ravel() for g in grids], axis=1)
        spec.save_sensor_data = bool(sub.get("save sensor data", False))
        # DFT output of sensor time series (reference: 'output type'
        # dft/fft, postprocessTools.hpp:115-119 + fftInterface; the
        # reference's frequency loop uses integer-division frequencies
        # and is unpinned by any gold — the standard DFT is used here)
        spec.output_type = str(sub.get("output type", ""))
        spec.dft_num_freqs = int(sub.get("number of dft frequencies", 0))
        return spec


class ObjectiveManager:
    def __init__(self, disc, fm, specs: list[ObjectiveSpec], params=None,
                 datagen_solutions=None, n_ranks=4):
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
        # Virtual MPI ranks for 'integrated response' targets. The
        # reference squares the (local_response - target) misfit PER
        # RANK and sums across ranks (postprocessManager.cpp:1961-2033:
        # totaldiff[r] holds the rank-local integral, :2031-2032 applies
        # weight*(diff)^2 before the global REDUCE_SUM at :2417), so
        # under `mpiexec -n 4` — how every regression gold was made —
        # J = sum_r w*(R_r - T)^2 with the inline mesh split into 4
        # x-strips (meshInterface.cpp:54-55: Xprocs=comm size,
        # Yprocs=1). We reproduce that decomposition with virtual
        # ranks; set Postprocess "integrated response ranks": 1 for the
        # serial semantics.
        self.n_virtual_ranks = int(n_ranks)
        self._strip_masks = None

    def _strips(self, wts):
        """One-hot (R, E) masks assigning elements to virtual-rank
        x-strips (equal-width in x, matching the reference's inline
        Xprocs decomposition)."""
        if self._strip_masks is None:
            nr = int(self.n_virtual_ranks)
            ip = np.asarray(self.disc.ip)            # (E, Q, dim)
            cx = ip[:, :, 0].mean(axis=1)
            xmin, xmax = float(cx.min()), float(cx.max())
            if nr <= 1 or xmax - xmin < 1e-14:
                self._strip_masks = jnp.ones((1, cx.shape[0]))
            else:
                idx = np.minimum(
                    (nr * (cx - xmin) / (xmax - xmin + 1e-300))
                    .astype(int), nr - 1)
                masks = np.zeros((nr, cx.shape[0]))
                masks[idx, np.arange(cx.shape[0])] = 1.0
                self._strip_masks = jnp.asarray(masks)
        return self._strip_masks

    def sensor_responses(self, u, time, pvec=None) -> dict:
        """name -> (S,) response values at each sensor point (for
        'save sensor data' files; reference writes sensor.<name>.dat
        with row 0 = times, row i = sensor i-1's responses)."""
        params = dict(self.params)
        params.update(pvec or {})
        out = {}
        for s in self.specs:
            if s.otype != "sensors" or s.name not in self._sensor_setup:
                continue
            eids, refs = self._sensor_setup[s.name]
            ctx = PointFieldContext(self.disc, eids, refs,
                                    s.sensor_points, u, time, params,
                                    field_params=self.field_params)
            expr = s.response if s.response is not None else \
                f"{s.name} response"
            vals = self.fm.evaluate_expr(expr, ctx)
            out[s.name] = jnp.broadcast_to(vals, (eids.shape[0],))
        return out

    def save_sensor_files(self, history, outdir="."):
        """history: list of (time, {name: (S,) values}); writes
        sensor.<name>.dat per save-flagged spec."""
        import os
        for s in self.specs:
            if not (s.otype == "sensors" and s.save_sensor_data):
                continue
            times = [t for (t, resp) in history if s.name in resp]
            if not times:
                continue
            vals = np.stack([np.asarray(resp[s.name])
                             for (t, resp) in history
                             if s.name in resp], axis=1)   # (S, T)
            mat = np.concatenate([np.asarray(times)[None, :], vals],
                                 axis=0)
            np.savetxt(os.path.join(outdir, f"sensor.{s.name}.dat"),
                       mat)

    def sensor_dft(self, history, name) -> np.ndarray:
        """(S, Nfreq) complex DFT of one sensor objective's recorded
        time series: dft[s,k] = sum_j vals[s,j] exp(-2 pi i j k / N)."""
        spec = next(s for s in self.specs if s.name == name)
        vals = np.stack([np.asarray(resp[name]) for (t, resp) in history
                         if name in resp], axis=1)       # (S, T)
        N = spec.dft_num_freqs or vals.shape[1]
        j = np.arange(vals.shape[1])
        k = np.arange(N)
        W = np.exp(-2j * np.pi * np.outer(j, k) / N)     # (T, N)
        return vals @ W

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
                if s.otype == "integrated response":
                    # per-virtual-rank misfit (see _strips docstring)
                    per_elem = jnp.sum(vals * wts, axis=1)
                    integ_r = self._strips(wts) @ per_elem      # (R,)
                    total = total + s.weight * jnp.sum(
                        (integ_r - s.target) ** 2)
                else:
                    total = total + s.weight * jnp.sum(vals * wts)
            elif s.otype == "sensors":
                eids, refs = self._sensor_setup[s.name]
                ctx = PointFieldContext(self.disc, eids, refs,
                                        s.sensor_points, u, time,
                                        params,
                                        field_params=self.field_params)
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
                # reg.name holds the integrand EXPRESSION (reference
                # addFunction(reg.name, reg.function) — the name/expr
                # pair collapses under ad-hoc parsing)
                if reg.location == "volume":
                    ctx = GlobalFieldContext(self.disc, u, time, params,
                                             field_params=self.field_params)
                    vals = jnp.broadcast_to(
                        self.fm.evaluate_expr(reg.name, ctx, "ip"),
                        wts.shape)
                    total = total + reg.weight * jnp.sum(vals * wts)
                else:
                    for bg, fw in self._boundary_groups(reg.boundary_name):
                        ctx = _BoundaryRegContext(
                            self.disc, bg, time, params,
                            field_params=self.field_params)
                        vals = jnp.broadcast_to(
                            self.fm.evaluate_expr(reg.name, ctx,
                                                  "side ip"),
                            fw.shape)
                        total = total + reg.weight * jnp.sum(vals * fw)
        return total

    def _boundary_groups(self, name):
        for bg in self.disc.boundary_groups:
            if bg.sideset == name:
                yield bg, jnp.asarray(bg.wts)


class _BoundaryRegContext:
    """Leaf resolver on a boundary group: coords, params, and
    discretized-param values/gradients at the side qps (reference:
    boundary regularizations over traction fields, e.g.
    'grad(xtrac)[x]' in le/2d_sparse_simul_inversion)."""

    def __init__(self, disc, bg, time, params, field_params=None):
        self.bg = bg
        self.time = time
        self.params = params or {}
        self.field_params = field_params or {}

    def _fp_grad(self, var, ax):
        fp = self.field_params[var]
        bg = self.bg
        pe = jnp.asarray(self.params[var])[fp["eldofs"][bg.elems]]
        gph = jnp.asarray(bg.basis_grads[fp["key"]])
        return jnp.einsum("bi,biqd->bqd", pe, gph)[..., ax]

    def resolve(self, leaf):
        ax = {"x": 0, "y": 1, "z": 2}.get(leaf)
        if ax is not None and ax < self.bg.ip.shape[-1]:
            return jnp.asarray(self.bg.ip)[:, :, ax]
        if leaf == "t":
            return self.time
        if leaf in self.field_params and leaf in self.params:
            fp = self.field_params[leaf]
            pe = jnp.asarray(self.params[leaf])[
                fp["eldofs"][self.bg.elems]]
            phi = jnp.asarray(self.bg.basis_vals[fp["key"]])
            return jnp.einsum("bi,iq->bq", pe, phi)
        if leaf.startswith("grad(") and leaf.endswith("]") \
                and leaf[5:leaf.index(")")] in self.field_params:
            return self._fp_grad(leaf[5:leaf.index(")")],
                                 {"x": 0, "y": 1, "z": 2}[leaf[-2]])
        if leaf in self.params:
            return self.params[leaf]
        raise KeyError(f"cannot resolve {leaf!r} in boundary regularizer")
