"""Verification error norms against manufactured ("True") solutions.

Reproduces PostprocessManager::computeError semantics (reference:
src/managers/postprocessManager.cpp:1168-1480, printing :1054-1140):

- 'var':           L2 volume norm of (u_h - true)
- 'grad(var)[d]':  combined L2 norm over the given gradient components
- 'var face':      L2-face norm accumulated over EVERY element side with
                   weight 0.5/facemeasure (postprocessManager.cpp:1467)
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.assembly.assembler import PointContext

__all__ = ["ErrorCalculator"]

_GRAD_RE = re.compile(r"^grad\((\w+)\)\[([xyz])\]$")
_CURL_RE = re.compile(r"^curl\((\w+)\)\[([xyz])\]$")
_COMP_RE = re.compile(r"^(\w+)\[([xyz])\]$")
_AX = {"x": 0, "y": 1, "z": 2}


class ErrorCalculator:
    def __init__(self, disc, fm, true_solutions: dict, params=None):
        self.disc = disc
        self.fm = fm
        self.params = params or {}
        self.l2_exprs = {}
        self.grad_exprs = {}     # var -> {axis: expr}
        self.comp_exprs = {}     # vector var -> {axis: expr}
        self.face_exprs = {}
        self.div_exprs = {}
        self.curl_exprs = {}
        for key, expr in (true_solutions or {}).items():
            m = _GRAD_RE.match(key.strip())
            mcu = _CURL_RE.match(key.strip())
            mc = _COMP_RE.match(key.strip())
            if m:
                self.grad_exprs.setdefault(m.group(1), {})[
                    _AX[m.group(2)]] = expr
            elif mcu:
                # 3D HCURL: per-component true curl (reference key
                # 'curl(var)[x]', postprocessManager.cpp:424-447)
                self.curl_exprs.setdefault(mcu.group(1), {})[
                    _AX[mcu.group(2)]] = expr
            elif mc:
                self.comp_exprs.setdefault(mc.group(1), {})[
                    _AX[mc.group(2)]] = expr
            elif key.endswith(" face"):
                self.face_exprs[key[:-5].strip()] = expr
            elif key.startswith("div(") and key.endswith(")"):
                self.div_exprs[key[4:-1]] = expr
            elif key.startswith("curl(") and key.endswith(")"):
                # 2D scalar curl
                self.curl_exprs.setdefault(key[5:-1], {})[None] = expr
            else:
                self.l2_exprs[key] = expr

    def compute(self, u, time=0.0) -> dict:
        """Returns {(kind, var): error} with kind in L2 / L2-grad / L2-face."""
        if not hasattr(self, "_compute_jit"):
            import jax
            self._compute_jit = jax.jit(self._compute)
        out = self._compute_jit(u, time)
        return {k: float(v) for k, v in out.items()}

    def _emit(self, out, kind, var, e2_per_elem):
        """Report the norm; multiblock meshes get one entry per
        element block (reference: per-block computeError, gold files
        repeat the line per block)."""
        bids = getattr(self.disc.mesh, "block_ids", None)
        if bids is None or len(getattr(self.disc.mesh, "block_names",
                                       [])) <= 1:
            out[(kind, var)] = jnp.sqrt(jnp.sum(e2_per_elem))
            return
        nb = len(self.disc.mesh.block_names)
        for b in range(nb):
            mask = jnp.asarray(np.asarray(bids) == b,
                               dtype=e2_per_elem.dtype)
            key = (kind, var) if b == 0 else (f"{kind}@{b}", var)
            out[key] = jnp.sqrt(jnp.sum(e2_per_elem * mask))

    def _compute(self, u, time) -> dict:
        disc = self.disc
        out = {}
        u_e = disc.dofmap.fold(
            u[jnp.asarray(disc.lids)])                # (E, nd_total)

        for var, comps in self.comp_exprs.items():
            if var not in disc.offsets:
                continue
            st, nd = disc.offsets[var]
            vv = jnp.asarray(disc.vec_vals[disc.basis_keys[var]])
            uh = jnp.einsum("ei,eiqd->eqd", u_e[:, st:st + nd], vv)
            ctx = PointContext(jnp.asarray(disc.ip), time, self.params)
            e2 = 0.0
            for ax, expr in comps.items():
                tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                       uh.shape[:2])
                e2 = e2 + jnp.sum(jnp.asarray(disc.wts)
                                  * (uh[:, :, ax] - tru) ** 2, axis=1)
            self._emit(out, "L2", var, e2)

        for var, expr in self.l2_exprs.items():
            if var not in disc.offsets:
                continue
            if disc.basis_keys[var][0] == "HFACE":
                continue   # trace vars have no volume norm (the
                #            reference only reports their face norm)
            st, nd = disc.offsets[var]
            key = disc.basis_keys[var]
            if key not in disc.basis_vals and key in disc.vec_vals \
                    and disc.vec_vals[key].shape[-1] == 1:
                # 1D HDIV: a scalar-valued flux (nodal line basis)
                vv = jnp.asarray(disc.vec_vals[key][..., 0])
                uh = jnp.einsum("ei,eiq->eq", u_e[:, st:st + nd], vv)
            else:
                phi = jnp.asarray(disc.basis_vals[key])
                uh = u_e[:, st:st + nd] @ phi          # (E, Q)
            ctx = PointContext(jnp.asarray(disc.ip), time, self.params)
            tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                   uh.shape)
            e2 = jnp.sum(jnp.asarray(disc.wts) * (uh - tru) ** 2,
                         axis=1)
            self._emit(out, "L2", var, e2)

        for var, comps in self.grad_exprs.items():
            if var not in disc.offsets:
                continue
            st, nd = disc.offsets[var]
            dphi = jnp.asarray(disc.basis_grads[disc.basis_keys[var]])
            duh = jnp.einsum("ei,eiqd->eqd", u_e[:, st:st + nd], dphi)
            ctx = PointContext(jnp.asarray(disc.ip), time, self.params)
            e2 = 0.0
            for ax, expr in comps.items():
                tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                       duh.shape[:2])
                e2 = e2 + jnp.sum(jnp.asarray(disc.wts)
                                  * (duh[:, :, ax] - tru) ** 2, axis=1)
            self._emit(out, "L2-grad", var, e2)

        for var, expr in self.div_exprs.items():
            if var not in disc.offsets:
                continue
            st, nd = disc.offsets[var]
            dv = jnp.asarray(disc.div_vals[disc.basis_keys[var]])
            uh = jnp.einsum("ei,eiq->eq", u_e[:, st:st + nd], dv)
            ctx = PointContext(jnp.asarray(disc.ip), time, self.params)
            tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                   uh.shape)
            e2 = jnp.sum(jnp.asarray(disc.wts) * (uh - tru) ** 2, axis=1)
            self._emit(out, "L2-div", var, e2)

        for var, comps in self.curl_exprs.items():
            if var not in disc.offsets:
                continue
            st, nd = disc.offsets[var]
            cv = jnp.asarray(disc.curl_vals[disc.basis_keys[var]])
            ctx = PointContext(jnp.asarray(disc.ip), time, self.params)
            e2 = 0.0
            if cv.ndim == 3:                      # 2D scalar curl
                uh = jnp.einsum("ei,eiq->eq", u_e[:, st:st + nd], cv)
                expr = comps.get(None) or next(iter(comps.values()))
                tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                       uh.shape)
                e2 = jnp.sum(jnp.asarray(disc.wts) * (uh - tru) ** 2,
                             axis=1)
            else:                                 # 3D: per-component sum
                uh = jnp.einsum("ei,eiqd->eqd", u_e[:, st:st + nd], cv)
                for ax, expr in comps.items():
                    if ax is None:
                        continue
                    tru = jnp.broadcast_to(
                        self.fm.evaluate_expr(expr, ctx), uh.shape[:2])
                    e2 = e2 + jnp.sum(jnp.asarray(disc.wts)
                                      * (uh[:, :, ax] - tru) ** 2, axis=1)
            self._emit(out, "L2-curl", var, e2)

        for var, expr in self.face_exprs.items():
            if var not in disc.offsets:
                continue
            st, nd = disc.offsets[var]
            e2 = 0.0
            for s in range(disc.topo.n_side):
                phi_f = jnp.asarray(disc.face_basis_vals[s][
                    disc.basis_keys[var]])               # (nd, Qf)
                fg = disc.faces[s]
                uh = u_e[:, st:st + nd] @ phi_f          # (E, Qf)
                ctx = PointContext(jnp.asarray(fg.ip), time, self.params)
                tru = jnp.broadcast_to(self.fm.evaluate_expr(expr, ctx),
                                       uh.shape)
                wts = jnp.asarray(fg.wts)                # (E, Qf)
                fmeas = jnp.sum(wts, axis=1, keepdims=True)
                e2 = e2 + jnp.sum(0.5 / fmeas * (uh - tru) ** 2 * wts,
                                  axis=1)
            self._emit(out, "L2-face", var, e2)

        return out

    @staticmethod
    def format_report(history) -> str:
        """history: list of (time, {(kind, var): err}) — reference style."""
        lines = ["*********************************************************",
                 "***** Computing errors ******", ""]
        for time, errs in history:
            for (kind, var), val in errs.items():
                kind = kind.split("@")[0]   # per-block entries repeat
                #                             the same label (gold style)
                if kind.startswith("Subgrid-L2"):
                    idx = kind.split(":")[1] if ":" in kind else "0"
                    label = (f"Subgrid {idx}: L2 norm of the error "
                             f"for {var}")
                else:
                    label = {
                        "L2": f"L2 norm of the error for {var}",
                        "L2-grad":
                            f"L2 norm of the error for grad({var})",
                        "L2-div":
                            f"L2 norm of the error for div({var})",
                        "L2-curl":
                            f"L2 norm of the error for curl({var})",
                        "L2-face":
                            f"L2-face norm of the error for {var}"}[kind]
                lines.append(f"***** {label} = {val:.6g}  (time = {time:g})")
        return "\n".join(lines)
