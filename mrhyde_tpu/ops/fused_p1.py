"""Generic fused Pallas assembly for p1 HGRAD physics on uniform
structured quad/hex meshes — multi-variable, 2D and 3D.

One `pallas_call` computes the element residual contributions AND the
full per-element Jacobian blocks for ANY physics module that exposes a
per-quadrature-point density `qp_density(q) -> {var: (S, F)}` with the
weak form  R_v = (S_v, phi) + (F_v, grad phi)  (thermal, CDR,
Navier-Stokes incl. SUPG/PSPG do). The reference's equivalent fast path
is the workset assembly over the compressed basis database
(assemblyManager.cpp:2356-2510 + buildDatabase :4249).

Jacobians are NOT hand-derived: inside the kernel the density function
is `jax.linearize`d at each qp and re-evaluated on one unit tangent per
(variable x {value, dot, grad_d}) slot; element Jacobian entries are
then scalar-coefficient combinations of those derivative tiles with the
static phi/grad tables:

  J[(v,c),(w,c')] += w_q * ( phi[c,q] * T[S_v][w,c']
                           + sum_d grad[c,q,d] * T[F_vd][w,c'] ),
  T[o][w,c'] = dD[o]/du_w   * alpha_u * phi[c',q]
             + dD[o]/dudot_w * alpha_t * phi[c',q]
             + sum_d dD[o]/dg_wd * alpha_u * grad[c',q,d]

which is exactly vmap(jacfwd(elem_residual)) evaluated in VMEM.

Layout: element grid tiles; the kernel DMAs its own (+1)-node halo
slabs per variable from HBM (node grids stacked (n_var, ...)), corner
gathers and qp coordinates are synthesized in VMEM, and outputs are SoA
(n_var*nc, tiles) residual parts + ((n_var*nc)^2, tiles) Jacobian
blocks. Everything stays in VMEM for the whole element loop — no HBM
round trips for intermediates, unlike the unfused XLA graph whose
jacfwd tangents materialize between ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedP1Assembly", "QpCtx"]


class QpCtx:
    """Per-qp physics context on (tile)-shaped values.

    Mirrors the Workset surface the volume weak forms consume:
    sol/sol_dot/grad/f plus the stabilization scalars (h, deltat,
    is_transient). grad(v) is a list of `dim` tiles.
    """

    def __init__(self, uq, udq, gq, coords, t, params, fm, h, deltat,
                 is_transient, dim):
        self._u, self._ud, self._g = uq, udq, gq
        self.coords = coords            # list of dim tiles (x, y[, z])
        self.t = t
        self.params = params or {}
        self.fm = fm
        self.h = h
        self.deltat = deltat
        self.is_transient = is_transient
        self.dim = dim

    def sol(self, v):
        return self._u[v]

    def sol_dot(self, v):
        return self._ud[v]

    def grad(self, v):
        return self._g[v]

    def qp(self, v):                    # workset-compat: identity here
        return v

    def f(self, name):
        # NO forced tile materialization: constant expressions stay
        # scalars so coefficient algebra (and the whole Jacobian for
        # constant-coefficient physics) folds to scalar ops at trace
        # time; `store()`/accumulators broadcast lazily
        return self.fm.evaluate(name, self)

    # FunctionManager leaf resolver
    def resolve(self, leaf):
        if leaf == "x":
            return self.coords[0]
        if leaf == "y":
            return self.coords[1]
        if leaf == "z":
            return self.coords[2]
        if leaf == "t":
            return self.t
        if leaf in self.params:
            return self.params[leaf]
        if leaf in self._u:             # nonlinear coefficient exprs
            return self._u[leaf]
        raise KeyError(f"fused kernel cannot resolve {leaf!r}")


class FusedP1Assembly:
    """Fused residual+Jacobian provider for qualifying problems.

    Qualifies when: uniform structured quad/hex mesh, all variables p1
    HGRAD, every physics module has qp_density, no active boundary
    groups (strong Dirichlet only), no multiscale, no field params.
    Use `FusedP1Assembly.build(asm)` -> instance or None.
    """

    def __init__(self, asm):
        self.asm = asm
        disc = asm.disc
        s = asm._structured
        self.dims = tuple(int(d) for d in s["dims"])
        self.dim = len(self.dims)
        self.corners = s["corners"]
        self.nc = len(self.corners)
        self.vars = [name for (_k, name, _st) in s["plan"]]
        self.starts = {name: st for (_k, name, st) in s["plan"]}
        self.n_var = len(self.vars)
        self.nd = self.n_var * self.nc

        mesh = disc.mesh
        bounds = mesh.box_info["bounds"]
        self.origin = [float(b[0]) for b in bounds]
        self.h_axes = [(float(b[1]) - float(b[0])) / int(b[2])
                       for b in bounds]
        ip0 = np.asarray(disc.ip[0])                   # (Q, dim)
        self.Q = ip0.shape[0]
        self.q_off = ip0 - np.asarray(self.origin)[None, :]
        self.wts = np.asarray(disc.wts[0] if np.ndim(disc.wts) > 1
                              else disc.wts)           # (Q,)
        key = disc.basis_keys[self.vars[0]]
        self.phi = np.asarray(disc.basis_vals[key])            # (nc, Q)
        self.grad = np.asarray(disc.basis_grads[key])[0]       # (nc,Q,dim)
        self.h_elem = float(np.sum(self.wts) ** (1.0 / self.dim))
        self.fm = asm.fm

    # ------------------------------------------------------------------

    @staticmethod
    def build(asm):
        s = asm._structured
        if s is None or any(k != "p1" for (k, _n, _st) in s["plan"]):
            return None
        if len(s["dims"]) not in (2, 3) or asm.has_signs:
            return None
        if asm.multiscale is not None or asm.field_params:
            return None
        if getattr(asm, "module_masks", None) is not None:
            return None
        if not all(hasattr(m, "qp_density") for m in asm.modules):
            return None
        if asm._active_bnd_groups():
            return None
        if not getattr(asm, "uniform", False):
            return None
        return FusedP1Assembly(asm)

    # ------------------------------------------------------------------

    def _tile_sizes(self, interpret):
        """(tiles, kdims): tile shape and the element grid padded up to
        tile multiples. Dims need NOT divide the tile — pad elements
        (zero node values, out-of-domain coords) are computed and their
        outputs sliced away at scatter time, so any mesh size
        qualifies; the pad overhead is bounded by one tile per axis."""
        dims = self.dims

        def pad_up(d, t):
            return -(-d // t) * t

        if interpret:
            tiles = tuple(min(d, 4) for d in dims)
            return tiles, tuple(pad_up(d, t) for d, t in
                                zip(dims, tiles))
        # VMEM budget: the kernel holds ~nd^2 Jacobian accumulator
        # tiles (plus T/D derivative tiles of similar total size), so
        # the tile element count must scale down as nd grows —
        # cap nd^2 * tile_elems * 4B at ~2 MB default (16 MB scoped
        # limit, shared with slabs and intermediates). MRHYDE_TILE /
        # MRHYDE_TILE_BUDGET_MB override for tile-size experiments
        # (each grid step pays a synchronous DMA wait, so fewer/larger
        # tiles may win — unvalidated on hardware).
        import os
        budget = (int(os.environ.get("MRHYDE_TILE_BUDGET_MB", "2"))
                  << 20) // 4
        if self.dim == 2:
            tj = 128
            ti0 = 64
            ov = os.environ.get("MRHYDE_TILE")
            if ov:
                ti0, tj = (int(x) for x in ov.split("x"))
            ti = ti0
            while ti > 1 and self.nd * self.nd * ti * tj > budget:
                ti //= 2
            if self.nd * self.nd * ti * tj > budget:
                return None
            tiles = (ti, tj)
        else:
            t0 = 4
            while t0 > 1 and self.nd * self.nd * t0 * 8 * 128 > budget:
                t0 //= 2
            ti = 8
            while ti > 1 and self.nd * self.nd * t0 * ti * 128 > budget:
                ti //= 2
            if self.nd * self.nd * t0 * ti * 128 > budget:
                return None
            tiles = (t0, ti, 128)
        return tiles, tuple(pad_up(d, t) for d, t in zip(dims, tiles))

    def available(self, interpret=False):
        return self._tile_sizes(interpret) is not None

    # ------------------------------------------------------------------

    def _density(self, uq, udq, gq, coords, t, params):
        """Evaluate all modules' qp densities; returns flat output list
        [S_v for v] + [F_{v,d} for v for d] (zeros where absent)."""
        ctx = QpCtx(uq, udq, gq, coords, t, params, self.fm,
                    self.h_elem, params.get("__deltat", 1.0),
                    self.asm.is_transient, self.dim)
        # None-accumulate: absent densities stay structural zeros all
        # the way through the sparse AD (scalar 0.0 at the boundary)
        S = {v: None for v in self.vars}
        F = {v: [None] * self.dim for v in self.vars}
        for m in self.asm.modules:
            out = m.qp_density(ctx)
            for v, (sv, fv) in out.items():
                S[v] = sv if S[v] is None else S[v] + sv
                if fv is not None:
                    for d in range(self.dim):
                        F[v][d] = fv[d] if F[v][d] is None \
                            else F[v][d] + fv[d]
        z = 0.0
        return [S[v] if S[v] is not None else z for v in self.vars] + \
               [F[v][d] if F[v][d] is not None else z
                for v in self.vars for d in range(self.dim)]

    def _kernel(self, tiles, dtype, pvec_names, steady=False):
        dim, nc, n_var, Q = self.dim, self.nc, self.n_var, self.Q
        nd = self.nd
        vars_, phi, grad, wts = self.vars, self.phi, self.grad, self.wts
        q_off, origin, h_axes = self.q_off, self.origin, self.h_axes
        corners = self.corners
        # DMA slab: majors +1, second-minor +8, minor +128
        slab = list(tiles)
        slab[-1] += 128
        if len(slab) >= 2:
            slab[-2] += 8
        for k in range(len(slab) - 2):
            slab[k] += 1
        slab = tuple(slab)
        tile_shape = tuple(tiles)
        # input slots per variable: (u[, udot], grad_d). The steady
        # specialization (trace-time-known alpha_u=1, alpha_t=0,
        # beta=0) drops the udot lane family AND 2 of 3 DMA slabs.
        n_in = n_var * ((1 if steady else 2) + dim)

        def kernel(scal_ref, *refs):
            if steady:
                u_ref, res_ref, jac_ref = refs
                bu_ref = bt_ref = None
            else:
                u_ref, bu_ref, bt_ref, res_ref, jac_ref = refs
            pids = [pl.program_id(a) * tiles[a] for a in range(dim)]

            def inner(su, sbu, sbt, sem):
                pairs = ((u_ref, su),) if steady else \
                    ((u_ref, su), (bu_ref, sbu), (bt_ref, sbt))
                for hbm, sv in pairs:
                    idx = tuple([slice(None)]
                                + [pl.ds(p, s) for p, s in
                                   zip(pids, slab)])
                    dma = pltpu.make_async_copy(hbm.at[idx], sv, sem)
                    dma.start()
                    dma.wait()
                alpha_u = 1.0 if steady else scal_ref[0]
                alpha_t = 0.0 if steady else scal_ref[1]
                t = scal_ref[2]
                deltat = scal_ref[3]
                params = dict(self.asm.params)
                params["__deltat"] = deltat
                for k, name in enumerate(pvec_names):
                    params[name] = scal_ref[4 + k]

                def corner_tile(svar, vi, off):
                    idx = tuple([vi] + [slice(o, o + s) for o, s in
                                        zip(off, tile_shape)])
                    return svar[idx]

                # stage-combined corner values per var
                ue = {}
                ud = {}
                for vi, v in enumerate(vars_):
                    ue[v] = []
                    ud[v] = []
                    for off in corners:
                        uc = corner_tile(su, vi, off)
                        if steady:
                            ue[v].append(uc)
                            ud[v].append(0.0)
                        else:
                            ue[v].append(alpha_u * uc
                                         + corner_tile(sbu, vi, off))
                            ud[v].append(alpha_t * uc
                                         + corner_tile(sbt, vi, off))

                iotas = [
                    (jax.lax.broadcasted_iota(jnp.int32, tile_shape, a)
                     + pids[a]).astype(dtype)
                    for a in range(dim)]

                # res/jac accumulate as None -> scalar -> tile: purely
                # scalar contributions (constant-coefficient physics)
                # never touch the VPU until the final broadcast store
                res = [None] * nd
                jac = [None] * (nd * nd)

                def acc2(a, b):
                    return b if a is None else a + b

                for q in range(Q):
                    coords = [origin[a] + iotas[a] * h_axes[a]
                              + q_off[q, a] for a in range(dim)]
                    uq, udq, gq = {}, {}, {}
                    for v in vars_:
                        uq[v] = sum(phi[c, q] * ue[v][c]
                                    for c in range(nc))
                        udq[v] = sum(phi[c, q] * ud[v][c]
                                     for c in range(nc))
                        gq[v] = [sum(grad[c, q, d] * ue[v][c]
                                     for c in range(nc))
                                 for d in range(dim)]

                    # flatten qp state for linearization; steady drops
                    # the udot slots (structurally zero)
                    off_g = n_var * (1 if steady else 2)

                    def unflat(z):
                        u_ = {v: z[i] for i, v in enumerate(vars_)}
                        if steady:
                            ud_ = {v: 0.0 for v in vars_}
                        else:
                            ud_ = {v: z[n_var + i]
                                   for i, v in enumerate(vars_)}
                        g_ = {v: [z[off_g + i * dim + d]
                                  for d in range(dim)]
                              for i, v in enumerate(vars_)}
                        return u_, ud_, g_

                    z0 = ([uq[v] for v in vars_]
                          + ([] if steady
                             else [udq[v] for v in vars_])
                          + [gq[v][d] for v in vars_
                             for d in range(dim)])

                    def f(z):
                        u_, ud_, g_ = unflat(z)
                        return self._density(u_, ud_, g_, coords, t,
                                             params)

                    # trace-time sparse forward AD: D[k][oi] is None
                    # where structurally zero and may be a SCALAR for
                    # constant coefficients (the SFad analog; see
                    # ops/sparse_fwd.py). Falls back to dense
                    # jax.linearize on unsupported primitives.
                    try:
                        from mrhyde_tpu.ops.sparse_fwd import (
                            SparseFwdUnsupported, sparse_jacfwd)
                        out0, D = sparse_jacfwd(f, z0)
                    except SparseFwdUnsupported:
                        out0, f_lin = jax.linearize(f, z0)
                        one = jnp.ones(tile_shape, dtype)
                        zero = jnp.zeros(tile_shape, dtype)
                        D = []
                        for k in range(n_in):
                            tz = [one if i == k else zero
                                  for i in range(n_in)]
                            D.append(f_lin(tz))

                    w = float(wts[q])
                    # residual accumulation
                    for vi, v in enumerate(vars_):
                        Sv = out0[vi]
                        Fv = [out0[n_var + vi * dim + d]
                              for d in range(dim)]
                        for c in range(nc):
                            a = phi[c, q] * Sv
                            for d in range(dim):
                                a = a + grad[c, q, d] * Fv[d]
                            res[vi * nc + c] = acc2(
                                res[vi * nc + c], w * a)

                    # T[o][w,c'] combos, then Jacobian accumulation;
                    # None entries (structural zeros) skip their whole
                    # multiply-accumulate chain at trace time
                    for wi in range(n_var):
                        for cp_ in range(nc):
                            # combined tangent coefficient for column
                            # (w, c'): du = au*phi, dud = at*phi,
                            # dg_d = au*grad_d
                            Tcol = [None] * (n_var * (1 + dim))
                            pc = phi[cp_, q]
                            for oi in range(n_var * (1 + dim)):
                                a = None
                                d1 = D[wi][oi]
                                if d1 is not None:
                                    a = acc2(a, alpha_u * pc * d1)
                                if not steady:
                                    d2 = D[n_var + wi][oi]
                                    if d2 is not None:
                                        a = acc2(a,
                                                 alpha_t * pc * d2)
                                for d in range(dim):
                                    d3 = D[off_g + wi * dim + d][oi]
                                    if d3 is not None:
                                        a = acc2(
                                            a, alpha_u
                                            * grad[cp_, q, d] * d3)
                                Tcol[oi] = a
                            for vi in range(n_var):
                                for c in range(nc):
                                    a = None
                                    if Tcol[vi] is not None:
                                        a = acc2(a, phi[c, q]
                                                 * Tcol[vi])
                                    for d in range(dim):
                                        tg = Tcol[n_var + vi * dim + d]
                                        if tg is not None:
                                            a = acc2(
                                                a, grad[c, q, d] * tg)
                                    if a is None:
                                        continue
                                    row = vi * nc + c
                                    col = wi * nc + cp_
                                    jac[row * nd + col] = acc2(
                                        jac[row * nd + col], w * a)

                def store(v):
                    if v is None:
                        return jnp.zeros(tile_shape, dtype)
                    return jnp.broadcast_to(
                        jnp.asarray(v, dtype), tile_shape)

                for k in range(nd):
                    res_ref[k] = store(res[k])
                for k in range(nd * nd):
                    jac_ref[k] = store(jac[k])

            if steady:
                pl.run_scoped(
                    lambda su, sem: inner(su, None, None, sem),
                    su=pltpu.VMEM((n_var,) + slab, dtype),
                    sem=pltpu.SemaphoreType.DMA(()),
                )
            else:
                pl.run_scoped(
                    inner,
                    su=pltpu.VMEM((n_var,) + slab, dtype),
                    sbu=pltpu.VMEM((n_var,) + slab, dtype),
                    sbt=pltpu.VMEM((n_var,) + slab, dtype),
                    sem=pltpu.SemaphoreType.DMA(()),
                )

        return kernel

    # ------------------------------------------------------------------

    def res_jac(self, u, tc, pvec=None, interpret=False):
        """(residual (n_dof,), jac blocks SoA (nd*nd,) + grid)."""
        asm = self.asm
        dims = self.dims
        tiles, kdims = self._tile_sizes(interpret)
        dtype = u.dtype
        pvec = {k: v for k, v in (pvec or {}).items()
                if jnp.ndim(v) == 0}
        names = sorted(pvec)
        scal = jnp.stack([jnp.asarray(v, dtype) for v in
                          (tc.alpha_u, tc.alpha_t, tc.time, tc.deltat,
                           *[pvec[k] for k in names])])

        grid_nodes = tuple(d + 1 for d in dims)
        ng = int(np.prod(grid_nodes))
        # stacked node grids, padded to the DMA slab granularity over
        # the tile-rounded element grid (kdims >= dims; pad elements
        # see zero node values and are discarded at scatter)
        pads = [k + 1 for k in kdims]
        pads[-1] = kdims[-1] + 128
        if len(pads) >= 2:
            pads[-2] = kdims[-2] + 8
        for k in range(len(pads) - 2):
            pads[k] = kdims[k] + 1

        def grids(vec):
            gs = []
            for v in self.vars:
                st = self.starts[v]
                g = vec[st:st + ng].reshape(grid_nodes)
                g = jnp.pad(g, [(0, p - gn) for p, gn in
                                zip(pads, grid_nodes)])
                gs.append(g)
            return jnp.stack(gs)

        # trace-time steady detection: when the TimeCoeffs leaves are
        # CONCRETE (built outside jit / closed over as constants) and
        # equal the steady() values, specialize the kernel — the udot
        # lane family and 2 of 3 input DMA slabs vanish entirely
        def _steady_check():
            try:
                # float()/bool() raise on tracers -> not specializable
                return (float(tc.alpha_t) == 0.0
                        and float(tc.alpha_u) == 1.0
                        and not bool(jnp.any(tc.beta_u))
                        and not bool(jnp.any(tc.beta_t)))
            except Exception:
                return False

        steady = _steady_check()

        gu = grids(u)
        nd = self.nd
        grid = tuple(k // t for k, t in zip(kdims, tiles))

        def omap(*pids):
            return (0,) + pids

        res_spec = pl.BlockSpec((nd,) + tiles, omap)
        jac_spec = pl.BlockSpec((nd * nd,) + tiles, omap)
        out_shape = [jax.ShapeDtypeStruct((nd,) + kdims, dtype),
                     jax.ShapeDtypeStruct((nd * nd,) + kdims, dtype)]
        hbm = pl.BlockSpec(memory_space=pl.ANY)
        if steady:
            res_out, jac_out = pl.pallas_call(
                self._kernel(tiles, dtype, names, steady=True),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), hbm],
                out_specs=[res_spec, jac_spec],
                out_shape=out_shape,
                interpret=interpret,
            )(scal, gu)
        else:
            gbu, gbt = grids(tc.beta_u), grids(tc.beta_t)
            res_out, jac_out = pl.pallas_call(
                self._kernel(tiles, dtype, names),
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          hbm, hbm, hbm],
                out_specs=[res_spec, jac_spec],
                out_shape=out_shape,
                interpret=interpret,
            )(scal, gu, gbu, gbt)

        # discard the tile-rounding pad elements
        real = tuple(slice(0, d) for d in dims)
        res_out = res_out[(slice(None),) + real]
        jac_out = jac_out[(slice(None),) + real]

        # node scatter: one pad-add per (var, corner)
        r = jnp.zeros(asm.n_dof, dtype=dtype)
        for vi, v in enumerate(self.vars):
            acc = jnp.zeros(grid_nodes, dtype=dtype)
            for c, off in enumerate(self.corners):
                sl = tuple(slice(o, o + d) for o, d in zip(off, dims))
                acc = acc.at[sl].add(res_out[vi * self.nc + c])
            st = self.starts[v]
            r = r.at[st:st + ng].set(acc.ravel())
        r = jnp.where(asm.fixed, 0.0, r)
        return r, jac_out

    def res_jac_blocks(self, u, tc, pvec=None, interpret=False):
        """(residual, jac blocks (E, nd, nd)) — AoS layout for the
        BlockJacobian contract. NOTE: rows/cols are in fused corner
        order (var-major, corners in structured-plan order), which
        matches the assembler's lids/offsets layout."""
        r, jac = self.res_jac(u, tc, pvec, interpret=interpret)
        E = int(np.prod(self.dims))
        nd = self.nd
        return r, jnp.moveaxis(jac.reshape(nd * nd, E), 0, 1) \
            .reshape(E, nd, nd)

    def jacobian(self, u, tc, pvec=None, interpret=False):
        from mrhyde_tpu.assembly.assembler import BlockJacobian
        r, jac = self.res_jac(u, tc, pvec, interpret=interpret)
        # hand the kernel's SoA layout straight to BlockJacobian — the
        # apply/diag hot paths consume it as-is; skipping the AoS
        # transpose saves a 2x jac-sized HBM round trip per assembly
        E = int(np.prod(self.dims))
        return r, BlockJacobian(vol=None, vol_lids=self.asm.lids,
                                bnd=[], bnd_lids=[],
                                fixed=self.asm.fixed, inc=self.asm.inc,
                                vol_soa=jac.reshape(self.nd * self.nd,
                                                    E))
