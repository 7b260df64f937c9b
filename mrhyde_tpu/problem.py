"""Problem: wires config -> mesh -> physics -> assembly -> solve -> report.

The TPU-native equivalent of the reference driver + manager construction
sequence (reference: src/driver.cpp:62-212) and the forward paths of
SolverManager (solverManager.cpp:1107 forwardModel, :1156 steadySolver,
:1229 transientSolver) and AnalysisManager (analysisManager.cpp:62-95).

The configuration is a nested dict with the same sublists as the
reference input deck: Mesh, Physics, Functions, Discretization, Solver,
Analysis, Postprocess, Parameters (SURVEY.md Appendix A).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import os

import jax
import jax.numpy as jnp
import numpy as np

from mrhyde_tpu.assembly.assembler import Assembler, TimeCoeffs
from mrhyde_tpu.assembly.discretization import Discretization
from mrhyde_tpu.functions.manager import FunctionManager
from mrhyde_tpu.mesh.structured import box_mesh
from mrhyde_tpu.physics.registry import import_physics
from mrhyde_tpu.postprocess.errors import ErrorCalculator
from mrhyde_tpu.solvers.bcs import BoundaryConditions
from mrhyde_tpu.solvers.linear import solve_linear
from mrhyde_tpu.solvers.nonlinear import newton_solve
from mrhyde_tpu.solvers.time_integration import TransientIntegrator

__all__ = ["Problem", "ForwardResult", "make_problem"]


def make_problem(cfg: dict):
    """Problem factory: multi-set decks get a MultiSetProblem."""
    phys = cfg.get("Physics", {}) or {}
    if "physics set names" in phys:
        from mrhyde_tpu.multiset import MultiSetProblem
        return MultiSetProblem(cfg)
    return Problem(cfg)


@dataclass
class ForwardResult:
    u: object
    time: float
    error_history: list = field(default_factory=list)
    solution_history: list = field(default_factory=list)

    @property
    def errors(self):
        """Errors at the final recorded time."""
        return self.error_history[-1][1] if self.error_history else {}

    def report(self) -> str:
        return ErrorCalculator.format_report(self.error_history)


class Problem:
    def __init__(self, cfg: dict, mesh=None):
        self.cfg = cfg
        mesh_cfg = cfg.get("Mesh", {})
        dim = int(mesh_cfg.get("dimension", 2))
        cell = mesh_cfg.get("element type",
                            mesh_cfg.get("shape", "quad"))
        cell = {"interval": "line", "quadrilateral": "quad",
                "triangle": "tri", "hexahedron": "hex",
                "tetrahedron": "tet"}.get(cell, cell)
        if dim == 1:
            cell = "line"
        if mesh is not None:
            self.mesh = mesh
        elif str(mesh_cfg.get("source",
                              mesh_cfg.get("Source",
                                           "Internal"))).lower() \
                == "exodus":
            from mrhyde_tpu.mesh.exodus import read_exodus
            path = mesh_cfg.get("mesh file", "mesh.exo")
            if not os.path.isabs(path):
                path = os.path.join(cfg.get("_deck_dir", "."), path)
            self.mesh, minfo = read_exodus(path)
            self.mesh_elem_vars = minfo.get("elem_vars", {})
        else:
            self.mesh = self._internal_mesh(mesh_cfg, cell)
        pbc = mesh_cfg.get("Periodic BCs", {}) or {}
        conds = [v for k, v in pbc.items()
                 if str(k).lower().startswith("periodic condition")]
        if conds:
            from mrhyde_tpu.mesh.structured import apply_periodic
            self.mesh = apply_periodic(self.mesh, conds)

        raw_phys = cfg.get("Physics", {}) or {}
        phys_cfg = _unwrap_block(raw_phys, "modules")
        self.phys_cfg = phys_cfg
        # per-block physics assignment (reference:
        # physicsInterface.cpp:38-54 — each element block owns its own
        # module list): multiple eblock sublists with distinct modules
        block_sub = {k: v for k, v in raw_phys.items()
                     if isinstance(v, dict) and "modules" in v}
        bnames = list(getattr(self.mesh, "block_names", []))
        self._module_block = None
        if (len(block_sub) > 1
                and all(k in bnames for k in block_sub)
                and len({str(v.get("modules")) for v in
                         block_sub.values()}) > 1):
            self.modules = []
            self._module_block = []
            for bi, bn in enumerate(bnames):
                sub = block_sub.get(bn)
                if sub is None:
                    continue
                merged = {k2: v2 for k2, v2 in raw_phys.items()
                          if not isinstance(v2, dict)
                          or "modules" not in v2}
                merged.update(sub)
                for m in import_physics(sub.get("modules", ""),
                                        merged, dim):
                    self.modules.append(m)
                    self._module_block.append(bi)
        else:
            self.modules = import_physics(phys_cfg.get("modules", ""),
                                          phys_cfg, dim)

        # variables + orders
        disc_cfg = _unwrap_block(cfg.get("Discretization", {}), "order")
        orders = disc_cfg.get("order", {}) or {}
        # 'Active variables' overrides a module variable's space (e.g.
        # HFACE macro traces in multiscale decks; reference:
        # physicsInterface reads "Active variables" per block)
        active = phys_cfg.get("Active variables", {}) or {}
        variables = []
        _seen = set()
        for m in self.modules:
            for (name, space, default_order) in m.variables():
                if name in _seen:
                    continue
                _seen.add(name)
                if active and name not in active:
                    # 'Active variables' RESTRICTS the variable list
                    # (reference: porousMixed.cpp:21-30 — only listed
                    # vars are registered when the sublist exists)
                    continue
                space = active.get(name, space)
                order = int(orders.get(name, default_order))
                if space == "HVOL":
                    # the reference's HVOL is ALWAYS piecewise constant
                    # (discretizationInterface.cpp:375: HVOL_C0
                    # regardless of the deck's order); higher-order
                    # broken pressures are requested explicitly via
                    # 'Active variables: {p: HGRAD-DG}'
                    order = 0
                if space in ("HVOL", "HFACE"):
                    variables.append((name, space, max(order, 0)))
                else:
                    variables.append((name, space, max(order, 1)))
        # 'Extra variables' (e.g. macro trace vars in multiscale decks)
        extra_vars = phys_cfg.get("Extra variables", {}) or {}
        extra_orders = orders.get("Extra variables", {}) or {}
        for name, space in extra_vars.items():
            order = int(extra_orders.get(name, orders.get(name, 1)))
            variables.append((name, space, order))
        if not variables:
            raise ValueError(
                "no variables: the Physics sublist needs 'modules' "
                "(or 'Extra variables' / 'physics set names')")
        self.variables = variables

        # functions; per-block sublists ({'material_0': {...}}) flatten,
        # later blocks overriding (reference registers one function
        # manager per block — thermal/3D-Multiblock)
        self.fm = FunctionManager()
        fs_raw = cfg.get("Functions", {}) or {}
        fs = {}
        for name, expr in fs_raw.items():
            if isinstance(expr, dict):
                for k, v in expr.items():
                    if k in fs and str(fs[k]) != str(v):
                        # the reference keeps one function manager PER
                        # BLOCK; a single traced manager cannot hold
                        # two definitions — fail loudly instead of
                        # silently applying the last block's expression
                        # everywhere
                        raise NotImplementedError(
                            f"per-block Functions define {k!r} "
                            f"differently across blocks "
                            f"({fs[k]!r} vs {v!r}); per-block "
                            f"function expressions are not supported "
                            f"in one physics set")
                fs.update(expr)
            else:
                fs[name] = expr
        for name, expr in fs.items():
            self.fm.add_function(name, expr, "ip")
            self.fm.add_function(name, expr, "side ip")
        for m in self.modules:
            m.define_functions(self.fm, fs)

        # parameters: full taxonomy in the ParameterManager; the flat
        # dict feeds expression-leaf resolution
        from mrhyde_tpu.analysis.parameters import ParameterManager
        self.param_manager = ParameterManager(cfg.get("Parameters"))
        self.params = self.param_manager.all_values()

        qdeg = disc_cfg.get("quadrature")
        sqdeg = disc_cfg.get("side quadrature")
        self.disc = Discretization(self.mesh, variables,
                                   None if qdeg is None else int(qdeg),
                                   None if sqdeg is None else int(sqdeg))

        use_weak = bool(phys_cfg.get("use weak Dirichlet", False))
        self.bcs = BoundaryConditions.from_config(
            self.disc, self.fm, phys_cfg, self.params,
            use_weak_dirichlet=use_weak)

        # 'assemble face terms' (reference: physicsInterface reads
        # "assemble face terms"/"build face terms" per set/block and
        # assemblyManager.cpp:2414-2425 runs the per-side faceResidual
        # sweep); default: on iff a module defines face terms
        aft = phys_cfg.get("assemble face terms",
                           phys_cfg.get("build face terms"))
        self.assembler = Assembler(self.disc, self.modules, self.fm,
                                   self.params,
                                   fixed_dofs=self.bcs.fixed_dofs,
                                   assemble_face_terms=aft)
        data_tag = str(mesh_cfg.get("data file", "none"))
        if data_tag != "none":
            # mesh element data import (reference: importMeshData,
            # assemblyManager.cpp:8235 — element centers take the value
            # of the CLOSEST data point; physics read column 0 as
            # wkset extra_data, e.g. porousMixed updatePerm)
            base = cfg.get("_deck_dir", ".")
            pts_tag = str(mesh_cfg.get("data points file",
                                       "mesh_data_pts"))
            pts = np.loadtxt(os.path.join(base, pts_tag + ".dat"),
                             ndmin=2)
            vals = np.loadtxt(os.path.join(base, data_tag + ".dat"),
                              ndmin=2)
            from mrhyde_tpu.native import nearest_point
            cents = self.mesh.nodes[self.mesh.conn].mean(axis=1)
            nearest = nearest_point(pts[:, :dim], cents)
            if mesh_cfg.get("have mesh data rotations", False):
                # 9 columns per data point = a grain rotation matrix;
                # rotate each crystal-elasticity stiffness tensor per
                # element (reference: meshInterface 'have mesh data
                # rotations' -> wkset->rotation,
                # CrystalElasticity.cpp:412-450 updateRotatedTensor)
                from mrhyde_tpu.physics.crystal_elasticity import (
                    CrystalElasticity)
                R = vals[nearest].reshape(-1, 3, 3)[:, :dim, :dim]
                for m in self.modules:
                    if isinstance(m, CrystalElasticity):
                        Ce = np.einsum("eia,ejb,ekc,eld,abcd->eijkl",
                                       R, R, R, R, m.C_ref)
                        self.assembler.extra_elem_fields["crystal_C"] \
                            = jnp.asarray(Ce.reshape(Ce.shape[0], -1))
            else:
                self.assembler.extra_elem_fields["mesh_data"] = \
                    jnp.asarray(vals[nearest, 0])
        if self._module_block is not None:
            bids = np.asarray(self.mesh.block_ids)
            masks = np.stack(
                [(bids == b).astype(float) for b in self._module_block],
                axis=1)
            self.assembler.set_module_masks(masks)
        self.assembler.var_bcs = self.bcs.var_bcs
        self.assembler.is_transient = (
            cfg.get("Solver", {}).get("solver") == "transient")

        pp_cfg = _unwrap_block(cfg.get("Postprocess", {}) or {},
                               "True solutions")
        self.compute_errors = bool(pp_cfg.get("compute errors", False))
        self.error_calc = ErrorCalculator(
            self.disc, self.fm, pp_cfg.get("True solutions", {}) or {},
            self.params)

        self.write_solution = bool(pp_cfg.get("write solution", False))
        self.output_file = pp_cfg.get("output file", "output")
        self.extra_cell_fields = pp_cfg.get("Extra cell fields", {}) or {}
        self.solution_writer = None
        if self.write_solution:
            from mrhyde_tpu.postprocess.writer import SolutionWriter
            self.solution_writer = SolutionWriter(
                self, self.output_file, self.extra_cell_fields)

        from mrhyde_tpu.postprocess.storage import SolutionStorage
        sc0 = cfg.get("Solver", {}) or {}
        self.solution_storage = SolutionStorage(
            max_storage=int(sc0.get("maximum storage", 100)),
            time_tol=float(sc0.get("storage time tol", 1e-10)))

        self.objective_manager = None
        obj_cfg = self._resolve_mesh_sensors(
            pp_cfg.get("Objective functions", {}) or {})
        if not obj_cfg and bool(pp_cfg.get("compute objective", False)):
            # legacy Physics-level Responses/Targets/Weights objective
            # (old 'response type: global' decks, e.g.
            # thermal/2d_gradient_check_ms): J = sum_r int 0.5 wt
            # (resp - targ)^2; entries zip in declaration order
            resps = phys_cfg.get("Responses", {}) or {}
            targs = list((phys_cfg.get("Targets", {}) or {}).values())
            wghts = list((phys_cfg.get("Weights", {}) or {}).values())
            for i, (rn, rexpr) in enumerate(resps.items()):
                tg = targs[i] if i < len(targs) else "0.0"
                w = wghts[i] if i < len(wghts) else "1.0"
                obj_cfg[rn] = {
                    "type": "integrated control",
                    "function": (f"0.5*({w})*(({rexpr})-({tg}))"
                                 f"*(({rexpr})-({tg}))")}
        if obj_cfg:
            from mrhyde_tpu.postprocess.objectives import (ObjectiveManager,
                                                           ObjectiveSpec)
            specs = [ObjectiveSpec.from_config(name, sub)
                     for name, sub in obj_cfg.items()]
            self.objective_manager = ObjectiveManager(
                self.disc, self.fm, specs, self.params,
                n_ranks=pp_cfg.get("integrated response ranks", 4))

        self.solver_cfg = cfg.get("Solver", {}) or {}
        # deck-level DOF sharding (Solver: shards / CLI --shards /
        # MRHYDE_SHARDS): route Newton solves through the SPMD path
        # (parallel/deck_sharded.py) — the mpiexec -n N analog
        import os as _os
        self.shards = int(self.solver_cfg.get(
            "shards", _os.environ.get("MRHYDE_SHARDS", 0)) or 0)
        self._sharded_newton = None

        self.integrated_quantities = None
        if pp_cfg.get("compute integrated quantities", False):
            from mrhyde_tpu.postprocess.quantities import \
                IntegratedQuantities
            self.integrated_quantities = IntegratedQuantities.from_problem(
                self, pp_cfg.get("Integrated quantities", {}) or {})

        # discretized (field) parameters: own dof maps on this mesh
        # (reference: parameterManager.cpp:272 setupDiscretizedParameters)
        for name in self.param_manager.discretized_names():
            s = self.param_manager.specs[name]
            from mrhyde_tpu.fem.basis import get_basis
            from mrhyde_tpu.fem.dofmap import build_dofmap
            dm = build_dofmap(self.mesh, [(name, s.basis, s.order)])
            b = get_basis(self.mesh.cell_type, s.basis, s.order)
            key = (str(s.basis).upper(), int(s.order))
            if key in self.disc.basis_grads:
                gphi = self.disc.basis_grads[key]
            else:
                from mrhyde_tpu.fem.geometry import (physical_grad,
                                                     volume_geometry)
                vol = volume_geometry(
                    self.mesh.nodes[self.mesh.conn],
                    self.mesh.cell_type, self.disc.ref_pts,
                    self.disc.ref_wts)
                gphi = physical_grad(b, self.disc.ref_pts, vol.jac_inv)
            self.assembler.field_params[name] = {
                "eldofs": jnp.asarray(dm.vars[0].eldofs),
                "phi": jnp.asarray(b.eval(self.disc.ref_pts)),
                "gphi": jnp.asarray(gphi),
                "key": key,
                "dof_coords": dm.vars[0].dof_coords,
                "n_dof": dm.vars[0].n_dof,
            }
            val = np.asarray(s.value, dtype=float)
            if val.size != dm.vars[0].n_dof:
                s.value = np.full(dm.vars[0].n_dof, float(val.flat[0]))
            if s.dynamic:
                # one field per time step (reference: dynamic_Psol,
                # parameterManager.cpp:620-632); the step count follows
                # the same delta-t/number-of-steps logic as the
                # transient driver
                sc_ = cfg.get("Solver", {}) or {}
                t0 = float(sc_.get("initial time", 0.0))
                t_end = float(sc_.get("final time", 1.0))
                dts = sc_.get("delta t")
                if dts is not None:
                    nst = max(int(round((t_end - t0) / float(dts))), 1)
                else:
                    nst = int(sc_.get("number of steps", 1))
                v = np.atleast_1d(np.asarray(s.value, dtype=float))
                if v.ndim == 1:
                    s.value = np.tile(v[None, :], (nst, 1))
        if self.objective_manager is not None:
            self.objective_manager.field_params = \
                self.assembler.field_params

        # multiscale subgrid models
        self.multiscale = None
        if cfg.get("Subgrid"):
            from mrhyde_tpu.multiscale.subgrid import (SubgridDtN,
                                                       MultiscaleModels)
            sub = cfg["Subgrid"].get("Subgrid", cfg["Subgrid"])
            if "Mesh" in sub:
                self.multiscale = SubgridDtN(self, sub)
            else:
                # several model sublists with usage expressions
                self.multiscale = MultiscaleModels(self, sub)
            self.assembler.multiscale = self.multiscale
            # every macro element gets a subgrid model (reference:
            # assemblyManager.cpp:8101-8108 winner defaults even with
            # zero votes) -> the upscaled flux REPLACES macro volume
            # physics everywhere
            self.assembler.volume_off = True

    # ------------------------------------------------------------------

    @staticmethod
    def _internal_mesh(mesh_cfg, cell):
        # NX is elements per block in each direction (Panzer inline-mesh
        # convention, reference meshInterface.cpp:138-139)
        xb = int(mesh_cfg.get("Xblocks", 1))
        yb = int(mesh_cfg.get("Yblocks", 1))
        zb = int(mesh_cfg.get("Zblocks", 1))
        nx = int(mesh_cfg.get("NX", 1))
        ny = int(mesh_cfg.get("NY", 1))
        nz = int(mesh_cfg.get("NZ", 1))
        mesh = box_mesh(
            cell,
            nx=nx * xb, ny=ny * yb, nz=nz * zb,
            xmin=float(mesh_cfg.get("xmin", 0.0)),
            xmax=float(mesh_cfg.get("xmax", 1.0)),
            ymin=float(mesh_cfg.get("ymin", 0.0)),
            ymax=float(mesh_cfg.get("ymax", 1.0)),
            zmin=float(mesh_cfg.get("zmin", 0.0)),
            zmax=float(mesh_cfg.get("zmax", 1.0)))
        if xb * yb * zb > 1 and cell in ("quad", "hex"):
            # Panzer eblock-i_j(_k) element-block labeling
            cents = mesh.nodes[mesh.conn].mean(axis=1)
            info = mesh.box_info["bounds"]
            idx = []
            for d, (lo, hi, n) in enumerate(info):
                nb = (xb, yb, zb)[d]
                bw = (hi - lo) / nb
                idx.append(np.clip(((cents[:, d] - lo) / bw).astype(int),
                                   0, nb - 1))
            if len(idx) == 2:
                mesh.block_ids = idx[0] + xb * idx[1]
                mesh.block_names = [f"eblock-{i}_{j}"
                                    for j in range(yb)
                                    for i in range(xb)]
            else:
                mesh.block_ids = (idx[0] + xb * idx[1]
                                  + xb * yb * idx[2])
                mesh.block_names = [f"eblock-{i}_{j}_{k}"
                                    for k in range(zb)
                                    for j in range(yb)
                                    for i in range(xb)]
        return mesh

    @property
    def n_dof(self):
        return self.disc.n_dof

    def initial_state(self, time=0.0):
        """Initial condition by L2 projection (reference default,
        solverManager.cpp:1974 setInitial) or nodal interpolation."""
        if not hasattr(self, "_ic_jit"):
            ics = self.phys_cfg.get("Initial conditions", {}) or {}
            ics = {k: v for k, v in ics.items() if k != "scalar data"}
            for m in self.modules:
                if hasattr(m, "augment_initial_conditions"):
                    m.augment_initial_conditions(ics)
            # drop ICs for variables not in this discretization (e.g.
            # module-augmented trace ICs under 'Active variables'
            # restriction); keys may be components like 'E[x]'
            ics = {k: v for k, v in ics.items()
                   if k.split("[")[0] in self.disc.dofmap.offsets}
            ic_type = self.solver_cfg.get("initial type", "L2-projection")

            def _ic(t):
                u = jnp.zeros(self.n_dof)
                if ics and ic_type.startswith("L2-projection"):
                    M = self.assembler.mass_jacobian()
                    b = self.assembler.l2_rhs(ics, time=t)
                    u = solve_linear(M, b, method=self._proj_method())
                elif ics:  # interpolation
                    from mrhyde_tpu.assembly.assembler import PointContext
                    for var, expr in ics.items():
                        vdm = self.disc.dofmap.var(var)
                        gdofs = self.disc.dofmap.all_dofs(var)
                        ctx = PointContext(jnp.asarray(vdm.dof_coords), t,
                                           self.params)
                        vals = jnp.broadcast_to(
                            self.fm.evaluate_expr(expr, ctx), (gdofs.size,))
                        u = u.at[jnp.asarray(gdofs)].set(vals)
                return self.bcs.apply(u, t)

            self._ic_jit = jax.jit(_ic)
        return self._ic_jit(time)

    def _proj_method(self):
        return "direct" if self.n_dof <= 6000 else "cg"

    def _resolve_mesh_sensors(self, obj_cfg):
        """'sensor points file: mesh': sensor locations/data come from
        Exodus ELEMENT variables (numSensors, sensor_<j>_Loc_*, and the
        data field named by 'sensor data file'; reference:
        importSensorsFromExodus, postprocessManager.cpp:5397-5470;
        steady data, time = 0)."""
        ev = getattr(self, "mesh_elem_vars", None) or {}
        out = {}
        for name, sub in obj_cfg.items():
            if (isinstance(sub, dict)
                    and str(sub.get("sensor points file", "")) == "mesh"):
                sub = dict(sub)
                if "numSensors" not in ev:
                    raise ValueError(
                        "'sensor points file: mesh' requires a "
                        "'numSensors' element variable in the Exodus "
                        f"mesh (found: {sorted(ev) or 'none'})")
                ns = np.asarray(ev["numSensors"], dtype=int)
                dfield = str(sub.pop("sensor data file", ""))
                if dfield not in ev:
                    raise ValueError(
                        f"sensor data field {dfield!r} not among the "
                        f"mesh element variables {sorted(ev)}")
                sub.pop("sensor points file")
                pts, data = [], []
                for e in np.nonzero(ns > 0)[0]:
                    for j in range(int(ns[e])):
                        loc = [float(ev[f"sensor_{j + 1}_Loc_x"][e])]
                        if self.mesh.dim > 1:
                            loc.append(float(
                                ev[f"sensor_{j + 1}_Loc_y"][e]))
                        if self.mesh.dim > 2:
                            loc.append(float(
                                ev[f"sensor_{j + 1}_Loc_z"][e]))
                        pts.append(loc)
                        data.append(float(ev[dfield][e]))
                sub["sensor points"] = pts
                sub["sensor times"] = [0.0]
                sub["sensor data"] = [[d] for d in data]
            out[name] = sub
        return out

    def _linear_method(self):
        if bool(self.solver_cfg.get("use direct solver", False)):
            return "direct"
        belos = str(self.solver_cfg.get("Belos solver", "")).lower()
        if belos:
            # map the reference's Belos solver catalog onto the native
            # Krylov set (linearAlgebraInterface.cpp:358-500): Gmres
            # flavors + GCRODR -> gmres; the CG family (Block/Pseudo
            # Block/Stochastic CG, RCG, PCPG) -> cg; BiCGStab/TFQMR ->
            # bicgstab
            if "bicgstab" in belos or "tfqmr" in belos:
                return "bicgstab"
            if belos.endswith("cg") or "pcpg" in belos:
                return "cg"
            return "gmres"
        if self.n_dof <= 4000 and "preconditioner variant" \
                not in self.solver_cfg:
            return "direct"
        return "gmres"

    def _precond_variant(self):
        """Reference 'preconditioner variant' / 'use preconditioner'
        keys plus the Ifpack2 'Preconditioner Settings' smoother catalog
        (linearAlgebraInterface.cpp:358-500)."""
        if not bool(self.solver_cfg.get("use preconditioner", True)):
            return "none"
        if "preconditioner variant" in self.solver_cfg:
            return str(self.solver_cfg["preconditioner variant"])
        ps = self.solver_cfg.get("Preconditioner Settings", {}) or {}
        sm = str(ps.get("smoother: type", "")).upper()
        if sm.startswith("ILU"):
            # incomplete-factorization smoothers map to the strongest
            # native option: geometric multigrid on structured p1
            # meshes, element-Schwarz otherwise (nonlinear.py falls
            # back automatically when MG preconditions don't apply)
            return "multigrid"
        if sm == "CHEBYSHEV":
            return "chebyshev"
        if sm == "SCHWARZ":
            return "schwarz"
        return "jacobi"

    # ------------------------------------------------------------------

    def _newton_fn(self):
        """newton_solve or its sharded drop-in when shards > 1:
        DOF-sharded (v2 halo scheme) for all decks — multiscale decks
        compose BOTH parallelism axes (macro DOFs sharded with halo
        rings, fine DtN solves assembled outside the shard_map, the
        reference's DD x 'multiscale split comm'); 'sharded scheme:
        replicated' falls back to the v1 element-sharded scheme."""
        if self.shards <= 1:
            return newton_solve
        if self._sharded_newton is None:
            from mrhyde_tpu.parallel.deck_sharded import (
                ReplicatedShardedNewton, ShardedNewton)
            scheme = str(self.solver_cfg.get("sharded scheme", "dof"))
            cls = (ReplicatedShardedNewton
                   if (scheme == "replicated"
                       and self.assembler.multiscale is not None)
                   else ShardedNewton)
            # auto-cap the shard count on meshes too small for the
            # +-1 halo ring (a shard must own >= one element "row" of
            # connectivity): the reference's Tpetra maps serve any
            # rank count on any mesh (mpiexec -n 4 on a 4x4 deck just
            # gives ranks tiny overlaps); here the ring invariant is
            # structural, so halve until the partition is valid and
            # say so. 1 shard -> the ordinary single-program path.
            shards = self.shards
            while True:
                try:
                    self._sharded_newton = cls(
                        self.assembler, shards,
                        cg_iters=int(self.solver_cfg.get(
                            "max linear iters", 200)),
                        gmres_m=int(self.solver_cfg.get(
                            "gmres restart length", 60)),
                        gmres_restarts=int(self.solver_cfg.get(
                            "linear solver restarts", 4)))
                    break
                except ValueError as e:
                    if "non-neighbor shards" not in str(e):
                        raise
                    shards //= 2
                    print(f"[mrhyde] mesh too small for the halo ring "
                          f"at {shards * 2} shards; using {shards}")
                    if shards <= 1:
                        self.shards = 1
                        return newton_solve
        return self._sharded_newton

    def solve_steady(self, record=True, pvec=None, u0=None) -> ForwardResult:
        u0 = self.initial_state() if u0 is None else jnp.asarray(u0)
        tc = TimeCoeffs.steady(self.n_dof, dtype=u0.dtype)
        result = self._newton_fn()(
            self.assembler, u0, tc, pvec,
            tol=float(self.solver_cfg.get("nonlinear TOL", 1e-6)),
            abstol=float(self.solver_cfg.get("absolute nonlinear TOL",
                                             1e-100)),
            maxiter=int(self.solver_cfg.get("max nonlinear iters", 10)),
            linear_method=self._linear_method(),
            linear_tol=float(self.solver_cfg.get("linear TOL", 1e-12)),
            precond_variant=self._precond_variant(),
            backtracking=bool(self.solver_cfg.get("allow backtracking",
                                                  True)))
        out = ForwardResult(u=result.u, time=0.0)
        if record and self.compute_errors:
            errs = self.error_calc.compute(result.u, 0.0)
            if self.multiscale is not None:
                errs.update(self.multiscale.compute_errors(result.u, 0.0))
            out.error_history.append((0.0, errs))
        if record and self.integrated_quantities is not None:
            out.integrated = self.integrated_quantities.compute(result.u,
                                                                0.0)
        if record:
            self.solution_storage.store(result.u, 0.0)
            if self.solution_writer is not None:
                self.solution_writer.record(result.u, 0.0)
                self.solution_writer.write_exodus()
        return out

    def solve_transient(self, record=True, pvec=None,
                        u0=None) -> ForwardResult:
        sc = self.solver_cfg
        t0 = float(sc.get("initial time", 0.0))
        t_end = float(sc.get("final time", 1.0))
        nsteps = int(sc.get("number of steps", 1))
        dt = sc.get("delta t")
        dt = float(dt) if dt is not None else (t_end - t0) / nsteps

        custom = None
        if sc.get("transient Butcher tableau") == "custom":
            custom = (_parse_matrix(sc.get("transient Butcher A", "1.0")),
                      _parse_vector(sc.get("transient Butcher b", "1.0")),
                      _parse_vector(sc.get("transient Butcher c", "1.0")))

        # reference defaults (solverManager.cpp:149-152): startup
        # tableau defaults to the MAIN tableau, startup BDF order to
        # the main BDF order, and startup STEPS to the BDF order — so
        # a plain 'transient BDF order: 3' deck self-starts with three
        # BDF-1..(startup order) steps
        tab = sc.get("transient Butcher tableau", "BWE")
        bdf = int(sc.get("transient BDF order", 1))
        integ = TransientIntegrator(
            assembler=self.assembler,
            newton_fn=(None if self.shards <= 1 else self._newton_fn()),
            tableau=tab,
            bdf_order=bdf,
            startup_tableau=sc.get("transient startup Butcher tableau",
                                   tab),
            startup_bdf_order=int(
                sc.get("transient startup BDF order", bdf)),
            startup_steps=int(sc.get("transient startup steps", bdf)),
            custom_tableau=custom,
            nonlinear_tol=float(sc.get("nonlinear TOL", 1e-6)),
            abs_tol=float(sc.get("absolute nonlinear TOL", 1e-100)),
            max_nonlinear_iters=int(sc.get("max nonlinear iters", 10)),
            linear_method=self._linear_method(),
            linear_tol=float(sc.get("linear TOL", 1e-12)),
            precond_variant=self._precond_variant(),
            max_cuts=int(sc.get("maximum time step cuts", 5)),
            backtracking=bool(sc.get("allow backtracking", True)),
            set_dirichlet=self.bcs.apply, pvec=pvec,
            dynamic_params=tuple(
                n for n in self.param_manager.discretized_names()
                if self.param_manager.specs[n].dynamic),
            fully_explicit=bool(sc.get("fully explicit", False)),
            lump_mass=bool(sc.get("lump mass", True)),
            mass_cg_iters=int(sc.get("max linear iters", 100)),
            mass_cg_tol=float(sc.get("linear TOL", 1e-2)))

        out = ForwardResult(u=None, time=t0)

        if self.multiscale is not None:
            self.multiscale.init_history(integ.max_history(),
                                         jnp.asarray(0.0).dtype, t0=t0)

        def observer(u, time, step):
            if record and self.compute_errors:
                errs = self.error_calc.compute(u, time)
                if self.multiscale is not None:
                    errs.update(self.multiscale.compute_errors(u, time))
                out.error_history.append((time, errs))
            if record:
                self.solution_storage.store(u, time)
                if self.solution_writer is not None:
                    self.solution_writer.record(u, time)

        if u0 is None:
            u0 = self.initial_state(time=t0)
        else:
            u0 = jnp.asarray(u0)
        u, t = integ.run(u0, t0=t0, t_end=t_end, dt=dt, num_steps=nsteps,
                         observer=observer)
        out.u, out.time = u, t
        if record and self.solution_writer is not None:
            self.solution_writer.write_exodus()
        return out

    def forward(self, pvec=None, u0=None) -> ForwardResult:
        mode = self.solver_cfg.get("solver", "steady-state")
        if mode == "transient":
            return self.solve_transient(pvec=pvec, u0=u0)
        return self.solve_steady(pvec=pvec, u0=u0)

    def run(self):
        analysis = self.cfg.get("Analysis", {}).get("analysis type",
                                                    "forward")
        if analysis == "forward":
            return self.forward()
        from mrhyde_tpu.analysis.manager import AnalysisManager
        return AnalysisManager(self).run()


def _unwrap_block(cfg: dict, marker: str) -> dict:
    """Flatten a per-block sublist ({'eblock-0_0': {...}}) if present.

    The reference allows Physics/Discretization settings nested under
    element-block names (userInterface.hpp; e.g.
    regression/thermal/2D_verification_highorder/input.yaml).
    """
    cfg = cfg or {}
    if marker in cfg:
        return cfg
    for v in cfg.values():
        if isinstance(v, dict) and marker in v:
            merged = {k: val for k, val in cfg.items()
                      if not isinstance(val, dict) or marker not in val}
            merged.update(v)
            return merged
    return cfg


def _parse_vector(s):
    return np.array([float(x) for x in str(s).split(",")])


def _parse_matrix(s):
    return np.array([[float(x) for x in row.split(",")]
                     for row in str(s).split(";")])
