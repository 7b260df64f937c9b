"""IO: Exodus write/read round-trip, VTK writer, restart analysis mode."""

import numpy as np
import pytest

from mrhyde_tpu.mesh.exodus import read_exodus, write_exodus
from mrhyde_tpu.mesh.structured import box_mesh
from mrhyde_tpu.problem import Problem


def test_exodus_roundtrip(tmp_path):
    mesh = box_mesh("quad", nx=3, ny=2)
    path = str(tmp_path / "mesh.exo")
    nf = {"e": np.random.RandomState(0).rand(2, mesh.n_nodes)}
    cf = {"k": np.random.RandomState(1).rand(2, mesh.n_elem)}
    write_exodus(path, mesh, node_fields=nf, cell_fields=cf,
                 times=[0.0, 1.0])
    mesh2, info = read_exodus(path)
    assert mesh2.cell_type == "quad"
    np.testing.assert_allclose(mesh2.nodes, mesh.nodes)
    np.testing.assert_array_equal(mesh2.conn, mesh.conn)
    assert info["n_steps"] == 2


def thermal_cfg(tmp_path, write=False):
    cfg = {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 6, "NY": 6},
        "Functions": {"thermal source": "sin(2*pi*t)*10"},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {"scalar data": True,
                                             "e": {"all boundaries": 0.0}},
                    "Initial conditions": {"scalar data": True, "e": 0.0}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "transient", "final time": 0.4,
                   "number of steps": 4,
                   "transient Butcher tableau": "BWE"},
        "Postprocess": {"compute errors": False},
    }
    if write:
        cfg["Postprocess"]["write solution"] = True
        cfg["Postprocess"]["output file"] = str(tmp_path / "out")
        cfg["Postprocess"]["Extra cell fields"] = {"esq": "e*e"}
    return cfg


def test_solution_writer_and_vtk(tmp_path):
    import os
    p = Problem(thermal_cfg(tmp_path, write=True))
    res = p.run()
    exo = str(tmp_path / "out.exo")
    assert os.path.exists(exo)
    mesh2, info = read_exodus(exo)
    assert info["n_steps"] == 5  # IC + 4 steps
    vtk = p.solution_writer.write_vtk(str(tmp_path / "out.vtk"))
    assert os.path.getsize(vtk) > 100


@pytest.mark.slow
def test_restart_resumes(tmp_path):
    import os
    os.chdir(tmp_path)
    # full run to t=0.4
    full = Problem(thermal_cfg(tmp_path)).run()
    # run half, dump, restart
    cfg1 = thermal_cfg(tmp_path)
    cfg1["Solver"]["final time"] = 0.2
    cfg1["Solver"]["number of steps"] = 2
    p1 = Problem(cfg1)
    r1 = p1.run()
    np.savetxt("restart_state.dat", np.asarray(r1.u))
    cfg2 = thermal_cfg(tmp_path)
    cfg2["Solver"]["number of steps"] = 2
    cfg2["Analysis"] = {"analysis type": "restart",
                        "Restart": {"state file name": "restart_state.dat",
                                    "start time": 0.2}}
    cfg2["Solver"]["initial time"] = 0.2
    r2 = Problem(cfg2).run()
    np.testing.assert_allclose(np.asarray(r2.u), np.asarray(full.u),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_restart_recovers_scalar_params(tmp_path):
    """Restart 'scalar parameter file name' + mode keys (reference:
    analysisManager.cpp:831-889)."""
    import os
    os.chdir(tmp_path)
    cfg = thermal_cfg(tmp_path)
    cfg["Parameters"] = {"kappa": {"type": "scalar", "value": 1.0,
                                   "usage": "active"}}
    cfg["Functions"] = dict(cfg.get("Functions", {}))
    cfg["Functions"]["thermal diffusion"] = "kappa"
    p0 = Problem(cfg)
    r0 = p0.run()
    np.savetxt("restart_state.dat", np.asarray(r0.u))
    np.savetxt("scalar_params.dat", np.array([2.5]))

    cfg2 = thermal_cfg(tmp_path)
    cfg2["Parameters"] = {"kappa": {"type": "scalar", "value": 1.0,
                                    "usage": "active"}}
    cfg2["Functions"] = dict(cfg2.get("Functions", {}))
    cfg2["Functions"]["thermal diffusion"] = "kappa"
    cfg2["Analysis"] = {"analysis type": "restart",
                        "Restart": {
                            "state file name": "restart_state.dat",
                            "scalar parameter file name":
                                "scalar_params.dat",
                            "mode": "forward"}}
    p2 = Problem(cfg2)
    am = p2.analysis if hasattr(p2, "analysis") else None
    r2 = p2.run()
    # the recovered parameter value is live in the problem
    assert float(p2.param_manager.specs["kappa"].value) == 2.5
    assert np.isfinite(np.asarray(r2.u)).all()
