"""Regression parity: the linear-elasticity Exodus/cubit and crystal
decks run straight from the reference YAML.

- le/{2d,3d}_uniaxial_tension_cubit: Exodus meshes (tiny.g, cube.g)
  with named sidesets/nodesets, point Dirichlet BCs
  ('<var>_point_DBCs', discretizationInterface.cpp:2637) and Neumann
  tractions; the exact linear solution is reproduced to machine
  precision (gold errors ~1e-16).
- le/3D_manufactured: 3D HGRAD manufactured solution.
- le/crystal_elasticity: cubic anisotropic stiffness with per-element
  grain rotations imported from mesh data files
  (CrystalElasticity.cpp:88-147 exact tensor fill + :412 rotation).
- le/2d_uniaxial_tension_cubit_multiscale: LE DtN subgrid with Nitsche
  displacement-trace coupling (linearelasticity.cpp:333-470) and
  traction flux upscale (:677).
"""

import numpy as np
import pytest

from mrhyde_tpu.driver import load_input_deck
from mrhyde_tpu.problem import Problem

_REG = "/root/reference/regression"


def _run(deck):
    return Problem(load_input_deck(f"{_REG}/{deck}/input.yaml")).run()


def test_2d_uniaxial_tension_cubit_exact():
    res = _run("le/2d_uniaxial_tension_cubit")
    assert res.errors[("L2", "dx")] < 1e-13
    assert res.errors[("L2", "dy")] < 1e-13


@pytest.mark.slow
def test_3d_uniaxial_tension_cubit_exact():
    res = _run("le/3d_uniaxial_tension_cubit")
    for v in ("dx", "dy", "dz"):
        assert res.errors[("L2", v)] < 1e-13


@pytest.mark.slow
def test_3d_manufactured_matches_gold():
    res = _run("le/3D_manufactured")
    assert np.isclose(res.errors[("L2", "dx")], 0.00872827, rtol=1e-4)
    assert np.isclose(res.errors[("L2", "dy")], 0.0153095, rtol=1e-4)
    assert np.isclose(res.errors[("L2", "dz")], 0.0306752, rtol=1e-4)


@pytest.mark.slow
def test_crystal_elasticity_matches_gold():
    res = _run("le/crystal_elasticity")
    assert np.isclose(res.errors[("L2", "dx")], 0.0669357, rtol=1e-4)
    assert np.isclose(res.errors[("L2", "dy")], 0.377584, rtol=1e-4)
    assert np.isclose(res.errors[("L2", "dz")], 0.0795866, rtol=1e-4)


@pytest.mark.slow
def test_2d_uniaxial_cubit_multiscale_exact():
    res = _run("le/2d_uniaxial_tension_cubit_multiscale")
    for v in ("dx", "dy"):
        assert res.errors[("L2-face", v)] < 1e-13
        assert res.errors[("Subgrid-L2", v)] < 1e-13


@pytest.mark.slow
def test_crystal_elasticity_multiscale_matches_gold():
    """le/crystal_elasticity_multiscale: DtN2 subgrid whose fine
    elements carry grain rotations imported from mesh data files
    (subgridDtN.cpp:71-81 data file settings; importMeshData closest-
    point assignment, assemblyManager.cpp:8235), macro load applied via
    the generic 'Flux conditions' (physicsInterface.cpp:1703)."""
    res = _run("le/crystal_elasticity_multiscale")
    gold_face = {"dx": 0.952133, "dy": 5.25217, "dz": 1.12699}
    gold_sub = {"dx": 0.0666075, "dy": 0.376627, "dz": 0.0791494}
    for v in ("dx", "dy", "dz"):
        assert np.isclose(res.errors[("L2-face", v)], gold_face[v],
                          rtol=1e-4)
        assert np.isclose(res.errors[("Subgrid-L2", v)], gold_sub[v],
                          rtol=1e-4)
