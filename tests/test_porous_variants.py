"""Regression parity: porous mesh-variant decks run straight from the
reference YAML (tri / 1D / 3D hex / 3D tet / hybridized variants /
permeability-from-file / preconditioner deck).

The 3D tet decks additionally pin the Panzer-STK CubeTetMeshFactory
hex->tet convention (12 tets per hex via a centroid node with
min-node-id face diagonals) reproduced in mesh/structured.py — the
gold L2 errors are split-sensitive and only match with that split.

Golds: /root/reference/regression/porous/<name>/mrhyde.gold and
regression/thermal/3D_verification_tet/mrhyde.gold.
"""

import pytest

from mrhyde_tpu.driver import load_input_deck
from mrhyde_tpu.problem import Problem

from tests.gold_utils import assert_matches_gold

_REG = "/root/reference/regression"

_DECKS = [
    "porous/Mixed_tri",
    "porous/Mixed_1D",
    "porous/Mixed_hybrid_tri",
    "porous/2D_preconditioner",
    pytest.param("porous/Mixed_3d", marks=pytest.mark.slow),
    pytest.param("porous/Mixed_3D_tet", marks=pytest.mark.slow),
    pytest.param("porous/Mixed_3D_hybrid", marks=pytest.mark.slow),
    pytest.param("thermal/3D_verification_tet", marks=pytest.mark.slow),
    "porous/Mixed_PermData",
]


@pytest.mark.parametrize("deck", _DECKS)
@pytest.mark.slow
def test_reference_deck_matches_gold(deck):
    d = f"{_REG}/{deck}"
    res = Problem(load_input_deck(f"{d}/input.yaml")).run()
    assert_matches_gold(res, f"{d}/mrhyde.gold")


def test_weakgalerkin_permdata_matches_gold():
    """porous/WeakGalerkin_PermData (the reference input.yaml has a
    literal indentation error — 3-space 'Functions:' — so the deck is
    reconstructed here; reference: porousWeakGalerkin.cpp:107-115
    updatePerm reads the closest-point element data)."""
    d = f"{_REG}/porous/WeakGalerkin_PermData"
    sides = {s: "0.0" for s in ("left", "right", "top", "bottom")}
    cfg = {
        "_deck_dir": d,
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10,
                 "data file": "perm", "data points file": "perm_xy"},
        "Physics": {"eblock-0_0": {
            "use permeability data": True,
            "modules": "porous weak Galerkin",
            "assemble face terms": True,
            "Dirichlet conditions": {"pbndry": sides}}},
        "Functions": {"source": "8*(pi*pi)*sin(2*pi*x)*sin(2*pi*y)"},
        "Solver": {"solver": "steady-state", "initial type": "none",
                   "use direct solver": True,
                   "use preconditioner": False},
        "Discretization": {"eblock-0_0": {
            "order": {"pint": 0, "pbndry": 0, "u": 1, "t": 1},
            "quadrature": 2}},
        "Postprocess": {"compute errors": True, "True solutions": {
            "pint": "sin(2*pi*x)*sin(2*pi*y)",
            "pbndry face": "sin(2*pi*x)*sin(2*pi*y)",
            "u[x]": "2*pi*cos(2*pi*x)*sin(2*pi*y)",
            "u[y]": "2*pi*sin(2*pi*x)*cos(2*pi*y)",
            "t[x]": "-2*pi*cos(2*pi*x)*sin(2*pi*y)",
            "t[y]": "-2*pi*sin(2*pi*x)*cos(2*pi*y)"}},
    }
    res = Problem(cfg).run()
    assert_matches_gold(res, f"{d}/mrhyde.gold")
