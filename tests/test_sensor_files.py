"""Regression parity: thermal/2D_create_sensor_data — sensors imported
from a points FILE, responses saved per sensor (reference:
importSensorsFromFiles, postprocessManager.cpp; gold files
sensor.objval.gold / sensor.objgrad.gold hold [time; per-sensor
responses]). Also exercises parameter indexing in expressions
('thermal_diff(0)').
"""

import numpy as np
import pytest

from mrhyde_tpu.problem import Problem

GOLD_DIR = "/root/reference/regression/thermal/2D_create_sensor_data"


def _cfg():
    return {
        "Mesh": {"dimension": 2, "element type": "quad",
                 "NX": 10, "NY": 10},
        "Physics": {"modules": "thermal",
                    "Dirichlet conditions": {
                        "e": {"all boundaries": "0.0"}}},
        "Discretization": {"order": {"e": 1}, "quadrature": 2},
        "Solver": {"solver": "steady-state", "max nonlinear iters": 2,
                   "use direct solver": True},
        "Functions": {
            "thermal diffusion": "thermal_diff(0)",
            "thermal source": "thermal_source(0)*(2*pi*pi*sin(pi*t) "
                              "+ pi*cos(pi*t))*sin(pi*x)*sin(pi*y)"},
        "Parameters": {
            "thermal_diff": {"type": "scalar", "value": 2.0,
                             "usage": "active"},
            "thermal_source": {"type": "scalar", "value": 3.0,
                               "usage": "active"}},
        "Postprocess": {
            "response type": "pointwise",
            "compute objective": True,
            "Objective functions": {
                "objgrad": {
                    "type": "sensors",
                    "sensor points file":
                        f"{GOLD_DIR}/sensor_points.dat",
                    "save sensor data": True,
                    "response": "(grad(e)[x])^2 + (grad(e)[y])^2",
                    "weight": 1.0},
                "objval": {
                    "type": "sensors",
                    "sensor points file":
                        f"{GOLD_DIR}/sensor_points.dat",
                    "save sensor data": True,
                    "response": "e",
                    "weight": 1.0}}},
    }


def test_sensor_file_responses_match_gold(tmp_path):
    p = Problem(_cfg())
    res = p.solve_steady()
    om = p.objective_manager
    resp = om.sensor_responses(res.u, 0.0)
    gold_val = np.loadtxt(f"{GOLD_DIR}/sensor.objval.gold")
    gold_grad = np.loadtxt(f"{GOLD_DIR}/sensor.objgrad.gold")
    # row 0 = time (0), rows 1.. = per-sensor responses
    np.testing.assert_allclose(np.asarray(resp["objval"]), gold_val[1:],
                               rtol=2e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(resp["objgrad"]),
                               gold_grad[1:], rtol=2e-6, atol=1e-12)

    # save-sensor-data files round-trip in the reference layout
    om.save_sensor_files([(0.0, resp)], outdir=str(tmp_path))
    saved = np.loadtxt(tmp_path / "sensor.objval.dat")
    np.testing.assert_allclose(saved, gold_val, rtol=2e-6, atol=1e-12)


def test_sensor_grid_spec():
    from mrhyde_tpu.postprocess.objectives import ObjectiveSpec
    s = ObjectiveSpec.from_config("g", {
        "type": "sensors", "response": "e",
        "sensor grid Nx": 3, "sensor grid xmin": 0.0,
        "sensor grid xmax": 1.0,
        "sensor grid Ny": 2, "sensor grid ymin": 0.25,
        "sensor grid ymax": 0.75})
    assert s.sensor_points.shape == (6, 2)
    assert np.isclose(s.sensor_points[:, 0].max(), 1.0)
    assert np.isclose(s.sensor_points[:, 1].min(), 0.25)


def test_sensor_dft_recovers_tone():
    from mrhyde_tpu.postprocess.objectives import (ObjectiveManager,
                                                   ObjectiveSpec)
    import types
    spec = ObjectiveSpec.from_config("sig", {
        "type": "sensors", "response": "e",
        "output type": "dft", "number of dft frequencies": 16})
    om = ObjectiveManager.__new__(ObjectiveManager)
    om.specs = [spec]
    # synthetic history: one sensor, 16 steps of a k=3 tone
    T, k0 = 16, 3
    history = [(t, {"sig": np.array([np.cos(2 * np.pi * k0 * t / T)])})
               for t in range(T)]
    dft = om.sensor_dft(history, "sig")
    mags = np.abs(dft[0])
    assert np.argmax(mags) in (k0, T - k0)
    assert mags[k0] > 7.9          # T/2 for a real tone
