"""Smoke tests for the non-render app drivers (PolygonApp1,
MuscleCrossbridgeApp, ODESolverApp, PlotterTestApp capabilities)."""

import os

import numpy as np
import pytest

from computational_ray_tracer_tpu.apps import APP_NAMES


def test_all_ten_apps_registered():
    # Parity with the reference's ten Applications/ (main.cpp:3-14)
    assert len(APP_NAMES) == 10


def test_polygon_app(tmp_path):
    from computational_ray_tracer_tpu.apps import polygon_app
    rep = polygon_app.main(outdir=str(tmp_path), n_vertices=10)
    assert rep["n_triangles"] == rep["n_vertices"] - 2
    # triangulation areas must sum to the polygon area
    np.testing.assert_allclose(rep["triangulation_area_check"], rep["area"],
                               rtol=1e-9)
    assert rep["guard_coverage"] > 0.9     # star-shaped: centroid sees all
    assert (tmp_path / "polygon.png").exists()
    assert (tmp_path / "polygon.txt").exists()


def test_crossbridge_app(tmp_path):
    from computational_ray_tracer_tpu.apps import crossbridge
    rep = crossbridge.main(outdir=str(tmp_path), n_steps=1500)
    # two-state model converges to f/(f+g) = 0.1
    assert abs(rep["simulated_final_fraction"]
               - rep["steady_state_fraction"]) < 0.01
    assert rep["fv_monotone_decreasing"]


def test_ode_app(tmp_path):
    from computational_ray_tracer_tpu.apps import ode_app
    errs = ode_app.main(outdir=str(tmp_path))
    # Empirical convergence orders: Euler ~1, RK2 ~2 (RK4 hits the f32
    # error floor at these step sizes, so only check it's the most accurate)
    assert 0.7 < errs["euler"]["order"] < 1.3
    assert 1.6 < errs["rk2"]["order"] < 2.4
    assert errs["rk4"]["errors"][0] < errs["rk2"]["errors"][0]
    assert errs["rk2"]["errors"][0] < errs["euler"]["errors"][0]


def test_plotter_demo(tmp_path):
    from computational_ray_tracer_tpu.apps import plotter_demo
    path = plotter_demo.main(outdir=str(tmp_path))
    assert os.path.exists(path)
