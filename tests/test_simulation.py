"""Simulation model tests (capability: MuscleCrossbridgeApp, ODESolverApp)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from computational_ray_tracer_tpu.models import simulation as sim


def test_euler_exponential_decay():
    # y' = -y, y(0)=1 -> e^-t; Euler converges first order
    ts, ys = sim.euler(lambda t, y: -y, jnp.asarray([1.0]), 0.0, 0.001, 1000)
    assert float(ys[-1, 0]) == pytest.approx(math.exp(-1.0), rel=1e-2)


def test_rk4_much_more_accurate_than_euler():
    f = lambda t, y: -y
    _, ye = sim.euler(f, jnp.asarray([1.0]), 0.0, 0.1, 10)
    _, y4 = sim.rk4(f, jnp.asarray([1.0]), 0.0, 0.1, 10)
    err_e = abs(float(ye[-1, 0]) - math.exp(-1.0))
    err_4 = abs(float(y4[-1, 0]) - math.exp(-1.0))
    assert err_4 < err_e / 100


def test_rk2_orbit_energy():
    # harmonic oscillator y'' = -y as 2D system; RK2 roughly conserves
    def f(t, y):
        return jnp.asarray([y[1], -y[0]])
    ts, ys = sim.rk2(f, jnp.asarray([1.0, 0.0]), 0.0, 0.01, 1000)
    energy = np.asarray(ys[:, 0] ** 2 + ys[:, 1] ** 2)
    assert abs(energy[-1] - 1.0) < 0.01
    # period ~ 2*pi: y(2*pi) ~ 1
    i = int(round(2 * math.pi / 0.01)) - 1
    assert float(ys[i, 0]) == pytest.approx(1.0, abs=0.01)


def test_crossbridge_steady_state():
    cfg = sim.CrossbridgeConfig(n_bridges=10000, attach_rate=14.0,
                                detach_rate=126.0, dt=1e-3)
    res = sim.simulate_crossbridges(cfg, 3000)
    frac = np.asarray(res["n_attached"][-500:]).mean() / cfg.n_bridges
    expect = sim.steady_state_attachment_fraction(cfg)  # 0.1
    assert expect == pytest.approx(0.1)
    assert frac == pytest.approx(expect, rel=0.1)


def test_crossbridge_force_positive_isometric():
    cfg = sim.CrossbridgeConfig(n_bridges=5000)
    res = sim.simulate_crossbridges(cfg, 1000, velocity=0.0)
    # isometric: attached bridges hold the power-stroke strain -> force > 0
    assert float(np.asarray(res["force"][-200:]).mean()) > 0


def test_crossbridge_force_velocity_decreasing():
    # the classic force-velocity relation: force drops as shortening
    # velocity increases
    cfg = sim.CrossbridgeConfig(n_bridges=4000, dt=5e-4)
    fv = sim.force_velocity_curve(cfg, [0.0, 2000.0, 8000.0], n_steps=1500,
                                  n_average=300)
    assert fv[0] > fv[1] > fv[2]


def test_crossbridge_deterministic():
    cfg = sim.CrossbridgeConfig(n_bridges=1000, seed=7)
    a = sim.simulate_crossbridges(cfg, 100)
    b = sim.simulate_crossbridges(cfg, 100)
    np.testing.assert_array_equal(np.asarray(a["force"]),
                                  np.asarray(b["force"]))
