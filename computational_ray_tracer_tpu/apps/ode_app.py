"""ODE solver app (ODESolverApp capability, Applications/ODESolverApp.h:
51-100): Euler plus the RK2/RK4 the reference only planned in comments,
with convergence-order measurement against the analytic solution."""

from __future__ import annotations

import json
import os

import numpy as np


def main(outdir="out"):
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import simulation as sim
    from computational_ray_tracer_tpu.utils import plot

    os.makedirs(outdir, exist_ok=True)
    # y' = -2y + sin(t), y(0)=1: analytic via integrating factor
    f = lambda t, y: -2.0 * y + jnp.sin(t)

    def analytic(t):
        t = np.asarray(t)
        c = 1.0 + 1.0 / 5.0
        return (c * np.exp(-2 * t)
                + (2.0 * np.sin(t) - np.cos(t)) / 5.0)

    t1 = 4.0
    g = plot.Graph2D(title="ODE y' = -2y + sin t", xlabel="t", ylabel="y")
    errors = {}
    for name, solver in (("euler", sim.euler), ("rk2", sim.rk2),
                         ("rk4", sim.rk4)):
        errs = []
        for n in (64, 128, 256):
            ts, ys = solver(f, jnp.asarray(1.0), 0.0, t1 / n, n)
            errs.append(float(abs(np.asarray(ys)[-1] - analytic(t1))))
            if n == 128:
                g.plot_line(np.asarray(ts), np.asarray(ys), label=name)
        # empirical order from halving dt
        order = float(np.log2(errs[0] / errs[1]))
        errors[name] = {"errors": errs, "order": order}
    g.plot_line(np.linspace(0, t1, 200), analytic(np.linspace(0, t1, 200)),
                label="analytic", lw=1.0)
    g.save(os.path.join(outdir, "ode.png"))

    with open(os.path.join(outdir, "ode.json"), "w") as fjson:
        json.dump(errors, fjson, indent=2)
    print(json.dumps(errors, indent=2))
    return errors
