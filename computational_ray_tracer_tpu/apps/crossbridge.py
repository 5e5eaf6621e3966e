"""Muscle crossbridge app (MuscleCrossbridgeApp capability,
Applications/MuscleCrossbridgeApp.h:86-330): stochastic attach/detach
simulation of n0=10000 bridges (attach 14/s, detach 126/s), force trace and
force–velocity curve, run as vectorized lax.scan instead of a per-bridge
RNG loop."""

from __future__ import annotations

import json
import os

import numpy as np


def main(outdir="out", n_steps=4000, seed=0):
    import jax.numpy as jnp
    from computational_ray_tracer_tpu.models import simulation as sim
    from computational_ray_tracer_tpu.utils import plot

    os.makedirs(outdir, exist_ok=True)
    cfg = sim.CrossbridgeConfig(seed=seed)
    res = sim.simulate_crossbridges(cfg, n_steps)
    attached = res["n_attached"]
    force = res["force"]
    ts = np.arange(n_steps) * cfg.dt
    ss = sim.steady_state_attachment_fraction(cfg)

    g = plot.Graph2D(title="Crossbridge attachment", xlabel="t [s]",
                     ylabel="fraction attached")
    g.plot_line(np.asarray(ts), np.asarray(attached) / cfg.n_bridges,
                label="simulated")
    g.plot_line(np.asarray(ts), np.full(len(ts), ss), label="steady state")
    g.save(os.path.join(outdir, "crossbridge_attach.png"))

    vels = jnp.linspace(0.0, 8.0, 17)
    forces = sim.force_velocity_curve(cfg, vels)
    g2 = plot.Graph2D(title="Force-velocity", xlabel="shortening velocity",
                      ylabel="mean force")
    g2.plot_line(np.asarray(vels), np.asarray(forces), label="F(v)")
    g2.save(os.path.join(outdir, "force_velocity.png"))

    final_frac = float(np.asarray(attached)[-100:].mean() / cfg.n_bridges)
    report = {
        "n_bridges": cfg.n_bridges,
        "attach_rate": cfg.attach_rate,
        "detach_rate": cfg.detach_rate,
        "steady_state_fraction": float(ss),
        "simulated_final_fraction": final_frac,
        "mean_force_tail": float(np.asarray(force)[-100:].mean()),
        "fv_monotone_decreasing": bool(
            np.all(np.diff(np.asarray(forces)) <= 1e-3)),
    }
    with open(os.path.join(outdir, "crossbridge.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report
