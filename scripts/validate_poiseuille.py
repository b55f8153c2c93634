#!/usr/bin/env python
"""Poiseuille validation: steady profile vs analytic parabola.

TPU-native counterpart of the reference's `scripts/validate-poiseuille.py`
(which sweeps viscosity configurations and compares against
v_x(z) = F/(2 nu) ((lz/2)^2 - z^2)).  Runs the Poiseuille problem to (near)
steady state and reports the L2/Linf error of the fluid velocity profile.

Usage: python scripts/validate_poiseuille.py [--ppH 16] [--tend 30] [...]
Prints one JSON line per configuration.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(ppH, tend, compvisc, viscavg, steady_init=True):
    import numpy as np

    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem
    from gpusph_tpu.state import is_fluid

    P = get_problem("Poiseuille")(
        dict(
            ppH=ppH,
            compvisc=compvisc,
            viscavg=viscavg,
            **({"steady-init": True} if steady_init else {}),
        )
    )
    grid, state = P.build()
    sim = Simulator(P.fw, grid)
    state = sim.run(state, tend=tend, maxiter=0)

    import jax.numpy as jnp

    act = np.asarray(state.active & is_fluid(state.info))
    z = np.asarray(state.pos)[act, 2]
    vx = np.asarray(state.vel)[act, 0]
    v_ref = np.asarray([P.compute_poiseuille_vel(zz) for zz in z])
    vmax = v_ref.max()
    l2 = float(np.sqrt(np.mean((vx - v_ref) ** 2)) / vmax)
    linf = float(np.abs(vx - v_ref).max() / vmax)
    return dict(
        case=f"ppH{ppH}_cv{compvisc}_avg{viscavg}",
        t=sim.t,
        iters=sim.iterations,
        l2_rel=l2,
        linf_rel=linf,
        vmax_measured=float(vx.max()),
        vmax_analytic=float(vmax),
        mipps=sim.mipps,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ppH", type=int, default=16)
    ap.add_argument("--tend", type=float, default=30.0)
    ap.add_argument("--sweep", action="store_true",
                    help="sweep compvisc x viscavg like the reference script")
    args = ap.parse_args()

    cases = [(0, 1)]  # kinematic + harmonic (reference default)
    if args.sweep:
        cases = [(cv, avg) for cv in (0, 1) for avg in (0, 1, 2)]

    ok = True
    for cv, avg in cases:
        r = run_case(args.ppH, args.tend, cv, avg)
        r["pass_1pct"] = r["l2_rel"] < 0.01
        ok &= r["pass_1pct"]
        print(json.dumps(r), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
