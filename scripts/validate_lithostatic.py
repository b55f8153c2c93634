#!/usr/bin/env python
"""Lithostatic/hydrostatic validation: settled column vs analytic profile.

TPU-native counterpart of the reference's `scripts/validate-lithostatic.py`:
run StillWater to rest and compare the fluid density/pressure profile against
the analytic hydrostatic solution; also require near-zero residual velocity.

Prints one JSON line.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ppH", type=int, default=24)
    ap.add_argument("--tend", type=float, default=3.0)
    args = ap.parse_args()

    import numpy as np

    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops import eos
    from gpusph_tpu.problems.base import get_problem
    from gpusph_tpu.state import is_fluid

    P = get_problem("StillWater")(dict(ppH=args.ppH))
    grid, state = P.build()
    sim = Simulator(P.fw, grid)
    state = sim.run(state, tend=args.tend, maxiter=0)

    import jax.numpy as jnp

    act = np.asarray(state.active & is_fluid(state.info))
    z = np.asarray(state.pos)[act, 2]
    rho = np.asarray(
        eos.physical_density(P.fw.pp, state.rho, jnp.zeros(state.capacity, jnp.int32))
    )[act]
    press = np.asarray(
        eos.pressure(P.fw.pp, state.rho, jnp.zeros(state.capacity, jnp.int32))
    )[act]
    vmax = float(np.abs(np.asarray(state.vel)[act]).max())

    depth = np.maximum(0.0, P.water_level - z)
    p_ref = 1000.0 * 9.81 * depth
    # exclude the free-surface smearing zone (one kernel radius)
    core = depth > P.fw.influenceradius
    scale = p_ref[core].max()
    l2 = float(np.sqrt(np.mean((press[core] - p_ref[core]) ** 2)) / scale)
    linf = float(np.abs(press[core] - p_ref[core]).max() / scale)

    out = dict(
        t=sim.t,
        iters=sim.iterations,
        l2_rel=l2,
        linf_rel=linf,
        residual_vmax=vmax,
        mipps=sim.mipps,
        pass_1pct=l2 < 0.01,
    )
    print(json.dumps(out))
    sys.exit(0 if out["pass_1pct"] else 1)


if __name__ == "__main__":
    main()
