#!/usr/bin/env python
"""Lithostatic/hydrostatic validation: settled column vs analytic profile.

TPU-native counterpart of the reference's `scripts/validate-lithostatic.py`
(driving `gpusph-valid.tex:233`'s hydrostatic-basin 1% bar): run a still
column to rest and compare the fluid pressure profile against the analytic
solution; also require near-zero residual velocity.

Problems:
  StillWater      DYN/LJ hydrostatic box (default)
  StillWaterSA    SA boundaries + density sum + dynamic gamma
  LithostaticSA   two-layer water/sediment column on SA walls
                  (the BASELINE.md SA fidelity case)

The reference pressure uses the *actual* settled surface (top fluid layer
+ dp/2, the SPH surface convention) rather than the nominal fill height —
the fill settles by a fraction of dp and the nominal-H probe would count
that offset as error.

Prints one JSON line.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="StillWater")
    ap.add_argument("--ppH", type=int, default=24)
    ap.add_argument("--tend", type=float, default=3.0)
    ap.add_argument("--deltap", type=float, default=0.0)
    args = ap.parse_args()

    import numpy as np

    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops import eos
    from gpusph_tpu.problems.base import get_problem
    from gpusph_tpu.state import FG_SEDIMENT, fluid_num, has_flag, is_fluid

    opts = dict(ppH=args.ppH, tend=args.tend)
    if args.deltap:
        opts["deltap"] = args.deltap
    P = get_problem(args.problem)(opts)
    grid, state = P.build()
    sim = Simulator(P.fw, grid)
    state = sim.run(state, tend=args.tend, maxiter=0)

    act = np.asarray(state.active & is_fluid(state.info))
    pos = np.asarray(state.pos)
    z = pos[act, 2]
    fnum = np.asarray(fluid_num(state.info))
    press = np.asarray(eos.pressure(P.fw.pp, state.rho, fluid_num(state.info)))[act]
    vmax = float(np.abs(np.asarray(state.vel)[act]).max())

    g = 9.81
    dp = P.fw.sp.deltap
    rho0 = P.fw.pp.fluids[0].rho0
    if args.problem == "LithostaticSA":
        # two-layer column: water (fluid 0) of depth hw over sediment
        # (fluid 1) of depth hs (Lithostatic.inc initializeParticles)
        sed = np.asarray(has_flag(state.info, FG_SEDIMENT))[act]
        rho1 = P.fw.pp.fluids[1].rho0
        zs = z[sed]
        surf_w = float(z[~sed].max()) + 0.5 * dp if (~sed).any() else P.hs
        surf_s = float(zs.max()) + 0.5 * dp if sed.any() else 0.0
        p_ref = np.where(
            sed,
            rho0 * g * (surf_w - surf_s) + rho1 * g * np.maximum(surf_s - z, 0.0),
            rho0 * g * np.maximum(surf_w - z, 0.0),
        )
        depth = surf_w - z
    else:
        surface = float(z.max()) + 0.5 * dp
        depth = surface - z
        p_ref = rho0 * g * np.maximum(depth, 0.0)

    # exclude the free-surface smearing zone (one kernel radius)
    core = depth > P.fw.influenceradius
    scale = p_ref[core].max()
    l2 = float(np.sqrt(np.mean((press[core] - p_ref[core]) ** 2)) / scale)
    linf = float(np.abs(press[core] - p_ref[core]).max() / scale)

    out = dict(
        problem=args.problem,
        particles=int(act.sum()),
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
