"""Build + short-run smoke tests for the catalog problems that have no
dedicated test elsewhere (round-3/4 additions).

The reference's equivalent is `scripts/run-all-problems.sh` (build every
problem, run 1000 iterations); here each problem builds at coarse
resolution and steps a few iterations NaN-free on the CPU backend.
Trajectory-level golden regression lives in scripts/check_problem.py.
"""
import jax.numpy as jnp
import pytest

from gpusph_tpu.integrator import Simulator
from gpusph_tpu.problems.base import get_problem

# (name, options) — coarse resolutions so CPU compile+run stays tractable
CASES = [
    ("Objects", dict(deltap=0.1, tend=0.1)),
    ("SlidingWedge", dict(deltap=0.2, tend=0.1)),
    ("OilJet", dict(deltap=0.024, tend=0.01)),
    ("DynBoundsExample", dict(deltap=0.1, tend=0.1)),
    ("Spheric2SA", dict(deltap=0.08, tend=0.1)),
    ("CompleteSaExample", dict(deltap=0.1, tend=0.1)),
    ("StillWaterRepackSA", dict(ppH=6, tend=0.1)),
    ("LithostaticSA", dict(deltap=0.125, tend=0.1, jacobi_maxiter=30)),
    ("BiFluidPoiseuilleSA", dict(deltap=0.125, tend=0.1)),
    ("ProblemExample", dict(deltap=0.1, tend=0.1)),
]


@pytest.mark.parametrize("name,opts", CASES, ids=[c[0] for c in CASES])
def test_problem_smoke(name, opts):
    P = get_problem(name)(dict(opts))
    grid, state = P.build()
    n0 = int(state.count_active())
    assert n0 > 50, f"{name}: built only {n0} particles"

    if getattr(P, "grid_state", None):
        grid, state = P.grid_state

    sim = Simulator(P.fw, grid, use_pallas=False,
                    bodies_specs=P.body_specs())
    state = P.initialize(sim, state)
    st = sim.run(state, tend=0.0, maxiter=P.fw.sp.buildneibsfreq)
    assert not bool(jnp.any(jnp.isnan(st.pos))), f"{name}: NaN positions"
    assert not bool(jnp.any(jnp.isnan(st.rho))), f"{name}: NaN density"
    assert int(st.count_active()) > 0
