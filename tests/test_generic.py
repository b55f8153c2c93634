"""INI-driven GenericProblem (problem_builder analogue)."""
import numpy as np

from gpusph_tpu.problems.base import get_problem

INI = """
[problem]
name = MiniDam
deltap = 0.05
tend = 0.5
boundary = DYN_BOUNDARY
turbulence = ARTIFICIAL
density_diffusion = COLAGROSSI
gravity = 0 0 -9.81
water_level = 0.3

[domain]
origin = 0 0 0
size = 1.0 0.5 0.5

[fluid0]
rho0 = 1000
gamma = 7
c0 = 20

[geometry0]
type = fixed_boundary
shape = box_border
origin = 0 0 0
size = 1.0 0.5 0.5
open_top = true

[geometry1]
type = fluid
shape = box
origin = 0.15 0.15 0.15
size = 0.3 0.2 0.15

[geometry2]
type = testpoint
origin = 0.8 0.25 0.05
"""


def test_generic_ini(tmp_path):
    path = tmp_path / "mini.ini"
    path.write_text(INI)
    P = get_problem("Generic")(dict(config=str(path)))
    grid, state = P.build()
    assert P.name == "MiniDam"
    assert int(state.count_active()) > 500
    assert P.fw.sp.densityDiffCoeff == 0.1

    from gpusph_tpu.integrator import Simulator

    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=5)
    import jax.numpy as jnp

    assert not bool(jnp.any(jnp.isnan(st.pos)))
