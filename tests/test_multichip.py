"""Multi-device domain decomposition vs single-device equivalence.

The reference validates multi-GPU runs by byte-comparing against single-GPU
references (`scripts/check-problem.sh` mgpu path); here we require the
4-device sharded trajectory to match the 1-device run within f32 tolerance.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpusph_tpu.integrator import make_sim_chunk
from gpusph_tpu.parallel.domain import (
    make_decomposition,
    make_sharded_chunk,
    shard_state,
)
from gpusph_tpu.problems.base import get_problem
from jax.sharding import Mesh
from jax.experimental import mesh_utils


@pytest.fixture
def small_problem():
    P = get_problem("StillWater")(dict(ppH=8))
    grid, state = P.build()
    return P, grid, state


def test_sharded_matches_single(small_problem):
    P, grid, state = small_problem
    fw = P.fw.finalize()
    ndev = 4

    # shard first: the single-device chunk donates its input state
    dd = make_decomposition(grid, ndev, int(state.count_active()), state=state)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    sh_state = shard_state(dd, mesh, fw, state)

    # single-device trajectory
    from gpusph_tpu.bodies import init_bodies_state

    b0 = init_bodies_state((), state)
    chunk1 = make_sim_chunk(fw, grid, use_pallas=False)
    s1, dt1, t1, it1, _, stats1 = chunk1(
        state, jnp.float32(1e-4), jnp.float32(0.0), jnp.int32(0), b0,
    )
    chunkN = make_sharded_chunk(fw, dd, mesh, use_pallas=False)
    sN, dtN, tN, itN, _, statsN = chunkN(
        sh_state, jnp.float32(1e-4), jnp.float32(0.0), jnp.int32(0), b0,
    )

    assert int(statsN.overflow) == 0
    assert int(statsN.n_active) == int(stats1.n_active)
    assert float(dtN) == pytest.approx(float(dt1), rel=1e-5)

    # compare per-particle states by persistent id
    def by_id(st):
        act = np.asarray(st.active)
        ids = np.asarray(st.id)[act]
        order = np.argsort(ids)
        return (
            ids[order],
            np.asarray(st.pos)[act][order],
            np.asarray(st.vel)[act][order],
            np.asarray(st.rho)[act][order],
        )

    ids1, pos1, vel1, rho1 = by_id(s1)
    idsN, posN, velN, rhoN = by_id(sN)
    np.testing.assert_array_equal(ids1, idsN)
    np.testing.assert_allclose(posN, pos1, atol=1e-6)
    np.testing.assert_allclose(velN, vel1, atol=1e-4)
    np.testing.assert_allclose(rhoN, rho1, atol=1e-5)


def test_sharded_multiple_chunks(small_problem):
    """Run several chunks so migration across slabs actually happens."""
    P, grid, state = small_problem
    fw = P.fw.finalize()
    ndev = 4

    dd = make_decomposition(grid, ndev, int(state.count_active()), state=state)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    sh = shard_state(dd, mesh, fw, state)
    chunk1 = make_sim_chunk(fw, grid, use_pallas=False)
    chunkN = make_sharded_chunk(fw, dd, mesh, use_pallas=False)

    from gpusph_tpu.bodies import init_bodies_state

    s1, sN = state, sh
    b1 = init_bodies_state((), state)
    bN = init_bodies_state((), state)
    dt1 = dtN = jnp.float32(1e-4)
    t1 = tN = jnp.float32(0.0)
    it1 = itN = jnp.int32(0)
    for _ in range(3):
        s1, dt1, t1, it1, b1, _ = chunk1(s1, dt1, t1, it1, b1)
        sN, dtN, tN, itN, bN, statsN = chunkN(sN, dtN, tN, itN, bN)
        assert int(statsN.overflow) == 0

    act1 = np.asarray(s1.active)
    actN = np.asarray(sN.active)
    assert act1.sum() == actN.sum()
    ids1 = np.asarray(s1.id)[act1]
    idsN = np.asarray(sN.id)[actN]
    o1, oN = np.argsort(ids1), np.argsort(idsN)
    np.testing.assert_array_equal(ids1[o1], idsN[oN])
    np.testing.assert_allclose(
        np.asarray(sN.pos)[actN][oN], np.asarray(s1.pos)[act1][o1], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sN.rho)[actN][oN], np.asarray(s1.rho)[act1][o1], atol=1e-4
    )


def test_balanced_slab_bounds(small_problem):
    from gpusph_tpu.parallel.domain import balanced_slab_bounds

    P, grid, state = small_problem
    fw = P.fw.finalize()
    bounds = balanced_slab_bounds(grid, state, 4)
    assert bounds[0] == 0 and bounds[-1] == grid.ncells[grid.order[2]]
    assert (np.diff(bounds) >= 0).all()
    # balanced boundaries put roughly equal particles per slab
    import numpy as np2
    sa = grid.order[2]
    pos = np.asarray(state.pos)[np.asarray(state.active)]
    k = np.clip(((pos[:, sa] - grid.origin[sa]) / grid.cell_size[sa]).astype(int),
                0, grid.ncells[sa] - 1)
    per = [((k >= bounds[d]) & (k < bounds[d + 1])).sum() for d in range(4)]
    assert max(per) <= 2.5 * (sum(per) / 4 + 1)


def _traj_compare(P, ndev=4, nchunks=1, atol_pos=1e-5):
    """1-dev vs ndev-dev trajectory equality for a built problem."""
    grid, state = P.grid_state if hasattr(P, "grid_state") else P.build()
    fw = P.fw.finalize()
    specs = P.body_specs()
    from gpusph_tpu.bodies import init_bodies_state

    dd = make_decomposition(grid, ndev, int(state.count_active()), state=state)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("d",))
    sh = shard_state(dd, mesh, fw, state)
    b0 = init_bodies_state(specs, state)

    chunk1 = make_sim_chunk(fw, grid, use_pallas=False, bodies_specs=specs)
    chunkN = make_sharded_chunk(fw, dd, mesh, use_pallas=False,
                                bodies_specs=specs,
                                extras_keys=tuple(state.extras))
    s1, sN = state, sh
    b1 = bN = b0
    dt1 = dtN = jnp.float32(1e-4)
    t1 = tN = jnp.float32(0.0)
    it1 = itN = jnp.int32(0)
    for _ in range(nchunks):
        s1, dt1, t1, it1, b1, _ = chunk1(s1, dt1, t1, it1, b1)
        sN, dtN, tN, itN, bN, statsN = chunkN(sN, dtN, tN, itN, bN)
        assert int(statsN.overflow) == 0

    act1 = np.asarray(s1.active)
    actN = np.asarray(sN.active)
    assert act1.sum() == actN.sum()
    ids1 = np.asarray(s1.id)[act1]
    idsN = np.asarray(sN.id)[actN]
    o1, oN = np.argsort(ids1), np.argsort(idsN)
    np.testing.assert_array_equal(ids1[o1], idsN[oN])
    np.testing.assert_allclose(
        np.asarray(sN.pos)[actN][oN], np.asarray(s1.pos)[act1][o1],
        atol=atol_pos,
    )
    return b1, bN


def test_sharded_bodies_dambreak():
    """DamBreak3D with its feedback obstacle: the flagship problem's bodies
    pipeline (per-device force reduction + psum) matches single-device."""
    P = get_problem("DamBreak3D")(dict(deltap=0.08))
    b1, bN = _traj_compare(P, ndev=4, nchunks=1)
    np.testing.assert_allclose(
        np.asarray(bN.force), np.asarray(b1.force), rtol=1e-4, atol=1e-5
    )


def test_sharded_grenier():
    """Grenier formulation multi-device (sigma halo exchange)."""
    P = get_problem("LockExchange")(dict(deltap=0.02))
    _traj_compare(P, ndev=4, nchunks=1, atol_pos=1e-5)


def test_sharded_granular():
    """Granular rheology multi-device (effpres halo per Jacobi iteration)."""
    P = get_problem("LithostaticLJ")(dict(deltap=0.1, jacobi_maxiter=40))
    _traj_compare(P, ndev=2, nchunks=1, atol_pos=1e-5)


def test_sharded_sa_quadrature():
    """SA boundaries with per-pass gamma quadrature: segment/vertex BC
    imposition + gamma halo exchange must match single-device
    (UPDATE_EXTERNAL choreography, PredictorCorrectorIntegrator.cc:121-305).
    """
    P = get_problem("StillWaterSA")(dict(ppH=6, density_sum=0))
    _traj_compare(P, ndev=4, nchunks=1, atol_pos=1e-5)


def test_sharded_sa_density_sum():
    """SA with ENABLE_DENSITY_SUM + dynamic (carried) gamma: the sharded
    prep must use the integrated gamma like the single-device path
    (integrator.py prep), not re-quadrature it."""
    P = get_problem("StillWaterSA")(dict(ppH=6, density_sum=1))
    grid, state = P.build()
    fw = P.fw.finalize()

    # seed gamma/gradgamma once host-side (saInitGamma analogue) so both
    # trajectories start from identical carried state
    from gpusph_tpu.ops.density_sum import init_dynamic_gamma
    from gpusph_tpu.ops.neighbors import build_cells

    def _init(s):
        s, aux = build_cells(grid, s)
        return init_dynamic_gamma(fw, grid, s, aux)

    state = jax.jit(_init)(state)
    P.grid_state = (grid, state)
    _traj_compare(P, ndev=4, nchunks=1, atol_pos=1e-5)


def test_sharded_keps():
    """k-epsilon multi-device: DKDE/turbvisc pair fields + implicit k-eps
    update must match single-device."""
    from gpusph_tpu.defs import (BoundaryType, DensityDiffusionType,
                                 KernelType, RheologyType, SimFlags,
                                 TurbulenceModel, ViscousModel)
    from gpusph_tpu.problems.base import (FillType, GeometryType, Problem,
                                          SimParams)

    class _KepsBox(Problem):
        name = "_KepsBox"

        def __init__(self, options=None):
            super().__init__(options)
            H, l, ppH = 0.3, 0.3, 6
            self.setup_framework(
                kernel=KernelType.WENDLAND,
                boundary=BoundaryType.SA_BOUNDARY,
                rheology=RheologyType.NEWTONIAN,
                turbulence_model=TurbulenceModel.KEPSILON,
                visc_model=ViscousModel.MORRIS,
                density_diffusion=DensityDiffusionType.FERRARI,
                flags=SimFlags.ENABLE_DTADAPT,
                simparams=SimParams(densityDiffCoeff=0.1),
            )
            self.set_deltap(H / ppH)
            dp = self.deltap
            self.set_gravity(-9.81)
            self.set_max_fall(H)
            fl = self.add_fluid(1000.0)
            self.set_kinematic_visc(fl, 1e-4)
            self.set_equation_of_state(fl, 7.0, 20.0)
            self.set_tend(1.0)
            h_box = H + 6 * dp
            self.make_universe_box((-2 * dp, -2 * dp, -2 * dp),
                                   (l + 4 * dp, l + 4 * dp, h_box + 4 * dp))
            self.add_sa_box((0.0, 0.0, 0.0), (l, l, h_box), faces="all")
            self.add_box(GeometryType.FLUID, FillType.SOLID,
                         (dp, dp, dp), l - 2 * dp, l - 2 * dp, H - dp)
            self.set_water_level(H)

        def initialize_particles(self, grid, state):
            import jax.numpy as jnp

            extras = dict(state.extras)
            extras["tke"] = jnp.where(state.active, 1e-3, 0.0)
            extras["eps"] = jnp.where(state.active, 1e-2, 1e-5)
            extras["turbvisc"] = 0.09 * extras["tke"] ** 2 / jnp.maximum(
                extras["eps"], 1e-10)
            return state.replace(extras=extras)

    _traj_compare(_KepsBox(), ndev=4, nchunks=1, atol_pos=1e-5)


def test_sharded_io_channel():
    """Open-boundary (IO) problem sharded: imposed inlet/outlet values +
    kill_outflow must match single-device within a chunk (inlet creation is
    host-side at chunk cadence in both paths)."""
    P = get_problem("ChannelIO")(dict(deltap=0.05))
    _traj_compare(P, ndev=4, nchunks=1, atol_pos=1e-5)
