"""Problem-catalog construction smoke tests + short runs."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu.problems.base import PROBLEM_REGISTRY, get_problem
from gpusph_tpu.state import is_boundary, is_fluid


def build(name, opts):
    P = get_problem(name)(opts)
    grid, state = P.build()
    return P, grid, state


def test_dambreak_build():
    P, grid, state = build("DamBreak3D", dict(deltap=0.04))
    n = int(state.count_active())
    assert n > 2000
    nf = int(jnp.sum(is_fluid(state.info) & state.active))
    nb = int(jnp.sum(is_boundary(state.info) & state.active))
    assert nf > 0 and nb > 0
    # all particles inside the world
    pos = np.asarray(state.pos)[np.asarray(state.active)]
    assert (pos >= np.asarray(grid.origin) - 1e-6).all()
    hi = np.asarray(grid.origin) + np.asarray(grid.world_size)
    assert (pos <= hi + 1e-6).all()
    # obstacle is a moving body with feedback
    specs = P.body_specs()
    assert len(specs) == 1 and not specs[0].floating


def test_poiseuille_build():
    P, grid, state = build("Poiseuille", dict(ppH=12))
    nf = int(jnp.sum(is_fluid(state.info) & state.active))
    assert nf == 12 * 12 * 11  # 12x12 in-plane lattice, 11 z-planes
    # fluid strictly between the plates
    act = np.asarray(state.active & is_fluid(state.info))
    z = np.asarray(state.pos)[act, 2]
    assert z.min() > -0.5 and z.max() < 0.5


def test_wavetank_build_and_steps():
    P, grid, state = build("WaveTank", dict(deltap=0.05, tend=0.1))
    assert int(state.count_active()) > 1000
    specs = P.body_specs()
    assert len(specs) == 1
    assert specs[0].motion is not None
    assert specs[0].rotation_center is not None

    # a few steps must run without blowup, paddle starts moving
    from gpusph_tpu.integrator import Simulator

    sim = Simulator(P.fw, grid, use_pallas=False, bodies_specs=specs)
    st = sim.run(state, tend=0.0, maxiter=10)
    assert not bool(jnp.any(jnp.isnan(st.pos)))


def test_registry_has_catalog():
    from gpusph_tpu.problems import catalog, generic  # noqa: F401

    for name in (
        "DamBreak3D", "Poiseuille", "StillWater", "WaveTank",
        "LockExchange", "OpenChannel", "BuoyancyTest", "DamBreakGate",
        "Spheric2", "Generic",
    ):
        assert name in PROBLEM_REGISTRY


def test_lockexchange_two_fluids_run():
    P, grid, state = build("LockExchange", dict(ppH=10))
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.state import fluid_num

    fl = np.asarray(fluid_num(state.info))[np.asarray(state.active & is_fluid(state.info))]
    assert (fl == 0).any() and (fl == 1).any()
    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=10)
    assert not bool(jnp.any(jnp.isnan(st.vel)))


def test_buoyancy_floating_body_rises():
    P, grid, state = build("BuoyancyTest", dict(ppH=10, tend=0.2))
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.state import FG_MOVING_BOUNDARY, has_flag

    specs = P.body_specs()
    assert specs and specs[0].floating
    body = np.asarray(has_flag(state.info, FG_MOVING_BOUNDARY))
    z0 = np.asarray(state.pos)[body, 2].mean()
    sim = Simulator(P.fw, grid, use_pallas=False, bodies_specs=specs)
    st = sim.run(state, tend=0.0, maxiter=40)
    z1 = np.asarray(st.pos)[np.asarray(has_flag(st.info, FG_MOVING_BOUNDARY)), 2].mean()
    assert not bool(jnp.any(jnp.isnan(st.pos)))
    # half-density cube under water must accelerate upward
    assert z1 > z0 - 1e-4


def test_rtinstability_grenier_run():
    """RTInstability (reference RTInstability.cu): Grenier two-fluid with
    hydrostatic two-layer init and per-particle masses; runs NaN-free and the
    heavy phase starts sinking at the interface crests."""
    P, grid, state = build("RTInstability", dict(deltap=0.04))
    from gpusph_tpu.defs import SPHFormulation
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.state import fluid_num

    assert P.fw.sph_formulation == SPHFormulation.SPH_GRENIER
    assert P.fw.pp.epsinterface == 0.08
    fl = np.asarray(fluid_num(state.info))[
        np.asarray(state.active & is_fluid(state.info))
    ]
    assert (fl == 0).any() and (fl == 1).any()
    # per-particle masses by density: heavy fluid heavier than light
    m = np.asarray(state.mass)
    f = np.asarray(fluid_num(state.info))
    act = np.asarray(state.active & is_fluid(state.info))
    assert m[act & (f == 1)].mean() > 2 * m[act & (f == 0)].mean()

    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=20)
    assert not bool(jnp.any(jnp.isnan(st.vel)))
    assert np.abs(np.asarray(st.rho)[np.asarray(st.active)]).max() < 0.3


def test_bubble_grenier_buoyancy_and_stability():
    """Bubble (reference Bubble.cu): Grenier air/water bubble.  The initial
    forces push the air phase strongly upward (buoyancy ~ rho_w/rho_a * g),
    and a short run stays NaN-free with near-rest densities (acoustic-scale
    dt means visible rise needs longer horizons than a unit test)."""
    P, grid, state = build("Bubble", dict(deltap=0.008))
    from gpusph_tpu.defs import SPHFormulation
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops.forces import compute_forces
    from gpusph_tpu.ops.grenier import grenier_density_sigma
    from gpusph_tpu.ops.neighbors import build_cells
    from gpusph_tpu.state import fluid_num

    assert P.fw.sph_formulation == SPHFormulation.SPH_GRENIER
    fw = P.fw.finalize()
    f = np.asarray(fluid_num(state.info))
    act = np.asarray(state.active & is_fluid(state.info))
    n_air = int((act & (f == 0)).sum())
    assert n_air > 50

    sst, aux = build_cells(grid, state)
    sigma, rho = grenier_density_sigma(fw, grid, sst, aux)
    out = compute_forces(fw, grid, sst.replace(rho=rho), aux, sigma=sigma)
    f_s = np.asarray(fluid_num(sst.info))
    act_s = np.asarray(sst.active & is_fluid(sst.info))
    az = np.asarray(out.DvDt)[:, 2]
    assert az[act_s & (f_s == 0)].mean() > 20.0  # strong net buoyancy on air

    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=20)
    assert not bool(jnp.any(jnp.isnan(st.vel)))
    assert np.abs(np.asarray(st.rho)[np.asarray(st.active)]).max() < 0.1


def test_dambreak_mobile_bed_runs():
    """DamBreakMobileBed (reference DamBreakMobileBed.cu): HA + granular +
    Jacobi effective pressure, periodic Y.  Scaled-down scene runs NaN-free;
    the sediment bed holds (yield) while the water front collapses."""
    P, grid, state = build(
        "DamBreakMobileBed",
        dict(deltap=0.05, lx=2.0, lx_dam=0.8, lz=0.8, jacobi_maxiter=60),
    )
    from gpusph_tpu.defs import RheologyType, SPHFormulation
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.state import FG_SEDIMENT, has_flag

    assert P.fw.sph_formulation == SPHFormulation.SPH_HA
    assert P.fw.visc.rheologytype == RheologyType.GRANULAR
    sed = np.asarray(has_flag(state.info, FG_SEDIMENT) & state.active)
    assert sed.sum() > 500
    assert float(state.extras["effpres"].max()) > 100.0  # lithostatic warm start

    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=10)
    assert not bool(jnp.any(jnp.isnan(st.vel)))
    assert np.isfinite(np.asarray(st.extras["effpres"])).all()
    # water front moves right; the deep bed barely moves in 10 steps
    sed2 = np.asarray(has_flag(st.info, FG_SEDIMENT) & st.active)
    vmag_bed = np.linalg.norm(np.asarray(st.vel)[sed2], axis=1)
    assert np.median(vmag_bed) < 0.5


def test_seiche_variable_gravity():
    """Seiche (reference Seiche.cu): oscillating lateral gravity through the
    g_callback path; with forcing active from t=0 the fluid picks up a net
    lateral acceleration, and the compiled chunk evaluates gravity per step."""
    P, grid, state = build("Seiche", dict(deltap=0.05, gtstart=0.0, gtend=3.0))
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops.forces import compute_forces
    from gpusph_tpu.ops.neighbors import build_cells

    fw = P.fw.finalize()
    assert fw.gcallback is not None
    sst, aux = build_cells(grid, state)
    # forcing at t where sin() ~ 1: mean lateral accel ~ 2 m/s^2 on fluid
    out = compute_forces(fw, grid, sst, aux, t=jnp.float32(0.16))
    act = np.asarray(sst.active & is_fluid(sst.info))
    ax = np.asarray(out.DvDt)[act, 0]
    assert ax.mean() > 1.0
    # at t past gtend the forcing is off
    out0 = compute_forces(fw, grid, sst, aux, t=jnp.float32(5.0))
    ax0 = np.asarray(out0.DvDt)[act, 0]
    assert abs(ax0.mean()) < 0.2

    sim = Simulator(P.fw, grid, use_pallas=False)
    st = sim.run(state, tend=0.0, maxiter=10)
    assert not bool(jnp.any(jnp.isnan(st.vel)))
    vx = np.asarray(st.vel)[np.asarray(st.active & is_fluid(st.info)), 0]
    assert vx.mean() > 0.0  # sloshing started in +x
