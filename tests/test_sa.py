"""SA boundary tests: gamma quadrature / analytic grad-gamma vs numeric
oracles on a flat wall, and the hydrostatic StillWaterSA short run.

Reference semantics: `src/cuda/gamma.cuh` (Gamma / gradGamma), the
hydrostatic-basin validation (`gpusph-valid.tex:233`), `check-gamma.py`.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusph_tpu.ops import eos
from gpusph_tpu.ops.neighbors import build_cells
from gpusph_tpu.ops.sa import compute_gamma
from gpusph_tpu.problems.base import get_problem
from gpusph_tpu.state import fluid_num, part_type


def _wendland_w(r, h):
    q = r / h
    coeff = 21.0 / (16.0 * np.pi * h**3)
    val = coeff * (1.0 - 0.5 * q) ** 4 * (1.0 + 2.0 * q)
    return np.where(q < 2.0, val, 0.0)


def _halfspace_gamma(z, h):
    """1 - integral of W over the half-space at signed distance z from the
    wall (numeric oracle)."""
    # cylindrical coordinates around the wall normal
    zz = np.linspace(-2.0 * h, 2.0 * h, 400)
    rr = np.linspace(0.0, 2.0 * h, 400)
    dz = zz[1] - zz[0]
    dr = rr[1] - rr[0]
    Z, R = np.meshgrid(zz, rr, indexing="ij")
    W = _wendland_w(np.sqrt(Z**2 + R**2), h)
    # mass below the wall plane (wall at -z from the particle)
    below = Z < -z
    return 1.0 - float((W * below * 2.0 * np.pi * R * dr * dz).sum())


def _plane_integral_w(z, h):
    """Integral of W over the wall plane at distance z (the analytic
    ||grad gamma|| for a flat wall)."""
    rr = np.linspace(0.0, 2.0 * h, 2000)
    dr = rr[1] - rr[0]
    W = _wendland_w(np.sqrt(z**2 + rr**2), h)
    return float((W * 2.0 * np.pi * rr * dr).sum())


@pytest.fixture(scope="module")
def sa_setup():
    P = get_problem("StillWaterSA")(dict(ppH=10))
    grid, state = P.build()
    fw = P.fw.finalize()
    sstate, aux = jax.jit(lambda s: build_cells(grid, s))(state)
    gamma, ggam = jax.jit(lambda s, a: compute_gamma(fw, grid, s, a))(
        sstate, aux)
    return P, fw, grid, sstate, aux, np.asarray(gamma), np.asarray(ggam)


def test_gamma_flat_wall(sa_setup):
    """Fluid gamma above the flat bottom wall matches the half-space
    quadrature oracle."""
    P, fw, grid, sstate, aux, gamma, ggam = sa_setup
    h = fw.sp.slength
    pt = np.asarray(part_type(sstate.info))
    pos = np.asarray(sstate.pos)
    fl = pt == 0
    # particles over the wall center, away from side walls
    sel = fl & (np.abs(pos[:, 0] - 0.25) < 0.1) & (np.abs(pos[:, 1] - 0.25) < 0.1)
    z = pos[sel, 2]
    near = z < 1.9 * h
    for zi, gi in zip(z[near][:20], gamma[sel][near][:20]):
        ref = _halfspace_gamma(zi, h)
        assert abs(gi - ref) < 5e-3, (zi, gi, ref)


def test_grad_gamma_flat_wall(sa_setup):
    """|grad gamma| above the flat bottom wall matches the plane integral
    of W (the exact flat-wall result), and points along +z."""
    P, fw, grid, sstate, aux, gamma, ggam = sa_setup
    h = fw.sp.slength
    pt = np.asarray(part_type(sstate.info))
    pos = np.asarray(sstate.pos)
    fl = pt == 0
    sel = fl & (np.abs(pos[:, 0] - 0.25) < 0.1) & (np.abs(pos[:, 1] - 0.25) < 0.1)
    z = pos[sel, 2]
    g = ggam[sel]
    near = (z < 1.5 * h) & (z > 0.5 * h)
    for zi, gv in zip(z[near][:10], g[near][:10]):
        ref = _plane_integral_w(zi, h)
        assert abs(gv[2] - ref) < 0.03 * max(ref, 1.0), (zi, gv[2], ref)
        assert abs(gv[0]) < 0.05 * ref + 1e-3
        assert abs(gv[1]) < 0.05 * ref + 1e-3
    far = z > 2.1 * h
    assert np.abs(g[far]).max() < 1e-5


@pytest.mark.slow
def test_stillwater_sa_hydrostatic():
    """Short StillWaterSA run stays stable and near hydrostatic pressure."""
    P = get_problem("StillWaterSA")(dict(ppH=10))
    grid, state = P.build()
    from gpusph_tpu.integrator import Simulator

    sim = Simulator(P.fw, grid)
    state = sim.run(state, maxiter=40, tend=0.0)
    pt = np.asarray(part_type(state.info))
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    press = np.asarray(eos.pressure(P.fw.pp, state.rho, fluid_num(state.info)))
    fl = pt == 0
    H = 0.5
    assert not np.isnan(pos).any()
    assert np.abs(vel[fl]).max() < 0.6  # transient sloshing, bounded
    ctr = fl & (np.abs(pos[:, 0] - 0.25) < 0.08) & (np.abs(pos[:, 1] - 0.25) < 0.08)
    p_ref = 1000 * 9.81 * (H - pos[ctr, 2])
    err = np.abs(press[ctr] - p_ref) / (1000 * 9.81 * H)
    assert err.mean() < 0.05, err.mean()
