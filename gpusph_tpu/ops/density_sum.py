"""Density summation + dynamic gamma integration (SA boundaries).

TPU-native port of the reference's integral-form density update
(`src/cuda/density_sum_kernel.cu`): instead of integrating the continuity
equation, the new density follows from the *difference of kernel sums* over
the particle distribution at step n and step n+1, with the wall contribution
tracked through the time-integrated gamma (dynamic gamma,
`USING_DYNAMIC_GAMMA`, `src/simflags.h`).  Runs after every euler half/full
step (DENSITY_SUM / INTEGRATE_GAMMA commands,
`PredictorCorrectorIntegrator.cc:616-682`).

Pieces:
* volumic terms (fluid+vertex neighbors): ``sumPmwNp1 + sumPmwN +
  sumVmwDelta`` (`computeDensitySumVolumicTerms`,
  `density_sum_kernel.cu:200-255`, HA variant `:257-322`);
* boundary gamma terms (segment neighbors): trapezoidal
  ``gGamDotR = sum_S h/2 (gradGam^n + gradGam^{n+1}) . (q^{n+1}-q^n)`` and
  the new ``gradGam^{n+1}`` (`computeDensitySumBoundaryTerms`,
  `density_sum_kernel.cu:422-483`);
* density update ``rho^{n+1} = (imposedGam rho^n + dW-sums)/gamma^{n+1}``
  with gamma clipping *after* the update (`densitySumBoundaryDevice`,
  `density_sum_kernel.cu:606-655`);
* plain gamma integration for SA runs without density sum
  (`integrateGammaDevice` dynamic branch, `density_sum_kernel.cu:669-684`).

Open-boundary contributions use this build's IO representation: IO wall rows
carry the *imposed* (Eulerian) velocity in ``vel`` while their Lagrangian
velocity is zero, so the reference's ``dt*(eulerVel - vel)`` displacement of
a virtual inflow particle becomes ``dt*vel`` on IO rows.

Moving-body SA walls keep their segment-local vertex offsets rigid, so only
``q`` changes between n and n+1 (the reference recomputes the normal only
under ENABLE_MOVING_BODIES; here the state's ``belem`` is already the n+1
normal after ``apply_body_motion`` and is used for both ends of the
trapezoid — exact for fixed walls, first-order for rotating ones).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..defs import ParticleType, SimFlags, SPHFormulation
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, part_type
from . import eos
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec
from .sa import _sa_pair_inputs, grad_gamma_wendland, sa_extra_fields

FG_INLET = 1 << 5
FG_OUTLET = 1 << 6


def _io_flag(info):
    return (info & jnp.uint32(FG_INLET | FG_OUTLET)) > 0


def _base_fields(fw: SimFramework, state_n: ParticleState, new_pos):
    """Shared pair fields: old/new positions, mass, type, IO displacement."""
    fields = dict(
        **split_vec("pos", state_n.pos),
        **split_vec("npos", new_pos),
        mass=state_n.mass,
        ptype=part_type(state_n.info),
        io=_io_flag(state_n.info).astype(jnp.float32),
    )
    if fw.io is not None:
        fields.update(**split_vec("vel", state_n.vel))
    return fields


def volumic_terms(fw: SimFramework, grid: CellGrid, state_n: ParticleState,
                  new_pos, aux: CellAux, dt, *, chunk_cells: int = 256):
    """``forces.w`` of densitySumVolumicDevice: the kernel-sum difference
    over fluid+vertex neighbors (`density_sum_kernel.cu:523-553`)."""
    sp = fw.sp
    h = sp.slength
    rad = jnp.float32(sp.influenceradius)
    rad2 = rad * rad
    ha = fw.sph_formulation == SPHFormulation.SPH_HA
    has_io = fw.io is not None
    FLUID = ParticleType.FLUID
    VERTEX = ParticleType.VERTEX

    fields = _base_fields(fw, state_n, new_pos)
    if ha:
        # HA uses m_a/theta_a * theta_b in place of m_b
        # (density_sum_kernel.cu:257-322); theta = V0/dp^3
        rho0 = eos._per_fluid(fw.pp, fluid_num(state_n.info),
                              [f.rho0 for f in fw.pp.fluids])
        fields["theta"] = state_n.mass / rho0 / sp.deltap**3

    def pair_fn(c, n, g):
        vol = (n["ptype"] == FLUID) | (n["ptype"] == VERTEX)
        base = g.mask & (c["ptype"] == FLUID) & vol
        io_n = n["io"] > 0.0

        if ha:
            m_eff = c["mass"] / jnp.maximum(c["theta"], 1e-30) * n["theta"]
        else:
            m_eff = n["mass"]

        # -sum_{P\V_io} m^n w^n  (gate at the true influence radius; the
        # pass mask runs slightly expanded to catch pairs entering range)
        wN = kernW(fw.kerneltype, g.r, h)
        sum_n = jnp.where(base & ~io_n & (g.r2 < rad2), -m_eff * wN, 0.0)

        # sum_P m^n w^{n+1}
        relx1 = c["npos_x"] - n["npos_x"]
        rely1 = c["npos_y"] - n["npos_y"]
        relz1 = c["npos_z"] - n["npos_z"]
        Lx, Ly, Lz = grid.world_size
        per = int(grid.periodic)
        if per & 1:
            relx1 = relx1 - jnp.float32(Lx) * jnp.round(relx1 / jnp.float32(Lx))
        if per & 2:
            rely1 = rely1 - jnp.float32(Ly) * jnp.round(rely1 / jnp.float32(Ly))
        if per & 4:
            relz1 = relz1 - jnp.float32(Lz) * jnp.round(relz1 / jnp.float32(Lz))
        r1 = jnp.sqrt(relx1 * relx1 + rely1 * rely1 + relz1 * relz1)
        w1 = kernW(fw.kerneltype, r1, h)
        sum_np1 = jnp.where(base & (r1 < rad), m_eff * w1, 0.0)

        out = sum_n + sum_np1

        if has_io:
            # - sum_{V_io} m^n w(r + dt (eulerVel - vel)) : IO rows carry the
            # imposed velocity in vel, Lagrangian wall velocity is zero
            dx = g.relx + dt * n["vel_x"]
            dy = g.rely + dt * n["vel_y"]
            dz = g.relz + dt * n["vel_z"]
            rD = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            wD = kernW(fw.kerneltype, rD, h)
            out = out + jnp.where(base & io_n & (rD < rad), -m_eff * wD, 0.0)

        return {"fw": out}

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius + 0.5 * sp.deltap,
        chunk_cells=chunk_cells,
    )
    return sums["fw"]


def gamma_boundary_terms(fw: SimFramework, grid: CellGrid,
                         state_n: ParticleState, new_pos, aux: CellAux, dt,
                         *, chunk_cells: int = 256):
    """Trapezoidal gamma-integration terms over segment neighbors
    (`computeDensitySumBoundaryTerms`, `density_sum_kernel.cu:422-483`).

    Returns dict of per-particle sums: ``ggdotr`` [N], ``ggx/ggy/ggz``
    (grad gamma at n+1), and with IO ``sgam_delta``/``sgam_n``.
    """
    sp = fw.sp
    h = sp.slength
    inv_h = 1.0 / h
    has_io = fw.io is not None
    BOUND = ParticleType.BOUNDARY
    FLUID = ParticleType.FLUID
    VERTEX = ParticleType.VERTEX

    fields = _base_fields(fw, state_n, new_pos)
    fields.update(sa_extra_fields(state_n))

    central_vertex = bool(fw.flags & SimFlags.ENABLE_MOVING_BODIES) or has_io

    def pair_fn(c, n, g):
        c_ok = c["ptype"] == FLUID
        if central_vertex:
            c_ok = c_ok | (c["ptype"] == VERTEX)
        seg = g.mask & c_ok & (n["ptype"] == BOUND)

        qN, qvb, ns = _sa_pair_inputs(c, n, g, h)
        ggN = jnp.where(seg, grad_gamma_wendland(qN, qvb, ns, h), 0.0)

        q1 = (
            (c["npos_x"] - n["npos_x"]) * inv_h,
            (c["npos_y"] - n["npos_y"]) * inv_h,
            (c["npos_z"] - n["npos_z"]) * inv_h,
        )
        gg1 = jnp.where(seg, grad_gamma_wendland(q1, qvb, ns, h), 0.0)

        dq_dot_n = (
            (q1[0] - qN[0]) * ns[0]
            + (q1[1] - qN[1]) * ns[1]
            + (q1[2] - qN[2]) * ns[2]
        )
        out = {
            # x h at the end (reference multiplies gGamDotR by slength)
            "ggdotr": jnp.where(seg, 0.5 * h * (ggN + gg1) * dq_dot_n, 0.0),
            "ggx": gg1 * ns[0],
            "ggy": gg1 * ns[1],
            "ggz": gg1 * ns[2],
        }
        if has_io:
            io_n = seg & (n["io"] > 0.0)
            dx = dt * n["vel_x"]
            dy = dt * n["vel_y"]
            dz = dt * n["vel_z"]
            qD = (qN[0] + dx * inv_h, qN[1] + dy * inv_h, qN[2] + dz * inv_h)
            ggD = jnp.where(io_n, grad_gamma_wendland(qD, qvb, ns, h), 0.0)
            dot_d = dx * ns[0] + dy * ns[1] + dz * ns[2]
            out["sgam_delta"] = jnp.where(io_n, dot_d * ggD, 0.0)
            out["sgam_n"] = jnp.where(io_n, dot_d * ggN, 0.0)
        return out

    return neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius + 0.5 * sp.deltap,
        chunk_cells=chunk_cells,
    )


def _gamma_update(fw, state_n, sums):
    """(gamma^{n+1} unclipped, gradgamma^{n+1} [N,3]) from the pair sums."""
    gam_n = state_n.extras["gamma"]
    gam1 = gam_n + sums["ggdotr"]
    gg1 = jnp.stack([sums["ggx"], sums["ggy"], sums["ggz"]], axis=-1)
    return gam1, gg1


def density_sum_update(fw: SimFramework, grid: CellGrid,
                       state_n: ParticleState, state_new: ParticleState,
                       aux: CellAux, dt, *,
                       chunk_cells: int = 256) -> ParticleState:
    """DENSITY_SUM: overwrite fluid densities of ``state_new`` from the
    kernel-sum difference and integrate gamma (densitySumVolumicDevice +
    densitySumBoundaryDevice, `density_sum_kernel.cu:523,606`)."""
    sp = fw.sp
    ptype = part_type(state_n.info)
    is_fluid = ptype == ParticleType.FLUID
    f_num = fluid_num(state_n.info)

    fw_sum = volumic_terms(fw, grid, state_n, state_new.pos, aux, dt,
                           chunk_cells=chunk_cells)
    sums = gamma_boundary_terms(fw, grid, state_n, state_new.pos, aux, dt,
                                chunk_cells=chunk_cells)
    gam1, gg1 = _gamma_update(fw, state_n, sums)

    # imposed gamma (compute_imposed_gamma, density_sum_kernel.cu:399-421)
    gam_n = state_n.extras["gamma"]
    if fw.io is not None:
        imposed = gam_n + 0.5 * (sums["sgam_delta"] + sums["sgam_n"])
        imposed = jnp.clip(imposed, 0.1, 1.0)
    else:
        imposed = gam_n

    rho_n_phys = eos.physical_density(fw.pp, state_n.rho, f_num)
    rho1_phys = (imposed * rho_n_phys + fw_sum) / jnp.maximum(gam1, 1e-6)
    rho1 = eos.numerical_density(fw.pp, rho1_phys, f_num)

    # gamma clipping AFTER the density update (density_sum_kernel.cu:643-648)
    gg_norm = jnp.linalg.norm(gg1, axis=-1) * sp.slength
    gam1 = jnp.where((gam1 > 1.0) | (gg_norm < 1e-10), 1.0, gam1)
    gam1 = jnp.maximum(gam1, 0.1)

    extras = dict(state_new.extras)
    extras["gamma"] = jnp.where(is_fluid, gam1, extras["gamma"])
    extras["gradgamma"] = jnp.where(is_fluid[:, None], gg1,
                                    extras["gradgamma"])
    return state_new.replace(
        rho=jnp.where(is_fluid, rho1, state_new.rho), extras=extras)


def integrate_gamma(fw: SimFramework, grid: CellGrid,
                    state_n: ParticleState, state_new: ParticleState,
                    aux: CellAux, dt, *,
                    chunk_cells: int = 256) -> ParticleState:
    """INTEGRATE_GAMMA (dynamic gamma without density sum): gamma^{n+1} =
    gamma^n + gGamDotR, grad gamma from the n+1 geometry
    (`integrateGammaDeviceFunc`, `density_sum_kernel.cu:669-684`)."""
    ptype = part_type(state_n.info)
    upd = ptype == ParticleType.FLUID
    if (fw.flags & SimFlags.ENABLE_MOVING_BODIES) or fw.io is not None:
        upd = upd | (ptype == ParticleType.VERTEX)

    sums = gamma_boundary_terms(fw, grid, state_n, state_new.pos, aux, dt,
                                chunk_cells=chunk_cells)
    gam1, gg1 = _gamma_update(fw, state_n, sums)

    extras = dict(state_new.extras)
    extras["gamma"] = jnp.where(upd, gam1, extras["gamma"])
    extras["gradgamma"] = jnp.where(upd[:, None], gg1, extras["gradgamma"])
    return state_new.replace(extras=extras)


def apply_density_diffusion(fw: SimFramework, grid: CellGrid,
                            state: ParticleState, aux: CellAux, dt, *,
                            gamma=None,
                            chunk_cells: int = 256) -> ParticleState:
    """CALC/APPLY_DENSITY_DIFFUSION: with density sum, diffusion runs as a
    separate pass on the *updated* state and adds ``dt * contrib`` to the
    density (`PredictorCorrectorIntegrator.cc:641-661`,
    `forces_kernel.cu:285-735`)."""
    from .forces import _density_diffusion
    from .pair import PairGeometry  # noqa: F401  (doc anchor)

    sp = fw.sp
    pp = fw.pp
    h = sp.slength
    FLUID = ParticleType.FLUID
    f_num = fluid_num(state.info)
    rho_phys = eos.physical_density(pp, state.rho, f_num)

    fields = dict(
        **split_vec("pos", state.pos),
        **split_vec("vel", state.vel),
        mass=state.mass,
        rho=rho_phys,
        press=eos.pressure(pp, state.rho, f_num),
        sspeed=eos.sound_speed(pp, state.rho, f_num),
        ptype=part_type(state.info),
        f_num=f_num,
    )

    from .kernels import F as kernF

    def pair_fn(c, n, g):
        f = kernF(fw.kerneltype, g.r, h)
        ff = g.mask & (c["ptype"] == FLUID) & (n["ptype"] == FLUID)
        contrib = _density_diffusion(fw, c, n, g, f, ff, dt, pp.gravity)
        return {"dd": contrib}

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    is_fluid = part_type(state.info) == ParticleType.FLUID
    # _density_diffusion returns a physical-units rate; state.rho is the
    # relative density (numerical_density convention)
    rho0 = eos._per_fluid(pp, f_num, [f.rho0 for f in pp.fluids])
    new_rho = jnp.where(is_fluid, state.rho + dt * sums["dd"] / rho0,
                        state.rho)
    return state.replace(rho=new_rho)


def init_dynamic_gamma(fw: SimFramework, grid: CellGrid,
                       state: ParticleState, aux: CellAux, *,
                       chunk_cells: int = 256) -> ParticleState:
    """saInitGamma analogue: seed extras gamma/gradgamma by quadrature
    (`boundary_conditions_kernel.cu` saInitGamma; here the existing
    per-pass quadrature engine)."""
    from .sa import compute_gamma

    gamma, ggam = compute_gamma(fw, grid, state, aux, chunk_cells=chunk_cells)
    extras = dict(state.extras)
    extras["gamma"] = gamma
    extras["gradgamma"] = ggam
    return state.replace(extras=extras)


__all__ = [
    "density_sum_update",
    "integrate_gamma",
    "apply_density_diffusion",
    "init_dynamic_gamma",
    "volumic_terms",
    "gamma_boundary_terms",
]
