"""The forces engine: SPH continuity + momentum right-hand sides.

TPU-native re-design of the reference's forces megakernel
(`forcesDevice` `src/cuda/forces_kernel.def:3923-4036` and the per-model
contribution templates in the same file).  Where the reference instantiates
one kernel per (central-type, neighbor-type) pair and walks a strided
neighbor list, this implementation computes ALL type pairs in one dense
masked pass over cell blocks (see `ops/pair.py`): particle-type gating that
the reference does by template specialization is done here with masks on
uniform vector math — the natural formulation for the VPU.

Physics implemented (reference anchor in parentheses):

* continuity, standard/F2 formulation  (`forces_kernel.def:2139-2189`)
* momentum pressure gradient, F1 sym. P/rho^2 form (`:2380-2470`, `:366-467`)
* artificial viscosity (`visc_kernel.cu:75-86`, `forces_kernel.def:2744-2762`)
* Morris laminar viscosity with arithmetic/harmonic/geometric averaging
  (`forces_kernel.def:2606-2626`, `visc_avg.cu`)
* Monaghan viscous model (`forces_kernel.def:2531-2561`)
* Lennard-Jones / Monaghan-Kajtar boundary repulsion
  (`forces_kernel.cu:75-133`, `forces_kernel.def:3001-3018`)
* density diffusion: Ferrari / Molteni & Colagrossi / Brezzi
  (`forces_kernel.def:1609-1990`)
* XSPH mean velocity (`forces_kernel.def:2986-2994`)
* SPS sub-particle-scale stress contribution (`forces_kernel.def:2770-2790`)
* adaptive-dt CFL terms (`forces.cu:557-600`)

Finalization (gravity, conversion of DrDt to relative-density rate, CFL
maxima) mirrors `finalizeforcesDevice` (`forces_kernel.def:4037-4110`) and the
``dtreduce`` host logic (`forces.cu:557-600`).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..defs import (
    AverageOperator,
    BoundaryType,
    DensityDiffusionType,
    ParticleType,
    SPHFormulation,
    TurbulenceModel,
    ViscousModel,
)
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, part_type
from . import eos
from .kernels import F as kernF
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply


class ForcesOut(struct.PyTreeNode):
    """Per-particle RHS + reduction results of one forces pass
    (the analogue of BUFFER_FORCES + BUFFER_XSPH + BUFFER_CFL)."""

    DvDt: jax.Array  # f32[N,3] acceleration
    DrDt: jax.Array  # f32[N] relative-density rate (already /rho0)
    xsph: jax.Array  # f32[N,3] XSPH mean velocity correction (zeros if off)
    max_accel: jax.Array  # f32[] max |a| over fluid particles (CFL force term)
    max_sspeed: jax.Array  # f32[] max local sound speed (CFL sound term)
    max_kinvisc: jax.Array  # f32[] max kinematic viscosity (CFL visc term)


def _avg(avgop: AverageOperator, a, b):
    """Pairwise averaging operators (reference `src/average.h`)."""
    if avgop == AverageOperator.ARITHMETIC:
        return 0.5 * (a + b)
    if avgop == AverageOperator.HARMONIC:
        return 2.0 * a * b / (a + b)
    return jnp.sqrt(a * b)


def _pair_fields(fw: SimFramework, state: ParticleState):
    """Per-particle precomputed quantities fed to the pair pass."""
    pp = fw.pp
    f_num = fluid_num(state.info)
    ptype = part_type(state.info)
    rho_phys = eos.physical_density(pp, state.rho, f_num)
    press = eos.pressure(pp, state.rho, f_num)
    sspeed = eos.sound_speed(pp, state.rho, f_num)

    fields = dict(
        pos=state.pos,
        vel=state.vel,
        mass=state.mass,
        rho_tilde=state.rho,
        rho=rho_phys,
        press=press,
        sspeed=sspeed,
        ptype=ptype,
        f_num=f_num,
    )
    # pressure precalc: F1 and friends use P/rho^2 (forces_kernel.def:416-467)
    if fw.sph_formulation != SPHFormulation.SPH_F2:
        fields["p_precalc"] = press / (rho_phys * rho_phys)
    # per-particle dynamic viscosity for the laminar term
    if not fw.is_inviscid:
        visccoeff = eos._per_fluid(pp, f_num, [f.kinematic_visc for f in pp.fluids])
        effvisc = state.extra("effvisc")
        if effvisc is not None:
            # shear-dependent rheologies: effective *kinematic* viscosity
            visccoeff = effvisc
        fields["dyn_visc"] = visccoeff * rho_phys
        fields["kinvisc"] = visccoeff
    if fw.visc.turbmodel == TurbulenceModel.SPS:
        # symmetric SPS stress tensor (tau/rho^2 terms), 6 components
        tau = state.extra("sps_tau")
        fields["sps_tau"] = (
            tau if tau is not None else jnp.zeros((state.capacity, 6), jnp.float32)
        )
    return fields


def compute_forces(
    fw: SimFramework,
    grid: CellGrid,
    state: ParticleState,
    aux: CellAux,
    *,
    dt: Optional[jax.Array] = None,
    chunk_cells: int = 32,
) -> ForcesOut:
    """One forces pass over the (sorted) particle state."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    N = state.capacity
    fields = _pair_fields(fw, state)

    gravity = jnp.asarray(pp.gravity, jnp.float32)
    eps = pp.epsartvisc
    dyn = fw.boundarytype == BoundaryType.DYN_BOUNDARY

    def pair_fn(c, n, relpos, r, mask):
        f = kernF(fw.kerneltype, r, h)  # [C,K,NB]

        relvel = c["vel"][:, :, None, :] - n["vel"][:, None, :, :]
        vel_dot_pos = jnp.sum(relvel * relpos, axis=-1)

        c_fluid = (c["ptype"] == ParticleType.FLUID)[:, :, None]
        n_fluid = (n["ptype"] == ParticleType.FLUID)[:, None, :]
        c_bound = (c["ptype"] == ParticleType.BOUNDARY)[:, :, None]
        n_bound = (n["ptype"] == ParticleType.BOUNDARY)[:, None, :]

        m_n = n["mass"][:, None, :]
        rho_c = c["rho"][:, :, None]
        rho_n = n["rho"][:, None, :]

        out = {}

        # --- continuity: DrDt = sum m_j (v_ij . r_ij) F_ij ------------------
        # (forces_kernel.def:2139-2155). With DYN boundaries, boundary
        # particles both receive and produce continuity contributions
        # (Dalrymple's dynamic boundary: density evolves); with repulsive
        # boundaries (LJ/MK) boundary particles take no part in continuity.
        if dyn:
            cont_mask = mask & (c_fluid | c_bound) & (n_fluid | n_bound)
        else:
            cont_mask = mask & c_fluid & n_fluid
        DrDt = jnp.where(cont_mask, m_n * vel_dot_pos * f, 0.0)
        if fw.sph_formulation == SPHFormulation.SPH_F2:
            # density-ratio correction (forces_kernel.def:2156-2171)
            DrDt = DrDt * rho_c / rho_n

        # --- density diffusion ---------------------------------------------
        DrDt = DrDt + _density_diffusion(
            fw, c, n, relpos, r, f, mask & c_fluid & n_fluid, dt
        )
        out["DrDt"] = DrDt

        # --- momentum: pressure gradient -----------------------------------
        mom_mask = mask & c_fluid & (n_fluid | (n_bound if dyn else False))
        if fw.sph_formulation == SPHFormulation.SPH_F2:
            pgrad = (c["press"][:, :, None] + n["press"][:, None, :]) / (rho_c * rho_n)
        else:
            pgrad = c["p_precalc"][:, :, None] + n["p_precalc"][:, None, :]
        DvDt = jnp.where(
            mom_mask[..., None], -(pgrad * m_n * f)[..., None] * relpos, 0.0
        )

        # --- viscosity ------------------------------------------------------
        if fw.visc.turbmodel == TurbulenceModel.ARTIFICIAL:
            # Monaghan artificial viscosity (visc_kernel.cu:75-86)
            c_c = c["sspeed"][:, :, None]
            c_n = n["sspeed"][:, None, :]
            art = (
                vel_dot_pos
                * h
                * pp.artvisccoeff
                * (c_c + c_n)
                / ((r * r + eps) * (rho_c + rho_n))
            )
            av_mask = mom_mask & (vel_dot_pos < 0.0)
            DvDt = DvDt + jnp.where(
                av_mask[..., None], (art * m_n * f)[..., None] * relpos, 0.0
            )

        if not fw.is_inviscid:
            # laminar viscous term (forces_kernel.def:2606-2626 + visc_avg.cu):
            # DvDt += 2 avg(mu) m_j/(rho_i rho_j) F * (viscous vector)
            mu_avg = _avg(fw.visc.avgop, c["dyn_visc"][:, :, None], n["dyn_visc"][:, None, :])
            visc_coeff = 2.0 * mu_avg * m_n / (rho_c * rho_n)
            if fw.visc.viscmodel == ViscousModel.MONAGHAN:
                # projection form (forces_kernel.def:2531-2561)
                mon = jnp.where(vel_dot_pos < 0, vel_dot_pos / (r * r + eps), 0.0)
                vvec = mon[..., None] * relpos
                # Monaghan model carries an extra multiplicative coefficient
                visc_coeff = visc_coeff * pp.monaghan_visc_coeff if pp.monaghan_visc_coeff == pp.monaghan_visc_coeff else visc_coeff
            else:  # MORRIS
                vvec = relvel
            DvDt = DvDt + jnp.where(
                mom_mask[..., None], (visc_coeff * f)[..., None] * vvec, 0.0
            )

        if fw.visc.turbmodel == TurbulenceModel.SPS:
            # SPS stress: DvDt += m_j F (tau_i + tau_j) . r_ij
            # (forces_kernel.def:2770-2790); tau stored as upper-tri 6-vector
            t = c["sps_tau"][:, :, None, :] + n["sps_tau"][:, None, :, :]
            tx = t[..., 0] * relpos[..., 0] + t[..., 1] * relpos[..., 1] + t[..., 2] * relpos[..., 2]
            ty = t[..., 1] * relpos[..., 0] + t[..., 3] * relpos[..., 1] + t[..., 4] * relpos[..., 2]
            tz = t[..., 2] * relpos[..., 0] + t[..., 4] * relpos[..., 1] + t[..., 5] * relpos[..., 2]
            sps = jnp.stack([tx, ty, tz], axis=-1)
            DvDt = DvDt + jnp.where(mom_mask[..., None], (m_n * f)[..., None] * sps, 0.0)

        # --- repulsive boundary force (LJ / MK) -----------------------------
        if fw.repulsive_boundary:
            rep_mask = mask & c_fluid & n_bound
            if fw.boundarytype == BoundaryType.LJ_BOUNDARY:
                # LJForce (forces_kernel.cu:75-103)
                safe_r = jnp.maximum(r, 1e-12)
                ratio = pp.r0 / safe_r
                lj = (
                    pp.dcoeff
                    * (ratio**pp.p1coeff - ratio**pp.p2coeff)
                    / (safe_r * safe_r)
                )
                rep = jnp.where(r < pp.r0, lj, 0.0)
            else:
                # MKForce (forces_kernel.cu:105-133): uses the 1D Wendland
                q = r / h
                wmk = 1.8 * (1.0 - 0.5 * q) ** 4 * (2.0 * q + 1.0)
                dist = jnp.maximum(eps, r - pp.mk_d)
                m_c = c["mass"][:, :, None]
                safe_r = jnp.maximum(r, 1e-12)
                rep = (
                    pp.mk_k
                    * wmk
                    * 2.0
                    * m_n
                    / (pp.mk_beta * dist * safe_r * (m_c + m_n))
                )
            DvDt = DvDt + jnp.where(rep_mask[..., None], rep[..., None] * relpos, 0.0)

        out["DvDt"] = DvDt

        # --- XSPH mean velocity (forces_kernel.def:2986-2994) ---------------
        if fw.has_xsph:
            w = kernW(fw.kerneltype, r, h)
            xs_mask = mask & c_fluid & n_fluid
            out["xsph"] = jnp.where(
                xs_mask[..., None],
                -(m_n * w / (rho_c + rho_n))[..., None] * relvel,
                0.0,
            )

        return out

    sums = neighbor_apply(
        grid,
        aux,
        fields,
        pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )

    ptype = fields["ptype"]
    is_fluid_c = ptype == ParticleType.FLUID

    # --- finalize (finalizeforcesDevice, forces_kernel.def:4037-4110) ------
    DvDt = sums["DvDt"] + jnp.where(is_fluid_c[:, None], gravity[None, :], 0.0)
    # boundary particles never accelerate (their velocity is imposed)
    DvDt = jnp.where(is_fluid_c[:, None], DvDt, 0.0)
    # convert physical DrDt to relative-density rate (forces_kernel.def:4581)
    rho0 = eos._per_fluid(fw.pp, fields["f_num"], [f.rho0 for f in fw.pp.fluids])
    DrDt = sums["DrDt"] / rho0

    xsph = sums.get("xsph", jnp.zeros_like(state.vel))

    # --- CFL reductions (forces.cu:557-600) ---------------------------------
    accel2 = jnp.sum(DvDt * DvDt, axis=-1)
    max_accel = jnp.sqrt(jnp.max(jnp.where(is_fluid_c, accel2, 0.0)))
    max_sspeed = jnp.max(jnp.where(is_fluid_c, fields["sspeed"], 0.0))
    if not fw.is_inviscid:
        max_kinvisc = jnp.max(jnp.where(is_fluid_c, fields["kinvisc"], 0.0))
    else:
        max_kinvisc = jnp.zeros((), jnp.float32)

    return ForcesOut(
        DvDt=DvDt,
        DrDt=DrDt,
        xsph=xsph,
        max_accel=max_accel,
        max_sspeed=max_sspeed,
        max_kinvisc=max_kinvisc,
    )


def _density_diffusion(fw, c, n, relpos, r, f, ff_mask, dt):
    """Density-diffusion DrDt contribution (physical units).

    Ferrari: forces_kernel.def:1609-1640; Colagrossi: :1910-1953;
    Brezzi: :1763-1790.  All restricted to fluid-fluid pairs.
    """
    ddt = fw.densitydiffusiontype
    if ddt == DensityDiffusionType.NONE:
        return jnp.zeros(r.shape, jnp.float32)

    pp, sp = fw.pp, fw.sp
    gravity = jnp.asarray(pp.gravity, jnp.float32)
    rho_c = c["rho"][:, :, None]
    rho_n = n["rho"][:, None, :]
    m_n = n["mass"][:, None, :]
    same_fluid = (c["f_num"][:, :, None] == n["f_num"][:, None, :])
    g_dot_rel = jnp.einsum("...d,d->...", relpos, gravity)

    if ddt == DensityDiffusionType.COLAGROSSI:
        # gate: only when pressure jump exceeds the hydrostatic jump
        gate = jnp.abs(c["press"][:, :, None] - n["press"][:, None, :]) >= jnp.abs(
            g_dot_rel * rho_c
        )
        # c0 of the central particle's fluid
        c0 = eos._per_fluid(pp, c["f_num"], [fl.c0 for fl in pp.fluids])[:, :, None]
        coeff = sp.densityDiffCoeff * 2.0 * sp.slength  # xi * 2h (ProblemCore.cc:1416)
        diff = coeff * c0 * (rho_n / rho_c - 1.0) * f * m_n
        return jnp.where(ff_mask & same_fluid & gate, -diff, 0.0)

    if ddt == DensityDiffusionType.FERRARI:
        # grav correction for free-surface flows + diffusion along r
        sq_c0 = eos._per_fluid(pp, c["f_num"], [fl.c0 * fl.c0 for fl in pp.fluids])[:, :, None]
        rho0_c = eos._per_fluid(pp, c["f_num"], [fl.rho0 for fl in pp.fluids])[:, :, None]
        grav_corr = -g_dot_rel * rho0_c / sq_c0
        max_ss = jnp.maximum(c["sspeed"][:, :, None], n["sspeed"][:, None, :])
        safe = r > 1e-4 * sp.slength
        # (rho_i - rho_j + corr)/rho_i /r * relpos ; dotted with relpos gives r
        ferr = jnp.where(
            safe, max_ss * (rho_c - rho_n + grav_corr) / rho_c * r, 0.0
        )
        return jnp.where(ff_mask, sp.densityDiffCoeff * m_n * ferr * f, 0.0)

    if ddt == DensityDiffusionType.BREZZI:
        if dt is None:
            dt = jnp.zeros((), jnp.float32)
        press_c = c["press"][:, :, None]
        press_n = n["press"][:, None, :]
        term = (
            sp.densityDiffCoeff
            * ((2.0 / (rho_c + rho_n)) * (press_c - press_n) - g_dot_rel)
            * m_n
            / rho_n
            * f
            * dt
            * 2.0
            * rho_c
        )
        return jnp.where(ff_mask, term, 0.0)

    raise ValueError(f"unsupported density diffusion {ddt}")


__all__ = ["ForcesOut", "compute_forces"]
