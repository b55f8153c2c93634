"""The forces engine: SPH continuity + momentum right-hand sides.

TPU-native re-design of the reference's forces megakernel
(`forcesDevice` `src/cuda/forces_kernel.def:3923-4036` and the per-model
contribution templates in the same file).  Where the reference instantiates
one kernel per (central-type, neighbor-type) pair and walks a strided
neighbor list, this implementation computes ALL type pairs in one dense
masked pass over cell blocks (see `ops/pair.py`): particle-type gating that
the reference does by template specialization is done here with masks on
uniform vector math — the natural formulation for the VPU.  All per-pair
tensors are [C,K,NB] scalars (lane-major over neighbor candidates).

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
    SimFlags,
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
from .pair import neighbor_apply, split_vec, merge_vec


class ForcesOut(struct.PyTreeNode):
    """Per-particle RHS + reduction results of one forces pass
    (the analogue of BUFFER_FORCES + BUFFER_XSPH + BUFFER_CFL)."""

    DvDt: jax.Array  # f32[N,3] acceleration
    DrDt: jax.Array  # f32[N] relative-density rate (already /rho0)
    xsph: jax.Array  # f32[N,3] XSPH mean velocity correction (zeros if off)
    DEDt: jax.Array  # f32[N] internal-energy rate (zeros unless enabled)
    max_accel: jax.Array  # f32[] max |a| over fluid particles (CFL force term)
    max_sspeed: jax.Array  # f32[] max local sound speed (CFL sound term)
    max_kinvisc: jax.Array  # f32[] max kinematic viscosity (CFL visc term)
    # k-epsilon: (Dk, De, Ce2_yap) per particle for the implicit euler
    # update (BUFFER_DKDE; zeros-shaped scalar when the model is off)
    dkde: jax.Array = struct.field(default_factory=lambda: jnp.zeros(()))


def _powf(x, e: float):
    """x**e with exact repeated multiplication for small integer exponents
    (the LJ exponents are typically 12 and 6); keeps the XLA and Pallas
    paths bit-consistent where pow lowerings would differ."""
    if e == int(e) and 0 <= int(e) <= 16:
        n = int(e)
        out = jnp.ones_like(x)
        base = x
        while n:
            if n & 1:
                out = out * base
            n >>= 1
            if n:
                base = base * base
        return out
    return x**e


def _avg(avgop: AverageOperator, a, b):
    """Pairwise averaging operators (reference `src/average.h`)."""
    if avgop == AverageOperator.ARITHMETIC:
        return 0.5 * (a + b)
    if avgop == AverageOperator.HARMONIC:
        return 2.0 * a * b / (a + b + 1e-30)
    return jnp.sqrt(a * b)


def _pair_fields(fw: SimFramework, state: ParticleState, sps_tau=None,
                 effvisc=None, sigma=None):
    """Per-particle precomputed scalar fields fed to the pair pass.

    ``sps_tau``/``effvisc`` are the ephemeral per-step outputs of the
    viscosity engine (the reference's EPHEMERAL_BUFFERS, recomputed before
    every forces call by the CALC_VISC command); ``sigma`` is Grenier's
    per-particle number density from the COMPUTE_DENSITY phase."""
    pp = fw.pp
    f_num = fluid_num(state.info)
    ptype = part_type(state.info)
    rho_phys = eos.physical_density(pp, state.rho, f_num)
    press = eos.pressure(pp, state.rho, f_num)
    sspeed = eos.sound_speed(pp, state.rho, f_num)

    fields = dict(
        **split_vec("pos", state.pos),
        **split_vec("vel", state.vel),
        mass=state.mass,
        rho=rho_phys,
        press=press,
        sspeed=sspeed,
        ptype=ptype,
        f_num=f_num,
    )
    # momentum-equation pressure: with k-epsilon the turbulent pressure
    # 2k/(3 rho) is added before the formulation-specific precalc
    # (pressure_for_precalc, forces_kernel.def:396-401); all other pressure
    # uses (density-diffusion gates, SA wall imposition) keep the raw EOS
    # pressure like the reference's particle_pressure
    press_pc = press
    if fw.visc.turbmodel == TurbulenceModel.KEPSILON:
        press_pc = press + 2.0 * state.extras["tke"] / (3.0 * rho_phys)
    fields["press_mom"] = press_pc

    grenier = fw.sph_formulation == SPHFormulation.SPH_GRENIER
    if grenier:
        # Grenier precalc is P/sigma (forces_kernel.def:445-455)
        if sigma is None:
            sigma = jnp.ones((state.capacity,), jnp.float32)
        fields["sigma"] = sigma
        fields["p_precalc"] = press_pc / jnp.maximum(sigma, 1e-30)
        fields["g_vol"] = jnp.exp(state.extras["grenier_J"]) * \
            state.extras["grenier_vol0"]
    elif fw.sph_formulation == SPHFormulation.SPH_HA:
        # Hu & Adams precalc is plain P (forces_kernel.def:458-467)
        fields["p_precalc"] = press_pc
    # pressure precalc: F1 and friends use P/rho^2 (forces_kernel.def:416-467)
    elif fw.sph_formulation != SPHFormulation.SPH_F2:
        fields["p_precalc"] = press_pc / (rho_phys * rho_phys)
    # per-particle dynamic viscosity for the laminar term
    if not fw.is_inviscid:
        visccoeff = eos._per_fluid(pp, f_num, [f.kinematic_visc for f in pp.fluids])
        if effvisc is not None:
            # shear-dependent rheologies: effective *kinematic* viscosity
            visccoeff = effvisc
        if fw.visc.turbmodel == TurbulenceModel.KEPSILON:
            # k-epsilon: the Morris term runs on the effective viscosity
            # nu + nu_t (get_visc_coeff, forces_kernel.def:2806-2822); the
            # k/e diffusion precalcs use rho*(nu + nu_t) and
            # rho*(nu + nu_t/sigma_eps) (compute_keps_term, :2925-2935)
            nut = state.extras["turbvisc"]
            fields["tke"] = state.extras["tke"]
            fields["eps"] = state.extras["eps"]
            fields["turbvisc"] = nut
            fields["lam_visc"] = visccoeff
            fields["dkdt_pre"] = rho_phys * (visccoeff + nut)
            fields["dedt_pre"] = rho_phys * (visccoeff + nut / 1.3)
            visccoeff = visccoeff + nut
        fields["dyn_visc"] = visccoeff * rho_phys
        fields["kinvisc"] = visccoeff
        if fw.visc.viscmodel == ViscousModel.ESPANOL_REVENGA:
            # second (bulk) viscosity, always dynamic (d_visc2coeff,
            # forces_kernel.def:293-301)
            fields["bulk_visc"] = eos._per_fluid(
                pp, f_num, [f.bulk_visc for f in pp.fluids]
            )
    if fw.visc.turbmodel == TurbulenceModel.SPS:
        if sps_tau is None:
            sps_tau = jnp.zeros((state.capacity, 6), jnp.float32)
        for c in range(6):
            fields[f"sps_tau{c}"] = sps_tau[:, c]
    if fw.sa_boundary:
        from .sa import sa_extra_fields

        fields.update(sa_extra_fields(state))
    return fields


def compute_forces(
    fw: SimFramework,
    grid: CellGrid,
    state: ParticleState,
    aux: CellAux,
    *,
    dt: Optional[jax.Array] = None,
    chunk_cells: int = 256,
    sps_tau=None,
    effvisc=None,
    sigma=None,
    t=None,
    gamma=None,
) -> ForcesOut:
    """One forces pass over the (sorted) particle state.

    ``gamma`` is the per-particle wall-renormalization factor for SA
    boundaries (from :func:`gpusph_tpu.ops.sa.compute_gamma`)."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    fields = _pair_fields(fw, state, sps_tau=sps_tau, effvisc=effvisc,
                          sigma=sigma)

    if fw.gcallback is not None:
        # variable gravity (ProblemCore::g_callback, evaluated per pass)
        gvec = fw.gcallback(t if t is not None else jnp.float32(0.0))
        gx, gy, gz = (jnp.asarray(c, jnp.float32) for c in gvec)
    else:
        gx, gy, gz = (jnp.float32(g) for g in pp.gravity)
    eps = pp.epsartvisc
    dyn = fw.boundarytype == BoundaryType.DYN_BOUNDARY
    sa = fw.sa_boundary
    keps = fw.visc.turbmodel == TurbulenceModel.KEPSILON
    grenier = fw.sph_formulation == SPHFormulation.SPH_GRENIER
    ha = fw.sph_formulation == SPHFormulation.SPH_HA
    FLUID = ParticleType.FLUID
    BOUND = ParticleType.BOUNDARY
    VERTEX = ParticleType.VERTEX

    def pair_fn(c, n, g):
        f = kernF(fw.kerneltype, g.r, h)  # [C,K,NB]

        relvx = c["vel_x"] - n["vel_x"]
        relvy = c["vel_y"] - n["vel_y"]
        relvz = c["vel_z"] - n["vel_z"]
        vel_dot_pos = g.dot_rel(relvx, relvy, relvz)

        c_fluid = c["ptype"] == FLUID
        n_fluid = n["ptype"] == FLUID
        c_bound = c["ptype"] == BOUND
        n_bound = n["ptype"] == BOUND

        m_n = n["mass"]
        rho_c = c["rho"]
        rho_n = n["rho"]

        out = {}

        # SA: vertex particles are mass-carrying volumic neighbors; segment
        # (PT_BOUNDARY) neighbors contribute only the gamma boundary terms.
        # The pair mask radius is expanded by dp/2 for the segments
        # (boundNlSqInflRad); volumic kernel terms must still cut at the
        # true influence radius (W/F polynomials are not masked beyond 2h,
        # ops/kernels.py)
        if sa:
            in_kernel = g.r2 < jnp.float32(sp.influenceradius**2)
            gmask = g.mask & in_kernel
            n_vol = n_fluid | (n["ptype"] == VERTEX)
            seg_mask = g.mask & c_fluid & n_bound
            from .sa import _sa_pair_inputs, grad_gamma_wendland

            q, qvb, ns = _sa_pair_inputs(c, n, g, h)
            ggamAS = jnp.where(seg_mask, grad_gamma_wendland(q, qvb, ns, h), 0.0)

        # --- continuity: DrDt = sum m_j (v_ij . r_ij) F_ij ------------------
        # (forces_kernel.def:2139-2155). With DYN boundaries, boundary
        # particles both receive and produce continuity contributions
        # (Dalrymple dynamic boundaries); with LJ/MK boundaries, boundary
        # particles take no part in continuity.
        if dyn:
            cont_mask = g.mask & (c_fluid | c_bound) & (n_fluid | n_bound)
        elif sa:
            cont_mask = gmask & c_fluid & n_vol
        else:
            cont_mask = g.mask & c_fluid & n_fluid
        if grenier:
            # Grenier: DrDt is actually DJ/Dt = -(1/sigma) sum (v.r) F;
            # no neighbor mass, 1/sigma applied in finalize
            # (forces_kernel.def:2016-2028, fixup :3183-3190)
            DrDt_term = -vel_dot_pos * f
        elif ha:
            # Hu & Adams: central mass replaces the neighbor mass
            # (forces_kernel.def:2031-2046)
            DrDt_term = c["mass"] * vel_dot_pos * f
        else:
            DrDt_term = m_n * vel_dot_pos * f
            if fw.sph_formulation == SPHFormulation.SPH_F2:
                # density-ratio correction (forces_kernel.def:2156-2171)
                DrDt_term = DrDt_term * rho_c / rho_n
        DrDt = jnp.where(cont_mask, DrDt_term, 0.0)

        if sa:
            # SA boundary continuity term (forces_kernel.def:2078-2091):
            # DrDt -= rho_a (v_as . n_s) ||grad gamma_as||
            DrDt = DrDt - jnp.where(
                seg_mask,
                rho_c * (relvx * ns[0] + relvy * ns[1] + relvz * ns[2]) * ggamAS,
                0.0,
            )

        DrDt = DrDt + _density_diffusion(
            fw, c, n, g, f,
            (gmask if sa else g.mask) & c_fluid & n_fluid, dt, (gx, gy, gz)
        )
        out["DrDt"] = DrDt

        # --- momentum: pressure gradient -----------------------------------
        if sa:
            mom_mask = gmask & c_fluid & n_vol
        else:
            mom_mask = g.mask & c_fluid & (n_fluid | n_bound if dyn else n_fluid)
        if fw.has_moving_bodies:
            # body force feedback: boundary centrals accumulate the
            # hydrodynamic terms from fluid neighbors (rbforces path,
            # forces_kernel.def COMPUTE_FORCE handling); euler ignores
            # boundary DvDt, the bodies subsystem reduces it per object
            mom_mask = mom_mask | (g.mask & c_bound & n_fluid)
        if fw.sph_formulation == SPHFormulation.SPH_F2:
            pgrad = (c["press_mom"] + n["press_mom"]) / (rho_c * rho_n)
        else:
            pgrad = c["p_precalc"] + n["p_precalc"]
        if ha:
            # Hu & Adams (non-SA): (P_a V_a^2 + P_b V_b^2) with the actual
            # volumes V = m/rho, weighted 1/m_a — DvDt is
            # -(1/rho_a)(1/V_a) sum (P_a V_a^2 + P_b V_b^2) grad W
            # (forces_kernel.def:2267-2285, contribution :2432-2447)
            m_c = jnp.maximum(c["mass"], 1e-30)  # pad rows have zero mass
            v_c = m_c / rho_c
            v_n = m_n / rho_n
            pgrad = c["p_precalc"] * v_c * v_c + n["p_precalc"] * v_n * v_n
            s = jnp.where(mom_mask, -(pgrad / m_c * f), 0.0)
        elif grenier:
            # pseudo surface tension between different fluids
            # (forces_kernel.def:2212-2242)
            if pp.epsinterface != 0.0:
                diff_fluid = c["f_num"] != n["f_num"]
                pgrad = pgrad + jnp.where(
                    diff_fluid & c_fluid & n_fluid,
                    pp.epsinterface
                    * (jnp.abs(c["p_precalc"]) + jnp.abs(n["p_precalc"])),
                    0.0,
                )
            # Grenier: DvDt -= pGradTerm F rel, no neighbor mass; the
            # 1/rho_a factor is applied in finalize (forces_kernel.def:2386-2392)
            s = jnp.where(mom_mask, -(pgrad * f), 0.0)
        else:
            # scalar pair coefficient s such that DvDt += s * rel
            s = jnp.where(mom_mask, -(pgrad * m_n * f), 0.0)

        # --- viscosity ------------------------------------------------------
        if fw.visc.turbmodel == TurbulenceModel.ARTIFICIAL:
            # Monaghan artificial viscosity (visc_kernel.cu:75-86)
            art = (
                vel_dot_pos
                * (h * pp.artvisccoeff)
                * (c["sspeed"] + n["sspeed"])
                / ((g.r2 + eps) * (rho_c + rho_n))
            )
            s = s + jnp.where(mom_mask & (vel_dot_pos < 0.0), art * m_n * f, 0.0)

        # accumulated relvel-direction coefficient
        sv = None
        if not fw.is_inviscid and fw.visc.viscmodel == ViscousModel.ESPANOL_REVENGA:
            # Espanol & Revenga (Phys Rev E 2003) volumic term
            # (forces_kernel.def:2650-2678):
            # DvDt += coeff [ (5 mu/3 - zeta) v_ab
            #                 + 5 (mu/3 + zeta) (v.r)/(r^2+eps) r_ab ]
            # with coeff = m_b/(rho_a rho_b) F  (Grenier: (1/s_a+1/s_b) F)
            visc_thirds = _avg(fw.visc.avgop, c["dyn_visc"], n["dyn_visc"]) / 3.0
            bulk = _avg(fw.visc.avgop, c["bulk_visc"], n["bulk_visc"])
            if grenier:
                vvc = (1.0 / c["sigma"] + 1.0 / n["sigma"]) * f
            else:
                vvc = m_n / (rho_c * rho_n) * f
            sv = jnp.where(mom_mask, vvc * (5.0 * visc_thirds - bulk), 0.0)
            s = s + jnp.where(
                mom_mask,
                vvc * 5.0 * (visc_thirds + bulk) * vel_dot_pos / (g.r2 + eps),
                0.0,
            )
        elif not fw.is_inviscid:
            # laminar viscous term (forces_kernel.def:2606-2626 + visc_avg.cu):
            # DvDt += 2 avg(mu) m_j/(rho_i rho_j) F * (viscous vector)
            mu_avg = _avg(fw.visc.avgop, c["dyn_visc"], n["dyn_visc"])
            if grenier:
                # Grenier volumic coefficient (1/sigma_a + 1/sigma_b); the
                # 1/rho_a factor comes from the fixup
                # (forces_kernel.def:2633-2646, :2580-2586)
                visc_coeff = mu_avg * (1.0 / c["sigma"] + 1.0 / n["sigma"])
            else:
                visc_coeff = 2.0 * mu_avg * m_n / (rho_c * rho_n)
            if fw.visc.viscmodel == ViscousModel.MONAGHAN:
                # projection form (forces_kernel.def:2531-2561)
                mon = jnp.where(vel_dot_pos < 0, vel_dot_pos / (g.r2 + eps), 0.0)
                coeff = pp.monaghan_visc_coeff
                if coeff != coeff:  # NaN -> default 1
                    coeff = 1.0
                s = s + jnp.where(mom_mask, coeff * visc_coeff * f * mon, 0.0)
            else:  # MORRIS
                sv = jnp.where(mom_mask, visc_coeff * f, 0.0)

        if fw.visc.turbmodel == TurbulenceModel.SPS:
            # SPS stress: DvDt += m_j F (tau_i + tau_j) . r_ij
            # (forces_kernel.def:2770-2790); tau as upper-tri 6-vector
            t0 = c["sps_tau0"] + n["sps_tau0"]
            t1 = c["sps_tau1"] + n["sps_tau1"]
            t2 = c["sps_tau2"] + n["sps_tau2"]
            t3 = c["sps_tau3"] + n["sps_tau3"]
            t4 = c["sps_tau4"] + n["sps_tau4"]
            t5 = c["sps_tau5"] + n["sps_tau5"]
            mf = jnp.where(mom_mask, m_n * f, 0.0)
            out["DvDt_x_extra"] = mf * (t0 * g.relx + t1 * g.rely + t2 * g.relz)
            out["DvDt_y_extra"] = mf * (t1 * g.relx + t3 * g.rely + t4 * g.relz)
            out["DvDt_z_extra"] = mf * (t2 * g.relx + t4 * g.rely + t5 * g.relz)

        # --- repulsive boundary force (LJ / MK) -----------------------------
        if fw.repulsive_boundary:
            rep_mask = g.mask & c_fluid & n_bound
            if fw.boundarytype == BoundaryType.LJ_BOUNDARY:
                # LJForce (forces_kernel.cu:75-103)
                safe_r = jnp.maximum(g.r, 1e-3 * pp.r0)
                ratio = pp.r0 / safe_r
                lj = (
                    pp.dcoeff
                    * (_powf(ratio, pp.p1coeff) - _powf(ratio, pp.p2coeff))
                    / (safe_r * safe_r)
                )
                lj = jnp.minimum(lj, 1e30)  # match forces_pallas clamp
                rep = jnp.where(g.r < pp.r0, lj, 0.0)
            else:
                # MKForce (forces_kernel.cu:105-133): 1D Wendland shape
                q = g.r / h
                wmk = 1.8 * (1.0 - 0.5 * q) ** 4 * (2.0 * q + 1.0)
                dist = jnp.maximum(eps, g.r - pp.mk_d)
                m_c = c["mass"]
                safe_r = jnp.maximum(g.r, 1e-12)
                rep = (
                    pp.mk_k
                    * wmk
                    * 2.0
                    * m_n
                    / (pp.mk_beta * dist * safe_r * (m_c + m_n))
                )
            s = s + jnp.where(rep_mask, rep, 0.0)

        out["DvDt_x"] = s * g.relx + (sv * relvx if sv is not None else 0.0)
        out["DvDt_y"] = s * g.rely + (sv * relvy if sv is not None else 0.0)
        out["DvDt_z"] = s * g.relz + (sv * relvz if sv is not None else 0.0)

        if sa:
            # SA boundary pressure term (forces_kernel.def:2416-2430):
            # DvDt += pGradTerm rho_s ||grad gamma_as|| n_s
            sseg = jnp.where(seg_mask, pgrad * rho_n * ggamAS, 0.0)
            out["DvDt_x"] = out["DvDt_x"] + sseg * ns[0]
            out["DvDt_y"] = out["DvDt_y"] + sseg * ns[1]
            out["DvDt_z"] = out["DvDt_z"] + sseg * ns[2]

        if keps:
            # --- k-epsilon (SA only; forces_kernel.def:2800-2985) ----------
            vol_k = gmask & c_fluid & n_vol
            k_c, k_n = c["tke"], n["tke"]
            e_c, e_n = c["eps"], n["eps"]
            # k/e diffusion, volumic (Morris-style, :2925-2935)
            coef_k = m_n * (
                c["dkdt_pre"] + rho_n * (n["lam_visc"] + n["turbvisc"])
            ) * f / rho_n
            coef_e = m_n * (
                c["dedt_pre"] + rho_n * (n["lam_visc"] + n["turbvisc"] / 1.3)
            ) * f / rho_n
            out["dk"] = jnp.where(vol_k, coef_k * (k_c - k_n), 0.0)
            de = jnp.where(vol_k, coef_e * (e_c - e_n), 0.0)
            # normal distance to the segment, floored at deltap (r_as,
            # forces_kernel.def:1148)
            r_as = jnp.maximum(
                jnp.abs(g.relx * ns[0] + g.rely * ns[1] + g.relz * ns[2]),
                sp.deltap,
            )
            # boundary epsilon diffusion: 4 C_mu/sigma_e k^2/r_as |ggam|
            de = de + jnp.where(
                seg_mask, 0.276923077 * k_c * k_c / r_as * ggamAS, 0.0
            )
            out["de"] = de
            # Yap correction: ce2 reduced near walls (:2961-2966)
            lyap = 0.400772603 * k_c * jnp.sqrt(jnp.maximum(k_c, 0.0)) / (
                jnp.maximum(e_c, 1e-10) * r_as
            )
            ce2cand = jnp.where(
                lyap > 1.0,
                jnp.maximum(1.92 - 0.83 * (lyap - 1.0) * lyap * lyap, 0.0),
                1.92,
            )
            out["min_ce2"] = jnp.where(seg_mask, ce2cand, jnp.inf)
            # strain-rate tensor accumulation (add_strain_rate, :926-940):
            # volumic mul = -m_b rel F; boundary mul = |ggam| n rho_s
            mulx = jnp.where(vol_k, -m_n * g.relx * f, 0.0) + jnp.where(
                seg_mask, ggamAS * ns[0] * rho_n, 0.0)
            muly = jnp.where(vol_k, -m_n * g.rely * f, 0.0) + jnp.where(
                seg_mask, ggamAS * ns[1] * rho_n, 0.0)
            mulz = jnp.where(vol_k, -m_n * g.relz * f, 0.0) + jnp.where(
                seg_mask, ggamAS * ns[2] * rho_n, 0.0)
            out["t_xx"] = relvx * mulx
            out["t_xy"] = relvx * muly + relvy * mulx
            out["t_xz"] = relvx * mulz + relvz * mulx
            out["t_yy"] = relvy * muly
            out["t_yz"] = relvy * mulz + relvz * muly
            out["t_zz"] = relvz * mulz
            # wall-function friction (log-law, :2824-2874): iterative u*
            ut_x = relvx - (relvx * ns[0] + relvy * ns[1] + relvz * ns[2]) * ns[0]
            ut_y = relvy - (relvx * ns[0] + relvy * ns[1] + relvz * ns[2]) * ns[1]
            ut_z = relvz - (relvx * ns[0] + relvy * ns[1] + relvz * ns[2]) * ns[2]
            abs_ut = jnp.sqrt(ut_x * ut_x + ut_y * ut_y + ut_z * ut_z)
            nu_lam = c["lam_visc"]
            uk = 0.547722558 * jnp.sqrt(jnp.maximum(k_c, 0.0))
            y_plus0 = r_as / jnp.maximum(nu_lam, 1e-12) * uk
            # viscous sublayer value
            u_star_visc = abs_ut / jnp.maximum(y_plus0, 1e-12)
            # log-law fixed point (10 iterations like the reference)
            utau = 0.118599857 * n["lam_visc"] / r_as
            for _ in range(10):
                y_plus = jnp.maximum(
                    r_as * utau / jnp.maximum(n["lam_visc"], 1e-12), 2.43902439
                )
                utau = (0.41 * abs_ut + utau) / (jnp.log(y_plus) + 3.132)
            u_star_log = abs_ut / (jnp.log(y_plus) / 0.41 + 5.2)
            u_star = jnp.where(y_plus0 < 2.43902439, u_star_visc, u_star_log)
            wf_mask = seg_mask & (k_c >= 1e-6)
            wcoef = jnp.where(
                wf_mask,
                -2.0 * ggamAS * u_star * u_star / jnp.maximum(abs_ut, 1e-6),
                0.0,
            )
            out["DvDt_x"] = out["DvDt_x"] + wcoef * ut_x
            out["DvDt_y"] = out["DvDt_y"] + wcoef * ut_y
            out["DvDt_z"] = out["DvDt_z"] + wcoef * ut_z

        if fw.flags & SimFlags.ENABLE_INTERNAL_ENERGY:
            # dU/dt -= (a_pair . v_ij)/2 (forces_kernel.def:3306-3316)
            dedt = s * vel_dot_pos
            if sv is not None:
                dedt = dedt + sv * (relvx * relvx + relvy * relvy + relvz * relvz)
            out["DEDt"] = -0.5 * dedt
        if "DvDt_x_extra" in out:
            out["DvDt_x"] = out["DvDt_x"] + out.pop("DvDt_x_extra")
            out["DvDt_y"] = out["DvDt_y"] + out.pop("DvDt_y_extra")
            out["DvDt_z"] = out["DvDt_z"] + out.pop("DvDt_z_extra")

        # --- XSPH mean velocity (forces_kernel.def:2986-2994; the written
        # value carries a factor 2, write_xsph forces_kernel.def:3368) -------
        if fw.has_xsph:
            w = kernW(fw.kerneltype, g.r, h)
            xw = jnp.where(
                (gmask if sa else g.mask) & c_fluid & n_fluid,
                -2.0 * m_n * w / (rho_c + rho_n), 0.0,
            )
            out["xsph_x"] = xw * relvx
            out["xsph_y"] = xw * relvy
            out["xsph_z"] = xw * relvz

        return out

    nl_radius = sp.influenceradius + (0.5 * sp.deltap if sa else 0.0)
    sums = neighbor_apply(
        grid,
        aux,
        fields,
        pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        # SA: segments act through their whole triangle -> expanded mask
        # radius (volumic kernel terms vanish beyond 2h anyway)
        influenceradius=nl_radius,
        chunk_cells=chunk_cells,
    )

    ptype = fields["ptype"]
    is_fluid_c = ptype == FLUID

    # --- finalize (finalizeforcesDevice, forces_kernel.def:4037-4110) ------
    DvDt = merge_vec(sums, "DvDt")
    if grenier:
        # Grenier fixup: pair-sum force /= rho, DJ/Dt /= sigma
        # (forces_kernel.def:3183-3190), applied before gravity
        DvDt = DvDt / fields["rho"][:, None]
    if sa:
        # SA fixup: pair sums divided by gamma before gravity
        # (forces_fixup, forces_kernel.def:3225-3240)
        if gamma is None:
            gamma = jnp.ones((state.capacity,), jnp.float32)
        gdiv = jnp.where(is_fluid_c, gamma, 1.0)
        DvDt = DvDt / gdiv[:, None]
        sums["DrDt"] = sums["DrDt"] / gdiv
    DvDt = DvDt + jnp.where(
        is_fluid_c[:, None],
        jnp.stack([gx, gy, gz])[None, :],
        0.0,
    )
    if not fw.has_moving_bodies:
        # boundary particles never accelerate (their velocity is imposed);
        # with moving bodies their rows carry the hydrodynamic force for the
        # per-body reduction (euler still never integrates them)
        DvDt = jnp.where(is_fluid_c[:, None], DvDt, 0.0)
    if fw.planes:
        from .planes import apply_plane_forces

        DvDt = apply_plane_forces(
            fw, state.pos, state.vel, state.mass, is_fluid_c, DvDt
        )
    if fw.dem is not None:
        # DEM terrain geometry force (geom_core.cu DemTangentPlane + LJ)
        from .dem import apply_dem_force

        DvDt = apply_dem_force(
            fw, state.pos, state.vel, state.mass, is_fluid_c, DvDt
        )
    if grenier:
        # Grenier: DrDt holds DJ/Dt = (pair sum)/sigma (fixup, :3183-3190);
        # euler integrates J, density comes from the COMPUTE_DENSITY pass
        DrDt = sums["DrDt"] / jnp.maximum(fields["sigma"], 1e-30)
    else:
        # convert physical DrDt to relative-density rate (forces_kernel.def:4581)
        rho0 = eos._per_fluid(fw.pp, fields["f_num"], [f.rho0 for f in fw.pp.fluids])
        DrDt = sums["DrDt"] / rho0

    if fw.has_xsph:
        xsph = merge_vec(sums, "xsph")
    else:
        xsph = jnp.zeros_like(state.vel)
    DEDt = sums.get("DEDt", jnp.zeros_like(DrDt))

    if keps:
        # k-eps fixup (viscous_fixup, forces_kernel.def:3120-3170):
        # divide by rho*gamma, add turbulent production
        rho_a = fields["rho"]
        gam_a = gamma if gamma is not None else jnp.ones_like(rho_a)
        rhoGam = jnp.maximum(rho_a * gam_a, 1e-12)
        diff_k = sums["dk"] / rhoGam
        diff_e = sums["de"] / rhoGam
        SijSij_bytwo = (
            2.0 * (sums["t_xx"] ** 2 + sums["t_yy"] ** 2 + sums["t_zz"] ** 2)
            + sums["t_xy"] ** 2 + sums["t_xz"] ** 2 + sums["t_yz"] ** 2
        )
        S = jnp.sqrt(SijSij_bytwo) / rhoGam
        SijSij_bytwo = SijSij_bytwo / (rhoGam * rhoGam)
        k_a = fields["tke"]
        e_a = jnp.maximum(fields["eps"], 1e-10)
        nut_a = fields["turbvisc"]
        Pturb = jnp.minimum(nut_a * SijSij_bytwo, 0.3 * k_a * S)
        diff_k = diff_k + Pturb
        diff_e = diff_e + e_a * 1.44 * Pturb / jnp.maximum(k_a, 1e-10)
        ce2 = jnp.minimum(sums["min_ce2"], 1.92)
        dkde = jnp.where(
            is_fluid_c[:, None],
            jnp.stack([diff_k, diff_e, ce2], axis=-1),
            0.0,
        )
    else:
        dkde = jnp.zeros(())

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
        DEDt=DEDt,
        max_accel=max_accel,
        max_sspeed=max_sspeed,
        max_kinvisc=max_kinvisc,
        dkde=dkde,
    )


def _density_diffusion(fw, c, n, g, f, ff_mask, dt, gvec=None):
    """Density-diffusion DrDt contribution (physical units).

    Ferrari: forces_kernel.def:1609-1640; Colagrossi: :1910-1953;
    Brezzi: :1763-1790.  All restricted to fluid-fluid pairs.
    ``gvec`` carries the (possibly time-dependent) gravity components.
    """
    ddt = fw.densitydiffusiontype
    if ddt == DensityDiffusionType.NONE:
        return jnp.zeros_like(g.r2)

    pp, sp = fw.pp, fw.sp
    gx, gy, gz = gvec if gvec is not None else pp.gravity
    rho_c = c["rho"]
    rho_n = n["rho"]
    m_n = n["mass"]
    same_fluid = c["f_num"] == n["f_num"]
    g_dot_rel = g.dot_rel(
        jnp.asarray(gx, jnp.float32),
        jnp.asarray(gy, jnp.float32),
        jnp.asarray(gz, jnp.float32),
    )
    ha = fw.sph_formulation == SPHFormulation.SPH_HA
    if ha:
        # actual volumes; Hu & Adams' variants replace the density-difference
        # terms with mass/volume expressions so unequal particle masses do
        # not drive spurious diffusion (forces_kernel.def:1639-1678,
        # :1787-1815, :1954-1996; volume_fraction == 1 off SA boundaries)
        m_c = jnp.maximum(c["mass"], 1e-30)
        v_c = m_c / rho_c
        v_n = jnp.maximum(m_n, 1e-30) / rho_n

    if ddt == DensityDiffusionType.COLAGROSSI:
        # gate: only when pressure jump exceeds the hydrostatic jump
        gate = jnp.abs(c["press"] - n["press"]) >= jnp.abs(g_dot_rel * rho_c)
        c0 = eos._per_fluid(pp, c["f_num"], [fl.c0 for fl in pp.fluids])
        coeff = sp.densityDiffCoeff * 2.0 * sp.slength  # xi*2h (ProblemCore.cc:1416)
        if fw.sph_formulation == SPHFormulation.SPH_GRENIER:
            # volume-based variant (forces_kernel.def:1582-1592, 1938-1952):
            # volume_ratio = vol_c/vol_n, weight -1 instead of neighbor mass
            diff = coeff * c0 * (c["g_vol"] / n["g_vol"] - 1.0) * f * (-1.0)
        elif ha:
            # HA variant: volume ratio, weighted by the CENTRAL mass
            # (forces_kernel.def:1954-1996)
            diff = coeff * c0 * (v_c / v_n - 1.0) * f * c["mass"]
        else:
            diff = coeff * c0 * (rho_n / rho_c - 1.0) * f * m_n
        return jnp.where(ff_mask & same_fluid & gate, -diff, 0.0)

    if ddt == DensityDiffusionType.FERRARI:
        sq_c0 = eos._per_fluid(pp, c["f_num"], [fl.c0 * fl.c0 for fl in pp.fluids])
        rho0_c = eos._per_fluid(pp, c["f_num"], [fl.rho0 for fl in pp.fluids])
        grav_corr = -g_dot_rel * rho0_c / sq_c0
        max_ss = jnp.maximum(c["sspeed"], n["sspeed"])
        safe = g.r > 1e-4 * sp.slength
        if ha:
            # (rho_c - rho_n) replaced by m_a (1/V_a - 1/V_n), same-fluid
            # pairs only (forces_kernel.def:1639-1678)
            dd = c["mass"] * (1.0 / v_c - 1.0 / v_n)
            ferr = jnp.where(safe, max_ss * (dd + grav_corr) / rho_c * g.r, 0.0)
            return jnp.where(
                ff_mask & same_fluid, sp.densityDiffCoeff * m_n * ferr * f, 0.0
            )
        ferr = jnp.where(safe, max_ss * (rho_c - rho_n + grav_corr) / rho_c * g.r, 0.0)
        return jnp.where(ff_mask, sp.densityDiffCoeff * m_n * ferr * f, 0.0)

    if ddt == DensityDiffusionType.BREZZI:
        if dt is None:
            dt = jnp.zeros((), jnp.float32)
        if ha:
            # 2/(rho_c+rho_n) replaced by 2/(m_a (1/V_a + 1/V_n))
            # (forces_kernel.def:1787-1815)
            inv_rho_avg = 2.0 / (c["mass"] * (1.0 / v_c + 1.0 / v_n) + 1e-30)
        else:
            inv_rho_avg = 2.0 / (rho_c + rho_n)
        term = (
            sp.densityDiffCoeff
            * (inv_rho_avg * (c["press"] - n["press"]) - g_dot_rel)
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
