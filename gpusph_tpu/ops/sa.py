"""Semi-analytical (SA) boundaries: gamma quadrature, analytic grad-gamma,
and the segment/vertex boundary-condition passes.

TPU-native re-derivation of the reference's SA machinery (Ferrand et al.):

* ``gamma`` / ``grad gamma``: the wall-renormalization factor
  gamma_a = 1 - sum_s gamma_as and its gradient sum_s ||grad gamma_as|| n_s,
  with gamma_as evaluated by a 5th-order Gaussian quadrature over each
  boundary element (triangle) and ||grad gamma_as|| by the analytical
  Wendland formula — ports of `src/cuda/gamma.cuh:96-515` (wendlandOnSegment,
  gaussQuadratureO5, gradGamma<WENDLAND>, Gamma<WENDLAND, PT_FLUID>) and
  `initGammaDevice` (`boundary_conditions_kernel.cu:1893`).

  This build recomputes gamma by quadrature at every forces pass (the
  reference's QUADRATURE gamma mode) instead of integrating dgamma/dt —
  stateless and exactly consistent at every step, at the cost of the
  quadrature FLOPs (a fluid particle has only a handful of segment
  neighbors, so the pass is cheap relative to the volumic pair pass).

* boundary conditions: segments and vertices get their density imposed from
  the Shepard-weighted, hydrostatically-corrected fluid pressure
  (`saSegmentBoundaryConditionsDevice` fluid loop + impose_solid_bc,
  `src/cuda/boundary_conditions_kernel.cu:1427-1530,1290-1320`).

Segment data lives in the particle state's extras: ``belem`` [N,3] (inward
unit normal; also set for vertices = averaged adjacent segment normals, used
by the BC gate) and ``vr0/vr1/vr2`` [N,3] (triangle vertex positions
relative to the segment barycenter; zeros for non-segments).  The mesh
builder (`gpusph_tpu.geometry.sa_mesh`) guarantees the counter-clockwise
vertex ordering (cross(v1-v0, v2-v0) parallel to the inward normal) that the
analytic grad-gamma formula requires (reference initConnectivity invariant).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..defs import ParticleType
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, part_type
from . import eos
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec
from .kernels import W as kernW

# 5th-order Gaussian quadrature on the triangle (gamma.cuh:43-55), with the
# multiplicities expanded to the 7 explicit (weight, b0, b1, b2) points
_GQ5 = []
_gq_w = (0.225, 0.132394152788506, 0.125939180544827)
_gq_p = (
    (0.333333333333333, 0.333333333333333, 0.333333333333333),
    (0.059715871789770, 0.470142064105115, 0.470142064105115),
    (0.797426985353087, 0.101286507323456, 0.101286507323456),
)
_gq_mult = (1, 3, 3)
for _i in range(3):
    for _j in range(_gq_mult[_i]):
        p = _gq_p[_i]
        _GQ5.append((_gq_w[_i], p[_j % 3], p[(_j + 1) % 3], p[(_j + 2) % 3]))

# integrated Wendland coefficient 1/(32 pi) (gamma.cuh:102)
_WENDLAND_I = 1.0 / (32.0 * math.pi)


def _wendland_on_segment(q):
    """Integral of the Wendland kernel over the half-line (gamma.cuh:94-113)."""
    qs = jnp.maximum(q, 1e-6)
    tmp = jnp.maximum(1.0 - 0.5 * qs, 0.0)
    t2 = tmp * tmp
    t5 = t2 * t2 * tmp
    uq = 1.0 / qs
    val = _WENDLAND_I * t5 * ((((8.0 * uq + 20.0) * uq + 30.0) * uq) + 21.0)
    return jnp.where(q < 2.0, val, 0.0)


def _gauss_quadrature_o5(u0, u1, u2, q):
    """Surface integral of the integrated-Wendland function over the
    triangle with vertices u0,u1,u2 (h-units, relative to barycenter),
    evaluated at the particle position q (gamma.cuh:139-165).

    All arguments are (x,y,z) component triples of broadcastable arrays.
    """
    val = 0.0
    for (w, b0, b1, b2) in _GQ5:
        pax = u0[0] * b0 + u1[0] * b1 + u2[0] * b2 - q[0]
        pay = u0[1] * b0 + u1[1] * b1 + u2[1] * b2 - q[1]
        paz = u0[2] * b0 + u1[2] * b1 + u2[2] * b2 - q[2]
        val = val + w * _wendlandOnSeg_len(pax, pay, paz)
    # triangle area (in h^2 units)
    e1 = tuple(u1[k] - u0[k] for k in range(3))
    e2 = tuple(u2[k] - u0[k] for k in range(3))
    cx = e1[1] * e2[2] - e1[2] * e2[1]
    cy = e1[2] * e2[0] - e1[0] * e2[2]
    cz = e1[0] * e2[1] - e1[1] * e2[0]
    vol = 0.5 * jnp.sqrt(cx * cx + cy * cy + cz * cz)
    return val * vol


def _wendlandOnSeg_len(x, y, z):
    return _wendland_on_segment(jnp.sqrt(x * x + y * y + z * z))


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm3(a):
    return jnp.sqrt(jnp.maximum(_dot3(a, a), 1e-20))


def _normalize3(a):
    n = _norm3(a)
    return tuple(c / n for c in a)


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def grad_gamma_wendland(q, qvb, ns, slength):
    """|| grad gamma_as || — analytic Wendland formula, vectorized port of
    `gradGamma<WENDLAND>` (gamma.cuh:247-371).

    ``q``: particle position relative to the segment barycenter (h-units),
    component triple; ``qvb``: tuple of 3 component-triples, the *negated*
    vertex positions relative to the barycenter in h-units (the reference's
    calcVertexRelPos convention, gamma.cuh:197-226); ``ns``: inward unit
    normal triple.
    """
    pas = _dot3(ns, q)
    qas = jnp.abs(pas)
    qas2 = qas * qas
    qas4 = qas2 * qas2
    qas5 = qas4 * qas

    gradG = 0.0
    totalSumAngles = 0.0
    sumAngles = 0.0

    for e in range(3):
        s0 = qvb[e % 3]
        s1 = qvb[(e + 1) % 3]
        v01 = _normalize3(tuple(s0[k] - s1[k] for k in range(3)))
        ne = _normalize3(_cross3(ns, v01))
        qm0 = tuple(q[k] - s0[k] for k in range(3))
        qm1 = tuple(q[k] - s1[k] for k in range(3))
        pae = _dot3(ne, qm0)
        # distance from the particle to the edge line
        qae = _norm3(tuple(pas * ns[k] + pae * ne[k] for k in range(3)))
        pav0 = -_dot3(qm0, v01)
        pav1 = -_dot3(qm1, v01)

        ang = jnp.arctan2(pav1, jnp.abs(pae)) - jnp.arctan2(pav0, jnp.abs(pae))
        ang = jnp.copysign(ang, pae)
        totalSumAngles = totalSumAngles + ang

        near = qae < 2.0
        qae_c = jnp.minimum(qae, 2.0 - 1e-6)
        lim = jnp.sqrt(jnp.maximum(4.0 - qae_c * qae_c, 0.0))
        pav0c = jnp.copysign(jnp.minimum(jnp.abs(pav0), lim), pav0)
        pav1c = jnp.copysign(jnp.minimum(jnp.abs(pav1), lim), pav1)
        pav02 = pav0c * pav0c
        pav12 = pav1c * pav1c
        qav0 = jnp.minimum(jnp.sqrt(qae_c * qae_c + pav02), 2.0)
        qav1 = jnp.minimum(jnp.sqrt(qae_c * qae_c + pav12), 2.0)
        pae2 = pae * pae
        pae4 = pae2 * pae2
        pae6 = pae4 * pae2

        COEFF = 1.0 / 2048.0 / math.pi
        qae_f = jnp.maximum(qae_c, 1e-7)
        term = COEFF * (
            48.0 * qas5 * (28.0 + qas2) * (
                jnp.arctan2(qas * pav1c, pae * qav1) - jnp.arctan2(pav1c, pae)
                - (jnp.arctan2(qas * pav0c, pae * qav0) - jnp.arctan2(pav0c, pae))
            )
            + pae * (
                pav1c * (
                    3.0 * qas4 * (-420.0 + 29.0 * qav1)
                    + pae4 * (-420.0 + 33.0 * qav1)
                    + 2.0 * qas2 * (-210.0 * (8.0 + pav12) + 756.0 * qav1 + 19.0 * pav12 * qav1)
                    + 4.0 * (336.0 + pav12 * (pav12 * (-21.0 + 2.0 * qav1) + 28.0 * (-5.0 + 3.0 * qav1)))
                    + 2.0 * pae2 * (420.0 * (-2.0 + qav1) + 6.0 * qas2 * (-105.0 + 8.0 * qav1) + pav12 * (-140.0 + 13.0 * qav1))
                )
                - pav0c * (
                    3.0 * qas4 * (-420.0 + 29.0 * qav0)
                    + pae4 * (-420.0 + 33.0 * qav0)
                    + 2.0 * qas2 * (-210.0 * (8.0 + pav02) + 756.0 * qav0 + 19.0 * pav02 * qav0)
                    + 4.0 * (336.0 + pav02 * (pav02 * (-21.0 + 2.0 * qav0) + 28.0 * (-5.0 + 3.0 * qav0)))
                    + 2.0 * pae2 * (420.0 * (-2.0 + qav0) + 6.0 * qas2 * (-105.0 + 8.0 * qav0) + pav02 * (-140.0 + 13.0 * qav0))
                )
                + 3.0 * (
                    5.0 * pae6 + 21.0 * pae4 * (8.0 + qas2)
                    + 35.0 * pae2 * qas2 * (16.0 + qas2) + 35.0 * qas4 * (24.0 + qas2)
                ) * (
                    jnp.copysign(1.0, pav1c) * jnp.arccosh(jnp.maximum(qav1 / qae_f, 1.0))
                    - jnp.copysign(1.0, pav0c) * jnp.arccosh(jnp.maximum(qav0 / qae_f, 1.0))
                )
            )
        )
        gradG = gradG + jnp.where(near, term, 0.0)
        # NB: the reference adds the *clipped* pav angles here (pav0/pav1
        # are reassigned before the sumAngles line, gamma.cuh:356)
        ang_c = jnp.copysign(
            jnp.arctan2(pav1c, jnp.abs(pae)) - jnp.arctan2(pav0c, jnp.abs(pae)),
            pae,
        )
        sumAngles = sumAngles + jnp.where(near, ang_c, 0.0)

    # clipped-vertex / non-intersected-edge correction (gamma.cuh:362-369)
    tmp1 = jnp.maximum(1.0 - 0.5 * qas, 0.0)
    t2 = tmp1 * tmp1
    t5 = t2 * t2 * tmp1
    COEFF2 = 3.0 / 16.0 / math.pi
    gradG = gradG + (sumAngles - totalSumAngles) * COEFF2 * t5 * (
        2.0 + 5.0 * qas + 4.0 * qas2
    )
    return jnp.where(qas < 2.0, gradG / slength, 0.0)


def gamma_fluid_wendland(q, qvb, ns, epsilon=0.01):
    """gamma_as for a (fluid) particle vs one segment — quadrature form
    (Gamma<WENDLAND, PT_FLUID>, gamma.cuh:398-436)."""
    pas = _dot3(ns, q)
    q_aSigma = jnp.minimum(jnp.abs(pas), 2.0)
    # quadrature vertices are the *positive* vertex rel positions (-qvb)
    u0 = tuple(-c for c in qvb[0])
    u1 = tuple(-c for c in qvb[1])
    u2 = tuple(-c for c in qvb[2])
    intVal = _gauss_quadrature_o5(u0, u1, u2, q)
    g = intVal * pas
    return jnp.where((q_aSigma < 2.0) & (q_aSigma > epsilon), g, 0.0)


def _sa_pair_inputs(c, n, g, slength):
    """Common geometry for fluid-vs-segment pair terms: q (rel in h-units),
    qvb (negated vertex rel positions in h-units), ns (neighbor normal)."""
    inv_h = 1.0 / slength
    q = (g.relx * inv_h, g.rely * inv_h, g.relz * inv_h)
    ns = (n["nrm_x"], n["nrm_y"], n["nrm_z"])
    qvb = tuple(
        tuple(-n[f"vr{i}_{ax}"] * inv_h for ax in "xyz") for i in range(3)
    )
    return q, qvb, ns


def sa_extra_fields(state: ParticleState):
    """Per-particle SA fields for the pair passes (normals + vertex rel
    positions, zeros on non-segment rows)."""
    out = {}
    out.update(split_vec("nrm", state.extras["belem"]))
    for i in range(3):
        out.update(split_vec(f"vr{i}", state.extras[f"vr{i}"]))
    return out


def compute_gamma(fw: SimFramework, grid: CellGrid, state: ParticleState,
                  aux: CellAux, *, chunk_cells: int = 256):
    """(gamma [N], grad_gamma [N,3]) for every particle by quadrature over
    segment neighbors (initGammaDevice semantics, run every pass)."""
    sp = fw.sp
    h = sp.slength
    ptype = part_type(state.info)
    fields = dict(
        **split_vec("pos", state.pos),
        ptype=ptype,
        mass=state.mass,
        rho=jnp.ones_like(state.rho),
        **sa_extra_fields(state),
    )
    BOUND = ParticleType.BOUNDARY

    def pair_fn(c, n, g):
        is_seg = n["ptype"] == BOUND
        q, qvb, ns = _sa_pair_inputs(c, n, g, h)
        gg = grad_gamma_wendland(q, qvb, ns, h)
        gam = gamma_fluid_wendland(q, qvb, ns)
        ok = g.mask & is_seg
        return {
            "gamma_def": jnp.where(ok, gam, 0.0),
            "gg_x": jnp.where(ok, gg * ns[0], 0.0),
            "gg_y": jnp.where(ok, gg * ns[1], 0.0),
            "gg_z": jnp.where(ok, gg * ns[2], 0.0),
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        # segments interact through their whole triangle: expanded search
        # radius (reference boundNlSqInflRad, GPUWorker.cc:1890)
        influenceradius=sp.influenceradius + 0.5 * sp.deltap,
        chunk_cells=chunk_cells,
    )
    gamma = jnp.clip(1.0 - sums["gamma_def"], 1e-3, 1.0)
    # segments/vertices sit on the wall where the quadrature is singular;
    # their gamma is only used as a Shepard floor -> flat-wall value 0.5
    on_wall = ptype != ParticleType.FLUID
    gamma = jnp.where(on_wall, 0.5, gamma)
    ggam = jnp.stack([sums["gg_x"], sums["gg_y"], sums["gg_z"]], axis=-1)
    return gamma, ggam


def impose_boundary_conditions(fw: SimFramework, grid: CellGrid,
                               state: ParticleState, aux: CellAux,
                               gamma, *, chunk_cells: int = 256, t=None,
                               waterdepth=None):
    """Impose wall density on segments and vertices from the fluid
    (saSegment/VertexBoundaryConditionsDevice fluid loops + impose_solid_bc).

    ``waterdepth`` is the per-open-boundary f32[n_boxes] from
    ``io_water_depth`` (FIND_MAX_IOWATERDEPTH), forwarded to 3-argument
    ``imposed_press`` callbacks.

    Returns the state with segment/vertex rho replaced.
    """
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    f_num = fluid_num(state.info)
    ptype = part_type(state.info)
    press = eos.pressure(pp, state.rho, f_num)
    rho_phys = eos.physical_density(pp, state.rho, f_num)
    gvec = pp.gravity

    from ..defs import TurbulenceModel

    keps = fw.visc.turbmodel == TurbulenceModel.KEPSILON
    fields = dict(
        **split_vec("pos", state.pos),
        mass=state.mass,
        rho=rho_phys,
        press=press,
        ptype=ptype,
        **{k: v for k, v in sa_extra_fields(state).items()
           if k.startswith("nrm")},
    )
    if keps:
        fields["tke"] = state.extras["tke"]
        fields["eps"] = state.extras["eps"]
    has_io = fw.io is not None
    if has_io:
        # IO rows need the interior fluid velocity extrapolated onto the
        # wall: uInt feeds the Riemann-invariant imposition
        # (calculateIOboundaryCondition, boundary_conditions_kernel.cu:109-200)
        fields.update(split_vec("vel", state.vel))

    FLUID = ParticleType.FLUID

    def pair_fn(c, n, g):
        c_wall = c["ptype"] != FLUID
        n_fluid = n["ptype"] == FLUID
        # fluid on the inner side of the wall normal (r_wall - r_fluid
        # against the inward normal)
        inner = (
            c["nrm_x"] * g.relx + c["nrm_y"] * g.rely + c["nrm_z"] * g.relz
        ) < 0.0
        # wall BC sums are fluid-kernel sums: true influence radius
        ok = g.mask & c_wall & n_fluid & inner & (
            g.r2 < jnp.float32(sp.influenceradius**2)
        )
        w = kernW(fw.kerneltype, g.r, h)
        # hydrostatically-corrected wall pressure (bc_kernel.cu:1513)
        g_dot_rel = gvec[0] * g.relx + gvec[1] * g.rely + gvec[2] * g.relz
        pwall = jnp.maximum(n["press"] + n["rho"] * g_dot_rel, 0.0)
        out = {
            "sumpWall": jnp.where(ok, pwall * w, 0.0),
            "shepard": jnp.where(ok, w, 0.0),
        }
        if keps:
            # k-eps wall values are Shepard averages of the fluid
            # (keps_fluid_contrib / impose_solid_keps_bc,
            # boundary_conditions_kernel.cu:1266-1270)
            out["sumtke"] = jnp.where(ok, n["tke"] * w, 0.0)
            out["sumeps"] = jnp.where(ok, n["eps"] * w, 0.0)
        if has_io:
            out["sumvx"] = jnp.where(ok, n["vel_x"] * w, 0.0)
            out["sumvy"] = jnp.where(ok, n["vel_y"] * w, 0.0)
            out["sumvz"] = jnp.where(ok, n["vel_z"] * w, 0.0)
        return out

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    shepard = jnp.maximum(sums["shepard"], 0.1 * gamma)
    p_wall = sums["sumpWall"] / shepard
    rho_wall = eos.density_from_pressure(pp, p_wall, f_num)
    is_wall = (ptype == ParticleType.BOUNDARY) | (ptype == ParticleType.VERTEX)
    new_vel = state.vel
    if fw.io is not None:
        # Open boundaries: the prescribed component (velocity for VEL_IO,
        # pressure for PRES_IO) determines the other via the appropriate
        # Riemann invariant of the 1D characteristic problem normal to the
        # boundary (calculateIOboundaryCondition,
        # boundary_conditions_kernel.cu:109-200; theory
        # gpusph-theory.tex:798-980).
        from ..state import (FG_CORNER, FG_INLET, FG_OUTLET,
                             FG_VELOCITY_DRIVEN, has_flag)

        io_row = is_wall & (
            has_flag(state.info, FG_INLET) | has_flag(state.info, FG_OUTLET)
        ) & ~has_flag(state.info, FG_CORNER)
        tt = t if t is not None else jnp.float32(0.0)

        # interior (fluid-extrapolated) state on the wall
        nrm = jnp.stack(
            [fields["nrm_x"], fields["nrm_y"], fields["nrm_z"]], axis=-1)
        u_int = jnp.stack(
            [sums["sumvx"], sums["sumvy"], sums["sumvz"]], axis=-1
        ) / shepard[:, None]
        un_int = jnp.sum(u_int * nrm, axis=-1)
        rho_int = rho_wall
        c_int = eos.sound_speed(pp, rho_int, f_num)
        r_int = eos.riemann_celerity(pp, rho_int, f_num)
        lam_int = un_int + c_int
        c0 = eos._per_fluid(pp, f_num, [f.c0 for f in pp.fluids])

        if fw.io.imposed_vel is not None:
            # VEL_IO: impose velocity => density from the Riemann invariant
            # (bc_kernel.cu:126-143).  The imposed velocity was pinned onto
            # the rows by impose_io_values before this pass.
            vel_row = io_row & has_flag(state.info, FG_VELOCITY_DRIVEN)
            un_ext = jnp.sum(state.vel * nrm, axis=-1)
            # expansion wave
            r_exp = r_int + (un_ext - un_int)
            # shock wave: density behind the shock from the jump condition
            p_int = eos.pressure(pp, rho_int, f_num)
            rho_phys_int = eos.physical_density(pp, rho_int, f_num)
            p_shock = p_int + rho_phys_int * un_int * (un_int - un_ext)
            rho_shock = eos.density_from_pressure(
                pp, jnp.maximum(p_shock, 0.0), f_num)
            c_shock = eos.sound_speed(pp, rho_shock, f_num)
            r_shock = jnp.where(
                un_ext + c_shock <= lam_int,
                r_int,  # contact discontinuity
                eos.riemann_celerity(pp, rho_shock, f_num),
            )
            r_io = jnp.where(un_ext <= un_int, r_exp, r_shock)
            rho_wall = jnp.where(
                vel_row,
                eos.density_from_riemann_celerity(pp, r_io, f_num),
                rho_wall,
            )
        if fw.io.imposed_press is not None:
            # PRES_IO: impose pressure => normal velocity (flux) from the
            # Riemann invariant (bc_kernel.cu:145-198)
            pres_row = io_row & ~has_flag(state.info, FG_VELOCITY_DRIVEN)
            from .io_boundary import call_imposed_press

            p_imp = call_imposed_press(fw.io, state.pos, tt, waterdepth)
            rho_ext = eos.density_from_pressure(pp, jnp.maximum(p_imp, 0.0),
                                                f_num)
            r_ext = eos.riemann_celerity(pp, rho_ext, f_num)
            c_ext = eos.sound_speed(pp, rho_ext, f_num)
            p_int = eos.pressure(pp, rho_int, f_num)
            rho_phys_int = eos.physical_density(pp, rho_int, f_num)
            flux_exp = un_int + (r_ext - r_int)
            flux_shock = (p_int - p_imp) / (
                rho_phys_int * jnp.maximum(un_int, 1e-5 * c0)) + un_int
            # "check that unInt was not too small"
            flux_shock = jnp.where(
                jnp.abs(flux_shock) > 0.1 * c0, un_int, flux_shock)
            # expansion branch (rho_ext <= rho_int), falling through to
            # shock then contact
            f_e = jnp.where(
                flux_exp + c_ext > lam_int,
                jnp.where(flux_shock + c_ext <= lam_int, un_int, flux_shock),
                flux_exp,
            )
            # shock branch (rho_ext > rho_int), falling through to
            # expansion then contact
            f_s = jnp.where(
                flux_shock + c_ext <= lam_int,
                jnp.where(flux_exp + c_ext > lam_int, un_int, flux_exp),
                flux_shock,
            )
            flux = jnp.where(rho_ext <= rho_int, f_e, f_s)
            # negative imposed pressure forces outflow (bc_kernel.cu:186-188)
            flux = jnp.where(p_imp < 0.0, jnp.minimum(flux, 0.0), flux)
            # outflow keeps the interior tangential velocity (dv/dn = 0);
            # inflow is purely normal (bc_kernel.cu:189-195)
            v_tang = u_int - un_int[:, None] * nrm
            v_io = jnp.where(
                (flux < 0.0)[:, None], v_tang, 0.0) + flux[:, None] * nrm
            new_vel = jnp.where(pres_row[:, None], v_io, new_vel)
            rho_wall = jnp.where(pres_row, rho_ext, rho_wall)
    new_rho = jnp.where(is_wall, rho_wall, state.rho)
    if keps:
        extras = dict(state.extras)
        extras["tke"] = jnp.where(
            is_wall, sums["sumtke"] / shepard, state.extras["tke"])
        extras["eps"] = jnp.where(
            is_wall, jnp.maximum(sums["sumeps"] / shepard, 1e-5),
            state.extras["eps"])
        return state.replace(rho=new_rho, vel=new_vel, extras=extras)
    return state.replace(rho=new_rho, vel=new_vel)


__all__ = [
    "compute_gamma",
    "impose_boundary_conditions",
    "grad_gamma_wendland",
    "gamma_fluid_wendland",
    "sa_extra_fields",
]
