"""Density filters: Shepard and MLS.

TPU-native equivalents of the reference's filter engine
(`shepardDevice` `src/cuda/forces_kernel.cu:422-505`,
`MlsDevice` `src/cuda/forces_kernel.cu:512-737`), run every N iterations
(FILTER phase, `src/integrators/PredictorCorrectorIntegrator.cc:800-877`).

Both filters renormalize the fluid density from the current particle
distribution.  Neighbor set: FLUID particles, plus BOUNDARY particles when
using DYN boundaries (matching `for_each_neib2(PT_FLUID, DYN ? PT_BOUNDARY :
PT_NONE)` in the reference kernels).  The MLS 4x4 symmetric system is solved
in closed form via the adjugate (the reference uses adjugate + conjugate
residual refinement; in f32 the regularized adjugate is equivalent in
practice and branch-free, which suits the VPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..defs import BoundaryType, FilterType, ParticleType
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, part_type
from . import eos
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec


def _filter_fields(fw: SimFramework, state: ParticleState):
    f_num = fluid_num(state.info)
    return dict(
        **split_vec("pos", state.pos),
        mass=state.mass,
        rho=eos.physical_density(fw.pp, state.rho, f_num),
        ptype=part_type(state.info),
    )


def _neib_ok(fw: SimFramework, n_ptype):
    ok = n_ptype == ParticleType.FLUID
    if fw.boundarytype == BoundaryType.DYN_BOUNDARY:
        ok = ok | (n_ptype == ParticleType.BOUNDARY)
    return ok


def shepard_filter(
    fw: SimFramework, grid: CellGrid, state: ParticleState, aux: CellAux,
    *, chunk_cells: int = 256,
) -> ParticleState:
    """Zeroth-order Shepard renormalization of fluid density."""
    sp = fw.sp
    h = sp.slength
    fields = _filter_fields(fw, state)

    def pair_fn(c, n, g):
        ok = g.mask & _neib_ok(fw, n["ptype"])
        w = kernW(fw.kerneltype, g.r, h) * n["mass"]
        return {
            "num": jnp.where(ok, w, 0.0),
            "den": jnp.where(ok, w / n["rho"], 0.0),
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )

    w0 = kernW(fw.kerneltype, jnp.zeros(()), h)
    self_num = state.mass * w0
    num = sums["num"] + self_num
    den = sums["den"] + self_num / fields["rho"]

    new_rho_phys = num / den
    f_num = fluid_num(state.info)
    new_rho = eos.numerical_density(fw.pp, new_rho_phys, f_num)
    apply = part_type(state.info) == ParticleType.FLUID
    return state.replace(rho=jnp.where(apply, new_rho, state.rho))


def _sym4_det(m):
    """Determinant of a symmetric 4x4 given as dict of 10 upper components
    (reference `src/cuda/tensor.cu` det)."""
    a, b, c, d = m["xx"], m["xy"], m["xz"], m["xw"]
    e, f, g = m["yy"], m["yz"], m["yw"]
    h, i = m["zz"], m["zw"]
    j = m["ww"]
    # full symmetric matrix [[a,b,c,d],[b,e,f,g],[c,f,h,i],[d,g,i,j]]
    return (
        a * (e * (h * j - i * i) - f * (f * j - i * g) + g * (f * i - h * g))
        - b * (b * (h * j - i * i) - f * (c * j - i * d) + g * (c * i - h * d))
        + c * (b * (f * j - g * i) - e * (c * j - i * d) + g * (c * g - f * d))
        - d * (b * (f * i - g * h) - e * (c * i - h * d) + f * (c * g - f * d))
    )


def _sym4_adjugate_row1(m):
    """First row of the adjugate of the symmetric 4x4 (reference
    `adjugate_row1`, `src/cuda/tensor.cu`): gives M^-1 e1 * det."""
    b, c, d = m["xy"], m["xz"], m["xw"]
    e, f, g = m["yy"], m["yz"], m["yw"]
    h, i = m["zz"], m["zw"]
    j = m["ww"]
    a11 = e * (h * j - i * i) - f * (f * j - g * i) + g * (f * i - g * h)
    a12 = -(b * (h * j - i * i) - f * (c * j - d * i) + g * (c * i - d * h))
    a13 = b * (f * j - g * i) - e * (c * j - d * i) + g * (c * g - d * f)
    a14 = -(b * (f * i - g * h) - e * (c * i - d * h) + f * (c * g - d * f))
    return a11, a12, a13, a14


def mls_filter(
    fw: SimFramework, grid: CellGrid, state: ParticleState, aux: CellAux,
    *, chunk_cells: int = 256,
) -> ParticleState:
    """First-order MLS renormalization of fluid density."""
    sp = fw.sp
    h = sp.slength
    fields = _filter_fields(fw, state)

    # pass 1: accumulate the MLS moment matrix (relpos scaled by h)
    def mls_matrix(c, n, g):
        ok = g.mask & _neib_ok(fw, n["ptype"])
        w = jnp.where(ok, kernW(fw.kerneltype, g.r, h) * n["mass"] / n["rho"], 0.0)
        x, y, z = g.relx / h, g.rely / h, g.relz / h
        return {
            "xx": w,
            "xy": w * x, "xz": w * y, "xw": w * z,
            "yy": w * x * x, "yz": w * x * y, "yw": w * x * z,
            "zz": w * y * y, "zw": w * y * z,
            "ww": w * z * z,
        }

    M = neighbor_apply(
        grid, aux, fields, mls_matrix,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    # self contribution enters only the constant moment
    w0 = kernW(fw.kerneltype, jnp.zeros(()), h)
    M["xx"] = M["xx"] + state.mass * w0 / fields["rho"]

    det = _sym4_det(M)
    # regularize near-singular neighborhoods (thin sheets): add eps*I like the
    # reference's fallback (forces_kernel.cu:617-630)
    eps = jnp.where(jnp.abs(det) < 1e-7, jnp.abs(det) + 1e-7, 0.0)
    Mr = dict(M)
    for k in ("xx", "yy", "zz", "ww"):
        Mr[k] = Mr[k] + eps
    det_r = _sym4_det(Mr)
    b0, b1, b2, b3 = (a / det_r for a in _sym4_adjugate_row1(Mr))
    # rescale the linear coefficients back to world units
    fields2 = dict(fields, B0=b0, B1=b1 / h, B2=b2 / h, B3=b3 / h)

    # pass 2: corrected density summation
    def mls_sum(c, n, g):
        ok = g.mask & _neib_ok(fw, n["ptype"])
        w = kernW(fw.kerneltype, g.r, h) * n["mass"]
        corr = c["B0"] + c["B1"] * g.relx + c["B2"] * g.rely + c["B3"] * g.relz
        return {"rho": jnp.where(ok, w * corr, 0.0)}

    sums = neighbor_apply(
        grid, aux, fields2, mls_sum,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    new_rho_phys = sums["rho"] + fields2["B0"] * w0 * state.mass

    f_num = fluid_num(state.info)
    new_rho = eos.numerical_density(fw.pp, new_rho_phys, f_num)
    apply = part_type(state.info) == ParticleType.FLUID
    return state.replace(rho=jnp.where(apply, new_rho, state.rho))


_FILTERS = {
    FilterType.SHEPARD: shepard_filter,
    FilterType.MLS: mls_filter,
}


def apply_filters(fw: SimFramework, grid: CellGrid, state: ParticleState,
                  aux: CellAux, iteration) -> ParticleState:
    """Run each enabled filter at its frequency (iteration is traced)."""
    for ftype, freq in fw.filters:
        if freq <= 0:
            continue
        fn = _FILTERS[FilterType(ftype)]
        state = jax.lax.cond(
            (iteration % freq) == (freq - 1),
            lambda s: fn(fw, grid, s, aux),
            lambda s: s,
            state,
        )
    return state


__all__ = ["shepard_filter", "mls_filter", "apply_filters"]
