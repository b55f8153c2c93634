"""Jacobi solver for the granular effective pressure.

TPU-native counterpart of the reference's effective-pressure machinery
(`src/cuda/visc_kernel.cu:815-1100` and the EFFPRES phases of
`src/integrators/PredictorCorrectorIntegrator.cc:1060-1185`):

The granular rheology's yield stress needs the effective (inter-granular)
pressure p_eff, obtained by solving a Laplace problem over the sediment
phase with

* a Dirichlet condition at the sediment free surface / phase interface
  (`jacobiFSBoundaryConditionsDevice`),
* a Neumann condition at the walls, enforced through a Shepard
  interpolation of the neighboring sediment values
  (`jacobiWallBoundaryConditionsDevice`), and
* Jacobi iterations x <- D^-1 (B - R x) over the interior sediment
  particles (`jacobiBuildVectorsDevice` + `jacobiUpdateEffPresDevice`),
  iterated until both the fluid residual and the wall backward error drop
  below their thresholds (`simparams.h:244-258`).

The surface/interface flags come from the two-pass cone-criterion detection
of `post_process_kernel.cu:420-556` (one normal over all neighbors for the
free surface, one over same-fluid+boundary neighbors for the interface).

Everything runs as dense masked pair passes under `lax.while_loop` — the
whole solve is a single XLA program per forces phase.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..defs import ParticleType
from ..framework import SimFramework
from ..state import (
    FG_INTERFACE,
    FG_SEDIMENT,
    FG_SURFACE,
    ParticleState,
    fluid_num,
    has_flag,
    part_type,
)
from . import eos
from .kernels import F as kernF
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec


def _delta_rho(fw: SimFramework) -> float:
    """Density jump driving the effective pressure: rho0[0] for a single
    fluid, |rho0[0]-rho0[1]| with two phases (visc_kernel.cu:845-847)."""
    rho0s = [f.rho0 for f in fw.pp.fluids]
    if len(rho0s) > 1:
        return abs(rho0s[0] - rho0s[1])
    return rho0s[0]


def detect_surface_interface(fw: SimFramework, grid: CellGrid,
                             state: ParticleState, aux: CellAux,
                             *, chunk_cells: int = 256):
    """Set FG_SURFACE / FG_INTERFACE on fluid particles via the cone
    criterion (post_process_kernel.cu:420-556).  Returns the updated info."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    f_num = fluid_num(state.info)
    rho = eos.physical_density(pp, state.rho, f_num)
    vol = state.mass / jnp.maximum(rho, 1e-30)
    base = dict(
        **split_vec("pos", state.pos),
        vol=vol,
        f_num=f_num,
        ptype=part_type(state.info),
    )

    def normals_fn(c, n, g):
        f = kernF(fw.kerneltype, g.r, h)
        same = (c["f_num"] == n["f_num"]) | (n["ptype"] != ParticleType.FLUID)
        m_fs = g.mask
        m_if = g.mask & same
        return {
            "nfs_x": jnp.where(m_fs, -f * g.relx, 0.0),
            "nfs_y": jnp.where(m_fs, -f * g.rely, 0.0),
            "nfs_z": jnp.where(m_fs, -f * g.relz, 0.0),
            "nif_x": jnp.where(m_if, -f * g.relx, 0.0),
            "nif_y": jnp.where(m_if, -f * g.rely, 0.0),
            "nif_z": jnp.where(m_if, -f * g.relz, 0.0),
        }

    n1 = neighbor_apply(
        grid, aux, base, normals_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )

    fields = dict(base)
    for k in ("nfs_x", "nfs_y", "nfs_z", "nif_x", "nif_y", "nif_z"):
        fields[k] = n1[k]
    fields["nfs_len"] = jnp.sqrt(
        n1["nfs_x"] ** 2 + n1["nfs_y"] ** 2 + n1["nfs_z"] ** 2
    )
    fields["nif_len"] = jnp.sqrt(
        n1["nif_x"] ** 2 + n1["nif_y"] ** 2 + n1["nif_z"] ** 2
    )

    def cone_fn(c, n, g):
        n_fluid = n["ptype"] == ParticleType.FLUID
        coscone = jnp.where(
            n_fluid, pp.cosconeanglefluid, pp.cosconeanglenonfluid
        )
        crit_fs = -(c["nfs_x"] * g.relx + c["nfs_y"] * g.rely
                    + c["nfs_z"] * g.relz)
        crit_if = -(c["nif_x"] * g.relx + c["nif_y"] * g.rely
                    + c["nif_z"] * g.relz)
        same = (c["f_num"] == n["f_num"]) | ~n_fluid
        in_fs = g.mask & (crit_fs > g.r * c["nfs_len"] * coscone)
        in_if = g.mask & same & (crit_if > g.r * c["nif_len"] * coscone)
        return {
            "nc_fs": in_fs.astype(jnp.float32),
            "nc_if": in_if.astype(jnp.float32),
        }

    n2 = neighbor_apply(
        grid, aux, fields, cone_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    is_fluid = part_type(state.info) == ParticleType.FLUID
    surface = is_fluid & (n2["nc_fs"] < 0.5)
    interface = is_fluid & (n2["nc_if"] < 0.5) & (n2["nc_fs"] >= 0.5)

    info = state.info & ~jnp.uint32(FG_SURFACE | FG_INTERFACE)
    info = info | jnp.where(surface, jnp.uint32(FG_SURFACE), jnp.uint32(0))
    info = info | jnp.where(interface, jnp.uint32(FG_INTERFACE), jnp.uint32(0))
    return info


def jacobi_effpres(fw: SimFramework, grid: CellGrid, state: ParticleState,
                   aux: CellAux, effpres=None, *, chunk_cells: int = 256,
                   exchange=None, reduce_max=None):
    """Solve for the effective pressure of the sediment phase.

    ``exchange(effpres) -> effpres`` refreshes halo rows between iterations
    and ``reduce_max(x) -> x`` reduces the stop-criterion maxima across
    devices (multi-device: the reference exchanges BUFFER_EFFPRES and
    network-reduces the residual every Jacobi iteration,
    `PredictorCorrectorIntegrator.cc:1046-1182`, `GPUSPH.cc:2293-2355`).

    Returns (effpres [N], info-with-surface-flags, iterations)."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    g = jnp.asarray(pp.gravity, jnp.float32)
    g_mag = math.sqrt(sum(c * c for c in pp.gravity))
    drho = _delta_rho(fw)

    if effpres is None:
        effpres = jnp.zeros((state.capacity,), jnp.float32)

    info = detect_surface_interface(fw, grid, state, aux,
                                    chunk_cells=chunk_cells)
    ptype = part_type(info)
    is_fluid = ptype == ParticleType.FLUID
    is_bound = ptype == ParticleType.BOUNDARY
    sediment = has_flag(info, FG_SEDIMENT)
    at_fs = has_flag(info, FG_SURFACE) | has_flag(info, FG_INTERFACE)

    # Dirichlet condition at the sediment surface/interface
    # (jacobiFSBoundaryConditionsDevice)
    dirichlet = is_fluid & sediment & at_fs
    effpres = jnp.where(dirichlet, sp.deltap * drho * g_mag, effpres)

    interior = is_fluid & sediment & ~at_fs

    f_num = fluid_num(info)
    rho = eos.physical_density(pp, state.rho, f_num)
    vol = state.mass / jnp.maximum(rho, 1e-30)
    base = dict(
        **split_vec("pos", state.pos),
        vol=vol,
        sediment=sediment,
        interior=interior,
        is_bound=is_bound,
        is_fluid=is_fluid,
    )
    # wall backward-error reference pressure (visc_kernel.cu:957)
    refpres_wall = drho * (pp.fluids[0].c0 / 10.0) ** 2
    # fluid residual reference pressure (visc_kernel.cu:1080)
    refpres_fluid = eos._per_fluid(
        pp, f_num, [f.rho0 * f.c0 * f.c0 / 100.0 for f in pp.fluids]
    )

    def one_iteration(ep):
        fields = dict(base)
        fields["ep"] = ep

        # --- wall Neumann BC: Shepard interpolation over sediment neighbors
        # with the hydrostatic correction (jacobiWallBoundaryConditionsDevice)
        def wall_fn(c, n, g2):
            w = kernW(fw.kerneltype, g2.r, h)
            sed_n = g2.mask & n["sediment"] & n["is_fluid"]
            g_dot_rel = g2.dot_rel(g[0], g[1], g[2])
            num = jnp.maximum(
                n["vol"] * (n["ep"] + drho * g_dot_rel) * w, 0.0
            )
            return {
                "wall_num": jnp.where(sed_n, num, 0.0),
                "wall_alpha": jnp.where(sed_n, n["vol"] * w, 0.0),
            }

        ws = neighbor_apply(
            grid, aux, fields, wall_fn,
            max_parts_per_cell=sp.max_parts_per_cell,
            influenceradius=sp.influenceradius,
            chunk_cells=chunk_cells,
        )
        alpha = ws["wall_alpha"]
        wall_new = jnp.where(alpha > 0.0, ws["wall_num"] / jnp.maximum(alpha, 1e-30), 0.0)
        backerr = jnp.where(
            is_bound & (alpha > 0.0),
            jnp.abs(wall_new - ep) / refpres_wall,
            0.0,
        )
        ep = jnp.where(is_bound, wall_new, ep)
        fields["ep"] = ep

        # --- Jacobi vectors over interior sediment particles
        # (jacobiBuildVectorsDevice)
        def vec_fn(c, n, g2):
            f = kernF(fw.kerneltype, g2.r, h)
            sed_fluid = n["sediment"] & n["is_fluid"]
            contrib = g2.mask & (sed_fluid | n["is_bound"])
            vf = n["vol"] * f
            inner = sed_fluid & n["interior"]
            return {
                "D": jnp.where(contrib, vf, 0.0),
                "Rx": jnp.where(contrib & inner, -vf * n["ep"], 0.0),
                "B": jnp.where(contrib & ~inner, vf * n["ep"], 0.0),
            }

        vs = neighbor_apply(
            grid, aux, fields, vec_fn,
            max_parts_per_cell=sp.max_parts_per_cell,
            influenceradius=sp.influenceradius,
            chunk_cells=chunk_cells,
        )
        D, Rx, B = vs["D"], vs["Rx"], vs["B"]
        new = (B - Rx) / jnp.where(jnp.abs(D) > 0.0, D, 1.0)
        new = jnp.where(jnp.isfinite(new) & (jnp.abs(D) > 0.0), new, 0.0)
        residual = jnp.where(
            interior, (D * new + Rx - B) / refpres_fluid, 0.0
        )
        ep = jnp.where(interior, new, ep)
        return ep, jnp.max(jnp.abs(residual)), jnp.max(backerr)

    def cond(carry):
        ep, it, res, berr = carry
        return (it < sp.jacobi_maxiter) & (
            (res >= sp.jacobi_residual) | (berr >= sp.jacobi_backerr)
        )

    def body(carry):
        ep, it, _, _ = carry
        if exchange is not None:
            ep = exchange(ep)
        ep, res, berr = one_iteration(ep)
        if reduce_max is not None:
            res = reduce_max(res)
            berr = reduce_max(berr)
        return ep, it + 1, res, berr

    big = jnp.float32(1e30)
    effpres, iters, _, _ = jax.lax.while_loop(
        cond, body, (effpres, jnp.int32(0), big, big)
    )
    return effpres, info, iters


__all__ = ["jacobi_effpres", "detect_surface_interface"]
