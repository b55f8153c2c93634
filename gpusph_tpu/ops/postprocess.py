"""Post-processing engine: vorticity, test points, surface detection, flux.

TPU-native counterpart of the reference's post-process engine
(`AbstractPostProcessEngine` `src/engine_postprocess.h:50`, kernels in
`src/cuda/post_process_kernel.cu`): per-particle derived quantities computed
on demand at write-out time (saveParticles POSTPROCESS pass,
`src/GPUSPH.cc:1732`).

* vorticity: omega_i = sum_j m_j/rho_j (v_ij x grad W_ij)
  (`post_process_kernel.cu` vorticityDevice)
* test points: SPH interpolation of velocity/pressure at TESTPOINT particles
  (`calcTestpointsVelocityDevice`)
* surface detection: free-surface flag from the kernel-gradient cone
  criterion (`calcSurfaceparticleDevice`): a particle is surface if no
  neighbor lies inside the cone around the (normalized) density-gradient
  direction
* interface detection: same machinery flagging fluid-fluid interfaces
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..defs import ParticleType
from ..framework import SimFramework
from ..state import (
    FG_SURFACE,
    ParticleState,
    fluid_num,
    part_type,
)
from . import eos
from .kernels import F as kernF
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import merge_vec, neighbor_apply, split_vec


def _fields(fw: SimFramework, state: ParticleState):
    f_num = fluid_num(state.info)
    return dict(
        **split_vec("pos", state.pos),
        **split_vec("vel", state.vel),
        mass=state.mass,
        rho=eos.physical_density(fw.pp, state.rho, f_num),
        press=eos.pressure(fw.pp, state.rho, f_num),
        ptype=part_type(state.info),
    )


def vorticity(fw: SimFramework, grid: CellGrid, state: ParticleState,
              aux: CellAux, *, chunk_cells: int = 256):
    """omega = curl(v) per fluid particle (BUFFER_VORTICITY)."""
    sp = fw.sp
    h = sp.slength
    fields = _fields(fw, state)

    def pair_fn(c, n, g):
        ok = g.mask & (c["ptype"] == ParticleType.FLUID) & (
            n["ptype"] == ParticleType.FLUID
        )
        f = kernF(fw.kerneltype, g.r, h)
        coeff = jnp.where(ok, n["mass"] / n["rho"] * f, 0.0)
        relvx = c["vel_x"] - n["vel_x"]
        relvy = c["vel_y"] - n["vel_y"]
        relvz = c["vel_z"] - n["vel_z"]
        # v_ij x (r_ij * f): grad W = f * rel
        return {
            "w_x": coeff * (relvy * g.relz - relvz * g.rely),
            "w_y": coeff * (relvz * g.relx - relvx * g.relz),
            "w_z": coeff * (relvx * g.rely - relvy * g.relx),
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    return merge_vec(sums, "w")


def testpoint_values(fw: SimFramework, grid: CellGrid, state: ParticleState,
                     aux: CellAux, *, chunk_cells: int = 256):
    """Shepard-weighted interpolation of velocity and pressure at TESTPOINT
    particles (calcTestpointsVelocityDevice)."""
    sp = fw.sp
    h = sp.slength
    fields = _fields(fw, state)

    def pair_fn(c, n, g):
        ok = g.mask & (n["ptype"] == ParticleType.FLUID)
        w = jnp.where(ok, kernW(fw.kerneltype, g.r, h) * n["mass"] / n["rho"], 0.0)
        return {
            "shepard": w,
            "v_x": w * n["vel_x"],
            "v_y": w * n["vel_y"],
            "v_z": w * n["vel_z"],
            "p": w * n["press"],
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    den = jnp.maximum(sums["shepard"], 1e-10)
    vel = merge_vec(sums, "v") / den[:, None]
    press = sums["p"] / den
    is_tp = part_type(state.info) == ParticleType.TESTPOINT
    return (
        jnp.where(is_tp[:, None], vel, state.vel),
        jnp.where(is_tp, press, 0.0),
    )


def surface_detection(fw: SimFramework, grid: CellGrid, state: ParticleState,
                      aux: CellAux, *, chunk_cells: int = 256):
    """Free-surface flags via the kernel-gradient cone criterion
    (calcSurfaceparticleDevice): compute the renormalized density-gradient
    normal, then flag particles with no neighbor inside the cone around it.

    Returns (new_info with FG_SURFACE set, normals [N,3]).
    """
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    fields = _fields(fw, state)

    # pass 1: surface normal = - sum m_j grad W (direction of density grad)
    def normal_fn(c, n, g):
        ok = g.mask
        f = kernF(fw.kerneltype, g.r, h)
        coeff = jnp.where(ok, n["mass"] / n["rho"] * f, 0.0)
        return {
            "n_x": coeff * g.relx,
            "n_y": coeff * g.rely,
            "n_z": coeff * g.relz,
        }

    sums = neighbor_apply(
        grid, aux, fields, normal_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    normal = -merge_vec(sums, "n")
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal_hat = normal / jnp.maximum(nn, 1e-10)

    fields2 = dict(fields, **split_vec("nrm", normal_hat))

    # pass 2: cone check — any neighbor within the cone kills the flag
    cosangle = pp.cosconeanglefluid

    def cone_fn(c, n, g):
        ok = g.mask
        inv_r = 1.0 / jnp.maximum(g.r, 1e-10)
        # cos of angle between (neighbor - central) and the normal
        cosang = -(
            c["nrm_x"] * g.relx + c["nrm_y"] * g.rely + c["nrm_z"] * g.relz
        ) * inv_r
        inside = ok & (cosang > cosangle)
        return {"blockers": jnp.where(inside, 1.0, 0.0)}

    sums2 = neighbor_apply(
        grid, aux, fields2, cone_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    is_fluid_p = part_type(state.info) == ParticleType.FLUID
    surface = is_fluid_p & (sums2["blockers"] < 0.5)
    info = jnp.where(
        surface,
        state.info | jnp.uint32(FG_SURFACE),
        state.info & ~jnp.uint32(FG_SURFACE),
    )
    return info, normal_hat


def make_write_postprocess(fw: SimFramework, grid: CellGrid, *,
                           chunk_cells: int = 256):
    """Jitted POSTPROCESS pass for write-out (the reference runs the enabled
    post-process engines inside ``saveParticles``, `src/GPUSPH.cc:1732`).

    Returns ``run(state) -> dict`` of per-particle arrays aligned with the
    *input* particle order (the writer's order), or ``None`` when the
    framework enables no post-processing.  Keys: ``Vorticity`` [N,3],
    ``TestpointVel`` [N,3] / ``TestpointPress`` [N] (testpoint rows only),
    ``Info`` (with FG_SURFACE refreshed) and ``Normals`` [N,3].
    """
    from ..defs import PostProcessType
    from ..state import is_active
    from .neighbors import build_cells, cell_hash

    pps = tuple(fw.postprocess)
    if not pps:
        return None

    @jax.jit
    def run(state: ParticleState):
        # local sort (the write-out state has evolved since the last rebuild)
        active = is_active(state.info)
        h = cell_hash(grid, state.pos, active)
        order = jnp.argsort(h, stable=True)
        inv = jnp.argsort(order)
        sstate, aux = build_cells(grid, state)
        out = {}
        if PostProcessType.VORTICITY in pps:
            w = vorticity(fw, grid, sstate, aux, chunk_cells=chunk_cells)
            out["Vorticity"] = w[inv]
        if PostProcessType.TESTPOINTS in pps:
            vel, press = testpoint_values(
                fw, grid, sstate, aux, chunk_cells=chunk_cells)
            out["TestpointVel"] = vel[inv]
            out["TestpointPress"] = press[inv]
        if PostProcessType.SURFACE_DETECTION in pps:
            info, normals = surface_detection(
                fw, grid, sstate, aux, chunk_cells=chunk_cells)
            out["Info"] = info[inv]
            out["Normals"] = normals[inv]
        if PostProcessType.FLUX_COMPUTATION in pps:
            out["IOflux"] = io_flux(fw, state)
        return out

    return run


def io_flux(fw, state):
    """Volumetric flux through each open boundary (reference
    FLUX_COMPUTATION, `src/cuda/post_process.cu:79-489` / IOflux.txt in
    `CommonWriter.cc`): sum over IO boundary elements of (u . n) * A,
    reported as [inlet_flux, outlet_flux] in m^3/s."""
    from ..state import (FG_INLET, FG_OUTLET, has_flag, is_active, part_type)
    from ..defs import ParticleType

    info = state.info
    seg = (part_type(info) == ParticleType.BOUNDARY) & is_active(info)
    if not all(k in state.extras for k in ("vr0", "vr1", "vr2", "belem")):
        return jnp.zeros(2, jnp.float32)
    v0 = state.extras["vr0"]
    v1 = state.extras["vr1"]
    v2 = state.extras["vr2"]
    area = 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)
    un = jnp.einsum("ij,ij->i", state.vel, state.extras["belem"])
    q = jnp.where(seg, un * area, 0.0)
    return jnp.stack([
        jnp.sum(jnp.where(has_flag(info, FG_INLET), q, 0.0)),
        jnp.sum(jnp.where(has_flag(info, FG_OUTLET), q, 0.0)),
    ]).astype(jnp.float32)


__all__ = [
    "io_flux",
    "vorticity",
    "testpoint_values",
    "surface_detection",
    "make_write_postprocess",
]
