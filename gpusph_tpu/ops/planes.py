"""Geometric plane boundaries (ENABLE_PLANES).

TPU-native counterpart of the reference's plane forces: LJ repulsion along
the plane normal + a tangential viscous damping term, applied per particle
with no neighbor search (`PlaneForce`/`GeometryForce`
`src/cuda/forces_kernel.cu:140-210`, `src/planes.h`).  Planes are static
framework config; the whole pass is a handful of fused VPU ops.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..framework import SimFramework
from .forces import _powf


def apply_plane_forces(fw: SimFramework, pos, vel, mass, is_fluid, DvDt):
    """Add plane contributions to DvDt for fluid particles."""
    pp = fw.pp
    r0 = pp.r0
    dynvisc = max((f.kinematic_visc * f.rho0 for f in pp.fluids), default=0.0)
    for point, normal in fw.planes:
        n = jnp.asarray(normal, jnp.float32)
        n = n / jnp.linalg.norm(n)
        p0 = jnp.asarray(point, jnp.float32)
        dist = (pos - p0[None, :]) @ n  # signed distance along the normal
        safe = jnp.maximum(dist, 1e-3 * r0)
        ratio = r0 / safe
        lj = (
            pp.dcoeff
            * (_powf(ratio, pp.p1coeff) - _powf(ratio, pp.p2coeff))
            / (safe * safe)
        )
        lj = jnp.minimum(lj, 1e30)
        active = is_fluid & (dist < r0)
        # normal repulsion: DvDt += LJForce(r) * r * n (PlaneForce)
        DvDt = DvDt + jnp.where(active[:, None], (lj * safe)[:, None] * n[None, :], 0.0)
        if dynvisc > 0:
            # tangential viscous damping: -mu*partsurf/(m*r) * v_t
            vn = vel @ n
            v_t = vel - vn[:, None] * n[None, :]
            coeff = -dynvisc * pp.partsurf / (mass * safe)
            DvDt = DvDt + jnp.where(active[:, None], coeff[:, None] * v_t, 0.0)
    return DvDt


__all__ = ["apply_plane_forces"]
