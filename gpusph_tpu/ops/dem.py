"""DEM (digital elevation model) terrain boundary — the geometry force.

TPU-native counterpart of the reference's DEM machinery
(`src/cuda/geom_core.cu`: DemPos/DemInterpol/DemTangentPlane + the
GeometryForce LJ repulsion against the tangent plane, `src/geometries/
TopoCube.{h,cc}` for the height-field container): per fluid particle,
bilinearly interpolate the terrain height under (x, y), build the local
tangent plane from forward differences, and apply the Lennard-Jones plane
repulsion along its normal.  The whole pass is dense vectorized gathers +
VPU math — no neighbor search.

The DEM is static framework config packed hashable (see
`SimFramework.dem`): (rows, cols, west, south, ewres, nsres, zmin_probe,
heights_bytes) with heights row-major f32 (south->north rows, west->east
cols, GRASS ASCII convention like the reference's
`TopoCube::load_file<DEM_FMT_ASCII>`, `TopoCube.cc:150`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..framework import SimFramework
from .forces import _powf


def pack_dem(heights: np.ndarray, west: float, south: float,
             ewres: float, nsres: float) -> tuple:
    """Hashable DEM descriptor for SimFramework.dem."""
    h = np.ascontiguousarray(heights, np.float32)
    return (int(h.shape[0]), int(h.shape[1]), float(west), float(south),
            float(ewres), float(nsres), h.tobytes())


def unpack_dem(dem: tuple):
    rows, cols, west, south, ewres, nsres, blob = dem
    h = np.frombuffer(blob, np.float32).reshape(rows, cols)
    return h, west, south, ewres, nsres


def dem_height_normal(dem: tuple, pos):
    """Bilinear terrain height + unit normal under positions [N,3].

    The normal comes from forward differences over one DEM cell
    (DemTangentPlane, `geom_core.cu:100-140`)."""
    h_np, west, south, ewres, nsres = unpack_dem(dem)
    rows, cols = h_np.shape
    H = jnp.asarray(h_np)

    def interp(x, y):
        fx = (x - west) / ewres
        fy = (y - south) / nsres
        fx = jnp.clip(fx, 0.0, cols - 1.001)
        fy = jnp.clip(fy, 0.0, rows - 1.001)
        ix = jnp.floor(fx).astype(jnp.int32)
        iy = jnp.floor(fy).astype(jnp.int32)
        tx = fx - ix
        ty = fy - iy
        h00 = H[iy, ix]
        h01 = H[iy, ix + 1]
        h10 = H[iy + 1, ix]
        h11 = H[iy + 1, ix + 1]
        return (
            h00 * (1 - tx) * (1 - ty)
            + h01 * tx * (1 - ty)
            + h10 * (1 - tx) * ty
            + h11 * tx * ty
        )

    x, y = pos[:, 0], pos[:, 1]
    z0 = interp(x, y)
    z1 = interp(x + ewres, y)
    z2 = interp(x, y + nsres)
    # tangent-plane normal (geom_core.cu:128-133): a,b,c with dx=ewres etc.
    a = nsres * (z0 - z1)
    b = ewres * (z0 - z2)
    c = ewres * nsres
    l = jnp.sqrt(a * a + b * b + c * c)
    n = jnp.stack([a / l, b / l, c / l], axis=-1)
    return z0, n


def apply_dem_force(fw: SimFramework, pos, vel, mass, is_fluid, DvDt):
    """LJ repulsion against the DEM tangent plane (GeometryForce semantics,
    same force law as `ops/planes.py`)."""
    pp = fw.pp
    dem = fw.dem
    r0 = pp.r0
    z0, n = dem_height_normal(dem, pos)
    # signed distance to the tangent plane through (x, y, z0)
    dist = (pos[:, 2] - z0) * n[:, 2]
    safe = jnp.maximum(dist, 1e-3 * r0)
    ratio = r0 / safe
    lj = (
        pp.dcoeff
        * (_powf(ratio, pp.p1coeff) - _powf(ratio, pp.p2coeff))
        / (safe * safe)
    )
    lj = jnp.minimum(lj, 1e30)
    active = is_fluid & (dist < r0)
    DvDt = DvDt + jnp.where(active[:, None], (lj * safe)[:, None] * n, 0.0)
    dynvisc = max((f.kinematic_visc * f.rho0 for f in pp.fluids), default=0.0)
    if dynvisc > 0:
        vn = jnp.sum(vel * n, axis=-1)
        v_t = vel - vn[:, None] * n
        coeff = -dynvisc * pp.partsurf / (mass * safe)
        DvDt = DvDt + jnp.where(active[:, None], coeff[:, None] * v_t, 0.0)
    return DvDt


def load_dem_ascii(path: str) -> tuple:
    """GRASS-style ASCII DEM (the reference's DEM_FMT_ASCII,
    `TopoCube.cc:150`): header north/south/east/west/rows/cols + row-major
    heights (first row = north)."""
    hdr = {}
    data = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0].rstrip(":") in ("north", "south", "east", "west",
                                        "rows", "cols"):
                hdr[parts[0].rstrip(":")] = float(parts[1])
            else:
                data.append([float(v) for v in parts])
    rows, cols = int(hdr["rows"]), int(hdr["cols"])
    h = np.asarray(data, np.float32).reshape(rows, cols)
    # file rows go north->south; store south->north
    h = h[::-1]
    ewres = (hdr["east"] - hdr["west"]) / cols
    nsres = (hdr["north"] - hdr["south"]) / rows
    # cell-centered samples
    return pack_dem(h, hdr["west"] + ewres / 2, hdr["south"] + nsres / 2,
                    ewres, nsres)


__all__ = ["pack_dem", "unpack_dem", "dem_height_normal", "apply_dem_force",
           "load_dem_ascii"]
