"""Cell-grid neighbor infrastructure, TPU-native.

The reference builds an explicit per-particle strided neighbor list
(`src/cuda/buildneibs_kernel.cu:1029`, iterated in
`src/cuda/neibs_iteration.cuh`).  On TPU we keep the same *first* stages —
cell hash (`calcHashDevice` `buildneibs_kernel.cu:664`), sort by hash
(`buildneibs.cu:403`), reorder + cell-start detection
(`buildneibs_kernel.cu:840`) — but replace the explicit neighbor list with
*implicit dense cell bins*: after the sort, a cell's particles are the
contiguous slice ``[cell_start[c], cell_start[c+1])``, and the interaction
pass processes whole cells against their 27 neighbor cells as dense
fixed-capacity ``[K]`` blocks with masks.  This trades the reference's
per-thread pointer chasing (fast on CUDA, terrible on TPU) for large regular
gathers and dense masked vector math (what the VPU wants).

Capacity overflow (more than ``max_parts_per_cell`` particles in one cell) is
detected and surfaced exactly like the reference's CHECK_NEIBSNUM
(`src/GPUSPH.cc:1851`): the rebuild returns the max occupancy so the host can
abort/warn.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..defs import Periodicity
from ..state import ParticleState, is_active


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static cell-grid geometry (reference `GlobalData` grid fields,
    `src/GlobalData.h:95-657`, and `ProblemCore::set_grid_params`
    `src/ProblemCore.h:358`).

    ``order`` is the linearization axis order, fastest axis first — the
    analogue of the reference's COORD1/2/3 linearization abstraction
    (`src/linearization.h:29-35`).  The Pallas forces kernel requires the
    fastest axis to be non-periodic (so that 3-cell neighbor runs are
    contiguous slices of the sorted particle arrays); ``make_grid`` picks
    such an order automatically.
    """

    origin: Tuple[float, float, float]
    ncells: Tuple[int, int, int]
    cell_size: Tuple[float, float, float]
    periodic: Periodicity = Periodicity.NONE
    order: Tuple[int, int, int] = (0, 1, 2)  # fastest axis first

    @property
    def n_cells(self) -> int:
        nx, ny, nz = self.ncells
        return nx * ny * nz

    @property
    def world_size(self) -> Tuple[float, float, float]:
        return tuple(n * s for n, s in zip(self.ncells, self.cell_size))

    @property
    def trash_cell(self) -> int:
        """One-past-the-end cell collecting dead/out-of-domain particles."""
        return self.n_cells

    @property
    def fast_axis_periodic(self) -> bool:
        return bool(self.periodic & (1 << self.order[0]))


def make_grid(
    world_origin: Tuple[float, float, float],
    world_size: Tuple[float, float, float],
    influenceradius: float,
    periodic: Periodicity = Periodicity.NONE,
) -> CellGrid:
    """Size the grid so each cell is at least one influence radius wide
    (reference `ProblemCore::set_grid_params`)."""
    ncells = tuple(max(1, int(ws / influenceradius)) for ws in world_size)
    cell_size = tuple(ws / nc for ws, nc in zip(world_size, ncells))
    # fastest linearization axis: prefer a non-periodic one (see CellGrid)
    fast = 0
    for a in range(3):
        if not (periodic & (1 << a)):
            fast = a
            break
    order = (fast,) + tuple(a for a in range(3) if a != fast)
    return CellGrid(tuple(world_origin), ncells, cell_size, periodic, order)


def cell_coords(grid: CellGrid, pos):
    """Integer cell coordinates of positions, clipped into the grid.

    Reference `calcGridPosFromPos`/`calcHashDevice`
    (`src/cuda/cellgrid.cuh`, `buildneibs_kernel.cu:664`).
    """
    rel = (pos - jnp.asarray(grid.origin, jnp.float32)) / jnp.asarray(
        grid.cell_size, jnp.float32
    )
    ijk = jnp.floor(rel).astype(jnp.int32)
    lo = jnp.zeros((3,), jnp.int32)
    hi = jnp.asarray(grid.ncells, jnp.int32) - 1
    return jnp.clip(ijk, lo, hi)


def linearize(grid: CellGrid, ijk):
    """Axis-ordered linearization (reference `src/linearization.h`)."""
    a0, a1, a2 = grid.order
    n0, n1 = grid.ncells[a0], grid.ncells[a1]
    return (ijk[..., a2] * n1 + ijk[..., a1]) * n0 + ijk[..., a0]


def cell_hash(grid: CellGrid, pos, active):
    """Linear cell id per particle; inactive slots go to the trash cell so
    they sort to the end and never appear in any neighbor bin."""
    lin = linearize(grid, cell_coords(grid, pos))
    return jnp.where(active, lin, grid.trash_cell).astype(jnp.int32)


class CellAux(struct.PyTreeNode):
    """Per-rebuild neighbor auxiliary data (the analogue of the reference's
    CELLSTART/CELLEND buffers + sorted order, `src/define_buffers.h`)."""

    cell_start: jax.Array  # i32[n_cells+2]: slice starts per cell (+trash,+end)
    cell_count: jax.Array  # i32[n_cells+1]
    hash_sorted: jax.Array  # i32[N] cell id per (sorted) particle
    max_occupancy: jax.Array  # i32[] max particles in any real cell
    n_active: jax.Array  # i32[] number of active particles


def build_cells(grid: CellGrid, state: ParticleState) -> Tuple[ParticleState, CellAux]:
    """Sort the particle state by cell hash and build cell slice tables.

    Returns the *reordered* state (the new canonical order, like the
    reference's REORDER command rewrites all buffers in sorted order) and the
    cell auxiliary tables.
    """
    active = is_active(state.info)
    h = cell_hash(grid, state.pos, active)
    order = jnp.argsort(h, stable=True)
    h_sorted = h[order]

    sorted_state = jax.tree.map(lambda a: a[order], state)

    n_cells = grid.n_cells
    # cell_start[c] = first sorted index with hash >= c  (searchsorted over the
    # sorted hashes: O((n_cells+2) log N), fully parallel)
    cell_ids = jnp.arange(n_cells + 2, dtype=jnp.int32)
    cell_start = jnp.searchsorted(h_sorted, cell_ids, side="left").astype(jnp.int32)
    cell_count = cell_start[1:] - cell_start[:-1]
    max_occ = jnp.max(cell_count[:n_cells])
    n_active = jnp.sum(active.astype(jnp.int32))

    return sorted_state, CellAux(
        cell_start=cell_start,
        cell_count=cell_count,
        hash_sorted=h_sorted,
        max_occupancy=max_occ,
        n_active=n_active,
    )


def delinearize(grid: CellGrid, cells):
    """Inverse of :func:`linearize`: linear id -> (i,j,k) per world axis."""
    a0, a1, a2 = grid.order
    n0, n1 = grid.ncells[a0], grid.ncells[a1]
    c = cells.astype(jnp.int32)
    coords = [None, None, None]
    coords[a0] = c % n0
    coords[a1] = (c // n0) % n1
    coords[a2] = c // (n0 * n1)
    return coords  # list of arrays, indexed by world axis


def neighbor_cell_ids(grid: CellGrid, cells):
    """For linear cell ids ``cells`` [C], return the 27 neighboring linear ids
    [C,27] and their validity mask [C,27] (periodic wrap or clamp-out).
    """
    coords = delinearize(grid, cells)

    offs = jnp.asarray(
        [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        dtype=jnp.int32,
    )  # [27,3]

    valid = jnp.ones((cells.shape[0], 27), dtype=bool)
    per = grid.periodic
    wrapped = []
    for axis in range(3):
        n = grid.ncells[axis]
        coord = coords[axis][:, None] + offs[None, :, axis]
        if per & (1 << axis):
            coord_w = coord % n
        else:
            valid = valid & (coord >= 0) & (coord < n)
            coord_w = jnp.clip(coord, 0, n - 1)
        wrapped.append(coord_w)

    ijk = jnp.stack(wrapped, axis=-1)
    lin = linearize(grid, ijk)
    return jnp.where(valid, lin, grid.trash_cell), valid


def min_image(grid: CellGrid, relpos):
    """Minimum-image convention on relative positions for periodic axes
    (replaces the reference's hash-level periodic wrap,
    `buildneibs_kernel.cu:664` periodicity handling)."""
    per = grid.periodic
    if per == Periodicity.NONE:
        return relpos
    L = jnp.asarray(grid.world_size, jnp.float32)
    wrap = jnp.asarray(
        [1.0 if per & (1 << a) else 0.0 for a in range(3)], jnp.float32
    )
    return relpos - wrap * L * jnp.round(relpos / L)


__all__ = [
    "CellGrid",
    "CellAux",
    "make_grid",
    "cell_coords",
    "cell_hash",
    "linearize",
    "build_cells",
    "neighbor_cell_ids",
    "min_image",
]
