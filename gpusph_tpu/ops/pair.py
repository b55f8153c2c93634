"""Dense cell-pair interaction combinator — the TPU-native neighbor loop.

Where the reference iterates a per-thread strided neighbor list
(`src/cuda/neibs_iteration.cuh:80-320`), the TPU build processes whole cells
against their 27 neighbor cells as dense masked blocks:

* centrals of a cell: the ``K = max_parts_per_cell`` slots of its sorted slice
* neighbor candidates: the ``27*K`` slots of the neighboring cells' slices

Each chunk of ``C`` cells yields a ``[C, K, NB]`` pair block on which the
physics callback computes all pairwise terms with plain jnp (VPU) math; the
reductions over ``NB`` produce per-central sums.  ``lax.map`` streams chunks
so peak memory stays bounded; XLA fuses the gather + elementwise chain per
chunk.  This is the structure a Pallas kernel will later accelerate with
explicit VMEM staging (neighbor cells are *contiguous* slices after the sort,
so they DMA as at most 9 dense runs).

The combinator is shared by the forces engine, density filters, density
summation, SPS stress, vorticity and surface detection — the analogue of the
reference instantiating many neighbor-loop kernels from one iteration header.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from .neighbors import CellAux, CellGrid, min_image, neighbor_cell_ids


def neighbor_apply(
    grid: CellGrid,
    aux: CellAux,
    fields: Dict[str, jax.Array],
    pair_fn: Callable,
    *,
    max_parts_per_cell: int,
    influenceradius: float,
    chunk_cells: int = 32,
    out_capacity: int | None = None,
) -> Dict[str, jax.Array]:
    """Apply ``pair_fn`` over all neighbor pairs and sum per central particle.

    Args:
      grid, aux: cell grid geometry and per-rebuild tables; ``fields`` must be
        in the rebuild's sorted order.
      fields: dict of per-particle arrays ``[N, ...]``; must contain ``"pos"``.
      pair_fn: ``pair_fn(central, neib, relpos, r, mask) -> dict`` where
        ``central[name]`` is ``[C, K, ...]``, ``neib[name]`` is ``[C, NB, ...]``,
        ``relpos`` is ``[C, K, NB, 3]`` (central minus neighbor, minimum-image),
        ``r`` is ``[C, K, NB]`` and ``mask`` is the valid-pair mask (cutoff,
        occupancy, self-exclusion already applied).  Outputs are ``[C, K, NB]``
        or ``[C, K, NB, 3]`` per-pair terms, summed over ``NB``.
      max_parts_per_cell: K — static cell capacity.
      influenceradius: interaction cutoff.
      chunk_cells: cells processed per ``lax.map`` step.
      out_capacity: rows of the output arrays (defaults to len of fields).

    Returns:
      dict of per-particle arrays ``[N, ...]`` in the same sorted order,
      zero outside any interaction.
    """
    K = max_parts_per_cell
    n_cells = grid.n_cells
    N = fields["pos"].shape[0]
    out_n = N if out_capacity is None else out_capacity

    n_chunks = -(-n_cells // chunk_cells)
    n_padded = n_chunks * chunk_cells

    k_ar = jnp.arange(K, dtype=jnp.int32)
    rad2 = jnp.float32(influenceradius * influenceradius)

    def chunk_body(c0):
        cells = c0 + jnp.arange(chunk_cells, dtype=jnp.int32)
        # padding cells beyond the grid behave as the (empty-for-centrals)
        # trash cell
        cells = jnp.minimum(cells, n_cells)

        start = aux.cell_start[cells]  # [C]
        count = jnp.where(cells < n_cells, aux.cell_count[cells], 0)  # [C]

        cidx = start[:, None] + k_ar[None, :]  # [C,K]
        cmask = k_ar[None, :] < count[:, None]  # [C,K]
        cidx_safe = jnp.where(cmask, cidx, 0)

        neib_lin, _ = neighbor_cell_ids(grid, cells)  # [C,27]
        nstart = aux.cell_start[neib_lin]  # [C,27]
        ncount = aux.cell_count[jnp.minimum(neib_lin, n_cells)]  # trash: count 0
        ncount = jnp.where(neib_lin < n_cells, ncount, 0)

        nidx = nstart[:, :, None] + k_ar[None, None, :]  # [C,27,K]
        nmask = k_ar[None, None, :] < ncount[:, :, None]
        NB = 27 * K
        nidx = jnp.where(nmask, nidx, 0).reshape(-1, NB)  # [C,NB]
        nmask = nmask.reshape(-1, NB)

        central = {k: v[cidx_safe] for k, v in fields.items()}  # [C,K,...]
        neib = {k: v[nidx] for k, v in fields.items()}  # [C,NB,...]

        relpos = central["pos"][:, :, None, :] - neib["pos"][:, None, :, :]
        relpos = min_image(grid, relpos)  # [C,K,NB,3]
        r2 = jnp.sum(relpos * relpos, axis=-1)  # [C,K,NB]

        mask = (
            cmask[:, :, None]
            & nmask[:, None, :]
            & (r2 < rad2)
            & (cidx[:, :, None] != nidx[:, None, :])  # exclude self
        )
        r = jnp.sqrt(r2)

        out = pair_fn(central, neib, relpos, r, mask)
        out_sum = {k: jnp.sum(jnp.where(_bmask(mask, v), v, 0), axis=2) for k, v in out.items()}
        # scatter index: invalid central slots -> out_n (dropped)
        sidx = jnp.where(cmask, cidx, out_n)
        return sidx, out_sum

    xs = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_cells
    sidx, sums = jax.lax.map(chunk_body, xs)  # [n_chunks, C, K, ...]

    flat_idx = sidx.reshape(-1)
    results = {}
    for name, v in sums.items():
        flat = v.reshape((n_padded * K,) + v.shape[3:])
        shape = (out_n,) + v.shape[3:]
        results[name] = (
            jnp.zeros(shape, flat.dtype).at[flat_idx].set(flat, mode="drop")
        )
    return results


def _bmask(mask, v):
    """Broadcast the pair mask against a possibly-vector-valued output."""
    if v.ndim == mask.ndim + 1:
        return mask[..., None]
    return mask


__all__ = ["neighbor_apply"]
