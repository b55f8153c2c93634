"""Pallas TPU forces kernel: the speed-of-light path for the SPH RHS.

Flat packed true-neighbor tiles (v4).  The per-rebuild neighbor structure —
the analogue of the reference's neighbor list (`buildneibs_kernel.cu:1029`,
iterated by `neibs_iteration.cuh:59-320`) — is a *flat list of window
tiles*, sized by the actual neighbor load instead of the worst-case block:

* After the cell sort, particles are grouped into **blocks** of up to
  ``B=64`` consecutive sorted particles (blocks never straddle cell rows
  and split when their fast-axis span exceeds ``SPAN`` cells, so each
  block is geometrically compact).
* Once per rebuild, the block's 3x3-row candidate set is culled at
  ``GROUP=16``-particle granularity with a conservative AABB distance test
  (group box vs the box of the block's centrals, threshold
  ``nlexpansionfactor * influenceradius`` — reference `simparams.h:100`),
  deduplicated, and compacted into a **flat tile list**: each tile packs
  ``TS/GROUP`` kept groups (= 128 window slots), and a block contributes
  ``ceil(kept/8)`` consecutive tiles.  Total tiles are the *sum* of kept
  groups — the average neighbor load — not ``n_blocks x max``.
* Each forces pass gathers the current particle fields of the kept groups
  with ONE flat XLA row gather of 1KB rows (measured ~290 GB/s on v5e;
  any layout transpose in XLA drops this to ~35 GB/s, so the gather feeds
  the kernel *raw* and the kernel fixes the layout with an in-VMEM
  (GPT,GROUP,NCOLS) -> (NCOLS,TS) shuffle, which is nearly free there).
* The kernel is a scalar-prefetch grid over flat tiles
  (`pltpu.PrefetchScalarGridSpec`): tile i streams window tile i and the
  central table of block ``tile_block[i]``; consecutive tiles of the same
  block accumulate into the same output block in VMEM.  No scalar-core
  DMA issue, no dynamic trip counts, and both HBM traffic and VPU work
  scale with the true neighbor load.
* Staleness semantics match the reference: the list is built from
  rebuild-time positions and reused for the whole chunk
  (~2*buildneibsfreq forces passes), with ``nlexpansionfactor`` widening
  the search radius when a problem needs it (e.g. Spheric2SA.cu:70).

Physics parity with `compute_forces` (the XLA path remains the fallback for
unsupported configurations and is the correctness oracle in tests):
continuity (F1/F2), pressure gradient, artificial viscosity, Morris/Monaghan
laminar viscosity, LJ/MK boundary repulsion, Colagrossi/Ferrari density
diffusion, DYN-boundary gating, XSPH (with the reference's factor 2,
forces_kernel.def:3368), internal energy.  Reference formulas:
`src/cuda/forces_kernel.def` (see ops/forces.py for the line anchors).
"""
from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..defs import (
    BoundaryType,
    DensityDiffusionType,
    ParticleType,
    SimFlags,
    SPHFormulation,
    TurbulenceModel,
    ViscousModel,
)
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, is_active, part_type
from . import eos
from .forces import ForcesOut, _avg, _powf
from .kernels import F as kernF
from .neighbors import CellAux, CellGrid

# field-table rows (the 16-row per-slot property table)
C_POSX, C_POSY, C_POSZ = 0, 1, 2
C_VELX, C_VELY, C_VELZ = 3, 4, 5
C_MASS, C_RHO, C_PPRE, C_SSPEED = 6, 7, 8, 9
C_PRESS, C_FLUID, C_BOUND, C_DVISC = 10, 11, 12, 13
NCOLS = 16

NOUT = 8  # DrDt, DvDt xyz, xsph xyz, DEDt
# geometry knobs (env-overridable for perf sweeps; defaults are the tuned
# production values)
B = int(_os.environ.get("GTPU_B", "64"))  # central block size
GROUP = int(_os.environ.get("GTPU_GROUP", "16"))  # neighbor-list granularity
TS = 128  # window tile width = VPU lane count
GPT = TS // GROUP  # groups per window tile
SPAN = int(_os.environ.get("GTPU_SPAN", "8"))  # max fast-axis cells / block
PAD_POS = 1.0e4  # pad-slot coordinate: far away, finite under f32 kernels

assert TS % GROUP == 0 and TS % B == 0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_supported(fw: SimFramework, grid: CellGrid) -> bool:
    """Configurations covered by the Pallas kernel."""
    if grid.fast_axis_periodic:
        return False  # candidate runs would wrap; XLA path handles it
    if fw.sa_boundary:
        return False  # SA gamma terms live in the XLA path for now
    if fw.sph_formulation not in (SPHFormulation.SPH_F1, SPHFormulation.SPH_F2):
        return False
    if fw.visc.turbmodel not in (
        TurbulenceModel.ARTIFICIAL,
        TurbulenceModel.LAMINAR_FLOW,
    ):
        return False
    if fw.densitydiffusiontype == DensityDiffusionType.BREZZI:
        return False  # needs the dt scalar; XLA path handles it
    if fw.densitydiffusiontype != DensityDiffusionType.NONE and len(fw.pp.fluids) > 1:
        # the kernel bakes fluid 0's c0/rho0 as constants and has no
        # same-fluid-pair gate (the XLA path applies both, forces.py);
        # multi-fluid diffusion must take the XLA path
        return False
    if not fw.is_inviscid and fw.visc.viscmodel == ViscousModel.ESPANOL_REVENGA:
        return False  # XLA path only for now
    if fw.gcallback is not None:
        return False  # gravity is baked as a kernel constant; XLA path
    return True


@struct.dataclass
class BlockPlan:
    """Per-rebuild neighbor structure (built once per neighbor rebuild,
    reused by every forces pass of the chunk — the analogue of the
    reference's neighbor list, `buildneibs_kernel.cu:1029`)."""

    flat_groups: jax.Array  # i32[T_total*GPT] kept group id per window slot
    tile_block: jax.Array  # i32[T_total] owning block per flat tile (pad=nb)
    cen_idx: jax.Array  # i32[(nb+1)*B] sorted-particle index per central slot
    slot_of_sorted: jax.Array  # i32[capacity] central slot per sorted particle
    max_run: jax.Array  # i32[] max kept groups (+1e6 on structural overflow)


def plan_dims(fw: SimFramework, grid: CellGrid, capacity: int):
    """Static plan dimensions for a framework + grid + capacity."""
    sp = fw.sp
    a0, a1, a2 = grid.order
    n0 = grid.ncells[a0]
    n_rows = grid.ncells[a1] * grid.ncells[a2]
    n_cells = grid.n_cells
    K = sp.max_parts_per_cell
    # worst run: a block spans at most SPAN fast-axis cells + one halo cell
    # each side.  sp.max_run_extent (max particles over SPAN+2 consecutive
    # fast-axis cells, auto-probed by Problem.build) bounds this tighter
    # than (SPAN+2)*K.
    ext = sp.max_run_extent if sp.max_run_extent else (SPAN + 2) * K
    GR = ext // GROUP + 2  # candidate groups per run (GROUP-alignment slack)
    M = 9 * GR  # candidate-group list width per block
    nG = -(-capacity // GROUP) if capacity else 1  # groups in the slot array
    # per-block neighbor-list capacity in groups; auto-probed by
    # Problem.build (sp.max_block_groups), worst case = every candidate kept
    G_max = min(_round_up(sp.max_block_groups or M, GPT), _round_up(M, GPT))
    if capacity:  # can never keep more groups than the whole array holds
        G_max = min(G_max, _round_up(nG + 1, GPT))
    # block-count bound: count splits (every B particles per row) + span
    # transitions (<= occupied SPAN segments) + one per row.  Problems
    # probe the actual count (sp.max_blocks); runtime overflow aborts.
    n_blocks = sp.max_blocks or (capacity // B + n_cells // SPAN + n_rows + 2)
    n_blocks = _round_up(max(n_blocks, 128), 128)
    # flat tile-list capacity: sum over blocks of ceil(kept/GPT), probed
    T_worst = n_blocks * (G_max // GPT)
    T_total = sp.max_flat_tiles or T_worst
    T_total = min(_round_up(max(T_total, 8), 8), T_worst)
    return dict(n0=n0, n_rows=n_rows, GR=GR, M=M, G_max=G_max, nG=nG,
                RMAX=G_max, n_blocks=n_blocks, ext=ext, T_total=T_total)


def probe_plan_numpy(fw: SimFramework, grid: CellGrid, pos) -> dict:
    """Host-side (numpy) probe of the per-rebuild plan geometry on the
    initial particle layout: how many central blocks exist, how many
    neighbor groups the fullest block keeps, and how many flat window
    tiles the whole list needs.  Problem.build uses this to auto-size
    ``SimParams.max_blocks`` / ``max_block_groups`` / ``max_flat_tiles``
    (the analogue of the reference sizing its neighbor list from
    `simparams.h:96` neiblistsize) so the static plan arrays are tight
    instead of worst-case.  The group cull is the same AABB distance test
    the jitted plan uses, plus an evolution margin; runtime overflow still
    aborts like CHECK_NEIBSNUM.
    """
    import numpy as np

    sp = fw.sp
    a0, a1, a2 = grid.order
    n0, n1, n2 = grid.ncells[a0], grid.ncells[a1], grid.ncells[a2]
    n_rows = n1 * n2
    n_cells = grid.n_cells

    pos = np.asarray(pos, np.float64)
    org = np.asarray(grid.origin)
    csz = np.asarray(grid.cell_size)
    ncv = np.asarray(grid.ncells)
    ijk = np.clip(np.floor((pos - org) / csz).astype(np.int64), 0, ncv - 1)
    h = (ijk[:, a2] * n1 + ijk[:, a1]) * n0 + ijk[:, a0]
    srt = np.argsort(h, kind="stable")
    h = h[srt]
    p = pos[srt]
    N = len(h)
    if N == 0:
        return dict(max_blocks=128, max_block_groups=GPT,
                    max_run_extent=GROUP, max_flat_tiles=128)

    cs = np.searchsorted(h, np.arange(n_cells + 1))
    rows = np.arange(n_rows + 1)
    row_first = cs[np.minimum(rows * n0, n_cells)]

    # --- block assignment (mirrors build_block_plan) -------------------
    idx = np.arange(N)
    prow = np.minimum(h // n0, n_rows - 1)
    rank = idx - row_first[prow]
    key_cnt = rank // B
    seg = (h % n0) // SPAN
    prev_h = np.concatenate([[-1], h[:-1]])
    same_row = (prev_h // n0 == h // n0) & (prev_h >= 0)
    trans = same_row & (seg != (prev_h % n0) // SPAN)
    tr_cum = np.cumsum(trans)
    tr_excl = tr_cum - trans
    row_tr0 = tr_excl[np.clip(row_first[prow], 0, N - 1)]
    g_local = key_cnt + (tr_cum - row_tr0)
    last = np.clip(row_first[1:] - 1, 0, N - 1)
    firsts = np.clip(row_first[:-1], 0, N - 1)
    row_np = row_first[1:] - row_first[:-1]
    g_per_row = np.where(
        row_np > 0, (row_np - 1) // B + (tr_cum[last] - tr_excl[firsts]) + 1, 0
    )
    row_gbase = np.concatenate([[0], np.cumsum(g_per_row)])
    nb = int(row_gbase[-1])
    g = row_gbase[prow] + g_local

    first_of_g = np.searchsorted(g, np.arange(nb + 1))
    count = np.minimum(np.diff(first_of_g), B)

    # --- candidate runs + group AABB cull ------------------------------
    p0 = np.clip(first_of_g[:-1], 0, N - 1)
    p1 = np.clip(first_of_g[:-1] + count - 1, 0, N - 1)
    c_lo, c_hi = h[p0], h[p1]
    i_lo = np.maximum(c_lo % n0 - 1, 0)
    i_hi = np.minimum(c_hi % n0 + 1, n0 - 1)
    brow = np.minimum(c_lo // n0, n_rows - 1)
    r1_, r2_ = brow % n1, brow // n1

    n_groups = -(-N // GROUP)
    gpad = np.full((n_groups * GROUP - N, 3), np.nan)
    pg = np.concatenate([p, gpad]).reshape(n_groups, GROUP, 3)
    gmin = np.nanmin(pg, axis=1)
    gmax = np.nanmax(pg, axis=1)
    bmin = np.minimum.reduceat(p, first_of_g[:-1])
    bmax = np.maximum.reduceat(p, first_of_g[:-1])
    bc, bh_ = 0.5 * (bmin + bmax), 0.5 * (bmax - bmin)
    gc, gh = 0.5 * (gmin + gmax), 0.5 * (gmax - gmin)

    r_keep = fw.influenceradius * sp.nlexpansionfactor
    L = np.array(grid.world_size)
    per = np.array([bool(fw.periodicbound & (1 << ax)) for ax in range(3)])

    max_ng = 0
    ext = 0
    ng_parts = []
    g0_parts = []
    for d2 in (-1, 0, 1):
        for d1 in (-1, 0, 1):
            c1 = r1_ + d1
            c2 = r2_ + d2
            valid = count > 0
            if fw.periodicbound & (1 << a1):
                c1 = c1 % n1
            else:
                valid = valid & (c1 >= 0) & (c1 < n1)
                c1 = np.clip(c1, 0, n1 - 1)
            if fw.periodicbound & (1 << a2):
                c2 = c2 % n2
            else:
                valid = valid & (c2 >= 0) & (c2 < n2)
                c2 = np.clip(c2, 0, n2 - 1)
            trow = c2 * n1 + c1
            p_start = cs[trow * n0 + i_lo]
            p_end = cs[trow * n0 + i_hi + 1]
            has = valid & (p_end > p_start)
            g0 = p_start // GROUP
            ng = np.where(has, (p_end - 1) // GROUP - g0 + 1, 0)
            max_ng = max(max_ng, int(ng.max(initial=0)))
            ext = max(ext, int(np.max(p_end - p_start, initial=0)))
            g0_parts.append(g0)
            ng_parts.append(ng)
    GRp = max(max_ng, 1)
    giota = np.arange(GRp)
    kept_max = 0
    tiles_total = 0
    CHUNK = 4096  # bound the [CHUNK, 9*GRp] temporaries
    g0a = np.stack(g0_parts, 1)  # [nb, 9]
    nga = np.stack(ng_parts, 1)
    for s in range(0, nb, CHUNK):
        e = min(s + CHUNK, nb)
        cand = g0a[s:e, :, None] + giota[None, None, :]
        live = giota[None, None, :] < nga[s:e, :, None]
        cand = np.where(live, cand, n_groups).reshape(e - s, -1)
        d = np.abs(gc[np.minimum(cand, n_groups - 1)] - bc[s:e, None, :])
        d = np.where(per[None, None, :], np.minimum(d, L - d), d)
        d = np.maximum(d - gh[np.minimum(cand, n_groups - 1)]
                       - bh_[s:e, None, :], 0.0)
        near = (d * d).sum(-1) < r_keep * r_keep
        cand = np.where(near & (cand < n_groups), cand, n_groups)
        cand.sort(axis=1)
        uniq = np.concatenate(
            [np.ones((e - s, 1), bool), cand[:, 1:] != cand[:, :-1]], axis=1
        )
        kept = ((cand < n_groups) & uniq).sum(1)
        kept_max = max(kept_max, int(kept.max(initial=0)))
        tiles_total += int((-(-kept // GPT)).sum())

    return dict(
        max_blocks=_round_up(int(nb * 1.25) + 16, 128),
        max_block_groups=_round_up(int(kept_max * 1.3) + 2, GPT),
        max_run_extent=_round_up(int(ext * 1.15) + GROUP, 8),
        max_flat_tiles=_round_up(int((tiles_total + nb) * 1.3) + 64, 8),
    )


def build_block_plan(fw: SimFramework, grid: CellGrid, state: ParticleState,
                     aux: CellAux, regions=()) -> BlockPlan:
    """Build block layout + the flat packed neighbor-tile list from the
    *sorted* state and its cell tables.

    ``regions`` lists the static start indices of additional independently
    sorted segments of the particle array (the sharded combined layout
    ``[local | ghost_dn | ghost_up]``, `parallel/domain.py`); hashes are
    ascending within each segment but not across them, and no cell row
    straddles a segment.

    All arrays are O(N) / O(n_blocks x M) vector computations — this runs
    inside the jitted chunk right after the sort (the NEIBS_LIST phase,
    `buildneibs.cu:358-450`).
    """
    capacity = state.capacity
    d = plan_dims(fw, grid, capacity)
    n0, n_rows, GR, M = d["n0"], d["n_rows"], d["GR"], d["M"]
    n_blocks, G_max, nG = d["n_blocks"], d["G_max"], d["nG"]
    T_total = d["T_total"]
    a0, a1, a2 = grid.order
    n1 = grid.ncells[a1]
    n2 = grid.ncells[a2]
    n_cells = grid.n_cells
    sp = fw.sp

    cs = aux.cell_start  # i32[n_cells+2]
    hs = aux.hash_sorted
    # per-row particle ranges
    rows = jnp.arange(n_rows + 1, dtype=jnp.int32)
    row_first = cs[jnp.minimum(rows * n0, n_cells)]  # [n_rows+1]

    # --- block assignment per sorted particle -------------------------------
    # Within a row, a new block starts every B particles OR when the
    # fast-axis SPAN segment changes between consecutive particles (a
    # *dense* span key: empty segments produce no dead block ids).  Blocks
    # never cross rows.
    idx = jnp.arange(capacity, dtype=jnp.int32)
    h = hs[:capacity]
    active = h < n_cells
    prow = jnp.minimum(h // n0, n_rows - 1)
    rank_in_row = idx - row_first[prow]
    key_cnt = rank_in_row // B
    seg = (h % n0) // SPAN
    prev_h = jnp.concatenate([jnp.full((1,), -1, jnp.int32), h[:-1]])
    same_row = (prev_h // n0 == h // n0) & (prev_h >= 0)
    trans = active & same_row & (seg != (prev_h % n0) // SPAN)
    tr_cum = jnp.cumsum(trans.astype(jnp.int32))  # inclusive
    tr_excl = tr_cum - trans
    row_tr0 = tr_excl[jnp.clip(row_first[prow], 0, capacity - 1)]
    g_local = key_cnt + (tr_cum - row_tr0)

    last = jnp.clip(row_first[1:] - 1, 0, capacity - 1)  # last particle/row
    firsts = jnp.clip(row_first[:-1], 0, capacity - 1)
    row_np = row_first[1:] - row_first[:-1]
    g_per_row = jnp.where(
        row_np > 0,
        (row_np - 1) // B + (tr_cum[last] - tr_excl[firsts]) + 1,
        0,
    )
    row_gbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(g_per_row, dtype=jnp.int32)]
    )
    blocks_used = row_gbase[-1]
    g = jnp.where(active, jnp.minimum(row_gbase[prow] + g_local, n_blocks),
                  n_blocks)

    # first/last particle per block.  g is non-decreasing within each
    # sorted segment of the particle array; resolve each block's range in
    # the segment that owns its row (single-device: one segment).
    blk_ids = jnp.arange(n_blocks + 1, dtype=jnp.int32)
    seg_bounds = (0,) + tuple(regions) + (capacity,)
    if len(regions) == 0:
        first_of_g = jnp.searchsorted(g, blk_ids, side="left").astype(jnp.int32)
        end_of_g = first_of_g[1:]
        first_of_g = first_of_g[:-1]
    else:
        # which segment owns block b: via its row's first-particle index
        row_of_block = (
            jnp.searchsorted(row_gbase, blk_ids[:-1], side="right") - 1
        ).astype(jnp.int32)
        rf_blk = row_first[jnp.clip(row_of_block, 0, n_rows)]
        first_of_g = end_of_g = None
        for si in range(len(seg_bounds) - 1):
            lo, hi = seg_bounds[si], seg_bounds[si + 1]
            fg = lo + jnp.searchsorted(
                g[lo:hi], blk_ids[:-1], side="left").astype(jnp.int32)
            eg = lo + jnp.searchsorted(
                g[lo:hi], blk_ids[:-1], side="right").astype(jnp.int32)
            owns = (rf_blk >= lo) & (rf_blk < hi)
            first_of_g = fg if first_of_g is None else jnp.where(
                owns, fg, first_of_g)
            end_of_g = eg if end_of_g is None else jnp.where(
                owns, eg, end_of_g)
    count = jnp.minimum(end_of_g - first_of_g, B)

    slot_of_sorted = jnp.where(
        active, g * B + (idx - first_of_g[jnp.minimum(g, n_blocks - 1)]),
        n_blocks * B - 1,
    )
    slot_of_sorted = jnp.clip(slot_of_sorted, 0, n_blocks * B - 1)

    # sorted particle (or sentinel=capacity) of each central slot; the
    # trailing dummy block (pad tiles land there) is all-sentinel
    slots = jnp.arange((n_blocks + 1) * B, dtype=jnp.int32)
    sg = jnp.minimum(slots // B, n_blocks - 1)
    in_g = slots - (slots // B) * B
    cen_idx = jnp.where(
        (slots < n_blocks * B) & (in_g < count[sg]),
        first_of_g[sg] + in_g, capacity)

    # --- 9 candidate runs per block (3x3 neighbor rows x fast span +-1) -----
    nonempty = count > 0
    p0 = jnp.clip(first_of_g, 0, capacity - 1)
    p1 = jnp.clip(first_of_g + count - 1, 0, capacity - 1)
    c_lo = jnp.where(nonempty, hs[p0], 0)
    c_hi = jnp.where(nonempty, hs[p1], 0)
    i_lo = jnp.maximum(c_lo % n0 - 1, 0)
    i_hi = jnp.minimum(c_hi % n0 + 1, n0 - 1)
    brow = jnp.minimum(c_lo // n0, n_rows - 1)
    r1 = brow % n1  # a1 coordinate of the block's row
    r2 = brow // n1  # a2 coordinate

    GBIG = jnp.int32(nG)  # sentinel: one past the last real group
    giota = jnp.arange(GR, dtype=jnp.int32)[None, :]
    cands = []
    max_ng = jnp.zeros((), jnp.int32)
    for d2 in (-1, 0, 1):
        for d1 in (-1, 0, 1):
            c1 = r1 + d1
            c2 = r2 + d2
            valid = nonempty
            if fw.periodicbound & (1 << a1):
                c1 = c1 % n1
            else:
                valid = valid & (c1 >= 0) & (c1 < n1)
                c1 = jnp.clip(c1, 0, n1 - 1)
            if fw.periodicbound & (1 << a2):
                c2 = c2 % n2
            else:
                valid = valid & (c2 >= 0) & (c2 < n2)
                c2 = jnp.clip(c2, 0, n2 - 1)
            trow = c2 * n1 + c1
            p_start = cs[trow * n0 + i_lo]
            p_end = cs[trow * n0 + i_hi + 1]
            has = valid & (p_end > p_start)
            g0 = p_start // GROUP
            ng = jnp.where(has, (p_end - 1) // GROUP - g0 + 1, 0)
            max_ng = jnp.maximum(max_ng, jnp.max(ng))
            cands.append(jnp.where(giota < ng[:, None], g0[:, None] + giota,
                                   GBIG))
    cand = jnp.concatenate(cands, axis=1)  # [n_blocks, M]

    # --- dedup (runs from adjacent rows can straddle one group) -------------
    cand = jnp.sort(cand, axis=1)
    uniq = jnp.concatenate(
        [jnp.ones((n_blocks, 1), bool), cand[:, 1:] != cand[:, :-1]], axis=1
    )

    # --- conservative AABB cull at GROUP granularity -------------------------
    # keep a group iff its active-particle bounding box comes within r_keep
    # of the box of the block's centrals (rebuild-time positions; reference
    # nlInfluenceRadius, simparams.h:101).  Boxes over *active* rows only:
    # inactive rows are r2-culled in the kernel via their PAD_POS fields.
    r_keep = fw.influenceradius * sp.nlexpansionfactor
    r_keep2 = jnp.float32(r_keep * r_keep)
    act_col = is_active(state.info)[:, None]
    pos_lo = jnp.where(act_col, state.pos, jnp.inf)
    pos_hi = jnp.where(act_col, state.pos, -jnp.inf)
    pad_rows = nG * GROUP - capacity
    gmin = jnp.min(jnp.concatenate(
        [pos_lo, jnp.full((pad_rows, 3), jnp.inf, jnp.float32)], 0
    ).reshape(nG, GROUP, 3), axis=1)
    gmax = jnp.max(jnp.concatenate(
        [pos_hi, jnp.full((pad_rows, 3), -jnp.inf, jnp.float32)], 0
    ).reshape(nG, GROUP, 3), axis=1)
    gbox = jnp.concatenate(
        [0.5 * (gmin + gmax), 0.5 * (gmax - gmin)], axis=1)  # [nG, 6]

    pos_pad = jnp.concatenate(
        [jnp.where(act_col, state.pos, PAD_POS),
         jnp.full((1, 3), PAD_POS, jnp.float32)], axis=0)
    cpos = pos_pad[cen_idx[: n_blocks * B]].reshape(n_blocks, B, 3)
    cvalid = (jnp.arange(B, dtype=jnp.int32)[None, :]
              < count[:, None])[:, :, None]
    bmin = jnp.min(jnp.where(cvalid, cpos, jnp.inf), axis=1)
    bmax = jnp.max(jnp.where(cvalid, cpos, -jnp.inf), axis=1)
    bc = 0.5 * (bmin + bmax)
    bh = 0.5 * (bmax - bmin)

    gb = gbox[jnp.minimum(cand, nG - 1)]  # [nb, M, 6]
    dctr = jnp.abs(gb[..., :3] - bc[:, None, :])
    L = jnp.asarray(grid.world_size, jnp.float32)
    per_mask = jnp.asarray(
        [1.0 if fw.periodicbound & (1 << ax) else 0.0 for ax in range(3)],
        jnp.float32)
    dctr = jnp.where(per_mask > 0, jnp.minimum(dctr, L - dctr), dctr)
    dbox = jnp.maximum(dctr - gb[..., 3:] - bh[:, None, :], 0.0)
    near = jnp.sum(dbox * dbox, axis=-1) < r_keep2
    keep = near & uniq & (cand < GBIG)

    # --- compact to the flat packed tile list -------------------------------
    key = jnp.where(keep, cand, GBIG)
    win_groups = jnp.sort(key, axis=1)  # kept (asc) then GBIG pads
    kept = jnp.sum(keep.astype(jnp.int32), axis=1)
    tiles_b = -(-kept // GPT)  # ceil
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tiles_b, dtype=jnp.int32)]
    )  # [nb+1]
    t_used = off[-1]

    t_ids = jnp.arange(T_total, dtype=jnp.int32)
    tile_block = (jnp.searchsorted(off, t_ids, side="right") - 1).astype(
        jnp.int32)  # pad tiles (t >= t_used) -> n_blocks (the dummy block)
    tile_block = jnp.minimum(tile_block, n_blocks)

    s_ids = jnp.arange(T_total * GPT, dtype=jnp.int32)
    ts = s_ids // GPT
    js = s_ids - ts * GPT
    bs = tile_block[ts]
    bcl = jnp.minimum(bs, n_blocks - 1)
    gi = (ts - off[bcl]) * GPT + js
    gi_cl = jnp.clip(gi, 0, M - 1)
    wg = win_groups[bcl, gi_cl]
    live = (bs < n_blocks) & (gi >= 0) & (gi < kept[bcl])
    flat_groups = jnp.where(live, wg, GBIG)

    # structural overflows surface like CHECK_NEIBSNUM (GPUSPH.cc:1851):
    # block table full, a run longer than the probed extent, or the flat
    # tile list overflowing its static capacity; kept > G_max is caught by
    # max_run itself (run_cap = G_max)
    overflow = ((blocks_used > n_blocks) | (max_ng > GR)
                | (t_used > T_total)).astype(jnp.int32)
    max_run = jnp.maximum(jnp.max(kept), overflow * jnp.int32(1_000_000))

    return BlockPlan(
        flat_groups=flat_groups,
        tile_block=tile_block,
        cen_idx=cen_idx,
        slot_of_sorted=slot_of_sorted,
        max_run=max_run,
    )


def _pack_cols(fw: SimFramework, state: ParticleState, effvisc=None):
    """Per-particle property columns (f32[N] each) in kernel order."""
    pp = fw.pp
    f_num = fluid_num(state.info)
    ptype = part_type(state.info)
    rho_phys = eos.physical_density(pp, state.rho, f_num)
    press = eos.pressure(pp, state.rho, f_num)
    sspeed = eos.sound_speed(pp, state.rho, f_num)
    N = state.capacity

    cols = [None] * NCOLS
    cols[C_POSX] = state.pos[:, 0]
    cols[C_POSY] = state.pos[:, 1]
    cols[C_POSZ] = state.pos[:, 2]
    cols[C_VELX] = state.vel[:, 0]
    cols[C_VELY] = state.vel[:, 1]
    cols[C_VELZ] = state.vel[:, 2]
    cols[C_MASS] = state.mass
    cols[C_RHO] = rho_phys
    cols[C_PPRE] = press / (rho_phys * rho_phys)
    cols[C_SSPEED] = sspeed
    cols[C_PRESS] = press
    cols[C_FLUID] = (ptype == ParticleType.FLUID).astype(jnp.float32)
    cols[C_BOUND] = (ptype == ParticleType.BOUNDARY).astype(jnp.float32)
    if not fw.is_inviscid:
        kinvisc = eos._per_fluid(pp, f_num, [f.kinematic_visc for f in pp.fluids])
        if effvisc is not None:
            kinvisc = effvisc
        cols[C_DVISC] = kinvisc * rho_phys
    else:
        cols[C_DVISC] = jnp.zeros(N, jnp.float32)
    # inactive rows carry stale fields: park them at the pad position so
    # window-group slop can never resurrect a killed particle
    act = is_active(state.info)
    for c in (C_POSX, C_POSY, C_POSZ):
        cols[c] = jnp.where(act, cols[c], PAD_POS)
    for i in range(NCOLS):
        if cols[i] is None:
            cols[i] = jnp.zeros(N, jnp.float32)
    return cols


def _prop_table(fw: SimFramework, state: ParticleState, effvisc=None):
    """[N+1, 16] property table; row N is the pad sentinel (PAD_POS, rho=1)."""
    cols = _pack_cols(fw, state, effvisc)
    pad = [0.0] * NCOLS
    pad[C_POSX] = pad[C_POSY] = pad[C_POSZ] = PAD_POS
    pad[C_RHO] = 1.0
    return jnp.stack(
        [jnp.concatenate([c, jnp.full((1,), pv, jnp.float32)])
         for c, pv in zip(cols, pad)],
        axis=1,
    )


def _pack_tables(fw: SimFramework, grid: CellGrid, state: ParticleState,
                 plan: BlockPlan, effvisc=None):
    """Window tiles [T_total, 16, 128] (raw gather layout) + central table
    [nb+1, B, 16] for this pass (current fields, rebuild-time lists).

    The window gather is ONE flat row gather of (GROUP*NCOLS*4)-byte rows —
    the only XLA gather shape that runs near memory bandwidth on TPU (any
    layout transpose here drops ~8x; the kernel fixes the layout in VMEM).
    """
    P = _prop_table(fw, state, effvisc)  # [cap+1, NCOLS]
    capacity = state.capacity
    nG = -(-capacity // GROUP) if capacity else 1
    pad_rows = (nG + 1) * GROUP - (capacity + 1)
    Pp = jnp.concatenate(
        [P, jnp.broadcast_to(P[-1], (pad_rows, NCOLS))], axis=0)
    Pg = Pp.reshape(nG + 1, GROUP * NCOLS)
    T_total = plan.tile_block.shape[0]
    win = Pg[plan.flat_groups].reshape(T_total, NCOLS, TS)

    nb1 = plan.cen_idx.shape[0] // B
    cen = P[plan.cen_idx].reshape(nb1, B, NCOLS)
    return win, cen


def _pair_chunk(fw: SimFramework, grid: CellGrid, cen, w):
    """Pair physics for one window tile: centrals ``cen`` [B, NCOLS] vs
    window slots ``w`` [NCOLS, TS].  Returns the [NOUT, B] partial sums."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    f32 = jnp.float32
    # optional reduced-precision coefficient chain: geometry (rel, r2, masks)
    # stays f32; the per-pair force factors run in bf16 (SimParams.pairs_bf16)
    cd = jnp.bfloat16 if sp.pairs_bf16 else jnp.float32
    co = lambda v: jnp.asarray(v, cd)  # noqa: E731
    rad2 = f32(sp.influenceradius * sp.influenceradius)

    def ccolf(c):
        return cen[:, c].reshape(B, 1)

    def ccol(c):
        return ccolf(c).astype(cd)

    def wrowf(c):
        return w[c, :].reshape(1, TS)

    def wrow(c):
        return wrowf(c).astype(cd)

    cx, cy, cz = ccolf(C_POSX), ccolf(C_POSY), ccolf(C_POSZ)
    cvx, cvy, cvz = ccol(C_VELX), ccol(C_VELY), ccol(C_VELZ)
    c_rho = ccol(C_RHO)
    c_ss = ccol(C_SSPEED)
    c_fluid = ccol(C_FLUID)
    c_bound = ccol(C_BOUND)

    Lx, Ly, Lz = grid.world_size
    per = int(fw.periodicbound)
    dyn = fw.boundarytype == BoundaryType.DYN_BOUNDARY
    ddt = fw.densitydiffusiontype
    has_energy = bool(fw.flags & SimFlags.ENABLE_INTERNAL_ENERGY)

    if dyn:
        c_any = c_fluid + c_bound - c_fluid * c_bound

    # --- geometry (always f32) ---------------------------------------
    def rel_f(cc, wc, L, bit):
        rl = cc - wrowf(wc)
        if per & bit:
            rl = rl - f32(L) * jnp.round(rl * f32(1.0 / L))
        return rl

    relx_f = rel_f(cx, C_POSX, Lx, 1 << 0)
    rely_f = rel_f(cy, C_POSY, Ly, 1 << 1)
    relz_f = rel_f(cz, C_POSZ, Lz, 1 << 2)
    r2f = relx_f * relx_f + rely_f * rely_f + relz_f * relz_f
    # self-pairs are excluded by r2 > 0: distinct particles never share
    # an f32 position in a valid state (replaces the id compare); pad
    # slots sit at PAD_POS and fail r2 < rad2
    mask = (r2f < rad2) & (r2f > 0.0)
    fmask = mask.astype(cd)
    # clamp so pad-slot distances never overflow kernel polynomials
    r = jnp.sqrt(jnp.minimum(r2f, rad2)).astype(cd)
    relx = relx_f.astype(cd)
    rely = rely_f.astype(cd)
    relz = relz_f.astype(cd)
    r2 = r2f.astype(cd)

    fK = kernF(fw.kerneltype, r, h)

    relvx = cvx - wrow(C_VELX)
    relvy = cvy - wrow(C_VELY)
    relvz = cvz - wrow(C_VELZ)
    vdp = relvx * relx + relvy * rely + relvz * relz

    n_fluid = wrow(C_FLUID)
    n_bound = wrow(C_BOUND)
    m_n = wrow(C_MASS)
    rho_c = c_rho
    rho_n = wrow(C_RHO)
    mfK = m_n * fK  # shared mass-weighted kernel gradient factor

    # continuity (forces_kernel.def:2139-2155)
    if dyn:
        cont = fmask * c_any * (n_fluid + n_bound - n_fluid * n_bound)
    else:
        cont = fmask * c_fluid * n_fluid
    DrDt_term = vdp * mfK
    if fw.sph_formulation == SPHFormulation.SPH_F2:
        DrDt_term = DrDt_term * rho_c / rho_n
    DrDt = cont * DrDt_term

    ff = fmask * c_fluid * n_fluid

    # density diffusion
    if ddt != DensityDiffusionType.NONE:
        gxyz = pp.gravity
        g_dot_rel = (
            co(gxyz[0]) * relx + co(gxyz[1]) * rely + co(gxyz[2]) * relz
        )
    if ddt == DensityDiffusionType.COLAGROSSI:
        press_c = ccol(C_PRESS)
        press_n = wrow(C_PRESS)
        gate = (jnp.abs((press_c - press_n).astype(f32))
                >= jnp.abs((g_dot_rel * rho_c).astype(f32))).astype(cd)
        c0 = co(pp.fluids[0].c0)
        coeff = co(sp.densityDiffCoeff * 2.0 * sp.slength)
        DrDt = DrDt - ff * gate * coeff * c0 * (rho_n / rho_c - 1.0) * mfK
    elif ddt == DensityDiffusionType.FERRARI:
        sq_c0 = co(pp.fluids[0].c0 ** 2)
        rho0_c = co(pp.fluids[0].rho0)
        grav_corr = -g_dot_rel * rho0_c / sq_c0
        max_ss = jnp.maximum(c_ss.astype(f32), wrowf(C_SSPEED)).astype(cd)
        safe = (r2f > (1e-4 * h) ** 2).astype(cd)
        DrDt = DrDt + ff * safe * co(sp.densityDiffCoeff) * max_ss * (
            rho_c - rho_n + grav_corr
        ) / rho_c * r * mfK

    # momentum (pressure gradient)
    if dyn:
        mom = fmask * c_fluid * (n_fluid + n_bound - n_fluid * n_bound)
    else:
        mom = ff
    if fw.has_moving_bodies:
        # body force feedback: boundary centrals vs fluid neighbors
        mom = mom + fmask * c_bound * n_fluid
    if fw.sph_formulation == SPHFormulation.SPH_F2:
        pgrad = (ccol(C_PRESS) + wrow(C_PRESS)) / (rho_c * rho_n)
    else:
        pgrad = ccol(C_PPRE) + wrow(C_PPRE)
    s = -mom * pgrad * mfK

    if fw.visc.turbmodel == TurbulenceModel.ARTIFICIAL:
        eps = co(pp.epsartvisc)
        art = (
            vdp
            * co(h * pp.artvisccoeff)
            * (c_ss + wrow(C_SSPEED))
            / ((r2 + eps) * (rho_c + rho_n))
        )
        s = s + mom * (vdp.astype(f32) < 0.0).astype(cd) * art * mfK

    sv = None
    if not fw.is_inviscid:
        mu_avg = _avg(fw.visc.avgop, ccol(C_DVISC), wrow(C_DVISC))
        visc_coeff = 2.0 * mu_avg * m_n / (rho_c * rho_n)
        if fw.visc.viscmodel == ViscousModel.MONAGHAN:
            eps = co(pp.epsartvisc)
            mon = (vdp.astype(f32) < 0).astype(cd) * vdp / (r2 + eps)
            coeff = pp.monaghan_visc_coeff
            if coeff != coeff:
                coeff = 1.0
            s = s + mom * co(coeff) * visc_coeff * fK * mon
        else:
            sv = mom * visc_coeff * fK

    if fw.repulsive_boundary:
        rep_mask = fmask * c_fluid * n_bound
        rf = jnp.sqrt(jnp.minimum(r2f, rad2))
        if fw.boundarytype == BoundaryType.LJ_BOUNDARY:
            inv_r = f32(1.0) / jnp.maximum(rf, f32(1e-3 * pp.r0))
            ratio = f32(pp.r0) * inv_r
            lj = (
                f32(pp.dcoeff)
                * (_powf(ratio, pp.p1coeff) - _powf(ratio, pp.p2coeff))
                * inv_r * inv_r
            )
            lj = jnp.minimum(lj, f32(1e30))
            rep = jnp.where(rf < f32(pp.r0), lj, f32(0.0)).astype(cd)
        else:
            q = rf / f32(h)
            wmk = 1.8 * (1.0 - 0.5 * q) ** 4 * (2.0 * q + 1.0)
            dist = jnp.maximum(f32(pp.epsartvisc), rf - f32(pp.mk_d))
            m_c = ccolf(C_MASS)
            safe_r = jnp.maximum(rf, f32(1e-12))
            rep = (
                f32(pp.mk_k) * wmk * 2.0 * m_n.astype(f32)
                / (f32(pp.mk_beta) * dist * safe_r * (m_c + m_n.astype(f32)))
            ).astype(cd)
        s = s + rep_mask * rep

    DvDt_x = s * relx
    DvDt_y = s * rely
    DvDt_z = s * relz
    if sv is not None:
        DvDt_x = DvDt_x + sv * relvx
        DvDt_y = DvDt_y + sv * relvy
        DvDt_z = DvDt_z + sv * relvz

    f32sum = functools.partial(jnp.sum, axis=1, keepdims=True,
                               dtype=jnp.float32)
    a_DrDt = f32sum(DrDt)
    a_x = f32sum(DvDt_x)
    a_y = f32sum(DvDt_y)
    a_z = f32sum(DvDt_z)
    z = jnp.zeros((B, 1), jnp.float32)
    a_xs_x = a_xs_y = a_xs_z = a_e = z
    if fw.has_xsph:
        # XSPH mean velocity, reference factor 2 (forces_kernel.def:3368)
        from .kernels import W as kernW

        wK = kernW(fw.kerneltype, r, h)
        xw = ff * (-2.0 * m_n) * wK / (rho_c + rho_n)
        a_xs_x = f32sum(xw * relvx)
        a_xs_y = f32sum(xw * relvy)
        a_xs_z = f32sum(xw * relvz)
    if has_energy:
        # dU/dt -= (a_pair . v_ij)/2 (forces_kernel.def:3306-3316)
        dedt = s * vdp
        if sv is not None:
            dedt = dedt + sv * (relvx * relvx + relvy * relvy + relvz * relvz)
        a_e = f32sum(-0.5 * dedt)
    # [B, NOUT] -> [NOUT, B]: keeps the out array lane-efficient (B lanes)
    return jnp.concatenate(
        [a_DrDt, a_x, a_y, a_z, a_xs_x, a_xs_y, a_xs_z, a_e], axis=1).T


def _forces_kernel(fw, grid, tb_ref, win_ref, cen_ref, out_ref):
    """One program = one flat window tile.  Consecutive tiles of the same
    block accumulate into the block's output, which stays resident in VMEM
    while the (scalar-prefetched) block index is unchanged."""
    i = pl.program_id(0)
    tb = tb_ref[i]
    prev = tb_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, tb != prev)

    # layout fix: the pass gather delivers the tile raw as
    # (GPT groups, GROUP slots, NCOLS fields) read as [NCOLS, TS]; shuffle
    # to fields x slots in VMEM (near-free vs doing it in XLA at ~35 GB/s)
    w = win_ref[0].reshape(GPT, GROUP, NCOLS).transpose(2, 0, 1).reshape(
        NCOLS, TS)
    acc = _pair_chunk(fw, grid, cen_ref[0], w)

    @pl.when(first)
    def _():
        out_ref[0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        out_ref[0] = out_ref[0] + acc


def compute_forces_pallas(
    fw: SimFramework,
    grid: CellGrid,
    state: ParticleState,
    aux: CellAux,
    *,
    dt: Optional[jax.Array] = None,
    sps_tau=None,
    effvisc=None,
    table: Optional[BlockPlan] = None,
) -> ForcesOut:
    """Pallas-accelerated forces pass (same contract as compute_forces).

    ``table`` is the per-rebuild :class:`BlockPlan`; pass it in when calling
    repeatedly between rebuilds to avoid recomputing it.
    """
    sp, pp = fw.sp, fw.pp
    N = state.capacity

    plan = table if table is not None else build_block_plan(fw, grid, state, aux)
    win, cen = _pack_tables(fw, grid, state, plan, effvisc=effvisc)
    T_total = plan.tile_block.shape[0]
    nb1 = cen.shape[0]  # n_blocks + 1 (trailing dummy block for pad tiles)

    # interpreter mode on CPU lets the unit tests validate the kernel logic
    interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_forces_kernel, fw, grid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T_total,),
        in_specs=[
            pl.BlockSpec((1, NCOLS, TS), lambda i, tb: (i, 0, 0)),
            pl.BlockSpec((1, B, NCOLS), lambda i, tb: (tb[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NOUT, B), lambda i, tb: (tb[i], 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb1, NOUT, B), jnp.float32),
        interpret=interpret,
    )(plan.tile_block, win, cen)

    # un-bin: per-particle gather from the [n_blocks*B, NOUT] slot layout.
    # Blocks never visited by a tile hold garbage rows, but every *active*
    # particle's block keeps >= 1 group (its own), so its row is written;
    # inactive rows are where-masked below.
    out_rows = out[:-1].transpose(0, 2, 1).reshape(-1, NOUT)
    active = is_active(state.info)
    rows = out_rows[plan.slot_of_sorted]
    rows = jnp.where(active[:, None], rows, 0.0)

    DrDt_phys = rows[:, 0]
    DvDt = rows[:, 1:4]
    if fw.has_xsph:
        xsph = rows[:, 4:7]
    else:
        xsph = jnp.zeros_like(state.vel)
    DEDt = rows[:, 7]

    # finalize: gravity, unit conversion, CFL maxima (forces.cu:557-600)
    ptype = part_type(state.info)
    is_fluid_c = ptype == ParticleType.FLUID
    f_num = fluid_num(state.info)
    gvec = jnp.asarray(pp.gravity, jnp.float32)
    DvDt = jnp.where(is_fluid_c[:, None], DvDt + gvec[None, :], DvDt)
    if not fw.has_moving_bodies:
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
    rho0 = eos._per_fluid(pp, f_num, [f.rho0 for f in pp.fluids])
    DrDt = DrDt_phys / rho0

    sspeed = eos.sound_speed(pp, state.rho, f_num)
    accel2 = jnp.sum(DvDt * DvDt, axis=-1)
    max_accel = jnp.sqrt(jnp.max(jnp.where(is_fluid_c, accel2, 0.0)))
    max_sspeed = jnp.max(jnp.where(is_fluid_c, sspeed, 0.0))
    if not fw.is_inviscid:
        kinvisc = eos._per_fluid(pp, f_num, [f.kinematic_visc for f in pp.fluids])
        if effvisc is not None:
            kinvisc = effvisc
        max_kinvisc = jnp.max(jnp.where(is_fluid_c, kinvisc, 0.0))
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
    )


__all__ = [
    "compute_forces_pallas",
    "pallas_supported",
    "build_block_plan",
    "BlockPlan",
    "plan_dims",
]
