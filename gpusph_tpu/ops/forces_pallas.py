"""Pallas TPU forces kernel: the speed-of-light path for the SPH RHS.

Block-window design (v2).  The round-1 kernel processed one *cell* per
program against dense 9-run candidate windows sized for the worst case,
which wasted ~100x pair slots on padding (avg cell occupancy ~6 vs K=72
capacity, worst-case run extents) and was VPU-bound at ~36 ms/pass for
129k particles.  This version processes a *block* of B=64 consecutive
sorted particles as centrals and sizes all work by the block's actual
geometry:

* After the cell sort, particles are laid out in a row-padded **slot
  array**: a "row" is the set of cells sharing the two slow linearization
  coordinates (one fast-axis line of cells, contiguous in sorted order —
  the same observation the reference exploits for cell bursts,
  `src/GPUWorker.cc:477`); each row's particles are padded to a multiple of
  B so fixed B-sized central blocks never straddle rows.
* Particle properties live in ONE dense tiled table ``ptab [S/128, 16,
  128]`` (tile t = 16 fields x 128 consecutive slots) — minor dims (16,128)
  match the TPU (8,128) tiling exactly, so there is no layout padding: the
  table is dense in HBM and every DMA moves only useful bytes.
* The candidates of a block are 9 runs of the slot array (3x3 neighbor
  rows x the block's fast-axis cell span +-1 cell).  Each run is fetched as
  1..P whole [16,128] tiles (dynamic leading-index DMA) into a chunked VMEM
  window; a single flat ``fori_loop`` then evaluates [B x 128] pair physics
  per fetched chunk — the trip count is the block's *actual* tile count, so
  compute adapts to local occupancy instead of paying worst-case padding.
* Masks handle cutoff, self-pairs, run slack (starts quantized to the
  128-slot tile) and row padding; pad slots carry far-away positions so the
  r2 < r_influence^2 test culls them.
* Blocks are grouped BPP per program (grid = (n_programs, BPP)) so
  per-program pipeline costs (SMEM table fetch) amortize; window and
  central DMAs are double-buffered across consecutive blocks.

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
from ..state import ParticleState, fluid_num, part_type
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

import os as _os

NOUT = 8  # DrDt, DvDt xyz, xsph xyz, DEDt
# geometry knobs (env-overridable for perf sweeps; defaults are the tuned
# production values)
B = int(_os.environ.get("GTPU_B", "64"))  # central block size (slots)
# table tile size (slots per [16,TS] tile) = compute chunk width.  128 beats
# 256: the ~uniform(0,TS) run slack wastes half as many pair slots (measured
# T128 mean 11.6 tiles vs T256 ~9 at 2x the width on DamBreak3D dp=0.012)
TS = int(_os.environ.get("GTPU_TS", "128"))
# unrolled compute sites per block: sites are fully unrolled (a fori_loop
# body costs ~350ns/trip of loop machinery on v5e — 2.5x the [64,128] pair
# math itself, measured in scripts/exp_iter3.py); blocks with more tiles
# than T_CAP fall into a dynamic fori tail, so T_CAP trades dead-site waste
# (low cap = none, tail often) against tail trips (high cap = never)
T_CAP = int(_os.environ.get("GTPU_TCAP", "14"))
# max fast-axis cells per block (bounds the run extent statically)
SPAN = int(_os.environ.get("GTPU_SPAN", "16"))
PAD_POS = 1.0e4  # pad-slot coordinate: far away, finite under f32 kernels


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_supported(fw: SimFramework, grid: CellGrid) -> bool:
    """Configurations covered by the Pallas kernel."""
    if grid.fast_axis_periodic:
        return False  # runs would wrap; XLA path handles it
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
    """Per-rebuild DMA/compute plan (built once per neighbor rebuild, reused
    by every forces pass of the chunk — the analogue of the reference's
    neighbor list, `buildneibs_kernel.cu:1029`, reduced to slot geometry)."""

    table: jax.Array  # i32[n_programs, BPP, 32] per-block run table
    tnext: jax.Array  # i32[n_programs, 1, 32] next program's first block
    gather_idx: jax.Array  # i32[S_pack] sorted-particle index per slot
    slot_of_sorted: jax.Array  # i32[capacity] slot per sorted particle
    max_run: jax.Array  # i32[] max (slack+len) over all runs


def plan_dims(fw: SimFramework, grid: CellGrid, capacity: int):
    """Static plan dimensions for a framework + grid + capacity."""
    sp = fw.sp
    a0, a1, a2 = grid.order
    n0 = grid.ncells[a0]
    n_rows = grid.ncells[a1] * grid.ncells[a2]
    n_cells = grid.n_cells
    K = sp.max_parts_per_cell
    # worst run: a block spans at most SPAN fast-axis cells (group split
    # rule) + one halo cell each side, + tile alignment slack.
    # sp.max_run_extent (max particles over SPAN+2 consecutive fast-axis
    # cells, auto-probed by Problem.build) bounds this tighter than
    # (SPAN+2)*K.
    ext = sp.max_run_extent if sp.max_run_extent else (SPAN + 2) * K
    # slot extent can exceed the particle extent by the block-padding gaps
    # inside the run (<= one per count-split + two span-splits)
    ext_slots = ext + (ext // B + 3) * (B - 1)
    P = _round_up(ext_slots + TS, TS) // TS  # max tiles per run
    T_MAX = 9 * P  # chunk-list capacity per block
    TW = _round_up(32 + 3 * T_MAX, 32)  # table row width (i32)
    # block count bound: count splits (every B particles) + span splits
    # (at most one per SPAN-aligned segment of occupied cells) + one per row
    BPP = 8
    n_blocks = _round_up(
        capacity // B + n_cells // SPAN + n_rows + 2, BPP
    )
    # tail so DMAs never read OOB; tile-multiple for the 3D table
    S_pack = _round_up(n_blocks * B + (P + 1) * TS, TS)
    return dict(n0=n0, n_rows=n_rows, P=P, BPP=BPP, RMAX=P * TS,
                T_MAX=T_MAX, TW=TW,
                n_blocks=n_blocks, n_programs=n_blocks // BPP, S_pack=S_pack)


def build_block_plan(fw: SimFramework, grid: CellGrid, aux: CellAux,
                     capacity: int) -> BlockPlan:
    """Build the slot layout and per-block run table from the cell tables.

    All arrays are O(S) / O(n_blocks) vector computations — this runs inside
    the jitted chunk right after the sort (NEIBS_LIST phase).
    """
    d = plan_dims(fw, grid, capacity)
    n0, n_rows, P = d["n0"], d["n_rows"], d["P"]
    n_blocks, BPP, S_pack = d["n_blocks"], d["BPP"], d["S_pack"]
    a0, a1, a2 = grid.order
    n1 = grid.ncells[a1]
    n2 = grid.ncells[a2]
    n_cells = grid.n_cells

    cs = aux.cell_start  # i32[n_cells+2]
    hs = aux.hash_sorted
    # per-row particle ranges
    rows = jnp.arange(n_rows + 1, dtype=jnp.int32)
    row_first = cs[jnp.minimum(rows * n0, n_cells)]  # [n_rows+1]

    # --- group (block) assignment per sorted particle ----------------------
    # Within a row, a new block starts every B particles OR every SPAN
    # fast-axis cells (sum of two monotone step keys => monotone group-local
    # ids with both bounds enforced); blocks never cross rows.
    idx = jnp.arange(capacity, dtype=jnp.int32)
    h = hs[:capacity]
    active = h < n_cells
    prow = jnp.minimum(h // n0, n_rows - 1)
    rank_in_row = idx - row_first[prow]
    key_cnt = rank_in_row // B
    key_span = (h % n0) // SPAN
    g_local = key_cnt + key_span
    # groups per row (from its last particle) -> global group base per row
    last = jnp.clip(row_first[1:] - 1, 0, capacity - 1)  # last particle/row
    row_np = row_first[1:] - row_first[:-1]
    g_per_row = jnp.where(
        row_np > 0,
        (row_np - 1) // B + (jnp.minimum(hs[last], n_cells - 1) % n0) // SPAN + 1,
        0,
    )
    row_gbase = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(g_per_row, dtype=jnp.int32)]
    )
    g = jnp.where(active, row_gbase[prow] + g_local, n_blocks)

    # first particle / count per block
    first_of_g = jnp.searchsorted(
        g, jnp.arange(n_blocks + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    count = jnp.minimum(first_of_g[1:] - first_of_g[:-1], B)

    slot_of_sorted = jnp.where(
        active, g * B + (idx - first_of_g[jnp.minimum(g, n_blocks)]),
        S_pack - 1,
    )
    slot_of_sorted = jnp.clip(slot_of_sorted, 0, S_pack - 1)

    # sorted particle (or sentinel=capacity) of each slot
    slots = jnp.arange(S_pack, dtype=jnp.int32)
    sg = jnp.minimum(slots // B, n_blocks - 1)
    in_g = slots - sg * B
    gather_idx = jnp.where(
        in_g < count[sg], first_of_g[sg] + in_g, capacity
    )

    # --- per-block run table -------------------------------------------------
    nonempty = count > 0
    p0 = jnp.clip(first_of_g[:-1], 0, capacity - 1)
    p1 = jnp.clip(first_of_g[:-1] + count - 1, 0, capacity - 1)
    c_lo = jnp.where(nonempty, hs[p0], 0)
    c_hi = jnp.where(nonempty, hs[p1], 0)
    i_lo = jnp.maximum(c_lo % n0 - 1, 0)
    i_hi = jnp.minimum(c_hi % n0 + 1, n0 - 1)
    brow = jnp.minimum(c_lo // n0, n_rows - 1)
    r1 = brow % n1  # a1 coordinate of the block's row
    r2 = brow // n1  # a2 coordinate

    tiles, slacks, lens = [], [], []
    max_run = jnp.zeros((), jnp.int32)
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
            lin_lo = trow * n0 + i_lo
            lin_hi = trow * n0 + i_hi
            p_start = cs[lin_lo]
            p_end = cs[lin_hi + 1]
            has = valid & (p_end > p_start)
            # particle -> slot range (contiguous incl. block-padding gaps,
            # whose sentinel slots are geometry-culled in the kernel)
            s_start = slot_of_sorted[jnp.clip(p_start, 0, capacity - 1)]
            s_end = slot_of_sorted[jnp.clip(p_end - 1, 0, capacity - 1)] + 1
            ln = jnp.where(has, s_end - s_start, 0)
            tile = jnp.clip(s_start // TS, 0, S_pack // TS - P)
            slack = jnp.where(has, s_start - tile * TS, 0)
            max_run = jnp.maximum(max_run, jnp.max(slack + ln))
            tiles.append(jnp.where(has, tile, 0))
            slacks.append(slack)
            lens.append(ln)

    # --- dense per-chunk metadata (win_idx, lo, hi, id_base) ----------------
    # the kernel's compute loop reads 4 scalars per chunk instead of doing a
    # 9-way run lookup; chunks are densely packed so the loop trip count is
    # the block's actual chunk total
    P_t, T_MAX, TW = d["P"], d["T_MAX"], d["TW"]
    nch = [(slacks[r] + lens[r] + (TS - 1)) // TS for r in range(9)]
    cum = []
    acc_c = jnp.zeros((n_blocks,), jnp.int32)
    for r in range(9):
        cum.append(acc_c)
        acc_c = acc_c + nch[r]
    T_tot = acc_c

    # dense select (scatter-free: TPU scatters are slow): for each packed
    # chunk position t, its run r is the last with cum_r <= t, its tile
    # index is t - cum_r
    tgrid = jnp.arange(T_MAX, dtype=jnp.int32)[None, :]  # [1, T_MAX]
    cum_s = jnp.stack(cum, -1)  # [n_blocks, 9]
    r_of_t = jnp.sum(
        (tgrid[:, :, None] >= cum_s[:, None, :]).astype(jnp.int32), axis=2
    ) - 1  # [n_blocks, T_MAX]
    r_of_t = jnp.clip(r_of_t, 0, 8)

    def sel9(vals):  # [n_blocks] x9 -> [n_blocks, T_MAX] by r_of_t
        v = jnp.broadcast_to(vals[0][:, None], r_of_t.shape)
        for r in range(1, 9):
            v = jnp.where(r_of_t == r, vals[r][:, None], v)
        return v

    i_of_t = tgrid - sel9(cum)
    sl = sel9(slacks)
    lnn = sel9(lens)
    lo = jnp.clip(sl - i_of_t * TS, 0, TS)
    hi = jnp.clip(sl + lnn - i_of_t * TS, 0, TS)
    # source tile in ptab per packed chunk t: the kernel DMAs exactly the
    # block's T_tot needed tiles (one descriptor per real tile) into densely
    # packed window slots — dead sites (t >= T_tot, reached by the unrolled
    # T_CAP loop) have empty hi==lo masks and are routed to tile 0 so they
    # never read or copy out of bounds
    src_tile = jnp.where(
        tgrid < T_tot[:, None],
        jnp.clip(sel9(tiles) + i_of_t, 0, S_pack // TS - 1),
        0,
    )
    meta = jnp.stack([src_tile, lo, hi], -1)  # [n_blocks, T_MAX, 3]

    table = jnp.zeros((n_blocks, TW), jnp.int32)
    table = table.at[:, 28].set(count)
    table = table.at[:, 29].set(T_tot)
    table = table.at[:, 32:32 + 3 * T_MAX].set(
        meta.reshape(n_blocks, 3 * T_MAX)
    )
    table = table.reshape(d["n_programs"], BPP, TW)
    tnext = jnp.concatenate(
        [table[1:, 0:1], jnp.zeros((1, 1, TW), jnp.int32)], axis=0
    )
    return BlockPlan(
        table=table,
        tnext=tnext,
        gather_idx=gather_idx,
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
    for i in range(NCOLS):
        if cols[i] is None:
            cols[i] = jnp.zeros(N, jnp.float32)
    return cols


def _pack_table(fw: SimFramework, state: ParticleState, gather_idx, effvisc=None):
    """Slot-ordered dense field table [S/128, 16, 128] (tile = 16 fields x
    128 slots; matches the (8,128) TPU tiling with zero layout padding).

    The sentinel row (index N) carries PAD_POS coordinates and rho=1 so pad
    slots are geometry-culled and never divide by zero."""
    cols = _pack_cols(fw, state, effvisc)
    pad = [0.0] * NCOLS
    pad[C_POSX] = pad[C_POSY] = pad[C_POSZ] = PAD_POS
    pad[C_RHO] = 1.0
    P = jnp.stack(
        [jnp.concatenate([c, jnp.full((1,), pv, jnp.float32)])
         for c, pv in zip(cols, pad)],
        axis=1,
    )  # [N+1, 16]
    Ptab = P[gather_idx]  # [S, 16] (row gather)
    S = Ptab.shape[0]
    return Ptab.reshape(S // TS, TS, NCOLS).transpose(0, 2, 1)


def _forces_block_body(fw: SimFramework, grid: CellGrid, P: int, t_cap: int,
                       tb, win, cenT, bB, out_ref):
    """Pair physics for one block: centrals cenT [B,16] (sublanes),
    candidates streamed from the chunked window win [9*P,16,128] one
    [16,128] tile at a time.  ``tb(k)`` reads the block's table scalar k.
    Writes out_ref[0,0] = [B, NOUT] sums (slot-major rows)."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    f32 = jnp.float32
    # optional reduced-precision coefficient chain: geometry (rel, r2, masks)
    # stays f32; the per-pair force factors run in bf16 (SimParams.pairs_bf16)
    cd = jnp.bfloat16 if sp.pairs_bf16 else jnp.float32
    co = lambda v: jnp.asarray(v, cd)  # noqa: E731
    rad2 = f32(sp.influenceradius * sp.influenceradius)

    T = tb(29)  # block's chunk count (precomputed in the plan)

    # central columns [B, 1]
    def ccolf(c):
        return cenT[:, c].reshape(B, 1)

    def ccol(c):
        return ccolf(c).astype(cd)

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

    # loop-invariant central composites (hoisted out of the chunk loop)
    if dyn:
        c_any = c_fluid + c_bound - c_fluid * c_bound

    liota = jax.lax.broadcasted_iota(jnp.int32, (1, TS), 1)

    def chunk_body(t, acc):
        # per-chunk metadata precomputed by build_block_plan; window slots
        # are densely packed (chunk t was DMA'd into win[t])
        lo = tb(32 + 3 * t + 1)
        hi = tb(32 + 3 * t + 2)
        w = win[t]

        def wrowf(c):
            return w[c, :].reshape(1, TS)

        def wrow(c):
            return wrowf(c).astype(cd)

        valid = (liota >= lo) & (liota < hi)

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
        # an f32 position in a valid state (replaces the id compare)
        mask = valid & (r2f < rad2) & (r2f > 0.0)
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

        a_DrDt, a_x, a_y, a_z, a_xs_x, a_xs_y, a_xs_z, a_e = acc
        a_DrDt = a_DrDt + jnp.sum(DrDt, axis=1, keepdims=True, dtype=f32)
        a_x = a_x + jnp.sum(DvDt_x, axis=1, keepdims=True, dtype=f32)
        a_y = a_y + jnp.sum(DvDt_y, axis=1, keepdims=True, dtype=f32)
        a_z = a_z + jnp.sum(DvDt_z, axis=1, keepdims=True, dtype=f32)
        if fw.has_xsph:
            # XSPH mean velocity, reference factor 2 (forces_kernel.def:3368)
            from .kernels import W as kernW

            wK = kernW(fw.kerneltype, r, h)
            xw = ff * (-2.0 * m_n) * wK / (rho_c + rho_n)
            a_xs_x = a_xs_x + jnp.sum(xw * relvx, axis=1, keepdims=True, dtype=f32)
            a_xs_y = a_xs_y + jnp.sum(xw * relvy, axis=1, keepdims=True, dtype=f32)
            a_xs_z = a_xs_z + jnp.sum(xw * relvz, axis=1, keepdims=True, dtype=f32)
        if has_energy:
            # dU/dt -= (a_pair . v_ij)/2 (forces_kernel.def:3306-3316)
            dedt = s * vdp
            if sv is not None:
                dedt = dedt + sv * (relvx * relvx + relvy * relvy + relvz * relvz)
            a_e = a_e + jnp.sum(-0.5 * dedt, axis=1, keepdims=True, dtype=f32)
        return (a_DrDt, a_x, a_y, a_z, a_xs_x, a_xs_y, a_xs_z, a_e)

    z = jnp.zeros((B, 1), jnp.float32)
    acc = (z, z, z, z, z, z, z, z)
    # unrolled static sites: a fori_loop trip costs ~350ns of loop machinery
    # on v5e (~2.5x the [64,128] pair math, scripts/exp_iter3.py), so the
    # first t_cap tiles are fully unrolled; sites past the block's T_tot
    # read an in-range window but their hi==lo==0 metadata masks every pair
    for t in range(t_cap):
        acc = chunk_body(t, acc)
    # dynamic tail for the rare blocks with more tiles than T_CAP
    acc = jax.lax.fori_loop(t_cap, jnp.maximum(T, t_cap), chunk_body, acc)
    # [B, NOUT] -> [NOUT, B]: keeps the out array lane-efficient (B lanes)
    out_ref[0, 0] = jnp.concatenate(acc, axis=1).T


def _forces_kernel(fw, grid, P, BPP, n_programs, n_blocks, t_cap,
                   table_ref, tnext_ref, ptab,
                   out_ref, win2, cen2, sems):
    """One program = BPP blocks; window + central DMAs double-buffered
    across consecutive blocks (scratch and semaphores persist across the
    sequential grid)."""
    p = pl.program_id(0)
    j = pl.program_id(1)
    gidx = p * BPP + j
    slot = jax.lax.rem(gidx, 2)
    nslot = jax.lax.rem(gidx + 1, 2)

    def tb_cur(k):
        return table_ref[0, j, k]

    jn = jnp.minimum(j + 1, BPP - 1)

    def tb_next(k):
        return jnp.where(j + 1 < BPP, table_ref[0, jn, k], tnext_ref[0, 0, k])

    def dmas(tb, blk, sl, action):
        # packed-chunk DMAs: exactly the block's T_tot needed tiles move,
        # one descriptor per tile, landing densely in window slots 0..T-1
        # (the 9-run x P gated-descriptor scheme issued up to 9P+1 guarded
        # sites per block; the scalar core's guard/issue rate, not HBM
        # bytes, was the bottleneck — ~1.8us vs 0.67us floor per block)
        T = tb(29)
        for t in range(t_cap):
            copy = pltpu.make_async_copy(
                ptab.at[tb(32 + 3 * t)],
                win2.at[sl, t],
                sems.at[sl, t],
            )
            if t == 0:
                action(copy)  # nonempty blocks always have >= 1 chunk
            else:
                @pl.when(T > t)
                def _(copy=copy):
                    action(copy)

        def tail(t, carry):
            action(pltpu.make_async_copy(
                ptab.at[tb(32 + 3 * t)],
                win2.at[sl, t],
                sems.at[sl, t],
            ))
            return carry

        jax.lax.fori_loop(t_cap, jnp.maximum(T, t_cap), tail, 0)
        # central tile (the block's own 128-slot tile; B=64 half selected
        # after the in-kernel transpose)
        action(
            pltpu.make_async_copy(
                ptab.at[(blk * B) // TS], cen2.at[sl], sems.at[sl, 9 * P]
            )
        )

    count = tb_cur(28)

    # first program: fill the window scratch with a safe finite pattern so
    # dead compute sites (t >= T, never DMA'd) read initialized memory —
    # their masks are all-zero but NaN/Inf x 0 would still poison the sums
    @pl.when(gidx == 0)
    def _():
        win2[...] = jnp.ones(win2.shape, jnp.float32)

    # prologue: the very first block starts its own copies
    @pl.when((gidx == 0) & (count > 0))
    def _():
        dmas(tb_cur, gidx, slot, lambda c: c.start())

    # prefetch the next block's copies (overlap this block's compute)
    @pl.when((gidx + 1 < n_blocks) & (tb_next(28) > 0))
    def _():
        dmas(tb_next, gidx + 1, nslot, lambda c: c.start())

    @pl.when(count > 0)
    def _():
        dmas(tb_cur, gidx, slot, lambda c: c.wait())
        cenT = cen2[slot].T  # [TS, 16]
        # the block is one B-sized slice of its TS-slot tile
        q = jax.lax.rem(gidx, TS // B)
        sel = cenT[0:B, :]
        for k in range(1, TS // B):
            sel = jnp.where(q == k, cenT[k * B:(k + 1) * B, :], sel)
        _forces_block_body(
            fw, grid, P, t_cap, tb_cur, win2.at[slot], sel, gidx * B, out_ref,
        )

    @pl.when(count == 0)
    def _():
        out_ref[0, 0] = jnp.zeros((NOUT, B), jnp.float32)


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
    d = plan_dims(fw, grid, N)
    P, BPP, TW = d["P"], d["BPP"], d["TW"]
    n_programs, n_blocks = d["n_programs"], d["n_blocks"]

    if table is None:
        table = build_block_plan(fw, grid, aux, N)
    plan = table
    ptab = _pack_table(fw, state, plan.gather_idx, effvisc=effvisc)

    # interpreter mode on CPU lets the unit tests validate the kernel logic
    interpret = jax.default_backend() == "cpu"
    # full unrolling (T_CAP sites) only pays on hardware; in interpret mode
    # it just multiplies trace/compile time, so keep the dynamic loop there
    t_cap = 0 if interpret else min(T_CAP, 9 * P)
    kernel = functools.partial(
        _forces_kernel, fw, grid, P, BPP, n_programs, n_blocks, t_cap
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_programs, BPP),
        in_specs=[
            pl.BlockSpec((1, BPP, TW), lambda p, j: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TW), lambda p, j: (p, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, NOUT, B), lambda p, j: (p * BPP + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 1, NOUT, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 9 * P, NCOLS, TS), jnp.float32),
            pltpu.VMEM((2, NCOLS, TS), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 9 * P + 1)),
        ],
        interpret=interpret,
    )(plan.table, plan.tnext, ptab)

    # un-bin: per-particle gather from the [n_blocks*B, NOUT] slot layout
    out_rows = out.reshape(n_blocks, NOUT, B).transpose(0, 2, 1).reshape(-1, NOUT)
    from ..state import is_active

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
