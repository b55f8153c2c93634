"""Pallas TPU forces kernel: the speed-of-light path for the SPH RHS.

This replaces the XLA cell-block pair pass (`ops/pair.py` + `ops/forces.py`)
for the common model configurations.  Motivation: XLA materializes every
[C,K,NB] broadcast of the pair computation in HBM (measured ~70 GB/s
effective), while the physics only needs one streaming pass.  This kernel
stages everything explicitly:

* After the cell sort, the 27 neighbor cells of cell c are 9 *contiguous*
  runs of the sorted particle arrays (3 cells along the fastest
  linearization axis x 9 rows in the two slow axes) — the same observation
  the reference exploits for its cell-burst halos (`src/GPUWorker.cc:477`).
* One program per cell: DMA the cell's central rows and the 9 candidate runs
  from the row-packed [Npad,128] HBM array into VMEM (run starts are rounded
  down to the 8-row tile so Mosaic can prove DMA alignment; the slack is
  folded into the validity masks), transpose the 16 used columns once, then
  evaluate all pairwise physics as dense [K8, W] vector ops (lane-major over
  candidates) with masks for occupancy / cutoff / self / particle-type
  gating, reduce over W, and write per-central sums to a [n_cells, K8, 8]
  output that the caller scatters back to particle order.

Physics parity with `compute_forces` (the XLA path remains the fallback for
unsupported configurations and is the correctness oracle in tests):
continuity (F1/F2), pressure gradient, artificial viscosity, Morris/Monaghan
laminar viscosity, LJ/MK boundary repulsion, Colagrossi/Ferrari density
diffusion, DYN-boundary gating.  Reference formulas:
`src/cuda/forces_kernel.def` (see ops/forces.py for the line anchors).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
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
from .neighbors import CellAux, CellGrid, delinearize, linearize

# packed-column layout (columns of the [Npad, 128] row-packed array)
C_POSX, C_POSY, C_POSZ = 0, 1, 2
C_VELX, C_VELY, C_VELZ = 3, 4, 5
C_MASS, C_RHO, C_PPRE, C_SSPEED = 6, 7, 8, 9
C_PRESS, C_FLUID, C_BOUND, C_DVISC = 10, 11, 12, 13
NCOLS = 16  # used columns
NCOLS_PAD = 128  # padded to a full lane tile

NOUT = 8  # DrDt, DvDt xyz, spare


def _run_slots(fw) -> int:
    """Row slots per 3-cell candidate run: the configured (or worst-case)
    extent + 8 alignment slack, rounded to the 8-row DMA tile."""
    sp = fw.sp
    extent = sp.max_run_extent or 3 * sp.max_parts_per_cell
    return -(-(extent + 8) // 8) * 8


def _k8(K: int) -> int:
    """Central slots: K + 8 alignment slack."""
    return K + 8


def pallas_supported(fw: SimFramework, grid: CellGrid) -> bool:
    """Configurations covered by the Pallas kernel."""
    if grid.fast_axis_periodic:
        return False  # runs would wrap; XLA path handles it
    if fw.sph_formulation not in (SPHFormulation.SPH_F1, SPHFormulation.SPH_F2):
        return False
    if fw.visc.turbmodel not in (
        TurbulenceModel.ARTIFICIAL,
        TurbulenceModel.LAMINAR_FLOW,
    ):
        return False
    if fw.densitydiffusiontype == DensityDiffusionType.BREZZI:
        return False  # needs the dt scalar; XLA path handles it
    if not fw.is_inviscid and fw.visc.viscmodel == ViscousModel.ESPANOL_REVENGA:
        return False  # XLA path only for now
    if fw.gcallback is not None:
        return False  # gravity is baked as a kernel constant; XLA path
    return True


def build_run_table(fw: SimFramework, grid: CellGrid, aux: CellAux, K: int):
    """Per-cell DMA plan: 9 contiguous candidate runs + own slice, all starts
    rounded down to the 8-row DMA tile.

    Returns (table, max_extent): i32 [n_cells, 32] plus the maximum raw run
    extent (for the runtime capacity check against sp.max_run_extent):
      0-8   aligned run starts
      9-17  run end offsets relative to the aligned start (= slack + length,
            clamped to the run capacity)
      18    aligned cell start
      19    cell slack (cell_start - aligned)
      20    cell count
      21-29 run slacks
    """
    n_cells = grid.n_cells
    cells = jnp.arange(n_cells, dtype=jnp.int32)
    coords = delinearize(grid, cells)
    a0, a1, a2 = grid.order
    n0 = grid.ncells[a0]

    starts, ends, slacks = [], [], []
    RUN = _run_slots(fw)
    max_extent = jnp.zeros((), jnp.int32)
    for d2 in (-1, 0, 1):
        for d1 in (-1, 0, 1):
            c1 = coords[a1] + d1
            c2 = coords[a2] + d2
            valid = jnp.ones_like(cells, dtype=bool)
            n1 = grid.ncells[a1]
            n2 = grid.ncells[a2]
            if fw.periodicbound & (1 << a1):
                c1 = c1 % n1
            else:
                valid &= (c1 >= 0) & (c1 < n1)
                c1 = jnp.clip(c1, 0, n1 - 1)
            if fw.periodicbound & (1 << a2):
                c2 = c2 % n2
            else:
                valid &= (c2 >= 0) & (c2 < n2)
                c2 = jnp.clip(c2, 0, n2 - 1)
            i_lo = jnp.maximum(coords[a0] - 1, 0)
            i_hi = jnp.minimum(coords[a0] + 1, n0 - 1)
            ijk_lo = [None, None, None]
            ijk_lo[a0], ijk_lo[a1], ijk_lo[a2] = i_lo, c1, c2
            ijk_hi = [None, None, None]
            ijk_hi[a0], ijk_hi[a1], ijk_hi[a2] = i_hi, c1, c2
            s = aux.cell_start[linearize(grid, jnp.stack(ijk_lo, -1))]
            e = aux.cell_start[linearize(grid, jnp.stack(ijk_hi, -1)) + 1]
            raw = jnp.where(valid, e - s, 0)
            max_extent = jnp.maximum(max_extent, jnp.max(raw))
            s8 = (s // 8) * 8
            slack = s - s8
            L = jnp.minimum(raw, RUN - slack)
            starts.append(s8)
            ends.append(slack + L)
            slacks.append(slack)

    cs = aux.cell_start[:n_cells]
    cs8 = (cs // 8) * 8

    table = jnp.zeros((n_cells, 32), jnp.int32)
    table = table.at[:, 0:9].set(jnp.stack(starts, -1))
    table = table.at[:, 9:18].set(jnp.stack(ends, -1))
    table = table.at[:, 18].set(cs8)
    table = table.at[:, 19].set(cs - cs8)
    table = table.at[:, 20].set(aux.cell_count[:n_cells])
    table = table.at[:, 21:30].set(jnp.stack(slacks, -1))
    return table, max_extent


def _pack(fw: SimFramework, state: ParticleState, pad_rows: int,
          effvisc=None):
    """Pack per-particle data into the [Npad, 128] row-major array."""
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

    P = jnp.stack(cols, axis=1)  # [N,16]
    P = jnp.pad(P, ((0, pad_rows), (0, NCOLS_PAD - NCOLS)))
    # pad rows are masked out of every pair, but give them a non-zero density
    # so no masked lane ever divides by zero (0*inf = NaN)
    P = P.at[N:, C_RHO].set(1.0)
    return P


def _run_pieces(RUN):
    """Split a run copy into 128-row pieces; pieces beyond the first only
    transfer when the run actually extends that far (most runs are much
    shorter than the worst-case capacity, so the gated pieces save the
    padded HBM traffic)."""
    return [(off, min(128, RUN - off)) for off in range(0, RUN, 128)]


def _for_each_run_dma(fw, K, row_ref, prow_hbm, cen2, win2, sems, slot, action):
    """Apply ``action(copy)`` to the central-block and run-piece copies whose
    transfer is needed for this cell (identical control flow for start/wait
    keeps the semaphore bookkeeping matched)."""
    RUN = _run_slots(fw)
    K8 = _k8(K)
    cs8 = pl.multiple_of(row_ref[0, 0, 18], 8)
    action(
        pltpu.make_async_copy(
            prow_hbm.at[pl.ds(cs8, K8), :], cen2.at[slot], sems.at[slot, 9, 0]
        )
    )
    pieces = _run_pieces(RUN)
    for r in range(9):
        start = pl.multiple_of(row_ref[0, 0, r], 8)
        run_end = row_ref[0, 0, 9 + r]
        for pi, (off, rows) in enumerate(pieces):
            copy = pltpu.make_async_copy(
                prow_hbm.at[pl.ds(start + off, rows), :],
                win2.at[slot, pl.ds(r * RUN + off, rows), :],
                sems.at[slot, r, pi],
            )
            if pi == 0:
                action(copy)
            else:
                # piece only needed when the run extends into it
                @pl.when(run_end > off)
                def _(copy=copy):
                    action(copy)


def _start_cell_dmas(fw, K, row_ref, prow_hbm, cen2, win2, sems, slot):
    _for_each_run_dma(
        fw, K, row_ref, prow_hbm, cen2, win2, sems, slot, lambda c: c.start()
    )


def _wait_cell_dmas(fw, K, row_ref, prow_hbm, cen2, win2, sems, slot):
    _for_each_run_dma(
        fw, K, row_ref, prow_hbm, cen2, win2, sems, slot, lambda c: c.wait()
    )


def _forces_kernel(fw: SimFramework, grid: CellGrid, K: int, n_programs: int,
                   idx_ref, idx_next_ref, prow_hbm, out_ref, cen2,
                   win2, sems):
    """One program = one cell, with the next cell's copies prefetched during
    this cell's compute (manual cross-program double buffering; scratch and
    semaphores persist across the sequential grid)."""
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    nslot = jax.lax.rem(i + 1, 2)

    cell_count = idx_ref[0, 0, 20]

    # prologue: the first program starts its own copies
    @pl.when((i == 0) & (cell_count > 0))
    def _():
        _start_cell_dmas(fw, K, idx_ref, prow_hbm, cen2, win2, sems, slot)

    # prefetch the next cell's copies (they overlap this cell's compute)
    @pl.when((i + 1 < n_programs) & (idx_next_ref[0, 0, 20] > 0))
    def _():
        _start_cell_dmas(fw, K, idx_next_ref, prow_hbm, cen2, win2, sems, nslot)

    # empty cells (most of the air region in free-surface problems) skip all
    # work; their garbage output rows are dropped by the caller's gather mask
    @pl.when(cell_count > 0)
    def _body():
        _wait_cell_dmas(fw, K, idx_ref, prow_hbm, cen2, win2, sems, slot)
        _forces_cell_body(fw, grid, K, idx_ref, out_ref,
                          cen2.at[slot], win2.at[slot],
                          idx_ref[0, 0, 19], cell_count)


def _forces_cell_body(fw, grid, K, idx_ref, out_ref, cen_scratch,
                      win_scratch, cell_slack, cell_count):
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    RUN = _run_slots(fw)
    K8 = _k8(K)
    W = 9 * RUN
    f32 = jnp.float32
    cs8 = pl.multiple_of(idx_ref[0, 0, 18], 8)

    # one transpose of the used columns: [W,16] -> [16,W]
    winT = win_scratch[:, 0:NCOLS].T

    # --- masks and global indices ------------------------------------------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    seg = lane // RUN
    off_in_run = lane - seg * RUN
    run_end = jnp.zeros((1, W), jnp.int32)
    run_start = jnp.zeros((1, W), jnp.int32)
    run_slack = jnp.zeros((1, W), jnp.int32)
    for r in range(9):
        sel = seg == r
        run_end = jnp.where(sel, idx_ref[0, 0, 9 + r], run_end)
        run_start = jnp.where(sel, idx_ref[0, 0, r], run_start)
        run_slack = jnp.where(sel, idx_ref[0, 0, 21 + r], run_slack)
    wvalid = (off_in_run >= run_slack) & (off_in_run < run_end)  # [1,W]
    widx = run_start + off_in_run  # global sorted index of candidates

    krow = jax.lax.broadcasted_iota(jnp.int32, (K8, 1), 0)
    cvalid = (krow >= cell_slack) & (krow < cell_slack + cell_count)
    cidx_g = cs8 + krow  # [K8,1]

    def wrow(c):
        return winT[c, :].reshape(1, W)

    def ccol(c):
        return cen_scratch[:, c].reshape(K8, 1)

    # --- geometry -----------------------------------------------------------
    Lx, Ly, Lz = grid.world_size
    per = int(fw.periodicbound)

    def rel(axis_col, L, bit):
        r = ccol(axis_col) - wrow(axis_col)
        if per & bit:
            r = r - f32(L) * jnp.round(r * f32(1.0 / L))
        return r

    relx = rel(C_POSX, Lx, 1)
    rely = rel(C_POSY, Ly, 2)
    relz = rel(C_POSZ, Lz, 4)
    r2 = relx * relx + rely * rely + relz * relz
    rad2 = f32(sp.influenceradius * sp.influenceradius)
    mask = cvalid & wvalid & (r2 < rad2) & (cidx_g != widx)
    fmask = mask.astype(f32)
    r = jnp.sqrt(r2)

    # --- per-pair physics (see ops/forces.py for reference anchors) --------
    fK = kernF(fw.kerneltype, r, h)

    relvx = ccol(C_VELX) - wrow(C_VELX)
    relvy = ccol(C_VELY) - wrow(C_VELY)
    relvz = ccol(C_VELZ) - wrow(C_VELZ)
    vdp = relvx * relx + relvy * rely + relvz * relz

    c_fluid = ccol(C_FLUID)
    n_fluid = wrow(C_FLUID)
    c_bound = ccol(C_BOUND)
    n_bound = wrow(C_BOUND)
    m_n = wrow(C_MASS)
    rho_c = ccol(C_RHO)
    rho_n = wrow(C_RHO)

    dyn = fw.boundarytype == BoundaryType.DYN_BOUNDARY

    # continuity (forces_kernel.def:2139-2155)
    if dyn:
        cont = fmask * (c_fluid + c_bound - c_fluid * c_bound) * (
            n_fluid + n_bound - n_fluid * n_bound
        )
    else:
        cont = fmask * c_fluid * n_fluid
    DrDt_term = m_n * vdp * fK
    if fw.sph_formulation == SPHFormulation.SPH_F2:
        DrDt_term = DrDt_term * rho_c / rho_n
    DrDt = cont * DrDt_term

    ff = fmask * c_fluid * n_fluid

    # density diffusion
    ddt = fw.densitydiffusiontype
    if ddt != DensityDiffusionType.NONE:
        gxyz = pp.gravity
        g_dot_rel = f32(gxyz[0]) * relx + f32(gxyz[1]) * rely + f32(gxyz[2]) * relz
    if ddt == DensityDiffusionType.COLAGROSSI:
        press_c = ccol(C_PRESS)
        press_n = wrow(C_PRESS)
        gate = (jnp.abs(press_c - press_n) >= jnp.abs(g_dot_rel * rho_c)).astype(f32)
        c0 = f32(pp.fluids[0].c0)
        coeff = f32(sp.densityDiffCoeff * 2.0 * sp.slength)
        DrDt = DrDt - ff * gate * coeff * c0 * (rho_n / rho_c - 1.0) * fK * m_n
    elif ddt == DensityDiffusionType.FERRARI:
        sq_c0 = f32(pp.fluids[0].c0 ** 2)
        rho0_c = f32(pp.fluids[0].rho0)
        grav_corr = -g_dot_rel * rho0_c / sq_c0
        max_ss = jnp.maximum(ccol(C_SSPEED), wrow(C_SSPEED))
        safe = (r > 1e-4 * h).astype(f32)
        DrDt = DrDt + ff * safe * f32(sp.densityDiffCoeff) * m_n * max_ss * (
            rho_c - rho_n + grav_corr
        ) / rho_c * r * fK

    # momentum (pressure gradient)
    if dyn:
        mom = fmask * c_fluid * (n_fluid + n_bound - n_fluid * n_bound)
    else:
        mom = fmask * c_fluid * n_fluid
    if fw.has_moving_bodies:
        # body force feedback: boundary centrals vs fluid neighbors
        mom = mom + fmask * c_bound * n_fluid
    if fw.sph_formulation == SPHFormulation.SPH_F2:
        pgrad = (ccol(C_PRESS) + wrow(C_PRESS)) / (rho_c * rho_n)
    else:
        pgrad = ccol(C_PPRE) + wrow(C_PPRE)
    s = -mom * pgrad * m_n * fK

    if fw.visc.turbmodel == TurbulenceModel.ARTIFICIAL:
        eps = f32(pp.epsartvisc)
        art = (
            vdp
            * f32(h * pp.artvisccoeff)
            * (ccol(C_SSPEED) + wrow(C_SSPEED))
            / ((r2 + eps) * (rho_c + rho_n))
        )
        s = s + mom * (vdp < 0.0).astype(f32) * art * m_n * fK

    sv = None
    if not fw.is_inviscid:
        mu_avg = _avg(fw.visc.avgop, ccol(C_DVISC), wrow(C_DVISC))
        visc_coeff = 2.0 * mu_avg * m_n / (rho_c * rho_n)
        if fw.visc.viscmodel == ViscousModel.MONAGHAN:
            eps = f32(pp.epsartvisc)
            mon = (vdp < 0).astype(f32) * vdp / (r2 + eps)
            coeff = pp.monaghan_visc_coeff
            if coeff != coeff:
                coeff = 1.0
            s = s + mom * f32(coeff) * visc_coeff * fK * mon
        else:
            sv = mom * visc_coeff * fK

    if fw.repulsive_boundary:
        rep_mask = fmask * c_fluid * n_bound
        if fw.boundarytype == BoundaryType.LJ_BOUNDARY:
            # clamp so masked garbage lanes can't overflow to inf (0*inf=NaN)
            safe_r = jnp.maximum(r, f32(1e-3 * pp.r0))
            ratio = f32(pp.r0) / safe_r
            lj = (
                f32(pp.dcoeff)
                * (_powf(ratio, pp.p1coeff) - _powf(ratio, pp.p2coeff))
                / (safe_r * safe_r)
            )
            # finite clamp so 0-masked lanes never produce 0*inf = NaN
            lj = jnp.minimum(lj, f32(1e30))
            rep = jnp.where(r < f32(pp.r0), lj, 0.0)
        else:
            q = r / f32(h)
            wmk = 1.8 * (1.0 - 0.5 * q) ** 4 * (2.0 * q + 1.0)
            dist = jnp.maximum(f32(pp.epsartvisc), r - f32(pp.mk_d))
            m_c = ccol(C_MASS)
            safe_r = jnp.maximum(r, 1e-12)
            rep = (
                f32(pp.mk_k) * wmk * 2.0 * m_n
                / (f32(pp.mk_beta) * dist * safe_r * (m_c + m_n))
            )
        s = s + rep_mask * rep

    DvDt_x = s * relx
    DvDt_y = s * rely
    DvDt_z = s * relz
    if sv is not None:
        DvDt_x = DvDt_x + sv * relvx
        DvDt_y = DvDt_y + sv * relvy
        DvDt_z = DvDt_z + sv * relvz

    # --- reduce over candidates and write ----------------------------------
    out_ref[0, :, 0] = jnp.sum(DrDt, axis=1)
    out_ref[0, :, 1] = jnp.sum(DvDt_x, axis=1)
    out_ref[0, :, 2] = jnp.sum(DvDt_y, axis=1)
    out_ref[0, :, 3] = jnp.sum(DvDt_z, axis=1)
    if fw.has_xsph:
        # XSPH mean velocity (forces_kernel.def:2986-2994)
        from .kernels import W as kernW

        wK = kernW(fw.kerneltype, r, h)
        xw = ff * (-m_n) * wK / (rho_c + rho_n)
        out_ref[0, :, 4] = jnp.sum(xw * relvx, axis=1)
        out_ref[0, :, 5] = jnp.sum(xw * relvy, axis=1)
        out_ref[0, :, 6] = jnp.sum(xw * relvz, axis=1)
    else:
        out_ref[0, :, 4:7] = jnp.zeros((K8, 3), f32)
    if fw.flags & SimFlags.ENABLE_INTERNAL_ENERGY:
        # dU/dt -= (a_pair . v_ij)/2 (forces_kernel.def:3306-3316)
        dedt = s * vdp
        if sv is not None:
            dedt = dedt + sv * (relvx * relvx + relvy * relvy + relvz * relvz)
        out_ref[0, :, 7] = jnp.sum(-0.5 * dedt, axis=1)
    else:
        out_ref[0, :, 7] = jnp.zeros((K8,), f32)


def compute_forces_pallas(
    fw: SimFramework,
    grid: CellGrid,
    state: ParticleState,
    aux: CellAux,
    *,
    dt: Optional[jax.Array] = None,
    sps_tau=None,
    effvisc=None,
    table=None,
) -> ForcesOut:
    """Pallas-accelerated forces pass (same contract as compute_forces).

    ``table`` is the per-rebuild DMA plan from :func:`build_run_table`; pass
    it in when calling repeatedly between rebuilds to avoid recomputing it.
    """
    sp, pp = fw.sp, fw.pp
    K = sp.max_parts_per_cell
    RUN = _run_slots(fw)
    K8 = _k8(K)
    n_cells = grid.n_cells
    N = state.capacity

    if table is None:
        table, _ = build_run_table(fw, grid, aux, K)
    prow = _pack(fw, state, pad_rows=RUN, effvisc=effvisc)

    kernel = functools.partial(_forces_kernel, fw, grid, K, n_cells)
    # interpreter mode on CPU lets the unit tests validate the kernel logic
    interpret = jax.default_backend() == "cpu"
    table3 = table[:, None, :]
    # shifted view delivering row i+1 to program i (prefetch plan)
    table_next = jnp.concatenate([table3[1:], jnp.zeros_like(table3[:1])], 0)
    out = pl.pallas_call(
        kernel,
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((1, 1, 32), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 32), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, K8, NOUT), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_cells, K8, NOUT), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, K8, NCOLS_PAD), jnp.float32),
            pltpu.VMEM((2, 9 * RUN, NCOLS_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 10, len(_run_pieces(RUN)))),
        ],
        interpret=interpret,
    )(table3, table_next, prow)

    # un-bin: per-particle GATHER from the [n_cells, K8, NOUT] bin layout
    # (a row gather beats the equivalent 500k-row scatter by ~10x on TPU)
    h = aux.hash_sorted[:N]
    cell = jnp.minimum(h, n_cells - 1)
    cs = aux.cell_start[cell]
    rank = jnp.arange(N, dtype=jnp.int32) - cs
    k_idx = (cs - (cs // 8) * 8) + rank  # slack + in-cell rank
    valid = (h < n_cells) & (k_idx >= 0) & (k_idx < K8)
    rows = out.reshape(-1, NOUT)[
        jnp.where(valid, cell * K8 + jnp.minimum(k_idx, K8 - 1), 0)
    ]
    rows = jnp.where(valid[:, None], rows, 0.0)

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


__all__ = ["compute_forces_pallas", "pallas_supported", "build_run_table"]
