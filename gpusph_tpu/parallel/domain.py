"""Multi-chip domain decomposition: slab sharding + ICI halo exchange.

TPU-native replacement for the reference's entire multi-device machinery
(GPUWorker threads + cell bursts + MPI NetworkManager, SURVEY.md §2.4):

* device map → equal slabs of the cell grid along the *slowest*
  linearization axis (the reference's default longest-axis split,
  `ProblemCore::fillDeviceMapByAxis` `src/ProblemCore.cc:1046`), one slab
  per mesh device;
* particle migration + halo import → a single `ppermute` exchange of the
  two boundary *planes* per side after each local sort (the burst plan of
  `computeCellBursts` `src/GPUWorker.cc:477-708` collapses to "planes are
  contiguous slices of the sorted arrays");
* UPDATE_EXTERNAL per step → `ppermute` of the boundary-plane field values
  (ghost regions are verbatim receive buffers, so refresh is a plain
  overwrite — no index bookkeeping);
* dt min-reduction / counts / overflow flags over MPI → `jax.lax.pmin` /
  `psum` / `pmax` over the mesh axis.

Everything runs inside ONE `jax.shard_map`-ped chunk function: rebuild +
exchange + ``buildneibsfreq`` predictor/corrector steps, compiled once.
Ghost particles live in fixed per-side regions appended after the local
capacity block; cell tables are assembled per region (runs along the fast
axis never cross planes, so the Pallas kernel's contiguous-run invariant
holds across regions).

v1 restriction: the split axis must be non-periodic (the grid's slowest
linearization axis; `make_grid` already prefers non-periodic fast axes).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bodies import (BodiesState, apply_body_motion, reduce_body_forces,
                      step_bodies)
from ..defs import ParticleType, SimFlags, SPHFormulation, TurbulenceModel
from ..framework import SimFramework
from ..ops.filters import apply_filters
from ..ops.forces import compute_forces
from ..ops.forces_pallas import (build_block_plan, compute_forces_pallas,
                                 pallas_supported)
from ..ops.integrate import compute_dt, euler_step
from ..ops.neighbors import CellAux, CellGrid, cell_coords
from ..state import ParticleState, is_active


def balanced_slab_bounds(grid: CellGrid, state: ParticleState, ndev: int):
    """Particle-count-balanced slab boundaries along the split axis.

    The analogue of the reference's weighted device map
    (`fillDeviceMapByAxisBalanced`, `src/ProblemCore.cc:1080+`, fed by the
    per-slice counts of `GPUSPH::prepareProblem` `src/GPUSPH.cc:2177-2203`):
    choose slab boundaries so each device starts with ~equal particles.

    Returns plane index boundaries [ndev+1] (numpy; host-side, setup time).
    Note: the current Decomposition uses EQUAL slabs (static shapes must
    match across devices); these bounds are used to size capacity and to
    advise on grid orientation, with fully-uneven slabs planned.
    """
    sa = grid.order[2]
    n = grid.ncells[sa]
    pos = np.asarray(state.pos)
    act = np.asarray(state.active)
    k = np.clip(
        np.floor((pos[act, sa] - grid.origin[sa]) / grid.cell_size[sa]),
        0, n - 1,
    ).astype(np.int64)
    counts = np.bincount(k, minlength=n)
    csum = np.concatenate([[0], np.cumsum(counts)])
    total = csum[-1]
    bounds = [0]
    for d in range(1, ndev):
        target = total * d / ndev
        bounds.append(int(np.searchsorted(csum, target)))
    bounds.append(n)
    return np.asarray(bounds)


class ShardStats(struct.PyTreeNode):
    max_occupancy: jax.Array
    n_active: jax.Array  # global active count
    dt: jax.Array
    overflow: jax.Array  # 1 if any per-device capacity was exceeded


@dataclasses.dataclass(frozen=True)
class Decomposition:
    """Static slab decomposition of a global grid over ``ndev`` devices."""

    global_grid: CellGrid
    ndev: int
    cap_dev: int  # local particle slots per device
    halo_cap: int  # per-side exchange buffer rows (2 planes worth)

    @property
    def split_axis(self) -> int:
        return self.global_grid.order[2]

    @property
    def n_split(self) -> int:
        return self.global_grid.ncells[self.split_axis]

    @property
    def slab(self) -> int:
        return -(-self.n_split // self.ndev)

    @property
    def plane_cells(self) -> int:
        a0, a1 = self.global_grid.order[0], self.global_grid.order[1]
        return self.global_grid.ncells[a0] * self.global_grid.ncells[a1]

    @property
    def local_grid(self) -> CellGrid:
        """Per-device grid: my slab plus one ghost plane on each side."""
        g = self.global_grid
        nc = list(g.ncells)
        nc[self.split_axis] = self.slab + 2
        per = g.periodic & ~(1 << self.split_axis)
        return dataclasses.replace(
            g, ncells=tuple(nc), periodic=type(g.periodic)(per)
        )

    @property
    def n_local_cells(self) -> int:
        return self.local_grid.n_cells


def make_decomposition(
    grid: CellGrid,
    ndev: int,
    n_particles: int,
    *,
    state: Optional[ParticleState] = None,
    balance_margin: float = 2.0,
    halo_occupancy: Optional[int] = None,
) -> Decomposition:
    """When ``state`` is given, per-device capacity is sized from the actual
    initial slab occupancies (the reference sizes per-GPU allocations from
    the device map the same way, `computeAndSetAllocableParticles`
    `src/GPUWorker.cc:301`)."""
    if grid.periodic & (1 << grid.order[2]):
        raise NotImplementedError(
            "slab split along a periodic axis not supported yet"
        )
    cap = int(n_particles / ndev * balance_margin)
    if state is not None:
        sa = grid.order[2]
        slab = -(-grid.ncells[sa] // ndev)
        pos = np.asarray(state.pos)
        act = np.asarray(state.active)
        k = np.clip(
            np.floor((pos[act, sa] - grid.origin[sa]) / grid.cell_size[sa]),
            0, grid.ncells[sa] - 1,
        ).astype(np.int64)
        owner = np.minimum(k // slab, ndev - 1)
        worst = np.bincount(owner, minlength=ndev).max() if len(owner) else 0
        cap = max(cap, int(worst * 1.5))
    cap = max(256, -(-cap // 8) * 8)
    a0, a1 = grid.order[0], grid.order[1]
    plane_cells = grid.ncells[a0] * grid.ncells[a1]
    occ = halo_occupancy or 32
    halo_cap = -(-2 * plane_cells * occ // 8) * 8
    return Decomposition(grid, ndev, cap, halo_cap)


def _local_hash(dd: Decomposition, fw: SimFramework, pos, active, dev_idx):
    """Local cell id per particle, ghost planes included.

    Particles whose split coordinate falls in my lower/upper ghost plane are
    migrants to be exported; anything further out is clamped into the ghost
    plane (CFL guarantees <1 cell of travel per rebuild period — the same
    assumption as the reference's one-cell halos).
    """
    g = dd.global_grid
    lg = dd.local_grid
    coords = cell_coords(g, pos)  # global coords [N,3]
    sa = dd.split_axis
    local_split = coords[..., sa] - (dev_idx * dd.slab - 1)
    local_split = jnp.clip(local_split, 0, dd.slab + 1)
    ijk = coords.at[..., sa].set(local_split)
    a0, a1, a2 = lg.order
    n0, n1 = lg.ncells[a0], lg.ncells[a1]
    lin = (ijk[..., a2] * n1 + ijk[..., a1]) * n0 + ijk[..., a0]
    return jnp.where(active, lin, lg.n_cells).astype(jnp.int32)


def _sort_by(keys, state: ParticleState):
    order = jnp.argsort(keys, stable=True)
    return keys[order], jax.tree.map(lambda a: a[order], state)


def _window(arrs, start, size):
    """Gather a fixed-size row window at a dynamic start (clamped)."""
    idx = start + jnp.arange(size, dtype=jnp.int32)
    idx = jnp.minimum(idx, arrs[0].shape[0] - 1 if False else idx)  # noqa
    return idx


def _extract(state: ParticleState, idx, valid):
    """Extract rows ``idx`` of every field, masking invalid rows dead."""
    out = jax.tree.map(lambda a: a[idx], state)
    dead_info = jnp.uint32(int(ParticleType.NONE))
    return out.replace(info=jnp.where(valid, out.info, dead_info))


def _cell_tables(hash_sorted, n_cells, region_offset=0):
    cell_ids = jnp.arange(n_cells + 2, dtype=jnp.int32)
    cs = jnp.searchsorted(hash_sorted, cell_ids, side="left").astype(jnp.int32)
    return cs + region_offset


def make_sharded_chunk(
    fw: SimFramework,
    dd: Decomposition,
    mesh: Mesh,
    *,
    steps_per_chunk: Optional[int] = None,
    use_pallas: Optional[bool] = None,
    chunk_cells: int = 256,
    bodies_specs: tuple = (),
    extras_keys: tuple = (),
):
    """Build the jitted multi-device chunk function.

    Takes/returns globally-sharded state arrays of shape
    ``[ndev*cap_dev, ...]`` (sharded on the particle axis) plus a
    replicated :class:`BodiesState` when ``bodies_specs`` are given.
    ``extras_keys`` lists the state's extras entries (sharded like the
    other particle arrays and refreshed in the per-step halo exchange).
    """
    sp = fw.sp
    nsteps = steps_per_chunk or sp.buildneibsfreq
    adaptive = bool(fw.flags & SimFlags.ENABLE_DTADAPT)
    lg = dd.local_grid
    ndev = dd.ndev
    axis = "d"
    H = dd.halo_cap
    cap = dd.cap_dev
    capX = cap + 2 * H  # local + two ghost/receive regions
    n_cells = lg.n_cells
    plane = dd.plane_cells
    slab = dd.slab

    from ..defs import RheologyType as _Rheo

    grenier = fw.sph_formulation == SPHFormulation.SPH_GRENIER
    granular = fw.visc.rheologytype == _Rheo.GRANULAR
    needs_sps = fw.visc.turbmodel == TurbulenceModel.SPS
    needs_effvisc = fw.visc.needs_effective_visc
    # fail fast on a missing extras declaration (the chunk's in/out pytree
    # is fixed at build time; a state with undeclared extras fails later
    # with an opaque pytree mismatch)
    needed = set()
    if granular:
        needed.add("effpres")
    if fw.sa_boundary:
        needed.update(("belem", "vr0", "vr1", "vr2"))
    if fw.dynamic_gamma:
        needed.update(("gamma", "gradgamma"))
    from ..defs import TurbulenceModel as _TM
    if fw.visc.turbmodel == _TM.KEPSILON:
        needed.update(("tke", "eps", "turbvisc"))
    missing = needed - set(extras_keys)
    if missing:
        raise ValueError(
            f"make_sharded_chunk: extras_keys is missing {sorted(missing)} "
            f"required by this framework; pass extras_keys=tuple(state.extras)"
        )
    specs = tuple(bodies_specs)

    if use_pallas is None:
        use_pallas = (
            pallas_supported(fw, lg)
            and not grenier and not granular
            and jax.default_backend() != "cpu"
        )

    if use_pallas:
        def raw_forces(state, aux, dt, t, sigma=None, gamma=None,
                       sps_tau=None, effvisc=None, table=None):
            return compute_forces_pallas(fw, lg, state, aux, dt=dt,
                                         sps_tau=sps_tau, effvisc=effvisc,
                                         table=table)
    else:
        def raw_forces(state, aux, dt, t, sigma=None, gamma=None,
                       sps_tau=None, effvisc=None, table=None):
            return compute_forces(fw, lg, state, aux, dt=dt,
                                  chunk_cells=chunk_cells,
                                  sps_tau=sps_tau, effvisc=effvisc,
                                  sigma=sigma, t=t, gamma=gamma)

    up_perm = [(i, i + 1) for i in range(ndev - 1)]
    down_perm = [(i + 1, i) for i in range(ndev - 1)]

    def plane_range(p):
        """Local linear cell ids of split-plane p: [p*plane, (p+1)*plane)."""
        return p * plane, (p + 1) * plane

    def body(state: ParticleState, dt, t, iters, bodies):
        """Per-device chunk body (inside shard_map). state: [cap] rows."""
        dev = jax.lax.axis_index(axis)

        # ===== rebuild phase (NEIBS_LIST + halo plan) =======================
        active = is_active(state.info)
        h = _local_hash(dd, fw, state.pos, active, dev)
        h_sorted, st = _sort_by(h, state)

        # exchange buffers: my two lowest planes (ghost plane 0 = migrants,
        # plane 1 = halo) go down; my two highest (slab, slab+1) go up.
        lo_end = jnp.searchsorted(h_sorted, jnp.int32(2 * plane)).astype(jnp.int32)
        up_start = jnp.searchsorted(h_sorted, jnp.int32(slab * plane)).astype(jnp.int32)
        up_end = jnp.searchsorted(h_sorted, jnp.int32(n_cells)).astype(jnp.int32)

        idx_dn = jnp.arange(H, dtype=jnp.int32)
        dn_valid = idx_dn < lo_end
        send_dn = _extract(st, jnp.where(dn_valid, idx_dn, 0), dn_valid)

        idx_up = up_start + jnp.arange(H, dtype=jnp.int32)
        up_valid = idx_up < up_end
        send_up = _extract(st, jnp.where(up_valid, jnp.minimum(idx_up, cap - 1), 0), up_valid)

        # overflow if an exchange region exceeded its buffer
        ex_overflow = (lo_end > H) | ((up_end - up_start) > H)

        # up_perm moves device i -> i+1: my lower ghost/migrants arrive from
        # device d-1's upper planes, my upper ones from d+1's lower planes
        recv_dn = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, up_perm), send_up)
        recv_up = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, down_perm), send_dn)
        # ppermute leaves edge devices with zeros, and zero info would read
        # as an active fluid particle.  Edge devices have no neighbor on
        # that side, so kill the whole received region there (content
        # sniffing like mass==0 is wrong: TESTPOINT particles legitimately
        # carry zero mass).
        def sanitize(s, from_below):
            dev_ = jax.lax.axis_index(axis)
            invalid = (dev_ == 0) if from_below else (dev_ == ndev - 1)
            dead = jnp.uint32(int(ParticleType.NONE))
            return s.replace(info=jnp.where(invalid, dead, s.info))
        recv_dn = sanitize(recv_dn, True)
        recv_up = sanitize(recv_up, False)

        # drop my own ghost/migrant rows, then fold in received migrants
        own = (h_sorted >= plane) & (h_sorted < (slab + 1) * plane)
        dead = jnp.uint32(int(ParticleType.NONE))
        st = st.replace(info=jnp.where(own, st.info, dead))

        # of the received rows, keep only migrants (cells inside my slab);
        # halo values are re-exchanged after the merge so that ghost regions
        # and the per-step refresh read from the same snapshot
        def migrants(s):
            a = is_active(s.info)
            hh = _local_hash(dd, fw, s.pos, a, dev)
            mig = a & (hh >= plane) & (hh < (slab + 1) * plane)
            return s.replace(info=jnp.where(mig, s.info, dead))

        mig_dn = migrants(recv_dn)
        mig_up = migrants(recv_up)

        # local re-sort with migrants appended; truncate back to cap rows
        # (active locals always fit or overflow is flagged)
        merged = jax.tree.map(
            lambda a, b, c: jnp.concatenate([a, b, c], axis=0), st, mig_dn, mig_up
        )
        mh = _local_hash(dd, fw, merged.pos, is_active(merged.info), dev)
        mh_sorted, merged = _sort_by(mh, merged)
        n_own = jnp.searchsorted(mh_sorted, jnp.int32(n_cells)).astype(jnp.int32)
        cap_overflow = n_own > cap
        local = jax.tree.map(lambda a: a[:cap], merged)
        local_h = mh_sorted[:cap]

        # local cell table (covers all local cell ids; ghost cells re-pointed
        # into the ghost regions below)
        cs_local = _cell_tables(local_h, n_cells)

        # ===== halo exchange #2: boundary-plane snapshots ===================
        # my bottom own plane (local plane 1) -> lower neighbor's upper ghost;
        # my top own plane (local plane `slab`) -> upper neighbor's lower
        # ghost.  The refresh step re-extracts EXACTLY these windows, so the
        # ghost regions stay verbatim copies in sender order.
        my_lo_start = cs_local[plane]
        my_lo_end = cs_local[2 * plane]
        my_up_start = cs_local[slab * plane]
        my_up_end = cs_local[(slab + 1) * plane]

        def plane_window(state_like, start, end):
            idx = start + jnp.arange(H, dtype=jnp.int32)
            valid = idx < end
            return _extract(state_like, jnp.where(valid, jnp.minimum(idx, cap - 1), 0), valid)

        send_bottom = plane_window(local, my_lo_start, my_lo_end)
        send_top = plane_window(local, my_up_start, my_up_end)
        ex_overflow = ex_overflow | ((my_lo_end - my_lo_start) > H) | (
            (my_up_end - my_up_start) > H
        )

        ghost_dn = sanitize(
            jax.tree.map(lambda a: jax.lax.ppermute(a, axis, up_perm), send_top),
            True,
        )
        ghost_up = sanitize(
            jax.tree.map(lambda a: jax.lax.ppermute(a, axis, down_perm), send_bottom),
            False,
        )
        gh_dn_h = _local_hash(dd, fw, ghost_dn.pos, is_active(ghost_dn.info), dev)
        gh_up_h = _local_hash(dd, fw, ghost_up.pos, is_active(ghost_up.info), dev)

        # combined array: [local cap | ghost_dn H | ghost_up H]
        comb = jax.tree.map(
            lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
            local, ghost_dn, ghost_up,
        )

        # regional cell tables (runs along the fast axis never cross planes,
        # so per-region tables keep the contiguous-run invariant)
        cs_dn = _cell_tables(gh_dn_h, n_cells, region_offset=cap)
        cs_up = _cell_tables(gh_up_h, n_cells, region_offset=cap + H)
        cell_ids = jnp.arange(n_cells + 2, dtype=jnp.int32)
        in_dn_ghost = cell_ids < plane
        in_up_ghost = (cell_ids >= (slab + 1) * plane) & (cell_ids < n_cells)
        cell_start = jnp.where(
            in_dn_ghost, cs_dn, jnp.where(in_up_ghost, cs_up, cs_local)
        )
        # counts must come from the same region's table
        def counts(cs):
            return cs[1:] - cs[:-1]
        cnt = jnp.where(
            in_dn_ghost[:-1], counts(cs_dn),
            jnp.where(in_up_ghost[:-1], counts(cs_up), counts(cs_local)),
        )
        aux = CellAux(
            cell_start=cell_start,
            cell_count=cnt,
            hash_sorted=jnp.concatenate([local_h, gh_dn_h, gh_up_h]),
            max_occupancy=jnp.max(cnt[:n_cells]),
            n_active=jnp.sum(is_active(local.info).astype(jnp.int32)),
        )
        # Pallas neighbor-list plan: once per rebuild, reused by every forces
        # pass of the chunk (mirrors make_sim_chunk); the combined array is
        # three independently sorted segments
        plan = (
            build_block_plan(fw, lg, comb, aux, regions=(cap, cap + H))
            if use_pallas else None
        )

        def exchange_tree(tree):
            """UPDATE_EXTERNAL for arbitrary [capX,...] per-particle arrays:
            resend the boundary-plane windows and overwrite the live ghost
            rows (ghost regions are verbatim copies in sender order)."""
            def one(a):
                def win(start):
                    idx = start + jnp.arange(H, dtype=jnp.int32)
                    idx = jnp.minimum(idx, capX - 1)
                    return a[idx]
                r_dn = jax.lax.ppermute(win(my_up_start), axis, up_perm)
                r_up = jax.lax.ppermute(win(my_lo_start), axis, down_perm)
                return r_dn, r_up
            return jax.tree.map(one, tree)

        ghost_dn_alive = is_active(comb.info[cap:cap + H])
        ghost_up_alive = is_active(comb.info[cap + H:])

        def halo_refresh(stc: ParticleState):
            """UPDATE_EXTERNAL: resend boundary-plane values every step
            (pos/vel/rho + every extras field)."""
            tree = {"pos": stc.pos, "vel": stc.vel, "rho": stc.rho,
                    **{k: stc.extras[k] for k in stc.extras}}
            recv = exchange_tree(tree)

            def write(a, rv):
                r_dn, r_up = rv
                gd = ghost_dn_alive
                gu = ghost_up_alive
                if a.ndim > 1:
                    gd = gd[:, None]
                    gu = gu[:, None]
                a = a.at[cap:cap + H].set(jnp.where(gd, r_dn, a[cap:cap + H]))
                a = a.at[cap + H:].set(jnp.where(gu, r_up, a[cap + H:]))
                return a

            new = {k: write(tree[k], recv[k]) for k in tree}
            extras = {k: new[k] for k in stc.extras}
            return stc.replace(pos=new["pos"], vel=new["vel"],
                               rho=new["rho"], extras=extras)

        def exchange_field(a):
            """Per-field halo refresh (sigma / effpres / gamma / tau
            exchanges — the reference's targeted UPDATE_EXTERNAL)."""
            r_dn, r_up = exchange_tree((a,))[0]
            gd, gu = ghost_dn_alive, ghost_up_alive
            if a.ndim > 1:
                gd = gd[:, None]
                gu = gu[:, None]
            a = a.at[cap:cap + H].set(jnp.where(gd, r_dn, a[cap:cap + H]))
            a = a.at[cap + H:].set(jnp.where(gu, r_up, a[cap + H:]))
            return a

        local_rows = jnp.arange(capX, dtype=jnp.int32) < cap

        def gravity_at(t):
            return fw.gcallback(t) if fw.gcallback is not None else fw.pp.gravity

        def prep(stc, t):
            """Pre-forces phases with their halo exchanges (Grenier
            COMPUTE_DENSITY sigma, granular Jacobi effpres, SA gamma +
            boundary-condition imposition — each followed by the matching
            UPDATE_EXTERNAL like the reference's SA BC sequence,
            PredictorCorrectorIntegrator.cc:121-305)."""
            sigma = None
            gamma = None
            if grenier:
                from ..ops.grenier import grenier_density_sigma

                sigma, rho = grenier_density_sigma(
                    fw, lg, stc, aux, chunk_cells=chunk_cells)
                # ghosts' sigma is truncated at the outer edge: take the
                # owners' values (UPDATE_EXTERNAL on BUFFER_SIGMA)
                sigma = exchange_field(sigma)
                stc = stc.replace(rho=exchange_field(rho))
            if granular:
                from ..ops.jacobi import jacobi_effpres

                ep, info2, _ = jacobi_effpres(
                    fw, lg, stc, aux, stc.extra("effpres"),
                    chunk_cells=chunk_cells,
                    exchange=exchange_field,
                    reduce_max=lambda x: jax.lax.pmax(x, axis),
                )
                extras = dict(stc.extras)
                extras["effpres"] = exchange_field(ep)
                stc = stc.replace(extras=extras, info=info2)
            if fw.sa_boundary:
                from ..ops.sa import compute_gamma, impose_boundary_conditions

                waterdepth = None
                if fw.io is not None:
                    from ..ops.io_boundary import (impose_io_values,
                                                   io_water_depth)

                    stc = impose_io_values(fw, fw.io, stc, t)
                    if fw.io.depth_boxes:
                        # FIND_MAX_IOWATERDEPTH + the cross-device max
                        # (GPUSPH.cc:2206-2227 networkIntReduction)
                        waterdepth = jax.lax.pmax(
                            io_water_depth(fw, fw.io, stc), axis)
                if fw.dynamic_gamma:
                    # gamma is carried state, integrated after each euler
                    # (INTEGRATE_GAMMA / DENSITY_SUM) — must match the
                    # single-device choreography (integrator.py prep);
                    # ghost rows were already refreshed with the carried
                    # extras by halo_refresh
                    gamma = stc.extras["gamma"]
                else:
                    gamma, _ = compute_gamma(fw, lg, stc, aux,
                                             chunk_cells=chunk_cells)
                    # ghost rows' gamma comes from truncated neighborhoods:
                    # take the owners' values before it feeds the pair pass
                    gamma = exchange_field(gamma)
                stc = impose_boundary_conditions(
                    fw, lg, stc, aux, gamma, chunk_cells=chunk_cells, t=t,
                    waterdepth=waterdepth)
                # imposition rewrites rho/vel (+ extras) on wall rows from
                # fluid sums; ghost wall rows need the owners' results
                stc = halo_refresh(stc)
            return stc, sigma, gamma

        def calc_visc(stc):
            """CALC_VISC phase + UPDATE_EXTERNAL(TAU/EFFVISC) — ephemeral
            viscosity-engine outputs are pair fields, so ghost rows must
            carry the owners' values."""
            sps_tau = effvisc = None
            if needs_sps:
                from ..ops.visc import sps_stress

                sps_tau, _ = sps_stress(fw, lg, stc, aux,
                                        chunk_cells=chunk_cells)
                sps_tau = exchange_field(sps_tau)
            if needs_effvisc:
                from ..ops.visc import effective_viscosity

                effvisc = effective_viscosity(
                    fw, lg, stc, aux, effpres=stc.extra("effpres"),
                    chunk_cells=chunk_cells,
                )
                effvisc = exchange_field(effvisc)
            return sps_tau, effvisc

        def forces(stc, dt, t):
            stc, sigma, gamma = prep(stc, t)
            sps_tau, effvisc = calc_visc(stc)
            return raw_forces(stc, aux, dt, t, sigma=sigma, gamma=gamma,
                              sps_tau=sps_tau, effvisc=effvisc,
                              table=plan), stc

        density_sum = bool(fw.flags & SimFlags.ENABLE_DENSITY_SUM)
        dyn_gamma = fw.dynamic_gamma

        def post_euler(state_n, state_new, dt_eff):
            """DENSITY_SUM / INTEGRATE_GAMMA + UPDATE_EXTERNAL(VEL|GRADGAMMA)
            (PredictorCorrectorIntegrator.cc:616-682).  The incoming
            state_new must already be halo-refreshed so ghost rows carry the
            owners' post-euler positions."""
            if density_sum:
                from ..ops.density_sum import (apply_density_diffusion,
                                               density_sum_update)
                from ..defs import DensityDiffusionType as _DD

                state_new = density_sum_update(fw, lg, state_n, state_new,
                                               aux, dt_eff,
                                               chunk_cells=chunk_cells)
                state_new = halo_refresh(state_new)
                if fw.densitydiffusiontype != _DD.NONE:
                    state_new = apply_density_diffusion(
                        fw, lg, state_new, aux, dt_eff,
                        chunk_cells=chunk_cells)
            elif dyn_gamma:
                from ..ops.density_sum import integrate_gamma

                state_new = integrate_gamma(fw, lg, state_n, state_new,
                                            aux, dt_eff,
                                            chunk_cells=chunk_cells)
            return state_new

        # ===== integration steps ===========================================
        def pc_step(carry, it):
            stc, dt, t, bodies = carry
            stc = apply_filters(fw, lg, stc, aux, it)
            f1, stc = forces(stc, dt, t)
            half = euler_step(fw, stc, f1, dt * 0.5, step=1, grid=lg)
            if specs:
                b1 = reduce_body_forces(specs, stc, f1.DvDt, bodies,
                                        row_mask=local_rows)
                b1 = b1.replace(force=jax.lax.psum(b1.force, axis),
                                torque=jax.lax.psum(b1.torque, axis))
                b_half = step_bodies(specs, b1, gravity_at(t), t, dt * 0.5)
                half = apply_body_motion(specs, half, b_half, dt * 0.5)
            half = halo_refresh(half)
            if density_sum or dyn_gamma:
                half = halo_refresh(post_euler(stc, half, dt * 0.5))
            f2, half = forces(half, dt, t + dt * 0.5)
            new = euler_step(fw, stc, f2, dt, step=2, full_dt=dt, grid=lg)
            if specs:
                b2 = reduce_body_forces(specs, half, f2.DvDt, bodies,
                                        row_mask=local_rows)
                b2 = b2.replace(force=jax.lax.psum(b2.force, axis),
                                torque=jax.lax.psum(b2.torque, axis))
                new_bodies = step_bodies(
                    specs, b2, gravity_at(t + dt * 0.5), t + dt * 0.5, dt)
                new = apply_body_motion(specs, new, new_bodies, dt)
            else:
                new_bodies = bodies
            if density_sum or dyn_gamma:
                new = halo_refresh(new)
                new = post_euler(stc, new, dt)
            if fw.io is not None:
                from ..ops.io_boundary import kill_outflow

                # pure per-row geometry test: ghosts kill their own copies
                # consistently with the owners (CHECK_NEWNUMPARTS analogue)
                new = kill_outflow(fw.io, new)
            new = halo_refresh(new)
            if adaptive:
                local_dt = compute_dt(fw, f2)
                new_dt = jax.lax.pmin(local_dt, axis)
            else:
                new_dt = dt
            return (new, new_dt, t + dt, new_bodies), None

        (comb, dt, t, bodies), _ = jax.lax.scan(
            pc_step, (comb, dt, t, bodies), iters + jnp.arange(nsteps)
        )

        # drop ghosts, return local block
        out = jax.tree.map(lambda a: a[:cap], comb)

        stats = ShardStats(
            max_occupancy=jax.lax.pmax(aux.max_occupancy, axis),
            n_active=jax.lax.psum(aux.n_active, axis),
            dt=dt,
            overflow=jax.lax.pmax(
                (ex_overflow | cap_overflow).astype(jnp.int32), axis
            ),
        )
        return out, dt, t, iters + nsteps, bodies, stats

    pspec = ParticleState(
        pos=P("d"), vel=P("d"), rho=P("d"), mass=P("d"), info=P("d"), id=P("d"),
        extras={k: P("d") for k in extras_keys},
    )
    bspec = BodiesState(cg=P(), quat=P(), linvel=P(), angvel=P(),
                        force=P(), torque=P())
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(), P(), P(), bspec),
        out_specs=(pspec, P(), P(), P(), bspec, ShardStats(
            max_occupancy=P(), n_active=P(), dt=P(), overflow=P())),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_state(dd: Decomposition, mesh: Mesh, fw: SimFramework,
                state: ParticleState) -> ParticleState:
    """Distribute a host-built global state into per-device slabs.

    Sorts particles by owning device (the analogue of
    `GPUSPH::sortParticlesByHash` by device, `src/GPUSPH.cc:1308`), packs
    each device's particles into its [cap_dev] block, and device_puts with
    the mesh sharding.
    """
    g = dd.global_grid
    sa = dd.split_axis
    pos = np.asarray(state.pos)
    active = np.asarray(state.active)
    coords = np.clip(
        np.floor(
            (pos[:, sa] - g.origin[sa]) / g.cell_size[sa]
        ).astype(np.int64),
        0,
        g.ncells[sa] - 1,
    )
    owner = np.minimum(coords // dd.slab, dd.ndev - 1)

    cap = dd.cap_dev
    blocks = []
    for d in range(dd.ndev):
        sel = np.where(active & (owner == d))[0]
        if len(sel) > cap:
            raise ValueError(
                f"device {d} holds {len(sel)} particles > cap_dev {cap}"
            )
        pad = cap - len(sel)
        def take(a):
            a = np.asarray(a)
            picked = a[sel]
            fill = np.zeros((pad,) + a.shape[1:], a.dtype)
            return np.concatenate([picked, fill], axis=0)
        blk = ParticleState(
            pos=take(state.pos), vel=take(state.vel), rho=take(state.rho),
            mass=take(state.mass),
            info=np.concatenate([
                np.asarray(state.info)[sel],
                np.full(pad, int(ParticleType.NONE), np.uint32),
            ]),
            id=take(state.id),
            extras={k: take(v) for k, v in state.extras.items()},
        )
        blocks.append(blk)

    full = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *blocks)
    sharding = NamedSharding(mesh, P("d"))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), full)


__all__ = [
    "Decomposition",
    "make_decomposition",
    "make_sharded_chunk",
    "shard_state",
    "ShardStats",
]
