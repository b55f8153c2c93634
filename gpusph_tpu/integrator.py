"""Predictor-corrector integrator: the jit-compiled simulation hot loop.

TPU-native collapse of the reference's orchestration stack: what GPUSPH
spreads over the Integrator command program
(`src/integrators/PredictorCorrectorIntegrator.cc:386-685`), the GPUSPH
manager dispatch loop (`src/GPUSPH.cc:747-759`) and per-command GPUWorker
kernel launches, becomes ONE pure function

    sim_chunk: (State, dt, t, iters) -> (State, dt, t, iters, stats)

that rebuilds the neighbor structure once (NEIBS_LIST phase,
`src/Integrator.cc:95-250`) and then runs ``buildneibsfreq`` predictor/
corrector steps under ``lax.scan`` — the whole thing traced once and
compiled by XLA.  The host loop only handles write-out scheduling and
termination, like the reference's TIME_STEP_EPILOGUE
(`src/GPUSPH.cc:636-699`).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .bodies import (
    apply_body_motion,
    init_bodies_state,
    reduce_body_forces,
    step_bodies,
)
from .defs import (DensityDiffusionType, RheologyType, SimFlags,
                   SPHFormulation, TurbulenceModel)
from .framework import SimFramework
from .ops.visc import effective_viscosity, sps_stress
from .ops.filters import apply_filters
from .ops.forces import compute_forces
from .ops.grenier import grenier_density_sigma
from .ops.jacobi import jacobi_effpres
from .ops.forces_pallas import (build_block_plan, compute_forces_pallas,
                                pallas_supported, plan_dims)
from .ops.integrate import compute_dt, euler_step
from .ops.neighbors import CellAux, CellGrid, build_cells
from .state import ParticleState


class StepStats(struct.PyTreeNode):
    """Diagnostics of one sim chunk (feeds the perf/validity reporting the
    reference keeps in TimingInfo, `src/timing.h:43-100`)."""

    max_occupancy: jax.Array  # i32[] max particles per cell at last rebuild
    n_active: jax.Array  # i32[]
    dt: jax.Array  # f32[] dt after the chunk
    max_accel: jax.Array
    max_sspeed: jax.Array
    max_run: jax.Array  # i32[] max 3-cell candidate-run extent (pallas)


class DtZeroException(RuntimeError):
    """dt underflow (reference `src/timing.h:183-196`)."""


class CellOverflowError(RuntimeError):
    """A cell exceeded max_parts_per_cell — the analogue of the reference's
    neighbor-list overflow abort (CHECK_NEIBSNUM, `src/GPUSPH.cc:1851`)."""


def make_sim_chunk(fw: SimFramework, grid: CellGrid, *, chunk_cells: int = 256,
                   steps_per_chunk: Optional[int] = None,
                   use_pallas: Optional[bool] = None,
                   bodies_specs=None) -> Callable:
    """Build the jitted chunk function for a framework + grid.

    Returns ``chunk(state, dt, t, iters, bodies) -> (state, dt, t, iters,
    bodies, stats)`` advancing ``steps_per_chunk`` (default
    ``buildneibsfreq``) time steps after one neighbor rebuild.  The forces
    engine is the Pallas kernel when the model configuration supports it (on
    an actual TPU), the XLA pair path otherwise.  ``bodies_specs`` enables
    the moving/floating-body pipeline (see `gpusph_tpu.bodies`).
    """
    sp = fw.sp
    nsteps = steps_per_chunk or sp.buildneibsfreq
    adaptive = bool(fw.flags & SimFlags.ENABLE_DTADAPT)
    if use_pallas is None:
        use_pallas = (
            pallas_supported(fw, grid) and jax.default_backend() != "cpu"
        )

    needs_sps = fw.visc.turbmodel == TurbulenceModel.SPS
    needs_effvisc = fw.visc.needs_effective_visc

    def calc_visc(state, aux):
        """CALC_VISC phase: ephemeral viscosity-engine outputs recomputed
        before each forces pass (PredictorCorrectorIntegrator.cc:386-430)."""
        sps_tau = effvisc = None
        if needs_sps:
            sps_tau, _ = sps_stress(fw, grid, state, aux, chunk_cells=chunk_cells)
        if needs_effvisc:
            effvisc = effective_viscosity(
                fw, grid, state, aux,
                effpres=state.extra("effpres"), chunk_cells=chunk_cells,
            )
        return sps_tau, effvisc

    grenier = fw.sph_formulation == SPHFormulation.SPH_GRENIER
    granular = fw.visc.rheologytype == RheologyType.GRANULAR
    sa = fw.sa_boundary

    def prep(state, aux, t=None):
        """Pre-forces phases: Grenier COMPUTE_DENSITY, the granular EFFPRES
        Jacobi solve (PredictorCorrectorIntegrator.cc:1060-1185) and the SA
        gamma + boundary-condition passes (SA_CALC_*_BOUNDARY_CONDITIONS,
        PredictorCorrectorIntegrator.cc:121-305) incl. open-boundary
        imposition.
        Returns the refreshed state (+ Grenier sigma, + SA gamma)."""
        sigma = None
        gamma = None
        if grenier:
            # densityGrenierDevice (forces_kernel.cu:286): refresh sigma +
            # smoothed density before every forces pass
            sigma, rho = grenier_density_sigma(
                fw, grid, state, aux, chunk_cells=chunk_cells)
            state = state.replace(rho=rho)
        if granular:
            ep, info2, _ = jacobi_effpres(
                fw, grid, state, aux, state.extra("effpres"),
                chunk_cells=chunk_cells)
            extras = dict(state.extras)
            extras["effpres"] = ep
            state = state.replace(extras=extras, info=info2)
        if sa:
            from .ops.sa import compute_gamma, impose_boundary_conditions

            waterdepth = None
            if fw.io is not None:
                from .ops.io_boundary import impose_io_values, io_water_depth

                state = impose_io_values(
                    fw, fw.io, state,
                    t if t is not None else jnp.float32(0.0))
                if fw.io.depth_boxes:
                    # FIND_MAX_IOWATERDEPTH (forces_kernel.def:3279-3303)
                    waterdepth = io_water_depth(fw, fw.io, state)
            if fw.dynamic_gamma:
                # gamma is carried state, integrated after each euler
                # (INTEGRATE_GAMMA / DENSITY_SUM), not re-quadratured
                gamma = state.extras["gamma"]
            else:
                gamma, _ = compute_gamma(fw, grid, state, aux,
                                         chunk_cells=chunk_cells)
            state = impose_boundary_conditions(
                fw, grid, state, aux, gamma, chunk_cells=chunk_cells, t=t,
                waterdepth=waterdepth)
        return state, sigma, gamma

    if use_pallas:
        def forces(state, aux, dt, t, table=None):
            state, _, _ = prep(state, aux, t)
            sps_tau, effvisc = calc_visc(state, aux)
            return compute_forces_pallas(fw, grid, state, aux, dt=dt,
                                         sps_tau=sps_tau, effvisc=effvisc,
                                         table=table), state
    else:
        def forces(state, aux, dt, t, table=None):
            state, sigma, gamma = prep(state, aux, t)
            sps_tau, effvisc = calc_visc(state, aux)
            return compute_forces(fw, grid, state, aux, dt=dt,
                                  chunk_cells=chunk_cells,
                                  sps_tau=sps_tau, effvisc=effvisc,
                                  sigma=sigma, t=t, gamma=gamma), state

    def gravity_at(t):
        return fw.gcallback(t) if fw.gcallback is not None else fw.pp.gravity

    specs = tuple(bodies_specs or ())

    density_sum = bool(fw.flags & SimFlags.ENABLE_DENSITY_SUM)
    dyn_gamma = fw.dynamic_gamma

    def post_euler_impl(state_n, state_new, dt_eff, aux):
        """DENSITY_SUM / INTEGRATE_GAMMA after each euler half/full step
        (PredictorCorrectorIntegrator.cc:616-682): both read the base state
        n and update the freshly integrated state."""
        if density_sum:
            from .ops.density_sum import (apply_density_diffusion,
                                          density_sum_update)

            state_new = density_sum_update(
                fw, grid, state_n, state_new, aux, dt_eff,
                chunk_cells=chunk_cells)
            if fw.densitydiffusiontype != DensityDiffusionType.NONE:
                state_new = apply_density_diffusion(
                    fw, grid, state_new, aux, dt_eff,
                    chunk_cells=chunk_cells)
        elif dyn_gamma:
            from .ops.density_sum import integrate_gamma

            state_new = integrate_gamma(
                fw, grid, state_n, state_new, aux, dt_eff,
                chunk_cells=chunk_cells)
        return state_new

    def pc_step(carry, it):
        state, dt, t, bodies, aux, table = carry

        # density filters at their frequencies (FILTER phase,
        # PredictorCorrectorIntegrator.cc:800-877)
        state = apply_filters(fw, grid, state, aux, it)

        # PREDICTOR: forces at n, integrate to n* with dt/2
        f1, state = forces(state, aux, dt, t, table)
        half = euler_step(fw, state, f1, dt * 0.5, step=1, grid=grid)
        if specs:
            b1 = reduce_body_forces(specs, state, f1.DvDt, bodies)
            b_half = step_bodies(specs, b1, gravity_at(t), t, dt * 0.5)
            half = apply_body_motion(specs, half, b_half, dt * 0.5)
        if density_sum or dyn_gamma:
            half = post_euler_impl(state, half, dt * 0.5, aux)

        # CORRECTOR: forces at n*, integrate n -> n+1 with dt
        f2, half = forces(half, aux, dt, t + dt * 0.5, table)
        new_state = euler_step(fw, state, f2, dt, step=2, full_dt=dt, grid=grid)
        if specs:
            b2 = reduce_body_forces(specs, half, f2.DvDt, bodies)
            new_bodies = step_bodies(
                specs, b2, gravity_at(t + dt * 0.5), t + dt * 0.5, dt)
            new_state = apply_body_motion(specs, new_state, new_bodies, dt)
        else:
            new_bodies = bodies
        if density_sum or dyn_gamma:
            new_state = post_euler_impl(state, new_state, dt, aux)

        if fw.io is not None:
            from .ops.io_boundary import kill_outflow

            new_state = kill_outflow(fw.io, new_state)

        new_dt = compute_dt(fw, f2) if adaptive else dt
        return (new_state, new_dt, t + dt, new_bodies, aux, table), (
            f2.max_accel, f2.max_sspeed,
        )

    def chunk(state: ParticleState, dt, t, iters, bodies):
        state, aux = build_cells(grid, state)
        # the Pallas neighbor-list plan only depends on the rebuild: build once
        if use_pallas:
            table = build_block_plan(fw, grid, state, aux)
            max_run = table.max_run
        else:
            table = jnp.zeros((), jnp.int32)
            max_run = jnp.zeros((), jnp.int32)
        (state, dt, t, bodies, _, _), (max_acc, max_ss) = jax.lax.scan(
            pc_step, (state, dt, t, bodies, aux, table), iters + jnp.arange(nsteps)
        )
        stats = StepStats(
            max_occupancy=aux.max_occupancy,
            n_active=aux.n_active,
            dt=dt,
            max_accel=max_acc[-1],
            max_sspeed=max_ss[-1],
            max_run=max_run,
        )
        return state, dt, t, iters + nsteps, bodies, stats

    return jax.jit(chunk, donate_argnums=(0,))


@dataclasses.dataclass
class Simulator:
    """Host-side driver around the jitted chunk — the remaining sliver of the
    reference's GPUSPH manager (`src/GPUSPH.cc:721-860`): write scheduling,
    termination, dt sanity, perf counters (MIPPS)."""

    fw: SimFramework
    grid: CellGrid
    chunk_cells: int = 256
    use_pallas: Optional[bool] = None
    bodies_specs: tuple = ()

    def __post_init__(self):
        self.fw = self.fw.finalize()
        self._chunk = make_sim_chunk(
            self.fw, self.grid, chunk_cells=self.chunk_cells,
            use_pallas=self.use_pallas, bodies_specs=self.bodies_specs,
        )
        # the Pallas window capacity (RMAX) for the overflow check; 0 when
        # the XLA path runs (no static window to overflow)
        if self.use_pallas is None:
            pallas_on = pallas_supported(self.fw, self.grid) and (
                jax.default_backend() != "cpu"
            )
        else:
            pallas_on = self.use_pallas
        self._run_cap = 0
        if pallas_on:
            self._run_cap = plan_dims(self.fw, self.grid, 0)["RMAX"]
        self.iterations = 0
        self.t = 0.0
        self.dt = self.fw.sp.dt
        self.particle_steps = 0
        self.elapsed = 0.0
        self.bodies = None  # BodiesState, created at run() from the state
        self._vmass = None  # open-boundary vertex-mass accumulator
        self._next_id = 0

    def initial_dt(self, state: ParticleState):
        """Initial dt: 0.1 h/c0 like the reference default when dt not set."""
        sp, pp = self.fw.sp, self.fw.pp
        if sp.dt > 0:
            return sp.dt
        c0max = max(f.c0 for f in pp.fluids)
        return 0.1 * sp.slength / c0max

    def run(
        self,
        state: ParticleState,
        *,
        tend: Optional[float] = None,
        maxiter: Optional[int] = None,
        on_write: Optional[Callable] = None,
        write_every: float = 0.0,
    ) -> ParticleState:
        """Run until tend/maxiter, invoking ``on_write(sim, state)`` at the
        write cadence (the doWrite path, `src/GPUSPH.cc:1573`)."""
        sp = self.fw.sp
        tend = sp.tend if tend is None else tend
        maxiter = sp.maxiter if maxiter is None else maxiter
        dt = jnp.float32(self.dt if self.dt else self.initial_dt(state))

        t = jnp.float32(self.t)
        iters = jnp.int32(self.iterations)
        next_write = self.t + write_every if write_every > 0 else float("inf")

        if self.bodies is None:
            self.bodies = init_bodies_state(self.bodies_specs, state)

        # dynamic gamma: seed gamma/gradgamma by quadrature on a fresh start
        # (saInitGamma during INITIALIZATION; a resume keeps the hotfile's)
        if self.fw.dynamic_gamma and self.iterations == 0:
            from .ops.density_sum import init_dynamic_gamma
            from .ops.neighbors import build_cells

            def _init(s):
                s, aux = build_cells(self.grid, s)
                return init_dynamic_gamma(self.fw, self.grid, s, aux,
                                          chunk_cells=self.chunk_cells)

            state = jax.jit(_init)(state)

        # open boundaries: vertex-mass accumulator + id allocator for the
        # host-side inlet particle creation (CHECK_NEWNUMPARTS cadence)
        io = self.fw.io
        if io is not None and self._vmass is None:
            from .ops.io_boundary import init_io_mass

            # staggered initial accumulator (initIOmass analogue)
            self._vmass = init_io_mass(self.fw, state)
            self._next_id = int(jax.device_get(state.id).max()) + 1

        if on_write is not None:
            on_write(self, state)

        while True:
            t_before = float(t)
            t0 = time.perf_counter()
            state, dt, t, iters, self.bodies, stats = self._chunk(
                state, dt, t, iters, self.bodies
            )
            stats = jax.device_get(stats)
            self.elapsed += time.perf_counter() - t0

            if io is not None and io.imposed_vel is not None:
                from .ops.io_boundary import inlet_create_host

                state, self._vmass, self._next_id, _ = inlet_create_host(
                    self.fw, io, state, self._vmass,
                    float(t) - t_before, float(t), self._next_id,
                )

            self._check(stats)
            self.iterations = int(iters)
            self.t = float(t)
            self.dt = float(stats.dt)
            self.particle_steps += int(stats.n_active) * self.fw.sp.buildneibsfreq

            if self.t >= next_write and on_write is not None:
                on_write(self, state)
                next_write += write_every

            if tend and self.t >= tend:
                break
            if maxiter and self.iterations >= maxiter:
                break

        if on_write is not None:
            on_write(self, state)
        return state

    def _check(self, stats: StepStats):
        if int(stats.max_occupancy) > self.fw.sp.max_parts_per_cell:
            raise CellOverflowError(
                f"cell occupancy {int(stats.max_occupancy)} exceeds "
                f"max_parts_per_cell={self.fw.sp.max_parts_per_cell}; "
                "raise SimParams.max_parts_per_cell"
            )
        if self._run_cap and int(stats.max_run) > self._run_cap:
            raise CellOverflowError(
                f"neighbor-list load {int(stats.max_run)} exceeds the "
                f"per-block capacity {self._run_cap} groups; raise "
                "SimParams.max_block_groups (or, if the value is >= 1e6: "
                "max_blocks / max_run_extent)"
            )
        if not (float(stats.dt) > 1e-10):
            raise DtZeroException(f"timestep underflow: dt={float(stats.dt)}")

    @property
    def mipps(self) -> float:
        """Million particle-iterations per second (reference `src/timing.h:103-170`)."""
        if self.elapsed == 0:
            return 0.0
        return self.particle_steps / self.elapsed / 1e6


__all__ = ["Simulator", "make_sim_chunk", "StepStats", "DtZeroException", "CellOverflowError"]
