"""Multi-chip end-to-end driver: the sharded analogue of `integrator.Simulator`.

The reference's `main` runs multi-GPU and multi-node transparently
(`src/main.cc:385-477`, `src/GPUSPH.cc:164-550`): the same host loop does
write scheduling, checkpoints and inlet particle creation regardless of the
device count.  This module gives gpusph_tpu the same property: a
:class:`ShardedSimulator` with the `Simulator` host API (run / t /
iterations / mipps / bodies) driving the shard_map'd chunk of
`parallel.domain.make_sharded_chunk` over a `jax.sharding.Mesh`.

Host↔device traffic policy (HBM/ICI first):

* the chunk itself never leaves the devices — state stays sharded across
  the mesh, halos ride ICI via ppermute;
* writers/checkpoints gather the global state only at the write cadence;
* open-boundary inlet creation gathers at chunk cadence (only when the
  problem has inlets), creates particles host-side exactly like the
  single-device path (`ops/io_boundary.inlet_create_host`, with the
  vertex-mass accumulator keyed by particle id so it survives both row
  permutation and device migration), then re-scatters.

Run it from the CLI with ``--ndev N`` (`python -m gpusph_tpu DamBreak3D
--ndev 4``); on a machine without N real chips set
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..framework import SimFramework
from ..integrator import CellOverflowError, DtZeroException
from ..ops.neighbors import CellGrid
from ..state import ParticleState
from .domain import (Decomposition, make_decomposition, make_sharded_chunk,
                     shard_state)


def gather_state(state: ParticleState) -> ParticleState:
    """Fetch a sharded state to host numpy as one global-capacity state.

    The result's row order is the concatenation of the per-device blocks
    (dead padding rows included); consumers (writers, hotfile, inlet
    creation) already operate on the active mask / particle ids.
    """
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), state)


@dataclasses.dataclass
class ShardedSimulator:
    """Host-side driver for a slab-sharded simulation over a device mesh.

    Mirrors `integrator.Simulator`'s host API so the CLI and writers are
    device-count agnostic (the reference achieves the same with GPUSPH
    dispatching to one or many GPUWorkers, `src/GPUSPH.cc:164-550`).
    """

    fw: SimFramework
    grid: CellGrid  # global grid
    ndev: int = 0  # 0 -> all visible devices
    chunk_cells: int = 256
    use_pallas: Optional[bool] = None
    bodies_specs: tuple = ()
    balance_margin: float = 2.0

    def __post_init__(self):
        self.fw = self.fw.finalize()
        devices = jax.devices()
        if not self.ndev:
            self.ndev = len(devices)
        if self.ndev > len(devices):
            raise ValueError(
                f"--ndev {self.ndev} requested but only {len(devices)} "
                "devices visible (for a virtual mesh set JAX_PLATFORMS=cpu "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        self.mesh = Mesh(np.array(devices[: self.ndev]), ("d",))
        self.dd: Optional[Decomposition] = None
        self._chunk = None
        self.iterations = 0
        self.t = 0.0
        self.dt = self.fw.sp.dt
        self.particle_steps = 0
        self.elapsed = 0.0
        self.bodies = None
        self._vmass = None  # id-keyed open-boundary vertex-mass accumulator
        self._next_id = 0

    # -- setup ------------------------------------------------------------
    def prepare(self, state: ParticleState) -> ParticleState:
        """Build the decomposition from the initial layout, compile the
        sharded chunk, and scatter the global state over the mesh."""
        n = int(state.count_active())
        self.dd = make_decomposition(
            self.grid, self.ndev, n, state=state,
            balance_margin=self.balance_margin,
        )
        self._chunk = make_sharded_chunk(
            self.fw, self.dd, self.mesh,
            use_pallas=self.use_pallas,
            chunk_cells=self.chunk_cells,
            bodies_specs=self.bodies_specs,
            extras_keys=tuple(state.extras),
        )
        return shard_state(self.dd, self.mesh, self.fw, state)

    def initial_dt(self, state: ParticleState):
        sp, pp = self.fw.sp, self.fw.pp
        if sp.dt > 0:
            return sp.dt
        c0max = max(f.c0 for f in pp.fluids)
        return 0.1 * sp.slength / c0max

    # -- main loop ---------------------------------------------------------
    def run(
        self,
        state: ParticleState,
        *,
        tend: Optional[float] = None,
        maxiter: Optional[int] = None,
        on_write: Optional[Callable] = None,
        write_every: float = 0.0,
    ) -> ParticleState:
        """Run until tend/maxiter.  ``state`` is the global host-built
        state; the returned state is gathered back to host.  ``on_write``
        receives (self, gathered_global_state) at the write cadence."""
        sp = self.fw.sp
        tend = sp.tend if tend is None else tend
        maxiter = sp.maxiter if maxiter is None else maxiter

        # dynamic gamma: seed by quadrature on a fresh start (saInitGamma),
        # single-device — it only runs once, before the scatter
        if self.fw.dynamic_gamma and self.iterations == 0:
            from ..ops.density_sum import init_dynamic_gamma
            from ..ops.neighbors import build_cells

            def _init(s):
                s, aux = build_cells(self.grid, s)
                return init_dynamic_gamma(self.fw, self.grid, s, aux,
                                          chunk_cells=self.chunk_cells)

            state = jax.jit(_init)(state)

        io = self.fw.io
        if io is not None and self._vmass is None:
            from ..ops.io_boundary import init_io_mass

            # staggered initial accumulator (initIOmass analogue)
            self._vmass = init_io_mass(self.fw, state)
            self._next_id = int(jax.device_get(state.id).max()) + 1

        from ..bodies import init_bodies_state

        if self.bodies is None:
            self.bodies = init_bodies_state(self.bodies_specs, state)

        sh = self.prepare(state)
        dt = jnp.float32(self.dt if self.dt else self.initial_dt(state))
        t = jnp.float32(self.t)
        iters = jnp.int32(self.iterations)
        next_write = self.t + write_every if write_every > 0 else float("inf")

        if on_write is not None:
            on_write(self, gather_state(sh))

        while True:
            t_before = float(t)
            t0 = time.perf_counter()
            sh, dt, t, iters, self.bodies, stats = self._chunk(
                sh, dt, t, iters, self.bodies
            )
            stats = jax.device_get(stats)
            self.elapsed += time.perf_counter() - t0

            if io is not None and io.imposed_vel is not None:
                from ..ops.io_boundary import inlet_create_host

                g = gather_state(sh)
                g, self._vmass, self._next_id, n_new = inlet_create_host(
                    self.fw, io, g, self._vmass,
                    float(t) - t_before, float(t), self._next_id,
                )
                if n_new:
                    sh = shard_state(self.dd, self.mesh, self.fw, g)

            self._check(stats)
            self.iterations = int(iters)
            self.t = float(t)
            self.dt = float(stats.dt)
            self.particle_steps += int(stats.n_active) * sp.buildneibsfreq

            if self.t >= next_write and on_write is not None:
                on_write(self, gather_state(sh))
                next_write += write_every

            if tend and self.t >= tend:
                break
            if maxiter and self.iterations >= maxiter:
                break

        out = gather_state(sh)
        if on_write is not None:
            on_write(self, out)
        return out

    def _check(self, stats):
        if int(stats.overflow):
            raise CellOverflowError(
                "a device's particle or halo-exchange capacity was exceeded "
                "(ShardStats.overflow); raise balance_margin or "
                "halo_occupancy in make_decomposition"
            )
        if int(stats.max_occupancy) > self.fw.sp.max_parts_per_cell:
            raise CellOverflowError(
                f"cell occupancy {int(stats.max_occupancy)} exceeds "
                f"max_parts_per_cell={self.fw.sp.max_parts_per_cell}"
            )
        if not (float(stats.dt) > 1e-10):
            raise DtZeroException(f"timestep underflow: dt={float(stats.dt)}")

    @property
    def mipps(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.particle_steps / self.elapsed / 1e6


__all__ = ["ShardedSimulator", "gather_state"]
