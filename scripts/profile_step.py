#!/usr/bin/env python
"""Per-phase wall-time breakdown of the DamBreak3D step on the attached chip.

The analogue of the reference's `--debug benchmark_command_runtimes`
(`src/GPUSPH.cc:108-131`): times each phase of the hot loop in isolation
(rebuild / run-table / pack / pallas forces / XLA forces / euler / full
chunk) so perf work targets the real bottleneck.

Timing uses the slope harness (scripts/tpu_time.py): on the tunneled TPU,
``block_until_ready`` does not block and identical dispatches are memoized,
so each phase runs chained inside one jitted fori_loop and the marginal
per-rep cost is taken as the difference between two rep counts.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from tpu_time import slope_ms


def phase(name, fn, state0, per=None, r2=12):
    """fn: state -> small-or-large pytree; chained via a scalar probe that
    feeds back into state.pos so reps can't collapse."""

    def step(c):
        s, acc = c
        out = fn(s)
        probe = jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.float32)
        s = s.replace(pos=s.pos * (1.0 + probe * 1e-30))
        return (s, acc + probe * 1e-30)

    ms = slope_ms(step, (state0, jnp.float32(0.0)), r1=2, r2=r2)
    extra = f"  ({per[1]/(ms*1e-3)/1e6:8.2f}M {per[0]}/s)" if per else ""
    print(f"{name:28s} {ms:9.3f} ms{extra}", flush=True)
    return ms


def main():
    from gpusph_tpu.bodies import init_bodies_state
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops.forces import compute_forces
    from gpusph_tpu.ops.forces_pallas import (_pack_tables, build_block_plan,
                                              compute_forces_pallas,
                                              pallas_supported, plan_dims)
    from gpusph_tpu.ops.integrate import euler_step
    from gpusph_tpu.ops.neighbors import build_cells
    from gpusph_tpu.problems.base import get_problem

    dp = float(os.environ.get("BENCH_DELTAP", "0.012"))
    P = get_problem("DamBreak3D")(dict(deltap=dp))
    grid, state = P.build()
    fw = P.fw.finalize()
    n = int(state.count_active())
    d = plan_dims(fw, grid, state.capacity)
    print(f"particles={n} cells={grid.n_cells} K={fw.sp.max_parts_per_cell} "
          f"G_max={d['G_max']} T_total={d['T_total']} blocks={d['n_blocks']} "
          f"pallas={pallas_supported(fw, grid)} dev={jax.devices()[0]}",
          flush=True)

    sim = Simulator(fw, grid, bodies_specs=P.body_specs())
    dt = jnp.float32(sim.initial_dt(state))
    bodies = init_bodies_state(sim.bodies_specs, state)

    phase("build_cells (argsort)", lambda s: build_cells(grid, s), state,
          per=("parts", n))

    sstate, aux = jax.jit(lambda s: build_cells(grid, s))(state)

    phase("build_block_plan",
          lambda s: build_block_plan(fw, grid, s, aux), sstate)

    plan = jax.jit(
        lambda s, a: build_block_plan(fw, grid, s, a))(sstate, aux)

    phase("pack (window+central)",
          lambda s: _pack_tables(fw, grid, s, plan), sstate, per=("parts", n))

    if pallas_supported(fw, grid):
        phase("forces pallas (full)",
              lambda s: compute_forces_pallas(fw, grid, s, aux, table=plan),
              sstate, per=("parts", n))

    if not int(os.environ.get("GTPU_PROFILE_FAST", "0")):
        phase("forces XLA (full)",
              lambda s: compute_forces(fw, grid, s, aux, chunk_cells=256),
              sstate, per=("parts", n), r2=4)

    f_out = jax.jit(
        lambda s: compute_forces_pallas(fw, grid, s, aux, table=plan)
        if pallas_supported(fw, grid)
        else compute_forces(fw, grid, s, aux, chunk_cells=256))(sstate)

    phase("euler_step",
          lambda s: euler_step(fw, s, f_out, dt, step=1, grid=grid),
          sstate, per=("parts", n))

    # full chunk, slope-timed across python dispatches with a host fetch
    def run_chunks(st, d_, t_, i_, b_, reps):
        for _ in range(reps):
            st, d_, t_, i_, b_, stats = sim._chunk(st, d_, t_, i_, b_)
        import numpy as np
        np.asarray(st.pos[0])  # force completion
        return st, d_, t_, i_, b_

    t0v = jnp.float32(0.0)
    it0 = jnp.int32(0)
    args = run_chunks(state, dt, t0v, it0, bodies, 1)  # warm/compile
    t0 = time.perf_counter()
    args = run_chunks(*args, 1)
    t1 = time.perf_counter()
    args = run_chunks(*args, 5)
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / 4 * 1e3
    nsteps = fw.sp.buildneibsfreq
    print(f"{'full chunk (marginal)':28s} {ms:9.3f} ms  "
          f"({ms/nsteps:.3f} ms/step, {n*nsteps/(ms/1e3):.3e} ps/s)",
          flush=True)


if __name__ == "__main__":
    main()
