#!/usr/bin/env python
"""Per-phase wall-time breakdown of the DamBreak3D step on the attached chip.

The analogue of the reference's `--debug benchmark_command_runtimes`
(`src/GPUSPH.cc:108-131`): times each phase of the hot loop in isolation
(rebuild / run-table / pack / pallas forces / XLA forces / euler / full
chunk) so perf work targets the real bottleneck.
"""
import os
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:28s} {ms:9.3f} ms")
    return out, ms


def main():
    from gpusph_tpu.integrator import Simulator, make_sim_chunk
    from gpusph_tpu.ops.neighbors import build_cells
    from gpusph_tpu.ops.forces_pallas import (
        _pack_table, build_block_plan, compute_forces_pallas,
        pallas_supported, plan_dims)
    from gpusph_tpu.ops.forces import compute_forces
    from gpusph_tpu.ops.integrate import euler_step
    from gpusph_tpu.problems.base import get_problem
    from gpusph_tpu.bodies import init_bodies_state

    dp = float(os.environ.get("BENCH_DELTAP", "0.012"))
    P = get_problem("DamBreak3D")(dict(deltap=dp))
    grid, state = P.build()
    fw = P.fw.finalize()
    n = int(state.count_active())
    d = plan_dims(fw, grid, state.capacity)
    print(f"particles={n} cells={grid.n_cells} K={fw.sp.max_parts_per_cell} "
          f"RMAX={d["RMAX"]} P={d["P"]} blocks={d['n_blocks']} "
          f"pallas={pallas_supported(fw, grid)} dev={jax.devices()[0]}")

    sim = Simulator(fw, grid, bodies_specs=P.body_specs())
    dt = jnp.float32(sim.initial_dt(state))
    bodies = init_bodies_state(sim.bodies_specs, state)

    rb = jax.jit(lambda s: build_cells(grid, s))
    (sstate, aux), _ = timeit("build_cells (argsort)", rb, state)

    rt = jax.jit(lambda a: build_block_plan(fw, grid, a, state.capacity))
    plan, _ = timeit("build_block_plan", rt, aux)
    print(f"max_run={int(plan.max_run)} (cap {d['RMAX']})")

    pk = jax.jit(lambda s, g: _pack_table(fw, s, g))
    timeit("pack (table)", pk, sstate, plan.gather_idx)

    fp = jax.jit(lambda s, a, tb: compute_forces_pallas(fw, grid, s, a, table=tb))
    f_out, _ = timeit("forces pallas (full)", fp, sstate, aux, plan)

    fx = jax.jit(lambda s, a: compute_forces(fw, grid, s, a, chunk_cells=256))
    try:
        timeit("forces XLA (full)", fx, sstate, aux, reps=2)
    except Exception as e:
        print(f"forces XLA failed: {e}")

    eu = jax.jit(lambda s, f, d: euler_step(fw, s, f, d, step=1, grid=grid))
    timeit("euler_step", eu, sstate, f_out, dt)

    t = jnp.float32(0.0)
    it = jnp.int32(0)
    state2, dt2, t2, it2, bodies2, stats = sim._chunk(state, dt, t, it, bodies)
    jax.block_until_ready(state2.pos)
    t0 = time.perf_counter()
    reps = 3
    st, d_, t_, i_, b_ = state2, dt2, t2, it2, bodies2
    for _ in range(reps):
        st, d_, t_, i_, b_, stats = sim._chunk(st, d_, t_, i_, b_)
    jax.block_until_ready(st.pos)
    ms = (time.perf_counter() - t0) / reps * 1e3
    nsteps = fw.sp.buildneibsfreq
    print(f"{'full chunk':28s} {ms:9.3f} ms  ({ms/nsteps:.3f} ms/step, "
          f"{n*nsteps/(ms/1e3):.3e} ps/s)")


if __name__ == "__main__":
    main()
