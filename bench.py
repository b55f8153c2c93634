#!/usr/bin/env python
"""Benchmark: DamBreak3D particle-steps/second on the available device.

Prints ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N/1e9, ...}

The baseline target (BASELINE.json) is 1e9 particle-steps/s/chip at 10M
particles on a v5p; we report the measured rate at the benchmark size that
fits the attached chip, plus the neighbor-rebuild share.
"""
import json
import os
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    dp = float(os.environ.get("BENCH_DELTAP", "0.012"))
    warm_chunks = 2
    bench_chunks = 5

    P = get_problem("DamBreak3D")(dict(deltap=dp))
    grid, state = P.build()
    n = int(state.count_active())

    sim = Simulator(P.fw, grid, bodies_specs=P.body_specs())
    dt = sim.initial_dt(state)
    import jax.numpy as jnp

    from gpusph_tpu.bodies import init_bodies_state

    dt = jnp.float32(dt)
    t = jnp.float32(0.0)
    it = jnp.int32(0)
    bodies = init_bodies_state(sim.bodies_specs, state)

    # warmup (compile + first chunks)
    for _ in range(warm_chunks):
        state, dt, t, it, bodies, stats = sim._chunk(state, dt, t, it, bodies)
    jax.block_until_ready(state.pos)
    sim._check(jax.device_get(stats))  # no silent cell overflow in the bench

    t0 = time.perf_counter()
    for _ in range(bench_chunks):
        state, dt, t, it, bodies, stats = sim._chunk(state, dt, t, it, bodies)
    jax.block_until_ready(state.pos)
    elapsed = time.perf_counter() - t0

    steps = bench_chunks * P.fw.sp.buildneibsfreq
    particle_steps = n * steps
    rate = particle_steps / elapsed

    # neighbor-rebuild cost (BASELINE.md asks for ms/step): time the sort +
    # cell-table build alone, amortized over buildneibsfreq steps
    from gpusph_tpu.ops.neighbors import build_cells

    rb = jax.jit(lambda s: build_cells(grid, s))
    jax.block_until_ready(rb(state)[0].pos)
    t0 = time.perf_counter()
    for _ in range(5):
        out = rb(state)
    jax.block_until_ready(out[0].pos)
    rebuild_ms = (time.perf_counter() - t0) / 5 * 1e3

    baseline = 1e9  # BASELINE.json north star: 1e9 particle-steps/s/chip
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec",
                "value": rate,
                "unit": "particle-steps/s",
                "vs_baseline": rate / baseline,
                "particles": n,
                "steps_timed": steps,
                "wall_s": elapsed,
                "neighbor_rebuild_ms": rebuild_ms,
                "rebuild_ms_per_step": rebuild_ms / P.fw.sp.buildneibsfreq,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
