"""Per-phase wall-time accounting — the `--debug timing` analogue of the
reference's `--debug benchmark_command_runtimes` (`src/GPUSPH.cc:108-131`,
`:2358-2364`).

The hot loop is one fused jitted chunk, so per-"command" timing is
reconstructed by timing each phase in isolation (rebuild / plan / pack /
forces / euler) plus the real fused chunk; numbers are wall-clock over
chained executions (per-op timings through the TPU tunnel are unreliable
for repeated identical calls).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def phase_report(fw, grid, state, *, bodies_specs=(), reps: int = 5,
                 printer=print) -> dict:
    """Time each phase of the simulation step; returns {phase: ms}."""
    from .bodies import init_bodies_state
    from .integrator import make_sim_chunk
    from .ops.forces import compute_forces
    from .ops.forces_pallas import (_pack_tables, build_block_plan,
                                    compute_forces_pallas, pallas_supported,
                                    plan_dims)
    from .ops.integrate import euler_step
    from .ops.neighbors import build_cells

    out = {}

    def timeit(name, fn, *args):
        try:
            res = fn(*args)
            jax.block_until_ready(res)
            t0 = time.perf_counter()
            for _ in range(reps):
                res = fn(*args)
            jax.block_until_ready(res)
            ms = (time.perf_counter() - t0) / reps * 1e3
        except Exception as e:  # phases can be unsupported for a config
            printer(f"  {name:28s} unavailable ({type(e).__name__})")
            return None
        out[name] = ms
        printer(f"  {name:28s} {ms:9.3f} ms")
        return res

    printer("--debug timing: per-phase wall times")
    rb = jax.jit(lambda s: build_cells(grid, s))
    r = timeit("build_cells (sort+tables)", rb, state)
    if r is None:
        return out
    sstate, aux = r

    use_pallas = pallas_supported(fw, grid) and jax.default_backend() != "cpu"
    plan = None
    if use_pallas:
        plan = timeit(
            "build_block_plan", jax.jit(
                lambda s, a: build_block_plan(fw, grid, s, a)), sstate, aux)
        if plan is not None:
            timeit("pack (window+central)", jax.jit(
                lambda s, p: _pack_tables(fw, grid, s, p)), sstate, plan)
            f_out = timeit("forces (pallas)", jax.jit(
                lambda s, a, tb: compute_forces_pallas(fw, grid, s, a, table=tb)),
                sstate, aux, plan)
    else:
        f_out = timeit("forces (xla)", jax.jit(
            lambda s, a: compute_forces(fw, grid, s, a)), sstate, aux)
    if f_out is not None:
        timeit("euler_step", jax.jit(
            lambda s, f: euler_step(fw, s, f, jnp.float32(1e-5), step=1,
                                    grid=grid)), sstate, f_out)

    # the real fused chunk (ground truth)
    specs = tuple(bodies_specs)
    chunk = make_sim_chunk(fw, grid, bodies_specs=specs)
    bodies = init_bodies_state(specs, sstate)
    dt = jnp.float32(1e-5)

    def run_chunk(s, b):
        return chunk(s, dt, jnp.float32(0.0), jnp.int32(0), b)

    r = run_chunk(sstate, bodies)
    jax.block_until_ready(r[0].pos)
    t0 = time.perf_counter()
    s2, b2 = r[0], r[4]
    nrep = 3
    for _ in range(nrep):
        rr = run_chunk(s2, b2)
        s2, b2 = rr[0], rr[4]
    jax.block_until_ready(s2.pos)
    ms = (time.perf_counter() - t0) / nrep * 1e3
    nsteps = fw.sp.buildneibsfreq
    out["full chunk"] = ms
    n = int(jnp.sum(state.active))
    printer(f"  {'full chunk':28s} {ms:9.3f} ms "
            f"({ms / nsteps:.3f} ms/step, {n * nsteps / (ms / 1e3):.3e} ps/s)")
    return out


__all__ = ["phase_report"]
