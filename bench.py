#!/usr/bin/env python
"""Benchmark: DamBreak3D particle-steps/second on the available device.

Prints ONE JSON line:
  {"metric": "particle_steps_per_sec", "value": N, "unit": "...",
   "vs_baseline": N/1e9, "curve": [...], ...}

Timing methodology (round 5): on the tunneled (axon) TPU,
``jax.block_until_ready`` does NOT block and identical dispatches are
memoized, so naive wall-clock timing is untrustworthy (see
scripts/tpu_time.py).  Every number here is therefore measured with the
slope method: R chunk steps are chained inside ONE jitted fori_loop whose
carry feeds forward (no dedup), completion is forced with a dependent host
fetch, and the per-chunk time is the marginal slope between two rep counts
— subtracting dispatch overhead and fetch latency exactly.  The old
sequential-dispatch number is reported alongside as ``host_loop_*`` for
cross-checking.

The headline value is the largest problem size that fits; the ``curve``
field records rate + rebuild ms/step per size (129k .. 4M), the rate curve
BASELINE.md asks for.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE = 1e9  # BASELINE.json north star: 1e9 particle-steps/s/chip

# dp -> approx particle count for DamBreak3D (N ~ dp^-3)
DEFAULT_SIZES = [0.012, 0.0077, 0.0061]
if os.environ.get("BENCH_4M"):
    DEFAULT_SIZES.append(0.0039)


def _fetch(x):
    import numpy as np

    return np.asarray(x.reshape(-1)[:1] if hasattr(x, "reshape") else x)


def bench_size(dp):
    """Measure one problem size; returns a result dict."""
    import jax
    import jax.numpy as jnp

    from gpusph_tpu.bodies import init_bodies_state
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.ops.neighbors import build_cells
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("DamBreak3D")(dict(deltap=dp))
    grid, state = P.build()
    n = int(state.count_active())

    sim = Simulator(P.fw, grid, bodies_specs=P.body_specs())
    dt = jnp.float32(sim.initial_dt(state))
    t = jnp.float32(0.0)
    it = jnp.int32(0)
    bodies = init_bodies_state(sim.bodies_specs, state)
    nsteps = P.fw.sp.buildneibsfreq

    # settle two chunks so the flow is representative, and check validity
    state, dt, t, it, bodies, stats = sim._chunk(state, dt, t, it, bodies)
    state, dt, t, it, bodies, stats = sim._chunk(state, dt, t, it, bodies)
    sim._check(jax.device_get(stats))

    # ---- slope-method chunk timing -------------------------------------
    def one(c):
        s, d, tt, i, b = c
        s, d, tt, i, b, _ = sim._chunk(s, d, tt, i, b)
        return (s, d, tt, i, b)

    def chained(R):
        return jax.jit(
            lambda c: jax.lax.fori_loop(0, R, lambda _, c: one(c), c)
        )

    r1, r2 = 1, 4
    f1, f2 = chained(r1), chained(r2)
    c0 = (state, dt, t, it, bodies)
    ca = f1(c0)
    _fetch(ca[0].pos)  # compile + warm f1
    cb = f2(ca)
    _fetch(cb[0].pos)  # compile + warm f2 (distinct inputs: evolved carry)
    t0 = time.perf_counter()
    ca2 = f1(cb)
    _fetch(ca2[0].pos)
    t1 = time.perf_counter()
    cb2 = f2(ca2)
    _fetch(cb2[0].pos)
    t2 = time.perf_counter()
    chunk_s = ((t2 - t1) - (t1 - t0)) / (r2 - r1)
    rate = n * nsteps / chunk_s

    # ---- old host-loop method (cross-check; includes dispatch overhead) -
    c = cb2
    t0 = time.perf_counter()
    for _ in range(3):
        c = one(c)
    _fetch(c[0].pos)
    host_s = (time.perf_counter() - t0) / 3
    host_rate = n * nsteps / host_s

    # ---- neighbor rebuild, slope method with fresh inputs each rep ------
    def rb_one(s):
        s2, _ = build_cells(grid, s)
        # perturb so the next rep's input bytes differ (no memoization)
        return s2.replace(pos=s2.pos * jnp.float32(1.0 + 1e-7))

    def rb_chained(R):
        return jax.jit(
            lambda s: jax.lax.fori_loop(0, R, lambda _, s: rb_one(s), s)
        )

    g1, g2 = rb_chained(2), rb_chained(8)
    s0 = c[0]
    sa = g1(s0)
    _fetch(sa.pos)
    sb = g2(sa)
    _fetch(sb.pos)
    t0 = time.perf_counter()
    sa2 = g1(sb)
    _fetch(sa2.pos)
    t1 = time.perf_counter()
    sb2 = g2(sa2)
    _fetch(sb2.pos)
    t2 = time.perf_counter()
    rebuild_ms = ((t2 - t1) - (t1 - t0)) / 6 * 1e3

    return {
        "deltap": dp,
        "particles": n,
        "particle_steps_per_sec": rate,
        "chunk_s": chunk_s,
        "steps_per_chunk": nsteps,
        "host_loop_rate": host_rate,
        "host_vs_slope": host_rate / rate,
        "rebuild_ms": rebuild_ms,
        "rebuild_ms_per_step": rebuild_ms / nsteps,
    }


def main():
    import jax

    sizes = [float(s) for s in os.environ.get(
        "BENCH_DELTAPS", ",".join(str(s) for s in DEFAULT_SIZES)).split(",")]

    curve = []
    for dp in sizes:
        try:
            r = bench_size(dp)
            curve.append(r)
            print(
                f"# dp={dp} n={r['particles']} "
                f"{r['particle_steps_per_sec']/1e6:.2f}M ps/s "
                f"(host-loop {r['host_loop_rate']/1e6:.2f}M) "
                f"rebuild {r['rebuild_ms']:.2f} ms",
                file=sys.stderr, flush=True,
            )
        except Exception as e:  # OOM / overflow at a size: keep the rest
            print(f"# dp={dp} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if not curve:
        raise SystemExit("no benchmark size succeeded")

    head = max(curve, key=lambda r: r["particles"])
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec",
                "value": head["particle_steps_per_sec"],
                "unit": "particle-steps/s",
                "vs_baseline": head["particle_steps_per_sec"] / BASELINE,
                "particles": head["particles"],
                "method": "slope (chained fori_loop, dependent fetch)",
                "host_loop_rate": head["host_loop_rate"],
                "neighbor_rebuild_ms": head["rebuild_ms"],
                "rebuild_ms_per_step": head["rebuild_ms_per_step"],
                "curve": [
                    {k: r[k] for k in (
                        "deltap", "particles", "particle_steps_per_sec",
                        "rebuild_ms_per_step", "host_loop_rate")}
                    for r in curve
                ],
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
