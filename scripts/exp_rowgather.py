#!/usr/bin/env python
"""Measure XLA gather throughput for per-pass packed-window assembly.

The v3 packed-window forces design needs, once per forces pass, a gather of
``M = n_blocks*K`` particle property rows (16 f32 fields) out of the [N+1,16]
table into per-block dense windows.  The in-kernel per-lane gather was
measured at ~888ns per [16,128] tile (exp_dyngather2) = 6.9 ns/row — too
slow.  This measures what plain XLA gathers cost on the same chip:

  a. row gather   [N,16] f32, idx[M]          -> [M,16]
  b. row gather + minor transpose to [M/128, 16, 128]
  c. 16x element gather [N] f32, idx[M]       -> [16, M] (pre-transposed)
  d. row gather of packed 64B rows as [N, 8] f64-ish (i64x8) view? (skip)
  e. one-hot matmul assembly (MXU): [M,N_tile] @ [N_tile,16] (skip: N too big)
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, tab, idx, reps=10):
    # chain: each rep's table depends on the previous output so nothing
    # overlaps/dedupes; cost per rep = one gather + one cheap elementwise
    def chained(t, i):
        def body(_, carry):
            t = carry
            o = fn(t, i)
            # non-factorable consumer: weight by a position-dependent ramp so
            # reduce(gather) can't be rewritten as gather(row-reduce)
            w = jax.lax.broadcasted_iota(
                jnp.float32, o.shape, 0) * 1e-9 + 1.0
            bump = jnp.float32((o * w).sum() * 1e-30)
            return t + bump
        return jax.lax.fori_loop(0, reps, body, t)

    f = jax.jit(chained)
    # warmup, then time with the warmup's OUTPUT as input — the axon tunnel
    # memoizes identical (executable, input) pairs, so inputs must differ
    t1 = f(tab, idx)
    jax.block_until_ready(t1)
    t0 = time.perf_counter()
    o = f(t1, idx)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / reps * 1e3
    return ms


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    for N, mult in ((129_000, 8), (1_000_000, 8), (1_000_000, 4)):
        M = (N * mult // 512) * 512
        tab = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, size=(M,)), jnp.int32)
        # locality-friendly variant: windows index mostly-nearby rows
        base = np.repeat(np.arange(0, N, max(1, N // (M // 512))), 512)[:M]
        idxl = jnp.asarray(
            (base + rng.integers(0, 2048, size=(M,))) % N, jnp.int32)

        if N == 129_000:
            big = jnp.asarray(rng.standard_normal((M, 16)), jnp.float32)
            ms0 = bench("copy", lambda t, i: t * 1.000001, big, idx)
            print(f"  baseline elementwise over [M,16] ({M*64/1e6:.0f} MB r+w):"
                  f" {ms0:8.3f} ms  {2*M*64/ms0/1e6:7.1f} GB/s", flush=True)

        ms_a = bench("a", lambda t, i: t[i], tab, idx)
        gbs = M * 64 / ms_a / 1e6
        print(f"N={N} M={M}  a. row gather [M,16]      "
              f"{ms_a:8.3f} ms  {gbs:7.1f} GB/s", flush=True)

        ms_al = bench("al", lambda t, i: t[i], tab, idxl)
        gbs = M * 64 / ms_al / 1e6
        print(f"N={N} M={M}  a'. local row gather      "
              f"{ms_al:8.3f} ms  {gbs:7.1f} GB/s", flush=True)

        ms_b = bench(
            "b", lambda t, i: t[i].reshape(M // 128, 128, 16)
            .transpose(0, 2, 1), tab, idx)
        gbs = M * 64 / ms_b / 1e6
        print(f"N={N} M={M}  b. row gather+transpose   "
              f"{ms_b:8.3f} ms  {gbs:7.1f} GB/s", flush=True)

        tabT = tab.T  # [16, N]
        ms_c = bench("c", lambda t, i: t[:, i], tabT, idx)
        gbs = M * 64 / ms_c / 1e6
        print(f"N={N} M={M}  c. 16x element gather     "
              f"{ms_c:8.3f} ms  {gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
