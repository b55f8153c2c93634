#!/usr/bin/env python
"""TPU gather-throughput experiments for the neighbor-list forces design.

The round-3 question: can a per-particle neighbor list (the reference's
design, `buildneibs_kernel.cu:1029`) beat the dense block-window Pallas
kernel on TPU?  That hinges on the cost of gathering neighbor properties
per pair per pass — GPUs get this from the texture cache; on TPU it must
be an XLA gather (or an in-kernel VMEM gather, if Mosaic lowers one).

Each stage is independently guarded; timings chain iterations with a data
dependency inside one jit (the axon tunnel dedupes repeated identical
calls, so naive rep loops measure nothing).
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 131072  # particles
K = 128     # neighbor slots per particle
S = 167936  # slot-table size (N * 1.28, tile-rounded)
F = 16      # fields


def chain_time(name, step, init, reps=8):
    """step: carry -> carry, jitted; chains `reps` dependent calls."""
    try:
        f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, c: step(c, i), c))
        c = f(init)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = f(c)
        jax.block_until_ready(c)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:44s} {ms:9.3f} ms", flush=True)
        return ms
    except Exception:
        print(f"{name:44s} FAILED", flush=True)
        traceback.print_exc()
        return None


def main():
    dev = jax.devices()[0]
    print(f"device={dev}", flush=True)
    rng = np.random.default_rng(0)

    # realistic locality: indices point near the owner's slot region
    base = (np.arange(N, dtype=np.int64) * S // N)[:, None]
    jitter = rng.integers(-600, 600, size=(N, K))
    idx_np = np.clip(base + jitter, 0, S - 1).astype(np.int32)
    idx = jnp.asarray(idx_np)                      # [N, K]
    tab1 = jnp.asarray(rng.standard_normal(S), jnp.float32)          # [S]
    tabF = jnp.asarray(rng.standard_normal((S, F)), jnp.float32)     # [S, F]
    tab128 = jnp.asarray(rng.standard_normal((S // 8, 128)), jnp.float32)
    idx_oct = jnp.asarray((idx_np[:, ::4] // 8) % (S // 8))          # [N, K/4]

    # 1) 1D gather, 10 fields' worth of traffic
    def g1(c, i):
        out = tab1[(idx + i) % S]                  # [N, K]
        for _ in range(9):
            out = out + tab1[(idx + out.astype(jnp.int32) % 3) % S]
        return c + out.sum()
    chain_time("1D gather x10 fields [N,K]", g1, jnp.float32(0), reps=4)

    # 2) row gather [S,16] -> [N,K,16]
    def g2(c, i):
        rows = tabF[(idx + i) % S]                 # [N, K, F]
        return c + rows.sum()
    chain_time("row gather [S,16] -> [N,K,16]", g2, jnp.float32(0), reps=4)

    # 3) row gather at octet granularity (128-lane rows)
    def g3(c, i):
        rows = tab128[(idx_oct + i) % (S // 8)]    # [N, K/4, 128]
        return c + rows.sum()
    chain_time("octet row gather [S/8,128] -> [N,K/4,128]", g3, jnp.float32(0), reps=4)

    # 4) full neighbor-list forces pass prototype (10 gathered fields +
    #    representative pair math + K-sum)
    posm = jnp.asarray(rng.standard_normal((S, 8)), jnp.float32)
    velp = jnp.asarray(rng.standard_normal((S, 8)), jnp.float32)
    cpos = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)

    def forces_proto(c, i):
        ii = (idx + i) % S
        a = posm[ii]                               # [N,K,8]
        b = velp[ii]                               # [N,K,8]
        rel = cpos[:, None, :3] - a[..., :3]
        r2 = (rel * rel).sum(-1)
        mask = r2 < 1.0
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        fK = (1 - 0.5 * r) ** 3 * (1 + 1.5 * r)    # kernel-ish
        relv = cpos[:, None, 3:6] - b[..., :3]
        vdp = (relv * rel).sum(-1)
        s = jnp.where(mask, (a[..., 6] + b[..., 6]) * fK * a[..., 7], 0.0)
        art = jnp.where(vdp < 0, vdp / (r2 + 0.01), 0.0) * fK
        drdt = jnp.where(mask, vdp * fK * a[..., 7], 0.0)
        out = jnp.stack([
            drdt.sum(-1),
            (s * rel[..., 0] + art * relv[..., 0]).sum(-1),
            (s * rel[..., 1] + art * relv[..., 1]).sum(-1),
            (s * rel[..., 2] + art * relv[..., 2]).sum(-1),
        ], -1)
        return c + out.sum()
    chain_time("forces-proto gather+pairmath [N,K]", forces_proto,
               jnp.float32(0), reps=4)

    # 5) neighbor-list build: top_k compaction from a 512-candidate window
    W = 512
    cand = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)

    def build_topk(c, i):
        key = cand + i * 0.001
        v, ix = jax.lax.top_k(key, K)
        return c + v.sum() + ix.sum()
    chain_time(f"top_k({K}) compaction [N,{W}]", build_topk, jnp.float32(0), reps=2)

    # 5b) sort-based compaction
    def build_sort(c, i):
        key = cand + i * 0.001
        sk = jnp.sort(key, axis=-1)
        return c + sk[:, :K].sum()
    chain_time(f"sort compaction [N,{W}]", build_sort, jnp.float32(0), reps=2)

    # 6) argsort at 1M and 8M (counting-sort question)
    for M in (1 << 20, 1 << 23):
        keys = jnp.asarray(rng.integers(0, 1 << 20, size=M), jnp.int32)

        def srt(c, i, keys=keys):
            o = jnp.argsort(keys + i)
            return c + o[::4096].sum()
        chain_time(f"argsort {M>>20}M i32", srt, jnp.int32(0), reps=2)

    # 7) in-Pallas VMEM gather probe: take_along_axis on the lane dim
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(win_ref, idx_ref, out_ref):
            win = win_ref[...]                     # [16, 1024]
            ix = idx_ref[...]                      # [16, 128]
            out_ref[...] = jnp.take_along_axis(win, ix, axis=1)

        win = jnp.asarray(rng.standard_normal((16, 1024)), jnp.float32)
        ixk = jnp.asarray(rng.integers(0, 1024, size=(16, 128)), jnp.int32)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        )(win, ixk)
        ok = np.allclose(np.asarray(out),
                         np.take_along_axis(np.asarray(win), np.asarray(ixk), 1))
        print(f"pallas take_along_axis(lane): LOWERS ok={ok}", flush=True)

        big_win = jnp.asarray(rng.standard_normal((256, 8, 1024)), jnp.float32)
        big_ix = jnp.asarray(rng.integers(0, 1024, size=(256, 8, 512)), jnp.int32)

        def kern2(win_ref, idx_ref, out_ref):
            out_ref[...] = jnp.take_along_axis(
                win_ref[0], idx_ref[0], axis=1)[None]

        def tga(c, i):
            o = pl.pallas_call(
                kern2,
                grid=(256,),
                in_specs=[
                    pl.BlockSpec((1, 8, 1024), lambda g: (g, 0, 0)),
                    pl.BlockSpec((1, 8, 512), lambda g: (g, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 8, 512), lambda g: (g, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((256, 8, 512), jnp.float32),
            )(big_win + i * 0.0, big_ix)
            return c + o.sum()
        chain_time("pallas lane-gather [256x8x1024]->512", tga,
                   jnp.float32(0), reps=4)
    except Exception:
        print("pallas take_along_axis: NOT SUPPORTED", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()
