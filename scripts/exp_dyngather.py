#!/usr/bin/env python
"""In-kernel dynamic_gather prototype for the forces-v3 neighbor-list design.

Measures, on the attached TPU:
  A. whether take_along_axis([16,128], idx[16,128], axis=1) lowers in Mosaic
     (tpu.dynamic_gather along lanes), and for [16,256];
  B. chunk-scan gather throughput: assemble [16,128] candidate tiles from a
     T-chunk VMEM window via gather+select, vs
  C. direct window pair-compute (the current forces kernel's inner loop).

The decision number: (B + pair math on K slots) vs (C on T*TS slots).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(name, fn, init, reps=8):
    try:
        f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, c: fn(c, i), c))
        c = f(init)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = f(c)
        jax.block_until_ready(c)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:52s} {ms:9.3f} ms", flush=True)
        return ms
    except Exception:
        print(f"{name:52s} FAILED", flush=True)
        traceback.print_exc()
        return None


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # --- A: correctness probes --------------------------------------------
    for L in (128, 256):
        try:
            def kern(x_ref, i_ref, o_ref):
                o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

            x = jnp.asarray(rng.standard_normal((16, L)), jnp.float32)
            ix = jnp.asarray(rng.integers(0, L, size=(16, L)), jnp.int32)
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((16, L), jnp.float32)
            )(x, ix)
            ok = np.array_equal(
                np.asarray(out),
                np.take_along_axis(np.asarray(x), np.asarray(ix), 1),
            )
            print(f"take_along_axis [16,{L}] lanes: LOWERS ok={ok}", flush=True)
        except Exception as e:
            print(f"take_along_axis [16,{L}] lanes: FAILED "
                  f"({type(e).__name__})", flush=True)

    # sublane-dim gather probe
    try:
        def kernS(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

        x = jnp.asarray(rng.standard_normal((32, 128)), jnp.float32)
        ix = jnp.asarray(rng.integers(0, 32, size=(32, 128)), jnp.int32)
        out = pl.pallas_call(
            kernS, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32)
        )(x, ix)
        ok = np.array_equal(
            np.asarray(out), np.take_along_axis(np.asarray(x), np.asarray(ix), 0)
        )
        print(f"take_along_axis [32,128] SUBLANES: LOWERS ok={ok}", flush=True)
    except Exception as e:
        print(f"take_along_axis [32,128] SUBLANES: FAILED ({type(e).__name__})",
              flush=True)

    # --- B/C: throughput --------------------------------------------------
    # A realistic block: G groups (octets of 8 centrals), window of T chunks
    # of [16,128]; each group has KT candidate tiles, each candidate knows
    # (chunk, lane).  Grid iterates blocks to reach N=131072 particles.
    T = 24          # window chunks per block
    NB = 256        # blocks
    BPG = 8         # groups (octets) per block => 64 centrals/block
    KT = 2          # candidate tiles per group (K=256 cand/group)
    N = NB * BPG * 8

    win = jnp.asarray(rng.standard_normal((NB, T, 16, 128)), jnp.float32)
    # candidate (chunk, lane) tables: [NB, BPG, KT, 2, 128] i32
    ch = rng.integers(0, T, size=(NB, BPG, KT, 1, 128))
    ln = rng.integers(0, 128, size=(NB, BPG, KT, 1, 128))
    cand = jnp.asarray(np.concatenate([ch, ln], axis=3), jnp.int32)
    cen = jnp.asarray(rng.standard_normal((NB, BPG, 16, 8)), jnp.float32)

    def pair_math(cw, colsT):
        # representative pair physics: ~50 flops per (central, cand)
        # cw: [16, 8] central fields; colsT: [16, 128] candidate fields
        cx = cw[0:3, :].reshape(3, 8, 1)
        nx = colsT[0:3, :].reshape(3, 1, 128)
        rel = cx - nx
        r2 = (rel * rel).sum(0)
        mask = r2 < 1.0
        r = jnp.sqrt(jnp.maximum(r2, 1e-12))
        fK = (1 - 0.5 * r) ** 3 * (2 * r + 1)
        cv = cw[3:6, :].reshape(3, 8, 1)
        nv = colsT[3:6, :].reshape(3, 1, 128)
        vdp = ((cv - nv) * rel).sum(0)
        m = colsT[6].reshape(1, 128)
        s = jnp.where(mask, (cw[7].reshape(8, 1) + colsT[7].reshape(1, 128))
                      * fK * m, 0.0)
        drdt = jnp.where(mask, vdp * fK * m, 0.0)
        return (drdt.sum(1, keepdims=True),
                (s * rel[0]).sum(1, keepdims=True),
                (s * rel[1]).sum(1, keepdims=True),
                (s * rel[2]).sum(1, keepdims=True))

    # B: gather-then-compute
    def kernB(win_ref, cand_ref, cen_ref, out_ref):
        acc = jnp.zeros((BPG * 8, 4), jnp.float32)
        for g in range(BPG):
            cw = cen_ref[0, g]                           # [16, 8]
            og = []
            for kt in range(KT):
                chv = cand_ref[0, g, kt, 0]              # [128] i32
                lnv = cand_ref[0, g, kt, 1]              # [128]
                idx = jnp.broadcast_to(lnv.reshape(1, 128), (16, 128))
                colsT = jnp.zeros((16, 128), jnp.float32)
                for t in range(T):
                    gat = jnp.take_along_axis(win_ref[0, t], idx, axis=1)
                    colsT = jnp.where(
                        jnp.broadcast_to((chv == t).reshape(1, 128), (16, 128)),
                        gat, colsT)
                og.append(pair_math(cw, colsT))
            sums = [sum(parts) for parts in zip(*og)]    # 4 x [8,1]
            acc = acc.at[g * 8:(g + 1) * 8, :].set(
                jnp.concatenate(sums, axis=1))
        out_ref[0] = acc

    def runB(c, i):
        o = pl.pallas_call(
            kernB,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 2, 128), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, BPG, 16, 8), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BPG * 8, 4), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, BPG * 8, 4), jnp.float32),
        )(win + i * 0.0, cand, cen)
        return c + o.sum()

    msB = chain_time(f"B gather+pair K={KT*128}/octet (N={N})", runB,
                     jnp.float32(0), reps=4)

    # C: direct window compute (all centrals x all chunks)
    def kernC(win_ref, cen_ref, out_ref):
        acc = jnp.zeros((BPG * 8, 4), jnp.float32)
        for g in range(BPG):
            cw = cen_ref[0, g]
            parts = None
            for t in range(T):
                o = pair_math(cw, win_ref[0, t])
                parts = o if parts is None else tuple(
                    a + b for a, b in zip(parts, o))
            acc = acc.at[g * 8:(g + 1) * 8, :].set(
                jnp.concatenate(parts, axis=1))
        out_ref[0] = acc

    def runC(c, i):
        o = pl.pallas_call(
            kernC,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, 16, 8), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BPG * 8, 4), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, BPG * 8, 4), jnp.float32),
        )(win + i * 0.0, cen)
        return c + o.sum()

    msC = chain_time(f"C direct window T*128={T*128} slots/central", runC,
                     jnp.float32(0), reps=4)

    if msB and msC:
        print(f"slots/particle: B={KT*128} (+gather), C={T*128}; "
              f"speedup C/B = {msC/msB:.2f}x", flush=True)

    # B2: gather with per-candidate-tile chunk-range skipping is the next
    # refinement; measure the gather alone to see its share
    def kernG(win_ref, cand_ref, out_ref):
        acc = jnp.zeros((16, 128), jnp.float32)
        for g in range(BPG):
            for kt in range(KT):
                chv = cand_ref[0, g, kt, 0]
                lnv = cand_ref[0, g, kt, 1]
                idx = jnp.broadcast_to(lnv.reshape(1, 128), (16, 128))
                colsT = jnp.zeros((16, 128), jnp.float32)
                for t in range(T):
                    gat = jnp.take_along_axis(win_ref[0, t], idx, axis=1)
                    colsT = jnp.where(
                        jnp.broadcast_to((chv == t).reshape(1, 128), (16, 128)),
                        gat, colsT)
                acc = acc + colsT
        out_ref[0] = acc

    def runG(c, i):
        o = pl.pallas_call(
            kernG,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 2, 128), lambda b: (b, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 16, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, 16, 128), jnp.float32),
        )(win + i * 0.0, cand)
        return c + o.sum()

    chain_time("gather alone (no pair math)", runG, jnp.float32(0), reps=4)


if __name__ == "__main__":
    main()
