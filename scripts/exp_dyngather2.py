#!/usr/bin/env python
"""Round 2 of the in-kernel gather measurements (forces v3 design).

Questions:
  1. pure dynamic_gather throughput (no select chain) — cycles per
     [16,128] gather;
  2. C-chunk assembly: candidates sorted by source chunk, each output tile
     reads a *static* C source chunks with gather + mask-select;
  3. the same with pair math attached, vs direct window compute (fixed
     kernels — no VMEM-accumulator scatter).
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
        print(f"{name:56s} {ms:9.3f} ms", flush=True)
        return ms
    except Exception:
        print(f"{name:56s} FAILED", flush=True)
        traceback.print_exc()
        return None


T = 24     # window chunks per block
NB = 256   # blocks
BPG = 8    # octets per block (64 centrals)
KT = 2     # candidate tiles per octet (K = 256)
C = 8      # source chunks per candidate tile
N = NB * BPG * 8


def main():
    print(f"device={jax.devices()[0]}  N={N}", flush=True)
    rng = np.random.default_rng(0)

    win = jnp.asarray(rng.standard_normal((NB, T, 16, 128)), jnp.float32)
    cen = jnp.asarray(rng.standard_normal((NB, BPG, 16, 8)), jnp.float32)
    # per-(octet, tile): lane indices [16,128] (pre-broadcast), per-lane
    # chunk slot in [0,C), and the C source chunk ids (SMEM scalars)
    ln = rng.integers(0, 128, size=(NB, BPG, KT, 1, 128))
    ln16 = np.broadcast_to(ln, (NB, BPG, KT, 16, 128)).copy()
    lane_idx = jnp.asarray(ln16, jnp.int32)
    cslot = jnp.asarray(
        np.broadcast_to(rng.integers(0, C, size=(NB, BPG, KT, 1, 128)),
                        (NB, BPG, KT, 16, 128)).copy(), jnp.int32)
    chunk_ids = jnp.asarray(rng.integers(0, T, size=(NB, BPG, KT, C)), jnp.int32)

    # --- 1. pure gather chain -------------------------------------------
    def kern1(win_ref, idx_ref, out_ref):
        acc = jnp.zeros((16, 128), jnp.float32)
        for g in range(BPG):
            for kt in range(KT):
                idx = idx_ref[0, g, kt]
                for t in range(8):  # 8 fixed-chunk gathers, no select
                    acc = acc + jnp.take_along_axis(win_ref[0, t], idx, axis=1)
        out_ref[0] = acc

    def run1(c, i):
        o = pl.pallas_call(
            kern1,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 16, 128), lambda b: (b, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 16, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, 16, 128), jnp.float32),
        )(win + i * 0.0, lane_idx)
        return c + o.sum()

    ms = chain_time(f"1. pure gather x{BPG*KT*8}/block", run1, jnp.float32(0))
    if ms:
        n_g = NB * BPG * KT * 8
        print(f"   -> {ms*1e6/n_g:.1f} ns per [16,128] gather", flush=True)

    # --- 2. C-chunk assembly (gather + mask-select) ----------------------
    def assemble(win_ref, idx, csl, cid_ref, g, kt):
        cols = jnp.zeros((16, 128), jnp.float32)
        for ci in range(C):
            t = cid_ref[0, g, kt, ci]
            gat = jnp.take_along_axis(win_ref[0, t], idx, axis=1)
            cols = jnp.where(csl == ci, gat, cols)
        return cols

    def kern2(win_ref, idx_ref, cslot_ref, cid_ref, out_ref):
        acc = jnp.zeros((16, 128), jnp.float32)
        for g in range(BPG):
            for kt in range(KT):
                acc = acc + assemble(
                    win_ref, idx_ref[0, g, kt], cslot_ref[0, g, kt],
                    cid_ref, g, kt)
        out_ref[0] = acc

    def run2(c, i):
        o = pl.pallas_call(
            kern2,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 16, 128), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 16, 128), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, C), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 16, 128), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, 16, 128), jnp.float32),
        )(win + i * 0.0, lane_idx, cslot, chunk_ids)
        return c + o.sum()

    ms2 = chain_time(f"2. C={C}-chunk assembly ({BPG*KT}/block)", run2,
                     jnp.float32(0))
    if ms2:
        print(f"   -> {ms2*1e6/(NB*BPG*KT):.1f} ns per [16,128] tile "
              f"assembled", flush=True)

    # --- 3. assembly + pair math vs direct window ------------------------
    def pair_math(cw, colsT):
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
        return (drdt.sum(1), (s * rel[0]).sum(1), (s * rel[1]).sum(1),
                (s * rel[2]).sum(1))

    def kern3(win_ref, idx_ref, cslot_ref, cid_ref, cen_ref, out_ref):
        for g in range(BPG):
            cw = cen_ref[0, g]
            parts = None
            for kt in range(KT):
                cols = assemble(win_ref, idx_ref[0, g, kt],
                                cslot_ref[0, g, kt], cid_ref, g, kt)
                o = pair_math(cw, cols)
                parts = o if parts is None else tuple(
                    a + b for a, b in zip(parts, o))
            out_ref[0, g] = jnp.stack(parts, axis=0)  # [4, 8]

    def run3(c, i):
        o = pl.pallas_call(
            kern3,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 16, 128), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, 16, 128), lambda b: (b, 0, 0, 0, 0)),
                pl.BlockSpec((1, BPG, KT, C), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, BPG, 16, 8), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BPG, 4, 8), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, BPG, 4, 8), jnp.float32),
        )(win + i * 0.0, lane_idx, cslot, chunk_ids, cen)
        return c + o.sum()

    ms3 = chain_time(f"3. v3 forces: assembly+pair K={KT*128}/octet", run3,
                     jnp.float32(0))

    # --- 4. direct window compute baseline -------------------------------
    def kern4(win_ref, cen_ref, out_ref):
        for g in range(BPG):
            cw = cen_ref[0, g]
            parts = None
            for t in range(T):
                o = pair_math(cw, win_ref[0, t])
                parts = o if parts is None else tuple(
                    a + b for a, b in zip(parts, o))
            out_ref[0, g] = jnp.stack(parts, axis=0)

    def run4(c, i):
        o = pl.pallas_call(
            kern4,
            grid=(NB,),
            in_specs=[
                pl.BlockSpec((1, T, 16, 128), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, BPG, 16, 8), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, BPG, 4, 8), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, BPG, 4, 8), jnp.float32),
        )(win + i * 0.0, cen)
        return c + o.sum()

    ms4 = chain_time(f"4. direct window T*128={T*128} slots/octet", run4,
                     jnp.float32(0))
    if ms3 and ms4:
        print(f"   v3 speedup vs direct on equal central count: "
              f"{ms4/ms3:.2f}x  (slots {T*128} -> {KT*128})", flush=True)


if __name__ == "__main__":
    main()
