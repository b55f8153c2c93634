#!/usr/bin/env python
"""Slope-harness measurement of in-kernel gather assembly (v3 decision).

The XLA row gather measured 10-26 GB/s (exp_v3.py) — per-pass XLA-gathered
neighbor lists are dead.  The remaining v3 candidate assembles per-octet
candidate tiles INSIDE the kernel from the block's chunked VMEM window:

  per octet-tile: idx [1,128] packed (chunk*128+lane); assembly =
  C x (take_along_axis + select) over the window chunks; then pair math
  on [8,128] (octet centrals vs 128 candidates).

Measured here (NB=2048 blocks of 64 centrals, window T chunks in VMEM):
  A1. single take_along_axis [16,128] (Mosaic dynamic_gather) cost
  A2. C-chunk assembly cost per tile, C = 4 / 8 / 12
  A3. octet e2e: assembly + light pair math, KT=2 tiles/octet (K=256)
      vs the direct-window baseline (same centrals, T=9..12 tiles)
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from exp_iter4 import phys_light, B, TS
from tpu_time import report, slope_ms

NB = 2048
T = 12  # window chunks per block


def pair8(cw, w):
    """Light pair math on [8,128] (octet centrals vs one candidate tile)."""
    cx = cw[0:3, :].reshape(3, 8, 1)
    nx = w[0:3, :].reshape(3, 1, TS)
    rel = cx - nx
    r2 = (rel * rel).sum(0)
    fm = ((r2 < 1.0) & (r2 > 0.0)).astype(jnp.float32)
    r = jnp.sqrt(jnp.minimum(r2, 1.0))
    t1 = 1.0 - 0.5 * r
    fK = t1 * t1 * t1 * (2 * r + 1)
    mfK = w[6].reshape(1, TS) * fK
    cv = cw[3:6, :].reshape(3, 8, 1)
    nv = w[3:6, :].reshape(3, 1, TS)
    vdp = ((cv - nv) * rel).sum(0)
    drdt = fm * vdp * mfK
    pg = cw[8].reshape(8, 1) + w[8].reshape(1, TS)
    s = -fm * pg * mfK
    return (drdt.sum(1, keepdims=True), (s * rel[0]).sum(1, keepdims=True),
            (s * rel[1]).sum(1, keepdims=True), (s * rel[2]).sum(1, keepdims=True))


def run_case(name, kern, ins, n_sites, specs, out_spec, out_shape):
    def run(c):
        w, acc = c
        o = pl.pallas_call(
            kern, grid=(NB,), in_specs=specs,
            out_specs=out_spec, out_shape=out_shape,
        )(w, *ins)
        return (w * 1.0000001, acc + o.sum() * 1e-30)

    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((NB, T, 16, TS)), jnp.float32)
    ms = slope_ms(run, (win, jnp.float32(0.0)))
    report(name, ms, per={"site": NB * n_sites, "central": NB * B})


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    # packed per-octet-tile indices: [NB, 8 octets, KT, 128] i32 =
    # chunk*TS + lane
    KT = 2
    idx = jnp.asarray(
        rng.integers(0, T * TS, size=(NB, 8, KT, 1, 128)), jnp.int32)
    cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)

    idx_spec = pl.BlockSpec((1, 8, KT, 1, 128), lambda b: (b, 0, 0, 0, 0))
    win_spec = pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0))
    cen_spec = pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))

    # --- A1: pure gathers, fixed chunk (no select chain) -------------------
    def kern_a1(win_ref, idx_ref, out_ref):
        acc = jnp.zeros((16, TS), jnp.float32)
        for g in range(8):
            for kt in range(KT):
                lane = jnp.broadcast_to(idx_ref[0, g, kt] % TS, (16, TS))
                for t in range(4):
                    acc = acc + jnp.take_along_axis(
                        win_ref[0, (g + t) % T], lane, axis=1)
        out_ref[0] = acc

    run_case("A1. pure take_along_axis x64/block", kern_a1, (idx,),
             8 * KT * 4,
             [win_spec, idx_spec],
             pl.BlockSpec((1, 16, TS), lambda b: (b, 0, 0)),
             jax.ShapeDtypeStruct((NB, 16, TS), jnp.float32))

    # --- A2: C-chunk assembly ----------------------------------------------
    def make_a2(C):
        def kern(win_ref, idx_ref, out_ref):
            acc = jnp.zeros((16, TS), jnp.float32)
            for g in range(8):
                for kt in range(KT):
                    pk = idx_ref[0, g, kt]
                    lane = jnp.broadcast_to(pk % TS, (16, TS))
                    csl = jnp.broadcast_to(pk // TS, (16, TS))
                    cols = jnp.zeros((16, TS), jnp.float32)
                    for ci in range(C):
                        gat = jnp.take_along_axis(
                            win_ref[0, ci % T], lane, axis=1)
                        cols = jnp.where(csl == ci, gat, cols)
                    acc = acc + cols
            out_ref[0] = acc
        return kern

    for C in (4, 8, 12):
        run_case(f"A2. C={C} assembly x16 tiles/block", make_a2(C), (idx,),
                 8 * KT,
                 [win_spec, idx_spec],
                 pl.BlockSpec((1, 16, TS), lambda b: (b, 0, 0)),
                 jax.ShapeDtypeStruct((NB, 16, TS), jnp.float32))

    # --- A3: octet e2e assembly + pair math --------------------------------
    def make_a3(C):
        def kern(win_ref, idx_ref, cen_ref, out_ref):
            for g in range(8):
                cw = cen_ref[0][:, g * 8:(g + 1) * 8]
                parts = None
                for kt in range(KT):
                    pk = idx_ref[0, g, kt]
                    lane = jnp.broadcast_to(pk % TS, (16, TS))
                    csl = jnp.broadcast_to(pk // TS, (16, TS))
                    cols = jnp.zeros((16, TS), jnp.float32)
                    for ci in range(C):
                        gat = jnp.take_along_axis(
                            win_ref[0, ci % T], lane, axis=1)
                        cols = jnp.where(csl == ci, gat, cols)
                    o = pair8(cw, cols)
                    parts = o if parts is None else tuple(
                        a + b for a, b in zip(parts, o))
                out_ref[0, g] = jnp.concatenate(parts, axis=1)
        return kern

    for C in (8, 12):
        run_case(f"A3. octet e2e C={C} KT={KT} (K=256/octet)", make_a3(C),
                 (idx, cen), 8 * KT,
                 [win_spec, idx_spec, cen_spec],
                 pl.BlockSpec((1, 8, 8, 4), lambda b: (b, 0, 0, 0)),
                 jax.ShapeDtypeStruct((NB, 8, 8, 4), jnp.float32))

    # --- A4: direct-window baseline (same light mix, B=64 sites) ------------
    def kern_a4(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]
        parts = None
        for t in range(T):
            o = phys_light(cw, win_ref[0, t])
            parts = o[:4] if parts is None else tuple(
                a + b.sum(1, keepdims=True) for a, b in zip(parts, o[:4]))
        # phys_light returns unreduced [B,TS]? no: returns products; reduce
        out_ref[0] = jnp.concatenate(parts, axis=1)

    def kern_a4b(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]
        accs = [jnp.zeros((B, 1), jnp.float32) for _ in range(4)]
        for t in range(T):
            o = phys_light(cw, win_ref[0, t])
            accs = [a + x.sum(1, keepdims=True) for a, x in zip(accs, o[:4])]
        out_ref[0] = jnp.concatenate(accs, axis=1)

    run_case(f"A4. direct window T={T} (B=64 sites)", kern_a4b, (cen,), T,
             [win_spec, cen_spec],
             pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
             jax.ShapeDtypeStruct((NB, B, 4), jnp.float32))


if __name__ == "__main__":
    main()
