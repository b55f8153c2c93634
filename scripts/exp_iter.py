#!/usr/bin/env python
"""Decisive iteration-structure experiment for the v3 forces kernel.

Recovered round-3/4 facts (slope harness, v5e via axon):
  * production pass 16.8 ms @129k (3688 blocks x ~8.4 chunk-iters) = ~542 ns/iter
  * synthetic pair math (~50 ops): 537 ns/iter @TS=128, 561 ns/iter @TS=256
    -> per-iteration cost is FLAT in TS and in op count => fixed overhead rules.

This experiment isolates WHERE the ~540 ns goes:
  A. trivial kernel, production-shaped grid         -> per-program overhead
  B. fori_loop + dynamic win[t] (production shape)  -> baseline
  C. fori_loop + static win index                   -> dynamic-index cost
  D. python-unrolled static loop                    -> fori_loop cost
  E. flat slab (one [16, T*TS] window, no loop)     -> max vectorization
  F. TS sweep 256/512/1024 at fixed total slots
  G. half op-mix at best structure                  -> VPU-bound or not
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
from tpu_time import report, slope_ms

B = 64
NB = 2048  # 131072 centrals


def pair_math(cw, w, TS, ops="full"):
    """~production F1 physics op mix. cw [16,B] centrals, w [16,TS]."""
    f32 = jnp.float32
    cx = cw[0:3, :].reshape(3, B, 1)
    nx = w[0:3, :].reshape(3, 1, TS)
    rel = cx - nx
    r2 = (rel * rel).sum(0)
    mask = (r2 < 1.0) & (r2 > 0.0)
    fm = mask.astype(f32)
    r = jnp.sqrt(jnp.minimum(r2, 1.0))
    t1 = 1.0 - 0.5 * r
    fK = t1 * t1 * t1 * (2 * r + 1)
    m_n = w[6].reshape(1, TS)
    mfK = m_n * fK
    cv = cw[3:6, :].reshape(3, B, 1)
    nv = w[3:6, :].reshape(3, 1, TS)
    relv = cv - nv
    vdp = (relv * rel).sum(0)
    drdt = fm * vdp * mfK
    if ops == "half":
        s = -fm * mfK
        return (drdt.sum(1, keepdims=True),
                (s * rel[0]).sum(1, keepdims=True),
                (s * rel[1]).sum(1, keepdims=True),
                (s * rel[2]).sum(1, keepdims=True))
    rho_n = w[7].reshape(1, TS)
    crho = cw[7].reshape(B, 1)
    pg = cw[8].reshape(B, 1) + w[8].reshape(1, TS)
    s = -fm * pg * mfK
    art = vdp * 0.01 * (cw[9].reshape(B, 1) + w[9].reshape(1, TS)) / (
        (r2 + 1e-4) * (crho + rho_n))
    s = s + fm * (vdp < 0).astype(f32) * art * mfK
    return (drdt.sum(1, keepdims=True),
            (s * rel[0]).sum(1, keepdims=True),
            (s * rel[1]).sum(1, keepdims=True),
            (s * rel[2]).sum(1, keepdims=True))


def run_case(name, win, cen, kern, in_specs, total_pairs, grid=(NB,)):
    def run(c):
        w, acc = c
        o = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
        )(w, cen)
        return (w * 1.0000001, acc + o.sum() * 1e-30)

    ms = slope_ms(run, (win, jnp.float32(0.0)))
    report(name, ms, per={"pair": total_pairs},
           unit=f"({total_pairs//(NB*B)} slots/central)")
    return ms


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    T, TS = 8, 256  # production-ish: 2048 slots/central
    SLOTS = T * TS

    win = jnp.asarray(rng.standard_normal((NB, T, 16, TS)), jnp.float32)
    cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)
    win_specs = [
        pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
    ]

    # A. trivial kernel: grid cost only
    def kern_triv(win_ref, cen_ref, out_ref):
        out_ref[0] = jnp.broadcast_to(cen_ref[0, 0:4, 0:1].T, (B, 4)) * 1.0

    run_case("A. trivial kernel (grid overhead)", win, cen, kern_triv,
             win_specs, NB * B * SLOTS)

    # B. fori_loop + dynamic index (production shape)
    def kern_dyn(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]

        def body(t, acc):
            o = pair_math(cw, win_ref[0, t], TS)
            return tuple(a + b for a, b in zip(acc, o))

        z = jnp.zeros((B, 1), jnp.float32)
        acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("B. fori + dynamic win[t]", win, cen, kern_dyn, win_specs,
             NB * B * SLOTS)

    # D. python-unrolled static loop
    def kern_unroll(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]
        z = jnp.zeros((B, 1), jnp.float32)
        acc = (z, z, z, z)
        for t in range(T):
            o = pair_math(cw, win_ref[0, t], TS)
            acc = tuple(a + b for a, b in zip(acc, o))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("D. unrolled static loop", win, cen, kern_unroll, win_specs,
             NB * B * SLOTS)

    # E. flat slab: single pair_math over [16, T*TS]
    winf = win.transpose(0, 2, 1, 3).reshape(NB, 16, SLOTS)
    winf_specs = [
        pl.BlockSpec((1, 16, SLOTS), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
    ]

    def kern_flat(win_ref, cen_ref, out_ref):
        o = pair_math(cen_ref[0], win_ref[0], SLOTS)
        out_ref[0] = jnp.concatenate(o, axis=1)

    run_case("E. flat slab (no loop)", winf, cen, kern_flat, winf_specs,
             NB * B * SLOTS)

    # F. TS sweep at fixed total slots (fori + dynamic)
    for TS2 in (512, 1024):
        T2 = SLOTS // TS2
        w2 = win.reshape(NB, T2, 16 * (TS2 // TS), TS)  # placeholder reshape
        w2 = winf.reshape(NB, 16, T2, TS2).transpose(0, 2, 1, 3)
        specs2 = [
            pl.BlockSpec((1, T2, 16, TS2), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
        ]

        def kern_dyn2(win_ref, cen_ref, out_ref, T2=T2, TS2=TS2):
            cw = cen_ref[0]

            def body(t, acc):
                o = pair_math(cw, win_ref[0, t], TS2)
                return tuple(a + b for a, b in zip(acc, o))

            z = jnp.zeros((B, 1), jnp.float32)
            acc = jax.lax.fori_loop(0, T2, body, (z, z, z, z))
            out_ref[0] = jnp.concatenate(acc, axis=1)

        run_case(f"F. fori dyn TS={TS2} T={T2}", w2, cen, kern_dyn2, specs2,
                 NB * B * SLOTS)

    # G. half op-mix on flat slab
    def kern_flat_half(win_ref, cen_ref, out_ref):
        o = pair_math(cen_ref[0], win_ref[0], SLOTS, ops="half")
        out_ref[0] = jnp.concatenate(o, axis=1)

    run_case("G. flat slab, half ops", winf, cen, kern_flat_half, winf_specs,
             NB * B * SLOTS)

    # H. flat slab with fewer slots (what packed candidates would buy)
    for SL in (1024, 512):
        winh = winf[:, :, :SL]
        spec_h = [
            pl.BlockSpec((1, 16, SL), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
        ]

        def kern_h(win_ref, cen_ref, out_ref, SL=SL):
            o = pair_math(cen_ref[0], win_ref[0], SL)
            out_ref[0] = jnp.concatenate(o, axis=1)

        run_case(f"H. flat slab {SL} slots", winh, cen, kern_h, spec_h,
                 NB * B * SL)


if __name__ == "__main__":
    main()
