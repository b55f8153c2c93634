#!/usr/bin/env python
"""Design measurements for the v3 (packed-window) forces kernel, using the
slope harness (scripts/tpu_time.py) — earlier experiment numbers taken with
block_until_ready are untrustworthy on this tunneled TPU.

Quantities:
  1. XLA row gather [M,16] f32 out of [N,16]  -> GB/s (packed-window feed)
  2. Pallas direct-window pair math           -> ps per pair-slot
  3. Pallas packed-window kernel (gathered [K,16] windows via XLA, dense
     [B,K] pair math in kernel)               -> ms per pass, end to end
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from tpu_time import report, slope_ms

B = 64


def pair_math(cw, w, TS):
    """Representative F1 physics: ~same op mix as the production kernel."""
    cx = cw[0:3, :].reshape(3, B, 1)
    nx = w[0:3, :].reshape(3, 1, TS)
    rel = cx - nx
    r2 = (rel * rel).sum(0)
    mask = (r2 < 1.0) & (r2 > 0.0)
    fm = mask.astype(jnp.float32)
    r = jnp.sqrt(jnp.minimum(r2, 1.0))
    t1 = 1.0 - 0.5 * r
    fK = t1 * t1 * t1 * (2 * r + 1)
    cv = cw[3:6, :].reshape(3, B, 1)
    nv = w[3:6, :].reshape(3, 1, TS)
    relv = cv - nv
    vdp = (relv * rel).sum(0)
    m_n = w[6].reshape(1, TS)
    rho_n = w[7].reshape(1, TS)
    crho = cw[7].reshape(B, 1)
    mfK = m_n * fK
    drdt = fm * vdp * mfK
    pg = cw[8].reshape(B, 1) + w[8].reshape(1, TS)
    s = -fm * pg * mfK
    art = vdp * 0.01 * (cw[9].reshape(B, 1) + w[9].reshape(1, TS)) / (
        (r2 + 1e-4) * (crho + rho_n))
    s = s + fm * (vdp < 0).astype(jnp.float32) * art * mfK
    return (drdt.sum(1, keepdims=True),
            (s * rel[0]).sum(1, keepdims=True),
            (s * rel[1]).sum(1, keepdims=True),
            (s * rel[2]).sum(1, keepdims=True))


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    # ---- 1. XLA row gather ------------------------------------------------
    for N, K in ((129_000, 512), (1_000_000, 512)):
        nb = (N + B - 1) // B
        M = nb * K
        tab = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
        # window-local indices (realistic: each block reads nearby rows)
        base = np.repeat((np.arange(nb) * B) % N, K)
        idx = jnp.asarray((base + rng.integers(0, 4096, size=(M,))) % N,
                          jnp.int32)

        def g(c, tab=tab, idx=idx, M=M):
            t, acc = c
            o = t[idx]
            w = jax.lax.broadcasted_iota(jnp.float32, o.shape, 0) * 1e-9 + 1.
            return (t * 1.0000001, acc + (o * w).sum() * 1e-30)

        ms = slope_ms(g, (tab, jnp.float32(0.0)))
        report(f"1. row gather N={N} M={M} ({M*64/1e6:.0f} MB)", ms,
               unit=f"-> {M*64/ms/1e6:7.1f} GB/s")

        def g2(c, tab=tab, idx=idx, M=M):
            t, acc = c
            o = t[idx].reshape(M // 128, 128, 16).transpose(0, 2, 1)
            w = jax.lax.broadcasted_iota(jnp.float32, o.shape, 0) * 1e-9 + 1.
            return (t * 1.0000001, acc + (o * w).sum() * 1e-30)

        ms = slope_ms(g2, (tab, jnp.float32(0.0)))
        report(f"   + transpose to [*,16,128]", ms,
               unit=f"-> {M*64/ms/1e6:7.1f} GB/s")

    # ---- 2. direct-window pair math (production inner loop shape) ---------
    for TS, T in ((128, 9), (256, 12)):
        NB = 2048  # blocks of B=64 centrals -> 131k centrals
        win = jnp.asarray(rng.standard_normal((NB, T, 16, TS)), jnp.float32)
        cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)

        def kern(win_ref, cen_ref, out_ref, T=T, TS=TS):
            cw = cen_ref[0]

            def body(t, acc):
                o = pair_math(cw, win_ref[0, t], TS)
                return tuple(a + b for a, b in zip(acc, o))

            z = jnp.zeros((B, 1), jnp.float32)
            acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
            out_ref[0] = jnp.concatenate(acc, axis=1)

        def run(c, win=win, cen=cen, kern=kern, T=T, TS=TS):
            w, acc = c
            o = pl.pallas_call(
                kern,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
            )(w, cen)
            return (w * 1.0000001, acc + o.sum() * 1e-30)

        ms = slope_ms(run, (win, jnp.float32(0.0)))
        pairs = NB * B * T * TS
        report(f"2. direct window TS={TS} T={T} ({NB*B} centrals)", ms,
               per={"pair": pairs},
               unit=f"({T*TS} slots/central)")

    # ---- 3. end-to-end packed-window pass (gather + kernel) ---------------
    for N, K in ((131_072, 512), (1_048_576, 512)):
        nb = N // B
        M = nb * K
        tab = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
        base = np.repeat((np.arange(nb) * B) % N, K)
        idx = jnp.asarray(((base + rng.integers(0, 4096, size=(M,))) % N)
                          .reshape(nb, K), jnp.int32)
        KT = K // 128

        def kern3(win_ref, cen_ref, out_ref):
            cw = cen_ref[0]

            def body(t, acc):
                w = win_ref[0, t]  # [16,128]
                o = pair_math(cw, w, 128)
                return tuple(a + b for a, b in zip(acc, o))

            z = jnp.zeros((B, 1), jnp.float32)
            acc = jax.lax.fori_loop(0, KT, body, (z, z, z, z))
            out_ref[0] = jnp.concatenate(acc, axis=1)

        def pass3(c, tab=tab, idx=idx, nb=nb, K=K, KT=KT, M=M):
            t, acc = c
            win = t[idx.reshape(-1)].reshape(nb, KT, 128, 16).transpose(
                0, 1, 3, 2)
            cen = t[0:nb * B].reshape(nb, B, 16).transpose(0, 2, 1)
            o = pl.pallas_call(
                kern3,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, KT, 16, 128), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((nb, B, 4), jnp.float32),
            )(win, cen)
            return (t * 1.0000001, acc + o.sum() * 1e-30)

        ms = slope_ms(pass3, (tab, jnp.float32(0.0)))
        report(f"3. packed pass N={N} K={K} (gather+kern)", ms,
               per={"particle": N},
               unit=f"-> {N/ms*1e3/1e6:6.2f}M part/s/pass")


if __name__ == "__main__":
    main()
