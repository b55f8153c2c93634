#!/usr/bin/env python
"""Round 3: isolate fori overhead vs dynamic-index cost; dynamic lane slice."""
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

B, NB, T, TS = 64, 2048, 9, 128
SLOTS = T * TS


def pair_math(cw, w, TS):
    f32 = jnp.float32
    cx = cw[0:3, :].reshape(3, B, 1)
    nx = w[0:3, :].reshape(3, 1, TS)
    rel = cx - nx
    r2 = (rel * rel).sum(0)
    fm = ((r2 < 1.0) & (r2 > 0.0)).astype(f32)
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
    rho_n = w[7].reshape(1, TS)
    crho = cw[7].reshape(B, 1)
    pg = cw[8].reshape(B, 1) + w[8].reshape(1, TS)
    s = -fm * pg * mfK
    art = vdp * 0.01 * (cw[9].reshape(B, 1) + w[9].reshape(1, TS)) / (
        (r2 + 1e-4) * (crho + rho_n))
    s = s + fm * (vdp < 0).astype(f32) * art * mfK
    return (drdt.sum(1, keepdims=True), (s * rel[0]).sum(1, keepdims=True),
            (s * rel[1]).sum(1, keepdims=True), (s * rel[2]).sum(1, keepdims=True))


def run_case(name, win, cen, kern, in_specs):
    def run(c):
        w, acc = c
        o = pl.pallas_call(
            kern, grid=(NB,), in_specs=in_specs,
            out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
        )(w, cen)
        return (w * 1.0000001, acc + o.sum() * 1e-30)
    ms = slope_ms(run, (win, jnp.float32(0.0)))
    report(name, ms, per={"pair": NB * B * SLOTS, "central": NB * B})


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((NB, T, 16, TS)), jnp.float32)
    cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)
    specs = [pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
             pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]
    winf = win.transpose(0, 2, 1, 3).reshape(NB, 16, SLOTS)
    specf = [pl.BlockSpec((1, 16, SLOTS), lambda b: (b, 0, 0)),
             pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]

    def kern_c1(win_ref, cen_ref, out_ref):  # fori, STATIC index (overhead)
        cw = cen_ref[0]
        def body(t, acc):
            o = pair_math(cw, win_ref[0, 0], TS)
            return tuple(a + b for a, b in zip(acc, o))
        z = jnp.zeros((B, 1), jnp.float32)
        acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C1. fori, static win[0]", win, cen, kern_c1, specs)

    def kern_c2(win_ref, cen_ref, out_ref):  # fori, dynamic leading index
        cw = cen_ref[0]
        def body(t, acc):
            o = pair_math(cw, win_ref[0, t], TS)
            return tuple(a + b for a, b in zip(acc, o))
        z = jnp.zeros((B, 1), jnp.float32)
        acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C2. fori, dyn leading win[t]", win, cen, kern_c2, specs)

    def kern_c3(win_ref, cen_ref, out_ref):  # fori, dynamic LANE slice
        cw = cen_ref[0]
        def body(t, acc):
            w = win_ref[0, :, pl.ds(t * TS, TS)]
            o = pair_math(cw, w, TS)
            return tuple(a + b for a, b in zip(acc, o))
        z = jnp.zeros((B, 1), jnp.float32)
        acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C3. fori, dyn lane slice", winf, cen, kern_c3, specf)

    def kern_c4(win_ref, cen_ref, out_ref):  # unrolled, dyn trip via select
        cw = cen_ref[0]
        z = jnp.zeros((B, 1), jnp.float32)
        acc = (z, z, z, z)
        texec = jnp.int32(9) + (cw[0, 0] > 1e9).astype(jnp.int32)
        for t in range(12):  # T_CAP=12, 9 "real": mask contributions
            o = pair_math(cw, win_ref[0, t % T], TS)
            live = (t < texec).astype(jnp.float32)
            acc = tuple(a + live * b for a, b in zip(acc, o))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C4. unrolled 12 sites select-masked", win, cen, kern_c4, specs)

    def kern_c5(win_ref, cen_ref, out_ref):  # unrolled static, baseline
        cw = cen_ref[0]
        z = jnp.zeros((B, 1), jnp.float32)
        acc = (z, z, z, z)
        for t in range(T):
            o = pair_math(cw, win_ref[0, t], TS)
            acc = tuple(a + b for a, b in zip(acc, o))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C5. unrolled 9 static (baseline)", win, cen, kern_c5, specs)

    # C6: fori with unroll=3 (dynamic base, 3 static offsets)
    def kern_c6(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]
        def body(q, acc):
            for k in range(3):
                o = pair_math(cw, win_ref[0, q * 3 + k], TS)
                acc = tuple(a + b for a, b in zip(acc, o))
            return acc
        z = jnp.zeros((B, 1), jnp.float32)
        acc = jax.lax.fori_loop(0, T // 3, body, (z, z, z, z))
        out_ref[0] = jnp.concatenate(acc, axis=1)

    run_case("C6. fori x3-unrolled dyn", win, cen, kern_c6, specs)


if __name__ == "__main__":
    main()
