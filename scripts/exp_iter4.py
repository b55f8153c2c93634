#!/usr/bin/env python
"""Round 4: decide the v3 forces-kernel structure.

Measures (slope harness):
  D1. unrolled 9 sites, inline per-site lane reductions (= C5 baseline)
  D2. unrolled 9 sites, DEFERRED accumulation ([B,TS] accs, one final sum)
  D3. D2 with the full production op mix (XSPH + LJ + Colagrossi + energy)
  D4. D3 at T=12 and T=22 (cap-sensitivity for bucketing)
  D5. empty-program cost (count==0 path) per 1000 programs
Plus: T-tile histogram of the real DamBreak3D layout at B=64 SPAN=16.
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

B, NB, TS = 64, 2048, 128


def pair_core(cw, w, f32=jnp.float32):
    """Shared geometry+mask+kernel factors."""
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
    return rel, relv, r2, r, fm, fK, mfK, vdp


def phys_light(cw, w):
    """~C5 op mix: continuity + pressure + artificial viscosity."""
    f32 = jnp.float32
    rel, relv, r2, r, fm, fK, mfK, vdp = pair_core(cw, w)
    drdt = fm * vdp * mfK
    crho = cw[7].reshape(B, 1)
    rho_n = w[7].reshape(1, TS)
    pg = cw[8].reshape(B, 1) + w[8].reshape(1, TS)
    s = -fm * pg * mfK
    art = vdp * 0.01 * (cw[9].reshape(B, 1) + w[9].reshape(1, TS)) / (
        (r2 + 1e-4) * (crho + rho_n))
    s = s + fm * (vdp < 0).astype(f32) * art * mfK
    return (drdt, s * rel[0], s * rel[1], s * rel[2],
            None, None, None, None)


def phys_full(cw, w):
    """Production DamBreak3D mix: + LJ repulsion + Colagrossi + XSPH + E."""
    f32 = jnp.float32
    rel, relv, r2, r, fm, fK, mfK, vdp = pair_core(cw, w)
    c_fluid = cw[11].reshape(B, 1)
    n_fluid = w[11].reshape(1, TS)
    n_bound = w[12].reshape(1, TS)
    ff = fm * c_fluid * n_fluid
    drdt = ff * vdp * mfK
    crho = cw[7].reshape(B, 1)
    rho_n = w[7].reshape(1, TS)
    # Colagrossi density diffusion
    g_dot_rel = -9.81 * rel[2]
    press_c = cw[10].reshape(B, 1)
    press_n = w[10].reshape(1, TS)
    gate = (jnp.abs(press_c - press_n) >= jnp.abs(g_dot_rel * crho)).astype(f32)
    drdt = drdt - ff * gate * 0.05 * 40.0 * (rho_n / crho - 1.0) * mfK
    # pressure + artificial viscosity
    pg = cw[8].reshape(B, 1) + w[8].reshape(1, TS)
    s = -ff * pg * mfK
    art = vdp * 0.01 * (cw[9].reshape(B, 1) + w[9].reshape(1, TS)) / (
        (r2 + 1e-4) * (crho + rho_n))
    s = s + ff * (vdp < 0).astype(f32) * art * mfK
    # LJ repulsion (integer powers p1=12 p2=6)
    rep_mask = fm * c_fluid * n_bound
    inv_r = 1.0 / jnp.maximum(r, 1e-3)
    ratio = 0.02 * inv_r
    q2 = ratio * ratio
    q4 = q2 * q2
    q6 = q4 * q2
    lj = 1e3 * (q6 * q6 - q6) * inv_r * inv_r
    s = s + rep_mask * jnp.where(r < 0.02, jnp.minimum(lj, 1e30), 0.0)
    # XSPH (Wendland W)
    t1 = 1.0 - 0.5 * r
    t2 = t1 * t1
    wK = t2 * t2 * (2.0 * r + 1.0)
    xw = ff * (-2.0 * w[6].reshape(1, TS)) * wK / (crho + rho_n)
    # energy
    dedt = -0.5 * s * vdp
    return (drdt, s * rel[0], s * rel[1], s * rel[2],
            xw * relv[0], xw * relv[1], xw * relv[2], dedt)


def make_kern(phys, T, deferred, nout):
    def kern(win_ref, cen_ref, out_ref):
        cw = cen_ref[0]
        if deferred:
            accs = [jnp.zeros((B, TS), jnp.float32) for _ in range(nout)]
            for t in range(T):
                o = phys(cw, win_ref[0, t % 9] * (1.0 + t * 1e-6))
                accs = [a + x for a, x in zip(accs, o[:nout])]
            cols = [a.sum(1, keepdims=True) for a in accs]
        else:
            accs = [jnp.zeros((B, 1), jnp.float32) for _ in range(nout)]
            for t in range(T):
                o = phys(cw, win_ref[0, t % 9] * (1.0 + t * 1e-6))
                accs = [a + x.sum(1, keepdims=True)
                        for a, x in zip(accs, o[:nout])]
            cols = accs
        out_ref[0] = jnp.concatenate(cols + cols[:8 - nout], axis=1)[:, :8]
    return kern


def run_case(name, win, cen, kern, T):
    specs = [pl.BlockSpec((1, 9, 16, TS), lambda b: (b, 0, 0, 0)),
             pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]

    def run(c):
        w, acc = c
        o = pl.pallas_call(
            kern, grid=(NB,), in_specs=specs,
            out_specs=pl.BlockSpec((1, B, 8), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, B, 8), jnp.float32),
        )(w, cen)
        return (w * 1.0000001, acc + o.sum() * 1e-30)

    ms = slope_ms(run, (win, jnp.float32(0.0)))
    report(name, ms, per={"site": NB * T, "central": NB * B},
           unit=f"(T={T})")


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((NB, 9, 16, TS)), jnp.float32)
    cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)

    run_case("D1. light, inline reductions, T=9", win, cen,
             make_kern(phys_light, 9, False, 4), 9)
    run_case("D2. light, deferred acc, T=9", win, cen,
             make_kern(phys_light, 9, True, 4), 9)
    run_case("D3. full mix, deferred acc, T=9", win, cen,
             make_kern(phys_full, 9, True, 8), 9)
    run_case("D3i. full mix, inline, T=9", win, cen,
             make_kern(phys_full, 9, False, 8), 9)
    run_case("D4a. full mix, deferred, T=12", win, cen,
             make_kern(phys_full, 12, True, 8), 12)
    run_case("D4b. full mix, deferred, T=22", win, cen,
             make_kern(phys_full, 22, True, 8), 22)
    run_case("D4c. full mix, inline, T=22", win, cen,
             make_kern(phys_full, 22, False, 8), 22)
    run_case("D5. light, inline, T=22", win, cen,
             make_kern(phys_light, 22, False, 4), 22)
    run_case("D6. full mix, inline, T=4", win, cen,
             make_kern(phys_full, 4, False, 8), 4)


if __name__ == "__main__":
    main()
