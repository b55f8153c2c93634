#!/usr/bin/env python
"""Pair-body restructure experiment: VPU-only (current style) vs MXU-offload.

The forces kernel is VPU-bound at ~200 effective ops/slot.  Two candidate
reductions:
  * geometry via MXU: r2 = |x_a|^2 + |x_b|^2 - 2 x_a.x_b and
    vdp = v.x cross terms from two dot_generals on the MXU;
  * output reduction via MXU: DvDt/DrDt sums as [B,TS] coefficient
    matrices times [TS, 8] neighbor field columns (s @ X trick:
    sum_j s_ij (x_a - x_j) = x_a sum_j s_ij - (s @ x)_i).

Both variants compute the SAME physics (F1 continuity + pressure gradient +
artificial viscosity + Colagrossi diffusion, Wendland) on synthetic blocks;
numeric agreement is asserted, wall time compared.
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

B = 64      # centrals per block
TS = 256    # candidates per chunk
T = 12      # chunks per block
NB = 256    # blocks  (N = NB*B = 16384 centrals)
H = 0.026   # smoothing length scale
RAD2 = (2 * H) ** 2

# field rows
PX, PY, PZ, VX, VY, VZ, MASS, RHO, PPRE, SS, PRESS, SXX, SVX, _, _, _ = range(16)


def chain_time(name, fn, init, reps=6):
    try:
        f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, c: fn(c, i), c))
        c = f(init)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = f(c)
        jax.block_until_ready(c)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:52s} {ms:9.3f} ms", flush=True)
        return ms, c
    except Exception:
        print(f"{name:52s} FAILED", flush=True)
        traceback.print_exc()
        return None, None


def wendland_f(r, h):
    q = r * (1.0 / h)
    t1 = 1.0 - 0.5 * q
    t1 = jnp.maximum(t1, 0.0)
    return (-21.0 / (16.0 * np.pi * h ** 5)) * t1 * t1 * t1


def pair_scalars(cx, cy, cz, cvx, cvy, cvz, crho, css, cppre, cpress,
                 r2, vdp, relx_needed, w, mask):
    """Shared physics given geometry; returns (DrDt term, s momentum coeff)."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-12))
    fK = wendland_f(r, H)
    m_n = w[MASS].reshape(1, TS)
    rho_n = w[RHO].reshape(1, TS)
    mfK = m_n * fK
    fmask = mask.astype(jnp.float32)
    drdt = fmask * vdp * mfK
    # Colagrossi
    gdr = -9.81 * (relx_needed if relx_needed is not None else 0.0)
    press_n = w[PRESS].reshape(1, TS)
    gate = (jnp.abs(cpress - press_n) >= jnp.abs(gdr * crho)).astype(jnp.float32)
    drdt = drdt - fmask * gate * (0.1 * 2 * H * 40.0) * (rho_n / crho - 1.0) * mfK
    # pressure gradient + artificial viscosity
    pgrad = cppre + w[PPRE].reshape(1, TS)
    s = -fmask * pgrad * mfK
    art = vdp * (H * 0.2) * (css + w[SS].reshape(1, TS)) / (
        (r2 + 0.01 * H * H) * (crho + rho_n))
    s = s + fmask * (vdp < 0).astype(jnp.float32) * art * mfK
    return drdt, s


def kern_vpu(win_ref, cen_ref, out_ref):
    cen = cen_ref[0]                    # [16, B]
    cx = cen[PX].reshape(B, 1)
    cy = cen[PY].reshape(B, 1)
    cz = cen[PZ].reshape(B, 1)
    cvx = cen[VX].reshape(B, 1)
    cvy = cen[VY].reshape(B, 1)
    cvz = cen[VZ].reshape(B, 1)
    crho = cen[RHO].reshape(B, 1)
    css = cen[SS].reshape(B, 1)
    cppre = cen[PPRE].reshape(B, 1)
    cpress = cen[PRESS].reshape(B, 1)

    def body(t, acc):
        w = win_ref[0, t]               # [16, TS]
        relx = cx - w[PX].reshape(1, TS)
        rely = cy - w[PY].reshape(1, TS)
        relz = cz - w[PZ].reshape(1, TS)
        r2 = relx * relx + rely * rely + relz * relz
        mask = (r2 < RAD2) & (r2 > 0.0)
        relvx = cvx - w[VX].reshape(1, TS)
        relvy = cvy - w[VY].reshape(1, TS)
        relvz = cvz - w[VZ].reshape(1, TS)
        vdp = relvx * relx + relvy * rely + relvz * relz
        drdt, s = pair_scalars(cx, cy, cz, cvx, cvy, cvz, crho, css, cppre,
                               cpress, r2, vdp, relz, w, mask)
        a0, a1, a2, a3 = acc
        return (a0 + drdt.sum(1, keepdims=True),
                a1 + (s * relx).sum(1, keepdims=True),
                a2 + (s * rely).sum(1, keepdims=True),
                a3 + (s * relz).sum(1, keepdims=True))

    z = jnp.zeros((B, 1), jnp.float32)
    acc = jax.lax.fori_loop(0, T, body, (z, z, z, z))
    out_ref[0] = jnp.concatenate(acc, axis=1)


def kern_mxu(win_ref, cen_ref, out_ref):
    cen = cen_ref[0]
    cx = cen[PX].reshape(B, 1)
    cy = cen[PY].reshape(B, 1)
    cz = cen[PZ].reshape(B, 1)
    crho = cen[RHO].reshape(B, 1)
    css = cen[SS].reshape(B, 1)
    cppre = cen[PPRE].reshape(B, 1)
    cpress = cen[PRESS].reshape(B, 1)
    csxx = cen[SXX].reshape(B, 1)
    csvx = cen[SVX].reshape(B, 1)
    # [B, 6] central (x, v) for the cross-term matmuls
    cXV = cen[0:6].T                    # [B, 6]
    cX = cen[0:3].T                     # [B, 3]

    def body(t, acc):
        w = win_ref[0, t]               # [16, TS]
        # MXU: x_a.x_b and (v_a.x_b + x_a.v_b)
        nX = w[0:3]                     # [3, TS]
        nVX = jnp.concatenate([w[3:6], w[0:3]], axis=0)  # [6, TS] (v, x)
        xdot = jax.lax.dot_general(
            cX, nX, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [B, TS]
        cross = jax.lax.dot_general(
            cXV, nVX, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # v_a.x_b + x_a.v_b
        r2 = csxx + w[SXX].reshape(1, TS) - 2.0 * xdot
        vdp = csvx + w[SVX].reshape(1, TS) - cross
        mask = (r2 < RAD2) & (r2 > 1e-12)
        relz = cz - w[PZ].reshape(1, TS)  # still needed for the g.dot gate
        drdt, s = pair_scalars(cx, cy, cz, None, None, None, crho, css,
                               cppre, cpress, r2, vdp, relz, w, mask)
        # MXU reduction: sum_j s (x_a - x_j) = x_a sum s - s @ x_n
        red = jax.lax.dot_general(
            jnp.concatenate([drdt, s], axis=1),          # [B, 2TS]
            jnp.concatenate(
                [jnp.concatenate([jnp.ones((1, TS), jnp.float32), w[0:3]],
                                 axis=0),
                 jnp.zeros((4, TS), jnp.float32)], axis=1).T.reshape(2 * TS, 4),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [B, 4]
        a = acc
        ssum = red[:, 0:1] * 0.0  # placeholder, fixed below
        return (a[0] + red[:, 0:1],
                a[1] + red[:, 1:2],
                a[2] + red[:, 2:3],
                a[3] + red[:, 3:4],
                a[4] + s.sum(1, keepdims=True))

    z = jnp.zeros((B, 1), jnp.float32)
    acc = jax.lax.fori_loop(0, T, body, (z, z, z, z, z))
    drdt_s, sx, sy, sz, ssum = acc
    # DvDt = x_a * sum(s) - (s @ x_n)
    out_ref[0] = jnp.concatenate(
        [drdt_s, cx * ssum - sx, cy * ssum - sy, cz * ssum - sz], axis=1)


def main():
    print(f"device={jax.devices()[0]}  N={NB*B} slots/central={T*TS}",
          flush=True)
    rng = np.random.default_rng(0)
    # synthetic but geometrically plausible data: positions in a 4h box so
    # a realistic fraction of pairs is in range
    pos = rng.uniform(0, 10 * H, size=(NB, 3, T * TS)).astype(np.float32)
    win_np = np.zeros((NB, T, 16, TS), np.float32)
    win_np[:, :, 0:3] = pos.reshape(NB, 3, T, TS).transpose(0, 2, 1, 3)
    win_np[:, :, 3:6] = rng.standard_normal((NB, T, 3, TS)) * 0.1
    win_np[:, :, MASS] = 1e-3
    win_np[:, :, RHO] = 1000 + rng.standard_normal((NB, T, TS))
    win_np[:, :, PRESS] = rng.standard_normal((NB, T, TS)) * 100
    win_np[:, :, PPRE] = win_np[:, :, PRESS] / win_np[:, :, RHO] ** 2
    win_np[:, :, SS] = 40.0
    win_np[:, :, SXX] = (win_np[:, :, 0:3] ** 2).sum(2)
    win_np[:, :, SVX] = (win_np[:, :, 0:3] * win_np[:, :, 3:6]).sum(2)
    win = jnp.asarray(win_np)

    cen_np = win_np[:, 0, :, :B].copy()
    cen = jnp.asarray(cen_np)

    def runner(kern):
        def run(c, i):
            o = pl.pallas_call(
                kern,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
            )(win + i * 0.0, cen)
            return c + o.sum(), o

        return lambda c, i: run(c, i)[0]

    # correctness cross-check first (single call)
    try:
        outs = []
        for kern in (kern_vpu, kern_mxu):
            o = pl.pallas_call(
                kern,
                grid=(NB,),
                in_specs=[
                    pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
                    pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
            )(win, cen)
            outs.append(np.asarray(o))
        err = np.abs(outs[0] - outs[1]).max() / (np.abs(outs[0]).max() + 1e-9)
        print(f"VPU vs MXU relative max err: {err:.2e}", flush=True)
    except Exception:
        traceback.print_exc()

    chain_time("VPU-only body", runner(kern_vpu), jnp.float32(0))
    chain_time("MXU-offload body", runner(kern_mxu), jnp.float32(0))


if __name__ == "__main__":
    main()
