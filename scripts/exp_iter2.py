#!/usr/bin/env python
"""Round 2: TS=128 structures, pl.when-guarded static chunks, bf16."""
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
NB = 2048


def pair_math(cw, w, TS, dt=jnp.float32):
    f32 = jnp.float32
    co = lambda v: v.astype(dt)
    cx = cw[0:3, :].reshape(3, B, 1)
    nx = w[0:3, :].reshape(3, 1, TS)
    rel = cx - nx
    r2 = (rel * rel).sum(0)
    mask = (r2 < 1.0) & (r2 > 0.0)
    fm = mask.astype(dt)
    r = co(jnp.sqrt(jnp.minimum(r2, 1.0)))
    t1 = 1.0 - 0.5 * r
    fK = t1 * t1 * t1 * (2 * r + 1)
    m_n = co(w[6].reshape(1, TS))
    mfK = m_n * fK
    cv = cw[3:6, :].reshape(3, B, 1).astype(dt)
    nv = w[3:6, :].reshape(3, 1, TS).astype(dt)
    relc = rel.astype(dt) if dt==jnp.float32 else rel.reshape(3, B*TS).astype(dt).reshape(3,B,TS)
    relv = cv - nv
    vdp = (relv * relc).sum(0)
    drdt = fm * vdp * mfK
    rho_n = co(w[7].reshape(1, TS))
    crho = co(cw[7].reshape(B, 1))
    pg = co(cw[8].reshape(B, 1)) + co(w[8].reshape(1, TS))
    s = -fm * pg * mfK
    art = vdp * 0.01 * (co(cw[9].reshape(B, 1)) + co(w[9].reshape(1, TS))) / (
        (co(r2) + 1e-4) * (crho + rho_n))
    s = s + fm * (vdp.astype(jnp.float32) < 0).astype(dt) * art * mfK
    o = (drdt, s * relc[0], s * relc[1], s * relc[2])
    return tuple(x.astype(f32).sum(1, keepdims=True) for x in o)


def run_case(name, win, cen, kern, in_specs, total_pairs):
    def run(c):
        w, acc = c
        o = pl.pallas_call(
            kern, grid=(NB,), in_specs=in_specs,
            out_specs=pl.BlockSpec((1, B, 4), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NB, B, 4), jnp.float32),
        )(w, cen)
        return (w * 1.0000001, acc + o.sum() * 1e-30)
    ms = slope_ms(run, (win, jnp.float32(0.0)))
    report(name, ms, per={"pair": total_pairs, "central": NB * B},
           unit=f"({total_pairs//(NB*B)} sl/c)")


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    for T, TS in ((9, 128),):
        SLOTS = T * TS
        win = jnp.asarray(rng.standard_normal((NB, T, 16, TS)), jnp.float32)
        cen = jnp.asarray(rng.standard_normal((NB, 16, B)), jnp.float32)
        specs = [pl.BlockSpec((1, T, 16, TS), lambda b: (b, 0, 0, 0)),
                 pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]

        def kern_unroll(win_ref, cen_ref, out_ref, T=T, TS=TS, dt=jnp.float32):
            cw = cen_ref[0]
            z = jnp.zeros((B, 1), jnp.float32)
            acc = (z, z, z, z)
            for t in range(T):
                o = pair_math(cw, win_ref[0, t], TS, dt)
                acc = tuple(a + b for a, b in zip(acc, o))
            out_ref[0] = jnp.concatenate(acc, axis=1)

        run_case(f"I. unrolled TS={TS} T={T} f32", win, cen, kern_unroll,
                 specs, NB * B * SLOTS)

        import functools
        run_case(f"J. unrolled TS={TS} T={T} bf16", win, cen,
                 functools.partial(kern_unroll, dt=jnp.bfloat16), specs,
                 NB * B * SLOTS)

        winf = win.transpose(0, 2, 1, 3).reshape(NB, 16, SLOTS)
        specf = [pl.BlockSpec((1, 16, SLOTS), lambda b: (b, 0, 0)),
                 pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]

        def kern_flat(win_ref, cen_ref, out_ref, dt=jnp.float32):
            o = pair_math(cen_ref[0], win_ref[0], SLOTS, dt)
            out_ref[0] = jnp.concatenate(o, axis=1)

        run_case(f"K. flat {SLOTS} f32", winf, cen, kern_flat, specf,
                 NB * B * SLOTS)
        run_case(f"L. flat {SLOTS} bf16", winf, cen,
                 functools.partial(kern_flat, dt=jnp.bfloat16), specf,
                 NB * B * SLOTS)

        # M. static sites with pl.when guards: T_CAP sites, exec per-block T
        T_CAP = 16
        winp = jnp.asarray(rng.standard_normal((NB, T_CAP, 16, TS)), jnp.float32)
        specp = [pl.BlockSpec((1, T_CAP, 16, TS), lambda b: (b, 0, 0, 0)),
                 pl.BlockSpec((1, 16, B), lambda b: (b, 0, 0))]

        def kern_when(win_ref, cen_ref, out_ref):
            cw = cen_ref[0]
            texec = jnp.int32(9) + (cw[0, 0] > 1e9).astype(jnp.int32)
            z = jnp.zeros((B, 1), jnp.float32)
            import jax as _jax
            accr = [z, z, z, z]
            def site(t):
                o = pair_math(cw, win_ref[0, t], TS)
                for i in range(4):
                    accr[i] = accr[i] + o[i]
            out_ref[0] = jnp.zeros((B, 4), jnp.float32)
            for t in range(T_CAP):
                @pl.when(t < texec)
                def _(t=t):
                    cwl = cen_ref[0]
                    o = pair_math(cwl, win_ref[0, t], TS)
                    cur = out_ref[0]
                    out_ref[0] = cur + jnp.concatenate(o, axis=1)

        run_case(f"M. {T_CAP} when-sites, 9 exec", winp, cen, kern_when,
                 specp, NB * B * SLOTS)
    # N. flat slab bf16 with 2x op mix (closer to production LJ+XSPH)


if __name__ == "__main__":
    main()
