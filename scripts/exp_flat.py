#!/usr/bin/env python
"""Measure the flattened tile-grid kernel structure (v3 candidate).

grid = (n_tiles,): one grid step per (block, window-tile) pair, all indices
scalar-prefetched.  Window + central fetched via BlockSpec index maps (auto
pipelined), per-block accumulators in persistent scratch, out written on the
block's last tile.  Compare per-site cost against D1 (170 ns/site with the
window pre-staged per block).

F1. flat grid, light mix, 9 tiles/block (same work as D1)
F2. flat grid, light mix, realistic mixed T (mean ~11.6 like DamBreak3D)
F3. F1 with full mix
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
from jax.experimental.pallas import tpu as pltpu
from exp_iter4 import phys_light, phys_full, B, TS
from tpu_time import report, slope_ms

NB = 2048
NOUT = 8


def make_flat(phys, nout, n_tiles, n_blocks, n_wtiles):
    def kern(wt_ref, ct_ref, fl_ref, ob_ref, win_ref, cen_ref, out_ref,
             acc_ref, cen_s):
        i = pl.program_id(0)
        first = fl_ref[i] & 1
        last = fl_ref[i] >> 1

        @pl.when(first == 1)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            cen_s[...] = cen_ref[0].T[0:B, :].T  # [16, B]

        o = phys(cen_s[...], win_ref[0])
        for k in range(nout):
            acc_ref[k] = acc_ref[k] + jnp.sum(
                o[k], axis=1, keepdims=True, dtype=jnp.float32).T

        @pl.when(last == 1)
        def _():
            out_ref[0] = acc_ref[:, 0, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 16, TS), lambda i, wt, ct, fl, ob: (wt[i], 0, 0)),
            pl.BlockSpec((1, 16, TS), lambda i, wt, ct, fl, ob: (ct[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, NOUT, B), lambda i, wt, ct, fl, ob: (ob[i], 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((NOUT, 1, B), jnp.float32),
            pltpu.VMEM((16, B), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks + 1, NOUT, B), jnp.float32),
    )


def run_case(name, phys, nout, T_of_block):
    rng = np.random.default_rng(0)
    n_blocks = NB
    T = np.asarray(T_of_block)
    n_tiles = int(T.sum())
    n_wtiles = 4096
    wtab = jnp.asarray(rng.standard_normal((n_wtiles, 16, TS)), jnp.float32)
    wt = np.zeros(n_tiles, np.int32)
    ct = np.zeros(n_tiles, np.int32)
    fl = np.zeros(n_tiles, np.int32)
    ob = np.zeros(n_tiles, np.int32)
    pos = 0
    for b in range(n_blocks):
        for t in range(T[b]):
            wt[pos] = int(rng.integers(0, n_wtiles))
            ct[pos] = b % n_wtiles
            fl[pos] = (1 if t == 0 else 0) | (2 if t == T[b] - 1 else 0)
            ob[pos] = b
            pos += 1
    wt, ct, fl, ob = map(jnp.asarray, (wt, ct, fl, ob))
    call = make_flat(phys, nout, n_tiles, n_blocks, n_wtiles)

    def run(c):
        w, acc = c
        o = call(wt, ct, fl, ob, w, w)
        return (w * 1.0000001, acc + o.sum() * 1e-30)

    ms = slope_ms(run, (wtab, jnp.float32(0.0)))
    report(name, ms, per={"site": n_tiles, "central": n_blocks * B},
           unit=f"({n_tiles} tiles)")


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(1)
    run_case("F1. flat, light, T=9", phys_light, 4, [9] * NB)
    Tmix = np.clip(rng.normal(11.6, 3.0, NB).astype(int), 6, 22)
    run_case(f"F2. flat, light, Tmix mean={Tmix.mean():.1f}",
             phys_light, 4, Tmix)
    run_case("F3. flat, full, T=9", phys_full, 8, [9] * NB)


if __name__ == "__main__":
    main()
