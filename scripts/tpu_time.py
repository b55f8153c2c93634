"""Trustworthy wall-clock timing on the tunneled (axon) TPU.

Pitfalls this harness works around (all measured on this box):
  * ``jax.block_until_ready`` does NOT block on the axon platform — only a
    host fetch (np.asarray / device_get) waits for execution;
  * identical (executable, input) dispatches can be memoized by the tunnel;
  * per-dispatch overhead is ~30-40 ms (tunnel round trip), so anything
    meaningful must loop INSIDE one jit call.

Method: run the op R times inside one jitted ``fori_loop`` whose carry
chains (so no dedup/DCE), fetch a scalar, and take the slope between two
rep counts — subtracting dispatch overhead and fetch latency exactly.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def _chained(fn, R):
    """fn: carry -> carry (any small pytree). Returns jitted R-rep runner."""

    def run(c):
        return jax.lax.fori_loop(0, R, lambda i, c: fn(c), c)

    return jax.jit(run)


def _fetch(c):
    leaf = jax.tree.leaves(c)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def slope_ms(fn, init, r1=2, r2=22, verbose=False):
    """Marginal per-rep wall time of ``fn`` (carry->carry), in ms."""
    f1, f2 = _chained(fn, r1), _chained(fn, r2)
    c = f1(init)
    _fetch(c)  # compile+warm f1
    c2 = f2(init)
    _fetch(c2)  # compile+warm f2
    # timed passes, fresh carries so the tunnel can't memoize
    t0 = time.perf_counter()
    _fetch(f1(c))
    t1 = time.perf_counter()
    _fetch(f2(c2))
    t2 = time.perf_counter()
    ms = ((t2 - t1) - (t1 - t0)) / (r2 - r1) * 1e3
    if verbose:
        print(f"    [r{r1}: {(t1-t0)*1e3:.1f} ms, r{r2}: {(t2-t1)*1e3:.1f} ms]")
    return ms


def report(name, ms, per=None, unit=""):
    extra = ""
    if per:
        extra = "  " + "  ".join(f"{ms*1e6/v:8.1f} ns/{k}" if ms * 1e6 / v >= 1
                                 else f"{ms*1e9/v:8.1f} ps/{k}"
                                 for k, v in per.items())
    print(f"{name:52s} {ms:9.3f} ms{extra} {unit}", flush=True)
