#!/usr/bin/env python
"""Golden-run regression checker.

TPU-native counterpart of the reference's `scripts/run-all-problems.sh` +
`check-problem.sh`: run a problem for a fixed number of iterations, store a
compact state fingerprint under ``tests/references/``, and on subsequent runs
compare against it.  The reference demands byte-identical outputs on the same
GPU/build; across XLA versions/backends we use tight numeric tolerances on
sorted-by-id state instead.

Usage:
  python scripts/check_problem.py DamBreak3D --maxiter 200 [--make-reference]
  python scripts/check_problem.py --all [--make-reference]
"""
import argparse
import json
import os
import os
# CPU runs get their own cache: entries compiled via the remote TPU-host
# toolchain carry CPU features this machine lacks (SIGILL on AOT load)
_cache = "/root/.cache/jax_comp_cpu" if "--cpu" in __import__("sys").argv \
    else "/root/.cache/jax_comp"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # golden references are backend-specific; record/check them on CPU
    sys.argv.remove("--cpu")
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

REF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "references",
)

DEFAULT_PROBLEMS = {
    # the full catalog at regression-friendly sizes
    "DamBreak3D": dict(deltap=0.04, max_ppc=64),
    "StillWater": dict(ppH=10, max_ppc=56),
    "Poiseuille": dict(ppH=12),
    "LockExchange": dict(ppH=12, max_ppc=64),
    "WaveTank": dict(deltap=0.04),
    "OpenChannel": dict(deltap=0.05),
    "BuoyancyTest": dict(deltap=0.04),
    "DamBreakGate": dict(deltap=0.04),
    "Spheric2": dict(deltap=0.05),
    "RTInstability": dict(deltap=0.04),
    "Bubble": dict(deltap=0.05),
    "DamBreakMobileBed": dict(deltap=0.02, jacobi_maxiter=60),
    "Seiche": dict(deltap=0.05),
    "StillWaterSA": dict(ppH=10, max_ppc=88),
    "TurbulentPoiseuilleFlowSA": dict(deltap=0.1),
    "LithostaticLJ": dict(deltap=0.1, jacobi_maxiter=60),
    "LithostaticDYN": dict(deltap=0.1, jacobi_maxiter=60),
    "BiFluidPoiseuille": dict(deltap=0.1),
    "PoiseuillePapanastasiou": dict(ppH=12),
    "AccuracyTest": dict(deltap=0.05),
    "SolitaryWave": dict(deltap=0.04),
    "DEMExample": dict(deltap=0.15),
}


def run_problem(name, opts, maxiter):
    import numpy as np

    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    P = get_problem(name)(dict(opts))
    grid, state = P.build()
    sim = Simulator(P.fw, grid, bodies_specs=P.body_specs())
    state = sim.run(state, tend=0.0, maxiter=maxiter)

    act = np.asarray(state.active)
    ids = np.asarray(state.id)[act]
    order = np.argsort(ids)
    return {
        "ids": ids[order],
        "pos": np.asarray(state.pos)[act][order],
        "vel": np.asarray(state.vel)[act][order],
        "rho": np.asarray(state.rho)[act][order],
        "t": np.float64(sim.t),
        "dt": np.float64(sim.dt),
    }


def check(name, opts, maxiter, make_reference, rtol, atol):
    import numpy as np
    import jax

    # golden refs are backend-specific (the reference regenerates per
    # GPU/build; we key the fingerprint on the XLA backend)
    backend = jax.default_backend()
    suffix = "" if backend == "cpu" else f"_{backend}"
    path = os.path.join(REF_DIR, f"{name}_{maxiter}{suffix}.npz")
    result = run_problem(name, opts, maxiter)
    if make_reference or not os.path.exists(path):
        os.makedirs(REF_DIR, exist_ok=True)
        np.savez_compressed(path, **result)
        print(json.dumps({"problem": name, "status": "reference-written",
                          "path": path}))
        return True

    ref = np.load(path)
    ok = True
    report = {"problem": name, "status": "pass"}
    if not np.array_equal(ref["ids"], result["ids"]):
        ok = False
        report["status"] = "FAIL: particle ids differ"
    else:
        for key in ("pos", "vel", "rho"):
            err = np.abs(result[key] - ref[key]).max()
            report[f"max_d{key}"] = float(err)
            scale = max(1e-12, np.abs(ref[key]).max())
            if err > atol + rtol * scale:
                ok = False
                report["status"] = f"FAIL: {key} drifted"
    report["dt_ref"] = float(ref["dt"])
    report["dt_now"] = float(result["dt"])
    print(json.dumps(report))
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("problem", nargs="?", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--maxiter", type=int, default=200)
    ap.add_argument("--make-reference", action="store_true")
    ap.add_argument("--rtol", type=float, default=5e-4)
    ap.add_argument("--atol", type=float, default=1e-6)
    args, extra = ap.parse_known_args()

    targets = (
        DEFAULT_PROBLEMS
        if args.all
        else {args.problem: DEFAULT_PROBLEMS.get(args.problem, {})}
    )
    ok = True
    for name, opts in targets.items():
        ok &= check(name, opts, args.maxiter, args.make_reference,
                    args.rtol, args.atol)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
