"""Command-line entrypoint.

TPU-native counterpart of the reference's `src/main.cc:385-477`: problem
selection, option parsing (`parse_options` `src/main.cc:130`), resume,
checkpointing, and the run loop.  Problems are selected by name at run time
(the reference compiles one executable per problem via `problem_spec`).

Usage:
  python -m gpusph_tpu <ProblemName> [--deltap X] [--tend T] [--maxiter N]
      [--dir OUT] [--resume FILE] [--checkpoint-every S] [--checkpoints N]
      [--repack] [--repack-only] [--key value ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")


def parse_args(argv):
    ap = argparse.ArgumentParser(prog="gpusph_tpu", description=__doc__)
    ap.add_argument("problem", help="problem name (see problems/catalog.py)")
    ap.add_argument("--deltap", type=float, default=None)
    ap.add_argument("--tend", type=float, default=None)
    ap.add_argument("--maxiter", type=int, default=None)
    ap.add_argument("--dir", default=None, help="output directory")
    ap.add_argument("--resume", default=None, help="hotfile to resume from")
    ap.add_argument(
        "--checkpoint-every", type=float, default=0.0,
        help="simulated seconds between hotfile checkpoints",
    )
    ap.add_argument("--checkpoints", type=int, default=3, help="hotfiles kept")
    ap.add_argument("--repack", action="store_true", help="run repacking first")
    ap.add_argument("--repack-only", action="store_true")
    ap.add_argument("--device", default=None, help="ignored (XLA owns devices)")
    ap.add_argument(
        "--ndev", type=int, default=1,
        help="devices to shard over (slab decomposition over a 1-D mesh; "
        "the analogue of the reference's --gpudirect multi-GPU run). "
        "Without N real chips set JAX_PLATFORMS=cpu "
        "XLA_FLAGS=--xla_force_host_platform_device_count=N",
    )
    ap.add_argument("--debug", default="", help="comma list of debug flags")
    args, extra = ap.parse_known_args(argv)

    # free-form --key value options forwarded to the problem (main.cc:254-259)
    opts = {}
    i = 0
    while i < len(extra):
        tok = extra[i]
        if tok.startswith("--"):
            key = tok[2:]
            if i + 1 < len(extra) and not extra[i + 1].startswith("--"):
                opts[key] = extra[i + 1]
                i += 2
            else:
                opts[key] = "true"
                i += 1
        else:
            i += 1
    return args, opts


def main(argv=None):
    args, opts = parse_args(sys.argv[1:] if argv is None else argv)

    from .integrator import Simulator
    from .io.hotfile import load_hotfile
    from .io.writers import WriterDispatcher
    from .problems.base import get_problem

    if args.deltap is not None:
        opts.setdefault("deltap", args.deltap)
    problem = get_problem(args.problem)(opts)
    if args.deltap is not None and problem.deltap != args.deltap:
        problem.set_deltap(args.deltap)
    if args.tend is not None:
        problem.set_tend(args.tend)

    grid, state = problem.build()
    fw = problem.fw.finalize()
    outdir = args.dir or f"tests/{problem.name}_{time.strftime('%Y%m%dT%H%M%S')}"

    if args.ndev and args.ndev > 1:
        from .parallel.runner import ShardedSimulator

        sim = ShardedSimulator(fw, grid, ndev=args.ndev,
                               bodies_specs=problem.body_specs())
    else:
        sim = Simulator(fw, grid, bodies_specs=problem.body_specs())
    n = int(state.count_active())
    print(f"Problem {problem.name}: {n} particles, grid {grid.ncells}"
          + (f", {args.ndev} devices" if args.ndev > 1 else ""))

    debug_flags = set(f for f in args.debug.split(",") if f)
    if "timing" in debug_flags:
        # per-phase wall-time accounting (the reference's
        # --debug benchmark_command_runtimes, GPUSPH.cc:108-131)
        from .profiling import phase_report

        phase_report(fw, grid, state, bodies_specs=problem.body_specs())

    if args.repack or args.repack_only:
        from .repacking import run_repacking

        # repacking is a short settle pass — run it single-device like the
        # reference's repack-then-simulate sequence
        rsim = sim if args.ndev <= 1 else Simulator(
            fw, grid, bodies_specs=problem.body_specs())
        state = run_repacking(rsim, state, outdir=outdir)
        if args.repack_only:
            return 0

    if args.resume:
        from .bodies import bodies_from_dict

        state, header, body_dict = load_hotfile(args.resume)
        sim.t = header["t"]
        sim.dt = header["dt"]
        sim.iterations = header["iterations"]
        sim.bodies = bodies_from_dict(body_dict)
        print(f"Resumed from {args.resume} @ t={sim.t} it={sim.iterations}")

    writers = WriterDispatcher(
        outdir,
        fw,
        vtk_every=problem.vtk_write_every,
        vtklegacy_every=problem.writer_freqs.get("vtklegacy", 0.0),
        text_every=problem.writer_freqs.get("text", 0.0),
        hot_every=args.checkpoint_every,
        keep_hot=args.checkpoints,
        gages=problem.gages,
        n_bodies=len(sim.bodies_specs),
        grid=grid,
    )

    freqs = [problem.vtk_write_every] + list(problem.writer_freqs.values())
    freqs = [f for f in freqs if f and f > 0]
    write_every = min(freqs) if freqs else 0.0

    def on_write(s: Simulator, st):
        writers.maybe_write(
            s.t, st, dt=s.dt, iterations=s.iterations, bodies=s.bodies,
        )
        print(
            f"iter {s.iterations} t={s.t:.6g} dt={s.dt:.6g} "
            f"parts {n} MIPPS {s.mipps:.3f}"
        )

    state = sim.run(
        state,
        tend=args.tend,
        maxiter=args.maxiter,
        on_write=on_write,
        write_every=write_every,
    )
    print(
        f"Simulation end: t={sim.t:.6g}, {sim.iterations} iterations, "
        f"total MIPPS {sim.mipps:.3f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
