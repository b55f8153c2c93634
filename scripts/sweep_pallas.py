#!/usr/bin/env python
"""Sweep the Pallas forces-kernel geometry knobs (B, TS, SPAN) on the real
chip by running bench.py in a subprocess per config (ONE TPU process at a
time).  Prints a result table and the best config.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (B, TS, SPAN)
    (64, 256, 16),   # current defaults
    (64, 128, 16),
    (64, 128, 8),
    (32, 128, 8),
    (64, 128, 4),
    (128, 128, 8),
]


def run(cfg, extra_env=None):
    b, ts, span = cfg
    env = dict(os.environ)
    env.update(GTPU_B=str(b), GTPU_TS=str(ts), GTPU_SPAN=str(span))
    if extra_env:
        env.update(extra_env)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    line = None
    for ln in p.stdout.splitlines():
        if ln.startswith("{"):
            line = ln
    if line is None:
        return dict(error=(p.stderr or "no output")[-400:])
    return json.loads(line)


def main():
    results = []
    for cfg in CONFIGS:
        r = run(cfg)
        rate = r.get("value")
        print(json.dumps({"cfg": cfg, "rate": rate,
                          "err": r.get("error")}), flush=True)
        results.append((cfg, rate or 0.0))
    best = max(results, key=lambda x: x[1])
    print(json.dumps({"best_cfg": best[0], "best_rate": best[1]}))


if __name__ == "__main__":
    main()
