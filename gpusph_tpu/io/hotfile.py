"""HotFile binary checkpoints: save/resume.

TPU-native counterpart of the reference's HotWriter/HotFile
(`src/writers/HotFile.h:45-75`, `HotFile.cc:92-177`): a versioned binary
header {version, buffer_count, particle_count, body_count, numOpenBoundaries,
iterations, t, dt} followed by every per-particle buffer, with rotating
retention.  The encoding here is npz-based (buffers keyed by name) with the
same header *fields* so `hotdiff.py`-style tooling semantics carry over.
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Optional, Tuple

import numpy as np

from ..state import ParticleState

HOT_VERSION = 1


def save_hotfile(
    path: str,
    state: ParticleState,
    *,
    t: float,
    dt: float,
    iterations: int,
    body_count: int = 0,
    num_open_boundaries: int = 0,
    body_state: Optional[dict] = None,
) -> None:
    buffers = {
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "rho": np.asarray(state.rho),
        "mass": np.asarray(state.mass),
        "info": np.asarray(state.info),
        "id": np.asarray(state.id),
    }
    for k, v in state.extras.items():
        buffers[f"extra.{k}"] = np.asarray(v)
    header = dict(
        version=HOT_VERSION,
        buffer_count=len(buffers),
        particle_count=int(state.capacity),
        body_count=body_count,
        numOpenBoundaries=num_open_boundaries,
        iterations=int(iterations),
        t=float(t),
        dt=float(dt),
    )
    np.savez(
        path,
        __header__=json.dumps(header),
        __bodies__=json.dumps(body_state or {}),
        **buffers,
    )


def load_hotfile(path: str) -> Tuple[ParticleState, dict, dict]:
    """Returns (state, header, body_state)."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    header = json.loads(str(z["__header__"]))
    if header["version"] != HOT_VERSION:
        raise ValueError(f"unsupported hotfile version {header['version']}")
    bodies = json.loads(str(z["__bodies__"]))
    extras = {
        k[len("extra."):]: jnp.asarray(z[k]) for k in z.files if k.startswith("extra.")
    }
    state = ParticleState(
        pos=jnp.asarray(z["pos"]),
        vel=jnp.asarray(z["vel"]),
        rho=jnp.asarray(z["rho"]),
        mass=jnp.asarray(z["mass"]),
        info=jnp.asarray(z["info"]),
        id=jnp.asarray(z["id"]),
        extras=extras,
    )
    return state, header, bodies


class HotWriter:
    """Rotating checkpoint writer (reference `HotWriter`, `--checkpoints N`)."""

    def __init__(self, outdir: str, keep: int = 3, prefix: str = "hot"):
        self.outdir = outdir
        self.keep = keep
        self.prefix = prefix
        os.makedirs(outdir, exist_ok=True)
        self._index = 0

    def write(self, state: ParticleState, *, t, dt, iterations, **kw) -> str:
        path = os.path.join(
            self.outdir, f"{self.prefix}_{self._index:05d}.npz"
        )
        save_hotfile(path, state, t=t, dt=dt, iterations=iterations, **kw)
        self._index += 1
        self._rotate()
        return path

    def _rotate(self):
        files = sorted(glob.glob(os.path.join(self.outdir, f"{self.prefix}_*.npz")))
        for f in files[: -self.keep]:
            os.remove(f)

    def latest(self) -> Optional[str]:
        files = sorted(glob.glob(os.path.join(self.outdir, f"{self.prefix}_*.npz")))
        return files[-1] if files else None


__all__ = ["save_hotfile", "load_hotfile", "HotWriter", "HOT_VERSION"]
