"""Writer dispatcher + text/common writers.

TPU-native counterpart of the reference's Writer registry
(`src/Writer.h:139-220`) and CommonWriter scalar time series
(`src/writers/CommonWriter.cc:53-170`): energy.txt (kinetic/potential/
internal per fluid), WaveGage.txt, and plain-text particle dumps
(`src/writers/TextWriter.cc`).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..framework import SimFramework
from ..ops import eos
from ..state import ParticleState, fluid_num, is_fluid, part_type
from .vtk import VTKWriter


def state_arrays(fw: SimFramework, state: ParticleState,
                 post: Optional[Dict[str, np.ndarray]] = None) -> Dict[str, np.ndarray]:
    """Gather the active particles' writable fields on the host.

    ``post`` is the output of the write-out POSTPROCESS pass
    (:func:`gpusph_tpu.ops.postprocess.make_write_postprocess`); its
    full-capacity arrays are masked to active rows and merged in (Info is
    replaced when surface detection refreshed the FG_SURFACE flags, matching
    the reference's saveParticles POSTPROCESS semantics,
    `src/GPUSPH.cc:1732`)."""
    act = np.asarray(state.active)
    f_num = fluid_num(state.info)
    press = eos.pressure(fw.pp, state.rho, f_num)
    rho_phys = eos.physical_density(fw.pp, state.rho, f_num)
    info = np.asarray(state.info)
    vel = np.asarray(state.vel)
    out = {
        "pos": np.asarray(state.pos)[act],
        "Velocity": vel[act],
        "Pressure": np.asarray(press)[act],
        "Density": np.asarray(rho_phys)[act],
        "Mass": np.asarray(state.mass)[act],
        "Info": info[act],
        "Id": np.asarray(state.id)[act],
    }
    if post:
        for k in ("Vorticity", "Normals"):
            if k in post:
                out[k] = np.asarray(post[k])[act]
        if "Info" in post:
            out["Info"] = np.asarray(post["Info"])[act]
        if "TestpointVel" in post:
            # testpoint rows carry the interpolated values in the dump too
            tp = (np.asarray(state.info)[act] & 7) == 3  # PT_TESTPOINT
            tvel = np.asarray(post["TestpointVel"])[act]
            tpress = np.asarray(post["TestpointPress"])[act]
            out["Velocity"] = np.where(tp[:, None], tvel, out["Velocity"])
            out["Pressure"] = np.where(tp, tpress, out["Pressure"])
    return out


class TextWriter:
    """Plain-text particle dump (reference `src/writers/TextWriter.cc`)."""

    def __init__(self, outdir: str, prefix: str = "PART"):
        self.outdir = outdir
        self.prefix = prefix
        os.makedirs(outdir, exist_ok=True)
        self._index = 0

    def write(self, time: float, arrays: Dict[str, np.ndarray]) -> str:
        path = os.path.join(self.outdir, f"{self.prefix}_{self._index:05d}.txt")
        pos = arrays["pos"]
        vel = arrays["Velocity"]
        press = arrays["Pressure"]
        rho = arrays["Density"]
        info = arrays["Info"]
        with open(path, "w") as f:
            f.write("# x y z vx vy vz rho p type\n")
            for i in range(len(pos)):
                f.write(
                    f"{pos[i,0]:.9g} {pos[i,1]:.9g} {pos[i,2]:.9g} "
                    f"{vel[i,0]:.9g} {vel[i,1]:.9g} {vel[i,2]:.9g} "
                    f"{rho[i]:.9g} {press[i]:.9g} {int(info[i]) & 7}\n"
                )
        self._index += 1
        return path


class CommonWriter:
    """Always-on scalar time series (reference `CommonWriter.cc:53-170`)."""

    def __init__(self, outdir: str, fw: SimFramework, gages=(), n_bodies: int = 0):
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.fw = fw
        self._write_summary()
        self.gages = list(gages)
        self._energy = open(os.path.join(outdir, "energy.txt"), "w")
        self._energy.write("# time kinetic potential internal\n")
        if self.gages:
            self._gage = open(os.path.join(outdir, "WaveGage.txt"), "w")
            self._gage.write("# time " + " ".join(f"z{i}" for i in range(len(self.gages))) + "\n")
        else:
            self._gage = None
        if n_bodies:
            # body kinematics + fluid forces time series (reference
            # rbdata.txt / objectforces.txt, CommonWriter.cc:120-170)
            self._rb = open(os.path.join(outdir, "rbdata.txt"), "w")
            self._rb.write("# time body cgx cgy cgz vx vy vz wx wy wz\n")
            self._objf = open(os.path.join(outdir, "objectforces.txt"), "w")
            self._objf.write("# time body fx fy fz tx ty tz\n")
        else:
            self._rb = self._objf = None
        # volumetric flux through open boundaries (reference IOflux.txt,
        # CommonWriter.cc) -- written when FLUX_COMPUTATION post-process on
        from ..defs import PostProcessType as _PPT

        if _PPT.FLUX_COMPUTATION in fw.postprocess:
            self._ioflux = open(os.path.join(outdir, "IOflux.txt"), "w")
            self._ioflux.write("# time inlet_flux outlet_flux\n")
        else:
            self._ioflux = None

    def write_ioflux(self, time: float, post):
        if self._ioflux is None or not post or "IOflux" not in post:
            return
        q = np.asarray(post["IOflux"])
        self._ioflux.write(f"{time:.9g} {q[0]:.6e} {q[1]:.6e}\n")
        self._ioflux.flush()

    def write_bodies(self, time: float, bodies):
        if self._rb is None or bodies is None:
            return
        cg = np.asarray(bodies.cg)
        lv = np.asarray(bodies.linvel)
        av = np.asarray(bodies.angvel)
        f = np.asarray(bodies.force)
        tq = np.asarray(bodies.torque)
        for b in range(1, len(cg)):
            self._rb.write(
                f"{time:.9g} {b} " + " ".join(f"{v:.9g}" for v in (*cg[b], *lv[b], *av[b])) + "\n"
            )
            self._objf.write(
                f"{time:.9g} {b} " + " ".join(f"{v:.9g}" for v in (*f[b], *tq[b])) + "\n"
            )
        self._rb.flush()
        self._objf.flush()

    def _write_summary(self):
        """Dump every framework/simulation/physical option (the reference's
        CommonWriter summary file, `src/writers/CommonWriter.cc`)."""
        import dataclasses

        fw = self.fw
        with open(os.path.join(self.outdir, "summary.txt"), "w") as f:
            f.write("# gpusph_tpu run summary\n")
            for name in ("kerneltype", "sph_formulation", "boundarytype",
                         "densitydiffusiontype", "periodicbound", "flags"):
                f.write(f"{name} = {getattr(fw, name)!r}\n")
            f.write(f"visc = {fw.visc!r}\n")
            f.write(f"filters = {fw.filters!r}\n")
            f.write(f"postprocess = {fw.postprocess!r}\n")
            for section, obj in (("simparams", fw.sp), ("physparams", fw.pp)):
                f.write(f"[{section}]\n")
                for fld in dataclasses.fields(obj):
                    f.write(f"  {fld.name} = {getattr(obj, fld.name)!r}\n")

    def write_testpoints(self, time: float, state: ParticleState, post):
        """Interpolated velocity/pressure at TESTPOINT particles
        (calcTestpointsVelocityDevice output; reference dumps these rows in
        the particle files — here also as a testpoints.txt series)."""
        if not hasattr(self, "_tp"):
            self._tp = open(os.path.join(self.outdir, "testpoints.txt"), "w")
            self._tp.write("# time point x y z vx vy vz p\n")
        info = np.asarray(state.info)
        act = np.asarray(state.active)
        tp = act & ((info & 7) == 3)
        idx = np.nonzero(tp)[0]
        pos = np.asarray(state.pos)
        vel = np.asarray(post["TestpointVel"])
        press = np.asarray(post["TestpointPress"])
        for k, i in enumerate(idx):
            self._tp.write(
                f"{time:.9g} {k} "
                + " ".join(f"{v:.9g}" for v in (*pos[i], *vel[i], press[i]))
                + "\n"
            )
        self._tp.flush()

    def write(self, time: float, state: ParticleState, post=None):
        # float64 host reductions: order-stable, more accurate than the
        # reference's Kahan-compensated f32 sums (src/kahan.h)
        fluid = np.asarray(is_fluid(state.info) & state.active)
        m = np.where(fluid, np.asarray(state.mass, np.float64), 0.0)
        vel = np.asarray(state.vel, np.float64)
        pos = np.asarray(state.pos, np.float64)
        ekin = 0.5 * float((m * (vel * vel).sum(axis=1)).sum())
        g = np.asarray(self.fw.pp.gravity, np.float64)
        epot = -float((m * (pos @ g)).sum())
        u = state.extra("energy")
        eint = float((m * np.asarray(u, np.float64)).sum()) if u is not None else 0.0
        self._energy.write(
            f"{time:.9g}\t{float(ekin):.9g}\t{float(epot):.9g}\t{eint:.9g}\n"
        )
        self._energy.flush()

        if self._gage is not None:
            # surface-particle elevation average (GPUSPH.cc:1650-1667):
            # Wendland-2D weighted mean of surface-particle z within 2w of
            # the gage; w=0 -> nearest surface particle's z
            info = np.asarray(post["Info"]) if post and "Info" in post else (
                np.asarray(state.info)
            )
            from ..state import FG_SURFACE

            surf = np.asarray(fluid) & ((info & FG_SURFACE) != 0)
            pos = np.asarray(state.pos)[surf]
            if not surf.any():
                # no surface flags available (surface detection not run):
                # fall back to the max-z heuristic over fluid particles
                pos = np.asarray(state.pos)[np.asarray(fluid)]
            heights = []
            for g in self.gages:
                gx, gy = g[0], g[1]
                w = g[2] if len(g) > 2 else 0.0
                r = np.hypot(pos[:, 0] - gx, pos[:, 1] - gy)
                if not len(pos):
                    heights.append(float("nan"))
                elif not surf.any():
                    near = r < 2 * self.fw.sp.slength
                    heights.append(
                        pos[near, 2].max() if near.any() else float("nan"))
                elif w > 0:
                    q = r / w
                    W = np.where(q < 2.0, (1.0 - 0.5 * q) ** 4 * (2.0 * q + 1.0), 0.0)
                    den = W.sum()
                    # no surface particle within 2w: NaN like the reference's
                    # 0/0 (GPUSPH.cc:1693) so missing data stays visible
                    heights.append(
                        float((W * pos[:, 2]).sum() / den) if den > 0
                        else float("nan"))
                else:
                    heights.append(float(pos[np.argmin(r), 2]))
            self._gage.write(
                f"{time:.9g}\t" + "\t".join(f"{h:.9g}" for h in heights) + "\n"
            )
            self._gage.flush()

    def close(self):
        self._energy.close()
        if self._gage:
            self._gage.close()


class WriterDispatcher:
    """Static multi-writer registry with per-writer frequencies
    (reference `Writer::Write/StartWriting/MarkWritten`)."""

    def __init__(self, outdir: str, fw: SimFramework, *, vtk_every=0.0,
                 text_every=0.0, vtklegacy_every=0.0, hot_every=0.0,
                 keep_hot=3, gages=(), n_bodies=0, grid=None):
        self.fw = fw
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.writers = []
        if vtk_every > 0:
            self.writers.append((VTKWriter(os.path.join(outdir, "data")), vtk_every, [0.0]))
        if vtklegacy_every > 0:
            from .vtk import VTKLegacyWriter

            self.writers.append((
                VTKLegacyWriter(
                    os.path.join(outdir, "data"),
                    multifluid=len(fw.pp.fluids) > 1,
                    has_objects=n_bodies > 0,
                ),
                vtklegacy_every, [0.0],
            ))
        if text_every > 0:
            self.writers.append((TextWriter(os.path.join(outdir, "data")), text_every, [0.0]))
        self.common = CommonWriter(outdir, fw, gages=gages, n_bodies=n_bodies)
        from .hotfile import HotWriter

        self.hot = HotWriter(outdir, keep=keep_hot) if hot_every > 0 else None
        self.hot_every = hot_every
        self._next_hot = hot_every
        # write-out POSTPROCESS pass (saveParticles, src/GPUSPH.cc:1732)
        self._post_fn = None
        if grid is not None and fw.postprocess:
            from ..ops.postprocess import make_write_postprocess

            self._post_fn = make_write_postprocess(fw, grid)

    def maybe_write(self, time: float, state: ParticleState, *, dt=0.0, iterations=0,
                    force=False, bodies=None):
        arrays = None
        post = None
        due = force or any(
            time + 1e-12 >= next_t[0] for _, _, next_t in self.writers
        )
        # postprocess (surface detection, testpoints, flux) only when a
        # writer is actually due — gages fall back to the max-z heuristic
        # between writer dues instead of paying the pass per callback
        if due and self._post_fn is not None:
            post = self._post_fn(state)
            if "TestpointPress" in post:
                self.common.write_testpoints(time, state, post)
            self.common.write_ioflux(time, post)
        for writer, every, next_t in self.writers:
            if force or time + 1e-12 >= next_t[0]:
                if arrays is None:
                    arrays = state_arrays(self.fw, state, post)
                writer.write(time, arrays)
                next_t[0] = time + every
        self.common.write(time, state, post)
        self.common.write_bodies(time, bodies)
        if self.hot and (force or time + 1e-12 >= self._next_hot):
            from ..bodies import bodies_to_dict

            self.hot.write(state, t=time, dt=dt, iterations=iterations,
                           body_state=bodies_to_dict(bodies))
            self._next_hot = time + self.hot_every


__all__ = ["TextWriter", "CommonWriter", "WriterDispatcher", "state_arrays"]
