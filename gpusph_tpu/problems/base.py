"""Problem API: declarative scene construction.

TPU-native re-design of the reference's user-facing problem layer:
``ProblemCore`` (`src/ProblemCore.h:522-682`) + the declarative geometry API
``ProblemAPI<1>`` (`src/problem_api/ProblemAPI_1.h:49-307`).  A Problem
subclass configures the framework in ``__init__`` (the SETUP_FRAMEWORK
analogue is :func:`gpusph_tpu.framework.setup_framework`), declares geometry
with ``add_box/add_sphere/...`` and then ``build()`` produces the
(grid, initial ParticleState) pair — the equivalent of the reference's
``fill_parts`` + ``copy_to_array`` (`src/GPUSPH.cc:252,397`).

Problems are selected at run time by name from the registry (the reference
selects at compile time via `problem_spec`, `src/problem_spec.h:36-42`).
"""
from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from ..defs import ParticleType, Periodicity
from ..defs import SimFlags as _SimFlags
from ..defs import SPHFormulation as _SPHFormulation
from ..framework import SimFramework, setup_framework
from ..geometry import primitives as geo
from ..ops import eos
from ..ops.neighbors import CellGrid, make_grid
from ..params import Fluid, PhysParams, SimParams
from ..state import (
    FG_COMPUTE_FORCE,
    FG_MOVING_BOUNDARY,
    FG_SEDIMENT,
    ParticleState,
    empty_state,
)


class GeometryType(enum.IntEnum):
    """Reference `src/problem_api/ProblemAPI_1.h:49-63`."""

    FLUID = 0
    FIXED_BOUNDARY = 1
    OPENBOUNDARY = 2
    FLOATING_BODY = 3
    MOVING_BODY = 4
    PLANE = 5
    DEM = 6
    TESTPOINT = 7


class FillType(enum.IntEnum):
    """Reference `src/problem_api/ProblemAPI_1.h:64-70`."""

    NOFILL = 0
    SOLID = 1
    BORDER = 2


@dataclasses.dataclass
class Geometry:
    """One placed geometry (reference's GeometryInfo)."""

    gtype: GeometryType
    points: np.ndarray  # [n,3] float64 particle positions
    fluid_idx: int = 0
    object_idx: int = 0
    # per-particle mass override: a scalar for uniform mass, or an [n]
    # ndarray for per-particle masses (add_hdf5_file stores rho0*Volume
    # per particle; build() handles both via np.ndim)
    mass: Optional[Union[float, np.ndarray]] = None
    density: Optional[float] = None
    velocity: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    feedback: bool = False  # enableFeedback: accumulate forces on this body
    # setParticleMassByDensity analogue: m = dp^3 * physical_density(rho_init)
    # per particle (reference ProblemAPI_1.cc setParticleMassByDensity +
    # RTInstability.cu:207)
    mass_by_density: bool = False
    # granular sediment phase: sets FG_SEDIMENT on the particles
    # (reference DamBreakMobileBed.cu:178)
    sediment: bool = False
    # rigid-body overrides (reference Object::SetMass/SetInertia): total
    # body mass and body-frame diagonal inertia; default = estimated from
    # the particle cloud
    body_mass: Optional[float] = None
    inertia: Optional[Tuple[float, float, float]] = None


@dataclasses.dataclass
class Plane:
    """Geometric plane boundary (reference `src/planes.h`)."""

    point: Tuple[float, float, float]
    normal: Tuple[float, float, float]


PROBLEM_REGISTRY: Dict[str, type] = {}


class Problem:
    """Base class for user problems (reference `ProblemCore`/`XProblem`)."""

    name = "Problem"

    def __init__(self, options: Optional[dict] = None):
        self.options = dict(options or {})
        self.geometries: List[Geometry] = []
        self.planes: List[Plane] = []
        self.testpoints: List[Tuple[float, float, float]] = []
        self.gages: List[Tuple[float, float]] = []  # (x, y) wave gage positions
        self.origin = (0.0, 0.0, 0.0)
        self.size = (1.0, 1.0, 1.0)
        self.deltap = 0.0
        self.fw: SimFramework = SimFramework()
        self.water_level: Optional[float] = None  # hydrostatic init level
        self.max_fall: Optional[float] = None
        self.dyn_layers = 3
        self._moving_body_count = 0
        self.vtk_write_every = 0.0
        self.writer_freqs: Dict[str, float] = {}  # extra writers (legacy/text)
        self.body_motion: Dict[int, Callable] = {}  # object_idx -> motion cb
        self.sa_meshes: List[dict] = []  # SA boundary meshes (sa_mesh dicts)
        self.inlet_reserve: int = 0  # spare slots for inlet-created parts

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        PROBLEM_REGISTRY[cls.__name__] = cls

    # --- options (reference `src/Options.h:125-165`) -----------------------
    def get_option(self, name: str, default):
        v = self.options.get(name, default)
        if isinstance(default, bool) and isinstance(v, str):
            return v.lower() in ("1", "true", "yes", "on")
        if default is not None and not isinstance(v, type(default)):
            try:
                return type(default)(v)
            except (TypeError, ValueError):
                return v
        return v

    # --- framework setup ---------------------------------------------------
    def setup_framework(self, **kwargs):
        """SETUP_FRAMEWORK analogue (reference `src/ProblemCore.h:117`)."""
        self.fw = setup_framework(**kwargs)
        return self.fw

    def simparams(self) -> SimParams:
        return self.fw.simparams

    def physparams(self) -> PhysParams:
        return self.fw.physparams

    def _update_sp(self, **kw):
        self.fw = dataclasses.replace(
            self.fw, simparams=dataclasses.replace(self.fw.simparams, **kw)
        )

    def _update_pp(self, **kw):
        self.fw = dataclasses.replace(
            self.fw, physparams=dataclasses.replace(self.fw.physparams, **kw)
        )

    def set_deltap(self, dp: float):
        self.deltap = dp
        self._update_sp(deltap=dp)

    def set_smoothing(self, sfactor: float):
        self._update_sp(sfactor=sfactor)

    def set_timestep(self, dt: float):
        self._update_sp(dt=dt)

    def set_tend(self, tend: float):
        self._update_sp(tend=tend)

    def set_gravity(self, gz_or_vec):
        g = (0.0, 0.0, float(gz_or_vec)) if not isinstance(gz_or_vec, (tuple, list)) else tuple(gz_or_vec)
        self._update_pp(gravity=g)

    def get_gravity_magnitude(self) -> float:
        return float(np.linalg.norm(self.fw.pp.gravity))

    def set_max_fall(self, h: float):
        self.max_fall = h

    def set_water_level(self, level: float):
        self.water_level = level

    def add_fluid(self, rho0: float):
        """Append a fluid (reference `ProblemCore::add_fluid`).  The first
        call replaces the placeholder default fluid."""
        self._fluids_added = getattr(self, "_fluids_added", 0) + 1
        if self._fluids_added == 1:
            new = (Fluid(rho0=rho0),)
        else:
            new = self.fw.pp.fluids + (Fluid(rho0=rho0),)
        self._update_pp(fluids=new)
        return len(new) - 1

    def set_equation_of_state(self, fluid_idx: int, gamma: float, c0: float):
        """c0 <= 0 means: derive from max fall height as 10*sqrt(2 g H)
        (reference `ProblemCore::set_equation_of_state`)."""
        if c0 <= 0:
            if self.max_fall is None:
                raise ValueError("set_max_fall before auto sound speed")
            c0 = 10.0 * math.sqrt(2 * self.get_gravity_magnitude() * self.max_fall)
        f = dataclasses.replace(self.fw.pp.fluids[fluid_idx], gamma=gamma, c0=c0)
        self._update_pp(fluids=_tset(self.fw.pp.fluids, fluid_idx, f))

    def set_kinematic_visc(self, fluid_idx: int, nu: float):
        f = dataclasses.replace(self.fw.pp.fluids[fluid_idx], kinematic_visc=nu)
        self._update_pp(fluids=_tset(self.fw.pp.fluids, fluid_idx, f))

    def set_dynamic_visc(self, fluid_idx: int, mu: float):
        fl = self.fw.pp.fluids[fluid_idx]
        self.set_kinematic_visc(fluid_idx, mu / fl.rho0)

    def set_artificial_visc(self, alpha: float):
        self._update_pp(artvisccoeff=alpha)

    def set_gravity_callback(self, fn):
        """Variable gravity: traceable ``t -> (gx, gy, gz)`` evaluated before
        every forces pass (reference ``ProblemCore::g_callback`` +
        ``simparams()->gcallback``, used by Seiche)."""
        self.fw = dataclasses.replace(self.fw, gcallback=fn)

    def set_dynamic_boundaries_layers(self, n: int):
        self.dyn_layers = n

    def get_dynamic_boundaries_layers(self) -> int:
        return self.dyn_layers

    def add_writer(self, writer_type=None, freq: float = 0.0):
        """Register a particle-dump writer (reference ``add_writer``,
        `src/ProblemCore.cc`).  Default/unknown types map to the VTK writer;
        ``WriterType.VTKLEGACYWRITER``/``TEXTWRITER`` select those formats."""
        from ..defs import WriterType

        if writer_type == WriterType.VTKLEGACYWRITER:
            self.writer_freqs["vtklegacy"] = freq
        elif writer_type == WriterType.TEXTWRITER:
            self.writer_freqs["text"] = freq
        else:
            self.vtk_write_every = freq

    def add_gage(self, x: float, y: float, w: float = 0.0):
        """Wave gage at (x, y) (reference ``add_gage``, `ProblemCore.h:477`).
        ``w`` is the gage smoothing length: surface-particle elevations are
        Wendland-2D averaged within 2w of the gage (GPUSPH.cc:1650-1667);
        w=0 takes the nearest surface particle's z."""
        self.gages.append((x, y, w))

    # --- geometry ----------------------------------------------------------
    def make_universe_box(self, origin, size):
        self.origin = tuple(float(x) for x in origin)
        self.size = tuple(float(x) for x in size)

    def _add(self, g: Geometry):
        self.geometries.append(g)
        return len(self.geometries) - 1

    def add_box(self, gtype: GeometryType, fill: FillType, origin, sx, sy, sz, **kw):
        dp = self.deltap
        if fill == FillType.SOLID:
            pts = geo.fill_box(origin, (sx, sy, sz), dp)
        elif fill == FillType.BORDER:
            layers = self.dyn_layers if self.fw.dyn_boundary else 1
            pts = geo.fill_box_border(origin, (sx, sy, sz), dp, layers=layers, **{
                k: v for k, v in kw.items() if k == "open_top"})
            kw.pop("open_top", None)
        else:
            pts = np.zeros((0, 3))
        return self._add(Geometry(gtype, pts, **kw))

    def add_sphere(self, gtype, fill, center, radius, **kw):
        solid = fill == FillType.SOLID
        layers = self.dyn_layers if (self.fw.dyn_boundary and not solid) else 1
        pts = geo.fill_sphere(center, radius, self.deltap, solid=solid, layers=layers)
        return self._add(Geometry(gtype, pts, **kw))

    def add_cylinder(self, gtype, fill, center_base, radius, height, **kw):
        solid = fill == FillType.SOLID
        layers = self.dyn_layers if (self.fw.dyn_boundary and not solid) else 1
        pts = geo.fill_cylinder(
            center_base, radius, height, self.deltap, solid=solid, layers=layers
        )
        return self._add(Geometry(gtype, pts, **kw))

    def add_points(self, gtype, pts: np.ndarray, **kw):
        """Raw particle positions (the XYZFile/HDF5File reader analogue)."""
        return self._add(Geometry(gtype, np.asarray(pts, np.float64), **kw))

    def add_stl_mesh(self, gtype, path: str, **kw):
        """Surface-fill an STL mesh (reference `addSTLMesh`,
        `src/problem_api/ProblemAPI_1.h:288`)."""
        from ..geometry.stl import fill_stl_surface, load_stl

        tris = load_stl(path)
        pts = fill_stl_surface(tris, self.deltap)
        gid = self._add(Geometry(gtype, pts, **kw))
        self.geometries[gid].mesh_tris = tris  # for erase predicates
        return gid

    def add_xyz_file(self, gtype, path: str, **kw):
        """Load raw particle positions from a whitespace xyz file
        (reference `XYZReader`)."""
        pts = np.loadtxt(path, usecols=(0, 1, 2), ndmin=2)
        return self.add_points(gtype, pts, **kw)

    def add_hdf5_file(self, gtype, path: str, *, velocity_driven=True, **kw):
        """Load a Crixus .h5sph file (reference ``addHDF5File``,
        `ProblemAPI_1.cc:1890-2030` + `HDF5SphReader.cc`).

        GT_FLUID files become fluid points with mass = rho0*Volume per
        particle; boundary files (SA) become an SA mesh (vertex particles +
        boundary elements).  GT_OPENBOUNDARY marks the mesh as an inlet with
        ``velocity_driven`` semantics (reference setVelocityDriven)."""
        from ..io.hdf5sph import h5sph_fluid, h5sph_sa_mesh, read_h5sph

        data = read_h5sph(path)
        if gtype == GeometryType.FLUID:
            pts, vol = h5sph_fluid(data)
            rho0 = self.fw.pp.fluids[kw.get("fluid_idx", 0)].rho0
            return self.add_points(gtype, pts, mass=rho0 * vol, **kw)
        io = None
        if gtype == GeometryType.OPENBOUNDARY:
            io = ("inlet", bool(velocity_driven))
        self.sa_meshes.append(h5sph_sa_mesh(data, io=io))
        return len(self.sa_meshes) - 1

    def add_plane(self, point, normal):
        self.planes.append(Plane(tuple(point), tuple(normal)))

    def set_io(self, *, imposed_vel=None, imposed_press=None, outflow=None,
               depth_boxes=()):
        """Open-boundary conditions (reference imposeBoundaryConditionHost /
        the problem's IO device callbacks): traceable ``imposed_vel(pos, t)``
        / ``imposed_press(pos, t[, waterdepth])`` + ``outflow(pos)`` kill
        region.  ``depth_boxes`` — static AABBs ((lo),(hi)), one per open
        boundary wanting the FIND_MAX_IOWATERDEPTH reduction; their max
        fluid z is passed as ``waterdepth`` (f32[n_boxes]) to a 3-argument
        ``imposed_press``."""
        from ..defs import SimFlags
        from ..ops.io_boundary import IOSpec

        self.fw = dataclasses.replace(
            self.fw,
            io=IOSpec(imposed_vel=imposed_vel, imposed_press=imposed_press,
                      outflow=outflow,
                      depth_boxes=tuple(
                          (tuple(lo), tuple(hi)) for lo, hi in depth_boxes)),
            flags=self.fw.flags | SimFlags.ENABLE_INLET_OUTLET,
        )

    def add_sa_box(self, origin, size, *, faces="all", outward=False):
        """SA boundary box: vertex particles + triangular boundary elements
        (the procedural equivalent of the reference's Crixus HDF5 input,
        `ProblemAPI_1.cc:1998-2014`).  Requires BoundaryType.SA_BOUNDARY.
        ``outward=True`` makes an obstacle box (normals toward the fluid
        outside)."""
        from ..geometry.sa_mesh import box_sa_mesh

        mesh = box_sa_mesh(origin, size, self.deltap, faces=faces,
                           outward=outward)
        self.sa_meshes.append(mesh)
        return len(self.sa_meshes) - 1

    def add_sa_plate(self, origin, u_vec, v_vec, normal, *, io=None,
                     periodic_u=False, periodic_v=False):
        """Single SA wall plate; ``io=("inlet", velocity_driven)`` /
        ``("outlet", velocity_driven)`` marks it as an open boundary
        (reference Crixus IO meshes, `ProblemAPI_1.cc` setInletOutlet)."""
        from ..geometry.sa_mesh import plate_sa_mesh

        mesh = plate_sa_mesh(origin, u_vec, v_vec, normal, self.deltap,
                             periodic_u=periodic_u, periodic_v=periodic_v)
        if io is not None:
            mesh["io"] = io
        self.sa_meshes.append(mesh)
        return len(self.sa_meshes) - 1

    def add_testpoint(self, p):
        self.testpoints.append(tuple(p))

    def add_postprocess(self, pp):
        """Enable a post-process engine (reference ``addPostProcess``,
        `src/ProblemCore.h`)."""
        if pp not in self.fw.postprocess:
            self.fw = dataclasses.replace(
                self.fw, postprocess=self.fw.postprocess + (pp,)
            )

    def rotate(self, geom_id: int, rx: float, ry: float, rz: float, center=None):
        """Rotate a geometry about ``center`` (default: its min corner, the
        reference's rotation-center convention) by sequential X, Y, Z axis
        rotations (ProblemAPI_1::rotate semantics,
        `src/problem_api/ProblemAPI_1.cc`)."""
        g = self.geometries[geom_id]
        if center is None:
            center = g.points.min(axis=0)
        for axis, ang in ((0, rx), (1, ry), (2, rz)):
            if ang:
                g.points = geo.rotate_axis(g.points, center, axis, ang)

    def enable_feedback(self, geom_id: int):
        self.geometries[geom_id].feedback = True

    def erase_fluid_inside(self, predicate):
        for g in self.geometries:
            if g.gtype == GeometryType.FLUID:
                g.points = geo.erase_inside(g.points, predicate)

    # --- initial conditions -----------------------------------------------
    def _hydrostatic_filling(self) -> bool:
        """Hydrostatic density filling applies with a single fluid and purely
        vertical gravity (reference `ProblemAPI_1.cc:331-344`)."""
        g = self.fw.pp.gravity
        return (
            self.fw.pp.num_fluids == 1 and g[0] == 0.0 and g[1] == 0.0 and g[2] != 0.0
        )

    def initial_density(self, pts: np.ndarray, fluid_idx: int) -> np.ndarray:
        """Relative density at particle positions: hydrostatic below the water
        level (auto-computed from the highest fluid particle when unset,
        reference `ProblemAPI_1.cc:308-311,1770-1791`)."""
        if self.water_level is None or not self._hydrostatic_filling():
            return np.zeros(len(pts))
        depth = np.maximum(0.0, self.water_level - pts[:, 2])
        rt = eos.hydrostatic_density(self.fw.pp, jnp.asarray(depth, jnp.float32), fluid_idx)
        return np.asarray(rt, np.float64)

    # --- bodies ------------------------------------------------------------
    def set_body_motion(self, geom_id: int, motion):
        """Prescribed traceable kinematics ``motion(t) -> (linvel, angvel)``
        for a moving body (reference `moving_bodies_callback`)."""
        self.body_motion[geom_id] = motion

    def body_specs(self):
        """BodySpec list for MOVING/FLOATING geometries (built during
        ``build()``, which assigns the object indices)."""
        from ..bodies import BodySpec

        specs = []
        for gid, g in enumerate(self.geometries):
            if g.gtype not in (GeometryType.MOVING_BODY, GeometryType.FLOATING_BODY):
                continue
            n = max(1, len(g.points))
            mass = (g.mass if g.mass is not None else
                    (g.density or self.fw.pp.fluids[0].rho0) * self.deltap**3)
            total_mass = g.body_mass if g.body_mass is not None else mass * n
            if g.inertia is not None:
                # analytic body-frame inertia (reference Object::SetInertia)
                inertia = tuple(max(float(i), 1e-9) for i in g.inertia)
            else:
                # crude inertia from the particle cloud (diagonal)
                pts = (g.points - g.points.mean(axis=0)
                       if len(g.points) else np.zeros((1, 3)))
                pm = total_mass / n
                inertia = tuple(
                    float(pm * ((pts**2).sum() - (pts[:, a] ** 2).sum()))
                    for a in range(3)
                )
                inertia = tuple(max(i, 1e-9) for i in inertia)
            specs.append(
                BodySpec(
                    object_idx=g.object_idx,
                    mass=total_mass,
                    inertia=inertia,
                    floating=g.gtype == GeometryType.FLOATING_BODY,
                    motion=self.body_motion.get(gid),
                )
            )
        return tuple(specs)

    # --- build -------------------------------------------------------------
    def num_particles(self) -> int:
        return sum(len(g.points) for g in self.geometries)

    def build(self, capacity: Optional[int] = None) -> Tuple[CellGrid, ParticleState]:
        """Assemble grid + initial particle state (fill_parts + copy_to_array)."""
        from ..defs import SimFlags

        if any(
            g.gtype in (GeometryType.MOVING_BODY, GeometryType.FLOATING_BODY)
            for g in self.geometries
        ):
            self.fw = dataclasses.replace(
                self.fw, flags=self.fw.flags | SimFlags.ENABLE_MOVING_BODIES
            )
        if self.planes:
            self.fw = dataclasses.replace(
                self.fw,
                flags=self.fw.flags | SimFlags.ENABLE_PLANES,
                planes=tuple((p.point, p.normal) for p in self.planes),
            )
        if self.testpoints:
            # declaring test points implies the TESTPOINTS post-process pass
            # (reference addPostProcess(TESTPOINTS), e.g. DamBreak3D.cu:63)
            from ..defs import PostProcessType

            if PostProcessType.TESTPOINTS not in self.fw.postprocess:
                self.fw = dataclasses.replace(
                    self.fw,
                    postprocess=self.fw.postprocess
                    + (PostProcessType.TESTPOINTS,),
                )
        if self.gages:
            # wave gages average SURFACE-flagged particle elevations
            # (GPUSPH.cc:1650-1667), so gages imply surface detection
            from ..defs import PostProcessType

            if PostProcessType.SURFACE_DETECTION not in self.fw.postprocess:
                self.fw = dataclasses.replace(
                    self.fw,
                    postprocess=self.fw.postprocess
                    + (PostProcessType.SURFACE_DETECTION,),
                )
        # generic override of the cell capacity (the CHECK_NEIBSNUM analogue
        # of the reference's resize_neiblist), e.g. --max_ppc 64
        max_ppc = self.get_option("max_ppc", 0)
        if max_ppc:
            self._update_sp(max_parts_per_cell=int(max_ppc))
        self.fw = self.fw.finalize()

        # auto-size the cell capacity from the actual initial occupancy
        # (walls stack layers in corner cells well above the bulk lattice
        # density) plus headroom for transient compression; the runtime
        # CHECK_NEIBSNUM-style abort still guards the margin
        if not max_ppc and self.fw.sp.max_parts_per_cell == SimParams().max_parts_per_cell:
            # probe with the same (SA-expanded) radius the real grid uses
            probe_radius = self.fw.influenceradius
            if self.sa_meshes:
                probe_radius += 0.5 * self.deltap
            probe = make_grid(
                self.origin, self.size, probe_radius,
                periodic=self.fw.periodicbound,
            )
            occ = 1.0
            for cs_ in probe.cell_size:
                occ *= cs_ / self.deltap
            occ0 = 0
            pts = [g.points for g in self.geometries if len(g.points)]
            # SA meshes contribute vertex + segment particles to the cells
            for mesh in self.sa_meshes:
                pts.append(mesh["verts"])
                pts.append(mesh["seg_pos"])
            if pts:
                allp = np.concatenate(pts)
                ijk = np.clip(
                    np.floor(
                        (allp - np.asarray(probe.origin)) / np.asarray(probe.cell_size)
                    ).astype(np.int64),
                    0,
                    np.asarray(probe.ncells) - 1,
                )
                a0, a1, a2 = probe.order
                n0, n1 = probe.ncells[a0], probe.ncells[a1]
                lin = (ijk[:, a2] * n1 + ijk[:, a1]) * n0 + ijk[:, a0]
                counts = np.bincount(lin, minlength=probe.n_cells)
                occ0 = int(counts.max())
                # max particles over SPAN+2 consecutive fast-axis cells (the
                # Pallas candidate-run extent; walls are static so a modest
                # margin suffices)
                from ..ops.forces_pallas import SPAN

                cgrid = counts.reshape(
                    probe.ncells[a2], probe.ncells[a1], probe.ncells[a0]
                )
                csum = np.zeros(
                    (cgrid.shape[0], cgrid.shape[1], cgrid.shape[2] + 1),
                    np.int64,
                )
                np.cumsum(cgrid, axis=2, out=csum[:, :, 1:])
                wlen = min(SPAN + 2, cgrid.shape[2])
                runw = csum[:, :, wlen:] - csum[:, :, :-wlen]
                runmax = int(runw.max()) if runw.size else int(cgrid.sum())
                run_extent = int(-(-int(runmax * 1.15 + 16) // 8) * 8)
                self._update_sp(max_run_extent=run_extent)
            # SA walls pack segments + vertices between the fluid layers and
            # the fluid settles toward them: wider transient margin
            m0 = 1.4 if self.sa_meshes else 1.15
            k_auto = max(int(occ * 1.7 + 8), int(occ0 * m0 + 8))
            k_auto = -(-k_auto // 8) * 8
            if k_auto > self.fw.sp.max_parts_per_cell:
                self._update_sp(max_parts_per_cell=k_auto)
            self.fw = self.fw.finalize()
        dp = self.deltap
        if dp <= 0:
            raise ValueError("set_deltap first")

        # auto LJ dcoeff from max fall height (reference ProblemCore defaults)
        if self.fw.repulsive_boundary and self.fw.pp.dcoeff == 0.0:
            H = self.max_fall or self.size[2]
            self._update_pp(dcoeff=5.0 * self.get_gravity_magnitude() * H)
            self.fw = self.fw.finalize()

        # SA boundary elements interact through their whole triangle, not
        # just the barycenter: expand the neighbor-search radius by dp/2
        # like the reference (boundNlSqInflRad, GPUWorker.cc:1890)
        nl_radius = self.fw.influenceradius
        if self.sa_meshes:
            nl_radius += 0.5 * dp
        grid = make_grid(
            self.origin, self.size, nl_radius,
            periodic=self.fw.periodicbound,
        )

        # auto water level: highest fluid particle (ProblemAPI_1.cc:308-311)
        if self.water_level is None and self._hydrostatic_filling():
            zs = [
                g.points[:, 2].max()
                for g in self.geometries
                if g.gtype == GeometryType.FLUID and len(g.points)
            ]
            if zs:
                self.water_level = float(max(zs)) + self.deltap / 2

        pos_list, vel_list, rho_list, mass_list, info_list = [], [], [], [], []
        obj_idx = 0
        for g in self.geometries:
            n = len(g.points)
            if n == 0:
                continue
            pts = g.points
            if g.gtype == GeometryType.FLUID:
                ptype = ParticleType.FLUID
                flags = 0
                fluid_or_obj = g.fluid_idx
            elif g.gtype in (GeometryType.FIXED_BOUNDARY, GeometryType.OPENBOUNDARY):
                ptype = ParticleType.BOUNDARY
                flags = 0
                fluid_or_obj = g.fluid_idx
            elif g.gtype in (GeometryType.MOVING_BODY, GeometryType.FLOATING_BODY):
                ptype = ParticleType.BOUNDARY
                obj_idx += 1
                g.object_idx = obj_idx
                # floating bodies always need the fluid-force feedback
                feedback = g.feedback or g.gtype == GeometryType.FLOATING_BODY
                flags = FG_MOVING_BOUNDARY | (FG_COMPUTE_FORCE if feedback else 0)
                fluid_or_obj = obj_idx
            elif g.gtype == GeometryType.TESTPOINT:
                ptype = ParticleType.TESTPOINT
                flags = 0
                fluid_or_obj = 0
            else:
                continue

            rho0 = (
                g.density
                if g.density is not None
                else self.fw.pp.fluids[g.fluid_idx].rho0
            )
            mass = g.mass if g.mass is not None else rho0 * dp**3
            if ptype == ParticleType.FLUID or (
                ptype == ParticleType.BOUNDARY and self.fw.dyn_boundary
            ):
                # DYN boundaries are hydrostatically filled too
                # (reference ProblemAPI_1.cc:1772)
                rho_t = self.initial_density(pts, g.fluid_idx)
            else:
                rho_t = np.zeros(n)

            if g.sediment:
                flags = flags | FG_SEDIMENT
            pos_list.append(pts)
            v = np.broadcast_to(np.asarray(g.velocity, np.float64), (n, 3))
            vel_list.append(v)
            rho_list.append(rho_t)
            if g.mass_by_density:
                # m = dp^3 * physical_density(rho_init) per particle
                mass_list.append(dp**3 * (np.asarray(rho_t) + 1.0) * rho0)
            elif np.ndim(mass):
                # per-particle masses (h5sph rho0*Volume, ProblemAPI_1.cc:1959)
                mass_list.append(np.asarray(mass, np.float64))
            else:
                mass_list.append(np.full(n, mass))
            packed = (
                np.uint32(int(ptype))
                | np.uint32(flags)
                | (np.uint32(fluid_or_obj & 0xFF) << 16)
            )
            info_list.append(np.full(n, packed, np.uint32))

        n_total = sum(len(p) for p in pos_list)
        for p in self.testpoints:
            pos_list.append(np.asarray([p]))
            vel_list.append(np.zeros((1, 3)))
            rho_list.append(np.zeros(1))
            mass_list.append(np.zeros(1))
            info_list.append(
                np.full(1, np.uint32(int(ParticleType.TESTPOINT)), np.uint32)
            )
            n_total += 1

        # SA boundary meshes: vertex particles + segment (boundary-element)
        # particles with their normals / vertex offsets recorded for extras
        sa_rows = []  # (start, normals, vr or None)
        sa_vert_rows = []  # (start, verts, is_io) for corner identification
        rho0_0 = self.fw.pp.fluids[0].rho0
        for mesh in self.sa_meshes:
            # open-boundary meshes: FG_INLET/FG_OUTLET(+FG_VELOCITY_DRIVEN)
            # on their vertex and segment rows (reference IO_BOUNDARY flags)
            ioflag = np.uint32(0)
            io_kind = mesh.get("io")
            if io_kind:
                from ..state import (FG_INLET as _FI, FG_OUTLET as _FO,
                                     FG_VELOCITY_DRIVEN as _FV)

                ioflag = np.uint32(_FI if io_kind[0] == "inlet" else _FO)
                if io_kind[1]:
                    ioflag |= np.uint32(_FV)
            nv = len(mesh["verts"])
            pos_list.append(mesh["verts"])
            vel_list.append(np.zeros((nv, 3)))
            rho_list.append(np.zeros(nv))
            # Crixus-style vertex mass: rho0 x the fluid-side Voronoi volume
            mass_list.append(rho0_0 * mesh["vert_volume"])
            info_list.append(
                np.full(nv, np.uint32(int(ParticleType.VERTEX)) | ioflag,
                        np.uint32)
            )
            sa_rows.append((n_total, mesh["vert_normal"], None))
            sa_vert_rows.append((info_list[-1], mesh["verts"], bool(io_kind)))
            n_total += nv

            ns = len(mesh["seg_pos"])
            pos_list.append(mesh["seg_pos"])
            vel_list.append(np.zeros((ns, 3)))
            rho_list.append(np.zeros(ns))
            mass_list.append(np.zeros(ns))
            info_list.append(
                np.full(ns, np.uint32(int(ParticleType.BOUNDARY)) | ioflag,
                        np.uint32)
            )
            sa_rows.append((n_total, mesh["seg_normal"], mesh["seg_verts"]))
            n_total += ns

        # corner vertices at open boundaries: an IO vertex that a solid
        # (non-IO) boundary mesh also uses behaves like a regular vertex —
        # no imposed values, no fluid generation (saIdentifyCornerVertices,
        # boundary_conditions_kernel.cu:2319; particleinfo.h:236).  Meshes
        # are built independently here, so "shared vertex" = coincident
        # position within a quarter particle spacing.
        io_vert_rows = [r for r in sa_vert_rows if r[2]]
        if io_vert_rows:
            from ..state import FG_CORNER as _FC

            solid_verts = [v for (_, v, is_io) in sa_vert_rows if not is_io]
            if solid_verts:
                sv = np.concatenate(solid_verts)
                tol2 = (0.25 * dp) ** 2
                for info_arr, verts, _ in io_vert_rows:
                    d2 = ((verts[:, None, :] - sv[None, :, :]) ** 2).sum(-1)
                    corner = d2.min(axis=1) < tol2
                    info_arr[corner] |= np.uint32(_FC)

        if capacity is None:
            capacity = n_total + self.inlet_reserve
        extras = {}
        if self.sa_meshes:
            belem = np.zeros((capacity, 3), np.float32)
            vrs = [np.zeros((capacity, 3), np.float32) for _ in range(3)]
            for (start, normals, vr) in sa_rows:
                m = len(normals)
                belem[start:start + m] = normals
                if vr is not None:
                    for i in range(3):
                        vrs[i][start:start + m] = vr[:, i]
            extras["belem"] = jnp.asarray(belem)
            for i in range(3):
                extras[f"vr{i}"] = jnp.asarray(vrs[i])
        if self.sa_meshes and self.fw.dynamic_gamma:
            # BUFFER_GRADGAMMA state for density-sum/dynamic-gamma runs;
            # seeded by Simulator.run via init_dynamic_gamma (saInitGamma)
            extras["gamma"] = jnp.ones((capacity,), jnp.float32)
            extras["gradgamma"] = jnp.zeros((capacity, 3), jnp.float32)
        if self.fw.flags & _SimFlags.ENABLE_INTERNAL_ENERGY:
            extras["energy"] = jnp.zeros((capacity,), jnp.float32)
        from ..defs import RheologyType as _Rheo
        from ..defs import TurbulenceModel as _Turb
        if self.fw.visc.rheologytype == _Rheo.GRANULAR:
            # effective-pressure buffer for the Jacobi solver (BUFFER_EFFPRES)
            extras["effpres"] = jnp.zeros((capacity,), jnp.float32)
        if self.fw.visc.turbmodel == _Turb.KEPSILON:
            # BUFFER_TKE / BUFFER_EPSILON / BUFFER_TURBVISC
            extras["tke"] = jnp.zeros((capacity,), jnp.float32)
            extras["eps"] = jnp.full((capacity,), 1e-5, jnp.float32)
            extras["turbvisc"] = jnp.zeros((capacity,), jnp.float32)
        state = empty_state(capacity, extras)
        pos = np.concatenate(pos_list).astype(np.float32)
        # auto-size the Pallas per-rebuild neighbor-list plan (block count +
        # kept-groups capacity) from the initial layout; runtime overflow
        # still aborts like CHECK_NEIBSNUM (integrator._check)
        from ..ops.forces_pallas import pallas_supported, probe_plan_numpy

        if (
            self.fw.sp.max_blocks == 0
            and pallas_supported(self.fw, grid)
            and len(pos)
        ):
            probed = probe_plan_numpy(self.fw, grid, pos)
            if self.fw.sp.max_block_groups:
                probed["max_block_groups"] = self.fw.sp.max_block_groups
            probed["max_run_extent"] = max(
                probed["max_run_extent"], self.fw.sp.max_run_extent
            )
            self._update_sp(**probed)
            self.fw = self.fw.finalize()
        state = state.replace(
            pos=state.pos.at[:n_total].set(jnp.asarray(pos)),
            vel=state.vel.at[:n_total].set(
                jnp.asarray(np.concatenate(vel_list), jnp.float32)
            ),
            rho=state.rho.at[:n_total].set(
                jnp.asarray(np.concatenate(rho_list), jnp.float32)
            ),
            mass=state.mass.at[:n_total].set(
                jnp.asarray(np.concatenate(mass_list), jnp.float32)
            ),
            info=state.info.at[:n_total].set(jnp.asarray(np.concatenate(info_list))),
        )
        if self.fw.sph_formulation == _SPHFormulation.SPH_GRENIER:
            # Grenier volume buffer (BUFFER_VOLUME, euler_kernel.def
            # write_volume): reference volume V0 = m/rho0(fluid), log-volume
            # J = 0 at t=0; actual volume = exp(J)*V0
            from ..ops import eos as _eos
            from ..state import fluid_num as _fluid_num

            rho0 = _eos._per_fluid(
                self.fw.pp, _fluid_num(state.info),
                [f.rho0 for f in self.fw.pp.fluids],
            )
            extras = dict(state.extras)
            extras["grenier_vol0"] = jnp.asarray(state.mass / rho0, jnp.float32)
            extras["grenier_J"] = jnp.zeros((capacity,), jnp.float32)
            state = state.replace(extras=extras)
        # problem-specific particle initialization hook (the reference's
        # ProblemCore::initializeParticles / init_keps, ProblemCore.h:597-609)
        state = self.initialize_particles(grid, state)
        return grid, state

    def initialize_particles(self, grid: CellGrid, state: ParticleState):
        """Override to set initial per-particle fields (velocity profiles,
        k/epsilon, ...) after the fill (reference initializeParticles)."""
        return state


def _tset(t: tuple, i: int, v):
    lst = list(t)
    lst[i] = v
    return tuple(lst)


def get_problem(name: str) -> type:
    # make sure the catalog is imported
    from . import catalog, generic  # noqa: F401

    try:
        return PROBLEM_REGISTRY[name]
    except KeyError:
        raise SystemExit(
            f"unknown problem '{name}'; available: "
            + ", ".join(sorted(PROBLEM_REGISTRY))
        ) from None


__all__ = [
    "Problem",
    "Geometry",
    "GeometryType",
    "FillType",
    "Plane",
    "PROBLEM_REGISTRY",
    "get_problem",
]
