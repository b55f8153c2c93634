"""Problem catalog: TPU-native re-creations of the reference's problems
(`src/problems/`).  Each cites its reference source; parameters and geometry
match the reference so the validation scripts' expectations carry over.
"""
from __future__ import annotations

import math
from dataclasses import replace as dataclasses_replace

import numpy as np

from ..defs import (
    AverageOperator,
    BoundaryType,
    ComputationalViscosityType,
    DensityDiffusionType,
    FilterType,
    KernelType,
    Periodicity,
    RheologyType,
    SimFlags,
    TurbulenceModel,
    ViscousModel,
)
from ..geometry import primitives as geo
from ..params import SimParams
from ..defs import SPHFormulation
from .base import FillType, GeometryType, Problem


class DamBreak3D(Problem):
    """3D dam break with obstacle (reference `src/problems/DamBreak3D.cu:38-200`).

    DYN boundaries (3 layers), artificial viscosity, Molteni & Colagrossi
    density diffusion; domain 1.6 x 0.67 x 0.6 m, water column 0.4 x H=0.4 m,
    rotated square obstacle.
    """

    name = "DamBreak3D"

    def __init__(self, options=None):
        super().__init__(options)
        wet = self.get_option("wet", False)
        num_obstacles = self.get_option("num_obstacles", 1)
        rotate_obstacle = self.get_option("rotate_obstacle", True)
        rhodiff = DensityDiffusionType(
            self.get_option("density-diffusion", int(DensityDiffusionType.COLAGROSSI))
        )
        mls = self.get_option(
            "mls", 0 if rhodiff != DensityDiffusionType.NONE else 10
        )

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=rhodiff,
            filters=((FilterType.MLS, mls),) if mls > 0 else (),
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_dynamic_boundaries_layers(3)
        self.set_deltap(self.get_option("deltap", 0.015))
        self.set_gravity(-9.81)
        H = 0.4
        self.set_max_fall(H)
        self.add_fluid(1000.0)
        self.set_equation_of_state(0, 7.0, 20.0)
        self.set_tend(self.get_option("tend", 1.5))
        self.add_writer(freq=0.005)

        use_planes = self.get_option("use_planes", False)
        dim = (1.6, 0.67, 0.6)
        self.make_universe_box((0.0, 0.0, 0.0), dim)
        dp = self.deltap

        if use_planes:
            # limit the domain with 6 geometric planes (makeUniverseBox path,
            # DamBreak3D.cu:127-129)
            for axis in range(3):
                lo = [0.0, 0.0, 0.0]
                n_lo = [0.0, 0.0, 0.0]
                n_lo[axis] = 1.0
                self.add_plane(tuple(lo), tuple(n_lo))
                hi = [0.0, 0.0, 0.0]
                hi[axis] = dim[axis]
                n_hi = [0.0, 0.0, 0.0]
                n_hi[axis] = -1.0
                self.add_plane(tuple(hi), tuple(n_hi))
            bd = dp
        else:
            # container walls: 3 dyn-boundary layers growing inward
            self.add_box(
                GeometryType.FIXED_BOUNDARY, FillType.BORDER, (0, 0, 0), *dim,
                open_top=True,
            )
            bd = dp * self.dyn_layers
        # water column, offset from the walls
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (bd, bd, bd), 0.4 - bd, dim[1] - 2 * bd, H - bd,
        )
        if wet:
            self.add_box(
                GeometryType.FLUID, FillType.SOLID,
                (0.4 + dp, bd, bd), dim[0] - 0.4 - bd - dp, dim[1] - 2 * bd, 0.1 - bd,
            )
        self.set_water_level(H)

        obstacle_side = 0.12
        y_dist = dim[1] / (num_obstacles + 1)
        for i in range(num_obstacles):
            base = (
                0.9 - obstacle_side / 2,
                y_dist * (i + 1)
                + (obstacle_side / 2 if rotate_obstacle else 0)
                - obstacle_side / 2,
                0,
            )
            gid = self.add_box(
                GeometryType.MOVING_BODY, FillType.BORDER,
                base, obstacle_side, obstacle_side, dim[2],
            )
            if rotate_obstacle:
                self.rotate(gid, 0, 0, math.pi / 4)
            self.enable_feedback(gid)
            # erase fluid overlapping the obstacle
            self.erase_fluid_inside(
                geo.box_predicate(base, (obstacle_side, obstacle_side, dim[2]), margin=dp / 2)
            )

        for i in range(self.get_option("num_testpoints", 3)):
            self.add_testpoint((0.9, dim[1] / 2, 0.05 + 0.1 * i))


class Poiseuille(Problem):
    """Laminar Poiseuille channel flow (reference `src/problems/Poiseuille.inc:63-170`).

    Periodic in x,y; DYN boundary plates top/bottom; body force along x.
    Analytical steady profile v_x(z) = F/(2 nu) ((lz/2)^2 - z^2).
    """

    name = "Poiseuille"

    def __init__(self, options=None):
        super().__init__(options)
        lz = ly = lx = 1.0
        self.lz = lz
        rho = self.get_option("density", 1.0)
        kinvisc = self.get_option("kinvisc", 0.1)
        driving_force = self.get_option("driving-force", 0.05)
        ppH = self.get_option("ppH", 32)
        compvisc = ComputationalViscosityType(
            self.get_option("compvisc", int(ComputationalViscosityType.KINEMATIC)))
        viscavg = AverageOperator(
            self.get_option("viscavg", int(AverageOperator.HARMONIC)))
        viscmodel = ViscousModel(
            self.get_option("viscmodel", int(ViscousModel.MORRIS)))

        self.kinvisc = kinvisc
        self.driving_force = driving_force

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            computational_visc=compvisc,
            visc_model=viscmodel,
            visc_average=viscavg,
            periodicity=Periodicity.XY,
            boundary=BoundaryType.DYN_BOUNDARY,
            simparams=SimParams(max_parts_per_cell=56),
        )
        self.set_deltap(lz / ppH)
        dp = self.deltap
        self.set_tend(self.get_option("tend", 100.0))
        self.set_gravity((driving_force, 0.0, 0.0))
        fl = self.add_fluid(rho)
        self.set_kinematic_visc(fl, kinvisc)

        max_vel = self.compute_poiseuille_vel(0.0)
        hydrostatic_vel = math.sqrt(2 * driving_force * lz)
        c0 = 20 * max(hydrostatic_vel, max_vel)
        self.set_equation_of_state(fl, 7.0, c0)

        layers = self.dyn_layers
        # world: channel + boundary plates; periodic wrap needs the world x/y
        # extent to be an exact multiple of the particle lattice
        wall = layers * dp
        self.make_universe_box(
            (-lx / 2, -ly / 2, -lz / 2 - wall), (lx, ly, lz + 2 * wall)
        )
        # plates: 'layers' thick slabs whose inner surface is at z = +-lz/2
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box(
                (-lx / 2 + dp / 2, -ly / 2 + dp / 2, -lz / 2 - (layers - 1) * dp),
                (lx - dp, ly - dp, (layers - 1) * dp),
                dp,
            ),
        )
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box(
                (-lx / 2 + dp / 2, -ly / 2 + dp / 2, lz / 2),
                (lx - dp, ly - dp, (layers - 1) * dp),
                dp,
            ),
        )
        # fluid fills the channel
        self.add_points(
            GeometryType.FLUID,
            geo.fill_box(
                (-lx / 2 + dp / 2, -ly / 2 + dp / 2, -lz / 2 + dp),
                (lx - dp, ly - dp, lz - 2 * dp),
                dp,
            ),
        )
        if self.get_option("steady-init", False):
            self._steady_init = True
        else:
            self._steady_init = False
        self.add_writer(freq=1.0)

    def compute_poiseuille_vel(self, z: float) -> float:
        """Analytical steady profile (reference Poiseuille.inc:185-210)."""
        h2 = self.lz / 2
        return self.driving_force / (2 * self.kinvisc) * (h2 * h2 - z * z)

    def build(self, capacity=None):
        grid, state = super().build(capacity)
        if self._steady_init:
            import jax.numpy as jnp

            from ..state import is_fluid

            vx = jnp.asarray(
                self.driving_force
                / (2 * self.kinvisc)
                * ((self.lz / 2) ** 2 - np.asarray(state.pos)[:, 2] ** 2),
                jnp.float32,
            )
            vel = state.vel.at[:, 0].set(jnp.where(is_fluid(state.info), vx, 0.0))
            state = state.replace(vel=vel)
        return grid, state


class StillWater(Problem):
    """Hydrostatic water column (reference `src/problems/StillWater.cu` /
    `LithostaticDYN.cu` + `Lithostatic.inc`): box of still water; the
    steady-state density profile must match the analytic hydrostatic solution
    (validated by `scripts/validate-lithostatic.py`)."""

    name = "StillWater"

    def __init__(self, options=None):
        super().__init__(options)
        H = self.get_option("water_height", 0.5)
        l = self.get_option("side", 0.5)
        ppH = self.get_option("ppH", 32)
        rhodiff = DensityDiffusionType(
            self.get_option("density-diffusion", int(DensityDiffusionType.COLAGROSSI)))

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            visc_average=AverageOperator.HARMONIC,
            density_diffusion=rhodiff,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(H / ppH)
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(9.81 * H))
        self.set_tend(self.get_option("tend", 5.0))

        layers = self.dyn_layers
        wall = layers * dp
        box = (l + 2 * wall, l + 2 * wall, H + wall + 4 * dp)
        self.make_universe_box((-wall, -wall, -wall), box)
        # tank: walls + floor (open top)
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            _tank_points((0, 0, 0), (l, l, box[2]), dp, layers),
        )
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (dp, dp, dp), l - 2 * dp, l - 2 * dp, H - dp,
        )
        self.set_water_level(H)
        self.add_writer(freq=0.1)


class WaveTank(Problem):
    """Wave tank with a rotating paddle wavemaker and a beach slope
    (reference `src/problems/WaveTank.cu:100-220`): flap hinged at the
    bottom, angular velocity A*Omega*sin(Omega (t-t0)) within
    [tstart, tend]; wave gages along the centerline."""

    name = "WaveTank"

    def __init__(self, options=None):
        super().__init__(options)
        import jax.numpy as jnp

        H = self.get_option("water_height", 0.45)
        h_length = self.get_option("flat_length", 2.25)
        beta = math.atan(self.get_option("slope", 0.25))
        ly = self.get_option("width", 0.6)
        stroke = self.get_option("stroke", 0.2)
        period = self.get_option("period", 0.8)
        paddle_x = 0.25
        tstart = self.get_option("paddle_tstart", 0.2)
        tstop = self.get_option("paddle_tend", 30.0)

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType.COLAGROSSI,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(2 * 9.81 * H))
        self.set_tend(self.get_option("tend", 10.0))
        self.add_writer(freq=0.05)

        # domain: flat section + beach rising to above still water level
        slope_run = (H + 10 * dp) / math.tan(beta)
        lx = h_length + slope_run + 0.1
        lz = H + 0.3
        layers = self.dyn_layers
        wall = layers * dp
        self.make_universe_box((-wall, -wall, -wall), (lx + 2 * wall, ly + 2 * wall, lz + wall))

        # tank floor (flat part) + side walls
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box((0, 0, -(layers - 1) * dp), (h_length, ly, (layers - 1) * dp), dp),
        )
        for y in (0.0, ly):
            self.add_points(
                GeometryType.FIXED_BOUNDARY,
                geo.fill_box((0, y, dp), (lx, 0.0, lz - dp), dp),
            )
        # beach: sloped slab from (h_length, 0) rising at angle beta
        slab = geo.fill_box((0, 0, -(layers - 1) * dp),
                            (slope_run / math.cos(beta), ly, (layers - 1) * dp), dp)
        slab = geo.rotate_y(slab, (0, 0, 0), -beta)
        slab[:, 0] += h_length
        self.add_points(GeometryType.FIXED_BOUNDARY, slab)

        # paddle: thin vertical flap hinged at the bottom
        paddle = self.add_box(
            GeometryType.MOVING_BODY, FillType.SOLID,
            (paddle_x - dp / 2, dp, 0.0), dp / 2, ly - 2 * dp, H + 0.15,
        )
        amplitude = math.atan(stroke / (2.0 * H))
        omega = 2.0 * math.pi / period

        def paddle_motion(t):
            on = (t > tstart) & (t < tstop)
            av_y = jnp.where(
                on, amplitude * omega * jnp.sin(omega * (t - tstart)), 0.0
            )
            zeros = jnp.zeros(3, jnp.float32)
            return zeros, jnp.stack([0.0 * av_y, av_y, 0.0 * av_y])

        self.set_body_motion(paddle, paddle_motion)
        # hinge at the tank floor
        self.geometries[paddle].mass = None
        self._paddle_hinge = (paddle_x, ly / 2, 0.0)

        # water: from the paddle to where the beach reaches the surface
        x_water_end = h_length + H / math.tan(beta)
        self.add_points(
            GeometryType.FLUID,
            geo.fill_box(
                (paddle_x + dp, dp, dp),
                (x_water_end - paddle_x - dp, ly - 2 * dp, H - dp),
                dp,
            ),
        )
        # carve the beach out of the water
        tanb = math.tan(beta)
        self.erase_fluid_inside(
            lambda p: p[:, 2] < (p[:, 0] - h_length) * tanb + 0.5 * dp
        )
        self.set_water_level(H)

        for xg in (1.0, 1.5, 2.0):
            self.add_gage(xg, ly / 2)

    def body_specs(self):
        specs = super().body_specs()
        # hinge the paddle at the tank floor rather than its mass center
        return tuple(
            dataclasses_replace(s, rotation_center=self._paddle_hinge)
            for s in specs
        )


class LockExchange(Problem):
    """Two-fluid gravity current (reference `src/problems/LockExchange.cu`):
    heavy fluid behind a virtual gate at dimX/2, light fluid ahead.  The
    reference defaults to Grenier's sigma/volume formulation with F2 as the
    documented alternative; select with ``formulation=grenier|f2`` (default
    f2).  DYN boundaries, artificial viscosity."""

    name = "LockExchange"

    def __init__(self, options=None):
        super().__init__(options)
        dimX, dimY, dimZ = 0.6, 0.23, 0.2
        rho_light = self.get_option("rho0", 1000.0)
        rho_heavy = self.get_option("rho1", 1100.0)
        ppH = self.get_option("ppH", 32)
        form = str(self.get_option("formulation", "f2")).lower()
        formulation = {
            "grenier": SPHFormulation.SPH_GRENIER,
            "ha": SPHFormulation.SPH_HA,
        }.get(form, SPHFormulation.SPH_F2)

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            formulation=formulation,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
            simparams=SimParams(max_parts_per_cell=56),
        )
        self.set_deltap(dimZ / ppH)
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(dimZ)
        light = self.add_fluid(rho_light)
        heavy = self.add_fluid(rho_heavy)
        self.set_equation_of_state(light, 7.0, 20.0)
        self.set_equation_of_state(heavy, 7.0, 20.0)
        self.set_tend(self.get_option("tend", 2.0))
        self.add_writer(freq=0.02)

        self.make_universe_box((0, 0, 0), (dimX, dimY, dimZ))
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                     (0, 0, 0), dimX, dimY, dimZ)
        bd = dp * self.dyn_layers
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (bd, bd, bd), dimX / 2 - bd, dimY - 2 * bd, dimZ - 2 * bd,
            fluid_idx=light,
        )
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (dimX / 2 + dp, bd, bd),
            dimX / 2 - bd - dp, dimY - 2 * bd, dimZ - 2 * bd,
            fluid_idx=heavy,
        )

    def initial_density(self, pts, fluid_idx):
        # multifluid: hydrostatic filling is done per fluid by hand in the
        # reference; rest density is the safe default here
        return np.zeros(len(pts))


class OpenChannel(Problem):
    """Uniform open-channel flow driven by a tilted-gravity body force
    (reference `src/problems/OpenChannel.cu`): periodic along the flow,
    DYN walls, free surface."""

    name = "OpenChannel"

    def __init__(self, options=None):
        super().__init__(options)
        l, w, h = 1.0, 0.5, 0.25  # channel length/width/water depth
        ppH = self.get_option("ppH", 16)
        angle = self.get_option("angle_deg", 4.5) * math.pi / 180.0

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            periodicity=Periodicity.X,
        )
        self.set_deltap(h / ppH)
        dp = self.deltap
        g = 9.81
        # tilt gravity: downslope component drives the flow
        self.set_gravity((g * math.sin(angle), 0.0, -g * math.cos(angle)))
        self.set_max_fall(h)
        fl = self.add_fluid(1000.0)
        self.set_kinematic_visc(fl, 1.0e-4)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(g * h))
        self.set_tend(self.get_option("tend", 10.0))
        self.add_writer(freq=0.1)

        layers = self.dyn_layers
        wall = layers * dp
        lz = h + 0.15
        self.make_universe_box((0, -wall, -wall), (l, w + 2 * wall, lz + wall))
        # floor + side walls (x-periodic: no end walls)
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box((dp / 2, 0, -(layers - 1) * dp), (l - dp, w, (layers - 1) * dp), dp),
        )
        for y in (0.0, w):
            self.add_points(
                GeometryType.FIXED_BOUNDARY,
                geo.fill_box((dp / 2, y, dp), (l - dp, 0.0, lz - dp), dp),
            )
        self.add_points(
            GeometryType.FLUID,
            geo.fill_box((dp / 2, dp, dp), (l - dp, w - 2 * dp, h - dp), dp),
        )
        self.set_water_level(h)


class BuoyancyTest(Problem):
    """Floating-body buoyancy test (reference `src/problems/BuoyancyTest.cu`):
    a half-density cube released inside a water tank must rise and bob."""

    name = "BuoyancyTest"

    def __init__(self, options=None):
        super().__init__(options)
        side = 1.0
        H = self.get_option("water_height", 0.7)
        cube = self.get_option("object_side", 0.12)
        ppH = self.get_option("ppH", 24)

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType.COLAGROSSI,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(H / ppH)
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(2 * 9.81 * H))
        self.set_tend(self.get_option("tend", 3.0))
        self.add_writer(freq=0.02)

        layers = self.dyn_layers
        wall = layers * dp
        box = (side + 2 * wall, side + 2 * wall, H + 0.4)
        self.make_universe_box((-wall, -wall, -wall), box)
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            _tank_points((0, 0, 0), (side, side, box[2] - wall), dp, layers),
        )
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (dp, dp, dp), side - 2 * dp, side - 2 * dp, H - dp,
        )
        # floating cube just below the surface, half water density
        c0 = (side / 2 - cube / 2, side / 2 - cube / 2, H - cube)
        body = self.add_box(
            GeometryType.FLOATING_BODY, FillType.BORDER,
            c0, cube, cube, cube,
        )
        rho_body = 1000.0 / 2
        self.geometries[body].density = rho_body
        n_parts = max(1, len(self.geometries[body].points))
        self.geometries[body].mass = rho_body * cube**3 / n_parts
        self.erase_fluid_inside(
            geo.box_predicate(c0, (cube, cube, cube), margin=dp / 2)
        )
        self.set_water_level(H)


class DamBreakGate(Problem):
    """Dam break released by a lifting gate (reference
    `src/problems/DamBreakGate.cu`): like DamBreak3D but the water is held
    by a moving-body gate that slides upward at t>=0.1s."""

    name = "DamBreakGate"

    def __init__(self, options=None):
        super().__init__(options)
        import jax.numpy as jnp

        dim = (1.6, 0.67, 0.6)
        H = 0.4
        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType.COLAGROSSI,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        self.add_fluid(1000.0)
        self.set_equation_of_state(0, 7.0, 20.0)
        self.set_tend(self.get_option("tend", 1.5))
        self.add_writer(freq=0.01)

        self.make_universe_box((0.0, 0.0, 0.0), dim)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                     (0, 0, 0), *dim, open_top=True)
        bd = dp * self.dyn_layers
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (bd, bd, bd), 0.4 - bd, dim[1] - 2 * bd, H - bd,
        )
        self.set_water_level(H)

        # gate: thin wall at x=0.4 sliding up with v=1.5 m/s after t=0.1
        gate = self.add_box(
            GeometryType.MOVING_BODY, FillType.SOLID,
            (0.4, bd, bd), dp / 2, dim[1] - 2 * bd, H + 0.1,
        )

        def gate_motion(t):
            vz = jnp.where(t >= 0.1, 1.5, 0.0)
            z = jnp.zeros((), jnp.float32)
            return jnp.stack([z, z, vz]), jnp.zeros(3, jnp.float32)

        self.set_body_motion(gate, gate_motion)


class Spheric2(Problem):
    """SPHERIC benchmark test case 2 (Kleefsman dam break with obstacle,
    reference `src/problems/Spheric2LJ.cu:50-150`): 3.22 x 1 x 1 tank,
    H=0.55 water column, 0.161 x 0.403 x 0.161 obstacle, 8 pressure probes
    on the obstacle faces."""

    name = "Spheric2"

    def __init__(self, options=None):
        super().__init__(options)
        lx, ly, lz = 3.22, 1.0, 1.0
        H = 0.55

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType.COLAGROSSI,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self.set_equation_of_state(fl, 7.0, 0.0)  # auto from max fall
        self.set_tend(self.get_option("tend", 5.0))
        self.add_writer(freq=0.02)

        self.make_universe_box((0.0, 0.0, 0.0), (lx, ly, lz))
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                     (0, 0, 0), lx, ly, lz, open_top=True)
        bd = dp * self.dyn_layers
        # obstacle (hollow box) on the tank floor
        ob = (2.3955, 0.295, bd)
        os_ = (0.161, 0.403, 0.161 - bd)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER, ob, *os_)
        # water column at the far end (the dam)
        self.add_box(
            GeometryType.FLUID, FillType.SOLID,
            (lx - 1.228, bd, bd), 1.228 - bd, ly - 2 * bd, H - bd,
        )
        self.erase_fluid_inside(
            geo.box_predicate(ob, os_, margin=dp / 2)
        )
        self.set_water_level(H)

        # Kleefsman pressure probes (reference :140-147)
        for z in (0.021, 0.061, 0.101, 0.141):
            self.add_testpoint((2.3955, 0.529, z))
        for x in (2.4165, 2.4565, 2.4965, 2.5365):
            self.add_testpoint((x, 0.471, 0.161))


def _tank_points(origin, inner_size, dp, layers):
    """Open-top tank: floor + 4 walls, ``layers`` thick, inner surface at the
    given box; layers grow outward (away from the fluid)."""
    o = np.asarray(origin, np.float64)
    s = np.asarray(inner_size, np.float64)
    pts = []
    for layer in range(layers):
        off = layer * dp
        lo = o - off
        sz = s + 2 * off
        # floor
        pts.append(
            geo.fill_box((lo[0], lo[1], o[2] - off), (sz[0], sz[1], 0.0), dp)
        )
        # walls (x faces)
        for x in (lo[0], lo[0] + sz[0]):
            pts.append(
                geo.fill_box((x, lo[1], o[2] - off + dp), (0.0, sz[1], s[2] + off - dp), dp)
            )
        for y in (lo[1], lo[1] + sz[1]):
            pts.append(
                geo.fill_box((lo[0] + dp, y, o[2] - off + dp), (sz[0] - 2 * dp, 0.0, s[2] + off - dp), dp)
            )
    return geo._dedup(np.concatenate(pts), dp)


__all__ = ["DamBreak3D", "Poiseuille", "StillWater", "WaveTank",
           "LockExchange", "OpenChannel", "BuoyancyTest", "DamBreakGate",
           "Spheric2", "RTInstability", "Bubble", "DamBreakMobileBed",
           "Seiche", "StillWaterSA", "TurbulentPoiseuilleFlowSA",
           "LithostaticLJ", "LithostaticDYN", "BiFluidPoiseuille",
           "PoiseuillePapanastasiou", "AccuracyTest", "SolitaryWave",
           "DEMExample", "OffshorePile", "ChannelIO", "Objects",
           "SlidingWedge", "OilJet", "DynBoundsExample"]


class RTInstability(Problem):
    """Rayleigh-Taylor instability (reference `src/problems/RTInstability.cu`):
    0.4 x 0.4 x 0.8 box, light fluid (1000) below a sinusoidally perturbed
    interface z = dimZ/2 + 0.05 sin(2 pi x / dimX), heavy fluid (2350) above;
    Grenier's multi-fluid formulation with pseudo surface tension
    (epsinterface=0.08), DYN boundaries, laminar viscosity 1e-2,
    Molteni & Colagrossi diffusion (0.1).  Hydrostatic two-layer density
    init and per-particle masses by density (RTInstability.cu:163-209)."""

    name = "RTInstability"

    def __init__(self, options=None):
        super().__init__(options)
        self.dimX, self.dimY, self.dimZ = 0.4, 0.4, 0.8
        dimX, dimY, dimZ = self.dimX, self.dimY, self.dimZ
        form = str(self.get_option("formulation", "grenier")).lower()
        formulation = {
            "grenier": SPHFormulation.SPH_GRENIER,
            "ha": SPHFormulation.SPH_HA,
        }.get(form, SPHFormulation.SPH_F2)
        ddiff = {
            "none": DensityDiffusionType.NONE,
            "colagrossi": DensityDiffusionType.COLAGROSSI,
        }[str(self.get_option("density_diffusion", "colagrossi")).lower()]
        # MLS only when density diffusion is off (RTInstability.cu:60-66)
        mls = int(self.get_option(
            "mls", 0 if ddiff != DensityDiffusionType.NONE else 10))

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            formulation=formulation,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            density_diffusion=ddiff,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
            filters=((FilterType.MLS, mls),) if mls > 0 else (),
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", 0.01))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(dimZ)
        self.light = self.add_fluid(1000.0)
        self.heavy = self.add_fluid(2350.0)
        self.set_equation_of_state(self.light, 7.0, 20.0)
        self.set_equation_of_state(self.heavy, 7.0, 20.0)
        self.set_kinematic_visc(self.light, 1.0e-2)
        self.set_kinematic_visc(self.heavy, 1.0e-2)
        # pseudo surface tension between the phases (set_interface_epsilon)
        self._update_pp(epsinterface=0.08)
        self.set_tend(self.get_option("tend", 1.5))
        self.add_writer(freq=0.005)

        self.make_universe_box((0, 0, 0), (dimX, dimY, dimZ))
        self.add_box(
            GeometryType.FIXED_BOUNDARY, FillType.BORDER,
            (0, 0, 0), dimX, dimY, dimZ,
            fluid_idx=self.heavy, mass_by_density=True,
        )
        bd = dp * self.dyn_layers
        pts = geo.fill_box(
            (bd, bd, bd), (dimX - 2 * bd, dimY - 2 * bd, dimZ - 2 * bd), dp
        )
        light_sel = pts[:, 2] < self._interface_z(pts[:, 0])
        self.add_points(GeometryType.FLUID, pts[light_sel],
                        fluid_idx=self.light, mass_by_density=True)
        self.add_points(GeometryType.FLUID, pts[~light_sel],
                        fluid_idx=self.heavy, mass_by_density=True)

    def _interface_z(self, x):
        return self.dimZ / 2 + 0.05 * np.sin(2 * np.pi / self.dimX * x)

    def initial_density(self, pts, fluid_idx):
        """Two-layer hydrostatic profile (RTInstability.cu:163-200): heavy
        fluid (and walls) from the top surface; light fluid from the heavy
        column above the local interface plus its own column below it."""
        from ..ops import eos
        import jax.numpy as jnp

        g = self.get_gravity_magnitude()
        H = self.dimZ
        z = pts[:, 2]
        if fluid_idx == self.heavy:
            depth = np.maximum(0.0, H - z)
            rt = eos.hydrostatic_density(
                self.fw.pp, jnp.asarray(depth, jnp.float32), fluid_idx)
            return np.asarray(rt, np.float64)
        z_intf = self._interface_z(pts[:, 0])
        rho0_h = self.fw.pp.fluids[self.heavy].rho0
        rho0_l = self.fw.pp.fluids[self.light].rho0
        P = rho0_h * g * np.maximum(0.0, H - z_intf) \
            + rho0_l * g * np.maximum(0.0, z_intf - z)
        rt = eos.density_from_pressure(
            self.fw.pp, jnp.asarray(P, jnp.float32), fluid_idx)
        return np.asarray(rt, np.float64)


class Bubble(Problem):
    """Rising air bubble in water (reference `src/problems/Bubble.cu`):
    R=0.025 bubble centered 2R above the floor of a 6R x 6R x 10R water
    column; Grenier's formulation (h/R = 0.128) with pseudo surface tension
    (epsinterface=0.08), DYN boundaries, air (rho0=1, gamma=1.4,
    c0=198 sqrt(gH)) / water (rho0=1000, gamma=7, c0=14 sqrt(gH)),
    hydrostatic two-phase init with per-particle masses by density and
    repacking parameters (Bubble.cu:49-226)."""

    name = "Bubble"

    def __init__(self, options=None):
        super().__init__(options)
        R = self.R = self.get_option("R", 0.025)
        H = self.H = 10 * R
        lx = ly = 6 * R
        lz = H
        form = str(self.get_option("formulation", "grenier")).lower()
        formulation = {
            "grenier": SPHFormulation.SPH_GRENIER,
            "ha": SPHFormulation.SPH_HA,
        }.get(form, SPHFormulation.SPH_F2)

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            formulation=formulation,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID
            | SimFlags.ENABLE_REPACKING,
        )
        # Grenier sets h/R = 0.128 (Bubble.cu:65-67)
        self.set_deltap(self.get_option("deltap", 0.128 * R / 1.3))
        dp = self.deltap
        self.set_gravity(-9.81)
        g = self.get_gravity_magnitude()
        self.set_max_fall(H)
        maxvel = math.sqrt(g * H)

        self.air = self.add_fluid(1.0)
        self.water = self.add_fluid(1000.0)
        self.set_equation_of_state(self.air, 1.4, 198 * maxvel)
        self.set_equation_of_state(self.water, 7.0, 14 * maxvel)
        self.set_kinematic_visc(self.air, 4.5e-3)
        self.set_kinematic_visc(self.water, 3.5e-5)
        self._update_pp(epsinterface=0.08)
        c0_air = 198 * maxvel
        self._update_sp(
            repack_maxiter=1000,
            repack_a=100 / (2.0 * c0_air * c0_air),
            repack_alpha=2 * dp / c0_air,
        )
        self.set_tend(self.get_option("tend", 1.0))
        self.add_writer(freq=0.01)

        off = self.dyn_layers * dp
        size = (lx + 2 * off, ly + 2 * off, lz + 2 * off)
        origin = (-size[0] / 2, -size[1] / 2, -size[2] / 2)
        self.origin_z = origin[2]
        self.make_universe_box(origin, size)
        self.add_box(
            GeometryType.FIXED_BOUNDARY, FillType.BORDER,
            origin, *size, fluid_idx=self.water, mass_by_density=True,
        )
        pts = geo.fill_box(
            (origin[0] + off, origin[1] + off, origin[2] + off),
            (lx, ly, lz), dp,
        )
        inside = self._in_bubble(pts)
        self.add_points(GeometryType.FLUID, pts[inside],
                        fluid_idx=self.air, mass_by_density=True)
        self.add_points(GeometryType.FLUID, pts[~inside],
                        fluid_idx=self.water, mass_by_density=True)

    def _in_bubble(self, pts):
        """Bubble of radius R centered on the axis, 2R above the floor
        (Bubble.cu:156-163)."""
        cz = self.origin_z + 2 * self.R
        return (
            pts[:, 0] ** 2 + pts[:, 1] ** 2 + (pts[:, 2] - cz) ** 2
            < self.R * self.R
        )

    def initial_density(self, pts, fluid_idx):
        """Hydrostatic init (Bubble.cu:166-226): water (and walls) from the
        column top; air from the water pressure at the local upper bubble
        surface plus its own small column."""
        from ..ops import eos
        import jax.numpy as jnp

        g = self.get_gravity_magnitude()
        H = self.H
        depth = H - pts[:, 2] + self.origin_z
        if fluid_idx == self.water:
            rt = eos.hydrostatic_density(
                self.fw.pp, jnp.asarray(depth, jnp.float32), fluid_idx)
            return np.asarray(rt, np.float64)
        # upper bubble surface above this (x,y); the sqrt argument can only
        # be evaluated for in-bubble particles, clamp for safety
        r2 = np.maximum(0.0, self.R**2 - pts[:, 0] ** 2 - pts[:, 1] ** 2)
        z_intf = 2 * self.R + np.sqrt(r2)
        rho0_w = self.fw.pp.fluids[self.water].rho0
        rho0_a = self.fw.pp.fluids[self.air].rho0
        P = rho0_w * g * (H - z_intf) \
            + rho0_a * g * (z_intf - pts[:, 2] + self.origin_z)
        rt = eos.density_from_pressure(
            self.fw.pp, jnp.asarray(P, jnp.float32), fluid_idx)
        return np.asarray(rt, np.float64)


class DamBreakMobileBed(Problem):
    """Dam break over an erodible sediment bed (reference
    `src/problems/DamBreakMobileBed.cu`): Hu & Adams formulation, granular
    rheology with the Jacobi effective-pressure solver, periodic Y, DYN
    boundaries.  Water (rho0=1000) over a saturated sand bed
    (rho1 = phi rho0 + (1-phi) rho_grain = 1892, sinpsi=0.5,
    limiting kinematic viscosity 0.0961).  The reference loads its geometry
    from HDF5 dumps (DamBreakMobileBed.cu:134-139); this build constructs the
    equivalent scene procedurally: a flat flume with a sediment layer of
    height hs topped at z=0 and a water column of height hw behind a virtual
    dam at x=0, scaled by the ``lx/hw/hs/deltap`` options."""

    name = "DamBreakMobileBed"

    def __init__(self, options=None):
        super().__init__(options)
        ddiff = {
            "ferrari": DensityDiffusionType.FERRARI,
            "brezzi": DensityDiffusionType.BREZZI,
            "colagrossi": DensityDiffusionType.COLAGROSSI,
        }[str(self.get_option("density_diffusion", "ferrari")).lower()]

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            formulation=SPHFormulation.SPH_HA,
            boundary=BoundaryType.DYN_BOUNDARY,
            periodicity=Periodicity.Y,
            rheology=RheologyType.GRANULAR,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            density_diffusion=ddiff,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
            simparams=SimParams(
                densityDiffCoeff=0.05,
                jacobi_maxiter=int(self.get_option("jacobi_maxiter", 10000)),
                jacobi_backerr=1e-3,
                jacobi_residual=1e-3,
            ),
        )
        self.set_deltap(self.get_option("deltap", 0.01))
        dp = self.deltap
        self.set_gravity(-9.81)
        g = self.get_gravity_magnitude()

        # geometry (scaled-down by default is NOT applied: reference scales)
        hs = self.hs = self.get_option("hs", 0.1)  # sediment height
        hw = self.hw = self.get_option("hw", 0.35)  # water height
        lx = self.get_option("lx", 8.2)
        lx_dam = self.get_option("lx_dam", 3.1)  # reservoir length (x<0)
        ly = 31 * dp
        lz = self.get_option("lz", 2.2)
        self.zi = 0.0  # sediment/water interface height

        rho0 = 1000.0
        phi = 0.47
        rhog = 2683.0
        rho1 = phi * rho0 + (1.0 - phi) * rhog
        c0 = 10.0 * math.sqrt(g * hw)
        self.set_max_fall(hw)

        water = self.water = self.add_fluid(rho0)
        sed = self.sed = self.add_fluid(rho1)
        self.set_dynamic_visc(water, rho0 * 1.0e-6)
        self.set_kinematic_visc(sed, 1.0e-6)
        f = dataclasses_replace(self.fw.pp.fluids[sed], sinpsi=0.5, cohesion=0.0)
        self._update_pp(
            fluids=tuple(
                f if i == sed else fl
                for i, fl in enumerate(self.fw.pp.fluids)
            ),
            limiting_kinvisc=self.get_option("effvisc_max", 0.0960952),
        )
        self.set_equation_of_state(water, 7.0, c0)
        self.set_equation_of_state(sed, 7.0, c0)
        self.set_tend(self.get_option("tend", 20.0))
        self.add_writer(freq=0.0625)

        layers = self.dyn_layers
        wall = layers * dp
        origin = (-lx_dam, 0.0, -hs - wall)
        size = (lx, ly, lz)
        self.make_universe_box(origin, size)
        # flume floor (periodic Y: no side walls) + end walls
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box(
                (origin[0] + dp / 2, dp / 2, -hs - (layers - 1) * dp),
                (lx - dp, ly - dp, (layers - 1) * dp), dp,
            ),
            fluid_idx=water,
        )
        for x0 in (origin[0] + dp / 2, origin[0] + lx - dp / 2 - (layers - 1) * dp):
            self.add_points(
                GeometryType.FIXED_BOUNDARY,
                geo.fill_box(
                    (x0, dp / 2, -hs), ((layers - 1) * dp, ly - dp, lz - wall),
                    dp,
                ),
                fluid_idx=water,
            )
        bd = wall  # keep fluid clear of the end walls
        # sediment bed over the whole flume: z in [-hs, 0)
        self.add_points(
            GeometryType.FLUID,
            geo.fill_box(
                (origin[0] + bd, dp / 2, -hs + dp / 2),
                (lx - 2 * bd, ly - dp, hs - dp / 2), dp,
            ),
            fluid_idx=sed, sediment=True, mass_by_density=True,
        )
        # water column behind the dam (x < 0), over the bed
        self.add_points(
            GeometryType.FLUID,
            geo.fill_box(
                (origin[0] + bd, dp / 2, dp / 2),
                (lx_dam - bd - dp / 2, ly - dp, hw - dp / 2), dp,
            ),
            fluid_idx=water, mass_by_density=True,
        )

    def initial_density(self, pts, fluid_idx):
        """Hydrostatic init (DamBreakMobileBed.cu:170-186): water from the
        column top, sediment from the full water load plus its own column."""
        from ..ops import eos
        import jax.numpy as jnp

        g = self.get_gravity_magnitude()
        rho0_w = self.fw.pp.fluids[self.water].rho0
        rho0_s = self.fw.pp.fluids[self.sed].rho0
        z = pts[:, 2]
        if fluid_idx == self.sed:
            P = self.hw * g * rho0_w + (self.zi - z) * g * rho0_s
        else:
            P = np.maximum(0.0, (self.hw - z) * g * rho0_w)
        rt = eos.density_from_pressure(
            self.fw.pp, jnp.asarray(P, jnp.float32), fluid_idx)
        return np.asarray(rt, np.float64)

    def build(self, capacity=None):
        grid, state = super().build(capacity)
        # warm-start the effective pressure with the lithostatic profile
        # (DamBreakMobileBed.cu:190-196)
        import jax.numpy as jnp
        from ..state import FG_SEDIMENT as _SED
        from ..state import has_flag as _hf

        g = self.get_gravity_magnitude()
        drho = abs(self.fw.pp.fluids[1].rho0 - self.fw.pp.fluids[0].rho0)
        z = state.pos[:, 2]
        ep = jnp.maximum(drho * g * (self.deltap + self.zi - z), 0.0)
        ep = jnp.where(_hf(state.info, _SED), ep, 0.0)
        extras = dict(state.extras)
        extras["effpres"] = ep.astype(jnp.float32)
        return grid, state.replace(extras=extras)


class Seiche(Problem):
    """Sloshing tank under oscillating lateral gravity (reference
    `src/problems/Seiche.cu`): water column H=0.5 in a sqrt(2)H x H/sqrt(2)
    x 1.5H tank, SPS turbulence, MLS filter every 20 iterations, and a
    variable-gravity callback g_x(t) = 2 sin(9.8 (t - t0)) active for
    t in (gtstart, gtend) (Seiche.cu:93-100)."""

    name = "Seiche"

    def __init__(self, options=None):
        super().__init__(options)
        H = self.H = 0.5
        l = math.sqrt(2.0) * H
        w = l / 2
        h = 1.5 * H
        gtstart = float(self.get_option("gtstart", 0.3))
        gtend = float(self.get_option("gtend", 3.0))
        mls = int(self.get_option("mls", 20))

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.SPS,
            flags=SimFlags.ENABLE_DTADAPT,
            filters=((FilterType.MLS, mls),) if mls > 0 else (),
            simparams=SimParams(dtadaptfactor=0.2),
        )
        self.set_deltap(self.get_option("deltap", 0.015))
        dp = self.deltap
        self.set_timestep(4e-5)
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 20.0)
        self.set_kinematic_visc(fl, 5.0e-6)
        self.set_tend(self.get_option("tend", 10.0))
        self.add_writer(freq=0.1)

        import jax.numpy as jnp

        def g_callback(t):
            # Seiche.cu:93-100
            on = (t > gtstart) & (t < gtend)
            gx = jnp.where(on, 2.0 * jnp.sin(9.8 * (t - gtstart)), 0.0)
            return (gx, jnp.zeros_like(gx), jnp.full_like(gx, -9.81))

        self.set_gravity_callback(g_callback)

        self.make_universe_box((0, 0, 0), (l, w, h))
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                     (0, 0, 0), l, w, h)
        wd = dp
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (wd, wd, wd), l - 2 * wd, w - 2 * wd, H - 2 * wd)
        self.set_water_level(H)


class StillWaterSA(Problem):
    """Hydrostatic box with semi-analytical boundaries (reference
    `src/problems/StillWater.cu` with `boundary<SA_BOUNDARY>`, geometry from
    the Crixus HDF5 input — generated procedurally here).

    The steady-state pressure profile must match the hydrostatic solution
    within 1% (the reference's hydrostatic-basin validation,
    `gpusph-valid.tex:233`).
    """

    name = "StillWaterSA"

    def __init__(self, options=None):
        super().__init__(options)
        H = self.get_option("water_height", 0.5)
        l = self.get_option("side", 0.5)
        ppH = self.get_option("ppH", 24)

        # density sum + dynamic gamma: the reference's preferred SA
        # integration (ENABLE_DENSITY_SUM, `src/problems/StillWater.cu`
        # SA branch); disable with --density_sum 0 for the round-2
        # continuity+quadrature scheme
        flags = SimFlags.ENABLE_DTADAPT
        if self.get_option("density_sum", 1):
            flags |= SimFlags.ENABLE_DENSITY_SUM
        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.SA_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType(
                self.get_option(
                    "density-diffusion", int(DensityDiffusionType.COLAGROSSI)
                )
            ),
            flags=flags,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(H / ppH)
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(9.81 * H))
        self.set_tend(self.get_option("tend", 5.0))
        self.add_writer(freq=0.5)

        h_box = H + 6 * dp
        self.make_universe_box((-2 * dp, -2 * dp, -2 * dp),
                               (l + 4 * dp, l + 4 * dp, h_box + 4 * dp))
        self.add_sa_box((0.0, 0.0, 0.0), (l, l, h_box), faces="all")
        wd = dp
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (wd, wd, wd), l - 2 * wd, l - 2 * wd, H - wd)
        self.set_water_level(H)


class TurbulentPoiseuilleFlowSA(Problem):
    """Turbulent channel flow between two SA wall plates with the k-epsilon
    model (reference `src/problems/TurbulentPoiseuilleFlowSA.cu`): periodic
    in x/y, driven by a unit body force along x, walls at z = +-1; the
    steady state must approach the log-law profile (`gpusph-valid.tex:673`).

    Deviation: the reference uses Brezzi diffusion + density summation; this
    build runs the continuity equation with Ferrari diffusion instead.
    """

    name = "TurbulentPoiseuilleFlowSA"

    def __init__(self, options=None):
        super().__init__(options)
        self.setup_framework(
            kernel=KernelType.WENDLAND,
            formulation=SPHFormulation.SPH_F1,
            boundary=BoundaryType.SA_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.KEPSILON,
            visc_model=ViscousModel.MORRIS,
            periodicity=Periodicity.X | Periodicity.Y,
            density_diffusion=DensityDiffusionType.FERRARI,
            simparams=SimParams(densityDiffCoeff=0.1, dtadaptfactor=0.3),
        )
        self.set_deltap(self.get_option("deltap", 0.025))
        dp = self.deltap
        self.set_gravity((1.0, 0.0, 0.0))
        fl = self.add_fluid(1000.0)
        self.set_kinematic_visc(fl, 0.0015625)
        self.set_equation_of_state(fl, 7.0, 40.0)
        self.set_tend(self.get_option("tend", 100.0))
        self.add_writer(freq=1.0)

        self.make_universe_box((-0.25, -0.25, -1.0 - 2 * dp),
                               (0.5, 0.5, 2.0 + 4 * dp))
        from ..geometry.sa_mesh import plate_sa_mesh

        for (z0, nrm) in ((-1.0, (0, 0, 1.0)), (1.0, (0, 0, -1.0))):
            self.sa_meshes.append(plate_sa_mesh(
                (-0.25, -0.25, z0), (0.5, 0, 0), (0, 0.5, 0), nrm, dp,
                periodic_u=True, periodic_v=True,
            ))
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (-0.25 + dp / 2, -0.25 + dp / 2, -1.0 + dp),
                     0.5 - dp, 0.5 - dp, 2.0 - 2 * dp)
        self.set_water_level(1.0 + 2 * dp)  # no hydrostatic gradient (g is horizontal)

    def initialize_particles(self, grid, state):
        # log-law velocity + k/eps init (reference initializeParticles,
        # TurbulentPoiseuilleFlowSA.cu:82-110)
        import jax.numpy as jnp

        from ..state import part_type

        nu = 0.0015625
        r0 = self.deltap
        z = state.pos[:, 2]
        dist = jnp.maximum(1.0 - jnp.abs(z), 0.5 * r0)
        ux = jnp.log(dist / nu) / 0.41 + 5.2
        is_fl = part_type(state.info) == 0
        vel = state.vel.at[:, 0].set(jnp.where(is_fl, ux, 0.0))
        extras = dict(state.extras)
        extras["tke"] = jnp.where(
            state.active, jnp.full_like(z, 1.0 / math.sqrt(0.09)), 0.0)
        extras["eps"] = jnp.where(
            state.active, 1.0 / (0.41 * dist), 1e-5)
        extras["turbvisc"] = 0.09 * extras["tke"] ** 2 / jnp.maximum(
            extras["eps"], 1e-10)
        return state.replace(
            vel=vel, rho=jnp.zeros_like(state.rho), extras=extras)


class _LithostaticBase(Problem):
    """Lithostatic equilibrium: a water layer over a saturated sediment bed
    in a box (reference `src/problems/Lithostatic.inc`): SPH_HA + granular
    rheology; the Jacobi effective-pressure solver must reproduce the
    lithostatic profile p_eff(z) = (rho_sed - rho_w) g (hs - z) (validated by
    `scripts/validate-lithostatic.py`)."""

    boundary = BoundaryType.LJ_BOUNDARY

    def __init__(self, options=None):
        super().__init__(options)
        dp = self.get_option("deltap", 0.05)
        # Lithostatic.inc:44-48
        self.hs = (math.floor(1.0 / dp) - 0.5) * dp
        self.hw = math.floor(1.0 / dp) * dp
        H = 2.5
        l = 1.0
        self.setup_framework(
            formulation=SPHFormulation.SPH_HA,
            kernel=KernelType.WENDLAND,
            boundary=self.boundary,
            rheology=RheologyType.GRANULAR,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            visc_model=ViscousModel.MORRIS,
            visc_average=AverageOperator.HARMONIC,
            density_diffusion=DensityDiffusionType(
                self.get_option("density-diffusion", 0)),
            simparams=SimParams(
                sfactor=2.0, dtadaptfactor=0.3, densityDiffCoeff=0.5,
                jacobi_maxiter=self.get_option("jacobi_maxiter", 1000),
                jacobi_backerr=3e-5, jacobi_residual=3e-5,
            ),
        )
        self.set_deltap(dp)
        g = 9.81
        self.set_gravity(-g)
        c0 = 10.0 * math.sqrt(g * H)
        w = self.add_fluid(1000.0)
        self.set_dynamic_visc(w, 1.0e-3)
        s = self.add_fluid(1892.0)
        f = dataclasses_replace(self.fw.pp.fluids[s], sinpsi=0.5, cohesion=0.0,
                                kinematic_visc=1.0e-6)
        fluids = list(self.fw.pp.fluids)
        fluids[s] = f
        self._update_pp(fluids=tuple(fluids), limiting_kinvisc=1e-6)
        self.set_equation_of_state(w, 7.0, c0)
        self.set_equation_of_state(s, 7.0, c0)
        tref = math.sqrt(H / g)
        self.set_tend(self.get_option("tend", 10 * tref))
        self.add_writer(freq=tref / 10)
        self.set_max_fall(self.hw + self.hs)

        layers = self.dyn_layers
        wall = layers * dp
        self.make_universe_box((-wall, -wall, -wall),
                               (l + 2 * wall, l + 2 * wall, H + 2 * wall))
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            _tank_points((0, 0, 0), (l, l, H), dp,
                         layers if self.boundary == BoundaryType.DYN_BOUNDARY
                         else 1),
        )
        # sediment bed (fluid 1, FG_SEDIMENT) then water above
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (dp, dp, dp), l - 2 * dp, l - 2 * dp, self.hs - dp,
                     fluid_idx=s, sediment=True)
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (dp, dp, self.hs + dp / 2),
                     l - 2 * dp, l - 2 * dp, self.hw - dp / 2)
        self.set_water_level(self.hs + self.hw)


class LithostaticLJ(_LithostaticBase):
    """Lithostatic equilibrium with Lennard-Jones walls
    (reference `src/problems/LithostaticLJ.cu`)."""

    name = "LithostaticLJ"
    boundary = BoundaryType.LJ_BOUNDARY


class LithostaticDYN(_LithostaticBase):
    """Lithostatic equilibrium with dynamic-boundary walls
    (reference `src/problems/LithostaticDYN.cu`)."""

    name = "LithostaticDYN"
    boundary = BoundaryType.DYN_BOUNDARY


class BiFluidPoiseuille(Problem):
    """Two-layer Poiseuille flow (reference
    `src/problems/BiFluidPoiseuille.inc`, DYN variant): SPH_HA, periodic
    x/y, channel height H=2 along z, body force g=0.1 along x, interface at
    z = H (alpha - 1/2); validated against the analytic two-fluid profile
    (`scripts/validate-bifluidepoiseuille.py`)."""

    name = "BiFluidPoiseuille"

    def __init__(self, options=None):
        super().__init__(options)
        H = 2.0
        self.H = H
        config = self.get_option("config", 1)
        lam, omega = {0: (1.0, 1.0), 1: (4.0, 4.0), 2: (0.01, 1.0)}[config]
        self.alpha = 0.5
        g = 0.1
        rho0, nu0 = 4000.0, 0.4
        rho1, nu1 = rho0 / lam, nu0 / omega
        self.setup_framework(
            formulation=SPHFormulation.SPH_HA,
            kernel=KernelType.WENDLAND,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            computational_visc=ComputationalViscosityType.DYNAMIC,
            visc_model=ViscousModel.MORRIS,
            visc_average=AverageOperator.HARMONIC,
            boundary=BoundaryType.DYN_BOUNDARY,
            periodicity=Periodicity.XY,
            density_diffusion=DensityDiffusionType(
                self.get_option("density-diffusion",
                                int(DensityDiffusionType.COLAGROSSI))),
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
            simparams=SimParams(dtadaptfactor=0.3, densityDiffCoeff=0.05),
        )
        self.set_deltap(self.get_option("deltap", 0.05))
        dp = self.deltap
        self.set_gravity((g, 0.0, 0.0))
        # umax of the analytic two-fluid profile (BiFluidPoiseuille.inc:103-120)
        uref = g * H * H / (2 * nu0)
        denom = 4 * (self.alpha + lam * omega - self.alpha * lam * omega) ** 2
        a = self.alpha
        umax0 = uref * (omega + 2*a*(lam-1)*omega + a*a*(1+omega-2*lam*omega))**2 / denom
        umax1 = uref * omega * (a*(2+a*(lam-2)) + (a-1)**2*lam*omega)**2 / denom
        umax = max(umax0, umax1)
        self.umax = umax
        bottom = self.add_fluid(rho0)
        top = self.add_fluid(rho1)
        self.set_equation_of_state(top, 7.0, 10 * umax)
        self.set_equation_of_state(bottom, 7.0, 10 * umax)
        self.set_kinematic_visc(bottom, nu0)
        self.set_kinematic_visc(top, nu1)
        tvisc = max(H * H / nu0, H * H / nu1)
        self.set_tend(self.get_option("tend", 250 * tvisc))
        self.add_writer(freq=tvisc)

        l = a_w = H / 4
        layers = self.dyn_layers
        wall = layers * dp
        self.make_universe_box((-l/2, -a_w/2, -H/2 - wall),
                               (l, a_w, H + 2 * wall))
        gap = dp / 2
        for z0 in (-H/2 - wall, H/2):
            self.add_points(
                GeometryType.FIXED_BOUNDARY,
                geo.fill_box((-l/2 + gap, -a_w/2 + gap, z0 + dp/2),
                             (l - dp, a_w - dp, wall - dp), dp),
            )
        # bottom fluid (fluid 0) under the interface, top fluid above
        zi = H * (self.alpha - 0.5)
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (-l/2 + gap, -a_w/2 + gap, -H/2 + dp/2),
                     l - dp, a_w - dp, zi - dp/2 - (-H/2), fluid_idx=bottom)
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (-l/2 + gap, -a_w/2 + gap, zi + dp/2),
                     l - dp, a_w - dp, H/2 - zi - dp, fluid_idx=top)
        self.set_water_level(H)  # no vertical gravity: uniform density

    def initialize_particles(self, grid, state):
        import jax.numpy as jnp

        return state.replace(rho=jnp.zeros_like(state.rho))


class PoiseuillePapanastasiou(Poiseuille):
    """Poiseuille channel with the Papanastasiou-regularized Bingham
    rheology (reference `src/problems/PoiseuillePapanastasiou.cu` +
    `Poiseuille.inc:73,135-139`: yield strength F rho lz / 4)."""

    name = "PoiseuillePapanastasiou"

    def __init__(self, options=None):
        options = dict(options or {})
        options.setdefault("viscmodel", int(ViscousModel.MORRIS))
        super().__init__(options)
        self.fw = dataclasses_replace(
            self.fw,
            visc=dataclasses_replace(
                self.fw.visc, rheologytype=RheologyType.PAPANASTASIOU),
        )
        ys = self.driving_force * self.fw.pp.fluids[0].rho0 * self.lz / 4
        f = dataclasses_replace(self.fw.pp.fluids[0], yield_strength=ys)
        self._update_pp(fluids=(f,))
        self.fw = self.fw.finalize()


class AccuracyTest(Problem):
    """Dam break in a long box, DYN boundaries + internal energy tracking
    (reference `src/problems/AccuracyTest.cu`): 4.0 x 0.7 x 1.0 domain,
    water column 0.4 x H=0.6 against the left wall."""

    name = "AccuracyTest"

    def __init__(self, options=None):
        super().__init__(options)
        lx, ly, lz = 4.0, 0.7, 1.0
        H = 0.6
        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_INTERNAL_ENERGY,
            simparams=SimParams(dtadaptfactor=0.3),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_timestep(1e-5)
        self.set_tend(self.get_option("tend", 1.5))
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 50.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self._update_pp(artvisccoeff=0.3 * 0.005 / dp)
        self.add_writer(freq=0.1)

        self.make_universe_box((0, 0, 0), (lx, ly, lz))
        # floor + 4 side walls (3-layer slabs, AccuracyTest.cu:76-100)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (0, 0, 0), lx, ly, 3 * dp)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (0, 0, 4 * dp), 3 * dp, ly, lz - 4 * dp)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (lx - 3 * dp, 0, 4 * dp), 3 * dp, ly, lz - 4 * dp)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (4 * dp, 0, 4 * dp), lx - 8 * dp, 3 * dp, lz - 4 * dp)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (4 * dp, ly - 3 * dp, 4 * dp), lx - 8 * dp, 3 * dp,
                     lz - 4 * dp)
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (4 * dp, 4 * dp, 4 * dp), 0.4, ly - 8 * dp, H)
        self.set_water_level(4 * dp + H)


class SolitaryWave(Problem):
    """Solitary wave generated by a piston over a sloping beach with rising
    cylinders (reference `src/problems/SolitaryWave.cu`): LJ boundary +
    implicit planes (incl. the sloped bottom), piston velocity
    c/cosh^2(a t + b) during the stroke window, 10 cylinders rising at
    0.5 m/s for the first second."""

    name = "SolitaryWave"

    def __init__(self, options=None):
        super().__init__(options)
        lx, ly, lz = 9.0, 0.4, 3.0
        slope_length, h_length = 8.5, 0.5
        height = 0.63
        beta = 4.2364 * math.pi / 180.0
        H = 0.45

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT,
            simparams=SimParams(dtadaptfactor=0.3),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        r0 = dp
        self.set_timestep(0.00013)
        self.set_tend(self.get_option("tend", 10.0))
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        g = 9.81
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 20.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self.add_writer(freq=0.1)
        from ..defs import PostProcessType

        self.add_postprocess(PostProcessType.VORTICITY)

        # piston kinematics (SolitaryWave.cu:70-83)
        amplitude = 0.2
        Hoh = amplitude / H
        kappa = math.sqrt(3 * Hoh) / (2.0 * H)
        cel = math.sqrt(g * (H + amplitude))
        S = math.sqrt(16.0 * amplitude * H / 3.0)
        tau = 2.0 * (3.8 + Hoh) / (kappa * cel)
        tstart, tend_p = 0.2, tau
        x0 = r0
        a = 2.0 * (3.8 + Hoh) / tau
        b = 2.0 * ((3.8 + Hoh) * (-tstart / tau - 0.5)
                   - 2.0 * Hoh * (x0 / S - 0.5))
        c = (3.8 + Hoh) * S / tau

        self.make_universe_box((0.0, 0.0, -1.2 * height),
                               (lx, ly, lz + 1.2 * height))
        # fluid: layered fill following the beach (SolitaryWave.cu:92-100)
        pts = []
        n = 0
        z = 0.0
        while z < H:
            z = n * dp + 1.5 * r0
            x = x0 + r0
            l = h_length + z / math.tan(beta) - 1.5 * r0 / math.sin(beta) - x
            if l > 0:
                pts.append(geo.fill_box((x, r0, z), (l, ly - 2 * r0, 0.0), dp))
            n += 1
        self.add_points(GeometryType.FLUID, np.concatenate(pts))

        # piston: single-layer moving plate
        piston = self.add_points(
            GeometryType.MOVING_BODY,
            geo.fill_box((x0, 0, 0), (0.0, ly, height), dp),
        )

        import jax.numpy as jnp

        def piston_motion(t):
            on = (t >= tstart) & (t <= tend_p)
            ch = jnp.cosh(a * t + b)
            vx = jnp.where(on, c / (ch * ch), 0.0)
            return (vx, jnp.zeros_like(vx), jnp.zeros_like(vx)), (0.0, 0.0, 0.0)

        self.set_body_motion(piston, piston_motion)

        # rising cylinders (SolitaryWave.cu:103-133)
        cylp = [
            (h_length + slope_length / (math.cos(beta) * 10), ly / 2),
            (h_length + slope_length / (math.cos(beta) * 10), ly / 6),
            (h_length + slope_length / (math.cos(beta) * 10), 5 * ly / 6),
            (h_length + slope_length / (math.cos(beta) * 5), 0),
            (h_length + slope_length / (math.cos(beta) * 5), ly / 3),
            (h_length + slope_length / (math.cos(beta) * 5), 2 * ly / 3),
            (h_length + slope_length / (math.cos(beta) * 5), ly),
            (h_length + 3 * slope_length / (math.cos(beta) * 10), ly / 6),
            (h_length + 3 * slope_length / (math.cos(beta) * 10), ly / 2),
            (h_length + 3 * slope_length / (math.cos(beta) * 10), 5 * ly / 6),
        ]

        def cyl_motion(t):
            on = (t >= 0.0) & (t <= 1.0)
            vz = jnp.where(on, 0.5, 0.0)
            return (jnp.zeros_like(vz), jnp.zeros_like(vz), vz), (0.0, 0.0, 0.0)

        for i, (cx, cy) in enumerate(cylp):
            radius = 0.05 if i == 0 else 0.025
            gid = self.add_cylinder(
                GeometryType.MOVING_BODY, FillType.BORDER,
                (cx, cy, -height), radius, height,
            )
            self.set_body_motion(gid, cyl_motion)

        # implicit planes (copy_planes, SolitaryWave.cu:178-190)
        w = ly
        l_end = h_length + slope_length
        self.add_plane((0, 0, 0), (0, 0, 1))
        self.add_plane((0, 0, 0), (0, 1, 0))
        self.add_plane((0, w, 0), (0, -1, 0))
        self.add_plane((0, 0, 0), (1, 0, 0))
        self.add_plane((l_end, 0, 0), (-1, 0, 0))
        self.add_plane((h_length, 0, 0),
                       (-math.sin(beta), 0.0, math.cos(beta)))
        self.set_water_level(H)


class DEMExample(Problem):
    """Fluid released over a DEM terrain (reference
    `src/problems/DEMExample.cu`): LJ boundary + ENABLE_DEM geometry force
    + side planes; water box of given height above the terrain.

    Uses the reference's GRASS-ASCII DEM format via ``--dem path``; without
    a file, generates the equivalent half-wave hill procedurally (the
    reference ships `half_wave0.1m.txt`: a 43.3 x 13.4 m swath rising from
    ~0.05 m to ~1 m over a half sine)."""

    name = "DEMExample"

    def __init__(self, options=None):
        super().__init__(options)
        from ..ops.dem import load_dem_ascii, pack_dem

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT,
            simparams=SimParams(dtadaptfactor=0.3),
        )
        self.set_deltap(self.get_option("deltap", 0.05))
        dp = self.deltap

        dem_file = self.options.get("dem")
        if dem_file:
            dem = load_dem_ascii(dem_file)
        else:
            # procedural half-wave hill (like the stock DEM, coarser)
            west, south = 0.05, -0.2
            east, north = 6.0, 2.0
            cols, rows = 120, 44
            ew = (east - west) / cols
            ns = (north - south) / rows
            x = west + ew * (np.arange(cols) + 0.5)
            y = south + ns * (np.arange(rows) + 0.5)
            X, Y = np.meshgrid(x, y)
            h = 0.05 + 0.95 * np.clip(np.sin(
                np.clip((X - 1.0) / 4.0, 0.0, 1.0) * math.pi / 2), 0, 1)
            dem = pack_dem(h, x[0], y[0], ew, ns)
        from ..ops.dem import unpack_dem

        hgrid, west, south, ew, ns = unpack_dem(dem)
        east = west + ew * (hgrid.shape[1] - 1)
        north = south + ns * (hgrid.shape[0] - 1)
        zmax = float(hgrid.max())
        water_height = self.get_option("water_height", 0.8)

        self.fw = dataclasses_replace(
            self.fw, dem=dem, flags=self.fw.flags | SimFlags.ENABLE_DEM)
        self.set_gravity(-9.81)
        self.set_max_fall(2.0)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 10 * math.sqrt(9.81 * 2.0))
        self.add_writer(freq=0.1)
        self.set_tend(self.get_option("tend", 5.0))

        self.make_universe_box((west, south, 0.0),
                               (east - west, north - south, zmax + 2.0))
        # water box above the terrain: fill then erase below the surface
        pts = geo.fill_box((west + dp, south + dp, dp / 2),
                           (east - west - 2 * dp, north - south - 2 * dp,
                            water_height), dp)
        from ..ops.dem import dem_height_normal
        import jax.numpy as jnp

        z0, _ = dem_height_normal(dem, jnp.asarray(pts, jnp.float32))
        keep = pts[:, 2] > np.asarray(z0) + dp
        self.add_points(GeometryType.FLUID, pts[keep])
        # side walls as planes (addDEMPlanes)
        self.add_plane((west, south, 0), (1, 0, 0))
        self.add_plane((east, north, 0), (-1, 0, 0))
        self.add_plane((west, south, 0), (0, 1, 0))
        self.add_plane((east, north, 0), (0, -1, 0))
        self.set_water_level(water_height)


class OffshorePile(Problem):
    """Wave loading on a cylindrical pile over a sloped beach (reference
    `src/problems/OffshorePile.cu`): periodic-y wave flume with a
    sinusoidal piston wavemaker (stroke 0.399 m, T = 2.4 s), 1:40 slope
    after a 4.5 m flat bottom, feedback cylinder (d = 0.2 m) at the 0.4 m
    depth mark with wave gages around it.

    Domain length scales with --lx (reference 60 m; default shortened to
    keep the catalog run tractable)."""

    name = "OffshorePile"

    def __init__(self, options=None):
        super().__init__(options)
        lx = self.get_option("lx", 24.0)
        ly = 1.5
        H = 1.0
        tan_beta = 0.025
        h_length = 4.5
        layers = 3

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.LAMINAR_FLOW,
            visc_model=ViscousModel.MORRIS,
            periodicity=Periodicity.Y,
            filters={FilterType.SHEPARD: 20},
            simparams=SimParams(dtadaptfactor=0.2),
        )
        from ..defs import PostProcessType

        self.add_postprocess(PostProcessType.SURFACE_DETECTION)
        self.set_deltap(self.get_option("deltap", 0.05))
        dp = self.deltap
        self.set_timestep(0.00013)
        self.set_tend(self.get_option("tend", 120.0))
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 40.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self.set_water_level(H)
        self.add_writer(freq=1.0)

        x0 = -1.0
        off_y = dp / 2
        wall = layers * dp
        self.make_universe_box((x0, 0.0, -1.5 * wall),
                               (lx - x0, ly + dp, 3.0 + 1.5 * wall))

        # fluid: columns following the bathymetry (flat + 1:40 slope)
        cols = []
        x = dp / 2
        while x < lx - dp:
            bottom = 0.0 if x <= h_length else (x - h_length) * tan_beta
            if bottom + dp / 2 < H:
                zs = np.arange(bottom + dp / 2, H, dp)
                for z in zs:
                    cols.append((x, z))
            x += dp
        ys = np.arange(off_y, ly + off_y - dp / 4, dp)
        pts = np.asarray([(cx, y, z) for (cx, z) in cols for y in ys])
        self.add_points(GeometryType.FLUID, pts)

        # bottom boundary: flat + slope, 'layers' deep
        bpts = []
        x = x0 + dp / 2
        while x < lx:
            bottom = 0.0 if x <= h_length else (x - h_length) * tan_beta
            for k in range(1, layers + 1):
                for y in ys:
                    bpts.append((x, y, bottom - k * dp))
            x += dp
        self.add_points(GeometryType.FIXED_BOUNDARY, np.asarray(bpts))
        # far wall
        zfw0 = (lx - h_length) * tan_beta if lx > h_length else 0.0
        self.add_points(
            GeometryType.FIXED_BOUNDARY,
            geo.fill_box((lx - (layers - 1) * dp, off_y, zfw0 - layers * dp),
                         ((layers - 1) * dp, ly - dp, H + layers * dp), dp),
        )

        # piston wavemaker (index 1): (layers-1)*dp thick plate
        piston = self.add_points(
            GeometryType.MOVING_BODY,
            geo.fill_box((-(layers + 0.5) * dp, off_y, -dp),
                         ((layers - 1) * dp, ly - dp, 2 * H), dp),
        )
        amp = 0.399 / 2.0
        omega = 2.0 * math.pi / 2.4
        tstart = 0.2
        import jax.numpy as jnp

        def piston_motion(t):
            on = t >= tstart
            vx = jnp.where(on, -amp * omega * jnp.sin(omega * (t - tstart)), 0.0)
            return (vx, jnp.zeros_like(vx), jnp.zeros_like(vx)), (0.0, 0.0, 0.0)

        self.set_body_motion(piston, piston_motion)

        # feedback cylinder at the 0.4 m depth mark
        cyl_x = h_length + 0.4 / tan_beta
        if cyl_x < lx - 1.0:
            self.add_cylinder(
                GeometryType.MOVING_BODY, FillType.BORDER,
                (cyl_x, ly / 2, 0.0), (0.2 - dp) / 2, 2 * H,
                feedback=True,
            )
        # wave gages (OffshorePile.cu:88-99)
        sl = self.fw.sp.slength
        for w in (0.0, sl, 0.5 * sl, 0.25 * sl, 2 * sl):
            self.add_gage(min(cyl_x, lx - 1.0), ly / 2 + off_y + 0.5, w)
        for xg in (1.0, h_length, h_length * 3 / 4, h_length / 2, h_length / 4):
            self.add_gage(xg, ly / 2 + off_y, dp)


class ChannelIO(Problem):
    """Open channel with a velocity-driven inlet and a pressure-driven
    outlet (reference `src/problems/ChannelIO.cu:38-200`: SA walls from
    Crixus meshes, `setVelocityDriven(inlet, 1)` / `(outlet, 0)`, imposed
    BC callback `ChannelIO_imposeBoundaryCondition` — velocity U on the
    VEL_IO rows, hydrostatic water-depth pressure on the PRES_IO rows).
    Procedural SA meshes here; the reference's dynamic IO water-depth
    reduction is simplified to the nominal still-water depth.  Creation /
    destruction at the open boundaries per `gpusph-theory.tex:798-980`.
    """

    name = "ChannelIO"

    def __init__(self, options=None):
        super().__init__(options)
        L = self.get_option("length", 1.0)
        W = self.get_option("width", 0.3)
        h0 = self.get_option("water_height", 0.2)
        U = self.get_option("velocity", 0.4)
        self.L, self.h0, self.U = L, h0, U

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.SA_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            density_diffusion=DensityDiffusionType.COLAGROSSI,
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", h0 / 8))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(h0)
        fl = self.add_fluid(1000.0)
        c0 = 10.0 * max(U, math.sqrt(9.81 * h0))
        self.set_equation_of_state(fl, 7.0, c0)
        self.set_tend(self.get_option("tend", 2.0))
        self.add_writer(freq=0.1)

        h_box = h0 + 6 * dp
        self.make_universe_box((-3 * dp, -2 * dp, -2 * dp),
                               (L + 6 * dp, W + 4 * dp, h_box + 4 * dp))
        # walls: bottom + both y sides; x ends stay open for the IO plates
        self.add_sa_box((0.0, 0.0, 0.0), (L, W, h_box), faces="channel")
        # inlet plate (inward normal +x), velocity-driven; edge-to-edge
        # with the channel walls (gaps leak), spanning only the wetted
        # height (dry inlet rows must not create particles; the reference
        # gates this with its IO water-depth machinery,
        # FIND_MAX_IOWATERDEPTH).  Spawns embedded in the side walls are
        # rejected by the clearance guard in inlet_create_host.
        self.add_sa_plate((0.0, 0.0, 0.0), (0.0, W, 0.0),
                          (0.0, 0.0, h0),
                          (1.0, 0.0, 0.0), io=("inlet", True))
        # outlet plate (inward normal -x), pressure-driven, full height
        self.add_sa_plate((L, 0.0, 0.0), (0.0, W, 0.0),
                          (0.0, 0.0, h_box),
                          (-1.0, 0.0, 0.0), io=("outlet", False))

        import jax.numpy as jnp

        rho0, g = 1000.0, 9.81
        t_ramp = self.get_option("ramp", 0.2)

        def imposed_vel(pos, t):
            u = jnp.float32(U) * jnp.minimum(t / jnp.float32(t_ramp), 1.0)
            z = jnp.zeros(pos.shape[0], pos.dtype)
            return jnp.stack([jnp.full_like(z, u), z, z], axis=-1)

        def imposed_press(pos, t, waterdepth):
            # hydrostatic head below the *measured* water surface at the
            # outlet (ChannelIO_imposeBoundaryCondition, ChannelIO.cu:111-191:
            # localdepth = max(waterdepth - absPos.z, 0)); fall back to the
            # nominal fill height while no fluid is near (ChannelIO.cu:186-188)
            surf = jnp.where(waterdepth[0] > 0.0, waterdepth[0],
                             jnp.float32(h0))
            return jnp.float32(rho0 * g) * jnp.maximum(surf - pos[:, 2], 0.0)

        def outflow(pos):
            # SA fluid rests dp/2 off a wall: crossing that offset IS
            # leaving through the outlet segment (findOutgoingSegment)
            return pos[:, 0] > jnp.float32(L - 0.5 * dp)

        self.set_io(imposed_vel=imposed_vel, imposed_press=imposed_press,
                    outflow=outflow,
                    # FIND_MAX_IOWATERDEPTH region: the outlet plate's AABB
                    depth_boxes=(((L, 0.0, 0.0), (L, W, h_box)),))
        from ..defs import PostProcessType

        self.add_postprocess(PostProcessType.FLUX_COMPUTATION)
        # spare slots for inlet-created particles over the whole run
        tend = self.fw.sp.tend or 2.0
        self.inlet_reserve = int(1.5 * U * W * h0 / dp**3 * tend) + 64

        wd = dp
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (wd, wd, wd), L - 2 * wd, W - 2 * wd, h0 - wd)



class Objects(Problem):
    """Dam break with fixed obstacles and two floating bodies — a rotated
    cube and a sphere at quarter water density (reference
    `src/problems/Objects.cu:44-188`).  The reference's optional Chrono
    distance joint between the two bodies (`initializeObjectJoints`,
    `Objects.cu:199-211`) is not supported (free 6-DOF bodies only)."""

    name = "Objects"

    def __init__(self, options=None):
        super().__init__(options)
        dim = (1.6, 0.8, 0.8)
        water_length, water_height = 0.5, 0.5
        obstacle_side = 0.1
        objects_side = 0.08
        obstacle_xpos = 1.0
        n_obstacles = self.get_option("num_obstacles", 1)
        rotate_obstacle = self.get_option("rotate_obstacle", 1)

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            visc_model=ViscousModel.MORRIS,
            density_diffusion=DensityDiffusionType(
                self.get_option("density-diffusion",
                                int(DensityDiffusionType.FERRARI))),
            simparams=SimParams(densityDiffCoeff=0.1),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(water_height)
        self.add_fluid(1000.0)
        self.set_equation_of_state(0, 7.0, 20.0)
        self.set_dynamic_visc(0, 1.0e-4)
        self.set_tend(self.get_option("tend", 2.0))
        self.add_writer(freq=0.01)

        self.make_universe_box((0.0, 0.0, 0.0), dim)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                     (0, 0, 0), *dim, open_top=True)
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (dp, dp, dp), water_length - dp, dim[1] - 2 * dp,
                     water_height - dp)
        self.set_water_level(water_height)

        # fixed obstacles (PP_BOTTOM_CENTER placement, optional 45-degree
        # z-rotation about the corner like the reference)
        y_dist = dim[1] / (n_obstacles + 1)
        for i in range(n_obstacles):
            cy = y_dist * (i + 1) + (obstacle_side / 2 if rotate_obstacle else 0)
            obst = self.add_box(
                GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                (obstacle_xpos - obstacle_side / 2, cy - obstacle_side / 2, dp),
                obstacle_side, obstacle_side, dim[2] / 2,
            )
            if rotate_obstacle:
                self.rotate(obst, 0, 0, math.pi / 4)
            self.erase_fluid_inside(geo.box_predicate(
                (obstacle_xpos - obstacle_side, cy - obstacle_side, 0.0),
                (2 * obstacle_side, 2 * obstacle_side, dim[2] / 2),
                margin=dp / 2))

        rho0 = 1000.0
        rho_body = rho0 / 4  # quarter density so the bodies float

        # floating cube (PP_CENTER), rotated about Y then Z by 45 degrees
        cc = (water_length, dim[1] / 5 * 1.5, water_height)
        c0 = tuple(c - objects_side / 2 for c in cc)
        cube = self.add_box(GeometryType.FLOATING_BODY, FillType.BORDER,
                            c0, objects_side, objects_side, objects_side)
        g = self.geometries[cube]
        g.mass = rho0 * dp**3  # setParticleMassByDensity(rho0)
        g.body_mass = rho_body * objects_side**3
        ic = g.body_mass * objects_side**2 / 6.0
        g.inertia = (ic, ic, ic)
        self.rotate(cube, 0, math.pi / 4, math.pi / 4,
                    center=np.asarray(cc))

        # floating sphere
        sc = (water_length, dim[1] / 5 * 2.5, water_height)
        sph = self.add_sphere(GeometryType.FLOATING_BODY, FillType.BORDER,
                              sc, objects_side / 2)
        g = self.geometries[sph]
        g.mass = rho0 * dp**3
        g.body_mass = rho_body * 4.0 / 3.0 * math.pi * (objects_side / 2) ** 3
        isph = 0.4 * g.body_mass * (objects_side / 2) ** 2
        g.inertia = (isph, isph, isph)


class SlidingWedge(Problem):
    """Submarine landslide: a wedge slides down a 2:1 slope with the
    prescribed cubic displacement law of the Watts experiment (reference
    `src/problems/SlidingWedge.cu:39-258`, `moving_bodies_callback`
    `:125-147`)."""

    name = "SlidingWedge"

    def __init__(self, options=None):
        super().__init__(options)
        import jax.numpy as jnp

        lx, ly, lz = 10.0, 3.7, 3.1
        H = 2.44
        tan_beta = 0.5
        beta = math.atan(tan_beta)
        x0 = 0.5

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            visc_model=ViscousModel.MORRIS,
            computational_visc=ComputationalViscosityType.KINEMATIC,
            density_diffusion=DensityDiffusionType.FERRARI,
            simparams=SimParams(densityDiffCoeff=1.0, dtadaptfactor=0.2),
        )
        self.set_deltap(self.get_option("deltap", 0.1))
        dp = self.deltap
        self.set_timestep(0.00013)
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        self.add_fluid(1000.0)
        self.set_equation_of_state(0, 7.0, 30.0)
        self.set_kinematic_visc(0, 1.0e-6)
        t0 = 0.4
        self.t0 = t0
        self.set_tend(self.get_option("tend", 4.0 + t0))
        self.add_writer(freq=0.1)

        self.make_universe_box((-x0 - dp, -ly / 2 - dp, -H - 2 * dp),
                               (lx + 2 * dp, ly + 2 * dp, lz + 3 * dp))

        # water: box cut by the slope plane z = -x/2 (PlaneCut(1,0,2,0))
        wat = self.add_box(GeometryType.FLUID, FillType.SOLID,
                           (-x0, -ly / 2, -H), lx, ly, H)
        pts = self.geometries[wat].points
        self.geometries[wat].points = pts[
            pts[:, 0] + 2 * pts[:, 2] < -dp / 4]

        # sloped bottom as an LJ plane + side/end walls as planes
        self.add_plane((0.0, 0.0, 0.0), (-math.sin(beta), 0.0, math.cos(beta)))
        self.add_plane((-x0, 0.0, 0.0), (1.0, 0.0, 0.0))
        self.add_plane((lx - x0, 0.0, 0.0), (-1.0, 0.0, 0.0))
        self.add_plane((0.0, -ly / 2, 0.0), (0.0, 1.0, 0.0))
        self.add_plane((0.0, ly / 2, 0.0), (0.0, -1.0, 0.0))

        # the wedge: 0.91 x 0.61 x 0.455 triangular prism approximated by
        # its bounding box surface, placed on the slope at the waterline,
        # sliding with the prescribed law (Watts 2005 experiment constants)
        ws = (0.91, 0.61, 0.455)
        wedge_c = (0.3, -ws[1] / 2, 0.05 - ws[2])
        wedge = self.add_box(GeometryType.MOVING_BODY, FillType.BORDER,
                             wedge_c, *ws)
        self.rotate(wedge, 0, -beta, 0, center=np.asarray(
            (wedge_c[0], 0.0, wedge_c[2] + ws[2])))
        self.erase_fluid_inside(geo.box_predicate(
            (wedge_c[0] - ws[2], wedge_c[1], wedge_c[2] - ws[0] * tan_beta),
            (ws[0] + 2 * ws[2], ws[1], ws[2] + ws[0]), margin=dp / 2))

        a, b, c = -0.097588, 0.759361, 0.078776
        cosb, sinb = math.cos(beta), math.sin(beta)
        t_slide = 2.6714

        def wedge_motion(t):
            # velocity of f(t) = a t^3 + b t^2 + c t along the slope
            # (moving_bodies_callback, SlidingWedge.cu:125-147; the
            # reference's v1 uses `+ t1` for the linear term — kept as the
            # published law's `+ c`)
            tt = jnp.clip(t - t0, 0.0, t_slide)
            v = 3 * a * tt * tt + 2 * b * tt + c
            live = ((t >= t0) & (t <= t0 + t_slide)).astype(jnp.float32)
            v = v * live
            lin = jnp.stack([v * cosb, jnp.zeros_like(v), -v * sinb])
            return lin, jnp.zeros(3, jnp.float32)

        self.set_body_motion(wedge, wedge_motion)

        for zf in (1.0, 0.5, 0.25, 0.0):
            self.add_gage(1.83, 0.0)
            self.add_gage(1.2446, 0.635)


class OilJet(Problem):
    """Oil jet: a piston pushes fluid up a submerged pipe into a water
    basin, Grenier formulation (reference `src/problems/OilJet.cu:43-152`,
    piston law `moving_bodies_callback` `:139-152`)."""

    name = "OilJet"

    def __init__(self, options=None):
        super().__init__(options)
        import jax.numpy as jnp

        layers = 5
        water_level = 2.0
        pipe_length = 2.0
        inner_diam = 0.4
        lx = ly = 2.0

        self.setup_framework(
            formulation=SPHFormulation.SPH_GRENIER,
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            visc_model=ViscousModel.MORRIS,
            simparams=SimParams(dtadaptfactor=0.2),
        )
        self.set_dynamic_boundaries_layers(layers)
        self.set_deltap(self.get_option("deltap", 0.05))
        dp = self.deltap
        self.set_timestep(0.00013)
        self.set_gravity(-9.81)
        self.set_max_fall(water_level)
        self.add_fluid(1000.0)
        self.set_equation_of_state(0, 7.0, 10.0)
        self.set_kinematic_visc(0, 1.0e-6)
        self.set_tend(self.get_option("tend", 2.0))
        self.add_writer(freq=0.01)

        lz = water_level + pipe_length + layers * dp
        lm1 = layers - 1
        self.make_universe_box((0.0, 0.0, -pipe_length - layers * dp),
                               (lx, ly, 1.1 * lz))

        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (dp / 2, dp / 2, dp / 2),
                     lx - dp, ly - dp, water_level - dp)
        self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                     (dp / 2, dp / 2, -(lm1 + 0.5) * dp),
                     lx - dp, ly - dp, lm1 * dp)
        # erase the basin floor where the pipe passes through
        self.erase_fluid_inside(
            lambda p: ((p[:, 0] - lx / 2) ** 2 + (p[:, 1] - ly / 2) ** 2
                       < (inner_diam / 2) ** 2) & (p[:, 2] < dp / 2))

        plength = pipe_length + lm1 * dp - dp / 2
        cbase = (lx / 2, ly / 2, -plength - dp / 2)
        self.add_cylinder(GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                          cbase, (inner_diam - dp) / 2 + lm1 * dp, plength)
        self.add_cylinder(GeometryType.FLUID, FillType.SOLID,
                          cbase, (inner_diam - dp) / 2, plength)

        piston = self.add_cylinder(
            GeometryType.MOVING_BODY, FillType.SOLID,
            cbase, (inner_diam - dp) / 2 + lm1 * dp, lm1 * dp)
        piston_vel = 1.0

        def piston_motion(t):
            vz = jnp.full((), piston_vel, jnp.float32)
            z = jnp.zeros((), jnp.float32)
            return jnp.stack([z, z, vz]), jnp.zeros(3, jnp.float32)

        self.set_body_motion(piston, piston_motion)
        self.set_water_level(water_level)


class DynBoundsExample(Problem):
    """Inclined 2D Poiseuille sheet flow between dynamic-boundary plates,
    double-periodic in x/y, driven by tilted gravity (reference
    `src/problems/DynBoundsExample.cu:28-122`; hydrostatic density init
    `:105-122`)."""

    name = "DynBoundsExample"

    def __init__(self, options=None):
        super().__init__(options)
        W = 1.0
        H = 2 * W
        degs = 60.0
        alpha = math.pi * degs / 180.0
        g = 9.81

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            visc_model=ViscousModel.MORRIS,
            periodicity=Periodicity.XY,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_REPACKING,
        )
        self.set_deltap(self.get_option("deltap", W / 64))
        dp = self.deltap
        w = 4 * dp
        self.alpha, self.H, self.w = alpha, H, w
        self.set_gravity((g * math.sin(alpha), 0.0, -g * math.cos(alpha)))
        maxvel = math.sqrt(g * H)
        self.set_max_fall(H)
        self.add_fluid(1.0)
        self.set_equation_of_state(0, 7.0, 10 * maxvel)
        self.set_kinematic_visc(0, 120.0)
        self.set_tend(self.get_option("tend", 2.0))
        self.repack_maxiter = 1000
        self.add_writer(freq=0.01)

        o = (-W / 2, -W / 2, -(H + 2 * w) / 2)
        self.make_universe_box(o, (W, W, H + 2 * w))
        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (o[0] + dp / 2, o[1] + dp / 2, o[2] + w + dp),
                     W - dp, W - dp, H - 2 * dp)
        for z0 in (o[2], o[2] + H + w):
            self.add_box(GeometryType.FIXED_BOUNDARY, FillType.SOLID,
                         (o[0], o[1], z0), W - dp / 2, W - dp / 2, w)

    def initialize_particles(self, grid, state):
        # hydrostatic density against the tilted gravity (reference
        # initializeParticles, DynBoundsExample.cu:105-122)
        import jax.numpy as jnp

        from ..ops import eos as _eos

        ht = (self.origin[2] + self.H + 2 * self.w - state.pos[:, 2]) * \
            math.cos(self.alpha)
        # hydrostatic_density uses |g_z| = 9.81 cos(alpha) from PhysParams
        rho = _eos.hydrostatic_density(self.fw.pp, jnp.maximum(ht, 0.0), 0)
        return state.replace(
            rho=jnp.where(state.active, rho, state.rho))


class Spheric2SA(Problem):
    """SPHERIC test case 2 with semi-analytical boundaries and k-epsilon
    turbulence (reference `src/problems/Spheric2SA.cu:38-110`: Crixus
    h5sph geometry, KEPSVISC, Ferrari diffusion, gamma quadrature).  The
    tank + obstacle meshes are generated procedurally (tank box with inward
    normals, obstacle box with outward normals) instead of the HDF5 input.
    """

    name = "Spheric2SA"

    def __init__(self, options=None):
        super().__init__(options)
        lx, ly, lz = 3.22, 1.0, 1.0
        H = 0.55

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.SA_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            turbulence_model=TurbulenceModel.KEPSILON,
            visc_model=ViscousModel.MORRIS,
            density_diffusion=DensityDiffusionType.FERRARI,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_GAMMA_QUADRATURE,
            simparams=SimParams(dtadaptfactor=0.3, densityDiffCoeff=0.1,
                                ferrariLengthScale=0.161),
        )
        self.set_deltap(self.get_option("deltap", 0.02715))
        dp = self.deltap
        self.set_gravity(-9.81)
        self.set_max_fall(H)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 130.0)
        self.set_kinematic_visc(fl, 1.0e-6)
        self.set_tend(self.get_option("tend", 1.2))
        self.add_writer(freq=0.01)

        self.make_universe_box((-2 * dp, -2 * dp, -2 * dp),
                               (lx + 4 * dp, ly + 4 * dp, lz + 4 * dp))
        self.add_sa_box((0.0, 0.0, 0.0), (lx, ly, lz), faces="all")
        # Kleefsman obstacle as an outward SA box on the floor
        ob = (2.3955, 0.295, 0.0)
        os_ = (0.161, 0.403, 0.161)
        self.add_sa_box(ob, os_, faces="open_top", outward=True)

        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (lx - 1.228 + dp / 2, dp, dp),
                     1.228 - 3 * dp / 2, ly - 2 * dp, H - dp)
        self.erase_fluid_inside(
            geo.box_predicate(ob, os_, margin=dp / 2))
        self.set_water_level(H)

        for x in (2.724, 2.228, 1.732, 0.582):
            self.add_gage(x, 0.5)
        for z in (0.021, 0.061, 0.101, 0.141):
            self.add_testpoint((2.3955, 0.5, z))
        for x in (2.4165, 2.4565, 2.4965, 2.5365):
            self.add_testpoint((x, 0.5, 0.161))

    def initialize_particles(self, grid, state):
        # k-eps seeding like TurbulentPoiseuilleFlowSA (reference inits
        # k/eps through init_keps)
        import jax.numpy as jnp

        extras = dict(state.extras)
        k0 = 1e-4
        extras["tke"] = jnp.where(state.active, k0, extras["tke"])
        extras["eps"] = jnp.where(state.active, 1e-4, extras["eps"])
        extras["turbvisc"] = 0.09 * extras["tke"] ** 2 / jnp.maximum(
            extras["eps"], 1e-10)
        return state.replace(extras=extras)


class CompleteSaExample(Problem):
    """Showcase SA problem: cubic tank with a velocity-driven inlet and an
    immersed cube (reference `src/problems/CompleteSaExample.cu:38-130`:
    SA_BOUNDARY + ENABLE_INLET_OUTLET + ENABLE_DENSITY_SUM, dynamic visc
    1e-2, water level 0.5, 4 m/s inlet with a 1 s fade-in,
    `CompleteSaExample.h:35-43` VELOCITY_DRIVEN/INLET_* constants).

    Geometry is generated procedurally in place of the reference's Crixus
    h5sph inputs (the same meshes can be loaded via ``add_hdf5_file`` when
    .h5sph files are available).  The floating cube (kent2, mass by density
    500) is modeled as a fixed SA obstacle: moving SA meshes are not wired
    into the rigid-body engine yet.

    Options: deltap, tend, pressure_driven (reference VELOCITY_DRIVEN=0),
    inlet_level (INLET_WATER_LEVEL, pressure mode).
    """

    name = "CompleteSaExample"

    def __init__(self, options=None):
        super().__init__(options)
        box = 1.0
        H = 0.5  # setWaterLevel(0.5)
        U = 4.0  # INLET_VELOCITY
        fade = 1.0  # INLET_VELOCITY_FADE
        vel_driven = not self.get_option("pressure_driven", False)
        inlet_level = self.get_option("inlet_level", 0.9)  # INLET_WATER_LEVEL

        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.SA_BOUNDARY,
            rheology=RheologyType.NEWTONIAN,
            visc_model=ViscousModel.MORRIS,
            density_diffusion=DensityDiffusionType.BREZZI,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_DENSITY_SUM,
            simparams=SimParams(densityDiffCoeff=0.01, buildneibsfreq=1),
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        dp = self.deltap
        self.set_gravity(-9.81)
        # setMaxParticleSpeed(7.0) -> c0 = 10*vmax
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 70.0)
        self.set_kinematic_visc(fl, 1.0e-2)
        self.set_tend(self.get_option("tend", 0.2))
        self.add_writer(freq=1e-2)

        margin = 0.1
        self.make_universe_box((-margin, -margin, -margin),
                               (box + 2 * margin, box + 2 * margin,
                                box + 2 * margin))
        # tank: open top, open x=0 end (inlet side)
        self.add_sa_box((0.0, 0.0, 0.0), (box, box, box), faces="channel")
        # far-end wall plate closes x=box (inward normal -x)
        self.add_sa_plate((box, 0.0, 0.0), (0.0, box, 0.0),
                          (0.0, 0.0, box), (-1.0, 0.0, 0.0))
        # inlet plate on x=0 up to the water level, IO-driven
        self.add_sa_plate((0.0, 0.0, 0.0), (0.0, box, 0.0),
                          (0.0, 0.0, H), (1.0, 0.0, 0.0),
                          io=("inlet", vel_driven))
        # wall plate above the inlet (x=0, z in [H, box])
        self.add_sa_plate((0.0, 0.0, H), (0.0, box, 0.0),
                          (0.0, 0.0, box - H), (1.0, 0.0, 0.0))

        # immersed cube (reference kent2 special boundary, setMassByDensity
        # 500 -> would float; fixed obstacle here)
        cside = 0.15
        corig = (0.5 - cside / 2, 0.5 - cside / 2, 0.5 - cside)
        self.add_sa_box(corig, (cside, cside, cside), faces="all",
                        outward=True)

        self.add_box(GeometryType.FLUID, FillType.SOLID,
                     (dp, dp, dp), box - 2 * dp, box - 2 * dp, H - dp)
        self.erase_fluid_inside(
            geo.box_predicate(corig, (cside, cside, cside), margin=dp / 2))
        self.set_water_level(H)

        import jax.numpy as jnp

        def imposed_vel(pos, t):
            # INLET_VELOCITY with INLET_VELOCITY_FADE ramp
            # (CompleteSaExample.cu:216-221)
            u = jnp.float32(U) * jnp.minimum(t / jnp.float32(fade), 1.0)
            z = jnp.zeros(pos.shape[0], pos.dtype)
            return jnp.stack([jnp.full_like(z, u), z, z], axis=-1)

        def imposed_press(pos, t):
            # pressure inlet: hydrostatic head below INLET_WATER_LEVEL
            # (CompleteSaExample.cu:203-214)
            return jnp.float32(9.81e3) * jnp.maximum(
                jnp.float32(inlet_level) - pos[:, 2], 0.0)

        self.set_io(imposed_vel=imposed_vel, imposed_press=imposed_press,
                    outflow=None)
        tend = self.fw.sp.tend or 0.2
        area = box * H
        self.inlet_reserve = int(1.5 * U * area * tend / dp ** 3) + 64


class StillWaterRepackSA(StillWaterSA):
    """StillWaterSA preceded by particle repacking (reference
    `src/problems/StillWaterRepackSA.cu`: ENABLE_REPACKING,
    repack_maxiter=10, repack_a=0.1, repack_alpha=0.1)."""

    name = "StillWaterRepackSA"

    def __init__(self, options=None):
        super().__init__(options)
        self.fw = dataclasses_replace(
            self.fw, flags=self.fw.flags | SimFlags.ENABLE_REPACKING)
        self._update_sp(repack_maxiter=10, repack_a=0.1, repack_alpha=0.1)


class LithostaticSA(_LithostaticBase):
    """Lithostatic equilibrium with semi-analytical boundaries (reference
    `src/problems/LithostaticSA.cu`: LITHOSTATIC_BOUNDARY=SA_BOUNDARY,
    LITHOSTATIC_FLAGS=ENABLE_MULTIFLUID|ENABLE_DTADAPT|ENABLE_DENSITY_SUM).

    The reference imports a Salome/Crixus h5sph tank; here the SA container
    is built procedurally (outward SA box) like StillWaterSA.  This is the
    BASELINE.md lithostatic 1% fidelity case for SA boundaries: the Jacobi
    effective-pressure solve must settle onto
    p_eff(z) = (rho_sed - rho_w) g (hs - z) and the density-sum pressure
    onto the two-layer hydrostatic profile."""

    name = "LithostaticSA"
    boundary = BoundaryType.SA_BOUNDARY

    def __init__(self, options=None):
        super().__init__(options)
        # LithostaticSA.cu:27-28: SA adds ENABLE_DENSITY_SUM (dynamic gamma)
        self.fw = dataclasses_replace(
            self.fw, flags=self.fw.flags | SimFlags.ENABLE_DENSITY_SUM)
        dp = self.deltap
        H, l = 2.5, 1.0
        # replace the LJ/DYN point-filled tank of the base class with an
        # SA container (segments + vertices), keeping the fluid fills
        self.geometries = [g for g in self.geometries
                           if g.gtype != GeometryType.FIXED_BOUNDARY]
        self.sa_meshes = []
        self.make_universe_box((-2 * dp, -2 * dp, -2 * dp),
                               (l + 4 * dp, l + 4 * dp, H + 4 * dp))
        self.add_sa_box((0.0, 0.0, 0.0), (l, l, H), faces="all")

    def initialize_particles(self, grid, state):
        # hydrostatic two-layer density + lithostatic effpres seed
        # (Lithostatic.inc initializeParticles): water column of depth
        # hw above z=hs, sediment below
        import jax.numpy as jnp

        from ..ops import eos as _eos
        from ..state import FG_SEDIMENT, has_flag, is_fluid

        pp = self.fw.pp
        g = self.get_gravity_magnitude()
        z = state.pos[:, 2]
        sed = has_flag(state.info, FG_SEDIMENT)
        # pressure: water rho_w g (hw+hs - z); sediment adds its own column
        P_w = pp.fluids[0].rho0 * g * jnp.maximum(self.hs + self.hw - z, 0.0)
        P_s = (pp.fluids[0].rho0 * g * self.hw
               + pp.fluids[1].rho0 * g * jnp.maximum(self.hs - z, 0.0))
        P = jnp.where(sed, P_s, P_w)
        fnum = jnp.where(sed, 1, 0)
        rho = _eos.density_for_pressure(pp, P, fnum)
        rho = jnp.where(is_fluid(state.info) & state.active, rho,
                        jnp.zeros_like(rho))
        return state.replace(rho=rho.astype(jnp.float32))


class BiFluidPoiseuilleSA(BiFluidPoiseuille):
    """Two-layer Poiseuille flow with SA wall plates (reference
    `src/problems/BiFluidPoiseuilleSA.cu`: BIFLUIDPOISEUILLE_BOUNDARY=
    SA_BOUNDARY, flags ENABLE_DTADAPT|ENABLE_MULTIFLUID|ENABLE_DENSITY_SUM;
    geometry from the PoiseuilleFlowSA Crixus meshes — built procedurally
    here as periodic SA plates at z = +-H/2 like TurbulentPoiseuilleFlowSA).
    """

    name = "BiFluidPoiseuilleSA"

    def __init__(self, options=None):
        super().__init__(options)
        from ..geometry.sa_mesh import plate_sa_mesh

        self.fw = dataclasses_replace(
            self.fw,
            boundarytype=BoundaryType.SA_BOUNDARY,
            flags=self.fw.flags | SimFlags.ENABLE_DENSITY_SUM,
        )
        dp = self.deltap
        H = self.H
        l = a_w = H / 4
        # drop the DYN wall fills; SA plates bound the channel instead
        self.geometries = [
            g for g in self.geometries
            if g.gtype != GeometryType.FIXED_BOUNDARY
        ]
        self.make_universe_box((-l / 2, -a_w / 2, -H / 2 - 2 * dp),
                               (l, a_w, H + 4 * dp))
        for (z0, nrm) in ((-H / 2, (0, 0, 1.0)), (H / 2, (0, 0, -1.0))):
            self.sa_meshes.append(plate_sa_mesh(
                (-l / 2, -a_w / 2, z0), (l, 0, 0), (0, a_w, 0), nrm, dp,
                periodic_u=True, periodic_v=True,
            ))


class ProblemExample(Problem):
    """API showcase problem (reference `src/problems/ProblemExample.cu`):
    an infinite floor plane with a rotated grid of fixed cubes and a grid
    of fluid spheres raining on them; LJ boundary + planes, artificial
    viscosity."""

    name = "ProblemExample"

    def __init__(self, options=None):
        super().__init__(options)
        self.setup_framework(
            kernel=KernelType.WENDLAND,
            boundary=BoundaryType.LJ_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_PLANES,
        )
        self.set_deltap(self.get_option("deltap", 0.02))
        self.set_gravity(-9.81)
        self.set_max_fall(3.0)
        fl = self.add_fluid(1000.0)
        self.set_equation_of_state(fl, 7.0, 20.0)
        self.set_tend(self.get_option("tend", 1.0))
        self.add_writer(freq=0.1)

        dimX, dimY, dimZ = 10.0, 10.0, 3.0
        self.make_universe_box((0.0, 0.0, 0.0), (dimX, dimY, dimZ))
        self.add_plane((0, 0, 0), (0, 0, 1))  # infinite floor

        cube_size, cube_z = 0.4, 1.0
        sphere_radius, sphere_z = 0.5, 2.0
        grid_size = dimX / 5
        corner = dimX / 2 - grid_size / 2
        ncubes, nspheres = 4, 3
        for i in range(ncubes):
            for j in range(ncubes):
                cx = corner + i * grid_size / (ncubes - 1)
                cy = corner + j * grid_size / (ncubes - 1)
                gid = self.add_box(
                    GeometryType.FIXED_BOUNDARY, FillType.BORDER,
                    (cx - cube_size / 2, cy - cube_size / 2,
                     cube_z - cube_size / 2),
                    cube_size, cube_size, cube_size)
                self.rotate(gid, i * (math.pi / 2) / ncubes,
                            j * (math.pi / 2) / ncubes, 0.0,
                            center=(cx, cy, cube_z))
        for i in range(nspheres):
            for j in range(nspheres):
                self.add_sphere(
                    GeometryType.FLUID, FillType.SOLID,
                    (corner + i * grid_size / (nspheres - 1),
                     corner + j * grid_size / (nspheres - 1), sphere_z),
                    sphere_radius)
