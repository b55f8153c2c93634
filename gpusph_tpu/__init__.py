"""gpusph_tpu — a TPU-native weakly-compressible SPH framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of GPUSPH
(reference at /root/reference; see SURVEY.md for the full map).  The compute
path is pure-functional SPMD JAX; host orchestration is a thin Python driver;
multi-chip runs shard the cell grid over a `jax.sharding.Mesh` with ICI halo
exchange.
"""
from . import defs
from .defs import (
    AverageOperator,
    BoundaryType,
    ComputationalViscosityType,
    DensityDiffusionType,
    FilterType,
    KernelType,
    Periodicity,
    PostProcessType,
    RheologyType,
    SimFlags,
    SPHFormulation,
    TurbulenceModel,
    ViscousModel,
    ParticleType,
)
from .framework import SimFramework, ViscSpec, setup_framework
from .integrator import Simulator
from .params import Fluid, PhysParams, SimParams
from .state import ParticleState, empty_state, make_info

__version__ = "0.1.0"

__all__ = [
    "defs",
    "SimFramework",
    "ViscSpec",
    "setup_framework",
    "Simulator",
    "Fluid",
    "PhysParams",
    "SimParams",
    "ParticleState",
    "empty_state",
    "make_info",
    "KernelType",
    "SPHFormulation",
    "DensityDiffusionType",
    "BoundaryType",
    "ParticleType",
    "RheologyType",
    "TurbulenceModel",
    "ViscousModel",
    "ComputationalViscosityType",
    "AverageOperator",
    "FilterType",
    "PostProcessType",
    "Periodicity",
    "SimFlags",
]
