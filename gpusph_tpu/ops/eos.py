"""Cole (Tait) equation of state and sound speed.

TPU-native equivalent of the reference's `src/cuda/phys_core.cu:105-152`
device functions and the host-side helpers `src/ProblemCore.h:234-273`.

Density convention: all state carries the *relative* density
``rho_tilde = rho/rho0 - 1``; the per-fluid coefficients are baked in as
constants (the fluid number indexes tuples of python floats, selected with
``jnp.where`` chains over the — usually tiny — fluid count).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import PhysParams


def _per_fluid(pp: PhysParams, fluid_num, values):
    """Select a per-fluid constant by (traced) fluid number.

    With a single fluid this folds to a constant; with few fluids it becomes
    a short select chain — cheap on the VPU and trivially fusable.
    """
    shape = jnp.shape(fluid_num)
    out = jnp.broadcast_to(jnp.float32(values[0]), shape)
    for i in range(1, len(values)):
        out = jnp.where(fluid_num == i, jnp.float32(values[i]), out)
    return out


def _pow_maybe_int(x, exponents):
    """x**e per element, with a repeated-multiplication fast path when every
    fluid's exponent is the same small integer (the common gamma=7 case) —
    cheaper and more accurate on the VPU than the transcendental pow."""
    uniq = set(float(e) for e in exponents)
    if len(uniq) == 1:
        e = uniq.pop()
        if e == int(e) and 0 <= int(e) <= 16:
            n = int(e)
            out = jnp.ones_like(x)
            base = x
            while n:
                if n & 1:
                    out = out * base
                n >>= 1
                if n:
                    base = base * base
            return out
        return jnp.power(x, e)
    return None


def pressure(pp: PhysParams, rho_tilde, fluid_num):
    """P(rho) = B[(rho/rho0)^gamma - 1] (reference `phys_core.cu:108-113`)."""
    b = _per_fluid(pp, fluid_num, [f.bcoeff for f in pp.fluids])
    rho_ratio = rho_tilde + 1.0
    powed = _pow_maybe_int(rho_ratio, [f.gamma for f in pp.fluids])
    if powed is None:
        gamma = _per_fluid(pp, fluid_num, [f.gamma for f in pp.fluids])
        powed = jnp.power(rho_ratio, gamma)
    return b * (powed - 1.0)


def density_from_pressure(pp: PhysParams, p, fluid_num):
    """Inverse EOS: relative density from pressure (reference `phys_core.cu:117-121`)."""
    b = _per_fluid(pp, fluid_num, [f.bcoeff for f in pp.fluids])
    gamma = _per_fluid(pp, fluid_num, [f.gamma for f in pp.fluids])
    return jnp.power(p / b + 1.0, 1.0 / gamma) - 1.0


def sound_speed(pp: PhysParams, rho_tilde, fluid_num):
    """c(rho) = c0 (rho/rho0)^((gamma-1)/2) (reference `phys_core.cu:136-142`)."""
    c0 = _per_fluid(pp, fluid_num, [f.c0 for f in pp.fluids])
    powed = _pow_maybe_int(rho_tilde + 1.0, [f.sspowercoeff for f in pp.fluids])
    if powed is None:
        powcoeff = _per_fluid(pp, fluid_num, [f.sspowercoeff for f in pp.fluids])
        powed = jnp.power(rho_tilde + 1.0, powcoeff)
    return c0 * powed


def physical_density(pp: PhysParams, rho_tilde, fluid_num):
    """rho = (rho_tilde + 1) rho0 (reference `phys_core.cu:144-148`)."""
    rho0 = _per_fluid(pp, fluid_num, [f.rho0 for f in pp.fluids])
    return (rho_tilde + 1.0) * rho0


def numerical_density(pp: PhysParams, rho, fluid_num):
    """rho_tilde = rho/rho0 - 1 (reference `phys_core.cu:150-156`)."""
    rho0 = _per_fluid(pp, fluid_num, [f.rho0 for f in pp.fluids])
    return rho / rho0 - 1.0


def riemann_celerity(pp: PhysParams, rho_tilde, fluid_num):
    """Riemann invariant celerity R(rho) (reference `phys_core.cu:124-129`)."""
    c0 = _per_fluid(pp, fluid_num, [f.c0 for f in pp.fluids])
    gamma = _per_fluid(pp, fluid_num, [f.gamma for f in pp.fluids])
    rho_ratio = rho_tilde + 1.0
    return 2.0 / (gamma - 1.0) * c0 * jnp.power(rho_ratio, 0.5 * gamma - 0.5)


def density_from_riemann_celerity(pp: PhysParams, r, fluid_num):
    """Relative density from Riemann celerity (reference `phys_core.cu:131-136`)."""
    c0 = _per_fluid(pp, fluid_num, [f.c0 for f in pp.fluids])
    gamma = _per_fluid(pp, fluid_num, [f.gamma for f in pp.fluids])
    return jnp.power((gamma - 1.0) * r / (2.0 * c0), 2.0 / (gamma - 1.0)) - 1.0


def hydrostatic_density(pp: PhysParams, depth, fluid_num: int):
    """Relative density at a given depth under gravity (host-side helper,
    reference `src/ProblemCore.cc` hydrostatic_density)."""
    f = pp.fluids[fluid_num]
    g = abs(pp.gravity[2])
    p = f.rho0 * g * depth
    return jnp.power(p / f.bcoeff + 1.0, 1.0 / f.gamma) - 1.0


__all__ = [
    "pressure",
    "density_from_pressure",
    "sound_speed",
    "physical_density",
    "numerical_density",
    "riemann_celerity",
    "density_from_riemann_celerity",
    "hydrostatic_density",
]
