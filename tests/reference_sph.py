"""Brute-force O(N^2) numpy implementation of the SPH formulas.

An *independent* direct implementation of the WCSPH equations (as documented
in the GPUSPH papers and mirrored by the engine), used to validate the
cell-binned TPU path.  Everything here is straight double-precision numpy
with explicit loops over all pairs — slow, simple, trustworthy.
"""
import numpy as np

# --- kernels ----------------------------------------------------------------


def w_wendland(r, h):
    q = r / h
    coeff = 21.0 / (16.0 * np.pi * h**3)
    return coeff * (1.0 - 0.5 * q) ** 4 * (1.0 + 2.0 * q)


def f_wendland(r, h):
    # (1/r) dW/dr
    coeff = 105.0 / (128.0 * np.pi * h**5)
    return coeff * (r / h - 2.0) ** 3


def w_cubic(r, h):
    q = r / h
    coeff = 1.0 / (np.pi * h**3)
    return coeff * np.where(
        q < 1.0, 1.0 - 1.5 * q**2 + 0.75 * q**3, 0.25 * (2.0 - q) ** 3
    )


def f_cubic(r, h):
    q = r / h
    coeff = 3.0 / (4.0 * np.pi * h**4)
    with np.errstate(divide="ignore", invalid="ignore"):
        outer = -((q - 2.0) ** 2) / r
    return coeff * np.where(q < 1.0, (3.0 * q - 4.0) / h, outer)


# --- EOS --------------------------------------------------------------------


def eos_pressure(rho_tilde, rho0, c0, gamma):
    b = rho0 * c0 * c0 / gamma
    return b * ((rho_tilde + 1.0) ** gamma - 1.0)


def eos_sspeed(rho_tilde, c0, gamma):
    return c0 * (rho_tilde + 1.0) ** ((gamma - 1.0) / 2.0)


# --- brute-force forces -----------------------------------------------------


def brute_forces(
    pos,
    vel,
    rho_tilde,
    mass,
    ptype,  # 0 fluid, 1 boundary
    *,
    h,
    rho0,
    c0,
    gamma,
    gravity,
    boundary="dyn",  # "dyn" or "lj"
    artvisc_alpha=0.3,
    epsartvisc=None,
    kinvisc=0.0,
    visc_avgop="arithmetic",
    visc_model="morris",  # "morris" or "espanol_revenga"
    bulk_visc=0.0,  # dynamic second viscosity (Espanol & Revenga)
    lj_d=0.0,
    lj_r0=0.0,
    lj_p1=12.0,
    lj_p2=6.0,
    colagrossi_xi=0.0,
    radius_factor=2.0,
):
    """Direct pairwise sums. Returns (DvDt [N,3], DrDt_tilde [N])."""
    N = pos.shape[0]
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    rho_tilde = np.asarray(rho_tilde, np.float64)
    mass = np.asarray(mass, np.float64)
    rad = radius_factor * h
    if epsartvisc is None:
        epsartvisc = 0.01 * h * h

    rho = (rho_tilde + 1.0) * rho0
    press = eos_pressure(rho_tilde, rho0, c0, gamma)
    sspeed = eos_sspeed(rho_tilde, c0, gamma)

    DvDt = np.zeros((N, 3))
    DrDt = np.zeros(N)

    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            rel = pos[i] - pos[j]
            r = np.linalg.norm(rel)
            if r >= rad:
                continue
            relv = vel[i] - vel[j]
            vdp = np.dot(relv, rel)
            F = f_wendland(r, h)

            i_fluid = ptype[i] == 0
            j_fluid = ptype[j] == 0

            # continuity
            if boundary == "dyn":
                cont = True
            else:
                cont = i_fluid and j_fluid
            if cont:
                DrDt[i] += mass[j] * vdp * F

            if not i_fluid:
                continue

            if j_fluid or boundary == "dyn":
                # pressure gradient (F1 symmetric)
                pg = press[i] / rho[i] ** 2 + press[j] / rho[j] ** 2
                DvDt[i] -= pg * mass[j] * F * rel
                # artificial viscosity
                if artvisc_alpha > 0 and vdp < 0:
                    av = (
                        vdp
                        * h
                        * artvisc_alpha
                        * (sspeed[i] + sspeed[j])
                        / ((r * r + epsartvisc) * (rho[i] + rho[j]))
                    )
                    DvDt[i] += av * mass[j] * F * rel
                # laminar viscosity
                if kinvisc > 0:
                    mu_i = kinvisc * rho[i]
                    mu_j = kinvisc * rho[j]
                    if visc_avgop == "arithmetic":
                        mu = 0.5 * (mu_i + mu_j)
                    elif visc_avgop == "harmonic":
                        mu = 2 * mu_i * mu_j / (mu_i + mu_j)
                    else:
                        mu = np.sqrt(mu_i * mu_j)
                    if visc_model == "espanol_revenga":
                        # Espanol & Revenga 2003: coeff [ (5mu/3 - zeta) v_ab
                        #   + 5 (mu/3 + zeta) (v.r)/(r^2+eps) r_ab ]
                        mu3 = mu / 3.0
                        zeta = bulk_visc
                        coeff = mass[j] / (rho[i] * rho[j]) * F
                        DvDt[i] += coeff * (
                            (5.0 * mu3 - zeta) * relv
                            + 5.0
                            * (mu3 + zeta)
                            * vdp
                            / (r * r + epsartvisc)
                            * rel
                        )
                    else:
                        DvDt[i] += (
                            2.0 * mu * mass[j] / (rho[i] * rho[j]) * F * relv
                        )
                # Molteni & Colagrossi density diffusion
                if colagrossi_xi > 0 and j_fluid and i_fluid:
                    if abs(press[i] - press[j]) >= abs(
                        np.dot(gravity, rel) * rho[i]
                    ):
                        coeff = colagrossi_xi * 2.0 * h * c0
                        DrDt[i] -= coeff * (rho[j] / rho[i] - 1.0) * F * mass[j]
            elif boundary == "lj":
                if r < lj_r0:
                    f = (
                        lj_d
                        * ((lj_r0 / r) ** lj_p1 - (lj_r0 / r) ** lj_p2)
                        / (r * r)
                    )
                    DvDt[i] += f * rel

    fluid = ptype == 0
    DvDt[fluid] += np.asarray(gravity)
    DvDt[~fluid] = 0.0
    return DvDt, DrDt / rho0


# --- Hu & Adams multi-fluid formulation ---------------------------------------


def brute_ha_forces(
    pos,
    vel,
    rho_tilde,
    mass,
    ptype,
    f_num,
    *,
    h,
    rho0s,
    c0s,
    gammas,
    gravity,
    boundary="dyn",
    artvisc_alpha=0.0,
    epsartvisc=None,
    kinviscs=None,
    colagrossi_xi=0.0,
    radius_factor=2.0,
):
    """Hu & Adams (non-SA): continuity uses the CENTRAL mass, pressure
    gradient is (P_a V_a^2 + P_b V_b^2)/m_a with actual volumes V = m/rho;
    viscous/artificial terms as in the standard formulations.
    Returns (DvDt, DrDt_tilde)."""
    N = pos.shape[0]
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    mass = np.asarray(mass, np.float64)
    rad = radius_factor * h
    if epsartvisc is None:
        epsartvisc = 0.01 * h * h

    rho0 = np.asarray([rho0s[k] for k in f_num])
    c0 = np.asarray([c0s[k] for k in f_num])
    gamma = np.asarray([gammas[k] for k in f_num])
    rho = (np.asarray(rho_tilde, np.float64) + 1.0) * rho0
    press = eos_pressure(rho_tilde, rho0, c0, gamma)
    sspeed = eos_sspeed(rho_tilde, c0, gamma)
    vol = mass / rho

    DvDt = np.zeros((N, 3))
    DrDt = np.zeros(N)

    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            rel = pos[i] - pos[j]
            r = np.linalg.norm(rel)
            if r >= rad:
                continue
            relv = vel[i] - vel[j]
            vdp = np.dot(relv, rel)
            F = f_wendland(r, h)

            i_fluid = ptype[i] == 0
            j_fluid = ptype[j] == 0
            both_ok = ptype[i] <= 1 and ptype[j] <= 1

            if boundary == "dyn":
                cont = both_ok
            else:
                cont = i_fluid and j_fluid
            if cont:
                DrDt[i] += mass[i] * vdp * F

            if not i_fluid:
                continue

            if j_fluid or boundary == "dyn":
                pg = press[i] * vol[i] ** 2 + press[j] * vol[j] ** 2
                DvDt[i] -= pg / mass[i] * F * rel
                if artvisc_alpha > 0 and vdp < 0:
                    av = (
                        vdp
                        * h
                        * artvisc_alpha
                        * (sspeed[i] + sspeed[j])
                        / ((r * r + epsartvisc) * (rho[i] + rho[j]))
                    )
                    DvDt[i] += av * mass[j] * F * rel
                if kinviscs is not None:
                    mu_i = kinviscs[f_num[i]] * rho[i]
                    mu_j = kinviscs[f_num[j]] * rho[j]
                    mu = 0.5 * (mu_i + mu_j)
                    DvDt[i] += 2.0 * mu * mass[j] / (rho[i] * rho[j]) * F * relv
                if colagrossi_xi > 0 and j_fluid and f_num[i] == f_num[j]:
                    if abs(press[i] - press[j]) >= abs(
                        np.dot(gravity, rel) * rho[i]
                    ):
                        coeff = colagrossi_xi * 2.0 * h * c0[i]
                        DrDt[i] -= coeff * (vol[i] / vol[j] - 1.0) * F * mass[i]

    fluid = ptype == 0
    DvDt[fluid] += np.asarray(gravity)
    DvDt[~fluid] = 0.0
    return DvDt, DrDt / rho0


# --- Grenier sigma/volume formulation ----------------------------------------


def brute_grenier_density(
    pos, mass, ptype, f_num, vol, *, h, radius_factor=2.0, boundary="dyn"
):
    """Grenier COMPUTE_DENSITY: per-particle sigma and smoothed physical
    density.  sigma_i = W(0) + sum_j W_ij over processed neighbors; the
    smoothed density only averages over same-fluid (and, with dynamic
    boundaries, same-type) neighbors.  Returns (sigma, rho_physical)."""
    N = pos.shape[0]
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    vol = np.asarray(vol, np.float64)
    rad = radius_factor * h
    w0 = w_wendland(0.0, h)

    sigma = np.full(N, w0)
    corr = np.full(N, w0)
    mass_corr = mass * w0
    for i in range(N):
        if ptype[i] > 1:
            continue
        for j in range(N):
            if i == j or ptype[j] > 1:
                continue
            j_ok = ptype[j] == 0 or (boundary == "dyn" and ptype[j] == 1)
            if not j_ok:
                continue
            r = np.linalg.norm(pos[i] - pos[j])
            if r >= rad:
                continue
            w = w_wendland(r, h)
            sigma[i] += w
            same = f_num[i] == f_num[j] and (
                boundary != "dyn" or ptype[i] == ptype[j]
            )
            if same:
                corr[i] += w
                mass_corr[i] += mass[j] * w
    rho = mass_corr / (corr * vol)
    return sigma, rho


def brute_grenier_forces(
    pos,
    vel,
    rho,  # PHYSICAL smoothed density (from brute_grenier_density)
    sigma,
    vol,
    mass,
    ptype,
    f_num,
    *,
    h,
    rho0s,
    c0s,
    gammas,
    gravity,
    boundary="dyn",
    artvisc_alpha=0.0,
    epsartvisc=None,
    kinviscs=None,
    epsinterface=0.0,
    colagrossi_xi=0.0,
    radius_factor=2.0,
):
    """Grenier forces: DvDt = -(1/rho_i) sum (P_i/s_i + P_j/s_j) F rel + ...,
    DJDt = -(1/sigma_i) sum (v_ij . r_ij) F.  Returns (DvDt, DJDt)."""
    N = pos.shape[0]
    pos = np.asarray(pos, np.float64)
    vel = np.asarray(vel, np.float64)
    rho = np.asarray(rho, np.float64)
    sigma = np.asarray(sigma, np.float64)
    rad = radius_factor * h
    if epsartvisc is None:
        epsartvisc = 0.01 * h * h

    rho0 = np.asarray([rho0s[k] for k in f_num])
    c0 = np.asarray([c0s[k] for k in f_num])
    gamma = np.asarray([gammas[k] for k in f_num])
    rho_tilde = rho / rho0 - 1.0
    press = eos_pressure(rho_tilde, rho0, c0, gamma)
    sspeed = eos_sspeed(rho_tilde, c0, gamma)
    pp = press / sigma  # Grenier pressure precalc P/sigma

    DvDt = np.zeros((N, 3))
    DJDt = np.zeros(N)

    for i in range(N):
        for j in range(N):
            if i == j:
                continue
            rel = pos[i] - pos[j]
            r = np.linalg.norm(rel)
            if r >= rad:
                continue
            relv = vel[i] - vel[j]
            vdp = np.dot(relv, rel)
            F = f_wendland(r, h)

            i_fluid = ptype[i] == 0
            j_fluid = ptype[j] == 0
            both_ok = ptype[i] <= 1 and ptype[j] <= 1

            # continuity (DJ/Dt), dyn boundaries participate
            if boundary == "dyn":
                cont = both_ok
            else:
                cont = i_fluid and j_fluid
            if cont:
                DJDt[i] -= vdp * F / sigma[i]

            if not i_fluid:
                continue

            if j_fluid or boundary == "dyn":
                pg = pp[i] + pp[j]
                if epsinterface and j_fluid and f_num[i] != f_num[j]:
                    pg += epsinterface * (abs(pp[i]) + abs(pp[j]))
                DvDt[i] -= pg * F * rel / rho[i]
                if artvisc_alpha > 0 and vdp < 0:
                    av = (
                        vdp
                        * h
                        * artvisc_alpha
                        * (sspeed[i] + sspeed[j])
                        / ((r * r + epsartvisc) * (rho[i] + rho[j]))
                    )
                    # same template as the standard formulations (m_j F rel),
                    # then divided by rho_i in the Grenier fixup
                    DvDt[i] += av * mass[j] * F * rel / rho[i]
                if kinviscs is not None:
                    # dynamic visc = kinvisc * current density
                    # (get_dynamic_visc, forces_kernel.def:283-288)
                    mu_i = kinviscs[f_num[i]] * rho[i]
                    mu_j = kinviscs[f_num[j]] * rho[j]
                    mu = 0.5 * (mu_i + mu_j)
                    DvDt[i] += (
                        mu * (1.0 / sigma[i] + 1.0 / sigma[j]) * F * relv / rho[i]
                    )
                if colagrossi_xi > 0 and j_fluid and i_fluid and f_num[i] == f_num[j]:
                    if abs(press[i] - press[j]) >= abs(
                        np.dot(gravity, rel) * rho[i]
                    ):
                        coeff = colagrossi_xi * 2.0 * h * c0[i]
                        DJDt[i] += coeff * (vol[i] / vol[j] - 1.0) * F / sigma[i]

    fluid = ptype == 0
    DvDt[fluid] += np.asarray(gravity)
    DvDt[~fluid] = 0.0
    return DvDt, DJDt
