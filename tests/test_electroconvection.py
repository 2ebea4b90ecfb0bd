"""Literature anchor for the nonlinear Coulomb-feedback loop (round-3
verdict item 4): space-charge-limited (SCL) conduction profiles and the
electroconvection onset bracket.

The reference's raison d'etre is ETHD convection (LBM.cu:2) — the coupled
loop  force <- charge <- Poisson <- force  (LBM.cu:632-637).  The canonical
anchor for exactly this loop is unipolar charge injection between plates:

* Hydrostatic state: with injection level C the diffusion-free 1D steady
  profiles have the closed form (dimensionless: z in [0,1], E in units of
  V/L, charge density in eps V/L^2):
      E(z)   = sqrt(E0^2 + 2 C E0 z),   rho_c(z) = C E0 / E(z),
  with E0 fixed by the voltage constraint  integral_0^1 E dz = 1:
      ((E0^2 + 2 C E0)^{3/2} - E0^3) / (3 C E0) = 1.
  (Strong-injection limit C -> infinity gives the classic Mott-Gurney
  E ~ sqrt(z).)  The solver must RELAX TO and HOLD this state: migration
  flux K rho_c E constant in z through the self-consistently solved
  potential — a nontrivial fixed point of the full nonlinear loop.
  Measured calibration (this suite, f64): at C = 10 the injector charge
  layer is ~1.5 cells at nz=129 and finite diffusion carries the steady
  mid-gap charge ~30% above the diffusion-free analytic — so the
  quantitative profile anchor runs at C = 2 (layer ~1/3 gap, smooth) and
  Fe = 100 where the diffusion-free analytic is valid to a few %.

* Stability: the hydrostatic state loses stability to convection rolls at
  a critical electric Rayleigh number T_c.  Linear theory (Atten & Moreau,
  J. Mecanique 11, 471 (1972)) gives T_c = 160.75 for C -> infinity with
  critical wavenumber k_c ~= 4.74/L; for C = 10 the linear threshold is
  T_c ~= 164.1 — the value the LBM electroconvection literature brackets
  (e.g. Luo, Wu, Yi & Tan, Phys. Rev. E 93, 023309 (2016), at M = 10).
  The bifurcation is subcritical (finite-amplitude threshold
  T_f ~= 108.8), so the bracket uses a SMALL seed, probing the linear
  threshold only, and the run stops while amplitudes stay linear.
  Round-4 measurement: the EFFECTIVE threshold of this discretization is
  T_c,eff ~= 133 at Fe = 50, moving to ~= 145 at Fe = 200 — monotonically
  toward the diffusion-free 164.1 (diffusion destabilizes); the onset
  test brackets the measured Fe = 50 threshold at +-5.4% (130/145) and
  records the full ratio-vs-T table (test docstring).

Parameter derivation (documented because the reference's own constants
cannot reach T ~ 164 in a weakly-compressible lattice): T = eps V /
(rho0 nu K) pins V/K; the drift velocity u = K V / L and the hydrostatic
pressure head delta_rho/rho0 = C u T nu / (L cs^2) are then set by the
remaining freedom in K.  u_char = 0.3 m/s at L = 6.4e-6 m (dx = 1e-7,
dt = 1e-9) keeps delta_rho/rho0 ~ 2% and the ion transit at ~2.1e4 steps;
the resulting mobility parameter M = sqrt(eps/rho0)/K ~= 9-10 matches the
literature's canonical M = 10.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekpnp import preset
from ekpnp.init import state_from_macro
from ekpnp.ops.collide import compute_macro
from ekpnp.state import Macro
from ekpnp.step import multi_step

F_CONV = 9.64e4      # mol/m^3 -> C/m^3 (reference LBM.h:90)
EPS = 6.95e-10
RHO0 = 1000.0
NU = 0.889e-6


def _dimless_E0(C: float) -> float:
    """Solve ((E0^2 + 2C E0)^{3/2} - E0^3) / (3 C E0) = 1 for E0 in (0,1)."""
    def resid(e0):
        return ((e0 * e0 + 2 * C * e0) ** 1.5 - e0 ** 3) / (3 * C * e0) - 1.0

    lo, hi = 1e-8, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if resid(mid) > 0:
            hi = mid
        else:
            lo = mid
    return 0.5 * (lo + hi)


def _scl_config(nx, ny, T, C, Fe, u_char=0.3, nz=65, dx=1e-7):
    L = (nz - 1) * dx
    A = T * RHO0 * NU / EPS          # V / K from the definition of T
    V = math.sqrt(A * u_char * L)    # with u = K V / L
    K = V / A
    c0 = C * V * EPS / (L * L * F_CONV)
    cfg = preset(
        "reference", nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, dz=dx,
        voltage=V, voltage2=0.0, ext_field=0.0,
        enable_thermal=False, two_species=False,
        charge_bc="injection", charge0=c0, charge1=0.0,
        K=K, diffu=K * V / Fe,
    )
    return cfg, dict(L=L, V=V, K=K, c0=c0, C=C, u=u_char)


def _scl_analytic(cfg, prm):
    """Physical-units diffusion-free hydrostatic profiles on the z nodes."""
    g = cfg.grid
    C, V, L = prm["C"], prm["V"], prm["L"]
    e0 = _dimless_E0(C)
    zt = np.arange(g.nz) * g.dz / L
    Et = np.sqrt(e0 * e0 + 2 * C * e0 * zt)
    ct = C * e0 / Et
    phit = 1.0 - ((e0 * e0 + 2 * C * e0 * zt) ** 1.5 - e0 ** 3) / (3 * C * e0)
    E = Et * V / L                       # E_z [V/m]
    c = ct * EPS * V / (L * L * F_CONV)  # [mol/m^3]
    phi = phit * V
    return c, E, phi, e0 * V / L


def _state_from_profiles(cfg, prm, c_z, E_z, phi_z, useed=0.0):
    """State from z-profiles, with the density field carrying the
    balancing pressure head rho = rho0 + eps (E^2 - E(0)^2) / (2 cs^2) so
    no acoustic transient fires at t=0, plus an optional divergence-free
    roll seed of amplitude useed (stream function psi ~ sin(kx x)
    sin(pi z/L), the critical-mode shape)."""
    g = cfg.grid
    dtype = jnp.dtype(cfg.run.dtype)
    shape = g.shape
    cz = np.broadcast_to(np.asarray(c_z)[:, None, None], shape)
    Ez = np.broadcast_to(np.asarray(E_z)[:, None, None], shape)
    rho = RHO0 + EPS * (Ez * Ez - Ez[0] ** 2) / (2.0 * cfg.cs2)
    u = np.zeros((3,) + shape)
    if useed:
        L, Lx = prm["L"], g.nx * g.dx
        kx = 2 * np.pi / Lx
        kz = np.pi / L
        x = (np.arange(g.nx) * g.dx)[None, None, :]
        z = (np.arange(g.nz) * g.dz)[:, None, None]
        psi = useed / max(kx, kz)
        u[2] = -psi * kx * np.cos(kx * x) * np.sin(kz * z)
        u[0] = psi * kz * np.sin(kx * x) * np.cos(kz * z)
    macro = Macro(
        rho=jnp.asarray(rho, dtype), u=jnp.asarray(u, dtype),
        charge=jnp.asarray(cz, dtype), chargen=None, temp=None,
    )
    Evec = jnp.stack([jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                      jnp.asarray(Ez, dtype)])
    phi = jnp.asarray(np.broadcast_to(
        np.asarray(phi_z)[:, None, None], shape), dtype)
    return state_from_macro(cfg, macro, phi, Evec, 0.0)


def _z_profiles(cfg, state):
    """(c(z), E_z(z), phi(z)) horizontal means of the current state."""
    from ekpnp.ops.poisson import efield

    macro, _ = compute_macro(cfg, state)
    c = np.asarray(macro.charge).mean(axis=(1, 2))
    E = np.asarray(efield(cfg, state.phi)[2]).mean(axis=(1, 2))
    phi = np.asarray(state.phi).mean(axis=(1, 2))
    return c, E, phi


_BASE_CACHE = {}


def _relaxed_base(C, Fe, steps=45000):
    """Self-consistent 1D hydrostatic base state, relaxed on a thin grid
    and cached DIMENSIONLESS (c~ = c L^2 F/(eps V), E~ = E L/V,
    phi~ = phi/V depend only on C and Fe, not T) so each onset leg can
    re-instantiate it at its own voltage."""
    key = (C, Fe)
    if key not in _BASE_CACHE:
        cfg, prm = _scl_config(nx=4, ny=4, T=20.0, C=C, Fe=Fe)
        c_a, E_a, phi_a, _ = _scl_analytic(cfg, prm)
        state = _state_from_profiles(cfg, prm, c_a, E_a, phi_a)
        state = multi_step(cfg, state, steps)
        c, E, phi = _z_profiles(cfg, state)
        L, V = prm["L"], prm["V"]
        _BASE_CACHE[key] = (c * L * L * F_CONV / (EPS * V), E * L / V,
                            phi / V)
    return _BASE_CACHE[key]


def test_scl_hydrostatic_profile():
    """The discrete coupled loop must relax to the SCL hydrostatic state:
    at C = 2, Fe = 100 the converged charge and field profiles match the
    diffusion-free analytic solution to a few % in the mid-gap (the
    collector's thin diffusion layer and the injector node excluded), with
    the fluid staying hydrostatic."""
    cfg, prm = _scl_config(nx=4, ny=4, T=20.0, C=2.0, Fe=100.0)
    c_a, E_a, phi_a, _ = _scl_analytic(cfg, prm)
    state = _state_from_profiles(cfg, prm, c_a, E_a, phi_a)
    state = multi_step(cfg, state, 30000)   # ~1.5 ion transits
    c, E, _ = _z_profiles(cfg, state)
    g = cfg.grid
    sl = slice(int(0.15 * g.nz), int(0.8 * g.nz))
    # measured convergence (f64, steady from 20k steps on): charge within
    # 5.6% mean / 6.5% max of the diffusion-free analytic, field within
    # 2.9% — the residual is the finite-Fe diffusion correction, frozen
    # in time (steady), not a drift
    np.testing.assert_allclose(c[sl], c_a[sl], rtol=0.08)
    np.testing.assert_allclose(E[sl], E_a[sl], rtol=0.05)
    macro, _ = compute_macro(cfg, state)
    # hydrostatic: velocities stay far below the drift scale
    assert float(jnp.abs(macro.u).max()) < 0.02 * prm["u"]


def _mode_amplitude(cfg, state):
    """|kx = 1 Fourier mode| of uz on the mid-plane — the roll amplitude,
    insensitive to the 1D base-state residuals."""
    macro, _ = compute_macro(cfg, state)
    uz = np.asarray(macro.u[2])[cfg.grid.nz // 2].mean(axis=0)
    return 2.0 * np.abs(np.fft.rfft(uz)[1]) / uz.size


@pytest.mark.parametrize("T,expect_growth", [(130.0, False), (145.0, True)])
def test_electroconvection_onset_bracket(T, expect_growth):
    """Linear-onset bracket (C = 10): a small roll seed at the critical
    wavelength (Lx ~= 1.31 L ~= 2 pi / k_c) must decay at T = 130 and
    grow at T = 145 — a +-5.4% bracket around the MEASURED effective
    threshold T_c,eff ~= 133-137 at Fe = 50 (round-4, tightened from the
    round-3 130/205 legs).  The base state is the self-consistent relaxed
    1D profile (cached dimensionless across both legs); amplitudes stay
    in the linear regime so the subcritical branch is not triggered.

    Why the bracket centers below the diffusion-free Atten-Moreau
    T_c = 164.1: charge diffusion destabilizes the hydrostatic layer.
    Measured per-3500-step-window amplitude ratios (f64, this harness):

        Fe =  50:  T=130: 0.975   T=145: 1.066   T=155: 1.119
                   T=175: 1.228   T=185: 1.283   T=205: ~1.30
                   -> zero-growth crossing T_c,eff ~= 133
        Fe = 200:  T=145: 1.017   T=165: 1.112   T=185: 1.208
                   -> zero-growth crossing T_c,eff ~= 145

    The threshold moves monotonically toward the diffusion-free 164.1 as
    Fe grows (133 -> 145 for Fe 50 -> 200), attributing the offset to
    finite Fe (plus C = 10 and nz = 65 resolution); a +-12% bracket
    around 164 ITSELF is not attainable here — at Fe = 200 the T = 145
    leg is neutral (ratio 1.017), and Fe >> 200 under-resolves the
    injector charge layer at this grid (module docstring calibration).
    Fe = 50 keeps both legs decisively one-sided at 4 windows."""
    C, Fe = 10.0, 50.0
    cfg, prm = _scl_config(nx=84, ny=1, T=T, C=C, Fe=Fe)
    ct, Et, phit = _relaxed_base(C, Fe)
    L, V = prm["L"], prm["V"]
    seed = 1e-2 * prm["u"]
    state = _state_from_profiles(
        cfg, prm, ct * EPS * V / (L * L * F_CONV), Et * V / L, phit * V,
        useed=seed)
    a0 = _mode_amplitude(cfg, state)
    assert a0 > 0.1 * seed
    # settle the seeded kinetic transient (incl. the small rebound in the
    # first post-settle window seen in calibration)
    state = multi_step(cfg, state, 6000)
    amps = []
    for _ in range(4):
        state = multi_step(cfg, state, 3500)
        amps.append(_mode_amplitude(cfg, state))
    if expect_growth:
        # measured x1.066/window at T=145 -> x1.21 over 3 windows;
        # assert half the measured excess plus monotonicity of the tail
        assert amps[-1] > 1.10 * amps[0], f"no growth at T={T}: {amps}"
        assert amps[-1] > amps[-2] > amps[-3], f"not monotone at T={T}: {amps}"
    else:
        assert amps[-1] < 0.99 * amps[0], f"no decay at T={T}: {amps}"
        assert amps[-1] < a0 / 3.0
