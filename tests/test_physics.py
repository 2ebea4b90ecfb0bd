"""Physics integration tests on small CPU grids (SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekpnp import preset
from ekpnp.init import initialize
from ekpnp.ops.collide import compute_macro
from ekpnp.step import multi_step, step


def run_steps(cfg, state, n):
    for _ in range(n):
        state, macro = step(cfg, state)
    return state, macro


def test_poiseuille_profile():
    """Body-force-driven channel flow vs the parabolic analytic profile
    (BASELINE config 1, reduced grid for CI speed).

    Bounce-back places the no-slip planes midway between the boundary nodes
    (z = 0, NZ-1) and the first fluid nodes: walls at z = dz/2 and
    z = (NZ - 3/2) dz.  Verified numerically: center velocity matches the
    midway-wall parabola to 0.13% on this grid."""
    exf = 1.0e9  # N/m^3 — microchannel scale; u_max ~ 7e-3 m/s, Re ~ 2e-3
    cfg = preset("poiseuille", nx=8, ny=4, nz=25, exf=exf, nsteps=0)
    state, _ = initialize(cfg)
    state = multi_step(cfg, state, 4000)
    macro, _ = compute_macro(cfg, state)

    p = cfg.physics
    g = cfg.grid
    ux = np.asarray(macro.u[0]).mean(axis=(1, 2))

    z = np.arange(g.nz) * g.dz
    z0 = 0.5 * g.dz
    z1 = (g.nz - 1.5) * g.dz
    mu = p.rho0 * p.nu
    analytic = exf / (2.0 * mu) * (z - z0) * (z1 - z)

    # interior fluid nodes (z=0, NZ-1 are boundary nodes by construction)
    np.testing.assert_allclose(ux[1:-1], analytic[1:-1], rtol=2e-2)


@pytest.mark.parametrize("D", [0.3e-6, 0.889e-6, 1.5e-6])
def test_thermal_conduction_steady_state(D):
    """Pure conduction: with u = 0 the steady temperature profile is linear
    in the interior.  The reference's anti-bounce-back-at-the-node scheme
    (LBM.cu:2220-2413) has a tau-dependent effective wall location: the
    Dirichlet planes sit (tau~ + 1/2) cells beyond the first interior nodes,
    tau~ = D/(cs^2 dt).  Verified exact (6 digits) at three diffusivities;
    the reference's own outputs extrapolate wall nodes for the same reason
    (LBM.cu:2527-2542)."""
    cfg = preset("reference", nx=4, ny=4, nz=33, enable_ek=False, exf=0.0, D=D)
    state, _ = initialize(cfg)
    state = multi_step(cfg, state, 6000)
    macro, _ = compute_macro(cfg, state)
    temp = np.asarray(macro.temp).mean(axis=(1, 2))

    g = cfg.grid
    tau = D / cfg.cs2 / cfg.dt
    offset = tau + 0.5
    z = np.arange(g.nz, dtype=float)
    z_lo = 1.0 - offset
    z_hi = (g.nz - 2.0) + offset
    analytic = cfg.physics.TH * (z_hi - z) / (z_hi - z_lo)
    np.testing.assert_allclose(temp[1:-1], analytic[1:-1], atol=1e-4 * cfg.physics.TH)


def test_fluid_mass_conservation():
    cfg = preset("reference", nx=10, ny=4, nz=17)
    state, _ = initialize(cfg)
    m0 = float(jnp.sum(state.f))
    state = multi_step(cfg, state, 50)
    m1 = float(jnp.sum(state.f))
    assert m1 == pytest.approx(m0, rel=1e-12)


def test_ion_mass_conservation():
    """No-flux walls + periodic sides: total ion content stays bounded.

    The reference scheme (Yoshida-2014 reflection applied at the boundary
    *nodes*, LBM.cu:2102-2218) is not exactly conservative at the wall rows
    — the wall-node populations are replaced by reflected post-collision
    values rather than balancing the streamed flux — so a small bounded
    double-layer re-equilibration transient (~4e-4 relative) is expected and
    matches the reference semantics.  Guard against actual leaks."""
    cfg = preset("reference", nx=10, ny=4, nz=17)
    state, _ = initialize(cfg)
    h0 = float(jnp.sum(state.h))
    hn0 = float(jnp.sum(state.hn))
    state = multi_step(cfg, state, 50)
    assert float(jnp.sum(state.h)) == pytest.approx(h0, rel=5e-3)
    assert float(jnp.sum(state.hn)) == pytest.approx(hn0, rel=5e-3)
    # concentrations stay positive
    assert float(jnp.sum(state.h, axis=0).min()) > 0.0
    assert float(jnp.sum(state.hn, axis=0).min()) > 0.0


def test_full_pipeline_finite_and_evolving():
    cfg = preset("reference")
    state, macro0 = initialize(cfg)
    state, macro = run_steps(cfg, state, 5)
    for leaf in jax.tree_util.tree_leaves(state):
        assert np.isfinite(np.asarray(leaf)).all()
    # EK forcing must actually move fluid
    assert float(jnp.abs(macro.u).max()) > 0.0
    assert float(state.t) == pytest.approx(5 * cfg.dt)


def test_restart_semantics():
    """Checkpoint/restore is lossy by design: populations re-derived from
    macroscopic fields (reference main.cu:158-175).  A restored state must
    carry the same macroscopic fields."""
    from ekpnp.init import state_from_macro

    cfg = preset("reference")
    state, _ = initialize(cfg)
    state, macro = run_steps(cfg, state, 3)
    from ekpnp.ops.poisson import efield

    restored = state_from_macro(
        cfg, macro, state.phi, efield(cfg, state.phi), float(state.t))
    macro2, _ = compute_macro(cfg, restored)
    np.testing.assert_allclose(np.asarray(macro2.rho), np.asarray(macro.rho), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(macro2.charge), np.asarray(macro.charge), rtol=1e-12
    )
