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


@pytest.mark.parametrize("D,scalar_lattice", [
    (0.3e-6, "same"), (0.889e-6, "same"), (1.5e-6, "same"),
    (0.889e-6, "D3Q7"),
])
def test_thermal_conduction_steady_state(D, scalar_lattice):
    """Pure conduction: with u = 0 the steady temperature profile is linear
    in the interior.  The reference's anti-bounce-back-at-the-node scheme
    (LBM.cu:2220-2413) has a tau-dependent effective wall location: the
    Dirichlet planes sit (tau~ + 1/2) cells beyond the first interior nodes,
    tau~ = D/(cs_s^2 dt) with cs_s the *scalar lattice's* sound speed.
    Verified exact (6 digits) at three diffusivities and on the reduced
    D3Q7 scalar lattice; the reference's own outputs extrapolate wall nodes
    for the same reason (LBM.cu:2527-2542)."""
    cfg = preset("reference", nx=4, ny=4, nz=33, enable_ek=False, exf=0.0,
                 D=D, scalar_lattice=scalar_lattice)
    state, _ = initialize(cfg)
    state = multi_step(cfg, state, 6000)
    macro, _ = compute_macro(cfg, state)
    temp = np.asarray(macro.temp).mean(axis=(1, 2))

    g = cfg.grid
    tau = D / cfg.cs2_s / cfg.dt
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


def test_single_species_matches_two_species_with_zero_negative():
    """BASELINE config 2 mode: with the (-) population disabled, the run
    must equal the two-species run whose negative charge starts (and hence
    stays) exactly zero — feq(0) = 0 and no-flux walls preserve it."""
    import dataclasses

    from ekpnp.init import state_from_macro
    from ekpnp.ops.poisson import efield
    from ekpnp.state import Macro

    cfg1 = preset("ek-channel", nx=8, ny=8, nz=9)
    assert not cfg1.physics.two_species
    cfg2 = dataclasses.replace(
        cfg1, physics=dataclasses.replace(cfg1.physics, two_species=True)
    )

    shape = cfg1.grid.shape
    rng = np.random.default_rng(7)
    macro = Macro(
        rho=jnp.full(shape, 1000.0),
        u=jnp.zeros((3,) + shape),
        charge=jnp.asarray(0.01 * (1 + 0.1 * rng.random(shape))),
        chargen=jnp.zeros(shape),
        temp=None,
    )
    phi = jnp.full(shape, cfg1.physics.voltage)
    E = efield(cfg1, phi)
    s1 = state_from_macro(cfg1, macro, phi, E, 0.0)
    s2 = state_from_macro(cfg2, macro, phi, E, 0.0)
    assert s1.hn is None and s2.hn is not None

    s1, _ = run_steps(cfg1, s1, 3)
    s2, _ = run_steps(cfg2, s2, 3)
    np.testing.assert_allclose(np.asarray(s1.h), np.asarray(s2.h), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s1.phi), np.asarray(s2.phi), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(s2.hn), 0.0, atol=0)


def test_d3q7_scalars_match_full_lattice_steady_state():
    """The D3Q7 scalar-transport lattice solves the same Nernst-Planck /
    advection-diffusion physics as the reference's full-lattice scalars
    (it differs only in discretization): after the same number of steps the
    macroscopic charge fields of the two discretizations must agree to
    discretization error, and the ionic mass must be conserved equally."""
    cfg27 = preset("reference", nx=10, ny=4, nz=17)
    cfg7 = preset("reference", nx=10, ny=4, nz=17, scalar_lattice="D3Q7")
    s27, _ = initialize(cfg27)
    s7, _ = initialize(cfg7)
    assert s7.h.shape[0] == 7 and s27.h.shape[0] == 27
    s27 = multi_step(cfg27, s27, 200)
    s7 = multi_step(cfg7, s7, 200)
    c27 = np.asarray(jnp.sum(s27.h, axis=0))
    c7 = np.asarray(jnp.sum(s7.h, axis=0))
    # same double-layer structure to discretization error
    np.testing.assert_allclose(c7, c27, rtol=2e-3)
    # Temperature is NOT compared point-wise here: the anti-bounce-back
    # Dirichlet scheme's effective wall plane sits tau~ + 1/2 cells out and
    # tau~ = D/(cs_s^2 dt) differs between the lattices (cs^2 = 1/3 vs 1/4),
    # so the steady profiles differ by a few % near the walls by design.
    # test_thermal_conduction_steady_state validates the D3Q7 profile
    # against the offset-corrected analytic solution instead.
    t27 = np.asarray(jnp.sum(s27.g, axis=0))
    t7 = np.asarray(jnp.sum(s7.g, axis=0))
    assert np.isfinite(t7).all()
    assert abs(t7.mean() - t27.mean()) < 5e-2 * abs(t27.mean())


@pytest.mark.parametrize("pattern", ["square", "hexagon"])
def test_perturbation_divergence_free(pattern):
    """Both convection seedings (reference LBM.cu:646-661; the hexagonal
    planform is the reference's commented intent with corrected algebra)
    must be divergence-free: centered-difference div(u) ~ O(h^2) relative
    to the velocity-gradient scale on a pattern-periodic domain."""
    import math

    from ekpnp.ops.collide import perturbation_velocity

    LL = 0.5
    n = 48
    lx = (math.sqrt(3.0) * LL) if pattern == "hexagon" else LL
    ly = (3.0 * LL) if pattern == "hexagon" else LL
    cfg = preset(
        "reference", nx=n, ny=n, nz=n + 1, LL=LL, perturb_pattern=pattern,
        dx=lx / n, dy=ly / n, dz=1.0 / n,
    )
    u = np.asarray(perturbation_velocity(cfg, jnp.dtype("float64")))
    g = cfg.grid
    dudx = (np.roll(u[0], -1, axis=2) - np.roll(u[0], 1, axis=2)) / (2 * g.dx)
    dvdy = (np.roll(u[1], -1, axis=1) - np.roll(u[1], 1, axis=1)) / (2 * g.dy)
    dwdz = (u[2][2:] - u[2][:-2]) / (2 * g.dz)
    div = dudx[1:-1] + dvdy[1:-1] + dwdz
    scale = max(np.abs(dudx).max(), np.abs(dvdy).max(), np.abs(dwdz).max())
    assert scale > 0.0
    assert np.abs(div).max() < 0.02 * scale
    # the seeding actually stirs the fluid
    assert np.abs(u).max() > 0.1


def test_perturb_step_hexagon_runs():
    cfg = preset("reference", nx=10, ny=4, nz=17, perturb_pattern="hexagon")
    state, _ = initialize(cfg)
    state, macro = step(cfg, state, perturb=True)
    for leaf in jax.tree_util.tree_leaves(state):
        assert np.isfinite(np.asarray(leaf)).all()


def test_charge_diffusion_decay():
    """Pure diffusion (SURVEY.md §4.2): a charge-neutral sinusoidal
    perturbation of both ion species decays as exp(-D k^2 t).  Exact
    neutrality (c+ = c-) keeps the Poisson RHS zero, so with equal plate
    voltages phi stays uniform, E = 0, the Nernst-Planck migration term
    vanishes, the Coulomb force is zero and the fluid stays at rest —
    isolating the diffusion operator of the scalar TRT update
    (reference LBM.cu:830-1103 equilibria + 1711-1845 update).

    The amplitude is measured on central z rows only: the reference's
    Yoshida no-flux scheme replaces ALL wall-node directions with same-node
    opposites (LBM.cu:2102-2218), which freezes the wall rows' lateral
    charge profile — reference semantics, pinned by the frozen-wall assert
    below.  Wall influence reaches sqrt(D t) ~ 2 cells over the fit window,
    far from the measured rows."""
    from ekpnp.init import state_from_macro
    from ekpnp.ops.poisson import efield
    from ekpnp.state import Macro

    cfg = preset("reference", nx=32, ny=4, nz=25, ext_field=0.0,
                 enable_thermal=False)
    g, p = cfg.grid, cfg.physics
    shape = g.shape
    k = 2.0 * np.pi / g.lx
    x = np.arange(g.nx) * g.dx
    c0, amp = 0.01, 1e-3
    prof = c0 + amp * np.cos(k * x)
    c = jnp.asarray(np.broadcast_to(prof, shape))
    macro = Macro(rho=jnp.full(shape, p.rho0), u=jnp.zeros((3,) + shape),
                  charge=c, chargen=c, temp=None)
    phi = jnp.full(shape, p.voltage)
    state = state_from_macro(cfg, macro, phi, efield(cfg, phi), 0.0)

    def amplitude(s, rows=slice(9, 16)):
        cz = np.asarray(jnp.sum(s.h, axis=0))[rows].mean(axis=(0, 1))
        return 2.0 * float((cz * np.cos(k * x)).mean())

    n0, n1 = 100, 400   # skip the initial kinetic transient, then fit
    s0 = multi_step(cfg, state, n0)
    a0 = amplitude(s0)
    s1 = multi_step(cfg, s0, n1 - n0)
    a1 = amplitude(s1)
    assert 0.0 < a1 < a0
    rate = np.log(a0 / a1) / ((n1 - n0) * cfg.dt)
    np.testing.assert_allclose(rate, p.diffu * k * k, rtol=5e-3)

    # reference wall semantics: wall-node lateral profile is frozen exactly
    np.testing.assert_allclose(amplitude(s1, rows=slice(0, 1)), amp, rtol=1e-12)

    # neutrality and a quiescent fluid are preserved to roundoff
    macro1, _ = compute_macro(cfg, s1)
    np.testing.assert_allclose(
        np.asarray(macro1.charge), np.asarray(macro1.chargen), rtol=1e-12)
    assert float(jnp.abs(macro1.u).max()) < 1e-12


def test_injection_bc_dirichlet_profile():
    """Charge-injection Dirichlet walls (reference's commented-out ETHD
    injection BC, LBM.cu:2231-2292): with charge-neutral species (equal
    plate levels for + and -, so E = 0 and migration vanishes) the ion
    fields see pure diffusion between Dirichlet plates and must relax to
    the linear profile anchored at the plate levels charge0 (z=0) and
    charge1 (z=NZ-1) — the anti-bounce-back scheme imposes the value at
    the wall node, exactly like its temperature twin (LBM.cu:2220-2349,
    validated by test_thermal_conduction_steady_state)."""
    c_lo, c_hi = 0.02, 0.01
    cfg = preset("reference", nx=8, ny=8, nz=17, ext_field=0.0,
                 enable_thermal=False, charge_bc="injection",
                 voltage=0.0, voltage2=0.0, diffu=2e-7, diffun=2e-7,
                 charge0=c_lo, charge1=c_hi, charge0n=c_lo, charge1n=c_hi)
    g = cfg.grid
    state, _ = initialize(cfg)   # uniform chargeinf start, neutral
    state = multi_step(cfg, state, 1200)
    macro, _ = compute_macro(cfg, state)

    def prof(s, field):
        return np.asarray(jnp.sum(field(s), axis=0)).mean(axis=(1, 2))

    cz = prof(state, lambda s: s.h)
    lin = c_lo + (c_hi - c_lo) * np.arange(g.nz) / (g.nz - 1)
    # Interior rows hold an exactly-linear profile whose extrapolation to
    # the plates recovers the imposed levels to ~1% (the scheme has the
    # usual relaxation-dependent wall slip of ~0.1 cell per plate — the
    # same artifact family as bounce-back's wall offset).  The wall NODES
    # themselves carry a period-2 parity artifact of full-way
    # anti-bounce-back (the node value alternates around the imposed
    # level; steady only if the run starts ON the level, as the
    # reference's T init does) — which is why the reference never reads
    # wall nodes and extrapolates them for every output (LBM.cu:2527-2542);
    # two successive steps average to the imposed level exactly.
    z = np.arange(g.nz)
    for czi in (cz, prof(state, lambda s: s.hn)):
        slope, icpt = np.polyfit(z[1:-1], czi[1:-1], 1)
        fit = icpt + slope * z
        np.testing.assert_allclose(czi[1:-1], fit[1:-1], rtol=1e-4)
        np.testing.assert_allclose(fit[0], c_lo, rtol=1e-2)
        np.testing.assert_allclose(fit[-1], c_hi, rtol=1e-2)
    np.testing.assert_allclose(cz[1:-1], lin[1:-1], rtol=2e-2)
    state2 = multi_step(cfg, state, 1)
    cz2 = prof(state2, lambda s: s.h)
    np.testing.assert_allclose(0.5 * (cz[0] + cz2[0]), c_lo, rtol=1e-6)
    np.testing.assert_allclose(0.5 * (cz[-1] + cz2[-1]), c_hi, rtol=1e-6)
    # neutrality kept E = 0 and the fluid quiescent
    assert float(jnp.abs(macro.u).max()) < 1e-12


def test_zerograd_top_bc():
    """Zero-gradient outflow at the upper plate (reference LBM.cu:1929-1958,
    commented out): the pre-stream neighbor-plane copy keeps the wall-normal
    charge gradient zero at the top while the lower plate stays no-flux —
    an initial double-layer profile relaxes toward uniform with the top two
    planes pinned together."""
    cfg = preset("reference", nx=8, ny=4, nz=17, ext_field=0.0,
                 enable_thermal=False, charge_bc="zerograd-top",
                 diffu=2e-7, diffun=2e-7)
    state, _ = initialize(cfg)   # PB init: double layer at both plates
    state = multi_step(cfg, state, 400)
    c = np.asarray(jnp.sum(state.h, axis=0))
    # wall-normal gradient vanishes at the top plate (the pre-stream copy
    # enforces it to the discrete scheme's accuracy while the profile is
    # still relaxing) and stays far below the interior scale
    np.testing.assert_allclose(c[-1], c[-2], rtol=1e-2)
    grad_top = np.abs(c[-1] - c[-2]).mean()
    grad_mid = np.abs(c[2] - c[1]).mean()
    assert grad_top < 0.2 * grad_mid
    for leaf in jax.tree_util.tree_leaves(state):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_electroosmotic_flow_profile():
    """Electro-osmosis (SURVEY.md §4.2): the external field Ext acting on
    the PB-initialized double layer drives plug-like flow.  Two checks:

    1. The steady velocity profile satisfies the discrete momentum balance
       mu u'' = -rho_e Ext with bounce-back mid-way walls, using the
       simulation's own charge density (exact force-balance test).
    2. The mid-channel speed matches the Helmholtz-Smoluchowski velocity
       u_EO = -eps zeta Ext / mu with the finite-Debye-length correction
       (1 - sech(kappa L/2)) from the linearized double-layer profile."""
    zeta = -1e-4  # linear (Debye-Hueckel) regime
    cfg = preset("reference", nx=4, ny=4, nz=33, voltage=zeta, voltage2=zeta,
                 pb_iters=2001, enable_thermal=False)
    g, p = cfg.grid, cfg.physics
    state, _ = initialize(cfg)
    # viscous time L^2/(pi^2 nu) ~ 120 steps; 1500 steps >> converged
    state = multi_step(cfg, state, 1500)
    macro, _ = compute_macro(cfg, state)

    ux = np.asarray(macro.u[0]).mean(axis=(1, 2))
    rho_e = p.convert_c_to_charge * np.asarray(
        macro.charge - macro.chargen).mean(axis=(1, 2))
    mu = p.rho0 * p.nu

    # 1. discrete two-point BVP: u[k-1] - 2u[k] + u[k+1] = -rho_e Ext dz^2/mu,
    #    no-slip planes midway outside the first interior nodes (u0 = -u1)
    n = g.nz - 2
    A = (np.diag(-2.0 * np.ones(n)) + np.diag(np.ones(n - 1), 1)
         + np.diag(np.ones(n - 1), -1))
    A[0, 0] = -3.0
    A[-1, -1] = -3.0
    rhs = -(rho_e[1:-1] * p.ext_field) * g.dz**2 / mu
    u_fd = np.linalg.solve(A, rhs)
    scale = np.abs(u_fd).max()
    assert scale > 0.0
    np.testing.assert_allclose(ux[1:-1], u_fd, atol=3e-2 * scale)

    # 2. Helmholtz-Smoluchowski magnitude with finite-kappa correction
    kappa = np.sqrt(2.0 * p.convert_c_to_charge * p.chargeinf * p.electron
                    / (p.kB * p.roomT * p.eps))
    u_hs = -p.eps * zeta * p.ext_field / mu
    expect_mid = u_hs * (1.0 - 1.0 / np.cosh(kappa * g.lz / 2.0))
    # sanity bar only: the continuum estimate ignores the half-cell wall
    # offset and grid-resolved Debye layer (kappa dz ~ 0.11) — check 1 above
    # is the sharp force-balance test; observed gap ~7% on this grid
    np.testing.assert_allclose(ux[g.nz // 2], expect_mid, rtol=1.2e-1)


def test_joule_heating_raises_temperature():
    """The Joule extension (BASELINE config 4): joule > 0 must inject heat
    proportional to (c+ + c-) |E|^2; joule = 0 is reference parity."""
    import dataclasses

    cfg0 = preset("reference", nx=8, ny=8, nz=9)
    cfgj = dataclasses.replace(
        cfg0, physics=dataclasses.replace(cfg0.physics, joule=1e6)
    )
    state0, _ = initialize(cfg0)
    sj = state0
    s0 = state0
    for _ in range(5):
        s0, m0 = run_steps(cfg0, s0, 1)
        sj, mj = run_steps(cfgj, sj, 1)
    t0 = float(jnp.sum(jnp.sum(s0.g, axis=0)))
    tj = float(jnp.sum(jnp.sum(sj.g, axis=0)))
    assert tj > t0
