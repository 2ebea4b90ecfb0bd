"""Equilibrium / moment identities and TRT conservation (SURVEY.md §4.1)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ekpnp import preset
from ekpnp.lattice import get_lattice
from ekpnp.ops.collide import collide, guo_force_pops
from ekpnp.ops.equilibrium import feq, moments, trt_split
from ekpnp.state import State

CFG = preset("reference")
CFL = CFG.physics.cfl
CS2 = CFG.cs2


def rand_fields(shape, seed=0):
    rng = np.random.default_rng(seed)
    m = jnp.asarray(1000.0 + rng.normal(size=shape))
    v = jnp.asarray(1e-3 * rng.normal(size=(3,) + shape))
    return m, v


@pytest.mark.parametrize("name", ["D3Q27", "D3Q19"])
def test_feq_moments(name):
    lat = get_lattice(name)
    shape = (5, 4, 6)
    m, v = rand_fields(shape)
    eq = feq(lat, m, v, CFL, CS2)
    m2, mom = moments(lat, eq, CFL)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), rtol=1e-12)
    # first moment of the quadratic equilibrium is exactly m * v
    np.testing.assert_allclose(np.asarray(mom), np.asarray(m[None] * v), rtol=1e-9)


def test_trt_split_roundtrip():
    lat = get_lattice("D3Q27")
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(27, 3, 4, 5)))
    p, m = trt_split(lat, a)
    np.testing.assert_allclose(np.asarray(p + m), np.asarray(a), atol=1e-13)
    opp = lat.OPP
    np.testing.assert_allclose(np.asarray(p), np.asarray(p)[opp], atol=1e-13)
    np.testing.assert_allclose(np.asarray(m), -np.asarray(m)[opp], atol=1e-13)


def test_guo_force_pops_moments():
    """sum_i S_i = 0 and sum_i S_i e_ia / CFL = F_a (Guo forcing identities)."""
    cfg = preset("reference")
    lat = cfg.lattice
    shape = cfg.grid.shape
    rng = np.random.default_rng(2)
    u = jnp.asarray(1e-3 * rng.normal(size=(3,) + shape))
    F = jnp.asarray(rng.normal(size=(3,) + shape))
    S = guo_force_pops(cfg, u, F, u.dtype)
    s0, s1 = moments(lat, S, cfg.physics.cfl)
    np.testing.assert_allclose(np.asarray(s0), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(F), rtol=1e-9)


def _random_state(cfg, seed=3):
    rng = np.random.default_rng(seed)
    lat = cfg.lattice
    shape = (lat.Q,) + cfg.grid.shape
    w = lat.W[:, None, None, None]
    f = jnp.asarray(1000.0 * w * (1.0 + 0.01 * rng.normal(size=shape)))
    h = jnp.asarray(0.01 * w * (1.0 + 0.01 * rng.normal(size=shape)))
    hn = jnp.asarray(0.01 * w * (1.0 + 0.01 * rng.normal(size=shape)))
    g = jnp.asarray(0.5 * w * (1.0 + 0.01 * rng.normal(size=shape)))
    # a non-trivial potential so E = -grad(phi) exercises the force terms
    zyx = np.stack(np.meshgrid(
        np.arange(cfg.grid.nz), np.arange(cfg.grid.ny), np.arange(cfg.grid.nx),
        indexing="ij"))
    phi = jnp.asarray(1e-3 * np.sin(zyx * (2 * np.pi / 7)).sum(axis=0))
    return State(f=f, h=h, hn=hn, g=g, phi=phi, t=jnp.zeros(()))


def test_collide_conserves_mass():
    cfg = preset("reference")
    state = _random_state(cfg)
    post, macro = collide(cfg, state)
    for pre, new in [(state.f, post.f), (state.h, post.h), (state.hn, post.hn), (state.g, post.g)]:
        np.testing.assert_allclose(
            np.asarray(jnp.sum(new, 0)), np.asarray(jnp.sum(pre, 0)), rtol=1e-11
        )


def test_collide_momentum_with_forcing():
    """Post-collision fluid momentum = rho*u_pre + dt/2 * F in the interior
    (Guo second-order forcing: collision adds dt*(1 - dt w+/2 ...) — the net
    first moment change of the TRT update with source is exactly dt*F/2
    relative to the pre-collision momentum + dt F/2 used in u)."""
    cfg = preset("reference")
    lat = cfg.lattice
    state = _random_state(cfg)
    post, macro = collide(cfg, state)
    dt = cfg.dt
    _, mom_pre = moments(lat, state.f, cfg.physics.cfl)
    _, mom_post = moments(lat, post.f, cfg.physics.cfl)
    # interior only: wall rows use extrapolated u in feq
    interior = (slice(None), slice(1, -1))
    om = cfg.physics.omegas(cfg.grid.dx)
    # TRT relaxes the odd part: mom_post = mom_pre - dt*om_minus*(mom_pre -
    # rho u) + dt*s_minus*F ; with rho u = mom_pre + dt F/2 this gives
    # mom_post = mom_pre + dt*F*(om_minus*dt/2 + s_minus)
    sm = 1.0 - 0.5 * dt * om["omega_minus"]
    coef = dt * (om["omega_minus"] * dt * 0.5 + sm)
    _, F = None, None
    from ekpnp.ops.collide import compute_macro

    macro2, F = compute_macro(cfg, state)
    expect = np.asarray(mom_pre)[interior] + coef * np.asarray(F)[interior]
    np.testing.assert_allclose(np.asarray(mom_post)[interior], expect, rtol=1e-8)
