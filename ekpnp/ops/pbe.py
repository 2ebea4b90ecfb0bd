"""Poisson-Boltzmann initialization of the electric double layer.

The reference runs 501 host-driven iterations, each round-tripping phi
through host memory (LBM.cu:89-106) — here the whole loop is one
`lax.fori_loop` on device.

Per iteration (reference order, LBM.cu:89-106):
  1. Boltzmann closure  c± = chargeinf exp(∓ e phi / kB T)   (gpu_PBE,
     LBM.cu:139-146)
  2. spectral Poisson solve -> phi_solved, E                 (fast_Poisson)
  3. under-relaxed update phi <- ω phi_solved + (1-ω) phi,
     ω = PB_omega = 0.05                                     (gpu_PBE_phi,
     LBM.cu:131-137)

Exit-state semantics preserved exactly: the returned (c+, c-, E) are the
values computed *inside* the final iteration (from the pre-relaxation phi),
while phi carries the final relaxed update — matching where the reference's
buffers are left when its loop ends.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config
from .poisson import poisson_solve


def boltzmann_closure(cfg: Config, phi):
    p = cfg.physics
    dtype = phi.dtype
    a = dtype.type(p.electron / (p.kB * p.roomT))
    c = dtype.type(p.chargeinf) * jnp.exp(-a * phi)
    if p.two_species:
        cn = dtype.type(p.chargeinf) * jnp.exp(a * phi)
    else:
        cn = jnp.zeros_like(c)
    return c, cn


def pb_init(cfg: Config, phi0, mesh=None, with_residual: bool = False):
    """Run the PB relaxation loop; returns (phi, charge, chargen, E), or
    (phi, charge, chargen, E, residual) with with_residual=True.

    residual is the final iteration's relative update norm
    ||phi_new - phi||_inf / max(||phi||_inf, tiny) — a convergence
    diagnostic the reference never surfaces (its 501 iterations run blind,
    LBM.cu:89-106).  It makes long initializations observable and lets a
    user trade `--set pb_iters=N` against a quantified accuracy loss."""
    p = cfg.physics
    dtype = phi0.dtype
    omega = dtype.type(p.pb_omega)

    c0, cn0 = boltzmann_closure(cfg, phi0)
    E0 = jnp.zeros((3,) + cfg.grid.shape, dtype)

    def body(_, carry):
        phi = carry[0]
        c, cn = boltzmann_closure(cfg, phi)
        phi_solved, E = poisson_solve(cfg, c, cn, mesh)
        phi_new = omega * phi_solved + (1.0 - omega) * phi
        if not with_residual:
            return (phi_new, c, cn, E)
        res = jnp.max(jnp.abs(phi_new - phi)) / jnp.maximum(
            jnp.max(jnp.abs(phi)), dtype.type(1e-300 if dtype == jnp.float64
                                              else 1e-30))
        return (phi_new, c, cn, E, res)

    init = (phi0, c0, cn0, E0)
    if with_residual:
        init = init + (jnp.asarray(jnp.inf, dtype),)
    return jax.lax.fori_loop(0, p.pb_iters, body, init)
