"""Cold-start initialization and equilibrium population seeding.

Reference call stack (main.cu:158-175):
  initialization()    — cold fields + 501-iteration PB double-layer loop
                        (gpu_initialization LBM.cu:111-128 + PB loop)
  read_data()         — restart path: macroscopic fields from checkpoint
  init_equilibrium()  — all four populations set to equilibria; ion
                        populations use drift velocity u + K E
                        (gpu_init_equilibrium, LBM.cu:162-463)

Restart is *lossy* by design: populations are re-derived from macroscopic
fields (reference main.cu:161-175) — reproduced by `state_from_macro`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import Config
from .ops.equilibrium import feq
from .ops.pbe import pb_init
from .state import Macro, State


class InitFields(NamedTuple):
    rho: jax.Array
    u: jax.Array
    charge: Optional[jax.Array]
    chargen: Optional[jax.Array]
    phi: Optional[jax.Array]
    E: Optional[jax.Array]
    temp: Optional[jax.Array]


def cold_fields(cfg: Config, dtype) -> InitFields:
    """gpu_initialization (LBM.cu:111-128): rho = rho0, u = 0, charges = 0,
    phi = voltage, E = 0, linear temperature profile TH (Lz - dz z)/Lz."""
    g = cfg.grid
    p = cfg.physics
    shape = g.shape
    rho = jnp.full(shape, p.rho0, dtype)
    u = jnp.zeros((3,) + shape, dtype)
    charge = chargen = phi = E = temp = None
    if p.enable_ek:
        charge = jnp.zeros(shape, dtype)
        chargen = jnp.zeros(shape, dtype)
        phi = jnp.full(shape, p.voltage, dtype)
        E = jnp.zeros((3,) + shape, dtype)
    if p.enable_thermal:
        z = jnp.arange(g.nz, dtype=dtype)[:, None, None]
        lz = dtype.type(g.lz)
        prof = dtype.type(p.TH) * (lz - dtype.type(g.dz) * z) / lz
        temp = jnp.broadcast_to(prof, shape)
    return InitFields(rho, u, charge, chargen, phi, E, temp)


def initialize(cfg: Config, dtype=None, mesh=None, with_residual: bool = False):
    """Full cold start: cold fields, PB double-layer loop (if EK), then
    equilibrium populations.  Pure; jit-compatible.

    Returns (State, Macro), or (State, Macro, pb_residual) with
    with_residual=True — the PB loop's final relative update norm
    (see ops.pbe.pb_init), None when EK is off."""
    dtype = jnp.dtype(dtype or cfg.run.dtype)
    fields = cold_fields(cfg, dtype)
    residual = None
    if cfg.physics.enable_ek:
        out = pb_init(cfg, fields.phi, mesh, with_residual=with_residual)
        phi, charge, chargen, E = out[:4]
        if with_residual:
            residual = out[4]
        fields = fields._replace(phi=phi, charge=charge, chargen=chargen, E=E)
    macro = Macro(
        rho=fields.rho,
        u=fields.u,
        charge=fields.charge,
        chargen=fields.chargen,
        temp=fields.temp,
    )
    state = state_from_macro(cfg, macro, fields.phi, fields.E, t=0.0)
    if with_residual:
        return state, macro, residual
    return state, macro


def state_from_macro(cfg: Config, macro: Macro, phi, E, t) -> State:
    """init_equilibrium (LBM.cu:162-463): populations = feq with per-field
    drift velocity (ions: u + K E / u + Kn E).  E enters the equilibria
    only — the returned State carries phi (E = -grad(phi) is re-derived
    wherever consumed); pass E = ops.poisson.efield(cfg, phi) unless
    reproducing the PB-init exit semantics (see ops/pbe.py)."""
    lat = cfg.lattice
    lat_s = cfg.scalar_lat
    p = cfg.physics
    cfl, cs2, cs2_s = p.cfl, cfg.cs2, cfg.cs2_s
    dtype = macro.rho.dtype

    f = feq(lat, macro.rho, macro.u, cfl, cs2)
    h = hn = g = None
    if p.enable_ek:
        K = dtype.type(p.K)
        Kn = dtype.type(p.Kn)
        h = feq(lat_s, macro.charge, macro.u + K * E, cfl, cs2_s)
        if p.two_species:
            hn = feq(lat_s, macro.chargen, macro.u + Kn * E, cfl, cs2_s)
    if p.enable_thermal:
        g = feq(lat_s, macro.temp, macro.u, cfl, cs2_s)
    return State(f=f, h=h, hn=hn, g=g, phi=phi, t=jnp.asarray(t, dtype))
