"""Timestep built on the fused Pallas kernel.

Same semantics as ekpnp.step.step (the jnp oracle), but collide + boundary
+ stream + scalar wall BCs all happen inside one kernel, and the Poisson
solve consumes the kernel-emitted pre-collision ion moments.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.poisson import poisson_phi_from_rhs
from ..state import State
from .fused_step import build_fused_step


@lru_cache(maxsize=None)
def _get_fused(cfg: Config, dtype_name: str, interpret: bool, ty: int,
               pad_x):
    return build_fused_step(
        cfg, dtype=jnp.dtype(dtype_name), interpret=interpret, ty_override=ty,
        pad_x=pad_x,
    )


def step_pallas(cfg: Config, state: State, mesh=None, interpret: bool = False,
                ty_override: int = 0, pad_x=None):
    """One fused timestep.  Returns (state', rhs) — the kernel-emitted
    interior Poisson-RHS planes (z = 1..NZ-2) from this step's
    pre-collision ion moments (what the reference stores in collide and
    feeds to fast_Poisson)."""
    p = cfg.physics
    fused = _get_fused(cfg, state.f.dtype.name, interpret, ty_override, pad_x)
    f1, h1, hn1, g1, rhs = fused(state.f, state.h, state.hn, state.g, state.phi)
    phi = state.phi
    if p.enable_ek:
        # rhs is x-Hartley-space when the kernel fused the forward x-stage
        # onto its idle MXU (fused_step.py hartley_x)
        phi = poisson_phi_from_rhs(cfg, rhs, mesh, rhs_hx=fused.hartley_x)
    dt = state.t.dtype.type(p.dt(cfg.grid.dx))
    return (
        State(f=f1, h=h1, hn=hn1, g=g1, phi=phi, t=state.t + dt),
        rhs,
    )


@partial(jax.jit, static_argnums=(0, 2), donate_argnums=(1,))
def multi_step_pallas(cfg: Config, state: State, n: int) -> State:
    # unroll=2 so the buffers ping-pong without carry copies — see
    # ekpnp.step.multi_step
    def body(carry, _):
        new, _ = step_pallas(cfg, carry)
        return new, None

    state, _ = jax.lax.scan(body, state, None, length=n, unroll=2)
    return state
