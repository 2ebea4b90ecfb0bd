"""One fused timestep (the reference hot path, main.cu:189-224).

Order is the reference's exactly (stream_collide_save LBM.cu:465-481 then
fast_Poisson main.cu:198):

  collide (TRT, all fields) -> fluid bounce-back at walls -> pull stream
  (periodic) -> ion no-flux + temperature Dirichlet wall BCs -> spectral
  Poisson solve for phi, E (consumed by the *next* step's collide)

Everything is one pure function of (Config static, State) -> (State, Macro);
under `jax.jit` with donated state the double-buffer pointer swap of the
reference becomes an in-place update.
"""
from __future__ import annotations

from functools import partial

import jax

from .config import Config
from .ops.boundary import bounce_back_walls, scalar_wall_bcs
from .ops.collide import collide
from .ops.poisson import poisson_phi
from .ops.stream import stream
from .state import Macro, State


def step(cfg: Config, state: State, perturb: bool = False, mesh=None) -> tuple[State, Macro]:
    if cfg.run.use_pallas and not perturb:
        # custom_vjp wrapper: fused-kernel forward, jnp-oracle backward —
        # free when not differentiating, exact adjoint when jax.grad is
        # applied over the step chain (pallas/step.py step_pallas_diff)
        from .pallas.step import step_pallas_diff

        new = step_pallas_diff(cfg, state, mesh, False)
        return new, None

    p = cfg.physics
    lat = cfg.lattice
    lat_s = cfg.scalar_lat

    post, macro = collide(cfg, state, perturb=perturb)

    # fluid wall bounce-back uses pre-collision populations (LBM.cu:1848-1961)
    f2 = bounce_back_walls(cfg, post.f, state.f)

    f1 = stream(lat, f2)
    h1 = hn1 = g1 = None
    phi = state.phi

    if p.enable_ek:
        cbc = p.charge_bc
        post_h, post_hn = post.h, post.hn
        if cbc == "zerograd-top":
            # zero charge gradient at the upper plate: the post-collision
            # wall plane is replaced by its interior neighbor BEFORE
            # streaming (the reference's commented-out variant sits inside
            # gpu_boundary, i.e. pre-stream, LBM.cu:1929-1958); streaming
            # then pulls the copied values and the post-stream wall fix
            # applies at the lower plate only
            post_h = post_h.at[:, -1].set(post_h[:, -2])
            if post_hn is not None:
                post_hn = post_hn.at[:, -1].set(post_hn[:, -2])

        def ion_bcs(streamed, post_k, wall):
            if cbc == "noflux":
                return scalar_wall_bcs(cfg, streamed, post_k, "noflux")
            if cbc == "injection":
                return scalar_wall_bcs(cfg, streamed, post_k, "injection",
                                       wall=wall)
            if cbc == "zerograd-top":
                return scalar_wall_bcs(cfg, streamed, post_k, "zerograd-top")
            raise ValueError(f"unknown charge_bc {cbc!r}")

        h1 = ion_bcs(stream(lat_s, post_h), post_h,
                     (p.charge0, p.charge1))
        if post_hn is not None:
            hn1 = ion_bcs(stream(lat_s, post_hn), post_hn,
                          (p.charge0n, p.charge1n))
        phi = poisson_phi(cfg, macro.charge, macro.chargen, mesh)

    if p.enable_thermal:
        g1 = stream(lat_s, post.g)
        g1 = scalar_wall_bcs(cfg, g1, post.g, "temperature")

    dt = state.t.dtype.type(p.dt(cfg.grid.dx))
    new = State(f=f1, h=h1, hn=hn1, g=g1, phi=phi, t=state.t + dt)
    return new, macro


@partial(jax.jit, static_argnums=(0, 2), donate_argnums=(1,))
def step_jit(cfg: Config, state: State, perturb: bool = False) -> tuple[State, Macro]:
    return step(cfg, state, perturb=perturb)


@partial(jax.jit, static_argnums=(0, 2), donate_argnums=(1,))
def multi_step(cfg: Config, state: State, n: int) -> State:
    """Run n steps inside one compiled loop (lax.scan over the step).

    Macroscopic fields are recomputable from the returned state with
    `ekpnp.ops.collide.compute_macro` — the reference instead stores them
    every step (LBM.cu:807-813); here the inner loop carries populations
    only, saving HBM traffic.

    The scan is unrolled x2: an XLA while-loop must update its carry
    buffers in place, and the fused Pallas call (no input/output aliasing)
    writes fresh output buffers — with one step per iteration XLA inserts
    a full copy of every population field to restore the carry placement
    (~22 ms/step at 256^3).  With a step pair per iteration, liveness lets
    XLA assign the second call's outputs straight to the first call's dead
    inputs — the buffers ping-pong A->B->A and the copies vanish, exactly
    the reference's f1/f2 pointer swap (main.cu:192) reborn as buffer
    assignment (measured: unroll=2 also beats a hand-written 2-step body
    by ~3% at 256^3 and needs no odd-step epilogue).

    On the fused-kernel EK path the chunk carries phi in x-Hartley
    encoding (encode once, decode once — pallas/step.py
    multi_step_pallas_hx), removing both x-stages from the serial
    spectral solve; state in and out is ordinary real phi either way."""
    if cfg.run.use_pallas:
        from .pallas.step import _phi_hx_capable, multi_step_pallas_hx

        if _phi_hx_capable(cfg):
            return multi_step_pallas_hx(cfg, state, n)

    def body(carry, _):
        new, _ = step(cfg, carry)
        return new, None

    state, _ = jax.lax.scan(body, state, None, length=n, unroll=2)
    return state
