"""Wall boundary conditions at the z = 0 and z = NZ-1 plates.

The reference implements these as three separate kernels with unrolled
direction swaps; here each is a masked row update on the (Q, Z, Y, X) array
using the OPP index map — the `f0bc` staging buffer (reference LBM.cu:502-504)
disappears because the pre-collision populations are simply the step input.

Ordering contract (reference stream_collide_save, LBM.cu:465-481):
  1. collide writes post-collision arrays
  2. `bounce_back_walls` overwrites wall rows of post-collision f using
     *pre-collision* f           (gpu_boundary, LBM.cu:1848-1961)
  3. streaming pulls (periodic in z!)
  4. `scalar_wall_bcs` overwrites wall rows of the *streamed* ion/thermal
     arrays using the *post-collision* values at the same wall node
     (gpu_bc_charge, LBM.cu:2095-2416)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import Config
from ..lattice import Lattice


def bounce_back_walls(cfg: Config, f_post, f_pre):
    """Full-way bounce-back on the fluid at both plates.

    z=0 stationary wall: plain opposite-direction swap of the pre-collision
    populations (reference LBM.cu:1859-1888); the rest population is restored
    to its pre-collision value (the reference's f0bc trick).

    z=NZ-1 moving wall at speed uw along x: bounce-back plus momentum term
    2 rho0 uw w_i e_ix / (cs^2 CFL) (reference LBM.cu:1896-1927).

    NOTE a deliberate deviation: the reference adds its `multis` term to
    direction 3 (+y) at the upper plate (LBM.cu:1904) even though e_3x = 0;
    we use the physically-standard e_ix-proportional term.  Identical for the
    default uw = 0.  Set PhysicsConfig.compat_ref_multis (or
    `--set compat=reference`) to reproduce the reference term-for-term for
    bit-parity comparison at uw != 0.
    """
    lat = cfg.lattice
    p = cfg.physics
    dtype = f_post.dtype
    opp = jnp.asarray(lat.OPP)

    refl = f_pre[opp]  # includes d=0 -> itself, i.e. the f0bc restore

    # lower plate
    f_post = f_post.at[:, 0].set(refl[:, 0])

    # upper plate (moving wall)
    w = jnp.asarray(lat.W, dtype)
    exq = lat.E[:, 0].astype(float)
    if p.compat_ref_multis and lat.Q > 3:
        # reference LBM.cu:1904: f2[d=3] += multis (e_3x = 0; d=4 gets none)
        exq = exq.copy()
        exq[3] += 1.0
    ex = jnp.asarray(exq, dtype)
    mw = dtype.type(2.0 * p.rho0 * p.uw / cfg.cs2 / p.cfl) * w * ex
    f_post = f_post.at[:, -1].set(refl[:, -1] + mw[:, None, None])
    return f_post


def scalar_wall_bcs(cfg: Config, streamed, post, which: str, wall=None):
    """Post-stream wall BCs for the scalar-transport populations.

    which == "noflux":  Yoshida-2014 localized no-flux for the ion fields at
    both plates: streamed wall populations replaced by the opposite
    *post-collision* populations at the same node (reference LBM.cu:2102-2218).
    The rest population is untouched.

    which == "temperature": Dirichlet anti-bounce-back
    (reference LBM.cu:2220-2413):
        z=0    : g_i = -g2_opp + 2 TH w_i   (including the rest population)
        z=NZ-1 : g_i = -g2_opp              (T = 0 wall)

    which == "injection": charge Dirichlet anti-bounce-back — the
    reference's commented-out ETHD injection regime (LBM.cu:2231-2292,
    same algebra as the temperature BC with the plate charge levels):
        z=0    : h_i = -h2_opp + 2 c_lo w_i   (including rest)
        z=NZ-1 : h_i = -h2_opp + 2 c_hi w_i
    `wall = (c_lo, c_hi)` carries the per-species plate levels
    (charge0/charge1 for (+), charge0n/charge1n for (-), LBM.h:57-58,81-83).

    which == "zerograd-top": no-flux at z=0; zero-gradient outflow at
    z=NZ-1 — the post-collision wall plane was pre-copied from its
    neighbor before streaming (reference LBM.cu:1929-1958, see ekpnp.step),
    and the down-going directions at the wall (whose pull sources wrapped
    periodically to z=0) are re-sourced from the copied ghost plane, i.e.
    the post-collision neighbor values.
    """
    lat = cfg.scalar_lat  # these BCs apply only to scalar-transport fields
    dtype = streamed.dtype
    opp = jnp.asarray(lat.OPP)
    refl = post[opp]

    if which in ("noflux", "zerograd-top"):
        lower = refl[:, 0].at[0].set(streamed[0, 0])
        out = streamed.at[:, 0].set(lower)
        if which == "noflux":
            upper = refl[:, -1].at[0].set(streamed[0, -1])
            out = out.at[:, -1].set(upper)
        else:
            # Down-going directions at the upper plate stream from the
            # ghost plane copied from z = NZ-2 (ekpnp.step pre-copies it
            # before streaming), so each direction carries the copied
            # plane's value at (y - ey, x - ex) — the in-plane shift true
            # ghost-plane streaming applies.  For D3Q7 scalars the only
            # down direction is (0, 0, -1) and the rolls are no-ops; for
            # D3Q27's 8 diagonal down directions they complete the
            # zero-gradient closure to the streaming scheme's own accuracy
            # (the reference's commented-out variant, LBM.cu:1929-1958,
            # copies the plane unshifted pre-stream and lets streaming
            # apply the shifts — identical semantics).
            rows = out[:, -1]
            for d in range(lat.Q):
                ex, ey, ez = (int(v) for v in lat.E[d])
                if ez == -1:
                    rows = rows.at[d].set(
                        jnp.roll(post[d, -2], (ey, ex), axis=(0, 1)))
            out = out.at[:, -1].set(rows)
        return out

    if which == "temperature":
        w = jnp.asarray(lat.W, dtype)[:, None, None]
        th = dtype.type(2.0 * cfg.physics.TH)
        out = streamed.at[:, 0].set(-refl[:, 0] + th * w)
        out = out.at[:, -1].set(-refl[:, -1])
        return out

    if which == "injection":
        c_lo, c_hi = wall
        w = jnp.asarray(lat.W, dtype)[:, None, None]
        out = streamed.at[:, 0].set(-refl[:, 0] + dtype.type(2.0 * c_lo) * w)
        out = out.at[:, -1].set(-refl[:, -1] + dtype.type(2.0 * c_hi) * w)
        return out

    raise ValueError(f"unknown wall BC {which!r}")
