"""Equilibrium distributions and moments.

One vectorized `feq` serves all four populations (reference unrolls 4 x 27
scalar expressions, LBM.cu:162-463 / 830-1103): the ion populations simply
pass a drift velocity u + K*E (Nernst-Planck migration term, reference
LBM.cu:208-220), the fluid and temperature populations pass u.

All formulas are in the reference's physical-unit formulation: lattice
velocities have magnitude 1/CFL (m/s per unit cell) and cs^2 = 1/(3 CFL^2)
(reference LBM.h:51-53).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..lattice import Lattice


def lattice_consts(lat: Lattice, dtype):
    """E and W as broadcastable device constants: (Q,1,1,1) per component."""
    Ef = jnp.asarray(lat.E, dtype)
    ex = Ef[:, 0][:, None, None, None]
    ey = Ef[:, 1][:, None, None, None]
    ez = Ef[:, 2][:, None, None, None]
    w = jnp.asarray(lat.W, dtype)[:, None, None, None]
    return ex, ey, ez, w


def feq(lat: Lattice, m, v, cfl: float, cs2: float):
    """Second-order equilibrium for moment field `m` with drift velocity `v`.

    feq_i = w_i m [1 - |v|^2/(2 cs^2) + t_i (1 + t_i/2)],
    t_i = (e_i . v) / (cs^2 CFL)      (reference LBM.cu:818-825, 864-1103)

    m: (Z, Y, X); v: (3, Z, Y, X)  ->  (Q, Z, Y, X)
    """
    dtype = m.dtype
    ex, ey, ez, w = lattice_consts(lat, dtype)
    inv = 1.0 / (cs2 * cfl)
    t = (ex * v[0] + ey * v[1] + ez * v[2]) * dtype.type(inv)
    omusq = 1.0 - 0.5 * (v[0] * v[0] + v[1] * v[1] + v[2] * v[2]) * dtype.type(1.0 / cs2)
    return w * m[None] * (omusq[None] + t * (1.0 + 0.5 * t))


def moments(lat: Lattice, pops, cfl: float):
    """Zeroth moment and raw first moment / CFL of a population array.

    Returns (m, mom) with m: (Z,Y,X), mom: (3,Z,Y,X) where
    mom_a = sum_i pops_i e_ia / CFL (reference LBM.cu:621-644).
    """
    dtype = pops.dtype
    ex, ey, ez, _ = lattice_consts(lat, dtype)
    m = jnp.sum(pops, axis=0)
    inv_cfl = dtype.type(1.0 / cfl)
    mom = jnp.stack(
        [
            jnp.sum(pops * ex, axis=0) * inv_cfl,
            jnp.sum(pops * ey, axis=0) * inv_cfl,
            jnp.sum(pops * ez, axis=0) * inv_cfl,
        ]
    )
    return m, mom


def trt_split(lat: Lattice, a):
    """Even/odd (TRT) decomposition along the direction axis.

    a+ = (a_i + a_opp(i))/2,  a- = (a_i - a_opp(i))/2
    (reference LBM.cu:1148-1259; OPP[0] == 0 gives a+_0 = a_0, a-_0 = 0.)
    """
    opp = jnp.asarray(lat.OPP)
    a_opp = a[opp]
    return 0.5 * (a + a_opp), 0.5 * (a - a_opp)
