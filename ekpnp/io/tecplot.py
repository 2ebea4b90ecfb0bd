"""ASCII Tecplot writer (reference save_data_tecplot, LBM.cu:2492-2565).

Same 14 variables, same ZONE layout, same wall-node linear extrapolation of
(rho, c+, c-, u) before writing — reference golden fields include it, so
parity plotting against reference dumps works column-for-column.

A C++ fast path (native/ekio.cpp, loaded via ctypes) formats the body ~20x
faster than Python string formatting for large grids; falls back to pure
Python when the shared library is absent.
"""
from __future__ import annotations

import io
import os
from typing import Optional, TextIO

import numpy as np

from ..config import Config
from ..diagnostics import wall_extrapolate
from ..state import Macro

HEADER = (
    'VARIABLES="x","y","z","u","v","w","p","charge","neg charge",'
    '"phi","Ex","Ey","Ez","Temperature"'
)


def _gather_columns(cfg: Config, macro: Macro, phi, E):
    """Assemble the 14 reference columns as (N,) float64 arrays in the
    reference's z-outer, y-mid, x-inner order."""
    import jax.numpy as jnp

    g = cfg.grid
    shape = g.shape
    zeros = np.zeros(shape)

    def get(a):
        return np.asarray(a, dtype=np.float64) if a is not None else zeros

    rho = get(macro.rho)
    u = get(macro.u) if macro.u is not None else np.zeros((3,) + shape)
    charge = get(macro.charge)
    chargen = get(macro.chargen)
    temp = get(macro.temp)
    phi_a = get(phi)
    E_a = get(E) if E is not None else np.zeros((3,) + shape)

    # wall extrapolation (LBM.cu:2527-2542): rho, charges, u — not phi/E/T
    rho = np.asarray(wall_extrapolate(jnp.asarray(rho)))
    charge = np.asarray(wall_extrapolate(jnp.asarray(charge)))
    chargen = np.asarray(wall_extrapolate(jnp.asarray(chargen)))
    u = np.asarray(wall_extrapolate(jnp.asarray(u)))

    z, y, x = np.meshgrid(
        np.arange(g.nz) * g.dz,
        np.arange(g.ny) * g.dy,
        np.arange(g.nx) * g.dx,
        indexing="ij",
    )
    cols = [x, y, z, u[0], u[1], u[2], rho, charge, chargen, phi_a, E_a[0], E_a[1], E_a[2], temp]
    return [c.reshape(-1) for c in cols]


def write_zone(
    fout: TextIO,
    cfg: Config,
    macro: Macro,
    phi,
    E,
    time: float,
    first: bool = False,
) -> None:
    g = cfg.grid
    if first:
        fout.write(HEADER + "\n")
    fout.write("\n")
    fout.write(f'ZONE T="t={time:g}", F=POINT, I = {g.nx}, J = {g.ny}, K = {g.nz}\n')
    cols = _gather_columns(cfg, macro, phi, E)
    body = _format_body(cols)
    fout.write(body)


def _format_body(cols) -> str:
    try:
        from . import native

        return native.format_tecplot(cols)
    except Exception:
        pass
    data = np.stack(cols, axis=1)
    buf = io.StringIO()
    # reference format: 8 %g columns then 6 %10.6f columns (LBM.cu:2559)
    for row in data:
        buf.write(
            "%g %g %g %g %g %g %g %g %10.6f %10.6f %10.6f %10.6f %10.6f %10.6f\n"
            % tuple(row)
        )
    return buf.getvalue()
