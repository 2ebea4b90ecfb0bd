#!/usr/bin/env python3
"""Probe alternate y-strip heights TY for the fused kernel at 256^3 on the
real chip (verdict item 8: close the last 8% of roofline).  TY=256 (JY=1)
would cut the window halo amplification from 12.5% to 6.25%; round 1
recorded a remote Mosaic compiler crash at TY=256 — re-checked here.

Run: python scripts/tpu_ty_probe.py [TY]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ekpnp.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from ekpnp import preset
from ekpnp.init import state_from_macro
from ekpnp.pallas.step import _get_fused
from ekpnp.state import Macro
from ekpnp.ops.poisson import poisson_phi_from_rhs


def main():
    ty = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scalars = sys.argv[2] if len(sys.argv) > 2 else "D3Q7"
    n = 256
    cfg = preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                 fft_method="matmul", scalar_lattice=scalars)
    dtype = jnp.float32
    shape = cfg.grid.shape
    macro = Macro(
        rho=jnp.full(shape, 1000.0, dtype),
        u=jnp.zeros((3,) + shape, dtype),
        charge=jnp.full(shape, 0.01, dtype),
        chargen=jnp.full(shape, 0.01, dtype),
        temp=jnp.full(shape, 0.5, dtype),
    )
    state = state_from_macro(cfg, macro, jnp.zeros(shape, dtype),
                             jnp.zeros((3,) + shape, dtype), 0.0)

    fused = _get_fused(cfg, "float32", False, ty, None)

    @jax.jit
    def steps(s, phi):
        for _ in range(2):
            f1, h1, hn1, g1, rhs = fused(s.f, s.h, s.hn, s.g, phi)
            phi = poisson_phi_from_rhs(cfg, rhs, None, rhs_hx=fused.hartley_x)
            s = s._replace(f=f1, h=h1, hn=hn1, g=g1, phi=phi)
        return s, phi

    print(f"TY={ty}: compiling...", flush=True)
    t0 = time.perf_counter()
    s, phi = steps(state, state.phi)
    float(jnp.sum(s.f[0, 0, 0]))
    print(f"  compile+2 steps: {time.perf_counter() - t0:.1f} s", flush=True)

    nrep = 15
    t0 = time.perf_counter()
    for _ in range(nrep):
        s, phi = steps(s, phi)
    float(jnp.sum(s.f[0, 0, 0]))
    per = (time.perf_counter() - t0) / (2 * nrep)
    mlups = cfg.grid.num_nodes / per / 1e6
    print(f"  TY={ty}: {per * 1e3:.3f} ms/step, {mlups:.1f} MLUPS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
