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
from functools import partial

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
    cchunk = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    eg = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    es = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    n = int(os.environ.get("EKPNP_PROBE_N", 256))
    ny = int(os.environ.get("EKPNP_PROBE_NY", n))
    cfg = preset("reference", nx=n, ny=ny, nz=n + 1, dtype="float32",
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

    fused = _get_fused(cfg, "float32", False, ty, None, cchunk=cchunk,
                       emit_group=eg, emit_slots=es)

    # donated carry: the all-D3Q27 parity state is 7.2 GB at 256^3 — two
    # live copies (undonated in+out) exceed the chip's 16 GB HBM
    @partial(jax.jit, donate_argnums=(0,))
    def steps(s):
        for _ in range(2):
            f1, h1, hn1, g1, rhs = fused(s.f, s.h, s.hn, s.g, s.phi)
            phi = poisson_phi_from_rhs(cfg, rhs, None, rhs_hx=fused.hartley_x)
            s = s._replace(f=f1, h=h1, hn=hn1, g=g1, phi=phi)
        return s

    tag = (f"TY={ty} cchunk={cchunk} eg={eg} es={es} scalars={scalars} "
           f"n={n} ny={ny}")
    print(f"{tag}: compiling...", flush=True)
    t0 = time.perf_counter()
    s = steps(state)
    float(jnp.sum(s.f[0, 0, 0]))
    print(f"  compile+2 steps: {time.perf_counter() - t0:.1f} s", flush=True)

    nrep = 15
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(nrep):
            s = steps(s)
        float(jnp.sum(s.f[0, 0, 0]))
        per = (time.perf_counter() - t0) / (2 * nrep)
        vals.append(cfg.grid.num_nodes / per / 1e6)
    vals.sort()
    print(f"  {tag}: {vals[1]:.1f} MLUPS (median of 3: {vals})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
