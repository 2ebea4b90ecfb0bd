#!/usr/bin/env python3
"""Real-chip cost proof for the halo comm/compute overlap (round-5,
SURVEY.md:305): on a 1-device ("y",) mesh the ppermutes are self-sends
(comm is free), so any throughput difference between the serial
exchange-then-kernel chunk and the one-step-lookahead pipeline
(parallel/halo.py overlap=True) is pure restructuring cost — carrying
halo blocks through the scan, the extra prologue exchange, scheduler
differences.  Target: <= ~2% (round-4 verdict item 1).

Also asserts the two forms are bit-exact on the chip.

Run: python scripts/tpu_overlap_probe.py [N=128] [steps=10]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ekpnp.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ekpnp import preset
from ekpnp.init import state_from_macro
from ekpnp.parallel.halo import make_halo_multi_step
from ekpnp.state import Macro


def _init(cfg):
    dtype = jnp.float32
    shape = cfg.grid.shape
    macro = Macro(
        rho=jnp.full(shape, 1000.0, dtype),
        u=jnp.zeros((3,) + shape, dtype),
        charge=jnp.full(shape, 0.01, dtype),
        chargen=jnp.full(shape, 0.01, dtype),
        temp=jnp.full(shape, 0.5, dtype),
    )
    return state_from_macro(cfg, macro, jnp.zeros(shape, dtype),
                            jnp.zeros((3,) + shape, dtype), 0.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    cfg = preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                 fft_method="matmul", scalar_lattice="D3Q7",
                 use_pallas=True)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("y",))

    run_ser = make_halo_multi_step(cfg, mesh, steps, overlap=False)
    run_ovl = make_halo_multi_step(cfg, mesh, steps, overlap=True)

    a = run_ser(_init(cfg))
    float(jnp.sum(a.f[0, 0, 0]))
    print("serial chunk compiled", flush=True)
    b = run_ovl(_init(cfg))
    float(jnp.sum(b.f[0, 0, 0]))
    print("overlapped chunk compiled", flush=True)

    exact = all(
        np.array_equal(np.asarray(getattr(a, k)), np.asarray(getattr(b, k)))
        for k in ("f", "h", "hn", "g", "phi"))
    print(f"bit-exact on chip: {exact}", flush=True)

    def timed(fn, s, nrep=10):
        s = fn(s)  # dispatch warm
        meds = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(nrep):
                s = fn(s)
            float(jnp.sum(s.f[0, 0, 0]))
            meds.append((time.perf_counter() - t0) / (nrep * steps))
        meds.sort()
        return meds[len(meds) // 2], s

    t_ser, a = timed(run_ser, a)
    t_ovl, b = timed(run_ovl, b)
    mlups_s = cfg.grid.num_nodes / t_ser / 1e6
    mlups_o = cfg.grid.num_nodes / t_ovl / 1e6
    over = 100 * (t_ovl / t_ser - 1)
    print(f"serial: {mlups_s:.1f} MLUPS   overlapped: {mlups_o:.1f} MLUPS"
          f"   restructure cost {over:+.1f}% (target <= ~2%)")
    ok = exact and over < 3.0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
