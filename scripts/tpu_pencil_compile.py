#!/usr/bin/env python3
"""Compile-prove + time the shard_x (pencil) fused kernel on the real chip
(round-3 verdict item 1): a 1-device ("y", "x") = (1, 1) mesh exercises
the exact pencil plumbing — the packed phi-column x-halo window (pcol)
with its masked Ex edge-lane patch, the post-kernel x-wrap column
ppermute repair, and the shard_map ring exchanges (parallel/halo.py +
fused_step.py shard_x) — COMPILED by Mosaic.  Interpret mode (CPU
equality tests, tests/test_sharding.py pencil tests) accepts constructs
Mosaic rejects, so this is the compile proof the dispatch gate relies on.

Checks: (a) Mosaic compiles + runs the shard_x kernel, (b) `steps` steps
equal the plain single-chip fused path to f32 roundoff (the 1x1 ring's
self-ppermute IS the periodic wrap), (c) a timed MLUPS number bounds the
pencil overhead: the kernel's x-local design adds only column traffic,
but the pencil solve cannot fuse the x-Hartley stages (hartley_x/phi_hx
off), so expect ~10-20% vs the plain path at 128^3 (measured round 4:
1130.1 vs 1304.5 MLUPS, 15.4%; the round-4 dead-end alternative — x-halo
lane TILES re-collided in-kernel — measured 154-196 MLUPS, killed by the
128-lane-tile granularity of any per-field x-halo input).

Run: python scripts/tpu_pencil_compile.py [N=128]
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
from ekpnp.parallel.halo import make_halo_multi_step, supports_halo_step
from ekpnp.state import Macro
from ekpnp.step import multi_step


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
    steps = 10
    import dataclasses

    cfg = preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                 fft_method="matmul", scalar_lattice="D3Q7")
    cfg_p = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, use_pallas=True))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    assert supports_halo_step(cfg, mesh)

    s0 = _init(cfg)
    ref = multi_step(cfg_p, _init(cfg), steps)
    ref_f = np.asarray(ref.f[0, :, :, 0])
    ref_phi = np.asarray(ref.phi)
    del ref

    run = make_halo_multi_step(cfg, mesh, steps)
    t0 = time.perf_counter()
    out = run(s0)
    float(jnp.sum(out.f[0, 0, 0]))
    print(f"shard_x pencil kernel COMPILED + ran on real chip "
          f"({time.perf_counter() - t0:.1f} s incl. compile)", flush=True)

    err_f = np.abs(np.asarray(out.f[0, :, :, 0]) - ref_f).max() / \
        np.abs(ref_f).max()
    err_phi = np.abs(np.asarray(out.phi) - ref_phi).max() / \
        max(np.abs(ref_phi).max(), 1e-30)
    print(f"pencil vs plain after {steps} steps: rel err f={err_f:.2e} "
          f"phi={err_phi:.2e}", flush=True)

    def timed(fn, s, nrep=10):
        s = fn(s)  # dispatch-path warm (donating input)
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(nrep):
                s = fn(s)
            float(jnp.sum(s.f[0, 0, 0]))
            best.append((time.perf_counter() - t0) / (nrep * steps))
        return sorted(best)[1], s

    t_pen, out = timed(run, out)
    t_plain, _ = timed(lambda s: multi_step(cfg_p, s, steps), _init(cfg))

    mlups_x = cfg.grid.num_nodes / t_pen / 1e6
    mlups_p = cfg.grid.num_nodes / t_plain / 1e6
    print(f"plain fused: {mlups_p:.1f} MLUPS   pencil(1x1 shard_map): "
          f"{mlups_x:.1f} MLUPS   overhead {100 * (t_pen / t_plain - 1):.1f}%")
    ok = err_f < 1e-5 and err_phi < 1e-4
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
