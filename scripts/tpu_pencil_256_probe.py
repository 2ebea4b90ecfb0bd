#!/usr/bin/env python3
"""Time the shard_x (pencil) fused kernel at PRODUCTION size (256^3) on
the real chip — pencil-path only.

scripts/tpu_pencil_compile.py proves compile + bit-exactness and measures
the pencil tax at 128^3 (1130.1 vs 1304.5 MLUPS, 15.4%); SCALING_r04
applies that 15.4% multiplicatively to every pencil decomposition.  This
probe anchors the tax at the production volume instead: unlike the 128^3
script it does NOT hold a second compiled 256^3 step variant in the same
process (two do not fit one v5e's 16 GB — CLAUDE.md), so the comparison
baseline is the separately-validated plain-path headline (bench.py,
1379.9-1384.0 MLUPS r4) passed via --plain-mlups.

Run: python scripts/tpu_pencil_256_probe.py [N=256] [--plain-mlups 1379.9]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ekpnp.compile_cache import enable as _enable_cache

_enable_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ekpnp import preset
from ekpnp.init import state_from_macro
from ekpnp.parallel.halo import make_halo_multi_step, supports_halo_step
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
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10,
                    help="steps per compiled chunk (matches the 128^3 probe)")
    ap.add_argument("--plain-mlups", type=float, default=1379.9,  # the validated r4 headline (the recorded 8.6% tax baseline)
                    help="validated plain-path headline at this size for the "
                    "overhead ratio (bench.py r4)")
    ap.add_argument("--slab", action="store_true",
                    help="probe the ('y',) slab halo kernel instead of the "
                    "('y','x') pencil form (tpu_halo_compile.py's variant, "
                    "at a size where two live compiled paths don't fit)")
    args = ap.parse_args()
    n = args.n

    cfg = preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                 fft_method="matmul", scalar_lattice="D3Q7")
    if args.slab:
        mesh = Mesh(np.asarray(jax.devices()[:1]), ("y",))
    else:
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("y", "x"))
    assert supports_halo_step(cfg, mesh)

    tag = "slab" if args.slab else "pencil(1x1 shard_map)"
    run = make_halo_multi_step(cfg, mesh, args.steps)
    s = _init(cfg)
    t0 = time.perf_counter()
    s = run(s)
    float(jnp.sum(s.f[0, 0, 0]))
    print(f"{tag} halo kernel at {n}^3 COMPILED + ran "
          f"({time.perf_counter() - t0:.1f} s incl. compile)", flush=True)
    if not np.isfinite(float(jnp.sum(s.phi[0, 0]))):
        print("FAIL: non-finite state")
        return 1

    # dispatch-path warm: one full synced window, or the first timed
    # window reads ~2x slow while the dispatch queue ramps (measured
    # 683 vs 1275 MLUPS steady at 256^3)
    for _ in range(4):
        s = run(s)
    float(jnp.sum(s.f[0, 0, 0]))
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(4):   # 4 chunks x steps: a deep dispatch pipeline
            s = run(s)
        float(jnp.sum(s.f[0, 0, 0]))
        windows.append((time.perf_counter() - t0) / (4 * args.steps))
    per_step = sorted(windows)[len(windows) // 2]
    mlups = cfg.grid.num_nodes / per_step / 1e6
    spread = (max(windows) - min(windows)) / per_step
    print(f"{tag} at {n}^3: {mlups:.1f} MLUPS "
          f"(median of {len(windows)} windows, spread {100 * spread:.1f}%)")
    print(f"vs plain-path headline {args.plain_mlups:.1f}: overhead "
          f"{100 * (args.plain_mlups / mlups - 1):.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
