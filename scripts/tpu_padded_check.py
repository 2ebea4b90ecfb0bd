#!/usr/bin/env python3
"""Real-TPU validation of the padded-NX fused kernel (verdict item 1).

Runs the fused Pallas step and the jnp oracle step side by side in f32 on
the real chip at grids whose NX is not a whole 128-lane tile — the
reference's canonical 50x8x51 (LBM.h:32-36) and BASELINE-config-1-shaped
64x32x33 — and reports max relative deviation plus rough per-step times.

Run from the repo root (axon TPU plugin discovery needs the profile env):
    python scripts/tpu_padded_check.py
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

from ekpnp import preset
from ekpnp.init import initialize
from ekpnp.pallas.step import multi_step_pallas
from ekpnp.step import multi_step


def check(name, cfg, steps=5):
    print(f"== {name}: grid {cfg.grid.shape[::-1]} scalars "
          f"{cfg.scalar_lat.name} ==")
    import dataclasses

    cfg_jnp = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, use_pallas=False))
    state, _ = initialize(cfg_jnp, dtype="float32")
    state = jax.block_until_ready(state)

    t0 = time.perf_counter()
    s_pal = multi_step_pallas(cfg_jnp, state, steps)
    float(jnp.sum(s_pal.f[0, 0, 0]))
    t_pal_c = time.perf_counter() - t0

    state2, _ = initialize(cfg_jnp, dtype="float32")
    s_ref = multi_step(cfg_jnp, state2, steps)
    float(jnp.sum(s_ref.f[0, 0, 0]))

    worst = 0.0
    for nm in ("f", "h", "hn", "g", "phi"):
        a, b = getattr(s_ref, nm), getattr(s_pal, nm)
        if a is None:
            continue
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = np.max(np.abs(a)) or 1.0
        dev = np.max(np.abs(a - b)) / scale
        worst = max(worst, dev)
        print(f"  {nm}: max rel dev {dev:.3e}")
    ok = worst < 5e-6
    print(f"  compile+{steps} steps fused: {t_pal_c:.2f} s; "
          f"{'OK' if ok else 'FAIL'} (worst {worst:.3e})")
    return ok


def main():
    print("devices:", jax.devices())
    ok = True
    cfg = preset("reference", fft_method="matmul", use_pallas=True,
                 scalar_lattice="D3Q7")
    ok &= check("reference 50x8x51 D3Q7", cfg)
    cfg = preset("reference", fft_method="matmul", use_pallas=True)
    ok &= check("reference 50x8x51 all-D3Q27", cfg)
    cfg = preset("poiseuille", nz=33, ny=32, use_pallas=True)
    ok &= check("poiseuille 64x32x33 fluid-only", cfg)
    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
