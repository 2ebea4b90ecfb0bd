"""Stage-level timing of the spectral Poisson solve at 256^3 on TPU.

Quantifies the verdict-item-8 overlap opportunity: which of the six
3-pass-bf16 matmul stages dominate, and how much of the 2.1 ms/step
Poisson cost could hide inside the (HBM-bound, MXU-idle) fused kernel.
Run from the repo root on the real chip:  python scripts/tpu_poisson_probe.py
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
from ekpnp.ops.poisson import _scaled_inv_symbol, poisson_phi_from_rhs
from ekpnp.parallel.fft import _apply_hartley, dst_z, dst_z_padded

N = int(os.environ.get("N", 256))
STEPS = int(os.environ.get("STEPS", 50))


def timeit(name, fn, x):
    fn_j = jax.jit(fn)
    y = fn_j(x)
    float(jnp.sum(y[0, 0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        y = fn_j(x)
    float(jnp.sum(y[0, 0]))
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:34s} {ms:7.3f} ms")
    return ms


def main():
    cfg = preset("reference", nx=N, ny=N, nz=N + 1, dtype="float32",
                 fft_method="matmul")
    rhs = jnp.ones((cfg.grid.nz - 2, N, N), jnp.float32)
    inv_sym = _scaled_inv_symbol(cfg, jnp.dtype(jnp.float32), 1.0)

    total = timeit("full solve (6 stages + mul)",
                   lambda r: poisson_phi_from_rhs(cfg, r, None), rhs)
    t_dst = timeit("dst_z (fwd)", dst_z, rhs)
    t_dstp = timeit("dst_z_padded (inv)", dst_z_padded, rhs)
    t_hy = timeit("hartley y", lambda a: _apply_hartley(a, 1), rhs)
    t_hx = timeit("hartley x", lambda a: _apply_hartley(a, 2), rhs)
    t_mul = timeit("spectral multiply", lambda a: a * inv_sym, rhs)
    print(f"{'sum of stages':34s} {t_dst + t_dstp + 2 * t_hy + 2 * t_hx + t_mul:7.3f} ms")
    print(f"{'x stages (fusable in-kernel)':34s} {2 * t_hx:7.3f} ms")
    print(f"full-solve measured total: {total:.3f} ms")


if __name__ == "__main__":
    main()
