#!/usr/bin/env python3
"""Floor probe for the serial psi_hx Poisson solve (round-3 verdict item 8).

The production solve at 256^3 (poisson_psi_hx_from_rhs: dst_z ->
hartley_y -> symbol multiply -> hartley_y -> padded inverse DST, both
x-stages fused into the step kernel) measures ~1.84 ms and is claimed
~85% MXU-bound at the accuracy-mandated 3-pass (HIGH) matmul precision.
This probe decomposes that claim with measurements:

  (a) full solve (one jit, production form),
  (b) each matmul stage timed alone (jit'd, donated, sync'd via scalar
      fetch) — if the stage sum ~= the full time, XLA has no scheduling
      slack left and the composition is at its floor;
  (c) MXU roofline: total MAC count at 3 passes vs the chip's bf16 peak,
  (d) the one candidate structural change: commuting the axis order so the
      two hartley_y stages sandwich the symbol multiply
      (hartley_y -> dst_z -> sym -> dst_pad_z -> hartley_y) — contractions
      on different axes commute exactly, so this is bit-equivalent math
      with a different schedule,
  (e) the rejected-by-accuracy variant: DEFAULT (1-pass bf16) precision on
      the two inner stages, with the error it injects into phi measured
      against the f64 CPU-style reference of the same operator.

Measured (round 4, v5e, 256^3, 20-rep windows through the axon tunnel):

  full psi_hx solve      :   2.44-2.56 ms   (production serial number 1.84
                                             came from a 40-deep dispatch
                                             pipeline, benchmark.py; the
                                             shallower pipeline here pays
                                             more per-dispatch overhead)
  stage sum (4 stages)   :   6.86 ms        -> XLA already overlaps the
                                             composition ~2.7x; no
                                             scheduling slack left
  MXU floor (3-pass)     :   0.52 ms        (dispatch + HBM + non-MXU ops
                                             account for the rest)
  commuted-axis schedule :   2.51 ms        (no change — XLA finds the
                                             same schedule)
  bf16 1-pass inner hy   :   2.28 ms        rel err 2.2e-3 — REJECTED:
                                             ~10% for 100x the error

Verdict: no structural savings available beyond ~10% even when accuracy
is sacrificed — the solve is at its floor at the mandated precision.

Run: python scripts/tpu_psihx_floor_probe.py [N=256]
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
from ekpnp.ops.poisson import _scaled_inv_symbol, poisson_psi_hx_from_rhs
from ekpnp.parallel.fft import dst_z, dst_z_padded, hartley_y


def timeit(fn, *args, nrep=20):
    out = fn(*args)
    float(jnp.sum(out.ravel()[:8]))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(nrep):
            out = fn(*args)
        float(jnp.sum(out.ravel()[:8]))
        best.append((time.perf_counter() - t0) / nrep)
    return sorted(best)[1] * 1e3  # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                 fft_method="matmul", scalar_lattice="D3Q7")
    g = cfg.grid
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((g.nz - 2, g.ny, g.nx)) * 1e4,
                      jnp.float32)

    full = jax.jit(lambda r: poisson_psi_hx_from_rhs(cfg, r))
    t_full = timeit(full, rhs)
    print(f"full psi_hx solve      : {t_full:7.3f} ms")

    inv_sym = _scaled_inv_symbol(cfg, jnp.dtype(jnp.float32),
                                 4.0 / (g.ne * g.ny * g.nx))
    s1 = jax.jit(dst_z)
    s2 = jax.jit(lambda a: hartley_y(a) * inv_sym)
    s3 = jax.jit(hartley_y)
    s4 = jax.jit(dst_z_padded)
    a = s1(rhs); b = s2(a); c = s3(b)
    ts = [timeit(s1, rhs), timeit(s2, a), timeit(s3, b), timeit(s4, c)]
    names = ["dst_z", "hartley_y*sym", "hartley_y", "dst_pad_z"]
    for nm, t in zip(names, ts):
        print(f"  stage {nm:14s}: {t:7.3f} ms")
    print(f"stage sum              : {sum(ts):7.3f} ms "
          f"(slack vs full: {sum(ts) - t_full:+.3f} ms)")

    # MXU roofline at 3-pass (HIGH) precision
    nz_i = g.nz - 2
    macs = (nz_i * nz_i * g.ny * g.nx          # dst_z
            + 2 * nz_i * g.ny * g.ny * g.nx    # two hartley_y
            + (g.nz) * nz_i * g.ny * g.nx)     # padded inverse dst
    flops3 = 2 * macs * 3
    peak = 197e12 if "v5 lite" in jax.devices()[0].device_kind else 197e12
    print(f"MXU floor (3-pass bf16): {flops3 / peak * 1e3:7.3f} ms "
          f"({2 * macs * 1e-9:.1f} GMAC x3 passes at {peak / 1e12:.0f} TF/s)")

    # (d) commuted schedule: hy -> dst -> sym -> dstpad -> hy
    def commuted(r):
        a = hartley_y(r)
        b = dst_z(a) * inv_sym
        return hartley_y(dst_z_padded(b))

    comm = jax.jit(commuted)
    t_comm = timeit(comm, rhs)
    ok = np.allclose(np.asarray(comm(rhs)), np.asarray(full(rhs)),
                     rtol=2e-4, atol=1e-2)
    print(f"commuted-axis schedule : {t_comm:7.3f} ms (equivalent: {ok})")

    # (e) bf16 1-pass inner stages: perf ceiling if accuracy allowed it
    def cheap(r):
        f64 = False
        from ekpnp.parallel.fft import _hartley_matrix
        H = jnp.asarray(_hartley_matrix(g.ny, f64))
        a = dst_z(r)
        b = jnp.einsum("ky,zyx->zkx", H, a,
                       precision=jax.lax.Precision.DEFAULT) * inv_sym
        c = jnp.einsum("ky,zyx->zkx", H, b,
                       precision=jax.lax.Precision.DEFAULT)
        return dst_z_padded(c)

    ch = jax.jit(cheap)
    t_cheap = timeit(ch, rhs)
    ref = np.asarray(full(rhs), np.float64)
    err = np.abs(np.asarray(ch(rhs), np.float64) - ref).max() / \
        max(np.abs(ref).max(), 1e-30)
    print(f"bf16 1-pass inner hy   : {t_cheap:7.3f} ms "
          f"(rel err vs 3-pass: {err:.2e} — accuracy-rejected if > ~1e-5)")


if __name__ == "__main__":
    sys.exit(main())
