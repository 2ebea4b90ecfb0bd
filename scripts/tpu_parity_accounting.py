#!/usr/bin/env python3
"""Parity-kernel time/bytes accounting (round-4 verdict item 3): where do
the ~7 roofline points between the measured all-D3Q27 parity number
(643.9 MLUPS = 81.8%) and the TY=64 window-amplification ceiling (~88.9%)
actually go?

Decomposes the parity step (256^3, every field on D3Q27, TY=64,
hartley_x on / phi_hx off — the knob-pinned bench configuration) into
its serial components, each measured in ISOLATION on the real chip with
deep dispatch pipelines:

  step    the production multi_step chain (kernel -> solve -> kernel...)
  kernel  the fused collide-stream kernel alone (phi held fixed, rhs
          discarded; same compiled kernel, no solve in the chain)
  solve   poisson_phi_from_rhs(rhs_hx=True) alone (the serial spectral
          chain the parity step runs: no forward-x stage, inverse-x
          present since phi returns to real space)

One mode per process (256^3 parity buffers: two live compiled step
variants do not fit 16 GB HBM).  Run:
    python scripts/tpu_parity_accounting.py step|kernel|solve [N=256]
then `python scripts/tpu_parity_accounting.py table N t_step t_kern
t_solve` (ms each) prints the where-the-bytes-go table for the
fused_step.py record.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("EKPNP_HXRHS", "1")   # bench parity knobs
os.environ.setdefault("EKPNP_PHIHX", "0")

from ekpnp.compile_cache import enable as _enable_cache

_enable_cache()


def _cfg(n):
    from ekpnp import preset

    return preset("reference", nx=n, ny=n, nz=n + 1, dtype="float32",
                  fft_method="matmul", scalar_lattice="same",
                  use_pallas=True)


def _state(cfg):
    import jax.numpy as jnp

    from ekpnp.init import state_from_macro
    from ekpnp.state import Macro

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


def _timed(fn, sync, steps, reps=9):
    fn()  # warm dispatch
    sync()
    meds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        sync()
        meds.append((time.perf_counter() - t0) / steps)
    meds.sort()
    return meds[len(meds) // 2] * 1e3, \
        (meds[-1] - meds[0]) / meds[len(meds) // 2]


def mode_step(n):
    import jax.numpy as jnp

    from ekpnp.step import multi_step

    cfg = _cfg(n)
    s = _state(cfg)
    steps = 30
    s = multi_step(cfg, s, steps)
    float(jnp.sum(s.f[0, 0, 0]))
    box = [s]

    def run():
        box[0] = multi_step(cfg, box[0], steps)

    ms, spread = _timed(run, lambda: float(jnp.sum(box[0].f[0, 0, 0])), steps)
    mlups = cfg.grid.num_nodes / ms / 1e3
    print(f"step: {ms:.3f} ms/step (spread {spread:.1%}) = {mlups:.1f} MLUPS")


def mode_kernel(n):
    import jax
    import jax.numpy as jnp

    from ekpnp.pallas.fused_step import build_fused_step

    cfg = _cfg(n)
    s = _state(cfg)
    fused = build_fused_step(cfg, dtype=jnp.float32)
    print(f"hartley_x={fused.hartley_x}", flush=True)
    steps = 30

    def chain_fn(f, h, hn, g, phi):
        # kernel-only chain: phi held fixed (no solve), rhs summed into a
        # live scalar so the emission is not dead-code-eliminated
        acc = jnp.float32(0)

        def body(carry, _):
            f, h, hn, g, acc = carry
            f, h, hn, g, rhs = fused(f, h, hn, g, phi)
            return (f, h, hn, g, acc + rhs[0, 0, 0]), None

        (f, h, hn, g, acc), _ = jax.lax.scan(
            body, (f, h, hn, g, acc), None, length=steps, unroll=2)
        return f, h, hn, g, acc

    # donate the populations: two live all-D3Q27 256^3 states (7.3 GB
    # each) do not fit 16 GB HBM
    chain = jax.jit(chain_fn, donate_argnums=(0, 1, 2, 3))
    phi = s.phi
    out = chain(s.f, s.h, s.hn, s.g, phi)
    del s
    float(out[4])
    box = [out[:4]]

    def run():
        box[0] = chain(*box[0], phi)[:4]

    # sync on the f output (acc is returned but cheap to refetch)
    ms, spread = _timed(
        run, lambda: float(jnp.sum(box[0][0][0, 0, 0])), steps)
    mlups = cfg.grid.num_nodes / ms / 1e3
    print(f"kernel: {ms:.3f} ms/step (spread {spread:.1%}) = {mlups:.1f} "
          f"MLUPS kernel-only")


def mode_solve(n):
    import jax
    import jax.numpy as jnp

    from ekpnp.ops.poisson import poisson_phi_from_rhs

    cfg = _cfg(n)
    dtype = jnp.float32
    rhs = jnp.zeros((cfg.grid.nz - 2,) + cfg.grid.shape[1:], dtype)
    solve = jax.jit(lambda r: poisson_phi_from_rhs(cfg, r, None, rhs_hx=True))
    p = solve(rhs)
    float(jnp.sum(p[0, 0]))
    reps = 40
    box = [p]

    def run():
        for _ in range(reps):
            box[0] = solve(rhs)

    ms, spread = _timed(run, lambda: float(jnp.sum(box[0][0, 0])), reps)
    print(f"solve(rhs_hx): {ms:.3f} ms (spread {spread:.1%})")


def mode_table(n, t_step, t_kern, t_solve):
    cfg = _cfg(n)
    nodes = cfg.grid.num_nodes
    bw = 819e9
    q = 108  # 4 fields x D3Q27
    # roofline denominator (benchmark.py): 108 dirs x r+w x 4B + scalar
    # allowance 48 + poisson-pass allowance 128
    bpn_roof = q * 8 + 48 + 128
    t_roof = nodes * bpn_roof / bw * 1e3
    # bytes the kernel ACTUALLY moves: amplified reads (TY=64 windows
    # re-DMA 16 halo rows per plane: x(TY+16)/TY) + plain writes + phi
    # windows + the rhs emission; E is built in-kernel (no E traffic),
    # macros are not stored per step (multi_step carries populations only)
    ty_amp = (64 + 16) / 64
    kern_bytes = q * 4 * ty_amp + q * 4 + 4 * ty_amp + 4
    t_kern_floor = nodes * kern_bytes / bw * 1e3
    absorbed = t_kern + t_solve - t_step
    print(f"parity step accounting at {n}^3 (f32, all-D3Q27, TY=64, "
          f"hartley_x on, phi_hx off):")
    print(f"  roofline step ({bpn_roof} B/node @ 819 GB/s): {t_roof:.2f} ms")
    print(f"  measured step : {t_step:.3f} ms = {t_roof / t_step:.1%} of "
          f"roofline ({nodes / t_step / 1e3:.1f} MLUPS)")
    print(f"  kernel alone  : {t_kern:.3f} ms = {t_kern / t_step:.1%} of "
          f"the step")
    print(f"  solve alone   : {t_solve:.3f} ms (rhs_hx: fwd-x stage "
          f"rides the kernel MXU)")
    print(f"  scan absorbs  : {absorbed:.3f} ms of the solve's latency "
          f"({absorbed / t_solve:.0%}) behind kernel dispatch")
    print(f"  kernel amplified-byte floor: {t_kern_floor:.2f} ms "
          f"({kern_bytes:.0f} B/node = {q * 4 * ty_amp:.0f} read x1.25 + "
          f"{q * 4} write + phi/rhs)")
    print(f"  -> kernel HBM utilization on bytes it actually moves: "
          f"{t_kern_floor / t_kern:.1%}")
    print(f"  if the kernel ran at 100% BW: step = "
          f"{t_kern_floor + (t_step - t_kern):.2f} ms = "
          f"{t_roof / (t_kern_floor + t_step - t_kern):.1%} of roofline")
    print("  => the unharvested points are kernel DMA-pipeline "
          "inefficiency (windows of TY+16 rows with TY rows of compute "
          "to hide them, per-strip pipeline restarts, synchronous "
          "wall-plane emits), NOT emit/f_pin traffic and NOT the solve.")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    if mode == "table":
        mode_table(int(sys.argv[2]), *(float(x) for x in sys.argv[3:6]))
        return 0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    {"step": mode_step, "kernel": mode_kernel, "solve": mode_solve}[mode](n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
