import sys, time, jax, jax.numpy as jnp
from functools import partial
from ekpnp import preset
from ekpnp.pallas.fused_step import build_fused_step, _pick_ty

n = 256
mode = sys.argv[1]; ty = int(sys.argv[2])
ek = mode == "coupled"
cfg = preset("reference", nx=n, ny=n, nz=n+1, dtype="float32",
             fft_method="matmul", enable_ek=ek, enable_thermal=ek, use_pallas=True)
print("default TY:", _pick_ty(cfg, 4 if ek else 1))
shape = cfg.grid.shape
dtype = jnp.float32
f = jnp.full((27,)+shape, .037, dtype)
h = hn = g = E = None
if ek:
    h = jnp.full((27,)+shape, .0003, dtype); hn = jnp.full((27,)+shape, .0003, dtype)
    g = jnp.full((27,)+shape, .018, dtype); E = jnp.zeros((3,)+shape, dtype)

fused = build_fused_step(cfg, dtype=dtype, ty_override=ty)
K = 10
@jax.jit
def loop(f, h, hn, g, E):
    def body(c, _):
        out = fused(c[0], c[1], c[2], c[3], E)
        return (out[0], out[1], out[2], out[3]), None
    c, _ = jax.lax.scan(body, (f, h, hn, g), None, length=K)
    return c[0]
out = loop(f, h, hn, g, E); s = float(out[0,0,0,0])
t0 = time.perf_counter(); out = loop(f, h, hn, g, E); s = float(out[0,0,0,0])
dt = (time.perf_counter()-t0)/K
print(f"{mode} ty={ty}: {dt*1e3:.2f} ms -> {cfg.grid.num_nodes/dt/1e6:.0f} MLUPS")
