import time, jax, jax.numpy as jnp
from ekpnp import preset
from ekpnp.pallas import _fused_cheap_tmp as FC

n = 256
cfg = preset("reference", nx=n, ny=n, nz=n+1, dtype="float32",
             fft_method="matmul", enable_ek=False, enable_thermal=False, use_pallas=True)
shape = cfg.grid.shape
f = jnp.full((27,)+shape, .037, jnp.float32)
fused = FC.build_fused_step(cfg, dtype=jnp.float32, ty_override=128)
K = 10
@jax.jit
def loop(f):
    def body(c, _):
        out = fused(c)
        return out[0], None
    c, _ = jax.lax.scan(body, f, None, length=K)
    return c
out = loop(f); s = float(out[0,0,0,0])
t0 = time.perf_counter(); out = loop(f); s = float(out[0,0,0,0])
dt = (time.perf_counter()-t0)/K
print(f"cheap-collide fluid ty=128: {dt*1e3:.2f} ms -> {cfg.grid.num_nodes/dt/1e6:.0f} MLUPS")
