import time, jax, jax.numpy as jnp
shape = (27, 128, 256, 256)
nbytes = 4 * 27*128*256*256
a = jnp.full(shape, 1.0, jnp.float32)
b = jnp.full(shape, 2.0, jnp.float32)

@jax.jit
def add_loop(a, b):
    c, _ = jax.lax.scan(lambda c,_: (c + b*1.0000001, None), a, None, length=20)
    return c
out = add_loop(a, b); s = float(out[0,0,0,0])
t0 = time.perf_counter(); out = add_loop(a, b); s = float(out[0,0,0,0])
dt = (time.perf_counter()-t0)/20
print(f"XLA add: {dt*1e3:.2f} ms -> {3*nbytes/dt/1e9:.0f} GB/s (r2w1)", flush=True)

@jax.jit
def roll_loop(a):
    c, _ = jax.lax.scan(lambda c,_: (jnp.roll(c, 1, axis=1)*1.0000001, None), a, None, length=20)
    return c
out = roll_loop(a); s = float(out[0,0,0,0])
t0 = time.perf_counter(); out = roll_loop(a); s = float(out[0,0,0,0])
dt = (time.perf_counter()-t0)/20
print(f"XLA roll-z: {dt*1e3:.2f} ms -> {2*nbytes/dt/1e9:.0f} GB/s (r1w1)", flush=True)
