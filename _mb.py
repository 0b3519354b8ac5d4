import time, jax, jax.numpy as jnp, numpy as np
import jxl_tpu
T, K = 4608, 256
xs = jnp.asarray(np.random.randint(1, 4095, (T, K)), jnp.uint32)
def timeit(f, *a):
    r = jax.block_until_ready(f(*a)); t0=time.perf_counter()
    for _ in range(3): r = jax.block_until_ready(f(*a))
    return (time.perf_counter()-t0)/3

@jax.jit
def scan_add(xs):
    def step(c, x): return c + x, x & jnp.uint32(1)
    c, ys = jax.lax.scan(step, jnp.zeros((K,), jnp.uint32), xs)
    return c, ys

@jax.jit
def scan_div(xs):
    def step(c, x):
        q = c // jnp.maximum(x, 1)
        c2 = (q << 12) + (c % jnp.maximum(x, 1))
        return c2, (c2 & jnp.uint32(0xFFFF), c2 < (1<<20))
    c, ys = jax.lax.scan(step, jnp.full((K,), 1<<16, jnp.uint32), xs)
    return c, ys

@jax.jit
def scan_gather(xs):
    words = xs  # reuse as fake [T,K] words
    def step(carry, x):
        c, ptr = carry
        w = jnp.take_along_axis(words, ptr[None, :], axis=0)[0]
        c2 = c + w
        return (c2, ptr + (x & jnp.uint32(1)).astype(jnp.int32)), c2
    (c, p), ys = jax.lax.scan(step, (jnp.zeros((K,), jnp.uint32), jnp.zeros((K,), jnp.int32)), xs)
    return c, ys

print("scan_add  :", round(timeit(scan_add, xs)*1e3, 2), "ms", flush=True)
print("scan_div  :", round(timeit(scan_div, xs)*1e3, 2), "ms", flush=True)
print("scan_gather:", round(timeit(scan_gather, xs)*1e3, 2), "ms", flush=True)

@jax.jit
def scan_add_u(xs):
    def step(c, x): return c + x, x & jnp.uint32(1)
    c, ys = jax.lax.scan(step, jnp.zeros((K,), jnp.uint32), xs, unroll=16)
    return c, ys
print("scan_add unroll16:", round(timeit(scan_add_u, xs)*1e3, 2), "ms", flush=True)
