import time, jax, jax.numpy as jnp, numpy as np
import jxl_tpu
N = 1_179_648
rng = np.random.default_rng(0)
v1 = jnp.asarray(rng.integers(0, 1<<16, N), jnp.uint32)
v2 = v1.reshape(4608, 256)
v2b = v1.reshape(1152, 1024)
def timeit(f):
    r = jax.block_until_ready(f()); t0=time.perf_counter()
    for _ in range(5): r = jax.block_until_ready(f())
    return round((time.perf_counter()-t0)/5*1e3, 2)
print("add 1D:", timeit(jax.jit(lambda: v1 + jnp.uint32(1))), "ms", flush=True)
print("add 2D:", timeit(jax.jit(lambda: v2 + jnp.uint32(1))), "ms", flush=True)
print("cumsum 1D:", timeit(jax.jit(lambda: jnp.cumsum(v1))), "ms", flush=True)
print("cumsum 2D ax0:", timeit(jax.jit(lambda: jnp.cumsum(v2, axis=0))), "ms", flush=True)
print("cumsum 2D(1024) ax0:", timeit(jax.jit(lambda: jnp.cumsum(v2b, axis=0))), "ms", flush=True)
idx2 = jnp.asarray(rng.integers(0, 4608, (4608, 256)), jnp.int32)
print("take_along 2D ax0:", timeit(jax.jit(lambda: jnp.take_along_axis(v2, idx2, axis=0))), "ms", flush=True)
small = jnp.asarray(rng.integers(0, 1<<12, 518), jnp.uint32)
fidx = jnp.asarray(rng.integers(0, 518, N), jnp.int32).reshape(4608, 256)
print("small-table gather 2D:", timeit(jax.jit(lambda: small[fidx])), "ms", flush=True)
