import time, jax, jax.numpy as jnp, numpy as np
import jxl_tpu
N = 1_179_648
rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, 1<<16, N), jnp.uint32)
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
sorted_idx = jnp.asarray(np.sort(rng.choice(2*N, N, replace=False)).astype(np.int32))
def timeit(f):
    r = jax.block_until_ready(f()); t0=time.perf_counter()
    for _ in range(3): r = jax.block_until_ready(f())
    return round((time.perf_counter()-t0)/3*1e3, 1)

j1 = jax.jit(lambda: jnp.zeros((2*N,), jnp.uint32).at[perm].set(vals))
print("scatter random:", timeit(j1), "ms", flush=True)
j2 = jax.jit(lambda: jnp.zeros((2*N,), jnp.uint32).at[sorted_idx].set(vals, unique_indices=True, indices_are_sorted=True))
print("scatter sorted+unique:", timeit(j2), "ms", flush=True)
j3 = jax.jit(lambda: vals[perm])
print("gather random:", timeit(j3), "ms", flush=True)
big = jnp.zeros((2*N,), jnp.uint32).at[sorted_idx].set(vals)
j4 = jax.jit(lambda: big[sorted_idx])
print("gather sorted:", timeit(j4), "ms", flush=True)
keys = jnp.asarray(rng.integers(0, 1<<30, N), jnp.int32)
j5 = jax.jit(lambda: jnp.sort(keys))
print("sort 1.18M i32:", timeit(j5), "ms", flush=True)
j6 = jax.jit(lambda: jax.lax.sort((keys, vals), num_keys=1))
print("sort kv:", timeit(j6), "ms", flush=True)
# cumsum for reference
j7 = jax.jit(lambda: jnp.cumsum(vals))
print("cumsum:", timeit(j7), "ms", flush=True)
