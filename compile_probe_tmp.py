import time
import velox_tpu, jax, jax.numpy as jnp
x = jnp.arange(1024, dtype=jnp.int64)
for k in [3, 5, 7, 11, 13]:
    t0 = time.perf_counter()
    f = jax.jit(lambda a, k=k: jnp.sort(a * k + jnp.arange(1024, dtype=jnp.int64))[:4])
    r = f(x); float(r[0])
    print(f"unique tiny program (k={k}): {time.perf_counter()-t0:.2f}s", flush=True)
# one medium program with a few sorts (Q3-ish shape)
t0 = time.perf_counter()
def med(a):
    b = jax.lax.sort((a, a ^ 7, a + 1), num_keys=2)
    c = jax.lax.cummax(b[0])
    d = jax.lax.sort((c, b[1]), num_keys=1)
    return d[0][:4]
f = jax.jit(med); r = f(jnp.arange(1<<20, dtype=jnp.int64)); float(r[0])
print(f"medium multi-sort 1M: {time.perf_counter()-t0:.2f}s", flush=True)
