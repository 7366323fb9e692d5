import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/velox_tpu/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)
t0=time.perf_counter()
f = jax.jit(lambda x: jnp.sort(x*3+1)[:8])
r = f(jnp.arange(1<<20, dtype=jnp.int64)); import numpy as np; np.asarray(r)
print("compile+run:", time.perf_counter()-t0, flush=True)
