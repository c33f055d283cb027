import time, numpy as np
from genrich_tpu.utils.xla_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp

rng = np.random.RandomState(0)
def force(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
def bench(name, f, *args, n=3):
    g = jax.jit(f)
    force(g(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = force(g(*args))
    dt = (time.perf_counter()-t0)/n
    print(f"{name:40s} {dt*1e3:9.2f} ms")

x = jnp.asarray(rng.randint(0, 1<<24, 1<<20).astype(np.int32))

def k_sorts(x, k):
    for i in range(k):
        x = jax.lax.sort(x ^ (i+1))
    return jnp.sum(x[::1024])
bench("1x sort 2^20 (chained)", lambda x: k_sorts(x, 1), x)
bench("4x sort 2^20 (chained)", lambda x: k_sorts(x, 4), x)
bench("16x sort 2^20 (chained)", lambda x: k_sorts(x, 16), x)

y = jnp.asarray(rng.randint(0, 1<<24, 1<<16).astype(np.int32))
bench("16x sort 2^16 (chained)", lambda y: k_sorts(y, 16), y)
bench("noop (x[0])", lambda x: x[0], x)
