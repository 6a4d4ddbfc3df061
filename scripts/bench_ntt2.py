import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core import rns, ntt, mxu_ntt

n, L = 1 << 16, 21
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
rng = np.random.default_rng(0)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
w, wsh, q = jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh), jnp.asarray(tabs.q)
mx = {k: jnp.asarray(v) for k, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}

def timeit(name, f, *a, iters=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.3f} ms")
    return r

triv = jax.jit(lambda x: x + jnp.uint32(1))
timeit("trivial x+1 [21,65536]", triv, x, iters=20)

def chain_unroll(x):
    for _ in range(8):
        x = ntt.ntt_fwd_unrolled(x, w, wsh, q)
    return x
def chain_mxu(x):
    for _ in range(8):
        x = mxu_ntt.ntt_fwd_mxu(x, mx)
    return x
timeit("8x fwd unrolled (1 jit)", jax.jit(chain_unroll), x)
timeit("8x fwd MXU (1 jit)", jax.jit(chain_mxu), x)
