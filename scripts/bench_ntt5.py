import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core import rns, ntt, mxu_ntt

L, A = 21, 256
n = A * A
rng = np.random.default_rng(0)
f8 = jnp.asarray(rng.integers(-64, 64, (L, 5*A, 5*A), dtype=np.int8))
zd8 = jnp.asarray(rng.integers(-64, 64, (L, 5*A, A), dtype=np.int8))

def timeit(name, f, *a, iters=5):
    r = np.asarray(jax.block_until_ready(f(*a))).ravel()[0]   # force fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        r = np.asarray(f(*a)).ravel()[0]
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

def mk(k):
    def f(F, zd):
        o = zd
        for _ in range(k):
            s = jnp.einsum("lij,ljk->lik", F, o, preferred_element_type=jnp.int32)
            o = (s & 127).astype(jnp.int8)
        return o[0, 0, :8]          # tiny output: fetch forces full compute
    return jax.jit(f)

for k in (1, 4, 16):
    timeit(f"{k}x int8 matmul (fetch)", mk(k), f8, zd8)

# real NTT paths with fetch
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
w, wsh, q = jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh), jnp.asarray(tabs.q)
mx = {k2: jnp.asarray(v) for k2, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}

def chain(fn, k):
    def f(x):
        for _ in range(k):
            x = fn(x)
        return x[0, :8]
    return jax.jit(f)

timeit("1x fwd unrolled (fetch)", chain(lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q), 1), x)
timeit("8x fwd unrolled (fetch)", chain(lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q), 8), x, iters=3)
timeit("1x fwd MXU (fetch)", chain(lambda x: mxu_ntt.ntt_fwd_mxu(x, mx), 1), x)
timeit("8x fwd MXU (fetch)", chain(lambda x: mxu_ntt.ntt_fwd_mxu(x, mx), 8), x, iters=3)
