import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core import rns, ntt, mxu_ntt

L = 21
n = 1 << 16
rng = np.random.default_rng(0)
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
w, wsh, q = jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh), jnp.asarray(tabs.q)
mx = {k2: jnp.asarray(v) for k2, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}

def timeit(name, f, *a, iters=3):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = np.asarray(f(*a))
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")

def chain(fn, k):
    def f(x):
        for _ in range(k):
            x = fn(x)
        return x[0, :8]
    return jax.jit(f)

un = lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q)
mf = lambda x: mxu_ntt.ntt_fwd_mxu(x, mx)
for k in (1, 16, 64):
    timeit(f"{k}x unrolled", chain(un, k), x)
for k in (1, 16, 64):
    timeit(f"{k}x MXU", chain(mf, k), x)
