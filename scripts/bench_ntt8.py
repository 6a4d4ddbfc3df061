import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core import rns, ntt, mxu_ntt

L, n = 21, 1 << 16
rng = np.random.default_rng(0)
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
w, wsh, q = jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh), jnp.asarray(tabs.q)
mx = {k2: jnp.asarray(v) for k2, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}

def measure(name, fn, k1=8, k2=136, iters=6):
    def chain(k):
        def f(x):
            for _ in range(k):
                x = fn(x)
            return x[0, :8]
        return jax.jit(f)
    fa, fb = chain(k1), chain(k2)
    np.asarray(fa(x)); np.asarray(fb(x))
    ta = tb = 0.0
    for _ in range(iters):
        t0 = time.perf_counter(); np.asarray(fa(x)); ta += time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(fb(x)); tb += time.perf_counter() - t0
    per = (tb - ta) / iters / (k2 - k1)
    print(f"{name:24s} {per*1e3:7.3f} ms/transform ({per*1e6/L:6.1f} us/limb)")

measure("MXU fwd r256", lambda x: mxu_ntt.ntt_fwd_mxu(x, mx))
measure("MXU inv r256", lambda x: mxu_ntt.ntt_inv_mxu(x, mx))
measure("unrolled fwd", lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q), k2=40)
