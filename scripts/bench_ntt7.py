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

# bit-exactness ON DEVICE (validates byte order of bitcast on TPU)
ref = np.asarray(jax.jit(lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q))(x))
got = np.asarray(jax.jit(lambda x: mxu_ntt.ntt_fwd_mxu(x, mx))(x))
print("TPU fwd bit-exact:", np.array_equal(ref, got))
refi = np.asarray(jax.jit(lambda y: ntt.ntt_inv_unrolled(y, jnp.asarray(tabs.wi), jnp.asarray(tabs.wi_sh), q, jnp.asarray(tabs.ninv), jnp.asarray(tabs.ninv_sh)))(jnp.asarray(ref)))
goti = np.asarray(jax.jit(lambda y: mxu_ntt.ntt_inv_mxu(y, mx))(jnp.asarray(ref)))
print("TPU inv bit-exact:", np.array_equal(refi, goti))

def timeit(name, f, *a, iters=3):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")

def chain(fn, k):
    def f(x):
        for _ in range(k):
            x = fn(x)
        return x[0, :8]
    return jax.jit(f)

mf = lambda x: mxu_ntt.ntt_fwd_mxu(x, mx)
mi = lambda x: mxu_ntt.ntt_inv_mxu(x, mx)
for k in (1, 64):
    timeit(f"{k}x MXU fwd r256", chain(mf, k), x)
for k in (1, 64):
    timeit(f"{k}x MXU inv r256", chain(mi, k), x)
