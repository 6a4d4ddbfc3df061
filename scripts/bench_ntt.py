"""Microbench: NTT strategies on the current backend (TPU or CPU).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ntt.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core import rns, ntt, mxu_ntt

n = int(os.environ.get("BN_N", 1 << 16))
L = int(os.environ.get("BN_L", 21))
print("backend:", jax.default_backend(), "n:", n, "L:", L)
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
rng = np.random.default_rng(0)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
w, wsh, q = jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh), jnp.asarray(tabs.q)
wi, wish = jnp.asarray(tabs.wi), jnp.asarray(tabs.wi_sh)
ninv, ninvsh = jnp.asarray(tabs.ninv), jnp.asarray(tabs.ninv_sh)

def timeit(name, f, *a):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter(); iters = 10
    for _ in range(iters):
        r = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:8.3f} ms   ({dt*1e6/L:7.1f} us/limb)")
    return r

f_unroll = jax.jit(lambda x: ntt.ntt_fwd_unrolled(x, w, wsh, q))
ref = timeit("fwd unrolled XLA", f_unroll, x)

mx = {k: jnp.asarray(v) for k, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}
f_mxu = jax.jit(lambda x: mxu_ntt.ntt_fwd_mxu(x, mx))
got = timeit("fwd MXU 4-step", f_mxu, x)
print("fwd bit-exact:", np.array_equal(np.asarray(ref), np.asarray(got)))

i_unroll = jax.jit(lambda x: ntt.ntt_inv_unrolled(x, wi, wish, q, ninv, ninvsh))
refi = timeit("inv unrolled XLA", i_unroll, ref)
i_mxu = jax.jit(lambda x: mxu_ntt.ntt_inv_mxu(x, mx))
goti = timeit("inv MXU 4-step", i_mxu, ref)
print("inv bit-exact:", np.array_equal(np.asarray(refi), np.asarray(goti)))


# -- differential timing: chain K transforms inside ONE jit so the ~25 ms
# relay dispatch floor and D2H fetch cancel out ((t_K - t_1)/(K-1));
# returns a tiny in-jit slice to keep transfer constant
def diff_time(name, chain_fn, x, k1=1, k2=9, iters=6):
    fa = jax.jit(lambda v: chain_fn(v, k1))
    fb = jax.jit(lambda v: chain_fn(v, k2))
    np.asarray(fa(x)); np.asarray(fb(x))          # compile + force fetch
    ta = tb = 0.0
    for _ in range(iters):
        t0 = time.perf_counter(); np.asarray(fa(x)); ta += time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(fb(x)); tb += time.perf_counter() - t0
    per = (tb - ta) / iters / (k2 - k1)
    print(f"{name:28s} {per*1e3:8.3f} ms/op  ({per*1e6/L:7.2f} us/limb)  [differential]")
    return per


# the tiny return slice must depend on EVERY limb: a plain v[0, :8] lets
# XLA dead-code-eliminate the other L-1 limbs entirely (limbs are
# independent), silently measuring 1/L of the work
def chain_mxu_fwd(v, k):
    for _ in range(k):
        v = mxu_ntt.ntt_fwd_mxu(v, mx)
        v = mxu_ntt.ntt_inv_mxu(v, mx)   # alternate so values stay bounded
    return v[:, :8].sum(axis=0)


def chain_unroll_fwd(v, k):
    for _ in range(k):
        v = ntt.ntt_fwd_unrolled(v, w, wsh, q)
        v = ntt.ntt_inv_unrolled(v, wi, wish, q, ninv, ninvsh)
    return v[:, :8].sum(axis=0)


print("\n-- differential (fwd+inv pairs; divide by 2 for one transform) --")
diff_time("MXU 4-step fwd+inv pair", chain_mxu_fwd, x)
diff_time("unrolled XLA fwd+inv pair", chain_unroll_fwd, x)
