import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core import rns, ntt, mxu_ntt
print("device:", jax.devices()[0].device_kind, jax.devices()[0].platform)

n, L = 1 << 16, 21
primes = tuple(rns.find_ntt_primes(29, 2 * n, L))
tabs = ntt.NTTTables(n, primes)
rng = np.random.default_rng(0)
x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32) for q in primes]))
mx = {k: jnp.asarray(v) for k, v in mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}

def timeit(name, f, *a, iters=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(f(*a))
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")
    return r

A = 256
f8 = jnp.asarray(np.asarray(mx["f"]))                  # [L,5A,5A] int8
zd8 = jnp.asarray(rng.integers(-64, 64, (L, 5*A, A), dtype=np.int8))

def mm(zd):
    return jnp.einsum("lij,ljk->lik", f8, zd, preferred_element_type=jnp.int32)
def mm8(zd):
    o = zd
    for _ in range(8):
        s = jnp.einsum("lij,ljk->lik", f8, o, preferred_element_type=jnp.int32)
        o = (s & 127).astype(jnp.int8)
    return o
timeit("1x int8 matmul [L,5A,5A]@[L,5A,A]", jax.jit(mm), zd8)
timeit("8x int8 matmul chained", jax.jit(mm8), zd8)

def digits8(x):
    o = x
    for _ in range(8):
        d = mxu_ntt._digits_dev(o.reshape(L, A, A))
        o = (jnp.abs(d.astype(jnp.int32)).sum(-3).astype(jnp.uint32)).reshape(L, n)
    return o
timeit("8x digit-decompose only", jax.jit(digits8), x)

# combine cost
s_parts = jnp.asarray(rng.integers(-5_000_000, 5_000_000, (L, 5, A, A), dtype=np.int32))
def comb8(s):
    o = s
    for _ in range(8):
        c = mxu_ntt._combine(o, mx, mx["q"])
        o = s + c[:, None, :, :].astype(jnp.int32)
    return o
timeit("8x combine only", jax.jit(comb8), s_parts)

# bf16 matmul alternative
f16 = f8.astype(jnp.bfloat16)
zd16 = zd8.astype(jnp.bfloat16)
def mmb(zd):
    return jnp.einsum("lij,ljk->lik", f16, zd, preferred_element_type=jnp.float32)
def mmb8(zd):
    o = zd
    for _ in range(8):
        s = jnp.einsum("lij,ljk->lik", f16, o, preferred_element_type=jnp.float32)
        o = (s * (1.0/65536.0)).astype(jnp.bfloat16)
    return o
timeit("8x bf16 matmul chained", jax.jit(mmb8), zd16)
