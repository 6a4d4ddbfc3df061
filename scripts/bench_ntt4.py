import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L, A = 21, 256
rng = np.random.default_rng(0)
f8 = jnp.asarray(rng.integers(-64, 64, (L, 5*A, 5*A), dtype=np.int8))
zd8 = jnp.asarray(rng.integers(-64, 64, (L, 5*A, A), dtype=np.int8))

def timeit(name, f, *a, iters=10):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.block_until_ready(f(*a))
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")
    return r

def mk(k):
    def f(F, zd):
        o = zd
        for _ in range(k):
            s = jnp.einsum("lij,ljk->lik", F, o, preferred_element_type=jnp.int32)
            o = (s & 127).astype(jnp.int8)
        return o
    return jax.jit(f)

for k in (1, 2, 4, 16):
    timeit(f"{k}x int8 matmul (args)", mk(k), f8, zd8)

# HLO inspect
lowered = jax.jit(lambda F, z: jnp.einsum("lij,ljk->lik", F, z, preferred_element_type=jnp.int32)).lower(f8, zd8)
comp = lowered.compile()
txt = comp.as_text()
import re
for line in txt.splitlines():
    if "dot" in line or "convolution" in line or "convert" in line:
        print(line.strip()[:160])
