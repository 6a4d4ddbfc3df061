"""Keyswitch/rescale timing with MXU NTT on vs off (TPU).

Chains K ops inside one jit and returns a tiny slice, so tunnel transfer
and dispatch overhead are excluded (differential: (t_K - t_1)/(K-1))."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from aesfhe_tpu.core.params import get_params
from aesfhe_tpu.core import ops_impl, keys as keys_mod
from aesfhe_tpu.core.engine import Engine

p = get_params("prod")
keys_mod.seed_keygen(0)
eng = Engine(p)
print("mxu:", eng.tabs.mxu is not None)
sk = eng.create_secret_key()
rlk = eng.create_relinearization_key(sk)
lvl = 20
rng = np.random.default_rng(0)
c = jnp.asarray(np.stack([rng.integers(0, int(q), p.n, dtype=np.uint32)
                          for q in p.q_primes[:lvl+1]]))

def measure(name, mk, k1=1, k2=4, iters=4):
    # tabs/keys passed as jit ARGS: closure capture would embed the MXU
    # tables as constants in the serialized module (HTTP 413 on the relay)
    fa, fb = jax.jit(mk(k1)), jax.jit(mk(k2))
    T = eng.tabs
    args = (c, T, rlk.b, rlk.a) if 'keyswitch' in name else (c, T)
    np.asarray(fa(*args)); np.asarray(fb(*args))
    ta = tb = 0.0
    for _ in range(iters):
        t0 = time.perf_counter(); np.asarray(fa(*args)); ta += time.perf_counter()-t0
        t0 = time.perf_counter(); np.asarray(fb(*args)); tb += time.perf_counter()-t0
    print(f"{name:30s} {(tb-ta)/iters/(k2-k1)*1e3:8.2f} ms/op")

# the tiny return must keep EVERY output alive: discarding the `a` half or
# slicing one limb lets XLA dead-code-eliminate that share of the kernel
# (the a-side inner products + mod-down, or L-1 of the rescale limbs),
# silently under-measuring
def mk_ks(k):
    def f(c, tabs, kb, ka):
        x = c
        for _ in range(k):
            b, a = ops_impl.keyswitch(p, tabs, x, kb, ka)
            x = jnp.bitwise_xor(b, a)    # keep both outputs alive
        return x[:, :8].sum(axis=0)
    return f


def mk_rescale2(k):
    def f(c, tabs):
        x = jnp.stack([c, c])
        acc = jnp.zeros((8,), jnp.uint32)
        for i in range(k):
            y = ops_impl.ct_rescale(p, tabs, x + jnp.uint32(i))
            acc = acc + y[:, :, :8].sum(axis=(0, 1))
        return acc
    return f

measure("keyswitch (lvl 20, dnum 6)", mk_ks)
measure("rescale [2,21,N]", mk_rescale2)
