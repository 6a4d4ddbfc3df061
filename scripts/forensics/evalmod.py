"""EvalMod-internal forensics: decrypt the Chebyshev ladder pieces against
host T_k(u) = cos(k*arccos(u)) and print tracked scales/levels, on a clean
synthetic input (skips the CTS front half for fast iteration).

Usage: [AESFHE_DEBUG_PLATFORM=axon] python scripts/debug_evalmod.py [logn]
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("AESFHE_DEBUG_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu import bootstrap as bs

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16

keys_mod.seed_keygen(0)
p = CKKSParams(n=1 << logn, max_level=54, scale_bits=27,
               num_special_primes=8, secret_hamming=min(192, (1 << logn) // 4))
print("primes[:6]:", [f"{q/2**27:.4f}" for q in p.q_primes[:6]],
      "(units of 2^27)")
eng = Engine(p)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
rlk = eng.create_relinearization_key(sk)
sc = p.slot_count
q0 = int(p.q_primes[0])
delta = p.scale

# synthetic EvalMod input: real u in [-0.7, 0.7] at the level CTS leaves
rng = np.random.default_rng(0)
u_host = rng.uniform(-0.7, 0.7, sc)
bk = bs.BootstrapKey(small=False, K=1.5 * np.sqrt(192) + 4, cheb_deg=126,
                     double_angles=1, hi_prec=True, prescale=1.0)
HS = bk.hi_scale
ct = eng.encrypt(u_host.astype(np.complex128), pk)
ct = eng._drop(ct, 47)                       # ~ the level CTS leaves
# lift onto the hi scale like the real pipeline (exact 2^27 constant)
ct = eng._mul_scalar(ct, 1.0, HS)
print(f"input: scale=2^{np.log2(ct.scale):.3f} lvl={ct.level} "
      f"err={np.abs(eng.decrypt(ct, sk) - u_host).max():.3e}")


def mul(a, b):
    t = eng.multiply(a, b, rlk)
    return eng._rescale(t)


# Chebyshev ladder T_2^j
T = {1: ct}
g = 1
acos = np.arccos(np.clip(u_host, -1, 1))
while g * 2 <= bk.cheb_deg:
    g *= 2
    k = g // 2
    t = mul(T[k], T[k])
    t = eng.add(t, t)
    T[g] = eng.add_plain(t, -1.0)
    d = eng.decrypt(T[g], sk)
    exp = np.cos(g * acos)
    print(f"T_{g:3d}: err={np.abs(d - exp).max():.3e} "
          f"scale=2^{np.log2(T[g].scale):.3f} lvl={T[g].level}", flush=True)

# full PS eval of cos(theta_max * u)
_, b_shift, theta_max = bs.eval_mod_scales(bk, q0, delta)
coeffs = bs._chebyshev_coeffs(lambda v: np.cos(theta_max * v), bk.cheb_deg)
y = bs._cheb_eval_ps(eng, coeffs, ct, rlk, hi=True)
d = eng.decrypt(y, sk)
exp = np.cos(theta_max * u_host)
print(f"cheb_ps: err={np.abs(d - exp).max():.3e} "
      f"scale=2^{np.log2(y.scale):.3f} lvl={y.level}")
