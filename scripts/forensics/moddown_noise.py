"""Discriminate the rotation key-switch noise source: fused approximate
mod-down vs the exact (centered-lift) oracle.  If the fused conversion's
integer overshoot dominates, swapping it for the exact one collapses the
per-rotation noise.

Usage: python scripts/debug_moddown_noise.py [logn h spec L]
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
import jax.numpy as jnp

from aesfhe_tpu.core import keys as keys_mod, ops_impl
from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu.core.keys import gen_rotation_keys

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 10
h = int(sys.argv[2]) if len(sys.argv) > 2 else 192
spec = int(sys.argv[3]) if len(sys.argv) > 3 else 8
L = int(sys.argv[4]) if len(sys.argv) > 4 else 54

use_exact = os.environ.get("AESFHE_MD_EXACT") == "1"
if use_exact:
    fused = ops_impl._mod_down_specials

    def exact_nd(params, tabs, x, level):
        if x.ndim == 2:
            return ops_impl._mod_down_specials_exact(params, tabs, x, level)
        return jnp.stack([exact_nd(params, tabs, x[i], level)
                          for i in range(x.shape[0])])

    ops_impl._mod_down_specials = exact_nd

keys_mod.seed_keygen(0)
p = CKKSParams(n=1 << logn, max_level=L, scale_bits=27,
               num_special_primes=spec, secret_hamming=min(h, (1 << logn) // 4))
eng = Engine(p)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
rot = gen_rotation_keys(p, eng.tabs, sk, [3])
sc = p.slot_count
rng = np.random.default_rng(0)
v = rng.standard_normal(sc) + 1j * rng.standard_normal(sc)
ct = eng.encrypt(v, pk)
d0 = eng.decrypt(ct, sk)
rt = eng.rotate(ct, rot, 3)
d2 = eng.decrypt(rt, sk)
err = np.abs(d2 - np.roll(d0, 3))
print(f"n=2^{logn} spec={spec} dnum={p.dnum} moddown="
      f"{'exact' if use_exact else 'fused'}: rot_err max={err.max():.3e} "
      f"std={err.std():.3e}", flush=True)
