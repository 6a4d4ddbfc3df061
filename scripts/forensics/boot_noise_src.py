"""Isolate the per-op noise that breaks the prod-shaped bootstrap: measure
multiply_plain (dense diagonal) and hoisted-rotation errors separately, at
two value magnitudes (x1, x16), at prod-shaped params on a small ring.
Additive (key-switch/mod-down) noise stays constant across magnitudes;
multiplicative (encoding-rounding) noise scales with the value.
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

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 10
h = int(sys.argv[2]) if len(sys.argv) > 2 else 192
spec = int(sys.argv[3]) if len(sys.argv) > 3 else 8
L = int(sys.argv[4]) if len(sys.argv) > 4 else 54
keys_mod.seed_keygen(0)
p = CKKSParams(n=1 << logn, max_level=L, scale_bits=27,
               num_special_primes=spec, secret_hamming=min(h, (1 << logn) // 4))
print(f"n=2^{logn} h={p.secret_hamming} spec={spec} L={L} dnum={p.dnum}")
eng = Engine(p, use_bootstrap=True)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
sc = p.slot_count
rng = np.random.default_rng(0)

from aesfhe_tpu.core.keys import gen_rotation_keys
rot = gen_rotation_keys(p, eng.tabs, sk, [1, 3, 7])

base = rng.standard_normal(sc) + 1j * rng.standard_normal(sc)
diag = np.exp(1j * rng.uniform(0, 2 * np.pi, sc)) * 0.17    # group-like entries

for mag in (1.0, 16.0):
    v = base * mag
    ct = eng.encrypt(v, pk)
    d0 = eng.decrypt(ct, sk)
    enc_err = np.abs(d0 - v).max()
    # fresh-encrypt noise
    # multiply_plain with dense diagonal
    pt = eng.encode(diag, level=ct.level)
    mp = eng.multiply_plain(ct, pt)
    d1 = eng.decrypt(mp, sk)
    mp_err = np.abs(d1 - d0 * diag).max()
    # plain rotation (full key-switch)
    rt = eng.rotate(ct, rot, 3)
    d2 = eng.decrypt(rt, sk)
    rot_err = np.abs(d2 - np.roll(d0, 3)).max()
    # hoisted rotations
    hs = eng.hoisted_rotations(ct, rot, [1, 3, 7])
    d3 = eng.decrypt(hs[1], sk)
    hrot_err = np.abs(d3 - np.roll(d0, 3)).max()
    # scalar multiply
    sm = eng.multiply(ct, 0.1234567)
    d4 = eng.decrypt(sm, sk)
    sm_err = np.abs(d4 - d0 * 0.1234567).max()
    print(f"mag={mag:4g}: enc={enc_err:.3e} mul_plain={mp_err:.3e} "
          f"rot={rot_err:.3e} hoisted_rot={hrot_err:.3e} "
          f"scalar_mul={sm_err:.3e}", flush=True)
