"""Bisect the prod_boot bootstrap failure: sweep ring size n while holding
every other prod_boot knob fixed (h=192, 8 specials, Delta=2^27, L=54).
The N=2^16 probe decodes garbage (err ~2e4) while boot_tiny (N=2^9, h=16,
4 specials) is accurate; this isolates which knob breaks it.

Usage: python scripts/debug_boot_scale.py [logn ...]   (default 10 11 12)
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
from aesfhe_tpu.ops.zeta import ZetaEncoder

logns = [int(a) for a in sys.argv[1:]] or [10, 11, 12]
for logn in logns:
    keys_mod.seed_keygen(0)
    h = int(os.environ.get("AESFHE_DEBUG_H", "192"))
    p = CKKSParams(n=1 << logn, max_level=54, scale_bits=27,
                   num_special_primes=8,
                   secret_hamming=min(h, (1 << logn) // 4))
    eng = Engine(p, use_bootstrap=True)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    rlk = eng.create_relinearization_key(sk)
    conj = eng.create_conjugation_key(sk)
    bk = eng.create_bootstrap_key(sk)
    if os.environ.get("AESFHE_BOOT_HIPREC"):
        bk.hi_prec = os.environ["AESFHE_BOOT_HIPREC"] == "1"
        bk.prescale = 1.0 if bk.hi_prec else 16.0
    sc = p.slot_count
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 16, sc, dtype=np.uint8)
    z = ZetaEncoder.to_zeta(vals, 16)
    ct = eng.encrypt(z, pk)
    low = eng._drop(ct, 0)
    out = eng.bootstrap(low, rlk, conj, bk)
    d = eng.decrypt(out, sk)
    err = np.max(np.abs(d - z))
    ok = np.array_equal(ZetaEncoder.from_zeta(d, 16), vals)
    print(f"logn={logn} h={p.secret_hamming} K={bk.K:.1f} deg={bk.cheb_deg} "
          f"da={bk.double_angles} nrot={len(bk.rot.keys)} "
          f"out_lvl={out.level} err={err:.5g} ok={ok}", flush=True)
