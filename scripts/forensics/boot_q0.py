"""Bootstrap residual vs q0 size (boot_tiny with first_prime_bits override)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.params import get_params
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu.ops.zeta import ZetaEncoder

fp = int(os.environ.get("DBG_Q0_BITS", "31"))
keys_mod.seed_keygen(0)
eng = Engine(get_params("boot_tiny", first_prime_bits=fp), use_bootstrap=True)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
rlk = eng.create_relinearization_key(sk)
conj = eng.create_conjugation_key(sk)
bk = eng.create_bootstrap_key(sk)

sc = eng.slot_count
rng = np.random.default_rng(3)
vals = rng.integers(0, 16, sc, dtype=np.uint8)
z = ZetaEncoder.to_zeta(vals, 16)
ct = eng._drop(eng.encrypt(z, pk), 2)

out = eng.bootstrap(ct, rlk, conj, bk)
dec = eng.decrypt(out, sk)
print(f"q0_bits={fp} boot abs_err={np.abs(dec - z).max():.5f} "
      f"out_lvl={out.level}", flush=True)

# cleanse convergence
from aesfhe_tpu.ops.xor_service import XORService, EngineWrapper
from tests.test_xor_service import _CtxShim
E = dict(eng=eng, sk=sk, pk=pk, rlk=rlk, conj=conj, rot=eng.create_rotation_key(sk))
wrap = EngineWrapper(ctx=_CtxShim(E))
svc = XORService(wrap)
cur = out
for i in range(3):
    cur = svc.cleanse(cur)
    dec = eng.decrypt(cur, sk)
    print(f"cleanse x{i+1}: abs_err={np.abs(dec - z).max():.6f} "
          f"lvl={cur.level} scale={cur.scale:.4e}", flush=True)
