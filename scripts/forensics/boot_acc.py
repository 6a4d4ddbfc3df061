"""Is the bootstrap residual approximation- or noise-dominated?
Scan Chebyshev degree / double-angle count on boot_tiny."""
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
from aesfhe_tpu.ops.xor_service import XORConfig, EngineWrapper
from aesfhe_tpu.ops.zeta import ZetaEncoder

keys_mod.seed_keygen(0)
cfg = XORConfig(profile="boot_tiny", use_bootstrap=True)
wrap = EngineWrapper(cfg)
eng = wrap.engine
sc = eng.slot_count
rng = np.random.default_rng(3)
vals = rng.integers(0, 16, sc, dtype=np.uint8)
z = ZetaEncoder.to_zeta(vals, 16)
ct = eng._drop(wrap.encrypt(z), 2)

bk = wrap.boot_key
base_deg = bk.cheb_deg
for deg in (base_deg, base_deg + 30, base_deg + 60, base_deg + 120):
    bk.cheb_deg = deg
    out = eng.bootstrap(ct, wrap.relin_key, wrap.conj_key, bk)
    dec = wrap.decrypt(out)
    err = np.abs(dec - z).max()
    ph = np.angle(dec) * 16 / (2 * np.pi)
    perr = np.abs(ph - np.round(ph)).max()
    print(f"deg={deg:4d} da={bk.double_angles} out_lvl={out.level} "
          f"abs_err={err:.5f} phase_err={perr:.5f}", flush=True)
bk.cheb_deg = base_deg
