"""Does merged shift-mix degrade when run low in the boot_tiny chain?
Fresh (non-bootstrapped) inputs dropped to various start levels."""
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
from aesfhe_tpu.ops.xor_service import (XORConfig, EngineWrapper, XORService)
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer, NibblePair
from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
from tests.aes_oracle import shift_rows as o_sr, mix_columns as o_mix

keys_mod.seed_keygen(0)
cfg = XORConfig(profile="boot_tiny", use_bootstrap=False)
wrap = EngineWrapper(cfg)
xor_svc = XORService(wrap)
tf = AESFHETransformer(wrap, xor_svc)
eng = wrap.engine
sc = eng.slot_count
rng = np.random.default_rng(7)
state = rng.integers(0, 256, sc, dtype=np.uint8)
want = np.concatenate([o_mix(o_sr(state[b:b + 16]))
                       for b in range(0, sc, 16)])
w_hi, w_lo = split_nibbles(want)
s_hi, s_lo = split_nibbles(state)

for start in (int(x) for x in
              os.environ.get("DBG_LEVELS", "55,40,28,26").split(",")):
    hi = eng._drop(wrap.encrypt(ZetaEncoder.to_zeta(s_hi, 16)), start)
    lo = eng._drop(wrap.encrypt(ZetaEncoder.to_zeta(s_lo, 16)), start)
    pair = tf.merged_shift_mix_pairs(NibblePair(hi, lo))
    res = []
    for name, ct, wv in (("hi", pair.hi, w_hi), ("lo", pair.lo, w_lo)):
        v = wrap.decrypt(ct)
        ph = np.angle(v) * 16 / (2 * np.pi)
        err = np.abs(ph - np.round(ph)).max()
        got = ZetaEncoder.from_zeta(v, 16)
        bad = int((got != wv).sum())
        res.append(f"{name}: err={err:.4f} bad={bad} out_lvl={ct.level}")
    print(f"start_lvl={start:2d}  " + "  ".join(res), flush=True)
