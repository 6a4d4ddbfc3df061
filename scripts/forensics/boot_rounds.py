"""Debug: per-stage noise margins of the bootstrapped zeta pipeline on
boot_tiny (mirrors tests/test_pipeline.py::test_three_rounds_with_bootstrap)."""
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
from aesfhe_tpu.pipeline import AESFHE128
from aesfhe_tpu.ops.xor_service import (XORConfig, EngineWrapper, XORService)
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from aesfhe_tpu.coeffs.generate import AES_SBOX
from tests.aes_oracle import shift_rows as o_sr, mix_columns as o_mix

keys_mod.seed_keygen(0)
cfg = XORConfig(profile="boot_tiny", use_bootstrap=True)
wrap = EngineWrapper(cfg)
xor_svc = XORService(wrap)
tf = AESFHETransformer(wrap, xor_svc)
sr = AESFHEShiftRows(wrap, xor_svc)
KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
aes = AESFHE128(wrap, xor_svc, tf, sr, KEY, refresh=wrap.bootstrap)

eng = wrap.engine
sc = eng.slot_count
rng = np.random.default_rng(7)
state = rng.integers(0, 256, sc, dtype=np.uint8)


def margin(pair, tag, want_bytes):
    out = []
    for name, ct in (("hi", pair.hi), ("lo", pair.lo)):
        v = wrap.decrypt(ct)
        ph = np.angle(v) * 16 / (2 * np.pi)
        err = np.abs(ph - np.round(ph))
        out.append((name, float(err.max()), ct.level))
    got = aes.decrypt_state(pair)
    bad = int((got != want_bytes).sum())
    print(f"{tag:24s} bad={bad:4d}  " + "  ".join(
        f"{n}: phase_err={p:.4f} lvl={l}" for n, p, l in out), flush=True)


def oracle_round(s, r):
    s = AES_SBOX[s]
    out = np.concatenate([o_mix(o_sr(s[b:b + 16])) for b in range(0, sc, 16)])
    return out ^ np.tile(aes.round_keys[r], sc // 16)


want = state ^ np.tile(aes.round_keys[0], sc // 16)
pair = aes.encrypt_state(state)
pair = aes.add_round_key(pair, 0)
margin(pair, "ARK0", want)
for r in range(1, 4):
    pair = aes._refresh(pair, aes.SUB_DEPTH)
    margin(pair, f"r{r} refresh(sub)", want)
    pair = aes.sub_bytes(pair)
    s_after_sub = AES_SBOX[want]
    margin(pair, f"r{r} sub_bytes", s_after_sub)
    pair = aes._refresh(pair, aes.MIX_DEPTH)
    margin(pair, f"r{r} refresh(mix)", s_after_sub)
    pair = aes.shift_mix(pair)
    s_after_mix = np.concatenate([
        o_mix(o_sr(s_after_sub[b:b + 16])) for b in range(0, sc, 16)])
    margin(pair, f"r{r} shift_mix", s_after_mix)
    pair = aes._refresh(pair, aes.ARK_DEPTH)
    pair = aes.add_round_key(pair, r)
    want = s_after_mix ^ np.tile(aes.round_keys[r], sc // 16)
    margin(pair, f"r{r} ARK", want)
