"""Debug: per-stage noise margins of one zeta nibble-pair AES round on the
deep profile (mirrors tests/test_pipeline.py::test_one_full_round)."""
import os
import sys

os.environ.setdefault("AESFHE_TEST_PLATFORM", "cpu")
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
from aesfhe_tpu.pipeline import AESFHE128
from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from tests.aes_oracle import aes128_partial

keys_mod.seed_keygen(0)
eng = Engine(get_params("deep",
                        scale_bits=int(os.environ.get("DBG_SCALE", "27"))))
cache_dir = os.environ.get("AESFHE_KEY_CACHE", "/root/.cache/aesfhe_keys")
if cache_dir:
    from aesfhe_tpu.utils.serialization import cached_key_family
    fam = cached_key_family(eng, cache_dir)
else:
    sk = eng.create_secret_key()
    fam = dict(secret=sk, public=eng.create_public_key(sk),
               relin=eng.create_relinearization_key(sk),
               conj=eng.create_conjugation_key(sk),
               rotation=eng.create_rotation_key(sk))

E = dict(eng=eng, sk=fam["secret"], pk=fam["public"], rlk=fam["relin"],
         conj=fam["conj"], rot=fam["rotation"])


from tests.test_xor_service import _CtxShim


wrap = EngineWrapper(ctx=_CtxShim(E))
xor_svc = XORService(wrap)
tf = AESFHETransformer(wrap, xor_svc)
sr = AESFHEShiftRows(wrap, xor_svc)
KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
aes = AESFHE128(wrap, xor_svc, tf, sr, KEY)

sc = eng.slot_count
rng = np.random.default_rng(0)
state = rng.integers(0, 256, sc, dtype=np.uint8)


def margin(pair, tag, want_bytes):
    """Worst phase distance to the nearest zeta16 lattice point, and
    mismatch count vs expected bytes."""
    out = []
    for name, ct in (("hi", pair.hi), ("lo", pair.lo)):
        v = wrap.decrypt(ct)
        ph = np.angle(v) * 16 / (2 * np.pi)
        err = np.abs(ph - np.round(ph))
        mag = np.abs(np.abs(v) - 1.0)
        out.append((name, float(err.max()), float(mag.max()), ct.level))
    got = aes.decrypt_state(pair)
    bad = int((got != want_bytes).sum())
    print(f"{tag:28s} bad={bad:5d}  " + "  ".join(
        f"{n}: phase_err={p:.4f} mag_err={m:.4f} lvl={l}"
        for n, p, m, l in out))
    return got


def oracle_stage(fn):
    return np.concatenate([fn(state[b:b + 16]) for b in range(0, sc, 16)])


from tests.aes_oracle import shift_rows as o_sr, mix_columns as o_mix
from aesfhe_tpu.coeffs.generate import AES_SBOX

k0 = np.frombuffer(KEY, dtype=np.uint8)
s0 = state ^ np.tile(k0, sc // 16)
s1 = AES_SBOX[s0]
s2 = np.concatenate([o_mix(o_sr(s1[b:b + 16])) for b in range(0, sc, 16)])
rk1 = aes.round_keys[1]
s3 = s2 ^ np.tile(rk1, sc // 16)

pair = aes.encrypt_state(state)
pair = aes.add_round_key(pair, 0)
margin(pair, "after ARK0", s0)
pair = aes.sub_bytes(pair)
margin(pair, "after SubBytes+cleanse", s1)
pair = aes.shift_mix(pair)
margin(pair, "after shift_mix", s2)
pair = aes.add_round_key(pair, 1)
got = margin(pair, "after ARK1", s3)

want = np.concatenate([aes128_partial(state[b:b + 16], KEY, rounds=1)
                       for b in range(0, sc, 16)])
print("final mismatches vs oracle:", int((got != want).sum()), "/", sc)
