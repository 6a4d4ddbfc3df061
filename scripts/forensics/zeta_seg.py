"""Per-stage error forensics for the segment-refreshed zeta pipeline on the
prod-shaped chain (n=2^10, L=54, h=192, hi_prec) -- finds where the 3-round
evaluation loses exactness (debug-with-secret-key; see SURVEY.md section 5).

Usage: JAX_PLATFORMS=cpu python scripts/debug_zeta_seg.py [rounds]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", os.environ.get("AESFHE_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu import bootstrap as bs
from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer, NibblePair
from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from aesfhe_tpu.pipeline import AESFHE128
from aesfhe_tpu.ops.zeta import ZetaEncoder

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


keys_mod.seed_keygen(0)
params = CKKSParams(n=1 << 10, max_level=54, scale_bits=27,
                    num_special_primes=8, secret_hamming=192)
eng = Engine(params, use_bootstrap=True)
sk = eng.create_secret_key()


class S:
    engine = eng
    secret_key = sk
    public_key = eng.create_public_key(sk)
    relinearization_key = eng.create_relinearization_key(sk)
    conjugation_key = eng.create_conjugation_key(sk)
    rotation_key = eng.create_rotation_key(sk)
    bootstrap_key = bs.create_bootstrap_key(eng, sk, hi_prec=True)
    small_bootstrap_key = None


t("keys ready")
wrap = EngineWrapper(ctx=S())
xor_svc = XORService(wrap)
tf = AESFHETransformer(wrap, xor_svc)
sr = AESFHEShiftRows(wrap, xor_svc)
key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
aes = AESFHE128(wrap, xor_svc, tf, sr, key, refresh=wrap.bootstrap)
aes.segment_refresh = True
aes.post_boot_cleanses = int(os.environ.get("AESFHE_SEG_CLEANSES", "2"))


def probe(tag, pair):
    """Max distance to the nearest zeta16 point + worst decode margin."""
    for name, ct in (("hi", pair.hi), ("lo", pair.lo)):
        d = eng.decrypt(ct, sk)
        ang = np.round(np.angle(d) / (-2 * np.pi / 16)).astype(int) % 16
        z = np.exp(-2j * np.pi * ang / 16)
        err = np.max(np.abs(d - z))
        t(f"  {tag}.{name}: lvl {ct.level:2d} err {err:.2e}")


# instrument the refresh to report bootstrap error contribution
raw_refresh = aes.refresh
n_boot = [0]


def counting_refresh(ct):
    n_boot[0] += 1
    return raw_refresh(ct)


aes.refresh = counting_refresh

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sc = params.slot_count
rng = np.random.default_rng(11)
state = rng.integers(0, 256, sc, dtype=np.uint8)
pair = aes.encrypt_state(state)

from tests.aes_oracle import aes128_partial
from aesfhe_tpu.keyexp import expand_key_128
from aesfhe_tpu.ops.zeta import split_nibbles

pair = aes.add_round_key(pair, 0)
probe("ARK0", pair)
for r in range(1, rounds + 1):
    pair = aes._refresh(pair, aes.SEG_STAGE_DEPTH)
    probe(f"r{r}.refreshed", pair)
    pair = aes.sub_bytes(pair, cleanse=False)
    probe(f"r{r}.subbytes", pair)
    pair = aes.shift_mix(pair)
    probe(f"r{r}.shiftmix", pair)
    pair = aes._refresh(pair, aes.SEG_STAGE_DEPTH)
    pair = aes.add_round_key(pair, r)
    probe(f"r{r}.ark", pair)
    got = aes.decrypt_state(pair)
    want = np.concatenate([aes128_partial(state[b:b + 16], key, r)
                           for b in range(0, sc, 16)])
    bad = int(np.sum(got != want))
    t(f"round {r}: decode mismatches {bad}/{sc}  (bootstraps so far "
      f"{n_boot[0]})")
t("done")
