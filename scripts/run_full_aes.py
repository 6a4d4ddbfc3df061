#!/usr/bin/env python
"""Full homomorphic AES-128 with bootstrapping between rounds.

The capability the reference never reached: its pipeline stops at
AddRoundKey (/root/reference/new.py:186-227) and leans on desilofhe's
bootstrap for everything deeper.  Here: nibble-pair rounds + our CKKS
bootstrap as the refresh hook, so arbitrarily many rounds fit the chain.

Usage:
  PYTHONPATH=. python scripts/run_full_aes.py [--rounds 10] [--logn 12]
  (run on TPU: keep /root/.axon_site on PYTHONPATH; CPU: AESFHE_PLATFORM=cpu)

Bootstrappable profile: single-prime rescale, 30-bit q0 (epsilon = Delta/q0 =
2^-3 for EvalMod), sparse secret h=64.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--logn", type=int, default=12)
    ap.add_argument("--levels", type=int, default=40)
    ap.add_argument("--blocks", type=int, default=0,
                    help="limit checked blocks (0 = all packed)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.context import EngineContext
    from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
    from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
    from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
    from aesfhe_tpu.pipeline import AESFHE128
    from tests.aes_oracle import aes128_partial

    keys_mod.seed_keygen(0)
    t0 = time.perf_counter()
    params = CKKSParams(n=1 << args.logn, max_level=args.levels,
                        scale_bits=27, num_special_primes=6,
                        secret_hamming=64)
    ctx = EngineContext(params=params, use_bootstrap=True)
    wrap = EngineWrapper(ctx=ctx)
    print(f"keygen (incl. bootstrap keys): {time.perf_counter() - t0:.0f}s",
          flush=True)
    xor_svc = XORService(wrap)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    aes = AESFHE128(wrap, xor_svc, AESFHETransformer(wrap, xor_svc),
                    AESFHEShiftRows(wrap, xor_svc), key,
                    refresh=wrap.bootstrap)
    sc = ctx.engine.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = aes.encrypt_state(state)
    t0 = time.perf_counter()
    out = aes.encrypt_rounds(pair, rounds=args.rounds)
    dt = time.perf_counter() - t0
    got = aes.decrypt_state(out)
    want = np.concatenate([aes128_partial(state[b:b + 16], key, args.rounds)
                           for b in range(0, sc, 16)])
    nb = args.blocks * 16 if args.blocks else sc
    ok = np.array_equal(got[:nb], want[:nb])
    print(f"AES-128 x{args.rounds} rounds, {sc // 16} blocks: correct={ok} "
          f"in {dt:.0f}s ({sc // 16 / dt:.1f} blocks/s)  "
          f"ops={dict(ctx.engine.counters)}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
