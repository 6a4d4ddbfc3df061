"""Command-line entry: `python -m aesfhe_tpu <cmd>`.

The reference has no CLI or config system (constructor-arg configs only,
SURVEY.md section 5); this provides the single-dataclass-config + CLI entry
the TPU build standardizes on.

Commands:
  gen-coeffs                regenerate every LUT coefficient JSON
  keygen --profile P OUT    generate + serialize a key family
  demo-xor [--profile P]    end-to-end homomorphic 4-bit XOR demo
  demo-aes [--rounds R]     homomorphic AES-128 rounds vs the plain oracle
  bench                     run the benchmark harness (one JSON line)
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def cmd_gen_coeffs(args):
    from .coeffs import generate
    for name, path in generate.generate_all().items():
        print(name, "->", path)


def cmd_keygen(args):
    from .core import keys as keys_mod
    from .core.params import get_params
    from .context import EngineContext
    from .utils.serialization import save_keys
    keys_mod.seed_keygen(args.seed)
    t0 = time.perf_counter()
    ctx = EngineContext(params=get_params(args.profile))
    save_keys(args.out, secret=ctx.secret_key, public=ctx.public_key,
              relin=ctx.relinearization_key, conj=ctx.conjugation_key,
              rotation=ctx.rotation_key)
    print(f"keygen+serialize ({args.profile}) -> {args.out} "
          f"[{time.perf_counter() - t0:.1f}s]")


def cmd_demo_xor(args):
    from .core import keys as keys_mod
    from .ops.xor_service import XORConfig, EngineWrapper, XORService
    keys_mod.seed_keygen(args.seed)
    eng = EngineWrapper(XORConfig(profile=args.profile))
    svc = XORService(eng)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 16, 512, dtype=np.uint8)
    b = rng.integers(0, 16, 512, dtype=np.uint8)
    t0 = time.perf_counter()
    out = svc.xor(a, b)
    ok = np.array_equal(out, a ^ b)
    print(f"homomorphic 4-bit XOR x512: correct={ok} "
          f"[{time.perf_counter() - t0:.1f}s]")
    sys.exit(0 if ok else 1)


def cmd_demo_aes(args):
    from .core import keys as keys_mod
    from .core.params import get_params
    from .context import EngineContext
    from .ops.xor_service import XORConfig, EngineWrapper, XORService
    from .ops.mixcolumns_service import AESFHETransformer
    from .ops.shiftrows_service import AESFHEShiftRows
    from .pipeline import AESFHE128, AESFHE128Bitsliced
    keys_mod.seed_keygen(args.seed)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    if args.pipeline == "bitsliced":
        wrap = EngineWrapper(XORConfig(profile=args.profile,
                                       use_bootstrap=args.bootstrap))
        ctx = wrap.ctx
        refresh = wrap.bootstrap if args.bootstrap else None
        aes = AESFHE128Bitsliced(wrap, key, refresh=refresh)
    else:
        ctx = EngineContext(params=get_params(args.profile))
        wrap = EngineWrapper(ctx=ctx)
        xor_svc = XORService(wrap)
        aes = AESFHE128(wrap, xor_svc, AESFHETransformer(wrap, xor_svc),
                        AESFHEShiftRows(wrap, xor_svc), key)
    sc = ctx.engine.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = aes.encrypt_state(state)
    t0 = time.perf_counter()
    out_pair = aes.encrypt_rounds(pair, rounds=args.rounds)
    got = aes.decrypt_state(out_pair)
    dt = time.perf_counter() - t0
    sys.path.insert(0, ".")
    from tests.aes_oracle import aes128_partial
    want = np.concatenate([
        aes128_partial(state[b:b + 16], key, rounds=args.rounds)
        for b in range(0, sc, 16)])
    ok = np.array_equal(got, want)
    print(f"AES-128 x{args.rounds} round(s), {sc // 16} blocks: correct={ok} "
          f"[{dt:.1f}s]  ops={dict(ctx.engine.counters)}")
    sys.exit(0 if ok else 1)


def cmd_bench(args):
    import runpy
    import os
    runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"), run_name="__main__")


def main():
    ap = argparse.ArgumentParser(prog="aesfhe_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("gen-coeffs").set_defaults(fn=cmd_gen_coeffs)
    p = sub.add_parser("keygen")
    p.add_argument("out")
    p.add_argument("--profile", default="test")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_keygen)
    p = sub.add_parser("demo-xor")
    p.add_argument("--profile", default="tiny")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_demo_xor)
    p = sub.add_parser("demo-aes")
    p.add_argument("--profile", default="deep")
    p.add_argument("--rounds", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pipeline", choices=("zeta", "bitsliced"),
                   default="zeta")
    p.add_argument("--bootstrap", action="store_true",
                   help="refresh between rounds (bootstrap-capable profile)")
    p.set_defaults(fn=cmd_demo_aes)
    sub.add_parser("bench").set_defaults(fn=cmd_bench)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
