#!/usr/bin/env python
"""Benchmark: homomorphic AES round-step throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the recurring inner work of the AES-FHE pipeline on a SIMD-packed
ciphertext batch: AddRoundKey (plaintext round key, 16 pt-multiplies) +
full SubBytes (2D nibble LUT pair with hoisted relinearization), i.e. the
nibble-pair round step of aesfhe_tpu/pipeline.py.  slot_count/16 AES blocks
per evaluation (2048 at the default N=2^16 -- the reference's "2K blocks per
ciphertext" capacity, /root/reference/README.md:29).

vs_baseline: the reference publishes no numbers (BASELINE.md: README TOC stub
only; its CPU AddRoundKey was measured-but-unrecorded, its 256x256 XOR OOMs).
The recorded ratio is therefore this framework's TPU throughput over its own
CPU throughput on identical parameters -- the honest measurable proxy.

Env knobs:
  AESFHE_BENCH_LOGN     ring exponent (default 16)
  AESFHE_BENCH_LEVELS   depth (default 16)
  AESFHE_BENCH_ITERS    timed iterations (default 3)
  AESFHE_BENCH_SKIP_CPU skip CPU baseline leg (vs_baseline = 0)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _setup(logn: int, levels: int):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu.context import EngineContext
    from aesfhe_tpu.ops.xor_service import (EngineWrapper, XORService,
                                            CoefficientCache)
    from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer, NibblePair
    from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
    from aesfhe_tpu.coeffs.generate import COEFF_DIR

    keys_mod.seed_keygen(0)
    params = CKKSParams(n=1 << logn, max_level=levels, scale_bits=26,
                        num_special_primes=4)
    ctx = EngineContext(params=params)
    wrap = EngineWrapper(ctx=ctx)
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    hi2d = CoefficientCache(COEFF_DIR / "sbox_hi2d_coeffs.json")
    lo2d = CoefficientCache(COEFF_DIR / "sbox_lo2d_coeffs.json")
    sc = params.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = np.tile(rng.integers(0, 256, 16, dtype=np.uint8), sc // 16)
    k_hi, k_lo = split_nibbles(key)
    s_hi, s_lo = split_nibbles(state)
    ct_hi = ctx.encrypt(ZetaEncoder.to_zeta(s_hi, 16))
    ct_lo = ctx.encrypt(ZetaEncoder.to_zeta(s_lo, 16))

    def round_step(hi, lo):
        hi = xor_svc._xor_with_plain_nibbles(hi, k_hi)
        lo = xor_svc._xor_with_plain_nibbles(lo, k_lo)
        bh = xor_svc._build_power_basis(hi)
        bl = xor_svc._build_power_basis(lo)
        out_hi = tf._bilinear(bh, bl, hi2d.load_coeffs())
        out_lo = tf._bilinear(bh, bl, lo2d.load_coeffs())
        return out_hi, out_lo

    return round_step, (ct_hi, ct_lo), params, ctx


def run_leg(logn: int, levels: int, iters: int) -> float:
    import jax
    step, (ct_hi, ct_lo), params, ctx = _setup(logn, levels)
    out = step(ct_hi, ct_lo)                     # warm: compiles each op once
    jax.block_until_ready((out[0].data, out[1].data))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(ct_hi, ct_lo)
    jax.block_until_ready((out[0].data, out[1].data))
    dt = (time.perf_counter() - t0) / iters
    return (params.slot_count // 16) / dt


def main():
    logn = int(os.environ.get("AESFHE_BENCH_LOGN", "16"))
    levels = int(os.environ.get("AESFHE_BENCH_LEVELS", "16"))
    iters = int(os.environ.get("AESFHE_BENCH_ITERS", "3"))
    device_bps = run_leg(logn, levels, iters)
    vs = 0.0
    if not os.environ.get("AESFHE_BENCH_SKIP_CPU"):
        cache = f"/root/.cache/aesfhe_cpu_leg_{logn}_{levels}.json"
        cpu_bps = None
        if os.path.exists(cache):
            try:
                cpu_bps = float(json.loads(open(cache).read())["value"])
            except Exception:
                cpu_bps = None
        if cpu_bps is None:
            env = dict(os.environ)
            env["AESFHE_PLATFORM"] = "cpu"
            env["AESFHE_BENCH_CHILD"] = "1"
            env["AESFHE_BENCH_ITERS"] = "1"
            try:
                r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                   env=env, capture_output=True, text=True,
                                   timeout=5400)
                cpu_bps = float(json.loads(
                    r.stdout.strip().splitlines()[-1])["value"])
                os.makedirs("/root/.cache", exist_ok=True)
                open(cache, "w").write(json.dumps({"value": cpu_bps}))
            except Exception:
                cpu_bps = None
        vs = device_bps / cpu_bps if cpu_bps else 0.0
    blocks = (1 << logn) // 32
    print(json.dumps({
        "metric": "aes_fhe_ark_subbytes_round_step_blocks_per_s",
        "value": round(device_bps, 3),
        "unit": f"AES blocks/s ({blocks}-block SIMD ARK+SubBytes step)",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("AESFHE_BENCH_CHILD"):
        bps = run_leg(int(os.environ.get("AESFHE_BENCH_LOGN", "16")),
                      int(os.environ.get("AESFHE_BENCH_LEVELS", "16")),
                      int(os.environ.get("AESFHE_BENCH_ITERS", "1")))
        print(json.dumps({"metric": "cpu_leg", "value": bps, "unit": "",
                          "vs_baseline": 0.0}))
    else:
        main()
