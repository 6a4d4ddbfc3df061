#!/usr/bin/env python
"""Benchmark: homomorphic AES round-step throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: AES blocks/sec for one homomorphic ARK+SubBytes round step
(AddRoundKey with plaintext round key + full SubBytes via 2D nibble LUTs) on
a SIMD-packed ciphertext -- the innermost recurring work of the pipeline.

vs_baseline: the reference publishes no numbers (BASELINE.md); its CPU
AddRoundKey wall-clock was measured-but-unrecorded and its full 256x256 XOR
OOMs.  As the recorded comparison we use this same framework's CPU-backend
throughput on identical parameters (vs_baseline = device / cpu), i.e. the
speedup of the TPU path over a CPU evaluation of the identical circuit.

Env knobs:
  AESFHE_BENCH_LOGN      ring size exponent (default 16 -> 32768 slots,
                         2048 AES blocks/ct, the reference's SIMD capacity)
  AESFHE_BENCH_LEVELS    max_level (default 16: enough for the round step)
  AESFHE_BENCH_ITERS     timed iterations (default 3)
  AESFHE_BENCH_SKIP_CPU  skip the CPU baseline leg (vs_baseline = 0)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_step(platform: str, logn: int, levels: int):
    """Build engine+services and return (jitted_step, (hi, lo) inputs, meta)."""
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu.context import EngineContext
    from aesfhe_tpu.core.ciphertext import Ciphertext
    from aesfhe_tpu.ops.xor_service import (EngineWrapper, XORService,
                                            CoefficientCache)
    from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
    from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
    from aesfhe_tpu.coeffs.generate import COEFF_DIR, AES_SBOX

    keys_mod.seed_keygen(0)
    params = CKKSParams(n=1 << logn, max_level=levels, scale_bits=26,
                        num_special_primes=4)
    ctx = EngineContext(params=params)
    wrap = EngineWrapper(ctx=ctx)
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    hi2d = CoefficientCache(COEFF_DIR / "sbox_hi2d_coeffs.json").load_coeffs()
    lo2d = CoefficientCache(COEFF_DIR / "sbox_lo2d_coeffs.json").load_coeffs()
    sc = params.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    key_t = np.tile(key, sc // 16)
    k_hi, k_lo = split_nibbles(key_t)
    s_hi, s_lo = split_nibbles(state)
    ct_hi = ctx.encrypt(ZetaEncoder.to_zeta(s_hi, 16))
    ct_lo = ctx.encrypt(ZetaEncoder.to_zeta(s_lo, 16))
    scale = params.scale

    def round_step(hi_data, lo_data):
        hi = Ciphertext(hi_data, scale)
        lo = Ciphertext(lo_data, scale)
        hi = xor_svc._xor_with_plain_nibbles(hi, k_hi)
        lo = xor_svc._xor_with_plain_nibbles(lo, k_lo)
        bh = xor_svc._build_power_basis(hi)
        bl = xor_svc._build_power_basis(lo)
        out_hi = tf._bilinear(bh, bl, hi2d)
        out_lo = tf._bilinear(bh, bl, lo2d)
        return out_hi.data, out_lo.data

    step = jax.jit(round_step)
    meta = dict(ctx=ctx, params=params, state=state, key_t=key_t,
                AES_SBOX=AES_SBOX, ZetaEncoder=ZetaEncoder)
    return step, (ct_hi.data, ct_lo.data), meta


def run_leg(platform: str, logn: int, levels: int, iters: int) -> float:
    """Returns blocks/sec for one round step on `platform` (correctness of
    the identical circuit is covered by tests/; bench is a timing harness)."""
    import jax
    step, args, meta = build_step(platform, logn, levels)
    out = step(*args)
    jax.block_until_ready(out)           # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    blocks = meta["params"].slot_count // 16
    return blocks / dt


def main():
    logn = int(os.environ.get("AESFHE_BENCH_LOGN", "16"))
    levels = int(os.environ.get("AESFHE_BENCH_LEVELS", "16"))
    iters = int(os.environ.get("AESFHE_BENCH_ITERS", "3"))
    device_bps = run_leg("", logn, levels, iters)
    if os.environ.get("AESFHE_BENCH_SKIP_CPU"):
        vs = 0.0
    else:
        # CPU leg in a subprocess (jax can't switch platforms mid-process)
        import subprocess
        env = dict(os.environ)
        env["AESFHE_PLATFORM"] = "cpu"
        env["AESFHE_BENCH_CHILD"] = "1"
        env["AESFHE_BENCH_ITERS"] = "1"
        r = subprocess.run([sys.executable, __file__], env=env,
                           capture_output=True, text=True, timeout=3600)
        try:
            cpu_bps = float(json.loads(r.stdout.strip().splitlines()[-1])["value"])
            vs = device_bps / cpu_bps if cpu_bps > 0 else 0.0
        except Exception:
            vs = 0.0
    print(json.dumps({
        "metric": "aes_fhe_ark_subbytes_round_step_blocks_per_s",
        "value": round(device_bps, 3),
        "unit": "AES blocks/s (32768-slot SIMD, ARK+SubBytes step)"
        if logn == 16 else f"AES blocks/s (2^{logn - 1}-slot SIMD)",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    if os.environ.get("AESFHE_BENCH_CHILD"):
        logn = int(os.environ.get("AESFHE_BENCH_LOGN", "16"))
        levels = int(os.environ.get("AESFHE_BENCH_LEVELS", "16"))
        bps = run_leg("cpu", logn, levels,
                      int(os.environ.get("AESFHE_BENCH_ITERS", "1")))
        print(json.dumps({"metric": "cpu_leg", "value": bps, "unit": "",
                          "vs_baseline": 0.0}))
    else:
        main()
