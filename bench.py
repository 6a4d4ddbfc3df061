#!/usr/bin/env python
"""Benchmark: homomorphic AES round throughput on the real device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: one FULL middle AES round on the bit-sliced Walsh pipeline
(ops/bitplane.py) — SubBytes with the round key folded into the Walsh
coefficients + ShiftRows + MixColumns + sign-cleanse — over the whole SIMD
batch.  Batch size: bit-planes hold one byte per slot, so slot_count/16 AES
blocks = 2048 at the default N=2^16 (slot_count = N/2 = 32768), matching
the reference's "2K blocks per ciphertext" (/root/reference/README.md:29).
[Rounds 1-3 printed a "4096-block" unit label while computing blocks/s with
2048 — the label was wrong, the VALUE was always per-2048-block batch.]

Metric: blocks / MEDIAN iteration time.  Rationale: the median is robust to
relay/dispatch outliers while still penalizing systematic slowness; t_min
(the hardware-capability bound) and t_max are published alongside so the
iteration spread is visible in every artifact (see PERF.md "iteration
variance" forensics).

vs_baseline: the reference publishes no numbers (BASELINE.md: README TOC
stub only; its CPU AddRoundKey was measured-but-unrecorded, its 256x256 XOR
OOMs).  The recorded ratio is therefore this framework's TPU throughput over
its own CPU throughput on identical parameters — the honest measurable proxy.

Env knobs:
  AESFHE_BENCH_LOGN     ring exponent (default 16)
  AESFHE_BENCH_LEVELS   depth (default 16; one bit-sliced round fits)
  AESFHE_BENCH_ITERS    timed iterations (default 5)
  AESFHE_BENCH_MODE     "flagship" (DEFAULT: 10-round AES-128 with real
                        bootstraps, prod_boot; falls back to bitplane with
                        a stderr diagnostic if it fails)
                        | "bitplane" (one full round, no bootstrap)
                        | "zeta" (ARK+SubBytes step on the reference-style
                        zeta nibble-pair pipeline)
  AESFHE_BENCH_SKIP_CPU skip CPU baseline leg (vs_baseline = 0)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

MODE = os.environ.get("AESFHE_BENCH_MODE", "flagship")


def _common(logn: int, levels: int):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu.context import EngineContext
    from aesfhe_tpu.ops.xor_service import EngineWrapper
    keys_mod.seed_keygen(0)
    params = CKKSParams(n=1 << logn, max_level=levels, scale_bits=28,
                        num_special_primes=4)
    ctx = EngineContext(params=params)
    wrap = EngineWrapper(ctx=ctx)
    return params, ctx, wrap


def _setup_bitplane(logn: int, levels: int):
    """One full middle AES round on the bit-sliced pipeline, single jit."""
    import jax
    from aesfhe_tpu.core.ciphertext import Ciphertext
    from aesfhe_tpu.ops.bitplane import BitSliceService, BitState
    from aesfhe_tpu.keyexp import expand_key_128

    params, ctx, wrap = _common(logn, levels)
    svc = BitSliceService(wrap)
    sc = params.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    rk = expand_key_128(bytes(range(16)))[1]
    st0 = svc.encrypt_state(state)

    # per-op dispatch: every engine primitive is itself jitted with
    # DeviceTables/keys as ARGS (an outer jit would capture the big tables
    # as program constants -- slow upload / HTTP 413 through the relay)
    def round_fn(st):
        st = svc.xor_plain(st, rk)
        st = svc.sub_bytes(st)
        st = svc.shift_rows(st)
        st = svc.mix_columns(st)
        return svc.cleanse(st)

    def step(st):
        out = round_fn(st)
        return tuple(b.data for b in out.bits)

    blocks = sc // 16
    return step, (st0,), blocks


def _setup_zeta(logn: int, levels: int):
    """Reference-style nibble-pair ARK+SubBytes step (legacy headline)."""
    import jax
    from aesfhe_tpu.core.ciphertext import Ciphertext
    from aesfhe_tpu.ops.xor_service import XORService, CoefficientCache
    from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
    from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
    from aesfhe_tpu.coeffs.generate import COEFF_DIR

    params, ctx, wrap = _common(logn, levels)
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    hi2d = CoefficientCache(COEFF_DIR / "sbox_hi2d_coeffs.json").load_coeffs()
    lo2d = CoefficientCache(COEFF_DIR / "sbox_lo2d_coeffs.json").load_coeffs()
    sc = params.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = np.tile(rng.integers(0, 256, 16, dtype=np.uint8), sc // 16)
    k_hi, k_lo = split_nibbles(key)
    s_hi, s_lo = split_nibbles(state)
    ct_hi = ctx.encrypt(ZetaEncoder.to_zeta(s_hi, 16))
    ct_lo = ctx.encrypt(ZetaEncoder.to_zeta(s_lo, 16))
    scale = float(ct_hi.scale)

    def step(hi, lo):
        hi = xor_svc._xor_with_plain_nibbles(hi, k_hi)
        lo = xor_svc._xor_with_plain_nibbles(lo, k_lo)
        bh = xor_svc._build_power_basis(hi)
        bl = xor_svc._build_power_basis(lo)
        out_hi = tf._bilinear(bh, bl, hi2d)
        out_lo = tf._bilinear(bh, bl, lo2d)
        return out_hi.data, out_lo.data

    return step, (ct_hi, ct_lo), sc // 16


def run_leg(logn: int, levels: int, iters: int):
    """Returns (blocks/s at the MEDIAN iteration time, per-iter stats dict).

    Per-iteration timing with min/median/max so a published number carries
    its own variance bar (round-2 lesson: a 29% headline swing between
    rounds was indistinguishable from relay noise with one 3-iter mean)."""
    import jax
    setup = _setup_zeta if MODE == "zeta" else _setup_bitplane
    step, args, blocks = setup(logn, levels)
    out = step(*args)                         # warm: compile once
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])  # force fetch
    times = []
    for _ in range(max(1, iters)):
        t0 = time.perf_counter()
        out = step(*args)
        jax.block_until_ready(out)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    stats = {"iters": len(times),
             "t_min_s": round(min(times), 4),
             "t_median_s": round(med, 4),
             "t_max_s": round(max(times), 4)}
    return blocks / med, stats


def run_flagship():
    """10-round AES-128 with real bootstraps (prod_boot, N=2^16, 128-bit
    class): drives scripts/run_full_aes.py and reports ITS metrics — the
    BASELINE.md flagship (blocks/s over 10 rounds incl. bootstraps,
    ms/round, rotations/s).  Returns None if the run fails (cold cache +
    relay compile can exceed the budget), letting main() fall back to the
    one-round metric."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.setdefault("AESFHE_KEY_CACHE", "/root/.cache/aesfhe_keys")
    budget = int(os.environ.get("AESFHE_BENCH_FLAGSHIP_TIMEOUT", "5400"))
    r = None
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "scripts", "run_full_aes.py")],
            env=env, capture_output=True, text=True, timeout=budget)
        res = json.loads(r.stdout.strip().splitlines()[-1])
        if not res.get("fips_exact"):
            print("bench: flagship run completed but fips_exact is false; "
                  "falling back to the one-round metric", file=sys.stderr)
            return None
        return res
    except Exception as e:
        # never downgrade silently: say why the flagship leg fell over
        print(f"bench: flagship leg failed ({type(e).__name__}: {e}); "
              "falling back to the one-round metric", file=sys.stderr)
        for name, stream in (("stdout", getattr(r, "stdout", "") or
                              getattr(e, "stdout", "") or ""),
                             ("stderr", getattr(r, "stderr", "") or
                              getattr(e, "stderr", "") or "")):
            tail = stream.strip().splitlines()[-8:]
            if tail:
                print(f"bench: flagship {name} tail:", file=sys.stderr)
                for line in tail:
                    print(f"  {line}", file=sys.stderr)
        return None


def main():
    logn = int(os.environ.get("AESFHE_BENCH_LOGN", "16"))
    levels = int(os.environ.get("AESFHE_BENCH_LEVELS", "16"))
    iters = int(os.environ.get("AESFHE_BENCH_ITERS", "5"))
    if MODE == "flagship":
        res = run_flagship()
        if res is not None:
            print(json.dumps({
                "metric": "aes_fhe_10round_blocks_per_s",
                "value": res["blocks_per_s_10round"],
                "unit": (f"AES blocks/s (10 rounds incl. "
                         f"{res['bootstraps']} bootstraps, "
                         f"{res['blocks']}-block SIMD batch, "
                         f"{res['profile']} N=2^16; FIPS-197 C.1 exact)"),
                # the reference publishes no numbers and never finishes one
                # round (BASELINE.md); no cross-baseline ratio exists
                "vs_baseline": 0.0,
                "ms_per_round": res["ms_per_round_mean"],
                # steady-state (median post-warmup round): what the pipeline
                # sustains once one-off XLA compiles are absorbed
                "blocks_per_s_steady": res.get("blocks_per_s_steady"),
                "warmup_s": res.get("warmup_s"),
                "rotations_per_s": res["rotations_per_s"],
                "keyswitches_per_s": res["keyswitches_per_s"],
                "bootstrap_s_total": res["bootstrap_s_total"],
            }))
            return
        # fall through to the one-round metric if the flagship leg failed
    device_bps, stats = run_leg(logn, levels, iters)
    vs = 0.0
    if not os.environ.get("AESFHE_BENCH_SKIP_CPU"):
        cache = (f"/root/.cache/aesfhe_cpu_leg_{MODE}_{logn}_{levels}.json")
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
    blocks = (1 << logn) // 32           # slot_count/16, one byte per slot
    # the flagship fallback leg runs the bitplane setup (run_leg), so label
    # it as such; only an explicit MODE=zeta selects the zeta step metric
    unit = (f"AES blocks/s ({blocks}-block SIMD ARK+SubBytes step)"
            if MODE == "zeta" else
            "AES blocks/s (full bit-sliced round, "
            f"{blocks}-block SIMD batch, median of iters; "
            "t_min/t_max published)")
    metric = ("aes_fhe_ark_subbytes_round_step_blocks_per_s"
              if MODE == "zeta" else "aes_fhe_full_round_blocks_per_s")
    print(json.dumps({
        "metric": metric,
        "value": round(device_bps, 3),
        "unit": unit,
        "vs_baseline": round(vs, 3),
        **stats,
    }))


if __name__ == "__main__":
    if os.environ.get("AESFHE_BENCH_CHILD"):
        bps, _ = run_leg(int(os.environ.get("AESFHE_BENCH_LOGN", "16")),
                         int(os.environ.get("AESFHE_BENCH_LEVELS", "16")),
                         int(os.environ.get("AESFHE_BENCH_ITERS", "1")))
        print(json.dumps({"metric": "cpu_leg", "value": bps, "unit": "",
                          "vs_baseline": 0.0}))
    else:
        main()
