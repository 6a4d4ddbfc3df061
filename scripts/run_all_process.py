#!/usr/bin/env python
"""End-to-end AddRoundKey + SubBytes drive with timing, script-style.

Port of the reference's driver /root/reference/test_all_process.py:21-87
(which prints wall-clock for the AddRoundKey leg); extended to the SubBytes
leg and per-op homomorphic-cost counters.

Usage: PYTHONPATH=. [AESFHE_PLATFORM=cpu] python scripts/run_all_process.py [profile]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    profile = sys.argv[1] if len(sys.argv) > 1 else "test"
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu.core.params import get_params
    from aesfhe_tpu.context import EngineContext
    from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
    from aesfhe_tpu.ops.sbox_service import SBoxService
    from aesfhe_tpu.ops.zeta import ZetaEncoder
    from aesfhe_tpu.coeffs.generate import AES_SBOX

    keys_mod.seed_keygen(0)
    t0 = time.perf_counter()
    ctx = EngineContext(params=get_params(profile))
    wrap = EngineWrapper(ctx=ctx)
    print(f"engine+keygen: {time.perf_counter() - t0:.2f}s "
          f"(slots={ctx.engine.slot_count}, levels={ctx.engine.max_level})")

    xor_svc = XORService(wrap)
    sbox_svc = SBoxService(wrap)
    sc = ctx.engine.slot_count
    rng = np.random.default_rng(1)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    key_t = np.tile(key, sc // 16)

    enc_state = wrap.encrypt(ZetaEncoder.to_zeta(state, 256))

    ctx.engine.reset_counters()
    t0 = time.perf_counter()
    ark_ct = xor_svc.add_round_key(enc_state, key_t)
    t_ark = time.perf_counter() - t0
    ark = ZetaEncoder.from_zeta(wrap.decrypt(ark_ct), 256)
    ok_ark = np.array_equal(ark, state ^ key_t)
    print(f"AddRoundKey ({sc // 16} blocks): {t_ark:.2f}s  "
          f"correct={ok_ark}  ops={dict(ctx.engine.counters)}")

    ctx.engine.reset_counters()
    t0 = time.perf_counter()
    sb_ct = sbox_svc.sub_bytes_array(ark_ct)
    t_sb = time.perf_counter() - t0
    sb = ZetaEncoder.from_zeta(wrap.decrypt(sb_ct), 256)
    ok_sb = np.array_equal(sb, AES_SBOX[state ^ key_t])
    print(f"SubBytes    ({sc // 16} blocks): {t_sb:.2f}s  "
          f"correct={ok_sb}  ops={dict(ctx.engine.counters)}")
    if not (ok_ark and ok_sb):
        sys.exit(1)


if __name__ == "__main__":
    main()
