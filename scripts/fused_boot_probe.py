"""Per-launch timing of the FUSED bootstrap's four programs on the chip.

The fused bootstrap is 4 dispatches (front / mid_a / mid_b / back); this
probe blocks between them to attribute the wall to phases, then runs the
un-blocked whole for the true pipelined wall.  Run AFTER a flagship run has
populated the persistent compile + key caches (reuses both).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_boot_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.ops.xor_service import XORConfig, EngineWrapper
from aesfhe_tpu.core.ciphertext import Ciphertext

T0 = time.time()


def t(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    os.environ.setdefault("AESFHE_KEY_CACHE", "/root/.cache/aesfhe_keys")
    os.environ.setdefault("AESFHE_FUSED_BOOT", "1")
    keys_mod.seed_keygen(0)
    cfg = XORConfig(profile="prod_boot", use_bootstrap=True,
                    rotation_steps=())
    wrap = EngineWrapper(cfg)
    eng = wrap.engine
    t(f"keys ready (backend={jax.default_backend()})")

    work_lvl = 15
    rng = np.random.default_rng(0)
    vals = (rng.integers(0, 2, eng.slot_count) * 2 - 1).astype(np.float64)
    ct0 = eng.encrypt(vals.astype(np.complex128), wrap.public_key)
    out0 = wrap.bootstrap(eng._drop(ct0, work_lvl))   # builds + captures
    jax.block_until_ready(out0.data)
    ct = eng._drop(ct0, 0)
    fb = next(iter(wrap._fused_boot.values()))
    t("fused programs ready")

    # phase-attributed (blocked) run
    for it in range(3):
        tabs = fb.engine.tabs
        rot_flat = [(fb.bk.rot.keys[g].b, fb.bk.rot.keys[g].a)
                    for g in fb.rot_elts]
        rlk_ba = (fb.relin_key.b, fb.relin_key.a)
        t0 = time.time()
        a, b = fb._front(ct.data, tabs, (fb.conj_key.b, fb.conj_key.a),
                         rot_flat, fb.front_diags)
        jax.block_until_ready((a, b))
        t1 = time.time()
        ma = fb._mid_a(a, tabs, rlk_ba)
        jax.block_until_ready(ma)
        t2 = time.time()
        mb = fb._mid_b(b, tabs, rlk_ba)
        jax.block_until_ready(mb)
        t3 = time.time()
        out = fb._back(ma, mb, tabs, rot_flat, fb.back_diags)
        jax.block_until_ready(out)
        t4 = time.time()
        t(f"blocked #{it}: front {t1-t0:6.3f}s  mid_a {t2-t1:6.3f}s  "
          f"mid_b {t3-t2:6.3f}s  back {t4-t3:6.3f}s  "
          f"total {t4-t0:6.3f}s")

    # free-running (pipelined) wall
    for it in range(3):
        t0 = time.time()
        out = fb(ct)
        jax.block_until_ready(out.data)
        t(f"free-run #{it}: {time.time()-t0:6.3f}s "
          f"(out level {out.level})")


if __name__ == "__main__":
    main()
