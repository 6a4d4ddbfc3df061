"""Decrypt a bit-sliced checkpoint in a FRESH process and print the state.

The flagship run's device memory sits within ~1 GB of HBM capacity during
the rounds; even after dropping keys and caches the axon relay does not
reliably reclaim enough for the final decrypt's kernel compile.  A child
process starts from an empty device: only params tables + the secret key.

Usage: decrypt_state.py <ckpt_dir> <round> [profile]
Prints one JSON line: {"bytes_hex": ...}
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core import keys as keys_mod


def main():
    ck = sys.argv[1]
    rnd = int(sys.argv[2])
    profile = sys.argv[3] if len(sys.argv) > 3 else "prod_boot"
    os.environ.setdefault("AESFHE_KEY_CACHE", "/root/.cache/aesfhe_keys")
    keys_mod.seed_keygen(0)

    from aesfhe_tpu.core.params import get_params
    from aesfhe_tpu.core.engine import Engine
    from aesfhe_tpu.utils.serialization import (cached_key_family,
                                                load_ciphertext)

    params = get_params(profile)
    eng = Engine(params)
    fam = cached_key_family(eng, os.environ["AESFHE_KEY_CACHE"],
                            rotation_steps=())
    sk = fam["secret"]

    sc = params.slot_count
    out = np.zeros(sc, dtype=np.uint8)
    from pathlib import Path
    for k in range(8):
        ct = load_ciphertext(Path(ck) / f"round{rnd:02d}_plane{k}.npz")
        bit = np.real(eng.decrypt(ct, sk, device=True)) < 0
        out |= bit.astype(np.uint8) << k
    print(json.dumps({"bytes_hex": out.tobytes().hex()}))


if __name__ == "__main__":
    main()
