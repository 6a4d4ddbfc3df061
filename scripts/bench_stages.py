"""Per-stage TPU timing of the bit-sliced AES round (differential timing:
stage chains on the axon relay, value-fetch to force completion)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.context import EngineContext
from aesfhe_tpu.ops.xor_service import EngineWrapper
from aesfhe_tpu.ops.bitplane import BitSliceService
from aesfhe_tpu.keyexp import expand_key_128

logn = int(os.environ.get("AESFHE_BENCH_LOGN", "16"))
levels = int(os.environ.get("AESFHE_BENCH_LEVELS", "16"))
keys_mod.seed_keygen(0)
params = CKKSParams(n=1 << logn, max_level=levels, scale_bits=28,
                    num_special_primes=4)
ctx = EngineContext(params=params)
wrap = EngineWrapper(ctx=ctx)
svc = BitSliceService(wrap)
sc = params.slot_count
rng = np.random.default_rng(0)
state = rng.integers(0, 256, sc, dtype=np.uint8)
rk = expand_key_128(bytes(range(16)))[1]
st0 = svc.encrypt_state(state)


def fetch(st):
    jax.block_until_ready([b.data for b in st.bits])
    _ = np.asarray(st.bits[0].data[0, 0, :4])


def timed(name, fn, arg, iters=3):
    out = fn(arg)
    fetch(out)                     # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} {dt*1e3:9.1f} ms", flush=True)
    return out


st = timed("xor_plain", lambda s: svc.xor_plain(s, rk), st0)
st = timed("sub_bytes", svc.sub_bytes, st)
st = timed("shift_rows", svc.shift_rows, st)
st = timed("mix_columns", svc.mix_columns, st)
st = timed("cleanse", svc.cleanse, st)
