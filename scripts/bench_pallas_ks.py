"""Device decision table for the Pallas key-switch inner product
(VERDICT r4 #6: settle the BASELINE.json "Pallas kernels" north star with
data).  Times core.pallas_ks.ks_inner_pallas against the XLA-fused loop on
prod_boot key-switch shapes, DCE-proof (the returned scalar depends on every
limb of both halves), and prints a PERF.md-ready table.

Usage: python scripts/bench_pallas_ks.py [N_log2] (default 16)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from aesfhe_tpu.core import pallas_ks
from aesfhe_tpu.core.params import get_params


def timeit(fn, *args, reps=20):
    out = fn(*args)           # compile
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    params = get_params("prod_boot") if logn == 16 else get_params("test")
    n = 1 << logn
    # prod_boot key-switch shapes: J = dnum digits, M = rows at a mid-chain
    # level (l+1 primes + K specials)
    J = params.dnum
    lvl = min(19, params.max_level - 1)   # the flagship's uniform work tier
    M = lvl + 1 + params.num_special
    q_arr = np.asarray(params.all_primes[:M], dtype=np.uint32)
    from aesfhe_tpu.core import rns
    qinv_arr = np.asarray([rns.montgomery_consts(int(q))[0] for q in q_arr],
                          dtype=np.uint32)
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.integers(0, q_arr[None, :, None],
                                 (J, M, n), dtype=np.uint32))
    kb = jnp.asarray(rng.integers(0, q_arr[None, :, None],
                                  (J, M, n), dtype=np.uint32))
    ka = jnp.asarray(rng.integers(0, q_arr[None, :, None],
                                  (J, M, n), dtype=np.uint32))
    qd = jnp.asarray(q_arr)
    qi = jnp.asarray(qinv_arr)

    # DCE-proof: fold every output word into one scalar
    @jax.jit
    def run_xla(d, kb, ka):
        out = pallas_ks.ks_inner_xla(d, kb, ka, qd, qi)
        return jnp.sum(out ^ (out >> 16))

    @jax.jit
    def run_pl(d, kb, ka):
        out = pallas_ks.ks_inner_pallas(d, kb, ka, qd, qi)
        return jnp.sum(out ^ (out >> 16))

    tx, ox = timeit(run_xla, d, kb, ka)
    tp, op = timeit(run_pl, d, kb, ka)
    match = bool(np.asarray(ox) == np.asarray(op))
    bytes_hbm = 3 * J * M * n * 4 + 2 * M * n * 4
    print(f"shapes: J={J} M={M} N=2^{logn}  HBM traffic ~"
          f"{bytes_hbm / 2**20:.0f} MB minimum")
    print(f"XLA    inner product: {tx * 1e3:8.3f} ms   "
          f"({bytes_hbm / tx / 2**30:.0f} GiB/s effective)")
    print(f"Pallas inner product: {tp * 1e3:8.3f} ms   "
          f"({bytes_hbm / tp / 2**30:.0f} GiB/s effective)")
    print(f"checksums match: {match}   speedup XLA->Pallas: {tx / tp:.2f}x")


if __name__ == "__main__":
    main()
