"""Full-size bootstrapped-AES probe on the real chip: prod_boot profile
(N=2^16, 128-bit secure, sparse secret).  Stages print as they complete so
partial progress survives a timeout; the jax persistent cache makes reruns
cheap.  Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prod_boot_probe.py [stage]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from aesfhe_tpu.core.params import get_params
from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu.ops.zeta import ZetaEncoder

def t(msg, t0):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)

t0 = time.time()
p = get_params("prod_boot")
t(f"params: N=2^{p.logn} num_q={p.num_q} specials={p.num_special} "
  f"dnum={p.dnum} logQP={sum(int(np.log2(q))+1 for q in p.all_primes)}", t0)
keys_mod.seed_keygen(0)
eng = Engine(p, use_bootstrap=True)
t("engine + tables built", t0)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
rlk = eng.create_relinearization_key(sk)
conj = eng.create_conjugation_key(sk)
t("base keys", t0)
bk = eng.create_bootstrap_key(sk)
from aesfhe_tpu.bootstrap import rotation_keys_mb
t(f"bootstrap keys: {len(bk.rot.keys)} rotation keys "
  f"({rotation_keys_mb(bk.rot):.0f} MB actual; pow2-hop giants) "
  f"deg={bk.cheb_deg} da={bk.double_angles} K={bk.K:.1f}", t0)

sc = p.slot_count
rng = np.random.default_rng(0)
vals = rng.integers(0, 16, sc, dtype=np.uint8)
z = ZetaEncoder.to_zeta(vals, 16)
ct = eng.encrypt(z, pk)
t("encrypted", t0)
from aesfhe_tpu.bootstrap import _PhaseTimer
low = eng._drop(ct, 0)
out = eng.bootstrap(low, rlk, conj, bk)
if _PhaseTimer.enabled:
    t(f"phases #1: {_PhaseTimer.report_str()}", t0)
d = eng.decrypt(out, sk)
err = np.max(np.abs(d - z))
ok = np.array_equal(ZetaEncoder.from_zeta(d, 16), vals)
t(f"bootstrap #1 (incl compiles): err {err:.4f} level {out.level} ok {ok}", t0)
t1 = time.time()
out2 = eng.bootstrap(low, rlk, conj, bk)
t_mid = time.time()
np.asarray(out2.data[0, 0, :1])
warm_s = time.time() - t1
t(f"bootstrap #2 call {t_mid-t1:.1f}s + result fetch {time.time()-t_mid:.1f}s", t0)
if _PhaseTimer.enabled:
    t(f"phases #2: {_PhaseTimer.report_str()}", t0)
    for name, dt, ops in _PhaseTimer.records:
        t(f"  {name:12s} {dt:6.2f}s  {ops}", t0)
d2 = eng.decrypt(out2, sk)
err2 = np.max(np.abs(d2 - z))
ok2 = np.array_equal(ZetaEncoder.from_zeta(d2, 16), vals)
t(f"bootstrap #2 (warm): {warm_s:.1f}s err {err2:.4f} ok {ok2}", t0)
# gate the verdict on the exact decode of BOTH runs (the warm path hits the
# populated diagonal caches -- a warm-only regression must fail the probe),
# not on reaching the end: the point is full-ring bootstrap ACCURACY
ok = ok and ok2
print("PROBE OK" if ok else
      f"PROBE FAIL (err {err:.4f}/{err2:.4f}, exact decode {ok})",
      flush=True)
sys.exit(0 if ok else 1)
