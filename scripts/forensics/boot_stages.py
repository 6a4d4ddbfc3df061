"""Stage-resolved bootstrap debugging: decrypt after every stage and compare
with the host-side ideal transform of the previous stage's decryption.
Reproduces the prod_boot-knob failure at a small ring (CPU-fast).

Usage: python scripts/debug_boot_stages.py [logn] [h] [specials] [L]
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = os.environ.get("AESFHE_DEBUG_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu import bootstrap as bs
from aesfhe_tpu.ops.zeta import ZetaEncoder

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 10
h = int(sys.argv[2]) if len(sys.argv) > 2 else 192
spec = int(sys.argv[3]) if len(sys.argv) > 3 else 8
L = int(sys.argv[4]) if len(sys.argv) > 4 else 54

keys_mod.seed_keygen(0)
p = CKKSParams(n=1 << logn, max_level=L, scale_bits=27,
               num_special_primes=spec,
               secret_hamming=min(h, (1 << logn) // 4))
eng = Engine(p, use_bootstrap=True)
sk = eng.create_secret_key()
pk = eng.create_public_key(sk)
rlk = eng.create_relinearization_key(sk)
conj = eng.create_conjugation_key(sk)
bk = eng.create_bootstrap_key(sk)
sc = p.slot_count
n = p.n
q0 = int(p.q_primes[0])
delta = p.scale

rng = np.random.default_rng(0)
vals = rng.integers(0, 16, sc, dtype=np.uint8)
z = ZetaEncoder.to_zeta(vals, 16)
ct = eng.encrypt(z, pk)
low = eng._drop(ct, 0)

# ---- host ground truth for the raised ciphertext ---------------------
# decrypt low exactly: residues mod q0, centered
from aesfhe_tpu.core import ops_impl, rns
res0 = np.asarray(
    __import__("aesfhe_tpu.core.engine", fromlist=["_decrypt_core"])
    ._decrypt_core(p, eng.tabs, low.data, sk.s_eval))[0].astype(np.int64)
coeff_q0 = np.where(res0 > q0 // 2, res0 - q0, res0)      # m + q0*I mod q0 -> m'
print(f"params: n=2^{logn} h={p.secret_hamming} spec={spec} L={L} "
      f"K={bk.K:.2f} deg={bk.cheb_deg} da={bk.double_angles} "
      f"plans={len(bk.stc_plan)}+{len(bk.cts_plan)}")

raised = bs._mod_raise(eng, low)
d_raised = eng.decrypt(raised, sk)        # slot-domain values of (m+q0I)/Delta
# host: coefficients of raised (exact CRT over active primes)
res_r = np.asarray(
    __import__("aesfhe_tpu.core.engine", fromlist=["_decrypt_core"])
    ._decrypt_core(p, eng.tabs, raised.data, sk.s_eval))
coeff_r = rns.crt_to_centered_float(res_r.astype(np.uint64),
                                    p.active_primes(raised.level))
I = np.round((coeff_r - coeff_q0) / q0)
print(f"modraise: max|I|={np.abs(I).max():.1f}  K={bk.K:.2f}  "
      f"sigma_I={np.std(I):.2f}  n_I_over_K={(np.abs(I) > bk.K).sum()}")

if os.environ.get("AESFHE_BOOT_PRESCALE"):
    bk.prescale = float(os.environ["AESFHE_BOOT_PRESCALE"])
if os.environ.get("AESFHE_BOOT_HIPREC"):
    bk.hi_prec = os.environ["AESFHE_BOOT_HIPREC"] == "1"
hi = bk.hi_prec
f = bk.prescale
a_scale, b_shift, theta_max = bs.eval_mod_scales(bk, q0, low.scale)
if hi:
    pre = eng._mul_scalar(raised, a_scale * f, bk.hi_scale)
else:
    pre = eng.multiply(raised, a_scale * f)
d_pre = eng.decrypt(pre, sk)
exp_pre = d_raised * a_scale * f
print(f"prescale f={f:g} hi_prec={hi}")
print(f"a_scale mult: err={np.abs(d_pre - exp_pre).max():.3e} "
      f"max|u_pre|={np.abs(d_pre).max():.3f}")

# ---- CTS chain --------------------------------------------------------
# host expectation: slots hold (c_k + i c_{k+sc})-mixed halves after the
# full chain + conj add.  Follow the ciphertext stage by stage instead:
cur = pre
d_cur = d_pre
for i, plan in enumerate(bk.cts_plan[:-1]):
    cur = bs._apply_group(eng, cur, plan, f"dbg_fcts{i}", bk, hi=hi)
    # host-apply the same grouped matrix
    mat = {e["delta"]: e["u"] for e in plan["entries"]}
    d_exp = bs._diag_apply_host(mat, d_cur)
    d_dec = eng.decrypt(cur, sk)
    print(f"cts group {i}: err={np.abs(d_dec - d_exp).max():.3e} "
          f"max|val|={np.abs(d_dec).max():.3f} lvl={cur.level}")
    d_cur = d_dec
last = bk.cts_plan[-1]
y_a = bs._apply_group(eng, cur, last, f"dbg_fctsA{f:g}", bk,
                      scalar=1.0 / f, hi=hi)
y_b = eng.negate(eng.multiply_i(y_a))
mat = {e["delta"]: e["u"] / f for e in last["entries"]}
exp_a = bs._diag_apply_host(mat, d_cur)
d_ya = eng.decrypt(y_a, sk)
print(f"cts last A: err={np.abs(d_ya - exp_a).max():.3e} "
      f"max={np.abs(d_ya).max():.3f}")
ct_a = eng.add(y_a, eng.conjugate(y_a, conj))
ct_b = eng.add(y_b, eng.conjugate(y_b, conj))
d_a = eng.decrypt(ct_a, sk)
d_b = eng.decrypt(ct_b, sk)
# expected: u values = a_scale * coeff (pre-shift) at slot positions
# (exactness check against the raised coefficients themselves)
exp_ua = (exp_a + np.conj(exp_a))
print(f"conj-add A: err={np.abs(d_a - exp_ua).max():.3e} "
      f"max|u|={np.abs(d_a).max():.4f} (K-margin: u in [-1,1])")

# ---- EvalMod internals (real input) -----------------------------------
if os.environ.get("AESFHE_DEBUG_EVALMOD_INTERNAL") == "1":
    hi_f = bk.hi_prec
    del cur, y_a, y_b, ct_b, raised, pre     # HBM hygiene (16 GB budget)

    def _mul(a, b):
        t = eng.multiply(a, b, rlk)
        return eng._rescale(t) if hi_f else t

    u_ct = eng.add_plain(ct_a, b_shift)
    u_h = np.real(eng.decrypt(u_ct, sk))
    acos = np.arccos(np.clip(u_h, -1, 1))
    print(f"u: max|u|={np.abs(u_h).max():.4f} scale=2^"
          f"{np.log2(u_ct.scale):.3f} lvl={u_ct.level}", flush=True)
    T = {1: u_ct}
    g = 1
    while g * 2 <= bk.cheb_deg:
        g *= 2
        k = g // 2
        t = _mul(T[k], T[k])
        t = eng.add(t, t)
        T[g] = eng.add_plain(t, -1.0)
        d = np.real(eng.decrypt(T[g], sk))
        print(f"T_{g:3d}: err={np.abs(d - np.cos(g * acos)).max():.3e} "
              f"scale=2^{np.log2(T[g].scale):.3f} lvl={T[g].level}",
              flush=True)
    coeffs_h = bs._chebyshev_coeffs(lambda v: np.cos(theta_max * v),
                                    bk.cheb_deg)
    y_ct = bs._cheb_eval_ps(eng, coeffs_h, u_ct, rlk, hi=hi_f)
    d = np.real(eng.decrypt(y_ct, sk))
    print(f"cheb: err={np.abs(d - np.cos(theta_max * u_h)).max():.3e} "
          f"scale=2^{np.log2(y_ct.scale):.3f} lvl={y_ct.level}", flush=True)
    sys.exit(0)

m_a = bs._eval_mod(eng, ct_a, bk, rlk, q0, low.scale)
m_b = bs._eval_mod(eng, ct_b, bk, rlk, q0, low.scale, final_mult=1j)
d_ma = eng.decrypt(m_a, sk)
# host expectation: the *ideal* EvalMod output from the decrypted input
r = bk.double_angles
u_h = np.real(d_a) + b_shift
y_h = np.cos(theta_max * u_h)
for _ in range(r):
    y_h = 2 * y_h * y_h - 1
if not hi:
    y_h = y_h + y_h ** 3 / 6
exp_ma = y_h * q0 / (2 * np.pi * low.scale)
print(f"evalmod A: err={np.abs(d_ma - exp_ma).max():.3e} "
      f"max|m|={np.abs(d_ma).max():.3f} lvl={m_a.level}")

v = eng.add(m_a, m_b)
out = bs._apply_chain(eng, v, bk.stc_plan, "dbg_fstc", bk)
d_out = eng.decrypt(out, sk)
err = np.abs(d_out - z).max()
ok = np.array_equal(ZetaEncoder.from_zeta(d_out, 16), vals)
print(f"final: err={err:.5g} ok={ok} lvl={out.level}")
