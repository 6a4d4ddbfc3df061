"""CKKS parameter sets for the TPU engine.

The modulus chain is a list of NTT-friendly primes < 2^30 (so that all device
modular arithmetic closes over exact uint32 ops, see core/rns.py):

  primes[0]            ~2^30   decryption headroom prime
  primes[1..max_level] ~Delta  rescale primes, alternating above/below Delta
  special_primes       ~2^30   hybrid key-switch auxiliary modulus P

A ciphertext at level l carries limbs primes[:l+1]; multiply consumes one
level (auto-rescale).  `max_level` mirrors the reference's Engine(max_level=…)
constructor knob (/root/reference/engine_context.py:41-47,
/root/reference/xor_service.py:24).

Key-switching is hybrid RNS (dnum digit groups + special primes), replacing
desilofhe's native key-switch (SURVEY.md section 2.1).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

from . import rns, ntt


class CKKSParams:
    """Static parameter set + precomputed tables.  Hash/eq by identity so it
    can be a static argument to jax.jit."""

    def __init__(self, n: int, max_level: int, scale_bits: int,
                 first_prime_bits: int = 30, special_prime_bits: int = 30,
                 num_special_primes: int = 2, alpha: int | None = None,
                 error_std: float = 3.2, secret_hamming: int | None = None):
        assert n & (n - 1) == 0
        self.n = n
        self.logn = n.bit_length() - 1
        self.slot_count = n // 2
        self.max_level = max_level
        self.scale_bits = scale_bits
        self.scale = float(2 ** scale_bits)
        self.error_std = error_std
        # sparse ternary secret (hamming weight); bounds the ModRaise
        # overflow I (|I| <~ hamming/2) so EvalMod's sine range stays small --
        # required for bootstrappable parameter sets
        self.secret_hamming = secret_hamming
        two_n = 2 * n

        # All primes must stay <= 2^30 for exact uint32 arithmetic; scales
        # above that use pairs of half-size primes, with every multiply
        # rescaling by a pair (rescale_primes == 2).  This is the precision
        # mode the degree-255 byte-domain LUTs need: relative error of ct^d
        # grows ~ d * (noise/scale), and zeta256 phase decoding tolerates
        # only ~1.2e-2 (see SURVEY.md section 7 "hard parts" item 4).
        self.rescale_primes = 1 if scale_bits <= 29 else 2
        r = self.rescale_primes
        assert scale_bits <= 58, "scale above 2^58 unsupported"
        half_bits = scale_bits if r == 1 else (scale_bits + 1) // 2
        first = rns.find_ntt_primes(first_prime_bits, two_n, r)
        rescale = rns.find_ntt_primes(half_bits, two_n, r * max_level,
                                      skip=tuple(first))
        specials = rns.find_ntt_primes(special_prime_bits, two_n,
                                       num_special_primes,
                                       skip=tuple(first) + tuple(rescale))
        self.q_primes = tuple(first + rescale)
        # top_level indexes LIMBS (q_primes), while max_level counts
        # multiplicative DEPTH (rescale units of `rescale_primes` primes)
        self.top_level = len(self.q_primes) - 1
        self.special_primes = tuple(specials)
        self.all_primes = self.q_primes + self.special_primes
        self.num_q = len(self.q_primes)
        self.num_special = len(self.special_primes)
        self.L_tot = len(self.all_primes)
        assert all(q <= (1 << 30) for q in self.all_primes)

        # Digit groups over the q-prime chain (hybrid key-switch).  The
        # special modulus P must dominate every digit product Qt_j, so the
        # group size alpha defaults to the number of special primes.
        alpha = num_special_primes if alpha is None else alpha
        self.alpha = alpha
        self.groups = [list(range(g0, min(g0 + alpha, self.num_q)))
                       for g0 in range(0, self.num_q, alpha)]
        self.dnum = len(self.groups)
        P = 1
        for p in self.special_primes:
            P *= p
        for grp in self.groups:
            qt = 1
            for i in grp:
                qt *= self.q_primes[i]
            assert qt < P, (
                "digit product exceeds special modulus P; "
                "increase num_special_primes or reduce alpha")

        # NTT tables over the full basis
        self.tables = ntt.NTTTables(n, self.all_primes)

        # Montgomery / Barrett constants per prime (host numpy; cast on use)
        qinv = np.zeros(self.L_tot, dtype=np.uint32)
        r2 = np.zeros(self.L_tot, dtype=np.uint32)
        magic = np.zeros(self.L_tot, dtype=np.uint32)
        for i, q in enumerate(self.all_primes):
            qi, r2i = rns.montgomery_consts(q)
            qinv[i] = qi
            r2[i] = r2i
            magic[i] = rns.barrett_magic(q)
        self.q_arr = np.asarray(self.all_primes, dtype=np.uint32)
        self.qinv_arr = qinv
        self.r2_arr = r2
        self.magic_arr = magic

        # evaluation-order structure (same for every prime): output slot i of
        # the CT NTT holds the evaluation at psi^(2*bitrev(i)+1) -- verified
        # against the empirical scan in tests/test_ntt.py
        self.sigma = (2 * ntt.bit_reverse_perm(n) + 1).astype(np.int64)
        pos = np.zeros(two_n, dtype=np.int64)
        pos[self.sigma] = np.arange(n)
        self.pos_of_exp = pos                                 # odd e -> slot
        # CKKS slot ordering: slot j lives at exponent 5^j mod 2N, conjugate
        # at 2N - 5^j.
        slot_exp = np.zeros(self.slot_count, dtype=np.int64)
        e = 1
        for j in range(self.slot_count):   # slot_exp[j] = 5^j mod 2N
            slot_exp[j] = e
            e = (e * 5) % two_n
        self.slot_exp = slot_exp
        self.slot_pos = pos[slot_exp]                         # [N/2]
        self.conj_slot_pos = pos[(two_n - slot_exp) % two_n]  # [N/2]

        # eval values of X^(N/2): psi^(sigma_i * N/2) = +-zeta4; sign pattern
        self.xhalf_sign_neg = (self.sigma % 4) == 3           # [N] bool
        # zeta4 = psi^(N/2) per prime (plain domain)
        zeta4 = np.zeros(self.L_tot, dtype=np.uint64)
        for i, q in enumerate(self.all_primes):
            zeta4[i] = pow(self.tables.psi[i], n // 2, q)
        self.zeta4 = zeta4                                    # [L_tot] plain

        # psi_C for host canonical embedding: exp(i*pi/N); fixed orientation.
        k = np.arange(n)
        self.psi_c_pow = np.exp(1j * np.pi * k / n)           # psi_C^k
        self.psi_c_pow_inv = np.exp(-1j * np.pi * k / n)

        self._galois_perm_cache: dict[int, np.ndarray] = {}
        self._ks_tables_cache: dict[int, dict] = {}
        self._md_tables_cache: dict[int, dict] = {}

    # -- identity hashing so params can be a jit static arg ----------------
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # ------------------------------------------------------------------
    def galois_perm(self, g: int) -> np.ndarray:
        """Eval-domain gather indices for automorphism X -> X^g:
        out[i] = in[perm[i]] with perm[i] = pos[(sigma[i]*g) mod 2N]."""
        g = g % (2 * self.n)
        if g not in self._galois_perm_cache:
            tgt = (self.sigma * g) % (2 * self.n)
            self._galois_perm_cache[g] = self.pos_of_exp[tgt].astype(np.int32)
        return self._galois_perm_cache[g]

    def rot_galois_elt(self, steps: int) -> int:
        """Galois element implementing rotate(ct, steps) == np.roll(slots, steps).

        sigma_5 maps slot j -> content of slot j+1 (left roll); rolling right
        by +steps therefore uses 5^(+steps)... orientation is pinned by
        tests/test_engine.py::test_rotate_matches_roll; see engine.rotate.
        """
        sc = self.slot_count
        return pow(5, (-steps) % sc, 2 * self.n)

    @property
    def conj_galois_elt(self) -> int:
        return 2 * self.n - 1

    # ------------------------------------------------------------------
    def active_primes(self, level: int) -> tuple[int, ...]:
        return self.q_primes[:level + 1]

    def ks_tables(self, level: int) -> dict:
        """Per-level constants for hybrid key-switch basis extension.

        For each digit group j (restricted to active primes at `level`) with
        partial product Qt_j = prod of active group primes:
          inv[j][i]   = (Qt_j / q_i)^(-1) mod q_i          (plain, Shoup pair)
          conv[j][i][m] = (Qt_j / q_i) mod basis_m          (plain, Shoup pair)
        basis = active q primes + special primes.
        """
        if level in self._ks_tables_cache:
            return self._ks_tables_cache[level]
        act = list(range(level + 1))
        basis = [self.all_primes[i] for i in act] + list(self.special_primes)
        groups = [[i for i in grp if i <= level] for grp in self.groups]
        groups = [g for g in groups if g]
        out_groups = []
        for grp in groups:
            qt = 1
            for i in grp:
                qt *= self.q_primes[i]
            inv_w = np.zeros(len(grp), dtype=np.uint32)
            inv_sh = np.zeros(len(grp), dtype=np.uint32)
            conv_w = np.zeros((len(grp), len(basis)), dtype=np.uint32)
            conv_sh = np.zeros((len(grp), len(basis)), dtype=np.uint32)
            for a, i in enumerate(grp):
                qi = self.q_primes[i]
                hat = qt // qi
                w = pow(hat % qi, -1, qi)
                inv_w[a] = w
                inv_sh[a] = rns.shoup_precompute(w, qi)
                for m, qm in enumerate(basis):
                    hm = hat % qm
                    conv_w[a, m] = hm
                    conv_sh[a, m] = rns.shoup_precompute(hm, qm)
            out_groups.append(dict(limbs=grp, inv_w=inv_w, inv_sh=inv_sh,
                                   conv_w=conv_w, conv_sh=conv_sh))
        tabs = dict(basis=np.asarray(basis, dtype=np.uint32), groups=out_groups)
        self._ks_tables_cache[level] = tabs
        return tabs

    def md_tables(self, level: int) -> dict:
        """Per-level constants for the fused one-shot special-prime mod-down
        (approximate CRT base conversion P -> active q, error <= K coefficient
        units — negligible against Delta-scaled key-switch noise):
          inv[i]    = (P / p_i)^(-1) mod p_i                 (Shoup pair)
          conv[i][m] = (P / p_i) mod q_m                      (Shoup pair)
          pinv[m]   = P^(-1) mod q_m                          (Shoup pair)
        """
        if level in self._md_tables_cache:
            return self._md_tables_cache[level]
        K = self.num_special
        lp1 = level + 1
        P = 1
        for p in self.special_primes:
            P *= p
        inv_w = np.zeros(K, dtype=np.uint32)
        inv_sh = np.zeros(K, dtype=np.uint32)
        conv_w = np.zeros((K, lp1), dtype=np.uint32)
        conv_sh = np.zeros((K, lp1), dtype=np.uint32)
        pinv_w = np.zeros(lp1, dtype=np.uint32)
        pinv_sh = np.zeros(lp1, dtype=np.uint32)
        pmod_w = np.zeros(lp1, dtype=np.uint32)
        pmod_sh = np.zeros(lp1, dtype=np.uint32)
        for i, p in enumerate(self.special_primes):
            hat = P // p
            w = pow(hat % p, -1, p)
            inv_w[i] = w
            inv_sh[i] = rns.shoup_precompute(w, p)
            for m in range(lp1):
                qm = self.q_primes[m]
                hm = hat % qm
                conv_w[i, m] = hm
                conv_sh[i, m] = rns.shoup_precompute(hm, qm)
        for m in range(lp1):
            qm = self.q_primes[m]
            w = pow(P % qm, -1, qm)
            pinv_w[m] = w
            pinv_sh[m] = rns.shoup_precompute(w, qm)
            pm = P % qm
            pmod_w[m] = pm
            pmod_sh[m] = rns.shoup_precompute(pm, qm)
        tabs = dict(inv_w=inv_w, inv_sh=inv_sh, conv_w=conv_w,
                    conv_sh=conv_sh, pinv_w=pinv_w, pinv_sh=pinv_sh,
                    pmod_w=pmod_w, pmod_sh=pmod_sh)
        self._md_tables_cache[level] = tabs
        return tabs


_PROFILES = dict(
    tiny=dict(n=1 << 10, max_level=8, scale_bits=26, num_special_primes=2),
    test=dict(n=1 << 12, max_level=16, scale_bits=26, num_special_primes=3),
    # deep: small insecure ring with a long chain, for exercising the full
    # AES round circuits in CI without bootstrap.  Delta = 2^28: the zeta
    # one-round circuit lands at level 1 with worst-case phase error ~0.04
    # of the decode margin (at 2^27 it was ~0.35 and single slots flipped;
    # scripts/boot_forensics.py round_noise measures this per stage)
    deep=dict(n=1 << 12, max_level=48, scale_bits=28, num_special_primes=6),
    # hp: high-precision 2^52 scale (prime-pair rescale) for the byte-domain
    # degree-255 LUT services (GF/S-box/256x256-XOR)
    hp=dict(n=1 << 12, max_level=14, scale_bits=52, num_special_primes=3),
    # prod: logQP = 1172 <= 1772 (HE-standard 128-bit ternary bound at
    # N=2^16); calibrated core-SVP estimate ~203 bits (SECURITY.md)
    prod=dict(n=1 << 16, max_level=35, scale_bits=27, num_special_primes=6),
    # boot_tiny: small insecure ring with bootstrap-capable chain (sparse
    # secret, q0 >> Delta for EvalMod's sine range) -- CI-scale refresh
    # tests.  82 levels: the bootstrap chain consumes ~25, each zeta refresh
    # is followed by FOUR root-of-unity cleanses (28 levels; measured
    # convergence of the EvalMod residual: 0.034 -> 0.0085 -> 6e-4 -> 3e-6,
    # scripts/boot_forensics.py q0 -- the first cleanse sits at its m*e^2
    # convergence boundary, and the merged shift-mix's WORST-CASE LUT gain
    # is ~2e3, so the refreshed error must reach ~1e-5), and the deepest
    # round segment (merged shift-mix, 23 levels + headroom) must still
    # fit: 82-25-28 = 29 >= 25
    boot_tiny=dict(n=1 << 9, max_level=82, scale_bits=27,
                   first_prime_bits=30, num_special_primes=4,
                   secret_hamming=16),
    # prod_boot: full-size bootstrappable chain; measured logQP = 1754 <=
    # 1772 (HE-standard 128-bit ternary bound at N=2^16); the sparse h=192
    # secret erodes that to an estimated ~129 bits under zero-guessing
    # (scripts/security_estimate.py -> SECURITY.md) -- 128-bit-class like
    # the HEaaN-style bootstrap sets it mirrors, not 128-bit-proven.  8
    # specials keep dnum=7 so the ~40 factored-bootstrap rotation keys fit
    # single-chip HBM
    prod_boot=dict(n=1 << 16, max_level=54, scale_bits=27,
                   num_special_primes=8, secret_hamming=192),
    # prod_hp: full-size high-precision ring; logQP = 1516 <= 1772,
    # calibrated core-SVP estimate ~152 bits (SECURITY.md).  NOT
    # bootstrap-capable (q0 ~ 2^30 << Delta ~ 2^52 leaves EvalMod no sine
    # headroom; bootstrap.create_bootstrap_key rejects paired-rescale
    # chains): a depth-bounded profile for byte-domain deg-255 LUT work.
    prod_hp=dict(n=1 << 16, max_level=24, scale_bits=52,
                 num_special_primes=6),
)


@functools.lru_cache(maxsize=None)
def _profile(name: str) -> "CKKSParams":
    return CKKSParams(**_PROFILES[name])


def get_params(profile: str = "test", **overrides) -> CKKSParams:
    if overrides:
        base = dict(_PROFILES[profile])
        base.update(overrides)
        return CKKSParams(**base)
    return _profile(profile)
