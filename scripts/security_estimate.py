"""Lattice security estimate for the shipped CKKS parameter profiles.

Self-contained (no network, no sage).  Two complementary estimates:

1. **HE-standard table bound** (primary): the HomomorphicEncryption.org
   security standard (Albrecht et al. 2018) maximum logQP for 128-bit
   classical security with uniform ternary secret, sigma = 3.2:
       n:     1024  2048  4096  8192  16384  32768  65536*
       logQP:   27    54   109   218    438    881   1772
   (*the 65536 row is the standard's linear continuation, used by SEAL /
   Lattigo / OpenFHE for their default 2^16 sets).  A profile "passes" iff
   its full key-switch modulus logQP (q chain + special primes — the widest
   modulus any RLWE sample in the scheme uses) is within the bound.

2. **Core-SVP primal-uSVP estimate** (secondary, CALIBRATED): smallest BKZ
   block size beta satisfying the [ADPS16] embedding success condition
       sigma*sqrt(beta) <= delta(beta)^(2*beta-d-1) * q^(m/d),  d = n+m+1
   with delta from [Chen13] and cost 2^(0.292*beta) classical / 0.265
   quantum.  Raw GSA is known to over-credit the attacker at large n/logQ
   (no Z-shape / simulator correction), so we report the raw number AND a
   calibrated one: offset(n) = 128 - raw_bits(standard anchor at this n),
   measured on the standard's own 128-bit row, added back to the raw bits.
   The calibration is exact at the anchors by construction; between
   profiles it is a first-order correction, not a proof.

Sparse secrets (hamming weight h) additionally get the zero-guessing
dimension reduction (attacker bets k coordinates are zero, cost divided by
success probability C(n-h,k)/C(n,k)) — a conservative stand-in for hybrid
attacks, applied to the calibrated number.

Run: python scripts/security_estimate.py    (writes SECURITY.md, exits 0)
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aesfhe_tpu.core.params import get_params, _PROFILES

# HomomorphicEncryption.org standard, classical 128-bit, uniform ternary,
# sigma=3.2 (Table 1); 65536 per the SEAL/Lattigo/OpenFHE continuation.
HE_STD_128 = {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438,
              32768: 881, 65536: 1772}
SIGMA = 3.2


def bkz_delta(beta: float) -> float:
    """Root-Hermite factor achieved by BKZ with block size beta [Chen13]."""
    return ((math.pi * beta) ** (1.0 / beta) * beta / (2 * math.pi * math.e)
            ) ** (1.0 / (2.0 * (beta - 1.0)))


def usvp_beta(n: int, log_q: float, sigma: float = SIGMA) -> int:
    """Smallest beta for which primal uSVP succeeds for some m <= 2n."""
    ln_q = log_q * math.log(2.0)
    for beta in range(60, 1400):
        ln_delta = math.log(bkz_delta(beta))
        lhs = math.log(sigma * math.sqrt(beta))
        for m in range(max(60, n // 8), 2 * n + 1, max(1, n // 256)):
            d = n + m + 1
            rhs = (2 * beta - d - 1) * ln_delta + (m / d) * ln_q
            if lhs <= rhs:
                return beta
    return 1400


def raw_bits(n: int, log_q: float) -> float:
    return 0.292 * usvp_beta(n, log_q)


def calibrated_bits(n: int, log_q: float) -> tuple[float, float]:
    """(raw, calibrated) classical bits; calibration anchored to the
    HE-standard 128-bit row at this ring size."""
    raw = raw_bits(n, log_q)
    anchor = HE_STD_128.get(n)
    if anchor is None:
        return raw, raw
    offset = 128.0 - raw_bits(n, anchor)
    return raw, raw + offset


def sparse_penalty_bits(n: int, log_q: float, h: int,
                        base_bits: float) -> float:
    """Best zero-guessing reduction of the (calibrated) attack cost."""
    best = base_bits
    offset = base_bits - raw_bits(n, log_q)   # this ring's calibration
    step = max(1, n // 32)
    ln_p = 0.0                                # ln C(n-h,k) - ln C(n,k)
    k = 0
    while k < n - h - step:
        cost = raw_bits(n - k, log_q) + offset - ln_p / math.log(2.0)
        if cost < best:
            best = cost
        for i in range(k, k + step):          # extend ln_p incrementally
            ln_p += math.log((n - h - i) / (n - i))
        k += step
    return best


def main():
    rows = []
    for name in ("prod", "prod_boot", "prod_hp", "boot_tiny", "tiny",
                 "test", "deep", "hp"):
        p = get_params(name)
        log_qp = sum(q.bit_length() for q in p.all_primes)
        h = _PROFILES[name].get("secret_hamming")
        bound = HE_STD_128.get(p.n)
        std_ok = bound is not None and log_qp <= bound
        raw, cal = calibrated_bits(p.n, log_qp)
        note = "ternary"
        bits = cal
        if h is not None and h < p.n // 4:
            bits = sparse_penalty_bits(p.n, log_qp, h, cal)
            note = f"sparse h={h}"
        rows.append((name, p.logn, log_qp, bound, note, raw, bits, std_ok))
        print(f"{name:10s} N=2^{p.logn} logQP={log_qp:4d} bound={bound} "
              f"{note:14s} raw={raw:5.1f} est={bits:5.1f} "
              f"std_128bit={'PASS' if std_ok else 'FAIL'}")

    lines = [
        "# Security estimates",
        "",
        "Generated by `scripts/security_estimate.py` (self-contained; see its",
        "docstring for the model).  **Primary criterion**: logQP within the",
        "HomomorphicEncryption.org standard's 128-bit classical uniform-",
        "ternary bound for the ring size.  **Secondary**: core-SVP primal-",
        "uSVP bits, calibrated to the standard's own 128-bit anchors (raw",
        "GSA over-credits the attacker by ~25 bits at N=2^15..2^16; the",
        "calibrated column absorbs that at the anchor points).  Sparse-",
        "secret profiles include a zero-guessing reduction (conservative",
        "stand-in for hybrid attacks).",
        "",
        "| profile | N | logQP | std bound | secret | raw bits | est bits | 128-bit (std) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, logn, lqp, bound, note, raw, bits, ok in rows:
        lines.append(
            f"| {name} | 2^{logn} | {lqp} | {bound} | {note} | {raw:.0f} "
            f"| {bits:.0f} | {'PASS' if ok else 'FAIL'} |")
    lines += [
        "",
        "Notes:",
        "- `prod` (logQP 1172 @ N=2^16, ternary): comfortably inside the",
        "  1772 bound; calibrated estimate well above 128.",
        "- `prod_boot` (logQP 1754 @ N=2^16, **sparse h=192**): inside the",
        "  ternary bound, but the sparse secret costs ~10-15 bits under",
        "  zero-guessing; the estimate sits at the 128-bit boundary.  This",
        "  matches the ecosystem practice (HEaaN-style bootstrap sets at",
        "  N=2^16 with h=192 run logQP 1540-1790 and are marketed as",
        "  128-bit); treat it as 128-bit-class, not 128-bit-proven.  For",
        "  margin, drop `max_level` (each level removed saves 27 bits of",
        "  logQP) or raise h toward 256.",
        "- `prod_hp` (logQP 1516, ternary): inside the bound, PASS.",
        "- All sub-2^13 rings (tiny/test/deep/hp/boot_tiny) are CI-scale and",
        "  insecure by construction; never deploy them.",
        "- Keygen RNG is numpy PCG64 by default (research parity with the",
        "  reference).  Set `AESFHE_KEYGEN_RNG=os` (or call",
        "  `keys.use_os_entropy()`) for OS-entropy-backed sampling",
        "  (aesfhe_tpu/core/keys.py).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SECURITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
