"""Bit-sliced (Walsh-basis) homomorphic AES pipeline.

A second, TPU-first evaluation domain alongside the reference-style zeta
LUT pipeline (ops/xor_service.py, ops/mixcolumns_service.py): each AES
state byte is held as 8 bit-planes encoded +-1 ((-1)^bit), one ciphertext
per plane, same slot layout as the nibble pipeline (byte p of the packed
blocks at slot p).  This trades 4x ciphertext memory for a dramatic drop
in multiplicative depth and key-switch count:

  - XOR is multiplication of +-1 values: AddRoundKey against the plaintext
    round key is ONE dense plaintext multiply per plane (the zeta pipeline
    spends 5 levels; the reference spends a full 2D LUT,
    /root/reference/xor_service.py:271-286).
  - SubBytes is a bilinear form in the Walsh (character) basis: the 16
    subset products of the low-nibble planes and of the high-nibble planes
    are built once (depth 2), and each output plane is an inner product
    <A_u, sum_v W[k][u,v] B_v> with ONE hoisted relinearization -- depth 4
    total vs 14 for the zeta16 2D-LUT SubBytes (the reference's dense
    degree-255 power basis costs 255 sequential multiplies,
    /root/reference/sbox/sbox_service.py:91-93).
  - ShiftRows is a rotation/mask combine per plane (1 level).
  - MixColumns is GF(2)-LINEAR on bits, so each output plane is an XOR
    (= product) of 5-7 masked-rotated input planes: depth 4 total vs ~23
    for the zeta16 GF-LUT + XOR-tree design.

One middle round costs 12-13 levels against ~47 for the zeta pipeline, so
at the production bootstrappable chain (prod_boot, 54 levels) two full
rounds fit between refreshes instead of needing three refreshes per round.

Noise: +-1 products ADD relative noise and the Walsh combination amplifies
it by the spectrum's l1 norm (~=8 for the AES S-box components), so each
round ends with a cubic sign-cleanse z -> z(3 - z^2)/2 that squares the
error away (the +-1 analogue of the zeta-domain root-of-unity cleanse).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.ciphertext import Ciphertext
from .xor_service import EngineWrapper
from ..coeffs.generate import AES_SBOX

# ---------------------------------------------------------------------------
# Host-side GF(2^8) / Walsh machinery
# ---------------------------------------------------------------------------


def gmul(a: int, b: int) -> int:
    """GF(2^8) multiply, AES polynomial x^8+x^4+x^3+x+1."""
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        b >>= 1
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
    return r


def mul_bits(m: int, k: int) -> tuple:
    """Input bit indices k' with bit k of (m (x) x) depending on x_{k'}:
    GF-constant multiplication is GF(2)-linear, so bit k of m(x)x is the
    XOR of x_{k'} over this set."""
    return tuple(kp for kp in range(8) if (gmul(m, 1 << kp) >> k) & 1)


_PARITY = None


def _parity_table() -> np.ndarray:
    global _PARITY
    if _PARITY is None:
        v = np.arange(256, dtype=np.uint16)
        p = v.copy()
        for s in (4, 2, 1):
            p ^= p >> s
        _PARITY = (p & 1).astype(np.int8)
    return _PARITY


def walsh_tables(table: np.ndarray) -> np.ndarray:
    """[8, 256] Walsh-Hadamard spectra of the byte LUT's component bits:
    (-1)^{bit_k(table[x])} = sum_u W[k, u] * chi_u(x),
    chi_u(x) = (-1)^{popcount(u & x)}.  Exact multiples of 1/128."""
    par = _parity_table()
    x = np.arange(256)
    # chi[u, x]
    chi = 1.0 - 2.0 * par[np.bitwise_and.outer(x, x)]
    f = 1.0 - 2.0 * ((table[np.newaxis, :] >> np.arange(8)[:, None]) & 1)
    return (f @ chi.T) / 256.0


def chi_signs(u: int, bytes_vec: np.ndarray) -> np.ndarray:
    """chi_u evaluated at a byte vector: per-slot +-1 signs."""
    par = _parity_table()
    return 1.0 - 2.0 * par[np.bitwise_and(bytes_vec.astype(np.int64), u)]


AES_INV_SBOX = np.zeros(256, dtype=np.uint8)
AES_INV_SBOX[AES_SBOX] = np.arange(256, dtype=np.uint8)

MIX = [[2, 3, 1, 1],
       [1, 2, 3, 1],
       [1, 1, 2, 3],
       [3, 1, 1, 2]]
INV_MIX = [[14, 11, 13, 9],
           [9, 14, 11, 13],
           [13, 9, 14, 11],
           [11, 13, 9, 14]]


# ---------------------------------------------------------------------------
# Bit-plane state
# ---------------------------------------------------------------------------


@dataclass
class BitState:
    """8 ciphertexts; bits[k] holds (-1)^{bit k of byte} per slot (LSB
    first).  Same byte-per-slot layout as the nibble pipeline."""
    bits: List[Ciphertext]

    @property
    def level(self) -> int:
        return min(b.level for b in self.bits)


class BitSliceService:
    def __init__(self, eng_wrap: EngineWrapper):
        self.eng = eng_wrap
        params = eng_wrap.engine.params
        self.sc = params.slot_count
        idx = np.arange(self.sc)
        self._row = (idx % 16) % 4
        self._col = (idx % 16) // 4
        self._W = {False: walsh_tables(AES_SBOX),
                   True: walsh_tables(AES_INV_SBOX)}
        self._pt_cache: Dict = {}
        self._walsh_const_cache: Dict = {}
        # direct Galois keys for the hoisted rotation batches: ShiftRows
        # uses +-4r, MixColumns' intra-column row rotations use +-1..3
        eng_wrap.ensure_rotation_steps(
            [1, 2, 3, -1, -2, -3, 4, 8, 12, -4, -8, -12])

    # -- cached dense plaintexts --------------------------------------------
    # The cache holds ONE round's working set (8 ARK sign planes + ~7
    # ShiftRows mask variants + 4 row masks); entries are encoded ON DEVICE
    # (core/dev_encoding c64 FFT -- ~ms, no host FFT, no dense upload), so
    # eviction is cheap and the cache must NOT grow one dense [L, N]
    # plaintext per (round key, plane): at prod_boot a full 10-round key
    # schedule's cached planes cost ~350 MB of HBM next to ~12 GB of keys
    # and diagonals, and that growth was the round-4 RESOURCE_EXHAUSTED.
    _PT_CACHE_CAP = 24

    def _cached_pt(self, key, vec: np.ndarray, level: int | None = None):
        """Device-encode a dense weight vector, LRU-cached for reuse within
        a round (multiply/combination slice pt.data rows).

        Precision: the c64 device embedding carries ~1e-6 relative error --
        five orders below the +-1 Walsh sign margin and the 0/1 mask
        contrast, and squashed by the per-round sign-cleanse.

        `level` caps the encode height: a bootstrapped prod_boot round
        never sees its weights above level ~19, and a top-level (55-row)
        encode wastes ~3x the HBM per entry.  A later call needing a higher
        level than cached transparently re-encodes."""
        need = self.eng.engine.params.top_level if level is None else level
        pt = self._pt_cache.pop(key, None)
        if pt is None or pt.level < need:
            pt = self.eng.engine.encode(np.asarray(vec, dtype=np.float64),
                                        level=need, device=True)
        # tracer guard: under eval_shape/jit the encode returns a tracer
        # whose escape would poison later jitted calls (see Engine._perm_dev)
        if not isinstance(pt.data, jax.core.Tracer):
            self._pt_cache[key] = pt        # (re)insert: LRU recency order
            while len(self._pt_cache) > self._PT_CACHE_CAP:
                self._pt_cache.pop(next(iter(self._pt_cache)))
        return pt

    # -- encode / decode ---------------------------------------------------
    def encrypt_state(self, state_bytes: np.ndarray) -> BitState:
        # device=True: the embedding FFT of all 8 planes runs on-device
        # (core/dev_encoding.py) instead of 8 serial host FFTs — the sign
        # margin (1.0) dwarfs the c64 encode error (~1e-6)
        b = np.asarray(state_bytes, dtype=np.uint8)
        return BitState([
            self.eng.encrypt(1.0 - 2.0 * ((b >> k) & 1).astype(np.float64),
                             device=True)
            for k in range(8)])

    def decrypt_state(self, st: BitState) -> np.ndarray:
        out = np.zeros(self.sc, dtype=np.uint8)
        for k, ct in enumerate(st.bits):
            bit = (np.real(self.eng.decrypt(ct, device=True)) < 0)
            out |= bit.astype(np.uint8) << k
        return out

    def max_noise(self, st: BitState) -> float:
        """Debug-with-secret-key metric: max |slot - (+-1)| across planes."""
        worst = 0.0
        for ct in st.bits:
            v = np.real(self.eng.decrypt(ct))
            worst = max(worst, float(np.max(np.abs(np.abs(v) - 1.0))))
        return worst

    # -- AddRoundKey ---------------------------------------------------------
    def _key_signs(self, key16: np.ndarray, k: int) -> np.ndarray:
        tiled = np.tile(np.asarray(key16, dtype=np.uint8), self.sc // 16)
        return 1.0 - 2.0 * ((tiled >> k) & 1).astype(np.float64)

    def xor_plain(self, st: BitState, key16: np.ndarray) -> BitState:
        """AddRoundKey: (-1)^(x^k) = (-1)^x * (-1)^k -- one dense plaintext
        multiply per plane (the zeta pipeline needs a degree-15 LUT)."""
        eng = self.eng
        out = []
        for k in range(8):
            ck = ("ark", bytes(np.asarray(key16, dtype=np.uint8)), k)
            pt = self._cached_pt(ck, self._key_signs(key16, k),
                                 level=st.bits[k].level)
            out.append(eng.multiply_plain(st.bits[k], pt))
        return BitState(out)

    # -- subset products (character basis) -----------------------------------
    def _subset_products(self, bits4: Sequence[Ciphertext]) -> Dict[int, Ciphertext]:
        """{u: prod_{i in u} bits4[i]} for u in 1..15, all normalized to one
        (level, scale) at depth 2: pairs multiply singles, triples multiply a
        scale-adjusted single into a pair, the quad multiplies two pairs, so
        every same-depth product shares an identical exact-tracked scale."""
        eng = self.eng.engine
        rlk = self.eng.relin_key
        P: Dict[int, Ciphertext] = {1 << i: ct for i, ct in enumerate(bits4)}
        pairs = [u for u in range(1, 16) if bin(u).count("1") == 2]
        for u in pairs:
            lo = u & -u
            P[u] = eng.multiply(P[lo], P[u ^ lo], rlk)
        s_pair = P[pairs[0]].scale
        lvl_pair = P[pairs[0]].level
        # singles adjusted onto the pair scale for triple products
        adj = {b: eng._adjust_scale(P[b], s_pair)
               for b in (1, 2, 4, 8)}
        for u in (7, 11, 13, 14):       # triples
            lo = u & -u
            P[u] = eng.multiply(adj[lo], P[u ^ lo], rlk)
        P[15] = eng.multiply(P[3], P[12], rlk)
        s2 = P[15].scale
        lvl2 = P[15].level
        out: Dict[int, Ciphertext] = {}
        for u in range(1, 16):
            ct = P[u]
            # tolerance above the truthful-adjust residue (~0.5/sigma,
            # core/engine._SCALE_ACCEPT): a sub-1e-7 mismatch is a value
            # error far below the Walsh sign margin, while re-adjusting a
            # ciphertext already AT lvl2 would land below it
            if abs(ct.scale - s2) / s2 > 1e-7:
                ct = eng._adjust_scale(ct, s2)
            out[u] = eng._drop(ct, lvl2)
        return out

    # -- SubBytes -------------------------------------------------------------
    def sub_bytes(self, st: BitState, inverse: bool = False,
                  round_key: Optional[np.ndarray] = None) -> BitState:
        """All 8 output planes from two shared character bases via hoisted
        inner products: out_k = sum_{u,v} W[k][u,v] A_u B_v.

        With `round_key` given, evaluates SBOX[x ^ rk] at zero extra DEPTH:
        chi_{uv}(x ^ rk) = chi_{uv}(x) chi_{uv}(rk), so the key only flips
        coefficient signs -- per-slot dense weights in the B-combos.  NB the
        fold trades 1 level for 256 dense weight vectors per call (host
        encode + device upload each); on a remote device prefer the cached
        xor_plain + keyless sub_bytes (pipeline.AESFHE128Bitsliced)."""
        eng = self.eng.engine
        rlk = self.eng.relin_key
        W = self._W[inverse]
        A = self._subset_products(st.bits[0:4])
        B = self._subset_products(st.bits[4:8])
        lvl = A[1].level
        s2 = A[1].scale
        one = eng.trivial_ct(1.0, level=lvl, scale=s2)
        lhs = [one] + [A[u] for u in range(1, 16)]
        key_lo = key_hi = None
        if round_key is not None:
            rk = np.tile(np.asarray(round_key, dtype=np.uint8), self.sc // 16)
            key_lo, key_hi = (rk & 0x0F), (rk >> 4)
        blist = [one] + [B[v] for v in range(1, 16)]
        if round_key is None:
            # all 8 planes through ONE fused kernel (see
            # ops_impl.walsh_sub_bytes_core); per-plane relin + the same
            # paired rescale the two-stage path paid (one at the combo, one
            # after the product) -- exit (level, scale) identical
            from ..core import ops_impl
            params = eng.params
            target = params.scale
            a_stack = jnp.stack([ct.data[:, :lvl + 1] for ct in lhs])
            b_stack = jnp.stack([ct.data[:, :lvl + 1] for ct in blist])
            consts = self._walsh_consts(inverse, lvl, target)
            raw = ops_impl.walsh_sub_bytes_core(params, eng.tabs,
                                                a_stack, b_stack, consts)
            eng._count("pt_mul", 128)
            eng._count("ct_mul", 128)
            outs = []
            for k in range(8):
                ct = Ciphertext(raw[k], s2 * s2 * target)
                eng._count("keyswitch")
                ct = Ciphertext(eng._relin_data(ct.data, rlk), ct.scale)
                outs.append(eng._rescale(eng._rescale(ct)))
            return BitState(outs)
        outs = []
        for k in range(8):
            rhs = []
            for u in range(16):
                coeffs = [W[k][(v << 4) | u] for v in range(16)]
                su = chi_signs(u, key_lo)
                dense = [coeffs[v] * su * chi_signs(v, key_hi)
                         for v in range(16)]
                rhs.append(eng.linear_combination(blist, dense))
            outs.append(eng.inner_product(lhs, rhs, rlk))
        return BitState(outs)

    def _walsh_consts(self, inverse: bool, level: int, target: float):
        """[8, 16, 16, level+1, 2] (w, w_shoup) device table of the REAL
        Walsh weights W[k][(v<<4)|u] encoded at `target`; cached per
        (table, level) -- the weights and the work level repeat every
        round.  Built fully vectorized in numpy (the per-value Python
        encode loop would cost ~2048 calls per SubBytes)."""
        ck = (inverse, level, round(target))
        hit = self._walsh_const_cache.get(ck)
        if hit is not None:
            return hit
        W = self._W[inverse]                       # [8, 256]
        params = self.eng.engine.params
        C = W[:, (np.arange(16)[None, :] << 4) | np.arange(16)[:, None]]
        # C[k, u, v] = W[k][(v<<4)|u]
        re_i = np.round(C * target).astype(np.int64)      # [8, 16, 16]
        qs = np.asarray(params.active_primes(level), dtype=np.int64)
        re_q = np.mod(re_i[..., None], qs[None, None, None, :])
        re_sh = ((re_q.astype(np.uint64) << np.uint64(32)) //
                 qs.astype(np.uint64)[None, None, None, :])
        consts = jnp.asarray(np.stack([re_q, re_sh], axis=-1)
                             .astype(np.uint32))
        if not isinstance(consts, jax.core.Tracer):
            self._walsh_const_cache[ck] = consts
        return consts

    # -- ShiftRows ------------------------------------------------------------
    def _sr_variants(self, inverse: bool):
        """[(step, mask_bool)] masked-rotation variants of in-block
        ShiftRows: output slot p (row r, col c) reads the source at slot
        p + delta, handled as rotate(-delta) then output-side mask."""
        row, col = self._row, self._col
        out = []
        for r in range(4):
            if r == 0:
                out.append((0, row == 0))
                continue
            if not inverse:
                keep = (row == r) & (col < 4 - r)       # delta = 4r
                wrap = (row == r) & (col >= 4 - r)      # delta = 4r - 16
                out.append((-4 * r, keep))
                out.append((16 - 4 * r, wrap))
            else:
                keep = (row == r) & (col >= r)          # delta = -4r
                wrap = (row == r) & (col < r)           # delta = 16 - 4r
                out.append((4 * r, keep))
                out.append((4 * r - 16, wrap))
        return out

    def shift_rows(self, st: BitState, inverse: bool = False,
                   fold_key: Optional[np.ndarray] = None) -> BitState:
        """Per plane: hoisted rotations + ONE dense mask-combine (1 level).
        `fold_key` merges a following AddRoundKey into the mask weights for
        free (used by the final round, which has no MixColumns)."""
        eng = self.eng.engine
        rot_keys = self.eng.rot_key
        variants = self._sr_variants(inverse)
        steps = sorted({s % self.sc for s, _ in variants})
        fold_b = (bytes(np.asarray(fold_key, dtype=np.uint8))
                  if fold_key is not None else None)
        out = []
        for k in range(8):
            rots = eng.hoisted_rotations(st.bits[k], rot_keys, steps)
            by_step = dict(zip(steps, rots))
            cts, weights = [], []
            sign = (self._key_signs(fold_key, k)
                    if fold_key is not None else 1.0)
            for vi, (s, mask) in enumerate(variants):
                cts.append(by_step[s % self.sc])
                ck = (("srf", inverse, vi, fold_b, k) if fold_b is not None
                      else ("sr", inverse, vi))
                weights.append(self._cached_pt(
                    ck, mask.astype(np.float64) * sign,
                    level=st.bits[k].level))
            out.append(eng.linear_combination(cts, weights))
        return BitState(out)

    # -- MixColumns -----------------------------------------------------------
    def _mix_plan(self, inverse: bool):
        """plans[k] = list of factor slots; each factor slot = per-row
        (source plane k', term j).  Every row has the same factor count
        because each MixColumns row is a permutation of the same multiplier
        multiset, so output plane k is ONE product of n(k) mask-combined
        ciphertexts (XOR of +-1 = product)."""
        matrix = INV_MIX if inverse else MIX
        plans = []
        for k in range(8):
            per_row = []
            for r in range(4):
                fl = []
                for j in range(4):
                    for kp in mul_bits(matrix[r][j], k):
                        fl.append((kp, j))
                per_row.append(fl)
            n = len(per_row[0])
            assert all(len(f) == n for f in per_row), "row arity mismatch"
            plans.append([[per_row[r][i] for r in range(4)]
                          for i in range(n)])
        return plans

    def _mix_rot_step(self, r: int, j: int) -> int:
        # output slot r+4c sums M[r][j] (x) in[j+4c]: source offset j - r,
        # always within the column (no block wrap)
        return (r - j) % self.sc

    def mix_columns(self, st: BitState, inverse: bool = False) -> BitState:
        """out_k = prod_i G_i(k); G_i(k) = sum_r mask_r * rot(plane, -delta).
        Rotations are hoisted per source plane (steps +-1..3); the mask
        combine is one fused dense linear_combination per factor."""
        eng = self.eng.engine
        rlk = self.eng.relin_key
        rot_keys = self.eng.rot_key
        plans = self._mix_plan(inverse)
        # rotation steps actually needed per plane
        need: Dict[int, set] = {}
        for k in range(8):
            for slot in plans[k]:
                for r, (kp, j) in enumerate(slot):
                    need.setdefault(kp, set()).add(self._mix_rot_step(r, j))
        rotated: Dict[int, Dict[int, Ciphertext]] = {}
        for kp, steps in need.items():
            steps = sorted(steps)
            rots = eng.hoisted_rotations(st.bits[kp], rot_keys, steps)
            rotated[kp] = dict(zip(steps, rots))
        lvl_mask = max(b.level for b in st.bits)
        row_masks = [self._cached_pt(("row", r),
                                     (self._row == r).astype(np.float64),
                                     level=lvl_mask)
                     for r in range(4)]
        out = []
        for k in range(8):
            factors = []
            for slot in plans[k]:
                cts, weights = [], []
                for r, (kp, j) in enumerate(slot):
                    cts.append(rotated[kp][self._mix_rot_step(r, j)])
                    weights.append(row_masks[r])
                factors.append(eng.linear_combination(cts, weights))
            # balanced product tree (XOR of +-1 planes)
            while len(factors) > 1:
                nxt = []
                for i in range(0, len(factors) - 1, 2):
                    nxt.append(eng.multiply(factors[i], factors[i + 1], rlk))
                if len(factors) % 2:
                    nxt.append(factors[-1])
                factors = nxt
            out.append(factors[0])
        # odd-arity leftovers sit one level above; align the set
        lvl = min(ct.level for ct in out)
        scales = [ct.scale for ct in out]
        target = min(scales)
        aligned = []
        for ct in out:
            if abs(ct.scale - target) / target > 1e-7:
                ct = eng._adjust_scale(ct, target)
            aligned.append(eng._drop(ct, min(lvl, ct.level)))
        lvl = min(ct.level for ct in aligned)
        return BitState([eng._drop(ct, lvl) for ct in aligned])

    # -- noise management -----------------------------------------------------
    def cleanse(self, st: BitState) -> BitState:
        """Cubic sign-cleanse z -> z(3 - z^2)/2: quadratically squashes
        additive noise around +-1 (the +-1 analogue of the zeta-domain
        cleanse) and retargets the exact-tracked scale back to Delta,
        resetting a round's accumulated scale drift."""
        eng = self.eng.engine
        rlk = self.eng.relin_key
        params = eng.params
        out = []
        for ct in st.bits:
            z2 = eng.multiply(ct, ct, rlk)
            # w = (3 - z^2)/2 with coeff scale chosen so the final product
            # rescales onto exactly Delta
            q_w = 1.0
            for i in range(params.rescale_primes):
                q_w *= float(params.q_primes[z2.level - i])
            # after combo: w.scale = z2.scale * sigma / q_w (level z2-1)
            # after product: out.scale = ct.scale * w.scale / q_f
            lvl_f = z2.level - params.rescale_primes
            q_f = 1.0
            for i in range(params.rescale_primes):
                q_f *= float(params.q_primes[lvl_f - i])
            sigma = (params.scale * q_f * q_w) / (ct.scale * z2.scale)
            w = eng.linear_combination([z2], [-0.5], constant=1.5,
                                       coeff_scale=sigma)
            res = eng.multiply(ct, w, rlk)
            out.append(Ciphertext(res.data, params.scale))
        return BitState(out)
